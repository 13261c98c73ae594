"""Round-4 additions: KMV distinct sketch, word-entropy quality,
MMR diversified search, event-mix drift — each checked against an
independent Python brute force on synthetic fixtures (the DuckDB
value oracle covers the fixture tables; these pin the algorithms).
"""

import math
import random

import pyarrow as pa
import pyarrow.parquet as pq

from far_finer_airtable_firestore_sync_spark.plans import agg_queries as agg
from far_finer_airtable_firestore_sync_spark.plans import ext_queries as ext


def _write(tmp_path, name, table):
    path = str(tmp_path / f"{name}.parquet")
    pq.write_table(table, path)
    return path


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------


def _docs_table(texts, sources):
    return pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def test_kmv_estimate_within_sketch_error(spark, tmp_path):
    # big: 400 distinct texts (estimator active); small: 5 distinct
    # (n_seen < k -> exact count path), each with duplicates.
    texts, sources = [], []
    for i in range(400):
        texts += [f"big unique doc {i}"] * 2
        sources += ["big"] * 2
    for i in range(5):
        texts += [f"small doc {i}"] * 3
        sources += ["small"] * 3
    _write(tmp_path, "documents", _docs_table(texts, sources))
    rows = {
        r["source"]: r
        for r in ext.q_kmv_distinct(spark, str(tmp_path)).collect()
    }
    big, small = rows["big"], rows["small"]
    assert big["n_exact"] == 400
    assert small["n_exact"] == 5
    # small side: fewer distinct hashes than k -> estimate is exact
    assert small["kmv_estimate"] == 5
    # big side: standard error of KMV is ~ n/sqrt(k-1); allow 3 sigma
    se = 400 / math.sqrt(ext.KMV_K - 1)
    assert abs(big["kmv_estimate"] - 400) <= 3 * se


# ---------------------------------------------------------------------------
# word entropy
# ---------------------------------------------------------------------------


def _brute_entropy(text):
    words = [w for w in text.split(" ") if w]
    n = len(words)
    counts = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    h = sum(c * round(math.log(n / c) * 1_000_000) for c in counts.values())
    return {
        "n_tokens": n,
        "n_distinct": len(counts),
        "ttr_ppm": (1_000_000 * len(counts)) // n,
        "entropy_uppm": h // n,
    }


def test_word_entropy_matches_brute_force(spark, tmp_path):
    rng = random.Random(13)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy"]
    texts = [
        " ".join(rng.choices(vocab, k=rng.randint(1, 60))) for _ in range(50)
    ]
    texts += ["solo", "rep rep rep rep"]  # H=0 edge cases
    _write(tmp_path, "documents", _docs_table(texts, ["s"] * len(texts)))
    got = {
        r["doc_id"]: r
        for r in ext.q_word_entropy(spark, str(tmp_path)).collect()
    }
    assert len(got) == len(texts)
    for i, t in enumerate(texts):
        exp = _brute_entropy(t)
        for k, v in exp.items():
            assert got[i][k] == v, (i, k, got[i][k], v)
    # uniform doc: entropy == ln(n_distinct) on the grid
    assert got[len(texts) - 2]["entropy_uppm"] == 0
    assert got[len(texts) - 1]["entropy_uppm"] == 0


# ---------------------------------------------------------------------------
# MMR
# ---------------------------------------------------------------------------


def _emb_table(vecs):
    return pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )


def _qz(v):
    return [round(float(x) * 1000) for x in v]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a)
    nb = sum(x * x for x in b)
    if na == 0 or nb == 0:
        return 0.0
    return dot / math.sqrt(na * nb)


def _brute_mmr(vecs, k, cand_n, lam):
    q = _qz(vecs[0])
    cand = sorted(
        ((_cos(q, _qz(v)), i) for i, v in enumerate(vecs) if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[:cand_n]
    sel = [max(cand, key=lambda t: (t[0], -t[1]))]
    picks = [(1, sel[0][1], sel[0][0], sel[0][0])]
    for step in range(2, k + 1):
        best = None
        for rel, i in cand:
            if any(i == s[1] for s in sel):
                continue
            maxsim = max(_cos(_qz(vecs[i]), _qz(vecs[s[1]])) for s in sel)
            mmr = lam * rel - (1 - lam) * maxsim
            if best is None or (mmr, -i) > (best[0], -best[1]):
                best = (mmr, i, rel)
        picks.append((step, best[1], best[2], best[0]))
        sel.append((best[2], best[1]))
    return picks


def test_mmr_matches_brute_force_greedy(spark, tmp_path):
    rng = random.Random(99)
    dim = 8
    # clustered vectors so diversification visibly reorders picks
    base = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(4)]
    vecs = []
    for i in range(40):
        b = base[i % 4]
        vecs.append([x + rng.uniform(-0.05, 0.05) for x in b])
    _write(tmp_path, "embeddings", _emb_table(vecs))
    got = [
        (r["step"], r["vec_id"], r["rel"], r["mmr"])
        for r in ext.q_search_mmr(spark, str(tmp_path))
        .orderBy("step")
        .collect()
    ]
    exp = _brute_mmr(vecs, ext.MMR_K, ext.MMR_CAND, ext.MMR_LAM_NUM / 10)
    assert [g[:2] for g in got] == [e[:2] for e in exp]
    for g, e in zip(got, exp):
        assert abs(g[2] - e[2]) < 1e-9
        assert abs(g[3] - e[3]) < 1e-9
    # the diversified set must differ from plain top-k on clustered data
    plain = [e[1] for e in sorted(
        ((_cos(_qz(vecs[0]), _qz(v)), i) for i, v in enumerate(vecs) if i != 0),
        key=lambda t: (-t[0], t[1]),
    )[: ext.MMR_K]]
    assert {g[1] for g in got} != set(plain)


# ---------------------------------------------------------------------------
# event-mix drift
# ---------------------------------------------------------------------------


def test_event_mix_drift_matches_brute_force(spark, tmp_path):
    import datetime as dt

    rng = random.Random(5)
    types = ["click", "view", "buy"]
    rows = []
    for day in range(6):
        for _ in range(rng.randint(5, 30)):
            rows.append(
                (
                    dt.datetime(2024, 3, 1 + day, rng.randint(0, 23), 30),
                    rng.choice(types if day < 3 else types[:2]),
                )
            )
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([i % 7 for i in range(len(rows))], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    _write(tmp_path, "events", table)

    # brute force with the same 1e-12 share grid
    per_day = {}
    for ts, et in rows:
        d = ts.date()
        per_day.setdefault(d, {}).setdefault(et, 0)
        per_day[d][et] += 1
    days = sorted(per_day)
    exp = {}
    for prev, cur in zip(days, days[1:]):
        t_prev = sum(per_day[prev].values())
        t_cur = sum(per_day[cur].values())
        tv = 0
        for et in types:
            sp = round(per_day[prev].get(et, 0) / t_prev * 1e12)
            sc = round(per_day[cur].get(et, 0) / t_cur * 1e12)
            tv += abs(sc - sp)
        exp[cur] = (tv / 2e12, sum(1 for et in types if per_day[cur].get(et)))

    got = {
        r["day"]: (r["tvd"], r["n_active_types"])
        for r in agg.q_event_mix_drift(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d][0] - exp[d][0]) < 1e-9, d
        assert got[d][1] == exp[d][1]
    # day 0 has no predecessor -> absent
    assert days[0] not in got


# ---------------------------------------------------------------------------
# audio features
# ---------------------------------------------------------------------------


def test_audio_features_decode_and_quarantine(spark):
    import io
    import struct
    import wave

    from far_finer_airtable_firestore_sync_spark.operators import multimodal

    def wav_bytes(samples, rate=8000, nch=1, width=2):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(width)
            w.setframerate(rate)
            if width == 2:
                w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
            else:
                w.writeframes(bytes(s & 0xFF for s in samples))
        return buf.getvalue()

    rows = [
        (0, wav_bytes([100, -100, 100, -100])),   # alternating: zcr = 1
        (1, wav_bytes([0, 0, 0, 0])),             # silence: rms 0, zcr 0
        (2, b"not a wav at all"),                 # quarantine -> NULLs
        (3, wav_bytes([5, 5], width=1)),          # 8-bit: unsupported -> NULLs
    ]
    df = spark.createDataFrame(
        rows, "media_id long, content binary"
    ).withColumn("media_type", __import__("pyspark").sql.functions.lit("audio/wav"))
    got = {r["media_id"]: r for r in multimodal.audio_features(df).collect()}

    assert got[0]["n_samples"] == 4
    assert abs(got[0]["rms"] - 100 / 32768.0) < 1e-12
    assert got[0]["zcr"] == 1.0
    assert got[1]["rms"] == 0.0 and got[1]["zcr"] == 0.0
    assert got[2]["rms"] is None and got[2]["n_samples"] is None
    assert got[3]["rms"] is None  # 8-bit PCM rejected, row survives
    assert len(got) == 4


# ---------------------------------------------------------------------------
# PPJoin exact set-similarity join
# ---------------------------------------------------------------------------


def _shingle_set(text, n=9, max_chars=256):
    t = (text or "")[:max_chars]
    m = max(len(t) - n + 1, 1)
    return {t[i : i + n] for i in range(m)} - {""}


def _brute_ppjoin(texts, t_num, t_den):
    sets = {i: _shingle_set(t) for i, t in enumerate(texts)}
    out = {}
    ids = [i for i in sets if sets[i]]
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if inter * t_den >= union * t_num:
                out[(a, b)] = (inter, inter / union)
    return out


def test_ppjoin_matches_brute_force_all_pairs(spark, tmp_path):
    rng = random.Random(17)
    words = ["spark", "window", "merge", "table", "row", "batch", "scan"]
    texts = [
        " ".join(rng.choices(words, k=rng.randint(10, 30))) for _ in range(40)
    ]
    # planted: exact copies (J=1), one-word-suffix near-dups (J high),
    # and half-overlap docs (J far below 0.8 -> must NOT appear)
    texts += [texts[0], texts[1] + " zz", texts[2][: len(texts[2]) // 2]]
    texts += ["", "tiny"]  # degenerate docs
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        PPJOIN_T_DEN,
        PPJOIN_T_NUM,
        _ppjoin_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK

    _write(tmp_path, "documents", _docs_table(texts, ["s"] * len(texts)))
    spark.read.parquet(str(tmp_path / "documents.parquet")).createOrReplaceTempView(
        "_ffs_ppj_test"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["n_shared"], r["jaccard"])
        for r in spark.sql(_ppjoin_body(SPARK, "_ffs_ppj_test")).collect()
    }
    exp = _brute_ppjoin(texts, PPJOIN_T_NUM, PPJOIN_T_DEN)
    assert set(got) == set(exp)  # complete AND no extras
    for k in exp:
        assert got[k][0] == exp[k][0], k
        assert abs(got[k][1] - exp[k][1]) < 1e-12, k
    assert (0, len(texts) - 5) in got  # the planted exact copy found


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------


def test_pmi_matches_brute_force(spark, tmp_path):
    import itertools

    rng = random.Random(23)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = []
    for i in range(60):
        ws = set(rng.choices(vocab, k=rng.randint(2, 4)))
        if i % 3 == 0:
            ws |= {"peanut", "butter"}  # a strong collocation
        texts.append(" ".join(sorted(ws)))
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        PMI_MIN_PAIR,
        _pmi_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK

    _write(tmp_path, "documents", _docs_table(texts, ["s"] * len(texts)))
    spark.read.parquet(str(tmp_path / "documents.parquet")).createOrReplaceTempView(
        "_ffs_pmi_test"
    )
    got = [
        (r["word_a"], r["word_b"], r["n_pair"], r["pmi"])
        for r in spark.sql(_pmi_body(SPARK, "_ffs_pmi_test")).collect()
    ]
    # brute force
    docs = [set(t.split()) for t in texts]
    n_docs = len([d for d in docs if d])
    df = {}
    for d in docs:
        for w in d:
            df[w] = df.get(w, 0) + 1
    pairs = {}
    for d in docs:
        for a, b in itertools.combinations(sorted(d), 2):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    scored = []
    for (a, b), c in pairs.items():
        if c < PMI_MIN_PAIR:
            continue
        q = round(math.log((n_docs * float(c)) / (df[a] * float(df[b]))) * 1e6)
        scored.append((a, b, c, q))
    scored.sort(key=lambda t: (-t[3], t[0], t[1]))
    exp = [(a, b, c, q / 1e6) for a, b, c, q in scored[:50]]
    assert got == exp
    assert got[0][:2] == ("butter", "peanut")  # collocation ranks first


# ---------------------------------------------------------------------------
# small-files compaction
# ---------------------------------------------------------------------------


def test_compact_small_files(spark, tmp_path):
    from far_finer_airtable_firestore_sync_spark.operators import layout

    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    df = spark.range(0, 10000).selectExpr("id", "id % 97 as v")
    df.repartition(64).write.parquet(src)
    import os

    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 64
    stats = layout.compact_small_files(
        spark, src, dst, target_bytes=10**9
    ).collect()[0]
    assert stats["files_before"] == 64
    assert stats["files_after"] == 1  # everything fits one target file
    assert stats["n_rows"] == 10000
    # data parity, order-insensitive
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


# ---------------------------------------------------------------------------
# RM3 query expansion
# ---------------------------------------------------------------------------


def test_rm3_expansion_changes_ranking_and_is_bounded(spark, tmp_path):
    """Docs rich in terms co-occurring with the seed inside feedback
    docs must be boosted vs plain seed-only BM25."""
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _bm25_body,
        _rm3_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK

    texts = []
    # 12 feedback-shaped docs: seed terms + the expansion marker 'zork'
    for i in range(12):
        texts.append("spark window merge zork zork zork filler" + str(i))
    # docs containing ONLY the expansion marker: invisible to seed BM25
    for i in range(5):
        texts.append("zork zork zork zork pad pad pad")
    # background noise
    for i in range(30):
        texts.append("pad filler noise row" + str(i % 7))
    _write(tmp_path, "documents", _docs_table(texts, ["s"] * len(texts)))
    spark.read.parquet(str(tmp_path / "documents.parquet")).createOrReplaceTempView(
        "_ffs_rm3_t"
    )
    rm3 = [r["doc_id"] for r in spark.sql(_rm3_body(SPARK, "_ffs_rm3_t")).collect()]
    bm25 = [r["doc_id"] for r in spark.sql(_bm25_body(SPARK, "_ffs_rm3_t")).collect()]
    zork_only = set(range(12, 17))
    # seed-only BM25 cannot see the zork-only docs; RM3 must surface them
    assert not (set(bm25) & zork_only)
    assert zork_only <= set(rm3)


# ---------------------------------------------------------------------------
# time-series gap fill
# ---------------------------------------------------------------------------


def test_events_gapfill_locf_semantics(spark, tmp_path):
    """Synthetic sparse stream: gap days appear with n_events=0 and
    carry the last observed daily total forward; leading gaps stay
    NULL."""
    import datetime as dt

    rows = [
        # type 'a': day 1 observed, days 2-3 gap, day 4 observed
        (dt.datetime(2024, 6, 1, 10), "a", 200.0),
        (dt.datetime(2024, 6, 1, 11), "a", 300.0),
        (dt.datetime(2024, 6, 4, 9), "a", 500.0),
        # type 'b': first observed on day 3 -> days 1-2 leading gap
        (dt.datetime(2024, 6, 3, 8), "b", 191.5),
    ]
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([r[2] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    _write(tmp_path, "events", table)
    got = {
        (r["event_type"], str(r["day"])): (
            r["n_events"], r["value_ffill"], r["was_gap"]
        )
        for r in agg.q_events_gapfill(spark, str(tmp_path)).collect()
    }
    assert len(got) == 8  # 4-day spine x 2 types
    assert got[("a", "2024-06-01")] == (2, 500.0, False)
    assert got[("a", "2024-06-02")] == (0, 500.0, True)   # LOCF
    assert got[("a", "2024-06-03")] == (0, 500.0, True)   # LOCF
    assert got[("a", "2024-06-04")] == (1, 500.0, False)
    assert got[("b", "2024-06-01")][1] is None            # leading gap
    assert got[("b", "2024-06-02")][1] is None
    assert got[("b", "2024-06-03")] == (1, 191.5, False)
    assert got[("b", "2024-06-04")] == (0, 191.5, True)


# ---------------------------------------------------------------------------
# Count-Min Sketch
# ---------------------------------------------------------------------------


def test_cms_one_sided_overcount_and_exact_on_sparse(spark, tmp_path):
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _cms_body,
    )
    from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK

    rng = random.Random(31)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choices(vocab, weights=range(1, 31), k=20))
        for _ in range(100)
    ]
    _write(tmp_path, "documents", _docs_table(texts, ["s"] * len(texts)))
    spark.read.parquet(str(tmp_path / "documents.parquet")).createOrReplaceTempView(
        "_ffs_cms_t"
    )
    rows = spark.sql(_cms_body(SPARK, "_ffs_cms_t")).collect()
    assert len(rows) == 20
    for r in rows:
        # the CMS contract: estimates never undercount
        assert r["overcount"] >= 0, r
        assert r["cms_est"] >= r["n_exact"]
    # 30 distinct words over 4x1024 buckets: collisions are
    # vanishingly unlikely, so estimates should be exact here
    assert all(r["overcount"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# PageRank over the dup graph
# ---------------------------------------------------------------------------


def test_pagerank_star_graph_centrality(spark):
    from far_finer_airtable_firestore_sync_spark.operators import dedup_docs

    # star: 0 is the hub of 1..5; separate 2-cycle {10, 11}
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(10, 11)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["pr_micro"]
        for r in dedup_docs.pagerank(pairs, iterations=3).collect()
    }
    assert len(got) == 8
    # the hub outranks every leaf; leaves are symmetric -> equal
    assert all(got[0] > got[i] for i in range(1, 6))
    assert len({got[i] for i in range(1, 6)}) == 1
    # the isolated 2-cycle is symmetric and keeps 1/N mass each
    assert got[10] == got[11]
    # total mass is conserved up to integer-division truncation
    total = sum(got.values())
    assert abs(total - dedup_docs.PR_UNIT) < 200 * len(got)


def test_mmr_tie_break_with_duplicate_embeddings(spark, tmp_path):
    """Exact mmr ties (duplicate candidate vectors) must resolve by
    vec_id ASC — the review-caught bug compared against the step
    field, picking larger ids and drifting from the oracle."""
    base = [0.5, -0.25, 0.75, 0.1]
    other = [-0.4, 0.6, 0.2, -0.9]
    # query + 6 identical copies of base + 6 identical copies of other
    vecs = [[1.0, 0.0, 0.0, 0.0]] + [base] * 6 + [other] * 6
    _write(tmp_path, "embeddings", _emb_table(vecs))
    got = [
        (r["step"], r["vec_id"])
        for r in ext.q_search_mmr(spark, str(tmp_path)).orderBy("step").collect()
    ]
    exp = _brute_mmr(vecs, ext.MMR_K, ext.MMR_CAND, ext.MMR_LAM_NUM / 10)
    assert got == [e[:2] for e in exp]
    # within each duplicate family the SMALLEST ids must win first
    picked = [v for _, v in got]
    for fam in (set(range(1, 7)), set(range(7, 13))):
        fam_picked = [v for v in picked if v in fam]
        assert fam_picked == sorted(fam_picked)


def test_mmr_pool_smaller_than_k(spark, tmp_path):
    """Fewer candidates than MMR_K: return the short list, no crash."""
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.1, 0.9], [0.5, 0.5]]
    _write(tmp_path, "embeddings", _emb_table(vecs))
    rows = ext.q_search_mmr(spark, str(tmp_path)).collect()
    assert len(rows) == 3  # 3 candidates < MMR_K picks
    assert sorted(r["step"] for r in rows) == [1, 2, 3]


def test_ppjoin_supersets_lsh_verified_pairs(spark):
    """Cross-validation of two independent near-dup implementations:
    the EXACT prefix-filtered join at t=1/2 must contain every pair
    the MinHash-LSH path finds and Jaccard-verifies at the same
    threshold (LSH can only MISS pairs, never invent them)."""
    from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK
    from far_finer_airtable_firestore_sync_spark.operators import dedup_docs
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        MAX_CHARS,
        ROWS_PER_BAND,
        SEEDS,
        SHINGLE_N,
        _ppjoin_body,
        dedup_corpus,
    )

    corpus = dedup_corpus(spark, "/root/testdata/sf0.001")
    corpus.createOrReplaceTempView("_ffs_xval_docs")
    exact = {
        (r["id_a"], r["id_b"])
        for r in spark.sql(
            _ppjoin_body(SPARK, "_ffs_xval_docs", t_num=1, t_den=2)
        ).collect()
    }
    lsh = {
        (min(r["id_a"], r["id_b"]), max(r["id_a"], r["id_b"]))
        for r in dedup_docs.near_dup_pairs(
            corpus,
            shingle_n=SHINGLE_N,
            seeds=SEEDS,
            rows_per_band=ROWS_PER_BAND,
            max_chars=MAX_CHARS,
            threshold=0.5,
        ).collect()
    }
    assert lsh, "fixture produced no LSH pairs (weak test)"
    assert lsh <= exact, sorted(lsh - exact)[:5]
