"""Independent-implementation oracles for the round-3 algorithms.

The DuckDB gate proves the two SQL dialects agree; these tests prove
the *algorithm* is right by re-implementing it in plain Python (greedy
loops, brute force) and comparing on seeded-random inputs. A design
bug shared by both SQL twins cannot hide from these.
"""

import math
import random

from pyspark.sql import Row

from far_finer_airtable_firestore_sync_spark.functions.canonical import SPARK
from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
    SPAN_WORDS,
    UNIMAX_EPOCH_CAP,
    _bm25_body,
    _repeated_spans_body,
    _unimax_body,
)

WORDS = ["spark", "window", "merge", "alpha", "beta", "gamma", "delta",
         "the", "a", "of", "data", "row"]


def _corpus(seed, n=40):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randint(1, 18)
        rows.append(
            Row(doc_id=i, source=f"s{rng.randint(0, 3)}",
                text=" ".join(rng.choices(WORDS, k=k)))
        )
    return rows


def _view(spark, rows, name):
    spark.createDataFrame(rows).createOrReplaceTempView(name)
    return name


def _py_bm25(rows, terms=("spark", "window", "merge"), k1=1.2, b=0.75):
    docs = {r.doc_id: r.text.split(" ") for r in rows}
    n = len(docs)
    total = sum(len(w) for w in docs.values())
    scores = {}
    for t in terms:
        df_t = sum(1 for w in docs.values() if t in w)
        if df_t == 0:
            continue
        idf_q = round(math.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0) * 1e6)
        for d, w in docs.items():
            tf = w.count(t)
            if not tf:
                continue
            dl = len(w)
            s = (tf * (idf_q / 1e6) * 2.2) / (
                tf + k1 * (0.25 + 0.75 * (dl * n) / total)
            )
            scores[d] = scores.get(d, 0) + round(s * 1e6)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    return {d: s / 1e6 for d, s in ranked}


def test_bm25_matches_python_reference(spark):
    for seed in (1, 2, 3):
        rows = _corpus(seed)
        rel = _view(spark, rows, "_t_abm")
        got = {
            r["doc_id"]: r["bm25"]
            for r in spark.sql(_bm25_body(SPARK, rel)).collect()
        }
        want = _py_bm25(rows)
        assert got.keys() == want.keys(), f"seed {seed}"
        for d in want:
            assert abs(got[d] - want[d]) < 1e-9, (seed, d, got[d], want[d])


def _py_spans(rows, k=SPAN_WORDS):
    grams = {}
    for r in rows:
        w = r.text.split(" ")
        for i in range(1, len(w) - k + 2):
            g = " ".join(w[i - 1:i - 1 + k])
            grams.setdefault(g, []).append((r.doc_id, i))
    flagged = {}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, i in occ:
                flagged.setdefault(d, set()).add(i)
    spans = set()
    for d, idxs in flagged.items():
        for i in sorted(idxs):
            if i - 1 in idxs:
                continue
            j = i
            while j + 1 in idxs:
                j += 1
            spans.add((d, i, j + k - 1, j - i + k))
    return spans


def test_repeated_spans_match_python_reference(spark):
    for seed in (4, 5):
        rows = _corpus(seed, n=60)
        rel = _view(spark, rows, "_t_aspan")
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_words"])
            for r in spark.sql(_repeated_spans_body(SPARK, rel)).collect()
        }
        assert got == _py_spans(rows), f"seed {seed}"


def _py_unimax(caps, budget, eps=1e-9):
    """Iterative waterfill: grow lambda until the budget is spent."""
    alloc = {s: 0.0 for s in caps}
    remaining = float(budget)
    active = set(caps)
    while remaining > eps and active:
        share = remaining / len(active)
        saturated = {s for s in active if caps[s] - alloc[s] <= share + eps}
        if not saturated:
            for s in active:
                alloc[s] += share
            remaining = 0.0
        else:
            for s in saturated:
                remaining -= caps[s] - alloc[s]
                alloc[s] = caps[s]
            active -= saturated
    return alloc


def test_unimax_matches_python_reference(spark):
    for seed in (7, 8, 9):
        rows = _corpus(seed, n=50)
        rel = _view(spark, rows, "_t_auni")
        got = {
            r["source"]: r
            for r in spark.sql(_unimax_body(SPARK, rel)).collect()
        }
        toks = {}
        for r in rows:
            toks[r.source] = toks.get(r.source, 0) + len(r.text.split(" "))
        caps = {s: t * UNIMAX_EPOCH_CAP for s, t in toks.items()}
        budget = math.floor(sum(toks.values()) / 2.0)
        want = _py_unimax(caps, budget)
        assert got.keys() == want.keys(), f"seed {seed}"
        for s in want:
            assert abs(got[s]["alloc_tokens"] - want[s]) < 1e-6, (
                seed, s, got[s]["alloc_tokens"], want[s],
            )


def _digest56(s):
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def _py_dsir(rows, buckets=512, targets=("src0", "src1")):
    def bigrams(words):
        if len(words) < 2:
            return [" ".join(words)]
        return [" ".join(words[i:i + 2]) for i in range(len(words) - 1)]

    doc_b = {}
    for r in rows:
        bs = [
            _digest56(g) % buckets
            for g in bigrams((r.text or "").split(" "))
        ]
        doc_b[r.doc_id] = (r.source, bs)
    cr, ct = {}, {}
    for _, (src, bs) in doc_b.items():
        for b in bs:
            cr[b] = cr.get(b, 0) + 1
            if src in targets:
                ct[b] = ct.get(b, 0) + 1
    r_total, t_total = sum(cr.values()), sum(ct.values())
    lr = {
        b: round(
            math.log(
                ((ct.get(b, 0) + 1) * (r_total + buckets))
                / ((cr[b] + 1) * (t_total + buckets))
            )
            * 1e6
        )
        for b in cr
    }
    out = {}
    for d, (_, bs) in doc_b.items():
        out[d] = (len(bs), sum(lr[b] for b in bs) / 1e6)
    return out


def test_dsir_matches_python_reference(spark):
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _dsir_body,
    )

    # sources must include the target domain names
    rng = random.Random(11)
    rows = [
        Row(doc_id=i,
            source=rng.choice(["src0", "src1", "web", "books"]),
            text=" ".join(rng.choices(WORDS, k=rng.randint(1, 15))))
        for i in range(50)
    ]
    rel = _view(spark, rows, "_t_adsir")
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_logw"])
        for r in spark.sql(_dsir_body(SPARK, rel)).collect()
    }
    want = _py_dsir(rows)
    assert got.keys() == want.keys()
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) < 1e-9, d


def test_hash_embed_matches_python_reference(spark):
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        HASH_EMBED_DIM,
        _hash_embed_body,
    )

    rows = _corpus(13, n=30)
    rel = _view(spark, rows, "_t_ahe")
    got = {
        r["doc_id"]: list(r["embedding"])
        for r in spark.sql(_hash_embed_body(SPARK, rel)).collect()
    }
    for r in rows:
        vec = [0] * HASH_EMBED_DIM
        for w in r.text.split(" "):
            h = _digest56(w)
            sign = 1 if (h % (2 * HASH_EMBED_DIM)) < HASH_EMBED_DIM else -1
            vec[h % HASH_EMBED_DIM] += sign
        assert got[r.doc_id] == vec, r.doc_id


def test_source_overlap_matches_python_reference(spark):
    from far_finer_airtable_firestore_sync_spark.plans.ext_queries import (
        _source_overlap_body,
    )

    rows = _corpus(17, n=50)
    rel = _view(spark, rows, "_t_aov")
    got = {
        (r["source_a"], r["source_b"]): (
            r["grams_a"], r["grams_b"], r["n_shared"], r["jaccard"]
        )
        for r in spark.sql(_source_overlap_body(SPARK, rel)).collect()
    }
    # python reference: distinct word-3-gram sets per source
    per_src = {}
    for r in rows:
        w = r.text.split(" ")
        if len(w) < 3:
            grams = {" ".join(w)}
        else:
            grams = {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        per_src.setdefault(r.source, set()).update(grams)
    want = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(per_src[a] & per_src[b])
            if inter:
                ga, gb = len(per_src[a]), len(per_src[b])
                want[(a, b)] = (ga, gb, inter, inter / (ga + gb - inter))
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) < 1e-12, k
