"""BPE tokenizer inference (operators/tokenize.py)."""

import pytest

from far_finer_airtable_firestore_sync_spark.operators import tokenize


# ---------------------------------------------------------------------------
# pure merge-loop semantics (no Spark)
# ---------------------------------------------------------------------------


def test_apply_merges_basic_and_chaining():
    m = tokenize.DEFAULT_MERGES
    # chained: e+r -> er, then er+g -> erg
    assert tokenize.apply_merges("merge", m) == ["m", "erg", "e"]
    # chained: i+n -> in, in+d -> ind; o+w -> ow
    assert tokenize.apply_merges("window", m) == ["w", "ind", "ow"]
    # t+h -> th, th+e -> the (whole word collapses)
    assert tokenize.apply_merges("the", m) == ["the"]
    assert tokenize.apply_merges("scan", m) == ["s", "c", "an"]
    # no applicable merge: stays character-level
    assert tokenize.apply_merges("sql", m) == ["s", "q", "l"]
    assert tokenize.apply_merges("x", m) == ["x"]


def test_apply_merges_run_parity():
    """Overlapping runs merge leftmost non-overlapping: 1st+2nd,
    3rd+4th, ... — the training body's island/odd-rank rule."""
    m = (("g", "g"),)
    assert tokenize.apply_merges("gg", m) == ["gg"]
    assert tokenize.apply_merges("ggg", m) == ["gg", "g"]
    assert tokenize.apply_merges("gggg", m) == ["gg", "gg"]
    assert tokenize.apply_merges("ggggg", m) == ["gg", "gg", "g"]
    assert tokenize.apply_merges("agga", m) == ["a", "gg", "a"]


def test_rank_order_is_application_order():
    """A later rank built on an earlier rank's output fires; reversing
    the table order changes the result — rank order is semantics, not
    cosmetics."""
    fwd = (("a", "b"), ("ab", "c"))
    rev = (("ab", "c"), ("a", "b"))
    assert tokenize.apply_merges("abc", fwd) == ["abc"]
    # reversed: (ab,c) sees no 'ab' symbol yet, then a+b merges
    assert tokenize.apply_merges("abc", rev) == ["ab", "c"]


# ---------------------------------------------------------------------------
# Spark surfaces
# ---------------------------------------------------------------------------


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "the merge window"),
        (2, "scan scan agg"),
        (3, None),
        (4, ""),
        (5, "the the"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts_weighting(docs):
    got = {
        r["token"]: r["n"]
        for r in tokenize.token_counts(docs, top_k=50).collect()
    }
    # 'the' appears 3x across docs 1 and 5 and collapses to one token
    assert got["the"] == 3
    # scan -> s, c, an  (x2)
    assert got["s"] == 2 and got["c"] == 2 and got["an"] == 2
    # agg -> a, gg
    assert got["gg"] == 1
    # merge -> m, erg, e
    assert got["erg"] == 1
    # null/empty docs contribute nothing
    total = sum(got.values())
    expect = sum(
        len(tokenize.apply_merges(w, tokenize.DEFAULT_MERGES))
        for w in "the merge window scan scan agg the the".split()
    )
    assert total == expect


def test_tokenize_docs_round_trip(docs):
    out = {
        r["doc_id"]: r
        for r in tokenize.tokenize_docs(docs).collect()
    }
    # null/empty docs vanish (no words -> no row), same as word_counts
    assert set(out) == {1, 2, 5}
    assert out[1]["tokens"] == ["the", "m", "erg", "e", "w", "ind", "ow"]
    assert out[2]["tokens"] == ["s", "c", "an", "s", "c", "an", "a", "gg"]
    assert out[5]["tokens"] == ["the", "the"]
    for r in out.values():
        assert r["n_tokens"] == len(r["tokens"])
        # concatenating tokens rebuilds the word stream exactly


# ---------------------------------------------------------------------------
# property: rank-order passes == canonical min-rank-first loop
# ---------------------------------------------------------------------------


def _canonical_bpe(word, merges):
    """Reference: repeatedly merge the LOWEST-RANK pair present
    (leftmost non-overlapping within that rank) — the HuggingFace/
    GPT-2 encode loop."""
    rank = {pair: i for i, pair in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        present = {
            (syms[i], syms[i + 1]) for i in range(len(syms) - 1)
        } & set(rank)
        if not present:
            break
        a, b = min(present, key=lambda p: rank[p])
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _valid_merge_tables():
    """Random VALID merge tables: each merge's constituents exist when
    it is learned (base chars or outputs of EARLIER merges) — the
    invariant real BPE training guarantees and the equivalence proof
    relies on."""
    from hypothesis import strategies as st

    def build(draw):
        alphabet = ["a", "b", "c"]
        symbols = list(alphabet)
        merges = []
        n = draw(st.integers(min_value=0, max_value=8))
        for _ in range(n):
            a = draw(st.sampled_from(symbols))
            b = draw(st.sampled_from(symbols))
            if (a, b) in merges:
                continue
            merges.append((a, b))
            symbols.append(a + b)
        return tuple(merges)

    return st.composite(lambda draw: build(draw))()


def test_rank_order_equals_canonical_loop():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(
        word=st.text(alphabet="abc", min_size=0, max_size=16),
        merges=_valid_merge_tables(),
    )
    def check(word, merges):
        got = tokenize.apply_merges(word, merges)
        want = _canonical_bpe(word, merges)
        assert got == want
        assert "".join(got) == word  # lossless

    check()


def test_tokenize_docs_partition_invariant(spark):
    """Full-corpus tokenization must be identical at any shuffle
    width / input partitioning — the ordered re-aggregate sorts by
    (word position, within-word position), not arrival order."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(100)

    def run(parts, width):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(width))
        try:
            out = tokenize.tokenize_docs(docs.repartition(parts)).collect()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        return sorted((r["doc_id"], tuple(r["tokens"])) for r in out)

    assert run(2, 4) == run(16, 32)
