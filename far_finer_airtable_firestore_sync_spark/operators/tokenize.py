"""BPE tokenizer INFERENCE — apply a learned merge table to a corpus.

Counterpart of the distributed BPE *training* entry
(``plans/ext_queries._bpe_body``; Sennrich/Haddow/Birch 2016, public
paper): training emits the ranked merge list, this module applies it.
The reference pipeline's whitespace token counting
(/root/reference/lib/DataProcessor.py:142-148 neighborhood — string
heuristics over record fields) is the word-level baseline; this is the
subword upgrade a training-data pipeline actually runs.

Scale design (the whole point of the split):

- Encoding is applied to the DISTINCT word table, never the corpus.
  At 100 TB the corpus collapses to (word, count) with one map-side
  combined shuffle; the Python merge loop then runs over a
  vocabulary-sized relation (millions of rows, not trillions) inside
  an Arrow-batched ``mapInPandas`` — the standard tokenizer-inference
  shape (HuggingFace tokenizers does exactly this per unique word with
  a cache).
- The merge table itself is a tiny broadcast (closure capture): rank
  order IS application order. Applying merges one rank at a time in
  ascending rank is equivalent to the canonical "repeatedly merge the
  lowest-rank pair present" loop, because a merge at rank r creates a
  NEW symbol — adjacencies it creates can only match pairs whose
  constituent was created at rank r, i.e. pairs learned AFTER r; no
  already-passed rank can become applicable again.
- Full-corpus tokenization (``tokenize_docs``) is the mapping joined
  back to the exploded corpus — the vocabulary side broadcasts, the
  corpus side never shuffles except the per-doc ordered re-aggregate.

Within one rank the pass is the leftmost non-overlapping scan (the
run-parity rule: 'gggg' + (g,g) -> 'gg','gg', not 'gg','g','g'),
matching the training body's island/odd-rank SQL exactly.

Characters are Python code points; the DuckDB oracle's
``substring(word, i, 1)`` agrees for all BMP text (the fixture is
ASCII).
"""

from typing import Iterable, Iterator, List, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: A deterministic "learned offline" merge table (rank order = list
#: order). Chained merges on purpose: er+g, in+d and th+e consume
#: symbols created by earlier ranks, and (g,g) exercises the
#: overlapping-run parity rule.
DEFAULT_MERGES: Tuple[Tuple[str, str], ...] = (
    ("g", "g"),
    ("e", "r"),
    ("i", "n"),
    ("o", "w"),
    ("er", "g"),
    ("a", "n"),
    ("in", "d"),
    ("t", "h"),
    ("th", "e"),
)


def apply_merges(word: str, merges: Sequence[Tuple[str, str]]) -> List[str]:
    """Encode one word: one leftmost non-overlapping pass per merge
    rank, in rank order (see module docstring for why that equals the
    canonical min-rank-first loop)."""
    syms: List[str] = list(word)
    for a, b in merges:
        if len(syms) < 2:
            break
        out: List[str] = []
        i, n = 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) over single-space-split lowercase text — the same
    extraction as the BPE training body (null text ≡ empty)."""
    return (
        docs.select(
            F.explode(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
            ).alias("word")
        )
        .filter("word <> ''")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("wc"))
    )


def encode_words(
    words: DataFrame, merges: Sequence[Tuple[str, str]] = DEFAULT_MERGES
) -> DataFrame:
    """(word, wc) -> one row per (word, wc, pos, token). Arrow-batched
    mapInPandas over the vocabulary-sized relation; emits the token
    position so callers can rebuild ordered token streams."""
    table = tuple((a, b) for a, b in merges)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            out_w, out_c, out_p, out_t = [], [], [], []
            for word, wc in zip(pdf["word"], pdf["wc"]):
                toks = cache.get(word)
                if toks is None:
                    toks = apply_merges(word, table)
                    cache[word] = toks
                for p, t in enumerate(toks, start=1):
                    out_w.append(word)
                    out_c.append(wc)
                    out_p.append(p)
                    out_t.append(t)
            yield pd.DataFrame(
                {"word": out_w, "wc": out_c, "pos": out_p, "token": out_t}
            )

    return words.mapInPandas(
        run, "word string, wc long, pos int, token string"
    )


def token_counts(
    docs: DataFrame,
    merges: Sequence[Tuple[str, str]] = DEFAULT_MERGES,
    top_k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Corpus token histogram after BPE encoding: top-k (token, n)
    with count-desc, token-asc deterministic ordering. The corpus
    contributes only the (word, wc) aggregate; token counts weight by
    wc, so no per-document work happens at all."""
    enc = encode_words(word_counts(docs, text_col), merges)
    return (
        enc.groupBy("token")
        .agg(F.sum("wc").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(top_k)
    )


def tokenize_docs(
    docs: DataFrame,
    merges: Sequence[Tuple[str, str]] = DEFAULT_MERGES,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full-corpus tokenization: (doc_id, n_tokens, tokens). The
    vocabulary→tokens mapping (word-grain, small) broadcasts into the
    exploded corpus; the only corpus-scale shuffle is the per-doc
    ordered re-aggregate. Token order is (word position, position
    within word)."""
    positioned = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), " ")
        ).alias("wpos", "word"),
    ).filter("word <> ''")
    mapping = encode_words(
        positioned.select("word").distinct().withColumn(
            "wc", F.lit(1).cast("long")
        ),
        merges,
    ).select("word", "pos", "token")
    return (
        positioned.join(F.broadcast(mapping), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_sort(
                F.collect_list(F.struct("wpos", "pos", "token"))
            ).alias("_ord"),
        )
        .select(
            id_col,
            "n_tokens",
            F.expr("transform(_ord, s -> s.token)").alias("tokens"),
        )
    )
