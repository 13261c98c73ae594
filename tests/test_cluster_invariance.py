"""Cluster-size invariance: results must be identical multisets when
the shuffle width changes (4 vs 32 partitions) — the property that
makes every determinism claim in SCALE.md hold on a real cluster,
where partition counts differ from the test harness.

Covers one entry per shuffle-heavy family: hash-agg dedup, LSH
self-join, window packing, salted aggregation, seeded shard shuffle.
"""

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"

ENTRIES = [
    "keep_latest_dedup",
    "dedup_lsh_pairs",
    "pack_next_fit",
    "salted_agg_revenue",
    "corpus_shard_shuffle",
    # round-3 shuffle-heavy families: postings ranking, digest
    # self-join spans, fixed-bucket-domain aggregation, rank fusion
    "text_bm25_search",
    "dedup_repeated_spans",
    "dsir_importance_weights",
    "search_hybrid_rrf",
    "text_hash_embed",
    "mining_hard_negatives",
    "corpus_split_leakage_safe",
    "retrieval_eval_ndcg",
    "dedup_lsh_eval",
    # round-4 families: partition-dependent candidate pass + exact
    # verify, span-removal range join + ordered re-agg, top-k heap
    "text_heavy_hitters",
    "dedup_strip_spans",
    "sample_weighted_es",
    # round-4b families: sketch over hash ranks, per-doc keyed
    # entropy, exact prefix-filtered self-join, two-pass expansion,
    # cross-type integer-grid drift, rank-selection medians
    "sketch_kmv_distinct",
    "text_word_entropy",
    "dedup_ppjoin_exact",
    "search_rm3_expansion",
    "event_mix_drift",
    "event_value_mad",
    "text_pmi_collocations",
    "scd2_build",
    "dedup_pagerank",
    "sketch_cms_counts",
    "events_gapfill",
    # round-5 families: register-sketch max agg, per-doc argmax spine,
    # positions-index adjacency join, vocab window chain, changelog
    # retraction merge, per-bucket checksum sums
    "sketch_hll_distinct",
    "shard_rendezvous",
    "search_phrase",
    "tokenizer_bpe_merges",
    "store_ivm_rollup",
    "store_bucket_drift",
    # round-5 third wave: vocabulary mapInPandas encode (Arrow batch
    # boundaries move with width), member-set argmax, rare-postings
    # self-join, window-min fingerprint selection, dual-window margin
    # ranks, band-bucket ANN join, Expand aggregate, value-RANGE frame
    "tokenizer_bpe_encode",
    "dedup_keep_best",
    "dedup_containment",
    "text_winnowing",
    "mining_bitext_margin",
    "similarity_srp_lsh_topk",
    "agg_grouping_sets",
    "window_range_frame",
    "top_supplier_revenue",
    "variant_extract",
    "multimodal_framesample",
    "csv_json_roundtrip",
    "dedup_apply_best",
    "sketch_kmv_intersect",
    "rfm_segments",
    "text_sentiment",
    # round-6 families: pigeonhole hamming self-joins (text + three
    # decode-path modalities), segment-probe edit join, widened-sum
    # regression, sketch register merge, boundary-point sweep window,
    # bucket-pruned diff, connector write-read roundtrip
    "dedup_simhash_pairs",
    "dedup_edit_distance_pairs",
    "multimodal_image_dhash_pairs",
    "multimodal_audio_fp_pairs",
    "multimodal_video_fp_pairs",
    "events_user_trend",
    "events_max_concurrency",
    "sketch_hll_range_merge",
    "store_bucket_repair",
    "similarity_brp_lsh_topk",
    "dedup_lsh_pairs_fast",
    "record_sink_roundtrip",
]


def _canon(df):
    return sorted(
        tuple(str(v) for v in row) for row in df.collect()
    )


@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_under_shuffle_width(spark, name):
    q = entry_mod.queries()[name]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        narrow = _canon(q(spark, SF_DIR))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        wide = _canon(q(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert narrow == wide
