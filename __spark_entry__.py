"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship search-document build (SURVEY §2.6,
reference: databuilder/extractor/neo4j_search_data_extractor.py:23-62) on
sf0.001. ``queries()``/``oracle_sql()`` expose the full oracle-verified
suite from amundsendatabuilder_spark.plans.oracle_suite — one entry per
operator class of SURVEY §2 plus the training-data pipeline operators.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from amundsendatabuilder_spark.plans.oracle_suite import ORACLES, QUERIES  # noqa: E402

# Dict iteration order = presentation order. Round-6 rotates the driver's
# 50-query sample window for evidence freshness (VERDICT r5 item #1): the
# 59 queries whose last driver certification is rounds 1-4 are front-loaded
# oldest-first, after (a) the queries that are new this round and (b) the
# r5-certified queries whose implementation changed this round (plan
# rewrites / codec policy), which need re-certification against current
# code. Overlap with the r5 sample window is the 6 changed-impl entries
# (< 10, per the rotation criterion); everything r5-certified and unchanged
# follows in registration order. Names not yet registered are skipped by
# ``_ordered``.
_PRIORITY = [
    # (a) new round-6 queries (certify on first driver run)
    "stream_attribution_outer", "multimodal_png_features",
    "graph_shortest_path", "multimodal_jpeg_features",
    "hll_distinct_sketch", "ann_pq_adc_topk",
    "stream_windowed_distinct", "multimodal_gif_frames",
    "graph_path_rel_props", "cms_heavy_hitters",
    "bloom_decontam_membership", "duplicate_substring_spans",
    "graph_pagerank", "triangle_cooccurrence", "funnel_stages",
    "stream_windowed_heavy_hitters", "jaccard_prefix_join",
    "inverted_index_postings", "zorder_layout_stats", "scd2_intervals",
    "linear_touch_credit", "bloom_prejoin_reduction",
    "densify_daily", "rolling_trailing_sum", "bigram_pmi_topk",
    "multimodal_spectral_peak", "decayed_popularity",
    "stratified_fixed_k", "burst_windows", "mixture_epochs",
    "interval_overlap_join", "containment_join", "journey_trigrams",
    "active_users_rollup", "cumulative_active_users",
    "joinability_discovery", "k_anonymity_audit", "ri_violations", "lineage_asof_diff",
    "numeric_corr_matrix", "class_keywords",
    "markov_transitions_ppm", "session_bounce_rate",
    # (b) r5-certified but implementation changed in round 6 (6 — the
    # only overlap with the r5 window)
    "graph_match_varlen", "langid_nb", "ann_rhp_topk",
    "multimodal_audio_chunks", "dedup_simhash_hamming",
    "dedup_simhash64_hamming",
    # (c) stale queries, oldest driver certification first: round 1
    "scan_filter_project", "lang_id", "quality_metrics",
    "doc_fingerprint", "embedding_norms", "char_ngram_profile",
    "pii_scrub", "repetition_metrics", "hash_sample_stratified",
    "vocab_topk", "corpus_length_stats",
    # round 2
    "epoch_transform", "literal_replace_transform",
    "template_substitution", "tag_normalize_explode",
    "json_props_extract", "usage_hash_count", "last_updated_max",
    "watermark_min_max", "staleness_guard_ratio", "right_join_tables",
    "self_join_same_region", "dedup_simhash", "dedup_ngram_jaccard",
    "dedup_embedding_cosine", "shard_watermarks",
    "top_customer_per_segment", "rollup_orders", "revenue_share",
    "graph_expand_tables", "dedup_clusters",
    "decontam_benchmark_overlap", "quality_quantile_filter",
    "mixture_rates", "token_shard_packing",
    # round 4 (oldest of the rest; fills the 50-slot window)
    "dedup_ngram_jaccard_capped", "publish_diff", "skew_salted_join",
    "skew_salted_collect", "embedding_label_centroids",
    "pivot_status_by_priority", "search_doc_table_built",
    # remaining round-4 stale — next in line beyond the 50-slot window
    "graph_match_pattern", "graph_match_2hop", "column_profile",
    "stat_aggregates", "cohort_retention", "sliding_window_counts",
    "multimodal_frame_plan", "incremental_ingest_anti_join",
    "doc_chunking", "cross_source_overlap", "split_assign",
    "dedup_rate_by_source", "boilerplate_chunks", "strip_boilerplate",
    "bm25_topk", "token_count_histogram", "quantize_embeddings",
]


def _ordered(mapping: dict) -> dict:
    out = {k: mapping[k] for k in _PRIORITY if k in mapping}
    out.update((k, v) for k, v in mapping.items() if k not in out)
    return out


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["search_doc_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (keys without an entry
    get the driver's weaker rows-only check)."""
    return _ordered(ORACLES)
