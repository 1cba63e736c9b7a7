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

# Dict iteration order = presentation order. Round-8 window (50 slots,
# r7 VERDICT item #1): (a) the 49 queries NEW in round 7 — all green in
# the round-7 independent 201/201 local gate but never driver-certified
# (they queued beyond the r7 window by the adopted discipline); (b) one
# re-certification slot for the flagship. Queries NEW in round 8 sit
# immediately beyond the window with local-gate + unit-test evidence
# and queue for the r9 rotation. Names not yet registered are skipped
# by ``_ordered``.
_PRIORITY = [
    # (a) the 49 round-7 queries awaiting first driver certification
    "jaccard_prefix_join_capped", "containment_join_capped",
    "similarity_cap_report", "graph_match_mixed_direction",
    "budget_selection", "content_defined_chunks", "dedup_quality_winner",
    "cdc_chunk_dedup_rate", "fd_violations", "distribution_drift",
    "lateness_profile", "pipeline_end_to_end",
    "graph_match_varlen_undirected", "fuzzy_entity_match",
    "skew_report", "split_exact_counts", "equi_depth_histogram",
    "bpe_merge_training", "hybrid_rrf_fusion", "mad_outliers",
    "graph_label_propagation", "cdc_upsert_apply", "expectation_audit",
    "stream_static_enrich", "trend_slopes", "corpus_merkle_digest",
    "q7_nation_volume", "q10_returned_items",
    "grouping_sets_volume", "embedding_label_outliers",
    "embedding_covariance", "l_diversity_audit",
    "basket_association_rules", "graph_link_prediction",
    "feature_hashing", "stream_last_writer_upsert", "graph_hash_walks",
    "dataset_card", "bpe_encode_counts", "interval_union_coverage",
    "histogram_quantile_sketch", "graph_feature_propagation",
    "temporal_reachability", "stream_histogram_registers",
    "quality_decile_profile", "event_seasonality_heatmap",
    "q4_order_priority", "q6_forecast_revenue", "q12_shipmode_priority",
    # (b) re-certification slot (fills the 50-slot window: 49 + 1)
    "search_doc_flagship",
    # --- beyond the window: round-8 additions queue here ---
    "quality_decile_table", "equi_depth_boundaries",
    # (stale-certified entries follow, oldest certification first)
    "lang_id", "quality_metrics", "doc_fingerprint", "embedding_norms",
    "char_ngram_profile", "pii_scrub", "repetition_metrics",
    "hash_sample_stratified", "vocab_topk", "corpus_length_stats",
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
    "dedup_ngram_jaccard_capped", "publish_diff", "skew_salted_join",
    "skew_salted_collect", "embedding_label_centroids",
    "pivot_status_by_priority",
    "graph_pagerank", "interval_overlap_join", "markov_transitions_ppm",
    "session_bounce_rate", "sessionize_batch", "multimodal_resize",
    "decayed_popularity", "numeric_corr_matrix", "kmeans_centroids",
    "lineage_asof_diff",
    "search_doc_table_built",
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
