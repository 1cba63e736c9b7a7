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

# Dict iteration order = presentation order. Round-10 window (50 slots,
# r9 VERDICT items #1-2): (a) the 31 round-9 queries that are local-gate
# green + unit-tested but have NEVER seen a driver certification window
# (the r9 window held 50 slots; the wave added 76) — a green
# CORRECTNESS_r10 row for each closes out a fully driver-certified
# suite; (b) the 11 round-10 additions (stream_asof_join, search_pr_at_k,
# dedup_minhash_estimate, curriculum_schedule, rank_rbo_lists,
# mutual_nn_dedup, logreg_quality_train/score, score_calibration, logreg_weight_explain, mixture_reweight_quality)
# plus
# jl_distortion_audit, whose
# pair sampler changed this round (md5-hashed id mod cuts, the r9 advice
# fix) so its r9 cert attests the old sampling — 31 + 12 = 43; (c) the
# oldest-certified entries (r4-era) under the rotation discipline fill
# the remaining 7 slots; (d) the rest of the r4 set and the next-oldest
# (r5-era) continue beyond the window. Names not registered are skipped
# by ``_ordered``.
_PRIORITY = [
    # (a) never driver-certified round-9 additions
    "autocorrelation_report", "classifier_kappa", "cluster_label_nmi",
    "degree_assortativity", "dup_affinity_matrix", "gini_inequality",
    "graph_effective_diameter", "hapax_report", "hyperball_harmonic",
    "hyperball_reach", "importance_ess", "keyness_g2", "ks_time_drift",
    "lsh_parameter_plan", "missingness_matrix", "multimodal_audio_dedup",
    "multimodal_phash_dedup", "ngram_entropy_rate", "pca_explained_variance",
    "pca_power_iteration", "pca_top_components", "rank_auc",
    "readability_report", "search_ndcg", "similarity_histogram",
    "spearman_correlation", "stream_benford_registers",
    "stream_minhash_registers", "theil_decomposition", "token_source_mi",
    "variance_decomposition",
    # (b) new in round 10 / semantics changed in round 10
    "stream_asof_join", "jl_distortion_audit", "search_pr_at_k",
    "dedup_minhash_estimate", "curriculum_schedule", "rank_rbo_lists",
    "mutual_nn_dedup", "logreg_quality_train",
    "logreg_quality_score", "score_calibration", "logreg_weight_explain",
    "mixture_reweight_quality",
    # (c) oldest-certified (round 4) rotation re-certs
    "bm25_topk", "boilerplate_chunks", "cohort_retention", "column_profile",
    "cross_source_overlap", "dedup_rate_by_source", "doc_chunking",
    "graph_match_2hop", "graph_match_pattern",
    "incremental_ingest_anti_join", "multimodal_frame_plan",
    "quantize_embeddings", "search_doc_table_built", "sliding_window_counts",
    "split_assign", "stat_aggregates", "strip_boilerplate",
    "token_count_histogram",
    # (d) beyond the 50-slot window: next-oldest (round 5) re-certs
    "ann_brute_force_topk", "ann_ivf_full_probe",
    "ann_ivf_kmeans_full_probe", "ann_ivf_topk", "asof_view_before_purchase",
    "centroid_assignment", "cond_agg_subqueries", "conversion_attribution",
    "dedup_embedding_clusters", "dedup_embedding_cosine_bucketed",
    "dedup_embedding_exhaustive_recall", "dedup_exact", "dedup_lsh_verified",
    "dedup_minhash_lsh", "event_interarrival", "fuzzy_name_match",
    "graph_match_hop_predicate", "group_nest_columns", "hive_union_nest",
    "key_templates", "latest_execution_window", "lineage_reachability",
    "lm_fluency", "multimodal_image_features", "presto_view_decode",
    "q1_pricing_summary", "q3_top_revenue", "q5_region_volume",
    "semi_join_exists", "sharded_table_grouping", "staleness_anti_join",
    "stream_attribution", "stream_dedup_first_seen", "stream_near_dup",
    "stream_sessionize", "stream_windowed_counts", "union_dedup",
    "windowed_event_agg",
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
