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

# Dict iteration order = presentation order. Round-9 window (50 slots,
# r8 VERDICT item #1): (a) the 4 certification-debt queries —
# quality_decile_table / equi_depth_boundaries have never seen a driver
# window; search_doc_user / search_doc_dashboard had their oracles
# extended (commit 406d9ff) after their last certification, so the
# existing green rows attest the old schema (and search_doc_user gains
# is_active/full_name parity this round); (b)
# graph_match_varlen_undirected, whose semantics changed this round
# (Cypher relationship-uniqueness fix), needs re-certification; (c) the
# 76 round-9 additions, never driver-certified; (d) the
# oldest-certified entries (r1–r4 era), oldest first, to keep every
# cert fresh under the rotation discipline. Names not yet registered
# are skipped by ``_ordered``.
_PRIORITY = [
    # (a) certification debt — never certified, or oracle changed post-cert
    "quality_decile_table", "equi_depth_boundaries",
    "search_doc_user", "search_doc_dashboard",
    # (b) semantics changed in round 9 — prior cert attests old behavior
    "graph_match_varlen_undirected",
    # (c) round-9 additions — never driver-certified; local-gate +
    # unit-test evidence committed (CORRECTNESS_LOCAL_r09.json), the
    # driver window provides the hard signal
    "equi_depth_boundaries_grouped", "dedup_incremental_lsh",
    "leakage_safe_split", "epoch_shuffle_shards",
    "ngram_novelty", "filter_funnel_report", "hll_source_overlap",
    "q2_min_acctbal_supplier", "q8_market_share",
    "q9_profit_by_nation_year", "q11_part_value_share", "q13_custdist",
    "q14_promo_revenue", "q15_top_supplier", "q16_supplier_count_by_part",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_revenue", "q20_excess_shippers",
    "q21_waiting_suppliers", "q22_idle_customer_balance",
    "weighted_sample_wor", "temperature_mixture_plan",
    "graph_k_core",
    "mixture_interleave_schedule",
    "embedding_decontam_audit",
    "dsir_importance_weights",
    "padding_waste_report",
    "ngram_diversity",
    "hard_negative_mining",
    "concat_window_packing",
    "split_leak_audit",
    "oov_rate_report",
    "zipf_alpha_report",
    "jl_distortion_audit",
    "quality_rank_blend",
    "winnowing_fingerprints",
    "embedding_dim_robust_stats",
    "heaps_law_fit",
    "token_js_divergence",
    "vocab_coverage_curve",
    "bootstrap_ci_quality",
    "benford_audit",
    "chi_square_independence",
    "ks_drift_stat",
    "gini_inequality",
    "cluster_label_nmi",
    "readability_report",
    "ngram_entropy_rate",
    "importance_ess",
    "spearman_correlation",
    "theil_decomposition",
    "hyperball_reach",
    "degree_assortativity",
    "hyperball_harmonic",
    "dup_affinity_matrix",
    "variance_decomposition",
    "missingness_matrix",
    "hapax_report",
    "similarity_histogram",
    "rank_auc",
    "classifier_kappa",
    "autocorrelation_report",
    "search_ndcg",
    "stream_benford_registers",
    "keyness_g2",
    "token_source_mi",
    "lsh_parameter_plan",
    "multimodal_phash_dedup",
    "ks_time_drift",
    "multimodal_audio_dedup",
    "pca_power_iteration",
    "pca_explained_variance",
    "stream_minhash_registers",
    "pca_top_components",
    "graph_effective_diameter",
    # (d) oldest-certified entries, oldest certification first
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
    "session_bounce_rate", "sessionize_batch",
    # --- beyond the 50-slot window: next-oldest re-certs continue ---
    "multimodal_resize",
    "decayed_popularity", "numeric_corr_matrix", "kmeans_centroids",
    "lineage_asof_diff",
    "search_doc_table_built",
    "graph_match_pattern", "graph_match_2hop", "column_profile",
    "stat_aggregates", "cohort_retention", "sliding_window_counts",
    "multimodal_frame_plan", "incremental_ingest_anti_join",
    "doc_chunking", "cross_source_overlap", "split_assign",
    "dedup_rate_by_source", "boilerplate_chunks", "strip_boilerplate",
    "bm25_topk", "token_count_histogram", "quantize_embeddings",
    "search_doc_flagship",
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
