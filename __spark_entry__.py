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

# Dict iteration order = presentation order. Round-11 window (50 slots,
# r10 VERDICT items #1-3): demand this round exceeds the window (12
# new entries + 4 changed-semantics + 8 changed-plan + the 49 oldest
# certs: 11 r4-era left over from the r10 window's 7-slot (c) block +
# 38 r5-era), so zero-cert entries, changed semantics, and changed
# plans take precedence over re-certification of stable rows; the
# remaining r5-era rows defer one round (block (d)):
# (a) the 9 round-11 additions — the capped/collapsed production twins
# of the embedding pairwise AND simhash families + their two
# no-silent-caps audits (verdict items #1-2 plus their pre-emptive
# extension to the next super-linear tier) and the end-to-end
# classifier holdout loop (item #7);
# (b) semantics/oracle changed in round 11 — logreg_weight_explain
# (token df is now count(DISTINCT doc), the r10 advice fix),
# mixture_reweight_quality (DECIMAL/HUGEINT exact tilt), plus
# filter_funnel_report (oracle gained the NULL-fails branch) and
# stream_asof_join (view-only state eviction) whose r10 rows attest the
# prior text;
# (b') implementation changed in round 11, output bit-identical but the
# physical plan is new — the PPJoin family's array_intersect verify and
# the rhp_band_sigs posexplode-first rewrite (every banded-embedding
# consumer); re-certify the changed plans in-window;
# (c) strict oldest-first rotation: all 11 remaining r4-era rows, then
# the first 18 r5-era rows — the 8 alphabetically-last of the r10 plan's
# c2 block defer one round to make room for (b');
# (d) beyond the window: the deferred r5-era rows, then r6-era.
# LATE-WAVE AMENDMENT: blocks (a0)/(a0') prepend 6 zero-cert additions
# (graph_modularity, knn_label_disagreement, uncertainty_sampling,
# bpe_fertility_report, stream_bottomk_sample, skew_salting_plan) and
# 4 changed-plan re-certs (shared-covariance/one-checkpoint PCA trio +
# the groupBy-pair-expansion triangle edges), pushing the last 10 of
# (c2) past the 50-slot window — they defer one round, same rule as
# the r10 deferral.
# Names not registered are skipped by ``_ordered``.
_PRIORITY = [
    # (a0) new in the round-11 late wave (zero certs) — modularity of
    # the LPA communities, the kNN label-noise screen, margin sampling
    "graph_modularity", "knn_label_disagreement", "uncertainty_sampling",
    "bpe_fertility_report", "stream_bottomk_sample", "skew_salting_plan",
    # (a0') plans changed in the round-11 late wave (bit-identical
    # output): shared-covariance/one-checkpoint eigensolve, groupBy
    # pair-expansion triangle edges
    "pca_power_iteration", "pca_top_components", "pca_explained_variance",
    "triangle_cooccurrence",
    # (a) new in round 11
    "ann_recall_report", "ivf_recall_report",
    "jaccard_prefix_join_frac_capped", "similarity_frac_cap_report",
    "mutual_nn_dedup_capped", "rhp_cap_audit", "hard_negative_banded",
    "embedding_decontam_banded", "logreg_holdout_auc",
    "dedup_simhash_hamming_capped", "dedup_simhash64_capped",
    "dedup_embedding_bucketed_capped", "simhash_cap_audit",
    # (b) semantics/oracle changed in round 11
    "logreg_weight_explain", "mixture_reweight_quality",
    "filter_funnel_report", "stream_asof_join",
    # (b') implementation changed in round 11 (bit-identical output,
    # new physical plan): PPJoin array_intersect verify + RHP
    # posexplode-first signatures
    "jaccard_prefix_join", "jaccard_prefix_join_capped",
    "containment_join", "containment_join_capped",
    "ann_rhp_topk", "mutual_nn_dedup", "hard_negative_mining",
    "embedding_decontam_audit",
    # (c1) oldest-certified (round 4) re-certs — the 11 rows the r10
    # window could not fit
    "graph_match_2hop", "graph_match_pattern",
    "incremental_ingest_anti_join", "multimodal_frame_plan",
    "quantize_embeddings", "search_doc_table_built",
    "sliding_window_counts", "split_assign", "stat_aggregates",
    "strip_boilerplate", "token_count_histogram",
    # (c2) round-5 re-certs, oldest-first (alphabetical within the era)
    "ann_brute_force_topk", "ann_ivf_full_probe",
    "ann_ivf_kmeans_full_probe", "ann_ivf_topk", "asof_view_before_purchase",
    "centroid_assignment", "cond_agg_subqueries", "conversion_attribution",
    "dedup_embedding_clusters", "dedup_embedding_cosine_bucketed",
    "dedup_embedding_exhaustive_recall", "dedup_exact", "dedup_lsh_verified",
    "dedup_minhash_lsh",
    # (d) beyond the 50-slot window: the deferred r5-era rows (11 more
    # deferred this round to fit the (b') changed-plan re-certs and the
    # new recall reports / fractional-cap twin + audit — zero-cert
    # entries and changed implementations outrank stable re-certs),
    # then r6-era
    "event_interarrival", "fuzzy_name_match", "graph_match_hop_predicate",
    "group_nest_columns", "hive_union_nest",
    "key_templates", "latest_execution_window", "lineage_reachability",
    "lm_fluency", "multimodal_image_features", "presto_view_decode",
    "q1_pricing_summary",
    "q3_top_revenue", "q5_region_volume", "semi_join_exists",
    "sharded_table_grouping",
    "staleness_anti_join", "stream_attribution", "stream_dedup_first_seen",
    "stream_near_dup", "stream_sessionize", "stream_windowed_counts",
    "union_dedup", "windowed_event_agg",
    "active_users_rollup", "ann_pq_adc_topk",
    "bigram_pmi_topk", "bloom_decontam_membership", "bloom_prejoin_reduction",
    "burst_windows", "class_keywords", "cms_heavy_hitters",
    "cumulative_active_users", "dedup_simhash64_hamming",
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
