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

# Dict iteration order = presentation order. Round-12 window (50
# slots): a CONSOLIDATION round per the r11 verdict (item #1 — "clear
# the certification-age debt in one sweep; put the oldest rows first
# in _PRIORITY, new work after"). The operator surface is saturating,
# so re-certs dominate:
# (a) the 34 rows whose newest green driver cert is r5-era — the 10
# c2-tail rows the r11 late wave pushed past the window plus the 24
# block-(d) deferrals, oldest debt in the suite, alphabetical;
# (b) new in round 12 (zero certs): the mutual-NN production-config
# recall audit (r11 verdict item #4);
# (b') semantics changed in round 12: stream_bottomk_sample's emit path
# now re-trims to [:k] (output identical on this fixture, but the
# operator changed — re-certify, the r11 (b') rule);
# (c) r6-era re-certs, alphabetical, filling the remaining window
# slots; overflow defers one round exactly like the r10/r11 deferrals.
# Names not registered are skipped by ``_ordered``.
_PRIORITY = [
    # (a) r5-era re-certs — the oldest certification debt (34 rows)
    "asof_view_before_purchase", "centroid_assignment",
    "cond_agg_subqueries", "conversion_attribution",
    "dedup_embedding_clusters", "dedup_embedding_cosine_bucketed",
    "dedup_embedding_exhaustive_recall", "dedup_exact",
    "dedup_lsh_verified", "dedup_minhash_lsh",
    "event_interarrival", "fuzzy_name_match", "graph_match_hop_predicate",
    "group_nest_columns", "hive_union_nest",
    "key_templates", "latest_execution_window", "lineage_reachability",
    "lm_fluency", "multimodal_image_features", "presto_view_decode",
    "q1_pricing_summary", "q3_top_revenue", "q5_region_volume",
    "semi_join_exists", "sharded_table_grouping",
    "staleness_anti_join", "stream_attribution", "stream_dedup_first_seen",
    "stream_near_dup", "stream_sessionize", "stream_windowed_counts",
    "union_dedup", "windowed_event_agg",
    # (b) new in round 12 (zero certs): the production-config recall
    # audit vs the uncapped pin, and its exact-ground-truth companion
    "mutual_nn_recall_report", "mutual_nn_exact_recall_report",
    # (b') implementation changed in round 12: bottom-k emit-path [:k]
    # re-trim; modularity top-n rewritten TakeOrderedAndProject
    # (bit-identical rows, new physical plan — re-certify, the r11 rule)
    "stream_bottomk_sample", "graph_modularity",
    # (c) r6-era re-certs, alphabetical — the first 12 fit the 50-slot
    # window (through densify_daily); the remaining 27 defer one round
    # (same rule as r10/r11). Window arithmetic: the true r5/r6-era debt
    # is 73 rows (34 r5 + 39 r6, computed from the CORRECTNESS_r* files
    # directly), larger than the verdict's 44-row estimate, so clearing
    # it takes this window plus part of r13's — all 73 are green on the
    # r12 LOCAL gate (CORRECTNESS_LOCAL_r12.json, 311/311) meanwhile.
    "active_users_rollup", "ann_pq_adc_topk",
    "bigram_pmi_topk", "bloom_decontam_membership",
    "bloom_prejoin_reduction", "burst_windows", "class_keywords",
    "cms_heavy_hitters", "cumulative_active_users",
    "dedup_simhash64_hamming", "dedup_simhash_hamming", "densify_daily",
    "duplicate_substring_spans", "funnel_stages",
    "graph_match_varlen", "graph_path_rel_props", "graph_shortest_path",
    "hll_distinct_sketch", "inverted_index_postings",
    "joinability_discovery", "journey_trigrams", "k_anonymity_audit",
    "langid_nb", "linear_touch_credit", "mixture_epochs",
    "multimodal_audio_chunks", "multimodal_gif_frames",
    "multimodal_jpeg_features", "multimodal_png_features",
    "multimodal_spectral_peak", "ri_violations", "rolling_trailing_sum",
    "scan_filter_project", "scd2_intervals", "stratified_fixed_k",
    "stream_attribution_outer", "stream_windowed_distinct",
    "stream_windowed_heavy_hitters", "zorder_layout_stats",
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
