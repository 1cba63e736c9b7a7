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

# Dict iteration order = presentation order. Front-load one representative
# of every operator family (reference parity first, then the training-data
# pipeline) so any prefix of the suite is a balanced sample; the remainder
# follows in registration order.
_PRIORITY = [
    "search_doc_flagship", "q1_pricing_summary", "q3_top_revenue",
    "q5_region_volume", "group_nest_columns", "usage_hash_count",
    "key_templates", "epoch_transform", "literal_replace_transform",
    "template_substitution", "tag_normalize_explode", "json_props_extract",
    "presto_view_decode", "hive_union_nest", "sharded_table_grouping",
    "shard_watermarks", "watermark_min_max", "last_updated_max",
    "staleness_anti_join", "staleness_guard_ratio", "semi_join_exists",
    "right_join_tables", "self_join_same_region", "union_dedup",
    "latest_execution_window", "top_customer_per_segment",
    "cond_agg_subqueries", "rollup_orders", "revenue_share",
    "windowed_event_agg", "sessionize_batch", "asof_view_before_purchase",
    "conversion_attribution", "search_doc_user", "search_doc_dashboard",
    "graph_expand_tables", "lineage_reachability", "dedup_exact",
    "dedup_minhash_lsh", "dedup_lsh_verified", "dedup_clusters",
    "dedup_simhash", "dedup_ngram_jaccard", "dedup_embedding_cosine",
    "ann_brute_force_topk", "ann_ivf_full_probe",
    "decontam_benchmark_overlap", "quality_quantile_filter",
    "mixture_rates", "token_shard_packing",
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
