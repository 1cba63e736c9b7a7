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

# Dict iteration order = presentation order. Round-5 front-loads (a) the
# 14 entries that flipped rows-only -> hash-verified this round (streams,
# multimodal codecs, ANN partial-probe, kmeans, new graph surfaces), (b)
# every query whose implementation changed this round (embedding banding,
# langid fixed-point + char_ngrams rewrite, IVF routing rounding), and
# (c) the four temporal queries that regressed in round 4 on the
# TIMESTAMP_NTZ testdata and are restored — so CORRECTNESS_r05 certifies
# exactly the round's claims. Family anchors fill the remaining slots of
# the driver's 50-query window; the rest follows registration order.
_PRIORITY = [
    # (a) newly hash-verified this round (14)
    "stream_windowed_counts", "stream_sessionize", "stream_attribution",
    "stream_dedup_first_seen", "stream_near_dup",
    "multimodal_image_features", "multimodal_resize",
    "multimodal_audio_chunks",
    "ann_ivf_topk", "ann_rhp_topk", "kmeans_centroids",
    "graph_match_hop_predicate", "graph_match_varlen",
    "dedup_embedding_exhaustive_recall",
    # (a2) new round-5 operators (2)
    "dedup_simhash64_hamming", "lm_fluency",
    # (b) implementation changed this round (6)
    "dedup_embedding_cosine_bucketed", "dedup_embedding_clusters",
    "langid_nb", "fuzzy_name_match",
    "ann_ivf_full_probe", "ann_ivf_kmeans_full_probe",
    # (c) round-4 regressions restored by the NTZ ingestion fix (4)
    "sessionize_batch", "asof_view_before_purchase",
    "conversion_attribution", "event_interarrival",
    # family anchors round out the 50-slot window (26)
    "search_doc_flagship", "q1_pricing_summary", "q3_top_revenue",
    "q5_region_volume", "group_nest_columns", "key_templates",
    "presto_view_decode", "hive_union_nest", "sharded_table_grouping",
    "staleness_anti_join", "semi_join_exists", "union_dedup",
    "latest_execution_window", "cond_agg_subqueries", "windowed_event_agg",
    "search_doc_user", "search_doc_dashboard", "lineage_reachability",
    "dedup_exact", "dedup_minhash_lsh", "dedup_lsh_verified",
    "dedup_simhash_hamming", "ann_brute_force_topk", "centroid_assignment",
    "bm25_topk", "strip_boilerplate",
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
