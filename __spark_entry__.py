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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["search_doc_flagship"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each query (keys without an entry
    get the driver's weaker rows-only check)."""
    return dict(ORACLES)
