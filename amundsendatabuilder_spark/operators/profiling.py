"""Column profiling — the stats-ingestion job that populates the catalog's
per-column statistics (reference model: databuilder/models/table_stats.py
TableColumnStats with its {stat_type} key scheme; the reference ships the
model but no profiler — stats arrive from external jobs. Here the profiler
IS an engine operator).

One pass over the table computes every column's stats as a wide aggregate
(all map-side combinable), then `stack` unpivots to one row per
(column, stat) — the exact shape `expand_column_stats` ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    stddev) for each numeric/orderable column, computed in ONE pass.

    n_distinct is exact (for oracle parity); at 100 TB substitute
    approx_count_distinct with a bounded relative error. min/max emit as
    strings so heterogeneous column types share one schema — matching the
    reference's stringly-typed stat values (models/table_stats.py:17-20).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            round_half_away(F.stddev(c), 4).alias(f"{c}__stddev"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, "
        f"`{c}__min`, `{c}__max`, `{c}__stddev`" for c in cols)
    return wide.select(F.expr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value, stddev)"))
