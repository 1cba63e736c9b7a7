"""Output file sizing — write-amplification control for large writes.

At 100 TB, output layout is a first-class concern: the default
one-file-per-shuffle-partition write yields either thousands of KB-sized
files (metadata pressure on every later scan) or a handful of
multi-GB files (no scan parallelism). ``write_sized`` picks the file
count from the DataFrame's own estimated byte size (Catalyst statistics,
the same numbers AQE plans with), targeting a configured file size —
the knob production lakehouses tune (e.g. 128-1024 MB parquet files).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (bytes). Exact for
    parquet scans with stats; conservative upstream of joins/aggs."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def planned_file_count(df: DataFrame, target_mb: int = 256,
                       max_files: int = 100_000) -> int:
    """ceil(estimated bytes / target) clamped to [1, max_files]."""
    est = estimated_bytes(df)
    return max(1, min(max_files, math.ceil(est / (target_mb * 1024 * 1024))))


def write_sized(df: DataFrame, path: str, target_mb: int = 256,
                mode: str = "overwrite",
                partition_by: tuple[str, ...] = ()) -> int:
    """Write parquet with ~target_mb-sized files; returns the planned file
    count. Uses repartition (round-robin) so files are even-sized — the
    coalesce alternative avoids the shuffle but inherits skewed upstream
    partition sizes."""
    n = planned_file_count(df, target_mb)
    writer = df.repartition(n).write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return n


def zorder_expr(col_a: str, col_b: str, bits: int = 16,
                idiv: str = "DIV") -> str:
    """SQL text for the Morton (Z-order) interleave of two non-negative
    integer columns — bit i of ``col_a`` lands at position 2i, bit i of
    ``col_b`` at 2i+1. Pure integer arithmetic (((c DIV 2^i) % 2) *
    2^(2i)), so Spark (idiv='DIV') and any ANSI engine (DuckDB
    idiv='//') evaluate it identically.

    Only the low ``bits`` bits of each column participate (values are
    effectively taken mod 2^bits) — size ``bits`` to the key domain, or
    rank/bucketize wider keys first; both engines drop the same high
    bits, so verification is unaffected, but layout quality degrades
    silently past the domain.

    Z-ordering is the multi-dimensional layout tool for 100 TB scans:
    sorting/range-partitioning output files by the interleaved key gives
    every file a tight bounding box in BOTH dimensions, so parquet
    min/max footer stats prune scans filtered on EITHER column — a plain
    sort on (a, b) only ever prunes on ``a``. Use with write_sized:
    df.repartitionByRange(n, F.expr(zorder_expr(...)))."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} {idiv} {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({col_b} {idiv} {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return "(" + " + ".join(terms) + ")"


def write_bucketed(df: DataFrame, table_name: str, bucket_col: str,
                   n_buckets: int = 32, path: "str | None" = None,
                   mode: str = "overwrite") -> None:
    """Bucketed parquet table write — the co-located-join layout: rows
    hash-partition into ``n_buckets`` files by ``bucket_col`` and sort
    within each bucket, so ANY later equi-join or aggregation on that
    column between tables bucketed the same way runs with ZERO shuffle
    exchanges (Spark reads the bucket spec from the catalog and aligns
    partitions). This is the 100 TB answer for a fact table joined on
    the same key every day: pay the shuffle once at write time, never
    at read time. Requires saveAsTable (bucket metadata lives in the
    catalog, not the files)."""
    writer = (df.write.format("parquet").mode(mode)
              .bucketBy(n_buckets, bucket_col).sortBy(bucket_col))
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str,
                  on: str, how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket column.
    With matching bucket specs the physical plan contains no Exchange —
    each task sort-merges bucket i of both sides locally. The exchange-
    free property is asserted by tests/test_sinks.py (plan inspection),
    which is the point: a layout claim you can't verify in the plan is
    a layout claim you don't have."""
    lt, rt = spark.table(left_table), spark.table(right_table)
    return lt.join(rt, on, how)
