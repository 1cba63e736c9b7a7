"""BigQuery-family sources (reference: extractor/bigquery_*.py) —
the API-walk becomes a driver fetch (or connector read) and every
aggregation/grouping moves into DataFrame algebra:

- sharded-table grouping: ``…_YYYYMMDD`` suffix tables collapse to one
  logical table per prefix (bigquery_metadata_extractor.py:44-57);
- usage extraction: audit-log scan -> filter -> per-(table,user) count
  (bigquery_usage_extractor.py:47-135);
- watermarks: min/max shard suffix per prefix
  (bigquery_watermark_extractor.py:48-63);
- nested RECORD flattening: recursive schema walk assigning pre-order
  sort_order (bigquery_metadata_extractor.py:87-119) — done on the
  *schema*, not with a row UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHARD_RE = r"^(.+)_(\d{8})$"  # reference: :44-57 (date-sharded suffix)


def group_sharded_tables(tables: DataFrame, name_col: str = "name") -> DataFrame:
    """Collapse date-sharded tables to one row per prefix keeping the
    latest shard's metadata (reference :44-57 keeps the first seen; we pin
    'latest suffix' as the deterministic winner — SURVEY §7.4)."""
    prefix = F.regexp_extract(F.col(name_col), SHARD_RE, 1)
    suffix = F.regexp_extract(F.col(name_col), SHARD_RE, 2)
    d = (tables
         .withColumn("_prefix", F.when(prefix != "", prefix).otherwise(F.col(name_col)))
         .withColumn("_suffix", F.when(suffix != "", suffix)))
    from pyspark.sql import Window
    w = Window.partitionBy("_prefix").orderBy(
        F.col("_suffix").desc_nulls_last(), F.col(name_col))
    return (d.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .withColumn(name_col, F.col("_prefix"))
            .drop("_prefix", "_suffix", "_rn"))


def usage_counts(audit_logs: DataFrame) -> DataFrame:
    """Stackdriver audit-log rows -> per-(table, user) read counts
    (reference: bigquery_usage_extractor.py:101-125 — filter on resource
    type/method/email regex then dict-count). Input columns: project_id,
    dataset_id, table_id, email, method, resource_type, ts."""
    return (
        audit_logs
        .where((F.col("resource_type") == "bigquery_resource")
               & F.col("method").isin("jobservice.jobcompleted",
                                      "google.cloud.bigquery.v2.JobService.InsertJob")
               & F.col("email").rlike(r"^[^@]+@[^@]+\.[^@]+$"))
        .groupBy("project_id", "dataset_id", "table_id", "email")
        .agg(F.count("*").alias("read_count"))
    )


def shard_watermarks(tables: DataFrame, name_col: str = "name") -> DataFrame:
    """min/max shard suffix per sharded prefix -> (low, high) watermark
    pair rows (reference: bigquery_watermark_extractor.py:48-63)."""
    prefix = F.regexp_extract(F.col(name_col), SHARD_RE, 1)
    suffix = F.regexp_extract(F.col(name_col), SHARD_RE, 2)
    sharded = (tables.withColumn("_prefix", prefix).withColumn("_suffix", suffix)
               .where(F.col("_suffix") != ""))
    agg = (sharded.groupBy("_prefix")
           .agg(F.min("_suffix").alias("low"), F.max("_suffix").alias("high")))
    low = agg.select(F.col("_prefix").alias("table_prefix"),
                     F.lit("low_watermark").alias("part_type"),
                     F.col("low").alias("part_value"))
    high = agg.select(F.col("_prefix").alias("table_prefix"),
                      F.lit("high_watermark").alias("part_type"),
                      F.col("high").alias("part_value"))
    return low.unionByName(high)


def flatten_record_columns(schema: T.StructType, prefix: str = "",
                           _order: list | None = None) -> list[tuple[str, str, int]]:
    """Recursive RECORD flattening to dotted column names with pre-order
    sort_order (reference: bigquery_metadata_extractor.py:87-119). Operates
    on the Spark schema — no data pass at all; the result drives a
    ``select`` of dotted paths."""
    out: list[tuple[str, str, int]] = []
    counter = _order if _order is not None else [0]
    for field in schema.fields:
        name = f"{prefix}{field.name}"
        if isinstance(field.dataType, T.StructType):
            out.append((name, "RECORD", counter[0]))
            counter[0] += 1
            out.extend(flatten_record_columns(field.dataType, f"{name}.", counter))
        else:
            out.append((name, field.dataType.simpleString(), counter[0]))
            counter[0] += 1
    return out
