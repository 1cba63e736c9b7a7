"""Hive metastore sources (reference:
extractor/hive_table_metadata_extractor.py:35-158 and
extractor/hive_table_last_updated_extractor.py).

The reference UNIONs a partition-column query and a regular-column query
over the metastore tables (TBLS/DBS/COLUMNS_V2/PARTITION_KEYS/TABLE_PARAMS),
ordering by (tbl_id, is_partition_col DESC) and badging partition columns.
Spark shape: two reads + unionByName + the shared nest_columns aggregate,
with the partition badge attached during the nest. The file-mtime
last-updated scan (ThreadPool(500) stats, :110-127) becomes a distributed
``binaryFile`` listing — executor parallelism instead of driver threads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# reference: hive_table_metadata_extractor.py:35-59 — both halves emit the
# standard flat shape plus is_partition_col.
HIVE_PARTITION_COLUMNS_SQL = """
SELECT source.* FROM (
  SELECT t.TBL_ID, d.NAME as `schema`, t.TBL_NAME name, t.TBL_TYPE,
         tp.PARAM_VALUE as description, p.PKEY_NAME as col_name,
         p.INTEGER_IDX as col_sort_order, p.PKEY_TYPE as col_type,
         p.PKEY_COMMENT as col_description, 1 as "is_partition_col",
         IF(t.TBL_TYPE = 'VIRTUAL_VIEW', 1, 0) "is_view"
  FROM TBLS t
  JOIN DBS d ON t.DB_ID = d.DB_ID
  JOIN PARTITION_KEYS p ON t.TBL_ID = p.TBL_ID
  LEFT JOIN TABLE_PARAMS tp ON (t.TBL_ID = tp.TBL_ID AND tp.PARAM_KEY='comment')
  {where_clause_suffix}
) source
ORDER BY tbl_id, is_partition_col desc
"""

HIVE_REGULAR_COLUMNS_SQL = """
SELECT source.* FROM (
  SELECT t.TBL_ID, d.NAME as `schema`, t.TBL_NAME name, t.TBL_TYPE,
         tp.PARAM_VALUE as description, c.COLUMN_NAME as col_name,
         c.INTEGER_IDX as col_sort_order, c.TYPE_NAME as col_type,
         c.COMMENT as col_description, 0 as "is_partition_col",
         IF(t.TBL_TYPE = 'VIRTUAL_VIEW', 1, 0) "is_view"
  FROM TBLS t
  JOIN DBS d ON t.DB_ID = d.DB_ID
  JOIN SDS s ON t.SD_ID = s.SD_ID
  JOIN COLUMNS_V2 c ON s.CD_ID = c.CD_ID
  LEFT JOIN TABLE_PARAMS tp ON (t.TBL_ID = tp.TBL_ID AND tp.PARAM_KEY='comment')
  {where_clause_suffix}
) source
ORDER BY tbl_id, is_partition_col desc
"""

PARTITION_BADGE = "partition column"  # reference: :133-138


def union_hive_columns(partition_cols: DataFrame, regular_cols: DataFrame) -> DataFrame:
    """UNION the two halves with dedup (reference :46 uses SQL UNION whose
    set semantics matter — a column appearing in both halves must survive
    once)."""
    return partition_cols.unionByName(regular_cols).distinct()


def nest_hive_columns(flat: DataFrame, database: str = "hive",
                      cluster: str = "gold") -> DataFrame:
    """Flat hive rows -> TableMetadata input, attaching the partition badge
    to partition columns (reference :133-158)."""
    return (
        flat.groupBy("schema", "name")
        .agg(F.first("description", ignorenulls=True).alias("description"),
             F.max(F.col("is_view").cast("int")).alias("_is_view"),
             F.sort_array(F.collect_list(F.struct(
                 (F.col("is_partition_col").cast("int") * -1).alias("_part_first"),
                 F.col("col_sort_order").cast("int").alias("sort_order"),
                 F.col("col_name").alias("name"),
                 F.col("col_description").alias("description"),
                 F.col("col_type").alias("col_type"),
                 F.when(F.col("is_partition_col").cast("int") == 1,
                        F.array(F.lit(PARTITION_BADGE)))
                 .otherwise(F.array().cast("array<string>")).alias("badges")
             ))).alias("_sorted"))
        .select(F.lit(database).alias("database"), F.lit(cluster).alias("cluster"),
                "schema", "name", "description",
                (F.col("_is_view") == 1).alias("is_view"),
                F.lit(None).cast("string").alias("description_source"),
                F.array().cast("array<string>").alias("tags"),
                F.transform("_sorted", lambda s: F.struct(
                    s["name"].alias("name"),
                    s["description"].alias("description"),
                    s["col_type"].alias("col_type"),
                    s["sort_order"].alias("sort_order"),
                    s["badges"].alias("badges"))).alias("columns"))
    )


def last_updated_from_partitions(partitions: DataFrame) -> DataFrame:
    """Partitioned tables: MAX(PARTITIONS.CREATE_TIME) GROUP BY
    schema,table (reference: hive_table_last_updated_extractor.py:62-72).
    Input: schema, table_name, create_time long."""
    return (partitions.groupBy("schema", "table_name")
            .agg(F.max("create_time").alias("last_updated_time_epoch")))


def last_updated_from_files(spark: SparkSession, table_locations: DataFrame,
                            path_col: str = "location") -> DataFrame:
    """Non-partitioned tables: max file modification time under each table
    location. The reference stats files with a 500-thread pool on the
    driver (:110-127,235-269); here the listing runs ON THE EXECUTORS via
    the binaryFile source (content never read — only status), so 1000
    executors list 1000 directories concurrently."""
    locs = [r[0] for r in table_locations.select(path_col).distinct().collect()]
    out = None
    for loc in locs:
        files = (spark.read.format("binaryFile").option("pathGlobFilter", "*")
                 .load(loc).select(
                     F.lit(loc).alias(path_col),
                     F.col("modificationTime")))
        out = files if out is None else out.unionByName(files)
    if out is None:
        return spark.createDataFrame([], f"{path_col} string, last_updated_time_epoch long")
    return (out.groupBy(path_col)
            .agg(F.unix_timestamp(F.max("modificationTime"))
                 .alias("last_updated_time_epoch")))


def non_partitioned_tables(tables: DataFrame, partitions: DataFrame,
                           on: list[str] = ["schema", "table_name"]) -> DataFrame:
    """The NOT EXISTS split (reference :88-90) as a left_anti join."""
    return tables.join(partitions.select(*on).distinct(), on, "left_anti")
