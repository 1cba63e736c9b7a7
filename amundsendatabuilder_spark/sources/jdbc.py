"""JDBC metadata sources — the reference's per-dialect INFORMATION_SCHEMA
extractors (SURVEY §2.1) as a dialect SQL catalog + one generic reader.

The reference ships a hand-written SQL string per warehouse
(postgres/mysql/mssql/snowflake/athena/redshift/vertica/db2/druid/dremio,
e.g. extractor/postgres_metadata_extractor.py:24-41) and then sort-groups
rows into TableMetadata in Python
(extractor/base_postgres_metadata_extractor.py:79-96). Here:

- ``DIALECT_QUERIES[dialect]`` holds the same extraction SQL (pushed down
  whole to the source DB via the jdbc ``query`` option, so the warehouse
  does the catalog joins exactly as in the reference);
- ``read_metadata`` runs it and normalizes column names;
- ``nest_columns`` replaces the Python itertools.groupby with
  ``groupBy(table).agg(sort_array(collect_list(struct(...))))`` producing
  the models/table_metadata.py input schema.

``where_clause_suffix`` keeps the reference's manual-pushdown config knob
(base_postgres_metadata_extractor.py:55-58) for API compatibility, though
Catalyst would also push an equivalent ``.where`` down to JDBC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Standard row shape every dialect query must emit (the reference's
# contract, base_postgres_metadata_extractor.py:62-77):
#   schema, name, description, col_name, col_description, col_type,
#   col_sort_order, cluster, is_view
_POSTGRES_SQL = """
SELECT
  {cluster_source} AS cluster, c.table_schema AS schema, c.table_name AS name,
  pgtd.description AS description, c.column_name AS col_name,
  c.data_type AS col_type, pgcd.description AS col_description,
  ordinal_position AS col_sort_order
FROM information_schema.columns c
INNER JOIN pg_catalog.pg_statio_all_tables st
  ON c.table_schema = st.schemaname AND c.table_name = st.relname
LEFT JOIN pg_catalog.pg_description pgcd
  ON pgcd.objoid = st.relid AND pgcd.objsubid = c.ordinal_position
LEFT JOIN pg_catalog.pg_description pgtd
  ON pgtd.objoid = st.relid AND pgtd.objsubid = 0
{where_clause_suffix}
ORDER BY cluster, schema, name, col_sort_order
"""

_MYSQL_SQL = """
SELECT
  lower(c.column_key) AS col_key, {cluster_source} AS cluster,
  c.table_schema AS `schema`, c.table_name AS name, t.table_comment AS description,
  c.column_name AS col_name, c.column_comment AS col_description,
  c.column_type AS col_type, c.ordinal_position AS col_sort_order,
  (t.table_type = 'VIEW') AS is_view
FROM INFORMATION_SCHEMA.COLUMNS AS c
LEFT JOIN INFORMATION_SCHEMA.TABLES t
  ON c.TABLE_NAME = t.TABLE_NAME AND c.TABLE_SCHEMA = t.TABLE_SCHEMA
{where_clause_suffix}
ORDER BY cluster, `schema`, name, col_sort_order
"""

_SNOWFLAKE_SQL = """
SELECT
  lower(c.column_name) AS col_name, c.comment AS col_description,
  lower(c.data_type) AS col_type, lower(c.ordinal_position) AS col_sort_order,
  lower(c.table_name) AS name, t.comment AS description,
  lower({cluster_source}) AS cluster, lower(c.table_schema) AS schema,
  decode(lower(t.table_type), 'view', 'true', 'false') AS is_view
FROM {database}.INFORMATION_SCHEMA.COLUMNS AS c
LEFT JOIN {database}.INFORMATION_SCHEMA.TABLES t
  ON c.TABLE_NAME = t.TABLE_NAME AND c.TABLE_SCHEMA = t.TABLE_SCHEMA
{where_clause_suffix}
"""

_ATHENA_SQL = """
SELECT
  table_schema AS schema, table_name AS name, column_name AS col_name,
  data_type AS col_type, ordinal_position AS col_sort_order,
  comment AS col_description, extra_info AS extras
FROM information_schema.columns
{where_clause_suffix}
ORDER BY table_schema, table_name, ordinal_position
"""

_MSSQL_SQL = """
SELECT DISTINCT
  {cluster_source} AS cluster, TBL.TABLE_SCHEMA AS [schema_name],
  TBL.TABLE_NAME AS [name], CAST(PROP.VALUE AS NVARCHAR(MAX)) AS [description],
  COL.COLUMN_NAME AS [col_name], COL.DATA_TYPE AS [col_type],
  CAST(PROP_COL.VALUE AS NVARCHAR(MAX)) AS [col_description],
  COL.ORDINAL_POSITION AS col_sort_order
FROM INFORMATION_SCHEMA.TABLES TBL
INNER JOIN INFORMATION_SCHEMA.COLUMNS COL
  ON COL.TABLE_NAME = TBL.TABLE_NAME AND COL.TABLE_SCHEMA = TBL.TABLE_SCHEMA
LEFT JOIN SYS.EXTENDED_PROPERTIES PROP
  ON PROP.MAJOR_ID = OBJECT_ID(TBL.TABLE_SCHEMA + '.' + TBL.TABLE_NAME)
  AND PROP.MINOR_ID = 0 AND PROP.NAME = 'MS_Description'
LEFT JOIN SYS.EXTENDED_PROPERTIES PROP_COL
  ON PROP_COL.MAJOR_ID = OBJECT_ID(TBL.TABLE_SCHEMA + '.' + TBL.TABLE_NAME)
  AND PROP_COL.MINOR_ID = COL.ORDINAL_POSITION AND PROP_COL.NAME = 'MS_Description'
WHERE TBL.TABLE_TYPE = 'base table' {where_clause_suffix}
ORDER BY cluster, schema_name, name, col_sort_order
"""

_REDSHIFT_SQL = """
SELECT * FROM (
  SELECT {cluster_source} AS cluster, c.table_schema AS schema,
         c.table_name AS name, pgtd.description AS description,
         c.column_name AS col_name, c.data_type AS col_type,
         pgcd.description AS col_description, ordinal_position AS col_sort_order
  FROM INFORMATION_SCHEMA.COLUMNS c
  INNER JOIN pg_catalog.pg_statio_all_tables st
    ON c.table_schema = st.schemaname AND c.table_name = st.relname
  LEFT JOIN pg_catalog.pg_description pgcd
    ON pgcd.objoid = st.relid AND pgcd.objsubid = c.ordinal_position
  LEFT JOIN pg_catalog.pg_description pgtd
    ON pgtd.objoid = st.relid AND pgtd.objsubid = 0
  UNION
  SELECT {cluster_source} AS cluster, view_schema AS schema, view_name AS name,
         NULL AS description, column_name AS col_name, data_type AS col_type,
         NULL AS col_description, ordinal_position AS col_sort_order
  FROM PG_GET_LATE_BINDING_VIEW_COLS()
    COLS(view_schema NAME, view_name NAME, column_name NAME,
         data_type VARCHAR, ordinal_position INT)
  UNION
  SELECT {cluster_source} AS cluster, schemaname AS schema, tablename AS name,
         NULL AS description, columnname AS col_name,
         external_type AS col_type, NULL AS col_description,
         columnnum AS col_sort_order
  FROM svv_external_columns
) t {where_clause_suffix}
ORDER BY cluster, schema, name, col_sort_order
"""

_VERTICA_SQL = """
SELECT lower(c.column_name) AS col_name, '' AS col_description,
       lower(c.data_type) AS col_type, c.ordinal_position AS col_sort_order,
       lower(c.table_name) AS name, '' AS description,
       lower({cluster_source}) AS cluster, lower(c.table_schema) AS schema
FROM v_catalog.columns AS c
LEFT JOIN v_catalog.tables t
  ON c.TABLE_NAME = t.TABLE_NAME AND c.TABLE_SCHEMA = t.TABLE_SCHEMA
{where_clause_suffix}
ORDER BY cluster, schema, name, col_sort_order
"""

_DB2_SQL = """
SELECT
  {cluster_source} AS cluster, lower(c.TABSCHEMA) AS schema,
  lower(c.TABNAME) AS name, t.REMARKS AS description,
  lower(c.COLNAME) AS col_name,
  CASE WHEN c.TYPENAME = 'VARCHAR' OR c.TYPENAME = 'CHARACTER'
       THEN trim(c.TYPENAME) concat '(' concat c.LENGTH concat ')'
       ELSE trim(c.TYPENAME) END AS col_type,
  c.REMARKS AS col_description, c.COLNO AS col_sort_order
FROM SYSCAT.COLUMNS c
INNER JOIN SYSCAT.TABLES t
  ON c.TABSCHEMA = t.TABSCHEMA AND c.TABNAME = t.TABNAME
{where_clause_suffix}
ORDER BY cluster, schema, name, col_sort_order
"""

_DRUID_SQL = """
SELECT TABLE_SCHEMA AS schema, TABLE_NAME AS name, COLUMN_NAME AS col_name,
       DATA_TYPE AS col_type, ORDINAL_POSITION AS col_sort_order
FROM INFORMATION_SCHEMA.COLUMNS
{where_clause_suffix}
ORDER BY TABLE_SCHEMA, TABLE_NAME, CAST(ORDINAL_POSITION AS int)
"""

_DREMIO_SQL = """
SELECT nested_1.COLUMN_NAME AS col_name, CAST(NULL AS VARCHAR) AS col_description,
       nested_1.DATA_TYPE AS col_type, nested_1.ORDINAL_POSITION AS col_sort_order,
       nested_1.TABLE_NAME AS name, CAST(NULL AS VARCHAR) AS description,
       {cluster_source} AS cluster, nested_1.TABLE_SCHEMA AS schema,
       nested_0.TABLE_TYPE = 'VIEW' AS is_view
FROM INFORMATION_SCHEMA."TABLES" nested_0
RIGHT JOIN INFORMATION_SCHEMA."COLUMNS" nested_1
  ON nested_0.TABLE_NAME = nested_1.TABLE_NAME
  AND nested_0.TABLE_SCHEMA = nested_1.TABLE_SCHEMA
{where_clause_suffix}
"""

# reference cites: postgres_metadata_extractor.py:24-41,
# mysql_metadata_extractor.py:28-46, snowflake_metadata_extractor.py:34-53,
# athena_metadata_extractor.py:27-35, mssql_metadata_extractor.py:29-56,
# redshift_metadata_extractor.py:30-78, vertica_metadata_extractor.py:31-47,
# db2_metadata_extractor.py:28-42, druid_metadata_extractor.py:27-39,
# dremio_metadata_extractor.py:31-52
DIALECT_QUERIES: dict[str, str] = {
    "postgres": _POSTGRES_SQL,
    "mysql": _MYSQL_SQL,
    "snowflake": _SNOWFLAKE_SQL,
    "athena": _ATHENA_SQL,
    "mssql": _MSSQL_SQL,
    "redshift": _REDSHIFT_SQL,
    "vertica": _VERTICA_SQL,
    "db2": _DB2_SQL,
    "druid": _DRUID_SQL,
    "dremio": _DREMIO_SQL,
}


def dialect_query(dialect: str, cluster_source: str = "'gold'",
                  where_clause_suffix: str = "", database: str = "") -> str:
    """Render the dialect's extraction SQL with the reference's config
    holes (cluster source expression, where-clause suffix)."""
    return DIALECT_QUERIES[dialect].format(
        cluster_source=cluster_source,
        where_clause_suffix=where_clause_suffix,
        database=database,
    ).strip()


def read_jdbc(spark: SparkSession, url: str, query: str,
              fetch_size: int = 10_000, num_partitions: int | None = None,
              partition_column: str | None = None,
              lower_bound=None, upper_bound=None, **options) -> DataFrame:
    """Generic JDBC read with whole-query pushdown — the engine side of
    DBAPIExtractor/SQLAlchemyExtractor (reference:
    extractor/db_api_extractor.py:15-83, sql_alchemy_extractor.py:14-103).
    Passing partition_column/bounds splits the read across executors —
    the scale replacement for the reference's single cursor."""
    reader = (spark.read.format("jdbc")
              .option("url", url)
              .option("query", query)
              .option("fetchsize", fetch_size))
    if partition_column:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", lower_bound)
                  .option("upperBound", upper_bound)
                  .option("numPartitions", num_partitions or 8))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def read_metadata(spark: SparkSession, url: str, dialect: str,
                  default_database: str, default_cluster: str = "gold",
                  **kwargs) -> DataFrame:
    """Run the dialect catalog query and return normalized flat rows."""
    df = read_jdbc(spark, url, dialect_query(dialect, **kwargs))
    if "schema_name" in df.columns:  # mssql quoting
        df = df.withColumnRenamed("schema_name", "schema")
    for col, default in (("cluster", default_cluster), ("is_view", False),
                         ("description", None), ("col_description", None)):
        if col not in df.columns:
            df = df.withColumn(col, F.lit(default))
    return df.withColumn("database", F.lit(default_database))


def nest_columns(flat: DataFrame) -> DataFrame:
    """Flat (one row per column) -> one row per table with sorted nested
    columns — the set-level replacement for the reference's
    sorted-input itertools.groupby
    (base_postgres_metadata_extractor.py:79-96). No ORDER BY needed:
    ordering is restored *inside* each group by sort_array."""
    return (
        flat.groupBy("database", "cluster", "schema", "name")
        .agg(F.first("description", ignorenulls=True).alias("description"),
             F.first("is_view", ignorenulls=True).alias("is_view"),
             F.sort_array(F.collect_list(F.struct(
                 F.col("col_sort_order").cast("int").alias("sort_order"),
                 F.col("col_name").alias("name"),
                 F.col("col_description").alias("description"),
                 F.col("col_type").alias("col_type")))).alias("_sorted"))
        .select("database", "cluster", "schema", "name", "description",
                F.coalesce("is_view", F.lit(False)).alias("is_view"),
                F.lit(None).cast("string").alias("description_source"),
                F.array().cast("array<string>").alias("tags"),
                F.transform("_sorted", lambda s: F.struct(
                    s["name"].alias("name"),
                    s["description"].alias("description"),
                    s["col_type"].alias("col_type"),
                    s["sort_order"].alias("sort_order"),
                    F.array().cast("array<string>").alias("badges"))).alias("columns"))
    )
