"""API-walk catalog sources (reference: glue/cassandra/feast/atlas/
delta-lake extractors) — each is a driver-side client walk producing a
DataFrame, with the reference's pagination/flattening/mapping semantics
preserved and every aggregation done in DataFrame algebra.

The remote client is always injected as a plain callable/iterable so the
sources are testable offline and the engine has no cloud SDK dependency.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def glue_tables(spark: SparkSession,
                search_tables: Callable[[str | None], tuple[list[dict], str | None]],
                ) -> DataFrame:
    """AWS Glue catalog walk (reference: extractor/glue_extractor.py:42-90):
    NextToken pagination, then flatten StorageDescriptor.Columns +
    PartitionKeys into the standard flat column rows.

    ``search_tables(next_token) -> (tables, next_token)`` wraps
    boto3.client('glue').search_tables.
    """
    rows: list[tuple] = []
    token: str | None = None
    while True:
        tables, token = search_tables(token)
        for t in tables:
            cols = (t.get("StorageDescriptor", {}).get("Columns", [])
                    + t.get("PartitionKeys", []))
            for i, c in enumerate(cols):
                rows.append((t.get("DatabaseName"), t.get("Name"),
                             t.get("Description"),
                             t.get("TableType") == "VIRTUAL_VIEW",
                             c.get("Name"), c.get("Comment"),
                             c.get("Type"), i))
        if not token:
            break
    schema = ("schema string, name string, description string, "
              "is_view boolean, col_name string, col_description string, "
              "col_type string, col_sort_order int")
    return spark.createDataFrame(rows, schema)


def cassandra_tables(spark: SparkSession, keyspaces: dict,
                     table_filter: Callable[[str, str], bool] | None = None,
                     ) -> DataFrame:
    """Cassandra cluster-metadata walk (reference:
    extractor/cassandra_extractor.py:41-103): keyspaces -> tables ->
    columns, with the user-supplied (keyspace, table) filter function.

    ``keyspaces`` mirrors cluster.metadata.keyspaces:
    {ks: {table: [(col_name, col_type), ...]}}.
    """
    rows = []
    for ks, tables in keyspaces.items():
        if ks.startswith("system"):
            continue  # reference skips system keyspaces
        for tbl, cols in tables.items():
            if table_filter and not table_filter(ks, tbl):
                continue
            for i, (cname, ctype) in enumerate(cols):
                rows.append((ks, tbl, None, False, cname, None, ctype, i))
    schema = ("schema string, name string, description string, "
              "is_view boolean, col_name string, col_description string, "
              "col_type string, col_sort_order int")
    return spark.createDataFrame(rows, schema)


def feast_feature_tables(spark: SparkSession,
                         feature_tables: Iterable[dict]) -> DataFrame:
    """Feast registry walk (reference: extractor/feast_extractor.py:66-132):
    each feature table yields entity columns then feature columns, in
    order. Input dicts: {name, project, entities: [(name, type)],
    features: [(name, type)], description?}."""
    rows = []
    for ft in feature_tables:
        cols = list(ft.get("entities", [])) + list(ft.get("features", []))
        for i, (cname, ctype) in enumerate(cols):
            rows.append((ft.get("project", "default"), ft["name"],
                         ft.get("description"), False, cname, None,
                         ctype, i))
    schema = ("schema string, name string, description string, "
              "is_view boolean, col_name string, col_description string, "
              "col_type string, col_sort_order int")
    return spark.createDataFrame(rows, schema)


# --- Atlas declarative field mapping ---------------------------------------

# reference: extractor/atlas_search_data_extractor.py:88-116 — a spec of
# (target_field, source_json_path, transform, default) applied per entity.
FieldSpec = tuple[str, str, Callable[[Any], Any] | None, Any]


def apply_field_mapping(spark: SparkSession, entities: list[dict],
                        spec: list[FieldSpec]) -> DataFrame:
    """Apply an Atlas-style declarative field mapping to raw entity dicts.
    The reference runs this in a process pool over REST detail fetches
    (:70-81); here the mapping itself is driver-side (entity lists are
    catalog-sized) and everything downstream is DataFrame."""
    def dig(obj: Any, path: str) -> Any:
        cur = obj
        for part in path.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    rows = []
    for e in entities:
        row = {}
        for target, path, transform, default in spec:
            val = dig(e, path)
            if val is None:
                val = default
            elif transform is not None:
                val = transform(val)
            row[target] = val
        rows.append(row)
    return spark.createDataFrame(rows)  # type: ignore[arg-type]


def delta_lake_tables(spark: SparkSession,
                      databases: list[str] | None = None) -> DataFrame:
    """Delta/Spark-catalog metadata (reference:
    extractor/delta_lake_metadata_extractor.py:148-312 — the one extractor
    that was ALREADY PySpark; kept native): walk spark.catalog, one flat
    column row per table column. The reference's per-table
    ThreadPoolExecutor becomes plain catalog calls (driver) feeding a
    DataFrame."""
    rows = []
    dbs = databases or [d.name for d in spark.catalog.listDatabases()]
    for db in dbs:
        for t in spark.catalog.listTables(db):
            if t.tableType == "TEMPORARY" or t.isTemporary:
                continue
            for i, c in enumerate(spark.catalog.listColumns(t.name, db)):
                rows.append((db, t.name, t.description, t.tableType == "VIEW",
                             c.name, c.description, c.dataType, i))
    schema = ("schema string, name string, description string, "
              "is_view boolean, col_name string, col_description string, "
              "col_type string, col_sort_order int")
    return spark.createDataFrame(rows, schema)


def es_last_updated(spark: SparkSession, timestamp: int) -> DataFrame:
    """EsLastUpdatedExtractor (reference:
    extractor/es_last_updated_extractor.py:18-36): the single
    {timestamp} record. The caller passes the timestamp explicitly
    (reference uses now(); explicit keeps runs reproducible)."""
    return spark.createDataFrame([(timestamp,)], "timestamp long")
