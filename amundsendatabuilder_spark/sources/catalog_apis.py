"""API-walk catalog sources (reference: glue/cassandra/feast/atlas/
delta-lake extractors) — each is a driver-side client walk producing a
DataFrame, with the reference's pagination/flattening/mapping semantics
preserved and every aggregation done in DataFrame algebra.

The remote client is always injected as a plain callable/iterable so the
sources are testable offline and the engine has no cloud SDK dependency.
"""

from __future__ import annotations

import logging
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


def _atlas_map_entity(data: dict, spec: list[FieldSpec]) -> dict | None:
    """Reference field-mapping semantics
    (extractor/atlas_search_data_extractor.py:298-316), exactly:
    dotted-path dig where a missing segment yields {} (so the reference's
    ``reduce(...) or default`` replaces ANY falsy value — 0, '', [], {} —
    with the default, a documented quirk we preserve), then the optional
    transform; any exception while building the row skips the whole
    entity (reference logs-and-continues)."""
    from functools import reduce
    row: dict[str, Any] = {}
    try:
        for target, path, transform, default in spec:
            val = reduce(lambda x, y: x.get(y, dict())
                         if isinstance(x, dict) else dict(),
                         path.split("."), data) or default
            row[target] = transform(val) if transform is not None else val
        return row
    except Exception:
        return None


def atlas_search_chain(spark: SparkSession,
                       entity_count: Callable[[], int],
                       guid_page: Callable[[int, int], list[str]],
                       entity_details: Callable[[list[str]], list[dict]],
                       spec: list[FieldSpec], schema: str,
                       search_chunk_size: int = 250,
                       details_chunk_size: int = 25) -> DataFrame:
    """AtlasSearchDataExtractor's full extraction chain (reference:
    extractor/atlas_search_data_extractor.py:217-296), Spark-shaped:

    1. ``entity_count()`` — the admin-metrics active-entity count that
       sizes the pagination (reference ``_get_count_of_active_entities``).
    2. Driver-paged guid seed fetch: offsets ``0, c, 2c, ...`` with
       ``count // c + 1`` pages — one trailing page even when the count
       divides evenly, mirroring the reference's off-by-design; a page
       that raises contributes [] and the sweep continues (:226-236).
       Seed guids are metadata-sized, so the driver holds them — the
       reference's ThreadPool adds nothing a paged loop doesn't.
    3. Executor-parallel detail fetch: guids split into
       ``details_chunk_size`` chunks (:257-259), one chunk per task via
       ``parallelize(...).flatMap`` — the Spark-native form of the
       reference's process pool; a chunk whose fetch raises contributes
       [] (:243-255). Field mapping runs in the same task.

    ``schema`` is the DDL for the mapped rows (the reference gets this
    from the model class; explicit DDL keeps the engine model-free).

    Failure visibility (the reference logs-and-continues,
    :243-255): every skipped page/chunk is WARN-logged with its
    offset/size — driver log for guid pages, executor log for detail
    chunks — and a skipped-page summary is logged after the sweep, so a
    mostly-failed extraction is distinguishable from a small catalog
    instead of silently looking like one."""
    log = logging.getLogger(__name__)
    try:
        count = int(entity_count())
    except Exception:
        log.warning("atlas entity_count failed; extracting nothing",
                    exc_info=True)
        count = 0
    offsets = ([i * search_chunk_size
                for i in range(count // search_chunk_size + 1)]
               if count > 0 else [])
    guids: list[str] = []
    skipped_pages = 0
    for off in offsets:
        try:
            guids.extend(guid_page(off, search_chunk_size))
        except Exception:
            skipped_pages += 1
            log.warning("atlas guid page at offset %d failed; skipping",
                        off, exc_info=True)
    if skipped_pages:
        log.warning("atlas guid sweep: %d/%d pages failed; continuing "
                    "with %d guids", skipped_pages, len(offsets),
                    len(guids))
    chunks = [guids[i:i + details_chunk_size]
              for i in range(0, len(guids), details_chunk_size)]
    if not chunks:
        return spark.createDataFrame([], schema)

    def fetch_and_map(chunk: list[str]) -> list[tuple]:
        try:
            entities = entity_details(chunk)
        except Exception:
            logging.getLogger(__name__).warning(
                "atlas detail fetch failed for %d-guid chunk; skipping",
                len(chunk), exc_info=True)
            return []
        fields = [s[0] for s in spec]
        out = []
        for e in entities:
            row = _atlas_map_entity(e, spec)
            if row is not None:
                out.append(tuple(row.get(f) for f in fields))
        return out

    rdd = (spark.sparkContext
           .parallelize(chunks, numSlices=len(chunks))
           .flatMap(fetch_and_map))
    return spark.createDataFrame(rdd, schema)


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
