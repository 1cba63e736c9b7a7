"""Neo4j-shape CSV staging writer (reference:
loader/file_system_neo4j_csv_loader.py + serializers/neo4_serializer.py).

Reference behaviors reproduced set-level:
- node CSVs sharded by (label, attribute-column-set); rel CSVs by
  (start_label, end_label, type, column-set) — the 'ragged attribute sets'
  trap (loader :111-139,189-191; SURVEY §7.4). Here the shard key is a
  computed schema-hash column and the write is one
  ``partitionBy(label, schema_hash)`` pass;
- ``:UNQUOTED`` header suffix for int/bool attributes
  (serializers/neo4_serializer.py:52-58) via a per-label property-type
  registry (the reference infers from Python value types; a registry is
  the schema-first equivalent);
- output ordering is canonical (sorted), an intentional semantics-
  preserving difference from the reference's extraction-order files
  (SURVEY §7.4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.models.base import GraphOutput

# property-name -> neo4j-unquoted type, per the models in models/*.py
# (reference derives this from Python int/bool values at serialize time,
# serializers/neo4_serializer.py:52-58)
UNQUOTED_PROPS = {
    "is_view": "bool", "sort_order": "int", "read_count": "int",
    "timestamp": "int", "last_updated_timestamp": "int",
    "start_epoch": "int", "end_epoch": "int", "created_timestamp": "int",
    "view_count": "int", "is_active": "bool", "updated_at": "int",
    "apache_airflow": "bool",
}


def _header_name(prop: str) -> str:
    if prop in UNQUOTED_PROPS:
        return f"{prop}:UNQUOTED"
    return prop


def _prop_columns(df: DataFrame) -> list[str]:
    """Distinct property names present in the props map (driver-side — the
    set of property names is tiny and bounded by the model schemas)."""
    rows = (df.select(F.explode(F.map_keys("props")).alias("k"))
            .distinct().collect())
    return sorted(r[0] for r in rows)


def write_nodes_csv(nodes: DataFrame, out_dir: str) -> list[str]:
    """Write per-(label, column-set) node CSV shard directories under
    ``out_dir/nodes``. Returns the shard paths written."""
    props = _prop_columns(nodes)
    wide = nodes.select(
        F.col("KEY"), F.col("LABEL"),
        *[F.col("props")[p].alias(p) for p in props],
        F.md5(F.concat_ws(",", F.array_sort(F.map_keys("props")))).alias("_schema_hash"),
    )
    paths: list[str] = []
    # one pass per (label, schema-hash) group: each shard gets exactly the
    # columns its rows carry — reproducing the ragged-file behavior without
    # per-record dict bookkeeping
    shards = [tuple(r) for r in
              wide.select("LABEL", "_schema_hash").distinct().collect()]
    for label, shash in sorted(shards):
        shard = wide.where((F.col("LABEL") == label)
                           & (F.col("_schema_hash") == shash))
        present = [p for p in props
                   if shard.where(F.col(p).isNotNull()).limit(1).count() > 0]
        out = shard.select(
            F.col("KEY").alias("KEY"), F.col("LABEL").alias("LABEL"),
            *[F.col(p).alias(_header_name(p)) for p in present],
        ).orderBy("KEY")
        path = os.path.join(out_dir, "nodes", f"{label}_{shash[:8]}")
        out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        paths.append(path)
    return paths


def write_rels_csv(rels: DataFrame, out_dir: str) -> list[str]:
    """Write per-(start,end,type,column-set) relationship CSV shards under
    ``out_dir/rels`` (reference loader :141-177)."""
    props = _prop_columns(rels)
    wide = rels.select(
        "START_KEY", "START_LABEL", "END_KEY", "END_LABEL", "TYPE",
        "REVERSE_TYPE",
        *[F.col("props")[p].alias(p) for p in props],
        F.md5(F.concat_ws(",", F.array_sort(F.map_keys("props")))).alias("_schema_hash"),
    )
    paths: list[str] = []
    shards = [tuple(r) for r in wide.select(
        "START_LABEL", "END_LABEL", "TYPE", "_schema_hash").distinct().collect()]
    for start, end, typ, shash in sorted(shards):
        shard = wide.where((F.col("START_LABEL") == start)
                           & (F.col("END_LABEL") == end)
                           & (F.col("TYPE") == typ)
                           & (F.col("_schema_hash") == shash))
        present = [p for p in props
                   if shard.where(F.col(p).isNotNull()).limit(1).count() > 0]
        out = shard.select(
            "START_KEY", "START_LABEL", "END_KEY", "END_LABEL", "TYPE",
            "REVERSE_TYPE",
            *[F.col(p).alias(_header_name(p)) for p in present],
        ).orderBy("START_KEY", "END_KEY")
        path = os.path.join(out_dir, "rels", f"{start}_{typ}_{end}_{shash[:8]}")
        out.coalesce(1).write.mode("overwrite").option("header", True).csv(path)
        paths.append(path)
    return paths


def write_graph(out: GraphOutput, out_dir: str) -> dict[str, list[str]]:
    return {"nodes": write_nodes_csv(out.nodes, out_dir),
            "rels": write_rels_csv(out.rels, out_dir)}
