"""Neptune Gremlin bulk-load CSV writer (reference:
loader/file_system_neptune_csv_loader.py + serializers/neptune_serializer.py).

Reference semantics reproduced:
- vertex rows: ``~id`` = '{label}:{key}', ``~label``, ``key:String(single)``
  plus typed property headers via ``_get_neptune_type_for_value``
  (serializer :155 — here a schema-driven registry, same outcome);
- edge rows: ``~id`` (forward/reverse ids), ``~from``/``~to`` composite
  ids, one row per direction (the bidirectional pair is materialized at
  serialize time for Neptune, unlike Neo4j where the publisher's Cypher
  does it);
- job provenance columns creation_type/last_extracted_datetime
  (serializer :23-41).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.models.base import GraphOutput
from amundsendatabuilder_spark.sinks.graph_csv import UNQUOTED_PROPS, _prop_columns

_NEPTUNE_TYPES = {"int": "Long(single)", "bool": "Bool(single)"}


def _typed_header(prop: str) -> str:
    kind = UNQUOTED_PROPS.get(prop)
    return f"{prop}:{_NEPTUNE_TYPES.get(kind, 'String(single)')}"


def write_neptune_csv(out: GraphOutput, out_dir: str,
                      extracted_at: str = "1970-01-01T00:00:00") -> dict[str, str]:
    """Write vertex + edge bulk-loader CSVs; returns the two paths."""
    node_props = _prop_columns(out.nodes)
    vertices = out.nodes.select(
        F.format_string("%s:%s", "LABEL", "KEY").alias("~id"),
        F.col("LABEL").alias("~label"),
        F.col("KEY").alias("key:String(single)"),
        F.lit("job").alias("creation_type:String(single)"),
        F.lit(extracted_at).alias("last_extracted_datetime:Date(single)"),
        *[F.col("props")[p].alias(_typed_header(p)) for p in node_props],
    ).orderBy("~id")
    vpath = os.path.join(out_dir, "vertices")
    vertices.coalesce(1).write.mode("overwrite").option("header", True).csv(vpath)

    rel_props = _prop_columns(out.rels)
    start_id = F.format_string("%s:%s", "START_LABEL", "START_KEY")
    end_id = F.format_string("%s:%s", "END_LABEL", "END_KEY")
    # Relationship creation_type header is bare 'String' (not '(single)') —
    # neptune_serializer.py:38-40 vs the node form :34-36.
    common = [F.lit("job").alias("creation_type:String"),
              F.lit(extracted_at).alias("last_extracted_datetime:Date(single)")] + \
             [F.col("props")[p].alias(_typed_header(p)) for p in rel_props]
    # Edge ~id leads with the relationship label:
    # '{label}:{from_label}:{from_id}_{to_label}:{to_id}'
    # (neptune_serializer.get_forward/reverse_relationship_id :99-119) so
    # bulk loads dedupe on the same edge identity as reference output.
    fwd = out.rels.select(
        F.format_string("%s:%s_%s", F.col("TYPE"), start_id, end_id).alias("~id"),
        F.col("TYPE").alias("~label"),
        start_id.alias("~from"), end_id.alias("~to"), *common)
    rev = out.rels.select(
        F.format_string("%s:%s_%s", F.col("REVERSE_TYPE"), end_id, start_id).alias("~id"),
        F.col("REVERSE_TYPE").alias("~label"),
        end_id.alias("~from"), start_id.alias("~to"), *common)
    edges = fwd.unionByName(rev).orderBy("~id")
    epath = os.path.join(out_dir, "edges")
    edges.coalesce(1).write.mode("overwrite").option("header", True).csv(epath)
    return {"vertices": vpath, "edges": epath}
