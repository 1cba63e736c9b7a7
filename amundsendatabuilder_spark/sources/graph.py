"""Graph-read source — the engine-side equivalent of Neo4jExtractor
(reference: extractor/neo4j_extractor.py:79-113, which runs arbitrary
Cypher against the published graph).

This engine's graph IS a pair of DataFrames (nodes, rels), so 'run a
Cypher query' becomes 'join the node/rel DataFrames'. ``match`` expresses
the MATCH (a:L1)-[:T]->(b:L2) triple pattern as two key-equality joins;
chains compose by repeated calls. OPTIONAL MATCH = left join flag.
Publish-tag filtering is a plain predicate (SURVEY §7.4: never string
splicing)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.models.base import GraphOutput


def read_staged_graph(spark: SparkSession, staged_dir: str) -> GraphOutput:
    """Load a graph staged by sinks/graph_csv.write_graph back into
    (nodes, rels) DataFrames. Shard CSVs are ragged (per-column-set), so
    each shard is read with its own header and non-standard columns fold
    back into the props map."""
    def load(kind: str, fixed: list[str]) -> DataFrame:
        base = os.path.join(staged_dir, kind)
        out = None
        for shard in sorted(os.listdir(base)):
            df = (spark.read.option("header", True)
                  .csv(os.path.join(base, shard)))
            prop_cols = [c for c in df.columns if c not in fixed]
            pairs = []
            for c in prop_cols:
                name = c.split(":")[0]  # strip :UNQUOTED
                pairs.extend([F.lit(name), F.col(f"`{c}`").cast("string")])
            props = (F.map_filter(F.create_map(*pairs), lambda _, v: v.isNotNull())
                     if pairs else F.create_map().cast("map<string,string>"))
            norm = df.select(*[F.col(c) for c in fixed], props.alias("props"))
            out = norm if out is None else out.unionByName(norm)
        assert out is not None, f"no {kind} shards under {staged_dir}"
        return out

    nodes = load("nodes", ["KEY", "LABEL"])
    rels = load("rels", ["START_KEY", "START_LABEL", "END_KEY", "END_LABEL",
                         "TYPE", "REVERSE_TYPE"])
    return GraphOutput(nodes, rels)


def match_path(nodes: DataFrame, rels: DataFrame, *,
               start_label: str, hops: list[tuple[str, str]],
               optional: bool = False,
               publish_tag: str | None = None) -> DataFrame:
    """MATCH (n0:start)-[:t1]->(n1:l1)-[:t2]->(n2:l2)-...: the multi-hop
    pattern surface of the reference's Neo4jExtractor (arbitrary Cypher,
    neo4j_extractor.py:79-113) as a chain of (rel_type, node_label) hops —
    e.g. ``hops=[("COLUMN", "Column"), ("HAS_BADGE", "Badge")]`` walks
    Table→Column→Badge in one call.

    Returns (n0_key, n0_props) then per hop i≥1: (r{i}_props, n{i}_key,
    n{i}_props). ``optional=True`` left-joins every hop, so partial paths
    survive with NULL tails (OPTIONAL MATCH). Each hop is two key-equality
    joins against the label-filtered node/rel sets — label filters prune
    at the scan, and a metadata graph's rel sides broadcast under AQE, so
    an h-hop pattern is h pipelined joins, not a graph traversal engine.
    """
    how = "left" if optional else "inner"
    out = nodes.where(F.col("LABEL") == start_label).select(
        F.col("KEY").alias("n0_key"), F.col("props").alias("n0_props"))
    prev_label = start_label
    for i, (rel_type, node_label) in enumerate(hops, start=1):
        r = rels.where((F.col("TYPE") == rel_type)
                       & (F.col("START_LABEL") == prev_label)
                       & (F.col("END_LABEL") == node_label))
        if publish_tag is not None:
            r = r.where(F.col("props").getItem("published_tag") == publish_tag)
        r = r.select(F.col("START_KEY").alias(f"_start{i}"),
                     F.col("END_KEY").alias(f"_end{i}"),
                     F.col("props").alias(f"r{i}_props"))
        n = nodes.where(F.col("LABEL") == node_label).select(
            F.col("KEY").alias(f"n{i}_key"), F.col("props").alias(f"n{i}_props"))
        out = (out.join(r, out[f"n{i - 1}_key"] == r[f"_start{i}"], how)
               .join(n, F.col(f"_end{i}") == n[f"n{i}_key"], how)
               .drop(f"_start{i}", f"_end{i}"))
        prev_label = node_label
    return out


def match(nodes: DataFrame, rels: DataFrame, *,
          start_label: str, rel_type: str, end_label: str,
          optional: bool = False, publish_tag: str | None = None) -> DataFrame:
    """MATCH (a:start_label)-[r:rel_type]->(b:end_label):
    returns (a_key, a_props, r_props, b_key, b_props); ``optional=True``
    keeps start nodes without the relationship (OPTIONAL MATCH ≈ left
    join, reference neo4j_search_data_extractor.py:28-48)."""
    a = nodes.where(F.col("LABEL") == start_label).select(
        F.col("KEY").alias("a_key"), F.col("props").alias("a_props"))
    b = nodes.where(F.col("LABEL") == end_label).select(
        F.col("KEY").alias("b_key"), F.col("props").alias("b_props"))
    r = rels.where((F.col("TYPE") == rel_type)
                   & (F.col("START_LABEL") == start_label)
                   & (F.col("END_LABEL") == end_label))
    if publish_tag is not None:
        r = r.where(F.col("props").getItem("published_tag") == publish_tag)
    r = r.select(F.col("START_KEY"), F.col("END_KEY"),
                 F.col("props").alias("r_props"))
    how = "left" if optional else "inner"
    joined = a.join(r, a["a_key"] == r["START_KEY"], how)
    return (joined.join(b, joined["END_KEY"] == b["b_key"],
                        "left" if optional else "inner")
            .select("a_key", "a_props", "r_props", "b_key", "b_props"))
