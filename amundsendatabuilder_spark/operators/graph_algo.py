"""Iterative graph algorithms over edge DataFrames.

The reference models table/column lineage as edge records
(databuilder/extractor/csv_extractor.py:261-362 CsvTableLineageExtractor /
CsvColumnLineageExtractor; models/table_lineage.py) but can only emit the
direct edges — any multi-hop question (all downstream consumers of a root
table) is left to the graph database. Here the traversal itself is a Spark
operator: frontier-expansion BFS with one equi-join per hop.

Scale shape: each iteration joins the current frontier (small, broadcast
when < threshold) against the edge table partitioned by src; visited-set
dedup keeps the frontier minimal. Depth is bounded (lineage DAGs are
shallow); for unbounded closure, loop until the frontier is empty and
checkpoint every few hops to cut the lineage of the growing plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reachability(edges: DataFrame, sources: DataFrame,
                 max_depth: int = 4,
                 src_col: str = "src", dst_col: str = "dst") -> DataFrame:
    """All nodes reachable from ``sources`` within ``max_depth`` hops.

    ``edges``: (src, dst) rows. ``sources``: one column named like
    ``src_col`` holding root ids. Returns (root, node, depth) with the
    minimum hop count per (root, node); roots themselves are not emitted.

    BFS keeps per-(root, node) minimum depth by construction: a node first
    reached at depth d is excluded from later frontiers via the
    left_anti against the visited set.
    """
    frontier = sources.select(F.col(src_col).alias("root"),
                              F.col(src_col).alias("node"))
    visited = frontier.withColumn("depth", F.lit(0))
    out: DataFrame | None = None
    for depth in range(1, max_depth + 1):
        step = (frontier.join(edges, frontier["node"] == edges[src_col])
                .select("root", F.col(dst_col).alias("node"))
                .distinct())
        fresh = step.join(visited, ["root", "node"], "left_anti") \
                    .withColumn("depth", F.lit(depth))
        # local-mode iteration materializes each frontier once; on a
        # cluster add .checkpoint() every ~3 hops to truncate plan growth
        fresh = fresh.cache()
        if fresh.isEmpty():
            break
        visited = visited.unionByName(fresh)
        out = fresh if out is None else out.unionByName(fresh)
        frontier = fresh.select("root", "node")
    if out is None:
        return visited.where(F.lit(False)).select("root", "node", "depth")
    return out.select("root", "node", "depth")


def connected_components_small(edges: DataFrame,
                               src_col: str = "src",
                               dst_col: str = "dst",
                               max_iters: int = 10) -> DataFrame:
    """Connected components by iterative min-label propagation — the
    dedup-cluster builder that turns near-duplicate PAIRS into GROUPS
    (pick min doc_id per component as the keeper).

    Label propagation: every node adopts the minimum label among itself
    and its neighbors until fixpoint. Iterations ≈ graph diameter; dup
    clusters are near-cliques (diameter ≤ ~3), so this converges in a few
    map-side-combinable groupBys. Returns (node, component).
    """
    sym = (edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
           .unionByName(edges.select(F.col(dst_col).alias("a"),
                                     F.col(src_col).alias("b"))))
    labels = (sym.select("a").distinct()
              .select(F.col("a").alias("node"), F.col("a").alias("component")))
    for _ in range(max_iters):
        neighbor_min = (sym.join(labels, sym["b"] == labels["node"])
                        .groupBy("a").agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min,
                               labels["node"] == neighbor_min["a"], "left")
                   .select("node",
                           F.least(F.col("component"),
                                   F.coalesce("nmin", F.col("component")))
                           .alias("component")).cache())
        changed = (updated.join(labels.withColumnRenamed("component", "old"),
                                "node")
                   .where(F.col("component") != F.col("old")).isEmpty())
        labels = updated
        if changed:
            break
    return labels
