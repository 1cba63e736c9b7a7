"""A/B the iterative-checkpoint shape on the edge-fed graph operators
(r16, VERDICT r15 item #4): coalesce-above-agg (current) vs
repartition-above-agg (the r15 hyperball refinement) on pagerank,
label_propagation and temporal_reachability, at the sf0.1 query scale
AND on a larger deterministic synthetic edge set (default ~10x).

The shape switch is graph_algo._narrow_ckpt's SPARK_GRAFT_CKPT_SHAPE env
var, read at call time — so one warm JVM interleaves both sides with no
reimport and no worktree. Prints one JSON line per (operator, scale,
shape, round): n=3 runs, min + median.

Usage: python tools/ab_ckpt_shape.py [n_nodes_synthetic]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
N_RUNS = 3


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    from pyspark.sql import functions as F

    from amundsendatabuilder_spark.operators.graph_algo import (
        label_propagation, pagerank, temporal_reachability)
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    from amundsendatabuilder_spark.session import get_spark

    spark = get_spark("ab_ckpt_shape")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()

    # deterministic synthetic graph, the pagerank query's doubling/tripling
    # shape at a chosen node count (the sf0.1 query graph has ~45k nodes;
    # default 150k nodes -> ~450k edges, ~10x the query's edge count after
    # the modular wrap). localCheckpoint so every timed run starts from a
    # materialized edge list, not the generator.
    base = spark.range(1, n_nodes).select(F.col("id").alias("src"))
    syn_edges = (
        base.select("src", (F.col("src") * 2 % n_nodes).alias("dst"))
        .unionByName(base.select(
            "src", ((F.col("src") * 2 + 1) % n_nodes).alias("dst")))
        .unionByName(base.select(
            "src", (F.col("src") * 3 % n_nodes).alias("dst")))
        .where(F.col("dst") != F.col("src"))
    ).localCheckpoint()
    syn_sources = spark.range(1, 101).select(F.col("id").alias("node"))
    syn_tedges = syn_edges.select(
        "src", "dst", (F.col("src") % 1000 + 1).alias("ts"))

    def run_case(label: str, fn) -> None:
        for rnd in (1, 2):
            for shape in ("coalesce", "repartition"):
                os.environ["SPARK_GRAFT_CKPT_SHAPE"] = shape
                runs = []
                for _ in range(N_RUNS):
                    t0 = time.time()
                    fn().count()
                    runs.append(round(time.time() - t0, 3))
                    spark.catalog.clearCache()
                print(json.dumps({
                    "case": label, "shape": shape, "round": rnd,
                    "min": min(runs),
                    "median": round(statistics.median(runs), 3),
                    "runs": runs}))
                sys.stdout.flush()
        os.environ.pop("SPARK_GRAFT_CKPT_SHAPE", None)

    run_case("pagerank_sf01",
             lambda: QUERIES["graph_pagerank"](spark, SF_DIR))
    run_case("label_prop_sf01",
             lambda: QUERIES["graph_label_propagation"](spark, SF_DIR))
    run_case("temporal_sf01",
             lambda: QUERIES["temporal_reachability"](spark, SF_DIR))
    run_case(f"pagerank_syn{n_nodes}",
             lambda: pagerank(syn_edges, iters=3))
    run_case(f"label_prop_syn{n_nodes}",
             lambda: label_propagation(syn_edges, iters=3))
    run_case(f"temporal_syn{n_nodes}",
             lambda: temporal_reachability(syn_tedges, syn_sources,
                                           rounds=3, ts_col="ts"))


if __name__ == "__main__":
    main()
