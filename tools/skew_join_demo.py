"""Applied-skew proof (r11 verdict item #7): close the plan→action loop
skew_report → salting_plan → salted_join with a measured payoff.

Fixture: a generated fact table where ONE key owns half the rows
(hot-key share ~500,000 ppm — far past skew_report's ~1e6/32 signal on
a 32-way shuffle) joined to a dim too big to broadcast by contract
(auto-broadcast disabled, mirroring a 100 TB dim that exceeds the
threshold). Three variants, identical results:

  1. plain sort-merge join, AQE skew-join OFF  (the naive plan: the hot
     key's entire partition lands on one reducer)
  2. plain sort-merge join, AQE skew-join ON   (runtime split of the
     oversized partition)
  3. salted_join with buckets = the salt_factor salting_plan emits for
     the hot key (plan-driven explicit salting)

Writes BENCH_SKEW_r12.json via $SPARK_GRAFT_SKEW_JSON. The accompanying
note (PLANS.md "skew: plan→action") records when AQE suffices: AQE's
skew split only REPARTITIONS the probe side of a sort-merge join — it
is the right default whenever the join is already shuffle-based and the
skew is in row COUNT; explicit salting is still needed when (a) the
hot key feeds an aggregation with no partial form, or (b) the build
side must be replicated to match a pre-partitioned layout AQE cannot
re-plan (bucketed tables, storage-partitioned joins).

Run: python tools/skew_join_demo.py [n_fact_rows]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_FACT = 40_000_000
N_KEYS = 1_000
TARGET = 1_000_000  # salting_plan target_rows_per_bucket


def main() -> None:
    n_fact = int(sys.argv[1]) if len(sys.argv) > 1 else N_FACT

    from amundsendatabuilder_spark.functions.skew import (
        salted_join, salting_plan, skew_report)
    from amundsendatabuilder_spark.session import get_spark

    from pyspark.sql import functions as F

    spark = get_spark("skew_join_demo")
    spark.sparkContext.setLogLevel("ERROR")
    # the dim is "too big to broadcast" by contract
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    # fact: key 0 owns half the rows; the rest uniform over N_KEYS keys
    fact = (spark.range(0, n_fact, 1, 32)
            .select(F.when(F.col("id") % 2 == 0, F.lit(0))
                    .otherwise(F.col("id") % N_KEYS).alias("k"),
                    (F.col("id") % 97).alias("v"))
            ).localCheckpoint()
    dim = (spark.range(N_KEYS)
           .select(F.col("id").alias("k"),
                   (F.col("id") * 7 % 13).alias("w"))).localCheckpoint()

    # the audit says SALT: top-1 share ~500000 ppm >> 1e6/32 = 31250
    top = skew_report(fact, "k", top_n=1).collect()[0]
    plan = salting_plan(fact, "k", target_rows_per_bucket=TARGET).collect()
    hot = plan[0]
    assert hot.key_value == "0" and top.share_ppm > 400_000
    buckets = int(hot.salt_factor)

    def timed(fn, n=3):
        runs = []
        res = None
        for _ in range(n):
            t0 = time.time()
            res = fn()
            runs.append(round(time.time() - t0, 2))
        return statistics.median(runs), res, runs

    def agg(df):
        return df.groupBy().agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("s")).collect()[0]

    variants = {}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    t, r_plain, runs = timed(lambda: agg(fact.join(dim, "k")))
    variants["plain_smj_aqe_skew_off"] = {"seconds": t, "runs": runs}
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t, r_aqe, runs = timed(lambda: agg(fact.join(dim, "k")))
    variants["plain_smj_aqe_skew_on"] = {"seconds": t, "runs": runs}
    t, r_salt, runs = timed(
        lambda: agg(salted_join(fact, dim, "k", buckets=buckets)))
    variants["salted_join_plan_buckets"] = {"seconds": t, "runs": runs,
                                            "buckets": buckets}

    # salting must be result-identical to the unsalted plan
    assert (r_plain.n, r_plain.s) == (r_aqe.n, r_aqe.s) == (r_salt.n, r_salt.s)

    rec = {
        "metric": "skew_join_applied_proof",
        "n_fact_rows": n_fact,
        "hot_key_share_ppm": int(top.share_ppm),
        "salting_plan_factor": buckets,
        "rows_joined": int(r_plain.n),
        "variants": variants,
        "value": variants["salted_join_plan_buckets"]["seconds"],
        "unit": "sec",
    }
    line = json.dumps(rec)
    print(line)
    out = os.environ.get("SPARK_GRAFT_SKEW_JSON")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
