"""Capture .explain("formatted") for named suite queries into plans/r16/ (override via $SPARK_GRAFT_PLANS_ROUND).

Usage:
    python tools/capture_plans.py before q1_pricing_summary q5_region_volume ...
    python tools/capture_plans.py after  q1_pricing_summary ...

Writes plans/r15/<query>_<tag>.txt. Plans are captured at
$SPARK_GRAFT_SF_DIR (default sf0.1) — the same data the bench times — so
Exchange counts / join strategies / PushedFilters in the files match the
bench's plans. Capture is driver-side only (no job runs), so it is safe
on a contended box.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    assert tag in ("before", "after"), f"tag must be before|after, got {tag}"
    os.makedirs(OUT_DIR, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    from amundsendatabuilder_spark.session import get_spark
    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as f:
            f.write(plan)
        n_exchange = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, "
              f"{n_exchange} Exchange refs -> {path}")


if __name__ == "__main__":
    main()
