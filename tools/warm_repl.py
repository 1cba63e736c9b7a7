"""Warm-session measurement harness for the r15 optimization round.

The build box backs guest memory lazily at ~10 MB/s first-touch, so every
fresh JVM pays a multi-minute cold tax and bench.py restarts are not
comparable run-to-run. This harness keeps ONE Spark JVM alive (run it
under tmux with `python -i tools/warm_repl.py`), warms it until the
pinned calibration probe reads < 0.7s, and then times queries with n>=5
medians + calib brackets — the same protocol bench.py records, minus the
JVM restart.

Helpers (in the interactive namespace):
    warm()            — run warmup + calib until the probe stabilizes
    t(name, n=5)      — median/runs for one suite query (count() action)
    calib()           — one calibration probe reading
    plans(tag, *names) — dump .explain('formatted') to plans/r15/
    reload_suite()    — re-import the package after a code edit
"""
from __future__ import annotations

import importlib
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.1"


def _fresh_queries():
    import amundsendatabuilder_spark
    mods = [m for m in list(sys.modules)
            if m.startswith("amundsendatabuilder_spark") or m == "_head_bench"]
    for m in mods:
        del sys.modules[m]
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    return QUERIES


def reload_suite():
    global Q
    Q = _fresh_queries()
    return sorted(Q)[:3]


import importlib.util as _ilu
_spec = _ilu.spec_from_file_location("_head_bench", "/root/repo/bench.py")
_bench = _ilu.module_from_spec(_spec)
_saved = list(sys.path)
try:
    _spec.loader.exec_module(_bench)
finally:
    sys.path[:] = _saved

from amundsendatabuilder_spark.plans.oracle_suite import QUERIES as Q  # noqa: E402
from amundsendatabuilder_spark.session import get_spark  # noqa: E402

spark = get_spark("warm_repl")
spark.sparkContext.setLogLevel("ERROR")


def calib() -> float:
    return _bench.calibration_probe(spark)


def warm(target: float = 0.7, max_rounds: int = 12) -> float:
    Q["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    Q["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").collect()
    c = calib()
    rounds = 0
    while c > target and rounds < max_rounds:
        Q["dedup_lsh_verified"](spark, SF_DIR).count()
        spark.catalog.clearCache()
        c = calib()
        rounds += 1
        print(f"warm round {rounds}: calib={c}")
    print(f"warm: calib={c}")
    return c


def t(name: str, n: int = 5, sf_dir: str = SF_DIR):
    runs = []
    rows = 0
    for _ in range(n):
        t0 = time.time()
        df = Q[name](spark, sf_dir)
        rows = df.count()
        runs.append(round(time.time() - t0, 3))
        spark.catalog.clearCache()
    med = round(statistics.median(runs), 3)
    print(f"# {name}: median={med}s runs={runs} rows={rows}")
    return med


def plans(tag: str, *names: str) -> None:
    import os
    out_dir = os.path.join("/root/repo/plans",
                           os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = Q[name](spark, SF_DIR)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"{out_dir}/{name}_{tag}.txt", "w", encoding="utf-8") as f:
            f.write(p)
        print(f"{name}: {p.count('Exchange')} Exchange refs -> "
              f"{out_dir}/{name}_{tag}.txt")


if __name__ == "__main__":
    print("warm_repl ready; call warm() then t('query_name')")
