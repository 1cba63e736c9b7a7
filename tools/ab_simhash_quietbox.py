"""Quiet-box commit A/B for the two r12 outliers (r12 verdict item #2):
dedup_simhash_hamming_capped (1.90x quiet-box r11g->r12) and
dedup_simhash64_capped (1.72x) moved well beyond the established 1.155x
box offset with bit-identical code and unchanged plans — they were not
in the r12 builder's flagship/minhash A/B set, so they need their own
same-box n=5 record to close the adjudication.

Usage:  python tools/ab_simhash_quietbox.py <repo_or_worktree_root> <tag>
Runs the two queries (plus the flagship as an anchor) n=5 at sf0.1 with
start/end calibration bracketing, printing ONE JSON line. Run it twice —
once against a worktree of the r11 commit, once against HEAD — in the
same quiet session, and commit both lines as a BENCH sidecar.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

import os

QUERIES = os.environ.get(
    "SPARK_GRAFT_AB_QUERIES",
    "dedup_simhash_hamming_capped,dedup_simhash64_capped,"
    "search_doc_flagship").split(",")
# default set: the two r12 outliers + the flagship as the known-offset
# anchor; override with SPARK_GRAFT_AB_QUERIES=a,b,... for later rounds'
# adjudications
SF_DIR = "/root/testdata/sf0.1"
N = 5


def main() -> None:
    root, tag = sys.argv[1], sys.argv[2]
    sys.path.insert(0, root)
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES as Q
    from amundsendatabuilder_spark.session import get_spark

    # import the HEAD bench module for the PINNED calib workload so both
    # sides bracket with the identical probe regardless of worktree age.
    # Loaded BY FILE PATH, not via sys.path: inserting /root/repo ahead
    # of the worktree root would make every module the worktree lazily
    # imports inside query bodies resolve from HEAD, contaminating the
    # A/B toward "no difference" (r13 ADVICE — exactly what the r13
    # simhash adjudication risked)
    # bench.py's own import-time `sys.path.insert(0, <its dir>)` would
    # reintroduce the precedence bug, so the path is snapshotted around
    # the exec; the assert below fails loudly if the exec ever starts
    # registering package modules (bench.py has no module-level package
    # imports today — were one added, those HEAD modules would be cached
    # ahead of the worktree's and silently contaminate the A/B)
    import importlib.util
    _spec = importlib.util.spec_from_file_location(
        "_head_bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(_spec)
    _saved_path = list(sys.path)
    _mods_before = set(sys.modules)
    try:
        _spec.loader.exec_module(bench)
    finally:
        sys.path[:] = _saved_path
    _leaked = [m for m in sys.modules if m not in _mods_before
               and m.startswith("amundsendatabuilder_spark")]
    assert not _leaked, (
        f"HEAD bench exec registered package modules {_leaked} — evict "
        "them (del sys.modules[...]) before importing the worktree side")

    spark = get_spark(f"ab_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    # same warmup as bench.py
    Q["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
    Q["dedup_minhash_lsh"](spark, "/root/testdata/sf0.001").collect()

    calib = bench.calibration_probe(spark)
    out: dict[str, dict] = {}
    for name in QUERIES:
        runs = []
        for _ in range(N):
            t0 = time.time()
            Q[name](spark, SF_DIR).count()
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {"median": round(statistics.median(runs), 3),
                     "runs": runs}
    calib_end = bench.calibration_probe(spark)
    print(json.dumps({"tag": tag, "root": root, "n": N,
                      "calib_seconds": calib,
                      "calib_seconds_end": calib_end,
                      "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
