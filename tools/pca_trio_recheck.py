"""PCA-trio idle re-read (r13 verdict item #4): the r13 full sweep read
pca_power_iteration / pca_explained_variance / pca_top_components at
1.20-1.28x their r12 values at near-equal calib, with no code change in
their plans before the record was taken — and unlike the TPC-H block
they got no in-artifact recheck. The r13 driver artifact read FLAT
(pca_top_components 10.749s r13 vs 10.802s r12), so the reading is
presumptively environment; this tool closes it the tpch_block_recheck
way: quiet-box n=5 medians with calib bracketing, one JSON sidecar.

NOTE (r14): the trio's plan DID change this round (the covariance
register's empty-escape coalesce) — the r14 reading therefore compares
HEAD-now against the r12 level; the coalesce adds one row-level branch
to a 2080-row register aggregate and cannot plausibly cost 20%.

Usage: python tools/pca_trio_recheck.py   (box must be otherwise idle)
Writes BENCH_PCA_r14.json.
"""

from __future__ import annotations

import importlib.util
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "embedding_covariance",       # the shared corpus pass
    "pca_power_iteration",
    "pca_explained_variance",
    "pca_top_components",
    "search_doc_flagship",        # anchor: known-offset reference
]
# full-sweep readings to adjudicate against (BENCH_LOCAL_r12/r13.json)
PRIOR = {
    "embedding_covariance": {"r12": 2.994, "r13": 3.591},
    "pca_power_iteration": {"r12": 6.682, "r13": 8.038},
    "pca_explained_variance": {"r12": 6.436, "r13": 8.125},
    "pca_top_components": {"r12": 9.824, "r13": 12.605},
}
SF_DIR = "/root/testdata/sf0.1"
N = 5


def main() -> None:
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES as Q
    from amundsendatabuilder_spark.session import get_spark

    spec = importlib.util.spec_from_file_location(
        "_head_bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    saved = list(sys.path)
    try:
        spec.loader.exec_module(bench)
    finally:
        sys.path[:] = saved

    spark = get_spark("pca_trio_recheck")
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
        med = round(statistics.median(runs), 3)
        rec = {"median": med, "runs": runs}
        if name in PRIOR:
            rec.update(PRIOR[name])
            rec["vs_r12"] = round(med / PRIOR[name]["r12"], 3)
        out[name] = rec
        print(f"# {name}: median {med}s runs {runs}", file=sys.stderr)
    calib_end = bench.calibration_probe(spark)
    record = {"metric": "pca_trio_recheck", "sf": 0.1, "n": N,
              "calib_seconds": calib, "calib_seconds_end": calib_end,
              "calib_ref": bench.CALIB_REF, "queries": out}
    with open("/root/repo/BENCH_PCA_r14.json", "w") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
