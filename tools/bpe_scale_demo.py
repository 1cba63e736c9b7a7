"""Production-vocabulary BPE training demonstration (r9 verdict item #5):
train a >= 5k-merge vocabulary with textops.bpe_merges_batched at sf0.1
and record the Spark JOB COUNT next to the wall time — the committed
evidence that the batched trainer runs O(n_merges/batch) jobs at
production merge counts (the sequential form is one job per merge: 5000
jobs; the batched form at batch=64 is ~79 sweeps x a few jobs each).

Run: python tools/bpe_scale_demo.py [sf_dir] [n_merges] [batch]
Writes one JSON line (and BENCH_BPE_r10.json when SPARK_GRAFT_BPE_JSON
is set).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from amundsendatabuilder_spark.operators.textops import bpe_merges_batched
    from amundsendatabuilder_spark.session import get_spark, load_tables

    from pyspark.sql import functions as F

    spark = get_spark("bpe_scale_demo")
    sc = spark.sparkContext
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the driver's synthetic corpus has only 31 word types (BPE honestly
    # converges at ~89 merges), so the demo lifts the training unit to
    # word TRIGRAMS (27k types at sf0.1, avg 15.5 chars) — the same
    # word-table shape an open-text corpus feeds a production trainer;
    # the loop cost is O(word table), never the corpus (only step 0's
    # frequency count scans it), which is exactly what this measures
    docs = docs.select(F.array_join(F.expr(
        "transform(sequence(0, greatest(size(split(lower(trim(text)), "
        "'\\\\s+')) - 3, 0)), i -> concat_ws('_', "
        "slice(split(lower(trim(text)), '\\\\s+'), i + 1, 3)))"),
        " ").alias("text"))
    group = "bpe_scale_demo"
    sc.setJobGroup(group, "batched BPE production-vocabulary run")
    t0 = time.time()
    merges = bpe_merges_batched(docs, n_merges=n_merges, batch=batch,
                                vocab_size=20_000).collect()
    wall = time.time() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    sc.setJobGroup("", "")
    rec = {
        "metric": "bpe_merges_batched_scale_demo",
        "sf_dir": sf_dir,
        "n_merges_requested": n_merges,
        "n_merges_learned": len(merges),
        "batch": batch,
        "vocab_size": 20_000,
        "spark_jobs": jobs,
        "jobs_per_merge": round(jobs / max(len(merges), 1), 4),
        "sequential_form_jobs_would_be": len(merges),
        "value": round(wall, 2),
        "unit": "sec",
    }
    line = json.dumps(rec)
    print(line)
    out = os.environ.get("SPARK_GRAFT_BPE_JSON")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
