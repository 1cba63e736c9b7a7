"""Classifier width ladder, step 2 (r11 verdict item #6): train + score
the in-engine logreg at 2^16 / 2^18 / 2^20 hashed UNIGRAM+BIGRAM
features (textops.feature_hashing_bits — the fastText wordNgrams=2
recipe) at sf0.1, recording Spark jobs, wall time, and realized weight-
register rows per rung. Done-criterion: <=~linear growth in register
rows and wall time vs bucket count.

The 2^20 rung exceeds the default 1M-row register contract by 4.9%:
the ladder FIRST demonstrates the plan-time raise under the default
limit (the guard is real), then pins REGISTER_DOMAIN_LIMIT = 2^21 for
the measured run — the documented way an operator consumer widens the
contract deliberately instead of the engine degrading silently.

Run: python tools/logreg_width_ladder.py [sf_dir]
Writes one JSON line (and $SPARK_GRAFT_LOGREG_JSON when set).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BITS = (16, 18, 20)
ITERS = 4


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from amundsendatabuilder_spark.operators import profiling
    from amundsendatabuilder_spark.operators.curation import (
        logreg_score, logreg_train)
    from amundsendatabuilder_spark.operators.textops import (
        feature_hashing_bits)
    from amundsendatabuilder_spark.session import get_spark, load_tables

    from pyspark.sql import functions as F

    spark = get_spark("logreg_width_ladder")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the synthetic corpus has ~31 word types; lift the token unit to
    # word trigrams (~27k types at sf0.1, the logreg_scale_demo
    # convention) so unigram+bigram hashing actually populates a
    # 2^16-2^20 bucket space
    docs = docs.select(
        "doc_id", "lang",
        F.array_join(F.expr(
            "transform(sequence(0, greatest(size(split(lower(trim(text)), "
            "'\\\\s+')) - 3, 0)), i -> concat_ws('_', "
            "slice(split(lower(trim(text)), '\\\\s+'), i + 1, 3)))"),
            " ").alias("text")).localCheckpoint()

    # the guard is real: 2^20 buckets over the default 1M contract
    # raises at plan time before any job
    guard_raised = False
    try:
        logreg_train(docs, iters=1,
                     featurizer=lambda d: feature_hashing_bits(d, bits=20),
                     n_buckets=1 << 20)
    except ValueError as exc:
        guard_raised = "register domain" in str(exc)
    # deliberate widen for the measured rungs
    profiling.REGISTER_DOMAIN_LIMIT = 1 << 21

    rungs = []
    for bits in BITS:
        group = f"ladder_{bits}"
        sc.setJobGroup(group, f"logreg width ladder 2^{bits}")
        t0 = time.time()
        w = logreg_train(
            docs, iters=ITERS,
            featurizer=lambda d, b=bits: feature_hashing_bits(d, bits=b),
            n_buckets=1 << bits)
        n_register_rows = w.count()
        train_wall = time.time() - t0
        t1 = time.time()
        n_scored = logreg_score(
            docs, w,
            featurizer=lambda d, b=bits: feature_hashing_bits(d, bits=b),
            n_buckets=1 << bits).count()
        score_wall = time.time() - t1
        jobs = len(sc.statusTracker().getJobIdsForGroup(group))
        sc.setJobGroup("", "")
        rungs.append({
            "bits": bits,
            "bucket_space": 1 << bits,
            "weight_register_rows": n_register_rows,
            "n_docs_scored": n_scored,
            "spark_jobs": jobs,
            "train_seconds": round(train_wall, 2),
            "score_seconds": round(score_wall, 2),
        })
        print(f"# 2^{bits}: register={n_register_rows} "
              f"train={train_wall:.2f}s score={score_wall:.2f}s "
              f"jobs={jobs}", file=sys.stderr)

    rec = {
        "metric": "logreg_width_ladder",
        "sf_dir": sf_dir,
        "features": "hashed unigram+bigram (feature_hashing_bits)",
        "iters": ITERS,
        "default_guard_raised_at_2pow20": guard_raised,
        "pinned_register_limit": 1 << 21,
        "rungs": rungs,
        "value": round(sum(r["train_seconds"] + r["score_seconds"]
                           for r in rungs), 2),
        "unit": "sec",
    }
    line = json.dumps(rec)
    print(line)
    out = os.environ.get("SPARK_GRAFT_LOGREG_JSON")
    if out:
        with open(out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
