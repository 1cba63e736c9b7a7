"""Production-feature-width classifier demonstration (r10 verdict item
#6): train + score curation.logreg_train/logreg_score at >= 2^16 hash
buckets (hex_chars=4 -> 16^4 = 65536) at sf0.1 and record wall time,
Spark job count, and the realized weight-register row count — the
committed evidence that the 1e9-scaled BIGINT weight register and its
per-round broadcast still behave at fastText-class feature widths
(the oracle-pinned suite entries stay at 256 buckets, where DuckDB
replay is cheap; the width is a parameter, not a design limit).

The register row count is the number of buckets ANY token actually
hashes into — bounded by min(vocab, 16^hex_chars) — and the broadcast
per GD round ships exactly that many (bucket, w_e9) pairs.

Run: python tools/logreg_scale_demo.py [sf_dir] [hex_chars] [iters]
Writes one JSON line (and $SPARK_GRAFT_LOGREG_JSON when set).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    hex_chars = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from amundsendatabuilder_spark.operators.curation import (
        logreg_score, logreg_train)
    from amundsendatabuilder_spark.session import get_spark, load_tables

    from pyspark.sql import functions as F

    spark = get_spark("logreg_scale_demo")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    # the driver's synthetic corpus has only 31 word types, so 65536
    # buckets would hold a 31-row register and demonstrate nothing; lift
    # the feature unit to word TRIGRAMS (~27k types at sf0.1 — the
    # bpe_scale_demo convention), the vocabulary scale where a
    # fastText-class filter actually exercises a 2^16 bucket space
    docs = docs.select(
        "doc_id", "lang",
        F.array_join(F.expr(
            "transform(sequence(0, greatest(size(split(lower(trim(text)), "
            "'\\\\s+')) - 3, 0)), i -> concat_ws('_', "
            "slice(split(lower(trim(text)), '\\\\s+'), i + 1, 3)))"),
            " ").alias("text"))

    group = "logreg_scale_demo"
    sc.setJobGroup(group, "production-feature-width logreg train+score")
    t0 = time.time()
    w = logreg_train(docs, iters=iters, hex_chars=hex_chars)
    n_register_rows = w.count()
    train_wall = time.time() - t0

    t1 = time.time()
    scored = logreg_score(docs, w, hex_chars=hex_chars)
    n_scored = scored.count()
    score_wall = time.time() - t1
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    sc.setJobGroup("", "")

    rec = {
        "metric": "logreg_production_width_demo",
        "sf_dir": sf_dir,
        "hex_chars": hex_chars,
        "bucket_space": 16 ** hex_chars,
        "iters": iters,
        "weight_register_rows": n_register_rows,
        "n_docs_scored": n_scored,
        "spark_jobs": jobs,
        "train_seconds": round(train_wall, 2),
        "score_seconds": round(score_wall, 2),
        "value": round(train_wall + score_wall, 2),
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
