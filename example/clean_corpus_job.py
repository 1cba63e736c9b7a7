"""End-to-end training-corpus cleaning pipeline — the data-pipeline twin of
example/sample_job.py's catalog ETL. Composes the engine's operators into
the standard pretraining-data flow:

    read -> PII scrub -> quality/repetition filter -> near-dup removal
    (LSH candidates -> exact verify -> connected components -> keep one
    per cluster) -> test-set decontamination -> deterministic sample ->
    token-budget shard packing -> write cleaned parquet + stats

Run: python example/clean_corpus_job.py [sf_dir] [out_dir]

Every stage is a DataFrame transform; nothing collects to the driver
except the final summary counts. At 100 TB the same script runs unchanged
— partition counts and the LSH bucket cap are the only knobs to revisit.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from amundsendatabuilder_spark.operators.dedup import (  # noqa: E402
    benchmark_overlap, lsh_verified_pairs)
from amundsendatabuilder_spark.operators.graph_algo import (  # noqa: E402
    connected_components)
from amundsendatabuilder_spark.operators.textops import (  # noqa: E402
    pack_shards, pii_scrub, quality_metrics, repetition_metrics)
from amundsendatabuilder_spark.session import get_spark, load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/clean_corpus"
    spark = get_spark("clean_corpus")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    n_input = docs.count()

    # 1. scrub: replace text with its scrubbed form (here we keep the doc
    #    and attach audit counts; pii_scrub emits hashes for verification,
    #    the inline variant rewrites in place)
    from amundsendatabuilder_spark.operators.textops import (
        PII_DIGITS, PII_EMAIL, PII_IPV4)
    scrubbed = docs.withColumn(
        "text", F.regexp_replace(F.regexp_replace(F.regexp_replace(
            F.col("text"), PII_EMAIL, "<EMAIL>"), PII_DIGITS, "<NUM>"),
            PII_IPV4, "<IP>"))

    # 2. quality + repetition gates (joined on doc_id, both pre-aggregated)
    q = quality_metrics(scrubbed).select("doc_id", "quality")
    r = repetition_metrics(scrubbed).select("doc_id", "top_token_frac")
    gated = (scrubbed.join(q, "doc_id").join(r, "doc_id")
             .where((F.col("quality") >= 0.3) & (F.col("top_token_frac") <= 0.3))
             .drop("quality", "top_token_frac"))
    n_gated = gated.count()

    # 3. near-dup removal: verified pairs -> components (adaptive: driver
    #    union-find on the small verified-pair graph) -> keep min doc_id
    pairs = lsh_verified_pairs(gated, threshold=0.7)
    comps = connected_components(pairs, src_col="doc_a", dst_col="doc_b")
    losers = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id"))
    deduped = gated.join(losers, "doc_id", "left_anti")
    n_deduped = deduped.count()

    # 4. test-set decontamination: drop training docs sharing any 5-gram
    #    with the held-out slice (doc_id % 50 == 0 stands in for the eval
    #    set); the benchmark gram set broadcasts, the corpus never shuffles
    eval_set = deduped.where(F.col("doc_id") % 50 == 0)
    train = deduped.where(F.col("doc_id") % 50 != 0)
    contaminated = benchmark_overlap(train, eval_set, n=5).select("doc_id")
    decontaminated = train.join(contaminated, "doc_id", "left_anti")
    n_decontaminated = decontaminated.count()

    # 5. deterministic 12.5% sample (md5 prefix — reproducible across runs)
    sampled = decontaminated.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1"))

    # 6. token-budget shard packing + write: shard_id only counts WITHIN a
    #    stratum, so the output partitions by (stratum, shard_id) — each
    #    leaf directory then holds ~budget tokens of one stratum (the
    #    layout a trainer streams); partitioning by shard_id alone would
    #    merge every stratum's shard 0 into one oversized directory
    shards = pack_shards(sampled, budget_tokens=20_000).select(
        "doc_id", "stratum", "shard_id")
    (sampled.join(shards, "doc_id")
     .write.mode("overwrite").partitionBy("stratum", "shard_id")
     .parquet(os.path.join(out_dir, "clean")))
    n_out = spark.read.parquet(os.path.join(out_dir, "clean")).count()
    summary = {"input_docs": n_input, "after_quality_gate": n_gated,
               "after_dedup": n_deduped,
               "after_decontamination": n_decontaminated,
               "sampled_out": n_out,
               "status": "success"}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f)
    print(summary)


if __name__ == "__main__":
    main()
