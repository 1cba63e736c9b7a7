"""Scaling harness: run representative operators at 1x and 10x the sf
documents/events tables and report the wall-time ratio. A ratio near 1x
means fixed overhead dominates (under-utilized cores); near 10x means the
operator is already compute-bound and scales linearly; super-linear
ratios flag a quadratic component or a skew collapse.

Run: python tools/scale_check.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from amundsendatabuilder_spark.operators.dedup import (
        benchmark_overlap, exact_duplicates, lsh_verified_pairs,
        minhash_lsh_pairs)
    from amundsendatabuilder_spark.operators.textops import (
        chunk_documents, pack_shards)
    from amundsendatabuilder_spark.session import get_spark, load_tables

    spark = get_spark("scale_check")
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    clones = spark.range(10).select(F.col("id").alias("_clone"))
    docs10 = (docs.crossJoin(clones)
              .select((F.col("doc_id") + F.col("_clone") * 1_000_000)
                      .alias("doc_id"), "text", "lang", "source", "n_chars")
              .repartition(32).cache())
    docs1 = docs.repartition(32).cache()
    print(f"# corpus 1x={docs1.count()} 10x={docs10.count()} docs",
          file=sys.stderr)

    ops = {
        "exact_duplicates": lambda d: exact_duplicates(d),
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(
            d, max_bucket_size=1_000_000_000),
        "lsh_verified_pairs": lambda d: lsh_verified_pairs(d, threshold=0.7),
        "benchmark_overlap": lambda d: benchmark_overlap(
            d.where(F.col("doc_id") % 50 != 0),
            d.where(F.col("doc_id") % 50 == 0), n=5),
        "chunk_documents": lambda d: chunk_documents(d),
        "pack_shards": lambda d: pack_shards(d),
    }

    print(f"{'operator':24} {'1x sec':>8} {'10x sec':>8} {'ratio':>6}")
    for name, fn in ops.items():
        times = {}
        for label, d in (("1x", docs1), ("10x", docs10)):
            fn(d).count()  # codegen/JIT warm
            spark.catalog.clearCache()
            d.cache().count()  # keep only the input cached
            t0 = time.time()
            fn(d).count()
            times[label] = time.time() - t0
        ratio = times["10x"] / max(times["1x"], 1e-9)
        print(f"{name:24} {times['1x']:8.2f} {times['10x']:8.2f} {ratio:5.1f}x")


if __name__ == "__main__":
    main()
