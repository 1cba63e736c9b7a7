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

    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.dedup import (
        embedding_near_duplicates, ngram_jaccard_pairs, simhash_hamming_pairs)

    ops = {
        "exact_duplicates": lambda d: exact_duplicates(d),
        # production defaults (bucket cap 1000) — the config users run
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(d),
        "lsh_verified_pairs": lambda d: lsh_verified_pairs(d, threshold=0.7),
        "simhash_hamming_k1": lambda d: simhash_hamming_pairs(d, k=1),
        "ngram_jaccard_max_df": lambda d: ngram_jaccard_pairs(
            d, threshold=0.6, max_df=100),
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

    # Embedding near-dup scales on FRESH vectors (cloning would only
    # measure the output explosion of 10 exact copies per vector): md5-mix
    # synthetic 64-dim vectors, realistic near-dup config (t=0.9, 32
    # planes in 4 bands => 8-bit bucket signatures).
    def synth_emb(n: int):
        idx = F.sequence(F.lit(1), F.lit(64))
        vec = F.transform(idx, lambda i: (
            F.conv(F.substring(F.md5(F.concat(F.col("id").cast("string"),
                                              F.lit("_"), i.cast("string"))),
                               1, 4), 16, 10).cast("double") / 65535.0 - 0.5))
        return (spark.range(n).select(F.col("id").alias("vec_id"),
                                      vec.alias("embedding"))
                .repartition(32).cache())

    planes = random_planes(64, 32, seed=11)
    for label, n in (("1x", 5_000), ("10x", 50_000)):
        e = synth_emb(n)
        e.count()
        fn = lambda d: embedding_near_duplicates(  # noqa: E731
            d, threshold=0.9, planes=planes, bands=4)
        fn(e).count()  # warm
        t0 = time.time()
        n_pairs = fn(e).count()
        t = time.time() - t0
        print(f"embedding_near_dup_rhp {label:>4} n={n}: {t:6.2f}s pairs={n_pairs}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
