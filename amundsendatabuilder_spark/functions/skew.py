"""Skew-mitigation primitives.

AQE's skew-join splitting (on in session.py) handles most skew at runtime,
but two situations still need explicit salting at 100 TB:

- joining a huge fact to a SMALL dim on a LOW-CARDINALITY key (every row
  of one key lands on one reducer; AQE can split the partition but the
  build side must be replicated to match) — ``salted_join``;
- aggregations whose merge functions have no map-side partial form
  (collect_list over few groups) — two-stage salted aggregation,
  ``salted_two_stage_collect``.

Salt values never reach the output: they only widen the shuffle key space,
so results are byte-identical to the unsalted plan (which is exactly what
the oracle verifies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, on: str,
                buckets: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join ``big`` ⨝ ``small`` on a skewed low-cardinality key:
    the big side gets a uniform salt in [0, buckets); the small side is
    replicated once per salt value (explode of a literal range — cheap,
    it is the SMALL side by contract); the join key becomes (key, salt),
    spreading each hot key over ``buckets`` reducers.

    Salt is derived from a hash of the full row's partition position, not
    rand(), so re-executed tasks (speculation, retries) salt
    deterministically within a run."""
    big_s = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets)))
    small_s = (small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))))
    out = big_s.join(small_s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_two_stage_collect(df: DataFrame, group_col: str, value_col: str,
                             buckets: int = 16) -> DataFrame:
    """collect_list with salting: stage 1 collects per (group, salt) —
    ``buckets``-way parallel even for one giant group; stage 2 flattens the
    per-salt arrays. Output (group, values sorted) — sorting makes the
    result deterministic, which any salted collect needs anyway since
    arrival order is partition-dependent."""
    # salt by row position, NOT by value: hashing the value would send all
    # copies of one value to the same bucket, re-creating the hot reducer
    # for exactly the low-cardinality data this operator exists for
    salted = df.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets)))
    stage1 = (salted.groupBy(group_col, "_salt")
              .agg(F.collect_list(value_col).alias("_part")))
    return (stage1.groupBy(group_col)
            .agg(F.array_sort(F.flatten(F.collect_list("_part")))
                 .alias("values")))


def skew_report(df: DataFrame, key_col: str, top_n: int = 5) -> DataFrame:
    """Join/aggregation-key skew pre-flight — the audit you run BEFORE
    deciding whether a key needs ``salted_join``/AQE skew handling: the
    ``top_n`` heaviest key values with their exact row counts and
    parts-per-million share of the table, plus each key's rank. A top-1
    share near 1e6/n_partitions means one reducer owns that key's whole
    partition; anything above ~1e6/32 on a 32-way shuffle is the signal
    to salt. One count aggregation + a top-n over the (tiny) per-key
    count table; exact integer arithmetic throughout, so the report is
    oracle-verifiable like the cap/lateness audits."""
    from pyspark.sql import Window
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key_value"))
              .agg(F.count(F.lit(1)).alias("n_rows")))
    tot = counts.agg(F.sum("n_rows").alias("_tot"))
    w = Window.orderBy(F.desc("n_rows"), F.asc("key_value"))
    return (counts.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_n)
            .crossJoin(F.broadcast(tot))
            .select("rank", "key_value", "n_rows",
                    F.expr("n_rows * 1000000 DIV _tot").alias("share_ppm")))


def salting_plan(df: DataFrame, key_col: str,
                 target_rows_per_bucket: int = 100_000) -> DataFrame:
    """The PLANNING step between ``skew_report`` (is there skew?) and
    ``salted_join`` (apply a salt): for every key whose row count
    exceeds ``target_rows_per_bucket``, the integer salt factor that
    brings its heaviest (key, salt) bucket back under target —
    (rank, key_value, n_rows, salt_factor, rows_per_bucket), heaviest
    first. salt_factor = ceil(n/target), rows_per_bucket =
    ceil(n/salt_factor) — all ceiling divisions on exact BIGINTs, so
    the plan is oracle-verifiable like the cap/lateness audits and
    reproducible across engines. Keys at or under target need no salt
    and are omitted (a plan row you don't act on is noise).

    At 100 TB this is a metadata-sized query: one map-side-combinable
    count per key, a rank over the (tiny) hot tail; pass the factors to
    ``salted_join``'s buckets per key or use them to size AQE skew
    thresholds."""
    from pyspark.sql import Window
    counts = (df.groupBy(F.col(key_col).cast("string").alias("key_value"))
              .agg(F.count(F.lit(1)).alias("n_rows"))
              .where(F.col("n_rows") > target_rows_per_bucket))
    t = int(target_rows_per_bucket)
    factor = F.expr(f"(n_rows + {t} - 1) DIV {t}")
    w = Window.orderBy(F.desc("n_rows"), F.asc("key_value"))
    return (counts.withColumn("salt_factor", factor.cast("long"))
            .withColumn("rows_per_bucket",
                        F.expr("(n_rows + salt_factor - 1) DIV salt_factor")
                        .cast("long"))
            .withColumn("rank", F.row_number().over(w))
            .select("rank", "key_value", "n_rows", "salt_factor",
                    "rows_per_bucket"))
