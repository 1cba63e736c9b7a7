"""Conversion attribution: a bounded-interval event join.

The reference has no temporal joins at all (SURVEY §2.3: "no
theta/range/as-of joins exist"); this is the training-/product-pipeline
extension alongside operators/asof.py. Where as-of picks the single most
recent prior event, attribution aggregates ALL prior events inside a
lookback window (the "views in the hour before each purchase" question).

Scale shape: an equi-join on the entity key (user_id) with the time bound
applied as a join-level predicate — Spark executes it as a hash join on
user_id with the range as a residual filter, so cost is bounded by
per-user event density, never a cross product. At 100 TB: bucket both
sides by user_id so the join is co-located, and salt the handful of
bot-grade hot users (functions/skew.salted_join) that AQE's skew split
doesn't already cover.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def conversion_attribution(events: DataFrame,
                           conversion_type: str = "purchase",
                           touch_type: str = "view",
                           lookback_minutes: int = 60,
                           user_col: str = "user_id",
                           ts_col: str = "ts",
                           id_col: str = "event_id") -> DataFrame:
    """Per conversion event: count of touch events by the same user in the
    preceding ``lookback_minutes`` (inclusive of the conversion instant)
    and the timestamp of the last such touch.

    Returns (event_id, user_id, conversion_us, n_touches, last_touch_us);
    conversions with zero touches survive (left join + conditional agg).
    """
    lookback_us = lookback_minutes * 60 * 1_000_000
    conv = (events.where(F.col("event_type") == conversion_type)
            .select(F.col(id_col), F.col(user_col),
                    F.unix_micros(F.col(ts_col)).alias("conversion_us")))
    touch = (events.where(F.col("event_type") == touch_type)
             .select(F.col(user_col).alias("_tu"),
                     F.unix_micros(F.col(ts_col)).alias("touch_us")))
    in_window = ((F.col("touch_us") <= F.col("conversion_us"))
                 & (F.col("touch_us") > F.col("conversion_us") - lookback_us))
    return (conv.join(touch, conv[user_col] == touch["_tu"], "left")
            .groupBy(id_col, user_col, "conversion_us")
            .agg(F.count(F.when(in_window, 1)).cast("long").alias("n_touches"),
                 F.max(F.when(in_window, F.col("touch_us")))
                 .alias("last_touch_us")))


def funnel_stages(events: DataFrame, stages: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """Strictly-ordered funnel: how many users reach each stage, where
    stage i counts only events AFTER the user's stage-(i-1) instant —
    the product-analytics sequence query (signup -> view -> click ->
    purchase) the events table exists for.

    Per user, stage 0 anchors at min ts of stages[0]; stage i anchors at
    min ts of stages[i] strictly after the stage-(i-1) anchor. Returns
    (stage_idx, stage, n_users, avg_delay_sec) where avg_delay_sec is
    the mean seconds from the previous anchor (NULL for stage 0),
    computed from exact integer epoch sums and rounded to 4dp.

    Scale shape: one filtered min-aggregation plus one equi-join on
    user_id per stage — no windows over the whole event stream, no
    cross products; every join key is the user, so bucketing both sides
    by user_id makes the entire chain co-located at 100 TB."""
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    ep = F.unix_timestamp(F.col(ts_col))
    # each stage's anchor table is at most |users| rows but its LAZY plan
    # contains every earlier stage — and the final per-stage aggregates
    # evaluate each branch separately, re-running stage i's chain i times
    # (O(k²) stage executions; measured 29s at the sf1 headroom run).
    # localCheckpoint caps every branch at one execution.
    anchors = (events.where(F.col(type_col) == stages[0])
               .groupBy(user_col).agg(F.min(ep).alias("a0")))
    per_stage = [anchors.select(user_col, F.col("a0").alias("anchor"))
                 .localCheckpoint()]
    for i, stage in enumerate(stages[1:], start=1):
        prev = per_stage[-1]
        nxt = (events.where(F.col(type_col) == stage)
               .select(user_col, ep.alias("e"))
               .join(prev, user_col)
               .where(F.col("e") > F.col("anchor"))
               .groupBy(user_col)
               .agg(F.min("e").alias("nxt"), F.first("anchor").alias("prv"))
               .select(user_col, F.col("nxt").alias("anchor"),
                       (F.col("nxt") - F.col("prv")).alias("delay"))
               .localCheckpoint())
        per_stage.append(nxt)
    rows = []
    for i, (stage, df) in enumerate(zip(stages, per_stage)):
        agg = df.agg(
            F.count(F.lit(1)).alias("n_users"),
            (round_half_away(F.sum("delay").cast("double")
                             / F.count(F.lit(1)), 4)
             if i else F.lit(None).cast("double")).alias("avg_delay_sec"))
        rows.append(agg.select(F.lit(i).alias("stage_idx"),
                               F.lit(stage).alias("stage"),
                               "n_users", "avg_delay_sec"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def linear_touch_credit(events: DataFrame,
                        conversion_type: str = "purchase",
                        touch_type: str = "view",
                        lookback_minutes: int = 60,
                        user_col: str = "user_id",
                        ts_col: str = "ts",
                        id_col: str = "event_id") -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's value splits
    equally across its in-window touches, in exact integer micro-units —
    credit = value_micros DIV n, with the division remainder assigned to
    the LAST touch so per-conversion credit sums exactly to the
    conversion value (no float leakage, any engine reproduces it).

    Returns one row per (conversion, touch):
    (conv_id, user_id, touch_us, credit_micros). Conversions with zero
    in-window touches emit nothing here — conversion_attribution is the
    count-keeping surface. Same join shape as conversion_attribution
    (user-key hash join, time bound as residual), one extra window
    ranked by touch recency per conversion to find the remainder
    carrier; the window partitions by conversion id, so state is
    per-conversion touch counts, never the stream."""
    from pyspark.sql import Window
    lookback_us = lookback_minutes * 60 * 1_000_000
    conv = (events.where(F.col("event_type") == conversion_type)
            .select(F.col(id_col).alias("conv_id"), F.col(user_col),
                    F.unix_micros(F.col(ts_col)).alias("conversion_us"),
                    F.round(F.col("value") * 1_000_000, 0).cast("long")
                    .alias("value_micros")))
    touch = (events.where(F.col("event_type") == touch_type)
             .select(F.col(user_col).alias("_tu"),
                     F.unix_micros(F.col(ts_col)).alias("touch_us")))
    pairs = (conv.join(touch, (conv[user_col] == touch["_tu"])
                       & (F.col("touch_us") <= F.col("conversion_us"))
                       & (F.col("touch_us") > F.col("conversion_us")
                          - lookback_us))
             .select("conv_id", user_col, "conversion_us", "value_micros",
                     "touch_us"))
    w = Window.partitionBy("conv_id")
    wr = Window.partitionBy("conv_id").orderBy(F.col("touch_us").desc())
    ranked = (pairs.withColumn("n", F.count(F.lit(1)).over(w))
              .withColumn("rk", F.row_number().over(wr)))
    base = F.expr("value_micros DIV n")
    rem = F.col("value_micros") - base * F.col("n")
    return ranked.select(
        "conv_id", user_col, "touch_us",
        (base + F.when(F.col("rk") == 1, rem).otherwise(F.lit(0)))
        .cast("long").alias("credit_micros"))
