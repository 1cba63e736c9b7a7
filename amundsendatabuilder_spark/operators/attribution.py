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
