"""Streaming as-of (most-recent-prior) join — the streaming twin of
``operators/asof.asof_join`` (round-9 verdict item #3), completing the
events family next to ``events.stream_stream_attribution_outer``.

Semantics: for every purchase, attach the SAME USER's most recent view
with ``view_ts <= purchase_ts`` within a ``horizon_minutes`` lookback —
one output row per purchase (left-outer: zero-view purchases emit a NULL
``asof_view_ts``). A watermarked stream-stream interval join alone
cannot express this (it fans out to ALL prior views, and the per-event
max it then needs is a second stateful aggregation append mode refuses
after a time-interval join), so this is the engine's
``applyInPandasWithState`` custom stateful operator, like
``dedup_stream`` (the API surface the reference never reaches — its
Kafka extractor is stateless, SURVEY §2.8).

Emission frontier (pinned, hash-verifiable): a purchase may only emit
once the event-time watermark proves no earlier-timestamped view can
still arrive, i.e. strictly after the watermark passes ``purchase_ts``.
Matched AND unmatched purchases both hold to that frontier (unlike the
built-in left-outer join, where matches emit eagerly) because the
most-recent-prior answer itself can improve until the frontier passes.
On an AvailableNow drain the final no-data micro-batch advances the
watermark to max(event ts) - delay and fires the event-time timeouts,
so the drained output is EXACTLY the batch as-of join restricted to
``purchase_ts < max(ts) - delay`` — the oracle in SQL, verbatim.

Scale shape: state is per-user — a view-timestamp buffer pruned to the
lookback horizon behind the watermark plus the pending purchases ahead
of it, so state is bounded by per-user event density x horizon, never
history; the shuffle carries (user_id, ts, event_id) rows only. With
the RocksDB state backend this runs indefinitely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ASOF_OUTPUT = ("event_id long, user_id long, purchase_ts timestamp, "
               "asof_view_ts timestamp")
# view buffer + pending purchases, all event times as int64 micros
_ASOF_STATE = "views array<long>, pend_ids array<long>, pend_ts array<long>"


def _asof_fn(horizon_us: int):
    """Build the per-user stateful function (closure over the horizon)."""

    def fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        views, pend_ids, pend_ts = (
            ([] if v is None else list(v) for v in state.get)
            if state.exists else ([], [], []))
        if not state.hasTimedOut:
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                # pin the unit before the integer view: Arrow->pandas has
                # shipped both datetime64[ns] and [us] across versions
                us = pdf["ts"].astype("datetime64[ns]").astype("int64") \
                    // 1000
                is_p = pdf["_side"].to_numpy() == 1
                for t in us[~is_p]:
                    views.append(int(t))
                for eid, t in zip(pdf["event_id"].to_numpy()[is_p],
                                  us[is_p]):
                    pend_ids.append(int(eid))
                    pend_ts.append(int(t))
        else:
            # timeout invocation: drain the (empty) iterator per contract
            for _ in pdf_iter:
                pass
        wm_us = state.getCurrentWatermarkMs() * 1000
        # emit pending purchases strictly behind the frontier, in
        # deterministic (purchase_ts, event_id) order
        ready = sorted(
            ((t, i) for i, t in zip(pend_ids, pend_ts) if t < wm_us))
        if ready:
            out_id, out_pts, out_vts = [], [], []
            for t, i in ready:
                lo = t - horizon_us
                best = max((v for v in views if lo < v <= t), default=None)
                out_id.append(i)
                out_pts.append(t)
                out_vts.append(best)
            keep = [(i, t) for i, t in zip(pend_ids, pend_ts)
                    if t >= wm_us]
            pend_ids = [i for i, _ in keep]
            pend_ts = [t for _, t in keep]
            # exact integer ns construction — a float64 NaN-carrying path
            # would silently round epoch-scale nanoseconds (2^53 < 1e18)
            yield pd.DataFrame({
                "event_id": out_id,
                "user_id": [int(key[0])] * len(out_id),
                "purchase_ts": pd.Series(
                    [pd.Timestamp(t * 1000) for t in out_pts],
                    dtype="datetime64[ns]"),
                "asof_view_ts": pd.Series(
                    [pd.NaT if v is None else pd.Timestamp(v * 1000)
                     for v in out_vts], dtype="datetime64[ns]")})
        # prune views that can no longer serve any pending/future
        # purchase: remaining purchases have ts >= wm, so they only need
        # views > wm - horizon
        views = [v for v in views if v > wm_us - horizon_us]
        if views or pend_ids:
            state.update((views, pend_ids, pend_ts))
            if pend_ts:
                # fire once the watermark passes the earliest pending
                # purchase (ms floor; must stay > current watermark)
                to_us = min(pend_ts)
            else:
                # view-only state: a buffered view v can only answer
                # purchases with ts in (v, v + horizon], and any purchase
                # still to come has ts >= watermark — so once the
                # watermark passes max(views) + horizon every view is
                # dead and the prune above empties the buffer. Arming
                # eviction here is what keeps state bounded by density x
                # horizon for users who view but never purchase (or go
                # silent after their last purchase emits).
                to_us = max(views) + horizon_us
            state.setTimeoutTimestamp(
                max(to_us // 1000, wm_us // 1000 + 1))
        else:
            state.remove()

    return fn


def stream_asof_join(views: DataFrame, purchases: DataFrame,
                     horizon_minutes: int = 60,
                     watermark: str = "2 hours") -> DataFrame:
    """Most-recent-prior view per purchase (same user, lookback bounded),
    as a watermarked custom stateful stream. ``views``/``purchases`` are
    streaming frames with (event_id, user_id, ts); output rows are
    (event_id, user_id, purchase_ts, asof_view_ts|NULL), emitted once the
    watermark strictly passes purchase_ts.

    The two inputs union into ONE keyed stream (side-tagged) so a single
    watermark governs both and the state function sees each user's full
    timeline — the same one-shuffle shape as the batch twin's
    union+window formulation (operators/asof.asof_join)."""
    tagged = (views.select("event_id", "user_id", "ts",
                           F.lit(0).alias("_side"))
              .unionByName(purchases.select(
                  "event_id", "user_id", "ts", F.lit(1).alias("_side"))))
    horizon_us = int(horizon_minutes) * 60_000_000
    return (tagged.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _asof_fn(horizon_us), ASOF_OUTPUT, _ASOF_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))
