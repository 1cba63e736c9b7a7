"""As-of (most-recent-prior) join — a temporal operator Spark lacks as a
built-in and the reference never needed (SURVEY §2.3: no theta/range/as-of
joins), but any event-timeline workload does: enrich each fact row with the
latest dimension/event row at-or-before its timestamp.

Implementation is the scalable UNION + WINDOW formulation, not a range
join and not a UDF:

    tag both sides, union them, then per key order by (ts, side) and carry
    the last LEFT row forward with last_value(ignorenulls) — one shuffle on
    the join key, one sort within partitions, zero row explosion.

A naive range join (`l.ts <= r.ts` + window max) explodes to O(n·m) pairs
before pruning; the union-window form is O(n+m) log-sorted, the same plan
a merge-based ASOF join executes natively (DuckDB's ASOF JOIN — which is
exactly the oracle used to verify this operator).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, *,
              on: str, ts: str = "ts",
              right_cols: list[str] | None = None,
              strict: bool = False) -> DataFrame:
    """For each ``left`` row, attach the ``right`` row with the greatest
    ``ts`` that is <= left.ts (strictly < when ``strict``), matching on the
    equality key ``on``. Left rows with no prior right row survive with
    NULLs (left-outer as-of).

    ``right_cols``: payload columns of ``right`` to carry (default: all
    except the key and timestamp). Carried columns come back prefixed
    ``asof_`` (timestamp as ``asof_ts``).
    """
    rcols = right_cols or [c for c in right.columns if c not in (on, ts)]
    l_tag = left.withColumn("_side", F.lit(1)).withColumn("_r", F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in rcols) + ">"))
    r_tag = right.select(
        F.col(on), F.col(ts), F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in rcols]).alias("_r"))
    # align schemas: left keeps its payload, right rows carry nulls for it
    for c in left.columns:
        if c not in (on, ts) and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.select(*[F.col(c) for c in l_tag.columns])

    # strict: right rows at ts T must NOT match left rows at the same T —
    # ordering (ts, _side) with right first makes ties visible unless
    # strict, in which case right sorts after left at equal ts
    side_order = F.col("_side").desc() if strict else F.col("_side").asc()
    w = (Window.partitionBy(on).orderBy(F.col(ts).asc(), side_order)
         .rowsBetween(Window.unboundedPreceding, -1 if strict else 0))
    carried = (l_tag.unionByName(r_tag)
               .withColumn("_last_r", F.last("_r", ignorenulls=True).over(w)))
    out = carried.where(F.col("_side") == 1)
    payload = [F.col(f"_last_r.{c}").alias(f"asof_{c}") for c in rcols]
    keep = [c for c in left.columns]
    return out.select(*keep, *payload)


def scd2_intervals(changes: DataFrame, key_col: str = "user_id",
                   value_col: str = "event_type", ts_col: str = "ts",
                   tie_col: str = "event_id") -> DataFrame:
    """Build a slowly-changing-dimension (SCD type 2) history from a
    change stream: one validity interval per (key, value) run —
    (key, value, eff_from, eff_to, is_current), eff_to = next change's
    instant (NULL while current).

    The lakehouse pattern for dimension history: the reference's
    publishers replace state wholesale (MERGE everything, then
    staleness-sweep); interval-building keeps every historical value
    queryable with an as-of predicate (``eff_from <= t < eff_to`` —
    composing with operators/asof.asof_join for point-in-time joins).

    Consecutive duplicate values collapse into one interval (a change
    record that does not change the value is not a new version). All
    windows partition by the dimension key, so the build spreads across
    the key space with no global sort; ties at the same timestamp order
    by ``tie_col`` for determinism.

    Reference: the Neo4j publisher's publish-tag generations
    (publisher/neo4j_csv_publisher.py:120-150) are the degenerate
    current-state-only form of this."""
    from pyspark.sql import Window
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    runs = (changes.select(key_col, value_col, ts_col, tie_col)
            .withColumn("_new_run",
                        F.when(F.lag(value_col).over(w).isNull()
                               | (F.col(value_col)
                                  != F.lag(value_col).over(w)),
                               F.lit(1)).otherwise(F.lit(0)))
            .where(F.col("_new_run") == 1))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    return (runs.select(
        key_col, value_col,
        F.col(ts_col).alias("eff_from"),
        F.lead(ts_col).over(w2).alias("eff_to"))
        .withColumn("is_current", F.col("eff_to").isNull()))


def densify_daily(events: DataFrame, user_col: str = "user_id",
                  ts_col: str = "ts",
                  value_col: str = "value") -> DataFrame:
    """Per-user daily time series with gaps zero-filled: one row per
    (user, day) from each user's first to last active day — the
    densification step every per-entity trend/forecast feature pipeline
    needs (a groupBy alone silently drops quiet days, skewing any
    moving average computed downstream).

    Value sums are exact integer micro-units. Scale shape: the day
    calendar explodes from each user's OWN [min, max] span (bounded by
    user lifetime, not the global calendar), and the fill join is a
    per-user equi-join — co-located end-to-end when bucketed by user."""
    day = F.date_trunc("day", F.col(ts_col))
    vm = F.round(F.col(value_col) * 1_000_000, 0).cast("long")
    daily = (events.groupBy(F.col(user_col), day.alias("day"))
             .agg(F.count(F.lit(1)).alias("n_events"),
                  F.sum(vm).alias("value_micros")))
    span = (events.groupBy(user_col)
            .agg(F.date_trunc("day", F.min(ts_col)).alias("d0"),
                 F.date_trunc("day", F.max(ts_col)).alias("d1")))
    cal = span.select(
        user_col,
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"))
    return (cal.join(daily, [user_col, "day"], "left")
            .select(user_col, "day",
                    F.coalesce("n_events", F.lit(0)).cast("long")
                    .alias("n_events"),
                    F.coalesce("value_micros", F.lit(0)).cast("long")
                    .alias("value_micros")))


def rolling_trailing_sum(events: DataFrame, hours: int = 24,
                         user_col: str = "user_id", ts_col: str = "ts",
                         value_col: str = "value",
                         id_col: str = "event_id") -> DataFrame:
    """Per-event trailing-window aggregate: for every event, the count
    and exact micro-unit value sum of the same user's events in the
    preceding ``hours`` (inclusive) — the feature-engineering primitive
    behind velocity/fraud features ("spend in the last 24h").

    RANGE frame over integer epoch micros, so frame membership is exact
    and tie rows (same timestamp) are peers on both engines; sums are
    BIGINT (order-free). Windows partition by user — no global sort."""
    from pyspark.sql import Window
    span_us = hours * 3600 * 1_000_000
    vm = F.round(F.col(value_col) * 1_000_000, 0).cast("long")
    base = events.select(F.col(id_col), F.col(user_col),
                         F.unix_micros(F.col(ts_col)).alias("eus"),
                         vm.alias("vm"))
    w = (Window.partitionBy(user_col).orderBy("eus")
         .rangeBetween(-span_us, 0))
    return base.select(
        id_col, user_col, "eus",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("vm").over(w).alias("trailing_micros"))


def burst_windows(events: DataFrame, trailing: int = 6, factor: int = 3,
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """Burst detection over hourly event-type series: flag windows whose
    count exceeds ``factor``x the mean of the previous ``trailing``
    fully-observed windows — the monitoring primitive behind "error
    spike" / trending detection on an event stream.

    The comparison is the integer cross-multiplication
    n * trailing > factor * sum(previous), so no float mean ever
    enters; windows with fewer than ``trailing`` predecessors are never
    flagged (a series' first hours are not comparable). Returns
    (event_type, window_start, n_events, prev_sum, is_burst).
    Scale shape: one hourly pre-aggregation (map-side combinable), then
    a per-type ROWS window over the already-tiny hourly series."""
    from pyspark.sql import Window
    hourly = (events.groupBy(F.col(type_col),
                             F.date_trunc("hour", F.col(ts_col))
                             .alias("window_start"))
              .agg(F.count(F.lit(1)).alias("n_events")))
    w = (Window.partitionBy(type_col).orderBy("window_start")
         .rowsBetween(-trailing, -1))
    return (hourly
            .withColumn("prev_sum", F.coalesce(F.sum("n_events").over(w),
                                               F.lit(0)).cast("long"))
            .withColumn("prev_n", F.count("n_events").over(w))
            .withColumn("is_burst",
                        (F.col("prev_n") == trailing)
                        & (F.col("n_events") * trailing
                           > factor * F.col("prev_sum")))
            .drop("prev_n"))


def interval_overlap_join(left: DataFrame, right: DataFrame,
                          bin_us: int = 3_600_000_000,
                          l_id: str = "l_id", l_start: str = "l_start",
                          l_end: str = "l_end",
                          r_id: str = "r_id", r_start: str = "r_start",
                          r_end: str = "r_end") -> DataFrame:
    """Interval-overlap join ([l_start,l_end] x [r_start,r_end] in epoch
    micros) via time-bin bucketing — the range-join strategy Spark has
    no native operator for (a raw overlap predicate plans as a nested-
    loop cross product).

    Each interval explodes to the coarse bins it covers; candidates are
    the id pairs sharing a bin (an overlap ALWAYS shares at least one
    bin, so bucketing is lossless); the exact predicate then prunes
    same-bin non-overlaps and a distinct collapses multi-bin double
    hits. Returns (l_id, r_id, overlap_us).

    Scale shape: the bin join shuffles (bin, id, bounds) rows — interval
    count x mean bins covered — instead of |L| x |R|; pick ``bin_us``
    near the typical interval length so most intervals cover 1-2 bins.
    A pathological bin hosting everything is ordinary join skew (AQE
    splits it), not a cross product."""
    lb = left.select(
        l_id, l_start, l_end,
        F.explode(F.sequence(F.expr(f"{l_start} DIV {bin_us}"),
                             F.expr(f"{l_end} DIV {bin_us}")))
        .alias("bin"))
    rb = right.select(
        r_id, r_start, r_end,
        F.explode(F.sequence(F.expr(f"{r_start} DIV {bin_us}"),
                             F.expr(f"{r_end} DIV {bin_us}")))
        .alias("bin"))
    cand = (lb.join(rb, "bin")
            .where((F.col(l_start) <= F.col(r_end))
                   & (F.col(r_start) <= F.col(l_end)))
            .select(l_id, r_id,
                    (F.least(F.col(l_end), F.col(r_end))
                     - F.greatest(F.col(l_start), F.col(r_start)))
                    .alias("overlap_us"))
            .distinct())
    return cand


def cdc_apply(snapshot: DataFrame, changelog: DataFrame, *,
              key_col: str, seq_col: str = "seq", op_col: str = "op",
              payload_cols: "list[str]") -> DataFrame:
    """Apply a change-data-capture log to a base snapshot — the MERGE /
    upsert compaction every incremental ingestion pipeline runs before a
    table is queryable. ``changelog`` rows are (key, seq, op, payload...)
    with op 'U' (upsert) or 'D' (delete); higher ``seq`` wins per key,
    ties broken toward the changelog over the base and then by op 'U' <
    'D' (a same-seq delete beats the upsert, the usual debezium-compaction
    contract). The snapshot participates as seq = −1 upserts, so one
    (key)-partitioned rank window resolves everything: keep rn = 1, drop
    rows whose winner is a delete.

    Determinism: a well-formed changelog has at most one payload per
    (key, seq, op) — that is the CDC producer's contract. This operator
    does NOT rely on it: a final tiebreak on the JSON-rendered payload
    makes the winner shuffle-order-independent even when a malformed log
    carries two different payloads at the same (key, seq, op), so the
    repo's hash-reproducibility contract holds on any input.

    Scale shape: ONE shuffle on the key for union+window — no join, no
    per-key iteration; the payload rides the shuffle once. Skewed hot
    keys (one key updated millions of times) are bounded by AQE skew
    split; state never accumulates because rn = 1 prunes per partition.
    """
    base = snapshot.select(
        F.col(key_col).alias("k"), F.lit(-1).cast("long").alias("s"),
        F.lit("U").alias("o"), *[F.col(c) for c in payload_cols])
    log = changelog.select(
        F.col(key_col).alias("k"), F.col(seq_col).cast("long").alias("s"),
        F.col(op_col).alias("o"), *[F.col(c) for c in payload_cols])
    unioned = base.unionByName(log)
    # o ASC puts 'D' before 'U', so a same-seq delete wins the tie; the
    # JSON-payload tiebreak makes same-(key,seq,op) duplicates resolve
    # deterministically (smallest rendering wins) instead of by shuffle
    # order
    w = Window.partitionBy("k").orderBy(
        F.col("s").desc(), F.col("o").asc(),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).asc())
    resolved = (unioned.withColumn("rn", F.row_number().over(w))
                .where((F.col("rn") == 1) & (F.col("o") == "U")))
    return resolved.select(F.col("k").alias(key_col),
                           *[F.col(c) for c in payload_cols])


def interval_union(intervals: DataFrame, key_col: str = "user_id",
                   start_col: str = "start_us",
                   end_col: str = "end_us") -> DataFrame:
    """Per-key union length of (possibly overlapping) intervals — total
    covered time with double-counting removed: the session-coverage /
    SLA-uptime / sensor-active-time statistic. Classic sweep as
    gaps-and-islands: an interval starts a new island when its start
    exceeds the running max end of everything before it; island bounds
    then aggregate exactly (integer microseconds).

    Output: (key, n_intervals, n_islands, covered_us). One shuffle on
    the key + two key-partitioned windows; rows carry three longs. Same
    scale shape as sessionize_batch — AQE splits skewed keys."""
    w_order = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max = F.max(F.col(end_col)).over(
        w_order.rowsBetween(Window.unboundedPreceding, -1))
    marked = intervals.withColumn(
        "_new", F.when(prev_max.isNull()
                       | (F.col(start_col) > prev_max), 1).otherwise(0))
    isl = marked.withColumn(
        "_isl", F.sum("_new").over(
            w_order.rowsBetween(Window.unboundedPreceding, 0)))
    per_island = (isl.groupBy(key_col, "_isl")
                  .agg(F.min(start_col).alias("_s"),
                       F.max(end_col).alias("_e"),
                       F.count(F.lit(1)).alias("_n")))
    return (per_island.groupBy(key_col)
            .agg(F.sum("_n").alias("n_intervals"),
                 F.count(F.lit(1)).alias("n_islands"),
                 F.sum(F.col("_e") - F.col("_s")).cast("long")
                 .alias("covered_us")))


def autocorrelation_report(events: DataFrame, ts_col: str = "ts",
                           max_lag: int = 7) -> DataFrame:
    """Sample autocorrelation of the DAILY event volume at lags
    1..``max_lag`` — the seasonality detector behind capacity planning
    and anomaly baselines (a strong lag-7 peak means weekly rhythm; a
    flat ACF means Poisson-ish noise and rate alerts can use plain
    thresholds). Complements ``event_seasonality_heatmap`` (which
    shows the pattern) with the statistic that TESTS for it.

    Returns (lag, n_days, acf) for each lag, acf 6dp — the standard
    biased sample ACF (denominator over the full series), computed on
    the gap-densified daily grid (missing days count 0, exactly like a
    volume chart).

    Determinism/scale shape: one map-side date-bucket count collapses
    events to a <= n_days REGISTER; the day grid densifies via an
    integer sequence (no corpus window); each lag's moments come from
    one register self-join on day_index + lag. The ACF is EXACT
    integer arithmetic end-to-end — r_k = (n^2 S_xy - n S (H+T) +
    (n-k) S^2) / (n (n S_xx - S^2)) — with the single closing
    division. Domain: n_days * (daily_max * n_days)^2 inside int64 —
    widen to DECIMAL if days x volumes grow past ~3e9-scale products.
    """
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    day = F.to_date(F.col(ts_col))
    counts = (events.where(F.col(ts_col).isNotNull())
              .select(F.datediff(day, F.lit("1970-01-01"))
                      .cast("long").alias("d"))
              .groupBy("d").agg(F.count(F.lit(1)).cast("long")
                                .alias("x")))
    bounds = counts.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    grid = (bounds.select(F.explode(F.sequence(F.col("lo"),
                                               F.col("hi"))).alias("d"))
            .join(counts, "d", "left")
            .select("d", F.coalesce("x", F.lit(0)).cast("long")
                    .alias("x")))
    tot = grid.agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.sum("x").cast("long").alias("s"),
                   F.sum(F.col("x") * F.col("x")).cast("long")
                   .alias("sxx"))
    spark = events.sparkSession
    lags = spark.createDataFrame([(int(k),) for k in
                                  range(1, max_lag + 1)], "lag long")
    a = grid.select(F.col("d").alias("da"), F.col("x").alias("xa"))
    b = grid.select(F.col("d").alias("db"), F.col("x").alias("xb"))
    pairs = (a.crossJoin(F.broadcast(lags))
             .join(b, F.col("db") == F.col("da") + F.col("lag")))
    mom = (pairs.groupBy("lag")
           .agg(F.sum(F.col("xa") * F.col("xb")).cast("long")
                .alias("sxy"),
                F.sum("xa").cast("long").alias("h"),
                F.sum("xb").cast("long").alias("t")))
    j = mom.crossJoin(F.broadcast(tot))
    num = (F.col("n") * F.col("n") * F.col("sxy")
           - F.col("n") * F.col("s") * (F.col("h") + F.col("t"))
           + (F.col("n") - F.col("lag")) * F.col("s") * F.col("s"))
    den = F.col("n") * (F.col("n") * F.col("sxx")
                        - F.col("s") * F.col("s"))
    return (j.select(F.col("lag").cast("int").alias("lag"),
                     F.col("n").alias("n_days"),
                     F.when(den > 0, round_half_away(
                         num.cast("double") / den.cast("double"), 6))
                     .alias("acf")))
