"""Column profiling — the stats-ingestion job that populates the catalog's
per-column statistics (reference model: databuilder/models/table_stats.py
TableColumnStats with its {stat_type} key scheme; the reference ships the
model but no profiler — stats arrive from external jobs. Here the profiler
IS an engine operator).

One pass over the table computes every column's stats as a wide aggregate
(all map-side combinable), then `stack` unpivots to one row per
(column, stat) — the exact shape `expand_column_stats` ingests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import round_half_away

# the register-width contract, enforced: operators whose cumulative
# windows run over a per-value REGISTER table document "width/scale must
# bound the register domain" (a high-cardinality column at width=1
# degenerates the bounded-register design into a corpus-sized
# single-partition sort); past this many register rows the plan raises
# instead of silently degrading (r9 verdict item #7)
REGISTER_DOMAIN_LIMIT = 1_000_000


def guard_register_domain(value, rank, what: str,
                          limit: "int | None" = None):
    """Runtime form of the register-domain contract: ``rank`` is a
    running register-row count inside a cumulative window the operator
    already pays for, so the check adds NO extra pass and no driver
    count; the assertion is folded INTO the consumed ``value`` (+0 when
    healthy) so column pruning cannot elide it. Raises mid-job the
    moment any window partition's register count passes ``limit``
    (default: module-level REGISTER_DOMAIN_LIMIT, read at call time so
    tests can pin a tiny limit)."""
    limit = REGISTER_DOMAIN_LIMIT if limit is None else limit
    ok = F.assert_true(
        rank <= F.lit(limit),
        F.lit(f"register domain for {what} exceeded {limit} rows — "
              "widen the quantization (width/scale) so the register "
              "table stays bounded"))
    return value + F.coalesce(ok.cast("long"), F.lit(0))


def require_register_width(n_rows: int, what: str,
                           limit: "int | None" = None) -> None:
    """Plan-time form of the register-domain contract for PARAMETRIC
    widths (2^p HLL buckets, CMS depth x width, Bloom words, histogram
    n_buckets; r10 verdict item #4): the register row count is known
    from the call parameters before any job runs, so an over-wide
    sketch raises HERE — same raise-not-degrade behavior as
    ``guard_register_domain``, one job earlier. Reads the module-level
    limit at call time so tests can pin a tiny one."""
    limit = REGISTER_DOMAIN_LIMIT if limit is None else limit
    if n_rows > limit:
        raise ValueError(
            f"register domain for {what} is {n_rows} rows, over the "
            f"{limit}-row register contract — narrow the sketch "
            "parameters (p / depth x width / bits / buckets)")


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    stddev) for each numeric/orderable column, computed in ONE pass.

    n_distinct is exact (for oracle parity); at 100 TB substitute
    approx_count_distinct with a bounded relative error. min/max emit as
    strings so heterogeneous column types share one schema — matching the
    reference's stringly-typed stat values (models/table_stats.py:17-20).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            round_half_away(F.stddev(c), 4).alias(f"{c}__stddev"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, "
        f"`{c}__min`, `{c}__max`, `{c}__stddev`" for c in cols)
    return wide.select(F.expr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value, stddev)"))


def fd_violations(df: DataFrame,
                  pairs: "list[tuple[str, str]]") -> DataFrame:
    """Approximate-functional-dependency discovery: for each candidate
    (lhs -> rhs) column pair, how many lhs values map to MORE than one
    distinct rhs value — the per-pair violation count and ppm that tell
    a catalog which dependencies actually hold in the data (the g3-style
    error of FD-mining literature, as exact counts).

    ONE shuffle for every pair: each row explodes into |pairs| tagged
    (pair, lhs_val, rhs_val) rows and a single two-level aggregation
    (pair+lhs -> distinct rhs, then pair) scores all candidates
    simultaneously — no per-pair job, so profiling 50 candidate FDs
    costs the same passes as profiling one. Returns
    (lhs, rhs, n_lhs_values, n_violating, violation_ppm)."""
    tagged = F.explode(F.array(*[
        F.struct(F.lit(l).alias("lhs"), F.lit(r).alias("rhs"),
                 F.col(l).cast("string").alias("lv"),
                 F.col(r).cast("string").alias("rv"))
        for l, r in pairs])).alias("t")
    rows = df.select(tagged).select("t.lhs", "t.rhs", "t.lv", "t.rv")
    per_lhs = (rows.groupBy("lhs", "rhs", "lv")
               .agg(F.countDistinct("rv").alias("n_rhs")))
    return (per_lhs.groupBy("lhs", "rhs")
            .agg(F.count(F.lit(1)).alias("n_lhs_values"),
                 F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
                 .alias("n_violating"),
                 F.expr("sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) "
                        "* 1000000 DIV count(*)").alias("violation_ppm")))


def distribution_drift(df: DataFrame, category_col: str,
                       ts_col: str = "ts") -> DataFrame:
    """Category-distribution drift between the first and second half of
    a table's time range — per-category shares in exact ppm and their
    absolute delta (summing delta_ppm and halving gives total-variation
    distance ×1e6), the drift monitor a data pipeline runs between
    corpus versions or event windows. All integer arithmetic (counts,
    DIV-ppm), so the result is order-free and hash-verifiable — the
    classic PSI needs ln() and can never be.

    Plan: one 1-row min/max anchor (broadcast), one (category, half)
    count aggregation, a pivot-style conditional sum — two shuffles
    total, counts only on the wire. Returns (category, ppm_first,
    ppm_second, abs_delta_ppm)."""
    ep = F.unix_micros(F.col(ts_col))
    anchor = df.agg(F.min(ep).alias("_mn"), F.max(ep).alias("_mx"))
    halved = (df.crossJoin(F.broadcast(anchor))
              .select(F.col(category_col).alias("category"),
                      (ep >= F.expr("(_mn + _mx) DIV 2"))
                      .cast("int").alias("_second")))
    counts = (halved.groupBy("category")
              .agg(F.sum(F.lit(1) - F.col("_second")).alias("n_first"),
                   F.sum("_second").alias("n_second")))
    tot = counts.agg(F.sum("n_first").alias("_tf"),
                     F.sum("n_second").alias("_ts"))
    # degenerate-range hardening (ANSI aborts on DIV 0): when every
    # event carries ONE timestamp, min==max puts all rows in the second
    # half and _tf = 0 (symmetrically _ts for an empty second half can't
    # happen — the max row always lands there — but guard both: the
    # monitor must report 0-vs-all drift, not kill the pipeline)
    out = (counts.crossJoin(F.broadcast(tot))
           .select("category",
                   F.when(F.col("_tf") > 0,
                          F.expr("n_first * 1000000 DIV _tf"))
                   .otherwise(F.lit(0).cast("long")).alias("ppm_first"),
                   F.when(F.col("_ts") > 0,
                          F.expr("n_second * 1000000 DIV _ts"))
                   .otherwise(F.lit(0).cast("long")).alias("ppm_second")))
    return out.withColumn(
        "abs_delta_ppm",
        F.abs(F.col("ppm_first") - F.col("ppm_second")).cast("long"))


def joinability_discovery(columns: "dict[str, DataFrame]",
                          threshold_num: int = 95,
                          threshold_den: int = 100) -> DataFrame:
    """Joinable-column discovery over a catalog: for every ordered pair
    of profiled columns, the value-set containment |A∩B|/|A| — pairs
    above ``threshold`` are join/FK candidates (A's values nearly all
    appear in B ⇒ A plausibly references B). The data-discovery feature
    a metadata catalog builds ON TOP of the metadata the reference only
    stores (column names/types — amundsen's frontend suggests joins from
    exactly this signal when available).

    ``columns`` maps "table.column" ids to single-column DataFrames.
    Distinct value sets are stacked into one (col_id, v) table; one
    self-join on value + integer cross-multiplied threshold. At catalog
    scale the stack is |columns| x distinct-values and the same
    pigeonhole prefix filter as dedup.containment_join applies; the
    exact form here IS the verification path. Returns
    (col_a, col_b, n_a, n_b, containment)."""
    from pyspark.sql import functions as F

    from amundsendatabuilder_spark.functions.scalars import round_half_away
    stacked = None
    for cid, df in sorted(columns.items()):
        c = df.columns[0]
        part = (df.select(F.col(c).cast("string").alias("v")).distinct()
                .select(F.lit(cid).alias("col_id"), "v"))
        stacked = part if stacked is None else stacked.unionByName(part)
    stacked = stacked.localCheckpoint()
    sizes = stacked.groupBy("col_id").agg(F.count(F.lit(1)).alias("n"))
    a = stacked.select(F.col("col_id").alias("col_a"), "v")
    b = stacked.select(F.col("col_id").alias("col_b"), "v")
    inter = (a.join(b, "v")
             .where(F.col("col_a") != F.col("col_b"))
             .groupBy("col_a", "col_b")
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col("col_id").alias("col_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("col_id").alias("col_b"), F.col("n").alias("n_b"))
    tn, td = threshold_num, threshold_den
    return (inter.join(F.broadcast(sa), "col_a")
            .join(F.broadcast(sb), "col_b")
            .where(F.col("inter") * td >= F.col("n_a") * tn)
            .select("col_a", "col_b", "n_a", "n_b",
                    round_half_away(F.col("inter").cast("double")
                                    / F.col("n_a"), 6).alias("containment")))


def k_anonymity_audit(df: DataFrame, quasi_cols: "list[str]",
                      k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: every
    equivalence class with fewer than ``k`` rows, i.e. the attribute
    combinations that could single out individuals — the privacy screen
    a training-data release runs before shipping tabular or
    user-derived data.

    One map-side-combinable groupBy; the report is only the failing
    classes (the k-anonymous bulk never leaves the executors). Returns
    (quasi..., class_size)."""
    from pyspark.sql import functions as F
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"))
            .where(F.col("class_size") < k))


def referential_integrity_audit(fact: DataFrame, fk_col: str,
                                dim: DataFrame,
                                pk_col: str) -> DataFrame:
    """Referential-integrity audit: fact rows whose foreign key has no
    match in the dimension, aggregated per orphan key — the
    data-quality check behind every FK edge joinability_discovery
    suggests (discovery proposes the edge; this verifies it holds).

    left_anti against the dimension key set (broadcast when small), so
    the clean bulk never shuffles; returns (fk, n_orphans)."""
    from pyspark.sql import functions as F
    keys = dim.select(F.col(pk_col).alias(fk_col)).distinct()
    return (fact.join(keys, fk_col, "left_anti")
            .groupBy(fk_col)
            .agg(F.count(F.lit(1)).alias("n_orphans")))


def numeric_corr_matrix(df: DataFrame, cols: "list[str]",
                        scale: int = 100) -> DataFrame:
    """Pairwise Pearson correlations from EXACT sufficient statistics:
    values are integer-scaled (``scale``), the five sums (n, Sx, Sy,
    Sxy, Sxx, Syy) accumulate as DECIMAL(38,0) — exact and
    order-independent where a float corr() depends on shuffle order and
    can never be value-hash verified — and only the final
    (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) evaluates in
    doubles, in one fixed expression tree. One wide map-side-combinable
    aggregation for the whole matrix; rows are the (x < y) pairs."""
    from pyspark.sql import functions as F

    from amundsendatabuilder_spark.functions.scalars import round_half_away
    ints = {c: F.round(F.col(c) * scale, 0).cast("long") for c in cols}
    # Products multiply DECIMAL(19,0) factors, not LONGs: a long*long
    # product overflows (and wraps silently in non-ANSI mode) once
    # |value*scale| exceeds ~3.03e9; decimal factors keep each PRODUCT
    # exact for any long input. Domain bound on the SUMS: DECIMAL(38,0)
    # holds < 10^38, so the accumulated Σx·y stays exact while
    # n · max|x·scale|² < 10^38 — e.g. 10^12 rows of values up to ~10^13
    # after scaling. Past that, non-ANSI Spark returns NULL for the sum
    # (not a wrong number) and the correlation degrades visibly, not
    # silently wrong.
    decs = {c: ints[c].cast("decimal(19,0)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("n")]
    for c in cols:
        aggs.append(F.sum(ints[c].cast("decimal(38,0)")).alias(f"s_{c}"))
        aggs.append(F.sum((decs[c] * decs[c]).cast("decimal(38,0)"))
                    .alias(f"ss_{c}"))
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            aggs.append(F.sum((decs[cx] * decs[cy]).cast("decimal(38,0)"))
                        .alias(f"sp_{cx}_{cy}"))
    wide = df.agg(*aggs)
    out = None
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            # The three moment differences cancel catastrophically in
            # double once the raw sums dwarf the centered variance
            # (n*Sxx ~ 1e24 vs n*Sxx - Sx^2 ~ 1e8 wipes out every
            # significant bit), so subtract in DECIMAL(38,0) exactly and
            # only cast the already-centered differences to double.
            cov = (F.col("n") * F.col(f"sp_{cx}_{cy}")
                   - F.col(f"s_{cx}") * F.col(f"s_{cy}")).cast("double")
            vx = (F.col("n") * F.col(f"ss_{cx}")
                  - F.col(f"s_{cx}") * F.col(f"s_{cx}")).cast("double")
            vy = (F.col("n") * F.col(f"ss_{cy}")
                  - F.col(f"s_{cy}") * F.col(f"s_{cy}")).cast("double")
            corr = cov / F.sqrt(vx * vy)
            row = wide.select(F.lit(cx).alias("col_x"),
                              F.lit(cy).alias("col_y"),
                              round_half_away(corr, 6).alias("corr"))
            out = row if out is None else out.unionByName(row)
    return out


def equi_depth_histogram(df: DataFrame, value_col: str,
                         group_cols: "tuple[str, ...]" = (),
                         n_buckets: int = 10,
                         order_cols: "tuple[str, ...]" = ()) -> DataFrame:
    """Equi-depth (quantile) histogram per group — the column statistic
    query optimizers and data-profiling UIs actually want (equal ROW
    counts per bucket, so dense regions get resolution), as opposed to
    the equi-width token_count_histogram. Exact, not sampled: ntile
    over a TOTAL order (``order_cols`` break value ties — required for
    cross-engine determinism; pass the table's key columns). Returns
    (group..., bucket, n_rows, low, high). One window + one aggregation;
    the window partitions by group, so strata compute in parallel — the
    cost is one sort per group partition. At extreme per-group
    cardinality swap ntile for two-pass sampled boundaries
    (approx_percentile then a bucket-assign scan); the exact form here
    is the verification path the sampled variant is checked against."""
    from pyspark.sql import Window
    order = [F.col(value_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (df
            .withColumn("_b", F.ntile(n_buckets).over(w))
            .groupBy(*group_cols, F.col("_b").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min(value_col).alias("low"),
                 F.max(value_col).alias("high")))


def equi_depth_boundaries(df: DataFrame, value_col: str,
                          n_buckets: int = 10,
                          width: int = 1) -> DataFrame:
    """Ungrouped equi-depth boundary table with NO global sort — the
    two-pass register form the ``equi_depth_histogram`` docstring
    promises for the ungrouped path (that exact-ntile form degenerates
    to a single-partition corpus window when ``group_cols`` is empty;
    this one never does).

    Pass 1 aggregates per-value registers (``width`` > 1 quantizes the
    domain first, bounding the register table for continuous/unbounded
    columns — the histogram_registers family, sketches.py:327). Pass 2
    takes cumulative counts over the REGISTER table (bounded rows, not
    corpus rows) and returns, per bucket k, the smallest value whose
    cumulative count reaches ⌈k·N/n_buckets⌉ — identical to the value
    at that row of the exact total order when width=1 on an integer
    column, conservative to one quantum otherwise.

    Output: (bucket, cut_value, n_rows_le, pct_rows_ppm). With
    ``width`` > 1, values must be non-negative (integer DIV truncates
    toward zero while SQL ``//`` floors, so negative quanta diverge
    across engines — the trend_slopes lesson).

    Scale contract (ENFORCED at runtime by ``guard_register_domain``):
    ``width`` must bound the REGISTER domain (distinct-quantum count
    ≲ 10^6), because the cumulative window and the final probe both run
    over the register table — on a high-cardinality column at width=1
    that table approaches corpus cardinality and the design degenerates;
    pick width so (max−min)/width stays register-sized — the plan raises
    past REGISTER_DOMAIN_LIMIT rather than silently degrading. Only the
    ≤n_buckets-row ``bounds`` side is ever broadcast.
    """
    # integer DIV, not float '/': exact at any magnitude (corr-matrix
    # lesson — doubles lose integer precision past 2^53)
    base = df.select(F.expr(
        f"(CAST({value_col} AS BIGINT) DIV {width}) * {width}").alias("qv"))
    regs = base.groupBy("qv").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window
    wq = Window.orderBy("qv").rowsBetween(Window.unboundedPreceding, 0)
    cum = regs.select("qv", guard_register_domain(
        F.sum("c").over(wq), F.count(F.lit(1)).over(wq),
        "equi_depth_boundaries").alias("cc"))
    ks = (base.agg(F.count(F.lit(1)).alias("n"))
          .select(F.explode(F.sequence(F.lit(1), F.lit(n_buckets)))
                  .alias("bucket"), "n")
          .withColumn("need", F.expr(
              f"CAST(-((-bucket * n) DIV {n_buckets}) AS BIGINT)")))
    bounds = (cum.join(F.broadcast(ks), F.col("cc") >= F.col("need"))
              .groupBy("bucket", "n").agg(F.min("qv").alias("cut_value")))
    # broadcast the ≤n_buckets-row bounds side, never the register table
    # (whose cardinality is the distinct-quantum count — unbounded at
    # width=1 on a high-cardinality column)
    return (F.broadcast(bounds).join(cum,
                                     bounds.cut_value == cum.qv)
            .select(F.col("bucket").cast("int").alias("bucket"),
                    F.col("cut_value").cast("long").alias("cut_value"),
                    F.col("cc").cast("long").alias("n_rows_le"),
                    F.expr("cc * 1000000 DIV n").cast("long")
                    .alias("pct_rows_ppm")))


def equi_depth_boundaries_grouped(df: DataFrame, value_col: str,
                                  group_cols: "tuple[str, ...]",
                                  n_buckets: int = 10,
                                  width: int = 1) -> DataFrame:
    """Per-group equi-depth boundary table from registers — the grouped
    twin of ``equi_depth_boundaries`` and the scale path the
    ``equi_depth_histogram`` docstring promises for extreme per-group
    cardinality: where the exact-ntile form sorts every group's rows
    inside one window partition, this derives each group's boundaries
    from its bounded per-quantum register table, so a single giant group
    (the skew case) costs a register aggregation instead of a
    full-partition sort.

    Same contract as the ungrouped form: boundary k = smallest quantum
    whose cumulative register count reaches ⌈k·N_g/n_buckets⌉ —
    identical to the value at that rank of the group's exact sorted
    order at width=1, conservative to one quantum otherwise; values
    must be non-negative when ``width`` > 1 (DIV truncation vs ``//``
    floor); ``width`` must bound each group's register domain (ENFORCED
    per group at runtime by ``guard_register_domain``).

    Output: (group..., bucket, cut_value, n_rows_le, pct_rows_ppm).
    Every shuffle keys on the group columns (register agg, cumulative
    window over registers, probe join), so groups compute in parallel
    and AQE can split a skewed group's register aggregation.
    """
    from pyspark.sql import Window
    gcols = [F.col(c) for c in group_cols]
    base = df.select(*gcols, F.expr(
        f"(CAST({value_col} AS BIGINT) DIV {width}) * {width}").alias("qv"))
    regs = base.groupBy(*group_cols, "qv").agg(
        F.count(F.lit(1)).alias("c"))
    wq = (Window.partitionBy(*group_cols).orderBy("qv")
          .rowsBetween(Window.unboundedPreceding, 0))
    cum = regs.select(*group_cols, "qv", guard_register_domain(
        F.sum("c").over(wq), F.count(F.lit(1)).over(wq),
        "equi_depth_boundaries_grouped (per group)").alias("cc"))
    totals = regs.groupBy(*group_cols).agg(F.sum("c").alias("n"))
    ks = (totals.select(
        *group_cols, "n",
        F.explode(F.sequence(F.lit(1), F.lit(n_buckets))).alias("bucket"))
        .withColumn("need", F.expr(
            f"CAST(-((-bucket * n) DIV {n_buckets}) AS BIGINT)")))
    probe = (cum.join(ks, list(group_cols))
             .where(F.col("cc") >= F.col("need"))
             .groupBy(*group_cols, "bucket", "n")
             .agg(F.min("qv").alias("cut_value")))
    return (probe.join(cum.withColumnRenamed("qv", "cut_value"),
                       [*group_cols, "cut_value"])
            .select(*group_cols,
                    F.col("bucket").cast("int").alias("bucket"),
                    F.col("cut_value").cast("long").alias("cut_value"),
                    F.col("cc").cast("long").alias("n_rows_le"),
                    F.expr("cc * 1000000 DIV n").cast("long")
                    .alias("pct_rows_ppm")))


def mad_outliers(df: DataFrame, value_col: str, group_col: str,
                 order_col: str, k_times_10: int = 30) -> DataFrame:
    """Robust per-group outlier profile via median / MAD (median absolute
    deviation) — the outlier statistic that, unlike mean/stddev z-scores,
    a single corrupt row cannot drag (50% breakdown point). Flags values
    with |x − median| · 10 > k_times_10 · MAD, i.e. the classic
    |z_robust| > k rule with k in tenths so the comparison stays in exact
    integer cross-multiplication (no float division to disagree across
    engines).

    Medians are DISCRETE — the value at row ⌈n/2⌉ of the total order
    (value_col, order_col) — not interpolated, so they exist in the data
    and stay integers. Output: (group, n_rows, med, mad, n_outliers).

    Scale shape: two rank windows partitioned by group (value rank, then
    deviation rank) + one final group-by — all shuffles are on group_col,
    and each window carries only (group, long, long) rows. Skewed group
    sizes are AQE-splittable; there is no global sort.
    """
    from pyspark.sql import Window
    g, v = F.col(group_col), F.col(value_col).cast("long")
    ranked = df.select(g.alias("grp"), v.alias("v"),
                       F.col(order_col).alias("o")) \
        .withColumn("rn", F.row_number().over(
            Window.partitionBy("grp").orderBy("v", "o"))) \
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    med = (ranked.where(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .groupBy("grp").agg(F.min("v").alias("med")))
    dev = (ranked.join(med, "grp")
           .select("grp", "v", "o", "med",
                   F.abs(F.col("v") - F.col("med")).alias("dev")))
    dev_ranked = dev.withColumn("rn", F.row_number().over(
        Window.partitionBy("grp").orderBy("dev", "o"))) \
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("grp")))
    mad = (dev_ranked.where(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .groupBy("grp").agg(F.min("dev").alias("mad")))
    return (dev.join(mad, "grp")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("med").alias("med"), F.min("mad").alias("mad"),
                 F.sum(F.when(F.col("dev") * 10 > k_times_10 * F.col("mad"),
                              1).otherwise(0)).cast("long")
                 .alias("n_outliers"))
            .withColumnRenamed("grp", group_col))


def expectation_audit(df: DataFrame,
                      checks: "list[tuple[str, str]]") -> DataFrame:
    """Declarative data-contract audit — run a list of named boolean
    expectations (SQL expression strings) over a table in ONE pass and
    report per-check failure counts: (check_name, n_rows, n_failed,
    fail_ppm). A row fails a check when the expression is false OR null
    (an expectation that cannot be evaluated is not met) — the
    great-expectations-style validation gate a pipeline runs before
    publishing a table version.

    All checks compile into a single wide aggregate (every counter is
    map-side combinable) and `stack` unpivots to one row per check, so
    auditing 50 expectations over 100 TB costs one scan — the same
    one-pass shape as profile_columns. fail_ppm is exact integer DIV —
    order-free, hash-verifiable.
    """
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for name, expr in checks:
        ok = F.expr(expr)
        aggs.append(F.sum(F.when(ok.isNull() | ~ok, 1).otherwise(0))
                    .alias(f"{name}__failed"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `{name}__failed`"
                           for name, _ in checks)
    return (wide.select(
        F.col("__rows").alias("n_rows"),
        F.expr(f"stack({len(checks)}, {stack_args}) "
               "AS (check_name, n_failed)"))
        .select("check_name", "n_rows", "n_failed",
                F.expr("n_failed * 1000000 DIV n_rows").alias("fail_ppm")))


def trend_slopes(df: DataFrame, group_col: str, ts_col: str = "ts",
                 scale: int = 1_000_000) -> DataFrame:
    """Per-group daily-volume trend: the least-squares slope of (day
    index, daily count) in exact integer micro-units — the "is this
    event type growing or decaying" monitor a pipeline runs per source /
    type / tenant. slope_ppm = scale·(n·Σxy − Σx·Σy) DIV (n·Σx² − (Σx)²)
    with x = days since the table's first day, so every sufficient
    statistic is a small BIGINT and the result is order-free and
    engine-exact (float regression sums are neither).

    Plan: one (group, day) count aggregation, a 1-row min-day anchor
    broadcast, then one per-group fold over the daily rows — two
    shuffles total, counts only on the wire. Groups with < 2 distinct
    days (or zero x-variance) emit NULL slope rather than divide-by-zero.
    Output: (group, n_days, total_events, slope_ppm).
    """
    day = F.to_date(F.col(ts_col))
    daily = (df.select(F.col(group_col).alias("grp"), day.alias("d"))
             .groupBy("grp", "d").agg(F.count(F.lit(1)).alias("y")))
    anchor = daily.agg(F.min("d").alias("_d0"))
    xy = (daily.crossJoin(F.broadcast(anchor))
          .select("grp", "y",
                  F.datediff(F.col("d"), F.col("_d0")).cast("long")
                  .alias("x")))
    sums = (xy.groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                 F.sum(F.col("x") * F.col("y")).alias("sxy"),
                 F.sum(F.col("x") * F.col("x")).alias("sxx")))
    # sign-separated integer division: |num|·scale DIV den truncates
    # toward zero in every engine; a raw negative DIV does not (Spark
    # truncates, DuckDB floors), and float '/' is not order-exact.
    # Domain: n·Σxy must fit signed 64-bit — holds for daily rollups
    # (n ≤ 10^4 days) up to ~10^9 events/day; beyond that, lift the
    # sufficient statistics to DECIMAL(38,0) as numeric_corr_matrix does.
    withnd = (sums
              .withColumn("num", F.col("n") * F.col("sxy")
                          - F.col("sx") * F.col("sy"))
              .withColumn("den", F.col("n") * F.col("sxx")
                          - F.col("sx") * F.col("sx")))
    return (withnd.select(
        F.col("grp").alias(group_col),
        F.col("n").alias("n_days"),
        F.col("sy").alias("total_events"),
        F.when(F.col("den") > 0,
               F.expr(f"CAST(CASE WHEN num < 0 THEN -1 ELSE 1 END"
                      f" * (({scale} * abs(num)) DIV den) AS BIGINT)"))
        .alias("slope_ppm")))


def l_diversity_audit(df: DataFrame, quasi_cols: "list[str]",
                      sensitive_col: str, l: int = 2) -> DataFrame:
    """l-diversity audit — the privacy screen k-anonymity misses: an
    equivalence class can be large (k-anonymous) yet expose everyone in
    it when all rows share ONE sensitive value. Reports every
    quasi-identifier class whose count of DISTINCT sensitive values is
    below ``l``: (quasi..., class_size, n_sensitive).

    One groupBy with an exact COUNT DISTINCT (two-level aggregation
    under the hood — map-side partial by (quasi, sensitive), then the
    class rollup); only failing classes leave the executors, like
    k_anonymity_audit."""
    return (df.groupBy(*quasi_cols)
            .agg(F.count(F.lit(1)).alias("class_size"),
                 F.countDistinct(sensitive_col).alias("n_sensitive"))
            .where(F.col("n_sensitive") < l))


def embedding_dim_robust_stats(emb: DataFrame, scale: int = 10_000,
                               vec_col: str = "embedding") -> DataFrame:
    """Per-dimension robust location/spread of an embedding column:
    discrete median and MAD (median absolute deviation) of every
    coordinate, computed entirely from QUANTIZED REGISTERS — the
    outlier-resistant complement to ``embedding_covariance`` (one fat
    vector throws a mean/variance profile; the median/MAD profile it
    takes to notice that is immune). Median here is the discrete lower
    median (smallest value whose cumulative count reaches ceil(n/2) —
    the dataset_card convention), so every statistic is exact integer
    arithmetic until the final descale. Returns
    (pos, n, median, mad) with values rounded to 4dp.

    Scale shape: coordinates quantize map-side to 1/scale units, so the
    register table is bounded by dims x value-range x scale (~1e5 rows
    per dimension for unit-range embeddings) REGARDLESS of corpus rows;
    both median passes are cumulative windows over those bounded
    registers partitioned by dimension — never a sort of the corpus —
    and the deviation pass reuses the first-pass registers, not the
    data.
    """
    from pyspark.sql import Window

    from amundsendatabuilder_spark.functions.scalars import round_half_away
    u = emb.select(
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("pos", "x"))
    reg = (u.select("pos", round_half_away(F.col("x") * scale, 0)
                    .cast("long").alias("q"))
           .groupBy("pos", "q")
           .agg(F.count(F.lit(1)).cast("long").alias("c"))
           .localCheckpoint())
    wc = Window.partitionBy("pos").orderBy("q") \
        .rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.partitionBy("pos")
    cum = (reg.withColumn("cumc", F.sum("c").over(wc))
           .withColumn("n", F.sum("c").over(wn)))
    med = (cum.where(F.col("cumc") * 2 >= F.col("n"))
           .groupBy("pos").agg(F.min("q").alias("medq"),
                               F.max("n").alias("n")))
    dev = (reg.join(F.broadcast(med), "pos")
           .groupBy("pos", F.abs(F.col("q") - F.col("medq")).alias("dq"))
           .agg(F.sum("c").alias("c")))
    dcum = (dev.withColumn(
        "cumc", F.sum("c").over(Window.partitionBy("pos").orderBy("dq")
                                .rowsBetween(Window.unboundedPreceding, 0)))
        .withColumn("n", F.sum("c").over(wn)))
    mad = (dcum.where(F.col("cumc") * 2 >= F.col("n"))
           .groupBy("pos").agg(F.min("dq").alias("madq")))
    return (med.join(mad, "pos")
            .select("pos", F.col("n").cast("long").alias("n"),
                    round_half_away(F.col("medq") / float(scale), 4)
                    .alias("median"),
                    round_half_away(F.col("madq") / float(scale), 4)
                    .alias("mad")))


def benford_audit(df: DataFrame, value_col: str,
                  group_col: str | None = None) -> DataFrame:
    """Benford's-law first-digit audit of a positive numeric column:
    compares the observed leading-digit distribution against
    P(d) = log10(1 + 1/d) and reports the chi-square statistic — the
    classic fabricated-/synthetic-data tripwire for financial and
    measurement columns (naturally-occurring multi-magnitude data
    follows Benford; uniform or hand-typed data does not). Complements
    ``distribution_drift`` (which needs a reference snapshot) with an
    absolute, reference-free test.

    Returns one row per group: (group?, n_values, chi_square,
    max_abs_dev_ppm, worst_digit) — chi_square 6dp, max_abs_dev the
    largest |observed - expected| probability gap in ppm, worst_digit
    the digit attaining it (ties -> smallest digit).

    Determinism/scale shape: the leading digit is read from the STRING
    form of the value quantized to a 1e6-scaled BIGINT — integer
    rendering is exact and engine-identical, so no float log or
    scientific-notation rounding sits in the digit path (domain:
    |value| >= 1e-5; smaller magnitudes lose their leading digit to
    the quantization and are excluded with the zeros). Counts collapse
    map-side to a <= groups x 9 REGISTER table; chi-square terms use
    baked 1e9-quantized Benford probabilities, are themselves
    1e6-quantized per digit, and sum exactly; worst-digit selection is
    a struct-max on the register (no window).
    """
    import math
    probs = [(d, int(round(math.log10(1 + 1 / d) * 1e9)))
             for d in range(1, 10)]
    gcols = [group_col] if group_col else []
    v = F.abs(F.col(value_col).cast("double"))
    m = round_half_away(v * 1e6, 0).cast("long")
    digit = F.substring(m.cast("string"), 1, 1).cast("int")
    base = (df.where(F.col(value_col).isNotNull())
            .select(*gcols, F.when(m > 0, digit).alias("d"))
            .where(F.col("d").isNotNull()))
    reg = (base.groupBy(*gcols, "d")
           .agg(F.count(F.lit(1)).cast("long").alias("c")))
    tot = (reg.groupBy(*gcols)
           .agg(F.sum("c").cast("long").alias("n")))
    pdf = df.sparkSession.createDataFrame(probs, "d int, p_e9 long")
    full = (tot.crossJoin(F.broadcast(pdf))
            .join(reg, gcols + ["d"], "left")
            .select(*gcols, "d", "n", "p_e9",
                    F.coalesce("c", F.lit(0)).cast("long").alias("c")))
    # chi^2 = sum (c - n*p)^2 / (n*p); dev_ppm = |c/n - p| * 1e6
    np_ = F.col("n").cast("double") * F.col("p_e9").cast("double") / 1e9
    chi_term = (F.col("c").cast("double") - np_) ** 2 / np_
    dev_ppm = round_half_away(
        F.abs(F.col("c").cast("double") / F.col("n").cast("double")
              - F.col("p_e9").cast("double") / 1e9) * 1e6, 0).cast("long")
    scored = full.select(*gcols, "n",
                         round_half_away(chi_term * 1e6, 0).cast("long")
                         .alias("chi_e6"),
                         dev_ppm.alias("dev"), "d")
    worst = F.max(F.struct(F.col("dev").alias("dev"),
                           (-F.col("d")).alias("nd")))
    agg = (scored.groupBy(*gcols)
           .agg(F.max("n").alias("n_values"),
                round_half_away(F.sum("chi_e6").cast("double") / 1e6, 6)
                .alias("chi_square"),
                worst.alias("w")))
    return agg.select(*gcols, "n_values", "chi_square",
                      F.col("w.dev").alias("max_abs_dev_ppm"),
                      (-F.col("w.nd")).cast("int").alias("worst_digit"))


def chi_square_independence(df: DataFrame, col_a: str,
                            col_b: str) -> DataFrame:
    """Chi-square test of independence between two categorical columns
    plus Cramér's V effect size — the pairwise-dependence row of a data
    profile ("is order priority independent of status?"), complementing
    ``fd_violations`` (exact functional dependence) and
    ``numeric_corr_matrix`` (linear numeric dependence) with the
    categorical middle ground.

    Returns one row: (n, levels_a, levels_b, chi_square, cramers_v),
    both statistics 6dp. V in [0,1]: 0 = independent, 1 = one column
    determines the other.

    Determinism/scale shape: one map-side-combinable pass builds the
    contingency REGISTER (|A| x |B| cells — bounded by category
    cardinalities, never rows); marginals and the full grid (including
    observed-zero cells, which still carry expected mass) derive from
    it via broadcast joins. Counts are exact integers; each cell's
    chi-square term is 1e6-quantized before the order-free sum; the
    closing sqrt is one double op, 6dp. NULL in either column drops
    the row (no NULL level).
    """
    base = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
            .select(F.col(col_a).cast("string").alias("a"),
                    F.col(col_b).cast("string").alias("b")))
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    ra = cells.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    rb = cells.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    grid = (ra.crossJoin(F.broadcast(rb))
            .join(cells, ["a", "b"], "left")
            .select("a", "b", "ca", "cb",
                    F.coalesce("c", F.lit(0)).cast("long").alias("c")))
    tot = cells.agg(F.sum("c").cast("long").alias("n"),
                    F.countDistinct("a").cast("long").alias("la"),
                    F.countDistinct("b").cast("long").alias("lb"))
    g = grid.crossJoin(F.broadcast(tot))
    exp = (F.col("ca").cast("double") * F.col("cb").cast("double")
           / F.col("n").cast("double"))
    term = (F.col("c").cast("double") - exp) ** 2 / exp
    q = g.select("n", "la", "lb",
                 round_half_away(term * 1e6, 0).cast("long")
                 .alias("t_e6"))
    s = q.groupBy("n", "la", "lb").agg(
        F.sum("t_e6").alias("chi_e6"))
    chi = F.col("chi_e6").cast("double") / 1e6
    denom = (F.col("n").cast("double")
             * (F.least("la", "lb").cast("double") - 1))
    return s.select(
        F.col("n"), F.col("la").alias("levels_a"),
        F.col("lb").alias("levels_b"),
        round_half_away(chi, 6).alias("chi_square"),
        F.when(denom > 0, round_half_away(F.sqrt(chi / denom), 6))
        .alias("cramers_v"))


def ks_drift_stat(df: DataFrame, value_col: str, group_col: str,
                  group_a, group_b, scale: int = 100) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the numeric
    distributions of two groups: D = max_v |ECDF_a(v) - ECDF_b(v)| —
    the numeric complement of ``distribution_drift`` (categorical TV
    distance), answering "did this column's SHAPE move between two
    corpus versions / sources?" without binning choices.

    Returns one row: (n_a, n_b, ks_d, ks_at_value) — ks_d 6dp,
    ks_at_value the (quantized) value attaining the supremum
    (ties -> smallest value).

    Determinism/scale shape: values quantize to ``scale``-scaled
    BIGINT (register width bounds the table: distinct quantized values,
    never rows — widen ``scale`` only as the domain allows, the
    equi_depth_boundaries contract, ENFORCED at runtime by
    ``guard_register_domain``); per-value counts collapse
    map-side; the cumulative window runs over the REGISTER ordered by
    value. The supremum is computed as max |cum_a * n_b - cum_b * n_a|
    — EXACT integer arithmetic, no per-row float — and only the final
    D = num / (n_a * n_b) divides, 6dp.
    """
    from pyspark.sql import Window
    q = round_half_away(F.col(value_col).cast("double") * scale,
                        0).cast("long")
    base = (df.where(F.col(group_col).isin([group_a, group_b])
                     & F.col(value_col).isNotNull())
            .select(q.alias("q"),
                    (F.col(group_col) == group_a).cast("int").alias("ia")))
    reg = (base.groupBy("q")
           .agg(F.sum("ia").cast("long").alias("ca"),
                F.sum(F.lit(1) - F.col("ia")).cast("long").alias("cb")))
    w = (Window.orderBy("q")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = reg.select(
        "q",
        guard_register_domain(
            F.sum("ca").over(w).cast("long"),
            F.count(F.lit(1)).over(w), "ks_drift_stat").alias("cum_a"),
        F.sum("cb").over(w).cast("long").alias("cum_b"))
    tot = reg.agg(F.sum("ca").cast("long").alias("na"),
                  F.sum("cb").cast("long").alias("nb"))
    j = cum.crossJoin(F.broadcast(tot))
    diff = F.abs(F.col("cum_a") * F.col("nb")
                 - F.col("cum_b") * F.col("na"))
    best = (j.select("na", "nb", diff.alias("d"), "q")
            .groupBy("na", "nb")
            .agg(F.max(F.struct(F.col("d").alias("d"),
                                (-F.col("q")).alias("nq"))).alias("w")))
    # degenerate-sample hardening (ANSI aborts on x/0, r14 one-event
    # sweep): a single-row stream puts every row in ONE half, so the
    # other sample is empty and D = d / (n_a * n_b) divides by zero.
    # KS between a sample and nothing is undefined -> NULL, the
    # gini_inequality convention (counts still report, so the consumer
    # sees WHY)
    both = (F.col("na") > 0) & (F.col("nb") > 0)
    return best.select(
        F.col("na").alias("n_a"), F.col("nb").alias("n_b"),
        F.when(both, round_half_away(
            F.col("w.d").cast("double")
            / (F.col("na").cast("double")
               * F.col("nb").cast("double")), 6))
        .alias("ks_d"),
        F.when(both, round_half_away(
            (-F.col("w.nq")).cast("double") / scale, 6))
        .alias("ks_at_value"))


def gini_inequality(df: DataFrame, value_col: str,
                    group_col: str | None = None,
                    scale: int = 1) -> DataFrame:
    """Gini coefficient of a non-negative measure per group — "how
    unequal are document lengths / source contributions?", the
    concentration row of a dataset card (a corpus whose token mass
    Gini approaches 1 is dominated by a few giants; shard planning and
    mixture weights both care). Complements ``skew_report`` (top-k
    share) with the full-distribution inequality index.

    Returns (group?, n, total, gini) — gini 6dp in [0, 1), 0 = all
    equal. NULL and negative values are excluded; gini is NULL when
    the group total is 0.

    Determinism/scale shape: values quantize to ``scale``-scaled
    BIGINT registers (value, multiplicity) bounded by the distinct
    quantized domain; the rank-weighted sum uses the closed form over
    tie groups — for m copies of value v after a lower-rank mass of a:
    sum_{i=a+1..a+m} (2i - n - 1) v = v * m * (2a + m - n), needing
    only the register cumulative window. Everything up to the final
    G = num / (n * total) division (6dp) is exact integer arithmetic.
    """
    from pyspark.sql import Window
    gcols = [group_col] if group_col else []
    q = round_half_away(F.col(value_col).cast("double") * scale,
                        0).cast("long")
    base = (df.where(F.col(value_col).isNotNull())
            .select(*gcols, q.alias("v"))
            .where(F.col("v") >= 0))
    reg = (base.groupBy(*gcols, "v")
           .agg(F.count(F.lit(1)).cast("long").alias("m")))
    w = ((Window.partitionBy(*gcols) if gcols else Window.partitionBy())
         .orderBy("v").rowsBetween(Window.unboundedPreceding, -1))
    cum = reg.select(
        *gcols, "v", "m",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("a"))
    tot = reg.groupBy(*gcols).agg(
        F.sum("m").cast("long").alias("n"),
        F.sum(F.col("v") * F.col("m")).cast("long").alias("total"))
    j = cum.join(F.broadcast(tot), gcols) if gcols else \
        cum.crossJoin(F.broadcast(tot))
    # num = sum over tie groups of v * m * (2a + m - n)
    contrib = (F.col("v") * F.col("m")
               * (F.lit(2) * F.col("a") + F.col("m") - F.col("n")))
    s = (j.groupBy(*gcols, "n", "total")
         .agg(F.sum(contrib).cast("long").alias("num")))
    return s.select(
        *gcols, "n", "total",
        F.when(F.col("total") > 0, round_half_away(
            F.col("num").cast("double")
            / (F.col("n").cast("double") * F.col("total").cast("double")),
            6)).alias("gini"))


def mutual_information(df: DataFrame, col_a: str,
                       col_b: str) -> DataFrame:
    """Mutual information (nats) and sqrt-normalized NMI between two
    categorical columns — the information-theoretic companion to
    ``chi_square_independence`` (chi-square scales with n and hides
    effect size; MI/NMI answer "how many nats does knowing A give
    about B?" and normalize to [0,1]). The standard external
    clustering-evaluation metric: run it on (label, cluster_id) to
    score any clustering against ground truth.

    Returns one row: (n, levels_a, levels_b, entropy_a, entropy_b,
    mi, nmi), all 6dp nats; nmi = mi / sqrt(H_a * H_b), NULL when
    either entropy is 0 (a constant column carries no information).

    Determinism/scale shape: same contingency REGISTER as
    chi_square_independence (|A| x |B| cells, map-side combinable;
    only OBSERVED cells contribute — 0 ln 0 = 0 so the zero grid is
    not needed). Each cell's p*ln term quantizes to 1e9-scaled BIGINT
    before the order-free sum; entropies come from the marginal
    registers the same way; the closing sqrt/divide rounds 6dp.
    """
    base = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
            .select(F.col(col_a).cast("string").alias("a"),
                    F.col(col_b).cast("string").alias("b")))
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    ra = cells.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    rb = cells.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    tot = cells.agg(F.sum("c").cast("long").alias("n"),
                    F.countDistinct("a").cast("long").alias("la"),
                    F.countDistinct("b").cast("long").alias("lb"))
    g = (cells.join(F.broadcast(ra), "a").join(F.broadcast(rb), "b")
         .crossJoin(F.broadcast(tot)))
    nd = F.col("n").cast("double")
    mi_term = (F.col("c").cast("double") / nd) * F.log(
        F.col("c").cast("double") * nd
        / (F.col("ca").cast("double") * F.col("cb").cast("double")))
    mi_q = (g.select(round_half_away(mi_term * 1e9, 0).cast("long")
                     .alias("t"))
            .agg(F.sum("t").alias("mi_e9")))

    def _entropy(marg: DataFrame, cnt: str) -> DataFrame:
        p = F.col(cnt).cast("double") / F.col("n").cast("double")
        return (marg.crossJoin(F.broadcast(tot))
                .select(round_half_away(-p * F.log(p) * 1e9, 0)
                        .cast("long").alias("t"))
                .agg(F.sum("t").alias("h_e9")))

    ha = _entropy(ra, "ca").withColumnRenamed("h_e9", "ha_e9")
    hb = _entropy(rb, "cb").withColumnRenamed("h_e9", "hb_e9")
    out = tot.crossJoin(F.broadcast(mi_q)).crossJoin(
        F.broadcast(ha)).crossJoin(F.broadcast(hb))
    mi = F.col("mi_e9").cast("double") / 1e9
    h_a = F.col("ha_e9").cast("double") / 1e9
    h_b = F.col("hb_e9").cast("double") / 1e9
    return out.select(
        "n", F.col("la").alias("levels_a"), F.col("lb").alias("levels_b"),
        round_half_away(h_a, 6).alias("entropy_a"),
        round_half_away(h_b, 6).alias("entropy_b"),
        round_half_away(mi, 6).alias("mi"),
        F.when((F.col("ha_e9") > 0) & (F.col("hb_e9") > 0),
               round_half_away(mi / F.sqrt(h_a * h_b), 6)).alias("nmi"))


def spearman_correlation(df: DataFrame, col_x: str, col_y: str,
                         scale: int = 100) -> DataFrame:
    """Spearman rank correlation with exact tie-corrected (average)
    ranks — the monotone-dependence profile ``numeric_corr_matrix``
    (Pearson) cannot see: rho catches any monotone relation and is
    immune to the outliers that dominate Pearson on heavy-tailed
    columns. Standard fractional ranking: every member of a tie group
    gets the group's average rank.

    Returns one row: (n, rho) — rho 6dp, NULL when either column is
    constant.

    Determinism/scale shape: values quantize to ``scale``-scaled
    BIGINT; per-column rank REGISTERS (value, multiplicity, lower
    mass) are bounded by distinct quantized values (ENFORCED at
    runtime by ``guard_register_domain``), and the doubled
    average rank 2a + m + 1 is an exact INTEGER (no .5 ranks), so rows
    join their ranks by value and Pearson-on-ranks accumulates the
    five sufficient statistics as DECIMAL(38,0) — exact and
    order-free, the numeric_corr_matrix contract, including the
    centered subtraction in decimal before the single double
    sqrt/divide. Domain: n * (2n)^2 < 10^38, i.e. any real corpus.
    """
    from pyspark.sql import Window
    qx = round_half_away(F.col(col_x).cast("double") * scale,
                         0).cast("long")
    qy = round_half_away(F.col(col_y).cast("double") * scale,
                         0).cast("long")
    base = (df.where(F.col(col_x).isNotNull() & F.col(col_y).isNotNull())
            .select(qx.alias("vx"), qy.alias("vy")))

    def _ranks(col: str) -> DataFrame:
        reg = base.groupBy(col).agg(
            F.count(F.lit(1)).cast("long").alias("m"))
        w = (Window.orderBy(col)
             .rowsBetween(Window.unboundedPreceding, -1))
        # same sort/partitioning, inclusive frame: the register-row rank
        # for the domain guard rides the one WindowExec
        wi = (Window.orderBy(col)
              .rowsBetween(Window.unboundedPreceding, 0))
        return reg.select(
            col,
            guard_register_domain(
                (F.lit(2) * F.coalesce(F.sum("m").over(w), F.lit(0))
                 + F.col("m") + F.lit(1)).cast("long"),
                F.count(F.lit(1)).over(wi),
                f"spearman_correlation ({col})").alias(f"r_{col}"))

    ranked = (base.join(_ranks("vx"), "vx").join(_ranks("vy"), "vy"))
    rx = F.col("r_vx").cast("decimal(19,0)")
    ry = F.col("r_vy").cast("decimal(19,0)")
    s = ranked.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("r_vx").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("r_vy").cast("decimal(38,0)")).alias("sy"),
        F.sum((rx * ry).cast("decimal(38,0)")).alias("sxy"),
        F.sum((rx * rx).cast("decimal(38,0)")).alias("sxx"),
        F.sum((ry * ry).cast("decimal(38,0)")).alias("syy"))
    cov = (F.col("n") * F.col("sxy")
           - F.col("sx") * F.col("sy")).cast("double")
    vx_ = (F.col("n") * F.col("sxx")
           - F.col("sx") * F.col("sx")).cast("double")
    vy_ = (F.col("n") * F.col("syy")
           - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        F.col("n").cast("long").alias("n"),
        F.when((vx_ > 0) & (vy_ > 0),
               round_half_away(cov / F.sqrt(vx_ * vy_), 6)).alias("rho"))


def theil_decomposition(df: DataFrame, value_col: str,
                        group_col: str) -> DataFrame:
    """Theil-T inequality index with its exact between/within-group
    decomposition — the property that makes Theil (not Gini) the
    distributed-pipeline inequality measure: corpus inequality of a
    measure (tokens, bytes) splits ADDITIVELY into "between sources"
    and "within sources", telling a mixture designer whether imbalance
    comes from source sizing (fix with mixture weights) or from
    within-source giants (fix with length caps). Complements
    ``gini_inequality`` (per-group, non-decomposable).

    Returns one row: (n, n_groups, theil_total, theil_between,
    theil_within), 6dp nats; theil_total = between + within up to the
    1e-9 quantization (the unit test pins the residual).

    Determinism/scale shape: per-value REGISTERS (group, value,
    multiplicity) collapse map-side — bounded by distinct values per
    group, never rows; every Theil term m*(v/T)*ln(v*n/T) quantizes to
    1e9-scaled BIGINT per register row (multiplicity folded in BEFORE
    rounding) and sums order-free; the group stage runs on a
    |groups|-row register. Zero/negative values are excluded (x ln x
    -> 0 continuation for x=0; negatives are outside Theil's domain).
    """
    v = F.col(value_col).cast("long")
    base = (df.where(F.col(value_col).isNotNull() & (v > 0))
            .select(F.col(group_col).alias("grp"), v.alias("v")))
    reg = base.groupBy("grp", "v").agg(
        F.count(F.lit(1)).cast("long").alias("m"))
    gtot = reg.groupBy("grp").agg(
        F.sum("m").cast("long").alias("ng"),
        F.sum(F.col("v") * F.col("m")).cast("long").alias("xg"))
    tot = gtot.agg(F.sum("ng").cast("long").alias("n"),
                   F.sum("xg").cast("long").alias("t"),
                   F.count(F.lit(1)).cast("long").alias("n_groups"))

    def _theil_terms(total_col, count_col):
        # m * (v/T) * ln(v * n / T), quantized 1e9 per register row
        vt = F.col("v").cast("double") / total_col.cast("double")
        return round_half_away(
            F.col("m").cast("double") * vt
            * F.log(F.col("v").cast("double") * count_col.cast("double")
                    / total_col.cast("double")) * 1e9, 0).cast("long")

    # total: terms against corpus (T, n)
    t_tot = (reg.crossJoin(F.broadcast(tot))
             .select(_theil_terms(F.col("t"), F.col("n")).alias("q"))
             .agg(F.sum("q").alias("tt_e9")))
    # within: per-group Theil against (X_g, n_g), share-weighted X_g/T
    t_grp = (reg.join(F.broadcast(gtot), "grp")
             .select("grp", _theil_terms(F.col("xg"), F.col("ng"))
                     .alias("q"))
             .groupBy("grp").agg(F.sum("q").alias("tg_e9")))
    within = (t_grp.join(F.broadcast(gtot), "grp")
              .crossJoin(F.broadcast(tot))
              .select(round_half_away(
                  (F.col("xg").cast("double") / F.col("t").cast("double"))
                  * F.col("tg_e9").cast("double"), 0)
                  .cast("long").alias("q"))
              .agg(F.sum("q").alias("tw_e9")))
    # between: group-share terms on the |groups|-row register
    between = (gtot.crossJoin(F.broadcast(tot))
               .select(round_half_away(
                   (F.col("xg").cast("double") / F.col("t").cast("double"))
                   * F.log((F.col("xg").cast("double")
                            / F.col("t").cast("double"))
                           / (F.col("ng").cast("double")
                              / F.col("n").cast("double"))) * 1e9, 0)
                   .cast("long").alias("q"))
               .agg(F.sum("q").alias("tb_e9")))
    out = (tot.crossJoin(F.broadcast(t_tot))
           .crossJoin(F.broadcast(between))
           .crossJoin(F.broadcast(within)))
    return out.select(
        "n", "n_groups",
        round_half_away(F.col("tt_e9").cast("double") / 1e9, 6)
        .alias("theil_total"),
        round_half_away(F.col("tb_e9").cast("double") / 1e9, 6)
        .alias("theil_between"),
        round_half_away(F.col("tw_e9").cast("double") / 1e9, 6)
        .alias("theil_within"))


def variance_decomposition(df: DataFrame, value_col: str,
                           group_col: str, scale: int = 100) -> DataFrame:
    """One-way ANOVA decomposition of a numeric column over groups:
    SS_total = SS_between + SS_within, the F statistic, and eta-squared
    (variance explained by group membership) — "does source explain
    document length?" as a number. The any-sign numeric companion to
    ``theil_decomposition`` (which needs positive measures) and the
    categorical-vs-numeric complement of ``chi_square_independence``.

    Returns one row: (n, n_groups, ss_between, ss_within, f_stat,
    eta_squared) — SS values 4dp in the scaled units, f/eta 6dp; f
    NULL when within-variance is 0 or dof degenerate.

    Determinism/scale shape: values quantize to ``scale``-scaled
    BIGINT; per-group (n_g, sum, sum-of-squares) accumulate as
    DECIMAL(38,0) — exact, order-free, the numeric_corr_matrix
    contract — in ONE map-side-combinable pass. Group means enter only
    via X_g^2 / n_g, computed per group in doubles from the exact
    decimals, quantized to 1e4-scaled BIGINT, and summed over the
    |groups|-row register (order-free again). Domain: n * (max|x| *
    scale)^2 < 10^38.
    """
    q = round_half_away(F.col(value_col).cast("double") * scale,
                        0).cast("long")
    base = (df.where(F.col(value_col).isNotNull())
            .select(F.col(group_col).alias("grp"), q.alias("v")))
    dv = F.col("v").cast("decimal(19,0)")
    g = base.groupBy("grp").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ng"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sg"),
        F.sum((dv * dv).cast("decimal(38,0)")).alias("ssg"))
    # per-group X_g^2/n_g term, 1e4-quantized for the order-free sum
    term = round_half_away(
        (F.col("sg").cast("double") * F.col("sg").cast("double"))
        / F.col("ng").cast("double") / (scale * scale) * 1e4, 0
    ).cast("long")
    reg = g.select("grp", "ng", "sg", "ssg", term.alias("t4"))
    tot = reg.agg(
        F.sum("ng").alias("n"), F.sum("sg").alias("sx"),
        F.sum("ssg").alias("sxx"),
        F.sum("t4").alias("st4"),
        F.count(F.lit(1)).cast("long").alias("k"))
    n_d = F.col("n").cast("double")
    grand = (F.col("sx").cast("double") * F.col("sx").cast("double")
             / n_d / (scale * scale))
    ss_tot = F.col("sxx").cast("double") / (scale * scale) - grand
    ss_b = F.col("st4").cast("double") / 1e4 - grand
    ss_w = ss_tot - ss_b
    kd = F.col("k").cast("double")
    f_stat = (ss_b / (kd - 1)) / (ss_w / (n_d - kd))
    return tot.select(
        F.col("n").cast("long").alias("n"),
        F.col("k").alias("n_groups"),
        round_half_away(ss_b, 4).alias("ss_between"),
        round_half_away(ss_w, 4).alias("ss_within"),
        F.when((F.col("k") > 1) & (ss_w > 0)
               & (F.col("n").cast("long") > F.col("k")),
               round_half_away(f_stat, 6)).alias("f_stat"),
        F.when(ss_tot > 0, round_half_away(ss_b / ss_tot, 6))
        .alias("eta_squared"))


def missingness_matrix(df: DataFrame,
                       cols: "list[str]") -> DataFrame:
    """NULL-co-occurrence profile: for every column pair, how often the
    two are missing TOGETHER versus what independence predicts — the
    phi coefficient of the 2x2 missingness table. Correlated
    missingness (rows that lose several fields at once) is an
    upstream-join/ETL-bug signature that per-column null counts
    (``profile_columns``) cannot see.

    Returns one row per (col_a < col_b) pair: (col_a, col_b, n,
    null_a, null_b, null_both, lift_ppm, phi) — lift_ppm the exact
    integer ratio P(both) / (P(a) P(b)) in ppm (1e6 = independent),
    NULL when either marginal is 0; phi 6dp, NULL when a marginal is
    0 or saturated.

    Determinism/scale shape: ONE wide map-side-combinable aggregation
    computes every pair's counts (no explode, no shuffle of data
    columns — the |pairs| conditional sums ride one combine tree);
    everything after is integer arithmetic on a 1-row frame, phi's
    single double expression at the end. DIV keeps lift exact.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .cast("long").alias(f"na_{c}"))
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            aggs.append(F.sum((F.col(ca).isNull()
                               & F.col(cb).isNull()).cast("long"))
                        .cast("long").alias(f"nb_{ca}__{cb}"))
    wide = df.agg(*aggs)
    out = None
    for i, ca in enumerate(cols):
        for cb in cols[i + 1:]:
            n = F.col("n")
            a = F.col(f"na_{ca}")
            b = F.col(f"na_{cb}")
            ab = F.col(f"nb_{ca}__{cb}")
            lift = F.when((a > 0) & (b > 0), F.expr(
                f"(nb_{ca}__{cb} * n * CAST(1000000 AS BIGINT)) "
                f"DIV (na_{ca} * na_{cb})")).cast("long")
            # phi = (n*ab - a*b) / sqrt(a*b*(n-a)*(n-b))
            num = (n * ab - a * b).cast("double")
            den = F.sqrt(a.cast("double") * b.cast("double")
                         * (n - a).cast("double")
                         * (n - b).cast("double"))
            phi = F.when((a > 0) & (b > 0) & (a < n) & (b < n),
                         round_half_away(num / den, 6))
            row = wide.select(
                F.lit(ca).alias("col_a"), F.lit(cb).alias("col_b"),
                n.alias("n"), a.alias("null_a"), b.alias("null_b"),
                ab.alias("null_both"), lift.alias("lift_ppm"),
                phi.alias("phi"))
            out = row if out is None else out.unionByName(row)
    return out


def rank_auc(df: DataFrame, value_col: str, group_col: str,
             group_a, group_b, scale: int = 10000) -> DataFrame:
    """Mann-Whitney AUC: the probability that a random ``group_a`` row
    scores above a random ``group_b`` row (ties count half) — the
    threshold-free answer to "does this score actually separate these
    populations?" (AUC 0.5 = no signal, 1.0 = perfect). Run it on
    (quality_score, source) before trusting a quality cut to filter a
    source, or on any classifier score against labels.

    Returns one row: (n_a, n_b, u_stat_x2, auc) — auc 6dp; u_stat_x2
    is the exact integer 2U (kept so the division is auditable).

    Determinism/scale shape: spearman_correlation's doubled-average-
    rank trick — values quantize to ``scale``-scaled BIGINT, the
    pooled rank REGISTER (value, multiplicity, lower mass) gives every
    row the exact integer 2*rank = 2a + m + 1, and
    2U = sum_a(2r) - n_a(n_a+1) is pure integer arithmetic; AUC = 2U /
    (2 n_a n_b) is the single closing division. No corpus window —
    the rank window runs over the register only.
    """
    from pyspark.sql import Window
    q = round_half_away(F.col(value_col).cast("double") * scale,
                        0).cast("long")
    base = (df.where(F.col(group_col).isin([group_a, group_b])
                     & F.col(value_col).isNotNull())
            .select(q.alias("v"),
                    (F.col(group_col) == group_a).cast("long")
                    .alias("ia")))
    reg = base.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum("ia").cast("long").alias("ma"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = reg.select(
        "v", "m", "ma",
        F.coalesce(F.sum("m").over(w), F.lit(0)).cast("long").alias("a"))
    # each of the ma group-a rows at value v carries 2*avg_rank = 2a+m+1
    s = cum.agg(
        F.sum("ma").cast("long").alias("n_a"),
        F.sum(F.col("m") - F.col("ma")).cast("long").alias("n_b"),
        F.sum(F.col("ma") * (F.lit(2) * F.col("a") + F.col("m")
                             + F.lit(1))).cast("long").alias("r2a"))
    u2 = F.col("r2a") - F.col("n_a") * (F.col("n_a") + 1)
    return s.select(
        "n_a", "n_b", u2.alias("u_stat_x2"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0), round_half_away(
            u2.cast("double")
            / (F.lit(2.0) * F.col("n_a").cast("double")
               * F.col("n_b").cast("double")), 6)).alias("auc"))


def cohens_kappa(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Cohen's kappa: chance-corrected agreement between two
    categorical labelings — the honest accuracy for "does my cheap
    classifier agree with ground truth / the expensive model?"
    (raw accuracy flatters any classifier on skewed labels; kappa 0 =
    chance, 1 = perfect). Run it on (predicted_lang, lang) after
    language_id, or between two dedup winners.

    Returns one row: (n, n_agree, observed_agreement, kappa) — 6dp;
    kappa NULL when expected agreement is 1 (both columns constant and
    equal — kappa undefined).

    Determinism/scale shape: kappa reduces to EXACT integers — with
    contingency register counts, kappa = (n * sum_diag - sum_k ra_k *
    cb_k) / (n^2 - sum_k ra_k * cb_k); everything up to the single
    closing division is integer arithmetic over the marginal registers
    (bounded by label cardinality). Rows with NULL in either column
    are excluded. Domain: n^2 < 2^63.
    """
    base = (df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
            .select(F.col(col_a).cast("string").alias("a"),
                    F.col(col_b).cast("string").alias("b")))
    cells = base.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    ra = cells.groupBy("a").agg(F.sum("c").cast("long").alias("ca"))
    rb = cells.groupBy("b").agg(F.sum("c").cast("long").alias("cb"))
    pe_num = (ra.join(rb, F.col("a") == F.col("b"))
              .agg(F.sum(F.col("ca") * F.col("cb")).alias("s"))
              .select(F.coalesce("s", F.lit(0)).cast("long")
                      .alias("pe_n")))
    agree = (cells.where(F.col("a") == F.col("b"))
             .agg(F.sum("c").alias("s"))
             .select(F.coalesce("s", F.lit(0)).cast("long")
                     .alias("n_agree")))
    tot = cells.agg(F.sum("c").cast("long").alias("n"))
    j = (tot.crossJoin(F.broadcast(agree))
         .crossJoin(F.broadcast(pe_num)))
    num = F.col("n") * F.col("n_agree") - F.col("pe_n")
    den = F.col("n") * F.col("n") - F.col("pe_n")
    return j.select(
        "n", "n_agree",
        round_half_away(F.col("n_agree").cast("double")
                        / F.col("n").cast("double"), 6)
        .alias("observed_agreement"),
        F.when(den > 0, round_half_away(
            num.cast("double") / den.cast("double"), 6)).alias("kappa"))


def calibration_report(scored: DataFrame, score_col: str = "score",
                       label_col: str = "y",
                       n_bins: int = 10) -> DataFrame:
    """Classifier reliability table (the numbers behind a calibration
    diagram): scores bucket into ``n_bins`` equal-width bins and each
    bin reports its size, mean predicted score, and empirical positive
    rate — a well-calibrated filter has mean_score ~ pos_rate per bin,
    and a corpus pipeline checks this BEFORE trusting classifier scores
    as sampling weights (an over-confident quality model silently
    starves whole strata; rank_auc ranks, this calibrates).

    Scores are 6dp-grid doubles (logreg_score's contract); the bin is
    pure integer arithmetic on the 1e6-scaled score (score 1.0 clamps
    into the top bin) and both rates are exact integer ppm, so the
    table is order-free and engine-reproducible. One map-side
    projection + one n_bins-row aggregation.

    Returns (bin, n, mean_score_ppm, pos_rate_ppm), bin 0-based.
    """
    s6 = round_half_away(F.col(score_col) * 1e6, 0).cast("long")
    b = F.least(F.lit(n_bins - 1).cast("long"),
                F.expr(f"_s6 * {int(n_bins)} DIV 1000000")).cast("int")
    return (scored.select(s6.alias("_s6"),
                          F.col(label_col).cast("long").alias("_y"))
            .select(b.alias("bin"), "_s6", "_y")
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.expr("CAST(sum(_s6) DIV count(*) AS BIGINT)")
                 .alias("mean_score_ppm"),
                 F.expr("CAST(sum(_y) * 1000000 DIV count(*) AS BIGINT)")
                 .alias("pos_rate_ppm")))
