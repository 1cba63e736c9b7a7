"""Oracle-verified query suite — one entry per operator class of SURVEY §2
plus the training-data-pipeline operators, each expressed over the driver's
TPC-H-ish test tables so a DuckDB ANSI-SQL twin can verify it.

Every Spark query here is the idiomatic-DataFrame expression of a reference
behavior (file:line cites on each function); the matching SQL string in
``ORACLES`` is the ANSI equivalent DuckDB runs on the same parquet. Column
names/types and float rounding are aligned on both sides because the
driver's compare hashes values after sorting columns by name.

Cross-engine determinism rules used throughout:
- double aggregates rounded (2dp money, 4dp ratios, 6dp similarities);
- integer SUMs cast to BIGINT (DuckDB sums to HUGEINT otherwise);
- epoch via ``unix_timestamp`` (UTC session) == ``CAST(floor(epoch(ts)) AS BIGINT)``;
- arrays emitted as sorted joined strings (engine array hashing differs);
- all content hashing via md5 (identical hex in both engines);
- top-k ranks ordered by (rounded measure, id) so ties break identically.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from amundsendatabuilder_spark import keys
from amundsendatabuilder_spark.functions.scalars import (
    epoch_from_string, literal_replace, round_half_away, template_substitute,
)
from amundsendatabuilder_spark.functions.text import STOPWORDS
from amundsendatabuilder_spark.operators import dedup, similarity, textops
from amundsendatabuilder_spark.session import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    dfs = load_tables(spark, sf_dir, names or None)
    return [dfs[n] for n in names] if names else list(dfs.values())


# ---------------------------------------------------------------------------
# 1. Scans / projection / filter / scalar functions
# ---------------------------------------------------------------------------

@query("scan_filter_project", """
SELECT l_orderkey, l_linenumber, l_quantity,
       round(l_extendedprice * (1 - l_discount), 2) AS net_price
FROM lineitem
WHERE l_returnflag = 'R' AND l_quantity > 45
""")
def scan_filter_project(spark, sf_dir):
    """Scan+filter+project with row-level arithmetic — the CsvExtractor /
    DBAPIExtractor shape (reference: extractor/csv_extractor.py:49-62).
    Catalyst pushes both predicates into the parquet scan and prunes to the
    4 referenced columns (verified via .explain PushedFilters/ReadSchema)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45))
        .select("l_orderkey", "l_linenumber", "l_quantity",
                round_half_away(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
                .alias("net_price"))
    )


@query("key_templates", """
SELECT o_orderkey,
       'database://tpch' AS database_key,
       'tpch://gold' AS cluster_key,
       'tpch://gold.' || o_orderpriority AS schema_key,
       'tpch://gold.' || o_orderpriority || '/' || CAST(o_orderkey AS VARCHAR) AS table_key,
       'tpch://gold.' || o_orderpriority || '/' || CAST(o_orderkey AS VARCHAR)
           || '/' || o_orderstatus AS column_key
FROM orders WHERE o_orderkey % 100 = 0
""")
def key_templates(spark, sf_dir):
    """The §1.4 key-template system (reference:
    databuilder/models/table_metadata.py:296-313,249) as format_string
    columns — pure codegen, no UDF."""
    (orders,) = _t(spark, sf_dir, "orders")
    db, cl = F.lit("tpch"), F.lit("gold")
    sch = F.col("o_orderpriority")
    tbl = F.col("o_orderkey").cast("string")
    return (
        orders.where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            keys.database_key(db).alias("database_key"),
            keys.cluster_key(db, cl).alias("cluster_key"),
            keys.schema_key(db, cl, sch).alias("schema_key"),
            keys.table_key(db, cl, sch, tbl).alias("table_key"),
            keys.column_key(db, cl, sch, tbl, F.col("o_orderstatus")).alias("column_key"),
        )
    )


@query("epoch_transform", """
SELECT o_orderkey,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
       strftime(o_orderdate, '%Y-%m-%d') AS order_date_str
FROM orders WHERE o_orderkey % 100 = 0
""")
def epoch_transform(spark, sf_dir):
    """TimestampStringToEpoch semantics (reference:
    transformer/timestamp_string_to_epoch.py:30-44): timestamp -> epoch
    seconds (UTC session => DuckDB epoch parity), plus formatted date."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.where(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey",
                F.unix_timestamp("o_orderdate").alias("order_epoch"),
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date_str"))
    )


@query("literal_replace_transform", """
SELECT p_partkey, lower(replace(p_type, ' ', '_')) AS norm_type
FROM part
""")
def literal_replace_transform(spark, sf_dir):
    """RegexStrReplaceTransformer does LITERAL replace despite its name
    (reference: transformer/regex_str_replace_transformer.py:41-42) — we
    use F.replace (literal), not regexp_replace."""
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower(literal_replace(F.col("p_type"), [(" ", "_")])).alias("norm_type"))


@query("template_substitution", """
SELECT event_id,
       'https://app/' || event_type || '/' || CAST(user_id AS VARCHAR) AS url
FROM events WHERE event_id % 50 = 0
""")
def template_substitution(spark, sf_dir):
    """TemplateVariableSubstitutionTransformer (reference:
    transformer/template_variable_substitution_transformer.py:29-33):
    '{field}' template filled from record fields, as a concat column."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.where(F.col("event_id") % 50 == 0)
        .select("event_id",
                template_substitute("https://app/{event_type}/{user_id}",
                                    event_type="event_type",
                                    user_id="user_id").alias("url"))
    )


@query("tag_normalize_explode", """
SELECT tag, count(*) AS tag_count
FROM (SELECT lower(trim(unnest(string_split(p_type, ' ')))) AS tag FROM part)
WHERE tag <> ''
GROUP BY tag
""")
def tag_normalize_explode(spark, sf_dir):
    """Tag normalization + fan-out (reference:
    models/table_metadata.py:34-41 format_tags lower/strip;
    csv split at extractor/csv_extractor.py:17-24): split -> explode ->
    normalize -> count. The explode is a UDTF-free flatMap."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_type", " ")).alias("raw"))
        .select(F.lower(F.trim("raw")).alias("tag"))
        .where(F.col("tag") != "")
        .groupBy("tag").agg(F.count("*").alias("tag_count"))
    )


@query("json_props_extract", """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
       count(*) AS n
FROM events GROUP BY event_type
""")
def json_props_extract(spark, sf_dir):
    """JSON path extraction over a string column (reference: JSONPath in
    rest_api/rest_api_query.py:126,152-155 and Presto view JSON decode at
    extractor/presto_view_metadata_extractor.py:100-115)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.select("event_type",
                      F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type")
        .agg(round_half_away(F.avg("k"), 2).alias("avg_k"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# 2. Aggregations (SURVEY §2.4)
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark, sf_dir):
    """Headline aggregation (TPC-H Q1 shape) — the engine's widest
    map-side-combinable groupBy; all arithmetic stays in whole-stage
    codegen, shuffle carries only 6 groups."""
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round_half_away(F.sum("l_quantity"), 2).alias("sum_qty"),
             round_half_away(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
             round_half_away(F.sum(disc_price), 2).alias("sum_disc_price"),
             round_half_away(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
             round_half_away(F.avg("l_quantity"), 4).alias("avg_qty"),
             round_half_away(F.avg("l_extendedprice"), 4).alias("avg_price"),
             round_half_away(F.avg("l_discount"), 4).alias("avg_disc"),
             F.count("*").alias("count_order"))
    )


@query("group_nest_columns", """
SELECT l_orderkey,
       count(*) AS n_lines,
       array_to_string(list_sort(list(printf('%02d:%d', l_linenumber, l_partkey))), ',')
           AS parts_by_line
FROM lineitem GROUP BY l_orderkey
""")
def group_nest_columns(spark, sf_dir):
    """The sort-based group-by -> nested-columns pattern (reference:
    extractor/base_postgres_metadata_extractor.py:79-96 itertools.groupby
    nesting ordered rows into TableMetadata.columns). Spark shape:
    groupBy + sort_array(collect_list(...)) — order restored inside the
    group, no global ORDER BY needed."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.count("*").alias("n_lines"),
             F.concat_ws(",", F.array_sort(F.collect_list(
                 F.format_string("%02d:%d", "l_linenumber", "l_partkey"))))
             .alias("parts_by_line"))
    )


@query("usage_hash_count", """
SELECT user_id, event_type, count(*) AS read_count,
       round(sum(value), 2) AS total_value
FROM events GROUP BY user_id, event_type
""")
def usage_hash_count(spark, sf_dir):
    """BigQuery usage-log hash-count aggregation (reference:
    extractor/bigquery_usage_extractor.py:101-110 dict[key]+=1) as a
    shuffle groupBy with map-side partial aggregation."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.count("*").alias("read_count"),
             round_half_away(F.sum("value"), 2).alias("total_value"))
    )


@query("last_updated_max", """
SELECT event_type, CAST(floor(epoch(max(ts))) AS BIGINT) AS last_updated_epoch
FROM events GROUP BY event_type
""")
def last_updated_max(spark, sf_dir):
    """Hive last-updated MAX(create_time) GROUP BY (reference:
    extractor/hive_table_last_updated_extractor.py:62-72)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.unix_timestamp(F.max("ts")).alias("last_updated_epoch"))
    )


@query("watermark_min_max", """
SELECT o_orderpriority,
       strftime(min(o_orderdate), '%Y-%m-%d') AS low_watermark,
       strftime(max(o_orderdate), '%Y-%m-%d') AS high_watermark,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""")
def watermark_min_max(spark, sf_dir):
    """BigQuery watermark min/max-per-prefix (reference:
    extractor/bigquery_watermark_extractor.py:52-56,127-147)."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("low_watermark"),
             F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("high_watermark"),
             F.count("*").alias("n_orders"))
    )


@query("staleness_guard_ratio", """
SELECT event_type,
       count(*) AS total,
       CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS BIGINT) AS stale,
       round(CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 4) AS stale_ratio
FROM events GROUP BY event_type
""")
def staleness_guard_ratio(spark, sf_dir):
    """Staleness %-guard validation (reference:
    task/neo4j_staleness_removal_task.py:187-253 — refuse delete when
    stale/total exceeds threshold): conditional count + ratio per label."""
    (events,) = _t(spark, sf_dir, "events")
    stale = F.sum(F.when(F.col("ts") < F.lit("2024-01-15").cast("timestamp"), 1)
                  .otherwise(0)).cast("long")
    return (
        events.groupBy("event_type")
        .agg(F.count("*").alias("total"),
             stale.alias("stale"),
             round_half_away(stale.cast("double") / F.count("*"), 4).alias("stale_ratio"))
    )


@query("windowed_event_agg", """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
""")
def windowed_event_agg(spark, sf_dir):
    """Tumbling-window event aggregation — the batch twin of the
    streaming/events.py Structured-Streaming job (the reference's Kafka
    surface, extractor/kafka_source_extractor.py:136-169, has no windowed
    aggs; this is the pipeline-native extension)."""
    (events,) = _t(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count("*").alias("n_events"),
             round_half_away(F.sum("value"), 2).alias("total_value"))
    )


# ---------------------------------------------------------------------------
# 3. Joins (SURVEY §2.3) + set ops + windows
# ---------------------------------------------------------------------------

@query("q3_top_revenue", """
SELECT o_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q3_top_revenue(spark, sf_dir):
    """Multi-way join + group + deterministic top-k (TPC-H Q3 shape).
    customer is broadcast (small dim); rank ties broken by key so LIMIT is
    stable across engines/partitionings."""
    customer, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        li.where(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .join(orders.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round_half_away(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query("q5_region_volume", """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
GROUP BY n_name
""")
def q5_region_volume(spark, sf_dir):
    """6-way star join (TPC-H Q5 shape): fact lineitem joined to orders,
    then all dimensions broadcast — one shuffle for the orders join, zero
    for dims; this is the plan that survives a 100× scale-up."""
    customer, orders, li, supplier, nation, region = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    return (
        li.join(orders.where(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")),
                F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(round_half_away(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@query("staleness_anti_join", """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def staleness_anti_join(spark, sf_dir):
    """Staleness anti-join deletion set (reference:
    task/neo4j_staleness_removal_task.py:143-150 — delete graph entities
    absent from the current publish): left_anti join."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query("semi_join_exists", """
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
""")
def semi_join_exists(spark, sf_dir):
    """EXISTS / left-semi (reference: the Hive NOT EXISTS partition split,
    extractor/hive_table_last_updated_extractor.py:88-90, inverted)."""
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders.where(F.col("o_orderstatus") == "O"),
                      F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query("right_join_tables", """
SELECT n_nationkey, n_name, s_name
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
""")
def right_join_tables(spark, sf_dir):
    """RIGHT JOIN (reference: DremioMetadataExtractor's right join,
    extractor/dremio_metadata_extractor.py:47-49): nations without
    suppliers survive with NULL supplier columns."""
    supplier, nation = _t(spark, sf_dir, "supplier", "nation")
    return (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .select("n_nationkey", "n_name", "s_name")
    )


@query("self_join_same_region", """
SELECT a.n_name AS nation_a, b.n_name AS nation_b, a.n_regionkey AS regionkey
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_name < b.n_name
""")
def self_join_same_region(spark, sf_dir):
    """Self-join (reference: User -> manager_email self-join,
    databuilder/models/user.py:207-212): nation pairs sharing a region."""
    (nation,) = _t(spark, sf_dir, "nation")
    a, b = nation.alias("a"), nation.alias("b")
    return (
        a.join(b, (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
               & (F.col("a.n_name") < F.col("b.n_name")))
        .select(F.col("a.n_name").alias("nation_a"),
                F.col("b.n_name").alias("nation_b"),
                F.col("a.n_regionkey").alias("regionkey"))
    )


@query("union_dedup", """
SELECT p_brand, p_type FROM part WHERE p_size > 40
UNION
SELECT p_brand, p_type FROM part WHERE p_retailprice > 1500
""")
def union_dedup(spark, sf_dir):
    """UNION-with-dedup of two overlapping scans (reference: Hive
    partition/regular column UNION, extractor/hive_table_metadata_extractor.py:46;
    Redshift 3-way UNION, extractor/redshift_metadata_extractor.py:48,63)."""
    (part,) = _t(spark, sf_dir, "part")
    return (
        part.where(F.col("p_size") > 40).select("p_brand", "p_type")
        .union(part.where(F.col("p_retailprice") > 1500).select("p_brand", "p_type"))
        .distinct()
    )


@query("latest_execution_window", """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders) WHERE rn = 1
""")
def latest_execution_window(spark, sf_dir):
    """'Latest execution' first-match pattern (reference:
    extractor/mysql_search_data_extractor.py:284-286 picks
    _last_successful_execution): window row_number()=1 with deterministic
    tie-break."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    )


@query("cond_agg_subqueries", """
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers,
                  round(sum(c_acctbal), 2) AS customer_balance
           FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers,
                  round(sum(s_acctbal), 2) AS supplier_balance
           FROM supplier GROUP BY 1)
SELECT n_nationkey, n_name,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(customer_balance, 0.0) AS customer_balance,
       coalesce(n_suppliers, 0) AS n_suppliers,
       coalesce(supplier_balance, 0.0) AS supplier_balance
FROM nation LEFT JOIN c ON n_nationkey = c.nk LEFT JOIN s ON n_nationkey = s.nk
""")
def cond_agg_subqueries(spark, sf_dir):
    """The user-search grouped-subquery join pattern (reference:
    extractor/mysql_search_data_extractor.py:320-390 — six grouped LEFT
    JOIN subqueries re-joined on the entity key): pre-aggregate per
    relation, left-join aggregates back to the spine."""
    customer, supplier, nation = _t(spark, sf_dir, "customer", "supplier", "nation")
    c = (customer.groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_customers"),
              round_half_away(F.sum("c_acctbal"), 2).alias("customer_balance")))
    s = (supplier.groupBy(F.col("s_nationkey").alias("nk"))
         .agg(F.count("*").alias("n_suppliers"),
              round_half_away(F.sum("s_acctbal"), 2).alias("supplier_balance")))
    return (
        nation
        .join(c, F.col("n_nationkey") == c["nk"], "left")
        .join(s, F.col("n_nationkey") == s["nk"], "left")
        .select("n_nationkey", "n_name",
                F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
                F.coalesce("customer_balance", F.lit(0.0)).alias("customer_balance"),
                F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
                F.coalesce("supplier_balance", F.lit(0.0)).alias("supplier_balance"))
    )


# ---------------------------------------------------------------------------
# 4. The flagship search-document build (SURVEY §2.6)
# ---------------------------------------------------------------------------

@query("search_doc_flagship", """
WITH usage AS (
  SELECT o_custkey,
         count(*) AS total_usage,
         CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS unique_usage,
         round(sum(o_totalprice), 2) AS total_spend,
         CAST(floor(epoch(max(o_orderdate))) AS BIGINT) AS last_updated_epoch,
         coalesce(array_to_string(list_sort(list(DISTINCT o_orderpriority)), ','), '')
             AS priorities
  FROM orders GROUP BY o_custkey)
SELECT 'tpch://gold.' || c_mktsegment || '/' || c_name AS key,
       c_name AS name, c_mktsegment AS schema_name,
       n_name AS nation, r_name AS region,
       coalesce(total_usage, 0) AS total_usage,
       coalesce(unique_usage, 0) AS unique_usage,
       coalesce(total_spend, 0.0) AS total_spend,
       last_updated_epoch,
       coalesce(priorities, '') AS priorities
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
LEFT JOIN usage ON c_custkey = o_custkey
""")
def search_doc_flagship(spark, sf_dir):
    """THE flagship query — the table-search-document build (reference:
    extractor/neo4j_search_data_extractor.py:23-62; SQL twin
    extractor/mysql_search_data_extractor.py:35-176): entity spine joined
    to per-relation pre-aggregates (SUM usage, COUNT DISTINCT users,
    COLLECTed attribute lists), all LEFT so entities without relations
    survive; key built from the §1.4 template.

    Plan shape at scale: usage pre-aggregation shuffles once on the spine
    key; dimension joins broadcast; no row explosion before aggregation."""
    customer, orders, nation, region = _t(
        spark, sf_dir, "customer", "orders", "nation", "region")
    usage = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("total_usage"),
             F.countDistinct("o_orderstatus").alias("unique_usage"),
             round_half_away(F.sum("o_totalprice"), 2).alias("total_spend"),
             F.unix_timestamp(F.max("o_orderdate")).alias("last_updated_epoch"),
             F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority")))
             .alias("priorities"))
    )
    return (
        customer
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(usage, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            keys.table_key(F.lit("tpch"), F.lit("gold"),
                           F.col("c_mktsegment"), F.col("c_name")).alias("key"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("schema_name"),
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
            F.coalesce("total_usage", F.lit(0)).alias("total_usage"),
            F.coalesce("unique_usage", F.lit(0)).alias("unique_usage"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
            F.col("last_updated_epoch"),
            F.coalesce("priorities", F.lit("")).alias("priorities"))
    )


# ---------------------------------------------------------------------------
# 5. Training-data pipeline: text analysis
# ---------------------------------------------------------------------------

_TOKS_SQL = r"list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')"


def _lang_id_sql() -> str:
    langs = sorted(STOPWORDS)
    score_cols = ",\n       ".join(
        "CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        + f"], lower(x)))) AS DOUBLE) / len(toks) ELSE 0.0 END AS score_{lang}"
        for lang in langs)
    pred = " ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in langs)
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
sc AS (SELECT doc_id,
       {score_cols}
       FROM t),
b AS (SELECT *, greatest({', '.join('score_' + lang for lang in langs)}) AS best FROM sc)
SELECT doc_id, CASE {pred} END AS predicted_lang, round(best, 6) AS confidence
FROM b
"""


@query("lang_id", _lang_id_sql())
def lang_id(spark, sf_dir):
    """Language-ID via stopword-ratio heuristic (training-data pipeline
    operator; the synthetic corpus shares one vocabulary so this mostly
    demonstrates the plan shape: N per-language scores + argmax in one
    narrow pass, no shuffle)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.language_id(docs)


@query("quality_metrics", r"""
WITH t AS (SELECT doc_id, text, """ + _TOKS_SQL + r""" AS toks FROM documents),
m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tokens,
        CAST(len(list_filter(string_split_regex(text, '[^A-Za-z]+'), x -> x <> ''))
           + len(list_filter(string_split_regex(text, '[^0-9]+'), x -> x <> ''))
           + (length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g')))
           AS BIGINT) AS n_tokens_bpe,
        CASE WHEN length(text) > 0
             THEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
                  AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS diversity
      FROM t)
SELECT doc_id, n_tokens, n_tokens_bpe, round(praw, 6) AS punct_ratio,
       round(least(n_tokens / 100.0, 1.0) * 0.4 + diversity * 0.4 + (1 - praw) * 0.2, 4)
           AS quality
FROM m
""")
def quality_metrics(spark, sf_dir):
    """C4/Gopher-style quality features + composite score per document
    (token counts incl. BPE-ish proxy, punctuation ratio, diversity)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.quality_metrics(docs)


@query("doc_fingerprint", r"""
SELECT doc_id,
       md5(array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                       x -> x <> ''), ' ')) AS fingerprint,
       substr(md5(array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                              x -> x <> ''), ' ')), 1, 1) AS prefix_bucket
FROM documents
""")
def doc_fingerprint(spark, sf_dir):
    """Deterministic md5 content fingerprint + 16-way prefix shard bucket
    (the partition key an incremental dedup store shards by)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.fingerprints(docs)


# ---------------------------------------------------------------------------
# 6. Training-data pipeline: deduplication
# ---------------------------------------------------------------------------

@query("dedup_exact", r"""
SELECT md5(array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                       x -> x <> ''), ' ')) AS fingerprint,
       count(*) AS n_docs, min(doc_id) AS keep_id
FROM documents GROUP BY 1
""")
def dedup_exact(spark, sf_dir):
    """Exact dedup: hash-groupBy on normalized-content fingerprint with a
    deterministic keeper (min doc_id — cf. SURVEY §7.4 first-wins dedup
    trap). One shuffle on a 32-byte key; text never shuffles."""
    (docs,) = _t(spark, sf_dir, "documents")
    from amundsendatabuilder_spark.functions.text import fingerprint_md5
    return (
        docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


_SHINGLES_SQL = r"""
t AS (SELECT doc_id, """ + _TOKS_SQL + r""" AS toks FROM documents),
s AS (SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM t))
"""


def _minhash_bands_cte(num_hashes: int = 16, bands: int = 4) -> str:
    # mirror dedup.minhash_signatures: ONE md5 per shingle -> four 32-bit
    # chunks; hash j = (chunk_{j%4} * A_j + B_j) mod 2^32 with the exact
    # constants from functions.hashing.minhash_constants; band b = hashes
    # [b*rpb, (b+1)*rpb). Returns the WITH-body through the ``bands``
    # CTE — (doc_id, band, band_sig) — shared by the batch LSH oracle and
    # the streaming near-dup oracle.
    from amundsendatabuilder_spark.functions.hashing import minhash_constants
    a_tab, b_tab = minhash_constants(num_hashes)
    chunks = ",\n             ".join(
        f"CAST('0x' || substr(md5(shingle), {i * 8 + 1}, 8) AS BIGINT) AS c{i}"
        for i in range(4))
    mins = ",\n              ".join(
        f"min((c{j % 4} * {a_tab[j]} + {b_tab[j]}) % 4294967296) AS mh{j}"
        for j in range(num_hashes))
    rpb = num_hashes // bands
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, CAST({b} AS INT) AS band, "
        + " || '|' || ".join(f"CAST(mh{j} AS VARCHAR)"
                             for j in range(b * rpb, (b + 1) * rpb))
        + " AS band_sig FROM mh"
        for b in range(bands))
    return f"""{_SHINGLES_SQL},
hx AS (SELECT doc_id,
             {chunks}
       FROM s),
mh AS (SELECT doc_id,
              {mins}
       FROM hx GROUP BY doc_id),
bands AS (
{band_selects}
)"""


def _minhash_sql(num_hashes: int = 16, bands: int = 4) -> str:
    return f"""
WITH {_minhash_bands_cte(num_hashes, bands)}
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
"""


@query("dedup_minhash_lsh", _minhash_sql())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup candidates: word-3-gram shingles -> 16
    universal-hash min-hashes from ONE md5 each -> 4 bands x 4 rows ->
    bucket self-join. Only
    (doc_id, band_sig) pairs shuffle — never document text; this is the
    100 TB-scale dedup path (Broder resemblance + banding)."""
    (docs,) = _t(spark, sf_dir, "documents")
    # default max_bucket_size=1000 engaged: the fixture's largest band
    # bucket is far below it (max shingle DF is 7), so the guard provably
    # drops nothing — the SQL twin has no cap
    return dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4,
                                   shingle_size=3)


@query("dedup_incremental_lsh", f"""
WITH {_minhash_bands_cte(16, 4)}
SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_sig = b.band_sig
WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
""")
def dedup_incremental_lsh(spark, sf_dir):
    """Batch-vs-corpus LSH (dedup.minhash_lsh_incremental): every 10th
    document plays the arriving daily batch, the rest the standing
    corpus; candidates pair new×corpus only — never corpus×corpus (paid
    when those docs arrived) or new×new (the batch's own pairs run).
    Signatures are per-doc pure, so the twin bands the WHOLE table once
    and splits by the same residue predicate — a hash match proves the
    split-signature pipeline equals banding the union. The corpus-side
    max_bucket_size guard is engaged but provably a no-op on this
    fixture (max band bucket ≪ 1000), mirroring dedup_minhash_lsh."""
    from amundsendatabuilder_spark.operators import dedup
    (docs,) = _t(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)
    return dedup.minhash_lsh_incremental(new, corpus, num_hashes=16,
                                         bands=4, shingle_size=3)


_SIMHASH_SIG_SQL = r"""tok AS (SELECT doc_id,
                    unnest(""" + _TOKS_SQL + r""") AS tok
             FROM documents),
h AS (SELECT doc_id, substr(md5(tok), 1, 4) AS h FROM tok),
bs AS (SELECT doc_id, h, unnest(range(0, 16)) AS bit FROM h),
votes AS (SELECT doc_id, bit,
                 sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(bit // 4 AS INT) + 1, 1)) - 1)
                                >> CAST(3 - bit % 4 AS INT)) & 1 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM bs GROUP BY doc_id, bit),
sig AS (SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN 1 << CAST(15 - bit AS INT) ELSE 0 END) AS BIGINT)
                   AS simhash
        FROM votes GROUP BY doc_id)"""


def _simhash_sig_sql(src: str = "documents") -> str:
    """_SIMHASH_SIG_SQL with the source relation swapped — the capped
    twin replays the signature pass over the exact-text-collapsed
    ``cdocs`` instead of raw documents."""
    return _SIMHASH_SIG_SQL.replace("FROM documents)", f"FROM {src})", 1)


@query("dedup_simhash", "WITH " + _SIMHASH_SIG_SQL + r"""
SELECT simhash, count(*) AS bucket_size, min(doc_id) AS keep_id
FROM sig GROUP BY simhash HAVING count(*) > 1
""")
def dedup_simhash(spark, sf_dir):
    """SimHash (Charikar) duplicate buckets: 16-bit signatures from
    md5-nibble bit votes, identical-signature grouping. Explode+groupBy
    only — map-side combinable, no UDF."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_buckets(docs, bits=16)


@query("dedup_simhash_hamming", "WITH " + _SIMHASH_SIG_SQL + r"""
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
""")
def dedup_simhash_hamming(spark, sf_dir):
    """SimHash pairs within Hamming distance ≤ 1 via the production
    block-bucketing scheme (Manku WWW'07): k+1 signature blocks, pigeonhole
    guarantees any ≤k pair shares a block exactly; verify with
    bit_count(XOR). The oracle twin is the ALL-PAIRS Hamming SQL, so a
    hash match proves the block scheme loses no pairs. This is the k>0
    bucketing dedup_simhash's docstring promises (k=0 = identical sigs)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(docs, bits=16, k=1)


@query("dedup_simhash64_hamming", r"""
WITH tok AS (SELECT doc_id, unnest(""" + _TOKS_SQL + r""") AS tok
             FROM documents),
h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok),
bs AS (SELECT doc_id, h, unnest(range(0, 64)) AS bit FROM h),
votes AS (SELECT doc_id, bit,
                 sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(bit // 4 AS INT) + 1, 1)) - 1)
                                >> CAST(3 - bit % 4 AS INT)) & 1 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM bs GROUP BY doc_id, bit),
sigs AS (SELECT doc_id, CAST(bit // 16 AS INT) AS w,
                CAST(sum(CASE WHEN v > 0 THEN 1 << CAST(15 - bit % 16 AS INT)
                              ELSE 0 END) AS BIGINT) AS word
         FROM votes GROUP BY doc_id, bit // 16),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM sigs a JOIN sigs b
           ON a.w = b.w AND a.word = b.word AND a.doc_id < b.doc_id),
ham AS (SELECT c.doc_a, c.doc_b,
               CAST(sum(bit_count(xor(x.word, y.word))) AS INT) AS hamming
        FROM cand c JOIN sigs x ON x.doc_id = c.doc_a
                    JOIN sigs y ON y.doc_id = c.doc_b AND y.w = x.w
        GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
""")
def dedup_simhash64_hamming(spark, sf_dir):
    """PRODUCTION-width SimHash near-dup (dedup.simhash_hamming_pairs_wide):
    64-bit signatures as four positive 16-bit words that double as the
    Manku pigeonhole blocks (k=3), verified by summed per-word
    bit_count(XOR). This is the configuration the 16-bit entry's sizing
    rule prescribes — the headroom run measured 16-bit signatures
    saturating at 50k docs while this space stays discriminative to
    billions. The oracle replays words, block-bucket candidates and the
    Hamming verify in SQL, so the pair set is hash-pinned end-to-end."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs_wide(docs, bits=64, k=3)


_NGRAM_JACCARD_SQL = r"""
WITH """ + _SHINGLES_SQL + r""",
sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
          FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
FROM inter JOIN sz sa ON doc_a = sa.doc_id JOIN sz sb ON doc_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.6
"""


@query("dedup_ngram_jaccard", _NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs >= 0.6 via inverted-index self-join —
    the verification stage behind MinHash candidates (at scale, run on
    LSH candidates only; shingle-join form shown for the oracle)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.6)


@query("dedup_ngram_jaccard_capped", _NGRAM_JACCARD_SQL)
def dedup_ngram_jaccard_capped(spark, sf_dir):
    """Same Jaccard pairs with the max_df boilerplate-shingle guard
    engaged (document frequency > 50 shingles dropped pre-join — the cap
    that keeps a stopword shingle from going quadratic at corpus scale).
    The fixture's max shingle DF is 7, so capped == uncapped: the oracle
    twin is the UNCAPPED SQL, proving the guard costs no recall here."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, shingle_size=3, threshold=0.6,
                                     max_df=50)


@query("dedup_embedding_cosine", r"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id % 5 = 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
""")
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the explicit all_pairs=True
    escape hatch on a small subset (the default path is RHP-bucketed; see
    dedup_embedding_cosine_bucketed)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_duplicates(
        emb.where(F.col("vec_id") % 5 == 0), threshold=0.30, all_pairs=True)


def _rhp_sigs_cte(planes: list[list[float]], bands: int, src: str = "e",
                  bits: str = "bits", sigs: str = "sigs") -> str:
    """``bits AS (...), sigs AS (...)`` CTE text reproducing
    similarity.rhp_band_sigs over a prior CTE ``src(vec_id, v)`` — planes
    baked in as exact double literals (repr round-trip), band g's
    signature = its planes' sign bits concatenated. Shared by the
    embedding near-dup replay oracles; ``src``/``bits``/``sigs`` name
    overrides let one oracle carry two signature sets (the banded
    hard-negative/decontam twins sig both sides)."""
    per_band = len(planes) // bands

    def lit(p):
        return "CAST([" + ",".join(repr(x) for x in p) + "] AS DOUBLE[])"

    bit = [f"CASE WHEN list_dot_product(v, {lit(p)}) >= 0 "
           "THEN '1' ELSE '0' END" for p in planes]
    band_cols = ",\n       ".join(
        "concat(" + ", ".join(bit[g * per_band:(g + 1) * per_band]) + f") AS s{g}"
        for g in range(bands))
    union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {g} AS band, s{g} AS sig FROM {bits}"
        for g in range(bands))
    return f"""{bits} AS (SELECT vec_id, v,
       {band_cols}
       FROM {src}),
{sigs} AS (
  {union})"""


def _embedding_bucketed_oracle(threshold: float = 0.40, bands: int = 4,
                               recursive: bool = False) -> str:
    """Replay oracle for the DEFAULT (scale-banded) embedding near-dup
    path: same seeded planes, same banding, candidate join on shared band
    signatures, exact-cosine verify — so the hash pins the bucketed
    result itself. With ``recursive=True``, appends the transitive-closure
    CC over the replayed pairs (for the clusters entry)."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 16, seed=7)
    head = "WITH RECURSIVE" if recursive else "WITH"
    base = f"""{head} e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_rhp_sigs_cte(planes, bands)},
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM sigs x JOIN sigs y
           ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id),
pairs AS (SELECT id_a, id_b,
                 round(list_cosine_similarity(a.v, b.v), 6) AS cos
          FROM cand JOIN e a ON a.vec_id = cand.id_a
                    JOIN e b ON b.vec_id = cand.id_b
          WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold})"""
    if not recursive:
        return base + "\nSELECT id_a, id_b, cos FROM pairs"
    return base + """,
sym AS (SELECT id_a AS a, id_b AS b FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
          WHERE s.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a)
SELECT component AS keeper, CAST(count(*) AS BIGINT) AS n_vectors,
       array_to_string(list_sort(list(node)), ',') AS members
FROM comp GROUP BY component"""


@query("dedup_embedding_cosine_bucketed", _embedding_bucketed_oracle())
def dedup_embedding_cosine_bucketed(spark, sf_dir):
    """The DEFAULT (scale) embedding near-dup path: random-hyperplane band
    signatures bucket both sides (16 seeded planes, 4 per band — 4-bit
    signatures bound bucket sizes, the property that keeps candidate
    volume sub-quadratic at corpus scale), exact cosine verified on
    candidates only. Hash-verified against a DuckDB replay of the same
    planes/banding/verify, pinning the bucketed result itself; the
    bucketed==all-pairs recall proof lives in
    dedup_embedding_exhaustive_recall (the explicitly-quadratic
    verification configuration). At scale only (id, band, sig) rows
    shuffle; vectors join back just for the surviving candidates."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_duplicates(emb, threshold=0.40, dim=64)


@query("dedup_embedding_exhaustive_recall", r"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.4
""")
def dedup_embedding_exhaustive_recall(spark, sf_dir):
    """Recall proof for the banding machinery: with ``bands=len(planes)``
    (1-bit bands, the documented exhaustive-verification override — O(n²/2)
    candidates by construction, NEVER the scale path) the bucketed
    pipeline must reproduce the ALL-PAIRS SQL exactly at threshold 0.4.
    Pins that the bucket/verify mechanics lose nothing; the scale-banded
    default is pinned separately by its replay oracle."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_duplicates(emb, threshold=0.40, dim=64,
                                           bands=16)


# ---------------------------------------------------------------------------
# 7. Training-data pipeline: similarity search
# ---------------------------------------------------------------------------

@query("ann_brute_force_topk", r"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
sc AS (SELECT query_id, neighbor_id,
              round(list_cosine_similarity(qv, cv), 6) AS cos
       FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sc)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10
""")
def ann_brute_force_topk(spark, sf_dir):
    """Exact cosine top-k baseline: broadcast query set x partitioned
    corpus scan, per-partition top-k window keeps the shuffle at k rows
    per query. Rank ordered by (rounded cos, id) for cross-engine tie
    stability. IVF variant: operators/similarity.ivf_topk (weaker
    rows-only check — recall is probe-dependent)."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    return similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") < 8), k=10)


@query("embedding_norms", r"""
SELECT label, count(*) AS n_vectors,
       round(avg(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x)))), 4)
           AS avg_norm
FROM embeddings GROUP BY label
""")
def embedding_norms(spark, sf_dir):
    """Per-cluster embedding stats via higher-order functions (ordered
    fold => deterministic double sums), the norm/normalize primitive under
    all vector operators."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from amundsendatabuilder_spark.functions.vectors import l2_norm
    return (
        emb.groupBy("label")
        .agg(F.count("*").alias("n_vectors"),
             round_half_away(F.avg(l2_norm("embedding")), 4).alias("avg_norm"))
    )


# ---------------------------------------------------------------------------
# 8. Batch 2: remaining operator surfaces
# ---------------------------------------------------------------------------

@query("presto_view_decode", r"""
WITH v AS (
  SELECT p_partkey,
         '/* Presto View: ' ||
         to_base64(encode('{"columns":[{"name":"c","type":"' || p_brand || '"}]}'))
         || ' */' AS view_original_text
  FROM part WHERE p_partkey % 20 = 0)
SELECT p_partkey,
       json_extract_string(decode(from_base64(
           regexp_extract(view_original_text, '/\* Presto View: ([^*]+) \*/', 1))),
           '$.columns[0].name') AS col_name,
       json_extract_string(decode(from_base64(
           regexp_extract(view_original_text, '/\* Presto View: ([^*]+) \*/', 1))),
           '$.columns[0].type') AS col_type
FROM v
""")
def presto_view_decode(spark, sf_dir):
    """Presto view definition decode (reference:
    extractor/presto_view_metadata_extractor.py:92-115): the base64-JSON
    payload is built in-query from part rows (kept <57 bytes — Spark's
    base64 MIME-wraps at 76 encoded chars), then unbase64 + from_json
    recovers the columns. No UDF anywhere."""
    from amundsendatabuilder_spark.functions.scalars import decode_presto_view
    (part,) = _t(spark, sf_dir, "part")
    v = (part.where(F.col("p_partkey") % 20 == 0)
         .select("p_partkey",
                 F.concat(F.lit("/* Presto View: "),
                          F.base64(F.concat(
                              F.lit('{"columns":[{"name":"c","type":"'),
                              F.col("p_brand"), F.lit('"}]}')).cast("binary")),
                          F.lit(" */")).alias("view_original_text")))
    cols = decode_presto_view(F.col("view_original_text"))
    return v.select("p_partkey",
                    cols[0]["name"].alias("col_name"),
                    cols[0]["type"].alias("col_type"))


@query("shard_watermarks", r"""
WITH t AS (SELECT DISTINCT 'events_' || strftime(ts, '%Y%m%d') AS name FROM events),
e AS (SELECT regexp_extract(name, '^(.+)_(\d{8})$', 1) AS table_prefix,
             regexp_extract(name, '^(.+)_(\d{8})$', 2) AS suffix
      FROM t WHERE regexp_extract(name, '^(.+)_(\d{8})$', 2) <> ''),
agg AS (SELECT table_prefix, min(suffix) AS lo, max(suffix) AS hi
        FROM e GROUP BY table_prefix)
SELECT table_prefix, 'low_watermark' AS part_type, lo AS part_value FROM agg
UNION ALL
SELECT table_prefix, 'high_watermark' AS part_type, hi AS part_value FROM agg
""")
def shard_watermarks_query(spark, sf_dir):
    """BigQuery sharded-table watermark extraction (reference:
    bigquery_watermark_extractor.py:48-63) driven through
    sources/bigquery.shard_watermarks on shard names synthesized from
    event dates."""
    from amundsendatabuilder_spark.sources.bigquery import shard_watermarks
    (events,) = _t(spark, sf_dir, "events")
    tables = events.select(
        F.concat(F.lit("events_"),
                 F.date_format("ts", "yyyyMMdd")).alias("name")).distinct()
    return shard_watermarks(tables)


@query("sharded_table_grouping", r"""
WITH t AS (
  SELECT 'orders_' || strftime(o_orderdate, '%Y%m%d') AS name, count(*) AS n
  FROM orders GROUP BY 1
  UNION ALL
  SELECT p_brand AS name, count(*) AS n FROM part GROUP BY 1),
e AS (SELECT name, n,
             CASE WHEN regexp_extract(name, '^(.+)_(\d{8})$', 1) <> ''
                  THEN regexp_extract(name, '^(.+)_(\d{8})$', 1) ELSE name END AS prefix,
             nullif(regexp_extract(name, '^(.+)_(\d{8})$', 2), '') AS suffix
      FROM t),
r AS (SELECT prefix AS name, n,
             row_number() OVER (PARTITION BY prefix
                                ORDER BY suffix DESC NULLS LAST, name) AS rn
      FROM e)
SELECT name, n FROM r WHERE rn = 1
""")
def sharded_table_grouping(spark, sf_dir):
    """Date-sharded table collapse (reference:
    bigquery_metadata_extractor.py:44-57): '…_YYYYMMDD' names group to one
    logical table keeping the latest shard's row — via
    sources/bigquery.group_sharded_tables."""
    from amundsendatabuilder_spark.sources.bigquery import group_sharded_tables
    orders, part = _t(spark, sf_dir, "orders", "part")
    t = (orders.groupBy(F.concat(F.lit("orders_"),
                                 F.date_format("o_orderdate", "yyyyMMdd"))
                        .alias("name")).agg(F.count("*").alias("n"))
         .unionByName(part.groupBy(F.col("p_brand").alias("name"))
                      .agg(F.count("*").alias("n"))))
    return group_sharded_tables(t)


@query("top_customer_per_segment", """
SELECT c_mktsegment, c_custkey, c_name, c_acctbal FROM (
  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer) WHERE rn = 1
""")
def top_customer_per_segment(spark, sf_dir):
    """Top-1-per-group (the reference's first-match pattern generalized,
    mysql_search_data_extractor.py:284-286): deterministic argmax via
    window with id tie-break."""
    (customer,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (customer.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("c_mktsegment", "c_custkey", "c_name", "c_acctbal"))


@query("rollup_orders", """
SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def rollup_orders(spark, sf_dir):
    """ROLLUP subtotal hierarchy — beyond the reference's surface (SURVEY
    §2.4 notes it has no grouping sets) but table-stakes for an analytics
    engine; NULL grouping markers match ANSI."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (orders.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 round_half_away(F.sum("o_totalprice"), 2).alias("total_price")))


@query("revenue_share", """
WITH rev AS (
  SELECT n_name, round(sum(o_totalprice), 2) AS revenue
  FROM orders JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name)
SELECT n_name, revenue,
       round(revenue / (SELECT sum(revenue) FROM rev), 6) AS share
FROM rev
""")
def revenue_share(spark, sf_dir):
    """Scalar-subquery normalization (share-of-total): grand total via an
    empty window so the plan stays one pass + broadcast-exchange of a
    single row."""
    orders, customer, nation = _t(spark, sf_dir, "orders", "customer", "nation")
    rev = (orders
           .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
           .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
           .groupBy("n_name")
           .agg(round_half_away(F.sum("o_totalprice"), 2).alias("revenue")))
    total = Window.partitionBy()
    return rev.select(
        "n_name", "revenue",
        round_half_away(F.col("revenue") / F.sum("revenue").over(total), 6)
        .alias("share"))


@query("char_ngram_profile", r"""
WITH n AS (
  SELECT lang, substr(text, i, 3) AS ngram
  FROM (SELECT lang, text, unnest(range(1, length(text) - 1)) AS i FROM documents)),
c AS (SELECT lang, ngram, count(*) AS n FROM n GROUP BY lang, ngram),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY lang
                                        ORDER BY n DESC, ngram) AS INT) AS rank
      FROM c)
SELECT lang, ngram, n, rank FROM r WHERE rank <= 5
""")
def char_ngram_profile(spark, sf_dir):
    """Character-n-gram language profile (the feature family behind real
    language-ID): top-5 trigrams per language, deterministic tie-break."""
    from amundsendatabuilder_spark.functions.text import char_ngrams
    (docs,) = _t(spark, sf_dir, "documents")
    grams = (docs.select("lang", F.explode(char_ngrams(F.col("text"), 3))
                         .alias("ngram"))
             .groupBy("lang", "ngram").agg(F.count("*").alias("n")))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("ngram"))
    return (grams.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5))


def _lsh_verified_sql(num_hashes: int = 16, bands: int = 4,
                      threshold: float = 0.7) -> str:
    # minhash candidate CTEs (same universal-hash construction as
    # _minhash_sql) + exact jaccard verification restricted to candidates
    from amundsendatabuilder_spark.functions.hashing import minhash_constants
    a_tab, b_tab = minhash_constants(num_hashes)
    chunks = ",\n             ".join(
        f"CAST('0x' || substr(md5(shingle), {i * 8 + 1}, 8) AS BIGINT) AS c{i}"
        for i in range(4))
    mins = ",\n              ".join(
        f"min((c{j % 4} * {a_tab[j]} + {b_tab[j]}) % 4294967296) AS mh{j}"
        for j in range(num_hashes))
    rpb = num_hashes // bands
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, "
        + " || '|' || ".join(f"CAST(mh{j} AS VARCHAR)"
                             for j in range(b * rpb, (b + 1) * rpb))
        + " AS band_sig FROM mh"
        for b in range(bands))
    return f"""
WITH {_SHINGLES_SQL},
hx AS (SELECT doc_id,
             {chunks}
       FROM s),
mh AS (SELECT doc_id,
              {mins}
       FROM hx GROUP BY doc_id),
bands AS (
{band_selects}
),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id),
sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id),
inter AS (SELECT sa.doc_id AS doc_a, sb.doc_id AS doc_b, count(*) AS i
          FROM s sa JOIN s sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
          JOIN cand ON cand.doc_a = sa.doc_id AND cand.doc_b = sb.doc_id
          GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i), 6) AS jaccard
FROM inter i JOIN sz za ON i.doc_a = za.doc_id JOIN sz zb ON i.doc_b = zb.doc_id
WHERE CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) >= {threshold}
"""


@query("dedup_lsh_verified", _lsh_verified_sql())
def dedup_lsh_verified(spark, sf_dir):
    """The two-stage scale dedup pipeline: MinHash-LSH candidate
    generation THEN exact Jaccard verification restricted to candidates —
    at 100 TB the verify join touches only candidate pairs, never all
    pairs."""
    from amundsendatabuilder_spark.operators.dedup import lsh_verified_pairs
    (docs,) = _t(spark, sf_dir, "documents")
    return lsh_verified_pairs(docs, threshold=0.7)


@query("search_doc_user", """
WITH users AS (
  SELECT 'u' || CAST(c_custkey AS VARCHAR) AS email,
         c_mktsegment AS first_name, c_name AS last_name, c_name AS full_name,
         'gh' || CAST(c_custkey AS VARCHAR) AS github_username,
         c_mktsegment AS team_name,
         'fte' AS employee_type,
         'u' || CAST((c_custkey % 150) + 1 AS VARCHAR) AS manager_email,
         '@u' || CAST(c_custkey AS VARCHAR) AS slack_id,
         (c_custkey % 7) <> 0 AS is_active, 'analyst' AS role_name
  FROM customer WHERE c_custkey <= 150),
reads AS (SELECT 'u' || CAST(user_id + 1 AS VARCHAR) AS email,
                 CAST(count(*) AS BIGINT) AS total_read
          FROM events GROUP BY 1),
own AS (SELECT 'u' || CAST(o_custkey AS VARCHAR) AS email,
               CAST(count(DISTINCT o_orderkey) AS BIGINT) AS total_own
        FROM orders WHERE o_custkey <= 150 GROUP BY 1),
follow AS (SELECT 'u' || CAST(user_id + 1 AS VARCHAR) AS email,
                  CAST(count(DISTINCT event_type) AS BIGINT) AS total_follow
           FROM events GROUP BY 1)
SELECT u.email, first_name, last_name, full_name, github_username, team_name,
       employee_type, manager_email, slack_id, is_active, role_name,
       coalesce(r.total_read, 0) AS total_read,
       coalesce(o.total_own, 0) AS total_own,
       coalesce(f.total_follow, 0) AS total_follow
FROM users u LEFT JOIN reads r ON u.email = r.email
             LEFT JOIN own o ON u.email = o.email
             LEFT JOIN follow f ON u.email = f.email
""")
def search_doc_user(spark, sf_dir):
    """User search documents (reference:
    extractor/neo4j_search_data_extractor.py:64-83; 6-grouped-subquery SQL
    twin mysql_search_data_extractor.py:320-390) through
    plans.search_documents.build_user_documents. Users mapped onto
    customers, read events onto table usage, orders onto table ownership;
    manager_email exercises the self-referential edge (models/user.py:207-212).
    total_own = COUNT(DISTINCT OWNER_OF) over (user, order) pairs;
    total_follow = COUNT(DISTINCT FOLLOWED_BY) over (user, event_type)
    pairs — the reference's count(distinct b)/count(distinct c)
    (neo4j_search_data_extractor.py:80-82). Full document field parity:
    ``full_name`` keeps the reference's name and ``is_active``
    (user.is_active, :77) is exercised with both truth values via
    c_custkey % 7."""
    from amundsendatabuilder_spark.plans.search_documents import build_user_documents
    customer, orders, events = _t(spark, sf_dir, "customer", "orders", "events")
    users = customer.where(F.col("c_custkey") <= 150).select(
        F.concat(F.lit("u"), F.col("c_custkey").cast("string")).alias("email"),
        F.col("c_mktsegment").alias("first_name"),
        F.col("c_name").alias("last_name"),
        F.col("c_name").alias("full_name"),
        F.concat(F.lit("gh"), F.col("c_custkey").cast("string")).alias("github_username"),
        F.col("c_mktsegment").alias("team_name"),
        F.lit("fte").alias("employee_type"),
        F.concat(F.lit("u"),
                 ((F.col("c_custkey") % 150) + 1).cast("string")).alias("manager_email"),
        F.concat(F.lit("@u"), F.col("c_custkey").cast("string")).alias("slack_id"),
        ((F.col("c_custkey") % 7) != 0).alias("is_active"),
        F.lit("analyst").alias("role_name"))
    usage = events.select(
        F.concat(F.lit("u"), (F.col("user_id") + 1).cast("string")).alias("user_email"),
        F.lit(1).cast("long").alias("read_count"),
        F.lit("app").alias("database"), F.lit("prod").alias("cluster"),
        F.lit("events").alias("schema"), F.col("event_type").alias("table_name"))
    owned = orders.where(F.col("o_custkey") <= 150).select(
        F.concat(F.lit("u"), F.col("o_custkey").cast("string")).alias("email"),
        F.col("o_orderkey").cast("string").alias("table_key"))
    followed = events.select(
        F.concat(F.lit("u"), (F.col("user_id") + 1).cast("string")).alias("email"),
        F.col("event_type").alias("entity_key"))
    return build_user_documents(users, usage, owned, followed)


@query("search_doc_dashboard", r"""
WITH d AS (
  SELECT p_partkey,
         'g' || CAST(p_partkey % 10 AS VARCHAR) AS gid,
         CAST(p_partkey AS VARCHAR) AS did,
         'group ' || CAST(p_partkey % 10 AS VARCHAR) AS group_name,
         p_name AS name, p_type AS description,
         'about group ' || CAST(p_partkey % 10 AS VARCHAR) AS group_description,
         'https://app/g' || CAST(p_partkey % 10 AS VARCHAR) AS group_url,
         'https://app/d/' || CAST(p_partkey AS VARCHAR) AS url
  FROM part),
u AS (SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_usage
      FROM lineitem GROUP BY 1),
q AS (SELECT l_partkey,
             array_to_string(list_sort(list(DISTINCT 'q' || CAST(l_linenumber AS VARCHAR))), ',')
                 AS query_names
      FROM lineitem GROUP BY 1),
c AS (SELECT l_partkey,
             array_to_string(list_sort(list(DISTINCT 'c' || CAST(l_suppkey % 5 AS VARCHAR))), ',')
                 AS chart_names
      FROM lineitem GROUP BY 1),
tg AS (SELECT l_partkey,
              array_to_string(list_sort(list(DISTINCT 'tag' || CAST(l_linenumber % 3 AS VARCHAR))), ',')
                  AS tags
       FROM lineitem WHERE l_linenumber % 2 = 0 GROUP BY 1),
b AS (SELECT l_partkey,
             array_to_string(list_sort(list(DISTINCT 'b' || l_returnflag)), ',') AS badges
      FROM lineitem GROUP BY 1),
e AS (SELECT l_partkey,
             CAST(floor(epoch(max(l_shipdate))) AS BIGINT) AS last_successful_run_timestamp
      FROM lineitem GROUP BY 1)
SELECT 'mode_dashboard://gold.' || gid || '/' || d.did AS key,
       'mode' AS product, 'gold' AS cluster,
       group_name, name, description, group_description, group_url, url,
       'mode_dashboard://gold.' || gid || '/' || d.did AS uri,
       coalesce(u.total_usage, 0) AS total_usage,
       coalesce(q.query_names, '') AS query_names,
       coalesce(c.chart_names, '') AS chart_names,
       coalesce(tg.tags, '') AS tags,
       coalesce(b.badges, '') AS badges,
       e.last_successful_run_timestamp
FROM d LEFT JOIN u ON d.p_partkey = u.l_partkey
       LEFT JOIN q ON d.p_partkey = q.l_partkey
       LEFT JOIN c ON d.p_partkey = c.l_partkey
       LEFT JOIN tg ON d.p_partkey = tg.l_partkey
       LEFT JOIN b ON d.p_partkey = b.l_partkey
       LEFT JOIN e ON d.p_partkey = e.l_partkey
""")
def search_doc_dashboard(spark, sf_dir):
    """Dashboard search documents (reference:
    extractor/neo4j_search_data_extractor.py:85-115, incl. the
    '_last_successful_execution' first-match rule at
    mysql_search_data_extractor.py:284-286) through
    build_dashboard_documents. Full reference field parity
    (models/dashboard_elasticsearch_document.py:16-47): chart_names via
    the HAS_QUERY->HAS_CHART hop (:97-99), tags with the
    tag_type='default' filter (:101-103), badges (:104-106),
    group_description and uri (:107-115). Dashboards mapped onto parts,
    usage/queries/charts/tags/badges/executions onto their lineitems;
    array columns re-emitted as sorted joined strings because engine
    array hashing differs."""
    from amundsendatabuilder_spark.plans.search_documents import (
        build_dashboard_documents)
    part, li = _t(spark, sf_dir, "part", "lineitem")
    pgid = F.concat(F.lit("g"), (F.col("p_partkey") % 10).cast("string"))
    dashboards = part.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        pgid.alias("dashboard_group_id"),
        F.col("p_partkey").cast("string").alias("dashboard_id"),
        F.concat(F.lit("group "), (F.col("p_partkey") % 10).cast("string"))
        .alias("dashboard_group"),
        F.col("p_name").alias("dashboard_name"),
        F.col("p_type").alias("description"),
        F.concat(F.lit("about group "), (F.col("p_partkey") % 10).cast("string"))
        .alias("dashboard_group_description"),
        F.concat(F.lit("https://app/g"), (F.col("p_partkey") % 10).cast("string"))
        .alias("dashboard_group_url"),
        F.concat(F.lit("https://app/d/"), F.col("p_partkey").cast("string"))
        .alias("dashboard_url"))
    lgid = F.concat(F.lit("g"), (F.col("l_partkey") % 10).cast("string"))
    usage = li.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        lgid.alias("dashboard_group_id"),
        F.col("l_partkey").cast("string").alias("dashboard_id"),
        F.col("l_quantity").cast("long").alias("view_count"))
    queries_df = li.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        lgid.alias("dashboard_group_id"),
        F.col("l_partkey").cast("string").alias("dashboard_id"),
        F.concat(F.lit("q"), F.col("l_linenumber").cast("string")).alias("query_name"))
    charts_df = li.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        lgid.alias("dashboard_group_id"),
        F.col("l_partkey").cast("string").alias("dashboard_id"),
        F.concat(F.lit("c"), (F.col("l_suppkey") % 5).cast("string"))
        .alias("chart_name"))
    tags_df = li.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        lgid.alias("dashboard_group_id"),
        F.col("l_partkey").cast("string").alias("dashboard_id"),
        F.concat(F.lit("tag"), (F.col("l_linenumber") % 3).cast("string"))
        .alias("tag"),
        # odd linenumbers carry a non-default tag_type: exercises the
        # reference's WHERE tags.tag_type='default' filter
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("default"))
        .otherwise(F.lit("badge")).alias("tag_type"))
    badges_df = li.select(
        F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
        lgid.alias("dashboard_group_id"),
        F.col("l_partkey").cast("string").alias("dashboard_id"),
        F.concat(F.lit("b"), F.col("l_returnflag")).alias("badge"))
    last_exec = (
        li.groupBy("l_partkey")
        .agg(F.max(F.unix_timestamp("l_shipdate")).alias("execution_timestamp"))
        .select(F.lit("mode").alias("product"), F.lit("gold").alias("cluster"),
                F.concat(F.lit("g"), (F.col("l_partkey") % 10).cast("string"))
                .alias("dashboard_group_id"),
                F.col("l_partkey").cast("string").alias("dashboard_id"),
                F.lit("_last_successful_execution").alias("execution_id"),
                "execution_timestamp"))
    docs = build_dashboard_documents(dashboards, usage, queries_df, last_exec,
                                     charts=charts_df, tags=tags_df,
                                     badges=badges_df)
    return (docs
            .withColumn("query_names", F.concat_ws(",", "query_names"))
            .withColumn("chart_names", F.concat_ws(",", "chart_names"))
            .withColumn("tags", F.concat_ws(",", "tags"))
            .withColumn("badges", F.concat_ws(",", "badges")))


@query("graph_expand_tables", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) AS schema_key,
         'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS table_key,
         'tier' || CAST(s_suppkey % 3 AS VARCHAR) AS tier_tag
  FROM supplier),
descs AS (SELECT table_key || '/_description' AS k FROM t
          UNION ALL SELECT table_key || '/c1/_description' FROM t),
tags AS (SELECT 'rated' AS g FROM t UNION ALL SELECT tier_tag FROM t),
cols AS (SELECT table_key || '/c1' AS k FROM t
         UNION ALL SELECT table_key || '/c2' FROM t),
desc_rels AS (SELECT table_key || '>' || table_key || '/_description' AS k FROM t
              UNION ALL SELECT table_key || '/c1>' || table_key || '/c1/_description' FROM t),
tag_rels AS (SELECT table_key || '>rated' AS k FROM t
             UNION ALL SELECT table_key || '>' || tier_tag FROM t),
col_rels AS (SELECT table_key || '>' || table_key || '/c1' AS k FROM t
             UNION ALL SELECT table_key || '>' || table_key || '/c2' FROM t)
SELECT 'node' AS kind, 'Table' AS entity, CAST(count(*) AS BIGINT) AS n,
       min(table_key) AS min_key, max(table_key) AS max_key FROM t
UNION ALL SELECT 'node', 'Database', 1, 'database://tpch', 'database://tpch'
UNION ALL SELECT 'node', 'Cluster', 1, 'tpch://gold', 'tpch://gold'
UNION ALL SELECT 'node', 'Schema', CAST(count(DISTINCT schema_key) AS BIGINT),
          min(schema_key), max(schema_key) FROM t
UNION ALL SELECT 'node', 'Description', CAST(count(DISTINCT k) AS BIGINT),
          min(k), max(k) FROM descs
UNION ALL SELECT 'node', 'Tag', CAST(count(DISTINCT g) AS BIGINT),
          min(g), max(g) FROM tags
UNION ALL SELECT 'node', 'Column', CAST(count(DISTINCT k) AS BIGINT),
          min(k), max(k) FROM cols
UNION ALL SELECT 'node', 'Badge', 1, 'pk', 'pk'
UNION ALL SELECT 'rel', 'CLUSTER', 1,
          'database://tpch>tpch://gold', 'database://tpch>tpch://gold'
UNION ALL SELECT 'rel', 'SCHEMA', CAST(count(DISTINCT schema_key) AS BIGINT),
          min('tpch://gold>' || schema_key), max('tpch://gold>' || schema_key) FROM t
UNION ALL SELECT 'rel', 'TABLE', CAST(count(*) AS BIGINT),
          min(schema_key || '>' || table_key), max(schema_key || '>' || table_key) FROM t
UNION ALL SELECT 'rel', 'DESCRIPTION', CAST(count(DISTINCT k) AS BIGINT),
          min(k), max(k) FROM desc_rels
UNION ALL SELECT 'rel', 'TAGGED_BY', CAST(count(DISTINCT k) AS BIGINT),
          min(k), max(k) FROM tag_rels
UNION ALL SELECT 'rel', 'COLUMN', CAST(count(DISTINCT k) AS BIGINT),
          min(k), max(k) FROM col_rels
UNION ALL SELECT 'rel', 'HAS_BADGE', CAST(count(*) AS BIGINT),
          min(table_key || '/c1>pk'), max(table_key || '/c1>pk') FROM t
""")
def graph_expand_tables(spark, sf_dir):
    """Graph expansion end-to-end (reference:
    databuilder/models/table_metadata.py:427-598): a TableMetadata DataFrame
    synthesized from suppliers (schemas from nations, two columns, tags,
    badges, descriptions) runs through models.table_metadata.expand_tables;
    the result is summarized per node LABEL / rel TYPE as
    (count, min key, max key) so the oracle verifies expansion cardinality,
    parent dedup (Database/Cluster/Schema/Tag/Badge collapse — SURVEY §7.4)
    and every key template byte-for-byte."""
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    (sup,) = _t(spark, sf_dir, "supplier")
    tables = sup.select(
        F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
        F.concat(F.lit("s"), F.col("s_nationkey").cast("string")).alias("schema"),
        F.col("s_name").alias("name"),
        F.col("s_name").alias("description"),
        F.lit(None).cast("string").alias("description_source"),
        F.array(F.lit("rated"),
                F.concat(F.lit("tier"), (F.col("s_suppkey") % 3).cast("string")))
        .alias("tags"),
        F.lit(False).alias("is_view"),
        F.array(
            F.struct(F.lit("c1").alias("name"),
                     F.col("s_name").alias("description"),
                     F.lit("varchar").alias("col_type"),
                     F.lit(1).alias("sort_order"),
                     F.array(F.lit("pk")).alias("badges")),
            F.struct(F.lit("c2").alias("name"),
                     F.lit(None).cast("string").alias("description"),
                     F.lit("int").alias("col_type"),
                     F.lit(2).alias("sort_order"),
                     F.array().cast("array<string>").alias("badges"))).alias("columns"))
    out = expand_tables(tables)
    nodes = (out.nodes.groupBy(F.col("LABEL").alias("entity"))
             .agg(F.count("*").alias("n"),
                  F.min("KEY").alias("min_key"), F.max("KEY").alias("max_key"))
             .withColumn("kind", F.lit("node")))
    rels = (out.rels.groupBy(F.col("TYPE").alias("entity"))
            .agg(F.count("*").alias("n"),
                 F.min(F.concat_ws(">", "START_KEY", "END_KEY")).alias("min_key"),
                 F.max(F.concat_ws(">", "START_KEY", "END_KEY")).alias("max_key"))
            .withColumn("kind", F.lit("rel")))
    return nodes.unionByName(rels).select("kind", "entity", "n", "min_key", "max_key")


# ---------------------------------------------------------------------------
# 9. Training-data pipeline: scrubbing / filtering / sampling / profiling
# ---------------------------------------------------------------------------

_LTOKS_SQL = r"list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')"


@query("pii_scrub", r"""
WITH d AS (
  SELECT doc_id,
         text || ' contact u' || CAST(doc_id AS VARCHAR)
              || '@example.com or 555' || CAST(1000000 + doc_id AS VARCHAR)
              || ' ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS text
  FROM documents),
s AS (
  SELECT doc_id, text,
         CAST(len(string_split_regex(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) - 1 AS BIGINT)
             AS n_emails,
         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                        '<EMAIL>', 'g') AS t1
  FROM d)
SELECT doc_id,
       md5(regexp_replace(regexp_replace(t1, '[0-9]{7,}', '<NUM>', 'g'),
           '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'))
           AS scrubbed_md5,
       n_emails,
       CAST(len(string_split_regex(t1, '[0-9]{7,}')) - 1 AS BIGINT) AS n_numbers
FROM s
""")
def pii_scrub(spark, sf_dir):
    """PII redaction pass (training-data pipeline): emails, long digit runs,
    IPv4s replaced by typed placeholders with audit counts; synthetic PII is
    appended in-query (the corpus has none) identically on both engines.
    Pure regexp chain — no shuffle, linear scan, the 100 TB scrub shape."""
    (docs,) = _t(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" contact u"), F.col("doc_id").cast("string"),
                 F.lit("@example.com or 555"),
                 (F.col("doc_id") + 1000000).cast("string"),
                 F.lit(" ip 10.0.0."), (F.col("doc_id") % 256).cast("string"))
        .alias("text"))
    return textops.pii_scrub(seeded)


@query("repetition_metrics", r"""
WITH tok AS (SELECT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok FROM documents),
pt AS (SELECT doc_id, tok, count(*) AS n FROM tok GROUP BY 1, 2)
SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_distinct,
       round(1.0 - CAST(count(*) AS DOUBLE) / sum(n), 6) AS dup_token_frac,
       round(CAST(max(n) AS DOUBLE) / sum(n), 6) AS top_token_frac
FROM pt GROUP BY doc_id
""")
def repetition_metrics(spark, sf_dir):
    """Gopher-style repetition filters: per-doc duplicate-token fraction and
    top-token share. Shuffles carry (id, token, count) pairs only — document
    text never crosses the wire."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.repetition_metrics(docs)


@query("hash_sample_stratified", """
SELECT lang, count(*) AS n_total,
       CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                     IN ('0', '1') THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       min(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                IN ('0', '1') THEN doc_id END) AS first_sampled_id
FROM documents GROUP BY lang
""")
def hash_sample_stratified(spark, sf_dir):
    """Deterministic hash-based sampling summarized per language stratum:
    md5-prefix membership selects the same ~12.5% of rows on every run,
    engine and cluster size (rand()-based sampling cannot promise that)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.hash_sample(docs)


@query("vocab_topk", r"""
WITH tok AS (SELECT unnest(""" + _LTOKS_SQL + r""") AS tok FROM documents),
c AS (SELECT tok, count(*) AS n FROM tok GROUP BY 1),
r AS (SELECT tok, n,
             CAST(row_number() OVER (ORDER BY n DESC, tok) AS INT) AS rank
      FROM c)
SELECT tok, n, rank FROM r WHERE rank <= 100
""")
def vocab_topk(spark, sf_dir):
    """Tokenizer-training vocabulary build: global token counts (map-side
    partial agg) then top-100 on the tiny distinct-token set, rank ties
    broken by token for cross-engine stability."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.vocab_topk(docs, k=100)


@query("corpus_length_stats", r"""
WITH d AS (SELECT lang, CAST(len(""" + _TOKS_SQL + r""") AS BIGINT) AS n_tokens
           FROM documents)
SELECT lang, count(*) AS n_docs,
       round(avg(n_tokens), 2) AS avg_tokens,
       round(quantile_cont(n_tokens, 0.5), 2) AS p50_tokens,
       round(quantile_cont(n_tokens, 0.9), 2) AS p90_tokens,
       max(n_tokens) AS max_tokens
FROM d GROUP BY lang
""")
def corpus_length_stats(spark, sf_dir):
    """Corpus length profile per language (the distribution a data-mixing
    recipe reads): exact linear-interpolation percentiles for oracle parity
    (percentile_approx is the drop-in at 100 TB)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.length_stats(docs)


@query("dedup_clusters", f"""
WITH RECURSIVE pairs AS ({_lsh_verified_sql()}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
          WHERE s.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a)
SELECT component AS keeper, CAST(count(*) AS BIGINT) AS n_docs,
       array_to_string(list_sort(list(node)), ',') AS members
FROM comp GROUP BY component
""")
def dedup_clusters(spark, sf_dir):
    """THE production dedup endpoint: near-duplicate PAIRS (MinHash-LSH
    candidates + exact-Jaccard verification) fused into duplicate GROUPS by
    connected components (graph_algo.connected_components_small min-label
    propagation), one keeper (min doc_id) per cluster. Oracle = transitive
    closure via recursive CTE over the same verified pairs. At 100 TB the
    component step runs on the pair set (tiny relative to the corpus), so
    the whole pipeline's cost stays dominated by the single shingle pass."""
    from amundsendatabuilder_spark.operators.dedup import lsh_verified_pairs
    from amundsendatabuilder_spark.operators.graph_algo import (
        connected_components)
    (docs,) = _t(spark, sf_dir, "documents")
    pairs = lsh_verified_pairs(docs, threshold=0.7)
    comps = connected_components(pairs, src_col="doc_a", dst_col="doc_b")
    return (comps.groupBy(F.col("component").alias("keeper"))
            .agg(F.count("*").alias("n_docs"),
                 F.concat_ws(",", F.transform(
                     F.array_sort(F.collect_list("node")),
                     lambda x: x.cast("string"))).alias("members")))


@query("dedup_embedding_clusters", _embedding_bucketed_oracle(recursive=True))
def dedup_embedding_clusters(spark, sf_dir):
    """The embedding-side dedup endpoint: RHP-BUCKETED near-dup pairs
    (the default scale-banded embedding_near_duplicates path) fused into
    duplicate groups by the same adaptive connected components as the
    text pipeline. Oracle = transitive closure (recursive CTE) over the
    REPLAYED bucketed pair set — a hash match pins both the bucketed
    candidate generation and the component fusion."""
    from amundsendatabuilder_spark.operators.dedup import (
        embedding_near_duplicates)
    from amundsendatabuilder_spark.operators.graph_algo import (
        connected_components)
    (emb,) = _t(spark, sf_dir, "embeddings")
    pairs = embedding_near_duplicates(emb, threshold=0.40, dim=64)
    comps = connected_components(pairs, src_col="id_a", dst_col="id_b")
    return (comps.groupBy(F.col("component").alias("keeper"))
            .agg(F.count("*").alias("n_vectors"),
                 F.concat_ws(",", F.transform(
                     F.array_sort(F.collect_list("node")),
                     lambda x: x.cast("string"))).alias("members")))


@query("lineage_reachability", """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2 + 1),
r AS (
  SELECT k AS root, k AS node, 0 AS depth FROM keys WHERE k <= 8
  UNION
  SELECT r.root, e.dst AS node, r.depth + 1 AS depth
  FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 4)
SELECT root, node, min(depth) AS depth
FROM r WHERE depth > 0 AND node <> root GROUP BY root, node
""")
def lineage_reachability(spark, sf_dir):
    """Multi-hop lineage traversal (the question the reference's lineage
    models exist to answer but leave to the graph DB —
    extractor/csv_extractor.py:261-362, models/table_lineage.py) as a Spark
    operator: operators/graph_algo.reachability frontier-BFS, one equi-join
    per hop, visited-set dedup. Lineage DAG synthesized as the binary-tree
    edges (k -> 2k, 2k+1) over existing order keys; oracle = recursive CTE."""
    from amundsendatabuilder_spark.operators.graph_algo import reachability
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct().cache()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    edges = (
        a.join(b, F.col("b.k") == F.col("a.k") * 2)
        .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"))
        .unionByName(
            a.join(b, F.col("b.k") == F.col("a.k") * 2 + 1)
            .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"))))
    sources = keys_df.where(F.col("k") <= 8).select(F.col("k").alias("src"))
    return reachability(edges, sources, max_depth=4)


@query("publish_diff", """
WITH old AS (SELECT o_orderkey, o_orderstatus AS v
             FROM orders WHERE o_orderkey % 7 <> 0),
new AS (SELECT o_orderkey,
               CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END AS v
        FROM orders WHERE o_orderkey % 5 <> 0)
SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            WHEN old.v <> new.v THEN 'changed' END AS change
FROM old FULL JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL OR old.v <> new.v
""")
def publish_diff(spark, sf_dir):
    """Incremental-publish delta (plans/publish.diff_generations): two
    publish generations full-outer-joined on the entity key, emitting only
    added/removed/changed — the write-minimizing upgrade over the
    reference's re-MERGE-everything publish."""
    from amundsendatabuilder_spark.plans.publish import diff_generations
    (orders,) = _t(spark, sf_dir, "orders")
    old = (orders.where(F.col("o_orderkey") % 7 != 0)
           .select("o_orderkey", F.col("o_orderstatus").alias("v")))
    new = (orders.where(F.col("o_orderkey") % 5 != 0)
           .select("o_orderkey",
                   F.when(F.col("o_orderkey") % 3 == 0, "X")
                   .otherwise(F.col("o_orderstatus")).alias("v")))
    return diff_generations(old, new, ["o_orderkey"], ["v"])


@query("asof_view_before_purchase", """
WITH p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts, max(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY 1, 2)
SELECT p.user_id, CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us, p.event_id,
       v.view_event_id AS asof_view_event_id
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""")
def asof_view_before_purchase(spark, sf_dir):
    """As-of join (operators/asof.asof_join): each purchase event enriched
    with the user's most recent view at-or-before it. Spark lacks a native
    ASOF JOIN; the operator is the scalable UNION + last_value(ignorenulls)
    window formulation (one shuffle on the key, no pair explosion) and the
    oracle is DuckDB's native ASOF LEFT JOIN — the strongest possible
    cross-check of the semantics. Right side pre-deduped per (user, ts) so
    tie-order is engine-independent."""
    from amundsendatabuilder_spark.operators.asof import asof_join
    (events,) = _t(spark, sf_dir, "events")
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "event_id"))
    views = (events.where(F.col("event_type") == "view")
             .groupBy("user_id", "ts")
             .agg(F.max("event_id").alias("view_event_id")))
    joined = asof_join(purchases, views, on="user_id", ts="ts",
                       right_cols=["view_event_id"])
    return joined.select("user_id",
                         F.unix_micros("ts").alias("purchase_us"),
                         "event_id", "asof_view_event_id")


@query("sessionize_batch", """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, ts, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM o)
SELECT user_id, session_id, count(*) AS n_events,
       CAST(epoch_us(min(ts)) AS BIGINT) AS session_start_us,
       CAST(epoch_us(max(ts)) AS BIGINT) AS session_end_us
FROM s GROUP BY user_id, session_id
""")
def sessionize_batch_query(spark, sf_dir):
    """Gap-based sessionization, batch form (streaming/events.
    sessionize_batch): gaps-and-islands windows verify the exact session
    semantics the streaming session_window variant implements (which keeps
    its weaker rows-only check)."""
    from amundsendatabuilder_spark.streaming.events import sessionize_batch
    (events,) = _t(spark, sf_dir, "events")
    return sessionize_batch(events, gap_minutes=30)


@query("centroid_assignment", """
WITH c AS (SELECT vec_id AS cent_id, embedding::DOUBLE[] AS cv
           FROM embeddings WHERE vec_id < 8),
v AS (SELECT vec_id, embedding::DOUBLE[] AS vv FROM embeddings),
sc AS (SELECT vec_id, cent_id,
              round(list_cosine_similarity(vv, cv), 6) AS cos
       FROM v CROSS JOIN c),
r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY cos DESC, cent_id) AS rn
      FROM sc)
SELECT vec_id, cent_id, cos FROM r WHERE rn = 1
""")
def centroid_assignment(spark, sf_dir):
    """IVF index build / k-means assignment step
    (operators/similarity.assign_centroids): every corpus vector assigned
    to its argmax-cosine centroid (broadcast centroids, one corpus pass,
    deterministic tie-break) — upgrades the IVF path from rows-only to
    oracle-verified on its core primitive."""
    from amundsendatabuilder_spark.operators.similarity import assign_centroids
    (emb,) = _t(spark, sf_dir, "embeddings")
    cents = (emb.where(F.col("vec_id") < 8)
             .select(F.col("vec_id").alias("cent_id"), "embedding"))
    return assign_centroids(emb, cents)


@query("skew_salted_join", """
WITH dim AS (
  SELECT * FROM (VALUES ('R', 'returned'), ('A', 'accepted'), ('N', 'none'))
           AS t(flag, description))
SELECT description, count(*) AS n,
       round(sum(l_extendedprice), 2) AS total_price
FROM lineitem JOIN dim ON l_returnflag = flag
GROUP BY description
""")
def skew_salted_join(spark, sf_dir):
    """Salted join on an extreme-skew key (functions/skew.salted_join):
    lineitem joins a 3-row dim on l_returnflag — unsalted, each flag's
    millions of rows hit ONE reducer; salting spreads each over 8. The
    salt never reaches the output, so the oracle (plain join) verifies
    byte-identical semantics."""
    from amundsendatabuilder_spark.functions.skew import salted_join
    (li,) = _t(spark, sf_dir, "lineitem")
    dim = spark.createDataFrame(
        [("R", "returned"), ("A", "accepted"), ("N", "none")],
        "l_returnflag string, description string")
    return (salted_join(li.select("l_returnflag", "l_extendedprice"), dim,
                        on="l_returnflag", buckets=8)
            .groupBy("description")
            .agg(F.count("*").alias("n"),
                 round_half_away(F.sum("l_extendedprice"), 2).alias("total_price")))


@query("skew_salted_collect", """
SELECT o_orderstatus,
       array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS values
FROM orders GROUP BY o_orderstatus
""")
def skew_salted_collect(spark, sf_dir):
    """Two-stage salted collect (functions/skew.salted_two_stage_collect):
    collect over 3 giant groups parallelized across 16 salt buckets, then
    flattened — the pattern for non-algebraic aggregations AQE cannot
    split. Distinct+sort applied for a deterministic compare."""
    from amundsendatabuilder_spark.functions.skew import salted_two_stage_collect
    (orders,) = _t(spark, sf_dir, "orders")
    collected = salted_two_stage_collect(
        orders.select("o_orderstatus", "o_orderpriority"),
        "o_orderstatus", "o_orderpriority")
    return collected.select(
        "o_orderstatus",
        F.concat_ws(",", F.array_sort(F.array_distinct("values"))).alias("values"))


@query("embedding_label_centroids", r"""
WITH u AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings),
m AS (SELECT label, pos, avg(x) AS mean_x FROM u GROUP BY label, pos)
SELECT label,
       CAST(count(*) AS BIGINT) AS dim,
       round(sum(mean_x * mean_x), 6) AS centroid_sq_norm,
       round(max(mean_x), 6) AS max_component
FROM m GROUP BY label
""")
def embedding_label_centroids(spark, sf_dir):
    """Element-wise mean vector (centroid) per label — the k-means update
    step and the embedding-space class profile. posexplode + (label, pos)
    aggregation: the shuffle carries scalars, never whole vectors, and the
    reduce is map-side combinable — at 100 TB this is the only stable way
    to average billions of vectors (no driver-side accumulation). Output
    summarizes the centroid (dim, squared norm, max component) because
    array columns hash differently across engines."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from amundsendatabuilder_spark.session import ensure_parallelism
    u = (ensure_parallelism(emb)
         .select("label", F.posexplode(F.col("embedding").cast("array<double>"))
                 .alias("pos", "x")))
    m = u.groupBy("label", "pos").agg(F.avg("x").alias("mean_x"))
    return (m.groupBy("label")
            .agg(F.count("*").alias("dim"),
                 round_half_away(F.sum(F.col("mean_x") * F.col("mean_x")), 6)
                 .alias("centroid_sq_norm"),
                 round_half_away(F.max("mean_x"), 6).alias("max_component")))


@query("hive_union_nest", """
SELECT 'sch' || r_name AS schema, n_name AS name,
       'tbl ' || n_name AS description,
       false AS is_view,
       CAST(3 AS INT) AS n_cols,
       'ds,c1,c2' AS col_order,
       'ds' AS part_cols
FROM nation JOIN region ON n_regionkey = r_regionkey
""")
def hive_union_nest(spark, sf_dir):
    """The Hive metastore hard part end-to-end (reference:
    extractor/hive_table_metadata_extractor.py:35-158): partition-column
    and regular-column halves UNIONed with set-dedup (an exact-duplicate
    row is injected and must collapse), nested per table with partition
    columns sorted FIRST and badged 'partition column'. Tables synthesized
    from nations; oracle is the hand-computed expectation, so ordering,
    dedup and badge attachment are all verified byte-for-byte."""
    from amundsendatabuilder_spark.sources.hive import (
        nest_hive_columns, union_hive_columns)
    nation, region = _t(spark, sf_dir, "nation", "region")
    base = (nation.join(F.broadcast(region),
                        F.col("n_regionkey") == F.col("r_regionkey"))
            .select(F.concat(F.lit("sch"), F.col("r_name")).alias("schema"),
                    F.col("n_name").alias("name")))

    def half(col_name, sort_order, col_type, col_desc, is_part, desc):
        return base.select(
            "schema", "name",
            (F.concat(F.lit("tbl "), F.col("name")) if desc
             else F.lit(None).cast("string")).alias("description"),
            F.lit(col_name).alias("col_name"),
            F.lit(sort_order).alias("col_sort_order"),
            F.lit(col_type).alias("col_type"),
            F.lit(col_desc).cast("string").alias("col_description"),
            F.lit(is_part).alias("is_partition_col"),
            F.lit(0).alias("is_view"))

    part_half = half("ds", 0, "string", "partition date", 1, True)
    regular = (half("c1", 0, "bigint", None, 0, False)
               .unionByName(half("c2", 1, "string", None, 0, False))
               .unionByName(half("c2", 1, "string", None, 0, False)))  # exact dup
    nested = nest_hive_columns(union_hive_columns(part_half, regular))
    cols = F.col("columns")
    return nested.select(
        "schema", "name", "description", "is_view",
        F.size(cols).alias("n_cols"),
        F.concat_ws(",", F.transform(cols, lambda c: c["name"])).alias("col_order"),
        F.concat_ws(",", F.transform(
            F.filter(cols, lambda c: F.size(c["badges"]) > 0),
            lambda c: c["name"])).alias("part_cols"))


@query("event_interarrival", """
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
             (PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events)
SELECT user_id, count(*) AS n_gaps,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       round(avg(gap_us), 2) AS avg_gap_us
FROM d WHERE gap_us IS NOT NULL GROUP BY user_id
""")
def event_interarrival(spark, sf_dir):
    """lag()-based inter-arrival gaps per user (the §2.5 window surface
    beyond row_number): one shuffle on user_id serves both the window and
    the aggregation — Catalyst reuses the partitioning."""
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return (events.select("user_id", gap.alias("gap_us"))
            .where(F.col("gap_us").isNotNull())
            .groupBy("user_id")
            .agg(F.count("*").alias("n_gaps"),
                 F.min("gap_us").alias("min_gap_us"),
                 F.max("gap_us").alias("max_gap_us"),
                 round_half_away(F.avg("gap_us"), 2).alias("avg_gap_us")))


@query("fuzzy_name_match", """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS edit_distance
FROM supplier a JOIN supplier b
  ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 3
""")
def fuzzy_name_match(spark, sf_dir):
    """Fuzzy name matching via edit distance — the catalog schema-matching
    primitive (find near-identical table/column names across schemas) the
    reference leaves to humans. Blocked on an equality key (nation) so the
    quadratic comparison runs within blocks only — the standard
    entity-resolution blocking strategy at scale."""
    (sup,) = _t(spark, sf_dir, "supplier")
    a, b = sup.alias("a"), sup.alias("b")
    dist = F.levenshtein(F.col("a.s_name"), F.col("b.s_name"))
    return (a.join(b, (F.col("a.s_nationkey") == F.col("b.s_nationkey"))
                   & (F.col("a.s_suppkey") < F.col("b.s_suppkey")))
            .where(dist <= 3)
            .select(F.col("a.s_suppkey").alias("id_a"),
                    F.col("b.s_suppkey").alias("id_b"),
                    dist.alias("edit_distance")))


@query("pivot_status_by_priority", """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_count,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_count,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_count,
       round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0 END), 2) AS f_total
FROM orders GROUP BY o_orderpriority
""")
def pivot_status_by_priority(spark, sf_dir):
    """Pivot (long -> wide) via groupBy().pivot() with EXPLICIT pivot
    values: naming the values skips Spark's extra distinct-collection job
    and keeps the plan a single pass — the form that scales. The oracle is
    the equivalent conditional aggregation."""
    (orders,) = _t(spark, sf_dir, "orders")
    wide = (orders.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.count(F.lit(1)).alias("n"),
                 round_half_away(F.sum("o_totalprice"), 2).alias("total")))
    return wide.select(
        "o_orderpriority",
        F.coalesce("F_n", F.lit(0)).alias("f_count"),
        F.coalesce("O_n", F.lit(0)).alias("o_count"),
        F.coalesce("P_n", F.lit(0)).alias("p_count"),
        F.coalesce("F_total", F.lit(0.0)).alias("f_total"))


@query("search_doc_table_built", """
WITH t AS (
  SELECT s_suppkey, s_nationkey, s_name,
         's' || CAST(s_nationkey AS VARCHAR) AS sch,
         'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS key
  FROM supplier),
u AS (SELECT l_suppkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_usage,
             CAST(count(DISTINCT 'u' || CAST(l_orderkey % 50 AS VARCHAR)) AS BIGINT)
                 AS unique_usage
      FROM lineitem GROUP BY 1)
SELECT 'tpch' AS database, 'gold' AS cluster, t.sch AS schema, t.s_name AS name,
       t.key, t.sch || '.' || t.s_name AS display_name,
       CASE WHEN s_suppkey % 4 <> 0 AND s_suppkey % 2 = 0
            THEN 'about ' || t.s_name END AS description,
       'schema ' || t.sch AS schema_description,
       CAST(s_suppkey * 1000 AS BIGINT) AS last_updated_timestamp,
       'c1,c2' AS column_names,
       'col one' AS column_descriptions,
       coalesce(u.total_usage, 0) AS total_usage,
       coalesce(u.unique_usage, 0) AS unique_usage,
       CASE WHEN s_suppkey % 3 = 0 THEN 'rated' ELSE '' END AS tags,
       CASE WHEN s_suppkey % 5 = 0 THEN 'iceberg,pk' ELSE '' END AS badges,
       CASE WHEN s_suppkey % 4 <> 0 AND s_suppkey % 2 = 1
            THEN 'about ' || t.s_name ELSE '' END AS programmatic_descriptions
FROM t LEFT JOIN u ON t.s_suppkey = u.l_suppkey
""")
def search_doc_table_built(spark, sf_dir):
    """build_table_documents (the §2.6 flagship builder API) verified with
    EVERY feature active: default vs programmatic description routing,
    usage aggregation (SUM + COUNT DISTINCT users), last-updated join,
    schema descriptions, badge normalization, tags, nested column
    projection. Tables synthesized from suppliers, usage from their
    lineitems; arrays flattened to sorted joined strings for the
    cross-engine hash."""
    from amundsendatabuilder_spark.plans.search_documents import (
        build_table_documents)
    sup, li = _t(spark, sf_dir, "supplier", "lineitem")
    sk = F.col("s_suppkey")
    sch = F.concat(F.lit("s"), F.col("s_nationkey").cast("string"))
    has_desc = sk % 4 != 0
    tables = sup.select(
        F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
        sch.alias("schema"), F.col("s_name").alias("name"),
        F.when(has_desc, F.concat(F.lit("about "), F.col("s_name")))
        .alias("description"),
        F.when(sk % 2 == 1, F.lit("quality_report")).alias("description_source"),
        F.when(sk % 3 == 0, F.array(F.lit("rated")))
        .otherwise(F.array().cast("array<string>")).alias("tags"),
        F.lit(False).alias("is_view"),
        F.array(
            F.struct(F.lit("c1").alias("name"), F.lit("col one").alias("description"),
                     F.lit("varchar").alias("col_type"), F.lit(1).alias("sort_order"),
                     F.array().cast("array<string>").alias("badges")),
            F.struct(F.lit("c2").alias("name"), F.lit(None).cast("string").alias("description"),
                     F.lit("int").alias("col_type"), F.lit(2).alias("sort_order"),
                     F.array().cast("array<string>").alias("badges"))).alias("columns"))
    usage = (li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
             .select(F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
                     sch.alias("schema"), F.col("s_name").alias("table_name"),
                     F.concat(F.lit("u"), (F.col("l_orderkey") % 50).cast("string"))
                     .alias("user_email"),
                     F.col("l_quantity").cast("long").alias("read_count")))
    last_updated = sup.select(
        F.lit("tpch").alias("db"), F.lit("gold").alias("cluster"),
        sch.alias("schema"), F.col("s_name").alias("table_name"),
        (sk * 1000).cast("long").alias("last_updated_time_epoch"))
    schema_desc = sup.select(
        F.concat(F.lit("tpch://gold."), sch).alias("schema_key"),
        sch.alias("schema"),
        F.concat(F.lit("schema "), sch).alias("description")).distinct()
    badges = sup.where(sk % 5 == 0).select(
        F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
        sch.alias("schema"), F.col("s_name").alias("table_name"),
        F.lit("pk,iceberg").alias("name"))
    docs = build_table_documents(tables, usage=usage, last_updated=last_updated,
                                 schema_descriptions=schema_desc, badges=badges)
    return docs.select(
        "database", "cluster", "schema", "name", "key", "display_name",
        "description", "schema_description", "last_updated_timestamp",
        F.concat_ws(",", "column_names").alias("column_names"),
        F.concat_ws(",", "column_descriptions").alias("column_descriptions"),
        "total_usage", "unique_usage",
        F.concat_ws(",", F.array_sort("tags")).alias("tags"),
        F.concat_ws(",", F.array_sort("badges")).alias("badges"),
        F.concat_ws(",", "programmatic_descriptions").alias("programmatic_descriptions"))


@query("graph_match_pattern", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS table_key,
         s_name
  FROM supplier)
SELECT table_key AS a_key, table_key || '/c1' AS b_key, 'c1' AS col_name
FROM t
UNION ALL
SELECT table_key, table_key || '/c2', 'c2' FROM t
""")
def graph_match_pattern(spark, sf_dir):
    """The Neo4jExtractor surface (reference: extractor/neo4j_extractor.py
    — run Cypher over the published graph): MATCH
    (Table)-[:COLUMN]->(Column) via sources/graph.match over the engine's
    own expansion of supplier-derived tables. Key-equality joins on
    label-filtered node/rel sets; oracle recomputes the expected pattern
    rows from first principles."""
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    from amundsendatabuilder_spark.sources.graph import match
    (sup,) = _t(spark, sf_dir, "supplier")
    tables = sup.select(
        F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
        F.concat(F.lit("s"), F.col("s_nationkey").cast("string")).alias("schema"),
        F.col("s_name").alias("name"),
        F.col("s_name").alias("description"),
        F.lit(None).cast("string").alias("description_source"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(False).alias("is_view"),
        F.array(
            F.struct(F.lit("c1").alias("name"), F.lit(None).cast("string").alias("description"),
                     F.lit("varchar").alias("col_type"), F.lit(1).alias("sort_order"),
                     F.array().cast("array<string>").alias("badges")),
            F.struct(F.lit("c2").alias("name"), F.lit(None).cast("string").alias("description"),
                     F.lit("int").alias("col_type"), F.lit(2).alias("sort_order"),
                     F.array().cast("array<string>").alias("badges"))).alias("columns"))
    out = expand_tables(tables)
    rows = match(out.nodes, out.rels, start_label="Table",
                 rel_type="COLUMN", end_label="Column")
    return rows.select("a_key", "b_key",
                       F.col("b_props").getItem("name").alias("col_name"))


@query("graph_match_2hop", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS table_key,
         s_suppkey
  FROM supplier)
SELECT table_key, 'c1' AS col_name, 'pk' AS badge FROM t WHERE s_suppkey % 5 = 0
UNION ALL
SELECT table_key, 'c1', 'iceberg' FROM t WHERE s_suppkey % 5 = 0
UNION ALL
SELECT table_key, 'c2', 'golden' FROM t WHERE s_suppkey % 3 = 0
""")
def graph_match_2hop(spark, sf_dir):
    """Multi-hop pattern composition — the general Neo4jExtractor surface
    (reference extractor/neo4j_extractor.py:79-113 runs arbitrary-length
    Cypher): MATCH (Table)-[:COLUMN]->(Column)-[:HAS_BADGE]->(Badge) in
    ONE sources/graph.match_path call over the engine's own graph
    expansion. The oracle recomputes the expected (table, column, badge)
    paths from first principles."""
    from amundsendatabuilder_spark.sources.graph import match_path
    out = _badge_graph(spark, sf_dir)
    paths = match_path(out.nodes, out.rels, start_label="Table",
                       hops=[("COLUMN", "Column"), ("HAS_BADGE", "Badge")])
    return paths.select(
        F.col("n0_key").alias("table_key"),
        F.col("n1_props").getItem("name").alias("col_name"),
        F.col("n2_key").alias("badge"))


def _badge_graph(spark, sf_dir):
    """Supplier-derived Table/Column/Badge graph shared by the
    graph_match_* queries: 2 columns per table, badges keyed off
    s_suppkey residues so the oracle can recompute membership."""
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    (sup,) = _t(spark, sf_dir, "supplier")
    sk = F.col("s_suppkey")
    no_badges = F.array().cast("array<string>")
    tables = sup.select(
        F.lit("tpch").alias("database"), F.lit("gold").alias("cluster"),
        F.concat(F.lit("s"), F.col("s_nationkey").cast("string")).alias("schema"),
        F.col("s_name").alias("name"),
        F.col("s_name").alias("description"),
        F.lit(None).cast("string").alias("description_source"),
        F.array().cast("array<string>").alias("tags"),
        F.lit(False).alias("is_view"),
        F.array(
            F.struct(F.lit("c1").alias("name"), F.lit(None).cast("string").alias("description"),
                     F.lit("varchar").alias("col_type"), F.lit(1).alias("sort_order"),
                     F.when(sk % 5 == 0, F.array(F.lit("pk"), F.lit("iceberg")))
                     .otherwise(no_badges).alias("badges")),
            F.struct(F.lit("c2").alias("name"), F.lit(None).cast("string").alias("description"),
                     F.lit("int").alias("col_type"), F.lit(2).alias("sort_order"),
                     F.when(sk % 3 == 0, F.array(F.lit("golden")))
                     .otherwise(no_badges).alias("badges"))).alias("columns"))
    return expand_tables(tables)


@query("graph_match_hop_predicate", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS table_key,
         s_suppkey
  FROM supplier)
SELECT table_key, 'c1' AS col_name, 'pk' AS badge FROM t WHERE s_suppkey % 5 = 0
UNION ALL
SELECT table_key, 'c1', 'iceberg' FROM t WHERE s_suppkey % 5 = 0
""")
def graph_match_hop_predicate(spark, sf_dir):
    """Per-hop property predicate — Cypher's
    MATCH (t:Table)-[:COLUMN]->(c:Column {name:'c1'})-[:HAS_BADGE]->(b)
    (the inline-property surface of the reference's arbitrary Cypher,
    neo4j_extractor.py:79-113): the middle hop carries {"name": "c1"}, so
    only c1's badge paths survive. The predicate prunes the node set
    BEFORE the hop join; the oracle keeps exactly the c1 badge rows."""
    from amundsendatabuilder_spark.sources.graph import match_path
    out = _badge_graph(spark, sf_dir)
    paths = match_path(out.nodes, out.rels, start_label="Table",
                       hops=[("COLUMN", "Column", {"name": "c1"}),
                             ("HAS_BADGE", "Badge")])
    return paths.select(
        F.col("n0_key").alias("table_key"),
        F.col("n1_props").getItem("name").alias("col_name"),
        F.col("n2_key").alias("badge"))


@query("graph_match_mixed_direction", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name
             AS table_key
  FROM supplier),
cols AS (SELECT table_key, 'c1' AS col_name FROM t
         UNION ALL SELECT table_key, 'c2' FROM t)
SELECT c.col_name AS start_col, c.table_key,
       'c1' AS low_sort_col
FROM cols c
ORDER BY table_key, start_col
""")
def graph_match_mixed_direction(spark, sf_dir):
    """Mixed-direction pattern with an inequality hop predicate —
    Cypher's MATCH (c:Column)<-[:COLUMN]-(t:Table)-[:COLUMN]->(s:Column)
    WHERE s.sort_order < 2 (the remaining generality gap of the
    reference's arbitrary-Cypher Neo4jExtractor,
    extractor/neo4j_extractor.py:79-113): hop 1 traverses the COLUMN
    relationship AGAINST its direction ("in"), hop 2 forward with a
    numeric < predicate on the string-typed sort_order prop. Every
    column reaches its table and the table's sort_order-1 column, so
    the oracle enumerates (c1,t,c1) and (c2,t,c1) per supplier table."""
    from amundsendatabuilder_spark.sources.graph import match_path
    out = _badge_graph(spark, sf_dir)
    paths = match_path(
        out.nodes, out.rels, start_label="Column",
        hops=[("COLUMN", "Table", None, "in"),
              ("COLUMN", "Column", {"sort_order": ("<", 2)}, "out")])
    return (paths.select(
        F.col("n0_props").getItem("name").alias("start_col"),
        F.col("n1_key").alias("table_key"),
        F.col("n2_props").getItem("name").alias("low_sort_col"))
        .orderBy("table_key", "start_col"))


@query("graph_match_varlen", """
WITH t AS (
  SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR) || '/' || s_name AS table_key,
         s_suppkey
  FROM supplier)
SELECT table_key, table_key || '/c1' AS n_key, 1 AS depth FROM t
UNION ALL SELECT table_key, table_key || '/c2', 1 FROM t
UNION ALL SELECT table_key, table_key || '/_description', 1 FROM t
UNION ALL SELECT table_key, 'pk', 2 FROM t WHERE s_suppkey % 5 = 0
UNION ALL SELECT table_key, 'iceberg', 2 FROM t WHERE s_suppkey % 5 = 0
UNION ALL SELECT table_key, 'golden', 2 FROM t WHERE s_suppkey % 3 = 0
""")
def graph_match_varlen(spark, sf_dir):
    """Bounded variable-length hops — Cypher's
    MATCH (t:Table)-[*1..2]->(n) RETURN DISTINCT t, n
    (sources/graph.match_var_path): frontier expansion over the untyped
    edge set, depth-1 endpoints are the columns, depth-2 the badges. The
    oracle enumerates both levels from the construction residues."""
    from amundsendatabuilder_spark.sources.graph import match_var_path
    out = _badge_graph(spark, sf_dir)
    paths = match_var_path(out.nodes, out.rels, start_label="Table",
                           rel_type=None, min_hops=1, max_hops=2)
    return paths.select(F.col("n0_key").alias("table_key"), "n_key", "depth")


@query("graph_shortest_path", """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey <= 400),
edges AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2),
r AS (
  SELECT k AS root, k AS node, 0 AS depth FROM keys
  UNION
  SELECT r.root, e.dst AS node, r.depth + 1 AS depth
  FROM r JOIN edges e ON e.src = r.node WHERE r.depth < 4)
SELECT CAST(root AS VARCHAR) AS n0_key, CAST(node AS VARCHAR) AS n_key,
       'Node' AS n_label, min(depth) AS distance
FROM r WHERE depth > 0 GROUP BY root, node
""")
def graph_shortest_path(spark, sf_dir):
    """Cypher shortestPath (sources/graph.match_shortest): min hop count
    per (start, endpoint) pair over a graph with genuinely different-
    length routes to the same node — chain (k -> k+1) plus skip (k -> 2k)
    edges over order keys, so e.g. 2k is reachable in 1 hop (skip) or k
    hops (chain) and ONLY min-collapse produces the right distance. The
    oracle is the recursive-CTE BFS with the same 4-hop bound."""
    from amundsendatabuilder_spark.sources.graph import match_shortest
    (orders,) = _t(spark, sf_dir, "orders")
    keys = (orders.where(F.col("o_orderkey") <= 400)
            .select(F.col("o_orderkey").alias("k")).distinct())
    nodes = keys.select(
        F.col("k").cast("string").alias("KEY"), F.lit("Node").alias("LABEL"),
        F.create_map().cast("map<string,string>").alias("props"))
    a, b = keys.alias("a"), keys.alias("b")
    empty_props = F.create_map().cast("map<string,string>")

    def edge(cond):
        return (a.join(b, cond)
                .select(F.col("a.k").cast("string").alias("START_KEY"),
                        F.lit("Node").alias("START_LABEL"),
                        F.col("b.k").cast("string").alias("END_KEY"),
                        F.lit("Node").alias("END_LABEL"),
                        F.lit("FLOWS").alias("TYPE"),
                        F.lit("FLOWED").alias("REVERSE_TYPE"),
                        empty_props.alias("props")))
    rels = edge(F.col("b.k") == F.col("a.k") + 1).unionByName(
        edge(F.col("b.k") == F.col("a.k") * 2))
    return (match_shortest(nodes, rels, start_label="Node",
                           rel_type="FLOWS", max_hops=4)
            .select("n0_key", "n_key", "n_label", "distance"))


@query("graph_path_rel_props", """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS k FROM orders
                        WHERE o_orderkey <= 300),
edges AS (
  SELECT a.k AS src, b.k AS dst, (a.k % 7) + 1 AS w
  FROM keys a JOIN keys b ON b.k = a.k + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst, (a.k % 5) + 10 AS w
  FROM keys a JOIN keys b ON b.k = a.k * 2),
p AS (
  SELECT k AS root, k AS node, 0 AS depth, CAST([] AS VARCHAR[]) AS ws
  FROM keys
  UNION ALL
  SELECT p.root, e.dst, p.depth + 1, list_append(p.ws, CAST(e.w AS VARCHAR))
  FROM p JOIN edges e ON e.src = p.node
  WHERE p.depth < 3 AND e.w < 12)
SELECT CAST(root AS VARCHAR) AS n0_key, CAST(node AS VARCHAR) AS n_key,
       CAST(depth AS INT) AS depth,
       array_to_string(ws, ',') AS path_weights,
       CAST(list_aggregate(list_transform(ws, x -> CAST(x AS INT)), 'sum')
            AS BIGINT) AS total_weight
FROM p WHERE depth >= 1
""")
def graph_path_rel_props(spark, sf_dir):
    """Path enumeration with rel-property returns and an ALL-hops path
    predicate (sources/graph.match_var_path_rels) — Cypher
    MATCH p=(a)-[*1..3]->(b) WHERE ALL(r IN relationships(p)
    WHERE r.weight < 12) RETURN a, b, length(p),
    [r IN relationships(p) | r.weight]. The chain+skip graph over order
    keys yields genuinely multiple paths per (a, b) pair (one row each —
    path, not endpoint, semantics), chain hops carry weight (k%7)+1 and
    skip hops (k%5)+10, so the predicate prunes exactly the skip edges
    with weight >= 12 and the accumulated lists pin hop ORDER. Oracle is
    the recursive CTE with the same accumulation and in-recursion
    pruning."""
    from amundsendatabuilder_spark.sources.graph import match_var_path_rels
    (orders,) = _t(spark, sf_dir, "orders")
    keys = (orders.where(F.col("o_orderkey") <= 300)
            .select(F.col("o_orderkey").alias("k")).distinct())
    nodes = keys.select(
        F.col("k").cast("string").alias("KEY"), F.lit("Node").alias("LABEL"),
        F.create_map().cast("map<string,string>").alias("props"))
    a, b = keys.alias("a"), keys.alias("b")

    def edge(cond, w):
        return (a.join(b, cond)
                .select(F.col("a.k").cast("string").alias("START_KEY"),
                        F.lit("Node").alias("START_LABEL"),
                        F.col("b.k").cast("string").alias("END_KEY"),
                        F.lit("Node").alias("END_LABEL"),
                        F.lit("FLOWS").alias("TYPE"),
                        F.lit("FLOWED").alias("REVERSE_TYPE"),
                        F.create_map(F.lit("weight"),
                                     w.cast("string")).alias("props")))
    rels = edge(F.col("b.k") == F.col("a.k") + 1,
                F.col("a.k") % 7 + 1).unionByName(
        edge(F.col("b.k") == F.col("a.k") * 2, F.col("a.k") % 5 + 10))
    paths = match_var_path_rels(
        nodes, rels, start_label="Node", rel_type="FLOWS",
        min_hops=1, max_hops=3, rel_prop="weight",
        rel_pred=F.col("props").getItem("weight").cast("int") < 12)
    return paths.select(
        "n0_key", "n_key", "depth",
        F.array_join("rel_props", ",").alias("path_weights"),
        F.aggregate(F.transform("rel_props", lambda x: x.cast("long")),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v).alias("total_weight"))


@query("column_profile", """
SELECT col_name, n_rows, n_nulls, n_distinct, min_value, max_value, stddev
FROM (
  SELECT 'l_quantity' AS col_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
         CAST(min(l_quantity) AS VARCHAR) AS min_value,
         CAST(max(l_quantity) AS VARCHAR) AS max_value,
         round(stddev_samp(l_quantity), 4) AS stddev
  FROM lineitem
  UNION ALL
  SELECT 'l_discount', count(*),
         CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT l_discount) AS BIGINT),
         CAST(min(l_discount) AS VARCHAR), CAST(max(l_discount) AS VARCHAR),
         round(stddev_samp(l_discount), 4)
  FROM lineitem
  UNION ALL
  SELECT 'l_linenumber', count(*),
         CAST(sum(CASE WHEN l_linenumber IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(count(DISTINCT l_linenumber) AS BIGINT),
         CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR),
         round(stddev_samp(l_linenumber), 4)
  FROM lineitem)
""")
def column_profile(spark, sf_dir):
    """Column profiling (operators/profiling.profile_columns): the
    stats-ingestion pass that populates the reference's TableColumnStats
    model (models/table_stats.py) — min/max/nulls/distinct/stddev for
    every column in ONE table scan (wide aggregate + stack unpivot)."""
    from amundsendatabuilder_spark.operators.profiling import profile_columns
    (li,) = _t(spark, sf_dir, "lineitem")
    return profile_columns(li, ["l_quantity", "l_discount", "l_linenumber"])


@query("stat_aggregates", """
SELECT c_mktsegment,
       round(stddev_samp(c_acctbal), 4) AS bal_stddev,
       round(var_samp(c_acctbal), 4) AS bal_var,
       round(corr(c_acctbal, CAST(c_nationkey AS DOUBLE)), 6) AS bal_nation_corr,
       round(covar_samp(c_acctbal, CAST(c_nationkey AS DOUBLE)), 4) AS bal_nation_covar
FROM customer GROUP BY c_mktsegment
""")
def stat_aggregates(spark, sf_dir):
    """Statistical aggregate family (stddev/variance/correlation/
    covariance) per group — single map-side-combinable pass; the moment
    sketches merge associatively so the plan is identical at any scale."""
    (customer,) = _t(spark, sf_dir, "customer")
    nk = F.col("c_nationkey").cast("double")
    return (customer.groupBy("c_mktsegment")
            .agg(round_half_away(F.stddev_samp("c_acctbal"), 4).alias("bal_stddev"),
                 round_half_away(F.var_samp("c_acctbal"), 4).alias("bal_var"),
                 round_half_away(F.corr(F.col("c_acctbal"), nk), 6).alias("bal_nation_corr"),
                 round_half_away(F.covar_samp(F.col("c_acctbal"), nk), 4)
                 .alias("bal_nation_covar")))


@query("cohort_retention", """
WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort_day
           FROM events GROUP BY 1),
e AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM e JOIN f USING (user_id)
GROUP BY cohort_day, day_offset
""")
def cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day, activity
    counted per (cohort, day-offset). Two aggregations sharing the
    user_id shuffle key + a broadcast-sized cohort join — the analytics
    shape behind every retention dashboard."""
    (events,) = _t(spark, sf_dir, "events")
    day = F.to_date("ts")  # DATE, matching DuckDB's date_trunc('day') type
    first = (events.groupBy("user_id")
             .agg(F.min(day).alias("cohort_day")))
    active = events.select("user_id", day.alias("day")).distinct()
    return (active.join(F.broadcast(first), "user_id")
            .groupBy("cohort_day",
                     F.datediff(F.col("day"), F.col("cohort_day"))
                     .cast("int").alias("day_offset"))
            .agg(F.count("*").alias("n_users")))


@query("sliding_window_counts", """
SELECT ws AS window_start, event_type, count(*) AS n_events
FROM (
  SELECT date_trunc('hour', ts) AS ws, event_type FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, event_type FROM events)
GROUP BY ws, event_type
""")
def sliding_window_counts(spark, sf_dir):
    """Sliding (overlapping) window aggregation: 2-hour windows hopping
    hourly, so every event lands in exactly two windows. Spark's
    F.window(size, slide) does the fan-out natively; the oracle expresses
    the same assignment as a 2-way union of shifted hour-truncations."""
    (events,) = _t(spark, sf_dir, "events")
    return (events
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events"))


# --- rows-only entries (no SQL-expressible oracle) -------------------------


@query("stream_dedup_first_seen", r"""
SELECT md5(array_to_string(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                       x -> x <> ''), ' ')) AS fingerprint,
       min(doc_id) AS doc_id, CAST(0 AS BIGINT) AS dup_rank
FROM documents GROUP BY 1
""")
def stream_dedup_first_seen(spark, sf_dir):
    """Online first-seen dedup (streaming/dedup_stream.first_seen_filter):
    applyInPandasWithState keeps one (fingerprint -> count) state entry and
    emits each distinct document once, in the micro-batch where it first
    appears. Hash-verified for the AvailableNow drain: one micro-batch
    means every fingerprint group emits its min doc_id at rank 0, which IS
    the SQL group-by — the oracle pins the emission set and the keeper
    choice; CROSS-batch state semantics stay pinned in
    tests/test_streaming.py::test_stream_first_seen_dedup."""
    import tempfile

    from amundsendatabuilder_spark.functions.text import fingerprint_md5
    from amundsendatabuilder_spark.streaming.dedup_stream import first_seen_filter
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, source string,"
                      " n_chars long")
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir)
              .select("doc_id", fingerprint_md5(F.col("text")).alias("fingerprint")))
    out = first_seen_filter(stream)
    rows = []
    q = (out.writeStream
         .foreachBatch(lambda df, _: rows.extend(df.collect()))
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    from amundsendatabuilder_spark.streaming.events import record_stream_audit
    record_stream_audit(q, "stream_dedup_first_seen")
    return spark.createDataFrame(rows, "fingerprint string, doc_id long, dup_rank long") \
        if rows else spark.createDataFrame([], "fingerprint string, doc_id long, dup_rank long")


@query("stream_near_dup", f"""
WITH {_minhash_bands_cte(16, 4)},
k AS (SELECT band, band_sig, min(doc_id) AS doc_a
      FROM bands GROUP BY band, band_sig)
SELECT s.band, s.band_sig, k.doc_a, s.doc_id AS doc_b
FROM bands s JOIN k USING (band, band_sig)
WHERE s.doc_id <> k.doc_a
""")
def stream_near_dup(spark, sf_dir):
    """Online NEAR-dup candidates (streaming/dedup_stream.
    near_dup_candidates): per-row MinHash band signatures (no pre-state
    aggregation) key one keeper doc_id of state per LSH bucket; documents
    landing in a seen bucket emit (keeper, doc) pairs as they arrive —
    the streaming twin of dedup.minhash_lsh_pairs. Hash-verified for the
    AvailableNow drain: ids are sorted within the stateful group, so one
    micro-batch makes the keeper min(doc_id) per bucket and every other
    member a (keeper, doc) pair — exactly the SQL twin built on the SAME
    banded-minhash CTE that pins dedup_minhash_lsh. Cross-batch state is
    pinned in tests/test_streaming.py."""
    import tempfile

    from amundsendatabuilder_spark.streaming.dedup_stream import (
        near_dup_candidates)
    stream = (spark.readStream
              .schema("doc_id long, text string, lang string, source string,"
                      " n_chars long")
              .option("pathGlobFilter", "documents.parquet")
              .parquet(sf_dir)
              .select("doc_id", "text"))
    out = near_dup_candidates(stream)
    rows = []
    q = (out.writeStream
         .foreachBatch(lambda df, _: rows.extend(df.collect()))
         .outputMode("update")
         .option("checkpointLocation", tempfile.mkdtemp())
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    from amundsendatabuilder_spark.streaming.events import record_stream_audit
    record_stream_audit(q, "stream_near_dup")
    schema = "band int, band_sig string, doc_a long, doc_b long"
    return spark.createDataFrame(rows, schema) if rows \
        else spark.createDataFrame([], schema)


@query("multimodal_audio_chunks", """
WITH m AS (SELECT i AS media_id FROM (SELECT unnest(range(0, 96)) AS i)
           WHERE i % 3 = 1),
ch AS (SELECT media_id, unnest(range(0, 10)) AS chunk_idx FROM m),
r AS (SELECT media_id, chunk_idx,
             (SELECT sqrt(avg(pow(((chunk_idx * 8000 + jj) * 9973
                                   + media_id * 31) % 65536 - 32768, 2)))
                     / 32768.0
              FROM range(0, 8000) t(jj)) AS rms
      FROM ch)
SELECT media_id, CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(chunk_idx * 500 AS BIGINT) AS start_ms,
       CAST(chunk_idx * 500 + 500 AS BIGINT) AS end_ms,
       round(rms, 6) AS rms_energy
FROM r
""")
def multimodal_audio_chunks(spark, sf_dir):
    """Audio chunking + per-chunk RMS energy
    (operators/multimodal.audio_chunk_features): JVM-side chunk fan-out
    from duration metadata, Arrow-batched REAL DSP over raw PCM16 sample
    windows (media_codecs.pcm16_rms). Hash-verified: the synthetic
    pseudo-noise samples have a closed form, so the SQL twin recomputes
    every chunk's sqrt-mean-square exactly (integer squares sum exactly
    in doubles on both engines)."""
    from amundsendatabuilder_spark.operators.multimodal import (
        audio_chunk_features, synthetic_media)
    return (audio_chunk_features(synthetic_media(spark, n=96), chunk_ms=500)
            .select("media_id", "chunk_idx", "start_ms", "end_ms",
                    round_half_away(F.col("rms_energy"), 6).alias("rms_energy")))


@query("multimodal_frame_plan", """
SELECT i AS media_id, f AS frame_ts_ms
FROM (SELECT unnest(range(0, 64)) AS i) t,
     (SELECT unnest(range(0, 5001, 500)) AS f) u
WHERE i % 3 = 2
""")
def multimodal_frame_plan(spark, sf_dir):
    """Video frame-sampling plan (operators/multimodal.frame_sample_plan):
    per-asset frame timestamps fanned out from duration metadata. The
    synthetic media table is deterministic (video assets = ids with
    i % 3 == 2, duration 5000 ms -> frames 0..5000 step 500), so the
    metadata fan-out IS oracle-verifiable; only the pixel decode stays a
    stub."""
    from amundsendatabuilder_spark.operators.multimodal import (
        frame_sample_plan, synthetic_media)
    return frame_sample_plan(synthetic_media(spark, n=64), every_ms=500)

def _event_stream(spark, sf_dir):
    """File-source stream over the driver's events.parquet with the ts
    encoding normalized to TIMESTAMP, whatever the file actually stores.
    The driver's on-disk format has changed twice (TIMESTAMP(NANOS) read
    as raw int64, then TIMESTAMP(micros, isAdjustedToUTC=false)), and a
    user-supplied readStream schema silently reinterprets the physical
    int64 — reading micros as nanos skews every event time 1000x — so the
    footer is sniffed with pyarrow and the matching conversion applied."""
    import glob
    import os

    import pyarrow.parquet as pq
    path = f"{sf_dir}/events.parquet"
    # driver testdata ships a single file; Spark-written copies (e.g. the
    # sf1 headroom replication) are directories of part files — sniff any
    # one part (unit is uniform across parts of one write)
    sniff = path
    is_dir = os.path.isdir(path)
    if is_dir:
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        assert parts, f"no parquet parts under {path}"
        sniff = parts[0]

    def _read(schema: str):
        rs = spark.readStream.schema(schema)
        if is_dir:
            return rs.parquet(path)
        # the file source requires a directory path; watch sf_dir and
        # glob-filter down to the single events file
        return rs.option("pathGlobFilter", "events.parquet").parquet(sf_dir)

    # Dispatch needs the PHYSICAL type, not the arrow-reported one:
    # pyarrow reports both TIMESTAMP(NANOS)/INT64 and legacy INT96 as
    # 'timestamp[ns...]', but Spark reads INT96 natively as TIMESTAMP
    # while INT64-nanos surfaces as raw int64 under nanosAsLong — a
    # declared-TIMESTAMP schema on the latter fails the read (or skews
    # event times 1000x if coerced).
    sch = pq.ParquetFile(sniff).schema
    col = next(sch.column(i) for i in range(len(sch))
               if sch.column(i).name == "ts")
    int64_nanos_or_raw = col.physical_type == "INT64" and (
        "nanoseconds" in str(col.logical_type).lower()
        or "timestamp" not in str(col.logical_type).lower())
    if not int64_nanos_or_raw:
        # INT96, or INT64 micros/millis (NTZ or tz-adjusted): declared
        # TIMESTAMP reads values directly under the UTC session, matching
        # load_tables' batch path
        return _read("event_id long, ts timestamp, user_id long,"
                     " event_type string, value double, props string")
    # TIMESTAMP(NANOS) over INT64, or a raw int64-nanos column: read as
    # long and convert explicitly
    return (_read("event_id long, ts long, user_id long, event_type string,"
                  " value double, props string")
            .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000"))))


@query("stream_windowed_counts", """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
g AS (SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n_events
      FROM events GROUP BY 1, 2)
SELECT window_start, event_type, n_events
FROM g, wm WHERE g.window_start + INTERVAL 1 HOUR <= wm.w
""")
def stream_windowed_counts(spark, sf_dir):
    """Structured Streaming tumbling-window counts over the events table
    (streaming/events.py), drained with Trigger.AvailableNow. Hash-verified:
    append mode emits exactly the windows whose end has passed the final
    watermark (max event time - 2h), so the oracle is the batch hourly
    aggregate RESTRICTED to that emission frontier — pinning both the agg
    values and the watermark semantics."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import run_to_memory
    agg = (_event_stream(spark, sf_dir)
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
           .agg(F.count("*").alias("n_events"))
           .select(F.col("w.start").alias("window_start"), "event_type", "n_events"))
    name = "swc_" + next(tempfile._get_candidate_names())  # unique per run
    return run_to_memory(agg, spark, name, tempfile.mkdtemp())


def _stream_hll_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import hll_oracle_sql
    inner = hll_oracle_sql(
        "SELECT date_trunc('hour', ts) AS window_start, event_type, user_id"
        " FROM events",
        "user_id", ("window_start", "event_type"))
    return f"""
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT e.window_start, e.event_type,
       round(e.approx_distinct, 6) AS approx_distinct
FROM ({inner}) e, wm WHERE e.window_start + INTERVAL 1 HOUR <= wm.w"""


@query("stream_windowed_distinct", _stream_hll_oracle())
def stream_windowed_distinct(spark, sf_dir):
    """Streaming approximate COUNT(DISTINCT user) per tumbling window
    (streaming/events.windowed_distinct_registers): HLL register rows are
    the streaming aggregation state — 2^8 max-merged registers per
    (window, type) instead of an unbounded distinct-user set — drained
    append-mode, then folded to estimates batch-side
    (sketches.hll_estimate). Hash-verified: the oracle recomputes the
    registers and the estimator from the same md5 layout, restricted to
    windows past the final watermark (the append emission frontier), so
    both the sketch math AND the watermark semantics are pinned."""
    import tempfile

    from amundsendatabuilder_spark.operators import sketches
    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_distinct_registers)
    regs = windowed_distinct_registers(_event_stream(spark, sf_dir))
    name = "swd_" + next(tempfile._get_candidate_names())
    batch = run_to_memory(regs, spark, name, tempfile.mkdtemp())
    est = sketches.hll_estimate(batch, ("window_start", "event_type"))
    return est.select(
        "window_start", "event_type",
        round_half_away(F.col("approx_distinct"), 6).alias("approx_distinct"))


@query("stream_sessionize", """
WITH o AS (SELECT user_id, ts, value, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
agg AS (SELECT user_id, min(ts) AS window_start, max(ts) AS session_end,
               count(*) AS n_events, round(sum(value), 2) AS total_value
        FROM s GROUP BY user_id, sid),
wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events)
SELECT user_id, window_start, n_events, total_value
FROM agg, wm WHERE agg.session_end + INTERVAL 30 MINUTE <= wm.w
""")
def stream_sessionize(spark, sf_dir):
    """Gap-based session windows per user over the event stream
    (streaming/events.py sessionize). Hash-verified: the oracle rebuilds
    the sessions via gaps-and-islands (the same SQL already pinning
    sessionize_batch) and keeps only sessions whose window end
    (last event + gap) has passed the final watermark — the exact
    append-mode emission set."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import run_to_memory, sessionize
    name = "ssn_" + next(tempfile._get_candidate_names())
    out = run_to_memory(sessionize(_event_stream(spark, sf_dir),
                                   gap="30 minutes"),
                        spark, name, tempfile.mkdtemp())
    return out.select("user_id", "window_start", "n_events",
                      round_half_away(F.col("total_value"), 2).alias("total_value"))


@query("ann_ivf_full_probe", r"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
sc AS (SELECT query_id, neighbor_id,
              round(list_cosine_similarity(qv, cv), 6) AS cos
       FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sc)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10
""")
def ann_ivf_full_probe(spark, sf_dir):
    """IVF at nprobe == nlist degenerates to exhaustive search, which makes
    the whole IVF machinery (centroid sampling, list assignment, probe
    routing, final rank) oracle-verifiable against the EXACT top-k SQL —
    the strongest check available for an ANN operator. The partial-probe
    production configuration keeps its rows-only entry (ann_ivf_topk) plus
    the recall contract test."""
    from amundsendatabuilder_spark.operators.similarity import ivf_topk
    (emb,) = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 8), k=10,
                    nlist=16, nprobe=16)


# Shared WITH-body for the IVF twins (ann_ivf_topk + ivf_recall_report):
# md5-ordered centroid sample, rounded argmax list assignment, nprobe=4
# routing, in-list exact rank — ends at CTE ``r`` (ranked candidates).
_IVF_TOPK_CTES = r"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cent0 AS (SELECT v, md5(CAST(vec_id AS VARCHAR)) AS h FROM c ORDER BY h LIMIT 16),
cents AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS list_id,
                 v AS cv
          FROM cent0),
ca AS (SELECT vec_id AS neighbor_id, v, list_id FROM (
         SELECT c.vec_id, c.v, k.list_id,
                row_number() OVER (PARTITION BY c.vec_id
                  ORDER BY round(list_cosine_similarity(c.v, k.cv), 6) DESC,
                           k.list_id) AS r
         FROM c CROSS JOIN cents k) WHERE r = 1),
qp AS (SELECT vec_id AS query_id, v AS qv, list_id FROM (
         SELECT c.vec_id, c.v, k.list_id,
                row_number() OVER (PARTITION BY c.vec_id
                  ORDER BY round(list_cosine_similarity(c.v, k.cv), 6) DESC,
                           k.list_id) AS r
         FROM c CROSS JOIN cents k WHERE c.vec_id < 8) WHERE r <= 4),
sc AS (SELECT query_id, neighbor_id,
              round(list_cosine_similarity(qv, v), 6) AS cos
       FROM qp JOIN ca USING (list_id)
       WHERE query_id <> neighbor_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sc)"""


@query("ann_ivf_topk", _IVF_TOPK_CTES + r"""
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10
""")
def ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (operators/similarity.ivf_topk): probe-limited
    scan, nprobe=4 of nlist=16. Hash-verified against a DuckDB twin that
    replays the FULL index mechanics — md5-ordered centroid sample, rounded
    argmax list assignment, nprobe routing, in-list exact rank — so the
    approximate result set itself (not just its shape) is pinned.
    Recall-vs-exact is parameter-dependent by design; tests pin the floor."""
    from amundsendatabuilder_spark.operators.similarity import ivf_topk
    (emb,) = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.where(F.col("vec_id") < 8), k=10,
                    nlist=16, nprobe=4)


@query("ivf_recall_report", _IVF_TOPK_CTES + r""",
approx AS (SELECT query_id, neighbor_id FROM r WHERE rank <= 10),
q2 AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id < 8),
bf AS (SELECT q2.query_id, c.vec_id AS neighbor_id,
              round(list_cosine_similarity(q2.qv, c.v), 6) AS cos
       FROM q2 JOIN c ON c.vec_id <> q2.query_id),
bfr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM bf),
truth AS (SELECT query_id, neighbor_id FROM bfr WHERE rank <= 10)
SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       round(count(a.neighbor_id) / count(*), 6) AS recall
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id
ORDER BY t.query_id
""")
def ivf_recall_report_query(spark, sf_dir):
    """ann_recall_report's IVF sibling
    (operators/similarity.ivf_recall_report): recall@10 of the
    probe-limited IVF scan with ann_ivf_topk's exact production
    parameters (nprobe=4 of nlist=16, sampled centroids) per query
    against brute-force ground truth — the (nlist, nprobe) budget audit.
    Hash-verified: the twin replays the full IVF index mechanics AND the
    brute-force rank."""
    from amundsendatabuilder_spark.operators.similarity import (
        ivf_recall_report)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return (ivf_recall_report(emb, emb.where(F.col("vec_id") < 8),
                              k=10, nlist=16, nprobe=4)
            .orderBy("query_id"))


@query("ann_ivf_kmeans_full_probe", r"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
sc AS (SELECT query_id, neighbor_id,
              round(list_cosine_similarity(qv, cv), 6) AS cos
       FROM q CROSS JOIN c WHERE query_id <> neighbor_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sc)
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= 10
""")
def ann_ivf_kmeans_full_probe(spark, sf_dir):
    """The kmeans_fit → ivf_topk wiring verified hash-exact: full probe is
    exhaustive REGARDLESS of the centroid set, so running the trained
    centroids (Lloyd, k=10, deterministic md5 init) through the whole
    IVF machinery — assignment, probe routing, final rank — must still
    reproduce the exact top-k SQL. Partial-probe recall with the same
    trained centroids is covered by test_ivf_trained_centroids_beat_sampled."""
    from amundsendatabuilder_spark.operators.similarity import ivf_topk, kmeans_fit
    (emb,) = _t(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=10, max_iters=2)
    return ivf_topk(emb, emb.where(F.col("vec_id") < 8), k=10,
                    nlist=10, nprobe=10, centroids=cents)


def _rhp_topk_ctes(dim: int = 64, n_planes: int = 24, seed: int = 5,
                   bands: int = 8) -> str:
    """Shared WITH-body for the rhp_topk twins: the SAME seeded
    hyperplanes baked in as double literals (repr() round-trips float64
    exactly, and DuckDB parses decimal literals to the nearest double,
    so both engines test sign(v·p) against bit-identical planes),
    replaying the full bucketing mechanics — per-band sign-bit
    signatures, multi-band OR candidate union, exact cosine rank over
    candidates only. Ends at CTE ``r`` (ranked candidates)."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(dim, n_planes, seed=seed)
    per_band = n_planes // bands

    def lit(p):
        return "CAST([" + ",".join(repr(x) for x in p) + "] AS DOUBLE[])"

    bit = [f"CASE WHEN list_dot_product(v, {lit(p)}) >= 0 "
           "THEN '1' ELSE '0' END" for p in planes]
    band_cols = ",\n       ".join(
        "concat(" + ", ".join(bit[g * per_band:(g + 1) * per_band]) + f") AS s{g}"
        for g in range(bands))
    sig_union = "\n  UNION ALL ".join(
        f"SELECT vec_id, {g} AS band, s{g} AS sig FROM bits"
        for g in range(bands))
    return f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bits AS (SELECT vec_id,
       {band_cols}
       FROM c),
sigs AS (
  {sig_union}),
cand AS (SELECT DISTINCT q.vec_id AS query_id, s.vec_id AS neighbor_id
         FROM sigs s JOIN sigs q
           ON s.band = q.band AND s.sig = q.sig AND s.vec_id <> q.vec_id
         WHERE q.vec_id < 8),
sc AS (SELECT cand.query_id, cand.neighbor_id,
              round(list_cosine_similarity(qc.v, cc.v), 6) AS cos
       FROM cand JOIN c qc ON qc.vec_id = cand.query_id
                 JOIN c cc ON cc.vec_id = cand.neighbor_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos DESC, neighbor_id) AS INT) AS rank
      FROM sc)"""


def _rhp_topk_oracle(dim: int = 64, n_planes: int = 24, seed: int = 5,
                     bands: int = 8, k: int = 10) -> str:
    return (_rhp_topk_ctes(dim, n_planes, seed, bands) + f"""
SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {k}
""")


def _ann_recall_oracle(dim: int = 64, n_planes: int = 24, seed: int = 5,
                       bands: int = 8, k: int = 10) -> str:
    """Recall@k twin: banded top-k (the shared CTEs) joined against the
    brute-force top-k ground truth over the same query batch. Integer
    division in DuckDB is true division (DOUBLE), matching Spark's
    long/long double divide."""
    return (_rhp_topk_ctes(dim, n_planes, seed, bands) + f""",
approx AS (SELECT query_id, neighbor_id FROM r WHERE rank <= {k}),
q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 8),
bf AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              round(list_cosine_similarity(q.qv, c.v), 6) AS cos
       FROM q JOIN c ON c.vec_id <> q.query_id),
bfr AS (SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, neighbor_id) AS rank
        FROM bf),
truth AS (SELECT query_id, neighbor_id FROM bfr WHERE rank <= {k})
SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_truth,
       CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       round(count(a.neighbor_id) / count(*), 6) AS recall
FROM truth t LEFT JOIN approx a
  ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
GROUP BY t.query_id
ORDER BY t.query_id
""")


@query("ann_rhp_topk", _rhp_topk_oracle())
def ann_rhp_topk(spark, sf_dir):
    """LSH-bucketed approximate top-k (operators/similarity.rhp_topk):
    random-hyperplane band buckets gate the candidate scan — the
    training-free bucketed scale path beside IVF. Hash-verified against a
    DuckDB twin with the identical seeded planes baked in as literals, so
    the bucket membership AND the approximate result set are pinned
    cross-engine (recall floor vs exact search stays pinned in tests)."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import rhp_topk
    (emb,) = _t(spark, sf_dir, "embeddings")
    return rhp_topk(emb, emb.where(F.col("vec_id") < 8),
                    planes=random_planes(64, 24, seed=5), bands=8, k=10)


@query("ann_recall_report", _ann_recall_oracle())
def ann_recall_report_query(spark, sf_dir):
    """Recall@k evaluation of the banded ANN path
    (operators/similarity.ann_recall_report): the RHP top-10 with
    ann_rhp_topk's exact production parameters, measured per query
    against brute-force cosine ground truth — the audit a consumer runs
    before trusting a (planes, bands) split on a new corpus, completing
    the approximate-path evaluation triad (exhaustive-recall pins the
    mechanics, the pinned topk pins the result set, this measures what
    the production parameters actually recall). Hash-verified: the twin
    replays the banded candidate union AND the brute-force rank, so the
    recall fractions are pinned cross-engine."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        ann_recall_report)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return (ann_recall_report(emb, emb.where(F.col("vec_id") < 8),
                              planes=random_planes(64, 24, seed=5),
                              bands=8, k=10)
            .orderBy("query_id"))


def _knn_disagreement_oracle(dim: int = 64, n_planes: int = 24,
                             seed: int = 5, bands: int = 8, k: int = 5,
                             cap: int = 64, flag_num: int = 1,
                             flag_den: int = 2) -> str:
    """Replay oracle for knn_label_disagreement: same seeded planes,
    same banding, the SAME bucket-size cap (so the certified path is
    the capped path), exact-cosine rank, integer vote arithmetic."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(dim, n_planes, seed=seed)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_rhp_sigs_cte(planes, bands)},
ok AS (SELECT band, sig FROM sigs GROUP BY 1, 2
       HAVING count(*) <= {cap}),
s2 AS (SELECT s.vec_id, s.band, s.sig FROM sigs s JOIN ok USING (band, sig)),
cand AS (SELECT DISTINCT q.vec_id AS a, s.vec_id AS b
         FROM s2 q JOIN s2 s
           ON s.band = q.band AND s.sig = q.sig AND s.vec_id <> q.vec_id),
lb AS (SELECT vec_id, label FROM embeddings),
sc AS (SELECT cand.a, cand.b,
              round(list_cosine_similarity(ea.v, eb.v), 6) AS cos
       FROM cand JOIN e ea ON ea.vec_id = cand.a
                 JOIN e eb ON eb.vec_id = cand.b),
r AS (SELECT a, b,
             row_number() OVER (PARTITION BY a
                                ORDER BY cos DESC, b) AS rn
      FROM sc),
kn AS (SELECT r.a, la.label,
              CAST(count(*) AS BIGINT) AS n_nbrs,
              CAST(sum(CASE WHEN la.label <> lbb.label
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_diff
       FROM r JOIN lb la ON la.vec_id = r.a
              JOIN lb lbb ON lbb.vec_id = r.b
       WHERE r.rn <= {k}
       GROUP BY 1, 2)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(CASE WHEN n_diff * {flag_den} >= {flag_num} * n_nbrs
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       round(CAST(sum(n_diff) AS DOUBLE)
             / CAST(sum(n_nbrs) AS DOUBLE), 6) AS pooled_disagreement
FROM kn GROUP BY 1 ORDER BY 1
"""


@query("knn_label_disagreement", _knn_disagreement_oracle())
def knn_label_disagreement_query(spark, sf_dir):
    """Label-noise screen over the banded candidate graph
    (similarity.knn_label_disagreement): each vector's k=5 nearest
    banded candidates vote on its label; majority-disagreement flags
    likely mislabels, aggregated per label as (n_vecs, n_flagged,
    pooled_disagreement) — the confident-learning-style audit a
    pipeline runs on (embedding, label) pairs before a classifier or
    mixture stage trusts them. Hash-verified: the twin replays the
    seeded planes, the banding, the DEFAULT bucket cap (64 — the
    certified path IS the capped production path), the exact-cosine
    rank, and the cross-multiplied integer flag rule. Scale shape:
    (id, band, sig) shuffles only; vectors join back for candidates;
    rank window group-limit bounds the per-vector sort."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        knn_label_disagreement)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return knn_label_disagreement(
        emb, planes=random_planes(64, 24, seed=5), bands=8, k=5)


@query("multimodal_image_features", """
WITH m AS (SELECT i AS media_id, 200 + (i % 5) * 30 AS w, 150 + (i % 4) * 40 AS h
           FROM (SELECT unnest(range(0, 96)) AS i) WHERE i % 3 = 0),
xs AS (SELECT unnest(range(0, 320)) AS x),
lum AS (SELECT media_id, w, h, avg((x * 255) // (w - 1)) AS ml
        FROM m JOIN xs ON xs.x < m.w GROUP BY media_id, w, h),
tt AS (SELECT media_id, w, tx, ((tx * w) // 8 * 255) // (w - 1) AS tv
       FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS tx)),
ta AS (SELECT media_id, avg(tv) AS tavg FROM tt GROUP BY media_id),
ph AS (SELECT tt.media_id,
              CAST(sum(CASE WHEN tv >= tavg
                            THEN 1 << (7 - CAST(tx AS INT)) ELSE 0 END)
                   AS BIGINT) AS rowbits
       FROM tt JOIN ta USING (media_id) GROUP BY tt.media_id)
SELECT lum.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(ml / 255.0, 6) AS mean_luma,
       repeat(lower(lpad(to_hex(rowbits), 2, '0')), 8) AS phash
FROM lum JOIN ph ON lum.media_id = ph.media_id
""")
def multimodal_image_features(spark, sf_dir):
    """Multimodal image decode (operators/multimodal + media_codecs):
    Arrow-batched mapInPandas over REAL 24-bit BMP payloads — header
    parse, row unpadding, ITU-R 601 luma, 8x8 nearest-neighbor avg-hash
    are all real pixel math (pure NumPy; no image libs needed for BMP).
    Hash-verified: the synthetic ramp images give every feature a closed
    form the SQL twin recomputes — mean luma as the ramp average, phash
    as the per-row sign-bit byte repeated 8 times (rows are identical)."""
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_image_features, synthetic_media)
    return (decode_image_features(synthetic_media(spark, n=96))
            .select("media_id", "width", "height",
                    round_half_away(F.col("mean_luma"), 6).alias("mean_luma"),
                    "phash"))


@query("multimodal_png_features", """
WITH m AS (SELECT i AS media_id, 200 + (i % 5) * 30 AS w, 150 + (i % 4) * 40 AS h
           FROM (SELECT unnest(range(0, 32)) AS i)),
xs AS (SELECT unnest(range(0, 320)) AS x),
lum AS (SELECT media_id, w, h, avg((x * 255) // (w - 1)) AS ml
        FROM m JOIN xs ON xs.x < m.w GROUP BY media_id, w, h),
tt AS (SELECT media_id, w, tx, ((tx * w) // 8 * 255) // (w - 1) AS tv
       FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS tx)),
ta AS (SELECT media_id, avg(tv) AS tavg FROM tt GROUP BY media_id),
ph AS (SELECT tt.media_id,
              CAST(sum(CASE WHEN tv >= tavg
                            THEN 1 << (7 - CAST(tx AS INT)) ELSE 0 END)
                   AS BIGINT) AS rowbits
       FROM tt JOIN ta USING (media_id) GROUP BY tt.media_id)
SELECT lum.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(ml / 255.0, 6) AS mean_luma,
       repeat(lower(lpad(to_hex(rowbits), 2, '0')), 8) AS phash
FROM lum JOIN ph ON lum.media_id = ph.media_id
""")
def multimodal_png_features(spark, sf_dir):
    """PNG decode through the stdlib-zlib codec (media_codecs.decode_png):
    chunk walk with CRC verification, zlib inflate, per-row unfiltering —
    the fixture rotates the row filter over all five spec filters
    (None/Sub/Up/Average/Paeth, synthetic_png_media), so a wrong
    unfilter path breaks the hash. Features share the BMP ramp's closed
    forms: same luma/phash SQL twin, every id an image (no kind cycle)."""
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_image_features, synthetic_png_media)
    return (decode_image_features(synthetic_png_media(spark, n=32))
            .select("media_id", "width", "height",
                    round_half_away(F.col("mean_luma"), 6).alias("mean_luma"),
                    "phash"))


@query("multimodal_gif_frames", """
WITH m AS (SELECT i AS media_id, f AS frame_idx,
                  96 + (i % 5) * 16 AS w, 80 + (i % 4) * 16 AS h
           FROM (SELECT unnest(range(0, 24)) AS i)
                CROSS JOIN (SELECT unnest(range(0, 3)) AS f)),
bb AS (SELECT media_id, frame_idx, w, h,
              (bx * 29 + by * 53 + media_id * 11 + frame_idx * 17) % 256 AS v
       FROM m CROSS JOIN (SELECT unnest(range(0, 20)) AS bx)
              CROSS JOIN (SELECT unnest(range(0, 16)) AS by)
       WHERE bx < w // 8 AND by < h // 8),
lum AS (SELECT media_id, frame_idx, w, h, avg(v) AS ml
        FROM bb GROUP BY 1, 2, 3, 4),
tt AS (SELECT media_id, frame_idx, ty, tx,
              (((tx * w) // 64) * 29 + ((ty * h) // 64) * 53
               + media_id * 11 + frame_idx * 17) % 256 AS tv
       FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS tx)
              CROSS JOIN (SELECT unnest(range(0, 8)) AS ty)),
ta AS (SELECT media_id, frame_idx, avg(tv) AS tavg
       FROM tt GROUP BY media_id, frame_idx),
rowbits AS (SELECT tt.media_id, tt.frame_idx, ty,
                   CAST(sum(CASE WHEN tv >= tavg
                                 THEN 1 << (7 - CAST(tx AS INT)) ELSE 0 END)
                        AS BIGINT) AS rb
            FROM tt JOIN ta USING (media_id, frame_idx)
            GROUP BY tt.media_id, tt.frame_idx, ty),
ph AS (SELECT media_id, frame_idx,
              string_agg(lpad(lower(to_hex(rb)), 2, '0'), '' ORDER BY ty) AS phash
       FROM rowbits GROUP BY media_id, frame_idx)
SELECT lum.media_id, CAST(lum.frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(ml / 255.0, 6) AS mean_luma, phash
FROM lum JOIN ph ON lum.media_id = ph.media_id
               AND lum.frame_idx = ph.frame_idx
""")
def multimodal_gif_frames(spark, sf_dir):
    """Animated-GIF frame extraction (multimodal.decode_frame_features +
    media_codecs GIF/LZW): variable-width LZW decode, palette mapping,
    interlace handling, per-frame compositing — the video-side decode
    made REAL for the one mainstream multi-frame container that needs no
    codec library. The fixture rotates progressive/interlaced streams
    over flat-block frames (LZW is lossless), so each frame's mean luma
    and avg-hash have closed forms the SQL twin rebuilds per (media,
    frame). Complements frame_sample_plan (timestamp planning) with the
    actual decode step."""
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_frame_features, synthetic_gif_media)
    return (decode_frame_features(synthetic_gif_media(spark, n=24, n_frames=3))
            .select("media_id", "frame_idx", "width", "height",
                    round_half_away(F.col("mean_luma"), 6).alias("mean_luma"),
                    "phash"))




@query("multimodal_jpeg_features", """
WITH m AS (SELECT i AS media_id, 96 + (i % 5) * 16 AS w, 80 + (i % 4) * 16 AS h
           FROM (SELECT unnest(range(0, 32)) AS i)),
bb AS (SELECT media_id, w, h,
              (bx * 29 + by * 53 + media_id * 11) % 256 AS v
       FROM m CROSS JOIN (SELECT unnest(range(0, 20)) AS bx)
              CROSS JOIN (SELECT unnest(range(0, 16)) AS by)
       WHERE bx < w // 8 AND by < h // 8),
lum AS (SELECT media_id, w, h, avg(v) AS ml FROM bb GROUP BY 1, 2, 3),
tt AS (SELECT media_id, ty, tx,
              (((tx * w) // 64) * 29 + ((ty * h) // 64) * 53
               + media_id * 11) % 256 AS tv
       FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS tx)
              CROSS JOIN (SELECT unnest(range(0, 8)) AS ty)),
ta AS (SELECT media_id, avg(tv) AS tavg FROM tt GROUP BY media_id),
rowbits AS (SELECT tt.media_id, ty,
                   CAST(sum(CASE WHEN tv >= tavg
                                 THEN 1 << (7 - CAST(tx AS INT)) ELSE 0 END)
                        AS BIGINT) AS rb
            FROM tt JOIN ta USING (media_id) GROUP BY tt.media_id, ty),
ph AS (SELECT media_id,
              string_agg(lpad(lower(to_hex(rb)), 2, '0'), '' ORDER BY ty) AS phash
       FROM rowbits GROUP BY media_id)
SELECT lum.media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       round(ml / 255.0, 6) AS mean_luma, phash
FROM lum JOIN ph ON lum.media_id = ph.media_id
""")
def multimodal_jpeg_features(spark, sf_dir):
    """Baseline-JPEG decode through the pure-NumPy codec
    (media_codecs.decode_jpeg): generic DHT canonical-Huffman build,
    byte-unstuffed entropy decode, dequant + IDCT, chroma upsample,
    YCbCr->RGB — the full ITU T.81 baseline path with no image library.
    The fixture rotates 4:4:4 / 4:2:0 / grayscale / restart-marker
    streams (synthetic_jpeg_media) over flat-block images whose lossy
    round trip is exact by construction, so every layout's decoded
    pixels — and therefore mean luma and the 8x8 avg-hash — have closed
    forms the SQL twin rebuilds from the block-value formula. Covers the
    dominant real-corpus image format; parity target:
    /root/reference/databuilder/transformer/base_transformer.py generic
    per-record transform surface (the reference has no media decode at
    all — this family is the beyond-reference training-data extension)."""
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_image_features, synthetic_jpeg_media)
    return (decode_image_features(synthetic_jpeg_media(spark, n=32))
            .select("media_id", "width", "height",
                    round_half_away(F.col("mean_luma"), 6).alias("mean_luma"),
                    "phash"))


# ---------------------------------------------------------------------------
# 9. Round-2 training-pipeline additions: decontamination, mixing,
#    quantile filtering, conversion attribution
# ---------------------------------------------------------------------------

def _hll_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import hll_oracle_sql
    orders_twin = hll_oracle_sql(
        "SELECT o_orderpriority AS grp, o_custkey FROM orders",
        "o_custkey", ("grp",))
    events_twin = hll_oracle_sql(
        "SELECT event_type AS grp, user_id FROM events", "user_id", ("grp",))
    return f"""
WITH oe AS (SELECT o_orderpriority AS grp,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
            FROM orders GROUP BY 1),
ee AS (SELECT event_type AS grp,
              CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
       FROM events GROUP BY 1)
SELECT a.grp, round(a.approx_distinct, 6) AS approx_distinct, oe.exact_distinct
FROM ({orders_twin}) a JOIN oe USING (grp)
UNION ALL
SELECT b.grp, round(b.approx_distinct, 6) AS approx_distinct, ee.exact_distinct
FROM ({events_twin}) b JOIN ee USING (grp)"""


@query("hll_distinct_sketch", _hll_oracle())
def hll_distinct_sketch(spark, sf_dir):
    """HyperLogLog distinct-count sketch (operators/sketches.py): the
    scale answer to COUNT(DISTINCT) — md5-bucketed 2^8 registers,
    map-side-combinable max, scaled-integer 2^-R fold, linear-counting
    fallback. Two real branches under the hash: orders custkeys per
    priority (~1300 distinct -> raw estimator) and events users per type
    (150 distinct -> linear counting), each beside its exact count so the
    certified artifact shows calibration, not just determinism. All
    built-in expressions (no UDF); register state is m rows per group, so
    at 100 TB the shuffle carries registers, never values. Beyond-
    reference training-pipeline operator (the reference's closest surface
    is per-table COUNT aggregation in
    databuilder/extractor/table_column_usage_aggregate_extractor.py)."""
    from amundsendatabuilder_spark.operators import sketches
    orders, events = _t(spark, sf_dir, "orders", "events")
    oa = sketches.hll_distinct(
        orders.select(F.col("o_orderpriority").alias("grp"),
                      F.col("o_custkey").alias("v")), "v", ("grp",))
    ob = sketches.hll_distinct(
        events.select(F.col("event_type").alias("grp"),
                      F.col("user_id").alias("v")), "v", ("grp",))
    oe = (orders.groupBy(F.col("o_orderpriority").alias("grp"))
          .agg(F.countDistinct("o_custkey").alias("exact_distinct")))
    ee = (events.groupBy(F.col("event_type").alias("grp"))
          .agg(F.countDistinct("user_id").alias("exact_distinct")))
    out_a = oa.join(oe, "grp").select(
        "grp", round_half_away(F.col("approx_distinct"), 6)
        .alias("approx_distinct"), "exact_distinct")
    out_b = ob.join(ee, "grp").select(
        "grp", round_half_away(F.col("approx_distinct"), 6)
        .alias("approx_distinct"), "exact_distinct")
    return out_a.unionByName(out_b)


@query("decontam_benchmark_overlap", r"""
WITH t AS (SELECT doc_id, """ + _TOKS_SQL + r""" AS toks FROM documents),
g AS (SELECT DISTINCT doc_id,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4] AS shingle
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) AS i FROM t)),
b AS (SELECT DISTINCT shingle FROM g WHERE doc_id % 50 = 0),
tr AS (SELECT doc_id, shingle FROM g WHERE doc_id % 50 <> 0)
SELECT tr.doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM tr JOIN b USING (shingle)
GROUP BY tr.doc_id
""")
def decontam_benchmark_overlap(spark, sf_dir):
    """Test-set decontamination (operators/dedup.benchmark_overlap):
    training docs sharing any word 5-gram with the benchmark slice
    (doc_id % 50 == 0 stands in for an eval set). The benchmark gram set
    broadcasts; the corpus side never shuffles text."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.benchmark_overlap(
        docs.where(F.col("doc_id") % 50 != 0),
        docs.where(F.col("doc_id") % 50 == 0), n=5)


@query("quality_quantile_filter", r"""
WITH t AS (SELECT doc_id, lang, text, """ + _TOKS_SQL + r""" AS toks FROM documents),
m AS (SELECT doc_id, lang AS stratum,
        round(least(len(toks) / 100.0, 1.0) * 0.4
              + CASE WHEN len(toks) > 0
                     THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
                     ELSE 0.0 END * 0.4
              + (1 - CASE WHEN length(text) > 0
                          THEN CAST(length(text) -
                               length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
                               AS DOUBLE) / length(text)
                          ELSE 0.0 END) * 0.2, 4) AS quality
      FROM t),
r AS (SELECT *, percent_rank() OVER (PARTITION BY stratum
                                     ORDER BY quality DESC, doc_id) AS pr
      FROM m)
SELECT doc_id, stratum, quality FROM r WHERE pr <= 0.5
""")
def quality_quantile_filter_query(spark, sf_dir):
    """Per-language top-half quality cut (textops.quality_quantile_filter):
    percent_rank windows partitioned by stratum — parallel across
    languages, deterministic tie-break by doc_id."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.quality_quantile_filter(docs, keep_frac=0.5)


@query("mixture_rates", r"""
WITH g AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
                  CAST(sum(len(""" + _TOKS_SQL + r""")) AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1, 2),
tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS total,
               count(*) AS n_groups FROM g)
SELECT lang, source, n_docs, n_tokens,
       round(n_tokens / total, 6) AS token_share,
       round(least(1.0, (total / n_groups) / n_tokens), 6) AS rate
FROM g, tot
""")
def mixture_rates(spark, sf_dir):
    """Training-mixture bookkeeping (textops.mixture_sampling_rates):
    per-(lang, source) token inventory + equalizing sampling rate. One
    groupBy shuffle; grand totals via an empty window over the dozens of
    group rows."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.mixture_sampling_rates(docs)


@query("conversion_attribution", r"""
WITH conv AS (SELECT event_id, user_id, CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS conversion_us
              FROM events WHERE event_type = 'purchase'),
t AS (SELECT user_id AS tu, CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS touch_us
      FROM events WHERE event_type = 'view')
SELECT c.event_id, c.user_id, c.conversion_us,
       CAST(count(CASE WHEN t.touch_us <= c.conversion_us
                        AND t.touch_us > c.conversion_us - 3600000000
                       THEN 1 END) AS BIGINT) AS n_touches,
       max(CASE WHEN t.touch_us <= c.conversion_us
                 AND t.touch_us > c.conversion_us - 3600000000
                THEN t.touch_us END) AS last_touch_us
FROM conv c LEFT JOIN t ON c.user_id = t.tu
GROUP BY 1, 2, 3
""")
def conversion_attribution_query(spark, sf_dir):
    """Bounded-interval attribution join (operators/attribution): views in
    the hour before each purchase, per user — equi-join on user_id with
    the time bound as a residual predicate, cost bounded by per-user
    density."""
    from amundsendatabuilder_spark.operators.attribution import conversion_attribution
    (events,) = _t(spark, sf_dir, "events")
    return conversion_attribution(events)


@query("token_shard_packing", r"""
WITH t AS (SELECT doc_id, lang AS stratum,
                  CAST(len(""" + _TOKS_SQL + r""") AS BIGINT) AS n_tokens
           FROM documents),
c AS (SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t)
SELECT doc_id, stratum, n_tokens,
       CAST((cum - n_tokens) // 20000 AS BIGINT) AS shard_id
FROM c
""")
def token_shard_packing(spark, sf_dir):
    """Token-budget shard packing (textops.pack_shards): per-stratum
    running token sum -> fixed-budget shard ids; windows partitioned by
    stratum so strata pack in parallel, deterministic (doc_id) order."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.pack_shards(docs, budget_tokens=20_000)


@query("stream_attribution", """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts
FROM events p JOIN events v
  ON v.user_id = p.user_id
 AND v.ts <= p.ts AND v.ts > p.ts - INTERVAL 60 MINUTE
WHERE p.event_type = 'purchase' AND v.event_type = 'view'
""")
def stream_attribution(spark, sf_dir):
    """Watermarked stream-stream interval join (streaming/events.py
    stream_stream_attribution): purchases joined to same-user views in the
    preceding hour, both sides state-bounded by watermark + time-bound
    join condition. Hash-verified: inner-join matches emit as soon as both
    sides are buffered (no watermark holdback for emission, only for state
    eviction), so an AvailableNow drain over a bounded source must produce
    EXACTLY the batch interval join — the oracle is that join verbatim."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, stream_stream_attribution)
    stream = _event_stream(spark, sf_dir)
    joined = stream_stream_attribution(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        lookback_minutes=60)
    name = "sattr_" + next(tempfile._get_candidate_names())
    import os
    return run_to_memory(joined, spark, name,
                         os.path.join(tempfile.mkdtemp(), "ckpt"))


@query("stream_attribution_outer", """
WITH p AS (SELECT event_id, user_id, ts AS purchase_ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
wm AS (SELECT least((SELECT max(ts) FROM events WHERE event_type = 'view'),
                    (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
              - INTERVAL 2 HOUR AS w),
j AS (SELECT p.event_id, p.user_id, p.purchase_ts, v.view_ts
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id
       AND v.view_ts <= p.purchase_ts
       AND v.view_ts > p.purchase_ts - INTERVAL 60 MINUTE)
SELECT j.event_id, j.user_id, j.purchase_ts, j.view_ts
FROM j, wm WHERE j.view_ts IS NOT NULL OR j.purchase_ts < wm.w
""")
def stream_attribution_outer(spark, sf_dir):
    """Left-outer watermarked stream-stream interval join (streaming/
    events.stream_stream_attribution_outer): zero-view purchases emit
    NULL view_ts, completing parity with the batch twin's left join.
    Hash-verified with the emission frontier pinned in SQL: matches emit
    unconditionally; a null-extended row emits once the global watermark
    (MIN of both streams' max event time — Spark's default
    multipleWatermarkPolicy — minus the 2h delay) passes the purchase's
    event time, because only then can the engine prove no matching view
    is still in flight. Purchases above the frontier stay in state —
    verified exactly (not approximately) against the drained output."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, stream_stream_attribution_outer)
    stream = _event_stream(spark, sf_dir)
    joined = stream_stream_attribution_outer(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        lookback_minutes=60)
    name = "sattro_" + next(tempfile._get_candidate_names())
    import os
    return run_to_memory(joined, spark, name,
                         os.path.join(tempfile.mkdtemp(), "ckpt"))


@query("stream_asof_join", """
WITH p AS (SELECT event_id, user_id, ts AS purchase_ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'),
wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events
       WHERE event_type IN ('view', 'purchase')),
j AS (SELECT p.event_id, p.user_id, p.purchase_ts,
             max(v.view_ts) AS asof_view_ts
      FROM p LEFT JOIN v
        ON v.user_id = p.user_id
       AND v.view_ts <= p.purchase_ts
       AND v.view_ts > p.purchase_ts - INTERVAL 60 MINUTE
      GROUP BY 1, 2, 3)
SELECT j.event_id, j.user_id, j.purchase_ts, j.asof_view_ts
FROM j, wm WHERE j.purchase_ts < wm.w
""")
def stream_asof_join_query(spark, sf_dir):
    """Streaming as-of join (streaming/asof_stream.stream_asof_join):
    each purchase enriched with the same user's most recent view at or
    before it (60 min lookback), as an applyInPandasWithState custom
    stateful operator — the streaming twin of operators/asof.asof_join
    (r9 verdict item #3). Hash-verified with the emission frontier
    pinned in SQL: a purchase emits only once the single union-stream
    watermark (max event ts over views+purchases minus the 2h delay)
    strictly passes its ts — matched rows hold to the same frontier
    because the most-recent-prior answer can improve until it passes;
    later purchases stay in state, never silently dropped."""
    import os
    import tempfile

    from amundsendatabuilder_spark.streaming.asof_stream import (
        stream_asof_join)
    from amundsendatabuilder_spark.streaming.events import run_to_memory
    stream = _event_stream(spark, sf_dir)
    joined = stream_asof_join(
        stream.where(F.col("event_type") == "view"),
        stream.where(F.col("event_type") == "purchase"),
        horizon_minutes=60)
    name = "sasof_" + next(tempfile._get_candidate_names())
    return run_to_memory(joined, spark, name,
                         os.path.join(tempfile.mkdtemp(), "ckpt"))


@query("incremental_ingest_anti_join", r"""
WITH fp AS (SELECT doc_id,
                   md5(array_to_string(list_filter(
                       string_split_regex(trim(lower(text)), '\s+'),
                       x -> x <> ''), ' ')) AS fingerprint
            FROM documents)
SELECT n.doc_id, n.fingerprint
FROM fp n
WHERE n.doc_id % 10 <> 0
  AND NOT EXISTS (SELECT 1 FROM fp e
                  WHERE e.doc_id % 10 = 0 AND e.fingerprint = n.fingerprint)
""")
def incremental_ingest_anti_join(spark, sf_dir):
    """Incremental corpus ingest: a new batch (doc_id % 10 != 0) anti-
    joined on content fingerprint against the already-ingested store
    (% 10 == 0 slice) — only genuinely new content passes. The 100 TB
    pattern: the store keeps only (fingerprint) — 32 bytes/doc — bucketed
    by fingerprint prefix so the anti-join is co-located; new batches
    never re-shuffle historical text."""
    (docs,) = _t(spark, sf_dir, "documents")
    fp = textops.fingerprints(docs).select("doc_id", "fingerprint")
    new = fp.where(F.col("doc_id") % 10 != 0)
    existing = fp.where(F.col("doc_id") % 10 == 0).select("fingerprint")
    return new.join(existing, "fingerprint", "left_anti") \
        .select("doc_id", "fingerprint")


@query("multimodal_resize", """
WITH m AS (SELECT i AS media_id, 200 + (i % 5) * 30 AS w, 150 + (i % 4) * 40 AS h
           FROM (SELECT unnest(range(0, 96)) AS i) WHERE i % 3 = 0),
d AS (SELECT media_id, w, h,
             least(224.0 / w, 224.0 / h, 1.0) AS sc
      FROM m),
t AS (SELECT media_id, w, h,
             greatest(CAST(floor(w * sc) AS INT), 1) AS tw,
             greatest(CAST(floor(h * sc) AS INT), 1) AS th
      FROM d),
rowstr AS (SELECT media_id, w, h, tw, th,
                  string_agg(CAST(((tx * w) // tw * 255) // (w - 1)
                                  AS VARCHAR), ',' ORDER BY tx) AS row_str
           FROM t JOIN (SELECT unnest(range(0, 320)) AS tx) xs
             ON xs.tx < t.tw
           GROUP BY media_id, w, h, tw, th)
SELECT media_id, CAST(tw AS INTEGER) AS target_w, CAST(th AS INTEGER) AS target_h,
       md5(array_to_string(list_transform(range(0, th), yy -> row_str), ';'))
           AS resized_digest
FROM rowstr
""")
def multimodal_resize(spark, sf_dir):
    """Aspect-preserving image resize (operators/multimodal resize_images):
    real BMP decode + nearest-neighbor resample of the grayscale plane;
    digest = md5 of the canonical row-joined pixel string. Hash-verified:
    ramp rows are y-invariant, so the SQL twin rebuilds the EXACT resized
    pixel string (one row formula repeated target_h times) and must match
    the md5 byte-for-byte — pinning decode, dim math, resample index map,
    and digest canonicalization in one check."""
    from amundsendatabuilder_spark.operators.multimodal import (
        resize_images, synthetic_media)
    return resize_images(synthetic_media(spark, n=96))


def _kmeans_oracle(k: int = 8, iters: int = 3, dim: int = 64) -> str:
    """DuckDB twin for kmeans_fit: Lloyd's loop UNROLLED into ``iters``
    assignment+update CTE pairs plus the final counting assignment —
    iterative only in the driver loop, each iteration is pure relational
    algebra, so a fixed iteration count is SQL-expressible. Mirrors
    kmeans_fit exactly: md5-ordered init, argmax of round(cos, 6) with
    cent_id tie-break, per-dimension AVG rebuild, empty clusters keep the
    previous centroid (LEFT JOIN + COALESCE), members counted against the
    RETURNED centroids."""
    sql = [f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
init AS (SELECT v, md5(CAST(vec_id AS VARCHAR)) AS h FROM c ORDER BY h LIMIT {k}),
cents0 AS (SELECT CAST(row_number() OVER (ORDER BY h) AS INT) - 1 AS cent_id,
                  v AS cv
           FROM init)"""]
    for i in range(1, iters + 1):
        sql.append(f""",
asg{i} AS (SELECT vec_id, cent_id FROM (
    SELECT c.vec_id, kk.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY round(list_cosine_similarity(c.v, kk.cv), 6) DESC,
                      kk.cent_id) AS r
    FROM c CROSS JOIN cents{i - 1} kk) WHERE r = 1),
new{i} AS (SELECT cent_id, list(m ORDER BY pos) AS cv FROM (
    SELECT a.cent_id, t.i AS pos, avg(c.v[t.i]) AS m
    FROM asg{i} a JOIN c USING (vec_id) CROSS JOIN range(1, {dim + 1}) t(i)
    GROUP BY a.cent_id, t.i) GROUP BY cent_id),
cents{i} AS (SELECT kk.cent_id, COALESCE(n.cv, kk.cv) AS cv
             FROM cents{i - 1} kk LEFT JOIN new{i} n USING (cent_id))""")
    sql.append(f""",
asgF AS (SELECT vec_id, cent_id FROM (
    SELECT c.vec_id, kk.cent_id,
           row_number() OVER (PARTITION BY c.vec_id
             ORDER BY round(list_cosine_similarity(c.v, kk.cv), 6) DESC,
                      kk.cent_id) AS r
    FROM c CROSS JOIN cents{iters} kk) WHERE r = 1),
cnt AS (SELECT cent_id, count(*) AS n FROM asgF GROUP BY cent_id)
SELECT kk.cent_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_members,
       CAST({dim} AS INT) AS dims
FROM cents{iters} kk LEFT JOIN cnt USING (cent_id)""")
    return "".join(sql)


def _pq_oracle(m: int = 4, ksub: int = 16, dim: int = 64, iters: int = 2,
               k: int = 10, nq: int = 8) -> str:
    """DuckDB twin for pq_train -> pq_encode -> pq_adc_topk: the grouped
    Lloyd loop unrolls ONCE with sub_id as a grouping column (not m
    copies), then encode pivots codes to per-subspace columns and ADC
    scores via explicit left-associated addition — the same fold order as
    Spark's aggregate(zip_with(...)), so the rounded score is
    engine-identical."""
    dsub = dim // m
    assert dsub * m == dim
    sql = [f"""
WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sl AS (SELECT vec_id, t.s AS sub_id,
              v[t.s * {dsub} + 1 : t.s * {dsub} + {dsub}] AS sv
       FROM c CROSS JOIN range(0, {m}) t(s)),
ii AS (SELECT vec_id, md5(CAST(vec_id AS VARCHAR)) AS h
       FROM c ORDER BY h LIMIT {ksub}),
cents0 AS (SELECT sl.sub_id,
                  CAST(row_number() OVER (PARTITION BY sl.sub_id
                                          ORDER BY ii.h) AS INT) - 1 AS cent_id,
                  sl.sv AS cv
           FROM ii JOIN sl USING (vec_id))"""]
    for i in range(1, iters + 1):
        sql.append(f""",
asg{i} AS (SELECT vec_id, sub_id, cent_id, sv FROM (
    SELECT sl.vec_id, sl.sub_id, kk.cent_id, sl.sv,
           row_number() OVER (PARTITION BY sl.vec_id, sl.sub_id
             ORDER BY round(list_distance(sl.sv, kk.cv), 6), kk.cent_id) AS r
    FROM sl JOIN cents{i - 1} kk USING (sub_id)) WHERE r = 1),
new{i} AS (SELECT sub_id, cent_id, list(mu ORDER BY pos) AS cv FROM (
    SELECT a.sub_id, a.cent_id, t.i AS pos, avg(a.sv[t.i]) AS mu
    FROM asg{i} a CROSS JOIN range(1, {dsub + 1}) t(i)
    GROUP BY a.sub_id, a.cent_id, t.i) GROUP BY sub_id, cent_id),
cents{i} AS (SELECT kk.sub_id, kk.cent_id, COALESCE(n.cv, kk.cv) AS cv
             FROM cents{i - 1} kk
             LEFT JOIN new{i} n USING (sub_id, cent_id))""")
    code_cols = ", ".join(
        f"max(CASE WHEN sub_id = {s} THEN cent_id END) AS c{s}"
        for s in range(m))
    joins = "\n".join(
        f"           JOIN dt d{s} ON d{s}.sub_id = {s} AND d{s}.cent_id = ep.c{s}"
        + ("" if s == 0 else " AND d{0}.query_id = d0.query_id".format(s))
        for s in range(m))
    add = "d0.pd"
    for s in range(1, m):
        add = f"({add} + d{s}.pd)"
    sql.append(f""",
encf AS (SELECT vec_id, sub_id, cent_id FROM (
    SELECT sl.vec_id, sl.sub_id, kk.cent_id,
           row_number() OVER (PARTITION BY sl.vec_id, sl.sub_id
             ORDER BY round(list_distance(sl.sv, kk.cv), 6), kk.cent_id) AS r
    FROM sl JOIN cents{iters} kk USING (sub_id)) WHERE r = 1),
ep AS (SELECT vec_id, {code_cols} FROM encf GROUP BY vec_id),
dt AS (SELECT q.vec_id AS query_id, kk.sub_id, kk.cent_id,
              list_inner_product(
                q.v[kk.sub_id * {dsub} + 1 : kk.sub_id * {dsub} + {dsub}],
                kk.cv) AS pd
       FROM c q CROSS JOIN cents{iters} kk WHERE q.vec_id < {nq}),
scored AS (SELECT d0.query_id, ep.vec_id AS neighbor_id,
                  round({add}, 6) AS score
           FROM ep
{joins}
           WHERE ep.vec_id <> d0.query_id),
r AS (SELECT query_id, neighbor_id, score,
             CAST(row_number() OVER (PARTITION BY query_id
               ORDER BY score DESC, neighbor_id) AS INT) AS rank
      FROM scored)
SELECT query_id, neighbor_id, score, rank FROM r WHERE rank <= {k}""")
    return "".join(sql)


@query("ann_pq_adc_topk", _pq_oracle())
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN (similarity.pq_train/pq_encode/
    pq_adc_topk): per-subspace L2 codebooks trained by a grouped Lloyd
    pass (all M subspaces in the same jobs), corpus compressed to M code
    bytes per vector, ADC top-k via per-query partial-dot tables — the
    memory-bandwidth scale path beside IVF routing and RHP bucketing.
    Hash-verified end to end: the DuckDB twin replays init, both Lloyd
    iterations, encoding, and the left-associated ADC fold, so a drift
    anywhere in train/encode/search breaks the hash. Quality floors
    (recall on clustered data, reconstruction error) are pinned in
    tests/test_operators.py."""
    from amundsendatabuilder_spark.operators.similarity import (
        pq_adc_topk, pq_encode, pq_train)
    (emb,) = _t(spark, sf_dir, "embeddings")
    books = pq_train(emb, m=4, ksub=16, dim=64, iters=2)
    enc = pq_encode(emb, books)
    return pq_adc_topk(enc, books, emb.where(F.col("vec_id") < 8),
                       k=10, m=4, dim=64)


@query("kmeans_centroids", _kmeans_oracle())
def kmeans_centroids(spark, sf_dir):
    """Lloyd k-means fit over the embeddings table
    (similarity.kmeans_fit): per-iteration broadcast assignment + k×dim
    mean aggregation, driver-side k×dim state only. Hash-verified against
    a DuckDB twin with the 3 Lloyd iterations unrolled into SQL (seeding
    and tie-breaks are deterministic, so member counts must agree
    exactly); cluster-recovery invariants in tests/test_operators.py."""
    from amundsendatabuilder_spark.operators.similarity import kmeans_fit
    (emb,) = _t(spark, sf_dir, "embeddings")
    fitted = kmeans_fit(emb, k=8, max_iters=3)
    return fitted.select("cent_id", "n_members",
                         F.size("embedding").alias("dims"))


@query("doc_chunking", r"""
WITH t AS (SELECT doc_id, """ + _TOKS_SQL + r""" AS toks FROM documents),
c AS (SELECT doc_id, toks, i
      FROM (SELECT doc_id, toks,
                   unnest(range(0, ((len(toks) - 1) // 48) + 1)) AS i
            FROM t WHERE len(toks) > 0))
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       CAST(len(toks[i*48+1 : i*48+64]) AS BIGINT) AS n_tokens,
       md5(array_to_string(toks[i*48+1 : i*48+64], ' ')) AS chunk_md5
FROM c
""")
def doc_chunking(spark, sf_dir):
    """Context-window chunking (textops.chunk_documents): 64-token chunks
    with 16-token overlap, chunk content hashed — one narrow pass, zero
    shuffle."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.chunk_documents(docs, chunk_tokens=64, overlap_tokens=16)


@query("cross_source_overlap", r"""
WITH t AS (SELECT source AS src, """ + _TOKS_SQL + r""" AS toks FROM documents),
g AS (SELECT DISTINCT src,
             toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
             toks[i+3] || ' ' || toks[i+4] AS shingle
      FROM (SELECT src, toks, unnest(range(1, len(toks) - 3)) AS i FROM t))
SELECT a.src AS source_a, b.src AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM g a JOIN g b ON a.shingle = b.shingle AND a.src < b.src
GROUP BY 1, 2
""")
def cross_source_overlap_query(spark, sf_dir):
    """Provenance contamination matrix (textops.cross_source_overlap):
    distinct word-5-grams shared per source pair; only (source, shingle)
    pairs shuffle, per-shingle fan-out bounded by source-pair count."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.cross_source_overlap(docs, n=5)


# ---------------------------------------------------------------------------
# Round-2 additions: split assignment, provenance dedup report, boilerplate
# chunks, length histogram, embedding quantization
# ---------------------------------------------------------------------------

@query("split_assign", """
SELECT doc_id,
       CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      AS BIGINT) < 52428 THEN 'train'
            WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                      AS BIGINT) < 58982 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""")
def split_assign_query(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split by md5 bucket
    (textops.split_assign): stable across runs/engines/partitionings,
    zero shuffle — the reproducible-split contract rand() cannot give."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.split_assign(docs)


@query("dedup_rate_by_source", r"""
WITH f AS (SELECT source,
                  md5(array_to_string(list_filter(
                      string_split_regex(trim(lower(text)), '\s+'),
                      x -> x <> ''), ' ')) AS fp
           FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_unique,
       round(1.0 - count(DISTINCT fp) / count(*), 6) AS dup_rate
FROM f GROUP BY source
""")
def dedup_rate_by_source_query(spark, sf_dir):
    """Per-source duplication scorecard (textops.dedup_rate_by_source):
    the report that decides which provenance needs aggressive dedup.
    One shuffle of 32-byte fingerprints."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.dedup_rate_by_source(docs)


@query("boilerplate_chunks", r"""
WITH t AS (SELECT doc_id, """ + _TOKS_SQL + r""" AS toks FROM documents),
c AS (SELECT doc_id,
             md5(array_to_string(toks[i*16+1 : i*16+16], ' ')) AS chunk_md5
      FROM (SELECT doc_id, toks,
                   unnest(range(0, ((len(toks) - 1) // 16) + 1)) AS i
            FROM t WHERE len(toks) > 0)),
rep AS (SELECT chunk_md5 FROM c GROUP BY 1
        HAVING count(DISTINCT doc_id) >= 2)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN chunk_md5 IN (SELECT chunk_md5 FROM rep)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
       round(sum(CASE WHEN chunk_md5 IN (SELECT chunk_md5 FROM rep)
                      THEN 1 ELSE 0 END) / count(*), 6) AS boilerplate_frac
FROM c GROUP BY doc_id
""")
def boilerplate_chunks_query(spark, sf_dir):
    """Cross-document repeated-chunk profile
    (textops.boilerplate_chunk_stats) — the CCNet-style boilerplate
    detection pass: 16-token chunks hashed once, repeated-chunk set from
    one hash groupBy, left-semi flag join; only 32-byte hashes shuffle."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.boilerplate_chunk_stats(docs, chunk_tokens=16)


@query("strip_boilerplate", r"""
WITH t AS (SELECT doc_id, """ + _TOKS_SQL + r""" AS tk FROM documents),
c AS (SELECT doc_id, i AS chunk_idx,
             array_to_string(tk[(i*8+1):((i+1)*8)], ' ') AS chunk
      FROM (SELECT doc_id, tk,
                   unnest(range(0, CAST(floor((len(tk)-1)/8) AS INT) + 1)) AS i
            FROM t WHERE len(tk) > 0)),
f AS (SELECT doc_id, chunk_idx, chunk,
             count(*) OVER (PARTITION BY chunk) AS df
      FROM c),
r AS (SELECT doc_id,
             coalesce(array_to_string(list(chunk ORDER BY chunk_idx)
                                      FILTER (WHERE df <= 3), ' '), '')
                 AS clean_text,
             CAST(count(*) FILTER (WHERE df <= 3) AS BIGINT) AS n_chunks_kept,
             CAST(count(*) FILTER (WHERE df > 3) AS BIGINT) AS n_chunks_dropped
      FROM f GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(r.clean_text, '') AS clean_text,
       CAST(coalesce(r.n_chunks_kept, 0) AS BIGINT) AS n_chunks_kept,
       CAST(coalesce(r.n_chunks_dropped, 0) AS BIGINT) AS n_chunks_dropped
FROM documents d LEFT JOIN r USING (doc_id)
""")
def strip_boilerplate_query(spark, sf_dir):
    """Boilerplate PASSAGE removal (textops.strip_boilerplate): 8-token
    spans occurring more than 3× corpus-wide are dropped and the
    survivors reassembled in order — the repeated-span cleaner between
    exact and near dedup (detection profile above; this is the cleaner).
    The fixture exercises the drop path (3 spans exceed the cap at
    sf0.01); the DuckDB twin recomputes chunking, windowed occurrence
    counts, and ordered reassembly."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.strip_boilerplate(docs, chunk_tokens=8, max_df=3)


_NB_MODEL_CTES = r"""WITH d AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
grams AS (SELECT doc_id, lang, substr(t, i, 3) AS gram
          FROM (SELECT doc_id, lang, t, unnest(range(1, len(t) - 1)) AS i
                FROM d WHERE len(t) >= 3)),
counts AS (SELECT lang, gram, CAST(count(*) AS DOUBLE) AS c
           FROM grams GROUP BY 1, 2),
totals AS (SELECT lang, sum(c) AS total FROM counts GROUP BY 1),
vocab AS (SELECT CAST(count(DISTINCT gram) AS DOUBLE) AS v FROM counts),
priors AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n_docs FROM d GROUP BY 1),
n_all AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM d),
model AS (SELECT c.lang, c.gram,
                 round(ln((c.c + 1) / (t.total + v.v)), 9) AS logp,
                 round(ln(1 / (t.total + v.v)), 9) AS default_logp,
                 round(ln(p.n_docs / n_all.n), 9) AS log_prior
          FROM counts c JOIN totals t ON c.lang = t.lang CROSS JOIN vocab v
          JOIN priors p ON c.lang = p.lang CROSS JOIN n_all),"""


@query("langid_nb", _NB_MODEL_CTES + r"""
doc_grams AS (SELECT doc_id, gram, CAST(count(*) AS DOUBLE) AS m
              FROM grams GROUP BY 1, 2),
doc_sizes AS (SELECT doc_id, greatest(len(t) - 2, 0) AS g_total FROM d),
lang_stats AS (SELECT DISTINCT lang, default_logp, log_prior FROM model),
matched AS (SELECT g.doc_id, mo.lang,
                   sum(CAST(round(round(g.m * mo.logp, 9) * 1e9) AS BIGINT))
                       / 1e9 AS hit_sum,
                   sum(g.m) AS matched_m
            FROM doc_grams g JOIN model mo ON g.gram = mo.gram
            GROUP BY 1, 2),
scored AS (SELECT s.doc_id, ls.lang,
                  ls.log_prior + coalesce(ma.hit_sum, 0)
                  + round((s.g_total - coalesce(ma.matched_m, 0))
                          * ls.default_logp, 9) AS raw
           FROM doc_sizes s CROSS JOIN lang_stats ls
           LEFT JOIN matched ma ON ma.doc_id = s.doc_id AND ma.lang = ls.lang),
ranked AS (SELECT doc_id, lang, raw,
                  row_number() OVER (PARTITION BY doc_id
                                     ORDER BY raw DESC, lang) AS r
           FROM scored)
SELECT doc_id, lang AS predicted_lang, round(raw, 6) AS score
FROM ranked WHERE r = 1
""")
def langid_nb_query(spark, sf_dir):
    """Char-trigram multinomial Naive Bayes language ID, trained on the
    corpus's own labels and applied back to it (textops.langid_nb_fit +
    langid_nb_predict) — the REAL algorithm language_id's heuristic
    documents itself as standing in for. Log-probs and per-gram partials
    round to 9 decimals and the matched-gram sum folds in gram order, so
    the DuckDB twin (identical arithmetic via list_sum ORDER BY)
    hash-matches the full train+score pipeline."""
    from amundsendatabuilder_spark.operators.textops import (
        langid_nb_fit, langid_nb_predict)
    (docs,) = _t(spark, sf_dir, "documents")
    model = langid_nb_fit(docs, n=3)
    return langid_nb_predict(docs, model, n=3)


@query("lm_fluency", _NB_MODEL_CTES + r"""
doc_grams AS (SELECT doc_id, lang, gram, CAST(count(*) AS DOUBLE) AS m
              FROM grams GROUP BY 1, 2, 3),
matched AS (SELECT g.doc_id, g.lang,
                   sum(CAST(round(round(g.m * mo.logp, 9) * 1e9) AS BIGINT))
                       / 1e9 AS hit_sum,
                   sum(g.m) AS matched_m
            FROM doc_grams g JOIN model mo
              ON g.gram = mo.gram AND g.lang = mo.lang
            GROUP BY 1, 2),
lang_stats AS (SELECT DISTINCT lang, default_logp FROM model),
base AS (SELECT doc_id, lang, greatest(len(t) - 2, 0) AS g_total FROM d)
SELECT b.doc_id, b.lang,
       CASE WHEN b.g_total > 0 THEN
         round((coalesce(ma.hit_sum, 0)
                + round((b.g_total - coalesce(ma.matched_m, 0))
                        * ls.default_logp, 9)) / b.g_total, 6)
       END AS avg_logp
FROM base b JOIN lang_stats ls ON ls.lang = b.lang
LEFT JOIN matched ma ON ma.doc_id = b.doc_id AND ma.lang = b.lang
""")
def lm_fluency(spark, sf_dir):
    """CCNet-style LM fluency scoring (textops.lm_fluency_score): each
    document's average per-char-trigram log-prob under its own language's
    fitted NB model — the in-engine perplexity-filter signal pretraining
    pipelines gate corpora on. Hash-verified: the oracle rebuilds the
    model (shared CTEs with langid_nb) and the per-doc exact nano-unit
    partial sums."""
    from amundsendatabuilder_spark.operators.textops import (
        langid_nb_fit, lm_fluency_score)
    (docs,) = _t(spark, sf_dir, "documents")
    model = langid_nb_fit(docs, n=3)
    return lm_fluency_score(docs, model, n=3)


@query("bm25_topk", r"""
WITH base AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents),
len AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM len),
hits AS (SELECT doc_id, unnest(tk) AS term FROM base),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM hits WHERE term IN ('hash', 'join', 'merge', 'sort')
       GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
part AS (SELECT tf.doc_id, tf.term,
                round(ln(1 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)),
                      9) AS part
         FROM tf JOIN dfx USING (term)
         JOIN len l ON tf.doc_id = l.doc_id
         CROSS JOIN stats s),
summed AS (SELECT doc_id, round(list_sum(list(part ORDER BY term)), 6) AS score
           FROM part GROUP BY doc_id)
SELECT doc_id, score,
       CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
FROM summed ORDER BY score DESC, doc_id LIMIT 10
""")
def bm25_topk_query(spark, sf_dir):
    """In-engine BM25 ranking (operators/ranking.bm25_topk) — the
    query-side complement of the search-document builds the reference
    ships to Elasticsearch (whose default similarity IS BM25). Token
    stream filtered to query terms BEFORE aggregation (the corpus token
    explosion never shuffles); N/avgdl broadcast as a scalar aggregate;
    per-term partials rounded then folded in term order so the double sum
    is bit-reproducible cross-engine; distributed top-k."""
    from amundsendatabuilder_spark.operators.ranking import bm25_topk
    (docs,) = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, "hash join merge sort", k=10)


@query("token_count_histogram", r"""
WITH d AS (SELECT lang AS stratum,
                  CAST(len(""" + _TOKS_SQL + r""") AS BIGINT) AS n
           FROM documents)
SELECT stratum, (n // 16) * 16 AS bucket_lo,
       CAST(count(*) AS BIGINT) AS n_docs
FROM d GROUP BY 1, 2
""")
def token_count_histogram_query(spark, sf_dir):
    """Fixed-width document-length histogram per language
    (textops.token_count_histogram): integer bucket edges (no float log)
    so the histogram is engine-identical; one tiny-cardinality groupBy."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.token_count_histogram(docs, bucket_width=16)


@query("quantize_embeddings", r"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (SELECT vec_id, v,
             round(list_max(list_transform(v, x -> abs(x))) / 127.0, 9)
                 AS scale
      FROM v)
SELECT vec_id, scale,
       array_to_string(list_transform(
           v, x -> CAST(CASE WHEN scale = 0 THEN 0
                             ELSE round(x / scale, 0) END AS BIGINT)), ',')
           AS q
FROM s
""")
def quantize_embeddings_query(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding column
    (similarity.quantize_embeddings): scale = max|x|/127 rounded to the
    stored precision, per-dim round-half-away — a pure projection, zero
    shuffle at any scale."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    from amundsendatabuilder_spark.operators.similarity import (
        quantize_embeddings)
    return quantize_embeddings(emb)


# ---------------------------------------------------------------------------
# Frequency / membership sketches (count-min, Bloom)
# ---------------------------------------------------------------------------

def _cms_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import (
        cms_oracle_fragment)
    frag = cms_oracle_fragment("tok", "tok", depth=4, width=512)
    return (r"""
WITH tok AS (SELECT unnest(""" + _LTOKS_SQL + r""") AS tok FROM documents),
""" + frag + r""",
exact AS (SELECT tok, CAST(count(*) AS BIGINT) AS exact_cnt
          FROM tok GROUP BY 1
          ORDER BY exact_cnt DESC, tok LIMIT 20),
probe_hb AS (SELECT DISTINCT tok, j, bucket FROM cms_hb
             WHERE tok IN (SELECT tok FROM exact)),
est AS (SELECT p.tok, min(coalesce(r.cnt, 0)) AS cms_cnt
        FROM probe_hb p LEFT JOIN cms_regs r USING (j, bucket)
        GROUP BY p.tok)
SELECT e.tok, e.exact_cnt, CAST(est.cms_cnt AS BIGINT) AS cms_cnt
FROM exact e JOIN est USING (tok)
ORDER BY e.exact_cnt DESC, e.tok
""")


@query("cms_heavy_hitters", _cms_oracle())
def cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch point queries for the corpus's top-20 tokens
    (operators/sketches.cms_registers/cms_lookup) — the mergeable
    frequency twin of the HLL entry. At 100 TB the register grid
    (depth 4 x width 512 counter rows) partial-aggregates map-side and is
    the ONLY thing that shuffles; daily/shard sketches merge with a
    further SUM. Estimates are one-sided (cms_cnt >= exact_cnt), which
    the paired exact column makes visible. Hash-verified: the DuckDB twin
    replays the one-md5 universal-hash family (hashing.minhash_constants)
    coordinate-for-coordinate, the register SUM grid, and the min-over-
    depth lookup in exact BIGINT arithmetic. Heavy-hitter candidates come
    from an exact pass here so the sketch error itself is pinned by the
    oracle; in production the candidate set comes from per-partition
    heads, keeping the whole pipeline one scan."""
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.operators import sketches
    from amundsendatabuilder_spark.session import ensure_parallelism
    (docs,) = _t(spark, sf_dir, "documents")
    tok = ensure_parallelism(docs).select(
        F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
    regs = sketches.cms_registers(tok, "tok", depth=4, width=512)
    exact = (tok.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_cnt"))
             .orderBy(F.col("exact_cnt").desc(), "tok").limit(20))
    est = sketches.cms_lookup(regs, exact.select("tok"), "tok",
                              depth=4, width=512)
    return (exact.join(est, "tok")
            .select("tok", "exact_cnt", F.col("cms_cnt").cast("long"))
            .orderBy(F.col("exact_cnt").desc(), "tok"))


def _bloom_oracle() -> str:
    from amundsendatabuilder_spark.functions.hashing import (
        udh_positions_sql)
    pos_exprs = udh_positions_sql("tok", 4, 131072)

    def pos_cte(src: str) -> str:
        return "\nUNION ALL\n".join(
            f"SELECT tok, {pos_exprs[j]} AS pos FROM {src}"
            for j in range(4))

    return (r"""
WITH t AS (SELECT source, """ + _TOKS_SQL + r""" AS toks FROM documents),
tok AS (SELECT source,
               toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS tok
        FROM (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i
              FROM t)),
bench AS (SELECT DISTINCT tok FROM tok
          WHERE source IN ('src0','src1','src2','src3')),
probes AS (SELECT DISTINCT tok FROM tok
           WHERE source NOT IN ('src0','src1','src2','src3')),
bpos AS (""" + pos_cte("bench") + r"""),
words AS (SELECT pos // 63 AS word_idx,
                 bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
          FROM bpos GROUP BY 1),
ppos AS (""" + pos_cte("probes") + r"""),
hits AS (SELECT p.tok,
                min(CASE WHEN w.bits IS NOT NULL
                          AND (w.bits & (CAST(1 AS BIGINT)
                                         << CAST(p.pos % 63 AS INT)))
                              = (CAST(1 AS BIGINT)
                                 << CAST(p.pos % 63 AS INT))
                         THEN 1 ELSE 0 END) AS hit
         FROM ppos p LEFT JOIN words w ON p.pos // 63 = w.word_idx
         GROUP BY p.tok),
flags AS (SELECT h.tok, h.hit = 1 AS maybe_member,
                 h.tok IN (SELECT tok FROM bench) AS is_present
          FROM hits h)
SELECT maybe_member, is_present, CAST(count(*) AS BIGINT) AS n_tokens
FROM flags GROUP BY 1, 2 ORDER BY 1, 2
""")


@query("bloom_decontam_membership", _bloom_oracle())
def bloom_decontam_membership(spark, sf_dir):
    """Bloom-filter membership probe for decontamination
    (operators/sketches.bloom_build/bloom_probe): the benchmark sources'
    distinct word-3-gram shingles are packed into a 2^17-bit filter
    (~16 bits/element at this corpus -> ~0.2% theoretical fp)
    (63 bits per BIGINT word — sign bit clear so checked ANSI shifts
    never overflow — built by one map-side-combined bit_or), and every
    other source's shingle is probed against the broadcast word table — the at-scale alternative to
    semi-joining a 100 TB corpus against a reference set. Output is the
    (maybe_member, is_present) contingency: no-false-negatives shows as
    an empty (false, true) cell; the (true, false) cell counts the
    filter's false positives at this m/n. Hash-verified: the twin replays
    bit positions, packed words, and probe tests in exact integer math."""
    from amundsendatabuilder_spark.functions.text import word_shingles
    from amundsendatabuilder_spark.operators import sketches
    (docs,) = _t(spark, sf_dir, "documents")
    bench_srcs = ["src0", "src1", "src2", "src3"]
    from amundsendatabuilder_spark.session import ensure_parallelism
    tok = ensure_parallelism(docs).select(
        "source", F.explode(word_shingles(F.col("text"), 3)).alias("tok"))
    # the explode feeds both bench and probes — materialize it once
    tok = tok.localCheckpoint()
    bench = (tok.where(F.col("source").isin(bench_srcs))
             .select("tok").distinct())
    probes = (tok.where(~F.col("source").isin(bench_srcs))
              .select("tok").distinct())
    bloom = sketches.bloom_build(bench, "tok", m_bits=131072, k=4)
    flagged = sketches.bloom_probe(probes, bloom, "tok",
                                   m_bits=131072, k=4)
    exact = flagged.join(bench.withColumn("is_present", F.lit(True)),
                         "tok", "left").fillna({"is_present": False})
    return (exact.groupBy("maybe_member", "is_present")
            .agg(F.count(F.lit(1)).alias("n_tokens"))
            .orderBy("maybe_member", "is_present"))


@query("duplicate_substring_spans", r"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
g AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
             substr(md5(substring(text, CAST(pos AS INT), 20)), 1, 16) AS gh
      FROM (SELECT doc_id, text, unnest(range(1, n - 20 + 2)) AS pos
            FROM d WHERE n >= 20)),
dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM g WHERE gh IN (SELECT gh FROM dup)),
w AS (SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                       IS NULL
                   OR pos - lag(pos) OVER (PARTITION BY doc_id
                                           ORDER BY pos) > 20
                  THEN 1 ELSE 0 END AS brk
      FROM hits),
i AS (SELECT doc_id, pos,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS isl
      FROM w)
SELECT doc_id, min(pos) AS span_start, max(pos) + 19 AS span_end,
       max(pos) + 20 - min(pos) AS span_len,
       CAST(count(*) AS BIGINT) AS n_windows
FROM i GROUP BY doc_id, isl
ORDER BY doc_id, span_start
""")
def duplicate_substring_spans(spark, sf_dir):
    """Exact substring-duplicate spans (operators/dedup.duplicate_spans):
    maximal character ranges whose every 20-char window repeats somewhere
    in the corpus — the Spark-native form of the suffix-array dedup pass
    of Lee et al. 2022 (window fingerprints + corpus-frequency semi-join
    + per-doc gaps-and-islands instead of one monolithic suffix array).
    One row per character scans map-side; only (id, pos, hash16) tuples
    shuffle, and the semi-join keeps boilerplate windows linear in their
    occurrence count. Hash-verified: the DuckDB twin replays window
    positions, 64-bit md5-prefix fingerprints, the >=2 frequency cut, and
    the island merge row-for-row."""
    from amundsendatabuilder_spark.operators.dedup import duplicate_spans
    (docs,) = _t(spark, sf_dir, "documents")
    return (duplicate_spans(docs, gram_len=20)
            .orderBy("doc_id", "span_start"))


def _pagerank_oracle(iters: int = 3) -> str:
    unit, num, den = 10 ** 15, 17, 20
    head = f"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 3),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
consts AS (SELECT n, {unit} // n AS r0,
                  ((n * ({unit} // n)) * {den - num}) // ({den} * n) AS base
           FROM (SELECT count(*) AS n FROM nodes)),
outdeg AS (SELECT src AS node, count(*) AS outdeg FROM edges GROUP BY 1),
r0 AS (SELECT node, (SELECT r0 FROM consts) AS r FROM nodes)"""
    its = []
    for i in range(1, iters + 1):
        p = f"r{i - 1}"
        its.append(f"""
c{i} AS (SELECT e.dst AS node, sum((r.r * {num}) // ({den} * o.outdeg)) AS in_mass
       FROM edges e JOIN {p} r ON r.node = e.src
       JOIN outdeg o ON o.node = e.src
       GROUP BY 1),
d{i} AS (SELECT coalesce(sum(r.r), 0) AS dsum
       FROM {p} r LEFT JOIN outdeg o ON r.node = o.node
       WHERE o.outdeg IS NULL),
r{i} AS (SELECT n.node,
              cs.base + (d.dsum * {num}) // ({den} * cs.n)
              + coalesce(c.in_mass, 0) AS r
       FROM nodes n CROSS JOIN consts cs CROSS JOIN d{i} d
       LEFT JOIN c{i} c ON n.node = c.node)""")
    return (head + "," + ",".join(its)
            + f"\nSELECT node, CAST(r AS BIGINT) AS r FROM r{iters} ORDER BY node")


@query("graph_pagerank", _pagerank_oracle())
def graph_pagerank(spark, sf_dir):
    """PageRank over the synthesized lineage DAG (k -> 2k, 2k+1, 3k over
    order keys) in exact integer arithmetic
    (operators/graph_algo.pagerank) — the importance ranking a catalog
    would run over its own table-lineage graph (the reference stores the
    edges, models/table_lineage.py, and leaves any analytics to the graph
    DB). Rational damping 17/20, per-edge floor division, dangling mass
    redistributed through a 1-row broadcast aggregate — no floats
    anywhere, so the DuckDB twin (3 unrolled iterations) matches
    bit-for-bit. Per iteration: one (node, long) join against edges + one
    map-side-combinable sum — rank state never exceeds 16 bytes/node."""
    from amundsendatabuilder_spark.operators.graph_algo import pagerank
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct().cache()
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return pagerank(edges, iters=3).orderBy("node")


@query("triangle_cooccurrence", """
WITH e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
deg AS (SELECT n, count(*) AS d
        FROM (SELECT u AS n FROM e0 UNION ALL SELECT v AS n FROM e0)
        GROUP BY 1),
o AS (SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN u ELSE v END AS a,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND u < v)
                  THEN v ELSE u END AS b
      FROM e0 JOIN deg du ON du.n = e0.u JOIN deg dv ON dv.n = e0.v),
w AS (SELECT e1.a AS a, e1.b AS b, e2.b AS c
      FROM o e1 JOIN o e2 ON e1.b = e2.a),
tri AS (SELECT a, b, c FROM w
        WHERE EXISTS (SELECT 1 FROM o WHERE o.a = w.a AND o.b = w.c)),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
       FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
             UNION ALL SELECT c FROM tri)
       GROUP BY 1)
SELECT node, n_triangles FROM pn ORDER BY n_triangles DESC, node LIMIT 10
""")
def triangle_cooccurrence(spark, sf_dir):
    """Top-10 parts by triangle participation in the order-co-occurrence
    graph (operators/graph_algo.triangle_counts) — the cohesion/community
    signal of graph analytics, run with compact-forward degree
    orientation so one hub part co-ordered with everything cannot fan
    out 10^12 wedges (its edges all point inward). Each triangle counted
    once; wedges closed by a semi-join; shuffle payload is id pairs.
    Hash-verified: the twin replays the distinct edge set, exact degree
    table, (degree, id) orientation, wedge join and closure."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        triangle_counts)
    (li,) = _t(spark, sf_dir, "lineitem")
    # co-occurrence pairs via ONE groupBy + map-side combination
    # expansion instead of a lineitem self-join: orders hold ~7 parts,
    # so collect_set stays tiny and the pair fan-out (~21/order) happens
    # AFTER the single shuffle — same distinct edge set as the
    # a.partkey < b.partkey self-join, one exchange instead of two
    # sorted join sides (measured ~35% off the edge-build stage)
    edges = (li.groupBy("l_orderkey")
             .agg(F.collect_set("l_partkey").alias("ps"))
             .select(F.explode(F.expr(
                 "flatten(transform(ps, x -> transform("
                 "filter(ps, y -> y > x), "
                 "y -> struct(x AS src, y AS dst))))")).alias("e"))
             .select("e.src", "e.dst"))
    return (triangle_counts(edges)
            .orderBy(F.col("n_triangles").desc(), "node").limit(10))


@query("funnel_stages", """
WITH a0 AS (SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS anchor
            FROM events WHERE event_type = 'signup' GROUP BY 1),
a1 AS (SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS anchor,
              min(CAST(floor(epoch(e.ts)) AS BIGINT)) - min(p.anchor) AS delay
       FROM events e JOIN a0 p USING (user_id)
       WHERE e.event_type = 'view'
         AND CAST(floor(epoch(e.ts)) AS BIGINT) > p.anchor
       GROUP BY e.user_id),
a2 AS (SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS anchor,
              min(CAST(floor(epoch(e.ts)) AS BIGINT)) - min(p.anchor) AS delay
       FROM events e JOIN a1 p USING (user_id)
       WHERE e.event_type = 'click'
         AND CAST(floor(epoch(e.ts)) AS BIGINT) > p.anchor
       GROUP BY e.user_id),
a3 AS (SELECT e.user_id, min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS anchor,
              min(CAST(floor(epoch(e.ts)) AS BIGINT)) - min(p.anchor) AS delay
       FROM events e JOIN a2 p USING (user_id)
       WHERE e.event_type = 'purchase'
         AND CAST(floor(epoch(e.ts)) AS BIGINT) > p.anchor
       GROUP BY e.user_id)
SELECT 0 AS stage_idx, 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users,
       CAST(NULL AS DOUBLE) AS avg_delay_sec FROM a0
UNION ALL SELECT 1, 'view', count(*),
       round(CAST(sum(delay) AS DOUBLE) / count(*), 4) FROM a1
UNION ALL SELECT 2, 'click', count(*),
       round(CAST(sum(delay) AS DOUBLE) / count(*), 4) FROM a2
UNION ALL SELECT 3, 'purchase', count(*),
       round(CAST(sum(delay) AS DOUBLE) / count(*), 4) FROM a3
ORDER BY stage_idx
""")
def funnel_stages_query(spark, sf_dir):
    """Strictly-ordered conversion funnel signup -> view -> click ->
    purchase (operators/attribution.funnel_stages): per user, each stage
    anchors at the earliest qualifying event AFTER the previous stage's
    anchor; output is users-reaching-stage plus mean seconds from the
    previous anchor (exact integer epoch sums, 4dp). One filtered
    min-agg + one user-key equi-join per stage — no global windows, so
    the chain co-locates end-to-end when bucketed by user_id."""
    from amundsendatabuilder_spark.operators.attribution import (
        funnel_stages)
    (events,) = _t(spark, sf_dir, "events")
    return funnel_stages(events, ["signup", "view", "click", "purchase"])


def _stream_cms_oracle() -> str:
    from amundsendatabuilder_spark.functions.hashing import (
        udh_positions_sql)
    pos = udh_positions_sql("v", 4, 512)
    hb = "\nUNION ALL\n".join(
        f"SELECT window_start, v, {j} AS j, {pos[j]} AS bucket FROM src"
        for j in range(4))
    phb = "\nUNION ALL\n".join(
        f"SELECT v, user_id, {j} AS j, {pos[j]} AS bucket FROM users"
        for j in range(4))
    return f"""
WITH src AS (SELECT date_trunc('hour', ts) AS window_start,
                    CAST(user_id AS VARCHAR) AS v FROM events),
hb AS ({hb}),
regs AS (SELECT window_start, j, bucket, count(*) AS cnt
         FROM hb GROUP BY 1, 2, 3),
wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
ew AS (SELECT DISTINCT window_start FROM regs, wm
       WHERE window_start + INTERVAL 1 HOUR <= wm.w),
users AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS v, user_id
          FROM events WHERE user_id < 10),
phb AS ({phb}),
est AS (SELECT e.window_start, p.user_id,
               min(coalesce(r.cnt, 0)) AS cms_cnt
        FROM ew e CROSS JOIN phb p
        LEFT JOIN regs r ON r.window_start = e.window_start
                        AND r.j = p.j AND r.bucket = p.bucket
        GROUP BY 1, 2)
SELECT window_start, user_id, cms_cnt FROM est ORDER BY 1, 2"""


@query("stream_windowed_heavy_hitters", _stream_cms_oracle())
def stream_windowed_heavy_hitters(spark, sf_dir):
    """Streaming per-window count-min registers
    (streaming/events.windowed_frequency_registers): the heavy-hitter
    twin of stream_windowed_distinct — state is capped at depth*width
    counter rows per window instead of one row per distinct user, COUNT
    merges map-side and across jobs with SUM. Registers drain
    append-mode; point estimates for a fixed probe panel (users 0-9) are
    folded batch-side via sketches.cms_lookup. Hash-verified: the twin
    replays the per-window register grid from the same md5 coordinates
    and restricts to windows past the final watermark, pinning sketch
    math AND append emission semantics."""
    import tempfile

    from amundsendatabuilder_spark.operators import sketches
    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_frequency_registers)
    regs = windowed_frequency_registers(_event_stream(spark, sf_dir))
    name = "swhh_" + next(tempfile._get_candidate_names())
    batch = run_to_memory(regs, spark, name, tempfile.mkdtemp())
    (events,) = _t(spark, sf_dir, "events")
    users = (events.where(F.col("user_id") < 10)
             .select(F.col("user_id").cast("string").alias("v")).distinct())
    # probes re-derive window_start from the same memory sink the register
    # join reads — round-trip through a rename to mint fresh attribute ids
    # (checkpoint alone keeps the exprId and trips self-join resolution)
    wins = (batch.select(F.col("window_start").alias("_ws")).distinct()
            .select(F.col("_ws").alias("window_start")))
    probes = wins.crossJoin(users)
    est = sketches.cms_lookup(batch, probes, "v",
                              group_cols=("window_start",))
    return (est.select("window_start",
                       F.col("v").cast("long").alias("user_id"), "cms_cnt")
            .orderBy("window_start", "user_id"))


@query("jaccard_prefix_join", r"""
WITH tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       round(CAST(p.inter AS DOUBLE) / (sa.s + sb.s - p.inter), 6)
           AS jaccard
FROM pairs p JOIN sz sa ON sa.doc_id = p.doc_a
JOIN sz sb ON sb.doc_id = p.doc_b
WHERE p.inter * 10 >= (sa.s + sb.s - p.inter) * 9
ORDER BY p.doc_a, p.doc_b
""")
def jaccard_prefix_join_query(spark, sf_dir):
    """Exact set-similarity join at Jaccard >= 9/10
    (operators/dedup.jaccard_prefix_join): prefix filtering over the
    rarest-first global token order plus the size filter — the PPJoin
    pruning family — then exact integer cross-multiplied verification.
    The oracle is the BRUTE-FORCE all-pairs join: a hash match proves
    the pruning is lossless (recall exactly 1.0), which is the property
    that separates this operator from the LSH entries."""
    from amundsendatabuilder_spark.operators.dedup import (
        jaccard_prefix_join)
    (docs,) = _t(spark, sf_dir, "documents")
    return (jaccard_prefix_join(docs, 9, 10)
            .orderBy("doc_a", "doc_b"))


@query("inverted_index_postings", r"""
WITH tok AS (SELECT doc_id, unnest(""" + _LTOKS_SQL + r""") AS term
             FROM documents),
tf AS (SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY 1, 2)
SELECT term, CAST(count(*) AS BIGINT) AS df, CAST(sum(tf) AS BIGINT) AS cf,
       string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(tf AS VARCHAR),
                  ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY term HAVING count(*) >= 25
ORDER BY term
""")
def inverted_index_postings(spark, sf_dir):
    """Inverted-index build (operators/ranking.build_postings): per-term
    document frequency, collection frequency, and the doc-ordered
    "doc:tf" posting list — the index structure the reference delegates
    to Elasticsearch, built as a Spark job. min_df=25 keeps the output
    to real index terms. Hash-verified: the twin reassembles every
    posting list in the same doc order."""
    from amundsendatabuilder_spark.operators.ranking import build_postings
    (docs,) = _t(spark, sf_dir, "documents")
    return build_postings(docs, min_df=25).orderBy("term")


def _zorder_oracle() -> str:
    from amundsendatabuilder_spark.sinks.compaction import zorder_expr
    z = zorder_expr("l_partkey", "l_suppkey", 16, idiv="//")
    return f"""
WITH z AS (SELECT l_partkey, l_suppkey, {z} AS zval FROM lineitem),
zm AS (SELECT max(zval) AS zmax FROM z)
SELECT (zval * 64) // (zmax + 1) AS zbucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
FROM z, zm GROUP BY 1 ORDER BY 1"""


@query("zorder_layout_stats", _zorder_oracle())
def zorder_layout_stats(spark, sf_dir):
    """Z-order (Morton) clustering key for two-dimensional data layout
    (sinks/compaction.zorder_expr): per Z-range bucket (64 equal key
    ranges of the observed Z domain), the row count
    and the min/max bounding box of BOTH key columns — exactly the
    parquet footer stats a file written from that bucket would carry.
    Tight boxes in both dimensions are what let a 100 TB scan filtered
    on EITHER l_partkey or l_suppkey prune most files, where a plain
    (partkey, suppkey) sort only prunes on the leading column. Pure
    integer bit arithmetic, bit-identical in the DuckDB twin."""
    from amundsendatabuilder_spark.sinks.compaction import zorder_expr
    (li,) = _t(spark, sf_dir, "lineitem")
    z = li.select("l_partkey", "l_suppkey",
                  F.expr(zorder_expr("l_partkey", "l_suppkey", 16))
                  .alias("zval"))
    zm = z.agg(F.max("zval").alias("zmax"))
    z = z.crossJoin(F.broadcast(zm))
    return (z.groupBy((F.expr("(zval * 64) DIV (zmax + 1)")).alias("zbucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.min("l_partkey").alias("min_part"),
                 F.max("l_partkey").alias("max_part"),
                 F.min("l_suppkey").alias("min_supp"),
                 F.max("l_suppkey").alias("max_supp"))
            .orderBy("zbucket"))


@query("scd2_intervals", """
WITH o AS (SELECT user_id, event_type, ts, event_id,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev
           FROM events),
runs AS (SELECT user_id, event_type, ts, event_id FROM o
         WHERE prev IS NULL OR event_type <> prev),
iv AS (SELECT user_id, event_type, ts AS eff_from,
              lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS eff_to
       FROM runs)
SELECT user_id, event_type, eff_from, eff_to, eff_to IS NULL AS is_current
FROM iv ORDER BY user_id, eff_from
""")
def scd2_intervals_query(spark, sf_dir):
    """SCD type-2 dimension history from the event change stream
    (operators/asof.scd2_intervals): per user, one validity interval per
    value run (consecutive duplicates collapse), eff_to = next change,
    NULL while current. All windows partition by the dimension key —
    no global sort at any scale. Hash-verified row-for-row."""
    from amundsendatabuilder_spark.operators.asof import scd2_intervals
    (events,) = _t(spark, sf_dir, "events")
    return scd2_intervals(events).orderBy("user_id", "eff_from")


@query("linear_touch_credit", """
WITH conv AS (SELECT event_id AS conv_id, user_id,
                     CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS cus,
                     CAST(round(value * 1000000, 0) AS BIGINT) AS vm
              FROM events WHERE event_type = 'purchase'),
touch AS (SELECT user_id AS tu,
                 CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS tus
          FROM events WHERE event_type = 'view'),
pairs AS (SELECT c.conv_id, c.user_id, c.cus, c.vm, t.tus
          FROM conv c JOIN touch t ON c.user_id = t.tu
          WHERE t.tus <= c.cus AND t.tus > c.cus - 3600000000),
ranked AS (SELECT conv_id, user_id, tus, vm,
                  count(*) OVER (PARTITION BY conv_id) AS n,
                  row_number() OVER (PARTITION BY conv_id
                                     ORDER BY tus DESC) AS rk
           FROM pairs)
SELECT conv_id, user_id, tus AS touch_us,
       (vm // n) + CASE WHEN rk = 1 THEN vm - (vm // n) * n ELSE 0 END
           AS credit_micros
FROM ranked ORDER BY conv_id, touch_us
""")
def linear_touch_credit_query(spark, sf_dir):
    """Linear multi-touch attribution in exact integer micro-units
    (operators/attribution.linear_touch_credit): value DIV n per touch,
    remainder to the most recent touch so each conversion's credits sum
    exactly to its value — float credit splitting can never be
    hash-pinned. Same user-key interval join as conversion_attribution;
    the rank window partitions by conversion id only."""
    from amundsendatabuilder_spark.operators.attribution import (
        linear_touch_credit)
    (events,) = _t(spark, sf_dir, "events")
    return (linear_touch_credit(events)
            .orderBy("conv_id", "touch_us"))


@query("bloom_prejoin_reduction", """
SELECT l.l_suppkey, CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
WHERE s.s_nationkey = 5
GROUP BY 1 ORDER BY 1
""")
def bloom_prejoin_reduction(spark, sf_dir):
    """Bloom-filter join reduction (sketches.bloom_build +
    bloom_prefilter): the dim side's join keys are packed into a bit
    filter, the fact side is pre-filtered map-side BEFORE its shuffle,
    and the real join then discards the false positives — so the result
    is EXACTLY the plain join, which is what the oracle runs. At 100 TB
    this is the reduction for dims too large to broadcast raw (the
    filter is m/63 BIGINT words regardless of dim cardinality); Spark's
    own runtime row-group filters cover only the broadcastable case.
    Exercises no-false-negatives end-to-end: a single dropped true row
    would break the hash."""
    from amundsendatabuilder_spark.operators import sketches
    li, sup = _t(spark, sf_dir, "lineitem", "supplier")
    dim = sup.where(F.col("s_nationkey") == 5)
    bloom = sketches.bloom_build(
        dim.select(F.col("s_suppkey").cast("string").alias("key")), "key")
    pre = sketches.bloom_prefilter(li, bloom, "l_suppkey")
    joined = pre.join(dim, pre["l_suppkey"] == dim["s_suppkey"])
    return (joined.groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 round_half_away(F.sum(
                     F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                     2).alias("revenue"))
            .orderBy("l_suppkey"))


@query("densify_daily", """
WITH vm AS (SELECT user_id, date_trunc('day', ts) AS day,
                   CAST(round(value * 1000000, 0) AS BIGINT) AS v
            FROM events),
daily AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(v) AS BIGINT) AS value_micros
          FROM vm GROUP BY 1, 2),
span AS (SELECT user_id, date_trunc('day', min(ts)) AS d0,
                date_trunc('day', max(ts)) AS d1
         FROM events GROUP BY 1),
cal AS (SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY))
               AS day
        FROM span)
SELECT c.user_id, c.day,
       coalesce(d.n_events, 0) AS n_events,
       coalesce(d.value_micros, 0) AS value_micros
FROM cal c LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
ORDER BY c.user_id, c.day
""")
def densify_daily_query(spark, sf_dir):
    """Per-user daily densification with zero-filled gaps
    (operators/asof.densify_daily): the calendar explodes from each
    user's own active span and the fill join is user-keyed — the
    trend-feature prerequisite a bare groupBy gets wrong by dropping
    quiet days. Exact integer micro-unit sums; hash-verified
    row-for-row against generate_series."""
    from amundsendatabuilder_spark.operators.asof import densify_daily
    (events,) = _t(spark, sf_dir, "events")
    return densify_daily(events).orderBy("user_id", "day")


@query("rolling_trailing_sum", """
WITH base AS (SELECT event_id, user_id,
                     CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS eus,
                     CAST(round(value * 1000000, 0) AS BIGINT) AS vm
              FROM events)
SELECT event_id, user_id, eus,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(sum(vm) OVER w AS BIGINT) AS trailing_micros
FROM base
WINDOW w AS (PARTITION BY user_id ORDER BY eus
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
ORDER BY user_id, eus, event_id
""")
def rolling_trailing_sum_query(spark, sf_dir):
    """Per-event 24h trailing count/value sum
    (operators/asof.rolling_trailing_sum): the velocity-feature
    primitive, as a RANGE frame over integer epoch micros so frame
    membership and tie-peer handling are engine-exact; BIGINT sums are
    order-free. User-partitioned windows only."""
    from amundsendatabuilder_spark.operators.asof import (
        rolling_trailing_sum)
    (events,) = _t(spark, sf_dir, "events")
    return (rolling_trailing_sum(events)
            .orderBy("user_id", "eus", "event_id"))


@query("bigram_pmi_topk", r"""
WITH t AS (SELECT doc_id, """ + _LTOKS_SQL + r""" AS toks FROM documents),
tk AS (SELECT doc_id, i, toks[i] AS tok
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
             FROM t)),
bi AS (SELECT a.tok AS w1, b.tok AS w2, CAST(count(*) AS BIGINT) AS c_ab
       FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.i = a.i + 1
       GROUP BY 1, 2),
uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tk GROUP BY 1),
tot AS (SELECT (SELECT sum(c_ab) FROM bi) AS m,
               (SELECT sum(c) FROM uni) AS n),
scored AS (SELECT w1, w2, c_ab,
                  round(ln(((CAST(c_ab AS DOUBLE) / CAST(m AS DOUBLE))
                            / CAST(ca.c AS DOUBLE)) * CAST(n AS DOUBLE)
                           / CAST(cb.c AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                      AS pmi
           FROM bi JOIN uni ca ON ca.tok = bi.w1
           JOIN uni cb ON cb.tok = bi.w2 CROSS JOIN tot
           WHERE c_ab >= 10)
SELECT w1, w2, c_ab, pmi,
       CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS rank
FROM scored ORDER BY pmi DESC, w1, w2 LIMIT 20
""")
def bigram_pmi_topk_query(spark, sf_dir):
    """Top-20 bigram collocations by PMI
    (operators/textops.bigram_pmi_topk) — phrase mining / tokenizer
    merge candidates. Counts exact; the PMI ratio evaluates in one fixed
    left-associated double expression (same libm ln both engines) then
    rounds to 6dp with bigram tie-breaks; distributed top-k over the
    min_count survivors."""
    from amundsendatabuilder_spark.operators.textops import bigram_pmi_topk
    (docs,) = _t(spark, sf_dir, "documents")
    return bigram_pmi_topk(docs, k=20, min_count=10)


@query("multimodal_spectral_peak", """
SELECT i AS media_id, CAST(c AS INT) AS chunk_idx,
       CAST(8000 AS BIGINT) AS n_samples,
       CAST(200 + (i % 16) * 100 AS INT) AS peak_bin
FROM (SELECT unnest(range(0, 32)) AS i) t,
     (SELECT unnest(range(0, 2)) AS c) u
ORDER BY media_id, chunk_idx
""")
def multimodal_spectral_peak(spark, sf_dir):
    """Dominant-frequency bin per audio chunk
    (operators/multimodal.audio_spectral_peak): REAL NumPy rfft over
    PCM16 windows, arg-max bin above DC. The pure-tone fixtures
    (synthetic_tones: integer Hz over exactly-1s windows) concentrate
    all energy in one bin, so the peak has the closed form
    200 + (i%16)*100 — a hash match proves the FFT kernel, the sample
    windowing, and the chunk fan-out all land on the right bin for
    every chunk of every asset."""
    from amundsendatabuilder_spark.operators.multimodal import (
        audio_spectral_peak, synthetic_tones)
    return (audio_spectral_peak(synthetic_tones(spark, n=32), chunk_ms=1000)
            .orderBy("media_id", "chunk_idx"))


@query("decayed_popularity", """
WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS mts FROM events),
w AS (SELECT user_id,
             least((mts - CAST(floor(epoch(ts)) AS BIGINT)) // 86400, 62)
                 AS age_days
      FROM events, mx)
SELECT user_id,
       CAST(sum(CAST(1000000 AS BIGINT) >> age_days) AS BIGINT)
           AS popularity_units
FROM w GROUP BY user_id ORDER BY user_id
""")
def decayed_popularity(spark, sf_dir):
    """Time-decayed usage popularity — the ranking signal the reference
    feeds Elasticsearch as total_usage (neo4j_search_data_extractor's
    SearchData, models/usage/*) upgraded with recency: each event is
    worth 2^(-age_days), computed as an integer bit shift
    (1e6 >> age_days, age capped at 62) so the decay sum is EXACT and
    order-free — the float exp() formulation can never be hash-pinned.
    One map-side-combinable aggregation; the corpus max-ts anchor is a
    1-row broadcast."""
    (events,) = _t(spark, sf_dir, "events")
    ep = F.unix_timestamp(F.col("ts"))
    mx = events.agg(F.max(ep).alias("mts"))
    aged = (events.select("user_id", ep.alias("es"))
            .crossJoin(F.broadcast(mx))
            .select("user_id",
                    F.least(F.expr("(mts - es) DIV 86400"), F.lit(62))
                    .cast("int").alias("age_days")))
    # 64-bit base: Java's shift masks the count mod the operand width, so
    # an INT literal here would turn age_days in [32, 62] into large
    # nonzero weights (33 -> 500000) instead of ~0. A BIGINT base masks
    # mod 64, so the least(..., 62) cap behaves as intended.
    return (aged.groupBy("user_id")
            .agg(F.sum(F.expr("shiftright(CAST(1000000 AS BIGINT), age_days)"))
                 .alias("popularity_units"))
            .orderBy("user_id"))


@query("stratified_fixed_k", """
WITH h AS (SELECT lang, doc_id,
                  md5('sfk:' || CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
r AS (SELECT lang, doc_id,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
                  AS INT) AS rk
      FROM h)
SELECT lang, doc_id, rk FROM r WHERE rk <= 10 ORDER BY lang, rk
""")
def stratified_fixed_k_query(spark, sf_dir):
    """Exactly-10-per-language deterministic sample
    (operators/textops.stratified_fixed_k): md5-ordered rank inside each
    stratum — fixed COUNT per stratum where hash_sample fixes the RATE.
    Seedless and re-runnable; per-stratum windows only."""
    from amundsendatabuilder_spark.operators.textops import (
        stratified_fixed_k)
    (docs,) = _t(spark, sf_dir, "documents")
    return stratified_fixed_k(docs, k=10).orderBy("lang", "rk")


@query("burst_windows", """
WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS window_start,
                       CAST(count(*) AS BIGINT) AS n_events
                FROM events GROUP BY 1, 2),
w AS (SELECT event_type, window_start, n_events,
             CAST(coalesce(sum(n_events) OVER tw, 0) AS BIGINT) AS prev_sum,
             count(n_events) OVER tw AS prev_n
      FROM hourly
      WINDOW tw AS (PARTITION BY event_type ORDER BY window_start
                    ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
SELECT event_type, window_start, n_events, prev_sum,
       prev_n = 6 AND n_events * 6 > 3 * prev_sum AS is_burst
FROM w ORDER BY event_type, window_start
""")
def burst_windows_query(spark, sf_dir):
    """Hourly burst detection per event type
    (operators/asof.burst_windows): count > 3x the trailing-6-window
    mean, tested as the integer cross-multiplication n*6 > 3*sum so no
    float mean enters; under-observed window heads never flag. One
    map-side hourly pre-agg, then a ROWS window over the tiny series."""
    from amundsendatabuilder_spark.operators.asof import burst_windows
    (events,) = _t(spark, sf_dir, "events")
    return (burst_windows(events, trailing=6, factor=3)
            .orderBy("event_type", "window_start"))


@query("mixture_epochs", r"""
WITH avail AS (SELECT source,
                      CAST(sum(len(""" + _LTOKS_SQL + r""")) AS BIGINT)
                          AS avail_tokens
               FROM documents GROUP BY 1),
wt AS (SELECT * FROM (VALUES ('src0', 400000), ('src1', 300000),
                             ('src2', 200000), ('src3', 100000))
       t(source, ppm))
SELECT a.source, a.avail_tokens,
       CAST(coalesce(wt.ppm, 0) AS BIGINT) AS ppm,
       CAST(10000000 AS BIGINT) * coalesce(wt.ppm, 0) // 1000000
           AS needed_tokens,
       CASE WHEN CAST(10000000 AS BIGINT) * coalesce(wt.ppm, 0) // 1000000
                 = 0 THEN 0
            WHEN a.avail_tokens = 0 THEN NULL
            ELSE (100 * (CAST(10000000 AS BIGINT) * coalesce(wt.ppm, 0)
                         // 1000000)
                  + a.avail_tokens - 1) // a.avail_tokens END
           AS epochs_x100
FROM avail a LEFT JOIN wt ON a.source = wt.source
ORDER BY a.source
""")
def mixture_epochs_query(spark, sf_dir):
    """Mixture token-budget planning (operators/textops.mixture_epochs):
    per-source needed tokens under ppm weights for a 10M-token budget
    and the implied 2dp fixed-point epoch count (epochs_x100 > 100 =
    this source will repeat) — all integer ceil-division, no floats.
    The recipe table a data-mixing run is configured from."""
    from amundsendatabuilder_spark.operators.textops import mixture_epochs
    (docs,) = _t(spark, sf_dir, "documents")
    return (mixture_epochs(docs, 10_000_000,
                           {"src0": 400_000, "src1": 300_000,
                            "src2": 200_000, "src3": 100_000})
            .orderBy("source"))


@query("interval_overlap_join", """
WITH s AS (SELECT user_id, ts, value, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (SELECT user_id, sid,
                CAST(floor(epoch(min(ts)) * 1000000) AS BIGINT) AS l_start,
                CAST(floor(epoch(max(ts)) * 1000000) AS BIGINT) AS l_end
         FROM (SELECT user_id, ts,
                      sum(new_s) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS sid
               FROM s)
         GROUP BY user_id, sid),
inc AS (SELECT event_id AS r_id,
               CAST(floor(epoch(ts) * 1000000) AS BIGINT) - 900000000
                   AS r_start,
               CAST(floor(epoch(ts) * 1000000) AS BIGINT) + 900000000
                   AS r_end
        FROM events WHERE event_type = 'error' AND user_id < 5)
SELECT CAST(s.user_id * 1000000 + s.sid AS BIGINT) AS l_id, i.r_id,
       least(s.l_end, i.r_end) - greatest(s.l_start, i.r_start)
           AS overlap_us
FROM sess s JOIN inc i
  ON s.l_start <= i.r_end AND i.r_start <= s.l_end
ORDER BY l_id, r_id
""")
def interval_overlap_join_query(spark, sf_dir):
    """Bin-bucketed interval-overlap join
    (operators/asof.interval_overlap_join): user sessions x global
    error-incident windows (+-15 min around errors of users 0-4). The
    oracle is the BRUTE-FORCE overlap-predicate join — a hash match
    proves the hourly bucketing loses no overlapping pair and
    double-counts none, which is the whole claim of the bin strategy
    (candidates = bin co-residents, never |L| x |R|)."""
    from amundsendatabuilder_spark.operators.asof import (
        interval_overlap_join)
    from amundsendatabuilder_spark.streaming.events import sessionize_batch
    (events,) = _t(spark, sf_dir, "events")
    sess = (sessionize_batch(events)
            .select((F.col("user_id") * 1_000_000 + F.col("session_id"))
                    .alias("l_id"),
                    F.col("session_start_us").alias("l_start"),
                    F.col("session_end_us").alias("l_end")))
    inc = (events.where((F.col("event_type") == "error")
                        & (F.col("user_id") < 5))
           .select(F.col("event_id").alias("r_id"),
                   (F.unix_micros(F.col("ts")) - 900_000_000)
                   .alias("r_start"),
                   (F.unix_micros(F.col("ts")) + 900_000_000)
                   .alias("r_end")))
    return (interval_overlap_join(sess, inc)
            .orderBy("l_id", "r_id"))


@query("containment_join", r"""
WITH tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
          GROUP BY 1, 2)
SELECT p.doc_a, p.doc_b,
       round(CAST(p.inter AS DOUBLE) / sa.s, 6) AS containment
FROM pairs p JOIN sz sa ON sa.doc_id = p.doc_a
WHERE sa.s >= 10 AND p.inter * 10 >= sa.s * 9
ORDER BY p.doc_a, p.doc_b
""")
def containment_join_query(spark, sf_dir):
    """Asymmetric containment join at |A∩B|/|A| >= 9/10
    (operators/dedup.containment_join): the quote/subset detector
    symmetric Jaccard structurally misses. A-side-only pigeonhole
    prefix filter, full-set B probe, exact integer verify. Oracle =
    brute-force all-pairs — the hash match proves the asymmetric
    pruning is lossless."""
    from amundsendatabuilder_spark.operators.dedup import containment_join
    (docs,) = _t(spark, sf_dir, "documents")
    return (containment_join(docs, 9, 10, min_tokens=10)
            .orderBy("doc_a", "doc_b"))


_COLLAPSE_SQL = r"""
reps AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
cdocs AS (SELECT d.doc_id, d.text FROM documents d
          JOIN reps USING (doc_id))"""


@query("jaccard_prefix_join_capped", r"""
WITH """ + _COLLAPSE_SQL + r""",
tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
        FROM cdocs),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
q AS (SELECT p.doc_a, p.doc_b,
             round(CAST(p.inter AS DOUBLE) / (sa.s + sb.s - p.inter), 6)
                 AS jaccard
      FROM pairs p JOIN sz sa ON sa.doc_id = p.doc_a
      JOIN sz sb ON sb.doc_id = p.doc_b
      WHERE p.inter * 10 >= (sa.s + sb.s - p.inter) * 9)
SELECT doc_a, doc_b, jaccard FROM q
QUALIFY row_number() OVER (PARTITION BY doc_a
                           ORDER BY jaccard DESC, doc_b) <= 25
ORDER BY doc_a, doc_b
""")
def jaccard_prefix_join_capped(spark, sf_dir):
    """jaccard_prefix_join with ALL THREE production guards engaged
    (operators/dedup.py): exact-text collapse (no-op on this fixture —
    zero identical texts — but the sf1 replica corpus has mass
    exact-dup clusters), max_token_df=450 (non-binding here, max fixture
    DF 402: the oracle proves the guard plumbing costs no recall, the
    standard dedup_ngram_jaccard_capped pattern), and the BINDING
    max_pairs_per_doc=25 output guard — the fixture's worst doc has 173
    partners, so the oracle's QUALIFY window must agree row-for-row on
    the deterministic (jaccard desc, doc_b) top-25. This is the
    configuration the sf1 headroom suite runs: output bounded at
    25·|docs| where the true pair set is quadratic in cluster size."""
    from amundsendatabuilder_spark.operators.dedup import (
        jaccard_prefix_join)
    (docs,) = _t(spark, sf_dir, "documents")
    return (jaccard_prefix_join(docs, 9, 10, collapse_exact=True,
                                max_token_df=450, max_pairs_per_doc=25)
            .orderBy("doc_a", "doc_b"))


@query("jaccard_prefix_join_frac_capped", r"""
WITH """ + _COLLAPSE_SQL + r""",
tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
        FROM cdocs),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cdocs),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
dfr AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
ordered AS (SELECT t.doc_id, t.tok, f.df, s.s,
                   row_number() OVER (PARTITION BY t.doc_id
                                      ORDER BY f.df, t.tok) AS i
            FROM tok t JOIN dfr f USING (tok) JOIN sz s USING (doc_id)),
prefix AS (SELECT * FROM ordered
           WHERE i <= s - (9 * s + 10 - 1) // 10 + 1),
capped AS (SELECT p.* FROM prefix p, nd WHERE p.df * 100 <= 9 * nd.n),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.s AS sa, b.s AS sb
         FROM capped a JOIN capped b
           ON a.tok = b.tok AND a.doc_id < b.doc_id
         WHERE b.s * 10 >= a.s * 9 AND b.s * 9 <= a.s * 10),
i0 AS (SELECT c.doc_a, c.doc_b, c.sa, c.sb, count(*) AS inter
       FROM cand c JOIN tok ta ON ta.doc_id = c.doc_a
            JOIN tok tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
       GROUP BY 1, 2, 3, 4),
q AS (SELECT doc_a, doc_b,
             round(CAST(inter AS DOUBLE) / (sa + sb - inter), 6) AS jaccard
      FROM i0 WHERE inter * 10 >= (sa + sb - inter) * 9)
SELECT doc_a, doc_b, jaccard FROM q
QUALIFY row_number() OVER (PARTITION BY doc_a
                           ORDER BY jaccard DESC, doc_b) <= 25
ORDER BY doc_a, doc_b
""")
def jaccard_prefix_join_frac_capped(spark, sf_dir):
    """The SCALE-INVARIANT capped configuration: collapse +
    max_token_df_frac=(9, 100) — a prefix token survives iff it appears
    in at most 9% of the (collapsed) corpus, exact integer
    cross-multiply — + the top-25 output guard. The absolute-capped
    twin (jaccard_prefix_join_capped, max_token_df=450) binds 10x
    harder at every 10x corpus growth (the sf1 headroom replica drove
    it to zero output); this fractional form keeps the same relative
    bite at every scale. The cap BINDS on this fixture (df > 45 of 500
    docs excluded), so the oracle replays the FULL PPJoin mechanics —
    rarest-first ordering, exact prefix-length arithmetic, the
    fractional DF gate, size-filtered candidates, exact intersection
    verify, deterministic top-25 — rather than the brute-force
    shortcut: a hash match pins the capped semantics themselves."""
    from amundsendatabuilder_spark.operators.dedup import (
        jaccard_prefix_join)
    (docs,) = _t(spark, sf_dir, "documents")
    return (jaccard_prefix_join(docs, 9, 10, collapse_exact=True,
                                max_token_df_frac=(9, 100),
                                max_pairs_per_doc=25)
            .orderBy("doc_a", "doc_b"))


@query("containment_join_capped", r"""
WITH """ + _COLLAPSE_SQL + r""",
tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
        FROM cdocs),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
          FROM tok a JOIN tok b ON a.tok = b.tok AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
q AS (SELECT p.doc_a, p.doc_b,
             round(CAST(p.inter AS DOUBLE) / sa.s, 6) AS containment
      FROM pairs p JOIN sz sa ON sa.doc_id = p.doc_a
      WHERE sa.s >= 10 AND p.inter * 10 >= sa.s * 9)
SELECT doc_a, doc_b, containment FROM q
QUALIFY row_number() OVER (PARTITION BY doc_a
                           ORDER BY containment DESC, doc_b) <= 25
ORDER BY doc_a, doc_b
""")
def containment_join_capped(spark, sf_dir):
    """containment_join with the same three production guards
    (collapse_exact + max_token_df=450 non-binding + BINDING
    max_pairs_per_doc=25; worst fixture doc has 245 containers). Runs
    in the sf1 headroom suite in place of the excluded uncapped form."""
    from amundsendatabuilder_spark.operators.dedup import containment_join
    (docs,) = _t(spark, sf_dir, "documents")
    return (containment_join(docs, 9, 10, min_tokens=10,
                             collapse_exact=True, max_token_df=450,
                             max_pairs_per_doc=25)
            .orderBy("doc_a", "doc_b"))


@query("similarity_cap_report", r"""
WITH tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
dfr AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
ordered AS (SELECT t.doc_id, t.tok, f.df, s.s,
                   row_number() OVER (PARTITION BY t.doc_id
                                      ORDER BY f.df, t.tok) AS i
            FROM tok t JOIN dfr f USING (tok) JOIN sz s USING (doc_id)),
prefix AS (SELECT * FROM ordered
           WHERE i <= s - (9 * s + 10 - 1) // 10 + 1),
ts AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens_over_cap
       FROM prefix WHERE df > 100),
ds AS (SELECT CAST(sum(n_over) AS BIGINT) AS n_prefix_rows_dropped,
              CAST(sum(CASE WHEN n_over = n_pref THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_docs_unreportable,
              CAST(count(*) AS BIGINT) AS n_docs_total
       FROM (SELECT doc_id,
                    count(*) FILTER (WHERE df > 100) AS n_over,
                    count(*) AS n_pref
             FROM prefix GROUP BY 1))
SELECT ts.n_tokens_over_cap, ds.n_prefix_rows_dropped,
       ds.n_docs_unreportable, ds.n_docs_total
FROM ts, ds
""")
def similarity_cap_report_query(spark, sf_dir):
    """The no-silent-caps audit for max_token_df
    (operators/dedup.similarity_cap_report): with cap=100 on this
    fixture the cap BITES (the 31-token synthetic vocabulary has 30
    tokens over DF 100), and the report surfaces exactly how many
    prefix tokens/rows a capped join would drop and how many docs
    become unreportable — run it before trusting any capped similarity
    join on a new corpus."""
    from amundsendatabuilder_spark.operators.dedup import (
        similarity_cap_report)
    (docs,) = _t(spark, sf_dir, "documents")
    return similarity_cap_report(docs, max_token_df=100,
                                 threshold_num=9, threshold_den=10)


@query("similarity_frac_cap_report", r"""
WITH """ + _COLLAPSE_SQL + r""",
tok AS (SELECT DISTINCT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
        FROM cdocs),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM cdocs),
sz AS (SELECT doc_id, count(*) AS s FROM tok GROUP BY 1),
dfr AS (SELECT tok, count(*) AS df FROM tok GROUP BY 1),
ordered AS (SELECT t.doc_id, t.tok, f.df, s.s,
                   row_number() OVER (PARTITION BY t.doc_id
                                      ORDER BY f.df, t.tok) AS i
            FROM tok t JOIN dfr f USING (tok) JOIN sz s USING (doc_id)),
prefix AS (SELECT p.*, nd.n FROM (SELECT * FROM ordered
           WHERE i <= s - (9 * s + 10 - 1) // 10 + 1) p, nd),
ts AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens_over_cap
       FROM prefix WHERE df * 100 > 9 * n),
ds AS (SELECT CAST(sum(n_over) AS BIGINT) AS n_prefix_rows_dropped,
              CAST(sum(CASE WHEN n_over = n_pref THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_docs_unreportable,
              CAST(count(*) AS BIGINT) AS n_docs_total
       FROM (SELECT doc_id,
                    count(*) FILTER (WHERE df * 100 > 9 * n) AS n_over,
                    count(*) AS n_pref
             FROM prefix GROUP BY 1))
SELECT ts.n_tokens_over_cap, ds.n_prefix_rows_dropped,
       ds.n_docs_unreportable, ds.n_docs_total
FROM ts, ds
""")
def similarity_frac_cap_report_query(spark, sf_dir):
    """The no-silent-caps audit for the SCALE-INVARIANT fractional cap,
    in exactly jaccard_prefix_join_frac_capped's configuration
    (collapse + max_token_df_frac=(9, 100), threshold 9/10): how many
    prefix tokens/rows the fractional gate df·100 > 9·n_docs drops and
    how many docs become unreportable — publish it next to any
    frac-capped result, the similarity_cap_report discipline applied to
    the new cap form."""
    from amundsendatabuilder_spark.operators.dedup import (
        similarity_cap_report)
    (docs,) = _t(spark, sf_dir, "documents")
    return similarity_cap_report(docs, threshold_num=9, threshold_den=10,
                                 max_token_df_frac=(9, 100),
                                 collapse_exact=True)


@query("journey_trigrams", """
WITH seq AS (SELECT user_id, event_type, ts, event_id,
                    lead(event_type, 1) OVER w AS e2,
                    lead(event_type, 2) OVER w AS e3
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_type AS e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, e1, e2, e3 LIMIT 20
""")
def journey_trigrams_query(spark, sf_dir):
    """Top-20 three-step user journeys (consecutive event-type
    trigrams per user ordered by time) — the path-mining pass behind
    funnel design: which sequences actually happen, before committing
    to one funnel definition. One per-user window pass + a tiny
    count; deterministic (count desc, lexicographic) top-k."""
    from pyspark.sql import Window
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"))
    counts = (seq.where(F.col("e3").isNotNull())
              .groupBy("e1", "e2", "e3")
              .agg(F.count(F.lit(1)).alias("n")))
    return counts.orderBy(F.col("n").desc(), "e1", "e2", "e3").limit(20)


def _active_users_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import hll_oracle_sql
    daily = hll_oracle_sql(
        "SELECT date_trunc('day', ts) AS grp, user_id FROM events",
        "user_id", ("grp",))
    weekly = hll_oracle_sql(
        "SELECT date_trunc('week', ts) AS grp, user_id FROM events",
        "user_id", ("grp",))
    return f"""
WITH d AS ({daily}), w AS ({weekly})
SELECT 'day' AS granularity, CAST(grp AS TIMESTAMP) AS period_start,
       round(approx_distinct, 6) AS active_users
FROM d
UNION ALL
SELECT 'week', CAST(grp AS TIMESTAMP), round(approx_distinct, 6) FROM w
ORDER BY granularity, period_start"""


@query("active_users_rollup", _active_users_oracle())
def active_users_rollup(spark, sf_dir):
    """DAU/WAU from ONE pass of per-day HLL registers
    (operators/sketches): daily active-user sketches are max-merged up
    to weeks WITHOUT re-reading events — the mergeability property that
    makes sketch tables the 100 TB answer to distinct-user rollups
    (store day registers once; any coarser period is a register max).
    Hash-verified: weekly estimates from merged day registers equal the
    oracle's direct weekly sketch because max-merge is exact, not
    approximate — the registers are identical by construction."""
    from amundsendatabuilder_spark.operators import sketches
    (events,) = _t(spark, sf_dir, "events")
    day_regs = sketches.hll_registers(
        events.select(F.date_trunc("day", "ts").alias("day"),
                      F.date_trunc("week", "ts").alias("week"), "user_id"),
        "user_id", ("day", "week")).localCheckpoint()
    daily = sketches.hll_estimate(
        day_regs.select(F.col("day").alias("grp"), "bucket", "r"), ("grp",))
    week_regs = (day_regs.groupBy(F.col("week").alias("grp"), "bucket")
                 .agg(F.max("r").alias("r")))
    weekly = sketches.hll_estimate(week_regs, ("grp",))
    out = (daily.select(F.lit("day").alias("granularity"),
                        F.col("grp").alias("period_start"),
                        round_half_away(F.col("approx_distinct"), 6)
                        .alias("active_users"))
           .unionByName(weekly.select(
               F.lit("week").alias("granularity"),
               F.col("grp").alias("period_start"),
               round_half_away(F.col("approx_distinct"), 6)
               .alias("active_users"))))
    return out.orderBy("granularity", "period_start")


def _cumulative_users_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import hll_oracle_sql
    # direct sketch of each prefix [min_day .. day] — what the running
    # register max must equal exactly
    return """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
pref AS (SELECT d.day AS grp, e.user_id
         FROM days d JOIN events e ON date_trunc('day', e.ts) <= d.day)
SELECT CAST(x.grp AS TIMESTAMP) AS day,
       round(x.approx_distinct, 6) AS cumulative_users
FROM (%s) x ORDER BY day""" % hll_oracle_sql(
        "SELECT grp, user_id FROM pref", "user_id", ("grp",))


@query("cumulative_active_users", _cumulative_users_oracle())
def cumulative_active_users(spark, sf_dir):
    """Running distinct-user curve from the stored day-register table
    (operators/sketches): per (bucket, day) running MAX over day order
    — a cumulative sketch for EVERY day from one register scan, where
    the naive form re-reads the whole event prefix per day (O(days x
    events)). The bucket/day grid is filled so silent days inherit the
    previous registers. Hash-verified against direct per-prefix
    sketches: running max-merge is exact, so every day's estimate
    matches the from-scratch sketch bit-for-bit."""
    from pyspark.sql import Window

    from amundsendatabuilder_spark.operators import sketches
    (events,) = _t(spark, sf_dir, "events")
    day_regs = sketches.hll_registers(
        events.select(F.date_trunc("day", "ts").alias("day"), "user_id"),
        "user_id", ("day",)).localCheckpoint()
    days = day_regs.select("day").distinct()
    buckets = day_regs.select("bucket").distinct()
    grid = days.crossJoin(buckets)
    filled = grid.join(day_regs, ["day", "bucket"], "left")
    w = (Window.partitionBy("bucket").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = (filled.withColumn("r", F.max("r").over(w))
           .where(F.col("r").isNotNull()))
    est = sketches.hll_estimate(
        cum.select(F.col("day").alias("grp"), "bucket", "r"), ("grp",))
    return (est.select(F.col("grp").alias("day"),
                       round_half_away(F.col("approx_distinct"), 6)
                       .alias("cumulative_users"))
            .orderBy("day"))


@query("joinability_discovery", """
WITH stacked AS (
  SELECT 'customer.c_custkey' AS col_id,
         CAST(c_custkey AS VARCHAR) AS v FROM customer
  UNION SELECT 'customer.c_nationkey', CAST(c_nationkey AS VARCHAR)
        FROM customer
  UNION SELECT 'lineitem.l_orderkey', CAST(l_orderkey AS VARCHAR)
        FROM lineitem
  UNION SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR)
        FROM lineitem
  UNION SELECT 'lineitem.l_suppkey', CAST(l_suppkey AS VARCHAR)
        FROM lineitem
  UNION SELECT 'nation.n_nationkey', CAST(n_nationkey AS VARCHAR)
        FROM nation
  UNION SELECT 'nation.n_regionkey', CAST(n_regionkey AS VARCHAR)
        FROM nation
  UNION SELECT 'orders.o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION SELECT 'orders.o_orderkey', CAST(o_orderkey AS VARCHAR)
        FROM orders
  UNION SELECT 'part.p_partkey', CAST(p_partkey AS VARCHAR) FROM part
  UNION SELECT 'region.r_regionkey', CAST(r_regionkey AS VARCHAR)
        FROM region
  UNION SELECT 'supplier.s_nationkey', CAST(s_nationkey AS VARCHAR)
        FROM supplier
  UNION SELECT 'supplier.s_suppkey', CAST(s_suppkey AS VARCHAR)
        FROM supplier),
sizes AS (SELECT col_id, count(*) AS n FROM stacked GROUP BY 1),
inter AS (SELECT a.col_id AS col_a, b.col_id AS col_b, count(*) AS i
          FROM stacked a JOIN stacked b
            ON a.v = b.v AND a.col_id <> b.col_id
          GROUP BY 1, 2)
SELECT i.col_a, i.col_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       round(CAST(i.i AS DOUBLE) / sa.n, 6) AS containment
FROM inter i JOIN sizes sa ON sa.col_id = i.col_a
JOIN sizes sb ON sb.col_id = i.col_b
WHERE i.i * 100 >= sa.n * 95
ORDER BY i.col_a, i.col_b
""")
def joinability_discovery_query(spark, sf_dir):
    """Joinable-column discovery over the TPC-H catalog
    (operators/profiling.joinability_discovery): value-set containment
    >= 95% between every ordered column pair — the join/FK-suggestion
    signal a data catalog derives from profiles (the reference stores
    the columns; this computes the discovery feature on top). Finds the
    real FK edges (c_nationkey -> n_nationkey, o_custkey -> c_custkey,
    l_partkey -> p_partkey, ...) with no schema hints. Hash-verified
    against the brute-force stack-and-join oracle."""
    from amundsendatabuilder_spark.operators.profiling import (
        joinability_discovery)
    t = load_tables(spark, sf_dir,
                    ("customer", "lineitem", "nation", "orders", "part",
                     "region", "supplier"))
    cols = {
        "customer.c_custkey": t["customer"].select("c_custkey"),
        "customer.c_nationkey": t["customer"].select("c_nationkey"),
        "lineitem.l_orderkey": t["lineitem"].select("l_orderkey"),
        "lineitem.l_partkey": t["lineitem"].select("l_partkey"),
        "lineitem.l_suppkey": t["lineitem"].select("l_suppkey"),
        "nation.n_nationkey": t["nation"].select("n_nationkey"),
        "nation.n_regionkey": t["nation"].select("n_regionkey"),
        "orders.o_custkey": t["orders"].select("o_custkey"),
        "orders.o_orderkey": t["orders"].select("o_orderkey"),
        "part.p_partkey": t["part"].select("p_partkey"),
        "region.r_regionkey": t["region"].select("r_regionkey"),
        "supplier.s_nationkey": t["supplier"].select("s_nationkey"),
        "supplier.s_suppkey": t["supplier"].select("s_suppkey"),
    }
    return (joinability_discovery(cols, 95, 100)
            .orderBy("col_a", "col_b"))


@query("k_anonymity_audit", """
SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS class_size
FROM customer
GROUP BY 1, 2 HAVING count(*) < 9
ORDER BY c_nationkey, c_mktsegment
""")
def k_anonymity_audit_query(spark, sf_dir):
    """k-anonymity screen over customer quasi-identifiers
    (operators/profiling.k_anonymity_audit): equivalence classes of
    (nation, market segment) smaller than k=9 — the combinations that
    could re-identify; only failing classes are emitted, the anonymous
    bulk never leaves the executors."""
    from amundsendatabuilder_spark.operators.profiling import (
        k_anonymity_audit)
    (cust,) = _t(spark, sf_dir, "customer")
    return (k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment"], k=9)
            .orderBy("c_nationkey", "c_mktsegment"))


@query("ri_violations", """
WITH dim AS (SELECT p_partkey FROM part WHERE p_partkey % 10 <> 0),
orphan AS (SELECT l.l_partkey FROM lineitem l
           LEFT JOIN dim p ON l.l_partkey = p.p_partkey
           WHERE p.p_partkey IS NULL)
SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_orphans
FROM orphan GROUP BY 1 ORDER BY 1
""")
def ri_violations_query(spark, sf_dir):
    """Referential-integrity audit lineitem.l_partkey -> part.p_partkey
    (operators/profiling.referential_integrity_audit): orphan counts
    via left_anti against the dimension key set — the verification pass
    for every FK edge joinability_discovery proposes. The dimension is
    read as a STALE snapshot (every 10th part dropped) so the audit has
    real violations to surface; on the intact dim it returns empty,
    which the unit test pins."""
    from amundsendatabuilder_spark.operators.profiling import (
        referential_integrity_audit)
    li, part = _t(spark, sf_dir, "lineitem", "part")
    stale_dim = part.where(F.col("p_partkey") % 10 != 0)
    return (referential_integrity_audit(li, "l_partkey", stale_dim,
                                        "p_partkey")
            .orderBy("l_partkey"))


@query("lineage_asof_diff", """
WITH RECURSIVE keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS (
  SELECT a.k AS src, b.k AS dst, a.k % 20 AS valid_from_day
  FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k, b.k, (a.k + 7) % 20
  FROM keys a JOIN keys b ON b.k = a.k * 2 + 1),
r1 AS (SELECT k AS root, k AS node, 0 AS depth FROM keys WHERE k <= 8
       UNION
       SELECT r1.root, e.dst, r1.depth + 1 FROM r1
       JOIN edges e ON e.src = r1.node AND e.valid_from_day <= 5
       WHERE r1.depth < 4),
r2 AS (SELECT k AS root, k AS node, 0 AS depth FROM keys WHERE k <= 8
       UNION
       SELECT r2.root, e.dst, r2.depth + 1 FROM r2
       JOIN edges e ON e.src = r2.node AND e.valid_from_day <= 15
       WHERE r2.depth < 4),
s1 AS (SELECT root, node FROM r1 WHERE depth > 0 AND node <> root),
s2 AS (SELECT root, node FROM r2 WHERE depth > 0 AND node <> root)
SELECT root, node FROM s2 EXCEPT SELECT root, node FROM s1
ORDER BY root, node
""")
def lineage_asof_diff(spark, sf_dir):
    """Time-travel lineage impact diff: reachable sets computed over
    the edge graph AS OF day 5 and day 15 (edges carry validity start
    days, the SCD2 pattern applied to lineage), then the day-15 \\ day-5
    difference — "which downstream dependencies appeared since the last
    audit", the question a catalog's change review asks. Pure
    composition: validity filter -> graph_algo.reachability twice ->
    left_anti diff; the oracle runs both recursive closures and EXCEPTs
    them."""
    from amundsendatabuilder_spark.operators.graph_algo import reachability
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct().cache()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    e1 = (a.join(b, F.col("b.k") == F.col("a.k") * 2)
          .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"),
                  (F.col("a.k") % 20).alias("valid_from_day")))
    e2 = (a.join(b, F.col("b.k") == F.col("a.k") * 2 + 1)
          .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"),
                  ((F.col("a.k") + 7) % 20).alias("valid_from_day")))
    edges = e1.unionByName(e2)
    sources = keys_df.where(F.col("k") <= 8).select(F.col("k").alias("src"))

    def snap(day):
        return (reachability(edges.where(F.col("valid_from_day") <= day)
                             .select("src", "dst"), sources, max_depth=4)
                .select("root", "node").localCheckpoint())

    # the AS-OF-day-5 snapshot is the bounded side (reachable set of 8
    # roots within 4 hops) — broadcast it so the diff is a map-side
    # anti-join instead of shuffling both closures into an SMJ
    return (snap(15).join(F.broadcast(snap(5)), ["root", "node"],
                          "left_anti")
            .orderBy("root", "node"))


def _corr_oracle() -> str:
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    sums = ["count(*)::DECIMAL(38,0) AS n"]
    for c in cols:
        sums.append(f"sum(CAST(round({c} * 100, 0) AS BIGINT)"
                    f"::DECIMAL(38,0)) AS s_{c}")
        sums.append(f"sum((CAST(round({c} * 100, 0) AS BIGINT)"
                    f" * CAST(round({c} * 100, 0) AS BIGINT))"
                    f"::DECIMAL(38,0)) AS ss_{c}")
    pairs = []
    for i, cx in enumerate(cols):
        for cy in cols[i + 1:]:
            sums.append(
                f"sum((CAST(round({cx} * 100, 0) AS BIGINT)"
                f" * CAST(round({cy} * 100, 0) AS BIGINT))"
                f"::DECIMAL(38,0)) AS sp_{cx}_{cy}")
            pairs.append((cx, cy))
    # Mirror the Spark plan's evaluation order exactly: the three moment
    # differences are computed in exact integer arithmetic (HUGEINT here,
    # DECIMAL(38,0) on the Spark side — same exact values) and only the
    # centered differences are cast to DOUBLE, avoiding the catastrophic
    # cancellation of the subtract-two-huge-doubles formulation.
    def _h(e):
        return f"CAST({e} AS HUGEINT)"
    rows = "\nUNION ALL\n".join(
        f"SELECT '{cx}' AS col_x, '{cy}' AS col_y, "
        f"round(CAST({_h('n')} * {_h(f'sp_{cx}_{cy}')}"
        f" - {_h(f's_{cx}')} * {_h(f's_{cy}')} AS DOUBLE)"
        f" / sqrt(CAST({_h('n')} * {_h(f'ss_{cx}')}"
        f" - {_h(f's_{cx}')} * {_h(f's_{cx}')} AS DOUBLE)"
        f" * CAST({_h('n')} * {_h(f'ss_{cy}')}"
        f" - {_h(f's_{cy}')} * {_h(f's_{cy}')} AS DOUBLE)), 6)"
        f" AS corr FROM wide"
        for cx, cy in pairs)
    return ("WITH wide AS (SELECT " + ", ".join(sums)
            + " FROM lineitem)\n" + rows + "\nORDER BY col_x, col_y")


@query("numeric_corr_matrix", _corr_oracle())
def numeric_corr_matrix_query(spark, sf_dir):
    """Pairwise Pearson correlation over lineitem measures
    (operators/profiling.numeric_corr_matrix): exact DECIMAL(38)
    sufficient statistics — order-independent where float corr() is
    shuffle-order-dependent and unverifiable — with the final ratio in
    one fixed double expression. One wide map-side aggregation for the
    whole matrix."""
    from amundsendatabuilder_spark.operators.profiling import (
        numeric_corr_matrix)
    (li,) = _t(spark, sf_dir, "lineitem")
    return (numeric_corr_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount"], scale=100)
        .orderBy("col_x", "col_y"))


@query("class_keywords", r"""
WITH tok AS (SELECT lang AS cls, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
counts AS (SELECT cls, tok, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
totals AS (SELECT cls, sum(c) AS total FROM counts GROUP BY 1),
dfreq AS (SELECT tok, count(*) AS df FROM counts GROUP BY 1),
nc AS (SELECT count(DISTINCT cls) AS n FROM counts),
scored AS (SELECT c.cls, c.tok, c.c,
                  round((CAST(c.c AS DOUBLE) / CAST(t.total AS DOUBLE))
                        * ln(CAST(nc.n AS DOUBLE) / CAST(d.df AS DOUBLE)),
                        6) AS score
           FROM counts c JOIN totals t ON c.cls = t.cls
           JOIN dfreq d ON c.tok = d.tok CROSS JOIN nc
           WHERE c.c >= 5),
r AS (SELECT cls, tok, c, score,
             CAST(row_number() OVER (PARTITION BY cls
                                     ORDER BY score DESC, tok) AS INT)
                 AS rank
      FROM scored)
SELECT cls, tok, c, score, rank FROM r WHERE rank <= 5
ORDER BY cls, rank
""")
def class_keywords_query(spark, sf_dir):
    """Top-5 distinctive tokens per language (c-TF-IDF,
    operators/textops.class_keywords): within-class frequency damped by
    cross-class document frequency — "what characterizes each stratum".
    Exact integer counts, one fixed double expression, token
    tie-breaks; rank windows only over min_count survivors."""
    from amundsendatabuilder_spark.operators.textops import class_keywords
    (docs,) = _t(spark, sf_dir, "documents")
    return (class_keywords(docs, "lang", k=5, min_count=5)
            .orderBy("cls", "rank"))


@query("markov_transitions_ppm", """
WITH seq AS (SELECT user_id, event_type AS e1,
                    lead(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS e2
             FROM events),
c2 AS (SELECT e1, e2, CAST(count(*) AS BIGINT) AS n
       FROM seq WHERE e2 IS NOT NULL GROUP BY 1, 2),
c1 AS (SELECT e1, sum(n) AS total FROM c2 GROUP BY 1)
SELECT c2.e1, c2.e2, c2.n,
       CAST(c2.n * 1000000 // c1.total AS BIGINT) AS p_ppm
FROM c2 JOIN c1 ON c2.e1 = c1.e1
ORDER BY c2.e1, c2.e2
""")
def markov_transitions_ppm(spark, sf_dir):
    """First-order event-type transition matrix with probabilities in
    exact parts-per-million (n * 1e6 DIV row_total — no float division)
    — the Markov summary of user behavior that journey_trigrams samples
    paths from. One per-user lead window + two tiny aggregations."""
    from pyspark.sql import Window
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(F.col("event_type").alias("e1"),
                        F.lead("event_type").over(w).alias("e2"))
    c2 = (seq.where(F.col("e2").isNotNull())
          .groupBy("e1", "e2").agg(F.count(F.lit(1)).alias("n")))
    c1 = c2.groupBy("e1").agg(F.sum("n").alias("total"))
    return (c2.join(F.broadcast(c1), "e1")
            .select("e1", "e2", "n",
                    F.expr("n * 1000000 DIV total").alias("p_ppm"))
            .orderBy("e1", "e2"))


@query("session_bounce_rate", """
WITH o AS (SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                          > 1800000000
                       THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (SELECT user_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o),
sess AS (SELECT user_id, sid, count(*) AS n_events
         FROM s GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounces,
       CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS bounce_ppm,
       CAST(max(n_events) AS BIGINT) AS max_session_events
FROM sess
""")
def session_bounce_rate(spark, sf_dir):
    """Session bounce summary over the gap-sessionized event stream
    (streaming/events.sessionize_batch): single-event sessions as exact
    ppm of all sessions — the engagement KPI computed on the SAME
    session definition the streaming sessionizer uses, so batch and
    stream reports agree by construction."""
    from amundsendatabuilder_spark.streaming.events import sessionize_batch
    (events,) = _t(spark, sf_dir, "events")
    sess = sessionize_batch(events)
    return sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .alias("n_bounces"),
        F.expr("sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) "
               "* 1000000 DIV count(*)").alias("bounce_ppm"),
        F.max("n_events").alias("max_session_events"))


# ---------------------------------------------------------------------------
# Round 7: corpus-selection + chunking + cluster-keeper policies
# ---------------------------------------------------------------------------

_QUALITY_CTE = r"""
qt AS (SELECT doc_id, text, """ + _TOKS_SQL + r""" AS toks FROM documents),
qm AS (SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(text)
                        - length(regexp_replace(text, '[.,;:!?''"()]', '', 'g'))
                   AS DOUBLE) / length(text) ELSE 0.0 END AS praw,
         CASE WHEN len(toks) > 0
              THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
              ELSE 0.0 END AS diversity
       FROM qt),
q AS (SELECT doc_id, n_tokens,
             round(least(n_tokens / 100.0, 1.0) * 0.4 + diversity * 0.4
                   + (1 - praw) * 0.2, 4) AS quality
      FROM qm)"""


@query("budget_selection", r"""
WITH """ + _QUALITY_CTE + r""",
c AS (SELECT doc_id, n_tokens, quality,
             CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS cum_tokens
      FROM q)
SELECT doc_id, n_tokens, quality, cum_tokens
FROM c WHERE cum_tokens <= 8000 ORDER BY doc_id
""")
def budget_selection_query(spark, sf_dir):
    """Token-budget corpus selection (textops.budget_selection): the
    highest-quality documents whose running token total fits an 8k
    budget, ordered (quality desc, doc_id). The Spark plan computes the
    global prefix sum DISTRIBUTED — quality is exactly 4dp, so integer
    quality bands partition the cumsum: per-band totals (≤10^4 rows)
    window into offsets, broadcast back, bands cumsum in parallel. The
    oracle is the naive single-window cumulative sum — a hash match
    proves the banded decomposition equals the global running total."""
    from amundsendatabuilder_spark.operators.textops import budget_selection
    (docs,) = _t(spark, sf_dir, "documents")
    return budget_selection(docs, budget_tokens=8000).orderBy("doc_id")


@query("content_defined_chunks", r"""
WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x <> '') AS toks
           FROM documents),
e AS (SELECT doc_id, unnest(toks) AS tok,
             unnest(range(0, len(toks))) AS pos
      FROM t),
b AS (SELECT doc_id, tok, pos,
             CASE WHEN pos > 0
                   AND substr(md5(lag(tok) OVER w || ' ' || tok), 1, 1) = '0'
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
c AS (SELECT doc_id, tok, pos,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS INT)
                 AS chunk_idx
      FROM b)
SELECT doc_id, chunk_idx, CAST(count(*) AS BIGINT) AS n_tokens,
       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
FROM c GROUP BY doc_id, chunk_idx ORDER BY doc_id, chunk_idx
""")
def content_defined_chunks_query(spark, sf_dir):
    """Content-defined chunking (textops.content_defined_chunks): chunk
    boundaries cut where md5(prev_token + ' ' + token) starts with '0'
    (1/16 per position, ~16-token mean chunks) — boundaries depend only
    on local content, so edits shift ONE chunk instead of re-cutting
    the tail, which is what makes chunk-level dedup stable across
    corpus versions. The oracle replays the rolling cut rule with
    window functions; the hash pins both the boundary rule and the
    position-ordered chunk digests."""
    from amundsendatabuilder_spark.operators.textops import (
        content_defined_chunks)
    (docs,) = _t(spark, sf_dir, "documents")
    return content_defined_chunks(docs).orderBy("doc_id", "chunk_idx")


@query("dedup_quality_winner", f"""
WITH RECURSIVE pairs AS ({_lsh_verified_sql()}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
          WHERE s.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a),
""" + _QUALITY_CTE + """,
ranked AS (SELECT c.component, c.node, q.quality,
                  row_number() OVER (PARTITION BY c.component
                                     ORDER BY q.quality DESC, c.node)
                      AS rk,
                  count(*) OVER (PARTITION BY c.component) AS n_docs
           FROM comp c JOIN q ON q.doc_id = c.node)
SELECT component, node AS winner, quality AS winner_quality,
       CAST(n_docs AS BIGINT) AS n_docs
FROM ranked WHERE rk = 1 ORDER BY component
""")
def dedup_quality_winner(spark, sf_dir):
    """Quality-keeper dedup clusters (dedup.quality_winner_clusters):
    the same LSH-verified near-dup groups as dedup_clusters, but each
    group's survivor is its highest-quality member (quality_score,
    doc_id tie-break) instead of the arbitrary min id — the keeper
    policy a production dedup actually ships. Oracle = recursive-CTE
    closure over the replayed verified pairs joined to the replayed
    quality scores, argmax per component."""
    from amundsendatabuilder_spark.operators.dedup import (
        quality_winner_clusters)
    (docs,) = _t(spark, sf_dir, "documents")
    return quality_winner_clusters(docs, threshold=0.7).orderBy("component")


@query("cdc_chunk_dedup_rate", r"""
WITH t AS (SELECT doc_id,
                  list_filter(string_split_regex(trim(lower(text)), '\s+'),
                              x -> x <> '') AS toks
           FROM documents),
e AS (SELECT doc_id, unnest(toks) AS tok,
             unnest(range(0, len(toks))) AS pos
      FROM t),
b AS (SELECT doc_id, tok, pos,
             CASE WHEN pos > 0
                   AND substr(md5(lag(tok) OVER w || ' ' || tok), 1, 1) = '0'
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
c AS (SELECT doc_id, tok, pos,
             CAST(sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS INT)
                 AS chunk_idx
      FROM b),
ch AS (SELECT doc_id, chunk_idx,
              md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
       FROM c GROUP BY doc_id, chunk_idx),
freq AS (SELECT chunk_md5, count(*) AS n FROM ch GROUP BY chunk_md5),
j AS (SELECT d.source, ch.chunk_md5, f.n
      FROM ch JOIN documents d USING (doc_id) JOIN freq f USING (chunk_md5))
SELECT source,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(*) FILTER (WHERE n > 1) AS BIGINT) AS dup_chunks,
       CAST(count(*) FILTER (WHERE n > 1) * 1000000 // count(*) AS BIGINT)
           AS dup_ppm
FROM j GROUP BY source ORDER BY source
""")
def cdc_chunk_dedup_rate(spark, sf_dir):
    """Chunk-granularity duplication audit per source — what fraction of
    each source's CONTENT-DEFINED chunks also appear elsewhere in the
    corpus (exact chunk-hash collision, the statistic CDC chunking
    exists to make stable across corpus versions). Composition:
    content_defined_chunks -> corpus-wide chunk-hash frequencies ->
    per-source duplicated-chunk ppm, all exact integer arithmetic.
    The doc->source join and the frequency join both ride on the chunk
    table (rows ~ tokens/16), never the raw text."""
    from amundsendatabuilder_spark.operators.textops import (
        content_defined_chunks)
    (docs,) = _t(spark, sf_dir, "documents")
    chunks = content_defined_chunks(docs).select("doc_id", "chunk_md5")
    freq = (chunks.groupBy("chunk_md5")
            .agg(F.count(F.lit(1)).alias("n")))
    src = docs.select("doc_id", "source")
    j = chunks.join(freq, "chunk_md5").join(src, "doc_id")
    dup = F.sum(F.when(F.col("n") > 1, 1).otherwise(0))
    return (j.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 dup.alias("dup_chunks"),
                 F.expr("sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) "
                        "* 1000000 DIV count(*)").alias("dup_ppm"))
            .orderBy("source"))


@query("fd_violations", r"""
WITH pairs(lhs, rhs) AS (VALUES
    ('o_orderkey', 'o_orderstatus'),
    ('o_custkey', 'o_orderpriority'),
    ('o_orderpriority', 'o_orderstatus'),
    ('o_orderstatus', 'o_orderpriority')),
tagged AS (
  SELECT p.lhs, p.rhs,
         CASE p.lhs WHEN 'o_orderkey' THEN CAST(o_orderkey AS VARCHAR)
                    WHEN 'o_custkey' THEN CAST(o_custkey AS VARCHAR)
                    WHEN 'o_orderpriority' THEN o_orderpriority
                    WHEN 'o_orderstatus' THEN o_orderstatus END AS lv,
         CASE p.rhs WHEN 'o_orderstatus' THEN o_orderstatus
                    WHEN 'o_orderpriority' THEN o_orderpriority
                    END AS rv
  FROM orders CROSS JOIN pairs p),
per_lhs AS (SELECT lhs, rhs, lv, count(DISTINCT rv) AS n_rhs
            FROM tagged GROUP BY 1, 2, 3)
SELECT lhs, rhs, CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS violation_ppm
FROM per_lhs GROUP BY lhs, rhs ORDER BY lhs, rhs
""")
def fd_violations_query(spark, sf_dir):
    """Approximate-FD discovery over orders
    (operators/profiling.fd_violations): four candidate dependencies
    scored in ONE shuffle via per-row pair explosion — o_orderkey ->
    o_orderstatus holds exactly (keys are unique), the custkey/priority/
    status candidates measure their true violation ppm.
    The catalog-profiling surface the reference's stats models feed
    from, generalized to dependencies."""
    from amundsendatabuilder_spark.operators.profiling import fd_violations
    (orders,) = _t(spark, sf_dir, "orders")
    return fd_violations(orders, [
        ("o_orderkey", "o_orderstatus"),
        ("o_custkey", "o_orderpriority"),
        ("o_orderpriority", "o_orderstatus"),
        ("o_orderstatus", "o_orderpriority"),
    ]).orderBy("lhs", "rhs")


@query("distribution_drift", r"""
WITH a AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
           FROM events),
h AS (SELECT e.event_type AS category,
             CASE WHEN epoch_us(e.ts) >= (a.mn + a.mx) // 2
                  THEN 1 ELSE 0 END AS second_half
      FROM events e CROSS JOIN a),
c AS (SELECT category,
             CAST(sum(1 - second_half) AS BIGINT) AS n_first,
             CAST(sum(second_half) AS BIGINT) AS n_second
      FROM h GROUP BY category),
t AS (SELECT CAST(sum(n_first) AS BIGINT) AS tf,
             CAST(sum(n_second) AS BIGINT) AS ts FROM c)
SELECT category,
       CAST(n_first * 1000000 // tf AS BIGINT) AS ppm_first,
       CAST(n_second * 1000000 // t.ts AS BIGINT) AS ppm_second,
       CAST(abs(n_first * 1000000 // tf - n_second * 1000000 // t.ts)
            AS BIGINT) AS abs_delta_ppm
FROM c CROSS JOIN t ORDER BY category
""")
def distribution_drift_query(spark, sf_dir):
    """Event-type distribution drift between the first and second half
    of the event window (profiling.distribution_drift): per-category
    shares in exact ppm + absolute deltas (sum/2 = total-variation
    distance ×1e6) — the hash-verifiable integer alternative to PSI.
    Two count-only shuffles; the time anchor is a 1-row broadcast."""
    from amundsendatabuilder_spark.operators.profiling import (
        distribution_drift)
    (events,) = _t(spark, sf_dir, "events")
    return distribution_drift(events, "event_type").orderBy("category")


@query("lateness_profile", r"""
WITH l AS (SELECT event_type,
                  max(epoch_us(ts)) OVER (ORDER BY event_id
                                          ROWS UNBOUNDED PRECEDING)
                  - epoch_us(ts) AS lateness
           FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(*) FILTER (WHERE lateness > 1000000) AS BIGINT)
           AS n_late_1000000us,
       CAST(count(*) FILTER (WHERE lateness > 60000000) AS BIGINT)
           AS n_late_60000000us,
       CAST(count(*) FILTER (WHERE lateness > 3600000000) AS BIGINT)
           AS n_late_3600000000us,
       CAST(count(*) FILTER (WHERE lateness > 7200000000) AS BIGINT)
           AS n_late_7200000000us,
       CAST(max(lateness) AS BIGINT) AS max_lateness_us
FROM l GROUP BY event_type ORDER BY event_type
""")
def lateness_profile_query(spark, sf_dir):
    """Watermark-sizing lateness audit (streaming/events.
    lateness_profile): per event type, how many events arrive more than
    1s/1m/1h/2h behind the running max event time in ingestion order —
    exactly the rows a streaming watermark of that delay would DROP.
    The companion analytic to the stream_* entries' 2h watermark:
    run it before choosing the delay, re-run when numDroppedRows climbs.
    Exact integer microseconds; oracle replays the running-max window."""
    from amundsendatabuilder_spark.streaming.events import lateness_profile
    (events,) = _t(spark, sf_dir, "events")
    return lateness_profile(events).orderBy("event_type")


def _pipeline_e2e_oracle() -> str:
    lsh = _lsh_verified_sql(threshold=0.7)
    # run the LSH stage over the filtered+collapsed corpus: the generated
    # body reads `documents` exactly once (its t CTE) — point it at kept
    body = lsh.strip().removeprefix("WITH ").replace(
        "FROM documents)", "FROM kept)", 1)
    return ("WITH RECURSIVE " + _QUALITY_CTE + r""",
fil AS (SELECT d.doc_id, d.text, d.lang
        FROM documents d JOIN q USING (doc_id) WHERE q.quality >= 0.58),
reps AS (SELECT min(doc_id) AS doc_id FROM fil GROUP BY md5(text)),
kept AS (SELECT f.doc_id, f.text, f.lang FROM fil f JOIN reps USING (doc_id)),
""" + body.rsplit("SELECT i.doc_a", 1)[0].rstrip().rstrip(",")
            + r""",
pairs AS (SELECT i.doc_a, i.doc_b
          FROM inter i JOIN sz za ON i.doc_a = za.doc_id
          JOIN sz zb ON i.doc_b = zb.doc_id
          WHERE CAST(i.i AS DOUBLE) / (za.n + zb.n - i.i) >= 0.7),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s2.b FROM reach r JOIN sym s2 ON s2.a = r.b
          WHERE s2.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a),
surv AS (SELECT k.doc_id, k.lang FROM kept k
         LEFT JOIN comp c ON c.node = k.doc_id
         WHERE c.node IS NULL OR c.component = k.doc_id),
sized AS (SELECT s.doc_id, s.lang AS stratum, q.n_tokens
          FROM surv s JOIN q ON q.doc_id = s.doc_id)
SELECT doc_id, stratum, n_tokens,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY stratum ORDER BY doc_id
                                       ROWS UNBOUNDED PRECEDING)
                   - n_tokens) / 2000.0) AS BIGINT) AS shard_id
FROM sized ORDER BY doc_id
""")


@query("pipeline_end_to_end", _pipeline_e2e_oracle())
def pipeline_end_to_end(spark, sf_dir):
    """The whole training-data pipeline as ONE composed plan — the
    proof that the curation operators chain: quality filter (score >=
    0.58) -> exact-text collapse -> LSH-verified near-dup clusters with
    min-id winner -> per-language token-budget shard packing. A user of
    the reference migrating a corpus build runs exactly this shape; the
    oracle replays every stage (quality SQL, md5 collapse, the full
    MinHash/band/verify pipeline over the FILTERED corpus, recursive-CTE
    components, windowed packing), so the hash pins all four stage
    boundaries at once — a drift anywhere in the chain breaks it.
    Returns (doc_id, stratum, n_tokens, shard_id) for the curated set."""
    from amundsendatabuilder_spark.operators.dedup import (
        collapse_exact_texts, lsh_verified_pairs)
    from amundsendatabuilder_spark.operators.graph_algo import (
        connected_components)
    from amundsendatabuilder_spark.operators.textops import (
        pack_shards, quality_metrics)
    (docs,) = _t(spark, sf_dir, "documents")
    q = quality_metrics(docs).select("doc_id", "quality")
    fil = docs.join(q.where(F.col("quality") >= 0.58).select("doc_id"),
                    "doc_id")
    kept = collapse_exact_texts(fil)
    pairs = lsh_verified_pairs(kept, threshold=0.7)
    comps = connected_components(pairs, src_col="doc_a", dst_col="doc_b")
    surv = (kept.join(comps, kept["doc_id"] == comps["node"], "left")
            .where(F.col("node").isNull()
                   | (F.col("component") == F.col("doc_id")))
            .select(kept["doc_id"], "text", "lang"))
    return pack_shards(surv, budget_tokens=2000).orderBy("doc_id")


@query("graph_match_varlen_undirected", """
WITH t AS (SELECT 'tpch://gold.s' || CAST(s_nationkey AS VARCHAR)
                  || '/' || s_name AS tk, s_suppkey AS sk
           FROM supplier),
t5 AS (SELECT tk FROM t WHERE sk % 5 = 0),
t3 AS (SELECT tk FROM t WHERE sk % 3 = 0)
SELECT 'pk' AS badge, tk || '/c1' AS n_key, 1 AS depth FROM t5
UNION SELECT 'iceberg', tk || '/c1', 1 FROM t5
UNION SELECT 'golden', tk || '/c2', 1 FROM t3
UNION SELECT 'pk', tk, 2 FROM t5
UNION SELECT 'iceberg', tk, 2 FROM t5
UNION SELECT 'golden', tk, 2 FROM t3
UNION SELECT 'pk', 'iceberg', 2 WHERE EXISTS (SELECT 1 FROM t5)
UNION SELECT 'iceberg', 'pk', 2 WHERE EXISTS (SELECT 1 FROM t5)
ORDER BY badge, depth, n_key
""")
def graph_match_varlen_undirected(spark, sf_dir):
    """Undirected variable-length match with type alternation —
    Cypher's ``MATCH (b:Badge)-[:COLUMN|HAS_BADGE*1..2]-(n)`` (the
    either-direction + multi-type surface of the reference's
    arbitrary-Cypher Neo4jExtractor, extractor/neo4j_extractor.py:
    79-113): from every badge, one undirected hop reaches its columns
    (HAS_BADGE reversed), two reach their tables (COLUMN reversed) AND
    the sibling badges sharing a column (HAS_BADGE forward again along
    a DIFFERENT relationship — pk<->iceberg co-occur on c1). Cypher
    relationship-uniqueness holds: no badge reaches itself at depth 2,
    because the only depth-2 route back bounces off the SAME HAS_BADGE
    edge it arrived on, which Neo4j forbids within a path. The
    rel_types filter excludes TABLE/DESCRIPTION edges, so schemas stay
    unreachable — the oracle enumerates exactly the {columns, tables,
    co-badges} closure from the construction residues."""
    from amundsendatabuilder_spark.sources.graph import match_var_path
    out = _badge_graph(spark, sf_dir)
    vp = match_var_path(out.nodes, out.rels, start_label="Badge",
                        rel_types=["COLUMN", "HAS_BADGE"],
                        direction="both", min_hops=1, max_hops=2)
    return (vp.select(F.col("n0_key").alias("badge"), "n_key", "depth")
            .orderBy("badge", "depth", "n_key"))


@query("fuzzy_entity_match", r"""
WITH n AS (SELECT s_suppkey AS id, lower(trim(s_name)) AS s FROM supplier)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.s, b.s) AS INT) AS distance
FROM n a JOIN n b ON a.id < b.id
WHERE levenshtein(a.s, b.s) <= 1
ORDER BY id_a, id_b
""")
def fuzzy_entity_match(spark, sf_dir):
    """Edit-distance-1 entity resolution over supplier names
    (operators/dedup.fuzzy_match_pairs): deletion-neighborhood
    (SymSpell) blocking generates candidates sharing a single-deletion
    variant, true levenshtein verifies — recall for distance <= 1 is
    exactly 1.0 by the pigeonhole construction, which is what the
    brute-force all-pairs oracle proves (sequentially numbered supplier
    names give a dense one-digit-apart pair set). Candidates ride
    variant buckets, never |df|^2."""
    from amundsendatabuilder_spark.operators.dedup import fuzzy_match_pairs
    (sup,) = _t(spark, sf_dir, "supplier")
    return (fuzzy_match_pairs(sup, "s_suppkey", "s_name")
            .orderBy("id_a", "id_b"))


@query("skew_salting_plan", r"""
WITH c AS (SELECT CAST(l_suppkey % 10 AS VARCHAR) AS key_value,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem GROUP BY 1),
h AS (SELECT key_value, n_rows,
             CAST((n_rows + 999) // 1000 AS BIGINT) AS salt_factor
      FROM c WHERE n_rows > 1000)
SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, key_value) AS INT)
           AS rank,
       key_value, n_rows, salt_factor,
       CAST((n_rows + salt_factor - 1) // salt_factor AS BIGINT)
           AS rows_per_bucket
FROM h ORDER BY rank
""")
def skew_salting_plan_query(spark, sf_dir):
    """The salting PLAN (functions/skew.salting_plan) between
    skew_report's audit and salted_join's fix: per hot key
    (l_suppkey % 10, every value hot at gate scale), the
    ceiling-division salt factor that brings its heaviest (key, salt)
    bucket under the 1k-row target (pinned so the plan BINDS at sf0.01
    — a 0-row plan certifies nothing), and the resulting bucket size.
    All-integer ceiling
    arithmetic — the plan a 100 TB job computes from a metadata-sized
    count table before committing a shuffle."""
    from amundsendatabuilder_spark.functions.skew import salting_plan
    (li,) = _t(spark, sf_dir, "lineitem")
    keyed = li.select((F.col("l_suppkey") % 10).alias("k"))
    return salting_plan(keyed, "k", target_rows_per_bucket=1_000)


@query("skew_report", r"""
WITH c AS (SELECT CAST(l_suppkey % 10 AS VARCHAR) AS key_value,
                  CAST(count(*) AS BIGINT) AS n_rows
           FROM lineitem GROUP BY 1),
t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS tot FROM c),
r AS (SELECT key_value, n_rows,
             CAST(row_number() OVER (ORDER BY n_rows DESC, key_value)
                  AS INT) AS rank
      FROM c)
SELECT rank, key_value, n_rows,
       CAST(n_rows * 1000000 // tot AS BIGINT) AS share_ppm
FROM r, t WHERE rank <= 5 ORDER BY rank
""")
def skew_report_query(spark, sf_dir):
    """Join-key skew pre-flight (functions/skew.skew_report): the top-5
    heaviest values of a deliberately low-cardinality key
    (l_suppkey % 10) with exact counts and ppm shares — the audit that
    decides whether salted_join/AQE skew handling is needed, in the
    same oracle-verifiable audit family as similarity_cap_report and
    lateness_profile."""
    from amundsendatabuilder_spark.functions.skew import skew_report
    (li,) = _t(spark, sf_dir, "lineitem")
    keyed = li.select((F.col("l_suppkey") % 10).alias("k"))
    return skew_report(keyed, "k", top_n=5).orderBy("rank")


@query("split_exact_counts", r"""
WITH h AS (SELECT doc_id, lang AS stratum,
                  md5('split:' || CAST(doc_id AS VARCHAR)) AS hh
           FROM documents),
r AS (SELECT doc_id, stratum,
             row_number() OVER (PARTITION BY stratum ORDER BY hh, doc_id)
                 AS rk,
             count(*) OVER (PARTITION BY stratum) AS n
      FROM h),
s AS (SELECT doc_id, stratum, rk, n,
             n * 8 // 10 AS q0, n // 10 AS q1,
             (n * 8) % 10 AS m0, n % 10 AS m1, n % 10 AS m2,
             n - (n * 8 // 10 + 2 * (n // 10)) AS rem
      FROM r),
b AS (SELECT doc_id, stratum, rk,
             q0 + CASE WHEN CAST(m1 > m0 AS INT) + CAST(m2 > m0 AS INT)
                            < rem THEN 1 ELSE 0 END AS seats0,
             q1 + CASE WHEN CAST(m0 >= m1 AS INT) + CAST(m2 > m1 AS INT)
                            < rem THEN 1 ELSE 0 END AS seats1
      FROM s)
SELECT doc_id, stratum,
       CASE WHEN rk <= seats0 THEN 'train'
            WHEN rk <= seats0 + seats1 THEN 'val'
            ELSE 'test' END AS split
FROM b ORDER BY stratum, doc_id
""")
def split_exact_counts_query(spark, sf_dir):
    """Count-exact stratified train/val/test split
    (textops.split_exact_counts): md5-ranked docs cut by
    largest-remainder seat allocation inside each language stratum, so
    per-stratum split sizes are EXACTLY floor/ceil of n*w/W — the
    complement of hash-based split_assign (rate-exact in expectation).
    The oracle replays rank, quotas, remainders, and the seat
    tie-break in closed form."""
    from amundsendatabuilder_spark.operators.textops import (
        split_exact_counts)
    (docs,) = _t(spark, sf_dir, "documents")
    return split_exact_counts(docs).orderBy("stratum", "doc_id")


@query("equi_depth_histogram", r"""
WITH b AS (SELECT l_returnflag,
                  ntile(10) OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice, l_orderkey,
                                           l_linenumber) AS bucket,
                  l_extendedprice
           FROM lineitem)
SELECT l_returnflag, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(l_extendedprice) AS low, max(l_extendedprice) AS high
FROM b GROUP BY 1, 2 ORDER BY l_returnflag, bucket
""")
def equi_depth_histogram_query(spark, sf_dir):
    """Equi-depth price histogram per return flag
    (profiling.equi_depth_histogram): 10 equal-count buckets with exact
    bounds — the quantile statistic an optimizer/profiler keeps per
    column, computed exactly via ntile over a TOTAL order (orderkey +
    linenumber break price ties, which is what makes the bucket
    assignment engine-reproducible and therefore hash-verifiable)."""
    from amundsendatabuilder_spark.operators.profiling import (
        equi_depth_histogram)
    (li,) = _t(spark, sf_dir, "lineitem")
    return (equi_depth_histogram(
        li, "l_extendedprice", group_cols=("l_returnflag",),
        n_buckets=10, order_cols=("l_orderkey", "l_linenumber"))
        .withColumn("bucket", F.col("bucket").cast("int"))
        .orderBy("l_returnflag", "bucket"))


# ---------------------------------------------------------------------------
# Round-7 continuation wave: tokenizer training, hybrid retrieval,
# robust outliers, community detection
# ---------------------------------------------------------------------------

def _bpe_oracle(iters: int = 3, vocab_size: int = 200) -> str:
    """Unrolled BPE twin. The merge pass is the greedy non-overlapping
    left-to-right pair merge expressed as gaps-and-islands: match
    positions grouped into consecutive runs, every other position from
    each run start selected (exactly what the Spark-side fold computes),
    merged symbols substituted and successor positions dropped."""
    head = r"""
WITH tok AS (SELECT unnest(""" + _LTOKS_SQL + r""") AS tok FROM documents),
wf AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM tok GROUP BY 1
       ORDER BY freq DESC, tok LIMIT """ + str(vocab_size) + r"""),
w0 AS (SELECT tok, freq,
              list_filter(string_split(tok, ''), x -> x <> '') AS l
       FROM wf)"""
    its = []
    for i in range(1, iters + 1):
        p = f"w{i - 1}"
        its.append(f"""
p{i} AS (SELECT l[j] AS a, l[j + 1] AS b, freq
       FROM {p}, unnest(range(1, len(l))) AS u(j)),
c{i} AS (SELECT a, b, CAST(sum(freq) AS BIGINT) AS cnt FROM p{i}
       GROUP BY 1, 2),
b{i} AS (SELECT a, b, cnt FROM c{i} ORDER BY cnt DESC, a DESC, b DESC
       LIMIT 1),
m{i} AS (SELECT w.tok, u.j AS pos
       FROM {p} w CROSS JOIN b{i} bb,
            unnest(range(1, len(w.l))) AS u(j)
       WHERE w.l[u.j] = bb.a AND w.l[u.j + 1] = bb.b),
g{i} AS (SELECT tok, pos,
              pos - row_number() OVER (PARTITION BY tok ORDER BY pos)
                  AS grp
       FROM m{i}),
sel{i} AS (SELECT tok, pos FROM (
         SELECT tok, pos, min(pos) OVER (PARTITION BY tok, grp) AS p0
         FROM g{i}) WHERE (pos - p0) % 2 = 0),
e{i} AS (SELECT tok, freq,
              CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
              unnest(l) AS sym
       FROM {p}),
w{i} AS (SELECT e.tok, e.freq,
              list(CASE WHEN s.pos IS NOT NULL THEN bb.a || bb.b
                        ELSE e.sym END ORDER BY e.pos) AS l
       FROM e{i} e CROSS JOIN b{i} bb
       LEFT JOIN sel{i} s ON s.tok = e.tok AND s.pos = e.pos
       LEFT JOIN sel{i} s2 ON s2.tok = e.tok AND s2.pos = e.pos - 1
       WHERE s2.pos IS NULL
       GROUP BY e.tok, e.freq)""")
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({i} AS INT) AS it, a AS sym_a, b AS sym_b,"
        f" cnt AS pair_count FROM b{i}" for i in range(1, iters + 1))
    return head + "," + ",".join(its) + "\n" + union + "\nORDER BY it"


@query("bpe_merge_training", _bpe_oracle())
def bpe_merge_training(spark, sf_dir):
    """BPE tokenizer merge training (textops.bpe_merges) — the greedy
    pair-merge loop of Sennrich et al. 2016 as pure DataFrame algebra,
    the tokenizer-side operator an LLM training-data pipeline needs
    beyond the reference's metadata scope. The corpus is touched once
    (word-frequency count); each of the 3 unrolled iterations then runs
    on the 200-row word table: adjacent-pair transform (no shuffle),
    map-side-combinable weighted count, 1-row argmax broadcast back, and
    a delimiter-unambiguous string replace. Exact integers end to end;
    the DuckDB twin replays delimiter encoding, pair extraction, the
    (cnt DESC, a DESC, b DESC) tie-break, and the non-overlapping
    left-to-right replace bit-for-bit."""
    from amundsendatabuilder_spark.operators.textops import bpe_merges
    (docs,) = _t(spark, sf_dir, "documents")
    return bpe_merges(docs, iters=3, vocab_size=200).orderBy("it")


@query("hybrid_rrf_fusion", r"""
WITH base AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents),
len AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM len),
hits AS (SELECT doc_id, unnest(tk) AS term FROM base),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM hits WHERE term IN ('hash', 'join', 'merge', 'sort')
       GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
part AS (SELECT tf.doc_id, tf.term,
                round(ln(1 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)),
                      9) AS part
         FROM tf JOIN dfx USING (term)
         JOIN len l ON tf.doc_id = l.doc_id
         CROSS JOIN stats s),
summed AS (SELECT doc_id, round(list_sum(list(part ORDER BY term)), 6) AS score
           FROM part GROUP BY doc_id),
bm AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT)
                  AS bm25_rank
       FROM summed ORDER BY score DESC, doc_id LIMIT 20),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
c AS (SELECT vec_id, embedding::DOUBLE[] AS cv FROM embeddings
      WHERE vec_id <> 0),
sc AS (SELECT vec_id AS doc_id,
              round(list_cosine_similarity(qv, cv), 6) AS cos
       FROM c CROSS JOIN q),
cr AS (SELECT doc_id,
              CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT)
                  AS cos_rank
       FROM sc ORDER BY cos DESC, doc_id LIMIT 20),
f AS (SELECT coalesce(bm.doc_id, cr.doc_id) AS doc_id,
             bm.bm25_rank, cr.cos_rank,
             CAST(coalesce(1000000 // (60 + bm.bm25_rank), 0)
                + coalesce(1000000 // (60 + cr.cos_rank), 0) AS BIGINT)
                 AS rrf_score
      FROM bm FULL OUTER JOIN cr ON bm.doc_id = cr.doc_id)
SELECT doc_id, bm25_rank, cos_rank, rrf_score,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT)
           AS fused_rank
FROM f ORDER BY rrf_score DESC, doc_id LIMIT 10
""")
def hybrid_rrf_fusion(spark, sf_dir):
    """Hybrid retrieval: BM25 top-20 fused with embedding-cosine top-20
    by reciprocal-rank fusion (operators/ranking.rrf_fuse) — the standard
    lexical+vector combiner (Cormack & Clarke 2009), with the fixture
    contract doc_id == vec_id. RRF scores are exact integer micro-units
    (1e6 DIV (60 + rank)) so the fusion is order-free; each fused side is
    a k-row list, so the outer-join cascade broadcasts regardless of
    corpus size. The expensive retrieval legs reuse the suite's verified
    bm25_topk and brute_force_topk plans."""
    from amundsendatabuilder_spark.operators.ranking import bm25_topk, rrf_fuse
    docs, emb = _t(spark, sf_dir, "documents", "embeddings")
    bm = bm25_topk(docs, "hash join merge sort", k=20).select("doc_id", "rank")
    cos = (similarity.brute_force_topk(
        emb, emb.where(F.col("vec_id") == 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), "rank"))
    return rrf_fuse({"bm25": bm, "cos": cos}, k0=60, k=10)


@query("mad_outliers", r"""
WITH r AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v, doc_id AS o,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars, doc_id) AS rn,
                  count(*) OVER (PARTITION BY source) AS n
           FROM documents),
med AS (SELECT grp, min(v) AS med FROM r WHERE rn = (n + 1) // 2 GROUP BY grp),
dev AS (SELECT r.grp, r.v, r.o, m.med, abs(r.v - m.med) AS dev
        FROM r JOIN med m ON r.grp = m.grp),
dr AS (SELECT grp, dev, o,
              row_number() OVER (PARTITION BY grp ORDER BY dev, o) AS rn,
              count(*) OVER (PARTITION BY grp) AS n
       FROM dev),
mad AS (SELECT grp, min(dev) AS mad FROM dr WHERE rn = (n + 1) // 2
        GROUP BY grp)
SELECT d.grp AS source, CAST(count(*) AS BIGINT) AS n_rows,
       min(d.med) AS med, min(m.mad) AS mad,
       CAST(sum(CASE WHEN d.dev * 10 > 30 * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.grp = m.grp
GROUP BY d.grp ORDER BY source
""")
def mad_outliers_query(spark, sf_dir):
    """Robust per-source document-length outliers
    (profiling.mad_outliers): discrete median + MAD with the
    |x − med|·10 > 30·MAD integer cross-multiplied rule (k = 3.0 in
    tenths) — the data-quality screen mean/stddev z-scores fail on
    (one corrupt row drags a mean; the median has a 50% breakdown
    point). Two group-partitioned rank windows + one aggregate; only
    (group, long) rows shuffle. Hash-verified: the twin replays rank
    selection, deviations, and the cross-multiplied flag exactly."""
    from amundsendatabuilder_spark.operators.profiling import mad_outliers
    (docs,) = _t(spark, sf_dir, "documents")
    return (mad_outliers(docs, "n_chars", "source", "doc_id",
                         k_times_10=30)
            .orderBy("source"))


def _lpa_cte(iters: int = 3) -> str:
    """WITH-body replaying graph_algo.label_propagation over the star
    graph (through ``l{iters}``) — shared by the LPA oracle and the
    modularity oracle that grades the same labeling."""
    head = r"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
e0 AS (SELECT b.k AS src, a.k AS dst
       FROM keys a JOIN keys b ON b.k = a.k - (a.k % 10)
       WHERE a.k % 10 <> 0),
sym AS (SELECT src AS u, dst AS v FROM e0
        UNION SELECT dst AS u, src AS v FROM e0),
l0 AS (SELECT DISTINCT u AS node, u AS label FROM sym)"""
    its = []
    for i in range(1, iters + 1):
        its.append(f"""
n{i} AS (SELECT s.u AS node, l.label, count(*) AS cnt
       FROM sym s JOIN l{i - 1} l ON l.node = s.v GROUP BY 1, 2),
l{i} AS (SELECT node, label FROM (
         SELECT node, label,
                row_number() OVER (PARTITION BY node
                                   ORDER BY cnt DESC, label) AS rn
         FROM n{i}) WHERE rn = 1)""")
    return head + "," + ",".join(its)


def _lpa_oracle(iters: int = 3) -> str:
    return (_lpa_cte(iters)
            + f"\nSELECT node, label FROM l{iters} ORDER BY node")


def _modularity_oracle(iters: int = 3, top_n: int = 10) -> str:
    """Replay oracle for graph_modularity: the LPA labeling CTEs plus
    the exact-integer Newman decomposition Q = Σ(4·m·e_c − d_c²)/4m² —
    HUGEINT keeps every term on the integer grid, one double division
    per row at the end (identical in Spark's DECIMAL(38,0) register)."""
    return (_lpa_cte(iters) + f""",
und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM e0 WHERE src <> dst),
mm AS (SELECT count(*)::HUGEINT AS m FROM und),
lab AS (SELECT node, label FROM l{iters}),
bo AS (SELECT lu.label AS cu, lv.label AS cv
       FROM und JOIN lab lu ON lu.node = und.u
                JOIN lab lv ON lv.node = und.v),
intra AS (SELECT cu AS community, count(*)::HUGEINT AS e_c
          FROM bo WHERE cu = cv GROUP BY 1),
deg AS (SELECT l.label AS community, count(*)::HUGEINT AS d_c
        FROM (SELECT u AS n FROM und UNION ALL SELECT v FROM und) t
        JOIN lab l ON l.node = t.n GROUP BY 1),
np AS (SELECT label AS community, CAST(count(*) AS BIGINT) AS n_nodes
       FROM lab GROUP BY 1),
per AS (SELECT d.community, np.n_nodes,
               CAST(d.d_c AS BIGINT) AS degree_sum,
               CAST(coalesce(i.e_c, 0) AS BIGINT) AS intra_edges,
               4 * mm.m * coalesce(i.e_c, 0)::HUGEINT - d.d_c * d.d_c
                   AS num,
               CAST(4 * mm.m * mm.m AS DOUBLE) AS den
        FROM deg d LEFT JOIN intra i ON i.community = d.community
        JOIN np ON np.community = d.community CROSS JOIN mm),
tot AS (SELECT CAST(sum(num) AS DOUBLE) AS tnum, min(den) AS tden
        FROM per)
SELECT community, n_nodes, degree_sum, intra_edges,
       round(CAST(num AS DOUBLE) / den, 9) AS contribution,
       round(tot.tnum / tot.tden, 9) AS q_modularity
FROM per CROSS JOIN tot
ORDER BY n_nodes DESC, community
LIMIT {top_n}
""")


@query("graph_modularity", _modularity_oracle())
def graph_modularity_query(spark, sf_dir):
    """Newman modularity of the label-propagation communities
    (graph_algo.modularity over graph_algo.label_propagation) — the
    community-QUALITY score beside the labeling itself: are the mined
    communities denser than a degree-preserving random graph. Computed
    as the exact integer ratio Σ_c(4·m·e_c − d_c²)/4m² in a
    DECIMAL(38,0) register (HUGEINT in the twin), one double division
    per row — no float accumulation, so the hash pins Q cross-engine.
    The star-graph fixture makes the answer hand-checkable: every hub
    community is a disjoint star, so e_c = d_c/2 exactly and Q
    approaches 1 − Σ(d_c/2m)². Scale shape: one distinct edge pass, two
    (node, label) joins, label-keyed map-side sums; the per-community
    register is size-guarded."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        label_propagation, modularity)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    edges = (a.where(F.col("a.k") % 10 != 0)
             .join(b, F.col("b.k") == F.col("a.k") - (F.col("a.k") % 10))
             .select(F.col("b.k").alias("src"), F.col("a.k").alias("dst")))
    edges = edges.localCheckpoint()
    labels = label_propagation(edges, iters=3)
    return modularity(edges, labels, top_n=10)


@query("graph_label_propagation", _lpa_oracle())
def graph_label_propagation(spark, sf_dir):
    """Community detection by deterministic synchronous label propagation
    (graph_algo.label_propagation) over a star graph synthesized from
    order keys (hub k−k%10 ← spokes) — the communities a catalog would
    mine from its table-affinity graph (co-usage, co-lineage). Ties break
    (count DESC, label ASC) via a min-of-struct aggregate, so the
    labeling is engine-reproducible; the DuckDB twin unrolls the same 3
    sweeps. Per sweep: one id-pair join + one map-side-combinable argmax
    — no rank window over the adjacency, 16-byte label state per node."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        label_propagation)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    edges = (a.where(F.col("a.k") % 10 != 0)
             .join(b, F.col("b.k") == F.col("a.k") - (F.col("a.k") % 10))
             .select(F.col("b.k").alias("src"), F.col("a.k").alias("dst")))
    return label_propagation(edges, iters=3).orderBy("node")


@query("cdc_upsert_apply", r"""
WITH base AS (SELECT c_custkey AS k, CAST(-1 AS BIGINT) AS s, 'U' AS o,
                     c_name, c_acctbal
              FROM customer),
ups AS (SELECT o_custkey AS k, CAST(o_orderkey AS BIGINT) AS s, 'U' AS o,
               'updated-' || CAST(o_custkey AS VARCHAR) AS c_name,
               o_totalprice AS c_acctbal
        FROM orders WHERE o_orderkey % 5 = 0),
dels AS (SELECT o_custkey AS k, CAST(o_orderkey AS BIGINT) AS s, 'D' AS o,
                CAST(NULL AS VARCHAR) AS c_name,
                CAST(NULL AS DOUBLE) AS c_acctbal
         FROM orders WHERE o_orderkey % 7 = 0),
u AS (SELECT * FROM base UNION ALL SELECT * FROM ups
      UNION ALL SELECT * FROM dels),
r AS (SELECT *, row_number() OVER (PARTITION BY k
                                   ORDER BY s DESC, o ASC) AS rn FROM u)
SELECT k AS c_custkey, c_name, c_acctbal
FROM r WHERE rn = 1 AND o = 'U' ORDER BY c_custkey
""")
def cdc_upsert_apply(spark, sf_dir):
    """Change-data-capture MERGE compaction (operators/asof.cdc_apply):
    a customer snapshot plus an upsert/delete changelog synthesized from
    orders (orderkey%5 → upsert at seq orderkey, %7 → delete; %35 rows
    exercise the same-seq delete-beats-upsert tie). ONE key-partitioned
    union+rank window resolves last-writer-wins — no join, payload rides
    the shuffle once; hot keys split by AQE. The post-apply snapshot is
    hash-verified against the twin's identical rank formulation."""
    from amundsendatabuilder_spark.operators.asof import cdc_apply
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    snap = cust.select("c_custkey", "c_name", "c_acctbal")
    ups = (orders.where(F.col("o_orderkey") % 5 == 0)
           .select(F.col("o_custkey").alias("c_custkey"),
                   F.col("o_orderkey").alias("seq"), F.lit("U").alias("op"),
                   F.concat(F.lit("updated-"),
                            F.col("o_custkey").cast("string"))
                   .alias("c_name"),
                   F.col("o_totalprice").alias("c_acctbal")))
    dels = (orders.where(F.col("o_orderkey") % 7 == 0)
            .select(F.col("o_custkey").alias("c_custkey"),
                    F.col("o_orderkey").alias("seq"),
                    F.lit("D").alias("op"),
                    F.lit(None).cast("string").alias("c_name"),
                    F.lit(None).cast("double").alias("c_acctbal")))
    log = ups.unionByName(dels)
    return (cdc_apply(snap, log, key_col="c_custkey",
                      payload_cols=["c_name", "c_acctbal"])
            .orderBy("c_custkey"))


@query("expectation_audit", r"""
WITH c AS (SELECT
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN NOT coalesce(o_totalprice > 0, FALSE)
            THEN 1 ELSE 0 END) AS BIGINT) AS f_pos,
  CAST(sum(CASE WHEN NOT coalesce(o_totalprice < 200000, FALSE)
            THEN 1 ELSE 0 END) AS BIGINT) AS f_cap,
  CAST(sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
            THEN 1 ELSE 0 END) AS BIGINT) AS f_status,
  CAST(sum(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'),
                                  FALSE)
            THEN 1 ELSE 0 END) AS BIGINT) AS f_prio,
  CAST(sum(CASE WHEN NOT coalesce(
               o_orderdate >= TIMESTAMP '1992-01-01 00:00:00'
               AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00', FALSE)
            THEN 1 ELSE 0 END) AS BIGINT) AS f_date
  FROM orders)
SELECT check_name, n_rows, n_failed,
       n_failed * 1000000 // n_rows AS fail_ppm
FROM (SELECT 'totalprice_positive' AS check_name, n_rows, f_pos AS n_failed
      FROM c
      UNION ALL SELECT 'totalprice_under_cap', n_rows, f_cap FROM c
      UNION ALL SELECT 'status_known', n_rows, f_status FROM c
      UNION ALL SELECT 'priority_format', n_rows, f_prio FROM c
      UNION ALL SELECT 'date_in_range', n_rows, f_date FROM c)
ORDER BY check_name
""")
def expectation_audit_query(spark, sf_dir):
    """Declarative data-contract audit (profiling.expectation_audit):
    five named expectations — positivity, range cap, set membership,
    regex format, timestamp window — compiled into ONE wide aggregate
    over orders and unpivoted to (check_name, n_rows, n_failed,
    fail_ppm). Null-result expectations count as failures. One scan
    regardless of check count; every counter map-side combinable; exact
    integer ppm."""
    from amundsendatabuilder_spark.operators.profiling import (
        expectation_audit)
    (orders,) = _t(spark, sf_dir, "orders")
    checks = [
        ("totalprice_positive", "o_totalprice > 0"),
        ("totalprice_under_cap", "o_totalprice < 200000"),
        ("status_known", "o_orderstatus IN ('O','F','P')"),
        ("priority_format", "o_orderpriority RLIKE '^[1-5]-'"),
        ("date_in_range",
         "o_orderdate >= TIMESTAMP'1992-01-01 00:00:00' AND "
         "o_orderdate < TIMESTAMP'1999-01-01 00:00:00'"),
    ]
    return expectation_audit(orders, checks).orderBy("check_name")


@query("stream_static_enrich", """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
g AS (SELECT date_trunc('hour', e.ts) AS window_start,
             c.c_mktsegment AS segment,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(CAST(floor(e.value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
      FROM events e JOIN customer c ON e.user_id = c.c_custkey
      GROUP BY 1, 2)
SELECT window_start, segment, n_events, value_cents
FROM g, wm WHERE g.window_start + INTERVAL 1 HOUR <= wm.w
""")
def stream_static_enrich_query(spark, sf_dir):
    """Stream-static dimension enrichment
    (streaming/events.stream_static_enrich): the event stream joins the
    broadcast customer dimension (STATELESS in Structured Streaming —
    only the windowed rollup holds state, bounded by the watermark),
    then aggregates n_events + exact integer value_cents per
    (hour, market segment). Hash-verified: the oracle is the batch
    join+rollup restricted to the append-mode emission frontier
    (window end ≤ max event time − 2h), pinning join, rollup, and
    watermark semantics together."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, stream_static_enrich)
    (cust,) = _t(spark, sf_dir, "customer")
    enriched = stream_static_enrich(_event_stream(spark, sf_dir), cust)
    name = "sse_" + next(tempfile._get_candidate_names())
    return run_to_memory(enriched, spark, name, tempfile.mkdtemp())


@query("trend_slopes", r"""
WITH daily AS (SELECT event_type AS grp, CAST(ts AS DATE) AS d,
                      CAST(count(*) AS BIGINT) AS y
               FROM events GROUP BY 1, 2),
a AS (SELECT min(d) AS d0 FROM daily),
xy AS (SELECT grp, y, CAST(d - a.d0 AS BIGINT) AS x FROM daily, a),
s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM xy GROUP BY 1),
nd AS (SELECT grp, n, sy, n * sxy - sx * sy AS num,
              n * sxx - sx * sx AS den FROM s)
SELECT grp AS event_type, n AS n_days, sy AS total_events,
       CASE WHEN den > 0
            THEN CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                      * ((1000000 * abs(num)) // den) AS BIGINT)
       END AS slope_ppm
FROM nd ORDER BY event_type
""")
def trend_slopes_query(spark, sf_dir):
    """Per-event-type daily-volume trend (profiling.trend_slopes):
    least-squares slope over (day index, daily count) in exact integer
    micro-units — sign-separated DIV so truncation agrees across engines
    (raw negative integer division does not: Spark truncates, DuckDB
    floors). Two count-only shuffles + a 1-row anchor broadcast; the
    monitor that catches a decaying source before it silently vanishes
    from a corpus."""
    from amundsendatabuilder_spark.operators.profiling import trend_slopes
    (events,) = _t(spark, sf_dir, "events")
    return trend_slopes(events, "event_type").orderBy("event_type")


@query("corpus_merkle_digest", r"""
WITH h AS (SELECT source, doc_id % 64 AS bucket,
                  md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)) AS h
           FROM documents),
b AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS n,
             md5(string_agg(h, '' ORDER BY h)) AS bh
      FROM h GROUP BY 1, 2)
SELECT source, CAST(sum(n) AS BIGINT) AS n_docs,
       md5(string_agg(bh, '' ORDER BY bucket)) AS digest
FROM b GROUP BY source ORDER BY source
""")
def corpus_merkle_digest(spark, sf_dir):
    """Two-level Merkle content digest per source
    (textops.corpus_digest): certifies corpus-version identity without
    moving text — per-doc md5, per-bucket digest of SORTED hashes (order
    insensitivity under shuffle), then a digest of the 64 bucket
    digests. Only 32-char hashes shuffle; each reducer row is bounded by
    n/64 hashes. The DuckDB twin replays both fold levels exactly."""
    from amundsendatabuilder_spark.operators.textops import corpus_digest
    (docs,) = _t(spark, sf_dir, "documents")
    return corpus_digest(docs).orderBy("source")


@query("q7_nation_volume", """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""")
def q7_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape — bilateral shipping volume between two nations by
    year: the 6-way star join whose small sides (nation ×2, the
    nation-filtered supplier and customer) all broadcast, so lineitem —
    the only big table — is joined without ever shuffling on a dimension
    key. The nation filter pushes THROUGH the broadcast joins into the
    supplier/customer scans (semi-join pushdown by construction: filter
    first, then join)."""
    sup, li, orders, cust, nat = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer",
        "nation")
    pair = ("NATION_1", "NATION_2")
    n1 = (nat.where(F.col("n_name").isin(*pair))
          .select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (nat.where(F.col("n_name").isin(*pair))
          .select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation")))
    s = sup.join(F.broadcast(n1), sup["s_nationkey"] == n1["s_nk"]) \
        .select("s_suppkey", "supp_nation")
    c = cust.join(F.broadcast(n2), cust["c_nationkey"] == n2["c_nk"]) \
        .select("c_custkey", "cust_nation")
    return (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"])
        .where((F.col("supp_nation") != F.col("cust_nation")))
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(round_half_away(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year"))


@query("q10_returned_items", """
SELECT c_custkey, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape — top customers by returned-item revenue: the
    returnflag filter pushes into the lineitem scan, customer+nation
    broadcast, and the final top-20 is a distributed
    TakeOrderedAndProject (ties broken by custkey), not a global sort."""
    cust, orders, li, nat = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation")
    cn = (cust.join(F.broadcast(nat),
                    cust["c_nationkey"] == nat["n_nationkey"])
          .select("c_custkey", "n_name"))
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cn), orders["o_custkey"] == cn["c_custkey"])
        .groupBy("c_custkey", "n_name")
        .agg(round_half_away(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20))


@query("grouping_sets_volume", """
SELECT l_returnflag, l_linestatus,
       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INT)
           AS gid,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
ORDER BY gid, l_returnflag, l_linestatus
""")
def grouping_sets_volume(spark, sf_dir):
    """GROUPING SETS aggregate (detail + per-flag subtotal + grand
    total in one pass) — the multi-granularity rollup shape BI layers
    emit, exercising Catalyst's Expand operator: each input row fans out
    once per grouping set BEFORE the single shuffle, so three
    granularities cost one aggregation, not three scans. grouping_id
    disambiguates NULL-as-grouped-out from NULL data; integer sums are
    engine-exact."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag", "l_linestatus")
        .agg(F.grouping_id().cast("int").alias("gid"),
             F.count(F.lit(1)).alias("n"),
             F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .orderBy("gid", "l_returnflag", "l_linestatus"))


@query("embedding_label_outliers", r"""
WITH u AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos,
                  unnest(embedding::DOUBLE[]) AS x
           FROM embeddings),
m AS (SELECT label, pos, round(avg(x), 9) AS mean_x
      FROM u GROUP BY label, pos),
cent AS (SELECT label, list(mean_x ORDER BY pos) AS cv FROM m GROUP BY label),
sc AS (SELECT e.label, e.vec_id,
              round(list_cosine_similarity(e.embedding::DOUBLE[], c.cv), 6)
                  AS cos
       FROM embeddings e JOIN cent c ON e.label = c.label),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY label
                                        ORDER BY cos ASC, vec_id) AS INT)
                 AS rank
      FROM sc)
SELECT label, vec_id, cos, rank FROM r WHERE rank <= 5
ORDER BY label, rank
""")
def embedding_label_outliers(spark, sf_dir):
    """Noisy-label detection in embedding space: each label's centroid
    (posexplode mean — scalars shuffle, never vectors), then every
    vector's cosine to its OWN label centroid, flagging the 5 least
    central per label — the mislabeled-data screen a training-data
    pipeline runs before fitting on curated classes. Centroid components
    round to 9dp before the cosine so the broadcast-joined fold is
    bit-reproducible; rank ties break by vec_id."""
    from amundsendatabuilder_spark.functions.vectors import l2_norm
    from amundsendatabuilder_spark.operators.similarity import (
        cosine_similarity)
    from amundsendatabuilder_spark.session import ensure_parallelism
    (emb,) = _t(spark, sf_dir, "embeddings")
    u = (ensure_parallelism(emb)
         .select("label",
                 F.posexplode(F.col("embedding").cast("array<double>"))
                 .alias("pos", "x")))
    m = (u.groupBy("label", "pos")
         .agg(round_half_away(F.avg("x"), 9).alias("mean_x")))
    cent = (m.groupBy("label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "mean_x"))),
                lambda s: s["mean_x"]).alias("cv")))
    scored = (emb.select("label", "vec_id",
                         F.col("embedding").cast("array<double>").alias("v"))
              .join(F.broadcast(cent), "label")
              .select("label", "vec_id",
                      round_half_away(cosine_similarity(
                          "v", "cv", norm_a=l2_norm("v"),
                          norm_b=l2_norm("cv")), 6).alias("cos")))
    w = Window.partitionBy("label").orderBy(F.col("cos").asc(),
                                            F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w).cast("int"))
            .where(F.col("rank") <= 5)
            .select("label", "vec_id", "cos", "rank")
            .orderBy("label", "rank"))


@query("embedding_covariance", r"""
WITH v AS (SELECT list_transform(embedding::DOUBLE[],
                                 x -> CAST(floor(x * 1000000) AS BIGINT))
               AS q
           FROM embeddings),
w AS (SELECT row_number() OVER () AS rid, q FROM v),
u AS (SELECT rid, CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
             unnest(q) AS qi
      FROM w),
nn AS (SELECT count(*)::HUGEINT AS n FROM v),
s AS (SELECT i, CAST(sum(qi) AS HUGEINT) AS s FROM u GROUP BY i),
p AS (SELECT a.i AS i, b.i AS j,
             CAST(sum(a.qi::HUGEINT * b.qi::HUGEINT) AS HUGEINT) AS sxy
      FROM u a JOIN u b ON a.rid = b.rid AND b.i >= a.i
      GROUP BY 1, 2)
SELECT p.i AS dim_i, p.j AS dim_j,
       round(CAST(nn.n * p.sxy - si.s * sj.s AS DOUBLE)
             / CAST(nn.n * nn.n AS DOUBLE) / 1e12, 9) AS cov
FROM p JOIN s si ON si.i = p.i JOIN s sj ON sj.i = p.j CROSS JOIN nn
ORDER BY dim_i, dim_j
""")
def embedding_covariance_query(spark, sf_dir):
    """Exact population covariance of the embedding matrix
    (similarity.embedding_covariance) — the distributed half of PCA.
    Integer-quantized components, DECIMAL(38,0) sufficient statistics
    (HUGEINT in the twin — same exact values), centered difference cast
    to double only at the end. No self-join on the Spark side: each
    vector emits its 2080 upper-triangle products map-side; the single
    shuffle carries ((i,j), decimal partial) rows."""
    from amundsendatabuilder_spark.operators.similarity import (
        embedding_covariance)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return embedding_covariance(emb).orderBy("dim_i", "dim_j")


@query("l_diversity_audit", """
SELECT c_nationkey, c_mktsegment,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(count(DISTINCT c_acctbal > 0) AS BIGINT) AS n_sensitive
FROM customer
GROUP BY c_nationkey, c_mktsegment
HAVING count(DISTINCT c_acctbal > 0) < 2
ORDER BY c_nationkey, c_mktsegment
""")
def l_diversity_audit_query(spark, sf_dir):
    """l-diversity audit (profiling.l_diversity_audit) — the privacy
    screen k-anonymity misses: classes where every member shares one
    sensitive value (here the acctbal sign as a binary sensitive
    attribute) are exposed regardless of class size. Exact two-level
    COUNT DISTINCT; only failing classes leave the executors."""
    from amundsendatabuilder_spark.operators.profiling import (
        l_diversity_audit)
    (cust,) = _t(spark, sf_dir, "customer")
    sens = cust.withColumn("acct_positive", F.col("c_acctbal") > 0)
    return (l_diversity_audit(sens, ["c_nationkey", "c_mktsegment"],
                              "acct_positive", l=2)
            .orderBy("c_nationkey", "c_mktsegment"))


@query("basket_association_rules", """
WITH bk AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
            FROM lineitem),
nb AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS n FROM bk),
ic AS (SELECT item, CAST(count(*) AS BIGINT) AS n_item FROM bk GROUP BY 1),
f AS (SELECT item, n_item FROM ic WHERE n_item >= 5),
fb AS (SELECT bid, item FROM bk WHERE item IN (SELECT item FROM f)),
p AS (SELECT l.item AS a, r.item AS b, CAST(count(*) AS BIGINT) AS n_ab
      FROM fb l JOIN fb r USING (bid) WHERE l.item <> r.item
      GROUP BY 1, 2 HAVING count(*) >= 2)
SELECT p.a, p.b, p.n_ab,
       p.n_ab * 1000000 // nn.n AS support_ppm,
       p.n_ab * 1000000 // fa.n_item AS confidence_ppm,
       1000 * nn.n * p.n_ab // (fa.n_item * fb2.n_item) AS lift_milli
FROM p JOIN f fa ON fa.item = p.a JOIN f fb2 ON fb2.item = p.b
CROSS JOIN nb nn
ORDER BY confidence_ppm DESC, a, b LIMIT 20
""")
def basket_association_rules(spark, sf_dir):
    """Market-basket association rules over order line items
    (ranking.association_rules) — the A-priori pair pass: item-frequency
    pruning (downward closure) BEFORE the basket self-join, pair
    support/confidence/lift as exact integer cross-multiplications
    (lift_milli = 1000·n·n_ab DIV (n_a·n_b) — no float ratios). Fan-out
    is bounded by Σ basket_size² (orders have ≤7 lines), the skew case a
    giant basket would pose is pre-pruned by min_support. Top-20 by
    (confidence, a, b)."""
    from amundsendatabuilder_spark.operators.ranking import (
        association_rules)
    (li,) = _t(spark, sf_dir, "lineitem")
    baskets = li.select(F.col("l_orderkey").alias("basket_id"),
                        F.col("l_partkey").alias("item"))
    return association_rules(baskets, min_support=5, min_pair_support=2,
                             k=20)


@query("graph_link_prediction", """
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
e0 AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k, b.k FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k, b.k FROM keys a JOIN keys b ON b.k = a.k * 3),
und AS (SELECT src AS u, dst AS v FROM e0 WHERE src <> dst),
sym AS (SELECT u, v FROM und UNION SELECT v AS u, u AS v FROM und),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u),
cand AS (SELECT n1.v AS a, n2.v AS b, CAST(count(*) AS BIGINT) AS common
         FROM sym n1 JOIN sym n2 ON n1.u = n2.u AND n1.v < n2.v
         GROUP BY 1, 2 HAVING count(*) >= 2),
ne AS (SELECT c.a, c.b, c.common FROM cand c
       WHERE NOT EXISTS (SELECT 1 FROM sym s
                         WHERE s.u = c.a AND s.v = c.b))
SELECT ne.a, ne.b, ne.common, da.deg AS deg_a, db.deg AS deg_b,
       ne.common * 1000000 // (da.deg + db.deg - ne.common) AS jaccard_ppm
FROM ne JOIN deg da ON da.u = ne.a JOIN deg db ON db.u = ne.b
ORDER BY common DESC, jaccard_ppm DESC, a, b LIMIT 50
""")
def graph_link_prediction(spark, sf_dir):
    """Common-neighbor link prediction over the synthesized lineage DAG
    (graph_algo.link_prediction_scores) — the related-datasets signal a
    catalog mines from co-usage: non-adjacent node pairs ranked by
    shared neighbors + integer neighborhood-Jaccard. Candidates come
    from the triangle-bounded wedge join (Σ deg² with hub-cap
    prunability); the adjacency anti-join and degree joins shuffle id
    pairs only."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        link_prediction_scores)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct().cache()
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return link_prediction_scores(edges, min_common=2, k=50)


@query("feature_hashing", r"""
WITH t AS (SELECT doc_id, unnest(""" + _LTOKS_SQL + r""") AS tok
           FROM documents),
h AS (SELECT doc_id, substr(md5(tok), 1, 2) AS bucket,
             CASE WHEN substr(md5(tok), 3, 1) IN
                  ('0','1','2','3','4','5','6','7')
                  THEN 1 ELSE -1 END AS sign
      FROM t)
SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS val
FROM h GROUP BY doc_id, bucket HAVING sum(sign) <> 0
""")
def feature_hashing_query(spark, sf_dir):
    """Hashing-trick text featurization (textops.feature_hashing):
    vocabulary-free signed bucket counts — 256 md5-hex buckets, ±1 sign
    from the next hash char (collision bias cancels in expectation).
    One tokenize + one map-side-combinable aggregate; no fitted state,
    so the featurizer shards perfectly at corpus scale. The twin replays
    bucket prefix, sign char, and signed sums exactly."""
    from amundsendatabuilder_spark.operators.textops import feature_hashing
    (docs,) = _t(spark, sf_dir, "documents")
    return feature_hashing(docs)


@query("stream_last_writer_upsert", """
SELECT user_id AS k, CAST(event_id AS BIGINT) AS seq, value AS val
FROM (SELECT user_id, event_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events) t
WHERE rn = 1 ORDER BY k
""")
def stream_last_writer_upsert(spark, sf_dir):
    """Streaming last-writer-wins upsert view
    (streaming/dedup_stream.last_writer_filter) — the online form of
    cdc_upsert_apply: one long of state per key (the winning sequence);
    a key emits only in micro-batches where its winner advances, giving
    a MERGE-able change feed instead of a history rescan. Hash-verified:
    folding the drained change feed to each key's final winner must
    equal the batch argmax (max event_id per user) — late/replayed rows
    are absorbed by the seq guard. Cross-batch advancement is pinned in
    tests/test_streaming.py."""
    import tempfile

    from amundsendatabuilder_spark.streaming.dedup_stream import (
        last_writer_filter)
    from amundsendatabuilder_spark.streaming.events import run_to_memory
    stream = (_event_stream(spark, sf_dir)
              .select(F.col("user_id").alias("k"),
                      F.col("event_id").alias("seq"),
                      F.col("value").alias("val")))
    out = last_writer_filter(stream)
    name = "slw_" + next(tempfile._get_candidate_names())
    drained = run_to_memory(out, spark, name, tempfile.mkdtemp(),
                            output_mode="update")
    w = Window.partitionBy("k").orderBy(F.col("seq").desc())
    return (drained.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("k", "seq", "val").orderBy("k"))


def _walks_oracle(walk_len: int = 3, walks: int = 2) -> str:
    head = """
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
e0 AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k, b.k FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k, b.k FROM keys a JOIN keys b ON b.k = a.k * 3),
und AS (SELECT src AS u, dst AS v FROM e0 WHERE src <> dst),
sym AS (SELECT u, v FROM und UNION SELECT v AS u, u AS v FROM und),
adj AS (SELECT u, list(v ORDER BY v) AS nbrs,
               CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY u),
st AS (SELECT u AS start FROM adj WHERE u % 20 = 0),
f0 AS (SELECT start, CAST(w AS BIGINT) AS walk, start AS cur
       FROM st, unnest(range(0, """ + str(walks) + """)) AS uw(w))"""
    its = []
    for t in range(1, walk_len + 1):
        p = f"f{t - 1}"
        its.append(f"""
f{t} AS (SELECT f.start, f.walk,
              a.nbrs[CAST((CAST('0x' || substr(md5(
                  CAST(f.cur AS VARCHAR) || ':' ||
                  CAST(f.walk AS VARCHAR) || ':{t}'), 1, 8) AS BIGINT)
                  % a.deg) + 1 AS INT)] AS cur
       FROM {p} f JOIN adj a ON a.u = f.cur)""")
    union = "\nUNION ALL\n".join(
        f"SELECT start, walk, CAST({t} AS INT) AS step, cur AS node"
        f" FROM f{t}" for t in range(0, walk_len + 1))
    return (head + "," + ",".join(its) + "\n" + union
            + "\nORDER BY start, walk, step")


@query("graph_hash_walks", _walks_oracle())
def graph_hash_walks(spark, sf_dir):
    """Deterministic random-walk corpus over the synthesized lineage
    graph (graph_algo.hash_walks) — the DeepWalk/node2vec sampling pass
    with a seeded md5 in place of the RNG, so the walk corpus is
    reproducible and hash-verifiable. Each step is one id-only frontier
    join against the sorted-adjacency table; cost is O(walks·len)
    regardless of graph size. Starts restricted to every 20th node (750
    walk origins, 2 walks each, 3 steps)."""
    from amundsendatabuilder_spark.operators.graph_algo import hash_walks
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct().cache()
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    # every key is a graph node (k >= 2 has parent k DIV 2; k = 1 has
    # children), so starts come straight off the key table instead of
    # re-deriving the symmetrized node set (saves a full graph rebuild)
    starts = keys_df.select(F.col("k").alias("start")) \
        .where(F.col("start") % 20 == 0)
    return (hash_walks(edges, walk_len=3, walks_per_node=2, starts=starts)
            .orderBy("start", "walk", "step"))


@query("dataset_card", r"""
WITH d AS (SELECT source AS grp, lang, doc_id AS o,
                  CAST(len(""" + _LTOKS_SQL + r""") AS BIGINT) AS n_tok,
                  md5(array_to_string(
                      list_filter(string_split_regex(trim(lower(text)),
                                                     '\s+'),
                                  x -> x <> ''), ' ')) AS fp
           FROM documents),
base AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS total_tokens,
                CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct
         FROM d GROUP BY 1),
r AS (SELECT grp, n_tok,
             row_number() OVER (PARTITION BY grp ORDER BY n_tok, o) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM d),
med AS (SELECT grp, min(n_tok) AS p50_tokens FROM r
        WHERE rn = (n + 1) // 2 GROUP BY grp),
lng AS (SELECT grp, lang AS top_lang FROM (
        SELECT grp, lang,
               row_number() OVER (PARTITION BY grp
                                  ORDER BY count(*) DESC, lang) AS rn
        FROM d GROUP BY grp, lang) WHERE rn = 1)
SELECT b.grp AS source, b.n_docs, b.total_tokens,
       (b.n_docs - b.n_distinct) * 1000000 // b.n_docs AS dup_ppm,
       m.p50_tokens, l.top_lang
FROM base b JOIN med m ON m.grp = b.grp JOIN lng l ON l.grp = b.grp
ORDER BY source
""")
def dataset_card_query(spark, sf_dir):
    """Per-source dataset card (textops.dataset_card): docs, tokens,
    exact duplication ppm, discrete median length, dominant language —
    the release-notes table of a corpus build, every statistic exact so
    two builds produce byte-identical cards iff the corpora match. One
    derive scan + three (group, scalar) aggregates."""
    from amundsendatabuilder_spark.operators.textops import dataset_card
    (docs,) = _t(spark, sf_dir, "documents")
    return dataset_card(docs).orderBy("source")


def _bpe_islands_merge(src: str, pair: str, out: str, i: str) -> str:
    """One greedy merge pass (gaps-and-islands) from word CTE ``src`` to
    ``out`` using the 1-row pair CTE ``pair``; ``i`` uniquifies CTE
    names."""
    return f"""
am{i} AS (SELECT w.tok, u.j AS pos
       FROM {src} w CROSS JOIN {pair} bb,
            unnest(range(1, len(w.l))) AS u(j)
       WHERE w.l[u.j] = bb.a AND w.l[u.j + 1] = bb.b),
ag{i} AS (SELECT tok, pos,
              pos - row_number() OVER (PARTITION BY tok ORDER BY pos)
                  AS grp
       FROM am{i}),
asel{i} AS (SELECT tok, pos FROM (
         SELECT tok, pos, min(pos) OVER (PARTITION BY tok, grp) AS p0
         FROM ag{i}) WHERE (pos - p0) % 2 = 0),
ae{i} AS (SELECT tok,
              CAST(generate_subscripts(l, 1) AS BIGINT) AS pos,
              unnest(l) AS sym
       FROM {src}),
{out} AS (SELECT e.tok,
              list(CASE WHEN s.pos IS NOT NULL THEN bb.a || bb.b
                        ELSE e.sym END ORDER BY e.pos) AS l
       FROM ae{i} e CROSS JOIN {pair} bb
       LEFT JOIN asel{i} s ON s.tok = e.tok AND s.pos = e.pos
       LEFT JOIN asel{i} s2 ON s2.tok = e.tok AND s2.pos = e.pos - 1
       WHERE s2.pos IS NULL
       GROUP BY e.tok)"""


def _bpe_apply_body(iters: int = 3, vocab_size: int = 200) -> str:
    """Training chain + distinct-vocabulary encode CTEs (through
    ``enc(tok, n_sub)`` and the token stream ``ts``) — shared by the
    per-document encode oracle and the per-source fertility oracle."""
    train = _bpe_oracle(iters, vocab_size)
    # keep the training CTE chain, drop its final UNION/select
    body = train[: train.index("\nSELECT CAST(1 AS INT)")]
    parts = [body]
    parts.append(""",
allw AS (SELECT DISTINCT unnest(""" + _LTOKS_SQL + """) AS tok
         FROM documents),
v0 AS (SELECT tok, list_filter(string_split(tok, ''), x -> x <> '') AS l
       FROM allw)""")
    for i in range(1, iters + 1):
        parts.append("," + _bpe_islands_merge(f"v{i - 1}", f"b{i}",
                                              f"v{i}", str(i)))
    parts.append(f""",
ts AS (SELECT source, doc_id, unnest({_LTOKS_SQL}) AS tok
       FROM documents),
enc AS (SELECT tok, CAST(len(l) AS BIGINT) AS n_sub FROM v{iters})""")
    return "".join(parts)


def _bpe_apply_oracle(iters: int = 3, vocab_size: int = 200) -> str:
    return _bpe_apply_body(iters, vocab_size) + """
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords
FROM ts JOIN enc USING (tok) GROUP BY doc_id ORDER BY doc_id"""


def _bpe_fertility_oracle(iters: int = 3, vocab_size: int = 200) -> str:
    return _bpe_apply_body(iters, vocab_size) + """
SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_sub) AS BIGINT) AS n_subwords,
       CAST(sum(len(tok)) AS BIGINT) AS n_token_chars,
       round(CAST(sum(n_sub) AS DOUBLE) / count(*), 6) AS fertility,
       round(CAST(sum(len(tok)) AS DOUBLE)
             / CAST(sum(n_sub) AS DOUBLE), 6) AS chars_per_subword
FROM ts JOIN enc USING (tok) GROUP BY source ORDER BY source"""


@query("bpe_encode_counts", _bpe_apply_oracle())
def bpe_encode_counts(spark, sf_dir):
    """BPE encode pass (textops.bpe_apply) — the learned 3-merge table
    from bpe_merge_training applied back to the corpus, reporting
    per-document word and subword counts. Encoding factors through the
    DISTINCT-token vocabulary (broadcast word→count map), so the merge
    folds run once per distinct word, not per occurrence — the
    train→encode tokenizer loop closed entirely in-engine, and the twin
    replays training AND application gaps-and-islands pass for pass."""
    from amundsendatabuilder_spark.operators.textops import (
        bpe_apply, bpe_merges)
    (docs,) = _t(spark, sf_dir, "documents")
    merges = bpe_merges(docs, iters=3, vocab_size=200)
    return bpe_apply(docs, merges, iters=3).orderBy("doc_id")


@query("bpe_fertility_report", _bpe_fertility_oracle())
def bpe_fertility_report_query(spark, sf_dir):
    """Per-source tokenizer evaluation (textops.bpe_fertility_report):
    the trained 3-merge table applied back to the corpus, reporting
    fertility (subwords per word) and compression (chars per subword)
    per source — the go/no-go table a tokenizer review reads before a
    vocabulary ships to a full training run (a slice at 2x corpus-mean
    fertility pays 2x sequence length for the same text). Hash-verified:
    the twin replays training, the gaps-and-islands encode, and both
    exact-integer ratio divisions."""
    from amundsendatabuilder_spark.operators.textops import (
        bpe_fertility_report, bpe_merges)
    (docs,) = _t(spark, sf_dir, "documents")
    merges = bpe_merges(docs, iters=3, vocab_size=200)
    return bpe_fertility_report(docs, merges, iters=3)


@query("interval_union_coverage", """
WITH iv AS (SELECT user_id,
                   CAST(floor(epoch(ts) * 1000000) AS BIGINT) AS start_us,
                   CAST(floor(epoch(ts) * 1000000) AS BIGINT)
                       + 600000000 + (event_id % 7) * 60000000 AS end_us
            FROM events),
m AS (SELECT user_id, start_us, end_us,
             CASE WHEN max(end_us) OVER (
                      PARTITION BY user_id ORDER BY start_us, end_us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  IS NULL
                OR start_us > max(end_us) OVER (
                      PARTITION BY user_id ORDER BY start_us, end_us
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS newi
      FROM iv),
i AS (SELECT user_id, start_us, end_us,
             sum(newi) OVER (PARTITION BY user_id ORDER BY start_us, end_us
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS isl
      FROM m),
p AS (SELECT user_id, isl, min(start_us) AS s, max(end_us) AS e,
             CAST(count(*) AS BIGINT) AS n
      FROM i GROUP BY 1, 2)
SELECT user_id, CAST(sum(n) AS BIGINT) AS n_intervals,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(sum(e - s) AS BIGINT) AS covered_us
FROM p GROUP BY user_id ORDER BY user_id
""")
def interval_union_coverage(spark, sf_dir):
    """Per-user union length of overlapping activity intervals
    (asof.interval_union) — events extended into 10-16-minute intervals
    (deterministic per-event length), overlaps merged by the
    gaps-and-islands sweep, total covered time in exact microseconds.
    The de-double-counted coverage statistic behind SLA uptime and
    active-time billing; one key shuffle + two windows."""
    from amundsendatabuilder_spark.operators.asof import interval_union
    (events,) = _t(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + 600_000_000
         + (F.col("event_id") % 7) * 60_000_000).alias("end_us"))
    return interval_union(iv).orderBy("user_id")


@query("histogram_quantile_sketch", """
WITH v AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
regs AS (SELECT LEAST(63, GREATEST(CAST(0 AS BIGINT), cents - 0) // 200)
                AS bucket,
                CAST(count(*) AS BIGINT) AS cnt
         FROM v GROUP BY 1),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM regs),
cum AS (SELECT bucket, cnt,
               CAST(sum(cnt) OVER (ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum
        FROM regs)
SELECT q_ppm, upper_edge, cum_count FROM (
  SELECT 500000 AS q_ppm,
         CAST(0 + (bucket + 1) * 200 AS BIGINT) AS upper_edge,
         cum AS cum_count,
         row_number() OVER (ORDER BY bucket) AS rn
  FROM cum, tot WHERE cum >= -((-500000 * n) // 1000000)) WHERE rn = 1
UNION ALL
SELECT q_ppm, upper_edge, cum_count FROM (
  SELECT 900000 AS q_ppm,
         CAST(0 + (bucket + 1) * 200 AS BIGINT) AS upper_edge,
         cum AS cum_count,
         row_number() OVER (ORDER BY bucket) AS rn
  FROM cum, tot WHERE cum >= -((-900000 * n) // 1000000)) WHERE rn = 1
UNION ALL
SELECT q_ppm, upper_edge, cum_count FROM (
  SELECT 990000 AS q_ppm,
         CAST(0 + (bucket + 1) * 200 AS BIGINT) AS upper_edge,
         cum AS cum_count,
         row_number() OVER (ORDER BY bucket) AS rn
  FROM cum, tot WHERE cum >= -((-990000 * n) // 1000000)) WHERE rn = 1
ORDER BY q_ppm
""")
def histogram_quantile_sketch(spark, sf_dir):
    """Mergeable quantile registers (sketches.histogram_registers /
    histogram_quantile) — the quantile member of the sketch family
    (HLL distinct, CMS frequency, Bloom membership): a 64-bucket
    equi-width histogram over event value cents, SUM-mergeable across
    shards/days, folded to deterministic p50/p90/p99 upper-edge
    estimates with integer ceil arithmetic. Unlike t-digest/GK the
    register state is arrival-order-free, which is what makes it
    hash-verifiable — and the register table is 64 rows at any input
    scale."""
    from amundsendatabuilder_spark.operators.sketches import (
        histogram_quantile, histogram_registers)
    (events,) = _t(spark, sf_dir, "events")
    v = events.select(F.floor(F.col("value") * 100).cast("long")
                      .alias("cents"))
    regs = histogram_registers(v, "cents", lo=0, width=200, n_buckets=64)
    return (histogram_quantile(regs, [500000, 900000, 990000],
                               lo=0, width=200)
            .orderBy("q_ppm"))


def _featprop_oracle(iters: int = 2) -> str:
    head = """
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
e0 AS (SELECT b.k AS src, a.k AS dst
       FROM keys a JOIN keys b ON b.k = a.k - (a.k % 10)
       WHERE a.k % 10 <> 0),
und AS (SELECT src AS u, dst AS v FROM e0 WHERE src <> dst),
sym AS (SELECT u, v FROM und UNION SELECT v AS u, u AS v FROM und),
deg AS (SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
        FROM sym GROUP BY 1),
feat AS (SELECT o_orderkey AS node,
                CAST(floor(o_totalprice * 100) AS BIGINT) AS f
         FROM orders),
f0 AS (SELECT node, f FROM feat)"""
    its = []
    for i in range(1, iters + 1):
        p = f"f{i - 1}"
        its.append(f"""
n{i} AS (SELECT s.u AS node, CAST(sum(f.f) AS BIGINT) AS nsum
       FROM sym s JOIN {p} f ON f.node = s.v GROUP BY 1),
f{i} AS (SELECT f.node,
              (f.f + coalesce(n.nsum, 0)) //
              (1 + coalesce(d.deg, 0)) AS f
       FROM {p} f LEFT JOIN n{i} n ON n.node = f.node
       LEFT JOIN deg d ON d.node = f.node)""")
    return (head + "," + ",".join(its)
            + f"\nSELECT node, CAST(f AS BIGINT) AS f FROM f{iters}"
            + " ORDER BY node")


@query("graph_feature_propagation", _featprop_oracle())
def graph_feature_propagation(spark, sf_dir):
    """GraphSAGE-style neighborhood feature smoothing
    (graph_algo.feature_propagation): order-price cents propagated 2
    sweeps over the star graph — f(v) ← (f(v) + Σ neighbors) DIV
    (1 + deg), exact non-negative integers so both engines agree
    bit-for-bit. Pagerank's scale shape: one id-long join + one
    combinable sum per sweep."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        feature_propagation)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct()
    a, b = keys_df.alias("a"), keys_df.alias("b")
    edges = (a.where(F.col("a.k") % 10 != 0)
             .join(b, F.col("b.k") == F.col("a.k") - (F.col("a.k") % 10))
             .select(F.col("b.k").alias("src"), F.col("a.k").alias("dst")))
    feats = orders.select(
        F.col("o_orderkey").alias("node"),
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("f"))
    return (feature_propagation(edges, feats, iters=2)
            .orderBy("node"))


def _temporal_reach_oracle(rounds: int = 3) -> str:
    head = """
WITH keys AS (SELECT o_orderkey AS k,
                     CAST(floor(epoch(o_orderdate)) AS BIGINT) AS te
              FROM orders),
e AS (
  SELECT a.k AS u, b.k AS v, a.te AS t
  FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k, b.k, a.te FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k, b.k, a.te FROM keys a JOIN keys b ON b.k = a.k * 3),
r0 AS (SELECT k AS node, CAST(0 AS BIGINT) AS arrival
       FROM keys WHERE k < 21)"""
    its = []
    for i in range(1, rounds + 1):
        p = f"r{i - 1}"
        its.append(f"""
r{i} AS (SELECT node, min(arrival) AS arrival FROM (
       SELECT node, arrival FROM {p}
       UNION ALL
       SELECT e.v AS node, e.t AS arrival
       FROM e JOIN {p} s ON s.node = e.u WHERE e.t >= s.arrival)
       GROUP BY node)""")
    return (head + "," + ",".join(its)
            + f"\nSELECT node, CAST(arrival AS BIGINT) AS arrival"
            + f" FROM r{rounds} ORDER BY node")


@query("temporal_reachability", _temporal_reach_oracle())
def temporal_reachability_query(spark, sf_dir):
    """Time-respecting reachability (graph_algo.temporal_reachability):
    earliest-arrival relaxation over the order DAG with edge departure
    times = the source order's date — nodes reachable only along
    non-decreasing-timestamp paths, the semantics of contagion /
    leaked-credential forensics where plain reachability
    over-approximates. 3 idempotent min-relaxation sweeps (replay-safe),
    pagerank's (node, long) scale shape."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        temporal_reachability)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = (orders.select(
        F.col("o_orderkey").alias("k"),
        F.unix_timestamp(F.col("o_orderdate")).cast("long").alias("te"))
        .distinct().cache())
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst"),
                        F.col("a.te").alias("t")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    sources = keys_df.where(F.col("k") < 21).select(F.col("k").alias("node"))
    return (temporal_reachability(edges, sources, rounds=3)
            .orderBy("node"))


@query("stream_histogram_registers", """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
v AS (SELECT date_trunc('hour', ts) AS window_start,
             LEAST(63, GREATEST(CAST(0 AS BIGINT),
                                CAST(floor(value * 100) AS BIGINT) - 0)
                       // 200) AS bucket
      FROM events),
g AS (SELECT window_start, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1, 2)
SELECT window_start, bucket, cnt
FROM g, wm WHERE g.window_start + INTERVAL 1 HOUR <= wm.w
""")
def stream_histogram_registers_query(spark, sf_dir):
    """Streaming per-window quantile registers
    (streaming/events.windowed_histogram_registers): 64 SUM-mergeable
    equi-width counters per tumbling hour — the quantile member of the
    streaming sketch family beside the HLL and CMS register streams;
    state is 64 longs per open window instead of every value.
    Hash-verified against the batch register build restricted to the
    append-mode emission frontier."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_histogram_registers)
    regs = windowed_histogram_registers(_event_stream(spark, sf_dir))
    name = "shr_" + next(tempfile._get_candidate_names())
    return run_to_memory(regs, spark, name, tempfile.mkdtemp())


@query("quality_decile_profile", r"""
WITH t AS (SELECT doc_id AS o, text,
                  list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '') AS tk,
                  md5(array_to_string(
                      list_filter(string_split_regex(trim(lower(text)),
                                                     '\s+'),
                                  x -> x <> ''), ' ')) AS fp
           FROM documents),
d AS (SELECT o, fp, CAST(len(tk) AS BIGINT) AS n_tok,
             round(LEAST(len(tk) / 100.0, 1.0) * 0.4
                   + CASE WHEN len(tk) > 0
                          THEN len(list_distinct(list_transform(
                                   tk, x -> x))) / CAST(len(tk) AS DOUBLE)
                          ELSE 0 END * 0.4
                   + (1 - CASE WHEN length(text) > 0
                               THEN (length(text) - length(
                                     regexp_replace(text,
                                         '[.,;:!?''"()]', '', 'g')))
                                    / CAST(length(text) AS DOUBLE)
                               ELSE 0 END) * 0.2, 4) AS q
      FROM t),
b AS (SELECT o, fp, n_tok,
             ntile(10) OVER (ORDER BY q, o) AS decile
      FROM d)
SELECT CAST(decile AS INT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
       (count(*) - count(DISTINCT fp)) * 1000000 // count(*) AS dup_ppm,
       CAST(sum(n_tok) AS BIGINT) // count(*) AS avg_tokens
FROM b GROUP BY decile ORDER BY decile
""")
def quality_decile_profile_query(spark, sf_dir):
    """Curation lift curve (textops.quality_decile_profile): exact
    quality-score deciles (total-order ntile, ties broken by id)
    profiled with token mass, duplicate ppm, and mean length — the
    table a quality-threshold decision reads. The twin recomputes the
    composite quality score (length/diversity/punctuation mix) and the
    decile assignment closed-form."""
    from amundsendatabuilder_spark.operators.textops import (
        quality_decile_profile)
    (docs,) = _t(spark, sf_dir, "documents")
    return quality_decile_profile(docs).orderBy("decile")


@query("event_seasonality_heatmap", """
WITH d AS (SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
                  CAST(hour(ts) AS INT) AS hod
           FROM events),
c AS (SELECT dow, hod, CAST(count(*) AS BIGINT) AS n_events
      FROM d GROUP BY 1, 2),
t AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM c)
SELECT dow, hod, n_events,
       n_events * 1000000 // t.total AS share_ppm
FROM c, t ORDER BY dow, hod
""")
def event_seasonality_heatmap(spark, sf_dir):
    """Day-of-week × hour-of-day traffic heatmap in exact integer ppm —
    the seasonality profile that sizes streaming capacity and flags
    anomalous quiet periods (the calendar complement of trend_slopes'
    secular drift). One count aggregation + a 1-row total broadcast.
    Engine trap pinned by the oracle: Spark dayofweek is 1-based
    (Sunday=1), DuckDB's 0-based — the twin adds 1."""
    (events,) = _t(spark, sf_dir, "events")
    c = (events.select(F.dayofweek("ts").cast("int").alias("dow"),
                       F.hour("ts").cast("int").alias("hod"))
         .groupBy("dow", "hod")
         .agg(F.count(F.lit(1)).alias("n_events")))
    t = c.agg(F.sum("n_events").alias("total"))
    return (c.crossJoin(F.broadcast(t))
            .select("dow", "hod", "n_events",
                    F.expr("n_events * 1000000 DIV total")
                    .alias("share_ppm"))
            .orderBy("dow", "hod"))


@query("q4_order_priority", """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""")
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape — orders with at least one late-shipped line,
    counted per priority: the correlated-EXISTS as a LEFT SEMI join with
    a non-equi conjunct (shipdate > orderdate), date filter pushed into
    the orders scan. At scale the semi join shuffles only
    (orderkey, date) pairs and short-circuits on first match — the
    reason EXISTS beats a join+distinct formulation."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    hit = o.join(li, (o["o_orderkey"] == li["l_orderkey"])
                 & (li["l_shipdate"] > o["o_orderdate"]), "left_semi")
    return (hit.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("order_count"))
            .orderBy("o_orderpriority"))


@query("q6_forecast_revenue", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape — the pure scan-efficiency query: every predicate
    pushes into the parquet scan (PushedFilters on shipdate/discount/
    quantity), projection prunes to 2 columns, and the whole plan is one
    WholeStageCodegen span over a map-side-combinable aggregate — the
    query that measures raw scan throughput and nothing else."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24))
        .agg(round_half_away(
            F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines")))


@query("q12_shipmode_priority", """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
""")
def q12_shipmode_priority(spark, sf_dir):
    """TPC-H Q12 shape — priority-split line counts per line status:
    the conditional-aggregation pattern (two CASE sums in one pass,
    never two scans), shipdate filter pushed into the lineitem scan, and
    the orders join carrying only (orderkey, priority) — at 100 TB the
    fact-fact join shuffles two narrow columns, everything else prunes
    at the reader."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")))
        .join(orders.select("o_orderkey", "o_orderpriority"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(hi, 1).otherwise(0)).cast("long")
             .alias("high_line_count"),
             F.sum(F.when(~hi, 1).otherwise(0)).cast("long")
             .alias("low_line_count"))
        .orderBy("l_linestatus"))


@query("quality_decile_table", r"""
WITH t AS (SELECT doc_id AS o, text,
                  list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '') AS tk,
                  md5(array_to_string(
                      list_filter(string_split_regex(trim(lower(text)),
                                                     '\s+'),
                                  x -> x <> ''), ' ')) AS fp
           FROM documents),
d AS (SELECT o, fp, CAST(len(tk) AS BIGINT) AS n_tok,
             CAST(round(round(LEAST(len(tk) / 100.0, 1.0) * 0.4
                   + CASE WHEN len(tk) > 0
                          THEN len(list_distinct(list_transform(
                                   tk, x -> x))) / CAST(len(tk) AS DOUBLE)
                          ELSE 0 END * 0.4
                   + (1 - CASE WHEN length(text) > 0
                               THEN (length(text) - length(
                                     regexp_replace(text,
                                         '[.,;:!?''"()]', '', 'g')))
                                    / CAST(length(text) AS DOUBLE)
                               ELSE 0 END) * 0.2, 4) * 10000, 0)
                  AS BIGINT) AS qi
      FROM t),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(n_tok) AS BIGINT) AS tok_n FROM d),
ks AS (SELECT CAST(unnest(generate_series(1, 10)) AS INT) AS decile),
needs AS (SELECT decile, -((-decile * n) // 10) AS need, n, tok_n
          FROM ks, tot),
ord AS (SELECT qi, row_number() OVER (ORDER BY qi, o) AS rn FROM d),
bounds AS (SELECT decile, n, tok_n,
                  (SELECT qi FROM ord WHERE rn = needs.need) AS cut_q
           FROM needs)
SELECT decile, CAST(cut_q AS BIGINT) AS cut_q,
       (SELECT CAST(count(*) AS BIGINT) FROM d
        WHERE qi <= b.cut_q) AS n_docs_le,
       (SELECT CAST(count(*) * 1000000 // b.n AS BIGINT) FROM d
        WHERE qi <= b.cut_q) AS pct_docs_ppm,
       (SELECT CAST(sum(n_tok) AS BIGINT) FROM d
        WHERE qi <= b.cut_q) AS total_tokens_le,
       (SELECT CAST(CASE WHEN b.tok_n > 0
                         THEN sum(n_tok) * 1000000 // b.tok_n
                         ELSE 0 END AS BIGINT) FROM d
        WHERE qi <= b.cut_q) AS pct_tokens_ppm,
       (SELECT CAST(count(DISTINCT fp) AS BIGINT) FROM d
        WHERE qi <= b.cut_q) AS n_distinct_le,
       (SELECT CAST((count(*) - count(DISTINCT fp)) * 1000000 // count(*)
             AS BIGINT)
        FROM d WHERE qi <= b.cut_q) AS dup_ppm_le
FROM bounds b ORDER BY decile
""")
def quality_decile_table_query(spark, sf_dir):
    """Production decile table (textops.quality_decile_table): decile
    boundaries + cumulative lift stats from bounded per-score registers
    — NO corpus-wide window (the r7-verdict weak item; the exact-ntile
    quality_decile_profile stays as the verification formulation). The
    DuckDB twin derives the same boundaries by SORTING (row_number over
    the exact total order), so a hash match here proves the register
    derivation equals the exact one."""
    from amundsendatabuilder_spark.operators.textops import quality_decile_table
    (docs,) = _t(spark, sf_dir, "documents")
    return quality_decile_table(docs).orderBy("decile")


@query("equi_depth_boundaries", """
WITH d AS (SELECT (CAST(round(o_totalprice * 100, 0) AS BIGINT) // 1000)
                  * 1000 AS qv
           FROM orders),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM d),
ks AS (SELECT CAST(unnest(generate_series(1, 10)) AS INT) AS bucket),
needs AS (SELECT bucket, -((-bucket * n) // 10) AS need, n FROM ks, tot),
ord AS (SELECT qv, row_number() OVER (ORDER BY qv) AS rn FROM d),
bounds AS (SELECT bucket, n,
                  (SELECT qv FROM ord WHERE rn = needs.need) AS cut_value
           FROM needs)
SELECT bucket, CAST(cut_value AS BIGINT) AS cut_value,
       (SELECT CAST(count(*) AS BIGINT) FROM d
        WHERE qv <= b.cut_value) AS n_rows_le,
       (SELECT CAST(count(*) * 1000000 // b.n AS BIGINT) FROM d
        WHERE qv <= b.cut_value) AS pct_rows_ppm
FROM bounds b ORDER BY bucket
""")
def equi_depth_boundaries_query(spark, sf_dir):
    """Ungrouped equi-depth boundaries over order value cents, $10
    quanta (profiling.equi_depth_boundaries): the two-pass register
    form that replaces the single-partition ntile window the ungrouped
    equi_depth_histogram call would degenerate to — cumulative counts
    run over the bounded register table, never the corpus. The DuckDB
    twin is genuinely INDEPENDENT: it derives each boundary by SORTING
    (row_number over the exact quantized order — the value at rank
    ⌈k·N/n⌉), not by mirroring the register cumulative, so a hash match
    proves the register derivation equals the exact sort's answer."""
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.operators.profiling import (
        equi_depth_boundaries)
    (orders,) = _t(spark, sf_dir, "orders")
    cents = orders.select(
        round_half_away(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))
    return (equi_depth_boundaries(cents, "cents", n_buckets=10, width=1000)
            .orderBy("bucket"))


@query("equi_depth_boundaries_grouped", """
WITH d AS (SELECT o_orderpriority,
                  (CAST(round(o_totalprice * 100, 0) AS BIGINT) // 1000)
                  * 1000 AS qv
           FROM orders),
tot AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM d GROUP BY 1),
ks AS (SELECT o_orderpriority, n,
              CAST(unnest(generate_series(1, 10)) AS INT) AS bucket
       FROM tot),
needs AS (SELECT o_orderpriority, bucket, n,
                 -((-bucket * n) // 10) AS need FROM ks),
ord AS (SELECT o_orderpriority, qv,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY qv) AS rn
        FROM d),
bounds AS (SELECT needs.o_orderpriority, bucket, n,
                  (SELECT qv FROM ord
                   WHERE ord.o_orderpriority = needs.o_orderpriority
                     AND rn = needs.need) AS cut_value
           FROM needs)
SELECT b.o_orderpriority, b.bucket,
       CAST(b.cut_value AS BIGINT) AS cut_value,
       (SELECT CAST(count(*) AS BIGINT) FROM d
        WHERE d.o_orderpriority = b.o_orderpriority
          AND qv <= b.cut_value) AS n_rows_le,
       (SELECT CAST(count(*) * 1000000 // b.n AS BIGINT) FROM d
        WHERE d.o_orderpriority = b.o_orderpriority
          AND qv <= b.cut_value) AS pct_rows_ppm
FROM bounds b ORDER BY b.o_orderpriority, b.bucket
""")
def equi_depth_boundaries_grouped_query(spark, sf_dir):
    """Per-priority equi-depth boundaries of order value ($10 quanta,
    profiling.equi_depth_boundaries_grouped): each group's decile cuts
    derived from its bounded per-quantum registers — the skew-safe
    grouped path where exact-ntile would sort a giant group inside one
    window partition. The DuckDB twin derives every group's cuts
    independently by SORTING (row_number per group), so a hash match
    proves the grouped register derivation equals the exact per-group
    sorted ranks."""
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    from amundsendatabuilder_spark.operators.profiling import (
        equi_depth_boundaries_grouped)
    (orders,) = _t(spark, sf_dir, "orders")
    cents = orders.select(
        "o_orderpriority",
        round_half_away(F.col("o_totalprice") * 100, 0).cast("long")
        .alias("cents"))
    return (equi_depth_boundaries_grouped(
        cents, "cents", ("o_orderpriority",), n_buckets=10, width=1000)
        .orderBy("o_orderpriority", "bucket"))


# ---------------------------------------------------------------------------
# Round-9 additions: corpus curation (operators/curation.py) — leakage-safe
# split, epoch shuffle plan, n-gram novelty, filter funnel
# ---------------------------------------------------------------------------

@query("leakage_safe_split", f"""
WITH RECURSIVE pairs AS ({_lsh_verified_sql()}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
          WHERE s.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a),
g AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_key
      FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
b AS (SELECT doc_id, group_key,
             CAST('0x' || substr(md5('grp:' || CAST(group_key AS VARCHAR)),
                                 1, 4) AS BIGINT) AS bucket
      FROM g)
SELECT doc_id, group_key,
       CASE WHEN bucket < 52428 THEN 'train'
            WHEN bucket < 58982 THEN 'val'
            ELSE 'test' END AS split
FROM b
""")
def leakage_safe_split_query(spark, sf_dir):
    """Cluster-atomic 80/10/10 split (curation.leakage_safe_split):
    near-duplicate components (the dedup_clusters pair set, LSH-verified
    at 0.7) are assigned to train/val/test as whole groups via the md5
    bucket of the component key, so no near-dup of an eval doc can sit
    in train — the leakage path a per-doc hash split leaves open. Oracle
    = recursive-CTE transitive closure over the same verified pairs +
    the same md5 bucketing, so a hash match pins both the grouping and
    the boundary cuts."""
    from amundsendatabuilder_spark.operators.curation import (
        leakage_safe_split)
    from amundsendatabuilder_spark.operators.dedup import lsh_verified_pairs
    (docs,) = _t(spark, sf_dir, "documents")
    return leakage_safe_split(docs, lsh_verified_pairs(docs, threshold=0.7))


@query("epoch_shuffle_shards", """
WITH e AS (SELECT doc_id, CAST(unnest(range(0, 2)) AS INT) AS epoch
           FROM documents),
h AS (SELECT epoch, doc_id,
             md5('ep' || CAST(epoch AS VARCHAR) || ':'
                 || CAST(doc_id AS VARCHAR)) AS h
      FROM e),
s AS (SELECT epoch, doc_id, h,
             CAST((CAST('0x' || substr(h, 1, 4) AS BIGINT) * 16)
                  // 65536 AS INT) AS shard_id
      FROM h)
SELECT epoch, shard_id, doc_id,
       CAST(row_number() OVER (PARTITION BY epoch, shard_id
                               ORDER BY h, doc_id) AS INT) AS pos_in_shard
FROM s
""")
def epoch_shuffle_shards_query(spark, sf_dir):
    """Deterministic 2-epoch 16-shard shuffle plan
    (curation.epoch_shuffle_shards): each epoch is an independent
    md5-salted permutation, realized as hash-RANGE shard assignment
    (map-side) + row_number windows partitioned per (epoch, shard) —
    bounded by corpus/n_shards rows, never a corpus-wide sort. The
    seedless reshuffle-every-epoch contract a training loader needs."""
    from amundsendatabuilder_spark.operators.curation import (
        epoch_shuffle_shards)
    (docs,) = _t(spark, sf_dir, "documents")
    return epoch_shuffle_shards(docs, epochs=2, n_shards=16)


@query("ngram_novelty", f"""
WITH {_SHINGLES_SQL},
firsts AS (SELECT shingle, min(doc_id) AS first_doc FROM s GROUP BY shingle)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
             * 1.0 / count(*), 6) AS novelty
FROM s JOIN firsts f ON f.shingle = s.shingle
GROUP BY s.doc_id
""")
def ngram_novelty_query(spark, sf_dir):
    """Per-doc 3-gram novelty (curation.ngram_novelty): fraction of a
    doc's distinct shingles first seen (min doc_id) in that doc — the
    redundancy signal pairwise dedup thresholds miss. One map-side
    min() per shingle, one shingle join, one count agg; text never
    shuffles."""
    from amundsendatabuilder_spark.operators.curation import ngram_novelty
    (docs,) = _t(spark, sf_dir, "documents")
    return ngram_novelty(docs, n=3)


@query("filter_funnel_report", r"""
WITH t AS (SELECT n_chars, lang, """ + _TOKS_SQL + r""" AS toks
           FROM documents),
v AS (SELECT CASE WHEN n_chars < 100 THEN 1
                  WHEN lang NOT IN ('en', 'de', 'fr', 'es') THEN 2
                  WHEN len(toks) < 20 THEN 3
                  -- NULL-fails convention mirrored from the Spark side
                  -- (r10 advice): a zero-token doc's 0/0 ratio is NULL in
                  -- DuckDB and would fall through to ELSE 0 (pass);
                  -- unreachable at min_tokens=20 but the engines must
                  -- agree for min_tokens=0 callers too
                  WHEN len(toks) = 0
                       OR len(list_distinct(toks)) * 1.0 / len(toks) < 0.45
                       THEN 4
                  ELSE 0 END AS stage
      FROM t),
d AS (SELECT stage, count(*) AS n_dropped FROM v WHERE stage > 0
      GROUP BY stage),
tot AS (SELECT count(*) AS n_total FROM v),
r AS (SELECT * FROM (VALUES (1, 'min_chars'), (2, 'lang_allowed'),
                            (3, 'min_tokens'), (4, 'max_repetition'))
      AS rules(stage, rule)),
j AS (SELECT r.stage, r.rule,
             CAST(coalesce(d.n_dropped, 0) AS BIGINT) AS n_dropped
      FROM r LEFT JOIN d ON d.stage = r.stage),
f AS (SELECT stage, rule, n_dropped,
             CAST(n_total - coalesce(sum(n_dropped) OVER (
                 ORDER BY stage
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_in
      FROM j CROSS JOIN tot)
SELECT CAST(stage AS INT) AS stage, rule, n_in, n_dropped,
       CAST(n_in - n_dropped AS BIGINT) AS n_out
FROM f
""")
def filter_funnel_report_query(spark, sf_dir):
    """Quality-filter cascade accounting (curation.filter_funnel): every
    doc charged to the FIRST rule it fails (min_chars -> lang ->
    min_tokens -> repetition), reported as a chained funnel
    (stage, rule, n_in, n_dropped, n_out) including zero-drop rules.
    One map-side CASE projection; the shuffle carries <= 4 stage
    counts; funnel arithmetic runs on the 4-row rule table."""
    from amundsendatabuilder_spark.operators.curation import filter_funnel
    (docs,) = _t(spark, sf_dir, "documents")
    return filter_funnel(docs)


def _hll_overlap_oracle() -> str:
    from amundsendatabuilder_spark.operators.sketches import (
        hll_pairwise_overlap_oracle_sql)
    return hll_pairwise_overlap_oracle_sql(
        "SELECT source, unnest(" + _TOKS_SQL + ") AS tok FROM documents",
        "tok", "source")


@query("hll_source_overlap", _hll_overlap_oracle())
def hll_source_overlap(spark, sf_dir):
    """HLL set algebra (sketches.hll_pairwise_overlap): pairwise
    distinct-token overlap between all 20 sources by
    inclusion-exclusion over max-merged registers — ONE corpus pass to
    k*2^8 register rows, then all 190 union/intersection estimates are
    broadcast register arithmetic. The sketch-scale screening twin of
    the exact cross_source_overlap (which shuffles every (source,
    shingle) pair). Oracle replays hash/registers/merge/estimator with
    identical inlined literals, pinning the float math bit-for-bit."""
    from amundsendatabuilder_spark.functions.text import tokens
    from amundsendatabuilder_spark.operators.sketches import (
        hll_pairwise_overlap)
    (docs,) = _t(spark, sf_dir, "documents")
    toks = docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    return hll_pairwise_overlap(toks, "tok", "source")


# ---------------------------------------------------------------------------
# Round-9: TPC-H shape completion — the remaining 14 of the 22 classic
# query shapes, adapted to the synthetic schema (no partsupp/phone/
# commitdate columns; substitutions noted per query). With these every
# TPC-H query pattern has a suite twin.
# ---------------------------------------------------------------------------

@query("q13_custdist", """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN (SELECT * FROM orders
                 WHERE o_orderpriority <> '1-URGENT') o
        ON o.o_custkey = c.c_custkey
      GROUP BY 1)
GROUP BY 1
""")
def q13_custdist(spark, sf_dir):
    """TPC-H Q13 (customer order-count distribution): LEFT JOIN so
    zero-order customers survive into the c_count=0 bucket (the
    classic outer-join-then-histogram trap — an inner join silently
    drops them). Priority filter stands in for the comment NOT LIKE.
    Scale: join shuffles on custkey; both aggregations map-side
    combinable; final histogram is tiny."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    o = orders.where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (cust.join(o, cust.c_custkey == o.o_custkey, "left")
                .groupBy("c_custkey")
                .agg(F.count("o_orderkey").alias("c_count")))
    return (per_cust.groupBy("c_count")
            .agg(F.count("*").alias("custdist")))


@query("q14_promo_revenue", """
SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 4)
           AS promo_revenue_pct
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
""")
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 (promotion effect): conditional-aggregation ratio over
    one shipdate month. Part is the broadcast dim; the date filter is
    pushed to the lineitem scan, so at 100 TB one partition-pruned
    month streams through a single map-side agg producing one row."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0)
    return (li.where((F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
                     & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp")))
            .join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(round_half_away(100.0 * F.sum(promo) / F.sum(rev), 4)
                 .alias("promo_revenue_pct")))


@query("q15_top_supplier", """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 (top supplier): quarterly revenue view + scalar-max
    subquery. The revenue view is one map-side-combinable groupBy of
    the pruned quarter; the max is a 1-row broadcast back onto the
    tiny per-supplier table — never a global sort. Revenue rounds to
    2dp INSIDE the view (both engines) so the equality join compares
    identical grids."""
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    rev = (li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp")))
           .groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg(round_half_away(
               F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
               .alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (rev.crossJoin(F.broadcast(mx))
            .where(F.col("total_revenue") == F.col("mx"))
            .join(F.broadcast(supp),
                  F.col("supplier_no") == F.col("s_suppkey"))
            .select("s_suppkey", "s_name", "total_revenue"))


@query("q18_large_volume_customers", """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
       round(t.total_qty, 2) AS total_qty
FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 180) t
JOIN orders o ON o.o_orderkey = t.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
""")
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 (large-volume orders): HAVING on a per-order quantity
    sum (>180 ~ p90 here), then joins back to orders + customer. The
    heavy side reduces FIRST (groupBy before any join), so the join
    probes carry only the few big orders — the ordering that matters
    at 100 TB where joining lineitem to orders before aggregating
    would shuffle the whole fact table twice."""
    li, orders, cust = _t(spark, sf_dir, "lineitem", "orders", "customer")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("tq"))
           .where(F.col("tq") > 180))
    return (big.join(orders, big.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice",
                    round_half_away(F.col("tq"), 2).alias("total_qty")))


@query("q19_disjunctive_revenue", """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 40)
""")
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 (disjunctive predicates): three OR'd brand/size/
    quantity bands that straddle the join — the shape that defeats
    naive pushdown. Spark pushes the per-side residuals (quantity
    bands to the lineitem scan via the OR-union bound, brand/size to
    the broadcast part side) and evaluates the disjunction post-join
    in one codegen stage; one row out."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b = lambda br, smax, qlo, qhi: (
        (F.col("p_brand") == br) & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi))
    return (j.where(b("Brand#1", 10, 1, 15) | b("Brand#2", 20, 10, 30)
                    | b("Brand#3", 35, 20, 40))
            .agg(round_half_away(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2).alias("revenue")))


@query("q2_min_acctbal_supplier", """
WITH eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
            FROM supplier s
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'),
shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
cand AS (SELECT p.p_partkey, p.p_name, e.s_suppkey, e.s_name,
                e.s_acctbal, e.n_name
         FROM part p
         JOIN shipped sh ON sh.l_partkey = p.p_partkey
         JOIN eu e ON e.s_suppkey = sh.l_suppkey
         WHERE p.p_size = 15),
mn AS (SELECT p_partkey, min(s_acctbal) AS min_bal FROM cand GROUP BY 1)
SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey, c.p_name
FROM cand c JOIN mn ON mn.p_partkey = c.p_partkey
                   AND c.s_acctbal = mn.min_bal
""")
def q2_min_acctbal_supplier(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part): the correlated-MIN
    subquery re-join, adapted to the synthetic schema — partsupp is
    emulated by DISTINCT (l_partkey, l_suppkey) shipping facts and
    ps_supplycost by s_acctbal (no arithmetic, so the equality re-join
    compares raw stored doubles). Region-filtered suppliers broadcast;
    the min re-join is the standard decorrelation Spark and DuckDB
    both plan (aggregate once, join back on the min)."""
    part, li, supp, nat, reg = _t(spark, sf_dir, "part", "lineitem",
                                  "supplier", "nation", "region")
    eu = (supp.join(F.broadcast(nat),
                    supp.s_nationkey == nat.n_nationkey)
          .join(F.broadcast(reg.where(F.col("r_name") == "EUROPE")),
                nat.n_regionkey == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    cand = (part.where(F.col("p_size") == 15)
            .join(shipped, part.p_partkey == shipped.l_partkey)
            .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
            .select("p_partkey", "p_name", "s_suppkey", "s_name",
                    "s_acctbal", "n_name"))
    mn = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("s_acctbal").alias("min_bal"))
    return (cand.join(F.broadcast(mn),
                      (cand.p_partkey == F.col("mk"))
                      & (cand.s_acctbal == F.col("min_bal")))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name"))


@query("q8_market_share", """
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate < TIMESTAMP '1997-01-01')
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                      ELSE 0 END) / sum(volume), 6) AS mkt_share
FROM vol GROUP BY o_year
""")
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 (national market share): the two-role nation join —
    nation appears once for the customer side (region filter) and once
    for the supplier side (share numerator) — plus a conditional-
    aggregation ratio per order year. All dims broadcast; the only
    shuffle is the 2-group year aggregation. The classic test that an
    engine aliases one table into two join roles without confusing the
    keys."""
    li, part, orders, cust, nat, reg, supp = _t(
        spark, sf_dir, "lineitem", "part", "orders", "customer",
        "nation", "region", "supplier")
    n1 = nat.alias("n1")
    n2 = nat.alias("n2")
    vol = (li.join(F.broadcast(part.where(F.col("p_type") == "ECONOMY")),
                   li.l_partkey == part.p_partkey)
           .join(orders.where(
               (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
               & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))),
               li.l_orderkey == orders.o_orderkey)
           .join(cust, orders.o_custkey == cust.c_custkey)
           .join(F.broadcast(n1), cust.c_nationkey == F.col("n1.n_nationkey"))
           .join(F.broadcast(reg.where(F.col("r_name") == "AMERICA")),
                 F.col("n1.n_regionkey") == F.col("r_regionkey"))
           .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
           .join(F.broadcast(n2), supp.s_nationkey == F.col("n2.n_nationkey"))
           .select(F.year("o_orderdate").cast("int").alias("o_year"),
                   (F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .alias("volume"),
                   F.col("n2.n_name").alias("supp_nation")))
    share = (F.sum(F.when(F.col("supp_nation") == "NATION_5",
                          F.col("volume")).otherwise(0.0))
             / F.sum("volume"))
    return (vol.groupBy("o_year")
            .agg(round_half_away(share, 6).alias("mkt_share")))


@query("q9_profit_by_nation_year", """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
       round(sum(l.l_extendedprice * (1 - l.l_discount)
                 - 0.1 * p.p_retailprice * l.l_quantity), 2) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%red%'
GROUP BY 1, 2
""")
def q9_profit_by_nation_year(spark, sf_dir):
    """TPC-H Q9 shape (product-line profit by nation and year):
    revenue minus cost aggregated over a 5-table star; ps_supplycost
    is emulated by 0.1 * p_retailprice per unit (no partsupp table).
    The p_name LIKE filter prunes the broadcast part dim BEFORE the
    fact join — at 100 TB the join discards non-matching lineitems
    map-side; the only shuffle carries (nation, year) partials."""
    li, part, supp, nat, orders = _t(spark, sf_dir, "lineitem", "part",
                                     "supplier", "nation", "orders")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
    return (li.join(F.broadcast(part.where(F.col("p_name").like("%red%"))),
                    li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").cast("int").alias("o_year"))
            .agg(round_half_away(F.sum(profit), 2).alias("sum_profit")))


@query("q11_part_value_share", """
WITH val AS (SELECT l.l_partkey,
                    sum(l.l_extendedprice) AS value
             FROM lineitem l
             JOIN supplier s ON s.s_suppkey = l.l_suppkey
             JOIN nation n ON n.n_nationkey = s.s_nationkey
             WHERE n.n_name = 'NATION_3'
             GROUP BY 1)
SELECT l_partkey, round(value, 2) AS value
FROM val
WHERE value > (SELECT sum(value) * 0.001 FROM val)
""")
def q11_part_value_share(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part value for one
    nation's suppliers, HAVING > fraction of the grand total (a scalar
    subquery over the same aggregate) — ps_supplycost*availqty is
    emulated by shipped extendedprice. The per-part table aggregates
    once and is reused for both the threshold and the filter (one
    1-row broadcast, no second scan)."""
    li, supp, nat = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    val = (li.join(F.broadcast(
        supp.join(F.broadcast(nat.where(F.col("n_name") == "NATION_3")),
                  supp.s_nationkey == nat.n_nationkey)
        .select("s_suppkey")), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value")))
    thr = val.agg((F.sum("value") * 0.001).alias("thr"))
    return (val.crossJoin(F.broadcast(thr))
            .where(F.col("value") > F.col("thr"))
            .select("l_partkey",
                    round_half_away(F.col("value"), 2).alias("value")))


@query("q16_supplier_count_by_part", """
WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0),
shipped AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
            WHERE l_suppkey NOT IN (SELECT s_suppkey FROM bad))
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(count(DISTINCT sh.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p JOIN shipped sh ON sh.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'STANDARD'
  AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
GROUP BY 1, 2, 3
""")
def q16_supplier_count_by_part(spark, sf_dir):
    """TPC-H Q16 shape (supplier count by part attributes): COUNT
    DISTINCT suppliers per (brand, type, size) over negated part
    predicates, excluding a NOT-IN supplier list (negative acctbal
    stands in for the complaints comment scan). The exclusion list is
    a broadcast anti-join — never a shuffled NOT IN; partsupp is
    emulated by DISTINCT shipping facts."""
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supp.where(F.col("s_acctbal") < 0).select("s_suppkey")
    shipped = (li.select("l_partkey", "l_suppkey").distinct()
               .join(F.broadcast(bad),
                     F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"))
    pf = part.where((F.col("p_brand") != "Brand#5")
                    & (F.col("p_type") != "STANDARD")
                    & F.col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9))
    return (shipped.join(F.broadcast(pf),
                         shipped.l_partkey == pf.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.count_distinct("l_suppkey").alias("supplier_cnt")))


@query("q17_small_quantity_revenue", """
WITH pq AS (SELECT l_partkey, 0.2 * avg(l_quantity) AS qlim
            FROM lineitem GROUP BY 1)
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN pq ON pq.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#4' AND p.p_size < 10
  AND l.l_quantity < pq.qlim
""")
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 (small-quantity-order revenue): the correlated
    per-part AVG decorrelated into an aggregate-once-join-back (the
    rewrite every optimizer applies); p_size<10 stands in for the
    container predicate. At 100 TB the per-part limit table is
    partkey-partitioned like the fact side, and the brand filter
    prunes via the broadcast dim before the limit join."""
    li, part = _t(spark, sf_dir, "lineitem", "part")
    pq = (li.groupBy(F.col("l_partkey").alias("pk"))
          .agg((0.2 * F.avg("l_quantity")).alias("qlim")))
    pf = part.where((F.col("p_brand") == "Brand#4") & (F.col("p_size") < 10))
    return (li.join(F.broadcast(pf), li.l_partkey == pf.p_partkey)
            .join(pq, li.l_partkey == pq.pk)
            .where(F.col("l_quantity") < F.col("qlim"))
            .agg(round_half_away(F.sum("l_extendedprice") / 7.0, 2)
                 .alias("avg_yearly")))


@query("q20_excess_shippers", """
WITH pk AS (SELECT p_partkey FROM part WHERE p_name LIKE '%blue%'),
hv AS (SELECT l_suppkey
       FROM lineitem
       WHERE l_partkey IN (SELECT p_partkey FROM pk)
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY l_suppkey, l_partkey
       HAVING sum(l_quantity) > 45)
SELECT s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_7'
  AND s.s_suppkey IN (SELECT l_suppkey FROM hv)
""")
def q20_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape (suppliers with excess stock): the nested
    IN-subquery chain — parts by name pattern, (supplier, part) pairs
    over a year's shipped quantity threshold, suppliers of one nation
    — each IN realized as a semi-join (part keys broadcast into the
    pruned-year lineitem scan; the surviving supplier keys broadcast
    into the nation-filtered dim). availqty is emulated by shipped
    quantity (threshold 45 ~ the p90 of per-(supplier, part) annual
    volume, so rows survive at every sf)."""
    li, part, supp, nat = _t(spark, sf_dir, "lineitem", "part",
                             "supplier", "nation")
    pk = part.where(F.col("p_name").like("%blue%")).select("p_partkey")
    hv = (li.where((F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")))
          .join(F.broadcast(pk), li.l_partkey == F.col("p_partkey"), "left_semi")
          .groupBy("l_suppkey", "l_partkey")
          .agg(F.sum("l_quantity").alias("q"))
          .where(F.col("q") > 45)
          .select("l_suppkey").distinct())
    return (supp.join(F.broadcast(nat.where(F.col("n_name") == "NATION_7")),
                      supp.s_nationkey == nat.n_nationkey)
            .join(F.broadcast(hv),
                  supp.s_suppkey == F.col("l_suppkey"), "left_semi")
            .select("s_name", "s_acctbal"))


@query("q21_waiting_suppliers", """
WITH l1 AS (SELECT l.l_orderkey, l.l_suppkey
            FROM lineitem l
            JOIN orders o ON o.o_orderkey = l.l_orderkey
            WHERE o.o_orderstatus = 'F'
              AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM l1),
all_sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late w
JOIN supplier s ON s.s_suppkey = w.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_2'
  AND EXISTS (SELECT 1 FROM all_sup a
              WHERE a.l_orderkey = w.l_orderkey
                AND a.l_suppkey <> w.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late x
                  WHERE x.l_orderkey = w.l_orderkey
                    AND x.l_suppkey <> w.l_suppkey)
GROUP BY s.s_name
""")
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS + NOT EXISTS double-correlation — the sole-late supplier in
    a multi-supplier finished order. "Late" is l_shipdate > 60 days
    after o_orderdate (no commit/receipt dates in the synthetic
    schema). EXISTS = left-semi on (same order, other supplier);
    NOT EXISTS = left-anti against the late set — both realized as
    key joins with an inequality residual, never a per-row subquery."""
    li, orders, supp, nat = _t(spark, sf_dir, "lineitem", "orders",
                               "supplier", "nation")
    late = (li.join(orders.where(F.col("o_orderstatus") == "F"),
                    li.l_orderkey == orders.o_orderkey)
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey").distinct())
    all_sup = li.select("l_orderkey", "l_suppkey").distinct()
    w = late.alias("w")
    a = all_sup.alias("a")
    x = late.alias("x")
    cand = (w.join(a, (F.col("a.l_orderkey") == F.col("w.l_orderkey"))
                   & (F.col("a.l_suppkey") != F.col("w.l_suppkey")),
                   "left_semi")
            .join(x, (F.col("x.l_orderkey") == F.col("w.l_orderkey"))
                  & (F.col("x.l_suppkey") != F.col("w.l_suppkey")),
                  "left_anti"))
    return (cand.join(F.broadcast(supp), F.col("w.l_suppkey") == supp.s_suppkey)
            .join(F.broadcast(nat.where(F.col("n_name") == "NATION_2")),
                  supp.s_nationkey == nat.n_nationkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait")))


@query("q22_idle_customer_balance", """
WITH avgbal AS (SELECT avg(c_acctbal) AS ab FROM customer
                WHERE c_acctbal > 0.0)
SELECT c_custkey % 7 AS cntrycode,
       CAST(count(*) AS BIGINT) AS numcust,
       round(sum(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT ab FROM avgbal)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
""")
def q22_idle_customer_balance(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average-
    balance customers with no RECENT orders (none since 1999 — every
    synthetic customer has some order, so the pure no-orders form
    returns an evidence-free empty set), grouped by a synthetic
    country code (custkey mod 7 — the schema has no phone column).
    Scalar AVG subquery = 1-row broadcast; NOT EXISTS = left-anti on
    custkey against the date-pruned distinct order custkeys, so the
    fact side reduces before it moves."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    ab = (cust.where(F.col("c_acctbal") > 0.0)
          .agg(F.avg("c_acctbal").alias("ab")))
    return (cust.crossJoin(F.broadcast(ab))
            .where(F.col("c_acctbal") > F.col("ab"))
            .join(orders.where(F.col("o_orderdate")
                                     >= F.lit("1999-01-01").cast("timestamp"))
                  .select("o_custkey").distinct(),
                  cust.c_custkey == F.col("o_custkey"), "left_anti")
            .groupBy((F.col("c_custkey") % 7).alias("cntrycode"))
            .agg(F.count("*").alias("numcust"),
                 round_half_away(F.sum("c_acctbal"), 2).alias("totacctbal")))


@query("weighted_sample_wor", """
WITH keyed AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         round(ln((CAST(CAST('0x' || substr(
                       md5('wsw:' || CAST(doc_id AS VARCHAR)), 1, 13)
                     AS BIGINT) AS DOUBLE) + 0.5) / 4503599627370496.0)
               / CAST(n_chars AS DOUBLE), 12) AS skey
  FROM documents WHERE n_chars > 0)
SELECT doc_id, weight, skey FROM keyed
ORDER BY skey DESC, doc_id LIMIT 120
""")
def weighted_sample_wor_query(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (curation.weighted_sample_wor, Efraimidis-Spirakis A-ES): top-120
    docs by the key ln(u)/w with u md5-derived and w = n_chars —
    inclusion odds proportional to length, no replacement, no seed.
    The plan is one map-side key projection + TakeOrderedAndProject
    (per-partition k-row heaps), never a global sort."""
    from amundsendatabuilder_spark.operators.curation import (
        weighted_sample_wor)
    (docs,) = _t(spark, sf_dir, "documents")
    return weighted_sample_wor(docs, k=120, weight_col="n_chars")


@query("temperature_mixture_plan", """
WITH counts AS (SELECT lang AS domain, CAST(count(*) AS BIGINT) AS n_docs
                FROM documents GROUP BY 1),
w AS (SELECT domain, n_docs,
             CAST(round(pow(CAST(n_docs AS DOUBLE), 0.5) * 1e6, 0)
                  AS BIGINT) AS wv
      FROM counts),
t AS (SELECT sum(wv) AS tw FROM w),
q AS (SELECT domain, n_docs, wv, tw,
             200 * wv // tw AS quota,
             (200 * wv) % tw AS rem
      FROM w CROSS JOIN t),
r AS (SELECT *, 200 - sum(quota) OVER () AS leftover,
             row_number() OVER (ORDER BY rem DESC, domain) AS pos
      FROM q),
s AS (SELECT domain, n_docs, wv, tw,
             quota + CASE WHEN pos <= leftover THEN 1 ELSE 0 END AS target
      FROM r)
SELECT domain, n_docs,
       CAST(round(1e6 * wv / tw, 0) AS BIGINT) AS weight_ppm,
       CAST(target AS BIGINT) AS target,
       CAST(least(target, n_docs) AS BIGINT) AS capped_target,
       CAST(greatest(target - n_docs, 0) AS BIGINT) AS deficit
FROM s
""")
def temperature_mixture_plan(spark, sf_dir):
    """Temperature-scaled language-mixture plan
    (curation.temperature_mixture, alpha=0.5, budget=200): seats
    apportioned to n_lang^0.5 by largest remainder in exact BIGINT
    arithmetic (the n^alpha weight is quantized once to a 1e6-scaled
    integer), capped at supply with the shortfall reported as deficit.
    One combinable count per language; all seat math runs on the
    5-row domain table."""
    from amundsendatabuilder_spark.operators.curation import (
        temperature_mixture)
    (docs,) = _t(spark, sf_dir, "documents")
    return temperature_mixture(docs, domain_col="lang", alpha=0.5,
                               budget=200)


def _kcore_oracle(k: int = 4, rounds: int = 6) -> str:
    head = """
WITH keys AS MATERIALIZED (SELECT DISTINCT o_orderkey AS k FROM orders),
nv AS (SELECT ((max(k) // 10) * 10 + 10) AS n FROM keys),
raw AS (
  SELECT a.k AS u, b.k AS v FROM keys a
  JOIN keys b ON b.k = a.k - (a.k % 10) WHERE a.k % 10 <> 0
  UNION ALL
  SELECT a.k AS u, b.k AS v FROM keys a
  JOIN keys b ON b.k = a.k + 1 WHERE a.k % 10 <> 9
  UNION ALL
  SELECT a.k AS u, b.k AS v FROM keys a
  JOIN keys b ON b.k = a.k + 2 WHERE a.k % 10 <= 7
  UNION ALL
  SELECT a.k AS u, b.k AS v FROM keys a CROSS JOIN nv
  JOIN keys b ON b.k = (a.k + 10) % nv.n WHERE a.k % 10 = 0
  UNION ALL
  SELECT a.k AS u, b.k AS v FROM keys a CROSS JOIN nv
  JOIN keys b ON b.k = (a.k + 20) % nv.n WHERE a.k % 10 = 0
  UNION ALL
  SELECT a.k AS u, b.k AS v FROM keys a CROSS JOIN nv
  JOIN keys b ON b.k = (a.k + 30) % nv.n WHERE a.k % 10 = 0),
e0 AS MATERIALIZED (SELECT DISTINCT u, v FROM (
         SELECT u, v FROM raw WHERE u <> v
         UNION ALL SELECT v AS u, u AS v FROM raw WHERE u <> v))"""
    its = []
    for i in range(1, rounds + 1):
        p = f"e{i - 1}"
        its.append(f"""
d{i} AS (SELECT u, count(*) AS c FROM {p} GROUP BY u),
k{i} AS MATERIALIZED (SELECT u FROM d{i} WHERE c >= {k}),
e{i} AS MATERIALIZED (SELECT s.u, s.v FROM {p} s
       JOIN k{i} a ON a.u = s.u JOIN k{i} b ON b.u = s.v)""")
    return (head + "," + ",".join(its)
            + f"""
SELECT u AS node, CAST(count(*) AS BIGINT) AS core_degree
FROM e{rounds} GROUP BY u""")


@query("graph_k_core", _kcore_oracle())
def graph_k_core(spark, sf_dir):
    """4-core of a decade-structured graph over order keys via
    graph_algo.k_core: per decade a hub (k-k%10) with 9 spokes, a spoke
    ring (k..k+1) and chords (k..k+2), plus a wraparound hub backbone
    (hub..hub+10/20/30 mod keyspace). The spokes cascade-peel over 4
    sweeps (degree-3 ring ends first, each removal exposing the next
    pair) while the 6-regular hub backbone survives as the 4-core - the
    shape degree thresholds on the raw graph cannot find, since spokes
    and hubs BOTH start with degree >= 4 everywhere except the two ring
    ends. 6 sweeps = cascade depth + 1 no-op, so the result IS the
    fixpoint here; the DuckDB twin unrolls the same 6 sweeps, exact
    either way. Per sweep: one combinable degree count + two id-only
    semi-joins; no windows, no driver collect."""
    from amundsendatabuilder_spark.operators.graph_algo import k_core
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = orders.select(F.col("o_orderkey").alias("k")).distinct()
    nv = keys_df.agg(
        (F.expr("(max(k) DIV 10) * 10 + 10")).alias("n"))
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(cond, flt):
        return (a.where(flt).join(b, cond)
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst")))

    def hub(off):
        return (a.where(F.col("a.k") % 10 == 0)
                .crossJoin(F.broadcast(nv))
                .join(b, F.col("b.k") == (F.col("a.k") + off) % F.col("n"))
                .select(F.col("a.k").alias("src"), F.col("b.k").alias("dst")))

    edges = (em(F.col("b.k") == F.col("a.k") - (F.col("a.k") % 10),
                F.col("a.k") % 10 != 0)
             .unionByName(em(F.col("b.k") == F.col("a.k") + 1,
                             F.col("a.k") % 10 != 9))
             .unionByName(em(F.col("b.k") == F.col("a.k") + 2,
                             F.col("a.k") % 10 <= 7))
             .unionByName(hub(10)).unionByName(hub(20))
             .unionByName(hub(30)))
    return k_core(edges, k=4, rounds=6)


@query("mixture_interleave_schedule", """
WITH counts AS (SELECT lang AS domain, count(*) AS n_docs
                FROM documents GROUP BY 1),
w AS (SELECT domain,
             CAST(round(pow(CAST(n_docs AS DOUBLE), 0.5) * 1e6, 0)
                  AS BIGINT) AS wv
      FROM counts),
r AS (SELECT doc_id, lang AS domain,
             row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5('ilv:' || CAST(doc_id AS VARCHAR)), doc_id)
             AS rk
      FROM documents)
SELECT r.doc_id, r.domain, CAST(rk AS BIGINT) AS rk,
       (rk * CAST(1000000000000 AS BIGINT)) // wv AS vt
FROM r JOIN w ON w.domain = r.domain
""")
def mixture_interleave_schedule(spark, sf_dir):
    """Stride-scheduled language interleave
    (curation.mixture_interleave, alpha=0.5): doc r of domain d reads
    at virtual time r * 1e12 DIV w_d, so ascending-vt order realizes
    the temperature mixture proportionally at EVERY prefix — the
    training-loader read plan that composes temperature_mixture's
    weights with per-domain md5 ranks. Pure BIGINT stride arithmetic;
    per-domain rank windows + a broadcast 5-row weight join, no global
    sort (consumers merge shards by vt)."""
    from amundsendatabuilder_spark.operators.curation import (
        mixture_interleave)
    (docs,) = _t(spark, sf_dir, "documents")
    return mixture_interleave(docs, domain_col="lang", alpha=0.5)


@query("embedding_decontam_audit", """
WITH b AS (SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
           FROM embeddings WHERE vec_id % 20 = 0),
t AS (SELECT vec_id, embedding::DOUBLE[] AS v
      FROM embeddings WHERE vec_id % 20 <> 0),
hits AS (SELECT t.vec_id, b.bench_id,
                round(list_cosine_similarity(t.v, b.bv), 6) AS cos
         FROM t CROSS JOIN b
         WHERE round(list_cosine_similarity(t.v, b.bv), 6) >= 0.3),
agg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
               max(cos) AS max_cos
        FROM hits GROUP BY 1)
SELECT a.vec_id, a.n_bench_hits, a.max_cos,
       CAST(min(h.bench_id) AS BIGINT) AS nearest_bench
FROM agg a JOIN hits h ON h.vec_id = a.vec_id AND h.cos = a.max_cos
GROUP BY 1, 2, 3
""")
def embedding_decontam_audit(spark, sf_dir):
    """Semantic decontamination audit (dedup.embedding_decontam):
    benchmark = every 20th vector, train = the rest; exact broadcast
    cosine scan flags train vectors within 0.3 of any benchmark vector
    with hit count, max cosine, and deterministic nearest benchmark id.
    The embedding-space complement of bloom_decontam_membership /
    benchmark_overlap (lexical n-grams miss paraphrases). The oracle
    re-derives the argmax independently via a max-cos re-join + min."""
    (emb,) = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 20 == 0)
    train = emb.where(F.col("vec_id") % 20 != 0)
    return dedup.embedding_decontam(train, bench, threshold=0.30)


@query("dsir_importance_weights", r"""
WITH t AS (SELECT doc_id, """ + _LTOKS_SQL + r""" AS toks FROM documents),
tk AS (SELECT doc_id, i, toks[i] AS tok
       FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
             FROM t)),
f AS (SELECT doc_id,
             CAST('0x' || substr(md5('dsir:' || feat), 1, 15) AS BIGINT)
             % 1024 AS bucket
      FROM (SELECT doc_id, tok AS feat FROM tk
            UNION ALL
            SELECT a.doc_id, a.tok || ' ' || b.tok AS feat
            FROM tk a JOIN tk b
              ON a.doc_id = b.doc_id AND b.i = a.i + 1)),
db AS (SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c
       FROM f GROUP BY 1, 2),
rb AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS rc FROM db GROUP BY 1),
tb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS tc
       FROM f JOIN documents USING (doc_id)
       WHERE lang = 'en' GROUP BY 1),
tot AS (SELECT (SELECT CAST(sum(rc) AS DOUBLE) FROM rb) AS R,
               (SELECT CAST(coalesce(sum(tc), 0) AS DOUBLE) FROM tb) AS T),
llr AS (SELECT rb.bucket,
               round(ln((CAST(coalesce(tc, 0) AS DOUBLE) + 1.0)
                        / (T + 1024.0))
                     - ln((CAST(rc AS DOUBLE) + 1.0) / (R + 1024.0)), 9)
               AS llr
        FROM rb LEFT JOIN tb ON tb.bucket = rb.bucket CROSS JOIN tot),
agg AS (SELECT db.doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
               round(sum(CAST(round(round(CAST(c AS DOUBLE) * llr, 9)
                                    * 1e9) AS BIGINT)) / 1e9, 6) AS logw
        FROM db JOIN llr ON llr.bucket = db.bucket GROUP BY 1)
SELECT d.doc_id, coalesce(n_feats, CAST(0 AS BIGINT)) AS n_feats,
       coalesce(logw, 0.0) AS logw
FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
""")
def dsir_importance_weights_query(spark, sf_dir):
    """DSIR data selection (curation.dsir_importance_weights): hashed
    unigram+bigram bag-of-buckets log-likelihood ratio of the lang='en'
    target domain vs the whole raw pool, per document — the published
    importance-resampling scoring pass (Xie et al. 2023), exact in 1024
    hash buckets. Bucket LLRs round to 9dp and per-doc sums ride int64
    nano-units so the double fold is order-independent cross-engine."""
    from amundsendatabuilder_spark.operators.curation import (
        dsir_importance_weights)
    (docs,) = _t(spark, sf_dir, "documents")
    return dsir_importance_weights(docs, docs.where(F.col("lang") == "en"),
                                   n_buckets=1024)


@query("padding_waste_report", r"""
WITH base AS (
  SELECT doc_id AS _id,
         CAST(len(""" + _LTOKS_SQL + r""") AS BIGINT) AS n_tok,
         CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 16 AS shard,
         md5('pad:' || CAST(doc_id AS VARCHAR)) AS rnd
  FROM documents),
stacked AS (
  SELECT 'naive' AS strategy, CAST(0 AS BIGINT) AS key0, * FROM base
  UNION ALL
  SELECT 'bucketed', n_tok, * FROM base),
rn AS (SELECT strategy, shard, n_tok,
              row_number() OVER (PARTITION BY strategy, shard
                                 ORDER BY key0, rnd, _id) AS _rn
       FROM stacked),
pb AS (SELECT strategy, shard, (_rn - 1) // 8 AS batch,
              max(n_tok) AS mx, sum(n_tok) AS real,
              CAST(count(*) AS BIGINT) AS rows_
       FROM rn GROUP BY 1, 2, 3),
agg AS (SELECT strategy, CAST(count(*) AS BIGINT) AS n_batches,
               CAST(sum(real) AS BIGINT) AS real_tokens,
               CAST(sum(mx * rows_) AS BIGINT) AS slot_tokens
        FROM pb GROUP BY 1)
SELECT strategy, n_batches, real_tokens, slot_tokens,
       slot_tokens - real_tokens AS waste_tokens,
       CASE WHEN slot_tokens > 0 THEN
            (slot_tokens - real_tokens) * CAST(1000000 AS BIGINT)
            // slot_tokens
            ELSE CAST(0 AS BIGINT) END AS waste_ppm
FROM agg
""")
def padding_waste_report_query(spark, sf_dir):
    """Padding-waste batch-planning report
    (curation.padding_waste_report): naive md5-shuffled vs
    length-bucketed batching within 16 md5 shards, batches of 8, every
    sequence padded to its batch max — exact BIGINT token accounting
    (no floats), windows bounded by shard size. Measures the
    length-bucketing win on this corpus before committing the loader to
    it."""
    from amundsendatabuilder_spark.operators.curation import (
        padding_waste_report)
    (docs,) = _t(spark, sf_dir, "documents")
    return padding_waste_report(docs, batch_size=8, n_shards=16)


@query("ngram_diversity", r"""
WITH t AS (SELECT source, """ + _LTOKS_SQL + r""" AS toks FROM documents),
g AS (
  SELECT source, 1 AS n, toks[i] AS gram
  FROM (SELECT source, toks, unnest(range(1, len(toks) + 1)) AS i FROM t)
  UNION ALL
  SELECT source, 2, toks[i] || ' ' || toks[i+1]
  FROM (SELECT source, toks, unnest(range(1, len(toks))) AS i FROM t)
  UNION ALL
  SELECT source, 3, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
  FROM (SELECT source, toks, unnest(range(1, len(toks) - 1)) AS i FROM t)),
c AS (SELECT source, n, gram, CAST(count(*) AS BIGINT) AS c
      FROM g GROUP BY 1, 2, 3)
SELECT source, CAST(n AS INT) AS n,
       CAST(count(*) AS BIGINT) AS distinct_ngrams,
       CAST(sum(c) AS BIGINT) AS total_ngrams,
       CAST(count(*) AS BIGINT) * CAST(1000000 AS BIGINT)
       // CAST(sum(c) AS BIGINT) AS distinct_ppm
FROM c GROUP BY 1, 2
""")
def ngram_diversity_query(spark, sf_dir):
    """Distinct-1/2/3 diversity per source (textops.ngram_diversity) —
    the corpus-diversity rows of a dataset card, exact integer ppm; one
    tokenize scan feeds all three shingle widths through a single
    struct explode."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.ngram_diversity(docs, ns=(1, 2, 3))


@query("hard_negative_mining", r"""
WITH a AS (SELECT vec_id AS query_id, label AS query_label,
                  embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id % 10 = 0),
sc AS (SELECT a.query_id, a.query_label,
              e.vec_id AS neighbor_id, e.label AS neighbor_label,
              round(list_cosine_similarity(a.qv, e.embedding::DOUBLE[]), 6)
              AS cos
       FROM a JOIN embeddings e ON e.label <> a.query_label),
r AS (SELECT *, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT)
          AS rank
      FROM sc)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos, rank
FROM r WHERE rank <= 3
""")
def hard_negative_mining_query(spark, sf_dir):
    """Contrastive hard-negative mining
    (similarity.hard_negative_mining): every 10th vector anchors a
    batch; top-3 most-similar DIFFERENT-label corpus vectors per anchor
    (broadcast anchors, corpus never shuffles vectors), ties by
    neighbor id."""
    from amundsendatabuilder_spark.operators.similarity import (
        hard_negative_mining)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return hard_negative_mining(emb, emb.where(F.col("vec_id") % 10 == 0),
                                k=3)


@query("concat_window_packing", r"""
WITH base AS (
  SELECT doc_id AS _id,
         CAST(len(""" + _LTOKS_SQL + r""") AS BIGINT) AS n_tok,
         CAST('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 4)
              AS BIGINT) % 16 AS shard,
         md5('pack:' || CAST(doc_id AS VARCHAR)) AS rnd
  FROM documents),
cum AS (SELECT shard, n_tok,
               sum(n_tok) OVER (PARTITION BY shard ORDER BY rnd, _id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_end
        FROM base),
sp AS (SELECT shard, n_tok, cum_end,
              CASE WHEN n_tok > 0
                   AND (cum_end - n_tok) // 256 <> (cum_end - 1) // 256
                   THEN 1 ELSE 0 END AS split
       FROM cum),
per_shard AS (SELECT shard, CAST(count(*) AS BIGINT) AS docs,
                     max(cum_end) AS tot,
                     CAST(sum(split) AS BIGINT) AS nsplit,
                     (max(cum_end) + 255) // 256 AS n_win
              FROM sp GROUP BY 1),
agg AS (SELECT CAST(sum(docs) AS BIGINT) AS total_docs,
               CAST(sum(tot) AS BIGINT) AS total_tokens,
               CAST(sum(n_win) AS BIGINT) AS n_windows,
               CAST(sum(nsplit) AS BIGINT) AS docs_split
        FROM per_shard)
SELECT total_docs, total_tokens, n_windows, docs_split,
       docs_split * CAST(1000000 AS BIGINT) // total_docs AS split_ppm,
       n_windows * CAST(256 AS BIGINT) - total_tokens AS tail_tokens,
       CASE WHEN n_windows > 0 THEN
            total_tokens * CAST(1000000 AS BIGINT)
            // (n_windows * CAST(256 AS BIGINT))
            ELSE CAST(0 AS BIGINT) END AS fill_ppm
FROM agg
""")
def concat_window_packing_query(spark, sf_dir):
    """Concat-and-chunk packing audit (curation.concat_window_packing):
    256-token windows over md5-ordered concatenation within 16 shards —
    exact BIGINT counts of boundary-split documents and window fill, the
    trade-off twin of padding_waste_report (concat wastes ~no slots but
    splits docs; padded batching never splits but wastes slots)."""
    from amundsendatabuilder_spark.operators.curation import (
        concat_window_packing)
    (docs,) = _t(spark, sf_dir, "documents")
    return concat_window_packing(docs, window_tokens=256, n_shards=16)


@query("split_leak_audit", f"""
WITH {_minhash_bands_cte(16, 4)},
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id),
sp AS (SELECT doc_id,
              CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 4) AS BIGINT) < 52428
                   THEN 'train'
                   WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                            1, 4) AS BIGINT) < 58982
                   THEN 'val'
                   ELSE 'test' END AS split
       FROM documents),
tagged AS (SELECT least(x.split, y.split) AS split_a,
                  greatest(x.split, y.split) AS split_b
           FROM pairs JOIN sp x ON x.doc_id = pairs.doc_a
                      JOIN sp y ON y.doc_id = pairs.doc_b)
SELECT split_a, split_b, CAST(count(*) AS BIGINT) AS n_pairs,
       split_a <> split_b AS leak
FROM tagged GROUP BY 1, 2
""")
def split_leak_audit_query(spark, sf_dir):
    """Split-contamination matrix (curation.split_leak_audit): the
    MinHash-LSH near-dup pair set joined against the naive per-doc hash
    split (textops.split_assign) — cross-split rows are leaked eval
    data, the measured motivation for leakage_safe_split. Pair set
    broadcasts through both endpoint joins; the corpus-sized split map
    never shuffles."""
    from amundsendatabuilder_spark.operators.curation import (
        split_leak_audit)
    from amundsendatabuilder_spark.operators.dedup import minhash_lsh_pairs
    (docs,) = _t(spark, sf_dir, "documents")
    return split_leak_audit(minhash_lsh_pairs(docs),
                            textops.split_assign(docs))


@query("oov_rate_report", r"""
WITH tok AS (SELECT source, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
v AS (SELECT tok FROM (SELECT tok, sum(c) AS n FROM st GROUP BY 1)
      ORDER BY n DESC, tok LIMIT 16)
SELECT source, CAST(sum(c) AS BIGINT) AS total_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
       AS oov_tokens,
       CAST(sum(CASE WHEN v.tok IS NULL THEN c ELSE 0 END) AS BIGINT)
       * CAST(1000000 AS BIGINT) // CAST(sum(c) AS BIGINT) AS oov_ppm
FROM st LEFT JOIN v ON v.tok = st.tok
GROUP BY 1
""")
def oov_rate_report_query(spark, sf_dir):
    """OOV coverage per source against the corpus top-16 vocabulary
    (textops.oov_rate_report) — tokens collapse to (source, token)
    counts before anything global; the vocab cut is a distributed
    top-V then a broadcast membership join."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.oov_rate_report(docs, vocab_size=16)


@query("zipf_alpha_report", r"""
WITH tok AS (SELECT source, unnest(""" + _LTOKS_SQL + r""") AS tok
             FROM documents),
st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
rk AS (SELECT source, c,
              row_number() OVER (PARTITION BY source
                                 ORDER BY c DESC, tok) AS rank
       FROM st),
q AS (SELECT source, c,
             CAST(round(ln(CAST(rank AS DOUBLE)) * 1e6, 0) AS BIGINT) AS x,
             CAST(round(ln(CAST(c AS DOUBLE)) * 1e6, 0) AS BIGINT) AS y
      FROM rk WHERE rank <= 20),
s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_points,
             max(c) AS top_count,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM q GROUP BY 1)
SELECT source, n_points, top_count,
       CASE WHEN n_points * sxx - sx * sx > 0
            THEN round(-(CAST(n_points * sxy - sx * sy AS DOUBLE)
                         / CAST(n_points * sxx - sx * sx AS DOUBLE)), 6)
            END AS zipf_alpha
FROM s
""")
def zipf_alpha_report_query(spark, sf_dir):
    """Zipf exponent per source (textops.zipf_alpha_report): ln-rank vs
    ln-frequency least squares over each source's top-20 tokens, every
    sufficient statistic an exact 1e6-quantized integer sum
    (trend_slopes' determinism contract), one double division at the
    end — the distribution-shape row of a dataset card."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.zipf_alpha_report(docs, top_r=20)


def _jl_distortion_oracle(k: int = 16, seed: int = 11) -> str:
    """Replay oracle for jl_distortion_audit: same seeded planes baked
    as exact double literals; projections, cosines, and the ppm
    quantization mirror the Spark fold order exactly."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, k, seed=seed)

    def lit(p):
        return "CAST([" + ",".join(repr(x) for x in p) + "] AS DOUBLE[])"

    proj = "[" + ",\n       ".join(
        f"list_dot_product(v, {lit(p)})" for p in planes) + "]"
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT vec_id, v,
      {proj} AS pr FROM e),
pairs AS (SELECT CAST(round(abs(
                 round(list_cosine_similarity(a.pr, b.pr), 6)
                 - round(list_cosine_similarity(a.v, b.v), 6)) * 1e6, 0)
                 AS BIGINT) AS err_ppm
          FROM p a JOIN p b ON a.vec_id < b.vec_id
          WHERE CAST('0x' || substr(md5('jl:' || CAST(a.vec_id AS VARCHAR)),
                                    1, 8) AS BIGINT) % 10 = 0
            AND CAST('0x' || substr(md5('jl:' || CAST(b.vec_id AS VARCHAR)),
                                    1, 8) AS BIGINT) % 13 = 0)
SELECT CAST({k} AS INT) AS k_dims, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(err_ppm) // count(*) AS BIGINT) AS mean_err_ppm,
       max(err_ppm) AS max_err_ppm
FROM pairs
"""


@query("jl_distortion_audit", _jl_distortion_oracle())
def jl_distortion_audit_query(spark, sf_dir):
    """JL projection distortion audit (similarity.jl_distortion_audit):
    64-dim embeddings projected to 16 seeded Gaussian dims; cosine
    error over a mod-hashed pair sample in exact integer ppm — the
    go/no-go check before an ANN pipeline trusts the projected space."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        jl_distortion_audit)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return jl_distortion_audit(emb, random_planes(64, 16, seed=11))


@query("quality_rank_blend", r"""
WITH t AS (SELECT doc_id, text, """ + _TOKS_SQL + r""" AS toks
           FROM documents),
m AS (SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_tok,
        CASE WHEN length(text) > 0
             THEN CAST(length(text)
                       - length(regexp_replace(text, '[.,;:!?''"()]', '',
                                               'g')) AS DOUBLE)
                  / length(text) ELSE 0.0 END AS praw,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS diversity
      FROM t),
sig AS (
  SELECT doc_id, 'quality' AS signal,
         CAST(round(round(least(n_tok / 100.0, 1.0) * 0.4
                          + diversity * 0.4 + (1 - praw) * 0.2, 4)
                    * 1e4, 0) AS BIGINT) AS v
  FROM m
  UNION ALL SELECT doc_id, 'length', n_tok FROM m
  UNION ALL SELECT doc_id, 'diversity',
                   CAST(round(diversity * 1e4, 0) AS BIGINT) FROM m),
reg AS (SELECT signal, v, CAST(count(*) AS BIGINT) AS c
        FROM sig GROUP BY 1, 2),
cum AS (SELECT signal, v,
               CAST(coalesce(sum(c) OVER (
                   PARTITION BY signal ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_lt
        FROM reg),
n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM documents),
r AS (SELECT doc_id, signal,
             CAST(cum_lt * CAST(1000000 AS BIGINT) // nn AS BIGINT)
             AS rank_ppm
      FROM sig JOIN cum USING (signal, v) CROSS JOIN n),
p AS (SELECT doc_id,
             max(CASE WHEN signal = 'quality' THEN rank_ppm END)
                 AS quality_rank_ppm,
             max(CASE WHEN signal = 'length' THEN rank_ppm END)
                 AS length_rank_ppm,
             max(CASE WHEN signal = 'diversity' THEN rank_ppm END)
                 AS diversity_rank_ppm
      FROM r GROUP BY 1)
SELECT doc_id, quality_rank_ppm, length_rank_ppm, diversity_rank_ppm,
       (quality_rank_ppm + length_rank_ppm + diversity_rank_ppm) // 3
       AS blend_ppm
FROM p
""")
def quality_rank_blend_query(spark, sf_dir):
    """Rank-fusion quality ensemble (curation.quality_rank_blend):
    corpus rank under quality_score, token count, and token diversity,
    each from a bounded cumulative-register table (never a corpus sort),
    blended by integer rank average — the scale-commensurable way to
    fuse filter signals."""
    from amundsendatabuilder_spark.operators.curation import (
        quality_rank_blend)
    (docs,) = _t(spark, sf_dir, "documents")
    return quality_rank_blend(docs)


@query("winnowing_fingerprints", r"""
WITH pos AS (SELECT doc_id, text,
                    unnest(range(1, length(text) - 8 + 2)) AS p
             FROM documents WHERE length(text) >= 8),
g AS (SELECT doc_id, p,
             substr(md5(substr(text, CAST(p AS INT), 8)), 1, 16) AS gh
      FROM pos),
wnd AS (SELECT doc_id,
               min(gh) OVER fr AS mngh,
               count(*) OVER fr AS cnt
        FROM g
        WINDOW fr AS (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING)),
fp AS (SELECT DISTINCT doc_id, mngh AS fp FROM wnd WHERE cnt = 4),
sh AS (SELECT doc_id, fp,
              count(*) OVER (PARTITION BY fp) AS n_docs
       FROM fp)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       AS n_shared,
       CAST(sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       * CAST(1000000 AS BIGINT) // CAST(count(*) AS BIGINT)
       AS shared_ppm
FROM sh GROUP BY 1
""")
def winnowing_fingerprints_query(spark, sf_dir):
    """MOSS winnowing fingerprints (dedup.winnowing_fingerprints,
    k=8, w=4): per-doc distinct window-minimum gram hashes with the
    shared-across-docs fraction — the LOCAL-overlap candidate
    generator (any shared substring >= k+w-1 chars shares a
    fingerprint) complementing MinHash's whole-doc resemblance."""
    from amundsendatabuilder_spark.operators.dedup import (
        winnowing_fingerprints)
    (docs,) = _t(spark, sf_dir, "documents")
    return winnowing_fingerprints(docs, k=8, w=4)


@query("embedding_dim_robust_stats", r"""
WITH u AS (SELECT generate_subscripts(embedding, 1) - 1 AS pos,
                  unnest(embedding::DOUBLE[]) AS x
           FROM embeddings),
reg AS (SELECT pos, CAST(round(x * 10000, 0) AS BIGINT) AS q,
               CAST(count(*) AS BIGINT) AS c
        FROM u GROUP BY 1, 2),
cum AS (SELECT pos, q, c,
               sum(c) OVER (PARTITION BY pos ORDER BY q) AS cumc,
               sum(c) OVER (PARTITION BY pos) AS n
        FROM reg),
med AS (SELECT pos, min(q) AS medq, CAST(max(n) AS BIGINT) AS n
        FROM cum WHERE cumc * 2 >= n GROUP BY pos),
dev AS (SELECT reg.pos, abs(q - medq) AS dq, sum(c) AS c
        FROM reg JOIN med ON med.pos = reg.pos GROUP BY 1, 2),
dcum AS (SELECT pos, dq,
                sum(c) OVER (PARTITION BY pos ORDER BY dq) AS cumc,
                sum(c) OVER (PARTITION BY pos) AS n
         FROM dev),
mad AS (SELECT pos, min(dq) AS madq
        FROM dcum WHERE cumc * 2 >= n GROUP BY pos)
SELECT CAST(med.pos AS INT) AS pos, med.n,
       round(medq / 10000.0, 4) AS median,
       round(madq / 10000.0, 4) AS mad
FROM med JOIN mad ON mad.pos = med.pos
""")
def embedding_dim_robust_stats_query(spark, sf_dir):
    """Per-dimension discrete median + MAD from quantized registers
    (profiling.embedding_dim_robust_stats) — the outlier-immune profile
    of the embedding space; registers bounded by dims x range x scale
    regardless of corpus rows, cumulative windows only over registers."""
    from amundsendatabuilder_spark.operators.profiling import (
        embedding_dim_robust_stats)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return embedding_dim_robust_stats(emb, scale=10_000)


@query("heaps_law_fit", (r"""
WITH base AS (SELECT source AS grp, doc_id AS did, text FROM documents),
tok AS (SELECT grp, did, unnest(""" + """REPLACE_LTOKS""" + r""") AS tok
        FROM base),
first AS (SELECT grp, tok, min(did) AS first_doc
          FROM tok GROUP BY 1, 2),
per_doc AS (SELECT grp, did,
                   CAST(len(""" + """REPLACE_LTOKS""" + r""") AS BIGINT)
                   AS n_toks
            FROM base),
bounds AS (SELECT grp, min(did) AS lo, max(did) AS hi
           FROM per_doc GROUP BY 1),
cps AS (SELECT DISTINCT grp, lo + ((hi - lo) * j) // 8 AS cp
        FROM bounds, unnest(range(1, 9)) AS t(j)),
toks_at AS (SELECT p.grp, c.cp, CAST(sum(p.n_toks) AS BIGINT) AS n_tok
            FROM per_doc p JOIN cps c ON c.grp = p.grp
            WHERE p.did <= c.cp GROUP BY 1, 2),
vocab_at AS (SELECT f.grp, c.cp, CAST(count(*) AS BIGINT) AS n_vocab
             FROM first f JOIN cps c ON c.grp = f.grp
             WHERE f.first_doc <= c.cp GROUP BY 1, 2),
pts AS (SELECT t.grp,
               CAST(round(ln(CAST(t.n_tok AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS x,
               CAST(round(ln(CAST(v.n_vocab AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS y,
               t.n_tok, v.n_vocab
        FROM toks_at t JOIN vocab_at v
          ON v.grp = t.grp AND v.cp = t.cp
        WHERE t.n_tok > 0 AND v.n_vocab > 0),
s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_points,
             max(n_tok) AS total_tokens, max(n_vocab) AS vocab_total,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY 1)
SELECT grp AS source, n_points, total_tokens, vocab_total,
       CASE WHEN n_points * sxx - sx * sx > 0
            THEN round(CAST(n_points * sxy - sx * sy AS DOUBLE)
                       / CAST(n_points * sxx - sx * sx AS DOUBLE), 6)
            END AS heaps_beta
FROM s
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def heaps_law_fit_query(spark, sf_dir):
    """Heaps'-law vocabulary-growth exponent per source
    (textops.heaps_law_fit): ln(vocab) on ln(cumulative tokens) least
    squares at 8 integer doc-id checkpoints — first-occurrence
    registers + conditional aggregation, no corpus window, every
    regression statistic an exact 1e6-quantized integer sum. The
    growth-curve complement of zipf_alpha_report on a dataset card."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.heaps_law_fit(docs, n_checkpoints=8)


@query("token_js_divergence", (r"""
WITH tok AS (SELECT source AS grp, unnest(REPLACE_LTOKS) AS tok
             FROM documents),
st AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
totals AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM st GROUP BY 1),
co AS (SELECT a.grp AS ga, b.grp AS gb, a.tok, a.c AS ca, b.c AS cb,
              na.n AS na, nb.n AS nb
       FROM st a JOIN st b ON b.tok = a.tok AND a.grp < b.grp
       JOIN totals na ON na.grp = a.grp
       JOIN totals nb ON nb.grp = b.grp),
terms AS (SELECT ga, gb, ca, cb,
                 CAST(round((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                      * ln(2.0 * (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                           / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                              + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))))
                      * 1e9, 0) AS BIGINT) AS qa,
                 CAST(round((CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                      * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))
                           / ((CAST(ca AS DOUBLE) / CAST(na AS DOUBLE))
                              + (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))))
                      * 1e9, 0) AS BIGINT) AS qb
          FROM co),
agg AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS n_common,
               CAST(sum(ca) AS BIGINT) AS co_mass_a,
               CAST(sum(cb) AS BIGINT) AS co_mass_b,
               CAST(sum(qa) AS BIGINT) AS sqa,
               CAST(sum(qb) AS BIGINT) AS sqb
        FROM terms GROUP BY 1, 2),
pairs AS (SELECT a.grp AS ga, b.grp AS gb, a.n AS na, b.n AS nb
          FROM totals a JOIN totals b ON a.grp < b.grp),
s AS (SELECT p.ga, p.gb, p.na, p.nb,
             coalesce(n_common, 0) AS n_common,
             coalesce(co_mass_a, 0) AS co_mass_a,
             coalesce(co_mass_b, 0) AS co_mass_b,
             coalesce(sqa, 0) AS sqa, coalesce(sqb, 0) AS sqb
      FROM pairs p LEFT JOIN agg
        ON agg.ga = p.ga AND agg.gb = p.gb)
SELECT ga AS source_a, gb AS source_b,
       CAST(n_common AS BIGINT) AS n_common_tokens,
       round(0.5 * (CAST(sqa AS DOUBLE) / 1e9
                    + (CAST(na - co_mass_a AS DOUBLE)
                       / CAST(na AS DOUBLE)) * 0.6931471805599453
                    + CAST(sqb AS DOUBLE) / 1e9
                    + (CAST(nb - co_mass_b AS DOUBLE)
                       / CAST(nb AS DOUBLE)) * 0.6931471805599453), 6)
       AS js_divergence
FROM s
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def token_js_divergence_query(spark, sf_dir):
    """Pairwise source Jensen-Shannon divergence over unigram token
    distributions (textops.token_js_divergence): co-occurring-token
    self-join + exact integer missing-mass correction — no outer join,
    no corpus window; per-token KL terms quantized to 1e9-scaled BIGINT
    before the cross-partition sum. Disjoint-vocabulary pairs emit
    exactly ln 2."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.token_js_divergence(docs)


@query("vocab_coverage_curve", (r"""
WITH tok AS (SELECT source AS grp, unnest(REPLACE_LTOKS) AS tok
             FROM documents),
st AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
rk AS (SELECT grp, c,
              row_number() OVER (PARTITION BY grp
                                 ORDER BY c DESC, tok) AS rn
       FROM st),
tot AS (SELECT grp, CAST(count(*) AS BIGINT) AS vocab,
               CAST(sum(c) AS BIGINT) AS total
        FROM st GROUP BY 1),
ks AS (SELECT CAST(unnest([1, 3, 10, 100, 1000, 10000]) AS BIGINT) AS k)
SELECT r.grp AS source, k.k, t.vocab AS vocab_size,
       CAST(sum(r.c) AS BIGINT) AS covered_occurrences,
       t.total AS total_occurrences,
       round(CAST(sum(r.c) AS DOUBLE) / CAST(t.total AS DOUBLE), 6)
       AS coverage
FROM rk r
JOIN tot t ON t.grp = r.grp
JOIN ks k ON r.rn <= least(k.k, t.vocab)
GROUP BY 1, 2, 3, 5
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def vocab_coverage_curve_query(spark, sf_dir):
    """Top-k token-occurrence coverage per source
    (textops.vocab_coverage_curve). The Spark side computes coverage
    from the count-of-counts register (no vocab sort); this twin
    derives it INDEPENDENTLY by sorting tokens (row_number) and
    summing the top k — a genuinely independent oracle in the
    quality_decile_table tradition."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.vocab_coverage_curve(docs)


def _bootstrap_ci_oracle(n_boot: int = 40) -> str:
    """Replay oracle for bootstrap_ci_quality: same baked 52-bit
    Poisson(1) CDF thresholds, md5-derived draws, integer weighted
    sums, and nearest-rank percentile selection."""
    from amundsendatabuilder_spark.operators.curation import (
        _poisson1_thresholds_52bit)
    ts = _poisson1_thresholds_52bit()
    wexpr = " + ".join(
        f"(CASE WHEN v >= {t} THEN 1 ELSE 0 END)" for t in ts)
    return ("WITH " + _QUALITY_CTE + f""",
src AS (SELECT d.doc_id AS did, d.source AS grp,
               CAST(round(q.quality * 1e6, 0) AS BIGINT) AS qi
        FROM documents d JOIN q ON q.doc_id = d.doc_id),
fan AS (SELECT grp, did, qi, CAST(j AS BIGINT) AS b
        FROM src, range(1, {n_boot + 1}) t(j)),
draw AS (SELECT grp, b, qi,
                CAST('0x' || substr(md5('boot:' || CAST(did AS VARCHAR)
                     || ':' || CAST(b AS VARCHAR)), 1, 13) AS BIGINT)
                AS v
         FROM fan),
wt AS (SELECT grp, b, qi, CAST({wexpr} AS BIGINT) AS w FROM draw),
per_b AS (SELECT grp, b, CAST(sum(w * qi) AS BIGINT) AS wq,
                 CAST(sum(w) AS BIGINT) AS sw
          FROM wt GROUP BY 1, 2),
mb AS (SELECT grp, b, CAST(wq AS DOUBLE) / CAST(sw AS DOUBLE) AS mb
       FROM per_b WHERE sw > 0),
rk AS (SELECT grp, b, mb,
              row_number() OVER (PARTITION BY grp ORDER BY mb, b) AS rn,
              count(*) OVER (PARTITION BY grp) AS nb
       FROM mb),
ci AS (SELECT grp,
              max(CASE WHEN rn = greatest(CAST(ceil(nb * 0.025) AS BIGINT),
                                          1) THEN mb END) AS lo,
              max(CASE WHEN rn = CAST(ceil(nb * 0.975) AS BIGINT)
                       THEN mb END) AS hi
       FROM rk GROUP BY 1),
overall AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(qi) AS BIGINT) AS sq
            FROM src GROUP BY 1)
SELECT o.grp AS source, o.n_docs,
       round(CAST(o.sq AS DOUBLE) / CAST(o.n_docs AS DOUBLE) / 1e6, 6)
       AS mean_quality,
       round(c.lo / 1e6, 6) AS ci_lo,
       round(c.hi / 1e6, 6) AS ci_hi
FROM overall o JOIN ci c ON c.grp = o.grp""")


@query("bootstrap_ci_quality", _bootstrap_ci_oracle())
def bootstrap_ci_quality_query(spark, sf_dir):
    """Poisson-bootstrap CI for per-source mean quality
    (curation.bootstrap_ci_quality): 40 deterministic md5-seeded
    Poisson(1) resamples via baked integer CDF thresholds, exact
    1e6-quantized weighted sums, nearest-rank percentile over the
    groups x 40 register table — the uncertainty row of a dataset
    card."""
    from amundsendatabuilder_spark.operators.curation import (
        bootstrap_ci_quality)
    (docs,) = _t(spark, sf_dir, "documents")
    return bootstrap_ci_quality(docs, n_boot=40)


def _benford_oracle() -> str:
    """Replay oracle for benford_audit over lineitem extended prices
    grouped by return flag: same integer-string digit path, baked
    1e9-quantized Benford probabilities, 1e6-quantized chi-square
    terms, struct-free worst-digit pick (min digit at max deviation)."""
    import math
    rows = ", ".join(
        f"({d}, {int(round(math.log10(1 + 1 / d) * 1e9))})"
        for d in range(1, 10))
    return f"""
WITH pdf(d, p_e9) AS (VALUES {rows}),
base AS (SELECT l_returnflag AS grp,
                CAST(substr(CAST(CAST(round(abs(l_extendedprice) * 1e6, 0)
                     AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS d
         FROM lineitem
         WHERE l_extendedprice IS NOT NULL
           AND CAST(round(abs(l_extendedprice) * 1e6, 0) AS BIGINT) > 0),
reg AS (SELECT grp, d, CAST(count(*) AS BIGINT) AS c
        FROM base GROUP BY 1, 2),
tot AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM reg GROUP BY 1),
filled AS (SELECT t.grp, p.d, t.n, p.p_e9, coalesce(r.c, 0) AS c
         FROM tot t CROSS JOIN pdf p
         LEFT JOIN reg r ON r.grp = t.grp AND r.d = p.d),
scored AS (SELECT grp, n,
                  CAST(round(power(CAST(c AS DOUBLE)
                       - CAST(n AS DOUBLE) * CAST(p_e9 AS DOUBLE) / 1e9, 2)
                       / (CAST(n AS DOUBLE) * CAST(p_e9 AS DOUBLE) / 1e9)
                       * 1e6, 0) AS BIGINT) AS chi_e6,
                  CAST(round(abs(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       - CAST(p_e9 AS DOUBLE) / 1e9) * 1e6, 0) AS BIGINT)
                  AS dev,
                  d
           FROM filled)
SELECT grp AS l_returnflag, max(n) AS n_values,
       round(CAST(sum(chi_e6) AS DOUBLE) / 1e6, 6) AS chi_square,
       max(dev) AS max_abs_dev_ppm,
       CAST(min(CASE WHEN dev = (SELECT max(s2.dev) FROM scored s2
                                 WHERE s2.grp = scored.grp)
                     THEN d END) AS INT) AS worst_digit
FROM scored GROUP BY 1"""


@query("benford_audit", _benford_oracle())
def benford_audit_query(spark, sf_dir):
    """Benford first-digit audit of l_extendedprice per return flag
    (profiling.benford_audit): leading digit read from the 1e6-quantized
    integer's string form (no float log / %e rounding in the digit
    path), chi-square against baked Benford probabilities over a
    groups x 9 register table."""
    from amundsendatabuilder_spark.operators.profiling import benford_audit
    (li,) = _t(spark, sf_dir, "lineitem")
    return benford_audit(li, "l_extendedprice", group_col="l_returnflag")


@query("chi_square_independence", r"""
WITH base AS (SELECT CAST(o_orderpriority AS VARCHAR) AS a,
                     CAST(o_orderstatus AS VARCHAR) AS b
              FROM orders
              WHERE o_orderpriority IS NOT NULL
                AND o_orderstatus IS NOT NULL),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(count(DISTINCT a) AS BIGINT) AS la,
               CAST(count(DISTINCT b) AS BIGINT) AS lb
        FROM cells),
grid AS (SELECT ra.a, rb.b, ra.ca, rb.cb, coalesce(cl.c, 0) AS c
         FROM ra CROSS JOIN rb
         LEFT JOIN cells cl ON cl.a = ra.a AND cl.b = rb.b),
q AS (SELECT t.n, t.la, t.lb,
             CAST(round(power(CAST(g.c AS DOUBLE)
                  - CAST(g.ca AS DOUBLE) * CAST(g.cb AS DOUBLE)
                    / CAST(t.n AS DOUBLE), 2)
                  / (CAST(g.ca AS DOUBLE) * CAST(g.cb AS DOUBLE)
                     / CAST(t.n AS DOUBLE)) * 1e6, 0) AS BIGINT) AS t_e6
      FROM grid g CROSS JOIN tot t),
s AS (SELECT n, la, lb, CAST(sum(t_e6) AS BIGINT) AS chi_e6
      FROM q GROUP BY 1, 2, 3)
SELECT n, la AS levels_a, lb AS levels_b,
       round(CAST(chi_e6 AS DOUBLE) / 1e6, 6) AS chi_square,
       CASE WHEN n * (least(la, lb) - 1) > 0
            THEN round(sqrt((CAST(chi_e6 AS DOUBLE) / 1e6)
                            / (CAST(n AS DOUBLE)
                               * (CAST(least(la, lb) AS DOUBLE) - 1))), 6)
            END AS cramers_v
FROM s
""")
def chi_square_independence_query(spark, sf_dir):
    """Chi-square independence + Cramér's V between order priority and
    order status (profiling.chi_square_independence): contingency
    register bounded by |A| x |B|, observed-zero cells included via the
    marginal grid, 1e6-quantized cell terms, one closing sqrt."""
    from amundsendatabuilder_spark.operators.profiling import (
        chi_square_independence)
    (orders,) = _t(spark, sf_dir, "orders")
    return chi_square_independence(orders, "o_orderpriority",
                                   "o_orderstatus")


@query("ks_drift_stat", r"""
WITH base AS (SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS q,
                     CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ia
              FROM lineitem
              WHERE l_returnflag IN ('R', 'A')
                AND l_extendedprice IS NOT NULL),
reg AS (SELECT q, CAST(sum(ia) AS BIGINT) AS ca,
               CAST(sum(1 - ia) AS BIGINT) AS cb
        FROM base GROUP BY 1),
cum AS (SELECT q,
               CAST(sum(ca) OVER (ORDER BY q) AS BIGINT) AS cum_a,
               CAST(sum(cb) OVER (ORDER BY q) AS BIGINT) AS cum_b
        FROM reg),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb
        FROM reg),
d AS (SELECT t.na, t.nb, abs(c.cum_a * t.nb - c.cum_b * t.na) AS d, c.q
      FROM cum c CROSS JOIN tot t),
best AS (SELECT na, nb, max(d) AS mx FROM d GROUP BY 1, 2)
SELECT b.na AS n_a, b.nb AS n_b,
       CASE WHEN b.na > 0 AND b.nb > 0 THEN
            round(CAST(b.mx AS DOUBLE)
                  / (CAST(b.na AS DOUBLE) * CAST(b.nb AS DOUBLE)), 6)
            END AS ks_d,
       CASE WHEN b.na > 0 AND b.nb > 0 THEN
            round(CAST(min(d.q) AS DOUBLE) / 100, 6) END AS ks_at_value
FROM best b JOIN d ON d.na = b.na AND d.nb = b.nb AND d.d = b.mx
GROUP BY 1, 2, 3
""")
def ks_drift_stat_query(spark, sf_dir):
    """Two-sample KS statistic between returned ('R') and accepted
    ('A') lineitem price distributions (profiling.ks_drift_stat):
    100x-quantized value registers, exact integer
    |cum_a*n_b - cum_b*n_a| supremum, single closing division."""
    from amundsendatabuilder_spark.operators.profiling import ks_drift_stat
    (li,) = _t(spark, sf_dir, "lineitem")
    return ks_drift_stat(li, "l_extendedprice", "l_returnflag",
                         "R", "A", scale=100)


@query("gini_inequality", r"""
WITH base AS (SELECT source AS grp,
                     CAST(round(CAST(n_chars AS DOUBLE) * 1, 0) AS BIGINT)
                     AS v
              FROM documents
              WHERE n_chars IS NOT NULL),
pos AS (SELECT grp, v FROM base WHERE v >= 0),
reg AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS m
        FROM pos GROUP BY 1, 2),
cum AS (SELECT grp, v, m,
               CAST(coalesce(sum(m) OVER (PARTITION BY grp ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS a
        FROM reg),
tot AS (SELECT grp, CAST(sum(m) AS BIGINT) AS n,
               CAST(sum(v * m) AS BIGINT) AS total
        FROM reg GROUP BY 1),
s AS (SELECT c.grp, t.n, t.total,
             CAST(sum(c.v * c.m * (2 * c.a + c.m - t.n)) AS BIGINT) AS num
      FROM cum c JOIN tot t ON t.grp = c.grp
      GROUP BY 1, 2, 3)
SELECT grp AS source, n, total,
       CASE WHEN total > 0
            THEN round(CAST(num AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6)
            END AS gini
FROM s
""")
def gini_inequality_query(spark, sf_dir):
    """Gini coefficient of document length per source
    (profiling.gini_inequality): value-multiplicity registers, closed
    tie-group form v*m*(2a+m-n) over the register cumulative window —
    exact integers until the single closing division."""
    from amundsendatabuilder_spark.operators.profiling import (
        gini_inequality)
    (docs,) = _t(spark, sf_dir, "documents")
    return gini_inequality(docs, "n_chars", group_col="source", scale=1)


@query("cluster_label_nmi", r"""
WITH base AS (SELECT CAST(label AS VARCHAR) AS a,
                     CAST((CASE WHEN embedding[1] >= 0 THEN 8 ELSE 0 END)
                        + (CASE WHEN embedding[2] >= 0 THEN 4 ELSE 0 END)
                        + (CASE WHEN embedding[3] >= 0 THEN 2 ELSE 0 END)
                        + (CASE WHEN embedding[4] >= 0 THEN 1 ELSE 0 END)
                     AS VARCHAR) AS b
              FROM embeddings
              WHERE label IS NOT NULL AND embedding IS NOT NULL),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM base GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(count(DISTINCT a) AS BIGINT) AS la,
               CAST(count(DISTINCT b) AS BIGINT) AS lb
        FROM cells),
mi AS (SELECT CAST(sum(CAST(round((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(c.c AS DOUBLE) * CAST(t.n AS DOUBLE)
                 / (CAST(ra.ca AS DOUBLE) * CAST(rb.cb AS DOUBLE)))
            * 1e9, 0) AS BIGINT)) AS BIGINT) AS mi_e9
       FROM cells c JOIN ra ON ra.a = c.a JOIN rb ON rb.b = c.b
       CROSS JOIN tot t),
ha AS (SELECT CAST(sum(CAST(round(-(CAST(ca AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(ca AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e9, 0)
            AS BIGINT)) AS BIGINT) AS ha_e9
       FROM ra CROSS JOIN tot t),
hb AS (SELECT CAST(sum(CAST(round(-(CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e9, 0)
            AS BIGINT)) AS BIGINT) AS hb_e9
       FROM rb CROSS JOIN tot t)
SELECT t.n, t.la AS levels_a, t.lb AS levels_b,
       round(CAST(ha_e9 AS DOUBLE) / 1e9, 6) AS entropy_a,
       round(CAST(hb_e9 AS DOUBLE) / 1e9, 6) AS entropy_b,
       round(CAST(mi_e9 AS DOUBLE) / 1e9, 6) AS mi,
       CASE WHEN ha_e9 > 0 AND hb_e9 > 0
            THEN round((CAST(mi_e9 AS DOUBLE) / 1e9)
                       / sqrt((CAST(ha_e9 AS DOUBLE) / 1e9)
                              * (CAST(hb_e9 AS DOUBLE) / 1e9)), 6)
            END AS nmi
FROM tot t CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
""")
def cluster_label_nmi_query(spark, sf_dir):
    """External clustering evaluation (profiling.mutual_information):
    NMI between embedding labels and the 4-bit sign-hash bucket of the
    first four dimensions — exact sign comparisons (no float rounding
    in the bucket path), contingency-register MI with 1e9-quantized
    cell terms. The metric a pipeline runs on (label, cluster_id)
    after kmeans_fit."""
    from amundsendatabuilder_spark.operators.profiling import (
        mutual_information)
    (emb,) = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    # F.get, not e[i]: ANSI aborts on out-of-bounds index, so a corrupt
    # zero-length vector would kill the whole evaluation (r14
    # degenerate-corpus sweep). get() yields NULL past the end ->
    # when(NULL >= 0) -> otherwise(0): short vectors land in bucket 0,
    # exactly DuckDB's NULL-on-out-of-bounds subscript semantics — the
    # bucket is a hash, so the convention only needs to be shared
    bucket = sum(F.when(F.get(e, F.lit(i)) >= 0, 1 << (3 - i)).otherwise(0)
                 for i in range(4))
    df = (emb.where(F.col("label").isNotNull() & e.isNotNull())
          .select(F.col("label"), bucket.alias("bucket")))
    return mutual_information(df, "label", "bucket")


@query("readability_report", (r"""
WITH per AS (SELECT source AS grp,
                    CAST(len(REPLACE_LTOKS) AS BIGINT) AS w,
                    greatest(CAST(len(regexp_extract_all(text, '[.!?]+'))
                             AS BIGINT), 1) AS s,
                    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS y
             FROM documents),
q AS (SELECT grp,
             CAST(round(CAST(w AS DOUBLE) / CAST(s AS DOUBLE) * 1e4, 0)
                  AS BIGINT) AS q_wps,
             CAST(round(CAST(y AS DOUBLE) / CAST(w AS DOUBLE) * 1e4, 0)
                  AS BIGINT) AS q_ypw,
             CAST(round((206.835
                         - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
                         - 84.6 * (CAST(y AS DOUBLE) / CAST(w AS DOUBLE)))
                        * 1e4, 0) AS BIGINT) AS q_fl
      FROM per WHERE w > 0),
agg AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(q_wps) AS BIGINT) AS s_wps,
               CAST(sum(q_ypw) AS BIGINT) AS s_ypw,
               CAST(sum(q_fl) AS BIGINT) AS s_fl
        FROM q GROUP BY 1)
SELECT grp AS source, n_docs,
       round(CAST(s_wps AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1e4), 4)
       AS words_per_sentence,
       round(CAST(s_ypw AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1e4), 4)
       AS syllables_per_word,
       round(CAST(s_fl AS DOUBLE) / (CAST(n_docs AS DOUBLE) * 1e4), 4)
       AS flesch_reading_ease
FROM agg
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def readability_report_query(spark, sf_dir):
    """Flesch reading-ease per source (textops.readability_report):
    vowel-run syllable proxy + [.!?]+ sentence runs, per-doc scores
    quantized to 1e4 BIGINT before the order-free group mean."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.readability_report(docs)


@query("ngram_entropy_rate", (r"""
WITH t AS (SELECT source AS grp, REPLACE_LTOKS AS toks FROM documents),
tk AS (SELECT grp, rowid AS rid, i, toks[i] AS tok
       FROM (SELECT grp, toks, row_number() OVER () AS rowid,
                    unnest(range(1, len(toks) + 1)) AS i
             FROM t)),
uni AS (SELECT grp, tok AS g, CAST(count(*) AS BIGINT) AS c
        FROM tk GROUP BY 1, 2),
bi AS (SELECT a.grp, a.tok || ' ' || b.tok AS g,
              CAST(count(*) AS BIGINT) AS c
       FROM tk a JOIN tk b ON a.rid = b.rid AND b.i = a.i + 1
       GROUP BY 1, 2),
hu AS (SELECT u.grp, max(t.nt) AS n_unigrams,
              CAST(sum(CAST(round(-(CAST(u.c AS DOUBLE)
                   / CAST(t.nt AS DOUBLE))
                   * ln(CAST(u.c AS DOUBLE) / CAST(t.nt AS DOUBLE))
                   * 1e9, 0) AS BIGINT)) AS BIGINT) AS hu_e9
       FROM uni u JOIN (SELECT grp, CAST(sum(c) AS BIGINT) AS nt
                        FROM uni GROUP BY 1) t ON t.grp = u.grp
       GROUP BY 1),
hb AS (SELECT b.grp, max(t.nt) AS n_bigrams,
              CAST(sum(CAST(round(-(CAST(b.c AS DOUBLE)
                   / CAST(t.nt AS DOUBLE))
                   * ln(CAST(b.c AS DOUBLE) / CAST(t.nt AS DOUBLE))
                   * 1e9, 0) AS BIGINT)) AS BIGINT) AS hb_e9
       FROM bi b JOIN (SELECT grp, CAST(sum(c) AS BIGINT) AS nt
                       FROM bi GROUP BY 1) t ON t.grp = b.grp
       GROUP BY 1)
SELECT hu.grp AS source, hu.n_unigrams,
       coalesce(hb.n_bigrams, 0) AS n_bigrams,
       round(CAST(hu.hu_e9 AS DOUBLE) / 1e9, 6) AS unigram_entropy,
       round(CAST(hb.hb_e9 AS DOUBLE) / 1e9, 6) AS bigram_entropy,
       round(CAST(hb.hb_e9 - hu.hu_e9 AS DOUBLE) / 1e9, 6)
       AS entropy_rate
FROM hu LEFT JOIN hb ON hb.grp = hu.grp
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def ngram_entropy_rate_query(spark, sf_dir):
    """Unigram/bigram entropy + conditional entropy rate per source
    (textops.ngram_entropy_rate): -p ln p terms 1e9-quantized over the
    n-gram count registers, within-doc adjacent bigrams only, closing
    subtraction on the quantized integers."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.ngram_entropy_rate(docs)


@query("importance_ess", r"""
WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS w
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars >= 0),
s AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS sum_w,
             CAST(sum(w * w) AS BIGINT) AS sum_w2
      FROM base GROUP BY 1)
SELECT grp AS source, n, sum_w,
       CASE WHEN sum_w2 > 0
            THEN round(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                       / CAST(sum_w2 AS DOUBLE), 4) END AS ess,
       CASE WHEN sum_w2 > 0
            THEN round(CAST(sum_w AS DOUBLE) * CAST(sum_w AS DOUBLE)
                       / CAST(sum_w2 AS DOUBLE) / CAST(n AS DOUBLE), 4)
            END AS ess_ratio
FROM s
""")
def importance_ess_query(spark, sf_dir):
    """Kish effective sample size of length-proportional importance
    weights per source (curation.effective_sample_size): exact integer
    sum-w / sum-w2, one closing double squaring — the resampling
    variance diagnostic run before dsir/temperature reweighting."""
    from amundsendatabuilder_spark.operators.curation import (
        effective_sample_size)
    (docs,) = _t(spark, sf_dir, "documents")
    return effective_sample_size(docs, "n_chars", group_col="source")


@query("spearman_correlation", r"""
WITH base AS (SELECT CAST(round(l_quantity * 100, 0) AS BIGINT) AS vx,
                     CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS vy
              FROM lineitem
              WHERE l_quantity IS NOT NULL
                AND l_extendedprice IS NOT NULL),
rx AS (SELECT vx, 2 * coalesce(sum(m) OVER (ORDER BY vx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + m + 1 AS r_vx
       FROM (SELECT vx, CAST(count(*) AS BIGINT) AS m
             FROM base GROUP BY 1)),
ry AS (SELECT vy, 2 * coalesce(sum(m) OVER (ORDER BY vy
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + m + 1 AS r_vy
       FROM (SELECT vy, CAST(count(*) AS BIGINT) AS m
             FROM base GROUP BY 1)),
ranked AS (SELECT rx.r_vx, ry.r_vy
           FROM base b JOIN rx ON rx.vx = b.vx JOIN ry ON ry.vy = b.vy),
s AS (SELECT count(*) AS n, sum(r_vx) AS sx, sum(r_vy) AS sy,
             sum(r_vx * r_vy) AS sxy, sum(r_vx * r_vx) AS sxx,
             sum(r_vy * r_vy) AS syy
      FROM ranked)
SELECT CAST(n AS BIGINT) AS n,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            END AS rho
FROM s
""")
def spearman_correlation_query(spark, sf_dir):
    """Spearman rho between lineitem quantity and extended price
    (profiling.spearman_correlation): doubled average ranks 2a+m+1 from
    value registers (exact integers, no .5 ranks), DECIMAL(38,0)
    sufficient statistics with decimal centered subtraction —
    HUGEINT-exact on the DuckDB side — one closing sqrt/divide."""
    from amundsendatabuilder_spark.operators.profiling import (
        spearman_correlation)
    (li,) = _t(spark, sf_dir, "lineitem")
    return spearman_correlation(li, "l_quantity", "l_extendedprice",
                                scale=100)


@query("theil_decomposition", r"""
WITH base AS (SELECT source AS grp, CAST(n_chars AS BIGINT) AS v
              FROM documents
              WHERE n_chars IS NOT NULL AND n_chars > 0),
reg AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS m
        FROM base GROUP BY 1, 2),
gtot AS (SELECT grp, CAST(sum(m) AS BIGINT) AS ng,
                CAST(sum(v * m) AS BIGINT) AS xg
         FROM reg GROUP BY 1),
tot AS (SELECT CAST(sum(ng) AS BIGINT) AS n,
               CAST(sum(xg) AS BIGINT) AS t,
               CAST(count(*) AS BIGINT) AS n_groups
        FROM gtot),
tt AS (SELECT CAST(sum(CAST(round(CAST(r.m AS DOUBLE)
            * (CAST(r.v AS DOUBLE) / CAST(t.t AS DOUBLE))
            * ln(CAST(r.v AS DOUBLE) * CAST(t.n AS DOUBLE)
                 / CAST(t.t AS DOUBLE)) * 1e9, 0) AS BIGINT)) AS BIGINT)
            AS tt_e9
       FROM reg r CROSS JOIN tot t),
tg AS (SELECT r.grp,
              CAST(sum(CAST(round(CAST(r.m AS DOUBLE)
                   * (CAST(r.v AS DOUBLE) / CAST(g.xg AS DOUBLE))
                   * ln(CAST(r.v AS DOUBLE) * CAST(g.ng AS DOUBLE)
                        / CAST(g.xg AS DOUBLE)) * 1e9, 0) AS BIGINT))
                   AS BIGINT) AS tg_e9
       FROM reg r JOIN gtot g ON g.grp = r.grp GROUP BY 1),
tw AS (SELECT CAST(sum(CAST(round((CAST(g.xg AS DOUBLE)
            / CAST(t.t AS DOUBLE)) * CAST(tg.tg_e9 AS DOUBLE), 0)
            AS BIGINT)) AS BIGINT) AS tw_e9
       FROM tg JOIN gtot g ON g.grp = tg.grp CROSS JOIN tot t),
tb AS (SELECT CAST(sum(CAST(round((CAST(g.xg AS DOUBLE)
            / CAST(t.t AS DOUBLE))
            * ln((CAST(g.xg AS DOUBLE) / CAST(t.t AS DOUBLE))
                 / (CAST(g.ng AS DOUBLE) / CAST(t.n AS DOUBLE)))
            * 1e9, 0) AS BIGINT)) AS BIGINT) AS tb_e9
       FROM gtot g CROSS JOIN tot t)
SELECT t.n, t.n_groups,
       round(CAST(tt.tt_e9 AS DOUBLE) / 1e9, 6) AS theil_total,
       round(CAST(tb.tb_e9 AS DOUBLE) / 1e9, 6) AS theil_between,
       round(CAST(tw.tw_e9 AS DOUBLE) / 1e9, 6) AS theil_within
FROM tot t CROSS JOIN tt CROSS JOIN tb CROSS JOIN tw
""")
def theil_decomposition_query(spark, sf_dir):
    """Theil-T inequality of document length with exact between/within
    source decomposition (profiling.theil_decomposition): per-value
    registers, multiplicity folded before the 1e9 quantization, group
    stage on the |sources|-row register."""
    from amundsendatabuilder_spark.operators.profiling import (
        theil_decomposition)
    (docs,) = _t(spark, sf_dir, "documents")
    return theil_decomposition(docs, "n_chars", "source")


def _hyperball_oracle(iters: int = 3, p: int = 4) -> str:
    """Replay oracle for hyperball_neighborhood over the synthesized
    lineage DAG: identical md5 register layout (sketches._rho_expr),
    unrolled MATERIALIZED max-merge rounds, and hll_estimate's inlined
    constants so the float estimates match bit-for-bit."""
    from amundsendatabuilder_spark.operators.sketches import _rho_expr
    m = 1 << p
    nbhex = p // 4
    rest = 16 - nbhex
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(1 << 50)
    head = f"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS MATERIALIZED (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 3),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hx AS (SELECT node, md5(CAST(node AS VARCHAR)) AS h FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, substring(h, 1, {nbhex}) AS bucket,
         CAST({_rho_expr(f"trim(LEADING '0' FROM substring(h, {nbhex + 1}, {rest}))", rest)}
              AS INT) AS r
  FROM hx)"""
    rounds = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        rounds.append(f"""
r{i} AS MATERIALIZED (
  SELECT node, bucket, max(r) AS r FROM (
    SELECT node, bucket, r FROM {prev}
    UNION ALL
    SELECT e.src AS node, g.bucket, g.r
    FROM edges e JOIN {prev} g ON g.node = e.dst)
  GROUP BY 1, 2)""")
    ests = []
    for i in range(iters + 1):
        ests.append(f"""
est{i} AS (
  SELECT CAST({i} AS INT) AS radius,
         CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(e6) AS BIGINT) AS s_e6
  FROM (
    SELECT node,
           CAST(round((CASE WHEN ({num!r} / CAST(s_present
                           + ({m} - n_present)
                           * (CAST(1 AS BIGINT) << 50) AS DOUBLE))
                           <= {2.5 * m!r}
                        AND ({m} - n_present) > 0
                       THEN {float(m)!r}
                            * ln({float(m)!r}
                                 / CAST({m} - n_present AS DOUBLE))
                       ELSE {num!r} / CAST(s_present + ({m} - n_present)
                            * (CAST(1 AS BIGINT) << 50) AS DOUBLE)
                       END) * 1e6, 0) AS BIGINT) AS e6
    FROM (SELECT node,
                 sum(CASE WHEN r <= 50
                          THEN CAST(1 AS BIGINT) << (50 - r)
                          ELSE CAST(0 AS BIGINT) END) AS s_present,
                 count(*) AS n_present
          FROM r{i} GROUP BY node)))""")
    tail = "\nUNION ALL\n".join(
        f"""SELECT radius, n_nodes,
       round(CAST(s_e6 AS DOUBLE) / 1e6, 6) AS total_reach,
       round(CAST(s_e6 AS DOUBLE) / CAST(n_nodes AS DOUBLE) / 1e6, 6)
       AS avg_reach
FROM est{i}""" for i in range(iters + 1))
    return (head + "," + ",".join(rounds) + ","
            + ",".join(ests) + "\n" + tail)


@query("hyperball_reach", _hyperball_oracle())
def hyperball_reach_query(spark, sf_dir):
    """HyperBall neighborhood function over the synthesized lineage DAG
    (graph_algo.hyperball_neighborhood): per-node HLL registers
    max-merged along edges for 3 rounds — nodes x 2^p bytes of state
    per radius instead of exact visited sets, the mergeable-register
    graph-analytics shape (Boldi & Vigna 2013)."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        hyperball_neighborhood)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = (orders.select(F.col("o_orderkey").alias("k"))
               .distinct().cache())
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"),
                        F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return hyperball_neighborhood(edges, iters=3, p=4)


@query("degree_assortativity", r"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 3),
outd AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS outd
         FROM edges GROUP BY 1),
ind AS (SELECT dst AS node, CAST(count(*) AS BIGINT) AS ind
        FROM edges GROUP BY 1),
e AS (SELECT o.outd, i.ind
      FROM edges ed JOIN outd o ON o.node = ed.src
      JOIN ind i ON i.node = ed.dst),
s AS (SELECT count(*) AS n, sum(outd) AS sx, sum(ind) AS sy,
             sum(outd * ind) AS sxy, sum(outd * outd) AS sxx,
             sum(ind * ind) AS syy
      FROM e)
SELECT CAST(n AS BIGINT) AS n_edges,
       CASE WHEN CAST(n * sxx - sx * sx AS DOUBLE) > 0
             AND CAST(n * syy - sy * sy AS DOUBLE) > 0
            THEN round(CAST(n * sxy - sx * sy AS DOUBLE)
                       / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              * CAST(n * syy - sy * sy AS DOUBLE)), 6)
            END AS assortativity
FROM s
""")
def degree_assortativity_query(spark, sf_dir):
    """Directed degree assortativity of the synthesized lineage DAG
    (graph_algo.degree_assortativity): out-degree/in-degree Pearson
    over edges with DECIMAL(38,0) sufficient statistics (HUGEINT-exact
    in the twin), decimal centered subtraction, one closing sqrt."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        degree_assortativity)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = (orders.select(F.col("o_orderkey").alias("k"))
               .distinct().cache())
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"),
                        F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return degree_assortativity(edges)


def _hyperball_harmonic_oracle(iters: int = 3, p: int = 4,
                               k: int = 10) -> str:
    """Replay oracle for hyperball_harmonic: the _hyperball_oracle
    register rounds, per-node 1e6-quantized estimates per radius, and
    the telescoped EXACT integer radius weights (6H = 3N1 + N2 + 2N3
    - 6N0 for iters=3), top-k by (rounded centrality DESC, node)."""
    import math
    from amundsendatabuilder_spark.operators.sketches import _rho_expr
    m = 1 << p
    nbhex = p // 4
    rest = 16 - nbhex
    alpha = 0.7213 / (1 + 1.079 / m)
    num = alpha * m * m * float(1 << 50)
    lcm = math.lcm(*range(1, iters + 1))
    coef = {0: -lcm}
    for r in range(1, iters):
        coef[r] = lcm // r - lcm // (r + 1)
    coef[iters] = lcm // iters
    head = f"""
WITH keys AS (SELECT DISTINCT o_orderkey AS k FROM orders),
edges AS MATERIALIZED (
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 2 + 1
  UNION ALL
  SELECT a.k AS src, b.k AS dst FROM keys a JOIN keys b ON b.k = a.k * 3),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
hx AS (SELECT node, md5(CAST(node AS VARCHAR)) AS h FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, substring(h, 1, {nbhex}) AS bucket,
         CAST({_rho_expr(f"trim(LEADING '0' FROM substring(h, {nbhex + 1}, {rest}))", rest)}
              AS INT) AS r
  FROM hx)"""
    rounds = []
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        rounds.append(f"""
r{i} AS MATERIALIZED (
  SELECT node, bucket, max(r) AS r FROM (
    SELECT node, bucket, r FROM {prev}
    UNION ALL
    SELECT e.src AS node, g.bucket, g.r
    FROM edges e JOIN {prev} g ON g.node = e.dst)
  GROUP BY 1, 2)""")
    ests = []
    for i in range(iters + 1):
        ests.append(f"""
est{i} AS (
  SELECT node, CAST({i} AS INT) AS radius,
         CAST(round((CASE WHEN ({num!r} / CAST(s_present
                         + ({m} - n_present)
                         * (CAST(1 AS BIGINT) << 50) AS DOUBLE))
                         <= {2.5 * m!r}
                      AND ({m} - n_present) > 0
                     THEN {float(m)!r}
                          * ln({float(m)!r}
                               / CAST({m} - n_present AS DOUBLE))
                     ELSE {num!r} / CAST(s_present + ({m} - n_present)
                          * (CAST(1 AS BIGINT) << 50) AS DOUBLE)
                     END) * 1e6, 0) AS BIGINT) AS e6
  FROM (SELECT node,
               sum(CASE WHEN r <= 50
                        THEN CAST(1 AS BIGINT) << (50 - r)
                        ELSE CAST(0 AS BIGINT) END) AS s_present,
               count(*) AS n_present
        FROM r{i} GROUP BY node))""")
    wcase = " ".join(
        f"WHEN radius = {r} THEN {c}" for r, c in sorted(coef.items()))
    tail = f"""
allr AS ({" UNION ALL ".join(f"SELECT * FROM est{i}" for i in range(iters + 1))}),
scored AS (SELECT node,
                  CAST(sum(e6 * (CASE {wcase} END)) AS BIGINT) AS h6
           FROM allr GROUP BY 1)
SELECT node,
       round(CAST(h6 AS DOUBLE) / {float(lcm * 1e6)!r}, 6)
       AS harmonic_centrality
FROM scored
ORDER BY harmonic_centrality DESC, node
LIMIT {k}"""
    return (head + "," + ",".join(rounds) + ","
            + ",".join(ests) + "," + tail)


@query("hyperball_harmonic", _hyperball_harmonic_oracle())
def hyperball_harmonic_query(spark, sf_dir):
    """Top-10 harmonic centrality over the synthesized lineage DAG
    (graph_algo.hyperball_harmonic): HyperBall registers + telescoped
    exact-integer radius weights, TakeOrderedAndProject top-k."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        hyperball_harmonic)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = (orders.select(F.col("o_orderkey").alias("k"))
               .distinct().cache())
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"),
                        F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return hyperball_harmonic(edges, iters=3, p=4, k=10)


@query("dup_affinity_matrix", f"""
WITH {_minhash_bands_cte(16, 4)},
pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_sig = b.band_sig
           AND a.doc_id < b.doc_id),
m AS (SELECT doc_id, source FROM documents),
tagged AS (SELECT least(x.source, y.source) AS source_a,
                  greatest(x.source, y.source) AS source_b
           FROM pairs JOIN m x ON x.doc_id = pairs.doc_a
                      JOIN m y ON y.doc_id = pairs.doc_b)
SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
       source_a <> source_b AS cross_source
FROM tagged GROUP BY 1, 2
""")
def dup_affinity_matrix_query(spark, sf_dir):
    """Cross-source duplicate affinity (curation.dup_affinity_matrix):
    MinHash-LSH near-dup pairs tagged with both endpoints' sources and
    counted per unordered source pair — the mirror-site detector; pair
    set joins the id->source map, no corpus self-join."""
    from amundsendatabuilder_spark.operators.curation import (
        dup_affinity_matrix)
    from amundsendatabuilder_spark.operators.dedup import minhash_lsh_pairs
    (docs,) = _t(spark, sf_dir, "documents")
    return dup_affinity_matrix(minhash_lsh_pairs(docs), docs)


@query("variance_decomposition", r"""
WITH base AS (SELECT source AS grp,
                     CAST(round(CAST(n_chars AS DOUBLE) * 100, 0)
                          AS BIGINT) AS v
              FROM documents WHERE n_chars IS NOT NULL),
g AS (SELECT grp, count(*) AS ng, sum(v) AS sg, sum(v * v) AS ssg
      FROM base GROUP BY 1),
reg AS (SELECT grp, ng, sg, ssg,
               CAST(round((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                    / CAST(ng AS DOUBLE) / 10000.0 * 1e4, 0) AS BIGINT)
               AS t4
        FROM g),
tot AS (SELECT sum(ng) AS n, sum(sg) AS sx, sum(ssg) AS sxx,
               CAST(sum(t4) AS BIGINT) AS st4,
               CAST(count(*) AS BIGINT) AS k
        FROM reg)
SELECT CAST(n AS BIGINT) AS n, k AS n_groups,
       round(CAST(st4 AS DOUBLE) / 1e4
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
               / CAST(n AS DOUBLE) / 10000.0, 4) AS ss_between,
       round((CAST(sxx AS DOUBLE) / 10000.0
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                / CAST(n AS DOUBLE) / 10000.0)
             - (CAST(st4 AS DOUBLE) / 1e4
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE) / 10000.0), 4) AS ss_within,
       CASE WHEN k > 1 AND CAST(n AS BIGINT) > k
             AND ((CAST(sxx AS DOUBLE) / 10000.0
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE) / 10000.0)
                  - (CAST(st4 AS DOUBLE) / 1e4
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       / CAST(n AS DOUBLE) / 10000.0)) > 0
            THEN round(((CAST(st4 AS DOUBLE) / 1e4
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE) / 10000.0)
                        / (CAST(k AS DOUBLE) - 1))
                       / (((CAST(sxx AS DOUBLE) / 10000.0
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                              / CAST(n AS DOUBLE) / 10000.0)
                           - (CAST(st4 AS DOUBLE) / 1e4
                              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                / CAST(n AS DOUBLE) / 10000.0))
                          / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
            END AS f_stat,
       CASE WHEN (CAST(sxx AS DOUBLE) / 10000.0
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                    / CAST(n AS DOUBLE) / 10000.0) > 0
            THEN round((CAST(st4 AS DOUBLE) / 1e4
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                          / CAST(n AS DOUBLE) / 10000.0)
                       / (CAST(sxx AS DOUBLE) / 10000.0
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                            / CAST(n AS DOUBLE) / 10000.0), 6)
            END AS eta_squared
FROM tot
""")
def variance_decomposition_query(spark, sf_dir):
    """One-way ANOVA of document length over sources
    (profiling.variance_decomposition): exact DECIMAL/HUGEINT moment
    sums, per-group mean terms 1e4-quantized before the register sum,
    F and eta-squared from one fixed double expression tree."""
    from amundsendatabuilder_spark.operators.profiling import (
        variance_decomposition)
    (docs,) = _t(spark, sf_dir, "documents")
    return variance_decomposition(docs, "n_chars", "source", scale=100)


@query("missingness_matrix", r"""
WITH d AS (SELECT md5(CAST(event_id AS VARCHAR)) AS h, value
           FROM events),
base AS (SELECT CASE WHEN substr(h, 1, 1) < '4' THEN NULL
                     ELSE value END AS a,
                CASE WHEN substr(h, 1, 1) < '2' THEN NULL
                     ELSE value END AS b,
                CASE WHEN substr(h, 2, 1) < '4' THEN NULL
                     ELSE value END AS c
         FROM d),
w AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS na_a,
             CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS na_b,
             CAST(sum(CASE WHEN c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS na_c,
             CAST(sum(CASE WHEN a IS NULL AND b IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nb_ab,
             CAST(sum(CASE WHEN a IS NULL AND c IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nb_ac,
             CAST(sum(CASE WHEN b IS NULL AND c IS NULL
                      THEN 1 ELSE 0 END) AS BIGINT) AS nb_bc
      FROM base)
SELECT 'a' AS col_a, 'b' AS col_b, n, na_a AS null_a, na_b AS null_b,
       nb_ab AS null_both,
       CASE WHEN na_a > 0 AND na_b > 0
            THEN (nb_ab * n * CAST(1000000 AS BIGINT)) // (na_a * na_b)
            END AS lift_ppm,
       CASE WHEN na_a > 0 AND na_b > 0 AND na_a < n AND na_b < n
            THEN round(CAST(n * nb_ab - na_a * na_b AS DOUBLE)
                       / sqrt(CAST(na_a AS DOUBLE) * CAST(na_b AS DOUBLE)
                              * CAST(n - na_a AS DOUBLE)
                              * CAST(n - na_b AS DOUBLE)), 6) END AS phi
FROM w
UNION ALL
SELECT 'a', 'c', n, na_a, na_c, nb_ac,
       CASE WHEN na_a > 0 AND na_c > 0
            THEN (nb_ac * n * CAST(1000000 AS BIGINT)) // (na_a * na_c)
            END,
       CASE WHEN na_a > 0 AND na_c > 0 AND na_a < n AND na_c < n
            THEN round(CAST(n * nb_ac - na_a * na_c AS DOUBLE)
                       / sqrt(CAST(na_a AS DOUBLE) * CAST(na_c AS DOUBLE)
                              * CAST(n - na_a AS DOUBLE)
                              * CAST(n - na_c AS DOUBLE)), 6) END
FROM w
UNION ALL
SELECT 'b', 'c', n, na_b, na_c, nb_bc,
       CASE WHEN na_b > 0 AND na_c > 0
            THEN (nb_bc * n * CAST(1000000 AS BIGINT)) // (na_b * na_c)
            END,
       CASE WHEN na_b > 0 AND na_c > 0 AND na_b < n AND na_c < n
            THEN round(CAST(n * nb_bc - na_b * na_c AS DOUBLE)
                       / sqrt(CAST(na_b AS DOUBLE) * CAST(na_c AS DOUBLE)
                              * CAST(n - na_b AS DOUBLE)
                              * CAST(n - na_c AS DOUBLE)), 6) END
FROM w
""")
def missingness_matrix_query(spark, sf_dir):
    """NULL-co-occurrence phi/lift matrix (profiling.missingness_matrix)
    over three deterministically-punched views of events.value (b's
    nulls nest inside a's -> strong positive phi; c is independent) —
    one wide conditional aggregation, no explode, exact integer lift."""
    from amundsendatabuilder_spark.operators.profiling import (
        missingness_matrix)
    (ev,) = _t(spark, sf_dir, "events")
    h = F.md5(F.col("event_id").cast("string"))
    d = ev.select(
        F.when(F.substring(h, 1, 1) < "4", F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("a"),
        F.when(F.substring(h, 1, 1) < "2", F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("b"),
        F.when(F.substring(h, 2, 1) < "4", F.lit(None).cast("double"))
        .otherwise(F.col("value")).alias("c"))
    return missingness_matrix(d, ["a", "b", "c"])


@query("hapax_report", (r"""
WITH tok AS (SELECT source AS grp, unnest(REPLACE_LTOKS) AS tok
             FROM documents),
st AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS c
       FROM tok GROUP BY 1, 2),
reg AS (SELECT grp, c, CAST(count(*) AS BIGINT) AS m
        FROM st GROUP BY 1, 2),
s AS (SELECT grp, CAST(sum(m) AS BIGINT) AS vocab_size,
             CAST(sum(c * m) AS BIGINT) AS total_tokens,
             CAST(sum(CASE WHEN c = 1 THEN m ELSE 0 END) AS BIGINT)
             AS hapax_count
      FROM reg GROUP BY 1)
SELECT grp AS source, vocab_size, total_tokens, hapax_count,
       hapax_count * CAST(1000000 AS BIGINT) // vocab_size
       AS hapax_vocab_ppm,
       hapax_count * CAST(1000000 AS BIGINT) // total_tokens
       AS hapax_mass_ppm
FROM s
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def hapax_report_query(spark, sf_dir):
    """Hapax-legomena share per source (textops.hapax_report): vocab
    and mass shares of once-occurring tokens, entirely from the
    count-of-counts register — exact integer ppm via DIV."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.hapax_report(docs)


@query("similarity_histogram", f"""
SELECT CAST(floor(jaccard * 20) AS BIGINT) AS bucket,
       round(CAST(floor(jaccard * 20) AS DOUBLE) / 20, 4) AS jaccard_lo,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM ({_lsh_verified_sql(threshold=0.0)}) v
GROUP BY 1, 2
""")
def similarity_histogram_query(spark, sf_dir):
    """Exact-Jaccard histogram over the LSH candidate population
    (dedup.similarity_histogram): the dedup-threshold tuning chart —
    same banding as production dedup, verify join bounded by candidate
    count, engine-identical 6dp jaccard bucket edges."""
    from amundsendatabuilder_spark.operators.dedup import (
        similarity_histogram)
    (docs,) = _t(spark, sf_dir, "documents")
    return similarity_histogram(docs, buckets=20)


@query("rank_auc", "WITH " + _QUALITY_CTE + r""",
base AS (SELECT CAST(round(q.quality * 10000, 0) AS BIGINT) AS v,
                CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END AS ia
         FROM q JOIN documents d ON d.doc_id = q.doc_id
         WHERE d.source IN ('src0', 'src1')),
reg AS (SELECT v, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(ia) AS BIGINT) AS ma
        FROM base GROUP BY 1),
cum AS (SELECT v, m, ma,
               CAST(coalesce(sum(m) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS a
        FROM reg),
s AS (SELECT CAST(sum(ma) AS BIGINT) AS n_a,
             CAST(sum(m - ma) AS BIGINT) AS n_b,
             CAST(sum(ma * (2 * a + m + 1)) AS BIGINT) AS r2a
      FROM cum)
SELECT n_a, n_b, r2a - n_a * (n_a + 1) AS u_stat_x2,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
                       / (2.0 * CAST(n_a AS DOUBLE)
                          * CAST(n_b AS DOUBLE)), 6) END AS auc
FROM s
""")
def rank_auc_query(spark, sf_dir):
    """Mann-Whitney AUC of quality_score separating src0 from src1
    (profiling.rank_auc): pooled doubled-rank register, exact integer
    2U, one closing division — the threshold-free separation check
    before a quality cut filters a source."""
    from amundsendatabuilder_spark.functions.text import quality_score
    from amundsendatabuilder_spark.operators.profiling import rank_auc
    (docs,) = _t(spark, sf_dir, "documents")
    d = docs.select("source",
                    quality_score(F.col("text")).alias("quality"))
    return rank_auc(d, "quality", "source", "src0", "src1", scale=10000)


@query("classifier_kappa", f"""
WITH pred AS ({_lang_id_sql()}),
pairs AS (SELECT p.predicted_lang AS a, d.lang AS b
          FROM pred p JOIN documents d ON d.doc_id = p.doc_id
          WHERE p.predicted_lang IS NOT NULL AND d.lang IS NOT NULL),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM pairs GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
pe AS (SELECT CAST(coalesce(sum(ca * cb), 0) AS BIGINT) AS pe_n
       FROM ra JOIN rb ON rb.b = ra.a),
ag AS (SELECT CAST(coalesce(sum(c), 0) AS BIGINT) AS n_agree
       FROM cells WHERE a = b),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells)
SELECT t.n, ag.n_agree,
       round(CAST(ag.n_agree AS DOUBLE) / CAST(t.n AS DOUBLE), 6)
       AS observed_agreement,
       CASE WHEN t.n * t.n - pe.pe_n > 0
            THEN round(CAST(t.n * ag.n_agree - pe.pe_n AS DOUBLE)
                       / CAST(t.n * t.n - pe.pe_n AS DOUBLE), 6)
            END AS kappa
FROM tot t CROSS JOIN ag CROSS JOIN pe
""")
def classifier_kappa_query(spark, sf_dir):
    """Cohen's kappa between the stopword-heuristic language ID and
    the ground-truth lang column (profiling.cohens_kappa): exact
    integer (n*agree - sum ra*cb) / (n^2 - sum ra*cb) over contingency
    registers — the chance-corrected accuracy of the cheap classifier."""
    from amundsendatabuilder_spark.operators.profiling import cohens_kappa
    (docs,) = _t(spark, sf_dir, "documents")
    pred = textops.language_id(docs).select("doc_id", "predicted_lang")
    joined = (pred.join(docs.select("doc_id", "lang"), "doc_id")
              .select(F.col("predicted_lang").alias("a"),
                      F.col("lang").alias("b")))
    return cohens_kappa(joined, "a", "b")


@query("autocorrelation_report", r"""
WITH counts AS (SELECT CAST(date_diff('day', DATE '1970-01-01',
                       CAST(ts AS DATE)) AS BIGINT) AS d,
                       CAST(count(*) AS BIGINT) AS x
                FROM events WHERE ts IS NOT NULL GROUP BY 1),
bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM counts),
grid AS (SELECT g.d, coalesce(c.x, 0) AS x
         FROM (SELECT unnest(range(lo, hi + 1)) AS d FROM bounds) g
         LEFT JOIN counts c ON c.d = g.d),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS s,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM grid),
lags AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS lag),
mom AS (SELECT l.lag,
               CAST(sum(a.x * b.x) AS BIGINT) AS sxy,
               CAST(sum(a.x) AS BIGINT) AS h,
               CAST(sum(b.x) AS BIGINT) AS t
        FROM grid a CROSS JOIN lags l
        JOIN grid b ON b.d = a.d + l.lag
        GROUP BY 1)
SELECT CAST(m.lag AS INT) AS lag, t.n AS n_days,
       CASE WHEN t.n * (t.n * t.sxx - t.s * t.s) > 0
            THEN round(CAST(t.n * t.n * m.sxy
                            - t.n * t.s * (m.h + m.t)
                            + (t.n - m.lag) * t.s * t.s AS DOUBLE)
                       / CAST(t.n * (t.n * t.sxx - t.s * t.s)
                              AS DOUBLE), 6)
            END AS acf
FROM mom m CROSS JOIN tot t
""")
def autocorrelation_report_query(spark, sf_dir):
    """Daily-volume sample ACF at lags 1..7 (asof.autocorrelation_report):
    gap-densified day register, per-lag register self-join, exact
    integer moments to the single closing division — the seasonality
    TEST beside event_seasonality_heatmap's picture."""
    from amundsendatabuilder_spark.operators.asof import (
        autocorrelation_report)
    (ev,) = _t(spark, sf_dir, "events")
    return autocorrelation_report(ev, "ts", max_lag=7)


@query("search_ndcg", r"""
WITH base AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents),
len AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM len),
hits AS (SELECT doc_id, unnest(tk) AS term FROM base),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM hits WHERE term IN ('hash', 'join', 'merge', 'sort')
       GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
part AS (SELECT tf.doc_id, tf.term,
                round(ln(1 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)),
                      9) AS part
         FROM tf JOIN dfx USING (term)
         JOIN len l ON tf.doc_id = l.doc_id
         CROSS JOIN stats s),
summed AS (SELECT doc_id, round(list_sum(list(part ORDER BY term)), 6) AS score
           FROM part GROUP BY doc_id),
ranked AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                       AS INT) AS r
           FROM summed ORDER BY score DESC, doc_id LIMIT 10),
rel AS (SELECT doc_id,
               CAST(len(list_filter(['hash', 'join', 'merge', 'sort'],
                    t -> list_contains(tk, t))) AS BIGINT) AS rel
        FROM base),
dcg AS (SELECT CAST(sum(CAST(round((pow(2.0, CAST(coalesce(rl.rel, 0)
                 AS DOUBLE)) - 1.0)
                 / log2(CAST(rk.r AS DOUBLE) + 1) * 1e9, 0) AS BIGINT))
                 AS BIGINT) AS dcg_e9
        FROM ranked rk LEFT JOIN rel rl ON rl.doc_id = rk.doc_id),
ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)
                 AS r
          FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
idcg AS (SELECT CAST(sum(CAST(round((pow(2.0, CAST(rel AS DOUBLE))
                  - 1.0) / log2(CAST(r AS DOUBLE) + 1) * 1e9, 0)
                  AS BIGINT)) AS BIGINT) AS idcg_e9
         FROM ideal)
SELECT 10 AS k,
       round(CAST(dcg_e9 AS DOUBLE) / 1e9, 6) AS dcg,
       round(CAST(idcg_e9 AS DOUBLE) / 1e9, 6) AS idcg,
       CASE WHEN idcg_e9 > 0
            THEN round(CAST(dcg_e9 AS DOUBLE) / CAST(idcg_e9 AS DOUBLE),
                       6) END AS ndcg
FROM dcg CROSS JOIN idcg
""")
def search_ndcg_query(spark, sf_dir):
    """nDCG@10 of the BM25 ranking against distinct-query-term
    relevance grades (ranking.ndcg_at_k over ranking.bm25_topk) —
    closes the in-engine IR loop: rank (bm25), fuse (rrf), EVALUATE
    (ndcg); IDCG drawn from the whole corpus so missed docs cost."""
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.operators.ranking import (
        bm25_topk, ndcg_at_k)
    (docs,) = _t(spark, sf_dir, "documents")
    ranked = bm25_topk(docs, "hash join merge sort", k=10)
    terms = F.array(*[F.lit(t) for t in
                      ("hash", "join", "merge", "sort")])
    rel = docs.select(
        "doc_id",
        F.size(F.filter(terms, lambda t: F.array_contains(
            _toks(F.lower(F.col("text"))), t))).cast("long").alias("rel"))
    return ndcg_at_k(ranked, rel, k=10)


@query("stream_benford_registers", """
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
v AS (SELECT date_trunc('hour', ts) AS window_start,
             CAST(substr(CAST(CAST(round(abs(value) * 1e6, 0) AS BIGINT)
                  AS VARCHAR), 1, 1) AS INT) AS digit,
             CAST(round(abs(value) * 1e6, 0) AS BIGINT) AS m
      FROM events),
g AS (SELECT window_start, digit, CAST(count(*) AS BIGINT) AS cnt
      FROM v WHERE m > 0 GROUP BY 1, 2)
SELECT window_start, digit, cnt
FROM g, wm WHERE g.window_start + INTERVAL 1 HOUR <= wm.w
""")
def stream_benford_registers_query(spark, sf_dir):
    """Streaming Benford digit registers
    (streaming/events.windowed_benford_registers): <= 9 SUM-mergeable
    counters per tumbling hour, digit from the quantized integer's
    string form — benford_audit as a register stream. Hash-verified
    against the batch digit build restricted to the append-mode
    emission frontier."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_benford_registers)
    regs = windowed_benford_registers(_event_stream(spark, sf_dir))
    name = "sbr_" + next(tempfile._get_candidate_names())
    return run_to_memory(regs, spark, name, tempfile.mkdtemp())


@query("keyness_g2", (r"""
WITH tok AS (SELECT source AS grp, unnest(REPLACE_LTOKS) AS tok
             FROM documents),
st AS (SELECT grp, tok, CAST(count(*) AS BIGINT) AS a
       FROM tok GROUP BY 1, 2),
ng AS (SELECT grp, CAST(sum(a) AS BIGINT) AS n_g FROM st GROUP BY 1),
ct AS (SELECT tok, CAST(sum(a) AS BIGINT) AS c_tot FROM st GROUP BY 1),
nn AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM st),
scored AS (
  SELECT st.grp, st.tok,
         round(2.0 * (
           (CASE WHEN st.a > 0 THEN CAST(st.a AS DOUBLE)
                 * ln(CAST(st.a AS DOUBLE)
                      / (CAST(g.n_g AS DOUBLE) * CAST(t.c_tot AS DOUBLE)
                         / CAST(n.n AS DOUBLE))) ELSE 0 END)
         + (CASE WHEN t.c_tot - st.a > 0
                 THEN CAST(t.c_tot - st.a AS DOUBLE)
                 * ln(CAST(t.c_tot - st.a AS DOUBLE)
                      / ((CAST(n.n AS DOUBLE) - CAST(g.n_g AS DOUBLE))
                         * CAST(t.c_tot AS DOUBLE) / CAST(n.n AS DOUBLE)))
                 ELSE 0 END)
         + (CASE WHEN g.n_g - st.a > 0
                 THEN CAST(g.n_g - st.a AS DOUBLE)
                 * ln(CAST(g.n_g - st.a AS DOUBLE)
                      / (CAST(g.n_g AS DOUBLE)
                         * (CAST(n.n AS DOUBLE) - CAST(t.c_tot AS DOUBLE))
                         / CAST(n.n AS DOUBLE))) ELSE 0 END)
         + (CASE WHEN n.n - g.n_g - t.c_tot + st.a > 0
                 THEN CAST(n.n - g.n_g - t.c_tot + st.a AS DOUBLE)
                 * ln(CAST(n.n - g.n_g - t.c_tot + st.a AS DOUBLE)
                      / ((CAST(n.n AS DOUBLE) - CAST(g.n_g AS DOUBLE))
                         * (CAST(n.n AS DOUBLE) - CAST(t.c_tot AS DOUBLE))
                         / CAST(n.n AS DOUBLE))) ELSE 0 END)), 6) AS g2,
         CAST(st.a AS DOUBLE) > CAST(g.n_g AS DOUBLE)
             * CAST(t.c_tot AS DOUBLE) / CAST(n.n AS DOUBLE) AS overused
  FROM st JOIN ng g ON g.grp = st.grp
  JOIN ct t ON t.tok = st.tok CROSS JOIN nn n),
rk AS (SELECT grp, tok, g2, overused,
              row_number() OVER (PARTITION BY grp
                                 ORDER BY g2 DESC, tok) AS rank
       FROM scored)
SELECT grp AS source, CAST(rank AS INT) AS rank, tok AS token, g2,
       overused
FROM rk WHERE rank <= 5
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def keyness_g2_query(spark, sf_dir):
    """Dunning G² keyness top-5 per source (textops.keyness_g2): 2x2
    likelihood-ratio over exact integer cell counts, one fixed double
    expression per token, rounded-key + token tiebreak before the
    per-group top-k window."""
    (docs,) = _t(spark, sf_dir, "documents")
    return textops.keyness_g2(docs, k=5)


@query("token_source_mi", (r"""
WITH tok AS (SELECT source AS a, unnest(REPLACE_LTOKS) AS b
             FROM documents),
cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c
          FROM tok GROUP BY 1, 2),
ra AS (SELECT a, CAST(sum(c) AS BIGINT) AS ca FROM cells GROUP BY 1),
rb AS (SELECT b, CAST(sum(c) AS BIGINT) AS cb FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
               CAST(count(DISTINCT a) AS BIGINT) AS la,
               CAST(count(DISTINCT b) AS BIGINT) AS lb
        FROM cells),
mi AS (SELECT CAST(sum(CAST(round((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(c.c AS DOUBLE) * CAST(t.n AS DOUBLE)
                 / (CAST(ra.ca AS DOUBLE) * CAST(rb.cb AS DOUBLE)))
            * 1e9, 0) AS BIGINT)) AS BIGINT) AS mi_e9
       FROM cells c JOIN ra ON ra.a = c.a JOIN rb ON rb.b = c.b
       CROSS JOIN tot t),
ha AS (SELECT CAST(sum(CAST(round(-(CAST(ca AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(ca AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e9, 0)
            AS BIGINT)) AS BIGINT) AS ha_e9
       FROM ra CROSS JOIN tot t),
hb AS (SELECT CAST(sum(CAST(round(-(CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE))
            * ln(CAST(cb AS DOUBLE) / CAST(t.n AS DOUBLE)) * 1e9, 0)
            AS BIGINT)) AS BIGINT) AS hb_e9
       FROM rb CROSS JOIN tot t)
SELECT t.n, t.la AS levels_a, t.lb AS levels_b,
       round(CAST(ha_e9 AS DOUBLE) / 1e9, 6) AS entropy_a,
       round(CAST(hb_e9 AS DOUBLE) / 1e9, 6) AS entropy_b,
       round(CAST(mi_e9 AS DOUBLE) / 1e9, 6) AS mi,
       CASE WHEN ha_e9 > 0 AND hb_e9 > 0
            THEN round((CAST(mi_e9 AS DOUBLE) / 1e9)
                       / sqrt((CAST(ha_e9 AS DOUBLE) / 1e9)
                              * (CAST(hb_e9 AS DOUBLE) / 1e9)), 6)
            END AS nmi
FROM tot t CROSS JOIN mi CROSS JOIN ha CROSS JOIN hb
""").replace("REPLACE_LTOKS", _LTOKS_SQL))
def token_source_mi_query(spark, sf_dir):
    """Mutual information between token identity and source
    (profiling.mutual_information over the exploded token stream) —
    the distributional-fingerprinting number: MI near 0 means sources
    share one language model (mixture weighting is safe); high MI
    means tokens betray their source (dedup/leakage checks must be
    per-source). Same contingency-register engine as
    cluster_label_nmi, vocab-bounded registers."""
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.operators.profiling import (
        mutual_information)
    (docs,) = _t(spark, sf_dir, "documents")
    t = docs.select(F.col("source").alias("a"),
                    F.explode(_toks(F.lower(F.col("text")))).alias("b"))
    return mutual_information(t, "a", "b")


def _lsh_plan_oracle(num_hashes: int = 16, threshold: float = 0.7,
                     grid: int = 20) -> str:
    """Replay oracle for lsh_parameter_plan: identical baked grid and
    s50 literals, same 1e9 per-point quantization."""
    pairs = [(b, num_hashes // b)
             for b in range(1, num_hashes + 1) if num_hashes % b == 0]
    prow = ", ".join(
        f"({b}, {num_hashes // b}, {float((1.0 / b) ** (1.0 / (num_hashes // b)))!r})"
        for b, _ in pairs)
    grow = ", ".join(f"({float(j) / grid!r})" for j in range(1, grid))
    return f"""
WITH pairs(bands, rows_per_band, s50) AS (VALUES {prow}),
grid(s) AS (VALUES {grow}),
q AS (SELECT bands, rows_per_band,
             CAST(s50 AS DOUBLE) AS s50,
             CASE WHEN CAST(s AS DOUBLE) < {float(threshold)!r}
                  THEN CAST(round((1.0 - pow(1.0 - pow(CAST(s AS DOUBLE),
                       CAST(rows_per_band AS DOUBLE)),
                       CAST(bands AS DOUBLE))) * 1e9, 0) AS BIGINT)
                  END AS fp_e9,
             CASE WHEN NOT (CAST(s AS DOUBLE) < {float(threshold)!r})
                  THEN CAST(round((1.0 - (1.0 - pow(1.0
                       - pow(CAST(s AS DOUBLE),
                       CAST(rows_per_band AS DOUBLE)),
                       CAST(bands AS DOUBLE)))) * 1e9, 0) AS BIGINT)
                  END AS fn_e9
      FROM pairs CROSS JOIN grid),
agg AS (SELECT bands, rows_per_band, s50,
               CAST(sum(fp_e9) AS BIGINT) AS sfp,
               CAST(count(fp_e9) AS BIGINT) AS nfp,
               CAST(sum(fn_e9) AS BIGINT) AS sfn,
               CAST(count(fn_e9) AS BIGINT) AS nfn
        FROM q GROUP BY 1, 2, 3)
SELECT CAST(bands AS BIGINT) AS bands,
       CAST(rows_per_band AS BIGINT) AS rows_per_band,
       round(s50, 6) AS s50,
       CASE WHEN nfp > 0 THEN round(CAST(sfp AS DOUBLE)
                                    / CAST(nfp AS DOUBLE) / 1e9, 6)
            END AS fp_mass,
       CASE WHEN nfn > 0 THEN round(CAST(sfn AS DOUBLE)
                                    / CAST(nfn AS DOUBLE) / 1e9, 6)
            END AS fn_mass
FROM agg"""


@query("lsh_parameter_plan", _lsh_plan_oracle())
def lsh_parameter_plan_query(spark, sf_dir):
    """MinHash-LSH (bands, rows) planning table
    (dedup.lsh_parameter_plan): S-curve balance point and grid-averaged
    FP/FN mass vs the 0.7 production threshold — the analytic half of
    threshold tuning beside similarity_histogram's empirical half."""
    from amundsendatabuilder_spark.operators.dedup import (
        lsh_parameter_plan)
    return lsh_parameter_plan(spark, num_hashes=16, threshold=0.7)


@query("multimodal_phash_dedup", """
WITH m AS (SELECT i AS media_id, 200 + (i % 5) * 30 AS w
           FROM (SELECT unnest(range(0, 96)) AS i) WHERE i % 3 = 0),
tt AS (SELECT media_id, w, tx, ((tx * w) // 8 * 255) // (w - 1) AS tv
       FROM m CROSS JOIN (SELECT unnest(range(0, 8)) AS tx)),
ta AS (SELECT media_id, avg(tv) AS tavg FROM tt GROUP BY media_id),
ph AS (SELECT tt.media_id,
              repeat(lower(lpad(to_hex(CAST(sum(CASE WHEN tv >= tavg
                     THEN 1 << (7 - CAST(tx AS INT)) ELSE 0 END)
                     AS BIGINT)), 2, '0')), 8) AS phash
       FROM tt JOIN ta USING (media_id) GROUP BY tt.media_id)
SELECT phash, CAST(count(*) AS BIGINT) AS n_images,
       CAST(min(media_id) AS BIGINT) AS keeper_id,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM ph GROUP BY 1 HAVING count(*) >= 2
""")
def multimodal_phash_dedup_query(spark, sf_dir):
    """Perceptual-hash image dedup (multimodal.decode_image_features →
    exact phash grouping): the image-pipeline counterpart of
    dedup_exact — decode real BMP payloads (Arrow-batched mapInPandas),
    8x8 average-hash, keep the lowest id per hash group. The synthetic
    ramp corpus collides images of equal width by construction, giving
    the twin a closed form."""
    from amundsendatabuilder_spark.operators.multimodal import (
        decode_image_features, synthetic_media)
    feats = decode_image_features(synthetic_media(spark, n=96))
    return (feats.groupBy("phash")
            .agg(F.count(F.lit(1)).cast("long").alias("n_images"),
                 F.min("media_id").cast("long").alias("keeper_id"))
            .where(F.col("n_images") >= 2)
            .withColumn("n_dropped",
                        (F.col("n_images") - 1).cast("long")))


@query("ks_time_drift", r"""
WITH anchor AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                FROM events),
base AS (SELECT CAST(round(value * 100, 0) AS BIGINT) AS q,
                CASE WHEN epoch_us(ts) >= (mn + mx) // 2
                     THEN 0 ELSE 1 END AS ia
         FROM events CROSS JOIN anchor
         WHERE value IS NOT NULL),
reg AS (SELECT q, CAST(sum(ia) AS BIGINT) AS ca,
               CAST(sum(1 - ia) AS BIGINT) AS cb
        FROM base GROUP BY 1),
cum AS (SELECT q,
               CAST(sum(ca) OVER (ORDER BY q) AS BIGINT) AS cum_a,
               CAST(sum(cb) OVER (ORDER BY q) AS BIGINT) AS cum_b
        FROM reg),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na,
               CAST(sum(cb) AS BIGINT) AS nb
        FROM reg),
d AS (SELECT t.na, t.nb, abs(c.cum_a * t.nb - c.cum_b * t.na) AS d, c.q
      FROM cum c CROSS JOIN tot t),
best AS (SELECT na, nb, max(d) AS mx FROM d GROUP BY 1, 2)
SELECT b.na AS n_a, b.nb AS n_b,
       CASE WHEN b.na > 0 AND b.nb > 0 THEN
            round(CAST(b.mx AS DOUBLE)
                  / (CAST(b.na AS DOUBLE) * CAST(b.nb AS DOUBLE)), 6)
            END AS ks_d,
       CASE WHEN b.na > 0 AND b.nb > 0 THEN
            round(CAST(min(d.q) AS DOUBLE) / 100, 6) END AS ks_at_value
FROM best b JOIN d ON d.na = b.na AND d.nb = b.nb AND d.d = b.mx
GROUP BY 1, 2, 3
""")
def ks_time_drift_query(spark, sf_dir):
    """Numeric-shape drift between the first and second half of the
    event stream's time range (profiling.ks_drift_stat over a derived
    half indicator) — the numeric KS companion to distribution_drift's
    categorical halves: same exact-rational supremum, same 1-row
    broadcast time anchor."""
    from amundsendatabuilder_spark.operators.profiling import ks_drift_stat
    (ev,) = _t(spark, sf_dir, "events")
    ep = F.unix_micros(F.col("ts"))
    anchor = ev.agg(F.min(ep).alias("_mn"), F.max(ep).alias("_mx"))
    halved = (ev.crossJoin(F.broadcast(anchor))
              .select("value",
                      F.when(ep >= F.expr("(_mn + _mx) DIV 2"),
                             F.lit("second")).otherwise(F.lit("first"))
                      .alias("half")))
    # group_a = the EARLIER half (oracle ia=1 <=> epoch below midpoint)
    return ks_drift_stat(halved, "value", "half", "first", "second",
                         scale=100)


@query("multimodal_audio_dedup", """
WITH pk AS (SELECT i AS media_id, CAST(c AS INT) AS chunk_idx,
                   CAST(200 + (i % 16) * 100 AS INT) AS peak_bin
            FROM (SELECT unnest(range(0, 32)) AS i) t,
                 (SELECT unnest(range(0, 2)) AS c) u),
fp AS (SELECT media_id,
              array_to_string(list(CAST(peak_bin AS VARCHAR)
                                   ORDER BY chunk_idx), ':') AS fingerprint
       FROM pk GROUP BY 1)
SELECT fingerprint, CAST(count(*) AS BIGINT) AS n_assets,
       CAST(min(media_id) AS BIGINT) AS keeper_id,
       CAST(count(*) - 1 AS BIGINT) AS n_dropped
FROM fp GROUP BY 1 HAVING count(*) >= 2
""")
def multimodal_audio_dedup_query(spark, sf_dir):
    """Audio fingerprint dedup (multimodal.audio_spectral_peak →
    chunk-ordered peak-bin fingerprint → exact grouping): the audio
    counterpart of multimodal_phash_dedup — Shazam-style constellation
    reduced to its per-chunk dominant bin (the real FFT runs in the
    decode stage; the pure-tone fixtures collide assets sharing a
    frequency, giving the twin a closed form)."""
    from amundsendatabuilder_spark.operators.multimodal import (
        audio_spectral_peak, synthetic_tones)
    pk = audio_spectral_peak(synthetic_tones(spark, n=32), chunk_ms=1000)
    fp = (pk.groupBy("media_id")
          .agg(F.concat_ws(":", F.transform(
              F.array_sort(F.collect_list(
                  F.struct("chunk_idx", "peak_bin"))),
              lambda s: s["peak_bin"].cast("string")))
               .alias("fingerprint")))
    return (fp.groupBy("fingerprint")
            .agg(F.count(F.lit(1)).cast("long").alias("n_assets"),
                 F.min("media_id").cast("long").alias("keeper_id"))
            .where(F.col("n_assets") >= 2)
            .withColumn("n_dropped",
                        (F.col("n_assets") - 1).cast("long")))


def _pca_power_oracle(iters: int = 8) -> str:
    """Replay oracle for pca_power_iteration: embedding_covariance's
    HUGEINT-exact 9dp covariance, symmetrized, then ``iters`` unrolled
    MATERIALIZED rounds of (integer mat-vec, decimal square-sum norm,
    1e9 re-quantization), closing with the Rayleigh quotient."""
    head = r"""
WITH vsrc AS (SELECT list_transform(embedding::DOUBLE[],
                                    x -> CAST(floor(x * 1000000) AS BIGINT))
                  AS q
              FROM embeddings),
wsrc AS (SELECT row_number() OVER () AS rid, q FROM vsrc),
u AS (SELECT rid, CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
             unnest(q) AS qi
      FROM wsrc),
nn AS (SELECT count(*)::HUGEINT AS n FROM vsrc),
s AS (SELECT i, CAST(sum(qi) AS HUGEINT) AS s FROM u GROUP BY i),
pp AS (SELECT a.i AS i, b.i AS j,
              CAST(sum(a.qi::HUGEINT * b.qi::HUGEINT) AS HUGEINT) AS sxy
       FROM u a JOIN u b ON a.rid = b.rid AND b.i >= a.i
       GROUP BY 1, 2),
ctri AS (SELECT pp.i AS dim_i, pp.j AS dim_j,
                round(CAST(nn.n * pp.sxy - si.s * sj.s AS DOUBLE)
                      / CAST(nn.n * nn.n AS DOUBLE) / 1e12, 9) AS cov
         FROM pp JOIN s si ON si.i = pp.i JOIN s sj ON sj.i = pp.j
         CROSS JOIN nn),
c AS MATERIALIZED (
  SELECT dim_i, dim_j, cov FROM ctri
  UNION ALL
  SELECT dim_j, dim_i, cov FROM ctri WHERE dim_i <> dim_j),
v0 AS MATERIALIZED (
  SELECT dim, CAST(500000000 + CAST('0x' || substr(md5('pca:'
              || CAST(dim AS VARCHAR)), 1, 4) AS BIGINT) * 10000
              AS BIGINT) AS vi
  FROM (SELECT DISTINCT dim_i AS dim FROM c))"""
    rounds = []
    for t in range(1, iters + 1):
        prev = f"v{t - 1}"
        rounds.append(f"""
w{t} AS MATERIALIZED (
  SELECT c.dim_i AS dim,
         CAST(sum(CAST(round(c.cov * CAST(p.vi AS DOUBLE), 0) AS BIGINT))
              AS BIGINT) AS wi
  FROM c JOIN {prev} p ON p.dim = c.dim_j
  GROUP BY 1),
n{t} AS (SELECT sqrt(CAST(sum(wi::HUGEINT * wi::HUGEINT) AS DOUBLE))
                AS nrm
         FROM w{t}),
v{t} AS MATERIALIZED (
  SELECT dim, CASE WHEN nrm > 0
                   THEN CAST(round(CAST(wi AS DOUBLE) / nrm * 1e9, 0)
                        AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS vi
  FROM w{t} CROSS JOIN n{t})""")
    last = f"v{iters}"
    tail = f"""
wf AS (SELECT c.dim_i AS dim,
              CAST(sum(CAST(round(c.cov * CAST(p.vi AS DOUBLE), 0)
                   AS BIGINT)) AS BIGINT) AS wi
       FROM c JOIN {last} p ON p.dim = c.dim_j
       GROUP BY 1),
q AS (SELECT CAST(sum(v.vi::HUGEINT * wf.wi::HUGEINT) AS HUGEINT) AS vw,
             CAST(sum(v.vi::HUGEINT * v.vi::HUGEINT) AS HUGEINT) AS vv
      FROM {last} v JOIN wf ON wf.dim = v.dim)
SELECT v.dim, round(CAST(v.vi AS DOUBLE) / 1e9, 6) AS loading,
       CASE WHEN CAST(q.vv AS DOUBLE) > 0
            THEN round(CAST(q.vw AS DOUBLE) / CAST(q.vv AS DOUBLE), 9)
            END AS eigenvalue,
       {iters} AS n_iters
FROM {last} v CROSS JOIN q"""
    return head + "," + ",".join(rounds) + "," + tail


@query("pca_power_iteration", _pca_power_oracle())
def pca_power_iteration_query(spark, sf_dir):
    """Top principal component by in-engine power iteration
    (similarity.pca_power_iteration): hash-verified 9dp covariance in,
    1e9-quantized eigenvector register out, Rayleigh-quotient
    eigenvalue — PCA without collecting the matrix to the driver."""
    from amundsendatabuilder_spark.operators.similarity import (
        pca_power_iteration)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return pca_power_iteration(emb, iters=8)


@query("pca_explained_variance", (
    "WITH pca AS (" + _pca_power_oracle() + r"""),
lam AS (SELECT max(eigenvalue) AS eigenvalue FROM pca),
vsrc2 AS (SELECT list_transform(embedding::DOUBLE[],
                                x -> CAST(floor(x * 1000000) AS BIGINT))
              AS q
          FROM embeddings),
u2 AS (SELECT CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
              unnest(q) AS qi
       FROM vsrc2),
nn2 AS (SELECT count(*)::HUGEINT AS n FROM vsrc2),
diag AS (SELECT u2.i,
                round(CAST(nn2.n * CAST(sum(u2.qi::HUGEINT * u2.qi::HUGEINT)
                           AS HUGEINT)
                           - CAST(sum(u2.qi) AS HUGEINT)
                             * CAST(sum(u2.qi) AS HUGEINT) AS DOUBLE)
                      / CAST(nn2.n * nn2.n AS DOUBLE) / 1e12, 9) AS cov
         FROM u2 CROSS JOIN nn2 GROUP BY u2.i, nn2.n),
tr AS (SELECT CAST(sum(CAST(round(cov * 1e9, 0) AS BIGINT)) AS BIGINT)
              AS tr_e9
       FROM diag)
SELECT lam.eigenvalue,
       round(CAST(tr.tr_e9 AS DOUBLE) / 1e9, 6) AS trace,
       CASE WHEN tr.tr_e9 > 0
            THEN round(lam.eigenvalue
                       / (CAST(tr.tr_e9 AS DOUBLE) / 1e9), 6)
            END AS explained_ratio
FROM lam CROSS JOIN tr
"""))
def pca_explained_variance_query(spark, sf_dir):
    """Explained-variance ratio of the top principal component:
    lambda_1 / trace(C) — the "is one direction carrying the cloud"
    number read off pca_power_iteration and the covariance diagonal
    (diagonal entries 1e9-quantized before the order-free sum)."""
    from amundsendatabuilder_spark.operators.similarity import (
        embedding_covariance, pca_power_iteration)
    (emb,) = _t(spark, sf_dir, "embeddings")
    # ONE covariance corpus pass shared by the eigensolve and the trace
    # (the pass is the only data-sized stage here; everything downstream
    # is a d-row register — so it checkpoints as one partition, r15)
    # trailing no-op coalesce restores the SinglePartition property the
    # checkpoint loses under AQE (similarity._register_ckpt pattern) so
    # the trace agg and the eigensolve's register joins plan
    # exchange-free; the checkpoint itself executes register-scale
    # consumer joins only (the corpus pass ran inside
    # embedding_covariance), so it runs interpreted (r16)
    from amundsendatabuilder_spark.operators.similarity import (
        _interpreted_register_exec)
    cov_lazy = embedding_covariance(emb)
    with _interpreted_register_exec(cov_lazy):
        cov = cov_lazy.coalesce(1).localCheckpoint().coalesce(1)
    lam = (pca_power_iteration(emb, iters=8, cov=cov)
           .agg(F.max("eigenvalue").alias("eigenvalue")))
    tr = (cov
          .where(F.col("dim_i") == F.col("dim_j"))
          .select(round_half_away(F.col("cov") * 1e9, 0).cast("long")
                  .alias("c9"))
          .agg(F.sum("c9").cast("long").alias("tr_e9")))
    # r16: both sides are 1-partition register derivations — a cartesian
    # 1-row attach skips the broadcast-build job (see _power_iterate)
    j = lam.crossJoin(tr.hint("shuffle_replicate_nl"))
    return j.select(
        "eigenvalue",
        round_half_away(F.col("tr_e9").cast("double") / 1e9, 6)
        .alias("trace"),
        F.when(F.col("tr_e9") > 0, round_half_away(
            F.col("eigenvalue")
            / (F.col("tr_e9").cast("double") / 1e9), 6))
        .alias("explained_ratio"))


def _stream_minhash_oracle(num_hashes: int = 16) -> str:
    """Replay oracle for windowed_minhash_registers: same md5 chunking
    and universal-hash constants, batch per-hour min, emission
    frontier pinned at max(ts) - watermark."""
    from amundsendatabuilder_spark.functions.hashing import (
        minhash_constants)
    a_tab, b_tab = minhash_constants(num_hashes)
    rows = "\nUNION ALL\n".join(
        f"""SELECT window_start, {j} AS hash_idx,
       CAST(min((c{j % 4} * {a_tab[j]} + {b_tab[j]}) % 4294967296)
            AS BIGINT) AS min_hash
FROM hx GROUP BY 1""" for j in range(num_hashes))
    return f"""
WITH wm AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM events),
hx AS (SELECT date_trunc('hour', ts) AS window_start,
              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
                   AS BIGINT) AS c0,
              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8)
                   AS BIGINT) AS c1,
              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 17, 8)
                   AS BIGINT) AS c2,
              CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 25, 8)
                   AS BIGINT) AS c3
       FROM events),
sig AS ({rows})
SELECT s.window_start, CAST(s.hash_idx AS INT) AS hash_idx, s.min_hash
FROM sig s, wm WHERE s.window_start + INTERVAL 1 HOUR <= wm.w"""


@query("stream_bottomk_sample", r"""
WITH mx AS (SELECT CAST(floor(epoch(max(ts)) * 1000000) AS BIGINT) AS m_us
            FROM events),
ev AS (SELECT DISTINCT event_id,
              CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
                   AS BIGINT) AS hv,
              (CAST(floor(epoch(ts) * 1000000) AS BIGINT) // 3600000000)
                  * 3600000000 AS ws_us
       FROM events),
r AS (SELECT ws_us, event_id, hv,
             CAST(row_number() OVER (PARTITION BY ws_us
                                     ORDER BY hv, event_id) AS INT) AS rank
      FROM ev)
SELECT CAST(to_timestamp(ws_us / 1000000.0) AS TIMESTAMP) AS window_start,
       rank, event_id, hv
FROM r CROSS JOIN mx
WHERE rank <= 8
  AND ws_us + 3600000000 < ((m_us // 1000) - 7200000) * 1000
ORDER BY ws_us, rank
""")
def stream_bottomk_sample_query(spark, sf_dir):
    """Streaming bottom-k hash sample per tumbling hour
    (streaming/events.windowed_bottomk_sample): the k=8 events with the
    smallest md5-derived hash — the uniform-sample member of the
    streaming sketch family, held as a k-bounded
    applyInPandasWithState register (a built-in windowed agg cannot
    express a bounded order statistic in append mode). Hash-verified:
    the twin replays the hash, the hour bucketing, the per-window rank,
    and the asof_stream emission frontier (window_end strictly behind
    max(ts) − delay on the AvailableNow drain) — an all-integer payload,
    so the streaming entry gets a FULL value-hash check, not the weaker
    rows-only one."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_bottomk_sample)
    sample = windowed_bottomk_sample(_event_stream(spark, sf_dir))
    name = "sbk_" + next(tempfile._get_candidate_names())
    out = run_to_memory(sample, spark, name, tempfile.mkdtemp())
    return out.orderBy("window_start", "rank")


@query("stream_minhash_registers", _stream_minhash_oracle())
def stream_minhash_registers_query(spark, sf_dir):
    """Streaming per-window MinHash signatures
    (streaming/events.windowed_minhash_registers): num_hashes
    MIN-mergeable registers per tumbling hour over the window's user
    set — the resemblance member of the streaming sketch family;
    compare two windows' signatures position-wise for their Jaccard.
    Hash-verified against the batch per-hour min restricted to the
    append-mode emission frontier."""
    import tempfile

    from amundsendatabuilder_spark.streaming.events import (
        run_to_memory, windowed_minhash_registers)
    regs = windowed_minhash_registers(_event_stream(spark, sf_dir))
    name = "smr_" + next(tempfile._get_candidate_names())
    return run_to_memory(regs, spark, name, tempfile.mkdtemp())


def _pca_top_oracle(n_components: int = 2, iters: int = 8) -> str:
    """Replay oracle for pca_top_components: the _pca_power_oracle head
    (HUGEINT covariance, symmetrized), then per component a
    prefix-jittered start, unrolled MATERIALIZED rounds, Rayleigh
    quotient, and 9dp-grid Hotelling deflation."""
    head = r"""
WITH vsrc AS (SELECT list_transform(embedding::DOUBLE[],
                                    x -> CAST(floor(x * 1000000) AS BIGINT))
                  AS q
              FROM embeddings),
wsrc AS (SELECT row_number() OVER () AS rid, q FROM vsrc),
u AS (SELECT rid, CAST(generate_subscripts(q, 1) - 1 AS INT) AS i,
             unnest(q) AS qi
      FROM wsrc),
nn AS (SELECT count(*)::HUGEINT AS n FROM vsrc),
s AS (SELECT i, CAST(sum(qi) AS HUGEINT) AS s FROM u GROUP BY i),
pp AS (SELECT a.i AS i, b.i AS j,
              CAST(sum(a.qi::HUGEINT * b.qi::HUGEINT) AS HUGEINT) AS sxy
       FROM u a JOIN u b ON a.rid = b.rid AND b.i >= a.i
       GROUP BY 1, 2),
ctri AS (SELECT pp.i AS dim_i, pp.j AS dim_j,
                round(CAST(nn.n * pp.sxy - si.s * sj.s AS DOUBLE)
                      / CAST(nn.n * nn.n AS DOUBLE) / 1e12, 9) AS cov
         FROM pp JOIN s si ON si.i = pp.i JOIN s sj ON sj.i = pp.j
         CROSS JOIN nn),
c1 AS MATERIALIZED (
  SELECT dim_i, dim_j, cov FROM ctri
  UNION ALL
  SELECT dim_j, dim_i, cov FROM ctri WHERE dim_i <> dim_j)"""
    parts = [head]
    finals = []
    for k in range(1, n_components + 1):
        parts.append(f""",
k{k}v0 AS MATERIALIZED (
  SELECT dim, CAST(500000000 + CAST('0x' || substr(md5('pca{k}:'
              || CAST(dim AS VARCHAR)), 1, 4) AS BIGINT) * 10000
              AS BIGINT) AS vi
  FROM (SELECT DISTINCT dim_i AS dim FROM c{k}))""")
        for t in range(1, iters + 1):
            prev = f"k{k}v{t - 1}"
            parts.append(f""",
k{k}w{t} AS MATERIALIZED (
  SELECT c.dim_i AS dim,
         CAST(sum(CAST(round(c.cov * CAST(p.vi AS DOUBLE), 0) AS BIGINT))
              AS BIGINT) AS wi
  FROM c{k} c JOIN {prev} p ON p.dim = c.dim_j
  GROUP BY 1),
k{k}n{t} AS (SELECT sqrt(CAST(sum(wi::HUGEINT * wi::HUGEINT) AS DOUBLE))
                    AS nrm
             FROM k{k}w{t}),
k{k}v{t} AS MATERIALIZED (
  SELECT dim, CASE WHEN nrm > 0
                   THEN CAST(round(CAST(wi AS DOUBLE) / nrm * 1e9, 0)
                        AS BIGINT)
                   ELSE CAST(0 AS BIGINT) END AS vi
  FROM k{k}w{t} CROSS JOIN k{k}n{t})""")
        last = f"k{k}v{iters}"
        parts.append(f""",
k{k}wf AS (SELECT c.dim_i AS dim,
                  CAST(sum(CAST(round(c.cov * CAST(p.vi AS DOUBLE), 0)
                       AS BIGINT)) AS BIGINT) AS wi
           FROM c{k} c JOIN {last} p ON p.dim = c.dim_j
           GROUP BY 1),
k{k}q AS (SELECT CAST(sum(v.vi::HUGEINT * w.wi::HUGEINT) AS HUGEINT)
                 AS vw,
                 CAST(sum(v.vi::HUGEINT * v.vi::HUGEINT) AS HUGEINT)
                 AS vv
          FROM {last} v JOIN k{k}wf w ON w.dim = v.dim),
k{k}lam AS (SELECT CASE WHEN CAST(vv AS DOUBLE) > 0
                        THEN round(CAST(vw AS DOUBLE)
                                   / CAST(vv AS DOUBLE), 9)
                        END AS eigenvalue
            FROM k{k}q)""")
        finals.append(
            f"""SELECT {k} AS component, v.dim,
       round(CAST(v.vi AS DOUBLE) / 1e9, 6) AS loading,
       l.eigenvalue
FROM {last} v CROSS JOIN k{k}lam l""")
        if k < n_components:
            parts.append(f""",
c{k + 1} AS MATERIALIZED (
  SELECT c.dim_i, c.dim_j,
         round(c.cov - l.eigenvalue
               * (CAST(a.vi AS DOUBLE) / 1e9)
               * (CAST(b.vi AS DOUBLE) / 1e9), 9) AS cov
  FROM c{k} c
  JOIN {last} a ON a.dim = c.dim_i
  JOIN {last} b ON b.dim = c.dim_j
  CROSS JOIN k{k}lam l)""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(finals)


@query("pca_top_components", _pca_top_oracle())
def pca_top_components_query(spark, sf_dir):
    """Top-2 principal components by power iteration + Hotelling
    deflation (similarity.pca_top_components): the truncated
    eigendecomposition entirely on register-sized tables — deflated
    entries re-round to the covariance's 9dp grid so both passes
    replay identically in the unrolled twin."""
    from amundsendatabuilder_spark.operators.similarity import (
        pca_top_components)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return pca_top_components(emb, n_components=2, iters=8)


@query("graph_effective_diameter", f"""
WITH nf AS ({_hyperball_oracle()}),
reg AS (SELECT radius, n_nodes,
               CAST(round(total_reach * 1e6, 0) AS BIGINT) AS t6
        FROM nf),
mx AS (SELECT max(t6) AS tmax, max(radius) AS rmax,
              max(n_nodes) AS n_nodes
       FROM reg),
j AS (SELECT r.radius, r.t6,
             lag(r.t6) OVER (ORDER BY r.radius) AS prev_t6,
             m.tmax, m.rmax, m.n_nodes
      FROM reg r CROSS JOIN mx m),
crossed AS (SELECT * FROM j
            WHERE CAST(t6 AS DOUBLE) >= CAST(tmax AS DOUBLE) * 0.9
            ORDER BY radius LIMIT 1)
SELECT n_nodes, CAST(rmax AS INT) AS max_radius,
       round(CAST(tmax AS DOUBLE) / 1e6, 6) AS reach_at_max,
       round(CASE WHEN radius = 0 THEN 0.0
                  ELSE CAST(radius - 1 AS DOUBLE)
                       + (CAST(tmax AS DOUBLE) * 0.9
                          - CAST(prev_t6 AS DOUBLE))
                         / CAST(t6 - prev_t6 AS DOUBLE) END, 6)
       AS effective_diameter
FROM crossed
""")
def graph_effective_diameter_query(spark, sf_dir):
    """Effective diameter (q=0.9) of the synthesized lineage DAG from
    HyperBall's neighborhood function
    (graph_algo.hyperball_effective_diameter): exact-linear
    interpolation between bracketing radii on the 1e6-quantized reach
    sums — Boldi-Vigna's headline statistic on register state."""
    from amundsendatabuilder_spark.operators.graph_algo import (
        hyperball_effective_diameter)
    (orders,) = _t(spark, sf_dir, "orders")
    keys_df = (orders.select(F.col("o_orderkey").alias("k"))
               .distinct().cache())
    a, b = keys_df.alias("a"), keys_df.alias("b")

    def em(mult: int, add: int = 0):
        return (a.join(b, F.col("b.k") == F.col("a.k") * mult + add)
                .select(F.col("a.k").alias("src"),
                        F.col("b.k").alias("dst")))

    edges = em(2).unionByName(em(2, 1)).unionByName(em(3))
    return hyperball_effective_diameter(edges, iters=3, p=4, q=0.9)


@query("search_pr_at_k", r"""
WITH base AS (SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                 x -> x <> '') AS tk
              FROM documents),
len AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM base),
stats AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM len),
hits AS (SELECT doc_id, unnest(tk) AS term FROM base),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
       FROM hits WHERE term IN ('hash', 'join', 'merge', 'sort')
       GROUP BY 1, 2),
dfx AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
part AS (SELECT tf.doc_id, tf.term,
                round(ln(1 + (s.n_docs - dfx.df + 0.5) / (dfx.df + 0.5))
                      * (tf.tf * 2.2)
                      / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl)),
                      9) AS part
         FROM tf JOIN dfx USING (term)
         JOIN len l ON tf.doc_id = l.doc_id
         CROSS JOIN stats s),
summed AS (SELECT doc_id, round(list_sum(list(part ORDER BY term)), 6) AS score
           FROM part GROUP BY doc_id),
ranked AS (SELECT doc_id,
                  CAST(row_number() OVER (ORDER BY score DESC, doc_id)
                       AS INT) AS r
           FROM summed ORDER BY score DESC, doc_id LIMIT 10),
rel AS (SELECT doc_id,
               CAST(len(list_filter(['hash', 'join', 'merge', 'sort'],
                    t -> list_contains(tk, t))) AS BIGINT) AS rel
        FROM base),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_rel_total FROM rel WHERE rel > 0),
page AS (SELECT rk.r,
                CASE WHEN coalesce(rl.rel, 0) > 0 THEN 1 ELSE 0 END AS hit
         FROM ranked rk LEFT JOIN rel rl ON rl.doc_id = rk.doc_id),
agg AS (SELECT CAST(sum(hit) AS BIGINT) AS n_rel_at_k,
               min(CASE WHEN hit = 1 THEN r END) AS first_r FROM page)
SELECT 10 AS k, n_rel_total,
       coalesce(n_rel_at_k, CAST(0 AS BIGINT)) AS n_rel_at_k,
       round(CAST(coalesce(n_rel_at_k, 0) AS DOUBLE) / 10, 6) AS precision,
       CASE WHEN n_rel_total > 0
            THEN round(CAST(coalesce(n_rel_at_k, 0) AS DOUBLE)
                       / CAST(n_rel_total AS DOUBLE), 6) END AS recall,
       CASE WHEN first_r IS NOT NULL
            THEN round(1.0 / CAST(first_r AS DOUBLE), 6) END AS rr
FROM agg CROSS JOIN tot
""")
def search_pr_at_k_query(spark, sf_dir):
    """Precision/recall/RR@10 of the BM25 ranking against binary
    relevance (ranking.ir_pr_at_k over ranking.bm25_topk) — the
    set-based IR triple next to search_ndcg's graded gain; recall's
    denominator is the WHOLE corpus relevance so pages that miss
    relevant docs are penalized."""
    from amundsendatabuilder_spark.functions.text import tokens as _toks
    from amundsendatabuilder_spark.operators.ranking import (
        bm25_topk, ir_pr_at_k)
    (docs,) = _t(spark, sf_dir, "documents")
    ranked = bm25_topk(docs, "hash join merge sort", k=10)
    terms = F.array(*[F.lit(t) for t in
                      ("hash", "join", "merge", "sort")])
    rel = docs.select(
        "doc_id",
        F.size(F.filter(terms, lambda t: F.array_contains(
            _toks(F.lower(F.col("text"))), t))).cast("long").alias("rel"))
    return ir_pr_at_k(ranked, rel, k=10)


@query("dedup_minhash_estimate", f"""
WITH {_minhash_bands_cte(16, 4)},
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_sig = b.band_sig
          AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b,
       CAST(CASE WHEN x.mh0 = y.mh0 THEN 1 ELSE 0 END + CASE WHEN x.mh1 = y.mh1 THEN 1 ELSE 0 END + CASE WHEN x.mh2 = y.mh2 THEN 1 ELSE 0 END + CASE WHEN x.mh3 = y.mh3 THEN 1 ELSE 0 END + CASE WHEN x.mh4 = y.mh4 THEN 1 ELSE 0 END + CASE WHEN x.mh5 = y.mh5 THEN 1 ELSE 0 END + CASE WHEN x.mh6 = y.mh6 THEN 1 ELSE 0 END + CASE WHEN x.mh7 = y.mh7 THEN 1 ELSE 0 END + CASE WHEN x.mh8 = y.mh8 THEN 1 ELSE 0 END + CASE WHEN x.mh9 = y.mh9 THEN 1 ELSE 0 END + CASE WHEN x.mh10 = y.mh10 THEN 1 ELSE 0 END + CASE WHEN x.mh11 = y.mh11 THEN 1 ELSE 0 END + CASE WHEN x.mh12 = y.mh12 THEN 1 ELSE 0 END + CASE WHEN x.mh13 = y.mh13 THEN 1 ELSE 0 END + CASE WHEN x.mh14 = y.mh14 THEN 1 ELSE 0 END + CASE WHEN x.mh15 = y.mh15 THEN 1 ELSE 0 END AS INT) AS n_agree,
       CAST(CAST(CASE WHEN x.mh0 = y.mh0 THEN 1 ELSE 0 END + CASE WHEN x.mh1 = y.mh1 THEN 1 ELSE 0 END + CASE WHEN x.mh2 = y.mh2 THEN 1 ELSE 0 END + CASE WHEN x.mh3 = y.mh3 THEN 1 ELSE 0 END + CASE WHEN x.mh4 = y.mh4 THEN 1 ELSE 0 END + CASE WHEN x.mh5 = y.mh5 THEN 1 ELSE 0 END + CASE WHEN x.mh6 = y.mh6 THEN 1 ELSE 0 END + CASE WHEN x.mh7 = y.mh7 THEN 1 ELSE 0 END + CASE WHEN x.mh8 = y.mh8 THEN 1 ELSE 0 END + CASE WHEN x.mh9 = y.mh9 THEN 1 ELSE 0 END + CASE WHEN x.mh10 = y.mh10 THEN 1 ELSE 0 END + CASE WHEN x.mh11 = y.mh11 THEN 1 ELSE 0 END + CASE WHEN x.mh12 = y.mh12 THEN 1 ELSE 0 END + CASE WHEN x.mh13 = y.mh13 THEN 1 ELSE 0 END + CASE WHEN x.mh14 = y.mh14 THEN 1 ELSE 0 END + CASE WHEN x.mh15 = y.mh15 THEN 1 ELSE 0 END AS BIGINT) * 1000000 // 16 AS BIGINT)
       AS est_jaccard_ppm
FROM cand c JOIN mh x ON x.doc_id = c.doc_a
JOIN mh y ON y.doc_id = c.doc_b
""")
def dedup_minhash_estimate_query(spark, sf_dir):
    """Signature-space Jaccard estimates for the LSH candidates
    (dedup.minhash_jaccard_estimate): Broder's P[mh_j(A)=mh_j(B)] =
    J(A,B) turns agreeing components into an unbiased k=16 estimate in
    exact integer ppm — the cheap verify tier that triages candidates
    before lsh_verified_pairs' exact re-shingle confirm ever touches
    text again.

    Guard provenance (the dedup_minhash_lsh convention, r10 advice):
    the Spark call inherits max_bucket_size=1000 while this SQL twin
    has no cap — provably a no-op here because the fixture's largest
    band bucket is far below 1000 members, so the guard drops nothing;
    a corpus where it BITES must consult the cap-audit report first."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.minhash_jaccard_estimate(docs, num_hashes=16, bands=4,
                                          shingle_size=3)


@query("curriculum_schedule", r"""
WITH t AS (SELECT doc_id,
                  CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                                       x -> x <> '')) AS BIGINT) AS difficulty
           FROM documents),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM t),
ks AS (SELECT CAST(unnest(generate_series(1, 4)) AS INT) AS bucket),
needs AS (SELECT bucket, -((-bucket * n) // 4) AS need FROM ks, tot),
ord AS (SELECT difficulty AS qv,
               row_number() OVER (ORDER BY difficulty) AS rn FROM t),
bounds AS (SELECT bucket,
                  (SELECT qv FROM ord WHERE rn = needs.need) AS cut
           FROM needs),
ph AS (SELECT doc_id, difficulty, CAST(min(bucket) AS INT) AS phase
       FROM t JOIN bounds ON difficulty <= cut GROUP BY 1, 2)
SELECT doc_id, difficulty, phase,
       CAST(row_number() OVER (
            PARTITION BY phase
            ORDER BY md5('cur:' || CAST(doc_id AS VARCHAR)), doc_id)
            AS INT) AS pos_in_phase
FROM ph
""")
def curriculum_schedule_query(spark, sf_dir):
    """Curriculum read order (curation.curriculum_schedule): 4
    equal-depth token-count difficulty phases (register-derived
    boundaries, broadcast assignment) with a seedless md5 shuffle
    within each phase. The DuckDB twin derives each phase cut from the
    EXACT sorted order (value at rank ceil(k*N/4)), so a hash match
    proves the register derivation equals the exact sort's phases."""
    from amundsendatabuilder_spark.operators.curation import (
        curriculum_schedule)
    (docs,) = _t(spark, sf_dir, "documents")
    return curriculum_schedule(docs, n_phases=4)


@query("rank_rbo_lists", """
WITH s AS (SELECT o_custkey AS doc_id,
                  CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                       AS BIGINT) AS v
           FROM orders GROUP BY 1),
ra AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY v DESC, doc_id)
                           AS INT) AS r
       FROM s ORDER BY v DESC, doc_id LIMIT 10),
c AS (SELECT o_custkey AS doc_id, CAST(count(*) AS BIGINT) AS v
      FROM orders GROUP BY 1),
rb AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY v DESC, doc_id)
                           AS INT) AS r
       FROM c ORDER BY v DESC, doc_id LIMIT 10),
m AS (SELECT greatest(ra.r, rb.r) AS m FROM ra JOIN rb USING (doc_id)),
d AS (SELECT CAST(unnest(range(m, 11)) AS INT) AS d FROM m),
xd AS (SELECT d, CAST(count(*) AS BIGINT) AS xd FROM d GROUP BY 1),
terms AS (SELECT CAST(round(CAST(xd AS DOUBLE)
                            * ([0.09999999999999998, 0.04499999999999999, 0.026999999999999996, 0.018224999999999998, 0.013121999999999998, 0.0098415, 0.007592014285714285, 0.005978711249999999, 0.004782969000000001, 0.00387420489])[d] * 1e12, 0) AS BIGINT) AS t
          FROM xd),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_common FROM m)
SELECT 10 AS k, n_common,
       round(CAST(coalesce((SELECT CAST(sum(t) AS BIGINT) FROM terms), 0)
                  AS DOUBLE) / 1e12, 6) AS rbo
FROM tot
""")
def rank_rbo_lists_query(spark, sf_dir):
    """Rank-biased overlap (ranking.rank_rbo, Webber et al. 2010)
    between two top-10 customer rankings — by total spend (exact cents)
    vs by order count: the top-weighted list-similarity metric for
    comparing rankers, per-depth overlap terms as 1e12-quantized
    integers with the (1-p)p^(d-1)/d weights baked as identical
    literals in both engines."""
    from amundsendatabuilder_spark.operators.ranking import rank_rbo
    (orders,) = _t(spark, sf_dir, "orders")
    cents = F.sum(round_half_away(F.col("o_totalprice") * 100, 0)
                  .cast("long")).cast("long")

    def toplist(val):
        t = (orders.groupBy(F.col("o_custkey").alias("doc_id"))
             .agg(val.alias("v")))
        topk = t.orderBy(F.col("v").desc(), "doc_id").limit(10)
        w = Window.orderBy(F.col("v").desc(), "doc_id")
        return (topk.withColumn("rank", F.row_number().over(w))
                .select("doc_id", "rank"))

    by_spend = toplist(cents)
    by_count = toplist(F.count(F.lit(1)).cast("long"))
    return rank_rbo(by_spend, by_count, p=0.9, k=10)


def _mutual_nn_oracle(bands: int = 4) -> str:
    """Replay oracle for mutual_nn_pairs: same seeded planes and banding
    as the embedding near-dup path, exact-cosine top-1 per source with
    (cos DESC, nbr ASC) determinism, mutuality by self-join."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 16, seed=7)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
{_rhp_sigs_cte(planes, bands)},
cand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
         FROM sigs x JOIN sigs y
           ON x.band = y.band AND x.sig = y.sig
          AND x.vec_id <> y.vec_id),
sc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
       FROM cand JOIN e a ON a.vec_id = cand.src
                 JOIN e b ON b.vec_id = cand.nbr),
t1 AS (SELECT src, nbr, cos
       FROM (SELECT sc.*, row_number() OVER (
                 PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM sc)
       WHERE rk = 1)
SELECT a.src AS id_a, a.nbr AS id_b, a.cos AS cos
FROM t1 a JOIN t1 b
  ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src
"""


@query("mutual_nn_dedup", _mutual_nn_oracle())
def mutual_nn_dedup_query(spark, sf_dir):
    """Reciprocal nearest-neighbor pairs over the RHP-banded candidate
    graph (similarity.mutual_nn_pairs): (a, b) kept only when each is
    the other's top-1 cosine neighbor — the hub-killing semantic-dedup
    refinement; same seeded planes/banding as the embedding near-dup
    default, so candidate generation never joins corpus to corpus."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        mutual_nn_pairs)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return mutual_nn_pairs(emb, random_planes(64, 16, seed=7), bands=4)


# Production-configuration parameters shared by the capped embedding
# twins (r10 verdict items #1-2): 64 planes in 8-bit bands keep bucket
# size tracking CLUSTER structure instead of corpus size; exact-vector
# collapse absorbs duplicate mass (the sf1 replica fixture's entire
# super-linearity); max_bucket_size=10 bounds whatever near-dup cliques
# remain. The cap BITES on the sf0.01 fixture (2 of 1661 buckets over),
# so the oracles certify the guard where it drops rows, not as a no-op.
_CAP_BANDS = 8
_CAP_SIZE = 10


def _capped_sigs_sql(planes, bands, cap, src="e", bits="bits",
                     sigs="sigs", capped="csigs") -> str:
    """sigs CTEs + the bucket-size cap filter (count window + drop)."""
    return f"""{_rhp_sigs_cte(planes, bands, src=src, bits=bits, sigs=sigs)},
{capped} AS (SELECT vec_id, band, sig FROM (
    SELECT s.*, count(*) OVER (PARTITION BY band, sig) AS _sz
    FROM {sigs} s) WHERE _sz <= {cap})"""


def _mutual_nn_capped_oracle() -> str:
    """Replay oracle for the PRODUCTION mutual-NN configuration:
    exact-vector collapse -> 8-bit band sigs -> bucket cap -> exact
    cosine top-1 -> mutuality self-join, all replayed verbatim."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT min(vec_id) AS vec_id, v FROM raw GROUP BY v),
{_capped_sigs_sql(planes, _CAP_BANDS, _CAP_SIZE)},
cand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
         FROM csigs x JOIN csigs y
           ON x.band = y.band AND x.sig = y.sig
          AND x.vec_id <> y.vec_id),
sc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
       FROM cand JOIN e a ON a.vec_id = cand.src
                 JOIN e b ON b.vec_id = cand.nbr),
t1 AS (SELECT src, nbr, cos
       FROM (SELECT sc.*, row_number() OVER (
                 PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM sc)
       WHERE rk = 1)
SELECT a.src AS id_a, a.nbr AS id_b, a.cos AS cos
FROM t1 a JOIN t1 b
  ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src
"""


@query("mutual_nn_dedup_capped", _mutual_nn_capped_oracle())
def mutual_nn_dedup_capped_query(spark, sf_dir):
    """The PRODUCTION mutual-NN configuration (r10 verdict item #1 —
    the certified path must be the one that survives dup-clique
    corpora): similarity.mutual_nn_pairs with collapse_exact (identical
    vectors -> min-id representative, so a k-replica clique contributes
    one member instead of k(k-1)/2 candidates), 8-bit band signatures
    (bucket size tracks cluster structure, not corpus size), and the
    BINDING max_bucket_size=10 guard (2 of 1661 sf0.01 buckets over
    cap). sf1 headroom: output and cost equal sf0.1's because the
    replica fixture's growth is pure duplication — exactly what the
    collapse absorbs. Pair with rhp_cap_audit: no silent caps."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        mutual_nn_pairs)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return mutual_nn_pairs(emb, random_planes(64, 64, seed=7),
                           bands=_CAP_BANDS, max_bucket_size=_CAP_SIZE,
                           collapse_exact=True)


def _rhp_cap_audit_oracle() -> str:
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT min(vec_id) AS vec_id, v FROM raw GROUP BY v),
{_rhp_sigs_cte(planes, _CAP_BANDS)},
bsz AS (SELECT band, sig, count(*) AS sz FROM sigs GROUP BY 1, 2),
bstats AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets_total,
                  CAST(sum(CASE WHEN sz > {_CAP_SIZE} THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_buckets_over_cap,
                  CAST(sum(CASE WHEN sz > {_CAP_SIZE} THEN sz ELSE 0 END)
                       AS BIGINT) AS n_sig_rows_dropped
           FROM bsz),
vst AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors_bucketed,
               CAST(sum(CASE WHEN mn > {_CAP_SIZE} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_vectors_fully_dropped
        FROM (SELECT s.vec_id, min(b.sz) AS mn
              FROM sigs s JOIN bsz b USING (band, sig) GROUP BY 1)),
nin AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors_in FROM embeddings)
SELECT n_vectors_in, n_vectors_bucketed, n_buckets_total,
       n_buckets_over_cap, n_sig_rows_dropped, n_vectors_fully_dropped
FROM nin, vst, bstats
"""


@query("rhp_cap_audit", _rhp_cap_audit_oracle())
def rhp_cap_audit_query(spark, sf_dir):
    """The no-silent-caps audit for RHP bucket capping
    (similarity.rhp_cap_audit, the similarity_cap_report precedent):
    with the production parameters of mutual_nn_dedup_capped (collapse +
    64 planes / 8 bands / cap 10) the report surfaces exactly how many
    buckets the guard drops, how many signature rows that costs, and how
    many vectors become COMPLETELY invisible to candidate generation
    (every band over cap) — publish it next to any capped result."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        rhp_cap_audit)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return rhp_cap_audit(emb, random_planes(64, 64, seed=7),
                         bands=_CAP_BANDS, max_bucket_size=_CAP_SIZE,
                         collapse_exact=True)


def _mutual_nn_recall_oracle() -> str:
    """Replay oracle for the mutual-NN recall audit: BOTH mutual-NN
    chains (uncapped pin = 16 planes / 4 bands over raw ids; production
    = collapse -> 64 planes / 8 bands / cap 10) replayed verbatim, truth
    pairs mapped through the min-id exact-vector representative, hits by
    pair-key join."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    p_t = random_planes(64, 16, seed=7)
    p_p = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT vec_id, v FROM raw),
{_rhp_sigs_cte(p_t, 4, src="e", bits="tbits", sigs="tsigs")},
tcand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
          FROM tsigs x JOIN tsigs y
            ON x.band = y.band AND x.sig = y.sig
           AND x.vec_id <> y.vec_id),
tsc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM tcand JOIN e a ON a.vec_id = tcand.src
                   JOIN e b ON b.vec_id = tcand.nbr),
tt1 AS (SELECT src, nbr FROM (SELECT tsc.*, row_number() OVER (
            PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM tsc)
        WHERE rk = 1),
tp AS (SELECT a.src AS id_a, a.nbr AS id_b
       FROM tt1 a JOIN tt1 b
         ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src),
ec AS (SELECT min(vec_id) AS rep, v FROM raw GROUP BY v),
rm AS (SELECT raw.vec_id AS id, ec.rep FROM raw JOIN ec USING (v)),
mapped AS (SELECT least(ra.rep, rb.rep) AS id_a,
                  greatest(ra.rep, rb.rep) AS id_b
           FROM tp JOIN rm ra ON tp.id_a = ra.id
                   JOIN rm rb ON tp.id_b = rb.id),
md AS (SELECT DISTINCT id_a, id_b FROM mapped WHERE id_a < id_b),
e2 AS (SELECT rep AS vec_id, v FROM ec),
{_capped_sigs_sql(p_p, _CAP_BANDS, _CAP_SIZE, src="e2", bits="pbits",
                  sigs="psigs", capped="pcs")},
pcand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
          FROM pcs x JOIN pcs y
            ON x.band = y.band AND x.sig = y.sig
           AND x.vec_id <> y.vec_id),
psc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM pcand JOIN e2 a ON a.vec_id = pcand.src
                   JOIN e2 b ON b.vec_id = pcand.nbr),
pt1 AS (SELECT src, nbr FROM (SELECT psc.*, row_number() OVER (
            PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM psc)
        WHERE rk = 1),
pp AS (SELECT a.src AS id_a, a.nbr AS id_b
       FROM pt1 a JOIN pt1 b
         ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src),
agg AS (SELECT
    CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_truth_pairs,
    CAST((SELECT count(*) FROM md) AS BIGINT) AS n_truth_mapped,
    CAST((SELECT count(*) FROM mapped WHERE id_a = id_b) AS BIGINT)
        AS n_truth_collapsed_away,
    CAST((SELECT count(*) FROM pp) AS BIGINT) AS n_prod_pairs,
    CAST((SELECT count(*) FROM md JOIN pp USING (id_a, id_b)) AS BIGINT)
        AS n_hits)
SELECT n_truth_pairs, n_truth_mapped, n_truth_collapsed_away,
       n_prod_pairs, n_hits,
       CASE WHEN n_truth_mapped = 0 THEN 0.0
            ELSE round(CAST(n_hits AS DOUBLE) / n_truth_mapped, 6)
       END AS recall
FROM agg
"""


@query("mutual_nn_recall_report", _mutual_nn_recall_oracle())
def mutual_nn_recall_report_query(spark, sf_dir):
    """Recall audit for the PRODUCTION mutual-NN configuration
    (similarity.mutual_nn_recall_report, r11 verdict item #4 — the
    ann_recall_report discipline applied to mutual_nn_dedup_capped):
    what fraction of the uncapped pin's true mutual-NN pairs the
    collapse + 8-bit-band + cap-10 production path keeps, with truth
    pairs mapped through the exact-vector representative and
    collapse-absorbed pairs counted separately (not a recall loss —
    the collapse dedups them by design, but never silently)."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        mutual_nn_recall_report)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return mutual_nn_recall_report(
        emb, random_planes(64, 16, seed=7), random_planes(64, 64, seed=7),
        bands_truth=4, bands_prod=_CAP_BANDS,
        max_bucket_size=_CAP_SIZE)


def _mutual_nn_exact_recall_oracle() -> str:
    """Replay oracle for the exact-ground-truth mutual-NN audit: the
    exact mutual top-1 relation from an ALL-PAIRS cross join (the
    ann_brute_force_topk oracle pattern), the pin and production banded
    chains replayed verbatim, and the representative map for the
    production comparison."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    p_t = random_planes(64, 16, seed=7)
    p_p = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT vec_id, v FROM raw),
xsc AS (SELECT a.vec_id AS src, b.vec_id AS nbr,
               round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM e a JOIN e b ON a.vec_id <> b.vec_id),
xt1 AS (SELECT src, nbr FROM (SELECT xsc.*, row_number() OVER (
            PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM xsc)
        WHERE rk = 1),
xp AS (SELECT a.src AS id_a, a.nbr AS id_b
       FROM xt1 a JOIN xt1 b
         ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src),
{_rhp_sigs_cte(p_t, 4, src="e", bits="tbits", sigs="tsigs")},
tcand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
          FROM tsigs x JOIN tsigs y
            ON x.band = y.band AND x.sig = y.sig
           AND x.vec_id <> y.vec_id),
tsc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM tcand JOIN e a ON a.vec_id = tcand.src
                   JOIN e b ON b.vec_id = tcand.nbr),
tt1 AS (SELECT src, nbr FROM (SELECT tsc.*, row_number() OVER (
            PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM tsc)
        WHERE rk = 1),
tp AS (SELECT a.src AS id_a, a.nbr AS id_b
       FROM tt1 a JOIN tt1 b
         ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src),
ec AS (SELECT min(vec_id) AS rep, v FROM raw GROUP BY v),
rm AS (SELECT raw.vec_id AS id, ec.rep FROM raw JOIN ec USING (v)),
md AS (SELECT DISTINCT least(ra.rep, rb.rep) AS id_a,
                       greatest(ra.rep, rb.rep) AS id_b
       FROM xp JOIN rm ra ON xp.id_a = ra.id
               JOIN rm rb ON xp.id_b = rb.id
       WHERE ra.rep <> rb.rep),
e2 AS (SELECT rep AS vec_id, v FROM ec),
{_capped_sigs_sql(p_p, _CAP_BANDS, _CAP_SIZE, src="e2", bits="pbits",
                  sigs="psigs", capped="pcs")},
pcand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS nbr
          FROM pcs x JOIN pcs y
            ON x.band = y.band AND x.sig = y.sig
           AND x.vec_id <> y.vec_id),
psc AS (SELECT src, nbr, round(list_cosine_similarity(a.v, b.v), 6) AS cos
        FROM pcand JOIN e2 a ON a.vec_id = pcand.src
                   JOIN e2 b ON b.vec_id = pcand.nbr),
pt1 AS (SELECT src, nbr FROM (SELECT psc.*, row_number() OVER (
            PARTITION BY src ORDER BY cos DESC, nbr) AS rk FROM psc)
        WHERE rk = 1),
pp AS (SELECT a.src AS id_a, a.nbr AS id_b
       FROM pt1 a JOIN pt1 b
         ON a.src = b.nbr AND a.nbr = b.src AND a.src < b.src),
agg AS (SELECT
    CAST((SELECT count(*) FROM xp) AS BIGINT) AS n_exact_pairs,
    CAST((SELECT count(*) FROM md) AS BIGINT) AS n_exact_mapped,
    CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_pin_pairs,
    CAST((SELECT count(*) FROM xp JOIN tp USING (id_a, id_b)) AS BIGINT)
        AS n_pin_hits,
    CAST((SELECT count(*) FROM pp) AS BIGINT) AS n_prod_pairs,
    CAST((SELECT count(*) FROM md JOIN pp USING (id_a, id_b)) AS BIGINT)
        AS n_prod_hits)
SELECT n_exact_pairs, n_exact_mapped, n_pin_pairs, n_pin_hits,
       CASE WHEN n_exact_pairs = 0 THEN 0.0
            ELSE round(CAST(n_pin_hits AS DOUBLE) / n_exact_pairs, 6)
       END AS pin_recall,
       n_prod_pairs, n_prod_hits,
       CASE WHEN n_exact_mapped = 0 THEN 0.0
            ELSE round(CAST(n_prod_hits AS DOUBLE) / n_exact_mapped, 6)
       END AS prod_recall
FROM agg
"""


@query("mutual_nn_exact_recall_report", _mutual_nn_exact_recall_oracle())
def mutual_nn_exact_recall_report_query(spark, sf_dir):
    """Exact-ground-truth mutual-NN audit
    (similarity.mutual_nn_exact_recall_report): both banded configs —
    the 16-plane/4-band pin and the collapse/8-bit-band/cap-10
    production twin — scored against the TRUE brute-force mutual top-1
    relation, so when the banded pair sets diverge (the
    mutual_nn_recall_report finding) this row says which is closer to
    the real answer. Verification configuration: the exact side is
    all-pairs (gate scale; sample at 100 TB)."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        mutual_nn_exact_recall_report)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return mutual_nn_exact_recall_report(
        emb, random_planes(64, 16, seed=7), random_planes(64, 64, seed=7),
        bands_pin=4, bands_prod=_CAP_BANDS, max_bucket_size=_CAP_SIZE)


def _hard_negative_banded_oracle() -> str:
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
             FROM embeddings),
e AS (SELECT min(vec_id) AS vec_id, v, label FROM raw GROUP BY v, label),
{_capped_sigs_sql(planes, _CAP_BANDS, _CAP_SIZE)},
a AS (SELECT vec_id, label, v FROM raw WHERE vec_id % 10 = 0),
{_rhp_sigs_cte(planes, _CAP_BANDS, src="a", bits="abits", sigs="asigs")},
cand AS (SELECT DISTINCT c.vec_id AS neighbor_id, s.vec_id AS query_id
         FROM csigs c JOIN asigs s
           ON c.band = s.band AND c.sig = s.sig),
sc AS (SELECT cand.query_id, qa.label AS query_label, cand.neighbor_id,
              e.label AS neighbor_label,
              round(list_cosine_similarity(qa.v, e.v), 6) AS cos
       FROM cand JOIN a qa ON qa.vec_id = cand.query_id
                 JOIN e ON e.vec_id = cand.neighbor_id
       WHERE e.label <> qa.label),
r AS (SELECT *, CAST(row_number() OVER (
          PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT)
          AS rank
      FROM sc)
SELECT query_id, query_label, neighbor_id, neighbor_label, cos, rank
FROM r WHERE rank <= 3
"""


@query("hard_negative_banded", _hard_negative_banded_oracle())
def hard_negative_banded_query(spark, sf_dir):
    """Hard-negative mining's banded production twin (r10 verdict item
    #2 — the exact anchors x corpus scan measured 36x at 10x data when
    both sides grow): candidates drawn from shared 8-bit RHP band
    buckets with the corpus side exact-(vector,label)-collapsed and
    bucket-capped at 10 — identical negatives teach a contrastive batch
    nothing k times, and the collapse is what keeps duplicate-heavy
    corpora linear. Approximate by construction (a negative sharing no
    band is unseen; more bands recover recall); the oracle replays
    collapse + banding + cap + exact-cosine top-3 verbatim."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    from amundsendatabuilder_spark.operators.similarity import (
        hard_negative_mining)
    (emb,) = _t(spark, sf_dir, "embeddings")
    return hard_negative_mining(
        emb, emb.where(F.col("vec_id") % 10 == 0), k=3,
        planes=random_planes(64, 64, seed=7), bands=_CAP_BANDS,
        max_bucket_size=_CAP_SIZE, collapse_exact=True)


def _decontam_banded_oracle() -> str:
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id AS bench_id, v AS bv FROM raw WHERE vec_id % 20 = 0),
tr AS (SELECT vec_id, v FROM raw WHERE vec_id % 20 <> 0),
e AS (SELECT min(vec_id) AS vec_id, v FROM tr GROUP BY v),
{_capped_sigs_sql(planes, _CAP_BANDS, _CAP_SIZE)},
bsrc AS (SELECT bench_id AS vec_id, bv AS v FROM b),
{_rhp_sigs_cte(planes, _CAP_BANDS, src="bsrc", bits="bbits",
               sigs="bsigs")},
cand AS (SELECT DISTINCT t.vec_id, s.vec_id AS bench_id
         FROM csigs t JOIN bsigs s
           ON t.band = s.band AND t.sig = s.sig),
hits AS (SELECT c.vec_id, c.bench_id,
                round(list_cosine_similarity(t.v, b.bv), 6) AS cos
         FROM cand c JOIN e t ON t.vec_id = c.vec_id
                     JOIN b ON b.bench_id = c.bench_id
         WHERE round(list_cosine_similarity(t.v, b.bv), 6) >= 0.3),
agg AS (SELECT vec_id, CAST(count(*) AS BIGINT) AS n_bench_hits,
               max(cos) AS max_cos
        FROM hits GROUP BY 1),
rstat AS (SELECT a.vec_id AS rep_id, a.n_bench_hits, a.max_cos,
                 CAST(min(h.bench_id) AS BIGINT) AS nearest_bench
          FROM agg a JOIN hits h
            ON h.vec_id = a.vec_id AND h.cos = a.max_cos
          GROUP BY 1, 2, 3)
SELECT t.vec_id, r.n_bench_hits, r.max_cos, r.nearest_bench
FROM tr t JOIN e rp ON rp.v = t.v
JOIN rstat r ON r.rep_id = rp.vec_id
"""


@query("embedding_decontam_banded", _decontam_banded_oracle())
def embedding_decontam_banded_query(spark, sf_dir):
    """Semantic decontamination's banded production twin (r10 verdict
    item #2): the audit runs on DISTINCT train vectors (exact-dup rows
    collapse to a min-id representative), representatives score only
    the benchmark vectors sharing an 8-bit RHP band bucket (over-cap
    REP buckets dropped, cap 10 — residual near-dup cliques; never
    silent: rhp_cap_audit is a suite entry), and the per-rep verdict
    expands back to EVERY train row by vector equality — per-row
    coverage preserved, scan cost immune to duplicate mass.
    Approximate only in the banding (the exact embedding_decontam_audit
    remains the certified exhaustive audit for fixed MB-sized eval
    suites); the oracle replays collapse + banding + cap + threshold +
    argmax + expansion verbatim."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    (emb,) = _t(spark, sf_dir, "embeddings")
    bench = emb.where(F.col("vec_id") % 20 == 0)
    train = emb.where(F.col("vec_id") % 20 != 0)
    return dedup.embedding_decontam(
        train, bench, threshold=0.30,
        planes=random_planes(64, 64, seed=7), bands=_CAP_BANDS,
        max_bucket_size=_CAP_SIZE)


@query("dedup_simhash_hamming_capped", "WITH " + _COLLAPSE_SQL + ",\n"
       + _simhash_sig_sql("cdocs") + r""",
keyed AS (SELECT doc_id, simhash, 0 AS blk,
                 (simhash >> 8) & 255 AS blk_val FROM sig
          UNION ALL
          SELECT doc_id, simhash, 1, simhash & 255 FROM sig),
ck AS (SELECT doc_id, simhash, blk, blk_val FROM (
    SELECT k.*, count(*) OVER (PARTITION BY blk, blk_val) AS _sz
    FROM keyed k) WHERE _sz <= 40)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS INT) AS hamming
FROM ck x JOIN ck y
  ON x.blk = y.blk AND x.blk_val = y.blk_val AND x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 1
""")
def dedup_simhash_hamming_capped(spark, sf_dir):
    """simhash_hamming_pairs with BOTH production guards engaged (the
    mutual_nn_dedup_capped discipline — identical texts share simhashes,
    so the sf1 replica fixture squared every block bucket, 15.5x at 10x
    data): exact-text collapse (no-op on this fixture — zero identical
    texts — but the guard that absorbs the replica mass at sf1) and the
    BINDING max_block_size=40 (3 of the sf0.01 fixture's block buckets
    hold 61/47/46 members and are dropped — the oracle must agree
    row-for-row on what survives)."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(docs, bits=16, k=1,
                                       collapse_exact=True,
                                       max_block_size=40)


@query("dedup_simhash64_capped", "WITH " + _COLLAPSE_SQL + r""",
tok AS (SELECT doc_id, unnest(""" + _TOKS_SQL + r""") AS tok FROM cdocs),
h AS (SELECT doc_id, substr(md5(tok), 1, 16) AS h FROM tok),
bs AS (SELECT doc_id, h, unnest(range(0, 64)) AS bit FROM h),
votes AS (SELECT doc_id, bit,
                 sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, CAST(bit // 4 AS INT) + 1, 1)) - 1)
                                >> CAST(3 - bit % 4 AS INT)) & 1 = 1
                          THEN 1 ELSE -1 END) AS v
          FROM bs GROUP BY doc_id, bit),
sigs AS (SELECT doc_id, CAST(bit // 16 AS INT) AS w,
                CAST(sum(CASE WHEN v > 0 THEN 1 << CAST(15 - bit % 16 AS INT)
                              ELSE 0 END) AS BIGINT) AS word
         FROM votes GROUP BY doc_id, bit // 16),
cs AS (SELECT doc_id, w, word FROM (
    SELECT s.*, count(*) OVER (PARTITION BY w, word) AS _sz FROM sigs s)
    WHERE _sz <= 40),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM cs a JOIN cs b
           ON a.w = b.w AND a.word = b.word AND a.doc_id < b.doc_id),
ham AS (SELECT c.doc_a, c.doc_b,
               CAST(sum(bit_count(xor(x.word, y.word))) AS INT) AS hamming
        FROM cand c JOIN sigs x ON x.doc_id = c.doc_a
                    JOIN sigs y ON y.doc_id = c.doc_b AND y.w = x.w
        GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
""")
def dedup_simhash64_capped(spark, sf_dir):
    """simhash_hamming_pairs_wide (the production 64-bit width) with the
    exact-text collapse + max_block_size=40 word-bucket guard — the
    configuration for dup-clique corpora (12.2x at 10x data uncapped on
    the replica fixture). Candidates come from CAPPED word buckets;
    verification sums per-word bit_count(XOR) over the FULL signatures
    of surviving candidates, replayed verbatim in the twin."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs_wide(docs, bits=64, k=3,
                                            collapse_exact=True,
                                            max_block_size=40)


@query("simhash_cap_audit", "WITH " + _COLLAPSE_SQL + ",\n"
       + _simhash_sig_sql("cdocs") + r""",
keyed AS (SELECT doc_id, 0 AS blk, (simhash >> 8) & 255 AS blk_val FROM sig
          UNION ALL
          SELECT doc_id, 1, simhash & 255 FROM sig),
bsz AS (SELECT blk, blk_val, count(*) AS sz FROM keyed GROUP BY 1, 2),
bstats AS (SELECT CAST(count(*) AS BIGINT) AS n_blocks_total,
                  CAST(sum(CASE WHEN sz > 40 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_blocks_over_cap,
                  CAST(sum(CASE WHEN sz > 40 THEN sz ELSE 0 END) AS BIGINT)
                      AS n_sig_rows_dropped
           FROM bsz),
dstats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_sigged,
                  CAST(sum(CASE WHEN mn > 40 THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_docs_fully_dropped
           FROM (SELECT k.doc_id, min(b.sz) AS mn
                 FROM keyed k JOIN bsz b USING (blk, blk_val)
                 GROUP BY 1)),
nin AS (SELECT CAST(count(*) AS BIGINT) AS n_docs_in FROM documents)
SELECT n_docs_in, n_docs_sigged, n_blocks_total, n_blocks_over_cap,
       n_sig_rows_dropped, n_docs_fully_dropped
FROM nin, dstats, bstats
""")
def simhash_cap_audit_query(spark, sf_dir):
    """The no-silent-caps audit for the simhash block cap
    (dedup.simhash_block_cap_report — the rhp_cap_audit twin): with
    dedup_simhash_hamming_capped's exact parameters (16-bit, k=1,
    collapse, cap 40) the report surfaces the 3 over-cap block buckets
    (61/47/46 members, 154 signature rows dropped) and how many docs
    every capped candidate pass would leave completely invisible —
    publish it next to any capped simhash result."""
    (docs,) = _t(spark, sf_dir, "documents")
    return dedup.simhash_block_cap_report(docs, bits=16, k=1,
                                          max_block_size=40,
                                          collapse_exact=True)


def _embedding_bucketed_capped_oracle(threshold: float = 0.40) -> str:
    from amundsendatabuilder_spark.functions.vectors import random_planes
    planes = random_planes(64, 64, seed=7)
    return f"""
WITH raw AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
e AS (SELECT min(vec_id) AS vec_id, v FROM raw GROUP BY v),
{_capped_sigs_sql(planes, _CAP_BANDS, _CAP_SIZE)},
cand AS (SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
         FROM csigs x JOIN csigs y
           ON x.band = y.band AND x.sig = y.sig AND x.vec_id < y.vec_id)
SELECT id_a, id_b, round(list_cosine_similarity(a.v, b.v), 6) AS cos
FROM cand JOIN e a ON a.vec_id = cand.id_a
          JOIN e b ON b.vec_id = cand.id_b
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
"""


@query("dedup_embedding_bucketed_capped", _embedding_bucketed_capped_oracle())
def dedup_embedding_bucketed_capped(spark, sf_dir):
    """The embedding near-dup DEFAULT path under the full production
    configuration (13.9x at 10x data uncapped on the replica fixture):
    exact-vector collapse -> 8-bit band signatures -> BINDING
    max_bucket_size=10 -> exact-cosine verify at 0.40 — the same
    collapse/banding/cap triple as mutual_nn_dedup_capped, applied to
    dedup.embedding_near_duplicates itself, oracle-replayed verbatim.
    Pair with rhp_cap_audit (same parameters): no silent caps."""
    from amundsendatabuilder_spark.functions.vectors import random_planes
    (emb,) = _t(spark, sf_dir, "embeddings")
    return dedup.embedding_near_duplicates(
        emb, threshold=0.40, planes=random_planes(64, 64, seed=7),
        bands=_CAP_BANDS, collapse_exact=True, max_bucket_size=_CAP_SIZE)


def _feat_cte(src: str, t: str = "t", h: str = "h", x: str = "x") -> str:
    """Signed-hash feature CTEs (t -> h -> x) replaying
    textops.feature_hashing over ``src`` — name overrides let the
    holdout oracle carry BOTH the train-split and held-out feature
    tables in one query."""
    return (f"{t} AS (SELECT doc_id, unnest(" + _LTOKS_SQL
            + f""") AS tok FROM {src}),
{h} AS (SELECT doc_id, substr(md5(tok), 1, 2) AS bucket,
             CASE WHEN substr(md5(tok), 3, 1) IN
                  ('0','1','2','3','4','5','6','7')
                  THEN 1 ELSE -1 END AS sign
      FROM {t}),
{x} AS MATERIALIZED (SELECT doc_id, bucket, CAST(sum(sign) AS BIGINT) AS val
                   FROM {h} GROUP BY 1, 2 HAVING sum(sign) <> 0)""")


def _logreg_cte(iters: int = 4, lr: float = 0.5, src: str = "documents",
                with_head: bool = True) -> str:
    """WITH-body (through ``w{iters}`` plus the shared x/y CTEs) replaying
    logreg_train's GD rounds — shared by the train oracle, the scoring
    oracle, the calibration oracle, and (with ``src``/``with_head``
    overrides) the end-to-end holdout-AUC oracle."""
    head = (("WITH " if with_head else "") + _feat_cte(src) + f""",
y AS MATERIALIZED (SELECT doc_id,
                          CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
                   FROM {src}),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM {src}),
w0 AS MATERIALIZED (SELECT DISTINCT bucket, CAST(0 AS BIGINT) AS w
                    FROM x)""")
    rounds = []
    for t in range(1, iters + 1):
        prev = f"w{t - 1}"
        rounds.append(f"""
m{t} AS (SELECT x.doc_id, CAST(sum(w.w * x.val) AS BIGINT) AS m_e9
         FROM x JOIN {prev} w USING (bucket) GROUP BY 1),
r{t} AS (SELECT m.doc_id,
                round(1.0 / (1.0 + exp(-CAST(m.m_e9 AS DOUBLE) / 1e9)), 9)
                - y.y AS resid
         FROM m{t} m JOIN y USING (doc_id)),
g{t} AS (SELECT x.bucket,
                CAST(sum(CAST(round(r.resid * CAST(x.val AS DOUBLE) * 1e9,
                                    0) AS BIGINT)) AS BIGINT) AS g
         FROM x JOIN r{t} r USING (doc_id) GROUP BY 1),
w{t} AS MATERIALIZED (
  SELECT w.bucket,
         CAST(w.w - CAST(round(CAST(coalesce(g.g, 0) AS DOUBLE) * {lr}
                               / CAST(nn.n AS DOUBLE), 0) AS BIGINT)
              AS BIGINT) AS w
  FROM {prev} w LEFT JOIN g{t} g USING (bucket) CROSS JOIN nn)""")
    return head + "," + ",".join(rounds)


def _logreg_oracle(iters: int = 4, lr: float = 0.5) -> str:
    """Replay oracle for logreg_train: integer margins, 9dp sigmoids,
    per-row-rounded integer gradients, one identical double update."""
    return _logreg_cte(iters, lr) + f"""
SELECT bucket, round(CAST(w AS DOUBLE) / 1e9, 6) AS weight,
       {iters} AS n_iters
FROM w{iters}"""


def _logreg_score_cte(iters: int = 4, lr: float = 0.5) -> str:
    """Extends ``_logreg_cte`` with the scoring tail CTEs (``sc``):
    1e6-grid integer margins from the 6dp weight table, 0.5 prior for
    featureless docs — logreg_score's arithmetic verbatim."""
    return _logreg_cte(iters, lr) + f""",
w6 AS (SELECT bucket,
              CAST(round(round(CAST(w AS DOUBLE) / 1e9, 6) * 1e6, 0)
                   AS BIGINT) AS w_e6
       FROM w{iters}),
sm AS (SELECT x.doc_id, CAST(sum(w6.w_e6 * x.val) AS BIGINT) AS m_e6
       FROM x JOIN w6 USING (bucket) GROUP BY 1),
sc AS (SELECT d.doc_id,
              round(1.0 / (1.0 + exp(-CAST(coalesce(sm.m_e6, 0)
                    AS DOUBLE) / 1e6)), 6) AS score
       FROM documents d LEFT JOIN sm USING (doc_id))"""


@query("logreg_quality_score", _logreg_score_cte() + """
SELECT doc_id, score FROM sc
""")
def logreg_quality_score_query(spark, sf_dir):
    """The sweep half of the classifier loop (curation.logreg_score over
    curation.logreg_train's weights): order-free 1e6-grid integer
    margins -> 6dp sigmoid scores, 0.5 prior for docs hitting no
    trained bucket. Train and sweep both replayed in the twin."""
    from amundsendatabuilder_spark.operators.curation import (
        logreg_score, logreg_train)
    (docs,) = _t(spark, sf_dir, "documents")
    return logreg_score(docs, logreg_train(docs, iters=4, lr=0.5))


@query("logreg_quality_train", _logreg_oracle())
def logreg_quality_train_query(spark, sf_dir):
    """In-engine logistic-regression quality classifier
    (curation.logreg_train): 4 full-batch GD rounds over
    feature_hashing's 256 signed md5 buckets, label = (lang == 'en');
    weight state is a 256-row 1e9-scaled register, every gradient an
    exact integer sum — the fastText-style filter a corpus pipeline
    trains once and sweeps across the whole corpus."""
    from amundsendatabuilder_spark.operators.curation import logreg_train
    (docs,) = _t(spark, sf_dir, "documents")
    return logreg_train(docs, iters=4, lr=0.5)


@query("score_calibration", _logreg_score_cte() + """
SELECT CAST(least(9, (CAST(round(score * 1e6, 0) AS BIGINT) * 10)
            // 1000000) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(score * 1e6, 0) AS BIGINT)) // count(*)
            AS BIGINT) AS mean_score_ppm,
       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS pos_rate_ppm
FROM sc JOIN documents USING (doc_id)
GROUP BY 1
""")
def score_calibration_query(spark, sf_dir):
    """Reliability table for the in-engine quality classifier
    (profiling.calibration_report over logreg_train -> logreg_score):
    10 equal-width score bins, mean predicted score vs empirical
    positive rate in exact integer ppm — the calibration check a
    pipeline runs before using classifier scores as sampling weights.
    Train, sweep, AND calibration all replayed in the twin."""
    from amundsendatabuilder_spark.operators.curation import (
        logreg_score, logreg_train)
    from amundsendatabuilder_spark.operators.profiling import (
        calibration_report)
    (docs,) = _t(spark, sf_dir, "documents")
    scored = logreg_score(docs, logreg_train(docs, iters=4, lr=0.5))
    labeled = scored.join(
        docs.select("doc_id", (F.col("lang") == "en").alias("y")),
        "doc_id")
    return calibration_report(labeled, "score", "y", n_bins=10)


@query("logreg_weight_explain", _logreg_cte() + """,
tk AS (SELECT doc_id, tok, substr(md5(tok), 1, 2) AS bucket FROM t),
dfx AS (SELECT bucket, tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM tk GROUP BY 1, 2),
rk AS (SELECT bucket, tok, df,
              row_number() OVER (PARTITION BY bucket
                                 ORDER BY df DESC, tok) AS rk
       FROM dfx),
pb AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_tokens_in_bucket,
              array_to_string(list(tok ORDER BY rk) FILTER (rk <= 3), ',')
              AS top_tokens
       FROM rk GROUP BY bucket),
wt AS (SELECT w.bucket, round(CAST(w.w AS DOUBLE) / 1e9, 6) AS weight,
              coalesce(pb.top_tokens, '') AS top_tokens,
              CAST(coalesce(pb.n_tokens_in_bucket, 0) AS BIGINT)
              AS n_tokens_in_bucket
       FROM w4 w LEFT JOIN pb USING (bucket))
SELECT bucket, weight, top_tokens, n_tokens_in_bucket
FROM wt ORDER BY abs(weight) DESC, bucket LIMIT 5
""")
def logreg_weight_explain_query(spark, sf_dir):
    """Classifier interpretability (curation.logreg_explain): the 5
    largest-|weight| hashed buckets mapped back to the tokens that hash
    into them (top-3 by TRUE document frequency — count(DISTINCT doc),
    r11 advice fix) — the why-did-the-filter-score-this table AND the
    hashing-trick collision audit in one pass; train + token mapping
    both replayed in the twin."""
    from amundsendatabuilder_spark.operators.curation import (
        logreg_explain, logreg_train)
    (docs,) = _t(spark, sf_dir, "documents")
    return logreg_explain(docs, logreg_train(docs, iters=4, lr=0.5),
                          top_buckets=5, tokens_per_bucket=3)


@query("mixture_reweight_quality", r"""
WITH t AS (SELECT source AS domain, text, """ + _TOKS_SQL + r""" AS toks
           FROM documents),
q AS (SELECT domain,
             CAST(round(round(
                 least(len(toks) / 100.0, 1.0) * 0.4
                 + CASE WHEN len(toks) > 0
                        THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                             / len(toks) ELSE 0.0 END * 0.4
                 + (1 - CASE WHEN length(text) > 0
                        THEN CAST(length(text) - length(regexp_replace(
                             text, '[.,;:!?''"()]', '', 'g')) AS DOUBLE)
                             / length(text) ELSE 0.0 END) * 0.2, 4)
                 * 1e4, 0) AS BIGINT) AS q4
      FROM t),
per AS (SELECT domain, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(q4) AS BIGINT) AS s4
        FROM q GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n,
               CAST(sum(s4) AS BIGINT) AS s FROM per),
tl AS (SELECT domain, n_docs,
              s4 * 100 // n_docs AS mean_quality_ppm,
              n_docs * 1000000 // n AS base_ppm,
              -- tilt quantized ONCE (e9 = round(exp9 * 1e9)), then a
              -- pure HUGEINT product — exact for any n_docs (the r11
              -- DECIMAL-tilt contract, mirrored from the Spark side)
              n_docs::HUGEINT
              * CAST(round(round(exp(2.0 * CAST(s4 * 100 // n_docs
                                                - s * 100 // n AS DOUBLE)
                                     / 1e6), 9) * 1e9, 0) AS HUGEINT)
              AS t_e9
       FROM per CROSS JOIN tot),
z AS (SELECT CAST(sum(t_e9) AS HUGEINT) AS z FROM tl)
SELECT domain, n_docs,
       CAST(mean_quality_ppm AS BIGINT) AS mean_quality_ppm,
       CAST(base_ppm AS BIGINT) AS base_ppm,
       CAST((t_e9 * 1000000) // z.z AS BIGINT) AS weight_ppm
FROM tl CROSS JOIN z
""")
def mixture_reweight_quality_query(spark, sf_dir):
    """One-shot DoReMi-style exponential-tilt mixture reweighting per
    source (curation.mixture_reweight): size-proportional base weights
    tilted by exp(eta * quality excess vs the corpus mean) and
    renormalized — above-average domains gain share. Integer-ppm means,
    one 9dp transcendental quantized once to a 1e9-scaled integer, then
    DECIMAL/HUGEINT integer products throughout — tilted masses are
    exact for ANY domain size (r11: the old double product left the
    2^53 grid at ~1.2e6 docs/domain)."""
    from amundsendatabuilder_spark.operators.curation import (
        mixture_reweight)
    (docs,) = _t(spark, sf_dir, "documents")
    return mixture_reweight(docs, domain_col="source", eta=2.0)


def _logreg_holdout_oracle(iters: int = 4, lr: float = 0.5) -> str:
    """End-to-end holdout evaluation replay (r10 verdict item #7):
    leakage-safe split -> train on the train split -> score the held-out
    docs -> Mann-Whitney AUC against the true labels — every stage the
    verbatim SQL of its already-certified per-stage oracle, composed
    into ONE query so the quality claim is oracle-pinned end-to-end."""
    return (f"""
WITH RECURSIVE pairs AS ({_lsh_verified_sql()}),
sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs),
reach AS (SELECT a, b FROM sym
          UNION
          SELECT r.a, s.b FROM reach r JOIN sym s ON s.a = r.b
          WHERE s.b <> r.a),
comp AS (SELECT a AS node, least(a, min(b)) AS component
         FROM reach GROUP BY a),
grp AS (SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_key
        FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
spl AS MATERIALIZED (
    SELECT doc_id,
           CASE WHEN CAST('0x' || substr(md5('grp:'
                    || CAST(group_key AS VARCHAR)), 1, 4) AS BIGINT)
                < 52428 THEN 'train' ELSE 'held' END AS split
    FROM grp),
trdocs AS MATERIALIZED (SELECT d.* FROM documents d
                        JOIN spl USING (doc_id)
                        WHERE spl.split = 'train'),
hdocs AS MATERIALIZED (SELECT d.* FROM documents d
                       JOIN spl USING (doc_id)
                       WHERE spl.split <> 'train'),
""" + _logreg_cte(iters, lr, src="trdocs", with_head=False) + ",\n"
        + _feat_cte("hdocs", t="th", h="hh", x="xh") + f""",
w6 AS (SELECT bucket,
              CAST(round(round(CAST(w AS DOUBLE) / 1e9, 6) * 1e6, 0)
                   AS BIGINT) AS w_e6
       FROM w{iters}),
sm AS (SELECT xh.doc_id, CAST(sum(w6.w_e6 * xh.val) AS BIGINT) AS m_e6
       FROM xh JOIN w6 USING (bucket) GROUP BY 1),
sc AS (SELECT d.doc_id, d.lang,
              round(1.0 / (1.0 + exp(-CAST(coalesce(sm.m_e6, 0)
                    AS DOUBLE) / 1e6)), 6) AS score
       FROM hdocs d LEFT JOIN sm USING (doc_id)),
base AS (SELECT CAST(round(score * 1000000, 0) AS BIGINT) AS v,
                CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS ia
         FROM sc),
reg AS (SELECT v, CAST(count(*) AS BIGINT) AS m,
               CAST(sum(ia) AS BIGINT) AS ma
        FROM base GROUP BY 1),
cum AS (SELECT v, m, ma,
               CAST(coalesce(sum(m) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS BIGINT) AS a
        FROM reg),
s AS (SELECT CAST(sum(ma) AS BIGINT) AS n_a,
             CAST(sum(m - ma) AS BIGINT) AS n_b,
             CAST(sum(ma * (2 * a + m + 1)) AS BIGINT) AS r2a
      FROM cum)
SELECT n_a, n_b, r2a - n_a * (n_a + 1) AS u_stat_x2,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN round(CAST(r2a - n_a * (n_a + 1) AS DOUBLE)
                       / (2.0 * CAST(n_a AS DOUBLE)
                          * CAST(n_b AS DOUBLE)), 6) END AS auc
FROM s
""")


@query("uncertainty_sampling", _logreg_score_cte() + """,
mg AS (SELECT d.source, sc.doc_id, sc.score,
              abs(CAST(round(sc.score * 1000000, 0) AS BIGINT) - 500000)
                  AS margin_e6
       FROM sc JOIN documents d USING (doc_id)),
rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY source
                                         ORDER BY margin_e6, doc_id)
                      AS INT) AS rank
       FROM mg)
SELECT source, rank, doc_id, score,
       round(CAST(margin_e6 AS DOUBLE) / 1000000, 6) AS margin
FROM rk WHERE rank <= 5
ORDER BY source, rank
""")
def uncertainty_sampling_query(spark, sf_dir):
    """Active-learning batch selection (curation.uncertainty_sampling
    over curation.logreg_train/score): the 5 documents per source whose
    classifier score sits closest to the 0.5 boundary — the
    margin-sampling set a labeling loop sends for annotation next,
    closing the train -> score -> select-for-labeling cycle beside the
    holdout-AUC evaluation entry. Margins are exact integers on the 6dp
    score grid (|round(score·1e6) − 5e5|), so ranks compare integers
    and ties break by doc_id identically cross-engine. Hash-verified:
    the twin replays the full GD rounds, the 1e6-grid margins, and the
    per-source rank window."""
    from amundsendatabuilder_spark.operators.curation import (
        logreg_train, uncertainty_sampling)
    (docs,) = _t(spark, sf_dir, "documents")
    w = logreg_train(docs, iters=4, lr=0.5)
    return (uncertainty_sampling(docs, w, k=5)
            .orderBy("source", "rank"))


@query("logreg_holdout_auc", _logreg_holdout_oracle())
def logreg_holdout_auc_query(spark, sf_dir):
    """The classifier's REAL evaluation loop as one certified entry
    (r10 verdict item #7): leakage_safe_split (cluster-atomic 80/20 —
    near-dups of a held-out doc can't leak into train) -> logreg_train
    on the train split -> logreg_score on the held-out docs ->
    profiling.rank_auc of the scores against the true (lang == 'en')
    labels. One row (n_a, n_b, u_stat_x2, auc): the end-to-end,
    oracle-pinned answer to "does the trained filter actually separate
    held-out positives from negatives", not a per-stage claim.

    On this synthetic fixture the answer is HONEST near-chance (~0.44
    at sf0.01): the 31-token vocabulary carries almost no lang signal
    out of sample even though train-set separation is easy — exactly
    the overfit-vs-generalize gap this loop exists to expose before a
    filter sweeps 100 TB (the unit tests pin AUC 1.0 on a genuinely
    separable corpus)."""
    from amundsendatabuilder_spark.operators.curation import (
        leakage_safe_split, logreg_score, logreg_train)
    from amundsendatabuilder_spark.operators.dedup import lsh_verified_pairs
    from amundsendatabuilder_spark.operators.profiling import rank_auc
    (docs,) = _t(spark, sf_dir, "documents")
    # r16 (guide §2.4): the split is a map-side projection OF docs, so
    # carrying the payload columns through it (keep=) turns each split
    # side into a corpus FILTER — the old docs ⋈ split joins shuffled
    # the corpus by doc_id twice to re-attach columns the projection
    # already had. Same rows, same columns consumed downstream.
    split = leakage_safe_split(docs, lsh_verified_pairs(docs, threshold=0.7),
                               keep=("text", "lang"))
    train_docs = split.where(F.col("split") == "train")
    held_docs = split.where(F.col("split") != "train")
    w = logreg_train(train_docs, iters=4, lr=0.5)
    scored = logreg_score(held_docs, w)
    lab = (scored.join(held_docs.select("doc_id", "lang"), "doc_id")
           .select("score", F.when(F.col("lang") == "en", "pos")
                   .otherwise("neg").alias("cls")))
    return rank_auc(lab, "score", "cls", "pos", "neg", scale=1_000_000)
