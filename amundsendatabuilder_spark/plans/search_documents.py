"""Search-document builds — the reference's flagship aggregation queries
(extractor/neo4j_search_data_extractor.py:23-115; SQL twins
extractor/mysql_search_data_extractor.py:35-176,320-390) over the engine's
model-input DataFrames.

Output schemas match the ES document models
(models/table_elasticsearch_document.py:14-49,
user_elasticsearch_document.py, dashboard_elasticsearch_document.py).

Plan shape (holds at 100 TB): every 1:N relation is pre-aggregated to one
row per entity key, then LEFT-joined to the entity spine — one shuffle per
relation on the spine key, dimension-sized aggregates broadcast, no row
explosion, no re-aggregation after the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from amundsendatabuilder_spark import keys


def build_table_documents(tables: DataFrame,
                          usage: DataFrame | None = None,
                          last_updated: DataFrame | None = None,
                          schema_descriptions: DataFrame | None = None,
                          badges: DataFrame | None = None,
                          publish_tag: str | None = None) -> DataFrame:
    """Table search documents (reference neo4j query :23-62).

    ``tables``: models/table_metadata.py input (nested columns, tags).
    ``usage``: column_usage rows (table key parts, user_email, read_count).
    ``last_updated``: db, cluster, schema, table_name,
    last_updated_time_epoch. ``schema_descriptions``: schema_key, schema,
    description. ``badges``: badge rows (table key parts, name).
    ``publish_tag`` filters tables to one publish generation — the
    reference's {publish_tag_filter} (:161-175) as a plain predicate.
    """
    t = tables
    if publish_tag is not None and "published_tag" in t.columns:
        t = t.where(F.col("published_tag") == publish_tag)
    t = t.withColumn("key", keys.table_key(
        F.col("database"), F.col("cluster"), F.col("schema"), F.col("name")))

    # columns + their descriptions come free from the nested struct —
    # the reference re-joins Column/Description nodes (:43-47); our input
    # is already nested so it's a projection, not a join
    spine = t.select(
        "key", "database", "cluster", "schema", "name",
        F.format_string("%s.%s", F.col("schema"), F.col("name")).alias("display_name"),
        F.when(F.col("description_source").isNull()
               | (F.col("description_source") == "")
               | (F.col("description_source") == "description"),
               F.col("description")).alias("description"),
        F.when(F.col("description_source").isNotNull()
               & (F.col("description_source") != "")
               & (F.col("description_source") != "description"),
               F.col("description")).alias("_prog_desc"),
        F.coalesce(F.col("tags"), F.array().cast("array<string>")).alias("tags"),
        F.transform(F.coalesce(F.col("columns"), F.array().cast(
            "array<struct<name:string,description:string,col_type:string,"
            "sort_order:int,badges:array<string>>>")),
            lambda c: c["name"]).alias("column_names"),
        F.filter(F.transform(F.coalesce(F.col("columns"), F.array().cast(
            "array<struct<name:string,description:string,col_type:string,"
            "sort_order:int,badges:array<string>>>")),
            lambda c: c["description"]), lambda d: d.isNotNull()).alias("column_descriptions"),
    )
    # programmatic descriptions aggregate across duplicate table rows
    # (reference :31-33 collects them)
    prog = (spine.where(F.col("_prog_desc").isNotNull())
            .groupBy("key")
            .agg(F.array_sort(F.collect_list("_prog_desc"))
                 .alias("programmatic_descriptions")))
    # Deterministic spine winner per key: the reference always takes the
    # default Description node (neo4j_search_data_extractor.py:28-30) and
    # collects programmatic descriptions separately (:31-33), so prefer the
    # default-description row over programmatic rows, then rows with a
    # non-null description, then lexicographic description as a stable
    # tie-break. Window on the same key the downstream joins shuffle on.
    w = Window.partitionBy("key").orderBy(
        F.col("_prog_desc").isNotNull(),   # default-description rows first
        F.col("description").isNull(),     # then rows that carry a description
        F.col("description"))              # stable tie-break
    spine = (spine.withColumn("_rn", F.row_number().over(w))
             .where(F.col("_rn") == 1)
             .drop("_rn", "_prog_desc"))

    if usage is not None:
        u = usage.withColumn("key", keys.table_key(
            F.col("database"), F.col("cluster"), F.col("schema"),
            F.col("table_name")))
        usage_agg = (u.groupBy("key")
                     .agg(F.sum("read_count").cast("long").alias("total_usage"),
                          F.countDistinct("user_email").alias("unique_usage")))
        spine = spine.join(usage_agg, "key", "left")
    else:
        spine = spine.withColumn("total_usage", F.lit(None).cast("long")) \
                     .withColumn("unique_usage", F.lit(None).cast("long"))

    if last_updated is not None:
        lu = last_updated.select(
            keys.table_key(F.col("db"), F.col("cluster"), F.col("schema"),
                           F.col("table_name")).alias("key"),
            F.col("last_updated_time_epoch").alias("last_updated_timestamp"))
        spine = spine.join(F.broadcast(lu.groupBy("key").agg(
            F.max("last_updated_timestamp").alias("last_updated_timestamp"))),
            "key", "left")
    else:
        spine = spine.withColumn("last_updated_timestamp", F.lit(None).cast("long"))

    if schema_descriptions is not None:
        sd = schema_descriptions.select(
            F.col("schema_key"), F.col("description").alias("schema_description"))
        spine = spine.withColumn("_schema_key", keys.schema_key(
            F.col("database"), F.col("cluster"), F.col("schema"))) \
            .join(F.broadcast(sd), F.col("_schema_key") == F.col("schema_key"),
                  "left").drop("schema_key", "_schema_key")
    else:
        spine = spine.withColumn("schema_description", F.lit(None).cast("string"))

    if badges is not None:
        b = badges.withColumn("key", keys.table_key(
            F.col("database"), F.col("cluster"), F.col("schema"),
            F.col("table_name")))
        b = (b.select("key", F.explode(F.split(F.col("name"), ",")).alias("badge"))
             .select("key", F.lower(F.trim("badge")).alias("badge"))
             .where(F.col("badge") != "")
             .groupBy("key").agg(F.array_sort(F.collect_set("badge")).alias("badges")))
        spine = spine.join(F.broadcast(b), "key", "left")
    else:
        spine = spine.withColumn("badges", F.array().cast("array<string>"))

    spine = spine.join(prog, "key", "left")
    return spine.select(
        "database", "cluster", "schema", "name", "key", "display_name",
        "description", "schema_description", "last_updated_timestamp",
        "column_names", "column_descriptions",
        F.coalesce("total_usage", F.lit(0)).alias("total_usage"),
        F.coalesce("unique_usage", F.lit(0)).alias("unique_usage"),
        "tags",
        F.coalesce("badges", F.array().cast("array<string>")).alias("badges"),
        F.coalesce("programmatic_descriptions",
                   F.array().cast("array<string>")).alias("programmatic_descriptions"),
    ).orderBy("name")


def build_user_documents(users: DataFrame,
                         table_usage: DataFrame | None = None,
                         owned_tables: DataFrame | None = None,
                         followed: DataFrame | None = None) -> DataFrame:
    """User search documents (reference :64-83; the 6-grouped-subquery SQL
    twin mysql_search_data_extractor.py:320-390): per-relation grouped
    aggregates LEFT-joined back to the user spine.

    total_read = SUM(read_count) over READ relations (reference's REDUCE
    over COLLECT(DISTINCT read)). total_own = COUNT(DISTINCT owned table)
    over OWNER_OF relations — ``owned_tables`` carries either a
    ``table_key`` column (one row per (table, owner), distinct-counted) or
    the raw comma-separated ``owners`` string per table row, which is
    exploded; rows are per-table so the count is distinct tables either
    way. total_follow = COUNT(DISTINCT followed entity) over FOLLOWED_BY
    relations (``followed``: email + entity_key)
    (models/user_elasticsearch_document.py:40-41).

    Field parity with the reference document
    (models/user_elasticsearch_document.py:16-38): ``full_name`` keeps
    the reference's name (not renamed), ``is_active`` is carried from
    the spine when present and defaults to true otherwise (the
    reference cypher reads ``user.is_active``,
    neo4j_search_data_extractor.py:77), and users with a null
    ``full_name`` are dropped per the reference's
    ``where user.full_name is not null`` (:73).
    """
    is_active = (F.col("is_active").cast("boolean")
                 if "is_active" in users.columns
                 else F.lit(True))
    spine = users.where(F.col("full_name").isNotNull()).select(
        F.col("email"), F.col("first_name"), F.col("last_name"),
        F.col("full_name"),
        F.col("github_username"), F.col("team_name"), F.col("employee_type"),
        F.col("manager_email"), F.col("slack_id"),
        is_active.alias("is_active"), F.col("role_name"),
    )
    if table_usage is not None:
        u = (table_usage.groupBy("user_email")
             .agg(F.sum("read_count").cast("long").alias("total_read")))
        spine = spine.join(
            u.select(F.col("user_email").alias("email"), "total_read"),
            "email", "left")
    else:
        spine = spine.withColumn("total_read", F.lit(None).cast("long"))
    if owned_tables is not None:
        if "table_key" in owned_tables.columns:
            pairs = owned_tables.select(
                F.lower(F.trim(F.col("email"))).alias("email"), "table_key")
        else:
            pairs = (owned_tables
                     .withColumn("table_key",
                                 F.monotonically_increasing_id().cast("string"))
                     .select(F.explode(F.split(F.col("owners"), ",")).alias("email"),
                             "table_key")
                     .select(F.lower(F.trim("email")).alias("email"), "table_key"))
        o = (pairs.where(F.col("email") != "")
             .groupBy("email")
             .agg(F.countDistinct("table_key").cast("long").alias("total_own")))
        spine = spine.join(F.broadcast(o), "email", "left")
    else:
        spine = spine.withColumn("total_own", F.lit(None).cast("long"))
    if followed is not None:
        fo = (followed
              .select(F.lower(F.trim(F.col("email"))).alias("email"), "entity_key")
              .where(F.col("email") != "")
              .groupBy("email")
              .agg(F.countDistinct("entity_key").cast("long").alias("total_follow")))
        spine = spine.join(F.broadcast(fo), "email", "left")
    else:
        spine = spine.withColumn("total_follow", F.lit(None).cast("long"))
    return (spine
            .withColumn("total_read", F.coalesce("total_read", F.lit(0)))
            .withColumn("total_own", F.coalesce("total_own", F.lit(0)))
            .withColumn("total_follow", F.coalesce("total_follow", F.lit(0)))
            .orderBy("email"))


def build_dashboard_documents(dashboards: DataFrame,
                              usage: DataFrame | None = None,
                              queries: DataFrame | None = None,
                              last_exec: DataFrame | None = None,
                              charts: DataFrame | None = None,
                              tags: DataFrame | None = None,
                              badges: DataFrame | None = None) -> DataFrame:
    """Dashboard search documents (reference :85-115,
    models/dashboard_elasticsearch_document.py:16-47): group/dashboard
    names + aggregated usage + query names + last successful run, with the
    '_last_successful_execution' first-match rule
    (mysql_search_data_extractor.py:284-286); plus the reference's
    chart_names (via HAS_QUERY->HAS_CHART, neo4j query :97-99), tags
    (tag_type='default' filter, :101-103), badges (:104-106),
    group_description and uri (:107-115).

    ``charts``: dashboard key parts + chart_name. ``tags``: dashboard key
    parts + tag (+ optional tag_type, filtered to 'default' as the
    reference does). ``badges``: dashboard key parts + badge. Each 1:N
    relation pre-aggregates to one sorted-distinct array per dashboard
    key before the broadcast LEFT join — no row explosion on the spine.
    """
    d = dashboards.withColumn("key", keys.dashboard_key(
        F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
        F.col("dashboard_id")))
    group_desc = (F.col("dashboard_group_description")
                  if "dashboard_group_description" in dashboards.columns
                  else F.lit(None).cast("string"))
    spine = d.select(
        "key", "product", "cluster",
        F.col("dashboard_group").alias("group_name"),
        F.col("dashboard_name").alias("name"),
        F.col("description"),
        F.coalesce(group_desc, F.lit("")).alias("group_description"),
        F.col("dashboard_group_url").alias("group_url"),
        F.col("dashboard_url").alias("url"),
        F.col("key").alias("uri"))
    if usage is not None:
        u = usage.withColumn("key", keys.dashboard_key(
            F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
            F.col("dashboard_id")))
        spine = spine.join(
            u.groupBy("key").agg(F.sum("view_count").cast("long")
                                 .alias("total_usage")), "key", "left")
    else:
        spine = spine.withColumn("total_usage", F.lit(None).cast("long"))
    if queries is not None:
        q = queries.withColumn("key", keys.dashboard_key(
            F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
            F.col("dashboard_id")))
        spine = spine.join(
            F.broadcast(q.groupBy("key").agg(
                F.array_sort(F.collect_set("query_name")).alias("query_names"))),
            "key", "left")
    else:
        spine = spine.withColumn("query_names", F.array().cast("array<string>"))
    if charts is not None:
        c = charts.withColumn("key", keys.dashboard_key(
            F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
            F.col("dashboard_id")))
        spine = spine.join(
            F.broadcast(c.where(F.col("chart_name").isNotNull())
                        .groupBy("key").agg(
                            F.array_sort(F.collect_set("chart_name"))
                            .alias("chart_names"))),
            "key", "left")
    else:
        spine = spine.withColumn("chart_names", F.array().cast("array<string>"))
    if tags is not None:
        tg = tags
        if "tag_type" in tg.columns:  # reference: WHERE tags.tag_type='default'
            tg = tg.where(F.col("tag_type") == "default")
        tg = tg.withColumn("key", keys.dashboard_key(
            F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
            F.col("dashboard_id")))
        spine = spine.join(
            F.broadcast(tg.groupBy("key").agg(
                F.array_sort(F.collect_set("tag")).alias("tags"))),
            "key", "left")
    else:
        spine = spine.withColumn("tags", F.array().cast("array<string>"))
    if badges is not None:
        b = badges.withColumn("key", keys.dashboard_key(
            F.col("product"), F.col("cluster"), F.col("dashboard_group_id"),
            F.col("dashboard_id")))
        spine = spine.join(
            F.broadcast(b.groupBy("key").agg(
                F.array_sort(F.collect_set("badge")).alias("badges"))),
            "key", "left")
    else:
        spine = spine.withColumn("badges", F.array().cast("array<string>"))
    if last_exec is not None:
        le = (last_exec
              .where(F.col("execution_id") == "_last_successful_execution")
              .withColumn("key", keys.dashboard_key(
                  F.col("product"), F.col("cluster"),
                  F.col("dashboard_group_id"), F.col("dashboard_id")))
              .select("key", F.col("execution_timestamp")
                      .alias("last_successful_run_timestamp")))
        spine = spine.join(F.broadcast(le), "key", "left")
    else:
        spine = spine.withColumn("last_successful_run_timestamp",
                                 F.lit(None).cast("long"))
    empty = F.array().cast("array<string>")
    return (spine
            .withColumn("total_usage", F.coalesce("total_usage", F.lit(0)))
            .withColumn("query_names", F.coalesce("query_names", empty))
            .withColumn("chart_names", F.coalesce("chart_names", empty))
            .withColumn("tags", F.coalesce("tags", empty))
            .withColumn("badges", F.coalesce("badges", empty))
            .orderBy("name"))
