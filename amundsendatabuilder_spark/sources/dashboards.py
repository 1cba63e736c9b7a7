"""Dashboard-platform source chains (reference:
extractor/dashboard/mode_analytics/*, tableau/*, redash/*): each platform
extractor is a RestApiQuery chain + ChainedTransformer. Here a chain is a
seed DataFrame piped through ``rest_api_join`` hops and column transforms
— the 1:N nested-loop join semantics live in sources/rest.py; this module
contributes the canonical chain compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.scalars import epoch_from_string
from amundsendatabuilder_spark.sources.rest import JsonFetch, rest_api_join


def mode_dashboard_chain(spark: SparkSession, fetch: JsonFetch,
                         organization: str) -> DataFrame:
    """Mode dashboards (reference:
    extractor/dashboard/mode_analytics/mode_dashboard_extractor.py:38-109):
    spaces -> reports per space, then the ChainedTransformer steps
    (timestamp->epoch, URL template, dict->model) as column transforms.

    Returns the models/dashboard.py DashboardMetadata input schema.
    """
    seeds = spark.createDataFrame([(organization,)], "organization string")
    spaces = rest_api_join(
        seeds, "https://app.mode.com/api/{organization}/spaces?filter=all",
        "_embedded.spaces.[*]", ["token", "name", "description"], fetch)
    spaces = (spaces.withColumnRenamed("token", "dashboard_group_id")
              .withColumnRenamed("name", "dashboard_group")
              .withColumnRenamed("description", "dashboard_group_description"))
    reports = rest_api_join(
        spaces,
        "https://app.mode.com/api/{organization}/spaces/{dashboard_group_id}/reports",
        "_embedded.reports.[*]",
        ["token", "name", "description", "created_at"], fetch)
    return reports.select(
        F.lit("mode").alias("product"),
        F.lit("gold").alias("cluster"),
        "dashboard_group", "dashboard_group_id",
        "dashboard_group_description",
        F.format_string("https://app.mode.com/%s/spaces/%s",
                        F.col("organization"), F.col("dashboard_group_id"))
        .alias("dashboard_group_url"),
        F.col("name").alias("dashboard_name"),
        F.col("token").alias("dashboard_id"),
        F.col("description"),
        # ChainedTransformer step: ISO timestamp -> epoch
        # (reference mode_dashboard_extractor.py:63-78)
        epoch_from_string(F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        .alias("created_timestamp"),
        F.format_string("https://app.mode.com/%s/reports/%s",
                        F.col("organization"), F.col("token"))
        .alias("dashboard_url"),
    )


def tableau_metadata_query(spark: SparkSession,
                           graphql_post: "callable", query: str) -> DataFrame:
    """Tableau metadata-API GraphQL (reference:
    extractor/dashboard/tableau/tableau_dashboard_utils.py:68-111): POST a
    GraphQL query, iterate the JSON result into a DataFrame. The transport
    is injected; pagination loops live in the caller-provided function."""
    payload = graphql_post(query)
    records = []
    data = payload.get("data", {}) if isinstance(payload, dict) else {}
    for _, items in data.items():
        if isinstance(items, list):
            records.extend(i for i in items if isinstance(i, dict))
    if not records:
        return spark.createDataFrame([], "id string")
    return spark.createDataFrame(records)  # type: ignore[arg-type]


def redash_dashboards(spark: SparkSession, fetch: JsonFetch,
                      base_url: str) -> DataFrame:
    """Redash dashboard list (reference:
    extractor/dashboard/redash/redash_dashboard_extractor.py): page-number
    pagination then model reshape."""
    from amundsendatabuilder_spark.sources.rest import paginated_fetch
    records = paginated_fetch(fetch, base_url + "/api/dashboards?page={page}",
                              max_record_size=25)
    if not records:
        return spark.createDataFrame(
            [], "dashboard_id string, dashboard_name string, created_timestamp long")
    df = spark.createDataFrame(records)  # type: ignore[arg-type]
    cols = set(df.columns)
    return df.select(
        F.col("id").cast("string").alias("dashboard_id"),
        (F.col("name") if "name" in cols else F.lit(None)).alias("dashboard_name"),
        (epoch_from_string(F.col("created_at"), "yyyy-MM-dd'T'HH:mm:ss")
         if "created_at" in cols else F.lit(0)).alias("created_timestamp"))
