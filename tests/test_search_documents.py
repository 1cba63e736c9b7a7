"""Flagship search-document plan tests against the catalog fixtures —
field-level parity with models/table_elasticsearch_document.py:14-49."""

import os

from tests.conftest import FIXTURES


def _csv(spark, name):
    from amundsendatabuilder_spark.sources.csv_source import read_csv
    return read_csv(spark, os.path.join(FIXTURES, name))


def test_table_documents(spark, tables_df):
    from amundsendatabuilder_spark.plans.search_documents import build_table_documents
    docs = build_table_documents(
        tables_df,
        usage=_csv(spark, "sample_column_usage.csv"),
        last_updated=_csv(spark, "sample_table_last_updated.csv"),
        schema_descriptions=_csv(spark, "sample_schema_description.csv"),
        badges=_csv(spark, "sample_badges.csv"),
    )
    rows = {r["key"]: r for r in docs.collect()}
    t1 = rows["hive://gold.test_schema/test_table1"]
    assert t1["display_name"] == "test_schema.test_table1"
    # deterministic spine winner: the default-description row beats the
    # programmatic (s3_crawler) duplicate — description and tags must come
    # from the default row every run (reference always takes the default
    # Description node; ADVICE r1 medium finding)
    assert t1["description"] == "1st test table"
    assert sorted(t1["tags"]) == ["tag1", "tag2"]
    assert t1["column_names"] == ["col1", "col2"]
    assert t1["column_descriptions"] == ["col1 description"]
    assert t1["total_usage"] == 15
    assert t1["unique_usage"] == 2
    assert t1["last_updated_timestamp"] == 1600000000
    assert t1["schema_description"] == "test schema description"
    assert sorted(t1["badges"]) == ["beta", "deprecated"]
    assert t1["programmatic_descriptions"] == ["1st test table programmatic"]
    t2 = rows["dynamo://gold.test_schema/test_table2"]
    assert t2["total_usage"] == 7 and t2["unique_usage"] == 1
    assert t2["badges"] == [] and t2["schema_description"] is None


def test_user_documents(spark):
    from amundsendatabuilder_spark.plans.search_documents import build_user_documents
    # total_own = COUNT(DISTINCT owned table), total_follow =
    # COUNT(DISTINCT followed entity) — reference count(distinct b)/(c)
    # (neo4j_search_data_extractor.py:80-82)
    owned = spark.createDataFrame(
        [("alice@example.com", "hive://gold.s/t1"),
         ("alice@example.com", "hive://gold.s/t1"),   # duplicate relation
         ("Alice@Example.com ", "hive://gold.s/t2"),  # case/space-normalized
         ("bob@example.com", "hive://gold.s/t1")],
        "email string, table_key string")
    followed = spark.createDataFrame(
        [("alice@example.com", "hive://gold.s/t3"),
         ("carol@example.com", "hive://gold.s/t1"),
         ("carol@example.com", "hive://gold.s/t2")],
        "email string, entity_key string")
    docs = build_user_documents(
        _csv(spark, "sample_user.csv"),
        table_usage=_csv(spark, "sample_column_usage.csv"),
        owned_tables=owned, followed=followed)
    rows = {r["email"]: r for r in docs.collect()}
    assert rows["alice@example.com"]["total_read"] == 17
    assert rows["bob@example.com"]["total_read"] == 5
    assert rows["carol@example.com"]["total_read"] == 0
    assert rows["alice@example.com"]["total_own"] == 2
    assert rows["bob@example.com"]["total_own"] == 1
    assert rows["carol@example.com"]["total_own"] == 0
    assert rows["alice@example.com"]["total_follow"] == 1
    assert rows["carol@example.com"]["total_follow"] == 2
    assert rows["bob@example.com"]["total_follow"] == 0


def test_dashboard_documents(spark):
    from amundsendatabuilder_spark.plans.search_documents import build_dashboard_documents
    keyparts = ("product string, cluster string, dashboard_group_id string, "
                "dashboard_id string, ")
    charts = spark.createDataFrame(
        [("mode", "gold", "grp1", "d1", "Revenue"),
         ("mode", "gold", "grp1", "d1", "Orders"),
         ("mode", "gold", "grp1", "d1", "Revenue")],  # distinct-collected
        keyparts + "chart_name string")
    tags = spark.createDataFrame(
        [("mode", "gold", "grp1", "d1", "finance", "default"),
         ("mode", "gold", "grp1", "d1", "hidden", "badge")],  # filtered out
        keyparts + "tag string, tag_type string")
    badges = spark.createDataFrame(
        [("mode", "gold", "grp1", "d2", "golden")],
        keyparts + "badge string")
    docs = build_dashboard_documents(
        _csv(spark, "sample_dashboard_base.csv"),
        last_exec=_csv(spark, "sample_dashboard_last_execution.csv"),
        charts=charts, tags=tags, badges=badges)
    rows = {r["key"]: r for r in docs.collect()}
    d1 = rows["mode_dashboard://gold.grp1/d1"]
    # picks _last_successful_execution, not _last_execution (reference
    # mysql_search_data_extractor.py:284-286)
    assert d1["last_successful_run_timestamp"] == 1600000500
    assert rows["mode_dashboard://gold.grp1/d2"]["last_successful_run_timestamp"] is None
    # reference field parity (models/dashboard_elasticsearch_document.py:16-47)
    assert d1["uri"] == "mode_dashboard://gold.grp1/d1"
    assert d1["group_description"] == "group a desc"
    assert d1["chart_names"] == ["Orders", "Revenue"]
    assert d1["tags"] == ["finance"]  # tag_type='default' only
    assert d1["badges"] == []
    d2 = rows["mode_dashboard://gold.grp1/d2"]
    assert d2["chart_names"] == [] and d2["tags"] == []
    assert d2["badges"] == ["golden"]
