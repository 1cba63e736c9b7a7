"""API-walk source tests with injected fake clients (the reference mocks
the same boundaries — SURVEY §5)."""

from pyspark.sql import functions as F


def test_glue_pagination_and_flatten(spark):
    from amundsendatabuilder_spark.sources.catalog_apis import glue_tables
    pages = {
        None: ([{"DatabaseName": "db1", "Name": "t1",
                 "StorageDescriptor": {"Columns": [
                     {"Name": "a", "Type": "string", "Comment": "col a"}]},
                 "PartitionKeys": [{"Name": "ds", "Type": "string"}]}], "tok1"),
        "tok1": ([{"DatabaseName": "db1", "Name": "t2",
                   "StorageDescriptor": {"Columns": [
                       {"Name": "b", "Type": "bigint"}]}}], None),
    }
    df = glue_tables(spark, lambda tok: pages[tok])
    rows = df.collect()
    assert len(rows) == 3  # a, ds (partition), b — across 2 pages
    t1 = [r for r in rows if r["name"] == "t1"]
    assert [r["col_name"] for r in t1] == ["a", "ds"]
    assert [r["col_sort_order"] for r in t1] == [0, 1]


def test_cassandra_walk_filters(spark):
    from amundsendatabuilder_spark.sources.catalog_apis import cassandra_tables
    ks = {"system_auth": {"users": [("u", "text")]},
          "app": {"events": [("id", "uuid"), ("ts", "timestamp")],
                  "skipme": [("x", "int")]}}
    df = cassandra_tables(spark, ks, table_filter=lambda k, t: t != "skipme")
    rows = df.collect()
    assert {r["name"] for r in rows} == {"events"}  # system + filtered out
    assert len(rows) == 2


def test_feast_entities_before_features(spark):
    from amundsendatabuilder_spark.sources.catalog_apis import feast_feature_tables
    df = feast_feature_tables(spark, [{
        "name": "driver_stats", "project": "feast",
        "entities": [("driver_id", "INT64")],
        "features": [("trips", "INT64"), ("rating", "FLOAT")]}])
    rows = sorted(df.collect(), key=lambda r: r["col_sort_order"])
    assert [r["col_name"] for r in rows] == ["driver_id", "trips", "rating"]


def test_atlas_field_mapping_spec(spark):
    from amundsendatabuilder_spark.sources.catalog_apis import apply_field_mapping
    entities = [{"attributes": {"name": "tbl1", "popularityScore": 4.2}},
                {"attributes": {"name": "tbl2"}}]
    spec = [("name", "attributes.name", None, None),
            ("popularity", "attributes.popularityScore", lambda v: int(v), 0)]
    rows = {r["name"]: r for r in apply_field_mapping(spark, entities, spec).collect()}
    assert rows["tbl1"]["popularity"] == 4
    assert rows["tbl2"]["popularity"] == 0  # default applied


def test_mode_dashboard_chain(spark):
    from amundsendatabuilder_spark.sources.dashboards import mode_dashboard_chain
    responses = {
        "https://app.mode.com/api/org1/spaces?filter=all": {
            "_embedded": {"spaces": [
                {"token": "sp1", "name": "Space One", "description": "d1"}]}},
        "https://app.mode.com/api/org1/spaces/sp1/reports": {
            "_embedded": {"reports": [
                {"token": "r1", "name": "Report 1", "description": None,
                 "created_at": "2021-02-05T10:00:00Z"}]}},
    }
    df = mode_dashboard_chain(spark, lambda u: responses[u], "org1")
    row = df.collect()[0]
    assert row["product"] == "mode"
    assert row["dashboard_group_id"] == "sp1"
    assert row["dashboard_id"] == "r1"
    assert row["created_timestamp"] == 1612519200
    assert row["dashboard_url"] == "https://app.mode.com/org1/reports/r1"


def test_relational_expansion_and_fk_publish(spark, tables_df, tmp_path):
    import json
    from amundsendatabuilder_spark.models.rds import expand_relational
    from amundsendatabuilder_spark.sinks.jdbc_sink import publish_relational
    tables = expand_relational(tables_df)
    assert set(tables) >= {"database", "cluster", "schema", "table", "column"}
    assert tables["table"].count() == 2
    assert tables["column"].count() == 3
    log = str(tmp_path / "order.jsonl")

    def upsert(name, rows):
        with open(log, "a") as f:
            f.write(json.dumps({"t": name, "n": len(rows)}) + "\n")

    publish_relational(tables, upsert, batch_size=100)
    written = [json.loads(l)["t"] for l in open(log)]
    # FK order: database before cluster before schema before table ...
    assert written.index("database") < written.index("cluster") \
        < written.index("schema") < written.index("table") \
        < written.index("column")


def test_staged_graph_roundtrip_and_match(spark, tables_df, tmp_path):
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    from amundsendatabuilder_spark.sinks.graph_csv import write_graph
    from amundsendatabuilder_spark.sources.graph import match, read_staged_graph
    out = expand_tables(tables_df)
    write_graph(out, str(tmp_path))
    g = read_staged_graph(spark, str(tmp_path))
    assert g.nodes.count() == out.nodes.count()
    assert g.rels.count() == out.rels.count()
    # MATCH (s:Schema)-[:TABLE]->(t:Table)
    m = match(g.nodes, g.rels, start_label="Schema", rel_type="TABLE",
              end_label="Table")
    pairs = {(r["a_key"], r["b_key"]) for r in m.collect()}
    assert ("hive://gold.test_schema",
            "hive://gold.test_schema/test_table1") in pairs
    # OPTIONAL MATCH keeps tag nodes without badges
    opt = match(g.nodes, g.rels, start_label="Table", rel_type="HAS_BADGE",
                end_label="Badge", optional=True)
    assert opt.count() >= 2


def test_delta_catalog_walk(spark):
    from amundsendatabuilder_spark.sources.catalog_apis import delta_lake_tables
    spark.sql("CREATE DATABASE IF NOT EXISTS cat_test")
    spark.sql("CREATE TABLE IF NOT EXISTS cat_test.t1 (id BIGINT, name STRING) USING parquet")
    try:
        df = delta_lake_tables(spark, ["cat_test"])
        rows = [r for r in df.collect() if r["name"] == "t1"]
        assert [r["col_name"] for r in rows] == ["id", "name"]
        assert rows[0]["col_type"] == "bigint"
    finally:
        spark.sql("DROP TABLE IF EXISTS cat_test.t1")
        spark.sql("DROP DATABASE IF EXISTS cat_test")
