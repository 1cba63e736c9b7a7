"""Column-function unit tests: key templates, scalar transforms, presto
view decode, cross-engine rounding."""

from pyspark.sql import functions as F


def test_key_templates(spark):
    from amundsendatabuilder_spark import keys
    df = spark.createDataFrame(
        [("hive", "gold", "sch", "tbl", "col")],
        "db string, cl string, sc string, tb string, co string")
    row = df.select(
        keys.database_key("db").alias("d"),
        keys.cluster_key("db", "cl").alias("c"),
        keys.schema_key("db", "cl", "sc").alias("s"),
        keys.table_key("db", "cl", "sc", "tb").alias("t"),
        keys.column_key("db", "cl", "sc", "tb", "co").alias("co"),
        keys.description_key(keys.table_key("db", "cl", "sc", "tb")).alias("de"),
        keys.description_key(keys.table_key("db", "cl", "sc", "tb"),
                             F.lit("s3_crawler")).alias("pde"),
    ).collect()[0]
    assert row["d"] == "database://hive"
    assert row["c"] == "hive://gold"
    assert row["s"] == "hive://gold.sch"
    assert row["t"] == "hive://gold.sch/tbl"
    assert row["co"] == "hive://gold.sch/tbl/col"
    assert row["de"] == "hive://gold.sch/tbl/_description"
    assert row["pde"] == "hive://gold.sch/tbl/_s3_crawler_description"


def test_epoch_from_string_failure_yields_zero(spark):
    # reference transformer/timestamp_string_to_epoch.py:40-44: parse
    # failure -> 0
    from amundsendatabuilder_spark.functions.scalars import epoch_from_string
    df = spark.createDataFrame([("2020-01-01T00:00:00",), ("garbage",), (None,)],
                               "ts string")
    vals = [r[0] for r in df.select(epoch_from_string("ts")).collect()]
    assert vals == [1577836800, 0, 0]


def test_literal_replace_not_regex(spark):
    # reference transformer/regex_str_replace_transformer.py:41-42 uses
    # str.replace — '.' must match only a literal dot
    from amundsendatabuilder_spark.functions.scalars import literal_replace
    df = spark.createDataFrame([("a.b c",)], "s string")
    out = df.select(literal_replace(F.col("s"), [(".", "_"), (" ", "")])).collect()[0][0]
    assert out == "a_bc"


def test_template_substitute(spark):
    from amundsendatabuilder_spark.functions.scalars import template_substitute
    df = spark.createDataFrame([("dag1", 7)], "dag string, n int")
    out = df.select(template_substitute(
        "https://x/{dag}/run/{n}", dag="dag", n="n").alias("u")).collect()[0]["u"]
    assert out == "https://x/dag1/run/7"


def test_decode_presto_view(spark):
    # reference extractor/presto_view_metadata_extractor.py:100-115
    import base64
    import json
    payload = base64.b64encode(json.dumps(
        {"columns": [{"name": "c1", "type": "varchar"},
                     {"name": "c2", "type": "bigint"}]}).encode()).decode()
    df = spark.createDataFrame(
        [(f"/* Presto View: {payload} */",)], "view_original_text string")
    from amundsendatabuilder_spark.functions.scalars import decode_presto_view
    cols = df.select(decode_presto_view(F.col("view_original_text"))
                     .alias("cols")).collect()[0]["cols"]
    assert [(c["name"], c["type"]) for c in cols] == [("c1", "varchar"),
                                                      ("c2", "bigint")]


def test_round_half_away_matches_duckdb(spark):
    import duckdb
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    vals = [0.125, -0.125, 2.675, 8285.425, 1.0049999, 123.456789, -7.105]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r[0] for r in df.select(round_half_away("x", 2)).collect()]
    want = [duckdb.sql(f"SELECT round({v!r}::DOUBLE, 2)").fetchone()[0]
            for v in vals]
    assert got == want


def test_normalize_tags(spark):
    from amundsendatabuilder_spark.functions.scalars import normalize_tags
    df = spark.createDataFrame([(" Tag1, TAG2 ,,tag1 ",)], "t string")
    out = df.select(normalize_tags("t")).collect()[0][0]
    assert out == ["tag1", "tag2", "tag1"]
