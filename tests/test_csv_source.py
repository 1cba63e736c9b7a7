"""CSV source tests — the CsvTableColumnExtractor join semantics
(reference: tests/unit/extractor/test_csv_extractor.py is the model)."""

from pyspark.sql import functions as F


def test_tables_nest_columns(tables_df):
    rows = {(r["database"], r["name"], r["description_source"]): r
            for r in tables_df.collect()}
    t1 = rows[("hive", "test_table1", None)]
    assert [c["name"] for c in t1["columns"]] == ["col1", "col2"]
    assert t1["columns"][0]["description"] == "col1 description"
    assert t1["columns"][1]["col_type"] == "bigint"
    assert t1["columns"][1]["badges"] == ["pk", "partition column"]
    assert t1["tags"] == ["tag1", "tag2"]
    assert t1["is_view"] is False


def test_table_without_columns_survives_left_join(spark, tables_df):
    # programmatic-description row has same key; join is left so all 3
    # source rows survive
    assert tables_df.count() == 3


def test_generic_records(spark):
    from amundsendatabuilder_spark.sources.csv_source import from_records
    df = from_records(spark, [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}])
    assert df.count() == 2
    assert set(df.columns) == {"a", "b"}


def test_read_csv_with_quarantine_splits_bad_rows(spark, tmp_path):
    from amundsendatabuilder_spark.sources.csv_source import (
        read_csv_with_quarantine)
    p = tmp_path / "in.csv"
    p.write_text("id,n\n1,10\n2,notanint\n3,30\n")
    good, bad = read_csv_with_quarantine(spark, str(p), "id int, n int")
    assert sorted((r.id, r.n) for r in good.collect()) == [(1, 10), (3, 30)]
    brows = bad.collect()
    assert len(brows) == 1
    assert brows[0].raw_line == "2,notanint"
    assert brows[0].source_file.endswith("in.csv")


def test_read_csv_with_quarantine_clean_file_empty_side_channel(
        spark, tmp_path):
    from amundsendatabuilder_spark.sources.csv_source import (
        read_csv_with_quarantine)
    p = tmp_path / "clean.csv"
    p.write_text("id,n\n1,10\n2,20\n")
    good, bad = read_csv_with_quarantine(spark, str(p), "id int, n int")
    assert good.count() == 2 and bad.count() == 0
