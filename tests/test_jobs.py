"""CatalogJob composition tests (the DefaultJob.launch analog)."""

import pytest


def test_job_compose_stage_and_finalize(spark, tables_df, tmp_path):
    from amundsendatabuilder_spark.jobs import CatalogJob
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    finalized = []
    job = (CatalogJob(spark, publish_tag="t1", epoch_ms=1700000000000)
           .add(expand_tables(tables_df))
           .on_success(lambda: finalized.append(True)))
    summary = job.run(stage_dir=str(tmp_path / "g"))
    assert summary["status"] == "success"
    assert summary["nodes"] > 0 and summary["rels"] > 0
    assert finalized == [True]
    # every node carries the tag
    tagged = job.graph().nodes.where(
        "props['published_tag'] = 't1'").count()
    assert tagged == summary["nodes"]


def test_job_validation_failure_skips_finalizers(spark):
    from amundsendatabuilder_spark.jobs import CatalogJob
    from amundsendatabuilder_spark.models.base import GraphOutput, _empty_rels
    # lowercase label violates the reference's istitle() check
    bad_nodes = spark.createDataFrame(
        [("k1", "badlabel", {})], "KEY string, LABEL string, props map<string,string>")
    finalized = []
    job = (CatalogJob(spark, publish_tag="t2")
           .add(GraphOutput(bad_nodes, _empty_rels(spark)))
           .on_success(lambda: finalized.append(True)))
    with pytest.raises(ValueError, match="node_label_not_title"):
        job.run()
    assert finalized == []


def test_chained_fanout_ordering(spark):
    """The reference's integration scenario (tests/integration/
    test_chained_trainsformers_task.py:48-80): a chain of fan-out ->
    noop -> duplicate transformers must emit, per input record,
    [table, table, owner, owner] in order. The pull loop's stream order
    becomes explicit position columns (SURVEY §7.4: reproduce 1->N
    ordering as flatMap with position indices)."""
    from pyspark.sql import functions as F
    data = spark.createDataFrame([(1, "db1"), (2, "db2")], "rec long, db string")
    fanout = data.select(
        "rec", "db",
        F.posexplode(F.array(F.lit("table"), F.lit("owner")))
        .alias("yield_idx", "kind"))
    noop = fanout
    duplicated = noop.select(
        "rec", "db", "yield_idx", "kind",
        F.explode(F.array(F.lit(0), F.lit(1))).alias("dup_idx"))
    rows = duplicated.orderBy("rec", "yield_idx", "dup_idx").collect()
    assert [(r.rec, r.kind) for r in rows] == [
        (1, "table"), (1, "table"), (1, "owner"), (1, "owner"),
        (2, "table"), (2, "table"), (2, "owner"), (2, "owner")]
    # filter stage (transform -> None) drops records without disturbing order
    filtered = duplicated.where(F.col("kind") != "owner")
    assert filtered.count() == 4


def test_golden_end_to_end_reference_sample_scenario(spark, tmp_path,
                                                     fixtures_dir):
    """The reference's golden scenario as ONE test (r9 verdict item #8):
    example/scripts/sample_data_loader.py:78-107 runs CSV -> model
    expansion -> staged graph publish -> search documents over the
    reference's own example/sample_data CSVs (copied verbatim to
    tests/fixtures/reference_sample_data). Every pinned count traces to
    those CSVs: 5 tables, 11 columns, 4 directory users, 13 distinct
    usage readers, 17 descriptions (5 table + 11 column + 1 schema),
    15 usage edges, and 5 DISTINCT lineage edges (the file carries a
    duplicate view1->table4 row the MERGE semantics must collapse)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "sample_job", os.path.join(os.path.dirname(fixtures_dir),
                                   "..", "example", "sample_job.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fx = os.path.join(fixtures_dir, "reference_sample_data")
    out = str(tmp_path / "golden")
    got = mod.main(out, fx)
    assert got["status"] == "success"
    assert got == {"nodes": 72, "rels": 79, "table_docs": 5,
                   "user_docs": 4, "status": "success"}

    def shard_rows(kind, prefix):
        import glob
        (d,) = [p for p in glob.glob(f"{out}/graph/{kind}/{prefix}_*")]
        rows = 0
        for f in glob.glob(f"{d}/part*.csv"):
            with open(f) as fh:
                rows += max(0, sum(1 for _ in fh) - 1)
        return rows

    assert shard_rows("nodes", "Table") == 5          # sample_table.csv
    assert shard_rows("nodes", "Column") == 11        # sample_col.csv
    assert shard_rows("nodes", "Description") == 17   # 5 + 11 + 1
    assert shard_rows("nodes", "Watermark") == 4      # sample_watermark
    assert shard_rows("rels", "Table_COLUMN_Column") == 11
    assert shard_rows("rels", "Table_READ_BY_User") == 15
    assert shard_rows("rels", "Table_HAS_DOWNSTREAM_Table") == 5  # dedup
    assert shard_rows("rels", "Schema_TABLE_Table") == 5


def test_golden_dashboard_family_reference_sample_data(spark, tmp_path,
                                                       fixtures_dir):
    """Golden scenario #2 over the reference's own sample_data CSVs:
    the dashboard family plus applications / source / table owners /
    column lineage — the sample_data_loader jobs the first golden test
    doesn't reach. Pinned counts trace to the CSVs: 4 dashboards in 3
    groups, 4 executions, 2 queries, 2 modified timestamps; 3
    DASHBOARD_WITH_TABLE edges (one row explodes a 2-table list), 3
    column-lineage edges, 2 owner edges per entity kind (the dynamo
    owner row is blank and must drop)."""
    import os

    from amundsendatabuilder_spark.jobs import CatalogJob
    from amundsendatabuilder_spark.models.dashboard import (
        expand_dashboard_executions, expand_dashboard_last_modified,
        expand_dashboard_owners, expand_dashboard_queries,
        expand_dashboard_tables, expand_dashboard_usage,
        expand_dashboards)
    from amundsendatabuilder_spark.models.misc import (
        expand_applications, expand_column_lineage, expand_table_owners,
        expand_table_source)
    from amundsendatabuilder_spark.sources.csv_source import read_csv
    fx = os.path.join(fixtures_dir, "reference_sample_data")
    job = CatalogJob(spark, publish_tag="golden2")
    job.add(expand_dashboards(
        read_csv(spark, f"{fx}/sample_dashboard_base.csv")))
    job.add(expand_dashboard_owners(
        read_csv(spark, f"{fx}/sample_dashboard_owner.csv")))
    job.add(expand_dashboard_usage(
        read_csv(spark, f"{fx}/sample_dashboard_usage.csv")))
    job.add(expand_dashboard_queries(
        read_csv(spark, f"{fx}/sample_dashboard_query.csv")))
    job.add(expand_dashboard_executions(
        read_csv(spark, f"{fx}/sample_dashboard_last_execution.csv")))
    job.add(expand_dashboard_last_modified(
        read_csv(spark, f"{fx}/sample_dashboard_last_modified.csv")))
    job.add(expand_dashboard_tables(
        read_csv(spark, f"{fx}/sample_dashboard_table.csv"), spark))
    job.add(expand_applications(
        read_csv(spark, f"{fx}/sample_application.csv")))
    job.add(expand_table_source(
        read_csv(spark, f"{fx}/sample_source.csv")))
    job.add(expand_table_owners(
        read_csv(spark, f"{fx}/sample_table_owner.csv")))
    job.add(expand_column_lineage(
        read_csv(spark, f"{fx}/sample_column_lineage.csv"), spark))
    out = str(tmp_path / "golden2")
    s = job.run(stage_dir=f"{out}/graph")
    assert (s["nodes"], s["rels"], s["status"]) == (27, 33, "success")

    def shard_rows(kind, prefix):
        import glob
        (d,) = glob.glob(f"{out}/graph/{kind}/{prefix}_*")
        rows = 0
        for f in glob.glob(f"{d}/part*.csv"):
            with open(f) as fh:
                rows += max(0, sum(1 for _ in fh) - 1)
        return rows

    assert shard_rows("nodes", "Dashboard") == 4
    assert shard_rows("nodes", "Dashboardgroup") == 3
    assert shard_rows("nodes", "Execution") == 4
    assert shard_rows("nodes", "Query") == 2
    assert shard_rows("rels", "Dashboard_DASHBOARD_WITH_TABLE_Table") == 3
    assert shard_rows("rels", "Column_HAS_DOWNSTREAM_Column") == 3
    assert shard_rows("rels", "User_OWNER_Table") == 2
    assert shard_rows("rels", "User_OWNER_Dashboard") == 2
