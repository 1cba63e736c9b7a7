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
