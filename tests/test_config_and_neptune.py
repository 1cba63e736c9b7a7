"""Scoped-config shim, Neptune CSV writer, desired-state edge pre-delete."""

import glob
import json
import os


def test_scoped_config():
    from amundsendatabuilder_spark.config import Scoped
    conf = Scoped({"publisher": {"neo4j": {"transaction_size": 500}},
                   "identifier": "daily"})
    scope = conf.scope("publisher.neo4j")
    assert scope.get("transaction_size") == 500
    assert scope.get("missing", 10) == 10
    assert scope.get("identifier") == "daily"  # unscoped fallback
    merged = Scoped({"a": 1}).with_fallback(Scoped({"a": 2, "b": 3}))
    assert merged.get("a") == 1 and merged.get("b") == 3


def test_neptune_csv_writer(spark, tables_df, tmp_path):
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    from amundsendatabuilder_spark.sinks.neptune_csv import write_neptune_csv
    out = expand_tables(tables_df)
    paths = write_neptune_csv(out, str(tmp_path))
    vcsv = glob.glob(os.path.join(paths["vertices"], "*.csv"))[0]
    header = open(vcsv).readline().strip().split(",")
    assert header[:2] == ["~id", "~label"]
    assert "key:String(single)" in header
    assert "sort_order:Long(single)" in header  # typed via registry
    lines = open(vcsv).read().splitlines()[1:]
    assert any(l.startswith("Table:hive://gold.test_schema/test_table1,Table")
               for l in lines)
    ecsv = glob.glob(os.path.join(paths["edges"], "*.csv"))[0]
    eheader = open(ecsv).readline().strip().split(",")
    assert eheader[:4] == ["~id", "~label", "~from", "~to"]
    # relationship creation_type header is bare String, not String(single)
    # (neptune_serializer.py:38-40)
    assert "creation_type:String" in eheader
    assert "creation_type:String(single)" not in eheader
    # bidirectional: both TYPE and REVERSE_TYPE rows exist
    body = open(ecsv).read()
    assert ",TABLE," in body and ",TABLE_OF," in body
    assert out.rels.count() * 2 == len(body.splitlines()) - 1
    # edge ~id leads with the relationship label then from/to composite ids
    # (neptune_serializer.get_forward_relationship_id :99-107)
    assert any(l.startswith(
        "TABLE:Schema:hive://gold.test_schema_"
        "Table:hive://gold.test_schema/test_table1,")
        for l in body.splitlines()[1:])
    # every edge row carries key:String(single) = its own relation id
    # (neptune_serializer.py:65,76 — same property the vertices carry)
    assert "key:String(single)" in eheader
    id_pos, key_pos = eheader.index("~id"), eheader.index("key:String(single)")
    for line in body.splitlines()[1:]:
        cells = line.split(",")
        assert cells[key_pos] == cells[id_pos]


def test_pre_delete_edges(spark, tables_df, tmp_path):
    from amundsendatabuilder_spark.models.table_metadata import expand_tables
    from amundsendatabuilder_spark.plans.publish import pre_delete_edges
    out = expand_tables(tables_df)
    log = str(tmp_path / "del.jsonl")

    def delete(batch):
        with open(log, "a") as f:
            for row in batch:
                f.write(json.dumps(row) + "\n")

    pre_delete_edges(out.rels, delete, frozenset({"TAGGED_BY"}), batch_size=1)
    rows = [json.loads(l) for l in open(log)]
    assert {r["TYPE"] for r in rows} == {"TAGGED_BY"}
    assert len(rows) == out.rels.where("TYPE = 'TAGGED_BY'").count()
