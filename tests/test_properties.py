"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5 notes it has none): cross-engine rounding equivalence,
tag-normalization invariants, Jaccard bounds, key-template injectivity."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sp(spark):
    return spark


# module-scope: one Spark action per example would be too slow, so each
# property collects a batch of examples into ONE DataFrame evaluation.

@settings(max_examples=20, deadline=None)
@given(st.lists(st.floats(min_value=-1e9, max_value=1e9,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=30))
def test_round_half_away_equals_duckdb(sp, xs):
    from amundsendatabuilder_spark.functions.scalars import round_half_away
    df = sp.createDataFrame([(float(x),) for x in xs], "x double")
    got = [r[0] for r in df.select(round_half_away("x", 2)).collect()]
    con = duckdb.connect()
    want = [con.execute("SELECT round(?::DOUBLE, 2)", [float(x)]).fetchone()[0]
            for x in xs]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="aAbB ,\t", max_size=12), min_size=1, max_size=8))
def test_normalize_tags_invariants(sp, raws):
    from amundsendatabuilder_spark.functions.scalars import normalize_tags
    df = sp.createDataFrame([(",".join(raws),)], "t string")
    out = df.select(normalize_tags("t")).collect()[0][0]
    for tag in out:
        assert tag == tag.lower() == tag.strip()
        assert tag != ""
        assert "," not in tag


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 1000),
                          st.lists(st.sampled_from(["a", "b", "c", "d", "e"]),
                                   min_size=3, max_size=12)),
                min_size=2, max_size=6, unique_by=lambda t: t[0]))
def test_jaccard_bounds_and_symmetry_inputs(sp, docs):
    from amundsendatabuilder_spark.operators.dedup import ngram_jaccard_pairs
    df = sp.createDataFrame([(i, " ".join(words)) for i, words in docs],
                            "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, threshold=0.0).collect()
    for r in pairs:
        assert 0.0 <= r["jaccard"] <= 1.0
        assert r["doc_a"] < r["doc_b"]


def test_key_template_injective(sp):
    # distinct (db,cluster,schema,table) quadruples -> distinct keys
    from amundsendatabuilder_spark import keys
    rows = [("h", "g", "s", "t"), ("h", "g", "s.t", ""), ("h", "g.s", "", "t"),
            ("hive", "gold", "sch", "tbl")]
    df = sp.createDataFrame(rows, "db string, cl string, sc string, tb string")
    out = [r[0] for r in df.select(
        keys.table_key("db", "cl", "sc", "tb")).collect()]
    assert len(set(out)) == len(out)
