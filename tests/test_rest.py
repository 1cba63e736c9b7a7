"""RestApiQuery join semantics (reference: rest_api/rest_api_query.py;
the reference's tests/unit/rest_api/test_rest_api_query.py is the model)."""

import pytest


def _fake_fetch(responses):
    def fetch(url):
        if url not in responses:
            raise KeyError(url)
        return responses[url]
    return fetch


def test_one_to_n_fanout(spark):
    from amundsendatabuilder_spark.sources.rest import rest_api_join
    seeds = spark.createDataFrame([("s1",), ("s2",)], "space string")
    responses = {
        "https://api/space/s1/reports": {"reports": [{"id": "r1"}, {"id": "r2"}]},
        "https://api/space/s2/reports": {"reports": [{"id": "r3"}]},
    }
    out = rest_api_join(seeds, "https://api/space/{space}/reports",
                        "reports.[*]", ["id"], _fake_fetch(responses))
    rows = sorted((r["space"], r["id"]) for r in out.collect())
    assert rows == [("s1", "r1"), ("s1", "r2"), ("s2", "r3")]


def test_left_vs_skip_semantics(spark):
    from amundsendatabuilder_spark.sources.rest import rest_api_join
    seeds = spark.createDataFrame([("a",), ("b",)], "k string")
    responses = {"u/a": {"items": [{"v": "1"}]}, "u/b": {"items": []}}
    # default: left join — b survives with null v (reference :168-172)
    left = rest_api_join(seeds, "u/{k}", "items.[*]", ["v"],
                         _fake_fetch(responses))
    assert sorted((r["k"], r["v"]) for r in left.collect()) == [
        ("a", "1"), ("b", None)]
    # skip_no_result: inner join (reference :148-150)
    inner = rest_api_join(seeds, "u/{k}", "items.[*]", ["v"],
                          _fake_fetch(responses), skip_no_result=True)
    assert [(r["k"], r["v"]) for r in inner.collect()] == [("a", "1")]


def test_fail_no_result_raises(spark):
    from amundsendatabuilder_spark.sources.rest import rest_api_join
    seeds = spark.createDataFrame([("b",)], "k string")
    out = rest_api_join(seeds, "u/{k}", "items.[*]", ["v"],
                        _fake_fetch({"u/b": {"items": []}}),
                        fail_no_result=True)
    with pytest.raises(Exception):
        out.collect()


def test_retry_then_success(spark):
    from amundsendatabuilder_spark.sources.rest import _retry_fetch
    calls = {"n": 0}

    def flaky(url):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")
        return {"ok": True}

    assert _retry_fetch(flaky, "u", attempts=5, backoff_base=0.0) == {"ok": True}
    assert calls["n"] == 3


def test_paginated_fetch_stops_on_partial_page(spark):
    from amundsendatabuilder_spark.sources.rest import paginated_fetch
    pages = {1: [{"i": n} for n in range(3)],
             2: [{"i": n} for n in range(3)],
             3: [{"i": 99}]}

    def fetch(url):
        page = int(url.rsplit("=", 1)[1])
        return pages.get(page, [])

    out = paginated_fetch(fetch, "u?page={page}", max_record_size=3)
    assert len(out) == 7  # stops after the short page 3


def test_compute_sub_records_and_vs_or():
    """Reference rest_api_query.py:207-250 — AND(,) chunks record-by-record,
    OR(|) strides field-by-field (the docstring's own examples)."""
    from amundsendatabuilder_spark.sources.rest import compute_sub_records
    assert compute_sub_records(
        ["1", "a", "x", "2", "b", "y", "3", "c", "z"],
        ["f1", "f2", "f3"]) == [["1", "a", "x"], ["2", "b", "y"], ["3", "c", "z"]]
    assert compute_sub_records(
        ["1", "2", "3", "a", "b", "c"], ["f1", "f2"],
        json_path_contains_or=True) == [["1", "a"], ["2", "b"], ["3", "c"]]
    with pytest.raises(ValueError):
        compute_sub_records(["1"], [])
