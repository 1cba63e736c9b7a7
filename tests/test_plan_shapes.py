"""Physical-plan regression guards for the headline plans: the scale
properties SURVEY.md promises (broadcast star joins, pushed-down scans)
asserted on the executed plan string, so a refactor that silently
degrades a plan fails CI rather than a 100 TB run."""


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_star_join_broadcasts_all_dimensions(spark):
    """TPC-H Q5 shape: every dimension joins as a broadcast — the only
    hash-partitioning exchanges allowed are the fact-side orders join and
    the final groupBy."""
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    plan = _plan(QUERIES["q5_region_volume"](spark, "/root/testdata/sf0.001"))
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("Exchange hashpartitioning") <= 2


def test_scan_filter_project_pushes_down(spark):
    """Filter and projection reach the parquet scan (PushedFilters +
    pruned ReadSchema), so a 100 TB scan reads only matching row groups
    and requested columns."""
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    plan = _plan(QUERIES["scan_filter_project"](spark, "/root/testdata/sf0.001"))
    assert "PushedFilters: [" in plan
    assert "PushedFilters: []" not in plan


def test_lsh_verified_shares_cached_shingles(spark):
    """The tokenize+shingle subtree is cached and read by all four
    consumers (minhash signatures, sizes, both verify-join sides) — the
    executed plan must show the InMemoryTableScans, not re-executed
    shingle pipelines (the round-2 plan had AQE-duplicated branches)."""
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    df = QUERIES["dedup_lsh_verified"](spark, "/root/testdata/sf0.001")
    df.count()  # materialize so the cache fills and AQE finalizes
    plan = _plan(df)
    try:
        assert plan.count("InMemoryTableScan") >= 4
    finally:
        spark.catalog.clearCache()


def test_embedding_bucketed_avoids_nested_loop(spark):
    """The default (bucketed) embedding near-dup path must candidate-join
    on band signatures — never the all-pairs BroadcastNestedLoopJoin that
    only the explicit all_pairs=True escape hatch is allowed to use."""
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    plan = _plan(QUERIES["dedup_embedding_cosine_bucketed"](
        spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_search_doc_flagship_no_cartesian_or_smj(spark):
    """The flagship search-document build stays broadcast+hash: no
    cartesian products, and the per-relation aggregates join back to the
    spine without sort-merge fallbacks at dimension size."""
    from amundsendatabuilder_spark.plans.oracle_suite import QUERIES
    plan = _plan(QUERIES["search_doc_flagship"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
