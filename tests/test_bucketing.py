"""Bucketed co-located join tests: the fact⋈bridge join must run without an
Exchange on either side when both are bucketed on the join key."""

import pytest

from mondrian_olap_spark.query import Query
from mondrian_olap_spark.sources import engine_from_catalog
from mondrian_olap_spark.sources.bucketing import BucketSpec, materialize_bucketed
from mondrian_olap_spark.tpch import SCHEMA

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_engine(spark):
    mapping = materialize_bucketed(
        spark,
        SF_DIR,
        [BucketSpec("lineitem", "l_orderkey", 8), BucketSpec("orders", "o_orderkey", 8)],
        database="molap_bucketed_test",
        plain_tables=["customer", "nation", "region", "supplier", "part"],
    )
    return engine_from_catalog(spark, SCHEMA, "Sales", mapping)


def test_bucketed_join_is_shuffle_free(spark, bucketed_engine):
    # force the sort-merge path (tiny test data would otherwise broadcast)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            Query(bucketed_engine)
            .columns("[Measures].[Sum Price]")
            .rows("[Time].[Year].Members")
            .execute()
            .df
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
        # the join itself consumes bucketed scans: no Exchange below the
        # partial aggregation (the only exchanges are for the final agg/sort)
        smj = plan[plan.index("SortMergeJoin"):] if "SortMergeJoin" in plan else ""
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "bucketed: true" in plan.lower() or "SelectedBucketsCount" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", adaptive)


def test_bucketed_engine_matches_parquet_engine(spark, bucketed_engine, engine):
    a = (
        Query(bucketed_engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
        .execute()
        .df.collect()
    )
    b = (
        Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
        .execute()
        .df.collect()
    )
    import math

    sa = sorted(map(tuple, a))
    sb = sorted(map(tuple, b))
    assert len(sa) == len(sb)
    for ra, rb in zip(sa, sb):
        assert ra[0] == rb[0]
        # bucketed read sums in a different partition order → last-ulp drift
        assert math.isclose(ra[1], rb[1], rel_tol=1e-9)
