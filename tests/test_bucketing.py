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


def test_fingerprinted_corpus_curation_is_shuffle_free(spark):
    """A corpus laid out by write_fingerprinted (bucketed+sorted on the
    precomputed fingerprint) curates with ZERO Exchange — the dedup
    aggregate reads co-located buckets — and yields exactly the rows the
    unbucketed path yields."""
    import re

    from mondrian_olap_spark.operators import pipeline as pl
    from mondrian_olap_spark.star import read_parquet_table

    from .conftest import SF_DIR

    docs = read_parquet_table(spark, f"{SF_DIR}/documents.parquet")
    base = pl.curate_corpus(docs, split_weights={"train": 0.9, "val": 0.1})
    want = sorted(
        (r.doc_id, r.dup_count, r.split)
        for r in base.select("doc_id", "dup_count", "split").collect()
    )

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # buckets ≥ defaultParallelism, as a real deployment would size
        # them — otherwise the explode-guard repartition fires on the
        # (deliberately) under-parallel bucketed scan
        fpd = pl.write_fingerprinted(
            spark, docs, table="molap_corpus_test.documents_fp", buckets=64
        )
        cur = pl.curate_corpus(
            fpd,
            split_weights={"train": 0.9, "val": 0.1},
            fingerprint_col="fingerprint",
        )
        plan = cur._jdf.queryExecution().executedPlan().toString()
        assert re.findall(r"Exchange \w+[Pp]artitioning", plan) == []
        assert "SelectedBucketsCount" in plan
        got = sorted(
            (r.doc_id, r.dup_count, r.split)
            for r in cur.select("doc_id", "dup_count", "split").collect()
        )
        assert got == want and len(got) > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_partitioned_fact_pruning_and_layout_parity(spark):
    """Date-partitioned fact layout (tpch.partitioned_fact_engines): a
    degenerate time slicer prunes statically (PartitionFilters), a
    filtered dim table joined on the partition column plans DPP, and
    both layouts return bit-identical answers."""
    import re as _re

    from mondrian_olap_spark.query import Query
    from mondrian_olap_spark.tpch import partitioned_fact_engines

    part_eng, flat_eng = partitioned_fact_engines(
        spark, "/root/testdata/sf0.001"
    )

    def year_slice(eng):
        return (
            Query(eng)
            .columns("[Measures].[Sum Qty]")
            .rows("[ReturnFlag].children")
            .where("[Time].[1995]")
            .execute()
            .df
        )

    dfp = year_slice(part_eng)
    plan = dfp._jdf.queryExecution().executedPlan().toString()
    assert _re.search(r"PartitionFilters: \[[^\]]*o_year[^\]]*1995", plan)
    # the flat layout pushes the same predicate as a row filter instead
    dff = year_slice(flat_eng)
    flat_plan = dff._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_year), EqualTo(o_year,1995)" in (
        flat_plan
    ) or "EqualTo(o_year,1995)" in flat_plan
    assert sorted(map(tuple, dfp.collect())) == sorted(
        map(tuple, dff.collect())
    )
    dpp = (
        Query(part_eng)
        .columns("[Measures].[Sum Qty]")
        .rows("[ReturnFlag].children")
        .where("[Epoch].[EPOCH_0]")
        .execute()
        .df
    )
    assert "dynamicpruning" in (
        dpp._jdf.queryExecution().executedPlan().toString()
    )
