"""Aggregate-cache behavior tests — ports the *shape* of the reference's
cache-control suite (/root/reference/test/cube_cache_control_test.rb:79-219
and query_test.rb:1162-1213): warm queries don't rescan the fact, data
mutations stay invisible until a flush, region flush is targeted.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mondrian_olap_spark.query import Query
from mondrian_olap_spark.star import CubeEngine, engine_from_parquet
from mondrian_olap_spark.tpch import SCHEMA

from .conftest import SF_DIR


@pytest.fixture()
def cached_engine(spark):
    eng = engine_from_parquet(spark, SCHEMA, "Sales", SF_DIR)
    eng.enable_cache()
    yield eng
    eng.flush_schema_cache()


def _q(eng, *, where=()):
    q = (
        Query(eng)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].children")
    )
    if where:
        q = q.where(*where)
    return q.execute().df


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_warm_query_hits_cache_not_fact(cached_engine):
    cold = _q(cached_engine)
    cold_rows = {r["region_name"]: r["sum_qty"] for r in cold.collect()}
    assert cached_engine.cache.misses == 1

    warm = _q(cached_engine)
    warm_rows = {r["region_name"]: r["sum_qty"] for r in warm.collect()}
    assert warm_rows == cold_rows
    assert cached_engine.cache.hits == 1
    # the warm plan reads the in-memory aggregate first; parquet appears
    # only inside the cached relation's lineage description (reference:
    # repeated query does 0 SQL — query_test.rb:1162-1213).  The mutation
    # test below proves the fact is truly not rescanned.
    p = plan_of(warm)
    assert "InMemoryTableScan" in p
    assert p.index("InMemoryTableScan") < p.index("Scan parquet")


def test_distinct_slicers_are_distinct_entries(cached_engine):
    _q(cached_engine, where=("[Customer].[ASIA]",)).collect()
    _q(cached_engine, where=("[Customer].[EUROPE]",)).collect()
    assert cached_engine.cache.misses == 2
    assert len(cached_engine.cache) == 2


def test_region_flush_is_targeted(cached_engine):
    _q(cached_engine, where=("[Customer].[ASIA]",)).collect()
    _q(cached_engine, where=("[Customer].[EUROPE]",)).collect()
    # flushing the ASIA region must drop the ASIA entry and keep EUROPE
    # (cube_cache_control_test.rb:116-218 region semantics)
    flushed = cached_engine.flush_region_cache(["[Customer].[ASIA]"])
    assert flushed == 1
    assert len(cached_engine.cache) == 1


def test_flush_region_reference_named_entry_points(cached_engine):
    """cube.rb:528-536 parity: the segments form quotes/joins paths, the
    full-names form passes through — both hit the same region flush."""
    _q(cached_engine, where=("[Customer].[ASIA]",)).collect()
    assert cached_engine.flush_region_cache_with_segments(
        ("Customer", "ASIA")
    ) == 1
    _q(cached_engine, where=("[Customer].[ASIA]",)).collect()
    assert cached_engine.flush_region_cache_with_full_names(
        "[Customer].[ASIA]"
    ) == 1


def test_unconstrained_entries_overlap_every_region(cached_engine):
    _q(cached_engine).collect()  # grand aggregate, no slicer
    flushed = cached_engine.flush_region_cache(["[Customer].[ASIA]"])
    assert flushed == 1  # totals contain ASIA contributions -> must flush


def test_mutation_invisible_until_flush(spark, tmp_path):
    """DELETE → warm query unchanged → flush → new values
    (cube_cache_control_test.rb DELETE/UPDATE scenarios)."""
    data = str(tmp_path / "data")
    shutil.copytree(SF_DIR, data)
    eng = engine_from_parquet(spark, SCHEMA, "Sales", data)
    eng.enable_cache()

    before = {r["region_name"]: r["count_order"] for r in _q(eng).collect()}

    # mutate: drop all 'A' return-flag lines and rewrite the fact table
    li = spark.read.parquet(f"{data}/lineitem.parquet")
    li.filter(F.col("l_returnflag") != "A").write.mode("overwrite").parquet(
        f"{data}/lineitem_v2.parquet"
    )
    os.remove(f"{data}/lineitem.parquet")  # source fixture is a single file
    shutil.move(f"{data}/lineitem_v2.parquet", f"{data}/lineitem.parquet")

    warm = {r["region_name"]: r["count_order"] for r in _q(eng).collect()}
    assert warm == before  # cache still serves pre-mutation values

    eng.flush_schema_cache()
    spark.catalog.refreshByPath(f"{data}/lineitem.parquet")
    fresh_eng = engine_from_parquet(spark, SCHEMA, "Sales", data)
    fresh_eng.enable_cache()
    after = {r["region_name"]: r["count_order"] for r in _q(fresh_eng).collect()}
    assert all(after[k] < before[k] for k in before)
    fresh_eng.flush_schema_cache()


def test_in_memory_rollup_reuse(cached_engine):
    """A coarser request re-aggregates a finer cached entry instead of
    rescanning the fact (EnableInMemoryRollup — SURVEY.md §4)."""
    fine = (
        Query(cached_engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].[Nation].Members")
        .execute()
        .df
    )
    fine.collect()
    assert cached_engine.cache.misses == 1

    coarse = (
        Query(cached_engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].children")
        .execute()
        .df
    )
    rows = {r["region_name"]: r for r in coarse.collect()}
    assert cached_engine.cache.rollups == 1
    assert cached_engine.cache.misses == 1  # fact never rescanned
    # and values match a fresh computation
    fresh = {
        r["region_name"]: r
        for r in Query(cached_engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].children")
        .execute()
        .df.collect()
    }
    for k in fresh:
        assert rows[k]["count_order"] == fresh[k]["count_order"]
        assert abs(rows[k]["sum_qty"] - fresh[k]["sum_qty"]) < 1e-6


def test_distinct_count_never_rolls_up(cached_engine):
    """distinct-count is not summable — must rescan (SURVEY.md §7.4)."""
    Query(cached_engine).columns("[Measures].[Distinct Parts]").rows(
        "[Customer].[Nation].Members"
    ).execute().df.collect()
    Query(cached_engine).columns("[Measures].[Distinct Parts]").rows(
        "[Customer].children"
    ).execute().df.collect()
    assert cached_engine.cache.rollups == 0
    assert cached_engine.cache.misses == 2


def test_flush_region_same_dim_union(spark):
    """A same-dimension member list is a UNION region: an entry overlapping
    ANY listed member must flush (cube.rb:519-547 segment semantics)."""
    from mondrian_olap_spark.star import engine_from_parquet
    from mondrian_olap_spark.tpch import SCHEMA
    from mondrian_olap_spark.query import Query

    from .conftest import SF_DIR

    eng = engine_from_parquet(spark, SCHEMA, "Sales", SF_DIR)
    eng.enable_cache()
    # warm an EUROPE-sliced aggregate
    Query(eng).columns("[Measures].[Sum Qty]").rows("[ReturnFlag].children").where(
        "[Customer].[EUROPE]"
    ).execute().df.collect()
    # flushing the {ASIA, EUROPE} union region must drop it
    n = eng.flush_region_cache(["[Customer].[ASIA]", "[Customer].[EUROPE]"])
    assert n >= 1


def test_set_role_name_flushes_cache(spark):
    """In-place role switches must not serve cached unrestricted cells."""
    import dataclasses

    from mondrian_olap_spark.roles import MemberGrant, Role
    from mondrian_olap_spark.star import engine_from_parquet
    from mondrian_olap_spark.tpch import SCHEMA
    from mondrian_olap_spark.query import Query

    from .conftest import SF_DIR

    asia = Role("asia", grants=(MemberGrant("Customer", ("ASIA",)),))
    eng = engine_from_parquet(
        spark, dataclasses.replace(SCHEMA, roles=(asia,)), "Sales", SF_DIR
    )
    cache = eng.enable_cache()
    full = Query(eng).columns("[Measures].[Count Order]").execute().df.collect()[0]
    eng.set_role_name("asia")
    restricted = Query(eng).columns("[Measures].[Count Order]").execute().df.collect()[0]
    assert restricted["count_order"] < full["count_order"]
    eng.set_role_name()


def test_flush_region_empty_is_noop(spark):
    """flush_region([]) overlaps nothing and must flush nothing (review
    fix: any([]) made every entry doomed)."""
    from mondrian_olap_spark.cache import AggregateCache

    cache = AggregateCache()
    df = spark.range(3)
    cache.get_or_build(("k",), [], lambda: df)
    assert len(cache) == 1
    assert cache.flush_region([]) == 0
    assert len(cache) == 1
    cache.flush_all()


def test_rollup_reuses_same_grain_different_order(spark, engine):
    """A cached aggregate at the SAME grain with a different key ordering
    serves the request via in-memory re-aggregation instead of a fact
    rescan (review fix)."""
    from mondrian_olap_spark.query import Query

    eng = engine.with_role(None) if False else engine
    import copy

    e2 = copy.copy(engine)
    e2.enable_cache()
    q1 = (
        Query(e2).columns("[Measures].[Sum Qty]")
        .rows("[Customer].children", "[ReturnFlag].children").execute().df
    )
    q1.collect()
    misses = e2.cache.misses
    q2 = (
        Query(e2).columns("[Measures].[Sum Qty]")
        .rows("[ReturnFlag].children", "[Customer].children").execute().df
    )
    q2.collect()
    assert e2.cache.rollups >= 1 and e2.cache.misses == misses
    a = {(r["region_name"], r["return_flag"]): r["sum_qty"] for r in q1.collect()}
    b = {(r["region_name"], r["return_flag"]): r["sum_qty"] for r in q2.collect()}
    assert a == b
    e2.cache.flush_all()


def test_aggregate_cache_lru_eviction(spark):
    """The aggregate cache is a BOUNDED LRU: inserts beyond max_entries
    evict (and unpersist) the least-recently-used entry; a hit refreshes
    recency so hot entries survive."""
    from mondrian_olap_spark.cache import AggregateCache

    cache = AggregateCache(max_entries=2)
    built = []

    def builder_for(i):
        def b():
            built.append(i)
            return spark.range(i + 1).toDF("v")
        return b

    k = lambda i: ("cube", ("g",), (), ("m",), None if i else None) + (i,)  # noqa: E731
    cache.get_or_build(k(0), [], builder_for(0))
    cache.get_or_build(k(1), [], builder_for(1))
    # touch k0 so k1 is the LRU victim when k2 arrives
    cache.get_or_build(k(0), [], builder_for(0))
    cache.get_or_build(k(2), [], builder_for(2))
    assert len(cache) == 2 and cache.evictions == 1
    # k0 still cached (no rebuild); k1 was evicted (rebuilds)
    n_built = len(built)
    cache.get_or_build(k(0), [], builder_for(0))
    assert len(built) == n_built
    cache.get_or_build(k(1), [], builder_for(1))
    assert len(built) == n_built + 1
