"""Engine pool + content-checksum reload (pool.EnginePool — the analog
of mondrian.rolap.RolapSchemaPool as connection.rb:120-181,325-326 wraps
it; behavior mirror of test/query_test.rb:1162-1213 "schema cache")."""

import pytest

from mondrian_olap_spark.pool import EnginePool
from mondrian_olap_spark.query import Query

CATALOG = """<?xml version="1.0"?>
<Schema name="PoolTest">
  <Cube name="Sales">
    <Table name="sales"/>
    <Dimension name="Region" foreignKey="region">
      <Hierarchy hasAll="true">
        <Level name="Name" column="region"/>
      </Hierarchy>
    </Dimension>
    <Measure name="Unit Sales" column="unit_sales" aggregator="sum"/>
  </Cube>
</Schema>
"""


def _tables(spark, first_value):
    return {
        "sales": spark.createDataFrame(
            [("ASIA", float(first_value)), ("EUROPE", 2.0)],
            "region string, unit_sales double",
        )
    }


def _unit_sales(handle):
    eng = handle.engine("Sales")
    df = Query(eng).columns("[Measures].[Unit Sales]").rows(
        "[Region].children"
    ).execute().df
    return {r["name"]: r["unit_sales"] for r in df.collect()}["ASIA"]


def test_pool_shares_schema_and_serves_stale_cache(spark):
    """query_test.rb:1171-1181 'before' block: a reconnect against the
    same catalog returns the pooled schema — the loader does not re-run
    and the first value keeps serving (stale) even though the underlying
    data changed."""
    pool = EnginePool()
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return _tables(spark, 1 if calls["n"] == 1 else 2)

    h1 = pool.connect(CATALOG, loader, connection_key="db1")
    assert _unit_sales(h1) == 1.0
    # "data changed" — the loader WOULD now return 2, but a reconnect
    # shares the pooled schema and never invokes it
    h2 = pool.connect(CATALOG, loader, connection_key="db1")
    assert h2 is h1
    assert calls["n"] == 1
    assert _unit_sales(h2) == 1.0  # stale, by design


def test_flush_schema_rebuilds_fresh(spark):
    """query_test.rb:1201-1205 'should flush schema cache': after
    flush_schema a reconnect rebuilds from the loader and sees the
    updated value."""
    pool = EnginePool()
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return _tables(spark, calls["n"])

    h1 = pool.connect(CATALOG, loader, connection_key="db1")
    assert _unit_sales(h1) == 1.0
    h1.flush_schema()
    assert pool.size() == 0
    h2 = pool.connect(CATALOG, loader, connection_key="db1")
    assert h2 is not h1
    assert _unit_sales(h2) == 2.0


def test_flush_schema_by_key_and_whole_pool(spark):
    """query_test.rb:1207-1211 'should remove schema by key' + the
    class-level flush_schema_cache (connection.rb:153-168)."""
    pool = EnginePool()
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return _tables(spark, calls["n"])

    h1 = pool.connect(CATALOG, loader, connection_key="db1")
    key = h1.schema_key
    assert key.startswith("<") and key.endswith(", db1>")
    assert _unit_sales(h1) == 1.0
    assert pool.flush_schema(key) is True
    assert pool.flush_schema(key) is False  # already gone
    h2 = pool.connect(CATALOG, loader, connection_key="db1")
    assert _unit_sales(h2) == 2.0
    assert pool.flush_schema_cache() == 1
    assert pool.size() == 0


def test_content_checksum_reload(spark):
    """connection.rb:325-326 UseContentChecksum=true (the default): an
    EDITED catalog gets a new content key → a fresh schema, while the
    old entry stays pooled; the same content under a different spelling
    (whitespace identical) shares."""
    pool = EnginePool()
    h1 = pool.connect(CATALOG, lambda: _tables(spark, 1), connection_key="db1")
    edited = CATALOG.replace(
        '<Measure name="Unit Sales" column="unit_sales" aggregator="sum"/>',
        '<Measure name="Unit Sales" column="unit_sales" aggregator="sum"/>'
        '\n    <Measure name="Row Count" column="region" aggregator="count"/>',
    )
    h2 = pool.connect(edited, lambda: _tables(spark, 5), connection_key="db1")
    assert h2 is not h1
    assert pool.size() == 2
    assert [m.name for m in h2.schema.cube("Sales").measures] == [
        "Unit Sales", "Row Count",
    ]
    # the old schema keeps serving its own engines untouched
    assert _unit_sales(h1) == 1.0
    assert _unit_sales(h2) == 5.0


def test_checksum_vs_path_identity(spark, tmp_path):
    """With the checksum, the same content from two different FILES is
    one pooled schema; with use_content_checksum=False the file path is
    the identity and each path pools separately (and an in-place edit
    keeps serving the stale schema)."""
    p1, p2 = tmp_path / "a.xml", tmp_path / "b.xml"
    p1.write_text(CATALOG)
    p2.write_text(CATALOG)
    pool = EnginePool()
    h1 = pool.connect(str(p1), lambda: _tables(spark, 1), connection_key="db1")
    h2 = pool.connect(str(p2), lambda: _tables(spark, 9), connection_key="db1")
    assert h2 is h1  # same content → same schema, loader not re-run
    h3 = pool.connect(
        str(p1), lambda: _tables(spark, 1), connection_key="db1",
        use_content_checksum=False,
    )
    h4 = pool.connect(
        str(p2), lambda: _tables(spark, 9), connection_key="db1",
        use_content_checksum=False,
    )
    assert h3 is not h4  # path identity
    # in-place edit without checksum: stale schema keeps serving
    p1.write_text(CATALOG.replace("PoolTest", "Renamed"))
    h5 = pool.connect(
        str(p1), lambda: _tables(spark, 1), connection_key="db1",
        use_content_checksum=False,
    )
    assert h5 is h3
    assert h5.schema.name == "PoolTest"


def test_connection_key_isolates(spark):
    """Different connection keys (different data bindings) never share a
    schema even for identical catalogs — Mondrian's ConnectionKey half
    of the SchemaKey."""
    pool = EnginePool()
    h1 = pool.connect(CATALOG, lambda: _tables(spark, 1), connection_key="db1")
    h2 = pool.connect(CATALOG, lambda: _tables(spark, 7), connection_key="db2")
    assert h2 is not h1
    assert _unit_sales(h1) == 1.0
    assert _unit_sales(h2) == 7.0


def test_singleton_instance():
    a = EnginePool.instance()
    b = EnginePool.instance()
    assert a is b


def test_storage_mutation_visibility_and_flush(spark, tmp_path):
    """The reference scenario's storage-mutation half
    (query_test.rb:1162-1213): Mondrian serves STALE cells from its
    segment cache after the underlying DB changes.  The pool reproduces
    the schema-sharing contract (the loader never re-runs until flush),
    but Spark's CacheManager additionally invalidates cached plans when
    THIS session overwrites the backing path (recacheByPath) — so an
    in-session overwrite becomes visible immediately: a documented,
    strictly-safer deviation.  Out-of-band loader changes stay invisible
    until flush (the loader-based tests above pin that half)."""
    path = str(tmp_path / "sales.parquet")
    _tables(spark, 1)["sales"].write.mode("overwrite").parquet(path)
    pool = EnginePool()
    calls = {"n": 0}

    def loader():
        calls["n"] += 1
        return {"sales": spark.read.parquet(path)}

    h1 = pool.connect(CATALOG, loader, connection_key=path)
    assert _unit_sales(h1) == 1.0  # populates the aggregate cache
    _tables(spark, 3)["sales"].write.mode("overwrite").parquet(path)
    h2 = pool.connect(CATALOG, loader, connection_key=path)
    assert h2 is h1 and calls["n"] == 1  # pooled: loader never re-ran
    assert _unit_sales(h2) == 3.0  # Spark recacheByPath — see docstring
    h2.flush_schema()
    h3 = pool.connect(CATALOG, loader, connection_key=path)
    assert calls["n"] == 2
    assert _unit_sales(h3) == 3.0
