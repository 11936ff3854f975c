"""Shared dimensions + DimensionUsage (schema.rb:106-121;
schema_definition_test.rb:430-450): one schema-level dimension bound into
cubes with cube-specific foreign keys, renames, and usage prefixes."""

import pytest

from mondrian_olap_spark.model import (
    Cube, Dimension, Level, Measure, Schema, dimension_usage,
)
from mondrian_olap_spark.query import Query
from mondrian_olap_spark.star import engine_from_parquet

from .conftest import SF_DIR

GEO = Dimension(
    name="Geo",
    table="nation",
    primary_key="n_nationkey",
    levels=(Level("Nation", "n_name", output="geo_nation"),),
    guaranteed_small=True,
)


def test_usage_rename_and_prefix():
    d = dimension_usage(GEO, foreign_key="s_nationkey", name="SupplierGeo",
                        usage_prefix="sup_")
    assert d.name == "SupplierGeo" and d.foreign_key == "s_nationkey"
    assert d.levels[0].out == "sup_geo_nation"
    assert d.table == "nation" and d.primary_key == "n_nationkey"
    # the shared source is untouched (usages are copies)
    assert GEO.levels[0].out == "geo_nation" and GEO.foreign_key is None


def test_schema_shared_dimension_lookup():
    s = Schema(name="S", dimensions=(GEO,))
    assert s.dimension("geo").name == "Geo"
    with pytest.raises(KeyError):
        s.dimension("NoSuch")


def test_usage_driven_cube_queries(spark):
    """A cube whose dimension comes from a shared definition answers
    queries identically to an inline definition."""
    shared_cube = Cube(
        name="Suppliers",
        fact="supplier",
        dimensions=(dimension_usage(GEO, foreign_key="s_nationkey"),),
        measures=(Measure("Supplier Count", "s_suppkey", "count",
                          output="supplier_count"),),
    )
    eng = engine_from_parquet(
        spark, Schema(name="S", cubes=(shared_cube,), dimensions=(GEO,)),
        "Suppliers", SF_DIR,
    )
    rows = (
        Query(eng)
        .columns("[Measures].[Supplier Count]")
        .rows("[Geo].[Nation].Members")
        .execute()
        .df.collect()
    )
    n_suppliers = spark.read.parquet(f"{SF_DIR}/supplier.parquet").count()
    assert rows and all(r["supplier_count"] > 0 for r in rows)
    assert sum(r["supplier_count"] for r in rows) == n_suppliers


def test_sql_view_as_fact(spark):
    """View elements: a cube whose fact is SQL text over base tables
    (schema.rb View/SQL; schema_definition_test.rb:171-193)."""
    from mondrian_olap_spark.sources.registry import with_sql_views
    from mondrian_olap_spark.star import CubeEngine, read_parquet_table

    base = {
        "supplier": read_parquet_table(spark, f"{SF_DIR}/supplier.parquet"),
        "nation": read_parquet_table(spark, f"{SF_DIR}/nation.parquet"),
    }
    tables = with_sql_views(
        spark, base,
        {"big_suppliers": "SELECT * FROM supplier WHERE s_acctbal > 0"},
    )
    cube = Cube(
        name="BigSuppliers",
        fact="big_suppliers",
        dimensions=(dimension_usage(GEO, foreign_key="s_nationkey"),),
        measures=(Measure("Supplier Count", "s_suppkey", "count",
                          output="supplier_count"),),
    )
    eng = CubeEngine(cube, tables)
    total = (
        Query(eng).columns("[Measures].[Supplier Count]").execute().df.collect()
    )
    expected = base["supplier"].filter("s_acctbal > 0").count()
    assert total[0]["supplier_count"] == expected
