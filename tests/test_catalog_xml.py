"""Mondrian XML catalog importer (catalog_xml.from_mondrian_xml;
lib/mondrian/olap/schema.rb:53-489 element inventory, golden fixture
/root/reference/test/fixtures/MondrianTest.xml)."""

import pytest

from mondrian_olap_spark.catalog_xml import (
    build_virtual_cube,
    from_mondrian_xml,
)
from mondrian_olap_spark.query import Query
from mondrian_olap_spark.star import CubeEngine, read_parquet_table

FIXTURE = "/root/reference/test/fixtures/MondrianTest.xml"


@pytest.fixture(scope="module")
def fixture_schema():
    return from_mondrian_xml(FIXTURE)


def test_fixture_schema_structure(fixture_schema):
    schema, virtuals = fixture_schema
    assert schema.name == "MondrianTest"
    # Time's second hierarchy becomes its own dimension (Time.Weekly)
    assert [d.name for d in schema.dimensions] == [
        "Time", "Time.Weekly", "Product", "Customers",
    ]
    weekly = schema.dimension("Time.Weekly")
    assert [lv.name for lv in weekly.levels] == ["Year", "Week", "Day"]
    assert weekly.has_all is True
    time = schema.dimension("Time")
    assert time.has_all is False
    assert [lv.level_type for lv in time.levels] == [
        "TimeYears", "TimeQuarters", "TimeMonths",
    ]
    # snowflake Join → base table + link chain
    product = schema.dimension("Product")
    assert product.table == "products"
    assert [(j.left_key, j.table, j.right_key) for j in product.joins] == [
        ("product_class_id", "product_classes", "id")
    ]
    # expressions pick the GENERIC dialect SQL
    cust = schema.dimension("Customers")
    name_level = cust.levels[-1]
    assert name_level.caption == "fullname"
    assert name_level.ordinal == "fullname"
    assert dict(name_level.properties) == {
        "Gender": "gender", "Description": "description",
    }
    assert schema.cube_names == ["Sales", "Warehouse"]
    assert [v.name for v in virtuals] == ["Sales and Warehouse"]


def test_fixture_sales_cube(fixture_schema):
    schema, _ = fixture_schema
    sales = schema.cube("Sales")
    assert sales.fact == "sales"
    assert sales.default_measure == "Unit Sales"
    dim_names = [d.name for d in sales.dimensions]
    # DimensionUsage binds every hierarchy of the shared dimension
    assert dim_names == [
        "Time", "Time.Weekly", "Product", "Customers", "Gender",
    ]
    assert schema.cube("Sales").dimension("Time").foreign_key == "time_id"
    gender = sales.dimension("Gender")
    assert gender.foreign_key == "customer_id" and gender.table == "customers"
    assert [m.name for m in sales.measures] == [
        "Unit Sales", "Store Cost", "Store Sales", "Sales Count",
        "Customer Count",
    ]
    assert sales.measure("Customer Count").aggregator == "distinct-count"
    # calc member formulas rewrite [Measures].[X] to output aliases
    calcs = {c.name: c for c in sales.calculated_members}
    assert calcs["Profit"].expression == "store_sales - store_cost"
    assert calcs["Profit"].format_string == "$#,##0.00"
    # later members reference earlier ones by alias
    assert "profit_last_period" in calcs["Profit Growth"].expression
    # the PrevMember tuple cannot lower statically — passes through
    assert "PREVMEMBER" in calcs["Profit last Period"].expression


def test_fixture_warehouse_measure_expression(fixture_schema):
    schema, _ = fixture_schema
    wh = schema.cube("Warehouse")
    m = wh.measure("Products with units shipped")
    assert m.aggregator == "distinct-count"
    assert "CASE WHEN units_shipped IS NOT NULL" in m.expression


def test_fixture_virtual_cube_and_role(fixture_schema):
    schema, virtuals = fixture_schema
    v = virtuals[0]
    assert ("Sales", "Unit Sales") in v.measures
    assert ("Warehouse", "Units Shipped") in v.measures
    assert ("Gender", "Sales") in v.dimensions
    role = schema.role("Mexico manager")
    g = role.grants[0]
    assert (g.dimension, g.path, g.access) == ("Customers", ("Mexico",), "all")


TPCH_XML = """<?xml version="1.0"?>
<Schema name="TpchXml">
  <Dimension name="Customer">
    <Hierarchy hasAll="true" primaryKey="o_orderkey">
      <Join leftKey="o_custkey" rightKey="c_custkey">
        <Table name="orders"/>
        <Join leftKey="c_nationkey" rightKey="n_nationkey">
          <Table name="customer"/>
          <Join leftKey="n_regionkey" rightKey="r_regionkey">
            <Table name="nation"/>
            <Table name="region"/>
          </Join>
        </Join>
      </Join>
      <Level name="Region" column="r_name"/>
      <Level name="Nation" column="n_name"/>
    </Hierarchy>
  </Dimension>
  <Cube name="Sales">
    <Table name="lineitem"/>
    <DimensionUsage name="Customer" source="Customer" foreignKey="l_orderkey"/>
    <Measure name="Sum Qty" column="l_quantity" aggregator="sum"/>
    <Measure name="Order Count" column="l_orderkey" aggregator="count"/>
    <CalculatedMember name="Qty Per Order" dimension="Measures"
        formula="[Measures].[Sum Qty] / [Measures].[Order Count]"/>
  </Cube>
</Schema>
"""


def test_imported_model_matches_dsl_engine(spark, engine):
    """An engine built from the XML-imported model answers the flagship
    star join bit-for-bit like the DSL-built engine (the VERDICT's
    done-criterion for the importer)."""
    import os

    schema, _ = from_mondrian_xml(TPCH_XML)
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    cube = schema.cube("Sales")
    names = {cube.fact} | {
        t
        for d in cube.dimensions
        for t in [d.table, *[j.table for j in d.joins]]
        if t
    }
    tables = {
        n: read_parquet_table(spark, f"{sf_dir}/{n}.parquet") for n in names
    }
    xml_eng = CubeEngine(cube, tables)
    got = (
        Query(xml_eng)
        .columns(
            "[Measures].[Sum Qty]", "[Measures].[Order Count]",
            "[Measures].[Qty Per Order]",
        )
        .rows("[Customer].[Nation].Members")
        .execute()
        .df.collect()
    )
    want = (
        Query(engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].[Nation].Members")
        .execute()
        .df.collect()
    )
    got_m = {
        (r["region"], r["nation"]): (r["sum_qty"], r["order_count"])
        for r in got
    }
    want_m = {
        (r["region_name"], r["nation_name"]): (r["sum_qty"], r["count_order"])
        for r in want
    }
    assert got_m == want_m  # bit-for-bit (exact equality, no tolerance)
    for r in got:
        assert r["qty_per_order"] == r["sum_qty"] / r["order_count"]


def test_export_import_round_trip_fixture():
    """to_mondrian_xml ∘ from_mondrian_xml is stable on the reference
    fixture: one round trip reaches a fixed point (schema_element.rb
    to_xml parity)."""
    from mondrian_olap_spark.catalog_xml import to_mondrian_xml

    s1, v1 = from_mondrian_xml(FIXTURE)
    xml = to_mondrian_xml(s1, v1)
    s2, v2 = from_mondrian_xml(xml)
    assert to_mondrian_xml(s2, v2) == xml  # fixed point
    assert [d.name for d in s2.dimensions] == [d.name for d in s1.dimensions]
    assert s2.cube_names == s1.cube_names
    for c1 in s1.cubes:
        c2 = s2.cube(c1.name)
        assert [m.name for m in c2.measures] == [m.name for m in c1.measures]
        assert [cm.name for cm in c2.calculated_members] == [
            cm.name for cm in c1.calculated_members
        ]
    assert [v.name for v in v2] == [v.name for v in v1]
    assert s2.role_names == s1.role_names


def test_exported_tpch_schema_answers_match(spark, engine):
    """Exporting the repo's own Sales cube to Mondrian XML and importing
    it back yields an engine whose star-join answers are bit-for-bit the
    DSL engine's (output aliases survive via the lossless extension)."""
    import os

    from mondrian_olap_spark.catalog_xml import to_mondrian_xml
    from mondrian_olap_spark.model import Schema
    from mondrian_olap_spark.tpch import SALES_CUBE

    # restrict to the XML-expressible subset: drop measures whose dtype /
    # formatter metadata has no XML element (documented exporter scope)
    import dataclasses as dc

    slim = dc.replace(
        SALES_CUBE,
        measures=tuple(
            m for m in SALES_CUBE.measures
            if m.name in ("Sum Qty", "Count Order")
        ),
        calculated_members=(),
        default_measure=None,
    )
    xml = to_mondrian_xml(Schema(name="T", cubes=(slim,)))
    schema2, _ = from_mondrian_xml(xml)
    cube2 = schema2.cube("Sales")
    sf_dir = os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    names = {cube2.fact} | {
        t
        for d in cube2.dimensions
        for t in [d.table, *[j.table for j in d.joins]]
        if t
    }
    tables = {
        n: read_parquet_table(spark, f"{sf_dir}/{n}.parquet") for n in names
    }
    eng2 = CubeEngine(cube2, tables)
    q = lambda e: sorted(
        tuple(r)
        for r in Query(e)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .rows("[Customer].[Nation].Members")
        .where("[Time].[1995]")
        .execute()
        .df.collect()
    )
    assert q(eng2) == q(engine)


def test_virtual_cube_binding_requires_engines():
    _, virtuals = from_mondrian_xml(FIXTURE)
    with pytest.raises(KeyError, match="needs an engine"):
        build_virtual_cube(virtuals[0], engines={})


def test_measure_ref_rewrite_requires_complete_head():
    """The [Measures].[X] rewrite must not fire INSIDE a longer bracketed
    identifier: '[GrossMeasures].[Foo]' contains the substring
    'Measures].[Foo]', and an unanchored match corrupted the formula to
    '[Gross<alias>' when a measure named Foo existed."""
    from mondrian_olap_spark.catalog_xml import _measure_refs_to_outs

    outs = {"foo": "foo_out", "sum qty": "sum_qty"}
    # untouched: Measures-head is part of a longer identifier
    assert (
        _measure_refs_to_outs("[GrossMeasures].[Foo] + 1", outs)
        == "[GrossMeasures].[Foo] + 1"
    )
    assert (
        _measure_refs_to_outs("GrossMeasures.[Foo]", outs)
        == "GrossMeasures.[Foo]"
    )
    # rewritten: complete heads, bracketed or bare, any spacing
    assert _measure_refs_to_outs("[Measures].[Foo]", outs) == "foo_out"
    assert _measure_refs_to_outs("Measures.[Sum Qty] * 2", outs) == "sum_qty * 2"
    assert _measure_refs_to_outs("Measures . Foo", outs) == "foo_out"


AGG_XML = '''<?xml version="1.0"?>
<Schema name="AggTest">
  <Dimension name="Customer">
    <Hierarchy hasAll="true" primaryKey="o_orderkey">
      <Join leftKey="o_custkey" rightKey="c_custkey">
        <Table name="orders"/>
        <Join leftKey="c_nationkey" rightKey="n_nationkey">
          <Table name="customer"/>
          <Join leftKey="n_regionkey" rightKey="r_regionkey">
            <Table name="nation"/>
            <Table name="region"/>
          </Join>
        </Join>
      </Join>
      <Level name="Region" column="r_name"/>
      <Level name="Nation" column="n_name"/>
    </Hierarchy>
  </Dimension>
  <Cube name="Sales">
    <Table name="lineitem">
      <AggPattern pattern="agg_.*_sales">
        <AggFactCount column="fact_count"/>
        <AggMeasure column="qty_sum" name="[Measures].[Sum Qty]"/>
        <AggLevel column="region" name="[Customer].[Region]"/>
        <AggLevel column="nation" name="[Customer].[Nation]"/>
        <AggExclude name="agg_bad_sales"/>
      </AggPattern>
    </Table>
    <DimensionUsage name="Customer" source="Customer"
        foreignKey="l_orderkey"/>
    <Measure name="Sum Qty" column="l_quantity" aggregator="sum"/>
  </Cube>
</Schema>'''


def test_aggpattern_import_registers_matching_tables(spark, engine):
    """<AggPattern> declarations import into cube.aggregate_declarations
    and register every matching table at engine construction
    (schema_definition_test.rb:674-775): a nation-grain summary serves a
    region query without rescanning the fact; AggExclude names are
    skipped; a declaration whose tables are all absent registers
    nothing."""
    from pyspark.sql import functions as F

    schema, _ = from_mondrian_xml(AGG_XML)
    cube = schema.cube("Sales")
    assert cube.aggregate_declarations == (
        (
            "pattern",
            "agg_.*_sales",
            (("[Customer].[Region]", "region"),
             ("[Customer].[Nation]", "nation")),
            (("Sum Qty", "qty_sum"),),
            (("name", "agg_bad_sales"),),
        ),
    )
    sf_dir = "/root/testdata/sf0.001"
    names = ("lineitem", "orders", "customer", "nation", "region")
    tables = {
        n: read_parquet_table(spark, f"{sf_dir}/{n}.parquet") for n in names
    }
    li, od, cu, na, re_ = (tables[n] for n in names)
    summary = (
        li.join(od, li["l_orderkey"] == od["o_orderkey"])
        .join(cu, od["o_custkey"] == cu["c_custkey"])
        .join(na, cu["c_nationkey"] == na["n_nationkey"])
        .join(re_, na["n_regionkey"] == re_["r_regionkey"])
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(
            F.sum("l_quantity").alias("qty_sum"),
            F.count(F.lit(1)).alias("fact_count"),
        )
        .localCheckpoint(eager=True)
    )
    # a poisoned same-pattern table: excluded by AggExclude, never used
    bad = summary.withColumn("qty_sum", F.col("qty_sum") * 1000)
    eng = CubeEngine(
        cube,
        {**tables, "agg_nation_sales": summary, "agg_bad_sales": bad},
    )
    assert len(eng.aggregate_tables) == 1
    routed = (
        Query(eng)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .execute()
        .df
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan
    direct = (
        Query(CubeEngine(cube, tables))
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .execute()
        .df
    )
    assert sorted(map(tuple, routed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # absent summaries: declaration is inert, engine still builds
    eng2 = CubeEngine(cube, tables)
    assert eng2.aggregate_tables == []


def test_agg_declarations_export_round_trip():
    """AggName/AggPattern declarations survive to_mondrian_xml →
    from_mondrian_xml unchanged."""
    from mondrian_olap_spark.catalog_xml import to_mondrian_xml

    schema, _ = from_mondrian_xml(AGG_XML)
    out = to_mondrian_xml(schema)
    assert 'pattern="agg_.*_sales"' in out
    assert '<AggExclude name="agg_bad_sales"' in out
    schema2, _ = from_mondrian_xml(out)
    assert (
        schema2.cube("Sales").aggregate_declarations
        == schema.cube("Sales").aggregate_declarations
    )
