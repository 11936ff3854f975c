"""Virtual-cube behavior (schema.rb:343-372; empty-cell semantics
query_test.rb:1060-1098)."""

import pytest

from mondrian_olap_spark.tpch import get_engine
from mondrian_olap_spark.virtual import CubeUsage, VirtualCube

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def vc(spark):
    return VirtualCube(
        "SalesAndOrders",
        [
            CubeUsage(get_engine(spark, SF_DIR, "Sales"), ("Sum Price",)),
            CubeUsage(get_engine(spark, SF_DIR, "Orders"), ("Sum Total Price", "Order Count")),
        ],
    )


def test_conformed_join(vc):
    df = vc.aggregate(rows=["[Customer].children"])
    rows = {r["region_name"]: r for r in df.collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["sum_price"] is not None and r["sum_totalprice"] is not None


def test_valid_measure_repeats_across_missing_dim(vc):
    df = vc.aggregate(rows=["[Customer].children", "[Status].children"])
    rows = df.collect()
    # Sales lacks Status: sum_price must repeat across statuses per region
    by_region = {}
    for r in rows:
        by_region.setdefault(r["region_name"], set()).add(r["sum_price"])
    assert all(len(v) == 1 for v in by_region.values())
    assert len({r["order_status"] for r in rows}) == 3


def test_virtual_drill_through_missing_fields_empty(vc):
    """Drill routes to the measure's base cube; fields from other cubes
    come back as empty strings (query_test.rb:1076-1106)."""
    df = vc.drill_through(
        ["[Time].[1995]"],
        [
            ("region_name", "[Customer].[Region]"),
            ("order_status", "[Status].[Status]"),  # Orders-only dimension
            ("sum_qty", "l_quantity"),              # Sales measure
        ],
        max_rows=20,
    )
    rows = df.collect()
    assert len(rows) == 20
    assert df.columns == ["region_name", "order_status", "sum_qty"]
    assert all(r["order_status"] == "" for r in rows)
    assert all(r["region_name"] and r["sum_qty"] is not None for r in rows)


def test_virtual_drill_routes_to_orders(vc):
    """A field naming an Orders measure routes the drill to Orders, where
    Status resolves."""
    df = vc.drill_through(
        ["[Time].[1995]"],
        [
            ("order_status", "[Status].[Status]"),
            ("sum_totalprice", "CAST(o_totalprice AS DECIMAL(12,2))"),
        ],
        max_rows=10,
        group_by=True,
    )
    rows = df.collect()
    assert {r["order_status"] for r in rows} <= {"F", "O", "P"}
    assert all(r["sum_totalprice"] is not None for r in rows)


def test_needs_two_usages(spark):
    with pytest.raises(ValueError):
        VirtualCube("solo", [CubeUsage(get_engine(spark, SF_DIR, "Sales"), ("Sum Qty",))])


def test_valid_measure_rejects_member_unknown_everywhere(vc):
    """valid_measure tolerates a dimension missing from SOME cubes; a
    member resolving in NO usage is a typo and raises (review fix)."""
    import pytest

    from mondrian_olap_spark.query import QueryError

    with pytest.raises(QueryError, match="not found in any cube"):
        vc.aggregate(rows=["[Custmer].children"])


def test_valid_measure_rejects_unknown_slicer(vc):
    """The typo check covers WHERE members too (review fix): a slicer
    resolving in no usage raises instead of silently unslicing."""
    import pytest

    from mondrian_olap_spark.query import QueryError

    with pytest.raises(QueryError, match="not found in any cube"):
        vc.aggregate(rows=["[Customer].children"], where=["[Tme].[1995]"])


def test_virtual_cube_rejects_duplicate_measure_outputs(spark, engine):
    """Overlapping measure output columns across usages raise a clear
    configuration error at construction, not an ambiguous-reference
    failure at collect time (review fix)."""
    from mondrian_olap_spark.virtual import CubeUsage, VirtualCube

    with pytest.raises(ValueError, match="output column"):
        VirtualCube(
            "Dup",
            [
                CubeUsage(engine, ("Sum Price",)),
                CubeUsage(engine, ("Sum Price",)),
            ],
        )
