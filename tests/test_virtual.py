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


def test_needs_two_usages(spark):
    with pytest.raises(ValueError):
        VirtualCube("solo", [CubeUsage(get_engine(spark, SF_DIR, "Sales"), ("Sum Qty",))])
