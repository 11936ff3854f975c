"""VisualTotals as a first-class operator + UNION/INTERSECT MDX spellings
(jar!mondrian/olap/fun/VisualTotalsFunDef, UnionFunDef, IntersectFunDef)."""

import pytest

from mondrian_olap_spark.mdx import MdxError, execute_mdx
from mondrian_olap_spark.query import Query, QueryError


def test_visual_totals_api_reflects_filter(engine):
    grid = (
        Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .filter("sum_price > 500000")
        .visual_totals()
        .execute()
        .df.collect()
    )
    children = [r for r in grid if r["nation_name"] is not None]
    parents = {r["region_name"]: r["sum_price"] for r in grid if r["nation_name"] is None}
    assert parents  # parent rows synthesized
    for region, total in parents.items():
        vis = [r["sum_price"] for r in children if r["region_name"] == region]
        assert total == pytest.approx(sum(vis))
        # every visible child passed the filter — the total reflects ONLY them
        assert all(v > 500000 for v in vis)


def test_visual_totals_pattern_caption(engine):
    grid = (
        Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .visual_totals(pattern="Subtotal - *")
        .execute()
        .df.collect()
    )
    captions = {r["nation_name"] for r in grid} - {None}
    assert any(c.startswith("Subtotal - ") for c in captions)
    assert "Subtotal - ASIA" in captions


def test_visual_totals_to_mdx_golden(engine):
    q = (
        Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .visual_totals(pattern="Total *")
    )
    mdx = q.to_mdx()
    assert "VISUALTOTALS(" in mdx and "'Total *'" in mdx


def test_visual_totals_distinct_count_rejected(engine):
    q = (
        Query(engine)
        .columns("[Measures].[Distinct Parts]")
        .rows("[Customer].[Nation].Members")
        .visual_totals()
    )
    with pytest.raises(QueryError, match="distinct-count"):
        q.execute().df.collect()


def test_union_function_spelling(engine):
    r = execute_mdx(
        engine,
        """
        SELECT {[Measures].[Sum Qty]} ON COLUMNS,
               UNION({[Customer].[ASIA]}, {[Customer].[AFRICA],
                     [Customer].[ASIA]}) ON ROWS FROM [Sales]
        """,
    )
    assert {row["region_name"] for row in r.df.collect()} == {"ASIA", "AFRICA"}


def test_intersect_function_spelling(engine):
    r = execute_mdx(
        engine,
        """
        SELECT {[Measures].[Sum Qty]} ON COLUMNS,
               INTERSECT({[Customer].[ASIA], [Customer].[EUROPE]},
                         {[Customer].[EUROPE], [Customer].[AFRICA]}) ON ROWS
        FROM [Sales]
        """,
    )
    assert {row["region_name"] for row in r.df.collect()} == {"EUROPE"}


def test_intersect_all_rejected(engine):
    with pytest.raises(MdxError, match="INTERSECT ALL"):
        execute_mdx(
            engine,
            """
            SELECT {[Measures].[Sum Qty]} ON COLUMNS,
                   INTERSECT({[Customer].[ASIA]}, {[Customer].[ASIA]}, ALL)
                     ON ROWS FROM [Sales]
            """,
        )
