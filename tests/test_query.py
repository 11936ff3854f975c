"""Query-engine behavior tests.

Follows the reference's test strategy (SURVEY.md §5): hardcoded expected
values on deterministic data (mondrian_test.rb style) + differential
assertions against a DuckDB SQL oracle (query_test.rb:14-39 style).
Runs on /root/testdata/sf0.001 (seed=42 deterministic).
"""

import pytest

from mondrian_olap_spark.query import Query, QueryError

from .conftest import assert_df_matches_sql


def q(engine):
    return Query(engine)


# ---------------------------------------------------------------- flagship
def test_flagship_slice(engine, duck):
    """README.md:118-143 canonical query shape: measures on columns, children
    on rows, slicer tuple in WHERE."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Sum Price]", "[Measures].[Count Order]")
        .rows("[Customer].children")
        .where("[Time].[1995].[Q1]")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        SELECT r_name AS region_name, sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_price, count(l_orderkey) AS count_order
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE year(o_orderdate) = 1995 AND 'Q' || quarter(o_orderdate) = 'Q1'
        GROUP BY r_name
        """,
        rel_tol=1e-6,
    )


def test_flagship_values_shape(engine):
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .where("[Time].[1995].[Q1]")
        .execute()
    )
    assert r.column_names == ["sum_qty"]
    names = r.row_names
    assert names == sorted(names)  # default hierarchize order
    assert len(names) == 5
    assert all(len(v) == 1 for v in r.values)


# ------------------------------------------------------------- set operators
def test_crossjoin(engine, duck):
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[ReturnFlag].children")
        .crossjoin("[LineStatus].children")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT l_returnflag AS return_flag, l_linestatus AS line_status,
                  sum(l_extendedprice) AS sum_price
           FROM lineitem GROUP BY 1, 2""",
        rel_tol=1e-6,
    )


def test_slicer_multi_member_is_in(engine, duck):
    """Two same-dimension slicer members = IN (README.md:134-143)."""
    r = (
        q(engine)
        .columns("[Measures].[Count Order]")
        .rows("[ReturnFlag].children")
        .where("[Customer].[ASIA]", "[Customer].[EUROPE]")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT l_returnflag AS return_flag, count(l_orderkey) AS count_order
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name IN ('ASIA','EUROPE') GROUP BY 1""",
    )


def test_filter_having(engine):
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .filter("sum_price > 10000000")
        .execute()
    )
    rows = r.df.collect()
    assert rows and all(row["sum_price"] > 10_000_000 for row in rows)


def test_except(engine):
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
        .except_("[Customer].[ASIA]", "[Customer].[EUROPE]")
        .execute()
    )
    names = {row["region_name"] for row in r.df.collect()}
    assert names == {"AFRICA", "AMERICA", "MIDDLE EAST"}


def test_top_count(engine, duck):
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .top_count(5, "sum_price")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT r_name AS region_name, n_name AS nation_name,
                  sum(l_extendedprice) AS sum_price
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1, 2
           ORDER BY sum_price DESC, region_name, nation_name LIMIT 5""",
        rel_tol=1e-6,
    )


def test_top_percent(engine):
    """TopPercent: smallest prefix with ≥ p% of the total (SURVEY.md §2.5)."""
    full = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .execute()
    ).df.collect()
    total = sum(row["sum_price"] for row in full)
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .top_percent(30, "sum_price")
        .execute()
    )
    kept = sorted((row["sum_price"] for row in r.df.collect()), reverse=True)
    assert 0 < len(kept) < len(full)
    assert sum(kept) >= 0.30 * total
    assert sum(kept) - kept[-1] < 0.30 * total  # minimality


def test_order_bdesc(engine):
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .order("sum_price", "BDESC")
        .execute()
    )
    vals = [row["sum_price"] for row in r.df.collect()]
    assert vals == sorted(vals, reverse=True)


def test_order_hierarchical_asc(engine):
    """Plain ASC sorts within the parent member (SURVEY.md §2.5)."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .order("sum_price", "ASC")
        .execute()
    )
    rows = r.df.collect()
    by_region = {}
    for row in rows:
        by_region.setdefault(row["region_name"], []).append(row["sum_price"])
    for region, vals in by_region.items():
        assert vals == sorted(vals), region


# -------------------------------------------------------------- calc members
def test_calculated_member_chain(engine, duck):
    """Calc member referencing another calc member resolves transitively
    (mondrian_test.rb:579-605)."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]", "[Measures].[Discount Share]")
        .rows("[ReturnFlag].children")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT l_returnflag AS return_flag,
                  sum(l_extendedprice) AS sum_price,
                  (sum(l_extendedprice) - sum(l_extendedprice*(1-l_discount)))
                    / sum(l_extendedprice) AS discount_share
           FROM lineitem GROUP BY 1""",
        rel_tol=1e-6,
    )


def test_with_member(engine):
    r = (
        q(engine)
        .with_member("Double Qty")
        .as_("sum_qty * 2", output="double_qty")
        .columns("[Measures].[Sum Qty]", "[Measures].[Double Qty]")
        .rows("[ReturnFlag].children")
        .execute()
    )
    for row in r.df.collect():
        assert row["double_qty"] == row["sum_qty"] * 2


# ---------------------------------------------------------------- aggregates
def test_distinct_count(engine, duck):
    r = (
        q(engine)
        .columns("[Measures].[Distinct Parts]", "[Measures].[Distinct Suppliers]")
        .rows("[Customer].children")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT r_name AS region_name,
                  count(DISTINCT l_partkey) AS distinct_parts,
                  count(DISTINCT l_suppkey) AS distinct_suppliers
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           GROUP BY 1""",
    )


def test_grand_total(engine, duck):
    r = q(engine).columns("[Measures].[Sum Qty]", "[Measures].[Count Order]").execute()
    assert_df_matches_sql(
        r.df,
        duck,
        "SELECT sum(l_quantity) AS sum_qty, count(l_orderkey) AS count_order FROM lineitem",
        rel_tol=1e-6,
    )


# ----------------------------------------------------------------- metadata
def test_level_members(engine):
    df = engine.level_members("Customer", 0)
    assert [r["region_name"] for r in df.collect()] == [
        "AFRICA",
        "AMERICA",
        "ASIA",
        "EUROPE",
        "MIDDLE EAST",
    ]


def test_children_under_path(engine, duck):
    df = engine.level_members("Customer", 1, ("EUROPE",))
    assert_df_matches_sql(
        df,
        duck,
        """SELECT DISTINCT r_name AS region_name, n_name AS nation_name
           FROM nation JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'""",
    )


# -------------------------------------------------------------------- errors
def test_unknown_dimension_raises(engine):
    from mondrian_olap_spark.query import QueryError

    with pytest.raises(QueryError, match="not found in cube"):
        q(engine).rows("[Nope].children")


def test_bad_order_direction(engine):
    with pytest.raises(QueryError):
        q(engine).rows("[Customer].children").order("sum_qty", "SIDEWAYS")


def test_measure_in_slicer_rejected(engine):
    with pytest.raises(QueryError):
        q(engine).rows("[Customer].children").where("[Measures].[Sum Qty]")


def test_pivot_dims_on_columns(engine):
    """CellSet pivot: dimension members on COLUMNS x measures
    (result.rb:606-650)."""
    r = (
        q(engine)
        .columns("[LineStatus].children", "[Measures].[Sum Qty]")
        .rows("[ReturnFlag].children")
        .execute()
    )
    p = r.pivot()
    assert len(p["rows"]) == 3          # A / N / R
    assert len(p["columns"]) == 2       # F / O x one measure
    assert all(len(row) == 2 for row in p["values"])
    total = sum(v for row in p["values"] for v in row if v is not None)
    flat = q(engine).columns("[Measures].[Sum Qty]").execute().values
    assert abs(total - flat[0]) < 1e-6


def test_axes_positions(engine):
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Nation].Members")
        .execute()
    )
    axes = r.axes
    assert axes[0] == []  # measures-only columns axis
    assert len(axes[1]) == 25 and all(len(t) == 2 for t in axes[1])


def test_pages_axis(engine, duck):
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[ReturnFlag].children")
        .pages("[Priority].children")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """SELECT l_returnflag AS return_flag, o_orderpriority AS order_priority,
                  sum(l_quantity) AS sum_qty
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           GROUP BY 1, 2""",
        rel_tol=1e-6,
    )


def test_ragged_hierarchy_hides_members(spark):
    """hide_member_if (schema.rb:222-230): blank and parent-named members
    disappear from member lists; fact rows still roll up."""
    from pyspark.sql import Row

    from mondrian_olap_spark.model import Cube, Dimension, Level, Measure
    from mondrian_olap_spark.star import CubeEngine

    geo = spark.createDataFrame(
        [
            Row(id=1, country="USA", city="Boston"),
            Row(id=2, country="USA", city=""),          # blank -> hidden
            Row(id=3, country="Monaco", city="Monaco"),  # = parent -> hidden
            Row(id=4, country="France", city="Paris"),
        ]
    )
    fact = spark.createDataFrame(
        [Row(geo_id=1, v=1.0), Row(geo_id=2, v=2.0), Row(geo_id=3, v=4.0), Row(geo_id=4, v=8.0)]
    )
    cube = Cube(
        name="Ragged",
        fact="fact",
        dimensions=(
            Dimension(
                name="Geo",
                foreign_key="geo_id",
                table="geo",
                primary_key="id",
                levels=(
                    Level("Country", "country"),
                    Level("City", "city", hide_member_if="IfBlankName"),
                ),
            ),
        ),
        measures=(Measure("V", "v", "sum", output="v_sum"),),
    )
    eng = CubeEngine(cube, {"fact": fact, "geo": geo})
    cities = [r["city"] for r in eng.level_members("Geo", 1).collect()]
    assert "" not in cities and "Boston" in cities

    cube2 = Cube(
        name="Ragged2",
        fact="fact",
        dimensions=(
            Dimension(
                name="Geo",
                foreign_key="geo_id",
                table="geo",
                primary_key="id",
                levels=(
                    Level("Country", "country"),
                    Level("City", "city", hide_member_if="IfParentsName"),
                ),
            ),
        ),
        measures=(Measure("V", "v", "sum", output="v_sum"),),
    )
    eng2 = CubeEngine(cube2, {"fact": fact, "geo": geo})
    cities2 = [r["city"] for r in eng2.level_members("Geo", 1).collect()]
    assert "Monaco" not in cities2 and "Paris" in cities2

    # fact rows of hidden members still roll up to the country level
    r = (
        q(eng)
        .columns("[Measures].[V]")
        .rows("[Geo].children")
        .execute()
    )
    totals = {row["country"]: row["v_sum"] for row in r.df.collect()}
    assert totals["USA"] == 3.0 and totals["Monaco"] == 4.0


def test_approx_distinct_count(engine):
    r = (
        q(engine)
        .columns("[Measures].[Distinct Parts]", "[Measures].[Approx Parts]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.df.collect():
        exact, approx = row["distinct_parts"], row["approx_parts"]
        assert abs(approx - exact) / exact < 0.15  # HLL++ default rsd ~5%


def test_dimension_calculated_member(engine, duck):
    """Calc member on a non-Measures dimension: [Time].[H1-1995] aggregates
    Q1+Q2 of 1995 (cube_test.rb:48-51 non-measure calc member)."""
    r = (
        q(engine)
        .with_dimension_member("H1-1995", "[Time].[1995].[Q1]", "[Time].[1995].[Q2]")
        .columns("[Measures].[Sum Qty]", "[Measures].[Distinct Parts]")
        .rows("[Time].[Quarter].Members")
        .where("[Customer].[ASIA]")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        WITH base AS (
          SELECT year(o_orderdate) AS o_year, 'Q' || quarter(o_orderdate) AS o_quarter,
                 l_quantity, l_partkey
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'ASIA'
        )
        SELECT o_year, o_quarter, sum(l_quantity) AS sum_qty,
               count(DISTINCT l_partkey) AS distinct_parts
        FROM base GROUP BY 1, 2
        UNION ALL
        SELECT 1995, 'H1-1995', sum(l_quantity), count(DISTINCT l_partkey)
        FROM base WHERE o_year = 1995 AND o_quarter IN ('Q1','Q2')
        """,
        rel_tol=1e-6,
    )


def test_dimension_formula_member(engine, duck):
    """Formula calc member: [Customer].[Non-ASIA] = All - ASIA
    (cube_test.rb:48-51 '[Customers].[All Customers] - [Customers].[USA]')."""
    r = (
        q(engine)
        .with_dimension_member_formula(
            "Non-ASIA", "[Customer].[All] - [Customer].[ASIA]"
        )
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        WITH star AS (
          SELECT r_name, l_quantity
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        )
        SELECT r_name AS region_name, sum(l_quantity) AS sum_qty
        FROM star GROUP BY 1
        UNION ALL
        SELECT 'Non-ASIA', sum(l_quantity) FROM star WHERE r_name <> 'ASIA'
        """,
        rel_tol=1e-6,
    )


def test_dimension_formula_member_ratio(engine):
    """Arbitrary arithmetic: average of two sibling members' cells."""
    base = {
        r["region_name"]: r["sum_qty"]
        for r in (
            q(engine)
            .columns("[Measures].[Sum Qty]")
            .rows("[Customer].[Region].Members")
            .execute()
            .df.collect()
        )
    }
    r = (
        q(engine)
        .with_dimension_member_formula(
            "AE-Avg", "([Customer].[ASIA] + [Customer].[EUROPE]) / 2"
        )
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .execute()
    )
    rows = {r_["region_name"]: r_["sum_qty"] for r_ in r.df.collect()}
    assert rows["AE-Avg"] == pytest.approx((base["ASIA"] + base["EUROPE"]) / 2)


def test_dimension_formula_member_mdx(engine):
    """Formula member through the MDX entry point."""
    r = engine.execute(
        """
        WITH MEMBER [Customer].[Non-ASIA] AS '[Customer].[All] - [Customer].[ASIA]'
        SELECT [Measures].[Sum Qty] ON COLUMNS,
               [Customer].[Region].Members ON ROWS
        FROM [Sales]
        """
    )
    rows = {r_["region_name"]: r_["sum_qty"] for r_ in r.df.collect()}
    assert rows["Non-ASIA"] == pytest.approx(
        sum(v for k, v in rows.items() if k not in ("Non-ASIA", "ASIA"))
    )


def test_dimension_formula_member_spanning_dims_rejected(engine):
    with pytest.raises(QueryError, match="span dimensions"):
        q(engine).with_dimension_member_formula(
            "X", "[Customer].[ASIA] - [Time].[1995]"
        )


def test_dimension_member_needs_matching_level(engine):
    with pytest.raises(QueryError, match="grouped at its level"):
        (
            q(engine)
            .with_dimension_member("X", "[Time].[1995].[Q1]")
            .columns("[Measures].[Sum Qty]")
            .rows("[Customer].children")
            .execute()
        )


def test_dimension_member_mixed_parents_rejected(engine):
    with pytest.raises(QueryError, match="share a parent"):
        q(engine).with_dimension_member("X", "[Time].[1995].[Q1]", "[Time].[1996].[Q2]")


def test_drilldown_member(engine, duck):
    """DrilldownMember: regions plus ASIA's nations as extra rows
    (jar!...DrilldownMemberFunDef)."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
        .drilldown("[Customer].[ASIA]")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        SELECT r_name AS region_name, CAST(NULL AS VARCHAR) AS nation_name,
               sum(l_extendedprice) AS sum_price
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
        UNION ALL
        SELECT r_name, n_name, sum(l_extendedprice)
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' GROUP BY 1, 2
        """,
        rel_tol=1e-6,
    )


def test_cell_addressing(engine):
    """Coordinate-addressed cells (result.rb:606-650 getCell): pivot order,
    value + measure + formatted value, index errors."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Sum Price]")
        .rows("[Customer].[Region].Members")
        .execute()
    )
    p = r.pivot()
    c = r.cell(column=0, row=0)
    assert c.value == p["values"][0][0]
    assert c.measure == "sum_qty"
    assert c.row_members == p["rows"][0]
    assert isinstance(c.formatted_value, str)
    c2 = r.cell(column=1, row=2)
    assert c2.measure == "sum_price" and c2.value == p["values"][2][1]
    with pytest.raises(IndexError):
        r.cell(column=99, row=0)


def test_cell_drill_through(engine):
    """Cell.drill_through sugar (result.rb:140-157): fact rows of exactly
    the addressed cell; their measure expression sums back to the cell
    value."""
    from pyspark.sql import functions as F

    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .where("[Time].[1995]")
        .execute()
    )
    c = r.cell(column=0, row=0)
    region = c.row_members[0]
    drill = c.drill_through()
    got_regions = {x["region_name"] for x in drill.select("region_name").distinct().collect()}
    assert got_regions == {region}
    total = drill.agg(F.sum("sum_qty")).collect()[0][0]
    assert total == pytest.approx(c.value)
    # max_rows caps deterministically
    assert c.drill_through(max_rows=7).count() == 7


def test_mixed_depth_axis_set(engine, duck):
    """{[Region member], [Nation member]} on one axis: the shallower member
    appears as a total row (NULL nation), the deeper one at its own grain
    (SURVEY.md §2.6 mixed-level sets)."""
    df = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[ASIA]", "[Customer].[EUROPE].[NATION_13]")
        .execute()
        .df
    )
    rows = {(r["region_name"], r["nation_name"]): r["sum_qty"] for r in df.collect()}
    expected = {
        (r[0], r[1]): r[2]
        for r in duck.sql(
            """
            SELECT r_name, NULL, sum(l_quantity)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' GROUP BY 1
            UNION ALL
            SELECT r_name, n_name, sum(l_quantity)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'EUROPE' AND n_name = 'NATION_13' GROUP BY 1, 2
            """
        ).fetchall()
    }
    assert rows == expected


def test_single_depth_axis_unchanged(engine):
    """Same-depth enumerated sets take the fast single-aggregate path (no
    union)."""
    df = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[ASIA]", "[Customer].[EUROPE]")
        .execute()
        .df
    )
    assert {r["region_name"] for r in df.collect()} == {"ASIA", "EUROPE"}


def test_drilldown_requires_axis_dimension(engine):
    with pytest.raises(QueryError, match="not on any axis"):
        (
            q(engine)
            .columns("[Measures].[Sum Price]")
            .rows("[ReturnFlag].children")
            .drilldown("[Customer].[ASIA]")
            .execute()
        )


def test_drilldown_level_top(engine, duck):
    """DrilldownLevelTop: every region plus its top-2 nations by Sum Qty
    (jar!mondrian/olap/fun/DrilldownLevelTopBottomFunDef)."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .drilldown_level_top(2, "sum_qty")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        WITH star AS (
          SELECT r_name, n_name, l_quantity
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        )
        SELECT r_name AS region_name, CAST(NULL AS VARCHAR) AS nation_name,
               sum(l_quantity) AS sum_qty
        FROM star GROUP BY 1
        UNION ALL
        SELECT region_name, nation_name, sum_qty FROM (
          SELECT r_name AS region_name, n_name AS nation_name,
                 sum(l_quantity) AS sum_qty,
                 row_number() OVER (PARTITION BY r_name
                                    ORDER BY sum(l_quantity) DESC, n_name) AS rn
          FROM star GROUP BY 1, 2
        ) WHERE rn <= 2
        """,
        rel_tol=1e-6,
    )


def test_drilldown_level_all_children(engine):
    """DrilldownLevel without a cap: regions plus every nation."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .drilldown_level()
        .execute()
    )
    rows = r.df.collect()
    parents = [x for x in rows if x["nation_name"] is None]
    children = [x for x in rows if x["nation_name"] is not None]
    assert len(parents) == 5 and len(children) == 25


def test_drilldown_level_top_mdx(engine):
    """DRILLDOWNLEVELTOP from MDX text, with the empty level-argument slot."""
    from mondrian_olap_spark.mdx import execute_mdx

    r = execute_mdx(
        engine,
        "SELECT [Measures].[Sum Qty] ON COLUMNS, "
        "DRILLDOWNLEVELTOP([Customer].[Region].Members, 2, , [Measures].[Sum Qty]) ON ROWS "
        "FROM [Sales]",
    )
    rows = r.df.collect()
    assert len([x for x in rows if x["nation_name"] is None]) == 5
    assert len([x for x in rows if x["nation_name"] is not None]) == 10


def test_exists_filters_set_not_cells(engine, duck):
    """EXISTS(set1, set2) keeps set1 members sharing fact rows with set2;
    measures still aggregate over the UNRESTRICTED context
    (jar!mondrian/olap/fun/ExistsFunDef)."""
    r = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Customer].Members")
        .exists_("[Time].[1995].[Q1]")
        .execute()
    )
    assert_df_matches_sql(
        r.df,
        duck,
        """
        WITH star AS (
          SELECT r_name, n_name, c_name, l_quantity, o_orderdate
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        )
        SELECT r_name AS region_name, n_name AS nation_name,
               c_name AS customer_name, sum(l_quantity) AS sum_qty
        FROM star
        WHERE c_name IN (
          SELECT DISTINCT c_name FROM star
          WHERE year(o_orderdate) = 1995 AND 'Q' || quarter(o_orderdate) = 'Q1'
        )
        GROUP BY 1, 2, 3
        """,
        rel_tol=1e-6,
    )


def test_exists_mdx(engine):
    """EXISTS parses from MDX text and matches the builder."""
    from mondrian_olap_spark.mdx import execute_mdx

    r1 = execute_mdx(
        engine,
        "SELECT [Measures].[Sum Qty] ON COLUMNS, "
        "EXISTS([Customer].[Customer].Members, {[Time].[1995].[Q1]}) ON ROWS "
        "FROM [Sales]",
    )
    r2 = (
        q(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Customer].Members")
        .exists_("[Time].[1995].[Q1]")
        .execute()
    )
    assert sorted(map(tuple, r1.df.collect())) == sorted(map(tuple, r2.df.collect()))


def test_linreg_variance_reference_values(spark):
    """LinRegVariance semantics pinned to the reference's observed values
    (mondrian_test.rb:689-760): flat line → 266.67, moderate fit → 104.17,
    perfect fit → 0."""
    from pyspark.sql import Row

    from mondrian_olap_spark.functions.stats import set_aggregate

    def rss(ys):
        df = spark.createDataFrame([Row(x=float(i + 1), y=float(v)) for i, v in enumerate(ys)])
        out = set_aggregate(df, [], [("v", "linregvariance", "y", "x")]).collect()
        return out[0]["v"]

    assert abs(rss([10, 30, 10]) - 266.67) < 0.01
    assert abs(rss([10, 30, 25]) - 104.17) < 0.01
    assert abs(rss([10, 20, 30])) < 1e-9


def test_linreg_point_on_line(spark):
    from pyspark.sql import Row

    from mondrian_olap_spark.functions.stats import set_aggregate

    df = spark.createDataFrame([Row(x=1.0, y=10.0), Row(x=2.0, y=20.0), Row(x=3.0, y=30.0)])
    out = set_aggregate(df, [], [("p", "linregpoint", "y", "x", 7.0)]).collect()
    assert abs(out[0]["p"] - 70.0) < 1e-9


def test_mixed_depth_with_totals_rejected(engine):
    """Mixed-depth sets + totals would omit shallow members from the grand
    total — rejected loudly rather than silently wrong."""
    from mondrian_olap_spark.query import QueryError

    with pytest.raises(QueryError, match="mixed-depth"):
        (
            Query(engine)
            .columns("[Measures].[Sum Qty]")
            .rows("[Customer].[ASIA]", "[Customer].[EUROPE].[NATION_13]")
            .totals("rollup")
            .execute()
        )


def test_topcount_with_other_axis_selects_members(engine):
    """TOPCOUNT on ROWS with dimension members on COLUMNS must keep top-n
    MEMBERS of the rows set (evaluated in the slicer context), not top-n
    cells of the cross grid (TopBottomCountFunDef axis semantics)."""
    df = (
        Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .top_count(3, "sum_price")
        .pages("[ReturnFlag].children")
        .execute()
        .df
    )
    rows = df.collect()
    nations = {r["nation_name"] for r in rows}
    assert len(nations) == 3  # 3 members, each crossed with every flag
    assert len(rows) > 3
    # the 3 members are the overall top-3 by Sum Price
    top3 = {
        r["nation_name"]
        for r in Query(engine)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .top_count(3, "sum_price")
        .execute()
        .df.collect()
    }
    assert nations == top3


def test_head_with_other_axis_selects_members(engine):
    df = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .head(2)
        .pages("[LineStatus].children")
        .execute()
        .df
    )
    regions = {r["region_name"] for r in df.collect()}
    assert regions == {"AFRICA", "AMERICA"}


def test_hierarchize_post_places_parents_after_children(engine):
    """HIERARCHIZE(…, POST): parent rows (NULL child keys) come after
    their own subtree, not a reversed-column global sort."""
    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .drilldown("[Customer].[ASIA]")
        .hierarchize(post=True)
        .execute()
    )
    names = [(row["region_name"], row["nation_name"]) for row in r._collect()]
    asia_positions = [i for i, (r_, n) in enumerate(names) if r_ == "ASIA"]
    parent_pos = [i for i in asia_positions if names[i][1] is None][0]
    child_pos = [i for i in asia_positions if names[i][1] is not None]
    assert child_pos and all(i < parent_pos for i in child_pos)


def test_except_validates_arguments(engine):
    from mondrian_olap_spark.query import QueryError

    with pytest.raises(QueryError, match="dimension members"):
        Query(engine).rows("[Customer].children").except_("[Measures].[Sum Qty]")
    with pytest.raises(QueryError, match="concrete member paths"):
        Query(engine).rows("[Customer].children").except_("[Customer].[Nation].Members")


def test_rollup_totals_with_include_empty(engine):
    """totals rows survive the empty-cell expansion."""
    df = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Region].Members")
        .totals("rollup")
        .include_empty()
        .execute()
        .df
    )
    rows = df.collect()
    assert any(r["region_name"] is None for r in rows)  # grand total kept
    assert len([r for r in rows if r["region_name"] is not None]) == 5


def test_nano_timestamps_collect_after_conf_restore(spark):
    """read_parquet_table restores nanosAsLong after analysis; execution of
    the scan (collect) must still work and yield correct microseconds."""
    from mondrian_olap_spark.star import read_parquet_table

    from .conftest import SF_DIR

    df = read_parquet_table(spark, f"{SF_DIR}/events.parquet")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    rows = df.select("ts").limit(3).collect()
    assert rows and all(r["ts"].year >= 2020 for r in rows)
    assert df.count() > 0


def test_subselect_null_member_not_passed_through(spark):
    """A grid row whose member key is genuinely NULL in the data (unmatched
    fact FK under the left star join) stays subject to contextual set
    operations — the NULL pass-through applies only to totals/drilldown
    synthesized parent rows (ADVICE r2)."""
    from pyspark.sql import Row

    from mondrian_olap_spark.model import Cube, Dimension, Level, Measure
    from mondrian_olap_spark.star import CubeEngine

    geo = spark.createDataFrame(
        [Row(id=1, country="USA"), Row(id=2, country="France")]
    )
    fact = spark.createDataFrame(
        [
            Row(geo_id=1, cat="a", v=10.0),
            Row(geo_id=2, cat="a", v=5.0),
            Row(geo_id=99, cat="a", v=99.0),  # unmatched FK -> NULL member
        ]
    )
    cube = Cube(
        name="NullGeo",
        fact="fact",
        dimensions=(
            Dimension(
                name="Geo", foreign_key="geo_id", table="geo", primary_key="id",
                levels=(Level("Country", "country"),),
            ),
            Dimension(
                name="Cat", foreign_key=None, table=None,
                levels=(Level("Code", "cat"),),
            ),
        ),
        measures=(Measure("V", "v", "sum", output="v_sum"),),
    )
    eng = CubeEngine(cube, {"fact": fact, "geo": geo})
    r = (
        Query(eng)
        .columns("[Cat].children")
        .rows("[Geo].children")
        .top_count(1, "v_sum")
        .execute()
    )
    rows = r.df.collect()
    countries = {row["country"] for row in rows}
    # top-1 by v_sum is the NULL-key row (99.0) if NULLs compete, or USA if
    # the engine excludes NULL members from children; either way the NULL
    # row must NOT additionally bypass the top-count
    assert len(countries) == 1


# --------------------------------------------- functions review fixes (r4)
def test_tail_respects_explicit_suffix(spark):
    """TAIL with an explicit DESC spec returns the LAST rows of that
    descending order (review fix: a default flip alone is overridden by
    explicit suffixes and silently returns HEAD)."""
    from mondrian_olap_spark.functions import windows as W

    df = spark.createDataFrame(
        [(n, float(v)) for n, v in [("a", 5), ("b", 4), ("c", 3), ("d", 2)]],
        "name string, price double",
    )
    got = {r["name"] for r in W.tail(df, ["price DESC"], 2).collect()}
    assert got == {"c", "d"}  # bottom-2 of the descending order
    # unsuffixed spec: unchanged behavior
    got2 = {r["name"] for r in W.tail(df, ["price"], 2).collect()}
    assert got2 == {"a", "b"}


def test_head_deterministic_on_ties(spark):
    """HEAD on a tied measure picks the same rows every run (tiebreak =
    remaining orderable columns in name order)."""
    from mondrian_olap_spark.functions import windows as W

    df = spark.createDataFrame(
        [("z", 1.0), ("y", 1.0), ("x", 1.0), ("w", 1.0)],
        "name string, price double",
    ).repartition(4)
    first = {r["name"] for r in W.head(df, ["price"], 2).collect()}
    for _ in range(3):
        assert {r["name"] for r in W.head(df, ["price"], 2).collect()} == first
    assert first == {"w", "x"}  # name-order tiebreak, ascending


def test_set_except_is_set_difference(spark):
    """EXCEPT removes a tuple present in both sets regardless of
    multiplicity (review fix: exceptAll+dropDuplicates kept survivors)."""
    from mondrian_olap_spark.functions import sets as S

    a = spark.createDataFrame([("x",), ("x",), ("y",)], "m string")
    b = spark.createDataFrame([("x",)], "m string")
    assert {r["m"] for r in S.set_except(a, b).collect()} == {"y"}
    # ALL variant keeps per-occurrence semantics
    assert [r["m"] for r in S.set_except(a, b, all=True).collect()] == ["x", "y"]


def test_binary_stats_pairwise_null_filtering(spark):
    """Deterministic regression stats skip rows where EITHER operand is
    NULL, exactly like Spark's regr_slope (review fix: count(*) mixed with
    null-skipping sums produced inconsistent slopes)."""
    from mondrian_olap_spark.functions.stats import set_aggregate

    df = spark.createDataFrame(
        [(1.0, 10.0), (2.0, 20.0), (3.0, None), (None, 40.0)],
        "x double, y double",
    )
    out = set_aggregate(df, [], [("slope", "dlinregslope", "y", "x")]).collect()[0]
    native = df.selectExpr("regr_slope(y, x) AS s").collect()[0]["s"]
    assert out["slope"] == pytest.approx(native)  # == 10.0


def test_last_periods_edge_counts(spark):
    """LastPeriods(0) = empty set (NULL aggregate); LastPeriods(-n) = the
    |n| periods STARTING at the current one (review fix: both crashed)."""
    from mondrian_olap_spark.functions import windows as W

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "p int, v double"
    )
    zero = W.last_periods(df, "v", ["p"], 0).collect()
    assert all(r["moving_value"] is None for r in zero)
    fwd = {r["p"]: r["moving_value"]
           for r in W.last_periods(df, "v", ["p"], -2).collect()}
    assert fwd == {1: 30.0, 2: 50.0, 3: 30.0}


def test_generate_concat_desc_order(spark):
    """generate_concat honors the module's DESC suffix convention (review
    fix: it crashed at parse time)."""
    from mondrian_olap_spark.functions import windows as W

    df = spark.createDataFrame(
        [("g", "a", 1), ("g", "b", 2), ("g", "c", 3)], "grp string, name string, o int"
    )
    out = W.generate_concat(df, ["grp"], "name", ["o DESC"], sep=",").collect()
    assert out[0]["generated"] == "c,b,a"
    with pytest.raises(ValueError, match="mixed"):
        W.generate_concat(df, ["grp"], "name", ["o DESC", "name ASC"])


def test_values_single_axis_with_dimension_positions(engine):
    """A single-axis query with dimension members ON COLUMNS returns one
    value per position (review fix: only the first collected row's
    measures came back)."""
    from mondrian_olap_spark.query import Query

    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .execute()
    )
    # the 2-axis shape is unchanged
    assert len(r.values) == 5 and all(len(v) == 1 for v in r.values)
    # 1-axis: members live on the single axis -> one value per member
    r1 = (
        Query(engine)
        .columns("[Measures].[Sum Qty]", "[Measures].[Count Order]")
        .execute()
    )
    assert len(r1.values) == 2  # two measures, one position each
    assert len(r1.formatted_values) == 2


def test_row_names_one_entry_per_position(engine):
    """row_names dedups to distinct rows-axis positions when a dimension
    sits on the columns axis (review fix)."""
    from mondrian_olap_spark.query import Query

    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .execute()
    )
    assert r.row_names == sorted(r.row_names)
    assert len(r.row_names) == len(set(r.row_names)) == 5


def test_drill_through_degenerate_name_locale_formatter(spark):
    """Drill-through Name() on a DEGENERATE dimension goes through the same
    display pipeline as table dimensions (_caption_col): locale-selected
    caption expression + member formatter — not the raw caption expression
    (round-4 review pass 11 cosmetic gap, now unified)."""
    import dataclasses

    from mondrian_olap_spark.star import engine_from_parquet
    from mondrian_olap_spark.tpch import SCHEMA
    from .conftest import SF_DIR

    sales = SCHEMA.cube("Sales")
    rf = sales.dimension("ReturnFlag")
    lv = dataclasses.replace(
        rf.levels[0],
        caption="concat('Flag ', l_returnflag)",
        caption_locales=(("de", "concat('Kennzeichen ', l_returnflag)"),),
        formatter=lambda v: f"<{v}>",
    )
    rf2 = dataclasses.replace(rf, levels=(lv,))
    sales2 = dataclasses.replace(
        sales,
        dimensions=tuple(
            rf2 if d.name == "ReturnFlag" else d for d in sales.dimensions
        ),
    )
    schema2 = dataclasses.replace(
        SCHEMA,
        cubes=tuple(sales2 if c.name == "Sales" else c for c in SCHEMA.cubes),
    )
    eng = engine_from_parquet(spark, schema2, "Sales", SF_DIR).with_locale("de_DE")
    drill = eng.drill_through(
        where=["[Time].[1995]"],
        fields=[("flag_name", "Name([ReturnFlag].[ReturnFlag])")],
        max_rows=50,
    )
    got = {x["flag_name"] for x in drill.collect()}
    assert got and got <= {"<Kennzeichen A>", "<Kennzeichen N>", "<Kennzeichen R>"}

    # without a locale the declared caption is selected, formatter still runs
    eng2 = engine_from_parquet(spark, schema2, "Sales", SF_DIR)
    got2 = {
        x["flag_name"]
        for x in eng2.drill_through(
            where=["[Time].[1995]"],
            fields=[("flag_name", "Name([ReturnFlag].[ReturnFlag])")],
            max_rows=50,
        ).collect()
    }
    assert got2 and got2 <= {"<Flag A>", "<Flag N>", "<Flag R>"}


def test_drillthrough_nonempty_measures(engine):
    """query_test.rb:948-958 `nonempty:` drill option: rows whose named
    RETURN measure is NULL are dropped; both the [Measures].[X] reference
    form and the bare output-name form work; a field outside RETURN is a
    typed error."""
    from mondrian_olap_spark.query import QueryError

    fields = [
        ("region_name", "[Customer].[Region]"),
        ("sum_qty", "[Measures].[Sum Qty]"),
        ("maybe", "nullif(l_linenumber, 1)"),
    ]
    where = ["[Time].[1995].[Q1]"]
    raw = engine.drill_through(where, fields)
    n_all = raw.count()
    n_null = raw.filter("maybe IS NULL").count()
    assert n_null > 0  # the filter must have something to bite on
    kept = engine.drill_through(where, fields, nonempty="maybe")
    assert kept.count() == n_all - n_null
    assert kept.filter("maybe IS NULL").count() == 0
    # measure-reference form (comma-separable like the reference)
    ref = engine.drill_through(
        where, fields, nonempty="[Measures].[Sum Qty], maybe"
    )
    assert ref.count() == n_all - n_null  # sum_qty itself is never NULL
    with pytest.raises(QueryError, match="not among the RETURN fields"):
        engine.drill_through(where, fields, nonempty="nope").count()
    with pytest.raises(QueryError, match="measure references"):
        engine.drill_through(
            where, fields, nonempty="[Customer].[Region]"
        ).count()


def test_drillthrough_nonempty_measure_under_custom_alias(engine):
    """A measure RETURNed under a custom alias still satisfies its own
    [Measures].[X] nonempty reference — the reference resolves to the
    RETURN entry carrying the measure's expression, not to a hardcoded
    default output name."""
    fields = [
        ("region_name", "[Customer].[Region]"),
        ("qty2", "[Measures].[Sum Qty]"),
    ]
    where = ["[Time].[1995].[Q1]"]
    out = engine.drill_through(
        where, fields, nonempty="[Measures].[Sum Qty]"
    )
    assert out.columns == ["region_name", "qty2"]
    assert out.count() > 0
    assert out.filter("qty2 IS NULL").count() == 0


def test_filter_by_member_property(engine, duck):
    """mondrian_test.rb:125-131 (Filter by CurrentMember.Properties):
    members filter on a declared level property; the property column is
    joined for the filter and dropped from the output; errors are typed
    for off-axis dimensions and unknown properties."""
    from mondrian_olap_spark.mdx import execute_mdx
    from mondrian_olap_spark.query import QueryError

    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Part].[Part].Members")
        .filter("[Part].CurrentMember.Properties('part_size') >= 40")
        .execute()
    )
    rows = r.df.collect()
    assert "part_size" not in r.df.columns
    expect = {
        t[0]
        for t in duck.execute(
            "SELECT DISTINCT p_name FROM part WHERE p_size >= 40"
        ).fetchall()
    }
    got = {row["part_name"] for row in rows}
    # members with fact data and size >= 40 (grid is non-empty by default)
    assert got and got <= expect
    # MDX surface drives the same path
    mdx = execute_mdx(
        engine,
        """
        SELECT [Measures].[Sum Qty] ON COLUMNS,
               FILTER([Part].[Part].Members,
                      [Part].CurrentMember.Properties('part_size') >= 40)
               ON ROWS FROM [Sales]
        """,
    )
    assert {row["part_name"] for row in mdx.df.collect()} == got
    with pytest.raises(QueryError, match="declares no property"):
        (Query(engine).columns("[Measures].[Sum Qty]")
         .rows("[Part].[Part].Members")
         .filter("[Part].CurrentMember.Properties('nope') = 1").execute())
    with pytest.raises(QueryError, match="needs the dimension on the axis"):
        (Query(engine).columns("[Measures].[Sum Qty]")
         .rows("[Customer].children")
         .filter("[Part].CurrentMember.Properties('part_size') > 1")
         .execute())


def test_builder_setexpr_surface(engine):
    """SetExpr is the builder-level computed-set argument (the package
    exports it): exists_/except_ accept one directly — reference-style
    builder nesting without MDX text."""
    from mondrian_olap_spark import Query, SetExpr

    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Nation].Members")
        .exists_(
            SetExpr(
                members=("[ReturnFlag].Children",),
                ops=(("filter", "sum_qty > 6000"),),
            )
        )
        .execute()
    )
    assert r.df.count() > 0
    r2 = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Nation].Members")
        .except_(
            SetExpr(
                members=("[Customer].[Nation].Members",),
                ops=(("topbottom", "top", "count", 3, "sum_qty"),),
            )
        )
        .execute()
    )
    assert r2.df.count() == 22  # 25 nations minus the top 3


def test_setexpr_mixed_depth_filter(engine, duck):
    """Mixed-depth computed set (round-12 verdict item 2): FILTER over
    {[1995], [1995].[Q1], [1996].[Q1]} evaluates each member's condition
    at its OWN grain (per-depth sub-aggregates, NULL-padded union), and
    the survivors — possibly at different depths — slice the axis."""
    from mondrian_olap_spark import Query, SetExpr

    # year total ≫ quarter totals at every SF: keep only the quarters
    year_total = duck.execute(
        "SELECT sum(l_quantity) FROM lineitem JOIN orders "
        "ON l_orderkey = o_orderkey WHERE year(o_orderdate) = 1995"
    ).fetchone()[0]
    thr = int(year_total) - 1
    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].[Nation].Members")
        .exists_(
            SetExpr(
                members=(
                    "[Time].[1995]",
                    "[Time].[1995].[Q1]",
                    "[Time].[1996].[Q1]",
                ),
                ops=(("filter", f"sum_qty < {thr}"),),
            )
        )
        .execute()
    )
    exp = duck.execute(
        """
        SELECT count(DISTINCT n_name) FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE (year(o_orderdate) = 1995 AND quarter(o_orderdate) = 1)
           OR (year(o_orderdate) = 1996 AND quarter(o_orderdate) = 1)
        """
    ).fetchone()[0]
    assert r.df.count() == exp


def test_setexpr_mixed_depth_except_depth_pinned(engine):
    """EXCEPT inside a mixed-depth computed set removes the exact member
    only (ExceptFunDef removes tuples, never descendants): excepting
    [1995] keeps [1995].[Q1] even though the quarter shares the year
    key."""
    from mondrian_olap_spark import Query, SetExpr

    se = SetExpr(
        members=("[Time].[1995]", "[Time].[1995].[Q1]"),
        ops=(("except", ["[Time].[1995]"]),),
    )
    refs = Query(engine).eval_set_expr(se)
    assert [(r.depth, r.path) for r in refs] == [(1, ("1995", "Q1"))]


def test_setexpr_tail_after_order(engine, duck):
    """TAIL after a custom ORDER inside a computed set slices from the
    END of that order (HeadTailFunDef) — previously raised."""
    from mondrian_olap_spark import Query, SetExpr

    se = SetExpr(
        members=("[Customer].[Nation].Members",),
        ops=(
            ("order", "sum_qty", "BDESC"),
            ("slice", 0, 3, True),
        ),
    )
    refs = Query(engine).eval_set_expr(se)
    exp = duck.execute(
        """
        SELECT n_name FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY sum(l_quantity) ASC, n_name LIMIT 3
        """
    ).fetchall()
    assert sorted(r.path[-1] for r in refs) == sorted(x[0] for x in exp)


def _ragged_leaves_engine(spark):
    from pyspark.sql import Row

    from mondrian_olap_spark.model import Cube, Dimension, Level, Measure
    from mondrian_olap_spark.star import CubeEngine

    geo = spark.createDataFrame(
        [
            Row(id=1, country="USA", city="Boston"),
            Row(id=2, country="USA", city=""),        # hidden under USA
            Row(id=3, country="Vatican", city=""),    # ALL hidden -> leaf
            Row(id=4, country="France", city="Paris"),
        ]
    )
    fact = spark.createDataFrame(
        [
            Row(geo_id=1, v=1.0),
            Row(geo_id=2, v=2.0),
            Row(geo_id=3, v=4.0),
            Row(geo_id=4, v=8.0),
        ]
    )
    cube = Cube(
        name="Ragged",
        fact="fact",
        dimensions=(
            Dimension(
                name="Geo",
                foreign_key="geo_id",
                table="geo",
                primary_key="id",
                levels=(
                    Level("Country", "country", output="country"),
                    Level(
                        "City", "city", output="city",
                        hide_member_if="IfBlankName",
                    ),
                ),
                guaranteed_small=True,
            ),
        ),
        measures=(Measure("V", "v", "sum", output="v_sum"),),
    )
    return CubeEngine(cube, {"fact": fact, "geo": geo})


def test_ragged_leaves_mixed_depth(spark):
    """Descendants(m, lvl, LEAVES) on a ragged hierarchy returns leaf
    members at MIXED depths (round-12 verdict item 3): visible cities
    plus each country whose cities are ALL hidden."""
    from mondrian_olap_spark.mdx import execute_mdx

    eng = _ragged_leaves_engine(spark)
    rows = execute_mdx(
        eng,
        "SELECT [Measures].[V] ON COLUMNS, "
        "DESCENDANTS([Geo].[USA], [Geo].[City], LEAVES) ON ROWS "
        "FROM [Ragged]",
    ).df.collect()
    # USA has a visible city -> NOT a leaf itself; only Boston
    assert [(r["country"], r["city"], r["v_sum"]) for r in rows] == [
        ("USA", "Boston", 1.0)
    ]
    rows2 = execute_mdx(
        eng,
        "SELECT [Measures].[V] ON COLUMNS, "
        "DESCENDANTS([Geo].[Vatican], [Geo].[City], LEAVES) ON ROWS "
        "FROM [Ragged]",
    ).df.collect()
    # all cities hidden -> the country itself is the leaf, at depth 0,
    # with its hidden rows still aggregated into the cell
    assert [(r["country"], r["city"], r["v_sum"]) for r in rows2] == [
        ("Vatican", None, 4.0)
    ]


def test_nonragged_leaves_above_bottom_still_raises(engine):
    """Without hide rules, LEAVES above the bottom level stays a raise
    (silently-empty axis guard — unchanged round-8 behavior)."""
    import pytest as _pytest

    from mondrian_olap_spark.mdx import MdxError, execute_mdx

    with _pytest.raises(MdxError, match="LEAVES above the bottom"):
        execute_mdx(
            engine,
            "SELECT [Measures].[Sum Qty] ON COLUMNS, "
            "DESCENDANTS([Customer].[ASIA], [Customer].[Nation], LEAVES) "
            "ON ROWS FROM [Sales]",
        )


def test_ragged_hidden_member_not_a_grid_row(spark):
    """A hide_member_if-hidden member must not surface as a grid ROW at
    its level, while its fact rows still roll into ancestors (the
    round-12 _ragged_hidden_filter)."""
    from mondrian_olap_spark import Query

    eng = _ragged_leaves_engine(spark)
    rows = (
        Query(eng)
        .columns("[Measures].[V]")
        .rows("[Geo].[City].Members")
        .execute()
        .df.collect()
    )
    cities = {r["city"] for r in rows}
    assert "" not in cities and cities == {"Boston", "Paris"}
    # country level: hidden cities' rows still count in the parent cell
    rows2 = (
        Query(eng)
        .columns("[Measures].[V]")
        .rows("[Geo].[Country].Members")
        .execute()
        .df.collect()
    )
    vals = {r["country"]: r["v_sum"] for r in rows2}
    assert vals == {"USA": 3.0, "Vatican": 4.0, "France": 8.0}


def test_setexpr_except_deeper_than_grain_is_noop(engine):
    """EXCEPT inside a computed set with a member DEEPER than the set's
    grain removes nothing (ExceptFunDef exact-tuple semantics) instead
    of raising an unresolved-column error (round-12 review finding)."""
    from mondrian_olap_spark import Query, SetExpr

    se = SetExpr(
        members=("[Time].[1995]", "[Time].[1996]"),
        ops=(("except", ["[Time].[1995].[Q1]"]),),
    )
    refs = Query(engine).eval_set_expr(se)
    assert sorted(r.path for r in refs) == [("1995",), ("1996",)]


def test_setexpr_except_shallow_member_single_depth_noop(engine):
    """A shallower EXCEPT member never matches a deeper set's members —
    even in a single-depth set (the depth pin applies unconditionally,
    round-12 review finding)."""
    from mondrian_olap_spark import Query, SetExpr

    se = SetExpr(
        members=("[Time].[1995].[Q1]", "[Time].[1996].[Q1]"),
        ops=(("except", ["[Time].[1995]"]),),
    )
    refs = Query(engine).eval_set_expr(se)
    assert sorted(r.path for r in refs) == [
        ("1995", "Q1"), ("1996", "Q1")
    ]
