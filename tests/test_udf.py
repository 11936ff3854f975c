"""UDF surface tests (schema_udf.rb analog: registered functions usable in
query expressions; cell formatters)."""

import pandas as pd

from mondrian_olap_spark.query import Query
from mondrian_olap_spark.udf import register_scalar, registered_functions


def test_row_udf_in_with_member(spark, engine):
    register_scalar(spark, "py_markup", lambda x: x * 1.1 if x is not None else None)
    r = (
        Query(engine)
        .with_member("Marked Up")
        .as_("py_markup(sum_price)", output="marked_up")
        .columns("[Measures].[Sum Price]", "[Measures].[Marked Up]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.df.collect():
        assert abs(row["marked_up"] - row["sum_price"] * 1.1) < 1e-6
    assert "py_markup" in registered_functions(spark)


def test_pandas_udf_vectorized(spark, engine):
    def clip(s: pd.Series) -> pd.Series:
        return s.clip(upper=1000.0)

    register_scalar(spark, "py_clip", clip, returns="double", vectorized=True)
    r = (
        Query(engine)
        .with_member("Clipped")
        .as_("py_clip(avg_price)", output="clipped")
        .columns("[Measures].[Avg Price]", "[Measures].[Clipped]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.df.collect():
        assert row["clipped"] == min(row["avg_price"], 1000.0)


def test_default_is_arrow_batched(spark, engine, recwarn):
    """register_scalar without flags rides the Arrow/pandas path (the
    scale-safe default, VERDICT r2 #4): no slow-path warning, and the
    callable observes pandas batch values (NaN for missing doubles)."""
    seen_types = set()

    def probe(x):
        seen_types.add(type(x).__name__)
        return float(x) * 3.0

    register_scalar(spark, "py_probe", probe)
    r = (
        Query(engine)
        .with_member("Tripled")
        .as_("py_probe(sum_qty)", output="tripled")
        .columns("[Measures].[Sum Qty]", "[Measures].[Tripled]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.df.collect():
        assert abs(row["tripled"] - row["sum_qty"] * 3.0) < 1e-6
    assert not [w for w in recwarn.list if "row-at-a-time" in str(w.message)]
    # values arrived via pandas batches, not one-python-object-per-row rows
    assert seen_types <= {"float", "float64", "int64"}


def test_row_udf_explicit_opt_out(spark, engine):
    register_scalar(
        spark, "py_rowwise", lambda x: x + 0.5, returns="double", vectorized=False
    )
    r = (
        Query(engine)
        .with_member("Shifted")
        .as_("py_rowwise(avg_price)", output="shifted")
        .columns("[Measures].[Avg Price]", "[Measures].[Shifted]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.df.collect():
        assert abs(row["shifted"] - (row["avg_price"] + 0.5)) < 1e-6


def test_udf_in_filter_condition(spark, engine):
    register_scalar(spark, "py_is_big", lambda x: bool(x > 1000), returns="boolean")
    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows("[Customer].children")
        .filter("py_is_big(sum_qty)")
        .execute()
    )
    assert all(row["sum_qty"] > 1000 for row in r.df.collect())


def test_cell_formatter(engine):
    r = (
        Query(engine)
        .with_member("Pretty")
        .as_("sum_qty", output="pretty", cell_formatter=lambda v: f"<{v:.0f}>")
        .columns("[Measures].[Pretty]")
        .rows("[Customer].children")
        .execute()
    )
    for row in r.formatted_values:
        assert row[0].startswith("<") and row[0].endswith(">")


def test_set_valued_udf_builder(engine):
    """Set-valued UDF (call_with_evaluator analog, schema_udf.rb:120-180):
    a callable receives the engine at planning time and returns member
    identifiers — usable directly as an axis element."""
    from mondrian_olap_spark.query import Query
    from mondrian_olap_spark.udf import register_set_function, set_function

    def top_two_regions(eng):
        rows = eng.level_members("Customer", 0).limit(2).collect()
        return [f"[Customer].[{r['region_name']}]" for r in rows]

    register_set_function("TopTwoRegions", top_two_regions)
    r = (
        Query(engine)
        .columns("[Measures].[Sum Qty]")
        .rows(set_function("TopTwoRegions"))
        .execute()
    )
    assert {x["region_name"] for x in r.df.collect()} == {"AFRICA", "AMERICA"}


def test_set_valued_udf_mdx(engine):
    """Registered set-valued UDFs are callable by name in MDX text."""
    from mondrian_olap_spark.udf import register_set_function

    register_set_function(
        "AsiaEurope", lambda eng: ["[Customer].[ASIA]", "[Customer].[EUROPE]"]
    )
    r = engine.execute(
        "SELECT [Measures].[Sum Qty] ON COLUMNS, AsiaEurope() ON ROWS FROM [Sales]"
    )
    assert {x["region_name"] for x in r.df.collect()} == {"ASIA", "EUROPE"}


def test_set_udf_stringified_in_formula(engine):
    """SetToStr / TupleToStr over a registered set UDF as a MEASURE value
    (schema_definition_test.rb:1111-1138): the set resolves at translation
    time into a string constant; member identifiers inside it are never
    re-resolved as references."""
    from mondrian_olap_spark.udf import register_set_function

    register_set_function(
        "PairRegions", lambda eng: ["[Customer].[ASIA]", "[Customer].[EUROPE]"]
    )
    r = engine.execute(
        """
        WITH MEMBER [Measures].[s] AS 'SetToStr(PairRegions())'
             MEMBER [Measures].[t] AS 'TupleToStr(PairRegions())'
        SELECT {[Measures].[s], [Measures].[t]} ON COLUMNS FROM [Sales]
        """
    )
    row = r.df.collect()[0]
    assert row["s"] == "{[Customer].[ASIA], [Customer].[EUROPE]}"
    assert row["t"] == "([Customer].[ASIA], [Customer].[EUROPE])"


def test_member_formatter_callable(spark):
    """Python MEMBER FORMATTER on a level (schema_udf.rb:241-249): applied
    to the caption column as an Arrow-batched pandas UDF."""
    import dataclasses

    from mondrian_olap_spark.star import engine_from_parquet
    from mondrian_olap_spark.tpch import SCHEMA

    from .conftest import SF_DIR

    sales = SCHEMA.cube("Sales")
    cust = sales.dimension("Customer")
    lv0 = dataclasses.replace(cust.levels[0], formatter=lambda v: v.title())
    cust2 = dataclasses.replace(cust, levels=(lv0,) + cust.levels[1:])
    sales2 = dataclasses.replace(
        sales,
        dimensions=tuple(
            cust2 if d.name == "Customer" else d for d in sales.dimensions
        ),
    )
    schema2 = dataclasses.replace(
        SCHEMA, cubes=tuple(sales2 if c.name == "Sales" else c for c in SCHEMA.cubes)
    )
    eng = engine_from_parquet(spark, schema2, "Sales", SF_DIR)
    rows = eng.level_members("Customer", 0, include_properties=True).collect()
    caps = {r["region_name"]: r["region_name_caption"] for r in rows}
    assert caps["AFRICA"] == "Africa" and caps["MIDDLE EAST"] == "Middle East"


def test_default_path_preserves_none_semantics(spark, engine):
    """The Arrow-default wrapper delivers Python None for missing values
    (review fix): 'x is None' guards written against the old row-UDF
    default keep firing instead of seeing NaN."""
    register_scalar(
        spark, "py_none_guard", lambda x: -1.0 if x is None else float(x)
    )
    df = spark.createDataFrame([(1.0,), (None,), (3.0,)], "x double")
    df.createOrReplaceTempView("none_probe")
    rows = spark.sql(
        "SELECT py_none_guard(x) AS y FROM none_probe ORDER BY y"
    ).collect()
    # the NULL cell hit the 'is None' branch, not a NaN fall-through
    assert [r["y"] for r in rows] == [-1.0, 1.0, 3.0]
    # two-arg form cleans each argument too
    register_scalar(
        spark,
        "py_none_add",
        lambda a, b: -9.0 if (a is None or b is None) else a + b,
    )
    rows2 = spark.sql(
        "SELECT py_none_add(x, 1.0d) AS y FROM none_probe ORDER BY y"
    ).collect()
    assert [r["y"] for r in rows2] == [-9.0, 2.0, 4.0]


def test_default_path_delivers_python_natives(spark, engine):
    """The Arrow-default wrapper hands callables Python natives, not numpy
    scalars (np.int64 is not an int subclass) — an isinstance(x, int)
    guard written against the old row-UDF default keeps working."""
    register_scalar(
        spark,
        "py_int_guard",
        lambda x: 1.0 if isinstance(x, int) else 0.0,
    )
    df = spark.createDataFrame([(1,), (2,)], "x bigint")
    df.createOrReplaceTempView("native_probe")
    rows = spark.sql("SELECT py_int_guard(x) AS y FROM native_probe").collect()
    assert [r["y"] for r in rows] == [1.0, 1.0]
    # multi-arg path cleans every argument
    register_scalar(
        spark,
        "py_int_guard2",
        lambda a, b: 1.0 if isinstance(a, int) and isinstance(b, float) else 0.0,
    )
    df2 = spark.createDataFrame([(1, 2.0,)], "a bigint, b double")
    df2.createOrReplaceTempView("native_probe2")
    rows2 = spark.sql(
        "SELECT py_int_guard2(a, b) AS y FROM native_probe2"
    ).collect()
    assert [r["y"] for r in rows2] == [1.0]


def test_current_member_property_and_method_udfs(spark, engine):
    """schema_definition_test.rb:1055-1071 member-property/method UDFs:
    [Dim].CurrentMember.Name builtin, a registered UDF as a property, and
    the method form with arguments — each cell evaluates on the row's own
    member; unknown properties and off-axis dimensions raise typed
    errors."""
    import pytest

    from mondrian_olap_spark.mdx import execute_mdx
    from mondrian_olap_spark.query import QueryError

    register_scalar(
        spark, "UpperName",
        lambda s: s.upper() if s is not None else None, returns="string",
    )
    register_scalar(
        spark, "SuffixName",
        lambda s, suf: (s or "") + suf, returns="string",
    )
    r = execute_mdx(
        engine,
        """
        WITH MEMBER [Measures].[nm] AS '[Customer].CurrentMember.Name'
             MEMBER [Measures].[un] AS '[Customer].CurrentMember.UpperName'
             MEMBER [Measures].[um] AS
               '[Customer].CurrentMember.SuffixName(''!'')'
        SELECT {[Measures].[nm], [Measures].[un], [Measures].[um]} ON COLUMNS,
               [Customer].Children ON ROWS FROM [Sales]
        """,
    )
    for row in r.df.collect():
        assert row["nm"] == row["region_name"]
        assert row["un"] == row["region_name"].upper()
        assert row["um"] == row["region_name"] + "!"
    # deepest projected level binds CurrentMember (nation under region)
    r2 = execute_mdx(
        engine,
        """
        WITH MEMBER [Measures].[un] AS '[Customer].CurrentMember.UpperName'
        SELECT {[Measures].[un]} ON COLUMNS,
               [Customer].[Nation].Members ON ROWS FROM [Sales]
        """,
    )
    row = r2.df.collect()[0]
    assert row["un"] == row["nation_name"].upper()
    # singleton-set sugar: {[Dim].CurrentMember}.prop is the member form
    # (schema_definition_test.rb:1073-1089 set-property UDFs)
    r3 = execute_mdx(
        engine,
        """
        WITH MEMBER [Measures].[un] AS '{[Customer].CurrentMember}.UpperName'
        SELECT {[Measures].[un]} ON COLUMNS,
               [Customer].Children ON ROWS FROM [Sales]
        """,
    )
    for rr in r3.df.collect():
        assert rr["un"] == rr["region_name"].upper()
    from mondrian_olap_spark import Query
    with pytest.raises(QueryError, match="unknown member property"):
        (Query(engine).with_member("x")
         .as_("[Customer].CurrentMember.NoSuchProp", output="x")
         .columns("[Measures].[x]").rows("[Customer].children").execute())
    with pytest.raises(QueryError, match="needs the dimension on an axis"):
        (Query(engine).with_member("x")
         .as_("[Part].CurrentMember.UpperName", output="x")
         .columns("[Measures].[x]").rows("[Customer].children").execute())


def test_unused_currentmember_calc_member_is_lazy(spark, engine):
    """A WITH member whose CurrentMember cannot bind (its dimension is on
    no axis) must NOT fail a query that never selects it — Mondrian
    evaluates calc members lazily.  Selecting it still raises."""
    import pytest

    register_scalar(spark, "UpperName2", lambda s: s.upper() if s else None)
    q = (
        Query(engine)
        .with_member("Unused")
        .as_("[Part].CurrentMember.UpperName2", output="unused")
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].children")
    )
    r = q.execute()
    assert r.df.count() > 0
    assert "unused" not in r.df.columns
    from mondrian_olap_spark.query import QueryError
    with pytest.raises(QueryError, match="needs the dimension on an axis"):
        (Query(engine).with_member("Unused")
         .as_("[Part].CurrentMember.UpperName2", output="unused")
         .columns("[Measures].[Unused]").rows("[Customer].children")
         .execute())


def test_property_formatter_callable(spark):
    """Python PROPERTY FORMATTER (schema_udf.rb:252-261 PropertyFormatter):
    a (name, expr, callable) property entry surfaces the raw typed value
    AND an Arrow-batched `<name>_formatted` display column — Mondrian's
    getPropertyValue vs getPropertyFormattedValue duality."""
    import dataclasses

    from mondrian_olap_spark.star import engine_from_parquet
    from mondrian_olap_spark.tpch import SCHEMA

    from .conftest import SF_DIR

    sales = SCHEMA.cube("Sales")
    cust = sales.dimension("Customer")
    lv0 = dataclasses.replace(
        cust.levels[0],
        properties=(
            ("name_len", "length(r_name)", lambda v: f"{v} chars"),
        ),
    )
    cust2 = dataclasses.replace(cust, levels=(lv0,) + cust.levels[1:])
    sales2 = dataclasses.replace(
        sales,
        dimensions=tuple(
            cust2 if d.name == "Customer" else d for d in sales.dimensions
        ),
    )
    schema2 = dataclasses.replace(
        SCHEMA,
        cubes=tuple(sales2 if c.name == "Sales" else c for c in SCHEMA.cubes),
    )
    eng = engine_from_parquet(spark, schema2, "Sales", SF_DIR)
    rows = eng.level_members("Customer", 0, include_properties=True).collect()
    got = {r["region_name"]: (r["name_len"], r["name_len_formatted"]) for r in rows}
    assert got["AFRICA"] == (6, "6 chars")
    assert got["MIDDLE EAST"] == (11, "11 chars")
    # raw value access is untouched by the formatter
    assert eng.member_property_value("Customer", 0, ("ASIA",), "name_len") == 4


def test_cache_mdx_spelling(engine):
    """Cache(expr) MDX spelling (jar!mondrian/olap/fun/CacheFunDef):
    transparent for values — the wrapped formula evaluates identically —
    and the evaluated grid is persisted for intra-result reuse."""
    from mondrian_olap_spark.mdx import execute_mdx

    cached = execute_mdx(
        engine,
        "WITH MEMBER [Measures].[X] AS 'Cache([Measures].[Sum Qty] * 2)' "
        "SELECT {[Measures].[X]} ON COLUMNS, "
        "[Customer].[Region].Members ON ROWS FROM [Sales]",
    )
    plain = execute_mdx(
        engine,
        "WITH MEMBER [Measures].[X] AS '[Measures].[Sum Qty] * 2' "
        "SELECT {[Measures].[X]} ON COLUMNS, "
        "[Customer].[Region].Members ON ROWS FROM [Sales]",
    )
    assert sorted(map(tuple, cached.df.collect())) == sorted(
        map(tuple, plain.df.collect())
    )
    # Result.df derives an ordered view; the persist sits on the grid.
    # (Spark's CacheManager is plan-keyed, so the identical-plan 'plain'
    # query ALSO reports cached — the hint benefits equivalent plans.)
    assert cached._df.storageLevel.useMemory  # persisted by the hint
    cached._df.unpersist()
