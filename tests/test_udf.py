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
