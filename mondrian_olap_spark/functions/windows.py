"""Window-function implementations of MDX navigation / ranking / time
functions (SURVEY.md §2.5).

Inputs are aggregated cell DataFrames (one row per axis position).  ``order``
/ ``partition`` arguments are lists of SQL expression strings (usually level
output columns); the row_number-based slicers (HEAD/TAIL/SUBSET) append the
frame's remaining orderable columns as a deterministic tiebreak so the
selected rows are stable on ties across runs and shuffle layouts.  RANK
deliberately does NOT get tiebreaks — rank ties are semantic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, WindowSpec
from pyspark.sql import functions as F


def _order_col(spec: str, default_desc: bool):
    """Order spec: a SQL expression with an optional trailing ASC/DESC."""
    s = spec.strip()
    upper = s.upper()
    if upper.endswith(" DESC"):
        return F.expr(s[:-5]).desc()
    if upper.endswith(" ASC"):
        return F.expr(s[:-4]).asc()
    return F.expr(s).desc() if default_desc else F.expr(s).asc()


def _invert_spec(spec: str) -> str:
    """Reverse one order spec: explicit ASC/DESC suffixes swap (a default
    flip alone would be silently overridden by them)."""
    s = spec.strip()
    upper = s.upper()
    if upper.endswith(" DESC"):
        return s[:-5] + " ASC"
    if upper.endswith(" ASC"):
        return s[:-4] + " DESC"
    return s  # unsuffixed — the flipped default handles it


#: column dtypes that cannot participate in an ORDER BY tiebreak
_UNORDERABLE = ("array<", "map<", "struct<")


def _tiebreaks(df: DataFrame, order: list[str]) -> list[str]:
    """Deterministic tiebreak columns: every orderable frame column not
    already referenced in the order specs, in name order.  Referenced-ness
    is by whole identifier — a bare substring test would silently drop a
    column like ``price`` from the tiebreaks whenever an order spec
    mentions ``price_total``, reintroducing tie nondeterminism."""
    import re

    mentioned = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", " ".join(order)))
    return sorted(
        name
        for name, dtype in df.dtypes
        if name not in mentioned and not dtype.startswith(_UNORDERABLE)
    )


def _window(order: list[str], partition: list[str] | None, desc: bool = False) -> WindowSpec:
    cols = [_order_col(o, desc) for o in order]
    w = Window.orderBy(*cols)
    if partition:
        w = Window.partitionBy(*[F.expr(p) for p in partition]).orderBy(*cols)
    return w


def rank_over(
    df: DataFrame,
    expr: str,
    partition: list[str] | None = None,
    desc: bool = True,
    output: str = "rank",
    dense: bool = False,
) -> DataFrame:
    """RANK(member, set[, expr]) — 1-based rank in a set ordered by ``expr``
    (jar!mondrian/olap/fun/RankFunDef; used test/mondrian_test.rb:617-623)."""
    w = _window([expr], partition, desc=desc)
    fn = F.dense_rank() if dense else F.rank()
    return df.withColumn(output, fn.over(w))


def row_index(
    df: DataFrame,
    order: list[str],
    partition: list[str] | None = None,
    desc: bool = False,
    output: str = "rn",
) -> DataFrame:
    """1-based position of each member in set order — the primitive behind
    HEAD / TAIL / SUBSET / Item(i) (jar!...HeadTailFunDef, SubsetFunDef)."""
    return df.withColumn(output, F.row_number().over(_window(order, partition, desc)))


def head(df: DataFrame, order: list[str], n: int, desc: bool = False) -> DataFrame:
    """HEAD(set, n) (jar!...HeadTailFunDef; test/query_test.rb:478-482)."""
    return (
        row_index(df, order + _tiebreaks(df, order), desc=desc, output="__rn")
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def tail(df: DataFrame, order: list[str], n: int, desc: bool = False) -> DataFrame:
    """TAIL(set, n) — last n in set order.  Explicit ASC/DESC suffixes in
    the specs invert too (a default flip alone would be overridden by
    them and silently return HEAD)."""
    return head(df, [_invert_spec(o) for o in order], n, desc=not desc)


def subset(df: DataFrame, order: list[str], start: int, count: int, desc: bool = False) -> DataFrame:
    """SUBSET(set, start[, count]) — 0-based slice (jar!...SubsetFunDef)."""
    return (
        row_index(df, order + _tiebreaks(df, order), desc=desc, output="__rn")
        .filter((F.col("__rn") > start) & (F.col("__rn") <= start + count))
        .drop("__rn")
    )


def lag_over(
    df: DataFrame,
    expr: str,
    order: list[str],
    partition: list[str] | None = None,
    offset: int = 1,
    output: str = "lag_value",
) -> DataFrame:
    """PrevMember / NextMember / Lag / Lead value navigation
    (jar!...LeadLagFunDef) and ParallelPeriod (jar!...ParallelPeriodFunDef):

    * ``lag_over(df, 'sum_price', ['o_year','o_month'])`` — previous member's
      value in level order (PrevMember);
    * ``lag_over(df, 'sum_price', ['o_year'], partition=['o_month'])`` — same
      month previous year (ParallelPeriod(Year, 1));
    * negative ``offset`` → Lead / NextMember.
    """
    w = _window(order, partition)
    fn = F.lag(F.expr(expr), offset) if offset >= 0 else F.lead(F.expr(expr), -offset)
    return df.withColumn(output, fn.over(w))


def cumulative(
    df: DataFrame,
    expr: str,
    order: list[str],
    partition: list[str] | None = None,
    output: str = "cum_value",
    agg: str = "sum",
) -> DataFrame:
    """YTD / QTD / MTD / PeriodsToDate — running aggregate from the period
    start (jar!...XtdFunDef, PeriodsToDateFunDef): partition by the period
    parent, order by ordinal, frame = unboundedPreceding..currentRow."""
    w = _window(order, partition).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fn = getattr(F, agg)
    return df.withColumn(output, fn(F.expr(expr)).over(w))


def last_periods(
    df: DataFrame,
    expr: str,
    order: list[str],
    n: int,
    partition: list[str] | None = None,
    output: str = "moving_value",
    agg: str = "sum",
) -> DataFrame:
    """LastPeriods(n) — trailing-n-period aggregate
    (jar!...LastPeriodsFunDef): frame rowsBetween(-(n-1), 0).  MDX edge
    semantics: n == 0 is the EMPTY set (aggregate → NULL); negative n is
    the |n| periods STARTING at the current one (a forward frame)."""
    fn = getattr(F, agg)
    if n == 0:
        # empty set: typed NULL (match the aggregate's natural type)
        return df.withColumn(
            output, F.lit(None).cast(df.select(F.expr(expr)).schema[0].dataType)
        )
    if n < 0:
        w = _window(order, partition).rowsBetween(Window.currentRow, -n - 1)
    else:
        w = _window(order, partition).rowsBetween(-(n - 1), Window.currentRow)
    return df.withColumn(output, fn(F.expr(expr)).over(w))


def opening_period(
    df: DataFrame,
    expr: str,
    order: list[str],
    partition: list[str],
    output: str = "opening_value",
) -> DataFrame:
    """OpeningPeriod — value of the first descendant period within the parent
    (jar!...OpeningClosingPeriodFunDef)."""
    w = _window(order, partition).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return df.withColumn(output, F.first(F.expr(expr)).over(w))


def closing_period(
    df: DataFrame,
    expr: str,
    order: list[str],
    partition: list[str],
    output: str = "closing_value",
) -> DataFrame:
    """ClosingPeriod — value of the last descendant period within the parent."""
    w = _window(order, partition).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return df.withColumn(output, F.last(F.expr(expr)).over(w))


def generate_concat(
    df: DataFrame,
    group_cols: list[str],
    expr: str,
    order: list[str],
    sep: str = ", ",
    output: str = "generated",
) -> DataFrame:
    """GENERATE(set, string_expr[, separator]) string form — concatenates the
    expression over the set per group (jar!...GenerateFunDef; string-form
    behavior test/mondrian_test.rb:491-517).

    Implemented as ``array_join(array_sort(collect_list(struct(order, expr))))``
    so the concatenation order is deterministic under parallel aggregation.
    Order specs accept the module's ASC/DESC suffix convention; all specs
    must share one direction (struct sort is single-direction), mixed
    directions raise.
    """
    keys: list = []
    dirs: set[bool] = set()
    for o in order:
        s = o.strip()
        upper = s.upper()
        if upper.endswith(" DESC"):
            keys.append(s[:-5])
            dirs.add(True)
        elif upper.endswith(" ASC"):
            keys.append(s[:-4])
            dirs.add(False)
        else:
            keys.append(s)
    if len(dirs) > 1:
        raise ValueError(
            "generate_concat: mixed ASC/DESC order directions are not "
            "supported (struct sort is single-direction)"
        )
    descending = dirs == {True}
    pairs = F.sort_array(
        F.collect_list(
            F.struct(*[F.expr(k) for k in keys], F.expr(expr).alias("__v"))
        ),
        asc=not descending,
    )
    joined = F.array_join(F.transform(pairs, lambda s: s["__v"]), sep)
    return df.groupBy(*group_cols).agg(joined.alias(output))
