"""Statistical MDX set functions (SURVEY.md §2.4).

MDX's Median/Percentile/Stdev/Var/Correlation/Covariance/LinReg* evaluate an
expression per member of a *set* and aggregate the member values —
i.e. a second-stage aggregation over an already-aggregated cell grid
(jar!mondrian/olap/fun/MedianFunDef, PercentileFunDef, StdevFunDef,
VarFunDef, CorrelationFunDef, CovarianceFunDef, LinReg$*FunDef; NaN-on-NULL
behavior tests /root/reference/test/mondrian_test.rb:608-778).

``set_aggregate`` maps each to the native Spark SQL aggregate so the whole
thing stays in whole-stage codegen; it works equally as a *first*-stage
aggregation over fact rows (Spark's aggregates are the same operators at
either stage).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: single-expression statistics: MDX name → Spark function
_UNARY = {
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "count": F.count,
    "median": F.median,  # jar!...MedianFunDef → exact continuous median
    "stdev": F.stddev_samp,  # sample (MDX Stdev)
    "stdevp": F.stddev_pop,  # population (MDX StdevP)
    "var": F.var_samp,
    "varp": F.var_pop,
}

#: two-expression statistics: MDX name → Spark function(y, x)
_BINARY = {
    "correlation": F.corr,
    "covariance": F.covar_pop,  # MDX Covariance is population covariance
    "covariancen": F.covar_samp,  # MDX CovarianceN is sample covariance
    "linregslope": F.regr_slope,
    "linregintercept": F.regr_intercept,
    "linregr2": F.regr_r2,
}


def stat_column(output: str, fn: str, *exprs: str, arg: float | None = None) -> Column:
    """One statistical aggregate column; ``fn`` is the lower-cased MDX name
    (plus ``percentile`` with ``arg`` in 0..1)."""
    name = fn.lower()
    if name == "percentile":
        if arg is None:
            raise ValueError("percentile requires arg")
        # jar!...PercentileFunDef — exact continuous percentile
        return F.percentile(F.expr(exprs[0]), F.lit(arg)).alias(output)
    if name in _UNARY:
        if len(exprs) != 1:
            raise ValueError(f"{fn} takes one expression")
        return _UNARY[name](F.expr(exprs[0])).alias(output)
    if name in _BINARY:
        if len(exprs) != 2:
            raise ValueError(f"{fn} takes two expressions (y, x)")
        return _BINARY[name](F.expr(exprs[0]), F.expr(exprs[1])).alias(output)
    raise ValueError(f"unknown statistical function {fn!r}")


def set_aggregate(
    df: DataFrame,
    group_cols: list[str],
    stats: list[tuple],
) -> DataFrame:
    """Aggregate ``stats`` over ``df`` grouped by ``group_cols``.

    Each stat is ``(output, fn, expr[, expr2])`` or
    ``(output, 'percentile', expr, p)``.
    """
    cols = []
    for st in stats:
        if st[1].lower() == "percentile":
            cols.append(stat_column(st[0], st[1], st[2], arg=st[3]))
        else:
            cols.append(stat_column(st[0], st[1], *st[2:]))
    return df.groupBy(*group_cols).agg(*cols) if group_cols else df.agg(*cols)
