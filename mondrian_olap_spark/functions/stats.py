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


#: deterministic dispersion variants: computed from exact decimal moment
#: sums (sum(x), sum(x*x) over a DECIMAL expression are order-independent),
#: widened to double once, then a fixed IEEE op sequence — so the result is
#: bit-identical across shuffle orders and across engines when the SQL
#: oracle spells the same formula.  Pass a DECIMAL-typed expression, e.g.
#: ``CAST(l_extendedprice AS DECIMAL(12,2))``.
_DETERMINISTIC_DISPERSION = {"dstdev", "dstdevp", "dvar", "dvarp"}


#: deterministic two-expression statistics over DECIMAL exprs, same idea:
#: exact moment sums (n, sx, sy, sxx, syy, sxy), then a fixed IEEE formula.
#: Argument order matches the Spark natives: (y, x).
_DETERMINISTIC_BINARY = {
    "dcorrelation",
    "dcovariance",
    "dcovariancen",
    "dlinregslope",
    "dlinregintercept",
    "dlinregr2",
    "dlinregvariance",
}


import re as _re

#: a whole-expression decimal cast — the spelling the d-variant contract
#: documents ("pass a DECIMAL-typed expression").  These inputs take the
#: INTEGER-UNIT moment path below.
_DEC_CAST_RE = _re.compile(
    r"(?is)^\s*CAST\s*\(.+\s+AS\s+DECIMAL\s*\(\s*\d+\s*,\s*(\d+)\s*\)\s*\)\s*$"
)


def _is_single_cast(expr: str) -> bool:
    """True only when ``expr`` is ONE top-level ``CAST(...)`` call — the
    opening paren after CAST must close at the expression's very end.
    Without this, a COMPOUND expression like
    ``CAST(a AS DECIMAL(12,2)) / CAST(b AS DECIMAL(12,2))`` would match
    the regex (it starts with CAST( and ends with DECIMAL(p,s))) and be
    silently rounded to the last cast's scale on the unit path."""
    s = expr.strip()
    if not s[:5].upper().startswith("CAST"):
        return False
    i = s.upper().index("(")
    depth = 0
    for j in range(i, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j == len(s) - 1
    return False


def _int_units(expr: str):
    """``(xi, u)`` for a top-level ``CAST(x AS DECIMAL(p,s))`` expression:
    ``xi`` the exact integer-unit column (× 10^s, DECIMAL(38,0)) and
    ``u = 10^s`` as a float; ``None`` for any other input spelling.

    Why integer units (round-12 verdict item 4): a decimal with scale>0
    casts to double by ``double(unscaled)/10^s`` in DuckDB — TWO
    roundings — while Spark's BigDecimal.doubleValue() rounds once, so
    the same exact moment can differ by one ulp between engines at
    value-dependent SFs (the round-11 dispersion_stats sf0.001 miss:
    …5820067 vs …582006).  A SCALE-0 decimal converts in a single
    rounding in both engines (verified bit-equal against Python's
    correctly-rounded int→float), and the final ÷10^s happens ONCE in
    double arithmetic with the identical op order on both sides."""
    m = _DEC_CAST_RE.match(expr)
    if not m or not _is_single_cast(expr):
        return None
    s = int(m.group(1))
    xi = F.expr(f"CAST(({expr}) * {10 ** s} AS DECIMAL(38,0))")
    return xi, float(10**s)


def _binary_det(name: str, ey: str, ex: str) -> Column:
    iy, ix = _int_units(ey), _int_units(ex)
    if iy is not None and ix is not None:
        return _binary_det_units(name, ey, ex, iy, ix)
    y, x = F.expr(ey), F.expr(ex)
    # PAIRWISE null filtering, like Spark's corr/regr_* natives and
    # Mondrian's empty-cell skipping: a row contributes to the moments only
    # when BOTH operands are present — mixing count(*) with null-skipping
    # sums would produce mathematically inconsistent slopes on sparse grids
    both = x.isNotNull() & y.isNotNull()
    px = F.when(both, x)
    py = F.when(both, y)
    n = F.count(px)
    sx = F.sum(px).cast("double")
    sy = F.sum(py).cast("double")
    sxx = F.sum(px * px).cast("double")
    syy = F.sum(py * py).cast("double")
    sxy = F.sum(px * py).cast("double")
    # fixed op order mirrored verbatim in the SQL oracles
    cov_n = sxy - sx * sy / n  # n * covariance
    var_x_n = sxx - sx * sx / n
    var_y_n = syy - sy * sy / n
    if name == "dcovariance":  # population covariance (MDX Covariance)
        return cov_n / n
    if name == "dcovariancen":  # sample covariance (MDX CovarianceN)
        return cov_n / (n - F.lit(1))
    if name == "dcorrelation":
        return cov_n / F.sqrt(var_x_n * var_y_n)
    if name == "dlinregslope":  # regression of y on x
        return cov_n / var_x_n
    if name == "dlinregintercept":
        return sy / n - cov_n / var_x_n * (sx / n)
    if name == "dlinregvariance":
        # residual sum of squares of the least-squares fit — matches the
        # reference's observed LinRegVariance values (mondrian_test.rb:
        # 689-760: flat line → 266.67, perfect fit → 0)
        return var_y_n - cov_n * cov_n / var_x_n
    # dlinregr2 = corr^2, spelled without an intermediate sqrt
    return cov_n * cov_n / (var_x_n * var_y_n)


def _binary_det_units(name: str, ey: str, ex: str, iy, ix) -> Column:
    """Integer-unit two-expression moments (see :func:`_int_units`).
    Every formula's IEEE op sequence is mirrored verbatim in the SQL
    oracles (suite.py corr_linreg_stats / linreg_variance_point)."""
    yi, uy = iy
    xi, ux = ix
    y0, x0 = F.expr(ey), F.expr(ex)
    both = x0.isNotNull() & y0.isNotNull()
    pyi = F.when(both, yi)
    pxi = F.when(both, xi)
    n = F.count(pxi)
    sx = F.sum(pxi).cast("double")
    sy = F.sum(pyi).cast("double")
    sxx = F.sum(pxi * pxi).cast("double")
    syy = F.sum(pyi * pyi).cast("double")
    sxy = F.sum(pxi * pyi).cast("double")
    cov_n = sxy - sx * sy / n
    var_x_n = sxx - sx * sx / n
    var_y_n = syy - sy * sy / n
    if name == "dcovariance":
        return cov_n / n / F.lit(ux * uy)
    if name == "dcovariancen":
        return cov_n / (n - F.lit(1)) / F.lit(ux * uy)
    if name == "dcorrelation":  # unit-invariant
        return cov_n / F.sqrt(var_x_n * var_y_n)
    slope = cov_n / var_x_n
    if uy != ux:
        slope = slope / F.lit(uy / ux)
    if name == "dlinregslope":
        return slope
    if name == "dlinregintercept":
        return sy / n / F.lit(uy) - slope * (sx / n / F.lit(ux))
    if name == "dlinregvariance":
        return (var_y_n - cov_n * cov_n / var_x_n) / F.lit(uy * uy)
    # dlinregr2 — unit-invariant
    return cov_n * cov_n / (var_x_n * var_y_n)


def _dispersion_det(name: str, expr: str) -> Column:
    iu = _int_units(expr)
    if iu is not None:
        xi, u = iu
        e0 = F.expr(expr)
        pxi = F.when(e0.isNotNull(), xi)
        n = F.count(pxi)
        s1 = F.sum(pxi).cast("double")
        s2 = F.sum(pxi * pxi).cast("double")
        num = s2 - s1 * s1 / n
        u2 = F.lit(u * u)
        if name == "dvarp":
            return num / n / u2
        if name == "dvar":
            return num / (n - F.lit(1)) / u2
        if name == "dstdevp":
            return F.sqrt(num / n / u2)
        return F.sqrt(num / (n - F.lit(1)) / u2)  # dstdev
    e = F.expr(expr)
    n = F.count(e)
    s1 = F.sum(e).cast("double")
    s2 = F.sum(e * e).cast("double")
    # op order matters for bit-determinism: t = s2 - s1*s1/n, then /n or /(n-1)
    num = s2 - s1 * s1 / n
    if name == "dvarp":
        return num / n
    if name == "dvar":
        return num / (n - F.lit(1))
    if name == "dstdevp":
        return F.sqrt(num / n)
    return F.sqrt(num / (n - F.lit(1)))  # dstdev


def stat_column(output: str, fn: str, *exprs: str, arg: float | None = None) -> Column:
    """One statistical aggregate column; ``fn`` is the lower-cased MDX name
    (plus ``percentile`` with ``arg`` in 0..1)."""
    name = fn.lower()
    if name in _DETERMINISTIC_DISPERSION:
        if len(exprs) != 1:
            raise ValueError(f"{fn} takes one expression")
        return _dispersion_det(name, exprs[0]).alias(output)
    if name in _DETERMINISTIC_BINARY:
        if len(exprs) != 2:
            raise ValueError(f"{fn} takes two expressions (y, x)")
        return _binary_det(name, exprs[0], exprs[1]).alias(output)
    if name == "linregvariance":
        if len(exprs) != 2:
            raise ValueError(f"{fn} takes two expressions (y, x)")
        return _binary_det("dlinregvariance", exprs[0], exprs[1]).alias(output)
    if name == "linregpoint":
        # LinRegPoint(x0, set, y, x) = slope·x0 + intercept
        # (jar!mondrian/olap/fun/LinReg$PointFunDef)
        if arg is None or len(exprs) != 2:
            raise ValueError("linregpoint takes arg=x0 and (y, x) expressions")
        slope = _binary_det("dlinregslope", exprs[0], exprs[1])
        intercept = _binary_det("dlinregintercept", exprs[0], exprs[1])
        return (slope * F.lit(float(arg)) + intercept).alias(output)
    if name == "percentile":
        if arg is None or not (0.0 <= float(arg) <= 1.0):
            raise ValueError("percentile requires arg in [0, 1]")
        if len(exprs) != 1:
            raise ValueError("percentile takes one expression")
        # jar!...PercentileFunDef — exact continuous percentile
        return F.percentile(F.expr(exprs[0]), F.lit(arg)).alias(output)
    if name == "dpercentile":
        # TYPE-1 percentile: an ACTUAL element (the ceil(p·n)-th value in
        # order), integer index arithmetic — interpolated (type-7)
        # percentiles differ in the last ulp between engines whenever the
        # float index product lands on a rounding boundary (the
        # cross-engine quantile trap), so hash-gated paths use this
        if arg is None or not (0.0 < float(arg) <= 1.0):
            raise ValueError("dpercentile requires arg in (0, 1]")
        if len(exprs) != 1:
            raise ValueError("dpercentile takes one expression")
        e = F.expr(exprs[0])
        # index = ceil(p·n) over non-null values, via pure-integer
        # arithmetic on per-mille units: idx = ceil(pm·n / 1000)
        pm = int(round(float(arg) * 1000))
        if abs(pm - float(arg) * 1000) > 1e-9:
            raise ValueError("dpercentile supports per-mille p only")
        n = F.count(e)
        idx = (F.lit(pm) * n + F.lit(999)) / F.lit(1000)
        return F.get(
            F.array_sort(F.collect_list(e)),
            F.floor(idx).cast("int") - F.lit(1),
        ).alias(output)
    if name == "genconcat":
        # GENERATE(set, string expr[, separator]) string form
        # (jar!mondrian/olap/fun/GenerateFunDef string mode;
        # /root/reference/test/mondrian_test.rb:491-517): concatenate the
        # per-member values in WRITTEN order — Mondrian iterates the set
        # as written; the mdx lowering passes the written position as the
        # order expression (a CASE over the member path for explicit
        # lists, the hierarchy rank for whole-level sets, where the two
        # orders coincide).  ``exprs`` is
        # (value, order); ``arg`` the separator ('' when omitted, the MDX
        # default).  array_sort over (order, value) structs keeps the
        # concatenation deterministic under parallel aggregation; NULL
        # values drop out (collect_list skips the NULL the unmatched
        # ``when`` yields), matching string_agg NULL-skipping.
        if len(exprs) != 2:
            raise ValueError("genconcat takes (value, order) expressions")
        sep = "" if arg is None else str(arg)
        v = F.expr(exprs[0]).cast("string")
        o = F.expr(exprs[1])
        pairs = F.collect_list(
            F.when(v.isNotNull(), F.struct(o.alias("o"), v.alias("v")))
        )
        return F.array_join(
            F.transform(F.array_sort(pairs), lambda x: x["v"]), sep
        ).alias(output)
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

    Each stat is ``(output, fn, expr[, expr2])``,
    ``(output, 'percentile', expr, p)``, or
    ``(output, 'linregpoint', y, x, x0)``.
    """
    cols = []
    for st in stats:
        name = st[1].lower()
        if name in ("percentile", "dpercentile"):
            cols.append(stat_column(st[0], st[1], st[2], arg=st[3]))
        elif name == "linregpoint":
            cols.append(stat_column(st[0], st[1], st[2], st[3], arg=st[4]))
        else:
            cols.append(stat_column(st[0], st[1], *st[2:]))
    return df.groupBy(*group_cols).agg(*cols) if group_cols else df.agg(*cols)
