"""Skew mitigation: salted two-phase aggregation (SURVEY.md §4 /
SCALE.md knobs).

When a grouping key is heavily skewed (one member owns a large fraction of
the fact), the single reducer for that key becomes the straggler.  The
classic fix is salting: phase 1 aggregates on (key, salt) spreading the hot
key over ``salt`` reducers; phase 2 combines the partials.  AQE's skew-join
handling covers joins; this helper covers *aggregations*, which AQE does not
re-balance.

Only decomposable aggregators are supported (sum/count/min/max, plus avg via
its sum/count decomposition) — the same algebra that makes partial
aggregation possible at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PHASE1 = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing
    "min": F.min,
    "max": F.max,
}


def salted_aggregate(
    df: DataFrame,
    group_cols: list[str],
    aggs: list[tuple[str, str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the grouping key.

    ``aggs``: (output, aggregator, expression) with aggregator in
    sum/count/min/max/avg.  Results are exactly equal to the direct
    ``groupBy`` for all supported aggregators (avg is recomposed from
    sum/count, so it is exact too — not an average of averages).
    """
    phase1_cols = []
    phase2_cols = []
    for out, agg, expr in aggs:
        if agg == "avg":
            phase1_cols.append(F.sum(F.expr(expr)).alias(f"__s_{out}"))
            phase1_cols.append(F.count(F.expr(expr)).alias(f"__c_{out}"))
            phase2_cols.append(
                (F.sum(F.col(f"__s_{out}")) / F.sum(F.col(f"__c_{out}"))).alias(out)
            )
        elif agg in _PHASE1:
            phase1_cols.append(_PHASE1[agg](F.expr(expr)).alias(f"__p_{out}"))
            phase2_cols.append(_PHASE2[agg](F.col(f"__p_{out}")).alias(out))
        else:
            raise ValueError(
                f"aggregator {agg!r} is not decomposable; salting cannot apply "
                "(distinct-count needs a dedicated two-phase distinct)"
            )
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*group_cols, "__salt").agg(*phase1_cols)
    return partial.groupBy(*group_cols).agg(*phase2_cols)
