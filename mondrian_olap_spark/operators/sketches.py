"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark): the aggregate-table story for COUNT(DISTINCT).

Distinct counts are the one classic measure that does NOT roll up — the
distinct users of two regions is not the sum of per-region counts, so a
100 TB cube must either rescan the fact table for every grain (what
Mondrian's distinct-count aggregate routing carefully avoids enabling) or
store something mergeable.  HLL sketches ARE mergeable: persist one binary
sketch per fine-grain cell, and every coarser total is a union of sketches
— no fact rescan, ever.  Union is deterministic, so re-aggregated
estimates are reproducible run-to-run.

Error: relative standard error ≈ 1.04 / sqrt(2^lg_k) (Heule et al. 2013 —
HLL++ is what the datasketches implementation refines); lg_k=12 ≈ 1.6%.
Low cardinalities stay in sparse mode and are typically exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rse(lg_k: int) -> float:
    """Relative standard error of an HLL sketch with 2^lg_k registers."""
    return 1.04 / (2 ** (lg_k / 2.0))


def distinct_sketches(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """One HLL sketch per group over ``value_col`` — the persistable
    fine-grain artifact (BINARY column; write it next to the aggregate
    table).  One scan, one group-keyed shuffle with map-side partial
    sketch merge (sketches combine associatively, so partial aggregation
    ships one sketch per group per task, not raw values)."""
    return df.groupBy(*group_cols).agg(
        F.expr(f"hll_sketch_agg({value_col}, {int(lg_k)})").alias(sketch_col)
    )


def estimate(sketch_col: str = "sketch"):
    """Column expression: the estimate of one sketch."""
    return F.expr(f"cast(hll_sketch_estimate({sketch_col}) as long)")


def merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Roll sketches UP to a coarser grain by union — the fact table is
    never touched.  ``group_cols`` may be empty for the grand total.
    Union of unions equals the union of the whole (associative), so any
    rollup path through intermediate grains lands on identical registers
    — and therefore identical estimates.  (lg_k travels inside each
    sketch; the union adopts it, erroring on mixed configs unless told
    otherwise — mixing precisions silently degrades to the coarsest.)"""
    agg = F.expr(f"hll_union_agg({sketch_col})").alias(sketch_col)
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def distinct_rollup(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group distinct estimates PLUS the all-groups total, where the
    total is computed by UNIONING the per-group sketches rather than
    rescanning the input (the mergeability proof in one plan).  Returns
    ``(*group_cols, estimate)`` with the total row carrying NULL group
    keys (the grand-total convention of a rollup)."""
    sk = distinct_sketches(df, group_cols, value_col, lg_k)
    per_group = sk.select(*group_cols, estimate().alias("estimate"))
    total = merge_sketches(sk, []).select(
        *[F.lit(None).cast(per_group.schema[c].dataType).alias(c) for c in group_cols],
        estimate().alias("estimate"),
    )
    return per_group.unionByName(total)
