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


# ---------------------------------------------------------------- histograms
def value_histogram(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    bins: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Fixed-bin value histogram — the MERGEABLE quantile/distribution
    summary for a 100 TB column: at most ``groups × bins`` rows
    regardless of input size, composable by summing counts (so shard
    histograms union + re-aggregate instead of rescanning — the same
    maintenance contract as the HLL/CMS/Bloom artifacts, see
    :func:`histogram_append`).

    Binning is the fixed-order IEEE expression
    ``floor((x - lo) / (hi - lo) * bins)`` clamped into ``[0, bins-1]``
    (values at/beyond the edges land in the end bins; NULLs AND NaNs are
    dropped — a NaN is not a value in the range, and under Spark's
    greatest/least NaN ordering it would otherwise silently inflate the
    top bin and skew high quantiles), so two engines computing it agree
    bit-for-bit and the artifact is layout-independent.  Returns
    ``(group…, bin, n)``.

    One aggregation shuffle of at most groups × bins cells with map-side
    partial combine.  Quantiles derive from the histogram with error
    bounded by one bin width (:func:`histogram_quantiles`) — the
    deterministic, mergeable alternative to ``percentile_approx`` whose
    sketch is neither engine-portable nor hash-reproducible.
    """
    if not (hi > lo) or bins < 1:
        raise ValueError("need hi > lo and bins >= 1")
    gcols = list(group_cols or [])
    x = F.col(value_col).cast("double")
    scaled = (x - F.lit(float(lo))) / F.lit(float(hi) - float(lo)) * F.lit(int(bins))
    # clamp in DOUBLE before floor/cast: an extreme outlier (1e20) would
    # otherwise overflow the integer cast, which THROWS under ANSI mode;
    # for any in-range value the result is identical to floor-then-clamp
    clamped = F.least(F.lit(float(bins)), F.greatest(F.lit(0.0), scaled))
    b = F.least(F.lit(bins - 1), F.floor(clamped).cast("int"))
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .select(*gcols, b.alias("bin"))
        .groupBy(*gcols, "bin")
        .agg(F.count("*").alias("n"))
    )


def histogram_quantiles(
    hist: DataFrame,
    lo: float,
    hi: float,
    bins: int,
    percents: list[int],
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantiles from a :func:`value_histogram`: for each group and each
    integer percent ``p``, the bin containing the ``ceil(p·n/100)``-th
    value (type-1 target — INTEGER arithmetic, so the bin choice can
    never flip on a float rounding boundary, the cross-engine quantile
    trap) and its ``[lower_edge, upper_edge)`` — the true quantile lies
    inside, error at most one bin width.  Input is bounded
    (groups × bins), so the per-group window is cheap by construction.
    Returns ``(group…, percent, bin, lower_edge, upper_edge, n_total)``.
    """
    from pyspark.sql.window import Window

    for p in percents:
        if not (isinstance(p, int) and 1 <= p <= 100):
            raise ValueError("percents must be integers in 1..100")
    gcols = list(group_cols or [])
    w = Window.partitionBy(*[F.col(c) for c in gcols]) if gcols else Window.partitionBy()
    cum = hist.select(
        *gcols,
        "bin",
        F.sum("n").over(w.orderBy("bin")).alias("cum"),
        F.sum("n").over(w).alias("n_total"),
    )
    pcts = F.explode(
        F.array(*[F.lit(int(p)) for p in percents])
    ).alias("percent")
    width = (float(hi) - float(lo)) / int(bins)
    ranked = (
        cum.select(*gcols, "bin", "cum", "n_total", pcts)
        # integer type-1 target: cum >= ceil(p*n/100) <=> 100*cum >= p*n
        # (pure integer comparison — Spark's '/' is double division, and
        # a float target is exactly the cross-engine rounding trap the
        # docstring promises away)
        .filter(F.col("cum") * 100 >= F.col("percent") * F.col("n_total"))
        .groupBy(*gcols, "percent")
        .agg(
            F.min("bin").alias("bin"),
            F.min("n_total").alias("n_total"),
        )
    )
    return ranked.select(
        *gcols,
        "percent",
        "bin",
        (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("lower_edge"),
        (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias(
            "upper_edge"
        ),
        "n_total",
    )


def write_histogram(
    hist: DataFrame,
    path: str,
    lo: float,
    hi: float,
    bins: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Persist a histogram as an on-disk artifact (counts parquet +
    ``_params`` sidecar carrying the binning — an append MUST bin with
    the (lo, hi, bins) the artifact was built with).  Overwrites are
    crash-safe via :func:`..fsio.atomic_overwrite_dir`."""
    from .. import fsio

    spark = hist.sparkSession

    def _write_to(target: str) -> None:
        hist.write.mode("overwrite").parquet(target)
        (
            fsio.tiny_df(
                spark,
                [(float(lo), float(hi), int(bins),
                  ",".join(group_cols or []))],
                "lo double, hi double, bins int, group_cols string",
            )
            .write.mode("overwrite")
            .parquet(target + "/_params")
        )

    fsio.atomic_overwrite_dir(spark, path, _write_to)
    return hist


def read_histogram(spark, path: str) -> tuple[DataFrame, dict]:
    """Load a :func:`write_histogram` artifact: ``(hist, params)`` with
    params ``{"lo", "hi", "bins", "group_cols"}`` (1-row sidecar
    collect — model parameters, the legitimate collect)."""
    row = spark.read.parquet(path + "/_params").collect()[0]
    params = {
        "lo": float(row["lo"]),
        "hi": float(row["hi"]),
        "bins": int(row["bins"]),
        "group_cols": [c for c in row["group_cols"].split(",") if c],
    }
    return spark.read.parquet(path), params


def histogram_append(
    new_df: DataFrame, path: str, value_col: str
) -> DataFrame:
    """Fold a new batch into a persisted histogram artifact WITHOUT
    rescanning the corpus: bin the batch with the artifact's own
    parameters, union with the stored counts, re-aggregate (counts sum —
    histograms are trivially mergeable), and swap — identical to one
    build over corpus ∪ batch.  Cost: one batch-sized aggregation plus
    an artifact-sized merge (the histogram member of the maintenance
    family: ``bloom_append`` / ``ivf_append`` / ``minhash_index_append``
    / ``refresh_aggregates``).  Returns the merged histogram."""
    spark = new_df.sparkSession
    old, p = read_histogram(spark, path)
    delta = value_histogram(
        new_df, value_col, p["lo"], p["hi"], p["bins"],
        group_cols=p["group_cols"],
    )
    merged = (
        old.unionByName(delta)
        .groupBy(*p["group_cols"], "bin")
        .agg(F.sum("n").alias("n"))
        # materialize BEFORE overwriting — a lazy plan would still read
        # the artifact while the swap replaces it
        .localCheckpoint(eager=True)
    )
    write_histogram(merged, path, p["lo"], p["hi"], p["bins"], p["group_cols"])
    return merged
