"""Deterministic sampling / dataset-split operators for training pipelines.

Splits and samples must be (a) reproducible across runs and engines, (b)
stable under repartitioning, and (c) assigned per-record with no global
state.  ``rand()`` fails all three at scale (seed × partition layout), so
everything here derives from a content hash of the record key:

    bucket(id) = md5(seed ':' id) first 60 bits, mod 10_000

which any engine reproduces bit-for-bit (DuckDB:
``('0x' || substr(md5(x), 1, 15))::BIGINT``).  One projection, no shuffle,
whole-stage codegen; the same record always lands in the same split no
matter the cluster layout — the property that keeps train/test splits
leak-free when the corpus is re-ingested or backfilled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: hash-space resolution: weights are quantized to 1/10_000ths
_BUCKETS = 10_000


def _bucket(id_col: str, seed: str) -> Column:
    """Deterministic [0, 10000) bucket from the record key."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _BUCKETS
    )


def bucket_sql(id_col: str, seed: str) -> str:
    """The DuckDB-dialect mirror of :func:`_bucket` (oracle use)."""
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT "
        f"% {_BUCKETS})"
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    output: str = "split",
) -> DataFrame:
    """Assign every record to a named split (train/val/test …) by hash
    bucket, proportional to ``weights`` (need not sum to 1 — they are
    normalized).  Order of ``weights`` fixes the bucket ranges, so the
    mapping is part of the dataset contract."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    b = _bucket(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = b < int(round(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(output, expr)


def split_case_sql(
    weights: dict[str, float], id_col: str = "doc_id", seed: str = "split"
) -> str:
    """Oracle-side CASE expression equivalent to :func:`assign_splits`."""
    total = sum(weights.values())
    b = bucket_sql(id_col, seed)
    parts = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        parts.append(f"WHEN {b} < {int(round(acc))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Content-hash Bernoulli sample: keeps the same records every run and on
    every engine (unlike ``df.sample`` whose draw depends on partition
    layout).  Composable: a 0.1 sample of a 0.5 sample with different seeds
    behaves like independent draws."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(id_col, seed) < int(round(fraction * _BUCKETS)))
