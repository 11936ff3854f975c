"""Shared plan utilities for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default
    parallelism when its physical plan has badly fewer partitions.

    Row-explosion operators (shingling, tokenization, chunking) multiply
    row counts 100-1000× in the MAP side of their first shuffle — if the
    input is a single parquet row group (common for small/local corpora;
    ``maxPartitionBytes`` cannot split inside a row group), that entire
    explosion runs in ONE task regardless of cluster size.  The guard
    triggers only when ``partitions * factor < defaultParallelism``: at
    real scale inputs carry thousands of row groups, the condition is
    false, and the plan is untouched — no shuffle is ever added to a
    well-partitioned input.  When it does trigger, the shuffled data is
    the pre-explosion (small) side, never the exploded rows.
    """
    if df.isStreaming:
        # streaming plans have no static partition count (and no .rdd);
        # micro-batch parallelism is the source's concern
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * factor < target:
        return df.repartition(target)
    return df
