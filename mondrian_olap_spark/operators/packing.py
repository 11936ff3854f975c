"""Sequence packing and stratified selection for training-data pipelines.

Both operators are pure window-function plans (JVM-side, whole-stage
codegen): no UDFs, no collects, one shuffle on the partition key each.

Scale notes (100 TB):

* ``pack_documents`` windows partition by the grouping key (``source``) —
  one shuffle on that key; pack assignment is a running sum, so within a
  key the work is a single sequential pass per partition.  A single giant
  key serializes into one task; for corpora with a dominant source, pre-
  split the key (e.g. ``source || '/' || pmod(doc_id, N)``) — packing is
  per-key sequential by definition, so any finer key that preserves the
  intended order is valid.
* ``balanced_sample`` ranks by a content hash inside each stratum — the
  same single shuffle; the hash order makes the sample deterministic and
  layout-independent (repartitioning the input cannot change the result).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_documents(
    df: DataFrame,
    budget: int,
    by: str = "source",
    order: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to fixed-token-budget packs (context-window
    packing for LLM training batches).

    Documents are taken in ``order`` within each ``by`` group; a document
    joins the pack in which its cumulative token span starts
    (``pack_id = floor(tokens_before / budget)``).  The assignment is a
    running sum, not a bin-packing search — deterministic, one pass, and
    the convention used by streaming tokenizer pipelines (documents may
    straddle a boundary; the trainer's sampler handles the tail).

    Adds ``n_tokens`` (whitespace tokens), ``pack_id``, and
    ``pack_offset`` (token offset of the document inside its group's
    stream).
    """
    # NULL text → 0 tokens: size(split(NULL)) is NULL, which would silently
    # zero the row's pack_offset through the coalesce below while leaving
    # later offsets computed as if the row were absent
    out = df.withColumn(
        "n_tokens",
        F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")),
    )
    w = Window.partitionBy(by).orderBy(order)
    out = out.withColumn(
        "pack_offset",
        F.coalesce(F.sum("n_tokens").over(w) - F.col("n_tokens"), F.lit(0)),
    )
    return out.withColumn(
        "pack_id", F.floor(F.col("pack_offset") / F.lit(budget))
    )


def pack_summary(
    df: DataFrame,
    budget: int,
    by: str = "source",
    order: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-pack roll-up of :func:`pack_documents`: document count and
    total tokens per (group, pack)."""
    packed = pack_documents(df, budget, by=by, order=order, text_col=text_col)
    return packed.groupBy(by, "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def balanced_sample(
    df: DataFrame,
    per_group: int,
    by: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic stratified downsampling: keep at most ``per_group``
    rows per ``by`` stratum, chosen by content-hash order (md5 of the id),
    so the sample is stable across runs, partitionings, and engines.

    The classic "balance the language mix" step before training: dominant
    strata are capped, small strata pass through whole.
    """
    w = Window.partitionBy(by).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= per_group)
        .drop("__rn")
    )


def padding_efficiency(
    df: DataFrame,
    seq_len: int,
    text_col: str = "text",
) -> DataFrame:
    """Batching-cost report for a candidate context window: per
    power-of-two length bucket, what one-document-per-sequence batching
    would cost at ``seq_len`` versus the token-budget packing path —
    ``pad_waste`` (tokens of padding for docs that fit) and
    ``trunc_loss`` (tokens cut from docs that don't), plus the bucket's
    padding ratio.  The whole-corpus read that decides "pack, pad, or
    re-chunk, and at which seq_len" before a training run.

    Pure integer arithmetic until the single final division (same bucket
    convention as :func:`~.text.token_length_histogram` — exact
    ``2^(bitlength-1)`` buckets, no float log2), one projection + one
    ≤ ~60-row aggregate: scan-bound at any corpus size.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    n = F.size(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    ).cast("long")
    lo = F.expr("CAST(shiftleft(1, length(bin(greatest(__n, 1))) - 1) AS BIGINT)")
    s = F.lit(seq_len).cast("long")
    return (
        df.select(n.alias("__n"))
        .withColumn("bucket_lo", lo)
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.sum(
                F.when(F.col("__n") <= s, s - F.col("__n")).otherwise(F.lit(0))
            ).alias("pad_waste"),
            F.sum(
                F.when(F.col("__n") > s, F.col("__n") - s).otherwise(F.lit(0))
            ).alias("trunc_loss"),
        )
        .withColumn(
            "pad_ratio",
            F.round(F.col("pad_waste") / (F.col("n_docs") * s), 6),
        )
    )
