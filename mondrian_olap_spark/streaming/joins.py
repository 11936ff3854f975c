"""Stream-stream and stream-static joins with bounded state.

The streaming counterparts of the batch event-analytics operators
(:mod:`..operators.events`): attribute an outcome stream to a cause
stream while both are still flowing, and enrich a fact stream with a
slowly-changing dimension.

State-bounding is the whole design problem at scale:

* a stream-stream inner join without a time-range condition would buffer
  BOTH streams forever; :func:`interval_join` requires watermarks on both
  sides plus an explicit event-time interval, so each side's state is
  dropped as the watermark passes — O(rate x window), not O(history);
* the stream-static join (:func:`enrich_with_dimension`) re-resolves the
  static side per micro-batch, so dimension updates are picked up without
  restarting the query, and Spark broadcasts the small side into each
  batch — no streaming state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lookback: str = "30 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 minutes",
    suffix: str = "_right",
) -> DataFrame:
    """Stream-stream inner join: each left event matches right events with
    the same ``key`` whose timestamp falls in ``[left_ts - lookback,
    left_ts]`` (the "purchase joins clicks from the last 30 minutes"
    attribution shape).

    Both inputs MUST be streaming frames; both get ``watermark`` so Spark
    can expire buffered rows.  State per key is bounded by
    ``lookback + watermark`` of data.  Unlike the batch
    :func:`..operators.events.asof_join` this keeps ALL matches in the
    window (streams cannot know the final "most recent" row until the
    watermark closes); downstream can pick the max ``right_ts`` per left
    event once windows close.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    renames = [F.col(key).alias("__rk")] + [
        F.col(c).alias(f"{c}{suffix}") for c in right.columns if c != key
    ]
    rw = rw.select(*renames)
    lts, rts = F.col(left_ts), F.col(f"{right_ts}{suffix}")
    cond = (
        (F.col(key) == F.col("__rk"))
        & (rts <= lts)
        & (rts >= lts - F.expr(f"INTERVAL {lookback}"))
    )
    return lw.join(rw, cond, "inner").drop("__rk")


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to a
    fact stream.  The static side is re-read every micro-batch (standard
    Structured Streaming stream-static semantics), so a refreshed
    dimension table flows into subsequent batches; the small side is
    broadcast — zero streaming state."""
    return stream.join(F.broadcast(dim), on, how)
