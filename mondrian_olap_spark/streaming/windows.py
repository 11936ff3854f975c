"""Streaming windowed aggregation + cache-invalidation sink."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_aggregate(
    stream: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: list[Column],
    group_cols: list[str] | None = None,
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation with late-data watermarking.

    Tumbling (``slide=None``) or sliding windows; the watermark bounds state
    so the query runs indefinitely (late rows beyond the watermark are
    dropped — Structured Streaming semantics).  Output carries
    ``window_start`` / ``window_end`` timestamp columns plus the grouping
    columns and aggregates.
    """
    wm = stream.withWatermark(ts_col, watermark)
    win = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    keys = [win.alias("__w")] + [F.col(c) for c in (group_cols or [])]
    out = wm.groupBy(*keys).agg(*aggs)
    return out.select(
        F.col("__w.start").alias("window_start"),
        F.col("__w.end").alias("window_end"),
        *(group_cols or []),
        *[c for c in out.columns if c != "__w" and c not in (group_cols or [])],
    )


def invalidate_cache_on_update(
    stream: DataFrame,
    engine,
    region_fn: Callable[[DataFrame], list[str]] | None = None,
    checkpoint_dir: str | None = None,
):
    """``foreachBatch`` sink that flushes the engine's aggregate cache as
    new fact data arrives — the streaming automation of the reference's
    manual flush API (``cube.rb:519-547``; behavior spec
    ``test/cube_cache_control_test.rb``).

    ``region_fn(batch_df) -> [member identifiers]``: derive the member
    region touched by a micro-batch (targeted flush); ``None`` flushes the
    whole schema cache per batch.

    Returns the started ``StreamingQuery``.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if region_fn is None:
            engine.flush_schema_cache()
        else:
            members = region_fn(batch_df)
            if members:
                engine.flush_region_cache(members)

    writer = stream.writeStream.foreachBatch(handle).outputMode("append")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()
