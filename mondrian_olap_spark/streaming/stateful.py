"""Stateful streaming operators: session windows (native) and a custom
per-key stateful aggregator via ``applyInPandasWithState``.

Two tiers, mirroring the engine's "built-in first, Python only when
built-ins can't express it" rule:

* :func:`session_aggregate` — Spark's native ``session_window`` (gap-based
  sessions, watermark-bounded state, all JVM-side);
* :func:`stateful_running_totals` — an ``applyInPandasWithState`` operator
  for semantics the built-ins lack (cross-batch running totals per key with
  explicit state timeout) — the pattern any custom stateful operator
  follows: Arrow-batched groups in, explicit GroupState, timeout-driven
  finalisation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def session_aggregate(
    stream: DataFrame,
    ts_col: str,
    gap: str,
    aggs: list[Column],
    group_cols: list[str],
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based session windows (native ``session_window``): a session
    closes after ``gap`` of inactivity per key; watermark bounds state."""
    wm = stream.withWatermark(ts_col, watermark)
    win = F.session_window(F.col(ts_col), gap)
    out = wm.groupBy(win.alias("__s"), *group_cols).agg(*aggs)
    return out.select(
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        *group_cols,
        *[c for c in out.columns if c != "__s" and c not in group_cols],
    )


RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("batch_events", LongType(), False),
        StructField("total_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("total_events", LongType(), False),
        StructField("total_value", DoubleType(), False),
    ]
)


def stateful_running_totals(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout,
    timeout_ms: int = 600_000,
) -> DataFrame:
    """Cross-batch running totals per key — a custom stateful operator the
    built-in aggregations can't express in append-style output (each
    micro-batch emits the *updated* running totals for keys seen in that
    batch only).

    Uses ``applyInPandasWithState``: groups arrive as Arrow batches, state
    is an explicit (count, sum) tuple per key.  With
    ``ProcessingTimeTimeout``, every update RE-ARMS a ``timeout_ms``
    timer and a timed-out invocation removes the key's state (bounded
    state for idle keys) — a timeout configuration without arming would
    silently behave like NoTimeout.
    """
    timed = timeout == GroupStateTimeout.ProcessingTimeTimeout

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if timed and state.hasTimedOut:
            # idle-key finalisation: release the state, emit nothing
            state.remove()
            return
        batch_events = 0
        batch_value = 0.0
        for pdf in pdfs:
            batch_events += len(pdf)
            batch_value += float(pdf[value_col].sum())
        if state.exists:
            total_events, total_value = state.get
        else:
            total_events, total_value = 0, 0.0
        total_events += batch_events
        total_value += batch_value
        state.update((total_events, total_value))
        if timed:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(
            {
                "key": [key[0]],
                "batch_events": [batch_events],
                "total_events": [total_events],
                "total_value": [total_value],
            }
        )

    return (
        stream.groupBy(F.col(key_col))
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
