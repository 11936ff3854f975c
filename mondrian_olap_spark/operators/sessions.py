"""Batch sessionization: gap-based session assignment over an event log —
the batch counterpart of ``streaming/windows.py``'s session windows, and a
standard step in training-data pipelines (grouping interaction logs into
conversations/episodes before filtering or sampling).

Pure window functions: one shuffle on the user key (lag → break flags →
running sum), then an ordinary grouped aggregate for per-session stats.
At 100 TB the shuffle is keyed by user — heavy-tailed "power users" are the
skew risk; AQE's skew-join/aggregate splitting handles moderate tails, and
a user with pathological volume can be salted by day first (sessions never
span the salt boundary when the boundary is >> gap).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Epoch microseconds for TIMESTAMP or TIMESTAMP_NTZ columns.  NTZ
    casts through the session timezone; every use here is a DIFFERENCE or
    an equality-keyed aggregate, so the constant offset cancels (run with
    ``spark.sql.session.timeZone=UTC`` if absolute epoch values must match
    an external system)."""
    return F.unix_micros(c.cast("timestamp"))


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Assign a per-user ``session_idx`` (1-based): a new session starts at
    the first event and whenever the gap since the previous event exceeds
    ``gap_seconds``.  Deterministic: ordering ties break on
    ``order_tiebreak``."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull()
        | (_micros(F.col(ts_col)) - _micros(prev)
           > gap_seconds * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("__brk", brk).withColumn(
        "session_idx",
        F.sum("__brk").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    ).drop("__brk")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates: event count and exact duration in
    microseconds (integer epoch math — engine-portable, no float time)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        (_micros(F.max(ts_col)) - _micros(F.min(ts_col))).alias(
            "duration_us"
        ),
    )
