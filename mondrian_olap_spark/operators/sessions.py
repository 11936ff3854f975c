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


def _micros(c: Column, is_ntz: bool) -> Column:
    """Epoch microseconds.  TIMESTAMP uses ``unix_micros`` directly.
    TIMESTAMP_NTZ has no instant — its semantics ARE the wall clock — so
    it converts via wall-clock component math (date + h/m/s + fractional
    part), which is timezone-independent by construction; a session-tz
    cast would silently shift gaps and durations across DST transitions."""
    if not is_ntz:
        return F.unix_micros(c.cast("timestamp"))
    # every term through LONG: minute(c) * 60_000_000 would overflow INT
    # (59 x 6e7 > 2^31) under ANSI exact arithmetic
    return (
        F.unix_date(c.cast("date")).cast("long") * F.lit(86_400_000_000)
        + F.hour(c).cast("long") * F.lit(3_600_000_000)
        + F.minute(c).cast("long") * F.lit(60_000_000)
        + F.second(c).cast("long") * F.lit(1_000_000)
        + F.date_format(c, "SSSSSS").cast("long")
    )


def _is_ntz(df: DataFrame, ts_col: str) -> bool:
    # case-insensitive: Spark resolves column references regardless of case,
    # so the dtype lookup must too (a missed lookup would silently fall back
    # to the session-timezone cast this module exists to avoid)
    want = ts_col.lower()
    return any(
        name.lower() == want and dtype == "timestamp_ntz"
        for name, dtype in df.dtypes
    )


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
    # a NULL timestamp cannot be ordered into any session: unfiltered it
    # sorts NULLS FIRST and silently joins the user's first session (same
    # rule as events.funnel_counts)
    df = df.filter(F.col(ts_col).isNotNull())
    ntz = _is_ntz(df, ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    prev = F.lag(F.col(ts_col)).over(w)
    brk = F.when(
        prev.isNull()
        | (_micros(F.col(ts_col), ntz) - _micros(prev, ntz)
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
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session aggregates: event count and exact duration in
    microseconds (integer epoch math — engine-portable, no float time)."""
    ntz = _is_ntz(df, ts_col)
    s = sessionize(df, user_col, ts_col, gap_seconds, order_tiebreak)
    return s.groupBy(user_col, "session_idx").agg(
        F.count("*").alias("n_events"),
        (_micros(F.max(ts_col), ntz) - _micros(F.min(ts_col), ntz)).alias(
            "duration_us"
        ),
    )
