"""MDX set / navigation / time-intelligence functions as DataFrame
transformations (SURVEY.md §2.5–2.6).

MDX has no frame-spec windows; its set-relative and time-relative member
navigation all map onto Spark ``Window`` functions over the *aggregated cell
grid* (never over the fact table — the window input is axis-sized, so at
100 TB these stay a single small shuffle).

Each helper cites the Mondrian function it re-expresses
(``jar!mondrian/olap/fun/...`` per SURVEY.md §2).
"""

from .windows import (
    closing_period,
    cumulative,
    generate_concat,
    head,
    lag_over,
    last_periods,
    opening_period,
    rank_over,
    row_index,
    subset,
    tail,
)

__all__ = [
    "closing_period",
    "cumulative",
    "generate_concat",
    "head",
    "lag_over",
    "last_periods",
    "opening_period",
    "rank_over",
    "row_index",
    "subset",
    "tail",
]
