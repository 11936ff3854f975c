"""Structured Streaming surface.

The reference has **no** streaming operators (SURVEY.md §2.9) — its nearest
capability is incremental cache invalidation when underlying data changes
(``connection.rb:153-181`` schema flush, ``cube.rb:519-547`` region flush).
This module supplies the Spark-native streaming layer a modern deployment
expects on top of that parity surface:

* :func:`windowed_aggregate` — event-time tumbling/sliding windows with
  watermark-based late-data handling over any streaming DataFrame;
* :func:`invalidate_cache_on_update` — ``foreachBatch`` sink that flushes
  the engine's aggregate cache (whole schema or a member region) as new fact
  data lands, turning the reference's *manual* flush API into an automatic
  one.
"""

from .dedup import streaming_exact_dedup, streaming_neardup_filter
from .joins import enrich_with_dimension, interval_join
from .windows import invalidate_cache_on_update, windowed_aggregate

__all__ = [
    "enrich_with_dimension",
    "interval_join",
    "invalidate_cache_on_update",
    "windowed_aggregate",
    "streaming_exact_dedup",
    "streaming_neardup_filter",
]
