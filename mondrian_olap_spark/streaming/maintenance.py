"""Streaming maintenance of materialized aggregate tables.

The batch side registers summary tables for routing
(``star.materialize_aggregate``); this module keeps such a summary current
as new fact rows stream in — the Spark-native automation of the
reference's "update data, then flush the cache" operational loop
(``cube_cache_control_test.rb``; flush APIs cube.rb:519-547).

Per micro-batch (``foreachBatch``):

1. the batch's raw fact rows are aggregated at the summary grain *through
   the cube's own star-join planner* (a throwaway engine whose fact is the
   batch — identical join/pruning logic, no second code path);
2. the delta merges into the summary by union + re-aggregate on the grain
   keys — sum/count/min/max merge associatively, which is exactly why only
   those aggregators may live in summary tables (``register_aggregate``);
3. the engine's aggregate cache flushes so the next query sees fresh data.

Scale shape: the merge state is grain-sized (axis cardinality), not
fact-sized; each batch shuffles only its own delta.  On a real lakehouse
the union-rewrite becomes ``MERGE INTO`` (Delta/Iceberg) with the same
delta plan; plain parquet here rewrites the (small) summary atomically via
an eager localCheckpoint before overwrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def maintain_aggregate(
    engine,
    stream: DataFrame,
    levels: list[str],
    measures: list[str],
    summary_path: str,
    checkpoint_dir: str,
    register: bool = True,
):
    """Start a streaming query that maintains (and optionally registers for
    routing) a summary table at the grain of ``levels``.

    ``stream``: streaming DataFrame of new fact rows (fact schema).
    Returns the started ``StreamingQuery``.
    """
    from ..members import MemberSetRef, resolve_level
    from ..plan import Planner
    from ..star import CubeEngine

    rollable = {"sum", "count", "min", "max"}
    ms = [engine.cube.measure(n) for n in measures]
    bad = [m.name for m in ms if m.aggregator not in rollable]
    if bad:
        raise ValueError(f"not roll-up-safe for streaming maintenance: {bad}")

    refs = []
    for ident in levels:
        dim, idx = resolve_level(engine.cube, ident)
        refs.append(MemberSetRef(dim, depth=idx, kind="level_members"))

    spark = engine.fact.sparkSession

    def merge_fn(out: str, agg: str):
        c = F.col(out)
        return (
            F.sum(c) if agg in ("sum", "count") else (F.min(c) if agg == "min" else F.max(c))
        ).alias(out)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # star-aggregate the batch at the grain through the normal planner
        batch_engine = CubeEngine(
            engine.cube, {**dict(engine.tables), engine.cube.fact: batch_df}
        )
        delta, group_cols = Planner(batch_engine).aggregate([refs], [], ms)
        from pyspark.errors import AnalysisException

        try:
            current = spark.read.parquet(summary_path)
            merged = current.unionByName(delta, allowMissingColumns=True)
        except AnalysisException as e:
            # ONLY path-not-found means "first batch".  Any other read
            # failure (corrupt file, permissions, concurrent writer) must
            # abort the batch — treating it as first-batch would overwrite
            # the summary with this batch's delta and silently discard
            # every previously accumulated aggregate.
            if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
                raise
            merged = delta  # genuine first batch: summary does not exist yet
        merged = merged.groupBy(*group_cols).agg(
            *[merge_fn(m.out, m.aggregator) for m in ms]
        )
        # break lineage off the files being overwritten before the rewrite
        merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(summary_path)
        if register:
            # swap in the fresh summary for routing
            engine.aggregate_tables = [
                t for t in engine.aggregate_tables if getattr(t[0], "_maint", None) != summary_path
            ]
            df = spark.read.parquet(summary_path)
            df._maint = summary_path
            engine.register_aggregate(
                df, group_cols, {m.out: m.aggregator for m in ms}
            )
        if engine.cache is not None:
            engine.flush_schema_cache()

    return (
        stream.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
