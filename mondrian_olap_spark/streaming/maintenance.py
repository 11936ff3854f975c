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

Durability model (plain parquet — a lakehouse MERGE INTO replaces all of
this on Delta/Iceberg): each batch writes a NEW snapshot directory
``<summary_path>/snap_<batch_id>`` instead of overwriting in place.

* **replay-idempotent**: foreachBatch is at-least-once; a replayed batch
  finds its complete snapshot (``_SUCCESS`` marker) already present and
  only re-registers it — deltas are never double-merged;
* **crash-safe**: a half-written snapshot has no ``_SUCCESS`` marker, is
  ignored by readers, and is overwritten by the replay;
* **reader-safe**: the previous snapshot's files are not deleted while the
  new one is written — queries planned against the previously registered
  summary keep resolving; older snapshots are pruned (the latest two are
  kept).

Scale shape: the merge state is grain-sized (axis cardinality), not
fact-sized; each batch shuffles only its own delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fs(spark, base: str):
    jvm = spark.sparkContext._jvm
    path = jvm.org.apache.hadoop.fs.Path(base)
    return path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration()), jvm


def _complete_snapshots(spark, base: str) -> list[str]:
    """Names of COMPLETE snapshot dirs (``_SUCCESS`` present), sorted by
    batch id (zero-padded names make lexicographic == numeric order)."""
    fs, jvm = _fs(spark, base)
    root = jvm.org.apache.hadoop.fs.Path(base)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("snap_") and fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{base}/{name}/_SUCCESS")
        ):
            out.append(name)
    return sorted(out)


def maintain_aggregate(
    engine,
    stream: DataFrame,
    levels: list[str],
    measures: list[str],
    summary_path: str,
    checkpoint_dir: str,
    register: bool = True,
    available_now: bool = True,
    processing_time: str | None = None,
):
    """Start a streaming query that maintains (and optionally registers for
    routing) a summary table at the grain of ``levels``.

    ``stream``: streaming DataFrame of new fact rows (fact schema).
    ``available_now=True`` (default) drains the currently-available backlog
    and terminates — the catch-up / test mode; pass
    ``available_now=False`` (optionally with ``processing_time='10
    seconds'``) for a continuously-running maintainer.  Returns the
    started ``StreamingQuery``.
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

    def register_snapshot(snap: str, group_cols: list[str]) -> None:
        engine.aggregate_tables = [
            t
            for t in engine.aggregate_tables
            if getattr(t[0], "_maint", None) != summary_path
        ]
        df = spark.read.parquet(f"{summary_path}/{snap}")
        df._maint = summary_path
        engine.register_aggregate(df, group_cols, {m.out: m.aggregator for m in ms})

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # star-aggregate the batch at the grain through the normal planner
        batch_engine = CubeEngine(
            engine.cube, {**dict(engine.tables), engine.cube.fact: batch_df}
        )
        delta, group_cols = Planner(batch_engine).aggregate([refs], [], ms)
        this_snap = f"snap_{batch_id:020d}"
        snaps = _complete_snapshots(spark, summary_path)
        if this_snap in snaps:
            # replayed micro-batch: the merge already committed — only the
            # post-write side effects re-run (at-least-once safety)
            if register:
                register_snapshot(this_snap, group_cols)
            if engine.cache is not None:
                engine.flush_schema_cache()
            return
        prev = [s for s in snaps if s < this_snap]
        if prev:
            current = spark.read.parquet(f"{summary_path}/{prev[-1]}")
            merged = current.unionByName(delta, allowMissingColumns=True)
        else:
            merged = delta  # genuine first batch
        merged = merged.groupBy(*group_cols).agg(
            *[merge_fn(m.out, m.aggregator) for m in ms]
        )
        # a NEW directory per batch: the previous snapshot's files survive
        # the write, so concurrently planned queries keep resolving;
        # overwrite handles a half-written dir left by a crashed attempt
        merged.write.mode("overwrite").parquet(f"{summary_path}/{this_snap}")
        if register:
            register_snapshot(this_snap, group_cols)
        if engine.cache is not None:
            engine.flush_schema_cache()
        # prune all but the latest two complete snapshots
        fs, jvm = _fs(spark, summary_path)
        for old in _complete_snapshots(spark, summary_path)[:-2]:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{summary_path}/{old}"), True)

    writer = (
        stream.writeStream.foreachBatch(handle)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif processing_time:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


def read_summary(spark, summary_path: str) -> DataFrame:
    """The latest complete summary snapshot (for readers outside the
    routing registration)."""
    snaps = _complete_snapshots(spark, summary_path)
    if not snaps:
        raise FileNotFoundError(f"no complete summary snapshot under {summary_path}")
    return spark.read.parquet(f"{summary_path}/{snaps[-1]}")
