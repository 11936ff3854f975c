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
  global dedup on bounded backfills).  The fingerprint normalizes like the
  batch operator (md5 of lower+trim), so batch and streaming agree on
  what a duplicate is.
* :func:`streaming_neardup_filter` — per-micro-batch MinHash/LSH near-dup
  filtering against an accumulating store, with the same
  candidates-then-VERIFY contract as the batch pipeline: LSH band
  collisions only nominate candidates; an exact n-gram Jaccard check at
  ``threshold`` decides (a single band collision never drops a document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Exact near-real-time dedup: normalized md5 fingerprint +
    watermark-bounded duplicate state.

    With ``event_time_col``, state is bounded: a duplicate arriving within
    ``watermark`` of the original is dropped, later re-arrivals pass (the
    streaming contract — global uniqueness needs the unbounded variant).
    Without an event-time column, falls back to global ``dropDuplicates``
    (state grows with distinct fingerprints — bounded backfills only).
    """
    # same normalization as operators.dedup.exact_dedup — batch and
    # streaming must agree on what counts as a duplicate
    fp = F.md5(F.lower(F.trim(F.col(text_col)))).alias("__fp")
    out = stream.select("*", fp)
    if event_time_col is None:
        return out.dropDuplicates(["__fp"]).drop("__fp")
    return (
        out.withWatermark(event_time_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )


def _try_read_parquet(spark, path: str) -> DataFrame | None:
    """Read a parquet path, or None when it does not exist YET — probed via
    the reader (works on any Hadoop-compatible filesystem, unlike a
    driver-local ``os.path`` check that would silently disable the store
    on object storage).  Only path-not-found maps to None: any other read
    failure (throttle, permission, corrupt footer) re-raises — treating it
    as an empty store would silently skip cross-batch dedup for the batch
    and contaminate the corpus."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as e:
        cond = None
        get = getattr(e, "getCondition", None)
        if callable(get):
            try:
                cond = get()
            except Exception:
                cond = None
        if (cond and "PATH_NOT_FOUND" in cond) or "PATH_NOT_FOUND" in str(e):
            return None
        raise


def streaming_neardup_filter(
    stream: DataFrame,
    store_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.8,
    accept_sink=None,
):
    """Continuous MinHash/LSH near-dup filtering via ``foreachBatch``.

    Per micro-batch:

    1. compute MinHash band keys through the SAME banding code as the
       batch operator (``operators.dedup.minhash_band_keys``) — one
       implementation of the hash math;
    2. CANDIDATES: stored docs sharing any (band, key) with a batch doc.
       The batch's band keys broadcast into the join, so the store side
       prunes to colliding buckets — the store is never fully shuffled —
       and same-id matches are excluded (that's how a replayed batch
       re-accepts its own documents instead of colliding with itself);
    3. VERIFY: candidate (batch, stored) pairs are checked by exact
       n-gram Jaccard at ``threshold`` through the batch verifier
       (``operators.dedup.jaccard_pairs`` over the small candidate pool)
       — a lone band collision NEVER drops a document;
    4. within-batch near-dups among the survivors verify the same way
       (smallest id wins);
    5. ACCEPTED docs are handed to ``accept_sink`` and their bands + text
       land in per-batch store subdirectories written with OVERWRITE —
       a replayed batch rewrites its own directories idempotently, so a
       sink failure can never strand documents half-registered.

    The store is sparse band-bucket rows plus accepted text, laid out in
    per-batch directories; on a lakehouse table format the per-batch
    overwrite becomes a transactional replaceWhere.  Returns the
    StreamingQuery.
    """
    from ..operators.dedup import jaccard_pairs, minhash_band_keys

    bands_dir = f"{store_path}/bands"
    docs_dir = f"{store_path}/docs"

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        from pyspark.storagelevel import StorageLevel

        spark = batch.sparkSession
        batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
        if batch.isEmpty():
            batch.unpersist()
            return
        # every persisted frame releases on ANY exit — a mid-batch failure
        # followed by foreachBatch retries must not accumulate cached
        # blocks across attempts
        pinned = [batch]
        try:
            _process_pinned(batch, batch_id, pinned)
        finally:
            for df in pinned:
                df.unpersist()

    def _process_pinned(batch, batch_id, pinned):
        from pyspark.storagelevel import StorageLevel

        spark = batch.sparkSession
        bands_new = minhash_band_keys(
            batch, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, bands=bands,
        )  # (id, band, key) — unfiltered: every band participates
        bands_new = bands_new.persist(StorageLevel.MEMORY_AND_DISK)
        pinned.append(bands_new)
        store_bands = _try_read_parquet(spark, bands_dir)
        batch_ids = batch.select(id_col).dropDuplicates()
        rejected = None
        if store_bands is not None:
            cand = (
                store_bands.join(
                    F.broadcast(bands_new.withColumnRenamed("id", "__bid")),
                    ["band", "key"],
                )
                .filter(F.col("id") != F.col("__bid"))
                .select(
                    F.col("__bid").alias("__batch_doc"),
                    F.col("id").alias("__stored_doc"),
                )
                .dropDuplicates()
            )
            # cand feeds isEmpty + four downstream branches: persist it so
            # the growing band store is scanned/joined once per batch, not
            # once per consumer (it is small by construction)
            cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
            pinned.append(cand)
            # a half-written store (bands landed, docs write crashed) must
            # not wedge the query: with no stored text to verify against,
            # candidates cannot be CONFIRMED duplicates, so they pass —
            # the verification-required contract, never a crash loop
            stored_docs_all = (
                _try_read_parquet(spark, docs_dir)
                if not cand.isEmpty()
                else None
            )
            if stored_docs_all is not None:
                stored_docs = stored_docs_all.select(id_col, text_col)
                pool = (
                    stored_docs.join(
                        cand.select(
                            F.col("__stored_doc").alias(id_col)
                        ).dropDuplicates(),
                        [id_col],
                        "left_semi",
                    )
                    .unionByName(
                        batch.select(id_col, text_col).join(
                            cand.select(
                                F.col("__batch_doc").alias(id_col)
                            ).dropDuplicates(),
                            [id_col],
                            "left_semi",
                        )
                    )
                    .dropDuplicates([id_col])
                )
                # exact verification over the candidate pool only — small
                # by construction; exact textbook Jaccard (no DF cap)
                pairs = jaccard_pairs(
                    pool, id_col=id_col, text_col=text_col, n=n,
                    threshold=threshold, max_shingle_df=None,
                )
                stored_only = (
                    cand.select(F.col("__stored_doc").alias(id_col))
                    .dropDuplicates()
                    .join(batch_ids, [id_col], "left_anti")
                )
                # a verified pair touching a stored-only doc rejects its
                # batch-side counterpart (either orientation)
                rejected = (
                    pairs.join(
                        stored_only.withColumnRenamed(id_col, "id_a"),
                        ["id_a"], "left_semi",
                    ).select(F.col("id_b").alias(id_col))
                    .unionByName(
                        pairs.join(
                            stored_only.withColumnRenamed(id_col, "id_b"),
                            ["id_b"], "left_semi",
                        ).select(F.col("id_a").alias(id_col))
                    )
                    .dropDuplicates()
                    .join(batch_ids, [id_col], "left_semi")
                )
        survivors = (
            batch if rejected is None
            else batch.join(rejected, [id_col], "left_anti")
        )
        # within-batch: verified near-dup pairs among survivors; the
        # larger id of each pair drops (deterministic keep-first)
        within = jaccard_pairs(
            survivors.select(id_col, text_col), id_col=id_col,
            text_col=text_col, n=n, threshold=threshold,
            max_shingle_df=None,
        )
        accepted = survivors.join(
            within.select(F.col("id_b").alias(id_col)).dropDuplicates(),
            [id_col],
            "left_anti",
        )
        accepted_bands = bands_new.join(
            accepted.select(F.col(id_col).alias("id")), ["id"], "left_semi"
        )
        # materialise BEFORE the store writes: both frames' lineage reads
        # the store directories that the overwrite below deletes — writing
        # from live lineage on a replay would scan just-deleted files.
        # localCheckpoint cuts the lineage to executor-held blocks.
        accepted = accepted.localCheckpoint(eager=True)
        accepted_bands = accepted_bands.localCheckpoint(eager=True)
        # per-batch directories + overwrite = replay-idempotent registration
        accepted_bands.write.mode("overwrite").parquet(
            f"{bands_dir}/batch={batch_id}"
        )
        accepted.select(id_col, text_col).write.mode("overwrite").parquet(
            f"{docs_dir}/batch={batch_id}"
        )
        if accept_sink is not None:
            accept_sink(accepted)

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
