"""End-to-end corpus curation: the composed cleaning pass a pretraining
pipeline runs before tokenization — exact dedup, Gopher-style quality
filtering, and deterministic train/val/test assignment, as ONE DataFrame
plan.

Every stage is an already-verified operator (:mod:`.dedup` exact
fingerprint, :mod:`.text` quality rules, :mod:`.sampling` hash splits);
the composition proves they chain without materialization barriers:

* ONE corpus scan and one fingerprint shuffle for dedup (min-struct
  first-occurrence aggregate — map-side combine ships at most one
  candidate row per distinct fingerprint per task, and the md5 key is
  uniform so the shuffle cannot skew) — or ZERO shuffles on a corpus
  laid out by :func:`write_fingerprinted` (bucketed+sorted on the
  precomputed fingerprint, the repeated-curation physical design);
* the quality features and split assignment are pure projections on the
  survivors — no further shuffle;
* everything is content-addressed (md5 of text / id), so the curated
  SET is reproducible across runs, partitionings, and engines — the
  property that keeps a 100 TB re-ingest from silently reshuffling
  train/test membership.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curate_corpus(
    docs: DataFrame,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Exact-dedup → quality-filter → split-assign in one plan.

    Returns the curated survivors: the input columns plus ``dup_count``
    (how many exact copies this document absorbed), ``quality_score`` and
    ``lang_guess`` from the feature pass, and ``split`` when
    ``split_weights`` is given.  Documents failing a quality rule are
    dropped (rule order and reasons as in :func:`..text.quality_filter`);
    among exact duplicates the minimum id survives (deterministic).

    ``fingerprint_col`` names a PRECOMPUTED content fingerprint (see
    :func:`write_fingerprinted`).  On a corpus stored bucketed+sorted on
    that column the first-occurrence aggregate reads co-located buckets,
    so the whole curation plan runs with ZERO Exchange: the 100 TB
    physical-design lever (dedup becomes scan-bound instead of
    shuffle-bound, and re-runs amortize the one-time bucketed write).
    """
    from . import sampling as sp
    from . import text as tx

    in_cols = list(docs.columns)
    if fingerprint_col is None:
        fpc = "__fp"
        docs = docs.withColumn(
            fpc, F.md5(F.lower(F.trim(F.col(text_col))))
        )
    else:
        fpc = fingerprint_col
    # first-occurrence via min-struct aggregate with the id leading, so
    # the lexicographic min IS the min-id row (the segment_dedup
    # pattern): ONE corpus scan and ONE shuffle, no join back — and the
    # map-side partial combine ships at most one candidate row per
    # distinct fingerprint per task, so shuffled bytes are bounded by
    # the deduplicated corpus, not the raw one.  (A join-back design
    # can't stay co-located anyway: the survivor equality id==keep_id
    # gets folded into the join keys by the optimizer, defeating
    # fingerprint bucketing.)  NULL text groups under a NULL
    # fingerprint and is dropped by the quality rules downstream.
    row = F.struct(
        *([F.col(id_col)] + [F.col(c) for c in in_cols if c != id_col])
    )
    surv = (
        docs.groupBy(F.col(fpc).alias("__keep_fp"))
        .agg(F.min(row).alias("__row"), F.count("*").alias("dup_count"))
        .select(
            *[F.col(f"__row.{c}").alias(c) for c in in_cols], "dup_count"
        )
    )
    filtered = tx.quality_filter(surv, text_col=text_col).filter(F.col("keep"))
    out = filtered.select(
        *in_cols, "dup_count", "quality_score", "lang_guess"
    )
    if split_weights:
        out = sp.assign_splits(out, split_weights, id_col=id_col, seed=seed)
    return out


def write_curated(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    order_by: str = "doc_id",
    max_records_per_file: int = 1_000_000,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 8,
    manifest: bool = False,
    card: bool = False,
    card_name: str = "corpus",
) -> None:
    """Materialize a curated corpus as partitioned parquet with a
    reproducible file layout — the hand-off artifact to the trainer.

    * ``partition_by`` (default ``["split"]`` when present) becomes
      directory partitioning, so the trainer's split/lang selection is
      partition PRUNING, never a scan-and-filter;
    * rows are sorted by ``order_by`` within each task
      (``sortWithinPartitions`` — a local sort, NO global shuffle), so
      file contents are deterministic given the same partitioning and
      re-ingests diff cleanly;
    * ``maxRecordsPerFile`` bounds file sizes without an extra
      repartition job (the writer splits as it goes);
    * ``zorder_by`` (2+ bounded-integer expressions, see
      :func:`~.util.zorder_key`) clusters rows along the Morton curve
      BEFORE the local sort — every output file then covers a compact
      box in each listed dimension, so the trainer's range predicates
      (length bucket × quality bucket, date × domain, ...) prune on
      parquet min/max statistics instead of scanning.
    """
    if partition_by is None:
        partition_by = ["split"] if "split" in df.columns else []
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in frame: {missing}")
    if zorder_by:
        from .util import zorder_key

        # range-partition on the Morton key, then sort by (directory
        # partition, z-key) in ONE within-task pass — the z-run stays
        # contiguous inside each output directory's files
        df = (
            df.withColumn("__zkey", zorder_key(*zorder_by, bits=zorder_bits))
            .repartitionByRange("__zkey")
            .sortWithinPartitions(*(partition_by + ["__zkey"]))
            .drop("__zkey")
        )
    else:
        df = df.sortWithinPartitions(*(partition_by + [order_by]))
    writer = (
        df.write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    # documentation artifacts travel WITH the data (both `_`-prefixed, so
    # parquet discovery ignores them): the manifest answers "did
    # membership change" without a data read; the card answers "what is
    # this" without a notebook
    if manifest:
        write_manifest(df.sparkSession, path, id_col=order_by)
    if card and "text" in df.columns:
        from .. import fsio

        fsio.write_text(
            df.sparkSession, f"{path.rstrip('/')}/_DATASET_CARD.md",
            dataset_card(df, name=card_name),
        )


def write_fingerprinted(
    spark,
    docs: DataFrame,
    table: str = "molap_corpus.documents_fp",
    buckets: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """One-time physical design for repeated curation: materialize the
    corpus with its content fingerprint PRECOMPUTED, bucketed+sorted on
    it.

    Every subsequent :func:`curate_corpus` call with
    ``fingerprint_col="fingerprint"`` then plans with zero Exchange (the
    first-occurrence min-struct aggregate reads co-located
    buckets) — the corpus-dedup analog of the star schema's bucketed
    fact⋈bridge layout (:mod:`..sources.bucketing`).  Size ``buckets`` so
    one bucket ≈ one executor-core's worth of documents at the target
    scale; the md5 key is uniform by construction, so buckets cannot
    skew.

    Returns the catalog-backed DataFrame (bucket metadata attached —
    reading the path directly would lose it).
    """
    fp = F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint")
    if "." in table:
        database = table.rsplit(".", 1)[0]
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
        subdir = f"{database}.db/{table.rsplit('.', 1)[-1]}"
    else:
        subdir = table
    # the default in-memory catalog forgets tables across sessions but
    # their warehouse locations persist — clear both
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = spark._jvm.org.apache.hadoop.fs.Path(f"{wh.rstrip('/')}/{subdir}")
    loc.getFileSystem(spark._jsc.hadoopConfiguration()).delete(loc, True)
    (
        docs.select("*", fp)
        .write.bucketBy(buckets, "fingerprint")
        .sortBy("fingerprint")
        .format("parquet")
        .saveAsTable(table)
    )
    return spark.table(table)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Version-to-version corpus audit: classify every document id as
    ``added`` / ``removed`` / ``changed`` / ``unchanged`` between two
    corpus snapshots, comparing CONTENT fingerprints (md5 of
    lower+trim — the same normalization as exact dedup, so a re-crawl
    that only reflows whitespace/case reads as unchanged).

    The re-ingest hygiene check: a refreshed 100 TB crawl should mostly
    diff as ``unchanged``; an unexpected ``changed``/``removed`` surge
    means the upstream extractor drifted and train/test membership
    downstream is about to churn.  One full-outer equi-join on the id —
    a single id-keyed shuffle, no text comparison beyond the hash.

    Returns (id, old_fingerprint, new_fingerprint, status); NULL text
    hashes to a NULL fingerprint, which compares null-safely (two NULL
    texts are ``unchanged``).
    """
    def fp(df: DataFrame, out: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"__{out}_id"),
            F.md5(F.lower(F.trim(F.col(text_col)))).alias(f"{out}_fingerprint"),
        )

    o, n = fp(old, "old"), fp(new, "new")
    status = (
        F.when(F.col("__old_id").isNull(), "added")
        .when(F.col("__new_id").isNull(), "removed")
        .when(
            ~F.col("old_fingerprint").eqNullSafe(F.col("new_fingerprint")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        o.join(n, F.col("__old_id") == F.col("__new_id"), "full_outer")
        .select(
            F.coalesce("__old_id", "__new_id").alias(id_col),
            "old_fingerprint",
            "new_fingerprint",
            status.alias("status"),
        )
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    id_col: str = "doc_id",
    op_col: str = "op",
    seq_col: str = "change_seq",
) -> DataFrame:
    """Apply a CDC change feed to a corpus snapshot — the MERGE INTO
    analog for an engine without a table format: ``upsert`` rows replace
    (or insert) the snapshot row with the same id, ``delete`` rows
    tombstone it, and multiple changes to one id resolve LAST-WINS by
    ``seq_col``.  Returns the next snapshot with exactly the snapshot's
    schema.

    Scale shape: one aggregation collapses the feed to its final change
    per id (max-of-struct with the sequence leading — map-side combine,
    deterministic even on seq ties because the struct comparison totals
    the order over the payload; a NULL sequence sorts LOWEST, so a
    NULL-seq change never beats a sequenced one), then ONE full-outer
    id-keyed join
    against the snapshot.  The feed is typically a daily crawl delta —
    orders of magnitude smaller than the snapshot — so the join's
    snapshot side never rescans more than once, and a snapshot bucketed
    on the id makes it co-located.
    """
    payload = [c for c in snapshot.columns if c != id_col]
    missing = [c for c in payload + [op_col, seq_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"change feed lacks columns {missing}")
    latest = (
        changes.groupBy(F.col(id_col).alias("__chg_id"))
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("__seq"),
                    F.col(op_col).alias("__op"),
                    *[F.col(c).alias(c) for c in payload],
                )
            ).alias("__last")
        )
        .select("__chg_id", "__last.*")
    )
    # an op outside the vocabulary must fail loudly, not act as a delete
    latest = latest.withColumn(
        "__op",
        F.when(F.col("__op").isin("upsert", "delete"), F.col("__op")).otherwise(
            F.raise_error(F.concat(F.lit("apply_changes: unknown op "), F.col("__op")))
        ),
    )
    keep = F.col("__chg_id").isNull() | (F.col("__op") == "upsert")
    merged = snapshot.alias("snapshot").join(
        latest.alias("latest"), F.col(id_col) == F.col("__chg_id"), "full_outer"
    )
    cols = [F.coalesce(F.col(id_col), F.col("__chg_id")).alias(id_col)] + [
        F.when(F.col("__chg_id").isNull(), F.col(f"snapshot.{c}"))
        .otherwise(F.col(f"latest.{c}"))
        .alias(c)
        for c in payload
    ]
    return merged.where(keep).select(*cols)


def shuffle_order(
    docs: DataFrame,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Reproducible global training-shuffle order: every document gets a
    pseudo-random but DETERMINISTIC position (the md5-prefix bigint of
    ``seed:id`` — content-addressed, so the epoch order survives
    re-partitioning, re-ingest and engine changes; a new ``seed`` string
    is a fresh permutation for the next epoch).  The exact global rank
    comes from :func:`~.util.distributed_rank` — no single-task global
    window — so the order can be computed, joined, or written
    (``orderBy`` the rank, or range-write directly) at any corpus size.
    """
    from .util import distributed_rank

    # pure column expressions — the seed is a literal, never spliced into
    # SQL text (quotes/backslashes in a seed string cannot change the plan)
    key = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    with_key = docs.withColumn("__skey", key)
    ranked = distributed_rank(with_key, ["__skey", id_col], rank_col=rank_col)
    return ranked.drop("__skey")


def plan_shards(
    docs: DataFrame,
    num_shards: int | None = None,
    target_tokens: int | None = None,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "shards0",
    shard_col: str = "shard_id",
) -> DataFrame:
    """Plan token-BALANCED output shards: every document is assigned a
    ``shard_col`` so that consecutive shards carry ~equal token mass —
    the layout a training job wants (each data-loader worker streams one
    shard; a size-skewed shard is a straggler for the whole epoch).
    Pass ``num_shards`` (balance the whole corpus into N) or
    ``target_tokens`` (open a new shard every ~T tokens).

    Documents are first placed in the content-addressed pseudo-random
    order of :func:`shuffle_order` (md5(seed:id) — deterministic under
    any partitioning, and a fresh ``seed`` re-deals the shards), then cut
    into contiguous token-budget runs via an exact distributed prefix sum
    (:func:`~.util.distributed_cumsum` — two-phase, never a single-task
    global window).  A document always lands wholly in the shard where
    its run begins, so a shard can exceed the target by at most one
    document's tokens.

    All integer arithmetic — reproducible bit-for-bit on any engine.
    Returns the input columns plus ``(n_tokens, cum_tokens, shard_col)``
    (the input must not already carry those names).
    """
    from .util import distributed_cumsum

    if (num_shards is None) == (target_tokens is None):
        raise ValueError("pass exactly one of num_shards / target_tokens")
    if token_col is None:
        n_tok = F.size(F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"))
    else:
        n_tok = F.col(token_col)
    skey = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    base = docs.withColumn("n_tokens", n_tok.cast("long")).withColumn(
        "__skey", skey
    )
    cum = distributed_cumsum(
        base, ["__skey", id_col], "n_tokens", cumsum_col="cum_tokens"
    )
    # `div` = exact integer division (all quantities are non-negative
    # longs) — no double quotient to misround at 100 TB token counts
    if target_tokens is not None:
        shard = F.expr(
            f"(cum_tokens - n_tokens) div {int(target_tokens)}"
        )
        out = cum.withColumn(shard_col, shard.cast("long"))
    else:
        # target = ceil(total/num_shards), computed plan-side: the 1-row
        # total broadcast-crossjoins back (no driver round-trip).
        # Aggregate over `cum` — its lineage is the localCheckpoint-PINNED
        # shuffled frame, so the total reuses those partitions instead of
        # re-scanning and re-tokenizing the source a second time
        total = cum.agg(F.sum("n_tokens").alias("__total"))
        cum = cum.crossJoin(F.broadcast(total))
        shard = F.least(
            F.expr(
                "(cum_tokens - n_tokens) div "
                f"((__total + {int(num_shards)} - 1) div {int(num_shards)})"
            ),
            F.lit(int(num_shards) - 1),
        )
        out = cum.withColumn(shard_col, shard.cast("long")).drop("__total")
    return out.drop("__skey")


def write_shards(
    docs: DataFrame,
    path: str,
    num_shards: int | None = None,
    target_tokens: int | None = None,
    mode: str = "overwrite",
    shard_col: str = "shard_id",
    **plan_kwargs,
) -> DataFrame:
    """Materialize a :func:`plan_shards` layout: the corpus is written
    as ``{path}/shard_id=N/`` parquet partitions carrying every input
    column plus ``n_tokens`` — the physical training-shard layout a
    data-loader streams per worker.  The plan keeps all columns through
    the prefix sum, so the write needs NO join back to the corpus (one
    range-partition pass, then the partitioned write).  Returns the
    per-shard balance audit (:func:`shard_summary`) of what was written.
    """
    planned = plan_shards(
        docs,
        num_shards=num_shards,
        target_tokens=target_tokens,
        shard_col=shard_col,
        **plan_kwargs,
    )
    planned.drop("cum_tokens").write.partitionBy(shard_col).mode(
        mode
    ).parquet(path)
    return shard_summary(planned, shard_col=shard_col)


def shard_plan_state(planned: DataFrame, target_tokens: int) -> dict:
    """The carry-over state of a ``target_tokens`` shard plan — what
    :func:`plan_shards_append` needs to CONTINUE the layout for the next
    batch without replanning the corpus: the running token total and the
    target.  One tiny aggregate (two longs), store it in any manifest."""
    row = planned.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t")
    ).collect()[0]
    return {"total_tokens": int(row["t"]), "target_tokens": int(target_tokens)}


def plan_shards_append(
    docs: DataFrame,
    state: dict,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "shards0",
    shard_col: str = "shard_id",
) -> tuple[DataFrame, dict]:
    """Incremental shard maintenance: assign a NEW batch so it CONTINUES
    an existing ``target_tokens`` layout — the batch's prefix sum starts
    at the stored running total, so the current tail shard fills up
    before a new one opens and earlier shards are never touched.  The
    per-batch cost is batch-sized (one range-partition of the batch);
    nothing rescans the corpus — the same maintenance contract as
    ``bloom_append`` / ``ivf_append`` / ``minhash_index_append``.

    Returns ``(assignment, new_state)``.  Feeding batches through
    repeatedly cuts shard boundaries every ``target_tokens`` along the
    stream ordered batch-by-batch (each batch internally in its
    content-addressed order) — the sequential-walk invariant the unit
    test pins.  Note this is NOT the same assignment as re-running
    :func:`plan_shards` over the union: a replan re-deals ALL documents
    into one global pseudo-random order, interleaving the batches —
    that is the rebuild path; this is the append path (ids and token
    masses conserved, earlier shards untouched).
    """
    target = int(state["target_tokens"])
    offset = int(state["total_tokens"])
    planned = plan_shards(
        docs,
        target_tokens=target,
        token_col=token_col,
        text_col=text_col,
        id_col=id_col,
        seed=seed,
        shard_col=shard_col,
    )
    out = (
        planned.withColumn(
            "cum_tokens", (F.col("cum_tokens") + F.lit(offset)).cast("long")
        )
        .withColumn(
            shard_col,
            F.expr(f"(cum_tokens - n_tokens) div {target}").cast("long"),
        )
    )
    batch_tokens = planned.agg(
        F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("t")
    ).collect()[0]["t"]
    return out, {
        "total_tokens": offset + int(batch_tokens),
        "target_tokens": target,
    }


def shard_summary(
    planned: DataFrame, shard_col: str = "shard_id"
) -> DataFrame:
    """Per-shard audit of a :func:`plan_shards` assignment: document
    count, token mass, and the min/max doc size in the shard — the
    balance report a writer checks before burning I/O on the layout."""
    return planned.groupBy(shard_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_doc_tokens"),
        F.max("n_tokens").alias("max_doc_tokens"),
    )


def output_summary(spark, path: str) -> dict:
    """File-level audit of a written dataset: file count, total bytes,
    row count, and size distribution (min/median/max file bytes) — read
    from parquet FOOTERS via the directory listing, no data scan.  The
    number a compaction decision (:func:`compact_files`) and a writer
    regression test both need.
    """
    import statistics
    from urllib.parse import urlparse

    # listing via the Hadoop FileSystem API, so the audit works on the
    # store the data actually lives on (local, HDFS, object stores)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    files: list[tuple[str, int]] = []
    if fs.exists(hpath):
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.endswith(".parquet") and not name.startswith("_"):
                files.append(
                    (str(st.getPath().toUri().getPath()), int(st.getLen()))
                )
    files.sort()
    if not files:
        return {"n_files": 0, "total_bytes": 0, "n_rows": 0}
    sizes = [sz for _, sz in files]
    scheme = urlparse(path).scheme
    if scheme in ("", "file"):
        # local fast path: row counts straight from the parquet footers
        import pyarrow.parquet as pq

        rows = sum(pq.read_metadata(f).num_rows for f, _ in files)
    else:
        # remote stores: one Spark count — projects no columns, so the
        # scan iterates row-group batch counts, not data pages
        rows = spark.read.parquet(path).count()
    return {
        "n_files": len(files),
        "total_bytes": sum(sizes),
        "n_rows": rows,
        "min_file_bytes": min(sizes),
        "median_file_bytes": int(statistics.median(sizes)),
        "max_file_bytes": max(sizes),
    }


def compact_files(
    spark,
    path: str,
    out_path: str | None = None,
    target_file_bytes: int = 128 << 20,
    order_by: list[str] | None = None,
) -> dict:
    """Small-files compaction — the table-maintenance pass every
    long-lived ingest directory needs (streaming sinks and per-batch
    appends leave thousands of KB-scale files; at 100 TB the file LISTING
    becomes a bottleneck before the data does, and every reader pays a
    task per file).

    Rewrites ``path`` into ``out_path`` (default: ``path + '.compacted'``)
    with partition count = ceil(total_bytes / target_file_bytes), sized
    from the actual on-disk footprint (:func:`output_summary` — footer
    metadata, no data scan).  ``order_by`` optionally re-sorts rows within
    output tasks (restores clustering that append order destroyed).
    Returns the after-summary plus the before/after file counts.

    The rewrite is one job: scan → repartition → write; content is
    preserved exactly (tested by fingerprint multiset).  Compact-in-place
    is deliberately NOT offered — atomic swap semantics belong to a table
    format (Delta/Iceberg); on raw directories the caller swaps after
    validating the output.
    """
    before = output_summary(spark, path)
    if not before["n_files"]:
        raise ValueError(f"nothing to compact under {path}")
    dst = out_path or (path.rstrip("/") + ".compacted")
    parts = max(1, -(-before["total_bytes"] // target_file_bytes))
    df = spark.read.parquet(path)
    if order_by:
        df = df.repartition(parts).sortWithinPartitions(*order_by)
    else:
        df = df.coalesce(parts) if parts < df.rdd.getNumPartitions() else df.repartition(parts)
    df.write.mode("overwrite").parquet(dst)
    after = output_summary(spark, dst)
    return {
        "out_path": dst,
        "before_files": before["n_files"],
        "after_files": after["n_files"],
        **{f"after_{k}": v for k, v in after.items()},
    }


def curate_increment(
    new_docs: DataFrame,
    corpus: DataFrame,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
    m_bits: int | None = None,
    k: int = 5,
    fingerprint_col: str | None = None,
) -> DataFrame:
    """The INCREMENTAL counterpart of :func:`curate_corpus`: curate a new
    ingest batch against an existing corpus — batch-internal exact dedup →
    quality rules → Bloom-prefiltered exact dedup AGAINST THE CORPUS →
    split assignment, composed.

    Returns the accepted documents (the rows to append to the corpus):
    the batch survivors' columns from :func:`curate_corpus` (dup_count,
    quality_score, lang_guess) plus ``bloom_hit`` (the prefilter verdict —
    observable fp accounting) and ``split`` when weights are given.

    Scale shape: the corpus contributes ONE Bloom bitmap build — or none,
    when a maintained bitmap exists (:func:`..dedup.bloom_build` outputs
    OR-merge) — plus an exact verification join whose left side is only
    the Bloom HITS among quality survivors.  The batch is never joined to
    the corpus wholesale; content-addressed hashing keeps the accepted
    SET reproducible across runs and engines, so repeated ingests cannot
    silently churn train/test membership.
    """
    from . import sampling as sp
    from .dedup import BLOOM_WORD_BITS, incremental_dedup

    if m_bits is None:
        m_bits = BLOOM_WORD_BITS << 14
    batch = curate_corpus(
        new_docs, split_weights=None, id_col=id_col, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    # forward fingerprint_col so the corpus membership check is keyed the
    # SAME way as batch-internal dedup (and so a write_fingerprinted
    # corpus keeps its precomputed/bucketed fingerprint instead of
    # silently recomputing md5(lower(trim(text))))
    flags = incremental_dedup(
        batch, corpus, m_bits=m_bits, k=k, id_col=id_col, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    out = batch.join(
        flags.select(id_col, "bloom_hit", "is_dup"), id_col
    ).filter(~F.col("is_dup")).drop("is_dup")
    if split_weights:
        out = sp.assign_splits(out, split_weights, id_col=id_col, seed=seed)
    return out


def write_manifest(spark, path: str, id_col: str = "doc_id") -> dict:
    """Write the reproducibility manifest next to a curated dataset: file
    layout stats (:func:`output_summary` — footer metadata, no data scan)
    plus per-partition-directory row counts and a CONTENT fingerprint (md5
    over the sorted id list, computed distributed and combined
    order-independently per split).  Re-running a 100 TB curation and
    diffing two `_manifest.json` files answers "did membership change?"
    without reading either dataset's text.

    Returns the manifest dict; writes ``_manifest.json`` under ``path``
    (the ``_`` prefix keeps it out of parquet data discovery).
    """
    import json

    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    summary = output_summary(spark, path)
    split_col = "split" if "split" in df.columns else None
    keys = [split_col] if split_col else []
    per = (
        df.groupBy(*keys).agg(
            F.count("*").alias("n_rows"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.col(id_col))),
                        lambda x: x.cast("string"),
                    ),
                )
            ).alias("ids_md5"),
        )
    ).collect()
    manifest = {
        "path": path,
        **summary,
        "partitions": {
            (r[split_col] if split_col else "__all__"): {
                "n_rows": r["n_rows"],
                "ids_md5": r["ids_md5"],
            }
            for r in per
        },
    }
    from .. import fsio

    fsio.write_text(
        spark, f"{path.rstrip('/')}/_manifest.json",
        json.dumps(manifest, indent=1, sort_keys=True),
    )
    return manifest


def dataset_card(df, name: str = "corpus", text_col: str = "text") -> str:
    """Generate a markdown DATASET CARD for a curated corpus — the
    documentation artifact that travels with the data: size, language and
    script mix, length distribution, quality summary, and (when present)
    split membership — all from TWO aggregation jobs over the frame, the
    numbers a consumer asks before training on it.

    Returns the markdown string; write it next to the data as
    ``_DATASET_CARD.md`` if persisting.
    """
    from pyspark.sql import functions as F

    from . import text as tx

    feats = tx.text_features(df, text_col=text_col)
    agg = feats.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.avg("n_tokens").alias("avg_tokens"),
        F.expr("percentile(n_tokens, 0.5)").alias("med_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.avg("quality_score").alias("avg_quality"),
    ).collect()[0]
    langs = (
        feats.groupBy("lang_guess")
        .count()
        .orderBy(F.col("count").desc(), "lang_guess")
        .limit(10)
        .collect()
    )
    lines = [
        f"# Dataset card: {name}",
        "",
        "## Size",
        f"- documents: {agg['n_docs']:,}",
        f"- whitespace tokens: {int(agg['n_tokens'] or 0):,} "
        f"(avg {float(agg['avg_tokens'] or 0):.1f}, "
        f"median {int(agg['med_tokens'] or 0)}, "
        f"min {agg['min_tokens']}, max {agg['max_tokens']})",
        "",
        "## Language mix (stopword-vote heuristic)",
    ]
    total = max(int(agg["n_docs"]), 1)
    for r in langs:
        lines.append(
            f"- {r['lang_guess']}: {r['count']:,} "
            f"({100.0 * r['count'] / total:.1f}%)"
        )
    lines += [
        "",
        "## Quality",
        f"- mean composite quality score: {float(agg['avg_quality'] or 0):.4f}",
    ]
    if "split" in df.columns:
        lines += ["", "## Splits"]
        for r in (
            df.groupBy("split").count().orderBy("split").collect()
        ):
            lines.append(
                f"- {r['split']}: {r['count']:,} "
                f"({100.0 * r['count'] / total:.1f}%)"
            )
    lines += [
        "",
        "_Generated by dataset_card() — numbers from two aggregation "
        "passes; regenerate after any membership change._",
    ]
    return "\n".join(lines)


def init_ingest_state(
    corpus: DataFrame,
    state_dir: str,
    fp_rate: float = 0.01,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str | None = None,
    near_dup: bool = False,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> dict:
    """One-time setup for STATEFUL multi-batch ingestion: persist the
    corpus's exact-membership state under ``state_dir`` —

    * ``bloom/`` — the membership bitmap, sized by
      :func:`..dedup.bloom_parameters` for the corpus cardinality at
      ``fp_rate`` (a few MB at any corpus size);
    * ``fingerprints/`` — one content fingerprint per corpus document
      (16 bytes/doc; the EXACT verification store, so membership checks
      never need the corpus text again);
    * with ``near_dup=True``: ``minhash/`` — the LSH band-key index
      (:func:`..dedup.write_minhash_index`) — and ``signatures/`` — the
      full MinHash signatures (``num_hashes`` longs/doc), the compact
      sketch that lets near-dup candidates be VERIFIED by estimated
      Jaccard (matching-component fraction) without keeping corpus text.

    After this, :func:`ingest_batch` curates each arriving batch against
    the state and folds its acceptances back in — the corpus itself is
    never rescanned per batch.  Returns ``{"n_items", "m_bits", "k"}``.
    """
    from .dedup import (
        bloom_build, bloom_parameters, minhash_signatures,
        write_bloom, write_minhash_index,
    )

    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else F.md5(F.lower(F.trim(F.col(text_col))))
    )
    fps = corpus.select(fp.alias("fingerprint")).where(
        F.col("fingerprint").isNotNull()
    ).distinct()
    n_items = fps.count()
    m_bits, k = bloom_parameters(max(n_items, 1), fp_rate)
    root = state_dir.rstrip("/")
    fps.write.mode("overwrite").parquet(f"{root}/fingerprints")
    bm = bloom_build(
        corpus, m_bits=m_bits, k=k, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    write_bloom(bm, f"{root}/bloom", m_bits, k)
    if near_dup:
        write_minhash_index(
            corpus, f"{root}/minhash", id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes, bands=bands,
        )
        minhash_signatures(
            corpus, id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes,
        ).write.mode("overwrite").parquet(f"{root}/signatures")
    return {"n_items": n_items, "m_bits": m_bits, "k": k}


def ingest_batch(
    new_docs: DataFrame,
    state_dir: str,
    split_weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "split",
    fingerprint_col: str | None = None,
    near_dup_threshold: float | None = None,
    collapse_batch_near_dups: bool = False,
    with_rejects: bool = False,
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Curate ONE arriving batch against the persisted ingest state and
    fold its acceptances back in — the stateful, multi-batch form of
    :func:`curate_increment` (which re-derives corpus state per call):

    1. batch-internal exact dedup + quality rules (:func:`curate_corpus`);
    2. Bloom prefilter against the ``state_dir`` bitmap (pure projection);
    3. EXACT verification of the hits only, against the fingerprint
       store — never the corpus text (`bloom_hit ∧ stored` ⇒ duplicate;
       a Bloom filter has no false negatives, so misses skip the join);
    4. accepted documents' fingerprints append to the store and OR-merge
       into the bitmap (:func:`..dedup.bloom_append`), so the NEXT batch
       sees this one's acceptances as corpus members.

    With ``near_dup_threshold`` set (requires a state initialized with
    ``near_dup=True``), exact-dup survivors additionally probe the LSH
    band-key index; candidates are VERIFIED by estimated Jaccard over the
    stored MinHash signatures (matching-component fraction — granularity
    1/num_hashes, the standard signature-only estimator; corpus text is
    never needed), and near-duplicates of the corpus OR of earlier
    acceptances reject.  Accepted documents' band keys + signatures fold
    back into the index alongside the exact-membership artifacts.
    Batch-INTERNAL near-dups are kept by default (exact batch dedup
    already ran); ``collapse_batch_near_dups=True`` additionally collapses
    them — a signature self-join over the batch's band keys, estimated-
    Jaccard verification, connected components
    (:func:`..dedup.dedup_clusters`), min-id survivor per component —
    before the corpus check, so one canonical copy of each within-batch
    near-dup family is considered for acceptance.

    Per-batch cost: batch-sized work + a bitmap-sized merge + a
    hits-only join against the store — independent of accumulated corpus
    size except through the (few-MB) bitmap and the fingerprint store's
    join side, which the Bloom prefilter keeps restricted to true dups +
    the designed fp rate (near-dup adds a band-bucket join whose volume
    is collision-bound, never corpus×batch).  Returns the accepted rows
    (curate_corpus columns + ``bloom_hit`` + optional ``split``), eagerly
    materialized (the state update has already happened when this
    returns).  With ``with_rejects=True`` returns
    ``(accepted, rejects)`` where rejects is ``(id_col, reject_reason)``
    for every non-accepted input row — ``corpus_exact_dup``,
    ``corpus_near_dup``, ``batch_near_dup`` (only with
    ``collapse_batch_near_dups``), or ``batch_dup_or_quality``
    (collapsed batch-internal exact copies and quality drops happen
    inside curate_corpus and are accounted together) — the per-batch
    drop audit a production ingest dashboard needs.

    ONE WRITER per ``state_dir``: batches must be ingested sequentially
    (the whole point is that batch N+1 sees batch N's acceptances as
    members).  The bitmap swap in :func:`..dedup.write_bloom` is
    crash-safe but not concurrent-reader-safe — there is a moment
    between the two renames when the path is absent.
    """
    from .dedup import (
        _band_buckets, bloom_append, bloom_probe, minhash_signatures,
        read_bloom, read_minhash_index,
    )

    spark = new_docs.sparkSession
    root = state_dir.rstrip("/")
    if collapse_batch_near_dups and near_dup_threshold is None:
        raise ValueError(
            "collapse_batch_near_dups requires near_dup_threshold — "
            "without it no near-dup machinery runs and the flag would be "
            "silently ignored"
        )
    bitmap, m_bits, k = read_bloom(spark, f"{root}/bloom")
    store_path = f"{root}/fingerprints"
    # the membership key must match the STATE's: a state initialized with
    # fingerprint_col=... is keyed on that column, and probing with the
    # md5(text) default would silently admit every duplicate
    batch = curate_corpus(
        new_docs, split_weights=None, id_col=id_col, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    probed = bloom_probe(batch, bitmap, m_bits=m_bits, k=k, id_col=id_col,
                         text_col=text_col, fingerprint_col=fingerprint_col)
    probe_cols = (
        [id_col, "bloom_hit"]
        if fingerprint_col == "fingerprint"  # batch already carries it
        else [id_col, "fingerprint", "bloom_hit"]
    )
    flagged = batch.join(probed.select(*probe_cols), id_col)
    store = spark.read.parquet(store_path)
    hits = flagged.filter(F.col("bloom_hit"))
    verified_dups = hits.join(store, "fingerprint", "semi").select(id_col)
    accepted = flagged.join(verified_dups, id_col, "anti")
    sigs = None
    params = None
    if near_dup_threshold is not None:
        index, params = read_minhash_index(spark, f"{root}/minhash")
        nh = params["num_hashes"]
        # ONE signature computation per batch: the eager checkpoint
        # materializes the shingle→minhash work once, and candidate
        # generation, the index append and the signature append all read
        # the (id × num_hashes longs) result instead of re-deriving it
        sigs = minhash_signatures(
            accepted, id_col=id_col, text_col=text_col,
            n=params["n"], num_hashes=nh,
        ).localCheckpoint(eager=True)
        keys = _band_buckets(sigs, nh, params["bands"])
        matches = sum(
            F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
            for i in range(nh)
        )
        batch_nd = None
        if collapse_batch_near_dups:
            from .dedup import dedup_clusters

            self_cand = (
                keys.select(F.col("id").alias("id_a"), "band", "key")
                .join(
                    keys.select(F.col("id").alias("id_b"), "band", "key"),
                    ["band", "key"],
                )
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .dropDuplicates(["id_a", "id_b"])
            )
            self_pairs = (
                self_cand
                .join(sigs.alias("a"), F.col("id_a") == F.col("a.id"))
                .join(sigs.alias("b"), F.col("id_b") == F.col("b.id"))
                .filter(
                    matches.cast("double") / F.lit(float(nh))
                    >= near_dup_threshold
                )
                .select("id_a", "id_b")
            )
            clusters = dedup_clusters(sigs.select("id"), self_pairs)
            batch_nd = (
                clusters.filter(~F.col("keep"))
                .select(F.col("id").alias(id_col))
                .localCheckpoint(eager=True)
            )
            accepted = accepted.join(batch_nd, id_col, "anti")
            drop_ids = batch_nd.select(F.col(id_col).alias("id"))
            sigs = sigs.join(drop_ids, "id", "anti")
            keys = keys.join(drop_ids, "id", "anti")
        cand = (
            keys.select(F.col("id").alias("__new_id"), "band", "key")
            .join(index.select(F.col("id").alias("__old_id"), "band", "key"),
                  ["band", "key"])
            .select("__new_id", "__old_id")
            .dropDuplicates(["__new_id", "__old_id"])
        )
        old_sigs = spark.read.parquet(f"{root}/signatures")
        est = (
            cand.join(sigs.alias("a"), cand["__new_id"] == F.col("a.id"))
            .join(old_sigs.alias("b"), cand["__old_id"] == F.col("b.id"))
            .select(
                "__new_id",
                (matches.cast("double") / F.lit(float(nh))).alias("__est"),
            )
        )
        near = (
            est.filter(F.col("__est") >= near_dup_threshold)
            .select(F.col("__new_id").alias(id_col))
            .distinct()
        )
        accepted = accepted.join(near, id_col, "anti")
    if split_weights:
        from . import sampling as sp

        accepted = sp.assign_splits(
            accepted, split_weights, id_col=id_col, seed=seed
        )
    # materialize BEFORE mutating state: the accepted plan reads the
    # store/bitmap/index being rewritten below
    accepted = accepted.localCheckpoint(eager=True)
    rejects = None
    if with_rejects:
        r_exact = verified_dups.withColumn(
            "reject_reason", F.lit("corpus_exact_dup")
        )
        parts = [r_exact]
        if near_dup_threshold is not None:
            parts.append(
                near.withColumn("reject_reason", F.lit("corpus_near_dup"))
            )
            if batch_nd is not None:
                parts.append(
                    batch_nd.withColumn(
                        "reject_reason", F.lit("batch_near_dup")
                    )
                )
        explained = parts[0]
        for p in parts[1:]:
            explained = explained.unionByName(p)
        accounted = accepted.select(id_col).unionByName(
            explained.select(id_col)
        )
        r_other = (
            new_docs.select(id_col)
            .join(accounted, id_col, "anti")
            .withColumn("reject_reason", F.lit("batch_dup_or_quality"))
        )
        # materialize alongside accepted: these plans also read the
        # pre-mutation state files
        rejects = explained.unionByName(r_other).localCheckpoint(eager=True)
    # State-mutation ORDER is a durability decision: the Bloom bitmap is
    # folded FIRST (crash-safely — write_bloom swaps via temp dir + rename,
    # never destroying the only copy), the fingerprint store second.  A
    # crash between the two leaves bits set for fingerprints the store
    # does not hold, which only costs extra verification on a future
    # probe hit (verify misses → doc admitted, correctly).  The reverse
    # order would leave store rows the prefilter cannot see — later exact
    # duplicates would be SILENTLY accepted, since verification only runs
    # on bloom hits.  Full crash recovery: resize_ingest_state rebuilds
    # the bitmap from the store alone.
    bloom_append(
        accepted.select("fingerprint"), f"{root}/bloom",
        fingerprint_col="fingerprint",
    )
    accepted.select("fingerprint").distinct().write.mode("append").parquet(
        store_path
    )
    if near_dup_threshold is not None:
        # fold back from the CHECKPOINTED signatures (no re-shingling):
        # filter to the final acceptances, append their band keys into
        # the index partitions and their signatures into the store
        acc_sigs = sigs.join(
            accepted.select(F.col(id_col).alias("id")), "id", "semi"
        )
        _band_buckets(
            acc_sigs, params["num_hashes"], params["bands"]
        ).write.mode("append").partitionBy("band").parquet(f"{root}/minhash")
        acc_sigs.write.mode("append").parquet(f"{root}/signatures")
    if with_rejects:
        return accepted, rejects
    return accepted


def ingest_state_info(spark, state_dir: str) -> dict:
    """Inspect a persisted ingest state — the operational dashboard for
    the silent hazard in any long-running Bloom-gated loop: the bitmap
    was SIZED at init for the then-current corpus, and every appended
    batch raises its fill ratio, degrading the false-positive rate
    without any error.  Returns:

    * ``n_fingerprints`` — exact members in the verification store;
    * ``m_bits`` / ``k`` / ``fill_ratio`` — bitmap geometry and the
      fraction of bits set (one bitmap-sized aggregation);
    * ``est_fp_rate`` — the textbook fill-based estimate ``fill^k`` of
      the CURRENT probe false-positive rate (what a probe of a random
      non-member hits now, not what the filter was designed for);
    * ``resize_recommended`` — True when ``est_fp_rate`` exceeds ~10×
      the canonical 1% design point; re-run
      :func:`init_ingest_state` over corpus ∪ acceptances to re-size
      (the fingerprint store already holds every member, so the rebuild
      needs no corpus text);
    * with a near-dup arm: ``n_signatures`` and the banding params.

    False positives only cost extra verification work (the exact store
    check keeps membership EXACT at any fill), so degradation is a
    throughput problem — but at fill→1 every probe hits and the
    prefilter stops filtering, which is exactly what this surfaces.
    """
    from .dedup import read_bloom

    root = state_dir.rstrip("/")
    bitmap, m_bits, k = read_bloom(spark, f"{root}/bloom")
    set_bits = bitmap.agg(
        F.sum(F.bit_count(F.col("bits"))).alias("s")
    ).collect()[0]["s"] or 0
    n_fp = spark.read.parquet(f"{root}/fingerprints").count()
    fill = float(set_bits) / float(m_bits)
    est_fp = fill ** k
    info = {
        "n_fingerprints": int(n_fp),
        "m_bits": int(m_bits),
        "k": int(k),
        "fill_ratio": fill,
        "est_fp_rate": est_fp,
        "resize_recommended": est_fp > 0.10,
    }
    from .. import fsio

    if fsio.exists(spark, f"{root}/minhash"):
        from .dedup import read_minhash_index

        _, params = read_minhash_index(spark, f"{root}/minhash")
        info["near_dup_params"] = params
        info["n_signatures"] = spark.read.parquet(
            f"{root}/signatures"
        ).count()
    return info


def resize_ingest_state(spark, state_dir: str, fp_rate: float = 0.01) -> dict:
    """Re-size a drifted ingest bitmap IN PLACE, from the fingerprint
    store alone — no corpus text, no corpus rescan: the store is the
    exact membership set, so the new bitmap
    (:func:`..dedup.bloom_parameters`-sized for the CURRENT member count
    at ``fp_rate``) is rebuilt with one store-sized job.  Run when
    :func:`ingest_state_info` sets ``resize_recommended``; membership
    semantics are unchanged before/after (the bitmap is only ever a
    prefilter — the store verify keeps results exact at any fill).
    Near-dup artifacts need no resize (band-key partitions and the
    signature store grow naturally).  Returns the new geometry.

    This is also the CRASH-RECOVERY path for the bitmap: if a failure
    mid-ingest ever leaves the bloom artifact lost or suspect (write_bloom
    itself swaps atomically, but e.g. an interrupted manual copy), one
    call here reconstructs it exactly from the fingerprint store — the
    store is the authoritative membership set and is append-only."""
    from .dedup import bloom_build, bloom_parameters, write_bloom

    root = state_dir.rstrip("/")
    store = spark.read.parquet(f"{root}/fingerprints")
    n = store.count()
    m_bits, k = bloom_parameters(max(n, 1), fp_rate)
    bm = bloom_build(
        store, m_bits=m_bits, k=k, fingerprint_col="fingerprint"
    ).localCheckpoint(eager=True)
    write_bloom(bm, f"{root}/bloom", m_bits, k)
    return {"n_items": n, "m_bits": m_bits, "k": k}
