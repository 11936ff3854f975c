"""End-to-end corpus curation: the composed cleaning pass a pretraining
pipeline runs before tokenization — exact dedup, Gopher-style quality
filtering, and deterministic train/val/test assignment, as ONE DataFrame
plan.

Every stage is an already-verified operator (:mod:`.dedup` exact
fingerprint, :mod:`.text` quality rules, :mod:`.sampling` hash splits);
the composition proves they chain without materialization barriers:

* one fingerprint shuffle for the dedup join (equi-join on the md5, so
  AQE skew splitting applies to boilerplate-heavy corpora);
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
) -> DataFrame:
    """Exact-dedup → quality-filter → split-assign in one plan.

    Returns the curated survivors: the input columns plus ``dup_count``
    (how many exact copies this document absorbed), ``quality_score`` and
    ``lang_guess`` from the feature pass, and ``split`` when
    ``split_weights`` is given.  Documents failing a quality rule are
    dropped (rule order and reasons as in :func:`..text.quality_filter`);
    among exact duplicates the minimum id survives (deterministic).
    """
    from . import dedup as dd
    from . import sampling as sp
    from . import text as tx

    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    keep = dd.exact_dedup(docs, id_col=id_col, text_col=text_col)
    surv = (
        docs.withColumn("__fp", fp)
        .join(
            keep,
            (F.col("__fp") == F.col("fingerprint"))
            & (F.col(id_col) == F.col("keep_id")),
        )
        .drop("fingerprint", "keep_id", "__fp")
    )
    filtered = tx.quality_filter(surv, text_col=text_col).filter(F.col("keep"))
    out = filtered.select(
        *docs.columns, "dup_count", "quality_score", "lang_guess"
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
      repartition job (the writer splits as it goes).
    """
    if partition_by is None:
        partition_by = ["split"] if "split" in df.columns else []
    missing = [c for c in partition_by if c not in df.columns]
    if missing:
        raise ValueError(f"partition columns not in frame: {missing}")
    writer = (
        df.sortWithinPartitions(*(partition_by + [order_by]))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
    )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
