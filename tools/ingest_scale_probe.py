"""Stateful-ingest flat-cost probe (SCALE.md round-7 addendum).

The 100 TB claim for init_ingest_state/ingest_batch is "per-batch cost is
independent of accumulated corpus size".  This probe pins it: initialize
the persisted state over a 50 k-doc corpus and over a 10x-replicated
500 k-doc corpus, then ingest the SAME 50 k-doc batch against each, for
both the exact and near-dup arms.  Flat = the big-corpus ingest_batch
wall time within noise of the small-corpus row; any growth must trace to
the collision-bound band join (near-dup arm) or the Bloom probe's
inline-vs-broadcast strategy switch (the 500 k-corpus bitmap is ~4.8 M
bits > the 4 M-bit inline default, so the probe flips to the
broadcast-join path by design).

Usage: python tools/ingest_scale_probe.py [--near-dup-only|--exact-only]
Writes one markdown table to stdout; ~5 min on local[16].
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF1_DOCS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scale_sf1", "documents.parquet",
)


def build_corpora(spark, work: str):
    """50 k corpus = the sf1 documents; 500 k corpus = 10 copies with a
    per-copy suffix token (distinct fingerprints AND distinct shingle
    tails, so the big corpus is 10x the membership, not 10x duplicates).
    Both written to parquet so init reads them the way production would."""
    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text")
    small = f"{work}/corpus_small"
    docs.write.mode("overwrite").parquet(small)
    big = f"{work}/corpus_big"
    copies = spark.range(10).select(F.col("id").alias("copy"))
    (
        docs.crossJoin(copies)
        .select(
            (F.col("doc_id") * 10 + F.col("copy")).alias("doc_id"),
            # copy 0 keeps the ORIGINAL text, so the big corpus is a
            # strict superset of the small one and the fixed batch's
            # planted duplicates reject identically at both sizes
            F.when(F.col("copy") == 0, F.col("text"))
            .otherwise(
                F.concat(
                    F.col("text"), F.lit(" copytoken"),
                    F.col("copy").cast("string"),
                )
            ).alias("text"),
        )
        .write.mode("overwrite").parquet(big)
    )
    return small, big


def build_batch(spark, work: str) -> str:
    """ONE fixed 50 k-doc batch reused against both corpora: 20% exact
    copies of corpus docs (reject in both), 20% near-dup mutations (tail
    token swapped — rejects only in the near-dup arm), 60% fresh."""
    docs = spark.read.parquet(SF1_DOCS).select("doc_id", "text")
    batch = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 5 == 0, F.col("text"))  # exact dup
        .when(
            F.col("doc_id") % 5 == 1,  # near-dup: swap the tail token
            F.concat(F.col("text"), F.lit(" mutatedtail")),
        )
        .otherwise(  # fresh: distinct body
            F.concat(F.lit("fresh "), F.reverse(F.col("text")))
        ).alias("text"),
    )
    path = f"{work}/batch"
    batch.write.mode("overwrite").parquet(path)
    return path


def probe_arm(spark, corpus_path: str, batch_path: str, work: str,
              near_dup: bool) -> dict:
    from mondrian_olap_spark.operators.pipeline import (
        ingest_batch, init_ingest_state,
    )

    corpus = spark.read.parquet(corpus_path)
    batch = spark.read.parquet(batch_path)
    state = tempfile.mkdtemp(prefix="ingest_state_", dir=work)
    t0 = time.time()
    info = init_ingest_state(corpus, state, near_dup=near_dup)
    t_init = time.time() - t0
    t0 = time.time()
    accepted = ingest_batch(
        batch, state,
        near_dup_threshold=0.7 if near_dup else None,
    )
    n_acc = accepted.count()
    t_batch = time.time() - t0
    shutil.rmtree(state, ignore_errors=True)
    return {
        "n_corpus": info["n_items"], "m_bits": info["m_bits"],
        "t_init": t_init, "t_batch": t_batch, "accepted": n_acc,
    }


def main() -> None:
    arms = [a for a in ("exact", "neardup")
            if f"--{'exact' if a == 'neardup' else 'near-dup'}-only"
            not in sys.argv]
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "16")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ingest-scale-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ingest_probe_")
    try:
        small, big = build_corpora(spark, work)
        batch = build_batch(spark, work)
        print("| Arm | Corpus | init | ingest_batch (same 50 k batch) "
              "| accepted | bloom bits |")
        print("|---|---|---|---|---|---|")
        for arm in arms:
            nd = arm == "neardup"
            for label, path in (("50 k", small), ("500 k", big)):
                r = probe_arm(spark, path, batch, work, nd)
                print(
                    f"| {arm} | {label} ({r['n_corpus']:,}) "
                    f"| {r['t_init']:.1f} s | {r['t_batch']:.1f} s "
                    f"| {r['accepted']:,} | {r['m_bits']:,} |",
                    flush=True,
                )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
