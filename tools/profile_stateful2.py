#!/usr/bin/env python
"""Finer-grained cold profile of init_ingest_state + one ingest_batch."""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()

import mondrian_olap_spark.suite_pipeline as sp  # noqa: E402
from mondrian_olap_spark.suite import QUERIES  # noqa: E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()
bench._tune_splits(spark, "pipeline_stateful_neardup_gate")
QUERIES["pipeline_stateful_neardup_gate"](spark, SF_DIR).collect()
bench._flush_caches(spark)

import pyspark.sql.functions as F  # noqa: E402
from mondrian_olap_spark.operators.dedup import (  # noqa: E402
    _band_buckets, bloom_append, bloom_build, bloom_parameters, bloom_probe,
    minhash_signatures, read_bloom, read_minhash_index, write_bloom,
    write_minhash_index,
)
from mondrian_olap_spark.operators.pipeline import curate_corpus  # noqa: E402

T = time.perf_counter


def mark(label, t0):
    print(f"{label:45s} {T() - t0:7.2f}s", flush=True)
    return T()


docs = sp._docs(spark, SF_DIR)
root = tempfile.mkdtemp(prefix="prof2_") + "/state"

t0 = T()
fp = F.md5(F.lower(F.trim(F.col("text"))))
fps = docs.select(fp.alias("fingerprint")).where(
    F.col("fingerprint").isNotNull()).distinct()
n_items = fps.count()
t0 = mark(f"init: fps.count ({n_items})", t0)
m_bits, k = bloom_parameters(max(n_items, 1), 0.01)
fps.write.mode("overwrite").parquet(f"{root}/fingerprints")
t0 = mark("init: fingerprints write", t0)
bm = bloom_build(docs, m_bits=m_bits, k=k, text_col="text")
write_bloom(bm, f"{root}/bloom", m_bits, k)
t0 = mark("init: bloom build+write", t0)
write_minhash_index(docs, f"{root}/minhash", id_col="doc_id",
                    text_col="text", n=3, num_hashes=16, bands=8)
t0 = mark("init: write_minhash_index", t0)
minhash_signatures(docs, id_col="doc_id", text_col="text", n=3,
                   num_hashes=16).write.mode("overwrite").parquet(
    f"{root}/signatures")
t0 = mark("init: signatures write", t0)

# ---- batch 1, inlined ingest_batch steps
b1 = docs.select(
    (F.col("doc_id") + 1000000).alias("doc_id"),
    F.when(F.col("doc_id") % 5 == 0,
           F.concat(F.col("text"), F.lit(" tail marker tokens")))
    .otherwise(F.expr("replace(text, ' ', 'q ')")).alias("text"),
)
bitmap, m_bits, k = read_bloom(spark, f"{root}/bloom")
t0 = mark("b1: read_bloom", t0)
batch = curate_corpus(b1, split_weights=None, id_col="doc_id",
                      text_col="text", fingerprint_col=None)
probed = bloom_probe(batch, bitmap, m_bits=m_bits, k=k, id_col="doc_id",
                     text_col="text", fingerprint_col=None)
flagged = batch.join(
    probed.select("doc_id", "fingerprint", "bloom_hit"), "doc_id")
store = spark.read.parquet(f"{root}/fingerprints")
hits = flagged.filter(F.col("bloom_hit"))
verified_dups = hits.join(store, "fingerprint", "semi").select("doc_id")
accepted = flagged.join(verified_dups, "doc_id", "anti")
t0 = mark("b1: plan build (lazy)", t0)
index, params = read_minhash_index(spark, f"{root}/minhash")
t0 = mark("b1: read_minhash_index", t0)
nh = params["num_hashes"]
sigs = minhash_signatures(accepted, id_col="doc_id", text_col="text",
                          n=params["n"], num_hashes=nh).localCheckpoint(
    eager=True)
t0 = mark("b1: sigs localCheckpoint", t0)
keys = _band_buckets(sigs, nh, params["bands"])
matches = sum(
    F.when(F.col(f"a.m{i}") == F.col(f"b.m{i}"), 1).otherwise(0)
    for i in range(nh))
cand = (
    keys.select(F.col("id").alias("__new_id"), "band", "key")
    .join(index.select(F.col("id").alias("__old_id"), "band", "key"),
          ["band", "key"])
    .select("__new_id", "__old_id").dropDuplicates(["__new_id", "__old_id"]))
old_sigs = spark.read.parquet(f"{root}/signatures")
est = (
    cand.join(sigs.alias("a"), cand["__new_id"] == F.col("a.id"))
    .join(old_sigs.alias("b"), cand["__old_id"] == F.col("b.id"))
    .select("__new_id",
            (matches.cast("double") / F.lit(float(nh))).alias("__est")))
near = (est.filter(F.col("__est") >= 0.8)
        .select(F.col("__new_id").alias("doc_id")).distinct())
accepted = accepted.join(near, "doc_id", "anti")
accepted = accepted.localCheckpoint(eager=True)
t0 = mark("b1: accepted localCheckpoint", t0)
bloom_append(accepted.select("fingerprint"), f"{root}/bloom",
             fingerprint_col="fingerprint")
t0 = mark("b1: bloom_append", t0)
accepted.select("fingerprint").distinct().write.mode("append").parquet(
    f"{root}/fingerprints")
t0 = mark("b1: fingerprints append", t0)
acc_sigs = sigs.join(accepted.select(F.col("doc_id").alias("id")), "id",
                     "semi")
_band_buckets(acc_sigs, nh, params["bands"]).write.mode("append").partitionBy(
    "band").parquet(f"{root}/minhash")
t0 = mark("b1: index append", t0)
acc_sigs.write.mode("append").parquet(f"{root}/signatures")
t0 = mark("b1: signatures append", t0)
print("accepted:", accepted.count())
