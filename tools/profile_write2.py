#!/usr/bin/env python
"""Bisect: what makes a tiny createDataFrame write slow after the bloom
sequence? (throwaway tool)"""
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

T = time.perf_counter


def mark(label, t0):
    print(f"{label:55s} {T() - t0:7.2f}s", flush=True)
    return T()


root = tempfile.mkdtemp(prefix="profw2_")

# tiny write BEFORE any dedup work
t0 = T()
df = spark.createDataFrame([(1, 2)], "a long, b int")
t0 = mark("createDataFrame (before)", t0)
df.write.mode("overwrite").parquet(root + "/w0")
t0 = mark("tiny write (before bloom work)", t0)

from mondrian_olap_spark.operators.dedup import (  # noqa: E402
    bloom_build, bloom_parameters,
)

docs = sp._docs(spark, SF_DIR)
m_bits, k = bloom_parameters(4992, 0.01)
bm = bloom_build(docs, m_bits=m_bits, k=k, text_col="text")
bm.write.format("noop").mode("overwrite").save()
t0 = mark("bloom_build noop", t0)

t0 = T()
df2 = spark.createDataFrame([(3, 4)], "a long, b int")
t0 = mark("createDataFrame (after bloom noop)", t0)
df2.write.mode("overwrite").parquet(root + "/w1")
t0 = mark("tiny write (after bloom noop)", t0)

ck = bloom_build(docs, m_bits=m_bits, k=k, text_col="text").localCheckpoint(
    eager=True)
t0 = mark("bloom localCheckpoint", t0)

t0 = T()
df3 = spark.createDataFrame([(5, 6)], "a long, b int")
t0 = mark("createDataFrame (after localCheckpoint)", t0)
df3.write.mode("overwrite").parquet(root + "/w2")
t0 = mark("tiny write (after localCheckpoint)", t0)

ck.coalesce(1).write.mode("overwrite").parquet(root + "/bm")
t0 = mark("checkpointed bitmap coalesce(1) write", t0)

t0 = T()
df4 = spark.createDataFrame([(7, 8)], "a long, b int")
t0 = mark("createDataFrame (after bitmap write)", t0)
df4.write.mode("overwrite").parquet(root + "/w3")
t0 = mark("tiny write (after bitmap write)", t0)
df4.coalesce(1).write.mode("overwrite").parquet(root + "/w4")
t0 = mark("tiny coalesce(1) write (same df)", t0)
spark.createDataFrame([(9, 9)], "a long, b int").coalesce(1).write.mode(
    "overwrite").parquet(root + "/w5")
t0 = mark("tiny coalesce(1) write (fresh df)", t0)
