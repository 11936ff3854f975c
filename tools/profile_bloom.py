#!/usr/bin/env python
"""Micro-bisect of the bloom build/write path (throwaway tool)."""
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

import pyspark.sql.functions as F  # noqa: E402
from mondrian_olap_spark.operators.dedup import (  # noqa: E402
    bloom_build, bloom_parameters, write_bloom,
)

T = time.perf_counter


def mark(label, t0):
    print(f"{label:50s} {T() - t0:7.2f}s", flush=True)
    return T()


docs = sp._docs(spark, SF_DIR)
m_bits, k = bloom_parameters(4992, 0.01)
print("m_bits", m_bits, "k", k)

t0 = T()
bm = bloom_build(docs, m_bits=m_bits, k=k, text_col="text")
bm.write.format("noop").mode("overwrite").save()
t0 = mark("bloom_build noop (run 1)", t0)
bm2 = bloom_build(docs, m_bits=m_bits, k=k, text_col="text")
bm2.write.format("noop").mode("overwrite").save()
t0 = mark("bloom_build noop (run 2, fresh df)", t0)

root = tempfile.mkdtemp(prefix="profb_")
t0 = T()
bm3 = bloom_build(docs, m_bits=m_bits, k=k, text_col="text")
bm3.coalesce(1).write.mode("overwrite").parquet(root + "/plain")
t0 = mark("bloom coalesce(1) parquet write", t0)

ck = bloom_build(docs, m_bits=m_bits, k=k, text_col="text").localCheckpoint(
    eager=True)
t0 = mark("bloom localCheckpoint", t0)
write_bloom(ck, root + "/artifact", m_bits, k)
t0 = mark("write_bloom (checkpointed bitmap, fresh dir)", t0)
write_bloom(ck, root + "/artifact", m_bits, k)
t0 = mark("write_bloom (overwrite path, swap)", t0)

t0 = T()
spark.createDataFrame([(1, 2)], "a long, b int").coalesce(1).write.mode(
    "overwrite").parquet(root + "/tiny")
t0 = mark("tiny createDataFrame write", t0)
