#!/usr/bin/env python
"""Why is coalesce(1) on a tiny createDataFrame write ~5s? (throwaway)"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
from mondrian_olap_spark.suite import QUERIES  # noqa: E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()

T = time.perf_counter


def mark(label, t0):
    print(f"{label:60s} {T() - t0:7.2f}s", flush=True)
    return T()


root = tempfile.mkdtemp(prefix="profw3_")
mk = lambda v: spark.createDataFrame([(v, v)], "a long, b int")

t0 = T()
mk(1).coalesce(1).write.mode("overwrite").parquet(root + "/a")
t0 = mark("coalesce(1) write, default conf", t0)
mk(2).repartition(1).write.mode("overwrite").parquet(root + "/b")
t0 = mark("repartition(1) write, default conf", t0)
mk(3).write.mode("overwrite").parquet(root + "/c")
t0 = mark("plain write, default conf", t0)
spark.createDataFrame([(4, 4)] , "a long, b int").rdd.coalesce(1).count()
t0 = mark("rdd coalesce(1) count", t0)
df = mk(5).coalesce(1)
df.count()
t0 = mark("coalesce(1) count (no write)", t0)
df.explain("formatted")
t0 = mark("explain", t0)

bench._tune_splits(spark, "pipeline_stateful_neardup_gate")
mk(6).coalesce(1).write.mode("overwrite").parquet(root + "/d")
t0 = mark("coalesce(1) write, pipeline conf", t0)

# 1-slice parallelize instead of default 32
one = spark.createDataFrame(
    spark.sparkContext.parallelize([(7, 7)], 1), "a long, b int")
one.write.mode("overwrite").parquet(root + "/e")
t0 = mark("1-slice parallelize write", t0)
