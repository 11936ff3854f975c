#!/usr/bin/env python
"""Why does a 1-row parquet write take 8s? (throwaway tool)"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
from mondrian_olap_spark.suite import QUERIES  # noqa: E402
import mondrian_olap_spark.suite_pipeline  # noqa: F401,E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()

import pyspark.sql.functions as F  # noqa: E402

T = time.perf_counter


def mark(label, t0):
    print(f"{label:55s} {T() - t0:7.2f}s", flush=True)
    return T()


root = tempfile.mkdtemp(prefix="profw_")
df = spark.createDataFrame([(1, 2)], "a long, b int")
df.collect()

t0 = T()
df.write.mode("overwrite").parquet(root + "/w1")
t0 = mark("1-row parquet write (default splits conf)", t0)
df.write.mode("overwrite").parquet(root + "/w2")
t0 = mark("1-row parquet write again", t0)
df.write.format("noop").mode("overwrite").save()
t0 = mark("1-row noop write", t0)
df.write.mode("overwrite").csv(root + "/w3")
t0 = mark("1-row csv write", t0)
df.write.mode("overwrite").json(root + "/w4")
t0 = mark("1-row json write", t0)

# with the pipeline split tuning applied (4MB / 1MB) — does the conf
# change affect the committer?
bench._tune_splits(spark, "pipeline_stateful_neardup_gate")
df.write.mode("overwrite").parquet(root + "/w5")
t0 = mark("1-row parquet write (pipeline splits conf)", t0)
bench._tune_splits(spark, "flagship_region_quarter")
df.write.mode("overwrite").parquet(root + "/w6")
t0 = mark("1-row parquet write (default splits conf back)", t0)

# rdd-level action for comparison
t0 = T()
df.rdd.count()
t0 = mark("df.rdd.count()", t0)
