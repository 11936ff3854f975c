#!/usr/bin/env python
"""DataFrame-level coalesce(1) stall reproduction. (throwaway)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
T = time.perf_counter


def probe(label, df):
    t0 = T()
    df.count()
    print(f"{label:55s} {T()-t0:6.2f}s", flush=True)


mk = lambda v: spark.createDataFrame([(v, v)], "a long, b int")
probe("df plain count (fresh session)", mk(1))
probe("df coalesce(1) count (fresh session)", mk(2).coalesce(1))

from mondrian_olap_spark.suite import QUERIES  # noqa: E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()
probe("df plain count (after flagship)", mk(3))
probe("df coalesce(1) count (after flagship)", mk(4).coalesce(1))
probe("df coalesce(1) count again", mk(5).coalesce(1))
mk(6).coalesce(1).explain("formatted")
probe("rdd-level parallelize coalesce count",
      spark.createDataFrame(
          spark.sparkContext.parallelize([(9, 9)], 32), "a long, b int"))
