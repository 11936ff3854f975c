#!/usr/bin/env python
"""When does the 6s coalesce(1) stall appear in the bench session? (throwaway)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
sc = spark.sparkContext
T = time.perf_counter


def probe(label):
    t0 = T()
    sc.parallelize([1], 32).coalesce(1).count()
    print(f"{label:50s} {T()-t0:6.2f}s", flush=True)


probe("right after _build_spark")
sc.parallelize(range(1000), 32).count()
probe("after a plain 32-task rdd job")

from mondrian_olap_spark.suite import QUERIES  # noqa: E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()
probe("after flagship collect")
probe("again")
