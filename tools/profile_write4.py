#!/usr/bin/env python
"""Locality-wait hypothesis for the 6s coalesce(1) stall. (throwaway)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import SparkSession  # noqa: E402

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

T = time.perf_counter


def run(label, extra):
    b = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profw4")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    sc = spark.sparkContext
    sc.parallelize(range(1000), 32).count()  # warm
    t0 = T()
    sc.parallelize([1], 32).coalesce(1).count()
    print(f"{label:45s} coalesce(1).count {T()-t0:6.2f}s", flush=True)
    rdd = sc.parallelize([1], 32).coalesce(1)
    locs = rdd._jrdd.rdd().partitions()
    print("  npart:", len(locs))
    t0 = T()
    sc.parallelize([1], 32).coalesce(1).count()
    print(f"{label:45s} again             {T()-t0:6.2f}s", flush=True)
    spark.stop()


run("default locality.wait", {})
run("locality.wait=0", {"spark.locality.wait": "0"})
