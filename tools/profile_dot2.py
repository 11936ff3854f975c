#!/usr/bin/env python
"""Dot variants: codegen status + speed. (throwaway)"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
import mondrian_olap_spark.suite_pipeline as sp  # noqa: E402
from mondrian_olap_spark.suite import QUERIES  # noqa: E402

QUERIES["flagship_region_quarter"](spark, SF_DIR).collect()

import pyspark.sql.functions as F  # noqa: E402
from mondrian_olap_spark.operators import similarity as sim  # noqa: E402

T = time.perf_counter
emb = sp._emb(spark, SF_DIR)
d = 64

base = emb.select(
    F.col("vec_id").alias("id"), sim._dvec(F.col("embedding")).alias("v")
)
a = base.select(F.col("id").alias("ia"), F.col("va").alias("va")
                if False else F.col("v").alias("va"))
b = base.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
pairs = a.join(b, F.col("ia") < F.col("ib"))


def time_variant(label, col):
    df = pairs.select(col.alias("dp"))
    t0 = T()
    df.write.format("noop").mode("overwrite").save()
    t1 = T() - t0
    t0 = T()
    df.write.format("noop").mode("overwrite").save()
    print(f"{label:30s} {t1:6.2f}s / {T()-t0:6.2f}s", flush=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    has_cg = "WholeStageCodegen" in plan.split("\n")[0] or "*(" in plan
    print(f"  codegen marker: {has_cg}")


def un_get(x, y):
    acc = F.lit(0.0)
    for i in range(d):
        acc = acc + F.get(x, i) * F.get(y, i)
    return acc


def un_idx(x, y):
    acc = F.lit(0.0)
    for i in range(d):
        acc = acc + x[i] * y[i]
    return acc


def un_elem(x, y):
    acc = F.lit(0.0)
    for i in range(1, d + 1):
        acc = acc + F.element_at(x, i) * F.element_at(y, i)
    return acc


time_variant("fold (HOF aggregate)", sim.dot(F.col("va"), F.col("vb")))
time_variant("unrolled F.get", un_get(F.col("va"), F.col("vb")))
time_variant("unrolled x[i]", un_idx(F.col("va"), F.col("vb")))
time_variant("unrolled element_at", un_elem(F.col("va"), F.col("vb")))
