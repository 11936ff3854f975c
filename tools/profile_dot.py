#!/usr/bin/env python
"""Unrolled vs HOF-fold dot product: bitwise equality + speed. (throwaway)"""
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
d = len(emb.select("embedding").first()["embedding"])
print("dim:", d)

base = emb.select(
    F.col("vec_id").alias("id"), sim._dvec(F.col("embedding")).alias("v")
)
a = base.select(F.col("id").alias("ia"), F.col("v").alias("va"))
b = base.select(F.col("id").alias("ib"), F.col("v").alias("vb"))
pairs = a.join(b, F.col("ia") < F.col("ib"))  # full n^2/2 for load


def unrolled_dot(x, y, dim):
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + F.get(x, i) * F.get(y, i)
    return acc


t0 = T()
fold = pairs.select(sim.dot(F.col("va"), F.col("vb")).alias("dp"))
fold.write.format("noop").mode("overwrite").save()
print(f"fold noop   {T()-t0:6.2f}s", flush=True)
t0 = T()
fold.write.format("noop").mode("overwrite").save()
print(f"fold noop 2 {T()-t0:6.2f}s", flush=True)

t0 = T()
un = pairs.select(unrolled_dot(F.col("va"), F.col("vb"), d).alias("dp"))
un.write.format("noop").mode("overwrite").save()
print(f"unrl noop   {T()-t0:6.2f}s", flush=True)
t0 = T()
un.write.format("noop").mode("overwrite").save()
print(f"unrl noop 2 {T()-t0:6.2f}s", flush=True)

# bitwise equality across ALL pairs
both = pairs.select(
    sim.dot(F.col("va"), F.col("vb")).alias("f"),
    unrolled_dot(F.col("va"), F.col("vb"), d).alias("u"),
)
bad = both.filter(
    ~(F.col("f").eqNullSafe(F.col("u")))
    | (F.expr("cast(f as string)") != F.expr("cast(u as string)"))
).count()
n = both.count()
print("pairs:", n, "bitwise mismatches:", bad)
