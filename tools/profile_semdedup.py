#!/usr/bin/env python
"""Phase profile of embed_semantic_dedup_gate cold. (throwaway)"""
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
bench._tune_splits(spark, "embed_semantic_dedup_gate")
QUERIES["embed_semantic_dedup_gate"](spark, SF_DIR).collect()
bench._flush_caches(spark)

import pyspark.sql.functions as F  # noqa: E402
from mondrian_olap_spark.operators import similarity as sim  # noqa: E402
from mondrian_olap_spark.operators.dedup import dedup_clusters  # noqa: E402

T = time.perf_counter


def mark(label, t0):
    print(f"{label:45s} {T() - t0:7.2f}s", flush=True)
    return T()


emb = sp._emb(spark, SF_DIR)
t0 = T()
n = emb.count()
t0 = mark(f"emb count ({n})", t0)
seeds = sim.ivf_seeds(emb, 8, "vec_id", "embedding")
t0 = mark("ivf_seeds", t0)
pairs = sim.cell_blocked_pairs(
    emb, 0.45, n_cells=8, n_probe=2, centroids=seeds
).select("id_a", "id_b")
pairs.write.format("noop").mode("overwrite").save()
t0 = mark("cell_blocked_pairs noop", t0)
pairs2 = sim.cell_blocked_pairs(
    emb, 0.45, n_cells=8, n_probe=2, centroids=seeds
).select("id_a", "id_b")
np = pairs2.count()
t0 = mark(f"pairs count ({np})", t0)
nonzero = (
    emb.select(F.col("vec_id").alias("id"),
               sim._dvec(F.col("embedding")).alias("v"))
    .filter(sim.norm(F.col("v")) > 0)
    .select("id")
)
res = dedup_clusters(nonzero, pairs2)
c = res.count()
t0 = mark(f"dedup_clusters ({c} rows)", t0)
