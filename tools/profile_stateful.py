#!/usr/bin/env python
"""Per-step cold profile of the stateful ingest gates (throwaway tool).

Mirrors bench.py's cold methodology: bench session confs, flagship JVM
warm-up, pipeline split tuning, caches flushed, then one instrumented
cold execution with wall time per sub-step.
"""
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
# entry-warm like the isolate path so C2 is realistic, then flush
QUERIES["pipeline_stateful_neardup_gate"](spark, SF_DIR).collect()
bench._flush_caches(spark)

import pyspark.sql.functions as F  # noqa: E402
from mondrian_olap_spark.operators.pipeline import (  # noqa: E402
    ingest_batch, init_ingest_state,
)

T = time.perf_counter
marks = []


def mark(label, t0):
    dt = T() - t0
    marks.append((label, dt))
    print(f"{label:45s} {dt:7.2f}s", flush=True)
    return T()


t0 = T()
docs = sp._docs(spark, SF_DIR)
state = tempfile.mkdtemp(prefix="prof_neardup_") + "/state"
t0 = mark("setup", t0)
init_ingest_state(docs, state, near_dup=True)
t0 = mark("init_ingest_state", t0)
b1 = docs.select(
    (F.col("doc_id") + 1000000).alias("doc_id"),
    F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.col("text"), F.lit(" tail marker tokens")),
    )
    .otherwise(F.expr("replace(text, ' ', 'q ')"))
    .alias("text"),
)
b2 = docs.select(
    (F.col("doc_id") + 2000000).alias("doc_id"),
    F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.expr("replace(text, ' ', 'q ')"),
            F.lit(" tail marker tokens"),
        ),
    )
    .otherwise(F.expr("replace(text, ' ', 'z ')"))
    .alias("text"),
)
a1 = ingest_batch(b1, state, near_dup_threshold=0.8).withColumn(
    "batch", F.lit(1)
)
t0 = mark("ingest_batch 1", t0)
a2 = ingest_batch(b2, state, near_dup_threshold=0.8).withColumn(
    "batch", F.lit(2)
)
t0 = mark("ingest_batch 2", t0)
res = (
    a1.select("batch", "doc_id")
    .unionByName(a2.select("batch", "doc_id"))
    .groupBy("batch")
    .agg(
        F.count("*").alias("n_docs"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias("kept_md5"),
    )
).collect()
t0 = mark("final collect", t0)
print("TOTAL", round(sum(d for _, d in marks), 2))
print(res)
