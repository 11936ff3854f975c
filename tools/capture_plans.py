#!/usr/bin/env python
"""Capture plans/r12/<name>_after.txt for the named entries (throwaway)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

import bench  # noqa: E402

spark = bench._build_spark()
import mondrian_olap_spark.suite_pipeline  # noqa: F401,E402
from mondrian_olap_spark.suite import QUERIES  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r12")
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
    "formatted")

for name in sys.argv[1:]:
    bench._tune_splits(spark, name)
    df = QUERIES[name](spark, SF_DIR)
    txt = df._jdf.queryExecution().explainString(mode)
    with open(os.path.join(OUT, f"{name}_after.txt"), "w") as f:
        f.write(txt)
    print(name, "ok", flush=True)
