"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query at sf0.001 (smoke).
``queries()`` — one entry per implemented operator from SURVEY.md §2,
implemented in :mod:`mondrian_olap_spark.suite` through the engine API.
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from mondrian_olap_spark.suite import QUERIES

    return QUERIES["flagship_region_quarter"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    import mondrian_olap_spark.suite_pipeline  # noqa: F401 — registers entries
    from mondrian_olap_spark.suite import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    import mondrian_olap_spark.suite_pipeline  # noqa: F401 — registers entries
    from mondrian_olap_spark.suite import ORACLE

    return dict(ORACLE)
