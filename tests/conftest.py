import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("mondrian-olap-spark-tests")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "4g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def engine(spark):
    from mondrian_olap_spark.tpch import get_engine

    return get_engine(spark, SF_DIR)


@pytest.fixture(scope="session")
def events_engine(spark):
    from mondrian_olap_spark.tpch import get_engine

    return get_engine(spark, SF_DIR, cube="Events")


@pytest.fixture(scope="session")
def duck():
    """DuckDB oracle with the same parquet tables registered as views
    (mirrors the driver's correctness harness and the reference's
    differential-vs-SQL-oracle strategy, test/query_test.rb:14-39)."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


def assert_df_matches_sql(df, duck, sql, rel_tol=1e-9):
    """Order-insensitive comparison of a Spark DataFrame against a DuckDB
    oracle query — columns sorted by name, rows sorted by value."""
    import math

    spark_cols = sorted(df.columns)
    srows = [tuple(r[c] for c in spark_cols) for r in df.collect()]
    dres = duck.execute(sql)
    dcols = [d[0] for d in dres.description]
    assert sorted(dcols) == spark_cols, f"columns differ: {sorted(dcols)} vs {spark_cols}"
    idx = [dcols.index(c) for c in spark_cols]
    drows = [tuple(row[i] for i in idx) for row in dres.fetchall()]
    assert len(srows) == len(drows), f"row count {len(srows)} vs oracle {len(drows)}"

    def key(t):
        return tuple((x is None, str(x)) for x in t)

    for s, d in zip(sorted(srows, key=key), sorted(drows, key=key)):
        for a, b in zip(s, d):
            if isinstance(a, float) and isinstance(b, (int, float)):
                assert math.isclose(a, float(b), rel_tol=rel_tol, abs_tol=1e-9), (s, d)
            else:
                assert str(a) == str(b), (s, d)
