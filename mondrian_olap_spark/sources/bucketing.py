"""Bucketed star materialisation — co-located fact⋈bridge joins.

At 100 TB the dominant cost of the star plan is shuffling the fact against
its high-cardinality bridge (lineitem⋈orders here: both sides scale with the
data; neither broadcasts).  Writing both sides **bucketed and sorted on the
join key with the same bucket count** makes that join shuffle-free: Spark's
bucketed sort-merge join reads co-located buckets directly (zero Exchange on
either side), and every downstream orders-derived dimension rides the same
bucketing.

This is the engine's analog of the reference's aggregate-table *physical
design* lever (schema.rb:374-414): a one-time write cost traded for every
subsequent query.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class BucketSpec:
    table: str
    key: str
    buckets: int


def materialize_bucketed(
    spark: SparkSession,
    data_dir: str,
    specs: list[BucketSpec],
    database: str = "molap_bucketed",
    plain_tables: list[str] = (),
) -> dict[str, str]:
    """Write ``specs`` tables bucketed+sorted on their join key (and
    ``plain_tables`` unbucketed) as managed tables in ``database``.

    Returns the logical→catalog name mapping for
    :func:`~mondrian_olap_spark.sources.engine_from_catalog`.
    """
    from ..star import read_parquet_table

    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    mapping: dict[str, str] = {}

    def _drop(table: str) -> None:
        # the default in-memory catalog forgets tables across sessions but
        # their warehouse locations persist — clear both (via the Hadoop
        # FileSystem API, so a non-local warehouse dir works too)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        wh = spark.conf.get("spark.sql.warehouse.dir")
        loc = spark._jvm.org.apache.hadoop.fs.Path(
            f"{wh.rstrip('/')}/{database}.db/{table.split('.')[-1]}"
        )
        loc.getFileSystem(spark._jsc.hadoopConfiguration()).delete(loc, True)

    for spec in specs:
        df = read_parquet_table(spark, f"{data_dir}/{spec.table}.parquet")
        full = f"{database}.{spec.table}"
        _drop(full)
        (
            df.write.bucketBy(spec.buckets, spec.key)
            .sortBy(spec.key)
            .format("parquet")
            .saveAsTable(full)
        )
        mapping[spec.table] = full
    for name in plain_tables:
        df = read_parquet_table(spark, f"{data_dir}/{name}.parquet")
        full = f"{database}.{name}"
        _drop(full)
        df.write.format("parquet").saveAsTable(full)
        mapping[name] = full
    return mapping
