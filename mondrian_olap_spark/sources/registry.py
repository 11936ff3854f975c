"""Table-map builders for CubeEngine over different physical sources."""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession

from ..model import Cube, Schema
from ..star import CubeEngine, read_parquet_table


def _table_names(cube: Cube) -> set[str]:
    names = {cube.fact}
    for d in cube.dimensions:
        if d.table:
            names.add(d.table)
            for link in d.joins:
                names.add(link.table)
    return names


def tables_from_parquet(spark: SparkSession, cube: Cube, data_dir: str) -> dict[str, DataFrame]:
    return {
        n: read_parquet_table(spark, f"{data_dir}/{n}.parquet") for n in _table_names(cube)
    }


def tables_from_catalog(
    spark: SparkSession, cube: Cube, mapping: Mapping[str, str] | None = None
) -> dict[str, DataFrame]:
    """Resolve logical table names through the Spark catalog — the path that
    picks up bucketed/managed tables (``spark.table`` sees bucket specs;
    plain file reads do not).  ``mapping`` overrides logical→catalog names."""
    mapping = dict(mapping or {})
    return {n: spark.table(mapping.get(n, n)) for n in _table_names(cube)}


def engine_from_catalog(
    spark: SparkSession,
    schema: Schema,
    cube_name: str,
    mapping: Mapping[str, str] | None = None,
) -> CubeEngine:
    cube = schema.cube(cube_name)
    return CubeEngine(cube, tables_from_catalog(spark, cube, mapping))


def with_sql_views(
    spark: SparkSession,
    tables: Mapping[str, DataFrame],
    views: Mapping[str, str],
) -> dict[str, DataFrame]:
    """View elements (schema.rb View/SQL — schema_definition_test.rb:171-193):
    logical tables defined by SQL text instead of a physical source.  The
    base ``tables`` register as temp views first so view SQL can reference
    them; each view then becomes a regular entry in the table map (Catalyst
    inlines it — predicate pushdown and pruning reach the underlying scans)."""
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    out = dict(tables)
    for alias, sql in views.items():
        out[alias] = spark.sql(sql)
    return out
