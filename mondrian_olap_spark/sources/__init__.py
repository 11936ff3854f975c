"""Source/sink layer (SURVEY.md §2.1).

The reference reaches 8 JDBC dialects (``connection.rb:313-457``); here a
single engine reads any Spark source.  :func:`tables_from_parquet` /
:func:`tables_from_catalog` produce the table map a
:class:`~mondrian_olap_spark.star.CubeEngine` consumes;
:mod:`.bucketing` materialises the star bucketed on the join keys so
fact⋈bridge joins run shuffle-free (the co-located-join scale path).
"""

from .registry import engine_from_catalog, tables_from_catalog, tables_from_parquet

__all__ = ["engine_from_catalog", "tables_from_catalog", "tables_from_parquet"]
