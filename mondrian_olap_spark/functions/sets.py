"""MDX set operations over member-set / cell DataFrames (SURVEY.md §2.6).

UNION / INTERSECT / EXCEPT operate on DataFrames of member tuples (the
engine's set representation) — direct mappings onto Spark's set operators,
which Catalyst executes as hash aggregations / joins:

* UNION     (jar!mondrian/olap/fun/UnionFunDef)     — dedup by default
* INTERSECT (jar!...IntersectFunDef)                 — ``df.intersect``
* EXCEPT    (jar!...ExceptFunDef)                    — ``df.exceptAll`` set form
* EXTRACT   (jar!...ExtractFunDef)                   — project + distinct
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def set_union(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """UNION(set1, set2 [, ALL]) — duplicates removed unless ALL."""
    u = a.unionByName(b)
    return u if all else u.dropDuplicates()


def set_intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def set_except(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b).dropDuplicates()


def extract(df: DataFrame, *columns: str) -> DataFrame:
    """EXTRACT(set, hierarchy...) — project tuples onto chosen hierarchies."""
    return df.select(*columns).dropDuplicates()
