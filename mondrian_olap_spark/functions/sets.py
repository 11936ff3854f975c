"""MDX set operations over member-set / cell DataFrames (SURVEY.md §2.6).

UNION / INTERSECT / EXCEPT operate on DataFrames of member tuples (the
engine's set representation) — direct mappings onto Spark's set operators,
which Catalyst executes as hash aggregations / joins:

* UNION     (jar!mondrian/olap/fun/UnionFunDef)     — dedup by default
* INTERSECT (jar!...IntersectFunDef)                 — ``df.intersect``
* EXCEPT    (jar!...ExceptFunDef)                    — ``df.subtract`` (set
  difference: a tuple present in BOTH sets is removed entirely, whatever
  its multiplicity; the ALL variant keeps per-occurrence semantics)
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


def set_except(a: DataFrame, b: DataFrame, all: bool = False) -> DataFrame:
    """EXCEPT(set1, set2[, ALL]).  Default is SET difference — a member of
    both inputs never survives (``exceptAll().dropDuplicates()`` would keep
    a tuple whose multiplicity in ``a`` exceeds its count in ``b``)."""
    return a.exceptAll(b) if all else a.subtract(b)


def extract(df: DataFrame, *columns: str) -> DataFrame:
    """EXTRACT(set, hierarchy...) — project tuples onto chosen hierarchies."""
    return df.select(*columns).dropDuplicates()
