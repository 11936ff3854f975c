"""Virtual cubes: union of several cubes over conformed dimensions
(SURVEY.md §1.1; reference ``lib/mondrian/olap/schema.rb:343-372``,
``test/fixtures/MondrianTest.xml:146-159`` Sales+Warehouse).

Spark mapping (SURVEY.md §1.4): compute each constituent cube's aggregate at
the same conformed grouping, then combine by **full outer join on the
conformed level columns** — cells where one cube has no data surface as NULL
(empty), reproducing the reference's missing-dim/empty-cell behavior
(``test/query_test.rb:1060-1098``).

ValidMeasure (``jar!mondrian/olap/fun/ValidMeasureFunDef``): a measure from a
cube that lacks one of the requested dimensions is aggregated *without* that
grouping and joined on the remaining conformed columns — its value repeats
across the missing dimension's members.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .query import Query
from .star import CubeEngine


@dataclass(frozen=True)
class CubeUsage:
    engine: CubeEngine
    measures: tuple[str, ...]  # measure names exposed from this cube


class VirtualCube:
    """Query several cubes through one conformed surface.

    Conformance is by *level output column name*: dimensions whose levels
    produce identically-named outputs in both cubes are conformed (the
    engine analog of shared dimensions + DimensionUsage,
    schema.rb:106-130).
    """

    def __init__(self, name: str, usages: list[CubeUsage]):
        if len(usages) < 2:
            raise ValueError("virtual cube needs at least two cube usages")
        self.name = name
        self.usages = usages

    def aggregate(
        self,
        rows: list[str],
        where: list[str] | None = None,
        valid_measure: bool = True,
    ) -> DataFrame:
        """Aggregate all usages at the conformed grouping given by ``rows``
        (member identifiers resolved against each cube) and full-outer-join
        the results on the conformed level columns.

        ``valid_measure``: cubes lacking one of the row dimensions aggregate
        without it (ValidMeasure semantics) instead of erroring.
        """
        parts: list[tuple[DataFrame, list[str]]] = []
        for usage in self.usages:
            cube = usage.engine.cube
            usable_rows: list[str] = []
            for m in rows:
                try:
                    q = Query(usage.engine)
                    q._resolve(m)  # raises KeyError for missing dimension
                    usable_rows.append(m)
                except KeyError:
                    if not valid_measure:
                        raise
            q = Query(usage.engine)
            if usable_rows:
                q.rows(*usable_rows)
            q.columns(*[f"[Measures].[{name}]" for name in usage.measures])
            for w in where or []:
                try:
                    q.where(w)
                except KeyError:
                    if not valid_measure:
                        raise
            res = q.execute()
            group_cols = [c for ax in res.axis_columns for c in ax]
            parts.append((res.df, group_cols))

        df, cols = parts[0]
        for other, other_cols in parts[1:]:
            shared = [c for c in cols if c in other_cols]
            if shared:
                df = df.join(other, on=shared, how="full")
            else:
                # no conformed grouping between these cubes: a single-row
                # cross join (both are grand totals or disjoint dims)
                df = df.crossJoin(other)
            cols = cols + [c for c in other_cols if c not in cols]
        return df
