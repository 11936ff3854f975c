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

from .query import Query, QueryError
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
        # measure OUTPUT columns must be disjoint across usages: the outer
        # join keys only on conformed level columns, so a shared measure
        # output would surface as a duplicate column and fail far from
        # here with an ambiguous-reference error
        seen: dict[str, str] = {}
        for u in usages:
            for m in u.measures:
                out = u.engine.cube.measure(m).out
                if out in seen:
                    raise ValueError(
                        f"virtual cube {name!r}: measure output column "
                        f"{out!r} is exposed by both {seen[out]!r} and "
                        f"{u.engine.cube.name!r} — rename one measure's "
                        "output"
                    )
                seen[out] = u.engine.cube.name
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
        # phase 1 — RESOLVE everything against every usage before any
        # execution: a typo must raise before full aggregate plans run
        parts: list[tuple[DataFrame, list[str]]] = []
        resolved_rows: set[str] = set()
        resolved_where: set[str] = set()
        plans: list[tuple[object, list[str], list[str]]] = []
        for usage in self.usages:
            probe = Query(usage.engine)
            usable_rows: list[str] = []
            for m in rows:
                try:
                    # raises QueryError ("MDX object … not found") when the
                    # dimension is missing from this usage's cube
                    probe._resolve(m)
                    usable_rows.append(m)
                    resolved_rows.add(m)
                except (KeyError, QueryError):
                    if not valid_measure:
                        raise
            usable_where: list[str] = []
            for w in where or []:
                try:
                    ref = probe._resolve(w)
                except QueryError:
                    if not valid_measure:
                        raise
                    continue
                except KeyError:
                    if not valid_measure:
                        raise
                    continue
                from .members import MeasureRef

                if isinstance(ref, MeasureRef):
                    # a measure in the slicer is a USER error, never a
                    # missing-dimension gap — raised OUTSIDE the resolve
                    # try so ValidMeasure tolerance (or a member name that
                    # happens to contain the text 'slicer') can never
                    # swallow or misclassify it
                    raise QueryError(
                        f"measures cannot appear in the slicer: {w!r}"
                    )
                usable_where.append(w)
                resolved_where.add(w)
            plans.append((usage, usable_rows, usable_where))
        # ValidMeasure tolerates a dimension missing from SOME cubes — a
        # member (row OR slicer) resolving in NO usage is a typo
        unresolved = [m for m in rows if m not in resolved_rows] + [
            w for w in (where or []) if w not in resolved_where
        ]
        if unresolved:
            raise QueryError(
                f"MDX object {unresolved[0]!r} not found in any cube of "
                f"virtual cube (usages: "
                f"{[u.engine.cube.name for u in self.usages]})"
            )

        # phase 2 — execute per usage
        for usage, usable_rows, usable_where in plans:
            q = Query(usage.engine)
            if usable_rows:
                q.rows(*usable_rows)
            q.columns(*[f"[Measures].[{name}]" for name in usage.measures])
            for w in usable_where:
                q.where(w)
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

    def drill_through(
        self,
        where: list[str],
        fields: list[tuple[str, str]],
        max_rows: int | None = None,
        group_by: bool = False,
    ) -> DataFrame:
        """Virtual-cube drill-through (query_test.rb:1072-1106): the drill
        routes to the base cube that owns the requested measure field(s);
        RETURN fields that only exist in *other* base cubes come back as
        empty-string columns (the reference's exact behavior)."""
        target = None
        for usage in self.usages:
            outs = {usage.engine.cube.measure(n).out for n in usage.measures}
            if any(out in outs for out, _ in fields):
                target = usage.engine
                break
        if target is None:
            target = self.usages[0].engine
        resolved: list[tuple[str, str]] = []
        missing: list[str] = []
        for out, spec in fields:
            if self._resolvable(target, spec):
                resolved.append((out, spec))
            else:
                missing.append(out)
        usable_where = [w for w in where if self._resolvable(target, w)]
        df = target.drill_through(
            usable_where, resolved, max_rows=max_rows, group_by=group_by
        )
        for out in missing:
            df = df.withColumn(out, F.lit(""))
        return df.select(*[out for out, _ in fields])

    @staticmethod
    def _resolvable(engine: CubeEngine, spec: str) -> bool:
        """Does a RETURN spec / slicer member resolve in this base cube?"""
        if not spec.startswith("["):
            return True  # raw fact expression — validated at plan time
        from .members import MemberParseError, resolve, resolve_level

        try:
            resolve_level(engine.cube, spec)
            return True
        except (MemberParseError, KeyError):
            pass
        try:
            resolve(engine.cube, spec)
            return True
        except (MemberParseError, KeyError):
            return False
