"""Semantic plan → DataFrame plan.

The Spark replacement for the reference's whole execution pipeline
(SURVEY.md §3): where Mondrian compiles MDX to a calc DAG, batches cell
requests and emits segment-load SQL (``jar!mondrian/rolap/agg/SegmentLoader``,
``FastBatchingCellReader``), this planner emits **one declarative DataFrame
plan** — star joins + filters + ``groupBy().agg()`` — and Catalyst performs
predicate pushdown, column pruning, join strategy selection and partial/final
aggregation (SURVEY.md §4: those engine features are "built-in" here).

Join/shuffle strategy (100 TB design notes):

* slicer-only dimensions join ``left_semi`` — they restrict the fact but ship
  no columns, so the join can be a broadcast semi-join;
* predicates are applied to the dimension side *before* the join (filter →
  broadcast → hash join ⇒ fact rows drop at the scan);
* grouping columns are the only dimension columns selected (explicit column
  pruning before the shuffle);
* aggregation shuffles once on the grouping keys with map-side partial
  aggregation — there is no per-cell loop anywhere, so axis cardinality never
  touches the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .members import MemberSetRef
from .model import CalculatedMember, Dimension, Measure
from .star import CubeEngine


def measure_column(m: Measure) -> Column:
    """Aggregator → Spark aggregate expression (schema.rb:294 list)."""
    e = F.expr(m.expression)
    if m.aggregator == "sum":
        return F.sum(e).alias(m.out)
    if m.aggregator == "min":
        return F.min(e).alias(m.out)
    if m.aggregator == "max":
        return F.max(e).alias(m.out)
    if m.aggregator == "avg":
        return F.avg(e).alias(m.out)
    if m.aggregator == "count":
        return F.count(e).alias(m.out)
    if m.aggregator == "distinct-count":
        # exact by default, matching Mondrian distinct-count semantics
        # (approx_count_distinct would be an opt-in — SURVEY.md §2.4)
        return F.count_distinct(e).alias(m.out)
    raise ValueError(f"unknown aggregator {m.aggregator!r}")


@dataclass
class _DimUse:
    """Accumulated per-dimension requirements across axis + slicer sets."""

    dim: Dimension
    group_outputs: list[str] = field(default_factory=list)  # ordered level outputs
    predicates: list[Column] = field(default_factory=list)  # OR-ed together

    def add_levels(self, outputs: list[str]) -> None:
        for o in outputs:
            if o not in self.group_outputs:
                self.group_outputs.append(o)

    @property
    def predicate(self) -> Column | None:
        if not self.predicates:
            return None
        p = self.predicates[0]
        for q in self.predicates[1:]:
            p = p | q
        return p


def _path_predicate(ref: MemberSetRef) -> Column | None:
    """Ancestor-path constraint of a member set → conjunctive predicate."""
    if not ref.path:
        return None
    p = None
    for i, key in enumerate(ref.path):
        c = F.col(ref.dimension.levels[i].out) == key
        p = c if p is None else (p & c)
    return p


class Planner:
    def __init__(self, engine: CubeEngine):
        self.engine = engine
        self.cube = engine.cube

    def aggregate(
        self,
        axes: list[list[MemberSetRef]],
        slicer: list[MemberSetRef],
        measures: list[Measure | CalculatedMember],
    ) -> tuple[DataFrame, list[str]]:
        """Build the aggregate DataFrame for a query.

        Returns ``(df, group_cols)`` where ``df`` has one row per non-empty
        cell combination (the SQL-GROUP-BY view of the cell grid; empty cells
        are a result-layer concern — SURVEY.md §1.2 NULL-vs-empty).
        """
        uses: dict[str, _DimUse] = {}

        def use(dim: Dimension) -> _DimUse:
            return uses.setdefault(dim.name, _DimUse(dim))

        group_cols: list[str] = []
        for axis in axes:
            # same-dimension sets on one axis = set union (IN semantics,
            # README.md:134-143); distinct dimensions = cross join of sets
            by_dim: dict[str, list[MemberSetRef]] = {}
            for ref in axis:
                by_dim.setdefault(ref.dimension.name, []).append(ref)
            for dim_name, refs in by_dim.items():
                u = use(refs[0].dimension)
                outs = []
                for ref in refs:
                    outs = max(outs, [lv.out for lv in ref.group_levels], key=len)
                u.add_levels(outs)
                for o in outs:
                    if o not in group_cols:
                        group_cols.append(o)
                preds = [_path_predicate(r) for r in refs]
                if all(p is not None for p in preds):
                    u.predicates.append(_or_all(preds))
                # any unconstrained set (e.g. Level.Members) makes the union
                # unconstrained → no predicate

        # slicer: same-dim members OR (IN), across dims AND
        # (lib/mondrian/olap/query.rb:160-172,377-394)
        slicer_by_dim: dict[str, list[MemberSetRef]] = {}
        for ref in slicer:
            slicer_by_dim.setdefault(ref.dimension.name, []).append(ref)
        for dim_name, refs in slicer_by_dim.items():
            u = use(refs[0].dimension)
            preds = [_path_predicate(r) for r in refs]
            if any(p is None for p in preds):
                continue  # slicing by the All member = no constraint
            u.predicates.append(_or_all(preds))

        df = self._join(uses)
        base_measures, calc_chain = self._measure_closure(measures)
        measure_cols = [measure_column(m) for m in base_measures]
        if not measure_cols:
            # pure member/tuple query — distinct combinations
            agg = df.select(*group_cols).dropDuplicates(group_cols) if group_cols else df
        elif group_cols:
            agg = df.groupBy(*group_cols).agg(*measure_cols)
        else:
            agg = df.agg(*measure_cols)

        # calculated members in solve_order (schema.rb:314-341): formulas
        # over measure aliases, may reference earlier calculated members
        for cm in calc_chain:
            agg = agg.withColumn(cm.out, F.expr(cm.expression))
        ordered = group_cols + [m.out for m in measures]
        return agg.select(*ordered), group_cols

    def _measure_closure(
        self, measures: list[Measure | CalculatedMember]
    ) -> tuple[list[Measure], list[CalculatedMember]]:
        """Dependency closure for calculated members.

        A requested calculated member may reference other calculated members
        and base measures that were not themselves requested (Mondrian
        resolves these through the schema at validate time;
        ``test/mondrian_test.rb:579-605`` member-referencing-member).  We scan
        formulas for known output aliases, pull in every transitive
        dependency, aggregate the needed base measures, and compute the
        calc chain in solve_order — extras are pruned by the final select.
        """
        known: dict[str, Measure | CalculatedMember] = {}
        for m in self.cube.measures:
            known[m.out] = m
        for c in self.cube.calculated_members:
            known[c.out] = c
        for m in measures:  # query-scoped WITH members shadow cube entries
            known[m.out] = m

        needed: dict[str, Measure | CalculatedMember] = {}

        def visit(item: Measure | CalculatedMember) -> None:
            if item.out in needed:
                return
            needed[item.out] = item
            if isinstance(item, CalculatedMember):
                for token in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", item.expression):
                    dep = known.get(token)
                    if dep is not None and dep.out != item.out:
                        visit(dep)

        for m in measures:
            visit(m)
        base = [m for m in needed.values() if isinstance(m, Measure)]
        calcs = sorted(
            (m for m in needed.values() if isinstance(m, CalculatedMember)),
            key=lambda c: (c.solve_order, c.out),
        )
        return base, calcs

    def _join(self, uses: dict[str, _DimUse]) -> DataFrame:
        """Star join: fact ⋈ each used dimension (README.md:132-143)."""
        df = self.engine.fact
        # degenerate dims: predicates directly on the fact scan (pushdown)
        for u in uses.values():
            if u.dim.degenerate and u.predicate is not None:
                df = df.filter(u.predicate)
        for u in uses.values():
            if u.dim.degenerate:
                continue
            dv = self.engine.dims[u.dim.name]
            pred_cols = _predicate_outputs(u)
            need = list(dict.fromkeys(u.group_outputs + pred_cols))
            ddf = dv.df.select("__pk", *need)
            if u.predicate is not None:
                ddf = ddf.filter(u.predicate)
            if u.dim.guaranteed_small:
                ddf = F.broadcast(ddf)
            on = df[u.dim.foreign_key] == ddf["__pk"]
            if not u.group_outputs:
                # slicer-only dimension: restrict, ship nothing
                df = df.join(ddf, on, "left_semi")
            else:
                df = df.join(ddf, on, "inner").drop(ddf["__pk"])
        return df


def _or_all(preds: list[Column]) -> Column:
    p = preds[0]
    for q in preds[1:]:
        p = p | q
    return p


def _predicate_outputs(u: _DimUse) -> list[str]:
    """Level outputs referenced by this dim's predicates (path depth)."""
    outs: list[str] = []
    if u.predicates:
        # predicates only ever reference level output columns of this dim
        for lv in u.dim.levels:
            outs.append(lv.out)
    return outs
