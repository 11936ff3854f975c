"""Access-control roles: member grants → dimension row filters, measure
allow-lists → resolve-time denial (SURVEY.md §2 Role; reference
``lib/mondrian/olap/schema.rb:416-489`` grants,
``test/connection_role_test.rb`` behavior).

A role is a set of *member grants* per dimension (allowed member paths and
denied sub-paths) plus an optional measure allow-list.  Planning with a role:

* every query — whether or not it touches the granted dimension — sees only
  fact rows inside the granted region (the reference's ``rollup_policy:
  'partial'`` semantics: totals reflect the restriction; ``'full'`` totals
  are a future opt-in);
* denied member sub-paths are subtracted (grant [Customers].[USA], deny
  [Customers].[USA].[CA]);
* resolving a measure outside the allow-list raises :class:`AccessDenied` at
  query-build time (member invisibility — connection_role_test.rb:101-184).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from .model import Cube, Dimension


class AccessDenied(PermissionError):
    pass


@dataclass(frozen=True)
class MemberGrant:
    dimension: str
    path: tuple[str, ...]
    access: str = "all"  # all | none

    def __post_init__(self):
        if self.access not in ("all", "none"):
            raise ValueError(f"grant access must be all|none, got {self.access!r}")


@dataclass(frozen=True)
class HierarchyGrant:
    """Level-bounded hierarchy grant (schema.rb:440-466 ``top_level`` /
    ``bottom_level``): the role sees only levels within the bounds —
    querying or listing members outside them raises :class:`AccessDenied`
    (absolute level invisibility, connection_role_test.rb:101-184)."""

    dimension: str
    top_level: str | None = None
    bottom_level: str | None = None


@dataclass(frozen=True)
class Role:
    """Named role: member grants + optional measure allow-list.

    ``rollup_policy`` (schema.rb:416-489):

    * ``'partial'`` (default here) — every plan is restricted to the granted
      region: totals reflect only visible members;
    * ``'full'`` — member lists and grouped axes are filtered, but
      aggregates that do not group the granted dimension (grand totals,
      other-dim rollups) see the full fact;
    * ``'hidden'`` — a cell that would roll up over any non-granted member
      is NULLed out entirely: totals above the grant grain are hidden
      rather than partially summed or fully revealed.

    Union roles (``role_union`` — connection.rb:183-211) combine by
    :func:`union_roles`: a member is visible if any constituent role grants
    it.
    """

    name: str
    grants: tuple[MemberGrant, ...] = ()
    allowed_measures: tuple[str, ...] | None = None
    rollup_policy: str = "partial"
    hierarchy_grants: tuple[HierarchyGrant, ...] = ()

    def __post_init__(self):
        if self.rollup_policy not in ("partial", "full", "hidden"):
            raise ValueError(
                f"rollup_policy must be partial|full|hidden, got {self.rollup_policy!r}"
            )

    def dimension_predicate(self, dim: Dimension) -> Column | None:
        """Row predicate for one dimension: OR of allow paths minus OR of
        deny paths; None if the role does not constrain this dimension.

        Most-specific-grant-wins (Mondrian's grant resolution): a deny on
        an ancestor does NOT annihilate an allow on its descendant — the
        deny region is weakened by every allow strictly deeper under it
        (allow [USA].[CA] + deny [USA] → CA visible, rest of USA hidden)."""
        allows = [g for g in self.grants if g.dimension.lower() == dim.name.lower() and g.access == "all"]
        denies = [g for g in self.grants if g.dimension.lower() == dim.name.lower() and g.access == "none"]
        if not allows and not denies:
            return None
        allow_paths = [g.path for g in allows]
        pred = None
        if allows:
            pred = _or_paths(dim, allow_paths)
        for g in denies:
            d = _effective_deny(dim, g.path, allow_paths)
            pred = (~d) if pred is None else (pred & ~d)
        return pred

    def check_measure(self, cube: Cube, name: str) -> None:
        if self.allowed_measures is None:
            return
        if name.lower() not in {m.lower() for m in self.allowed_measures}:
            raise AccessDenied(
                f"role {self.name!r} does not grant measure {name!r} on cube {cube.name!r}"
            )

    def constrained_dimensions(self, cube: Cube) -> list[Dimension]:
        names = {g.dimension.lower() for g in self.grants}
        return [d for d in cube.dimensions if d.name.lower() in names]

    def grant_depth(self, dim: Dimension) -> int:
        """Deepest level any member grant (allow OR deny) references on this
        dimension — the grain at which cell membership in the granted region
        is decidable (drives the 'hidden' rollup policy)."""
        return max(
            (
                len(g.path)
                for g in self.grants
                if g.dimension.lower() == dim.name.lower()
            ),
            default=0,
        )

    def level_bounds(self, dim: Dimension) -> tuple[int, int] | None:
        """(top, bottom) level-index bounds across this dimension's
        hierarchy grants — several grants (e.g. from a role union) combine
        to the LOOSEST bounds; None if the dimension has no level-bounded
        grant."""
        bounds = []
        for hg in self.hierarchy_grants:
            if hg.dimension.lower() != dim.name.lower():
                continue
            top = dim.level_index(hg.top_level) if hg.top_level else 0
            bottom = (
                dim.level_index(hg.bottom_level)
                if hg.bottom_level
                else len(dim.levels) - 1
            )
            if top is None or bottom is None:
                raise ValueError(
                    f"hierarchy grant on {dim.name!r}: unknown level "
                    f"{hg.top_level!r}/{hg.bottom_level!r}"
                )
            bounds.append((top, bottom))
        if not bounds:
            return None
        return (min(t for t, _ in bounds), max(b for _, b in bounds))

    def check_level(self, dim: Dimension, depth: int) -> None:
        """Raise :class:`AccessDenied` when ``depth`` lies outside the
        role's level bounds for this dimension."""
        b = self.level_bounds(dim)
        if b is not None and depth < 0:
            # depth -1 = the synthetic All member (above every level).  An
            # UNSET topLevel defaults to the hierarchy top (schema.rb
            # HierarchyGrant), so a bottom-only grant keeps the All member
            # (and [Dim].DefaultMember) accessible; any EXPLICIT topLevel
            # — even the first level — denies members above it, All
            # included (loosest-bounds union: one unset top suffices)
            if any(
                hg.top_level is None
                for hg in self.hierarchy_grants
                if hg.dimension.lower() == dim.name.lower()
            ):
                return
        if b is not None and not (b[0] <= depth <= b[1]):
            name = "(All)" if depth < 0 else dim.levels[depth].name
            raise AccessDenied(
                f"role {self.name!r} does not grant level "
                f"{name!r} of dimension {dim.name!r} "
                f"(granted levels {dim.levels[b[0]].name!r}.."
                f"{dim.levels[b[1]].name!r})"
            )

    def member_visibility_predicate(self, dim: Dimension, depth: int) -> Column | None:
        """Member-list visibility at ``depth`` (absolute invisibility —
        connection_role_test.rb:101-184): a member is visible iff its
        subtree intersects an allow grant (allow paths truncated to the
        listing depth) and it is not fully covered by a deny grant."""
        allows = [
            g.path[: depth + 1]
            for g in self.grants
            if g.dimension.lower() == dim.name.lower() and g.access == "all"
        ]
        denies = [
            g.path
            for g in self.grants
            if g.dimension.lower() == dim.name.lower()
            and g.access == "none"
            and len(g.path) <= depth + 1
        ]
        if not allows and not denies:
            return None
        full_allows = [
            g.path
            for g in self.grants
            if g.dimension.lower() == dim.name.lower() and g.access == "all"
        ]
        pred = _or_paths(dim, allows) if allows else None
        for p in denies:
            # most-specific-wins here too: an allow strictly deeper under
            # the deny keeps its subtree listable (truncated to this depth)
            deeper = [
                a[: depth + 1]
                for a in full_allows
                if len(a) > len(p) and tuple(a[: len(p)]) == tuple(p)
            ]
            d = _path_pred(dim, p)
            if deeper:
                d = d & ~_or_paths(dim, deeper)
            pred = (~d) if pred is None else (pred & ~d)
        return pred


@dataclass(frozen=True)
class _UnionRole(Role):
    """Role union with PER-CONSTITUENT disjunction semantics: a member is
    visible when ANY constituent role would show it.  Flattening grants
    into one Role would be WRONG in two ways: an unconstrained constituent
    must unconstrain the union (its holder already sees everything), and
    one role's deny must not subtract from another role's allow."""

    roles: tuple[Role, ...] = ()

    def constrained_dimensions(self, cube: Cube) -> list[Dimension]:
        # a dimension is constrained only when EVERY constituent constrains
        # it — one unconstrained role admits all members
        out = []
        for d in cube.dimensions:
            if all(
                any(g.dimension.lower() == d.name.lower() for g in r.grants)
                for r in self.roles
            ) and any(g.dimension.lower() == d.name.lower() for g in self.grants):
                out.append(d)
        return out

    def dimension_predicate(self, dim: Dimension) -> Column | None:
        preds = [r.dimension_predicate(dim) for r in self.roles]
        if any(p is None for p in preds):
            return None  # an unconstrained constituent admits everything
        pred = None
        for p in preds:
            pred = p if pred is None else (pred | p)
        return pred

    def member_visibility_predicate(self, dim: Dimension, depth: int) -> Column | None:
        preds = [r.member_visibility_predicate(dim, depth) for r in self.roles]
        if any(p is None for p in preds):
            return None
        pred = None
        for p in preds:
            pred = p if pred is None else (pred | p)
        return pred


def union_roles(name: str, *roles: Role) -> Role:
    """Union of roles: any constituent grant admits the member (an
    unconstrained constituent unconstrains that dimension; denies apply
    only within their own role); measures are allowed if any role allows
    them (None anywhere = all allowed); level bounds widen to the loosest
    constituent — but only when EVERY constituent bounds the dimension
    (one unbounded role unbounds the union)."""
    grants: list[MemberGrant] = []
    for r in roles:
        grants.extend(r.grants)
    hg_by_dim: dict[str, list[HierarchyGrant]] = {}
    for r in roles:
        for hg in r.hierarchy_grants:
            hg_by_dim.setdefault(hg.dimension.lower(), []).append(hg)
    hgrants: list[HierarchyGrant] = []
    for hgs in hg_by_dim.values():
        bounded_in_all = all(
            any(hg.dimension.lower() == hgs[0].dimension.lower()
                for hg in r.hierarchy_grants)
            for r in roles
        )
        if bounded_in_all:
            # keep every grant; Role.level_bounds combines them loosest-wins
            hgrants.extend(hgs)
    measures: tuple[str, ...] | None
    if any(r.allowed_measures is None for r in roles):
        measures = None
    else:
        seen: list[str] = []
        for r in roles:
            for m in r.allowed_measures or ():
                if m not in seen:
                    seen.append(m)
        measures = tuple(seen)
    # rollup_policy combines most-permissive-wins, matching the union's
    # "any constituent admits" visibility semantics (full > partial >
    # hidden) — dropping it entirely would silently downgrade 'hidden'
    # constituents to 'partial'
    order = {"full": 2, "partial": 1, "hidden": 0}
    policy = max((r.rollup_policy for r in roles), key=lambda p: order[p])
    return _UnionRole(
        name=name,
        grants=tuple(grants),
        allowed_measures=measures,
        hierarchy_grants=tuple(hgrants),
        rollup_policy=policy,
        roles=tuple(roles),
    )


def _effective_deny(
    dim: Dimension, d_path: tuple[str, ...], allow_paths: list[tuple[str, ...]]
) -> Column:
    """A deny region minus every allow strictly deeper under it
    (most-specific-grant-wins)."""
    d = _path_pred(dim, d_path)
    deeper = [
        a
        for a in allow_paths
        if len(a) > len(d_path) and tuple(a[: len(d_path)]) == tuple(d_path)
    ]
    if deeper:
        d = d & ~_or_paths(dim, deeper)
    return d


def _path_pred(dim: Dimension, path: tuple[str, ...]) -> Column:
    if len(path) > len(dim.levels):
        raise ValueError(
            f"member grant path {path!r} is deeper than dimension "
            f"{dim.name!r}'s {len(dim.levels)} level(s)"
        )
    pred = None
    for i, key in enumerate(path):
        c = F.col(dim.levels[i].out) == key
        pred = c if pred is None else (pred & c)
    return pred if pred is not None else F.lit(True)


def _or_paths(dim: Dimension, paths: list[tuple[str, ...]]) -> Column:
    pred = None
    for p in paths:
        c = _path_pred(dim, p)
        pred = c if pred is None else (pred | c)
    return pred
