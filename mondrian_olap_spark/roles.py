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
class Role:
    """Named role: member grants + optional measure allow-list.

    ``rollup_policy`` (schema.rb:416-489):

    * ``'partial'`` (default here) — every plan is restricted to the granted
      region: totals reflect only visible members;
    * ``'full'`` — member lists and grouped axes are filtered, but
      aggregates that do not group the granted dimension (grand totals,
      other-dim rollups) see the full fact.

    Union roles (``role_union`` — connection.rb:183-211) combine by
    :func:`union_roles`: a member is visible if any constituent role grants
    it.
    """

    name: str
    grants: tuple[MemberGrant, ...] = ()
    allowed_measures: tuple[str, ...] | None = None
    rollup_policy: str = "partial"

    def __post_init__(self):
        if self.rollup_policy not in ("partial", "full"):
            raise ValueError(
                f"rollup_policy must be partial|full, got {self.rollup_policy!r}"
            )

    def dimension_predicate(self, dim: Dimension) -> Column | None:
        """Row predicate for one dimension: OR of allow paths minus OR of
        deny paths; None if the role does not constrain this dimension."""
        allows = [g for g in self.grants if g.dimension.lower() == dim.name.lower() and g.access == "all"]
        denies = [g for g in self.grants if g.dimension.lower() == dim.name.lower() and g.access == "none"]
        if not allows and not denies:
            return None
        pred = None
        if allows:
            pred = _or_paths(dim, [g.path for g in allows])
        for g in denies:
            d = _path_pred(dim, g.path)
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


def union_roles(name: str, *roles: Role) -> Role:
    """Union of roles: any constituent grant admits the member; measures are
    allowed if any role allows them (None anywhere = all allowed)."""
    grants: list[MemberGrant] = []
    for r in roles:
        grants.extend(r.grants)
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
    return Role(name=name, grants=tuple(grants), allowed_measures=measures)


def _path_pred(dim: Dimension, path: tuple[str, ...]) -> Column:
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
