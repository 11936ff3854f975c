"""Member-identifier parsing and resolution.

Reproduces the reference's MDX identifier handling:

* bracketed segments with ``]]`` escape — the reference extracts dimension
  names the same way (``lib/mondrian/olap/query.rb:409-414``) and parses full
  identifiers via olap4j ``IdentifierNode``
  (``lib/mondrian/olap/cube.rb:106-116``);
* navigation suffixes ``.Members`` / ``.AllMembers`` / ``.Children``
  (README.md:126, ``test/query_test.rb:711-724``).

A parsed identifier resolves against a :class:`~mondrian_olap_spark.model.Cube`
into one of:

* :class:`MeasureRef`   — ``[Measures].[Unit Sales]``
* :class:`MemberSetRef` — a set of members of one dimension: either all
  members at a level (``[Customer].[Nation].Members``), the children of a
  member path (``[Customer].[EUROPE].children``), or a single member path
  (``[Customer].[EUROPE].[FRANCE]``) used as a slicer / enumerated set
  element.

Member paths are key values from the top level down (Mondrian full names,
``lib/mondrian/olap/cube.rb:377-517``); the ``.Members`` form addresses a
level by *name* instead.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .model import Cube, Dimension


class MemberParseError(ValueError):
    pass


def parse_identifier_tagged(s: str) -> list[tuple[str, bool]]:
    """Split ``[A].[B b].[C]].C]`` into ``(segment, was_bracketed)`` pairs,
    honouring ``]]`` escapes.  The tag is what distinguishes the navigation
    KEYWORD ``.Children`` from a member whose key happens to be
    ``[Children]`` — quoting must survive parsing or the two collide."""
    segments: list[tuple[str, bool]] = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "[":
            j = i + 1
            buf: list[str] = []
            while j < n:
                if s[j] == "]":
                    if j + 1 < n and s[j + 1] == "]":  # escaped ]
                        buf.append("]")
                        j += 2
                        continue
                    break
                buf.append(s[j])
                j += 1
            else:
                raise MemberParseError(f"unterminated '[' in {s!r}")
            segments.append(("".join(buf), True))
            i = j + 1
            if i < n:
                if s[i] != ".":
                    raise MemberParseError(f"expected '.' after ']' in {s!r}")
                i += 1
                if i >= n:
                    raise MemberParseError(f"trailing '.' in identifier {s!r}")
        else:
            j = s.find(".", i)
            if j == -1:
                segments.append((s[i:], False))
                i = n
            else:
                segments.append((s[i:j], False))
                i = j + 1
                if i >= n:
                    raise MemberParseError(f"trailing '.' in identifier {s!r}")
    if not segments or any(seg == "" for seg, _ in segments):
        raise MemberParseError(f"empty segment in identifier {s!r}")
    return segments


def parse_identifier(s: str) -> list[str]:
    """Split an identifier into plain segments (quoting tags dropped)."""
    return [seg for seg, _ in parse_identifier_tagged(s)]


def quote_segment(seg: str) -> str:
    return "[" + seg.replace("]", "]]") + "]"


def format_name(segments: list[str]) -> str:
    """Render a full member name ``[A].[B]`` (cube.rb full_name)."""
    return ".".join(quote_segment(s) for s in segments)


@dataclass(frozen=True)
class MeasureRef:
    name: str


@dataclass(frozen=True)
class MemberSetRef:
    """A set of members of one dimension.

    * ``depth`` — deepest level index included in the grouping (0-based).
    * ``path`` — fixed ancestor key values for levels ``0..len(path)-1``;
      members beyond the path are unconstrained.
    * ``kind`` — ``'member'`` (single member / enumerated element),
      ``'children'`` (children of path), ``'level_members'`` (all members of
      a named level), ``'range'`` (members whose level ordinal falls in
      ``ordinal_range``, under ancestor ``path`` — the ``a:b`` MDX range,
      planned as a BETWEEN predicate so the member set is never enumerated),
      ``'all'`` (the hierarchy's synthetic "(All)" member — ``depth`` is
      ``-1`` so ``group_levels`` is empty: the member contributes NO
      grouping columns and NO predicate, i.e. the dimension grand total;
      its display column is the top level, NULL-valued, matching the
      ``totals()`` super-aggregate convention).
    """

    dimension: Dimension
    depth: int
    path: tuple[str, ...] = ()
    kind: str = "member"
    #: (lo, hi) inclusive bounds over a level's ordinal expression; only
    #: set for ``kind='range'``
    ordinal_range: tuple | None = None
    #: the level the ordinal range constrains — defaults to ``depth``;
    #: differs after drilling a range set deeper (the range keeps
    #: constraining the original level, not the child level)
    range_depth: int | None = None

    @property
    def group_levels(self):
        return self.dimension.levels[: self.depth + 1]


_NAV_SUFFIXES = {"members", "allmembers", "children"}


def resolve(cube: Cube, identifier: str) -> MeasureRef | MemberSetRef:
    """Resolve one member/measure identifier against a cube.

    Navigation keywords (``Members``/``Children``/…) count only when BARE:
    a bracket-quoted ``[Children]`` is a member key, never the keyword."""
    tagged = parse_identifier_tagged(identifier)
    segs = [seg for seg, _ in tagged]
    head = segs[0]
    if head.lower() == "measures":
        if len(segs) != 2:
            raise MemberParseError(f"measure identifier must be [Measures].[Name]: {identifier!r}")
        cube.measure(segs[1])  # raises KeyError if unknown
        return MeasureRef(name=segs[1])

    dim = cube.dimension(head)  # raises KeyError if unknown
    rest = segs[1:]
    rest_tags = tagged[1:]
    suffix = (
        rest[-1].lower()
        if rest and not rest_tags[-1][1] and rest[-1].lower() in _NAV_SUFFIXES
        else None
    )
    if suffix:
        rest = rest[:-1]
        rest_tags = rest_tags[:-1]

    if rest and not rest_tags[-1][1] and rest[-1].lower() == "defaultmember":
        # [Dim].DefaultMember (jar!mondrian/olap/fun/
        # DimensionDefaultMemberFunDef): a hierarchy WITH an All member
        # defaults to it (the grand total); only all-less hierarchies
        # default to the first member in hierarchy order — that needs the
        # engine's ordinal-ordered lookup, so it resolves one layer up
        # (Query._resolve / the MDX parser), not here
        if len(rest) != 1:
            raise MemberParseError(
                f"{identifier!r}: DefaultMember applies to a dimension, "
                "not a member path, in this subset"
            )
        if dim.has_all:
            return MemberSetRef(dim, depth=-1, kind="all")
        raise MemberParseError(
            f"{identifier!r}: dimension {dim.name!r} has no All member "
            "(has_all=False) — its DefaultMember is the first member in "
            "hierarchy order, which needs engine access; resolve through "
            "Query or MDX"
        )

    if suffix in ("members", "allmembers"):
        # [Dim].[LevelName].Members — level addressed by name
        if len(rest) == 1 and dim.level_index(rest[0]) is not None:
            return MemberSetRef(dim, depth=dim.level_index(rest[0]), kind="level_members")
        if len(rest) == 0:
            # [Dim].Members → members of the top level
            return MemberSetRef(dim, depth=0, kind="level_members")
        raise MemberParseError(
            f"{identifier!r}: {'.'.join(rest)!r} is not a level of dimension {dim.name!r}"
        )

    if suffix == "children":
        # [Dim].children → top-level members (children of the All member,
        # README.md:126); [Dim].[A].children → members one level below path;
        # chained .Children.Children descends multiple levels (the
        # DESCENDANTS(member, level) lowering — DescendantsFunDef)
        extra = 0
        while rest and not rest_tags[-1][1] and rest[-1].lower() == "children":
            rest = rest[:-1]
            rest_tags = rest_tags[:-1]
            extra += 1
        depth = len(rest) + extra
        if depth >= len(dim.levels):
            raise MemberParseError(f"{identifier!r}: path deeper than hierarchy")
        return MemberSetRef(dim, depth=depth, path=tuple(rest), kind="children")

    # plain member path: key values from level 0 down
    if not rest:
        raise MemberParseError(f"{identifier!r}: dimension reference needs a path or suffix")
    if len(rest) == 1 and rest[0].lower() == "all" and dim.has_all:
        # [Dim].[All] — the synthetic All member (hierarchy hasAll,
        # schema.rb:132-167); shadows any genuine level-0 key "All", as
        # in the reference
        return MemberSetRef(dim, depth=-1, kind="all")
    if len(rest) > len(dim.levels):
        raise MemberParseError(f"{identifier!r}: path deeper than hierarchy")
    return MemberSetRef(dim, depth=len(rest) - 1, path=tuple(rest), kind="member")


def format_ref(ref: MemberSetRef) -> str:
    """Serialize one member-set reference back to its MDX identifier —
    the inverse of :func:`resolve` (SetToStr/TupleToStr building block,
    jar!mondrian/olap/fun/SetToStrFunDef)."""
    dim = ref.dimension
    if ref.kind == "member":
        return format_name([dim.name, *map(str, ref.path)])
    if ref.kind == "children":
        base = format_name([dim.name, *map(str, ref.path)])
        # depth may exceed len(path)+1 (chained-children DESCENDANTS
        # lowering): serialize one .children per descended level so the
        # string round-trips through resolve()
        return base + ".children" * (ref.depth - len(ref.path) + 1)
    if ref.kind == "level_members":
        return f"{format_name([dim.name, dim.levels[ref.depth].name])}.Members"
    if ref.kind == "all":
        return f"{format_name([dim.name])}.DefaultMember"
    if ref.kind == "range":
        # bounds serialize from the ORDINAL expression values — identical
        # to the member keys whenever the level's ordinal is its key (the
        # time/TPC-H case); a display form only, since ':' range syntax is
        # not part of resolve()'s input grammar
        lo, hi = ref.ordinal_range or ("?", "?")
        prefix = [dim.name, *map(str, ref.path)]
        return (
            f"{format_name([*prefix, str(lo)])}:{format_name([*prefix, str(hi)])}"
        )
    raise MemberParseError(f"cannot serialize member set kind {ref.kind!r}")


def set_to_str(refs: list[MemberSetRef]) -> str:
    """SetToStr: ``{[A].[X], [A].[Y]}`` (SetToStrFunDef)."""
    return "{" + ", ".join(format_ref(r) for r in refs) + "}"


def tuple_to_str(refs: list[MemberSetRef]) -> str:
    """TupleToStr: ``([A].[X], [B].[Y])`` — one member per dimension
    (TupleToStrFunDef)."""
    return "(" + ", ".join(format_ref(r) for r in refs) + ")"


def resolve_level(cube: Cube, identifier: str) -> tuple[Dimension, int]:
    """Resolve ``[Dim].[LevelName]`` (or ``[Dim]`` → level 0) to a
    (dimension, level-index) pair — the RETURN-field form of drill-through
    (``lib/mondrian/olap/result.rb:283-419`` level key fields)."""
    segs = parse_identifier(identifier)
    dim = cube.dimension(segs[0])
    if len(segs) == 1:
        return dim, 0
    if len(segs) == 2:
        idx = dim.level_index(segs[1])
        if idx is not None:
            return dim, idx
    raise MemberParseError(f"{identifier!r} is not a [Dimension].[Level] reference")
