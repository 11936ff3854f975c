"""Semantic model dataclasses (Schema / Cube / Dimension / Level / Measure).

Mirrors the declarative surface of the reference schema DSL
(``/root/reference/lib/mondrian/olap/schema.rb``):

* ``Cube``      — schema.rb:56-69  (fact table + dimensions + measures)
* ``Dimension`` — schema.rb:88-104 (foreign_key, levels; snowflake ``Join``
  schema.rb:169-174 becomes :class:`JoinLink` chains)
* ``Level``     — schema.rb:176-246 (column / expression / ordinal /
  level_type); level SQL expressions schema.rb:248-270 are plain Spark SQL
  expression strings here (single engine → no per-dialect variants)
* ``Measure``   — schema.rb:286-312 (column-or-expression + aggregator)
* ``CalculatedMember`` — schema.rb:314-341 (post-aggregation formula with
  solve_order)

Unlike the reference there is no XML rendering step: the dataclasses *are*
the catalog, validated eagerly when a :class:`~mondrian_olap_spark.star.CubeEngine`
is constructed (the reference validates at connect time —
``test/schema_definition_test.rb:1477-1488``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


def _snake(name: str) -> str:
    s = re.sub(r"[^0-9a-zA-Z]+", "_", name).strip("_")
    s = re.sub(r"(?<=[a-z0-9])(?=[A-Z])", "_", s)
    return s.lower()


def localized(
    locales: tuple[tuple[str, str], ...], locale: str | None, fallback
):
    """Pick the best localized variant from (locale, value) pairs: exact
    locale match first, then bare language ('de' matches 'de_DE'), else
    ``fallback`` — Mondrian's resource-bundle resolution order
    (connection.rb:213-223 locale surface)."""
    if locale and locales:
        d = {k.lower(): v for k, v in locales}
        low = locale.lower()
        if low in d:
            return d[low]
        # bare-language fallback; both underscore (Java Locale) and
        # hyphen (BCP-47) forms split
        lang = re.split(r"[-_]", low)[0]
        if lang in d:
            return d[lang]
    return fallback


AGGREGATORS = frozenset(
    # schema.rb:294 — sum, count, min, max, avg, distinct-count;
    # approx-distinct-count is the engine's opt-in HLL variant
    # (SURVEY.md §2.4: approx only as opt-in)
    {"sum", "count", "min", "max", "avg", "distinct-count", "approx-distinct-count"}
)

TIME_LEVEL_TYPES = frozenset(
    # schema.rb:218-221
    {"TimeYears", "TimeQuarters", "TimeMonths", "TimeWeeks", "TimeDays"}
)


@dataclass(frozen=True)
class Level:
    """One level of a hierarchy.

    ``column`` is a column name *or any Spark SQL expression* over the
    dimension's (pre-joined snowflake) table — covering both the plain
    ``column:`` attribute and the ``key_expression`` form of the reference
    (schema.rb:176-190, 248-270).
    """

    name: str
    column: str
    #: output column name in result DataFrames (defaults to snake_case(name))
    output: str | None = None
    #: sort-key expression for member ordering (``ordinal_column`` /
    #: OrdinalExpression, schema.rb:188-190); defaults to ``column``
    ordinal: str | None = None
    #: one of TIME_LEVEL_TYPES for time dimensions (schema.rb:218-221)
    level_type: str | None = None
    #: extra attribute columns attached to members (schema.rb:272-284);
    #: mapping property-name -> SQL expression over the dimension table
    properties: tuple[tuple[str, str], ...] = ()
    #: ragged-hierarchy member hiding (schema.rb:222-230):
    #: 'IfBlankName' hides members whose key is NULL/empty;
    #: 'IfParentsName' hides members equal to their parent's key
    hide_member_if: str | None = None
    #: display caption expression (caption/name columns distinct from the
    #: key column — schema.rb:176-190 name_column/caption_column and
    #: CaptionExpression :248-270); surfaces as ``<out>_caption``
    caption: str | None = None
    #: localized member-caption expressions: (locale, SQL expression)
    #: pairs selected by the engine's active locale
    #: (connection.rb:213-223 locale surface; Mondrian resolves localized
    #: captions the same way from schema resource annotations)
    caption_locales: tuple[tuple[str, str], ...] = ()
    #: Python MEMBER FORMATTER (schema_udf.rb:241-249 MemberFormatter —
    #: a callable ``value -> display string`` applied to the caption
    #: source, Arrow-batched as a pandas UDF, never per-row Python)
    formatter: object | None = None
    #: display metadata for the level itself (``caption`` above is the
    #: member-caption *expression*; this is the level's display name —
    #: cube_test.rb:331-374 description/caption/annotations accessors)
    description: str | None = None
    display_caption: str | None = None
    annotations: tuple[tuple[str, str], ...] = ()

    @property
    def out(self) -> str:
        return self.output or _snake(self.name)

    @property
    def ordinal_expr(self) -> str:
        return self.ordinal or self.column

    @property
    def property_defs(self) -> tuple[tuple[str, str, object], ...]:
        """Normalized ``(name, expression, formatter)`` triples.

        ``properties`` entries are ``(name, SQL expr)`` pairs or
        ``(name, SQL expr, callable)`` triples — the callable is a Python
        PROPERTY FORMATTER (schema_udf.rb:252-261 PropertyFormatter:
        value → display string, Arrow-batched like the member formatter
        at :attr:`formatter`).  The formatted value surfaces as an extra
        ``<name>_formatted`` column next to the raw typed property."""
        return tuple(
            (p[0], p[1], p[2] if len(p) > 2 else None)
            for p in self.properties
        )


@dataclass(frozen=True)
class JoinLink:
    """One hop of a snowflake join chain (schema.rb:169-174).

    The dimension's base table is joined to ``table`` on
    ``left_key = right_key``; chains nest by listing several links in order.
    ``alias`` supports self-joins / reusing one physical table twice
    (``test/mondrian_test.rb:23-35``).
    """

    left_key: str
    table: str
    right_key: str
    alias: str | None = None


@dataclass(frozen=True)
class Dimension:
    """A dimension usable by a cube (schema.rb:88-130).

    Two physical shapes:

    * **table dimension** — ``table`` + ``primary_key`` (+ optional snowflake
      ``joins``); joined to the fact on ``fact.foreign_key = dim.primary_key``.
    * **degenerate dimension** — ``table is None``; level expressions are
      evaluated directly over fact columns (Mondrian models these as
      dimensions whose hierarchy has no table).

    ``guaranteed_small`` marks dimensions whose cardinality is bounded at any
    data scale (e.g. region/nation): the planner adds an explicit
    ``broadcast()`` hint for them.  Everything else is left to Catalyst /
    AQE (a customer dimension at 100 TB is *not* broadcastable, so we must
    not hard-code the hint — SURVEY.md §4).
    """

    name: str
    levels: tuple[Level, ...]
    foreign_key: str | None = None
    table: str | None = None
    primary_key: str | None = None
    joins: tuple[JoinLink, ...] = ()
    guaranteed_small: bool = False
    #: flag a dimension as high-cardinality (schema.rb:100-101): the
    #: engine refuses to materialize its member ARRAYS to the driver
    #: (metadata ``.members``) — query planning is unaffected (members
    #: stay distributed there)
    high_cardinality: bool = False
    #: synthetic "(All)" member exists (hierarchy hasAll — schema.rb:132-167)
    has_all: bool = True
    #: display metadata (schema.rb:88-130 description/caption/Annotations)
    description: str | None = None
    caption: str | None = None
    #: localized display captions: (locale, caption) pairs
    caption_locales: tuple[tuple[str, str], ...] = ()
    annotations: tuple[tuple[str, str], ...] = ()
    #: when the dimension rides a *bridge* table (its ``table`` is a fact-side
    #: association like orders, not the hierarchy's own table), member lists
    #: must come from the hierarchy tables alone — members exist whether or
    #: not fact/bridge rows do (Mondrian's primary_key_table distinction,
    #: schema.rb:146-151).  ``members_from_join`` = index into ``joins``
    #: whose right table starts the member view (subsequent links still
    #: apply); None = members derive from the full joined view.
    members_from_join: int | None = None

    def __post_init__(self) -> None:
        if not self.levels:
            raise ValueError(f"dimension {self.name!r} needs at least one level")
        if self.table is not None and self.primary_key is None:
            raise ValueError(f"dimension {self.name!r}: table requires primary_key")
        if self.table is None and self.joins:
            raise ValueError(f"dimension {self.name!r}: degenerate dim cannot have joins")

    @property
    def degenerate(self) -> bool:
        return self.table is None

    def level_index(self, level_name: str) -> int | None:
        for i, lv in enumerate(self.levels):
            if lv.name.lower() == level_name.lower():
                return i
        return None


def dimension_usage(
    source: Dimension,
    foreign_key: str,
    name: str | None = None,
    usage_prefix: str | None = None,
) -> Dimension:
    """Shared-dimension usage (schema.rb:106-121 DimensionUsage): bind a
    schema-level shared dimension into a cube with a cube-specific foreign
    key, optional rename, and optional ``usage_prefix`` on the output
    columns — the role-playing case (one shared Date dimension used as
    ship-date and order-date needs distinct result columns)."""
    from dataclasses import replace

    levels = source.levels
    if usage_prefix:
        levels = tuple(
            replace(lv, output=f"{usage_prefix}{lv.out}") for lv in levels
        )
    return replace(
        source,
        name=name or source.name,
        foreign_key=foreign_key,
        levels=levels,
    )


@dataclass(frozen=True)
class Measure:
    """Fact measure: aggregator over a column or SQL expression
    (schema.rb:286-312; ``measure_expression`` test
    ``test/schema_definition_test.rb:527-550``)."""

    name: str
    expression: str
    aggregator: str = "sum"
    output: str | None = None
    format_string: str | None = None
    #: optional edge cast for the *aggregated* output (e.g. ``"double"``).
    #: Money measures aggregate over exact DECIMAL expressions — decimal
    #: addition is associative, so the sum is identical regardless of
    #: partition/merge order — and only the final cell value is widened back
    #: to double.  This is what makes results bit-deterministic across
    #: engines and shuffle orders (double sums are order-sensitive in the
    #: last ulps).  For ``avg`` the cast applies to the numerator:
    #: ``cast(sum(expr) as dtype) / count(expr)``.
    dtype: str | None = None
    #: display metadata (cube_test.rb:500-508 measure annotations)
    description: str | None = None
    caption: str | None = None
    annotations: tuple[tuple[str, str], ...] = ()
    #: schema-declared cell formatter: a Python callable value→str applied
    #: driver-side in ``formatted_values`` (the CellFormatter-UDF analog,
    #: schema_definition_test.rb:1235-1250; schema_udf.rb:220-239).  The
    #: name surfaces via metadata (``cell_formatter_name``), defaulting to
    #: the callable's ``__name__``.
    cell_formatter: object = None
    cell_formatter_name: str | None = None

    def __post_init__(self) -> None:
        if self.aggregator not in AGGREGATORS:
            raise ValueError(
                f"measure {self.name!r}: unknown aggregator {self.aggregator!r} "
                f"(expected one of {sorted(AGGREGATORS)})"
            )

    @property
    def out(self) -> str:
        return self.output or _snake(self.name)


@dataclass(frozen=True)
class CalculatedMember:
    """Calculated member on the Measures dimension (schema.rb:314-341).

    ``expression`` is a Spark SQL expression over *output* measure aliases
    (the reference's MDX formula over ``[Measures].[X]`` references).
    Members are applied after aggregation in ``solve_order`` (ascending), so
    a calculated member may reference earlier calculated members — matching
    Mondrian solve-order semantics.
    """

    name: str
    expression: str
    output: str | None = None
    solve_order: int = 0
    format_string: str | None = None

    @property
    def out(self) -> str:
        return self.output or _snake(self.name)


@dataclass(frozen=True)
class Cube:
    """Fact table + dimensions + measures (schema.rb:56-69)."""

    name: str
    fact: str
    dimensions: tuple[Dimension, ...]
    measures: tuple[Measure, ...]
    calculated_members: tuple[CalculatedMember, ...] = ()
    #: optional SQL WHERE filter baked into the fact table reference
    #: (``Table`` inline SQL filter — schema.rb:71-79,
    #: test/schema_definition_test.rb:149-168)
    fact_filter: str | None = None
    #: display metadata (schema.rb description/caption attributes +
    #: Annotations elements — cube_test.rb:93-104); annotations are
    #: name→value pairs (tuple-of-pairs to keep the dataclass hashable)
    description: str | None = None
    caption: str | None = None
    #: localized display captions: (locale, caption) pairs
    caption_locales: tuple[tuple[str, str], ...] = ()
    annotations: tuple[tuple[str, str], ...] = ()
    #: Measures-hierarchy default member (``Cube defaultMeasure`` —
    #: schema.rb:61,348; test/schema_definition_test.rb:46-69).  Resolves
    #: value expressions whose Measures context is unpinned, e.g. a tuple
    #: scalar with no [Measures] component.  None → first stored measure.
    default_measure: str | None = None
    #: schema-declared calculated members on NON-Measures hierarchies
    #: (``CalculatedMember hierarchy="[Time.Weekly]"`` — schema.rb:314-341,
    #: test/schema_definition_test.rb:570-591): (name, hierarchy, formula)
    #: triples.  MDX queries referencing the name get the formula applied
    #: as a query-scoped dimension member; the XML exporter round-trips
    #: them verbatim.
    dimension_calc_members: tuple[tuple[str, str, str], ...] = ()
    #: declared aggregate (summary) tables — the XML ``AggName``/
    #: ``AggPattern`` surface (schema.rb:374-414; matcher
    #: ``jar!mondrian/rolap/aggmatcher``): records of
    #: ``(name_regex, levels, measures, excludes)`` where ``levels`` maps
    #: level identifiers to physical columns and ``measures`` maps
    #: measure names to physical columns (both tuple-of-pairs for
    #: hashability).  CubeEngine registers every matching table in its
    #: ``tables`` map at construction, so a migrating Mondrian schema's
    #: summary tables keep routing instead of being silently dropped.
    aggregate_declarations: tuple = ()

    def __post_init__(self) -> None:
        seen: set[str] = set()
        for d in self.dimensions:
            for lv in d.levels:
                if lv.out in seen:
                    raise ValueError(
                        f"cube {self.name!r}: duplicate output column {lv.out!r}"
                    )
                seen.add(lv.out)
        for m in (*self.measures, *self.calculated_members):
            if m.out in seen:
                raise ValueError(f"cube {self.name!r}: duplicate output column {m.out!r}")
            seen.add(m.out)

    def dimension(self, name: str) -> Dimension:
        for d in self.dimensions:
            if d.name.lower() == name.lower():
                return d
        # Mondrian's [Dimension.Hierarchy] secondary-hierarchy references
        # ([Time.Weekly] — schema.rb:132-167 named hierarchies): secondary
        # hierarchies are modelled as sibling dimensions here, named by
        # concatenation (TimeWeekly)
        if "." in name:
            squashed = name.replace(".", "").lower()
            for d in self.dimensions:
                if d.name.lower() == squashed:
                    return d
        raise KeyError(f"cube {self.name!r} has no dimension {name!r}")

    def measure(self, name: str) -> Measure | CalculatedMember:
        for m in (*self.measures, *self.calculated_members):
            if m.name.lower() == name.lower():
                return m
        raise KeyError(f"cube {self.name!r} has no measure {name!r}")

    def default_measure_obj(self) -> Measure:
        """The Measures hierarchy's default member: the declared
        ``default_measure`` or the first stored measure (Mondrian's
        fallback when ``defaultMeasure`` is absent)."""
        if self.default_measure is not None:
            m = self.measure(self.default_measure)
            if isinstance(m, Measure):
                return m
            raise ValueError(
                f"cube {self.name!r}: default_measure {self.default_measure!r} "
                "must be a stored measure"
            )
        if not self.measures:
            raise ValueError(f"cube {self.name!r} has no stored measures")
        return self.measures[0]


@dataclass(frozen=True)
class Parameter:
    """Schema-level parameter declaration (schema.rb:515-524): typed,
    optionally non-modifiable, with a default value.  Referenced in queries
    via ``ParamRef('name')`` / ``Parameter('name', TYPE, default)``;
    supplying a value for a non-modifiable parameter, or a value of the
    wrong type, is rejected at execute time
    (test/schema_definition_test.rb:1298-1427)."""

    name: str
    type: str = "String"  # String | Numeric | Integer | Boolean
    modifiable: bool = True
    default_value: object = None
    description: str | None = None

    VALID_TYPES = ("String", "Numeric", "Integer", "Boolean")

    def __post_init__(self) -> None:
        if self.type.capitalize() not in self.VALID_TYPES:
            raise ValueError(
                f"parameter {self.name!r}: type must be one of "
                f"{self.VALID_TYPES}, got {self.type!r}"
            )

    def check_value(self, value) -> None:
        t = self.type.capitalize()
        ok = (
            isinstance(value, str)
            if t == "String"
            else isinstance(value, bool)
            if t == "Boolean"
            else isinstance(value, int) and not isinstance(value, bool)
            if t == "Integer"
            else isinstance(value, (int, float)) and not isinstance(value, bool)
        )
        if not ok:
            raise TypeError(
                f"parameter {self.name!r} is {t}; got {type(value).__name__} "
                f"value {value!r}"
            )


@dataclass(frozen=True)
class Schema:
    """Root catalog: named cubes + typed parameters (schema.rb:53-54,
    515-524)."""

    name: str
    cubes: tuple[Cube, ...] = ()
    parameters: tuple[Parameter, ...] = ()
    #: schema-level shared dimensions (schema.rb:53-54 ``:dimension``
    #: elements): referenced from cubes via :func:`dimension_usage`
    dimensions: tuple[Dimension, ...] = ()
    #: schema-declared roles, selectable by name on a connection
    #: (schema.rb:416-489; connection.rb role_name= / available role names)
    roles: tuple = ()

    @property
    def role_names(self) -> list[str]:
        """connection_role_test.rb:105-108 available role names."""
        return [r.name for r in self.roles]

    def role(self, name: str):
        for r in self.roles:
            if r.name.lower() == name.lower():
                return r
        raise KeyError(f"schema {self.name!r} has no role {name!r}")

    def dimension(self, name: str) -> Dimension:
        """Shared-dimension lookup (source resolution for DimensionUsage)."""
        for d in self.dimensions:
            if d.name.lower() == name.lower():
                return d
        raise KeyError(f"schema {self.name!r} has no shared dimension {name!r}")

    @property
    def cube_names(self) -> list[str]:
        """connection.rb:142-145 ``cube_names``."""
        return [c.name for c in self.cubes]

    def cube(self, name: str) -> Cube:
        for c in self.cubes:
            if c.name.lower() == name.lower():
                return c
        raise KeyError(f"schema {self.name!r} has no cube {name!r}")

    def parameter(self, name: str) -> Parameter | None:
        """Parameter definition lookup — ``mondrian_parameter`` analog
        (connection.rb parameter access; None for unknown names)."""
        for p in self.parameters:
            if p.name.lower() == name.lower():
                return p
        return None
