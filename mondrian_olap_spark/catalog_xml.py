"""Mondrian XML catalog importer — the migration path for existing
Mondrian users (SURVEY.md §1.4; ``lib/mondrian/olap/schema.rb:53-489``
element inventory, rendered/consumed by ``schema_element.rb:111-116
to_xml``; golden fixture ``test/fixtures/MondrianTest.xml``).

:func:`from_mondrian_xml` maps the XML schema elements onto this repo's
dataclasses:

================================  =====================================
XML element                        model mapping
================================  =====================================
``Schema``                         :class:`~.model.Schema`
shared ``Dimension``/``Hierarchy`` :class:`~.model.Dimension` — one per
                                   hierarchy; a 2nd+ hierarchy becomes
                                   its own dimension named
                                   ``Dim.HierarchyName`` (the engine's
                                   one-hierarchy-per-dimension shape,
                                   e.g. the Time.Weekly analog)
``Join``                           base ``table`` + ``JoinLink`` chain
``Level`` (+Property/Ordinal/      :class:`~.model.Level` — the GENERIC
``NameExpression`` SQL)            dialect SQL is taken (Spark SQL is
                                   the engine's only dialect)
``Cube``/``Table``                 :class:`~.model.Cube` + fact name
``DimensionUsage``                 :func:`~.model.dimension_usage`
``Measure`` (+MeasureExpression)   :class:`~.model.Measure`
``CalculatedMember``/``Formula``   :class:`~.model.CalculatedMember`
                                   (``[Measures].[X]`` references are
                                   rewritten to output aliases; other
                                   MDX constructs pass through verbatim
                                   and resolve — or fail loudly — when
                                   the member is actually used, the
                                   reference's lazy-evaluation contract)
``VirtualCube``                    :class:`VirtualCubeDef` descriptor
                                   (bind live engines with
                                   :func:`build_virtual_cube`)
``Role`` grants                    :class:`~.roles.Role` with
                                   Member/Hierarchy grants
``Parameter``                      :class:`~.model.Parameter`
================================  =====================================

``AggName``/``AggPattern`` physical aggregate tables import as
``Cube.aggregate_declarations`` and register with the engine's aggregate
routing at construction when the summary tables exist in the engine's
``tables`` map (schema.rb:374-414; ``AggFactCount`` is accepted but
unused — the routing never rolls up avg/distinct-count from summaries,
the only thing Mondrian needs the fact count for).

Deliberately out of scope (documented, loud where ambiguous): per-level
``table=`` attributes (the engine resolves level columns against the
JOINED dimension view by name) and closure tables (parent-child
hierarchies use :mod:`~mondrian_olap_spark.hierarchy`).
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass

from .model import (
    CalculatedMember,
    Cube,
    Dimension,
    JoinLink,
    Level,
    Measure,
    Parameter,
    Schema,
    dimension_usage,
)
from .roles import HierarchyGrant, MemberGrant, Role


@dataclass(frozen=True)
class VirtualCubeDef:
    """Parsed ``<VirtualCube>``: bind engines via :func:`build_virtual_cube`."""

    name: str
    #: (dimension name, source cube name or None = conformed-everywhere)
    dimensions: tuple[tuple[str, str | None], ...]
    #: (source cube name, measure name)
    measures: tuple[tuple[str, str], ...]


def _sql_text(parent: ET.Element, tag: str) -> str | None:
    """The GENERIC-dialect SQL of a ``<…Expression>`` child (falls back to
    the first ``<SQL>`` when no generic variant is declared)."""
    node = parent.find(tag)
    if node is None:
        return None
    generic = None
    first = None
    for sql in node.findall("SQL"):
        text = (sql.text or "").strip()
        if first is None:
            first = text
        if sql.get("dialect", "generic").lower() == "generic":
            generic = text
    return generic if generic is not None else first


def _parse_level(el: ET.Element) -> Level:
    props = tuple(
        (p.get("name"), p.get("column"))
        for p in el.findall("Property")
    )
    key = _sql_text(el, "KeyExpression") or el.get("column")
    if not key:
        raise ValueError(
            f"Level {el.get('name')!r} needs a column or KeyExpression"
        )
    return Level(
        el.get("name"),
        key,
        # lossless extension written by to_mondrian_xml (Mondrian
        # ignores unknown attributes)
        output=el.get("output"),
        ordinal=_sql_text(el, "OrdinalExpression") or el.get("ordinalColumn"),
        caption=_sql_text(el, "NameExpression")
        or _sql_text(el, "CaptionExpression")
        or el.get("captionColumn"),
        level_type=el.get("levelType"),
        properties=props,
        hide_member_if=(el.get("hideMemberIf") or None),
        description=el.get("description"),
    )


def _parse_join(el: ET.Element) -> tuple[str, tuple[JoinLink, ...]]:
    """``<Join leftKey rightKey>`` → (base table, link chain).  Nested
    joins (snowflakes deeper than two tables) recurse on the right side
    — schema.rb:169-174 nested Join semantics."""
    children = [c for c in el if c.tag in ("Table", "Join")]
    if len(children) != 2:
        raise ValueError("Join needs exactly two Table/Join children")
    left, right = children
    if left.tag != "Table":
        raise ValueError("Join left side must be a Table in this subset")
    base = left.get("name")
    if right.tag == "Table":
        links = (
            JoinLink(
                el.get("leftKey"), right.get("name"), el.get("rightKey"),
                alias=right.get("alias"),
            ),
        )
    else:
        inner_base, inner_links = _parse_join(right)
        links = (
            JoinLink(el.get("leftKey"), inner_base, el.get("rightKey")),
            *inner_links,
        )
    return base, links


def _parse_hierarchy(
    dim_el: ET.Element, hier: ET.Element, foreign_key: str | None
) -> Dimension:
    dim_name = dim_el.get("name")
    hier_name = hier.get("name")
    name = f"{dim_name}.{hier_name}" if hier_name else dim_name
    table = None
    joins: tuple[JoinLink, ...] = ()
    tnode = hier.find("Table")
    jnode = hier.find("Join")
    if jnode is not None:
        table, joins = _parse_join(jnode)
    elif tnode is not None:
        table = tnode.get("name")
    levels = tuple(_parse_level(lv) for lv in hier.findall("Level"))
    if not levels:
        raise ValueError(f"hierarchy {name!r} declares no levels")
    return Dimension(
        name=name,
        levels=levels,
        foreign_key=foreign_key,
        table=table,
        primary_key=hier.get("primaryKey"),
        joins=joins,
        has_all=(hier.get("hasAll", "true").lower() == "true"),
        caption=dim_el.get("caption"),
        description=dim_el.get("description"),
    )


def _parse_dimension(el: ET.Element, foreign_key: str | None) -> list[Dimension]:
    return [
        _parse_hierarchy(el, h, foreign_key)
        for h in el.findall("Hierarchy")
    ]


def _measure_refs_to_outs(formula: str, outs_by_name: dict[str, str]) -> str:
    """``[Measures].[X]`` / ``Measures.[X]`` / ``Measures.X`` → the
    measure's output alias.  Anything else passes through verbatim — it
    resolves (or fails loudly) when the member is used, matching the
    reference's lazy calc-member evaluation."""

    def repl(m: re.Match) -> str:
        name = (m.group(1) or m.group(2)).strip()
        return outs_by_name.get(name.lower(), m.group(0))

    # the Measures head must be either a COMPLETE bracketed segment or a
    # bare word with no identifier character (or ']') on its left —
    # '\[?Measures\]?' would match "Measures].[Foo]" INSIDE
    # '[GrossMeasures].[Foo]' and corrupt the formula when a measure
    # named Foo exists
    pat = re.compile(
        r"(?:\[Measures\]|(?<![\w\]])Measures\b)\s*\.\s*"
        r"(?:\[((?:[^\]]|\]\])+)\]|(\w+))",
        re.IGNORECASE,
    )
    return pat.sub(repl, formula)


def _parse_calculated_member(
    el: ET.Element, outs_by_name: dict[str, str], order: int
) -> CalculatedMember:
    if (el.get("dimension") or "Measures").lower() != "measures":
        raise ValueError(
            f"CalculatedMember {el.get('name')!r}: only the Measures "
            "dimension is supported in this subset (non-Measures calc "
            "members belong in WITH MEMBER query scope)"
        )
    formula = el.get("formula")
    if formula is None:
        fnode = el.find("Formula")
        formula = (fnode.text or "").strip() if fnode is not None else None
    if not formula:
        raise ValueError(f"CalculatedMember {el.get('name')!r} has no formula")
    fmt = None
    for p in el.findall("CalculatedMemberProperty"):
        if (p.get("name") or "").upper() == "FORMAT_STRING":
            fmt = p.get("value")
    return CalculatedMember(
        el.get("name"),
        _measure_refs_to_outs(formula, outs_by_name),
        format_string=fmt,
        # document order approximates Mondrian's implicit solve order —
        # later members may reference earlier ones
        solve_order=order,
    )


def _parse_measure(el: ET.Element) -> Measure:
    expr = _sql_text(el, "MeasureExpression") or el.get("column")
    if not expr:
        raise ValueError(
            f"Measure {el.get('name')!r} needs a column or MeasureExpression"
        )
    return Measure(
        el.get("name"),
        expr,
        aggregator=el.get("aggregator", "sum"),
        output=el.get("output"),
        format_string=el.get("formatString"),
        description=el.get("description"),
        caption=el.get("caption"),
    )


def _parse_cube(el: ET.Element, shared: dict[str, list[Dimension]]) -> Cube:
    fact_el = el.find("Table")
    if fact_el is None:
        raise ValueError(
            f"Cube {el.get('name')!r}: only <Table> facts are supported "
            "(register a temp view for <View> SQL facts and name it here)"
        )
    dims: list[Dimension] = []
    for child in el:
        if child.tag == "DimensionUsage":
            source = child.get("source")
            if source not in shared:
                raise ValueError(
                    f"Cube {el.get('name')!r}: DimensionUsage source "
                    f"{source!r} is not a shared dimension"
                )
            fk = child.get("foreignKey")
            for i, src in enumerate(shared[source]):
                # every hierarchy of the shared dimension binds; the first
                # keeps the usage name, extras keep their Dim.Hier names
                use_name = child.get("name") if i == 0 else src.name
                dims.append(
                    dimension_usage(
                        src, fk, name=use_name,
                        usage_prefix=child.get("usagePrefix"),
                    )
                )
        elif child.tag == "Dimension":
            dims.extend(_parse_dimension(child, child.get("foreignKey")))
    dims = _dedupe_outputs(dims)
    measures = [_parse_measure(m) for m in el.findall("Measure")]
    outs_by_name = {m.name.lower(): m.out for m in measures}
    calcs: list[CalculatedMember] = []
    dim_calcs: list[tuple[str, str, str]] = []
    for i, cm in enumerate(el.findall("CalculatedMember")):
        hier = cm.get("hierarchy") or cm.get("dimension") or "Measures"
        if hier.strip("[]").lower() != "measures":
            # non-Measures calculated member (schema.rb:314-341;
            # test/schema_definition_test.rb:570-591 hierarchy form):
            # kept as (name, hierarchy, formula) — MDX queries apply the
            # formula as a query-scoped dimension member at use time
            formula = cm.get("formula")
            if formula is None:
                fnode = cm.find("Formula")
                formula = (
                    (fnode.text or "").strip() if fnode is not None else None
                )
            if not formula:
                raise ValueError(
                    f"CalculatedMember {cm.get('name')!r} has no formula"
                )
            dim_calcs.append((cm.get("name"), hier, formula))
            continue
        calc = _parse_calculated_member(cm, outs_by_name, order=i)
        outs_by_name[calc.name.lower()] = calc.out
        calcs.append(calc)
    agg_decls: list[tuple] = []
    for agg in fact_el:
        if agg.tag not in ("AggName", "AggPattern"):
            continue
        # AggName/AggPattern → a routing declaration
        # (schema.rb:374-414; rendered forms
        # test/schema_definition_test.rb:627-775).  AggFactCount is
        # accepted but unused: the engine's routing never rolls up
        # avg/distinct-count from summaries, which is the only thing
        # Mondrian needs the fact count for.
        kind = "name" if agg.tag == "AggName" else "pattern"
        raw = agg.get("name") if kind == "name" else agg.get("pattern")
        lv_map: dict[str, str] = {}
        m_map: dict[str, str] = {}
        excludes: list[str] = []
        for c in agg:
            if c.tag == "AggLevel":
                lv_map[c.get("name")] = c.get("column")
            elif c.tag == "AggMeasure":
                # names arrive as '[Measures].[Store Cost]' — strip to
                # the bare measure name the model resolves
                name = c.get("name")
                segs = re.findall(r"\[((?:[^\]]|\]\])+)\]", name or "")
                m_map[(segs[-1] if segs else name).replace("]]", "]")] = (
                    c.get("column")
                )
            elif c.tag == "AggExclude":
                # name= (exact) or pattern= (regex) — Mondrian accepts
                # both forms (schema.rb:374-414)
                if c.get("name") is not None:
                    excludes.append(("name", c.get("name")))
                elif c.get("pattern") is not None:
                    excludes.append(("pattern", c.get("pattern")))
                else:
                    raise ValueError(
                        "AggExclude needs a name= or pattern= attribute"
                    )
        agg_decls.append(
            (
                kind,
                raw,
                tuple(lv_map.items()),
                tuple(m_map.items()),
                tuple(excludes),
            )
        )
    return Cube(
        name=el.get("name"),
        fact=fact_el.get("name"),
        dimensions=tuple(dims),
        measures=tuple(measures),
        calculated_members=tuple(calcs),
        dimension_calc_members=tuple(dim_calcs),
        aggregate_declarations=tuple(agg_decls),
        default_measure=el.get("defaultMeasure"),
        description=el.get("description"),
        caption=el.get("caption"),
    )


def _dedupe_outputs(dims: list[Dimension]) -> list[Dimension]:
    """Mondrian level names collide freely across hierarchies (Time.Year
    vs Time.Weekly.Year); the engine's grid needs distinct output columns
    — prefix a colliding level's output with its dimension slug (the
    DSL's o_year / w_year convention, derived instead of hand-picked)."""
    from dataclasses import replace

    from .model import _snake

    seen: set[str] = set()
    out: list[Dimension] = []
    for d in dims:
        levels = []
        changed = False
        prefix = _snake(d.name.replace(".", "_"))
        for lv in d.levels:
            o = lv.out
            if o in seen:
                o = f"{prefix}_{o}"
                levels.append(replace(lv, output=o))
                changed = True
            else:
                levels.append(lv)
            seen.add(o)
        out.append(replace(d, levels=tuple(levels)) if changed else d)
    return out


def _parse_role(el: ET.Element) -> Role:
    from .members import parse_identifier

    grants: list[MemberGrant] = []
    hgrants: list[HierarchyGrant] = []
    rollup = "partial"
    for sg in el.findall("SchemaGrant"):
        for cg in sg.findall("CubeGrant"):
            for hg in cg.findall("HierarchyGrant"):
                dim = parse_identifier(hg.get("hierarchy"))[0]
                policy = hg.get("rollupPolicy")
                if policy:
                    rollup = policy
                top, bottom = hg.get("topLevel"), hg.get("bottomLevel")
                if top or bottom:
                    hgrants.append(
                        HierarchyGrant(
                            dim,
                            top_level=(
                                parse_identifier(top)[-1] if top else None
                            ),
                            bottom_level=(
                                parse_identifier(bottom)[-1]
                                if bottom
                                else None
                            ),
                        )
                    )
                for mg in hg.findall("MemberGrant"):
                    segs = parse_identifier(mg.get("member"))
                    grants.append(
                        MemberGrant(
                            dimension=segs[0],
                            path=tuple(segs[1:]),
                            access=mg.get("access", "all"),
                        )
                    )
    return Role(
        name=el.get("name"),
        grants=tuple(grants),
        hierarchy_grants=tuple(hgrants),
        rollup_policy=rollup,
    )


def _parse_virtual_cube(el: ET.Element) -> VirtualCubeDef:
    from .members import parse_identifier

    dims = tuple(
        (d.get("name"), d.get("cubeName"))
        for d in el.findall("VirtualCubeDimension")
    )
    measures = []
    for m in el.findall("VirtualCubeMeasure"):
        segs = parse_identifier(m.get("name"))
        measures.append((m.get("cubeName"), segs[-1]))
    return VirtualCubeDef(el.get("name"), dims, tuple(measures))


def from_mondrian_xml(source: str):
    """Parse a Mondrian XML catalog into a :class:`~.model.Schema`.

    ``source`` is a file path or the XML text itself.  Returns
    ``(schema, virtual_cubes)`` where ``virtual_cubes`` is a tuple of
    :class:`VirtualCubeDef` descriptors (virtual cubes need live engines
    — bind them with :func:`build_virtual_cube`)."""
    if "<" in source:
        root = ET.fromstring(source)
    else:
        if not os.path.exists(source):
            raise FileNotFoundError(source)
        root = ET.parse(source).getroot()
    if root.tag != "Schema":
        raise ValueError(f"expected a <Schema> root, got <{root.tag}>")
    shared: dict[str, list[Dimension]] = {}
    shared_flat: list[Dimension] = []
    for d in root.findall("Dimension"):
        parsed = _parse_dimension(d, foreign_key=None)
        shared[d.get("name")] = parsed
        shared_flat.extend(parsed)
    cubes = tuple(_parse_cube(c, shared) for c in root.findall("Cube"))
    params = tuple(
        Parameter(
            p.get("name"),
            type=p.get("type", "String"),
            modifiable=(p.get("modifiable", "true").lower() == "true"),
            default_value=p.get("defaultValue"),
            description=p.get("description"),
        )
        for p in root.findall("Parameter")
    )
    roles = tuple(_parse_role(r) for r in root.findall("Role"))
    schema = Schema(
        name=root.get("name"),
        cubes=cubes,
        parameters=params,
        dimensions=tuple(shared_flat),
        roles=roles,
    )
    virtuals = tuple(
        _parse_virtual_cube(v) for v in root.findall("VirtualCube")
    )
    return schema, virtuals


def _level_to_xml(lv: Level, parent: ET.Element) -> None:
    el = ET.SubElement(parent, "Level", name=lv.name)
    if re.fullmatch(r"\w+", lv.column):
        el.set("column", lv.column)
    else:
        k = ET.SubElement(el, "KeyExpression")
        ET.SubElement(k, "SQL", dialect="generic").text = lv.column
    if lv.level_type:
        el.set("levelType", lv.level_type)
    if lv.hide_member_if:
        el.set("hideMemberIf", lv.hide_member_if)
    if lv.output:
        # lossless extension (unknown attributes are ignored by Mondrian;
        # read back by from_mondrian_xml so round-trips keep the engine's
        # output column names)
        el.set("output", lv.output)
    if lv.ordinal:
        o = ET.SubElement(el, "OrdinalExpression")
        ET.SubElement(o, "SQL", dialect="generic").text = lv.ordinal
    if lv.caption:
        n = ET.SubElement(el, "NameExpression")
        ET.SubElement(n, "SQL", dialect="generic").text = lv.caption
    for pname, pcol, _pf in lv.property_defs:
        # a Python property formatter has no XML serialization (Mondrian
        # would need a className); the raw column round-trips
        ET.SubElement(el, "Property", name=pname, column=pcol)


def _hierarchy_to_xml(d: Dimension, parent: ET.Element) -> None:
    h = ET.SubElement(
        parent, "Hierarchy", hasAll="true" if d.has_all else "false"
    )
    if "." in d.name:
        h.set("name", d.name.split(".", 1)[1])
    if d.primary_key:
        h.set("primaryKey", d.primary_key)
    if d.joins:
        # rebuild the nested <Join> chain right-deep, mirroring the parse
        def nest(base: str, links: tuple) -> ET.Element:
            j = ET.Element(
                "Join", leftKey=links[0].left_key, rightKey=links[0].right_key
            )
            ET.SubElement(j, "Table", name=base)
            if len(links) == 1:
                t = ET.SubElement(j, "Table", name=links[0].table)
                if links[0].alias:
                    t.set("alias", links[0].alias)
            else:
                j.append(nest(links[0].table, links[1:]))
            return j

        h.append(nest(d.table, d.joins))
    elif d.table:
        ET.SubElement(h, "Table", name=d.table)
    for lv in d.levels:
        _level_to_xml(lv, h)


def _outs_to_measure_refs(expr: str, names_by_out: dict[str, str]) -> str:
    """Inverse of :func:`_measure_refs_to_outs` for export: output aliases
    back to ``[Measures].[Name]`` references."""
    if not names_by_out:
        return expr
    pat = re.compile(
        r"\b(" + "|".join(re.escape(o) for o in names_by_out) + r")\b"
    )
    return pat.sub(lambda m: f"[Measures].[{names_by_out[m.group(1)]}]", expr)


def to_mondrian_xml(
    schema: Schema, virtual_cubes: tuple = ()
) -> str:
    """Render a :class:`~.model.Schema` as Mondrian XML — the inverse of
    :func:`from_mondrian_xml` and the Spark analog of the reference's
    ``schema_element.rb:111-116 to_xml``.  Round-trip contract:
    ``from_mondrian_xml(to_mondrian_xml(s))`` rebuilds an equivalent
    schema (engine answers match bit-for-bit; non-default output aliases
    ride a lossless ``output=`` extension attribute Mondrian ignores).

    Model features with no XML element — deterministic-decimal ``dtype``
    casts, cell formatters, locales, annotations — are deliberately not
    rendered; cube dimensions are emitted inline (the model does not
    record which were DimensionUsage bindings)."""
    root = ET.Element("Schema", name=schema.name)
    # group Dim.Hier siblings back into one <Dimension> element
    grouped: dict[str, list[Dimension]] = {}
    for d in schema.dimensions:
        grouped.setdefault(d.name.split(".", 1)[0], []).append(d)
    for base_name, ds in grouped.items():
        el = ET.SubElement(root, "Dimension", name=base_name)
        for d in ds:
            _hierarchy_to_xml(d, el)
    for p in schema.parameters:
        pe = ET.SubElement(
            root, "Parameter", name=p.name, type=p.type,
            modifiable="true" if p.modifiable else "false",
        )
        if p.default_value is not None:
            pe.set("defaultValue", str(p.default_value))
    for cube in schema.cubes:
        ce = ET.SubElement(root, "Cube", name=cube.name)
        if cube.default_measure:
            ce.set("defaultMeasure", cube.default_measure)
        te = ET.SubElement(ce, "Table", name=cube.fact)
        for kind, raw, lv_pairs, m_pairs, excludes in getattr(
            cube, "aggregate_declarations", ()
        ):
            if kind == "name":
                ae = ET.SubElement(te, "AggName", name=raw)
            else:
                ae = ET.SubElement(te, "AggPattern", pattern=raw)
            for mname, col in m_pairs:
                ET.SubElement(
                    ae, "AggMeasure", column=col,
                    name=f"[Measures].[{mname}]",
                )
            for ident, col in lv_pairs:
                ET.SubElement(ae, "AggLevel", column=col, name=ident)
            for k, x in excludes:
                ET.SubElement(ae, "AggExclude", **{k: x})
        cube_grouped: dict[str, list[Dimension]] = {}
        for d in cube.dimensions:
            cube_grouped.setdefault(d.name.split(".", 1)[0], []).append(d)
        for base_name, ds in cube_grouped.items():
            el = ET.SubElement(ce, "Dimension", name=base_name)
            if ds[0].foreign_key:
                el.set("foreignKey", ds[0].foreign_key)
            for d in ds:
                _hierarchy_to_xml(d, el)
        for m in cube.measures:
            me = ET.SubElement(
                ce, "Measure", name=m.name, aggregator=m.aggregator
            )
            if re.fullmatch(r"\w+", m.expression):
                me.set("column", m.expression)
            else:
                x = ET.SubElement(me, "MeasureExpression")
                ET.SubElement(x, "SQL", dialect="generic").text = m.expression
            if m.format_string:
                me.set("formatString", m.format_string)
            if m.output:
                me.set("output", m.output)
        names_by_out = {m.out: m.name for m in cube.measures}
        for c in cube.calculated_members:
            cme = ET.SubElement(
                ce, "CalculatedMember", name=c.name, dimension="Measures"
            )
            f = ET.SubElement(cme, "Formula")
            f.text = _outs_to_measure_refs(c.expression, names_by_out)
            names_by_out[c.out] = c.name
            if c.format_string:
                ET.SubElement(
                    cme, "CalculatedMemberProperty",
                    name="FORMAT_STRING", value=c.format_string,
                )
        for name, hier, formula in getattr(
            cube, "dimension_calc_members", ()
        ):
            dme = ET.SubElement(
                ce, "CalculatedMember", name=name, hierarchy=hier
            )
            ET.SubElement(dme, "Formula").text = formula
    for v in virtual_cubes:
        ve = ET.SubElement(root, "VirtualCube", name=v.name)
        for dname, cname in v.dimensions:
            de = ET.SubElement(ve, "VirtualCubeDimension", name=dname)
            if cname:
                de.set("cubeName", cname)
        for cname, mname in v.measures:
            ET.SubElement(
                ve, "VirtualCubeMeasure", cubeName=cname,
                name=f"[Measures].[{mname}]",
            )
    for r in schema.roles:
        re_ = ET.SubElement(root, "Role", name=r.name)
        sg = ET.SubElement(re_, "SchemaGrant", access="none")
        by_dim: dict[str, list] = {}
        for g in r.grants:
            by_dim.setdefault(g.dimension, []).append(g)
        for hg in r.hierarchy_grants:
            by_dim.setdefault(hg.dimension, [])
        cg = ET.SubElement(sg, "CubeGrant", access="all", cube="*")
        hbounds = {h.dimension: h for h in r.hierarchy_grants}
        for dim, gs in by_dim.items():
            he = ET.SubElement(
                cg, "HierarchyGrant", access="custom", hierarchy=f"[{dim}]"
            )
            if r.rollup_policy != "partial":
                he.set("rollupPolicy", r.rollup_policy)
            hb = hbounds.get(dim)
            if hb is not None:
                if hb.top_level:
                    he.set("topLevel", hb.top_level)
                if hb.bottom_level:
                    he.set("bottomLevel", hb.bottom_level)
            for g in gs:
                member = ".".join(f"[{s}]" for s in (g.dimension, *g.path))
                ET.SubElement(
                    he, "MemberGrant", access=g.access, member=member
                )
    ET.indent(root)
    return '<?xml version="1.0"?>\n' + ET.tostring(
        root, encoding="unicode"
    )


def build_virtual_cube(vdef: VirtualCubeDef, engines: dict):
    """Bind a parsed ``<VirtualCube>`` to live engines:
    ``engines`` maps cube name → :class:`~.star.CubeEngine`.  Returns a
    :class:`~.virtual.VirtualCube` (conformance is by level output
    column name, the engine's shared-dimension convention)."""
    from .virtual import CubeUsage, VirtualCube

    by_cube: dict[str, list[str]] = {}
    for cube_name, measure in vdef.measures:
        by_cube.setdefault(cube_name, []).append(measure)
    usages = []
    for cube_name, measure_names in by_cube.items():
        if cube_name not in engines:
            raise KeyError(
                f"virtual cube {vdef.name!r} needs an engine for cube "
                f"{cube_name!r}"
            )
        usages.append(
            CubeUsage(engines[cube_name], tuple(measure_names))
        )
    return VirtualCube(vdef.name, usages)
