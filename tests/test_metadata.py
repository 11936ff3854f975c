"""Metadata & member introspection API — mirrors the reference's
test/cube_test.rb scenarios (cube → dimension → hierarchy → level → member
navigation) against the TPC-H engine."""

from mondrian_olap_spark.metadata import LevelMeta, MeasureMeta, MemberMeta


def test_cube_accessors(engine):
    md = engine.metadata()
    assert md.name == "Sales"
    assert md.visible and not md.virtual
    assert "Customer" in md.dimension_names
    assert md.dimension("customer").name == "Customer"  # case-insensitive
    assert md.dimension("NoSuch") is None
    assert "Sum Qty" in md.measure_names


def test_cube_display_metadata(engine):
    """description / caption / annotations accessors (cube_test.rb:93-104;
    annotations default to {} when unset — :165-168)."""
    md = engine.metadata()
    assert md.description == "TPC-H lineitem sales cube"
    assert md.caption == "Sales"  # falls back to name
    assert md.annotations == {"source": "tpch"}
    d = md.dimension("Customer")
    assert d.annotations == {} and d.caption == "Customer"
    lv = d.level("Nation")
    assert lv.annotations == {} and lv.caption == "Nation"


def test_schema_cube_names():
    from mondrian_olap_spark.tpch import SCHEMA

    assert "Sales" in SCHEMA.cube_names


def test_dimension_and_hierarchy_accessors(engine):
    d = engine.metadata().dimension("Customer")
    assert d.dimension_type == "STANDARD"
    assert d.hierarchies == [d.hierarchy]
    assert d.level_names == ["Region", "Nation", "Customer"]
    assert d.level("Nation").name == "Nation"
    assert d.level("NoSuch") is None
    t = engine.metadata().dimension("Time")
    assert t.dimension_type == "TIME"


def test_level_navigation(engine):
    d = engine.metadata().dimension("Customer")
    region = d.level("Region")
    assert region.parent_level is None
    assert region.child_level.name == "Nation"
    assert region.descendant_level("Customer").name == "Customer"
    assert region.descendant_level("Region") is None
    assert region.members_count == 5
    names = [m.name for m in region.members]
    assert names[0] == "AFRICA" and len(names) == 5


def test_member_lookup_and_children(engine):
    md = engine.metadata()
    m = md.member("[Customer].[ASIA]")
    assert isinstance(m, MemberMeta)
    assert m.name == "ASIA" and m.full_name == "[Customer].[ASIA]"
    assert m.level.name == "Region" and m.depth == 0
    assert m.drillable and not m.all_member and not m.calculated
    kids = m.children
    assert m.children_count == len(kids) == 5  # 5 nations per region
    assert all(k.depth == 1 for k in kids)
    assert md.member("[Customer].[NOPE]") is None
    assert md.member("[NoDim].[X]") is None


def test_member_descendants_and_leaf(engine):
    md = engine.metadata()
    m = md.member("[Customer].[ASIA]")
    custs = m.descendants_at_level("Customer")
    assert custs and all(c.depth == 2 for c in custs)
    # upper level relative to the member → empty (cube_test.rb:440-443)
    assert m.descendants_at_level("Region") == []
    leaf = custs[0]
    assert not leaf.drillable and leaf.children == [] and leaf.children_count == 0


def test_member_parent_and_siblings(engine):
    md = engine.metadata()
    m = md.member("[Customer].[ASIA].[NATION_13]")
    if m is None:  # nation names differ per sf — take any child
        m = md.member("[Customer].[ASIA]").children[0]
    p = m.parent
    assert p is not None and p.name == "ASIA" and p.depth == 0
    assert p.parent is None
    sibs = m.siblings
    assert m.name in [s.name for s in sibs]
    assert all(s.depth == m.depth for s in sibs)
    assert len(sibs) == p.children_count


def test_member_typed_keys(engine):
    """Non-string level keys (Time years are ints) resolve via string
    identifiers and keep their typed path."""
    m = engine.metadata().member("[Time].[1995]")
    assert m is not None and m.path == (1995,)
    quarters = [c.name for c in m.children]
    assert quarters == ["Q1", "Q2", "Q3", "Q4"]


def test_measure_members(engine):
    md = engine.metadata()
    meas = md.member("[Measures].[Sum Qty]")
    assert isinstance(meas, MeasureMeta)
    assert meas.dimension_type == "MEASURES" and not meas.calculated
    assert md.member("[Measures].[NoSuch]") is None


def test_member_property_value(engine):
    """Level properties surface per member (cube.rb:470-480)."""
    md = engine.metadata()
    parts = md.member("[Part].[Brand#11]")
    if parts is None:  # brand keys vary with sf — pick one that exists
        d = md.dimension("Part")
        parts = d.level("Brand").members[0]
    kids = parts.children
    assert kids  # parts under the brand exist
