"""Identifier parsing tests — semantics from
/root/reference/lib/mondrian/olap/query.rb:409-414 (]] escapes) and
cube.rb member lookup."""

import pytest

from mondrian_olap_spark.members import (
    MemberParseError,
    format_name,
    parse_identifier,
    quote_segment,
    resolve,
)
from mondrian_olap_spark.tpch import SALES_CUBE


def test_parse_simple():
    assert parse_identifier("[Customer].[EUROPE]") == ["Customer", "EUROPE"]


def test_parse_escaped_bracket():
    # ]] escape — query.rb:409-414
    assert parse_identifier("[Cust]]omer].[A]") == ["Cust]omer", "A"]


def test_parse_bare_suffix():
    assert parse_identifier("[Customer].children") == ["Customer", "children"]


def test_parse_unterminated():
    with pytest.raises(MemberParseError):
        parse_identifier("[Customer")


def test_roundtrip_quote():
    assert quote_segment("A]B") == "[A]]B]"
    assert format_name(["Customer", "EU]R"]) == "[Customer].[EU]]R]"


def test_resolve_measure():
    ref = resolve(SALES_CUBE, "[Measures].[Sum Qty]")
    assert ref.name == "Sum Qty"


def test_resolve_unknown_measure():
    with pytest.raises(KeyError):
        resolve(SALES_CUBE, "[Measures].[Nope]")


def test_resolve_children_top():
    ref = resolve(SALES_CUBE, "[Customer].children")
    assert ref.depth == 0 and ref.path == () and ref.kind == "children"


def test_resolve_children_of_member():
    ref = resolve(SALES_CUBE, "[Customer].[EUROPE].children")
    assert ref.depth == 1 and ref.path == ("EUROPE",)


def test_resolve_level_members():
    ref = resolve(SALES_CUBE, "[Customer].[Nation].Members")
    assert ref.depth == 1 and ref.kind == "level_members"


def test_resolve_member_path():
    ref = resolve(SALES_CUBE, "[Time].[1995].[Q1]")
    assert ref.depth == 1 and ref.path == ("1995", "Q1")


def test_resolve_too_deep():
    with pytest.raises(MemberParseError):
        resolve(SALES_CUBE, "[ReturnFlag].[A].[B].[C]")


def test_format_ref_roundtrip():
    """format_ref is the inverse of resolve (SetToStr building block)."""
    from mondrian_olap_spark.members import format_ref, set_to_str, tuple_to_str

    for ident in (
        "[Customer].[EUROPE]",
        "[Customer].[EUROPE].[NATION_13]",
        "[Customer].[EUROPE].children",
        "[Customer].[Nation].Members",
    ):
        ref = resolve(SALES_CUBE, ident)
        assert resolve(SALES_CUBE, format_ref(ref)) == ref

    refs = [
        resolve(SALES_CUBE, "[Customer].[ASIA]"),
        resolve(SALES_CUBE, "[Customer].[EUROPE]"),
    ]
    assert set_to_str(refs) == "{[Customer].[ASIA], [Customer].[EUROPE]}"
    assert tuple_to_str(
        [resolve(SALES_CUBE, "[Customer].[ASIA]"), resolve(SALES_CUBE, "[Time].[1995]")]
    ) == "([Customer].[ASIA], [Time].[1995])"


def test_bracketed_keyword_keys_are_not_navigation():
    """A member key literally named [Children]/[Parent] must resolve as a
    KEY, not as the navigation keyword (quoting survives parsing)."""
    from mondrian_olap_spark.members import parse_identifier_tagged, resolve
    from mondrian_olap_spark.tpch import SALES_CUBE

    tagged = parse_identifier_tagged("[Customer].[Children].Children")
    assert tagged[1] == ("Children", True) and tagged[2] == ("Children", False)
    ref = resolve(SALES_CUBE, "[Customer].[Children].Children")
    # bracketed [Children] is a region KEY; bare .Children descends once
    assert ref.kind == "children" and ref.path == ("Children",) and ref.depth == 1
    ref2 = resolve(SALES_CUBE, "[Customer].[Children]")
    assert ref2.kind == "member" and ref2.path == ("Children",)


def test_trailing_dot_rejected():
    """Identifiers with a dangling separator raise (review fix: they
    silently resolved like the well-formed form)."""
    import pytest as _pytest

    from mondrian_olap_spark.members import MemberParseError, parse_identifier

    for bad in ("[Customer].[ASIA].", "A.", "[Customer]."):
        with _pytest.raises(MemberParseError, match="trailing"):
            parse_identifier(bad)
    assert parse_identifier("[Customer].[ASIA]") == ["Customer", "ASIA"]
