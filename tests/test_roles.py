"""Role / access-control behavior — the reference's security suite shape
(/root/reference/test/connection_role_test.rb:101-184: member invisibility,
denied members, union roles; query_test.rb:1032-1057 drill-through rows)."""

import pytest

from mondrian_olap_spark.query import Query
from mondrian_olap_spark.roles import AccessDenied, MemberGrant, Role, union_roles


def _nations(eng):
    df = (
        Query(eng)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .execute()
        .df
    )
    return {r["region_name"] for r in df.collect()}


def test_grant_restricts_members_and_totals(engine):
    role = Role("asia", grants=(MemberGrant("Customer", ("ASIA",)),))
    eng = engine.with_role(role)
    assert _nations(eng) == {"ASIA"}
    # grand totals restricted too (rollup_policy partial)
    total = Query(eng).columns("[Measures].[Count Order]").execute().df.collect()[0]
    full = Query(engine).columns("[Measures].[Count Order]").execute().df.collect()[0]
    assert 0 < total["count_order"] < full["count_order"]


def test_base_engine_unaffected(engine):
    role = Role("asia", grants=(MemberGrant("Customer", ("ASIA",)),))
    engine.with_role(role)
    assert len(_nations(engine)) == 5


def test_deny_subpath(engine):
    nations = sorted(
        r["nation_name"]
        for r in engine.level_members("Customer", 1, ("ASIA",)).collect()
    )
    denied = nations[0]
    role = Role(
        "asia_minus_one",
        grants=(
            MemberGrant("Customer", ("ASIA",)),
            MemberGrant("Customer", ("ASIA", denied), access="none"),
        ),
    )
    eng = engine.with_role(role)
    df = (
        Query(eng)
        .columns("[Measures].[Sum Price]")
        .rows("[Customer].[Nation].Members")
        .execute()
        .df
    )
    seen = {r["nation_name"] for r in df.collect()}
    assert denied not in seen and len(seen) == len(nations) - 1


def test_measure_allow_list(engine):
    role = Role("limited", allowed_measures=("Sum Qty",))
    eng = engine.with_role(role)
    Query(eng).columns("[Measures].[Sum Qty]").execute()  # allowed
    with pytest.raises(AccessDenied):
        Query(eng).columns("[Measures].[Sum Price]").execute()


def test_union_roles(engine):
    asia = Role("asia", grants=(MemberGrant("Customer", ("ASIA",)),))
    europe = Role("europe", grants=(MemberGrant("Customer", ("EUROPE",)),))
    both = union_roles("asia_europe", asia, europe)
    assert _nations(engine.with_role(both)) == {"ASIA", "EUROPE"}


def test_role_filters_drill_through(engine):
    role = Role("asia", grants=(MemberGrant("Customer", ("ASIA",)),))
    eng = engine.with_role(role)
    df = eng.drill_through(
        where=["[Time].[1995]"],
        fields=[("region_name", "[Customer].[Region]"), ("qty", "l_quantity")],
        max_rows=5000,
    )
    assert {r["region_name"] for r in df.collect()} == {"ASIA"}


def test_rollup_policy_full(engine):
    """'full' rollup policy: member lists restricted, totals not
    (schema.rb rollup_policy)."""
    full_role = Role(
        "asia_full",
        grants=(MemberGrant("Customer", ("ASIA",)),),
        rollup_policy="full",
    )
    eng = engine.with_role(full_role)
    # grouped axis: only granted members visible
    assert _nations(eng) == {"ASIA"}
    # grand total without the dimension: unrestricted
    total = Query(eng).columns("[Measures].[Count Order]").execute().df.collect()[0]
    base = Query(engine).columns("[Measures].[Count Order]").execute().df.collect()[0]
    assert total["count_order"] == base["count_order"]
    # other-dimension rollups also unrestricted
    flags = Query(eng).columns("[Measures].[Count Order]").rows("[ReturnFlag].children").execute().df
    base_flags = Query(engine).columns("[Measures].[Count Order]").rows("[ReturnFlag].children").execute().df
    assert sorted(map(tuple, flags.collect())) == sorted(map(tuple, base_flags.collect()))


def test_rollup_policy_validation():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rollup_policy"):
        Role("bad", rollup_policy="hidden")


def test_full_policy_still_restricts_drill_through(engine):
    full_role = Role(
        "asia_full",
        grants=(MemberGrant("Customer", ("ASIA",)),),
        rollup_policy="full",
    )
    eng = engine.with_role(full_role)
    df = eng.drill_through(
        where=["[Time].[1995]"],
        fields=[("region_name", "[Customer].[Region]"), ("qty", "l_quantity")],
    )
    assert {r["region_name"] for r in df.collect()} == {"ASIA"}
