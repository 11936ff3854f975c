"""Parent-child hierarchy tests (schema.rb:191-197 parent_column;
schema_definition_test.rb:777-818 employee/supervisor fixture shape)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mondrian_olap_spark.hierarchy import (
    HierarchyCycleError,
    closure,
    member_depths,
    rollup_parent_child,
)


@pytest.fixture(scope="module")
def org(spark):
    # CEO(1) -> VP(2), VP(3); VP(2) -> IC(4), IC(5); VP(3) -> IC(6)
    rows = [
        Row(emp_id=1, supervisor_id=None, salary=100.0),
        Row(emp_id=2, supervisor_id=1, salary=80.0),
        Row(emp_id=3, supervisor_id=1, salary=75.0),
        Row(emp_id=4, supervisor_id=2, salary=50.0),
        Row(emp_id=5, supervisor_id=2, salary=55.0),
        Row(emp_id=6, supervisor_id=3, salary=60.0),
    ]
    return spark.createDataFrame(rows)


def test_closure_contents(org):
    cl = {(r["ancestor"], r["descendant"]): r["depth"]
          for r in closure(org, "emp_id", "supervisor_id").collect()}
    assert cl[(1, 1)] == 0 and cl[(4, 4)] == 0          # self pairs
    assert cl[(1, 2)] == 1 and cl[(2, 4)] == 1          # direct edges
    assert cl[(1, 4)] == 2 and cl[(1, 6)] == 2          # transitive
    assert (4, 1) not in cl                              # no upward paths
    assert len(cl) == 6 + 5 + 3                          # 0,1,2-depth rows


def test_rollup_subtree_sums(org):
    cl = closure(org, "emp_id", "supervisor_id")
    out = {r["ancestor"]: r for r in rollup_parent_child(
        org, cl, "emp_id",
        [F.sum("salary").alias("total_salary"), F.count("*").alias("n")],
    ).collect()}
    assert out[1]["total_salary"] == 420.0 and out[1]["n"] == 6  # whole org
    assert out[2]["total_salary"] == 185.0 and out[2]["n"] == 3  # VP2 subtree
    assert out[4]["total_salary"] == 50.0 and out[4]["n"] == 1   # leaf


def test_member_depths(org):
    cl = closure(org, "emp_id", "supervisor_id")
    d = {r["member"]: r["level_depth"] for r in member_depths(cl).collect()}
    assert d[1] == 0 and d[2] == 1 and d[4] == 2


def test_cycle_detection(spark):
    rows = [Row(emp_id=1, supervisor_id=2), Row(emp_id=2, supervisor_id=1)]
    with pytest.raises(HierarchyCycleError):
        closure(spark.createDataFrame(rows), "emp_id", "supervisor_id", max_depth=5)


def test_dangling_parent_is_root(spark):
    # parent key not present in the member set (null_parent_value analog)
    rows = [Row(emp_id=10, supervisor_id=0), Row(emp_id=11, supervisor_id=10)]
    cl = {(r["ancestor"], r["descendant"]) for r in
          closure(spark.createDataFrame(rows), "emp_id", "supervisor_id").collect()}
    assert cl == {(10, 10), (11, 11), (10, 11)}


def test_closure_exact_max_depth_completes(spark):
    """A cycle-free chain of exactly max_depth levels completes (review
    fix: the cycle check fired one iteration early)."""
    from mondrian_olap_spark.hierarchy import HierarchyCycleError, closure

    # chain 1 <- 2 <- 3 <- 4: depth 3 (3 edges)
    df = spark.createDataFrame(
        [(1, None), (2, 1), (3, 2), (4, 3)], "k int, parent int"
    )
    out = closure(df, "k", "parent", max_depth=3)
    assert out.filter("depth = 3").count() == 1  # (1 -> 4)
    # a genuine cycle still raises
    cyc = spark.createDataFrame([(1, 2), (2, 1)], "k int, parent int")
    import pytest as _pytest

    with _pytest.raises(HierarchyCycleError):
        closure(cyc, "k", "parent", max_depth=3)
