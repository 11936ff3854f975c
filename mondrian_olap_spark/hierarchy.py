"""Parent-child hierarchies: transitive closure + closure-based rollups
(SURVEY.md §7.4 hard item; reference ``parent_column`` /
``null_parent_value`` — ``lib/mondrian/olap/schema.rb:191-197``, fixture
``test/schema_definition_test.rb:777-818``).

Mondrian evaluates parent-child hierarchies by recursive member expansion
(or a pre-materialised closure table).  Spark (pre-4.0 recursive CTE) gets
the same capability from an **iterative distributed self-join**: each pass
extends every known ancestor→descendant path by one parent-child edge, with
per-iteration persist + lineage truncation so the plan doesn't grow
exponentially.  The closure then turns any parent-child rollup into a plain
``join + groupBy`` — the classic closure-table pattern, and the shape that
scales (closure size = Σ depth(n), bounded by depth × rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class HierarchyCycleError(RuntimeError):
    pass


def closure(
    edges: DataFrame,
    id_col: str,
    parent_col: str,
    max_depth: int = 32,
) -> DataFrame:
    """Transitive closure of a parent-child table.

    ``edges``: one row per member with its parent key (root members have a
    NULL / non-existent parent — ``null_parent_value`` semantics: filter
    before calling or leave dangling parents, both work).

    Returns (ancestor, descendant, depth): self-pairs at depth 0, direct
    children at depth 1, etc.  Raises :class:`HierarchyCycleError` if paths
    are still extending after ``max_depth`` iterations (a cycle — Mondrian
    would loop forever; we refuse).
    """
    members = edges.select(F.col(id_col).alias("k")).dropDuplicates()
    child_parent = edges.select(
        F.col(id_col).alias("c"), F.col(parent_col).alias("p")
    ).filter(F.col(parent_col).isNotNull())

    result = members.select(
        F.col("k").alias("ancestor"), F.col("k").alias("descendant"), F.lit(0).alias("depth")
    )
    # frontier: deepest known paths; extend one parent-child hop per round
    frontier = (
        child_parent.join(members, child_parent["p"] == members["k"], "left_semi")
        .select(F.col("p").alias("ancestor"), F.col("c").alias("descendant"))
        .withColumn("depth", F.lit(1))
    )
    depth = 1
    while True:
        frontier = frontier.persist()
        n = frontier.count()
        if n == 0:
            frontier.unpersist()  # nothing downstream reads the empty frame
            break
        result = result.unionByName(frontier)
        if depth > max_depth:
            # the check fires only when a frontier EXTENDS past max_depth —
            # a cycle-free chain of exactly max_depth levels completes (the
            # depth == max_depth frontier above was still consumed; its
            # extension being empty would have ended the loop)
            frontier.unpersist()
            raise HierarchyCycleError(
                f"hierarchy still extending after {max_depth} levels — cycle "
                "or max_depth too small"
            )
        # extend: (anc → desc) ⋈ (desc is parent of child) ⇒ (anc → child);
        # qualified aliases avoid Spark's ambiguous-self-join detection
        # (frontier initially derives from child_parent itself)
        fr, cp = frontier.alias("fr"), child_parent.alias("cp")
        nxt = fr.join(cp, F.col("fr.descendant") == F.col("cp.p")).select(
            F.col("fr.ancestor").alias("ancestor"),
            F.col("cp.c").alias("descendant"),
            (F.col("fr.depth") + 1).alias("depth"),
        )
        # break lineage: each iteration's plan must not embed all priors
        nxt = nxt.localCheckpoint(eager=True)
        frontier.unpersist()
        frontier = nxt
        depth += 1
    return result


def rollup_parent_child(
    fact: DataFrame,
    closure_df: DataFrame,
    fact_key: str,
    aggs: list,
) -> DataFrame:
    """Aggregate fact rows to every ancestor through the closure table:
    each ancestor's value includes all descendants (Mondrian parent-child
    member values roll up their subtree).

    ``aggs``: list of already-aliased aggregate Columns.
    """
    joined = fact.join(closure_df, fact[fact_key] == closure_df["descendant"])
    return joined.groupBy("ancestor").agg(*aggs)


def member_depths(closure_df: DataFrame) -> DataFrame:
    """Depth of each member = its distance from the farthest root ancestor."""
    return closure_df.groupBy(F.col("descendant").alias("member")).agg(
        F.max("depth").alias("level_depth")
    )
