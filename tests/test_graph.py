"""Fixed-point PageRank (operators.graph) — integer-deterministic
authority ranking for web-corpus curation."""

import pytest
from pyspark.sql import Row

from mondrian_olap_spark.operators import graph


def test_pagerank_star_graph(spark):
    """Everything points at 'hub' → hub outranks every spoke; spokes tie
    exactly (bit-deterministic integer arithmetic)."""
    edges = spark.createDataFrame(
        [Row(src=s, dst="hub") for s in ("a", "b", "c")]
        + [Row(src="hub", dst="a")]
    )
    r = {row.node: row.rank for row in graph.pagerank(edges, iterations=5).collect()}
    # hub collects every spoke's mass; a additionally receives hub's
    # whole outflow, so a sits between; b and c tie EXACTLY
    assert r["hub"] > r["a"] > r["b"] == r["c"]


def test_pagerank_cycle_is_uniform(spark):
    """A symmetric cycle converges to equal ranks — the sanity anchor."""
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="a")]
    )
    ranks = {r.node: r.rank for r in graph.pagerank(edges, iterations=8).collect()}
    assert len(set(ranks.values())) == 1


def test_pagerank_deterministic_across_layouts(spark):
    edges_rows = [
        Row(src=f"n{i % 7}", dst=f"n{(i * 3 + 1) % 7}") for i in range(40)
    ]
    e1 = spark.createDataFrame(edges_rows).repartition(1)
    e2 = spark.createDataFrame(edges_rows).repartition(13)
    r1 = sorted(tuple(r) for r in graph.pagerank(e1, iterations=6).collect())
    r2 = sorted(tuple(r) for r in graph.pagerank(e2, iterations=6).collect())
    assert r1 == r2  # bit-identical, not approximately


def test_pagerank_validates_params(spark):
    edges = spark.createDataFrame([Row(src="a", dst="b")])
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(edges, damping_permille=0)
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank(edges, iterations=0)


def test_session_transition_edges_gap_and_tiebreak(spark):
    from datetime import datetime

    ev = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=datetime(2024, 1, 1, 10, 0), event_type="A"),
            Row(event_id=2, user_id=1, ts=datetime(2024, 1, 1, 10, 5), event_type="B"),
            # > 30 min gap: session breaks, no edge B→C
            Row(event_id=3, user_id=1, ts=datetime(2024, 1, 1, 11, 0), event_type="C"),
            # simultaneous events order by the event_id tiebreak: C→D
            Row(event_id=4, user_id=1, ts=datetime(2024, 1, 1, 11, 0), event_type="D"),
            Row(event_id=5, user_id=2, ts=datetime(2024, 1, 1, 10, 0), event_type="X"),
        ]
    )
    edges = sorted(
        (r.src, r.dst)
        for r in graph.session_transition_edges(ev, gap_minutes=30).collect()
    )
    assert edges == [("A", "B"), ("C", "D")]


def test_pagerank_redistribute_dangling_conserves_mass(spark):
    """redistribute_dangling=True folds each iteration's dangling-node
    mass back uniformly: the rank sum stays within integer floor-
    division slack of `scale` (a probability-like share), where the
    default drops it.  Non-dangling-only graphs are unaffected."""
    # b and c are dangling (no out-edges): substantial mass to lose
    edges = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="a", dst="c"), Row(src="d", dst="a")]
    )
    scale = 10**12
    kept = graph.pagerank(
        edges, iterations=5, scale=scale, redistribute_dangling=True
    )
    dropped = graph.pagerank(edges, iterations=5, scale=scale)
    kept_sum = sum(r["rank"] for r in kept.collect())
    dropped_sum = sum(r["rank"] for r in dropped.collect())
    # floor-division slack: < n_nodes per div site per iteration
    assert abs(kept_sum - scale) < 5 * 4 * 3
    assert dropped_sum < kept_sum
    # ranking order is preserved under redistribution for this graph
    order = lambda df: [
        r["node"]
        for r in sorted(
            df.collect(), key=lambda x: (-x["rank"], x["node"])
        )
    ]
    assert order(kept) == order(dropped)
    # deterministic: two runs bit-identical
    kept2 = graph.pagerank(
        edges, iterations=5, scale=scale, redistribute_dangling=True
    )
    assert sorted(map(tuple, kept.collect())) == sorted(
        map(tuple, kept2.collect())
    )
    # no dangling nodes → option is a no-op
    ring = spark.createDataFrame(
        [Row(src="a", dst="b"), Row(src="b", dst="c"), Row(src="c", dst="a")]
    )
    assert sorted(
        map(tuple, graph.pagerank(ring, iterations=3).collect())
    ) == sorted(
        map(
            tuple,
            graph.pagerank(
                ring, iterations=3, redistribute_dangling=True
            ).collect(),
        )
    )
