"""Graph ranking over edge DataFrames (SURVEY.md pipeline extensions).

PageRank is the standard host/page authority signal in web-corpus
curation (Common Crawl host ranking feeds crawl prioritization and
quality filtering); this implementation is built for the repo's
hash-gate discipline: ALL arithmetic is integer fixed-point, so ranks
are bit-identical across shuffle orders, partition layouts, and engines
— a DuckDB oracle replays the iterations as unrolled SQL stages exactly
(the same trick as the BPE trainer and the quality perceptron).

Update rule per iteration (integer ops only, floor division):

    contrib(u→v) = r_u div outdeg(u)           (per edge occurrence)
    r'_v = (scale * (1000 - damping)) div (1000 * N)
           + (damping * Σ contribs into v) div 1000

Deviations from textbook PageRank, documented: by default dangling-node
mass is DROPPED rather than redistributed (ranks need not sum to
``scale``; the RANKING is what curation consumes) — pass
``redistribute_dangling=True`` for probability-like shares (one extra
scalar aggregate per iteration, still integer) — and parallel edges act
as integer weights (u→v listed twice contributes twice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_permille: int = 850,
    scale: int = 10**12,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Returns ``(node, rank, rank_share)`` — ``rank`` is the integer
    fixed-point score (bit-deterministic), ``rank_share`` the double
    ``rank/scale`` convenience.  Nodes = every id appearing as source OR
    destination.

    Scale shape: one groupBy for out-degrees, then per iteration one
    edge⋈ranks join + one destination groupBy (integer sums — map-side
    combined, order-free); ``localCheckpoint`` truncates lineage per
    iteration, the repo's iterative-join discipline.  O(iterations)
    rounds with no driver-side state beyond the loop counter.

    ``redistribute_dangling=True`` folds each iteration's dangling-node
    mass back uniformly (textbook behavior, rank_share ≈ a probability:
    the sum stays within integer floor-division slack of 1.0).  Cost: one
    scalar aggregate per iteration (the dangling ranks' sum — a single
    driver long, like ``n_nodes``).  Default False keeps the cheaper
    drop-the-mass behavior for ranking-only curation use.
    """
    if not (0 < damping_permille < 1000):
        raise ValueError("damping_permille must be in (0, 1000)")
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    e = edges.select(F.col(src).alias("__u"), F.col(dst).alias("__v"))
    nodes = (
        e.select(F.col("__u").alias("node"))
        .unionByName(e.select(F.col("__v").alias("node")))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()  # one scalar — the legitimate driver value
    outdeg = e.groupBy("__u").agg(F.count(F.lit(1)).alias("__deg"))
    ew = e.join(outdeg, "__u").localCheckpoint(eager=True)
    base = (scale * (1000 - damping_permille)) // (1000 * n_nodes)
    dangling = None
    if redistribute_dangling:
        dangling = nodes.join(
            outdeg.select(F.col("__u").alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(scale // n_nodes).cast("long"))
    for _ in range(iterations):
        contrib = (
            ew.join(ranks, ew["__u"] == ranks["node"])
            # `div` is true INTEGER division — a double quotient cast to
            # long can round UP across an integer boundary and diverge
            # from the oracle's exact integer arithmetic
            .select("__v", F.expr("rank div __deg").alias("__c"))
            .groupBy(F.col("__v").alias("node"))
            .agg(F.sum("__c").alias("__in"))
        )
        extra = 0
        if dangling is not None:
            dm = (
                ranks.join(dangling, "node", "semi")
                .agg(F.sum("rank"))
                .collect()[0][0]
            ) or 0
            # each node's uniform share of the damped dangling mass —
            # integer floor division, same determinism contract as base
            extra = (damping_permille * (int(dm) // n_nodes)) // 1000
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (
                    F.lit(base + extra)
                    + F.expr(
                        f"({damping_permille} * coalesce(__in, 0)) div 1000"
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(
        "node",
        "rank",
        (F.col("rank") / F.lit(float(scale))).alias("rank_share"),
    )


def session_transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    node_col: str = "event_type",
    order_tiebreak: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Directed transition edges from an event log: consecutive events of
    one user within ``gap_minutes`` form an edge ``(src, dst)`` between
    their ``node_col`` values — the user-journey graph whose PageRank
    ranks pages/hosts by navigational authority.  Tie-broken by
    ``order_tiebreak`` so simultaneous events order deterministically."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(order_tiebreak)
    )
    with_prev = events.select(
        F.lag(node_col).over(w).alias("src"),
        F.col(node_col).alias("dst"),
        (
            F.unix_timestamp(ts_col)
            - F.unix_timestamp(F.lag(ts_col).over(w))
        ).alias("__gap"),
    )
    return with_prev.filter(
        F.col("src").isNotNull() & (F.col("__gap") <= gap_minutes * 60)
    ).select("src", "dst")
