"""Aggregate-table advisor: recommend which grains to materialize from an
observed query log — the design-automation step in front of
:meth:`star.CubeEngine.materialize_aggregate` / ``register_aggregate``
(the reference expects agg tables to be DECLARED, schema.rb:374-414;
Mondrian's own docs describe choosing them by hand from query patterns —
this computes the choice).

Model: a materialized grain C answers a query grain Q when every
(dimension, level) Q groups by appears in C at the same or deeper level
(the planner's routing rule — grouping ⊆ the summary's outputs, which
include ancestor level columns).  The benefit of C is the fact-scan work
it absorbs: ``freq(Q) × (1 − |C|/fact_rows)`` summed over the queries it
covers; its cost is its estimated row count.  Greedy selection by
benefit-per-row under a row budget — the classic knapsack heuristic for
view selection (Harinarayan/Rajaraman/Ullman, SIGMOD '96).

Grain cardinalities are estimated in ONE pass over the star-joined frame:
an ``approx_count_distinct`` of each grain's level-column struct, all as
aggregates of a single scan (HLL sketches — ±2-3%, exactly the precision
a sizing decision needs and nothing more).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import functions as F


def _normalize(engine, grain: list[str]) -> tuple[tuple[str, int], ...]:
    """Grain → canonical ((dim_name, depth), …), dimension-name sorted."""
    from .members import resolve_level

    out = {}
    for ref in grain:
        dim, idx = resolve_level(engine.cube, ref)
        out[dim.name] = max(out.get(dim.name, -1), idx)
    return tuple(sorted(out.items()))


def _covers(c: tuple, q: tuple) -> bool:
    """C answers Q iff every dim of Q appears in C at depth >= Q's."""
    cd = dict(c)
    return all(d in cd and cd[d] >= depth for d, depth in q)


def grain_cardinalities(
    engine, grains: list[tuple[tuple[str, int], ...]]
) -> tuple[dict, int]:
    """Estimated distinct-combination count per grain plus the fact row
    count — ONE aggregation job over the star-joined frame carrying the
    union of needed level columns (approx_count_distinct per grain)."""
    from .plan import Planner, _DimUse

    needed: dict[str, int] = {}
    for g in grains:
        for d, depth in g:
            needed[d] = max(needed.get(d, -1), depth)
    planner = Planner(engine)
    uses: dict[str, _DimUse] = {}
    for dname, depth in needed.items():
        dim = engine.cube.dimension(dname)
        u = uses.setdefault(dim.name, _DimUse(dim))
        if not dim.degenerate:
            u.add_levels([lv.out for lv in dim.levels[: depth + 1]])
    df = planner._join(uses)

    def outs(g) -> list[str]:
        cols = []
        for dname, depth in g:
            dim = engine.cube.dimension(dname)
            for lv in dim.levels[: depth + 1]:
                cols.append(
                    lv.out if not dim.degenerate else f"({lv.column})"
                )
        return cols

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, g in enumerate(grains):
        cols = [
            F.expr(c[1:-1]) if c.startswith("(") else F.col(c)
            for c in outs(g)
        ]
        aggs.append(
            F.approx_count_distinct(F.struct(*cols)).alias(f"__g{i}")
        )
    row = df.agg(*aggs).collect()[0]
    return (
        {g: int(row[f"__g{i}"]) for i, g in enumerate(grains)},
        int(row["__n"]),
    )


@dataclass
class Recommendation:
    levels: list[str]          #: materialize_aggregate-ready level refs
    est_rows: int              #: estimated summary cardinality
    queries_covered: int       #: log entries this grain answers
    benefit: float             #: fact-scan work absorbed (query-weighted)
    path: str | None = None    #: parquet location once auto-materialized


def recommend_aggregates(
    engine,
    query_log: list[list[str]],
    max_total_rows: int | None = None,
    top: int = 5,
    min_compression: float = 2.0,
) -> list[Recommendation]:
    """Pick materialization grains for ``query_log`` (each entry the level
    refs a query grouped by, e.g. ``["[Customer].[Nation]",
    "[Time].[Quarter]"]``).

    Candidates are the distinct logged grains; greedy selection by
    benefit-per-row, re-scoring after each pick (a chosen grain also
    covers every coarser logged grain, so their weight must not be
    double-counted).  ``max_total_rows`` bounds the summed summary sizes;
    grains compressing the fact by less than ``min_compression``× are
    dropped (a summary nearly as big as the fact just doubles storage).
    Returns at most ``top`` recommendations, ready to feed to
    :meth:`..star.CubeEngine.materialize_aggregate`.
    """
    if not query_log:
        return []
    norm = [_normalize(engine, g) for g in query_log]
    freq: dict = {}
    for g in norm:
        freq[g] = freq.get(g, 0) + 1
    candidates = list(freq)
    cards, fact_rows = grain_cardinalities(engine, candidates)
    budget = max_total_rows if max_total_rows is not None else float("inf")
    uncovered = dict(freq)
    picks: list[Recommendation] = []
    while len(picks) < top and uncovered:
        best, best_score = None, 0.0
        for c in candidates:
            rows = max(cards[c], 1)
            if rows > budget or fact_rows / rows < min_compression:
                continue
            benefit = sum(
                f * (1.0 - rows / max(fact_rows, 1))
                for q, f in uncovered.items()
                if _covers(c, q)
            )
            score = benefit / rows
            if score > best_score:
                best, best_score = c, score
        if best is None:
            break
        covered = [q for q in uncovered if _covers(best, q)]
        picks.append(
            Recommendation(
                levels=[
                    f"[{d}].[{engine.cube.dimension(d).levels[depth].name}]"
                    for d, depth in best
                ],
                est_rows=cards[best],
                queries_covered=sum(freq[q] for q in covered),
                benefit=round(
                    sum(
                        uncovered[q] * (1.0 - cards[best] / max(fact_rows, 1))
                        for q in covered
                    ),
                    3,
                ),
            )
        )
        budget -= cards[best]
        for q in covered:
            del uncovered[q]
        candidates = [c for c in candidates if c != best]
    return picks


def recommend_from_engine(
    engine,
    max_total_rows: int | None = None,
    top: int = 5,
    min_compression: float = 2.0,
) -> list[Recommendation]:
    """Advise from the engine's OWN query log: every executed query
    records its grain into a bounded ring buffer on the engine
    (``engine._query_log``), so after a warm-up period the advisor needs
    no external log at all — call this, feed the picks to
    ``materialize_aggregate``, and the routing layer serves the observed
    workload from summaries."""
    log = list(getattr(engine, "_query_log", ()))
    if not log:
        return []
    # _query_log entries are already normalized ((dim, depth), …) tuples —
    # shortcut _normalize by reconstructing level refs
    refs = [
        [
            f"[{d}].[{engine.cube.dimension(d).levels[depth].name}]"
            for d, depth in g
        ]
        for g in log
    ]
    return recommend_aggregates(
        engine, refs, max_total_rows=max_total_rows, top=top,
        min_compression=min_compression,
    )


def auto_materialize(
    engine,
    query_log: list[list[str]] | None = None,
    max_total_rows: int | None = None,
    top: int = 5,
    min_compression: float = 2.0,
    path_prefix: str | None = None,
    measures: list[str] | None = None,
) -> list[Recommendation]:
    """Close the advisor → materialize → route loop in ONE call: advise
    from ``query_log`` (or the engine's own ring buffer when omitted),
    build each recommended summary via
    :meth:`..star.CubeEngine.materialize_aggregate`, and register it with
    the planner's routing layer — after this returns, every covered query
    is served from summaries with zero fact scans.

    ``path_prefix`` persists each summary as parquet under
    ``{path_prefix}/agg_<i>_<grain>`` so a NEW session can re-register
    them (``spark.read.parquet`` + ``register_aggregate``) without
    re-aggregating the fact — the cross-session half of the loop; omitted,
    summaries live as lineage-truncated checkpoints for this session only.
    ``measures`` restricts the carried measures (default: every
    roll-up-safe base measure).  Returns the recommendations actually
    materialized, each carrying its storage ``path`` (None = in-session).
    """
    import re

    if query_log is None:
        recs = recommend_from_engine(
            engine, max_total_rows=max_total_rows, top=top,
            min_compression=min_compression,
        )
    else:
        recs = recommend_aggregates(
            engine, query_log, max_total_rows=max_total_rows, top=top,
            min_compression=min_compression,
        )
    # derive the path index from any EXISTING manifest so a second
    # auto_materialize run against the same prefix (periodic re-advising
    # with a changed workload) extends it instead of colliding with —
    # and then dropping — the first run's summaries
    next_idx = _next_agg_index(
        _read_agg_manifest(engine.fact.sparkSession, path_prefix)
    ) if path_prefix is not None else 0
    for i, rec in enumerate(recs):
        if path_prefix is not None:
            slug = "_".join(
                re.sub(r"[^A-Za-z0-9]+", "", ref).lower() for ref in rec.levels
            )
            rec.path = (
                f"{path_prefix.rstrip('/')}/agg_{next_idx + i:02d}_{slug}"
            )
        engine.materialize_aggregate(
            rec.levels, measures=measures, path=rec.path
        )
    if path_prefix is not None and recs:
        _write_agg_manifest(engine, recs, path_prefix, measures)
    return recs


def _manifest_path(path_prefix: str) -> str:
    return f"{path_prefix.rstrip('/')}/_agg_manifest.json"


def _read_agg_manifest(spark, path_prefix: str) -> dict | None:
    """Read the manifest through the Hadoop FileSystem API (fsio) so a
    path_prefix on HDFS/object storage works exactly like a local one —
    sidecar artifacts must live where the summary parquet lives."""
    import json

    from . import fsio

    p = _manifest_path(path_prefix)
    if not fsio.exists(spark, p):
        return None
    return json.loads(fsio.read_text(spark, p))


def _next_agg_index(manifest: dict | None) -> int:
    """First unused ``agg_<i>_`` path index in an existing manifest (0
    for none) — path slugs depend only on level names, so two runs that
    recommend different grains with colliding slugs must diverge on the
    index."""
    import re

    idx = -1
    for e in (manifest or {}).get("aggregates", ()):
        m = re.search(r"(?:^|/)agg_(\d+)_", e.get("path") or "")
        if m:
            idx = max(idx, int(m.group(1)))
    return idx + 1


def _write_agg_manifest(
    engine, recs: list[Recommendation], path_prefix: str,
    measures: list[str] | None,
) -> None:
    """Persist the registration recipe next to the summaries
    (``_agg_manifest.json`` — the ``_`` prefix keeps it out of parquet
    data discovery) so :func:`load_materialized` can re-register them in
    a fresh session without re-deriving anything from the cube.

    MERGES into any existing manifest, keyed by group-output set (the
    same key :meth:`..star.CubeEngine._update_agg_manifest` uses): a
    later run's entry for the same grain replaces the earlier one (its
    path points at the newer parquet); grains only the earlier run
    produced are preserved, so periodic re-advising never drops
    previously persisted summaries from ``load_materialized``'s view."""
    import json

    from .model import CalculatedMember
    from .star import _ROLLUP_SAFE

    if measures is None:
        ms = [
            m for m in engine.cube.measures
            if not isinstance(m, CalculatedMember)
            and m.aggregator in _ROLLUP_SAFE
        ]
    else:
        ms = [engine.cube.measure(n) for n in measures]
    entries = []
    for rec in recs:
        from .members import resolve_level

        group_outputs: list[str] = []
        for ident in rec.levels:
            dim, idx = resolve_level(engine.cube, ident)
            for lv in dim.levels[: idx + 1]:
                if lv.out not in group_outputs:
                    group_outputs.append(lv.out)
        entries.append(
            {
                "path": rec.path,
                "levels": rec.levels,
                "group_outputs": group_outputs,
                "measures": {m.out: m.aggregator for m in ms},
                "est_rows": rec.est_rows,
            }
        )
    existing = _read_agg_manifest(engine.fact.sparkSession, path_prefix)
    if existing is not None and existing.get("cube") == engine.cube.name:
        new_grains = {frozenset(e["group_outputs"]) for e in entries}
        kept = [
            e for e in existing.get("aggregates", ())
            if frozenset(e["group_outputs"]) not in new_grains
        ]
        entries = kept + entries
    from . import fsio

    fsio.write_text(
        engine.fact.sparkSession, _manifest_path(path_prefix),
        json.dumps({"cube": engine.cube.name, "aggregates": entries},
                   indent=2),
    )


def load_materialized(engine, path_prefix: str) -> int:
    """Re-register summaries persisted by a previous session's
    :func:`auto_materialize` (the cross-session half of the loop): read
    ``_agg_manifest.json`` under ``path_prefix`` and
    ``register_aggregate`` each summary parquet — no fact scan, no
    re-aggregation.  Returns the number of summaries registered."""
    import json

    from . import fsio

    spark = engine.fact.sparkSession
    manifest_path = _manifest_path(path_prefix)
    if not fsio.exists(spark, manifest_path):
        raise FileNotFoundError(manifest_path)
    manifest = json.loads(fsio.read_text(spark, manifest_path))
    if manifest.get("cube") != engine.cube.name:
        raise ValueError(
            f"manifest at {manifest_path} was written for cube "
            f"{manifest.get('cube')!r}, not {engine.cube.name!r}"
        )
    n = 0
    for entry in manifest["aggregates"]:
        df = spark.read.parquet(entry["path"])
        engine.register_aggregate(
            df, entry["group_outputs"], entry["measures"]
        )
        n += 1
    return n
