"""Event-log analytics operators: as-of join, ordered funnel, retention
cohorts.

These cover the "interaction log → training signal" steps of a data
pipeline (attribute an outcome event to its most recent cause, measure
step-through conversion, cohort users by first activity) that the
reference's relational surface expresses with correlated subqueries; here
each is a shuffle-minimal DataFrame plan.

Design for 100 TB:

* :func:`asof_join` is the union+sort pattern, NOT a range join: tag both
  sides, union, one window partitioned by the key, carry the last right-
  side row forward with ``last(..., ignorenulls)``.  One shuffle on the
  key, sequential scan within each key — a range join would build
  O(|left|x|right|) candidate pairs per key before filtering, this never
  materialises any pair.  Skewed keys (one user with millions of events)
  serialize within the key by definition of as-of ordering; salt by
  coarse time bucket if a single key exceeds a task (matches must then
  look back one bucket — duplicate right rows into the next bucket).
* :func:`funnel_counts` is k passes of filtered aggregate + join for a
  k-step funnel — each pass shuffles only the users still alive in the
  funnel (monotonically shrinking), and the per-step event filter is
  pushed into the scan.  No per-user arrays are ever collected, so a
  power user with 10^8 events costs the same as anyone else.
* :func:`retention_cohorts` is two grouped passes (first-activity per
  user, then cohort x offset distinct users) — both shuffle on user_id
  first, so AQE coalesces them into adjacent stages over the same
  partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance: str | int | float | None = None,
) -> DataFrame:
    """As-of join: each left row picks the single nearest right row with
    the same ``key`` — ``direction="backward"`` (default) takes the most
    recent ``right.ts <= left.ts`` (DuckDB / kdb ``ASOF JOIN``
    semantics), ``"forward"`` the earliest ``right.ts >= left.ts``; ties
    inclusive either way.  Left rows with no qualifying right row keep
    NULLs.

    ``tolerance`` bounds the match horizon (pandas ``merge_asof``
    parity): a SQL expression string (``"INTERVAL 30 MINUTES"`` for
    timestamps) or a number (numeric ts columns).  A match farther than
    the horizon reads as no-match (NULLs) — applied as a projection on
    the carried values, no extra shuffle.

    Implementation: tag + union + one window per key ordered by
    (ts, side) — descending for forward — with the right side sorting
    first at equal timestamps, then ``last(value, ignorenulls=True)``
    carries the nearest right-side values onto every left row.  One
    shuffle, zero joins, no candidate pairs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in (key, right_ts)
        ]
    out_cols = [f"{c}{suffix}" for c in value_cols]
    ts_out = f"{right_ts}{suffix}"

    lhs = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__row"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    F.col(right_ts).alias("__rts"),
                    *[F.col(c) for c in value_cols],
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__rvals"),
    )
    # a NULL right timestamp can never satisfy "most recent ≤ left.ts"
    # (ASOF comparison semantics); unfiltered it would sort NULLS FIRST
    # and leak into every left row of its key.  A NULL right KEY likewise
    # never equals any left key (SQL join equality, not GROUP BY
    # semantics) — unfiltered, the window's partitionBy would group NULL
    # keys together and match NULL-key left rows against NULL-key right
    # rows.  NULL-key LEFT rows stay (left-outer): their partition holds
    # no right rows after this filter, so they keep NULLs.
    rhs = right.filter(
        F.col(right_ts).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in value_cols],
        ).alias("__rvals"),
    )
    # NULL left timestamps must see NO right rows: ascending (backward)
    # puts NULLS FIRST by default; descending (forward) defaults to
    # NULLS LAST, which would carry the smallest right ts onto every
    # NULL-ts left row — order them first explicitly
    order = (
        [F.col("__ts"), F.col("__side")]
        if direction == "backward"
        else [F.col("__ts").desc_nulls_first(), F.col("__side")]
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lhs.unionByName(rhs).withColumn(
        "__last", F.last("__rvals", ignorenulls=True).over(w)
    )
    picked = merged.filter(F.col("__side") == 1)
    if tolerance is not None:
        delta = (
            F.expr(tolerance) if isinstance(tolerance, str) else F.lit(tolerance)
        )
        ok = (
            F.col("__last.__rts") >= (F.col("__ts") - delta)
            if direction == "backward"
            else F.col("__last.__rts") <= (F.col("__ts") + delta)
        )
        picked = picked.withColumn("__last", F.when(ok, F.col("__last")))
    sel: list[Column] = [
        F.col(f"__row.{c}").alias(c) for c in left.columns
    ]
    sel.append(F.col("__last.__rts").alias(ts_out))
    sel.extend(
        F.col(f"__last.{c}").alias(o) for c, o in zip(value_cols, out_cols)
    )
    return picked.select(*sel)


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per step, how many users reached it — a user
    reaches step i when an event of type ``steps[i]`` occurs strictly
    after their step i-1 completion (earliest-completion semantics:
    step i's timestamp is the EARLIEST qualifying one, which maximises
    downstream conversion and is the standard product-analytics
    definition).

    Returns one row per step: (step_idx, step, n_users) with
    monotonically non-increasing ``n_users``.
    """
    if not steps:
        raise ValueError("funnel_counts needs at least one step")
    # a NULL timestamp can never order against the previous step's
    # completion — unfiltered, an all-NULL-ts user would count as
    # reaching step 1 at an unknown time
    events = events.filter(F.col(ts_col).isNotNull())
    reached = None  # DataFrame[user, __t] — completion time of prev step
    counts = []
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("__u"), F.col(ts_col).alias("__ts")
        )
        if reached is None:
            cur = ev.groupBy("__u").agg(F.min("__ts").alias("__t"))
        else:
            cur = (
                ev.join(reached, "__u")
                .filter(F.col("__ts") > F.col("__t"))
                .groupBy("__u")
                .agg(F.min("__ts").alias("__t"))
            )
        counts.append((i + 1, step, cur))
        reached = cur
    result = None
    for idx, step, cur in counts:
        row = cur.agg(
            F.lit(idx).alias("step_idx"),
            F.lit(step).alias("step"),
            F.count("*").alias("n_users"),
        )
        result = row if result is None else result.unionByName(row)
    return result


def parse_props(
    events: DataFrame,
    fields: dict[str, str],
    props_col: str = "props",
) -> DataFrame:
    """Extract typed fields from a JSON properties column (the
    semi-structured tail every event log carries; reference surfaces it
    through drill-through property columns).

    ``fields`` maps output column name → Spark DDL type (``{"k": "int"}``).
    The schema is EXPLICIT and the extraction is one ``from_json`` per row
    inside whole-stage codegen — never ``schema_of_json`` or
    ``spark.read.json`` inference, both of which run a driver-side sampling
    job over the corpus and pin the inferred schema to whatever batch it
    sampled.  Malformed JSON yields NULL fields (PERMISSIVE), so one bad
    event cannot fail a 100 TB scan.
    """
    if not fields:
        raise ValueError("parse_props needs at least one field")
    ddl = ", ".join(f"`{name}` {typ}" for name, typ in fields.items())
    parsed = events.withColumn("__p", F.from_json(F.col(props_col), ddl))
    out = parsed.select(
        *[c for c in events.columns],
        *[F.col(f"__p.{name}").alias(name) for name in fields],
    )
    return out


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users are cohorted by the period of
    their first event; for each (cohort, offset) the count of distinct
    users active in cohort+offset.

    ``period``: any ``date_trunc`` unit (``week``/``month``/``day``).
    Offsets are exact period counts for day/week (day arithmetic) and
    calendar-month differences for month.
    """
    act = events.select(
        F.col(user_col).alias("__u"),
        F.date_trunc(period, F.col(ts_col)).cast("date").alias("__p"),
    ).distinct()
    first = act.groupBy("__u").agg(F.min("__p").alias("cohort"))
    joined = act.join(first, "__u")
    if period == "month":
        offset = (
            (F.year("__p") - F.year("cohort")) * 12
            + (F.month("__p") - F.month("cohort"))
        ).cast("bigint")
    else:
        days = {"day": 1, "week": 7}[period]
        offset = (F.datediff("__p", "cohort") / days).cast("bigint")
    return (
        joined.select("__u", "cohort", offset.alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.countDistinct("__u").alias("n_users"))
    )


def daily_anomaly(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    window_days: int = 7,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Volume-anomaly detection over the event feed: per key and day, the
    z-score of today's event count against the TRAILING ``window_days``
    baseline — the ingest-monitoring primitive that catches an upstream
    collector dying (count collapses) or a crawler loop (count explodes)
    before the corrupted day reaches training data.

    Returns ``(key, day, n_events, baseline_days, baseline_mean, z_score,
    is_anomaly)``.  The first days of a key have a short (or empty)
    baseline: z_score is NULL until two baseline days exist and while the
    baseline variance is 0, and ``is_anomaly`` is false for NULL z.

    Determinism across engines: mean and variance come from INTEGER sums
    over the window (``Σx``, ``Σx²``, ``n`` — sample variance
    ``(Σx² − (Σx)²/n)/(n−1)``), so the only floating-point steps are two
    final divisions and a sqrt — bit-identical in Spark and DuckDB, which
    disagree on incremental stddev algorithms but not on this.  Scale
    shape: one groupBy (key, day) — counts collapse map-side — then
    windows over the tiny daily series; a RANGE frame on the epoch-day
    index keeps gap days out of the baseline correctly.
    """
    day = F.to_date(F.col(ts_col))
    daily = (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"), day.alias("day"))
        .agg(F.count("*").alias("n_events"))
        .withColumn("__di", F.datediff(F.col("day"), F.lit("1970-01-01")))
    )
    w = (
        Window.partitionBy("key")
        .orderBy("__di")
        .rangeBetween(-window_days, -1)
    )
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    n = F.count("n_events").over(w)
    mean = s1.cast("double") / n.cast("double")
    var = (
        (s2.cast("double") - s1.cast("double") * s1.cast("double") / n.cast("double"))
        / (n.cast("double") - 1.0)
    )
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    out = daily.select(
        "key",
        "day",
        "n_events",
        F.coalesce(n, F.lit(0)).alias("baseline_days"),
        F.round(mean, 6).alias("baseline_mean"),
        F.when((n >= 2) & (var > 0), F.round(z, 6)).alias("z_score"),
    ).withColumn(
        "is_anomaly",
        F.coalesce(F.abs(F.col("z_score")) > z_threshold, F.lit(False)),
    )
    return out


def user_sequences(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    token_col: str = "event_type",
    max_len: int = 64,
) -> DataFrame:
    """Per-user ordered event sequences — the behavioral-sequence export a
    sequence model trains on: every user's events sorted by time (ties
    broken by event_id, so the order is total and reproducible), truncated
    to the FIRST ``max_len`` events, joined into one token string.

    Returns ``(user_id, n_events, seq, seq_hash)`` where ``seq`` is the
    '->'-joined token string of the first ``max_len`` events and
    ``seq_hash`` its md5 (the compact equality handle for downstream
    dedup/splits — hash-stable across engines by construction).

    Scale shape: ONE user-keyed aggregation; ordering happens inside the
    aggregated array (``sort_array`` on (ts, tiebreak, token) structs),
    never as a global sort.  Users with pathological event counts bound
    the per-group array — cap upstream with a window filter if a single
    user can exceed executor memory (the key_skew_profile diagnostic
    names such keys).
    """
    tiebreak = "event_id" if "event_id" in events.columns else token_col
    evs = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                F.col(tiebreak).alias("tb"),
                F.col(token_col).alias("tok"),
            )
        )
    )
    seq = F.concat_ws(
        "->", F.transform(F.slice(evs, 1, max_len), lambda x: x["tok"])
    )
    return (
        events.where(F.col(ts_col).isNotNull())
        .groupBy(F.col(user_col).alias("user_id"))
        .agg(F.count("*").alias("n_events"), seq.alias("seq"))
        .select("user_id", "n_events", "seq", F.md5("seq").alias("seq_hash"))
    )


def inter_event_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user inter-event gap distribution — the engagement/dwell
    profile (and the empirical input to a sessionization gap threshold:
    pick the knee of these quantiles instead of guessing 30 minutes).

    Returns ``(user_id, n_events, n_gaps, median_gap_s, p90_gap_s,
    max_gap_s)`` with gaps in integer microsecond-exact seconds
    (``DOUBLE`` after the division).  Quantiles are TYPE-1 (inverse
    ECDF): an actual element of the sorted gap list picked by pure
    INTEGER index arithmetic (``ceil(p·n)`` as ``(p_num·n + p_den − 1)
    div p_den``) — no interpolation, because a float index product like
    ``0.9·n`` can land a last-ulp apart across engines and flip the
    picked element at exact decile boundaries.  One user-keyed shuffle
    total (the lag window and the aggregation share the partitioning);
    per-user event counts bound the array, the :func:`user_sequences`
    contract.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        events.where(F.col(ts_col).isNotNull())
        .withColumn("__us", micros)
        .withColumn("__prev", F.lag("__us").over(w))
        .withColumn(
            "__gap_s",
            F.when(
                F.col("__prev").isNotNull(),
                (F.col("__us") - F.col("__prev")).cast("double") / 1e6,
            ),
        )
    )

    def q(sorted_col, p_num: int, p_den: int):
        # type-1 quantile: element at 1-based index ceil(p·n), computed
        # as an integer ceil-division — no float index arithmetic
        n = F.size(sorted_col)
        idx = F.expr(
            f"cast(({p_num} * size(__gaps) + {p_den} - 1) "
            f"div {p_den} as int)"
        )
        return F.element_at(sorted_col, F.greatest(idx, F.lit(1)))

    agg = gaps.groupBy(F.col(user_col).alias("user_id")).agg(
        F.count("*").alias("n_events"),
        F.sort_array(
            F.collect_list("__gap_s")
        ).alias("__gaps"),
    )
    has = F.size("__gaps") > 0
    return agg.select(
        "user_id",
        "n_events",
        F.size("__gaps").cast("long").alias("n_gaps"),
        F.when(has, q(F.col("__gaps"), 1, 2)).alias("median_gap_s"),
        F.when(has, q(F.col("__gaps"), 9, 10)).alias("p90_gap_s"),
        F.when(has, F.element_at("__gaps", -1)).alias("max_gap_s"),
    )


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: list[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time enrichment against a slowly-changing (SCD Type-2)
    dimension: each fact row picks the dimension VERSION in effect at its
    timestamp — the version with the latest ``valid_from <= ts`` whose
    ``valid_to`` (EXCLUSIVE; NULL = current open version) has not yet
    passed.  Facts falling in a coverage gap (between one version's end
    and the next version's start) or before the first version read NULL
    attributes — never the stale neighbor, the classic SCD2 join bug.

    Implementation: :func:`asof_join` on ``valid_from`` (tag + union +
    ONE window per key — one shuffle, zero join operators, so a hot
    dimension key never builds candidate pairs), with the version's
    ``valid_to`` carried alongside and the expiry check applied as a
    projection.  This is the scalable alternative to the non-equi
    ``BETWEEN`` join, which Spark can only execute as a broadcast
    nested loop (fine for broadcastable dims, quadratic pain otherwise).
    """
    vc = value_cols or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    joined = asof_join(
        facts,
        dim.select(key, F.col(valid_from).alias("__vf"),
                   F.col(valid_to).alias("__vto"), *vc),
        key=key,
        left_ts=fact_ts,
        right_ts="__vf",
        value_cols=["__vto", *vc],
        suffix=suffix,
    )
    expired = F.col(f"__vto{suffix}").isNotNull() & (
        F.col(fact_ts) >= F.col(f"__vto{suffix}")
    )
    out = joined
    for c in vc:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(expired, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
        )
    return out.drop(f"__vto{suffix}", f"__vf{suffix}")


def scd2_enrich_stream(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    value_cols: list[str] | None = None,
    suffix: str = "_dim",
) -> DataFrame:
    """STREAMING form of :func:`scd2_enrich`: the union+window as-of is
    not expressible on an append stream (no unbounded windows), so the
    version is resolved with a stream-static LEFT join against the
    BROADCAST dimension on ``key AND valid_from <= ts AND (valid_to IS
    NULL OR ts < valid_to)`` — stateless, append-safe, and the right
    tool precisely because an SCD dimension is bounded (it broadcasts).

    PRECONDITION: version validity ranges must not overlap per key.
    Then at most one version matches per fact row, the join cannot fan
    out, and the output matches :func:`scd2_enrich` row-for-row (the
    unit suite pins the pair equal on such dimensions).  On a DIRTY
    dimension with overlapping ranges this range join emits one row per
    matching version while the batch as-of picks exactly one — run
    :func:`scd2_validate_dim` first when provenance is uncertain."""
    vc = value_cols or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    d = F.broadcast(
        dim.select(
            F.col(key).alias("__k"),
            F.col(valid_from).alias("__vf"),
            F.col(valid_to).alias("__vto"),
            *[F.col(c).alias(f"{c}{suffix}") for c in vc],
        )
    )
    cond = (
        (facts[key] == d["__k"])
        & (d["__vf"] <= facts[fact_ts])
        & (d["__vto"].isNull() | (facts[fact_ts] < d["__vto"]))
    )
    return facts.join(d, cond, "left").drop("__k", "__vf", "__vto")


def scd2_validate_dim(
    dim: DataFrame,
    key: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Overlapping-version check for an SCD2 dimension — the
    :func:`scd2_enrich_stream` precondition made checkable: per key in
    ``valid_from`` order, a version that starts before its predecessor
    ends (or before an open-ended ``valid_to IS NULL`` predecessor)
    overlaps.  Returns the offending rows
    ``(key, valid_from, valid_to, prev_valid_to)`` — empty means clean.
    One window over the dimension (bounded by definition), so the check
    costs nothing at any fact scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(valid_from)
    prev_to = F.lag(F.col(valid_to)).over(w)
    prev_from = F.lag(F.col(valid_from)).over(w)
    overlap = prev_from.isNotNull() & (
        prev_to.isNull() | (F.col(valid_from) < prev_to)
    )
    return (
        dim.withColumn("__prev_to", prev_to)
        .withColumn("__overlap", overlap)
        .filter(F.col("__overlap"))
        .select(
            key,
            valid_from,
            valid_to,
            F.col("__prev_to").alias("prev_valid_to"),
        )
    )
