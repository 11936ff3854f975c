"""Shared plan utilities for the pipeline operators."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame,
    cols: list[str],
    top: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Pre-shuffle skew diagnostic: for each candidate join/group key
    column, the cardinality, the heaviest key's share, and the top-``top``
    heaviest keys — the numbers that decide salting / AQE-skew-join /
    broadcast before a 100 TB shuffle is launched.

    Returns one row per column: (column, n_rows, n_keys, max_count,
    skew_ratio = max_count / (n_rows/n_keys), top_keys as a
    ``key:count`` comma list, heaviest first, key string as tiebreak).

    Scale shape: one partial-combined count aggregate per column (the
    unavoidable shuffle — it IS the key histogram), then stats as a second
    tiny aggregate.  The top-key ranking window partitions by COLUMN, so
    its input is bounded by ``min_count``: keys occurring fewer than
    ``min_count`` times are dropped BEFORE the window (a key that never
    repeats cannot be skewed), keeping the single-task ranking input at
    the number of repeated keys, not the column cardinality.
    """
    if not cols:
        raise ValueError("key_skew_profile needs at least one column")
    per_col = [
        df.groupBy(F.col(c).cast("string").alias("k"))
        .agg(F.count("*").alias("c"))
        .select(F.lit(c).alias("column"), "k", "c")
        for c in cols
    ]
    counts = per_col[0]
    for p in per_col[1:]:
        counts = counts.unionByName(p)
    stats = counts.groupBy("column").agg(
        F.sum("c").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("c").alias("max_count"),
    )
    w = Window.partitionBy("column").orderBy(F.col("c").desc(), F.col("k"))
    tops = (
        counts.filter(F.col("c") >= min_count)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top)
        .groupBy("column")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__rn", "k", "c"))
                    ),
                    lambda s: F.concat_ws(":", s["k"], s["c"].cast("string")),
                ),
            ).alias("top_keys")
        )
    )
    return (
        stats.join(tops, "column", "left")
        .select(
            "column",
            "n_rows",
            "n_keys",
            "max_count",
            F.round(
                F.col("max_count") / (F.col("n_rows") / F.col("n_keys")), 6
            ).alias("skew_ratio"),
            F.coalesce("top_keys", F.lit("")).alias("top_keys"),
        )
    )


def ensure_min_parallelism(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition ``df`` up to the cluster's default
    parallelism when its physical plan has badly fewer partitions.

    Row-explosion operators (shingling, tokenization, chunking) multiply
    row counts 100-1000× in the MAP side of their first shuffle — if the
    input is a single parquet row group (common for small/local corpora;
    ``maxPartitionBytes`` cannot split inside a row group), that entire
    explosion runs in ONE task regardless of cluster size.  The guard
    triggers only when ``partitions * factor < defaultParallelism``: at
    real scale inputs carry thousands of row groups, the condition is
    false, and the plan is untouched — no shuffle is ever added to a
    well-partitioned input.  When it does trigger, the shuffled data is
    the pre-explosion (small) side, never the exploded rows.
    """
    if df.isStreaming:
        # streaming plans have no static partition count (and no .rdd);
        # micro-batch parallelism is the source's concern
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() * factor < target:
        return df.repartition(target)
    return df


def zorder_key(*int_cols, bits: int = 8):
    """Interleaved-bit (Morton / z-order) key over 2+ integer dimensions —
    the multi-dimensional clustering key for parquet data skipping: sort a
    100 TB table by this ONE column and min/max file statistics prune
    range predicates on EVERY constituent dimension at once (each file
    covers ~2^-(bits/ndim) of each dim's range, instead of one perfectly
    clustered dim and the rest unclustered).

    Each input column must already be an integer expression in
    ``[0, 2**bits)`` — bucket/clamp upstream (values outside the range
    would interleave into a DIFFERENT cell's bit pattern, silently
    breaking locality, so bucket explicitly: ``col % 256``, a histogram
    rank, epoch-day & 255, ...).  The key is closed-form bit arithmetic
    (unrolled shift/mask/or — whole-stage codegen, no UDF) and therefore
    bit-reproducible across engines and partitionings.
    """
    if len(int_cols) < 2:
        raise ValueError("zorder_key needs at least 2 dimensions")
    nd = len(int_cols)
    if nd * bits > 63:
        raise ValueError(
            f"{nd} dims x {bits} bits = {nd * bits} key bits overflows a "
            "signed 64-bit key (max 63) — lower bits or drop a dimension"
        )
    out = None
    for i, c in enumerate(int_cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("long")
        # the cast matters: shiftleft on a 32-bit INT wraps at position 31,
        # silently corrupting every key with nd*bits > 31
        for b in range(bits):
            term = F.shiftleft(
                F.shiftright(col, b).bitwiseAND(F.lit(1)), b * nd + i
            )
            out = term if out is None else out.bitwiseOR(term)
    return out.cast("long")


def zorder_sql(cols: list[str], bits: int = 8) -> str:
    """The ANSI-SQL rendering of :func:`zorder_key` (same bit layout),
    for oracles and engines without the DataFrame API."""
    nd = len(cols)
    # every term fully parenthesized: PostgreSQL-grammar engines (DuckDB)
    # give <<, >>, &, | ONE shared precedence level, left-associative, so
    # a bare "a << 1 | b << 3" folds the OR into the next shift
    terms = [
        f"(((({c}) >> {b}) & 1) << {b * nd + i})"
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return "(" + " | ".join(terms) + ")"


def zorder_repartition(
    df: DataFrame,
    int_cols: list[str],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Cluster a DataFrame along the z-curve for writing: range-partition
    on the Morton key (contiguous z-ranges per output file — this is what
    makes the min/max statistics tight), then sort within partitions.
    Feed the result straight to ``.write`` — every output file covers a
    compact box in every z-ordered dimension."""
    z = zorder_key(*int_cols, bits=bits)
    out = df.withColumn("__zkey", z)
    out = (
        out.repartitionByRange(num_partitions, "__zkey")
        if num_partitions
        else out.repartitionByRange("__zkey")
    )
    return out.sortWithinPartitions("__zkey").drop("__zkey")


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Skew-safe shuffle equi-join: when join keys are hot (head event
    types, null-ish ids, top domains), a plain shuffle join sends every
    row of the hot key to ONE task; this spreads each key over
    ``buckets`` tasks by salting the skewed side (a deterministic
    xxhash64 of ``salt_cols``, default all non-key columns) and
    REPLICATING the other side once per salt value, then joining on
    ``keys + salt``.  The result is row-identical to the plain join —
    salting changes the shuffle distribution, never the answer.

    Use when the other side is too big to broadcast but small enough to
    replicate ``buckets``× (the classic mid-size dim), and when AQE's
    skew-join can't kick in (it only splits post-shuffle sort-merge
    partitions, and not under every join/distribution shape).  For
    aggregation skew plain groupBy already suffices — Spark's partial
    aggregation combines hot-key rows map-side; joins are where skew
    genuinely concentrates.

    ``how`` supports inner / left (the skewed side must be the one whose
    rows are all kept — a right/full join would need the REPLICATED side
    preserved, which double-counts unmatched replicas).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    overlap = [c for c in other.columns if c in skewed.columns and c not in on]
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {overlap}")
    salt_src = salt_cols or [c for c in skewed.columns if c not in on]
    if not salt_src:
        raise ValueError("no columns to derive the salt from")
    left = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(buckets)),
    )
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("long"))
    return left.join(right, [*on, "__salt"], how).drop("__salt")


def distributed_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    pin: bool = True,
) -> DataFrame:
    """Exact global 1-based rank over a total order WITHOUT the
    single-task global window (``row_number() OVER (ORDER BY ...)`` with
    no PARTITION BY funnels the entire table through one task — the
    classic scale cliff).  Classic two-phase distributed ranking:

    1. range-partition on the order columns (partition boundaries are
       order-aligned, so every row in partition i sorts before every row
       in partition i+1);
    2. per-partition ``row_number`` (window PARTITIONED by the physical
       partition id — parallel);
    3. per-partition counts roll into prefix offsets (a window over
       n_partitions rows — trivially small) and broadcast back;
       global rank = offset + local rank.

    ``order_cols`` must define a TOTAL order (add a unique id as the
    final tiebreak) — with duplicate sort keys the rank of tied rows
    would depend on partition internals.  ``pin=True`` lazily
    localCheckpoints the shuffled frame so the count branch and the rank
    branch see identical partitions by construction (one materialization
    of the shuffled data — the cost class of the sort itself); ``False``
    relies on the range partitioner's deterministic sampling instead.
    """
    work = df.repartitionByRange(*order_cols)
    if pin:
        work = work.localCheckpoint(eager=False)
    with_pid = work.withColumn("__pid", F.spark_partition_id())
    counts = with_pid.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).drop("__n")
    w_local = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    ranked = with_pid.withColumn("__local", F.row_number().over(w_local))
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    cumsum_col: str = "cumsum",
    pin: bool = True,
) -> DataFrame:
    """Exact INCLUSIVE prefix sum of ``value_col`` over a total order,
    without the single-task global window — the same two-phase shape as
    :func:`distributed_rank`: range-partition on the order columns,
    per-partition window cumsum (parallel), per-partition totals rolled
    into broadcast prefix offsets.  ``order_cols`` must define a total
    order (append a unique id as the final tiebreak)."""
    work = df.repartitionByRange(*order_cols)
    if pin:
        work = work.localCheckpoint(eager=False)
    with_pid = work.withColumn("__pid", F.spark_partition_id())
    totals = with_pid.groupBy("__pid").agg(
        F.sum(F.col(value_col)).alias("__t")
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).drop("__t")
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    summed = with_pid.withColumn(
        "__local", F.sum(F.col(value_col)).over(w_local)
    )
    return (
        summed.join(F.broadcast(offsets), "__pid")
        .withColumn(cumsum_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def profile_columns(df, cols: list[str] | None = None):
    """One-pass data-quality profile: per column, the row count, NULL
    count, exact distinct count, and min/max (stringified) — the ingest
    sanity check a pipeline runs on every new batch before it spends
    compute on it (a lang column whose distinct count exploded, or an id
    column that suddenly has NULLs, is an upstream extractor bug caught
    here, not three stages later).

    Returns the profile in long form:
    ``(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)``,
    one row per profiled column.

    Scale shape: ONE aggregation job over the input for every metric of
    every column — the multiple exact ``count_distinct`` aggregates plan
    as a single scan with an Expand (one pass over the data, widened
    ×columns in-memory, map-side partial aggregation throughout); the
    wide one-row result is then unpivoted driver-free with ``stack``.
    For quick-look profiles over very wide tables, pass the column subset
    instead — Expand cost is linear in the profiled column count.
    """
    from pyspark.sql import functions as F

    cols = list(cols) if cols is not None else list(df.columns)
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if not cols:
        raise ValueError("no columns to profile")
    aggs = [F.count("*").alias("__n")]
    for i, c in enumerate(cols):
        aggs += [
            F.count(F.col(c)).alias(f"__cnt{i}"),
            F.count_distinct(F.col(c)).alias(f"__dist{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max{i}"),
        ]
    wide = df.agg(*aggs)
    parts = []
    for i, c in enumerate(cols):
        name = c.replace("'", "''")
        parts.append(
            f"'{name}', __n, __n - __cnt{i}, __dist{i}, __min{i}, __max{i}"
        )
    stacked = ", ".join(parts)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) AS "
            "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)"
        )
    )


def rank_buckets(
    df: DataFrame,
    order_cols: list[str],
    n_buckets: int = 10,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact quantile bucketing (deciles/percentiles/…) over a total
    order, at any scale — the curriculum/mix primitive ("train on the top
    quality decile first", "cap the longest 1%"): bucket ``i`` of
    ``n_buckets`` holds rows with global rank in ``[i·n/B, (i+1)·n/B)``,
    0-indexed, sizes differing by at most one row.

    ``NTILE(B) OVER (ORDER BY …)`` computes the same thing but funnels
    the whole table through ONE task (global window) — this instead rides
    :func:`distributed_rank` (range partition + per-partition windows +
    broadcast offsets) and one broadcast row count, so the plan has no
    single-task stage.  ``order_cols`` must be a total order (append a
    unique id as tiebreak); the assignment is then deterministic across
    runs and engines — ``floor((rank-1)·B / n)``, pure integer math.
    """
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    ranked = distributed_rank(df, order_cols, rank_col="__rank")
    total = df.count()  # one lightweight count job (scan-only, no shuffle)
    bucket = (
        F.expr(f"(__rank - 1L) * {int(n_buckets)}L div {int(total)}L")
        if total
        else F.lit(0).cast("long")
    )
    return ranked.withColumn(bucket_col, bucket).drop("__rank")


def explain_report(df) -> dict:
    """Structured summary of a DataFrame's PHYSICAL plan — the
    would-this-survive-100× checklist as a library call (the same
    properties tools/explain_audit.py asserts for the suite, exposed for
    user plans):

    * ``scans``: one entry per file scan — source, pushed filters,
      ``ReadSchema`` width (a scan reading all columns for a narrow
      projection is a pruning failure);
    * ``exchanges`` / ``exchange_keys``: every shuffle and what it
      partitions by;
    * ``joins``: join strategies in plan order (broadcast vs shuffle vs
      the red-flag CartesianProduct / BroadcastNestedLoop);
    * ``python_evals``: Python-boundary operators (row UDFs vs Arrow);
    * ``codegen_stages``: whole-stage-codegen span count;
    * ``warnings``: the red flags distilled (cartesian joins,
      row-at-a-time Python, unfiltered wide scans under a Filter).
    """
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    scans = []
    for line in lines:
        m = re.search(r"Scan (\w[\w.]*)\s+([^\s\[]*)", line)
        if "Scan" not in line or "FileScan" not in line and "Scan " not in line:
            continue
        if "Scan parquet" in line or "FileScan" in line or "Scan ExistingRDD" in line or re.search(r"Scan (json|csv|orc|text)", line):
            pf = re.search(r"PushedFilters: \[([^\]]*)\]", line)
            rs = re.search(r"ReadSchema: struct<([^>]*)>", line)
            n_cols = len([c for c in (rs.group(1) if rs else "").split(",") if c.strip()])
            scans.append(
                {
                    "line": line.strip()[:120],
                    "pushed_filters": (
                        [f.strip() for f in pf.group(1).split(",") if f.strip()]
                        if pf
                        else []
                    ),
                    "read_columns": n_cols,
                }
            )
    exchange_keys = []
    for line in lines:
        m = re.search(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)(\(([^)]*)\))?", line)
        if m:
            exchange_keys.append(
                m.group(1)
                + ("(" + ",".join(
                    k.split("#")[0].strip()
                    for k in (m.group(3) or "").split(",")
                    if k.strip() and not k.strip().isdigit()
                ) + ")" if m.group(3) else "")
            )
    joins = [
        m.group(1)
        for line in lines
        for m in [re.search(
            r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)\b", line)]
        if m
    ]
    python_evals = [
        m.group(1)
        for line in lines
        for m in [re.search(
            r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|AggregateInPandas)\b", line)]
        if m
    ]
    # executedPlan().toString() renders whole-stage codegen spans as
    # "*(N) Operator"; an AQE plan hides them until it finalizes (run the
    # query once and re-report to see them) — None, not 0, in that case
    codegen: int | None = len(
        set(re.findall(r"\*\((\d+)\)", plan))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    )
    if codegen == 0 and "AdaptiveSparkPlan isFinalPlan=false" in plan:
        codegen = None
    warnings = []
    if any(j in ("CartesianProduct", "BroadcastNestedLoopJoin") for j in joins):
        warnings.append("cartesian/nested-loop join in plan")
    if "BatchEvalPython" in python_evals:
        warnings.append("row-at-a-time Python UDF (prefer Arrow/pandas UDFs)")
    return {
        "scans": scans,
        "exchanges": len(exchange_keys),
        "exchange_keys": exchange_keys,
        "joins": joins,
        "python_evals": python_evals,
        "codegen_stages": codegen,
        "warnings": warnings,
    }
