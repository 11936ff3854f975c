"""Deterministic sampling / dataset-split operators for training pipelines.

Splits and samples must be (a) reproducible across runs and engines, (b)
stable under repartitioning, and (c) assigned per-record with no global
state.  ``rand()`` fails all three at scale (seed × partition layout), so
everything here derives from a content hash of the record key:

    bucket(id) = md5(seed ':' id) first 60 bits, mod 10_000

which any engine reproduces bit-for-bit (DuckDB:
``('0x' || substr(md5(x), 1, 15))::BIGINT``).  One projection, no shuffle,
whole-stage codegen; the same record always lands in the same split no
matter the cluster layout — the property that keeps train/test splits
leak-free when the corpus is re-ingested or backfilled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: hash-space resolution: weights are quantized to 1/10_000ths
_BUCKETS = 10_000


def _bucket(id_col: str, seed: str) -> Column:
    """Deterministic [0, 10000) bucket from the record key."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _BUCKETS
    )


def bucket_sql(id_col: str, seed: str) -> str:
    """The DuckDB-dialect mirror of :func:`_bucket` (oracle use)."""
    return (
        f"(('0x' || substr(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT "
        f"% {_BUCKETS})"
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "split",
    output: str = "split",
) -> DataFrame:
    """Assign every record to a named split (train/val/test …) by hash
    bucket, proportional to ``weights`` (need not sum to 1 — they are
    normalized).  Order of ``weights`` fixes the bucket ranges, so the
    mapping is part of the dataset contract."""
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("split weights must sum to a positive value")
    b = _bucket(id_col, seed)
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        cond = b < int(round(acc))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(output, expr)


def split_case_sql(
    weights: dict[str, float], id_col: str = "doc_id", seed: str = "split"
) -> str:
    """Oracle-side CASE expression equivalent to :func:`assign_splits`."""
    total = sum(weights.values())
    b = bucket_sql(id_col, seed)
    parts = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total * _BUCKETS
        parts.append(f"WHEN {b} < {int(round(acc))} THEN '{name}'")
    return "CASE " + " ".join(parts) + f" ELSE '{names[-1]}' END"


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: str = "sample",
) -> DataFrame:
    """Content-hash Bernoulli sample: keeps the same records every run and on
    every engine (unlike ``df.sample`` whose draw depends on partition
    layout).  Composable: a 0.1 sample of a 0.5 sample with different seeds
    behaves like independent draws."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_bucket(id_col, seed) < int(round(fraction * _BUCKETS)))


def mixing_weights(
    df: DataFrame,
    targets: dict[str, float],
    by: str = "source",
) -> DataFrame:
    """Per-group downsampling probabilities that reshape the corpus to a
    target mix (the "domain mixing" step before pretraining: web 60%,
    books 20%, code 20%, …) while keeping as much data as possible.

    With group counts c_i and target fractions t_i, the kept-total is
    limited by the scarcest group relative to its target:
    ``s = min_i (c_i/N) / t_i`` (clamped to ≤1 — never upsample); the
    sampling probability for group i is then ``p_i = t_i · s · N / c_i``,
    so expected post-sample fractions equal the targets exactly.

    Groups not named in ``targets`` get probability 0 (dropped).  A
    TARGET naming a group absent from the data contributes no constraint:
    the realized mix is then the targets renormalized over the groups
    that exist (you cannot sample data that isn't there — callers that
    need hard failure should check ``expected_docs`` vs targets).  Pure
    aggregate arithmetic: one grouped count + a 1-row scale factor joined
    back by broadcast — no data shuffle beyond the count itself.

    Returns (group, n_docs, frac, target_frac, sample_prob,
    expected_docs), floats rounded to 6.
    """
    if not targets:
        raise ValueError("mixing_weights needs at least one target")
    tot = sum(targets.values())
    t_expr = F.create_map(
        *[F.lit(x) for kv in targets.items() for x in (kv[0], kv[1] / tot)]
    )
    counts = df.groupBy(F.col(by).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    counts = counts.withColumn("target_frac", t_expr[F.col("grp")])
    w = Window.partitionBy()
    counts = counts.withColumn("__N", F.sum("n_docs").over(w))
    counts = counts.withColumn(
        "__s",
        F.min(
            F.when(
                F.col("target_frac").isNotNull(),
                F.least(
                    F.lit(1.0),
                    F.col("n_docs") / F.col("__N") / F.col("target_frac"),
                ),
            )
        ).over(w),
    )
    prob = F.coalesce(
        F.col("target_frac") * F.col("__s") * F.col("__N") / F.col("n_docs"),
        F.lit(0.0),
    )
    return counts.select(
        F.col("grp").alias(by),
        "n_docs",
        F.round(F.col("n_docs") / F.col("__N"), 6).alias("frac"),
        F.round(F.coalesce("target_frac", F.lit(0.0)), 6).alias("target_frac"),
        F.round(prob, 6).alias("sample_prob"),
        F.round(prob * F.col("n_docs"), 6).alias("expected_docs"),
    )


def apply_mixing(
    df: DataFrame,
    targets: dict[str, float],
    by: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix",
) -> DataFrame:
    """Materialize the domain mix computed by :func:`mixing_weights`:
    keep each row iff its content-hash bucket falls under its group's
    ``sample_prob`` — a deterministic per-group Bernoulli thinning, so
    the kept SET (not just the counts) is reproducible across runs,
    partitionings, and engines.  Groups absent from ``targets`` drop
    entirely (prob 0).

    The per-group probabilities are a tiny frame (one row per group)
    broadcast onto the corpus — one scan, no data shuffle.  Thresholding
    uses ``floor(p·10000 + 0.5)`` on the 6-decimal-rounded probability so
    both engines compute the identical integer cut-off (no double
    round-half ambiguity).
    """
    w = mixing_weights(df, targets, by=by).select(by, "sample_prob")
    thresh = F.floor(
        F.col("sample_prob") * _BUCKETS + F.lit(0.5)
    ).cast("bigint")
    return (
        df.join(F.broadcast(w), by, "inner")
        .filter(_bucket(id_col, seed) < thresh)
        .drop("sample_prob")
    )


def temperature_targets(
    df: DataFrame,
    by: str = "source",
    alpha: float = 0.7,
) -> DataFrame:
    """Temperature-scaled domain targets: ``t_i ∝ (c_i/N)^alpha`` — the
    multilingual/domain rebalancing convention (Conneau & Lample 2019;
    mC4 uses alpha≈0.3–0.7): ``alpha=1`` keeps the natural mix,
    ``alpha→0`` approaches uniform, in between boosts rare domains
    without letting any single one dominate.

    Pure aggregate arithmetic — one grouped count over the corpus, then
    the per-domain math runs on the (tiny, one-row-per-domain)
    aggregate; the normalizing sum of ``frac^alpha`` folds over domains
    SORTED by group (module convention: bit-reproducible doubles — an
    unordered window sum of doubles would be partition-order dependent).
    Chain into :func:`mixing_weights` / :func:`apply_mixing` by
    collecting the returned frame to a targets dict (bounded by the
    domain count, never corpus-sized).

    Returns (group, n_docs, frac, target_frac), floats rounded to 6.
    """
    counts = df.groupBy(F.col(by).alias("grp")).agg(
        F.count("*").alias("n_docs")
    )
    packed = counts.agg(
        F.array_sort(
            F.collect_list(F.struct("grp", "n_docs"))
        ).alias("gs"),
        F.sum("n_docs").alias("__N"),  # integer sum — order-free
    )
    big_n = F.col("__N").cast("double")
    sum_p = F.aggregate(
        F.col("gs"),
        F.lit(0.0),
        lambda a, s: a
        + F.pow(s["n_docs"].cast("double") / big_n, F.lit(alpha)),
    )
    ex = packed.withColumn("__sum_p", sum_p).select(
        F.explode("gs").alias("s"), "__N", "__sum_p"
    )
    frac = F.col("s.n_docs").cast("double") / F.col("__N").cast("double")
    return ex.select(
        F.col("s.grp").alias(by),
        F.col("s.n_docs").alias("n_docs"),
        F.round(frac, 6).alias("frac"),
        F.round(
            F.pow(frac, F.lit(alpha)) / F.col("__sum_p"), 6
        ).alias("target_frac"),
    )


def negative_samples(
    df,
    k: int = 4,
    id_col: str = "doc_id",
    seed: str = "neg",
):
    """Deterministic negative sampling for contrastive training: every
    anchor row gets ``k`` pseudo-random OTHER rows, chosen by
    content-addressed hashing — the same (seed, anchor, slot) always
    picks the same negative, across runs, partitionings and engines, so
    a resumed or re-sharded training job sees identical pairs (the
    property random() sampling cannot give).

    Mechanism: ranks 1..N from :func:`..util.distributed_rank` over the
    id order (no single-task window), target rank =
    ``H(seed:slot:anchor) % N + 1``; a self-collision shifts one rank
    forward (wrapping), so anchors never pair with themselves and every
    anchor yields exactly ``k`` negatives.  One hash-join from the
    exploded (anchor, target-rank) pairs to the rank table — at 100 TB
    both sides shuffle on the rank key once; the rank table is two
    columns.

    Returns ``(anchor_id, slot, negative_id)``.
    """
    from pyspark.sql import functions as F

    from .util import distributed_rank

    n = df.count()
    if n < 2:
        raise ValueError("negative sampling needs at least 2 rows")
    ranked = distributed_rank(
        df.select(F.col(id_col)), [id_col], rank_col="__r"
    ).select(F.col(id_col).alias("negative_id"), "__r")
    slots = F.explode(
        F.array(*[F.lit(i) for i in range(k)])
    ).alias("slot")
    anchors = df.select(F.col(id_col).alias("anchor_id")).select(
        "anchor_id", slots
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(seed),
                    F.col("slot").cast("string"),
                    F.col("anchor_id").cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    targeted = anchors.withColumn("__t", h % n + 1)
    # the anchor's own rank (one extra join column avoids a second pass)
    own = ranked.select(
        F.col("negative_id").alias("anchor_id"), F.col("__r").alias("__own")
    )
    targeted = targeted.join(own, "anchor_id").withColumn(
        "__t",
        F.when(
            F.col("__t") == F.col("__own"), F.col("__t") % n + 1
        ).otherwise(F.col("__t")),
    )
    return (
        targeted.join(ranked, targeted["__t"] == ranked["__r"])
        .select("anchor_id", "slot", "negative_id")
    )
