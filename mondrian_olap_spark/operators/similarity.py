"""Embedding similarity search: brute-force cosine top-k (baseline) and
random-hyperplane LSH bucketing (scale path).

Vectors are ``array<float>`` columns; all arithmetic is promoted to double
and kept in JVM expressions (``zip_with`` + ``aggregate`` fold — sequential
left-to-right sum, so results are bit-reproducible and match any engine that
sums in element order).

Scale notes:

* brute-force top-k broadcasts the (small) query set against the corpus —
  one scan, no shuffle of the corpus, per-partition partial top-k via the
  ranking window on (query, cosine);
* the LSH variant buckets vectors by sign patterns against deterministic
  pseudo-random hyperplanes; candidate generation is a bucket equi-join, so
  cost scales with bucket collisions, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import fsio


def _dvec(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """NULL-safe cosine: zero-norm vectors yield NULL (no defined direction)
    instead of tripping ANSI division-by-zero."""
    return F.try_divide(dot(a, b), na * nb)


def with_cosine(df: DataFrame, a: str, b: str, output: str = "cosine") -> DataFrame:
    av, bv = _dvec(F.col(a)), _dvec(F.col(b))
    return df.withColumn(output, cosine(av, bv, norm(av), norm(bv)))


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: exact baseline.

    Returns (query_id, neighbor_id, cosine) — k rows per query, cosine
    descending, neighbor id as deterministic tiebreak; self-matches excluded.
    """
    q = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(F.col(id_col).alias("query_id"), _dvec(F.col(vec_col)).alias("qv"))
        .withColumn("qn", norm(F.col("qv")))
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), _dvec(F.col(vec_col)).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    pairs = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")))
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def cosine_pairs_threshold(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (exact; O(n²) — the correctness
    baseline for the LSH path, usable up to ~10⁵ vectors)."""
    a = emb.select(F.col(id_col).alias("id_a"), _dvec(F.col(vec_col)).alias("va")).withColumn(
        "na", norm(F.col("va"))
    )
    b = emb.select(F.col(id_col).alias("id_b"), _dvec(F.col(vec_col)).alias("vb")).withColumn(
        "nb", norm(F.col("vb"))
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_seeds(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """The default deterministic coarse-quantizer model: the ``n_cells``
    lowest-id non-zero vectors, as collected rows ``(id, v, nv)``.  Pass
    the same list to both :func:`ivf_index` and :func:`ivf_topk`; swap in
    trained centroids by passing rows of the same shape."""
    base = (
        emb.select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v"))
        .withColumn("nv", norm(F.col("v")))
        .filter(F.col("nv") > 0)
    )
    return base.orderBy("id").limit(n_cells).select("id", "v", "nv").collect()


def ivf_train(
    emb: DataFrame,
    n_cells: int = 8,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Lloyd's k-means coarse-quantizer trainer — the "trained centroids"
    scale knob the seed quantizer leaves open.

    Deterministic init (``ivf_seeds``), then ``iterations`` rounds of
    assign → per-cell elementwise mean.  Each round is ONE distributed
    job: assignment is the same zero-shuffle projection as
    :func:`ivf_index`, the means come from a posexplode + groupBy over
    (cell, dimension) — k×d tiny rows to the driver per round (model
    parameters, the legitimate collect).  Empty cells keep their previous
    centroid (standard Lloyd's degenerate-cell rule).

    Returns centroid entries in the shape :func:`ivf_index` /
    :func:`ivf_topk` accept via ``centroids=`` — cell labels are the
    seeding vectors' ids, stable across rounds so a trained index stays
    comparable with its seed-index ancestor."""
    import math

    cents: list = [
        {"id": s["id"], "v": list(s["v"]), "nv": float(s["nv"])}
        for s in ivf_seeds(emb, n_cells, id_col, vec_col)
    ]
    for _ in range(iterations):
        assigned = ivf_index(emb, n_cells, id_col, vec_col, centroids=cents)
        means = (
            assigned.select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        new = []
        for s in cents:
            d = by_cell.get(s["id"])
            if d:
                v = [float(d[i]) for i in range(len(d))]
                nv = math.sqrt(sum(x * x for x in v))
                if nv > 0:
                    new.append({"id": s["id"], "v": v, "nv": nv})
                    continue
            new.append(s)  # empty/degenerate cell keeps its centroid
        cents = new
    return cents


def ivf_index(
    emb: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """IVF coarse quantizer + assignment — the ANN scale path beside LSH.

    The ``n_cells`` lowest-id vectors seed the cells (a deterministic,
    zero-iteration quantizer any engine can reproduce; swap in trained
    centroids at scale without changing the plan shape).  Every vector is
    assigned to its nearest cell by cosine (ties → lowest cell id).

    Scale shape: the centroids are model parameters (k rows, collected once
    and inlined as literals — the same pattern as the LSH hyperplanes), so
    assignment is a pure projection over the corpus: one scan, zero
    shuffles, whole-stage codegen.  Persist the result bucketed by ``cell``
    to make every later probe a pruned scan.

    Returns (id, cell, v, nv) with zero-norm vectors dropped (cosine has no
    defined direction for them).
    """
    base = (
        emb.select(
            F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v")
        )
        .withColumn("nv", norm(F.col("v")))
        .filter(F.col("nv") > 0)
    )
    seeds = centroids if centroids is not None else ivf_seeds(
        emb, n_cells, id_col, vec_col
    )
    entries = [
        F.struct(
            cosine(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in s["v"]]),
                F.col("nv"),
                F.lit(float(s["nv"])),
            ).alias("cos"),
            F.lit(-s["id"]).alias("ncid"),
        )
        for s in seeds
    ]
    best = F.sort_array(F.array(*entries), asc=False)[0]
    return base.withColumn("cell", -best["ncid"])


def cluster_balanced_sample(
    emb: DataFrame,
    per_cluster: int,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
    by: str = "center",
) -> DataFrame:
    """Diversity-preserving corpus sampling by embedding cluster (the
    SemDeDup-family curation move: cap how much of any one semantic
    region enters the training mix, instead of letting dense regions
    dominate a uniform sample).  Assign every vector to its nearest
    coarse cell, keep at most ``per_cluster`` per cell:

    * ``by="center"`` — the most REPRESENTATIVE members (highest cosine
      to the assigned centroid; ties → lowest id): prototype selection.
    * ``by="edge"`` — the most MARGINAL members (lowest cosine):
      hard-example / boundary mining.
    * ``by="hash"`` — an unbiased deterministic per-cell sample (ordered
      by md5 of the id, reproducible on any engine, no RNG state).

    Scale shape: assignment is the inlined-centroid pure projection
    (:func:`ivf_index` — one scan, zero shuffles); the per-cell cap is
    ONE window shuffle keyed by cell.  Size ``n_cells`` to the
    parallelism you need — the window's skew is bounded by the largest
    cluster, so at 100 TB use thousands of cells (trained via
    :func:`ivf_train`), not the 8-cell gate default.

    Returns ``(id_col, cell, centroid_cosine, sample_rank)`` with
    ``sample_rank <= per_cluster``.
    """
    if by not in ("center", "edge", "hash"):
        raise ValueError(f"by must be center|edge|hash, got {by!r}")
    from pyspark.sql import Window

    base = (
        emb.select(
            F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v")
        )
        .withColumn("nv", norm(F.col("v")))
        .filter(F.col("nv") > 0)
    )
    seeds = centroids if centroids is not None else ivf_seeds(
        emb, n_cells, id_col, vec_col
    )
    entries = [
        F.struct(
            cosine(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in s["v"]]),
                F.col("nv"),
                F.lit(float(s["nv"])),
            ).alias("cos"),
            F.lit(-s["id"]).alias("ncid"),
        )
        for s in seeds
    ]
    best = F.sort_array(F.array(*entries), asc=False)[0]
    assigned = base.select(
        F.col("id"),
        (-best["ncid"]).alias("cell"),
        best["cos"].alias("centroid_cosine"),
    )
    order = {
        "center": [F.col("centroid_cosine").desc(), F.col("id")],
        "edge": [F.col("centroid_cosine").asc(), F.col("id")],
        "hash": [F.md5(F.col("id").cast("string")), F.col("id")],
    }[by]
    w = Window.partitionBy("cell").orderBy(*order)
    return (
        assigned.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= int(per_cluster))
        .select(
            F.col("id").alias(id_col), "cell", "centroid_cosine",
            "sample_rank",
        )
    )


def cell_blocked_pairs(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """Cosine near-dup candidate pairs via IVF-cell BLOCKING — the scale
    path :func:`cosine_pairs_threshold` is the exact baseline for: each
    vector joins only vectors sharing one of its ``n_probe`` nearest
    coarse cells, so candidate volume is Σ|cell|² instead of n².
    Multi-probe assignment (``n_probe`` ≥ 2) recovers boundary pairs a
    single-cell blocking would miss; recall is governed by (n_cells,
    n_probe) exactly as in :func:`ivf_topk`.

    Scale shape: assignment is the inlined-centroid pure projection, one
    explode to (cell, vector), ONE cell-keyed self-join shuffle, and a
    pair-distinct (a pair can share several probe cells).  Size
    ``n_cells`` so the largest cell's square fits a task — thousands of
    trained cells at corpus scale.

    Returns ``(id_a, id_b, cosine)`` with ``id_a < id_b``.
    """
    base = (
        emb.select(
            F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v")
        )
        .withColumn("nv", norm(F.col("v")))
        .filter(F.col("nv") > 0)
    )
    seeds = centroids if centroids is not None else ivf_seeds(
        emb, n_cells, id_col, vec_col
    )
    entries = [
        F.struct(
            cosine(
                F.col("v"),
                F.array(*[F.lit(float(x)) for x in s["v"]]),
                F.col("nv"),
                F.lit(float(s["nv"])),
            ).alias("cos"),
            F.lit(-s["id"]).alias("ncid"),
        )
        for s in seeds
    ]
    probes = F.slice(F.sort_array(F.array(*entries), asc=False), 1,
                     int(n_probe))
    assigned = base.select(
        "id", "v", "nv",
        F.explode(probes).alias("__p"),
    ).select("id", "v", "nv", (-F.col("__p")["ncid"]).alias("cell"))
    a = assigned.select(
        F.col("cell"), F.col("id").alias("id_a"),
        F.col("v").alias("va"), F.col("nv").alias("na"),
    )
    b = assigned.select(
        F.col("cell"), F.col("id").alias("id_b"),
        F.col("v").alias("vb"), F.col("nv").alias("nb"),
    )
    return (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            cosine(F.col("va"), F.col("vb"), F.col("na"), F.col("nb")),
        )
        .filter(F.col("cosine") >= float(threshold))
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication at scale: IVF-cell-blocked
    cosine pairs (:func:`cell_blocked_pairs`) → connected components →
    one canonical survivor per semantic family — the embedding-space
    pass a training pipeline runs after text-level dedup, with the
    candidate stage blocked instead of O(n²).  Returns ``(id, cluster,
    keep)`` for every nonzero vector (``keep`` = min-id survivor)."""
    from .dedup import dedup_clusters

    pairs = cell_blocked_pairs(
        emb, threshold, n_cells=n_cells, n_probe=n_probe,
        id_col=id_col, vec_col=vec_col, centroids=centroids,
    ).select("id_a", "id_b")
    nonzero = (
        emb.select(F.col(id_col).alias("id"),
                   _dvec(F.col(vec_col)).alias("v"))
        .filter(norm(F.col("v")) > 0)
        .select("id")
    )
    return dedup_clusters(nonzero, pairs)


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
    centroids: list | None = None,
) -> DataFrame:
    """Approximate cosine top-k via IVF: each query probes its ``n_probe``
    nearest cells and ranks only the vectors assigned there.

    Cost model vs brute force: candidates ≈ corpus × n_probe / n_cells —
    the ranking join touches a tunable fraction of the data instead of all
    of it, and with the index persisted bucketed by ``cell`` the probe is a
    partition-pruned scan.  Recall grows with ``n_probe`` (== n_cells is
    exact search).

    Returns (query_id, neighbor_id, cosine), k rows per query, cosine
    descending with neighbor id tiebreak; self-matches excluded.
    """
    if index is not None and centroids is None:
        raise ValueError(
            "ivf_topk(index=...) needs the matching centroids= list (from "
            "ivf_seeds or your trained quantizer) — probing must use the "
            "same centroids the index was assigned with; deriving them "
            "from the index's rows is only correct for default seeding"
        )
    seeds = centroids if centroids is not None else ivf_seeds(
        emb, n_cells, id_col, vec_col
    )
    idx = (
        index
        if index is not None
        else ivf_index(emb, n_cells, id_col, vec_col, centroids=seeds)
    )
    q = idx.filter(F.col("id").isin(query_ids)).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("nv").alias("qn")
    )
    entries = [
        F.struct(
            cosine(
                F.col("qv"),
                F.array(*[F.lit(float(x)) for x in s["v"]]),
                F.col("qn"),
                F.lit(float(s["nv"])),
            ).alias("cos"),
            F.lit(-s["id"]).alias("ncid"),
        )
        for s in seeds
    ]
    probes = q.withColumn(
        "cell", F.explode(
            F.transform(
                F.slice(F.sort_array(F.array(*entries), asc=False), 1, n_probe),
                lambda s: -s["ncid"],
            )
        )
    )
    # probes shares lineage with idx (self-join) → disambiguate by alias
    cand = (
        idx.alias("L")
        .join(
            F.broadcast(probes.alias("P")),
            (F.col("L.cell") == F.col("P.cell"))
            & (F.col("L.id") != F.col("P.query_id")),
        )
        .select(
            F.col("P.query_id").alias("query_id"),
            F.col("L.id").alias("neighbor_id"),
            cosine(F.col("P.qv"), F.col("L.v"), F.col("P.qn"), F.col("L.nv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def embedding_scatter(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int | None = None,
    exact_cols: bool = False,
) -> DataFrame:
    """Upper-triangle scatter statistics of an embedding column — the
    input PCA/whitening needs: per component pair (i, j ≥ i), the exact
    sums ``sum_prod = Σ x_i·x_j``, ``sum_i``, ``sum_j`` and the count,
    plus the derived covariance ``(sum_prod − sum_i·sum_j/n)/n``.

    Determinism at scale: components round once to DECIMAL(18,10) and
    every product/sum is EXACT decimal arithmetic — order-independent
    under any partitioning, engine-identical (the stats-family
    decimal-moment idiom).  The explode emits d(d+1)/2 rows per vector
    but the pair-keyed aggregation map-side combines to d(d+1)/2 rows
    per partition, so the shuffle is constant-size regardless of corpus
    size.  The result is d(d+1)/2 rows — bounded, collectable."""
    if dim is None:
        first = df.select(F.size(F.col(vec_col)).alias("d")).first()
        if first is None:
            raise ValueError("empty frame: cannot infer embedding dim")
        dim = int(first["d"])
    # quantize once to 1e-10 integer units via the portable half-up
    # idiom floor(x*1e10 + 0.5): the double multiply/floor are IEEE
    # identical on every engine, unlike a double->DECIMAL cast (engines
    # disagree in the last ulp of the scaled rounding).  All sums and
    # products are then EXACT integer-decimal arithmetic.
    dv = (
        f"transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) "
        f"* 10000000000.0D + 0.5D) AS DECIMAL(18,0)))"
    )
    # quantize ONCE per row in its own projection: Spark does no CSE
    # inside lambda bodies, so referencing the transform expression from
    # element_at within the pair lambdas would re-run the full d-element
    # quantization for EVERY pair access (2·d(d+1)/2 times per vector —
    # measured 74 s cold at d=64/2 k vectors; ~4 s with the projection)
    quant = df.selectExpr(f"{dv} AS __dv")
    pairs = quant.selectExpr(
        f"""explode(flatten(transform(sequence(1, {dim}), i ->
             transform(sequence(i, {dim}), j -> struct(
               i AS i, j AS j,
               element_at(__dv, i) AS xi,
               element_at(__dv, j) AS xj)))))  AS p"""
    ).select("p.i", "p.j", "p.xi", "p.xj")
    agg = pairs.groupBy("i", "j").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("xi * xj")).alias("__sp"),
        F.sum("xi").alias("__si"),
        F.sum("xj").alias("__sj"),
    )
    if exact_cols:
        # keep the raw integer-unit DECIMAL sums alongside (units of
        # 1e-10 for __si/__sj, 1e-20 for __sp) — exact integers whose
        # string rendering a bit-exact oracle compares
        return agg.select(
            "i", "j", "n", "__sp", "__si", "__sj",
        )
    sp = F.col("__sp").cast("double") / F.lit(1e20)
    si = F.col("__si").cast("double") / F.lit(1e10)
    sj = F.col("__sj").cast("double") / F.lit(1e10)
    return agg.select(
        "i",
        "j",
        "n",
        sp.alias("sum_prod"),
        si.alias("sum_i"),
        sj.alias("sum_j"),
        # fixed op order for bit-determinism: (sp - si*sj/n) / n
        (
            (sp - si * sj / F.col("n").cast("double"))
            / F.col("n").cast("double")
        ).alias("cov"),
    )


def pca_components(
    df: DataFrame,
    k: int,
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[float]]:
    """Top-k principal components of the embedding column: the scatter
    matrix comes back as d(d+1)/2 BOUNDED rows (:func:`embedding_scatter`
    — the corpus-sized work), the d×d eigendecomposition runs driver-side
    in numpy (d is the embedding width, never the corpus).  Component
    signs are normalized (largest-|.| coordinate positive) so the basis
    is deterministic.  Feed the result to :func:`project_embeddings`."""
    import numpy as np

    rows = embedding_scatter(df, vec_col=vec_col, dim=dim).collect()
    d = max(r["j"] for r in rows)
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][: int(k)]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        comps.append([float(x) for x in v])
    return comps


def embedding_mean(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> list[float]:
    """Per-component mean vector, from the same exact integer-unit sums
    as :func:`embedding_scatter` (the diagonal rows carry every
    component's sum) — bounded output, partition-order independent."""
    rows = embedding_scatter(df, vec_col=vec_col, dim=dim).collect()
    out = {r["i"]: r["sum_i"] / r["n"] for r in rows if r["i"] == r["j"]}
    return [out[i] for i in sorted(out)]


def project_embeddings(
    df: DataFrame,
    components: list[list[float]],
    vec_col: str = "embedding",
    output: str = "projected",
    mean: list[float] | None = None,
) -> DataFrame:
    """Project embeddings onto a component basis (PCA reduce / whitening
    rotation): components inline as array literals, each coordinate is a
    sequential-fold dot product — a pure zero-shuffle projection that
    runs identically on batch and streaming frames.  Pass ``mean``
    (:func:`embedding_mean`) to center first — PCA coordinates are
    conventionally of the centered data; the subtraction stays inside
    the same projection (still zero-shuffle)."""
    src = vec_col
    if mean is not None:
        mlit = "array(" + ", ".join(f"{float(x)!r}D" for x in mean) + ")"
        src = f"zip_with({vec_col}, {mlit}, (a, b) -> CAST(a AS DOUBLE) - b)"
    coords = []
    for c in components:
        lit = "array(" + ", ".join(f"{x!r}D" for x in c) + ")"
        coords.append(
            f"aggregate(zip_with({src}, {lit}, (a, b) -> "
            f"CAST(a AS DOUBLE) * b), 0.0D, (s, x) -> s + x)"
        )
    return df.withColumn(output, F.expr("array(" + ", ".join(coords) + ")"))


def recall_report(
    exact: DataFrame,
    approx: DataFrame,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Measured recall@k of ANY approximate top-k result against the
    exact baseline — the "measure, don't guess" report that turns an
    IVF/PQ/LSH knob choice (n_probe, planes, cells) into a number before
    the index ships.  Per query: the true-neighbor count, how many the
    approximate path found, and the recall fraction.

    Both inputs are (query, neighbor) lists — queries × k rows, tiny
    regardless of corpus size, so the comparison join costs nothing next
    to the searches themselves.  Queries whose approximate list found no
    true neighbor still appear (recall 0.0).  Inputs are deduplicated
    (a multi-probe generator emitting a neighbor twice must not inflate
    n_hit past n_true)."""
    # single pass over the exact arm: a left join against the (distinct)
    # approximate set marks hits, so n_true and n_hit come out of ONE
    # per-query aggregation — the truth-join-hits form executed the
    # exact-baseline plan twice (once per aggregate branch)
    ex = exact.select(query_col, neighbor_col).distinct()
    ap = approx.select(query_col, neighbor_col).distinct()
    marked = ex.join(
        ap.withColumn("__hit", F.lit(1)), [query_col, neighbor_col], "left"
    )
    return (
        marked.groupBy(query_col)
        .agg(
            F.count("*").alias("n_true"),
            F.count("__hit").alias("n_hit"),
        )
        .withColumn(
            "recall",
            F.col("n_hit").cast("double") / F.col("n_true").cast("double"),
        )
    )


def write_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 8,
    centroids: list | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Materialize the IVF index PARTITIONED BY cell — the on-disk ANN
    artifact: a probe that filters on its ``n_probe`` cells reads only
    those cells' directories (static partition pruning when the cells are
    literals; dynamic partition pruning under the broadcast probe join),
    so query cost tracks ``n_probe / n_cells`` of the corpus at any scale.

    The centroids are part of the artifact — probing MUST use the
    centroids the index was assigned with — so they are persisted next to
    the data under ``_centroids`` (the ``_`` prefix hides the directory
    from parquet data discovery).  Returns the centroid list it wrote.
    """
    seeds = (
        centroids
        if centroids is not None
        else ivf_seeds(emb, n_cells, id_col, vec_col)
    )
    idx = ivf_index(emb, n_cells, id_col, vec_col, centroids=seeds)
    idx.write.mode("overwrite").partitionBy("cell").parquet(path)
    cent_rows = [
        (int(s["id"]), [float(x) for x in s["v"]], float(s["nv"]))
        for s in seeds
    ]
    (
        fsio.tiny_df(
            emb.sparkSession, cent_rows, "id long, v array<double>, nv double"
        )
        .write.mode("overwrite")
        .parquet(path + "/_centroids")
    )
    return seeds


def ivf_append(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Append new vectors to a persisted IVF index WITHOUT rebuilding it:
    load the artifact's own centroids (``_centroids`` — probing and
    appending must both use the centroids the index was assigned with),
    assign ONLY the new vectors (the same inlined-centroid zero-shuffle
    projection as the build), and append-write them into the cell
    partitions.

    Because assignment is per-vector, probes over the appended index are
    IDENTICAL to probes over a from-scratch build of the full corpus with
    the same centroids — so at 100 TB index maintenance is one
    delta-sized projection plus a partitioned append, never a corpus
    rescan (the ANN analog of ``CubeEngine.refresh_aggregates``).  Cell
    balance degrades only as far as the data drifts from the quantizer;
    re-train + rebuild remains the periodic heavy path.  Returns the
    centroids read from the artifact.
    """
    spark = new_emb.sparkSession
    _, cents = read_ivf_index(spark, path)
    idx = ivf_index(
        new_emb, n_cells=len(cents), id_col=id_col, vec_col=vec_col,
        centroids=cents,
    )
    idx.write.mode("append").partitionBy("cell").parquet(path)
    return cents


def read_ivf_index(spark, path: str) -> tuple[DataFrame, list]:
    """Load an index written by :func:`write_ivf_index`: returns
    ``(index_df, centroids)`` in exactly the shape
    ``ivf_topk(index=..., centroids=...)`` takes.  The centroid read is a
    k-row collect (model parameters, the legitimate collect)."""
    idx = spark.read.parquet(path)
    cents = [
        {"id": r["id"], "v": list(r["v"]), "nv": r["nv"]}
        for r in spark.read.parquet(path + "/_centroids")
        .orderBy("id")
        .collect()
    ]
    return idx, cents


def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane components in [-1, 1): derived
    from md5 of (plane, component) so any engine can reproduce them."""
    import hashlib

    comps = []
    for j in range(dim):
        h = int(hashlib.md5(f"plane:{plane}:{j}".encode()).hexdigest()[:15], 16)
        comps.append((h % 2001 - 1000) / 1000.0)
    return comps


def lsh_signatures(
    emb: DataFrame,
    dim: int,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) signatures: bit p = sign of
    ⟨v, h_p⟩.  P(bit match) = 1 - θ/π, so agreeing buckets concentrate
    high-cosine pairs."""
    v = _dvec(F.col(vec_col))
    bits = []
    for p in range(planes):
        plane = F.array(*[F.lit(c) for c in _hyperplane(dim, p)])
        bits.append(
            F.when(dot(v, plane) > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
                F.lit(0).cast("bigint")
            )
        )
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return emb.select(F.col(id_col).alias("id"), sig.alias("bucket"))


def lsh_candidate_pairs(
    emb: DataFrame,
    dim: int,
    planes: int | None = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_bucket: int = 8,
    max_bucket: int | None = None,
) -> DataFrame:
    """ANN candidate pairs: band the hyperplane signature (``bands`` bands of
    ``planes/bands`` bits) and join on any agreeing band — the scale path
    that replaces the O(n²) join.

    Cost model: per band, expected bucket occupancy is n / 2^width and the
    candidate count is Σ |bucket|² / 2 ≈ n²/2^(width+1) per band — so a
    FIXED width turns quadratic again as the corpus grows.  Two knobs keep
    it linear at any n:

    - ``planes=None`` (auto-width): one count() job sizes
      width = max(6, ceil(log2(n / target_bucket))), holding expected
      bucket size at ``target_bucket`` so candidates stay ≈
      n·target_bucket·bands/2 regardless of n.  Recall per band is
      p(cos)^width (p = 1 - θ/π), so auto-width trades per-band recall for
      bounded cost — compensate with more bands, which scales cost
      linearly, not quadratically.
    - ``max_bucket`` (skew guard): drop (band, value) buckets larger than
      the cap via a broadcast anti-join on the (small) hot-bucket list,
      bounding worst-case candidates at n·max_bucket·bands/2 even under
      degenerate vector distributions (all-zero embeddings, duplicated
      rows).  Analogous to the dedup hot-shingle guard.
    """
    if planes is None:
        import math

        n = emb.count()
        width = max(6, math.ceil(math.log2(max(n, 2) / target_bucket)))
        planes = width * bands
    width = planes // bands
    sigs = lsh_signatures(emb, dim, planes, id_col, vec_col)
    mask = (1 << width) - 1
    chunk_cols = [
        F.struct(
            F.lit(ci).alias("ci"),
            F.shiftright(F.col("bucket"), ci * width).bitwiseAND(F.lit(mask)).alias("cv"),
        )
        for ci in range(bands)
    ]
    blocks = sigs.select("id", F.explode(F.array(*chunk_cols)).alias("c")).select(
        "id", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv")
    )
    if max_bucket is not None:
        hot = (
            blocks.groupBy("ci", "cv")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("ci", "cv")
        )
        blocks = blocks.join(F.broadcast(hot), ["ci", "cv"], "left_anti")
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def quantize_embeddings(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x| / 127``,
    ``q_i = floor(x_i/scale + 0.5)`` (half-up via ``floor`` — ``round()``
    half-even/half-away conventions differ across engines, ``floor`` does
    not), clamped to [-127, 127].

    The standard 4× memory cut before ANN indexing at scale: int8 vectors
    plus one float scale per vector.  Expression-only (``transform`` over
    the array inside codegen), one scan, no shuffle.  Zero vectors get
    ``scale = 0`` and an all-zero ``qvec``.

    Returns (id, scale, qvec array<int>).
    """
    v = _dvec(F.col(vec_col))
    maxabs = F.aggregate(
        F.transform(v, F.abs), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    staged = emb.select(
        F.col(id_col).alias("id"),
        v.alias("__v"),
        (maxabs / F.lit(127.0)).alias("scale"),
    )
    q = F.when(
        F.col("scale") == 0, F.transform(F.col("__v"), lambda x: F.lit(0))
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(x / F.col("scale") + F.lit(0.5)).cast("int"),
                ),
            ),
        )
    )
    return staged.select("id", "scale", q.alias("qvec"))


def quantization_error_stats(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label reconstruction-quality report for int8 quantization
    (:func:`quantize_embeddings`): max/avg of the per-vector max absolute
    reconstruction error, and the mean cosine between each vector and its
    dequantized form — the go/no-go gate before switching an ANN index to
    int8 storage.

    The dequantized element is recomputed inline from the original
    (``deq_i = floor(x_i/scale + 0.5)·scale``) so the whole report is one
    expression-only scan + one keyed aggregate — no quantized copy is
    materialized.  All folds sequential double-precision (module
    convention), stats rounded to 6.
    """
    v = _dvec(F.col(vec_col))
    maxabs = F.aggregate(
        F.transform(v, F.abs), F.lit(0.0), lambda a, x: F.greatest(a, x)
    )
    staged = emb.select(
        F.col(label_col).alias("label"), v.alias("__v"),
        (maxabs / F.lit(127.0)).alias("__scale"),
    )
    deq = F.when(
        F.col("__scale") == 0, F.transform(F.col("__v"), lambda x: F.lit(0.0))
    ).otherwise(
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / F.col("__scale") + F.lit(0.5)) * F.col("__scale"),
        )
    )
    staged = staged.withColumn("__dq", deq)
    max_err = F.array_max(
        F.zip_with(F.col("__v"), F.col("__dq"), lambda a, b: F.abs(a - b))
    )
    cos = cosine(
        F.col("__v"), F.col("__dq"), norm(F.col("__v")), norm(F.col("__dq"))
    )
    return (
        staged.select("label", max_err.alias("__me"), cos.alias("__cos"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.avg("__me"), 6).alias("avg_max_err"),
            F.round(F.max("__me"), 6).alias("worst_max_err"),
            F.round(F.avg("__cos"), 6).alias("avg_cosine"),
        )
    )


def label_norm_stats(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label embedding statistics: vector count and L2-norm
    min/max/mean — the standard sanity pass before ANN indexing or
    cosine-threshold tuning (un-normalized clusters and zero vectors show
    up here first).

    Expression-only (``aggregate`` fold in double precision, matching the
    module's sequential-sum convention): one scan, one partial-aggregated
    shuffle on the label key, no UDFs."""
    n = norm(_dvec(F.col(vec_col)))
    return (
        emb.select(F.col(label_col).alias("label"), n.alias("__norm"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            F.round(F.min("__norm"), 6).alias("min_norm"),
            F.round(F.max("__norm"), 6).alias("max_norm"),
            F.round(F.avg("__norm"), 6).alias("avg_norm"),
        )
    )


def cosine_topk_vectorized(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """NumPy/Arrow variant of :func:`cosine_topk` — the documented
    Pandas-UDF escape hatch for when per-element expression folds become
    the bottleneck on wide vectors: each Arrow batch computes ALL
    query similarities as one BLAS matrix product (``C @ Q.T``) and
    emits only its per-batch top-k per query, so the final exact top-k
    window sees ≤ k·|queries| rows per partition.

    Same contract and schema as :func:`cosine_topk` (self-matches and
    zero-norm vectors excluded, neighbor-id tiebreak).  NumPy sums
    pairwise rather than sequentially, so cosines can differ from the
    fold path in the last ulps — this path is parity-tested against the
    expression baseline, while the expression path remains the
    oracle-gated one.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        emb.filter(F.col(id_col).isin(query_ids))
        .select(id_col, vec_col)
        .collect()  # bounded by the query set, same contract as query_ids
    )
    schema = "query_id long, neighbor_id long, cosine double"
    if not q_rows:
        return emb.sparkSession.createDataFrame([], schema)
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[vec_col]) for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1)

    def part(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            C = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            cn = np.linalg.norm(C, axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                sims = (C @ Q.T) / (cn[:, None] * qn[None, :])
            out = []
            for j in range(len(qids)):
                col = sims[:, j]
                mask = (ids != qids[j]) & np.isfinite(col)
                mids, mcos = ids[mask], col[mask]
                take = np.lexsort((mids, -mcos))[:k]
                out.append(
                    pd.DataFrame(
                        {
                            "query_id": qids[j],
                            "neighbor_id": mids[take],
                            "cosine": mcos[take],
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    partial = emb.select(id_col, vec_col).mapInPandas(part, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partial.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


# ----------------------------------------------------- product quantization

def _sub_slice(col: Column, j: int, sub: int) -> Column:
    """1-based subvector slice j of width ``sub`` (as double array)."""
    return F.slice(_dvec(col), j * sub + 1, sub)


def pq_seeds(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list:
    """Deterministic seed codebooks for product quantization: subspace
    ``j``'s ``k`` centroids are the k lowest-id non-zero vectors' j-th
    subvector slices (the :func:`ivf_seeds` convention, per subspace).
    Returns ``codebooks[m][k] = list[float]`` plus the subvector width on
    the side: ``(codebooks, sub_dim)``."""
    rows = (
        emb.select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v"))
        .withColumn("nv", norm(F.col("v")))
        .filter(F.col("nv") > 0)
        .orderBy("id")
        .limit(k)
        .collect()
    )
    if not rows:
        raise ValueError("no non-zero vectors to seed from")
    d = len(rows[0]["v"])
    if d % m:
        raise ValueError(f"vector dim {d} is not divisible by m={m}")
    sub = d // m
    codebooks = [
        [[float(x) for x in r["v"][j * sub : (j + 1) * sub]] for r in rows]
        for j in range(m)
    ]
    return codebooks, sub


def pq_train(
    emb: DataFrame,
    m: int = 4,
    k: int = 8,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Lloyd's k-means PER SUBSPACE — the product-quantizer trainer
    (Jégou et al. 2011).  Deterministic seed (:func:`pq_seeds`), then each
    round assigns every subvector to its nearest codeword (the same
    zero-shuffle projection as :func:`pq_encode`) and recomputes codewords
    as per-code elementwise means (ONE posexplode + groupBy job per round
    covering ALL subspaces; m·k·sub values to the driver — model
    parameters).  Empty codes keep their previous codeword.  Returns
    ``(codebooks, sub_dim)`` in :func:`pq_encode` shape."""
    import math  # noqa: F401

    codebooks, sub = pq_seeds(emb, m, k, id_col, vec_col)
    base = emb.select(
        F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v")
    )
    for _ in range(iterations):
        enc = _pq_codes_df(base, codebooks, sub)
        means = (
            enc.select(
                F.posexplode("codes").alias("subspace", "code"),
                F.col("v"),
            )
            .select(
                "subspace",
                "code",
                F.posexplode(
                    F.expr("slice(v, subspace * {s} + 1, {s})".format(s=sub))
                ).alias("pos", "x"),
            )
            .groupBy("subspace", "code", "pos")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        acc: dict = {}
        for r in means:
            acc.setdefault((r["subspace"], r["code"]), {})[r["pos"]] = r["mu"]
        new = []
        for j in range(m):
            book = []
            for c in range(k):
                d = acc.get((j, c))
                if d and len(d) == sub:
                    book.append([float(d[i]) for i in range(sub)])
                else:
                    book.append(codebooks[j][c])  # empty code keeps codeword
            new.append(book)
        codebooks = new
    return codebooks, sub


def _pq_dist(vcol: Column, centroid: list[float], j: int, sub: int) -> Column:
    """Squared L2 distance of subvector j to one codeword, decomposed as
    |x|² − 2·x·c + |c|² — every term a SEQUENTIAL fold or a Python-side
    constant, so the doubles are bit-reproducible across engines."""
    x = _sub_slice(vcol, j, sub)
    cl = F.lit([float(v) for v in centroid])
    xx = F.aggregate(x, F.lit(0.0), lambda a, b: a + b * b)
    xc = dot(x, cl)
    cc = float(sum(v * v for v in centroid))
    return xx - 2.0 * xc + F.lit(cc)


def _pq_best_df(base: DataFrame, codebooks: list, sub: int) -> DataFrame:
    """Add one ``__best{j}`` struct column per subspace holding the argmin
    ``(d, i)`` over the subspace's codewords — the shared substrate of
    :func:`pq_encode` (codes = ``.i``, reconstruction error = ``.d``).

    Two deliberate projection layers keep the expression volume linear:
    ``|x|²`` per subspace lands in its OWN projection (``__xx{j}``) so it
    is folded once per row instead of once per codeword (k× duplicate
    work — higher-order folds are interpreted, never codegen'd, so
    Catalyst does not CSE them), and the argmin struct is computed once
    and reused by every consumer instead of re-deriving the candidate
    array per output column.  The arithmetic per candidate is the exact
    :func:`_pq_dist` sequence (|x|² − 2·x·c + |c|²), so results stay
    bit-identical to the per-candidate form.
    """
    m = len(codebooks)
    stepped = base.select(
        "*",
        *[
            F.aggregate(
                _sub_slice(F.col("v"), j, sub), F.lit(0.0),
                lambda a, b: a + b * b,
            ).alias(f"__xx{j}")
            for j in range(m)
        ],
    )
    best_cols = []
    for j in range(m):
        x = _sub_slice(F.col("v"), j, sub)
        cands = F.array(
            *[
                F.struct(
                    (
                        F.col(f"__xx{j}")
                        - 2.0 * dot(x, F.lit([float(v) for v in codebooks[j][c]]))
                        + F.lit(float(sum(v * v for v in codebooks[j][c])))
                    ).alias("d"),
                    F.lit(c).alias("i"),
                )
                for c in range(len(codebooks[j]))
            ]
        )
        best_cols.append(F.array_min(cands).alias(f"__best{j}"))
    return stepped.select("*", *best_cols)


def _pq_drop_internal(df: DataFrame, m: int) -> DataFrame:
    return df.drop(
        *[f"__xx{j}" for j in range(m)], *[f"__best{j}" for j in range(m)]
    )


def _pq_codes_df(base: DataFrame, codebooks: list, sub: int) -> DataFrame:
    m = len(codebooks)
    stepped = _pq_best_df(base, codebooks, sub)
    out = stepped.withColumn(
        "codes", F.array(*[F.col(f"__best{j}")["i"] for j in range(m)])
    )
    return _pq_drop_internal(out, m)


def pq_encode(
    emb: DataFrame,
    codebooks: list,
    sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    with_error: bool = True,
) -> DataFrame:
    """Encode every vector as ``m`` codeword indices — d floats become m
    small ints (d/m·32× compression at k≤256): the ANN memory-budget
    lever beyond int8 (:func:`quantize_embeddings`).

    The encode is a single vectorized Arrow stage: codebooks ship in the
    task closure (m·k·sub doubles — kilobytes), each batch's distances
    are computed with numpy float64 ops sequenced EXACTLY like the
    :func:`_pq_dist` fold (per-dimension accumulation, |x|² − 2·x·c +
    |c|² with the same association), so results stay bit-identical to
    the Catalyst form (:func:`_pq_best_df`, which :func:`pq_train`
    still uses) while running at numpy speed instead of interpreted
    higher-order-function speed (~5× on the encode stage).  No joins,
    no shuffles — one scan-parallel map stage.  Ties pick the lowest
    codeword index (numpy argmin first-minimum == struct ``array_min``
    (d, i) ordering; NaN distances sort last in both).  With
    ``with_error`` the squared reconstruction error rides along (Σ over
    subspaces of the chosen codeword's distance, left-associated) — the
    quality number a compression decision needs, computed in the same
    pass.  Contract (as for :func:`pq_seeds`): fixed-dimension non-null
    vectors — violations fail fast per batch with a readable message
    instead of an opaque numpy traceback.

    Known corner vs the Catalyst form: a row mixing a NaN distance
    (earlier codeword index) with a true +inf distance picks the NaN's
    index here (NaN→inf before argmin), while Spark struct ordering
    ranks NaN above inf and would pick the inf codeword.  Reachable only
    from vectors with inf/NaN components, which the contract excludes.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType, DoubleType, IntegerType, StructField, StructType,
    )

    m = len(codebooks)
    cb = [
        [[float(v) for v in codebooks[j][c]] for c in range(len(codebooks[j]))]
        for j in range(m)
    ]
    # |c|² via the same Python-side sum the literal path used
    cc = [
        [float(sum(v * v for v in row)) for row in cb[j]] for j in range(m)
    ]
    id_field = emb.schema[id_col]
    fields = [
        StructField(id_col, id_field.dataType, id_field.nullable),
        StructField("codes", ArrayType(IntegerType(), False), False),
    ]
    if with_error:
        fields.append(StructField("sq_error", DoubleType(), True))
    schema = StructType(fields)

    def enc(it):
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            vecs = pdf["__v"].to_numpy()
            dim = m * sub
            lengths = {None if v is None else len(v) for v in vecs}
            if None in lengths or len(lengths) > 1 or min(lengths) < dim:
                bad = next(
                    i for i, v in enumerate(vecs)
                    if v is None or len(v) != max(
                        x for x in lengths if x is not None
                    ) or len(v) < dim
                )
                raise ValueError(
                    f"pq_encode: null/ragged/short vector (need fixed "
                    f"dimension >= m*sub={dim}, saw lengths {lengths}; "
                    f"e.g. {id_col}={pdf['__id'].iloc[bad]!r}); the "
                    "contract requires fixed-dimension non-null vectors"
                )
            V = np.stack(vecs).astype(np.float64)
            codes = np.empty((n, m), dtype=np.int32)
            err = np.zeros(n) if with_error else None
            first = True
            for j in range(m):
                X = V[:, j * sub : (j + 1) * sub]
                xx = np.zeros(n)
                for t in range(sub):
                    xt = X[:, t]
                    xx = xx + xt * xt
                D = np.empty((n, len(cb[j])))
                for c in range(len(cb[j])):
                    cvec = cb[j][c]
                    xc = np.zeros(n)
                    for t in range(sub):
                        xc = xc + X[:, t] * cvec[t]
                    D[:, c] = (xx - 2.0 * xc) + cc[j][c]
                best = np.argmin(
                    np.where(np.isnan(D), np.inf, D), axis=1
                )
                codes[:, j] = best
                if with_error:
                    dj = D[np.arange(n), best]
                    err = dj if first else err + dj
                    first = False
            out = {id_col: pdf["__id"], "codes": list(codes)}
            if with_error:
                out["sq_error"] = err
            yield pd.DataFrame(out)

    base = emb.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")
    )
    return base.mapInPandas(enc, schema=schema)


def pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    codebooks: list,
    sub: int,
    n: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by ASYMMETRIC distance computation over PQ codes
    (Jégou et al. 2011 ADC): the query stays full-precision, every
    database vector is its m codeword indices, and the approximate
    squared L2 distance is m TABLE LOOKUPS — the per-query distance
    tables (m×k doubles) are computed driver-side from the bounded query
    set and broadcast, so scoring a 100 TB code table is a projection
    plus one small join, never touching the original vectors.

    ``codes`` accepts a pre-encoded frame (``pq_encode`` output —
    the persisted artifact); otherwise vectors encode on the fly.
    Returns ``(query_id, neighbor_id, approx_sq_dist)`` — n rows per
    query ascending, neighbor id tiebreak, self-matches excluded.

    Float discipline: table entries use the same |x|² − 2x·c + |c|²
    sequential-fold decomposition as :func:`pq_encode`, so a SQL oracle
    reproduces every lookup bit-for-bit.
    """
    if codes is None:
        codes = pq_encode(
            emb, codebooks, sub, id_col=id_col, vec_col=vec_col,
            with_error=False,
        )
    m = len(codebooks)
    qrows = (
        emb.filter(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("qid"), _dvec(F.col(vec_col)).alias("v"))
        .collect()
    )

    def table(qv) -> list[list[float]]:
        out = []
        for j in range(m):
            x = [float(t) for t in qv[j * sub : (j + 1) * sub]]
            xx = 0.0
            for t in x:
                xx = xx + t * t
            row = []
            for c in codebooks[j]:
                xc = 0.0
                for a, b in zip(x, c):
                    xc = xc + a * b
                cc = 0.0
                for b in c:
                    cc = cc + b * b
                row.append(xx - 2.0 * xc + cc)
            out.append(row)
        return out

    spark = emb.sparkSession
    tdf = fsio.tiny_df(
        spark,
        [(int(r["qid"]), table(r["v"])) for r in qrows],
        "query_id long, t array<array<double>>",
    )
    joined = codes.join(
        F.broadcast(tdf), F.col(id_col) != F.col("query_id")
    )
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("t", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    from pyspark.sql import Window

    scored = joined.withColumn("approx_sq_dist", score)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sq_dist").asc(), F.col(id_col)
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            "approx_sq_dist",
        )
    )


def write_pq_index(
    emb: DataFrame,
    path: str,
    m: int = 4,
    k: int = 8,
    codebooks: list | None = None,
    sub: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Materialize the PQ index — the on-disk ANN-compression artifact
    (the :func:`write_ivf_index` convention): the code table as parquet
    plus the codebooks under ``_codebooks`` (the ``_`` prefix hides them
    from parquet data discovery; a probe MUST use the codebooks the codes
    were produced with).  Pass trained ``codebooks`` from
    :func:`pq_train`; defaults to the deterministic seeds.  Returns
    ``(codebooks, sub)``."""
    if codebooks is None:
        codebooks, sub = pq_seeds(emb, m, k, id_col, vec_col)
    assert sub is not None, "sub is required with explicit codebooks"
    codes = pq_encode(
        emb, codebooks, sub, id_col=id_col, vec_col=vec_col, with_error=False
    )
    codes.write.mode("overwrite").parquet(path)
    rows = [
        (j, c, [float(x) for x in codebooks[j][c]])
        for j in range(len(codebooks))
        for c in range(len(codebooks[j]))
    ]
    (
        fsio.tiny_df(
            emb.sparkSession, rows, "subspace int, code int, v array<double>"
        )
        .write.mode("overwrite")
        .parquet(path + "/_codebooks")
    )
    return codebooks, sub


def read_pq_index(spark, path: str):
    """Load an index written by :func:`write_pq_index`: returns
    ``(codes_df, codebooks, sub)`` in exactly the shape
    ``pq_topk(codes=..., codebooks=..., sub=...)`` takes (the codebook
    read is an m·k-row collect — model parameters, the legitimate
    collect)."""
    codes = spark.read.parquet(path)
    rows = spark.read.parquet(path + "/_codebooks").collect()
    m = max(r["subspace"] for r in rows) + 1
    k = max(r["code"] for r in rows) + 1
    books: list = [[None] * k for _ in range(m)]
    sub = None
    for r in rows:
        books[r["subspace"]][r["code"]] = [float(x) for x in r["v"]]
        sub = len(r["v"])
    return codes, books, sub


# ------------------------------------------------------------------ IVF-PQ

def ivfpq_build(
    emb: DataFrame,
    n_cells: int = 8,
    m: int = 4,
    k: int = 8,
    centroids: list | None = None,
    codebooks: list | None = None,
    sub: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The composite large-scale ANN index (FAISS IVFPQ shape, Jégou et
    al. 2011): coarse-quantize every vector to its IVF cell, then
    PQ-encode the RESIDUAL (vector − cell centroid) — residuals are
    smaller and more isotropic than raw vectors, so the same codebook
    budget quantizes them with far less error.

    Returns ``(index_df, centroids, codebooks, sub)`` where ``index_df``
    is ``(id, cell, codes)`` — the artifact to persist partitioned by
    cell (probes then prune to n_probe cells AND never touch raw
    vectors).  ``centroids``/``codebooks`` default to the deterministic
    seeds; pass :func:`ivf_train` / :func:`pq_train` outputs for trained
    quality.  The residual subtraction is a per-cell ``zip_with`` branch
    over inlined centroid literals — the whole build is one projection
    over the scan, zero joins.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_seeds(emb, n_cells, id_col, vec_col)
    )
    assigned = ivf_index(emb, n_cells, id_col, vec_col, centroids=cents)
    resid = _with_residual(assigned, cents)
    if codebooks is None:
        # seed PQ codebooks FROM RESIDUALS (k lowest-id rows' residuals)
        rows = resid.orderBy("id").limit(k).collect()
        if not rows:
            raise ValueError("no vectors to seed from")
        d = len(rows[0]["res"])
        if d % m:
            raise ValueError(f"vector dim {d} is not divisible by m={m}")
        sub = d // m
        codebooks = [
            [
                [float(x) for x in r["res"][j * sub : (j + 1) * sub]]
                for r in rows
            ]
            for j in range(m)
        ]
    assert sub is not None
    coded = _pq_codes_df(
        resid.select("id", "cell", F.col("res").alias("v")), codebooks, sub
    )
    return (
        coded.select("id", "cell", "codes"),
        cents,
        codebooks,
        sub,
    )


def _with_residual(assigned: DataFrame, cents: list) -> DataFrame:
    """``res = v − centroid(cell)`` via chained per-cell branches over
    inlined centroid literals (n_cells branches — a projection, no join)."""
    res = None
    for s in cents:
        cv = F.lit([float(x) for x in s["v"]])
        branch = F.zip_with(F.col("v"), cv, lambda a, b: a - b)
        res = (
            F.when(F.col("cell") == int(s["id"]), branch)
            if res is None
            else res.when(F.col("cell") == int(s["id"]), branch)
        )
    return assigned.withColumn("res", res)


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    index: DataFrame,
    centroids: list,
    codebooks: list,
    sub: int,
    n: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC search over an IVF-PQ index: each query probes its ``n_probe``
    nearest cells (by cosine to the centroids, the :func:`ivf_topk`
    convention) and scores ONLY those cells' codes with per-(query, cell)
    distance tables built from the query's RESIDUAL against that cell —
    m lookups per candidate, raw vectors untouched, candidate volume
    ≈ n_probe/n_cells of the corpus.

    Returns ``(query_id, neighbor_id, approx_sq_dist)`` — n ascending per
    query, neighbor id tiebreak, self-matches excluded.  Table entries
    use the sequential-fold |x|²−2x·c+|c|² decomposition (oracle-exact).
    """
    m = len(codebooks)
    qrows = (
        emb.filter(F.col(id_col).isin(list(query_ids)))
        .select(F.col(id_col).alias("qid"), _dvec(F.col(vec_col)).alias("v"))
        .collect()
    )
    import math

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(y * y for y in b)) or 1.0
        return num / (na * nb)

    rows = []
    for r in qrows:
        qv = [float(x) for x in r["v"]]
        ranked = sorted(
            cents_iter(centroids),
            key=lambda s: (-cos(qv, s["v"]), s["id"]),
        )[: max(1, n_probe)]
        for s in ranked:
            resid = [a - b for a, b in zip(qv, s["v"])]
            table = []
            for j in range(m):
                x = resid[j * sub : (j + 1) * sub]
                xx = 0.0
                for t in x:
                    xx = xx + t * t
                trow = []
                for c in codebooks[j]:
                    xc = 0.0
                    for a, b in zip(x, c):
                        xc = xc + a * b
                    cc = 0.0
                    for b in c:
                        cc = cc + b * b
                    trow.append(xx - 2.0 * xc + cc)
                table.append(trow)
            rows.append((int(r["qid"]), int(s["id"]), table))
    spark = emb.sparkSession
    tdf = fsio.tiny_df(
        spark, rows, "query_id long, __qcell long, t array<array<double>>"
    )
    joined = index.join(
        F.broadcast(tdf),
        (F.col("cell") == F.col("__qcell"))
        & (F.col("id") != F.col("query_id")),
    )
    score = None
    for j in range(m):
        term = F.element_at(
            F.element_at("t", j + 1), F.element_at("codes", j + 1) + 1
        )
        score = term if score is None else score + term
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_sq_dist").asc(), F.col("id")
    )
    return (
        joined.withColumn("approx_sq_dist", score)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .select(
            "query_id", F.col("id").alias("neighbor_id"), "approx_sq_dist"
        )
    )


def cents_iter(centroids: list):
    """Normalize centroid entries (Row or dict) to dicts."""
    return [
        {"id": s["id"], "v": [float(x) for x in s["v"]]} for s in centroids
    ]
