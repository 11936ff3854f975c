"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Design for 100 TB:

* everything is expression-based (whole-stage codegen) — no Python UDFs;
* near-dup detection never materialises the O(n²) pair matrix: candidates
  come from sparse joins (shared shingle / LSH band bucket / SimHash chunk)
  and only candidates are verified;
* all hashing is deterministic and engine-portable (derived from md5), so
  results are reproducible and SQL-oracle-verifiable.

Hash portability: ``cast(conv(substr(md5(s),1,15),16,10) as bigint)`` in
Spark equals ``('0x' || substr(md5(s),1,15))::BIGINT`` in DuckDB/ANSI-ish
SQL — 60 bits of md5, well inside int64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import fsio

#: portable 60-bit string hash (see module docstring)
def _h(expr: str) -> str:
    return f"cast(conv(substr(md5({expr}), 1, 15), 16, 10) as bigint)"


#: MinHash universal-hash modulus — prime 2^31-1 keeps a*x+b inside int64
MINHASH_PRIME = 2_147_483_647


def minhash_coefficients(num_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P via a simple
    LCG — reproducible across engines because the literals are inlined into
    the generated expressions."""
    coeffs = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        a = state % (MINHASH_PRIME - 1) + 1
        state = (state * 1_103_515_245 + 12_345) % (1 << 31)
        b = state % MINHASH_PRIME
        coeffs.append((a, b))
    return coeffs


def tokens(df: DataFrame, text_col: str = "text", output: str = "toks") -> DataFrame:
    """Whitespace tokenization as an array column (JVM-side)."""
    return df.withColumn(output, F.split(F.trim(F.col(text_col)), r"\s+"))


def shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct word n-gram shingles, one row per (id, shingle).

    Pure expression pipeline: split → sliding slices via
    ``transform(sequence(...))`` → ``array_distinct`` → ``explode``.
    The input is repartitioned up to the default parallelism first when
    it arrives badly under-partitioned (single-row-group files) — the
    explosion is the expensive map side of every downstream shuffle, and
    the guard is a no-op on well-partitioned inputs.
    """
    from .util import ensure_min_parallelism

    # the token array is materialized in its OWN projection first: a
    # transform/slice lambda over the inline split expression re-evaluates
    # the regex split per position (O(tokens²) per document — measured 9×
    # on the cdc operator); a column reference is a per-element no-op
    step = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    )
    t = F.col("__t")
    sh = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(t, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", t)))
    return step.select("id", F.explode(F.array_distinct(sh)).alias("shingle"))


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content fingerprint: md5 of normalised text →
    (fingerprint, keep_id, dup_count).  One hash-shuffle; the canonical
    survivor is the minimum id (deterministic)."""
    fp = F.md5(F.lower(F.trim(F.col(text_col))))
    return (
        df.select(fp.alias("fingerprint"), F.col(id_col).alias("id"))
        .groupBy("fingerprint")
        .agg(F.min("id").alias("keep_id"), F.count("*").alias("dup_count"))
    )


def _drop_hot_shingles(
    sh: DataFrame, docs: DataFrame, cap: int | float
) -> DataFrame:
    """Stop-shingle guard: drop shingles whose document frequency exceeds
    ``cap`` — absolute when int, fraction of corpus size when float.  A
    floor of 8 documents keeps tiny corpora exact.

    The hot list is resolved EAGERLY, once: it is tiny by construction
    (shingles in >50% of a corpus are boilerplate — a bounded stop list),
    so one stats job + one driver-side list beats re-deriving stats inside
    every downstream plan branch.  The shingle table is persisted first —
    the stats job doubles as cache materialization, so the expensive
    shingle explosion runs ONCE and every downstream branch (signatures,
    verification, sizes) reads the cache instead of re-exploding
    (ContextCleaner unpersists when the frame is garbage collected).  Most
    corpora have NO hot shingles, making the filter itself free — an
    in-plan anti-join variant was measured in round 4 and REJECTED: it
    removes the build-time driver sync but makes every downstream branch
    of every re-execution pay a broadcast anti-join even when the stop
    list is empty (3× warm regression at sf1), whereas the eager probe's
    work is needed anyway and buys a zero-cost plan for the common case.
    Larger stop lists (>1k) fall back to a broadcast anti-join so the plan
    never embeds an unbounded literal list."""
    from pyspark.storagelevel import StorageLevel

    sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    stats = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    if isinstance(cap, float):
        # the fractional threshold's corpus count stays IN the probe plan
        # (1-row aggregate broadcast into the filter) so the eager resolve
        # below is ONE blocking job, not a docs re-scan plus the collect
        n = docs.agg(F.count(F.lit(1)).alias("__n"))
        hot_df = (
            stats.crossJoin(F.broadcast(n))
            .filter(
                F.col("df")
                > F.greatest(F.lit(8), (F.col("__n") * cap).cast("long"))
            )
            .select("shingle")
        )
    else:
        hot_df = stats.filter(F.col("df") > cap).select("shingle")
    # small stop lists inline as an isin() literal (pushdown-friendly and
    # plan-cacheable); beyond ~1k the embedded literals bloat the plan, so
    # switch to a broadcast anti-join over the PERSISTED list — same
    # semantics, O(1) plan size, and still a one-time stats cost
    hot = [r["shingle"] for r in hot_df.limit(1_001).collect()]
    if not hot:
        return sh
    if len(hot) > 1_000:
        hot_df = hot_df.persist(StorageLevel.MEMORY_AND_DISK)
        return sh.join(F.broadcast(hot_df), "shingle", "left_anti")
    return sh.filter(~F.col("shingle").isin(hot))


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | float | None = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs via sparse shingle join.

    |A∩B| comes from joining the exploded shingle table with itself on the
    shingle value — candidate pairs are only documents *sharing at least one
    shingle*, never the dense O(n²) matrix.

    ``max_shingle_df`` drops ubiquitous shingles (document-frequency cap:
    absolute when int, corpus fraction when float) BEFORE the self-join —
    the standard stop-shingle trick, on by default (0.5: a shingle present
    in more than half the corpus) because a single hot shingle turns the
    self-join quadratic at corpus scale.  Exactness tradeoff: sizes and
    intersections are both computed on the capped shingle sets, so a pair
    whose similarity rests *only* on boilerplate shared by >50% of the
    corpus can shift; pass ``None`` for exact textbook Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    """
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        sh = _drop_hot_shingles(sh, df, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        common.join(sa, F.col("id_a") == F.col("sa.id"))
        .join(sb, F.col("id_b") == F.col("sb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def contamination_pairs(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | float | None = 0.5,
) -> DataFrame:
    """Train/eval contamination check: exact n-gram Jaccard pairs BETWEEN
    two corpora (training data vs a held-out set) — the pre-training
    hygiene step that catches benchmark leakage.

    Same sparse-candidate shape as :func:`jaccard_pairs`, but the shingle
    join is across the two frames, so candidates are only cross-corpus
    documents sharing a shingle — never |corpus|×|heldout| — and the same
    stop-shingle guard applies (``max_shingle_df`` over the COMBINED
    corpus: one boilerplate shingle shared by both sides would otherwise
    make this join quadratic).  Returns (corpus_id, heldout_id, jaccard)
    with jaccard ≥ threshold."""
    if max_shingle_df is not None:
        # the guard caps COMBINED document frequency, so both sides pass
        # through one tagged union (persisted inside _drop_hot_shingles —
        # the dual explosion materializes once for every consumer); sizes
        # come from the CAPPED sets, like jaccard_pairs — intersections
        # and unions must agree on what a shingle is
        sa = shingles(corpus, id_col, text_col, n).withColumn(
            "__side", F.lit("a")
        )
        sb = shingles(heldout, id_col, text_col, n).withColumn(
            "__side", F.lit("b")
        )
        union_ids = corpus.select(F.col(id_col)).unionByName(
            heldout.select(F.col(id_col))
        )
        both = _drop_hot_shingles(
            sa.unionByName(sb), union_ids, max_shingle_df
        )
        sa = both.filter(F.col("__side") == "a").drop("__side")
        sb = both.filter(F.col("__side") == "b").drop("__side")
    else:
        # unguarded path: direct per-frame shingles (a tagged union here
        # would re-explode BOTH corpora for every consumer)
        sa = shingles(corpus, id_col, text_col, n)
        sb = shingles(heldout, id_col, text_col, n)
    na = sa.groupBy("id").agg(F.count("*").alias("n_a"))
    nb = sb.groupBy("id").agg(F.count("*").alias("n_b"))
    common = (
        sa.alias("a")
        .join(sb.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.id").alias("corpus_id"), F.col("b.id").alias("heldout_id")
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(na.withColumnRenamed("id", "corpus_id"), "corpus_id")
        .join(nb.withColumnRenamed("id", "heldout_id"), "heldout_id")
        .select(
            "corpus_id",
            "heldout_id",
            (
                F.col("common")
                / (F.col("n_a") + F.col("n_b") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def source_overlap(
    df: DataFrame,
    by: str = "source",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Dataset-level duplication map: for every pair of ``by`` groups
    (sources/domains/snapshots), the number of DISTINCT n-gram shingles
    they share and the Jaccard of their shingle SETS — the corpus-curation
    view that shows which sources mirror each other before any per-doc
    dedup runs.

    Plan shape: one explode to distinct (group, shingle) pairs (shuffle on
    the shingle — partial-combined distinct), a self-equi-join on the
    shingle, and a pair-keyed count.  Per-shingle join fan-out is bounded
    by the number of GROUPS carrying it (groups are bounded — tens to
    hundreds at any corpus size — so the join never approaches doc-level
    quadratics; the per-doc operators keep the hot-shingle guard for the
    unbounded case).

    Returns (source_a, source_b, shared_shingles, n_a, n_b, jaccard) for
    pairs sharing at least one shingle, jaccard rounded to 6.
    """
    ss = shingles(df, id_col=by, text_col=text_col, n=n).dropDuplicates()
    sizes = ss.groupBy(F.col("id").alias("g")).agg(F.count("*").alias("c"))
    pairs = (
        ss.alias("a")
        .join(
            ss.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("source_a"), F.col("b.id").alias("source_b")
        )
        .agg(F.count("*").alias("shared_shingles"))
    )
    return (
        pairs.join(
            sizes.select(F.col("g").alias("source_a"), F.col("c").alias("n_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("g").alias("source_b"), F.col("c").alias("n_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "shared_shingles",
            "n_a",
            "n_b",
            F.round(
                F.col("shared_shingles")
                / (F.col("n_a") + F.col("n_b") - F.col("shared_shingles")),
                6,
            ).alias("jaccard"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures: min over shingle hashes under ``num_hashes``
    universal hash functions.

    One Arrow ``mapInPandas`` stage per input split — the per-document
    signature depends only on that document's text, so the old
    explode → md5 projection → groupBy(16 min aggs) shape shuffled a
    corpus-sized shingle table to regroup rows that never needed to leave
    their task, and its 100+ generated hash expressions dominated cold
    runs with JIT.  The portable hash scheme is preserved bit-for-bit:
    tokens are the Java ``split('\\s+')`` of the space-trimmed text
    (ASCII whitespace, leading/trailing empty tokens kept exactly as
    Java's limit=-1 split does), shingle hash = first 15 hex digits of
    md5 mod P, signature component i = min((a_i·h + b_i) mod P) in int64
    (a_i, h < 2³¹ so the product never overflows) — verified oracle-exact
    against the same DuckDB SQL as the expression form.
    """
    import numpy as np
    import pandas as pd  # noqa: F401 — mapInPandas yields DataFrames

    from pyspark.sql.types import LongType, StructField, StructType

    coeffs = minhash_coefficients(num_hashes)
    a_arr = [int(a) for a, _ in coeffs]
    b_arr = [int(b) for _, b in coeffs]
    out_schema = StructType(
        [StructField("id", df.schema[id_col].dataType)]
        + [StructField(f"m{i}", LongType()) for i in range(num_hashes)]
    )

    def batches(it):
        import hashlib
        import re

        ws = re.compile(r"[ \t\n\x0b\f\r]+")  # Java \s, ASCII-only

        def grams(text):
            if text is None:
                return [""]
            toks = ws.split(text.strip(" "))  # Spark trim() strips 0x20 only
            if len(toks) < n:
                return [" ".join(toks)]
            return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

        md5 = hashlib.md5
        for pdf in it:
            texts = pdf[text_col]
            counts = np.empty(len(texts), dtype=np.int64)
            flat: list = []
            for row_i, text in enumerate(texts):
                g = grams(text)
                counts[row_i] = len(g)
                flat.extend(g)
            hs = np.fromiter(
                (
                    int(md5(g.encode("utf-8")).hexdigest()[:15], 16)
                    for g in flat
                ),
                dtype=np.int64,
                count=len(flat),
            )
            hs %= MINHASH_PRIME
            # every document yields >= 1 gram (empty text -> [""]), so
            # reduceat offsets are strictly increasing and never empty
            offsets = np.zeros(len(texts), dtype=np.int64)
            np.cumsum(counts[:-1], out=offsets[1:])
            out = {"id": pdf[id_col].to_numpy()}
            for i in range(num_hashes):
                out[f"m{i}"] = np.minimum.reduceat(
                    (a_arr[i] * hs + b_arr[i]) % MINHASH_PRIME, offsets
                )
            yield pd.DataFrame(out)

    return df.select(id_col, text_col).mapInPandas(batches, out_schema)


def _band_buckets(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, key) bucket rows from a signature frame — the banding
    building block shared by the batch candidate join and the streaming
    near-dup filter (streaming/dedup.py)."""
    rows = num_hashes // bands
    band_cols = []
    for bi in range(bands):
        members = [F.col(f"m{bi * rows + r}") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(bi).alias("band"), F.md5(F.concat_ws(",", *members)).alias("key"))
        )
    return sigs.select("id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_band_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Per-document LSH band keys (id, band, key) straight from text —
    signatures + banding in one call (the streaming filter's per-batch
    step; one hash-math implementation for batch and streaming)."""
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    return _band_buckets(sigs, num_hashes, bands)


def minhash_lsh_candidates(
    sigs: DataFrame, num_hashes: int = 16, bands: int = 8
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; documents agreeing on any whole band become a
    candidate pair.  The band bucket join is the only shuffle — candidate
    volume scales with collisions, not n²."""
    buckets = _band_buckets(sigs, num_hashes, bands)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 16,
    bands: int = 8,
    max_shingle_df: int | float | None = 0.5,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: signatures → band candidates → exact
    Jaccard verification of candidates only.

    ``max_shingle_df`` applies the stop-shingle guard (see
    :func:`jaccard_pairs`) to the verification join — candidate pairs all
    sharing one boilerplate shingle otherwise skew a single reducer at
    corpus scale.  Signatures are unaffected (min-hash is per-document).

    Returns (id_a, id_b, jaccard) for verified pairs ≥ threshold.  With 8
    bands × 2 rows the miss probability at j=0.8 is (1-0.8²)^8 ≈ 7e-4 and
    vanishes for the j≥0.95 pairs real corpora plant.
    """
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes)
    cand = minhash_lsh_candidates(sigs, num_hashes, bands)
    sh = shingles(df, id_col, text_col, n)
    if max_shingle_df is not None:
        sh = _drop_hot_shingles(sh, df, max_shingle_df)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("sha")
    b = sh.alias("shb")
    common = (
        cand.join(a, F.col("id_a") == F.col("sha.id"))
        .join(b, (F.col("id_b") == F.col("shb.id")) & (F.col("sha.shingle") == F.col("shb.shingle")))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.alias("sza")
    sb = sizes.alias("szb")
    return (
        common.join(sa, F.col("id_a") == F.col("sza.id"))
        .join(sb, F.col("id_b") == F.col("szb.id"))
        .select(
            "id_a",
            "id_b",
            (
                F.col("common")
                / (F.col("sza.n_sh") + F.col("szb.n_sh") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_clusters(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "id",
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over near-duplicate pairs → cluster labels.

    The missing last step of every near-dup pipeline: pairs (id_a, id_b)
    define an undirected similarity graph; each document gets
    ``cluster = min id reachable from it``, so one canonical survivor per
    component (``keep = id == cluster``).

    Distributed label propagation WITH pointer doubling: every round each
    node (1) adopts the minimum label in its neighborhood, then (2) jumps
    to its label's own label (``cluster ← cluster(cluster)``).  The jump
    compounds label reach geometrically, so convergence is O(log component
    diameter) rounds — a 1000-node near-dup chain (mirror farm) settles in
    ~11 rounds where one-hop propagation needs 1000.  Per-round
    ``localCheckpoint`` truncates lineage (same discipline as
    :func:`~mondrian_olap_spark.hierarchy.closure`).

    Returns (id, cluster, keep).
    """
    # materialized eagerly: edges joins into EVERY propagation round, and
    # the incoming pairs plan is typically the expensive candidate stage
    # (a blocked cosine self-join); without the checkpoint each round
    # re-executes that whole plan (measured: 3 rounds re-ran a 6.4 s pair
    # stage each — 20.8 s for a 106-pair graph)
    edges = (
        pairs.selectExpr("id_a AS src", "id_b AS dst")
        .unionByName(pairs.selectExpr("id_b AS src", "id_a AS dst"))
        .dropDuplicates()
        .localCheckpoint(eager=True)
    )
    labels = ids.select(F.col(id_col).alias("node"), F.col(id_col).alias("cluster"))
    changed = 1
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("cluster").alias("nmin"))
        )
        # one-hop relax: min over own label and neighborhood labels.
        # Checkpointed eagerly — the pointer-doubling self-join below
        # consumes it twice (as the node side AND the lookup side)
        stepped = (
            labels.withColumnRenamed("cluster", "old")
            .join(neighbor_min, "node", "left")
            .select(
                "node",
                "old",
                F.least(
                    F.col("old"), F.coalesce(F.col("nmin"), F.col("old"))
                ).alias("mid"),
            )
            .localCheckpoint(eager=True)
        )
        # pointer doubling: cluster ← cluster(cluster).  A label is always
        # the id of a node reachable from its holder, so the jump stays
        # inside the component and the final labels remain reachable-min
        # ids.  Left join: a label that is its own fixpoint has pmid=mid.
        jump = stepped.selectExpr("node AS pnode", "mid AS pmid")
        new_cluster = F.least(
            F.col("mid"), F.coalesce(F.col("pmid"), F.col("mid"))
        )
        updated = (
            stepped.join(jump, stepped["mid"] == jump["pnode"], "left")
            .select(
                "node",
                new_cluster.alias("cluster"),
                (new_cluster < F.col("old")).alias("__changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        changed = updated.filter(F.col("__changed")).limit(1).count()
        labels = updated.drop("__changed")
        if changed == 0:
            break
    if changed != 0:
        # labels are still moving: a component's diameter exceeds 2^rounds.
        # Returning silently would emit WRONG cluster ids — two documents
        # of one component with different labels — and a dedup keep-list
        # built on them would keep duplicates.  Raise loudly; with pointer
        # doubling the default budget covers diameters up to ~2^20, so
        # hitting this means something is structurally wrong with the
        # pair graph (e.g. ids missing from ``ids``).
        raise RuntimeError(
            f"dedup_clusters did not converge within {max_iterations} "
            "rounds — a near-dup component's diameter exceeds the budget; "
            "raise max_iterations"
        )
    return labels.select(
        F.col("node").alias("id"),
        "cluster",
        (F.col("node") == F.col("cluster")).alias("keep"),
    )


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    n: int = 3,
) -> DataFrame:
    """SimHash signatures over distinct word n-gram features (weight 1).

    Per bit b: sign of Σ_features (bit b of feature-hash ? +1 : -1); the bit
    vector packs into one BIGINT.  Features are shingles rather than single
    tokens — on small-vocabulary corpora token-level SimHash collapses
    (every document shares most tokens), while shingles keep signatures
    document-specific.  Expression pipeline: shingle → explode →
    explode(sequence(0, bits-1)) → groupBy(id) conditional sums — everything
    stays in codegen.
    """
    toks = shingles(df, id_col, text_col, n).withColumn("th", F.expr(_h("shingle")))
    # one conditional-aggregation pass computes every bit sum — no bits×
    # row explosion, single shuffle on the document id
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.expr(f"CASE WHEN (th >> {b}) & 1 = 1 THEN 1 ELSE -1 END")
            ).alias(f"__s{b}")
            for b in range(bits)
        ]
    )
    pack = " + ".join(
        f"(CASE WHEN __s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for b in range(bits)
    )
    return bit_sums.select("id", F.expr(pack).alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
    max_hamming: int = 3,
    chunks: int = 4,
    n: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs with guaranteed-recall chunk blocking.

    Pigeonhole: splitting a ``bits``-bit signature into ``chunks`` equal
    chunks, any pair within hamming distance < ``chunks`` must agree on at
    least one whole chunk — so joining on (chunk_idx, chunk_value) finds
    every pair with distance ≤ chunks-1 without an O(n²) join.  Requires
    ``max_hamming < chunks``.

    Returns (id_a, id_b, hamming) with hamming ≤ max_hamming.
    """
    if max_hamming >= chunks:
        raise ValueError("guaranteed recall needs max_hamming < chunks")
    width = bits // chunks
    sigs = simhash(df, id_col, text_col, bits, n)
    mask = (1 << width) - 1
    chunk_cols = [
        F.struct(
            F.lit(ci).alias("ci"),
            F.shiftright(F.col("simhash"), ci * width).bitwiseAND(F.lit(mask)).alias("cv"),
        )
        for ci in range(chunks)
    ]
    blocks = sigs.select(
        "id", "simhash", F.explode(F.array(*chunk_cols)).alias("c")
    ).select("id", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    a = blocks.alias("a")
    b = blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.ci") == F.col("b.ci"))
            & (F.col("a.cv") == F.col("b.cv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        # filter BEFORE the distinct: the hamming cut commutes with
        # dedup (hamming is a function of the pair), and applying it
        # first shrinks the dedup aggregate from every chunk collision
        # to only near pairs (guide §2.3: aggregate fewer rows)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def pair_recall_report(
    exact_pairs: DataFrame,
    candidate_pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """One-row recall audit of a near-dup candidate generator
    (MinHash-LSH / SimHash / cell-blocked) against the exact pair set —
    the dedup-family counterpart of :func:`~.similarity.recall_report`:
    how many true pairs the blocked path found, as a measured number
    instead of a probability argument.  Pair orientation is normalized
    (least/greatest), so either frame may emit (a,b) or (b,a).  Run it
    on a corpus SAMPLE where the exact all-pairs arm is affordable; the
    recall estimate transfers to the full corpus because banding
    probability depends on similarity, not corpus size."""
    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least(F.col(id_a), F.col(id_b)).alias("__a"),
            F.greatest(F.col(id_a), F.col(id_b)).alias("__b"),
        ).distinct()

    # single pass over the exact arm: a left join against the (distinct)
    # candidate set marks hits, so n_true and n_found come out of ONE
    # aggregation — the crossJoin-of-two-aggregates form executed the
    # expensive exact-pairs plan twice (once per aggregate branch)
    ex = canon(exact_pairs)
    marked = ex.join(
        canon(candidate_pairs).withColumn("__hit", F.lit(1)),
        ["__a", "__b"],
        "left",
    )
    return marked.agg(
        F.count("*").alias("n_true"),
        F.count("__hit").alias("n_found"),
    ).select(
        "n_true",
        "n_found",
        (F.col("n_found").cast("double") / F.col("n_true").cast("double")
         ).alias("recall"),
    )


def decontamination_report(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-eval-document n-gram overlap against the training corpus — the
    GPT-3-style decontamination measurement (Brown et al. 2020 appx. C
    uses 13-grams): for every held-out document, the fraction of its
    distinct word n-grams that occur ANYWHERE in the training corpus.

    Complements :func:`contamination_pairs` (which names the specific
    leaking training documents): this is the benchmark-side summary that
    decides whether an eval is compromised at all, and it is cheaper —
    the corpus side collapses to its distinct n-gram SET first, so every
    n-gram carries df=1 into the join and no stop-shingle guard is
    needed (the join fan-out per n-gram is the number of eval documents
    containing it, never corpus×eval).

    Returns one row per held-out document: ``n_grams`` (distinct
    n-grams, 0 for documents shorter than ``n`` tokens), ``n_hit``
    (how many occur in the corpus), ``hit_fraction`` (NULL when the
    document has no n-grams).
    """
    from .util import ensure_min_parallelism

    def sh(df: DataFrame) -> DataFrame:
        # token array materialized first (see shingles(): inline split in
        # the slice lambda is O(tokens²) per document)
        step = ensure_min_parallelism(df).select(
            F.col(id_col).alias("id"),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
        )
        t = F.col("__t")
        grams = F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))
        # distinct/join on a 60-bit md5-derived hash, not the ~100-byte
        # n-gram string: 6-12× less shuffle payload.  The same hash is
        # computable bit-for-bit in SQL oracles (_h); collisions
        # (~(n_grams)²/2⁶¹) only ever overcount hits, matching the
        # bloom-filter practice of GPT-3-style decontamination
        return (
            step.select(
                "id",
                F.explode(F.array_distinct(grams)).alias("__g"),
            )
            .select("id", F.expr(_h("__g")).alias("g"))
        )

    corpus_set = sh(corpus).select("g").distinct()
    hits = (
        sh(heldout)
        .join(corpus_set.withColumn("__hit", F.lit(1)), "g", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hit"),
        )
    )
    return (
        heldout.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
        )
        .withColumn(
            "hit_fraction",
            F.when(
                F.col("n_grams") > 0,
                F.round(F.col("n_hit") / F.col("n_grams"), 6),
            ),
        )
    )


# ------------------------------------------------------------ bloom filter

#: bits used per bitmap word.  62, not 64: bit positions 62/63 would set
#: the sign bit, where DuckDB's left shift raises an overflow (Spark's
#: wraps) — staying ≤61 keeps every word positive and bit-identical on
#: both engines, which is what makes the filter SQL-oracle-verifiable.
BLOOM_WORD_BITS = 62


def bloom_parameters(n_items: int, fp_rate: float = 0.01) -> tuple[int, int]:
    """Textbook Bloom sizing: optimal ``(m_bits, k)`` for ``n_items`` at a
    target false-positive rate — ``m = -n·ln p / ln²2``, ``k = (m/n)·ln 2``
    (Bloom 1970).  Rounded up to whole words so the bitmap packs exactly."""
    import math

    if n_items <= 0:
        raise ValueError("n_items must be positive")
    if not (0.0 < fp_rate < 1.0):
        raise ValueError("fp_rate must be in (0, 1)")
    m = math.ceil(-n_items * math.log(fp_rate) / (math.log(2) ** 2))
    m = ((m + BLOOM_WORD_BITS - 1) // BLOOM_WORD_BITS) * BLOOM_WORD_BITS
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def _bloom_positions(fp, m_bits: int, k: int) -> list:
    """The ``k`` bit positions for one fingerprint column: independent
    hashes come from salting the portable 60-bit md5 hash with the hash
    index (``'bloom{i}:' || fingerprint``) — deterministic, engine-portable
    (the SQL oracle replays the identical arithmetic), non-negative, so
    ``% m_bits`` needs no sign fix-up."""
    return [
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom{i}:"), fp)), 1, 15),
                16,
                10,
            ).cast("long")
            % m_bits
        )
        for i in range(k)
    ]


def bloom_build(
    df: DataFrame,
    m_bits: int = BLOOM_WORD_BITS << 14,
    k: int = 5,
    text_col: str = "text",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Build a Bloom-filter bitmap over the corpus's content fingerprints,
    as a ``(word BIGINT, bits BIGINT)`` DataFrame of at most
    ``m_bits / 62`` rows (words with no bits set are absent).

    This is the membership artifact for INCREMENTAL ingestion: at 100 TB
    the existing corpus is never rescanned per batch — the bitmap is built
    once (or maintained by OR-merging the bitmap of each accepted batch:
    ``old.unionByName(new).groupBy("word").agg(bit_or)`` — Bloom bitmaps
    compose under bitwise OR), persists in a few MB, and every new crawl
    batch probes it with :func:`bloom_probe`.

    Scale shape: one corpus scan, one shuffle whose key space is the word
    index (≤ m/62 groups; map-side ``bit_or`` partial aggregation collapses
    each task's contribution to at most m/62 rows before the exchange).
    ``fingerprint_col`` names a precomputed fingerprint (see
    :func:`..pipeline.write_fingerprinted`); otherwise the exact-dedup
    normalization (md5 of lower+trim) is computed in the scan.
    """
    if m_bits <= 0 or m_bits % BLOOM_WORD_BITS:
        raise ValueError(f"m_bits must be a positive multiple of {BLOOM_WORD_BITS}")
    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else F.md5(F.lower(F.trim(F.col(text_col))))
    )
    pos = F.explode(F.array(*_bloom_positions(F.col("__fp"), m_bits, k)))
    return (
        df.select(fp.alias("__fp"))
        .where(F.col("__fp").isNotNull())
        .distinct()
        .select(pos.alias("__pos"))
        .groupBy(F.expr(f"__pos div {BLOOM_WORD_BITS}").alias("word"))
        .agg(
            F.expr(
                f"bit_or(shiftleft(1L, cast(__pos % {BLOOM_WORD_BITS} as int)))"
            ).alias("bits")
        )
    )


def bloom_merge(*bitmaps: DataFrame) -> DataFrame:
    """OR-merge Bloom bitmaps built with the SAME (m_bits, k): bitwise OR
    per word index — Bloom bitmaps compose exactly under OR, so the merge
    of per-batch bitmaps is bit-identical to one build over the union
    (pinned by the write/append round-trip tests).  One word-keyed
    aggregation over ≤ m/62 rows per input — bitmap-sized, never
    corpus-sized."""
    if not bitmaps:
        raise ValueError("bloom_merge needs at least one bitmap")
    out = bitmaps[0]
    for b in bitmaps[1:]:
        out = out.unionByName(b)
    return out.groupBy("word").agg(F.expr("bit_or(bits)").alias("bits"))


def write_bloom(
    bitmap: DataFrame, path: str, m_bits: int, k: int
) -> DataFrame:
    """Persist a Bloom membership bitmap as the on-disk dedup artifact
    (the exact-dup analog of :func:`write_minhash_index` /
    :func:`..similarity.write_ivf_index`): the ``(word, bits)`` rows plus
    the sizing parameters under ``_params`` — a probe MUST hash with the
    (m_bits, k) the bitmap was built with, so they are part of the
    artifact.  A bitmap is a few MB at any corpus size (m/62 longs), so
    the artifact is one small parquet.

    The overwrite of an EXISTING artifact is crash-safe: the new bitmap
    is fully written to a sibling ``<path>.__tmp__`` directory first,
    then swapped in with two filesystem renames (via the Hadoop
    FileSystem API, so the swap works on any supported store — local,
    HDFS, object stores).  A failure at any point leaves a complete copy
    of the bitmap on disk: before the swap the old artifact is untouched;
    between the renames the old artifact survives at ``<path>.__old__``
    (restore by renaming it back, or rebuild from the fingerprint store
    via :func:`..pipeline.resize_ingest_state`); stale ``__tmp__`` /
    ``__old__`` directories are cleaned up by the next write."""
    from .. import fsio

    spark = bitmap.sparkSession

    def _write_to(target: str) -> None:
        bitmap.coalesce(1).write.mode("overwrite").parquet(target)
        (
            fsio.tiny_df(
                spark, [(int(m_bits), int(k))], "m_bits long, k int"
            )
            .write.mode("overwrite")
            .parquet(target + "/_params")
        )

    fsio.atomic_overwrite_dir(spark, path, _write_to)
    return bitmap


def read_bloom(spark, path: str) -> tuple[DataFrame, int, int]:
    """Load an artifact written by :func:`write_bloom`: returns
    ``(bitmap, m_bits, k)`` in exactly the shape :func:`bloom_probe`
    takes (the params read is a 1-row collect — model parameters, the
    legitimate collect)."""
    row = spark.read.parquet(path + "/_params").collect()[0]
    return spark.read.parquet(path), int(row["m_bits"]), int(row["k"])


def bloom_append(
    new_docs: DataFrame,
    path: str,
    text_col: str = "text",
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Fold an ACCEPTED batch into a persisted Bloom artifact WITHOUT
    rebuilding over the corpus: build the batch's bitmap with the
    artifact's own (m_bits, k), OR-merge into the stored bitmap, and
    rewrite — bit-identical to one build over corpus ∪ batch (Bloom
    bitmaps compose under OR).  Cost is one batch-sized build plus a
    bitmap-sized merge; the corpus is never rescanned (the exact-dup
    member of the maintenance trio: ``refresh_aggregates`` /
    ``ivf_append`` / ``minhash_index_append``).  Returns the merged
    bitmap."""
    spark = new_docs.sparkSession
    old, m_bits, k = read_bloom(spark, path)
    delta = bloom_build(
        new_docs, m_bits=m_bits, k=k, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    # materialize the merge BEFORE overwriting (eager checkpoint cuts the
    # lineage to the old files — distributed, never a driver collect):
    # a lazy plan would still read the artifact while overwriting it
    merged = bloom_merge(old, delta).localCheckpoint(eager=True)
    return write_bloom(merged, path, m_bits, k)


def bloom_probe(
    df: DataFrame,
    bloom: DataFrame,
    m_bits: int,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str | None = None,
    inline_max_bits: int = 1 << 22,
) -> DataFrame:
    """Probe every document's fingerprint against a bitmap from
    :func:`bloom_build` → ``(id_col, fingerprint, bloom_hit)``.
    ``bloom_hit`` is TRUE iff all ``k`` bits are set — no false negatives,
    ever; false positives at the designed rate.

    Two physical strategies, chosen by bitmap size:

    * ``m_bits ≤ inline_max_bits`` (default 4M bits ≈ 67k-long literal):
      the bitmap is collected once and inlined as an array literal, so the
      probe is a PURE PROJECTION — zero joins, zero shuffles, whole-stage
      codegen (the IVF inlined-centroid pattern).  The literal ships as
      ONE packed string that a foldable ``split``/``cast`` unpacks at
      optimize time, so driver/plan cost is O(1) in bitmap size; codegen
      holds the folded array as a single object REFERENCE in the
      generated class (verified at the full 67,651-word default — the
      Janino 64KB method limit applies to generated source, which stays
      constant-size, not to referenced constants).  This is the hot
      path: a daily batch probes a 1%-fp bitmap of a billion-document
      corpus (~1.4 GB) via the join strategy, but per-source or
      per-shard bitmaps stay comfortably inline.
    * larger bitmaps: explode the k (word, mask) probes, broadcast-join
      the bitmap on the word index, and ``bool_and`` the bit tests back
      per document — one id-keyed aggregation, corpus never touched.
    """
    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else F.md5(F.lower(F.trim(F.col(text_col))))
    )
    probed = df.select(F.col(id_col), fp.alias("fingerprint"))
    positions = _bloom_positions(F.col("fingerprint"), m_bits, k)
    if m_bits <= inline_max_bits:
        words = {r["word"]: r["bits"] for r in bloom.collect()}
        dense = [int(words.get(w, 0)) for w in range(m_bits // BLOOM_WORD_BITS)]
        # one packed-string literal + foldable split/cast (constant-folds
        # to a single array literal) — per-element F.lit would cost one
        # py4j round-trip per word (~30s at the 67k default) and 67k
        # pre-fold expression nodes
        arr = F.split(F.lit(",".join(map(str, dense))), ",", -1).cast(
            "array<long>"
        )
        checks = [
            F.expr(
                f"element_at(__arr, cast(__p{i} div {BLOOM_WORD_BITS} as int) + 1)"
                f" & shiftleft(1L, cast(__p{i} % {BLOOM_WORD_BITS} as int))"
            )
            != 0
            for i in range(k)
        ]
        hit = checks[0]
        for c in checks[1:]:
            hit = hit & c
        # a NULL fingerprint (NULL text) is definitionally not a member —
        # without the coalesce it would propagate NULL and the row would
        # satisfy NEITHER filter(bloom_hit) NOR filter(~bloom_hit)
        # downstream, silently vanishing from incremental_dedup
        hit = F.coalesce(hit, F.lit(False))
        return (
            probed.withColumn("__arr", arr)
            .select(
                "*", *[p.alias(f"__p{i}") for i, p in enumerate(positions)]
            )
            .select(id_col, "fingerprint", hit.alias("bloom_hit"))
        )
    probes = probed.select(
        id_col,
        "fingerprint",
        F.explode(F.array(*positions)).alias("__pos"),
    ).select(
        id_col,
        "fingerprint",
        F.expr(f"__pos div {BLOOM_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(1L, cast(__pos % {BLOOM_WORD_BITS} as int))"
        ).alias("__mask"),
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .groupBy(id_col, "fingerprint")
        .agg(
            F.expr(
                "bool_and(coalesce((bits & __mask) <> 0, false))"
            ).alias("bloom_hit")
        )
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    m_bits: int = BLOOM_WORD_BITS << 14,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    verify: bool = True,
    fingerprint_col: str | None = None,
) -> DataFrame:
    """Exact-dedup a NEW ingest batch against an EXISTING corpus without
    joining the batch to the corpus: Bloom prefilter, then (optionally) an
    exact fingerprint join restricted to the Bloom hits.

    Returns ``(id_col, fingerprint, bloom_hit, is_dup)`` for every new
    document.  Guarantees: ``is_dup ⇒ bloom_hit`` (a Bloom filter has no
    false negatives, so no duplicate ever slips through the prefilter);
    with ``verify=False`` the bitmap's verdict is taken as-is
    (``is_dup = bloom_hit``, overcounting at the designed fp rate — the
    GPT-3 decontamination convention, Brown et al. 2020 appx. C).

    Scale shape: the corpus contributes ONE bitmap build (amortizable
    across batches by persisting :func:`bloom_build`'s output and passing
    it here); the verification join's left side is only the Bloom HITS
    (≈ true dups + fp·|batch|), so the corpus side is hash-joined against
    a sliver — and a corpus laid out by
    :func:`..pipeline.write_fingerprinted` makes that join co-located.
    Misses bypass verification entirely via union.
    """
    fp = (
        F.col(fingerprint_col)
        if fingerprint_col
        else F.md5(F.lower(F.trim(F.col(text_col))))
    )
    bloom = bloom_build(
        corpus, m_bits=m_bits, k=k, text_col=text_col,
        fingerprint_col=fingerprint_col,
    )
    probed = bloom_probe(
        new_docs, bloom, m_bits=m_bits, k=k, id_col=id_col,
        text_col=text_col, fingerprint_col=fingerprint_col,
    )
    if not verify:
        return probed.withColumn("is_dup", F.col("bloom_hit"))
    corpus_fps = (
        corpus.select(fp.alias("__cfp")).where(F.col("__cfp").isNotNull()).distinct()
    )
    hits = (
        probed.filter(F.col("bloom_hit"))
        .join(corpus_fps, F.col("fingerprint") == F.col("__cfp"), "left")
        .select(
            id_col, "fingerprint", "bloom_hit",
            F.col("__cfp").isNotNull().alias("is_dup"),
        )
    )
    misses = probed.filter(~F.col("bloom_hit")).withColumn(
        "is_dup", F.lit(False)
    )
    return hits.unionByName(misses)


# ------------------------------------------- persisted MinHash LSH index

def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Materialize the corpus's LSH band-bucket table — the on-disk
    near-dup artifact for INCREMENTAL ingestion (the MinHash analog of
    :func:`..similarity.write_ivf_index`): ``(id, band, key)`` rows,
    partitioned by band, so each new batch probes the index instead of
    re-fingerprinting the corpus.

    The banding parameters are part of the artifact — a probe MUST band
    its signatures identically — so they persist next to the data under
    ``_params`` (the ``_`` prefix hides the file from parquet data
    discovery).  Band keys compose incrementally: append the accepted
    batch's keys to the index (same parquet layout) and the next batch
    probes the union.  Returns the band-key DataFrame it wrote.
    """
    keys = minhash_band_keys(docs, id_col, text_col, n, num_hashes, bands)
    keys.write.mode("overwrite").partitionBy("band").parquet(path)
    (
        fsio.tiny_df(
            docs.sparkSession,
            [(n, num_hashes, bands)],
            "n int, num_hashes int, bands int",
        )
        .write.mode("overwrite")
        .parquet(path + "/_params")
    )
    return keys


def minhash_index_append(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Append an ACCEPTED batch's band keys to a persisted MinHash index
    WITHOUT re-fingerprinting the corpus: load the artifact's own banding
    parameters (``_params`` — probes and appends must band identically),
    band only the new documents (the same shingle→minhash→band
    projection as the build), and append-write into the band partitions.

    Because band keys are per-document, probes against the appended index
    are IDENTICAL to probes against a from-scratch index of the full
    corpus — so at 100 TB near-dup index maintenance is one batch-sized
    banding job plus a partitioned append (the MinHash analog of
    :func:`..similarity.ivf_append` / ``CubeEngine.refresh_aggregates``).
    Returns the band-key DataFrame appended.
    """
    spark = new_docs.sparkSession
    _, params = read_minhash_index(spark, path)
    keys = minhash_band_keys(
        new_docs, id_col, text_col,
        params["n"], params["num_hashes"], params["bands"],
    )
    keys.write.mode("append").partitionBy("band").parquet(path)
    return keys


def read_minhash_index(spark, path: str) -> tuple[DataFrame, dict]:
    """Load an index written by :func:`write_minhash_index`: returns
    ``(band_keys_df, params)`` in the shape
    :func:`incremental_neardup_pairs` takes (the params read is a 1-row
    collect — model parameters, the legitimate collect)."""
    row = spark.read.parquet(path + "/_params").collect()[0]
    params = {
        "n": int(row["n"]),
        "num_hashes": int(row["num_hashes"]),
        "bands": int(row["bands"]),
    }
    return spark.read.parquet(path), params


def incremental_neardup_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    index: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-dup detection of a NEW ingest batch against an EXISTING corpus:
    band the batch's MinHash signatures, join them against the corpus's
    band-bucket ``index`` (from :func:`write_minhash_index`; derived from
    ``corpus`` when None), and exact-verify the candidate pairs ONLY.

    Returns ``(new_id, corpus_id, jaccard)`` for verified pairs ≥
    ``threshold``.  Scale shape: the corpus text is touched ONLY for
    candidate documents (a semi-join restricts the shingle explosion to
    them before verification), so per-batch cost tracks the batch size
    plus its collisions — never the corpus size.  Banding parameters must
    match the index's (:func:`read_minhash_index` returns them).
    """
    if index is None:
        index = minhash_band_keys(corpus, id_col, text_col, n, num_hashes, bands)
    new_keys = minhash_band_keys(new_docs, id_col, text_col, n, num_hashes, bands)
    # materialized eagerly: the candidate set feeds FIVE downstream
    # branches (both semi-joins, both shingle sides of the verification
    # join, and the join itself) — lazy, each branch re-executes the
    # batch banding + index join; checkpointed, the banding runs once and
    # what persists is candidate PAIRS (batch + collision bound, never
    # corpus-sized).  Note: eager=True runs the banding+index join at
    # CALL time and pins the blocks on executors with truncated lineage;
    # on a cluster with executor decommissioning, swap localCheckpoint
    # for reliable checkpointing (sc.setCheckpointDir + .checkpoint())
    cand = (
        new_keys.select(
            F.col("id").alias("new_id"), "band", "key"
        )
        .join(
            index.select(F.col("id").alias("corpus_id"), "band", "key"),
            ["band", "key"],
        )
        .select("new_id", "corpus_id")
        .dropDuplicates(["new_id", "corpus_id"])
        .localCheckpoint(eager=True)
    )
    # verification shingles ONLY for documents that appear in a candidate
    # pair — the corpus-side semi-join is what keeps a 100 TB corpus out
    # of the verification plan
    new_cand = new_docs.join(
        cand.select(F.col("new_id").alias(id_col)).distinct(), id_col, "semi"
    )
    corpus_cand = corpus.join(
        cand.select(F.col("corpus_id").alias(id_col)).distinct(), id_col, "semi"
    )
    sh_new = shingles(new_cand, id_col, text_col, n)
    sh_corpus = shingles(corpus_cand, id_col, text_col, n)
    sizes_new = sh_new.groupBy("id").agg(F.count("*").alias("n_new"))
    sizes_corpus = sh_corpus.groupBy("id").agg(F.count("*").alias("n_corpus"))
    a = sh_new.alias("sha")
    b = sh_corpus.alias("shb")
    common = (
        cand.join(a, F.col("new_id") == F.col("sha.id"))
        .join(
            b,
            (F.col("corpus_id") == F.col("shb.id"))
            & (F.col("sha.shingle") == F.col("shb.shingle")),
        )
        .groupBy("new_id", "corpus_id")
        .agg(F.count("*").alias("common"))
    )
    return (
        common.join(
            sizes_new.withColumnRenamed("id", "__ni"), F.col("new_id") == F.col("__ni")
        )
        .join(
            sizes_corpus.withColumnRenamed("id", "__ci"),
            F.col("corpus_id") == F.col("__ci"),
        )
        .select(
            "new_id",
            "corpus_id",
            (
                F.col("common")
                / (F.col("n_new") + F.col("n_corpus") - F.col("common"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_collision_report(
    corpus: DataFrame,
    heldout: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Eval-set decontamination by EXACT n-gram collision — the GPT-3 /
    open-LM "13-gram overlap" rule (:func:`contamination_pairs` is the
    Jaccard-threshold near-dup variant; this one flags ANY shared exact
    n-gram, the stricter pre-training hygiene check).

    Returns one row per CONTAMINATED training document: ``(id_col,
    n_grams`` — the document's distinct n-gram count, ``n_shared`` —
    distinct n-grams it shares with the held-out set, ``n_heldout_docs``
    — distinct held-out documents it collides with``)``.  Documents
    shorter than ``n`` tokens have NO n-grams and can never collide
    (deliberately stricter than :func:`shingles`' whole-doc fallback,
    which would flag short near-empty docs against each other).

    Scale shape: n-grams are hashed to the portable md5-prefix BIGINT
    before the cross-corpus equi-join, so the shuffle carries 8-byte
    keys instead of 13-word strings and the join is only over grams
    PRESENT ON BOTH SIDES (hash collisions ~2⁻⁶⁰ — the repo's standard
    fingerprint convention).  ``max_shingle_df`` optionally drops grams
    whose COMBINED document frequency exceeds the cap before joining —
    the stop-shingle guard against a boilerplate gram making the join
    quadratic (13-gram boilerplate is real: licence headers, templated
    disclaimers).
    """
    from .util import ensure_min_parallelism

    def grams(frame: DataFrame, out_id: str) -> DataFrame:
        # token array materialized first (see shingles(): inline split in
        # the slice lambda is O(tokens²) per document)
        step = ensure_min_parallelism(frame).select(
            F.col(id_col).alias(out_id),
            F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
        )
        t = F.col("__t")
        arr = F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(t) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(t, i, n)),
            ),
        ).otherwise(F.expr("array()").cast("array<string>"))
        return (
            step.select(
                out_id,
                F.explode(F.array_distinct(arr)).alias("__g"),
            )
            .withColumn(
                "__h",
                F.conv(F.substring(F.md5("__g"), 1, 15), 16, 10).cast(
                    "long"
                ),
            )
            .drop("__g")
        )

    from pyspark.storagelevel import StorageLevel

    # the corpus gram table feeds BOTH the per-doc totals and the
    # cross-corpus join — persist so the explode+md5 map pass runs once
    # (ContextCleaner unpersists when the frame is collected away);
    # counts below are DISTINCT at HASH granularity on both sides so
    # gram totals and shared counts live in the same space
    cg = grams(corpus, "__cid").persist(StorageLevel.MEMORY_AND_DISK)
    hg = grams(heldout, "__hid")
    # per-document distinct gram totals come from the UNFILTERED corpus
    # table: n_grams is the document's real n-gram count whether or not
    # the stop-shingle cap below drops hot grams from the join (otherwise
    # the cap would silently inflate n_shared/n_grams ratios)
    totals = cg.groupBy("__cid").agg(
        F.countDistinct("__h").alias("n_grams")
    )
    if max_shingle_df is not None:
        # combined document frequency counts (side, id) pairs — corpus
        # and held-out id spaces may overlap (an independent eval set
        # often reuses small integer ids), and an id collision must not
        # collapse two documents into one
        combined = cg.select(
            F.lit(0).alias("__side"), F.col("__cid").alias("__id"), "__h"
        ).unionByName(
            hg.select(
                F.lit(1).alias("__side"), F.col("__hid").alias("__id"), "__h"
            )
        )
        hot = (
            combined.groupBy("__h")
            .agg(F.countDistinct("__side", "__id").alias("__df"))
            .filter(F.col("__df") > int(max_shingle_df))
            .select("__h")
        )
        cg = cg.join(hot, "__h", "left_anti")
        hg = hg.join(hot, "__h", "left_anti")
    hits = (
        cg.join(hg, "__h")
        .groupBy("__cid")
        .agg(
            F.countDistinct("__h").alias("n_shared"),
            F.countDistinct("__hid").alias("n_heldout_docs"),
        )
    )
    return (
        hits.join(totals, "__cid")
        .select(
            F.col("__cid").alias(id_col),
            "n_grams",
            "n_shared",
            "n_heldout_docs",
        )
    )


def lsh_parameters(
    threshold: float,
    max_hashes: int = 128,
    fn_weight: float = 1.0,
) -> dict:
    """Choose MinHash-LSH ``(num_hashes, bands)`` for a target Jaccard
    ``threshold`` — the standard banding analysis (Mining of Massive
    Datasets §3.4): with b bands of r rows the candidate probability at
    similarity s is ``1 - (1 - s^r)^b``, an S-curve whose inflection sits
    near ``(1/b)^(1/r)``.  The search minimizes the integrated error

        ∫₀ᵗ P(s) ds  (false positives)  +  fn_weight · ∫ₜ¹ (1 - P(s)) ds

    over all (b, r) with b·r ≤ max_hashes — weight false negatives
    higher (``fn_weight > 1``) when missing a near-dup costs more than
    verifying a spurious candidate (verification is cheap here: the
    banded join only creates candidates, exact similarity still decides).

    Driver-side closed-form arithmetic (no Spark job); returns
    ``{"num_hashes", "bands", "rows", "inflection", "fp_area",
    "fn_area", "kwargs"}`` — pass ``**result["kwargs"]`` (exactly
    ``num_hashes`` and ``bands``) to :func:`minhash_lsh_pairs` /
    :func:`write_minhash_index`.
    """
    if not (0.0 < threshold < 1.0):
        raise ValueError("threshold must be in (0, 1)")
    best = None
    steps = 1000
    for b in range(1, max_hashes + 1):
        for r in range(1, max_hashes // b + 1):
            fp = fn = 0.0
            for i in range(steps):
                s = (i + 0.5) / steps
                p = 1.0 - (1.0 - s**r) ** b
                if s < threshold:
                    fp += p / steps
                else:
                    fn += (1.0 - p) / steps
            err = fp + float(fn_weight) * fn
            if best is None or err < best[0]:
                best = (err, b, r, fp, fn)
    _, b, r, fp, fn = best
    return {
        "num_hashes": b * r,
        "bands": b,
        "rows": r,
        "inflection": (1.0 / b) ** (1.0 / r),
        "fp_area": fp,
        "fn_area": fn,
        "kwargs": {"num_hashes": b * r, "bands": b},
    }


def duplicated_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "first",
) -> DataFrame:
    """Exact duplicated-substring spans across the corpus — the
    ExactSubstr rule of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2022), shingle-approximated: a token span
    is duplicated when every rolling ``n``-token window inside it occurs
    more than once in the corpus.  Unlike :func:`..text.segment_dedup`'s
    NON-overlapping fixed windows, rolling shingles catch duplicated
    passages at ANY alignment (a copied paragraph offset by three tokens
    still matches).

    ``keep='first'`` exempts each shingle's first occurrence in
    ``(doc_id, position)`` order — one copy of every duplicated passage
    survives, deterministically and layout-independently;
    ``keep='none'`` flags every occurrence (the scrub-everything form
    for eval-set leakage).

    Returns merged maximal spans ``(id_col, start_tok, end_tok,
    n_shingles)`` with 1-based inclusive token bounds.

    Scale shape: shingles hash to the md5-prefix BIGINT (8-byte shuffle
    keys); duplicate detection is ONE fingerprint aggregation whose hot
    keys partial-aggregate map-side (no window over the fingerprint —
    the same skew discipline as segment_dedup); the flag join back is a
    plain equi-join (AQE skew-splittable); span merging is a per-document
    window (bounded by document length).  Documents shorter than ``n``
    tokens have no shingles and are never flagged.
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    from pyspark.storagelevel import StorageLevel

    grams = _grams_with_pos(df, n, id_col, text_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    dup = grams.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min(F.struct("__id", "__pos")).alias("__keeper"),
    ).filter(F.col("__cnt") >= 2)
    flagged = grams.join(dup, "__h")
    if keep == "first":
        flagged = flagged.filter(
            (F.col("__id") != F.col("__keeper.__id"))
            | (F.col("__pos") != F.col("__keeper.__pos"))
        )
    # merge overlapping/adjacent shingle intervals [pos, pos+n-1] into
    # maximal spans (gaps-and-islands per document)
    return _merge_flagged_spans(flagged, n, id_col)


def remove_duplicated_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep: str = "first",
    spans: DataFrame | None = None,
) -> DataFrame:
    """Apply :func:`duplicated_spans`: rebuild each document's text with
    the flagged token ranges removed (pass a precomputed ``spans`` frame
    to skip re-detection).  Returns ``(id_col, n_tokens, n_removed,
    clean_text)`` for EVERY input document — untouched docs pass through
    with ``n_removed = 0``.

    The removal is expression-only: the document's spans aggregate to a
    bounded array (documents have bounded span counts), joined back on
    the doc id, and the token filter is a higher-order ``F.filter`` +
    ``exists`` over that array — no UDFs, one doc-keyed shuffle."""
    if spans is None:
        spans = duplicated_spans(
            df, n=n, id_col=id_col, text_col=text_col, keep=keep
        )
    span_arrays = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("__spans")
    )
    t = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = df.select(
        id_col, F.col(text_col), t.alias("__toks")
    ).join(span_arrays, id_col, "left")
    empty = F.expr("array()").cast(
        "array<struct<start_tok:bigint,end_tok:bigint>>"
    )
    # the normalized span array and the kept-token array each land in
    # their own column: the exists lambda probes the spans PER TOKEN (an
    # inline coalesce+cast would be re-built per probe), and kept feeds
    # BOTH n_removed and the rebuilt text (an inline filter would run
    # the token×span scan twice per row) — see shingles() on the cost of
    # non-column expressions inside per-element lambdas
    toks = toks.withColumn(
        "__spansx",
        F.coalesce(
            F.col("__spans").cast(
                "array<struct<start_tok:bigint,end_tok:bigint>>"
            ),
            empty,
        ),
    )
    # keep token i (1-based) iff no span covers it
    toks = toks.withColumn(
        "__kept",
        F.filter(
            F.zip_with(
                F.col("__toks"),
                F.sequence(F.lit(1), F.size("__toks")),
                lambda tok, i: F.struct(tok.alias("t"), i.alias("i")),
            ),
            lambda s: ~F.exists(
                F.col("__spansx"),
                lambda sp: (s["i"] >= sp["start_tok"])
                & (s["i"] <= sp["end_tok"]),
            ),
        ),
    )
    kept = F.col("__kept")
    return toks.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.size(kept)).alias("n_removed"),
        F.array_join(F.transform(kept, lambda s: s["t"]), " ").alias(
            "clean_text"
        ),
    )


def _grams_with_pos(
    df: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """Rolling ``n``-token shingle hashes with 1-based token positions —
    the shared explode behind :func:`duplicated_spans` and the
    incremental shingle-store probe."""
    from .util import ensure_min_parallelism

    # token array materialized first (see shingles(): inline split in
    # the slice lambda is O(tokens²) per document)
    step = ensure_min_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    )
    t = F.col("__t")
    return (
        step.select(
            "__id",
            F.posexplode(
                F.when(
                    F.size(t) >= n,
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - (n - 1)),
                        lambda i: F.concat_ws(" ", F.slice(t, i, n)),
                    ),
                ).otherwise(F.expr("array()").cast("array<string>"))
            ).alias("__p0", "__g"),
        )
        .select(
            "__id",
            (F.col("__p0") + 1).alias("__pos"),
            F.expr(_h("__g")).alias("__h"),
        )
    )


def _merge_flagged_spans(
    flagged: DataFrame, n: int, id_col: str
) -> DataFrame:
    """Gaps-and-islands merge of flagged shingle positions into maximal
    spans (shared tail of the batch and incremental span-dedup paths)."""
    from pyspark.sql import Window

    w = Window.partitionBy("__id").orderBy("__pos")
    wrun = (
        Window.partitionBy("__id")
        .orderBy("__pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = (
        flagged.select("__id", "__pos")
        .dropDuplicates()
        .withColumn(
            "__prev_max_end", F.max(F.col("__pos") + (n - 1)).over(wrun)
        )
        .withColumn(
            "__new_island",
            F.when(
                F.col("__prev_max_end").isNull()
                | (F.col("__pos") > F.col("__prev_max_end") + 1),
                1,
            ).otherwise(0),
        )
        .withColumn("__island", F.sum("__new_island").over(w))
    )
    return (
        marked.groupBy(F.col("__id").alias(id_col), "__island")
        .agg(
            F.min("__pos").alias("start_tok"),
            (F.max("__pos") + (n - 1)).alias("end_tok"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .drop("__island")
    )


def write_shingle_store(
    docs: DataFrame,
    path: str,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the corpus's DISTINCT shingle-hash set — the on-disk
    state for INCREMENTAL duplicated-span removal (the ExactSubstr
    analog of :func:`write_minhash_index`): a new batch's passages that
    already exist anywhere in the ingested corpus are found by probing
    this store instead of re-shingling the corpus.

    Stores hashes only (8 bytes/distinct shingle — no ids, no positions:
    an ingest-time probe only needs "seen before").  ``n`` persists
    under ``_params`` (probes must shingle identically).  Returns the
    hash DataFrame it wrote."""
    hashes = _grams_with_pos(docs, n, id_col, text_col).select(
        "__h"
    ).dropDuplicates()
    hashes.write.mode("overwrite").parquet(path)
    (
        fsio.tiny_df(docs.sparkSession, [(n,)], "n int")
        .write.mode("overwrite")
        .parquet(path + "/_params")
    )
    return hashes


def read_shingle_store(spark, path: str) -> tuple[DataFrame, int]:
    row = spark.read.parquet(path + "/_params").collect()[0]
    return spark.read.parquet(path), int(row["n"])


def shingle_store_append(
    accepted_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fold an ACCEPTED batch into the shingle store: shingle ONLY the
    batch (per-batch cost is batch-sized, never corpus-sized) and
    append-write its distinct hashes.  Duplicate hashes across appends
    are harmless — probes are semi-joins — and storage growth from them
    is bounded by re-ingested boilerplate; run
    :func:`compact_shingle_store` periodically to re-distinct the
    store."""
    spark = accepted_docs.sparkSession
    _, n = read_shingle_store(spark, path)
    hashes = _grams_with_pos(accepted_docs, n, id_col, text_col).select(
        "__h"
    ).dropDuplicates()
    hashes.write.mode("append").parquet(path)
    return hashes


def compact_shingle_store(spark, path: str) -> None:
    """Re-distinct the shingle store in place (crash-safe swap via
    :func:`..fsio.atomic_overwrite_dir`) — run after many appends to
    drop cross-batch duplicate hashes."""
    from ..fsio import atomic_overwrite_dir

    store, n = read_shingle_store(spark, path)
    distinct = store.dropDuplicates().localCheckpoint(eager=True)

    def write(target: str) -> None:
        distinct.write.mode("overwrite").parquet(target)
        (
            fsio.tiny_df(spark, [(n,)], "n int")
            .write.mode("overwrite")
            .parquet(target + "/_params")
        )

    atomic_overwrite_dir(spark, path, write)


def probe_duplicated_spans(
    new_docs: DataFrame,
    store_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    dedup_within_batch: bool = True,
) -> DataFrame:
    """Incremental ExactSubstr: duplicated spans of a NEW batch against
    the persisted shingle store (passages already in the ingested
    corpus), plus — with ``dedup_within_batch`` — batch-internal
    duplicates under the same keep-first rule as
    :func:`duplicated_spans`.  Per-batch cost is batch-sized shingling
    plus one semi-join against the store; the corpus text is never
    re-read.  Returns merged spans ``(id_col, start_tok, end_tok,
    n_shingles)`` — feed them to :func:`remove_duplicated_spans` via
    ``spans=``."""
    spark = new_docs.sparkSession
    store, n = read_shingle_store(spark, store_path)
    grams = _grams_with_pos(new_docs, n, id_col, text_col)
    from pyspark.storagelevel import StorageLevel

    grams = grams.persist(StorageLevel.MEMORY_AND_DISK)
    seen = grams.join(store, "__h", "left_semi")
    flagged = seen
    if dedup_within_batch:
        dup = (
            grams.groupBy("__h")
            .agg(
                F.count(F.lit(1)).alias("__cnt"),
                F.min(F.struct("__id", "__pos")).alias("__keeper"),
            )
            .filter(F.col("__cnt") >= 2)
        )
        internal = grams.join(dup, "__h").filter(
            (F.col("__id") != F.col("__keeper.__id"))
            | (F.col("__pos") != F.col("__keeper.__pos"))
        )
        flagged = seen.select("__id", "__pos").unionByName(
            internal.select("__id", "__pos")
        )
    return _merge_flagged_spans(flagged, n, id_col)
