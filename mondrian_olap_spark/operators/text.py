"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Every feature is a single Spark SQL expression over the text column —
whole-stage codegen, no UDFs, trivially SQL-oracle-checkable.  The language
heuristic is stopword-hit voting (deterministic n-gram/stopword approach; a
real fastText-style model would slot in as a Pandas UDF without changing the
plan shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import fsio

#: tiny per-language stopword sets for the voting heuristic
STOPWORDS = {
    "en": ("the", "a", "of", "and", "is", "to", "in"),
    "de": ("der", "die", "das", "und", "ist", "zu", "ein"),
    "fr": ("le", "la", "les", "et", "est", "un", "une"),
    "es": ("el", "los", "las", "y", "es", "un", "una"),
}


def _in_list(vals: tuple[str, ...]) -> str:
    return ", ".join(f"'{v}'" for v in vals)


def _toks(text_col: str) -> str:
    return f"split(trim({text_col}), '\\\\s+')"


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds token/char counts, punctuation + stopword ratios, a composite
    quality score, a bag-of-words fingerprint, and a language guess.

    Columns: n_tokens, n_chars_calc, avg_token_len, punct_ratio,
    stopword_ratio, quality_score, bag_fingerprint, lang_guess.

    The token array and per-language stopword votes materialise ONCE as
    intermediate columns and every feature references them — the text is
    split and lowered a single time per row instead of once per feature
    (Catalyst's subexpression elimination is not guaranteed across
    separate projections; making the sharing explicit is)."""
    from .util import ensure_min_parallelism

    out = ensure_min_parallelism(df).withColumn("__toks", F.expr(_toks(text_col)))
    out = out.withColumn(
        "__ltoks", F.expr("transform(__toks, t -> lower(t))")
    )
    for lang in STOPWORDS:
        out = out.withColumn(
            f"__v_{lang}",
            F.expr(
                f"size(filter(__ltoks, t -> t IN ({_in_list(STOPWORDS[lang])})))"
            ),
        )
    exprs = {
        "n_tokens": "size(__toks)",
        "n_chars_calc": f"length({text_col})",
        # greatest(...,1) guards: empty/whitespace-only docs must yield 0
        # ratios, not ANSI division-by-zero
        "avg_token_len": (
            f"length(regexp_replace({text_col}, '\\\\s', '')) * 1.0 "
            "/ greatest(size(__toks), 1)"
        ),
        "punct_ratio": (
            f"length(regexp_replace({text_col}, '[A-Za-z0-9\\\\s]', '')) * 1.0 "
            f"/ greatest(length({text_col}), 1)"
        ),
        "stopword_ratio": "__v_en * 1.0 / greatest(size(__toks), 1)",
    }
    for name, e in exprs.items():
        out = out.withColumn(name, F.expr(e))
    # composite quality score: length saturation + stopword density +
    # punctuation cleanliness (weights are arbitrary but fixed).  Emitted as
    # DOUBLE: the internal arithmetic is DECIMAL (exact), but DuckDB's
    # round() yields DOUBLE here, and Decimal('0.378000') vs 0.378
    # stringify differently under the driver's value hash.
    out = out.withColumn(
        "quality_score",
        F.expr(
            "cast(round(least(1.0, n_tokens / 100.0) * 0.4 + stopword_ratio * 0.4 "
            "+ (1.0 - punct_ratio) * 0.2, 6) as double)"
        ),
    )
    # bag-of-words fingerprint: order-insensitive content identity (md5 of
    # the sorted distinct token list) — catches shuffled near-identical docs
    out = out.withColumn(
        "bag_fingerprint",
        F.expr("md5(concat_ws(' ', array_sort(array_distinct(__toks))))"),
    )
    # stopword-vote language guess with fixed preference order on ties
    out = out.withColumn(
        "lang_guess",
        F.expr(
            """CASE
            WHEN __v_en >= greatest(__v_de, __v_fr, __v_es)
                 AND __v_en > 0 THEN 'en'
            WHEN __v_de >= greatest(__v_fr, __v_es)
                 AND __v_de > 0 THEN 'de'
            WHEN __v_fr >= __v_es AND __v_fr > 0 THEN 'fr'
            WHEN __v_es > 0 THEN 'es'
            ELSE 'und' END"""
        ),
    )
    return out.drop("__toks", "__ltoks", *[f"__v_{lang}" for lang in STOPWORDS])


#: GPT-2-style pretokenizer pattern, simplified to the portable regex
#: subset (no lookarounds, no unicode property classes): contractions,
#: letter runs, digit runs, punctuation runs — the standard BPE
#: pre-segmentation whose piece count approximates BPE token count far
#: better than whitespace splitting
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting both ways (the brief's "whitespace + BPE-ish regex"):
    ``n_tokens_ws`` (whitespace pieces) and ``n_tokens_bpe`` (GPT-2-style
    pretokenizer pieces).  Pure ``regexp_extract_all`` projection."""
    c = F.col(text_col)
    return df.withColumn(
        "n_tokens_ws", F.size(F.split(F.trim(c), r"\s+"))
    ).withColumn(
        "n_tokens_bpe",
        F.size(F.regexp_extract_all(c, F.lit(BPE_SPLIT_PATTERN), F.lit(0))),
    )


#: PII patterns shared by the Spark plan and SQL oracles — portable regex
#: subset (no lookarounds/backrefs) so Java and RE2-family engines agree
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}",
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails/phone numbers from a text column — the pre-training PII
    pass.  Pure ``regexp_replace``/``regexp_count`` projection (one codegen
    stage, no UDFs); patterns are engine-portable so the result is
    oracle-checkable.

    Adds ``redacted`` (scrubbed text), ``n_emails``, ``n_phones``.
    Redaction order is fixed (emails first) — part of the contract since
    patterns could in principle overlap."""
    # functions-API (not expr) so regex strings reach the JVM verbatim —
    # no SQL-string-literal backslash escaping to diverge from the oracle
    c = F.col(text_col)
    out = df.withColumn(
        "n_emails", F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["email"]), F.lit(0)))
    ).withColumn(
        "n_phones", F.size(F.regexp_extract_all(c, F.lit(PII_PATTERNS["phone"]), F.lit(0)))
    )
    red = F.regexp_replace(c, PII_PATTERNS["email"], "<EMAIL>")
    red = F.regexp_replace(red, PII_PATTERNS["phone"], "<PHONE>")
    return out.withColumn("redacted", red)


#: Gopher-style quality rule thresholds (Rae et al. 2021 §A1.1 shapes;
#: values tuned to the synthetic corpus so each rule is load-bearing)
QUALITY_RULES = {
    "min_tokens": 20,
    "max_tokens": 100_000,
    "min_avg_token_len": 4.0,
    "max_avg_token_len": 12.0,
    "max_punct_ratio": 0.20,
    "min_stopword_ratio": 0.02,
}


def quality_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Rule-based document filter over :func:`text_features` outputs — the
    repetition/length/symbol heuristics of a Gopher-style quality pass.

    Adds ``keep`` (boolean) and ``drop_reason`` (first failing rule name,
    NULL when kept).  Rules evaluate in a fixed order so the reason is
    deterministic."""
    feats = text_features(df, text_col)
    r = QUALITY_RULES
    reason = (
        # explicit NULL-text rule first: every threshold comparison below
        # is NULL (hence no-opinion) on NULL text, which would otherwise
        # fall through to keep=true
        F.when(F.col(text_col).isNull(), "null_text")
        .when(F.col("n_tokens") < r["min_tokens"], "too_short")
        .when(F.col("n_tokens") > r["max_tokens"], "too_long")
        .when(F.col("avg_token_len") < r["min_avg_token_len"], "tokens_too_short")
        .when(F.col("avg_token_len") > r["max_avg_token_len"], "tokens_too_long")
        .when(F.col("punct_ratio") > r["max_punct_ratio"], "too_much_punct")
        .when(F.col("stopword_ratio") < r["min_stopword_ratio"], "too_few_stopwords")
    )
    return feats.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def repetition_features(
    df: DataFrame, text_col: str = "text", n: int = 2
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 repetition
    rules): ``dup_token_fraction`` (1 − distinct/total tokens) and
    ``top_ngram_fraction`` — the token share attributable to the single
    most frequent word n-gram, computed as ``count × n / tokens`` and
    CLAMPED to [0, 1] (overlapping occurrences double-count positions, so
    the raw product upper-bounds true coverage; the clamp keeps the value
    a fraction for threshold rules).  Pure expressions — per-row O(d²)
    over the distinct n-grams of ONE document (documents are short; the
    corpus axis stays linear), whole-stage codegen, SQL-oracle-checkable.

    Both fractions emit as DOUBLE rounded to 6 (the driver-hash-safe
    numeric edge)."""
    # grams derive from the ALREADY-materialized __toks column — building
    # them from the raw split expression would re-tokenize per reference
    # (Catalyst does not guarantee subexpression elimination here)
    grams = (
        f"CASE WHEN size(__toks) >= {n} THEN "
        f"transform(sequence(1, size(__toks) - {n - 1}), "
        f"i -> concat_ws(' ', slice(__toks, i, {n}))) "
        f"ELSE array(concat_ws(' ', __toks)) END"
    )
    from .util import ensure_min_parallelism

    out = ensure_min_parallelism(df).withColumn("__toks", F.expr(_toks(text_col))).withColumn(
        "__grams", F.expr(grams)
    )
    out = out.withColumn(
        "dup_token_fraction",
        F.expr(
            "cast(round(1.0 - size(array_distinct(__toks)) * 1.0 "
            "/ greatest(size(__toks), 1), 6) as double)"
        ),
    ).withColumn(
        "top_ngram_fraction",
        F.expr(
            f"cast(round(least(1.0, "
            f"array_max(transform(array_distinct(__grams), "
            f"g -> size(filter(__grams, x -> x = g)))) * {n} * 1.0 "
            f"/ greatest(size(__toks), 1)), 6) as double)"
        ),
    )
    return out.drop("__toks", "__grams")


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 100,
    overlap: int = 10,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a pretraining pipeline (each chunk
    feeds the tokenizer independently; ``overlap`` preserves cross-boundary
    context).

    Expression-only: window start positions via ``sequence`` with stride
    ``chunk_tokens - overlap``, chunk text via ``slice`` + explode — one
    scan, no UDFs, output rows ≈ corpus tokens / stride.  Returns
    (id, chunk_idx, chunk_n_tokens, chunk_text) with 1-based chunk_idx;
    a document shorter than one chunk yields exactly one chunk."""
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than chunk_tokens "
            f"({chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    starts = (
        f"CASE WHEN size(__toks) <= {chunk_tokens} THEN array(1) "
        f"ELSE sequence(1, size(__toks) - {overlap}, {stride}) END"
    )
    staged = df.select(
        F.col(id_col).alias("id"), F.expr(_toks(text_col)).alias("__toks")
    ).select(
        "id",
        "__toks",
        F.posexplode(F.expr(starts)).alias("__pos", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start"), chunk_tokens)
    return staged.select(
        "id",
        (F.col("__pos") + 1).alias("chunk_idx"),
        F.size(chunk).alias("chunk_n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def rolling_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    window: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints: k-gram rolling hashes, minimum per
    sliding window (Schleimer et al. winnowing) — the standard
    plagiarism/near-dup fingerprint.  Expression-only: k-gram hashes via the
    portable md5 hash, window minima via ``transform`` over index sequences.

    Returns (id, fingerprint) exploded — one row per selected fingerprint.
    """
    t = f"split(trim({text_col}), '\\\\s+')"
    kgrams = (
        f"transform(sequence(1, greatest(size({t}) - {k - 1}, 1)), "
        f"i -> cast(conv(substr(md5(concat_ws(' ', slice({t}, i, {k}))), 1, 15), 16, 10) as bigint))"
    )
    # materialise the k-gram array once; the window pass then slices it
    # instead of recomputing every hash per window position
    staged = df.select(F.col(id_col).alias("id"), F.expr(kgrams).alias("__grams"))
    windows = (
        f"transform(sequence(1, greatest(size(__grams) - {window - 1}, 1)), "
        f"i -> array_min(slice(__grams, i, {window})))"
    )
    return staged.select(
        "id", F.explode(F.array_distinct(F.expr(windows))).alias("fingerprint")
    )


def tfidf_top_terms(df: DataFrame, n: int = 20, text_col: str = "text") -> DataFrame:
    """Corpus-level TF-IDF term ranking: for every term, total occurrences
    (tf), document frequency (df), and ``weight = tf * ln(N/df)``; the top
    ``n`` terms by weight (term as deterministic tiebreak).

    Plan shape: one explode + two-level aggregation (partial map-side
    combine on term), corpus size attached by broadcast — no collect, no
    UDF; top-n is a TakeOrdered, never a full sort at scale.
    """
    toks = df.select(
        F.col("doc_id"), F.explode(F.expr(_toks(text_col))).alias("term")
    ).filter(F.col("term") != "")
    stats = toks.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    total = df.select(F.count("*").alias("__n"))
    scored = stats.crossJoin(F.broadcast(total)).withColumn(
        "weight",
        F.round(F.col("tf") * F.log(F.col("__n") / F.col("df")), 6),
    )
    return (
        scored.orderBy(F.col("weight").desc(), F.col("term"))
        .limit(n)
        .select("term", "tf", "df", "weight")
    )


def select_top_quality(
    df: DataFrame, k: int, by: str = "source", text_col: str = "text"
) -> DataFrame:
    """Quality-based selection: keep the ``k`` highest-quality documents
    per ``by`` group, ranked by the composite ``quality_score`` from
    :func:`text_features` (doc id as deterministic tiebreak).

    The standard "take the best N per domain/source" curation step — a
    single ranking window over expression-computed features."""
    from pyspark.sql import Window

    feats = text_features(df, text_col=text_col)
    w = Window.partitionBy(by).orderBy(
        F.col("quality_score").desc(), F.col("doc_id")
    )
    return (
        feats.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def segment_dedup(
    df: DataFrame,
    seg_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide segment-level dedup (the C4 "remove repeated lines"
    cleaning rule, with fixed ``seg_tokens``-token windows standing in for
    lines — this corpus has no newlines): every non-overlapping token
    segment that occurs more than once across the corpus is removed from
    all but its first occurrence (ordered by (doc, position) —
    deterministic and layout-independent).

    Returns one row per document: ``n_segments``, ``n_kept``, and
    ``clean_text`` (the surviving segments re-joined in order; may be
    empty when every segment was seen earlier).

    Plan: explode → per-segment first-occurrence via ``min(struct(id,
    pos))`` aggregation + an equi-join back on the fingerprint → one
    grouped re-assembly shuffle on the doc id.  The aggregate (not a
    window) is the deliberate choice for skew: a hot boilerplate segment
    partial-aggregates to one row per map task before the shuffle, and
    the join back is a plain equi-join, so AQE skew-join splitting
    applies — a ``row_number`` window over the fingerprint would force
    every occurrence of the hot segment into a single task (window
    partitions cannot be split).
    """
    from .util import ensure_min_parallelism

    # NULL text → '' : split(NULL) is NULL, which would make n_segs NULL
    # and posexplode silently DROP the document from the output.  Token
    # array materialized first (inline split in the slice lambda is
    # O(tokens²) per document — see dedup.shingles).
    step = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
        ).alias("__t"),
    )
    toks = F.col("__t")
    n_segs = F.ceil(F.size(toks) / F.lit(seg_tokens)).cast("int")
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * seg_tokens + 1, seg_tokens)),
    )
    exploded = step.select(
        "id", F.posexplode(segs).alias("pos", "seg")
    )
    firsts = exploded.groupBy("seg").agg(
        F.min(F.struct("id", "pos")).alias("__first")
    )
    flagged = exploded.join(firsts, "seg").withColumn(
        "keep",
        (
            (F.col("id") == F.col("__first.id"))
            & (F.col("pos") == F.col("__first.pos"))
        ).cast("int"),
    )
    return (
        flagged.groupBy("id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("keep").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("keep") == 1,
                                F.struct(F.col("pos"), F.col("seg")),
                            )
                        )
                    ),
                    lambda s: s["seg"],
                ),
            ).alias("clean_text"),
        )
    )


def unigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram (word) entropy in nats — the cheap
    perplexity-style quality signal: low entropy flags repetitive /
    boilerplate documents, abnormally high entropy flags word salad.

    H = ln(N) - (Σ c·ln c)/N over per-word counts c.  The Σ term is a
    sequential fold over the counts sorted by word, so the double-precision
    result is bit-reproducible across engines and partitionings (a plain
    SUM aggregate would sum in partition order).

    Returns (id, n_tokens, n_distinct, entropy) with entropy rounded to
    6 decimals.  ZERO shuffles: the per-word counts are run lengths of
    the per-document SORTED token array, so the whole computation is a
    single projection (array_sort + one expression fold per row) — the
    Σ terms accumulate in the same sorted-word order as the previous
    explode→count→collect shape, so results are bit-identical while the
    two corpus-wide shuffles disappear.
    """
    from .util import ensure_min_parallelism

    arr = F.filter(
        F.array_sort(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ),
        lambda x: x != "",
    )
    out = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"), arr.alias("__arr")
    )
    return _runlength_entropy(out, "n_tokens", "n_distinct", "entropy")


def bigram_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document bigram (adjacent word-pair) entropy in nats — the
    repeated-PHRASE detector :func:`unigram_entropy` cannot see: a
    document cycling one sentence has near-normal unigram entropy but
    collapsed bigram entropy.

    Same deterministic shape as the unigram variant: counts fold
    sequentially sorted by bigram, so the double result is bit-exact
    across engines and partitionings.  Documents with fewer than two
    tokens have no bigrams and drop from the output (both engines).

    Returns (id, n_bigrams, n_distinct_bigrams, bigram_entropy) with the
    entropy rounded to 6 decimals.  ZERO shuffles (see
    :func:`unigram_entropy` — run-length fold over the sorted per-doc
    bigram array).
    """
    from .util import ensure_min_parallelism

    # token array materialized first (inline split in the element_at
    # lambda is O(tokens²) per document — see dedup.shingles)
    step = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
        ).alias("__t"),
    )
    toks = F.col("__t")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = step.select("id", F.array_sort(grams).alias("__arr"))
    return _runlength_entropy(
        out, "n_bigrams", "n_distinct_bigrams", "bigram_entropy"
    )


def _runlength_entropy(
    df: DataFrame, n_col: str, distinct_col: str, ent_col: str
) -> DataFrame:
    """Shared per-row entropy kernel over a SORTED string array column
    ``__arr``: one expression fold tracks (previous element, current run
    length, distinct count, Σ c·ln c), closing each run's term in sorted
    order — the exact term sequence of a sorted (element, count) fold,
    so results are bit-identical to the explode→count→collect shape
    while needing no shuffle at all.  Rows with empty arrays drop (no
    tokens → no distribution)."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("distinct"),
        F.lit(0.0).alias("acc"),
    )
    term = lambda run: run.cast("double") * F.log(run.cast("double"))  # noqa: E731

    def step(st, x):
        closing = F.when(
            st["run"] > 0, st["acc"] + term(st["run"])
        ).otherwise(st["acc"])
        return F.when(
            x.eqNullSafe(st["prev"]),
            F.struct(
                st["prev"].alias("prev"),
                (st["run"] + 1).alias("run"),
                st["distinct"].alias("distinct"),
                st["acc"].alias("acc"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).cast("long").alias("run"),
                (st["distinct"] + 1).alias("distinct"),
                closing.alias("acc"),
            )
        )

    folded = F.aggregate(
        F.col("__arr"),
        init,
        step,
        lambda st: F.struct(
            st["distinct"].alias("distinct"),
            F.when(st["run"] > 0, st["acc"] + term(st["run"]))
            .otherwise(st["acc"])
            .alias("acc"),
        ),
    )
    n = F.size("__arr").cast("long")
    out = df.select(
        "id", n.alias(n_col), folded.alias("__f")
    ).filter(F.col(n_col) > 0)
    ent = F.log(F.col(n_col).cast("double")) - F.col("__f.acc") / F.col(n_col)
    return out.select(
        "id",
        n_col,
        F.col("__f.distinct").alias(distinct_col),
        F.round(ent, 6).alias(ent_col),
    )


def kl_from_corpus(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document KL divergence from the CORPUS unigram distribution —
    the distribution-shift signal: boilerplate and off-domain outliers
    have word distributions far from the corpus average, near-average
    documents score ≈ 0.  ``KL(doc ‖ corpus) = Σ_w p_d(w)·ln(p_d(w) /
    p_c(w))``, always finite (every doc word is in the corpus by
    construction).

    Scale shape: one (doc, word) count aggregate, one word-keyed corpus
    count aggregate (vocabulary-sized — partial-combined, never
    collected), an equi-join on the word, and a per-doc sequential fold
    over counts sorted by word (module convention: bit-reproducible
    doubles).  The corpus total is a 1-row broadcast.

    Returns (id, n_tokens, kl) with kl rounded to 6 decimals.
    """
    from .util import ensure_min_parallelism

    toks = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    counts = toks.groupBy("id", "w").agg(F.count("*").alias("c"))
    corpus = counts.groupBy("w").agg(F.sum("c").alias("cw"))
    total = corpus.agg(F.sum("cw").alias("__N"))
    joined = counts.join(corpus, "w").crossJoin(F.broadcast(total))
    per_doc = joined.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.first("__N").alias("__N"),
        F.array_sort(
            F.collect_list(F.struct(F.col("w"), F.col("c"), F.col("cw")))
        ).alias("__wc"),
    )
    # fixed op order, mirrored verbatim in the SQL oracle:
    # term = c · ln((c · N) / (n_d · cw)); KL = Σ term / n_d
    nd = F.col("n_tokens").cast("double")
    big_n = F.col("__N").cast("double")
    acc = F.aggregate(
        F.col("__wc"),
        F.lit(0.0),
        lambda a, s: a
        + s["c"].cast("double")
        * F.log(
            (s["c"].cast("double") * big_n) / (nd * s["cw"].cast("double"))
        ),
    )
    return per_doc.select(
        "id",
        "n_tokens",
        F.round(acc / nd, 6).alias("kl"),
    )


def inverted_index(
    df: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Term → posting-list inverted index: one row per term with its
    document frequency and the sorted posting list (the retrieval-side
    artifact of a training corpus; also the building block for exact
    contamination lookups).

    ``min_df`` prunes the long hapax tail (most of the index at corpus
    scale).  One explode + distinct + term-keyed shuffle; posting lists
    are sorted arrays, so output is deterministic and layout-independent.
    A term appearing in most of the corpus makes its posting list a giant
    single row — cap consumers should treat df/corpus_size as the stop-
    word signal (same reasoning as the dedup hot-shingle guard).
    """
    from .util import ensure_min_parallelism

    pairs = (
        ensure_min_parallelism(df)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
            ).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    return (
        pairs.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sort_array(F.collect_list("id")).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    top_n: int | None = None,
) -> DataFrame:
    """Adjacent-symbol pair frequencies over BPE pre-tokens — the counting
    kernel of one byte-pair-encoding merge round (Sennrich et al. 2016):
    the most frequent pair is the next merge a BPE trainer would learn.

    Pre-segments with :data:`BPE_SPLIT_PATTERN` (pairs never span
    pre-token boundaries, the GPT-2 convention), then explodes each
    token's adjacent character pairs via ``transform(sequence(...))`` —
    pure expression pipeline, whole-stage codegen, no UDFs.  The
    aggregation is a plain pair-keyed count: partial (map-side) combine
    collapses the explosion before the shuffle, so shuffled bytes are
    bounded by |distinct pairs| per partition (~alphabet², thousands),
    not corpus size — the property that makes one merge round a cheap
    full-corpus pass at 100 TB.

    With ``top_n``, appends a deterministic ``rank`` (count desc, pair
    asc — the BPE merge-priority order) and keeps the top ``top_n``
    pairs; the ranking window runs over the already-tiny aggregate.
    """
    from .util import ensure_min_parallelism

    toks = ensure_min_parallelism(df).select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(BPE_SPLIT_PATTERN), F.lit(0))
        ).alias("t")
    )
    pairs = toks.filter(F.length("t") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("pair")
    )
    out = pairs.groupBy("pair").agg(F.count("*").alias("n_pairs"))
    if top_n is None:
        return out
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("pair"))
    return (
        out.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
    )


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_freq: int = 2,
    max_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Train a byte-pair-encoding merge list (Sennrich et al. 2016) from
    the corpus.  The CORPUS-SIZED work is one Spark aggregation: BPE
    pre-token frequencies (:data:`BPE_SPLIT_PATTERN` segmentation,
    map-side partial combine — the same kernel as
    :func:`bpe_pair_counts`).  The merge loop then runs on the collected
    word-frequency TABLE, which is bounded by the distinct pre-token
    count and capped at the ``max_words`` most frequent (count desc,
    word asc) — the standard practice: every real BPE trainer iterates
    over the word-count dictionary, never the corpus, so a 100 TB train
    costs one corpus pass + an in-memory loop over ≤ max_words entries.

    Deterministic end to end: the word table's cap uses a total order,
    and each round's best pair breaks count ties lexicographically.
    Merging is the classic greedy left-to-right non-overlapping pass.
    Stops early when the best pair's frequency drops below ``min_freq``.
    Returns the ordered merge list ``[(left, right), ...]``.
    """
    words = (
        df.select(
            F.explode(
                F.regexp_extract_all(
                    F.coalesce(F.col(text_col), F.lit("")),
                    F.lit(BPE_SPLIT_PATTERN),
                    F.lit(0),
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("f"))
        .orderBy(F.col("f").desc(), F.col("w"))
        .limit(int(max_words))
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["w"]): int(r["f"]) for r in words if r["w"]
    }
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        counts: dict[tuple[str, str], int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        a, b = best[0]
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + f
        vocab = new_vocab
        merges.append((a, b))
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    output: str = "bpe_tokens",
) -> DataFrame:
    """Segment text with a trained merge list: GPT-2-style application —
    per pre-token, repeatedly merge the pair with the LOWEST merge rank
    until none applies.  The per-word loop is data-dependent, so this is
    the documented Python seam: an Arrow-batched pandas UDF (never
    row-at-a-time), with a per-batch word cache so each distinct word
    segments once per batch regardless of frequency — on natural text
    the cache hit rate makes the pass scan-bound.  Deterministic for a
    fixed merge list.  Returns ``array<string>`` subword tokens whose
    concatenation per pre-token is lossless."""
    import re as _re

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rank = {tuple(m): i for i, m in enumerate(merges)}
    pat = _re.compile(BPE_SPLIT_PATTERN)

    def _encode_word(w: str, cache: dict) -> list[str]:
        hit = cache.get(w)
        if hit is not None:
            return hit
        sym = list(w)
        while len(sym) > 1:
            best_i, best_r = -1, None
            for i in range(len(sym) - 1):
                r = rank.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        cache[w] = sym
        return sym

    # UNannotated on purpose: with `from __future__ import annotations`
    # the pd.Series hints stringify and pandas_udf rejects the signature
    @pandas_udf("array<string>")
    def _bpe(texts):
        cache: dict = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in pat.findall(t or ""):
                toks.extend(_encode_word(w, cache))
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(output, _bpe(F.col(text_col)))


def token_length_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Power-of-two histogram of per-document whitespace token counts —
    the sequence-length profile that sizes packing budgets, context
    windows, and shuffle partition targets before a training run.

    Buckets are exact integer arithmetic (``2^(bitlength(n)-1)`` via
    ``length(bin(n))`` + ``shiftleft``), never float ``log2`` — the same
    value on every engine, no boundary misrounding at exact powers of
    two.  One projection + one tiny aggregation (≤ ~60 buckets), so the
    full-corpus pass is scan-bound at any scale.

    Returns ``bucket_lo`` (inclusive power-of-two lower bound; empty or
    NULL documents count into bucket 1 as a single empty token — the
    whitespace-split convention), ``n_docs``, ``total_tokens``,
    ``min_tokens``/``max_tokens`` within the bucket.
    """
    n = F.size(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    ).cast("long")
    # SQL-form shiftleft: the Python wrapper wants a literal shift amount,
    # the engine itself takes any integer expression
    lo = F.expr("CAST(shiftleft(1, length(bin(greatest(__n, 1))) - 1) AS BIGINT)")
    return (
        df.select(n.alias("__n"))
        .withColumn("bucket_lo", lo)
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__n").alias("total_tokens"),
            F.min("__n").alias("min_tokens"),
            F.max("__n").alias("max_tokens"),
        )
    )


def top_ngrams(
    df: DataFrame,
    n: int = 3,
    top_k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide most frequent word n-grams — the boilerplate /
    template detector run before dedup tuning (frequent n-grams reveal
    navigation chrome, license headers, and generator templates worth a
    targeted strip pass).

    Counts ALL occurrences (not per-doc-distinct like the dedup
    shingles) plus document frequency in one aggregation; documents
    shorter than ``n`` tokens contribute nothing.  The n-gram explosion
    collapses through map-side partial aggregation; the final top-k
    ranking window runs over the n-gram aggregate only after a count
    pre-filter could be applied by the caller — here the aggregate is
    already the small side.  ``rank`` is deterministic (occurrences
    desc, ngram asc).
    """
    from .util import ensure_min_parallelism

    # token array materialized first (inline split in the slice lambda
    # is O(tokens²) per document — see dedup.shingles)
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
    exploded = step.select("id", F.explode(grams).alias("ngram"))
    agg = exploded.groupBy("ngram").agg(
        F.count("*").alias("occurrences"),
        F.countDistinct("id").alias("n_docs"),
    )
    w = Window.orderBy(F.col("occurrences").desc(), F.col("ngram"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
    )


def cms_sketch(
    df: DataFrame,
    text_col: str = "text",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch of token frequencies: a ``(depth, idx, n)`` table
    with at most ``depth * width`` rows REGARDLESS of corpus size — the
    bounded-memory frequency summary for a 100 TB token stream.

    Each token increments one counter per hash row; a token's estimated
    count is the MIN of its ``depth`` counters (:func:`cms_estimate`) and
    never underestimates (overestimate probability falls exponentially in
    ``depth``, magnitude ~ total_tokens / width per row).  The hash is the
    portable md5-prefix bigint (same convention as dedup fingerprints), so
    the sketch is bit-reproducible across engines and partitionings.

    Scale shape: one explode + ONE shuffle of ``depth * width`` cells with
    map-side partial aggregation; sketches from different corpus shards
    merge by summing cells (associative), so incremental maintenance is a
    union + re-aggregate, never a rescan.
    """
    from .util import ensure_min_parallelism

    toks = (
        ensure_min_parallelism(df)
        .select(F.explode(F.expr(_toks(text_col))).alias("token"))
        .where(F.col("token") != "")
    )
    cells = toks.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), d -> struct("
                f"cast(d as int) as depth, "
                f"cast(conv(substr(md5(concat(cast(d as string), ':', token)),"
                f" 1, 15), 16, 10) as bigint) % {width} as idx))"
            )
        ).alias("cell")
    )
    return cells.groupBy(
        F.col("cell.depth").alias("depth"), F.col("cell.idx").alias("idx")
    ).agg(F.count("*").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "token",
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-lookup of token frequencies from a :func:`cms_sketch`:
    ``(token, cms_n)`` where ``cms_n = min`` over the token's ``depth``
    counters (0 if any cell is absent — the token was never seen).

    ``width``/``depth`` must match the sketch they indexed.  The sketch is
    broadcast (≤ depth×width rows by construction), so estimation is a
    map-side join — no shuffle of the query set."""
    cells = queries.select(
        F.col(token_col).alias("token"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {depth - 1}), d -> struct("
                f"cast(d as int) as depth, "
                f"cast(conv(substr(md5(concat(cast(d as string), ':', "
                f"{token_col})), 1, 15), 16, 10) as bigint) % {width} as idx))"
            )
        ).alias("cell"),
    )
    joined = cells.join(
        F.broadcast(sketch),
        (F.col("cell.depth") == F.col("depth"))
        & (F.col("cell.idx") == F.col("idx")),
        "left",
    )
    return joined.groupBy("token").agg(
        F.min(F.coalesce(F.col("n"), F.lit(0))).alias("cms_n")
    )


def bigram_perplexity(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Per-document perplexity under an add-k-smoothed bigram language
    model trained on the corpus itself — the CCNet-style fluency signal:
    machine-generated gibberish, keyword stuffing and wrong-language text
    score high (improbable word transitions), ordinary prose scores low.

    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V)`` with ``V`` the
    unigram vocabulary size; a document's score is the mean negative log
    probability of its bigrams, ``ppl = exp(-mean ln P)``.

    Scale shape: doc-bigram counts (one keyed aggregate), corpus bigram
    and context tables derived by further partial-combined aggregates
    (vocabulary-sized, never collected), equi-joins on the bigram/context
    keys, a 1-row vocabulary broadcast, and the module's deterministic
    sorted-fold for the per-doc sum — bit-reproducible doubles.
    Documents with fewer than two tokens have no bigrams and are absent
    from the result.
    """
    from .util import ensure_min_parallelism

    t = F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+")
    base = ensure_min_parallelism(df)
    # token array materialized first for the pair lambda (inline split
    # re-evaluated per element is O(tokens²) — see dedup.shingles); the
    # vocab explode below evaluates t once per row and stays inline
    stept = base.select(F.col(id_col).alias("id"), t.alias("__t"))
    t2 = F.col("__t")
    pairs = F.when(
        F.size(t2) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t2) - 1),
            lambda i: F.struct(
                F.element_at(t2, i).alias("w1"),
                F.element_at(t2, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bg = stept.select(
        "id", F.explode(pairs).alias("p")
    ).select("id", "p.w1", "p.w2")
    c = bg.groupBy("id", "w1", "w2").agg(F.count("*").alias("c"))
    cb = c.groupBy("w1", "w2").agg(F.sum("c").alias("cb"))
    cx = cb.groupBy("w1").agg(F.sum("cb").alias("cx"))
    vocab = (
        base.select(F.explode(t).alias("w"))
        .where(F.col("w") != "")
        .agg(F.countDistinct("w").alias("__V"))
    )
    joined = (
        c.join(cb, ["w1", "w2"])
        .join(cx, "w1")
        .crossJoin(F.broadcast(vocab))
    )
    per_doc = joined.groupBy("id").agg(
        F.sum("c").alias("n_bigrams"),
        F.first("__V").alias("__V"),
        F.array_sort(
            F.collect_list(F.struct("w1", "w2", "c", "cb", "cx"))
        ).alias("__bc"),
    )
    kk = F.lit(float(k))
    v = F.col("__V").cast("double")
    acc = F.aggregate(
        F.col("__bc"),
        F.lit(0.0),
        lambda a, s: a
        + s["c"].cast("double")
        * F.log(
            (s["cb"].cast("double") + kk)
            / (s["cx"].cast("double") + kk * v)
        ),
    )
    nb = F.col("n_bigrams").cast("double")
    return per_doc.select(
        "id",
        "n_bigrams",
        F.round(-acc / nb, 6).alias("neg_logprob"),
        F.round(F.exp(-acc / nb), 6).alias("ppl"),
    )


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    output: str | None = None,
    form: str = "NFC",
    lowercase: bool = False,
) -> DataFrame:
    """Unicode-normalize a text column — the canonicalization pass a crawl
    corpus needs BEFORE any fingerprint/dedup step (the same logical text
    arrives from the web as composed or decomposed codepoints, and md5
    fingerprints treat them as different documents):

    1. Unicode normalization to ``form`` (NFC default; NFKC folds
       compatibility glyphs too) — the one step Spark has no builtin for,
       done in an Arrow-batched pandas UDF over ``unicodedata`` (the
       stdlib implements the full Unicode algorithm; per-batch transfer,
       never per-row Python);
    2. control characters (C0 + DEL) replaced by spaces — JVM-side regex;
    3. whitespace runs collapsed to single spaces, ends trimmed;
    4. optional lowercasing.

    Steps 2-4 stay in whole-stage codegen; only the normalization itself
    pays the Arrow hop.  Output replaces ``text_col`` unless ``output``
    names a new column.  NULL text stays NULL.
    """
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    # NOTE: unannotated Series-in/Series-out callable — annotations would
    # make pandas_udf try (and fail) to resolve pd.Series from this scope
    def _norm_series(s):
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    _unicode_norm = F.pandas_udf(_norm_series, returnType="string")

    out = output or text_col
    col = _unicode_norm(F.col(text_col))
    col = F.regexp_replace(col, r"[\x00-\x1F\x7F]", " ")
    col = F.trim(F.regexp_replace(col, r"\s+", " "))
    if lowercase:
        col = F.lower(col)
    # preserve NULL: regexp_replace of NULL is NULL already, trim too
    return df.withColumn(out, col)


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    divisor: int = 8,
) -> DataFrame:
    """Content-defined chunking: split each document at token positions
    where the rolling hash of the trailing ``k``-gram ≡ 0 (mod
    ``divisor``) — the FastCDC/rsync boundary rule applied to token
    streams.  Because boundaries depend only on LOCAL content, inserting
    or deleting a prefix shifts positions but not boundary CONTENT: all
    chunks after the first re-synchronized boundary hash identically,
    which is what makes chunk-level dedup robust to edits (fixed-size
    chunking loses alignment at the first insertion).  Expected chunk
    length ≈ ``divisor`` tokens.

    Returns ``(id_col, chunk_id, first_pos, n_tokens, chunk_hash)`` —
    chunk_hash is the md5 of the space-joined chunk tokens (the dedup
    key).  Scale shape: the ENTIRE chunking happens in the scan
    projection as array expressions — boundary positions are a
    ``filter`` over token positions, chunk (start, end) spans pair the
    shifted boundary list with itself, and each chunk hashes a ``slice``
    of the token array — so there is NO per-token explode, NO shuffle
    and NO window: the only row expansion is the final chunk-level
    ``posexplode`` (a narrow Generate).  A boundary token is the LAST
    token of its chunk (the running-sum convention: chunk membership
    counts boundaries strictly before the position).  Hashing is the
    portable md5-derived 60-bit scheme, so a SQL oracle replays
    boundaries bit-for-bit.
    """
    if k < 1 or divisor < 1:
        raise ValueError("k and divisor must be >= 1")

    # STEPWISE projections: each array lands in its own column before the
    # next step references it, so every lambda reference is a cheap
    # attribute lookup.  Inlining instead (one giant expression) makes the
    # per-position lambda re-evaluate the full regex split per element —
    # O(tokens²) work per document (measured 15× slower at sf0.1).
    # CollapseProject cannot re-inline the steps: the producers are
    # non-cheap expressions referenced more than once.
    from .util import ensure_min_parallelism

    tcol = F.col("__t")
    h = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    # the per-document gram hashing below is the expensive map-side work;
    # a single-row-group input would run it all in ONE task (ratio 1.01 in
    # the round-12 scaling block).  The guard round-robins the SMALL
    # (id, text) rows before the expansion and is a no-op at real scale —
    # same discipline as dedup.shingles; measured 0.88 s -> 0.29 s warm at
    # sf0.1/local[32]
    step1 = ensure_min_parallelism(df).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("__t"),
    )
    # ALL k-grams built as ONE array from k shifted slices folded with
    # zip_with (the _feature_array idiom) instead of a per-position
    # slice+concat_ws lambda: every lambda body below touches only its
    # own element variables, so nothing is re-evaluated per element and
    # the per-position interpreted work drops to one md5 chain (HOFs are
    # CodegenFallback — expression volume inside them is the cost).
    # gram j (0-based) spans tokens j+1..j+k, i.e. ENDS at position j+k.
    cnt = F.size(tcol) - (k - 1)
    joined = F.slice(tcol, 1, cnt)
    for j in range(1, k):
        joined = F.zip_with(
            joined,
            F.slice(tcol, j + 1, cnt),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )
    grams = F.when(F.size(tcol) >= k, joined).otherwise(
        F.expr("array()").cast("array<string>")
    )
    step2 = step1.select("*", grams.alias("__g"))
    # boundary positions, ascending: hash each gram once, keep the END
    # position (j + k) of grams whose hash ≡ 0 (mod divisor) — identical
    # to the old filter over sequence(1, n) with the i >= k guard
    step2 = step2.select(
        "id",
        F.col("__t"),
        F.filter(
            F.transform(
                F.col("__g"),
                lambda g, j: F.when((h(g) % divisor) == 0, j + k),
            ),
            lambda x: x.isNotNull(),
        ).alias("__b"),
    )
    # chunk spans: starts = [1, b+1 ...], ends = [b ..., n]; the trailing
    # span is empty iff the last token is itself a boundary — drop it
    bcol = F.col("__b")
    starts = F.concat(F.array(F.lit(1)), F.transform(bcol, lambda b: b + 1))
    ends = F.concat(bcol, F.array(F.size(tcol)))
    chunks = F.filter(
        F.zip_with(
            starts, ends, lambda s, e: F.struct(s.alias("s"), e.alias("e"))
        ),
        lambda c: c["s"] <= c["e"],
    )
    rows = step2.select(
        "id",
        F.col("__t"),
        F.posexplode(chunks).alias("cix", "c"),
    )
    length = F.col("c.e") - F.col("c.s") + 1
    return rows.select(
        F.col("id").alias(id_col),
        F.col("cix").cast("long").alias("chunk_id"),
        F.col("c.s").alias("first_pos"),
        length.cast("long").alias("n_tokens"),
        F.md5(
            F.concat_ws(" ", F.slice(F.col("__t"), F.col("c.s"), length))
        ).alias("chunk_hash"),
    )


#: script character classes — BMP codepoint ranges written in the
#: \\x{...} syntax both Java regex and RE2 (DuckDB) accept, so the SQL
#: oracle uses the IDENTICAL pattern text.  BMP-only keeps Spark's
#: UTF-16 length() and DuckDB's codepoint length() in agreement.
SCRIPT_CLASSES = {
    "latin": "[A-Za-z\\x{00C0}-\\x{024F}]",
    "cyrillic": "[\\x{0400}-\\x{04FF}]",
    "cjk": "[\\x{3040}-\\x{30FF}\\x{4E00}-\\x{9FFF}]",
    "arabic": "[\\x{0600}-\\x{06FF}]",
    "digit": "[0-9]",
}


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document writing-script profile: the fraction of non-space
    characters in each major script class (Latin, Cyrillic, CJK, Arabic,
    digits) plus the dominant script — the routing signal a multilingual
    corpus needs BEFORE language ID (stopword/n-gram language models are
    per-script; a Cyrillic document scored by a Latin model is noise).

    Counts are ``length(text) − length(regexp_replace(text, class, ''))``
    — pure codegen projections, one pass, no explode.  Ratios divide by
    the non-space character count (0-ratio on empty docs, never a
    division error); ``dominant_script`` is the argmax with a fixed
    preference order on ties, ``'other'`` when nothing matches.
    """
    c = F.col(text_col)
    nonspace = F.length(F.regexp_replace(c, r"\s", ""))
    counts = {
        name: F.length(c) - F.length(F.regexp_replace(c, pat, ""))
        for name, pat in SCRIPT_CLASSES.items()
    }
    out = df.withColumn("n_chars_sig", nonspace)
    denom = F.greatest(F.col("n_chars_sig"), F.lit(1))
    for name in SCRIPT_CLASSES:
        out = out.withColumn(f"{name}_count", counts[name])
        out = out.withColumn(
            f"{name}_ratio",
            F.round(F.col(f"{name}_count").cast("double") / denom, 6),
        )
    best = F.greatest(*[F.col(f"{n}_count") for n in SCRIPT_CLASSES])
    dom = F.lit("other")
    # reversed: earlier names win ties (fixed preference order)
    for name in reversed(list(SCRIPT_CLASSES)):
        dom = F.when(
            (F.col(f"{name}_count") == best) & (best > 0), name
        ).otherwise(dom)
    return out.withColumn("dominant_script", dom).drop(
        *[f"{n}_count" for n in SCRIPT_CLASSES]
    )


def remove_repeated_segments(
    df: DataFrame,
    text_col: str = "text",
    sep: str = ". ",
    output: str | None = None,
) -> DataFrame:
    """Drop REPEATED segments inside each document, keeping first
    occurrences in order — the within-document cousin of
    :func:`segment_dedup` (which dedups across documents): concatenated
    crawl dumps repeat headers/footers/navigation between merged pages,
    and Gopher-style repetition METRICS only flag such documents; this
    operator repairs them.

    Pure array expressions: split on ``sep``, keep element *i* iff its
    first occurrence index is *i* (``array_position`` inside an indexed
    ``filter`` lambda — whole-stage codegen, no explode, no shuffle),
    re-join.  Adds ``n_segments_in`` / ``n_segments_out`` so the drop
    rate is observable; output replaces ``text_col`` unless ``output``
    names a new column.  NULL text passes through NULL.
    """
    out = output or text_col
    # the segment array is materialized once before the dedup lambda: the
    # filter references the array per element (array_position scan), so an
    # inline split would be re-evaluated O(segments²) times per document
    # (see dedup.shingles); the scan itself is the algorithm, the re-split
    # is not
    # operator-prefixed internal names so an input frame that happens to
    # carry a column of the same name is never silently overwritten+dropped
    segs_col, kept_col = "__rrs_segs__", "__rrs_kept__"
    step = df.withColumn(segs_col, F.split(F.col(text_col), _re_escape(sep)))
    segs = F.col(segs_col)
    # the kept array is materialized too: both n_segments_out and the
    # rebuilt text consume it, and the quadratic first-occurrence filter
    # must run once
    step = step.withColumn(
        kept_col,
        F.filter(
            segs,
            lambda x, i: F.array_position(segs, x)
            == (i + F.lit(1)).cast("bigint"),
        ),
    )
    return (
        step.withColumn("n_segments_in", F.size(segs))
        .withColumn("n_segments_out", F.size(F.col(kept_col)))
        .withColumn(out, F.array_join(F.col(kept_col), sep))
        .drop(segs_col, kept_col)
    )


def _re_escape(s: str) -> str:
    """Escape a literal separator for Spark's regex-based split."""
    import re

    return re.escape(s)


def build_vocab(
    df: DataFrame,
    vocab_size: int = 1 << 15,
    text_col: str = "text",
    reserved: tuple[str, ...] = ("<unk>",),
) -> DataFrame:
    """Frequency-ranked token vocabulary: the top ``vocab_size`` corpus
    tokens get ids after the ``reserved`` specials (id 0 = ``<unk>`` by
    default) — deterministic (count desc, token asc tiebreak), so two
    engines and two runs agree on every id.

    One token-keyed count shuffle (map-side combined); the ranking window
    runs over the vocab-sized count table, not the corpus.  Returns
    ``(token, token_id, n_occurrences)``.
    """
    counts = (
        df.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
        # a literal reserved token in the corpus (e.g. a document that
        # contains the string '<unk>') must not earn a SECOND vocab row —
        # the specials own their ids unconditionally
        .where(~F.col("token").isin(list(reserved)) if reserved else F.lit(True))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    ranked = (
        counts.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= vocab_size)
        .select(
            "token",
            (F.col("__r") - 1 + len(reserved)).alias("token_id"),
            "n_occurrences",
        )
    )
    spark = df.sparkSession
    spec = fsio.tiny_df(
        spark,
        [(t, i, 0) for i, t in enumerate(reserved)],
        "token string, token_id bigint, n_occurrences bigint",
    )
    return spec.unionByName(ranked)


def tokens_to_ids(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    output: str = "token_ids",
    unk_id: int = 0,
    broadcast_threshold: int = 1 << 20,
) -> DataFrame:
    """Apply a vocabulary to a text column → ``array<bigint>`` token ids,
    out-of-vocabulary tokens mapping to ``unk_id`` — the tokenize-to-ids
    export step in front of sequence packing.

    Physical strategy by vocabulary size: a vocab within
    ``broadcast_threshold`` entries is collected once and inlined as a
    MAP literal, so the whole encode is a pure projection
    (``transform`` + ``element_at`` — zero joins, zero shuffles, codegen).
    The literal is shipped as TWO packed strings (NUL-joined keys,
    comma-joined ids) that ``split``/``cast`` unpack JVM-side; both
    expressions are foldable, so Catalyst constant-folds them into array
    literals ONCE at optimize time.  Plan size and driver work are O(1)
    in vocabulary size — a 1M-entry vocab is two string literals, not 2M
    ``lit`` nodes — which is what makes the default threshold safe at
    production BPE sizes (50k vocab: ~1s to build, vs ~40s with
    per-entry literals).  Keys containing NUL (pathological but legal
    under ``\\s+`` tokenization) fall back to per-element literals.
    Larger vocabularies take the explode → broadcast-join → regroup
    path: ids re-assemble in original token order via the position
    index, ONE doc-keyed shuffle.  Both paths produce identical arrays.
    """
    n = vocab.count()
    if n <= broadcast_threshold:
        # dedup deterministically (smallest id wins) — build_vocab never
        # emits duplicates, but a hand-built vocab might, and
        # map_from_arrays raises on duplicate keys
        mapping: dict[str, int] = {}
        for r in vocab.collect():
            tid = int(r["token_id"])
            tok = r["token"]
            if tok not in mapping or tid < mapping[tok]:
                mapping[tok] = tid
        keys = list(mapping)
        vals = [mapping[k] for k in keys]
        sep = "\x00"
        if not keys:
            m = None
        elif any(sep in k for k in keys):
            m = F.map_from_arrays(
                F.lit(keys), F.lit(vals).cast("array<long>")
            )
        else:
            m = F.map_from_arrays(
                F.split(F.lit(sep.join(keys)), sep, -1),
                F.split(F.lit(",".join(map(str, vals))), ",", -1).cast(
                    "array<long>"
                ),
            )
        toks = F.split(F.trim(F.col(text_col)), r"\s+")
        ids = F.transform(
            toks,
            lambda t: (
                F.coalesce(F.element_at(m, t), F.lit(unk_id)).cast("long")
                if m is not None
                else F.lit(unk_id).cast("long")
            ),
        )
        return df.withColumn(output, ids)
    doc_cols = df.columns
    pos = df.select(
        *doc_cols,
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "__pos", "__tok"
        ),
    )
    # the SAME smallest-id-wins dedup as the inline path — a duplicated
    # vocab token would otherwise match twice in the join and grow every
    # occurrence's array, diverging from the inline result
    vocab_unique = vocab.groupBy("token").agg(
        F.min("token_id").alias("token_id")
    )
    joined = pos.join(
        F.broadcast(
            vocab_unique.select(F.col("token").alias("__tok"), "token_id")
        ),
        "__tok",
        "left",
    ).withColumn(
        "__id", F.coalesce(F.col("token_id"), F.lit(unk_id)).cast("long")
    )
    regrouped = joined.groupBy(*doc_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos", "__id"))),
            lambda s: s["__id"],
        ).alias(output)
    )
    return regrouped


def ids_to_tokens(
    df: DataFrame,
    vocab: DataFrame,
    ids_col: str = "token_ids",
    output: str = "tokens",
    unk_token: str = "<unk>",
    broadcast_threshold: int = 1 << 20,
) -> DataFrame:
    """The inverse of :func:`tokens_to_ids`: decode an ``array<bigint>``
    id column back to tokens — the debugging/inspection step every
    tokenized corpus needs (spot-check a packed sequence, render a
    sample, diff two vocab versions).  Same physical idiom as the
    encoder: the id→token map inlines as TWO packed-string literals
    (comma-joined ids, NUL-joined tokens), constant-folded once, so the
    decode is a pure projection — zero joins, zero shuffles, O(1) plan
    nodes at any vocabulary size.  Ids with several tokens (a hand-built
    vocab) decode to the lexicographically smallest token, mirroring the
    encoder's smallest-id-wins dedup; unknown ids yield ``unk_token``.
    Vocabularies above ``broadcast_threshold`` raise — a decode that big
    should go through an explode + broadcast join the caller controls.
    """
    n = vocab.count()
    if n > broadcast_threshold:
        raise ValueError(
            f"vocabulary has {n} entries (> {broadcast_threshold}); "
            "decode via explode + broadcast join instead of the inline map"
        )
    mapping: dict[int, str] = {}
    for r in vocab.collect():
        tid = int(r["token_id"])
        tok = r["token"]
        if tid not in mapping or tok < mapping[tid]:
            mapping[tid] = tok
    ids = list(mapping)
    toks = [mapping[i] for i in ids]
    sep = "\x00"
    if not ids:
        m = None
    elif any(sep in t for t in toks):
        m = F.map_from_arrays(
            F.lit(ids).cast("array<long>"), F.lit(toks)
        )
    else:
        m = F.map_from_arrays(
            F.split(F.lit(",".join(map(str, ids))), ",", -1).cast(
                "array<long>"
            ),
            F.split(F.lit(sep.join(toks)), sep, -1),
        )
    decoded = F.transform(
        F.col(ids_col),
        lambda i: (
            F.coalesce(F.element_at(m, i.cast("long")), F.lit(unk_token))
            if m is not None
            else F.lit(unk_token)
        ),
    )
    return df.withColumn(output, decoded)


#: the classic UTF-8-as-Latin-1 mojibake signatures: a double-encoded
#: lead byte renders as one of these anchor characters followed by a
#: continuation-range character.  Written as \x{...} codepoint classes —
#: identical pattern text in Java regex and RE2 (DuckDB).
MOJIBAKE_PATTERN = (
    "[\\x{00C2}\\x{00C3}\\x{00C4}\\x{00C5}][\\x{0080}-\\x{00BF}]"
)


def mojibake_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Encoding-damage signals per document — the crawl-hygiene check for
    text that went through a wrong-charset decode:

    * ``n_mojibake``: occurrences of the UTF-8-as-Latin-1 double-encoding
      signature (Ã/Â/Ä/Å followed by a continuation-range character —
      'café' mangled to 'cafÃ©');
    * ``n_replacement``: U+FFFD replacement characters (a decoder already
      gave up there);
    * ``mojibake_ratio``: damaged characters per non-space character.

    Pure length-difference regex counting (the :func:`script_profile`
    technique) — one codegen pass, no tokenization.
    """
    c = F.col(text_col)
    moji = (
        F.length(c)
        - F.length(F.regexp_replace(c, MOJIBAKE_PATTERN, ""))
    ) / 2  # each hit is 2 chars
    repl = F.length(c) - F.length(
        F.regexp_replace(c, "[\\x{FFFD}]", "")
    )
    nonspace = F.greatest(
        F.length(F.regexp_replace(c, r"\s", "")), F.lit(1)
    )
    return (
        df.withColumn("n_mojibake", moji.cast("long"))
        .withColumn("n_replacement", repl.cast("long"))
        .withColumn(
            "mojibake_ratio",
            F.round(
                (F.col("n_mojibake") + F.col("n_replacement")).cast("double")
                / nonspace,
                6,
            ),
        )
    )


def blocklist_filter(
    df: DataFrame,
    terms: tuple[str, ...] | list[str],
    text_col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Term-blocklist filtering — the C4-style "bad words" pass: count
    blocklisted tokens per document (case-insensitive whole-token match,
    never substring — 'class' must not trip a 'ass' entry) and keep
    documents with at most ``max_hits`` of them.

    Adds ``n_blocked`` and ``keep``.  Pure array expression (tokenize →
    lowercase → membership count) — one codegen pass; the list inlines as
    literals, the right shape for the few-hundred-entry blocklists these
    passes actually use (a million-entry list would become a broadcast
    join against exploded tokens instead).
    """
    if not terms:
        raise ValueError("blocklist_filter needs at least one term")
    lowered = [t.lower() for t in terms]
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    blocked = F.size(
        F.filter(
            F.transform(toks, lambda t: F.lower(t)),
            lambda t: t.isin(lowered),
        )
    )
    return (
        df.withColumn("n_blocked", blocked)
        .withColumn("keep", F.col("n_blocked") <= max_hits)
    )


def doc_keywords(
    df: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document keyword extraction: the ``k`` most distinctive terms
    of each document by ``tf / df`` (term frequency over document
    frequency — the rare-and-repeated signal; ties by term).  The
    ratio-of-integers score is ONE IEEE division, bit-identical across
    engines — a log-idf variant would hang top-k membership on the last
    ulp of two engines' ``ln`` at score ties.

    Returns ``(id_col, rank, term, tf, df, score)`` — the doc-tagging
    pass for retrieval labels and mixture diagnostics.  Two term-keyed
    aggregations (per-doc tf, corpus df) + one join on the term and a
    per-doc top-k window; df is computed once over distinct (doc, term),
    so a term repeated in one document counts once.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col), "rank", "term", "tf", "df",
            F.round("score", 6).alias("score"),
        )
    )


def _feature_array(col, ngram: int, hashed_buckets: int | None):
    """Per-row DSIR feature array: whitespace tokens → optional n-grams →
    optional md5-mod bucket ids.  A pure column expression shared by
    :func:`importance_weights` (exploded) and :func:`score_with_model`
    (folded in place — the streaming-safe form)."""
    arr = F.filter(
        F.split(F.trim(F.coalesce(col, F.lit(""))), r"\s+"),
        lambda w: w != "",
    )
    if ngram > 1:
        # n-grams via n shifted slices folded with zip_with instead of a
        # per-index slice lambda: the lambda form re-evaluates the token
        # array (filter of split) once PER POSITION — O(tokens²) per row
        # (see dedup.shingles); the shifted-slice form evaluates it ~2n
        # times per row and builds the identical joined strings.  The
        # size guard keeps slice from seeing a non-positive length on
        # short docs (which would error, not truncate).
        cnt = F.size(arr) - (ngram - 1)
        joined = F.slice(arr, 1, cnt)
        for k in range(1, ngram):
            joined = F.zip_with(
                joined,
                F.slice(arr, k + 1, cnt),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        arr = F.when(F.size(arr) >= ngram, joined).otherwise(
            F.expr("array()").cast("array<string>")
        )
    if hashed_buckets is not None:
        arr = F.transform(
            arr,
            lambda w: F.conv(F.substring(F.md5(w), 1, 15), 16, 10)
            .cast("long") % int(hashed_buckets),
        )
    return arr


def importance_weights(
    df: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str | None = None,
    smoothing: float = 1.0,
    ngram: int = 1,
    hashed_buckets: int | None = None,
) -> DataFrame:
    """DSIR-style data-selection weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling" — the
    bag-of-words form): score every source document by its average
    per-token log-likelihood ratio under the TARGET domain's unigram
    model vs the SOURCE corpus's own,

        log_ratio(d) = Σ_w c_d(w) · ln(p_t(w) / p_s(w)) / n_d ,

    with add-``smoothing`` estimates over the UNION vocabulary so both
    models cover every word:  p(w) = (c_w + s) / (N + s·V).  Documents
    that look like the target domain score high; boilerplate far from it
    scores low.  Feed the result to :func:`importance_sample` (or any
    top-k) to build a target-shaped training mix.

    ``ngram`` > 1 scores token n-grams instead of single words (bigrams
    capture domain phrasing unigrams miss — the feature DSIR actually
    uses); ``hashed_buckets`` hashes each feature to
    ``md5(feature) mod buckets`` first, making the model a FIXED-size
    vector regardless of vocabulary — the 100 TB form: a few-thousand-row
    model broadcasts to the doc-feature join instead of shuffling a
    vocabulary-sized table, and smoothing runs over exactly ``buckets``
    cells.  Hash collisions only blur the estimate (both corpora collide
    identically), the standard hashing-trick trade.

    Scale shape: one (doc, feature) count aggregate; two model-sized
    feature-count aggregates (partial-combined, never collected) outer-
    merged on the feature so union smoothing is exact; an equi-join from
    doc-feature counts to the merged model (broadcast when hashed); and
    a per-doc sequential fold over counts sorted by feature (module
    convention: bit-reproducible doubles).  Totals and V are a 1-row
    broadcast.

    Returns ``(id_col, n_tokens, log_ratio)`` (log_ratio rounded to 6
    decimals; n_tokens counts features, i.e. n-grams).
    """
    from .util import ensure_min_parallelism

    tcol = target_text_col or text_col
    if ngram < 1:
        raise ValueError(f"ngram must be >= 1, got {ngram}")

    def toks(frame, col, idc=None):
        feat = F.explode(
            _feature_array(F.col(col), ngram, hashed_buckets)
        ).alias("w")
        sel = [feat] if idc is None else [F.col(idc).alias("id"), feat]
        return ensure_min_parallelism(frame).select(*sel)

    counts = toks(df, text_col, id_col).groupBy("id", "w").agg(
        F.count("*").alias("c")
    )
    src_m = counts.groupBy("w").agg(F.sum("c").alias("cs"))
    tgt_m = toks(target, tcol).groupBy("w").agg(
        F.count("*").alias("ct")
    )
    model = (
        src_m.join(tgt_m, "w", "full_outer")
        .select(
            "w",
            F.coalesce(F.col("cs"), F.lit(0)).alias("cs"),
            F.coalesce(F.col("ct"), F.lit(0)).alias("ct"),
        )
    )
    totals = model.agg(
        F.sum("cs").alias("__Ns"), F.sum("ct").alias("__Nt"),
        F.count("*").alias("__V"),
    )
    joined = counts.join(model, "w").crossJoin(F.broadcast(totals))
    per_doc = joined.groupBy("id").agg(
        F.sum("c").alias("n_tokens"),
        F.first("__Ns").alias("__Ns"),
        F.first("__Nt").alias("__Nt"),
        F.first("__V").alias("__V"),
        F.array_sort(
            F.collect_list(F.struct(F.col("w"), F.col("c"), F.col("cs"),
                                    F.col("ct")))
        ).alias("__wc"),
    )
    s = float(smoothing)
    ns = F.col("__Ns").cast("double") + F.lit(s) * F.col("__V").cast("double")
    nt = F.col("__Nt").cast("double") + F.lit(s) * F.col("__V").cast("double")
    # fixed op order, mirrored verbatim in the SQL oracle:
    # term = c · ln(((ct + s) · (Ns + s·V)) / ((cs + s) · (Nt + s·V)))
    acc = F.aggregate(
        F.col("__wc"),
        F.lit(0.0),
        lambda a, t: a
        + t["c"].cast("double")
        * F.log(
            ((t["ct"].cast("double") + F.lit(s)) * ns)
            / ((t["cs"].cast("double") + F.lit(s)) * nt)
        ),
    )
    return per_doc.select(
        F.col("id").alias(id_col),
        "n_tokens",
        F.round(acc / F.col("n_tokens").cast("double"), 6).alias(
            "log_ratio"
        ),
    )


def importance_model(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    target_text_col: str | None = None,
    smoothing: float = 1.0,
    ngram: int = 2,
    hashed_buckets: int = 4096,
) -> dict:
    """Collect the HASHED DSIR model as plain data — ``hashed_buckets``
    source/target counts plus the smoothed totals.  The model is
    fixed-size (buckets, not vocabulary), so collecting it to the driver
    is the legitimate model-parameter collect (the IVF-centroid /
    codebook pattern), and :func:`score_with_model` can inline it as a
    packed literal: scoring becomes a PURE PROJECTION that runs
    identically on batch and STREAMING frames.

    Returns ``{"cs", "ct"`` (dense per-bucket count lists)``, "ns", "nt"``
    (smoothed totals, V = observed union buckets — matching
    :func:`importance_weights`'s smoothing exactly)``, "smoothing",
    "ngram", "buckets"}``.
    """
    from .util import ensure_min_parallelism

    b = int(hashed_buckets)
    tcol = target_text_col or text_col

    def bucket_counts(frame, col):
        return {
            int(r["w"]): int(r["c"])
            for r in (
                ensure_min_parallelism(frame)
                .select(
                    F.explode(
                        _feature_array(F.col(col), ngram, b)
                    ).alias("w")
                )
                .groupBy("w").agg(F.count("*").alias("c"))
                .collect()  # ≤ hashed_buckets rows — model parameters
            )
        }

    cs_map = bucket_counts(source, text_col)
    ct_map = bucket_counts(target, tcol)
    v = len(set(cs_map) | set(ct_map))
    s = float(smoothing)
    return {
        "cs": [cs_map.get(i, 0) for i in range(b)],
        "ct": [ct_map.get(i, 0) for i in range(b)],
        "ns": float(sum(cs_map.values())) + s * float(v),
        "nt": float(sum(ct_map.values())) + s * float(v),
        "smoothing": s,
        "ngram": int(ngram),
        "buckets": b,
    }


def score_with_model(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against a collected :func:`importance_model` as a
    PURE PROJECTION: the per-bucket counts ship as two packed-string
    literals (the tokens_to_ids / bloom pattern — O(1) plan nodes,
    constant-folded to array literals), and each row folds its own
    feature array through the smoothed log-ratio — no join, no shuffle,
    no aggregation state.  That makes it the STREAMING form of DSIR
    scoring (append-mode safe inside readStream → writeStream) and the
    batch form for a model trained once and reused across corpora.

    Output matches :func:`importance_weights` semantics on the same
    corpora up to summation order (occurrence-order fold here vs
    count-weighted sorted fold there — equal to float round-off):
    ``(id_col, n_tokens, log_ratio)`` rounded to 6 decimals; documents
    with no features are dropped, as there.
    """
    s = float(model["smoothing"])
    ns, nt = float(model["ns"]), float(model["nt"])
    cs_arr = F.split(
        F.lit(",".join(map(str, model["cs"]))), ",", -1
    ).cast("array<double>")
    ct_arr = F.split(
        F.lit(",".join(map(str, model["ct"]))), ",", -1
    ).cast("array<double>")
    feats = _feature_array(
        F.col(text_col), int(model["ngram"]), int(model["buckets"])
    )
    out = df.withColumn("__feats", feats).filter(F.size("__feats") > 0)
    acc = F.aggregate(
        F.col("__feats"),
        F.lit(0.0),
        lambda a, bkt: a
        + F.log(
            (
                (F.element_at(ct_arr, bkt.cast("int") + 1) + F.lit(s))
                * F.lit(ns)
            )
            / (
                (F.element_at(cs_arr, bkt.cast("int") + 1) + F.lit(s))
                * F.lit(nt)
            )
        ),
    )
    return out.select(
        F.col(id_col),
        F.size("__feats").cast("long").alias("n_tokens"),
        F.round(acc / F.size("__feats").cast("double"), 6).alias(
            "log_ratio"
        ),
    )


def importance_sample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "log_ratio",
    temperature: float = 1.0,
    seed: str = "dsir",
) -> DataFrame:
    """Deterministic Gumbel-top-k importance sampling over
    :func:`importance_weights` output: keep the ``k`` documents with the
    largest ``weight/temperature + Gumbel(u)`` keys, where the uniform
    ``u`` derives from ``md5(seed ‖ id)`` — sampling without replacement
    with inclusion odds ∝ exp(weight/temperature), yet fully
    reproducible on any engine (no RNG state; the Gumbel-max trick).
    ``temperature → ∞`` approaches uniform sampling; small temperatures
    approach plain top-k by weight.  One global top-k (distributed
    TakeOrdered — no single-task global sort).  Returns the kept rows
    plus ``gumbel_key``."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed + "|"),
                               F.col(id_col).cast("string"))), 1, 8
            ), 16, 10
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(4294967298.0)  # (hash32 + 1) / (2^32 + 2) ∈ (0, 1) strictly
    key = (
        F.col(weight_col).cast("double") / F.lit(float(temperature))
        - F.log(-F.log(u))
    )
    out = weights.withColumn("gumbel_key", key)
    return (
        out.orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(int(k))
    )


def boilerplate_lines(
    df: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
) -> DataFrame:
    """The corpus' boilerplate-line table: every distinct line (text split
    on ``delimiter``) with its document frequency, filtered to lines that
    appear in at least ``min_docs`` DISTINCT documents — nav menus, cookie
    banners, share widgets (the CCNet/RefinedWeb cross-document line
    statistic).  Returns ``line``, ``doc_freq``.

    One explode + one line-keyed aggregation shuffle; the per-line
    distinct count partial-aggregates map-side (count_distinct over the
    grouping collapses to one row per (line, map task) before the
    exchange), so a hot boilerplate line never concentrates its raw
    occurrences into one reducer.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(delimiter))
        ).alias("line"),
    )
    return (
        lines.groupBy("line")
        .agg(F.countDistinct("id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
    )


def line_dedup(
    df: DataFrame,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
) -> DataFrame:
    """Cross-document boilerplate-line removal (the CCNet / RefinedWeb
    cleaning rule): any line occurring in at least ``min_docs`` distinct
    documents is boilerplate and is removed from EVERY document
    (:func:`segment_dedup` is the keep-first variant for exact content
    duplication; this one is frequency-thresholded and keeps no copy).

    Returns one row per input document: ``id_col``, ``clean_text`` (the
    surviving lines re-joined by ``delimiter``, in original order; ''
    when every line was boilerplate), ``n_lines``, ``n_removed``.

    Plan: explode → line-keyed doc-frequency aggregate →
    equi-join back on the line → one doc-keyed re-assembly shuffle.
    The frequency table is the AGGREGATED side of the join (one row per
    distinct line), so AQE broadcasts it when small — the common case,
    since only lines crossing the threshold matter and the join is
    against the filtered table via a left anti-style mark.  The
    aggregate-then-join shape (never a row_number window over the line)
    keeps hot boilerplate lines splittable, exactly as in
    :func:`segment_dedup`.
    """
    from .util import ensure_min_parallelism

    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    df = ensure_min_parallelism(df)
    from pyspark.storagelevel import StorageLevel

    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(delimiter))
        ).alias("pos", "line"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # frequency table from the SAME exploded frame (persisted: the line
    # explosion is the expensive map pass and feeds both the frequency
    # aggregate and the regroup; ContextCleaner unpersists on GC)
    flagged = (
        exploded.groupBy("line")
        .agg(F.countDistinct("id").alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
        .select("line", F.lit(1).alias("__bp"))
    )
    marked = exploded.join(flagged, "line", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__bp").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.concat_ws(
                delimiter,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__bp").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .withColumnRenamed("id", id_col)
    )


def train_quality_perceptron(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    ngram: int = 1,
    hashed_buckets: int = 1024,
    iterations: int = 10,
    lr: int = 1,
) -> dict:
    """Train a binary quality classifier as a batch PERCEPTRON over hashed
    token n-gram counts — the trainable analog of the fastText-style
    quality filters used to curate web corpora, built so that distributed
    training is BIT-REPRODUCIBLE under any partitioning:

    every quantity is an INTEGER.  Features are occurrence counts of
    ``md5(feature) mod hashed_buckets`` (the :func:`importance_model`
    hashing trick), weights start at zero, and each full-batch iteration
    applies the classic update

        w += lr · Σ_d (y_d − 1[z_d > 0]) · x_d ,   b += lr · Σ_d err_d

    whose gradient is an integer SUM — commutative and associative, so
    the result is independent of partitioning, core count, and AQE (the
    float-order problem that makes distributed SGD non-reproducible
    simply never arises).

    Per iteration: ONE scan of the training frame — margins fold each
    row's feature array through the previous weights shipped as a packed
    literal (O(1) plan nodes at any bucket count; zero join), and the
    per-bucket error sums aggregate to at most ``hashed_buckets + 1``
    rows (the legitimate model-parameter collect, as with IVF centroids).
    Train on a bounded sample at corpus scale; score the full corpus with
    :func:`score_with_perceptron` (a pure projection).

    Returns ``{"bias", "weights" (dense int list), "ngram", "buckets",
    "lr", "iterations", "history" (misclassified count per iteration)}``.
    """
    from .util import ensure_min_parallelism

    b = int(hashed_buckets)
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    train = ensure_min_parallelism(df).select(
        F.col(label_col).cast("long").alias("__y"),
        _feature_array(F.col(text_col), int(ngram), b).alias("__feats"),
    )
    train = train.persist()
    try:
        weights = [0] * b
        bias = 0
        history: list[int] = []
        for _ in range(int(iterations)):
            w_arr = F.split(
                F.lit(",".join(map(str, weights))), ",", -1
            ).cast("array<long>")
            margin = F.lit(bias) + F.aggregate(
                F.col("__feats"),
                F.lit(0).cast("long"),
                lambda acc, bkt: acc
                + F.element_at(w_arr, bkt.cast("int") + 1),
            )
            err = (
                F.col("__y") - (margin > 0).cast("long")
            ).alias("__err")
            grad_rows = (
                train.select(
                    err,
                    F.explode(
                        # bucket -1 carries the bias gradient so ONE
                        # aggregation job updates bias and weights both
                        F.concat(
                            F.array(F.lit(-1).cast("long")),
                            F.col("__feats").cast("array<long>"),
                        )
                    ).alias("__bkt"),
                )
                .groupBy("__bkt")
                .agg(
                    F.sum("__err").alias("g"),
                    F.sum(F.when(F.col("__bkt") == -1, F.abs("__err"))).alias(
                        "miss"
                    ),
                )
                .collect()  # <= hashed_buckets + 1 rows — model parameters
            )
            miss = 0
            for r in grad_rows:
                g = int(r["g"] or 0)
                if int(r["__bkt"]) == -1:
                    bias += int(lr) * g
                    miss = int(r["miss"] or 0)
                else:
                    weights[int(r["__bkt"])] += int(lr) * g
            history.append(miss)
            if miss == 0:
                break
    finally:
        train.unpersist()
    return {
        "bias": bias,
        "weights": weights,
        "ngram": int(ngram),
        "buckets": b,
        "lr": int(lr),
        "iterations": int(iterations),
        "history": history,
    }


def score_with_perceptron(
    df: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents with a trained :func:`train_quality_perceptron`
    model as a PURE PROJECTION: the integer weights ship as one packed
    string literal (the tokens_to_ids / bloom idiom — O(1) plan nodes at
    any bucket count), each row folds its own feature array through
    them, and there is no join, shuffle, or aggregation state — so the
    same expression scores batch frames and STREAMING frames
    (append-mode safe).  Output: ``(id_col, margin, prediction)``; the
    margin is the exact integer ``bias + Σ w[bucket]`` over feature
    occurrences."""
    w_arr = F.split(
        F.lit(",".join(map(str, model["weights"]))), ",", -1
    ).cast("array<long>")
    feats = _feature_array(
        F.col(text_col), int(model["ngram"]), int(model["buckets"])
    )
    margin = F.lit(int(model["bias"])) + F.aggregate(
        feats,
        F.lit(0).cast("long"),
        lambda acc, bkt: acc + F.element_at(w_arr, bkt.cast("int") + 1),
    )
    # project the margin ONCE, derive the prediction from the projected
    # column — the packed weights literal appears a single time in the
    # plan (Spark does no CSE across select-list expressions)
    return (
        df.select(F.col(id_col), margin.alias("margin"))
        .withColumn("prediction", (F.col("margin") > 0).cast("int"))
    )


def _line_counts(
    df: DataFrame, id_col: str, text_col: str, delimiter: str
) -> DataFrame:
    lines = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(delimiter))
        ).alias("line"),
    )
    return lines.groupBy("line").agg(F.countDistinct("id").alias("doc_freq"))


def write_line_stats(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
) -> DataFrame:
    """Persist the corpus line-frequency table as an on-disk artifact —
    the stateful form of :func:`boilerplate_lines`, so arriving batches
    can be cleaned against corpus-wide line statistics WITHOUT rescanning
    the corpus (the line-dedup member of the maintenance family).  The
    artifact stores FULL counts, unthresholded: ``min_docs`` is chosen at
    use time and appends stay exact.  Crash-safe overwrite via
    :func:`..fsio.atomic_overwrite_dir`."""
    from .. import fsio

    spark = df.sparkSession
    stats = _line_counts(df, id_col, text_col, delimiter)

    def _write_to(target: str) -> None:
        stats.write.mode("overwrite").parquet(target)
        (
            fsio.tiny_df(spark, [(delimiter,)], "delimiter string")
            .write.mode("overwrite")
            .parquet(target + "/_params")
        )

    fsio.atomic_overwrite_dir(spark, path, _write_to)
    return stats


def line_stats_append(
    new_docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fold an accepted batch into a persisted line-stats artifact: the
    batch's line document-frequencies (batch-sized aggregation) union
    with the stored table and re-sum — identical to one build over
    corpus ∪ batch PROVIDED batches carry disjoint document sets (the
    same single-writer/disjoint-batch contract as the Bloom ingest
    state; a re-folded batch would double-count its documents).  Cost:
    batch-sized work + an artifact-sized merge."""
    from .. import fsio

    spark = new_docs.sparkSession
    row = spark.read.parquet(path + "/_params").collect()[0]
    delimiter = row["delimiter"]
    old = spark.read.parquet(path)
    delta = _line_counts(new_docs, id_col, text_col, delimiter)
    merged = (
        old.unionByName(delta)
        .groupBy("line")
        .agg(F.sum("doc_freq").alias("doc_freq"))
        .localCheckpoint(eager=True)
    )

    def _write_to(target: str) -> None:
        merged.write.mode("overwrite").parquet(target)
        (
            fsio.tiny_df(spark, [(delimiter,)], "delimiter string")
            .write.mode("overwrite")
            .parquet(target + "/_params")
        )

    fsio.atomic_overwrite_dir(spark, path, _write_to)
    return merged


def line_dedup_with_stats(
    df: DataFrame,
    path: str,
    min_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Clean a batch against a PERSISTED line-stats artifact: lines whose
    corpus-wide document frequency (as maintained by
    :func:`line_stats_append`) reaches ``min_docs`` are removed from
    every batch document — same output shape as :func:`line_dedup`
    (``id_col, clean_text, n_lines, n_removed``), but the cost is
    batch-sized plus an equi-join against the flagged subset of the
    artifact; the corpus is never rescanned."""
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    spark = df.sparkSession
    row = spark.read.parquet(path + "/_params").collect()[0]
    delimiter = row["delimiter"]
    flagged = (
        spark.read.parquet(path)
        .filter(F.col("doc_freq") >= min_docs)
        .select("line", F.lit(1).alias("__bp"))
    )
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), _re_escape(delimiter))
        ).alias("pos", "line"),
    )
    marked = exploded.join(flagged, "line", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.when(F.col("__bp").isNotNull(), 1).otherwise(0)).alias(
                "n_removed"
            ),
            F.concat_ws(
                delimiter,
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__bp").isNull(),
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .withColumnRenamed("id", id_col)
    )
