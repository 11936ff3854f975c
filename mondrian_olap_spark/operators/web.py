"""Web-corpus curation operators: URL canonicalization, host / registered-
domain extraction, per-host contribution caps, and host-level profiles.

These are the URL-keyed hygiene steps of web-scale training-data pipelines
(CCNet / C4 / RefinedWeb style): canonicalize URLs so exact-URL dedup keys
are stable across crawls (case, default ports, tracking parameters,
fragments, slash runs all collapse), then bound any single host's
contribution to the corpus.

Scale notes
-----------
* Canonicalization and extraction are PURE Spark SQL expressions — whole-
  stage codegen, zero UDFs, zero shuffles — so they run unchanged on
  STREAMING frames and cost a projection at any corpus size.
* ``cap_per_host`` is one host-keyed shuffle + a per-host ``row_number``.
  Rank keys are content-addressed (md5 of the id by default), so the kept
  set is independent of partitioning and layout.  A pathologically hot
  host serializes through one task in the window; for corpora where a
  single host exceeds a task's row budget, pre-filter with an aggregate
  count and a threshold sample before the exact window (same pattern as
  the stop-shingle guard in :mod:`.dedup`).
* ``registered_domain`` is an eTLD+1 heuristic over a small built-in
  multi-part-suffix set; production use should supply the full public
  suffix list via ``extra_suffixes`` (it folds into the same expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "TRACKING_PARAM_PATTERN",
    "MULTIPART_SUFFIXES",
    "canonical_url_expr",
    "canonicalize_urls",
    "host_expr",
    "registered_domain_expr",
    "with_host",
    "cap_per_host",
    "host_profile",
    "url_dedup",
    "curate_web_corpus",
]

#: query parameters stripped during canonicalization — click/campaign
#: trackers that never change the served document.  Anchored RLIKE over a
#: single ``key=value`` token (``(=|$)`` so bare flags match too).
TRACKING_PARAM_PATTERN = (
    "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref|ref_src)(=|$)"
)

#: multi-part public suffixes the registered-domain heuristic recognises;
#: eTLD+1 keeps THREE labels when the last two are one of these.
MULTIPART_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "co.za", "com.ar", "com.tr", "com.tw", "co.nz",
)

#: URL split pattern (scheme, authority, path, query) — RE2-safe, no
#: backrefs/lookahead, so the oracle replays it verbatim in DuckDB.
#: Stored UNESCAPED; ``_URL_RE`` below is the form embedded in Spark SQL
#: string literals (backslashes doubled for the SQL parser).
URL_PATTERN = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$"

_URL_RE = URL_PATTERN.replace("\\", "\\\\")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def canonical_url_expr(url_col: str, strip_www: bool = False) -> Column:
    """Canonical form of a URL as ONE codegen expression.

    Rules (each mirrors what large crawl pipelines key dedup on):
    scheme + host lowercased; userinfo dropped; default ports (http:80,
    https:443) dropped; ``www.`` optionally dropped; slash runs in the
    path collapsed and trailing slashes removed; tracking query params
    (:data:`TRACKING_PARAM_PATTERN`) dropped and the remainder SORTED so
    parameter order never splits a dedup key; fragments dropped.  A value
    that does not parse as ``scheme://…`` passes through trimmed —
    canonicalization never destroys a key it cannot parse.
    """
    u = f"trim({url_col})"
    scheme = f"lower(regexp_extract({u}, '{_URL_RE}', 1))"
    auth = f"regexp_replace(regexp_extract({u}, '{_URL_RE}', 2), '^[^@]*@', '')"
    hostname = f"lower(regexp_replace({auth}, ':[0-9]+$', ''))"
    if strip_www:
        hostname = f"regexp_replace({hostname}, '^www\\\\.', '')"
    port = f"regexp_extract({auth}, ':([0-9]+)$', 1)"
    port_part = (
        f"CASE WHEN {port} = '' THEN '' "
        f"WHEN {scheme} = 'http' AND {port} = '80' THEN '' "
        f"WHEN {scheme} = 'https' AND {port} = '443' THEN '' "
        f"ELSE ':' || {port} END"
    )
    path = (
        f"regexp_replace(regexp_replace("
        f"regexp_extract({u}, '{_URL_RE}', 3), '/{{2,}}', '/'), '/+$', '')"
    )
    query = (
        f"array_join(array_sort(filter(split("
        f"regexp_extract({u}, '{_URL_RE}', 4), '&'), "
        f"p -> p != '' AND NOT p RLIKE {_sql_quote(TRACKING_PARAM_PATTERN)}"
        f")), '&')"
    )
    query_part = f"CASE WHEN {query} = '' THEN '' ELSE '?' || {query} END"
    rebuilt = f"{scheme} || '://' || {hostname} || {port_part} || {path} || {query_part}"
    return F.expr(f"CASE WHEN {scheme} = '' THEN {u} ELSE {rebuilt} END")


def canonicalize_urls(
    df: DataFrame,
    url_col: str = "url",
    output: str = "canonical_url",
    strip_www: bool = False,
) -> DataFrame:
    """Append ``output`` = canonical form of ``url_col`` (pure projection)."""
    return df.withColumn(output, canonical_url_expr(url_col, strip_www))


def host_expr(url_col: str, strip_www: bool = False) -> Column:
    """Lowercased hostname of a URL ('' when unparseable)."""
    auth = (
        f"regexp_replace(regexp_extract(trim({url_col}), '{_URL_RE}', 2),"
        f" '^[^@]*@', '')"
    )
    host = f"lower(regexp_replace({auth}, ':[0-9]+$', ''))"
    if strip_www:
        host = f"regexp_replace({host}, '^www\\\\.', '')"
    return F.expr(host)


def registered_domain_expr(
    host_col: str, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """eTLD+1 heuristic: the last two host labels, or the last three when
    the last two form a known multi-part suffix (:data:`MULTIPART_SUFFIXES`
    ∪ ``extra_suffixes``).  Hosts with < 2 labels pass through."""
    suffixes = tuple(MULTIPART_SUFFIXES) + tuple(extra_suffixes)
    in_list = ", ".join(_sql_quote(s) for s in suffixes)
    parts = f"split({host_col}, '\\\\.')"
    n = f"size({parts})"
    last2 = f"array_join(slice({parts}, {n} - 1, 2), '.')"
    last3 = f"array_join(slice({parts}, {n} - 2, 3), '.')"
    return F.expr(
        f"CASE WHEN {n} < 2 THEN {host_col} "
        f"WHEN {n} >= 3 AND {last2} IN ({in_list}) THEN {last3} "
        f"ELSE {last2} END"
    )


def with_host(
    df: DataFrame,
    url_col: str = "url",
    strip_www: bool = False,
    domain: bool = True,
) -> DataFrame:
    """Append ``host`` (and optionally ``domain`` = eTLD+1) columns."""
    out = df.withColumn("host", host_expr(url_col, strip_www))
    if domain:
        out = out.withColumn("domain", registered_domain_expr("host"))
    return out


def cap_per_host(
    df: DataFrame,
    max_per_host: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    order_by: list[str] | None = None,
    key_col: str | None = None,
) -> DataFrame:
    """Keep at most ``max_per_host`` documents per host (RefinedWeb-style
    per-source contribution cap).

    Ranking is deterministic and layout-independent: by the columns in
    ``order_by`` if given, then by ``md5(id)`` (a content-addressed
    shuffle of each host's documents — capping keeps a pseudo-random,
    reproducible sample rather than the crawl-order head), with the raw
    id as the final tiebreak.  ``key_col`` overrides the host expression
    (e.g. pass a precomputed ``domain`` column to cap per eTLD+1).

    One host-keyed shuffle + per-host ``row_number``; adds ``host`` and
    ``host_rank`` columns.
    """
    if max_per_host < 1:
        raise ValueError("max_per_host must be >= 1")
    from pyspark.sql.window import Window

    key = F.col(key_col) if key_col else host_expr(url_col)
    out = df.withColumn("host", key)
    order = [F.col(c) for c in (order_by or [])]
    order += [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    w = Window.partitionBy("host").orderBy(*order)
    return out.withColumn("host_rank", F.row_number().over(w)).filter(
        F.col("host_rank") <= max_per_host
    )


def host_profile(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    strip_www: bool = False,
) -> DataFrame:
    """Per-host corpus profile: document count, distinct canonical URLs,
    and total characters — the observability aggregate behind host-cap /
    blocklist decisions.  One aggregation shuffle."""
    out = df.withColumn("host", host_expr(url_col, strip_www)).withColumn(
        "_curl", canonical_url_expr(url_col, strip_www)
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("_curl").alias("n_urls"),
    ]
    if text_col is not None:
        aggs.append(F.sum(F.length(F.col(text_col))).alias("total_chars"))
    return out.groupBy("host").agg(*aggs)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    strip_www: bool = False,
) -> DataFrame:
    """Exact-URL dedup on the CANONICAL form (the first, cheapest dedup
    stage of a web-corpus pipeline — tracking-param and case variants of
    one page collapse before any content hashing): keeps the minimum-id
    row per canonical URL, appends ``canonical_url`` and ``url_copies``.
    Aggregate + equi-join back (the :func:`..dedup.exact_dedup` shape) —
    one URL-keyed shuffle, hot URLs stay splittable."""
    out = canonicalize_urls(df, url_col, strip_www=strip_www)
    keep = (
        out.groupBy("canonical_url")
        .agg(
            F.min(F.col(id_col)).alias("__keep"),
            F.count("*").alias("url_copies"),
        )
    )
    return (
        out.join(keep, "canonical_url")
        .filter(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )


def curate_web_corpus(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_per_host: int | None = None,
    strip_www: bool = False,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """The composed web-curation pipeline (RefinedWeb staging order):
    canonical-URL dedup (cheapest first — no content ever hashed for a
    re-crawled tracking variant) → content curation
    (:func:`..pipeline.curate_corpus`: exact content dedup → quality
    rules → split assignment) → per-host contribution cap.  One plan per
    stage; every stage is individually gate-verified, and each keeps the
    minimum-id survivor so the composition is deterministic end to end."""
    from .pipeline import curate_corpus

    staged = url_dedup(docs, url_col, id_col, strip_www=strip_www)
    curated = curate_corpus(
        staged, split_weights=split_weights, id_col=id_col, text_col=text_col
    )
    if max_per_host is not None:
        curated = cap_per_host(
            curated, max_per_host, url_col=url_col, id_col=id_col
        )
    return curated
