"""Domain-level curation signals — the URL/domain screening stage of a
web-crawl pipeline (RefinedWeb/C4 both filter by domain before any
per-document work: a blocklist, plus per-domain statistics to find spam
and mirror domains).

The test corpus's ``source`` column stands in for the registrable
domain; on real crawl data pass the extracted eTLD+1.

Scale shape: one fingerprint groupBy (map-combinable, 16-byte keys) for
corpus-wide duplicate counts, one join back on the hash, then ONE
domain-keyed aggregation — output bounded by the domain vocabulary,
which is exactly the frame an operator would broadcast back as a
keep/drop side input.  The blocklist is a literal ``isin`` (pushdown
filter), never a join.

Determinism: per-document quality scores are rounded to 6 and summed as
DECIMAL before the mean, so float accumulation order cannot leak into
the per-domain statistics (the DSIR/LM convention).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions import text as T
from architxt_spark.functions.dedup import _spread


def domain_profile(
    docs: DataFrame,
    *,
    domain_col: str = "source",
    url_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: Sequence[str] = (),
) -> DataFrame:
    """Per-domain curation statistics: ``(domain, n_docs, dup_docs,
    mean_quality, blocked)`` — document count, documents whose content
    fingerprint occurs more than once CORPUS-WIDE (mirror/boilerplate
    signal), deterministic mean quality score, and the blocklist flag.

    Pass ``url_col`` (e.g. the WARC reader's ``target_uri``) to derive
    the domain key via :func:`registrable_domain` instead of reading a
    pre-extracted ``domain_col`` — the crawl-native form."""
    domain = (
        registrable_domain(F.col(url_col)) if url_col else F.col(domain_col)
    )
    base = _spread(docs).select(
        domain.alias("domain"),
        F.col(id_col).alias("id"),
        T.fingerprint(F.col(text_col)).alias("fp"),
        F.round(T.quality_score(F.col(text_col)), 6).cast("decimal(18,6)").alias("q"),
    )
    fp_counts = base.groupBy("fp").agg(F.count("*").alias("__n_fp"))
    joined = base.join(fp_counts, "fp")
    blocked = (
        F.col("domain").isin(list(blocklist)) if blocklist else F.lit(False)
    )
    return (
        joined.groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum((F.col("__n_fp") > 1).cast("long")).alias("dup_docs"),
            F.round(F.sum("q").cast("double") / F.count("*"), 4).alias("mean_quality"),
        )
        .withColumn("blocked", blocked.cast("int"))
    )


def domain_screen(
    docs: DataFrame,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: Sequence[str] = (),
    max_dup_fraction: float = 0.5,
) -> DataFrame:
    """Documents surviving the domain screen: blocklisted domains drop
    (pushdown filter — no join), and domains whose corpus-wide duplicate
    fraction exceeds ``max_dup_fraction`` drop entirely (the spam/mirror
    rule).  The domain verdict table is domain-bounded and broadcast."""
    profile = domain_profile(
        docs,
        domain_col=domain_col,
        text_col=text_col,
        id_col=id_col,
        blocklist=blocklist,
    )
    bad = profile.filter(
        (F.col("blocked") == 1)
        | (F.col("dup_docs") / F.col("n_docs") > max_dup_fraction)
    ).select(F.col("domain").alias(domain_col))
    out = docs
    if blocklist:
        out = out.filter(~F.col(domain_col).isin(list(blocklist)))
    return out.join(F.broadcast(bad), domain_col, "left_anti")


def domain_profile_sql(
    table: str,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: Sequence[str] = (),
) -> str:
    quoted = ", ".join("'" + b.replace("'", "''") + "'" for b in blocklist)
    block = f"CAST({domain_col} IN ({quoted}) AS INT)" if blocklist else "0"
    return f"""
        WITH __base AS (
            SELECT {domain_col} AS domain, {id_col} AS id,
                   {T.fingerprint_sql(text_col)} AS fp,
                   CAST(round({T.quality_score_sql(text_col)}, 6) AS DECIMAL(18,6)) AS q,
                   {block} AS blocked
            FROM {table}
        ),
        __fpc AS (SELECT fp, count(*) AS n_fp FROM __base GROUP BY 1)
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_fp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs,
               round(CAST(sum(q) AS DOUBLE) / count(*), 4) AS mean_quality,
               any_value(blocked) AS blocked
        FROM __base JOIN __fpc USING (fp)
        GROUP BY domain
    """


def domain_screen_sql(
    table: str,
    *,
    domain_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    blocklist: Sequence[str] = (),
    max_dup_fraction: float = 0.5,
) -> str:
    """DuckDB twin of :func:`domain_screen` — rows surviving the domain
    screen, same blocked/dup-fraction verdicts over the same profile.
    ``max_dup_fraction`` should be binary-exact (0.5, 0.25, …) so the
    double comparison replays identically across engines.

    NULL parity with the Spark side: the bad-domain screen is NOT EXISTS
    (Spark's ``left_anti`` keeps NULL-keyed rows; ``NOT IN`` would drop
    every row the moment any NULL appears on either side), while the
    literal blocklist stays ``NOT IN`` — Spark's ``~isin`` filter also
    drops NULL-domain rows there, and the literals are never NULL."""
    profile = domain_profile_sql(
        table,
        domain_col=domain_col,
        text_col=text_col,
        id_col=id_col,
        blocklist=blocklist,
    )
    quoted = ", ".join("'" + b.replace("'", "''") + "'" for b in blocklist)
    block_pred = f"t.{domain_col} NOT IN ({quoted}) AND " if blocklist else ""
    return f"""
        SELECT t.* FROM {table} t
        WHERE {block_pred}NOT EXISTS (
            SELECT 1 FROM ({profile}) __bad
            WHERE (__bad.blocked = 1
                   OR CAST(__bad.dup_docs AS DOUBLE) / __bad.n_docs > {max_dup_fraction})
              AND __bad.domain = t.{domain_col}
        )
    """


# ---------------------------------------------------------------------------
# URL canonicalization (the dedup-by-URL key for crawl pipelines)
# ---------------------------------------------------------------------------

#: tracking query parameters stripped by canonicalization (the standard
#: utm family plus the common click identifiers).
TRACKING_PARAMS: tuple[str, ...] = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "ref",
)


def normalize_url(col: Column) -> Column:
    """Canonical URL for dedup-by-URL: lowercase scheme+host, strip the
    fragment, default ports (:80/:443), tracking query parameters
    (``TRACKING_PARAMS``), an empty leftover ``?``, and one trailing
    slash on a non-root path.  Pure codegen regexp chain — the key a
    crawl frontier and the URL-level dedup groupBy both hash.

    Deliberately conservative: parameter ORDER is preserved (sorting
    params can merge genuinely different endpoints) and case of the path
    is kept (case-sensitive servers exist)."""
    u = F.trim(col)
    # lowercase scheme and authority only (up to the first '/','?','#')
    head = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    tail = F.substring(u, F.length(head) + 1, F.lit(1 << 30))
    u = F.concat(F.lower(head), tail)
    u = F.regexp_replace(u, r"#.*$", "")                       # fragment
    u = F.regexp_replace(u, r"^(https?://[^/?#]*):(?:80|443)([/?#].*)?$", r"$1$2")
    for p in TRACKING_PARAMS:                                  # tracking params
        u = F.regexp_replace(u, rf"([?&]){p}=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")                     # "?&&q" -> "?q"
    u = F.regexp_replace(u, r"&&+", "&")                       # "&&" runs
    u = F.regexp_replace(u, r"(.)/+\?", r"$1?")                # "/path/?q" -> "/path?q"
    # ONE trailing-junk rule (any run of / ? &): piecemeal slash/dangling
    # rules re-expose each other ("/&" -> "/" -> "") and never reach a
    # fixpoint in one pass — the idempotence property test found both
    u = F.regexp_replace(u, r"[/?&]+$", "")
    return u


def normalize_url_sql(col: str) -> str:
    """DuckDB twin of :func:`normalize_url` (same regex chain; DuckDB's
    ``regexp_replace`` needs the 'g' flag where Spark replaces all)."""
    u = f"trim({col})"
    head = f"regexp_extract({u}, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)"
    u = f"(lower({head}) || {u}[length({head}) + 1 :])"
    u = f"regexp_replace({u}, '#.*$', '')"
    u = f"regexp_replace({u}, '^(https?://[^/?#]*):(?:80|443)([/?#].*)?$', '\\1\\2')"
    for p in TRACKING_PARAMS:
        u = f"regexp_replace({u}, '([?&]){p}=[^&#]*', '\\1', 'g')"
    u = f"regexp_replace({u}, '\\?&+', '?', 'g')"
    u = f"regexp_replace({u}, '&&+', '&', 'g')"
    u = f"regexp_replace({u}, '(.)/+\\?', '\\1?')"
    u = f"regexp_replace({u}, '[/?&]+$', '')"
    return u


def registrable_domain(col: Column) -> Column:
    """Heuristic eTLD+1 from a URL: host minus subdomains, keeping two
    labels (three when the penultimate label is a common second-level
    registry label like ``co``/``com``/``ac``/``gov``/``org``/``net``
    — the stdlib-only approximation of the public-suffix list, which is
    an external dataset)."""
    host = F.lower(F.regexp_extract(col, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#:]*)", 1))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    second = F.element_at(parts, -2)
    take3 = (n >= 3) & second.isin("co", "com", "ac", "gov", "org", "net", "edu")
    last2 = F.array_join(F.slice(parts, n - 1, 2), ".")
    last3 = F.when(n >= 3, F.array_join(F.slice(parts, n - 2, 3), ".")).otherwise(last2)
    return F.when(host == "", None).otherwise(F.when(take3, last3).otherwise(F.when(n >= 2, last2).otherwise(host)))
