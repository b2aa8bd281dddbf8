"""Lexical retrieval: BM25 scoring and top-k over a document corpus.

Complements the embedding ANN family (:mod:`architxt_spark.functions.ann`)
with the sparse/lexical path of a training-data pipeline — targeted
curation sweeps, contamination triage, and eval-set retrieval are usually
keyword/BM25 driven rather than embedding driven.

Scale shape: the query term set is a small constant, so scoring is ONE
full corpus scan with per-term token-count expressions (whole-stage
codegen — no explode of the token stream, no Python UDF, no shuffle);
corpus statistics (N, avgdl, per-term document frequency) are ONE
aggregate row broadcast-cross-joined back; the top-k is an
``ORDER BY … LIMIT k`` (TakeOrdered — per-partition heaps, never a global
sort materialization).  At 100 TB the only wide operation is the 1-row
statistics aggregate.

Cross-engine determinism: every float expression is generated in the same
term order for the Spark and DuckDB forms (identical IEEE evaluation
order), ``dl``/``df``/``N`` are exact integer aggregates, and ranking
orders by the ROUNDED score with the document id as tie-break, so a
last-ulp difference can never flip the k-boundary between engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: BM25 free parameters (Robertson–Spärck Jones defaults).
K1 = 1.2
B = 0.75

_TOKEN_SPLIT = "[^a-z0-9]+"


def retrieval_tokens(col: Column) -> Column:
    """Lower-cased alphanumeric tokens (punctuation-stripped, empties
    removed) — the retrieval tokenizer, deliberately coarser than
    :func:`architxt_spark.functions.text.tokens`."""
    return F.filter(F.split(F.lower(col), _TOKEN_SPLIT), lambda x: x != "")


def retrieval_tokens_sql(col: str) -> str:
    return f"list_filter(string_split_regex(lower({col}), '{_TOKEN_SPLIT}'), x -> x <> '')"


def _eq(term: str):
    # closure factory, NOT a default-arg lambda — pyspark's higher-order
    # function wrapper binds Columns to every lambda parameter
    def pred(x: Column) -> Column:
        return x == F.lit(term)

    return pred


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for a bag of query ``terms``.

    Returns ``(id_col, bm25)`` with ``bm25`` rounded to 4 places, ordered
    by ``(bm25 DESC, id_col)``.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = retrieval_tokens(F.col(text_col)).alias("__toks")
    base = docs.select(F.col(id_col), toks).select(
        id_col,
        F.size(F.col("__toks")).alias("__dl"),
        *[
            F.size(F.filter(F.col("__toks"), _eq(t))).alias(f"__tf_{i}")
            for i, t in enumerate(terms)
        ],
    )

    stats = base.agg(
        F.count("*").alias("__n_docs"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf_{i}") > 0).cast("long")).alias(f"__df_{i}")
            for i in range(len(terms))
        ],
    )

    scored = base.crossJoin(F.broadcast(stats))
    n, avgdl = F.col("__n_docs"), F.col("__avgdl")
    parts = []
    for i in range(len(terms)):
        tf, df = F.col(f"__tf_{i}").cast("double"), F.col(f"__df_{i}").cast("double")
        idf = F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        norm = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
        parts.append(idf * (tf * F.lit(k1 + 1.0)) / norm)
    score = parts[0]
    for p in parts[1:]:
        score = score + p

    return (
        scored.select(F.col(id_col), F.round(score, 4).alias("bm25"))
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def bm25_topk_sql(
    table: str,
    terms: list[str],
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB form of :func:`bm25_topk` — same tokenizer, same float
    evaluation order, same rounded-score ranking."""
    if not terms:
        raise ValueError("bm25_topk_sql needs at least one query term")
    tf_cols = ",\n            ".join(
        f"len(list_filter(__toks, x -> x = '{t}')) AS __tf_{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n            ".join(
        f"sum(CASE WHEN __tf_{i} > 0 THEN 1 ELSE 0 END) AS __df_{i}" for i in range(len(terms))
    )
    parts = []
    for i in range(len(terms)):
        idf = f"ln(1.0 + (__n_docs - CAST(__df_{i} AS DOUBLE) + 0.5) / (CAST(__df_{i} AS DOUBLE) + 0.5))"
        norm = f"(CAST(__tf_{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b} * __dl / __avgdl))"
        parts.append(f"{idf} * (CAST(__tf_{i} AS DOUBLE) * {k1 + 1.0}) / {norm}")
    score = " + ".join(parts)
    return f"""
        WITH __tok AS (
            SELECT {id_col}, {retrieval_tokens_sql(text_col)} AS __toks FROM {table}
        ), __base AS (
            SELECT {id_col}, len(__toks) AS __dl,
            {tf_cols}
            FROM __tok
        ), __stats AS (
            SELECT count(*) AS __n_docs, avg(__dl) AS __avgdl,
            {df_cols}
            FROM __base
        )
        SELECT {id_col}, round({score}, 4) AS bm25
        FROM __base, __stats
        ORDER BY bm25 DESC, {id_col}
        LIMIT {k}
    """


def bm25_topk_batch(
    docs: DataFrame,
    queries: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Batched BM25: score MANY queries against the corpus in ONE pass —
    the eval-retrieval sweep shape.  ``queries`` is a small frame
    ``(query_id, terms array<string>)`` (broadcast); returns
    ``(query_id, rank, id_col, bm25)``, rank 1..k per query by
    ``(score DESC, id_col)``.  Documents matching none of a query's terms
    are not retrieved for it (score would be 0).

    Scale shape: corpus tokens explode ONCE and are immediately
    semi-joined against the broadcast distinct-term vocabulary, so the
    postings frame is bounded by documents-containing-query-terms, not
    the token stream; df/N/avgdl are map-combinable aggregates; per-term
    score parts are rounded to 6 and summed as DECIMAL(18,6) so float
    accumulation order cannot leak into ranking; the final per-query
    top-k is the salted two-phase window (no one-task O(matches) sort).
    Repeated terms in a bag weight the term's contribution by its query
    term frequency, matching the single-query expression chain.
    """
    from architxt_spark.functions.ann import _two_phase_topk

    toks = retrieval_tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col).alias("neighbor_id"), toks.alias("__toks")
    ).select("neighbor_id", F.size("__toks").alias("__dl"), "__toks")

    stats = base.agg(F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl"))

    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"), F.explode(F.col(terms_col)).alias("term")
        )
        .groupBy("query_id", "term")
        .agg(F.count("*").alias("__qtf"))
    )
    vocab = qterms.select("term").distinct()

    postings = (
        base.select("neighbor_id", "__dl", F.explode("__toks").alias("term"))
        .join(F.broadcast(vocab), "term")
        .groupBy("term", "neighbor_id", "__dl")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = postings.groupBy("term").agg(F.count("*").alias("__df"))

    n, avgdl = F.col("__n_docs"), F.col("__avgdl")
    tf, dfc = F.col("__tf").cast("double"), F.col("__df").cast("double")
    idf = F.log(F.lit(1.0) + (n - dfc + F.lit(0.5)) / (dfc + F.lit(0.5)))
    norm = tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / avgdl)
    part = F.col("__qtf") * idf * (tf * F.lit(k1 + 1.0)) / norm

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum(F.round(part, 6).cast("decimal(18,6)")).alias("__score"))
    )
    return _two_phase_topk(scored, k, "__score").select(
        "query_id",
        "rank",
        F.col("neighbor_id").alias(id_col),
        F.round(F.col("__score").cast("double"), 4).alias("bm25"),
    )


def bm25_topk_batch_sql(
    table: str,
    query_bags: list[tuple[int, list[str]]],
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> str:
    """DuckDB twin of :func:`bm25_topk_batch` with the query bags inlined
    as VALUES — same postings/df shape, same DECIMAL(18,6) summation."""
    if not query_bags:
        raise ValueError("bm25_topk_batch_sql needs at least one query")
    values = ", ".join(
        f"({int(qid)}, '{t.replace(chr(39), chr(39) * 2)}')"
        for qid, terms in query_bags
        for t in terms
    )
    idf = "ln(1.0 + (__n_docs - CAST(__df AS DOUBLE) + 0.5) / (CAST(__df AS DOUBLE) + 0.5))"
    norm = f"(CAST(__tf AS DOUBLE) + {k1} * ({1.0 - b} + {b} * __dl / __avgdl))"
    part = f"__qtf * {idf} * (CAST(__tf AS DOUBLE) * {k1 + 1.0}) / {norm}"
    return f"""
        WITH __q(query_id, term) AS (VALUES {values}),
        __qt AS (
            SELECT query_id, term, count(*) AS __qtf FROM __q GROUP BY 1, 2
        ),
        __vocab AS (SELECT DISTINCT term FROM __q),
        __base AS (
            SELECT {id_col} AS did, {retrieval_tokens_sql(text_col)} AS __toks FROM {table}
        ),
        __stats AS (
            SELECT count(*) AS __n_docs, avg(len(__toks)) AS __avgdl FROM __base
        ),
        __post AS (
            SELECT term, did, __dl, count(*) AS __tf FROM (
                SELECT unnest(__toks) AS term, did, len(__toks) AS __dl FROM __base
            ) JOIN __vocab USING (term)
            GROUP BY 1, 2, 3
        ),
        __dfreq AS (SELECT term, count(*) AS __df FROM __post GROUP BY 1),
        __scored AS (
            SELECT query_id, did,
                   sum(CAST(round({part}, 6) AS DECIMAL(18,6))) AS __score
            FROM __post
            JOIN __dfreq USING (term)
            JOIN __qt USING (term)
            CROSS JOIN __stats
            GROUP BY 1, 2
        ),
        __ranked AS (
            SELECT query_id, did,
                   ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY __score DESC, did) AS rank,
                   __score
            FROM __scored
        )
        SELECT query_id, CAST(rank AS INT) AS rank, did AS {id_col},
               round(CAST(__score AS DOUBLE), 4) AS bm25
        FROM __ranked WHERE rank <= {k}
    """
