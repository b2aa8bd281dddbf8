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
