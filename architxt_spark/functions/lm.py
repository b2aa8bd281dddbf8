"""N-gram language-model perplexity scoring — the CCNet-style quality
filter: documents whose token stream surprises a corpus LM (high
perplexity) are boilerplate/garbled candidates; very low perplexity flags
templated repetition.

By default the bigram LM is trained on the scored corpus itself (one
pass); pass ``train_docs=`` to train on a clean reference corpus and
score a different frame — the CCNet shape (train on Wikipedia, score the
crawl).  Unseen words/bigrams in the scored frame fall back to the add-k
smoothing floor (count 0), exactly as the formula dictates.

Scale shape: training is two map-combinable groupBys (unigram and bigram
counts — canonical wordcount); scoring joins each document's transitions
against the count tables keyed on the words (shuffle hash joins, never
broadcast-dependent: the bigram vocabulary grows with the corpus), plus a
1-row vocabulary-size aggregate broadcast back.  Per-transition log
probabilities are rounded to 6 and summed as DECIMAL(18,6), so float
accumulation order cannot leak into results; the final ``exp`` is one
deterministic libm call per document on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions.search import retrieval_tokens, retrieval_tokens_sql

#: add-k smoothing constant
SMOOTH_K = 0.5


def _transitions(base: DataFrame, id_col: str) -> DataFrame:
    """(id, w1, w2) bigram transitions; the slice length is clamped to 0 so
    zero-token documents (empty / punctuation-only / non-Latin under the
    ``[^a-z0-9]+`` tokenizer) produce no rows instead of crashing the
    ``F.slice`` with a negative length."""
    n = F.greatest(F.size("__t") - 1, F.lit(0))
    return base.select(
        id_col,
        F.explode(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, n).alias("w1"),
                F.slice(F.col("__t"), 2, n).alias("w2"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def _transitions_outer(base: DataFrame, id_col: str) -> DataFrame:
    """Like :func:`_transitions`, but short documents (< 2 tokens) emit
    one NULL transition row via ``explode_outer`` instead of vanishing —
    the scoring aggregation then produces their ``(n_trans=0, ppl=NULL)``
    rows from the SAME corpus scan, where the former union branch paid a
    second scan + tokenization of the whole frame.  NULL token arrays are
    filtered out to match the old behavior exactly (they appeared in
    neither branch)."""
    n = F.greatest(F.size("__t") - 1, F.lit(0))
    return base.filter(F.col("__t").isNotNull()).select(
        id_col,
        F.explode_outer(
            F.arrays_zip(
                F.slice(F.col("__t"), 1, n).alias("w1"),
                F.slice(F.col("__t"), 2, n).alias("w2"),
            )
        ).alias("p"),
    ).select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_lm_perplexity(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
    train_docs: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram perplexity under an add-``k``-smoothed LM
    trained on ``train_docs`` (default: ``docs`` itself).

    Returns ``(id_col, n_trans, ppl)``; documents with fewer than two
    tokens get ``n_trans = 0`` and NULL perplexity.  Words/bigrams absent
    from the training corpus score with count 0 (the smoothing floor).
    """
    toks = retrieval_tokens(F.col(text_col))
    base = docs.select(F.col(id_col), toks.alias("__t"))
    trans = _transitions_outer(base, id_col)

    if train_docs is None:
        tbase, ttrans = base, _transitions(base, id_col)
    else:
        tbase = train_docs.select(
            F.col(id_col), retrieval_tokens(F.col(text_col)).alias("__t")
        )
        ttrans = _transitions(tbase, id_col)

    uni = (
        tbase.select(F.explode("__t").alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    bi = ttrans.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    vsize = uni.agg(F.count("*").alias("v"))

    logp = F.round(
        F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(k))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v"))
        ),
        6,
    ).cast("decimal(18,6)")
    # ONE corpus scan (r15): short documents (0 or 1 token) ride the same
    # explode as a NULL transition row (_transitions_outer) — counting
    # ``w1`` instead of ``*`` gives them n_trans = 0, their NULL-guarded
    # logp sum stays NULL, and NULL/0 → NULL ppl — the exact rows the
    # former union branch produced with a SECOND scan + tokenization.
    scored = (
        trans.join(bi, ["w1", "w2"], "left")
        .join(uni, ["w1"], "left")
        .crossJoin(F.broadcast(vsize))
        .groupBy(id_col)
        .agg(
            F.count("w1").alias("n_trans"),
            F.sum(F.when(F.col("w1").isNotNull(), logp)).alias("__lsum"),
        )
    )
    ppl = F.round(F.exp(-(F.col("__lsum").cast("double") / F.col("n_trans"))), 4)
    return scored.select(id_col, "n_trans", ppl.alias("ppl"))


def bigram_lm_perplexity_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
    train_table: str | None = None,
) -> str:
    """DuckDB twin — same tokenizer, rounding, decimal summation.
    ``train_table`` (a table name or parenthesizable SELECT) trains the
    model on a reference corpus; scored words/bigrams absent from it
    fall to the count-0 smoothing floor via LEFT JOIN + coalesce, the
    exact join shape of the Spark side."""
    toks = retrieval_tokens_sql(text_col)
    tsrc = (
        "__base"
        if train_table is None
        else f"(SELECT {id_col}, {toks} AS t FROM {train_table})"
    )
    return f"""
        WITH __base AS (
            SELECT {id_col}, {toks} AS t FROM {table}
        ), __tbase AS (
            SELECT * FROM {tsrc}
        ), __trans AS (
            SELECT {id_col}, t[j] AS w1, t[j+1] AS w2 FROM (
                SELECT {id_col}, unnest(generate_series(1, len(t)-1)) AS j, t FROM __base
            )
        ), __uni AS (
            SELECT w1, count(*) AS c1 FROM (
                SELECT unnest(t) AS w1 FROM __tbase
            ) GROUP BY 1
        ), __bi AS (
            SELECT w1, w2, count(*) AS c2 FROM (
                SELECT t[j] AS w1, t[j+1] AS w2 FROM (
                    SELECT unnest(generate_series(1, len(t)-1)) AS j, t FROM __tbase
                )
            ) GROUP BY 1, 2
        ), __v AS (SELECT count(*) AS v FROM __uni),
        __scored AS (
            SELECT t.{id_col}, count(*) AS n_trans,
                   sum(CAST(round(ln((coalesce(b.c2, 0) + {k})
                       / (coalesce(u.c1, 0) + {k} * v.v)), 6)
                       AS DECIMAL(18,6))) AS lsum
            FROM __trans t
            LEFT JOIN __bi b USING (w1, w2)
            LEFT JOIN __uni u USING (w1)
            CROSS JOIN __v v
            GROUP BY 1
        )
        SELECT {id_col}, n_trans, round(exp(-(CAST(lsum AS DOUBLE) / n_trans)), 4) AS ppl
        FROM __scored
        UNION ALL
        SELECT {id_col}, CAST(0 AS BIGINT) AS n_trans, CAST(NULL AS DOUBLE) AS ppl
        FROM __base WHERE len(t) < 2
    """


def ppl_buckets(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
    train_docs: DataFrame | None = None,
    names: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style perplexity partition: score every document under the
    bigram LM, then cut the corpus into ``len(names)`` equal-count
    buckets by perplexity — low-ppl ``head`` is the premium slice a
    pretraining mix oversamples, ``tail`` the one it drops or
    down-weights.  Output: ``(id, n_trans, ppl, bucket)``; short
    documents (NULL ppl) land in bucket ``'und'``.

    Boundary determinism and scale shape: bucket thresholds come from a
    HISTOGRAM of the (4-dp-rounded, hence cross-engine-exact) ppl
    values + a cumsum over that aggregated frame — never a global sort
    or ntile over the corpus (the one-task funnel the plan audit
    flags).  Threshold ``i`` = smallest ppl whose cumulative count
    reaches ``ceil(i·n/parts)``; boundary ties share a bucket (counts
    may deviate from exact thirds on tied values — value-based
    assignment is what keeps the cut deterministic)."""
    from pyspark.sql import Window

    from architxt_spark.session import stage_barrier

    scored = stage_barrier(
        bigram_lm_perplexity(
            docs, id_col=id_col, text_col=text_col, k=k, train_docs=train_docs
        )
    )
    hist = scored.filter(F.col("ppl").isNotNull()).groupBy("ppl").agg(
        F.count("*").cast("long").alias("c")
    )
    w = Window.orderBy("ppl").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.select("ppl", F.sum("c").over(w).alias("cum"))
        .crossJoin(F.broadcast(hist.agg(F.sum("c").cast("long").alias("n"))))
    )
    parts = len(names)
    bounds = None
    for i in range(1, parts):
        b = cum.filter(
            F.col("cum") >= F.ceil(F.col("n") * i / parts)
        ).agg(F.min("ppl").alias(f"__t{i}"))
        bounds = b if bounds is None else bounds.crossJoin(b)
    out = scored.crossJoin(F.broadcast(bounds))
    bucket = F.lit(names[-1])
    for i in reversed(range(1, parts)):
        bucket = F.when(F.col("ppl") <= F.col(f"__t{i}"), F.lit(names[i - 1])).otherwise(bucket)
    bucket = F.when(F.col("ppl").isNull(), F.lit("und")).otherwise(bucket)
    return out.select(id_col, "n_trans", "ppl", bucket.alias("bucket"))


def ppl_buckets_sql(
    table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = SMOOTH_K,
    names: tuple[str, ...] = ("head", "middle", "tail"),
    train_table: str | None = None,
) -> str:
    """DuckDB twin of :func:`ppl_buckets` (same histogram boundary
    arithmetic over the same 4-dp ppl values)."""
    parts = len(names)
    scored = bigram_lm_perplexity_sql(
        table, id_col=id_col, text_col=text_col, k=k, train_table=train_table
    )
    tsel = ", ".join(
        f"(SELECT MIN(ppl) FROM cum WHERE cum >= CEIL(n * {i} / {parts}.0)) AS t{i}"
        for i in range(1, parts)
    )
    case = f"'{names[-1]}'"
    for i in reversed(range(1, parts)):
        case = f"(CASE WHEN ppl <= t{i} THEN '{names[i - 1]}' ELSE {case} END)"
    return f"""
        WITH scored AS ({scored}),
        hist AS (SELECT ppl, CAST(COUNT(*) AS BIGINT) AS c
                 FROM scored WHERE ppl IS NOT NULL GROUP BY ppl),
        cum AS (SELECT ppl, SUM(c) OVER (ORDER BY ppl) AS cum,
                       (SELECT CAST(SUM(c) AS BIGINT) FROM hist) AS n
                FROM hist),
        bounds AS (SELECT {tsel})
        SELECT {id_col}, n_trans, ppl,
               CASE WHEN ppl IS NULL THEN 'und' ELSE {case} END AS bucket
        FROM scored, bounds
    """
