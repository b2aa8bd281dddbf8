"""DSIR-style importance weighting for data selection (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling").

Given a small TARGET corpus (the distribution you want more of — e.g.
vetted high-quality documents) and the raw corpus to select from, score
every raw document by how much more likely its hashed n-gram features
are under the target bucket model than under the raw bucket model:

    score(d) = mean over features f of  log( p_target(b(f)) / p_raw(b(f)) )

with hashed word unigram+bigram features bucketed into ``n_buckets`` and
add-k smoothed bucket probabilities.  High scores = "looks like the
target"; resampling keeps the top slice (deterministically here — the
paper adds Gumbel noise, which a seeded ``sample_key`` salt reproduces if
wanted).

Scale shape: feature extraction is one narrow explode per document (no
shuffle); the two bucket-count models are map-combinable groupBys whose
output is BOUNDED BY ``n_buckets`` (not the corpus); the log-ratio table
(≤ ``n_buckets`` rows) and the two 1-row totals are broadcast back, so
scoring is one shuffle keyed on the document id for the per-doc sum.
Per-feature log ratios are rounded to 6 and summed as DECIMAL(18,6), so
float accumulation order cannot leak into scores.

Cross-engine determinism: buckets come from the md5 digit-position
construction shared with the dedup/sampling modules (28-bit int of the
first 7 hex digits, mod ``n_buckets``), identical in Spark (``conv``)
and DuckDB (digit arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions import text as T

#: default feature-hash bucket count (the paper uses 10k; 2048 keeps the
#: broadcast table tiny while leaving collisions rare at test scale)
N_BUCKETS = 2048

#: add-k smoothing constant for bucket probabilities
SMOOTH_K = 1.0


def _feature_bucket(s: Column, n_buckets: int) -> Column:
    return (
        F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("long") % n_buckets
    )


def _doc_features(docs: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(id, bucket) — one row per word unigram/bigram occurrence.

    Tokens are materialized behind a projection barrier first
    (``shingles_of_tokens`` contract): inlining the split into the
    shingle lambda re-evaluates it once per SHINGLE — the naive form
    benched 10× slower on the unigram explode alone."""
    base = docs.select(
        F.col(id_col).alias("__id"), T.tokens(F.col(text_col)).alias("__t")
    )
    feats = F.concat(
        F.col("__t"), T.shingles_of_tokens(F.col("__t"), 2)
    )
    return base.select("__id", F.explode(feats).alias("__f")).select(
        "__id", _feature_bucket(F.col("__f"), n_buckets).alias("__b")
    )


def dsir_ratio_model(
    docs: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    k: float = SMOOTH_K,
) -> DataFrame:
    """The bucket-bounded DSIR importance model ``(__b, __lr)``:
    smoothed log probability ratio per hashed feature bucket of the
    target slice vs the raw corpus — the fit-once artifact
    :func:`dsir_scores` broadcasts at scoring time."""
    raw_feats = _doc_features(docs, id_col, text_col, n_buckets)
    tgt_feats = _doc_features(target, id_col, text_col, n_buckets)

    raw_counts = raw_feats.groupBy("__b").agg(F.count("*").alias("__cr"))
    tgt_counts = tgt_feats.groupBy("__b").agg(F.count("*").alias("__ct"))

    # the totals are the bucket-count sums, so they come from the BOUNDED
    # bucket table — the corpus is scanned once per model, not once more
    # per total (the naive 5-pass plan benched 17 s at sf0.1; this shape
    # is 3 passes: two count models + the scoring join)
    buckets = raw_counts.join(tgt_counts, "__b", "full_outer")
    totals = buckets.agg(
        F.sum(F.coalesce(F.col("__cr"), F.lit(0))).alias("__nr"),
        F.sum(F.coalesce(F.col("__ct"), F.lit(0))).alias("__nt"),
    )

    # bucket-bounded ratio table: log((ct+k)/(nt+k*B)) - log((cr+k)/(nr+k*B))
    return (
        buckets.crossJoin(F.broadcast(totals))
        .select(
            "__b",
            F.round(
                F.log(
                    (F.coalesce(F.col("__ct"), F.lit(0)) + F.lit(k))
                    / (F.col("__nt") + F.lit(k) * n_buckets)
                )
                - F.log(
                    (F.coalesce(F.col("__cr"), F.lit(0)) + F.lit(k))
                    / (F.col("__nr") + F.lit(k) * n_buckets)
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("__lr"),
        )
    )


def dsir_scores(
    docs: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    k: float = SMOOTH_K,
    ratios: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR importance score of ``docs`` against ``target``.

    Returns ``(id_col, n_feats, dsir_score)``; documents with no features
    (empty/whitespace text) get ``n_feats = 0`` and NULL score.
    ``dsir_score`` is the mean per-feature log probability ratio, rounded
    to 4.  ``ratios`` takes a precomputed :func:`dsir_ratio_model` table
    (the fit-once importance model of Xie et al. — a deployment
    estimates it per corpus snapshot and scores every batch against it);
    identical values either way.
    """
    if ratios is None:
        ratios = dsir_ratio_model(
            docs, target, id_col=id_col, text_col=text_col,
            n_buckets=n_buckets, k=k,
        )

    # ONE corpus scan (r15): feature-less documents ride the same explode
    # as a NULL feature row (explode_outer) instead of a second scan +
    # tokenization union branch.  The former INNER ratio join becomes a
    # LEFT join + post-aggregation filter that replays its semantics
    # exactly: n_feats counts only model-matched features, documents
    # whose every feature is absent from the model still drop out
    # (n_feats = 0 with no NULL marker row), and the NULL row keeps
    # feature-less documents in the output with (0, NULL).
    base = docs.select(
        F.col(id_col).alias("__id"), T.tokens(F.col(text_col)).alias("__t")
    ).filter(F.col("__t").isNotNull())
    feats = F.concat(F.col("__t"), T.shingles_of_tokens(F.col("__t"), 2))
    rows = base.select("__id", F.explode_outer(feats).alias("__f")).select(
        "__id", "__f", _feature_bucket(F.col("__f"), n_buckets).alias("__b")
    )
    return (
        rows.join(F.broadcast(ratios), "__b", "left")
        .groupBy("__id")
        .agg(
            F.count("__lr").alias("n_feats"),
            F.sum("__lr").alias("__lsum"),
            F.max(F.col("__f").isNull().cast("int")).alias("__empty"),
        )
        .filter((F.col("n_feats") > 0) | (F.col("__empty") == 1))
        .select(
            F.col("__id").alias(id_col),
            "n_feats",
            F.round(F.col("__lsum").cast("double") / F.col("n_feats"), 4).alias(
                "dsir_score"
            ),
        )
    )


def dsir_scores_sql(
    table: str,
    target_where: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    k: float = SMOOTH_K,
) -> str:
    """DuckDB twin — ``target_where`` is a predicate selecting the target
    slice from ``table`` (the query-level convention for oracle replay);
    same bucket hash, same smoothing, same DECIMAL summation."""
    uni = T.shingles_sql(text_col, 1)
    bi = T.shingles_sql(text_col, 2)
    digit = "(strpos('0123456789abcdef', substr(md5(f), {d}, 1)) - 1)"
    h = " + ".join(f"{digit.format(d=d + 1)} * {16 ** (6 - d)}" for d in range(7))
    bucket = f"(CAST({h} AS BIGINT) % {n_buckets})"
    return f"""
        WITH __rawf AS (
            SELECT {id_col} AS id, {bucket} AS b FROM (
                SELECT {id_col}, unnest(list_concat({uni}, {bi})) AS f FROM {table}
            )
        ),
        __tgtf AS (
            SELECT {bucket} AS b FROM (
                SELECT unnest(list_concat({uni}, {bi})) AS f FROM {table}
                WHERE {target_where}
            )
        ),
        __rc AS (SELECT b, count(*) AS cr FROM __rawf GROUP BY 1),
        __tc AS (SELECT b, count(*) AS ct FROM __tgtf GROUP BY 1),
        __rt AS (SELECT count(*) AS nr FROM __rawf),
        __tt AS (SELECT count(*) AS nt FROM __tgtf),
        __ratio AS (
            SELECT coalesce(__rc.b, __tc.b) AS b,
                   CAST(round(
                       ln((coalesce(ct, 0) + {k}) / (nt + {k} * {n_buckets}))
                       - ln((coalesce(cr, 0) + {k}) / (nr + {k} * {n_buckets})), 6)
                   AS DECIMAL(18,6)) AS lr
            FROM __rc FULL OUTER JOIN __tc ON __rc.b = __tc.b
            CROSS JOIN __rt CROSS JOIN __tt
        ),
        __scored AS (
            SELECT id, count(*) AS n_feats, sum(lr) AS lsum
            FROM __rawf JOIN __ratio USING (b)
            GROUP BY 1
        )
        SELECT id AS {id_col}, n_feats,
               round(CAST(lsum AS DOUBLE) / n_feats, 4) AS dsir_score
        FROM __scored
        UNION ALL
        SELECT {id_col}, CAST(0 AS BIGINT) AS n_feats, CAST(NULL AS DOUBLE) AS dsir_score
        FROM {table} WHERE len({T.tokens_sql(text_col)}) = 0
    """


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    *,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    smooth_k: float = SMOOTH_K,
    salt: str = "",
) -> DataFrame:
    """The DSIR paper's RESAMPLING step: keep ``k`` documents drawn
    without replacement with probability ∝ importance weight, via the
    Gumbel-top-k trick — rank by ``log w_i + g_i`` where ``g_i`` is a
    Gumbel(0,1) draw, here derived DETERMINISTICALLY from the salted
    document hash (``u = (key + 0.5) / HASH_MOD``, ``g = −ln(−ln u)``),
    so the draw is reproducible and bit-identical across engines.

    ``log w_i`` is the document's total (not mean) log probability
    ratio — ``dsir_score × n_feats``.  Returns ``(id_col, sel_key,
    sel_rank)`` for the selected documents, ranked best-first.

    Scale shape: scoring is :func:`dsir_scores` (bounded broadcast
    models); the global top-k is ``orderBy().limit(k)`` which Spark
    executes as TakeOrderedAndProject — per-partition k-heaps plus one
    driver merge of ≤ partitions×k rows, never a full sort shuffle.
    Feature-less documents (NULL score) are not selectable."""
    scored = dsir_scores(
        docs, target, id_col=id_col, text_col=text_col, n_buckets=n_buckets, k=smooth_k
    )
    return dsir_select_from_scores(scored, k=k, id_col=id_col, salt=salt)


def dsir_select_from_scores(
    scored: DataFrame, *, k: int = 100, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """The Gumbel-top-k step alone, over an ALREADY-SCORED frame
    (``dsir_scores`` output) — lets callers that need both the weights
    and the take share one scoring pass behind a barrier instead of
    running the bucket models twice."""
    from architxt_spark.functions.sampling import HASH_MOD, sample_key

    scored = scored.filter(F.col("dsir_score").isNotNull())
    key = sample_key(F.col(id_col), salt)
    u = (key + F.lit(0.5)) / F.lit(float(HASH_MOD))
    gumbel = -F.log(-F.log(u))
    sel = F.round(
        F.col("dsir_score") * F.col("n_feats") + gumbel, 6
    ).alias("sel_key")
    ranked = (
        scored.select(F.col(id_col), sel)
        .orderBy(F.col("sel_key").desc(), F.col(id_col))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("sel_key").desc(), F.col(id_col))
    return ranked.withColumn("sel_rank", F.row_number().over(w).cast("int"))


def dsir_select_sql(
    table: str,
    target_where: str,
    *,
    k: int = 100,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    smooth_k: float = SMOOTH_K,
    salt: str = "",
) -> str:
    """DuckDB twin of :func:`dsir_select` — same deterministic Gumbel
    construction over the shared hash, same rounding."""
    from architxt_spark.functions.sampling import HASH_MOD, sample_key_sql

    scores = dsir_scores_sql(
        table, target_where, id_col=id_col, text_col=text_col, n_buckets=n_buckets, k=smooth_k
    )
    key = sample_key_sql(id_col, salt)
    return f"""
        WITH __sc AS ({scores}),
        __sel AS (
            SELECT {id_col},
                   round(dsir_score * n_feats
                         - ln(-ln(({key} + 0.5) / {float(HASH_MOD)})), 6) AS sel_key
            FROM __sc WHERE dsir_score IS NOT NULL
        )
        SELECT {id_col}, sel_key,
               CAST(ROW_NUMBER() OVER (ORDER BY sel_key DESC, {id_col}) AS INT) AS sel_rank
        FROM __sel
        ORDER BY sel_key DESC, {id_col}
        LIMIT {k}
    """
