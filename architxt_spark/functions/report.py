"""Corpus datasheet: one tagged stats frame describing a document corpus.

Beyond-reference component — the "datasheet for datasets" artifact a
curation run publishes next to the corpus: sizes, exact token-length
deciles, language mix, duplication rate, quality summary, top sources.
One operator call, one long frame ``(section, key, value)``, every row
replayable in SQL.

Scale design:

- **One signal projection, materialized once.**  Every statistic reads
  the same per-document signal frame (token count, quality, gopher flag,
  fingerprint, language, source) which sits behind a single
  :func:`stage_barrier` — the corpus is scanned and the signals computed
  exactly once, then five SMALL aggregations run over the checkpoint.
- **Exact deciles without a sort.**  Percentiles of token length come
  from a length HISTOGRAM (``groupBy(n_tok)`` — map-combinable, state
  bounded by the number of DISTINCT lengths, ~1e5 at any corpus size),
  then a window cumsum over that small frame.  Spark's exact
  ``percentile`` aggregate funnels every value into one reducer — the
  classic 100-TB trap this avoids; the histogram stays exact where a
  ``approx_percentile`` sketch would drift between engines.
  Definition: decile ``q`` = smallest length whose cumulative count
  reaches ``ceil(q * n)`` (identical integer arithmetic in the twin).
- **Deterministic floats.**  Mean quality follows the
  ``functions/domains.py`` rule (round → DECIMAL sum → divide) so float
  accumulation order cannot leak into results; shares divide two exact
  BIGINTs (one IEEE op, ulp-stable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from architxt_spark.functions import text as T
from architxt_spark.session import stage_barrier

__all__ = ["corpus_report", "corpus_report_sql", "REPORT_DECILES"]

#: report percentiles (of per-document token counts)
REPORT_DECILES = (10, 25, 50, 75, 90)


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    *,
    lang_col: str | None = None,
    source_col: str | None = None,
    top_sources: int = 5,
) -> DataFrame:
    """Tagged corpus datasheet ``(section, key, value double)``:

    - ``size``: n_docs, n_tokens, n_chars;
    - ``length``: exact token-count deciles (``REPORT_DECILES``);
    - ``lang``: share per language (``lang_col`` or :func:`~.text.lang_id`);
    - ``dup``: exact-duplicate share (1 − distinct fingerprints / docs);
    - ``quality``: deterministic mean quality score + Gopher pass rate;
    - ``source``: top-``top_sources`` sources by doc count (ties → name).

    Counts are exact BIGINTs carried in the double column (integers
    < 2^53 are exact); derived ratios are single IEEE divisions of
    exact integers."""
    from architxt_spark.functions.dedup import _spread

    df = _spread(df)
    lang = F.col(lang_col) if lang_col else T.lang_id(F.col(text_col))
    # Barrier ONLY the cheap narrow signals the grouped consumers share.
    # The quality/gopher columns deliberately stay OUT of the checkpointed
    # projection: a checkpoint materializes the Project on the
    # interpreted (no-CSE) eval path, where gopher's composite
    # re-evaluates its token/shingle subtrees per row — measured 10 s vs
    # 0.03 s for the SAME expression under an aggregate at sf0.1.  Their
    # two scalars come from one direct (codegen, pruned) aggregate over
    # the source instead.
    sig = stage_barrier(
        df.select(
            T.token_count(F.col(text_col)).alias("n_tok"),
            F.length(F.col(text_col)).alias("n_chars"),
            T.fingerprint(F.col(text_col)).alias("fp"),
            lang.alias("lang"),
            (F.col(source_col) if source_col else F.lit("all")).alias("src"),
        )
    )

    # Barriered 1-row frame: three consumers below (size, dupq, langs'
    # n_docs) would otherwise each re-run BOTH aggregates — including the
    # expensive quality/gopher corpus pass — once per union branch
    # (measured: ~5 repeated 32-task aggregate jobs per corpus_report run).
    scalars = stage_barrier(
        sig.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.count_distinct("fp").alias("n_distinct"),
        ).crossJoin(
            F.broadcast(
                df.agg(
                    F.sum(
                        F.round(T.quality_score(F.col(text_col)), 6).cast("decimal(18,6)")
                    )
                    .cast("double")
                    .alias("q_sum"),
                    F.sum(T.gopher_keep(F.col(text_col)).cast("int"))
                    .cast("long")
                    .alias("n_keep"),
                )
            )
        )
    )
    size = scalars.selectExpr(
        "stack(3, 'n_docs', cast(n_docs as double), "
        "'n_tokens', cast(n_tokens as double), "
        "'n_chars', cast(n_chars as double)) AS (key, value)"
    ).select(F.lit("size").alias("section"), "key", "value")
    dupq = scalars.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("dup").alias("section"),
                    F.lit("exact_dup_share").alias("key"),
                    (
                        F.lit(1.0)
                        - F.col("n_distinct").cast("double") / F.col("n_docs")
                    ).alias("value"),
                ),
                F.struct(
                    F.lit("quality").alias("section"),
                    F.lit("mean_quality").alias("key"),
                    F.round(F.col("q_sum") / F.col("n_docs"), 4).alias("value"),
                ),
                F.struct(
                    F.lit("quality").alias("section"),
                    F.lit("gopher_pass_rate").alias("key"),
                    (F.col("n_keep").cast("double") / F.col("n_docs")).alias(
                        "value"
                    ),
                ),
            )
        ).alias("r")
    ).select("r.section", "r.key", "r.value")

    # exact deciles from the bounded length histogram
    hist = sig.groupBy("n_tok").agg(F.count("*").cast("long").alias("c"))
    # the unpartitioned cumsum window single-tasks the HISTOGRAM, whose
    # size is bounded by distinct lengths — never the corpus
    w = Window.orderBy("n_tok").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.select("n_tok", F.sum("c").over(w).alias("cum"))
        .crossJoin(F.broadcast(hist.agg(F.sum("c").cast("long").alias("n"))))
    )
    # All deciles from ONE aggregate over the (tiny) cumulative histogram:
    # min(when(cum >= ceil(n*p/100), n_tok)) ≡ the former per-p
    # filter-then-min — min ignores the nulls when() leaves — so values
    # are identical while 5 separate jobs (each re-reading the signal
    # checkpoint and re-building the histogram) collapse into one.
    dec_row = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.col("n") * p / 100), F.col("n_tok")
                )
            )
            .cast("double")
            .alias(f"p{p}")
            for p in REPORT_DECILES
        ]
    )
    stack_args = ", ".join(f"'p{p}_tokens', p{p}" for p in REPORT_DECILES)
    deciles = dec_row.selectExpr(
        f"stack({len(REPORT_DECILES)}, {stack_args}) AS (key, value)"
    ).select(F.lit("length").alias("section"), "key", "value")

    langs = (
        sig.groupBy("lang")
        .agg(F.count("*").cast("long").alias("c"))
        .crossJoin(F.broadcast(scalars.select("n_docs")))
        .select(
            F.lit("lang").alias("section"),
            F.col("lang").alias("key"),
            (F.col("c").cast("double") / F.col("n_docs")).alias("value"),
        )
    )
    sources = (
        sig.groupBy("src")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.desc("c"), "src")
        .limit(top_sources)
        .select(
            F.lit("source").alias("section"),
            F.col("src").alias("key"),
            F.col("c").cast("double").alias("value"),
        )
    )
    return size.unionAll(deciles).unionAll(langs).unionAll(dupq).unionAll(sources)


def corpus_report_sql(
    table: str,
    text_col: str = "text",
    *,
    lang_col: str | None = None,
    source_col: str | None = None,
    top_sources: int = 5,
) -> str:
    """DuckDB twin of :func:`corpus_report` (same histogram-decile
    definition, same DECIMAL mean, same tag vocabulary)."""
    lang = lang_col or T.lang_id_sql(text_col)
    src = source_col or "'all'"
    decile_rows = " UNION ALL ".join(
        f"""SELECT 'length' AS section, 'p{p}_tokens' AS key,
            (SELECT CAST(MIN(n_tok) AS DOUBLE) FROM cum
             WHERE cum >= CEIL(n * {p} / 100.0)) AS value"""
        for p in REPORT_DECILES
    )
    return f"""
        WITH sig AS (
            SELECT {T.token_count_sql(text_col)} AS n_tok,
                   length({text_col}) AS n_chars,
                   CAST(round({T.quality_score_sql(text_col)}, 6) AS DECIMAL(18,6)) AS q,
                   CAST({T.gopher_keep_sql(text_col)} AS INT) AS keep,
                   {T.fingerprint_sql(text_col)} AS fp,
                   {lang} AS lang,
                   {src} AS src
            FROM {table}
        ),
        scalars AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
                   CAST(SUM(n_chars) AS BIGINT) AS n_chars,
                   CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_distinct,
                   CAST(SUM(q) AS DOUBLE) AS q_sum,
                   CAST(SUM(keep) AS BIGINT) AS n_keep
            FROM sig
        ),
        hist AS (SELECT n_tok, CAST(COUNT(*) AS BIGINT) AS c FROM sig GROUP BY n_tok),
        cum AS (
            SELECT n_tok,
                   SUM(c) OVER (ORDER BY n_tok) AS cum,
                   SUM(c) OVER () AS n
            FROM hist
        )
        SELECT 'size' AS section, 'n_docs' AS key, CAST(n_docs AS DOUBLE) AS value FROM scalars
        UNION ALL SELECT 'size', 'n_tokens', CAST(n_tokens AS DOUBLE) FROM scalars
        UNION ALL SELECT 'size', 'n_chars', CAST(n_chars AS DOUBLE) FROM scalars
        UNION ALL {decile_rows}
        UNION ALL SELECT 'lang', lang, CAST(COUNT(*) AS BIGINT) / CAST((SELECT n_docs FROM scalars) AS DOUBLE)
                  FROM sig GROUP BY lang
        UNION ALL SELECT 'dup', 'exact_dup_share',
                  1.0 - CAST(n_distinct AS DOUBLE) / n_docs FROM scalars
        UNION ALL SELECT 'quality', 'mean_quality', round(q_sum / n_docs, 4) FROM scalars
        UNION ALL SELECT 'quality', 'gopher_pass_rate', CAST(n_keep AS DOUBLE) / n_docs FROM scalars
        UNION ALL (SELECT 'source', src, CAST(COUNT(*) AS DOUBLE)
                   FROM sig GROUP BY src
                   ORDER BY COUNT(*) DESC, src LIMIT {top_sources})
    """
