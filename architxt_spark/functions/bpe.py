"""Deterministic BPE merge training over a document corpus.

The classic byte-pair-encoding trainer shape (Sennrich et al. 2016, and
what every tokenizer-training pipeline runs before a big pretraining
job): count words once, then learn merges on the WORD VOCABULARY with
pair frequencies weighted by word counts.

Scale shape: the only wide operation is the initial word count — one
explode + map-combinable groupBy over the corpus (canonical wordcount).
Every merge iteration then runs on the distinct-word vocabulary frame,
which is bounded by the language's vocabulary, not the corpus size; the
per-iteration best-pair pick collects exactly ONE row (aggregate-first,
bounded).

Cross-engine determinism: the symbol state of a word is a single string
with DOUBLED ``\\x1f`` separators between symbols (``⟂⟂a⟂⟂b⟂⟂``), and a
merge is ONE literal ``replace()`` of ``⟂l⟂⟂r⟂`` with ``⟂lr⟂`` — both
Spark and DuckDB scan left-to-right over non-overlapping occurrences,
which IS greedy BPE merge order.  The doubling matters: each match
consumes only the INNER separator on each side, leaving the outer one
for the neighboring pair, so consecutive merges in one word
(``aaaa → aa aa``) chain correctly — with single separators the first
match would eat the boundary the second match needs.  Pair counts are
integers; ties break lexicographically on (left, right).

Simplifications vs production trainers: lower-cased alphanumeric words
(the retrieval tokenizer), no end-of-word marker, char-level initial
symbols.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions.search import retrieval_tokens, retrieval_tokens_sql

SEP = "\x1f"

MERGE_SCHEMA = "step int, left string, right string, merged string, freq long"


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(l, r, cnt) — one row per adjacent symbol pair per vocab word."""
    parts = F.filter(F.split("s", SEP), lambda x: x != "")
    zipped = F.arrays_zip(
        F.slice(parts, 1, F.size(parts) - 1).alias("l"),
        F.slice(parts, 2, F.size(parts) - 1).alias("r"),
    )
    return vocab.select(F.explode(zipped).alias("p"), "cnt").select(
        F.col("p.l").alias("l"), F.col("p.r").alias("r"), "cnt"
    )


def train_bpe_merges(docs: DataFrame, *, text_col: str = "text", n_merges: int = 6) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges; returns
    ``(step, left, right, merged, freq)`` ordered by step."""
    spark = docs.sparkSession

    words = (
        docs.select(F.explode(retrieval_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = words.select(
        F.concat(F.regexp_replace("w", "(.)", SEP + SEP + "$1"), F.lit(SEP + SEP)).alias("s"),
        "cnt",
    ).localCheckpoint(eager=True)

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, n_merges + 1):
        best = (
            _adjacent_pairs(vocab)
            .groupBy("l", "r")
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.desc("freq"), "l", "r")
            .limit(1)
            .collect()
        )
        if not best:
            break
        b = best[0]
        merges.append((step, b.l, b.r, b.l + b.r, b.freq))
        vocab = vocab.select(
            F.replace(
                F.col("s"),
                F.lit(SEP + b.l + SEP + SEP + b.r + SEP),
                F.lit(SEP + b.l + b.r + SEP),
            ).alias("s"),
            "cnt",
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(merges, MERGE_SCHEMA)


def train_bpe_merges_sql(table: str, *, text_col: str = "text", n_merges: int = 6) -> str:
    """DuckDB twin: the merge loop unrolled as CTE blocks (same
    separator-string replace, same tie-breaks)."""
    parts = [
        f"__w AS (SELECT unnest({retrieval_tokens_sql(text_col)}) AS w FROM {table})",
        "__wc AS (SELECT w, count(*) AS cnt FROM __w GROUP BY 1)",
        "__v0 AS (SELECT regexp_replace(w, '(.)', chr(31) || chr(31) || '\\1', 'g')"
        " || chr(31) || chr(31) AS s, cnt FROM __wc)",
    ]
    finals = []
    for i in range(1, n_merges + 1):
        parts.append(
            f"__p{i} AS (SELECT parts[j] AS l, parts[j+1] AS r, sum(cnt) AS freq FROM ("
            f" SELECT unnest(generate_series(1, len(parts)-1)) AS j, parts, cnt FROM ("
            f"  SELECT list_filter(string_split(s, chr(31)), x -> x <> '') AS parts, cnt"
            f"  FROM __v{i-1})"
            f") GROUP BY 1, 2)"
        )
        parts.append(f"__b{i} AS (SELECT l, r, freq FROM __p{i} ORDER BY freq DESC, l, r LIMIT 1)")
        parts.append(
            f"__v{i} AS (SELECT replace(s, chr(31)||l||chr(31)||chr(31)||r||chr(31),"
            f" chr(31)||l||r||chr(31)) AS s, cnt FROM __v{i-1}, __b{i})"
        )
        finals.append(
            f"SELECT {i} AS step, l AS \"left\", r AS \"right\", l||r AS merged,"
            f" CAST(freq AS BIGINT) AS freq FROM __b{i}"
        )
    union = " UNION ALL ".join(finals)
    return "WITH " + ", ".join(parts) + f" SELECT * FROM ({union}) ORDER BY step"
