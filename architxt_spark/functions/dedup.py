"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the point of each variant):

- **exact**: one hash-groupBy on the normalized-content fingerprint.  At
  100 TB this is the cheapest possible full-corpus dedup (map-side partial
  aggregation, one shuffle on the 16-byte hash).
- **n-gram Jaccard (exact)**: candidate pairs from a shingle inverted index
  (join on shingle ⇒ full recall: any pair with Jaccard > 0 shares a
  shingle), then exact Jaccard on the pair.  High-document-frequency
  shingles are capped (``max_shingle_df``) — they generate quadratic pair
  blowup but only ever link near-identical boilerplate.
- **MinHash+LSH**: banded minhash signatures; pairs sharing ≥1 band.
  Hashes are md5-based and deterministic, so the SQL oracle reproduces the
  exact same bands — no approximate-vs-exact drift in the correctness gate.
- **SimHash**: 32-bit sign-of-weighted-sum signature on token hashes;
  equal signatures ⇒ near-dup buckets.
- **embedding cosine**: see :mod:`architxt_spark.functions.ann`.

All Spark forms are built-in expressions (codegen); the ``*_sql`` forms
render the same definition for DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions import text as T

MINHASH_K = 16
MINHASH_BAND_SIZE = 4
SIMHASH_BITS = 32


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(fingerprint, n_docs, keep_id): groups of exact duplicates with the
    kept representative (min id).  One hash-shuffle; map-side combinable."""
    return (
        df.select(T.fingerprint(F.col(text_col)).alias("fingerprint"), F.col(id_col).alias("id"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def exact_duplicates_sql(table: str, text_col: str, id_col: str) -> str:
    return f"""
        SELECT {T.fingerprint_sql(text_col)} AS fingerprint,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN({id_col}) AS keep_id
        FROM {table}
        GROUP BY 1
        HAVING COUNT(*) > 1
    """


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(col: Column, k: int = MINHASH_K) -> Column:
    """k md5-permutation minhashes over word-3-gram shingles.  md5-string
    minima are a valid minwise family and identical across engines."""
    sh = T.shingles(col)
    return F.when(
        F.size(sh) > 0,
        F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda i: F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(i.cast("string"), F.lit("#"), s)))
            ),
        ),
    )


def minhash_bands(col: Column, k: int = MINHASH_K, band_size: int = MINHASH_BAND_SIZE) -> Column:
    sig = minhash_signature(col, k)
    return F.when(
        sig.isNotNull(),
        F.transform(
            F.sequence(F.lit(0), F.lit(k // band_size - 1)),
            lambda b: F.concat(
                b.cast("string"),
                F.lit(":"),
                F.md5(F.array_join(F.slice(sig, b * band_size + 1, band_size), "|")),
            ),
        ),
    )


def minhash_lsh_pairs(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band, with the
    minhash-estimated Jaccard (fraction of equal signature components).

    The band explode + self-join is the scalable path: shuffle is on band
    keys, never all-pairs."""
    base = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(F.col(text_col)).alias("sig"),
        minhash_bands(F.col(text_col)).alias("bands"),
    ).filter(F.col("sig").isNotNull())
    banded = base.select("id", "sig", F.explode("bands").alias("band"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .distinct()
    )
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda e: e,
        )
    ) / F.size(F.col("sig_a"))
    return pairs.select("id_a", "id_b", F.round(est, 4).alias("est_jaccard"))


def minhash_lsh_pairs_sql(table: str, text_col: str, id_col: str) -> str:
    k, r = MINHASH_K, MINHASH_BAND_SIZE
    sh = T.shingles_sql(text_col)
    sig = (
        f"list_transform(range(0, {k}),"
        f" i -> list_min(list_transform({sh}, s -> md5(i::varchar || '#' || s))))"
    )
    return f"""
        WITH sigs AS (
            SELECT {id_col} AS id, {sig} AS sig
            FROM {table}
            WHERE len({sh}) > 0
        ),
        banded AS (
            SELECT id, sig,
                   unnest(list_transform(range(0, {k // r}),
                          b -> b::varchar || ':' || md5(array_to_string(sig[b*{r}+1 : b*{r}+{r}], '|')))) AS band
            FROM sigs
        ),
        pairs AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b, a.sig AS sig_a, b.sig AS sig_b
            FROM banded a JOIN banded b ON a.band = b.band AND a.id < b.id
        )
        SELECT id_a, id_b,
               ROUND(len(list_filter(list_transform(range(1, len(sig_a)+1), i -> sig_a[i] = sig_b[i]), e -> e))
                     / CAST(len(sig_a) AS DOUBLE), 4) AS est_jaccard
        FROM pairs
    """


# ---------------------------------------------------------------------------
# exact n-gram Jaccard via shingle inverted index
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.8,
    max_shingle_df: int = 1000,
) -> DataFrame:
    """Pairs (id_a < id_b) with exact shingle-set Jaccard ≥ threshold.

    Full recall without all-pairs: candidates come from a shingle inverted
    index (equi-join on shingle).  ``max_shingle_df`` drops degenerate
    boilerplate shingles that would cause quadratic pair blowup at scale.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(T.shingles(F.col(text_col))).alias("sh"),
    ).filter(F.size("sh") > 0)
    inv = base.select("id", F.explode("sh").alias("s"))
    rare = inv.groupBy("s").count().filter(F.col("count") <= max_shingle_df).select("s")
    inv = inv.join(F.broadcast(rare), "s")
    cand = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sa = base.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs_sql(table: str, text_col: str, id_col: str, *, threshold: float = 0.8) -> str:
    sh = T.shingles_sql(text_col)
    return f"""
        WITH base AS (
            SELECT {id_col} AS id, list_distinct({sh}) AS sh
            FROM {table}
            WHERE len({sh}) > 0
        )
        SELECT a.id AS id_a, b.id AS id_b,
               ROUND(len(list_intersect(a.sh, b.sh))
                     / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 4) AS jaccard
        FROM base a JOIN base b ON a.id < b.id
        WHERE len(list_intersect(a.sh, b.sh)) > 0
          AND len(list_intersect(a.sh, b.sh))
              / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) >= {threshold}
    """


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash(col: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash over tokens: bit b of a token's md5 (hex-digit bit math, so
    the SQL oracle reproduces it exactly); signature bit = sign of the
    weighted sum across tokens."""
    t = T.tokens(col)
    hexdigits = "0123456789abcdef"

    def tok_bit(tok: Column, b: int) -> Column:
        digit = F.substring(F.md5(tok), b // 4 + 1, 1)
        dv = F.instr(F.lit(hexdigits), digit) - 1
        shift = 3 - b % 4
        return F.floor(dv / (2 ** shift)) % 2

    def merge_for(bb: int):
        # closure factory — a default-arg lambda would get a Column bound to
        # the extra parameter by pyspark's higher-order-function wrapper
        return lambda a, tok: a + 2 * tok_bit(tok, bb) - 1

    acc = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(t, F.lit(0).cast("long"), merge_for(b))
        acc = acc + F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    return F.when(F.size(t) > 0, acc)


def simhash_buckets(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Groups of documents with identical simhash (near-dup buckets)."""
    return (
        df.select(simhash(F.col(text_col)).alias("simhash"), F.col(id_col).alias("id"))
        .filter(F.col("simhash").isNotNull())
        .groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keep_id"))
        .filter(F.col("n_docs") > 1)
    )


def simhash_sql(col: str, bits: int = SIMHASH_BITS) -> str:
    t = T.tokens_sql(col)
    terms = []
    for b in range(bits):
        digit = f"substr(md5(tok), {b // 4 + 1}, 1)"
        dv = f"(strpos('0123456789abcdef', {digit}) - 1)"
        bit = f"(floor({dv} / {2 ** (3 - b % 4)})::bigint % 2)"
        vote = f"list_sum(list_transform({t}, tok -> 2 * {bit} - 1))"
        terms.append(f"(CASE WHEN {vote} > 0 THEN {2 ** b}::BIGINT ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


def simhash_buckets_sql(table: str, text_col: str, id_col: str) -> str:
    return f"""
        SELECT {simhash_sql(text_col)} AS simhash,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               MIN({id_col}) AS keep_id
        FROM {table}
        WHERE len({T.tokens_sql(text_col)}) > 0
        GROUP BY 1
        HAVING COUNT(*) > 1
    """
