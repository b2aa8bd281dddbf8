"""Deterministic distributed sketches.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is not
reproducible outside the JVM, so it can never pass a cross-engine hash
gate.  This module implements the classic Flajolet–Martin PCSA
cardinality sketch (Flajolet & Martin 1985, the ancestor of HLL) from
first principles on BOTH engines with md5-derived hashes and
integer-only bit arithmetic — bit-identical estimates, full oracle.

Why integer bit ops instead of HLL's leading-zero rank: the
least-significant set/zero bit is extractable exactly (``x & -x`` and
``~b & (b+1)`` are powers of two, whose ``log2`` is exact in IEEE
doubles), while leading-zero counts via ``floor(log2(w))`` can straddle
the floor boundary differently per libm — a cross-engine hash-gate
hazard.

Scale shape: ONE map-combinable aggregate — per bucket, the ``bit_or``
of observed rank bits (``m`` longs of state per partition, merged by
``bit_or``) — the exact pattern a 100 TB cardinality count needs: no
shuffle of values, only the m-row sketch.  Contrast with exact
``count_distinct``, which shuffles every distinct value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Flajolet–Martin bias correction constant (phi from the 1985 paper).
FM_PHI = 0.77351

#: usable hash bits (60 = 15 hex digits of the md5, BIGINT-safe).
HASH_BITS = 60


def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def _hash60_sql(col: str) -> str:
    digit = f"(strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), {{d}}, 1)) - 1)"
    return (
        "("
        + " + ".join(f"{digit.format(d=d + 1)} * {16 ** (14 - d)}" for d in range(15))
        + ")"
    )


def fm_count_distinct(
    df: DataFrame,
    value_col: Column | str,
    *,
    m: int = 256,
) -> DataFrame:
    """Flajolet–Martin PCSA cardinality estimate of the distinct values
    of ``value_col`` — returns one row ``(m, est_distinct)``.

    Each value hashes to 60 bits; the low ``log2(m)`` bits pick a bucket
    and the rank of the least-significant set bit of the remaining bits
    sets one bit in that bucket's BITMAP (``bit_or`` aggregate — the
    original PCSA register).  Per bucket, ``R`` = index of the lowest
    UNSET bitmap bit; estimate = ``m / phi * 2^(mean R)``, rounded to a
    long.  ``m`` must be a power of two.  NULLs are ignored
    (count-distinct semantics).  Buckets no value hashed into contribute
    ``R = 0`` — the ``sum/m`` mean handles them without densification.
    """
    if m & (m - 1):
        raise ValueError(f"m={m} must be a power of two")
    col = F.col(value_col) if isinstance(value_col, str) else value_col
    base = df.select(_hash60(col).alias("__h")).filter(F.col("__h").isNotNull())
    base = base.select(
        (F.col("__h") % m).alias("__b"),
        # integer division: `/` is DOUBLE division in Spark, and a 53-bit
        # mantissa silently mangles the low bits of a 60-bit hash
        F.expr(f"__h DIV {m}").alias("__w"),
    )
    # the least-significant set bit of w IS the bitmap bit to set (an
    # exact power of two — no rank/shift round-trip needed); an all-zero
    # w observes the top rank's bit.
    bit = F.expr(
        f"CASE WHEN __w = 0 THEN CAST(1 AS BIGINT) << {HASH_BITS}"
        " ELSE __w & -__w END"
    )
    bitmaps = (
        base.select("__b", bit.alias("__bit"))
        .groupBy("__b")
        .agg(F.expr("bit_or(__bit)").alias("__bm"))
    )
    # lowest unset bit of the bitmap, as an exact power of two
    low_zero = F.expr("CAST((~__bm) & (__bm + 1) AS DOUBLE)")
    r = F.log2(low_zero).cast("int").alias("__r")
    est = (
        F.round(F.lit(m / FM_PHI) * F.pow(F.lit(2.0), F.sum("__r") / F.lit(float(m))))
        .cast("long")
        .alias("est_distinct")
    )
    return bitmaps.select("__b", r).agg(F.lit(m).alias("m"), est)


def fm_count_distinct_sql(table: str, value_expr: str, *, m: int = 256) -> str:
    """DuckDB twin of :func:`fm_count_distinct` — same md5 hash, same
    integer bit arithmetic, same rounding."""
    if m & (m - 1):
        raise ValueError(f"m={m} must be a power of two")
    h = _hash60_sql(value_expr)
    return f"""
        WITH __h AS (
            SELECT CAST({h} AS BIGINT) AS h FROM {table}
            WHERE {value_expr} IS NOT NULL
        ),
        __bw AS (
            SELECT h % {m} AS b, CAST(h // {m} AS BIGINT) AS w FROM __h
        ),
        __bits AS (
            SELECT b,
                   CASE WHEN w = 0 THEN CAST(1 AS BIGINT) << {HASH_BITS}
                        ELSE w & -w
                   END AS bit
            FROM __bw
        ),
        __bm AS (SELECT b, bit_or(bit) AS bm FROM __bits GROUP BY 1),
        __r AS (
            SELECT b, CAST(log2(CAST((~bm) & (bm + 1) AS DOUBLE)) AS INT) AS r
            FROM __bm
        )
        SELECT {m} AS m,
               CAST(round({m} / {FM_PHI} * pow(2.0, sum(r) / {float(m)})) AS BIGINT)
               AS est_distinct
        FROM __r
    """
