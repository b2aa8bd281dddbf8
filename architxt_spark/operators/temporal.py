"""Temporal join operators Spark lacks natively: as-of join and range join.

As-of join (``left`` row ← most recent ``right`` row with
``right.ts <= left.ts`` per key) is implemented with the scalable
union + carry-forward pattern: tag both sides, union, ONE shuffle on the
key, and a ``last(..., ignorenulls)`` running window carries the latest
right payload forward to each left row.  No per-key loops, no range
explosion — wall-clock is one sort-based window over the unioned stream,
which survives arbitrary key cardinality and skew (AQE splits hot keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the most recent right row at or before its
    timestamp (per ``by`` key); right columns get ``suffix``.  Left rows
    with no prior right row keep NULLs (left-outer as-of semantics)."""
    right_cols = right_cols or [c for c in right.columns if c not in by and c != right_ts]
    payload = F.struct(F.col(right_ts).alias("__rts"), *[F.col(c) for c in right_cols])

    l_tag = left.select(
        *[F.col(c) for c in by],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType.simpleString()
        ).alias("__r"),
    )
    r_tag = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("l")).schema["l"].dataType.simpleString()
        ).alias("__l"),
        payload.alias("__r"),
    )
    # right rows sort BEFORE left rows at equal timestamps (__src desc), so
    # a right row at exactly left.ts matches — the ASOF convention.
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__src").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__src") == 0)
    )
    out_cols = [F.col("__l")[c].alias(c) for c in left.columns]
    out_cols += [F.col("__match")["__rts"].alias(f"{right_ts}{suffix}")]
    out_cols += [F.col("__match")[c].alias(f"{c}{suffix}") for c in right_cols]
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: list[str],
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """Point-in-interval join: left rows matched to right intervals
    containing their timestamp, equi-keyed on ``by`` so the shuffle stays
    on the key columns (the range predicate filters post-join; for
    interval-heavy workloads bucketize the time axis first)."""
    cond = [left[c] == right[c] for c in by]
    return left.join(
        right,
        cond + [left[left_ts] >= right[right_start], left[left_ts] < right[right_end]],
        "inner",
    )
