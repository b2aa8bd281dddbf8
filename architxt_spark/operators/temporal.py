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
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row per ``by`` key —
    the most recent at-or-before its timestamp (``direction='backward'``,
    default) or the earliest at-or-after it (``'forward'``); right columns
    get ``suffix``.  ``tolerance_seconds`` nulls out matches farther than
    the tolerance (pandas ``merge_asof`` semantics).  Left rows with no
    match keep NULLs (left-outer as-of).  Either direction is the same
    union + carry window: ONE shuffle on the key, never a range
    self-join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
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
    # Equal-timestamp rights must land INSIDE the left row's frame so an
    # exact-ts right matches (the ASOF convention): backward frames end at
    # the current row, so rights sort before lefts (__src desc); forward
    # frames start at the current row, so rights sort after (__src asc).
    # The payload struct is the FINAL sort key so ties on (key, ts) among
    # right rows resolve deterministically to the SMALLEST payload
    # (ts, then right_cols in order) instead of an engine-dependent pick:
    # backward's `last` sees equal-ts rights ordered desc, forward's
    # `first` sees them asc — both select the minimum.  Payload columns
    # must therefore be orderable types (true of any id/scalar payload).
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__src").desc(), F.col("__r").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last("__r", ignorenulls=True)
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts").asc(), F.col("__src").asc(), F.col("__r").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first("__r", ignorenulls=True)
    carried = (
        l_tag.unionByName(r_tag)
        .withColumn("__match", pick.over(w))
        .filter(F.col("__src") == 0)
    )
    if tolerance_seconds is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - F.col("__match")["__rts"].cast("double")
        )
        carried = carried.withColumn(
            "__match", F.when(gap <= F.lit(float(tolerance_seconds)), F.col("__match"))
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
