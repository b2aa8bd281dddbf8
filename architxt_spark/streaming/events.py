"""Event-stream operators: windowed rollups, sessionization, streaming
ingestion.

Batch/stream duality: :func:`hourly_event_rollup` and :func:`sessionize`
are plain DataFrame transforms — applied to a batch frame they are
oracle-checkable against DuckDB; applied to ``readStream`` input (see
:func:`stream_hourly_rollup`) they run incrementally with watermarked
state.  At scale the stateful shuffle is keyed on (window, event_type) /
(user_id) respectively, both low-cardinality-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour rollup per event type: count + value sum.

    Uses ``window(ts, '1 hour')`` — in streaming mode this is the
    watermark-compatible stateful aggregation; in batch mode it equals
    ``date_trunc('hour', ts)``."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: lag(ts) + cumulative sum over the
    gap>threshold flag (the classic batch pattern; ``session_window`` is
    the streaming twin).  Returns one row per session."""
    w_user = Window.partitionBy("user_id").orderBy("ts")
    # microsecond-exact gap comparison (unix_timestamp would truncate to
    # seconds and disagree with sub-second-precision engines at the
    # boundary)
    with_gap = events.withColumn(
        "new_session",
        (
            F.coalesce(
                (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w_user)))
                > gap_minutes * 60 * 1_000_000,
                F.lit(True),
            )
        ).cast("int"),
    ).withColumn("session_seq", F.sum("new_session").over(w_user))
    return (
        with_gap.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "session_start",
            "session_end",
            "n_events",
        )
    )


def read_event_stream(
    spark: SparkSession, path: str, schema: str | None = None, *, glob: str | None = None
) -> DataFrame:
    """File-source stream over an events directory (one file = one
    micro-batch unit).  ``maxFilesPerTrigger`` bounds batch size; ``glob``
    filters file names (the file source requires a DIRECTORY path, so a
    single-file layout is addressed as dir + pathGlobFilter)."""
    if schema is None:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
    # Self-contained session setup: the events parquet carries
    # TIMESTAMP(NANOS) (rejected by default), and formatted timestamps must
    # be TZ-stable regardless of which query ran earlier in the session —
    # never rely on a batch query having pinned these as a side effect.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", 4)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def stream_sessionize(
    stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator: gap-based sessionization with
    ``applyInPandasWithState`` (the streaming twin of :func:`sessionize`).

    State per user = the one OPEN session (start, last, count) in epoch
    micros.  Each micro-batch merges its events into the open session,
    EMITS every session closed by an in-batch gap, keeps the trailing
    session open, and arms an event-time timeout at ``last + gap`` so the
    watermark eventually flushes it.  Shuffle is keyed on user_id; state
    size is O(1) per user — the always-bounded design for an unbounded
    stream."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, n_events long"
    )
    state_schema = "start long, last long, n long"

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key

        def emit(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value) // 1000 for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = 0, 0, 0  # no open session yet

        for t in ts_us:
            if n == 0:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                yield emit(start, last, n)
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1

        if n == 0:
            return
        state.update((start, last, n))
        state.setTimeoutTimestamp(last // 1000 + gap_minutes * 60 * 1000)

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
        )
    )


def stream_hourly_rollup(stream: DataFrame, watermark: str = "2 hours"):
    """The streaming twin of :func:`hourly_event_rollup` with late-data
    handling: watermark bounds state, append mode emits finalized windows."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(F.col("w.start").alias("hour_start"), "event_type", "n_events", "value_sum")
    )
