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
    with_gap = events.withColumn(
        "new_session",
        (
            F.coalesce(
                (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w_user)))
                > gap_minutes * 60,
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


def read_event_stream(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """File-source stream over an events directory (one file = one
    micro-batch unit).  ``maxFilesPerTrigger`` bounds batch size."""
    if schema is None:
        schema = (
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string"
        )
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
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
