"""Structured Streaming surface.

The reference has NO streaming (its ingestion is async-pipelined batch,
``architxt/nlp/__init__.py:295-321``); Structured Streaming is the Spark
EXTENSION of the same pipelines (SURVEY §2.8): corpus/event ingestion as an
unbounded stream with watermarked windowed state.

Every transformation here is defined on a DataFrame so it runs identically
in batch mode (the oracle-checked path) and under ``readStream`` — the
recommended Structured Streaming pattern.
"""

from architxt_spark.streaming.events import (  # noqa: F401
    hourly_event_rollup,
    read_event_stream,
    sessionize,
    stream_hourly_rollup,
)
