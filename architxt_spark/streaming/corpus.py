"""Streaming corpus ingestion — the Spark EXTENSION of the batch loaders
(SURVEY §2.8: the reference's ingestion is async-pipelined batch;
Structured Streaming makes the same pipelines incremental).

Because every loader transform in this engine is a plain DataFrame
transform (zero driver-side loops), they run unchanged on ``readStream``
inputs:

- :func:`read_document_stream` — file-source stream of document rows;
- :func:`stream_exact_dedup` — incremental exact deduplication:
  content-fingerprint + ``dropDuplicates`` with a watermark bounds the
  dedup state (the streaming twin of ``dedup.exact_duplicates``);
- :func:`stream_row_trees` — the ``row_trees`` node emission applied to a
  stream (stateless explode ⇒ append-mode safe): incremental forest
  ingestion into a node table / TreeBucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from architxt_spark.functions import text as T


def read_document_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source stream over a documents directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(path)
    )


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    *,
    ts_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """First-seen document per content fingerprint.  With ``ts_col`` the
    dedup state is watermark-bounded (drops state for fingerprints older
    than the watermark — the only way unbounded streams stay O(window));
    without it, state grows with distinct content (batch-like semantics).
    """
    with_fp = stream.withColumn("fingerprint", T.fingerprint(F.col(text_col)))
    if ts_col is not None:
        return with_fp.withWatermark(ts_col, watermark).dropDuplicates(
            ["fingerprint", ts_col]
        )
    return with_fp.dropDuplicates(["fingerprint"])


def stream_row_trees(stream: DataFrame, table_name: str, id_cols: list[str]) -> DataFrame:
    """Incremental node emission: the batch ``row_trees`` transform applied
    to a stream — stateless (select + explode), so it runs in append mode
    and feeds a node-table sink directly."""
    from architxt_spark.sources.documents import row_trees

    return row_trees(stream, table_name, id_cols)
