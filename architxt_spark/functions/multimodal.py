"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata.

Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the actual codec work (image decode, audio
resample, video frame extraction) is STUBBED — the decode libraries
(Pillow / librosa / pyav) are not in this container.  Each stub either
raises ``NotImplementedError`` (real-codec path) or runs a clearly-marked
deterministic fake (test path) so the distributed machinery can be
exercised end to end.

Design notes for 100 TB of media:

- media bytes travel as a ``binary`` column next to a ``struct`` metadata
  column — never exploded into rows;
- per-batch work uses ``mapInPandas`` (Arrow zero-copy into the Python
  worker, one batch ≈ ``spark.sql.execution.arrow.maxRecordsPerBatch``);
- partition sizing: media rows are big, so repartition by byte budget
  (``target_partition_bytes``), not row count.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("meta", StructType([
            StructField("format", StringType(), True),
            StructField("width", IntegerType(), True),
            StructField("height", IntegerType(), True),
            StructField("duration_ms", LongType(), True),
            StructField("n_bytes", LongType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = "media_id string, kind string, feature array<float>, n_bytes long"


def with_byte_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side metadata: byte length + content hash (no decode)."""
    return df.withColumn("n_bytes", F.length(F.col(content_col)).cast("long")).withColumn(
        "content_md5", F.md5(F.col(content_col))
    )


def repartition_by_bytes(df: DataFrame, total_bytes: int, target_partition_bytes: int = 128 << 20) -> DataFrame:
    """Size partitions by byte budget — media rows are huge, row counts lie."""
    n = max(1, total_bytes // target_partition_bytes)
    return df.repartition(n)


def decode_image(content: bytes) -> tuple[int, int]:
    """Real decode path — requires an image codec library.

    STUB: Pillow is not available in this container."""
    raise NotImplementedError("image decode requires Pillow/opencv; not in this environment")


def fake_decode_dims(content: bytes) -> tuple[int, int]:
    """Deterministic FAKE decoder for tests: derives dimensions from the
    content hash.  Clearly not a real codec."""
    import hashlib

    h = hashlib.md5(content or b"").digest()
    return (h[0] % 64 + 1, h[1] % 64 + 1)


def extract_features(df: DataFrame, *, use_fake_decoder: bool = True) -> DataFrame:
    """Per-batch feature extraction over media rows via ``mapInPandas``.

    With ``use_fake_decoder`` the pipeline runs end to end with the
    deterministic fake (feature = normalized byte histogram head); without
    it, the real-codec path raises ``NotImplementedError``.
    """
    import numpy as np
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for content in pdf["content"]:
                if content is None:
                    feats.append(None)
                    continue
                if not use_fake_decoder:
                    decode_image(bytes(content))
                arr = np.frombuffer(bytes(content), dtype=np.uint8)
                hist = np.bincount(arr % 16, minlength=16).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(bytes(c)) if c is not None else 0 for c in pdf["content"]],
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(run, FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling requires a video codec — STUB (pyav not available).
    The plumbing (explode of a frame index per media row) is real."""
    raise NotImplementedError("video frame sampling requires pyav/ffmpeg; not in this environment")
