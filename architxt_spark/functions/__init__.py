"""Scalar/table functions for large-scale training-data pipelines.

Beyond the reference's own operator surface (SURVEY §2), these are the
first-class LLM-data-pipeline operators: text analysis, deduplication,
similarity search, multimodal columns.  Every function is designed twice:

- a Spark implementation using built-in ``pyspark.sql.functions`` (JVM-side,
  whole-stage-codegen; no Python UDFs in the hot path), and
- a DuckDB SQL rendering of the SAME definition (see ``*_sql`` helpers),
  so the driver's oracle comparison is exact by construction.
"""

from architxt_spark.functions import dedup, text, ann, multimodal  # noqa: F401
