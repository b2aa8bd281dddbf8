"""Export-time type recovery.

The reference's value domain is strings-only (leaves are tokens); proper
types are recovered at export by a best-effort parse chain — Date, DateTime,
bool, int, float, else keep the string — applied per value
(``architxt/database/export/sql.py:262-300``; same chain for Cypher at
``export/cypher.py:136-164``).

Here the chain is decided per COLUMN with one distributed aggregation pass
(a column is typed T iff every non-null value parses as T), then applied
with plain casts — so the hot path is two scans with zero UDFs instead of a
per-value Python parse.  Matching the reference's *Python* parse semantics
(``date.fromisoformat`` rejects time parts, ``int()`` rejects decimals)
needs strict regex guards, which also keeps the semantics engine-independent
(Spark's bare try_cast would truncate "2020-01-01 00:00:00" to a date and
round "1.5" into bigint on some engines).

The BLOB/base64 leg of the reference chain is intentionally not inferred:
base64 is indistinguishable from ordinary text by parsing, so binary columns
must be declared by the caller (``metadata['type']`` carries the original
column type through the loaders for that purpose).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DATE_RE = r"^\d{4}-\d{2}-\d{2}$"
_TS_RE = r"^\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(\.\d+)?$"
_INT_RE = r"^[+-]?\d+$"


def _ok(col: Column, spark_type: str) -> Column:
    """Value parses as ``spark_type`` under the reference's Python-parse
    semantics (strict formats, no lossy truncation)."""
    if spark_type == "date":
        return col.rlike(_DATE_RE) & F.try_to_timestamp(col).isNotNull()
    if spark_type == "timestamp":
        return col.rlike(_TS_RE) & F.try_to_timestamp(col).isNotNull()
    if spark_type == "boolean":
        return F.lower(col).isin("true", "false")
    if spark_type == "bigint":
        return col.rlike(_INT_RE) & col.try_cast("bigint").isNotNull()
    if spark_type == "double":
        return col.try_cast("double").isNotNull()
    raise ValueError(spark_type)


#: the reference's parse order (``export/sql.py:276-298``): first match wins.
CAST_CHAIN = ("date", "timestamp", "boolean", "bigint", "double")


def infer_column_types(df: DataFrame, columns: list[str] | None = None) -> dict[str, str]:
    """Winning type per string column — ONE aggregation over the data.

    A column gets type T iff it has ≥1 non-null value and every non-null
    value parses as T; first match in :data:`CAST_CHAIN` wins, else
    ``string``.
    """
    columns = columns or [c for c, t in df.dtypes if t == "string"]
    aggs = []
    for c in columns:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"__n__{c}"))
        for t in CAST_CHAIN:
            aggs.append(
                F.count(F.when(_ok(col, t), 1)).alias(f"__{t}__{c}")
            )
    row = df.agg(*aggs).first()
    out: dict[str, str] = {}
    for c in columns:
        n = row[f"__n__{c}"]
        out[c] = next(
            (t for t in CAST_CHAIN if n and row[f"__{t}__{c}"] == n), "string"
        )
    return out


def apply_typed_casts(df: DataFrame, types: dict[str, str] | None = None) -> DataFrame:
    """Cast string columns to their recovered types (inferring them when not
    given).  Non-string columns and ``string``-typed winners pass through."""
    types = types if types is not None else infer_column_types(df)
    cols = []
    for c in df.columns:
        t = types.get(c)
        if t in (None, "string"):
            cols.append(F.col(c))
        elif t == "boolean":
            cols.append((F.lower(F.col(c)) == "true").alias(c))
        elif t == "timestamp":
            cols.append(F.try_to_timestamp(F.col(c)).alias(c))
        elif t == "date":
            cols.append(F.try_to_timestamp(F.col(c)).cast("date").alias(c))
        else:
            cols.append(F.col(c).try_cast(t).alias(c))
    return df.select(*cols)
