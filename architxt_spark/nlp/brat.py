"""BRAT standoff (.ann) parsing as pure column operations
(``architxt/nlp/brat.py:21-148`` — ``convert_brat_entities`` /
``convert_brat_relations``: uppercase tags, allow-list filter, rename map).

Input: a DataFrame with (doc_id, ann) where ``ann`` is the full .ann file
text.  Standoff lines handled:

- entities   ``T1\\tTYPE 10 16\\tsurface`` (discontinuous spans
  ``TYPE 0 5;10 12`` keep the min start / max end envelope, like the
  reference's span handling);
- relations  ``R1\\tTYPE Arg1:T3 Arg2:T4``.

Everything is split/regexp/filter — one narrow pass, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENT_RE = r"^(T\d+)\t([^ \t]+) (\d+)[^\t]*?(\d+)\t(.*)$"
_REL_RE = r"^(R\d+)\t([^ \t]+) Arg1:(T\d+) Arg2:(T\d+)"


def _lines(df: DataFrame, ann_col: str) -> DataFrame:
    return df.select(
        "doc_id", F.explode(F.split(F.col(ann_col), r"\n")).alias("line")
    )


def parse_ann_entities(
    df: DataFrame,
    ann_col: str = "ann",
    *,
    allowed: list[str] | None = None,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, ent_id, name, start, end, value) from T-lines.  Tags are
    upper-cased, optionally allow-list filtered and renamed (the reference's
    ``entities_filter`` / ``entities_mapping``)."""
    lines = _lines(df, ann_col).filter(F.col("line").rlike(_ENT_RE))
    out = lines.select(
        "doc_id",
        F.regexp_extract("line", _ENT_RE, 1).alias("ent_id"),
        F.upper(F.regexp_extract("line", _ENT_RE, 2)).alias("name"),
        F.regexp_extract("line", _ENT_RE, 3).cast("int").alias("start"),
        F.regexp_extract("line", _ENT_RE, 4).cast("int").alias("end"),
        F.regexp_extract("line", _ENT_RE, 5).alias("value"),
    )
    if renames:
        mapping = F.create_map(*[F.lit(x) for kv in renames.items() for x in (kv[0].upper(), kv[1].upper())])
        out = out.withColumn("name", F.coalesce(mapping[F.col("name")], F.col("name")))
    if allowed is not None:
        out = out.filter(F.col("name").isin([a.upper() for a in allowed]))
    return out


def parse_ann_relations(
    df: DataFrame,
    ann_col: str = "ann",
    *,
    allowed: list[str] | None = None,
    renames: dict[str, str] | None = None,
) -> DataFrame:
    """(doc_id, rel_id, name, src, dst) from R-lines."""
    lines = _lines(df, ann_col).filter(F.col("line").rlike(_REL_RE))
    out = lines.select(
        "doc_id",
        F.regexp_extract("line", _REL_RE, 1).alias("rel_id"),
        F.upper(F.regexp_extract("line", _REL_RE, 2)).alias("name"),
        F.regexp_extract("line", _REL_RE, 3).alias("src"),
        F.regexp_extract("line", _REL_RE, 4).alias("dst"),
    )
    if renames:
        mapping = F.create_map(*[F.lit(x) for kv in renames.items() for x in (kv[0].upper(), kv[1].upper())])
        out = out.withColumn("name", F.coalesce(mapping[F.col("name")], F.col("name")))
    if allowed is not None:
        out = out.filter(F.col("name").isin([a.upper() for a in allowed]))
    return out
