"""End-to-end corpus curation pipeline: the integration operator that
chains the hygiene and dedup primitives the way a real pretraining-data
run does — quality-gate first (cheap per-row flags prune the junk before
anything pays a shuffle), then exact + near-duplicate removal on the
survivors.

Scale shape follows from the parts: the Gopher quality gate is a pure
scan filter (no shuffle — junk never reaches the dedup index), and
``dedup_filter`` is one fingerprint groupBy + the banded minhash index
on the REDUCED corpus.  Stage ordering matters at 100 TB: the quality
gate typically drops 30–60% of a web crawl, and every dropped row is a
row the minhash shuffle never carries.

Cross-engine determinism: every stage reuses an existing twin-tested
primitive (`text.gopher_keep`, `dedup.dedup_filter`), so the census
counts replay exactly in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.functions import text as T
from architxt_spark.functions.dedup import _spread, dedup_filter, dedup_filter_sql
from architxt_spark.session import stage_barrier


def curate_corpus(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_threshold: float = 0.5,
) -> tuple[DataFrame, DataFrame]:
    """Run the curation chain; returns ``(kept_docs, census)`` where
    ``census`` is ``(stage, n_docs)`` for stages ``input`` →
    ``quality`` → ``dedup`` (each count is the survivors AFTER that
    stage).  ``kept_docs`` is the original schema filtered to the final
    survivor set."""
    # materialize the gate's survivors ONCE: the census, the fingerprint
    # pass, and the minhash index all read this frame, and re-evaluating
    # the (shingle-heavy) quality predicate per consumer benched 33 s vs
    # ~3 s at sf0.1.  At cluster scale this is the stage boundary a real
    # pipeline writes to storage anyway.
    # materialize the spread layout BEFORE filtering: Catalyst pushes the
    # filter below a repartition exchange, so without the barrier the
    # (shingle-heavy) predicate runs on the single-partition file scan —
    # 12 s single-task vs sub-second 32-way at sf0.1
    spread = _spread(docs).transform(stage_barrier)
    quality = spread.filter(T.gopher_keep(F.col(text_col))).transform(stage_barrier)
    keep_ids = dedup_filter(quality, text_col, id_col, near_threshold=near_threshold)
    kept = docs.join(
        keep_ids.select(F.col("id").alias(id_col)), id_col, "left_semi"
    )

    def stage(name: str, frame: DataFrame) -> DataFrame:
        return frame.agg(
            F.lit(name).alias("stage"), F.count("*").cast("long").alias("n_docs")
        )

    census = (
        stage("input", docs)
        .unionByName(stage("quality", quality))
        .unionByName(stage("dedup", kept))
    )
    return kept, census


def curation_census_sql(
    table: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_threshold: float = 0.5,
) -> str:
    """DuckDB replay of the census: the same gate predicate and dedup
    keep-set, nested as subqueries."""
    quality = f"(SELECT * FROM {table} WHERE {T.gopher_keep_sql(text_col)})"
    dedup_keep = dedup_filter_sql(quality, text_col, id_col, near_threshold=near_threshold)
    return f"""
        SELECT 'input' AS stage, CAST(count(*) AS BIGINT) AS n_docs FROM {table}
        UNION ALL
        SELECT 'quality', CAST(count(*) AS BIGINT) FROM {quality}
        UNION ALL
        SELECT 'dedup', CAST(count(*) AS BIGINT) FROM ({dedup_keep})
    """
