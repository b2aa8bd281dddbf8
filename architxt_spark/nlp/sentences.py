"""Sentence splitting + per-sentence entity/relation re-basing
(``architxt/nlp/utils.py:16-150``) as DataFrame transforms.

BRAT corpora are one sentence per line (``utils.py:16-29``), so sentence
splitting is ``split('\\n') + posexplode`` with cumulative char offsets
(a window over the sentence index — the reference's two-pointer sweep
becomes an offset-range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_sentences(df: DataFrame, text_col: str = "txt") -> DataFrame:
    """(doc_id, sent_idx, sentence, sent_start, sent_end): newline split
    with absolute char offsets.  ``sent_start`` accumulates previous
    sentence lengths + 1 newline each (``split_entities``' offset model,
    ``utils.py:32-99``)."""
    sents = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("sent_idx", "sentence"),
    )
    w = Window.partitionBy("doc_id").orderBy("sent_idx")
    return (
        sents.withColumn(
            "sent_start",
            F.coalesce(
                F.sum(F.length("sentence") + 1).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("int"),
        )
        .withColumn("sent_end", (F.col("sent_start") + F.length("sentence")).cast("int"))
        .filter(F.trim("sentence") != "")
    )


def split_entities(sentences: DataFrame, entities: DataFrame) -> DataFrame:
    """Assign each entity to the sentence containing its span and re-base
    offsets to sentence-local (``utils.py:32-99``).  Range join on
    (doc_id, span ⊆ sentence window); entities crossing a sentence
    boundary are dropped, like the reference's sweep."""
    e = entities.select(
        F.col("doc_id").alias("e_doc"), "ent_id", "name", "start", "end", "value"
    )
    cond = (
        (sentences.doc_id == e.e_doc)
        & (e.start >= sentences.sent_start)
        & (e.end <= sentences.sent_end)
    )
    return sentences.join(e, cond, "inner").select(
        "doc_id",
        "sent_idx",
        "ent_id",
        "name",
        (F.col("start") - F.col("sent_start")).alias("start"),
        (F.col("end") - F.col("sent_start")).alias("end"),
        "value",
    )


def split_relations(sent_entities: DataFrame, relations: DataFrame) -> DataFrame:
    """Keep relations whose BOTH endpoints landed in the same sentence
    (``utils.py:102-150``): two joins on entity id → sentence idx."""
    src = sent_entities.select(
        F.col("doc_id").alias("s_doc"),
        F.col("ent_id").alias("s_ent"),
        F.col("sent_idx").alias("src_sent"),
    )
    dst = sent_entities.select(
        F.col("doc_id").alias("d_doc"),
        F.col("ent_id").alias("d_ent"),
        F.col("sent_idx").alias("dst_sent"),
    )
    return (
        relations.join(src, (relations.doc_id == src.s_doc) & (relations.src == src.s_ent), "inner")
        .join(dst, (relations.doc_id == dst.d_doc) & (relations.dst == dst.d_ent), "inner")
        .filter(F.col("src_sent") == F.col("dst_sent"))
        .select("doc_id", F.col("src_sent").alias("sent_idx"), "rel_id", "name", "src", "dst")
    )
