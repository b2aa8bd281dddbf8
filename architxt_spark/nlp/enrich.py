"""Plug-in NER and entity-resolution boundaries.

Reference parity: ``EntityExtractor.enrich`` adds entities to annotated
sentences via a pluggable NER model (``architxt/nlp/entity_extractor.py:
16-47``, spaCy/flair contribs) and ``EntityResolver.batch_sentences``
normalizes entity values against a knowledge base (``architxt/nlp/
entity_resolver.py:19-60``, SciSpaCy contribs).  Neither model family is
in this container, so the REAL implementations here are deterministic
(regex / gazetteer / dictionary) — but they run behind the same
DataFrame-in → DataFrame-out boundary a model-backed implementation would
use (Arrow-batched ``mapInPandas`` for the extractor, broadcast map for
the resolver), so swapping in Spark NLP / spaCy is a drop-in.

Frame contracts (matching :mod:`architxt_spark.nlp.sentences`):

- extractor input: ``(doc_id, sent_idx, sentence, …)``;
- extractor/resolver entity frame: ``(doc_id, sent_idx, ent_id, name,
  start, end, value)`` with sentence-local char offsets.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod
from typing import Iterator, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ENTITY_SCHEMA = (
    "doc_id string, sent_idx int, ent_id string, name string, "
    "start int, end int, value string"
)


class EntityExtractor(ABC):
    """NER boundary: sentences in, entity spans out."""

    @abstractmethod
    def extract(self, sentences: DataFrame) -> DataFrame:
        """``(doc_id, sent_idx, sentence)`` → the entity frame."""


class RegexExtractor(EntityExtractor):
    """Deterministic NER from label → regex patterns, executed per
    partition in Arrow batches (the same physical shape a model-backed
    extractor uses — the regexes stand where the model forward pass
    would).  Entity ids are position-derived, so re-extraction is
    idempotent."""

    def __init__(self, patterns: Mapping[str, str]) -> None:
        self.patterns = dict(patterns)

    @classmethod
    def from_gazetteer(cls, terms: Mapping[str, list[str]]) -> "RegexExtractor":
        """Gazetteer form: label → term list, longest-first alternation
        with word boundaries."""
        return cls(
            {
                label: r"\b(?:" + "|".join(
                    re.escape(t) for t in sorted(ts, key=len, reverse=True)
                ) + r")\b"
                for label, ts in terms.items()
            }
        )

    def extract(self, sentences: DataFrame) -> DataFrame:
        import pandas as pd

        patterns = [(label, re.compile(rx)) for label, rx in sorted(self.patterns.items())]
        src = sentences.select("doc_id", "sent_idx", "sentence")

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = ["doc_id", "sent_idx", "ent_id", "name", "start", "end", "value"]
            for pdf in batches:
                rows = []
                for doc_id, sent_idx, sentence in zip(
                    pdf["doc_id"], pdf["sent_idx"], pdf["sentence"]
                ):
                    if sentence is None:
                        continue
                    for label, rx in patterns:
                        for m in rx.finditer(sentence):
                            rows.append(
                                dict(
                                    doc_id=doc_id,
                                    sent_idx=int(sent_idx),
                                    ent_id=f"{label}:{sent_idx}:{m.start()}",
                                    name=label,
                                    start=m.start(),
                                    end=m.end(),
                                    value=m.group(0),
                                )
                            )
                yield pd.DataFrame(rows, columns=cols)

        return src.mapInPandas(run, ENTITY_SCHEMA)


class EntityResolver(ABC):
    """KB-linking boundary: entity frame in, entity frame with normalized
    ``value`` (and optionally ``name``) out."""

    @abstractmethod
    def resolve(self, sent_entities: DataFrame) -> DataFrame: ...


class DictResolver(EntityResolver):
    """Dictionary normalization: case-insensitive surface form →
    canonical value, as a broadcast map lookup (pure column ops — the
    KB candidate-generator equivalent).  Unknown surfaces pass through."""

    def __init__(self, canonical: Mapping[str, str]) -> None:
        self.canonical = {k.lower(): v for k, v in canonical.items()}

    def resolve(self, sent_entities: DataFrame) -> DataFrame:
        if not self.canonical:
            return sent_entities
        m = F.create_map(
            *[F.lit(x) for kv in sorted(self.canonical.items()) for x in kv]
        )
        return sent_entities.withColumn(
            "value", F.coalesce(m[F.lower(F.col("value"))], F.col("value"))
        )
