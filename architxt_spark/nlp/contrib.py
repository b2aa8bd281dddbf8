"""Model-backed NER / KB-linking contribs behind the
:class:`~architxt_spark.nlp.enrich.EntityExtractor` /
:class:`~architxt_spark.nlp.enrich.EntityResolver` boundaries.

Reference parity: ``SpacyEntityExtractor`` (``nlp/contrib/spacy.py:21-58``),
``FlairEntityExtractor`` (``nlp/contrib/flair.py:24-66``) and
``ScispacyResolver`` (``nlp/contrib/scispacy.py:26-120``).  The reference
streams sentences through an async pipe on one machine; here each is the
same Arrow-batched ``mapInPandas`` pass the deterministic
``RegexExtractor`` uses, so the model forward pass runs executor-side over
whole batches and the model loads once per executor process (see
``_MODEL_CACHE`` — the broadcast-by-name pattern, like
:class:`~architxt_spark.nlp.parser.BeneparParser`).

None of spaCy / flair / scispacy ship in this container, so every contrib
is import-gated: construction raises ``ImportError`` with install guidance
unless a ``model_loader`` (tests, alternative runtimes) injects the
pipeline object.
"""

from __future__ import annotations

import unicodedata
from typing import Iterator

from pyspark.sql import DataFrame

from architxt_spark.nlp.enrich import ENTITY_SCHEMA, EntityExtractor, EntityResolver

#: label -> loaded model, one per executor process: workers pay the model
#: load once and ship only the model *name* in the task closure.
_MODEL_CACHE: dict = {}

#: spaCy components NER does not need (``nlp/contrib/spacy.py:19``).
SPACY_NER_DISABLED = ("parser", "senter", "sentencizer", "textcat", "lemmatizer", "tagger")


def _cached(key, loader):
    if key not in _MODEL_CACHE:
        _MODEL_CACHE[key] = loader()
    return _MODEL_CACHE[key]


class SpacyEntityExtractor(EntityExtractor):
    """spaCy NER (``nlp/contrib/spacy.py:21-58``): ``nlp.pipe`` over each
    Arrow batch, one entity row per ``doc.ents`` span with the reference's
    ``{label}_{start}_{end}`` id scheme."""

    def __init__(self, model_name: str = "en_core_web_sm", *, batch_size: int = 128, model_loader=None) -> None:
        self.model_name = model_name
        self.batch_size = batch_size
        self.model_loader = model_loader
        if model_loader is None:
            try:
                import spacy  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "SpacyEntityExtractor requires the spacy package (not in this container)"
                ) from e

    def _load(self):
        if self.model_loader is not None:
            return _cached(("spacy", self.model_name, id(self.model_loader)), lambda: self.model_loader(self.model_name))

        def load():
            import spacy

            return spacy.load(self.model_name, disable=list(SPACY_NER_DISABLED))

        return _cached(("spacy", self.model_name), load)

    def extract(self, sentences: DataFrame) -> DataFrame:
        import pandas as pd

        src = sentences.select("doc_id", "sent_idx", "sentence")
        model_name, batch_size, loader = self.model_name, self.batch_size, self.model_loader

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            nlp = SpacyEntityExtractor(model_name, batch_size=batch_size, model_loader=loader)._load()
            cols = ["doc_id", "sent_idx", "ent_id", "name", "start", "end", "value"]
            for pdf in batches:
                texts = [s if s is not None else "" for s in pdf["sentence"]]
                rows = []
                for doc_id, sent_idx, doc in zip(
                    pdf["doc_id"], pdf["sent_idx"], nlp.pipe(texts, batch_size=batch_size)
                ):
                    for ent in doc.ents:
                        rows.append(
                            dict(
                                doc_id=doc_id,
                                sent_idx=int(sent_idx),
                                # reference id scheme (contrib/spacy.py:33)
                                ent_id=f"{ent.label_}_{ent.start_char}_{ent.end_char}",
                                name=ent.label_,
                                start=int(ent.start_char),
                                end=int(ent.end_char),
                                value=ent.text,
                            )
                        )
                yield pd.DataFrame(rows, columns=cols)

        return src.mapInPandas(run, ENTITY_SCHEMA)


class FlairEntityExtractor(EntityExtractor):
    """flair ``SequenceTagger`` NER (``nlp/contrib/flair.py:24-66``): one
    batched ``tagger.predict`` per Arrow batch, spans read back with the
    reference's ``{tag}_{start}_{end}`` id scheme."""

    def __init__(self, model_name: str = "ner", *, model_loader=None) -> None:
        self.model_name = model_name
        self.model_loader = model_loader
        if model_loader is None:
            try:
                import flair  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "FlairEntityExtractor requires the flair package (not in this container)"
                ) from e

    def _load(self):
        if self.model_loader is not None:
            return _cached(("flair", self.model_name, id(self.model_loader)), lambda: self.model_loader(self.model_name))

        def load():
            from flair.models import SequenceTagger

            return SequenceTagger.load(self.model_name)

        return _cached(("flair", self.model_name), load)

    def extract(self, sentences: DataFrame) -> DataFrame:
        import pandas as pd

        src = sentences.select("doc_id", "sent_idx", "sentence")
        model_name, loader = self.model_name, self.model_loader

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            tagger = FlairEntityExtractor(model_name, model_loader=loader)._load()
            from_flair = loader is None
            cols = ["doc_id", "sent_idx", "ent_id", "name", "start", "end", "value"]
            for pdf in batches:
                if from_flair:
                    from flair.data import Sentence

                    sents = [Sentence(s or " ") for s in pdf["sentence"]]
                else:  # injected pipelines bring their own sentence type
                    sents = [tagger.make_sentence(s or " ") for s in pdf["sentence"]]
                tagger.predict(sents)  # ONE batched forward pass per Arrow batch
                rows = []
                for doc_id, sent_idx, sent in zip(pdf["doc_id"], pdf["sent_idx"], sents):
                    for span in sent.get_spans("ner"):
                        rows.append(
                            dict(
                                doc_id=doc_id,
                                sent_idx=int(sent_idx),
                                ent_id=f"{span.tag}_{span.start_position}_{span.end_position}",
                                name=span.tag,
                                start=int(span.start_position),
                                end=int(span.end_position),
                                value=span.text,
                            )
                        )
                yield pd.DataFrame(rows, columns=cols)

        return src.mapInPandas(run, ENTITY_SCHEMA)


def _cleanup_text(text: str) -> str:
    """ASCII-fold + lowercase + collapse whitespace — the reference's
    ``unidecode``-based uniformization (``contrib/scispacy.py:89-96``)
    with stdlib ``unicodedata`` standing in for unidecode."""
    folded = unicodedata.normalize("NFKD", text).encode("ascii", "ignore").decode("ascii")
    return " ".join(folded.lower().split())


class ScispacyResolver(EntityResolver):
    """SciSpaCy KB linker (``nlp/contrib/scispacy.py:26-120``): candidate
    generation against a named KB (umls/mesh/rxnorm/go/hpo), the best
    candidate above ``threshold`` replacing the entity value — canonical
    NAME when ``resolve_text`` else concept id.  Runs as one Arrow-batched
    pass over the entity frame; the generator loads once per executor.

    The reference's optional pre-linking TRANSLATION step
    (``scispacy.py:55-83``: entity text → English before candidate
    generation, via Google Translate) is a network service, so it is a
    pluggable seam here: pass ``translate=True`` plus a picklable
    ``translator`` callable ``list[str] -> list[str]`` (a production
    deployment injects its translation-service client; tests inject a
    fake).  Translation runs once per Arrow batch, before linking, like
    the reference's per-entity await but batched.  ``cleanup`` is
    honoured with a stdlib ASCII fold.
    """

    def __init__(
        self,
        *,
        kb_name: str = "umls",
        cleanup: bool = False,
        threshold: float = 0.7,
        resolve_text: bool = True,
        generator_loader=None,
        translate: bool = False,
        translator=None,
    ) -> None:
        self.kb_name = kb_name
        self.cleanup = cleanup
        self.threshold = threshold
        self.resolve_text = resolve_text
        self.generator_loader = generator_loader
        self.translate = translate
        self.translator = translator
        if translate and translator is None:
            raise ValueError(
                "translate=True needs a translator callable (list[str] -> list[str]); "
                "the reference's googletrans client is a network service not present here"
            )
        if generator_loader is None:
            try:
                import scispacy  # noqa: F401
            except ImportError as e:
                raise ImportError(
                    "ScispacyResolver requires the scispacy package (not in this container)"
                ) from e

    def _load(self):
        if self.generator_loader is not None:
            return _cached(
                ("scispacy", self.kb_name, id(self.generator_loader)),
                lambda: self.generator_loader(self.kb_name),
            )

        def load():
            from scispacy.candidate_generation import CandidateGenerator

            return CandidateGenerator(name=self.kb_name)

        return _cached(("scispacy", self.kb_name), load)

    def resolve(self, sent_entities: DataFrame) -> DataFrame:
        import pandas as pd

        cfg = dict(
            kb_name=self.kb_name,
            cleanup=self.cleanup,
            threshold=self.threshold,
            resolve_text=self.resolve_text,
            generator_loader=self.generator_loader,
            translate=self.translate,
            translator=self.translator,
        )
        cols = sent_entities.columns
        schema = sent_entities.schema

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            resolver = ScispacyResolver(**cfg)
            gen = resolver._load()
            for pdf in batches:
                values = ["" if v is None else str(v) for v in pdf["value"]]
                if resolver.translate:
                    # ONE translation call per Arrow batch, before linking
                    values = list(resolver.translator(values))
                # ONE candidate-generation call per Arrow batch
                candidates = gen(values, 1)
                out = []
                for v, cands in zip(values, candidates):
                    best, score = None, resolver.threshold
                    for c in cands:
                        s = max(c.similarities) if c.similarities else 0.0
                        if s >= score:
                            best, score = c, s
                    if best is None:
                        resolved = v
                    elif resolver.resolve_text:
                        kb_ent = gen.kb.cui_to_entity.get(best.concept_id)
                        resolved = kb_ent.canonical_name if kb_ent is not None else best.concept_id
                    else:
                        resolved = best.concept_id
                    out.append(_cleanup_text(resolved) if resolver.cleanup else resolved)
                pdf = pdf.copy()
                pdf["value"] = out
                yield pdf[cols]

        return sent_entities.mapInPandas(run, schema)
