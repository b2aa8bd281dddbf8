"""Constituency-parsing boundary + entity-insertion tree surgery
(``architxt/nlp/parser/__init__.py:141-626``).

Real parsers are a process/network boundary in the reference (CoreNLP
HTTP at ``parser/corenlp.py:19-45``, spaCy+benepar at
``parser/benepar.py:49-87``); neither is available in this container, so
:class:`StubParser` produces a deterministic flat bracket ``(SENT tok …)``
behind the SAME ``mapInPandas`` plumbing a real parser plugs into
(partition-level batching, one tree per sentence).  The tree surgery —
token alignment, longest-first entity insertion, duplicate-span skipping,
nested-entity unnesting, UNDEF relabeling — is real and runs identically
under a real parser.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.model import NODE_SCHEMA
from architxt_spark.trees import PyTree, tree_to_rows


class StubParser:
    """Flat-bracket 'parse': (SENT tok tok …).  Deterministic stand-in for
    the CoreNLP/benepar boundary (real parsers gated on availability)."""

    def parse(self, sentence: str) -> PyTree:
        return PyTree("SENT", [t for t in sentence.split() if t])

    def parse_batch(self, sentences: list[str]) -> list[PyTree]:
        return [self.parse(s) for s in sentences]


class CoreNLPParser:
    """Stanford CoreNLP HTTP client (``parser/corenlp.py:19-45``), stdlib
    urllib only — no heavyweight NLP dependency.

    The reference wraps nltk's ``CoreNLPParser``; the wire protocol is the
    public CoreNLP server API: POST raw UTF-8 text to
    ``{url}/?properties={json}`` with ``annotators=tokenize,ssplit,pos,
    parse`` and ``outputFormat=json``; the response carries one
    ``sentences[i].parse`` bracket string per input sentence.  Sentences
    are newline-joined per batch with ``ssplit.eolonly`` so ONE request
    parses ``batch_size`` sentences (the reference batches the same way
    through ``raw_parse_sents``); like the reference we keep the first
    candidate parse and unwrap the ``(ROOT …)`` wrapper.

    Executor usage: construct per partition (see :func:`corenlp_factory`);
    requests retry ``retries`` times with backoff, and if the server is
    unreachable the parser degrades to :class:`StubParser` output for the
    remainder of the partition instead of failing the job (env-gated
    boundary — no CoreNLP server ships in this container)."""

    def __init__(
        self,
        url: str,
        *,
        language: str = "en",
        batch_size: int = 128,
        timeout: float = 60.0,
        retries: int = 2,
        fallback_to_stub: bool = True,
    ) -> None:
        self.url = url.rstrip("/")
        self.language = language
        self.batch_size = batch_size
        self.timeout = timeout
        self.retries = retries
        self.fallback_to_stub = fallback_to_stub
        self._stub: StubParser | None = None  # set after an unreachable-server error
        self.requests_made = 0

    # -- wire ---------------------------------------------------------------

    def _request(self, text: str) -> dict:
        import json
        import time
        import urllib.error
        import urllib.parse
        import urllib.request

        props = {
            "annotators": "tokenize,ssplit,pos,parse",
            "outputFormat": "json",
            "ssplit.eolonly": "true",
            "tokenize.language": self.language,
        }
        qs = urllib.parse.urlencode({"properties": json.dumps(props)})
        req = urllib.request.Request(
            f"{self.url}/?{qs}",
            data=text.encode("utf-8"),
            headers={"Content-Type": "text/plain; charset=utf-8"},
            method="POST",
        )
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                self.requests_made += 1
                with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except (urllib.error.URLError, OSError, json.JSONDecodeError) as e:  # noqa: PERF203
                last = e
                if attempt < self.retries:
                    time.sleep(0.2 * (2**attempt))
        raise ConnectionError(f"CoreNLP server at {self.url} unreachable: {last}")

    # -- parsing ------------------------------------------------------------

    def parse_batch(self, sentences: list[str]) -> list[PyTree]:
        from architxt_spark.trees import parse_tree

        out: list[PyTree] = []
        for i in range(0, len(sentences), self.batch_size):
            batch = [s.replace("\n", " ") or " " for s in sentences[i : i + self.batch_size]]
            if self._stub is not None:
                out.extend(self._stub.parse_batch(batch))
                continue
            try:
                payload = self._request("\n".join(batch))
            except ConnectionError:
                if not self.fallback_to_stub:
                    raise
                self._stub = StubParser()
                out.extend(self._stub.parse_batch(batch))
                continue
            parses = [s.get("parse", "") for s in payload.get("sentences", [])]
            for sent, bracket in zip(batch, parses):
                if not bracket:
                    out.append(StubParser().parse(sent))
                    continue
                tree = parse_tree(" ".join(bracket.split()))
                # unwrap (ROOT (S …)) like the reference's ``next(tree)[0]``
                if tree.node_name == "ROOT" and tree.children and isinstance(tree.children[0], PyTree):
                    tree = tree.children[0]
                out.append(tree)
        return out

    def parse(self, sentence: str) -> PyTree:
        return self.parse_batch([sentence])[0]


def corenlp_factory(url: str, **kwargs):
    """Picklable parser factory for :func:`parse_sentences_df`:
    ``parse_sentences_df(sents, parser_factory=corenlp_factory(url))``
    constructs one HTTP client per partition batch iterator."""
    import functools

    return functools.partial(CoreNLPParser, url, **kwargs)


#: Public benepar model names per language (``parser/benepar.py:22-34``).
DEFAULT_BENEPAR_MODELS = {
    "English": "benepar_en3",
    "Chinese": "benepar_zh2",
    "Arabic": "benepar_ar2",
    "German": "benepar_de2",
    "Basque": "benepar_eu2",
    "French": "benepar_fr2",
    "Hebrew": "benepar_he2",
    "Hungarian": "benepar_hu2",
    "Korean": "benepar_ko2",
    "Polish": "benepar_pl2",
    "Swedish": "benepar_sv2",
}

#: spaCy components the parse does not need (``parser/benepar.py:36``).
SPACY_DISABLED_PIPELINES = ("parser", "senter", "sentencizer", "ner", "textcat", "lemmatizer", "tagger")

#: One loaded pipeline per (executor process × language) — the Spark
#: analogue of broadcasting the model: a worker pays the spaCy/benepar
#: load once and every partition it runs reuses it.  (An actual
#: ``sc.broadcast`` would pickle the whole model into the driver and every
#: task's closure; lazy per-process loading ships only the model *name*.)
_BENEPAR_MODELS: dict = {}


class BeneparParser:
    """spaCy + benepar constituency parser (``parser/benepar.py:49-87``)
    behind the same ``parse_batch`` protocol as :class:`CoreNLPParser` /
    :class:`StubParser`, so it plugs straight into
    :func:`parse_sentences_df` via :func:`benepar_factory`.

    Reference semantics mirrored: one spaCy pipeline per language with the
    non-parse components disabled, a ``force_single_sent`` component so
    each input string is exactly one sentence, benepar appended last,
    ``nlp.pipe(batch_size=…)`` batching, and each parse re-labelled
    ``SENT`` (``:83-87``).

    Env-gated boundary: spaCy/benepar are not installed in this container.
    With ``fallback_to_stub=True`` (default) an unavailable import degrades
    to :class:`StubParser` output; tests inject a fake pipeline through
    ``model_loader`` to exercise the real batch path."""

    def __init__(
        self,
        *,
        spacy_models: dict[str, str] | None = None,
        benepar_models: dict[str, str] | None = None,
        language: str = "English",
        batch_size: int = 128,
        model_loader=None,
        fallback_to_stub: bool = True,
    ) -> None:
        self.spacy_models = spacy_models or {"English": "en_core_web_md"}
        self.benepar_models = benepar_models or dict(DEFAULT_BENEPAR_MODELS)
        self.language = language
        self.batch_size = batch_size
        self.model_loader = model_loader
        self.fallback_to_stub = fallback_to_stub
        self._stub: StubParser | None = None

    def _load_model(self):
        key = (self.language, self.spacy_models.get(self.language), id(self.model_loader))
        if key in _BENEPAR_MODELS:
            return _BENEPAR_MODELS[key]
        if self.model_loader is not None:
            nlp = self.model_loader(self.language)
        else:
            import benepar  # noqa: F401  (registers the spaCy factory)
            import spacy
            from spacy import Language

            if not Language.has_factory("force_single_sent"):

                @Language.component("force_single_sent")
                def _force_single_sent(doc):
                    for t in doc:
                        t.is_sent_start = False
                    if len(doc):
                        doc[0].is_sent_start = True
                    return doc

            nlp = spacy.load(
                self.spacy_models[self.language], disable=list(SPACY_DISABLED_PIPELINES)
            )
            nlp.add_pipe("force_single_sent")
            nlp.add_pipe("benepar", config={"model": self.benepar_models[self.language]}, last=True)
        _BENEPAR_MODELS[key] = nlp
        return nlp

    def parse_batch(self, sentences: list[str]) -> list[PyTree]:
        from architxt_spark.trees import parse_tree

        clean = [s.replace("\n", " ").strip() or " " for s in sentences]
        if self._stub is None:
            try:
                nlp = self._load_model()
            except (ImportError, OSError) as e:
                if not self.fallback_to_stub:
                    raise ImportError(
                        "BeneparParser needs the spacy + benepar packages and their "
                        f"models (none in this container): {e}"
                    ) from e
                self._stub = StubParser()
        if self._stub is not None:
            return self._stub.parse_batch(clean)

        out: list[PyTree] = []
        for doc in nlp.pipe(clean, batch_size=self.batch_size):
            sent = next(iter(doc.sents))
            tree = parse_tree(" ".join(sent._.parse_string.split()))
            tree.label = "SENT"  # reference: ``tree.label = 'SENT'``
            out.append(tree)
        return out

    def parse(self, sentence: str) -> PyTree:
        return self.parse_batch([sentence])[0]


def benepar_factory(**kwargs):
    """Picklable parser factory for :func:`parse_sentences_df`:
    ``parse_sentences_df(sents, parser_factory=benepar_factory(language='English'))``
    builds one :class:`BeneparParser` per partition batch iterator; the
    underlying pipeline is loaded once per executor process."""
    import functools

    return functools.partial(BeneparParser, **kwargs)


def _align_tokens(sentence: str) -> list[tuple[int, int]]:
    """Whitespace-token char spans (``align_tokens`` semantics)."""
    spans = []
    i = 0
    for tok in sentence.split():
        start = sentence.index(tok, i)
        spans.append((start, start + len(tok)))
        i = start + len(tok)
    return spans


def enrich_sentence_tree(
    sentence: str,
    entities: list[tuple[str, int, int]],
    parser: StubParser | None = None,
    *,
    tree: PyTree | None = None,
) -> PyTree:
    """Parse + insert entities (``enrich_tree`` / ``ins_ent``,
    ``parser/__init__.py:179-560``):

    - entities sorted LONGEST-FIRST; exact-duplicate spans skipped
      (``:214-216``);
    - an entity covering tokens [i, j) wraps them under ``(ENT::name …)``;
    - an entity nested fully inside an already-inserted one unnests it into
      ``(REL::nested (ENT::outer …) (ENT::inner …))`` (``unnest_ent``,
      ``:563-599``);
    - tokens already consumed by another entity are DUPLICATED into the
      new one (partial-overlap rule, ``:606-626``).
    """
    if tree is None:
        parser = parser or StubParser()
        tree = parser.parse(sentence)
    spans = _align_tokens(sentence)
    toks = [sentence[s:e] for s, e in spans]

    def covered(start: int, end: int) -> list[int]:
        return [i for i, (s, e) in enumerate(spans) if s < end and e > start]

    inserted: list[tuple[str, tuple[int, ...]]] = []
    consumed: set[int] = set()
    ents = sorted(entities, key=lambda e: (-(e[2] - e[1]), e[1], e[0]))
    seen_spans: set[tuple[int, int]] = set()
    for ent in ents:
        name, start, end = ent[0], ent[1], ent[2]
        # optional 4th element: the RESOLVED value (EntityResolver output);
        # stored as node metadata when it differs from the surface form
        value = ent[3] if len(ent) > 3 else None
        if (start, end) in seen_spans:
            continue
        seen_spans.add((start, end))
        idxs = tuple(covered(start, end))
        if not idxs:
            continue
        meta = (
            {"resolved_value": value}
            if value is not None and value != " ".join(toks[i] for i in idxs)
            else None
        )

        outer = next((n_ts for n_ts in inserted if set(idxs) < set(n_ts[1])), None)
        if outer is not None:
            _unnest(tree, outer[0], name, idxs, toks, meta)
        else:
            _insert_entity(tree, name, idxs, toks, consumed, meta)
            consumed.update(idxs)
        inserted.append((name, idxs))
    return tree


def _insert_entity(
    tree: PyTree,
    name: str,
    idxs: tuple[int, ...],
    toks: list[str],
    consumed: set[int],
    meta: dict[str, str] | None = None,
) -> None:
    """Wrap the idx-th original tokens under (ENT::name …): free tokens are
    removed from the top level; already-consumed tokens are duplicated."""
    free = [i for i in idxs if i not in consumed]
    ent = PyTree(f"ENT::{name}", [toks[i] for i in idxs], meta or {})
    if not free:
        tree.children.append(ent)
        return
    # remove free leaves (top-level str children matching, left to right)
    remaining = [toks[i] for i in free]
    insert_at = None
    out = []
    for c in tree.children:
        if isinstance(c, str) and remaining and c == remaining[0]:
            remaining.pop(0)
            if insert_at is None:
                insert_at = len(out)
            continue
        out.append(c)
    if insert_at is None:
        insert_at = len(out)
    out.insert(insert_at, ent)
    tree.children = out


def _unnest(
    tree: PyTree,
    outer_name: str,
    inner_name: str,
    inner_idxs: tuple[int, ...],
    toks: list[str],
    meta: dict[str, str] | None = None,
) -> None:
    """(ENT::outer …) → (REL::nested (ENT::outer …) (ENT::inner …))."""
    for i, c in enumerate(tree.children):
        if isinstance(c, PyTree) and c.label == f"ENT::{outer_name}":
            inner = PyTree(f"ENT::{inner_name}", [toks[t] for t in inner_idxs], meta or {})
            tree.children[i] = PyTree("REL::nested", [c, inner])
            return


def parse_sentences_df(
    sentences: DataFrame,
    sent_entities: DataFrame | None = None,
    *,
    parser_factory=StubParser,
) -> DataFrame:
    """Distributed parse+enrich: sentences (+ optional per-sentence
    entities) → node rows, one tree per sentence (the ``mapInPandas``
    twin of ``Parser.parse_batch``, ``parser/__init__.py:33-85``).

    The root label becomes ``UNDEF_<tree_id>`` like ``process_tree``
    (``:141-176``) so downstream clustering treats it as unlabelled."""
    import pandas as pd

    if sent_entities is not None:
        val = (
            F.col("value")
            if "value" in sent_entities.columns
            else F.lit(None).cast("string")
        )
        e = sent_entities.groupBy("doc_id", "sent_idx").agg(
            F.collect_list(
                F.struct("name", "start", "end", val.alias("value"))
            ).alias("ents")
        )
        src = sentences.join(e, ["doc_id", "sent_idx"], "left")
    else:
        src = sentences.withColumn(
            "ents",
            F.lit(None).cast(
                "array<struct<name:string,start:int,end:int,value:string>>"
            ),
        )
    src = src.select("doc_id", "sent_idx", "sentence", "ents")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        parser = parser_factory()
        cols = [f.name for f in NODE_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict] = []
            # one parse_batch per Arrow batch: HTTP parsers send ONE
            # request per `batch_size` sentences instead of one per row
            sents = [str(s) for s in pdf["sentence"]]
            trees = (
                parser.parse_batch(sents)
                if hasattr(parser, "parse_batch")
                else [parser.parse(s) for s in sents]
            )
            for doc_id, sent_idx, sentence, ents, ptree in zip(
                pdf["doc_id"], pdf["sent_idx"], sents, pdf["ents"], trees
            ):
                ent_list = (
                    [
                        (e["name"], int(e["start"]), int(e["end"]), e["value"])
                        for e in ents
                    ]
                    if ents is not None and len(ents)
                    else []
                )
                tree = enrich_sentence_tree(sentence, ent_list, tree=ptree)
                tree_id = f"{doc_id}.{sent_idx}"
                tree.label = f"UNDEF_{tree_id}"
                rows.extend(tree_to_rows(tree, tree_id))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, NODE_SCHEMA)


# ---------------------------------------------------------------------------
# coordination fixes (fix_coord / fix_conj / fix_all_coord,
# ``parser/__init__.py:247-407``) — constituency-parser output surgery
# ---------------------------------------------------------------------------


def _is_label(node, label: str) -> bool:
    return isinstance(node, PyTree) and node.label == label


def fix_coord(tree: PyTree) -> bool:
    """One pass of ``(X pre… (COORD (CCONJ …) b…))`` →
    ``(CONJ (X pre…) b…)``: the coordinated phrase is lifted next to a copy
    of its host with the COORD removed.  Returns True if anything changed."""
    changed = False
    for i, child in enumerate(list(tree.children)):
        if not isinstance(child, PyTree):
            continue
        coords = [
            (j, c)
            for j, c in enumerate(child.children)
            if _is_label(c, "COORD")
            and any(_is_label(cc, "CCONJ") for cc in c.children if isinstance(cc, PyTree))
        ]
        if coords:
            j, coord = coords[0]
            conjuncts = [
                c for c in coord.children if isinstance(c, PyTree) and not _is_label(c, "CCONJ")
            ]
            host = PyTree(child.label, [c for k, c in enumerate(child.children) if k != j])
            tree.children[i] = PyTree("CONJ", [host, *conjuncts])
            changed = True
        else:
            changed = fix_coord(child) or changed
    return changed


def fix_conj(tree: PyTree) -> bool:
    """Flatten nested CONJ: ``(CONJ (CONJ a b) c)`` → ``(CONJ a b c)``."""
    changed = False
    for i, child in enumerate(list(tree.children)):
        if not isinstance(child, PyTree):
            continue
        if _is_label(child, "CONJ") and any(_is_label(c, "CONJ") for c in child.children):
            flat: list = []
            for c in child.children:
                if _is_label(c, "CONJ"):
                    flat.extend(c.children)
                else:
                    flat.append(c)
            tree.children[i] = PyTree("CONJ", flat)
            changed = True
        else:
            changed = fix_conj(child) or changed
    return changed


def fix_all_coord(tree: PyTree, max_iterations: int = 100) -> bool:
    """Fixpoint loop over :func:`fix_coord` then :func:`fix_conj`
    (``fix_all_coord``, ``parser/__init__.py:380-407``)."""
    any_change = False
    for _ in range(max_iterations):
        if not fix_coord(tree):
            break
        any_change = True
    for _ in range(max_iterations):
        if not fix_conj(tree):
            break
        any_change = True
    return any_change
