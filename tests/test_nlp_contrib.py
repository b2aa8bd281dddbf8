"""Model-backed NER / KB-linker contribs (reference ``nlp/contrib/*.py``)
driven through injected fake pipelines — the real packages are absent, so
the import gates must raise and the injected path must exercise the full
Arrow-batched frame contract."""

import pytest

from architxt_spark.nlp.contrib import (
    FlairEntityExtractor,
    ScispacyResolver,
    SpacyEntityExtractor,
    _MODEL_CACHE,
    _cleanup_text,
)


@pytest.fixture(autouse=True)
def _clear_cache():
    _MODEL_CACHE.clear()
    yield
    _MODEL_CACHE.clear()


def _sentences(spark):
    return spark.createDataFrame(
        [("d1", 0, "Alice visited Paris"), ("d1", 1, "Bob likes Berlin")],
        "doc_id string, sent_idx int, sentence string",
    )


def test_import_gates_raise_without_packages():
    with pytest.raises(ImportError, match="spacy"):
        SpacyEntityExtractor()
    with pytest.raises(ImportError, match="flair"):
        FlairEntityExtractor()
    with pytest.raises(ImportError, match="scispacy"):
        ScispacyResolver()


def test_spacy_extractor_with_fake_pipeline(spark):
    def loader(model_name):
        assert model_name == "en_core_web_sm"

        class Ent:
            def __init__(self, label, start, end, text):
                self.label_, self.start_char, self.end_char, self.text = label, start, end, text

        class Doc:
            def __init__(self, text):
                self.ents = [
                    Ent("GPE", text.index(w), text.index(w) + len(w), w)
                    for w in ("Paris", "Berlin")
                    if w in text
                ]

        class Nlp:
            def pipe(self, texts, batch_size=128):
                return (Doc(t) for t in texts)

        return Nlp()

    ext = SpacyEntityExtractor(model_loader=loader)
    rows = ext.extract(_sentences(spark)).collect()
    by_sent = {(r["doc_id"], r["sent_idx"]): r for r in rows}
    assert len(rows) == 2
    r = by_sent[("d1", 0)]
    assert (r["name"], r["value"]) == ("GPE", "Paris")
    assert r["ent_id"] == f"GPE_{r['start']}_{r['end']}"
    assert "Alice visited Paris"[r["start"] : r["end"]] == "Paris"


def test_flair_extractor_with_fake_tagger(spark):
    def loader(model_name):
        class Span:
            def __init__(self, tag, start, end, text):
                self.tag, self.start_position, self.end_position, self.text = tag, start, end, text

        class Sent:
            def __init__(self, text):
                self.text = text
                self.spans = []

            def get_spans(self, kind):
                return self.spans

        class Tagger:
            def make_sentence(self, text):
                return Sent(text)

            def predict(self, sents):
                # batched forward pass: one call per Arrow batch
                for s in sents:
                    for w in ("Alice", "Bob"):
                        if w in s.text:
                            i = s.text.index(w)
                            s.spans.append(Span("PER", i, i + len(w), w))

        return Tagger()

    ext = FlairEntityExtractor(model_loader=loader)
    rows = ext.extract(_sentences(spark)).collect()
    assert {(r["sent_idx"], r["name"], r["value"]) for r in rows} == {
        (0, "PER", "Alice"),
        (1, "PER", "Bob"),
    }


def test_scispacy_resolver_with_fake_generator(spark):
    def loader(kb_name):
        assert kb_name == "umls"

        class Cand:
            def __init__(self, cid, sim):
                self.concept_id, self.similarities = cid, [sim]

        class KBEnt:
            def __init__(self, name):
                self.canonical_name = name

        class KB:
            cui_to_entity = {"C001": KBEnt("Paracetamol")}

        class Gen:
            kb = KB()

            def __call__(self, values, k):
                return [
                    [Cand("C001", 0.9)] if "acetamin" in v.lower() else [Cand("C002", 0.3)]
                    for v in values
                ]

        return Gen()

    ents = spark.createDataFrame(
        [
            ("d1", 0, "e1", "DRUG", 0, 13, "Acetaminophen"),
            ("d1", 0, "e2", "DRUG", 20, 25, "water"),
        ],
        "doc_id string, sent_idx int, ent_id string, name string, start int, end int, value string",
    )
    res = ScispacyResolver(generator_loader=loader, threshold=0.7)
    out = {r["ent_id"]: r["value"] for r in res.resolve(ents).collect()}
    assert out == {"e1": "Paracetamol", "e2": "water"}  # below threshold passes through

    # concept-id mode + cleanup fold
    res2 = ScispacyResolver(generator_loader=loader, threshold=0.7, resolve_text=False, cleanup=True)
    out2 = {r["ent_id"]: r["value"] for r in res2.resolve(ents).collect()}
    assert out2["e1"] == "c001"


def test_cleanup_text_folds_ascii():
    assert _cleanup_text("Café  au   LAIT") == "cafe au lait"


def test_scispacy_resolver_translation_seam(spark):
    """The reference's pre-linking translation step (scispacy.py:55-83) as
    an injected batch translator: non-English entity text is translated
    before candidate generation, so the linker matches."""

    def _fake_translate(values):
        table = {"Acétaminophène": "Acetaminophen", "eau": "water"}
        return [table.get(v, v) for v in values]

    def loader(kb_name):
        class Cand:
            def __init__(self, cid, sim):
                self.concept_id, self.similarities = cid, [sim]

        class KBEnt:
            def __init__(self, name):
                self.canonical_name = name

        class KB:
            cui_to_entity = {"C001": KBEnt("Paracetamol")}

        class Gen:
            kb = KB()

            def __call__(self, values, k):
                return [
                    [Cand("C001", 0.9)] if "acetamin" in v.lower() else [Cand("C002", 0.3)]
                    for v in values
                ]

        return Gen()

    ents = spark.createDataFrame(
        [("d1", 0, "e1", "DRUG", 0, 14, "Acétaminophène")],
        "doc_id string, sent_idx int, ent_id string, name string, start int, end int, value string",
    )
    res = ScispacyResolver(
        generator_loader=loader, translate=True, translator=_fake_translate
    )
    out = {r["ent_id"]: r["value"] for r in res.resolve(ents).collect()}
    assert out == {"e1": "Paracetamol"}

    # untranslated, the French value misses the linker and passes through
    res_plain = ScispacyResolver(generator_loader=loader)
    out_plain = {r["ent_id"]: r["value"] for r in res_plain.resolve(ents).collect()}
    assert out_plain == {"e1": "Acétaminophène"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="translator"):
        ScispacyResolver(generator_loader=loader, translate=True)
