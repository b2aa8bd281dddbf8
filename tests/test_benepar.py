"""BeneparParser (reference ``parser/benepar.py:49-87``): spaCy+benepar
behind the Parser protocol.  The real packages are absent from this
container, so a fake spaCy-like pipeline injected via ``model_loader``
exercises the batch path, and the no-deps path must degrade to the stub."""

import pytest

from architxt_spark.nlp.parser import (
    BeneparParser,
    _BENEPAR_MODELS,
    benepar_factory,
)


class _FakeSpan:
    def __init__(self, parse_string):
        class _U:  # spaCy's ``span._`` extension namespace
            pass

        self._ = _U()
        self._.parse_string = parse_string


class _FakeDoc:
    def __init__(self, text):
        toks = text.split()
        bracket = "(S (NP (NN %s)) (VP %s))" % (
            toks[0] if toks else "x",
            " ".join(f"(TOK {t})" for t in toks[1:]) or "(TOK y)",
        )
        self.sents = [_FakeSpan(bracket)]


class _FakePipeline:
    """Duck-typed ``spacy.Language``: records batch boundaries."""

    def __init__(self):
        self.pipe_calls = []

    def pipe(self, texts, batch_size=128):
        texts = list(texts)
        self.pipe_calls.append((len(texts), batch_size))
        for t in texts:
            yield _FakeDoc(t)


@pytest.fixture(autouse=True)
def _clear_model_cache():
    _BENEPAR_MODELS.clear()
    yield
    _BENEPAR_MODELS.clear()


def test_parse_batch_relabels_sent_and_batches():
    fake = _FakePipeline()
    p = BeneparParser(model_loader=lambda lang: fake, batch_size=32)
    trees = p.parse_batch(["Alice likes apples", "Bob hates rain"])
    assert [t.label for t in trees] == ["SENT", "SENT"]
    assert trees[0].leaves() == ["Alice", "likes", "apples"]
    # one pipe() call for the whole batch, batch_size forwarded
    assert fake.pipe_calls == [(2, 32)]


def test_model_loaded_once_per_process():
    loads = []

    def loader(lang):
        loads.append(lang)
        return _FakePipeline()

    p = BeneparParser(model_loader=loader, language="French")
    p.parse_batch(["un deux"])
    p.parse_batch(["trois quatre"])
    q = BeneparParser(model_loader=loader, language="French")
    q.parse_batch(["cinq six"])
    assert loads == ["French"]  # process-level cache, not per-parser


def test_missing_packages_fall_back_to_stub():
    p = BeneparParser()  # no spacy/benepar in this container
    trees = p.parse_batch(["hello world"])
    assert trees[0].label == "SENT"
    assert trees[0].leaves() == ["hello", "world"]


def test_missing_packages_raise_when_fallback_disabled():
    p = BeneparParser(fallback_to_stub=False)
    with pytest.raises(ImportError):
        p.parse("hello")


def test_parse_sentences_df_with_benepar_loader(spark):
    """End-to-end mapInPandas with the factory — local mode shares the
    process, so the injected fake pipeline is visible to executors."""
    from architxt_spark.nlp.parser import parse_sentences_df

    sents = spark.createDataFrame(
        [("d1", 0, "Alice likes apples"), ("d1", 1, "Bob hates rain")],
        "doc_id string, sent_idx int, sentence string",
    )

    # defined inside the test so cloudpickle ships them by value to workers
    def loader(lang):
        class Span:
            def __init__(self, ps):
                self._ = type("U", (), {})()
                self._.parse_string = ps

        class Doc:
            def __init__(self, text):
                toks = text.split()
                bracket = "(S (NP (NN %s)) (VP %s))" % (
                    toks[0],
                    " ".join(f"(TOK {t})" for t in toks[1:]),
                )
                self.sents = [Span(bracket)]

        class Pipeline:
            def pipe(self, texts, batch_size=128):
                return (Doc(t) for t in texts)

        return Pipeline()

    factory = benepar_factory(model_loader=loader)
    nodes = parse_sentences_df(sents, parser_factory=factory)
    names = {r["node_name"] for r in nodes.collect() if r["node_name"]}
    assert "NN" in names and "NP" in names and "UNDEF_d1.0" in names
    assert nodes.select("tree_id").distinct().count() == 2
