"""Real-model smoke tests (r11 verdict #8), env-gated.

This container ships no CoreNLP server, no spaCy/benepar/flair models,
and no network — so every suite in tests/test_corenlp.py /
test_benepar.py / test_contrib.py exercises the (genuinely tested)
seams against mocks and the parsers fall back to ``StubParser``.  The
moment the environment gains models, set ``ARCHITXT_REAL_MODELS=1`` and
these tests auto-upgrade the coverage to GENUINE parses end-to-end; in
this container they are SKIPPED, never failed.

    ARCHITXT_REAL_MODELS=1 CORENLP_URL=http://localhost:9000 \
        python -m pytest tests/test_real_models.py -v
"""

import os

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("ARCHITXT_REAL_MODELS") != "1",
    reason="real-model smoke: set ARCHITXT_REAL_MODELS=1 in an environment "
    "with a CoreNLP server / spaCy+benepar models installed",
)


def _corenlp_reachable(url: str) -> bool:
    import urllib.request

    try:
        urllib.request.urlopen(url + "/ping", timeout=5)
        return True
    except Exception:
        try:  # older servers have no /ping — any HTTP response counts
            urllib.request.urlopen(url, timeout=5)
            return True
        except Exception:
            return False


def test_corenlp_real_parse():
    url = os.environ.get("CORENLP_URL", "http://localhost:9000")
    if not _corenlp_reachable(url):
        pytest.skip(f"no CoreNLP server at {url}")
    from architxt_spark.nlp.parser import CoreNLPParser
    from architxt_spark.trees import format_tree

    parser = CoreNLPParser(url, fallback_to_stub=False)
    trees = parser.parse_batch(["the quick brown fox jumps over the lazy dog"])
    assert len(trees) == 1
    s = format_tree(trees[0])
    # a genuine constituency parse: real phrase labels, all tokens present
    assert "(NP" in s and "(VP" in s
    for tok in ("quick", "fox", "jumps", "lazy", "dog"):
        assert tok in s
    assert parser._stub is None  # never degraded to the stub


def test_benepar_real_parse():
    pytest.importorskip("spacy")
    pytest.importorskip("benepar")
    from architxt_spark.nlp.parser import BeneparParser
    from architxt_spark.trees import format_tree

    parser = BeneparParser(fallback_to_stub=False)
    trees = parser.parse_batch(["the cat sat on the mat"])
    assert len(trees) == 1
    s = format_tree(trees[0])
    assert "(NP" in s and "cat" in s and "mat" in s
    assert parser._stub is None


def test_spacy_real_ner_extractor(spark):
    spacy = pytest.importorskip("spacy")
    try:
        spacy.load("en_core_web_sm")
    except OSError:
        pytest.skip("en_core_web_sm model not downloaded")
    from architxt_spark.nlp.contrib import SpacyEntityExtractor

    sentences = spark.createDataFrame(
        [("d1", 0, "Barack Obama visited Paris in 2015.")],
        "doc_id string, sent_idx int, sentence string",
    )
    ents = SpacyEntityExtractor(model_name="en_core_web_sm").extract(sentences).collect()
    assert ents and any(r["name"] in ("PERSON", "GPE", "DATE") for r in ents)
