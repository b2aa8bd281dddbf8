"""CoreNLP HTTP client tests against a local mock server (no CoreNLP in
this container — the client's wire protocol, batching, retry, and
stub-fallback behavior are what's under test)."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from architxt_spark.nlp.parser import CoreNLPParser, StubParser, corenlp_factory
from architxt_spark.trees import format_tree


def _parse_payload(sentences):
    return {
        "sentences": [
            {
                "parse": "(ROOT (S "
                + " ".join(f"(NP (NN {tok}))" for tok in s.split())
                + "))"
            }
            for s in sentences
        ]
    }


class _MockCoreNLP(BaseHTTPRequestHandler):
    fail_next = 0
    requests = []

    def do_POST(self):  # noqa: N802
        text = self.rfile.read(int(self.headers["Content-Length"])).decode()
        type(self).requests.append(text)
        if type(self).fail_next > 0:
            type(self).fail_next -= 1
            self.send_response(500)
            self.end_headers()
            return
        body = json.dumps(_parse_payload(text.split("\n"))).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture
def mock_server():
    _MockCoreNLP.requests = []
    _MockCoreNLP.fail_next = 0
    srv = HTTPServer(("127.0.0.1", 0), _MockCoreNLP)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_parse_unwraps_root(mock_server):
    p = CoreNLPParser(mock_server)
    tree = p.parse("Alice likes apples")
    # (ROOT (S …)) unwrapped to the S subtree, reference corenlp.py:45
    assert format_tree(tree) == "(S (NP (NN Alice)) (NP (NN likes)) (NP (NN apples)))"


def test_batching_one_request_per_batch(mock_server):
    p = CoreNLPParser(mock_server, batch_size=3)
    sents = [f"sentence number {i}" for i in range(7)]
    trees = p.parse_batch(sents)
    assert len(trees) == 7
    # 7 sentences at batch_size=3 → 3 requests, newline-joined
    assert len(_MockCoreNLP.requests) == 3
    assert _MockCoreNLP.requests[0].count("\n") == 2


def test_retry_then_success(mock_server):
    _MockCoreNLP.fail_next = 1
    p = CoreNLPParser(mock_server, retries=2)
    tree = p.parse("hello world")
    assert "hello" in format_tree(tree)
    assert len(_MockCoreNLP.requests) == 2  # one failed + one retried


def test_unreachable_falls_back_to_stub():
    p = CoreNLPParser("http://127.0.0.1:9", retries=0, timeout=0.5)
    tree = p.parse("hello world")
    assert format_tree(tree) == "(SENT hello world)"
    assert isinstance(p._stub, StubParser)
    # subsequent calls go straight to the stub, no further requests
    made = p.requests_made
    p.parse("again")
    assert p.requests_made == made


def test_unreachable_raises_when_fallback_disabled():
    p = CoreNLPParser("http://127.0.0.1:9", retries=0, timeout=0.5, fallback_to_stub=False)
    with pytest.raises(ConnectionError):
        p.parse("hello")


def test_parse_sentences_df_with_corenlp(spark, mock_server):
    """End-to-end mapInPandas with the HTTP factory — local mode shares
    the process, so executors reach the mock server."""
    from architxt_spark.nlp.parser import parse_sentences_df

    sents = spark.createDataFrame(
        [("d1", 0, "Alice likes apples"), ("d1", 1, "Bob hates rain")],
        "doc_id string, sent_idx int, sentence string",
    )
    nodes = parse_sentences_df(sents, parser_factory=corenlp_factory(mock_server))
    names = {r["node_name"] for r in nodes.collect() if r["node_name"]}
    # real constituency labels came through; the root S is relabeled
    # UNDEF_<tree_id> by parse_sentences_df (process_tree parity)
    assert "NN" in names and "NP" in names and "UNDEF_d1.0" in names
    assert nodes.select("tree_id").distinct().count() == 2
