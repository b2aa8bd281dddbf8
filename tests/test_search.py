"""BM25 lexical retrieval (functions/search.py)."""

import math

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions import search


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark spark spark runs fast"),
        (2, "spark is a stream engine, stream stream!"),
        (3, "vector search and vector math"),
        (4, "nothing relevant here at all"),
        (5, "spark"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_bm25_ranking_and_values(corpus):
    out = search.bm25_topk(corpus, ["spark", "stream"], k=5).collect()
    ids = [r.doc_id for r in out]
    # doc 4 has no query term: score 0, ranked last; doc 2 carries both terms
    assert ids[-1] == 4
    assert out[-1].bm25 == 0.0
    assert ids[0] == 2

    # hand-computed check for doc 5 (tf_spark=1, dl=1):
    # N=5, df_spark=3, avgdl=(5+7+5+5+1)/5=4.6
    idf = math.log(1 + (5 - 3 + 0.5) / (3 + 0.5))
    tfn = 1 * (search.K1 + 1) / (1 + search.K1 * (1 - search.B + search.B * 1 / 4.6))
    expect = round(idf * tfn, 4)
    got = {r.doc_id: r.bm25 for r in out}[5]
    assert got == pytest.approx(expect, abs=1e-4)


def test_bm25_tokenizer_strips_punctuation(corpus):
    # doc 2's "stream!" must count as the term "stream" (3 occurrences)
    base = corpus.filter(F.col("doc_id") == 2).select(
        F.size(
            F.filter(search.retrieval_tokens(F.col("text")), lambda x: x == F.lit("stream"))
        ).alias("tf")
    )
    assert base.collect()[0].tf == 3


def test_bm25_matches_duckdb_oracle(corpus):
    duckdb = pytest.importorskip("duckdb")
    pdf = corpus.toPandas()
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute(
        search.bm25_topk_sql("documents", ["spark", "stream"], k=5)
    ).fetchall()
    got = [(r.doc_id, r.bm25) for r in search.bm25_topk(corpus, ["spark", "stream"], k=5).collect()]
    assert got == [(i, pytest.approx(s)) for i, s in oracle]
