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


def test_bm25_batch_matches_single_query(corpus, spark):
    """A one-bag batch must rank documents exactly as the single-query
    expression chain does (over the docs that match at least one term)."""
    single = {
        r.doc_id: r.bm25
        for r in search.bm25_topk(corpus, ["spark", "stream"], k=5).collect()
        if r.bm25 > 0
    }
    qdf = spark.createDataFrame([(1, ["spark", "stream"])], "query_id int, terms array<string>")
    batch = {
        r.doc_id: r.bm25 for r in search.bm25_topk_batch(corpus, qdf, k=5).collect()
    }
    assert set(batch) == set(single)
    for d, s in single.items():
        assert batch[d] == pytest.approx(s, abs=2e-4)


def test_bm25_batch_multiple_queries_and_qtf(corpus, spark):
    """Independent bags score independently; a repeated term doubles its
    contribution (query term frequency weighting)."""
    qdf = spark.createDataFrame(
        [(1, ["spark"]), (2, ["vector"]), (3, ["spark", "spark"])],
        "query_id int, terms array<string>",
    )
    out = search.bm25_topk_batch(corpus, qdf, k=5)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.bm25
    # query 2 retrieves only the vector doc
    assert set(by_q[2]) == {3}
    # query 1 retrieves the three spark docs
    assert set(by_q[1]) == {1, 2, 5}
    # qtf doubling: same retrieved set, doubled scores
    for d in by_q[1]:
        assert by_q[3][d] == pytest.approx(2 * by_q[1][d], abs=2e-4)
    # ranks are 1..n per query
    ranks = sorted(r.rank for r in rows if r.query_id == 1)
    assert ranks == [1, 2, 3]


def test_bm25_batch_matches_duckdb(corpus):
    duckdb = pytest.importorskip("duckdb")
    bags = [(1, ["spark", "stream"]), (2, ["vector", "fast"])]
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    oracle = sorted(
        con.execute(search.bm25_topk_batch_sql("documents", bags, k=4)).fetchall()
    )
    spark_df = corpus.sparkSession.createDataFrame(bags, "query_id int, terms array<string>")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.bm25)
        for r in search.bm25_topk_batch(corpus, spark_df, k=4).collect()
    )
    assert got == oracle


def test_bm25_batch_null_text_parity(corpus, spark):
    """NULL-text documents: Spark's size(tokens(NULL)) is NULL (not the
    legacy -1), so avgdl skips them on both engines while n_docs counts
    them — scores must hash-match."""
    duckdb = pytest.importorskip("duckdb")
    with_null = corpus.unionByName(
        spark.createDataFrame([(99, None)], "doc_id long, text string")
    )
    bags = [(1, ["spark", "stream"])]
    con = duckdb.connect()
    con.register("documents", with_null.toPandas())
    oracle = sorted(
        con.execute(search.bm25_topk_batch_sql("documents", bags, k=5)).fetchall()
    )
    qdf = spark.createDataFrame(bags, "query_id int, terms array<string>")
    got = sorted(
        (r.query_id, r.rank, r.doc_id, r.bm25)
        for r in search.bm25_topk_batch(with_null, qdf, k=5).collect()
    )
    assert got == oracle
