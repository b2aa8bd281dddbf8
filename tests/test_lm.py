"""Bigram-LM perplexity scoring (functions/lm.py)."""

import math

import pytest

from architxt_spark.functions import lm


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "a"), (3, "b c")], ["doc_id", "text"]
    )


def test_perplexity_hand_computed(corpus):
    out = {r.doc_id: r for r in lm.bigram_lm_perplexity(corpus).collect()}

    # unigrams a:3 b:3 c:1 (V=3); bigrams (a,b):2 (b,a):1 (b,c):1; k=0.5
    p_ab = (2 + 0.5) / (3 + 0.5 * 3)
    p_ba = (1 + 0.5) / (3 + 0.5 * 3)
    lsum = round(math.log(p_ab), 6) * 2 + round(math.log(p_ba), 6)
    expect = round(math.exp(-lsum / 3), 4)
    assert out[1].n_trans == 3
    assert out[1].ppl == pytest.approx(expect, abs=1e-4)

    # single-token doc: no transitions, NULL perplexity
    assert out[2].n_trans == 0 and out[2].ppl is None

    # a repeated/templated doc scores LOWER perplexity than a rare one
    assert out[1].ppl < out[3].ppl


def test_perplexity_matches_duckdb(corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    oracle = sorted(
        con.execute(lm.bigram_lm_perplexity_sql("documents")).fetchall()
    )
    got = sorted(
        (r.doc_id, r.n_trans, r.ppl) for r in lm.bigram_lm_perplexity(corpus).collect()
    )
    for (gi, gn, gp), (oi, on, op) in zip(got, oracle):
        assert gi == oi and gn == on
        assert (gp is None and op is None) or gp == pytest.approx(op)


def test_perplexity_zero_token_docs(spark):
    """Empty / punctuation-only / non-Latin docs (0 retrieval tokens) must
    get n_trans=0 + NULL ppl, not crash the slice with a negative length."""
    df = spark.createDataFrame(
        [(1, "a b a"), (2, ""), (3, "!!! ..."), (4, "中文文本")],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in lm.bigram_lm_perplexity(df).collect()}
    assert out[1].n_trans == 2 and out[1].ppl is not None
    for d in (2, 3, 4):
        assert out[d].n_trans == 0 and out[d].ppl is None


def test_perplexity_train_on_reference_corpus(spark):
    """CCNet shape: train the LM on a clean frame, score another.  Hand
    check one seen transition + the unseen-word smoothing floor."""
    train = spark.createDataFrame([(10, "a b a b")], ["doc_id", "text"])
    score = spark.createDataFrame([(1, "a b"), (2, "z q")], ["doc_id", "text"])
    out = {r.doc_id: r for r in lm.bigram_lm_perplexity(score, train_docs=train).collect()}

    # train stats: unigrams a:2 b:2 (V=2); bigram (a,b):2; k=0.5
    p_ab = (2 + 0.5) / (2 + 0.5 * 2)
    assert out[1].n_trans == 1
    assert out[1].ppl == pytest.approx(round(math.exp(-round(math.log(p_ab), 6)), 4), abs=1e-4)

    # fully unseen transition: c2=0, c1=0 -> k / (k*V) = 1/V
    p_unseen = 0.5 / (0.5 * 2)
    assert out[2].n_trans == 1
    assert out[2].ppl == pytest.approx(round(math.exp(-round(math.log(p_unseen), 6)), 4), abs=1e-4)

    # self-train default unchanged by the left-join refactor
    self_out = {r.doc_id: r for r in lm.bigram_lm_perplexity(train).collect()}
    assert self_out[10].n_trans == 3 and self_out[10].ppl is not None


def test_chunk_documents_windows(spark):
    """Chunk boundaries: stride = chunk - overlap; windows overlap by
    `overlap` tokens; final window short; empty docs emit nothing."""
    from architxt_spark.functions.text import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, text), (2, "a b"), (3, "")], ["doc_id", "text"])
    rows = sorted(
        (r.doc_id, r.chunk_id, r.n_tokens)
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    )
    # doc1: starts 0,2,4,6 -> sizes 4,4,4,4.  A start of 8 would cover
    # only w8,w9 — already inside the start-6 window — so it is NOT
    # emitted (starts are capped at len - overlap - 1 = 7).
    # doc2: one short window.
    assert rows == [
        (1, 0, 4), (1, 1, 4), (1, 2, 4), (1, 3, 4),
        (2, 0, 2),
    ]

    import pytest as _p

    with _p.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_no_shuffle(spark):
    from architxt_spark.functions.text import chunk_documents

    df = spark.createDataFrame([(1, "a b c d e f")], ["doc_id", "text"])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ngram_stats_ranking(spark):
    from architxt_spark.functions.text import ngram_stats

    df = spark.createDataFrame(
        [
            (1, "the quick fox jumps the quick fox sleeps"),
            (2, "the quick fox runs"),
            (3, "lazy dogs sleep"),
        ],
        ["doc_id", "text"],
    )
    rows = ngram_stats(df, n=3, k=3).collect()
    # "the quick fox" appears in docs 1 (twice) and 2 -> doc_freq 2, total 3
    assert (rows[0].gram, rows[0].doc_freq, rows[0].total_freq) == ("the quick fox", 2, 3)
    # remaining grams all have doc_freq 1: ties broken by total then gram
    assert all(r.doc_freq == 1 for r in rows[1:])


def test_ppl_buckets_thirds_and_und(spark):
    """Equal-count thirds by perplexity (boundary ties share a bucket);
    short docs land in 'und'; head has the lowest perplexities."""
    from pyspark.sql import functions as F

    from architxt_spark.functions.lm import ppl_buckets

    rows = [(i, "the cat sat on mat " + ("xyz unseen rare " * (i % 5)) + f"tail{i}")
            for i in range(30)]
    rows.append((100, "short"))  # 1 token -> NULL ppl
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = ppl_buckets(df).collect()
    buckets = {r.doc_id: r.bucket for r in out}
    assert buckets[100] == "und"
    counts = {}
    for r in out:
        counts[r.bucket] = counts.get(r.bucket, 0) + 1
    assert set(counts) <= {"head", "middle", "tail", "und"}
    # value-contiguous buckets: max(head ppl) <= min(middle ppl) <= ...
    by = {}
    for r in out:
        if r.ppl is not None:
            by.setdefault(r.bucket, []).append(r.ppl)
    assert max(by["head"]) <= min(by.get("middle", by.get("tail", [float("inf")])))
    if "middle" in by and "tail" in by:
        assert max(by["middle"]) <= min(by["tail"])
    # roughly thirds (ties can shift counts)
    n = sum(v for k, v in counts.items() if k != "und")
    assert counts.get("head", 0) >= n // 3 - 2


def test_perplexity_reference_trained_parity(spark):
    """train_docs= (the CCNet clean-reference form): unseen words and
    bigrams fall to the count-0 smoothing floor identically in Spark
    (left joins + coalesce) and the DuckDB twin (train_table=)."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.lm import bigram_lm_perplexity, bigram_lm_perplexity_sql

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the dog sat on the rug near the cat"),
            (3, "entirely novel vocabulary appears here"),
            (4, "tiny"),
        ],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame(
        [(10, "the cat sat on the mat again"), (11, "the dog ran to the mat")],
        ["doc_id", "text"],
    )
    got = sorted(
        (r.doc_id, r.n_trans, r.ppl)
        for r in bigram_lm_perplexity(docs, train_docs=ref).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    con.register("refdocs", ref.toPandas())
    oracle = sorted(con.execute(
        bigram_lm_perplexity_sql("documents", train_table="refdocs")
    ).fetchall())
    assert got == oracle
    by_id = {i: p for i, _, p in got}
    assert by_id[4] is None  # short doc
    assert by_id[3] > by_id[1]  # fully-unseen doc scores worse than in-domain
