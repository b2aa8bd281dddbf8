"""DSIR importance scoring (functions/dsir.py)."""

import pytest

from architxt_spark.functions import dsir


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "physics equations and physics proofs"),   # target-like
        (2, "physics equations everywhere"),
        (3, "buy cheap pills now buy now"),            # spam-like
        (4, "cheap pills cheap pills"),
        (5, "   "),                                    # no features
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dsir_scores_direction(corpus):
    """Docs resembling the target slice score higher than spam; empty docs
    get NULL."""
    target = corpus.filter("doc_id = 1")
    out = {r.doc_id: r for r in dsir.dsir_scores(corpus, target, n_buckets=64).collect()}
    assert out[5].n_feats == 0 and out[5].dsir_score is None
    assert out[2].dsir_score > out[3].dsir_score
    assert out[2].dsir_score > out[4].dsir_score
    assert out[1].dsir_score > 0  # the target doc itself looks like the target


def test_dsir_matches_duckdb(corpus):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", corpus.toPandas())
    oracle = sorted(
        con.execute(
            dsir.dsir_scores_sql("documents", "doc_id = 1", n_buckets=64)
        ).fetchall()
    )
    target = corpus.filter("doc_id = 1")
    got = sorted(
        (r.doc_id, r.n_feats, r.dsir_score)
        for r in dsir.dsir_scores(corpus, target, n_buckets=64).collect()
    )
    assert len(got) == len(oracle)
    for (gi, gn, gs), (oi, on, os_) in zip(got, oracle):
        assert gi == oi and gn == on
        assert (gs is None and os_ is None) or gs == pytest.approx(os_, abs=1e-6)


def test_dsir_ratio_table_is_bucket_bounded(corpus):
    """The log-ratio table must be broadcast (bucket-bounded), and the
    feature explode must not cartesian-join anything."""
    target = corpus.filter("doc_id = 1")
    plan = (
        dsir.dsir_scores(corpus, target, n_buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_dsir_select_gumbel_topk(spark):
    """Selection: deterministic Gumbel-top-k — k rows, ranks 1..k,
    higher importance weights selected more; global top-k runs as
    TakeOrdered (no full sort exchange)."""
    import pytest
    from pyspark.sql import functions as F

    from architxt_spark.functions.dsir import dsir_select, dsir_select_sql

    rows = [
        (i, "target style words alpha beta gamma delta " + f"x{i}")
        for i in range(20)
    ] + [
        (100 + i, "raw crawl junk filler noise content " + f"y{i}")
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    target = df.filter(F.col("doc_id") < 20)

    out = dsir_select(df, target, k=10, n_buckets=256, salt="s")
    got = [(r.doc_id, r.sel_key, r.sel_rank) for r in out.collect()]
    assert len(got) == 10
    assert sorted(r[2] for r in got) == list(range(1, 11))
    # importance weighting dominates the Gumbel noise here: the selected
    # set is mostly target-like documents
    assert sum(1 for d, *_ in got if d < 20) >= 7
    # determinism
    again = [(r.doc_id, r.sel_key, r.sel_rank)
             for r in dsir_select(df, target, k=10, n_buckets=256, salt="s").collect()]
    assert sorted(got) == sorted(again)
    plan = dsir_select(df, target, k=10, n_buckets=256, salt="s")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(
        con.execute(
            dsir_select_sql("documents", "doc_id < 20", k=10, n_buckets=256, salt="s")
        ).fetchall()
    )
    assert sorted(got) == oracle
