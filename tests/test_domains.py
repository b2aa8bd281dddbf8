"""Domain screening: profile statistics, blocklist + mirror-domain drop
rule, cross-engine parity, broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions.domains import (
    domain_profile,
    domain_profile_sql,
    domain_screen,
)


def _corpus(spark):
    rows = (
        # good.com: distinct docs
        [(i, f"a perfectly reasonable document about topic {i} here", "good.com")
         for i in range(4)]
        # mirror.net: all copies of one template (dup fraction 1.0)
        + [(10 + i, "the same mirrored boilerplate body every time", "mirror.net")
           for i in range(4)]
        # spam.biz: distinct, but blocklisted
        + [(20 + i, f"buy item number {i} now at a low price", "spam.biz")
           for i in range(2)]
    )
    return spark.createDataFrame(rows, ["doc_id", "text", "source"])


def test_domain_profile_stats(spark):
    df = _corpus(spark)
    got = {r.domain: r for r in domain_profile(df, blocklist=("spam.biz",)).collect()}
    assert got["good.com"].n_docs == 4 and got["good.com"].dup_docs == 0
    assert got["mirror.net"].n_docs == 4 and got["mirror.net"].dup_docs == 4
    assert got["spam.biz"].blocked == 1 and got["good.com"].blocked == 0
    assert all(0.0 <= r.mean_quality <= 1.0 for r in got.values())


def test_domain_screen_drops_blocked_and_mirrors(spark):
    df = _corpus(spark)
    kept = domain_screen(df, blocklist=("spam.biz",), max_dup_fraction=0.5)
    doms = {r.source for r in kept.select("source").distinct().collect()}
    assert doms == {"good.com"}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_domain_profile_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    df = _corpus(spark)
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(
        con.execute(domain_profile_sql("documents", blocklist=("spam.biz",))).fetchall()
    )
    got = sorted(
        (r.domain, r.n_docs, r.dup_docs, r.mean_quality, r.blocked)
        for r in domain_profile(df, blocklist=("spam.biz",)).collect()
    )
    assert got == oracle
