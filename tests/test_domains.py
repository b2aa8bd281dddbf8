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


def test_normalize_url_rules_and_parity(spark):
    """URL canonicalization: fragment/port/tracking-param/trailing-slash
    rules, order preservation, and exact DuckDB-twin parity."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.domains import normalize_url, normalize_url_sql

    urls = [
        (1, "HTTPS://Example.COM:443/Path/?utm_source=x&q=1#frag"),
        (2, "http://a.example:80/"),
        (3, "http://a.example/p?fbclid=abc"),
        (4, "http://a.example/p?b=2&a=1"),          # param order preserved
        (5, "http://a.example/CaseSensitive/Path/"),
        (6, "http://a.example/p?utm_source=x&utm_medium=y"),
        (7, "not a url at all"),
        (8, "http://a.example:80"),                 # bare default port
        (9, "https://a.example:8443/keep"),         # non-default port kept
    ]
    df = spark.createDataFrame(urls, "id long, url string")
    got = {
        r.id: r.u
        for r in df.select("id", normalize_url(F.col("url")).alias("u")).collect()
    }
    assert got[1] == "https://example.com/Path?q=1"
    assert got[2] == "http://a.example"
    assert got[3] == "http://a.example/p"
    assert got[4] == "http://a.example/p?b=2&a=1"
    assert got[5] == "http://a.example/CaseSensitive/Path"
    assert got[6] == "http://a.example/p"
    assert got[8] == "http://a.example"
    assert got[9] == "https://a.example:8443/keep"
    con = duckdb.connect()
    con.register("u", df.toPandas())
    want = dict(con.execute(f"SELECT id, {normalize_url_sql('url')} FROM u").fetchall())
    assert got == want


def test_registrable_domain():
    from pyspark.sql import SparkSession

    from architxt_spark.functions.domains import registrable_domain

    spark = SparkSession.getActiveSession()
    rows = [
        (1, "https://news.example.com/x"),
        (2, "http://example.co.uk/y"),
        (3, "http://sub.a.example.co.uk/"),
        (4, "http://localhost/"),
        (5, "nonsense"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {
        r.id: r.d
        for r in df.select("id", registrable_domain(F.col("url")).alias("d")).collect()
    }
    assert got[1] == "example.com"
    assert got[2] == "example.co.uk"
    assert got[3] == "example.co.uk"
    assert got[4] == "localhost"
    assert got[5] is None


def test_domain_profile_from_urls(spark):
    """url_col derives the profile key via registrable_domain — the
    WARC-native form (subdomains collapse to eTLD+1)."""
    from architxt_spark.functions.domains import domain_profile

    rows = [
        (1, "https://news.example.com/a", "the quick brown fox story one"),
        (2, "https://blog.example.com/b", "the quick brown fox story two"),
        (3, "http://other.net/c", "a completely different page here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    prof = {r.domain: r.n_docs for r in domain_profile(df, url_col="url").collect()}
    assert prof == {"example.com": 2, "other.net": 1}


def test_normalize_url_idempotent_property(spark):
    """Canonicalization must be idempotent — a re-crawled canonical URL
    maps to itself, or dedup keys drift between passes."""
    from hypothesis import given, settings, strategies as st

    from architxt_spark.functions.domains import normalize_url

    frag = st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126), max_size=12
    )

    @st.composite
    def urls(draw):
        scheme = draw(st.sampled_from(["http", "https", "HTTP", "HtTpS"]))
        host = draw(st.sampled_from(["a.example.com", "EX.org", "x.co.uk:443", "y.net:8080"]))
        path = "/".join(draw(st.lists(frag, max_size=3)))
        q = "&".join(
            draw(st.lists(st.sampled_from(
                ["a=1", "utm_source=z", "b=", "fbclid=q", "c=d"]), max_size=4))
        )
        return f"{scheme}://{host}/{path}" + (f"?{q}" if q else "") + draw(
            st.sampled_from(["", "#frag", "/"])
        )

    @settings(max_examples=10, deadline=None)
    @given(batch=st.lists(urls(), min_size=1, max_size=20))
    def check(batch):
        df = spark.createDataFrame([(u,) for u in batch], "url string")
        once = [r.u for r in df.select(normalize_url(F.col("url")).alias("u")).collect()]
        df2 = spark.createDataFrame([(u,) for u in once], "url string")
        twice = [r.u for r in df2.select(normalize_url(F.col("url")).alias("u")).collect()]
        assert once == twice

    check()


def test_domain_screen_null_domain_parity(spark):
    """NULL-keyed rows survive the screen in BOTH engines: Spark's
    left_anti join keeps them, and the SQL twin uses NOT EXISTS — a
    NOT IN subquery would drop every row the moment a NULL appears on
    either side (the DuckDB three-valued-logic trap)."""
    duckdb = pytest.importorskip("duckdb")

    from architxt_spark.functions.domains import domain_screen_sql

    rows = [
        (1, "a perfectly reasonable document about topics here", "good.com"),
        (2, "another perfectly reasonable document right here", None),
        (3, "the same mirrored boilerplate body every time", "mirror.net"),
        (4, "the same mirrored boilerplate body every time", "mirror.net"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    kept = sorted(r.doc_id for r in domain_screen(df, max_dup_fraction=0.5).collect())
    assert kept == [1, 2]  # NULL-domain row kept; mirror domain dropped
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM ({domain_screen_sql('documents', max_dup_fraction=0.5)})"
    ).fetchall())
    assert oracle == kept
    # blocklist path: NULL-domain rows drop in BOTH engines (Spark's
    # ~isin filter is NULL-strict, and so is SQL NOT IN over literals)
    kept_b = sorted(r.doc_id for r in domain_screen(
        df, blocklist=("nope.com",), max_dup_fraction=0.5).collect())
    oracle_b = sorted(r[0] for r in con.execute(
        "SELECT doc_id FROM ("
        + domain_screen_sql("documents", blocklist=("nope.com",), max_dup_fraction=0.5)
        + ")"
    ).fetchall())
    assert kept_b == oracle_b == [1]


def test_decontaminate_filter_null_id_parity(spark):
    """decontaminate_filter's SQL twin keeps NULL-id corpus rows exactly
    like the Spark left_anti join (NOT EXISTS, not NOT IN)."""
    duckdb = pytest.importorskip("duckdb")

    from architxt_spark.functions.dedup import (
        decontaminate_filter,
        decontaminate_filter_sql,
    )

    # string ids: pandas would coerce a nullable long to NaN floats and
    # the NULL would never reach DuckDB
    corpus = spark.createDataFrame(
        [
            ("a", "the quick brown fox jumps over the lazy dog today"),
            (None, "an entirely unrelated document body standing here"),
            ("c", "benchmark question text repeated nearly verbatim in train"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame(
        [("q1", "benchmark question text repeated nearly verbatim in train")],
        "doc_id string, text string",
    )
    got = sorted(
        (r.doc_id or "",)
        for r in decontaminate_filter(corpus, bench, "text", "doc_id").collect()
    )
    assert got == [("",), ("a",)]  # NULL-id row kept, near-dup dropped
    con = duckdb.connect()
    con.register("corpus", corpus.toPandas())
    con.register("bench", bench.toPandas())
    oracle = sorted(
        (r[0] or "",)
        for r in con.execute(
            "SELECT doc_id FROM ("
            + decontaminate_filter_sql("corpus", "bench", "text", "doc_id")
            + ")"
        ).fetchall()
    )
    assert oracle == got
