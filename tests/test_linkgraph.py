"""Link-graph analytics (functions/linkgraph.py): edge builders and the
exact integer fixed-point PageRank, including the DuckDB SQL twin."""

import duckdb
import pytest
from pyspark.sql import functions as F

from architxt_spark.functions.linkgraph import (
    html_host_edges,
    pagerank,
    pagerank_sql,
    session_edges,
)


def _py_pagerank(edges, iters=3, scale=10**9, damping_pct=85):
    """Independent driver-side mirror: same integer arithmetic, plain
    dict loops — the test oracle for the distributed implementation."""
    w = {}
    for s, d, wt in edges:
        w[(s, d)] = w.get((s, d), 0) + wt
    nodes = sorted({s for s, _ in w} | {d for _, d in w})
    ow = {}
    for (s, _), wt in w.items():
        ow[s] = ow.get(s, 0) + wt
    n = len(nodes)
    r0 = scale // n
    base = ((100 - damping_pct) * r0) // 100
    r = {v: r0 for v in nodes}
    for _ in range(iters):
        c = {v: 0 for v in nodes}
        for (s, d), wt in w.items():
            c[d] += (r[s] * wt) // ow[s]
        r = {v: base + (damping_pct * c[v]) // 100 for v in nodes}
    return r


EDGES = [
    ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
    ("d", "a", 5),  # d is dangling-in only as a source; e receives only
    ("c", "e", 1),  # e is a dangling node (no out-edges)
]


def test_pagerank_matches_integer_mirror(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w long")
    got = {
        r.node: r.rank_units
        for r in pagerank(df, weight="w", iters=4).collect()
    }
    assert got == _py_pagerank(EDGES, iters=4)
    # dangling node e keeps inflow + base; source-only d decays to base
    assert got["e"] > got["d"]


def test_pagerank_weight_none_counts_rows(spark):
    rows = [(s, d) for s, d, wt in EDGES for _ in range(wt)]
    df = spark.createDataFrame(rows, "src string, dst string")
    got = {r.node: r.rank_units for r in pagerank(df).collect()}
    assert got == _py_pagerank(EDGES)


def test_pagerank_partitioning_invariance(spark):
    """Integer arithmetic ⇒ bit-identical results regardless of physical
    layout (the determinism contract that enables the hash oracle)."""
    df = spark.createDataFrame(EDGES, "src string, dst string, w long")
    a = sorted(map(tuple, pagerank(df, weight="w").collect()))
    b = sorted(map(tuple, pagerank(df.repartition(17, "dst"), weight="w").collect()))
    assert a == b


def test_pagerank_sql_twin_parity(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string, w long")
    want = sorted(map(tuple, pagerank(df, weight="w", iters=3).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src VARCHAR, dst VARCHAR, w BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?, ?)", EDGES)
    got = sorted(con.execute(pagerank_sql("SELECT * FROM e", iters=3)).fetchall())
    assert got == want


def test_pagerank_empty(spark):
    df = spark.createDataFrame([], "src string, dst string")
    assert pagerank(df).collect() == []


def test_session_edges(spark):
    rows = [
        (1, 10, 1, "x"), (1, 20, 2, "y"), (1, 30, 3, "y"), (1, 40, 4, "z"),
        (2, 10, 5, "x"),  # single-event user: no edge
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, page string")
    got = sorted(map(tuple, session_edges(df).collect()))
    # y→y self-loop dropped; trailing events emit nothing
    assert got == [("x", "y"), ("y", "z")]


def test_html_host_edges_from_warc(spark, tmp_path):
    """The crawl compose: WARC → hrefs → registrable-domain edges."""
    from architxt_spark.sources.warc import build_warc, read_warc

    page = (
        b'<html><body><a href="https://other.example.co.uk/page">x</a>'
        b'<a href="http://www.self.example.com/here">self</a>'
        b"<a href='https://third.org/a#frag'>y</a>"
        b'<a href="/relative/skipped">rel</a></body></html>'
    )
    (tmp_path / "a.warc").write_bytes(
        build_warc([{
            "warc_type": "response",
            "target_uri": "http://www.self.example.com/",
            "payload": page,
        }])
    )
    recs = read_warc(spark, str(tmp_path / "a.warc"), extract_text=False)
    pages = recs.select("target_uri", F.col("payload").cast("string").alias("html"))
    got = sorted(map(tuple, html_host_edges(pages, html_col="html").collect()))
    # self-link dropped (same eTLD+1), relative link skipped
    assert got == [
        ("example.com", "example.co.uk"),
        ("example.com", "third.org"),
    ]


def test_pagerank_early_stop_and_dangling(spark):
    """r7: L1-delta early stop matches the fixed-iteration result it
    stops at, and dangling-mass redistribution matches the closed form
    on a two-node graph."""
    from architxt_spark.functions.linkgraph import pagerank

    # two-node cycle: symmetric, converges immediately — huge tol stops
    # after the first iteration, matching the iters=1 run exactly
    cyc = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    one = {r.node: r.rank_units for r in pagerank(cyc, iters=1).collect()}
    early = {
        r.node: r.rank_units
        for r in pagerank(cyc, iters=50, tol_units=10**12).collect()
    }
    assert early == one
    # and with a tight tolerance the converged ranks equal the long run
    tight = {
        r.node: r.rank_units
        for r in pagerank(cyc, iters=50, tol_units=0).collect()
    }
    assert tight == {r.node: r.rank_units for r in pagerank(cyc, iters=50).collect()}

    # a -> b, b dangling.  n=2, scale=1000 => r0=500, base=75.
    # iter1 without redistribution: a=75, b=75+(85*500)//100=500
    # with redistribution: dangling sum=500 -> share=(85*(500//2))//100=212
    # a=75+212=287, b=500+212=712
    chain = spark.createDataFrame([("a", "b")], "src string, dst string")
    plain = {
        r.node: r.rank_units
        for r in pagerank(chain, iters=1, scale=1000).collect()
    }
    assert plain == {"a": 75, "b": 500}
    redis = {
        r.node: r.rank_units
        for r in pagerank(
            chain, iters=1, scale=1000, redistribute_dangling=True
        ).collect()
    }
    assert redis == {"a": 287, "b": 712}
    # mass is (approximately, up to integer floor) conserved
    assert sum(redis.values()) >= sum(plain.values())
