"""Flajolet–Martin PCSA cardinality sketch (functions/sketch.py)."""

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions import sketch


def test_fm_estimate_accuracy(spark):
    """The estimate tracks the true cardinality within PCSA's expected
    error (~0.78/sqrt(m) ≈ 5% at m=256; allow 15% slack), duplicates
    change nothing, and NULLs are ignored."""
    n = 5000
    df = spark.createDataFrame(
        [(f"v{i % n}",) for i in range(3 * n)] + [(None,)] * 10, "v string"
    )
    row = sketch.fm_count_distinct(df, "v", m=256).collect()[0]
    assert row.m == 256
    assert abs(row.est_distinct - n) / n < 0.15, row.est_distinct

    # duplicates-only frame: same estimate as the distinct frame
    row2 = sketch.fm_count_distinct(df.distinct(), "v", m=256).collect()[0]
    assert row2.est_distinct == row.est_distinct


def test_fm_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    df = spark.createDataFrame([(f"tok{i * 7 % 1234}",) for i in range(4000)], "v string")
    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = con.execute(sketch.fm_count_distinct_sql("t", "v", m=128)).fetchall()[0]
    got = sketch.fm_count_distinct(df, "v", m=128).collect()[0]
    assert (got.m, got.est_distinct) == oracle


def test_fm_rejects_non_power_of_two():
    with pytest.raises(ValueError, match="power of two"):
        sketch.fm_count_distinct_sql("t", "v", m=100)


def test_fm_is_one_map_combinable_aggregate(spark):
    """Plan shape: no shuffle of raw values — the only exchanges carry the
    m-bucket sketch (hash partial aggregate before them)."""
    df = spark.createDataFrame([(f"v{i}",) for i in range(100)], "v string")
    plan = (
        sketch.fm_count_distinct(df, "v", m=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_bit_or" in plan or "bit_or" in plan
    assert "Window" not in plan


def test_kmv_estimates_accuracy_and_merge(spark):
    """KMV: distinct estimates track truth (~1/sqrt(k)); Jaccard of
    overlapping sets lands near the true value; small sets are near-exact."""
    from architxt_spark.functions.sketch import kmv_estimates, kmv_sketch

    a = spark.createDataFrame([(f"v{i}",) for i in range(3000)], "v string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(1500, 4500)], "v string")
    sa, sb = kmv_sketch(a, "v", k=128), kmv_sketch(b, "v", k=128)
    row = kmv_estimates(sa, sb, k=128).collect()[0]
    assert abs(row.est_a - 3000) / 3000 < 0.25
    assert abs(row.est_b - 3000) / 3000 < 0.25
    assert abs(row.est_union - 4500) / 4500 < 0.25
    # true jaccard = 1500/4500 = 0.333
    assert abs(row.est_jaccard - 1 / 3) < 0.15

    # tiny sets: sketch IS the exact hash set -> exact counts
    ta = spark.createDataFrame([("x",), ("y",), ("z",)], "v string")
    tb = spark.createDataFrame([("y",), ("z",), ("w",)], "v string")
    r = kmv_estimates(kmv_sketch(ta, "v"), kmv_sketch(tb, "v")).collect()[0]
    assert (r.est_a, r.est_b, r.est_union) == (3.0, 3.0, 4.0)
    assert r.est_jaccard == 0.5


def test_kmv_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import (
        kmv_estimates,
        kmv_estimates_sql,
        kmv_sketch,
        kmv_sketch_sql,
    )

    a = spark.createDataFrame([(f"t{i * 3 % 700}",) for i in range(2000)], "v string")
    b = spark.createDataFrame([(f"t{i * 3 % 700 + 350}",) for i in range(2000)], "v string")
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    oracle = con.execute(
        kmv_estimates_sql(kmv_sketch_sql("ta", "v", k=64), kmv_sketch_sql("tb", "v", k=64), k=64)
    ).fetchall()[0]
    got = kmv_estimates(kmv_sketch(a, "v", k=64), kmv_sketch(b, "v", k=64), k=64).collect()[0]
    assert tuple(got) == oracle


def test_bloom_no_false_negatives_and_low_fp(spark):
    from architxt_spark.functions.sketch import bloom_build, bloom_probe

    members = spark.createDataFrame([(f"m{i}",) for i in range(500)], "v string")
    bloom = bloom_build(members, "v", n_bits=8192, n_hashes=4)
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(500)] + [(f"x{i}",) for i in range(500)], "v string"
    )
    rows = bloom_probe(probe, bloom, "v", n_bits=8192, n_hashes=4).collect()
    member_hits = [r.maybe_member for r in rows if r.v.startswith("m")]
    non_hits = [r.maybe_member for r in rows if r.v.startswith("x")]
    assert all(member_hits), "bloom filters never false-negative"
    # n=500, m=8192, k=4 -> fp ~ (1-e^{-kn/m})^k ~ 0.5%; allow 5%
    assert sum(non_hits) / len(non_hits) < 0.05

    # probe plan is join-free codegen
    plan = (
        bloom_probe(probe, bloom, "v", n_bits=8192, n_hashes=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import (
        bloom_build,
        bloom_membership_sql,
        bloom_probe,
    )

    members = spark.createDataFrame([(f"m{i}",) for i in range(80)], "v string")
    probe = spark.createDataFrame(
        [(f"m{i}",) for i in range(40, 120)], "v string"
    ).distinct()
    con = duckdb.connect()
    con.register("mem", members.toPandas())
    con.register("pr", probe.toPandas())
    oracle = dict(
        con.execute(
            bloom_membership_sql("mem", "v", "pr", "v", "v", n_bits=512, n_hashes=3)
        ).fetchall()
    )
    bloom = bloom_build(members, "v", n_bits=512, n_hashes=3)
    got = {
        r.v: r.maybe_member
        for r in bloom_probe(probe, bloom, "v", n_bits=512, n_hashes=3).collect()
    }
    assert got == oracle
    assert all(got[f"m{i}"] for i in range(40, 80))


def test_fm_state_is_idempotent_commutative_monoid(spark, tmp_path):
    """The streaming-state claim: appending a batch's bitmaps TWICE (a
    replayed micro-batch) or in any order yields the identical estimate —
    bit_or is an idempotent commutative monoid, so exactly-once needs no
    bookkeeping."""
    from architxt_spark.functions.sketch import fm_bitmaps, fm_count_distinct, fm_estimate

    a = spark.createDataFrame([(f"v{i}",) for i in range(800)], "v string")
    b = spark.createDataFrame([(f"v{i}",) for i in range(400, 1200)], "v string")
    pa, pb = fm_bitmaps(a, "v", m=64), fm_bitmaps(b, "v", m=64)

    whole = fm_count_distinct(
        a.unionByName(b), "v", m=64
    ).collect()[0].est_distinct
    merged = fm_estimate(pa.unionByName(pb), m=64).collect()[0].est_distinct
    replayed = fm_estimate(
        pa.unionByName(pb).unionByName(pa), m=64
    ).collect()[0].est_distinct
    reordered = fm_estimate(pb.unionByName(pa), m=64).collect()[0].est_distinct
    assert whole == merged == replayed == reordered


def test_cms_one_sided_error_and_exactness(spark):
    """Count-min never under-counts; with a sparse stream and a wide
    sketch the estimates are exact; probe plan is join-free."""
    from architxt_spark.functions.sketch import cms_build, cms_query

    stream = spark.createDataFrame(
        [(f"v{i % 50}",) for i in range(1000)], "v string"  # each value 20x
    )
    cms = cms_build(stream, "v", width=2048, depth=4)
    probe = spark.createDataFrame(
        [(f"v{i}",) for i in range(50)] + [("absent",)], "v string"
    )
    out = {r.v: r.est_count for r in cms_query(probe, cms, "v", width=2048, depth=4).collect()}
    assert all(out[f"v{i}"] >= 20 for i in range(50))  # one-sided
    assert sum(out[f"v{i}"] == 20 for i in range(50)) >= 48  # mostly exact
    assert out["absent"] <= 2  # tiny over-count at most

    plan = (
        cms_query(probe, cms, "v", width=2048, depth=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan and "Exchange" not in plan


def test_cms_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import cms_build, cms_estimates_sql, cms_query

    stream = spark.createDataFrame([(f"t{i % 30}",) for i in range(600)], "v string")
    probe = spark.createDataFrame([(f"t{i}",) for i in range(40)], "v string")
    con = duckdb.connect()
    con.register("st", stream.toPandas())
    con.register("pr", probe.toPandas())
    oracle = dict(
        con.execute(
            cms_estimates_sql("st", "v", "pr", "v", "v", width=256, depth=3)
        ).fetchall()
    )
    cms = cms_build(stream, "v", width=256, depth=3)
    got = {
        r.v: r.est_count
        for r in cms_query(probe, cms, "v", width=256, depth=3).collect()
    }
    assert got == oracle


def test_kmv_empty_side_parity(spark):
    """Reviewer repro: an empty sketch side must estimate 0.0 on BOTH
    engines (DuckDB's list() over zero rows is NULL — now coalesced)."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import (
        kmv_estimates,
        kmv_estimates_sql,
        kmv_sketch,
        kmv_sketch_sql,
    )

    a = spark.createDataFrame([], "v string")
    b = spark.createDataFrame([("x",), ("y",)], "v string")
    con = duckdb.connect()
    con.register("ta", a.toPandas())
    con.register("tb", b.toPandas())
    oracle = con.execute(
        kmv_estimates_sql(kmv_sketch_sql("ta", "v"), kmv_sketch_sql("tb", "v"))
    ).fetchall()[0]
    got = tuple(kmv_estimates(kmv_sketch(a, "v"), kmv_sketch(b, "v")).collect()[0])
    assert got == oracle == (0.0, 2.0, 2.0, 0.0)


def test_bloom_and_cms_null_probe_parity(spark):
    """NULL probe values keep their row with NULL membership / zero count
    on BOTH engines (the SQL twins no longer drop them)."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import (
        bloom_build,
        bloom_membership_sql,
        bloom_probe,
        cms_build,
        cms_estimates_sql,
        cms_query,
    )

    members = spark.createDataFrame([("a",), ("b",)], "v string")
    probe = spark.createDataFrame([("a",), ("zz",), (None,)], "v string")
    con = duckdb.connect()
    con.register("mem", members.toPandas())
    con.register("pr", probe.toPandas())

    b_oracle = dict(
        con.execute(
            bloom_membership_sql("mem", "v", "pr", "v", "v", n_bits=256, n_hashes=3)
        ).fetchall()
    )
    bloom = bloom_build(members, "v", n_bits=256, n_hashes=3)
    b_got = {
        r.v: r.maybe_member
        for r in bloom_probe(probe, bloom, "v", n_bits=256, n_hashes=3).collect()
    }
    assert b_got == b_oracle
    assert b_got["a"] is True and b_got[None] is None

    c_oracle = dict(
        con.execute(
            cms_estimates_sql("mem", "v", "pr", "v", "v", width=128, depth=3)
        ).fetchall()
    )
    cms = cms_build(members, "v", width=128, depth=3)
    c_got = {
        r.v: r.est_count for r in cms_query(probe, cms, "v", width=128, depth=3).collect()
    }
    assert c_got == c_oracle
    assert c_got["a"] == 1 and c_got[None] == 0


def test_bloom_empty_build_side_null_probe_parity(spark):
    """Empty filter: non-NULL probes are definite non-members (False), but
    NULL probes stay NULL — matching the non-empty path and the SQL twin
    (bool_and over NULL hits)."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.sketch import (
        bloom_build,
        bloom_membership_sql,
        bloom_probe,
    )

    members = spark.createDataFrame([], "v string")
    probe = spark.createDataFrame([("a",), (None,)], "v string")
    con = duckdb.connect()
    con.register("mem", members.toPandas())
    con.register("pr", probe.toPandas())
    oracle = dict(
        con.execute(
            bloom_membership_sql("mem", "v", "pr", "v", "v", n_bits=256, n_hashes=3)
        ).fetchall()
    )
    bloom = bloom_build(members, "v", n_bits=256, n_hashes=3)
    got = {
        r.v: r.maybe_member
        for r in bloom_probe(probe, bloom, "v", n_bits=256, n_hashes=3).collect()
    }
    assert got == oracle
    assert got["a"] is False and got[None] is None


def test_curate_corpus_census_and_survivors(spark):
    """Pipeline integration: quality gate first, then exact+near dedup;
    census counts the survivors after each stage; kept frame preserves the
    input schema."""
    from architxt_spark.functions.curation import curate_corpus

    good = (
        "the quick brown fox jumps over a lazy dog while the sun sets "
        "behind distant hills and children play near the quiet river bank "
        "watching boats drift slowly toward the old wooden bridge "
    )
    rows = [
        (1, good + "alpha"),
        (2, good + "alpha"),       # exact duplicate of 1 -> dropped
        (3, "a completely separate narrative is told here about mountain "
            "climbers who ascend frozen ridges at dawn carrying heavy ropes "
            "and iron tools toward the summit while storms gather in the east"),
        (4, "short junk"),          # fails word-count gate
        (5, "a a a a a a a a a a a a a a a a a a a a a a a a"),  # repetition
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept, census = curate_corpus(df)
    c = {r.stage: r.n_docs for r in census.collect()}
    assert c["input"] == 5
    assert c["quality"] == 3          # 4 and 5 gated out
    assert c["dedup"] == 2            # 2 deduped away
    assert sorted(r.doc_id for r in kept.collect()) == [1, 3]
    assert kept.columns == ["doc_id", "text"]


def test_curation_full_chain_sample_and_pack(spark):
    """The extended chain: mixture take after dedup (exact per-stratum
    counts) and sequence packing (census counts the packed sequences);
    census replays in DuckDB stage for stage."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.curation import curate_corpus, curation_census_sql

    base = (
        "the quick brown fox jumps over a lazy dog while the sun sets "
        "behind distant hills and children play near the quiet river bank "
    )
    rows = [
        (i, base + f"story {i % 7} variant {i}", "en" if i % 3 else "fr", 40 + i % 9)
        for i in range(24)
    ] + [(100, "junk", "en", 1)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "n_chars"])
    kw = dict(
        mixture_col="lang",
        mixture_counts={"en": 5, "fr": 4},
        pack_token_col="n_chars",
        pack_budget=100,
        pack_buckets=2,
        salt="t",
    )
    kept, census = curate_corpus(df, **kw)
    got = sorted((r.stage, r.n_docs) for r in census.collect())

    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(con.execute(curation_census_sql("documents", **kw)).fetchall())
    assert got == oracle
    c = dict(got)
    assert c["sample"] <= 9 and c["sample"] <= c["dedup"]
    assert c["pack"] >= 1
    # kept frame carries the pack layout
    assert {"pack_bucket", "pack_seq", "pack_offset"} <= set(kept.columns)


def test_curation_census_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.curation import curate_corpus, curation_census_sql

    base = (
        "the quick brown fox jumps over a lazy dog while the sun sets "
        "behind distant hills and children play near the quiet river bank "
    )
    rows = [(i, base + f"tail number {i % 4} closes the story") for i in range(16)] + [
        (100, "junk"),
        (101, "b b b b b b b b b b b b b b b b b b b b b"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(con.execute(curation_census_sql("documents")).fetchall())
    _, census = curate_corpus(df)
    got = sorted((r.stage, r.n_docs) for r in census.collect())
    assert got == oracle


def test_curation_temperature_mixture_derives_counts(spark):
    """Self-contained temperature mixing: counts derived internally from
    post-dedup stratum sizes; census replays stage-for-stage in DuckDB."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.curation import curate_corpus, curation_census_sql

    # per-doc-unique content words: every shingle carries doc-specific
    # tokens, so all 28 docs survive near-dup dedup and the temperature
    # allocation has real stratum sizes to water-fill over
    rows = [
        (
            i,
            " ".join(f"the word{i}n{j} item{i}x{j}" for j in range(12)),
            "en" if i % 4 else "fr",
        )
        for i in range(28)
    ] + [(100, "junk", "en")]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    kw = dict(
        mixture_col="lang",
        mixture_total=10,
        mixture_strata=["en", "fr"],
        mixture_alpha=0.5,
        salt="t6",
    )
    kept, census = curate_corpus(df, **kw)
    got = sorted((r.stage, r.n_docs) for r in census.collect())
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(con.execute(curation_census_sql("documents", **kw)).fetchall())
    assert got == oracle
    c = dict(got)
    assert c["sample"] == 10 and kept.count() == 10
    # the temperature allocation upweights the smaller stratum vs
    # proportional: fr share in the take > fr share in the survivors
    langs = {r.lang: 0 for r in kept.select("lang").distinct().collect()}
    for r in kept.collect():
        langs[r.lang] += 1
    assert langs["fr"] >= 3  # proportional would give ~2 of 10


def test_curation_ppl_reference_and_classifier_stages(spark):
    """The two model-quality stages in their published form: the ppl
    tail-drop trained on a CLEAN REFERENCE corpus (CCNet's recipe —
    ``ppl_train_docs``), then the fastText-style classifier gate trained
    on labelled seed frames (``quality_model_pos/neg``).  Census replays
    stage-for-stage in DuckDB with the seeds registered as views."""
    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.curation import curate_corpus, curation_census_sql

    base = (
        "the quick brown fox jumps over a lazy dog while the sun sets "
        "behind distant hills and children play near the quiet river bank "
    )
    good = " careful analysis explains the detailed history of science"
    junk = " casino bonus casino jackpot spins winner casino bonus prize"
    rows = [
        (i, base + (good if i % 2 else junk) + f" item number {i}")
        for i in range(18)
    ] + [(100, "junk")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ref = spark.createDataFrame(
        [(1000 + j, base + good + f" reference passage {j}") for j in range(4)],
        ["doc_id", "text"],
    )
    pos = spark.createDataFrame(
        [(2000 + j, base + good + f" seed {j}") for j in range(4)],
        ["doc_id", "text"],
    )
    neg = spark.createDataFrame(
        [(3000 + j, base + junk + f" seed {j}") for j in range(4)],
        ["doc_id", "text"],
    )
    kept, census = curate_corpus(
        df,
        ppl_drop_tail=True,
        ppl_train_docs=ref,
        quality_model_pos=pos,
        quality_model_neg=neg,
    )
    got = sorted((r.stage, r.n_docs) for r in census.collect())

    con = duckdb.connect()
    for name, frame in (
        ("documents", df), ("refdocs", ref), ("seedpos", pos), ("seedneg", neg)
    ):
        con.register(name, frame.toPandas())
    oracle = sorted(con.execute(curation_census_sql(
        "documents",
        ppl_drop_tail=True,
        ppl_train_table="refdocs",
        quality_pos_src="seedpos",
        quality_neg_src="seedneg",
    )).fetchall())
    assert got == oracle
    c = dict(got)
    assert c["classifier"] <= c["ppl"] <= c["dedup"]
    # the classifier gate actually separates: every survivor is a
    # good-marker doc (odd id), every junk-marker doc is gone
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids and all(i % 2 == 1 for i in ids)


# ---------------------------------------------------------------------------
# Bloom saturation guard (r12): the bounded-state tiers' quiet failure
# mode — a filling bitmap keeps answering while its false-positive rate
# climbs — becomes an executable contract instead of a docstring.  The
# r11.5 streambench rehearsal measured an under-sized bitmap silently
# keeping ~280/2000 genuinely-fresh documents.
# ---------------------------------------------------------------------------


def test_suggest_bloom_bits_ten_x_rule():
    # ~10 bits per value at k=4, rounded up to a power of two
    m = sketch.suggest_bloom_bits(100_000)
    assert m >= 10 * 100_000
    assert m & (m - 1) == 0  # power of two
    assert m <= 2 * 10 * 100_000  # no more than one doubling of slack
    # floor: tiny cardinalities still get a usefully-sized filter
    assert sketch.suggest_bloom_bits(10) == 4096
    # bit budget scales with hash count (k bits set per value)
    assert sketch.suggest_bloom_bits(100_000, n_hashes=8) >= 2 * 10 * 100_000 // 2
    with pytest.raises(ValueError):
        sketch.suggest_bloom_bits(0)


def test_bloom_saturation_tracks_fill(spark):
    vals = spark.createDataFrame([(f"v{i}",) for i in range(200)], "v string")
    # generously sized: predicted set fraction 1-exp(-4*200/8192) ~ 9.3%
    roomy = sketch.bloom_build(vals, "v", n_bits=8192, n_hashes=4)
    s1 = sketch.bloom_saturation(roomy, n_bits=8192)
    assert 0.05 < s1 < 0.15
    # under-sized: 1-exp(-4*200/256) ~ 96%
    tight = sketch.bloom_build(vals, "v", n_bits=256, n_hashes=4)
    s2 = sketch.bloom_saturation(tight, n_bits=256)
    assert s2 > 0.85
    # empty filter: zero
    empty = sketch.bloom_build(vals.filter("v IS NULL"), "v", n_bits=256)
    assert sketch.bloom_saturation(empty, n_bits=256) == 0.0


def test_check_bloom_saturation_warn_refuse_override(spark):
    import warnings

    vals = spark.createDataFrame([(f"v{i}",) for i in range(200)], "v string")
    # healthy (~9%): silent
    roomy = sketch.bloom_build(vals, "v", n_bits=8192, n_hashes=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sat = sketch.check_bloom_saturation(roomy, n_bits=8192, n_hashes=4)
    assert sat < 0.30
    # mid (~38% at 2048 bits): warns, does not raise
    mid = sketch.bloom_build(vals, "v", n_bits=2048, n_hashes=4)
    with pytest.warns(sketch.BloomSaturationWarning):
        sat = sketch.check_bloom_saturation(mid, n_bits=2048, n_hashes=4)
    assert 0.30 <= sat < 0.60
    # saturated (~96%): refuses...
    tight = sketch.bloom_build(vals, "v", n_bits=256, n_hashes=4)
    with pytest.raises(sketch.BloomSaturationError):
        sketch.check_bloom_saturation(tight, n_bits=256, n_hashes=4)
    # ...unless overridden (still warns so the drop rate stays loud)
    with pytest.warns(sketch.BloomSaturationWarning):
        sat = sketch.check_bloom_saturation(
            tight, n_bits=256, n_hashes=4, override=True
        )
    assert sat >= 0.60


def test_url_seen_batch_guard_fires_before_over_drop(spark, tmp_path):
    """End-to-end through the streaming consumer: a deliberately tiny
    frontier bitmap warns while fresh URLs still mostly survive, then
    REFUSES the next batch instead of silently eating it."""
    import warnings

    from architxt_spark.streaming.corpus import url_seen_batch

    path = str(tmp_path / "seen")
    mk = lambda lo, hi: spark.createDataFrame(
        [(f"http://x/{i}",) for i in range(lo, hi)], "url string"
    )
    # batch 1 fills a 252-bit bitmap with 40 urls*4 hashes -> ~47% set
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        k1 = url_seen_batch(mk(0, 40), path, n_bits=252, n_hashes=4).count()
    assert k1 == 40  # empty bitmap: everything is fresh
    # batch 2 probes a ~47%-set bitmap: the WARN tier fires, most fresh
    # urls still pass (fp ~ 0.47^4 ~ 5%)
    with pytest.warns(sketch.BloomSaturationWarning):
        k2 = url_seen_batch(mk(40, 80), path, n_bits=252, n_hashes=4).count()
    assert k2 >= 30
    # batch 3 sees a ~70%-set bitmap: the guard refuses outright
    with pytest.raises(sketch.BloomSaturationError):
        url_seen_batch(mk(80, 120), path, n_bits=252, n_hashes=4)
    # override keeps the old keep-what-you-can behavior, loudly
    with pytest.warns(sketch.BloomSaturationWarning):
        k3 = url_seen_batch(
            mk(80, 120), path, n_bits=252, n_hashes=4, bloom_override=True
        ).count()
    assert 0 < k3 <= 40
