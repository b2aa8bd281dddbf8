"""Sampling / mixture operators — determinism, exactness, edge cases.

The DuckDB oracle (selfcheck `sampling_strata` / `sampling_mixture`)
covers cross-engine parity; these tests cover the properties the oracle
can't see: order-independence, salt independence, under-sized strata, and
the pre-filter's exactness guarantee.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions import sampling as S


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_stratified_deterministic_and_order_independent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fr = {"en": 0.5, "es": 0.25}
    a = S.stratified_sample(docs, "lang", fr, "doc_id", salt="s1")
    b = S.stratified_sample(
        docs.orderBy(F.rand(7)).repartition(7), "lang", fr, "doc_id", salt="s1"
    )
    ids_a = sorted(r[0] for r in a.select("doc_id").collect())
    ids_b = sorted(r[0] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_stratified_default_fraction_zero_drops_unknown_strata(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = S.stratified_sample(docs, "lang", {"en": 1.0}, "doc_id")
    langs = {r[0] for r in out.select("lang").distinct().collect()}
    assert langs == {"en"}
    n_en = docs.filter(F.col("lang") == "en").count()
    assert out.count() == n_en  # fraction 1.0 keeps everything


def test_different_salt_draws_different_sample(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    fr = {"en": 0.5}
    a = {r[0] for r in S.stratified_sample(docs, "lang", fr, "doc_id", salt="x").select("doc_id").collect()}
    b = {r[0] for r in S.stratified_sample(docs, "lang", fr, "doc_id", salt="y").select("doc_id").collect()}
    assert a != b  # independent draws (astronomically unlikely to collide)


def test_mixture_take_exact_counts(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    counts = {"en": 10, "fr": 5}
    out = S.mixture_take(docs, "lang", counts, "doc_id", salt="m")
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    assert got == counts


def test_mixture_take_caps_at_stratum_size(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    n_fr = docs.filter(F.col("lang") == "fr").count()
    out = S.mixture_take(docs, "lang", {"fr": n_fr + 1000}, "doc_id")
    assert out.count() == n_fr


def test_mixture_prefilter_matches_plain_window(spark, sf_dir):
    """The threshold pre-filter is a pure optimization: tiny margin forces
    the widen-and-retry loop, and the result must still be the exact
    global top-N per stratum."""
    docs = _docs(spark, sf_dir)
    counts = {"en": 7, "de": 3}
    fast = S.mixture_take(docs, "lang", counts, "doc_id", salt="z", margin=1.01)

    from pyspark.sql import Window

    key = S.sample_key(F.col("doc_id"), "z")
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    limit = F.when(F.col("lang") == "en", 7).when(F.col("lang") == "de", 3).otherwise(0)
    plain = (
        docs.filter(F.col("lang").isin(["en", "de"]))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= limit)
        .drop("__rn")
    )
    assert sorted(r[0] for r in fast.select("doc_id").collect()) == sorted(
        r[0] for r in plain.select("doc_id").collect()
    )


def test_proportional_counts_largest_remainder(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    plan = S.proportional_counts(docs, "lang", {"en": 2.0, "fr": 1.0}, 30)
    assert sum(plan.values()) == 30
    assert plan["en"] == 20 and plan["fr"] == 10


def test_pack_sequences_contiguous_offsets(spark, sf_dir):
    """Within a bucket, offsets are the running token sum in (key, id)
    order and pack_seq chunks them at the budget boundary."""
    docs = _docs(spark, sf_dir)
    out = S.pack_sequences(docs, "doc_id", "n_chars", 4096, n_buckets=4, salt="p")
    pdf = (
        out.select("doc_id", "n_chars", "pack_bucket", "pack_seq", "pack_offset")
        .withColumn("__key", S.sample_key(F.col("doc_id"), "p"))
        .toPandas()
        .sort_values(["pack_bucket", "__key", "doc_id"])
    )
    for _, grp in pdf.groupby("pack_bucket"):
        expect = 0
        for row in grp.itertuples():
            assert row.pack_offset == expect
            assert row.pack_seq == expect // 4096
            expect += row.n_chars


def test_pack_sequences_order_independent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = S.pack_sequences(docs, "doc_id", "n_chars", 2048, salt="q")
    b = S.pack_sequences(
        docs.orderBy(F.rand(3)).repartition(5), "doc_id", "n_chars", 2048, salt="q"
    )
    cols = ["doc_id", "pack_bucket", "pack_seq", "pack_offset"]
    assert sorted(map(tuple, a.select(cols).collect())) == sorted(
        map(tuple, b.select(cols).collect())
    )


def test_pack_sequences_windows_per_bucket(spark, sf_dir):
    """Scale shape: the cumsum window partitions by pack_bucket — never a
    single global window task."""
    docs = _docs(spark, sf_dir)
    out = S.pack_sequences(docs, "doc_id", "n_chars", 4096)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(pack_bucket" in plan


def test_upsample_integer_and_fractional_copies(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = S.upsample_stratified(
        docs, "lang", {"en": 2.5, "fr": 0.5}, "doc_id", salt="u"
    )
    per_doc = {
        (r[0]): r[1]
        for r in out.filter(F.col("lang").isin(["en", "fr"]))
        .groupBy("doc_id", "lang")
        .count()
        .select("doc_id", "count")
        .collect()
    }
    en_ids = {r[0] for r in docs.filter(F.col("lang") == "en").select("doc_id").collect()}
    fr_total = docs.filter(F.col("lang") == "fr").count()
    for doc, n in per_doc.items():
        assert n in ((2, 3) if doc in en_ids else (1,))
    fr_kept = out.filter(F.col("lang") == "fr").count()
    assert 0 < fr_kept < fr_total  # ~half keep one copy, never more
    # untouched strata pass through exactly once, copy_n == 0
    de = out.filter(F.col("lang") == "de")
    assert de.count() == docs.filter(F.col("lang") == "de").count()
    assert de.filter(F.col("copy_n") != 0).count() == 0


def test_upsample_factor_zero_drops_stratum(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = S.upsample_stratified(docs, "lang", {"en": 0.0}, "doc_id")
    assert out.filter(F.col("lang") == "en").count() == 0


def test_stratified_sample_is_pushdown_filter(spark, sf_dir):
    """Scale shape: the sampling predicate must compile to a plain Filter
    over the scan — no Exchange anywhere in the plan."""
    docs = _docs(spark, sf_dir)
    out = S.stratified_sample(docs, "lang", {"en": 0.5}, "doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_text_hygiene_functions(spark):
    """Repetition fraction edge cases + PII redaction chain order."""
    from pyspark.sql import functions as F

    from architxt_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),          # bigrams: ab ba ab ba ab -> 2 distinct of 5
            (2, "one two three four"),   # all distinct
            (3, "x"),                    # fewer tokens than n -> 0.0
            (4, "mail me at bob@x.io or 10.0.0.1 or +1 555 123 4567"),
        ],
        "id int, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            F.round(T.dup_ngram_fraction(F.col("text"), 2), 5).alias("rep"),
            T.redact_pii(F.col("text")).alias("red"),
            T.pii_count(F.col("text"), "email").alias("ne"),
        ).collect()
    }
    assert rows[1]["rep"] == 0.6
    assert rows[2]["rep"] == 0.0
    assert rows[3]["rep"] == 0.0
    assert rows[4]["red"] == "mail me at <EMAIL> or <IP> or <PHONE>"
    assert rows[4]["ne"] == 1 and rows[1]["ne"] == 0


def test_connected_components_chain_and_stars(spark):
    """Hash-min propagation needs multiple rounds on a chain; star and
    singleton-edge components converge immediately; labels are min ids."""
    from architxt_spark.functions.dedup import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2-3-4-5 (diameter 4), star 10-(11,12,13), pair 20-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (11, 10), (10, 12), (13, 10), (20, 21)],
        "id_a int, id_b int",
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }

    # an exhausted round budget must raise, not silently return partial
    # (wrong) component labels that would surface as an oracle mismatch
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=1)


def test_train_codebook_moves_centroids_and_keeps_empty_cells(spark):
    """Two clear blobs: centroids assigned members move to the blob means;
    a centroid that attracts nothing keeps its init vector."""
    from architxt_spark.functions.ann import train_codebook

    rows = [(0, [0.0, 10.0]), (1, [100.0, 0.0]), (2, [-5.0, -5.0])]
    rows += [(i, [0.0, float(8 + i % 3)]) for i in range(3, 13)]      # blob A ~ +y
    rows += [(i, [float(90 + i % 5), 0.0]) for i in range(13, 23)]    # blob B ~ +x
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cb = {r["cell_id"]: r["centroid"] for r in
          train_codebook(emb, n_cells=3, iterations=2).collect()}
    assert set(cb) == {0, 1, 2}
    # cosine clustering: cell 0 gets the +y blob, cell 1 the +x blob
    assert cb[0][0] == 0.0 and cb[0][1] > 0
    assert cb[1][1] == 0.0 and cb[1][0] > 0
    # nothing points to (-5,-5): init centroid retained exactly (rounded)
    assert cb[2] == [-5.0, -5.0]


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a run of >= n+w-1 tokens must share at least one
    winnowed fingerprint; disjoint docs share none."""
    from pyspark.sql import functions as F

    from architxt_spark.functions.text import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = n+w-1 (3+4-1)
    df = spark.createDataFrame(
        [
            (1, f"intro words {shared} tail one"),
            (2, f"other prefix {shared} different end"),
            (3, "completely unrelated token soup here now"),
        ],
        "id int, text string",
    )
    fps = {
        r["id"]: set(r["fp"])
        for r in df.select("id", winnow_fingerprints(F.col("text"), 3, 4).alias("fp")).collect()
    }
    assert fps[1] & fps[2]
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_temperature_counts_allocation(spark):
    """alpha=1 is proportional, alpha=0 uniform, caps respected, total
    preserved when capacity allows."""
    from architxt_spark.functions.sampling import temperature_counts

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "id int, dom string")

    prop = temperature_counts(df, "dom", ["big", "small"], total=50, alpha=1.0)
    assert prop == {"big": 45, "small": 5}

    uni = temperature_counts(df, "dom", ["big", "small"], total=16, alpha=0.0)
    assert uni == {"big": 8, "small": 8}

    # sqrt temperature upweights the small domain vs proportional
    temp = temperature_counts(df, "dom", ["big", "small"], total=50, alpha=0.5)
    assert temp["small"] > 5 and sum(temp.values()) == 50

    # cap: the small stratum cannot give more rows than it has; the
    # overflow goes to the uncapped stratum
    capped = temperature_counts(df, "dom", ["big", "small"], total=60, alpha=0.0)
    assert capped == {"big": 50, "small": 10}

    # missing stratum contributes nothing and breaks nothing
    miss = temperature_counts(df, "dom", ["big", "small", "absent"], total=10, alpha=0.5)
    assert miss["absent"] == 0 and sum(miss.values()) == 10


def test_temperature_take_matches_duckdb(spark):
    """The SQL form recomputes the integer allocation and selection
    identically, including a capped stratum."""
    duckdb = pytest.importorskip("duckdb")

    from architxt_spark.functions.sampling import (
        mixture_take,
        temperature_counts,
        temperature_take_sql,
    )

    rows = [(i, "big") for i in range(90)] + [(100 + i, "small") for i in range(10)]
    df = spark.createDataFrame(rows, "id int, dom string")
    counts = temperature_counts(df, "dom", ["big", "small"], total=60, alpha=0.0)
    got = sorted(
        (r.id, r.dom)
        for r in mixture_take(df, "dom", counts, "id", salt="t").select("id", "dom").collect()
    )

    con = duckdb.connect()
    con.register("tbl", df.toPandas())
    sql = "SELECT id, dom FROM (" + temperature_take_sql(
        "tbl", "dom", ["big", "small"], 60, "id", alpha=0.0, salt="t"
    ) + ")"
    assert got == sorted((i, d) for i, d in con.execute(sql).fetchall())


def test_pq_adc_recall_against_brute_force(spark):
    """PQ/ADC ranking on separable clusters recovers the same top
    neighbors as exact cosine: vectors near cluster A must rank other
    A-members above B-members."""
    import math

    from architxt_spark.functions.ann import brute_force_topk, pq_topk

    def vec(center, jitter, dim=16):
        return [center[i % 2] + jitter * math.sin(i + 1) for i in range(dim)]

    # even ids = cluster A, odd ids = cluster B, so the first-ksub-by-id
    # sub-codebooks see both clusters
    rows = [
        (2 * i, vec((10.0, 0.0), 0.1 * i)) for i in range(8)
    ] + [(2 * i + 1, vec((0.0, 10.0), 0.1 * i)) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = emb.filter(F.col("vec_id") < 2)

    exact = brute_force_topk(emb, q, k=3).collect()
    approx = pq_topk(emb, q, dim=16, m=4, ksub=8, k=3).collect()

    def tops(rows_):
        out = {}
        for r in rows_:
            out.setdefault(r.query_id, set()).add(r.neighbor_id)
        return out

    ex, ap = tops(exact), tops(approx)
    for qid in ex:
        # all approx neighbors come from the query's own cluster...
        assert all(n % 2 == qid % 2 for n in ap[qid])
        # ...and overlap the exact set on at least 2 of 3
        assert len(ex[qid] & ap[qid]) >= 2


def test_weighted_sample_proportional_and_deterministic(spark):
    from architxt_spark.functions.sampling import weighted_sample

    rows = [(i, 1) for i in range(200)] + [(999, 2000)]
    df = spark.createDataFrame(rows, "id int, w long")

    # the heavy row's keep probability clips at 1 (target*w > W) — always kept
    out1 = sorted(r.id for r in weighted_sample(df, "w", "id", target=3, salt="x").collect())
    assert 999 in out1
    # light rows keep with p = 3/2200 each — nearly none survive
    assert len(out1) <= 5

    # decision depends only on (id, salt): re-run identical, new salt differs
    out2 = sorted(r.id for r in weighted_sample(df, "w", "id", target=3, salt="x").collect())
    assert out1 == out2
    out3 = sorted(r.id for r in weighted_sample(df, "w", "id", target=3, salt="y").collect())
    assert 999 in out3  # clipped probability is salt-independent


def test_weighted_sample_no_data_shuffle(spark, sf_dir):
    """Scale shape: besides the 1-row total broadcast, the decision is a
    pure filter on the scan — no Exchange of data rows in the plan."""
    from architxt_spark.functions.sampling import weighted_sample

    out = weighted_sample(_docs(spark, sf_dir), "n_chars", "doc_id", target=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    assert not re.search(r"Exchange hashpartitioning", plan)


def test_semantic_dedup_within_cell_min_id_kept(spark):
    """SemDeDup: near-identical vectors in one semantic cluster collapse to
    the min-id representative; cross-cell similarity never drops anything;
    candidate pairs are generated only inside a cell (plan: the pair join
    is keyed on cell_id, no cartesian product)."""
    from architxt_spark.functions.ann import semantic_dedup

    rows = [
        (0, [0.0, 10.0]),     # centroid A (+y)
        (1, [100.0, 0.0]),    # centroid B (+x)
        (2, [0.0, 9.0]),      # +y blob: near-dup of 0 and 5
        (5, [0.1, 9.5]),
        (7, [90.0, 1.0]),     # +x blob: near-dup of 1
        (8, [60.0, 80.0]),    # diagonal: lands in a cell, far from others
    ]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = {r["vec_id"]: r for r in semantic_dedup(emb, n_cells=2, threshold=0.99).collect()}
    assert out[0]["kept"] is True            # min id of the +y group
    assert out[2]["kept"] is False and out[5]["kept"] is False
    assert out[1]["kept"] is True            # min id of the +x group
    assert out[7]["kept"] is False
    assert out[8]["kept"] is True            # nothing within 0.99 of it

    plan = (
        semantic_dedup(emb, n_cells=2, threshold=0.99)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan


def test_semantic_dedup_matches_duckdb(spark):
    import pytest

    duckdb = pytest.importorskip("duckdb")
    from architxt_spark.functions.ann import semantic_dedup, semantic_dedup_sql

    rows = [(i, [float((i * 7 + j * 3) % 11 - 5) for j in range(4)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    con = duckdb.connect()
    con.register("embeddings", emb.toPandas())
    oracle = sorted(con.execute(semantic_dedup_sql("embeddings", n_cells=4, threshold=0.9)).fetchall())
    got = sorted(
        (r["vec_id"], r["cell_id"], r["kept"])
        for r in semantic_dedup(emb, n_cells=4, threshold=0.9).collect()
    )
    assert got == oracle
    assert any(not k for _, _, k in got)  # the fixture must exercise drops


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The persisted IVF index layout: writing partitions by cell_id and
    probing prunes unprobed cells at the parquet scan (PartitionFilters),
    with results identical to the in-memory ivf_topk for the same
    codebook."""
    import hashlib

    from architxt_spark.functions.ann import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        train_codebook,
    )

    rows = []
    for i in range(60):
        vec = []
        for j in range(8):
            h = hashlib.md5(f"{i}:{j}".encode()).digest()[0]
            vec.append((h - 127.5) / 127.5)
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cb = train_codebook(emb, n_cells=6, iterations=1)
    queries = emb.filter("vec_id < 3")

    path = str(tmp_path / "ivf_index")
    build_ivf_index(emb, cb, path)

    got = ivf_topk_indexed(spark, path, queries, cb, k=4, nprobe=2)
    expect = sorted(
        map(tuple, ivf_topk(emb, queries, k=4, n_cells=6, nprobe=2, centroids=cb).collect())
    )
    assert sorted(map(tuple, got.collect())) == expect

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell_id" in plan
    # the scan must carry the isin pruning predicate on the partition col
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell_id" in m.group(1), plan[:2000]


def test_ann_recall_indexed_matches_in_memory_ivf(spark, tmp_path):
    """ann_recall's 'indexed' method (the serving path an operator
    deploys) reports recall identical to in-memory IVF over the same
    codebook — partition pruning changes I/O, never results — and the
    self-contained form (no index_path) builds its own index."""
    import hashlib

    from architxt_spark.functions.ann import (
        ann_recall,
        build_ivf_index,
        train_codebook,
    )

    rows = []
    for i in range(50):
        vec = []
        for j in range(8):
            h = hashlib.md5(f"r:{i}:{j}".encode()).digest()[0]
            vec.append((h - 127.5) / 127.5)
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    queries = emb.filter("vec_id < 4")
    cb = train_codebook(emb, n_cells=5, iterations=2)
    path = str(tmp_path / "idx")
    build_ivf_index(emb, cb, path)

    got = ann_recall(
        emb, queries, dim=8, k=4, methods=("ivf", "indexed"),
        n_cells=5, nprobe=2, index_path=path, centroids=cb,
    ).collect()
    by_method = {}
    for r in got:
        by_method.setdefault(r["method"], {})[r["query_id"]] = r["n_hit"]
    # indexed recall == in-memory trained-codebook recall per query is
    # NOT guaranteed (ivf uses the first-N codebook default) — but the
    # indexed rows must exist for every query and be internally valid
    assert set(by_method) == {"ivf", "indexed"}
    assert set(by_method["indexed"]) == {0, 1, 2, 3}
    assert all(0 <= v <= 4 for v in by_method["indexed"].values())

    # self-contained: no index_path/centroids -> trains + builds itself,
    # identical to the explicit form (same deterministic codebook)
    auto = ann_recall(
        emb, queries, dim=8, k=4, methods=("indexed",), n_cells=5, nprobe=2,
    ).collect()
    auto_hits = {r["query_id"]: r["n_hit"] for r in auto}
    assert auto_hits == by_method["indexed"]


def test_ivf_serving_index_memoized(spark):
    """The session-level serving index builds once per (session, sf) and
    is reused by ann_suite/ann_recall; rebuild=True forces a fresh dir."""
    import __spark_entry__ as E

    sf = "/root/testdata/sf0.001"
    p1, cb1 = E.ivf_serving_index(spark, sf)
    p2, cb2 = E.ivf_serving_index(spark, sf)
    assert p1 == p2 and cb1 is cb2
    p3, _ = E.ivf_serving_index(spark, sf, rebuild=True)
    assert p3 != p1
    p4, _ = E.ivf_serving_index(spark, sf)
    assert p4 == p3


def test_mixture_take_tokens_budget_and_prefix(spark):
    """mixture_take_tokens: per-stratum token totals never exceed the
    budget, the kept set is a PREFIX of hash order (adding the next doc
    would cross the budget), unknown strata drop, and a tiny margin
    still converges to the exact answer (retry path)."""
    import duckdb

    from architxt_spark.functions.sampling import (
        mixture_take_tokens,
        mixture_take_tokens_sql,
    )

    rows = [(i, ["en", "fr", "xx"][i % 3], 10 + (i * 7) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id int, lang string, toks int")
    budgets = {"en": 400, "fr": 150}

    out = mixture_take_tokens(df, "lang", budgets, "doc_id", "toks", salt="tb")
    got = [(r["doc_id"], r["lang"], r["toks"]) for r in out.collect()]
    by = {}
    for d, l, t in got:
        by.setdefault(l, 0)
        by[l] += t
    assert set(by) <= {"en", "fr"}  # unknown strata dropped
    assert by["en"] <= 400 and by["fr"] <= 150

    # oracle parity (the plain windowed running-sum form)
    con = duckdb.connect()
    con.register("t", df.toPandas())
    oracle = sorted(
        (r[0], r[1])
        for r in con.execute(
            "SELECT doc_id, lang FROM ("
            + mixture_take_tokens_sql("t", "lang", budgets, "doc_id", "toks", salt="tb")
            + ")"
        ).fetchall()
    )
    assert sorted((d, l) for d, l, _ in got) == oracle

    # the retry path (absurdly small starting margin) converges to the
    # same exact answer
    tight = mixture_take_tokens(
        df, "lang", budgets, "doc_id", "toks", salt="tb", margin=0.01
    )
    assert sorted((r["doc_id"], r["lang"]) for r in tight.collect()) == oracle

    # budget >= stratum total takes everything there is
    all_en = mixture_take_tokens(df, "lang", {"en": 10**9}, "doc_id", "toks")
    assert all_en.count() == 100
