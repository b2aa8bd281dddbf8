"""Seeded randomized invariant tests for the round-5 operators.

Spark-backed (one frame per case), so these use a few seeded random
corpora rather than hypothesis' many-example loop — the invariants are
the point:

- two-phase top-k is LOSSLESS: for any candidate frame and any salt
  count, results equal the single global window;
- chunk_dedup (filter side) and strip_duplicate_chunks (transform side)
  agree chunk-for-chunk;
- semantic_dedup's keep rule: dropped iff a lower-id same-cell vector
  is within the threshold; the min id of every cell always survives.
"""

import hashlib
import math
import random

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window


def _rand_embeddings(spark, n, dim, seed):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


@pytest.mark.parametrize("seed,n_salts", [(1, 2), (2, 7), (3, 64)])
def test_two_phase_topk_equals_global_window(spark, seed, n_salts):
    from architxt_spark.functions.ann import _two_phase_topk

    rng = random.Random(seed)
    rows = [
        (q, i, round(rng.uniform(0, 1), 6))
        for q in range(4)
        for i in range(rng.randint(5, 60))
    ]
    sims = spark.createDataFrame(rows, "query_id int, neighbor_id int, sim double")
    k = rng.randint(1, 8)

    got = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in _two_phase_topk(sims, k, "sim", n_salts=n_salts).collect()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    expect = sorted(
        (r.query_id, r.rank, r.neighbor_id)
        for r in sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .collect()
    )
    assert got == expect


def test_chunk_filter_and_transform_agree(spark):
    from architxt_spark.functions.dedup import chunk_dedup, strip_duplicate_chunks

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"t{rng.randint(0, 9)}" for _ in range(rng.randint(0, 30))))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    flags = chunk_dedup(df, "text", "doc_id", chunk_tokens=5).collect()
    rebuilt = {
        r.doc_id: r
        for r in strip_duplicate_chunks(df, "text", "doc_id", chunk_tokens=5).collect()
    }
    # kept counts agree per doc; every doc present in the transform output
    kept_per_doc = {}
    total_per_doc = {}
    for r in flags:
        total_per_doc[r.doc_id] = total_per_doc.get(r.doc_id, 0) + 1
        if r.kept:
            kept_per_doc[r.doc_id] = kept_per_doc.get(r.doc_id, 0) + 1
    for d, r in rebuilt.items():
        assert r.n_chunks == total_per_doc.get(d, 0)
        assert r.n_kept == kept_per_doc.get(d, 0)
        # rebuilt token count == sum of kept chunk sizes (tokens preserved)
        n_tokens = len(r.clean_text.split()) if r.clean_text else 0
        assert n_tokens <= 5 * r.n_kept
        if r.n_kept:
            assert n_tokens > 5 * (r.n_kept - 1) - 5  # no chunk lost


def test_semantic_dedup_keep_rule_invariants(spark):
    from architxt_spark.functions.ann import semantic_dedup

    emb = _rand_embeddings(spark, 40, 6, seed=11)
    tau = 0.6
    out = semantic_dedup(emb, n_cells=5, threshold=tau).collect()
    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    by_cell = {}
    for r in out:
        by_cell.setdefault(r.cell_id, []).append(r)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(
            d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6
        )

    for cell, members in by_cell.items():
        ids = sorted(m.vec_id for m in members)
        kept = {m.vec_id: m.kept for m in members}
        assert kept[ids[0]], "min id of a cell must survive"
        for m in members:
            near_lower = any(
                cos(vecs[m.vec_id], vecs[j]) >= tau for j in ids if j < m.vec_id
            )
            assert kept[m.vec_id] == (not near_lower), (cell, m.vec_id)
