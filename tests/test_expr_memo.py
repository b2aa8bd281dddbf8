"""Expression-construction memoization (r14 optimization round).

The text composites, the LSH bucket hash, and the graph loader's emission
array are pure functions of their argument EXPRESSIONS but cost 40-590 ms
of py4j round trips per construction; they are memoized per JVM
(``text._memo_expr`` / ``graph._EMISSION_CACHE``).  These tests pin the
cache contract: identical arguments reuse the SAME tree, different
arguments never collide, and a memoized tree still evaluates correctly
when referenced repeatedly (including twice in one projection).
"""

from pyspark.sql import functions as F

from architxt_spark.functions import ann
from architxt_spark.functions import text as T


def test_memo_returns_same_tree_for_same_args(spark):
    a = T.gopher_keep(F.col("text"))
    b = T.gopher_keep(F.col("text"))
    assert a is b  # cache hit: the identical unresolved tree is reused


def test_memo_distinguishes_args(spark):
    assert T.gopher_keep(F.col("text")) is not T.gopher_keep(F.col("body"))
    assert T.shingles(F.col("text"), 2) is not T.shingles(F.col("text"), 3)
    v = F.col("embedding").cast("array<double>")
    assert ann.lsh_bucket(v, 64) is ann.lsh_bucket(v, 64)
    assert ann.lsh_bucket(v, 64, n_planes=4) is not ann.lsh_bucket(v, 64)


def test_memoized_tree_evaluates_correctly_and_repeatedly(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",), ("zzz",), ("",)], ["text"]
    )
    # same memoized tree used in two consecutive queries AND twice in one
    # projection — values must match a fresh evaluation of the semantics
    rows = df.select(
        T.lang_id(F.col("text")).alias("l1"),
        T.lang_id(F.col("text")).alias("l2"),
        T.token_count(F.col("text")).alias("n"),
    ).collect()
    assert [(r["l1"], r["l2"]) for r in rows] == [
        ("en", "en"), ("und", "und"), ("und", "und")
    ]
    again = df.select(T.lang_id(F.col("text")).alias("l")).collect()
    assert [r["l"] for r in again] == ["en", "und", "und"]


def test_emission_array_cached_per_key(spark):
    from architxt_spark.sources.graph import _EMISSION_CACHE, _emission_array

    app = spark.sparkContext.applicationId
    a = _emission_array(app, "g1", ("name",), ("w",))
    b = _emission_array(app, "g1", ("name",), ("w",))
    c = _emission_array(app, "g2", ("name",), ("w",))
    assert a is b
    assert a is not c  # namespace participates in the OIDs -> distinct tree
    assert (app, "g1", ("name",), ("w",)) in _EMISSION_CACHE
