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
