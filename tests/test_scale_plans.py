"""Plan-shape regression tests for the scale-critical paths.

Round-2 verdict flagged two unpartitioned windows that would funnel one
row per TREE through a single task at 100x scale (`operators/engine.py`
`simple_rewrite`, `llm.py` `windowed_shuffle_df`).  These tests pin the
fixed plan shapes: an unpartitioned window may only ever run over a
vocab-bounded DISTINCT frame, never over a per-tree frame.
"""

import re

from pyspark.sql import functions as F


def _window_lines(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    return [ln for ln in plan.splitlines() if "Window [" in ln]


def _unpartitioned(lines):
    # Partitioned windows print three top-level bracket groups
    # (functions, partition spec, order spec); unpartitioned print two.
    return [ln for ln in lines if not re.search(r"\], \[[^\]]*\], \[", ln)]


def _forest(spark, n_trees=60):
    from architxt_spark.trees import forest_from_trees, parse_tree

    shapes = [
        "(ROOT (X (ENT::a v1) (ENT::b v2)))",
        "(ROOT (X (ENT::a v1) (ENT::c v2)))",
        "(ROOT (X (ENT::b v1) (ENT::c v2) (ENT::d v3)))",
    ]
    trees = {f"t{i:03d}": parse_tree(shapes[i % 3]) for i in range(n_trees)}
    return forest_from_trees(spark, trees)


def test_simple_rewrite_ranks_only_distinct_label_sets(spark):
    from architxt_spark.operators.engine import simple_rewrite

    nodes = _forest(spark)
    out = simple_rewrite(nodes)

    # Unpartitioned windows must only touch the distinct label_set frame,
    # never a per-tree frame.
    unpart = _unpartitioned(_window_lines(out))
    assert unpart, "expected the label_set dense_rank window to exist"
    for ln in unpart:
        assert "label_set" in ln, f"unexpected unpartitioned window: {ln}"
        assert "tree_id" not in ln, f"per-tree unpartitioned window: {ln}"

    # Semantics: dense ids per unique sorted entity-label set, stable
    # across trees sharing a set.
    groups = (
        out.filter(F.col("node_type") == "GROUP")
        .select("tree_id", F.col("node_name").alias("gid"))
        .collect()
    )
    by_tree = {r["tree_id"]: r["gid"] for r in groups}
    assert len(by_tree) == 60
    assert sorted(set(by_tree.values())) == ["1", "2", "3"]
    # same shape -> same id
    assert by_tree["t000"] == by_tree["t003"]
    assert by_tree["t001"] == by_tree["t004"]
    assert by_tree["t000"] != by_tree["t001"]


def test_windowed_shuffle_df_has_no_window_at_all(spark):
    from architxt_spark.llm import windowed_shuffle_df

    nodes = _forest(spark, n_trees=40)
    shuffled = windowed_shuffle_df(nodes, window_size=5, seed=3)
    assert _window_lines(shuffled) == []
    assert shuffled.count() == nodes.count()
    # deterministic for a fixed seed
    a = [r["tree_id"] for r in shuffled.select("tree_id").distinct().collect()]
    b = [
        r["tree_id"]
        for r in windowed_shuffle_df(nodes, window_size=5, seed=3)
        .select("tree_id")
        .distinct()
        .collect()
    ]
    assert sorted(a) == sorted(b)
