"""Session factory / cluster-posture artifact tests."""

from architxt_spark.session import (
    DURABLE_BARRIERS_CONF,
    EXCLUDED_OPTIMIZER_RULES,
    cluster_conf,
    stage_barrier,
)


def test_cluster_conf_keys_and_scaling():
    conf = cluster_conf(executors=1000, executor_cores=4, target_partition_mb=256)
    # the knobs the 100-TB posture documents, present as one artifact
    for key in (
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
        DURABLE_BARRIERS_CONF,
    ):
        assert key in conf, key
    assert conf["spark.sql.shuffle.partitions"] == str(2 * 1000 * 4)
    assert conf["spark.sql.files.maxPartitionBytes"] == str(256 << 20)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    assert conf[DURABLE_BARRIERS_CONF] == "true"
    assert conf["spark.sql.optimizer.excludedRules"] == EXCLUDED_OPTIMIZER_RULES
    # smaller cluster scales the shuffle ceiling down
    assert cluster_conf(executors=10, executor_cores=8)[
        "spark.sql.shuffle.partitions"
    ] == str(160)


def test_stage_barrier_local_default(spark):
    df = spark.range(10)
    out = stage_barrier(df.withColumnRenamed("id", "n"))
    assert sorted(r.n for r in out.collect()) == list(range(10))


def test_tree_buckets_whole_trees_single_exchange(spark):
    """tree_buckets: every tree's rows arrive in ONE pandas group (the
    per-tree fns reconstruct whole trees), and the groupBy reuses the
    pinned-width repartition — exactly one Exchange in the executed plan
    (the AQE one-task-coalescing and per-tree-call overhead traps both
    closed)."""
    import pandas as pd

    from architxt_spark.session import tree_buckets

    rows = [(f"t{i}", f"t{i}:{j}") for i in range(40) for j in range(5)]
    df = spark.createDataFrame(rows, "tree_id string, node_id string")

    def check(pdf: pd.DataFrame) -> pd.DataFrame:
        counts = pdf.groupby("tree_id").size()
        return pd.DataFrame(
            {"tree_id": counts.index, "n": counts.values.astype("int64")}
        )

    out = tree_buckets(df).applyInPandas(check, "tree_id string, n long")
    got = {r["tree_id"]: r["n"] for r in out.collect()}
    assert got == {f"t{i}": 5 for i in range(40)}  # never split across groups

    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]  # AQE prints both sections
    assert final.count("Exchange") == 1, plan
