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
