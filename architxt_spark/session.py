"""SparkSession factory with scale-aware defaults.

Local runs use ``local[N]``; on a real cluster the same builder options
apply unchanged (AQE re-plans shuffles at runtime, handles skew joins, and
coalesces small partitions — the knobs that matter at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "architxt-spark", shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    return (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # Pin UTC so timestamp semantics match the UTC-naive parquet/duckdb view.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime shuffle re-planning, small-partition coalescing, and
        # skew-join splitting — essential at scale, harmless locally.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas UDF / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.optimizer.excludedRules", EXCLUDED_OPTIMIZER_RULES)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def tree_buckets(nodes, parallelism_factor: int = 4):
    """Grouping for per-tree pandas passes: hash-bucket ``tree_id`` at
    ``parallelism_factor ×`` session parallelism instead of one pandas
    call per tree.

    ``groupBy("tree_id").applyInPandas`` invokes the Python fn once per
    GROUP — with document-sized trees the per-group Arrow/pandas
    overhead (~4-5 ms) dominates the actual tree work (measured: the
    rewrite engine's reduce pass over 2,500 trees, 12.6 s per-tree
    grouped → ~1 s bucketed).  Bucketing on ``pmod(xxhash64(tree_id),
    k)`` keeps every tree's rows in ONE group (the per-tree fns already
    iterate ``rows_to_trees(...)``), so semantics are unchanged; the
    pandas fn simply receives many trees per call.

    Scale posture: per-bucket memory is forest/(k) ≈ the partition size
    the engine shuffles anyway (k = factor × cores); trees themselves
    stay the atomic unit, so skew is bounded by the largest tree times
    the hash balance, not by any key's popularity.  The width is pinned
    with an explicit repartition on the SAME bucket expression (which
    the groupBy then reuses — no second exchange): AQE's size-based
    coalescing sees a few MB of node rows and would fold the exchange
    into ONE task, serializing every per-tree Python pass (the
    ``_spread_by_tree`` lesson, measured 16-21 s single-task at
    sf0.1)."""
    from pyspark.sql import functions as F

    p = nodes.sparkSession.sparkContext.defaultParallelism
    k = parallelism_factor * p
    bucket = F.pmod(F.xxhash64("tree_id"), F.lit(k))
    return nodes.repartition(p, bucket).groupBy(bucket.alias("__tree_bucket"))


#: Runtime conf flag switching the engine's stage barriers from
#: executor-local checkpoints to reliable (checkpoint-dir) checkpoints.
DURABLE_BARRIERS_CONF = "spark.architxt.durableBarriers"


def enable_durable_barriers(spark: SparkSession, checkpoint_dir: str) -> None:
    """Switch every :func:`stage_barrier` in this session to RELIABLE
    checkpoints written under ``checkpoint_dir`` — the cluster posture.

    ``localCheckpoint`` stores non-replicated executor blocks: fast, but
    after lineage truncation an executor loss fails the job.  Fine on
    local[N] (one process) and for short interactive runs; NOT fine for a
    100-TB run on 1000 preemptible executors.  Point ``checkpoint_dir``
    at durable shared storage (HDFS/S3/GCS) there."""
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    spark.conf.set(DURABLE_BARRIERS_CONF, "true")


def disable_durable_barriers(spark: SparkSession) -> None:
    spark.conf.set(DURABLE_BARRIERS_CONF, "false")


def stage_barrier(df, *, eager: bool = True):
    """Lineage-truncating stage barrier used between pipeline stages
    (quality gate → dedup, BFS levels, rewrite iterations).

    The barrier itself is a deliberate plan shape: it stops Catalyst from
    pushing expensive predicates below an exchange / re-running a
    shingle-heavy stage per consumer, and it truncates iterative lineage
    so plans don't grow unboundedly.  Default = ``localCheckpoint``
    (executor-local, fast).  With durable barriers enabled
    (:func:`enable_durable_barriers`) = reliable ``checkpoint`` to the
    session's checkpoint dir, which survives executor loss."""
    spark = df.sparkSession
    try:
        durable = spark.conf.get(DURABLE_BARRIERS_CONF, "false") == "true"
    except Exception:  # noqa: BLE001 — conf layer unavailable (mock frames)
        durable = False
    if durable:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def cluster_conf(
    *,
    executors: int = 1000,
    executor_cores: int = 4,
    target_partition_mb: int = 256,
) -> dict[str, str]:
    """The documented 100-TB cluster posture as one artifact — the knobs
    this engine assumes when the same code runs on a real cluster.  Feed
    into ``SparkSession.builder.config(map=cluster_conf())``.

    Rationale per key:

    - shuffle partitions ≈ 2× total cores so AQE coalesces DOWN from a
      ceiling rather than splitting up (it can only merge);
    - ``maxPartitionBytes`` sizes scan splits so a task's working set
      fits executor memory with room for shuffle spill;
    - AQE on, with skew-join splitting — the runtime guard for the skew
      this engine cannot know statically;
    - broadcast threshold raised to 256 MB: at 1000 executors a
      shuffle-hash join of a dimension table costs three orders of
      magnitude more network than one broadcast;
    - reliable barriers on (see :func:`enable_durable_barriers`) —
      executor loss is an EXPECTED event at this scale."""
    total_cores = executors * executor_cores
    return {
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": str(target_partition_mb << 20),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(64 << 20),
        "spark.sql.autoBroadcastJoinThreshold": str(256 << 20),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.optimizer.excludedRules": EXCLUDED_OPTIMIZER_RULES,
        DURABLE_BARRIERS_CONF: "true",
    }


def read_parquet_if_exists(spark: SparkSession, path: str):
    """Read a parquet directory, or return ``None`` when the PATH does not
    exist yet (the bootstrap case for append-only sidecar state: band /
    fingerprint / bloom indexes on their first batch).  Only the
    path-missing condition maps to ``None`` — a transient IO error, a
    permission failure, or a corrupt footer PROPAGATES, so a delta merge
    can never mistake "index unreadable right now" for "no index yet"
    and silently re-ingest duplicates."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if exc.getCondition() == "PATH_NOT_FOUND":
            return None
        raise


TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_tables(spark: SparkSession, sf_dir: str, tables=TPCH_TABLES) -> dict:
    """Read the driver-generated parquet tables and register temp views."""
    out = {}
    for t in tables:
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        df.createOrReplaceTempView(t)
        out[t] = df
    return out


#: Engine optimizer profile: ``InferFiltersFromGenerate`` copies the ENTIRE
#: generator-input expression into an inferred ``size(...) > 0 AND
#: isnotnull(...)`` filter.  For the wide struct-array node emitters the
#: array templates are non-null by construction, so the inferred filter
#: never prunes a row but re-evaluates the whole emission expression once
#: extra per input row (~20-25% on the relational loader at sf0.1).  This
#: is declared HERE, at session construction, as the engine's default —
#: operator code never mutates conf on a session it did not create.
EXCLUDED_OPTIMIZER_RULES = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
