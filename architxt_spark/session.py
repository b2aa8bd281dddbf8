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
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def sf_dir(default: str = "/root/testdata/sf0.1") -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


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


def exclude_generate_filter_inference(spark: SparkSession) -> None:
    """Exclude ``InferFiltersFromGenerate`` for this session: the rule
    copies the ENTIRE generator-input expression into an inferred
    ``size(...) > 0 AND isnotnull(...)`` filter and pushes it below
    exchanges.  For our wide struct-array node emitters and interpreted
    shingle chains that triples per-row work and serializes it into the
    pre-shuffle stage; the inferred filter never prunes anything useful on
    these plans."""
    rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
    if rule not in excluded:
        spark.conf.set("spark.sql.optimizer.excludedRules", f"{excluded},{rule}".strip(","))
