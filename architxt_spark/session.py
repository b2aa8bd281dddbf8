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
