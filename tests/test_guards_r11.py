"""Round-11 guard tests: the two driver-collect bounds from VERDICT r10 #7.

(a) ``schema_from_forest`` caps its distinct-production collect and raises
    loudly instead of OOMing the driver on label-unbounded forests;
(b) the ``mixture_take*`` widen loops log each margin retry (every retry
    is a full pool re-scan — at 100 TB that's a corpus pass).
"""

import logging

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions.sampling import mixture_take, mixture_take_tokens
from architxt_spark.generator import gen_instance
from architxt_spark.plans import schema_from_forest
from architxt_spark.plans.schema import Relation, RelationOrientation, SchemaPlan

SCHEMA = SchemaPlan(
    groups={"person": frozenset({"name", "age"}), "city": frozenset({"zip"})},
    relations={Relation("person<->city", "person", "city", RelationOrientation.RIGHT)},
)


def test_schema_from_forest_production_budget_raises(spark):
    nodes = gen_instance(spark, SCHEMA, size=10)
    with pytest.raises(RuntimeError, match="distinct productions"):
        schema_from_forest(nodes, production_budget=2)


def test_schema_from_forest_budget_headroom_ok(spark):
    # the same forest under a generous budget infers normally
    nodes = gen_instance(spark, SCHEMA, size=10)
    inferred = schema_from_forest(nodes, keep_unlabelled=False, production_budget=1000)
    assert inferred.verify()


def _pool(spark, n=400):
    return (
        spark.range(n)
        .withColumn("doc_id", F.concat(F.lit("d"), F.col("id")))
        .withColumn("stratum", F.when(F.col("id") % 2 == 0, "en").otherwise("fr"))
        .withColumn("tokens", (F.col("id") % 7 + 1).cast("long"))
    )


def test_mixture_take_logs_widen_retries(spark, caplog):
    pool = _pool(spark)
    # margin < 1 guarantees the first threshold undershoots the target,
    # forcing at least one widen-retry — which must be logged
    with caplog.at_level(logging.WARNING, logger="architxt_spark.functions.sampling"):
        out = mixture_take(pool, "stratum", {"en": 150, "fr": 150}, "doc_id", margin=0.05)
        counts = {r[0]: r[1] for r in out.groupBy("stratum").count().collect()}
    assert counts == {"en": 150, "fr": 150}  # retries never cost exactness
    assert any("margin widened" in r.message for r in caplog.records)


def test_mixture_take_tokens_logs_widen_retries(spark, caplog):
    pool = _pool(spark)
    with caplog.at_level(logging.WARNING, logger="architxt_spark.functions.sampling"):
        out = mixture_take_tokens(
            pool, "stratum", {"en": 300, "fr": 300}, "doc_id", "tokens", margin=0.05
        )
        got = {
            r[0]: r[1]
            for r in out.groupBy("stratum").agg(F.sum("tokens")).collect()
        }
    assert all(v <= 300 for v in got.values())
    assert any("margin widened" in r.message for r in caplog.records)


def test_mixture_take_no_warning_on_first_pass(spark, caplog):
    pool = _pool(spark)
    with caplog.at_level(logging.WARNING, logger="architxt_spark.functions.sampling"):
        out = mixture_take(pool, "stratum", {"en": 10, "fr": 10}, "doc_id", margin=4.0)
        assert out.count() == 20
    assert not [r for r in caplog.records if "margin widened" in r.message]
