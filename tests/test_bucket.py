"""ParquetTreeBucket tests — the storage contract subset of the reference's
ZODB bucket suite (``tests/bucket/test_zodb.py``): add/upsert/discard,
transactional batching, generation isolation."""

import pytest
from pyspark.sql import functions as F

from architxt_spark.bucket import ParquetTreeBucket
from architxt_spark.trees import forest_from_trees, parse_tree


@pytest.fixture()
def bucket(spark, tmp_path):
    return ParquetTreeBucket(spark, str(tmp_path / "bucket"))


def _forest(spark, **trees):
    return forest_from_trees(spark, {k: parse_tree(v) for k, v in trees.items()})


def test_empty_bucket(spark, bucket):
    assert len(bucket) == 0
    assert bucket.oids() == []


def test_write_read_roundtrip(spark, bucket):
    bucket.write(_forest(spark, t1="(ROOT (GROUP::g (ENT::a x)))"))
    assert bucket.oids() == ["t1"]
    assert bucket.resolve("t1").count() == 4  # root, group, ent, leaf


def test_upsert_replaces_only_given_trees(spark, bucket):
    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))", t2="(ROOT (ENT::b y))"))
    bucket.upsert(_forest(spark, t2="(ROOT (ENT::b CHANGED) (ENT::c z))"))
    assert sorted(bucket.oids()) == ["t1", "t2"]
    leaves = {
        r["leaf_value"]
        for r in bucket.resolve("t2").filter(F.col("leaf_value").isNotNull()).collect()
    }
    assert leaves == {"CHANGED", "z"}
    # t1 untouched
    assert bucket.resolve("t1").count() == 3


def test_discard(spark, bucket):
    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))", t2="(ROOT (ENT::b y))"))
    bucket.discard(["t1"])
    assert bucket.oids() == ["t2"]


def test_transaction_batches_atomically(spark, bucket):
    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))"))
    with bucket.transaction() as txn:
        txn.upsert(_forest(spark, t2="(ROOT (ENT::b y))"))
        txn.discard(["t1"])
        # nothing applied inside the block
        assert bucket.oids() == ["t1"]
    assert bucket.oids() == ["t2"]


def test_generations_cleaned(spark, bucket, tmp_path):
    import os

    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))"))
    bucket.write(_forest(spark, t1="(ROOT (ENT::a y))"))
    gens = [d for d in os.listdir(bucket.root) if d.startswith("gen=")]
    assert len(gens) == 1  # old generation removed after the pointer flip
