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


def test_transaction_aborts_on_exception(spark, bucket):
    """A failed transaction leaves the prior generation current and
    readable; staged mutations never reach storage (reference
    transaction-manager abort semantics)."""
    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))"))
    with pytest.raises(RuntimeError, match="boom"):
        with bucket.transaction() as txn:
            txn.upsert(_forest(spark, t2="(ROOT (ENT::b y))"))
            txn.discard(["t1"])
            raise RuntimeError("boom")
    assert bucket.oids() == ["t1"]
    assert bucket.resolve("t1").count() == 3
    # the bucket is usable again after the abort
    with bucket.transaction() as txn:
        txn.upsert(_forest(spark, t3="(ROOT (ENT::c z))"))
    assert sorted(bucket.oids()) == ["t1", "t3"]


def test_transaction_savepoint_rollback(spark, bucket):
    """Mutations staged after a savepoint roll back; mutations before it
    survive the commit (``zodb.py`` savepoint semantics)."""
    bucket.write(_forest(spark, t1="(ROOT (ENT::a x))"))
    with bucket.transaction() as txn:
        txn.upsert(_forest(spark, t2="(ROOT (ENT::b y))"))
        sp = txn.savepoint()
        txn.discard(["t1"])
        txn.upsert(_forest(spark, t3="(ROOT (ENT::c z))"))
        sp.rollback()
    assert sorted(bucket.oids()) == ["t1", "t2"]


def test_transaction_savepoint_invalidated_by_earlier_rollback(spark, bucket):
    with bucket.transaction() as txn:
        sp1 = txn.savepoint()
        txn.upsert(_forest(spark, t1="(ROOT (ENT::a x))"))
        sp2 = txn.savepoint()
        sp1.rollback()
        with pytest.raises(ValueError, match="invalidated"):
            sp2.rollback()
    assert bucket.oids() == []


def test_nested_transaction_joins_outer(spark, bucket):
    """Opening a transaction inside an active one joins it (the
    reference's AlreadyInTransaction branch): one commit at outer exit."""
    with bucket.transaction() as outer:
        outer.upsert(_forest(spark, t1="(ROOT (ENT::a x))"))
        with bucket.transaction() as inner:
            inner.upsert(_forest(spark, t2="(ROOT (ENT::b y))"))
            assert inner is outer
            assert bucket.oids() == []  # nothing applied at inner exit
        assert bucket.oids() == []
    assert sorted(bucket.oids()) == ["t1", "t2"]
