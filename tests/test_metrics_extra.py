"""Cluster-agreement metric tests (``architxt/metrics.py:240-277``)."""

import math

from architxt_spark.metrics import cluster_ami, cluster_completeness


def test_ami_perfect_agreement():
    labels = [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")]
    assert math.isclose(cluster_ami(labels), 1.0, abs_tol=1e-9)
    assert math.isclose(cluster_completeness(labels), 1.0, abs_tol=1e-9)


def test_ami_no_agreement_is_low():
    # one cluster on one side, split on the other → completeness 1, AMI ~0
    labels = [("a", "x"), ("a", "y"), ("a", "x"), ("a", "y")]
    assert cluster_ami(labels) <= 0.01


def test_completeness_merge_preserving():
    # every 'true' class fully inside one predicted cluster → completeness 1
    labels = [("a", "x"), ("a", "x"), ("b", "x"), ("b", "x")]
    assert math.isclose(cluster_completeness(labels), 1.0, abs_tol=1e-9)
