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


def test_entity_cluster_labels_ami_end_to_end(spark):
    """entity_cluster_labels + cluster_ami: clustering two structurally
    distinct forests must agree perfectly with the table-of-origin labels."""
    from pyspark.sql import functions as F

    from architxt_spark.metrics import cluster_ami
    from architxt_spark.similarity import entity_cluster_labels
    from architxt_spark.sources.documents import row_trees

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    nat = spark.read.parquet("/root/testdata/sf0.001/nation.parquet").select(
        "n_nationkey", "n_name"
    )
    nodes = row_trees(docs, "documents", ["doc_id"]).unionByName(
        row_trees(nat, "nation", ["n_nationkey"])
    )
    labels_df = entity_cluster_labels(nodes)
    ents = nodes.filter(F.col("node_type") == "ENT").select(
        F.col("node_id").alias("ent_node_id"),
        F.when(F.col("node_name").startswith("n_"), "nation").otherwise("documents").alias("truth"),
    )
    pairs = [
        (r["truth"], r["cluster_name"])
        for r in labels_df.join(ents, "ent_node_id").collect()
    ]
    assert len(pairs) > 100
    assert cluster_ami(pairs) > 0.99


def test_num_productions(spark):
    from architxt_spark.metrics import num_productions
    from architxt_spark.trees import forest_from_trees, parse_tree

    trees = {
        "t1": parse_tree("(ROOT (GROUP::g (ENT::a x) (ENT::b y)))"),
        "t2": parse_tree("(ROOT (GROUP::g (ENT::a z) (ENT::b w)))"),  # same shape
        "t3": parse_tree("(ROOT (GROUP::h (ENT::a q)))"),
    }
    nodes = forest_from_trees(spark, trees)
    # productions: ROOT->GROUP::g, GROUP::g->(ENT::a,ENT::b), ENT::a->leaf?  leaves
    # have null name so ENT productions count once per label set... leaves are
    # excluded (node_name null), so: ROOT->g, g->(a,b), ROOT->h, h->(a) = 4
    assert num_productions(nodes) == 4


def test_mlflow_iteration_logger_with_fake_module(spark):
    """The binding logs reference-named metrics per iteration step to the
    active run, no-ops without one, and wires into rewrite()'s callback."""
    from architxt_spark.metrics import mlflow_iteration_logger

    class FakeMlflow:
        def __init__(self):
            self.run = None
            self.logged = []
            self.params = []
            self.tables = []

        def active_run(self):
            return self.run

        def log_metrics(self, metrics, step=None):
            self.logged.append((step, dict(metrics)))

        def log_params(self, params):
            self.params.append(dict(params))

        def log_table(self, data, artifact_file=None):
            self.tables.append((artifact_file, data))

    fake = FakeMlflow()
    cb = mlflow_iteration_logger(fake)

    cb({"iteration": 0, "n_nodes": 10, "n_ent": 4, "trees_changed": 2})
    assert fake.logged == []  # no active run -> no-op

    fake.run = object()
    cb({"iteration": 3, "n_nodes": 10, "n_ent": 4, "n_group": 1,
        "n_rel": 0, "n_coll": None, "trees_changed": 2, "operation": "find_subgroups"})
    assert len(fake.logged) == 1
    step, metrics = fake.logged[0]
    assert step == 3
    assert metrics == {
        "nodes.count": 10.0,
        "entities.count": 4.0,
        "groups.count": 1.0,
        "relations.count": 0.0,
        "rewrite.trees_changed": 2.0,
    }
    assert fake.tables == []  # incomplete census -> no schema-size table

    # end-to-end: rewrite() drives the callback once per iteration; the
    # run params log exactly once, the schema-size figure data per step
    from architxt_spark.operators.engine import rewrite
    from architxt_spark.trees import forest_from_trees, parse_tree

    trees = {
        f"t{i}": parse_tree("(ROOT (X (ENT::a 1) (ENT::b 2)))") for i in range(4)
    }
    rewrite(forest_from_trees(spark, trees), epoch=2, on_iteration=cb)
    assert len(fake.logged) >= 2
    assert all(m["nodes.count"] > 0 for _, m in fake.logged[1:])
    assert len(fake.params) == 1
    p = fake.params[0]
    assert p["tau"] == 0.7 and p["nb_sentences"] == 4 and "edit_ops" in p
    assert len(fake.tables) == len(fake.logged) - 1
    art, data = fake.tables[0]
    assert art == "rewrite/schema_size/0.json"
    assert data["kind"] == ["entities", "groups", "relations", "collections"]
    assert data["count"][0] > 0  # entities present
    # the fuller reference metric set: distinct counts + ratios
    last = fake.logged[-1][1]
    assert "entities.distinct_count" in last and "entities.ratio" in last
    assert "unlabeled.ratio" in last


def test_mlflow_log_clustering_artifacts(spark):
    """Figure parity for TreeClusterer.mlflow_plot: the cluster census is
    always logged as a table artifact; with a matplotlib-like module and
    log_figure available, a figure artifact lands too; no active run is a
    no-op."""
    from architxt_spark.similarity import mlflow_log_clustering

    clusters = spark.createDataFrame(
        [("n1", "person_1"), ("n2", "person_1"), ("n3", "city_2")],
        ["node_id", "cluster_name"],
    )

    class FakeMlflow:
        def __init__(self):
            self.run = None
            self.tables = []
            self.figures = []

        def active_run(self):
            return self.run

        def log_table(self, data, artifact_file=None):
            self.tables.append((artifact_file, data))

        def log_figure(self, fig, artifact_file):
            self.figures.append((artifact_file, fig))

    class FakeAx:
        def barh(self, *a):
            pass

        def invert_yaxis(self):
            pass

        def set_xlabel(self, *a):
            pass

        def set_title(self, *a):
            pass

    class FakePlt:
        def subplots(self, figsize=None):
            return "fig", FakeAx()

        def close(self, fig):
            pass

    fake = FakeMlflow()
    mlflow_log_clustering(clusters, "clustering/3", mlflow_module=fake, plt_module=FakePlt())
    assert fake.tables == [] and fake.figures == []  # no active run

    fake.run = object()
    mlflow_log_clustering(clusters, "clustering/3", mlflow_module=fake, plt_module=FakePlt())
    assert fake.tables == [
        ("clustering/3/condensed_tree.json", {"cluster": ["person_1", "city_2"], "size": [2, 1]})
    ]
    assert fake.figures == [("clustering/3/condensed_tree.svg", "fig")]

    # without matplotlib (plt injection refused by import): table only
    fake2 = FakeMlflow()
    fake2.run = object()
    mlflow_log_clustering(clusters, "c", mlflow_module=fake2)
    assert len(fake2.tables) == 1 and fake2.figures == []


def test_contingency_counts_match_pair_lists(spark):
    # the scale-safe path (Spark-side contingency + *_from_counts) must
    # agree with the pair-list form to the full float, not just 6dp
    from architxt_spark.metrics import (
        cluster_ami,
        cluster_ami_from_counts,
        cluster_completeness,
        cluster_completeness_from_counts,
        cluster_contingency,
    )

    rows = [("A", 0), ("A", 1), ("B", 1), ("B", 1), ("C", 2), ("A", 0)] * 7
    labels = [(a, str(b)) for a, b in rows]
    df = spark.createDataFrame(rows, "cls string, cl int")
    counts = cluster_contingency(df, "cls", "cl")
    assert sum(c for _, _, c in counts) == len(rows)
    assert cluster_ami_from_counts(counts) == cluster_ami(labels)
    assert (
        cluster_completeness_from_counts(counts)
        == cluster_completeness(labels)
    )
    assert cluster_ami_from_counts([]) == 0.0
    assert cluster_completeness_from_counts([]) == 1.0
