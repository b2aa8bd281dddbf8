"""Objective-function metrics: FD confidence, dependency, redundancy,
coverage, clustering agreement, forest statistics.

Reference: ``architxt/metrics.py`` and ``architxt/inspector.py``.  Every
metric here is a pure Spark aggregation (no ProcessPool, no 2^k explosion in
the hot path — see :func:`redundancy_score`'s bounded subsets).
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Collection

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.model import NodeType

#: Cap on the attribute-subset size enumerated by :func:`redundancy_score`.
#: The reference enumerates ALL 2^k column subsets in a ProcessPoolExecutor
#: (``architxt/metrics.py:105-150``) — unbounded at 100 TB.  Pairs/triples
#: dominate the signal; k ≤ 3 keeps the subset count polynomial.
DEFAULT_MAX_SUBSET = 3


def confidence(df: DataFrame, column: str) -> float:
    r"""FD confidence of ``X → column`` (``architxt/metrics.py:25-62``):

    .. math:: \frac{\sum_x \max_y count(X{=}x, Y{=}y)}{N}

    Two-level aggregation — ``groupBy(all).count()`` then
    ``groupBy(antecedent).max(count)`` — fully map-side combinable.
    """
    if column not in df.columns or len(df.columns) == 1:
        return 0.0
    n = df.count()
    if n == 0:
        return 0.0
    antecedents = [c for c in df.columns if c != column]
    total = (
        df.groupBy(*df.columns)
        .count()
        .groupBy(*antecedents)
        .agg(F.max("count").alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    return float(total) / n


def dependency_score(df: DataFrame, attributes: Collection[str]) -> float:
    """Max FD confidence over each attribute as consequent, short-circuiting
    at 1.0 (``architxt/metrics.py:65-95``)."""
    sub = df.select(*attributes)
    best = 0.0
    for col in attributes:
        best = max(best, confidence(sub, col))
        if best == 1.0:
            break
    return best


def redundancy_score(
    df: DataFrame,
    tau: float = 1.0,
    null_threshold: float = 0.8,
    max_subset_size: int = DEFAULT_MAX_SUBSET,
) -> float:
    """Fraction of rows duplicated in ≥1 attribute subset whose dependency
    score ≥ τ (``architxt/metrics.py:105-150``).

    Deviation for scale: subsets are bounded to ``max_subset_size`` columns
    (the reference's 2^k enumeration is infeasible at 100 TB posture; see
    SURVEY §4).  Columns >``null_threshold`` null are dropped first, as in
    the reference.  Per-subset duplicate detection is a window-free
    self-aggregation: rows whose (subset) value combination occurs more than
    once, OR-ed across subsets in ONE pass over the data by computing every
    subset's count in the same aggregation.
    """
    n = df.count()
    if n == 0:
        return 0.0
    null_props = df.select(
        *[F.avg(F.col(c).isNull().cast("double")).alias(c) for c in df.columns]
    ).collect()[0]
    attributes = [c for c in df.columns if null_props[c] <= null_threshold]
    if len(attributes) < 2:
        return 0.0

    subsets = [
        attrs
        for k in range(2, min(len(attributes), max_subset_size) + 1)
        for attrs in combinations(attributes, k)
    ]
    qualifying = [attrs for attrs in subsets if dependency_score(df, attrs) >= tau]
    if not qualifying:
        return 0.0

    # one pass: a row is redundant if any qualifying subset combination
    # repeats; dropna per subset mirrors the reference's .dropna()
    marks = []
    for i, attrs in enumerate(qualifying):
        combo = F.concat_ws("\x1f", *[F.col(c).cast("string") for c in attrs])
        has_null = F.greatest(*[F.col(c).isNull() for c in attrs]) if len(attrs) > 1 else F.col(attrs[0]).isNull()
        key = F.when(~has_null, combo)
        marks.append(key.alias(f"k{i}"))
    keyed = df.select(*marks)
    dup_flags = []
    counted = keyed
    for i in range(len(qualifying)):
        counts_i = keyed.groupBy(f"k{i}").count().withColumnRenamed("count", f"c{i}")
        counted = counted.join(counts_i, on=f"k{i}", how="left")
        dup_flags.append((F.col(f"k{i}").isNotNull()) & (F.col(f"c{i}") > 1))
    redundant = counted.filter(F.greatest(*dup_flags) if len(dup_flags) > 1 else dup_flags[0]).count()
    return redundant / n


def coverage(source_ent_oids: DataFrame, current_ent_oids: DataFrame) -> float:
    """Jaccard of entity-OID sets before/after rewriting
    (``Metrics.coverage``, ``architxt/metrics.py:226-238``).
    Inputs: single-column DataFrames of OIDs."""
    a = source_ent_oids.toDF("oid").distinct()
    b = current_ent_oids.toDF("oid").distinct()
    inter = a.intersect(b).count()
    union = a.union(b).distinct().count()
    # empty-vs-empty is a perfect match (jaccard(∅, ∅) == 1.0 in the
    # reference), not a degenerate zero
    return inter / union if union else 1.0


def entity_oids(nodes: DataFrame) -> DataFrame:
    """Entity OID projection used by :func:`coverage`."""
    return nodes.filter(F.col("node_type") == NodeType.ENT).select(
        F.coalesce(F.col("metadata").getItem("oid"), F.col("node_id")).alias("oid")
    )


def cluster_contingency(
    df: DataFrame, class_col: str, cluster_col
) -> list[tuple[str, str, int]]:
    """Contingency table of two label assignments as sorted
    ``(class, cluster, count)`` triples, aggregated IN SPARK — the
    collect is bounded by ``|classes| × |clusters|`` (tiny), never by
    row count, so AMI/completeness stay driver-cheap at any scale.
    ``cluster_col`` may be a column name or a Column expression."""
    cl = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    rows = (
        df.groupBy(F.col(class_col).alias("__a"), cl.alias("__b"))
        .count()
        .collect()
    )
    return sorted((r["__a"], str(r["__b"]), int(r["count"])) for r in rows)


def cluster_ami(labels: list[tuple[str, str]]) -> float:
    """Adjusted Mutual Information between two label assignments
    (``Metrics.cluster_ami``, ``architxt/metrics.py:240-258``).

    sklearn is unavailable in this environment; this is the standard AMI
    from the contingency table, pure Python, with sklearn's default
    *arithmetic* normalization ``(H(a)+H(b))/2 − EMI`` so values are
    directly comparable to the reference's ``adjusted_mutual_info_score``.
    The pair-list form is for small label lists; at scale aggregate the
    contingency in Spark (:func:`cluster_contingency`) and call
    :func:`cluster_ami_from_counts`.
    """
    from collections import Counter

    joint = Counter(labels)
    return cluster_ami_from_counts(
        sorted((a, b, c) for (a, b), c in joint.items())
    )


def cluster_ami_from_counts(counts: list[tuple[str, str, int]]) -> float:
    """AMI from ``(class, cluster, count)`` contingency triples — the
    scale-safe entry point (SURVEY §2.4's named alternative to per-row
    collects).  Summation order is the sorted triple order, pinned so
    the 6-decimal oracle hash is reproducible across runs."""
    if not counts:
        return 0.0
    from collections import Counter

    a_counts: Counter = Counter()
    b_counts: Counter = Counter()
    joint: dict[tuple[str, str], int] = {}
    for a, b, c in counts:
        a_counts[a] += c
        b_counts[b] += c
        joint[(a, b)] = joint.get((a, b), 0) + c
    n = sum(joint.values())

    def h(counts: Counter) -> float:
        return -sum((c / n) * math.log(c / n) for c in counts.values())

    mi = 0.0
    for (a, b), c in joint.items():
        p = c / n
        mi += p * math.log(p / ((a_counts[a] / n) * (b_counts[b] / n)))

    # expected MI under permutation (hypergeometric model)
    emi = 0.0
    for ai in a_counts.values():
        for bj in b_counts.values():
            nij_min = max(1, ai + bj - n)
            nij_max = min(ai, bj)
            for nij in range(nij_min, nij_max + 1):
                p = (
                    math.exp(
                        _log_comb(bj, nij)
                        + _log_comb(n - bj, ai - nij)
                        - _log_comb(n, ai)
                    )
                )
                if p > 0 and nij > 0:
                    emi += p * (nij / n) * math.log((n * nij) / (ai * bj))
    ha, hb = h(a_counts), h(b_counts)
    denom = (ha + hb) / 2 - emi
    if denom == 0:
        return 1.0 if mi == emi else 0.0
    return (mi - emi) / denom


def _log_comb(n: int, k: int) -> float:
    if k < 0 or k > n:
        return float("-inf")
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def cluster_completeness(labels: list[tuple[str, str]]) -> float:
    """Completeness score (``Metrics.cluster_completeness``,
    ``architxt/metrics.py:260-277``): ``1 − H(K|C)/H(K)`` — all members of
    a class land in the same cluster.  (``1 − H(C|K)/H(C)`` would be
    homogeneity — the other direction.)  Pair-list form; at scale use
    :func:`cluster_contingency` + :func:`cluster_completeness_from_counts`."""
    from collections import Counter

    joint = Counter(labels)
    return cluster_completeness_from_counts(
        sorted((a, b, c) for (a, b), c in joint.items())
    )


def cluster_completeness_from_counts(
    counts: list[tuple[str, str, int]]
) -> float:
    """Completeness from ``(class, cluster, count)`` contingency triples
    — bounded by label-vocabulary size, independent of row count."""
    if not counts:
        return 1.0
    from collections import Counter

    a_counts: Counter = Counter()  # classes
    b_counts: Counter = Counter()  # clusters
    joint: dict[tuple[str, str], int] = {}
    for a, b, c in counts:
        a_counts[a] += c
        b_counts[b] += c
        joint[(a, b)] = joint.get((a, b), 0) + c
    n = sum(joint.values())
    h_k = -sum((c / n) * math.log(c / n) for c in b_counts.values())
    if h_k == 0:
        return 1.0
    h_k_given_c = 0.0
    for (a, _b), c in joint.items():
        h_k_given_c -= (c / n) * math.log(c / a_counts[a])
    return 1.0 - h_k_given_c / h_k


def forest_stats(nodes: DataFrame) -> dict:
    """Streaming forest statistics in ONE aggregation pass
    (``ForestInspector``, ``architxt/inspector.py:16-83``): tree count,
    per-type label counts, avg/max height proxy (max depth), entity counts.
    """
    internal = nodes.filter(F.col("node_name").isNotNull())
    row = internal.agg(
        F.countDistinct("tree_id").alias("n_trees"),
        F.count("*").alias("n_nodes"),
        F.sum((F.col("node_type") == NodeType.ENT).cast("long")).alias("n_entities"),
        F.sum((F.col("node_type") == NodeType.GROUP).cast("long")).alias("n_groups"),
        F.sum((F.col("node_type") == NodeType.REL).cast("long")).alias("n_relations"),
        F.sum((F.col("node_type") == NodeType.COLL).cast("long")).alias("n_collections"),
        F.max("depth").alias("max_depth"),
        F.avg("depth").alias("avg_depth"),
        F.countDistinct(
            F.when(F.col("node_type") == NodeType.ENT, F.col("node_name"))
        ).alias("n_entity_labels"),
    ).collect()[0]
    return {k: row[k] for k in row.asDict()}


def unlabelled_ratio(nodes: DataFrame) -> float:
    """Fraction of internal nodes with no type
    (``Metrics.ratio_*``, ``architxt/metrics.py:340-412``)."""
    internal = nodes.filter(F.col("node_name").isNotNull() & (F.col("node_name") != "ROOT"))
    row = internal.agg(
        F.count("*").alias("n"),
        F.sum(F.col("node_type").isNull().cast("long")).alias("u"),
    ).collect()[0]
    return (row["u"] / row["n"]) if row["n"] else 0.0


def num_productions(nodes: DataFrame) -> int:
    """Distinct grammar productions in the forest (``Metrics.num_productions``,
    ``architxt/metrics.py:340-412``): one distinct-count over
    (parent label, ordered child-label list) — the same aggregation shape as
    schema induction, but counting instead of collecting."""
    from architxt_spark.model import label_col

    children = nodes.filter(F.col("parent_id").isNotNull() & F.col("node_name").isNotNull())
    rhs = (
        children.groupBy("parent_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("pos", label_col("node_type", "node_name").alias("lbl"))
                    )
                ),
                lambda s: s["lbl"],
            ).alias("rhs")
        )
    )
    parents = nodes.select(
        F.col("node_id").alias("parent_id"),
        label_col("node_type", "node_name").alias("lhs"),
    )
    return rhs.join(parents, "parent_id").select("lhs", "rhs").distinct().count()


def mlflow_iteration_logger(mlflow_module=None):
    """Import-gated MLflow binding for :func:`architxt_spark.operators.
    engine.rewrite`'s ``on_iteration`` callback — the reference's
    per-iteration experiment logging (``Metrics.log_to_mlflow``,
    ``architxt/metrics.py:414-473``).

    Returns a callback that maps the rewrite census dict onto the
    reference's metric names and logs them to the ACTIVE run with
    ``step=iteration``; with no active run each call is a no-op (reference
    ``:423-424``).  Parity beyond per-step metrics:

    - the rewrite params dict (``info["params"]``: nb_sentences / tau /
      epoch / min_support / edit_ops) is logged ONCE via ``log_params``
      (reference ``tree_rewriting/__init__.py:109-122``);
    - distinct-label counts and count/distinct ratios per node type plus
      the unlabeled count/ratio (reference ``log_to_mlflow`` metric set);
    - the schema-size series behind the reference's figure is logged per
      iteration as a ``log_table`` artifact when the module supports it.

    mlflow is resolved at construction so a missing package fails at
    wiring time, not mid-rewrite; tests inject a fake through
    ``mlflow_module``.
    """
    if mlflow_module is None:
        import mlflow as mlflow_module  # not in this container — env-gated

    names = {
        "n_nodes": "nodes.count",
        "n_unlabeled": "unlabeled.count",
        "n_ent": "entities.count",
        "n_distinct_ent": "entities.distinct_count",
        "n_group": "groups.count",
        "n_distinct_group": "groups.distinct_count",
        "n_rel": "relations.count",
        "n_distinct_rel": "relations.distinct_count",
        "n_coll": "collections.count",
        "n_distinct_coll": "collections.distinct_count",
        "trees_changed": "rewrite.trees_changed",
    }
    ratios = {
        "entities.ratio": ("n_ent", "n_distinct_ent"),
        "groups.ratio": ("n_group", "n_distinct_group"),
        "relations.ratio": ("n_rel", "n_distinct_rel"),
        "collections.ratio": ("n_coll", "n_distinct_coll"),
        "unlabeled.ratio": ("n_unlabeled", "n_nodes"),
    }
    params_logged = []

    def log(info: dict) -> None:
        if not mlflow_module.active_run():
            return
        step = int(info.get("iteration", 0))
        if not params_logged and info.get("params"):
            mlflow_module.log_params(info["params"])
            params_logged.append(True)
        metrics = {
            name: float(info[key])
            for key, name in names.items()
            if info.get(key) is not None
        }
        for name, (num, den) in ratios.items():
            if info.get(num) is not None and info.get(den) is not None:
                metrics[name] = float(info[num]) / info[den] if info[den] else 0.0
        mlflow_module.log_metrics(metrics, step=step)
        if hasattr(mlflow_module, "log_table"):
            kinds = ["entities", "groups", "relations", "collections"]
            keys = ["n_ent", "n_group", "n_rel", "n_coll"]
            if all(info.get(k) is not None for k in keys):
                mlflow_module.log_table(
                    {
                        "kind": kinds,
                        "count": [int(info[k]) for k in keys],
                        "distinct": [int(info.get(f"n_distinct{k[1:]}", 0)) for k in keys],
                    },
                    artifact_file=f"rewrite/schema_size/{step}.json",
                )

    return log
