"""Instance-mode clustering (``TreeClusterer.fit`` with ``schema_only=False``,
reference ``architxt/similarity.py:92-168,200-368``): context-weighted
similarity, representative collapse, single-linkage components at τ."""

import pytest

from architxt_spark.similarity import (
    cluster_forest,
    cluster_forest_instance,
    instance_similarity,
)
from architxt_spark.trees import forest_from_trees, parse_tree


def _lvl(ents, label=None):
    return {"label": label, "ents": sorted(ents)}


def test_instance_similarity_reference_doctest():
    """Reference doctest: similarity(t[0], t[1], metric=jaccard) == 0.5555…
    for (S (X (ENT::person) (ENT::fruit)) (Y (ENT::person) (ENT::animal)))."""
    # X and Y are untyped; level 0 = the nodes themselves, level 1 = S
    s_ents = {"person", "fruit", "animal"}
    ctx_x = [_lvl({"person", "fruit"}), _lvl(s_ents)]
    ctx_y = [_lvl({"person", "animal"}), _lvl(s_ents)]
    # level0 jaccard = 1/3, level1 shares the SAME S instance — the
    # reference scores 1.0 there via the oid check; our ctx carries no oid,
    # but identical ent sets give jaccard 1.0 identically
    assert instance_similarity(ctx_x, ctx_y, "jaccard") == pytest.approx(
        (1 / 3 + 0.5 * 1.0) / 1.5
    )
    assert instance_similarity(ctx_x, ctx_y, "jaccard") == pytest.approx(0.5555555555)


def test_instance_similarity_shortcuts():
    # disjoint level-0 entity sets => 0.0 regardless of context
    assert instance_similarity([_lvl({"a"})], [_lvl({"b"})]) == 0.0
    # equal typed labels at level 0 => 1.0 outright
    x = [_lvl({"a"}, "GROUP::g"), _lvl({"a", "zz"})]
    y = [_lvl({"a", "b"}, "GROUP::g"), _lvl({"qq", "a", "b"})]
    assert instance_similarity(x, y) == 1.0
    # typed-label equality also scores 1.0 per LEVEL inside the walk
    x = [_lvl({"a"}), _lvl({"a", "x"}, "REL::r")]
    y = [_lvl({"a"}), _lvl({"a", "y"}, "REL::r")]
    assert instance_similarity(x, y, "jaccard") == 1.0
    # empty context => 0.0
    assert instance_similarity([], [_lvl({"a"})]) == 0.0


def test_instance_similarity_depth_cap():
    deep_x = [_lvl({"a"})] + [_lvl({"a", "b"})] * 9
    deep_y = [_lvl({"a"})] + [_lvl({"a", "c"})] * 9
    # only MAX_SIM_CTX_DEPTH=5 levels contribute
    w = [2**-i for i in range(5)]
    expected = (w[0] * 1.0 + sum(wi * (1 / 3) for wi in w[1:])) / sum(w)
    assert instance_similarity(deep_x, deep_y, "jaccard") == pytest.approx(expected)


@pytest.fixture
def hetero_forest(spark):
    """B-shaped subtrees share signature {doc_id, n_chars} but live under
    disjoint-ish ancestor contexts: signature mode merges them, instance
    mode separates them at tau=0.8."""
    trees = {}
    for i in range(6):
        trees[f"e{i}"] = parse_tree(
            "(ROOT (W (A (ENT::lang en) (ENT::source s) (ENT::f1 v)"
            f" (B (ENT::doc_id {i}) (ENT::n_chars 10)))))"
        )
    for i in range(4):
        trees[f"o{i}"] = parse_tree(
            f"(ROOT (C (ENT::extra x) (B (ENT::doc_id {100 + i}) (ENT::n_chars 10))))"
        )
    return forest_from_trees(spark, trees)


def test_instance_vs_signature_disagreement(spark, hetero_forest):
    inst = cluster_forest_instance(hetero_forest, tau=0.8, metric="jaccard")
    sig = cluster_forest(hetero_forest, tau=0.8, metric="jaccard")
    inst_supports = sorted({r["support"] for r in inst.collect()})
    sig_supports = sorted({r["support"] for r in sig.collect()})
    # instance mode: B-even (6) and B-odd (4) are separate clusters; the
    # even blob ROOT/W/A has 18 members, the odd blob ROOT/C has 8
    assert inst_supports == [4, 6, 8, 18]
    # signature mode merges the B's into one 10-member cluster
    assert sig_supports == [8, 10, 18]


def test_instance_mode_ami_beats_signature_on_hetero(spark, hetero_forest):
    """Quality comparison per SURVEY §7.4: cluster ids are nondeterministic
    by design, so compare AMI against the analytic ground truth on the
    contested (B-shaped) nodes — instance mode must score strictly higher."""
    from architxt_spark.metrics import cluster_ami

    truth = {}
    for i in range(6):
        truth[f"e{i}:0.0.3"] = "b_even"
    for i in range(4):
        truth[f"o{i}:0.1"] = "b_odd"

    def ami(asg_df):
        got = {r["node_id"]: r["cluster_name"] for r in asg_df.collect()}
        pairs = [(truth[n], got[n]) for n in truth if n in got]
        assert len(pairs) == len(truth)
        return cluster_ami(pairs)

    ami_inst = ami(cluster_forest_instance(hetero_forest, tau=0.8, metric="jaccard"))
    ami_sig = ami(cluster_forest(hetero_forest, tau=0.8, metric="jaccard"))
    assert ami_inst == pytest.approx(1.0)
    assert ami_sig < ami_inst


def test_rep_collapse_is_instance_bounded(spark):
    """1000 identical trees must reach the driver as ONE representative per
    distinct (typed_label, ctx) — support still counts every instance."""
    from architxt_spark.similarity import _CTX_FP_EXPR, candidate_contexts
    from pyspark.sql import functions as F

    trees = {
        f"t{i}": parse_tree("(ROOT (GROUP::person (ENT::name x) (ENT::age 1)))")
        for i in range(1000)
    }
    nodes = forest_from_trees(spark, trees)
    cands = candidate_contexts(nodes).withColumn("ctx_fp", F.expr(_CTX_FP_EXPR))
    n_reps = cands.groupBy("typed_label", "ctx_fp").count().count()
    assert n_reps == 2  # ROOT shape + GROUP::person shape
    asg = cluster_forest_instance(nodes)
    sup = {r["support"] for r in asg.collect()}
    assert sup == {2000}  # ROOT and GROUP merge (GROUP ctx ⊂ ROOT ctx ⇒ sim 1.0 at level 0? no — they cluster by τ)


def test_typed_label_pre_union(spark):
    """Two GROUP::g instances under completely different contexts still
    land in one cluster: equal typed labels score 1.0 outright."""
    trees = {
        "a": parse_tree("(ROOT (X (ENT::p 1) (ENT::q 2) (GROUP::g (ENT::k 1) (ENT::v 2))))"),
        "b": parse_tree("(ROOT (GROUP::g (ENT::k 9) (ENT::v 8)))"),
    }
    nodes = forest_from_trees(spark, trees)
    asg = cluster_forest_instance(nodes, tau=0.99)
    by_node = {r["node_id"]: r["cluster_name"] for r in asg.collect()}
    assert by_node["a:0.2"] == by_node["b:0"]
    # reference naming: modal typed member label + ordinal
    assert by_node["a:0.2"].startswith("g_")


def _chain_forest(spark):
    """Sliding-window entity sets t_i..t_{i+7} (shift 1): adjacent windows
    score jaccard-weighted sim ~0.785 (>= tau=0.7), skip-one ~0.61 (< tau).
    Single-linkage chains all four into one component; the HDBSCAN cut
    (mutual reachability at eps=1-tau) detaches the endpoints, whose
    second-nearest instance lies beyond eps.  The (ENT::z) duplicate child
    keeps ROOT out of the candidate set so every window is a singleton
    instance."""
    trees = {}
    for w, name in enumerate("abcd"):
        ents = " ".join(f"(ENT::t{w + i} v)" for i in range(8))
        trees[name] = parse_tree(
            f"(ROOT (X {ents}) (Y (ENT::z 1) (ENT::z 2)))"
        )
    return forest_from_trees(spark, trees)


def test_hdbscan_cut_splits_chained_component(spark):
    nodes = _chain_forest(spark)
    single = cluster_forest_instance(nodes, tau=0.7, metric="jaccard", refine=False)
    refined = cluster_forest_instance(nodes, tau=0.7, metric="jaccard")

    s_rows = single.collect()
    assert {r["support"] for r in s_rows} == {4}  # one over-merged chain
    assert len(s_rows) == 4

    r_rows = refined.collect()
    # endpoints a and d shed (support-1 singletons dropped); b+c survive
    assert len(r_rows) == 2
    assert {r["support"] for r in r_rows} == {2}
    kept_trees = {r["node_id"].split(":", 1)[0] for r in r_rows}
    assert kept_trees == {"b", "c"}
    assert len({r["cluster_name"] for r in r_rows}) == 1


def test_hdbscan_cut_respects_multiplicity(spark):
    """A rep standing for >=2 identical instances has core distance ~0:
    dense blobs keep their within-eps neighbours, so a pendant window that
    touches a duplicated window survives the cut."""
    trees = {}
    for w, name in enumerate("abcd"):
        ents = " ".join(f"(ENT::t{w + i} v)" for i in range(8))
        trees[name] = parse_tree(f"(ROOT (X {ents}) (Y (ENT::z 1) (ENT::z 2)))")
    # duplicate the endpoint windows: a2 == a, d2 == d
    for name, src in (("a2", 0), ("d2", 3)):
        ents = " ".join(f"(ENT::t{src + i} v)" for i in range(8))
        trees[name] = parse_tree(f"(ROOT (X {ents}) (Y (ENT::z 1) (ENT::z 2)))")
    nodes = forest_from_trees(spark, trees)
    refined = cluster_forest_instance(nodes, tau=0.7, metric="jaccard")
    rows = refined.collect()
    # duplicated endpoints now have core 0; every mr edge along the chain
    # is <= eps, so the whole 6-instance chain stays one cluster
    assert len(rows) == 6
    assert {r["support"] for r in rows} == {6}


def test_rep_budget_guard_degrades_to_signature_mode(spark):
    """Past rep_budget distinct (typed_label, ctx) reps the operator must
    warn and fall back to signature-mode clustering rather than collect an
    unbounded rep set onto the driver."""
    import warnings

    trees = {
        f"t{i}": parse_tree(f"(ROOT (X (ENT::a v) (ENT::b v) (ENT::u{i} v)))")
        for i in range(12)
    }
    nodes = forest_from_trees(spark, trees)

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = cluster_forest_instance(nodes, tau=0.7, metric="jaccard", rep_budget=5)
        rows = out.collect()
    assert any("signature-mode" in str(w.message) for w in caught)

    expected = cluster_forest(nodes, tau=0.7, metric="jaccard").collect()
    assert out.columns == ["node_id", "cluster_name", "support"]
    assert sorted((r["node_id"], r["cluster_name"], r["support"]) for r in rows) == sorted(
        (r["node_id"], r["cluster_name"], r["support"]) for r in expected
    )

    # with an adequate budget the same forest stays in instance mode (no warning)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        cluster_forest_instance(nodes, tau=0.7, metric="jaccard").collect()
    assert not any("signature-mode" in str(w.message) for w in caught)
