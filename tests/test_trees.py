"""Tree codec tests — mirror the reference's doctest examples
(``architxt/tree.py:316-342,1128-1183,1255-1333``)."""

import json

from architxt_spark.trees import (
    PyTree,
    format_tree,
    forest_from_trees,
    leaves_df,
    node_text,
    parse_tree,
    rows_to_trees,
    tree_from_json,
    tree_to_json,
    tree_to_rows,
)


def test_parse_format_roundtrip():
    s = "(S (X xxx) (Y yyy))"
    assert format_tree(parse_tree(s)) == s


def test_labels_and_leaves():
    t = parse_tree("(S (ENT::person Alice) (VP (V runs) fast))")
    assert t.label == "S" and t.node_type is None
    ent = t.children[0]
    assert ent.node_type == "ENT" and ent.node_name == "person"
    assert t.leaves() == ["Alice", "runs", "fast"]


def test_url_quoted_leaves():
    t = PyTree("X", ["a b"])
    s = format_tree(t)
    assert s == "(X a%20b)"
    assert parse_tree(s).leaves() == ["a b"]


def test_rows_roundtrip_mixed_children():
    t = parse_tree("(S (ENT::p Alice) (VP (V runs) fast) tail)")
    rows = tree_to_rows(t, "t1")
    back = rows_to_trees(rows)["t1"]
    assert format_tree(back) == format_tree(t)


def test_json_roundtrip():
    t = parse_tree("(ROOT (GROUP::g (ENT::a x) (ENT::b y)))")
    j = tree_to_json(t)
    assert j["type"] is None and j["name"] == "ROOT"
    assert j["children"][0]["type"] == "GROUP"
    assert format_tree(tree_from_json(json.loads(json.dumps(j)))) == format_tree(t)


def test_forest_df_and_projections(spark):
    trees = [parse_tree("(S (ENT::p Alice) (ENT::q Bob))"), parse_tree("(S (ENT::p Carol))")]
    nodes = forest_from_trees(spark, trees)
    assert nodes.count() == 3 + 2 + 3  # roots + ents + leaves
    texts = {r["tree_id"]: r["text"] for r in leaves_df(nodes).collect()}
    assert texts == {"0": "Alice Bob", "1": "Carol"}
    nt = {r["node_id"]: r["text"] for r in node_text(nodes).collect()}
    assert "Alice" in nt.values() and "Carol" in nt.values()


def test_leaf_positions_and_shape_predicates(spark):
    from architxt_spark.trees import (
        forest_from_trees,
        has_entity_child,
        has_unlabelled_nodes,
        leaf_positions,
        parse_tree,
    )

    t = parse_tree("(ROOT (GROUP::g (ENT::a x) (ENT::b y)) (u (ENT::c z)))")
    nodes = forest_from_trees(spark, {"t1": t})
    lp = {r["leaf_index"]: r["path"] for r in leaf_positions(nodes).collect()}
    assert lp == {0: [0, 0, 0], 1: [0, 1, 0], 2: [1, 0, 0]}
    hec = {r["node_id"]: r["has_entity_child"] for r in has_entity_child(nodes).collect()}
    group_id = nodes.filter("node_name = 'g'").first()["node_id"]
    root_id = nodes.filter("node_name = 'ROOT'").first()["node_id"]
    assert hec[group_id] is True and hec[root_id] is False
    hu = has_unlabelled_nodes(nodes).first()
    assert hu["has_unlabelled"] is True  # the 'u' node

    t2 = parse_tree("(ROOT (GROUP::g (ENT::a x)))")
    nodes2 = forest_from_trees(spark, {"t2": t2})
    assert has_unlabelled_nodes(nodes2).first()["has_unlabelled"] is False


def test_schema_union():
    from architxt_spark.plans.schema import Relation, SchemaPlan

    a = SchemaPlan(
        productions={"GROUP::g": {("ENT::a",)}},
        groups={"g": frozenset({"a"})},
        relations={Relation("r", "g", "h")},
    )
    b = SchemaPlan(
        productions={"GROUP::g": {("ENT::b",)}, "GROUP::h": {("ENT::c",)}},
        groups={"g": frozenset({"b"}), "h": frozenset({"c"})},
        relations={Relation("r2", "g", "h")},
    )
    u = a | b
    assert u.groups == {"g": frozenset({"a", "b"}), "h": frozenset({"c"})}
    assert u.productions["GROUP::g"] == {("ENT::a",), ("ENT::b",)}
    assert {r.name for r in u.relations} == {"r", "r2"}
    # inputs unchanged
    assert a.groups["g"] == frozenset({"a"})


def test_windowed_shuffle_bounded_displacement(spark):
    from architxt_spark.llm import windowed_shuffle, windowed_shuffle_df

    items = list(range(100))
    out = windowed_shuffle(items, window_size=10, seed=1)
    assert sorted(out) == items and out != items
    assert all(abs(v - i) < 10 for i, v in enumerate(out))
    assert out == windowed_shuffle(items, window_size=10, seed=1)  # deterministic

    from architxt_spark.trees import forest_from_trees, parse_tree

    trees = {f"t{i:02d}": parse_tree("(ROOT (ENT::a x))") for i in range(20)}
    nodes = forest_from_trees(spark, trees)
    shuffled = windowed_shuffle_df(nodes, window_size=5, seed=2)
    assert shuffled.count() == nodes.count()
    assert set(shuffled.columns) == set(nodes.columns)
