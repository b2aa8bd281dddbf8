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
