"""Property-graph loader (``read_cypher`` parity — ``loader/cypher.py:17-135``)."""

from pyspark.sql import functions as F

from architxt_spark.sources.graph import get_root_nodes, read_graph


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "id string, label string, name string")


def _rels(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, rel_type string, weight string")


def test_roots_are_unreferenced_nodes(spark):
    nodes = _nodes(spark, [("a", "A", "1"), ("b", "B", "2"), ("c", "C", "3")])
    rels = _rels(spark, [("a", "b", "T", None), ("b", "c", "T", None)])
    roots = [r["id"] for r in get_root_nodes(nodes, rels).collect()]
    assert roots == ["a"]


def test_cycle_falls_back_to_max_out_degree(spark):
    nodes = _nodes(spark, [("a", "A", "1"), ("b", "B", "2")])
    rels = _rels(spark, [("a", "b", "T", None), ("b", "a", "T", None), ("a", "a", "S", None)])
    roots = [r["id"] for r in get_root_nodes(nodes, rels).collect()]
    assert roots == ["a"]  # out-degree 2 beats 1
    out = read_graph(nodes, rels)
    # one tree; the back-edge b->a and self-loop a->a are skipped (visited)
    assert out.select("tree_id").distinct().count() == 1
    rels_out = out.filter(F.col("node_type") == "REL").select("node_name").collect()
    assert [r["node_name"] for r in rels_out] == ["A<->B"]


def test_diamond_visits_node_once_deterministically(spark):
    nodes = _nodes(spark, [("a", "A", "1"), ("b", "B", "2"), ("c", "C", "3"), ("x", "X", "4")])
    rels = _rels(
        spark,
        [("a", "b", "T", None), ("a", "c", "T", None), ("b", "x", "T", None), ("c", "x", "T", None)],
    )
    out = read_graph(nodes, rels)
    rel_names = sorted(
        r["node_name"] for r in out.filter(F.col("node_type") == "REL").collect()
    )
    # x is reached once: via b (lowest (rel_type, src)), not via c
    assert rel_names == ["A<->B", "A<->C", "B<->X"]
    x_groups = out.filter((F.col("node_type") == "GROUP") & (F.col("node_name") == "X"))
    assert x_groups.count() == 2  # standalone + one REL copy


def test_attributed_edge_is_reified(spark):
    nodes = _nodes(spark, [("a", "A", "alice"), ("b", "B", "bob")])
    rels = _rels(spark, [("a", "b", "KNOWS", "0.9")])
    out = read_graph(nodes, rels)
    rel_names = sorted(r["node_name"] for r in out.filter(F.col("node_type") == "REL").collect())
    assert rel_names == ["A<->KNOWS", "KNOWS<->B"]
    knows = out.filter((F.col("node_type") == "GROUP") & (F.col("node_name") == "KNOWS"))
    assert knows.count() == 3  # standalone + one copy per REL
    # edge property ends up as an ENT leaf under the reified group
    w = out.filter((F.col("node_type") == "ENT") & (F.col("node_name") == "weight"))
    assert w.count() == 3
    leaf = out.filter(F.col("leaf_value") == "0.9")
    assert leaf.count() == 3
    # copies share the edge OID
    oids = {r["metadata"]["oid"] for r in knows.collect()}
    assert len(oids) == 1


def test_plain_edge_single_rel_with_copies(spark):
    nodes = _nodes(spark, [("a", "A", "alice"), ("b", "B", "bob")])
    rels = _rels(spark, [("a", "b", "KNOWS", None)])
    out = read_graph(nodes, rels)
    rel = out.filter(F.col("node_type") == "REL").collect()
    assert len(rel) == 1 and rel[0]["node_name"] == "A<->B"
    assert rel[0]["metadata"]["type"] == "KNOWS"
    # ROOT children: group A, group B, REL — positions 0,1,2
    top = out.filter(F.size("path") == 1).orderBy("pos").select("node_type", "node_name").collect()
    assert [(r["node_type"], r["node_name"]) for r in top] == [
        ("GROUP", "A"),
        ("GROUP", "B"),
        ("REL", "A<->B"),
    ]


def test_sample_and_max_depth(spark):
    nodes = _nodes(spark, [(c, "N", c) for c in "abcdef"])
    rels = _rels(spark, [("a", "b", "T", None), ("b", "c", "T", None), ("c", "d", "T", None)])
    # roots: a, e, f → sample keeps the 2 lowest ids
    out = read_graph(nodes, rels, sample=2)
    assert out.select("tree_id").distinct().count() == 2
    shallow = read_graph(nodes, rels, max_depth=1)
    # a's tree stops after a->b: no b->c edge
    assert shallow.filter(F.col("node_type") == "REL").count() == 1
