"""Neo4j connector wiring shape contracts (no Neo4j server / connector jar
in this container — reads and writes go through injectable seams; what's
under test is the connector column-contract normalization, the read→BFS
hand-off, and the write option manifests)."""

import pytest
from pyspark.sql import functions as F

from architxt_spark.connectors.neo4j import (
    Neo4jConfig,
    connector_available,
    normalize_nodes,
    normalize_relationships,
    read_cypher_live,
    write_cypher_live,
)


def test_config_options():
    cfg = Neo4jConfig("neo4j://h:7687", username="u", password="p", database="db")
    assert cfg.options() == {
        "url": "neo4j://h:7687",
        "authentication.basic.username": "u",
        "authentication.basic.password": "p",
        "database": "db",
    }


def test_connector_unavailable_raises(spark):
    assert not connector_available(spark)
    with pytest.raises(RuntimeError, match="neo4j-spark-connector"):
        read_cypher_live(spark, Neo4jConfig("neo4j://h"), ["A"], [])


def test_normalize_node_frame(spark):
    raw = spark.createDataFrame(
        [(0, ["Person", "Actor"], "alice", 33)],
        "`<id>` long, `<labels>` array<string>, name string, age long",
    )
    out = normalize_nodes(raw)
    assert out.columns == ["id", "label", "name", "age"]
    row = out.first()
    assert (row["id"], row["label"], row["name"]) == ("0", "Person", "alice")


def test_normalize_relationship_frame(spark):
    raw = spark.createDataFrame(
        [(7, "KNOWS", 0, 1, 2019)],
        "`<rel.id>` long, `<rel.type>` string, `<source.id>` long, "
        "`<target.id>` long, `rel.since` long",
    )
    out = normalize_relationships(raw)
    assert out.columns == ["src", "dst", "rel_type", "since"]
    row = out.first()
    assert (row["src"], row["dst"], row["rel_type"], row["since"]) == ("0", "1", "KNOWS", 2019)


def test_read_cypher_live_via_seam(spark):
    """A fake connector serving raw connector-shaped frames must flow
    through normalization into the BFS loader and yield a forest."""

    def fake_read(options):
        if "labels" in options:
            label = options["labels"].removeprefix(":")
            rows = {"Person": [(0, ["Person"], "alice")], "City": [(1, ["City"], "paris")]}
            return spark.createDataFrame(
                rows[label], "`<id>` long, `<labels>` array<string>, name string"
            )
        assert options["relationship.nodes.map"] == "false"
        return spark.createDataFrame(
            [(5, "LIVES_IN", 0, 1)],
            "`<rel.id>` long, `<rel.type>` string, `<source.id>` long, `<target.id>` long",
        )

    nodes = read_cypher_live(
        spark, Neo4jConfig("neo4j://h"), ["Person", "City"], ["LIVES_IN"], reader=fake_read
    )
    names = {
        (r["node_type"], r["node_name"])
        for r in nodes.select("node_type", "node_name").distinct().collect()
        if r["node_type"]
    }
    assert ("GROUP", "Person") in names
    assert ("GROUP", "City") in names
    assert any(t == "REL" for t, _ in names)


def test_write_cypher_live_manifest(spark):
    """Write path: every group frame goes out keyed on _architxt_oid in
    node mode; every relation frame in keys-strategy relationship mode
    matching endpoint oids."""
    from architxt_spark.plans.schema import Relation, SchemaPlan, schema_from_forest
    from architxt_spark.trees import forest_from_trees, parse_tree

    trees = {
        "t1": parse_tree(
            "(ROOT (REL::a<->b (GROUP::a (ENT::x 1)) (GROUP::b (ENT::y 2))))"
        ),
    }
    nodes = forest_from_trees(spark, trees)
    schema = schema_from_forest(nodes)

    written = []

    def fake_writer(df, options, mode):
        written.append((df.count(), options, mode))

    manifest = write_cypher_live(nodes, schema, Neo4jConfig("neo4j://h"), writer=fake_writer)
    assert set(manifest) == {"node:a", "node:b", "rel:a<->b"}
    assert manifest["node:a"]["labels"] == ":a"
    assert manifest["node:a"]["node.keys"] == "_architxt_oid"
    rel = manifest["rel:a<->b"]
    assert rel["relationship"] == "a_b"
    assert rel["relationship.save.strategy"] == "keys"
    assert rel["relationship.source.labels"] == ":a"
    assert rel["relationship.target.node.keys"] == "_architxt_oid_dst:_architxt_oid"
    assert all(n > 0 for n, _, _ in written)
