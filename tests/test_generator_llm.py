"""Generator + LLM-plumbing tests (``architxt/generator/__init__.py:77-104``,
``architxt/simplification/llm.py``, ``architxt/labelling/__init__.py``)."""

from pyspark.sql import functions as F

from architxt_spark.generator import gen_instance
from architxt_spark.llm import (
    UppercaseGroupNormalizer,
    apply_renaming,
    constrained_batches,
    extract_vocab,
    llm_rewrite,
    normalize_label,
    sanitize_forest,
)
from architxt_spark.plans import schema_from_forest
from architxt_spark.plans.schema import Relation, RelationOrientation, SchemaPlan
from architxt_spark.trees import forest_from_trees, parse_tree, format_tree, rows_to_trees

SCHEMA = SchemaPlan(
    groups={"person": frozenset({"name", "age"}), "city": frozenset({"zip"})},
    relations={Relation("person<->city", "person", "city", RelationOrientation.RIGHT)},
)


def test_gen_instance_counts(spark):
    nodes = gen_instance(spark, SCHEMA, size=10)
    stats = {
        (r["node_type"], r["node_name"]): r["count"]
        for r in nodes.groupBy("node_type", "node_name").count().collect()
    }
    assert stats[("GROUP", "person")] == 20  # own shape + relation shape
    assert stats[("GROUP", "city")] == 20
    assert stats[("REL", "person<->city")] == 10
    assert stats[("COLL", "person")] == 10
    assert stats[("ENT", "name")] == 20
    # leaves are deterministic entity_i strings
    leaf = nodes.filter(F.col("leaf_value").isNotNull()).select("leaf_value").first()[0]
    assert "_" in leaf


def test_gen_instance_valid_and_roundtrips(spark):
    nodes = gen_instance(spark, SCHEMA, size=5)
    inferred = schema_from_forest(nodes, keep_unlabelled=False)
    assert inferred.verify()
    assert inferred.groups == {"person": frozenset({"name", "age"}), "city": frozenset({"zip"})}
    assert {r.name for r in inferred.relations} == {"person<->city"}


def test_constrained_batches_budget():
    items = [(str(i), "x" * 40) for i in range(10)]  # ~10 tokens each
    batches = constrained_batches(items, max_tokens=25)
    assert all(len(b) <= 2 for b in batches)
    assert sum(len(b) for b in batches) == 10


def test_llm_rewrite_normalizes_and_falls_back(spark):
    trees = {
        "t1": parse_tree("(ROOT (GROUP::person (ENT::name alice)))"),
        "t2": parse_tree("(ROOT (GROUP::city (ENT::zip 75)))"),
    }
    nodes = forest_from_trees(spark, trees)
    out = llm_rewrite(nodes, UppercaseGroupNormalizer)
    names = {r["node_name"] for r in out.filter(F.col("node_type") == "GROUP").collect()}
    assert names == {"PERSON", "CITY"}

    class Broken:
        def normalize(self, trees):
            raise RuntimeError("endpoint down")

    out2 = llm_rewrite(nodes, Broken)
    names2 = {r["node_name"] for r in out2.filter(F.col("node_type") == "GROUP").collect()}
    assert names2 == {"person", "city"}  # per-batch fallback to original


def test_sanitize_demotes_invalid(spark):
    trees = {
        "ok": parse_tree("(ROOT (GROUP::g (ENT::a x) (ENT::b y)))"),
        "badg": parse_tree("(ROOT (GROUP::g (ENT::a x) (GROUP::inner (ENT::c z))))"),
        "badr": parse_tree("(ROOT (REL::r (GROUP::g (ENT::a x))))"),
    }
    nodes = forest_from_trees(spark, trees)
    out = sanitize_forest(nodes)
    bad = out.filter(F.col("node_name").startswith("UNDEF_"))
    assert bad.count() == 2
    ok_groups = out.filter((F.col("node_type") == "GROUP") & (F.col("tree_id") == "ok")).count()
    assert ok_groups == 1


def test_extract_vocab_fuzzy_merge(spark):
    trees = {
        f"t{i}": parse_tree(f"(ROOT (GROUP::{name} (ENT::a x)))")
        for i, name in enumerate(["Patient", "patients", "patient", "Drug", "drug", "city"])
    }
    nodes = forest_from_trees(spark, trees)
    vocab = dict(extract_vocab(nodes, min_support=2, similarity=0.8))
    assert vocab.get("patient", 0) + vocab.get("patients", 0) == 3
    assert vocab.get("drug") == 2
    assert "city" not in vocab  # below min_support


def test_apply_renaming(spark):
    nodes = forest_from_trees(spark, {"t": parse_tree("(ROOT (GROUP::g (ENT::a x)))")})
    out = apply_renaming(nodes, {"g": "better_name"}, "GROUP")
    assert out.filter(F.col("node_name") == "better_name").count() == 1


def test_normalize_label():
    assert normalize_label("  My Région Name ") == "my_region_name"
