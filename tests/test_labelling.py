"""LLM schema-labelling tests (reference ``architxt/labelling/__init__.py``)."""

import pytest

from architxt_spark.labelling import (
    Renaming,
    StubChatModel,
    apply_renamings,
    group_labelling_prompt,
    llm_group_labelling,
    llm_relation_labelling,
    relation_labelling_prompt,
)
from architxt_spark.model import NodeType
from architxt_spark.plans.schema import Relation, SchemaPlan
from architxt_spark.trees import forest_from_trees, format_tree, parse_tree, rows_to_trees


def test_prompt_golden():
    msgs = group_labelling_prompt("Tbl9", ["id", "name"], "No sample data")
    assert msgs[0] == (
        "system",
        "You are a precise data architect. Return ONLY the SNAKE_CASE name "
        "for the database table name. Do not include any other text.",
    )
    assert msgs[2] == ("ai", "user_accounts")  # few-shot anchor
    assert msgs[3][1] == (
        "Sample Data: No sample data\nCurrent Name: Tbl9\n"
        "Attributes: id, name\nSuggested Name:"
    )
    rmsgs = relation_labelling_prompt("users", "orders", "link_1")
    assert rmsgs[3][1] == (
        "Table A: users\nTable B: orders\n"
        "Current Relationship Name: link_1\nSuggested Relationship Name:"
    )


def test_group_labelling_with_samples(spark):
    trees = {
        f"t{i}": parse_tree(f"(ROOT (GROUP::g1 (ENT::id {i}) (ENT::email e{i})))")
        for i in range(8)
    }
    nodes = forest_from_trees(spark, trees)
    schema = SchemaPlan(groups={"g1": frozenset({"id", "email"})}, relations=set())
    renames = llm_group_labelling(schema, StubChatModel(), nodes=nodes, sample_size=3)
    # stub answers with the joined attribute list; post-processing upper-cases
    assert renames == {Renaming(NodeType.GROUP, "g1", "EMAIL_ID")}


def test_relation_labelling_uses_renamed_groups():
    schema = SchemaPlan(
        groups={"g1": frozenset({"a"}), "g2": frozenset({"b"})},
        relations={Relation("r1", "g1", "g2")},
    )
    grp = {Renaming(NodeType.GROUP, "g1", "USERS"), Renaming(NodeType.GROUP, "g2", "ORDERS")}
    rel = llm_relation_labelling(schema, StubChatModel(), group_renames=grp)
    assert rel == {Renaming(NodeType.REL, "r1", "USERS_ORDERS")}


def test_apply_renamings_end_to_end(spark):
    t = parse_tree(
        "(ROOT (REL::r1 (GROUP::g1 (ENT::a 1)) (GROUP::g2 (ENT::b 2))))"
    )
    nodes = forest_from_trees(spark, {"t": t})
    out = apply_renamings(
        nodes,
        [
            Renaming(NodeType.GROUP, "g1", "USERS"),
            Renaming(NodeType.REL, "r1", "USERS_ORDERS"),
        ],
    )
    rebuilt = rows_to_trees([r.asDict() for r in out.collect()])["t"]
    assert format_tree(rebuilt) == (
        "(ROOT (REL::USERS_ORDERS (GROUP::USERS (ENT::a 1)) (GROUP::g2 (ENT::b 2))))"
    )


def test_failing_model_skips_element():
    class Boom:
        def complete(self, messages):
            raise RuntimeError("endpoint down")

    schema = SchemaPlan(groups={"g": frozenset({"x"})}, relations=set())
    assert llm_group_labelling(schema, Boom()) == set()
