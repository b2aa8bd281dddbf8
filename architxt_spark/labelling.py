"""LLM schema labelling (``architxt/labelling/__init__.py:20-163``).

The reference builds langchain chat prompts — a system instruction, one
few-shot exchange, then the task — and asks a chat model to rename each
schema GROUP (as a database table name) and each REL (as a relationship
name), grounding group prompts with up to ``sample_size`` sample rows from
the extracted dataset.  No model endpoint exists in this container, so the
model boundary is the :class:`ChatModel` protocol; :class:`StubChatModel`
is the deterministic stand-in (mirrors the repo-wide Normalizer/Parser
pattern).  Everything around the boundary — prompt text, sampling,
response post-processing, renaming application — matches the reference.

Scale shape: prompts are built from the SCHEMA (vocabulary-bounded), never
the corpus; sample rows come from ``df.limit(sample_size)`` per group (a
cheap local-limit scan), and the rename itself is the existing broadcast
map join in :func:`architxt_spark.llm.apply_renaming`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING, Iterable, Protocol

from architxt_spark.model import NodeType

if TYPE_CHECKING:
    from pyspark.sql import DataFrame

    from architxt_spark.plans.schema import SchemaPlan

#: (role, content) chat messages; roles are "system" / "human" / "ai"
Message = tuple[str, str]

GROUP_SYSTEM = (
    "You are a precise data architect. "
    "Return ONLY the SNAKE_CASE name for the database table name. "
    "Do not include any other text."
)
GROUP_FEWSHOT_HUMAN = (
    "Sample Data: [{'id': 1, 'email': 'a@b.com'}, {'id': 2, 'email': 'c@d.com'}]\n"
    "Current Name: Tbl1\n"
    "Attributes: id, email\n"
    "Suggested Name:"
)
GROUP_FEWSHOT_AI = "user_accounts"

RELATION_SYSTEM = (
    "You are a precise data architect. "
    "Return ONLY the SNAKE_CASE name for the relationship between these tables. "
    "Do not include any other text."
)
RELATION_FEWSHOT_HUMAN = (
    "Table A: users\nTable B: orders\nCurrent Relationship Name: link_1\nSuggested Relationship Name:"
)
RELATION_FEWSHOT_AI = "user_orders"


class ChatModel(Protocol):
    """The LLM boundary: one chat completion per schema element.  A real
    implementation calls a chat endpoint with the message list (the
    reference binds ``stop=["\\n", " ", "."]``); failures may raise — the
    caller skips that element."""

    def complete(self, messages: list[Message]) -> str: ...


class StubChatModel:
    """Deterministic stand-in: answers group prompts with the joined
    attribute list and relation prompts with ``tableA_tableB`` — the shape
    a real model is prompted toward, derived only from the prompt text so
    golden tests and oracle queries are stable."""

    def complete(self, messages: list[Message]) -> str:
        task = messages[-1][1]
        fields = dict(
            line.split(": ", 1) for line in task.splitlines() if ": " in line
        )
        if "Attributes" in fields:
            return "_".join(a.strip() for a in fields["Attributes"].split(","))
        if "Table A" in fields and "Table B" in fields:
            return f"{fields['Table A']}_{fields['Table B']}"
        return ""


@dataclass(frozen=True)
class Renaming:
    """``labelling/__init__.py:64-68``."""

    node_type: str
    old_name: str
    new_name: str


def _clean_response(response: str) -> str:
    """``response.replace('`', '').strip().replace(' ', '_').upper()``
    (``labelling/__init__.py:101,137``)."""
    return response.replace("`", "").strip().replace(" ", "_").upper()


def _sample_json(df: DataFrame, sample_size: int) -> str:
    """First ``sample_size`` rows as a JSON-records string (the reference's
    ``DataFrame.head(n).to_json(orient='records')``)."""
    pdf = df.limit(sample_size).toPandas()
    if pdf.empty:
        return "No sample data"
    return pdf.to_json(index=False, orient="records")


def group_labelling_prompt(name: str, attributes: Iterable[str], samples: str) -> list[Message]:
    return [
        ("system", GROUP_SYSTEM),
        ("human", GROUP_FEWSHOT_HUMAN),
        ("ai", GROUP_FEWSHOT_AI),
        (
            "human",
            f"Sample Data: {samples}\nCurrent Name: {name}\n"
            f"Attributes: {', '.join(attributes)}\nSuggested Name:",
        ),
    ]


def relation_labelling_prompt(left: str, right: str, name: str) -> list[Message]:
    return [
        ("system", RELATION_SYSTEM),
        ("human", RELATION_FEWSHOT_HUMAN),
        ("ai", RELATION_FEWSHOT_AI),
        (
            "human",
            f"Table A: {left}\nTable B: {right}\n"
            f"Current Relationship Name: {name}\nSuggested Relationship Name:",
        ),
    ]


def llm_group_labelling(
    schema: SchemaPlan,
    chat: ChatModel,
    *,
    nodes: DataFrame | None = None,
    sample_size: int = 5,
) -> set[Renaming]:
    """Rename schema groups via the chat model
    (``llm_group_labelling``, ``labelling/__init__.py:71-108``): one prompt
    per group with its attribute list and up to ``sample_size`` sample
    rows from the forest's extracted dataset."""
    from architxt_spark.plans.schema import extract_group_dataset

    renames: set[Renaming] = set()
    for group_name in sorted(schema.groups):
        attributes = sorted(schema.groups[group_name])
        samples = "No sample data"
        if nodes is not None:
            ds = extract_group_dataset(nodes, group_name)
            samples = _sample_json(ds, sample_size)
        try:
            response = chat.complete(
                group_labelling_prompt(group_name, attributes, samples)
            )
        except Exception:  # noqa: BLE001 — endpoint failure skips the element
            continue
        new_name = _clean_response(response)
        if not new_name or new_name == group_name:
            continue
        renames.add(Renaming(NodeType.GROUP, group_name, new_name))
    return renames


def llm_relation_labelling(
    schema: SchemaPlan,
    chat: ChatModel,
    *,
    group_renames: Iterable[Renaming] | None = None,
) -> set[Renaming]:
    """Rename schema relations (``llm_relation_labelling``,
    ``labelling/__init__.py:111-144``); already-renamed groups are
    presented under their NEW names."""
    gmap = {
        r.old_name: r.new_name
        for r in (group_renames or [])
        if r.node_type == NodeType.GROUP
    }
    renames: set[Renaming] = set()
    for rel in sorted(schema.relations, key=lambda r: (r.name, r.left, r.right)):
        left = gmap.get(rel.left, rel.left)
        right = gmap.get(rel.right, rel.right)
        try:
            response = chat.complete(relation_labelling_prompt(left, right, rel.name))
        except Exception:  # noqa: BLE001
            continue
        new_name = _clean_response(response)
        if not new_name or new_name == rel.name:
            continue
        renames.add(Renaming(NodeType.REL, rel.name, new_name))
    return renames


def apply_renamings(nodes: DataFrame, renames: Iterable[Renaming]) -> DataFrame:
    """Apply group+relation renamings to the node table — broadcast map
    joins per node type (``apply_renaming``, ``labelling/__init__.py:147-163``)."""
    from architxt_spark.llm import apply_renaming

    by_type: dict[str, dict[str, str]] = {}
    for r in renames:
        by_type.setdefault(r.node_type, {})[r.old_name] = r.new_name
    for node_type, mapping in sorted(by_type.items()):
        nodes = apply_renaming(nodes, mapping, node_type)
    return nodes
