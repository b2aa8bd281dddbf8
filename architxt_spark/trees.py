"""Tree codecs: bracketed tree-strings / JSON dicts ⇄ node rows.

Driver-side ``PyTree`` is a deliberately tiny recursive helper used for
codecs, tests, and per-sentence UDF work — it is NOT the engine
representation (that is the node table, see :mod:`architxt_spark.model`).

Semantics mirrored from the reference:

- tree-strings: LISP-style bracketings with URL-quoted leaves
  (``architxt/tree.py:1128-1183`` fromstring, ``1255-1276`` pformat,
  leaf quoting at ``architxt/tree.py:1267``).
- JSON: ``{oid, type, name, metadata, children}`` where children mix leaf
  strings and nested dicts (``architxt/tree.py:1277-1333``).
- JSONL forest IO (``architxt/forest.py:25-64``).
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Any, Iterator
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from architxt_spark.model import NODE_SCHEMA, NodeType, parse_label

_TOKEN_RE = re.compile(r"\(\s*([^\s()]*)|\)|[^\s()]+")


@dataclass
class PyTree:
    """Small driver-side tree: ``label`` is ``"TYPE::name"`` or a plain
    string; ``children`` mixes ``PyTree`` and leaf ``str`` tokens."""

    label: str
    children: list["PyTree | str"] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)
    oid: str | None = None

    @property
    def node_type(self) -> str | None:
        return parse_label(self.label)[0]

    @property
    def node_name(self) -> str:
        return parse_label(self.label)[1]

    def leaves(self) -> list[str]:
        out: list[str] = []
        for c in self.children:
            if isinstance(c, PyTree):
                out.extend(c.leaves())
            else:
                out.append(c)
        return out

    def copy(self) -> "PyTree":
        """Deep copy (``Tree.copy``, ``architxt/tree.py:755-773``) — used
        by the rewrite loop's speculative op probing."""
        return PyTree(
            self.label,
            [c.copy() if isinstance(c, PyTree) else c for c in self.children],
            dict(self.metadata),
            self.oid,
        )

    def __str__(self) -> str:
        return format_tree(self)


def parse_tree(text: str) -> PyTree:
    """Parse a LISP-style bracketed tree string.

    >>> t = parse_tree('(S (ENT::person Alice) (VP (V runs)))')
    >>> t.label, t.children[0].node_type, t.children[0].leaves()
    ('S', 'ENT', ['Alice'])
    """
    stack: list[tuple[str | None, list[Any]]] = [(None, [])]
    for match in _TOKEN_RE.finditer(text):
        token = match.group()
        if token.startswith("("):
            label = unquote(match.group(1) or "")
            stack.append((label, []))
        elif token == ")":
            if len(stack) == 1:
                raise ValueError(f"unbalanced ')' in tree string: {text!r}")
            label, children = stack.pop()
            stack[-1][1].append(PyTree(label or "", children))
        else:
            if len(stack) == 1:
                raise ValueError(f"leaf outside tree in: {text!r}")
            stack[-1][1].append(unquote(token))
    if len(stack) != 1 or len(stack[0][1]) != 1 or not isinstance(stack[0][1][0], PyTree):
        raise ValueError(f"malformed tree string: {text!r}")
    return stack[0][1][0]


def format_tree(tree: PyTree) -> str:
    """Single-line bracketed form with URL-quoted leaves
    (``architxt/tree.py:1267``)."""
    parts = [
        format_tree(c) if isinstance(c, PyTree) else quote(c)
        for c in tree.children
    ]
    body = " ".join(parts)
    return f"({tree.label} {body})" if body else f"({tree.label} )"


def tree_to_json(tree: PyTree) -> dict[str, Any]:
    """``Tree.to_json`` shape (``architxt/tree.py:1277-1296``)."""
    t, name = parse_label(tree.label)
    return {
        "oid": tree.oid or str(uuid.uuid4()),
        "type": t,
        "name": name,
        "metadata": dict(tree.metadata),
        "children": [
            tree_to_json(c) if isinstance(c, PyTree) else c for c in tree.children
        ],
    }


def tree_from_json(data: dict[str, Any]) -> PyTree:
    """``Tree.from_json`` shape (``architxt/tree.py:1298-1333``)."""
    name = data.get("name") or ""
    label = f"{data['type']}::{name}" if data.get("type") else name
    children: list[PyTree | str] = [
        c if isinstance(c, str) else tree_from_json(c)
        for c in data.get("children", [])
    ]
    return PyTree(label, children, dict(data.get("metadata") or {}), data.get("oid"))


# ---------------------------------------------------------------------------
# PyTree ⇄ node rows
# ---------------------------------------------------------------------------


def tree_to_rows(tree: PyTree, tree_id: str) -> list[dict[str, Any]]:
    """Flatten one tree into node-table rows (leaf tokens become their own
    rows with null ``node_name``)."""
    rows: list[dict[str, Any]] = []

    def walk(node: PyTree, parent_id: str | None, pos: int, path: list[int]) -> None:
        nid = node.oid or f"{tree_id}:{'.'.join(map(str, path)) or 'r'}"
        t, name = parse_label(node.label)
        rows.append(
            dict(
                tree_id=tree_id,
                node_id=nid,
                parent_id=parent_id,
                pos=pos,
                path=list(path),
                depth=len(path),
                node_type=t,
                node_name=name,
                leaf_value=None,
                metadata=dict(node.metadata) or None,
            )
        )
        for i, child in enumerate(node.children):
            cpath = path + [i]
            if isinstance(child, PyTree):
                walk(child, nid, i, cpath)
            else:
                rows.append(
                    dict(
                        tree_id=tree_id,
                        node_id=f"{tree_id}:{'.'.join(map(str, cpath))}",
                        parent_id=nid,
                        pos=i,
                        path=cpath,
                        depth=len(cpath),
                        node_type=None,
                        node_name=None,
                        leaf_value=child,
                        metadata=None,
                    )
                )

    walk(tree, None, 0, [])
    return rows


def rows_to_trees(rows: list[dict[str, Any]]) -> dict[str, PyTree]:
    """Rebuild ``{tree_id: PyTree}`` from node rows (driver-side; for tests,
    JSONL export, and golden tree-string comparisons)."""
    by_tree: dict[str, list[dict[str, Any]]] = {}
    for r in rows:
        by_tree.setdefault(r["tree_id"], []).append(r)

    out: dict[str, PyTree] = {}
    for tree_id, nodes in by_tree.items():
        nodes.sort(key=lambda r: list(r["path"]))
        built: dict[str, PyTree] = {}
        children_of: dict[str | None, list[tuple[int, Any]]] = {}
        for r in nodes:
            if r["node_name"] is None and r["leaf_value"] is not None:
                children_of.setdefault(r["parent_id"], []).append((r["pos"], r["leaf_value"]))
            else:
                label = (
                    f"{r['node_type']}::{r['node_name']}" if r["node_type"] else (r["node_name"] or "")
                )
                node = PyTree(label, [], dict(r["metadata"] or {}), r["node_id"])
                built[r["node_id"]] = node
                children_of.setdefault(r["parent_id"], []).append((r["pos"], node))
        for nid, node in built.items():
            node.children = [c for _, c in sorted(children_of.get(nid, []), key=lambda x: x[0])]
        roots = children_of.get(None, [])
        if len(roots) != 1:
            raise ValueError(f"tree {tree_id!r} has {len(roots)} roots")
        out[tree_id] = roots[0][1]
    return out


# ---------------------------------------------------------------------------
# Distributed forest IO
# ---------------------------------------------------------------------------


def forest_from_trees(spark: SparkSession, trees: dict[str, PyTree] | list[PyTree]) -> DataFrame:
    """Driver-side trees → node table (small fixtures / tests)."""
    if isinstance(trees, list):
        trees = {str(i): t for i, t in enumerate(trees)}
    rows = [row for tid, t in trees.items() for row in tree_to_rows(t, tid)]
    return spark.createDataFrame(rows, NODE_SCHEMA) if rows else spark.createDataFrame([], NODE_SCHEMA)


def read_jsonl_forest(spark: SparkSession, path: str) -> DataFrame:
    """JSONL of ``Tree.to_json()`` dicts → node table
    (``architxt/forest.py:49-64``).

    Trees are recursive, so Spark schema inference cannot type them;
    each line is parsed in a ``mapInPandas`` batch (trees are small — the
    per-tree python codec is the idiomatic choice; parallelism comes from
    line partitioning).
    """
    import pandas as pd

    lines = spark.read.text(path)

    def parse_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for line in pdf["value"]:
                if not line.strip():
                    continue
                data = json.loads(line)
                tree = tree_from_json(data)
                out.extend(tree_to_rows(tree, tree.oid or str(uuid.uuid4())))
            yield pd.DataFrame(
                out,
                columns=[f.name for f in NODE_SCHEMA.fields],
            )

    return lines.mapInPandas(parse_batch, NODE_SCHEMA)


def write_jsonl_forest(nodes: DataFrame, path: str) -> None:
    """Node table → JSONL of ``Tree.to_json()`` dicts
    (``architxt/forest.py:25-46``): re-nest per tree with ``applyInPandas``
    (each task handles whole trees; no driver collect)."""
    import pandas as pd

    def nest(pdf: pd.DataFrame) -> pd.DataFrame:
        trees = rows_to_trees(pdf.to_dict("records"))
        return pd.DataFrame({"value": [json.dumps(tree_to_json(t)) for t in trees.values()]})

    from architxt_spark.session import tree_buckets

    (
        tree_buckets(nodes)
        .applyInPandas(nest, "value string")
        .write.mode("overwrite")
        .text(path)
    )


def leaves_df(nodes: DataFrame) -> DataFrame:
    """Ordered token projection per tree (``Tree.leaves()``,
    ``architxt/tree.py:459-478``): leaf rows sorted by path."""
    return (
        nodes.filter(F.col("node_name").isNull() & F.col("leaf_value").isNotNull())
        .groupBy("tree_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("path"), F.col("leaf_value")))
                    ),
                    lambda s: s["leaf_value"],
                ),
                " ",
            ).alias("text")
        )
    )


def node_text(nodes: DataFrame) -> DataFrame:
    """Per-node joined text of DIRECT leaf children (covers ENT values —
    the reference joins an entity's leaves with ' ',
    ``architxt/tree.py:650``).  Returns (node_id, text)."""
    leaves = nodes.filter(F.col("node_name").isNull() & F.col("leaf_value").isNotNull())
    return (
        leaves.groupBy(F.col("parent_id").alias("node_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "leaf_value"))),
                    lambda s: s["leaf_value"],
                ),
                " ",
            ).alias("text")
        )
    )


def leaf_positions(nodes: DataFrame) -> DataFrame:
    """Per-tree leaf index → path (``Tree.leaf_position``,
    ``architxt/tree.py:558-595``): one window over the leaf rows instead of
    a per-tree traversal.  Returns (tree_id, leaf_index, node_id, path)."""
    from pyspark.sql.window import Window

    leaves = nodes.filter(F.col("node_name").isNull() & F.col("leaf_value").isNotNull())
    w = Window.partitionBy("tree_id").orderBy("path")
    return leaves.select(
        "tree_id",
        (F.row_number().over(w) - 1).alias("leaf_index"),
        "node_id",
        "path",
    )


def has_entity_child(nodes: DataFrame) -> DataFrame:
    """Per-node flag: any DIRECT child is an ENT (``Tree.has_entity_child``,
    ``architxt/tree.py:712-753``) — one aggregation over child rows.
    Returns (node_id, has_entity_child)."""
    return (
        nodes.filter(F.col("parent_id").isNotNull())
        .groupBy(F.col("parent_id").alias("node_id"))
        .agg(F.max(F.col("node_type") == "ENT").alias("has_entity_child"))
    )


def has_unlabelled_nodes(nodes: DataFrame) -> DataFrame:
    """Per-tree flag: any INTERNAL node has no type (``Tree.
    has_unlabelled_nodes``, ``architxt/tree.py:712-753``).  Internal =
    non-leaf, non-root.  Returns (tree_id, has_unlabelled)."""
    return nodes.groupBy("tree_id").agg(
        F.max(
            F.col("node_type").isNull()
            & F.col("parent_id").isNotNull()
            & F.col("node_name").isNotNull()
        ).alias("has_unlabelled")
    )
