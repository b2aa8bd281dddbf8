"""Property-based tests (hypothesis) mirroring the reference's invariant
suite (``tests/simplification/tree_rewriting/operations/test_operations.py:20-63``):
any rewrite operation's output must still satisfy the meta-grammar shape
rules, and the returned simplified-flag must reflect whether the tree
changed.  Pure-python ops run tree-local — no Spark session needed, so
hypothesis can afford many examples."""

from hypothesis import given, settings, strategies as st

from architxt_spark.model import NodeType
from architxt_spark.operators import pytree_ops
from architxt_spark.trees import PyTree, format_tree, parse_tree

# --- strategies ------------------------------------------------------------

_names = st.sampled_from(["a", "b", "c", "d", "e"])


@st.composite
def entity(draw):
    return PyTree(f"ENT::{draw(_names)}", [draw(st.sampled_from(["x", "y", "z"]))])


@st.composite
def group(draw):
    ents = draw(st.lists(entity(), min_size=1, max_size=4))
    # unique entity names inside a group (meta-grammar rule)
    seen, uniq = set(), []
    for e in ents:
        if e.node_name not in seen:
            seen.add(e.node_name)
            uniq.append(e)
    return PyTree(f"GROUP::{draw(_names)}", uniq)


@st.composite
def untyped(draw, depth=0):
    kids = draw(
        st.lists(
            entity() if depth >= 2 else st.one_of(entity(), group(), untyped(depth=depth + 1)),
            min_size=1,
            max_size=4,
        )
    )
    return PyTree(draw(st.sampled_from(["X", "Y", "Z"])), kids)


@st.composite
def tree(draw):
    kids = draw(st.lists(st.one_of(entity(), group(), untyped()), min_size=1, max_size=5))
    return PyTree("ROOT", kids)


# --- shape-rule checker (tree-local twin of SchemaPlan.verify) -------------


def _check_shapes(node: PyTree) -> None:
    if node.node_type == NodeType.GROUP:
        ent_kids = [c for c in node.children if isinstance(c, PyTree)]
        names = [c.node_name for c in ent_kids if c.node_type == NodeType.ENT]
        assert len(names) == len(set(names)), f"dup entity in group: {format_tree(node)}"
    if node.node_type == NodeType.REL:
        kids = [c for c in node.children if isinstance(c, PyTree)]
        assert len(kids) == 2, f"REL arity: {format_tree(node)}"
        assert all(c.node_type == NodeType.GROUP for c in kids)
        assert kids[0].node_name != kids[1].node_name
    if node.node_type == NodeType.COLL:
        kids = [c for c in node.children if isinstance(c, PyTree)]
        types = {(c.node_type, c.node_name) for c in kids}
        assert len(types) == 1, f"COLL mixed members: {format_tree(node)}"
    for c in node.children:
        if isinstance(c, PyTree):
            _check_shapes(c)


_OPS = [
    ("reduce_all", lambda t: pytree_ops.reduce_all(t, {NodeType.ENT})),
    ("reduce_bottom", pytree_ops.reduce_bottom),
    ("reduce_top", pytree_ops.reduce_top),
    ("find_collections", pytree_ops.find_collections),
    ("find_relations", pytree_ops.find_relations),
]


@settings(max_examples=200, deadline=None)
@given(t=tree(), op_idx=st.integers(0, len(_OPS) - 1))
def test_ops_preserve_metagrammar_and_flag(t, op_idx):
    name, op = _OPS[op_idx]
    before = format_tree(t)
    changed = op(t)
    after = format_tree(t)
    assert changed == (before != after), f"{name} flag mismatch"
    _check_shapes(t)


@settings(max_examples=100, deadline=None)
@given(t=tree())
def test_reduce_all_reaches_fixpoint(t):
    pytree_ops.reduce_all(t, {NodeType.ENT})
    # no single-child untyped nodes below the root may survive
    for _p, _i, node, depth in pytree_ops._subtrees(t, include_self=False):
        if node.node_type is None and len(node.children) == 1:
            raise AssertionError(f"unreduced node: {format_tree(t)}")


@settings(max_examples=100, deadline=None)
@given(t=tree())
def test_find_subgroups_preserves_leaves(t):
    index = {
        frozenset({"a", "b"}): ("ab", 100),
        frozenset({"b", "c"}): ("bc", 80),
        frozenset({"a", "b", "c"}): ("abc", 60),
    }
    leaves_before = sorted(t.leaves())
    pytree_ops.find_subgroups(t, index, min_support=2)
    assert sorted(t.leaves()) == leaves_before
    _check_shapes(t)
