"""Per-tree rewrite algorithms on :class:`~architxt_spark.trees.PyTree`.

The reference applies every rewrite operation tree-by-tree
(``Operation.apply(tree) -> bool``,
``architxt/simplification/tree_rewriting/operations/operation.py:14-61``);
trees are small (a sentence / a document row), so the per-tree algorithm is
plain Python here and the ENGINE parallelizes across trees with
``applyInPandas`` (see :mod:`architxt_spark.operators.engine`) — horizontal
scale comes from partitioning by ``tree_id``, not from rewriting the
algorithm into joins.

Implemented operations and their reference semantics:

- :func:`reduce_all` — ``Tree.reduce / reduce_all``
  (``architxt/tree.py:775-828``): splice out single-child nodes whose type
  is not in ``skip_types``, to fixpoint.
- :func:`reduce_bottom` / :func:`reduce_top` — ``ReduceBottomOperation`` /
  ``ReduceTopOperation``
  (``operations/reductions.py:62-88``): delete untyped nodes whose children
  are all ENT (bottom) or untyped direct children of the root (top),
  splicing children into the parent.
- :func:`find_collections` — ``FindCollectionsOperation``
  (``operations/collections.py:20-103``): merge equal-label sibling
  GROUP/REL/COLL runs into one ``COLL::<name>`` (flattening nested COLLs);
  ``naming_only`` labels homogeneous parents.
- :func:`find_relations` — ``FindRelationsOperation``
  (``operations/relations.py:21-121``): binary (GROUP, GROUP) parents become
  ``REL::A<->B`` (sorted names, self-pairs skipped); (GROUP, COLL-of-GROUP)
  distributes into one REL per collection member.

Every function mutates the tree in place and returns ``True`` if it
simplified something, matching ``Operation.apply``.
"""

from __future__ import annotations

from architxt_spark.model import NodeType
from architxt_spark.trees import PyTree


def _subtrees(tree: PyTree, include_self: bool = True) -> list[tuple[PyTree | None, int, PyTree, int]]:
    """Pre-order list of (parent, index, node, depth)."""
    out: list[tuple[PyTree | None, int, PyTree, int]] = []

    def walk(parent: PyTree | None, idx: int, node: PyTree, depth: int) -> None:
        out.append((parent, idx, node, depth))
        for i, c in enumerate(node.children):
            if isinstance(c, PyTree):
                walk(node, i, c, depth + 1)

    walk(None, 0, tree, 0)
    return out if include_self else out[1:]


def _is_typed(node: PyTree | str, types: set[str] | None = None) -> bool:
    if not isinstance(node, PyTree):
        return False
    t = node.node_type
    if t is None:
        return False
    return t in types if types is not None else True


def reduce_node(tree: PyTree, parent: PyTree, index: int, skip_types: set[str] | None = None) -> bool:
    """``Tree.reduce`` (``architxt/tree.py:775-805``)."""
    if len(tree.children) != 1 or (skip_types and tree.node_type in skip_types):
        return False
    parent.children[index : index + 1] = tree.children
    return True


def reduce_all(tree: PyTree, skip_types: set[str] | None = None) -> bool:
    """``Tree.reduce_all`` (``architxt/tree.py:806-828``): fixpoint."""
    changed = False
    reduced = True
    while reduced:
        reduced = False
        for parent, idx, node, _ in _subtrees(tree, include_self=False):
            if parent is not None and reduce_node(node, parent, idx, skip_types):
                reduced = changed = True
                break
    return changed


def _splice(parent: PyTree, node: PyTree) -> None:
    i = parent.children.index(node)
    parent.children[i : i + 1] = node.children


def reduce_bottom(tree: PyTree) -> bool:
    """``ReduceBottomOperation`` (``operations/reductions.py:62-76``)."""
    victims = [
        (parent, node)
        for parent, _, node, _ in reversed(_subtrees(tree, include_self=False))
        if node.node_type is None
        and node.children
        and all(_is_typed(c, {NodeType.ENT}) for c in node.children)
    ]
    for parent, node in victims:
        if node in parent.children:
            _splice(parent, node)
    return bool(victims)


def reduce_top(tree: PyTree) -> bool:
    """``ReduceTopOperation`` (``operations/reductions.py:79-88``)."""
    victims = [c for c in tree.children if isinstance(c, PyTree) and c.node_type is None]
    for node in victims:
        _splice(tree, node)
    return bool(victims)


def find_collections(tree: PyTree, *, naming_only: bool = False) -> bool:
    """``FindCollectionsOperation.apply`` (``operations/collections.py:34-103``)."""
    simplified = False
    STRUCT = {NodeType.GROUP, NodeType.REL, NodeType.COLL}

    candidates = [
        (node, depth)
        for _, _, node, depth in _subtrees(tree)
        if node.node_type not in {NodeType.ENT, NodeType.GROUP, NodeType.REL}
        and any(_is_typed(c, STRUCT) for c in node.children)
    ]
    for node, _ in sorted(candidates, key=lambda x: x[1], reverse=True):
        if node.node_type == NodeType.COLL:  # renaming only
            first = node.children[0]
            if isinstance(first, PyTree):
                node.label = f"{NodeType.COLL}::{first.node_name}"
            continue

        if naming_only:
            kids = node.children
            if (
                kids
                and _is_typed(kids[0], {NodeType.GROUP, NodeType.REL})
                and all(isinstance(k, PyTree) and k.label == kids[0].label for k in kids)
            ):
                node.label = f"{NodeType.COLL}::{kids[0].node_name}"
                simplified = True
            continue

        if _merge_equivalent_siblings(node):
            simplified = True
    return simplified


def _merge_equivalent_siblings(node: PyTree) -> bool:
    """``_merge_equivalent_siblings_into_collection``
    (``operations/collections.py:66-103``)."""
    STRUCT = {NodeType.GROUP, NodeType.REL, NodeType.COLL}
    by_name: dict[str, list[PyTree]] = {}
    for c in node.children:
        if _is_typed(c, STRUCT):
            by_name.setdefault(c.node_name, []).append(c)

    modified = False
    for members in (m for m in by_name.values() if len(m) > 1):
        index = node.children.index(members[0])
        name = members[0].node_name
        gathered: list[PyTree | str] = []
        for m in members:
            if m.node_type == NodeType.COLL:
                gathered.extend(m.children)
            else:
                gathered.append(m)
            node.children.remove(m)
        modified = True
        if not node.children:
            # entire subtree was one collection: reuse the node
            node.label = f"{NodeType.COLL}::{name}"
            node.children = gathered
        else:
            node.children.insert(min(index, len(node.children)), PyTree(f"{NodeType.COLL}::{name}", gathered))
    return modified


def _is_valid_relation(node: PyTree) -> bool:
    return (
        len(node.children) == 2
        and all(_is_typed(c, {NodeType.GROUP}) for c in node.children)
    )


def find_relations(tree: PyTree, *, naming_only: bool = False) -> bool:
    """``FindRelationsOperation.apply`` (``operations/relations.py:38-121``)."""
    simplified = False
    candidates = [
        (node, depth)
        for _, _, node, depth in _subtrees(tree)
        if len(node.children) == 2
        and node.node_type not in {NodeType.ENT, NodeType.GROUP}
        and all(_is_typed(c, {NodeType.GROUP, NodeType.COLL}) for c in node.children)
    ]
    for node, _ in sorted(candidates, key=lambda x: x[1], reverse=True):
        if _is_valid_relation(node):
            if _make_group_group_relation(node):
                simplified = True
        elif not naming_only and _make_group_collection_relation(node):
            simplified = True
    return simplified


def _make_group_group_relation(node: PyTree) -> bool:
    a, b = node.children
    assert isinstance(a, PyTree) and isinstance(b, PyTree)
    if a.node_name == b.node_name:
        return False
    n1, n2 = sorted([a.node_name, b.node_name])
    was_rel = node.node_type == NodeType.REL
    node.label = f"{NodeType.REL}::{n1}<->{n2}"
    return not was_rel


def _copy_clear_oid(tree: PyTree) -> PyTree:
    out = tree.copy()
    stack = [out]
    while stack:
        n = stack.pop()
        n.oid = None
        stack.extend(c for c in n.children if isinstance(c, PyTree))
    return out


def _make_group_collection_relation(node: PyTree) -> bool:
    a, b = node.children
    if _is_typed(a, {NodeType.GROUP}) and _is_typed(b, {NodeType.COLL}):
        group, coll = a, b
    elif _is_typed(a, {NodeType.COLL}) and _is_typed(b, {NodeType.GROUP}):
        coll, group = a, b
    else:
        return False
    assert isinstance(group, PyTree) and isinstance(coll, PyTree)
    members = [c for c in coll.children if isinstance(c, PyTree)]
    if (
        not members
        or len(members) != len(coll.children)
        or not all(_is_typed(m, {NodeType.GROUP}) for m in members)
        or len({m.node_name for m in members}) != 1
    ):
        return False
    if group.node_name == members[0].node_name:
        return False
    n1, n2 = sorted((group.node_name, members[0].node_name))
    rel_label = f"{NodeType.REL}::{n1}<->{n2}"
    # One fresh deep copy of the GROUP per member (the reference builds
    # ``group.copy()`` per relation, ``operations/relations.py:112``) with
    # oids cleared so tree_to_rows regenerates unique path-based node ids —
    # sharing one PyTree across RELs emits duplicate node_id rows and
    # corrupts the rebuilt node table.
    for m in members:
        node.children.append(PyTree(rel_label, [_copy_clear_oid(group), m]))
    node.children.remove(group)
    node.children.remove(coll)
    return True


def entity_nodes(tree: PyTree) -> list[PyTree]:
    """ENT descendants in pre-order (``Tree.entities``,
    ``architxt/tree.py:669-683``)."""
    out = []
    for _, _, node, _ in _subtrees(tree):
        if node.node_type == NodeType.ENT:
            out.append(node)
    return out


def has_duplicate_entity(tree: PyTree) -> bool:
    """``architxt/tree.py:712-724``."""
    names = [e.node_name for e in entity_nodes(tree)]
    return len(names) != len(set(names))


# ---------------------------------------------------------------------------
# combinatorial group search (FindSubGroups / MergeGroups)
# ---------------------------------------------------------------------------

#: hard bound on combination size — the reference caps k by the best
#: matching cluster's size (``operations/groups.py:121-134``); this is the
#: additional 100-TB-posture guard against degenerate wide subtrees.
MAX_COMBINATION = 6


def _ent_names(node: PyTree) -> list[str]:
    return [c.node_name for c in node.children if _is_typed(c, {NodeType.ENT})]


def find_subgroups(
    tree: PyTree,
    index: dict[frozenset, tuple[str, int]],
    min_support: int = 2,
) -> bool:
    """``FindSubGroupsOperation`` (``operations/groups.py:22-176``): in each
    unlabeled subtree whose children are all ENT, search k-combinations of
    its entities whose hypothetical GROUP lands in a HIGHER-support cluster;
    wrap the best combination under ``GROUP::<cluster>``, iterate.

    Search space pruning as in the reference: candidate entities restricted
    to labels that occur in some indexed cluster; k capped by the largest
    compatible cluster size (and :data:`MAX_COMBINATION`)."""
    from itertools import combinations

    changed = False
    indexed_labels = set().union(*index.keys()) if index else set()
    for _parent, _idx, node, _depth in _subtrees(tree):
        if node.node_type is not None:
            continue
        while True:
            ents = _ent_names(node)
            if len(ents) < 3 or len(set(ents)) != len(ents):
                break
            if any(not _is_typed(c, {NodeType.ENT}) for c in node.children if isinstance(c, PyTree)):
                break
            current = index.get(frozenset(ents), (None, 0))[1]
            cand_labels = [e for e in ents if e in indexed_labels]
            max_k = min(len(cand_labels) - 1, MAX_COMBINATION)
            best: tuple[int, tuple[str, ...], str] | None = None
            for k in range(max_k, 1, -1):
                for combo in combinations(sorted(cand_labels), k):
                    name, support = index.get(frozenset(combo), (None, 0))
                    if support > max(current, min_support) and (
                        best is None or support > best[0]
                    ):
                        best = (support, combo, name)
                if best is not None:
                    break
            if best is None:
                break
            _support, combo, name = best
            members = [c for c in node.children if _is_typed(c, {NodeType.ENT}) and c.node_name in combo]
            first = node.children.index(members[0])
            for m in members:
                node.children.remove(m)
            node.children.insert(first, PyTree(f"{NodeType.GROUP}::{name}", members))
            changed = True
    return changed


def merge_groups(
    tree: PyTree,
    index: dict[frozenset, tuple[str, int]],
    min_support: int = 2,
) -> bool:
    """``MergeGroupsOperation`` (``operations/groups.py:179-304``): in
    unlabeled subtrees containing GROUP children, try combinations of
    GROUP/ENT children whose merged entity set lands in a cluster with
    support ≥ every member's own support; merge them into one GROUP."""
    from itertools import combinations

    changed = False
    for _parent, _idx, node, _depth in _subtrees(tree):
        if node.node_type is not None:
            continue
        members = [
            c for c in node.children if _is_typed(c, {NodeType.GROUP, NodeType.ENT})
        ]
        groups = [m for m in members if m.node_type == NodeType.GROUP]
        if not groups or len(members) < 2:
            continue

        def ent_set(m: PyTree) -> frozenset:
            if m.node_type == NodeType.ENT:
                return frozenset({m.node_name})
            return frozenset(_ent_names(m))

        def own_support(m: PyTree) -> int:
            return index.get(ent_set(m), (None, 0))[1]

        best: tuple[int, tuple[PyTree, ...], str] | None = None
        max_k = min(len(members), MAX_COMBINATION)
        for k in range(max_k, 1, -1):
            for combo in combinations(members, k):
                if not any(m.node_type == NodeType.GROUP for m in combo):
                    continue
                merged = frozenset().union(*(ent_set(m) for m in combo))
                if len(merged) != sum(len(ent_set(m)) for m in combo):
                    continue  # duplicate entities after merge
                name, support = index.get(merged, (None, 0))
                if (
                    support > min_support
                    and support >= max(own_support(m) for m in combo)
                    and (best is None or support > best[0])
                ):
                    best = (support, combo, name)
            if best is not None:
                break
        if best is None:
            continue
        _support, combo, name = best
        new_children: list[PyTree] = []
        for m in combo:
            if m.node_type == NodeType.ENT:
                new_children.append(m)
            else:
                new_children.extend(c for c in m.children if _is_typed(c, {NodeType.ENT}))
        first = node.children.index(combo[0])
        for m in combo:
            node.children.remove(m)
        node.children.insert(first, PyTree(f"{NodeType.GROUP}::{name}", new_children))
        changed = True
    return changed
