"""Relational → meta-model loader, Spark-first.

The reference walks foreign keys ROW BY ROW with one SQL query per row per FK
(``architxt/database/loader/sql.py:266-304`` — a nested-loop join over the
wire) and emits one tree per root-table row.  Here the SAME output forest is
produced by a fundamentally different physical plan:

- the tree SHAPE for a root table is **data-independent** — it is fixed by
  the FK graph.  We compute the node templates (path, pos, label, value
  column, OID recipe) once on the driver with the reference's DFS semantics
  (FK edges sorted by column name, per-tree visited-edge set for cycles —
  ``loader/sql.py:258-263``);
- the DATA is assembled with **one left join per FK edge** (Catalyst picks
  broadcast/SMJ; dimension tables broadcast automatically), then each row
  explodes a static array of node structs into node-table rows.  Zero UDFs,
  zero per-row queries; scales linearly with the fact table.

Semantics mirrored from the reference:

- one tree per root-table row: ``(ROOT group, rel₁, ref-group₁, …)`` — the
  recursion is flattened directly under ROOT (``parse_table``,
  ``loader/sql.py:234-264``);
- root tables = tables never referenced by an FK; cycles broken by picking
  the max-FK table (``loader/sql.py:51-102``);
- ``GROUP::table`` holds one ``ENT::column`` per non-FK, non-null column
  (``build_group``, ``loader/sql.py:307-350``);
- REL nodes ``REL::left<->right`` hold copies of both groups
  (``build_relation``, ``loader/sql.py:352-396``);
- association tables (2 cols = 2 PKs = 2 FKs) collapse into a single REL
  (``is_association_table`` + ``parse_association_table``,
  ``loader/sql.py:105-112,188-231``);
- ``search_all_instances`` adds standalone trees for rows never referenced
  by any FK — a LEFT ANTI join (``read_unreferenced_table``,
  ``loader/sql.py:149-185``);
- deterministic OIDs from (namespace, table/rel name, sorted PK values)
  (``get_oid``, ``loader/sql.py:399-417``) so re-loads dedupe; stored in
  ``metadata['oid']`` (the reference deliberately duplicates OIDs across
  copies of the same logical entity, ``architxt/tree.py:290-305``).

Known deviation: ENT sibling positions are stable column indexes, so a NULL
column leaves a gap in ``pos`` instead of compacting later siblings — order
is preserved, which is all downstream operators use.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from architxt_spark.model import NODE_SCHEMA


@dataclass(frozen=True)
class FK:
    """One foreign-key edge: ``table.column → ref_table.ref_column``."""

    table: str
    column: str
    ref_table: str
    ref_column: str


def get_root_tables(tables: list[str], fks: list[FK]) -> list[str]:
    """Tables never referenced by an FK; if none (cycle), the table with the
    most outgoing FKs (``loader/sql.py:51-102``)."""
    referenced = {fk.ref_table for fk in fks}
    roots = [t for t in tables if t not in referenced]
    if not roots and tables:
        roots = [max(tables, key=lambda t: sum(1 for fk in fks if fk.table == t))]
    return roots


def is_association_table(table: str, pks: Mapping[str, list[str]], fks: list[FK], n_cols: int) -> bool:
    """m-n join-table: exactly 2 columns = 2 PK columns = 2 FK columns
    (``loader/sql.py:105-112``)."""
    table_fks = [fk for fk in fks if fk.table == table]
    return n_cols == 2 and len(pks.get(table, [])) == 2 and len(table_fks) == 2 and {
        fk.column for fk in table_fks
    } == set(pks[table])


def _lit(s: str) -> str:
    """SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _ref(alias: str, col: str) -> str:
    """SQL column reference ``alias.`col``."""
    return f"{alias}.`{col}`"


def _oid(name: str, kv: list[tuple[str, str]], namespace: str) -> str:
    """Deterministic OID as a SQL expression string: sha2 over
    namespace/name/sorted pk key=value pairs — same determinism + isolation
    properties as the reference's uuid5 chain (``loader/sql.py:399-417``).

    Templates are rendered as SQL strings (not Column objects) so the whole
    node emission becomes ONE ``F.expr`` — hundreds of py4j round trips per
    loader call collapse into a single string handoff, which halves the
    driver-side plan-construction time for wide FK walks.
    """
    parts = [_lit(namespace), _lit(name)]
    for k, v in sorted(kv, key=lambda p: p[0]):
        parts.append(f"concat({_lit(k + '=')}, CAST({v} AS STRING))")
    return f"sha2(concat_ws(';', {', '.join(parts)}), 256)"


class _Shape:
    """Driver-side tree-shape builder: accumulates node templates and the
    join plan for one root table."""

    def __init__(self) -> None:
        self.templates: list[dict[str, Any]] = []
        self.joins: list[tuple[str, str, str, str, str]] = []  # alias, table, parent_alias, fk_col, ref_col
        self.n_alias = 0

    def alias(self) -> str:
        a = f"t{self.n_alias}"
        self.n_alias += 1
        return a


def _group_templates(
    shape: _Shape,
    table: str,
    alias: str,
    columns: list[str],
    pks: Mapping[str, list[str]],
    fk_cols: set[str],
    path: list[int],
    pos: int,
    namespace: str,
    cond: str | None,
) -> None:
    """Templates for ``(GROUP::table (ENT::col value)…)`` at ``path``.
    All expression-valued fields are SQL strings (see :func:`_oid`)."""
    pk_kv = [(c, _ref(alias, c)) for c in pks.get(table, columns)]
    oid = _oid(table, pk_kv, namespace)
    shape.templates.append(
        dict(
            path=path,
            pos=pos,
            node_type="GROUP",
            node_name=table,
            value=None,
            cond=cond,
            metadata={"oid": oid, "primary_keys": _lit(",".join(pks.get(table, [])))},
        )
    )
    i = 0
    for col in columns:
        if col in fk_cols:
            i += 1
            continue
        val = _ref(alias, col)
        not_null = f"{val} IS NOT NULL"
        ent_cond = not_null if cond is None else f"({cond}) AND {not_null}"
        ent_path = path + [i]
        shape.templates.append(
            dict(
                path=ent_path,
                pos=i,
                node_type="ENT",
                node_name=col,
                value=None,
                cond=ent_cond,
                metadata={"oid": _oid(f"{table}.{col}", pk_kv, namespace)},
            )
        )
        shape.templates.append(
            dict(path=ent_path + [0], pos=0, node_type=None, node_name=None, value=f"CAST({val} AS STRING)", cond=ent_cond, metadata=None)
        )
        i += 1


def _walk(
    shape: _Shape,
    table: str,
    alias: str,
    schemas: Mapping[str, list[str]],
    pks: Mapping[str, list[str]],
    fks: list[FK],
    namespace: str,
    visited: set[FK],
    root_path: list[int],
    next_pos: list[int],
    cond: str | None,
    max_depth: int,
) -> None:
    """``parse_table`` semantics (``loader/sql.py:234-264``): emit the group,
    then per FK edge (sorted by column name) a REL + recursive walk, all
    flattened under ROOT."""
    table_fk_cols = {fk.column for fk in fks if fk.table == table}
    _group_templates(
        shape, table, alias, schemas[table], pks, table_fk_cols, root_path + [next_pos[0]], next_pos[0], namespace, cond
    )
    next_pos[0] += 1
    if max_depth <= 0:
        return

    for fk in sorted((f for f in fks if f.table == table), key=lambda f: f.column):
        if fk in visited:
            continue
        visited.add(fk)
        ref_alias = shape.alias()
        shape.joins.append((ref_alias, fk.ref_table, alias, fk.column, fk.ref_column))
        not_null = f"{_ref(ref_alias, fk.ref_column)} IS NOT NULL"
        ref_cond = not_null if cond is None else f"({cond}) AND {not_null}"

        # REL::left<->right with copies of both groups as children.
        rel_name = f"{table}<->{fk.ref_table}"
        rel_kv = [(f"left_{c}", _ref(alias, c)) for c in pks.get(table, [])] + [
            (f"right_{c}", _ref(ref_alias, c)) for c in pks.get(fk.ref_table, [])
        ]
        rel_path = root_path + [next_pos[0]]
        shape.templates.append(
            dict(
                path=rel_path,
                pos=next_pos[0],
                node_type="REL",
                node_name=rel_name,
                value=None,
                cond=ref_cond,
                metadata={
                    "oid": _oid(rel_name, rel_kv, namespace),
                    "source": _lit(table),
                    "target": _lit(fk.ref_table),
                    "source_column": _lit(fk.column),
                },
            )
        )
        ref_fk_cols = {f.column for f in fks if f.table == fk.ref_table}
        _group_templates(shape, table, alias, schemas[table], pks, table_fk_cols, rel_path + [0], 0, namespace, ref_cond)
        _group_templates(
            shape, fk.ref_table, ref_alias, schemas[fk.ref_table], pks, ref_fk_cols, rel_path + [1], 1, namespace, ref_cond
        )
        next_pos[0] += 1

        _walk(
            shape, fk.ref_table, ref_alias, schemas, pks, fks, namespace, visited, root_path, next_pos, ref_cond, max_depth - 1
        )


def _emit_nodes(df: DataFrame, shape: _Shape, tree_id: str) -> DataFrame:
    """Explode the static node templates into node-table rows.

    The whole emission — tree id, node ids, conditional structs, metadata
    maps — is rendered as ONE SQL expression handed to a single ``F.expr``:
    plan construction is O(1) py4j calls instead of O(templates × fields),
    which dominates loader latency for wide FK walks (the executed plan is
    identical)."""
    structs = []
    for t in shape.templates:
        path_str = ".".join(map(str, t["path"])) or "r"
        if t["metadata"]:
            kv = ", ".join(
                f"{_lit(k)}, CAST({v} AS STRING)" for k, v in t["metadata"].items()
            )
            meta = f"map({kv})"
        else:
            meta = "CAST(NULL AS MAP<STRING,STRING>)"
        parent = (
            f"concat(__tid, {_lit(':' + ('.'.join(map(str, t['path'][:-1])) or 'r'))})"
            if t["path"]
            else "CAST(NULL AS STRING)"
        )
        path_arr = (
            "array(" + ", ".join(map(str, t["path"])) + ")" if t["path"] else "CAST(array() AS ARRAY<INT>)"
        )
        s = (
            "named_struct("
            f"'tree_id', __tid, "
            f"'node_id', concat(__tid, {_lit(':' + path_str)}), "
            f"'parent_id', {parent}, "
            f"'pos', {t['pos']}, "
            f"'path', {path_arr}, "
            f"'depth', {len(t['path'])}, "
            f"'node_type', {('CAST(NULL AS STRING)' if t['node_type'] is None else _lit(t['node_type']))}, "
            f"'node_name', {('CAST(NULL AS STRING)' if t['node_name'] is None else _lit(t['node_name']))}, "
            f"'leaf_value', {(t['value'] if t['value'] is not None else 'CAST(NULL AS STRING)')}, "
            f"'metadata', {meta})"
        )
        structs.append(f"CASE WHEN {t['cond']} THEN {s} END" if t["cond"] is not None else s)
    arr = f"filter(array({', '.join(structs)}), x -> x IS NOT NULL)"
    return (
        df.withColumn("__tid", F.expr(tree_id))
        .select(F.explode(F.expr(arr)).alias("n"))
        .select("n.*")
    )


def read_relational(
    spark: SparkSession,
    tables: Mapping[str, DataFrame],
    fks: list[FK],
    pks: Mapping[str, list[str]],
    *,
    namespace: str = "db",
    search_all_instances: bool = False,
    sample: int = 0,
    max_depth: int = 10,
) -> DataFrame:
    """Load a relational schema into the node table (``read_sql``,
    ``loader/sql.py:18-48``).

    ``tables`` maps table name → DataFrame (parquet scan, JDBC read, …).
    Returns the union of per-root-table node DataFrames plus, with
    ``search_all_instances``, standalone groups for unreferenced rows.
    """
    schemas = {t: df.columns for t, df in tables.items()}
    outputs: list[DataFrame] = []

    for root in get_root_tables(list(tables), fks):
        df = tables[root]
        if sample:
            df = df.limit(sample)

        if is_association_table(root, pks, fks, len(schemas[root])):
            outputs.append(
                _read_association(df, root, tables, fks, pks, namespace=namespace)
            )
            continue

        shape = _Shape()
        root_alias = shape.alias()
        # ROOT wrapper node (read_sql wraps each root row's yield in ROOT).
        shape.templates.append(
            dict(path=[], pos=0, node_type=None, node_name="ROOT", value=None, cond=None, metadata=None)
        )
        _walk(shape, root, root_alias, schemas, pks, fks, namespace, set(), [], [0], None, max_depth)

        joined = df.alias(root_alias)
        for ref_alias, ref_table, parent_alias, fk_col, ref_col in shape.joins:
            joined = joined.join(
                tables[ref_table].alias(ref_alias),
                F.col(f"{parent_alias}.{fk_col}") == F.col(f"{ref_alias}.{ref_col}"),
                "left",
            )

        root_pk_kv = [(c, _ref(root_alias, c)) for c in pks.get(root, schemas[root])]
        tree_id = _oid(f"tree:{root}", root_pk_kv, namespace)
        outputs.append(_emit_nodes(joined, shape, tree_id))

    if search_all_instances:
        outputs.extend(_unreferenced(tables, fks, pks, schemas, namespace))

    out = outputs[0]
    for o in outputs[1:]:
        out = out.unionByName(o)
    return out


def _read_association(
    df: DataFrame,
    assoc: str,
    tables: Mapping[str, DataFrame],
    fks: list[FK],
    pks: Mapping[str, list[str]],
    *,
    namespace: str,
) -> DataFrame:
    """m-n table → single ``(ROOT (REL::A<->B group_A group_B))`` per row
    (``parse_association_table``, ``loader/sql.py:188-231``)."""
    left_fk, right_fk = sorted((f for f in fks if f.table == assoc), key=lambda f: f.column)
    shape = _Shape()
    a0 = shape.alias()
    la, ra = shape.alias(), shape.alias()
    shape.joins.append((la, left_fk.ref_table, a0, left_fk.column, left_fk.ref_column))
    shape.joins.append((ra, right_fk.ref_table, a0, right_fk.column, right_fk.ref_column))
    shape.templates.append(dict(path=[], pos=0, node_type=None, node_name="ROOT", value=None, cond=None, metadata=None))
    rel_name = f"{left_fk.ref_table}<->{right_fk.ref_table}"
    rel_kv = [(f"left_{c}", _ref(la, c)) for c in pks[left_fk.ref_table]] + [
        (f"right_{c}", _ref(ra, c)) for c in pks[right_fk.ref_table]
    ]
    shape.templates.append(
        dict(path=[0], pos=0, node_type="REL", node_name=rel_name, value=None, cond=None,
             metadata={"oid": _oid(rel_name, rel_kv, namespace)})
    )
    schemas = {t: d.columns for t, d in tables.items()}
    for i, (tbl, al) in enumerate(((left_fk.ref_table, la), (right_fk.ref_table, ra))):
        fk_cols = {f.column for f in fks if f.table == tbl}
        _group_templates(shape, tbl, al, schemas[tbl], pks, fk_cols, [0, i], i, namespace, None)

    joined = df.alias(a0)
    for ref_alias, ref_table, parent_alias, fk_col, ref_col in shape.joins:
        joined = joined.join(
            tables[ref_table].alias(ref_alias),
            F.col(f"{parent_alias}.{fk_col}") == F.col(f"{ref_alias}.{ref_col}"),
            "left",
        )
    tree_id = _oid(f"tree:{assoc}", [(c, _ref(a0, c)) for c in pks[assoc]], namespace)
    return _emit_nodes(joined, shape, tree_id)


def _unreferenced(
    tables: Mapping[str, DataFrame],
    fks: list[FK],
    pks: Mapping[str, list[str]],
    schemas: Mapping[str, list[str]],
    namespace: str,
) -> list[DataFrame]:
    """Standalone ``(ROOT (GROUP::t …))`` trees for FK-target rows never
    referenced — LEFT ANTI join per referencing edge
    (``read_unreferenced_table``, ``loader/sql.py:149-185``)."""
    out = []
    by_target: dict[str, list[FK]] = {}
    for fk in fks:
        by_target.setdefault(fk.ref_table, []).append(fk)
    for target, edges in by_target.items():
        df = tables[target]
        for fk in edges:
            df = df.join(
                tables[fk.table].select(F.col(fk.column).alias("__ref")),
                F.col(fk.ref_column) == F.col("__ref"),
                "left_anti",
            )
        shape = _Shape()
        alias = shape.alias()
        shape.templates.append(dict(path=[], pos=0, node_type=None, node_name="ROOT", value=None, cond=None, metadata=None))
        fk_cols = {f.column for f in fks if f.table == target}
        _group_templates(shape, target, alias, schemas[target], pks, fk_cols, [0], 0, namespace, None)
        tree_id = _oid(f"tree:{target}", [(c, _ref(alias, c)) for c in pks.get(target, schemas[target])], namespace)
        out.append(_emit_nodes(df.alias(alias), shape, tree_id))
    return out
