"""Synthetic instance generator from a schema
(``gen_instance``, ``architxt/generator/__init__.py:77-104``).

The schema is tiny, so each tree SHAPE (one per group, one per relation,
optional COLL wrapper) becomes a static node-row template built driver
side; ``spark.range(size)`` cross-joins the broadcast template — the data
generation itself is fully distributed and linear in ``size``.  Leaf
values are deterministic ``<entity>_<i>`` strings, so the output is
reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from architxt_spark.model import NodeType
from architxt_spark.plans.schema import SchemaPlan

_TEMPLATE_SCHEMA = (
    "shape string, suffix string, parent_suffix string, pos int, path array<int>,"
    " depth int, node_type string, node_name string, leaf_entity string"
)


def _group_template(
    rows: list, shape: str, gname: str, entities: list[str], parent: str, path: list[int], depth: int
) -> None:
    gsuf = f"{'.'.join(map(str, path))}g"
    rows.append((shape, gsuf, parent, path[-1], path, depth, NodeType.GROUP, gname, None))
    for j, e in enumerate(sorted(entities)):
        epath = path + [j]
        esuf = f"{'.'.join(map(str, epath))}e"
        rows.append((shape, esuf, gsuf, j, epath, depth + 1, NodeType.ENT, e, None))
        rows.append((shape, esuf + ".l", esuf, 0, epath + [0], depth + 2, None, None, e))


def gen_instance(
    spark: SparkSession,
    schema: SchemaPlan,
    *,
    size: int = 200,
    generate_collections: bool = True,
) -> DataFrame:
    """``size`` trees per group shape ``(ROOT [COLL::g] (GROUP::g (ENT …)…))``
    and per relation shape ``(ROOT (REL::r (GROUP::l …) (GROUP::r …)))``.
    Returns node rows."""
    rows: list = []

    for gname in sorted(schema.groups):
        shape = f"g_{gname}"
        rows.append((shape, "r", None, 0, [], 0, None, "ROOT", None))
        parent, depth, path = "r", 1, [0]
        if generate_collections:
            rows.append((shape, "c", "r", 0, [0], 1, NodeType.COLL, gname, None))
            parent, depth, path = "c", 2, [0, 0]
        _group_template(rows, shape, gname, list(schema.groups[gname]), parent, path, depth)

    for rel in sorted(schema.relations, key=lambda r: r.name):
        shape = f"r_{rel.name}"
        rows.append((shape, "r", None, 0, [], 0, None, "ROOT", None))
        rows.append((shape, "rel", "r", 0, [0], 1, NodeType.REL, rel.name, None))
        _group_template(rows, shape, rel.left, list(schema.groups.get(rel.left, ())), "rel", [0, 0], 2)
        _group_template(rows, shape, rel.right, list(schema.groups.get(rel.right, ())), "rel", [0, 1], 2)

    template = spark.createDataFrame(rows, _TEMPLATE_SCHEMA)
    ids = spark.range(size).select(F.col("id").cast("int").alias("i"))
    tid = F.concat_ws("_", F.col("shape"), F.col("i").cast("string"))
    return ids.crossJoin(F.broadcast(template)).select(
        tid.alias("tree_id"),
        F.concat(tid, F.lit(":"), F.col("suffix")).alias("node_id"),
        F.when(
            F.col("parent_suffix").isNotNull(),
            F.concat(tid, F.lit(":"), F.col("parent_suffix")),
        ).alias("parent_id"),
        "pos",
        "path",
        "depth",
        "node_type",
        "node_name",
        F.when(
            F.col("leaf_entity").isNotNull(),
            F.concat(F.col("leaf_entity"), F.lit("_"), F.col("i").cast("string")),
        ).alias("leaf_value"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
