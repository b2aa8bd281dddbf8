"""Property-graph exporter
(``architxt/database/export/cypher.py:17-176`` re-expressed Spark-first).

Produces the two frame shapes the neo4j-spark-connector writes natively
(node frames per group, relationship frames per relation), applies the
collapsible-group optimization (a group on the "one" side of exactly two
1-n relations becomes an attributed edge,
``architxt/schema.py:442-501``), and can render a deterministic MERGE
script for small exports / tests — the connector write is the scale path.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.plans.schema import SchemaPlan
from architxt_spark.sinks.sql import OID_COL, group_frame, relation_pairs


def cypher_node_frames(nodes: DataFrame, schema: SchemaPlan) -> dict[str, DataFrame]:
    """One frame per NON-collapsible group: (oid PK + entity property
    columns) — writable with the connector's node mode (``MERGE`` on the
    indexed ``_architxt_oid``, ``export/cypher.py:75-104``)."""
    collapsed = schema.find_collapsible_groups()
    return {g: group_frame(nodes, g) for g in sorted(schema.groups) if g not in collapsed}


def cypher_relationship_frames(nodes: DataFrame, schema: SchemaPlan) -> dict[str, DataFrame]:
    """Relationship frames: plain relations → (left_oid, right_oid) edges;
    a collapsible middle group M (A ← M → B) becomes ONE attributed edge
    frame A-[M {entity props}]->B (``export/cypher.py:106-134``)."""
    collapsed = schema.find_collapsible_groups()
    rels_by_group: dict[str, list] = {}
    for rel in schema.relations:
        rels_by_group.setdefault(rel.left, []).append(rel)
        rels_by_group.setdefault(rel.right, []).append(rel)

    out: dict[str, DataFrame] = {}
    done_rels = set()
    for mid in sorted(collapsed):
        touching = [r for r in rels_by_group.get(mid, []) if r.name not in done_rels]
        if len(touching) != 2:
            continue
        (r1, r2) = sorted(touching, key=lambda r: r.name)
        end1 = r1.left if r1.right == mid else r1.right
        end2 = r2.left if r2.right == mid else r2.right
        p1 = relation_pairs(nodes, r1.name)
        p2 = relation_pairs(nodes, r2.name)

        def mid_side(p: DataFrame, end: str) -> DataFrame:
            a = p.filter(F.col("left_group") == mid).select(
                F.col("left_oid").alias("mid_oid"), F.col("right_oid").alias(f"{end}_oid")
            )
            b = p.filter((F.col("right_group") == mid) & (F.col("left_group") == end)).select(
                F.col("right_oid").alias("mid_oid"), F.col("left_oid").alias(f"{end}_oid")
            )
            return a.unionByName(b)

        props = group_frame(nodes, mid)
        edge = (
            mid_side(p1, end1)
            .join(mid_side(p2, end2), "mid_oid")
            .join(props, F.col("mid_oid") == props[OID_COL], "left")
            .drop(OID_COL)
        )
        out[f"{end1}-[{mid}]->{end2}"] = edge
        done_rels.update({r1.name, r2.name})

    for rel in sorted(schema.relations, key=lambda r: r.name):
        if rel.name in done_rels or rel.left in collapsed or rel.right in collapsed:
            continue
        out[rel.name] = relation_pairs(nodes, rel.name)
    return out


def export_cypher_script(
    nodes: DataFrame, schema: SchemaPlan, *, max_rows: int = 10000
) -> list[str]:
    """Deterministic MERGE statements for small exports / tests.  Collects
    at most ``max_rows`` per frame — the scale path is the connector write
    of the same frames."""
    stmts: list[str] = []
    for gname, frame in cypher_node_frames(nodes, schema).items():
        cols = [c for c in frame.columns if c != OID_COL]
        for row in frame.orderBy(OID_COL).limit(max_rows).collect():
            props = {OID_COL: row[OID_COL]}
            props.update({c: row[c] for c in cols if row[c] is not None})
            stmts.append(f"MERGE (n:`{gname}` {{`{OID_COL}`: {json.dumps(row[OID_COL])}}}) SET n += {json.dumps(props)}")
    for rname, frame in cypher_relationship_frames(nodes, schema).items():
        cols = frame.columns
        if "left_oid" in cols:  # plain relation frame
            for row in frame.orderBy("left_oid", "right_oid").limit(max_rows).collect():
                stmts.append(
                    f"MATCH (a {{`{OID_COL}`: {json.dumps(row['left_oid'])}}}), "
                    f"(b {{`{OID_COL}`: {json.dumps(row['right_oid'])}}}) "
                    f"MERGE (a)-[:`{rname}`]->(b)"
                )
        else:  # collapsed attributed edge: <end1>_oid, <end2>_oid, props…
            oid_cols = [c for c in cols if c.endswith("_oid") and c != "mid_oid"]
            prop_cols = [c for c in cols if c not in oid_cols and c != "mid_oid"]
            for row in frame.orderBy(*oid_cols).limit(max_rows).collect():
                props = {c: row[c] for c in prop_cols if row[c] is not None}
                stmts.append(
                    f"MATCH (a {{`{OID_COL}`: {json.dumps(row[oid_cols[0]])}}}), "
                    f"(b {{`{OID_COL}`: {json.dumps(row[oid_cols[1]])}}}) "
                    f"MERGE (a)-[r:`{rname}`]->(b) SET r += {json.dumps(props)}"
                )
    return stmts
