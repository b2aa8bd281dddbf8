"""architxt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Neplex/ArchiTXT.

ArchiTXT is a text/database-to-database structuring engine: it ingests
unstructured text, relational databases, and nested documents into a single
tree-shaped meta-model, iteratively rewrites the trees to discover a
relational schema, and extracts tabular datasets.

This package re-expresses every operator Spark-first:

- ``architxt_spark.model``      — the columnar node-table tree representation
- ``architxt_spark.trees``      — tree-string / JSON codecs (bracketed s-expr)
- ``architxt_spark.sources``    — relational / document / JSONL loaders
- ``architxt_spark.plans``      — schema induction, validation, extraction
- ``architxt_spark.operators``  — tree-rewriting operations + fixpoint loop
- ``architxt_spark.metrics``    — FD confidence / redundancy / inspector
- ``architxt_spark.similarity`` — label-set similarity, LSH clustering
- ``architxt_spark.sinks``      — SQL / Cypher exporters
- ``architxt_spark.bucket``     — persistent forest store (parquet generations)
- ``architxt_spark.nlp``        — BRAT parsing, sentence/entity splitting, parser boundary
- ``architxt_spark.llm``        — LLM-rewrite plumbing (batching, sanitize, vocab)
- ``architxt_spark.generator``  — synthetic instances from a schema
- ``architxt_spark.pipeline``   — CLI-verb facade (load corpus/sql/graph, simplify, export)
- ``architxt_spark.functions``  — text analysis, dedup, ANN, multimodal
- ``architxt_spark.streaming``  — Structured Streaming ingestion/aggregation

Trees are never recursive structs: a forest is ONE DataFrame with one row per
node (see ``model.NODE_SCHEMA``), partitioned by ``tree_id``.  Every rewrite
is an immutable ``nodes -> nodes'`` transform, letting Catalyst plan joins,
pushdowns, and shuffles instead of hand-scheduled pointer surgery.
"""

__version__ = "0.1.0"

from architxt_spark.model import NODE_SCHEMA, NodeType  # noqa: F401
