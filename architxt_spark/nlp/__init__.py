"""NLP enrichment operators (text → meta-model), SURVEY §2.7.

- :mod:`architxt_spark.nlp.brat` — BRAT standoff (.ann) parsing as pure
  column operations;
- :mod:`architxt_spark.nlp.sentences` — sentence splitting + per-sentence
  entity/relation re-basing as DataFrame transforms;
- :mod:`architxt_spark.nlp.parser` — constituency parsing boundary.  Real
  parsers (CoreNLP HTTP, benepar) are NOT in this container, so the
  default is a deterministic flat-bracket stub behind the same
  ``mapInPandas`` plumbing; entity insertion / unnesting / UNDEF
  relabeling (the tree surgery) is real.
"""

from architxt_spark.nlp.brat import parse_ann_entities, parse_ann_relations
from architxt_spark.nlp.enrich import (
    DictResolver,
    EntityExtractor,
    EntityResolver,
    RegexExtractor,
)
from architxt_spark.nlp.sentences import split_entities, split_relations, split_sentences
from architxt_spark.nlp.parser import enrich_sentence_tree, parse_sentences_df

__all__ = [
    "parse_ann_entities",
    "parse_ann_relations",
    "split_entities",
    "split_relations",
    "split_sentences",
    "enrich_sentence_tree",
    "parse_sentences_df",
    "EntityExtractor",
    "RegexExtractor",
    "EntityResolver",
    "DictResolver",
]
