"""NLP enrichment tests: BRAT standoff parsing, sentence/entity/relation
splitting, entity-insertion tree surgery
(reference parity: ``architxt/nlp/brat.py``, ``nlp/utils.py``,
``nlp/parser/__init__.py``)."""

import pytest

from architxt_spark.nlp import (
    parse_ann_entities,
    parse_ann_relations,
    parse_sentences_df,
    split_entities,
    split_relations,
    split_sentences,
)
from architxt_spark.nlp.parser import enrich_sentence_tree
from architxt_spark.trees import format_tree

ANN = (
    "T1\tDrug 0 7\taspirin\n"
    "T2\tDisease 15 23\theadache\n"
    "T3\tDrug 24 33\tibuprofen\n"
    "R1\tTreats Arg1:T1 Arg2:T2\n"
    "#1\tAnnotatorNotes T1\tignored comment\n"
)
TXT = "aspirin treats headache\nibuprofen too"


@pytest.fixture(scope="module")
def brat_df(spark):
    return spark.createDataFrame([("d1", TXT, ANN)], "doc_id string, txt string, ann string")


def test_parse_ann_entities(spark, brat_df):
    ents = parse_ann_entities(brat_df).orderBy("ent_id").collect()
    assert [(e["ent_id"], e["name"], e["start"], e["end"], e["value"]) for e in ents] == [
        ("T1", "DRUG", 0, 7, "aspirin"),
        ("T2", "DISEASE", 15, 23, "headache"),
        ("T3", "DRUG", 24, 33, "ibuprofen"),
    ]


def test_parse_ann_filters_and_renames(spark, brat_df):
    ents = parse_ann_entities(brat_df, allowed=["MEDICATION"], renames={"Drug": "Medication"})
    assert {e["name"] for e in ents.collect()} == {"MEDICATION"}
    assert ents.count() == 2


def test_parse_ann_relations(spark, brat_df):
    rels = parse_ann_relations(brat_df).collect()
    assert [(r["rel_id"], r["name"], r["src"], r["dst"]) for r in rels] == [
        ("R1", "TREATS", "T1", "T2")
    ]


def test_split_sentences_offsets(spark, brat_df):
    sents = split_sentences(brat_df).orderBy("sent_idx").collect()
    assert [(s["sent_idx"], s["sentence"], s["sent_start"], s["sent_end"]) for s in sents] == [
        (0, "aspirin treats headache", 0, 23),
        (1, "ibuprofen too", 24, 37),
    ]


def test_split_entities_rebases(spark, brat_df):
    sents = split_sentences(brat_df)
    ents = parse_ann_entities(brat_df)
    se = split_entities(sents, ents).orderBy("ent_id").collect()
    got = [(e["ent_id"], e["sent_idx"], e["start"], e["end"]) for e in se]
    assert ("T1", 0, 0, 7) in got
    assert ("T2", 0, 15, 23) in got
    assert ("T3", 1, 0, 9) in got


def test_split_relations_same_sentence(spark, brat_df):
    sents = split_sentences(brat_df)
    se = split_entities(sents, parse_ann_entities(brat_df))
    rels = split_relations(se, parse_ann_relations(brat_df)).collect()
    assert [(r["rel_id"], r["sent_idx"]) for r in rels] == [("R1", 0)]


# --- tree surgery golden tests ---

def test_enrich_basic_insertion():
    t = enrich_sentence_tree("aspirin treats bad headache", [("DRUG", 0, 7), ("DISEASE", 15, 27)])
    assert format_tree(t) == "(SENT (ENT::DRUG aspirin) treats (ENT::DISEASE bad headache))"


def test_enrich_duplicate_span_skipped():
    t = enrich_sentence_tree("aspirin works", [("DRUG", 0, 7), ("MED", 0, 7)])
    assert format_tree(t) == "(SENT (ENT::DRUG aspirin) works)"


def test_enrich_nested_unnests():
    t = enrich_sentence_tree(
        "acute migraine attack hurts", [("SYNDROME", 0, 21), ("DISEASE", 6, 14)]
    )
    assert format_tree(t) == (
        "(SENT (REL::nested (ENT::SYNDROME acute migraine attack) (ENT::DISEASE migraine)) hurts)"
    )


def test_parse_sentences_df_forest(spark, brat_df):
    sents = split_sentences(brat_df)
    se = split_entities(sents, parse_ann_entities(brat_df))
    nodes = parse_sentences_df(sents, se)
    from architxt_spark.trees import rows_to_trees

    trees = rows_to_trees([r.asDict() for r in nodes.collect()])
    rendered = {tid: format_tree(t) for tid, t in trees.items()}
    assert rendered["d1.0"] == (
        "(UNDEF_d1.0 (ENT::DRUG aspirin) treats (ENT::DISEASE headache))"
    )
    assert rendered["d1.1"] == "(UNDEF_d1.1 (ENT::DRUG ibuprofen) too)"


# --- coordination fixes (parser/__init__.py:247-407 golden cases) ---

def test_fix_coord_basic():
    from architxt_spark.nlp.parser import fix_coord
    from architxt_spark.trees import parse_tree, format_tree

    t = parse_tree("(S (NP apples (COORD (CCONJ and) (NP oranges))))")
    assert fix_coord(t)
    assert format_tree(t) == "(S (CONJ (NP apples) (NP oranges)))"


def test_fix_conj_flattens():
    from architxt_spark.nlp.parser import fix_conj
    from architxt_spark.trees import parse_tree, format_tree

    t = parse_tree("(S (CONJ (CONJ (NP a) (NP b)) (NP c)))")
    assert fix_conj(t)
    assert format_tree(t) == "(S (CONJ (NP a) (NP b) (NP c)))"


def test_fix_all_coord_fixpoint():
    from architxt_spark.nlp.parser import fix_all_coord
    from architxt_spark.trees import parse_tree, format_tree

    t = parse_tree(
        "(S (NP apples (COORD (CCONJ and) (NP oranges (COORD (CCONJ and) (NP pears))))))"
    )
    assert fix_all_coord(t)
    out = format_tree(t)
    assert "COORD" not in out and out.count("CONJ") >= 1


def test_regex_extractor_and_resolver(spark):
    """NER + KB-linking boundaries: gazetteer regex extraction adds ENT
    nodes; the dict resolver canonicalizes their values (reference
    entity_extractor.py:16-47 / entity_resolver.py:19-60)."""
    from pyspark.sql import functions as F

    from architxt_spark import pipeline
    from architxt_spark.nlp import DictResolver, RegexExtractor

    docs = spark.createDataFrame(
        [("d1", "Aspirin helps headaches.\nIbuprofen also works.")],
        "doc_id string, txt string",
    )
    extractor = RegexExtractor.from_gazetteer({"DRUG": ["Aspirin", "Ibuprofen"]})
    resolver = DictResolver({"aspirin": "acetylsalicylic acid"})
    nodes = pipeline.load_corpus(docs, extractor=extractor, resolver=resolver)
    ents = nodes.filter(F.col("node_type") == "ENT").collect()
    assert {r["node_name"] for r in ents} == {"DRUG"}
    # leaves keep the surface form; the KB-resolved value rides metadata
    resolved = {
        (r["metadata"] or {}).get("resolved_value") for r in ents
    }
    assert "acetylsalicylic acid" in resolved  # Aspirin resolved
    assert None in resolved  # Ibuprofen unresolved -> no metadata entry
