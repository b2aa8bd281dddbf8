"""C4-style line-level cleaning (functions/text.py c4_clean / c4_keep).

Rule-by-rule unit coverage plus the DuckDB-twin parity the registry
oracle relies on (including the empty/NULL edge where DuckDB's
array_to_string diverges from Spark's array_join).
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from architxt_spark.functions import text as T

DOCS = [
    # kept: 3 good sentences; bad lines (short/no-punct/js/policy) dropped
    (1, 'This is a good long sentence here.\nshort one.\nno punct at all five words\n'
        'Please enable javascript to view.\nWe value your privacy policy here.\n'
        'Another fine long sentence stands here!\nAnd a third good sentence ends here?'),
    # page-level lorem ipsum drop (lines themselves fine)
    (2, 'lorem ipsum dolor sit amet consectetur.\nThis good long sentence is kept fine.\n'
        'Second good long sentence right here.\nThird good long sentence goes here.'),
    # page-level curly-brace drop
    (3, 'function f() { return 1; }\nA perfectly good long sentence here.\n'
        'Second good long sentence right here.\nThird good long sentence goes here.'),
    # quote-terminal line counts; 3 sentences -> kept
    (4, 'He said "this line ends with a quote"\nOne more very good sentence here.\n'
        'Yet another quite good sentence here.\nFinal very good sentence ends here.'),
    # too few sentences after cleaning -> dropped
    (5, 'Only one good long sentence here.\nAnd a second good sentence here.'),
    (6, ''),
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    clean = T.c4_clean(F.col("text"))
    rows = (
        df.select("id", clean.alias("clean"), T.c4_keep(F.col("text"), clean).alias("keep"))
        .orderBy("id")
        .collect()
    )
    return {r.id: r for r in rows}


def test_line_rules(cleaned):
    kept_lines = cleaned[1].clean.split("\n")
    assert kept_lines == [
        "This is a good long sentence here.",
        "Another fine long sentence stands here!",
        "And a third good sentence ends here?",
    ]
    assert cleaned[1].keep


def test_page_rules(cleaned):
    assert not cleaned[2].keep  # lorem ipsum
    assert not cleaned[3].keep  # curly brace
    assert cleaned[4].keep      # quote-terminated line counts as terminal
    assert '"this line ends with a quote"' in cleaned[4].clean
    assert not cleaned[5].keep  # < 3 sentences after cleaning


def test_empty_doc(cleaned):
    assert cleaned[6].clean == ""
    assert cleaned[6].keep is False


def test_duckdb_twin_parity(spark):
    docs = DOCS + [(7, None)]
    df = spark.createDataFrame(docs, "id long, text string")
    clean = T.c4_clean(F.col("text"))
    srows = (
        df.select("id", clean.alias("clean"), T.c4_keep(F.col("text"), clean).alias("keep"))
        .orderBy("id")
        .collect()
    )
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs, columns=["id", "text"]))
    c = T.c4_clean_sql("text")
    drows = con.execute(
        f"SELECT id, {c} AS clean, {T.c4_keep_sql('text', c)} AS keep FROM d ORDER BY id"
    ).fetchall()
    for s, (_, dclean, dkeep) in zip(srows, drows):
        assert s.clean == dclean, s.id
        assert s.keep == dkeep, s.id


def test_curation_line_clean_stage(spark):
    """line_clean=True prepends the C4 stage: census gains a 'clean' row
    (replayed in DuckDB) and survivors carry CLEANED text."""
    from architxt_spark.functions.curation import curate_corpus, curation_census_sql

    def page(i, extra=""):
        lines = [
            f"The sturdy engine number {i} hums along the valley track today.",
            f"Every carriage behind it carries {i + 3} crates of ripe fruit now.",
            "Please enable javascript to view this fancy widget.",
            f"Workers at the station wave as the long train {i} passes by.",
            f"The evening light settles over the quiet platform number {i}.",
        ]
        return "\n".join(lines) + extra

    rows = [(i, page(i)) for i in range(8)]
    rows.append((50, page(50, "\nlorem ipsum dolor sit amet.")))  # page-level drop
    rows.append((51, "short.\ntiny line.\nno."))                  # all lines dropped
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept, census = curate_corpus(df, line_clean=True)
    got = sorted((r.stage, r.n_docs) for r in census.collect())

    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    oracle = sorted(con.execute(curation_census_sql("documents", line_clean=True)).fetchall())
    assert got == oracle
    c = dict(got)
    assert c["input"] == 10 and c["clean"] == 8
    assert c["quality"] <= c["clean"] and c["dedup"] <= c["quality"]
    for r in kept.collect():
        assert "javascript" not in r.text


from hypothesis import given, settings, strategies as st

_line = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)


@settings(max_examples=10, deadline=None)
@given(lines=st.lists(_line, max_size=8))
def test_c4_clean_is_line_subsequence_property(spark_global, lines):
    """c4_clean output is always a subsequence of the input lines (it
    filters, never rewrites), and cleaning is idempotent."""
    text = "\n".join(lines)
    df = spark_global.createDataFrame([(text,)], "text string")
    clean = df.select(T.c4_clean(F.col("text")).alias("c")).first().c
    kept = clean.split("\n") if clean else []
    it = iter(lines)
    assert all(any(k == x for x in it) for k in kept)  # subsequence
    clean2 = (
        spark_global.createDataFrame([(clean,)], "text string")
        .select(T.c4_clean(F.col("text")).alias("c"))
        .first()
        .c
    )
    assert clean2 == clean


@pytest.fixture(scope="module")
def spark_global(spark):
    return spark


def test_dedup_lines_parity(spark):
    """Within-doc line dedup keeps first occurrences in order and matches
    the DuckDB twin exactly (including NULL/empty/all-dup edges)."""
    docs = [
        (1, "nav menu\nA real first sentence here.\nnav menu\nSecond real one.\nnav menu"),
        (2, "only\nonly\nonly"),
        (3, ""),
        (4, None),
        (5, "a\nb\nc"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    srows = {
        r.id: r.d
        for r in df.select("id", T.dedup_lines(F.col("text")).alias("d")).collect()
    }
    assert srows[1] == "nav menu\nA real first sentence here.\nSecond real one."
    assert srows[2] == "only" and srows[3] == "" and srows[4] is None
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs, columns=["id", "text"]))
    drows = dict(
        con.execute(f"SELECT id, {T.dedup_lines_sql('text')} FROM d").fetchall()
    )
    assert srows == drows


def test_line_lang_profile_parity(spark):
    """Per-line language segmentation: dominant language, known-line
    counts, mixed flag — exact DuckDB-twin parity."""
    docs = [
        (1, "the cat and the dog sit in it\nel perro y el gato en la casa\n"
            "the sun is in the sky for now"),                      # en-dominant, mixed
        (2, "le chien est dans la maison\nle chat est dans le jardin"),  # fr only
        (3, "xyzzy qwerty\nasdf ghjkl"),                           # nothing identified
        (4, ""),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        r.id: r.p.asDict()
        for r in df.select("id", T.line_lang_profile(F.col("text")).alias("p")).collect()
    }
    assert got[1]["dominant_lang"] == "en" and got[1]["mixed"] is True
    assert got[1]["n_known"] == 3 and got[1]["n_dominant"] == 2
    assert got[2] == {"n_lines": 2, "n_known": 2, "n_dominant": 2,
                      "dominant_lang": "fr", "mixed": False}
    assert got[3]["dominant_lang"] == "und" and got[3]["mixed"] is False
    con = duckdb.connect()
    con.register("d", pd.DataFrame(docs, columns=["id", "text"]))
    want = {}
    for rid, p in con.execute(
        f"SELECT id, {T.line_lang_profile_sql('text')} FROM d"
    ).fetchall():
        want[rid] = p
    assert got == want
