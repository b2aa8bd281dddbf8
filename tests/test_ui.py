"""Exploration UI (architxt_spark/ui/): every page driven end-to-end
under a scripted streamlit fake — the same seam-testing posture as the
MLflow / delta-spark fakes (streamlit is absent in this container, so
the fake IS the test harness; a deployment swaps in the real module via
the same ``use_streamlit`` call)."""

import os

import pytest

import architxt_spark.ui as ui_mod
import architxt_spark.ui.state as ui_state
from architxt_spark.trees import forest_from_trees, parse_tree, rows_to_trees


class Rerun(Exception):
    """st.rerun() unwinds the script — streamlit's real control flow."""


class FakeStreamlit:
    """Scripted stand-in covering exactly the widget API the pages use.

    ``inputs`` keys widget labels (or data_editor keys) to returned
    values; ``pressed`` is the set of button labels that return True;
    ``uploads`` keys file_uploader labels to uploaded file-likes.  Every
    display call is recorded in ``calls`` for assertions.
    """

    def __init__(self, inputs=None, pressed=(), uploads=None):
        self.session_state = {}
        self.inputs = dict(inputs or {})
        self.pressed = set(pressed)
        self.uploads = dict(uploads or {})
        self.calls = []
        self.downloads = {}

    # -- layout: columns/sidebar/expander are self-shaped context mgrs --
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def columns(self, spec):
        n = spec if isinstance(spec, int) else len(spec)
        return [self] * n

    @property
    def sidebar(self):
        return self

    def spinner(self, *a, **k):
        return self

    def status(self, *a, **k):
        return self

    # -- value widgets ---------------------------------------------------
    def selectbox(self, label, options, **k):
        options = list(options)
        return self.inputs.get(label, options[0] if options else None)

    def text_input(self, label, value="", **k):
        return self.inputs.get(label, value)

    def number_input(self, label, *a, **k):
        default = k.get("value")
        if default is None and len(a) >= 3:
            default = a[2]
        return self.inputs.get(label, default)

    def toggle(self, label, value=False, **k):
        return self.inputs.get(label, value)

    def file_uploader(self, label, types=None, accept_multiple_files=False, **k):
        got = self.uploads.get(label)
        if accept_multiple_files:
            return got or []
        return got

    def button(self, label, disabled=False, **k):
        self.calls.append(("button", label, disabled))
        return label in self.pressed and not disabled

    def data_editor(self, df, **k):
        return self.inputs.get(k.get("key", "data_editor"), df)

    def download_button(self, label=None, data=None, file_name=None, **k):
        if callable(data):
            data = data()
        self.downloads[file_name] = data
        self.calls.append(("download", label, file_name))

    # -- display-only ----------------------------------------------------
    def _log(name):  # noqa: N805 — factory over self-less name
        def fn(self, *a, **k):
            self.calls.append((name, a[0] if a else None, k))

        return fn

    for _n in ("header", "subheader", "title", "write", "warning", "info",
               "success", "toast", "divider", "metric", "dataframe",
               "graphviz_chart", "set_page_config"):
        locals()[_n] = _log(_n)
    del _log, _n

    def rerun(self):
        raise Rerun()


class Upload:
    def __init__(self, name, data: bytes):
        self.name = name
        self._data = data

    def read(self):
        return self._data


@pytest.fixture
def fake(monkeypatch):
    def make(**kw):
        st = FakeStreamlit(**kw)
        ui_state.use_streamlit(st)
        return st

    yield make
    ui_state.use_streamlit(None)


def _seed_forest(spark, st, tmp_path, n=6):
    """Install a forest of group/relation trees as the session bucket."""
    st.session_state["forest_root"] = str(tmp_path / "forest")
    trees = {}
    for i in range(n):
        trees[f"t{i}"] = parse_tree(
            f"(ROOT (REL::works (GROUP::person (ENT::name p{i}) (ENT::age {20 + i}))"
            f" (GROUP::company (ENT::company c{i % 2}))))"
        )
    bucket = ui_state.get_forest()
    bucket.write(forest_from_trees(spark, trees))
    return bucket


def test_st_gate_raises_with_guidance(monkeypatch):
    ui_state.use_streamlit(None)
    monkeypatch.setitem(__import__("sys").modules, "streamlit", None)
    with pytest.raises((RuntimeError, ImportError)):
        ui_state.st()
    ui_state.use_streamlit(None)


def test_jsonl_import_page_end_to_end(spark, tmp_path, fake):
    from architxt_spark.trees import write_jsonl_forest

    nodes = forest_from_trees(
        spark, {"a": parse_tree("(ROOT (GROUP::g (ENT::id 1)))")}
    )
    path = str(tmp_path / "f.jsonl")
    write_jsonl_forest(nodes, path)  # spark text directory
    payload = b"".join(
        open(os.path.join(path, p), "rb").read()
        for p in sorted(os.listdir(path))
        if p.startswith("part-")
    )

    st = fake(
        pressed={"Load JSONL"},
        uploads={"JSONL File": [Upload("f.jsonl", payload)]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):  # update_metrics ends in st.rerun()
        ui_mod.importer()
    assert len(ui_state.get_forest()) == 1
    assert st.session_state["metrics"]["Total Trees"] == 1
    assert st.session_state["metrics"]["Groups"] == 1


def test_document_import_page(spark, tmp_path, fake):
    payload = b'{"people": [{"name": "Alice"}, {"name": "Bob"}]}'
    st = fake(
        inputs={"Source Type": "Document File"},
        pressed={"Load document"},
        uploads={"Document File": [Upload("people.json", payload)]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):
        ui_mod.importer()
    forest = ui_state.get_forest()
    assert len(forest) >= 1
    text = " ".join(
        str(t) for t in rows_to_trees(
            [r.asDict(recursive=True) for r in forest.read().collect()]
        ).values()
    )
    assert "Alice" in text and "Bob" in text


def test_corpus_import_page_stub_parser(spark, tmp_path, fake):
    st = fake(
        inputs={"Source Type": "Text Corpus"},
        pressed={"Load Corpus"},
        uploads={"Corpora": [Upload("doc.txt", b"Alice works. Bob rests.")]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):
        ui_mod.importer()
    assert len(ui_state.get_forest()) >= 1  # one tree per parsed sentence


def test_corpus_import_page_brat_tarball(spark, tmp_path, fake):
    """A BRAT-style tar.gz (txt + sibling ann) loads through the
    standoff-entity path — the reference's raw_load_corpus input."""
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in (
            ("corpus/d1.txt", b"Aspirin treats pain."),
            ("corpus/d1.ann", b"T1\tDRUG 0 7\tAspirin\n"),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    st = fake(
        inputs={"Source Type": "Text Corpus"},
        pressed={"Load Corpus"},
        uploads={"Corpora": [Upload("c.tar.gz", buf.getvalue())]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):
        ui_mod.importer()
    forest = ui_state.get_forest()
    assert len(forest) >= 1
    ents = forest.read().filter("node_type = 'ENT' AND node_name = 'DRUG'")
    assert ents.count() >= 1  # the standoff entity reached the forest


def test_visualizer_page_schema_dot_and_instances(spark, tmp_path, fake):
    st = fake(inputs={"Group": "person"})
    _seed_forest(spark, st, tmp_path)
    ui_mod.visualizer()
    dots = [c for c in st.calls if c[0] == "graphviz_chart"]
    assert len(dots) == 1
    dot = dots[0][1]
    assert '"GROUP::person" -> "ENT::name"' in dot
    assert "works" in dot
    frames = [c for c in st.calls if c[0] == "dataframe"]
    assert len(frames) == 1
    pdf = frames[0][1]
    # reference presentation contract: columns null-sorted then named
    assert set(pdf.columns) >= {"age", "name"}
    assert len(pdf) == 6


def test_visualizer_schema_dot_orientations():
    from architxt_spark.plans.schema import Relation, RelationOrientation, SchemaPlan
    from architxt_spark.ui.pages import schema_dot

    schema = SchemaPlan(
        groups={"a": frozenset({"x"}), "b": frozenset({"y"})},
        relations={
            Relation("r1", "a", "b", RelationOrientation.LEFT),
            Relation("r2", "a", "b", RelationOrientation.RIGHT),
            Relation("r3", "a", "b", RelationOrientation.BOTH),
        },
    )
    dot = schema_dot(schema)
    assert '"GROUP::a" -> "GROUP::b" [label="r1"];' in dot
    assert '"GROUP::b" -> "GROUP::a" [label="r2"];' in dot
    assert 'dir=both' in dot


def test_labelling_page_apply_renaming(spark, tmp_path, fake):
    import pandas as pd

    st = fake(
        inputs={
            "group_editor": pd.DataFrame(
                [
                    {"Current Name": "company", "New Name": "employer"},
                    {"Current Name": "person", "New Name": "person"},
                ]
            ),
        },
        pressed={"Apply Renaming"},
    )
    _seed_forest(spark, st, tmp_path)
    with pytest.raises(Rerun):
        ui_mod.labelling()
    names = {
        r.node_name
        for r in ui_state.get_forest().read().filter("node_type = 'GROUP'").collect()
    }
    assert names == {"person", "employer"}


def test_labelling_page_llm_suggestions_stub(spark, tmp_path, fake):
    st = fake(pressed={"Get AI Suggestions"})
    _seed_forest(spark, st, tmp_path)
    with pytest.raises(Rerun):
        ui_mod.labelling()
    gdf = st.session_state["group_renames"]
    # StubChatModel answers with the upper-cased attribute join
    by_cur = dict(zip(gdf["Current Name"], gdf["New Name"]))
    assert by_cur["person"] == "AGE_NAME"
    rdf = st.session_state["relation_renames"]
    assert list(rdf["New Name"]) == ["AGE_NAME_COMPANY"]


def test_simplification_page_rule_based(spark, tmp_path, fake):
    st = fake(pressed={"Apply Rule-Based Simplification"})
    _seed_forest(spark, st, tmp_path)
    before = ui_state.get_forest().read().count()
    with pytest.raises(Rerun):
        ui_mod.simplification()
    forest = ui_state.get_forest()
    assert len(forest) == 6  # rewrite preserves the tree count
    assert forest.read().count() > 0
    assert st.session_state["metrics"]["Total Trees"] == 6
    assert before > 0


def test_exporter_jsonl_download(spark, tmp_path, fake):
    st = fake()
    _seed_forest(spark, st, tmp_path)
    ui_mod.exporter()
    payload = st.downloads["architxt_export.jsonl"]
    assert payload.count(b"\n") == 6  # one line per tree


def test_exporter_sql_writes_sqlite(spark, tmp_path, fake):
    import sqlite3

    out = str(tmp_path / "out.db")
    st = fake(
        inputs={"Format": "SQL Database", "SQLite path": out},
        pressed={"Export to SQL"},
    )
    _seed_forest(spark, st, tmp_path)
    ui_mod.exporter()
    assert os.path.exists(out)
    con = sqlite3.connect(out)
    tables = {r[0] for r in con.execute(
        "SELECT name FROM sqlite_master WHERE type='table'"
    )}
    con.close()
    assert "person" in tables and "company" in tables
    assert ("success", "Exported successfully.", {}) in st.calls


def test_exporter_graph_fallback_script(spark, tmp_path, fake):
    st = fake(
        inputs={"Format": "Graph Database"},
        pressed={"Export to Graph"},
    )
    _seed_forest(spark, st, tmp_path)
    ui_mod.exporter()  # no connector on the classpath -> script download
    script = st.downloads["architxt_export.cypher"].decode()
    assert "MERGE (n:`person`" in script and "MERGE (a)-[:`works`]->(b)" in script


def test_exporter_empty_forest_shows_info(spark, tmp_path, fake):
    st = fake()
    st.session_state["forest_root"] = str(tmp_path / "forest")
    ui_mod.exporter()
    assert ("info", "No data to export.", {}) in st.calls


def test_main_smoke_and_clear(spark, tmp_path, fake):
    st = fake(inputs={"Page": "Visualize"})
    _seed_forest(spark, st, tmp_path)
    ui_mod.main()  # navigation fallback renders the visualizer
    assert any(c[0] == "graphviz_chart" for c in st.calls)
    metrics = [c for c in st.calls if c[0] == "metric"]
    assert len(metrics) == 4
    # clear: the button press path discards every tree
    st2 = fake(pressed={"Clear data"}, inputs={"Page": "Visualize"})
    st2.session_state["forest_root"] = st.session_state["forest_root"]
    with pytest.raises(Rerun):
        ui_mod.main()
    assert len(ui_state.get_forest()) == 0


def test_document_import_page_legacy_doc_and_ppt(spark, tmp_path, fake):
    """r14: the importer accepts legacy Word/PowerPoint binaries and
    routes them through the worddoc/ppt readers."""
    from architxt_spark.sources.ppt import make_ppt_bytes
    from architxt_spark.sources.worddoc import make_doc_bytes

    st = fake(
        inputs={"Source Type": "Document File"},
        pressed={"Load document"},
        uploads={"Document File": [
            Upload("memo.doc", make_doc_bytes(["Carol drafts memos"])),
            Upload("deck.ppt", make_ppt_bytes(["Dave presents decks"])),
        ]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):
        ui_mod.importer()
    forest = ui_state.get_forest()
    text = " ".join(
        str(t) for t in rows_to_trees(
            [r.asDict(recursive=True) for r in forest.read().collect()]
        ).values()
    )
    assert "Carol" in text and "Dave" in text


def test_corpus_import_page_mbox_archive(spark, tmp_path, fake):
    """r14: an mbox mailing-list archive loads as one corpus document
    per message."""
    from architxt_spark.sources.mail import make_mbox_bytes

    blob = make_mbox_bytes(
        [("hello", "Alice works hard."), ("again", "Bob rests today.")]
    )
    st = fake(
        inputs={"Source Type": "Text Corpus"},
        pressed={"Load Corpus"},
        uploads={"Corpora": [Upload("list.mbox", blob)]},
    )
    st.session_state["forest_root"] = str(tmp_path / "forest")
    with pytest.raises(Rerun):
        ui_mod.importer()
    assert len(ui_state.get_forest()) >= 2  # both messages parsed
