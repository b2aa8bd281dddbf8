"""Office text extraction (sources/office.py): docx/odt round-trips,
whitespace elements, escaping, and the document-loader + UI seams."""

import pytest

from architxt_spark.sources.office import (
    make_docx_bytes,
    make_odt_bytes,
    read_docx_paragraphs,
    read_odt_paragraphs,
)

PARAS = ["First paragraph.", "Costs < 5 & > 3.", "caf\xe9 na\xefve 中文"]


def test_docx_roundtrip():
    assert read_docx_paragraphs(make_docx_bytes(PARAS)) == PARAS


def test_odt_roundtrip():
    assert read_odt_paragraphs(make_odt_bytes(PARAS)) == PARAS


def test_docx_multi_run_tabs_and_breaks():
    """Paragraph text concatenates runs in order; w:tab and w:br render
    as whitespace — the shape real Word output has."""
    import io
    import zipfile

    from architxt_spark.sources.office import _CT, _RELS, _W

    doc = (
        '<?xml version="1.0"?>'
        f'<w:document xmlns:w="{_W}"><w:body>'
        "<w:p><w:r><w:t>a</w:t></w:r><w:r><w:tab/><w:t>b</w:t></w:r>"
        "<w:r><w:br/><w:t>c</w:t></w:r></w:p>"
        "<w:p><w:r><w:t xml:space=\"preserve\">  </w:t></w:r></w:p>"  # blank: dropped
        "</w:body></w:document>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", doc)
    assert read_docx_paragraphs(buf.getvalue()) == ["a\tb\nc"]


def test_odt_headings_and_nested_spans():
    import io
    import zipfile

    from architxt_spark.sources.office import _ODF_OFFICE, _ODF_TEXT

    content = (
        '<?xml version="1.0"?>'
        f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
        f'xmlns:text="{_ODF_TEXT}"><office:body><office:text>'
        "<text:h>Title</text:h>"
        "<text:p>lead <text:span>styled</text:span> tail</text:p>"
        "</office:text></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", content)
    paras = read_odt_paragraphs(buf.getvalue())
    assert paras[0] == "Title"
    assert "lead" in paras[1] and "styled" in paras[1] and "tail" in paras[1]


def test_not_office_raises():
    with pytest.raises(ValueError, match="docx"):
        read_docx_paragraphs(b"PK\x03\x04 not a real zip")
    with pytest.raises(ValueError, match="odt"):
        read_odt_paragraphs(make_docx_bytes(["x"]))  # wrong container kind


def test_read_document_file_docx_end_to_end(spark, tmp_path):
    """The document loader builds a forest with one GROUP row per
    paragraph — the same meta-model shape every other format yields."""
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.trees import rows_to_trees

    p = tmp_path / "memo.docx"
    p.write_bytes(make_docx_bytes(PARAS))
    nodes = read_document_file(spark, str(p))
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    assert len(trees) == len(PARAS)  # one GROUP row tree per paragraph
    leaves = {
        r.leaf_value for r in nodes.filter("leaf_value is not null").collect()
    }
    assert set(PARAS) <= leaves  # raw text survives, unicode intact


def test_ui_corpus_import_docx(spark, tmp_path):
    """A .docx upload flows through the UI corpus importer into the
    parse pipeline (paragraphs joined as the document text)."""
    import architxt_spark.ui as ui_mod
    import architxt_spark.ui.state as ui_state
    from test_ui import FakeStreamlit, Rerun, Upload

    st = FakeStreamlit(
        inputs={"Source Type": "Text Corpus"},
        pressed={"Load Corpus"},
        uploads={"Corpora": [Upload("memo.docx", make_docx_bytes(PARAS))]},
    )
    ui_state.use_streamlit(st)
    try:
        st.session_state["forest_root"] = str(tmp_path / "forest")
        with pytest.raises(Rerun):
            ui_mod.importer()
        assert len(ui_state.get_forest()) >= 1
    finally:
        ui_state.use_streamlit(None)


def test_pptx_roundtrip_and_gate():
    from architxt_spark.sources.office import make_pptx_bytes, read_pptx_slides

    slides = ["Title slide", "Bullet one\nBullet two & <more>", "caf\xe9 slide"]
    assert read_pptx_slides(make_pptx_bytes(slides)) == slides
    with pytest.raises(ValueError, match="pptx"):
        read_pptx_slides(make_docx_bytes(["x"]))  # wrong container kind


def test_read_document_file_pptx_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.trees import rows_to_trees

    slides = ["Alpha deck", "Beta\nGamma"]
    p = tmp_path / "deck.pptx"
    from architxt_spark.sources.office import make_pptx_bytes

    p.write_bytes(make_pptx_bytes(slides))
    nodes = read_document_file(spark, str(p))
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    assert len(trees) == 2  # one tree per slide
    leaves = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert set(slides) <= leaves


# ---------------------------------------------------------------------------
# r13: OpenDocument spreadsheets (.ods)
# ---------------------------------------------------------------------------


def test_ods_roundtrip_and_shapes():
    from architxt_spark.sources.office import make_ods_bytes, read_ods_sheets

    sheets = {
        "People": [["name", "age"], ["Alice", 30], [None, 7], ["Łukasz", -2.5]],
        "Empty": [],
    }
    got = read_ods_sheets(make_ods_bytes(sheets))
    assert got["People"] == [
        {"name": "Alice", "age": "30"},
        {"name": "", "age": "7"},  # the None gap reads as an empty cell
        {"name": "Łukasz", "age": "-2.5"},
    ]
    assert got["Empty"] == []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a .ods"):
        read_ods_sheets(b"PK\x03\x04 not a zip")


def test_ods_repeated_cells_and_rows():
    # LibreOffice writes repeated-empty runs with number-columns-repeated
    # (often to the 16k bound) — bounded expansion must not blow up
    from architxt_spark.sources.office import read_ods_sheets

    content = (
        '<?xml version="1.0"?>'
        '<office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
        ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">'
        "<table:table-row>"
        "<table:table-cell><text:p>h1</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="2">'
        "<text:p>h</text:p></table:table-cell>"
        "</table:table-row>"
        "<table:table-row>"
        "<table:table-cell><text:p>v</text:p></table:table-cell>"
        '<table:table-cell table:number-columns-repeated="16382"/>'
        "</table:table-row>"
        '<table:table-row table:number-rows-repeated="1048575"/>'
        "</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)
    got = read_ods_sheets(buf.getvalue())
    # the 16k empty-cell run and the million empty rows do NOT expand
    # (trailing empties trim); the data row keeps its one value
    assert got == {"S": [{"h1": "v"}]}


def test_ods_encrypted_both_schemes_and_loader(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.sources.office import make_ods_bytes, read_ods_sheets
    from architxt_spark.sources.ooxml_crypto import make_encrypted_odt

    sheets = {"S": [["k"], ["ods caf\xe9"]]}
    blob = make_ods_bytes(sheets)
    for scheme in ("aes", "blowfish"):
        enc = make_encrypted_odt(blob, "pw", scheme=scheme)
        assert read_ods_sheets(enc, password="pw") == read_ods_sheets(blob)
    p = tmp_path / "t.ods"
    p.write_bytes(blob)
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "ods caf\xe9" in vals


def test_odp_roundtrip_and_encrypted(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.sources.office import make_odp_bytes, read_odp_slides
    from architxt_spark.sources.ooxml_crypto import make_encrypted_odt

    slides = ["Title slide: caf\xe9", "", "Body\nwith two lines"]
    blob = make_odp_bytes(slides)
    assert read_odp_slides(blob) == slides
    for scheme in ("aes", "blowfish"):
        enc = make_encrypted_odt(blob, "pw", scheme=scheme)
        assert read_odp_slides(enc, password="pw") == slides
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not a .odp"):
        read_odp_slides(b"PK\x03\x04 nope")
    p = tmp_path / "deck.odp"
    p.write_bytes(blob)
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "Title slide: caf\xe9" in vals


# ---------------------------------------------------------------------------
# r14: sparse-.ods alignment + repeat bounds + .odp speaker notes
# ---------------------------------------------------------------------------


def test_ods_interior_empty_runs_keep_column_alignment():
    # LibreOffice writes interior gaps as one empty cell with
    # number-columns-repeated — values after the run must land under
    # their own headers, not shift left
    from architxt_spark.sources.office import make_ods_bytes, read_ods_sheets

    sheets = {
        "S": [
            ["A", "B", "C", "D", "E"],
            ["x", (None, 3), "y"],
        ]
    }
    got = read_ods_sheets(make_ods_bytes(sheets))
    assert got["S"] == [{"A": "x", "B": "", "C": "", "D": "", "E": "y"}]


def test_ods_repeated_content_cells_and_rows_expand_bounded():
    from architxt_spark.sources.office import (
        _ODS_ROW_BOUND,
        make_ods_bytes,
        read_ods_sheets,
    )

    # content repeats expand in full...
    sheets = {"S": [["h1", "h2", "h3"], [("v", 2), "w"], (["r", "s"], 3)]}
    got = read_ods_sheets(make_ods_bytes(sheets))
    assert got["S"] == [{"h1": "v", "h2": "v", "h3": "w"}] + [
        {"h1": "r", "h2": "s"}
    ] * 3
    # ...but a crafted million-fold CONTENT row caps at the row bound
    # instead of materializing a million lists on the driver
    sheets = {"S": [["h"], (["v"], 1_048_576)]}
    got = read_ods_sheets(make_ods_bytes(sheets))
    assert len(got["S"]) == _ODS_ROW_BOUND
    assert got["S"][0] == {"h": "v"} and got["S"][-1] == {"h": "v"}


def test_ods_all_empty_rows_emit_no_records():
    # interior blank rows: the xlsx readers never emit cell-less rows,
    # so sparse .ods sheets must not produce extra {} records
    from architxt_spark.sources.office import make_ods_bytes, read_ods_sheets

    sheets = {"S": [["h"], [None], ["a"], [(None, 5)], ["b"]]}
    got = read_ods_sheets(make_ods_bytes(sheets))
    assert got["S"] == [{"h": "a"}, {"h": "b"}]


def test_odp_speaker_notes_not_in_slide_text():
    # presentation:notes is a CHILD of draw:page in ODF; .pptx keeps
    # notes in separate parts — both readers must return slide text only
    from architxt_spark.sources.office import make_odp_bytes, read_odp_slides

    slides = ["Visible title", "Second slide"]
    blob = make_odp_bytes(slides, notes=["secret speaker note", ""])
    assert read_odp_slides(blob) == slides


def test_ods_randomized_repeat_alignment_fuzz():
    """~400 random sheets mixing value cells, explicit empties, repeated
    runs (empty and content) — the reader's buffered-run expansion must
    place every value under the header the fixture spec says it owns.
    Alignment bugs here are exactly the silent-misalignment class the
    r13 advice found; a handful of hand casings can't cover the run/
    flush interactions."""
    import random

    from architxt_spark.sources.office import make_ods_bytes, read_ods_sheets

    rng = random.Random(0x0D5)
    for trial in range(400):
        n_cols = rng.randint(1, 8)
        header = [f"c{i}" for i in range(n_cols)]
        n_rows = rng.randint(0, 5)
        rows, want = [], []
        for _ in range(n_rows):
            # build a row as fixture cells + the expected flat expansion
            cells, flat = [], []
            while len(flat) < n_cols and rng.random() < 0.85:
                kind = rng.random()
                if kind < 0.3:
                    v = f"v{rng.randint(0, 99)}"
                    cells.append(v)
                    flat.append(v)
                elif kind < 0.5:
                    cells.append(None)
                    flat.append("")
                elif kind < 0.75:
                    rep = rng.randint(2, 5)
                    cells.append((None, rep))
                    flat.extend([""] * rep)
                else:
                    rep = rng.randint(2, 4)
                    v = f"r{rng.randint(0, 99)}"
                    cells.append((v, rep))
                    flat.extend([v] * rep)
            rows.append(cells)
            # expected record: trailing empties trimmed, all-empty rows
            # dropped, values land under their positional header
            while flat and not flat[-1]:
                flat.pop()
            if flat:
                want.append({
                    header[i]: (flat[i] if i < len(flat) else "")
                    for i in range(n_cols)
                    if i < len(flat)
                })
        got = read_ods_sheets(make_ods_bytes({"S": [header] + rows}))["S"]
        assert got == want, (trial, rows, got, want)


# --- r14.5: value-attribute-only cells (machine-written formula cells) ---


def test_ods_value_attribute_fallback_for_formula_cells():
    """Machine writers often emit formula/typed cells with only
    office:* value attributes and no display paragraph — those cells
    must read their typed value, not vanish; a present text:p still
    wins."""
    import io
    import zipfile

    from architxt_spark.sources.office import read_ods_sheets

    content = (
        '<?xml version="1.0"?><office:document-content'
        ' xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0"'
        ' xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0"'
        ' xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0">'
        "<office:body><office:spreadsheet>"
        '<table:table table:name="S">'
        "<table:table-row>"
        "<table:table-cell><text:p>h1</text:p></table:table-cell>"
        "<table:table-cell><text:p>h2</text:p></table:table-cell>"
        "<table:table-cell><text:p>h3</text:p></table:table-cell>"
        "</table:table-row><table:table-row>"
        '<table:table-cell table:formula="of:=2*2" office:value-type="float"'
        ' office:value="4"/>'
        '<table:table-cell office:value-type="boolean"'
        ' office:boolean-value="true"/>'
        '<table:table-cell office:value-type="string"'
        ' office:string-value="computed text"/>'
        "</table:table-row><table:table-row>"
        '<table:table-cell office:value-type="date"'
        ' office:date-value="2020-03-01"/>'
        '<table:table-cell office:value-type="float" office:value="2.5"/>'
        "<table:table-cell office:value-type=\"float\" office:value=\"9\">"
        "<text:p>display wins</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:spreadsheet></office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        z.writestr("content.xml", content)
    assert read_ods_sheets(buf.getvalue()) == {"S": [
        {"h1": "4", "h2": "True", "h3": "computed text"},
        {"h1": "2020-03-01", "h2": "2.5", "h3": "display wins"},
    ]}
