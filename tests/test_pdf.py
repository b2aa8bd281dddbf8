"""Basic PDF text extraction (sources/pdf.py): round-trips through the
fixture twin, string-escape/hex/TJ decoding, gates, loader seam."""

import zlib

import pytest

from architxt_spark.sources.pdf import (
    _extract_text,
    make_pdf_bytes,
    read_pdf_pages,
)

PAGES = [
    "Hello corpus world.\nSecond line with (parens) and \\ backslash.",
    "Page two: caf\xe9 text.",
]


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(compress):
    blob = make_pdf_bytes(PAGES, compress=compress)
    got = read_pdf_pages(blob)
    assert len(got) == 2
    assert got[0] == PAGES[0]
    assert got[1] == PAGES[1]


def test_pdf_empty_and_multiline_pages():
    pages = ["", "a\nb\nc\nd"]
    got = read_pdf_pages(make_pdf_bytes(pages))
    assert got[0] == "" and got[1] == "a\nb\nc\nd"


def test_extract_text_hex_and_tj_arrays():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(kerned )-120(words)] TJ "
        b"0 -14 Td <48656c6c6f> Tj "
        b"ET"
    )
    text = _extract_text(content)
    assert "kerned words" in text
    assert "Hello" in text


def test_extract_text_octal_and_escapes():
    content = rb"BT (\110i\t\(deep\)) Tj ET"
    assert _extract_text(content) == "Hi\t(deep)"


def test_pdf_gates():
    with pytest.raises(ValueError, match="not a PDF"):
        read_pdf_pages(b"%FDP nope")
    blob = make_pdf_bytes(["x"]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="encrypted"):
        read_pdf_pages(blob)
    corrupt = make_pdf_bytes(["x"])
    # truncate the flate stream body -> loud ValueError, not garbage
    at = corrupt.index(b"stream\n") + 7
    end = corrupt.index(b"\nendstream")
    bad = corrupt[:at] + corrupt[at:end][: (end - at) // 2] + corrupt[end:]
    bad = bad.replace(
        f"/Length {end - at}".encode(), f"/Length {(end - at) // 2}".encode()
    )
    with pytest.raises(ValueError, match="FlateDecode"):
        read_pdf_pages(bad)


def test_pdf_survives_missing_xref():
    """Real-world truncated PDFs often lose the xref; the object scan
    must not depend on it."""
    blob = make_pdf_bytes(PAGES)
    truncated = blob[: blob.index(b"xref")]
    assert read_pdf_pages(truncated)[0] == PAGES[0]


def test_read_document_file_pdf_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.trees import rows_to_trees

    p = tmp_path / "report.pdf"
    p.write_bytes(make_pdf_bytes(PAGES))
    nodes = read_document_file(spark, str(p))
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    assert len(trees) == 2  # one tree per page
    leaves = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert any("Hello corpus world." in (v or "") for v in leaves)
    assert any("caf\xe9" in (v or "") for v in leaves)
