"""Web/ebook text sources (sources/webdoc.py): HTML, Markdown, EPUB."""

import pytest

from architxt_spark.sources.webdoc import (
    make_epub_bytes,
    read_epub_chapters,
    read_html_paragraphs,
    read_markdown_paragraphs,
)


def test_html_block_extraction():
    html = (
        b"<html><head><title>T</title><style>p{color:red}</style></head>"
        b"<body><h1>Header &amp; more</h1><p>First  para with <b>bold</b>.</p>"
        b'<script>var x = "<p>fake</p>";</script>'
        b"<div>Second<br>third line</div><ul><li>item &#233;</li></ul>"
        b"</body></html>"
    )
    assert read_html_paragraphs(html) == [
        "Header & more",
        "First para with bold.",
        "Second",
        "third line",
        "item é",
    ]


def test_html_declared_charset():
    html = (
        b'<html><head><meta charset="iso-8859-1"></head>'
        b"<body><p>caf\xe9</p></body></html>"
    )
    assert read_html_paragraphs(html) == ["café"]


def test_markdown_paragraphs_headers_links():
    md = (
        b"# Title\n\nPara one with [a link](http://x) inline and "
        b"![img](y.png).\n\nPara two\ncontinues.\n\n    indented code\n"
    )
    assert read_markdown_paragraphs(md) == [
        "Title",
        "Para one with a link inline and img.",
        "Para two\ncontinues.",
        "indented code",
    ]


def test_epub_spine_order_is_load_bearing():
    chs = ["Alpha chapter\nsecond para", "Beta chapter café", "Gamma"]
    blob = make_epub_bytes(chs)
    # chapter FILES are named in reverse; only the OPF spine restores
    # document order
    assert read_epub_chapters(blob) == chs
    # the sloppy fallback (no OPF) sorts by name — reversed here
    assert read_epub_chapters(make_epub_bytes(chs, sloppy=True)) == chs[::-1]
    with pytest.raises(ValueError, match="not an .epub"):
        read_epub_chapters(b"nope")


def test_read_document_file_web_formats_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    cases = {
        "page.html": b"<html><body><p>alpha beta</p><p>gamma caf\xc3\xa9</p></body></html>",
        "note.md": b"alpha beta\n\ngamma caf\xc3\xa9\n",
        "book.epub": make_epub_bytes(["alpha beta", "gamma café"]),
    }
    for name, payload in cases.items():
        p = tmp_path / name
        p.write_bytes(payload)
        nodes = read_document_file(spark, str(p))
        vals = {
            r.leaf_value for r in nodes.filter("leaf_value is not null").collect()
        }
        assert "alpha beta" in vals and "gamma café" in vals, (name, vals)
