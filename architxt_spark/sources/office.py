"""Office-document text extraction — ``.docx`` (OOXML WordprocessingML)
and ``.odt`` (OpenDocument Text) — pure stdlib (``zipfile`` +
``xml.etree``), no python-docx/odfpy.

Beyond-reference source: the reference's document loader stops at
JSON/XML/CSV/YAML/Excel (``loader/documents.py:22-29``), but real
corpus drops are full of word-processor files.  Both formats are zip
containers holding one main XML part; extraction walks the paragraph
elements and concatenates their descendant text runs, with explicit
tabs/line-breaks rendered as whitespace.  Namespace handling matches on
LOCAL names, so documents from any producer (Word, LibreOffice, Google
Docs export) parse regardless of prefix choices.

``make_docx_bytes`` / ``make_odt_bytes`` are fixture twins writing
structurally honest containers (content types + rels for OOXML,
mimetype-first entry for ODF) the round-trip tests drive.
"""

from __future__ import annotations

import io
import zipfile
from xml.etree import ElementTree as ET


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _para_text(el) -> str:
    """Concatenated text of one paragraph element: every text node AND
    element tail in document order (ODF intersperses bare text with
    styled spans), tab/break elements as whitespace."""
    parts: list[str] = []

    def walk(node) -> None:
        name = _local(node.tag)
        if name == "tab":
            parts.append("\t")
        elif name in ("br", "cr", "line-break"):
            parts.append("\n")
        if node.text:
            parts.append(node.text)
        for child in node:
            walk(child)
            if child.tail:
                parts.append(child.tail)

    walk(el)
    return "".join(parts)


def read_docx_paragraphs(path_or_bytes) -> list[str]:
    """Paragraph texts of a ``.docx`` in document order (empty
    paragraphs dropped).  Accepts a path or raw bytes."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        with zipfile.ZipFile(src) as z:
            with z.open("word/document.xml") as f:
                root = ET.parse(f).getroot()
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .docx (no word/document.xml zip entry)") from e
    out = []
    for el in root.iter():
        if _local(el.tag) == "p":
            text = _para_text(el)
            if text.strip():
                out.append(text)
    return out


def read_odt_paragraphs(path_or_bytes) -> list[str]:
    """Paragraph + heading texts of an ``.odt`` in document order."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        with zipfile.ZipFile(src) as z:
            with z.open("content.xml") as f:
                root = ET.parse(f).getroot()
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .odt (no content.xml zip entry)") from e
    out = []
    for el in root.iter():
        if _local(el.tag) in ("p", "h"):
            text = _para_text(el)
            if text.strip():
                out.append(text)
    return out


# ---------------------------------------------------------------------------
# fixture twins
# ---------------------------------------------------------------------------

_W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType='
    '"application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType='
    '"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
    "</Types>"
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>'
    "</Relationships>"
)

_ODF_TEXT = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
_ODF_OFFICE = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def make_docx_bytes(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<w:p><w:r><w:t xml:space=\"preserve\">{_xml_escape(p)}</w:t></w:r></w:p>"
        for p in paragraphs
    )
    doc = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W}"><w:body>{body}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CT)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def make_odt_bytes(paragraphs: list[str]) -> bytes:
    body = "".join(
        f"<text:p>{_xml_escape(p)}</text:p>" for p in paragraphs
    )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
        f'xmlns:text="{_ODF_TEXT}">'
        f"<office:body><office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        # per the ODF packaging spec the mimetype entry comes first, STORED
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.text",
        )
        z.writestr("content.xml", content)
    return buf.getvalue()
