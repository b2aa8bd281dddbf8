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

# ODF repeat-expansion caps.  LibreOffice writes number-columns-repeated
# runs out to the 16384-column sheet limit and number-rows-repeated out
# to the 1048576-row limit as trailing filler; interior runs expand in
# full below these caps (alignment depends on it), but a crafted repeat
# count can never materialize unbounded driver memory — columns cap at
# the ODF 1.2 column bound, duplicated CONTENT rows at 65536 copies
# (beyond which identical records are filler, not data).
_ODS_COL_BOUND = 16384
_ODS_ROW_BOUND = 65536


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


def _ooxml_source(path_or_bytes, password: str = ""):
    """File-like (or passthrough path) for an OOXML zip, transparently
    decrypting the OLE2 password-protected container shape — Standard
    and Agile encryption, Excel's default password tried automatically
    (``sources/ooxml_crypto.py``)."""
    ole2 = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
        if not data.startswith(ole2):
            return io.BytesIO(data)
    else:
        with open(path_or_bytes, "rb") as f:
            if f.read(8) != ole2:
                return path_or_bytes
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    from architxt_spark.sources.ooxml_crypto import decrypt_ooxml

    return io.BytesIO(decrypt_ooxml(data, password))


def _odf_encryption_entry(z: "zipfile.ZipFile", name: str) -> dict | None:
    """The ODF 1.2 ``manifest:encryption-data`` parameters for one zip
    entry, or ``None`` when that entry is stored in the clear."""
    try:
        manifest = z.read("META-INF/manifest.xml")
    except KeyError:
        return None
    root = ET.fromstring(manifest)
    for fe in root.iter():
        if _local(fe.tag) != "file-entry":
            continue
        full = next(
            (v for k, v in fe.attrib.items() if k.endswith("full-path")), ""
        )
        if full != name:
            continue
        out: dict = {}
        for el in fe.iter():
            tag = _local(el.tag)
            if tag == "encryption-data":
                out["checksum_type"] = next(
                    (v for k, v in el.attrib.items() if k.endswith("checksum-type")),
                    "",
                )
                out["checksum"] = next(
                    (v for k, v in el.attrib.items() if k.endswith("}checksum")), ""
                )
            elif tag == "algorithm":
                out["algorithm"] = next(
                    (v for k, v in el.attrib.items() if k.endswith("algorithm-name")),
                    "",
                )
                out["iv"] = next(
                    (
                        v
                        for k, v in el.attrib.items()
                        if k.endswith("initialisation-vector")
                    ),
                    "",
                )
            elif tag == "key-derivation":
                out["salt"] = next(
                    (v for k, v in el.attrib.items() if k.endswith("}salt")), ""
                )
                out["iterations"] = int(
                    next(
                        (
                            v
                            for k, v in el.attrib.items()
                            if k.endswith("iteration-count")
                        ),
                        "1024",
                    )
                )
                ks = next(
                    (v for k, v in el.attrib.items() if k.endswith("}key-size")),
                    None,
                )
                if ks is not None:  # absent = spec default (16; AES writes 32)
                    out["key_size"] = int(ks)
            elif tag == "start-key-generation":
                out["start_key"] = next(
                    (
                        v
                        for k, v in el.attrib.items()
                        if k.endswith("start-key-generation-name")
                    ),
                    "",
                )
        return out if "algorithm" in out else None
    return None


def read_docx_paragraphs(path_or_bytes, *, password: str = "") -> list[str]:
    """Paragraph texts of a ``.docx`` in document order (empty
    paragraphs dropped).  Accepts a path or raw bytes; password-
    protected (OLE2-wrapped) files decrypt transparently when the
    default password opens them, or with an explicit ``password``."""
    src = _ooxml_source(path_or_bytes, password)
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


def read_pptx_slides(path_or_bytes, *, password: str = "") -> list[str]:
    """Per-slide text of a ``.pptx`` in slide-number order: every
    paragraph (``a:p``) of every shape, newline-joined per slide (empty
    slides kept as empty strings so slide numbering survives)."""
    src = _ooxml_source(path_or_bytes, password)
    import re

    out: list[str] = []
    try:
        with zipfile.ZipFile(src) as z:
            slides = sorted(
                (n for n in z.namelist()
                 if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)),
                key=lambda n: int(re.search(r"(\d+)", n).group(1)),
            )
            if not slides:
                raise KeyError("ppt/slides")
            for name in slides:
                with z.open(name) as f:
                    root = ET.parse(f).getroot()
                paras = [
                    _para_text(el)
                    for el in root.iter()
                    if _local(el.tag) == "p"
                ]
                out.append("\n".join(p for p in paras if p.strip()))
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .pptx (no ppt/slides/*.xml zip entries)") from e
    return out


def read_odt_paragraphs(path_or_bytes, *, password: str = "") -> list[str]:
    """Paragraph + heading texts of an ``.odt`` in document order.
    Password-protected documents (ODF 1.2 manifest encryption: PBKDF2
    over a SHA-256 start key, AES-256-CBC, raw-deflate payload) decrypt
    with ``password``."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        with zipfile.ZipFile(src) as z:
            raw = z.read("content.xml")
            enc = _odf_encryption_entry(z, "content.xml")
            if enc is not None:
                from architxt_spark.sources.ooxml_crypto import odf_decrypt_entry

                raw = odf_decrypt_entry(raw, enc, password)
            root = ET.fromstring(raw)
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .odt (no content.xml zip entry)") from e
    out = []
    for el in root.iter():
        if _local(el.tag) in ("p", "h"):
            text = _para_text(el)
            if text.strip():
                out.append(text)
    return out


def read_odp_slides(path_or_bytes, *, password: str = "") -> list[str]:
    """Per-slide text of an ``.odp`` (OpenDocument presentation) in
    page order: every paragraph of every ``draw:page``, newline-joined
    per slide (empty pages kept so slide numbering survives) — the
    ``read_pptx_slides`` shape for the ODF side.  Encrypted members
    decrypt through the same manifest path as ``.odt``."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        with zipfile.ZipFile(src) as z:
            raw = z.read("content.xml")
            enc = _odf_encryption_entry(z, "content.xml")
            if enc is not None:
                from architxt_spark.sources.ooxml_crypto import odf_decrypt_entry

                raw = odf_decrypt_entry(raw, enc, password)
            root = ET.fromstring(raw)
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .odp (no content.xml zip entry)") from e
    pages = [el for el in root.iter() if _local(el.tag) == "page"]
    if not pages:
        raise ValueError(".odp without any draw:page element")

    def page_paras(page) -> list[str]:
        # speaker notes are a presentation:notes CHILD of draw:page in
        # ODF (unlike .pptx, where they live in separate notesSlide
        # parts) — skip that subtree so .odp and .pptx slide text stay
        # shape-equivalent
        paras: list[str] = []
        stack = list(reversed(list(page)))
        while stack:
            el = stack.pop()
            tag = _local(el.tag)
            if tag == "notes":
                continue
            if tag == "p":
                paras.append(_para_text(el))
                continue
            stack.extend(reversed(list(el)))
        return paras

    out: list[str] = []
    for page in pages:
        out.append("\n".join(p for p in page_paras(page) if p.strip()))
    return out


def read_ods_sheets(
    path_or_bytes, *, password: str = ""
) -> dict[str, list[dict[str, str]]]:
    """OpenDocument spreadsheet (``.ods``) → ``{sheet: [row dicts]}``
    (first row = header, values as strings) — the ``_read_xlsx_stdlib``
    output shape, so the document loader treats LibreOffice Calc files
    like Excel ones (the reference reads them through
    ``pd.read_excel``, ``loader/documents.py:22-29``).  Walks
    ``table:table`` / ``table:table-row`` / ``table:table-cell`` with
    ``table:number-columns-repeated``/``number-rows-repeated`` expansion
    (bounded at the used range); encrypted members decrypt through the
    same ODF 1.2 / legacy-Blowfish manifest path as ``.odt``."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        with zipfile.ZipFile(src) as z:
            raw = z.read("content.xml")
            enc = _odf_encryption_entry(z, "content.xml")
            if enc is not None:
                from architxt_spark.sources.ooxml_crypto import odf_decrypt_entry

                raw = odf_decrypt_entry(raw, enc, password)
            root = ET.fromstring(raw)
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError("not a .ods (no content.xml zip entry)") from e

    def cell_text(cell) -> str:
        text = "\n".join(
            _para_text(el) for el in cell.iter() if _local(el.tag) == "p"
        )
        if text:
            return text
        # no display paragraphs (machine writers often emit formula /
        # typed cells with only office:* value attributes): fall back
        # to the typed value so computed cells don't vanish
        attrs = {
            k.rsplit("}", 1)[-1]: v for k, v in cell.attrib.items()
        }
        if "string-value" in attrs:
            return attrs["string-value"]
        if "boolean-value" in attrs:
            return attrs["boolean-value"].capitalize()
        for key in ("value", "date-value", "time-value"):
            if key in attrs:
                v = attrs[key]
                if key == "value":
                    try:
                        f = float(v)
                        return str(int(f)) if f.is_integer() else repr(f)
                    except ValueError:
                        return v
                return v
        return ""

    out: dict[str, list[dict[str, str]]] = {}
    for table in root.iter():
        if _local(table.tag) != "table":
            continue
        name = next(
            (v for k, v in table.attrib.items() if k.endswith("}name")),
            f"Sheet{len(out) + 1}",
        )
        rows: list[list[str]] = []
        for tr in table:
            if _local(tr.tag) != "table-row":
                continue
            row_rep = int(next(
                (v for k, v in tr.attrib.items()
                 if k.endswith("number-rows-repeated")), "1",
            ))
            vals: list[str] = []
            pending_empty = 0
            for cell in tr:
                if _local(cell.tag) not in ("table-cell", "covered-table-cell"):
                    continue
                rep = int(next(
                    (v for k, v in cell.attrib.items()
                     if k.endswith("number-columns-repeated")), "1",
                ))
                text = cell_text(cell)
                if text:
                    # interior empty runs must expand in full or every
                    # later value shifts under the wrong header; a run
                    # only flushes when a non-empty cell follows it, so
                    # trailing column-bound filler never materializes
                    vals.extend([""] * min(pending_empty, _ODS_COL_BOUND - len(vals)))
                    pending_empty = 0
                    vals.extend([text] * max(min(rep, _ODS_COL_BOUND - len(vals)), 1))
                else:
                    pending_empty += rep
            # rows with no non-empty cells never reach the output —
            # the _read_xlsx_stdlib shape (sparse sheets emit no blanks)
            if vals:
                rows.extend([list(vals)] * min(row_rep, _ODS_ROW_BOUND))
        if not rows:
            out[name] = []
            continue
        header = rows[0]
        out[name] = [
            {header[i]: v for i, v in enumerate(r) if i < len(header) and header[i]}
            for r in rows[1:]
        ]
    if not out:
        raise ValueError(".ods without any table:table element")
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


_A = "http://schemas.openxmlformats.org/drawingml/2006/main"
_P = "http://schemas.openxmlformats.org/presentationml/2006/main"


def make_pptx_bytes(slides: list[str]) -> bytes:
    """Fixture twin for :func:`read_pptx_slides`: one text-box shape per
    slide, one ``a:p`` per newline-separated line, plus the package
    skeleton (content types, root rels, presentation + its rels)."""
    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/ppt/presentation.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/>'
    ]
    pres_rels = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    ]
    sld_ids = []
    parts: list[tuple[str, str]] = []
    for i, text in enumerate(slides, start=1):
        body = "".join(
            f"<a:p><a:r><a:t>{_xml_escape(line)}</a:t></a:r></a:p>"
            for line in text.split("\n")
        )
        parts.append((
            f"ppt/slides/slide{i}.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<p:sld xmlns:p="{_P}" xmlns:a="{_A}"><p:cSld><p:spTree>'
            f"<p:sp><p:txBody>{body}</p:txBody></p:sp>"
            "</p:spTree></p:cSld></p:sld>",
        ))
        ct.append(
            f'<Override PartName="/ppt/slides/slide{i}.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.presentationml.slide+xml"/>'
        )
        pres_rels.append(
            f'<Relationship Id="rId{i}" Type="http://schemas.openxmlformats.org/'
            f'officeDocument/2006/relationships/slide" Target="slides/slide{i}.xml"/>'
        )
        sld_ids.append(f'<p:sldId id="{255 + i}" r:id="rId{i}"/>')
    ct.append("</Types>")
    pres_rels.append("</Relationships>")
    presentation = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<p:presentation xmlns:p="{_P}" xmlns:r='
        '"http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<p:sldIdLst>{''.join(sld_ids)}</p:sldIdLst></p:presentation>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="ppt/presentation.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "".join(ct))
        z.writestr("_rels/.rels", root_rels)
        z.writestr("ppt/presentation.xml", presentation)
        z.writestr("ppt/_rels/presentation.xml.rels", "".join(pres_rels))
        for name, xml in parts:
            z.writestr(name, xml)
    return buf.getvalue()


_ODF_TABLE = "urn:oasis:names:tc:opendocument:xmlns:table:1.0"
_ODF_DRAW = "urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"


def make_odp_bytes(slides: list[str], *, notes: list[str] | None = None) -> bytes:
    """``["slide text", ...]`` → a real ``.odp`` zip — the fixture twin
    of :func:`read_odp_slides` (one ``draw:page`` per slide, paragraphs
    split on newlines).  ``notes`` (optional, per-slide) writes a
    ``presentation:notes`` child under the page, the way Impress stores
    speaker notes — the reader must NOT surface these as slide text."""
    pages = []
    for i, text in enumerate(slides):
        paras = "".join(
            f"<text:p>{_xml_escape(line)}</text:p>"
            for line in (text.split("\n") if text else [""])
        )
        note_xml = ""
        if notes and i < len(notes) and notes[i]:
            note_xml = (
                "<presentation:notes><draw:frame><draw:text-box>"
                f"<text:p>{_xml_escape(notes[i])}</text:p>"
                "</draw:text-box></draw:frame></presentation:notes>"
            )
        pages.append(
            f'<draw:page draw:name="page{i + 1}">'
            f"<draw:frame><draw:text-box>{paras}</draw:text-box></draw:frame>"
            f"{note_xml}</draw:page>"
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
        f'xmlns:text="{_ODF_TEXT}" xmlns:draw="{_ODF_DRAW}" '
        'xmlns:presentation='
        '"urn:oasis:names:tc:opendocument:xmlns:presentation:1.0">'
        "<office:body><office:presentation>"
        + "".join(pages)
        + "</office:presentation></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.presentation",
        )
        z.writestr("content.xml", content)
    return buf.getvalue()


def make_ods_bytes(sheets: dict[str, list[list]]) -> bytes:
    """``{sheet: [[cell, ...], ...]}`` → a real ``.ods`` zip — the
    fixture twin of :func:`read_ods_sheets` (mimetype-first entry per
    the ODF packaging spec).  A ``None`` cell emits an empty cell; a
    ``(value_or_None, n)`` tuple emits ``table:number-columns-repeated``
    (the way LibreOffice writes interior gaps and runs); a
    ``(row_list, n)`` row entry emits ``table:number-rows-repeated``."""
    tables = []
    for name, rows in sheets.items():
        trs = []
        for row in rows:
            row_rep = 1
            if isinstance(row, tuple):
                row, row_rep = row
            tds = []
            for v in row:
                rep = 1
                if isinstance(v, tuple):
                    v, rep = v
                rep_attr = (
                    f' table:number-columns-repeated="{rep}"' if rep != 1 else ""
                )
                if v is None:  # a gap: emitted as an empty (repeated) cell
                    tds.append(f"<table:table-cell{rep_attr}/>")
                else:
                    tds.append(
                        f"<table:table-cell{rep_attr}>"
                        f"<text:p>{_xml_escape(str(v))}</text:p>"
                        "</table:table-cell>"
                    )
            rr_attr = (
                f' table:number-rows-repeated="{row_rep}"' if row_rep != 1 else ""
            )
            trs.append(f"<table:table-row{rr_attr}>{''.join(tds)}</table:table-row>")
        tables.append(
            f'<table:table table:name="{_xml_escape(name)}">'
            + "".join(trs)
            + "</table:table>"
        )
    content = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<office:document-content xmlns:office="{_ODF_OFFICE}" '
        f'xmlns:text="{_ODF_TEXT}" xmlns:table="{_ODF_TABLE}">'
        "<office:body><office:spreadsheet>"
        + "".join(tables)
        + "</office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr(
            zipfile.ZipInfo("mimetype"),
            "application/vnd.oasis.opendocument.spreadsheet",
        )
        z.writestr("content.xml", content)
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
