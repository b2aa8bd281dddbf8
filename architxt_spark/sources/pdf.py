"""Basic PDF text extraction — pure stdlib (``zlib`` + ``re``), no
pdfminer/PyPDF.

Beyond-reference source for the most common machine-generated corpus
format: walks the object table (``N G obj … endobj`` scan — works with
or without a valid xref, which real-world truncated PDFs often lack),
resolves each ``/Type /Page``'s ``/Contents`` streams through
``FlateDecode`` where declared, and extracts the text-showing operators
(``Tj``, ``'``, ``"``, ``TJ`` arrays) between ``BT``/``ET``, decoding
literal-string escapes (octal, ``\\n``/``\\t``, balanced parens) and
hex strings.  Line-advance operators (``Td``/``TD``/``T*``) break
words.

Honest scope: this covers PDFs whose text uses standard single-byte
encodings (the overwhelming machine-generated case — invoices, reports,
data sheets, LaTeX output with simple fonts).  Subset fonts with custom
CMaps produce glyph-index strings that need a real PDF library; pages
whose extraction yields no decodable text come back empty rather than
as garbage.  Encrypted PDFs raise ``NotImplementedError`` with
guidance.

``make_pdf_bytes`` is the fixture twin: a structurally complete PDF
(catalog → page tree → pages → Flate'd content streams + xref table +
trailer) the round-trip tests drive.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _parse_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _object_stream(body: bytes) -> bytes | None:
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    raw = m.group(1)
    if b"FlateDecode" in body:
        try:
            return zlib.decompress(raw)
        except zlib.error as e:
            raise ValueError("corrupt FlateDecode content stream") from e
    return raw


def _literal_string(data: bytes, pos: int) -> tuple[bytes, int]:
    """Decode a PDF literal string starting at the ``(``; returns
    (bytes, position after the closing paren)."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(data)
    while i < n and depth:
        b = data[i]
        if b == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = data[i]
            if e in b"nrtbf":
                out += {
                    0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                    0x62: b"\b", 0x66: b"\f",
                }[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                oct_digits = bytearray([e])
                i += 1
                while i < n and len(oct_digits) < 3 and 0x30 <= data[i] <= 0x37:
                    oct_digits.append(data[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # \( \) \\ and anything else: the char itself
                out.append(e)
                i += 1
        elif b == 0x28:  # (
            depth += 1
            out.append(b)
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth:
                out.append(b)
            i += 1
        else:
            out.append(b)
            i += 1
    return bytes(out), i


def _extract_text(content: bytes) -> str:
    """Text-showing operators of one content stream, word-broken at
    string boundaries and line-advance operators."""
    parts: list[str] = []
    i = 0
    n = len(content)
    pending: list[bytes] = []

    def flush() -> None:
        if pending:
            text = b"".join(pending).decode("latin-1")
            if text.strip():
                parts.append(text)
            pending.clear()

    while i < n:
        b = content[i]
        if b == 0x28:  # literal string
            s, i = _literal_string(content, i)
            pending.append(s)
        elif b == 0x3C and i + 1 < n and content[i + 1] != 0x3C:  # hex string
            j = content.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", content[i + 1:j])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append(bytes.fromhex(hx.decode()))
            except ValueError:
                pass
            i = j + 1
        elif content.startswith((b"Td", b"TD", b"T*", b"ET"), i):
            flush()
            parts.append("\n") if parts and parts[-1] != "\n" else None
            i += 2 if not content.startswith(b"T*", i) else 2
        elif b in (0x54, 0x27, 0x22):  # Tj / TJ / ' / "
            # operators CONSUME the pending strings; other tokens
            # (e.g. font names) never enter `pending`
            if content.startswith((b"Tj", b"TJ"), i) or b in (0x27, 0x22):
                flush()
                i += 2 if b == 0x54 else 1
            else:
                i += 1
        else:
            i += 1
    flush()
    text = "".join(parts)
    return re.sub(r"\n+", "\n", text).strip()


def read_pdf_pages(path_or_bytes) -> list[str]:
    """Extracted text per page, in page-tree order."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if re.search(rb"/Encrypt\b", data):
        raise NotImplementedError(
            "encrypted PDF needs a real PDF library (pypdf/qpdf); "
            "decrypt before ingestion"
        )
    objects = _parse_objects(data)
    pages: list[str] = []
    for _num, body in sorted(objects.items()):
        head = body.split(b"stream", 1)[0]
        if not re.search(rb"/Type\s*/Page\b", head):
            continue
        m = re.search(rb"/Contents\s+(\[[^\]]*\]|\d+\s+\d+\s+R)", head)
        if m is None:
            pages.append("")
            continue
        text_parts = []
        for ref in _REF_RE.finditer(m.group(1)):
            stream = _object_stream(objects.get(int(ref.group(1)), b""))
            if stream:
                text_parts.append(_extract_text(stream))
        pages.append("\n".join(p for p in text_parts if p))
    return pages


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf_bytes(pages: list[str], *, compress: bool = True) -> bytes:
    """Structurally complete single-font PDF: one Flate'd (or raw)
    content stream per page, page tree, xref table, trailer."""
    objs: list[bytes] = []  # bodies, object number = index + 1
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i, page_text in enumerate(pages):
        content_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {3 + 2 * n_pages} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode()
        )
        lines = page_text.split("\n")
        ops = ["BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append("0 -14 Td")
            ops.append(f"({_pdf_escape(line)}) Tj")
        ops.append("ET")
        stream = " ".join(ops).encode("latin-1")
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        objs.append(
            b"<< " + filt + f"/Length {len(stream)} >>".encode()
            + b"\nstream\n" + stream + b"\nendstream"
        )
    objs.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)
