"""Legacy PowerPoint binary ``.ppt`` text source — pure stdlib.

Beyond-reference sibling of ``sources/worddoc.py``, completing the
97-2003 Office trio (.xls / .doc / .ppt).  Per [MS-PPT], the
``PowerPoint Document`` stream is a tree of records (8-byte header:
``recVerAndInstance``, ``recType``, ``recLen``; containers have
version 0xF).  Slide text lives in the ``SlideListWithText``
container (0x0FF0) inside the ``Document`` container: each
``SlidePersistAtom`` (0x03F3) opens a slide, and the
``TextCharsAtom`` (0x0FA0, UTF-16LE) / ``TextBytesAtom`` (0x0FA8,
low-byte-of-UTF-16) atoms that follow belong to it — the exact
structure PowerPoint writes for fast outline access, which is why
text extractors (catppt, POI's QuickButCruddyTextExtractor lineage)
read it without touching the drawing layer.

Output is the ``read_pptx_slides`` shape: one newline-joined string
per slide, in slide order.  Encrypted decks (``CryptSession10``
container present) raise ``NotImplementedError`` with guidance.

``make_ppt_bytes`` is the fixture twin: a real record tree
(Document → SlideListWithText → per-slide SlidePersistAtom + text
atoms, chars/bytes atom chosen per paragraph by encodability) in a
two-stream OLE2 container (``Current User`` + ``PowerPoint
Document``) through the shared multi-stream writer.
"""

from __future__ import annotations

import struct

from architxt_spark.sources.worddoc import _wrap_ole2_multi
from architxt_spark.sources.xls import _MAGIC, _cfb_stream

_RT_DOCUMENT = 0x03E8
_RT_SLIDE_PERSIST = 0x03F3
_RT_SLWT = 0x0FF0
_RT_TEXT_CHARS = 0x0FA0
_RT_TEXT_BYTES = 0x0FA8
_RT_CRYPT = 0x2F14


def _records(data: bytes, at: int, end: int):
    """Yield (ver, instance, rec_type, body_at, body_len) for the
    records in data[at:end]."""
    while at + 8 <= end:
        vi, rt, ln = struct.unpack("<HHI", data[at:at + 8])
        body_at = at + 8
        yield vi & 0x0F, vi >> 4, rt, body_at, min(ln, end - body_at)
        at = body_at + ln


def read_ppt_slides(path_or_bytes, *, password: str = "") -> list[str]:
    """PowerPoint binary ``.ppt`` → per-slide text in slide order."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:8] != _MAGIC:
        raise ValueError("not a .ppt (no OLE2 container)")
    doc = _cfb_stream(data, ("powerpoint document",))

    slides: list[list[str]] = []

    def walk(at: int, end: int, in_slwt: bool) -> None:
        for ver, _inst, rt, b_at, b_len in _records(doc, at, end):
            if rt == _RT_CRYPT:
                raise NotImplementedError(
                    "encrypted .ppt needs msoffcrypto-tool; re-save "
                    "unencrypted or as .pptx"
                )
            if in_slwt and rt == _RT_SLIDE_PERSIST:
                slides.append([])
            elif in_slwt and rt == _RT_TEXT_CHARS:
                if slides:
                    slides[-1].append(
                        doc[b_at:b_at + b_len].decode("utf-16-le", errors="replace")
                    )
            elif in_slwt and rt == _RT_TEXT_BYTES:
                # low bytes of UTF-16 code units — latin-1 by value
                if slides:
                    slides[-1].append(
                        doc[b_at:b_at + b_len].decode("latin-1")
                    )
            elif ver == 0xF:  # container — recurse
                walk(b_at, b_at + b_len, in_slwt or rt == _RT_SLWT)

    walk(0, len(doc), False)
    out = []
    for paras in slides:
        # PPT text atoms end paragraphs with 0x0D
        text = "\n".join("".join(paras).split("\r"))
        out.append(text.rstrip("\n"))
    return out


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def _rec(ver: int, inst: int, rt: int, body: bytes) -> bytes:
    return struct.pack("<HHI", (inst << 4) | ver, rt, len(body)) + body


def make_ppt_bytes(slides: list[str]) -> bytes:
    """``["slide text", ...]`` → a real ``.ppt`` — the fixture twin of
    :func:`read_ppt_slides`.  Paragraphs split on newlines; each
    paragraph travels as a TextBytesAtom when its characters are all
    low-byte code units and a TextCharsAtom otherwise."""
    slwt_body = b""
    for i, text in enumerate(slides):
        persist = struct.pack("<IIHHI", 0, 256 + i, 0, 0, 0)  # 16 bytes
        slwt_body += _rec(0, 0, _RT_SLIDE_PERSIST, persist)
        paras = text.split("\n") if text else []
        stream = "\r".join(paras)
        if stream:
            if all(ord(c) < 256 for c in stream):
                slwt_body += _rec(0, 0, _RT_TEXT_BYTES, stream.encode("latin-1"))
            else:
                slwt_body += _rec(0, 0, _RT_TEXT_CHARS, stream.encode("utf-16-le"))
    document = _rec(0xF, 0, _RT_DOCUMENT, _rec(0xF, 0, _RT_SLWT, slwt_body))
    return _wrap_ole2_multi(
        {"Current User": struct.pack("<I", 20) + b"\x00" * 16,
         "PowerPoint Document": document}
    )
