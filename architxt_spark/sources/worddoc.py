"""Legacy Word binary ``.doc`` text source — pure stdlib, no antiword.

Beyond-reference sibling of ``sources/xls.py`` (the reference reads
modern formats only; a real 1990s-2000s dump is full of ``.doc``).
Scope, per [MS-DOC]:

- Word 97-2003 (``wIdent`` 0xA5EC): FIB base + ``FibRgFcLcb97``'s
  ``fcClx``/``lcbClx`` (fixed offsets 0x01A2/0x01A6), the Clx in the
  ``0Table``/``1Table`` stream selected by ``fWhichTblStm`` (leading
  ``Prc`` property blocks skipped), the ``PlcPcd`` piece table, and
  per-piece text from the ``WordDocument`` stream — ``fc`` bit 30
  selects cp1252 single-byte ("compressed") vs UTF-16LE pieces with
  the documented ``fc/2`` offset rule.  Only the main-document range
  (``ccpText`` CPs) is returned — footnote/header text sits past it.
- Word 6/95 (``wIdent`` 0xA5DC), non-complex: the contiguous
  ``fcMin..fcMac`` byte range, cp1252.  Fast-saved (``fComplex``)
  Word 95 files and encrypted/obfuscated documents (``fEncrypted``)
  raise ``NotImplementedError`` with guidance.

Control characters map per the antiword/catdoc convention: 0x0D
(paragraph mark) and 0x0B (line break) split paragraphs, 0x07 (cell
mark) becomes a tab, field characters (0x13/0x14/0x15) and object
placeholders drop.

``make_doc_bytes`` is the fixture twin: a real two-stream OLE2
container (``WordDocument`` + ``1Table``) whose piece table mixes
compressed and UTF-16 pieces (chunks that fit cp1252 travel
compressed), with an optional leading ``Prc`` block so the Clx walk
is exercised.  The OLE2 writer (``_wrap_ole2_multi``) generalizes the
xls twin to N streams.
"""

from __future__ import annotations

import io
import struct

from architxt_spark.sources.xls import _ENDOFCHAIN, _FATSECT, _MAGIC, _cfb_stream

_F_COMPLEX = 0x0004
_F_ENCRYPTED = 0x0100
_F_WHICH_TBL = 0x0200
_FC_COMPRESSED = 0x40000000

#: FibRgFcLcb97: fcClx is the 33rd fc/lcb pair → 154 + 33*8
_FC_CLX_AT = 0x01A2
#: FibRgLw97: ccpText (main-document CP count) at byte 76
_CCP_TEXT_AT = 0x004C


def _clean_paragraphs(text: str) -> list[str]:
    out: list[str] = []
    for ch, repl in (("\x0b", "\r"), ("\x0c", "\r"), ("\x07", "\t")):
        text = text.replace(ch, repl)
    for drop in ("\x13", "\x14", "\x15", "\x01", "\x02", "\x08", "\x00"):
        text = text.replace(drop, "")
    parts = text.split("\r")
    if parts and parts[-1] == "":
        parts.pop()  # the document's final paragraph mark
    out.extend(parts)
    return out


def read_doc_paragraphs(path_or_bytes, *, password: str = "") -> list[str]:
    """Word binary ``.doc`` → paragraph list (the ``read_docx_paragraphs``
    shape, so the document loader treats legacy Word like modern Word)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:8] != _MAGIC:
        raise ValueError("not a .doc (no OLE2 container)")
    wd = _cfb_stream(data, ("worddocument",))
    wident, _n_fib = struct.unpack("<HH", wd[:4])
    (flags,) = struct.unpack("<H", wd[10:12])
    if flags & _F_ENCRYPTED:
        raise NotImplementedError(
            "encrypted/obfuscated .doc needs msoffcrypto-tool; "
            "re-save unencrypted or as .docx"
        )
    fc_min, fc_mac = struct.unpack("<II", wd[24:32])

    if wident == 0xA5DC:  # Word 6/95
        if flags & _F_COMPLEX:
            raise NotImplementedError(
                "fast-saved (complex) Word 95 .doc needs antiword; "
                "re-save as .docx"
            )
        text = wd[fc_min:fc_mac].decode("cp1252", errors="replace")
        return _clean_paragraphs(text)
    if wident != 0xA5EC:
        raise ValueError(f".doc with unknown wIdent 0x{wident:04X}")

    fc_clx, lcb_clx = struct.unpack("<II", wd[_FC_CLX_AT:_FC_CLX_AT + 8])
    (ccp_text,) = struct.unpack("<I", wd[_CCP_TEXT_AT:_CCP_TEXT_AT + 4])
    table = _cfb_stream(
        data, ("1table",) if flags & _F_WHICH_TBL else ("0table",)
    )
    clx = table[fc_clx:fc_clx + lcb_clx]

    # Clx = Prc* Pcdt: skip property blocks (0x01 cb grpprl) to the
    # piece table (0x02 lcb PlcPcd)
    at = 0
    while at < len(clx) and clx[at] == 0x01:
        (cb,) = struct.unpack("<H", clx[at + 1:at + 3])
        at += 3 + cb
    if at >= len(clx) or clx[at] != 0x02:
        raise ValueError(".doc Clx without a Pcdt piece table")
    (lcb,) = struct.unpack("<I", clx[at + 1:at + 5])
    plc = clx[at + 5:at + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack(f"<{n + 1}I", plc[:4 * (n + 1)])
    chunks: list[str] = []
    remaining = ccp_text
    for i in range(n):
        if remaining <= 0:
            break
        pcd = plc[4 * (n + 1) + 8 * i:4 * (n + 1) + 8 * (i + 1)]
        (fc,) = struct.unpack("<I", pcd[2:6])
        cp_len = min(cps[i + 1] - cps[i], remaining)
        remaining -= cp_len
        if fc & _FC_COMPRESSED:
            off = (fc & 0x3FFFFFFF) // 2
            chunks.append(wd[off:off + cp_len].decode("cp1252", errors="replace"))
        else:
            off = fc & 0x3FFFFFFF
            chunks.append(
                wd[off:off + 2 * cp_len].decode("utf-16-le", errors="replace")
            )
    return _clean_paragraphs("".join(chunks))


# ---------------------------------------------------------------------------
# fixture twins
# ---------------------------------------------------------------------------


def _wrap_ole2_multi(streams: dict[str, bytes]) -> bytes:
    """Minimal compliant OLE2 container holding N named streams —
    regular-FAT layout (every stream padded past the 4096-byte mini
    cutoff), directory entries chained root→child→right-sibling."""
    names = list(streams)

    def pad(b: bytes, size: int = 512) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    def dir_entry(
        name: str, etype: int, start: int, size: int,
        child: int = 0xFFFFFFFF, right: int = 0xFFFFFFFF,
    ) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    # pad every stream past the 4096-byte mini cutoff (recorded size
    # included, like the xls twin) so the mini path never engages —
    # trailing zeros are inert behind the FIB's offset fields
    streams = {
        nm: b + b"\x00" * max(0, 4096 - len(b)) for nm, b in streams.items()
    }
    # directory sectors: root + one entry per stream, 4 entries/sector
    n_dir_sects = -(-(1 + len(names)) // 4)
    bodies = [pad(streams[nm]) for nm in names]
    # layout: 0=FAT, 1..n_dir=dir, then stream sectors in order
    fat = [_FATSECT]
    for i in range(n_dir_sects):
        fat.append(1 + i + 1 if i + 1 < n_dir_sects else _ENDOFCHAIN)
    starts = []
    next_sect = 1 + n_dir_sects
    for body in bodies:
        n = len(body) // 512
        starts.append(next_sect)
        for i in range(n):
            fat.append(next_sect + i + 1 if i + 1 < n else _ENDOFCHAIN)
        next_sect += n
    if len(fat) > 128:
        raise ValueError("fixture writer supports one FAT sector (~64 KB)")

    entries = [dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)]
    for i, nm in enumerate(names):
        right = i + 2 if i + 1 < len(names) else 0xFFFFFFFF
        entries.append(
            dir_entry(nm, 2, starts[i], len(streams[nm]), right=right)
        )
    directory = pad(b"".join(entries))

    header = bytearray(512)
    header[0:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x003E)
    struct.pack_into("<H", header, 26, 0x0003)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)  # one FAT sector
    struct.pack_into("<I", header, 48, 1)  # first directory sector
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)
    struct.pack_into("<109I", header, 76, 0, *([0xFFFFFFFF] * 108))
    fat_sect = pad(struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * (512 - 4 * len(fat)))
    return bytes(header) + fat_sect + directory + b"".join(bodies)


_FIB_LEN = 1024  # FibBase..FibRgFcLcb97 is 898 bytes; text starts here


def make_doc_bytes(
    paragraphs: list[str],
    *,
    word95: bool = False,
    prc_blocks: int = 1,
    piece_chars: int = 7,
) -> bytes:
    """``["para", ...]`` → a real Word binary ``.doc`` — the fixture
    twin of :func:`read_doc_paragraphs`.  Word 97 shape by default:
    two-stream OLE2 (``WordDocument`` + ``1Table``), text split into
    ``piece_chars``-char pieces that travel cp1252-compressed when they
    can and UTF-16 when they must, ``prc_blocks`` leading Prc property
    blocks before the Pcdt.  ``word95=True`` writes the Word 6/95
    contiguous-text shape instead (cp1252 only)."""
    text = "".join(p + "\r" for p in paragraphs)

    if word95:
        raw = text.encode("cp1252", errors="replace")
        wd = bytearray(_FIB_LEN)
        struct.pack_into("<HH", wd, 0, 0xA5DC, 0x0065)
        struct.pack_into("<H", wd, 10, 0)  # not complex, not encrypted
        struct.pack_into("<II", wd, 24, _FIB_LEN, _FIB_LEN + len(raw))
        wd.extend(raw)
        return _wrap_ole2_multi({"WordDocument": bytes(wd)})

    # split into pieces; each piece is compressed iff cp1252 round-trips
    pieces: list[tuple[str, bool]] = []
    for i in range(0, len(text), piece_chars):
        chunk = text[i:i + piece_chars]
        try:
            compressed = chunk.encode("cp1252").decode("cp1252") == chunk
        except (UnicodeEncodeError, UnicodeDecodeError):
            compressed = False
        pieces.append((chunk, compressed))

    wd = bytearray(_FIB_LEN)
    struct.pack_into("<HH", wd, 0, 0xA5EC, 0x00C1)
    struct.pack_into("<H", wd, 10, _F_WHICH_TBL)  # text in 1Table
    struct.pack_into("<H", wd, 12, 0x00BF)  # nFibBack
    struct.pack_into("<H", wd, 32, 0x000E)  # csw
    struct.pack_into("<H", wd, 62, 0x0016)  # cslw
    struct.pack_into("<I", wd, _CCP_TEXT_AT, len(text))  # ccpText
    struct.pack_into("<H", wd, 152, 0x005D)  # cbRgFcLcb (Word 97)

    fcs = []
    for chunk, compressed in pieces:
        fc = len(wd)
        if compressed:
            fcs.append((2 * fc) | _FC_COMPRESSED)
            wd.extend(chunk.encode("cp1252"))
        else:
            fcs.append(fc)
            wd.extend(chunk.encode("utf-16-le"))
    struct.pack_into("<II", wd, 24, _FIB_LEN, len(wd))  # fcMin/fcMac

    cps = [0]
    for chunk, _c in pieces:
        cps.append(cps[-1] + len(chunk))
    plc = struct.pack(f"<{len(cps)}I", *cps)
    for fc in fcs:
        plc += struct.pack("<HIH", 0, fc, 0)
    clx = io.BytesIO()
    for i in range(prc_blocks):  # property blocks the reader must skip
        grpprl = bytes([0x75] * (3 + i))
        clx.write(b"\x01" + struct.pack("<H", len(grpprl)) + grpprl)
    clx.write(b"\x02" + struct.pack("<I", len(plc)) + plc)
    table = clx.getvalue()
    struct.pack_into("<II", wd, _FC_CLX_AT, 0, len(table))  # fcClx/lcbClx

    return _wrap_ole2_multi({"WordDocument": bytes(wd), "1Table": table})
