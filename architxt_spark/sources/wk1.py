"""Lotus 1-2-3 ``.wk1``/``.wks`` spreadsheet source — pure stdlib.

Beyond-reference: Lotus 1-2-3 was THE spreadsheet of the late 80s/early
90s, so legacy data dumps carry ``.wk1`` (1-2-3 release 2) and ``.wks``
(release 1/1A, also Symphony) at least as often as early ``.xls``.  The
published record format (Lotus File Formats documentation, the same
layout every converter — Excel, Gnumeric, LibreOffice — reads): a flat
stream of ``opcode(u16 LE) length(u16 LE) body`` records between BOF
(0x0000, version word 0x0404/0x0405/0x0406) and EOF (0x0001).  Cell
records carry ``format(1) col(u16) row(u16)`` then the payload:

- ``0x0D`` INTEGER — int16 value
- ``0x0E`` NUMBER — IEEE float64
- ``0x0F`` LABEL — alignment prefix byte (``'`` left, ``"`` right,
  ``^`` centre, ``\\`` repeat, ``|`` non-printing) + NUL-terminated text
- ``0x10`` FORMULA — float64 CACHED result + bytecode (we read the
  cached value, like every converter)
- ``0x33`` STRING — a string formula's cached text result

Label text decodes as cp437 (the Lotus International Character Set is
close enough for the printable range; a wrong accent beats data loss).
1-2-3 release 3+ (``.wk3``/``.wk4``, BOF version 0x1000+) is a
different record set and raises with re-save guidance.

Output matches ``_read_xlsx_stdlib``: ``{sheet: [row dicts]}``, first
populated row as the header, so the document loader treats WK1 like a
one-sheet workbook.  ``make_wk1_bytes`` is the fixture twin.
"""

from __future__ import annotations

import struct

#: BOF version words: 0x0404 = 1-2-3 release 1/1A (.wks), 0x0405 =
#: Symphony, 0x0406 = 1-2-3 release 2 (.wk1)
_WK1_VERSIONS = (0x0404, 0x0405, 0x0406)

_LABEL_PREFIXES = b"'\"^\\|"


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))


def read_wk1_rows(path_or_bytes, *, password: str = "") -> dict[str, list[dict[str, str]]]:
    """``.wk1``/``.wks`` → ``{"Sheet1": [row dicts]}`` (first populated
    row = header, every value a string)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if len(data) < 6 or data[:2] != b"\x00\x00":
        raise ValueError("not a Lotus worksheet (missing BOF)")
    (bof_len,) = struct.unpack("<H", data[2:4])
    (version,) = struct.unpack("<H", data[4:6])
    if version >= 0x1000:
        raise NotImplementedError(
            "Lotus 1-2-3 release 3+ worksheets (.wk3/.wk4/.123) use a "
            "different record set; re-save as .wk1 or .xlsx"
        )
    if version not in _WK1_VERSIONS or bof_len < 2:
        raise ValueError(f"not a .wk1/.wks (BOF version 0x{version:04X})")

    cells: dict[int, dict[int, str]] = {}

    def put(row: int, col: int, val: str) -> None:
        cells.setdefault(row, {})[col] = val

    pos = 4 + bof_len
    n = len(data)
    while pos + 4 <= n:
        opcode, length = struct.unpack("<HH", data[pos:pos + 4])
        body = data[pos + 4:pos + 4 + length]
        pos += 4 + length
        if opcode == 0x0001:  # EOF
            break
        if len(body) < 5 or opcode not in (0x0D, 0x0E, 0x0F, 0x10, 0x33):
            continue
        col, row = struct.unpack("<HH", body[1:5])
        if opcode == 0x0D and len(body) >= 7:  # INTEGER
            (w,) = struct.unpack("<h", body[5:7])
            put(row, col, str(w))
        elif opcode == 0x0E and len(body) >= 13:  # NUMBER
            (num,) = struct.unpack("<d", body[5:13])
            put(row, col, _fmt_num(num))
        elif opcode == 0x10 and len(body) >= 13:  # FORMULA cached value
            (num,) = struct.unpack("<d", body[5:13])
            put(row, col, _fmt_num(num))
        elif opcode in (0x0F, 0x33):  # LABEL / STRING formula result
            raw = body[5:].split(b"\x00", 1)[0]
            if raw and raw[0] in _LABEL_PREFIXES:
                raw = raw[1:]
            put(row, col, raw.decode("cp437", errors="replace"))
    from architxt_spark.sources.xls import _shape_rows

    return {"Sheet1": _shape_rows(cells)}


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def make_wk1_bytes(
    rows: list[list],
    *,
    version: int = 0x0406,
    label_prefix: bytes = b"'",
    formula_cols: frozenset[int] = frozenset(),
    int_cells: bool = True,
) -> bytes:
    """Write a Lotus worksheet: strings become LABEL records (with the
    given alignment prefix), integral numbers INTEGER records (when in
    int16 range and ``int_cells``), other numbers NUMBER records —
    except columns in ``formula_cols``, whose numbers travel as FORMULA
    records (cached result + a one-byte constant bytecode) so the
    cached-value read path is load-bearing."""
    out = bytearray()

    def rec(opcode: int, body: bytes) -> None:
        out.extend(struct.pack("<HH", opcode, len(body)) + body)

    rec(0x0000, struct.pack("<H", version))
    for r, cols in enumerate(rows):
        for c, v in enumerate(cols):
            if v is None:
                continue
            head = struct.pack("<BHH", 0xF1, c, r)
            if isinstance(v, str):
                rec(0x0F, head + label_prefix + v.encode("cp437", "replace") + b"\x00")
            elif c in formula_cols:
                body = struct.pack("<d", float(v))
                code = struct.pack("<H", 9) + b"\x00" + struct.pack("<d", float(v))
                rec(0x10, head + body + struct.pack("<H", len(code)) + code)
            elif int_cells and float(v).is_integer() and -32768 <= v <= 32767:
                rec(0x0D, head + struct.pack("<h", int(v)))
            else:
                rec(0x0E, head + struct.pack("<d", float(v)))
    rec(0x0001, b"")
    return bytes(out)
