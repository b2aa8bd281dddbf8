"""dBASE ``.dbf`` table source — pure stdlib.

Beyond-reference: DBF is the table format 1990s data actually shipped
in (dBASE III/IV, FoxPro, Clipper exports; shapefile attribute tables
to this day).  The published layout: a 32-byte header (version byte,
record count, header length, record length, optional language-driver
id), 32-byte field descriptors (11-byte NUL-padded names, type char,
length, decimal count) terminated by 0x0D, then fixed-width records
prefixed by a deletion flag (0x20 live, 0x2A deleted).

Field types: ``C`` character (codepage via the language driver byte,
cp1252 default), ``N``/``F`` numerics (kept as trimmed strings — the
loader's stringly row-dict contract), ``L`` logical (``True``/
``False``/empty), ``D`` dates (YYYYMMDD → ISO).  Memo types
(``M``/``B``/``G``, data in a sibling .dbt/.fpt) surface as the block
reference string rather than gating the whole table.

Output matches ``_read_xlsx_stdlib``: ``{table: [row dicts]}`` with
every value a string, so the document loader treats DBF like a
one-sheet workbook.  ``make_dbf_bytes`` is the fixture twin.
"""

from __future__ import annotations

import struct

#: language driver id → codec, per the published dBASE/FoxPro LDID table
#: (the handful that cover real files; everything else falls back)
_LDID_CODECS = {
    0x01: "cp437", 0x02: "cp850", 0x03: "cp1252", 0x57: "cp1252",
    0x64: "cp852", 0x65: "cp866", 0x66: "cp865", 0x67: "cp861",
    0xC8: "cp1250", 0xC9: "cp1251", 0xCA: "cp1254", 0xCB: "cp1253",
}


def read_dbf_rows(path_or_bytes, *, password: str = "") -> dict[str, list[dict[str, str]]]:
    """``.dbf`` → ``{"Table1": [row dicts]}`` (deleted records skipped)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    # version low bits 2-5 cover dBASE II-V incl. the memo variants
    # (0x83/0x8B/0xF5); Visual FoxPro uses 0x30/0x31 outright
    if len(data) < 33 or (
        data[0] & 0x07 not in (0x02, 0x03, 0x04, 0x05)
        and data[0] not in (0x30, 0x31)
    ):
        raise ValueError("not a .dbf (unknown version byte)")
    n_records, header_len, record_len = struct.unpack("<IHH", data[4:12])
    codec = _LDID_CODECS.get(data[29], "cp1252")

    fields: list[tuple[str, str, int]] = []
    at = 32
    while at + 32 <= header_len and data[at] != 0x0D:
        raw_name = data[at:at + 11].split(b"\x00", 1)[0]
        ftype = chr(data[at + 11])
        flen = data[at + 16]
        fields.append((raw_name.decode(codec, "replace"), ftype, flen))
        at += 32
    if not fields:
        raise ValueError(".dbf without field descriptors")

    rows: list[dict[str, str]] = []
    at = header_len
    for _ in range(n_records):
        if at + record_len > len(data) or data[at:at + 1] == b"\x1a":
            break
        rec = data[at:at + record_len]
        at += record_len
        if rec[0] == 0x2A:  # deleted
            continue
        row: dict[str, str] = {}
        off = 1
        for name, ftype, flen in fields:
            raw = rec[off:off + flen]
            off += flen
            if ftype in ("C", "M", "B", "G"):
                row[name] = raw.decode(codec, errors="replace").rstrip()
            elif ftype in ("N", "F"):
                row[name] = raw.decode("ascii", errors="replace").strip()
            elif ftype == "L":
                ch = raw[:1].decode("ascii", errors="replace").upper()
                row[name] = "True" if ch in "YT" else "False" if ch in "NF" else ""
            elif ftype == "D":
                s = raw.decode("ascii", errors="replace").strip()
                row[name] = f"{s[0:4]}-{s[4:6]}-{s[6:8]}" if len(s) == 8 else s
            else:  # unknown type: raw trimmed text, never data loss
                row[name] = raw.decode(codec, errors="replace").strip()
        rows.append(row)
    return {"Table1": rows}


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def make_dbf_bytes(
    fields: list[tuple[str, str, int]],
    rows: list[list],
    *,
    deleted: set[int] | None = None,
    ldid: int = 0x03,
) -> bytes:
    """``([(name, type, len)], [[v, ...], ...])`` → a real dBASE III
    file.  ``deleted`` marks record indices with the 0x2A flag (the
    reader must skip them)."""
    codec = _LDID_CODECS.get(ldid, "cp1252")
    header_len = 32 + 32 * len(fields) + 1
    record_len = 1 + sum(f[2] for f in fields)
    out = bytearray(32)
    out[0] = 0x03
    out[1:4] = b"\x62\x08\x10"  # last-update date, inert
    struct.pack_into("<IHH", out, 4, len(rows), header_len, record_len)
    out[29] = ldid
    for name, ftype, flen in fields:
        d = bytearray(32)
        d[0:11] = name.encode(codec, "replace")[:10].ljust(11, b"\x00")
        d[11] = ord(ftype)
        d[16] = flen
        out += d
    out += b"\x0d"
    for i, row in enumerate(rows):
        out += b"\x2a" if deleted and i in deleted else b"\x20"
        for (name, ftype, flen), v in zip(fields, row):
            s = "" if v is None else str(v)
            if ftype == "D":
                s = s.replace("-", "")
            raw = s.encode(codec, errors="replace")
            if ftype in ("N", "F"):
                raw = raw.rjust(flen)[:flen]
            else:
                raw = raw.ljust(flen)[:flen]
            out += raw
    out += b"\x1a"
    return bytes(out)
