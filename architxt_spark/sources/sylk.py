"""SYLK (``.slk``) spreadsheet source — pure stdlib.

Beyond-reference: the Symbolic Link interchange format — line-oriented
records Excel, Multiplan, and Gnumeric have written since the 80s, and
a common export shape in old accounting dumps.  Published layout:
``;``-separated fields per line, record type first — ``ID`` header,
``B`` bounds, ``C`` cell (``Y``/``X`` 1-based coordinates that PERSIST
across records when omitted, ``K`` value), ``F`` formats (ignored),
``E`` end.  ``K`` payloads are numbers, or strings in double quotes
with ``;;`` escaping a literal semicolon.  Text decodes as cp1252 (the
codepage Excel's writer uses for its ANSI SYLK).

Output matches ``_read_xlsx_stdlib``: ``{sheet: [row dicts]}``, first
populated row as the header.  ``make_slk_bytes`` is the fixture twin.
"""

from __future__ import annotations

from architxt_spark.sources.wk1 import _fmt_num


def _split_fields(line: str) -> list[str]:
    """Split on ``;`` while honouring the ``;;`` escape inside fields."""
    out: list[str] = []
    cur: list[str] = []
    i = 0
    n = len(line)
    while i < n:
        ch = line[i]
        if ch == ";":
            if i + 1 < n and line[i + 1] == ";":
                cur.append(";")
                i += 2
                continue
            out.append("".join(cur))
            cur = []
            i += 1
            continue
        cur.append(ch)
        i += 1
    out.append("".join(cur))
    return out


def read_slk_rows(path_or_bytes, *, password: str = "") -> dict[str, list[dict[str, str]]]:
    """``.slk`` → ``{"Sheet1": [row dicts]}``."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        text = bytes(path_or_bytes).decode("cp1252", errors="replace")
    else:
        with open(path_or_bytes, "rb") as f:
            text = f.read().decode("cp1252", errors="replace")
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    if not lines or not lines[0].startswith("ID"):
        raise ValueError("not a SYLK file (missing ID record)")

    cells: dict[int, dict[int, str]] = {}
    x = y = 1
    for line in lines[1:]:
        if not line:
            continue
        fields = _split_fields(line)
        rtype = fields[0]
        if rtype == "E":
            break
        if rtype != "C":
            continue
        value: str | None = None
        for f in fields[1:]:
            if not f:
                continue
            tag, payload = f[0], f[1:]
            if tag == "Y" and payload.isdigit():
                y = int(payload)
            elif tag == "X" and payload.isdigit():
                x = int(payload)
            elif tag == "K":
                if payload.startswith('"'):
                    value = payload[1:-1] if payload.endswith('"') else payload[1:]
                elif payload in ("TRUE", "FALSE"):
                    value = payload.capitalize()
                else:
                    try:
                        value = _fmt_num(float(payload))
                    except ValueError:
                        value = payload
        if value is not None:
            cells.setdefault(y - 1, {})[x - 1] = value
    from architxt_spark.sources.xls import _shape_rows

    return {"Sheet1": _shape_rows(cells)}


def make_slk_bytes(rows: list[list], *, omit_repeat_y: bool = True) -> bytes:
    """Write SYLK: strings quote (with ``;;`` escaping), numbers go
    bare; when ``omit_repeat_y`` the Y coordinate is emitted only when
    the row changes, so the reader's coordinate persistence is
    load-bearing."""
    out = ["ID;PWXL;N;E"]
    ny = max(len(rows), 1)
    nx = max((len(r) for r in rows), default=1)
    out.append(f"B;Y{ny};X{nx};D0 0 {ny - 1} {nx - 1}")
    last_y = None
    for r, cols in enumerate(rows):
        for c, v in enumerate(cols):
            if v is None:
                continue
            coords = f"X{c + 1}" if omit_repeat_y and last_y == r else f"Y{r + 1};X{c + 1}"
            last_y = r
            if isinstance(v, str):
                payload = '"' + v.replace(";", ";;") + '"'
            else:
                payload = repr(float(v)) if not float(v).is_integer() else str(int(v))
            out.append(f"C;{coords};K{payload}")
    out.append("E")
    return ("\r\n".join(out) + "\r\n").encode("cp1252", "replace")
