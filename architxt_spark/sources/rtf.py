"""RTF text source — pure stdlib.

Beyond-reference: RTF is the interchange format every legacy Windows
app exported (WordPad, early Outlook, database report writers), so a
1990s-2000s dump has plenty.  The reader implements the subset that
carries text, per the published RTF 1.9 specification:

- group stack (``{``/``}``) with inherited state (``\\ucN`` skip
  count, destination-skip, ``\\ansicpgN`` codepage);
- destination groups that never contain document text are skipped
  (``fonttbl``/``colortbl``/``stylesheet``/``info``/``pict``/
  ``object``/header/footer family), as is every ``{\\*`` group — the
  spec's own rule for unknown destinations;
- ``\\'hh`` hex-escaped bytes decode through the declared codepage
  with consecutive escapes buffered (double-byte codepages split one
  character across two escapes);
- ``\\uN`` unicode (negative values wrap mod 2^16) followed by the
  group's ``\\uc`` fallback characters, which are consumed;
- ``\\par``/``\\line``/``\\tab``/``\\{``/``\\}``/``\\\\``/``\\~`` and
  friends map to their characters; everything else is formatting and
  drops.

Output is the paragraph-list shape (``read_docx_paragraphs``).
``make_rtf_bytes`` is the fixture twin; ``unicode_escapes`` selects
``\\uN`` vs codepage ``\\'hh`` escaping so tests drive both decode
paths.
"""

from __future__ import annotations

_SKIP_DESTINATIONS = frozenset({
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "ftnsep", "ftnsepc",
    "xmlnstbl", "themedata", "colorschememapping", "filetbl",
    "listtable", "listoverridetable", "revtbl", "generator",
})

_CHAR_WORDS = {
    "par": "\n", "line": "\n", "tab": "\t", "emdash": "\u2014",
    "endash": "\u2013", "lquote": "\u2018", "rquote": "\u2019",
    "ldblquote": "\u201c", "rdblquote": "\u201d", "bullet": "\u2022",
    "emspace": "\u2003", "enspace": "\u2002", "~": "\u00a0",
    "_": "\u2011", "-": "",  # optional hyphen renders empty
}


def read_rtf_text(path_or_bytes, *, password: str = "") -> list[str]:
    """RTF → paragraph list.  ``password`` accepted for loader-signature
    parity (RTF has no encryption)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if not data.lstrip()[:5].startswith(b"{\\rtf"):
        raise ValueError("not an RTF file (missing {\\rtf header)")

    codec = "cp1252"
    out: list[str] = []
    pending: bytearray = bytearray()  # buffered \'hh bytes

    def flush() -> None:
        nonlocal pending
        if pending:
            out.append(pending.decode(codec, errors="replace"))
            pending = bytearray()

    # group state: (skipping, uc)
    stack: list[tuple[bool, int]] = []
    skipping, uc = False, 1
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x7B:  # {
            stack.append((skipping, uc))
            i += 1
        elif b == 0x7D:  # }
            flush()
            if stack:
                skipping, uc = stack.pop()
            i += 1
        elif b == 0x5C:  # backslash
            if i + 1 >= n:
                break
            c = data[i + 1]
            if c == ord("'"):
                code = data[i + 2:i + 4].decode("ascii", errors="replace")
                if not skipping:
                    try:
                        pending.append(int(code, 16))
                    except ValueError:
                        pass
                i += 4
                continue
            if not (65 <= c <= 90 or 97 <= c <= 122):
                # control symbol: one non-letter char
                if not skipping:
                    flush()
                    sym = chr(c)
                    if sym in "\\{}":
                        out.append(sym)
                    elif sym in _CHAR_WORDS:
                        out.append(_CHAR_WORDS[sym])
                    elif sym == "*" and stack:
                        # {\* ...}: unknown destination — skip the group
                        skipping = True
                elif chr(c) == "*":
                    pass
                i += 2
                continue
            # control word: letters + optional signed parameter
            j = i + 1
            while j < n and (65 <= data[j] <= 90 or 97 <= data[j] <= 122):
                j += 1
            word = data[i + 1:j].decode("ascii")
            k = j
            if k < n and (data[k] == 0x2D or 48 <= data[k] <= 57):
                k += 1
                while k < n and 48 <= data[k] <= 57:
                    k += 1
            param = int(data[j:k]) if k > j else None
            if k < n and data[k] == 0x20:  # the delimiting space is eaten
                k += 1
            i = k
            if word == "bin" and param and param > 0:
                i += param  # raw binary follows — may contain { } \
            elif word == "ansicpg" and param:
                try:
                    b"".decode(f"cp{param}")
                    codec = f"cp{param}"
                except LookupError:
                    pass
            elif word == "uc":
                uc = param if param is not None else 1
            elif word == "u" and not skipping:
                flush()
                cp = param if param is not None else 0
                if cp < 0:
                    cp += 65536
                out.append(chr(cp))
                # consume the group's fallback characters/escapes
                skip = uc
                while skip > 0 and i < n:
                    if data[i] == 0x5C and i + 1 < n and data[i + 1] == ord("'"):
                        i += 4
                    elif data[i] in (0x7B, 0x7D):
                        break  # fallback never crosses group bounds
                    else:
                        i += 1
                    skip -= 1
            elif word in _SKIP_DESTINATIONS:
                skipping = True
            elif word in _CHAR_WORDS and not skipping:
                flush()
                out.append(_CHAR_WORDS[word])
        elif b in (0x0D, 0x0A):
            i += 1  # raw newlines in the file are not document text
        else:
            if not skipping:
                if b < 0x80:
                    flush()
                    out.append(chr(b))
                else:
                    pending.append(b)  # raw high byte in the codepage
            i += 1
    flush()
    text = "".join(out)
    parts = text.split("\n")
    if parts and parts[-1] == "":
        parts.pop()
    return parts


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def make_rtf_bytes(
    paragraphs: list[str], *, unicode_escapes: bool = True, codepage: int = 1252
) -> bytes:
    """``["para", ...]`` → RTF — the fixture twin of
    :func:`read_rtf_text`.  Non-ASCII escapes as ``\\uN`` with a ``?``
    fallback when ``unicode_escapes``, else as codepage ``\\'hh``
    (characters outside the codepage still fall back to ``\\uN``)."""
    body = []
    codec = f"cp{codepage}"
    for p in paragraphs:
        esc = []
        for ch in p:
            o = ord(ch)
            if ch in "\\{}":
                esc.append("\\" + ch)
            elif o < 0x80:
                esc.append(ch)
            elif not unicode_escapes:
                try:
                    esc.append("".join(f"\\'{b:02x}" for b in ch.encode(codec)))
                except UnicodeEncodeError:
                    esc.append(f"\\u{o if o < 32768 else o - 65536}?")
            else:
                esc.append(f"\\u{o if o < 32768 else o - 65536}?")
        body.append("".join(esc) + "\\par\n")
    doc = (
        "{\\rtf1\\ansi\\ansicpg" + str(codepage) + "\\deff0\\uc1"
        "{\\fonttbl{\\f0\\froman Times New Roman;}}"
        "{\\colortbl;\\red0\\green0\\blue0;}"
        "{\\*\\generator architxt_spark fixture;}"
        "\\pard "
        + "".join(body)
        + "}"
    )
    return doc.encode("ascii", errors="strict")
