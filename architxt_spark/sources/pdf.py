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

r12 widening: PDF 1.5+ **object streams** (``/Type /ObjStm`` packed
dictionaries — how LibreOffice/reportlab/qpdf emit the catalog, page
tree, and fonts, invisible to a raw object scan) are expanded into the
object table; **PNG predictors** (``/DecodeParms /Predictor 10-15``,
the standard xref-stream encoding) are reversed on any Flate stream;
and 1- and 2-byte **ToUnicode CMaps** (``bfchar``/``bfrange``) decode
per-font code-shifted strings, tracked through ``Tf`` font selects —
the 2-byte width covers ``/Type0`` ``/Identity-H`` composite fonts,
which is how LibreOffice/reportlab emit embedded font subsets.

Honest scope: this covers PDFs whose text uses standard single-byte
encodings plus ToUnicode-mapped simple and Identity-H composite fonts
(the overwhelming machine-generated case — invoices, reports, data
sheets, LaTeX and office-suite output).  Composite fonts WITHOUT a
usable ToUnicode CMap (or with >2-byte/mixed code spaces) still need a
real PDF library — their CMaps are rejected whole rather than
mis-split, falling back to latin-1.  Encrypted documents under the
standard security handler decrypt across its published shapes — RC4
(``/V`` 1-2), crypt-filter RC4 / AES-128 (``/V`` 4), and AES-256
(``/V`` 5, revisions 5 and 6 with the hardened hash) — transparently
when the user password is empty (V5 also accepts the owner password),
or with an explicit ``password=``; non-standard handlers and unknown
crypt filters raise ``NotImplementedError`` with guidance.

``make_pdf_bytes`` is the fixture twin: a structurally complete PDF
(catalog → page tree → pages → Flate'd content streams + xref table +
trailer) the round-trip tests drive.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_STREAM_START_RE = re.compile(rb"stream\r?\n")
_DIRECT_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


def _stream_span(body: bytes) -> tuple[int, int] | None:
    """``(start, end)`` byte span of one object's stream payload.

    Uses the dictionary's DIRECT ``/Length`` when an ``endstream``
    keyword sits at that offset — the spec-correct boundary, immune to
    payload bytes that mimic the terminator (ciphertext or Flate data
    ending in ``0x0D`` loses its last byte to the non-greedy scan's
    optional ``\\r``, a 1-in-256-per-stream corruption) — and falls
    back to the ``stream…endstream`` scan for indirect or absent
    ``/Length`` entries."""
    sm = _STREAM_START_RE.search(body)
    if sm is None:
        return None
    start = sm.end()
    lm = _DIRECT_LENGTH_RE.search(body[: sm.start()])
    if lm is not None:
        end = start + int(lm.group(1))
        if re.match(rb"\s*endstream\b", body[end:]):
            return (start, end)
    m = _STREAM_RE.search(body)
    return (m.start(1), m.end(1)) if m is not None else None


def _parse_objects(
    data: bytes, enc: tuple[str, bytes] | None = None
) -> dict[int, bytes]:
    """Object table from a raw ``N G obj … endobj`` scan; with ``enc``
    (a ``(mode, file key)`` pair from :func:`_encryption_key`) every
    stream segment is decrypted first — except xref streams, which the
    spec leaves in the clear.  Object streams expand after decryption
    (their payload is encrypted as a whole; the packed objects inside
    are not re-encrypted, per spec)."""
    objects: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        num, gen, body = int(m.group(1)), int(m.group(2)), m.group(3)
        if enc is not None and not re.search(rb"/Type\s*/XRef\b", body):
            span = _stream_span(body)
            if span is not None:
                dec = _decrypt_stream(body[span[0]: span[1]], enc, num, gen)
                body = body[: span[0]] + dec + body[span[1]:]
        objects[num] = body
    _expand_object_streams(objects)
    return objects


def _decrypt_stream(raw: bytes, enc: tuple[str, bytes], num: int, gen: int) -> bytes:
    """One stream body under the file key: per-object RC4, per-object
    AES-128-CBC (AESV2 — the md5 key gains the spec's ``sAlT`` suffix),
    or direct-file-key AES-256-CBC (AESV3)."""
    mode, key = enc
    if mode == "rc4":
        return _rc4_object(raw, key, num, gen)
    from architxt_spark.functions.aes import cbc_decrypt

    if mode == "aesv2":
        import hashlib

        h = hashlib.md5(
            key
            + num.to_bytes(3, "little")
            + gen.to_bytes(2, "little")
            + b"sAlT"
        ).digest()
        return cbc_decrypt(h[: min(len(key) + 5, 16)], raw)
    return cbc_decrypt(key, raw)  # aesv3: file key used directly


# ---------------------------------------------------------------------------
# standard security handler (RC4): the common "protected" PDF
# ---------------------------------------------------------------------------

#: the 32-byte password pad of the standard security handler
#: (PDF 32000-1 §7.6.3.3 Algorithm 2) — a published constant
_PDF_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4(key: bytes, data: bytes) -> bytes:
    from architxt_spark.sources.xls import _rc4_keystream

    return bytes(a ^ b for a, b in zip(data, _rc4_keystream(key, len(data))))


def _rc4_object(data: bytes, key: bytes, num: int, gen: int) -> bytes:
    """Per-object RC4 key (§7.6.2 Algorithm 1): md5 of the file key +
    3 low-order object-number bytes + 2 generation bytes, truncated to
    ``min(len(key)+5, 16)``."""
    import hashlib

    h = hashlib.md5(
        key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
    ).digest()
    return _rc4(h[: min(len(key) + 5, 16)], data)


def _pdf_string_entry(body: bytes, name: bytes) -> bytes | None:
    """The string value of ``/name`` in a dictionary body — hex
    (``<…>``) or literal (``(…)``) form."""
    m = re.search(rb"/" + name + rb"\s*(\(|<)", body)
    if m is None:
        return None
    if m.group(1) == b"<":
        j = body.find(b">", m.end())
        hx = re.sub(rb"\s", b"", body[m.end():j])
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode())
    s, _end = _literal_string(body, m.end() - 1)
    return s


def _std_security_key(
    o: bytes, u: bytes, p: int, file_id: bytes, r: int, n_key: int,
    password: str = "", *, metadata_clear: bool = False,
) -> bytes | None:
    """File encryption key of the standard security handler (Algorithm
    2), validated against ``/U`` (Algorithms 4/5) — ``None`` when the
    password does not open the document."""
    import hashlib
    import struct

    padded = (password.encode("latin-1", "replace") + _PDF_PAD)[:32]
    seed = padded + o[:32] + struct.pack("<i", p) + file_id
    if r >= 4 and metadata_clear:
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n_key]).digest()
    key = h[:n_key]
    if r == 2:
        ok = _rc4(key, _PDF_PAD) == u[:32]
    else:  # Algorithm 5: 20-pass RC4 chain over md5(PAD + ID)
        x = hashlib.md5(_PDF_PAD + file_id).digest()
        for i in range(20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x == u[:16]
    return key if ok else None


import functools


@functools.lru_cache(maxsize=256)
def _hash_2b(password: bytes, salt: bytes, udata: bytes) -> bytes:
    """The V5/R6 password hash (ISO 32000-2 Algorithm 2.B): SHA-256
    seed, then the AES-CBC hardening loop — round key/IV come from the
    running hash, the digest function rotates by the first 16 bytes of
    the encryption mod 3, and the loop ends after ≥64 rounds when the
    last byte says so."""
    import hashlib

    from architxt_spark.functions.aes import cbc_encrypt_raw

    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = cbc_encrypt_raw(k[:16], k[16:32], k1)
        k = [hashlib.sha256, hashlib.sha384, hashlib.sha512][sum(e[:16]) % 3](
            e
        ).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            break
    return k[:32]


def _v5_file_key(enc: bytes, password: str) -> bytes | None:
    """AES-256 file key (V5, R5/R6): validate the password against
    ``/U`` (user) or ``/O`` (owner), then unwrap ``/UE``/``/OE`` with a
    zero-IV AES-256-CBC (Algorithms 2.A / 8 / 9)."""
    import hashlib

    from architxt_spark.functions.aes import cbc_decrypt_raw

    r_m = re.search(rb"/R\s+(\d+)", enc)
    r = int(r_m.group(1)) if r_m else 6
    u = _pdf_string_entry(enc, b"U") or b""
    o = _pdf_string_entry(enc, b"O") or b""
    ue = _pdf_string_entry(enc, b"UE") or b""
    oe = _pdf_string_entry(enc, b"OE") or b""
    if len(u) < 48 or len(ue) < 32:
        raise ValueError("malformed V5 /Encrypt dictionary (U/UE)")
    pw = password.encode("utf-8")[:127]

    def hashed(salt: bytes, udata: bytes) -> bytes:
        if r == 5:  # the pre-ISO Adobe revision: single SHA-256
            return hashlib.sha256(pw + salt + udata).digest()
        return _hash_2b(pw, salt, udata)

    if hashed(u[32:40], b"") == u[:32]:  # user password
        ikey = hashed(u[40:48], b"")
        return cbc_decrypt_raw(ikey, b"\x00" * 16, ue[:32])
    if len(o) >= 48 and len(oe) >= 32 and hashed(o[32:40], u[:48]) == o[:32]:
        ikey = hashed(o[40:48], u[:48])  # owner password
        return cbc_decrypt_raw(ikey, b"\x00" * 16, oe[:32])
    return None


def _dict_top_level(body: bytes) -> bytes:
    """``body`` with nested ``<< … >>`` sub-dictionaries and string
    tokens removed, so searches for top-level keys cannot match
    per-filter entries.  qpdf writes the /Encrypt dictionary in
    alphabetical key order, putting ``/CF << … /Length 16 … >>`` (a
    crypt filter's key length in BYTES) before the top-level
    ``/Length 128`` (bits) — a first-match scan over the raw body
    reads 16 bits = 2 bytes and rejects a perfectly openable file."""
    out = bytearray()
    depth = 0
    i, n = 0, len(body)
    while i < n:
        if body.startswith(b"<<", i):
            depth += 1
            i += 2
            continue
        if body.startswith(b">>", i):
            depth -= 1
            i += 2
            continue
        b = body[i]
        if b == 0x28:  # ( literal string — may contain << >> bytes
            _, i = _literal_string(body, i)
            continue
        if b == 0x3C:  # < hex string (`<<` handled above)
            j = body.find(b">", i + 1)
            i = n if j < 0 else j + 1
            continue
        if depth <= 1:
            out.append(b)
        i += 1
    return bytes(out)


def _encryption_key(
    data: bytes, password: str = ""
) -> tuple[str, bytes] | None:
    """``(mode, file key)`` for an encrypted PDF (``None`` when the
    document is not encrypted).  Covers the STANDARD security handler
    across its published shapes: ``/V`` 1-2 (RC4 40-128), ``/V`` 4
    (crypt filters — ``/CFM`` ``/V2`` RC4 or ``/AESV2`` AES-128-CBC),
    and ``/V`` 5 (``/AESV3`` AES-256, revisions 5 and 6 with the
    hardened hash).  The empty USER password — the classic "protected"
    PDF that opens without prompting — is tried automatically, like the
    xls reader's default-password workbooks; V5 also accepts the owner
    password.  Non-standard handlers and unknown crypt filters raise
    with guidance."""
    if not re.search(rb"/Encrypt\b", data):
        return None
    refs = re.findall(rb"/Encrypt\s+(\d+)\s+\d+\s+R", data)
    if not refs:
        raise NotImplementedError(
            "encrypted PDF with an inline/unlocatable /Encrypt dictionary; "
            "decrypt with qpdf before ingestion"
        )
    enc_num = int(refs[-1])
    enc = next(
        (
            m.group(3)
            for m in _OBJ_RE.finditer(data)
            if int(m.group(1)) == enc_num
        ),
        b"",
    )
    v_m = re.search(rb"/V\s+(\d+)", enc)
    r_m = re.search(rb"/R\s+(\d+)", enc)
    v = int(v_m.group(1)) if v_m else 0
    r = int(r_m.group(1)) if r_m else 2
    if b"/Standard" not in enc or v not in (1, 2, 4, 5):
        raise NotImplementedError(
            f"PDF encryption V={v} R={r} (non-standard handler) needs a "
            "real PDF library (pypdf/qpdf); decrypt before ingestion"
        )

    if v == 5:
        for pw in dict.fromkeys([password, ""]):
            key = _v5_file_key(enc, pw)
            if key is not None:
                return ("aesv3", key)
        raise NotImplementedError(
            "password-protected PDF (neither password opens it): pass "
            "password=… or decrypt with qpdf before ingestion"
        )

    mode = "rc4"
    if v == 4:
        cf = re.search(rb"/StdCF\s*<<(.*?)>>", enc, re.S)
        cfm = re.search(rb"/CFM\s*/(\w+)", cf.group(1) if cf else enc)
        name = cfm.group(1) if cfm else b"V2"
        if name == b"AESV2":
            mode = "aesv2"
        elif name != b"V2":
            raise NotImplementedError(
                f"PDF crypt filter /CFM /{name.decode()} needs a real PDF "
                "library (pypdf/qpdf); decrypt before ingestion"
            )
    o, u = _pdf_string_entry(enc, b"O"), _pdf_string_entry(enc, b"U")
    p_m = re.search(rb"/P\s+(-?\d+)", enc)
    # /Length must come from the TOP level of the dictionary — crypt
    # filter sub-dicts carry their own /Length in bytes (see
    # _dict_top_level).  A sub-40 value is already bytes (ambiguous
    # writers), ≥40 is bits per the spec.
    len_m = re.search(rb"/Length\s+(\d+)", _dict_top_level(enc))
    if o is None or u is None or p_m is None:
        raise ValueError("malformed /Encrypt dictionary (missing O/U/P)")
    lv = int(len_m.group(1)) if len_m and v >= 2 else 40
    n_key = lv // 8 if lv >= 40 else lv
    if mode == "aesv2":
        n_key = 16
    metadata_clear = bool(re.search(rb"/EncryptMetadata\s+false", enc))
    id_m = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f\s]*)>", data)
    file_id = (
        bytes.fromhex(re.sub(rb"\s", b"", id_m.group(1)).decode())
        if id_m
        else b""
    )
    for pw in dict.fromkeys([password, ""]):  # explicit first, then empty
        key = _std_security_key(
            o, u, int(p_m.group(1)), file_id, r, n_key, pw,
            metadata_clear=metadata_clear,
        )
        if key is not None:
            return (mode, key)
    raise NotImplementedError(
        "password-protected PDF (user password is not empty): pass "
        "password=… or decrypt with qpdf before ingestion"
    )


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse PNG row filters (predictors 10-15: each ``columns``-byte
    row is preceded by a filter-type byte).  The standard encoding of
    xref streams (LibreOffice, reportlab, qpdf all emit Predictor 12 =
    PNG Up); bpp is 1 for the byte-column data PDF uses them on."""
    row_len = columns + 1
    out = bytearray()
    prev = bytes(columns)
    for at in range(0, len(data) - row_len + 1, row_len):
        ftype = data[at]
        row = bytearray(data[at + 1 : at + row_len])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(1, columns):
                row[i] = (row[i] + row[i - 1]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(columns):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(columns):
                left = row[i - 1] if i else 0
                row[i] = (row[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(columns):
                a = row[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = row
    return bytes(out)


_PREDICTOR_RE = re.compile(
    rb"/DecodeParms\s*<<(?P<p>[^>]*)>>|/DecodeParms\s+(\d+)\s+\d+\s+R"
)


def _object_stream(body: bytes) -> bytes | None:
    span = _stream_span(body)
    if span is None:
        return None
    raw = body[span[0]: span[1]]
    if b"FlateDecode" not in body:
        return raw
    try:
        data = zlib.decompress(raw)
    except zlib.error as e:
        raise ValueError("corrupt FlateDecode content stream") from e
    pm = _PREDICTOR_RE.search(body.split(b"stream", 1)[0])
    if pm is not None and pm.group("p") is not None:
        params = pm.group("p")
        pred_m = re.search(rb"/Predictor\s+(\d+)", params)
        pred = int(pred_m.group(1)) if pred_m else 1
        if pred >= 10:  # PNG family
            cols_m = re.search(rb"/Columns\s+(\d+)", params)
            cols = int(cols_m.group(1)) if cols_m else 1
            data = _png_unpredict(data, cols)
        elif pred == 2:
            raise NotImplementedError(
                "TIFF predictor 2 on a PDF stream — rare outside image "
                "XObjects; re-filter with qpdf before ingestion"
            )
    return data


def _expand_object_streams(objects: dict[int, bytes]) -> None:
    """Merge objects stored INSIDE ``/Type /ObjStm`` compressed object
    streams (PDF 1.5+; how LibreOffice/reportlab/qpdf pack the catalog,
    page tree, and font dictionaries) into the object table.  Stream
    layout: ``/N`` pairs of ``objnum offset`` ints, then the serialized
    objects starting at ``/First``.  Direct ``N 0 obj`` definitions win
    on collision (an incremental update overrides the packed copy)."""
    for body in list(objects.values()):
        head = body.split(b"stream", 1)[0]
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        n_m = re.search(rb"/N\s+(\d+)", head)
        first_m = re.search(rb"/First\s+(\d+)", head)
        data = _object_stream(body)
        if not (n_m and first_m and data):
            continue
        n, first = int(n_m.group(1)), int(first_m.group(1))
        header = data[:first].split()
        for k in range(min(n, len(header) // 2)):
            num, off = int(header[2 * k]), int(header[2 * k + 1])
            end = (
                first + int(header[2 * k + 3])
                if 2 * k + 3 < len(header)
                else len(data)
            )
            objects.setdefault(num, data[first + off : end])


_HEXTOK_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")


def _tounicode_map(cm: bytes) -> tuple[int, dict[int, str]] | None:
    """``(code_width_bytes, code→text)`` from a ``/ToUnicode`` CMap
    stream: single-byte simple fonts AND the 2-byte case (``bfchar``
    pairs and ``bfrange`` runs/arrays; destinations are UTF-16BE) — the
    2-byte width is how ``/Identity-H`` Type0 composite fonts come out
    of LibreOffice/reportlab with embedded font subsets.  Width is
    whatever the source codes consistently use; MIXED widths or codes
    wider than 2 bytes (exotic CJK code spaces) return ``None`` so the
    caller falls back to latin-1 rather than mis-splitting the byte
    stream — those need a real PDF library and stay gated."""

    def dst_text(hx: bytes) -> str:
        hx = re.sub(rb"\s", b"", hx)
        if len(hx) % 4:  # pad odd UTF-16 units defensively
            hx = hx[: len(hx) - len(hx) % 4]
        try:
            return bytes.fromhex(hx.decode()).decode("utf-16-be")
        except (ValueError, UnicodeDecodeError):
            return ""

    width = 0

    def src_code(hx: bytes) -> int | None:
        nonlocal width
        hx = re.sub(rb"\s", b"", hx)
        w = len(hx) // 2
        if len(hx) % 2 or w not in (1, 2) or (width and w != width):
            return None
        width = w
        return int(hx, 16)

    out: dict[int, str] = {}
    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", cm, re.S):
        toks = _HEXTOK_RE.findall(m.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            code = src_code(src)
            if code is None:
                return None
            out[code] = dst_text(dst)
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", cm, re.S):
        body = m.group(1)
        # run form: <lo> <hi> <dst>;  array form: <lo> <hi> [<d> <d> ...]
        for r in re.finditer(
            rb"<([0-9A-Fa-f\s]+)>\s*<([0-9A-Fa-f\s]+)>\s*(\[[^\]]*\]|<[0-9A-Fa-f\s]+>)",
            body,
        ):
            lo, hi = src_code(r.group(1)), src_code(r.group(2))
            if lo is None or hi is None:
                return None
            dst = r.group(3)
            if dst.startswith(b"["):
                dsts = _HEXTOK_RE.findall(dst)
                for code, d in zip(range(lo, hi + 1), dsts):
                    out[code] = dst_text(d)
            else:
                base = dst_text(dst[1:-1])
                if base:
                    # increment applies to the LAST UTF-16 unit (spec 9.10.3);
                    # corrupt CMaps can walk past U+10FFFF or into the
                    # surrogate block — skip those codes (they fall back to
                    # latin-1 like any unmapped code) instead of crashing
                    head, last = base[:-1], ord(base[-1])
                    for code in range(lo, hi + 1):
                        cp = last + code - lo
                        if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                            continue
                        out[code] = head + chr(cp)
    return (width, out) if out else None


def _page_fonts(
    head: bytes, objects: dict[int, bytes]
) -> dict[bytes, tuple[int, dict[int, str]]]:
    """``/Fx`` name → (code width, ToUnicode map) for one page's font
    resources.  ``/Resources`` may be inline or an indirect reference;
    fonts without a usable 1- or 2-byte ToUnicode CMap are simply
    absent (latin-1)."""
    res = head
    rm = re.search(rb"/Resources\s+(\d+)\s+\d+\s+R", head)
    if rm is not None:
        res = objects.get(int(rm.group(1)), b"")
    fonts: dict[bytes, tuple[int, dict[int, str]]] = {}
    fm = re.search(rb"/Font\s*<<(.*?)>>", res, re.S)
    if fm is None:
        return fonts
    for name, ref in re.findall(rb"(/\w+)\s+(\d+)\s+\d+\s+R", fm.group(1)):
        font_body = objects.get(int(ref), b"")
        tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", font_body)
        if tm is None:
            continue
        cm = _object_stream(objects.get(int(tm.group(1)), b""))
        if cm:
            cmap = _tounicode_map(cm)
            if cmap:
                fonts[name] = cmap
    return fonts


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


_TF_RE = re.compile(rb"(/\w+)\s+[\d.]+\s+Tf")


def _extract_text(
    content: bytes, fonts: dict[bytes, tuple[int, dict[int, str]]] | None = None
) -> str:
    """Text-showing operators of one content stream, word-broken at
    string boundaries and line-advance operators.  ``fonts`` maps
    resource names (``/F1``) to ``(code width, ToUnicode map)``; string
    bytes shown under a mapped font decode through its CMap — pairwise
    for 2-byte (Identity-H composite) fonts — everything else through
    latin-1 (the pre-ToUnicode behavior)."""
    parts: list[str] = []
    i = 0
    n = len(content)
    pending: list[bytes] = []
    cmap: tuple[int, dict[int, str]] | None = None

    def flush() -> None:
        if pending:
            raw = b"".join(pending)
            if cmap:
                width, codes = cmap
                if width == 2:
                    text = "".join(
                        codes.get(
                            int.from_bytes(raw[k : k + 2], "big"),
                            raw[k : k + 2].decode("latin-1"),
                        )
                        for k in range(0, len(raw) - 1, 2)
                    )
                    if len(raw) % 2:  # stray trailing byte: latin-1
                        text += chr(raw[-1])
                else:
                    text = "".join(codes.get(c, chr(c)) for c in raw)
            else:
                text = raw.decode("latin-1")
            if text.strip():
                parts.append(text)
            pending.clear()

    while i < n:
        b = content[i]
        if b == 0x2F and fonts:  # name token — font select (`/F1 12 Tf`)?
            # tracked during the main walk (which skips string literals)
            # so '/F2 9 Tf' INSIDE a shown string never switches fonts
            fm = _TF_RE.match(content, i)
            if fm is not None:
                cmap = fonts.get(fm.group(1))
                i = fm.end()
            else:
                i += 1
        elif b == 0x28:  # literal string
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


def read_pdf_pages(path_or_bytes, *, password: str = "") -> list[str]:
    """Extracted text per page, in page-tree order.  Encrypted
    documents under the standard security handler open transparently
    when the user password is empty — the common "protected" shape —
    or with an explicit ``password``: RC4 (V 1-2 and V4 /V2 filters),
    AES-128-CBC (V4 /AESV2), and AES-256 (V5 R5/R6 /AESV3, which also
    accepts the owner password).  Non-standard handlers and unknown
    crypt filters raise ``NotImplementedError`` with guidance."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    objects = _parse_objects(data, enc=_encryption_key(data, password))
    pages: list[str] = []
    for _num, body in sorted(objects.items()):
        head = body.split(b"stream", 1)[0]
        if not re.search(rb"/Type\s*/Page\b", head):
            continue
        m = re.search(rb"/Contents\s+(\[[^\]]*\]|\d+\s+\d+\s+R)", head)
        if m is None:
            pages.append("")
            continue
        fonts = _page_fonts(head, objects)
        text_parts = []
        for ref in _REF_RE.finditer(m.group(1)):
            stream = _object_stream(objects.get(int(ref.group(1)), b""))
            if stream:
                text_parts.append(_extract_text(stream, fonts))
        pages.append("\n".join(p for p in text_parts if p))
    return pages


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _escape_encoded(raw: bytes) -> bytes:
    out = bytearray()
    for b in raw:
        if b in (0x5C, 0x28, 0x29):
            out.append(0x5C)
        out.append(b)
    return bytes(out)


#: ToUnicode fixture encoding: printable ASCII stored as code+1, mapped
#: back by one bfrange (<21> <7F> -> U+0020..) — readback is only
#: correct if the reader actually applies the CMap.
_TOUNICODE_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
/CMapName /FixtureShift def /CMapType 2 def
1 begincodespacerange <00> <FF> endcodespacerange
1 beginbfrange
<21> <7F> <0020>
endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end"""

#: 2-byte fixture CMap (the Identity-H composite-font shape): printable
#: ASCII stored as glyph code ord+0x0100 in hex strings, one bfrange back.
_TOUNICODE_CMAP_CID = b"""/CIDInit /ProcSet findresource begin
12 dict begin begincmap
/CMapName /FixtureCid def /CMapType 2 def
1 begincodespacerange <0000> <FFFF> endcodespacerange
1 beginbfrange
<0120> <017E> <0020>
endbfrange
endcmap CMapName currentdict /CMap defineresource pop end end"""


def _fixture_encryption(
    file_id: bytes, *, user_password: str = "", owner_password: str = "owner"
) -> tuple[bytes, bytes, bytes, int]:
    """(file key, O, U, P) for the fixture's /Encrypt dict — standard
    security handler R3/V2, 128-bit (Algorithms 2, 3, 5)."""
    import hashlib

    p = -3904  # print allowed, modify/copy denied — a typical mask
    opad = ((owner_password or user_password).encode() + _PDF_PAD)[:32]
    h = hashlib.md5(opad).digest()
    for _ in range(50):
        h = hashlib.md5(h[:16]).digest()
    okey = h[:16]
    o = (user_password.encode() + _PDF_PAD)[:32]
    for i in range(20):
        o = _rc4(bytes(b ^ i for b in okey), o)
    import struct

    upad = (user_password.encode() + _PDF_PAD)[:32]
    h = hashlib.md5(upad + o + struct.pack("<i", p) + file_id).digest()
    for _ in range(50):
        h = hashlib.md5(h[:16]).digest()
    key = h[:16]
    u = hashlib.md5(_PDF_PAD + file_id).digest()
    for i in range(20):
        u = _rc4(bytes(b ^ i for b in key), u)
    return key, o, u + b"\x00" * 16, p


def _fixture_encryption_v5(
    file_id: bytes, *, user_password: str = "", owner_password: str = "owner"
) -> tuple[bytes, bytes]:
    """(file key, /Encrypt dict) for the fixture's AES-256 shape —
    standard handler V5/R6 (Algorithms 8, 9, 10: hardened hashes, U/UE
    and O/OE pairs, the /Perms block)."""
    import hashlib
    import struct

    from architxt_spark.functions.aes import cbc_encrypt_raw, encrypt_block

    p = -3904
    fkey = hashlib.sha256(b"architxt-fixture-key:" + file_id).digest()
    salt = hashlib.sha256(b"architxt-fixture-salt:" + file_id).digest()
    vs_u, ks_u, vs_o, ks_o = salt[:8], salt[8:16], salt[16:24], salt[24:32]
    upw = user_password.encode("utf-8")[:127]
    opw = owner_password.encode("utf-8")[:127]
    u = _hash_2b(upw, vs_u, b"") + vs_u + ks_u
    ue = cbc_encrypt_raw(_hash_2b(upw, ks_u, b""), b"\x00" * 16, fkey)
    o = _hash_2b(opw, vs_o, u) + vs_o + ks_o
    oe = cbc_encrypt_raw(_hash_2b(opw, ks_o, u), b"\x00" * 16, fkey)
    perms = encrypt_block(
        fkey, struct.pack("<i", p) + b"\xff\xff\xff\xffTadbarch"
    )
    enc_dict = (
        "<< /Filter /Standard /V 5 /R 6 /Length 256 "
        "/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen /Length 32 >> >> "
        f"/StmF /StdCF /StrF /StdCF /P {p} "
        f"/O <{o.hex()}> /U <{u.hex()}> /OE <{oe.hex()}> /UE <{ue.hex()}> "
        f"/Perms <{perms.hex()}> >>"
    ).encode()
    return fkey, enc_dict


def _encrypt_body(
    body: bytes, mode: str, key: bytes, num: int, gen: int = 0
) -> bytes:
    span = _stream_span(body)
    if span is None:
        return body
    raw = body[span[0]: span[1]]
    if mode == "rc4":
        ct = _rc4_object(raw, key, num, gen)
    else:
        import hashlib

        from architxt_spark.functions.aes import cbc_encrypt

        iv = hashlib.md5(b"architxt-pdf-iv:%d" % num).digest()
        if mode == "aesv2":
            obj = hashlib.md5(
                key + num.to_bytes(3, "little") + gen.to_bytes(2, "little")
                + b"sAlT"
            ).digest()[: min(len(key) + 5, 16)]
        else:
            obj = key
        ct = cbc_encrypt(obj, iv, raw)
    head, tail = body[: span[0]], body[span[1]:]
    if len(ct) != len(raw):  # AES adds IV + padding: fix the declared length
        head = re.sub(rb"/Length \d+", b"/Length %d" % len(ct), head)
    return head + ct + tail


def make_pdf_bytes(
    pages: list[str],
    *,
    compress: bool = True,
    object_streams: bool = False,
    tounicode: bool = False,
    cid: bool = False,
    encrypt: bool = False,
    user_password: str = "",
) -> bytes:
    """Structurally complete single-font PDF: one Flate'd (or raw)
    content stream per page, page tree, xref table, trailer.

    ``object_streams=True`` emits the MODERN (PDF 1.5+) file shape the
    way LibreOffice/reportlab/qpdf do: the catalog, page tree, page and
    font dictionaries packed into one Flate'd ``/ObjStm`` and located by
    a compressed CROSS-REFERENCE STREAM (``/W [1 4 2]``, Predictor 12 =
    PNG Up, type-2 entries) instead of a classic xref table — none of
    the page structure is visible to a raw ``N 0 obj`` scan without
    object-stream expansion.  ``tounicode=True`` stores every string
    with printable-ASCII codes SHIFTED by one and attaches a
    ``/ToUnicode`` bfrange CMap that shifts them back: readback equals
    the input only if the reader applies the CMap.  ``cid=True`` emits
    the composite-font shape instead — a ``/Type0`` ``/Identity-H``
    font whose strings are 2-BYTE glyph codes (``ord+0x0100``) in hex
    strings, with a 2-byte ToUnicode CMap: the LibreOffice
    embedded-font-subset output shape."""
    if tounicode and cid:
        raise ValueError("tounicode and cid are alternative font shapes")
    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    cmap_num = font_num + 1 if (tounicode or cid) else 0
    desc_num = cmap_num + 1 if cid else 0

    packed: list[tuple[int, bytes]] = []  # dictionary-only objects
    streams: list[tuple[int, bytes]] = []  # objects with stream data

    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    packed.append((1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    packed.append(
        (2, f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())
    )
    for i, page_text in enumerate(pages):
        content_num = 4 + 2 * i
        packed.append(
            (
                3 + 2 * i,
                (
                    f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                    f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                    f"/Contents {content_num} 0 R >>"
                ).encode(),
            )
        )
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(page_text.split("\n")):
            if j:
                ops.append(b"0 -14 Td")
            if cid:
                hx = "".join(f"{(ord(c) + 0x100) & 0xFFFF:04X}" for c in line)
                ops.append(f"<{hx}> Tj".encode())
            elif tounicode:
                enc = bytes((ord(c) + 1) & 0xFF for c in line)
                ops.append(b"(" + _escape_encoded(enc) + b") Tj")
            else:
                ops.append(f"({_pdf_escape(line)}) Tj".encode("latin-1"))
        ops.append(b"ET")
        stream = b" ".join(ops)
        if compress:
            stream = zlib.compress(stream)
            filt = b"/Filter /FlateDecode "
        else:
            filt = b""
        streams.append(
            (
                content_num,
                b"<< " + filt + f"/Length {len(stream)} >>".encode()
                + b"\nstream\n" + stream + b"\nendstream",
            )
        )
    if cid:
        packed.append(
            (
                font_num,
                (
                    f"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
                    f"/Encoding /Identity-H /DescendantFonts [{desc_num} 0 R] "
                    f"/ToUnicode {cmap_num} 0 R >>"
                ).encode(),
            )
        )
        packed.append(
            (
                desc_num,
                b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture "
                b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
                b"/Supplement 0 >> /CIDToGIDMap /Identity >>",
            )
        )
    else:
        font = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        if tounicode:
            font += f" /ToUnicode {cmap_num} 0 R".encode()
        packed.append((font_num, font + b" >>"))
    if tounicode or cid:
        cm = zlib.compress(_TOUNICODE_CMAP_CID if cid else _TOUNICODE_CMAP)
        streams.append(
            (
                cmap_num,
                b"<< /Filter /FlateDecode " + f"/Length {len(cm)} >>".encode()
                + b"\nstream\n" + cm + b"\nendstream",
            )
        )

    enc_num, key, mode, trailer_extra = 0, None, "", ""
    if encrypt:
        import hashlib

        mode = "rc4" if encrypt is True else str(encrypt)
        if mode not in ("rc4", "aesv2", "aesv3"):
            raise ValueError(f"unknown encrypt mode {mode!r}")
        enc_num = (desc_num or cmap_num or font_num) + 1
        file_id = hashlib.md5(
            ("architxt-pdf-fixture:" + "\x1e".join(pages)).encode("utf-8", "replace")
        ).digest()
        if mode == "aesv3":
            key, enc_dict = _fixture_encryption_v5(
                file_id, user_password=user_password
            )
        else:
            key, o, u, p = _fixture_encryption(
                file_id, user_password=user_password
            )
            if mode == "rc4":
                head = "/V 2 /R 3 /Length 128 "
            else:  # aesv2: crypt filters, AES-128
                head = (
                    "/V 4 /R 4 /Length 128 "
                    "/CF << /StdCF << /CFM /AESV2 /AuthEvent /DocOpen "
                    "/Length 16 >> >> /StmF /StdCF /StrF /StdCF "
                )
            enc_dict = (
                f"<< /Filter /Standard {head}/P {p} "
                f"/O <{o.hex()}> /U <{u.hex()}> >>"
            ).encode()
        streams = [
            (num, _encrypt_body(body, mode, key, num)) for num, body in streams
        ]
        trailer_extra = (
            f" /Encrypt {enc_num} 0 R /ID [<{file_id.hex()}> <{file_id.hex()}>]"
        )

    if not object_streams:
        all_objs = sorted(packed + streams)
        if encrypt:
            all_objs.append((enc_num, enc_dict))
        objs = [body for _num, body in all_objs]
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
            f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R{trailer_extra} >>\n"
            f"startxref\n{xref_at}\n%%EOF\n"
        ).encode()
        return bytes(out)

    # --- modern shape: ObjStm + predictor-coded xref stream -------------
    objstm_num = (enc_num or desc_num or cmap_num or font_num) + 1
    xref_num = objstm_num + 1
    parts, offs, at = [], [], 0
    for _num, body in packed:
        offs.append(at)
        parts.append(body + b"\n")
        at += len(body) + 1
    header = " ".join(f"{num} {off}" for (num, _), off in zip(packed, offs))
    header = (header + "\n").encode()
    payload = zlib.compress(header + b"".join(parts))
    objstm_body = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(header)} "
        f"/Filter /FlateDecode /Length {len(payload)} >>".encode()
        + b"\nstream\n" + payload + b"\nendstream"
    )
    if encrypt:
        # the packed objects travel inside the (whole-stream) encrypted
        # ObjStm; the /Encrypt dict itself stays top-level and clear
        objstm_body = _encrypt_body(objstm_body, mode, key, objstm_num)

    out = bytearray(b"%PDF-1.5\n")
    offsets: dict[int, int] = {}
    top = sorted(streams) + [(objstm_num, objstm_body)]
    if encrypt:
        top.append((enc_num, enc_dict))
    for num, body in sorted(top):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"

    # xref stream rows (/W [1 4 2]): type 0 free / 1 at-offset / 2 in-objstm
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            row = (0, 0, 65535)
        elif num in offsets:
            row = (1, offsets[num], 0)
        elif num == xref_num:
            row = (1, 0, 0)  # patched below
        else:
            idx = next(k for k, (pn, _b) in enumerate(packed) if pn == num)
            row = (2, objstm_num, idx)
        rows += bytes([row[0]]) + row[1].to_bytes(4, "big") + row[2].to_bytes(2, "big")
    xref_at = len(out)
    # patch the xref stream's own offset, then PNG-Up predictor-encode
    cols = 7
    pos = xref_num * cols
    rows[pos:pos + cols] = bytes([1]) + xref_at.to_bytes(4, "big") + b"\x00\x00"
    filtered = bytearray()
    prev = bytes(cols)
    for r in range(0, len(rows), cols):
        row = rows[r:r + cols]
        filtered.append(2)  # Up
        filtered += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
        prev = row
    xdata = zlib.compress(bytes(filtered))
    out += f"{xref_num} 0 obj\n".encode() + (
        f"<< /Type /XRef /Size {size} /W [1 4 2] /Root 1 0 R{trailer_extra} "
        f"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns {cols} >> "
        f"/Length {len(xdata)} >>".encode()
        + b"\nstream\n" + xdata + b"\nendstream"
    ) + b"\nendobj\n"
    out += f"startxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)
