"""Legacy binary ``.xls`` (BIFF5/BIFF8 in an OLE2 compound file) —
pure-stdlib read path for
:func:`architxt_spark.sources.documents.read_document_file`.

The reference parses Excel via pandas/xlrd (``loader/documents.py:22-29``);
this module reads the common BIFF shapes with ``struct`` alone so the
legacy-codec gate only fires for the genuinely exotic cases:

- OLE2/CFB container: header DIFAT (≤109 FAT sectors ≈ 6.8 MB files),
  FAT chains, directory walk, and the mini-FAT path for workbook
  streams under the 4096-byte cutoff;
- BIFF8 workbook: globals substream (``BOUNDSHEET`` sheet index, ``SST``
  shared strings INCLUDING ``CONTINUE`` spans with per-continuation
  option flags), then per-sheet cell records — ``LABELSST``, ``LABEL``,
  ``NUMBER``, ``RK``, ``MULRK``, ``BOOLERR``;
- BIFF5/BIFF7 workbook (r11): pre-unicode byte strings decoded through
  the ``CODEPAGE`` record's encoding (``LABEL`` cells, byte-string
  sheet names, no SST);
- RC4-encrypted workbooks (r11): the MS-OFFCRYPTO §2.3.6 binary-RC4
  scheme — MD5 key derivation from the UTF-16LE password, 1024-byte
  rekeying blocks aligned to the workbook-stream offset, verifier
  check, plaintext record headers / ``BOF``/``FILEPASS``/``BoundSheet8
  .lbPlyPos`` exemptions.  Files saved "encrypted" with no explicit
  password use Excel's well-known default password
  (``VelvetSweatshop``) and therefore open transparently — a real
  corpus case;
- BIFF2–4 worksheets (r13): the pre-OLE2 shape Excel 2.x-4.0 wrote —
  the FILE is the record stream, one sheet, no SST; BIFF2's 3-byte
  cell attributes and 1-byte LABEL lengths, BIFF3/4's 2-byte-ixfe
  layouts (which BIFF5 kept), CODEPAGE-decoded byte strings;
- DIFAT-chained containers (r13): >6.8 MB files whose FAT locations
  spill past the header's 109 slots into chained DIFAT sectors
  (MS-CFB §2.5) — big real-world workbooks;
- XOR-obfuscated workbooks (r14): MS-OFFCRYPTO §2.3.7 method 0 — the
  Excel 5.0/95 "password to open" (and the likeliest legacy gate in a
  1990s-era dump).  Verifier derivation is pinned against the widely
  published ``b"password" → 0x83AF`` known answer; the 105-entry
  XorMatrix regenerates from its 15 row seeds via the CRC-CCITT LFSR
  structure the published table follows; round-trip is pinned both
  directions against the fixture twin.  No independent ciphertext
  fixture exists in this container, so cross-implementation interop
  of the array-fill ordering is untested — flagged here honestly;
- raises ``NotImplementedError`` with guidance for encrypted
  pre-BIFF5 streams — those genuinely want xlrd.

Output shape matches ``_read_xlsx_stdlib``: ``{sheet: [row dicts]}``,
first row = header, every value a string.  ``make_xls_bytes`` is the
fixture-writer twin (real OLE2 + BIFF8/BIFF5 bytes, regular-FAT or
mini-stream layout, optional RC4 encryption) the round-trip tests
drive both paths with.
"""

from __future__ import annotations

import hashlib
import struct

_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
_ENDOFCHAIN = 0xFFFFFFFE
_FATSECT = 0xFFFFFFFD
_FREESECT = 0xFFFFFFFF


# ---------------------------------------------------------------------------
# OLE2 / CFB container
# ---------------------------------------------------------------------------


def _cfb_stream(data: bytes, names: tuple[str, ...]) -> bytes:
    """Extract the first directory stream whose name (case-insensitive)
    is in ``names`` from an OLE2 compound file."""
    if data[:8] != _MAGIC:
        raise ValueError("not an OLE2 compound file (bad magic)")
    sector_shift, mini_shift = struct.unpack("<HH", data[30:34])
    ssz, msz = 1 << sector_shift, 1 << mini_shift
    (n_fat,) = struct.unpack("<I", data[44:48])
    (first_dir,) = struct.unpack("<I", data[48:52])
    (mini_cutoff,) = struct.unpack("<I", data[56:60])
    (first_minifat,) = struct.unpack("<I", data[60:64])
    (first_difat,) = struct.unpack("<I", data[68:72])
    (n_difat,) = struct.unpack("<I", data[72:76])

    def sector(i: int) -> bytes:
        off = 512 + i * ssz
        return data[off:off + ssz]

    difat = list(struct.unpack("<109I", data[76:512]))
    # >6.8 MB files overflow the header's 109 FAT locations into chained
    # DIFAT sectors (MS-CFB §2.5): each carries ssz/4 − 1 FAT sector
    # numbers plus the next DIFAT sector in its last field
    s, seen = first_difat, set()
    for _ in range(n_difat):
        if s in (_ENDOFCHAIN, _FREESECT):
            break
        if s in seen:
            raise ValueError("OLE2 DIFAT chain cycle")
        seen.add(s)
        vals = struct.unpack(f"<{ssz // 4}I", sector(s))
        difat.extend(vals[:-1])
        s = vals[-1]
    fat = b"".join(sector(s) for s in difat[:n_fat] if s != _FREESECT)
    fat_entries = struct.unpack(f"<{len(fat) // 4}I", fat)

    def chain(start: int) -> bytes:
        out, s, seen = [], start, set()
        while s not in (_ENDOFCHAIN, _FREESECT) and s < len(fat_entries):
            if s in seen:
                raise ValueError("OLE2 FAT chain cycle")
            seen.add(s)
            out.append(sector(s))
            s = fat_entries[s]
        return b"".join(out)

    directory = chain(first_dir)
    entries = []
    for off in range(0, len(directory) - 127, 128):
        e = directory[off:off + 128]
        (name_len,) = struct.unpack("<H", e[64:66])
        if not 2 <= name_len <= 64:
            continue
        name = e[:name_len - 2].decode("utf-16-le", errors="replace")
        etype = e[66]
        (start,) = struct.unpack("<I", e[116:120])
        (size,) = struct.unpack("<I", e[120:124])
        entries.append((name, etype, start, size))

    root = next((e for e in entries if e[1] == 5), None)
    target = next(
        (e for e in entries if e[1] == 2 and e[0].lower() in names), None
    )
    if target is None:
        raise ValueError(f"OLE2 file has no stream named any of {names}")
    _, _, start, size = target

    if size >= mini_cutoff:
        return chain(start)[:size]
    # mini-stream path: the root entry's chain is the container; the
    # mini-FAT (its own regular chain) maps 64-byte mini sectors
    if root is None or first_minifat in (_ENDOFCHAIN, _FREESECT):
        raise ValueError("mini stream without a mini FAT")
    container = chain(root[2])
    minifat = chain(first_minifat)
    mini_entries = struct.unpack(f"<{len(minifat) // 4}I", minifat)
    out, s, seen = [], start, set()
    while s not in (_ENDOFCHAIN, _FREESECT) and s < len(mini_entries):
        if s in seen:
            raise ValueError("OLE2 mini-FAT chain cycle")
        seen.add(s)
        out.append(container[s * msz:(s + 1) * msz])
        s = mini_entries[s]
    return b"".join(out)[:size]


# ---------------------------------------------------------------------------
# RC4 encryption (MS-OFFCRYPTO §2.3.6 binary RC4; Excel 97 workbooks)
# ---------------------------------------------------------------------------

#: Excel's documented default password: workbooks "protected" without a
#: user password are RC4-encrypted under this literal and open
#: transparently in Excel — so the reader must try it before gating.
DEFAULT_XLS_PASSWORD = "VelvetSweatshop"

#: records whose bodies stay plaintext inside an encrypted stream
#: (MS-XLS 2.2.10), keyed by opcode
_PLAINTEXT_RECORDS = frozenset(
    {0x0809, 0x002F, 0x00E1, 0x0194, 0x0195, 0x0196, 0x0138}
)


def _rc4_keystream(key: bytes, n: int) -> bytes:
    """Plain RC4 PRGA output of ``n`` bytes for ``key`` (KSA + PRGA)."""
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(n)
    i = j = 0
    for k in range(n):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def _rc4_base_key(password: str, salt: bytes) -> bytes:
    """Password → 5-byte truncated intermediate key: MD5 of the UTF-16LE
    password truncated to 5 bytes, then MD5 over 16 repetitions of
    (trunc + salt), truncated to 5 bytes again (the 40-bit lineage)."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()[:5]
    return hashlib.md5((h0 + salt) * 16).digest()[:5]


def _rc4_block_key(base: bytes, block: int) -> bytes:
    return hashlib.md5(base + struct.pack("<I", block)).digest()[:16]


def _rc4_stream_keystream(base: bytes, n: int) -> bytes:
    """Keystream covering byte offsets 0..n of the workbook stream —
    rekeyed every 1024 bytes relative to the stream start."""
    out = bytearray()
    block = 0
    while len(out) < n:
        out += _rc4_keystream(_rc4_block_key(base, block), 1024)
        block += 1
    return bytes(out[:n])


def _rc4_verify(password: str, body: bytes) -> bytes | None:
    """Check the FILEPASS verifier; return the 5-byte base key on
    success, None on wrong password."""
    salt = body[6:22]
    enc_verifier = body[22:38]
    enc_hash = body[38:54]
    base = _rc4_base_key(password, salt)
    ks = _rc4_keystream(_rc4_block_key(base, 0), 32)
    verifier = bytes(a ^ b for a, b in zip(enc_verifier, ks[:16]))
    vhash = bytes(a ^ b for a, b in zip(enc_hash, ks[16:]))
    return base if hashlib.md5(verifier).digest() == vhash else None


def _rc4_apply(stream: bytes, base: bytes, ks: bytes | None = None) -> bytes:
    """De/encrypt record bodies in place against the stream-offset-
    aligned keystream: headers, exempt records, and BoundSheet8's
    first-4-byte ``lbPlyPos`` stay plaintext, but the keystream still
    advances over them (it is tied to the absolute offset).  ``ks``
    overrides the binary-RC4 keystream (the CryptoAPI variant shares
    this record walk with its SHA-1-derived blocks)."""
    if ks is None:
        ks = _rc4_stream_keystream(base, len(stream))
    out = bytearray(stream)
    pos = 0
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack("<HH", stream[pos:pos + 4])
        body_at = pos + 4
        if opcode not in _PLAINTEXT_RECORDS:
            skip = 4 if opcode == 0x0085 else 0  # BoundSheet8.lbPlyPos
            for i in range(body_at + skip, body_at + length):
                out[i] ^= ks[i]
        pos = body_at + length
    return bytes(out)


def _capi_block_key(h0: bytes, block: int, key_bytes: int) -> bytes:
    """RC4 CryptoAPI block key (MS-OFFCRYPTO §2.3.5.2): SHA-1 of the
    password hash + little-endian block number; the 40-bit export
    variant pads its 5 real bytes to a 16-byte key with zeros."""
    k = hashlib.sha1(h0 + struct.pack("<I", block)).digest()[:key_bytes]
    if key_bytes == 5:
        k += b"\x00" * 11
    return k


def _capi_stream_keystream(h0: bytes, key_bytes: int, n: int) -> bytes:
    out = bytearray()
    block = 0
    while len(out) < n:
        out += _rc4_keystream(_capi_block_key(h0, block, key_bytes), 1024)
        block += 1
    return bytes(out[:n])


def _capi_verify(
    password: str, salt: bytes, enc_verifier: bytes, enc_hash: bytes,
    key_bytes: int,
) -> bytes | None:
    """CryptoAPI verifier check; returns the SHA-1 password hash (the
    per-block key seed) on success."""
    h0 = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    ks = _rc4_keystream(_capi_block_key(h0, 0, key_bytes), 36)
    verifier = bytes(a ^ b for a, b in zip(enc_verifier, ks[:16]))
    vhash = bytes(a ^ b for a, b in zip(enc_hash, ks[16:36]))
    return h0 if hashlib.sha1(verifier).digest() == vhash else None


# ---------------------------------------------------------------------------
# XOR obfuscation (MS-OFFCRYPTO §2.3.7; FILEPASS wEncryptionType 0 — the
# original Excel 5.0/95 "password to open", still writable by modern Excel)
# ---------------------------------------------------------------------------

#: §2.3.7.2 InitialCode: the XOR key seed, selected by password length.
_XOR_INITIAL_CODE = (
    0xE1F0, 0x1D0F, 0xCC9C, 0x84C0, 0x110C, 0x0E10, 0xF1CE, 0x313E,
    0x1872, 0xE139, 0xD40F, 0x84F9, 0x280C, 0xA96A, 0x4EC3,
)

#: §2.3.7.2 XorMatrix row seeds.  The published 105-entry matrix is 15
#: rows (one per password position) of 7 values (one per char bit), and
#: each row is 7 successive states of the CRC-CCITT LFSR (x^16 + x^12 +
#: x^5 + 1, i.e. shift-left-and-xor-0x1021 on carry) from its first
#: value — so only the row seeds are data; the rest regenerates.
_XOR_ROW_SEEDS = (
    0xAEFC, 0x7B61, 0x4563, 0x0375, 0xD849, 0x6F45, 0xEB23, 0x47D3,
    0xB861, 0x45A0, 0xAA51, 0x76B4, 0x3730, 0x01A2, 0x0B2B,
)

#: §2.3.7.3 PadArray: fills the 16-byte XOR array past the password.
_XOR_PAD = bytes((
    0xBB, 0xFF, 0xFF, 0xBA, 0xFF, 0xFF, 0xB9, 0x80,
    0x00, 0xBE, 0x0F, 0x00, 0xBF, 0x0F, 0x00,
))

_XOR_MATRIX: list[int] = []


def _xor_matrix() -> list[int]:
    if not _XOR_MATRIX:
        for seed in _XOR_ROW_SEEDS:
            v = seed
            for _ in range(7):
                _XOR_MATRIX.append(v)
                v = ((v << 1) ^ 0x1021) & 0xFFFF if v & 0x8000 else v << 1
    return _XOR_MATRIX


def xor_password_verifier(pw: bytes) -> int:
    """§2.3.7.1 CreatePasswordVerifier_Method1 — the 16-bit verifier
    stored in the FILEPASS record (also Excel's legacy sheet-protection
    hash; pinned by the published ``b"password" → 0x83AF`` value)."""
    v = 0
    for b in reversed(bytes((len(pw),)) + pw):
        v = (((v >> 14) & 1) | ((v << 1) & 0x7FFF)) ^ b
    return v ^ 0xCE4B


def _xor_create_key(pw: bytes) -> int:
    """§2.3.7.2 CreateXorKey_Method1: 16-bit key from InitialCode +
    per-bit XorMatrix folds, last password char first (row 15 down)."""
    key = _XOR_INITIAL_CODE[len(pw) - 1]
    matrix = _xor_matrix()
    element = 104
    for ch in reversed(pw):
        for _ in range(7):
            if ch & 0x40:
                key ^= matrix[element]
            ch = (ch << 1) & 0xFF
            element -= 1
    return key


def _xor_ror(a: int, b: int) -> int:
    """§2.3.7.3 XorRor: xor then rotate right one bit (byte-wide)."""
    v = (a ^ b) & 0xFF
    return ((v >> 1) | (v << 7)) & 0xFF


def _xor_create_array(pw: bytes) -> bytes:
    """§2.3.7.3 CreateXorArray_Method1: the 16-byte obfuscation array —
    password bytes (low/high key byte alternating) then PadArray filler
    from the top down, all through XorRor."""
    key = _xor_create_key(pw)
    hi, lo = (key >> 8) & 0xFF, key & 0xFF
    arr = bytearray(16)
    idx = len(pw)
    if idx & 1:
        arr[idx] = _xor_ror(_XOR_PAD[0], hi)
        idx -= 1
        arr[idx] = _xor_ror(pw[-1], lo)
    while idx > 0:
        idx -= 1
        arr[idx] = _xor_ror(pw[idx], hi)
        idx -= 1
        arr[idx] = _xor_ror(pw[idx], lo)
    idx = 15
    pad = 15 - len(pw)
    while pad > 0:
        arr[idx] = _xor_ror(_XOR_PAD[pad], hi)
        idx -= 1
        pad -= 1
        arr[idx] = _xor_ror(_XOR_PAD[pad], lo)
        idx -= 1
        pad -= 1
    return bytes(arr)


def _xor_rotl(v: int, n: int) -> int:
    return ((v << n) | (v >> (8 - n))) & 0xFF


def _xor_apply(stream: bytes, arr: bytes, *, decrypt: bool) -> bytes:
    """De/obfuscate record bodies (§2.3.7.4 / MS-XLS 2.2.10): per byte,
    the array index is ``(bodyStart + bodyLength + i) mod 16`` (the
    index runs ahead of the data by one record length — MS-XLS's
    documented quirk); encrypt = xor-then-rol3-inverse, decrypt =
    rol3-then-xor.  Headers, the RC4 exempt-record set, and
    BoundSheet8's ``lbPlyPos`` stay plaintext, same as ``_rc4_apply``."""
    out = bytearray(stream)
    pos = 0
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack("<HH", stream[pos:pos + 4])
        body_at = pos + 4
        if opcode not in _PLAINTEXT_RECORDS and length:
            skip = 4 if opcode == 0x0085 else 0
            base = body_at + length
            for i in range(skip, length):
                j = body_at + i
                if decrypt:
                    out[j] = _xor_rotl(out[j], 3) ^ arr[(base + i) & 0x0F]
                else:
                    out[j] = _xor_rotl(out[j] ^ arr[(base + i) & 0x0F], 5)
        pos = body_at + length
    return bytes(out)


def _decrypt_workbook(wb: bytes, filepass_body: bytes, password: str | None) -> bytes:
    """Dispatch on the FILEPASS shape and return the decrypted stream."""
    passwords_xor = [password] if password else [DEFAULT_XLS_PASSWORD]
    if len(filepass_body) == 4 or struct.unpack("<H", filepass_body[:2])[0] == 0:
        # XOR obfuscation: BIFF8 body = wEncryptionType(0) key verifier;
        # the BIFF5 body drops the leading type field
        at = 0 if len(filepass_body) == 4 else 2
        key, vhash = struct.unpack("<HH", filepass_body[at:at + 4])
        for pw in passwords_xor:
            pwb = pw.encode("cp1252", errors="replace")[:15]
            if pwb and xor_password_verifier(pwb) == vhash and _xor_create_key(pwb) == key:
                return _xor_apply(wb, _xor_create_array(pwb), decrypt=True)
        raise ValueError(
            "XOR-obfuscated .xls: password verification failed "
            "(tried the default 'VelvetSweatshop'; pass password=...)"
        )
    vmajor, vminor = struct.unpack("<HH", filepass_body[2:6])
    passwords = [password] if password else [DEFAULT_XLS_PASSWORD]
    if (vmajor, vminor) == (1, 1):  # binary RC4 (MD5 lineage)
        for pw in passwords:
            base = _rc4_verify(pw, filepass_body)
            if base is not None:
                return _rc4_apply(wb, base)
    elif vmajor in (2, 3, 4) and vminor == 2:  # RC4 CryptoAPI (SHA-1)
        try:
            (header_size,) = struct.unpack("<I", filepass_body[10:14])
            header = filepass_body[14 : 14 + header_size]
            alg_id, _alg_hash, key_size = struct.unpack("<III", header[8:20])
        except struct.error as e:
            raise ValueError("malformed CryptoAPI FILEPASS record") from e
        if alg_id != 0x6801:  # RC4; CryptoAPI AES workbooks are exotic
            raise NotImplementedError(
                f"CryptoAPI .xls with AlgID 0x{alg_id:X} (not RC4) needs "
                "msoffcrypto-tool; re-save as .xlsx"
            )
        key_bytes = (key_size or 40) // 8  # KeySize 0 means the 40-bit export grade
        ver = filepass_body[14 + header_size :]
        (salt_size,) = struct.unpack("<I", ver[:4])
        salt = ver[4 : 4 + salt_size]
        enc_verifier = ver[4 + salt_size : 20 + salt_size]
        enc_hash = ver[24 + salt_size : 44 + salt_size]
        for pw in passwords:
            h0 = _capi_verify(pw, salt, enc_verifier, enc_hash, key_bytes)
            if h0 is not None:
                ks = _capi_stream_keystream(h0, key_bytes, len(wb))
                return _rc4_apply(wb, b"", ks)
    else:
        raise NotImplementedError(
            f".xls FILEPASS EncryptionVersionInfo {vmajor}.{vminor} "
            "needs xlrd/msoffcrypto; re-save as .xlsx"
        )
    raise ValueError(
        "encrypted .xls: password verification failed "
        "(tried the default 'VelvetSweatshop'; pass password=...)"
    )


# ---------------------------------------------------------------------------
# BIFF records
# ---------------------------------------------------------------------------


_CODEPAGE_MAP = {
    0x016F: "ascii",
    0x01B5: "cp437",
    0x02D0: "cp720",
    0x0352: "cp850",
    0x2710: "mac_roman",
    0x8000: "mac_roman",
    0x8001: "cp1252",
}


def _codepage_codec(cp: int) -> str:
    if cp in _CODEPAGE_MAP:
        return _CODEPAGE_MAP[cp]
    try:
        "".encode(f"cp{cp}")
    except LookupError:
        return "latin-1"
    return f"cp{cp}"


def _records(stream: bytes, pos: int = 0):
    while pos + 4 <= len(stream):
        opcode, length = struct.unpack("<HH", stream[pos:pos + 4])
        yield opcode, stream[pos + 4:pos + 4 + length], pos
        pos += 4 + length


class _SstCursor:
    """Byte cursor over SST + CONTINUE record bodies: plain reads span
    record boundaries transparently; character reads re-read the
    per-continuation option byte at each boundary (MS-XLS 2.5.293)."""

    def __init__(self, bodies: list[bytes]):
        self.bodies = bodies
        self.ri = 0
        self.off = 0

    def _advance(self) -> None:
        while self.ri < len(self.bodies) and self.off >= len(self.bodies[self.ri]):
            self.ri += 1
            self.off = 0

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n:
            self._advance()
            if self.ri >= len(self.bodies):
                raise ValueError("SST ended mid-field")
            chunk = self.bodies[self.ri][self.off:self.off + n]
            out += chunk
            self.off += len(chunk)
            n -= len(chunk)
        return bytes(out)

    def u8(self) -> int:
        return self.read(1)[0]

    def u16(self) -> int:
        return struct.unpack("<H", self.read(2))[0]

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def chars(self, cch: int, compressed: bool) -> str:
        parts = []
        while cch:
            self._advance()
            if self.ri >= len(self.bodies):
                raise ValueError("SST ended mid-string")
            avail = len(self.bodies[self.ri]) - self.off
            if avail == 0:
                continue
            if parts and self.off == 0:
                # a string continuing into a CONTINUE record starts with
                # a fresh compression flag byte
                compressed = not (self.u8() & 1)
                avail -= 1
            per = 1 if compressed else 2
            take = min(cch, avail // per)
            if take == 0:
                raise NotImplementedError(
                    "SST splits a character across CONTINUE records; use xlrd"
                )
            raw = self.read(take * per)
            parts.append(raw.decode("latin-1" if compressed else "utf-16-le"))
            cch -= take
        return "".join(parts)


def _read_sst(bodies: list[bytes]) -> list[str]:
    cur = _SstCursor(bodies)
    cur.u32()  # total refs
    unique = cur.u32()
    out = []
    for _ in range(unique):
        cch = cur.u16()
        grbit = cur.u8()
        rich = cur.u16() if grbit & 0x08 else 0
        ext = cur.u32() if grbit & 0x04 else 0
        out.append(cur.chars(cch, not (grbit & 0x01)))
        cur.read(rich * 4 + ext)  # formatting runs / phonetic data
    return out


def _short_unicode(body: bytes, off: int) -> tuple[str, int]:
    """BIFF8 ShortXLUnicodeString (8-bit length) — sheet names."""
    cch, grbit = body[off], body[off + 1]
    off += 2
    if grbit & 0x01:
        return body[off:off + 2 * cch].decode("utf-16-le"), off + 2 * cch
    return body[off:off + cch].decode("latin-1"), off + cch


def _long_unicode(body: bytes, off: int) -> tuple[str, int]:
    """BIFF8 XLUnicodeString (16-bit length) — inline LABEL cells."""
    (cch,) = struct.unpack("<H", body[off:off + 2])
    grbit = body[off + 2]
    off += 3
    rich = 0
    ext = 0
    if grbit & 0x08:
        (rich,) = struct.unpack("<H", body[off:off + 2])
        off += 2
    if grbit & 0x04:
        (ext,) = struct.unpack("<I", body[off:off + 4])
        off += 4
    if grbit & 0x01:
        s = body[off:off + 2 * cch].decode("utf-16-le")
        off += 2 * cch
    else:
        s = body[off:off + cch].decode("latin-1")
        off += cch
    return s, off + rich * 4 + ext


def _rk_value(rk: int) -> float:
    v = rk >> 2
    if rk & 0x02:  # 30-bit signed integer
        if v & 0x20000000:
            v -= 0x40000000
        num = float(v)
    else:  # high 30 bits of an IEEE double
        (num,) = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))
    return num / 100.0 if rk & 0x01 else num


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else repr(float(v))


_BIFF234_BOF = (b"\x09\x00", b"\x09\x02", b"\x09\x04")


def _shape_rows(cells: dict[int, dict[int, str]]) -> list[dict[str, str]]:
    """(row → col → value) → the `_read_xlsx_stdlib` row-dict shape
    (first row = header)."""
    ordered = [cells[r] for r in sorted(cells)]
    if not ordered:
        return []
    header = ordered[0]
    return [
        {header[i]: v for i, v in r.items() if i in header}
        for r in ordered[1:]
    ]


def _read_xls_biff234(stream: bytes) -> dict[str, list[dict[str, str]]]:
    """Pre-BIFF5 worksheet stream (Excel 2.x/3.0/4.0 — a RAW record
    stream, no OLE2 container, single sheet, no SST; MS-XLS's legacy
    cell records): BIFF2 cells carry 3-byte cell attributes and a
    1-byte LABEL length (``0x0002`` INTEGER / ``0x0003`` NUMBER /
    ``0x0004`` LABEL / ``0x0005`` BOOLERR); BIFF3/4 use the 2-byte-ixfe
    layouts BIFF5 kept (``0x0203``/``0x0204``/``0x0205``/``0x027E``
    RK).  Strings decode through the ``CODEPAGE`` record when present,
    latin-1 otherwise.  The stream has no sheet name — ``Sheet1``, like
    the tools that convert these."""
    codec = "latin-1"
    cells: dict[int, dict[int, str]] = {}
    pending_str: tuple[int, int] | None = None

    def put(row: int, col: int, val: str) -> None:
        cells.setdefault(row, {})[col] = val

    def put_cached(row: int, col: int, val: bytes) -> None:
        nonlocal pending_str
        got = _formula_cached(val)
        if got is None:
            pass  # error result: skipped like BOOLERR errors
        elif got[0] == "s":
            pending_str = (row, col)
        elif got[0] == "n":
            put(row, col, _fmt_num(got[1]))
        elif got[0] == "b":
            put(row, col, str(got[1]))
        else:
            put(row, col, "")

    for opcode, body, _pos in _records(stream):
        if opcode == 0x000A:  # EOF
            break
        if opcode == 0x0042 and len(body) >= 2:  # CODEPAGE
            codec = _codepage_codec(struct.unpack("<H", body[:2])[0])
        elif opcode == 0x002F:
            raise NotImplementedError(
                "encrypted pre-BIFF5 .xls needs xlrd; re-save as .xlsx"
            )
        # ---- BIFF2 layouts: rw(2) col(2) cell-attrs(3) payload ----
        elif opcode == 0x0002 and len(body) >= 9:  # INTEGER
            row, col = struct.unpack("<HH", body[:4])
            (w,) = struct.unpack("<H", body[7:9])
            put(row, col, str(w))
        elif opcode == 0x0003 and len(body) >= 15:  # NUMBER (BIFF2)
            row, col = struct.unpack("<HH", body[:4])
            (num,) = struct.unpack("<d", body[7:15])
            put(row, col, _fmt_num(num))
        elif opcode == 0x0004 and len(body) >= 8:  # LABEL (BIFF2)
            row, col = struct.unpack("<HH", body[:4])
            cch = body[7]
            put(row, col, body[8:8 + cch].decode(codec, errors="replace"))
        elif opcode == 0x0005 and len(body) >= 9:  # BOOLERR (BIFF2)
            row, col = struct.unpack("<HH", body[:4])
            if body[8] == 0:
                put(row, col, str(body[7] == 1))
        # ---- BIFF3/4 layouts: rw(2) col(2) ixfe(2) payload ----
        elif opcode == 0x0203 and len(body) >= 14:  # NUMBER
            row, col = struct.unpack("<HH", body[:4])
            (num,) = struct.unpack("<d", body[6:14])
            put(row, col, _fmt_num(num))
        elif opcode == 0x0204 and len(body) >= 8:  # LABEL (byte string)
            row, col = struct.unpack("<HH", body[:4])
            (cch,) = struct.unpack("<H", body[6:8])
            put(row, col, body[8:8 + cch].decode(codec, errors="replace"))
        elif opcode == 0x027E and len(body) >= 10:  # RK
            row, col, _ixfe, rk = struct.unpack("<HHHI", body[:10])
            put(row, col, _fmt_num(_rk_value(rk)))
        elif opcode == 0x0205 and len(body) >= 8:  # BOOLERR
            row, col = struct.unpack("<HH", body[:4])
            if body[7] == 0:
                put(row, col, str(body[6] == 1))
        # ---- FORMULA cached results (BIFF2 0x0006 / BIFF3-4 0x0206;
        # the FormulaValue convention is the same, the header differs) ----
        elif opcode == 0x0006 and len(body) >= 15:
            row, col = struct.unpack("<HH", body[:4])
            put_cached(row, col, body[7:15])
        elif opcode == 0x0206 and len(body) >= 14:
            row, col = struct.unpack("<HH", body[:4])
            put_cached(row, col, body[6:14])
        elif opcode == 0x0007 and pending_str is not None:  # STRING (BIFF2)
            row, col = pending_str
            pending_str = None
            put(row, col, body[1:1 + body[0]].decode(codec, errors="replace"))
        elif opcode == 0x0207 and pending_str is not None:  # STRING (BIFF3/4)
            row, col = pending_str
            pending_str = None
            (cch,) = struct.unpack("<H", body[:2])
            put(row, col, body[2:2 + cch].decode(codec, errors="replace"))

    return {"Sheet1": _shape_rows(cells)}


def _read_xls_stdlib(
    path: str, password: str | None = None
) -> dict[str, list[dict[str, str]]]:
    """Read a BIFF2-8 ``.xls`` into ``{sheet: [row dicts]}`` (first row
    = header, values as strings) — the `_read_xlsx_stdlib` output
    shape.  BIFF5/8 live in an OLE2 container (RC4-encrypted workbooks
    decrypt with ``password``, default Excel's well-known
    ``VelvetSweatshop``); BIFF2-4 files ARE the record stream and route
    through :func:`_read_xls_biff234`."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:8] != _MAGIC and data[:2] in _BIFF234_BOF:
        return _read_xls_biff234(data)
    wb = _cfb_stream(data, ("workbook", "book"))
    if wb[:2] in _BIFF234_BOF:  # BIFF4W saved inside a container
        return _read_xls_biff234(wb)

    # one decryption restart at most: FILEPASS sits near the stream head
    for opcode, body, _pos in _records(wb):
        if opcode == 0x002F:  # FILEPASS
            wb = _decrypt_workbook(wb, body, password)
            break
        if opcode == 0x000A:
            break

    # globals substream: version gate, codepage, sheet index, strings
    sheets: list[tuple[str, int]] = []
    sst: list[str] = []
    sst_bodies: list[bytes] | None = None
    biff5 = False
    codec = "latin-1"
    for opcode, body, _pos in _records(wb):
        if opcode == 0x0809 and len(body) >= 4:
            ver, dt = struct.unpack("<HH", body[:4])
            if dt == 0x0005 and ver not in (0x0600, 0x0500):
                raise NotImplementedError(
                    f"BIFF version 0x{ver:04x} (pre-BIFF5) needs xlrd; use .xlsx"
                )
            biff5 = dt == 0x0005 and ver == 0x0500
        elif opcode == 0x0042:  # CODEPAGE
            codec = _codepage_codec(struct.unpack("<H", body[:2])[0])
        elif opcode == 0x0085:  # BOUNDSHEET
            (offset,) = struct.unpack("<I", body[:4])
            if biff5:
                cch = body[6]
                name = body[7:7 + cch].decode(codec, errors="replace")
            else:
                name, _ = _short_unicode(body, 6)
            sheets.append((name, offset))
        elif opcode == 0x00FC:  # SST (+ following CONTINUEs)
            sst_bodies = [body]
        elif opcode == 0x003C and sst_bodies is not None:
            sst_bodies.append(body)
        elif sst_bodies is not None and opcode not in (0x00FC, 0x003C):
            sst = _read_sst(sst_bodies)
            sst_bodies = None
        if opcode == 0x000A:  # EOF of the globals substream
            break
    if sst_bodies is not None:
        sst = _read_sst(sst_bodies)

    out: dict[str, list[dict[str, str]]] = {}
    for name, offset in sheets:
        cells: dict[int, dict[int, str]] = {}
        pending_str: tuple[int, int] | None = None

        def put(row: int, col: int, val: str) -> None:
            cells.setdefault(row, {})[col] = val

        for opcode, body, _pos in _records(wb, offset):
            if opcode == 0x000A:  # sheet EOF
                break
            if opcode == 0x00FD:  # LABELSST
                row, col, _ixfe, isst = struct.unpack("<HHHI", body[:10])
                put(row, col, sst[isst])
            elif opcode == 0x0006 and len(body) >= 14:  # FORMULA
                row, col, _ixfe = struct.unpack("<HHH", body[:6])
                got = _formula_cached(body[6:14])
                if got is None:
                    pass  # error result: skipped like BOOLERR errors
                elif got[0] == "s":  # text arrives in the next STRING
                    pending_str = (row, col)
                elif got[0] == "n":
                    put(row, col, _fmt_num(got[1]))
                elif got[0] == "b":
                    put(row, col, str(got[1]))
                else:
                    put(row, col, "")
            elif opcode == 0x0207 and pending_str is not None:  # STRING
                row, col = pending_str
                pending_str = None
                if biff5:
                    (cch,) = struct.unpack("<H", body[:2])
                    put(row, col, body[2:2 + cch].decode(codec, errors="replace"))
                else:
                    s, _ = _long_unicode(body, 0)
                    put(row, col, s)
            elif opcode == 0x0203:  # NUMBER
                row, col, _ixfe = struct.unpack("<HHH", body[:6])
                (num,) = struct.unpack("<d", body[6:14])
                put(row, col, _fmt_num(num))
            elif opcode == 0x027E:  # RK
                row, col, _ixfe, rk = struct.unpack("<HHHI", body[:10])
                put(row, col, _fmt_num(_rk_value(rk)))
            elif opcode == 0x00BD:  # MULRK
                row, col0 = struct.unpack("<HH", body[:4])
                n = (len(body) - 6) // 6
                for i in range(n):
                    (rk,) = struct.unpack("<I", body[6 + 6 * i:10 + 6 * i])
                    put(row, col0 + i, _fmt_num(_rk_value(rk)))
            elif opcode == 0x0204:  # LABEL (inline string)
                row, col, _ixfe = struct.unpack("<HHH", body[:6])
                if biff5:  # byte string in the workbook codepage
                    (cch,) = struct.unpack("<H", body[6:8])
                    put(row, col, body[8:8 + cch].decode(codec, errors="replace"))
                else:
                    s, _ = _long_unicode(body, 6)
                    put(row, col, s)
            elif opcode == 0x0205:  # BOOLERR
                row, col, _ixfe = struct.unpack("<HHH", body[:6])
                if body[7] == 0:  # boolean (1 would be an error code)
                    put(row, col, str(body[6] == 1))

        out[name] = _shape_rows(cells)
    return out


# ---------------------------------------------------------------------------
# fixture writer (real OLE2 + BIFF8 bytes; round-trip twin for tests)
# ---------------------------------------------------------------------------


class XlsFormula:
    """Fixture marker: this cell travels as a FORMULA record whose
    CACHED result carries the value (plus a following STRING record for
    text results) — the read path real workbooks exercise on every
    computed cell."""

    def __init__(self, value):
        self.value = value


def _formula_cached(val: bytes):
    """Decode an 8-byte FormulaValue (MS-XLS 2.5.133; the same
    0xFFFF-tail convention back to BIFF2): ``("n", float)`` /
    ``("b", bool)`` / ``("z", "")`` blank / ``("s", None)`` with the
    text in the NEXT STRING record / ``None`` for an error result
    (skipped, like BOOLERR errors)."""
    if val[6:8] != b"\xff\xff":
        return ("n", struct.unpack("<d", val)[0])
    t = val[0]
    if t == 0:
        return ("s", None)
    if t == 1:
        return ("b", val[2] == 1)
    if t == 3:
        return ("z", "")
    return None


def _biff_string_cells(rows: list[list]) -> tuple[list[str], list[tuple[int, int, object]]]:
    strings: list[str] = []
    seen: dict[str, int] = {}
    cells: list[tuple[int, int, object]] = []

    def intern(s: str) -> int:
        if s not in seen:
            seen[s] = len(strings)
            strings.append(s)
        return seen[s]

    for r, row in enumerate(rows):
        for c, v in enumerate(row):
            if v is None:
                continue
            if isinstance(v, XlsFormula):
                u = v.value
                if isinstance(u, str):
                    cells.append((r, c, ("fs", intern(u))))
                elif isinstance(u, bool):
                    cells.append((r, c, ("fb", u)))
                else:
                    cells.append((r, c, ("fn", float(u))))
            elif isinstance(v, str):
                cells.append((r, c, ("s", intern(v))))
            elif isinstance(v, bool):
                cells.append((r, c, ("b", v)))
            else:
                cells.append((r, c, ("n", float(v))))
    return strings, cells


def make_xls_bytes(
    sheets: dict[str, list[list]],
    *,
    mini: bool = False,
    sst_continue_at: int | None = None,
    biff: int = 8,
    password: str | None = None,
    crypto_api: bool = False,
    xor_obfuscation: bool = False,
) -> bytes:
    """Serialize ``{sheet: [[cell, ...], ...]}`` into a real BIFF8 ``.xls``
    (OLE2 container + Workbook stream).  ``mini=True`` stores the
    workbook in the mini stream (the <4096-byte layout), exercising the
    reader's mini-FAT path; ``sst_continue_at`` splits the SST into a
    CONTINUE record after that many strings (the spanning layout big
    shared-string tables use).

    ``biff=5`` writes the pre-unicode BIFF5 shape: cp1252 ``CODEPAGE``,
    byte-string sheet names, inline ``LABEL`` byte-string cells, no
    SST.  ``biff=2|3|4`` writes the pre-OLE2 shape real Excel 2.x-4.0
    files have — a RAW single-worksheet record stream (BIFF2: 3-byte
    cell attributes, 1-byte LABEL lengths; BIFF3/4: the 2-byte-ixfe
    layouts BIFF5 kept), no container, no password support.
    ``password`` RC4-encrypts the workbook stream per MS-OFFCRYPTO
    §2.3.6 (FILEPASS record + block-rekeyed body encryption) — the
    reader twin for the encrypted path; ``xor_obfuscation=True``
    switches to the §2.3.7 XOR method-0 shape instead."""
    import io

    if biff not in (2, 3, 4, 5, 8):
        raise ValueError("biff must be one of 2, 3, 4, 5, 8")
    if biff in (2, 3, 4):
        if password is not None:
            raise ValueError("pre-BIFF5 fixtures do not support passwords")
        if len(sheets) != 1:
            raise ValueError("pre-BIFF5 files hold exactly one worksheet")

        def rec234(op: int, body: bytes) -> bytes:
            return struct.pack("<HH", op, len(body)) + body

        rows = next(iter(sheets.values()))
        b = io.BytesIO()
        bof_op = {2: 0x0009, 3: 0x0209, 4: 0x0409}[biff]
        b.write(rec234(bof_op, struct.pack("<HH", 0x0100 * biff, 0x0010)))
        if biff > 2:
            b.write(rec234(0x0042, struct.pack("<H", 0x04E4)))  # cp1252
        codec = "cp1252" if biff > 2 else "latin-1"
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if v is None:
                    continue
                if isinstance(v, XlsFormula):
                    u = v.value
                    if isinstance(u, str):
                        val = b"\x00\x00\x00\x00\x00\x00\xff\xff"
                    elif isinstance(u, bool):
                        val = bytes([1, 0, 1 if u else 0, 0, 0, 0, 0xFF, 0xFF])
                    else:
                        val = struct.pack("<d", float(u))
                    if biff == 2:  # attrs(3) + value + grbit(1) len(1)
                        b.write(rec234(
                            0x0006,
                            struct.pack("<HH3s", r, c, b"\0\0\0") + val + b"\x00\x00",
                        ))
                    else:  # ixfe(2) + value + grbit(2) cce(2)
                        b.write(rec234(
                            0x0206,
                            struct.pack("<HHH", r, c, 0) + val + b"\x00" * 4,
                        ))
                    if isinstance(u, str):
                        raw = u.encode(codec, errors="replace")
                        if biff == 2:
                            b.write(rec234(0x0007, bytes([len(raw)]) + raw))
                        else:
                            b.write(rec234(
                                0x0207, struct.pack("<H", len(raw)) + raw
                            ))
                    continue
                if isinstance(v, str):
                    raw = v.encode(codec, errors="replace")
                    if biff == 2:
                        if len(raw) > 255:
                            raise ValueError("BIFF2 LABEL is capped at 255 bytes")
                        b.write(rec234(
                            0x0004,
                            struct.pack("<HH3sB", r, c, b"\0\0\0", len(raw)) + raw,
                        ))
                    else:
                        b.write(rec234(
                            0x0204,
                            struct.pack("<HHHH", r, c, 0, len(raw)) + raw,
                        ))
                elif isinstance(v, bool):
                    if biff == 2:
                        b.write(rec234(
                            0x0005,
                            struct.pack("<HH3sBB", r, c, b"\0\0\0", 1 if v else 0, 0),
                        ))
                    else:
                        b.write(rec234(
                            0x0205, struct.pack("<HHHBB", r, c, 0, 1 if v else 0, 0)
                        ))
                elif biff == 2 and isinstance(v, int) and 0 <= v <= 0xFFFF:
                    b.write(rec234(
                        0x0002, struct.pack("<HH3sH", r, c, b"\0\0\0", v)
                    ))
                else:
                    if biff == 2:
                        b.write(rec234(
                            0x0003, struct.pack("<HH3sd", r, c, b"\0\0\0", float(v))
                        ))
                    else:
                        b.write(rec234(
                            0x0203, struct.pack("<HHHd", r, c, 0, float(v))
                        ))
        b.write(rec234(0x000A, b""))
        return b.getvalue()
    ver = 0x0600 if biff == 8 else 0x0500

    all_strings: list[str] = []
    soffsets: dict[str, int] = {}
    per_sheet: list[tuple[str, list[tuple[int, int, object]]]] = []
    for name, rows in sheets.items():
        strings, cells = _biff_string_cells(rows)
        remap = {}
        for s in strings:
            if s not in soffsets:
                soffsets[s] = len(all_strings)
                all_strings.append(s)
        remap = soffsets
        cells = [
            (r, c, (kind, remap[strings[i]]) if kind in ("s", "fs") else (kind, i))
            for r, c, (kind, i) in cells
        ]
        per_sheet.append((name, cells))

    def rec(op: int, body: bytes) -> bytes:
        return struct.pack("<HH", op, len(body)) + body

    def ustr(s: str, short: bool) -> bytes:
        enc = s.encode("latin-1", errors="strict") if all(ord(ch) < 256 for ch in s) else None
        if enc is not None:
            head = struct.pack("<B", len(s)) if short else struct.pack("<H", len(s))
            return head + b"\x00" + enc
        head = struct.pack("<B", len(s)) if short else struct.pack("<H", len(s))
        return head + b"\x01" + s.encode("utf-16-le")

    # FILEPASS body is stream-independent: deterministic salt/verifier
    filepass = b""
    base_key = None
    capi_h0 = None
    xor_arr = None
    if xor_obfuscation and crypto_api:
        raise ValueError("pick one of xor_obfuscation / crypto_api")
    if password is not None and xor_obfuscation:
        # XOR method 0: 16-bit key + 16-bit verifier (BIFF5 has no
        # leading wEncryptionType field)
        pwb = password.encode("cp1252", errors="replace")[:15]
        xor_arr = _xor_create_array(pwb)
        body = struct.pack("<HH", _xor_create_key(pwb), xor_password_verifier(pwb))
        filepass = rec(0x002F, body if biff == 5 else struct.pack("<H", 0) + body)
    elif password is not None and crypto_api:
        # RC4 CryptoAPI shape (MS-OFFCRYPTO §2.3.5): SHA-1 lineage,
        # version 2.2, 128-bit key, explicit header + verifier
        salt = hashlib.md5(b"architxt-capi-salt:" + password.encode()).digest()
        verifier = hashlib.md5(b"architxt-capi-verifier:" + salt).digest()
        capi_h0 = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
        ks = _rc4_keystream(_capi_block_key(capi_h0, 0, 16), 36)
        enc_verifier = bytes(a ^ b for a, b in zip(verifier, ks[:16]))
        vhash = hashlib.sha1(verifier).digest()
        enc_hash = bytes(a ^ b for a, b in zip(vhash, ks[16:36]))
        header = (
            struct.pack("<IIIIIIII", 4, 0, 0x6801, 0x8004, 128, 1, 0, 0)
            + "Microsoft Base Cryptographic Provider v1.0\x00".encode("utf-16-le")
        )
        filepass = rec(
            0x002F,
            struct.pack("<HHHII", 1, 2, 2, 4, len(header))
            + header
            + struct.pack("<I", len(salt)) + salt
            + enc_verifier
            + struct.pack("<I", 20) + enc_hash,
        )
    elif password is not None:
        salt = hashlib.md5(b"architxt-salt:" + password.encode()).digest()
        verifier = hashlib.md5(b"architxt-verifier:" + salt).digest()
        base_key = _rc4_base_key(password, salt)
        ks = _rc4_keystream(_rc4_block_key(base_key, 0), 32)
        enc_verifier = bytes(a ^ b for a, b in zip(verifier, ks[:16]))
        vhash = hashlib.md5(verifier).digest()
        enc_hash = bytes(a ^ b for a, b in zip(vhash, ks[16:]))
        filepass = rec(
            0x002F,
            struct.pack("<HHH", 1, 1, 1) + salt + enc_verifier + enc_hash,
        )

    # sheet substreams
    sheet_blobs: list[bytes] = []
    for name, cells in per_sheet:
        b = io.BytesIO()
        b.write(rec(0x0809, struct.pack("<HHHHII", ver, 0x0010, 0, 0, 0, 0)))
        for r, c, (kind, v) in cells:
            if kind == "s" and biff == 5:  # inline cp1252 byte string
                raw = all_strings[v].encode("cp1252", errors="replace")
                b.write(
                    rec(0x0204, struct.pack("<HHHH", r, c, 0, len(raw)) + raw)
                )
            elif kind == "s":
                b.write(rec(0x00FD, struct.pack("<HHHI", r, c, 0, v)))
            elif kind == "b":
                b.write(rec(0x0205, struct.pack("<HHHBB", r, c, 0, 1 if v else 0, 0)))
            elif kind == "fn":  # FORMULA, cached number result
                b.write(rec(
                    0x0006,
                    struct.pack("<HHHd", r, c, 0, v)
                    + struct.pack("<HIH", 0, 0, 0),
                ))
            elif kind == "fb":  # FORMULA, cached boolean
                b.write(rec(
                    0x0006,
                    struct.pack("<HHH", r, c, 0)
                    + bytes([1, 0, 1 if v else 0, 0, 0, 0, 0xFF, 0xFF])
                    + struct.pack("<HIH", 0, 0, 0),
                ))
            elif kind == "fs":  # FORMULA + STRING cached text
                b.write(rec(
                    0x0006,
                    struct.pack("<HHH", r, c, 0)
                    + b"\x00\x00\x00\x00\x00\x00\xff\xff"
                    + struct.pack("<HIH", 0, 0, 0),
                ))
                s = all_strings[v]
                if biff == 5:
                    raw = s.encode("cp1252", errors="replace")
                    b.write(rec(0x0207, struct.pack("<H", len(raw)) + raw))
                else:
                    b.write(rec(0x0207, ustr(s, short=False)))
            else:
                b.write(rec(0x0203, struct.pack("<HHHd", r, c, 0, v)))
        b.write(rec(0x000A, b""))
        sheet_blobs.append(b.getvalue())

    # globals substream (two-pass for BOUNDSHEET offsets)
    def globals_blob(offsets: list[int]) -> bytes:
        g = io.BytesIO()
        g.write(rec(0x0809, struct.pack("<HHHHII", ver, 0x0005, 0, 0, 0, 0)))
        g.write(filepass)
        if biff == 5:
            g.write(rec(0x0042, struct.pack("<H", 0x04E4)))  # cp1252
        else:
            total_refs = sum(
                1 for _, cells in per_sheet for _, _, (k, _v) in cells if k == "s"
            )
            head = struct.pack("<II", total_refs, len(all_strings))
            encoded = [ustr(s, short=False) for s in all_strings]
            if sst_continue_at is None or sst_continue_at >= len(encoded):
                g.write(rec(0x00FC, head + b"".join(encoded)))
            else:
                g.write(rec(0x00FC, head + b"".join(encoded[:sst_continue_at])))
                g.write(rec(0x003C, b"".join(encoded[sst_continue_at:])))
        for (name, _), off in zip(per_sheet, offsets):
            if biff == 5:
                raw = name.encode("cp1252", errors="replace")
                g.write(
                    rec(0x0085, struct.pack("<IBBB", off, 0, 0, len(raw)) + raw)
                )
            else:
                g.write(
                    rec(0x0085, struct.pack("<IBB", off, 0, 0) + ustr(name, short=True))
                )
        g.write(rec(0x000A, b""))
        return g.getvalue()

    glen = len(globals_blob([0] * len(per_sheet)))
    offsets = []
    pos = glen
    for blob in sheet_blobs:
        offsets.append(pos)
        pos += len(blob)
    workbook = globals_blob(offsets) + b"".join(sheet_blobs)
    assert len(globals_blob(offsets)) == glen  # offsets don't change lengths

    if xor_arr is not None:
        workbook = _xor_apply(workbook, xor_arr, decrypt=False)
    elif capi_h0 is not None:
        ks = _capi_stream_keystream(capi_h0, 16, len(workbook))
        workbook = _rc4_apply(workbook, b"", ks)  # symmetric: encrypts
    elif base_key is not None:
        workbook = _rc4_apply(workbook, base_key)  # symmetric: encrypts

    return _wrap_ole2(workbook, mini=mini)


def _wrap_ole2(stream: bytes, *, mini: bool) -> bytes:
    """Minimal compliant OLE2 container holding one 'Workbook' stream —
    regular-FAT layout, or the mini-stream layout when ``mini`` (stream
    must then be <4096 bytes)."""
    if mini and len(stream) >= 4096:
        raise ValueError("mini layout requires a <4096-byte stream")
    if not mini and len(stream) < 4096:
        stream = stream + b"\x00" * (4096 - len(stream))  # past the cutoff;
        # readers stop at the substream EOF records, padding is inert

    def dir_entry(name: str, etype: int, start: int, size: int, child: int = 0xFFFFFFFF) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    sectors: list[bytes] = []

    def pad(b: bytes, size: int = 512) -> bytes:
        return b + b"\x00" * (-len(b) % size)

    if mini:
        n_mini = -(-len(stream) // 64)
        container = pad(stream, 64)
        n_cont = -(-len(container) // 512)
        # layout: 0=FAT, 1=dir, 2=miniFAT, 3..=container
        fat = [_FATSECT, _ENDOFCHAIN, _ENDOFCHAIN]
        for i in range(n_cont):
            fat.append(3 + i + 1 if i + 1 < n_cont else _ENDOFCHAIN)
        minifat = [i + 1 if i + 1 < n_mini else _ENDOFCHAIN for i in range(n_mini)]
        sectors.append(pad(struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * (512 - 4 * len(fat))))
        directory = (
            dir_entry("Root Entry", 5, 3, n_mini * 64, child=1)
            + dir_entry("Workbook", 2, 0, len(stream))
            + b"\x00" * 256
        )
        sectors.append(pad(directory))
        sectors.append(pad(struct.pack(f"<{len(minifat)}I", *minifat) + b"\xff" * (512 - 4 * len(minifat))))
        sectors.append(pad(container))
        first_minifat, n_minifat = 2, 1
    else:
        content = pad(stream)
        n_str = len(content) // 512
        # layout: 0=FAT, 1=dir, 2..=stream
        fat = [_FATSECT, _ENDOFCHAIN]
        for i in range(n_str):
            fat.append(2 + i + 1 if i + 1 < n_str else _ENDOFCHAIN)
        if len(fat) > 128:
            raise ValueError("fixture writer supports one FAT sector (~64 KB)")
        sectors.append(pad(struct.pack(f"<{len(fat)}I", *fat) + b"\xff" * (512 - 4 * len(fat))))
        directory = (
            dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
            + dir_entry("Workbook", 2, 2, len(stream))
            + b"\x00" * 256
        )
        sectors.append(pad(directory))
        sectors.append(content)
        first_minifat, n_minifat = _ENDOFCHAIN, 0

    header = bytearray(512)
    header[0:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", header, 30, 9)       # sector shift
    struct.pack_into("<H", header, 32, 6)       # mini sector shift
    struct.pack_into("<I", header, 44, 1)       # one FAT sector
    struct.pack_into("<I", header, 48, 1)       # first directory sector
    struct.pack_into("<I", header, 56, 4096)    # mini cutoff
    struct.pack_into("<I", header, 60, first_minifat)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    difat = [0] + [_FREESECT] * 108
    struct.pack_into("<109I", header, 76, *difat)
    return bytes(header) + b"".join(sectors)


_DIFSECT = 0xFFFFFFFC


def _wrap_ole2_difat(stream: bytes, *, pad_bytes: int = 7_400_000) -> bytes:
    """OLE2 container whose FAT spills past the header's 109 locations
    into a chained DIFAT sector (MS-CFB §2.5) — the >6.8 MB shape big
    real-world workbooks have.  ``stream`` becomes the Workbook;
    ``pad_bytes`` of an inert second stream force the size.  Fixture
    twin for the reader's DIFAT walk."""
    stream = stream + b"\x00" * max(0, 4096 - len(stream))

    def pad512(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 512)

    wb = pad512(stream)
    padding = b"\x00" * pad_bytes
    padding = pad512(padding)
    n_wb, n_pad = len(wb) // 512, len(padding) // 512

    # fixpoint: FAT must also map the FAT/DIFAT/dir sectors themselves
    n_fat = n_difat = 0
    for _ in range(8):
        total = n_fat + n_difat + 1 + n_wb + n_pad
        new_fat = -(-total // 128)
        new_difat = -(-max(0, new_fat - 109) // 127)
        if (new_fat, new_difat) == (n_fat, n_difat):
            break
        n_fat, n_difat = new_fat, new_difat

    dir_at = n_fat + n_difat
    wb_at = dir_at + 1
    pad_at = wb_at + n_wb
    total = pad_at + n_pad

    fat = []
    fat += [_FATSECT] * n_fat
    fat += [_DIFSECT] * n_difat
    fat.append(_ENDOFCHAIN)  # directory
    fat += [wb_at + i + 1 if i + 1 < n_wb else _ENDOFCHAIN for i in range(n_wb)]
    fat += [pad_at + i + 1 if i + 1 < n_pad else _ENDOFCHAIN for i in range(n_pad)]
    fat += [_FREESECT] * (n_fat * 128 - len(fat))
    fat_bytes = struct.pack(f"<{len(fat)}I", *fat)

    difat_all = list(range(n_fat))
    header_difat = difat_all[:109] + [_FREESECT] * max(0, 109 - n_fat)
    difat_sectors = []
    rest = difat_all[109:]
    for i in range(n_difat):
        chunk = rest[127 * i: 127 * (i + 1)]
        chunk += [_FREESECT] * (127 - len(chunk))
        nxt = n_fat + i + 1 if i + 1 < n_difat else _ENDOFCHAIN
        difat_sectors.append(struct.pack("<128I", *(chunk + [nxt])))

    def dir_entry(name: str, etype: int, start: int, size: int, child: int = 0xFFFFFFFF) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    directory = pad512(
        dir_entry("Root Entry", 5, _ENDOFCHAIN, 0, child=1)
        + dir_entry("Workbook", 2, wb_at, len(stream))
        + dir_entry("Padding", 2, pad_at, pad_bytes)
    )

    header = bytearray(512)
    header[0:8] = _MAGIC
    struct.pack_into("<H", header, 24, 0x003E)
    struct.pack_into("<H", header, 26, 0x0003)
    struct.pack_into("<H", header, 28, 0xFFFE)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_at)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, _ENDOFCHAIN)  # no mini FAT
    struct.pack_into("<I", header, 64, 0)
    struct.pack_into("<I", header, 68, n_fat if n_difat else _ENDOFCHAIN)
    struct.pack_into("<I", header, 72, n_difat)
    struct.pack_into("<109I", header, 76, *header_difat)
    body = fat_bytes + b"".join(difat_sectors) + directory + wb + padding
    assert len(body) == total * 512
    return bytes(header) + body
