"""Encrypted office documents (password-protected ``.xlsx``/``.docx``/
``.pptx``/``.odt``) — pure stdlib + the in-repo AES core.

A password-protected Office 2007+ document is not a zip: it is an OLE2
compound file holding ``EncryptionInfo`` (the key-derivation
parameters) and ``EncryptedPackage`` (the real zip, encrypted).  This
module implements the two published MS-OFFCRYPTO schemes:

- **Standard** (§2.3.4.5, EncryptionInfo version x.2): SHA-1 key
  derivation (50 000 iterations + the 0x36/0x5C pad split), AES-ECB
  package body — the Office 2007 default;
- **Agile** (§2.3.4.10, version 4.4): XML descriptor, per-purpose
  block keys over SHA-512 (spinCount iterations, typically 100 000),
  AES-CBC in 4096-byte segments with per-segment IVs — the Office
  2010+ default.

Like the BIFF RC4 reader (``sources/xls.py``), Excel's documented
default password ``VelvetSweatshop`` is tried automatically, so
"protected" workbooks that open transparently in Excel open
transparently here; anything else needs ``password=``.  The decrypted
payload is the ordinary zip the existing xlsx/docx/pptx readers
consume.  ``make_encrypted_ooxml`` is the fixture twin (both schemes,
exact verifier math) so round-trips are hash-gated without any real
Office install.

The ODF side (``odf_decrypt_entry``/``make_encrypted_odt``) covers
ODF 1.2 manifest encryption — PBKDF2 over a SHA-256 start key,
AES-256-CBC per zip member, raw-deflate payload — the LibreOffice
password-protection scheme for ``.odt``; legacy Blowfish entries
gate loudly.
"""

from __future__ import annotations

import hashlib
import struct

from architxt_spark.sources.xls import DEFAULT_XLS_PASSWORD, _cfb_stream

_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

#: the spin-count KDFs are deliberately slow (anti-brute-force);
#: memoize per (password, salt, ...) so retries / repeated opens of
#: the same document pay once
import functools

_kdf_cache = functools.lru_cache(maxsize=256)

#: Agile per-purpose block keys (MS-OFFCRYPTO §2.3.4.13) — published
#: constants appended to the password hash to derive each sub-key.
_BK_VERIFIER_INPUT = bytes.fromhex("fea7d2763b4b9e79")
_BK_VERIFIER_VALUE = bytes.fromhex("d7aa0f6d3061344e")
_BK_KEY_VALUE = bytes.fromhex("146e0be7abacd0d6")


def is_encrypted_ooxml(data: bytes) -> bool:
    """True when ``data`` is an OLE2 container with an EncryptedPackage
    stream (vs a plain-zip OOXML file)."""
    if not data.startswith(_OLE2_MAGIC):
        return False
    try:
        _cfb_stream(data, ("encryptioninfo",))
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# Standard encryption (Office 2007): SHA-1 derivation, AES-ECB package
# ---------------------------------------------------------------------------


@_kdf_cache
def _std_key(password: str, salt: bytes, key_bytes: int) -> bytes:
    """§2.3.4.7: 50 000 SHA-1 iterations, block-0 finalization, then the
    HMAC-style 0x36/0x5C pad split to stretch 20 SHA-1 bytes to the AES
    key length."""
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50_000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    x1 = hashlib.sha1(bytes(0x36 ^ b for b in h.ljust(64, b"\x00"))).digest()
    x2 = hashlib.sha1(bytes(0x5C ^ b for b in h.ljust(64, b"\x00"))).digest()
    return (x1 + x2)[:key_bytes]


def _ecb(key: bytes, data: bytes, *, encrypt: bool) -> bytes:
    from architxt_spark.functions.aes import decrypt_block, encrypt_block

    fn = encrypt_block if encrypt else decrypt_block
    return b"".join(fn(key, data[i : i + 16]) for i in range(0, len(data), 16))


def _std_decrypt(info: bytes, package: bytes, passwords: list[str]) -> bytes:
    (header_size,) = struct.unpack("<I", info[8:12])
    header = info[12 : 12 + header_size]
    alg_id, _alg_hash, key_size = struct.unpack("<III", header[8:20])
    if alg_id not in (0x660E, 0x660F, 0x6610):  # AES-128/192/256
        raise NotImplementedError(
            f"standard-encrypted OOXML with AlgID 0x{alg_id:X} (not AES) "
            "needs msoffcrypto-tool; decrypt before ingestion"
        )
    ver = info[12 + header_size :]
    (salt_size,) = struct.unpack("<I", ver[:4])
    salt = ver[4 : 4 + salt_size]
    enc_verifier = ver[4 + salt_size : 20 + salt_size]
    (vh_size,) = struct.unpack("<I", ver[20 + salt_size : 24 + salt_size])
    enc_vhash = ver[24 + salt_size : 24 + salt_size + 32]
    for pw in passwords:
        key = _std_key(pw, salt, key_size // 8)
        verifier = _ecb(key, enc_verifier, encrypt=False)
        vhash = _ecb(key, enc_vhash, encrypt=False)[:vh_size]
        if hashlib.sha1(verifier).digest() == vhash:
            (size,) = struct.unpack("<Q", package[:8])
            # container sector padding past the ciphertext is inert
            need = -(-size // 16) * 16
            return _ecb(key, package[8 : 8 + need], encrypt=False)[:size]
    raise NotImplementedError(
        "password-protected OOXML (standard encryption): none of the "
        "tried passwords (incl. Excel's default) opens it; pass "
        "password=… or decrypt with msoffcrypto-tool"
    )


# ---------------------------------------------------------------------------
# Agile encryption (Office 2010+): XML descriptor, SHA-512, CBC segments
# ---------------------------------------------------------------------------


def _agile_hash(name: str):
    try:
        return getattr(hashlib, name.replace("-", "").lower())
    except AttributeError as e:
        raise NotImplementedError(
            f"agile-encrypted OOXML with hash {name!r}; decrypt with "
            "msoffcrypto-tool"
        ) from e


@_kdf_cache
def _agile_pw_hash(password: str, salt: bytes, spin: int, hash_fn) -> bytes:
    h = hash_fn(salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hash_fn(struct.pack("<I", i) + h).digest()
    return h


def _agile_block_key(pw_hash: bytes, block: bytes, n: int, hash_fn) -> bytes:
    k = hash_fn(pw_hash + block).digest()
    return (k + b"\x36" * n)[:n]  # pad per §2.3.4.13 (rarely needed)


def _agile_decrypt(info: bytes, package: bytes, passwords: list[str]) -> bytes:
    import xml.etree.ElementTree as ET

    from architxt_spark.functions.aes import cbc_decrypt_raw

    # u16 major, u16 minor, u32 reserved, then XML (container padding
    # after the descriptor is inert — strip it before parsing)
    xml = info[8:].rstrip(b"\x00")
    root = ET.fromstring(xml.decode("utf-8", errors="replace"))
    ns = "{http://schemas.microsoft.com/office/2006/encryption}"
    pns = "{http://schemas.microsoft.com/office/2006/keyEncryptor/password}"
    kd = root.find(f"{ns}keyData")
    ek = root.find(f".//{pns}encryptedKey")
    if kd is None or ek is None:
        raise NotImplementedError(
            "agile-encrypted OOXML without a password keyEncryptor "
            "(certificate-protected?); decrypt with msoffcrypto-tool"
        )
    import base64

    kd_salt = base64.b64decode(kd.get("saltValue"))
    kd_bits = int(kd.get("keyBits"))
    kd_block = int(kd.get("blockSize", "16"))
    kd_hash = _agile_hash(kd.get("hashAlgorithm", "SHA512"))
    if kd.get("cipherAlgorithm", "AES") != "AES" or kd_block != 16:
        raise NotImplementedError(
            "agile-encrypted OOXML with a non-AES cipher; decrypt with "
            "msoffcrypto-tool"
        )
    ek_salt = base64.b64decode(ek.get("saltValue"))
    spin = int(ek.get("spinCount", "100000"))
    ek_bits = int(ek.get("keyBits"))
    ek_hash = _agile_hash(ek.get("hashAlgorithm", "SHA512"))
    enc_vin = base64.b64decode(ek.get("encryptedVerifierHashInput"))
    enc_vval = base64.b64decode(ek.get("encryptedVerifierHashValue"))
    enc_key = base64.b64decode(ek.get("encryptedKeyValue"))

    iv0 = (ek_salt + b"\x36" * 16)[:16]
    for pw in passwords:
        ph = _agile_pw_hash(pw, ek_salt, spin, ek_hash)
        k_in = _agile_block_key(ph, _BK_VERIFIER_INPUT, ek_bits // 8, ek_hash)
        k_val = _agile_block_key(ph, _BK_VERIFIER_VALUE, ek_bits // 8, ek_hash)
        vin = cbc_decrypt_raw(k_in, iv0, enc_vin)[:16]
        vval = cbc_decrypt_raw(k_val, iv0, enc_vval)
        digest = ek_hash(vin).digest()
        if vval[: len(digest)] != digest:
            continue
        k_key = _agile_block_key(ph, _BK_KEY_VALUE, ek_bits // 8, ek_hash)
        secret = cbc_decrypt_raw(k_key, iv0, enc_key)[: kd_bits // 8]
        (size,) = struct.unpack("<Q", package[:8])
        # ciphertext = full 4096-byte segments + a 16-padded tail;
        # container sector padding past that is inert
        segs = -(-size // 4096)
        tail = size - 4096 * (segs - 1)
        body = package[8 : 8 + 4096 * (segs - 1) + (-(-tail // 16) * 16)]
        out = bytearray()
        for seg in range((len(body) + 4095) // 4096):
            iv = kd_hash(kd_salt + struct.pack("<I", seg)).digest()[:16]
            out += cbc_decrypt_raw(
                secret, iv, body[4096 * seg : 4096 * (seg + 1)]
            )
        return bytes(out[:size])
    raise NotImplementedError(
        "password-protected OOXML (agile encryption): none of the tried "
        "passwords (incl. Excel's default) opens it; pass password=… or "
        "decrypt with msoffcrypto-tool"
    )


def decrypt_ooxml(data: bytes, password: str = "") -> bytes:
    """The plain OOXML zip from a password-protected container.  Tries
    ``password`` then Excel's documented default (``VelvetSweatshop``),
    so default-"protected" workbooks open transparently."""
    info = _cfb_stream(data, ("encryptioninfo",))
    package = _cfb_stream(data, ("encryptedpackage",))
    v_major, v_minor = struct.unpack("<HH", info[:4])
    passwords = list(dict.fromkeys([password, DEFAULT_XLS_PASSWORD]))
    if (v_major, v_minor) == (4, 4):
        return _agile_decrypt(info, package, passwords)
    if v_minor == 2 and v_major in (2, 3, 4):
        return _std_decrypt(info, package, passwords)
    raise NotImplementedError(
        f"OOXML EncryptionInfo version {v_major}.{v_minor} (extensible/"
        "unknown scheme) needs msoffcrypto-tool; decrypt before ingestion"
    )


# ---------------------------------------------------------------------------
# fixture twin
# ---------------------------------------------------------------------------


def _wrap_ole2_two(streams: dict[str, bytes]) -> bytes:
    """Minimal OLE2 container with the given named streams — regular-FAT
    layout only (streams padded past the 4096-byte mini cutoff)."""
    names = list(streams)
    bodies = []
    for n in names:
        b = streams[n]
        bodies.append(b + b"\x00" * (max(0, 4096 - len(b))))

    def pad512(b: bytes) -> bytes:
        return b + b"\x00" * (-len(b) % 512)

    sectors: list[bytes] = []
    starts, sizes = [], []
    for raw, orig in zip(bodies, (streams[n] for n in names)):
        starts.append(len(sectors))
        body = pad512(raw)
        sectors.extend(body[i : i + 512] for i in range(0, len(body), 512))
        sizes.append(max(len(orig), 4096))
    dir_start = len(sectors)

    def dir_entry(
        name: str, etype: int, start: int, size: int, child: int = 0xFFFFFFFF
    ) -> bytes:
        raw = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0 : len(raw)] = raw
        struct.pack_into("<H", e, 64, len(raw))
        e[66] = etype
        e[67] = 1
        struct.pack_into("<III", e, 68, 0xFFFFFFFF, 0xFFFFFFFF, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<I", e, 120, size)
        return bytes(e)

    directory = dir_entry("Root Entry", 5, 0xFFFFFFFE, 0, child=1)
    # simple left-spine red-black-ish tree: entry i's child links are
    # inert (readers walk the flat table); colors all black
    for i, n in enumerate(names):
        directory += dir_entry(n, 2, starts[i], sizes[i])
    directory = pad512(directory)
    sectors.extend(directory[i : i + 512] for i in range(0, len(directory), 512))

    n_data = len(sectors)
    fat_sectors = (n_data + 1 + 127) // 128
    fat = []
    for si in range(len(bodies)):
        lo = starts[si]
        hi = lo + (len(pad512(bodies[si])) // 512)
        fat.extend(list(range(lo + 1, hi)) + [0xFFFFFFFE])
    for d in range(dir_start + 1, n_data):
        fat.append(d)
    fat.append(0xFFFFFFFE)
    for _ in range(fat_sectors):
        fat.append(0xFFFFFFFD)  # FATSECT marker for the FAT's own sectors
    fat += [0xFFFFFFFF] * (fat_sectors * 128 - len(fat))
    fat_start = n_data
    fat_blob = struct.pack(f"<{len(fat)}I", *fat)
    sectors.extend(fat_blob[i : i + 512] for i in range(0, len(fat_blob), 512))

    header = bytearray(512)
    header[:8] = _OLE2_MAGIC
    struct.pack_into("<H", header, 24, 0x003E)  # minor version
    struct.pack_into("<H", header, 26, 0x0003)  # major (512-byte sectors)
    struct.pack_into("<H", header, 28, 0xFFFE)  # little-endian
    struct.pack_into("<HH", header, 30, 9, 6)  # sector/mini shifts
    struct.pack_into("<I", header, 44, fat_sectors)
    struct.pack_into("<I", header, 48, dir_start)
    struct.pack_into("<I", header, 56, 4096)  # mini cutoff
    struct.pack_into("<I", header, 60, 0xFFFFFFFE)  # no mini FAT
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    for i in range(109):
        struct.pack_into(
            "<I", header, 76 + 4 * i,
            fat_start + i if i < fat_sectors else 0xFFFFFFFF,
        )
    return bytes(header) + b"".join(sectors)


def make_encrypted_ooxml(
    package: bytes, password: str = DEFAULT_XLS_PASSWORD, *, scheme: str = "agile"
) -> bytes:
    """Encrypt an OOXML zip into the OLE2 container shape — the fixture
    twin of :func:`decrypt_ooxml` (both schemes, exact verifier math)."""
    from architxt_spark.functions.aes import cbc_encrypt_raw

    if scheme == "standard":
        salt = hashlib.md5(b"architxt-ooxml-salt:" + package[:64]).digest()
        key = _std_key(password, salt, 16)
        verifier = hashlib.md5(b"architxt-verifier:" + salt).digest()
        vhash = hashlib.sha1(verifier).digest()
        info = struct.pack("<HHI", 3, 2, 0x24)  # version 3.2, AES+CryptoAPI
        header = (
            struct.pack("<IIIIIIII", 0x24, 0, 0x660E, 0x8004, 128, 0x18, 0, 0)
            + "Microsoft Enhanced RSA and AES Cryptographic Provider\x00".encode(
                "utf-16-le"
            )
        )
        info += struct.pack("<I", len(header)) + header
        info += struct.pack("<I", len(salt)) + salt
        info += _ecb(key, verifier, encrypt=True)
        info += struct.pack("<I", 20)
        info += _ecb(key, vhash + b"\x00" * 12, encrypt=True)
        body = package + b"\x00" * (-len(package) % 16)
        pkg = struct.pack("<Q", len(package)) + _ecb(key, body, encrypt=True)
    elif scheme == "agile":
        import base64

        h = hashlib.sha512
        kd_salt = hashlib.md5(b"architxt-kd-salt:" + package[:64]).digest()
        ek_salt = hashlib.md5(b"architxt-ek-salt:" + package[:64]).digest()
        secret = hashlib.sha256(b"architxt-secret:" + package[:64]).digest()
        spin = 10_000  # fixture-speed spin; the reader honors whatever is declared
        ph = _agile_pw_hash(password, ek_salt, spin, h)
        iv0 = ek_salt[:16]
        vin = hashlib.md5(b"architxt-vin:" + ek_salt).digest()
        k_in = _agile_block_key(ph, _BK_VERIFIER_INPUT, 32, h)
        k_val = _agile_block_key(ph, _BK_VERIFIER_VALUE, 32, h)
        k_key = _agile_block_key(ph, _BK_KEY_VALUE, 32, h)
        enc_vin = cbc_encrypt_raw(k_in, iv0, vin)
        vval = h(vin).digest()
        enc_vval = cbc_encrypt_raw(k_val, iv0, vval)
        enc_key = cbc_encrypt_raw(k_key, iv0, secret)
        b64 = lambda b: base64.b64encode(b).decode()
        info = struct.pack("<HHI", 4, 4, 0x40) + (
            '<encryption xmlns="http://schemas.microsoft.com/office/2006/encryption"'
            ' xmlns:p="http://schemas.microsoft.com/office/2006/keyEncryptor/password">'
            f'<keyData saltSize="16" blockSize="16" keyBits="256" hashSize="64"'
            f' cipherAlgorithm="AES" cipherChaining="ChainingModeCBC"'
            f' hashAlgorithm="SHA512" saltValue="{b64(kd_salt)}"/>'
            "<keyEncryptors><keyEncryptor"
            ' uri="http://schemas.microsoft.com/office/2006/keyEncryptor/password">'
            f'<p:encryptedKey spinCount="{spin}" saltSize="16" blockSize="16"'
            f' keyBits="256" hashSize="64" cipherAlgorithm="AES"'
            f' cipherChaining="ChainingModeCBC" hashAlgorithm="SHA512"'
            f' saltValue="{b64(ek_salt)}"'
            f' encryptedVerifierHashInput="{b64(enc_vin)}"'
            f' encryptedVerifierHashValue="{b64(enc_vval)}"'
            f' encryptedKeyValue="{b64(enc_key)}"/>'
            "</keyEncryptor></keyEncryptors></encryption>"
        ).encode()
        out = bytearray(struct.pack("<Q", len(package)))
        for seg in range((len(package) + 4095) // 4096):
            chunk = package[4096 * seg : 4096 * (seg + 1)]
            chunk += b"\x00" * (-len(chunk) % 16)
            iv = h(kd_salt + struct.pack("<I", seg)).digest()[:16]
            out += cbc_encrypt_raw(secret, iv, chunk)
        pkg = bytes(out)
    else:
        raise ValueError(f"unknown scheme {scheme!r}")
    return _wrap_ole2_two({"EncryptionInfo": info, "EncryptedPackage": pkg})


# ---------------------------------------------------------------------------
# ODF 1.2 manifest encryption (.odt with password — the LibreOffice scheme)
# ---------------------------------------------------------------------------


def odf_decrypt_entry(ciphertext: bytes, params: dict, password: str) -> bytes:
    """One encrypted ODF zip member → its plaintext XML.

    ODF 1.2 §19 (the LibreOffice default): start key = SHA-256 of the
    UTF-8 password, PBKDF2-HMAC-SHA1 over the manifest
    salt/iteration-count, AES-256-CBC with the manifest IV, W3C padding
    (last byte = pad length).  The LEGACY shape (OpenOffice ≤3.x, ODF
    1.0/1.1 — what a 2000s document dump hits at volume): start key =
    SHA-1, PBKDF2 to a 16-byte key (the spec default when
    ``manifest:key-size`` is absent), Blowfish in 64-bit-feedback CFB
    (stream mode, no padding), checksum-type ``SHA1/1K``.  Both then
    raw-deflate inflate; the manifest checksum over the first 1024
    compressed bytes is the wrong-password signal."""
    import base64
    import zlib

    alg = params.get("algorithm", "").lower()
    blowfish = "blowfish" in alg
    if "aes" not in alg and not blowfish:
        raise NotImplementedError(
            f"ODF encryption algorithm {params.get('algorithm')!r} needs "
            "a real ODF library; re-save without a password"
        )
    # absent start-key-generation element = SHA-1, per the ODF default
    start_name = params.get("start_key") or "sha1"
    start = (
        hashlib.sha1 if "sha1" in start_name.lower() else hashlib.sha256
    )(password.encode("utf-8")).digest()
    key = hashlib.pbkdf2_hmac(
        "sha1",
        start,
        base64.b64decode(params["salt"]),
        params.get("iterations", 1024),
        params.get("key_size") or (16 if blowfish else 32),
    )
    iv = base64.b64decode(params["iv"])
    if blowfish:
        from architxt_spark.functions.blowfish import cfb64_decrypt

        plain = cfb64_decrypt(key, iv, ciphertext)  # stream mode: no pad
    else:
        from architxt_spark.functions.aes import cbc_decrypt_raw

        plain = cbc_decrypt_raw(key, iv, ciphertext)
        pad = plain[-1]
        if 1 <= pad <= 16:
            plain = plain[:-pad]
    want = params.get("checksum", "")
    if want:
        ctype = params.get("checksum_type", "").lower()
        digest = hashlib.sha1 if "sha1" in ctype else hashlib.sha256
        got = base64.b64encode(digest(plain[:1024]).digest()).decode()
        if got != want:
            raise NotImplementedError(
                "password-protected ODF document: the password does not "
                "open it; pass password=… or re-save without one"
            )
    return zlib.decompress(plain, -15)


def make_encrypted_odt(
    odt: bytes, password: str, *, iterations: int = 10_000,
    scheme: str = "aes",
) -> bytes:
    """Encrypt an ODF zip's ``content.xml`` — the fixture twin of
    :func:`odf_decrypt_entry`.  ``scheme="aes"`` emits the ODF 1.2
    manifest shape (SHA-256 start key, AES-256-CBC, sha256-1k
    checksum); ``scheme="blowfish"`` emits the OpenOffice ≤3.x LEGACY
    shape (no start-key-generation element = SHA-1 default, no
    manifest:key-size = 16-byte default, Blowfish 64-bit CFB, SHA1/1K
    checksum, 1024 iterations)."""
    import base64
    import io
    import zipfile
    import zlib

    with zipfile.ZipFile(io.BytesIO(odt)) as z:
        entries = {n: z.read(n) for n in z.namelist()}
    content = entries["content.xml"]
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    deflated = comp.compress(content) + comp.flush()
    salt = hashlib.sha256(b"architxt-odf-salt:" + content[:64]).digest()[:16]
    b64 = lambda b: base64.b64encode(b).decode()
    mns = "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0"
    if scheme == "blowfish":
        from architxt_spark.functions.blowfish import cfb64_encrypt

        iterations = 1024
        iv = hashlib.sha256(b"architxt-odf-iv:" + content[:64]).digest()[:8]
        checksum = b64(hashlib.sha1(deflated[:1024]).digest())
        start = hashlib.sha1(password.encode("utf-8")).digest()
        key = hashlib.pbkdf2_hmac("sha1", start, salt, iterations, 16)
        ct = cfb64_encrypt(key, iv, deflated)
        enc_xml = (
            "<manifest:encryption-data"
            ' manifest:checksum-type="SHA1/1K"'
            f' manifest:checksum="{checksum}">'
            "<manifest:algorithm"
            ' manifest:algorithm-name="Blowfish CFB"'
            f' manifest:initialisation-vector="{b64(iv)}"/>'
            '<manifest:key-derivation manifest:key-derivation-name="PBKDF2"'
            f' manifest:salt="{b64(salt)}"'
            f' manifest:iteration-count="{iterations}"/>'
            "</manifest:encryption-data>"
        )
    elif scheme == "aes":
        from architxt_spark.functions.aes import cbc_encrypt_raw

        iv = hashlib.sha256(b"architxt-odf-iv:" + content[:64]).digest()[:16]
        checksum = b64(hashlib.sha256(deflated[:1024]).digest())
        start = hashlib.sha256(password.encode("utf-8")).digest()
        key = hashlib.pbkdf2_hmac("sha1", start, salt, iterations, 32)
        pad = 16 - len(deflated) % 16
        ct = cbc_encrypt_raw(key, iv, deflated + bytes([pad] * pad))
        enc_xml = (
            "<manifest:encryption-data"
            f' manifest:checksum-type="{mns}#sha256-1k"'
            f' manifest:checksum="{checksum}">'
            "<manifest:algorithm"
            ' manifest:algorithm-name='
            '"http://www.w3.org/2001/04/xmlenc#aes256-cbc"'
            f' manifest:initialisation-vector="{b64(iv)}"/>'
            '<manifest:key-derivation manifest:key-derivation-name="PBKDF2"'
            f' manifest:salt="{b64(salt)}"'
            f' manifest:iteration-count="{iterations}"'
            ' manifest:key-size="32"/>'
            "<manifest:start-key-generation"
            ' manifest:start-key-generation-name='
            '"http://www.w3.org/2000/09/xmldsig-more#sha256"'
            ' manifest:key-size="32"/>'
            "</manifest:encryption-data>"
        )
    else:
        raise ValueError(f"unknown ODF encryption scheme {scheme!r}")
    manifest = (
        f'<manifest:manifest xmlns:manifest="{mns}" manifest:version="1.2">'
        '<manifest:file-entry manifest:full-path="content.xml"'
        ' manifest:media-type="text/xml">'
        + enc_xml
        + "</manifest:file-entry></manifest:manifest>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        if "mimetype" in entries:  # first + stored, per the ODF package spec
            z.writestr(
                zipfile.ZipInfo("mimetype"), entries["mimetype"],
                compress_type=zipfile.ZIP_STORED,
            )
        z.writestr(
            zipfile.ZipInfo("content.xml"), ct,
            compress_type=zipfile.ZIP_STORED,
        )
        z.writestr("META-INF/manifest.xml", manifest)
        for n, body in entries.items():
            if n not in ("mimetype", "content.xml", "META-INF/manifest.xml"):
                z.writestr(n, body)
    return buf.getvalue()
