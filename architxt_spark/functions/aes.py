"""AES (FIPS-197) — block cipher + CBC, decrypt and encrypt directions.

Exists for FORMAT READING, not transport security: the PDF standard
security handler's AESV2/AESV3 and the office CryptoAPI/Agile tails
need block decryption in-container.  Two interchangeable backends sit
behind the same entry points (``encrypt_block``/``decrypt_block``,
``cbc_{en,de}crypt_raw``):

- **fast** — OpenSSL via the ``cryptography`` package when importable
  (auto-detected; ~1000× the pure path on bulk CBC), so encrypted-heavy
  corpora aren't bottlenecked on document opening;
- **pure** — stdlib-only table-form AES (the original implementation),
  always present, used when ``cryptography`` is missing or when
  ``_fast_enabled`` is falsed out (tests pin parity across both).

Tables and schedule follow the published standard; the FIPS-197
appendix vectors are pinned in tests against BOTH backends.  The
spin-count KDFs (PDF R6 hash, OOXML spins) remain the per-document
floor by design — this seam removes only the AES term.
"""

from __future__ import annotations

try:  # fast path: OpenSSL-backed AES (import-gated, never required)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _Cipher,
        algorithms as _algorithms,
        modes as _modes,
    )

    _fast_enabled = True
except ImportError:  # pragma: no cover - depends on container contents
    _fast_enabled = False

_SBOX = [
    0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B,
    0xFE, 0xD7, 0xAB, 0x76, 0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0,
    0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0, 0xB7, 0xFD, 0x93, 0x26,
    0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
    0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2,
    0xEB, 0x27, 0xB2, 0x75, 0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0,
    0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84, 0x53, 0xD1, 0x00, 0xED,
    0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
    0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F,
    0x50, 0x3C, 0x9F, 0xA8, 0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5,
    0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2, 0xCD, 0x0C, 0x13, 0xEC,
    0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
    0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14,
    0xDE, 0x5E, 0x0B, 0xDB, 0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C,
    0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79, 0xE7, 0xC8, 0x37, 0x6D,
    0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
    0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F,
    0x4B, 0xBD, 0x8B, 0x8A, 0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E,
    0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E, 0xE1, 0xF8, 0x98, 0x11,
    0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
    0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F,
    0xB0, 0x54, 0xBB, 0x16,
]
_INV_SBOX = [0] * 256
for _i, _v in enumerate(_SBOX):
    _INV_SBOX[_v] = _i

_RCON = [0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36, 0x6C, 0xD8, 0xAB, 0x4D]


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _mul(a: int, b: int) -> int:
    out = 0
    while b:
        if b & 1:
            out ^= a
        a = _xtime(a)
        b >>= 1
    return out


#: precomputed GF(2^8) multiplication tables for the Mix/InvMix column
#: constants — the per-byte `_mul` call chain dominated the block cost
#: (~120 µs/block interpreted; tables bring it to ~30 µs, which matters
#: because the PDF V5/R6 hardened hash runs ~130 CBC rounds per open)
_M2, _M3 = [_mul(i, 2) for i in range(256)], [_mul(i, 3) for i in range(256)]
_M9, _M11 = [_mul(i, 9) for i in range(256)], [_mul(i, 11) for i in range(256)]
_M13, _M14 = [_mul(i, 13) for i in range(256)], [_mul(i, 14) for i in range(256)]


import functools


@functools.lru_cache(maxsize=256)
def _expand_key(key: bytes) -> list[list[int]]:
    # cached: CBC loops call encrypt/decrypt_block once per 16-byte
    # block with the SAME key — re-deriving the schedule per block cost
    # more than the rounds themselves (round keys are never mutated)
    key = bytes(key)
    nk = len(key) // 4
    if nk not in (4, 6, 8) or len(key) % 4:
        raise ValueError("AES key must be 16, 24 or 32 bytes")
    nr = nk + 6
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (nr + 1)):
        t = list(words[i - 1])
        if i % nk == 0:
            t = t[1:] + t[:1]
            t = [_SBOX[b] for b in t]
            t[0] ^= _RCON[i // nk - 1]
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        words.append([a ^ b for a, b in zip(words[i - nk], t)])
    # one 16-byte round key per round, column-major state order
    return [
        [words[4 * r + c][row] for c in range(4) for row in range(4)]
        for r in range(nr + 1)
    ]


def _add_round_key(state: list[int], rk: list[int]) -> None:
    for i in range(16):
        state[i] ^= rk[i]


def encrypt_block(key: bytes, block: bytes) -> bytes:
    if _fast_enabled:
        e = _Cipher(_algorithms.AES(key), _modes.ECB()).encryptor()
        return e.update(block) + e.finalize()
    rks = _expand_key(key)
    nr = len(rks) - 1
    s = list(block)
    _add_round_key(s, rks[0])
    for rnd in range(1, nr + 1):
        s = [_SBOX[b] for b in s]  # SubBytes
        # ShiftRows (state is column-major: index = 4*col + row; row r
        # rotates left by r, which flattens to (i + 4*(i%4)) mod 16)
        s = [s[(i + 4 * (i % 4)) % 16] for i in range(16)]
        if rnd != nr:  # MixColumns (table form)
            out = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                out += [
                    _M2[a0] ^ _M3[a1] ^ a2 ^ a3,
                    a0 ^ _M2[a1] ^ _M3[a2] ^ a3,
                    a0 ^ a1 ^ _M2[a2] ^ _M3[a3],
                    _M3[a0] ^ a1 ^ a2 ^ _M2[a3],
                ]
            s = out
        _add_round_key(s, rks[rnd])
    return bytes(s)


def decrypt_block(key: bytes, block: bytes) -> bytes:
    if _fast_enabled:
        d = _Cipher(_algorithms.AES(key), _modes.ECB()).decryptor()
        return d.update(block) + d.finalize()
    rks = _expand_key(key)
    nr = len(rks) - 1
    s = list(block)
    _add_round_key(s, rks[nr])
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows
        s = [
            s[(i - 4 * (i % 4)) % 16]
            for i in range(16)
        ]
        s = [_INV_SBOX[b] for b in s]  # InvSubBytes
        _add_round_key(s, rks[rnd])
        if rnd != 0:  # InvMixColumns (table form)
            out = []
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                out += [
                    _M14[a0] ^ _M11[a1] ^ _M13[a2] ^ _M9[a3],
                    _M9[a0] ^ _M14[a1] ^ _M11[a2] ^ _M13[a3],
                    _M13[a0] ^ _M9[a1] ^ _M14[a2] ^ _M11[a3],
                    _M11[a0] ^ _M13[a1] ^ _M9[a2] ^ _M14[a3],
                ]
            s = out
    return bytes(s)


def cbc_decrypt_raw(key: bytes, iv: bytes, ct: bytes) -> bytes:
    """AES-CBC decrypt with an explicit IV, no padding handling (the
    PDF V5 ``/UE``/``/OE`` file-key unwrap uses a zero IV, no pad)."""
    if len(ct) % 16:
        raise ValueError("AES-CBC ciphertext must be whole blocks")
    if _fast_enabled:
        d = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).decryptor()
        return d.update(ct) + d.finalize()
    out = bytearray()
    prev = iv
    for at in range(0, len(ct), 16):
        block = ct[at : at + 16]
        pt = decrypt_block(key, block)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = block
    return bytes(out)


def cbc_decrypt(key: bytes, iv_and_ct: bytes, *, strip_padding: bool = True) -> bytes:
    """AES-CBC decrypt of ``IV || ciphertext`` (the PDF AESV2/AESV3
    stream layout); PKCS#5 padding stripped when well-formed."""
    if len(iv_and_ct) < 32 or len(iv_and_ct) % 16:
        raise ValueError("AES-CBC payload must be IV + whole blocks")
    out = bytearray(cbc_decrypt_raw(key, iv_and_ct[:16], iv_and_ct[16:]))
    if strip_padding and out:
        pad = out[-1]
        if 1 <= pad <= 16 and len(out) >= pad and all(b == pad for b in out[-pad:]):
            del out[-pad:]
    return bytes(out)


def cbc_encrypt_raw(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC encrypt, no padding, ciphertext only (``data`` must be
    block-aligned — the V5 hardening loop and key wrap are)."""
    if len(data) % 16:
        raise ValueError("AES-CBC plaintext must be whole blocks")
    if _fast_enabled:
        e = _Cipher(_algorithms.AES(key), _modes.CBC(iv)).encryptor()
        return e.update(data) + e.finalize()
    out = bytearray()
    prev = iv
    for at in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[at : at + 16], prev))
        prev = encrypt_block(key, block)
        out += prev
    return bytes(out)


def cbc_encrypt(key: bytes, iv: bytes, plaintext: bytes) -> bytes:
    """AES-CBC encrypt with PKCS#5 padding; returns ``IV || ciphertext``
    (the fixture twin of :func:`cbc_decrypt`)."""
    pad = 16 - len(plaintext) % 16
    return iv + cbc_encrypt_raw(key, iv, plaintext + bytes([pad] * pad))
