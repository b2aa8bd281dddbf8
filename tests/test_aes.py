"""AES core (functions/aes.py): FIPS-197 appendix-C vectors pinned for
all three key sizes ON BOTH BACKENDS (OpenSSL fast path when
`cryptography` is importable, pure-stdlib fallback), CBC round-trips,
cross-backend parity, and the PDF V5/R6 hardened-hash shape it exists
to serve."""

import pytest

from architxt_spark.functions import aes

HAS_FAST = aes._fast_enabled  # availability at import, before any patching


@pytest.fixture(params=["fast", "pure"])
def aes_backend(request, monkeypatch):
    """Run the decorated test under each AES backend."""
    if request.param == "fast" and not HAS_FAST:
        pytest.skip("cryptography not importable in this container")
    monkeypatch.setattr(aes, "_fast_enabled", request.param == "fast")
    return request.param

PT = bytes.fromhex("00112233445566778899aabbccddeeff")
K128 = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
K192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
K256 = bytes.fromhex(
    "000102030405060708090a0b0c0d0e0f101112131415161718191a1b1c1d1e1f"
)


def test_fips_197_vectors(aes_backend):
    assert aes.encrypt_block(K128, PT).hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert aes.encrypt_block(K192, PT).hex() == "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert aes.encrypt_block(K256, PT).hex() == "8ea2b7ca516745bfeafc49904b496089"
    for k in (K128, K192, K256):
        assert aes.decrypt_block(k, aes.encrypt_block(k, PT)) == PT
    with pytest.raises(ValueError):
        aes.encrypt_block(b"short", PT)


def test_cbc_roundtrip_and_padding(aes_backend):
    iv = bytes(range(16))
    for msg in (b"", b"x", b"The quick brown fox jumps!", b"y" * 16, b"z" * 33):
        blob = aes.cbc_encrypt(K128, iv, msg)
        assert blob[:16] == iv and len(blob) % 16 == 0
        assert aes.cbc_decrypt(K128, blob) == msg
    # raw (no-pad, explicit-IV) forms invert each other
    data = b"0123456789abcdef" * 3
    ct = aes.cbc_encrypt_raw(K256, iv, data)
    assert aes.cbc_decrypt_raw(K256, iv, ct) == data
    with pytest.raises(ValueError):
        aes.cbc_encrypt_raw(K256, iv, b"not-block-aligned")


def test_nist_cbc_vector(aes_backend):
    # NIST SP 800-38A F.2.1 (CBC-AES128.Encrypt, first block)
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("6bc1bee22e409f96e93d7e117393172a")
    ct = aes.cbc_encrypt_raw(key, iv, pt)
    assert ct.hex() == "7649abac8119b246cee98e9b12e9197d"


def test_pdf_r6_hash_shape():
    """The V5/R6 hardened hash (sources/pdf.py:_hash_2b): 32 bytes,
    deterministic, password- and salt-sensitive, and the documented
    ≥64-round loop actually runs (cost is visibly above one SHA-256)."""
    from architxt_spark.sources.pdf import _hash_2b

    h1 = _hash_2b(b"", b"saltsalt", b"")
    h2 = _hash_2b(b"", b"saltsalt", b"")
    assert h1 == h2 and len(h1) == 32
    assert _hash_2b(b"pw", b"saltsalt", b"") != h1
    assert _hash_2b(b"", b"other888", b"") != h1
    assert _hash_2b(b"", b"saltsalt", b"u" * 48) != h1


def test_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        key=st.binary(min_size=16, max_size=16)
        | st.binary(min_size=24, max_size=24)
        | st.binary(min_size=32, max_size=32),
        block=st.binary(min_size=16, max_size=16),
    )
    def check(key, block):
        assert aes.decrypt_block(key, aes.encrypt_block(key, block)) == block

    check()


def test_cbc_roundtrip_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        key=st.binary(min_size=16, max_size=16),
        iv=st.binary(min_size=16, max_size=16),
        msg=st.binary(min_size=0, max_size=200),
    )
    def check(key, iv, msg):
        assert aes.cbc_decrypt(key, aes.cbc_encrypt(key, iv, msg)) == msg

    check()


@pytest.mark.skipif(not HAS_FAST, reason="cryptography not importable")
def test_backend_parity_property(monkeypatch):
    """The two backends are bit-identical on random keys/IVs/payloads —
    the parity contract that makes the fast path a safe drop-in."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        key=st.binary(min_size=16, max_size=16)
        | st.binary(min_size=32, max_size=32),
        iv=st.binary(min_size=16, max_size=16),
        blocks=st.integers(min_value=1, max_value=5),
        seed=st.binary(min_size=16, max_size=16),
    )
    def check(key, iv, blocks, seed):
        data = (seed * blocks)[: 16 * blocks]
        out = {}
        for fast in (True, False):
            monkeypatch.setattr(aes, "_fast_enabled", fast)
            out[fast] = (
                aes.encrypt_block(key, data[:16]),
                aes.decrypt_block(key, data[:16]),
                aes.cbc_encrypt_raw(key, iv, data),
                aes.cbc_decrypt_raw(key, iv, data),
            )
        assert out[True] == out[False]

    check()


@pytest.mark.skipif(not HAS_FAST, reason="cryptography not importable")
def test_encrypted_fixture_interop_across_backends(monkeypatch):
    """An AES-encrypted PDF written under one backend opens under the
    other — full KDF + key-unwrap + stream-decrypt interop, both
    directions, for AESV2 (AES-128) and AESV3 (AES-256 R6)."""
    from architxt_spark.sources.pdf import make_pdf_bytes, read_pdf_pages

    pages = ["backend interop page."]
    for mode in ("aesv2", "aesv3"):
        blobs = {}
        for fast in (True, False):
            monkeypatch.setattr(aes, "_fast_enabled", fast)
            blobs[fast] = make_pdf_bytes(pages, encrypt=mode)
        for writer, blob in blobs.items():
            monkeypatch.setattr(aes, "_fast_enabled", not writer)
            assert read_pdf_pages(blob) == pages, (mode, writer)
