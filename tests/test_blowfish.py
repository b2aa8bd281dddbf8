"""Blowfish core (functions/blowfish.py): published ECB test vectors
(Schneier's vector set), the π-derived subkey constants, CFB-64
round-trips, cross-backend parity, and the legacy-ODF document shape
it exists to serve."""

import pytest

from architxt_spark.functions import blowfish as bf

HAS_FAST = bf._fast_enabled


@pytest.fixture(params=["fast", "pure"])
def bf_backend(request, monkeypatch):
    if request.param == "fast" and not HAS_FAST:
        pytest.skip("cryptography not importable in this container")
    monkeypatch.setattr(bf, "_fast_enabled", request.param == "fast")
    return request.param


def test_pi_subkey_constants():
    """First P word, first S word, and the very last S word match the
    published tables — pinning the π fixed-point derivation."""
    w = bf._pi_words()
    assert len(w) == 18 + 4 * 256
    assert w[0] == 0x243F6A88 and w[1] == 0x85A308D3
    assert w[18] == 0xD1310BA6  # S-box 0 starts
    assert w[-1] == 0x3AC372E6  # S-box 3 ends


def test_published_ecb_vectors():
    vecs = [
        ("0000000000000000", "0000000000000000", "4ef997456198dd78"),
        ("ffffffffffffffff", "ffffffffffffffff", "51866fd5b85ecb8a"),
        ("3000000000000000", "1000000000000001", "7d856f9a613063f2"),
        ("1111111111111111", "1111111111111111", "2466dd878b963c9d"),
        ("0123456789abcdef", "1111111111111111", "61f9c3802281b096"),
        ("fedcba9876543210", "0123456789abcdef", "0aceab0fc6a0a28d"),
    ]
    for k, pt, ct in vecs:
        key, block = bytes.fromhex(k), bytes.fromhex(pt)
        assert bf.encrypt_block(key, block).hex() == ct
        assert bf.decrypt_block(key, bytes.fromhex(ct)) == block
    # variable-length key (Schneier's "BLOWFISH" vector)
    got = bf.encrypt_block(b"abcdefghijklmnopqrstuvwxyz", b"BLOWFISH")
    assert got.hex() == "324ed0fef413a203"
    with pytest.raises(ValueError):
        bf.encrypt_block(b"abc", b"8bytes!!")  # < 4-byte key


def test_cfb64_chain_vector_and_roundtrip(bf_backend):
    # Schneier's chaining-mode test data (key/IV published); the CFB-64
    # ciphertext head is pinned, the tail round-trips including a
    # non-block-aligned length
    key = bytes.fromhex("0123456789abcdeff0e1d2c3b4a59687")
    iv = bytes.fromhex("fedcba9876543210")
    data = b"7654321 Now is the time for \x00odd tail"
    ct = bf.cfb64_encrypt(key, iv, data)
    assert ct[:8].hex() == "e73214a2822139ca"
    assert bf.cfb64_decrypt(key, iv, ct) == data
    with pytest.raises(ValueError):
        bf.cfb64_encrypt(key, b"shortiv", data)


@pytest.mark.skipif(not HAS_FAST, reason="cryptography not importable")
def test_backend_parity_property(monkeypatch):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        key=st.binary(min_size=4, max_size=56),
        iv=st.binary(min_size=8, max_size=8),
        data=st.binary(min_size=0, max_size=100),
    )
    def check(key, iv, data):
        out = {}
        for fast in (True, False):
            monkeypatch.setattr(bf, "_fast_enabled", fast)
            out[fast] = (
                bf.cfb64_encrypt(key, iv, data),
                bf.cfb64_decrypt(key, iv, data),
            )
        assert out[True] == out[False]

    check()


def test_legacy_odf_blowfish_roundtrip(bf_backend):
    """OpenOffice ≤3.x encrypted ODT: Blowfish CFB manifest with the
    spec DEFAULTS exercised (no start-key-generation element → SHA-1,
    no manifest:key-size → 16 bytes, SHA1/1K checksum)."""
    from architxt_spark.sources.office import make_odt_bytes, read_odt_paragraphs
    from architxt_spark.sources.ooxml_crypto import make_encrypted_odt

    paras = ["Legacy paragraph one.", "Second with caf\xe9 and tab\tchar."]
    blob = make_encrypted_odt(make_odt_bytes(paras), "pw123", scheme="blowfish")
    assert b"Blowfish CFB" in blob and b"start-key-generation" not in blob
    assert b"key-size" not in blob and b"SHA1/1K" in blob
    assert read_odt_paragraphs(blob, password="pw123") == paras
    # wrong password trips the SHA1/1K checksum, loudly
    with pytest.raises(NotImplementedError, match="password"):
        read_odt_paragraphs(blob, password="nope")
    # the ODF 1.2 AES shape still round-trips next to it
    blob2 = make_encrypted_odt(make_odt_bytes(paras), "pw123", scheme="aes")
    assert read_odt_paragraphs(blob2, password="pw123") == paras


def test_unknown_odf_algorithm_still_gated():
    from architxt_spark.sources.ooxml_crypto import odf_decrypt_entry

    with pytest.raises(NotImplementedError, match="ODF encryption algorithm"):
        odf_decrypt_entry(b"x" * 16, {"algorithm": "rc5-magic"}, "pw")
