"""Encrypted OOXML (sources/ooxml_crypto.py): Standard (AES-ECB,
SHA-1 50k) and Agile (AES-CBC segments, SHA-512 spin) round-trips
through the fixture twin, the VelvetSweatshop default-password
convention, wrong-password gates, and the loader seams (docx, pptx,
xlsx all open the OLE2-wrapped shape transparently)."""

import io
import zipfile

import pytest

from architxt_spark.sources.ooxml_crypto import (
    decrypt_ooxml,
    is_encrypted_ooxml,
    make_encrypted_ooxml,
)


def _zip(entries: dict[str, str]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for name, text in entries.items():
            z.writestr(name, text)
    return buf.getvalue()


@pytest.mark.parametrize("scheme", ["standard", "agile"])
def test_roundtrip_default_password(scheme):
    pkg = _zip({"a.xml": "<x>hello</x>" * 300, "b.xml": "<y/>"})
    blob = make_encrypted_ooxml(pkg, scheme=scheme)
    assert is_encrypted_ooxml(blob)
    assert not is_encrypted_ooxml(pkg)
    out = decrypt_ooxml(blob)
    assert out == pkg
    with zipfile.ZipFile(io.BytesIO(out)) as z:
        assert set(z.namelist()) == {"a.xml", "b.xml"}


@pytest.mark.parametrize("scheme", ["standard", "agile"])
def test_wrong_password_gates_and_explicit_opens(scheme):
    pkg = _zip({"a.xml": "<x/>"})
    blob = make_encrypted_ooxml(pkg, password="s3cret", scheme=scheme)
    with pytest.raises(NotImplementedError, match="password-protected"):
        decrypt_ooxml(blob)
    assert decrypt_ooxml(blob, password="s3cret") == pkg


def test_agile_multi_segment():
    # >4096-byte package exercises per-segment IVs
    pkg = _zip({"big.xml": "<row>data</row>" * 3000})
    assert len(pkg) > 12_000
    blob = make_encrypted_ooxml(pkg, scheme="agile")
    assert decrypt_ooxml(blob) == pkg


def test_unknown_version_gates():
    pkg = _zip({"a.xml": "<x/>"})
    blob = make_encrypted_ooxml(pkg, scheme="standard")
    # EncryptionInfo version 3.2 -> 5.3 (extensible): loud gate
    import struct

    bad = blob.replace(struct.pack("<HH", 3, 2), struct.pack("<HH", 5, 3), 1)
    with pytest.raises(NotImplementedError, match="version"):
        decrypt_ooxml(bad)


def test_encrypted_docx_and_pptx_loader_seam(tmp_path):
    from architxt_spark.sources.office import (
        make_docx_bytes,
        make_pptx_bytes,
        read_docx_paragraphs,
        read_pptx_slides,
    )

    paras = ["Hello encrypted docx.", "Second paragraph."]
    slides = ["Slide one text", "Slide two"]
    for scheme in ("standard", "agile"):
        enc = make_encrypted_ooxml(make_docx_bytes(paras), scheme=scheme)
        assert read_docx_paragraphs(enc) == paras  # bytes form
        p = tmp_path / f"doc_{scheme}.docx"
        p.write_bytes(enc)
        assert read_docx_paragraphs(str(p)) == paras  # path form
    enc = make_encrypted_ooxml(make_pptx_bytes(slides), scheme="agile")
    assert read_pptx_slides(enc) == slides


def test_encrypted_xlsx_loader_seam(tmp_path):
    from architxt_spark.sources.documents import _read_xlsx_stdlib
    from test_sources import _write_xlsx

    plain = tmp_path / "plain.xlsx"
    _write_xlsx(str(plain), {"S": [["h"], ["v1"], ["v2"]]})
    expected = _read_xlsx_stdlib(str(plain))
    assert expected and expected["S"]

    for scheme in ("standard", "agile"):
        enc = tmp_path / f"enc_{scheme}.xlsx"
        enc.write_bytes(
            make_encrypted_ooxml(plain.read_bytes(), scheme=scheme)
        )
        assert _read_xlsx_stdlib(str(enc)) == expected


# ---------------------------------------------------------------------------
# ODF 1.2 manifest encryption (.odt with password — the LibreOffice
# scheme: PBKDF2 over a SHA-256 start key, AES-256-CBC, raw deflate)
# ---------------------------------------------------------------------------


def test_encrypted_odt_roundtrip_and_gates():
    from architxt_spark.sources.office import make_odt_bytes, read_odt_paragraphs
    from architxt_spark.sources.ooxml_crypto import make_encrypted_odt

    paras = ["Hello encrypted odt.", "Second paragraph with text."]
    plain = make_odt_bytes(paras)
    enc = make_encrypted_odt(plain, "s3cret")
    assert read_odt_paragraphs(plain) == paras  # clear path untouched
    assert read_odt_paragraphs(enc, password="s3cret") == paras
    # the stored member really is ciphertext, not the deflated XML
    import io as _io
    import zipfile as _zip

    with _zip.ZipFile(_io.BytesIO(enc)) as z:
        assert b"<office:" not in z.read("content.xml")
        assert z.getinfo("content.xml").compress_type == _zip.ZIP_STORED
    # no/wrong password: loud gate via the manifest checksum
    with pytest.raises(NotImplementedError, match="password"):
        read_odt_paragraphs(enc)
    with pytest.raises(NotImplementedError, match="password"):
        read_odt_paragraphs(enc, password="wrong")


def test_encrypted_odt_blowfish_now_decrypts():
    # r13: the legacy OpenOffice Blowfish-CFB gate is RETIRED — the
    # manifest's URI-form algorithm name routes into the Blowfish path
    # (full round-trips live in tests/test_blowfish.py); genuinely
    # unknown algorithms still gate loudly
    import base64
    import hashlib
    import zlib

    from architxt_spark.functions.blowfish import cfb64_encrypt
    from architxt_spark.sources.ooxml_crypto import odf_decrypt_entry

    content = b"<office:text>legacy body</office:text>"
    comp = zlib.compressobj(9, zlib.DEFLATED, -15)
    deflated = comp.compress(content) + comp.flush()
    salt, iv = b"s" * 16, b"i" * 8
    start = hashlib.sha1(b"pw").digest()
    key = hashlib.pbkdf2_hmac("sha1", start, salt, 1024, 16)
    params = {
        "algorithm": "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0#blowfish",
        "salt": base64.b64encode(salt).decode(),
        "iv": base64.b64encode(iv).decode(),
        "iterations": 1024,
    }
    ct = cfb64_encrypt(key, iv, deflated)
    assert odf_decrypt_entry(ct, params, "pw") == content
    with pytest.raises(NotImplementedError, match="algorithm"):
        odf_decrypt_entry(b"\x00" * 16, {**params, "algorithm": "rc5"}, "pw")


def test_read_document_file_password_plumbing(spark, tmp_path):
    """One password kwarg opens every encrypted format through the
    top-level loader: OOXML docx, ODF odt, AES PDF, CryptoAPI xls."""
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.sources.office import make_docx_bytes, make_odt_bytes
    from architxt_spark.sources.ooxml_crypto import (
        make_encrypted_odt,
        make_encrypted_ooxml,
    )
    from architxt_spark.sources.pdf import make_pdf_bytes
    from architxt_spark.sources.xls import make_xls_bytes

    cases = {
        "d.docx": make_encrypted_ooxml(
            make_docx_bytes(["Secret paragraph."]), password="pw1"
        ),
        "d.odt": make_encrypted_odt(make_odt_bytes(["Secret odt text."]), "pw1"),
        "d.pdf": make_pdf_bytes(
            ["Secret pdf page."], encrypt="aesv2", user_password="pw1"
        ),
        "d.xls": make_xls_bytes(
            {"S": [["t"], ["secret cell"]]}, password="pw1", crypto_api=True
        ),
    }
    for name, blob in cases.items():
        p = tmp_path / name
        p.write_bytes(blob)
        nodes = read_document_file(spark, str(p), password="pw1")
        leaves = {
            r.leaf_value
            for r in nodes.filter("leaf_value is not null").collect()
        }
        assert any("ecret" in (v or "") for v in leaves), name
        # and without the password: loud error, not silence
        with pytest.raises((NotImplementedError, ValueError)):
            read_document_file(spark, str(p))
