"""Basic PDF text extraction (sources/pdf.py): round-trips through the
fixture twin, string-escape/hex/TJ decoding, gates, loader seam."""

import zlib

import pytest

from architxt_spark.sources.pdf import (
    _extract_text,
    make_pdf_bytes,
    read_pdf_pages,
)

PAGES = [
    "Hello corpus world.\nSecond line with (parens) and \\ backslash.",
    "Page two: caf\xe9 text.",
]


@pytest.mark.parametrize("compress", [True, False])
def test_pdf_roundtrip(compress):
    blob = make_pdf_bytes(PAGES, compress=compress)
    got = read_pdf_pages(blob)
    assert len(got) == 2
    assert got[0] == PAGES[0]
    assert got[1] == PAGES[1]


def test_pdf_empty_and_multiline_pages():
    pages = ["", "a\nb\nc\nd"]
    got = read_pdf_pages(make_pdf_bytes(pages))
    assert got[0] == "" and got[1] == "a\nb\nc\nd"


def test_extract_text_hex_and_tj_arrays():
    content = (
        b"BT /F1 12 Tf 72 720 Td "
        b"[(kerned )-120(words)] TJ "
        b"0 -14 Td <48656c6c6f> Tj "
        b"ET"
    )
    text = _extract_text(content)
    assert "kerned words" in text
    assert "Hello" in text


def test_extract_text_octal_and_escapes():
    content = rb"BT (\110i\t\(deep\)) Tj ET"
    assert _extract_text(content) == "Hi\t(deep)"


def test_pdf_gates():
    with pytest.raises(ValueError, match="not a PDF"):
        read_pdf_pages(b"%FDP nope")
    # an /Encrypt ref pointing at a missing/non-standard dictionary:
    # loud gate (RC4 standard-handler files now decrypt — see the r12
    # tests below — but unknown handlers must never parse as garbage)
    blob = make_pdf_bytes(["x"]).replace(b"/Root", b"/Encrypt 9 0 R /Root")
    with pytest.raises(NotImplementedError, match="PDF library"):
        read_pdf_pages(blob)
    corrupt = make_pdf_bytes(["x"])
    # truncate the flate stream body -> loud ValueError, not garbage
    at = corrupt.index(b"stream\n") + 7
    end = corrupt.index(b"\nendstream")
    bad = corrupt[:at] + corrupt[at:end][: (end - at) // 2] + corrupt[end:]
    bad = bad.replace(
        f"/Length {end - at}".encode(), f"/Length {(end - at) // 2}".encode()
    )
    with pytest.raises(ValueError, match="FlateDecode"):
        read_pdf_pages(bad)


def test_pdf_survives_missing_xref():
    """Real-world truncated PDFs often lose the xref; the object scan
    must not depend on it."""
    blob = make_pdf_bytes(PAGES)
    truncated = blob[: blob.index(b"xref")]
    assert read_pdf_pages(truncated)[0] == PAGES[0]


def test_read_document_file_pdf_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.trees import rows_to_trees

    p = tmp_path / "report.pdf"
    p.write_bytes(make_pdf_bytes(PAGES))
    nodes = read_document_file(spark, str(p))
    trees = rows_to_trees([r.asDict(recursive=True) for r in nodes.collect()])
    assert len(trees) == 2  # one tree per page
    leaves = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert any("Hello corpus world." in (v or "") for v in leaves)
    assert any("caf\xe9" in (v or "") for v in leaves)


# ---------------------------------------------------------------------------
# r12 widening: PDF 1.5 object streams + predictor-coded xref streams +
# single-byte ToUnicode CMaps (the LibreOffice/reportlab output shape)
# ---------------------------------------------------------------------------

ASCII_PAGES = [
    "Hello corpus world.\nSecond line with (parens) and \\ backslash.",
    "Page two: plain ascii text!",
]


def test_pdf_object_streams_roundtrip():
    blob = make_pdf_bytes(ASCII_PAGES, object_streams=True)
    assert blob.startswith(b"%PDF-1.5")
    assert b"/ObjStm" in blob and b"/Type /XRef" in blob
    # the page dictionaries live INSIDE the packed stream: a raw object
    # scan without ObjStm expansion cannot see them
    import re as _re

    raw = {
        int(m.group(1)): m.group(3)
        for m in _re.finditer(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", blob, _re.S)
    }
    assert not any(
        _re.search(rb"/Type\s*/Page\b", b.split(b"stream", 1)[0])
        for b in raw.values()
    )
    assert read_pdf_pages(blob) == ASCII_PAGES


def test_pdf_tounicode_roundtrip_requires_cmap():
    blob = make_pdf_bytes(ASCII_PAGES, tounicode=True)
    assert read_pdf_pages(blob) == ASCII_PAGES
    # the strings are stored code-shifted: stripping the /ToUnicode link
    # must yield shifted garbage, proving the CMap is load-bearing
    stripped = blob.replace(b"/ToUnicode", b"/XXUnicode")
    garbled = read_pdf_pages(stripped)
    assert garbled != ASCII_PAGES
    assert garbled[1].startswith("Qbhf!uxp")  # each byte +1


def test_pdf_modern_combined_and_pages_order():
    pages = [f"doc page {i}" for i in range(5)]
    blob = make_pdf_bytes(pages, object_streams=True, tounicode=True)
    assert read_pdf_pages(blob) == pages


def test_pdf_xref_stream_predictor_decodes():
    from architxt_spark.sources.pdf import _object_stream, _parse_objects

    blob = make_pdf_bytes(ASCII_PAGES, object_streams=True)
    objs = _parse_objects(blob)
    xref = next(b for b in objs.values() if b"/Type /XRef" in b)
    data = _object_stream(xref)
    # /W [1 4 2] rows: first row is the type-0 free entry for object 0
    assert data is not None and len(data) % 7 == 0
    assert data[:7] == bytes([0, 0, 0, 0, 0, 0xFF, 0xFF])
    # every packed object has a type-2 row pointing into the ObjStm
    types = {data[i] for i in range(0, len(data), 7)}
    assert types == {0, 1, 2}


def test_png_unpredict_all_filter_types():
    from architxt_spark.sources.pdf import _png_unpredict

    rows = [bytes([10, 20, 30, 40]), bytes([13, 24, 35, 46]), bytes([99, 1, 2, 250])]
    # encode each row with a different PNG filter, decode must recover
    enc = bytearray()
    prev = bytes(4)
    for ftype, row in zip((1, 2, 4), rows):
        enc.append(ftype)
        if ftype == 1:  # Sub
            enc += bytes([row[0]] + [(row[i] - row[i - 1]) & 0xFF for i in range(1, 4)])
        elif ftype == 2:  # Up
            enc += bytes((row[i] - prev[i]) & 0xFF for i in range(4))
        else:  # Paeth
            out = []
            for i in range(4):
                a = row[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pred) & 0xFF)
            enc += bytes(out)
        prev = row
    assert _png_unpredict(bytes(enc), 4) == b"".join(rows)


def test_tounicode_map_parses_bfchar_and_bfrange():
    from architxt_spark.sources.pdf import _tounicode_map

    cm = (
        b"2 beginbfchar <41> <0058> <42> <00590059> endbfchar\n"
        b"1 beginbfrange <61> <63> <0041> endbfrange\n"
        b"1 beginbfrange <70> <71> [<0050> <0051>] endbfrange"
    )
    w, m = _tounicode_map(cm)
    assert w == 1
    assert m[0x41] == "X" and m[0x42] == "YY"
    assert m[0x61] == "A" and m[0x62] == "B" and m[0x63] == "C"
    assert m[0x70] == "P" and m[0x71] == "Q"
    # 2-byte source codes: the Identity-H composite-font width
    w2, m2 = _tounicode_map(b"1 beginbfchar <0041> <0058> endbfchar")
    assert w2 == 2 and m2[0x41] == "X"
    # exotic (>2-byte) or MIXED-width code spaces: whole map rejected
    assert _tounicode_map(b"1 beginbfchar <004121> <0058> endbfchar") is None
    assert (
        _tounicode_map(b"2 beginbfchar <41> <0058> <0042> <0059> endbfchar")
        is None
    )


def test_pdf_cid_identity_h_roundtrip():
    """Type0 /Identity-H composite font with 2-byte glyph codes in hex
    strings — the LibreOffice embedded-font-subset output shape."""
    for object_streams in (False, True):
        blob = make_pdf_bytes(ASCII_PAGES, cid=True, object_streams=object_streams)
        assert b"/Identity-H" in blob or object_streams  # packed when objstm
        assert read_pdf_pages(blob) == ASCII_PAGES
    # without the CMap the 2-byte codes read as latin-1 pairs: garbage,
    # proving the 2-byte decode path is load-bearing
    blob = make_pdf_bytes(ASCII_PAGES, cid=True)
    garbled = read_pdf_pages(blob.replace(b"/ToUnicode", b"/XXUnicode"))
    assert garbled != ASCII_PAGES and garbled[1].startswith("\x01P\x01a")
    with pytest.raises(ValueError):
        make_pdf_bytes(ASCII_PAGES, cid=True, tounicode=True)


# ---------------------------------------------------------------------------
# r12 widening: RC4-encrypted PDFs (standard security handler V2/R3) —
# the common "protected" file whose USER password is empty opens
# transparently, like the xls reader's default-password workbooks
# ---------------------------------------------------------------------------


def test_pdf_rc4_encrypted_roundtrip():
    for object_streams in (False, True):
        blob = make_pdf_bytes(ASCII_PAGES, encrypt=True, object_streams=object_streams)
        assert b"/Encrypt" in blob and b"/Standard" in blob
        assert read_pdf_pages(blob) == ASCII_PAGES
    # ciphertext differs from plaintext at equal stream length (RC4)
    import re as _re

    plain = make_pdf_bytes(ASCII_PAGES)
    enc = make_pdf_bytes(ASCII_PAGES, encrypt=True)
    ps = _re.search(rb"stream\r?\n(.*?)\r?\nendstream", plain, _re.S).group(1)
    es = _re.search(rb"stream\r?\n(.*?)\r?\nendstream", enc, _re.S).group(1)
    assert ps != es and len(ps) == len(es)


def test_pdf_rc4_user_password_gate():
    blob = make_pdf_bytes(ASCII_PAGES, encrypt=True, user_password="s3cret")
    with pytest.raises(NotImplementedError, match="password-protected"):
        read_pdf_pages(blob)
    assert read_pdf_pages(blob, password="s3cret") == ASCII_PAGES


def test_pdf_rc4_composes_with_other_shapes():
    for kw in ({"object_streams": True, "cid": True}, {"tounicode": True}):
        blob = make_pdf_bytes(ASCII_PAGES, encrypt=True, **kw)
        assert read_pdf_pages(blob) == ASCII_PAGES


def test_pdf_aes_roundtrips():
    """AES-128 (V4 /AESV2 crypt filter) and AES-256 (V5/R6, hardened
    hash + UE key unwrap) both round-trip, in both file layouts and
    composed with the font shapes.  The R6 hash and key wrap are
    exercised fixture↔reader (structure per the published algorithms;
    AES core pinned to FIPS-197 vectors in test_aes.py)."""
    for mode in ("aesv2", "aesv3"):
        for object_streams in (False, True):
            blob = make_pdf_bytes(
                ASCII_PAGES, encrypt=mode, object_streams=object_streams
            )
            assert read_pdf_pages(blob) == ASCII_PAGES
        # password-protected: gated without, opens with
        blob = make_pdf_bytes(ASCII_PAGES, encrypt=mode, user_password="pw!")
        with pytest.raises(NotImplementedError, match="password"):
            read_pdf_pages(blob)
        assert read_pdf_pages(blob, password="pw!") == ASCII_PAGES
    # AES-256 documents also open with the OWNER password (OE unwrap)
    blob = make_pdf_bytes(ASCII_PAGES, encrypt="aesv3", user_password="userpw")
    assert read_pdf_pages(blob, password="owner") == ASCII_PAGES
    blob = make_pdf_bytes(ASCII_PAGES, encrypt="aesv3", cid=True)
    assert read_pdf_pages(blob) == ASCII_PAGES


def test_pdf_unknown_encryption_still_gated():
    # unknown crypt filters and unpublished V revisions keep the gate
    blob = make_pdf_bytes(ASCII_PAGES, encrypt="aesv2")
    with pytest.raises(NotImplementedError, match="crypt filter"):
        read_pdf_pages(blob.replace(b"/CFM /AESV2", b"/CFM /AESV9"))
    blob = make_pdf_bytes(ASCII_PAGES, encrypt=True)
    with pytest.raises(NotImplementedError, match="non-standard"):
        read_pdf_pages(blob.replace(b"/V 2 /R 3", b"/V 3 /R 3"))


# ---------------------------------------------------------------------------
# r13 hardening: hostile-writer /Encrypt key orders, malformed CMaps,
# Tf operators inside string literals, /Type/XRef spacing
# ---------------------------------------------------------------------------


def test_encrypt_length_reads_top_level_not_crypt_filter():
    """qpdf writes /Encrypt keys alphabetically: the /CF sub-dict (with
    its per-filter /Length in BYTES) precedes the top-level /Length in
    bits.  A first-match scan reads 16 bits = 2 key bytes and rejects a
    perfectly openable RC4 file."""
    blob = make_pdf_bytes(ASCII_PAGES, encrypt=True)
    qpdf_order = blob.replace(
        b"/V 2 /R 3 /Length 128",
        b"/CF << /StdCF << /CFM /V2 /AuthEvent /DocOpen /Length 16 >> >> "
        b"/V 2 /R 3 /Length 128",
    )
    assert qpdf_order != blob
    assert read_pdf_pages(qpdf_order) == ASCII_PAGES


def test_encrypt_length_sub40_treated_as_bytes():
    # ambiguous writers emit the key length in bytes; < 40 can only be
    # bytes (the spec's minimum is 40 bits)
    blob = make_pdf_bytes(ASCII_PAGES, encrypt=True)
    in_bytes = blob.replace(b"/Length 128", b"/Length 16")
    assert read_pdf_pages(in_bytes) == ASCII_PAGES


def test_dict_top_level_strips_subdicts_and_strings():
    from architxt_spark.sources.pdf import _dict_top_level

    body = (
        b"<< /CF << /StdCF << /Length 16 >> >> /Length 128 "
        b"/O (paren \\) and << inside) /U <4c656e677468203939> >>"
    )
    top = _dict_top_level(body)
    assert b"/Length 128" in top
    assert b"16" not in top  # sub-dict entry gone
    assert b"99" not in top and b"4c65" not in top  # string bodies gone


def test_bfrange_near_unicode_ceiling_degrades_not_crashes():
    from architxt_spark.sources.pdf import _tounicode_map

    # base U+10FFFD: +0..2 valid, +3.. overflows chr() range — the
    # overflowing codes must fall back (absent), not raise
    base = "\U0010fffd".encode("utf-16-be").hex().encode()
    cm = b"1 beginbfrange <00> <07> <" + base + b"> endbfrange"
    w, m = _tounicode_map(cm)
    assert w == 1
    assert m[0] == "\U0010fffd" and m[2] == "\U0010ffff"
    assert 3 not in m and 7 not in m
    # base walking INTO the surrogate block: mapped below, absent inside
    cm2 = b"1 beginbfrange <00> <04> <D7FE> endbfrange"
    _, m2 = _tounicode_map(cm2)
    assert m2[0] == "퟾" and m2[1] == "퟿"
    assert 2 not in m2 and 4 not in m2


def test_tf_inside_string_literal_does_not_switch_font():
    from architxt_spark.sources.pdf import _extract_text

    fonts = {b"/F1": (1, {ord("a"): "X"})}
    # the shown string CONTAINS the byte sequence '/F1 9 Tf'; a
    # whole-stream pre-scan would switch to /F1 and map 'a'→'X' in the
    # following string
    content = b"BT /F9 9 Tf (see /F1 9 Tf here) Tj (banana) Tj ET"
    assert _extract_text(content, fonts) == "see /F1 9 Tf herebanana"
    # real font selects outside strings still apply
    content2 = b"BT /F1 9 Tf (banana) Tj ET"
    assert _extract_text(content2, fonts) == "bXnXnX"


def test_xref_stream_exemption_tolerates_tight_spacing():
    from architxt_spark.sources.pdf import _parse_objects

    # '/Type/XRef' (no space) must be exempt from decryption just like
    # '/Type /XRef' — the spec leaves xref streams in the clear
    raw = b"7 0 obj << /Type/XRef >> stream\nCLEARDATA\nendstream endobj"
    objs = _parse_objects(raw, enc=("rc4", b"k" * 16))
    assert b"CLEARDATA" in objs[7]


def test_stream_span_honors_direct_length():
    from architxt_spark.sources.pdf import _stream_span

    # payload ENDS with CR: the non-greedy `\r?\nendstream` scan would
    # eat it; the direct /Length boundary must not
    payload = b"A" * 15 + b"\r"
    body = b"<< /Length 16 >> stream\n" + payload + b"\nendstream"
    s, e = _stream_span(body)
    assert body[s:e] == payload
    # indirect /Length (`5 0 R`) falls back to the scan
    body2 = b"<< /Length 5 0 R >> stream\nBBBB\nendstream"
    s2, e2 = _stream_span(body2)
    assert body2[s2:e2] == b"BBBB"
    # multi-digit indirect ref must not half-match as /Length 128
    body3 = b"<< /Length 1280 0 R >> stream\nCCCCC\nendstream"
    s3, e3 = _stream_span(body3)
    assert body3[s3:e3] == b"CCCCC"
    # a LYING direct /Length (no endstream there) falls back to the scan
    body4 = b"<< /Length 99 >> stream\nDDD\nendstream"
    s4, e4 = _stream_span(body4)
    assert body4[s4:e4] == b"DDD"


def test_ciphertext_ending_in_cr_roundtrips():
    """Pinned seeds whose en/decrypted stream bytes END with 0x0D — the
    1-in-256-per-stream shape where the `\\r?\\nendstream` scan used to
    swallow the last payload byte and corrupt the document."""
    for pages, mode in (["trap hunt 166"], "aesv3"), (["trap hunt 362"], True):
        blob = make_pdf_bytes(pages, encrypt=mode)
        if b"\r\nendstream" not in blob:  # seed drifted with the fixture
            pytest.skip("fixture bytes changed; re-pin the trap seeds")
        assert read_pdf_pages(blob) == pages
