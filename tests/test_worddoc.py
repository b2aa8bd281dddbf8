"""Legacy Word binary .doc source (sources/worddoc.py): piece-table
round trips, control-char mapping, gates, loader e2e, volume fuzz."""

import struct

import pytest

from architxt_spark.sources.worddoc import (
    _CCP_TEXT_AT,
    make_doc_bytes,
    read_doc_paragraphs,
)

PARAS = ["Hello legacy Word", "café – naïve résumé ☃ snow", "", "last ¶"]


def test_doc_roundtrip_mixed_pieces():
    # default 7-char pieces: cp1252-safe chunks travel compressed,
    # unicode chunks travel UTF-16 — both offset rules in one file
    blob = make_doc_bytes(PARAS)
    assert read_doc_paragraphs(blob) == PARAS
    # 1-char pieces + stacked Prc blocks: every piece boundary and the
    # Clx property-block skip are load-bearing
    assert read_doc_paragraphs(make_doc_bytes(PARAS, piece_chars=1, prc_blocks=3)) == PARAS
    assert read_doc_paragraphs(make_doc_bytes([])) == []


def test_doc_word95_contiguous_shape():
    blob = make_doc_bytes(["simple", "word95 café"], word95=True)
    assert read_doc_paragraphs(blob) == ["simple", "word95 café"]


def test_doc_control_char_mapping():
    # 0x0B line break splits like a paragraph mark, 0x07 cell mark
    # becomes a tab, field/object placeholders drop (antiword/catdoc
    # convention)
    blob = make_doc_bytes(["a\x0bb", "c\x07d", "e\x13f\x14g\x15h"])
    assert read_doc_paragraphs(blob) == ["a", "b", "c\td", "efgh"]


def test_doc_ccptext_bounds_main_document():
    # text past ccpText (footnotes/headers in real files) must not leak
    # into the main-document paragraphs
    blob = bytearray(make_doc_bytes(["main text only", "tail"]))
    at = blob.find(struct.pack("<HH", 0xA5EC, 0x00C1))
    (ccp,) = struct.unpack("<I", blob[at + _CCP_TEXT_AT:at + _CCP_TEXT_AT + 4])
    struct.pack_into("<I", blob, at + _CCP_TEXT_AT, ccp - len("tail\r"))
    assert read_doc_paragraphs(bytes(blob)) == ["main text only"]


def test_doc_gates_and_errors():
    blob = bytearray(make_doc_bytes(["x"]))
    at = blob.find(struct.pack("<HH", 0xA5EC, 0x00C1))
    # encrypted flag raises with guidance
    (flags,) = struct.unpack("<H", blob[at + 10:at + 12])
    struct.pack_into("<H", blob, at + 10, flags | 0x0100)
    with pytest.raises(NotImplementedError, match="encrypted"):
        read_doc_paragraphs(bytes(blob))
    # fast-saved Word 95 raises with guidance
    blob95 = bytearray(make_doc_bytes(["x"], word95=True))
    at95 = blob95.find(struct.pack("<HH", 0xA5DC, 0x0065))
    struct.pack_into("<H", blob95, at95 + 10, 0x0004)
    with pytest.raises(NotImplementedError, match="fast-saved"):
        read_doc_paragraphs(bytes(blob95))
    # unknown wIdent and non-OLE2 are clean errors
    blobq = bytearray(make_doc_bytes(["x"]))
    atq = blobq.find(struct.pack("<HH", 0xA5EC, 0x00C1))
    struct.pack_into("<H", blobq, atq, 0x1234)
    with pytest.raises(ValueError, match="wIdent"):
        read_doc_paragraphs(bytes(blobq))
    with pytest.raises(ValueError, match="not a .doc"):
        read_doc_paragraphs(b"PK\x03\x04 nope")


def test_doc_volume_fuzz():
    """~200 random paragraph sets across piece sizes — offset math off
    by one anywhere shifts every later piece."""
    import random

    rng = random.Random(0xD0C)
    alphabet = "abcXYZ 0189éàüß€—☃中文ру"
    for trial in range(200):
        paras = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(0, 6))
        ]
        pc = rng.choice([1, 2, 3, 7, 64])
        blob = make_doc_bytes(paras, piece_chars=pc,
                              prc_blocks=rng.randint(0, 2))
        assert read_doc_paragraphs(blob) == paras, (trial, pc, paras)


def test_read_document_file_doc_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "memo.doc"
    p.write_bytes(make_doc_bytes(["alpha beta", "gamma café"]))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "alpha beta" in vals and "gamma café" in vals
