"""Legacy PowerPoint binary .ppt source (sources/ppt.py)."""

import struct

import pytest

from architxt_spark.sources.ppt import make_ppt_bytes, read_ppt_slides

SLIDES = ["Title: café", "", "Body\nwith two lines", "中文 unicode ☃"]


def test_ppt_roundtrip_bytes_and_chars_atoms():
    blob = make_ppt_bytes(SLIDES)
    # both atom flavors present: latin-1-safe slides as TextBytesAtom,
    # the unicode slide as TextCharsAtom
    assert struct.pack("<HH", 0, 0x0FA8) in blob
    assert struct.pack("<HH", 0, 0x0FA0) in blob
    assert read_ppt_slides(blob) == SLIDES
    assert read_ppt_slides(make_ppt_bytes([])) == []


def test_ppt_gates_and_errors():
    with pytest.raises(ValueError, match="not a .ppt"):
        read_ppt_slides(b"PK\x03\x04 nope")
    # an encryption container anywhere in the tree gates loudly
    blob = bytearray(make_ppt_bytes(["x"]))
    at = blob.find(struct.pack("<HH", 0, 0x0FA8))
    struct.pack_into("<HH", blob, at, 0, 0x2F14)
    with pytest.raises(NotImplementedError, match="encrypted"):
        read_ppt_slides(bytes(blob))


def test_ppt_volume_fuzz():
    import random

    rng = random.Random(0x99707)
    alphabet = "abcXYZ 0189éàüß€—☃中文"
    for trial in range(150):
        slides = [
            "\n".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 20)))
                for _ in range(rng.randint(1, 3))
            ).rstrip("\n")
            for _ in range(rng.randint(0, 5))
        ]
        slides = [s.rstrip("\n") for s in slides]
        got = read_ppt_slides(make_ppt_bytes(slides))
        want = ["\n".join(p for p in s.split("\n")).rstrip("\n") for s in slides]
        assert got == want, (trial, slides, got)


def test_read_document_file_ppt_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "deck.ppt"
    p.write_bytes(make_ppt_bytes(["alpha beta", "gamma café"]))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "alpha beta" in vals and "gamma café" in vals
