"""RTF text source (sources/rtf.py)."""

import pytest

from architxt_spark.sources.rtf import make_rtf_bytes, read_rtf_text

PARAS = ["Hello {braced} world", "café – naïve ☃ 中文", "", "tab\there"]


@pytest.mark.parametrize("unicode_escapes", [True, False])
def test_rtf_roundtrip_both_escape_flavors(unicode_escapes):
    blob = make_rtf_bytes(PARAS, unicode_escapes=unicode_escapes)
    assert read_rtf_text(blob) == PARAS


def test_rtf_wordpad_style_sample():
    """A hand-written Riched20/WordPad-shaped document: destination
    groups skipped, formatting words dropped, \\'hh + \\uN decoded,
    the control-word delimiting space eaten."""
    sample = (
        "{\\rtf1\\ansi\\ansicpg1252\\deff0\\nouicompat"
        "{\\fonttbl{\\f0\\fnil\\fcharset0 Calibri;}}\n"
        "{\\*\\generator Riched20 10.0;}\\viewkind4\\uc1\n"
        "\\pard\\sa200\\sl276\\slmult1\\f0\\fs22\\lang9 "
        "First paragraph with \\b bold\\b0  text and caf\\'e9.\\par\n"
        "Second\\tab column \\u8212?dash.\\par\n}"
    ).encode()
    assert read_rtf_text(sample) == [
        "First paragraph with bold text and café.",
        "Second\tcolumn —dash.",
    ]


def test_rtf_double_byte_codepage_and_negative_u():
    # consecutive \'hh escapes must buffer into one double-byte char;
    # negative \uN wraps mod 2^16
    blob = make_rtf_bytes(["日本語 test"], unicode_escapes=False, codepage=932)
    assert read_rtf_text(blob) == ["日本語 test"]
    assert read_rtf_text(b"{\\rtf1\\uc1 a\\u-24 ?b\\par}") == [
        "a" + chr(65536 - 24) + "b"
    ]


def test_rtf_skips_nontext_destinations():
    sample = (
        "{\\rtf1\\ansi{\\fonttbl{\\f0 Junk Font Name;}}"
        "{\\colortbl;\\red1\\green2\\blue3;}"
        "{\\info{\\author Secret Author;}}"
        "{\\header hidden header text\\par}"
        "{\\*\\unknowndest nobody reads this}"
        "visible\\par}"
    ).encode()
    assert read_rtf_text(sample) == ["visible"]


def test_rtf_errors():
    with pytest.raises(ValueError, match="not an RTF"):
        read_rtf_text(b"plain text, no header")


def test_rtf_volume_fuzz():
    import random

    rng = random.Random(0x47F)
    alphabet = "abcXYZ 0189éàüß€—☃中文{}\\"
    for trial in range(200):
        paras = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 30)))
            for _ in range(rng.randint(0, 5))
        ]
        blob = make_rtf_bytes(paras, unicode_escapes=rng.random() < 0.5)
        assert read_rtf_text(blob) == paras, (trial, paras)


def test_read_document_file_rtf_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    p = tmp_path / "note.rtf"
    p.write_bytes(make_rtf_bytes(["alpha beta", "gamma café"]))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "alpha beta" in vals and "gamma café" in vals


def test_rtf_bin_runs_skip_by_byte_count():
    # \binN is followed by N raw bytes that may contain { } \ — the
    # reader must skip them by count, not by scanning
    sample = b"{\\rtf1 a{\\pict\\bin5 \x7b\x7d\\\x00\xffjunk}b\\par}"
    assert read_rtf_text(sample) == ["ab"]
