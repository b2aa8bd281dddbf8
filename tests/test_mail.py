"""Mail sources (sources/mail.py): .eml and Outlook .msg."""

import pytest

from architxt_spark.sources.mail import (
    make_eml_bytes,
    make_msg_bytes,
    read_eml_text,
    read_msg_text,
)


def test_eml_plain_with_attachment():
    blob = make_eml_bytes(
        "Quarterly café report ☃", "Line one.\nLine two – done.",
        attachment=b"\x00\x01binary",
    )
    assert read_eml_text(blob) == [
        "Subject: Quarterly café report ☃", "Line one.", "Line two – done.",
    ]


def test_eml_html_only_fallback():
    blob = make_eml_bytes("HTML only", "Para one\nPara two", html_only=True)
    assert read_eml_text(blob) == ["Subject: HTML only", "Para one", "Para two"]


def test_eml_encoded_headers_and_quoted_printable():
    raw = (
        b"From: a@example.invalid\r\n"
        b"Subject: =?utf-8?b?Q2Fmw6kgdGltZQ==?=\r\n"
        b"Content-Type: text/plain; charset=utf-8\r\n"
        b"Content-Transfer-Encoding: quoted-printable\r\n\r\n"
        b"na=C3=AFve body\r\n"
    )
    assert read_eml_text(raw) == ["Subject: Café time", "naïve body"]


@pytest.mark.parametrize("ansi", [False, True])
def test_msg_roundtrip_both_encodings(ansi):
    blob = make_msg_bytes("Msg subject café", "Body A\r\nBody B", ansi=ansi)
    assert read_msg_text(blob) == ["Subject: Msg subject café", "Body A", "Body B"]


def test_msg_errors_and_rtf_gate():
    with pytest.raises(ValueError, match="not a .msg"):
        read_msg_text(b"plain bytes")
    from architxt_spark.sources.worddoc import _wrap_ole2_multi

    rtf_only = _wrap_ole2_multi(
        {"__substg1.0_10090102": b"\x01\x02compressed rtf"}
    )
    with pytest.raises(NotImplementedError, match="RTF-compressed"):
        read_msg_text(rtf_only)
    # no body stream at all: subject-only mail, empty body
    subj_only = _wrap_ole2_multi(
        {"__substg1.0_0037001F": "just subject".encode("utf-16-le")}
    )
    assert read_msg_text(subj_only) == ["Subject: just subject"]


def test_read_document_file_mail_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file

    pe = tmp_path / "m.eml"
    pe.write_bytes(make_eml_bytes("eml subject", "eml body café"))
    pm = tmp_path / "m.msg"
    pm.write_bytes(make_msg_bytes("msg subject", "msg body café"))
    for p, needle in ((pe, "eml body café"), (pm, "msg body café")):
        nodes = read_document_file(spark, str(p))
        vals = {
            r.leaf_value for r in nodes.filter("leaf_value is not null").collect()
        }
        assert needle in vals, (p, vals)


# --- r14: mbox archives ---


def test_mbox_roundtrip_and_from_quoting():
    from architxt_spark.sources.mail import make_mbox_bytes, read_mbox_messages

    msgs = [
        ("first", "hello\nworld"),
        # a body line starting 'From ' must survive the envelope split
        # via mboxrd quoting
        ("second", "From the archives\nmore text"),
        ("third", ">From quoted already\nend"),
    ]
    got = read_mbox_messages(make_mbox_bytes(msgs))
    assert len(got) == 3
    assert got[0] == ["Subject: first", "hello", "world"]
    assert got[1] == ["Subject: second", "From the archives", "more text"]
    assert got[2] == ["Subject: third", ">From quoted already", "end"]


def test_mbox_not_an_mbox_raises():
    import pytest

    from architxt_spark.sources.mail import read_mbox_messages

    with pytest.raises(ValueError, match="envelope"):
        read_mbox_messages(b"To: someone\n\nnot an mbox")


def test_read_document_file_mbox_end_to_end(spark, tmp_path):
    from architxt_spark.sources.documents import read_document_file
    from architxt_spark.sources.mail import make_mbox_bytes

    p = tmp_path / "list.mbox"
    p.write_bytes(make_mbox_bytes([("alpha", "one"), ("beta", "two lines\nhere")]))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert {"Subject: alpha", "one", "two lines"} <= vals


def test_mbox_corruption_never_crashes_unexpectedly():
    import random

    from architxt_spark.sources.mail import make_mbox_bytes, read_mbox_messages

    rng = random.Random(11)
    base = bytearray(make_mbox_bytes([("s1", "body one"), ("s2", "body two")]))
    for trial in range(200):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: rng.randrange(len(blob) + 1)]
        for _ in range(rng.randrange(3)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            read_mbox_messages(bytes(blob))
        except (ValueError, NotImplementedError):
            pass
