"""Email sources: RFC 5322 ``.eml`` and Outlook ``.msg`` — pure stdlib.

Beyond-reference: mail archives are a staple corpus source (support
tickets, mailing lists, enterprise dumps), so the document loader
reads both interchange shapes:

- ``.eml``: stdlib ``email`` parsing with ``policy.default`` (header
  decoding, charset handling); the text is the Subject plus every
  ``text/plain`` leaf of the MIME tree in order (``text/html``-only
  mails fall back to a tag-stripped render of the first ``text/html``
  leaf).  Attachments and non-text parts drop.
- ``.msg``: an OLE2 compound file ([MS-OXMSG]) read through the same
  CFB walker as .xls/.doc/.ppt; top-level properties live in
  ``__substg1.0_TTTTSSSS`` streams — subject ``0037``, body ``1000``
  — with the type suffix selecting UTF-16LE (``001F``) vs ANSI
  (``001E``) encoding.  Encrypted/signed bodies (``RTF compressed``
  only, no plain body) raise with guidance.

Output is the paragraph-list shape: ``["Subject: …", body-para, …]``.
``read_mbox_messages`` splits RFC 4155 ``.mbox`` archives (mailing
lists, Unix spools) into per-message paragraph lists through the same
eml path, with mboxrd ``>From`` unquoting.  ``make_eml_bytes`` /
``make_msg_bytes`` / ``make_mbox_bytes`` are the fixture twins (real
MIME multiparts; a real two-stream OLE2 via ``_wrap_ole2_multi``).
"""

from __future__ import annotations

import re

from architxt_spark.sources.worddoc import _wrap_ole2_multi
from architxt_spark.sources.xls import _MAGIC, _cfb_stream


def _paragraphs(subject: str, body: str) -> list[str]:
    out = [f"Subject: {subject}"] if subject else []
    for line in body.replace("\r\n", "\n").replace("\r", "\n").split("\n"):
        out.append(line)
    while out and out[-1] == "":
        out.pop()
    return out


def read_eml_text(path_or_bytes, *, password: str = "") -> list[str]:
    """RFC 5322 ``.eml`` → ``["Subject: …", body lines…]``."""
    import email
    import email.policy

    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    msg = email.message_from_bytes(data, policy=email.policy.default)

    def part_text(part) -> str:
        try:
            return part.get_content()
        except (LookupError, UnicodeError, ValueError, KeyError):
            # real mail carries bogus charset labels and broken
            # transfer encodings; degrade to latin-1 over the raw
            # payload instead of crashing the whole ingest
            raw = part.get_payload(decode=True) or b""
            return raw.decode("latin-1", "replace")

    parts: list[str] = []
    html: list[str] = []
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if ctype == "text/plain" and part.get_content_disposition() != "attachment":
            parts.append(part_text(part))
        elif ctype == "text/html" and not html:
            html.append(part_text(part))
    if not parts and html:
        # tag-stripped fallback for html-only mail
        text = re.sub(r"<(script|style)\b.*?</\1>", " ", html[0],
                      flags=re.S | re.I)
        text = re.sub(r"<br\s*/?>|</p>", "\n", text, flags=re.I)
        text = re.sub(r"<[^>]+>", "", text)
        parts.append(text)
    return _paragraphs(str(msg.get("Subject", "")), "\n".join(parts))


def read_msg_text(path_or_bytes, *, password: str = "") -> list[str]:
    """Outlook ``.msg`` → ``["Subject: …", body lines…]``."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if data[:8] != _MAGIC:
        raise ValueError("not a .msg (no OLE2 container)")

    def prop(tag: str) -> str | None:
        for suffix, codec in (("001f", "utf-16-le"), ("001e", "cp1252")):
            try:
                raw = _cfb_stream(data, (f"__substg1.0_{tag}{suffix}",))
            except ValueError:
                continue
            # container writers may pad streams; text never ends in NULs
            return raw.decode(codec, errors="replace").rstrip("\x00")
        return None

    subject = prop("0037") or ""
    body = prop("1000")
    if body is None:
        try:  # PidTagRtfCompressed is PtypBinary (0102)
            _cfb_stream(data, ("__substg1.0_10090102",))
        except ValueError:
            body = ""
        else:
            raise NotImplementedError(
                ".msg with only an RTF-compressed body needs extract-msg; "
                "export as .eml"
            )
    return _paragraphs(subject, body)


def read_mbox_messages(path_or_bytes, *, password: str = "") -> list[list[str]]:
    """RFC 4155 ``mbox`` (the mailing-list/Unix-spool archive shape) →
    one ``read_eml_text`` paragraph list per message.

    Messages split on ``From `` envelope lines at line starts; body
    lines quoted by the writer (``>From``, the mboxrd convention that
    also covers mboxo's output) lose one ``>`` level.  A file that
    doesn't open with an envelope is not an mbox and raises."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    if not data.startswith(b"From "):
        raise ValueError("not an mbox (missing 'From ' envelope line)")
    out: list[list[str]] = []
    for chunk in re.split(rb"(?m)^From [^\n]*\n", data)[1:]:
        chunk = re.sub(rb"(?m)^>(>*From )", rb"\1", chunk)
        out.append(read_eml_text(chunk))
    return out


# ---------------------------------------------------------------------------
# fixture twins
# ---------------------------------------------------------------------------


def make_eml_bytes(
    subject: str, body: str, *, html_only: bool = False,
    attachment: bytes | None = None,
) -> bytes:
    """Real MIME mail: multipart with a text part (plain, or html-only
    for the fallback path) and an optional binary attachment."""
    import email.message
    import email.policy

    msg = email.message.EmailMessage(policy=email.policy.default)
    msg["From"] = "fixture@example.invalid"
    msg["To"] = "reader@example.invalid"
    msg["Subject"] = subject
    if html_only:
        paras = "".join(f"<p>{p}</p>" for p in body.split("\n"))
        msg.set_content(f"<html><body>{paras}</body></html>", subtype="html")
    else:
        msg.set_content(body)
    if attachment is not None:
        msg.add_attachment(
            attachment, maintype="application", subtype="octet-stream",
            filename="blob.bin",
        )
    return msg.as_bytes()


def make_msg_bytes(subject: str, body: str, *, ansi: bool = False) -> bytes:
    """Real [MS-OXMSG]-shaped OLE2: subject + body property streams in
    the selected encoding."""
    if ansi:
        streams = {
            "__substg1.0_0037001E": subject.encode("cp1252", "replace"),
            "__substg1.0_1000001E": body.encode("cp1252", "replace"),
        }
    else:
        streams = {
            "__substg1.0_0037001F": subject.encode("utf-16-le"),
            "__substg1.0_1000001F": body.encode("utf-16-le"),
        }
    return _wrap_ole2_multi(streams)


def make_mbox_bytes(messages: list[tuple[str, str]]) -> bytes:
    """A real mbox: each (subject, body) becomes a ``make_eml_bytes``
    message behind a ``From `` envelope, with mboxrd ``>From``
    quoting applied to body lines so the reader's unquoting is
    load-bearing."""
    out = bytearray()
    for subject, body in messages:
        raw = make_eml_bytes(subject, body)
        raw = re.sub(rb"(?m)^(>*From )", rb">\1", raw)
        out.extend(b"From fixture@example.invalid Thu Jan  1 00:00:00 1998\n")
        out.extend(raw.rstrip(b"\n") + b"\n\n")
    return bytes(out)
