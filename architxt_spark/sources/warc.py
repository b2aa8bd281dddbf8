"""WARC source: CommonCrawl-style web-archive ingestion.

Beyond-reference component (the reference loads relational/graph/document
stores; a 100-TB pretraining corpus starts life as WARC files on object
storage).  Everything here is stdlib — WARC/1.0 is line-oriented headers
+ a ``Content-Length``-delimited body per record, and ``.warc.gz`` files
are concatenated gzip members which :func:`gzip.decompress` inflates in
one call.

Scale design:

- **Partition = file.** WARC is not splittable mid-stream (gzip members
  are per-record but offsets need the index file), so the unit of
  parallelism is the archive file — exactly how CommonCrawl ships
  (~1 GB per file, ~64k files per crawl ⇒ plenty of tasks for 1000
  executors).  We read with Spark's ``binaryFile`` source and parse per
  file inside ``mapInPandas`` (Arrow boundary, no row-at-a-time UDF).
- **Projection early.** Record filtering (``record_types``) and the
  HTML→text strip happen inside the parser, so only the rows and columns
  a query needs cross the Arrow boundary; downstream curation
  (:mod:`~architxt_spark.functions.curation`) composes directly.
- **The splittable path** (a custom Hadoop InputFormat over uncompressed
  WARC, or offset indexes for range requests) is deliberately out of
  scope here; at CommonCrawl file counts the per-file layout already
  saturates any cluster.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession

#: output schema of :func:`read_warc`
WARC_SCHEMA = (
    "path string, record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "payload binary, text string"
)

_CRLF = b"\r\n"


def parse_warc(data: bytes) -> Iterator[dict[str, Any]]:
    """Parse one WARC stream (already decompressed) into record dicts:
    version line, header block, ``Content-Length`` body, blank-line
    separators.  Tolerant of trailing garbage — parsing stops at the
    first malformed record boundary rather than raising."""
    buf = io.BytesIO(data)
    while True:
        # skip record separators / leading blank lines
        line = buf.readline()
        while line in (_CRLF, b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # trailing garbage: stop cleanly
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (_CRLF, b"\n", b""):
                break
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            return
        body = buf.read(length)
        if len(body) < length:
            return  # truncated record
        yield {
            "record_id": headers.get("warc-record-id", ""),
            "warc_type": headers.get("warc-type", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "body": body,
        }


def split_http_response(body: bytes) -> tuple[int | None, str, bytes]:
    """Split a ``response`` record body (an HTTP message) into
    ``(status, content_type, payload)``; non-HTTP bodies pass through
    with ``status=None``."""
    if not body.startswith(b"HTTP/"):
        return None, "", body
    head, sep, payload = body.partition(b"\r\n\r\n")
    if not sep:
        head, sep, payload = body.partition(b"\n\n")
    status: int | None = None
    ctype = ""
    lines = head.split(b"\n")
    first = lines[0].split()
    if len(first) >= 2 and first[1].isdigit():
        status = int(first[1])
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            if k.strip().lower() == b"content-type":
                ctype = v.decode("utf-8", "replace").strip()
    return status, ctype, payload


_NONTEXT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>|<!--.*?-->")
#: block-level boundaries become line breaks, so the downstream C4 line
#: filter sees one line per paragraph/heading/list item — matching what
#: real extraction pipelines feed it.
_BLOCK_TAG_RE = re.compile(
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|blockquote)\b[^>]*>"
)
_TAG_RE = re.compile(r"<[^>]+>")


def html_to_text(payload: bytes) -> str:
    """Heuristic HTML→text: drop script/style/comments, turn block-tag
    boundaries into line breaks, strip remaining tags, unescape the
    common entities, collapse blank runs.  A deliberate stdlib heuristic
    (the trafilatura-class extractors are environment-gated deps); the
    C4 line filter downstream is designed to eat what this leaves."""
    text = _NONTEXT_RE.sub(" ", payload.decode("utf-8", "replace"))
    text = _BLOCK_TAG_RE.sub("\n", text)
    text = _TAG_RE.sub(" ", text)
    for ent, ch in (("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
                    ("&quot;", '"'), ("&#39;", "'"), ("&nbsp;", " ")):
        text = text.replace(ent, ch)
    lines = [re.sub(r"[ \t]+", " ", ln).strip() for ln in text.splitlines()]
    return "\n".join(ln for ln in lines if ln)


def _records_for_file(
    path: str, data: bytes, record_types: tuple[str, ...], extract_text: bool
) -> Iterator[dict[str, Any]]:
    if path.endswith(".gz"):
        data = gzip.decompress(data)  # multi-member streams inflate whole
    for rec in parse_warc(data):
        if record_types and rec["warc_type"] not in record_types:
            continue
        status, ctype, payload = (
            split_http_response(rec["body"])
            if rec["warc_type"] == "response"
            else (None, rec["content_type"], rec["body"])
        )
        is_texty = "html" in ctype or ctype.startswith("text/")
        yield {
            "path": path,
            "record_id": rec["record_id"],
            "warc_type": rec["warc_type"],
            "target_uri": rec["target_uri"],
            "warc_date": rec["warc_date"],
            "content_type": ctype,
            "http_status": status,
            "payload": payload,
            "text": html_to_text(payload) if (extract_text and is_texty) else "",
        }


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] = ("response",),
    extract_text: bool = True,
) -> DataFrame:
    """Read WARC/WARC.gz archives under ``path`` into a DataFrame (one
    row per selected record).  ``record_types=()`` keeps every record
    (warcinfo/request/metadata included); ``extract_text`` adds the
    stripped-HTML ``text`` column for text/HTML payloads."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                out
                for p, c in zip(pdf["path"], pdf["content"])
                for out in _records_for_file(p, bytes(c), record_types, extract_text)
            ]
            yield pd.DataFrame(
                rows,
                columns=[
                    "path", "record_id", "warc_type", "target_uri", "warc_date",
                    "content_type", "http_status", "payload", "text",
                ],
            )

    return files.mapInPandas(parse, WARC_SCHEMA)


def build_warc(records: list[dict[str, Any]]) -> bytes:
    """Serialize record dicts into WARC/1.0 bytes — the fixture writer
    tests and examples use (``warc_type``, ``target_uri``, ``payload``,
    optional ``http_status``/``content_type``/``record_id``/``date``)."""
    out = io.BytesIO()
    for i, r in enumerate(records):
        if r.get("warc_type", "response") == "response":
            status = r.get("http_status", 200)
            ctype = r.get("content_type", "text/html")
            body = (
                f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n\r\n".encode()
                + r["payload"]
            )
        else:
            body = r["payload"]
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r.get("warc_type", "response").encode(),
            b"WARC-Record-ID: " + r.get("record_id", f"<urn:uuid:rec-{i}>").encode(),
            b"WARC-Date: " + r.get("date", "2026-01-01T00:00:00Z").encode(),
            b"WARC-Target-URI: " + r.get("target_uri", "").encode(),
            b"Content-Length: " + str(len(body)).encode(),
        ]
        out.write(_CRLF.join(headers) + _CRLF + _CRLF + body + _CRLF + _CRLF)
    return out.getvalue()
