"""HTML / Markdown / EPUB text sources — pure stdlib.

Beyond-reference: the formats a scraped or exported corpus actually
arrives in.  ``read_html_paragraphs`` drives stdlib ``html.parser``
(entity decoding for free): ``script``/``style``/``template``/
``noscript`` subtrees drop, block-level close tags (``p``, ``div``,
``li``, ``h1``-``h6``, ``tr``, ``br``, …) end paragraphs, everything
else concatenates — the same text layer the C4/Gopher pipelines clean
downstream.  ``read_markdown_paragraphs`` is a light text reader:
blank-line paragraph splits, ATX ``#`` headers kept as text, fenced
code blocks kept verbatim, link targets stripped to their labels.
``read_epub_chapters`` opens the zip, follows ``META-INF/
container.xml`` → the OPF manifest/spine for CHAPTER ORDER (falling
back to sorted xhtml members when the package is sloppy), and runs
each chapter through the HTML reader — one newline-joined string per
chapter.
"""

from __future__ import annotations

import io
import posixpath
import re
import zipfile
from html.parser import HTMLParser
from xml.etree import ElementTree as ET

_BLOCK_TAGS = frozenset({
    "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "br",
    "section", "article", "blockquote", "pre", "table", "ul", "ol",
    "dd", "dt", "figcaption",
})
# head metadata and code: never document text
_SKIP_TAGS = frozenset({"script", "style", "template", "noscript", "title"})


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = [""]
        self._skip = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag == "br" and not self._skip:
            self.parts.append("")

    def handle_startendtag(self, tag, attrs):
        if tag == "br" and not self._skip:
            self.parts.append("")

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip = max(0, self._skip - 1)
        elif tag in _BLOCK_TAGS and not self._skip:
            self.parts.append("")

    def handle_data(self, data):
        if not self._skip:
            self.parts[-1] += data


def _html_to_paragraphs(text: str) -> list[str]:
    p = _TextExtractor()
    p.feed(text)
    p.close()
    out = []
    for chunk in p.parts:
        chunk = re.sub(r"\s+", " ", chunk).strip()
        if chunk:
            out.append(chunk)
    return out


def read_html_paragraphs(path_or_bytes, *, password: str = "") -> list[str]:
    """HTML → block-level paragraph list (entities decoded,
    script/style dropped, whitespace normalized)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    m = re.search(rb'charset=["\']?([A-Za-z0-9_-]+)', data[:2048])
    codec = m.group(1).decode("ascii", "replace") if m else "utf-8"
    try:
        text = data.decode(codec, errors="replace")
    except LookupError:
        text = data.decode("utf-8", errors="replace")
    return _html_to_paragraphs(text)


def read_markdown_paragraphs(path_or_bytes, *, password: str = "") -> list[str]:
    """Markdown → paragraph list: blank-line splits, headers kept as
    text, inline links reduced to their labels, emphasis markers kept
    (they are content at the token level)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        text = bytes(path_or_bytes).decode("utf-8", errors="replace")
    else:
        with open(path_or_bytes, encoding="utf-8", errors="replace") as f:
            text = f.read()
    text = re.sub(r"!?\[([^\]]*)\]\([^)]*\)", r"\1", text)  # links/images
    out = []
    for block in re.split(r"\n\s*\n", text):
        block = "\n".join(
            line.lstrip("#").strip() if line.lstrip().startswith("#")
            else line.rstrip()
            for line in block.split("\n")
        ).strip()
        if block:
            out.append(block)
    return out


def read_epub_chapters(path_or_bytes, *, password: str = "") -> list[str]:
    """EPUB → one newline-joined text per chapter, in spine order."""
    src = (
        io.BytesIO(path_or_bytes)
        if isinstance(path_or_bytes, (bytes, bytearray))
        else path_or_bytes
    )
    try:
        z = zipfile.ZipFile(src)
    except zipfile.BadZipFile as e:
        raise ValueError("not an .epub (not a zip)") from e
    with z:
        names = set(z.namelist())
        chapters: list[str] = []
        try:
            container = ET.fromstring(z.read("META-INF/container.xml"))
            opf_path = next(
                el.attrib["full-path"]
                for el in container.iter()
                if el.tag.rsplit("}", 1)[-1] == "rootfile"
            )
            opf = ET.fromstring(z.read(opf_path))
            base = posixpath.dirname(opf_path)
            hrefs = {}
            for el in opf.iter():
                if el.tag.rsplit("}", 1)[-1] == "item":
                    hrefs[el.attrib.get("id")] = el.attrib.get("href")
            for el in opf.iter():
                if el.tag.rsplit("}", 1)[-1] == "itemref":
                    href = hrefs.get(el.attrib.get("idref"))
                    if not href:
                        continue
                    member = posixpath.normpath(posixpath.join(base, href))
                    if member in names:
                        chapters.append(member)
        except (KeyError, StopIteration, ET.ParseError):
            # sloppy package: every xhtml member, name-sorted
            chapters = sorted(
                n for n in names if n.endswith((".xhtml", ".html", ".htm"))
            )
        if not chapters:
            raise ValueError(".epub without any spine/xhtml chapters")
        return [
            "\n".join(_html_to_paragraphs(z.read(c).decode("utf-8", "replace")))
            for c in chapters
        ]


# ---------------------------------------------------------------------------
# fixture twin (epub; html/md fixtures are just text)
# ---------------------------------------------------------------------------


def make_epub_bytes(chapters: list[str], *, sloppy: bool = False) -> bytes:
    """``["chapter text", ...]`` → a real EPUB zip.  Proper
    container.xml → OPF → spine wiring by default (chapters named in
    REVERSE so the spine order is load-bearing); ``sloppy=True`` omits
    the OPF to drive the fallback path."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        n = len(chapters)
        files = [f"OEBPS/ch{n - i:03d}.xhtml" for i in range(n)]
        for path, text in zip(files, chapters):
            paras = "".join(
                f"<p>{ln}</p>" for ln in (text.split("\n") if text else [""])
            )
            z.writestr(
                path,
                "<html><head><title>t</title>"
                "<script>ignore me</script></head>"
                f"<body>{paras}</body></html>",
            )
        if not sloppy:
            z.writestr(
                "META-INF/container.xml",
                '<?xml version="1.0"?>'
                '<container xmlns="urn:oasis:names:tc:opendocument:xmlns:container">'
                '<rootfiles><rootfile full-path="OEBPS/content.opf" '
                'media-type="application/oebps-package+xml"/></rootfiles>'
                "</container>",
            )
            items = "".join(
                f'<item id="c{i}" href="{posixpath.basename(p)}" '
                'media-type="application/xhtml+xml"/>'
                for i, p in enumerate(files)
            )
            refs = "".join(f'<itemref idref="c{i}"/>' for i in range(n))
            z.writestr(
                "OEBPS/content.opf",
                '<package xmlns="http://www.idpf.org/2007/opf" version="3.0">'
                f"<manifest>{items}</manifest><spine>{refs}</spine></package>",
            )
    return buf.getvalue()
