"""Nested-document → meta-model loader.

Mirrors ``architxt/database/loader/documents.py``:

- ``read_tree`` (:: ``documents.py:104-139``): dict → group, list → COLL,
  non-empty scalar → ``ENT::key``; names lowercased with spaces→underscores;
  a single-collection child is flattened.
- ``parse_document_tree`` (``documents.py:141-163``): a COLL root splits into
  one tree per element.
- ``traverse_tree`` (``documents.py:166-220``): entities grouped under
  ``GROUP::<name>``; nested dicts become ``REL::parent<->child``; list
  children produce one REL per element; nested-ROOT relations splice up.

Two surfaces:

- :func:`read_document_value` — driver-side: one python value → forest of
  :class:`~architxt_spark.trees.PyTree` (tests / small files, and the exact
  reference semantics in one place).
- :func:`read_documents_df` — distributed: a DataFrame with a JSON column is
  converted per-partition with ``mapInPandas`` (documents are small; the
  per-document recursion is the idiomatic UDF case — parallelism comes from
  document partitioning, exactly like the reference's per-file loop but
  scaled horizontally).

For flat Spark DataFrames (e.g. parquet rows), ``row_trees`` tree-ifies each
row schema-driven with zero UDFs.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from architxt_spark.model import NODE_SCHEMA, NodeType
from architxt_spark.trees import PyTree, tree_to_rows


def _norm(name: str) -> str:
    return str(name).replace(" ", "_").lower()


def _read_tree(data: Any, root_name: str = "ROOT") -> PyTree:
    """``read_tree`` (``documents.py:104-139``)."""
    root_name = _norm(root_name)
    items = data.items() if isinstance(data, dict) else ((root_name, x) for x in data)

    children: list[PyTree] = []
    for name, sub in items:
        if isinstance(sub, (dict, list)):
            children.append(_read_tree(sub, root_name=name))
        elif sub is not None and str(sub) != "":
            children.append(PyTree(f"{NodeType.ENT}::{_norm(name)}", [str(sub)]))

    if len(children) == 1 and children[0].node_type == NodeType.COLL:
        return children[0]

    label = f"{NodeType.COLL}::{root_name}" if isinstance(data, list) else root_name
    return PyTree(label, list(children))


def _traverse(tree: PyTree) -> tuple[PyTree, PyTree]:
    """``traverse_tree`` (``documents.py:166-220``): returns (anchor group,
    transformed tree)."""
    if tree.node_type == NodeType.ENT:
        group = PyTree(f"{NodeType.GROUP}::{tree.node_name}", [tree])
        return group, group

    if tree.node_type == NodeType.COLL:
        updated = [_traverse(c)[0] for c in tree.children if isinstance(c, PyTree)]
        coll = PyTree(tree.label, list(updated))
        return coll, coll

    entities = [c for c in tree.children if isinstance(c, PyTree) and c.node_type == NodeType.ENT]
    non_entities = [c for c in tree.children if isinstance(c, PyTree) and c.node_type != NodeType.ENT]

    group_name = tree.node_name
    group = PyTree(f"{NodeType.GROUP}::{group_name}", list(entities))

    relations: list[PyTree] = []
    for child in non_entities:
        child_group, child_tree = _traverse(child)
        if child_tree.label == "ROOT":
            relations.extend(c for c in child_tree.children if isinstance(c, PyTree))
        members = (
            [c for c in child_group.children if isinstance(c, PyTree)]
            if child_group.node_type == NodeType.COLL
            else [child_group]
        )
        for el in members:
            el_name = el.node_name
            relations.append(
                PyTree(f"{NodeType.REL}::{group_name}<->{el_name}", [group, el])
            )

    if relations:
        return group, PyTree("ROOT", list(relations))
    return group, group


def parse_document_forest(tree: PyTree) -> list[PyTree]:
    """``parse_document_tree`` (``documents.py:141-163``): a COLL root splits
    into one normalized tree per element."""
    elements = (
        [c for c in tree.children if isinstance(c, PyTree)]
        if tree.node_type == NodeType.COLL
        else [tree]
    )
    out = []
    for el in elements:
        _, parsed = _traverse(el)
        if parsed.children:
            out.append(parsed)
    return out


def read_document_value(data: Any, *, root_name: str = "ROOT", raw_read: bool = False) -> list[PyTree]:
    """One parsed document value → normalized forest
    (``read_document``, ``documents.py:32-101``)."""
    tree = _read_tree(data, root_name=root_name)
    if raw_read:
        return [tree]
    return parse_document_forest(tree)


def read_documents_df(
    df: DataFrame,
    json_col: str,
    id_col: str,
    *,
    root_name: str = "ROOT",
    raw_read: bool = False,
) -> DataFrame:
    """Distributed document loader: each row's ``json_col`` string is parsed
    and normalized per-partition; tree ids derive from ``id_col``."""
    import pandas as pd

    src = df.select(F.col(id_col).cast("string").alias("_id"), F.col(json_col).alias("_json"))

    def convert(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in NODE_SCHEMA.fields]
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for _id, payload in zip(pdf["_id"], pdf["_json"]):
                if payload is None:
                    continue
                forest = read_document_value(json.loads(payload), root_name=root_name, raw_read=raw_read)
                for i, tree in enumerate(forest):
                    rows.extend(tree_to_rows(tree, f"{_id}.{i}" if len(forest) > 1 else str(_id)))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(convert, NODE_SCHEMA)


def _xlsx_col_index(cell_ref: str) -> int:
    """'B7' → 1 (zero-based column index from the letter prefix)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _read_xlsx_stdlib(path: str, password: str = "") -> dict[str, list[dict[str, str]]]:
    """Read-only ``.xlsx`` parser on stdlib ``zipfile`` + ``ElementTree``:
    sheet name → list of row records (first row = header), every value a
    string (the meta-model's value domain — same shape as the reference's
    ``pandas.read_excel(dtype=str).to_dict('records')``,
    ``loader/documents.py:22-29``).  Handles shared strings, inline
    strings, booleans, and sparse rows (missing cells are absent keys)."""
    import xml.etree.ElementTree as ET
    import zipfile

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    from architxt_spark.sources.office import _ooxml_source

    with zipfile.ZipFile(_ooxml_source(path, password)) as z:
        names = set(z.namelist())

        # shared strings table (absent when the workbook has none)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")):
                # <si> holds one <t> or rich-text runs of <r><t>…
                shared.append(
                    "".join(t.text or "" for t in si.iter() if local(t.tag) == "t")
                )

        # workbook sheet names → relationship ids → sheet part targets
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_target = {
            rel.get("Id"): rel.get("Target") for rel in rels if rel.get("Id")
        }
        rid_attr = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

        out: dict[str, list[dict[str, str]]] = {}
        for sheet in wb.iter():
            if local(sheet.tag) != "sheet":
                continue
            target = rid_target.get(sheet.get(rid_attr), "")
            part = target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"
            if part not in names:
                continue

            rows: list[dict[int, str]] = []
            for row in ET.fromstring(z.read(part)).iter():
                if local(row.tag) != "row":
                    continue
                cells: dict[int, str] = {}
                next_idx = 0  # implicit position for writers that omit r=
                for c in row:
                    if local(c.tag) != "c":
                        continue
                    ref = c.get("r") or ""
                    ctype = c.get("t", "n")
                    v = None
                    for child in c:
                        if local(child.tag) == "v":
                            v = child.text
                        elif local(child.tag) == "is":  # inline string
                            v = "".join(
                                t.text or "" for t in child.iter() if local(t.tag) == "t"
                            )
                    idx = _xlsx_col_index(ref) if ref else next_idx
                    next_idx = idx + 1
                    if v is None:
                        continue
                    if ctype == "s":
                        v = shared[int(v)]
                    elif ctype == "b":
                        v = str(v in ("1", "true", "TRUE"))
                    cells[idx] = v
                if cells:
                    rows.append(cells)

            if not rows:
                out[sheet.get("name", part)] = []
                continue
            header_cells, body = rows[0], rows[1:]
            header = {i: name for i, name in header_cells.items()}
            out[sheet.get("name", part)] = [
                {header[i]: v for i, v in r.items() if i in header} for r in body
            ]
        return out


#: extensions read_document_file dispatches on (archive members outside
#: this set are skipped, counted, and reported — never silently eaten)
_DOCUMENT_EXTS = frozenset((
    ".json", ".jsonl", ".csv", ".tsv", ".toml", ".xml", ".yaml", ".yml",
    ".xlsx", ".xls", ".ods", ".doc", ".dbf", ".wk1", ".wks", ".wk3",
    ".wk4", ".html", ".htm", ".md", ".markdown", ".epub", ".eml",
    ".msg", ".mbox", ".rtf", ".ppt", ".docx", ".odt", ".pptx", ".odp",
    ".pdf", ".slk",
))

_ARCHIVE_SUFFIXES = (".zip", ".tar", ".tar.gz", ".tgz", ".tar.xz",
                     ".tar.bz2")


def read_document_archive(
    spark,
    path: str,
    *,
    root_name: str = "ROOT",
    raw_read: bool = False,
    sample: int = 0,
    password: str = "",
) -> DataFrame:
    """A zip/tar archive of mixed documents → one node frame (the union
    of every member :func:`read_document_file` can parse) — the shape
    document dumps actually arrive in.

    Members whose extension no reader claims (images, READMEs) are
    skipped; an archive with NO readable member raises and names what
    it saw.  A corrupt member of a supported format still raises loudly
    — skipping is by extension, never by swallowing parse errors.
    Members extract under fresh indexed names, so same-named files in
    different directories keep distinct tree keys."""
    import os
    import tarfile
    import tempfile
    import zipfile

    members: list[tuple[str, bytes]] = []
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            for info in zf.infolist():
                if not info.is_dir():
                    members.append((info.filename, zf.read(info)))
    else:
        with tarfile.open(path) as tf:
            for m in tf.getmembers():
                if m.isfile():
                    members.append((m.name, tf.extractfile(m).read()))

    tmp = tempfile.mkdtemp(prefix="architxt_archive_")
    frames = []
    skipped: list[str] = []
    for i, (name, blob) in enumerate(members):
        base = os.path.basename(name)
        ext = os.path.splitext(base)[1].lower()
        if ext in (".gz", ".bz2", ".xz", ".z"):
            inner = os.path.splitext(base[: -len(ext)])[1].lower()
            readable = inner in _DOCUMENT_EXTS
        else:
            readable = ext in _DOCUMENT_EXTS
        if not readable:
            skipped.append(name)
            continue
        target = os.path.join(tmp, f"m{i}_{base}")
        with open(target, "wb") as f:
            f.write(blob)
        frames.append(
            read_document_file(
                spark, target, root_name=root_name, raw_read=raw_read,
                sample=sample, password=password,
            )
        )
    if not frames:
        raise ValueError(
            f"no readable documents in {os.path.basename(path)} "
            f"({len(members)} members, e.g. {[n for n in skipped[:5]]})"
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def read_document_file(
    spark,
    path: str,
    *,
    root_name: str = "ROOT",
    raw_read: bool = False,
    sample: int = 0,
    password: str = "",
) -> DataFrame:
    """File-format parser chain (``read_document``,
    ``loader/documents.py:22-29,32-101``): JSON / JSONL / CSV / XML / TOML
    (stdlib) and YAML (import-gated — not in this container) parsed driver
    side — single documents are file-sized; the DISTRIBUTED path for
    corpora is :func:`read_documents_df` over a string column.  Returns
    node rows."""
    import os

    from architxt_spark.trees import forest_from_trees

    if path.lower().endswith(_ARCHIVE_SUFFIXES):
        return read_document_archive(
            spark, path, root_name=root_name, raw_read=raw_read,
            sample=sample, password=password,
        )
    ext = os.path.splitext(path)[1].lower()
    if ext in (".gz", ".bz2", ".xz", ".z"):
        # singly-compressed documents (report.pdf.gz, data.csv.Z — the
        # shape corpus dumps individually compress files in): unwrap
        # and dispatch on the inner extension.  .Z decodes through the
        # in-repo compress(1) LZW (sources/zcompress.py).
        import tempfile

        stem = os.path.basename(path)[: -len(ext)]
        inner_ext = os.path.splitext(stem)[1].lower()
        if inner_ext not in _DOCUMENT_EXTS:
            raise ValueError(
                f"compressed file {os.path.basename(path)} wraps no "
                f"readable document extension ({inner_ext or 'none'})"
            )
        with open(path, "rb") as f:
            blob = f.read()
        if ext == ".gz":
            import gzip

            blob = gzip.decompress(blob)
        elif ext == ".bz2":
            import bz2

            blob = bz2.decompress(blob)
        elif ext == ".xz":
            import lzma

            blob = lzma.decompress(blob)
        else:
            from architxt_spark.sources.zcompress import z_decompress

            blob = z_decompress(blob)
        tmp = tempfile.mkdtemp(prefix="architxt_unwrap_")
        target = os.path.join(tmp, stem)
        with open(target, "wb") as f:
            f.write(blob)
        return read_document_file(
            spark, target, root_name=root_name, raw_read=raw_read,
            sample=sample, password=password,
        )
    if ext == ".json":
        with open(path) as f:
            data = json.load(f)
    elif ext == ".jsonl":
        with open(path) as f:
            data = [json.loads(line) for line in f if line.strip()]
    elif ext in (".csv", ".tsv"):
        import csv

        with open(path, newline="") as f:
            head = f.read(64 * 1024)
            f.seek(0)
            if ext == ".tsv":
                delim = "\t"
            else:
                # European exports ship ';' (and tab) under the .csv
                # name constantly; sniff over the usual suspects with a
                # comma fallback so plain files are untouched
                try:
                    delim = csv.Sniffer().sniff(head, ",;\t|").delimiter
                except csv.Error:
                    delim = ","
            data = list(csv.DictReader(f, delimiter=delim))
    elif ext == ".toml":
        import tomllib

        with open(path, "rb") as f:
            data = tomllib.load(f)
    elif ext == ".xml":
        import xml.etree.ElementTree as ET

        def to_value(el):
            kids = list(el)
            if not kids:
                return el.text.strip() if el.text and el.text.strip() else ""
            out: dict = {}
            for k in kids:
                v = to_value(k)
                if k.tag in out:
                    if not isinstance(out[k.tag], list):
                        out[k.tag] = [out[k.tag]]
                    out[k.tag].append(v)
                else:
                    out[k.tag] = v
            return out

        root = ET.parse(path).getroot()
        data = {root.tag: to_value(root)}
    elif ext in (".yaml", ".yml"):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError as e:  # pragma: no cover - env without pyyaml
            raise NotImplementedError("YAML documents need pyyaml (not in this environment)") from e
        with open(path) as f:
            data = yaml.safe_load(f)
    elif ext == ".xlsx":
        # Reference parses Excel via pandas (``loader/documents.py:22-29``);
        # one record dict per row, sheet name as the root key.  xlsx is a
        # zip of XML, so read-only cell extraction needs no openpyxl —
        # stdlib zipfile + ElementTree (sharedStrings + sheetData walk).
        data = _read_xlsx_stdlib(path, password)
    elif ext == ".xls":
        # legacy binary BIFF reads with the stdlib (OLE2 FAT/mini-FAT/
        # DIFAT-chained containers + record walk + CONTINUE-aware SST;
        # BIFF5 codepage strings, pre-OLE2 BIFF2-4 raw streams, and
        # RC4-encrypted workbooks incl. the VelvetSweatshop default,
        # and r14 XOR method-0 obfuscation, ``sources/xls.py``); only
        # encrypted pre-BIFF5 workbooks still raise with xlrd guidance
        from architxt_spark.sources.xls import _read_xls_stdlib

        data = _read_xls_stdlib(path, password=password or None)
    elif ext == ".ods":
        # OpenDocument spreadsheets take the xlsx record shape through
        # the ODF table walk (``sources/office.py``); encrypted members
        # decrypt via the same manifest path as .odt
        from architxt_spark.sources.office import read_ods_sheets

        data = read_ods_sheets(path, password=password)
    elif ext == ".doc":
        # legacy Word binary (r14, beyond-reference): FIB + piece-table
        # text extraction, Word 97-2003 and simple Word 6/95
        # (``sources/worddoc.py``) → one record per paragraph
        from architxt_spark.sources.worddoc import read_doc_paragraphs

        data = [
            {"idx": str(i), "text": p}
            for i, p in enumerate(read_doc_paragraphs(path))
        ]
    elif ext == ".dbf":
        # dBASE tables (r14, beyond-reference): fixed-width record
        # parse in the xlsx row-dict shape (``sources/dbf.py``)
        from architxt_spark.sources.dbf import read_dbf_rows

        data = read_dbf_rows(path)
    elif ext in (".wk1", ".wks", ".wk3", ".wk4"):
        # Lotus 1-2-3 worksheets (r14, beyond-reference): cell-record
        # walk incl. formula cached values, xlsx row-dict shape
        # (``sources/wk1.py``); release 3+ gates with guidance
        from architxt_spark.sources.wk1 import read_wk1_rows

        data = read_wk1_rows(path)
    elif ext == ".slk":
        # SYLK interchange (r14, beyond-reference): line-record parse
        # with persisting coordinates (``sources/sylk.py``)
        from architxt_spark.sources.sylk import read_slk_rows

        data = read_slk_rows(path)
    elif ext in (".html", ".htm", ".md", ".markdown", ".epub"):
        # web/ebook text (r14, beyond-reference): stdlib html.parser
        # block extraction, light Markdown, EPUB spine walk
        # (``sources/webdoc.py``) → one record per paragraph/chapter
        from architxt_spark.sources.webdoc import (
            read_epub_chapters,
            read_html_paragraphs,
            read_markdown_paragraphs,
        )

        reader = {
            ".html": read_html_paragraphs,
            ".htm": read_html_paragraphs,
            ".md": read_markdown_paragraphs,
            ".markdown": read_markdown_paragraphs,
            ".epub": read_epub_chapters,
        }[ext]
        data = [
            {"idx": str(i), "text": p} for i, p in enumerate(reader(path))
        ]
    elif ext in (".eml", ".msg"):
        # mail (r14, beyond-reference): RFC 5322 via the stdlib email
        # package; Outlook .msg via the shared OLE2 walker
        # (``sources/mail.py``) → Subject + one record per body line
        from architxt_spark.sources.mail import read_eml_text, read_msg_text

        reader = read_eml_text if ext == ".eml" else read_msg_text
        data = [
            {"idx": str(i), "text": p} for i, p in enumerate(reader(path))
        ]
    elif ext == ".mbox":
        # mailing-list/spool archives (r14, beyond-reference): RFC 4155
        # envelope split + mboxrd unquoting, each message through the
        # eml path (``sources/mail.py``) → one record per body line,
        # keyed by message ordinal
        from architxt_spark.sources.mail import read_mbox_messages

        data = [
            {"msg": str(m), "idx": str(i), "text": p}
            for m, paras in enumerate(read_mbox_messages(path))
            for i, p in enumerate(paras)
        ]
    elif ext == ".rtf":
        # RTF (r14, beyond-reference): group/control-word walk with
        # codepage + \\uN decoding (``sources/rtf.py``) → one record
        # per paragraph
        from architxt_spark.sources.rtf import read_rtf_text

        data = [
            {"idx": str(i), "text": p}
            for i, p in enumerate(read_rtf_text(path))
        ]
    elif ext == ".ppt":
        # legacy PowerPoint binary (r14, beyond-reference): record-tree
        # walk of the SlideListWithText container (``sources/ppt.py``)
        # → one record per slide, the .pptx shape
        from architxt_spark.sources.ppt import read_ppt_slides

        data = [
            {"idx": str(i), "text": p}
            for i, p in enumerate(read_ppt_slides(path))
        ]
    elif ext in (".docx", ".odt", ".pptx", ".odp"):
        # word-processor / presentation text (r11.5, beyond-reference;
        # .odp r13): zip + XML paragraph walk (``sources/office.py``)
        # → one record per paragraph (docx/odt) or per slide
        # (pptx/odp), so the meta-model sees a GROUP row per unit
        from architxt_spark.sources.office import (
            read_docx_paragraphs,
            read_odp_slides,
            read_odt_paragraphs,
            read_pptx_slides,
        )

        reader = {
            ".docx": read_docx_paragraphs,
            ".odt": read_odt_paragraphs,
            ".pptx": read_pptx_slides,
            ".odp": read_odp_slides,
        }[ext]
        data = [
            {"idx": str(i), "text": p}
            for i, p in enumerate(reader(path, password=password))
        ]
    elif ext == ".pdf":
        # basic machine-generated-PDF text (r11.5, beyond-reference):
        # object-scan + FlateDecode + BT/ET text operators
        # (``sources/pdf.py``) → one record per page
        from architxt_spark.sources.pdf import read_pdf_pages

        data = [
            {"idx": str(i), "text": p}
            for i, p in enumerate(read_pdf_pages(path, password=password))
        ]
    else:
        raise ValueError(f"unsupported document format: {ext}")

    if sample and isinstance(data, list):
        data = data[:sample]
    forest = read_document_value(data, root_name=root_name, raw_read=raw_read)
    return forest_from_trees(spark, {f"{os.path.basename(path)}.{i}": t for i, t in enumerate(forest)})


def row_trees(df: DataFrame, table_name: str, id_cols: list[str]) -> DataFrame:
    """Flat DataFrame → one ``(ROOT (GROUP::table (ENT::col v)…))`` tree per
    row, schema-driven, zero UDFs (the ``read_table`` path for a table with
    no FKs, ``loader/sql.py:115-146``)."""
    tree_id = F.sha2(F.concat_ws("\x1f", F.lit(table_name), *[F.col(c).cast("string") for c in id_cols]), 256)
    structs = [
        F.struct(
            tree_id.alias("tree_id"),
            F.concat(tree_id, F.lit(":r")).alias("node_id"),
            F.lit(None).cast("string").alias("parent_id"),
            F.lit(0).alias("pos"),
            F.array().cast("array<int>").alias("path"),
            F.lit(0).alias("depth"),
            F.lit(None).cast("string").alias("node_type"),
            F.lit("ROOT").alias("node_name"),
            F.lit(None).cast("string").alias("leaf_value"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        ),
        F.struct(
            tree_id.alias("tree_id"),
            F.concat(tree_id, F.lit(":0")).alias("node_id"),
            F.concat(tree_id, F.lit(":r")).alias("parent_id"),
            F.lit(0).alias("pos"),
            F.array(F.lit(0)).cast("array<int>").alias("path"),
            F.lit(1).alias("depth"),
            F.lit("GROUP").cast("string").alias("node_type"),
            F.lit(table_name).alias("node_name"),
            F.lit(None).cast("string").alias("leaf_value"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        ),
    ]
    for i, c in enumerate(df.columns):
        val = F.col(c).cast("string")
        ent = F.struct(
            tree_id.alias("tree_id"),
            F.concat(tree_id, F.lit(f":0.{i}")).alias("node_id"),
            F.concat(tree_id, F.lit(":0")).alias("parent_id"),
            F.lit(i).alias("pos"),
            F.array(F.lit(0), F.lit(i)).cast("array<int>").alias("path"),
            F.lit(2).alias("depth"),
            F.lit("ENT").cast("string").alias("node_type"),
            F.lit(c).alias("node_name"),
            F.lit(None).cast("string").alias("leaf_value"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        )
        leaf = F.struct(
            tree_id.alias("tree_id"),
            F.concat(tree_id, F.lit(f":0.{i}.0")).alias("node_id"),
            F.concat(tree_id, F.lit(f":0.{i}")).alias("parent_id"),
            F.lit(0).alias("pos"),
            F.array(F.lit(0), F.lit(i), F.lit(0)).cast("array<int>").alias("path"),
            F.lit(3).alias("depth"),
            F.lit(None).cast("string").alias("node_type"),
            F.lit(None).cast("string").alias("node_name"),
            val.alias("leaf_value"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        )
        structs.append(F.when(val.isNotNull(), ent))
        structs.append(F.when(val.isNotNull(), leaf))
    arr = F.filter(F.array(*structs), lambda x: x.isNotNull())
    return df.select(F.explode(arr).alias("n")).select("n.*")
