"""r14: archive-of-documents ingestion (sources/documents.py)."""

import io
import json
import tarfile
import zipfile

import pytest

from architxt_spark.sources.documents import read_document_file


def _zip_bytes(members):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, blob in members:
            zf.writestr(name, blob)
    return buf.getvalue()


def test_read_document_archive_zip_mixed(spark, tmp_path):
    from architxt_spark.sources.mail import make_eml_bytes

    p = tmp_path / "dump.zip"
    p.write_bytes(_zip_bytes([
        ("a/data.json", json.dumps({"k": "json-value"})),
        ("b/mail.eml", make_eml_bytes("archived", "eml body line")),
        ("logo.png", b"\x89PNG not a document"),
        ("notes/readme", b"no extension"),
    ]))
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "json-value" in vals
    assert "Subject: archived" in vals and "eml body line" in vals
    # distinct tree keys per member
    assert nodes.select("tree_id").distinct().count() >= 2


def test_read_document_archive_tar_gz_same_basenames(spark, tmp_path):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, blob in (
            ("x/t.csv", b"h\nrow-one\n"),
            ("y/t.csv", b"h\nrow-two\n"),
        ):
            info = tarfile.TarInfo(name)
            info.size = len(blob)
            tf.addfile(info, io.BytesIO(blob))
    p = tmp_path / "dump.tar.gz"
    p.write_bytes(buf.getvalue())
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    # same-named members in different directories both survive
    assert {"row-one", "row-two"} <= vals


def test_read_document_archive_no_readable_members(spark, tmp_path):
    p = tmp_path / "junk.zip"
    p.write_bytes(_zip_bytes([("a.png", b"x"), ("b.bin", b"y")]))
    with pytest.raises(ValueError, match="no readable documents"):
        read_document_file(spark, str(p))


def test_read_document_archive_corrupt_member_raises(spark, tmp_path):
    # a supported-extension member that fails to parse must raise, not
    # be silently skipped
    p = tmp_path / "bad.zip"
    p.write_bytes(_zip_bytes([("t.wk1", b"\x99 not lotus")]))
    with pytest.raises(ValueError, match="BOF"):
        read_document_file(spark, str(p))


def test_csv_delimiter_sniffing_and_tsv(spark, tmp_path):
    """r14.5: ';'-separated 'CSV' (the European export shape) and .tsv
    both parse into the same records as comma CSV."""
    from architxt_spark.sources.documents import read_document_file

    for name, text in (
        ("comma.csv", "a,b\nx,y\n"),
        ("semi.csv", "a;b\nx;y\n"),
        ("tabs.tsv", "a\tb\nx\ty\n"),
    ):
        p = tmp_path / name
        p.write_text(text)
        nodes = read_document_file(spark, str(p))
        vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
        assert {"x", "y"} <= vals, name
    # a comma CSV whose values contain semicolons must stay comma-split
    p = tmp_path / "tricky.csv"
    p.write_text("a,b\nu;v,w\n")
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert "u;v" in vals and "w" in vals
