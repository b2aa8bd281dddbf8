"""UNIX compress .Z codec (sources/zcompress.py) + single-file
compression unwrapping in the document loader — arbitrated against the
system gzip -d / uncompress (which read .Z) when present."""

import shutil
import subprocess

import numpy as np
import pytest

from architxt_spark.sources.zcompress import z_compress, z_decompress


def test_z_self_roundtrip_matrix():
    rng = np.random.default_rng(1)
    cases = [
        b"", b"a", b"hello hello hello hello",
        bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
        bytes((i // 7) % 256 for i in range(20000)),
        bytes(3000),
    ]
    for data in cases:
        for mb in (9, 12, 16):
            assert z_decompress(z_compress(data, maxbits=mb)) == data, (
                len(data), mb,
            )


def test_z_errors():
    with pytest.raises(ValueError, match="not a compress"):
        z_decompress(b"\x1f\x8b not Z")
    with pytest.raises(ValueError, match="out of range"):
        z_decompress(b"\x1f\x9d\x88")  # maxbits 8


def test_z_corruption_never_crashes_unexpectedly():
    import random

    rng = random.Random(3)
    base = bytearray(z_compress(bytes(range(256)) * 8))
    for trial in range(300):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: rng.randrange(len(blob) + 1)]
        for _ in range(rng.randrange(3)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            z_decompress(bytes(blob))
        except ValueError:
            pass


@pytest.mark.skipif(shutil.which("gzip") is None, reason="no system gzip")
def test_z_encoder_against_system_gzip(tmp_path):
    """gzip -d reads .Z; every stream our encoder writes must
    decompress there byte-identically — across the width ladder, the
    phase-relative group alignment, and the maxbits=9 overshoot-to-10
    quirk (both derived empirically against this exact arbiter)."""
    rng = np.random.default_rng(7)
    for t in range(40):
        n = int(rng.integers(0, 30000))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif kind == 1:
            data = bytes(rng.integers(0, 6, n, dtype=np.uint8))
        else:
            data = bytes((i // 23) % 256 for i in range(n))
        mb = int(rng.integers(9, 17))
        p = tmp_path / "t.Z"
        p.write_bytes(z_compress(data, maxbits=mb))
        r = subprocess.run(["gzip", "-dc", str(p)], capture_output=True)
        assert r.returncode == 0 and r.stdout == data, (t, n, mb, r.stderr[:60])


def test_read_document_file_unwraps_compressed(spark, tmp_path):
    """report.csv.gz / .bz2 / .xz / .Z all unwrap to the inner reader;
    a wrapper around an unreadable inner extension raises."""
    import bz2
    import gzip
    import lzma

    from architxt_spark.sources.documents import read_document_file

    csv = b"h\nwrapped-value\n"
    for suffix, comp in (
        (".gz", gzip.compress), (".bz2", bz2.compress),
        (".xz", lzma.compress), (".Z", z_compress),
    ):
        p = tmp_path / f"t.csv{suffix}"
        p.write_bytes(comp(csv))
        nodes = read_document_file(spark, str(p))
        vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
        assert "wrapped-value" in vals, suffix
    bad = tmp_path / "blob.bin.gz"
    bad.write_bytes(gzip.compress(b"x"))
    with pytest.raises(ValueError, match="no\\s+readable document"):
        read_document_file(spark, str(bad))


def test_archive_members_unwrap_compressed(spark, tmp_path):
    import gzip
    import io
    import zipfile

    from architxt_spark.sources.documents import read_document_file

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("a/data.csv.gz", gzip.compress(b"h\ninner-gz\n"))
        zf.writestr("b/old.csv.Z", z_compress(b"h\ninner-z\n"))
        zf.writestr("c/skip.bin.gz", gzip.compress(b"not a document"))
    p = tmp_path / "dump.zip"
    p.write_bytes(buf.getvalue())
    nodes = read_document_file(spark, str(p))
    vals = {r.leaf_value for r in nodes.filter("leaf_value is not null").collect()}
    assert {"inner-gz", "inner-z"} <= vals
