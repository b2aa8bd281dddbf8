"""TIFF codec (functions/tiff.py): round-trips across the compression/
depth/photometric matrix, gates, corruption fuzz, and cross-validation
against the SYSTEM libtiff through ctypes (the DuckDB/libjpeg/libpng
independent-arbiter pattern — TIFF is lossless here, so every interop
assertion is exact)."""

import ctypes
import ctypes.util
import zlib

import numpy as np
import pytest

from architxt_spark.functions.tiff import decode_tiff_pixels, make_tiff_bytes


def test_tiff_roundtrip_matrix():
    rng = np.random.default_rng(1)
    for ch in (1, 3):
        for comp in (1, 5, 8, 32773):
            for pred in (1, 2):
                for be in (False, True):
                    for rps in (None, 3):
                        w, h = 13, 9
                        px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
                        blob = make_tiff_bytes(
                            w, h, px, channels=ch, compression=comp,
                            predictor=pred, big_endian=be, rows_per_strip=rps,
                        )
                        assert decode_tiff_pixels(blob) == (w, h, ch, px), (
                            ch, comp, pred, be, rps,
                        )


def test_tiff_lzw_width_changes_and_clear():
    """Images large/compressible enough to drive the 9→10→11→12-bit
    code-width changes and the 4094-entry Clear restart."""
    rng = np.random.default_rng(2)
    w, h = 200, 150
    for px in (
        bytes(rng.integers(0, 256, w * h * 3, dtype=np.uint8)),
        bytes((i // 97) % 256 for i in range(w * h * 3)),
        bytes(w * h * 3),  # constant: deepest table chains
    ):
        blob = make_tiff_bytes(w, h, px, channels=3, compression=5)
        assert decode_tiff_pixels(blob) == (w, h, 3, px)


def test_tiff_depths_palette_and_whiteiszero():
    rng = np.random.default_rng(3)
    w, h = 10, 7
    px = bytes(rng.integers(0, 256, w * h, dtype=np.uint8))
    # 16-bit reduces to the high byte in both byte orders
    for be in (False, True):
        got = decode_tiff_pixels(make_tiff_bytes(w, h, px, bit_depth=16, big_endian=be))
        assert got == (w, h, 1, px)
    # sub-byte grays scale to 0..255
    px4 = bytes(rng.integers(0, 16, w * h, dtype=np.uint8))
    assert decode_tiff_pixels(make_tiff_bytes(w, h, px4, bit_depth=4))[3] == bytes(
        v * 255 // 15 for v in px4
    )
    px1 = bytes(rng.integers(0, 2, w * h, dtype=np.uint8))
    assert decode_tiff_pixels(make_tiff_bytes(w, h, px1, bit_depth=1))[3] == bytes(
        v * 255 for v in px1
    )
    # white-is-zero inverts to the black-is-zero view
    assert decode_tiff_pixels(make_tiff_bytes(w, h, px, photometric=0))[3] == bytes(
        255 - v for v in px
    )
    # palette expands via the 16-bit ColorMap's high bytes
    pal = [int(v) << 8 for v in rng.integers(0, 256, 3 * 16)]
    idx = bytes(rng.integers(0, 16, w * h, dtype=np.uint8))
    got = decode_tiff_pixels(make_tiff_bytes(w, h, idx, palette=pal))
    exp = b"".join(
        bytes((pal[i] >> 8, pal[16 + i] >> 8, pal[32 + i] >> 8)) for i in idx
    )
    assert got == (w, h, 3, exp)


def test_tiff_gates_and_errors():
    import struct

    with pytest.raises(ValueError, match="not a TIFF"):
        decode_tiff_pixels(b"\x89PNG nope")
    with pytest.raises(ValueError, match="BigTIFF"):
        # version 43 with a bad offset size is malformed, not gated
        decode_tiff_pixels(b"II+\x00\x04\x00\x00\x00" + b"\x00" * 8)
    base = bytearray(make_tiff_bytes(4, 4, bytes(16)))
    # flip Compression (tag 259) to old-style JPEG → still a gate
    at = base.find(struct.pack("<HH", 259, 3))
    assert at > 0
    ojpeg = bytearray(base)
    ojpeg[at + 8] = 6
    with pytest.raises(NotImplementedError, match="JPEG-in-TIFF"):
        decode_tiff_pixels(bytes(ojpeg))


def test_tiff_corruption_never_crashes_unexpectedly():
    import random

    rng = random.Random(5)
    base = bytearray(make_tiff_bytes(9, 7, bytes(range(63)), compression=5))
    for trial in range(400):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: rng.randrange(len(blob) + 1)]
        for _ in range(rng.randrange(3)):
            if blob:
                blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            decode_tiff_pixels(bytes(blob))
        except (ValueError, NotImplementedError, zlib.error):
            pass


def test_extract_features_tiff_mode(spark):
    from architxt_spark.functions import multimodal as M

    px = bytes((i * 7) % 256 for i in range(256))
    blob = make_tiff_bytes(16, 16, px, compression=5)
    assert M.sniff_format(blob) == "tiff"
    df = spark.createDataFrame(
        [("1", "image", bytearray(blob))],
        "media_id string, kind string, content binary",
    )
    rows = M.extract_features(df, decoder="tiff").collect()
    assert len(rows) == 1 and len(rows[0].feature) == 16
    hist = np.bincount(np.frombuffer(px, np.uint8) % 16, minlength=16)
    want = (hist / hist.sum()).astype("float32")
    assert np.allclose(rows[0].feature, want)


# --- libtiff ctypes oracle (skipped when the library is absent) ---


@pytest.fixture(scope="module")
def libtiff():
    name = ctypes.util.find_library("tiff") or "libtiff.so.6"
    try:
        t = ctypes.CDLL(name)
    except OSError:
        pytest.skip("no system libtiff")
    t.TIFFOpen.restype = ctypes.c_void_p
    t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    t.TIFFSetErrorHandler(None)  # quiet; failures surface as asserts
    t.TIFFSetWarningHandler(None)
    return t


def _lib_write(t, path, w, h, ch, raw, comp, predictor=None, rps=None):
    tif = t.TIFFOpen(path.encode(), b"w")
    assert tif

    def setf(tag, val, typ=ctypes.c_uint32):
        assert t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), typ(val))

    setf(256, w)
    setf(257, h)
    setf(258, 8, ctypes.c_uint16)
    setf(277, ch, ctypes.c_uint16)
    setf(259, comp, ctypes.c_uint16)
    setf(262, 1 if ch == 1 else 2, ctypes.c_uint16)
    setf(284, 1, ctypes.c_uint16)
    setf(278, rps or h)
    if predictor:
        setf(317, predictor, ctypes.c_uint16)
    stride = w * ch
    for y in range(h):
        row = ctypes.create_string_buffer(raw[y * stride:(y + 1) * stride], stride)
        assert t.TIFFWriteScanline(
            ctypes.c_void_p(tif), row, ctypes.c_uint32(y), ctypes.c_uint16(0)
        ) == 1
    t.TIFFClose(ctypes.c_void_p(tif))


def _lib_read_rgb(t, path, w, h):
    tif = t.TIFFOpen(path.encode(), b"r")
    assert tif
    buf = (ctypes.c_uint32 * (w * h))()
    ok = t.TIFFReadRGBAImage(
        ctypes.c_void_p(tif), ctypes.c_uint32(w), ctypes.c_uint32(h), buf,
        ctypes.c_int(0),
    )
    t.TIFFClose(ctypes.c_void_p(tif))
    assert ok
    arr = np.frombuffer(bytes(buf), dtype="<u4").reshape(h, w)[::-1]
    return np.stack(
        [arr & 0xFF, (arr >> 8) & 0xFF, (arr >> 16) & 0xFF], -1
    ).astype(np.uint8)


def test_libtiff_interop_both_directions(libtiff, tmp_path):
    """libtiff-written strips (its own LZW/deflate/PackBits encoders,
    its choice of strip layout) decode EXACTLY in our reader, and our
    twin's output reads back exactly through TIFFReadRGBAImage —
    including the LZW early-change code widths both ways."""
    rng = np.random.default_rng(7)
    for ch in (1, 3):
        for comp in (1, 5, 8, 32773):
            for pred in ((None, 2) if comp in (5, 8) else (None,)):
                for rps in (None, 7):
                    w, h = 60, 45
                    raw = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
                    p = str(tmp_path / "a.tif")
                    _lib_write(libtiff, p, w, h, ch, raw, comp, pred, rps)
                    with open(p, "rb") as f:
                        assert decode_tiff_pixels(f.read()) == (w, h, ch, raw), (
                            "lib->mine", ch, comp, pred, rps,
                        )
                    blob = make_tiff_bytes(
                        w, h, raw, channels=ch, compression=comp,
                        predictor=pred or 1, rows_per_strip=rps,
                    )
                    p2 = str(tmp_path / "b.tif")
                    with open(p2, "wb") as f:
                        f.write(blob)
                    rgb = _lib_read_rgb(libtiff, p2, w, h)
                    want = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, ch)
                    if ch == 1:
                        assert np.array_equal(rgb[..., 0], want[..., 0]), (
                            "mine->lib", comp, pred, rps,
                        )
                    else:
                        assert np.array_equal(rgb, want), (
                            "mine->lib", comp, pred, rps,
                        )


def test_libtiff_reads_our_big_endian_and_palette(libtiff, tmp_path):
    rng = np.random.default_rng(9)
    w, h = 21, 17
    raw = bytes(rng.integers(0, 256, w * h, dtype=np.uint8))
    p = str(tmp_path / "be.tif")
    with open(p, "wb") as f:
        f.write(make_tiff_bytes(w, h, raw, big_endian=True, compression=5))
    assert np.array_equal(
        _lib_read_rgb(libtiff, p, w, h)[..., 0],
        np.frombuffer(raw, np.uint8).reshape(h, w),
    )
    pal = [int(v) << 8 for v in rng.integers(0, 256, 3 * 16)]
    idx = bytes(rng.integers(0, 16, w * h, dtype=np.uint8))
    p2 = str(tmp_path / "pal.tif")
    with open(p2, "wb") as f:
        f.write(make_tiff_bytes(w, h, idx, palette=pal))
    got = _lib_read_rgb(libtiff, p2, w, h)
    want = np.array(
        [(pal[i] >> 8, pal[16 + i] >> 8, pal[32 + i] >> 8) for i in idx],
        dtype=np.uint8,
    ).reshape(h, w, 3)
    assert np.array_equal(got, want)


def test_imagehash_decodes_tiff():
    """The image near-dup pipeline's sniff dispatch picks up TIFF: a
    PNG and a TIFF of the SAME pixels hash identically."""
    from architxt_spark.functions.imagehash import decode_gray
    from architxt_spark.functions.multimodal import make_png_bytes

    rng = np.random.default_rng(11)
    w, h = 24, 16
    px = bytes(rng.integers(0, 256, w * h, dtype=np.uint8))
    via_tiff = decode_gray(make_tiff_bytes(w, h, px, compression=5))
    via_png = decode_gray(make_png_bytes(w, h, px, color_type=0))
    assert via_tiff == via_png == (w, h, list(px))


# --- r14.5: new-style JPEG-in-TIFF (Compression=7) ---


def test_tiff_jpeg_compression_self_roundtrip():
    """Constant 8x8 blocks travel DC-exactly through the JPEG strips,
    so gray decodes bit-exactly and color within YCbCr rounding."""
    rng = np.random.default_rng(21)
    for ch, tol in ((1, 0), (3, 2)):
        for rps in (None, 8):
            w, h = 32, 24
            img = np.zeros((h, w, ch), np.uint8)
            for by in range(3):
                for bx in range(4):
                    img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = rng.integers(0, 256, ch)
            blob = make_tiff_bytes(
                w, h, img.tobytes(), channels=ch, compression=7,
                rows_per_strip=rps,
            )
            got = decode_tiff_pixels(blob)
            assert got[:3] == (w, h, ch)
            diff = np.abs(
                np.frombuffer(got[3], np.uint8).astype(int) - img.flatten().astype(int)
            ).max()
            assert diff <= tol, (ch, rps, diff)


def test_libtiff_jpeg_compression_interop(libtiff, tmp_path):
    """libtiff writes Compression=7 (abbreviated strips + the
    JPEGTables tag, exercising the splice) and reads our full-stream
    strips back; both within JPEG rounding."""
    rng = np.random.default_rng(23)
    for ch in (1, 3):
        w, h = 48, 32
        img = np.zeros((h, w, ch), np.uint8)
        for by in range(4):
            for bx in range(6):
                img[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = rng.integers(0, 256, ch)
        raw = img.tobytes()
        p = str(tmp_path / "j.tif")
        tif = libtiff.TIFFOpen(p.encode(), b"w")
        assert tif

        def setf(tag, *vals):
            assert libtiff.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(tag), *vals
            ), tag

        setf(256, ctypes.c_uint32(w))
        setf(257, ctypes.c_uint32(h))
        setf(258, ctypes.c_uint16(8))
        setf(277, ctypes.c_uint16(ch))
        setf(259, ctypes.c_uint16(7))
        setf(262, ctypes.c_uint16(1 if ch == 1 else 6))
        setf(284, ctypes.c_uint16(1))
        setf(278, ctypes.c_uint32(16))
        if ch == 3:
            setf(530, ctypes.c_uint16(1), ctypes.c_uint16(1))  # 4:4:4
        setf(65537, ctypes.c_int(95))  # JPEGQUALITY
        setf(65538, ctypes.c_int(1))  # JPEGCOLORMODE_RGB
        stride = w * ch
        for y in range(h):
            buf = ctypes.create_string_buffer(raw[y * stride:(y + 1) * stride], stride)
            assert libtiff.TIFFWriteScanline(
                ctypes.c_void_p(tif), buf, ctypes.c_uint32(y), ctypes.c_uint16(0)
            ) == 1
        libtiff.TIFFClose(ctypes.c_void_p(tif))
        with open(p, "rb") as f:
            got = decode_tiff_pixels(f.read())
        assert got[:3] == (w, h, ch)
        diff = np.abs(
            np.frombuffer(got[3], np.uint8).astype(int) - img.flatten().astype(int)
        ).max()
        assert diff <= 4, ("lib->mine", ch, diff)

        blob = make_tiff_bytes(w, h, raw, channels=ch, compression=7)
        p2 = str(tmp_path / "m.tif")
        with open(p2, "wb") as f:
            f.write(blob)
        rgb = _lib_read_rgb(libtiff, p2, w, h)
        if ch == 1:
            diff = np.abs(
                rgb[..., 0].astype(int)
                - np.frombuffer(raw, np.uint8).reshape(h, w).astype(int)
            ).max()
        else:
            diff = np.abs(
                rgb.astype(int)
                - np.frombuffer(raw, np.uint8).reshape(h, w, 3).astype(int)
            ).max()
        assert diff <= 4, ("mine->lib", ch, diff)


# --- r14.5: tiled layout ---


def test_tiff_tiled_roundtrip_matrix():
    """Tiles (incl. partial edge tiles) across the lossless
    compressions; tiled JPEG DC-exact on constant blocks."""
    rng = np.random.default_rng(31)
    for ch in (1, 3):
        for comp in (1, 5, 8, 32773):
            for tile in ((8, 8), (16, 8), (5, 6)):
                w, h = 23, 17
                px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
                blob = make_tiff_bytes(
                    w, h, px, channels=ch, compression=comp, tile=tile
                )
                assert decode_tiff_pixels(blob) == (w, h, ch, px), (
                    ch, comp, tile,
                )


def test_libtiff_tiled_interop(libtiff, tmp_path):
    """libtiff writes tiled LZW and tiled G4 via TIFFWriteTile; our
    reader pastes the tile grid exactly — and libtiff reads our tiled
    twin back through TIFFReadRGBAImage."""
    rng = np.random.default_rng(33)
    w, h = 40, 28

    def lib_write_tiled(path, ch, raw_or_bits, comp, depth):
        tif = libtiff.TIFFOpen(path.encode(), b"w")
        assert tif

        def setf(tag, *vals):
            assert libtiff.TIFFSetField(
                ctypes.c_void_p(tif), ctypes.c_uint32(tag), *vals
            ), tag

        setf(256, ctypes.c_uint32(w))
        setf(257, ctypes.c_uint32(h))
        setf(258, ctypes.c_uint16(depth))
        setf(277, ctypes.c_uint16(ch))
        setf(259, ctypes.c_uint16(comp))
        setf(262, ctypes.c_uint16(0 if comp == 4 else (1 if ch == 1 else 2)))
        setf(284, ctypes.c_uint16(1))
        setf(322, ctypes.c_uint32(16))
        setf(323, ctypes.c_uint32(16))
        tile_bytes = (16 * depth + 7) // 8 * 16 * (ch if depth == 8 else 1)
        for ty in range(0, h, 16):
            for tx in range(0, w, 16):
                buf = ctypes.create_string_buffer(bytes(tile_bytes), tile_bytes)
                # fill the tile from the source, zero-padded at edges
                for r in range(16):
                    y = ty + r
                    if y >= h:
                        break
                    if depth == 8:
                        src = raw_or_bits[
                            (y * w + tx) * ch:(y * w + min(tx + 16, w)) * ch
                        ]
                        buf[r * 16 * ch:r * 16 * ch + len(src)] = src
                    else:  # 1-bit packed source rows
                        rb = (w + 7) // 8
                        for c in range(min(16, w - tx)):
                            x = tx + c
                            bit = (raw_or_bits[y * rb + (x >> 3)] >> (7 - (x & 7))) & 1
                            if bit:
                                idx = r * 2 + (c >> 3)
                                buf[idx] = bytes([buf[idx][0] | (0x80 >> (c & 7))])
                assert libtiff.TIFFWriteTile(
                    ctypes.c_void_p(tif), buf, ctypes.c_uint32(tx),
                    ctypes.c_uint32(ty), ctypes.c_uint32(0), ctypes.c_uint16(0),
                ) > 0
        libtiff.TIFFClose(ctypes.c_void_p(tif))

    # tiled LZW gray: exact
    raw = bytes(rng.integers(0, 256, w * h, dtype=np.uint8))
    p = str(tmp_path / "t5.tif")
    lib_write_tiled(p, 1, raw, 5, 8)
    with open(p, "rb") as f:
        assert decode_tiff_pixels(f.read()) == (w, h, 1, raw)

    # tiled G4 bilevel: exact in the black-is-zero view
    rb = (w + 7) // 8
    packed = bytearray(rb * h)
    bits = rng.random((h, w)) < 0.4
    for y in range(h):
        for x in range(w):
            if bits[y, x]:
                packed[y * rb + (x >> 3)] |= 0x80 >> (x & 7)
    p = str(tmp_path / "t4.tif")
    lib_write_tiled(p, 1, bytes(packed), 4, 1)
    with open(p, "rb") as f:
        gw, gh, gc, got = decode_tiff_pixels(f.read())
    want = bytes(
        255 - 255 * ((packed[y * rb + (x >> 3)] >> (7 - (x & 7))) & 1)
        for y in range(h)
        for x in range(w)
    )
    assert (gw, gh, gc) == (w, h, 1) and got == want

    # reverse: our tiled twin reads back exactly in libtiff
    raw3 = bytes(rng.integers(0, 256, w * h * 3, dtype=np.uint8))
    blob = make_tiff_bytes(w, h, raw3, channels=3, compression=5, tile=(16, 16))
    p2 = str(tmp_path / "m.tif")
    with open(p2, "wb") as f:
        f.write(blob)
    rgb = _lib_read_rgb(libtiff, p2, w, h)
    assert np.array_equal(rgb, np.frombuffer(raw3, np.uint8).reshape(h, w, 3))


def test_extract_features_sniff_mode(spark):
    """decoder='sniff' routes each row by magic bytes — a mixed-media
    frame of PNG/TIFF/JPEG/WAV in one pass."""
    from architxt_spark.functions import multimodal as M
    from architxt_spark.functions.jpeg import make_jpeg_bytes
    from architxt_spark.functions.multimodal import make_png_bytes, make_wav_bytes

    px = bytes((i * 7) % 256 for i in range(256))
    rows = [
        ("png", "image", bytearray(make_png_bytes(16, 16, px, color_type=0))),
        ("tif", "image", bytearray(make_tiff_bytes(16, 16, px, compression=5))),
        ("jpg", "image", bytearray(make_jpeg_bytes(16, 16, px, channels=1))),
        ("wav", "audio", bytearray(make_wav_bytes(1, 8000, 16, samples=[list(range(16))]))),
    ]
    df = spark.createDataFrame(
        rows, "media_id string, kind string, content binary"
    )
    got = {r.media_id: r.feature for r in M.extract_features(df, decoder="sniff").collect()}
    assert set(got) == {"png", "tif", "jpg", "wav"}
    # png and tiff hold identical pixels -> identical features
    assert got["png"] == got["tif"]
    assert all(len(v) == 16 for v in got.values())


def test_tiff_dims_and_media_meta(spark):
    """Header-only TIFF dimensions feed decode_image and the metadata
    pass like the other formats."""
    from architxt_spark.functions import multimodal as M
    from architxt_spark.functions.tiff import decode_tiff_dims

    blob = make_tiff_bytes(23, 17, bytes(23 * 17), big_endian=True)
    assert decode_tiff_dims(blob) == (23, 17)
    assert M.decode_image(blob) == (23, 17)
    df = spark.createDataFrame(
        [("t", "image", bytearray(blob))],
        "media_id string, kind string, content binary",
    )
    row = M.decode_media_meta(df).collect()[0]
    assert (row.fmt, row.width, row.height) == ("tiff", 23, 17)


def test_libtiff_planar_interop(libtiff, tmp_path):
    """PlanarConfiguration=2 (separate component planes) written by
    libtiff decodes exactly — across compressions, strip heights, and
    8/16-bit depths."""
    rng = np.random.default_rng(41)
    for comp in (1, 5, 32773):
        for rps in (None, 7):
            for depth in (8, 16):
                w, h, ch = 31, 22, 3
                img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
                p = str(tmp_path / "pl.tif")
                tif = libtiff.TIFFOpen(p.encode(), b"w")
                assert tif

                def setf(tag, *vals):
                    assert libtiff.TIFFSetField(
                        ctypes.c_void_p(tif), ctypes.c_uint32(tag), *vals
                    ), tag

                setf(256, ctypes.c_uint32(w))
                setf(257, ctypes.c_uint32(h))
                setf(258, ctypes.c_uint16(depth))
                setf(277, ctypes.c_uint16(ch))
                setf(259, ctypes.c_uint16(comp))
                setf(262, ctypes.c_uint16(2))
                setf(284, ctypes.c_uint16(2))
                setf(278, ctypes.c_uint32(rps or h))
                for c in range(ch):
                    for y in range(h):
                        row = (
                            img[y, :, c].tobytes()
                            if depth == 8
                            else (img[y, :, c].astype("<u2") << 8).tobytes()
                        )
                        buf = ctypes.create_string_buffer(row, len(row))
                        assert libtiff.TIFFWriteScanline(
                            ctypes.c_void_p(tif), buf, ctypes.c_uint32(y),
                            ctypes.c_uint16(c),
                        ) == 1
                libtiff.TIFFClose(ctypes.c_void_p(tif))
                with open(p, "rb") as f:
                    assert decode_tiff_pixels(f.read()) == (
                        w, h, ch, img.tobytes(),
                    ), (comp, rps, depth)


def test_libtiff_bigtiff_interop(libtiff, tmp_path):
    """BigTIFF (version 43, 8-byte IFD machinery) written by libtiff's
    'w8' mode decodes exactly across compressions and channels."""
    rng = np.random.default_rng(51)
    from architxt_spark.functions.tiff import decode_tiff_dims

    for comp in (1, 5, 8, 32773):
        for ch in (1, 3):
            w, h = 40, 28
            raw = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
            p = str(tmp_path / "big.tif")
            tif = libtiff.TIFFOpen(p.encode(), b"w8")
            assert tif

            def setf(tag, *vals):
                assert libtiff.TIFFSetField(
                    ctypes.c_void_p(tif), ctypes.c_uint32(tag), *vals
                ), tag

            setf(256, ctypes.c_uint32(w))
            setf(257, ctypes.c_uint32(h))
            setf(258, ctypes.c_uint16(8))
            setf(277, ctypes.c_uint16(ch))
            setf(259, ctypes.c_uint16(comp))
            setf(262, ctypes.c_uint16(1 if ch == 1 else 2))
            setf(284, ctypes.c_uint16(1))
            setf(278, ctypes.c_uint32(9))
            stride = w * ch
            for y in range(h):
                buf = ctypes.create_string_buffer(
                    raw[y * stride:(y + 1) * stride], stride
                )
                assert libtiff.TIFFWriteScanline(
                    ctypes.c_void_p(tif), buf, ctypes.c_uint32(y),
                    ctypes.c_uint16(0),
                ) == 1
            libtiff.TIFFClose(ctypes.c_void_p(tif))
            with open(p, "rb") as f:
                data = f.read()
            assert data[:4] == b"II+\x00"
            assert decode_tiff_pixels(data) == (w, h, ch, raw), (comp, ch)
            assert decode_tiff_dims(data) == (w, h)
