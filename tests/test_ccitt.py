"""CCITT G3/G4 fax codecs (functions/ccitt.py) and their TIFF
integration — tables and streams validated against the system libtiff
through ctypes (exact, both directions)."""

import ctypes
import ctypes.util
import struct

import numpy as np
import pytest

from architxt_spark.functions.ccitt import ccitt_decode, ccitt_encode
from architxt_spark.functions.tiff import decode_tiff_pixels, make_tiff_bytes


def _rand_rows(rng, w, h, density):
    rb = (w + 7) // 8
    packed = bytearray(rb * h)
    bits = rng.random((h, w)) < density
    for y in range(h):
        for x in range(w):
            if bits[y, x]:
                packed[y * rb + (x >> 3)] |= 0x80 >> (x & 7)
    return bytes(packed)


def test_ccitt_self_roundtrip_mh_and_g4():
    rng = np.random.default_rng(1)
    for trial in range(30):
        w = int(rng.integers(1, 150))
        h = int(rng.integers(1, 20))
        rows = _rand_rows(rng, w, h, float(rng.random()))
        for comp in (2, 4):
            enc = ccitt_encode(rows, w, h, comp)
            assert ccitt_decode(enc, w, h, comp) == rows, (trial, w, h, comp)


def test_ccitt_long_runs_use_makeups():
    # a mostly-white page with a black bar: runs cross the make-up and
    # extended-make-up ranges (64..2560+) in both colors
    w, h = 3000, 4
    rb = (w + 7) // 8
    rows = bytearray(rb * h)
    for y in range(h):
        for x in range(2700, 2990):
            rows[y * rb + (x >> 3)] |= 0x80 >> (x & 7)
    rows = bytes(rows)
    for comp in (2, 4):
        enc = ccitt_encode(rows, w, h, comp)
        assert ccitt_decode(enc, w, h, comp) == rows, comp
    # all-black page: black run of the full width per row
    allb = bytes(bytearray([0xFF] * (rb * h)))
    for comp in (2, 4):
        trimmed = ccitt_decode(ccitt_encode(allb, w, h, comp), w, h, comp)
        # compare only the in-width bits (pad bits may differ)
        for y in range(h):
            got = trimmed[y * rb:(y + 1) * rb]
            want = allb[y * rb:(y + 1) * rb]
            assert got[: w // 8] == want[: w // 8], comp


def test_ccitt_corruption_never_crashes_unexpectedly():
    import random

    rng = np.random.default_rng(3)
    pyrng = random.Random(3)
    rows = _rand_rows(rng, 40, 6, 0.4)
    base = bytearray(ccitt_encode(rows, 40, 6, 4))
    for trial in range(300):
        blob = bytearray(base)
        if trial % 2:
            blob = blob[: pyrng.randrange(len(blob) + 1)]
        for _ in range(pyrng.randrange(3)):
            if blob:
                blob[pyrng.randrange(len(blob))] = pyrng.randrange(256)
        try:
            ccitt_decode(bytes(blob), 40, 6, 4)
        except (ValueError, NotImplementedError):
            pass


def test_tiff_ccitt_end_to_end_roundtrip():
    """make_tiff_bytes(compression=2/4) → decode_tiff_pixels: fax TIFFs
    default to min-is-white, so a 1 bit (ink) reads as 0 in the
    black-is-zero view."""
    rng = np.random.default_rng(5)
    w, h = 70, 11
    bits = bytes((rng.random(w * h) < 0.35).astype(np.uint8))
    for comp in (2, 4):
        for rps in (None, 4):
            blob = make_tiff_bytes(
                w, h, bits, bit_depth=1, compression=comp, rows_per_strip=rps
            )
            got = decode_tiff_pixels(blob)
            assert got[:3] == (w, h, 1)
            assert got[3] == bytes(255 - 255 * b for b in bits), (comp, rps)


# --- libtiff arbitration ---


@pytest.fixture(scope="module")
def libtiff():
    name = ctypes.util.find_library("tiff") or "libtiff.so.6"
    try:
        t = ctypes.CDLL(name)
    except OSError:
        pytest.skip("no system libtiff")
    t.TIFFOpen.restype = ctypes.c_void_p
    t.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    t.TIFFSetErrorHandler(None)
    t.TIFFSetWarningHandler(None)
    return t


def _lib_write_bilevel(t, path, w, h, packed, comp, g3opts=None):
    tif = t.TIFFOpen(path.encode(), b"w")
    assert tif

    def setf(tag, val, typ=ctypes.c_uint32):
        assert t.TIFFSetField(ctypes.c_void_p(tif), ctypes.c_uint32(tag), typ(val))

    setf(256, w)
    setf(257, h)
    setf(258, 1, ctypes.c_uint16)
    setf(277, 1, ctypes.c_uint16)
    setf(259, comp, ctypes.c_uint16)
    setf(262, 0, ctypes.c_uint16)
    setf(284, 1, ctypes.c_uint16)
    setf(278, h)
    if g3opts is not None:
        setf(292, g3opts)
    rb = (w + 7) // 8
    for y in range(h):
        buf = ctypes.create_string_buffer(packed[y * rb:(y + 1) * rb], rb)
        assert t.TIFFWriteScanline(
            ctypes.c_void_p(tif), buf, ctypes.c_uint32(y), ctypes.c_uint16(0)
        ) == 1
    t.TIFFClose(ctypes.c_void_p(tif))


def _lib_read_bilevel(t, path, w, h):
    tif = t.TIFFOpen(path.encode(), b"r")
    assert tif
    rb = (w + 7) // 8
    out = bytearray()
    buf = ctypes.create_string_buffer(rb)
    for y in range(h):
        assert t.TIFFReadScanline(
            ctypes.c_void_p(tif), buf, ctypes.c_uint32(y), ctypes.c_uint16(0)
        ) == 1
        out += buf.raw[:rb]
    t.TIFFClose(ctypes.c_void_p(tif))
    return bytes(out)


def test_libtiff_fax_interop_both_directions(libtiff, tmp_path):
    """libtiff's MH / G3-EOL(1D and 2D) / G4 streams decode exactly in
    our full TIFF reader, and our fax twins read back exactly through
    TIFFReadScanline — table or mode-code transcription errors cannot
    survive this."""
    rng = np.random.default_rng(7)
    for trial in range(10):
        w = int(rng.integers(1, 200))
        h = int(rng.integers(1, 12))
        packed = _rand_rows(rng, w, h, float(rng.random()))
        for comp, opts in ((2, None), (4, None), (3, 0), (3, 1)):
            p = str(tmp_path / "a.tif")
            _lib_write_bilevel(libtiff, p, w, h, packed, comp, opts)
            with open(p, "rb") as f:
                gw, gh, gc, raw = decode_tiff_pixels(f.read())
            assert (gw, gh, gc) == (w, h, 1), (trial, comp, opts)
            # photometric 0: bit 1 (ink) reads 0 in the black-is-zero view
            rb = (w + 7) // 8
            want = bytes(
                255 - 255 * ((packed[y * rb + (x >> 3)] >> (7 - (x & 7))) & 1)
                for y in range(h)
                for x in range(w)
            )
            assert raw == want, ("lib->mine", trial, comp, opts)
        for comp in (2, 4):
            blob = make_tiff_bytes(
                w, h,
                bytes(
                    (packed[y * ((w + 7) // 8) + (x >> 3)] >> (7 - (x & 7))) & 1
                    for y in range(h)
                    for x in range(w)
                ),
                bit_depth=1, compression=comp,
            )
            p2 = str(tmp_path / "b.tif")
            with open(p2, "wb") as f:
                f.write(blob)
            got = _lib_read_bilevel(libtiff, p2, w, h)
            rb = (w + 7) // 8
            for y in range(h):
                nbytes = w // 8
                assert got[y * rb:y * rb + nbytes] == packed[y * rb:y * rb + nbytes], (
                    "mine->lib", trial, comp, y,
                )
                if w % 8:  # compare the partial last byte's used bits
                    mask = 0xFF << (8 - w % 8) & 0xFF
                    assert (got[y * rb + nbytes] & mask) == (
                        packed[y * rb + nbytes] & mask
                    ), ("mine->lib tail", trial, comp, y)


def test_libtiff_fax_interop_wide_pages(libtiff, tmp_path):
    """Fax-width pages (up to A4-at-200dpi scale) drive the EXTENDED
    make-up codes (1792..2560, shared between colors) through the
    libtiff arbitration in both directions."""
    rng = np.random.default_rng(11)
    w, h = 3600, 3
    rb = (w + 7) // 8
    packed = bytearray(rb * h)
    # rows with long white and long black runs at varying phases
    for y in range(h):
        start = 1900 + 517 * y
        for x in range(start, min(start + 2400, w)):
            packed[y * rb + (x >> 3)] |= 0x80 >> (x & 7)
    packed = bytes(packed)
    for comp, opts in ((2, None), (4, None), (3, 0)):
        p = str(tmp_path / "wide.tif")
        _lib_write_bilevel(libtiff, p, w, h, packed, comp, opts)
        with open(p, "rb") as f:
            gw, gh, gc, raw = decode_tiff_pixels(f.read())
        want = bytes(
            255 - 255 * ((packed[y * rb + (x >> 3)] >> (7 - (x & 7))) & 1)
            for y in range(h)
            for x in range(w)
        )
        assert (gw, gh, gc) == (w, h, 1) and raw == want, (comp, opts)
    for comp in (2, 4):
        enc = ccitt_encode(packed, w, h, comp)
        assert ccitt_decode(enc, w, h, comp) == packed, comp
        blob = make_tiff_bytes(
            w, h,
            bytes(
                (packed[y * rb + (x >> 3)] >> (7 - (x & 7))) & 1
                for y in range(h)
                for x in range(w)
            ),
            bit_depth=1, compression=comp,
        )
        p2 = str(tmp_path / "wm.tif")
        with open(p2, "wb") as f:
            f.write(blob)
        got = _lib_read_bilevel(libtiff, p2, w, h)
        nb = w // 8
        for y in range(h):
            assert got[y * rb:y * rb + nb] == packed[y * rb:y * rb + nb], (comp, y)
