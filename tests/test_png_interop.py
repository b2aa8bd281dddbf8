"""PNG codec cross-validated against the SYSTEM libpng (r14.5) — the
independent-arbiter pattern (DuckDB : SQL :: libjpeg : JPEG :: libpng :
PNG).  PNG is lossless, so every assertion is EXACT byte equality."""

import numpy as np
import pytest

from architxt_spark.functions.multimodal import decode_png_pixels, make_png_bytes


@pytest.fixture(scope="module")
def png_oracle(tmp_path_factory):
    import pathlib
    import shutil
    import subprocess

    cc = shutil.which("cc") or shutil.which("gcc")
    src = pathlib.Path(__file__).resolve().parent.parent / "tools" / "png_oracle.c"
    if not cc or not src.exists():
        pytest.skip("no C compiler for the libpng oracle")
    exe = tmp_path_factory.mktemp("png_oracle") / "png_oracle"
    r = subprocess.run(
        [cc, "-O2", "-o", str(exe), str(src), "-lpng"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libpng oracle build failed: {r.stderr.decode()[:200]}")
    return str(exe)


def _oracle_decode(exe, blob):
    import subprocess

    p = subprocess.run([exe, "d"], input=blob, capture_output=True)
    assert p.returncode == 0, p.stderr
    head, raw = p.stdout.split(b"\n", 1)
    ch, w, h = map(int, head.split())
    return w, h, ch, raw


def test_libpng_decodes_our_fixtures_exactly(png_oracle):
    """Every (color type × filter × interlace) our encoder twin writes
    must decode identically in libpng — catching filter/Adam7 bugs our
    own round-trip could mask symmetrically."""
    rng = np.random.default_rng(3)
    for ct, ch in ((0, 1), (2, 3), (3, 1)):
        for ft in range(5):
            for il in (0, 1):
                w, h = 13, 9
                if ct == 3:
                    palette = bytes(rng.integers(0, 256, 48, dtype=np.uint8))
                    px = bytes(rng.integers(0, 16, w * h, dtype=np.uint8))
                    blob = make_png_bytes(
                        w, h, px, color_type=3, filter_type=ft,
                        palette=palette, interlace=il,
                    )
                else:
                    px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
                    blob = make_png_bytes(
                        w, h, px, color_type=ct, filter_type=ft, interlace=il
                    )
                assert _oracle_decode(png_oracle, blob) == decode_png_pixels(blob), (
                    ct, ft, il,
                )


def test_libpng_decodes_our_depth_variants_exactly(png_oracle):
    """Sub-byte greyscale (bit replication) and 16-bit (high-byte
    strip) reductions must match libpng's expand/strip transforms."""
    rng = np.random.default_rng(5)
    w, h = 10, 7
    for depth in (1, 2, 4, 16):
        top = 2 if depth == 1 else (4 if depth == 2 else (16 if depth == 4 else 256))
        px = bytes(rng.integers(0, top, w * h, dtype=np.uint16).astype(np.uint8))
        blob = make_png_bytes(w, h, px, color_type=0, bit_depth=depth)
        assert _oracle_decode(png_oracle, blob) == decode_png_pixels(blob), depth


def test_our_decoder_reads_libpng_files_exactly(png_oracle):
    """Reverse direction: libpng-written files (its own filter
    heuristics, its own Adam7 writer) decode to the original samples —
    including the alpha channel shapes our twin doesn't write."""
    import subprocess

    rng = np.random.default_rng(7)
    for ch in (1, 2, 3, 4):
        for il in (0, 1):
            w, h = 17, 11
            raw = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
            p = subprocess.run(
                [png_oracle, "e", str(w), str(h), str(ch), str(il)],
                input=raw, capture_output=True,
            )
            assert p.returncode == 0, p.stderr
            assert decode_png_pixels(p.stdout) == (w, h, ch, raw), (ch, il)


def test_png_volume_fuzz_against_libpng(png_oracle):
    """Random dimensions/content both directions — odd sizes drive the
    Adam7 pass-geometry edge cases (passes with zero columns/rows)."""
    import subprocess

    rng = np.random.default_rng(99)
    for t in range(60):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        ch = int(rng.choice([1, 3]))
        il = int(rng.integers(0, 2))
        ft = int(rng.integers(0, 5))
        px = bytes(rng.integers(0, 256, w * h * ch, dtype=np.uint8))
        blob = make_png_bytes(
            w, h, px, color_type=0 if ch == 1 else 2, filter_type=ft,
            interlace=il,
        )
        assert _oracle_decode(png_oracle, blob) == decode_png_pixels(blob), (
            t, w, h, ch, il, ft, "forward",
        )
        ch2 = int(rng.choice([1, 2, 3, 4]))
        raw = bytes(rng.integers(0, 256, w * h * ch2, dtype=np.uint8))
        p = subprocess.run(
            [png_oracle, "e", str(w), str(h), str(ch2), str(il)],
            input=raw, capture_output=True,
        )
        assert p.returncode == 0, p.stderr
        assert decode_png_pixels(p.stdout) == (w, h, ch2, raw), (
            t, w, h, ch2, il, "reverse",
        )
