"""Baseline JPEG codec (functions/jpeg.py): round-trips through the
encoder twin, zigzag pinning, restart markers, subsampling, gates."""

import numpy as np
import pytest

from architxt_spark.functions.jpeg import (
    ZIGZAG,
    decode_jpeg_pixels,
    make_jpeg_bytes,
)


def test_zigzag_matches_published_sequence():
    """The module's generated zigzag must equal the canonical T.81 scan
    order (pinned via the well-known flat row-major prefix) — encoder
    and decoder share it, so a generation bug would otherwise be
    invisible to round-trips."""
    flat = [r * 8 + c for r, c in ZIGZAG]
    assert flat[:16] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5]
    assert flat[-3:] == [55, 62, 63]
    assert sorted(flat) == list(range(64))


def _const_block_image(w, h, seed, channels=1, block=8):
    import random

    rng = random.Random(seed)
    shape = (h, w, channels) if channels > 1 else (h, w)
    img = np.zeros(shape, dtype=np.uint8)
    for by in range(-(-h // block)):
        for bx in range(-(-w // block)):
            v = [rng.randrange(256) for _ in range(channels)]
            img[by * block:(by + 1) * block, bx * block:(bx + 1) * block] = (
                v if channels > 1 else v[0]
            )
    return img


def test_grayscale_constant_blocks_roundtrip_exactly():
    """DC-only blocks survive quantization bit-exactly (DC step 8)."""
    w, h = 24, 16
    img = _const_block_image(w, h, seed=4)
    jp = make_jpeg_bytes(w, h, img.tobytes(), channels=1)
    gw, gh, ch, raw = decode_jpeg_pixels(jp)
    assert (gw, gh, ch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(raw, dtype=np.uint8).reshape(h, w), img)


def test_grayscale_gradient_and_odd_dims_tolerance():
    """AC path + edge padding/crop: reconstruction within quantization
    tolerance on a gradient, including non-multiple-of-8 dimensions."""
    for w, h in ((24, 16), (13, 9)):
        img = np.tile((np.arange(w) * 7 % 256).astype(np.uint8), (h, 1))
        jp = make_jpeg_bytes(w, h, img.tobytes(), channels=1, quant=2)
        gw, gh, ch, raw = decode_jpeg_pixels(jp)
        assert (gw, gh, ch) == (w, h, 1)
        got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(int)
        assert np.abs(got - img.astype(int)).max() <= 2


@pytest.mark.parametrize("restart", [0, 2])
def test_color_444_and_restart_markers(restart):
    w, h = 24, 16
    rgb = _const_block_image(w, h, seed=9, channels=3)
    jp = make_jpeg_bytes(
        w, h, rgb.tobytes(), channels=3, subsampling="444",
        restart_interval=restart,
    )
    gw, gh, ch, raw = decode_jpeg_pixels(jp)
    assert (gw, gh, ch) == (w, h, 3)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(int)
    # YCbCr forward+inverse rounding: within ±2 per channel
    assert np.abs(got - rgb.astype(int)).max() <= 2


def test_color_420_subsampling():
    """16x16 constant blocks: the 2x2-averaged chroma is constant per
    MCU, so 4:2:0 reconstructs within rounding."""
    w, h = 32, 32
    rgb = _const_block_image(w, h, seed=11, channels=3, block=16)
    jp = make_jpeg_bytes(w, h, rgb.tobytes(), channels=3, subsampling="420")
    gw, gh, ch, raw = decode_jpeg_pixels(jp)
    assert (gw, gh, ch) == (w, h, 3)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3).astype(int)
    assert np.abs(got - rgb.astype(int)).max() <= 2


def test_jpeg_gates_raise_with_guidance():
    img = _const_block_image(8, 8, seed=1)
    jp = bytearray(make_jpeg_bytes(8, 8, img.tobytes(), channels=1))
    # flip SOF0 (0xC0) to SOF11 (arithmetic lossless) — genuinely gated
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xCB
    with pytest.raises(NotImplementedError, match="arithmetic-lossless"):
        decode_jpeg_pixels(bytes(jp))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg_pixels(b"\x89PNG nope")


def test_sof1_extended_sequential_decodes_like_sof0():
    """SOF1 (extended sequential) at 8-bit precision is the same scan
    structure as SOF0 — the decoder must accept the marker."""
    w, h = 24, 16
    img = _const_block_image(w, h, seed=4)
    jp = bytearray(make_jpeg_bytes(w, h, img.tobytes(), channels=1))
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xC1
    gw, gh, ch, raw = decode_jpeg_pixels(bytes(jp))
    assert (gw, gh, ch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(raw, dtype=np.uint8).reshape(h, w), img)


def test_progressive_sof2_structurally_invalid_scan_raises():
    """A baseline full-band scan header under a progressive frame is
    not a gate — it's a corrupt stream, and must raise loudly."""
    img = _const_block_image(8, 8, seed=1)
    jp = bytearray(make_jpeg_bytes(8, 8, img.tobytes(), channels=1))
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xC2
    with pytest.raises(ValueError, match="progressive DC scan"):
        decode_jpeg_pixels(bytes(jp))


@pytest.mark.parametrize(
    "w,h,ch,sub,quant",
    [
        (24, 16, 1, "444", 16),
        (13, 9, 1, "444", 2),
        (24, 16, 3, "444", 16),
        (32, 32, 3, "420", 16),
        (37, 21, 3, "420", 2),
        (64, 48, 3, "444", 2),
    ],
)
def test_progressive_decodes_byte_identical_to_baseline(w, h, ch, sub, quant):
    """Progressive is a lossless reorganization of the same quantized
    coefficients, so SOF2 decode must equal SOF0 decode byte-for-byte —
    the strongest possible correctness gate on the progressive path
    (spectral selection, successive approximation, EOB runs, AC
    refinement correction bits all participate)."""
    rng = np.random.default_rng(hash((w, h, ch, quant)) % (2**32))
    img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
    kw = dict(channels=ch, subsampling=sub, quant=quant)
    base = decode_jpeg_pixels(make_jpeg_bytes(w, h, img.tobytes(), **kw))
    prog = decode_jpeg_pixels(
        make_jpeg_bytes(w, h, img.tobytes(), progressive=True, **kw)
    )
    assert base == prog


def test_progressive_sparse_image_long_eob_runs():
    """A nearly-flat image with isolated spikes drives long EOBRUN
    accumulation across blocks (plus correction bits buffered behind
    the run in the refinement scan)."""
    w, h = 128, 64
    img = np.full((h, w), 128, dtype=np.uint8)
    img[5, 13] = 255
    img[40, 90] = 0
    img[63, 127] = 200
    kw = dict(channels=1, quant=2)
    base = decode_jpeg_pixels(make_jpeg_bytes(w, h, img.tobytes(), **kw))
    prog = decode_jpeg_pixels(
        make_jpeg_bytes(w, h, img.tobytes(), progressive=True, **kw)
    )
    assert base == prog
    got = np.frombuffer(prog[3], dtype=np.uint8).reshape(h, w).astype(int)
    assert abs(int(got[5, 13]) - 255) <= 16  # the spike survives


def test_progressive_constant_blocks_exact():
    """DC-only images exercise only the DC first+refine scans; the
    successive-approximation split (Al=1 then bit 0) must reassemble
    the exact DC coefficients, so pixels round-trip bit-exactly."""
    w, h = 24, 16
    img = _const_block_image(w, h, seed=4)
    jp = make_jpeg_bytes(w, h, img.tobytes(), channels=1, progressive=True)
    gw, gh, ch, raw = decode_jpeg_pixels(jp)
    assert (gw, gh, ch) == (w, h, 1)
    assert np.array_equal(np.frombuffer(raw, dtype=np.uint8).reshape(h, w), img)


def test_extract_features_jpeg_mode(spark):
    from architxt_spark.functions import multimodal as M

    img = _const_block_image(16, 16, seed=5)
    jp = make_jpeg_bytes(16, 16, img.tobytes(), channels=1)
    df = spark.createDataFrame(
        [("1", "image", bytearray(jp))],
        "media_id string, kind string, content binary",
    )
    rows = M.extract_features(df, decoder="jpeg").collect()
    # the feature histogram is over DECODED pixels: recompute directly
    import numpy as _np

    hist = _np.bincount(img.reshape(-1) % 16, minlength=16).astype(float)
    expect = (hist / hist.sum()).tolist()
    got = rows[0].feature
    assert max(abs(a - b) for a, b in zip(got, expect)) < 1e-6


# ---------------------------------------------------------------------------
# r13: 12-bit precision (sequential grayscale — the medical shape)
# ---------------------------------------------------------------------------


def test_12bit_roundtrip_dc_exact_and_gradient():
    import numpy as np

    from architxt_spark.functions.jpeg import decode_jpeg_pixels, make_jpeg_bytes

    W, H = 72, 48
    rng = np.random.default_rng(3)
    base = rng.integers(0, 4096, size=(H // 8, W // 8), dtype=np.uint16)
    px12 = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype("<u2")
    blob = make_jpeg_bytes(W, H, px12.tobytes(), precision=12)
    # SOF precision byte 12, Pq=1 16-bit quant table
    assert blob[blob.find(b"\xff\xc0") + 4] == 12
    assert blob[blob.find(b"\xff\xdb") + 4] == 0x10
    w, h, c, raw = decode_jpeg_pixels(blob)
    assert (w, h, c) == (W, H, 1)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).astype(int)
    want = np.clip(np.rint(px12 / 16.0), 0, 255).astype(int)
    # constant blocks ride the DC-only path: within one 8-bit step
    assert np.abs(got - want).max() <= 1
    # gradients: bounded tolerance like the 8-bit contract
    grad = ((np.arange(H)[:, None] * 40 + np.arange(W)[None, :] * 17) % 4096).astype("<u2")
    w2, h2, _c2, raw2 = decode_jpeg_pixels(
        make_jpeg_bytes(W, H, grad.tobytes(), precision=12)
    )
    got2 = np.frombuffer(raw2, dtype=np.uint8).reshape(h2, w2).astype(int)
    want2 = np.clip(np.rint(grad / 16.0), 0, 255).astype(int)
    assert np.abs(got2 - want2).max() <= 2


def test_12bit_gates():
    import numpy as np
    import pytest as _pytest

    from architxt_spark.functions.jpeg import decode_jpeg_pixels, make_jpeg_bytes

    px = np.zeros(64, dtype="<u2")
    with _pytest.raises(ValueError, match="grayscale"):
        make_jpeg_bytes(8, 8, px.tobytes() * 3, channels=3, precision=12)
    with _pytest.raises(ValueError, match="precision"):
        make_jpeg_bytes(8, 8, bytes(64), precision=10)
    # unpublished precisions stay gated
    blob2 = bytearray(make_jpeg_bytes(8, 8, bytes(64)))
    at2 = blob2.find(b"\xff\xc0")
    blob2[at2 + 4] = 16
    with _pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg_pixels(bytes(blob2))


def test_12bit_progressive_matches_sequential():
    """r14: progressive is a lossless reorganization of the sequential
    coefficient stream — at 12-bit precision too, the SOF2 decode must
    be BYTE-IDENTICAL to the SOF0 decode of the same coefficients."""
    import numpy as np

    from architxt_spark.functions.jpeg import decode_jpeg_pixels, make_jpeg_bytes

    W, H = 72, 48
    rng = np.random.default_rng(14)
    imgs = [
        np.repeat(
            np.repeat(
                rng.integers(0, 4096, size=(H // 8, W // 8), dtype=np.uint16),
                8, axis=0,
            ), 8, axis=1,
        ).astype("<u2"),
        ((np.arange(H)[:, None] * 40 + np.arange(W)[None, :] * 17) % 4096)
        .astype("<u2"),
        rng.integers(0, 4096, size=(H, W), dtype=np.uint16).astype("<u2"),
    ]
    for img in imgs:
        seq = make_jpeg_bytes(W, H, img.tobytes(), precision=12)
        pro = make_jpeg_bytes(W, H, img.tobytes(), precision=12,
                              progressive=True)
        assert pro[pro.find(b"\xff\xc2") + 4] == 12
        assert pro[pro.find(b"\xff\xdb") + 4] == 0x10  # Pq=1 16-bit quant
        assert decode_jpeg_pixels(pro) == decode_jpeg_pixels(seq)


# ---------------------------------------------------------------------------
# r14: lossless (SOF3) — exact by construction
# ---------------------------------------------------------------------------


def test_lossless_roundtrip_all_predictors_and_precisions():
    import numpy as np

    from architxt_spark.functions.jpeg import (
        _decode_lossless_samples,
        decode_jpeg_pixels,
        make_jpeg_bytes,
    )

    rng = np.random.default_rng(41)
    for prec in (8, 12, 16, 4, 2):
        for pred in range(1, 8):
            H, W = 13, 17
            img = rng.integers(0, 1 << prec, size=(H, W))
            dt = np.uint8 if prec <= 8 else "<u2"
            blob = make_jpeg_bytes(
                W, H, img.astype(dt).tobytes(), precision=prec,
                lossless=True, predictor=pred,
            )
            assert blob[blob.find(b"\xff\xc3") + 4] == prec
            w, h, c, out = decode_jpeg_pixels(blob)
            assert (w, h, c) == (W, H, 1)
            want = np.clip(np.rint(img / 2.0 ** (prec - 8)), 0, 255)
            got = np.frombuffer(out, dtype=np.uint8).reshape(h, w)
            assert (got == want.astype(np.uint8)).all(), (prec, pred)


def test_lossless_raw_samples_bit_identical():
    # the decoder's full-precision grid, before the 8-bit contract
    # downscale, must reproduce the input samples EXACTLY — the
    # losslessness claim itself
    import struct as _struct

    import numpy as np

    from architxt_spark.functions.jpeg import (
        _build_huffman,
        _decode_lossless_samples,
        make_jpeg_bytes,
    )

    rng = np.random.default_rng(42)
    H, W = 9, 11
    img = rng.integers(0, 4096, size=(H, W))
    blob = make_jpeg_bytes(
        W, H, img.astype("<u2").tobytes(), precision=12,
        lossless=True, predictor=4,
    )
    # walk to the SOS body + entropy start
    pos, huff, frame, body = 2, {}, None, None
    while True:
        marker = blob[pos + 1]
        (ln,) = _struct.unpack(">H", blob[pos + 2:pos + 4])
        seg = blob[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xC4:
            bits = list(seg[1:17])
            huff[(0, seg[0] & 0x0F)] = _build_huffman(
                bits, list(seg[17:17 + sum(bits)])
            )
        elif marker == 0xC3:
            prec, h, w, nc = _struct.unpack(">BHHB", seg[:6])
            frame = (w, h, [(seg[6], 1, 1, 0)])
        elif marker == 0xDA:
            body = seg
            break
    arr = _decode_lossless_samples(blob, pos, frame, body, huff, 12)
    assert (arr == img).all()


def test_lossless_gates_and_validation():
    import numpy as np
    import pytest as _pytest

    from architxt_spark.functions.jpeg import decode_jpeg_pixels, make_jpeg_bytes

    px = np.zeros(64, dtype=np.uint8).tobytes()
    with _pytest.raises(ValueError, match="component"):
        make_jpeg_bytes(8, 8, px * 2, channels=2, lossless=True)
    with _pytest.raises(ValueError, match="progressive"):
        make_jpeg_bytes(8, 8, px, lossless=True, progressive=True)
    with _pytest.raises(ValueError, match="predictor"):
        make_jpeg_bytes(8, 8, px, lossless=True, predictor=8)
    with _pytest.raises(ValueError, match="range"):
        make_jpeg_bytes(8, 8, bytes([200]) * 64, lossless=True, precision=7)
    # hierarchical/arithmetic-lossless frames still gate
    blob = bytearray(make_jpeg_bytes(8, 8, px))
    at = blob.find(b"\xff\xc0")
    blob[at + 1] = 0xCB  # arithmetic lossless
    with _pytest.raises(NotImplementedError, match="arithmetic-lossless"):
        decode_jpeg_pixels(bytes(blob))


def test_lossless_rgb_interleaved_roundtrip():
    """3-component 1:1 lossless: components interleave one sample per
    MCU with per-component prediction state, no color transform."""
    import numpy as np

    from architxt_spark.functions.jpeg import decode_jpeg_pixels, make_jpeg_bytes

    rng = np.random.default_rng(43)
    H, W = 7, 10
    img = rng.integers(0, 256, size=(H, W, 3), dtype=np.uint8)
    for pred in (1, 4, 7):
        blob = make_jpeg_bytes(
            W, H, img.tobytes(), channels=3, lossless=True, predictor=pred
        )
        w, h, c, out = decode_jpeg_pixels(blob)
        assert (w, h, c) == (W, H, 3)
        assert (np.frombuffer(out, dtype=np.uint8).reshape(H, W, 3) == img).all()


# ---------------------------------------------------------------------------
# r14: arithmetic entropy coding (SOF9/SOF10) — validated against the
# SYSTEM libjpeg as an independent arbiter when it is present
# ---------------------------------------------------------------------------


def test_qe_table_matches_system_libjpeg():
    """The transcribed T.81 Table D.3 must equal the state machine the
    system libjpeg exports (``jpeg_aritab``) — a single wrong row would
    keep self-round-trips green while silently breaking interop."""
    import ctypes
    import ctypes.util

    from architxt_spark.functions.jpeg import _QE_TABLE

    name = ctypes.util.find_library("jpeg")
    if not name:
        pytest.skip("no system libjpeg to pin against")
    lib = ctypes.CDLL(name)
    try:
        raw = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    except ValueError:
        pytest.skip("libjpeg without exported jpeg_aritab")
    for i, v in enumerate(raw):
        qe = (v >> 16) & 0xFFFF
        nmps = (v >> 8) & 0xFF
        sw = (v >> 7) & 1
        nlps = v & 0x7F
        assert _QE_TABLE[i] == (qe, nlps, nmps, sw), f"row {i}"
    assert len(_QE_TABLE) == 114


def test_qm_coder_random_bit_roundtrip():
    """The raw QM layer: random decision sequences over adaptive bins
    must decode back exactly, across enough volume to exercise 0xFF00
    stuffing and carry ripples."""
    from architxt_spark.functions.jpeg import _ArithDecoder, _ArithEncoder, _Stats

    rng = np.random.default_rng(1)
    stuffed = 0
    for _ in range(120):
        nbits = int(rng.integers(1, 500))
        nbins = int(rng.integers(1, 8))
        bits = rng.integers(0, 2, size=nbits).tolist()
        bins = rng.integers(0, nbins, size=nbits).tolist()
        enc = _ArithEncoder()
        st = _Stats(nbins)
        for b, i in zip(bits, bins):
            enc.encode(st, i, int(b))
        data = enc.flush() + b"\xff\xd9"
        stuffed += data[:-2].count(b"\xff\x00")
        dec = _ArithDecoder(data, 0)
        st2 = _Stats(nbins)
        assert [dec.decode(st2, i) for i in bins] == bits
    assert stuffed > 0  # the stuffing path genuinely ran


def test_arithmetic_decodes_identical_to_huffman():
    """SOF9/SOF10 re-encode the same quantized coefficients as the
    Huffman twins, so decodes must be BYTE-IDENTICAL — sequential,
    progressive, color, 4:2:0, restart markers, and 12-bit."""
    rng = np.random.default_rng(7)
    cases = [
        dict(w=64, h=64, ch=1),
        dict(w=24, h=40, ch=1),
        dict(w=32, h=48, ch=3),
        dict(w=40, h=48, ch=3, subsampling="420"),
        dict(w=56, h=80, ch=1, restart_interval=3),
        dict(w=64, h=64, ch=1, progressive=True),
        dict(w=32, h=48, ch=3, progressive=True),
    ]
    for case in cases:
        w, h, ch = case.pop("w"), case.pop("h"), case.pop("ch")
        raw = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        base = dict(case)
        base.pop("restart_interval", None)
        jh = make_jpeg_bytes(w, h, raw, channels=ch, **base)
        ja = make_jpeg_bytes(w, h, raw, channels=ch, arithmetic=True, **case)
        assert ja != jh
        assert decode_jpeg_pixels(ja) == decode_jpeg_pixels(jh), case


def test_arithmetic_12bit_identical_to_huffman_12bit():
    rng = np.random.default_rng(13)
    raw = rng.integers(0, 4096, size=(40, 48), dtype="<u2").tobytes()
    ref = decode_jpeg_pixels(make_jpeg_bytes(48, 40, raw, precision=12))
    for kw in (dict(), dict(progressive=True)):
        ja = make_jpeg_bytes(48, 40, raw, precision=12, arithmetic=True, **kw)
        assert decode_jpeg_pixels(ja) == ref


def test_arithmetic_lossless_fixture_gate():
    with pytest.raises(ValueError, match="SOF11"):
        make_jpeg_bytes(8, 8, bytes(64), lossless=True, arithmetic=True)


# --- libjpeg interop (compiled on demand; skipped without cc/jpeglib) ---


@pytest.fixture(scope="module")
def jpeg_oracle(tmp_path_factory):
    import pathlib
    import shutil
    import subprocess

    cc = shutil.which("cc") or shutil.which("gcc")
    src = pathlib.Path(__file__).resolve().parent.parent / "tools" / "jpeg_oracle.c"
    if not cc or not src.exists():
        pytest.skip("no C compiler for the libjpeg oracle")
    exe = tmp_path_factory.mktemp("jpeg_oracle") / "jpeg_oracle"
    r = subprocess.run(
        [cc, "-O2", "-o", str(exe), str(src), "-ljpeg"], capture_output=True
    )
    if r.returncode != 0:
        pytest.skip(f"libjpeg oracle build failed: {r.stderr.decode()[:200]}")
    return str(exe)


def _oracle_encode(exe, raw, w, h, ch, q=85, prog=0, arith=0, rst=0):
    import subprocess

    p = subprocess.run(
        [exe, "e", str(w), str(h), str(ch), str(q), str(prog), str(arith),
         "1", str(rst)],
        input=raw, capture_output=True,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def _oracle_decode(exe, blob):
    import subprocess

    p = subprocess.run([exe, "d"], input=blob, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def test_libjpeg_decodes_our_arithmetic_files(jpeg_oracle):
    """The independent decoder must read our SOF9/SOF10 output and see
    the SAME pixels it sees in our Huffman twin of the same image —
    an exact assertion (identical coefficients, its own IDCT both
    times)."""
    rng = np.random.default_rng(21)
    for ch, prog, rst in [(1, False, 0), (3, False, 0), (1, True, 0),
                          (3, True, 0), (1, False, 4)]:
        h, w = 56, 48
        raw = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        jh = make_jpeg_bytes(w, h, raw, channels=ch, progressive=prog)
        ja = make_jpeg_bytes(
            w, h, raw, channels=ch, progressive=prog, arithmetic=True,
            restart_interval=rst,
        )
        assert _oracle_decode(jpeg_oracle, ja) == _oracle_decode(jpeg_oracle, jh)


def test_our_decoder_reads_libjpeg_arithmetic_files(jpeg_oracle):
    """Reverse direction: libjpeg encodes the same pixels with Huffman
    and arithmetic entropy coding (identical coefficients); our decodes
    of the two files must be byte-identical, and within IDCT rounding
    of libjpeg's own decode."""
    rng = np.random.default_rng(31)
    for ch, prog, rst in [(1, 0, 0), (3, 0, 0), (1, 1, 0), (3, 1, 0),
                          (1, 0, 3)]:
        h, w = 64, 40
        raw = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        lh = _oracle_encode(jpeg_oracle, raw, w, h, ch, prog=prog, rst=rst)
        la = _oracle_encode(jpeg_oracle, raw, w, h, ch, prog=prog, arith=1, rst=rst)
        mh = decode_jpeg_pixels(lh)
        ma = decode_jpeg_pixels(la)
        assert mh == ma, (ch, prog, rst)
        ref = np.frombuffer(
            _oracle_decode(jpeg_oracle, la).split(b"255\n", 1)[1], dtype=np.uint8
        ).astype(int)
        mine = np.frombuffer(ma[3], dtype=np.uint8).astype(int)
        assert mine.shape == ref.shape
        # float vs fixed-point IDCT + YCbCr rounding: ±3 per sample
        assert np.abs(mine - ref).max() <= 3, (ch, prog, rst)


def test_libjpeg_huffman_interop_both_directions(jpeg_oracle):
    """Retro-validation of the r12-r14 Huffman codec against the
    independent engine: libjpeg reads our sequential/progressive files
    (same-coefficient exactness via the twin trick) and we read its."""
    rng = np.random.default_rng(41)
    h, w = 48, 56
    for ch, prog in [(1, False), (3, False), (1, True), (3, True)]:
        raw = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8).tobytes()
        ours = make_jpeg_bytes(w, h, raw, channels=ch, progressive=prog)
        got = np.frombuffer(
            _oracle_decode(jpeg_oracle, ours).split(b"255\n", 1)[1],
            dtype=np.uint8,
        ).astype(int)
        mine = np.frombuffer(decode_jpeg_pixels(ours)[3], dtype=np.uint8).astype(int)
        assert got.shape == mine.shape
        assert np.abs(got - mine).max() <= 3, (ch, prog, "libjpeg reads ours")
        theirs = _oracle_encode(jpeg_oracle, raw, w, h, ch, q=92, prog=int(prog))
        mine2 = np.frombuffer(decode_jpeg_pixels(theirs)[3], dtype=np.uint8).astype(int)
        ref2 = np.frombuffer(
            _oracle_decode(jpeg_oracle, theirs).split(b"255\n", 1)[1],
            dtype=np.uint8,
        ).astype(int)
        assert mine2.shape == ref2.shape
        assert np.abs(mine2 - ref2).max() <= 3, (ch, prog, "we read libjpeg's")


def test_arithmetic_volume_fuzz_against_libjpeg(jpeg_oracle):
    """Byte-boundary edge cases (0xFF00 stuffing, carry ripples, marker
    truncation) are ~1-in-256-per-byte events — volume, not hand-picked
    fixtures, is what exercises them (the r13 PDF lesson)."""
    rng = np.random.default_rng(99)
    stuffed = 0
    for t in range(40):
        h = int(rng.integers(8, 81))
        w = int(rng.integers(8, 81))
        ch = int(rng.choice([1, 1, 3]))
        prog = bool(rng.integers(0, 2))
        rst = 0 if prog else int(rng.choice([0, 0, 2]))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            arr = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        elif kind == 1:
            arr = np.full((h, w, ch), int(rng.integers(0, 256)), dtype=np.uint8)
        else:
            arr = (
                np.arange(h)[:, None, None] * 3
                + np.arange(w)[None, :, None] * 5
                + np.arange(ch)
            ).astype(np.uint8)
        raw = arr.tobytes()
        jh = make_jpeg_bytes(w, h, raw, channels=ch, progressive=prog)
        ja = make_jpeg_bytes(
            w, h, raw, channels=ch, progressive=prog, arithmetic=True,
            restart_interval=rst,
        )
        stuffed += ja.count(b"\xff\x00")
        assert decode_jpeg_pixels(ja) == decode_jpeg_pixels(jh), (t, h, w, ch, prog, rst)
        assert _oracle_decode(jpeg_oracle, ja) == _oracle_decode(jpeg_oracle, jh), (
            t, h, w, ch, prog, rst,
        )
        if t % 4 == 0:
            q = int(rng.integers(30, 101))
            lh = _oracle_encode(jpeg_oracle, raw, w, h, ch, q=q, prog=int(prog), rst=rst)
            la = _oracle_encode(
                jpeg_oracle, raw, w, h, ch, q=q, prog=int(prog), arith=1, rst=rst
            )
            assert decode_jpeg_pixels(lh) == decode_jpeg_pixels(la), (t, "reverse")
    assert stuffed > 0
