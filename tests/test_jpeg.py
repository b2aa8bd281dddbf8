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
    # flip SOF0 (0xC0) to SOF9 (arithmetic sequential) — genuinely gated
    i = jp.index(b"\xff\xc0")
    jp[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="arithmetic"):
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
    # hierarchical/arithmetic frames still gate, without naming lossless
    blob = bytearray(make_jpeg_bytes(8, 8, px))
    at = blob.find(b"\xff\xc0")
    blob[at + 1] = 0xC9  # arithmetic sequential
    with _pytest.raises(NotImplementedError, match="arithmetic"):
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
