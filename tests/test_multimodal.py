"""Multimodal codec tests: the REAL stdlib PNG/WAV decoders (round-trip
through the fixture builders), the magic-byte dispatch, the strict/lax
Arrow decode pass, and the JVM codegen PNG header path's parity with the
Python decoder."""

import pytest

from architxt_spark.functions import multimodal as M


def test_png_roundtrip_and_validation():
    for w, h in [(1, 1), (64, 17), (1920, 1080), (2**24, 3)]:
        assert M.decode_png_dims(M.make_png_bytes(w, h)) == (w, h)
    with pytest.raises(ValueError):
        M.decode_png_dims(b"not a png at all, but long enough to read")
    with pytest.raises(ValueError):
        # right signature, wrong first chunk
        bad = M.PNG_MAGIC + b"\x00\x00\x00\x0dIDAT" + b"\x00" * 17
        M.decode_png_dims(bad)


def test_wav_roundtrip():
    for ch, rate, frames in [(1, 8000, 800), (2, 44100, 44100), (1, 16000, 4000)]:
        got = M.decode_wav_meta(M.make_wav_bytes(ch, rate, frames))
        assert got == (ch, rate, frames * 1000 // rate)


def test_sniff_format():
    assert M.sniff_format(M.make_png_bytes(2, 2)) == "png"
    assert M.sniff_format(M.make_wav_bytes(1, 8000, 10)) == "wav"
    assert M.sniff_format(b"\xff\xd8\xff\xe0 jpeg-ish") == "jpeg"
    assert M.sniff_format(b"BM bitmap bytes here") is None


def test_decode_image_png_real_other_stubbed():
    assert M.decode_image(M.make_png_bytes(5, 9)) == (5, 9)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"BM bitmap bytes: no stdlib header reader")
    with pytest.raises(ValueError):  # sniffs as JPEG but has no SOF
        M.decode_image(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")


def test_decode_media_meta_strict_and_lax(spark):
    rows = [
        ("p1", "image", M.make_png_bytes(10, 20)),
        ("w1", "audio", M.make_wav_bytes(2, 8000, 160)),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, content binary")
    got = {r.media_id: r for r in M.decode_media_meta(df).collect()}
    assert (got["p1"].fmt, got["p1"].width, got["p1"].height) == ("png", 10, 20)
    assert (got["w1"].fmt, got["w1"].n_channels, got["w1"].sample_rate, got["w1"].duration_ms) == (
        "wav", 2, 8000, 20,
    )

    mixed = spark.createDataFrame(
        rows + [("x1", "image", b"BM bitmap"), ("x2", "image", b"\xff\xd8\xff truncated")],
        "media_id string, kind string, content binary",
    )
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.decode_media_meta(mixed, strict=True).collect()
    lax = {r.media_id: r for r in M.decode_media_meta(mixed, strict=False).collect()}
    assert lax["x1"].fmt is None and lax["x1"].width is None
    # sniffed-but-corrupt payload: format kept, metadata NULL, no job kill
    assert lax["x2"].fmt == "jpeg" and lax["x2"].width is None

    # NULL content is missing data, not a codec error — NULL metadata
    # even in strict mode
    with_null = spark.createDataFrame(
        rows + [("n1", "image", None)], "media_id string, kind string, content binary"
    )
    got2 = {r.media_id: r for r in M.decode_media_meta(with_null, strict=True).collect()}
    assert got2["n1"].fmt is None and got2["n1"].width is None


def test_jvm_png_dims_match_python_decoder(spark):
    import pyspark.sql.functions as F

    rows = [(f"m{i}", M.make_png_bytes(i * 13 % 500 + 1, i * 7 % 300 + 1)) for i in range(20)]
    rows.append(("notpng", b"RIFF\x00\x00\x00\x00WAVEfmt not a png"))
    df = spark.createDataFrame(rows, "media_id string, content binary")
    w, h = M.png_dims_cols("content")
    got = {
        r.media_id: (r.w, r.h)
        for r in df.select("media_id", w.alias("w"), h.alias("h")).collect()
    }
    for media_id, content in rows:
        if media_id == "notpng":
            assert got[media_id] == (None, None)
        else:
            assert got[media_id] == M.decode_png_dims(content)


def _make_jpeg(width, height):
    """Minimal JPEG byte stream: SOI, APP0, a DHT (to prove marker
    walking skips non-SOF C-range markers correctly), SOF0, EOI."""
    import struct

    soi = b"\xff\xd8"
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return soi + app0 + dht + sof0 + b"\xff\xd9"


def _make_gif(width, height):
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00" + b"\x3b"


def test_jpeg_gif_dims():
    from architxt_spark.functions.multimodal import (
        decode_gif_dims,
        decode_image,
        decode_jpeg_dims,
        sniff_format,
    )

    jpg = _make_jpeg(640, 480)
    assert sniff_format(jpg) == "jpeg"
    assert decode_jpeg_dims(jpg) == (640, 480)
    assert decode_image(jpg) == (640, 480)

    gif = _make_gif(12, 7)
    assert sniff_format(gif) == "gif"
    assert decode_gif_dims(gif) == (12, 7)
    assert decode_image(gif) == (12, 7)

    with pytest.raises(ValueError):
        decode_jpeg_dims(b"\xff\xd8\xff\xe0\x00\x04\x00\x00\xff\xd9")  # no SOF
    with pytest.raises(ValueError):
        decode_gif_dims(b"GIF00a\x00\x00\x00\x00")


def test_decode_media_meta_jpeg_gif(spark):
    from architxt_spark.functions.multimodal import decode_media_meta

    rows = [
        ("j1", "image", bytearray(_make_jpeg(320, 200))),
        ("g1", "image", bytearray(_make_gif(64, 32))),
    ]
    df = spark.createDataFrame(rows, "media_id string, kind string, content binary")
    out = {r.media_id: r for r in decode_media_meta(df).collect()}
    assert (out["j1"].fmt, out["j1"].width, out["j1"].height) == ("jpeg", 320, 200)
    assert (out["g1"].fmt, out["g1"].width, out["g1"].height) == ("gif", 64, 32)


from hypothesis import given, settings, strategies as st


@settings(max_examples=100, deadline=None)
@given(data=st.binary(max_size=300))
def test_header_decoders_robust_property(data):
    """Arbitrary bytes either decode to sane dimensions or raise
    ValueError — never hang, never raise anything else (the lax-mode
    degradation contract relies on this)."""
    for dec in (M.decode_png_dims, M.decode_jpeg_dims, M.decode_gif_dims):
        try:
            w, h = dec(data)
            assert w >= 0 and h >= 0
        except ValueError:
            pass
    M.sniff_format(data)  # never raises


def test_png_pixel_roundtrip_all_filters_and_color_types():
    """decode_png_pixels inverts the encoder at every RFC 2083 filter
    type and supported color type — real pixels, stdlib only."""
    import random

    rng = random.Random(3)
    for color_type, channels in ((0, 1), (2, 3), (4, 2), (6, 4)):
        w, h = 7, 5
        pixels = bytes(rng.randrange(256) for _ in range(w * h * channels))
        for ftype in range(5):
            png = M.make_png_bytes(
                w, h, pixels, color_type=color_type, filter_type=ftype
            )
            got = M.decode_png_pixels(png)
            assert got == (w, h, channels, pixels), (color_type, ftype)


def test_png_pixel_unsupported_shapes_raise():
    import struct
    import zlib

    # off-matrix shape (palette at 16-bit is illegal per the spec)
    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
    bad_png = (
        M.PNG_MAGIC + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="spec matrix"):
        M.decode_png_pixels(bad_png)
    # palette image with no PLTE chunk is corrupt, not gated
    ihdr3 = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    no_plte = (
        M.PNG_MAGIC + chunk(b"IHDR", ihdr3)
        + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="PLTE"):
        M.decode_png_pixels(no_plte)
    # header-only fixture (empty IDAT) → ValueError, not garbage pixels
    with pytest.raises(ValueError, match="payload"):
        M.decode_png_pixels(M.make_png_bytes(4, 4))
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png_pixels(b"\xff\xd8nope")


def test_png_pixel_palette_depths_and_16bit():
    """r11.5 matrix: palette expansion through PLTE at depths 1/2/4/8,
    sub-byte greyscale scaling, and the 16-bit high-byte reduction."""
    import random

    rng = random.Random(23)
    pal = bytes(rng.randrange(256) for _ in range(16 * 3))
    for depth in (1, 2, 4, 8):
        n = min(16, 1 << depth)
        idx = bytes(rng.randrange(n) for _ in range(13 * 9))
        blob = M.make_png_bytes(13, 9, idx, palette=pal, bit_depth=depth)
        expect = b"".join(pal[3 * i:3 * i + 3] for i in idx)
        assert M.decode_png_pixels(blob) == (13, 9, 3, expect), depth
    for depth in (1, 2, 4):
        mask = (1 << depth) - 1
        vals = bytes(rng.randrange(mask + 1) for _ in range(13 * 9))
        blob = M.make_png_bytes(13, 9, vals, color_type=0, bit_depth=depth)
        expect = bytes(v * 255 // mask for v in vals)
        assert M.decode_png_pixels(blob) == (13, 9, 1, expect), depth
    px = bytes(rng.randrange(256) for _ in range(13 * 9 * 3))
    blob = M.make_png_bytes(13, 9, px, color_type=2, bit_depth=16)
    assert M.decode_png_pixels(blob) == (13, 9, 3, px)


def test_png_pixel_adam7_interlace():
    """Adam7 seven-pass de-interlace across color types, filters, and
    edge dims where some passes are empty."""
    import random

    rng = random.Random(29)
    for (w, h), ct, nch, ft in (
        ((17, 11), 0, 1, 0), ((17, 11), 2, 3, 1), ((17, 11), 6, 4, 4),
        ((3, 2), 0, 1, 0), ((8, 8), 4, 2, 2), ((1, 1), 2, 3, 0),
    ):
        px = bytes(rng.randrange(256) for _ in range(w * h * nch))
        blob = M.make_png_bytes(
            w, h, px, color_type=ct, filter_type=ft, interlace=1
        )
        assert M.decode_png_pixels(blob) == (w, h, nch, px), (w, h, ct, ft)
    # interlaced palette
    pal = bytes(rng.randrange(256) for _ in range(8 * 3))
    idx = bytes(rng.randrange(8) for _ in range(10 * 7))
    blob = M.make_png_bytes(10, 7, idx, palette=pal, bit_depth=4, interlace=1)
    expect = b"".join(pal[3 * i:3 * i + 3] for i in idx)
    assert M.decode_png_pixels(blob) == (10, 7, 3, expect)


def test_extract_features_real_png_pixels(spark):
    """decoder='png': the feature histogram is computed over DECODED
    pixels (filter-invariant — two encodings of the same image give the
    same feature; the fake byte-histogram differs across encodings)."""
    import random

    rng = random.Random(9)
    pixels = bytes(rng.randrange(256) for _ in range(6 * 4 * 3))
    png_f0 = M.make_png_bytes(6, 4, pixels, color_type=2, filter_type=0)
    png_f4 = M.make_png_bytes(6, 4, pixels, color_type=2, filter_type=4)
    assert png_f0 != png_f4  # different files on disk ...
    df = spark.createDataFrame(
        [("1", "image", bytearray(png_f0)), ("2", "image", bytearray(png_f4))],
        "media_id string, kind string, content binary",
    )
    rows = {r.media_id: r.feature for r in M.extract_features(df, decoder="png").collect()}
    assert rows["1"] == rows["2"]  # ... same decoded image -> same feature
    fake = {r.media_id: r.feature for r in M.extract_features(df).collect()}
    assert fake["1"] != fake["2"]  # the fake is encoding-dependent
    # non-PNG content in png mode raises like any real codec would
    bad = spark.createDataFrame(
        [("3", "image", bytearray(b"\xff\xd8\xff\xe0jpegish"))],
        "media_id string, kind string, content binary",
    )
    with pytest.raises(Exception, match="not a PNG"):
        M.extract_features(bad, decoder="png").collect()


def test_wav_sample_roundtrip_and_audio_feature(spark):
    """decode_wav_samples inverts the fixture writer (de-interleaved
    per-channel int16), and decoder='wav' features are amplitude-based:
    silence -> bin 0, a full-scale square wave -> bin 15."""
    left = [1000, -2000, 3000, -4000]
    right = [-1, 2, -3, 4]
    wav = M.make_wav_bytes(2, 8000, 4, samples=[left, right])
    ch, rate, chans = M.decode_wav_samples(wav)
    assert (ch, rate) == (2, 8000)
    assert chans == [left, right]

    silence = M.make_wav_bytes(1, 8000, 64)
    square = M.make_wav_bytes(
        1, 8000, 64, samples=[[32000 if i % 2 else -32000 for i in range(64)]]
    )
    df = spark.createDataFrame(
        [("s", "audio", bytearray(silence)), ("q", "audio", bytearray(square))],
        "media_id string, kind string, content binary",
    )
    feats = {r.media_id: r.feature for r in M.extract_features(df, decoder="wav").collect()}
    assert feats["s"][0] == 1.0 and sum(feats["s"][1:]) == 0.0
    assert feats["q"][15] == 1.0 and sum(feats["q"][:15]) == 0.0


def test_gif_pixel_roundtrip_and_structure():
    """decode_gif_pixels inverts the uncompressed-LZW fixture writer
    (palette-mapped RGB), survives >255-byte data sub-blocks and
    extension blocks, and raises on interlace."""
    import random

    rng = random.Random(11)
    palette = bytes(rng.randrange(256) for _ in range(3 * 5))  # 5 colors
    w, h = 31, 17  # 527 indices -> multiple 255-byte sub-blocks
    indices = bytes(rng.randrange(5) for _ in range(w * h))
    gif = M.make_gif_bytes(w, h, indices, palette)
    assert M.sniff_format(gif) == "gif" and M.decode_gif_dims(gif) == (w, h)
    gw, gh, ch, rgb = M.decode_gif_pixels(gif)
    assert (gw, gh, ch) == (w, h, 3)
    expect = b"".join(palette[3 * i:3 * i + 3] for i in indices)
    assert rgb == expect

    # a graphic-control extension before the image block is skipped
    body = gif[13 + 3 * 8:]  # after header + padded 8-color table
    with_ext = gif[:13 + 3 * 8] + b"\x21\xf9\x04\x00\x00\x00\x00\x00" + body
    assert M.decode_gif_pixels(with_ext)[3] == expect

    # interlaced GIF (r11.5): four-pass row order de-interlaces back to
    # the same pixels the sequential encoding yields
    gif_il = M.make_gif_bytes(w, h, indices, palette, interlace=True)
    assert gif_il != gif  # rows genuinely reordered on the wire
    assert M.decode_gif_pixels(gif_il) == (w, h, 3, expect)
    with pytest.raises(ValueError, match="not a GIF"):
        M.decode_gif_pixels(b"PNG?")


def test_resample_pcm_linear():
    """Identity at equal rates; constants stay constant; a linear ramp
    resampled 2x interpolates midpoints; length = round(n*to/from)."""
    const = [[100] * 8]
    assert M.resample_pcm(const, 8000, 8000) == const
    up = M.resample_pcm(const, 8000, 16000)[0]
    assert len(up) == 16 and set(up) == {100}
    ramp = [[0, 10, 20, 30]]
    up = M.resample_pcm(ramp, 1000, 2000)[0]
    assert up[:7] == [0, 5, 10, 15, 20, 25, 30]
    down = M.resample_pcm([[0, 10, 20, 30, 40, 50, 60, 70]], 2000, 1000)[0]
    assert down == [0, 20, 40, 60]
    import pytest as _p

    with _p.raises(ValueError):
        M.resample_pcm([[1]], 0, 100)


def test_avi_mjpeg_frame_sampling(spark):
    """REAL video path for MJPEG-in-AVI: RIFF walk + in-repo JPEG decode;
    every_ms picks one frame per window; non-MJPEG raises."""
    import numpy as np

    from architxt_spark.functions.jpeg import make_jpeg_bytes

    # 6 frames at 10 fps (100ms/frame), each a distinct constant image
    frames = []
    vals = [0, 40, 80, 120, 160, 200]
    for v in vals:
        img = np.full((8, 8), v, dtype=np.uint8)
        frames.append(make_jpeg_bytes(8, 8, img.tobytes(), channels=1))
    avi = M.make_avi_mjpeg_bytes(frames, us_per_frame=100_000)

    got_frames, uspf = M.parse_avi_mjpeg(avi)
    assert len(got_frames) == 6 and uspf == 100_000
    assert got_frames[3] == frames[3]

    df = spark.createDataFrame(
        [("v1", "video", bytearray(avi))],
        "media_id string, kind string, content binary",
    )
    rows = M.sample_video_frames(df, every_ms=300).collect()
    # stride = 300ms / 100ms = 3 -> frames 0 and 3
    assert [(r.frame_idx, r.t_ms) for r in rows] == [(0, 0), (3, 300)]
    for r, v in zip(rows, (vals[0], vals[3])):
        assert (r.width, r.height, r.channels) == (8, 8, 1)
        assert set(bytes(r.pixels)) == {v}  # constant blocks decode exactly

    # a non-MJPEG payload in a dc chunk raises with codec guidance
    bad = M.make_avi_mjpeg_bytes([b"\x00\x00notjpeg"])
    with pytest.raises(NotImplementedError, match="MJPEG"):
        M.parse_avi_mjpeg(bad)
    with pytest.raises(ValueError, match="RIFF"):
        M.parse_avi_mjpeg(b"nope")


# --- r14.5: 24/32-bit PCM and G.711 telephony WAVs ---


def test_wav_24_and_32_bit_pcm_roundtrip():
    from architxt_spark.functions.multimodal import decode_wav_samples, make_wav_bytes

    sam = [
        [(i * 113) % 2001 - 1000 for i in range(50)],
        [(i * 57) % 801 - 400 for i in range(50)],
    ]
    for width in (3, 4):
        blob = make_wav_bytes(2, 8000, 50, samples=sam, sample_width=width)
        assert decode_wav_samples(blob) == (2, 8000, sam), width


def test_g711_companders_match_audioop_bit_for_bit():
    """The published G.711 formulas pinned against the stdlib audioop
    oracle: all 256 decode bytes and the FULL 16-bit encode range for
    both laws (the A-law sign sense and the µ-law 14-bit floor shift
    are exactly the kind of convention a self-round-trip would miss)."""
    import struct
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop

    from architxt_spark.functions.multimodal import (
        alaw_to_linear,
        linear_to_alaw,
        linear_to_ulaw,
        ulaw_to_linear,
    )

    for b in range(256):
        assert ulaw_to_linear(b) == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([b]), 2)
        )[0], ("ulaw", b)
        assert alaw_to_linear(b) == struct.unpack(
            "<h", audioop.alaw2lin(bytes([b]), 2)
        )[0], ("alaw", b)
    for v in range(-32768, 32768, 3):
        assert linear_to_ulaw(v) == audioop.lin2ulaw(struct.pack("<h", v), 2)[0], v
        assert linear_to_alaw(v) == audioop.lin2alaw(struct.pack("<h", v), 2)[0], v


def test_g711_wav_files_decode():
    from architxt_spark.functions.multimodal import (
        alaw_to_linear,
        decode_wav_samples,
        linear_to_alaw,
        linear_to_ulaw,
        make_wav_bytes,
        ulaw_to_linear,
    )

    sam = [[(i * 311) % 24001 - 12000 for i in range(64)]]
    for law, enc, dec in (
        ("ulaw", linear_to_ulaw, ulaw_to_linear),
        ("alaw", linear_to_alaw, alaw_to_linear),
    ):
        blob = make_wav_bytes(1, 8000, 64, samples=sam, g711=law)
        ch, rate, got = decode_wav_samples(blob)
        assert (ch, rate) == (1, 8000)
        assert got == [[dec(enc(v)) for v in sam[0]]], law
        # companding error bounded by the segment step
        err = max(abs(a - b) for a, b in zip(got[0], sam[0]))
        assert err <= 1024, (law, err)


def test_float32_wav_decodes_to_int16_view():
    from architxt_spark.functions.multimodal import decode_wav_samples, make_wav_bytes

    sam = [[(i * 113) % 2001 - 1000 for i in range(50)]]
    blob = make_wav_bytes(1, 44100, 50, samples=sam, float32=True)
    ch, rate, got = decode_wav_samples(blob)
    assert (ch, rate) == (1, 44100) and got == sam
    # out-of-range floats clamp instead of wrapping
    import struct

    hot = bytearray(make_wav_bytes(1, 8000, 2, samples=[[0, 0]], float32=True))
    hot[-8:] = struct.pack("<ff", 2.5, -3.0)
    assert decode_wav_samples(bytes(hot))[2] == [[32767, -32768]]


# --- r14.5: AIFF/AIFC audio ---


def _aifc_write_none(sam, width=2, rate=44100):
    import aifc
    import io
    import struct
    import warnings

    class KeepOpen(io.BytesIO):
        def close(self):
            self.flush()

    n = len(sam[0])
    ch = len(sam)
    if width == 2:
        inter = b"".join(
            struct.pack(f">{ch}h", *(sam[c][f] for c in range(ch)))
            for f in range(n)
        )
    else:
        inter = bytes(
            (sam[c][f] >> 8) & 0xFF for f in range(n) for c in range(ch)
        )
    buf = KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = aifc.open(buf, "wb")
    w.setnchannels(ch)
    w.setsampwidth(width)
    w.setframerate(rate)
    w.writeframes(inter)
    w.close()
    return buf.getvalue()


def test_aiff_pcm_decodes_like_wav():
    """aifc-written containers (the stdlib oracle for the UNCOMPRESSED
    shapes) decode to the same per-channel int16 view as WAV."""
    from architxt_spark.functions.multimodal import decode_aiff_samples, sniff_format

    sam = [
        [(i * 113) % 2001 - 1000 for i in range(50)],
        [(i * 57) % 801 - 400 for i in range(50)],
    ]
    blob = _aifc_write_none(sam)
    assert sniff_format(blob) == "aiff"
    assert decode_aiff_samples(blob) == (2, 44100, sam)
    # 8-bit AIFF is SIGNED: top bytes round-trip as the <<8 view
    blob8 = _aifc_write_none(sam, width=1)
    want = [[(x - 256 if (x := (v >> 8) & 0xFF) >= 128 else x) << 8 for v in c] for c in sam]
    assert decode_aiff_samples(blob8)[2] == want


def test_aifc_sowt_and_g711_variants():
    """sowt (little-endian AIFC) and the G.711 compression types —
    fixtures built from a patched aifc container because the stdlib
    aifc COMPRESSED writer is itself broken (part of why it was
    deprecated); the companding tables are audioop-pinned elsewhere."""
    from architxt_spark.functions.multimodal import (
        decode_aiff_samples,
        linear_to_alaw,
        linear_to_ulaw,
        alaw_to_linear,
        ulaw_to_linear,
    )

    sam = [[(i * 113) % 2001 - 1000 for i in range(50)]]
    base = bytearray(_aifc_write_none(sam))
    # sowt: flip the comptype and swap the sample bytes
    blob = bytearray(base)
    at = blob.find(b"NONE")
    blob[at:at + 4] = b"sowt"
    start = blob.find(b"SSND") + 16
    for i in range(start, len(blob) - 1, 2):
        blob[i], blob[i + 1] = blob[i + 1], blob[i]
    assert decode_aiff_samples(bytes(blob))[2] == sam
    # ulaw/alaw: replace the SSND payload with companded bytes
    for name, enc, dec in (
        (b"ulaw", linear_to_ulaw, ulaw_to_linear),
        (b"alaw", linear_to_alaw, alaw_to_linear),
    ):
        blob = bytearray(base[:start])
        blob[at:at + 4] = name
        payload = bytes(enc(v) for v in sam[0])
        blob += payload
        # patch SSND chunk length (payload + offset/blocksize words)
        import struct

        ssnd = bytes(blob).find(b"SSND")
        blob[ssnd + 4:ssnd + 8] = struct.pack(">I", 8 + len(payload))
        got = decode_aiff_samples(bytes(blob))
        assert got[2] == [[dec(enc(v)) for v in sam[0]]], name


def test_aiff_feature_and_meta_paths(spark):
    from architxt_spark.functions import multimodal as M

    sam = [[(i * 311) % 2001 - 1000 for i in range(64)]]
    blob = _aifc_write_none(sam, rate=8000)
    df = spark.createDataFrame(
        [("a", "audio", bytearray(blob))],
        "media_id string, kind string, content binary",
    )
    feats = M.extract_features(df, decoder="sniff").collect()
    assert len(feats) == 1 and len(feats[0].feature) == 16
    meta = M.decode_media_meta(df).collect()[0]
    assert (meta.fmt, meta.n_channels, meta.sample_rate) == ("aiff", 1, 8000)
    assert meta.duration_ms == 64 * 1000 // 8000
