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
    assert M.sniff_format(b"\xff\xd8\xff\xe0 jpeg-ish") is None


def test_decode_image_png_real_other_stubbed():
    assert M.decode_image(M.make_png_bytes(5, 9)) == (5, 9)
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\xff\xd8\xff\xe0 jpeg bytes")


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
        rows + [("x1", "image", b"\xff\xd8\xff jpeg")],
        "media_id string, kind string, content binary",
    )
    with pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.decode_media_meta(mixed, strict=True).collect()
    lax = {r.media_id: r for r in M.decode_media_meta(mixed, strict=False).collect()}
    assert lax["x1"].fmt is None and lax["x1"].width is None

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
