"""Perceptual image hashing + Hamming-banded near-dup (r11).

Beyond-reference LLM-data operator: the reference engine has no image
operators; this layer mirrors the text dedup family's contract (banded
candidate generation, hot-bucket caps, oracle-replayable integer math).
"""

import pytest
from pyspark.sql import functions as F

from architxt_spark.functions.imagehash import (
    ahash64,
    cell_means,
    decode_gray,
    dhash64,
    hamming_near_dup,
    image_hashes,
    phash64,
    to_gray,
)
from architxt_spark.functions.jpeg import make_jpeg_bytes
from architxt_spark.functions.multimodal import make_gif_bytes, make_png_bytes

W, H = 72, 64


def _pixels(seed: int, bright: int = 0, perturb: tuple[int, int] | None = None) -> bytes:
    def val(r: int, c: int) -> int:
        v = (seed * 37 + r * 29 + c * 47) % 192
        if perturb and (r, c) == perturb:
            v = (v + 96) % 192
        return v + bright

    return bytes(val(y // 8, x // 8) for y in range(H) for x in range(W))


def _gray(content: bytes):
    return decode_gray(content)


def test_recompression_is_hash_identical():
    base = _pixels(5)
    png = make_png_bytes(W, H, base, color_type=0, filter_type=2)
    jpg = make_jpeg_bytes(W, H, base, channels=1)
    w, h, g1 = _gray(png)
    w2, h2, g2 = _gray(jpg)
    assert (w, h) == (w2, h2) == (W, H)
    assert dhash64(g1, w, h) == dhash64(g2, w, h)
    assert ahash64(g1, w, h) == ahash64(g2, w, h)
    assert phash64(g1, w, h) == phash64(g2, w, h)


def test_brightness_shift_invariance():
    w, h, g1 = _gray(make_png_bytes(W, H, _pixels(9), color_type=0))
    w, h, g2 = _gray(make_png_bytes(W, H, _pixels(9, bright=8), color_type=0, filter_type=4))
    assert dhash64(g1, w, h) == dhash64(g2, w, h)
    assert ahash64(g1, w, h) == ahash64(g2, w, h)
    assert phash64(g1, w, h) == phash64(g2, w, h)  # DC-only change


def test_one_cell_perturbation_small_hamming():
    palette = bytes(b for v in range(256) for b in (v, v, v))
    w, h, g1 = _gray(make_png_bytes(W, H, _pixels(5), color_type=0))
    w, h, g2 = _gray(make_gif_bytes(W, H, _pixels(5, perturb=(5, 6)), palette))
    d = dhash64(g1, w, h) ^ dhash64(g2, w, h)
    # one interior cell touches at most its left and right comparisons
    assert 1 <= bin(d & ((1 << 64) - 1)).count("1") <= 2


def test_unrelated_images_are_far():
    w, h, g1 = _gray(make_png_bytes(W, H, _pixels(3), color_type=0))
    w, h, g2 = _gray(make_png_bytes(W, H, _pixels(40), color_type=0))
    d = dhash64(g1, w, h) ^ dhash64(g2, w, h)
    assert bin(d & ((1 << 64) - 1)).count("1") > 10


def test_to_gray_luma_identity_and_weights():
    # (v, v, v) -> exactly v (weights sum to 256)
    assert to_gray(bytes([200, 200, 200, 7, 7, 7]), 3) == [200, 7]
    # RGBA takes the first three channels
    assert to_gray(bytes([255, 0, 0, 9]), 4) == [(77 * 255) >> 8]
    # gray+alpha takes the gray sample
    assert to_gray(bytes([42, 255, 17, 0]), 2) == [42, 17]


def test_cell_means_uneven_grid_exact():
    # 11x9 image, 3x2 grid: boundaries are floor(c*11/3) = 0,3,7,11 and
    # floor(r*9/2) = 0,4,9 — hand-check one cell
    w, h = 11, 9
    gray = [(y * w + x) % 251 for y in range(h) for x in range(w)]
    m = cell_means(gray, w, h, 3, 2)
    s = sum(gray[y * w + x] for y in range(0, 4) for x in range(3, 7))
    assert m[0][1] == s // (4 * 4)
    with pytest.raises(ValueError):
        cell_means(gray, 2, 2, 3, 2)


def test_phash_detects_structure_change():
    w, h, g1 = _gray(make_png_bytes(W, H, _pixels(5), color_type=0))
    # a different block pattern (seed 40 wraps differently): distinct
    # low-frequency structure, very different phash
    w2, h2, g2 = _gray(make_png_bytes(W, H, _pixels(40), color_type=0))
    d = phash64(g1, w, h) ^ phash64(g2, w2, h2)
    assert bin(d & ((1 << 64) - 1)).count("1") > 10


# ---------------------------------------------------------------------------
# frame operators
# ---------------------------------------------------------------------------


def _media(spark, n=32):
    import pandas as pd

    palette = bytes(b for v in range(256) for b in (v, v, v))

    def build(it):
        # self-contained: workers can't import the test module
        from architxt_spark.functions.jpeg import make_jpeg_bytes as mkj
        from architxt_spark.functions.multimodal import (
            make_gif_bytes as mkg,
            make_png_bytes as mkp,
        )

        for pdf in it:
            rows = []
            for d in pdf["id"]:
                d = int(d)
                g, m = d // 4, d % 4
                pr, pc = g % 8, g % 7 + 1

                def val(r, c):
                    v = (g * 37 + r * 29 + c * 47) % 192
                    if m == 3 and (r, c) == (pr, pc):
                        v = (v + 96) % 192
                    return v + (8 if m == 2 else 0)

                px = bytes(val(y // 8, x // 8) for y in range(64) for x in range(72))
                if m == 1:
                    content = mkj(72, 64, px, channels=1)
                elif m == 3:
                    content = mkg(72, 64, px, palette)
                else:
                    content = mkp(72, 64, px, color_type=0, filter_type=d % 5)
                rows.append((str(d), content))
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return spark.range(n).mapInPandas(build, "media_id string, content binary")


def test_image_hashes_variants_collapse(spark):
    hashes = image_hashes(_media(spark, 16))
    rows = {r["media_id"]: r for r in hashes.collect()}
    assert len(rows) == 16
    for g in range(4):
        ids = [str(4 * g + m) for m in range(4)]
        dh = [rows[i]["dhash"] for i in ids]
        # base == recompressed == brightness-shifted
        assert dh[0] == dh[1] == dh[2]
        ham = bin((dh[0] ^ dh[3]) & ((1 << 64) - 1)).count("1")
        assert ham <= 2
        assert rows[ids[0]]["fmt"] == "png" and rows[ids[1]]["fmt"] == "jpeg"
        assert rows[ids[3]]["fmt"] == "gif"


def test_image_hashes_drops_undecodable(spark):
    import pandas as pd

    ok_png = make_png_bytes(W, H, _pixels(1), color_type=0)

    def build(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": ["ok", "junk", "null"],
                    "content": [ok_png, b"\x00\x01not an image", None],
                }
            )

    df = spark.range(1).mapInPandas(build, "media_id string, content binary")
    out = image_hashes(df).collect()
    assert [r["media_id"] for r in out] == ["ok"]


def test_hamming_near_dup_exact_at_pigeonhole_threshold(spark):
    # 40 synthetic hashes: banded result must equal the brute-force
    # all-pairs scan at max_hamming = bands - 1 (pigeonhole exactness)
    vals = []
    x = 0x9E3779B97F4A7C15
    for i in range(40):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        base = x
        vals.append(base)
        if i % 3 == 0:  # plant near neighbors
            vals.append(base ^ 0b101)  # hamming 2
    rows = [(str(i), v - (1 << 64) if v >= (1 << 63) else v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "media_id string, dhash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_dup(df, bands=4, max_hamming=3).collect()
    }
    expect = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            hm = bin((va ^ vb) & ((1 << 64) - 1)).count("1")
            if hm <= 3:
                a, b = sorted([ia, ib])
                expect.add((a, b, hm))
    assert got == expect and expect  # non-vacuous


def test_hamming_near_dup_plan_is_banded_not_cartesian(spark):
    hashes = image_hashes(_media(spark, 16))
    pairs = hamming_near_dup(hashes, bands=4, max_hamming=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join keys are the band slices, not the raw ids
    assert "band_no" in plan and "band_val" in plan


def test_hamming_near_dup_hot_band_cap(spark):
    # 30 images with IDENTICAL hash: uncapped -> C(30,2)=435 pairs;
    # max_band_df=10 drops every band bucket -> 0 pairs
    rows = [(str(i), 12345) for i in range(30)]
    df = spark.createDataFrame(rows, "media_id string, dhash long")
    assert hamming_near_dup(df, bands=4).count() == 435
    assert hamming_near_dup(df, bands=4, max_band_df=10).count() == 0


def test_band_split_validation():
    with pytest.raises(ValueError, match="do not split"):
        from architxt_spark.functions.imagehash import band_cols

        band_cols(F.col("h"), bands=5, bits=64)
