"""Perceptual image hashing + Hamming-banded near-duplicate detection.

The reference engine has no image operators at all — this is the
beyond-reference LLM-data-pipeline layer (image near-dup is the #1
LLM-data use of an image column: the same photo recompressed,
brightness-shifted, or format-converted must collapse to one kept copy).

Scale shape mirrors the text dedup family (``dedup.py``):

* the only Python-per-row work is the codec itself, inside Arrow
  ``mapInPandas`` batches (:func:`image_hashes`) — the shuffle carries
  one 64-bit hash per image, never pixels;
* candidate pairs come from a HAMMING-BANDED self-join
  (:func:`hamming_near_dup`): the 64-bit hash splits into ``bands``
  fixed bit-slices, images sharing any slice join on that slice value.
  By pigeonhole, every pair within Hamming distance ``bands − 1``
  shares at least one band — so with the default ``max_hamming =
  bands − 1`` the banded join is EXACT (identical to the all-pairs
  scan), at index-join cost.  ``max_band_df`` caps degenerate buckets
  (e.g. millions of single-color thumbnails) exactly like
  ``minhash_lsh_pairs``' hot-band cap;
* every hash is PURE INTEGER arithmetic over block means, so a SQL
  engine can replay it closed-form from a pixel formula — the DuckDB
  oracle gates the real decoders end-to-end.

Hashes (all over the decoded grayscale grid; integer luma
``(77·R + 150·G + 29·B) >> 8`` for color inputs):

* :func:`dhash64` — gradient hash: 9×8 block means, bit ``r·8+c`` set
  iff ``mean(r, c+1) > mean(r, c)``.  Invariant to global brightness
  shifts and to any recompression that preserves block means.
* :func:`ahash64` — average hash over the left 8×8 of the same grid:
  bit set iff ``mean·64 > total`` (multiplication, not division, so
  the comparison is exact).
* :func:`phash64` — DCT hash: fixed-point integer DCT-II over the 8×8
  block-mean grid, bit per AC coefficient iff it exceeds the median AC
  coefficient (63 bits; golden/property-tested, not oracle-gated — the
  cosine table has no closed SQL form).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRID_W = 8  #: gradient bits per row (dhash samples GRID_W + 1 columns)
GRID_H = 8

HASH_SCHEMA = "media_id string, fmt string, width int, height int, dhash long, ahash long"


def to_gray(raw: bytes, channels: int) -> list[int]:
    """Integer luma per pixel: channels 1/2 take the first (gray) sample,
    3/4 use ``(77R + 150G + 29B) >> 8`` — for ``(v, v, v)`` inputs this
    is exactly ``v`` (the weights sum to 256)."""
    if channels == 1:
        return list(raw)
    if channels == 2:  # gray + alpha
        return list(raw[::2])
    step = channels  # 3 = RGB, 4 = RGBA
    return [
        (77 * raw[i] + 150 * raw[i + 1] + 29 * raw[i + 2]) >> 8
        for i in range(0, len(raw), step)
    ]


def decode_gray(content: bytes) -> tuple[int, int, list[int]]:
    """Sniff + REAL pixel decode (the stdlib PNG/GIF and in-repo baseline
    JPEG codecs) + integer luma.  Returns ``(width, height, gray)``."""
    from architxt_spark.functions.multimodal import sniff_format

    fmt = sniff_format(content)
    if fmt == "png":
        from architxt_spark.functions.multimodal import decode_png_pixels

        w, h, ch, raw = decode_png_pixels(content)
    elif fmt == "gif":
        from architxt_spark.functions.multimodal import decode_gif_pixels

        w, h, ch, raw = decode_gif_pixels(content)
    elif fmt == "jpeg":
        from architxt_spark.functions.jpeg import decode_jpeg_pixels

        w, h, ch, raw = decode_jpeg_pixels(content)
    elif fmt == "tiff":
        from architxt_spark.functions.tiff import decode_tiff_pixels

        w, h, ch, raw = decode_tiff_pixels(content)
    else:
        raise ValueError(f"not a decodable image (sniffed {fmt!r})")
    return w, h, to_gray(raw, ch)


def cell_means(gray: list[int], w: int, h: int, grid_w: int, grid_h: int) -> list[list[int]]:
    """Exact integer block means on a ``grid_h × grid_w`` grid with
    floor-division boundaries ``x_c = c·w // grid_w`` (pure integer —
    replayable closed-form when the pixels follow a formula)."""
    if w < grid_w or h < grid_h:
        raise ValueError(f"image {w}x{h} smaller than the {grid_w}x{grid_h} hash grid")
    xs = [c * w // grid_w for c in range(grid_w + 1)]
    ys = [r * h // grid_h for r in range(grid_h + 1)]
    out = []
    for r in range(grid_h):
        row = []
        for c in range(grid_w):
            s = 0
            for y in range(ys[r], ys[r + 1]):
                base = y * w
                s += sum(gray[base + xs[c]:base + xs[c + 1]])
            row.append(s // ((ys[r + 1] - ys[r]) * (xs[c + 1] - xs[c])))
        out.append(row)
    return out


def _signed64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def dhash64(gray: list[int], w: int, h: int) -> int:
    """Gradient hash: 9×8 block means, bit ``r·8+c`` iff the right
    neighbor mean is strictly greater.  Signed 64-bit (bit 63 = sign)."""
    m = cell_means(gray, w, h, GRID_W + 1, GRID_H)
    u = 0
    for r in range(GRID_H):
        for c in range(GRID_W):
            if m[r][c + 1] > m[r][c]:
                u |= 1 << (r * GRID_W + c)
    return _signed64(u)


def ahash64(gray: list[int], w: int, h: int) -> int:
    """Average hash over the LEFT 8×8 of the dhash grid (same cell table
    both hashes — one block-mean pass): bit iff ``mean·64 > total``."""
    m = cell_means(gray, w, h, GRID_W + 1, GRID_H)
    vals = [m[r][c] for r in range(GRID_H) for c in range(GRID_W)]
    total = sum(vals)
    u = 0
    for k, v in enumerate(vals):
        if v * 64 > total:
            u |= 1 << k
    return _signed64(u)


# fixed-point DCT-II basis, scaled by 2**14 and rounded — pinned integers
# so the hash is deterministic across platforms
_DCT_N = 8
_DCT_SCALE = 1 << 14


def _dct_table() -> list[list[int]]:
    import math

    return [
        [
            round(math.cos((2 * x + 1) * u * math.pi / (2 * _DCT_N)) * _DCT_SCALE)
            for x in range(_DCT_N)
        ]
        for u in range(_DCT_N)
    ]


_DCT = _dct_table()


def phash64(gray: list[int], w: int, h: int) -> int:
    """DCT hash: integer DCT-II over the 8×8 block-mean grid; one bit per
    AC coefficient (63 bits), set iff the coefficient exceeds the median
    AC coefficient.  Captures low-frequency structure — robust to noise
    that flips individual dhash gradients."""
    m = cell_means(gray, w, h, _DCT_N, _DCT_N)
    # rows then columns (separable); plain integer products, no rounding
    # until the final comparison (median is an order statistic)
    tmp = [
        [sum(_DCT[u][x] * m[y][x] for x in range(_DCT_N)) for u in range(_DCT_N)]
        for y in range(_DCT_N)
    ]
    coef = [
        [sum(_DCT[v][y] * tmp[y][u] for y in range(_DCT_N)) for u in range(_DCT_N)]
        for v in range(_DCT_N)
    ]
    ac = [coef[v][u] for v in range(_DCT_N) for u in range(_DCT_N) if (u, v) != (0, 0)]
    med = sorted(ac)[len(ac) // 2]
    u64 = 0
    for k, v in enumerate(ac):
        if v > med:
            u64 |= 1 << k
    return _signed64(u64)


def image_hashes(df: DataFrame, content_col: str = "content", id_col: str = "media_id") -> DataFrame:
    """(media_id, fmt, width, height, dhash, ahash) per image — REAL
    decode + integer hashes inside one Arrow ``mapInPandas`` pass; the
    output frame carries 2 longs per image, never pixels.  Undecodable
    rows (unknown format / truncated) are dropped, not failed — corpus
    scans meet broken bytes."""
    import pandas as pd

    from architxt_spark.functions.dedup import _spread
    from architxt_spark.functions.multimodal import sniff_format

    def batches(it):
        for pdf in it:
            ids, fmts, ws, hs, dh, ah = [], [], [], [], [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                content = bytes(content) if content is not None else b""
                try:
                    w, h, gray = decode_gray(content)
                    ids.append(str(mid))
                    fmts.append(sniff_format(content))
                    ws.append(w)
                    hs.append(h)
                    dh.append(dhash64(gray, w, h))
                    ah.append(ahash64(gray, w, h))
                except (ValueError, NotImplementedError):
                    continue
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "fmt": fmts,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "dhash": pd.Series(dh, dtype="int64"),
                    "ahash": pd.Series(ah, dtype="int64"),
                }
            )

    return _spread(df.select(id_col, content_col)).mapInPandas(batches, HASH_SCHEMA)


def band_cols(hash_col: Column, bands: int = 4, bits: int = 64) -> list[Column]:
    """Fixed bit-slices of the hash — ``(hash >> k·width) & mask`` is
    sign-safe (the mask keeps only the slice) and has the identical
    closed form in ANSI SQL."""
    if bits % bands:
        raise ValueError(f"{bits} bits do not split into {bands} equal bands")
    width = bits // bands
    mask = (1 << width) - 1
    return [
        (F.shiftright(hash_col, k * width).bitwiseAND(F.lit(mask))).alias(f"band{k}")
        for k in range(bands)
    ]


def hamming_near_dup(
    hashes: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "media_id",
    *,
    bands: int = 4,
    bits: int = 64,
    max_hamming: int | None = None,
    max_band_df: int | None = None,
) -> DataFrame:
    """Near-duplicate image pairs ``(id_a < id_b, hamming)`` from a
    Hamming-banded self-join — never all-pairs.

    With the default ``max_hamming = bands − 1`` the result is EXACT
    (pigeonhole: ≤ bands−1 differing bits cannot touch every band), so
    the DuckDB oracle can verify it against a closed-form all-pairs
    scan.  A larger ``max_hamming`` keeps the same plan but becomes
    approximate (recall < 1), like every banded LSH.

    ``max_band_df`` drops bands shared by more than that many images
    before pair generation — the hot-bucket cap for degenerate corpora
    (a band of all-zero gradients ≈ flat thumbnails), same contract as
    ``minhash_lsh_pairs``."""
    if max_hamming is None:
        max_hamming = bands - 1
    h = F.col(hash_col)
    banded = hashes.select(
        F.col(id_col).alias("id"), h.alias("h"),
    ).select(
        "id", "h",
        F.posexplode(F.array(*[c for c in band_cols(F.col("h"), bands, bits)])).alias("band_no", "band_val"),
    )
    if max_band_df is not None:
        heavy = (
            banded.groupBy("band_no", "band_val")
            .count()
            .filter(F.col("count") > max_band_df)
            .select("band_no", "band_val")
        )
        banded = banded.join(F.broadcast(heavy), ["band_no", "band_val"], "left_anti")
    a = banded.select(F.col("id").alias("id_a"), F.col("h").alias("h_a"), "band_no", "band_val")
    b = banded.select(F.col("id").alias("id_b"), F.col("h").alias("h_b"), "band_no", "band_val")
    return (
        a.join(b, ["band_no", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
