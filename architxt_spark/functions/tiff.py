"""TIFF (6.0 baseline + LZW/Deflate/PackBits) pixel codec — pure
Python + stdlib zlib, no libtiff.

Beyond-reference: TIFF is what scanned-document dumps and GIS/archival
collections actually ship; the codec completes the still-image matrix
next to PNG/GIF/JPEG.  ``decode_tiff_pixels`` reads the first IFD of a
classic OR BigTIFF (version 43, 8-byte offsets/counts) file in either
byte order: strip-organized images,
``Compression`` 1 (none) / 5 (LZW, with the spec's early-change code
widths) / 8 or 32946 (zlib) / 32773 (PackBits), horizontal-differencing
``Predictor`` 2, ``PhotometricInterpretation`` 0/1 (bilevel+gray, white
-is-zero inverted) / 2 (RGB, alpha kept) / 3 (palette via the 16-bit
``ColorMap``, high byte), ``BitsPerSample`` 1/4/8/16 (16-bit reduces to
the high byte — the same practical 8-bit view the PNG decoder takes).
Both layout flavors decode — strips and TILES (322/323/324/325, the
GIS/large-scan shape, partial edge tiles cropped) — and the fax/JPEG
compressions are first-class: CCITT G3/G4 through
:mod:`architxt_spark.functions.ccitt` and new-style JPEG-in-TIFF
(``Compression=7``) through the in-repo JPEG codec with JPEGTables
splicing.  Planar configuration 2 decodes for strip layouts (each
component's strips decode at single-sample width, then interleave).
Planar tiles/JPEG and the withdrawn old-style JPEG
(``Compression=6``) raise ``NotImplementedError`` with guidance —
honest gates, never silent data loss.

``make_tiff_bytes`` is the encoder twin (both byte orders, every
supported compression, predictor, multi-strip, 8-bit tiled), so
round-trips are EXACT for the lossless compressions — and the test
suite additionally arbitrates both directions against the SYSTEM
libtiff through ctypes when it is present (the DuckDB/libjpeg/libpng
pattern).

Scale posture: like the PNG/GIF/JPEG decoders this runs per-row inside
the Arrow boundary (``extract_features(decoder="tiff")``); per-image
cost is O(bytes).
"""

from __future__ import annotations

import struct
import zlib

#: (II little / MM big) + magic 42
_TIFF_MAGICS = (b"II*\x00", b"MM\x00*")

#: field type → (struct char, size); types the reader consumes
#: (16/17/18 are the BigTIFF 8-byte integer types)
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
               10: 8, 16: 8, 17: 8, 18: 8}


def _tiff_ifd(content: bytes) -> tuple[str, dict[int, list[int]]]:
    """Parse the first IFD of a classic OR BigTIFF file into
    ``(endianness, {tag: values})``."""
    big = content[:4] in (b"II+\x00", b"MM\x00+")
    if not big and content[:4] not in _TIFF_MAGICS:
        raise ValueError("not a TIFF")
    e = "<" if content[:2] == b"II" else ">"
    if big:
        off_size, zero = struct.unpack(e + "HH", content[4:8])
        if off_size != 8 or zero != 0:
            raise ValueError("malformed BigTIFF header")
        (ifd_off,) = struct.unpack(e + "Q", content[8:16])
        head, entry_size, inline_cap = 8, 20, 8
    else:
        (ifd_off,) = struct.unpack(e + "I", content[4:8])
        head, entry_size, inline_cap = 2, 12, 4
    if ifd_off + head > len(content):
        raise ValueError("TIFF IFD offset out of range")
    if big:
        (n_entries,) = struct.unpack(e + "Q", content[ifd_off:ifd_off + 8])
    else:
        (n_entries,) = struct.unpack(e + "H", content[ifd_off:ifd_off + 2])
    if n_entries > 4096:
        raise ValueError("TIFF IFD entry count out of range")
    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        at = ifd_off + head + entry_size * i
        if at + entry_size > len(content):
            raise ValueError("truncated TIFF IFD")
        tag, typ = struct.unpack(e + "HH", content[at:at + 4])
        if big:
            (cnt,) = struct.unpack(e + "Q", content[at + 4:at + 12])
            raw = content[at + 12:at + 20]
        else:
            (cnt,) = struct.unpack(e + "I", content[at + 4:at + 8])
            raw = content[at + 8:at + 12]
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size > inline_cap:
            (off,) = struct.unpack(e + ("Q" if big else "I"), raw)
            raw = content[off:off + size]
            if len(raw) < size:
                raise ValueError("TIFF tag data out of range")
        if typ == 3:
            vals = list(struct.unpack(e + f"{cnt}H", raw[:2 * cnt]))
        elif typ == 4:
            vals = list(struct.unpack(e + f"{cnt}I", raw[:4 * cnt]))
        elif typ in (16, 17, 18):
            vals = list(struct.unpack(e + f"{cnt}Q", raw[:8 * cnt]))
        elif typ in (1, 7):  # BYTE / UNDEFINED (e.g. JPEGTables)
            vals = list(raw[:cnt])
        else:
            continue  # rationals/ascii: not needed for pixels
        tags[tag] = vals
    return e, tags


def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            if i < n:
                out += bytes([data[i]]) * (257 - b)
                i += 1
        # 128: no-op
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find a run
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal stretch up to the next >=3 run
        j = i + 1
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-flavor LZW (spec §13): MSB-first codes, 9-bit start,
    Clear=256 / EOI=257, EARLY code-width change (at table sizes 511 /
    1023 / 2047)."""
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    acc = bits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:  # Clear
                reset()
                prev = None
                continue
            if code == 257:  # EOI
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("corrupt TIFF LZW stream")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt TIFF LZW stream")
            out += entry
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1  # early change: one code before the table fills
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    acc = bits = 0

    def emit(code: int, width: int):
        nonlocal acc, bits
        acc = (acc << width) | code
        bits += width
        while bits >= 8:
            out.append((acc >> (bits - 8)) & 0xFF)
            bits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    emit(256, width)
    cur = b""
    for byte in data:
        cand = cur + bytes([byte])
        if cand in table:
            cur = cand
            continue
        emit(table[cur], width)
        table[cand] = nxt
        nxt += 1
        # the decoder builds entries one code behind the encoder and
        # widens (early-change) when ITS table hits (1<<w)-1; with the
        # lag that is nxt == 1<<w here — validated against libtiff in
        # both directions
        if nxt == (1 << width) and width < 12:
            width += 1
        if nxt == 4094:  # keep headroom, emit Clear and restart
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt = 258
            width = 9
        cur = bytes([byte])
    if cur:
        emit(table[cur], width)
    emit(257, width)
    if bits:
        out.append((acc << (8 - bits)) & 0xFF)
    return bytes(out)


def _undo_predictor(row: bytearray, ch: int) -> None:
    for i in range(ch, len(row)):
        row[i] = (row[i] + row[i - ch]) & 0xFF


def _apply_predictor(row: bytearray, ch: int) -> None:
    for i in range(len(row) - 1, ch - 1, -1):
        row[i] = (row[i] - row[i - ch]) & 0xFF


def decode_tiff_pixels(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first IFD of a TIFF to ``(width, height, channels,
    raw)`` — row-major 8-bit samples."""
    if len(content) < 8:
        raise ValueError("not a TIFF")
    e, tags = _tiff_ifd(content)

    def one(tag: int, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    tiled = 322 in tags or 323 in tags
    planar = one(284, 1)
    if planar == 2 and (tiled or one(259, 1) in (6, 7)):
        raise NotImplementedError(
            "planar TIFF with tiles/JPEG needs libtiff; re-save chunky"
        )
    comp = one(259, 1)
    if comp == 6:
        raise NotImplementedError(
            "old-style JPEG-in-TIFF (Compression=6, the withdrawn TIFF "
            "6.0 scheme) needs libtiff; re-save as Compression=7"
        )
    if comp not in (1, 2, 3, 4, 5, 7, 8, 32946, 32773):
        raise NotImplementedError(f"TIFF compression {comp} needs libtiff")
    t4_options = one(292, 0)
    if comp == 4 and one(293, 0) & 2:
        raise NotImplementedError(
            "G4 uncompressed mode (T6Options bit 1) needs libtiff"
        )

    w = one(256)
    h = one(257)
    spp = one(277, 1)
    if comp in (2, 3, 4) and (spp != 1 or tags.get(258, [1])[0] != 1):
        raise ValueError("CCITT-compressed TIFF must be 1-bit single-sample")
    # decompression-bomb / corrupt-header guard: a crafted IFD must not
    # drive gigabyte allocations before any pixel is produced
    if not (0 < w and 0 < h and 0 < spp <= 4 and w * h * spp <= (1 << 28)):
        raise ValueError("TIFF dimensions out of supported range")
    bits = tags.get(258, [1])
    depth = bits[0]
    if any(b != depth for b in bits):
        raise NotImplementedError("mixed per-sample bit depths need libtiff")
    if depth not in (1, 4, 8, 16):
        raise NotImplementedError(f"{depth}-bit TIFF samples need libtiff")
    photo = one(262, 1)
    predictor = one(317, 1)
    if tiled:
        tile_w = one(322)
        tile_h = one(323)
        offsets = tags.get(324)
        counts = tags.get(325)
        if not (0 < tile_w and 0 < tile_h
                and tile_w * tile_h * spp <= (1 << 28)):
            raise ValueError("TIFF tile dimensions out of range")
    else:
        rows_per_strip = min(one(278, h) or h, h)
        offsets = tags.get(273)
        counts = tags.get(279)
        if offsets and not counts:
            counts = [len(content) - offsets[0]]
    if not offsets:
        raise ValueError("TIFF without strip/tile offsets")

    tables = bytes(tags.get(347, []))

    def decode_jpeg_block(chunk: bytes):
        from architxt_spark.functions.jpeg import decode_jpeg_pixels

        if len(tables) > 4 and chunk[:2] == b"\xff\xd8":
            chunk = chunk[:2] + tables[2:-2] + chunk[2:]
        return decode_jpeg_pixels(chunk)

    def decode_block(chunk: bytes, bw: int, nrows: int,
                     eff_spp: int | None = None) -> bytes:
        """One compressed strip/tile → expanded 8-bit samples
        (``bw * spp`` per row, ``nrows`` rows; planar strips pass
        ``eff_spp=1``)."""
        s_ = eff_spp or spp
        rb = (bw * s_ * depth + 7) // 8
        expected = rb * nrows
        if comp == 1:
            got = chunk[:expected]
        elif comp == 32773:
            got = _packbits_decode(chunk, expected)
        elif comp == 5:
            got = _lzw_decode(chunk, expected)
        elif comp in (2, 3, 4):
            from architxt_spark.functions.ccitt import ccitt_decode

            got = ccitt_decode(chunk, bw, nrows, comp, t4_options=t4_options)
        else:
            got = zlib.decompress(chunk)[:expected]
        if len(got) < expected:
            got = got + b"\x00" * (expected - len(got))
        block = bytearray(got)
        if predictor == 2 and depth == 8:
            for r in range(nrows):
                row = block[r * rb:(r + 1) * rb]
                _undo_predictor(row, s_)
                block[r * rb:(r + 1) * rb] = row
        if depth == 8:
            return bytes(block[:bw * s_ * nrows])
        if depth == 16:
            hi = 0 if e == ">" else 1
            return bytes(block[2 * i + hi] for i in range(bw * s_ * nrows))
        per = 8 // depth
        maxv = (1 << depth) - 1
        out = bytearray()
        for r in range(nrows):
            row = block[r * rb:(r + 1) * rb]
            vals = []
            for byte in row:
                for k in range(per):
                    vals.append((byte >> (8 - depth * (k + 1))) & maxv)
            out += bytes(v * 255 // maxv for v in vals[:bw * s_])
        return bytes(out)

    ch_out = spp
    if tiled:
        samples = None
        ti = 0
        for ty in range(0, h, tile_h):
            for tx in range(0, w, tile_w):
                if ti >= len(offsets):
                    raise ValueError("TIFF tile grid short of offsets")
                so = offsets[ti]
                sc = counts[ti] if ti < len(counts or []) else len(content) - so
                ti += 1
                chunk = content[so:so + sc]
                if comp == 7:
                    bw_, bh_, ch_out, block = decode_jpeg_block(chunk)
                    if bw_ < min(tile_w, 1) or bh_ < 1:
                        raise ValueError("JPEG tile dimensions disagree")
                    src_w = bw_
                else:
                    block = decode_block(chunk, tile_w, tile_h)
                    src_w = tile_w
                if samples is None:
                    samples = bytearray(w * h * ch_out)
                copy_w = min(tile_w, w - tx)
                for r in range(min(tile_h, h - ty)):
                    src = block[r * src_w * ch_out:
                                r * src_w * ch_out + copy_w * ch_out]
                    dst = ((ty + r) * w + tx) * ch_out
                    samples[dst:dst + len(src)] = src
        samples = samples if samples is not None else bytearray()
    elif comp == 7:
        # new-style JPEG-in-TIFF strips: each a JPEG stream (shared
        # DQT/DHT spliced in from JPEGTables when abbreviated)
        parts: list[bytes] = []
        row0 = 0
        for so, sc in zip(offsets, counts):
            nrows = min(rows_per_strip, h - row0)
            if nrows <= 0:
                break
            sw, sh, ch_out, raw = decode_jpeg_block(content[so:so + sc])
            if sw != w or sh < nrows:
                raise ValueError("JPEG strip dimensions disagree with the IFD")
            parts.append(raw[: w * nrows * ch_out])
            row0 += nrows
        return w, h, ch_out, b"".join(parts)
    elif planar == 2 and spp > 1:
        # PlanarConfiguration 2: all strips of component 0, then 1, ...
        # — decode each plane at single-sample width, then interleave
        strips_per_plane = max(1, -(-h // rows_per_strip))
        if len(offsets) < spp * strips_per_plane:
            raise ValueError("planar TIFF short of strips")
        samples = bytearray(w * h * spp)
        for c in range(spp):
            pdata = bytearray()
            row0 = 0
            for s in range(strips_per_plane):
                so = offsets[c * strips_per_plane + s]
                sc = counts[c * strips_per_plane + s]
                nrows = min(rows_per_strip, h - row0)
                pdata += decode_block(content[so:so + sc], w, nrows, eff_spp=1)
                row0 += nrows
            samples[c::spp] = pdata[:w * h].ljust(w * h, b"\x00")
    else:
        samples = bytearray()
        row0 = 0
        for so, sc in zip(offsets, counts):
            nrows = min(rows_per_strip, h - row0)
            if nrows <= 0:
                break
            samples += decode_block(content[so:so + sc], w, nrows)
            row0 += nrows
        samples = bytearray(samples[:w * h * spp])

    if comp == 7:  # tiled JPEG: color space already handled per tile
        return w, h, ch_out, bytes(samples)

    if photo == 0:  # white-is-zero: invert to the black-is-zero view
        samples = bytearray(255 - s for s in samples)
        return w, h, spp, bytes(samples)
    if photo == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3:
            raise ValueError("palette TIFF without a ColorMap")
        ncol = len(cmap) // 3
        out = bytearray()
        for s in samples:
            idx = s * ((1 << depth) - 1) // 255 if depth < 8 else s
            if idx >= ncol:
                raise ValueError("palette index outside the ColorMap")
            out += bytes((
                cmap[idx] >> 8, cmap[ncol + idx] >> 8, cmap[2 * ncol + idx] >> 8,
            ))
        return w, h, 3, bytes(out)
    return w, h, spp, bytes(samples)


def make_tiff_bytes(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    compression: int = 1,
    predictor: int = 1,
    rows_per_strip: int | None = None,
    big_endian: bool = False,
    photometric: int | None = None,
    palette: list[int] | None = None,
    bit_depth: int = 8,
    tile: tuple[int, int] | None = None,
) -> bytes:
    """Encoder twin: strip-organized classic TIFF in either byte order.
    ``compression`` 1/5/8/32773, ``predictor`` 2 (8-bit only),
    ``palette`` as flat RGB 16-bit triples (pixels become indices),
    ``bit_depth`` 1/4 packs single-channel samples (given as VALUES
    below the range), 16 widens 8-bit input (value << 8)."""
    e = "<" if not big_endian else ">"
    if photometric is None:
        # fax compressions conventionally ship min-is-white; JPEG color
        # strips are YCbCr inside, so declare photometric 6
        photometric = 3 if palette else (
            0 if compression in (2, 4)
            else 6 if compression == 7 and channels == 3
            else (1 if channels == 1 else 2)
        )
    spp = channels
    rps = rows_per_strip or height

    # sample packing
    if bit_depth == 8:
        row_bytes = width * spp
        rows = [
            bytearray(pixels[r * row_bytes:(r + 1) * row_bytes])
            for r in range(height)
        ]
    elif bit_depth == 16:
        row_bytes = width * spp * 2
        rows = []
        for r in range(height):
            row = bytearray()
            for s in pixels[r * width * spp:(r + 1) * width * spp]:
                row += struct.pack(e + "H", s << 8)
            rows.append(row)
    else:
        per = 8 // bit_depth
        row_bytes = (width * spp * bit_depth + 7) // 8
        rows = []
        for r in range(height):
            vals = pixels[r * width:(r + 1) * width]
            row = bytearray(row_bytes)
            for i, v in enumerate(vals):
                row[i // per] |= (v & ((1 << bit_depth) - 1)) << (
                    8 - bit_depth * (i % per + 1)
                )
            rows.append(row)

    if tile is not None:
        if bit_depth != 8:
            raise ValueError("tiled twins are 8-bit")
        tw_, th_ = tile
        blocks: list[list[bytearray]] = []
        for ty in range(0, height, th_):
            for tx in range(0, width, tw_):
                trows = []
                for r in range(th_):
                    y = ty + r
                    if y < height:
                        seg = rows[y][tx * spp:(tx + tw_) * spp]
                    else:
                        seg = b""
                    trows.append(
                        bytearray(seg) + bytearray(tw_ * spp - len(seg))
                    )
                blocks.append(trows)
        chunk_iter = blocks
    else:
        chunk_iter = [
            rows[r0:r0 + rps] for r0 in range(0, height, rps)
        ]

    strips: list[bytes] = []
    for chunk_rows in chunk_iter:
        block_w = tile[0] if tile is not None else width
        if predictor == 2 and bit_depth == 8:
            chunk_rows = [bytearray(r) for r in chunk_rows]
            for row in chunk_rows:
                _apply_predictor(row, spp)
        raw = b"".join(bytes(r) for r in chunk_rows)
        if compression == 1:
            strips.append(raw)
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        elif compression == 5:
            strips.append(_lzw_encode(raw))
        elif compression in (8, 32946):
            strips.append(zlib.compress(raw))
        elif compression in (2, 4):
            if bit_depth != 1 or channels != 1:
                raise ValueError("CCITT twins are 1-bit single-sample")
            from architxt_spark.functions.ccitt import ccitt_encode

            strips.append(
                ccitt_encode(raw, block_w, len(chunk_rows), compression)
            )
        elif compression == 7:
            if bit_depth != 8:
                raise ValueError("JPEG-in-TIFF twins are 8-bit")
            from architxt_spark.functions.jpeg import make_jpeg_bytes

            strips.append(
                make_jpeg_bytes(
                    block_w, len(chunk_rows), raw, channels=channels
                )
            )
        else:
            raise ValueError(f"unsupported twin compression {compression}")

    entries: list[tuple[int, int, int, bytes]] = []  # tag, type, count, data

    def tag_short(tag, *vals):
        entries.append((tag, 3, len(vals), struct.pack(e + f"{len(vals)}H", *vals)))

    def tag_long(tag, *vals):
        entries.append((tag, 4, len(vals), struct.pack(e + f"{len(vals)}I", *vals)))

    tag_long(256, width)
    tag_long(257, height)
    tag_short(258, *([bit_depth] * spp))
    tag_short(259, compression)
    tag_short(262, photometric)
    tag_short(277, spp)
    if tile is not None:
        tag_long(322, tile[0])
        tag_long(323, tile[1])
        tag_long(324, *([0] * len(strips)))  # patched below
        tag_long(325, *(len(s) for s in strips))
    else:
        tag_long(273, *([0] * len(strips)))  # patched below
        tag_long(278, rps)
        tag_long(279, *(len(s) for s in strips))
    if predictor != 1:
        tag_short(317, predictor)
    if palette:
        # the spec's ColorMap is 3 * 2^depth entries; pad short test
        # palettes the way real writers do
        full = 3 * (1 << bit_depth)
        ncol = len(palette) // 3
        per = palette[:ncol], palette[ncol:2 * ncol], palette[2 * ncol:]
        pad = (1 << bit_depth) - ncol
        tag_short(320, *(per[0] + [0] * pad + per[1] + [0] * pad
                         + per[2] + [0] * pad)[:full])
    entries.sort()

    # layout: header(8) + IFD + out-of-line tag data + strip data
    ifd_at = 8
    ifd_len = 2 + 12 * len(entries) + 4
    data_at = ifd_at + ifd_len
    blobs = bytearray()
    fixed = []
    for tag, typ, cnt, data in entries:
        if len(data) <= 4:
            fixed.append((tag, typ, cnt, data.ljust(4, b"\x00"), None))
        else:
            fixed.append((tag, typ, cnt, None, data_at + len(blobs)))
            blobs += data
            if len(blobs) % 2:
                blobs += b"\x00"
    strips_at = data_at + len(blobs)
    offs = []
    pos = strips_at
    for s in strips:
        offs.append(pos)
        pos += len(s) + (len(s) % 2)

    out = bytearray()
    out += (b"II*\x00" if e == "<" else b"MM\x00*") + struct.pack(e + "I", ifd_at)
    out += struct.pack(e + "H", len(entries))
    for tag, typ, cnt, inline, off in fixed:
        if tag in (273, 324):  # strip/tile offsets, now known
            data = struct.pack(e + f"{len(offs)}I", *offs)
            if len(data) <= 4:
                out += struct.pack(e + "HHI", tag, typ, cnt) + data.ljust(4, b"\x00")
            else:
                # reserve space was taken in blobs pass only when >4;
                # recompute: replace the blob contents in place
                at = off - data_at
                blobs[at:at + len(data)] = data
                out += struct.pack(e + "HHII", tag, typ, cnt, off)
        elif inline is not None:
            out += struct.pack(e + "HHI", tag, typ, cnt) + inline
        else:
            out += struct.pack(e + "HHII", tag, typ, cnt, off)
    out += struct.pack(e + "I", 0)  # no next IFD
    out += blobs
    for s in strips:
        out += s
        if len(s) % 2:
            out += b"\x00"
    return bytes(out)


def decode_tiff_dims(content: bytes) -> tuple[int, int]:
    """Header-only width/height (IFD tags 256/257) — the cheap metadata
    read next to the PNG/JPEG/GIF dimension helpers."""
    if len(content) < 8:
        raise ValueError("not a TIFF")
    _e, tags = _tiff_ifd(content)
    if 256 not in tags or 257 not in tags:
        raise ValueError("TIFF without dimension tags")
    return tags[256][0], tags[257][0]
