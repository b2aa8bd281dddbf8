"""JPEG (ITU-T T.81, Huffman) pixel codec — pure Python + numpy, no
Pillow.

Completes the real-pixel story for the three stdlib-dimension formats
(PNG/GIF in ``multimodal.py``, JPEG here): ``decode_jpeg_pixels``
handles the two shapes that cover essentially every web JPEG —
baseline/extended sequential (SOF0/SOF1) and **progressive** (SOF2,
spectral selection + successive approximation, the default output of
libjpeg/mozjpeg ``-progressive`` and most CDN re-encoders) — 8-bit
precision, Huffman entropy coding read from the file's own DHT
segments (any valid tables, including mid-file redefinition between
progressive scans), 1- or 3-component frames, arbitrary sampling
factors (4:4:4 / 4:2:2 / 4:2:0 by replication upsampling), restart
markers in both sequential and progressive scans.  12-bit precision
(r13: the medical-imaging shape — 2048 level shift, 16-bit Pq=1
quantization tables, samples downscaled to the pipeline's 8-bit
contract) decodes for sequential AND (r14) progressive frames — the
coefficient bit-plane machinery is precision-agnostic, only the level
shift and output downscale differ.  Lossless (SOF3, r14 — the old
medical/archival shape): T.81 Annex H per-sample prediction +
Huffman-coded differences, predictors 1-7, precision 2-16, point
transform; grayscale 1:1 (multi-component / subsampled / restart
lossless raises with guidance).  Arithmetic coding and hierarchical
frames raise ``NotImplementedError`` — those genuinely want libjpeg.

``make_jpeg_bytes`` is the encoder twin for round-trip tests: forward
DCT + flat quantization + canonical single-length Huffman tables it
declares in its own DHT segments.  JPEG is lossy, but constant 8×8
blocks survive the DC-only path bit-exactly, so the tests get exact
assertions where exactness is mathematically guaranteed and bounded
tolerance on gradients.  ``progressive=True`` re-encodes the SAME
quantized coefficients as a five-phase progressive scan script (DC
first at Al=1 → DC refine → two per-component AC spectral bands at
Al=1 → per-component AC refine), which makes the strongest possible
decoder test available: progressive is a lossless reorganization of
the sequential coefficient stream, so the progressive decode must be
BYTE-IDENTICAL to the baseline decode of the same image.

Scale posture: like the PNG/GIF decoders this runs per-row inside the
Arrow boundary (``extract_features(decoder="jpeg")``); the numpy DCT
is batched over all blocks of an image at once.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order as (row, col) pairs; the flat row-major prefix is
#: pinned by a test against the canonical published sequence
ZIGZAG: list[tuple[int, int]] = []
for _s in range(15):
    _rows = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rows if _s % 2 else reversed(_rows)):
        ZIGZAG.append((_r, _s - _r))

_DCT = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def _blocks_idct(coefs: np.ndarray, level: float = 128.0) -> np.ndarray:
    """(n, 8, 8) dequantized coefficient blocks → (n, 8, 8) samples;
    ``level`` is the precision's level shift (128 for 8-bit, 2048 for
    12-bit)."""
    return np.einsum("ki,nkl,lj->nij", _DCT, coefs, _DCT) + level


def _blocks_dct(samples: np.ndarray, level: float = 128.0) -> np.ndarray:
    return np.einsum("ik,nkl,jl->nij", _DCT, samples - level, _DCT)


class _BitReader:
    """MSB-first entropy-segment reader: un-stuffs 0xFF00, surfaces
    RSTn markers at byte boundaries, stops at any other marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerHit(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self, expect: int) -> None:
        """Consume padding + the RSTn marker at a restart boundary."""
        self.acc = self.n = 0
        while self.data[self.pos] != 0xFF:
            self.pos += 1  # pad bits rendered as full bytes
        marker = self.data[self.pos + 1]
        if marker != 0xD0 + (expect & 7):
            raise ValueError(f"expected RST{expect & 7}, found 0x{marker:02x}")
        self.pos += 2


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _build_huffman(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


def _decode_symbol(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy segment")


def _extend(v: int, s: int) -> int:
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_pixels(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode a sequential (SOF0/SOF1) or progressive (SOF2) JPEG to
    ``(width, height, channels, raw)`` — row-major samples, grayscale
    (1) or RGB (3)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    qt: dict[int, np.ndarray] = {}
    precision = 8
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    frame = None
    progressive = False
    lossless = False
    prog: _ProgState | None = None
    restart = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("lost JPEG marker sync")
        marker = content[pos + 1]
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", content[pos + 2:pos + 4])
        body = content[pos + 4:pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT (pq=1 → 16-bit entries, the 12-bit shape)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0x0F
                tbl = np.zeros((8, 8))
                for i, (rr, cc) in enumerate(ZIGZAG):
                    if pq:
                        (tbl[rr, cc],) = struct.unpack(
                            ">H", body[off + 1 + 2 * i:off + 3 + 2 * i]
                        )
                    else:
                        tbl[rr, cc] = body[off + 1 + i]
                qt[tq] = tbl
                off += 129 if pq else 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0x0F
                bits = list(body[off + 1:off + 17])
                cnt = sum(bits)
                symbols = list(body[off + 17:off + 17 + cnt])
                huff[(tc, th)] = _build_huffman(bits, symbols)
                off += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):
            # SOF0/SOF1 sequential, SOF2 progressive, SOF3 lossless
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            lossless = marker == 0xC3
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"lossless precision {prec} out of range")
            elif prec not in (8, 12):
                raise NotImplementedError(
                    f"{prec}-bit JPEG precision needs libjpeg"
                )
            comps = []
            for i in range(ncomp):
                cid, hv, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (w, h, comps)
            precision = prec
            progressive = marker == 0xC2
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1), progressive (SOF2), and "
                "lossless (SOF3) Huffman JPEG decode without libjpeg "
                "(arithmetic/hierarchical found)"
            )
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG scan before SOF")
            if lossless:
                return _decode_lossless(
                    content, pos, frame, body, huff, restart, prec=precision
                )
            if not progressive:
                ns = body[0]
                scan = []
                for i in range(ns):
                    cs, tables = body[1 + 2 * i], body[2 + 2 * i]
                    scan.append((cs, tables >> 4, tables & 0x0F))
                return _decode_scan(
                    content, pos, frame, scan, qt, huff, restart,
                    prec=precision,
                )
            if prog is None:
                prog = _ProgState(frame)
            pos = prog.decode_scan(content, pos, body, huff, restart)
    if progressive and prog is not None:
        return prog.reconstruct(qt, prec=precision)
    raise ValueError("JPEG without a scan")


#: zigzag scatter indices for vectorized (n, 64) -> (n, 8, 8)
_ZZ_R = np.array([rr for rr, _cc in ZIGZAG])
_ZZ_C = np.array([cc for _rr, cc in ZIGZAG])


def _finish_planes(w, h, hmax, vmax, comp_planes, prec=8):
    """Shared reconstruction tail: per-component ``(zz, q, ch, cv)``
    with ``zz`` the (gy, gx, 64) zigzag coefficient grid → pixels.
    12-bit frames level-shift by 2048 and downscale to the pipeline's
    8-bit sample contract (the 4 LSBs carry no perceptual-hash
    information)."""
    level = float(1 << (prec - 1))
    scale = float(1 << (prec - 8))
    planes = []
    for zz, q, ch, cv in comp_planes:
        gy, gx = zz.shape[:2]
        blocks = np.zeros((gy * gx, 8, 8))
        blocks[:, _ZZ_R, _ZZ_C] = zz.reshape(gy * gx, 64)
        spat = _blocks_idct(blocks * q, level).reshape(gy, gx, 8, 8)
        plane = spat.transpose(0, 2, 1, 3).reshape(gy * 8, gx * 8)
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.rint(planes[0] / scale), 0, 255).astype(np.uint8)
        return w, h, 1, out.tobytes()
    y, cb, cr = planes
    rgb = np.stack(
        [
            y + 1.402 * (cr - level),
            y - 0.344136 * (cb - level) - 0.714136 * (cr - level),
            y + 1.772 * (cb - level),
        ],
        axis=-1,
    )
    out = np.clip(np.rint(rgb / scale), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()


def _decode_scan(data, pos, frame, scan, qt, huff, restart, prec=8):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    comp_info = []
    for cid, ch, cv, tq in comps:
        dc_id, ac_id = next((d, a) for cs, d, a in scan if cs == cid)
        zz = np.zeros((mcus_y * cv, mcus_x * ch, 64))
        comp_info.append(
            dict(ch=ch, cv=cv, q=qt[tq], dc=huff[(0, dc_id)],
                 ac=huff[(1, ac_id)], zz=zz, pred=0)
        )

    r = _BitReader(data, pos)
    rst = 0
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                r.align_restart(rst)
                rst = (rst + 1) & 7
                for ci in comp_info:
                    ci["pred"] = 0
            for ci in comp_info:
                for by in range(ci["cv"]):
                    for bx in range(ci["ch"]):
                        blk = np.zeros(64)
                        s = _decode_symbol(r, ci["dc"])
                        diff = _extend(r.bits(s), s) if s else 0
                        ci["pred"] += diff
                        blk[0] = ci["pred"]
                        k = 1
                        while k < 64:
                            sym = _decode_symbol(r, ci["ac"])
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(r.bits(size), size)
                            k += 1
                        ci["zz"][my * ci["cv"] + by, mx * ci["ch"] + bx] = blk
            mcu += 1

    return _finish_planes(
        w, h, hmax, vmax,
        [(ci["zz"], ci["q"], ci["ch"], ci["cv"]) for ci in comp_info],
        prec=prec,
    )


def _decode_lossless_samples(data, pos, frame, body, huff, prec):
    """ITU-T T.81 Annex H lossless (SOF3) scan decode → the raw
    full-precision sample grid as a numpy int array, shape (h, w) for
    one component or (h, w, n) for an interleaved 1:1 frame.

    Per sample: a DC-class Huffman symbol gives the difference
    category SSSS (16 = +32768 with no magnitude bits), the magnitude
    bits extend to the signed difference, and the sample reconstructs
    as ``(Px + diff) mod 2^16`` where Px is the selected predictor
    (H.1.2.1) — Ra on the first line, Rb at the start of later lines,
    ``2^(P-Pt-1)`` for the very first sample; prediction state is PER
    COMPONENT, components interleave one sample per MCU (H.2).  The
    decoded value is shifted left by the point transform Pt.  Scope:
    1:1 sampling, no restart markers — subsampled or restart-interval
    lossless raises with guidance."""
    w, h, comps = frame
    ns = body[0]
    if any(c[1] != 1 or c[2] != 1 for c in comps):
        raise NotImplementedError("subsampled lossless JPEG needs libjpeg")
    tables = []
    for i in range(ns):
        cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
        ci = next(j for j, c in enumerate(comps) if c[0] == cs)
        tables.append((ci, huff[(0, tabs >> 4)]))
    if sorted(ci for ci, _ in tables) != list(range(len(comps))):
        raise NotImplementedError(
            "multi-scan (non-interleaved) lossless JPEG needs libjpeg"
        )
    predictor = body[1 + 2 * ns]  # Ss field repurposed as the selector
    pt = body[3 + 2 * ns] & 0x0F  # Al field repurposed as point transform
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    default = 1 << (prec - pt - 1)
    planes = {ci: [[0] * w for _ in range(h)] for ci, _ in tables}
    r = _BitReader(data, pos)
    for y in range(h):
        for x in range(w):
            for ci, table in tables:
                s = _decode_symbol(r, table)
                if s == 16:
                    diff = 32768  # the category with no magnitude bits
                else:
                    diff = _extend(r.bits(s), s) if s else 0
                plane = planes[ci]
                row = plane[y]
                if y == 0:
                    px = row[x - 1] if x else default
                elif x == 0:
                    px = plane[y - 1][0]
                else:
                    above = plane[y - 1]
                    a, b, c = row[x - 1], above[x], above[x - 1]
                    if predictor == 1:
                        px = a
                    elif predictor == 2:
                        px = b
                    elif predictor == 3:
                        px = c
                    elif predictor == 4:
                        px = a + b - c
                    elif predictor == 5:
                        px = a + ((b - c) >> 1)
                    elif predictor == 6:
                        px = b + ((a - c) >> 1)
                    else:
                        px = (a + b) >> 1
                row[x] = (px + diff) & 0xFFFF
    if len(planes) == 1:
        arr = np.array(planes[tables[0][0]], dtype=np.int64)
    else:
        arr = np.stack(
            [np.array(planes[ci], dtype=np.int64) for ci in sorted(planes)],
            axis=-1,
        )
    return arr << pt


def _decode_lossless(data, pos, frame, body, huff, restart, prec=8):
    if restart:
        raise NotImplementedError(
            "lossless JPEG with restart markers needs libjpeg"
        )
    w, h, comps = frame
    arr = _decode_lossless_samples(data, pos, frame, body, huff, prec)
    # the pipeline's 8-bit sample contract, like the 12-bit DCT path;
    # lossless defines no color transform, so components pass through
    # as stored (grayscale or direct RGB)
    scale = 2.0 ** (prec - 8)
    out = np.clip(np.rint(arr / scale), 0, 255).astype(np.uint8)
    return w, h, len(comps), out.tobytes()


class _ProgState:
    """Coefficient accumulator + scan decoder for progressive (SOF2)
    frames: spectral selection (Ss..Se bands per scan) and successive
    approximation (Ah/Al bit planes) per ITU-T T.81 §G.2, including
    EOB runs, AC refinement correction bits, interleaved DC scans,
    non-interleaved single-component scans over the USED block grid
    (not the MCU-padded grid), and restart markers."""

    def __init__(self, frame):
        w, h, comps = frame
        self.frame = frame
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        self.mcus_x = -(-w // (8 * self.hmax))
        self.mcus_y = -(-h // (8 * self.vmax))
        # per component: MCU-padded zigzag grid of Python-int coefs
        # (bit-plane ops need exact two's-complement semantics) + the
        # used-block dims a non-interleaved scan covers
        self.coef: list[list[list[list[int]]]] = []
        self.used: list[tuple[int, int]] = []
        self.tq: list[int] = []
        for _cid, ch, cv, tq in comps:
            gy, gx = self.mcus_y * cv, self.mcus_x * ch
            self.coef.append([[[0] * 64 for _ in range(gx)] for _ in range(gy)])
            comp_w = -(-(w * ch) // self.hmax)
            comp_h = -(-(h * cv) // self.vmax)
            bw = -(-comp_w // 8)
            bh = -(-comp_h // 8)
            self.used.append((min(bh, gy), min(bw, gx)))
            self.tq.append(tq)

    def decode_scan(self, data, pos, body, huff, restart):
        _w, _h, comps = self.frame
        ns = body[0]
        scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
        ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
        ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        members = []
        for cs, tabs in scan:
            ci = next(i for i, c in enumerate(comps) if c[0] == cs)
            table = (
                huff.get((0, tabs >> 4)) if ss == 0 else huff[(1, tabs & 0x0F)]
            )
            members.append((ci, table))
        r = _BitReader(data, pos)
        self._eobrun = 0
        if ns > 1:
            units = self.mcus_y * self.mcus_x
            blocks_of = self._mcu_blocks(members)
        else:
            ci = members[0][0]
            bh, bw = self.used[ci]
            units = bh * bw
            table = members[0][1]
            blocks_of = lambda u: [  # noqa: E731
                (ci, table, u // bw, u % bw)
            ]
        preds = [0] * len(comps)
        rst = 0
        for u in range(units):
            if restart and u and u % restart == 0:
                r.align_restart(rst)
                rst = (rst + 1) & 7
                preds = [0] * len(comps)
                self._eobrun = 0
            for ci, table, by, bx in blocks_of(u):
                blk = self.coef[ci][by][bx]
                if ss == 0 and ah == 0:  # DC first
                    s = _decode_symbol(r, table)
                    diff = _extend(r.bits(s), s) if s else 0
                    preds[ci] += diff
                    blk[0] = preds[ci] << al
                elif ss == 0:  # DC refine: one raw bit per block
                    if r.bit():
                        blk[0] |= 1 << al
                elif ah == 0:
                    self._ac_first(r, table, blk, ss, se, al)
                else:
                    self._ac_refine(r, table, blk, ss, se, al)
        # skip post-scan pad bits to the next marker (not RSTn)
        p = r.pos
        n = len(data)
        while p + 1 < n and not (
            data[p] == 0xFF and data[p + 1] != 0x00
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            p += 1
        return p

    def _mcu_blocks(self, members):
        comps = self.frame[2]

        def blocks(u):
            my, mx = divmod(u, self.mcus_x)
            out = []
            for ci, table in members:
                _cid, ch, cv, _tq = comps[ci]
                for by in range(cv):
                    for bx in range(ch):
                        out.append((ci, table, my * cv + by, mx * ch + bx))
            return out

        return blocks

    def _ac_first(self, r, table, blk, ss, se, al):
        if self._eobrun > 0:
            self._eobrun -= 1
            return
        k = ss
        while k <= se:
            sym = _decode_symbol(r, table)
            run, size = sym >> 4, sym & 0x0F
            if size == 0:
                if run == 15:
                    k += 16  # ZRL
                    continue
                self._eobrun = (1 << run) + (r.bits(run) if run else 0) - 1
                return
            k += run
            if k > se:
                raise ValueError("AC run past band end")
            blk[k] = _extend(r.bits(size), size) << al
            k += 1

    def _ac_refine(self, r, table, blk, ss, se, al):
        p1, m1 = 1 << al, -1 << al
        k = ss
        if self._eobrun == 0:
            while k <= se:
                sym = _decode_symbol(r, table)
                run, size = sym >> 4, sym & 0x0F
                val = 0
                if size == 0:
                    if run < 15:
                        self._eobrun = (1 << run) + (r.bits(run) if run else 0)
                        break  # correction-bit tail handled below
                else:
                    if size != 1:
                        raise ValueError("AC refinement size must be 1")
                    val = p1 if r.bit() else m1
                # advance past `run` zero-history positions, correcting
                # already-nonzero coefficients along the way
                while k <= se:
                    c = blk[k]
                    if c != 0:
                        if r.bit() and not (c & p1):
                            blk[k] = c + (p1 if c >= 0 else m1)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if val and k <= se:
                    blk[k] = val
                k += 1
        if self._eobrun > 0:
            while k <= se:
                c = blk[k]
                if c != 0 and r.bit() and not (c & p1):
                    blk[k] = c + (p1 if c >= 0 else m1)
                k += 1
            self._eobrun -= 1

    def reconstruct(self, qt, prec=8):
        w, h, comps = self.frame
        comp_planes = []
        for ci, (_cid, ch, cv, tq) in enumerate(comps):
            zz = np.array(self.coef[ci], dtype=float)
            comp_planes.append((zz, qt[tq], ch, cv))
        return _finish_planes(w, h, self.hmax, self.vmax, comp_planes, prec=prec)


# ---------------------------------------------------------------------------
# encoder twin (fixtures / round-trip tests)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = self.n = 0

    def flush(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)


def _canonical_table(symbols: list[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Single-length canonical Huffman over the USED symbol set (valid
    JPEG: the all-ones code stays unused because n < 2^L)."""
    syms = sorted(set(symbols)) or [0]
    length = max(2, (len(syms)).bit_length())
    if len(syms) >= (1 << length):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    enc = {s: (length, i) for i, s in enumerate(syms)}
    return bits, syms, enc


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def make_jpeg_bytes(
    width: int,
    height: int,
    pixels: bytes,
    *,
    channels: int = 1,
    subsampling: str = "444",
    quant: int = 16,
    restart_interval: int = 0,
    progressive: bool = False,
    precision: int = 8,
    lossless: bool = False,
    predictor: int = 1,
) -> bytes:
    """Encode raw samples (gray or RGB, row-major) as a baseline
    sequential JPEG — the :func:`decode_jpeg_pixels` round-trip twin.
    Flat quantization table (``quant`` everywhere, DC step 8 so
    constant blocks are bit-exact), canonical self-declared Huffman
    tables, optional 4:2:0 subsampling and restart markers.

    ``progressive=True`` emits the SAME quantized coefficients as an
    SOF2 five-phase scan script (DC first Al=1 → DC refine → AC bands
    1–20 and 21–63 per component at Al=1 → AC refine per component) —
    a lossless reorganization, so decoded pixels are byte-identical to
    the sequential encoding's.

    ``lossless=True`` emits an SOF3 frame (T.81 Annex H: per-sample
    predictor + Huffman-coded differences, no DCT, no quantization) —
    1 or 3 components interleaved at 1:1 (no color transform: RGB
    passes through as stored), ``precision`` 2-16 (samples are uint8
    for ≤8 bits, little-endian uint16 above), ``predictor`` selects
    H.1.2.1's 1-7.  Exact by construction, so the round-trip test
    contract is bit-identity on the raw samples."""
    if lossless:
        if channels not in (1, 3):
            raise ValueError("lossless fixtures are 1- or 3-component")
        if progressive or restart_interval:
            raise ValueError("lossless excludes progressive/restart fixtures")
        if not 2 <= precision <= 16:
            raise ValueError("lossless precision must be 2..16")
        if not 1 <= predictor <= 7:
            raise ValueError("predictor must be 1..7")
        return _encode_lossless(
            width, height, pixels, precision, predictor, channels
        )
    if precision not in (8, 12):
        raise ValueError("precision must be 8 or 12")
    if precision == 12:
        # the medical-imaging shape: grayscale sequential only; pixels
        # are little-endian uint16 samples in 0..4095
        if channels != 1:
            raise ValueError("12-bit fixtures are grayscale only")
        arr = np.frombuffer(pixels, dtype="<u2").astype(float).reshape(
            height, width, channels
        )
    else:
        arr = np.frombuffer(pixels, dtype=np.uint8).astype(float).reshape(
            height, width, channels
        )
    level = float(1 << (precision - 1))
    if channels == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
        factors = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [(1, 1)] * 3
    elif channels == 1:
        planes = [arr[..., 0]]
        factors = [(1, 1)]
    else:
        raise ValueError("channels must be 1 or 3")

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    qtab = np.full((8, 8), float(quant))
    qtab[0, 0] = 8.0  # constant blocks round-trip exactly: DC = 8*mean+...

    # per component: pad plane to its block grid, subsample, forward DCT
    comp_blocks = []
    for (fh, fv), plane in zip(factors, planes):
        if (fh, fv) != (hmax, vmax):
            sy, sx = vmax // fv, hmax // fh
            ph = -(-plane.shape[0] // sy) * sy
            pw = -(-plane.shape[1] // sx) * sx
            plane = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])), mode="edge")
            plane = plane.reshape(ph // sy, sy, pw // sx, sx).mean(axis=(1, 3))
        gh, gw = mcus_y * fv * 8, mcus_x * fh * 8
        plane = np.pad(
            plane, ((0, gh - plane.shape[0]), (0, gw - plane.shape[1])), mode="edge"
        )
        gy, gx = gh // 8, gw // 8
        blocks = plane.reshape(gy, 8, gx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        quantized = np.rint(_blocks_dct(blocks, level) / qtab).astype(int).reshape(gy, gx, 8, 8)
        comp_blocks.append(quantized)

    if progressive:
        if restart_interval:
            raise ValueError("restart markers unsupported with progressive=True")
        return _encode_progressive(
            width, height, channels, factors, comp_blocks, qtab,
            precision=precision,
        )

    # gather per-block zigzag symbol streams (two passes: symbols first,
    # so the canonical tables cover exactly what the scan emits)
    def block_symbols(blk) -> tuple[int, list[tuple[int, int]]]:
        zz = [int(blk[rr, cc]) for rr, cc in ZIGZAG]
        acs = []
        run = 0
        last_nz = max((i for i, v in enumerate(zz) if v), default=0)
        for i in range(1, 64):
            v = zz[i]
            if v == 0:
                if i > last_nz:
                    break
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            s = _size_cat(v)
            acs.append(((run << 4) | s, v, s))
            run = 0
        if last_nz < 63 or zz[63] == 0:
            acs.append((0x00, 0, 0))  # EOB
        return zz[0], acs

    dc_syms: list[list[int]] = [[] for _ in range(2)]
    ac_syms: list[list[int]] = [[] for _ in range(2)]
    mcu_stream = []  # (table_sel, dc_diff, acs) per block in scan order
    preds = [0] * len(comp_blocks)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                preds = [0] * len(comp_blocks)
                mcu_stream.append(("RST",))
            for ci, ((fh, fv), blocks) in enumerate(zip(factors, comp_blocks)):
                sel = 0 if ci == 0 else 1
                for by in range(fv):
                    for bx in range(fh):
                        dc, acs = block_symbols(blocks[my * fv + by, mx * fh + bx])
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        dc_syms[sel].append(_size_cat(diff))
                        ac_syms[sel].extend(sym for sym, _v, _s in acs)
                        mcu_stream.append((sel, diff, acs))
            mcu += 1

    n_tables = 1 if channels == 1 else 2
    dc_tabs = [_canonical_table(dc_syms[i]) for i in range(n_tables)]
    ac_tabs = [_canonical_table(ac_syms[i]) for i in range(n_tables)]

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    if precision == 12:  # Pq=1: 16-bit entries, the 12-bit convention
        zz_q16 = b"".join(
            struct.pack(">H", int(qtab[rr, cc])) for rr, cc in ZIGZAG
        )
        seg(0xDB, b"\x10" + zz_q16)
    else:
        zz_q = bytes(int(qtab[rr, cc]) for rr, cc in ZIGZAG)
        seg(0xDB, b"\x00" + zz_q)
    sof = struct.pack(">BHHB", precision, height, width, channels)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    seg(0xC0, sof)
    for tc, tabs in ((0, dc_tabs), (1, ac_tabs)):
        for tid, (bits, syms, _enc) in enumerate(tabs):
            seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(syms))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for ci in range(channels):
        sel = 0 if ci == 0 else min(ci, n_tables - 1)
        sos += bytes([ci + 1, (sel << 4) | sel])
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    wtr = _BitWriter()
    rst = 0
    for item in mcu_stream:
        if item[0] == "RST":
            wtr.flush()
            out.extend(wtr.out)
            wtr = _BitWriter()
            out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
            rst += 1
            continue
        sel, diff, acs = item
        s = _size_cat(diff)
        length, code = dc_tabs[sel][2][s]
        wtr.write(code, length)
        if s:
            wtr.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        for sym, v, vs in acs:
            length, code = ac_tabs[sel][2][sym]
            wtr.write(code, length)
            if vs:
                wtr.write(v if v > 0 else v + (1 << vs) - 1, vs)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (SOF2 scan script over the same quantized coefficients)
# ---------------------------------------------------------------------------


def _shift_mag(v: int, al: int) -> int:
    """T.81 point transform for AC first scans: magnitude shift,
    sign preserved (NOT an arithmetic shift)."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _encode_progressive(width, height, channels, factors, comp_blocks, qtab,
                        precision=8):
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    ncomp = len(factors)
    # zigzag coefficient grids + used-block dims per component
    zzs, useds = [], []
    for (fh, fv), blocks in zip(factors, comp_blocks):
        zzs.append(blocks[:, :, _ZZ_R, _ZZ_C])
        comp_w = -(-(width * fh) // hmax)
        comp_h = -(-(height * fv) // vmax)
        useds.append((-(-comp_h // 8), -(-comp_w // 8)))

    def dc_first_ops(al):
        ops = []
        preds = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    tid = 0 if ci == 0 else 1
                    for by in range(fv):
                        for bx in range(fh):
                            t = int(zzs[ci][my * fv + by, mx * fh + bx, 0]) >> al
                            diff = t - preds[ci]
                            preds[ci] = t
                            s = _size_cat(diff)
                            ops.append(("s", (0, tid), s))
                            if s:
                                ops.append(
                                    ("b", diff if diff > 0 else diff + (1 << s) - 1, s)
                                )
        return ops

    def dc_refine_ops(al):
        ops = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (fh, fv) in enumerate(factors):
                    for by in range(fv):
                        for bx in range(fh):
                            c = int(zzs[ci][my * fv + by, mx * fh + bx, 0])
                            ops.append(("b", (c >> al) & 1, 1))
        return ops

    def ac_first_ops(ci, ss, se, al):
        ops = []
        eobrun = 0

        def flush():
            nonlocal eobrun
            if eobrun:
                nbits = eobrun.bit_length() - 1
                ops.append(("s", (1, 0), nbits << 4))
                if nbits:
                    ops.append(("b", eobrun - (1 << nbits), nbits))
                eobrun = 0

        bh, bw = useds[ci]
        for by in range(bh):
            for bx in range(bw):
                band = [
                    _shift_mag(int(zzs[ci][by, bx, k]), al)
                    for k in range(ss, se + 1)
                ]
                last = max((i for i, v in enumerate(band) if v), default=-1)
                if last < 0:
                    eobrun += 1
                else:
                    flush()
                    run = 0
                    for i in range(last + 1):
                        v = band[i]
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ops.append(("s", (1, 0), 0xF0))
                            run -= 16
                        s = _size_cat(v)
                        ops.append(("s", (1, 0), (run << 4) | s))
                        ops.append(("b", v if v > 0 else v + (1 << s) - 1, s))
                        run = 0
                    if last < se - ss:
                        eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
        flush()
        return ops

    def ac_refine_ops(ci, ss, se, al):
        ops = []
        eobrun = 0
        be = []

        def flush():
            nonlocal eobrun, be
            if eobrun:
                nbits = eobrun.bit_length() - 1
                ops.append(("s", (1, 0), nbits << 4))
                if nbits:
                    ops.append(("b", eobrun - (1 << nbits), nbits))
                eobrun = 0
            ops.extend(be)
            be = []

        bh, bw = useds[ci]
        for by in range(bh):
            for bx in range(bw):
                band = [int(zzs[ci][by, bx, k]) for k in range(ss, se + 1)]
                absv = [abs(v) >> al for v in band]
                eobpos = max((i for i, t in enumerate(absv) if t == 1), default=-1)
                run = 0
                br = []
                for i, t in enumerate(absv):
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and i <= eobpos:
                        flush()
                        ops.append(("s", (1, 0), 0xF0))
                        run -= 16
                        ops.extend(br)
                        br = []
                    if t > 1:
                        br.append(("b", t & 1, 1))
                        continue
                    flush()
                    ops.append(("s", (1, 0), (run << 4) | 1))
                    ops.append(("b", 1 if band[i] > 0 else 0, 1))
                    ops.extend(br)
                    br = []
                    run = 0
                if run > 0 or br:
                    eobrun += 1
                    be.extend(br)
                    if eobrun == 0x7FFF:
                        flush()
        flush()
        return ops

    # scan script: comps=None → interleaved all-component DC scan
    scans = [
        dict(comps=None, ss=0, se=0, ah=0, al=1, ops=dc_first_ops(1)),
        dict(comps=None, ss=0, se=0, ah=1, al=0, ops=dc_refine_ops(0)),
    ]
    for ci in range(ncomp):
        scans.append(
            dict(comps=[ci], ss=1, se=20, ah=0, al=1, ops=ac_first_ops(ci, 1, 20, 1))
        )
    for ci in range(ncomp):
        scans.append(
            dict(comps=[ci], ss=21, se=63, ah=0, al=1, ops=ac_first_ops(ci, 21, 63, 1))
        )
    for ci in range(ncomp):
        scans.append(
            dict(comps=[ci], ss=1, se=63, ah=1, al=0, ops=ac_refine_ops(ci, 1, 63, 0))
        )

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    if precision == 12:  # Pq=1: 16-bit entries, the 12-bit convention
        zz_q16 = b"".join(
            struct.pack(">H", int(qtab[rr, cc])) for rr, cc in ZIGZAG
        )
        seg(0xDB, b"\x10" + zz_q16)
    else:
        zz_q = bytes(int(qtab[rr, cc]) for rr, cc in ZIGZAG)
        seg(0xDB, b"\x00" + zz_q)
    sof = struct.pack(">BHHB", precision, height, width, channels)
    for ci, (fh, fv) in enumerate(factors):
        sof += bytes([ci + 1, (fh << 4) | fv, 0])
    seg(0xC2, sof)

    for sc in scans:
        # per-scan canonical tables over exactly the symbols the scan
        # emits, re-declared before each SOS (exercises the decoder's
        # mid-file DHT redefinition path)
        tabs = {}
        for op in sc["ops"]:
            if op[0] == "s":
                tabs.setdefault(op[1], []).append(op[2])
        encs = {}
        for (tc, tid), syms in sorted(tabs.items()):
            bits, symlist, enc = _canonical_table(syms)
            seg(0xC4, bytes([(tc << 4) | tid]) + bytes(bits) + bytes(symlist))
            encs[(tc, tid)] = enc
        members = range(ncomp) if sc["comps"] is None else sc["comps"]
        sos = bytes([len(list(members))])
        for ci in members:
            tid = 0 if ci == 0 else 1
            sel = (tid << 4) if sc["ss"] == 0 else 0  # td | ta
            sos += bytes([ci + 1, sel])
        sos += bytes([sc["ss"], sc["se"], (sc["ah"] << 4) | sc["al"]])
        seg(0xDA, sos)
        wtr = _BitWriter()
        for op in sc["ops"]:
            if op[0] == "s":
                length, code = encs[op[1]][op[2]]
                wtr.write(code, length)
            else:
                wtr.write(op[1], op[2])
        wtr.flush()
        out.extend(wtr.out)

    out.extend(b"\xff\xd9")
    return bytes(out)


# ---------------------------------------------------------------------------
# lossless encoder (SOF3 twin — exact, so round trips assert bit identity)
# ---------------------------------------------------------------------------


def _encode_lossless(width, height, pixels, precision, predictor, channels=1):
    dt = np.uint8 if precision <= 8 else "<u2"
    arr = np.frombuffer(pixels, dtype=dt).astype(int).reshape(
        height, width, channels
    )
    if arr.max(initial=0) >= (1 << precision):
        raise ValueError(f"sample exceeds {precision}-bit range")
    default = 1 << (precision - 1)
    syms: list[int] = []
    ops: list[tuple[int, int, int]] = []  # (symbol, mapped magnitude, nbits)
    for y in range(height):
        for x in range(width):
            for ci in range(channels):  # interleaved: one sample/comp per MCU
                row = arr[y, :, ci]
                if y == 0:
                    px = int(row[x - 1]) if x else default
                elif x == 0:
                    px = int(arr[y - 1, 0, ci])
                else:
                    above = arr[y - 1, :, ci]
                    a, b, c = int(row[x - 1]), int(above[x]), int(above[x - 1])
                    if predictor == 1:
                        px = a
                    elif predictor == 2:
                        px = b
                    elif predictor == 3:
                        px = c
                    elif predictor == 4:
                        px = a + b - c
                    elif predictor == 5:
                        px = a + ((b - c) >> 1)
                    elif predictor == 6:
                        px = b + ((a - c) >> 1)
                    else:
                        px = (a + b) >> 1
                d = (int(row[x]) - px) & 0xFFFF
                if d == 32768:
                    syms.append(16)
                    ops.append((16, 0, 0))
                else:
                    diff = d if d < 32768 else d - 65536
                    s = _size_cat(diff)
                    syms.append(s)
                    ops.append((s, diff if diff > 0 else diff + (1 << s) - 1, s))

    bits, symlist, enc = _canonical_table(syms)
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body)

    seg(0xC4, bytes([0x00]) + bytes(bits) + bytes(symlist))
    sof = struct.pack(">BHHB", precision, height, width, channels)
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, 0])
    seg(0xC3, sof)
    # SOS: Ss carries the predictor selector, Se=0, Ah/Al=0 (Pt=0);
    # every component shares the one canonical table
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])
    seg(0xDA, sos + bytes([predictor, 0, 0]))
    wtr = _BitWriter()
    for s, v, nbits in ops:
        length, code = enc[s]
        wtr.write(code, length)
        if nbits:
            wtr.write(v, nbits)
    wtr.flush()
    out.extend(wtr.out)
    out.extend(b"\xff\xd9")
    return bytes(out)
