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
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: Td -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: Ta -> Kx
    frame = None
    progressive = False
    arith = False
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            # SOF0/SOF1 sequential, SOF2 progressive, SOF3 lossless,
            # SOF9/SOF10 arithmetic sequential/progressive
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
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "hierarchical/differential and arithmetic-lossless JPEG "
                "frames (SOF5-7/11/13-15) need libjpeg"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning
            off = 0
            while off + 2 <= len(body):
                tc, tb = body[off] >> 4, body[off] & 0x0F
                cs = body[off + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)
                else:
                    ac_cond[tb] = cs
                off += 2
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
                if arith:
                    return _decode_scan_arith(
                        content, pos, frame, scan, qt, dc_cond, ac_cond,
                        restart, prec=precision,
                    )
                return _decode_scan(
                    content, pos, frame, scan, qt, huff, restart,
                    prec=precision,
                )
            if prog is None:
                prog = _ProgState(frame)
            if arith:
                pos = prog.decode_scan_arith(
                    content, pos, body, dc_cond, ac_cond, restart
                )
            else:
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

    def decode_scan_arith(self, data, pos, body, dc_cond, ac_cond, restart):
        """Arithmetic (SOF10) sibling of :meth:`decode_scan` — same
        scan-header plumbing and block walk, T.81 §G.2 arithmetic
        models (per-block end-of-block decisions; no EOB runs)."""
        _w, _h, comps = self.frame
        ns = body[0]
        scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
        ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
        ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
        if ss == 0 and se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ss > 0 and ns != 1:
            raise ValueError("progressive AC scan must be single-component")
        dc_stats: dict[int, _Stats] = {}
        ac_stats: dict[int, _Stats] = {}
        fixed = _fixed_stats()
        comp_states: dict[int, dict] = {}
        kx = _ARITH_AC_KX
        members = []
        for cs, tabs in scan:
            ci = next(i for i, c in enumerate(comps) if c[0] == cs)
            td, ta = tabs >> 4, tabs & 0x0F
            if ss == 0:
                st = dc_stats.setdefault(td, _Stats(64))
                comp_states[ci] = dict(
                    ctx=0, cond=dc_cond.get(td, _ARITH_DC_COND)
                )
            else:
                st = ac_stats.setdefault(ta, _Stats(260))
                kx = ac_cond.get(ta, _ARITH_AC_KX)
            members.append((ci, st))
        if ns > 1:
            units = self.mcus_y * self.mcus_x
            blocks_of = self._mcu_blocks(members)
        else:
            ci0, st0 = members[0]
            bh, bw = self.used[ci0]
            units = bh * bw
            blocks_of = lambda u: [  # noqa: E731
                (ci0, st0, u // bw, u % bw)
            ]
        preds = [0] * len(comps)
        dec = _ArithDecoder(data, pos)
        rst = 0
        for u in range(units):
            if restart and u and u % restart == 0:
                p = _next_arith_marker(data, dec.bp)
                if p + 1 >= len(data) or data[p + 1] != 0xD0 + rst:
                    raise ValueError("lost arithmetic restart sync")
                dec = _ArithDecoder(data, p + 2)
                rst = (rst + 1) & 7
                for s in (*dc_stats.values(), *ac_stats.values()):
                    s.reset()
                preds = [0] * len(comps)
                for cstate in comp_states.values():
                    cstate["ctx"] = 0
            for ci, st, by, bx in blocks_of(u):
                blk = self.coef[ci][by][bx]
                if ss == 0 and ah == 0:  # DC first
                    preds[ci] += _arith_dc_decode(dec, st, comp_states[ci])
                    blk[0] = preds[ci] << al
                elif ss == 0:  # DC refine: one fixed-bin decision
                    if dec.decode(fixed, 0):
                        blk[0] |= 1 << al
                elif ah == 0:
                    _arith_ac_decode(dec, st, kx, fixed, blk, ss, se, al)
                else:
                    _arith_ac_refine_decode(dec, st, fixed, blk, ss, se, al)
        return _next_arith_marker(data, dec.bp)

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
# arithmetic entropy coding (ITU-T T.81 Annex D QM-coder; SOF9/SOF10)
# ---------------------------------------------------------------------------

#: ITU-T T.81 Table D.3 — the QM-coder probability estimation state
#: machine as ``(Qe, next-index-after-LPS, next-index-after-MPS,
#: MPS-switch)`` rows.  Index 113 is the non-adapting ~0.5 bin (its
#: transitions point back at itself) used for AC signs and refinement
#: bits.  The values are spec constants, not tunables; a test pins this
#: tuple against the system libjpeg's exported ``jpeg_aritab`` whenever
#: that library is present, so a transcription error cannot survive.
_QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

#: default conditioning when no DAC segment overrides it (T.81 F.1.4.4.1.4
#: / F.1.4.4.2: L=0, U=1 for DC, Kx=5 for AC)
_ARITH_DC_COND = (0, 1)
_ARITH_AC_KX = 5


class _Stats:
    """One statistics area: per-bin adaptive state ``(index into
    _QE_TABLE, current MPS sense)``, all-zero at scan start per T.81
    F.1.4.4.1.3 (and reset again at every restart marker)."""

    __slots__ = ("idx", "mps")

    def __init__(self, n: int):
        self.idx = bytearray(n)
        self.mps = bytearray(n)

    def reset(self) -> None:
        for i in range(len(self.idx)):
            self.idx[i] = 0
            self.mps[i] = 0


def _fixed_stats() -> _Stats:
    """The non-adaptive ~0.5 bin (T.81's fixed state): index 113's
    transitions return to 113 with no MPS switch, so ordinary
    decode/encode calls leave it unchanged."""
    st = _Stats(1)
    st.idx[0] = 113
    return st


def _next_arith_marker(data: bytes, p: int) -> int:
    """Position of the 0xFF that introduces the next marker at or after
    ``p``, skipping stuffed 0xFF00 data bytes and 0xFF fill runs."""
    n = len(data)
    while p < n:
        if data[p] != 0xFF:
            p += 1
            continue
        q = p + 1
        while q < n and data[q] == 0xFF:
            q += 1
        if q < n and data[q] == 0x00:
            p = q + 1
            continue
        return q - 1
    return n


class _ArithDecoder:
    """T.81 §D.2 QM decoder over one entropy-coded segment.  Byte feed
    follows B.1.1.5: 0xFF 0x00 is a stuffed data byte, a 0xFF fill run
    collapses, and any real marker ends the segment — decoding then
    continues against zero bytes until the MCU count is satisfied
    (encoders may drop trailing zero bytes)."""

    __slots__ = ("data", "n", "bp", "marker", "c", "a", "ct")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.n = len(data)
        self.bp = pos
        self.marker: int | None = None
        # INITDEC: the 16-bit comparison window (bits 16..31) primes
        # with the first two code bytes, the 8-bit prefetch (bits
        # 8..15) with the third; A starts at the full initial interval
        # 0x10000, matching INITENC
        self.c = (self._byte() << 24) + (self._byte() << 16)
        self.c += self._byte() << 8
        self.ct = 8
        self.a = 0x10000

    def _byte(self) -> int:
        if self.marker is not None:
            return 0
        d, p = self.data, self.bp
        if p >= self.n:
            self.marker = 0xD9  # truncated stream: behave like EOI
            return 0
        b = d[p]
        if b != 0xFF:
            self.bp = p + 1
            return b
        q = p + 1
        while q < self.n and d[q] == 0xFF:
            q += 1
        if q < self.n and d[q] == 0x00:
            self.bp = q + 1
            return 0xFF
        self.marker = d[q] if q < self.n else 0xD9
        return 0

    def decode(self, st: _Stats, i: int) -> int:
        """One binary decision against statistics bin ``i`` (T.81
        Figures D.15–D.19: DECODE with MPS/LPS conditional exchange,
        estimation, renormalization)."""
        idx = st.idx[i]
        mps = st.mps[i]
        qe, nlps, nmps, sw = _QE_TABLE[idx]
        a = self.a - qe
        c = self.c
        if (c >> 16) < a:
            if a & 0x8000:
                self.a = a
                return mps
            if a < qe:
                d = 1 - mps
                if sw:
                    st.mps[i] = d
                st.idx[i] = nlps
            else:
                d = mps
                st.idx[i] = nmps
        else:
            c -= a << 16
            if a < qe:
                d = mps
                st.idx[i] = nmps
            else:
                d = 1 - mps
                if sw:
                    st.mps[i] = d
                st.idx[i] = nlps
            a = qe
        ct = self.ct
        while True:
            if ct == 0:
                c += self._byte() << 8
                ct = 8
            a <<= 1
            c <<= 1
            ct -= 1
            if a & 0x8000:
                break
        self.a = a
        self.c = c & 0xFFFFFFFF
        self.ct = ct
        return d


class _ArithEncoder:
    """T.81 §D.1 QM encoder.  Code bytes accumulate un-stuffed in
    ``raw`` (carries ripple backward through it — the C+A interval
    invariant guarantees a carry never outruns the emitted prefix);
    ``flush`` terminates per D.1.8.2, drops spec-sanctioned trailing
    zero bytes, and applies 0xFF00 byte stuffing."""

    __slots__ = ("a", "c", "ct", "raw")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # 3 spacer bits: first byte out cannot carry
        self.raw = bytearray()

    def encode(self, st: _Stats, i: int, d: int) -> None:
        idx = st.idx[i]
        mps = st.mps[i]
        qe, nlps, nmps, sw = _QE_TABLE[idx]
        a = self.a - qe
        if d == mps:
            if a & 0x8000:  # no renormalization, no estimation change
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the upper part
                self.c += a
                a = qe
            st.idx[i] = nmps
        else:
            if a < qe:  # conditional exchange: LPS keeps the lower part
                pass
            else:
                self.c += a
                a = qe
            if sw:
                st.mps[i] = 1 - mps
            st.idx[i] = nlps
        c = self.c
        ct = self.ct
        while True:
            a <<= 1
            c <<= 1
            ct -= 1
            if ct == 0:
                t = c >> 19
                if t > 0xFF:
                    self._carry()
                    t &= 0xFF
                self.raw.append(t)
                c &= 0x7FFFF
                ct = 8
            if a & 0x8000:
                break
        self.a = a
        self.c = c
        self.ct = ct

    def _carry(self) -> None:
        raw = self.raw
        j = len(raw) - 1
        while raw[j] == 0xFF:
            raw[j] = 0
            j -= 1
        raw[j] += 1

    def flush(self) -> bytes:
        # CLEARBITS: the in-interval code value with most trailing zeros
        t = (self.c + self.a - 1) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        c = self.c << self.ct
        for _ in range(2):
            t = c >> 19
            if t > 0xFF:
                self._carry()
                t &= 0xFF
            self.raw.append(t)
            c = (c & 0x7FFFF) << 8
        raw = self.raw
        while raw and raw[-1] == 0:
            raw.pop()
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0)
        return bytes(out)


# --- coefficient statistics models (T.81 §F.1.4 encode / §F.2.4 decode).
# Bin layout inside a DC area (64 bins): 5 conditioning contexts of 4
# bins each at 0/4/8/12/16 (zero-diff decision, sign, first magnitude
# per sign), the shared magnitude-category chain from bin 20, and the
# single mantissa bin 14 past wherever the chain ended.  An AC area
# (260 bins) keys 3 bins per coefficient index k (end-of-block, zero,
# first two category decisions), with the shared category chains at 189
# (k <= Kx) and 217.  AC signs and refinement bits use the fixed bin.


def _arith_dc_decode(dec, st, comp):
    """Decode one DC difference; ``comp`` carries the conditioning
    context + (L, U) thresholds (T.81 Figures F.19/F.23/F.24)."""
    c0 = comp["ctx"]
    if dec.decode(st, c0) == 0:
        comp["ctx"] = 0
        return 0
    sign = dec.decode(st, c0 + 1)
    stp = c0 + 2 + sign
    m = dec.decode(st, stp)
    if m:
        stp = 20
        while dec.decode(st, stp):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic DC magnitude overflow")
            stp += 1
    low, up = comp["cond"]
    if m < ((1 << low) >> 1):
        comp["ctx"] = 0
    elif m > ((1 << up) >> 1):
        comp["ctx"] = 12 + 4 * sign
    else:
        comp["ctx"] = 4 + 4 * sign
    v = m
    stp += 14
    mm = m >> 1
    while mm:
        if dec.decode(st, stp):
            v |= mm
        mm >>= 1
    v += 1
    return -v if sign else v


def _arith_dc_encode(enc, st, comp, diff):
    c0 = comp["ctx"]
    if diff == 0:
        enc.encode(st, c0, 0)
        comp["ctx"] = 0
        return
    enc.encode(st, c0, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, c0 + 1, sign)
    v = (-diff if sign else diff) - 1
    stp = c0 + 2 + sign
    m = 0
    if v:
        enc.encode(st, stp, 1)
        m = 1
        stp = 20
        v2 = v >> 1
        while v2:
            enc.encode(st, stp, 1)
            m <<= 1
            stp += 1
            v2 >>= 1
    enc.encode(st, stp, 0)
    low, up = comp["cond"]
    if m < ((1 << low) >> 1):
        comp["ctx"] = 0
    elif m > ((1 << up) >> 1):
        comp["ctx"] = 12 + 4 * sign
    else:
        comp["ctx"] = 4 + 4 * sign
    stp += 14
    mm = m >> 1
    while mm:
        enc.encode(st, stp, 1 if v & mm else 0)
        mm >>= 1


def _arith_ac_decode(dec, st, kx, fixed, blk, ss, se, al):
    """Decode one block's AC band into ``blk`` (T.81 Figures
    F.20–F.22; also the progressive AC-first model with ``al``)."""
    k = ss
    while k <= se:
        if dec.decode(st, 3 * (k - 1)):
            break  # end of block
        while dec.decode(st, 3 * (k - 1) + 1) == 0:
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        stp = 3 * (k - 1) + 2
        sign = dec.decode(fixed, 0)
        m = dec.decode(st, stp)
        if m:
            if dec.decode(st, stp):
                m = 2
                stp = 189 if k <= kx else 217
                while dec.decode(st, stp):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError("arithmetic AC magnitude overflow")
                    stp += 1
        v = m
        stp += 14
        mm = m >> 1
        while mm:
            if dec.decode(st, stp):
                v |= mm
            mm >>= 1
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _arith_ac_encode(enc, st, kx, fixed, blk, ss, se, al):
    ke = 0
    for k in range(se, ss - 1, -1):
        if abs(blk[k]) >> al:
            ke = k
            break
    k = ss
    while k <= ke:
        enc.encode(st, 3 * (k - 1), 0)  # not end-of-block yet
        while True:
            t = blk[k]
            v = (-t if t < 0 else t) >> al
            if v:
                break
            enc.encode(st, 3 * (k - 1) + 1, 0)
            k += 1
        enc.encode(st, 3 * (k - 1) + 1, 1)
        stp = 3 * (k - 1) + 2
        enc.encode(fixed, 0, 1 if t < 0 else 0)
        v -= 1
        m = 0
        if v:
            enc.encode(st, stp, 1)
            m = 1
            v2 = v >> 1
            if v2:
                enc.encode(st, stp, 1)
                m = 2
                stp = 189 if k <= kx else 217
                v2 >>= 1
                while v2:
                    enc.encode(st, stp, 1)
                    m <<= 1
                    stp += 1
                    v2 >>= 1
        enc.encode(st, stp, 0)
        stp += 14
        mm = m >> 1
        while mm:
            enc.encode(st, stp, 1 if v & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)  # end of block


def _arith_ac_refine_decode(dec, st, fixed, blk, ss, se, al):
    """Successive-approximation AC refinement (T.81 §G.2 under
    arithmetic coding: per-block end-of-block decisions past the
    previous stage's last nonzero index — no EOB runs)."""
    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        if k > kex and dec.decode(st, 3 * (k - 1)):
            break
        while True:
            c = blk[k]
            if c != 0:
                if dec.decode(st, 3 * (k - 1) + 2):
                    blk[k] = c + (m1 if c < 0 else p1)
                break
            if dec.decode(st, 3 * (k - 1) + 1):
                blk[k] = m1 if dec.decode(fixed, 0) else p1
                break
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refinement past band end")
        k += 1


def _arith_ac_refine_encode(enc, st, fixed, blk, ss, se, al):
    ah = al + 1
    ke = 0
    for k in range(se, ss - 1, -1):
        if abs(blk[k]) >> al:
            ke = k
            break
    kex = 0
    for k in range(ke, ss - 1, -1):
        if abs(blk[k]) >> ah:
            kex = k
            break
    k = ss
    while k <= ke:
        if k > kex:
            enc.encode(st, 3 * (k - 1), 0)
        while True:
            t = blk[k]
            v = (-t if t < 0 else t) >> al
            if v:
                if v >> 1:  # already nonzero at the previous stage
                    enc.encode(st, 3 * (k - 1) + 2, v & 1)
                else:  # newly significant
                    enc.encode(st, 3 * (k - 1) + 1, 1)
                    enc.encode(fixed, 0, 1 if t < 0 else 0)
                break
            enc.encode(st, 3 * (k - 1) + 1, 0)
            k += 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)


def _decode_scan_arith(data, pos, frame, scan, qt, dc_cond, ac_cond,
                       restart, prec=8):
    """Sequential (SOF9) scan decode — the arithmetic sibling of
    :func:`_decode_scan`, sharing its MCU walk and reconstruction."""
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    dc_stats: dict[int, _Stats] = {}
    ac_stats: dict[int, _Stats] = {}
    fixed = _fixed_stats()
    comp_info = []
    for cid, ch, cv, tq in comps:
        td, ta = next((d, a) for cs, d, a in scan if cs == cid)
        dc_stats.setdefault(td, _Stats(64))
        ac_stats.setdefault(ta, _Stats(260))
        zz = np.zeros((mcus_y * cv, mcus_x * ch, 64))
        comp_info.append(
            dict(ch=ch, cv=cv, q=qt[tq], dc=dc_stats[td], ac=ac_stats[ta],
                 kx=ac_cond.get(ta, _ARITH_AC_KX),
                 cond=dc_cond.get(td, _ARITH_DC_COND),
                 zz=zz, pred=0, ctx=0)
        )

    dec = _ArithDecoder(data, pos)
    rst = 0
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                p = _next_arith_marker(data, dec.bp)
                if p + 1 >= len(data) or data[p + 1] != 0xD0 + rst:
                    raise ValueError("lost arithmetic restart sync")
                dec = _ArithDecoder(data, p + 2)
                rst = (rst + 1) & 7
                for s in (*dc_stats.values(), *ac_stats.values()):
                    s.reset()
                for ci in comp_info:
                    ci["pred"] = 0
                    ci["ctx"] = 0
            for ci in comp_info:
                for by in range(ci["cv"]):
                    for bx in range(ci["ch"]):
                        blk = [0] * 64
                        ci["pred"] += _arith_dc_decode(dec, ci["dc"], ci)
                        blk[0] = ci["pred"]
                        _arith_ac_decode(
                            dec, ci["ac"], ci["kx"], fixed, blk, 1, 63, 0
                        )
                        ci["zz"][my * ci["cv"] + by, mx * ci["ch"] + bx] = blk
            mcu += 1

    return _finish_planes(
        w, h, hmax, vmax,
        [(ci["zz"], ci["q"], ci["ch"], ci["cv"]) for ci in comp_info],
        prec=prec,
    )


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
    arithmetic: bool = False,
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
        if arithmetic:
            raise ValueError(
                "arithmetic lossless (SOF11) fixtures are not supported"
            )
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
        if arithmetic:
            return _encode_progressive_arith(
                width, height, channels, factors, comp_blocks, qtab,
                precision=precision,
            )
        return _encode_progressive(
            width, height, channels, factors, comp_blocks, qtab,
            precision=precision,
        )
    if arithmetic:
        return _encode_sequential_arith(
            width, height, channels, factors, comp_blocks, qtab,
            precision, restart_interval,
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
# arithmetic encoders (SOF9/SOF10 twins over the same coefficients)
# ---------------------------------------------------------------------------


def _jpeg_headers_arith(sof_marker, width, height, channels, factors, qtab,
                        precision, n_tables):
    """Shared DQT + SOF + DAC prologue for the arithmetic twins; the
    DAC declares the default conditioning (L=0/U=1, Kx=5) explicitly,
    exercising the decoder's DAC parse."""
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
    seg(sof_marker, sof)
    dac = b""
    low, up = _ARITH_DC_COND
    for tid in range(n_tables):
        dac += bytes([tid, (up << 4) | low])
    for tid in range(n_tables):
        dac += bytes([0x10 | tid, _ARITH_AC_KX])
    seg(0xCC, dac)
    return out, seg


def _encode_sequential_arith(width, height, channels, factors, comp_blocks,
                             qtab, precision, restart_interval):
    """SOF9 twin: the same quantized coefficients as the Huffman
    encoding, entropy-coded with the T.81 QM-coder — so a decoder must
    produce BYTE-IDENTICAL pixels for both encodings of one image."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    n_tables = 1 if channels == 1 else 2

    out, seg = _jpeg_headers_arith(
        0xC9, width, height, channels, factors, qtab, precision, n_tables
    )
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for ci in range(channels):
        sel = 0 if ci == 0 else min(ci, n_tables - 1)
        sos += bytes([ci + 1, (sel << 4) | sel])
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    dc_stats = [_Stats(64) for _ in range(n_tables)]
    ac_stats = [_Stats(260) for _ in range(n_tables)]
    fixed = _fixed_stats()
    comp_states = [dict(ctx=0, cond=_ARITH_DC_COND) for _ in factors]
    preds = [0] * len(factors)
    enc = _ArithEncoder()
    rst = 0
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out.extend(enc.flush())
                out.extend(bytes([0xFF, 0xD0 + (rst & 7)]))
                rst += 1
                enc = _ArithEncoder()
                for s in dc_stats + ac_stats:
                    s.reset()
                preds = [0] * len(factors)
                for cstate in comp_states:
                    cstate["ctx"] = 0
            for ci, ((fh, fv), blocks) in enumerate(zip(factors, comp_blocks)):
                sel = 0 if ci == 0 else 1
                for by in range(fv):
                    for bx in range(fh):
                        blk = blocks[my * fv + by, mx * fh + bx]
                        zz = [int(blk[rr, cc]) for rr, cc in ZIGZAG]
                        diff = zz[0] - preds[ci]
                        preds[ci] = zz[0]
                        _arith_dc_encode(
                            enc, dc_stats[sel], comp_states[ci], diff
                        )
                        _arith_ac_encode(
                            enc, ac_stats[sel], _ARITH_AC_KX, fixed,
                            zz, 1, 63, 0,
                        )
            mcu += 1
    out.extend(enc.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)


def _encode_progressive_arith(width, height, channels, factors, comp_blocks,
                              qtab, precision=8):
    """SOF10 twin: the Huffman progressive five-phase scan script (DC
    first Al=1 → DC refine → AC bands → AC refine) re-entropy-coded
    arithmetically — statistics areas fresh per scan per T.81
    F.1.4.4.1.3."""
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    ncomp = len(factors)
    zzs, useds = [], []
    for (fh, fv), blocks in zip(factors, comp_blocks):
        zzs.append(blocks[:, :, _ZZ_R, _ZZ_C])
        comp_w = -(-(width * fh) // hmax)
        comp_h = -(-(height * fv) // vmax)
        useds.append((-(-comp_h // 8), -(-comp_w // 8)))

    n_tables = 1 if channels == 1 else 2
    out, seg = _jpeg_headers_arith(
        0xCA, width, height, channels, factors, qtab, precision, n_tables
    )

    scans = [dict(comps=None, ss=0, se=0, ah=0, al=1),
             dict(comps=None, ss=0, se=0, ah=1, al=0)]
    for ss, se in ((1, 20), (21, 63)):
        for ci in range(ncomp):
            scans.append(dict(comps=[ci], ss=ss, se=se, ah=0, al=1))
    for ci in range(ncomp):
        scans.append(dict(comps=[ci], ss=1, se=63, ah=1, al=0))

    for sc in scans:
        members = list(range(ncomp)) if sc["comps"] is None else sc["comps"]
        ss, se, ah, al = sc["ss"], sc["se"], sc["ah"], sc["al"]
        sos = bytes([len(members)])
        for ci in members:
            tid = 0 if ci == 0 else 1
            sel = (tid << 4) if ss == 0 else 0  # td | ta
            sos += bytes([ci + 1, sel])
        sos += bytes([ss, se, (ah << 4) | al])
        seg(0xDA, sos)

        enc = _ArithEncoder()
        fixed = _fixed_stats()
        if ss == 0:
            dc_stats = {0: _Stats(64)}
            if ncomp > 1:
                dc_stats[1] = _Stats(64)
            comp_states = [
                dict(ctx=0, cond=_ARITH_DC_COND) for _ in range(ncomp)
            ]
            preds = [0] * ncomp
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    for ci, (fh, fv) in enumerate(factors):
                        tid = 0 if ci == 0 else 1
                        for by in range(fv):
                            for bx in range(fh):
                                c = int(zzs[ci][my * fv + by, mx * fh + bx, 0])
                                if ah == 0:
                                    t = c >> al
                                    diff = t - preds[ci]
                                    preds[ci] = t
                                    _arith_dc_encode(
                                        enc, dc_stats[tid],
                                        comp_states[ci], diff,
                                    )
                                else:
                                    enc.encode(fixed, 0, (c >> al) & 1)
        else:
            ci = members[0]
            st = _Stats(260)
            bh, bw = useds[ci]
            for by in range(bh):
                for bx in range(bw):
                    blk = [int(zzs[ci][by, bx, k]) for k in range(64)]
                    if ah == 0:
                        _arith_ac_encode(
                            enc, st, _ARITH_AC_KX, fixed, blk, ss, se, al
                        )
                    else:
                        _arith_ac_refine_encode(
                            enc, st, fixed, blk, ss, se, al
                        )
        out.extend(enc.flush())

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
