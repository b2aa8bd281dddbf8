"""UNIX ``compress`` ``.Z`` codec — pure Python.

Beyond-reference: 1990s-era dumps carry ``.Z`` files (the pre-gzip
UNIX standard; tapes, FTP mirrors, old source archives).  The format
is LZW with LSB-first code packing: magic ``1F 9D``, a flags byte
(bits 0-4 max code width 9-16, bit 7 block mode with CLEAR code 256),
9-bit codes growing to ``maxbits`` — plus two infamous ncompress
bug-compatibility quirks, both derived empirically against the system
``gzip -d``/``uncompress`` and exercised by the tests: (1) codes pack
into groups of eight PER WIDTH PHASE, so a width change or CLEAR
rounds the bit cursor up relative to the phase start (a no-op between
ordinary width changes, load-bearing after CLEAR and at quirk 2); and
(2) with ``maxbits=9`` the width machinery still fires when the table
fills, so the frozen remainder of the stream uses 10-BIT codes.
"""

from __future__ import annotations

_MAGIC = b"\x1f\x9d"


def z_decompress(data: bytes) -> bytes:
    """Decompress a ``.Z`` stream."""
    if data[:2] != _MAGIC:
        raise ValueError("not a compress(1) .Z stream")
    if len(data) < 3:
        raise ValueError("truncated .Z stream")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if not 9 <= maxbits <= 16:
        raise ValueError(f".Z max code width {maxbits} out of range")

    body = memoryview(data)[3:]
    nbytes = len(body)
    out = bytearray()
    first_free = 257 if block_mode else 256
    table: list[bytes] = [bytes([i]) for i in range(256)]
    table += [b""] * (first_free - 256)
    n_bits = 9
    posbits = 0
    phase_start = 0  # codes group into 8-code blocks PER WIDTH PHASE
    prev: bytes | None = None

    def align():
        # ncompress writes whole n_bits-byte groups per phase; a width
        # change (or CLEAR) flushes the partial group, so the reader
        # rounds up RELATIVE TO THE PHASE START (with no CLEARs a phase
        # is exactly 2^(n-1) codes and the round-up is a no-op)
        nonlocal posbits, phase_start
        group = n_bits << 3
        rel = posbits - phase_start
        posbits = phase_start + ((rel + group - 1) // group) * group
        phase_start = posbits

    while True:
        if (posbits + n_bits) > nbytes << 3:
            break
        byte0 = posbits >> 3
        acc = int.from_bytes(body[byte0:byte0 + 3].tobytes(), "little")
        code = (acc >> (posbits & 7)) & ((1 << n_bits) - 1)
        posbits += n_bits
        if block_mode and code == 256:
            align()
            table = [bytes([i]) for i in range(256)] + [b""]
            n_bits = 9
            prev = None
            continue
        filled = False
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt .Z stream (bad first code)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << maxbits):
                table.append(prev + entry[:1])
                filled = len(table) == (1 << maxbits)
        elif code == len(table) and len(table) < (1 << maxbits):
            entry = prev + prev[:1]
            table.append(entry)
            filled = len(table) == (1 << maxbits)
        else:
            raise ValueError("corrupt .Z stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) == (1 << n_bits) and n_bits < maxbits:
            align()
            n_bits += 1
        elif filled and n_bits == maxbits == 9:
            # bug-compatible quirk: with maxbits=9 the width-change
            # machinery still fires at the fill (compress/gzip never
            # special-case the initial width), so the stream SWITCHES
            # TO 10-BIT CODES for the frozen remainder
            align()
            n_bits = 10
    return bytes(out)


def z_compress(data: bytes, *, maxbits: int = 16) -> bytes:
    """Compress to the ``.Z`` shape (block mode, like compress(1))."""
    if not 9 <= maxbits <= 16:
        raise ValueError("maxbits must be 9..16")
    out = bytearray(_MAGIC + bytes([0x80 | maxbits]))
    bitbuf = bytearray()
    posbits = 0
    phase_start = 0
    n_bits = 9

    def emit(code: int):
        nonlocal posbits
        byte0 = posbits >> 3
        while len(bitbuf) < byte0 + 3:
            bitbuf.append(0)
        acc = int.from_bytes(bitbuf[byte0:byte0 + 3], "little")
        acc |= code << (posbits & 7)
        bitbuf[byte0:byte0 + 3] = acc.to_bytes(3, "little")
        posbits += n_bits

    def align():
        # phase-relative group flush (see the decoder note); a no-op at
        # every width change when no CLEAR has been emitted
        nonlocal posbits, phase_start
        group = n_bits << 3
        rel = posbits - phase_start
        posbits = phase_start + ((rel + group - 1) // group) * group
        phase_start = posbits

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    nxt = 257  # 256 is CLEAR in block mode
    cur = b""
    pending_fill_align = False
    for b in data:
        cand = cur + bytes([b])
        if cand in table:
            cur = cand
            continue
        emit(table[cur])
        if pending_fill_align:
            align()
            n_bits = 10  # the maxbits=9 overshoot (see the decoder note)
            pending_fill_align = False
        if nxt < (1 << maxbits):
            table[cand] = nxt
            nxt += 1
            if nxt == (1 << maxbits) and maxbits == 9:
                # the frozen-at-initial-width flush (decoder note); the
                # decoder aligns one code later, hence the pending flag
                pending_fill_align = True
        cur = bytes([b])
        # the DECODER learns entries one code behind, widening (and
        # realigning — the ncompress group quirk) when ITS table hits
        # 1<<n_bits; with the lag, that is nxt == (1<<n_bits)+1 here —
        # validated against the system uncompress/gzip -d
        if n_bits < maxbits and nxt == (1 << n_bits) + 1:
            align()
            n_bits += 1
    if cur:
        emit(table[cur])  # a pending fill-align after this is moot
    nbytes = (posbits + 7) >> 3
    return bytes(out + bitbuf[:nbytes])
