"""Dependency-free baseline JPEG codec (grayscale, sequential DCT).

A real JPEG/JFIF implementation in pure Python + numpy — no Pillow, no
libjpeg: marker segment parsing, DQT/DHT table handling (arbitrary
canonical Huffman tables read from the stream, not assumed), entropy
decode with 0xFF byte-unstuffing, DPCM DC + run-length AC, dequantize,
dezigzag, and a vectorized 8x8 type-III IDCT over every block at once.
The encoder writes spec-compliant baseline files (SOI/DQT/SOF0/DHT/SOS/
EOI) using compact canonical Huffman tables declared in the DHT segment
(JPEG permits any decodable table; ours are fixed-length canonical codes
— 4-bit DC, 8-bit AC — which keeps the table builder trivial while
remaining fully standard).

Scope (documented, enforced by explicit raises): baseline sequential
(SOF0), single component (grayscale), no restart markers. Color and
progressive scans remain out of scope — the point is a REAL entropy-coded
lossy codec driving the multimodal operators end-to-end, not a Pillow
replacement.

Exactness contract used by the gated query (`multimodal_jpeg_features`):
for images made of flat 8x8 blocks whose gray value is even, the forward
DCT has a single nonzero coefficient DC = 8*(v-128), which the uniform
quant step 16 divides exactly — so encode→decode round-trips bit-exact
and an engine-independent oracle can recompute the decoded pixels from
the generator parameters alone. General images round-trip within normal
lossy tolerance (see tests).

Reference parity: the reference repo has no codecs at all (multimodal is
beyond-reference surface); the format itself is ITU-T T.81 (public).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# tables


def _zigzag_order() -> list[int]:
    """Natural (row-major) index for each zigzag position, per T.81."""
    order: list[int] = []
    for s in range(15):
        diag = [(r, s - r) for r in range(8) if 0 <= s - r < 8]
        if s % 2 == 0:  # even diagonals run bottom-left -> top-right
            diag = diag[::-1]
        order.extend(r * 8 + c for r, c in diag)
    return order


ZIGZAG = _zigzag_order()  # zigzag position -> natural position
_UNZIGZAG = np.argsort(np.array(ZIGZAG))  # natural -> zigzag position


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    u = np.arange(8).reshape(-1, 1)
    d = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    d[0, :] *= 1 / np.sqrt(2)
    return d


_DCT = _dct_matrix()

# Canonical fixed-length Huffman tables the ENCODER declares via DHT.
# DC: 12 category symbols (0..11), all 4-bit codes 0..11 (code 15 unused,
# so the all-ones code never appears — T.81-friendly).  AC: the 162
# standard (run,size) symbols, all 8-bit codes 0..161 (0xFF unused).
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_CODE = {sym: (4, i) for i, sym in enumerate(_DC_SYMBOLS)}
_AC_CODE = {sym: (8, i) for i, sym in enumerate(_AC_SYMBOLS)}


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, nbits: int, value: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self._out.append(b)
            if b == 0xFF:  # byte stuffing
                self._out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write(pad, (1 << pad) - 1)  # pad with 1-bits per T.81
        return bytes(self._out)


class _BitReader:
    """Reads the entropy-coded segment with 0xFF00 unstuffing; stops at
    any other marker (the caller handles EOI)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self._data = data
        self._pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            d, p = self._data, self._pos
            if p >= len(d):
                raise ValueError("truncated JPEG scan data")
            b = d[p]
            p += 1
            if b == 0xFF:
                if p < len(d) and d[p] == 0x00:
                    p += 1  # stuffed 0xFF data byte
                else:
                    raise ValueError("unexpected marker inside scan data")
            self._pos = p
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_pos(self) -> int:
        return self._pos


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a `size`-bit magnitude code to its
    signed coefficient value."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _size_of(value: int) -> int:
    return int(value).bit_length() if value >= 0 else int(-value).bit_length()


# ---------------------------------------------------------------------------
# encoder


def encode_jpeg(width: int, height: int, pixels: bytes, q: int = 16) -> bytes:
    """Baseline JPEG bytes for a grayscale image (``pixels`` = w*h bytes,
    row-major). Uniform quantization step ``q``; edges pad to 8-multiples
    by replication (decoder crops back)."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} gray bytes, got {len(pixels)}")
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width)
    bh, bw = -(-height // 8) * 8, -(-width // 8) * 8
    padded = np.empty((bh, bw), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:height, width:] = img[:, -1:]
    padded[height:, width:] = img[-1, -1]
    padded -= 128.0

    # all-blocks forward DCT in one einsum, then quantize
    nby, nbx = bh // 8, bw // 8
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,bcxy,vy->bcuv", _DCT, blocks, _DCT)
    quant = np.rint(coefs / q).astype(np.int64).reshape(nby * nbx, 64)
    zz = quant[:, ZIGZAG]

    w = _BitWriter()
    prev_dc = 0
    for blk in zz:
        diff = int(blk[0]) - prev_dc
        prev_dc = int(blk[0])
        size = _size_of(diff)
        nbits, code = _DC_CODE[size]
        w.write(nbits, code)
        if size:
            w.write(size, diff if diff > 0 else diff + (1 << size) - 1)
        run = 0
        last_nz = int(np.nonzero(blk[1:])[0][-1]) + 1 if np.any(blk[1:]) else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                nbits, code = _AC_CODE[0xF0]
                w.write(nbits, code)
                run -= 16
            size = _size_of(v)
            nbits, code = _AC_CODE[(run << 4) | size]
            w.write(nbits, code)
            w.write(size, v if v > 0 else v + (1 << size) - 1)
            run = 0
        if last_nz < 63:
            nbits, code = _AC_CODE[0x00]
            w.write(nbits, code)
    scan = w.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qtab = np.full(64, q, dtype=np.uint8)
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + qtab.tobytes())  # DQT, 8-bit, table 0
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )  # SOF0: precision 8, 1 component, no subsampling, qtable 0
    dc_counts = [0] * 16
    dc_counts[3] = len(_DC_SYMBOLS)  # all 4-bit
    ac_counts = [0] * 16
    ac_counts[7] = len(_AC_SYMBOLS)  # all 8-bit
    out += seg(
        0xFFC4,
        b"\x00" + bytes(dc_counts) + bytes(_DC_SYMBOLS)
        + b"\x10" + bytes(ac_counts) + bytes(_AC_SYMBOLS),
    )
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder


def _build_huffman(counts: list[int], symbols: list[int]) -> dict:
    """Canonical code table per T.81 C.2: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    it = iter(symbols)
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = next(it)
            code += 1
        code <<= 1
    return table


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode baseline grayscale JPEG -> (width, height, channels=1,
    pixels). Reads DQT/DHT tables from the stream (any canonical tables,
    not just this encoder's); raises on progressive/multi-component/
    restart-interval streams (documented scope)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    width = height = -1
    comp_q = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data")
        length = struct.unpack_from(">H", payload, pos)[0]
        body = payload[pos + 2 : pos + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qtables[tq] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 15
                counts = list(body[i + 1 : i + 17])
                n = sum(counts)
                syms = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_huffman(counts, syms)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            _, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) JPEG supported")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported for grayscale")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("only baseline sequential (SOF0) supported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            dc_tab = htables[(0, body[2] >> 4)]
            ac_tab = htables[(1, body[2] & 15)]
            qt = qtables[comp_q]
            pos += length
            return _decode_scan(payload, pos, width, height, dc_tab, ac_tab, qt)
        # APPn / COM / others: skip
        pos += length
    raise ValueError("no SOS marker found")


def _read_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan data")


def _decode_scan(
    payload: bytes,
    pos: int,
    width: int,
    height: int,
    dc_tab: dict,
    ac_tab: dict,
    qt: np.ndarray,
) -> tuple[int, int, int, bytes]:
    nbx, nby = -(-width // 8), -(-height // 8)
    nblocks = nbx * nby
    zz = np.zeros((nblocks, 64), dtype=np.int64)
    r = _BitReader(payload, pos)
    dc = 0
    for b in range(nblocks):
        size = _read_symbol(r, dc_tab)
        dc += _extend(r.read_bits(size), size)
        zz[b, 0] = dc
        k = 1
        while k < 64:
            sym = _read_symbol(r, ac_tab)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            k += sym >> 4
            size = sym & 15
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[b, k] = _extend(r.read_bits(size), size)
            k += 1

    # dequantize (in zigzag order), dezigzag, batch IDCT
    coefs = (zz * qt)[:, _UNZIGZAG].reshape(nblocks, 8, 8).astype(np.float64)
    spatial = np.einsum("xu,buv,yv->bxy", _DCT.T, coefs, _DCT.T)
    out = np.clip(np.rint(spatial) + 128, 0, 255).astype(np.uint8)
    img = (
        out.reshape(nby, nbx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(nby * 8, nbx * 8)[:height, :width]
    )
    return width, height, 1, img.tobytes()


def decode_jpeg_dims(payload: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF0 header only — no entropy
    decode (metadata-only scans stay cheap)."""
    pos = 2
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    while pos < len(payload) - 1:
        if payload[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:
            break
        length = struct.unpack_from(">H", payload, pos)[0]
        if marker == 0xC0:
            _, h, w, ncomp = struct.unpack_from(">BHHB", payload, pos + 2)
            return w, h, ncomp
        pos += length
    raise ValueError("no SOF0 marker found")
