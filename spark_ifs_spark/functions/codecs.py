"""Dependency-free codecs for the multimodal operators.

Pure-Python (stdlib ``struct`` + bytes) implementations of the simplest
real formats in each modality, so the multimodal path decodes REAL bytes
end-to-end in a container with no image/audio libraries:

- images: PPM (P6 binary) and BMP (BITMAPINFOHEADER, uncompressed
  8/24/32-bit) — header parse + raw pixel access;
- audio: WAV (RIFF) with PCM or IEEE-float sample data — fmt/data chunk
  walk;
- encoders for each, so tests can synthesize genuine files and
  round-trip them.

PNG (stdlib-zlib inflate + filter reversal) lives here too; baseline
JPEG (DCT + Huffman entropy coding) lives in the sibling
``functions.jpeg`` module. Formats that need licensed/psychoacoustic
codecs (MP3/...) stay behind the ``NotImplementedError`` injection
points in ``operators.multimodal`` — these codecs make real
interchange formats decodable end-to-end, not a substitute for
Pillow/ffmpeg.

Everything here is per-payload Python and is only ever called inside the
Arrow-batched ``mapInPandas`` operators — the engine's plan shape
(payloads never shuffle, one decode per payload per pass) is unchanged.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------------------
# PPM (P6)


def encode_ppm(width: int, height: int, pixels: bytes) -> bytes:
    """P6 PPM bytes from raw interleaved RGB ``pixels`` (len = w*h*3)."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def _ppm_header(payload: bytes) -> tuple[int, int, int, int]:
    """Parse a P6 header → (width, height, maxval, pixel_offset).

    PPM allows arbitrary whitespace and ``#`` comments between header
    tokens; exactly one whitespace byte separates the maxval from the
    pixel data."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":  # comment to EOL
            while i < len(payload) and payload[i] not in (0x0A, 0x0D):
                i += 1
            continue
        start = i
        while i < len(payload) and not payload[i : i + 1].isspace():
            i += 1
        if start == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[start:i]))
    return tokens[0], tokens[1], tokens[2], i + 1  # +1: single ws after maxval


def decode_ppm(payload: bytes) -> tuple[int, int, int, bytes]:
    """P6 PPM → (width, height, channels=3, raw RGB bytes)."""
    w, h, maxval, off = _ppm_header(payload)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    pixels = payload[off : off + need]
    if len(pixels) != need:
        raise ValueError(f"PPM pixel data truncated: {len(pixels)} < {need}")
    return w, h, 3, pixels


def resize_ppm(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resample of a P6 PPM to ``width × height`` —
    a real resize (decode → resample → re-encode), vectorized so a
    megapixel payload costs numpy fancy-indexing, not a Python loop."""
    import numpy as np

    w, h, _, px = decode_ppm(payload)
    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    ys = np.minimum(np.arange(height) * h // height, h - 1)
    xs = np.minimum(np.arange(width) * w // width, w - 1)
    out = img[ys][:, xs]
    return encode_ppm(width, height, out.tobytes())


# ---------------------------------------------------------------------------
# BMP (BITMAPINFOHEADER, uncompressed)


def encode_bmp(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit uncompressed BMP from raw interleaved RGB ``pixels``
    (len = w*h*3, top-down row order as callers naturally produce it;
    stored bottom-up per the format)."""
    if len(pixels) != width * height * 3:
        raise ValueError(f"need {width * height * 3} RGB bytes, got {len(pixels)}")
    row_size = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row_size * height
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    import numpy as np

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    bgr = img[::-1, :, ::-1]  # bottom-up rows, BGR channel order on disk
    body = np.zeros((height, row_size), dtype=np.uint8)
    body[:, : width * 3] = bgr.reshape(height, width * 3)
    return header + info + body.tobytes()


def decode_bmp_dims(payload: bytes) -> tuple[int, int, int]:
    """BMP header → (width, height, channels). Supports the ubiquitous
    BITMAPINFOHEADER(-or-later) uncompressed 8/24/32-bit forms."""
    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP payload")
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) not supported")
    if bpp not in (8, 24, 32):
        raise ValueError(f"{bpp}-bit BMP not supported")
    return width, abs(height), bpp // 8


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM / IEEE float)


def encode_wav(
    samples: bytes, sample_rate: int, channels: int = 1, bits: int = 16
) -> bytes:
    """RIFF/WAVE bytes from raw little-endian PCM ``samples``."""
    block = channels * bits // 8
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate,
        sample_rate * block, block, bits,
    )
    data = struct.pack("<4sI", b"data", len(samples)) + samples
    body = b"WAVE" + fmt + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav(payload: bytes) -> tuple[int, int]:
    """RIFF/WAVE → (n_samples per channel, sample_rate). Walks the chunk
    list (fmt/data can be preceded by LIST/fact/etc.), accepts PCM (1)
    and IEEE-float (3) sample formats."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    block_align = sample_rate = None
    data_size = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", payload, pos + 8)
            block_align = struct.unpack_from("<H", payload, pos + 20)[0]
            if audio_fmt not in (1, 3, 7):  # PCM / IEEE float / G.711 mu-law
                raise ValueError(f"compressed WAV (format {audio_fmt}) not supported")
        elif cid == b"data":
            data_size = min(size, n - pos - 8)
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if block_align is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    return data_size // max(block_align, 1), int(sample_rate)


# ---------------------------------------------------------------------------
# G.711 mu-law (8-bit companded telephony audio, ITU-T G.711).
# A REAL lossy audio codec: logarithmic companding of 16-bit PCM to one
# byte per sample. encode(decode(b)) == b for every byte except the two
# encodings of zero (0x7F/0xFF), so byte streams drawn from the decode
# codomain round-trip bit-exact — the same oracle-exactness trick the
# JPEG gate uses with flat blocks.

_MULAW_BIAS = 0x84
_MULAW_CLIP = 32635


def mulaw_decode_byte(b: int) -> int:
    """One mu-law byte -> signed 16-bit PCM value (G.711 expand)."""
    u = ~b & 0xFF
    t = (((u & 0x0F) << 3) + _MULAW_BIAS) << ((u & 0x70) >> 4)
    return (_MULAW_BIAS - t) if (u & 0x80) else (t - _MULAW_BIAS)


def mulaw_encode_value(v: int) -> int:
    """Signed 16-bit PCM value -> mu-law byte (G.711 compress)."""
    sign = 0x80 if v < 0 else 0
    if v < 0:
        v = -v
    if v > _MULAW_CLIP:
        v = _MULAW_CLIP
    v += _MULAW_BIAS
    exp = 7
    mask = 0x4000
    while exp > 0 and not (v & mask):
        exp -= 1
        mask >>= 1
    mant = (v >> (exp + 3)) & 0x0F
    return ~(sign | (exp << 4) | mant) & 0xFF


def encode_wav_mulaw(mulaw_bytes: bytes, sample_rate: int = 8000) -> bytes:
    """RIFF/WAVE with format tag 7 (mu-law), one byte per sample, plus
    the `fact` chunk WAV requires for compressed formats."""
    fmt = struct.pack(
        "<4sIHHIIHHH", b"fmt ", 18, 7, 1, sample_rate, sample_rate, 1, 8, 0
    )
    fact = struct.pack("<4sII", b"fact", 4, len(mulaw_bytes))
    data = struct.pack("<4sI", b"data", len(mulaw_bytes)) + mulaw_bytes
    if len(mulaw_bytes) & 1:
        data += b"\x00"  # RIFF chunks pad to even length
    body = b"WAVE" + fmt + fact + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def decode_wav_samples(payload: bytes) -> tuple[int, list[int]]:
    """RIFF/WAVE -> (sample_rate, PCM16 sample values). Handles format 1
    (16-bit PCM little-endian) and format 7 (G.711 mu-law, expanded);
    other formats raise. Content-level counterpart to the metadata-only
    ``decode_wav``."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    audio_fmt = sample_rate = bits = None
    data = None
    while pos + 8 <= n:
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, pos + 8
            )
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if channels != 1:
                raise ValueError("decode_wav_samples supports mono only")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    if audio_fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    if audio_fmt == 1 and bits == 16:
        vals = list(struct.unpack("<%dh" % (len(data) // 2), data[: len(data) // 2 * 2]))
    elif audio_fmt == 7 and bits == 8:
        vals = [mulaw_decode_byte(b) for b in data]
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}-bit")
    return int(sample_rate), vals


# ---------------------------------------------------------------------------
# PNG (stdlib zlib: IDAT inflate + per-scanline filter reversal).
# Written from the public PNG specification (RFC 2083 / ISO 15948):
# 8-byte signature, chunked layout with CRC32, IHDR geometry, zlib-
# compressed filtered scanlines. Supports bit depth 8, color types
# 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), and all
# five scanline filters; interlaced images and other bit depths raise.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(payload: bytes):
    """Yield (type, data) over a PNG byte stream, verifying CRCs."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r}: CRC mismatch")
        yield ctype, data
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("truncated PNG (no IEND)")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytes]:
    """PNG → ``(width, height, channels, pixels)`` with ``pixels`` raw
    interleaved rows (palette images are expanded to RGB)."""
    import zlib

    width = height = None
    color_type = bit_depth = interlace = 0
    idat = bytearray()
    plte = b""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            plte = data
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG is not supported")
    if bit_depth != 8:
        raise ValueError(f"only bit depth 8 supported, got {bit_depth}")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type}")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        base = y * (stride + 1)
        ftype = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                up_left = prev[i - nch] if i >= nch else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color_type == 3:  # expand palette indices to RGB
        if not plte:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            rgb[i * 3 : i * 3 + 3] = plte[idx * 3 : idx * 3 + 3]
        return (width, height, 3, bytes(rgb))
    return (width, height, nch, bytes(out))


def decode_png_dims(payload: bytes) -> tuple[int, int, int]:
    """Header-only PNG probe → ``(width, height, channels)`` without
    inflating pixel data (the feature-extraction fast path)."""
    for ctype, data in _png_chunks(payload):
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _c, _f, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            nch = 3 if color_type == 3 else _PNG_CHANNELS[color_type]
            return (width, height, nch)
    raise ValueError("PNG missing IHDR")


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Raw interleaved ``pixels`` → PNG bytes (filter 0, one zlib
    stream); channel count selects the PNG color type."""
    import zlib

    ctypes = {1: 0, 2: 4, 3: 2, 4: 6}
    if channels not in ctypes:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"need {width * height * channels} bytes, got {len(pixels)}"
        )
    stride = width * channels
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctypes[channels], 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_png(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor PNG resize: decode → resample → re-encode."""
    w0, h0, nch, pixels = decode_png(payload)
    out = bytearray(width * height * nch)
    for y in range(height):
        sy = min(y * h0 // height, h0 - 1)
        for x in range(width):
            sx = min(x * w0 // width, w0 - 1)
            src = (sy * w0 + sx) * nch
            dst = (y * width + x) * nch
            out[dst : dst + nch] = pixels[src : src + nch]
    return encode_png(width, height, bytes(out), nch)
