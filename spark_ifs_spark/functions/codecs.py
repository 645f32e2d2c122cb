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

Formats that genuinely need an entropy decoder (JPEG/PNG/MP3/...) stay
behind the ``NotImplementedError`` injection points in
``operators.multimodal`` — these codecs make the common
uncompressed-interchange cases real, not a substitute for Pillow.

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
            if audio_fmt not in (1, 3):  # PCM / IEEE float
                raise ValueError(f"compressed WAV (format {audio_fmt}) not supported")
        elif cid == b"data":
            data_size = min(size, n - pos - 8)
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if block_align is None or data_size is None:
        raise ValueError("WAV missing fmt or data chunk")
    return data_size // max(block_align, 1), int(sample_rate)
