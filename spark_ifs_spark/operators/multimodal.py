"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; transforms run as Arrow-batched ``mapInPandas`` passes.
The Spark-side plumbing (schema, batch iteration, partition sizing) is
real and tested, and so are the codecs: PPM/BMP/PNG/baseline-JPEG image
decode, nearest-neighbor PPM/PNG resize, and WAV (PCM/IEEE-float) audio
probing run on REAL bytes via the dependency-free ``functions.codecs``
and ``functions.jpeg``. Formats that need licensed/psychoacoustic
decoders (MP3/MP4 demux) stay behind the ``decode_fn``/``resize_fn``/
``split_fn`` injection points — the default raises
``NotImplementedError`` naming the library to inject; deterministic
fakes remain for oracle tests.

Scale notes: binary payloads dominate row size, so operators here
(a) never shuffle payloads (all transforms are map-side ``mapInPandas``),
(b) expose ``target_partition_mb`` to re-split scans so one Arrow batch
of payload rows fits executor memory.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: schema of a decoded-image feature row
IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("channels", IntegerType(), True),
        StructField("feature_hash", StringType(), True),
    ]
)


def default_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Decode a real image payload → (width, height, channels).

    PPM (P6), uncompressed BMP, PNG (stdlib-zlib inflate + filter
    reversal), and baseline grayscale JPEG (``functions.jpeg`` — DHT
    Huffman decode) decode for real via dependency-free codecs; other
    formats raise ``NotImplementedError`` naming the library to inject.
    """
    from spark_ifs_spark.functions import codecs, jpeg

    if payload[:2] == b"P6":
        w, h, c, _ = codecs.decode_ppm(payload)
        return (w, h, c)
    if payload[:2] == b"BM":
        return codecs.decode_bmp_dims(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return codecs.decode_png_dims(payload)
    if payload[:2] == b"\xff\xd8":
        return jpeg.decode_jpeg_dims(payload)
    raise NotImplementedError(
        "only PPM/BMP/PNG/baseline-JPEG decode without an image library; "
        "inject decode_fn= with a real decoder (e.g. Pillow) otherwise."
    )


def fake_image_decoder(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder for tests: derives a (w, h, c) from the
    payload bytes so plumbing is exercised end-to-end without codecs."""
    if not payload:
        return (0, 0, 0)
    w = 1 + payload[0] % 64
    h = 1 + payload[-1] % 64
    return (w, h, 3)


def extract_image_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decode_fn: Callable[[bytes], tuple[int, int, int]] = default_image_decoder,
    batch_size: int = 256,
) -> DataFrame:
    """binary payloads → ``IMAGE_FEATURES_SCHEMA`` rows via ``mapInPandas``.

    One Arrow batch in, one out; payloads never leave their partition.
    """
    import hashlib

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size]
                # column-level access, not iterrows: the only per-row
                # Python is the (inherently per-payload) codec call
                payloads = [
                    bytes(p) if p is not None else b""
                    for p in chunk[payload_col].tolist()
                ]
                dims = [decode_fn(p) for p in payloads]
                yield pd.DataFrame(
                    {
                        "id": chunk[id_col].astype(str).to_numpy(),
                        "width": [d[0] for d in dims],
                        "height": [d[1] for d in dims],
                        "channels": [d[2] for d in dims],
                        "feature_hash": [hashlib.md5(p).hexdigest() for p in payloads],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(_proc, IMAGE_FEATURES_SCHEMA)


#: schema of a resized-image row (payload rides through)
RESIZED_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
    ]
)

#: schema of a sampled-frame row (one row per frame)
FRAME_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("payload", BinaryType(), True),
    ]
)


def fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize for tests: truncates/pads the payload to
    ``width × height`` bytes (real implementation: decode, resample,
    re-encode)."""
    target = max(width * height, 1)
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """binary payloads → resized payloads (``RESIZED_SCHEMA``), one
    Arrow-batched map-side pass; payloads never shuffle.

    ``resize_fn`` is the codec injection point; the default resamples
    PPM payloads for real (nearest-neighbor, ``functions.codecs``) and
    raises for formats that need an image library."""
    if resize_fn is None:
        def resize_fn(payload: bytes, w: int, h: int) -> bytes:
            from spark_ifs_spark.functions import codecs

            if payload[:2] == b"P6":
                return codecs.resize_ppm(payload, w, h)
            if payload[:8] == b"\x89PNG\r\n\x1a\n":
                return codecs.resize_png(payload, w, h)
            raise NotImplementedError(
                "only PPM/PNG resize without an image library; inject "
                "resize_fn= with a real resizer (e.g. Pillow) otherwise"
            )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf[payload_col].tolist()
            ]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str).to_numpy(),
                    "payload": [resize_fn(p, width, height) for p in payloads],
                    "width": width,
                    "height": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_proc, RESIZED_SCHEMA)


def fake_frame_splitter(payload: bytes, num_frames: int) -> list[bytes]:
    """Deterministic fake video→frames splitter for tests: slices the
    payload into ``num_frames`` contiguous chunks (real implementation:
    container demux + per-frame decode)."""
    if not payload:
        return [b""] * num_frames
    step = max(len(payload) // num_frames, 1)
    return [payload[i * step : (i + 1) * step] for i in range(num_frames)]


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    num_frames: int = 4,
    split_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """video payloads → one row per sampled frame (``FRAME_SCHEMA``).

    The 1→N row expansion happens INSIDE ``mapInPandas`` (no
    array-of-binaries intermediate, no explode shuffle): frame payloads
    are emitted directly into the output Arrow batches. ``split_fn`` is
    the codec injection point (STUB; the default raises)."""
    if split_fn is None:
        def split_fn(payload: bytes, n: int) -> list[bytes]:
            raise NotImplementedError(
                "frame sampling requires a video library (e.g. PyAV); "
                "inject split_fn= with a real demuxer in production"
            )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype(str).tolist()
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf[payload_col].tolist()
            ]
            frame_lists = [split_fn(p, num_frames) for p in payloads]
            yield pd.DataFrame(
                {
                    "id": [i for i, fl in zip(ids, frame_lists) for _ in fl],
                    "frame_idx": [j for fl in frame_lists for j in range(len(fl))],
                    "payload": [f for fl in frame_lists for f in fl],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_proc, FRAME_SCHEMA)


#: schema of an audio feature row
AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("n_samples", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)


def fake_audio_decoder(payload: bytes) -> tuple[int, int]:
    """Deterministic fake audio probe for tests: (n_samples, sample_rate)
    derived from the payload bytes."""
    if not payload:
        return (0, 16000)
    return (len(payload) * 4, 16000)


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    decode_fn: Callable[[bytes], tuple[int, int]] | None = None,
) -> DataFrame:
    """audio payloads → ``AUDIO_FEATURES_SCHEMA`` rows, Arrow-batched
    map-side pass. ``decode_fn`` is the codec injection point; the
    default probes RIFF/WAVE (PCM + IEEE-float) for real via the
    dependency-free ``functions.codecs`` and raises for compressed
    formats that need an audio library."""
    if decode_fn is None:
        def decode_fn(payload: bytes) -> tuple[int, int]:
            from spark_ifs_spark.functions import codecs

            if payload[:4] == b"RIFF":
                return codecs.decode_wav(payload)
            raise NotImplementedError(
                "only WAV decodes without an audio library; inject "
                "decode_fn= with a real decoder (e.g. soundfile) otherwise"
            )

    import numpy as np

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf[payload_col].tolist()
            ]
            probes = [decode_fn(p) for p in payloads]
            n = np.array([p[0] for p in probes], dtype=np.int64)
            sr = np.array([p[1] for p in probes], dtype=np.int64)
            dur = np.where(sr > 0, n * 1000 // np.where(sr > 0, sr, 1), 0)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype(str).to_numpy(),
                    "n_samples": n.astype("int32"),
                    "sample_rate": sr.astype("int32"),
                    "duration_ms": dur.astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_proc, AUDIO_FEATURES_SCHEMA)


def attach_fake_payloads(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Test/dev helper: synthesize a deterministic binary payload column
    (+ metadata struct) from a text column, so multimodal plumbing can be
    exercised on the ``documents`` table."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(F.col(text_col)).alias("n_bytes"),
        ).alias("meta"),
    )


def attach_png_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """``(id, payload)`` with REAL PNG payloads (zlib deflate, filter-0
    scanlines) synthesized deterministically from the id: width =
    ``1 + id % 8``, height = ``1 + (id // 8) % 8``, 3 channels, pixel
    ``k`` = ``(id*7 + k*13) % 256`` row-major. The generator parameters
    are the contract an engine-independent oracle can recompute (the
    pixels are a pure function of the id), while the payload itself
    round-trips the real encoder — so a downstream ``decode_png`` is
    exercised end-to-end, not faked. ``mapInPandas``; payloads are
    born in-partition and never shuffle."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                w, h = 1 + i % 8, 1 + (i // 8) % 8
                n = w * h * 3
                px = ((i * 7 + 13 * np.arange(n, dtype=np.int64)) % 256).astype(
                    np.uint8
                )
                payloads.append(codecs.encode_png(w, h, px.tobytes()))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        _gen, "id long, payload binary"
    )


def attach_jpeg_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """``(id, payload)`` with REAL baseline-JPEG payloads (entropy-coded:
    DCT + quantize + Huffman) synthesized deterministically from the id:
    width = ``8*(1 + id % 4)``, height = ``8*(1 + (id//4) % 4)``,
    grayscale, and each 8x8 block ``b`` (row-major) is flat at gray value
    ``2*((id*11 + b*17) % 128)``. Even flat-block values quantize EXACTLY
    under the codec's uniform step 16 (DC = 8*(v-128) is a multiple of
    16), so the lossy pipeline round-trips bit-exact and an
    engine-independent oracle recomputes the decoded pixels from the id
    alone — while the payload still exercises real Huffman/DCT coding.
    ``mapInPandas``; payloads are born in-partition and never shuffle."""
    import numpy as np

    from spark_ifs_spark.functions import jpeg

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                nbx, nby = 1 + i % 4, 1 + (i // 4) % 4
                b = np.arange(nby * nbx, dtype=np.int64).reshape(nby, nbx)
                vals = 2 * ((i * 11 + b * 17) % 128)
                img = np.kron(vals, np.ones((8, 8), dtype=np.int64)).astype(
                    np.uint8
                )
                payloads.append(jpeg.encode_jpeg(8 * nbx, 8 * nby, img.tobytes()))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        _gen, "id long, payload binary"
    )


def extract_jpeg_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """``(id, width, height, channels, pixel_sum)`` via the REAL baseline
    JPEG decoder (``functions.jpeg.decode_jpeg``: marker parse, DHT-driven
    Huffman entropy decode, dequantize, batch IDCT) — ``pixel_sum`` is the
    exact integer sum of every decoded pixel, so a content-level decode
    error (wrong coefficients, wrong IDCT, wrong DPCM chain) breaks the
    hash gate, not just a header slip. ``mapInPandas``, Arrow batches."""
    import numpy as np

    from spark_ifs_spark.functions import jpeg

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_c, out_s = [], [], [], []
            for p in pdf[payload_col].tolist():
                w, h, c, px = jpeg.decode_jpeg(bytes(p))
                out_w.append(w)
                out_h.append(h)
                out_c.append(c)
                out_s.append(int(np.frombuffer(px, dtype=np.uint8).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "width": np.array(out_w, dtype=np.int32),
                    "height": np.array(out_h, dtype=np.int32),
                    "channels": np.array(out_c, dtype=np.int32),
                    "pixel_sum": np.array(out_s, dtype=np.int64),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _proc, "id long, width int, height int, channels int, pixel_sum long"
    )


def extract_png_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """``(id, width, height, channels, pixel_sum)`` via the REAL PNG
    decoder (``codecs.decode_png``: stdlib-zlib inflate + full filter
    reversal incl. Paeth) — ``pixel_sum`` is the exact integer sum of
    every decoded channel byte, so a content-level (not just
    header-level) decode error breaks the hash gate. ``mapInPandas``,
    Arrow batches; the only per-row Python is the per-payload codec
    call itself."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_w, out_h, out_c, out_s = [], [], [], []
            for p in pdf[payload_col].tolist():
                w, h, c, px = codecs.decode_png(bytes(p))
                out_w.append(w)
                out_h.append(h)
                out_c.append(c)
                out_s.append(int(np.frombuffer(px, dtype=np.uint8).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "width": np.array(out_w, dtype=np.int32),
                    "height": np.array(out_h, dtype=np.int32),
                    "channels": np.array(out_c, dtype=np.int32),
                    "pixel_sum": np.array(out_s, dtype=np.int64),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _proc, "id long, width int, height int, channels int, pixel_sum long"
    )


def attach_mulaw_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """``(id, payload)`` with REAL G.711 mu-law WAV payloads (format
    tag 7, fact chunk) synthesized deterministically from the id:
    ``64 + id % 64`` samples at 8 kHz, mu-law byte ``k`` =
    ``(id*31 + k*7) % 256``. The decoded PCM values are a pure integer
    function of the id (G.711 expansion is closed-form arithmetic), so
    an engine-independent oracle recomputes them — while the payload
    exercises the real compressed-WAV container + companding decode.
    ``mapInPandas``; payloads never shuffle."""
    from spark_ifs_spark.functions import codecs

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                n = 64 + i % 64
                mu = bytes((i * 31 + k * 7) % 256 for k in range(n))
                payloads.append(codecs.encode_wav_mulaw(mu, 8000))
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        _gen, "id long, payload binary"
    )


def extract_mulaw_features(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """``(id, n_samples, sample_rate, duration_ms, sample_sum)`` via the
    REAL compressed-WAV decode path (``codecs.decode_wav_samples``: RIFF
    chunk walk + G.711 mu-law expansion) — ``sample_sum`` is the exact
    integer sum of the decoded PCM16 values, so a companding-table or
    sign error breaks the hash gate, not just a header slip.
    ``mapInPandas``, Arrow batches."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_n, out_sr, out_ms, out_sum = [], [], [], []
            for p in pdf[payload_col].tolist():
                sr, pcm = codecs.decode_wav_samples(bytes(p))
                out_n.append(len(pcm))
                out_sr.append(sr)
                out_ms.append(len(pcm) * 1000 // sr)
                out_sum.append(int(sum(pcm)))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "n_samples": np.array(out_n, dtype=np.int32),
                    "sample_rate": np.array(out_sr, dtype=np.int32),
                    "duration_ms": np.array(out_ms, dtype=np.int32),
                    "sample_sum": np.array(out_sum, dtype=np.int64),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _proc,
        "id long, n_samples int, sample_rate int, duration_ms int, sample_sum long",
    )


def repartition_for_payloads(
    df: DataFrame, approx_total_mb: float, target_partition_mb: int = 128
) -> DataFrame:
    """Re-split a payload scan so each partition carries roughly
    ``target_partition_mb`` of binary data (keeps one Arrow batch per
    task inside executor memory at 100 TB)."""
    parts = max(1, int(approx_total_mb / target_partition_mb))
    return df.repartition(parts)


def attach_phash_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """``(id, payload)`` — REAL grayscale PNG payloads with PLANTED
    near-duplicate groups, the image-dedup fixture: images come in
    groups of three (``g = id // 3``, variant ``v = id % 3``) sharing
    one base pattern; variants ``v > 0`` perturb ~1/23 of the pixels
    by +1 (mod 256) — the "recompressed/retouched copy" stand-in. The
    base pattern varies per group in GRADIENT, not just offset
    (``(x//2)·(17 + g%11) + (y//2)·(29 + g%13)`` plus a ``g·37``
    level), because a difference hash is level-invariant by
    construction — offset-only groups would all collide. Dimensions
    vary per group (``w = 20 + g%7``, ``h = 16 + g%5``) so the
    9×8-style floor grid is exercised on non-divisible sizes. Pixels
    are a pure function of the id (the ``attach_png_payloads``
    oracle-recomputability contract) while the payload round-trips
    the real encoder. ``mapInPandas``; payloads never shuffle."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            for i in ids:
                i = int(i)
                g, v = i // 3, i % 3
                w, h = 20 + g % 7, 16 + g % 5
                x = np.arange(w, dtype=np.int64)[None, :]
                y = np.arange(h, dtype=np.int64)[:, None]
                p = (
                    g * 37
                    + (x // 2) * (17 + g % 11)
                    + (y // 2) * (29 + g % 13)
                ) % 256
                if v > 0:
                    p = (p + (((x + y + v) % 23) == 0).astype(np.int64)) % 256
                payloads.append(
                    codecs.encode_png(
                        w, h, p.astype(np.uint8).tobytes(), channels=1
                    )
                )
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        _gen, "id long, payload binary"
    )


def image_dhash(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    grid: int = 8,
) -> DataFrame:
    """``(id, dhash)`` — difference-hash perceptual fingerprints from
    DECODED pixels (real ``codecs.decode_png``), the image-content
    analogue of :func:`~spark_ifs_spark.operators.dedup.simhash_fingerprints`:

    - brightness = integer per-pixel channel sum (decoded bytes, so a
      content-level decode error changes the hash, not just metadata);
    - the image partitions into a ``grid × grid`` cell lattice by the
      digital-line rule ``cell_x = (x·grid) DIV w`` (size-invariant —
      no resampling step, so the hash is integer-exact for ANY w ≥
      grid, h ≥ grid, and an engine-independent oracle can replay it);
    - bit ``(r, c)`` = 1 iff cell ``(r, c+1)``'s mean brightness
      exceeds cell ``(r, c)``'s — compared as the exact cross-product
      ``s₂·n₁ > s₁·n₂`` (cells have unequal pixel counts on
      non-divisible sizes; float means would round);
    - ``grid·(grid−1)`` bits pack little-endian into one signed int64
      (56 bits at the default grid 8 — inside the sign bit, the
      package's ≤60-bit hash convention; grids up to 9×8 = 64 bits
      wrap to two's complement, matching BIGINT semantics in both
      engines).

    Pair with :func:`~spark_ifs_spark.operators.dedup.simhash_near_pairs`
    (``bits = grid·(grid−1)``) for the Hamming-banded near-dup join —
    hashes are one long per image, so the pair stage never touches
    pixels. ``mapInPandas``, Arrow batches; the per-payload codec call
    is the only Python loop.

    No counterpart in the reference; extension operator (the image
    modality of the dedup family — dHash per Krawetz's kind-of-like-
    that construction, public domain technique)."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    nbits = grid * (grid - 1)

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col].tolist():
                w, h, c, px = codecs.decode_png(bytes(p))
                if w < grid or h < grid:
                    raise ValueError(
                        f"image {w}x{h} smaller than the {grid}x{grid} grid"
                    )
                a = (
                    np.frombuffer(px, dtype=np.uint8)
                    .reshape(h, w, c)
                    .astype(np.int64)
                    .sum(axis=2)
                )
                cx = (np.arange(w) * grid) // w
                cy = (np.arange(h) * grid) // h
                cell = (cy[:, None] * grid + cx[None, :]).ravel()
                s = np.bincount(
                    cell, weights=a.ravel().astype(np.float64),
                    minlength=grid * grid,
                ).astype(np.int64)  # integer-valued (< 2^53), exact
                n = np.bincount(cell, minlength=grid * grid)
                dh = 0
                for r in range(grid):
                    for cc in range(grid - 1):
                        i1, i2 = r * grid + cc, r * grid + cc + 1
                        if s[i2] * n[i1] > s[i1] * n[i2]:
                            dh |= 1 << (r * (grid - 1) + cc)
                if dh >= 1 << 63:
                    dh -= 1 << 64  # two's complement for int64 grids
                out.append(dh)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "dhash": np.array(out, dtype=np.int64),
                }
            )

    assert nbits <= 64
    return df.select(id_col, payload_col).mapInPandas(
        _proc, "id long, dhash long"
    )


def attach_audio_payloads(df: DataFrame, id_col: str) -> DataFrame:
    """``(id, payload)`` — REAL RIFF/WAVE PCM16 payloads with PLANTED
    near-duplicate groups, the audio-dedup fixture completing the
    modality triple (text shingles ✓, image pixels ✓, now samples):
    clips come in groups of three (``g = id // 3``, variant
    ``v = id % 3``) sharing one base signal of 128 mono 16 kHz
    samples, ``s[k] = ((g·31+7)·k² + (g%13+3)·k·57) % 30011 − 15005``;
    variants ``v > 0`` nudge the ~2 samples where ``(k+v) % 53 == 0``
    by +1 — the "re-encoded/resampled copy" stand-in. Samples are a
    pure function of the id (the ``attach_png_payloads``
    oracle-recomputability contract) while the payload round-trips the
    real WAV encoder, so a downstream ``decode_wav_samples`` is
    exercised end-to-end. ``mapInPandas``; payloads never shuffle."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = []
            k = np.arange(128, dtype=np.int64)
            for i in ids:
                i = int(i)
                g, v = i // 3, i % 3
                s = ((g * 31 + 7) * k * k + (g % 13 + 3) * k * 57) % 30011 - 15005
                if v > 0:
                    s = s + ((k + v) % 53 == 0).astype(np.int64)
                payloads.append(
                    codecs.encode_wav(
                        s.astype("<i2").tobytes(), sample_rate=16_000
                    )
                )
            yield pd.DataFrame({"id": ids, "payload": payloads})

    return df.select(F.col(id_col).alias("id")).mapInPandas(
        _gen, "id long, payload binary"
    )


def audio_fingerprint(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frames: int = 8,
    frame_len: int = 16,
) -> DataFrame:
    """``(id, afp)`` — spectral-band energy fingerprints from DECODED
    PCM samples (real ``codecs.decode_wav_samples``), the audio-content
    analogue of :func:`image_dhash` — chromaprint-shaped (Chromaprint /
    AcoustID's public construction: frame the signal, take per-frame
    spectral band energies, difference-code adjacent frames into bits):

    - the first ``frames·frame_len`` samples split into ``frames``
      frames (shorter clips raise — a fingerprint of silence padding
      would collide everything);
    - per frame, the WALSH-HADAMARD transform (±1 weights by
      ``popcount(j & t)`` parity) supplies the sequency spectrum —
      chosen over the FFT because it is INTEGER-exact, so an
      engine-independent oracle replays every coefficient bit-for-bit
      where float trig would drift on near-tie comparisons;
    - coefficients pair into ``frame_len/2`` bands; band energy =
      ``Σ|c|`` (integer);
    - bit ``(f, b)`` = 1 iff band ``b``'s energy RISES from frame ``f``
      to ``f+1`` — temporal difference coding, level-invariant like the
      image dHash — giving ``(frames−1)·frame_len/2`` bits packed
      little-endian (56 bits at the defaults, inside the sign bit).

    Pair with :func:`~spark_ifs_spark.operators.dedup.simhash_near_pairs`
    (``bits = (frames−1)·frame_len/2``) for the Hamming-banded near-dup
    join — hashes are one long per clip, so the pair stage never
    touches samples. ``mapInPandas``, Arrow batches; the per-payload
    codec call is the only Python loop.

    No counterpart in the reference; extension operator (the audio
    modality of the dedup family)."""
    import numpy as np

    from spark_ifs_spark.functions import codecs

    bands = frame_len // 2
    nbits = (frames - 1) * bands
    if nbits > 64 or frame_len & (frame_len - 1):
        raise ValueError(
            f"frames={frames}, frame_len={frame_len}: need a power-of-2 "
            f"frame and (frames-1)*frame_len/2 <= 64 bits, got {nbits}"
        )
    need = frames * frame_len
    wht = np.array(
        [
            [1 - 2 * (bin(j & t).count("1") % 2) for t in range(frame_len)]
            for j in range(frame_len)
        ],
        dtype=np.int64,
    )

    def _proc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col].tolist():
                _, vals = codecs.decode_wav_samples(bytes(p))
                if len(vals) < need:
                    raise ValueError(
                        f"clip has {len(vals)} samples, fingerprint needs {need}"
                    )
                s = np.asarray(vals[:need], dtype=np.int64).reshape(
                    frames, frame_len
                )
                c = s @ wht.T
                e = np.abs(c).reshape(frames, bands, 2).sum(axis=2)
                afp = 0
                for f in range(frames - 1):
                    for b in range(bands):
                        if e[f + 1][b] > e[f][b]:
                            afp |= 1 << (f * bands + b)
                if afp >= 1 << 63:
                    afp -= 1 << 64  # two's complement for 64-bit layouts
                out.append(afp)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(),
                    "afp": np.array(out, dtype=np.int64),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        _proc, "id long, afp long"
    )
