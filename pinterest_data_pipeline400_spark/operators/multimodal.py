"""Multimodal columns: opaque binary payloads + typed metadata, with
Arrow-batched feature extraction via ``mapInPandas``.

The contract (builder brief): image/audio/video content rides through
the engine as ``binary`` columns; decode / feature-extract / resize /
frame-sample run as Pandas UDFs over ``mapInPandas`` so bytes cross the
JVM↔Python boundary in Arrow record batches, never row-at-a-time.

Three decoders are REAL and dependency-free: binary P6 PPM
(:func:`parse_ppm`), RIFF/WAVE PCM16 (:func:`parse_wav`), and
non-interlaced 8-bit RGB PNG (:func:`parse_png` — stdlib zlib inflate
plus full five-filter scanline unfiltering). Exotic formats (JPEG
pixels, palette/interlaced PNG, compressed audio) need pillow /
torchaudio / ffmpeg, which this environment does not ship:

  * :func:`decode_image_real` raises ``NotImplementedError`` for those
    (the clearly-marked integration point);
  * :func:`fake_features` is the deterministic stand-in used by the
    generic pipeline and its oracle — pure arithmetic on the payload
    bytes, so the Spark-side plumbing (schema, Arrow batching,
    partition preservation) is real and value-checked end-to-end.

Scale notes: ``mapInPandas`` streams Arrow batches per partition — no
collect, no per-row Python calls; memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Feature extraction is
embarrassingly parallel: partition however the upstream scan was
partitioned, no shuffle required.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def parse_ppm(payload: bytes) -> tuple[int, int, int, int]:
    """Public 4-tuple contract over :func:`_parse_ppm_full` — see there
    for the netpbm grammar details."""
    return _parse_ppm_full(payload)[:4]


def _parse_ppm_full(payload: bytes):
    """Real, dependency-free decode of a binary P6 (raw) PPM image.

    Implements the netpbm header grammar: ``P6`` magic, then three
    ASCII integers (width, height, maxval) separated by arbitrary
    whitespace, with ``#``-to-end-of-line comments allowed anywhere
    between tokens, then EXACTLY ONE whitespace byte before the raw
    RGB samples (maxval < 256 → one byte per sample). Returns
    ``(width, height, maxval, pixel_sum, samples)`` where pixel_sum is
    the exact integer sum of all ``3*width*height`` sample bytes and
    samples the raw uint8 array (interleaved RGB).

    Raises ``ValueError`` on a bad magic, malformed header, out-of-spec
    maxval, or truncated pixel data — a decode that silently zero-fills
    would defeat the oracle check.
    """
    import numpy as np

    pos = 0
    n = len(payload)

    def token() -> bytes:
        nonlocal pos
        while pos < n:
            c = payload[pos : pos + 1]
            if c in b" \t\r\n\x0b\x0c":
                pos += 1
            elif c == b"#":
                while pos < n and payload[pos : pos + 1] != b"\n":
                    pos += 1
            else:
                break
        start = pos
        while pos < n and payload[pos : pos + 1] not in b" \t\r\n\x0b\x0c":
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        return payload[start:pos]

    if token() != b"P6":
        raise ValueError("not a binary (P6) PPM payload")
    try:
        width, height, maxval = int(token()), int(token()), int(token())
    except ValueError as exc:
        raise ValueError("malformed PPM header integer") from exc
    if width <= 0 or height <= 0 or not 0 < maxval < 65536:
        raise ValueError(f"out-of-spec PPM dimensions {width}x{height}/{maxval}")
    if maxval > 255:
        raise ValueError("16-bit PPM samples not supported")
    pos += 1  # the single whitespace byte that terminates the header
    data = payload[pos : pos + 3 * width * height]
    if len(data) != 3 * width * height:
        raise ValueError("truncated PPM pixel data")
    samples = np.frombuffer(data, dtype=np.uint8)
    return width, height, maxval, int(samples.sum(dtype=np.int64)), samples


PPM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("maxval", T.IntegerType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
        T.StructField("pixel_mean", T.DoubleType(), False),
    ]
)


def decode_ppm_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode: every payload is parsed as a
    binary P6 PPM (:func:`parse_ppm` — pure Python/numpy, no codec
    dependency) and reduced to exact width/height/maxval/pixel-sum/mean.
    Same mapInPandas shape as :func:`extract_features`: bytes cross the
    JVM boundary once per Arrow batch, never per row, and the stage is
    embarrassingly parallel (no shuffle; input splits give the
    parallelism at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:  # NULL payload: contract error, not TypeError
                    raise ValueError(f"media_id {mid}: NULL payload")
                w, h, maxval, s = parse_ppm(bytes(p))
                rows.append((mid, w, h, maxval, s, s / (3.0 * w * h)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "maxval", "pixel_sum", "pixel_mean",
                ],
            )

    return media.mapInPandas(run, PPM_SCHEMA)


def parse_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Real, dependency-free decode of a RIFF/WAVE 16-bit PCM payload.

    Implements the RIFF container grammar: ``RIFF`` magic + declared
    size + ``WAVE`` form type, then a chunk walk (4-byte id, LE32 size,
    body, odd sizes padded to even) that must tolerate unknown chunks
    (``LIST``, ``INFO``, …) in any position. Requires a ``fmt `` chunk
    with audio_format=1 (integer PCM) and bits_per_sample=16 before the
    ``data`` chunk. Returns ``(channels, sample_rate, n_frames,
    sample_sum)`` where n_frames is per-channel frame count and
    sample_sum the exact int64 sum of every interleaved int16 sample.

    Raises ``ValueError`` on bad magic, missing/malformed chunks,
    non-PCM16 encodings, or truncated sample data — silent zero-fill
    would defeat the oracle check.
    """
    return _parse_wav_full(payload)[:4]


def _parse_wav_full(payload: bytes):
    """Core RIFF/WAVE PCM16 decode returning the raw sample array too —
    see :func:`parse_wav` for the container-grammar contract."""
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    if end > len(payload):
        raise ValueError("truncated RIFF payload")
    channels = sample_rate = bits = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_format, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding fmt={audio_format}/{bits}bit")
            if channels == 0 or sample_rate == 0:
                # must stay inside the documented ValueError contract —
                # otherwise these escape as ZeroDivisionError downstream
                raise ValueError(
                    f"malformed fmt chunk: channels={channels}, rate={sample_rate}"
                )
        elif cid == b"data":
            if channels is None:
                raise ValueError("data chunk before fmt chunk")
            if size % (2 * channels):
                raise ValueError("data chunk not frame-aligned")
            samples = np.frombuffer(body, dtype="<i2")
            return (
                channels,
                sample_rate,
                size // (2 * channels),
                int(samples.sum(dtype=np.int64)),
                samples,
            )
        pos += 8 + size + (size % 2)  # odd chunk bodies pad to even
    raise ValueError("no data chunk in WAV payload")


WAV_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("channels", T.IntegerType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("sample_sum", T.LongType(), False),
        T.StructField("duration_s", T.DoubleType(), False),
    ]
)


def decode_wav_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL audio decode: every payload is parsed as a
    RIFF/WAVE PCM16 file (:func:`parse_wav` — pure Python/numpy, no
    codec dependency) and reduced to exact channel/rate/frame counts
    plus the integer sum of all samples. Same mapInPandas shape as
    :func:`decode_ppm_features`: bytes cross the JVM boundary once per
    Arrow batch, never per row; the stage is embarrassingly parallel
    (no shuffle — input splits give the parallelism at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:  # NULL payload: contract error, not TypeError
                    raise ValueError(f"media_id {mid}: NULL payload")
                c, sr, frames, s = parse_wav(bytes(p))
                rows.append((mid, c, sr, frames, s, frames / sr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "channels", "sample_rate",
                    "n_frames", "sample_sum", "duration_s",
                ],
            )

    return media.mapInPandas(run, WAV_SCHEMA)


#: every JFIF "start of frame" marker variant (baseline, progressive,
#: lossless, arithmetic-coded …) — all share the same height/width/
#: component layout in the segment body
_JPEG_SOF_MARKERS = frozenset(
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}


def parse_jpeg_dims(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from a JPEG header — a pure
    marker-segment walk to the SOF frame, no codec required (the
    entropy-coded pixel data is never touched, so this needs neither
    pillow nor libjpeg). Mirrors parse_ppm's role for the compressed
    format: metadata extraction stays dependency-free at any scale;
    only full pixel decode needs the optional pillow path."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    i = 2
    n = len(payload)
    while i + 3 < n:
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = payload[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seglen < 2:
            # a segment length below 2 cannot even cover its own length
            # field; advancing 2 bytes would misread following bytes as
            # markers (ADVICE r8)
            raise ValueError(f"corrupt JPEG segment length {seglen} at offset {i}")
        if marker in _JPEG_SOF_MARKERS:
            if i + 9 >= n:  # truncated inside the SOF body (ADVICE r8)
                raise ValueError("truncated JPEG: SOF segment cut short")
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            ncomp = payload[i + 9]
            return width, height, ncomp
        if marker == 0xDA:  # SOS: entropy-coded data follows, SOF missed
            break
        i += 2 + seglen
    raise ValueError("no SOF marker before scan data")


_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png_dims(payload: bytes) -> tuple[int, int, int]:
    """(width, height, color_type) from a PNG's IHDR chunk — the spec
    REQUIRES IHDR first, so this is a fixed-offset read after the
    8-byte signature: chunk length+type at 8..16, then width/height as
    big-endian u32 and bit-depth/color-type bytes. No inflate, no
    dependency — metadata only, like the JPEG marker walk."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    if len(payload) < 26 or payload[12:16] != b"IHDR":
        raise ValueError("malformed PNG: IHDR not first")
    width = int.from_bytes(payload[16:20], "big")
    height = int.from_bytes(payload[20:24], "big")
    color_type = payload[25]
    return width, height, color_type


def parse_png(payload: bytes) -> tuple[int, int, int, int]:
    """Public 4-tuple (width, height, bit_depth, pixel_sum) contract
    over :func:`_parse_png_full` — see there for the decode grammar."""
    return _parse_png_full(payload)[:4]


def _parse_png_full(payload: bytes):
    """Real, dependency-free decode of a non-interlaced 8-bit RGB
    (color type 2) PNG — stdlib ``zlib`` inflate + full scanline
    unfiltering, no pillow (VERDICT r11 task #3).

    Implements the PNG container grammar: 8-byte signature, then a
    chunk walk (BE32 length, 4-byte type, body, BE32 CRC over
    type+body — VERIFIED per chunk, a flipped payload bit must not
    decode); IHDR first with bit_depth=8 / color_type=2 /
    compression=0 / filter=0 / interlace=0; IDAT bodies CONCATENATED
    (the spec allows any split) into one zlib stream; IEND terminates.
    The inflated stream is ``height`` scanlines of 1 filter byte +
    ``3*width`` sample bytes, unfiltered per the five spec filters
    (None / Sub / Up / Average / Paeth, RFC 2083 §6) against the
    RECONSTRUCTED previous row. Up and Sub are vectorized (Up is
    pure element-wise; Sub is a per-channel cumulative sum mod 256);
    Average/Paeth mix the left recon byte into each prediction, so
    they scan the row sequentially — rows are one Arrow-batched
    Python stage deep, never per-row JVM calls.

    Returns ``(width, height, bit_depth, pixel_sum, samples)`` where
    pixel_sum is the exact int64 sum of all ``3*width*height``
    reconstructed sample bytes and samples the raw uint8 array
    (interleaved RGB, row-major).

    Raises ``ValueError`` on bad signature, chunk CRC mismatch,
    truncated chunks, out-of-scope IHDR (16-bit, palette, grayscale,
    alpha, Adam7 interlace), corrupt zlib data, scanline-size
    mismatch, or an undefined filter type — silent zero-fill would
    defeat the oracle check.
    """
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, n = 8, len(payload)
    ihdr: bytes | None = None
    idat: list[bytes] = []
    ended = False
    while pos + 12 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > n:
            raise ValueError(f"truncated {typ!r} chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {typ!r} chunk")
        if typ == b"IHDR":
            if ihdr is not None or pos != 8:
                raise ValueError("malformed PNG: IHDR not first/unique")
            ihdr = body
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT/IEND")
    if len(ihdr) != 13:
        raise ValueError("malformed IHDR length")
    width, height, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if width <= 0 or height <= 0:
        raise ValueError(f"out-of-spec PNG dimensions {width}x{height}")
    if depth != 8 or ctype != 2:
        raise ValueError(
            f"only 8-bit RGB (color type 2) supported, got depth={depth}/"
            f"color_type={ctype}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unknown PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7-interlaced PNG not supported")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT zlib stream") from exc
    stride = 3 * width
    if len(raw) != height * (1 + stride):
        raise ValueError("PNG scanline size mismatch")
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(height, 1 + stride)
    recon = np.zeros((height, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(height):
        f = int(scan[r, 0])
        rowb = scan[r, 1:].astype(np.int32)
        if f == 0:  # None
            cur = rowb
        elif f == 1:  # Sub: per-channel cumsum mod 256 (vectorized)
            cur = np.empty(stride, dtype=np.int32)
            for ch in range(3):
                cur[ch::3] = np.cumsum(rowb[ch::3]) % 256
        elif f == 2:  # Up (element-wise, vectorized)
            cur = (rowb + prev) % 256
        elif f in (3, 4):  # Average / Paeth: left-recon recurrence
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - 3] if x >= 3 else 0
                b = prev[x]
                c = int(prev[x - 3]) if x >= 3 else 0
                if f == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (rowb[x] + pred) & 255
        else:
            raise ValueError(f"undefined PNG filter type {f}")
        recon[r] = cur
        prev = cur
    samples = recon.astype(np.uint8).reshape(-1)
    return width, height, depth, int(samples.sum(dtype=np.int64)), samples


PNG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("bit_depth", T.IntegerType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
        T.StructField("pixel_mean", T.DoubleType(), False),
    ]
)


def decode_png_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL PNG decode: every payload is inflated and
    unfiltered by :func:`parse_png` (stdlib zlib + numpy, no codec
    dependency) and reduced to exact width/height/bit-depth/pixel-sum/
    mean. Same mapInPandas shape as :func:`decode_ppm_features`: bytes
    cross the JVM boundary once per Arrow batch, never per row, and the
    stage is embarrassingly parallel (no shuffle; input splits give the
    parallelism at scale)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:  # NULL payload: contract error, not TypeError
                    raise ValueError(f"media_id {mid}: NULL payload")
                w, h, depth, s = parse_png(bytes(p))
                rows.append((mid, w, h, depth, s, s / (3.0 * w * h)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height",
                    "bit_depth", "pixel_sum", "pixel_mean",
                ],
            )

    return media.mapInPandas(run, PNG_SCHEMA)


# ---------------------------------------------------------------------------
# baseline JPEG full-pixel decode (stdlib + numpy — VERDICT r12 task #6:
# huffman + dequant + IDCT + 4:2:0 upsample + fixed-point YCbCr->RGB,
# retiring the last pillow-only codec branch for baseline files)
# ---------------------------------------------------------------------------

#: zigzag index k -> natural (row*8 + col) position (T.81 Figure A.6)
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

#: fixed-point YCbCr->RGB factors, 16 fractional bits (round(c*65536)
#: of the JFIF 1.402 / 0.344136 / 0.714136 / 1.772 constants). The
#: conversion is defined in EXACT integer arithmetic with a positive
#: bias before the shift (so floor == truncation == >>), because the
#: decode oracle re-derives the same pixels in SQL — a float convert
#: would hinge parity on libm rounding (T.81 leaves the precision
#: implementation-defined, so pinning it is spec-legal).
_JFIX_R_CR = 91881
_JFIX_G_CB = 22554
_JFIX_G_CR = 46802
_JFIX_B_CB = 116131


def _jpeg_huff_decode_table(bits: list, vals: list) -> dict:
    """{(length, code): symbol} canonical huffman map (T.81 C.2)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return out


class _JpegBitReader:
    """MSB-first bit reader over the entropy-coded segment with T.81
    byte unstuffing (0xFF 0x00 -> data 0xFF; 0xFF D0-D7 restart markers
    surface via ``at_marker``; any other 0xFF marker ends the scan)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.buf
        if self.pos >= len(b):
            raise ValueError("truncated JPEG: entropy data ran out")
        byte = b[self.pos]
        if byte == 0xFF:
            nxt = b[self.pos + 1] if self.pos + 1 < len(b) else None
            if nxt == 0x00:
                self.pos += 2
            else:  # a real marker: the scan is over (or corrupt)
                raise ValueError(
                    "truncated JPEG: hit marker "
                    f"0xFF{nxt:02X} inside entropy data"
                    if nxt is not None
                    else "truncated JPEG: dangling 0xFF"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: dict) -> int:
        length = 0
        code = 0
        while length < 16:
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("corrupt JPEG: no huffman code within 16 bits")


def _jpeg_extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the s low-order bits back to a signed
    coefficient value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_idct_matrix():
    import numpy as np

    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    m[0, :] *= 1 / np.sqrt(2)
    return m


def parse_jpeg_baseline(payload: bytes):
    """Full dependency-free baseline JPEG decode: (rgb uint8 array of
    shape (h, w, 3), subsampling string). Implements the T.81 baseline
    grammar end to end — DQT (multi-table segments), DHT (canonical
    huffman from BITS/HUFFVAL, so custom tables work), SOF0 (rejects
    progressive/arithmetic SOFs explicitly), DRI/RSTn (DC-prediction
    reset + byte alignment), SOS, then per-MCU entropy decode with DC
    prediction per component, run-length AC with ZRL/EOB, dequantize
    through the zigzag, float separable IDCT, chroma upsampling by
    replication, and the pinned fixed-point YCbCr->RGB (see
    _JFIX_* above). Reference behavior target: the reference stack
    delegates JPEG to managed-runtime codecs; re-derived here from the
    public T.81 spec so the multimodal path has no native dependency."""
    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtabs: dict[int, list] = {}
    htabs: dict[tuple, dict] = {}
    sof = None
    restart_interval = 0
    i = 2
    n = len(payload)
    while True:
        if i + 3 >= n:
            raise ValueError("truncated JPEG: no SOS marker")
        if payload[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = payload[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            raise ValueError(f"corrupt JPEG segment length {seglen} at offset {i}")
        body = payload[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT: one or more tables per segment
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not baseline")
                if j + 65 > len(body):
                    raise ValueError("truncated DQT table")
                qtabs[tq] = list(body[j + 1 : j + 65])
                j += 65
        elif marker == 0xC4:  # DHT: one or more tables per segment
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 0x0F
                bits = list(body[j + 1 : j + 17])
                nv = sum(bits)
                if j + 17 + nv > len(body):
                    raise ValueError("truncated DHT table")
                vals = list(body[j + 17 : j + 17 + nv])
                htabs[(tc, th)] = _jpeg_huff_decode_table(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext sequential
            prec = body[0]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            sof = (w, h, comps)
        elif marker in _JPEG_SOF_MARKERS:  # progressive/lossless/arith
            raise ValueError(
                f"unsupported JPEG SOF marker 0xFF{marker:02X} "
                "(baseline DCT only)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append((cs, tt >> 4, tt & 0x0F))
            i = i + 2 + seglen
            break
        i += 2 + seglen
    if sof is None:
        raise ValueError("no SOF before SOS")
    w, h, comps = sof
    if w < 1 or h < 1:
        raise ValueError(f"out-of-spec JPEG dimensions {w}x{h}")
    if len(scan) != len(comps):
        raise ValueError("SOS component count != SOF component count")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    idct = _jpeg_idct_matrix()
    planes = []
    meta = []  # (hi, vi, qtab, dctab, actab) per scan component
    for (cid, hi, vi, tq), (scid, td, ta) in zip(comps, scan):
        if scid != cid:
            raise ValueError("SOS/SOF component id mismatch")
        if tq not in qtabs:
            raise ValueError(f"missing quantization table {tq}")
        if (0, td) not in htabs or (1, ta) not in htabs:
            raise ValueError("missing huffman table referenced by SOS")
        planes.append(np.zeros((mcuy * 8 * vi, mcux * 8 * hi), dtype=np.int64))
        meta.append((hi, vi, qtabs[tq], htabs[(0, td)], htabs[(1, ta)]))
    rd = _JpegBitReader(payload, i)
    pred = [0] * len(comps)
    zz = _JPEG_ZIGZAG
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                # byte-align and consume the RSTn marker, reset preds
                rd.nbits = 0
                rd.acc = 0
                if not (
                    rd.pos + 1 < n
                    and payload[rd.pos] == 0xFF
                    and 0xD0 <= payload[rd.pos + 1] <= 0xD7
                ):
                    raise ValueError("missing JPEG restart marker")
                rd.pos += 2
                pred = [0] * len(comps)
            for ci, (hi, vi, q, dct, act) in enumerate(meta):
                for by in range(vi):
                    for bx in range(hi):
                        s = rd.huff(dct)
                        diff = _jpeg_extend(rd.bits(s), s) if s else 0
                        pred[ci] += diff
                        coef = np.zeros(64, dtype=np.float64)
                        coef[zz[0]] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = rd.huff(act)
                            r, sz = rs >> 4, rs & 0x0F
                            if sz == 0:
                                if rs == 0xF0:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("corrupt JPEG: AC index > 63")
                            coef[zz[k]] = _jpeg_extend(rd.bits(sz), sz) * q[k]
                            k += 1
                        block = idct.T @ coef.reshape(8, 8) @ idct
                        px = np.clip(np.round(block) + 128, 0, 255)
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px.astype(
                            np.int64
                        )
            mcu_count += 1
    if len(comps) == 1:
        ych = planes[0][:h, :w]
        rgb = np.stack([ych, ych, ych], axis=-1).astype(np.uint8)
        return rgb, "gray"
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    full = []
    for ci, (hi, vi, *_rest) in enumerate(meta):
        p = planes[ci]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    y, cb, cr = (f.astype(np.int64) for f in full)
    r = y + ((_JFIX_R_CR * (cr - 128) + 32768 + (1 << 24)) >> 16) - 256
    g = (
        y
        - (
            (
                _JFIX_G_CB * (cb - 128)
                + _JFIX_G_CR * (cr - 128)
                + 32768
                + (1 << 25)
            )
            >> 16
        )
        + 512
    )
    b = y + ((_JFIX_B_CB * (cb - 128) + 32768 + (1 << 25)) >> 16) - 512
    rgb = np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)
    samp = {(2, 2): "4:2:0", (1, 1): "4:4:4", (2, 1): "4:2:2"}.get(
        (comps[0][1], comps[0][2]), f"{comps[0][1]}x{comps[0][2]}"
    )
    return rgb, samp


JPEG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("subsampling", T.StringType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
        T.StructField("pixel_sq_sum", T.LongType(), False),
        T.StructField("pixel_mean", T.DoubleType(), False),
    ]
)


def decode_jpeg_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL baseline-JPEG decode: every payload runs the
    full huffman+IDCT path (:func:`parse_jpeg_baseline`) and reduces to
    width/height/subsampling/pixel-sum/pixel-square-sum. The square sum
    is what makes the planted AC coefficients visible to the oracle —
    the fixture's ±ac pattern cancels in a plain sum but not in the
    squares, so a decoder that ignores AC coefficients (or the DHT)
    cannot match. Same mapInPandas shape as
    :func:`decode_png_features`."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(f"media_id {mid}: NULL payload")
                rgb, samp = parse_jpeg_baseline(bytes(p))
                h, w = rgb.shape[:2]
                flat = rgb.astype("int64")
                s = int(flat.sum())
                sq = int((flat * flat).sum())
                rows.append((mid, w, h, samp, s, sq, s / (3.0 * w * h)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "subsampling",
                    "pixel_sum", "pixel_sq_sum", "pixel_mean",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(run, JPEG_SCHEMA)


def parse_flac_streaminfo(payload: bytes) -> dict:
    """Sample rate / channels / bits / total samples from a FLAC
    STREAMINFO block — the spec requires it as the first metadata
    block after the 'fLaC' marker, so this is bit-shifting at fixed
    offsets; the compressed frames are never touched (the WAV
    decoder's metadata-only sibling for the compressed format)."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC marker)")
    if len(payload) < 42 or (payload[4] & 0x7F) != 0:
        raise ValueError("malformed FLAC: STREAMINFO not first")
    b = payload[8:]  # STREAMINFO body (34 bytes)
    sample_rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x07) + 1
    bits = (((b[12] & 0x01) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits,
        "total_samples": total,
    }


def decode_image_real(payload: bytes) -> dict:
    """The real decoder's integration point. P6 PPM payloads decode
    natively (:func:`parse_ppm`); JPEG and PNG headers parse natively
    (:func:`parse_jpeg_dims` / :func:`parse_png_dims`) — no dependency
    for any of them; other formats use pillow when it is installed
    (production image) and raise ``NotImplementedError`` in codec-less
    environments like this sandbox — callers fall back to
    :func:`fake_features`. ``pytest.importorskip``-gated tests prove
    the pillow path and the native header walks agree wherever pillow
    exists."""
    if payload[:2] == b"P6":
        width, height, _maxval, _s = parse_ppm(payload)
        return {"width": width, "height": height, "mode": "RGB", "format": "PPM"}
    if payload[:2] == b"\xff\xd8":
        width, height, ncomp = parse_jpeg_dims(payload)
        return {
            "width": width,
            "height": height,
            "mode": _JPEG_MODES.get(ncomp, f"C{ncomp}"),
            "format": "JPEG",
        }
    if payload[:8] == _PNG_SIG:
        width, height, color_type = parse_png_dims(payload)
        return {
            "width": width,
            "height": height,
            "mode": _PNG_MODES.get(color_type, f"C{color_type}"),
            "format": "PNG",
        }
    try:
        import io

        from PIL import Image  # noqa: PLC0415 — optional dependency
    except ImportError as exc:
        raise NotImplementedError(
            "real image decoding requires pillow; use fake_features for tests"
        ) from exc
    with Image.open(io.BytesIO(payload)) as img:
        return {
            "width": img.width,
            "height": img.height,
            "mode": img.mode,
            "format": img.format,
        }


def fake_dims(n: int) -> tuple[int, int]:
    """The fake decode's (width, height) from a byte length — ONE
    definition shared by fake_features and resize_media, because the
    oracles mirror this exact arithmetic (a drifted copy would break
    parity in a non-obvious place)."""
    return n % 64 + 16, (n // 64) % 64 + 16


def fake_frame_count(n: int) -> int:
    """The fake decode's video frame count — shared by fake_features
    and sample_frames for the same no-drift reason."""
    return n % 30 + 1


def fake_features(payload: bytes, media_type: str) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in decode: features derived arithmetically
    from the payload bytes (mirrored exactly by the DuckDB oracle)."""
    n = len(payload)
    first = payload[0] if n else 0
    width, height = fake_dims(n)
    n_frames = fake_frame_count(n) if media_type == "video" else 1
    return n, first, width, height, n_frames


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (media_id, media_type,
    payload binary) via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                fake_features(p if p is not None else b"", t)
                for p, t in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(
                feats, columns=["byte_len", "first_byte", "width", "height", "n_frames"]
            )
            out.insert(0, "media_type", pdf["media_type"].values)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


#: Every FRAME_STRIDE-th fake frame is "decoded" by sample_frames.
FRAME_STRIDE = 5

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_len", T.IntegerType(), False),
        T.StructField("frame_md5", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """Frame sampling for video payloads via Arrow-batched
    ``mapInPandas``: the payload is split into ``n_frames`` equal byte
    slices (the fake decode's frame count — a real build swaps in an
    ffmpeg keyframe reader here), and every ``stride``-th frame is
    "decoded" (length + md5 of its bytes). The md5 round-trips the raw
    bytes through the Arrow boundary, so the oracle match proves the
    binary transport is byte-exact, not just shape-correct.

    The video filter is applied BEFORE mapInPandas so the predicate
    prunes at the scan and non-video rows never cross into Python.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                n = len(p)
                n_frames = fake_frame_count(n)
                for i in range(0, n_frames, stride):
                    seg = p[i * n // n_frames : (i + 1) * n // n_frames]
                    rows.append((mid, i, len(seg), hashlib.md5(seg).hexdigest()))
            out = pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_len", "frame_md5"]
            )
            if rows:
                yield out

    return media.filter(F.col("media_type") == "video").mapInPandas(run, FRAME_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("orig_len", T.IntegerType(), False),
        T.StructField("new_len", T.IntegerType(), False),
        T.StructField("new_width", T.IntegerType(), False),
        T.StructField("new_height", T.IntegerType(), False),
        T.StructField("resized_md5", T.StringType(), False),
    ]
)


def resize_media(media: DataFrame, scale_num: int = 1, scale_den: int = 2) -> DataFrame:
    """Resize for image payloads via Arrow-batched ``mapInPandas``: the
    fake resize is a center byte-crop to ``n * scale_num // scale_den``
    bytes (a real build swaps in a pillow/opencv rescale here), emitting
    the new fake dimensions plus the md5 of the cropped bytes — like
    :func:`sample_frames`, the md5 proves the payload bytes survive the
    JVM→Arrow→Python round trip exactly.

    The image filter is applied BEFORE mapInPandas so the predicate
    prunes at the scan and non-image rows never reach Python.
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                n = len(p)
                m = n * scale_num // scale_den
                off = (n - m) // 2
                seg = p[off : off + m]
                new_w, new_h = fake_dims(m)
                rows.append((mid, n, m, new_w, new_h, hashlib.md5(seg).hexdigest()))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "orig_len", "new_len",
                        "new_width", "new_height", "resized_md5",
                    ],
                )

    return media.filter(F.col("media_type") == "image").mapInPandas(run, RESIZE_SCHEMA)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a media table: the UTF-8 bytes of
    ``text`` stand in for real image/audio/video payloads (media_type
    assigned round-robin by id). Payload column is genuinely binary —
    the Arrow path carries real bytes."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


WAV_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), False),
        T.StructField("sumsq", T.LongType(), False),
        T.StructField("peak_abs", T.LongType(), False),
        T.StructField("rms_milli", T.LongType(), False),
    ]
)


def decode_wav_energy(media: DataFrame) -> DataFrame:
    """Arrow-batched audio ENERGY features from the real PCM16 decode:
    exact int64 sum of squares, peak |sample|, and milli-quantized RMS
    — the loudness/clipping screen an audio-curation pass runs before
    anything expensive (silence and clipped takes drop here). Same
    mapInPandas contract as :func:`decode_wav_features`; all reported
    stats are integers (one sqrt per row for RMS, then rounded), so
    the frame is engine-comparable bit-for-bit."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(f"media_id {mid}: NULL payload")
                _c, _sr, _frames, _s, samples = _parse_wav_full(bytes(p))
                s64 = samples.astype(np.int64)
                n = int(s64.size)
                sumsq = int((s64 * s64).sum())
                peak = int(np.abs(s64).max()) if n else 0
                rms_milli = int(round((sumsq / n) ** 0.5 * 1000)) if n else 0
                rows.append((mid, n, sumsq, peak, rms_milli))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "sumsq", "peak_abs", "rms_milli"],
            )

    return media.mapInPandas(run, WAV_ENERGY_SCHEMA)


IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("r_sum", T.LongType(), False),
        T.StructField("g_sum", T.LongType(), False),
        T.StructField("b_sum", T.LongType(), False),
        T.StructField("sumsq", T.LongType(), False),
        T.StructField("brightness_milli", T.LongType(), False),
        T.StructField("contrast_milli", T.LongType(), False),
    ]
)


def decode_ppm_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched image QUALITY stats from the real P6 decode:
    per-channel exact integer sums (color-cast check), sum of squares,
    milli-quantized brightness (mean sample) and contrast (population
    std) — the black-frame / blown-out / dead-channel screen an image
    curation pass runs before feature extraction. Same mapInPandas
    contract as :func:`decode_ppm_features`; all reported stats are
    integers (one sqrt per row for contrast, then rounded)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(f"media_id {mid}: NULL payload")
                _w, _h, _maxval, _s, samples = _parse_ppm_full(bytes(p))
                s64 = samples.astype(np.int64)
                n = int(s64.size)
                total = int(s64.sum())
                sumsq = int((s64 * s64).sum())
                rgb = s64.reshape(-1, 3)
                # n == 0 is unreachable (the parser rejects zero dims)
                # but guard anyway, matching decode_wav_energy
                mean = total / n if n else 0.0
                var = sumsq / n - mean * mean if n else 0.0
                rows.append(
                    (
                        mid,
                        int(rgb[:, 0].sum()),
                        int(rgb[:, 1].sum()),
                        int(rgb[:, 2].sum()),
                        sumsq,
                        int(round(mean * 1000)),
                        int(round(var**0.5 * 1000)),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "r_sum", "g_sum", "b_sum",
                    "sumsq", "brightness_milli", "contrast_milli",
                ],
            )

    return media.mapInPandas(run, IMAGE_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual hashing: dHash over the real PPM decode
# ---------------------------------------------------------------------------

#: dHash geometry: an 8x8 nearest-neighbor gray sample grid, 7
#: horizontal gradient comparisons per row -> a 56-bit fingerprint.
#: 56 (not the classic 64) keeps the hash strictly positive in an
#: int64 AND divides evenly into 4 bands of 14 bits — by pigeonhole a
#: pair within Hamming distance 3 shares at least one intact band, so
#: the banded candidate join is recall-complete at the verify
#: threshold (the SimHash 4x15 argument, operators/dedup.py).
DHASH_GRID = 8
DHASH_BITS = (DHASH_GRID - 1) * DHASH_GRID  # 56
DHASH_BANDS = 4
DHASH_BAND_BITS = DHASH_BITS // DHASH_BANDS  # 14
IMG_HAM_TAU = 3  # near-dup verify threshold (pigeonhole-complete)

DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), False),
    ]
)


def dhash_ppm(payload: bytes) -> int:
    """56-bit difference hash over a REAL P6 PPM decode (pure
    Python/numpy — :func:`_parse_ppm_full` does the byte walk).

    gray(r, c) = R+G+B at the nearest-neighbor sample
    ``(r*h//8, c*w//8)`` (integer channel SUM, not a luma blend: exact
    integer arithmetic is what lets the closed-form oracle recompute
    the hash without parsing bytes); bit ``r*7 + c`` is set iff
    ``gray(r, c+1) > gray(r, c)`` — the horizontal gradient sign,
    which survives uniform brightness shifts except where the 255
    clamp compresses one neighbor more than the other."""
    import numpy as np

    w, h, _maxval, _s, samples = _parse_ppm_full(payload)
    px = samples.reshape(h, w, 3).astype(np.int64)
    gray = px.sum(axis=2)
    rows = (np.arange(DHASH_GRID) * h) // DHASH_GRID
    cols = (np.arange(DHASH_GRID) * w) // DHASH_GRID
    g = gray[np.ix_(rows, cols)]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # (8, 7)
    weights = 1 << (
        np.arange(DHASH_GRID)[:, None] * (DHASH_GRID - 1)
        + np.arange(DHASH_GRID - 1)[None, :]
    )
    return int((bits * weights).sum())


def dhash_features(media: DataFrame) -> DataFrame:
    """(media_id, dhash) via Arrow-batched mapInPandas — the
    :func:`decode_ppm_features` boundary shape: bytes cross the JVM
    boundary once per batch, the stage is shuffle-free, and input
    splits give the parallelism at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(f"media_id {mid}: NULL payload")
                rows.append((mid, dhash_ppm(bytes(p))))
            yield pd.DataFrame(rows, columns=["media_id", "dhash"])

    return media.select("media_id", "payload").mapInPandas(run, DHASH_SCHEMA)


def dhash_near_dup_pairs(
    media: DataFrame, tau: int = IMG_HAM_TAU, eager: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming) for image pairs within ``tau`` bits —
    candidate generation is a banded equi-join on 14-bit hash chunks
    (never all-pairs; recall-complete at tau ≤ 3 by pigeonhole), verify
    is a two-column XOR + bit_count. The simhash_near_dup_pairs spine
    re-grounded on the perceptual hash.

    With ``eager`` (the default) the hash frame is persisted only for
    the duration of the build: the (small) verified pair list is
    materialized via localCheckpoint and the cache released before
    returning, so callers (sf1 sweeps, notebooks, the registered
    entry's one-time disk-cache build) don't leak one InMemory cache
    per invocation (ADVICE r9). ``eager=False`` returns the lazy plan
    with the persist still held — for plan inspection only."""
    return banded_hamming_pairs(
        dhash_features(media), "dhash", DHASH_BANDS, DHASH_BAND_BITS, tau, eager
    )


def banded_hamming_pairs(
    hashes: DataFrame,
    hash_col: str,
    bands: int,
    band_bits: int,
    tau: int,
    eager: bool = True,
) -> DataFrame:
    """(media_a, media_b, hamming) for (media_id, <hash_col>) frames:
    banded equi-join on band_bits-wide hash chunks (never all-pairs;
    recall-complete at tau <= bands - 1 by pigeonhole), two-long
    XOR + bit_count verify — the shared candidate spine of the image
    dHash and audio energy-hash dedup entries."""
    hashes = hashes.persist()
    keyed = hashes.select(
        "media_id",
        F.col(hash_col).alias("__h"),
        F.posexplode(
            F.array(
                *[
                    F.expr(
                        f"({hash_col} >> {b * band_bits})"
                        f" & {(1 << band_bits) - 1}"
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, on=["band_idx", "band_val"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.__h").alias("ha"),
            F.col("b.__h").alias("hb"),
        )
        .distinct()
    )
    pairs = (
        cand.withColumn("hamming", F.bit_count(F.expr("ha ^ hb")).cast("long"))
        .filter(F.col("hamming") <= tau)
        .select("media_a", "media_b", "hamming")
    )
    if eager:
        pairs = pairs.localCheckpoint()  # computed while hashes cached
        hashes.unpersist()
    return pairs


# --------------------------------------------------------------------------
# Audio energy-delta fingerprint: the dHash discipline on PCM frames
# (VERDICT r9 task #5 — multimodal x dedup symmetry for audio)
# --------------------------------------------------------------------------

#: 57 equal frames over the decoded PCM stream -> 56 energy-delta sign
#: bits, banded 4 x 14 exactly like the image dHash: pigeonhole
#: recall-complete at the tau=3 verify threshold. Sign-of-energy-delta
#: is VOLUME-INVARIANT (a gain scales every frame energy together),
#: the audio analog of dHash's brightness invariance.
AUDIO_FP_FRAMES = 57
AUDIO_FP_BITS = AUDIO_FP_FRAMES - 1  # 56
AUDIO_HAM_TAU = 3

AHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("ahash", T.LongType(), False),
    ]
)


def ahash_wav(payload: bytes) -> int:
    """56-bit audio fingerprint from a REAL RIFF/WAVE PCM16 decode:
    partition the sample stream into AUDIO_FP_FRAMES equal frames
    (integer frame length, trailing remainder ignored), exact int64
    abs-energy per frame, bit f = [energy(f+1) > energy(f)]. All
    integer arithmetic after the byte walk, so the fixture oracle can
    recompute every bit from its closed-form sample construction
    without parsing bytes (the dhash_ppm discipline)."""
    import numpy as np

    _c, _sr, _frames, _s, samples = _parse_wav_full(payload)
    s64 = samples.astype(np.int64)
    L = s64.size // AUDIO_FP_FRAMES
    if L == 0:
        raise ValueError(
            f"payload too short for {AUDIO_FP_FRAMES}-frame fingerprint: "
            f"{s64.size} samples"
        )
    e = np.abs(s64[: AUDIO_FP_FRAMES * L]).reshape(AUDIO_FP_FRAMES, L).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.int64)
    return int((bits * (1 << np.arange(AUDIO_FP_BITS, dtype=np.int64))).sum())


def ahash_features(media: DataFrame) -> DataFrame:
    """(media_id, ahash) via Arrow-batched mapInPandas — the
    decode_wav_features boundary shape: bytes cross the JVM boundary
    once per batch, the stage is shuffle-free."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None:
                    raise ValueError(f"media_id {mid}: NULL payload")
                rows.append((mid, ahash_wav(bytes(p))))
            yield pd.DataFrame(rows, columns=["media_id", "ahash"])

    return media.select("media_id", "payload").mapInPandas(run, AHASH_SCHEMA)


def ahash_near_dup_pairs(
    media: DataFrame, tau: int = AUDIO_HAM_TAU, eager: bool = True
) -> DataFrame:
    """(media_a, media_b, hamming) for audio pairs within ``tau`` bits
    of the 56-bit energy-delta fingerprint — the audio twin of
    :func:`dhash_near_dup_pairs`, sharing its banded candidate spine
    (4 x 14-bit chunks, pigeonhole-complete at tau <= 3) and its
    eager cache-release discipline."""
    return banded_hamming_pairs(
        ahash_features(media), "ahash", DHASH_BANDS, DHASH_BAND_BITS, tau, eager
    )
