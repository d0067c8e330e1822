"""Multimodal plumbing tests: real bytes over the Arrow boundary, the
stubbed decoder contract, and the mapInPandas plan shape."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline400_spark.operators.multimodal import (
    decode_image_real,
    extract_features,
    fake_features,
    media_from_documents,
    resize_media,
)


# (decode_image_real's contract is covered by the pillow-gated pair at
# the bottom of this file: loud NotImplementedError without pillow, a
# real dimension round-trip with it.)


def test_features_roundtrip_real_bytes(spark):
    rows = [(1, "image", b"abc"), (2, "video", bytes(range(100))), (3, "audio", b"")]
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {r.media_id: r for r in extract_features(media).collect()}
    assert got[1].byte_len == 3 and got[1].first_byte == ord("a")
    assert got[1].width == 3 % 64 + 16 and got[1].n_frames == 1
    assert got[2].byte_len == 100 and got[2].first_byte == 0
    assert got[2].n_frames == 100 % 30 + 1  # video frame-count branch
    assert got[3].byte_len == 0 and got[3].first_byte == 0
    # python-side reference agrees (the fake decode is the oracle's twin)
    assert fake_features(b"abc", "image") == (3, ord("a"), 19, 16, 1)


def test_media_payload_is_binary(spark):
    docs = spark.createDataFrame([(7, "hello world", "en", "s", 11)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    media = media_from_documents(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.collect()[0]
    assert bytes(row.payload) == b"hello world"
    assert row.media_type in ("image", "audio", "video")


def test_resize_center_crop(spark):
    import hashlib

    rows = [
        (1, "image", bytes(range(10))),   # n=10 → m=5, off=2 → bytes 2..6
        (2, "video", b"skip me"),          # filtered out before Python
        (3, "image", b""),                 # empty payload stays well-defined
    ]
    media = spark.createDataFrame(rows, "media_id long, media_type string, payload binary")
    got = {r.media_id: r for r in resize_media(media).collect()}
    assert set(got) == {1, 3}  # image-only predicate
    assert got[1].orig_len == 10 and got[1].new_len == 5
    assert got[1].resized_md5 == hashlib.md5(bytes(range(10))[2:7]).hexdigest()
    assert got[1].new_width == 5 % 64 + 16 and got[1].new_height == 16
    assert got[3].new_len == 0
    assert got[3].resized_md5 == hashlib.md5(b"").hexdigest()
    # the image predicate sits below the Python stage (prunes at the scan)
    plan = resize_media(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_plan_uses_arrow_batched_map(spark):
    docs = spark.createDataFrame([(1, "x", "en", "s", 1)],
                                 "doc_id long, text string, lang string, source string, n_chars long")
    plan = extract_features(media_from_documents(docs))._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time


def test_decode_image_real_without_pillow():
    """In codec-less environments the integration point must fail loudly
    (NotImplementedError), never silently return garbage."""
    try:
        import PIL  # noqa: F401
        pytest.skip("pillow installed; the real-decode test covers this")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        # GIF: no native header walk — genuinely needs a codec library
        decode_image_real(b"GIF89a" + bytes(20))


def test_decode_image_real_with_pillow():
    """Exercised wherever pillow exists (skipped in this sandbox): the
    real decoder must read back the exact dimensions of a generated
    image, proving the integration point works, not just exists."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (12, 7)).save(buf, format="PNG")
    meta = decode_image_real(buf.getvalue())
    assert (meta["width"], meta["height"]) == (12, 7)
    assert meta["format"] == "PNG"


# ---------------------------------------------------------------------------
# real PPM decode (dependency-free)
# ---------------------------------------------------------------------------

def _ppm(w, h, pixels, comment=None, maxval=255):
    c = f"# {comment}\n" if comment else ""
    return f"P6\n{c}{w} {h}\n{maxval}\n".encode() + bytes(pixels)


def test_parse_ppm_plain_and_comment_headers():
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_ppm

    px = list(range(2 * 3 * 3))  # 2x3 RGB
    assert parse_ppm(_ppm(2, 3, px)) == (2, 3, 255, sum(px))
    # netpbm allows # comments between any header tokens
    assert parse_ppm(_ppm(2, 3, px, comment="made by a test")) == (2, 3, 255, sum(px))
    # arbitrary whitespace separating header fields
    weird = b"P6  \t\n2\n# mid-header comment\n 3\t255 " + bytes(px)
    assert parse_ppm(weird) == (2, 3, 255, sum(px))


def test_parse_ppm_rejects_bad_payloads():
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_ppm

    with pytest.raises(ValueError, match="P6"):
        parse_ppm(b"P3\n1 1\n255\n000")  # ASCII PPM is not the raw format
    with pytest.raises(ValueError, match="truncated PPM pixel"):
        parse_ppm(_ppm(4, 4, range(10)))  # 48 bytes promised, 10 shipped
    with pytest.raises(ValueError, match="16-bit"):
        parse_ppm(_ppm(1, 1, [0, 0, 0, 0, 0, 0], maxval=65535))
    with pytest.raises(ValueError):
        parse_ppm(b"P6\n0 5\n255\n")  # zero width is out of spec


def test_decode_ppm_features_spark_roundtrip(spark):
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        decode_ppm_features,
    )

    px1 = [7] * (3 * 4 * 2)           # 4x2, all-sevens
    px2 = list(range(3 * 1 * 1))      # 1x1
    media = spark.createDataFrame(
        [(10, _ppm(4, 2, px1)), (11, _ppm(1, 1, px2, comment="c"))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in decode_ppm_features(media).collect()}
    assert (got[10].width, got[10].height, got[10].maxval) == (4, 2, 255)
    assert got[10].pixel_sum == sum(px1)
    assert got[10].pixel_mean == sum(px1) / (3.0 * 4 * 2)
    assert got[11].pixel_sum == sum(px2)
    plan = decode_ppm_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time


def test_decode_image_real_handles_ppm_without_pillow():
    """P6 decoding no longer needs pillow: the integration point decodes
    it natively and only falls back to pillow for compressed formats."""
    meta = decode_image_real(_ppm(5, 4, [0] * (3 * 5 * 4)))
    assert (meta["width"], meta["height"]) == (5, 4)
    assert meta["format"] == "PPM"


def test_media_ppm_fixture_payloads_decode_exactly():
    """The generator's closed-form construction and the real parser must
    agree byte-for-byte — the same invariant the driver oracle checks."""
    from pinterest_data_pipeline400_spark.generator import media_ppm
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_ppm

    pdf = media_ppm(25)
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        w, h, maxval, s = parse_ppm(bytes(payload))
        assert (w, h, maxval) == (mid % 13 + 4, mid % 7 + 3, 255)
        assert s == sum((mid * 31 + i * 7) % 256 for i in range(3 * w * h))


def test_parse_ppm_property_roundtrip():
    """Property: any synthesized header layout (whitespace runs, comment
    placement) + any pixel bytes parse back to the exact construction
    parameters and pixel sum."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pinterest_data_pipeline400_spark.operators.multimodal import parse_ppm

    ws = st.text(alphabet=" \t\n\r", min_size=1, max_size=3)

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 20),
        h=st.integers(1, 20),
        seed=st.integers(0, 2**31),
        ws1=ws, ws2=ws, ws3=ws,
        comment=st.one_of(st.none(), st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                   exclude_characters="\n"),
            max_size=12)),
    )
    def check(w, h, seed, ws1, ws2, ws3, comment):
        import numpy as np

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=3 * w * h, dtype=np.uint8)
        c = f"#{comment}\n" if comment is not None else ""
        header = f"P6{ws1}{c}{w}{ws2}{h}{ws3}255\n".encode()
        got = parse_ppm(header + px.tobytes())
        assert got == (w, h, 255, int(px.sum(dtype=np.int64)))

    check()


# ---------------------------------------------------------------------------
# WAV (RIFF/PCM16) — the real audio decode verb
# ---------------------------------------------------------------------------


def _wav(channels, sample_rate, samples, extra_chunk=None):
    """Build a minimal valid RIFF/WAVE PCM16 payload for tests."""
    import struct

    import numpy as np

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        cid, body = extra_chunk
        chunks += cid + struct.pack("<I", len(body)) + body + b"\x00" * (len(body) % 2)
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_wav_basic_and_chunk_skip():
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_wav

    samples = [100, -200, 300, -400, 500, -600]
    assert parse_wav(_wav(2, 16000, samples)) == (2, 16000, 3, sum(samples))
    # unknown chunk (odd-sized body → pad byte) between fmt and data
    got = parse_wav(_wav(1, 8000, samples, extra_chunk=(b"LIST", b"INFOjunk!")))
    assert got == (1, 8000, 6, sum(samples))


def test_parse_wav_rejects_bad_payloads():
    import struct

    from pinterest_data_pipeline400_spark.operators.multimodal import parse_wav

    good = _wav(2, 8000, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        parse_wav(b"RIFX" + good[4:])        # wrong container magic
    with pytest.raises(ValueError):
        parse_wav(good[:-2])                 # truncated sample data
    with pytest.raises(ValueError):
        parse_wav(_wav(2, 8000, [1, 2, 3]))  # not frame-aligned for stereo
    # float PCM (format 3) must be rejected, not mis-summed
    bad_fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        parse_wav(payload)
    with pytest.raises(ValueError):  # data chunk with no fmt chunk first
        parse_wav(
            b"RIFF" + struct.pack("<I", 4 + 8 + 4) + b"WAVE"
            + b"data" + struct.pack("<I", 4) + b"\x01\x00\x02\x00"
        )


def test_media_wav_fixture_payloads_decode_exactly():
    """The generator's closed-form construction and the real parser must
    agree byte-for-byte — the same invariant the driver oracle checks."""
    from pinterest_data_pipeline400_spark.generator import media_wav
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_wav

    pdf = media_wav(25)
    for mid, payload in zip(pdf["media_id"], pdf["payload"]):
        c, sr, frames, s = parse_wav(bytes(payload))
        assert (c, sr, frames) == (mid % 2 + 1, 8000 * (mid % 3 + 1), mid % 50 + 20)
        assert s == sum((mid * 37 + i * 11) % 4096 - 2048 for i in range(frames * c))


def test_decode_wav_features_spark_roundtrip(spark):
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        decode_wav_features,
    )

    s1 = [10, 20, -30, 40]
    s2 = [1000, -1000]
    media = spark.createDataFrame(
        [(0, _wav(2, 16000, s1)), (1, _wav(1, 8000, s2, (b"LIST", b"INFOx")))],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in decode_wav_features(media).collect()}
    assert (got[0].channels, got[0].sample_rate, got[0].n_frames) == (2, 16000, 2)
    assert got[0].sample_sum == sum(s1)
    assert got[0].duration_s == 2 / 16000
    assert got[1].sample_sum == sum(s2)
    plan = decode_wav_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # Arrow-batched, not row-at-a-time


def test_parse_wav_property_roundtrip():
    """Property: any channel/rate/sample construction (with or without a
    junk chunk in any legal position) parses back exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from pinterest_data_pipeline400_spark.operators.multimodal import parse_wav

    @settings(max_examples=200, deadline=None)
    @given(
        channels=st.integers(1, 4),
        rate=st.sampled_from([8000, 16000, 22050, 44100]),
        frames=st.integers(1, 64),
        seed=st.integers(0, 2**31),
        junk=st.one_of(st.none(), st.binary(max_size=9)),
    )
    def check(channels, rate, frames, seed, junk):
        import numpy as np

        rng = np.random.default_rng(seed)
        samples = rng.integers(-(2**15), 2**15, size=frames * channels)
        extra = (b"JUNK", junk) if junk is not None else None
        got = parse_wav(_wav(channels, rate, samples, extra_chunk=extra))
        assert got == (channels, rate, frames, int(samples.sum()))

    check()


# ---------------------------------------------------------------------------
# real JPEG header decode (dependency-free marker walk)
# ---------------------------------------------------------------------------

def _jpeg_header(w, h, ncomp=3, progressive=False):
    """A closed-form minimal JPEG prefix: SOI + APP0 (JFIF) + SOF with
    the given frame dims — exactly what the marker walk consumes; no
    entropy data needed because parse_jpeg_dims never reads past SOF."""
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00\x01\x02\x00" + bytes(6)
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    body += bytes(3 * ncomp)  # per-component specs (ignored by the walk)
    sof = sof_marker + (2 + len(body)).to_bytes(2, "big") + body
    return b"\xff\xd8" + app0 + sof


def test_parse_jpeg_dims_marker_walk():
    """Codec-free JPEG metadata: baseline and progressive SOF variants,
    grayscale and RGB component counts, and loud failures on non-JPEG
    or truncated-before-SOF payloads."""
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_dims,
    )

    assert parse_jpeg_dims(_jpeg_header(640, 480)) == (640, 480, 3)
    assert parse_jpeg_dims(_jpeg_header(31, 7, ncomp=1, progressive=True)) == (
        31, 7, 1,
    )
    meta = decode_image_real(_jpeg_header(12, 34))
    assert (meta["width"], meta["height"], meta["mode"], meta["format"]) == (
        12, 34, "RGB", "JPEG",
    )
    with pytest.raises(ValueError):
        parse_jpeg_dims(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        # SOS before any SOF: dims are unrecoverable without a codec
        parse_jpeg_dims(b"\xff\xd8" + b"\xff\xda" + (2).to_bytes(2, "big"))
    with pytest.raises(ValueError):
        # truncated INSIDE the SOF body (ADVICE r8): must raise the
        # documented ValueError, not IndexError from payload[i + 9]
        parse_jpeg_dims(_jpeg_header(640, 480)[:-12])
    with pytest.raises(ValueError):
        # corrupt zero segment length (ADVICE r8): reject explicitly
        # instead of silently advancing 2 bytes and misreading what
        # follows as markers
        parse_jpeg_dims(b"\xff\xd8" + b"\xff\xe0" + (0).to_bytes(2, "big") + bytes(8))


def test_jpeg_native_walk_agrees_with_pillow():
    """Wherever pillow exists, a REAL encoded JPEG must yield identical
    dimensions from the dependency-free marker walk and from pillow —
    the closed-form oracle for the compressed-format path (skipped in
    codec-less sandboxes; lights up the moment pillow lands)."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_dims,
    )

    buf = io.BytesIO()
    Image.new("RGB", (23, 11)).save(buf, format="JPEG")
    payload = buf.getvalue()
    assert parse_jpeg_dims(payload)[:2] == (23, 11)
    meta = decode_image_real(payload)
    assert (meta["width"], meta["height"], meta["format"]) == (23, 11, "JPEG")


def test_parse_png_dims_ihdr():
    """PNG IHDR fixed-offset read: dims and color-type for RGB and
    grayscale headers, loud failures on bad signature / IHDR order."""
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_png_dims,
    )

    def png(w, h, ct):
        ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, ct, 0, 0, 0])
        return (
            b"\x89PNG\r\n\x1a\n"
            + (13).to_bytes(4, "big")
            + b"IHDR"
            + ihdr
            + bytes(4)  # crc (unchecked)
        )

    assert parse_png_dims(png(640, 480, 2)) == (640, 480, 2)
    meta = decode_image_real(png(31, 7, 0))
    assert (meta["width"], meta["height"], meta["mode"], meta["format"]) == (
        31, 7, "L", "PNG",
    )
    with pytest.raises(ValueError):
        parse_png_dims(b"\xff\xd8 not a png")
    with pytest.raises(ValueError):
        parse_png_dims(b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IDAT")


def test_png_native_walk_agrees_with_pillow():
    """Wherever pillow exists, a REAL encoded PNG must yield identical
    dimensions from the fixed-offset IHDR read and from pillow."""
    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_png_dims,
    )

    buf = io.BytesIO()
    Image.new("RGB", (23, 11)).save(buf, format="PNG")
    assert parse_png_dims(buf.getvalue())[:2] == (23, 11)


def _hand_png(w, h, scanlines, ihdr_override=None):
    """Byte-level PNG builder INDEPENDENT of the generator's encoder:
    scanlines are pre-filtered (filter byte + w*3 filtered bytes per
    row, supplied by the test), so the decoder is checked against
    hand-computed spec arithmetic, not against our own encoder."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = ihdr_override or struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    body = zlib.compress(b"".join(scanlines))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body)
        + chunk(b"IEND", b"")
    )


def test_parse_png_unfilters_all_five_filters_hand_vector():
    """Decoder vs HAND-COMPUTED spec arithmetic (RFC 2083 §6) on a
    2x5 RGB image exercising every filter type once — independent of
    the fixture encoder, so an encoder/decoder shared bug cannot
    cancel out."""
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        _parse_png_full,
    )

    # row0, filter 0 (None): recon = filt
    r0 = bytes([0, 10, 20, 30, 40, 50, 60])
    # row1, filter 1 (Sub): recon[x] = filt + recon[x-3]
    #   filt = [5,5,5, 7,7,7] → recon = [5,5,5, 12,12,12]
    r1 = bytes([1, 5, 5, 5, 7, 7, 7])
    # row2, filter 2 (Up): recon = filt + above
    #   filt = [1,2,3, 4,5,6] → recon = [6,7,8, 16,17,18]
    r2 = bytes([2, 1, 2, 3, 4, 5, 6])
    # row3, filter 3 (Average): recon[x] = filt + (left + above)//2
    #   x0..2: left=0, above=[6,7,8]   → pred [3,3,4]  → recon [13,23,34]
    #   x3..5: left=[13,23,34], above=[16,17,18] → pred [14,20,26]
    #          filt [100,200,250] → recon [114,220,(250+26)%256=20]
    r3 = bytes([3, 10, 20, 30, 100, 200, 250])
    # row4, filter 4 (Paeth): pred = paeth(left, above, upleft)
    #   x0..2: a=0,c=0,b=above → pred=b=[13,23,34]   (p=b, pb=0)
    #          filt [1,1,1] → recon [14,24,35]
    #   x3..5: a=[14,24,35], b=[114,220,20], c=[13,23,34]
    #     x3: p=14+114-13=115, pa=101,pb=1,pc=102 → pred=b=114; 2+114=116
    #     x4: p=24+220-23=221, pa=197,pb=1,pc=198 → pred=b=220; 3+220=223
    #     x5: p=35+20-34=21,   pa=14, pb=1, pc=13 → pb<=pc → pred=b=20
    #         4+20=24
    r4 = bytes([4, 1, 1, 1, 2, 3, 4])
    payload = _hand_png(2, 5, [r0, r1, r2, r3, r4])
    w, h, depth, s, samples = _parse_png_full(payload)
    expected = [
        10, 20, 30, 40, 50, 60,
        5, 5, 5, 12, 12, 12,
        6, 7, 8, 16, 17, 18,
        13, 23, 34, 114, 220, 20,
        14, 24, 35, 116, 223, 24,
    ]
    assert (w, h, depth) == (2, 5, 8)
    assert list(samples) == expected
    assert s == sum(expected)


def test_parse_png_rejects_bad_payloads():
    """Loud ValueError on every malformed-input class: signature, CRC,
    zlib corruption, scanline-size mismatch, undefined filter,
    out-of-scope IHDR (grayscale, 16-bit, interlaced)."""
    import struct

    from pinterest_data_pipeline400_spark.generator import media_png
    from pinterest_data_pipeline400_spark.operators.multimodal import parse_png

    good = bytes(media_png(5).payload[1])
    with pytest.raises(ValueError, match="signature"):
        parse_png(b"JFIF" + good)
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip one IDAT byte → chunk CRC must catch it
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(corrupt))
    with pytest.raises(ValueError, match="scanline"):
        # valid zlib, wrong payload size for the declared dims
        parse_png(_hand_png(2, 2, [bytes([0, 1, 2, 3])]))
    with pytest.raises(ValueError, match="filter type"):
        parse_png(_hand_png(1, 1, [bytes([9, 1, 2, 3])]))
    for depth, ctype, inter in [(8, 0, 0), (16, 2, 0), (8, 2, 1)]:
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ctype, inter and 0 or 0, 0, inter)
        with pytest.raises(ValueError):
            parse_png(_hand_png(1, 1, [bytes([0, 1, 2, 3])], ihdr_override=ihdr))


def test_media_png_fixture_payloads_decode_exactly():
    """Fixture↔decoder↔closed-form triangle: every generated PNG must
    decode back to the exact closed-form pixel stream the oracle SQL
    recomputes (covers all five filters via the per-row cycle and the
    split-IDAT branch via mid % 3)."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import media_png
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        _parse_png_full,
    )

    df = media_png(20)
    for mid, payload in zip(df.media_id, df.payload):
        w_exp, h_exp = mid % 13 + 4, mid % 7 + 3
        px = ((mid * 31 + 7 * np.arange(3 * w_exp * h_exp)) % 256).astype(
            np.uint8
        )
        w, h, depth, s, samples = _parse_png_full(bytes(payload))
        assert (w, h, depth) == (w_exp, h_exp, 8)
        assert np.array_equal(samples, px)
        assert s == int(px.sum())
        # the split-IDAT branch really produces two IDAT chunks
        assert bytes(payload).count(b"IDAT") == (2 if mid % 3 == 0 else 1)


def test_parse_png_agrees_with_pillow():
    """Wherever pillow exists, the dependency-free decode must produce
    pixel-identical output for a pillow-encoded RGB PNG (and our
    encoder's output must decode identically under pillow)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from pinterest_data_pipeline400_spark.generator import media_png
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        _parse_png_full,
    )

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(11, 23, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(px, "RGB").save(buf, format="PNG")
    w, h, _d, _s, samples = _parse_png_full(buf.getvalue())
    assert (w, h) == (23, 11)
    assert np.array_equal(samples.reshape(11, 23, 3), px)
    ours = bytes(media_png(4).payload[3])
    with Image.open(io.BytesIO(ours)) as img:
        theirs = np.asarray(img.convert("RGB"))
    _, _, _, _, mine = _parse_png_full(ours)
    assert np.array_equal(mine, theirs.reshape(-1))


def test_decode_png_features_spark_roundtrip(spark):
    """Arrow-batched PNG decode through the registered operator shape:
    values equal the closed form, plan stays exchange-free."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import media_png
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        decode_png_features,
    )

    pdf = media_png(12)
    media = spark.createDataFrame(pdf)
    out = decode_png_features(media).orderBy("media_id").collect()
    assert len(out) == 12
    for row in out:
        mid = row.media_id
        w_exp, h_exp = mid % 13 + 4, mid % 7 + 3
        px = ((mid * 31 + 7 * np.arange(3 * w_exp * h_exp)) % 256).astype(
            np.int64
        )
        assert (row.width, row.height, row.bit_depth) == (w_exp, h_exp, 8)
        assert row.pixel_sum == int(px.sum())
    plan = decode_png_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # embarrassingly parallel: no shuffle


def _jpeg_expected_rgb(mid):
    """Test-local closed-form decode of a media_jpeg fixture payload —
    the same arithmetic the DuckDB oracle runs (fixed-point color
    shifts, ±ac pattern), implemented independently of both the
    encoder and the decoder."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import (
        jpeg_ac,
        jpeg_chroma,
        jpeg_dims,
        jpeg_luma,
    )

    w, h, _sub = jpeg_dims(mid)
    cb, cr = jpeg_chroma(mid)
    d_r = ((91881 * (cr - 128) + 32768 + (1 << 24)) >> 16) - 256
    d_g = ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768 + (1 << 25)) >> 16) - 512
    d_b = ((116131 * (cb - 128) + 32768 + (1 << 25)) >> 16) - 512
    pat = np.array([1, -1, -1, 1, 1, -1, -1, 1])
    exp = np.zeros((h, w, 3), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            ys = jpeg_luma(mid, bx, by) + jpeg_ac(mid, bx, by) * np.tile(
                pat, (8, 1)
            )
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 0] = ys + d_r
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 1] = ys - d_g
            exp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8, 2] = ys + d_b
    return exp


def test_parse_jpeg_baseline_hand_vector():
    """Decoder vs HAND-ASSEMBLED T.81 bitstream: one 8x8 4:4:4 MCU
    whose entropy bits are written out (code, length) pair by pair from
    the spec's canonical-huffman and EXTEND rules, with a NON-flat
    quant table and two nonzero AC coefficients at different runs. The
    expected pixels come from a test-local IDCT matrix and test-local
    fixed-point color convert — independent of generator AND decoder,
    so a shared encoder/decoder bug cannot cancel."""
    import struct

    import numpy as np

    from pinterest_data_pipeline400_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        parse_jpeg_baseline,
    )

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    # quant table: q[k] = k + 1 in zigzag order (so dequant matters)
    qt = bytes(range(1, 65))
    dqt = seg(0xDB, bytes([0x00]) + qt)
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    # DC table = Annex K luminance; AC table: EOB=0x00 len1 '0',
    # 0x02 (run0,size2) len2 '10', 0x32 (run3,size2) len2 '11'
    dc_bits = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    dc_vals = bytes(range(12))
    ac_bits = bytes([1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0])
    ac_vals = bytes([0x00, 0x02, 0x32])
    dht = seg(0xC4, bytes([0x00]) + dc_bits + dc_vals) + seg(
        0xC4, bytes([0x10]) + ac_bits + ac_vals
    )
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    # hand-derived canonical codes (T.81 C.2):
    #   DC: cat0='00', cat3='100', cat4='101', cat5='110'
    #   AC: EOB='0', 0x02='10', 0x32='11'
    # Y : DC diff +5 (cat3 '100' + bits '101'), AC zz1 = -3
    #     (0x02 '10' + EXTEND bits '00'), AC zz5 = +2 after run 3
    #     (0x32 '11' + bits '10'), EOB '0'
    # Cb: DC diff +16 (cat5 '110' + '10000'), EOB '0'
    # Cr: DC diff -8  (cat4 '101' + '0111'), EOB '0'
    hand_bits = [
        (0b100, 3), (0b101, 3), (0b10, 2), (0b00, 2), (0b11, 2),
        (0b10, 2), (0b0, 1),
        (0b110, 3), (0b10000, 5), (0b0, 1),
        (0b101, 3), (0b0111, 4), (0b0, 1),
    ]
    acc, nbits = 0, 0
    for code, ln in hand_bits:
        acc = (acc << ln) | code
        nbits += ln
    pad = (8 - nbits % 8) % 8
    acc = (acc << pad) | ((1 << pad) - 1)
    nbits += pad
    entropy = acc.to_bytes(nbits // 8, "big")
    assert b"\xff" not in entropy  # no stuffing needed for this vector
    payload = b"\xff\xd8" + dqt + sof + dht + sos + entropy + b"\xff\xd9"

    rgb, samp = parse_jpeg_baseline(payload)
    assert samp == "4:4:4"

    # independent recompute: dequantized coefficients -> IDCT -> color
    q = list(range(1, 65))
    fy = np.zeros(64)
    fy[_JPEG_ZIGZAG[0]] = 5 * q[0]
    fy[_JPEG_ZIGZAG[1]] = -3 * q[1]
    fy[_JPEG_ZIGZAG[5]] = 2 * q[5]
    fcb = np.zeros(64)
    fcb[0] = 16 * q[0]
    fcr = np.zeros(64)
    fcr[0] = -8 * q[0]
    u = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    a = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    a[0, :] /= np.sqrt(2)
    def decode_plane(f):
        return np.clip(
            np.round(a.T @ f.reshape(8, 8) @ a) + 128, 0, 255
        ).astype(np.int64)
    y, cb, cr = decode_plane(fy), decode_plane(fcb), decode_plane(fcr)
    r = y + ((91881 * (cr - 128) + 32768 + (1 << 24)) >> 16) - 256
    g = y - (
        (22554 * (cb - 128) + 46802 * (cr - 128) + 32768 + (1 << 25)) >> 16
    ) + 512
    b = y + ((116131 * (cb - 128) + 32768 + (1 << 25)) >> 16) - 512
    exp = np.clip(np.stack([r, g, b], axis=-1), 0, 255)
    assert np.array_equal(rgb.astype(np.int64), exp)


def test_media_jpeg_fixture_payloads_decode_exactly():
    """Fixture↔decoder↔closed-form triangle (the media_png
    discipline): every generated baseline JPEG — 4:2:0 and 4:4:4,
    custom DHT, planted AC — must decode to the exact closed-form
    pixel array the oracle SQL recomputes."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import jpeg_dims, media_jpeg
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_baseline,
    )

    df = media_jpeg(24)
    for mid, payload in zip(df.media_id, df.payload):
        w, h, sub420 = jpeg_dims(mid)
        rgb, samp = parse_jpeg_baseline(bytes(payload))
        assert rgb.shape == (h, w, 3)
        assert samp == ("4:2:0" if sub420 else "4:4:4")
        assert np.array_equal(rgb.astype(np.int64), _jpeg_expected_rgb(mid))


def test_parse_jpeg_baseline_restart_markers():
    """DRI/RSTn: a hand-built two-MCU scan with restart interval 1
    must byte-align at the marker, reset the DC prediction, and still
    decode both blocks (T.81 F.2.1.3.1) — the second block's DC is
    coded as a FULL value again, not a diff."""
    import struct

    import numpy as np

    from pinterest_data_pipeline400_spark.generator import (
        _JPEG_AC_BITS,
        _JPEG_AC_VALS,
        _JPEG_DC_BITS,
        _JPEG_DC_VALS,
        _jpeg_huff_codes,
        _JpegBitWriter,
    )
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_baseline,
    )

    def seg(marker, body):
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    qt = bytes([8] * 64)
    head = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x00]) + qt)
        + seg(0xDD, struct.pack(">H", 1))  # DRI: restart every MCU
        + seg(0xC0, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    dc_huff = _jpeg_huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_huff = _jpeg_huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    def block_bits(dc_diff):
        wr = _JpegBitWriter()
        s = abs(dc_diff).bit_length() if dc_diff else 0
        wr.put(*dc_huff[s])
        if s:
            wr.put(dc_diff if dc_diff >= 0 else dc_diff + (1 << s) - 1, s)
        wr.put(*ac_huff[0x00])
        return wr.flush()

    # block 0: DC 40 (diff from 0); RST0; block 1: DC -20 coded as a
    # full value (pred was reset) — a decoder that fails to reset
    # predicts 40-20=20 instead
    payload = (
        head + block_bits(40) + b"\xff\xd0" + block_bits(-20) + b"\xff\xd9"
    )
    rgb, samp = parse_jpeg_baseline(payload)
    assert samp == "gray"
    assert rgb.shape == (8, 16, 3)
    assert np.all(rgb[:, :8] == 40 + 128)
    assert np.all(rgb[:, 8:] == -20 + 128)


def test_parse_jpeg_baseline_rejects_bad_payloads():
    """Loud ValueError per malformed-input class: missing SOI,
    progressive SOF, missing huffman tables, truncated entropy data,
    corrupt segment length."""
    from pinterest_data_pipeline400_spark.generator import media_jpeg
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_baseline,
    )

    good = bytearray(bytes(media_jpeg(2).payload[1]))
    with pytest.raises(ValueError, match="SOI"):
        parse_jpeg_baseline(b"\x89PNG" + bytes(good))
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2  # baseline -> progressive
    with pytest.raises(ValueError, match="baseline"):
        parse_jpeg_baseline(bytes(prog))
    nodht = bytearray(good)
    # surgically remove every DHT segment -> SOS references missing tables
    while True:
        j = nodht.find(b"\xff\xc4")
        if j < 0:
            break
        seglen = int.from_bytes(nodht[j + 2 : j + 4], "big")
        del nodht[j : j + 2 + seglen]
    with pytest.raises(ValueError, match="huffman"):
        parse_jpeg_baseline(bytes(nodht))
    with pytest.raises(ValueError, match="truncated|marker"):
        # drop the EOI plus the tail of the entropy data
        parse_jpeg_baseline(bytes(good[:-4]))
    badlen = bytearray(good)
    j = badlen.index(b"\xff\xdb")
    badlen[j + 2 : j + 4] = (1).to_bytes(2, "big")
    with pytest.raises(ValueError, match="segment length"):
        parse_jpeg_baseline(bytes(badlen))


def test_parse_jpeg_baseline_agrees_with_pillow():
    """Wherever pillow exists, libjpeg's decode of our fixture files
    must agree with ours within a small tolerance (T.81 leaves IDCT
    and color-convert precision implementation-defined, so exact
    equality is not required — but real structural agreement is)."""
    pytest.importorskip("PIL")
    import io

    import numpy as np
    from PIL import Image

    from pinterest_data_pipeline400_spark.generator import media_jpeg
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_jpeg_baseline,
    )

    df = media_jpeg(6)
    for mid, payload in zip(df.media_id, df.payload):
        with Image.open(io.BytesIO(bytes(payload))) as img:
            theirs = np.asarray(img.convert("RGB")).astype(np.int64)
        ours, _ = parse_jpeg_baseline(bytes(payload))
        assert theirs.shape == ours.shape
        assert np.abs(theirs - ours.astype(np.int64)).max() <= 3


def test_decode_jpeg_features_spark_roundtrip(spark):
    """Arrow-batched JPEG decode through the registered operator
    shape: per-image features equal the closed form (sum AND square
    sum), and the mapInPandas stage itself is shuffle-free."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import media_jpeg
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        decode_jpeg_features,
    )

    pdf = media_jpeg(14)
    media = spark.createDataFrame(pdf)
    out = decode_jpeg_features(media).orderBy("media_id").collect()
    assert len(out) == 14
    for row in out:
        exp = _jpeg_expected_rgb(row.media_id)
        assert (row.height, row.width) == exp.shape[:2]
        assert row.pixel_sum == int(exp.sum())
        assert row.pixel_sq_sum == int((exp * exp).sum())
        assert row.pixel_mean == row.pixel_sum / (3.0 * row.width * row.height)
    plan = decode_jpeg_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_parse_flac_streaminfo_bitfields():
    """FLAC STREAMINFO bit-shifting: a hand-built header with known
    rate/channels/bits/total must round-trip exactly."""
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        parse_flac_streaminfo,
    )

    rate, channels, bits, total = 44100, 2, 16, 1_234_567
    b10 = rate >> 12
    b11 = (rate >> 4) & 0xFF
    b12 = ((rate & 0x0F) << 4) | ((channels - 1) << 1) | ((bits - 1) >> 4)
    b13 = (((bits - 1) & 0x0F) << 4) | ((total >> 32) & 0x0F)
    body = bytes(10) + bytes([b10, b11, b12, b13]) + (total & 0xFFFFFFFF).to_bytes(
        4, "big"
    ) + bytes(16)
    payload = b"fLaC" + bytes([0]) + (34).to_bytes(3, "big") + body
    meta = parse_flac_streaminfo(payload)
    assert meta == {
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "total_samples": total,
    }
    with pytest.raises(ValueError):
        parse_flac_streaminfo(b"RIFF not flac")


def test_image_neardup_matches_numpy_bruteforce(spark):
    """Independent recompute of the perceptual-hash dedup (the
    shared-bug-passes-oracle mitigation): payloads re-parsed with a
    REGEX header reader (not the engine's byte-walk), dHashes rebuilt
    with independent numpy indexing, pairs brute-forced over all
    combinations — compared EXACTLY against the registered banded-join
    entry, plus the recall row."""
    import re

    import numpy as np

    from pinterest_data_pipeline400_spark.generator import fixture_dir_for
    from pinterest_data_pipeline400_spark.plans import media_queries as mq
    from tests.conftest import TEST_SF_DIR

    fx = fixture_dir_for(TEST_SF_DIR)
    pdf = pd.read_parquet(os.path.join(fx, "media_ppm_dup.parquet"))

    def hash_payload(payload: bytes) -> int:
        m = re.match(rb"P6\n(?:#[^\n]*\n)?(\d+) (\d+)\n255\n", payload)
        assert m, "unexpected fixture header shape"
        w, h = int(m.group(1)), int(m.group(2))
        px = np.frombuffer(payload[m.end():], dtype=np.uint8).astype(np.int64)
        assert px.size == 3 * w * h
        gray = px.reshape(h, w, 3).sum(axis=2)
        g = gray[np.ix_((np.arange(8) * h) // 8, (np.arange(8) * w) // 8)]
        bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)
        wt = 1 << (np.arange(8)[:, None] * 7 + np.arange(7)[None, :])
        return int((bits * wt).sum())

    hashes = {int(r.media_id): hash_payload(bytes(r.payload)) for r in pdf.itertuples()}
    ids = sorted(hashes)
    expected = {
        (a, b): bin(hashes[a] ^ hashes[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(hashes[a] ^ hashes[b]).count("1") <= 3
    }
    out = mq.multimodal_image_neardup(spark, TEST_SF_DIR).toPandas()
    got = {
        (int(r.media_a), int(r.media_b)): int(r.hamming) for r in out.itertuples()
    }
    assert got == expected

    planted = pdf[pdf.provenance != "base"]
    n_found = sum(
        1 for r in planted.itertuples() if (int(r.src_id), int(r.media_id)) in expected
    )
    rec = mq.multimodal_image_neardup_recall(spark, TEST_SF_DIR).toPandas()
    assert int(rec.n_planted.iloc[0]) == len(planted)
    assert int(rec.n_found.iloc[0]) == n_found
    assert rec.recall.iloc[0] == round(n_found / len(planted), 6)
    # the fixture is designed separable: the gauge should read ~1.0
    assert rec.recall.iloc[0] >= 0.95


def test_image_neardup_plan_is_banded_join(spark):
    """Scale contract for the perceptual-hash dedup: candidate
    generation must be the banded equi-join — never a cartesian
    product — and the Python boundary is a single Arrow mapInPandas
    stage (decode+hash), exchange-free before the band shuffle."""
    from pinterest_data_pipeline400_spark.generator import fixture_dir_for
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        dhash_near_dup_pairs,
    )
    from tests.conftest import TEST_SF_DIR

    fx = fixture_dir_for(TEST_SF_DIR)
    media = spark.read.parquet(os.path.join(fx, "media_ppm_dup.parquet"))
    plan = (
        dhash_near_dup_pairs(media, eager=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    # the decode+hash frame is persisted: both sides of the band
    # self-join read the cache (the plan text inlines the cached
    # lineage per alias, but only one Python stage executes)
    assert plan.count("InMemoryTableScan") >= 2


def test_ahash_wav_matches_closed_form_recompute():
    """Independent recompute of the audio fingerprint (the
    shared-bug-passes-oracle mitigation): build the WAV payload, run
    the REAL byte-walk decode + fingerprint, and compare against bits
    derived straight from the generator's closed form (hashlib md5
    envelope, integer magnitudes) without touching the payload."""
    import numpy as np

    from pinterest_data_pipeline400_spark.generator import (
        WAV_DUP_GAINS,
        WAV_DUP_NFRAMES,
        _wav_dup_env,
        _wav_dup_samples,
        _wav_payload,
    )
    from pinterest_data_pipeline400_spark.operators.multimodal import ahash_wav

    for src in range(25):
        for gnum, gden in [(1, 1)] + WAV_DUP_GAINS:
            payload = _wav_payload(_wav_dup_samples(src, gnum, gden))
            got = ahash_wav(payload)
            # closed form: e_f = sum over frame of (gnum*env*tone)//gden
            L = src % 9 + 8
            want = 0
            es = []
            for f in range(WAV_DUP_NFRAMES):
                env = _wav_dup_env(src, f)
                e = sum(
                    (gnum * env * ((src * 37 + 11 * i) % 64 + 1)) // gden
                    for i in range(f * L, (f + 1) * L)
                )
                es.append(e)
            for f in range(WAV_DUP_NFRAMES - 1):
                if es[f + 1] > es[f]:
                    want |= 1 << f
            assert got == want, (src, gnum, gden)


def test_ahash_margins_and_volume_invariance():
    """Fingerprint contract: planted volume-scaled dups land within
    Hamming 1 (inside the tau=3 banded verify), unrelated sources sit
    far outside it (background minimum ~11, mean ~28 of 56)."""
    from pinterest_data_pipeline400_spark.generator import (
        WAV_DUP_GAINS,
        _wav_dup_samples,
        _wav_payload,
    )
    from pinterest_data_pipeline400_spark.operators.multimodal import ahash_wav

    base = [ahash_wav(_wav_payload(_wav_dup_samples(s, 1, 1))) for s in range(60)]
    for s in range(60):
        for gnum, gden in WAV_DUP_GAINS:
            d = ahash_wav(_wav_payload(_wav_dup_samples(s, gnum, gden)))
            assert bin(base[s] ^ d).count("1") <= 1, (s, gnum, gden)
    bg = [
        bin(base[a] ^ base[b]).count("1")
        for a in range(60)
        for b in range(a + 1, 60)
    ]
    assert min(bg) > 6, min(bg)


def test_audio_neardup_plan_is_banded_join(spark):
    """Scale contract for the audio-fingerprint dedup: banded equi-join
    candidates (never cartesian), one Arrow mapInPandas decode stage."""
    from pinterest_data_pipeline400_spark.generator import fixture_dir_for
    from pinterest_data_pipeline400_spark.operators.multimodal import (
        ahash_near_dup_pairs,
    )
    from tests.conftest import TEST_SF_DIR

    fx = fixture_dir_for(TEST_SF_DIR)
    media = spark.read.parquet(os.path.join(fx, "media_wav_dup.parquet"))
    plan = (
        ahash_near_dup_pairs(media, eager=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "MapInPandas" in plan
    assert plan.count("InMemoryTableScan") >= 2


def test_audio_neardup_recall_is_perfect(spark):
    """All planted volume-dups found at sf test scale (they sit at
    Hamming 0-1, pigeonhole-guaranteed a shared band at tau=3)."""
    from pinterest_data_pipeline400_spark.plans import media_queries as mq
    from tests.conftest import TEST_SF_DIR

    out = mq.multimodal_audio_neardup_recall(spark, TEST_SF_DIR).toPandas()
    assert len(out) == 1
    assert out.recall.iloc[0] == 1.0
    assert out.n_planted.iloc[0] > 0
