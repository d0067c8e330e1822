"""Multimodal plumbing tests: real bytes over the Arrow boundary, the
stubbed decoder contract, and the mapInPandas plan shape."""

from __future__ import annotations

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
        decode_image_real(b"\x89PNG\r\n\x1a\n")


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
