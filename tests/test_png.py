"""Pure-Python PNG codec + decoded-pixel pipeline: roundtrip across all
five scanline filters and pixel formats, spec-level error gates, and the
mapInPandas pixel_features path (decode-skip on corrupt payloads)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators import multimodal as MM
from searchengine_spark.pycore.png import decode_png, encode_png


def _img(h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    shape = (h, w) if c == 1 else (h, w, c)
    return rng.randint(0, 256, size=shape, dtype=np.uint8).astype(np.uint8)


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_roundtrip_all_filters(channels):
    """Each row encoded with a different filter (y % 5) → decode must
    invert Sub/Up/Average/Paeth/None all in one image."""
    img = _img(11, 7, channels, seed=channels)
    data = encode_png(img, filter_for_row=lambda y: y % 5)
    out = decode_png(data)
    assert out.dtype == np.uint8
    assert out.shape == img.shape
    assert np.array_equal(out, img)


def test_roundtrip_each_filter_alone():
    img = _img(6, 5, 3, seed=9)
    for f in range(5):
        out = decode_png(encode_png(img, filter_for_row=lambda y: f))
        assert np.array_equal(out, img), f"filter {f}"


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_decode_rejects_unsupported_depth():
    img = _img(4, 4, 1)
    data = bytearray(encode_png(img))
    # IHDR body starts at offset 16; depth byte is at 16+8
    data[24] = 16
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(data))


def test_decode_image_dispatch():
    img = _img(5, 5, 3, seed=2)
    assert np.array_equal(MM.decode_image(encode_png(img)), img)
    with pytest.raises((NotImplementedError, ValueError)):
        MM.decode_image(b"\xff\xd8\xff\xe0 fake jpeg")


def test_pixel_features_pipeline(spark):
    """mapInPandas decode path: valid PNGs produce (H,W,C,luma,hash)
    rows; a corrupt payload row is skipped, not failed."""
    imgs = {i: _img(8 + i, 6, 3, seed=i) for i in range(3)}
    rows = [(i, bytearray(encode_png(a))) for i, a in imgs.items()]
    rows.append((99, bytearray(b"\x89PNG\r\n\x1a\ncorrupt rest")))
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in MM.pixel_features(media).collect()}
    assert set(got) == {0, 1, 2}  # corrupt row skipped
    import hashlib

    for i, a in imgs.items():
        r = got[i]
        assert (r["height"], r["width"], r["channels"]) == (8 + i, 6, 3)
        assert abs(r["mean_luma"] - float(a.astype(np.float64).mean())) < 1e-9
        assert r["pixel_hash"] == int(
            hashlib.md5(a.tobytes()).hexdigest()[:15], 16
        )
