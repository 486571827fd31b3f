"""Pure-Python baseline JPEG codec (pycore.jpeg, ITU-T T.81 subset):
encode→decode roundtrip within DCT-quantization tolerance, greyscale +
RGB + non-multiple-of-8 dims, spec-level error gates, and the
decode_image / pixel_features dispatch for JPEG payloads."""

from __future__ import annotations

import numpy as np
import pytest

from searchengine_spark.operators import multimodal as MM
from searchengine_spark.pycore.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, c=3):
    """Gradient image — JPEG-friendly content where roundtrip error is
    a few grey levels (Annex K tables at their native quality)."""
    x = np.linspace(0, 255, w)[None, :].repeat(h, 0)
    y = np.linspace(0, 255, h)[:, None].repeat(w, 1)
    if c == 1:
        return ((x + y) / 2).astype(np.uint8)
    return np.stack([x, y, (x + y) / 2], -1).astype(np.uint8)


def test_roundtrip_rgb_smooth():
    img = _smooth(40, 56)
    out = decode_jpeg(encode_jpeg(img))
    assert out.dtype == np.uint8 and out.shape == img.shape
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.mean() < 4 and err.max() <= 32


def test_roundtrip_greyscale():
    img = _smooth(24, 24, c=1)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape and out.ndim == 2
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3


def test_roundtrip_non_multiple_of_8():
    """Edge-replicated padding: odd dims survive exactly (same shape
    back, interior error bounded)."""
    img = _smooth(13, 22)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 6


def test_roundtrip_noise_bounded():
    """Worst-case content: white noise loses high frequencies to the
    quantizer but stays a recognizable reconstruction, not garbage."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 64


def test_flat_image_exact():
    """A constant block has only a DC coefficient — quantization is
    exact and the roundtrip is bit-perfect."""
    img = np.full((16, 8, 3), 96, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert np.array_equal(out, img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_decode_rejects_progressive():
    data = bytearray(encode_jpeg(_smooth(8, 8)))
    # patch the SOF0 marker (FF C0) to SOF2 (progressive)
    i = data.find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF"):
        decode_jpeg(bytes(data))


def test_decode_image_dispatch_jpeg():
    img = _smooth(10, 10)
    out = MM.decode_image(encode_jpeg(img))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 4


def test_pixel_features_on_jpeg(spark):
    """pixel_features decodes JPEG payloads alongside PNG and skips a
    truncated JPEG (decode-skip policy)."""
    from searchengine_spark.pycore.png import encode_png

    jpg_img = _smooth(12, 9)
    png_img = _smooth(7, 7)
    rows = [
        (1, bytearray(encode_jpeg(jpg_img))),
        (2, bytearray(encode_png(png_img))),
        (3, bytearray(b"\xff\xd8\xff\xe0 truncated nonsense")),
    ]
    media = spark.createDataFrame(rows, "media_id bigint, payload binary")
    got = {r["media_id"]: r for r in MM.pixel_features(media).collect()}
    assert set(got) == {1, 2}
    assert (got[1]["height"], got[1]["width"], got[1]["channels"]) == (12, 9, 3)
    assert abs(got[1]["mean_luma"] - jpg_img.astype(float).mean()) < 8
