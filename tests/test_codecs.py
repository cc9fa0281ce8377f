"""Codec invariants (input_hint: decoded-pixel allclose, PSNR≥40 lossy)."""

from __future__ import annotations

import numpy as np
import pytest

from crawler_spark.sources import codecs


def _img(seed: int, h: int = 23, w: int = 31) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_png_lossless_roundtrip(seed):
    rgb = _img(seed)
    assert (codecs.decode_png(codecs.encode_png(rgb)) == rgb).all()


def test_png_signature_and_chunks():
    data = codecs.encode_png(_img(3, 8, 8))
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:33] and data.endswith(b"IEND\xaeB`\x82")


@pytest.mark.parametrize("seed", [0, 2, 9])
def test_lossy_psnr_at_least_40db(seed):
    rgb = _img(seed)
    back = codecs.decode_jpeg(codecs.encode_jpeg(rgb))
    assert back.shape == rgb.shape
    assert codecs.psnr(rgb, back) >= 40.0


def test_lossy_deterministic():
    rgb = _img(5)
    assert codecs.encode_jpeg(rgb) == codecs.encode_jpeg(rgb)


def test_phash_stability_and_sensitivity():
    rgb = _img(11, 32, 32)
    h1 = codecs.phash64(rgb)
    assert h1 == codecs.phash64(rgb.copy())
    assert -(2**63) <= h1 < 2**63  # fits Spark LongType
    mask = (1 << 64) - 1  # popcount over the unsigned bit pattern
    # lossy round-trip must not move the perceptual hash far
    h2 = codecs.phash64(codecs.decode_jpeg(codecs.encode_jpeg(rgb)))
    assert bin((h1 ^ h2) & mask).count("1") <= 4
    # inversion flips every threshold bit → maximal hamming distance
    h3 = codecs.phash64(255 - rgb)
    assert bin((h1 ^ h3) & mask).count("1") >= 16


def test_decode_real_jpeg_is_stubbed():
    with pytest.raises(NotImplementedError):
        codecs.decode_jpeg(b"\xff\xd8\xff\xe0 not really a jpeg")
