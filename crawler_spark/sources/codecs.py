"""Image codecs for the image+caption payload (BASELINE.json#input_hint).

The container has no PIL/opencv, so:

- **PNG** — a real, spec-compliant encoder/decoder written on stdlib zlib
  (8-bit RGB, filter 0). Round-trips losslessly; any standard viewer can open
  the bytes. This is the "png" fmt of the images table.
- **"jpeg"** — the lossy path is STUBBED with a deterministic fake codec
  (`LJPG`): 4:1 uniform quantization of RGB in a zlib container. It is NOT
  interchange JPEG; it exists so the lossy invariant (decoded-pixel
  PSNR ≥ 40 dB, input_hint) and the Spark-side plumbing (binary columns,
  Arrow batches, decode UDFs) are real and tested. Swap `encode_jpeg` /
  `decode_jpeg` for PIL when available (see `_HAVE_PIL`).

All functions operate on numpy HxWx3 uint8 arrays — vectorized inside Arrow
batches; no per-pixel Python.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(rgb: np.ndarray) -> bytes:
    """RGB uint8 (h, w, 3) → PNG bytes (8-bit truecolor, filter 0)."""
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes (as produced by encode_png: 8-bit RGB, filter 0/1/2) → array."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, idat, w = 8, b"", 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if typ == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", body[:10])
            assert bit == 8 and ctype == 2, "decoder supports 8-bit RGB only"
        elif typ == b"IDAT":
            idat += body
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, w * 3 + 1)
    filters, scan = raw[:, 0], raw[:, 1:].astype(np.int16)
    out = np.zeros((h, w * 3), np.int16)
    for y in range(h):  # per-scanline unfiltering (h is small; columns vectorized)
        line = scan[y].copy()
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            for x in range(3, w * 3):
                line[x] = (line[x] + line[x - 3]) & 0xFF
            out[y] = line
        elif f == 2:  # Up
            out[y] = (line + out[y - 1]) & 0xFF
        else:  # pragma: no cover
            raise ValueError(f"unsupported PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)


_LJPG_MAGIC = b"LJPG"
_QUANT = 4  # 4:1 quantization → max per-channel error 2 → PSNR ≈ 44 dB


def encode_jpeg(rgb: np.ndarray) -> bytes:
    """Deterministic FAKE lossy codec (stub for real JPEG — see module doc)."""
    if _HAVE_PIL:  # pragma: no cover
        import io

        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, "JPEG", quality=95)
        return buf.getvalue()
    h, w, _ = rgb.shape
    q = (rgb.astype(np.int16) + _QUANT // 2) // _QUANT
    q = np.clip(q, 0, 255 // _QUANT).astype(np.uint8)
    return _LJPG_MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpeg(data: bytes) -> np.ndarray:
    if data[:4] != _LJPG_MAGIC:
        if _HAVE_PIL:  # pragma: no cover
            import io

            return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        raise NotImplementedError(
            "real JPEG decode requires PIL (not in this container); "
            "the deterministic LJPG stub covers the lossy code path"
        )
    w, h = struct.unpack(">II", data[4:12])
    q = np.frombuffer(zlib.decompress(data[12:]), np.uint8).reshape(h, w, 3)
    return (q.astype(np.int16) * _QUANT).clip(0, 255).astype(np.uint8)


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    return decode_png(data) if fmt == "png" else decode_jpeg(data)


def phash64(rgb: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 mean-threshold of a box-downsampled
    grayscale (aHash — deterministic, no DCT dependency).

    ALL accumulation is exact int64 — the grayscale projection is
    1000·luma = 299·R + 587·G + 114·B elementwise, never a float matmul:
    a BLAS ``@`` picks different summation orders under different threading
    (Spark python workers run with OMP_NUM_THREADS=1, the driver doesn't),
    which flipped near-mean threshold bits between driver and executor for
    the same pixels.  The only floats are exact-int ratios compared at the
    end, identical on every build.

    Returns a *signed* int64 (two's complement) to match Spark LongType.
    """
    px = rgb.astype(np.int64)
    g = 299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]
    h, w = g.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = g.cumsum(0).cumsum(1)  # exact integer integral image
    sums = np.empty((8, 8), dtype=np.int64)
    areas = np.empty((8, 8), dtype=np.int64)
    for i in range(8):
        for j in range(8):
            y0, y1, x0, x1 = ys[i], ys[i + 1], xs[j], xs[j + 1]
            areas[i, j] = max((y1 - y0) * (x1 - x0), 1)
            sums[i, j] = ii[y1, x1] - ii[y0, x1] - ii[y1, x0] + ii[y0, x0]
    # exact-int ÷ exact-int is a single IEEE op per cell; the 64-element
    # mean uses numpy's fixed pairwise order — no BLAS, no threading input
    cells = sums.astype(np.float64) / areas
    mean = cells.sum() / 64.0
    bits = (cells > mean).ravel()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 20 * np.log10(255.0) - 10 * np.log10(mse)
