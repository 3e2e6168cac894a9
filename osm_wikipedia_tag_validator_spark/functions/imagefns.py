"""Vectorized image feature functions (numpy, Arrow-batch friendly).

These run inside mapInPandas / pandas UDFs over the `images.bytes`
binary column; decode stays inside the Arrow batch (SURVEY.md §7.3e).
The perceptual hash is an average-hash (aHash): 8×8 block-mean
downsample of the luma plane, thresholded at its mean → 64-bit int.
Public technique (pHash family); DCT-free so it's pure numpy.
"""

from __future__ import annotations

import numpy as np

from ..datagen.codecs import decode_image, psnr  # noqa: F401  (re-exported)


def luma(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    return 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]


def block_mean_resize(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample via index-binned means (handles any size).

    Fast path for exact-multiple sizes (reshape-mean — identical result
    to the binned mean since bin edges align); general path otherwise.
    """
    h, w = plane.shape
    if h % out_h == 0 and w % out_w == 0:
        return plane.reshape(out_h, h // out_h, out_w, w // out_w).mean(axis=(1, 3))
    ys = (np.arange(h) * out_h // h).astype(np.int64)
    xs = (np.arange(w) * out_w // w).astype(np.int64)
    out = np.zeros((out_h, out_w), dtype=np.float64)
    cnt = np.zeros((out_h, out_w), dtype=np.int64)
    np.add.at(out, (ys[:, None], xs[None, :]), plane)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1)
    return out / np.maximum(cnt, 1)


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys[:, None], xs[None, :]]


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash of an RGB image. Deterministic."""
    g = block_mean_resize(luma(img), 8, 8)
    bits = (g > g.mean()).ravel()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # reinterpret as signed int64 for Spark LongType
    return v - (1 << 64) if v >= (1 << 63) else v


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount over uint64."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
        x = (x & np.uint64(0x3333333333333333)) + (
            (x >> np.uint64(2)) & np.uint64(0x3333333333333333)
        )
        x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between two int64 hash arrays."""
    return popcount64(
        (np.asarray(a, dtype=np.int64) ^ np.asarray(b, dtype=np.int64)).astype(np.uint64)
    )


def extract_features(img: np.ndarray) -> dict:
    """Cheap per-image features used by the pipeline's metadata stage."""
    g = luma(img)
    return {
        "mean_luma": float(g.mean()),
        "std_luma": float(g.std()),
        "phash": ahash64(img),
    }
