"""Image codecs for the synthetic image+caption table.

The BASELINE.json input_hint requires an `images(bytes: binary, fmt,
…)` table with a per-row invariant of decoded-pixel allclose (PSNR ≥
40 dB for lossy formats). No image libraries (PIL/libjpeg) exist in
this container, so:

  * "png"  — a REAL minimal PNG codec (pure stdlib zlib/struct): RGB8,
    filter type 0, single IDAT. Output is valid PNG any viewer opens;
    the decoder handles exactly what the encoder produces.
  * "jpeg" — a DETERMINISTIC FAKE lossy codec standing in for JPEG:
    pixels are quantized to multiples of Q (lossy, PSNR ≈ 48 dB for
    Q=4 ≥ the 40 dB bar) and the quantized plane is PNG-compressed
    behind a `FJPG` magic header. This is a stub for the real decode
    step; the Spark-side plumbing (binary column, Arrow batches, UDF
    signatures, PSNR verification) is real and tested. Swap
    `encode_image`/`decode_image` for a real libjpeg binding in
    production.

All functions operate on uint8 numpy arrays (h, w, 3).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_FJPG_MAGIC = b"FJPG"
FAKE_JPEG_Q = 4  # quantization step → PSNR ≈ 10*log10(255^2/(Q^2/12)) ≈ 48 dB


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    # filter byte 0 per scanline
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 1))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 2:
                raise ValueError("decoder supports 8-bit RGB only")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    rows = raw.reshape(h, 1 + w * 3)
    filters = rows[:, 0]
    if not (filters == 0).all():
        raise ValueError("decoder supports filter 0 only")
    return rows[:, 1:].reshape(h, w, 3).copy()


def fake_jpeg_encode(img: np.ndarray, q: int = FAKE_JPEG_Q) -> bytes:
    """DETERMINISTIC FAKE lossy codec (see module docstring)."""
    img = np.asarray(img, dtype=np.uint8)
    quant = ((img.astype(np.int32) // q) * q).astype(np.uint8)
    return _FJPG_MAGIC + struct.pack(">B", q) + png_encode(quant)


def fake_jpeg_decode(data: bytes) -> np.ndarray:
    if not data.startswith(_FJPG_MAGIC):
        raise ValueError("not a fake-jpeg")
    return png_decode(data[len(_FJPG_MAGIC) + 1 :])


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(img)
    if fmt == "jpeg":
        return fake_jpeg_encode(img)
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str | None = None) -> np.ndarray:
    if data.startswith(_PNG_SIG):
        return png_decode(data)
    if data.startswith(_FJPG_MAGIC):
        return fake_jpeg_decode(data)
    raise ValueError("unknown image format")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB; inf for identical images."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)
