"""Deterministic synthetic audio source + pure-numpy WAV codec.

The multimodal brief treats image/AUDIO/video as opaque binary columns
with typed metadata. Unlike JPEG/H.264 (no codec libs in this
container), RIFF/WAVE PCM is fully decodable with struct + numpy — so
the audio path is REAL end to end: encode, decode, features, resample
and the per-row invariant all operate on genuine bytes, no stubs.

Table shape mirrors the image input_hint `(image_id, bytes, w, h, fmt,
caption, phash)`:

    (audio_id string, bytes binary, sr int, n_channels int,
     n_samples int, fmt string, caption string, afp long)

`afp` is a stored 64-bit audio fingerprint (time-chunk × freq-band
energy signs), the phash analog. Everything is a pure function of
audio_id, so captions/samples/fingerprints can be recomputed for
byte-exact invariant checks (reference parity model:
`generate_webpage_with_error_output.py` golden self-tests).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

SR = 16_000

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, n_channels int, "
    "n_samples int, fmt string, caption string, afp long"
)


# ---------------------------------------------------------------------------
# WAV codec (RIFF PCM16) — pure struct/numpy, real
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sr: int) -> bytes:
    """int16 samples, shape (n,) mono or (n, ch) interleaved-on-write."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype("<i2")).tobytes()
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, ch, sr, sr * ch * 2, ch * 2, 16),
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(b: bytes) -> tuple[int, np.ndarray]:
    """→ (sample_rate, int16 array shape (n, ch)). Walks RIFF chunks, so
    writers that insert LIST/INFO chunks still parse."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    # structural corruption (damaged chunk headers, truncated fmt/data)
    # → ValueError, same contract as the image codecs: verify operators
    # flag the row instead of crashing the task
    try:
        pos, ch, sr, bits, data = 12, None, None, None, None
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
            body = b[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                fmt_code, ch, sr, _, _, bits = struct.unpack("<HHIIHH", body[:16])
                if fmt_code != 1 or bits != 16:
                    raise ValueError(f"unsupported WAV: fmt={fmt_code} bits={bits}")
            elif cid == b"data":
                data = body
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if sr is None or data is None:
            raise ValueError("missing fmt/data chunk")
        arr = np.frombuffer(data, dtype="<i2")
        return sr, arr.reshape(-1, ch)
    except ValueError:
        raise
    except (struct.error, TypeError) as e:
        raise ValueError(f"corrupt WAV: {e}") from e


# ---------------------------------------------------------------------------
# fingerprint — the phash analog (8 time chunks × 8 band-energy signs)
# ---------------------------------------------------------------------------

def audio_fp64(samples: np.ndarray) -> int:
    """64-bit spectral fingerprint: mono-mix → whole-clip power
    spectrum → 65 Hz-aligned bands over the lower half-spectrum
    (0 … Nyquist/2; band edges at fixed frequency FRACTIONS, so clips
    of different lengths band identically) → bit = sign of the
    adjacent-band energy slope (e[i] > e[i+1]), the Haitsma-Kalker
    derivative-sign idea reduced to the frequency axis. Slope signs
    flip exactly where spectral peaks sit, so the print encodes PEAK
    POSITIONS: amplitude-scale invariant, stable under tiny waveform
    perturbations (near-dup pairs land within a few bits), and far
    apart for distinct tone sets. Signed-int64 for a Spark `long`.

    Two earlier cuts were DEGENERATE on this corpus and are worth
    recording: coarse 8×1 kHz time×band chunks gave unrelated clips
    identical prints (all tones live under 3.5 kHz), and
    energy-above-median bits collapsed to `32 ones then 32 zeros` for
    every clip (leakage decays monotonically from the low-frequency
    tones, so the upper half is always the leftmost bands).
    """
    mono = samples.astype(np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    spec = np.abs(np.fft.rfft(mono)) ** 2
    low = spec[: max(len(spec) // 2, 65)]  # 0 … Nyquist/2
    e = np.array([bnd.sum() for bnd in np.array_split(low, 65)])
    bits = e[:-1] > e[1:]  # spectral slope signs, 64 bits
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    return v - (1 << 64) if v >= (1 << 63) else v


# ---------------------------------------------------------------------------
# seeded generator — every column a pure function of audio_id
# ---------------------------------------------------------------------------

def _params(ids: np.ndarray) -> dict[str, np.ndarray]:
    ids = ids.astype(np.int64)
    # planted near-dups: id ≡ 1 (mod 53) clones id-1's tones with a tiny
    # amplitude perturbation → fingerprint-near pair (the phash-twin
    # pattern datagen uses for images)
    base = np.where(ids % 53 == 1, ids - 1, ids)
    return {
        "f1": 200.0 + (base * 37) % 1800,
        "f2": 300.0 + (base * 91) % 3200,
        "a1": 0.30 + ((base * 13) % 50) / 100.0,
        "a2": 0.10 + ((base * 29) % 30) / 100.0,
        "perturb": np.where(ids % 53 == 1, 0.01, 0.0),
        "n": 1600 + (base % 5) * 800,
        "ch": np.where(base % 7 == 0, 2, 1),
    }


def synth_samples(aid: int) -> np.ndarray:
    """The reference waveform for one id — int16, shape (n, ch)."""
    p = _params(np.array([aid]))
    f1, f2 = float(p["f1"][0]), float(p["f2"][0])
    a1 = float(p["a1"][0]) + float(p["perturb"][0])
    a2 = float(p["a2"][0])
    n, ch = int(p["n"][0]), int(p["ch"][0])
    t = np.arange(n, dtype=np.float64) / SR
    x = a1 * np.sin(2 * np.pi * f1 * t) + a2 * np.sin(2 * np.pi * f2 * t)
    # headroom: max |x| = a1+perturb+a2 ≤ 0.79+0.01+0.39 = 1.19 < 1.2,
    # so the int16 quantization below never clips (clipping would break
    # the exact decode==synth invariant). Widening any amplitude range
    # in _params must keep this sum under 1.2.
    x = x / 1.2
    mono = np.round(x * 32767.0).astype(np.int16)
    if ch == 1:
        return mono[:, None]
    return np.stack([mono, np.round(x * 0.8 * 32767.0).astype(np.int16)], axis=1)


def expected_audio_captions(audio_ids: list[str]) -> list[str]:
    out = []
    for s in audio_ids:
        aid = int(s.split("-")[1])
        p = _params(np.array([aid]))
        dur = int(p["n"][0]) / SR
        out.append(
            f"audio {aid:09d}: {int(p['f1'][0])}Hz+{int(p['f2'][0])}Hz {dur:.3f}s"
        )
    return out


def gen_audio_batch(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    caps = expected_audio_captions([f"aud-{int(i):09d}" for i in ids])
    for aid, cap in zip(ids.astype(np.int64), caps):
        samples = synth_samples(int(aid))
        rows.append(
            (
                f"aud-{int(aid):09d}",
                encode_wav(samples, SR),
                SR,
                samples.shape[1],
                samples.shape[0],
                "wav",
                cap,
                audio_fp64(samples),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "audio_id", "bytes", "sr", "n_channels",
            "n_samples", "fmt", "caption", "afp",
        ],
    )


def spark_audio(spark, n: int):
    from .world import _id_range

    return _id_range(spark, n).mapInPandas(
        lambda it: (gen_audio_batch(p["id"].to_numpy()) for p in it), AUDIO_SCHEMA
    )
