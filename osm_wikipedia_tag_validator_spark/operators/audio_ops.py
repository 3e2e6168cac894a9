"""Multimodal (audio) column operators — decode / features / resample /
segment / fingerprint near-dup / per-row invariant, all Arrow-batched
mapInPandas stages over the opaque binary column.

Unlike the image path (fake-JPEG stub) and video path (stubbed frame
decode), everything here is REAL: RIFF/WAVE PCM decodes with
struct+numpy (datagen/audio.py), so decode, DSP features, resampling
and the invariant check run on genuine bytes. The Spark shape is the
100 TB shape: binary column stays inside Arrow batches, features are
computed per batch, no per-row Python outside the batch loop, nothing
ever collects audio bytes to the driver.

Reference parity: the reference validates every element's tag lineage
and self-tests against golden expected outputs
(`maproulette_challenge_creation.py:399-433`); `verify_invariants`
realizes the same per-row contract for audio rows (decoded-sample
exactness — PCM is lossless — + stored-fingerprint match + byte-exact
caption vs the seeded generator).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..datagen.audio import audio_fp64, decode_wav, encode_wav, synth_samples

FEATURES_SCHEMA = (
    "audio_id string, sr int, n_channels int, duration_s double, "
    "rms double, peak double, zcr double, centroid_hz double"
)


def _mono_float(samples: np.ndarray) -> np.ndarray:
    x = samples.astype(np.float64) / 32768.0
    return x.mean(axis=1) if x.ndim == 2 else x


def extract_features(audio: DataFrame) -> DataFrame:
    """Decode each clip inside the Arrow batch and emit DSP features:
    duration, RMS loudness, peak, zero-crossing rate, spectral
    centroid. The per-clip loop inside the batch is inherent to decode
    (same stance as image decode); all math is vectorized numpy."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                sr, samples = decode_wav(bytes(r.bytes))
                x = _mono_float(samples)
                n = len(x)
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                denom = spec.sum()
                centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
                rows.append(
                    (
                        r.audio_id, sr, samples.shape[1], n / sr,
                        float(np.sqrt(np.mean(x * x))),
                        float(np.abs(x).max(initial=0.0)),
                        zc, centroid,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "audio_id", "sr", "n_channels", "duration_s",
                    "rms", "peak", "zcr", "centroid_hz",
                ],
            )

    return audio.mapInPandas(gen, FEATURES_SCHEMA)


RESAMPLE_SCHEMA = "audio_id string, bytes binary, sr int, n_samples int"


def resample_audio(audio: DataFrame, target_sr: int) -> DataFrame:
    """Linear-interpolation resample to target_sr, re-encoded as WAV —
    the audio analog of image resize. Real DSP, not a stub."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                sr, samples = decode_wav(bytes(r.bytes))
                n = samples.shape[0]
                m = max(1, int(round(n * target_sr / sr)))
                src_t = np.arange(n, dtype=np.float64) / sr
                dst_t = np.arange(m, dtype=np.float64) / target_sr
                out = np.stack(
                    [
                        np.interp(dst_t, src_t, samples[:, c].astype(np.float64))
                        for c in range(samples.shape[1])
                    ],
                    axis=1,
                )
                out16 = np.clip(np.round(out), -32768, 32767).astype(np.int16)
                rows.append((r.audio_id, encode_wav(out16, target_sr), target_sr, m))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "sr", "n_samples"])

    return audio.mapInPandas(gen, RESAMPLE_SCHEMA)


SEGMENTS_SCHEMA = (
    "audio_id string, seg_idx int, start_s double, end_s double, rms double"
)


def segment_features(audio: DataFrame, win_s: float = 0.05,
                     hop_s: float = 0.05) -> DataFrame:
    """Fixed-window segmentation with per-segment RMS — the audio analog
    of video frame-sampling (one row per window, exploded batch-side,
    so a 1-hour clip fans out inside its own Arrow batch and never
    round-trips the driver)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                sr, samples = decode_wav(bytes(r.bytes))
                x = _mono_float(samples)
                win, hop = max(1, int(win_s * sr)), max(1, int(hop_s * sr))
                for i, s0 in enumerate(range(0, max(len(x) - win + 1, 1), hop)):
                    seg = x[s0 : s0 + win]
                    rows.append(
                        (
                            r.audio_id, i, s0 / sr, (s0 + len(seg)) / sr,
                            float(np.sqrt(np.mean(seg * seg))),
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["audio_id", "seg_idx", "start_s", "end_s", "rms"]
            )

    return audio.mapInPandas(gen, SEGMENTS_SCHEMA)


def neardup_by_fingerprint(audio: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Audio near-dup pairs by spectral-fingerprint Hamming distance —
    delegates to the shared banded plan (`dedup.banded_hamming_pairs`:
    band equi-join candidates, never an all-pairs cross join; exact
    recall only for max_hamming ≤ n_bands-1, enforced there). Output
    (id1, id2, hamming), id1 < id2."""
    from .dedup import banded_hamming_pairs

    return banded_hamming_pairs(audio, "audio_id", "afp", max_hamming)


VERIFY_SCHEMA = (
    "audio_id string, fmt string, samples_exact boolean, "
    "fp_match boolean, caption_ok boolean"
)


def verify_invariants(audio: DataFrame, caption_fn=None) -> DataFrame:
    """Per-row content invariant, the audio twin of the image input_hint
    contract: PCM is lossless so decoded samples must be EXACTLY the
    seeded generator's waveform (no PSNR tolerance needed), the stored
    fingerprint must match a recompute from decoded bytes, and the
    caption must be byte-equal to `caption_fn(audio_ids)` (the
    generator recompute). A corrupted byte, fingerprint or caption
    flips the row to False — tests prove detection, not just the happy
    path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            expected = (
                caption_fn(pdf["audio_id"].tolist())
                if caption_fn is not None
                else [None] * len(pdf)
            )
            rows = []
            for r, exp in zip(pdf.itertuples(index=False), expected):
                cap_ok = r.caption == exp if exp is not None else isinstance(r.caption, str)
                try:
                    _, samples = decode_wav(bytes(r.bytes))
                except ValueError:
                    # structural corruption (RIFF header / chunk damage)
                    # flips the row to False — never fails the task
                    rows.append((r.audio_id, r.fmt, False, False, bool(cap_ok)))
                    continue
                ref = synth_samples(int(r.audio_id.split("-")[1]))
                exact = samples.shape == ref.shape and bool(np.array_equal(samples, ref))
                rows.append(
                    (
                        r.audio_id, r.fmt, exact,
                        audio_fp64(samples) == r.afp, bool(cap_ok),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "fmt", "samples_exact", "fp_match", "caption_ok"],
            )

    return audio.mapInPandas(gen, VERIFY_SCHEMA)
