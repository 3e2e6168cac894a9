"""Multimodal (image) column operators — decode / features / resize /
verify, all as Arrow-batched mapInPandas stages over the binary column.

The `images.bytes` column is opaque binary + typed metadata (w, h,
fmt) per the input_hint. Decode uses the in-repo codecs
(datagen/codecs.py): REAL minimal PNG (lossless), REAL dct8 (8×8 DCT +
quantization — genuine transform-coding loss, the honest lossy path
for the PSNR ≥ 40 dB invariant), and a clearly-marked DETERMINISTIC
FAKE for JPEG (no libjpeg in this container; documented swap point).
The Spark-side plumbing — schema, batch shape, partition behavior — is
the part that matters at 100 TB and is real and tested.

Video frame-sampling is REAL at the container level: VPNG
(length-prefixed real-PNG frames, the sandbox stand-in for mp4) is
genuinely decoded per sampled frame, with skipped frames hopped by
length — only the H.264-bitstream layer would need a PyAV/ffmpeg
binding in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..datagen.codecs import (
    LOSSY_FMTS,
    decode_image,
    encode_image,
    psnr,
    vpng_decode_frames,
    vpng_n_frames,
)
from ..functions.imagefns import ahash64, block_mean_resize, luma, resize_nearest

FEATURES_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, "
    "phash long, mean_luma double, std_luma double, decoded_phash long"
)


def extract_features(images: DataFrame) -> DataFrame:
    """Decode each image inside the Arrow batch and emit cheap features
    + a recomputed perceptual hash (drift check against the stored
    phash column)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(bytes(r.bytes))
                g = luma(img)
                rows.append(
                    (
                        r.image_id, r.w, r.h, r.fmt, r.caption, r.phash,
                        float(g.mean()), float(g.std()), ahash64(img),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id", "w", "h", "fmt", "caption", "phash",
                    "mean_luma", "std_luma", "decoded_phash",
                ],
            )

    return images.mapInPandas(gen, FEATURES_SCHEMA)


COMPARE_SCHEMA = (
    "image_id string, fmt string, psnr_db double, pixels_ok boolean, caption_ok boolean"
)


def compare_against_reference(
    images: DataFrame, reference: DataFrame, min_psnr_db: float = 40.0
) -> DataFrame:
    """THE per-row invariant of BASELINE.json input_hint, verbatim:
    decoded-pixel allclose (PSNR ≥ 40 dB for lossy formats; exact for
    lossless) + BYTE-EXACT caption equality, row-matched against a
    reference table on image_id.

    Physical plan: equi-join on image_id (shuffle-hash both-sides-big,
    or bucketed co-located at scale) → one Arrow-batched decode+compare
    stage. Rows missing from either side surface as pixels_ok=false.
    """
    ref = reference.select(
        F.col("image_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("fmt").alias("ref_fmt"),
        F.col("caption").alias("ref_caption"),
    )
    joined = images.select("image_id", "bytes", "fmt", "caption").join(
        ref.hint("shuffle_hash"), "image_id", "full_outer"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.bytes is None or r.ref_bytes is None:
                    rows.append((r.image_id, r.fmt or r.ref_fmt, 0.0, False, False))
                    continue
                try:
                    a = decode_image(bytes(r.bytes))
                    b = decode_image(bytes(r.ref_bytes))
                except ValueError:
                    # structurally corrupt row (bad header/truncation) —
                    # flag it, never fail the task
                    rows.append(
                        (r.image_id, r.fmt, 0.0, False, r.caption == r.ref_caption)
                    )
                    continue
                if a.shape != b.shape:
                    rows.append((r.image_id, r.fmt, 0.0, False, r.caption == r.ref_caption))
                    continue
                p = psnr(a, b)
                lossy = (r.fmt in LOSSY_FMTS) or (r.ref_fmt in LOSSY_FMTS)
                ok = (p >= min_psnr_db) if lossy else (p == float("inf"))
                rows.append(
                    (r.image_id, r.fmt, float(min(p, 1e9)), bool(ok), r.caption == r.ref_caption)
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "psnr_db", "pixels_ok", "caption_ok"]
            )

    return joined.mapInPandas(gen, COMPARE_SCHEMA)


VERIFY_SCHEMA = "image_id string, fmt string, psnr double, phash_match boolean, caption_ok boolean"


def verify_invariants(images: DataFrame, reference_images: DataFrame | None = None,
                      min_psnr_db: float = 40.0,
                      caption_fn=None) -> DataFrame:
    """The per-row invariant of BASELINE.json input_hint: decoded-pixel
    allclose (PSNR ≥ 40 dB for lossy formats; exact for lossless) +
    byte-exact caption equality vs the reference rows.

    With reference_images=None the check is self-referential: re-encode
    the decoded pixels with the row's own fmt and verify the round-trip
    PSNR + stored-phash match — the engine-side integrity pass the
    bench loop samples (SURVEY.md §7.3e). `caption_fn(image_ids) ->
    list[str]` recomputes the expected caption from source of truth
    (e.g. the seeded generator, where caption is a pure function of
    image_id) so caption_ok is a byte-exact comparison, evaluated
    batch-side inside the Arrow stage. Without it (and without a
    reference table) caption integrity cannot be derived from the row
    alone, so caption_ok only asserts presence."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if caption_fn is not None:
                expected = caption_fn(pdf["image_id"].tolist())
            else:
                expected = [None] * len(pdf)
            rows = []
            for r, exp in zip(pdf.itertuples(index=False), expected):
                caption_ok = (
                    r.caption == exp if exp is not None else isinstance(r.caption, str)
                )
                try:
                    img = decode_image(bytes(r.bytes))
                    rt = decode_image(encode_image(img, r.fmt))
                except ValueError:
                    # a corrupted byte flips the row to False — including
                    # structural (header/container) corruption, which the
                    # codecs surface as ValueError per their contract
                    rows.append((r.image_id, r.fmt, 0.0, False, bool(caption_ok)))
                    continue
                p = psnr(img, rt)
                rows.append(
                    (
                        r.image_id,
                        r.fmt,
                        float(min(p, 1e9)),
                        ahash64(img) == r.phash,
                        bool(caption_ok),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "fmt", "psnr", "phash_match", "caption_ok"]
            )

    return images.mapInPandas(gen, VERIFY_SCHEMA)


THUMB_SCHEMA = "image_id string, thumb binary, tw int, th int"


def make_thumbnails(images: DataFrame, size: int = 8) -> DataFrame:
    """Resize (nearest-neighbor) each image to size×size and re-encode
    as PNG — the classic preprocessing stage; stays inside the batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_image(bytes(r.bytes))
                th = resize_nearest(img, size, size)
                rows.append((r.image_id, encode_image(th, "png"), size, size))
            yield pd.DataFrame(rows, columns=["image_id", "thumb", "tw", "th"])

    return images.mapInPandas(gen, THUMB_SCHEMA)


FRAMES_SCHEMA = (
    "video_id string, frame_idx int, frame_phash long, mean_luma double"
)


def sample_frames(videos: DataFrame, stride: int = 2) -> DataFrame:
    """Video frame-sampling — REAL decode: the `bytes` column holds a
    VPNG container (length-prefixed real-PNG frames, the sandbox
    stand-in for mp4 — datagen/codecs.py). Every stride-th frame is
    genuinely decoded and featurized (aHash + mean luma); skipped
    frames are hopped over BY LENGTH without decoding, which is what
    makes stride-sampling cheap — the same property seeking in an mp4
    gives you. One row per sampled frame, exploded batch-side, so an
    hour-long clip fans out inside its own Arrow batch. Swap the VPNG
    parser for a PyAV/ffmpeg binding in production; schema, batching
    and the explode shape stay identical."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(r.bytes)
                idx = list(range(0, vpng_n_frames(data), max(stride, 1)))
                for i, frame in zip(idx, vpng_decode_frames(data, idx)):
                    rows.append(
                        (r.video_id, i, ahash64(frame), float(luma(frame).mean()))
                    )
            yield pd.DataFrame(
                rows, columns=["video_id", "frame_idx", "frame_phash", "mean_luma"]
            )

    return videos.mapInPandas(gen, FRAMES_SCHEMA)


def neardup_by_phash(features: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-dup candidate pairs by perceptual-hash Hamming
    distance — delegates to the shared banded plan
    (`dedup.banded_hamming_pairs`; exact recall only for
    max_hamming ≤ n_bands-1, enforced there — the shared plan
    auto-picks 8 bands, so the historical default of 6 is exact)."""
    from .dedup import banded_hamming_pairs

    return banded_hamming_pairs(features, "image_id", "phash", max_hamming)
