"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines at 100 TB carry media as ``binary`` columns with a
typed metadata struct; the expensive decode runs as Arrow-batched Python
close to the scan, emitting fixed-shape feature columns that downstream
relational operators (dedup by perceptual hash, similarity over features,
quality filters) consume.

The actual codecs are NOT in this container, so ``decode`` is a STUB: a
deterministic fake decoder (seeded by the payload hash) stands in behind
the same signature — the Spark-side plumbing (schema, partitioning,
mapInPandas batch shape, feature contract) is real and tested, and
swapping in PIL/ffmpeg later changes only ``_decode_image_stub`` /
``_sample_frames_stub``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary,"
                " meta struct<width:int,height:int,n_frames:int,"
                "sample_rate:int,codec:string>")

IMAGE_FEATURES_SCHEMA = ("media_id long, width int, height int,"
                         " mean_luma double, phash long,"
                         " histogram array<double>")

FRAME_SAMPLE_SCHEMA = ("media_id long, frame_idx int, frame_phash long")


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder — deterministic fake pixels from the payload hash.
    Real impl: PIL.Image.open(io.BytesIO(payload)) → np.asarray.
    Raises like a real decoder would on empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(max(height, 1), max(width, 1)),
                        dtype=np.uint8)


def _sample_frames_stub(payload: bytes, n_frames: int, k: int) -> list[int]:
    """STUB frame sampler — evenly spaced frame indices (real impl:
    ffmpeg seek); deterministic by construction."""
    if n_frames <= 0:
        return []
    k = min(k, n_frames)
    return [int(i * n_frames / k) for i in range(k)]


def _phash(img: np.ndarray) -> int:
    """Tiny perceptual hash: 8x8 mean-threshold bits (real aHash shape)."""
    h, w = img.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    cells = np.array([[img[ys[i]:max(ys[i + 1], ys[i] + 1),
                           xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
                       for j in range(8)] for i in range(8)])
    bits = (cells > cells.mean()).flatten()
    return int(sum(int(b) << i for i, b in enumerate(bits)) - (1 << 63))


def extract_image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """binary media rows → fixed-shape image features (mapInPandas;
    decode isolated per batch so one corrupt payload fails fast with the
    media_id attached, not a whole-task stacktrace)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                try:
                    img = _decode_image_stub(r["payload"], meta["width"],
                                             meta["height"])
                except ValueError:
                    continue  # counted via rows-in/rows-out lineage
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                rows.append({
                    "media_id": r["media_id"],
                    "width": img.shape[1], "height": img.shape[0],
                    "mean_luma": float(img.mean()),
                    "phash": _phash(img),
                    "histogram": (hist / max(img.size, 1)).tolist(),
                })
            yield pd.DataFrame(rows, columns=["media_id", "width", "height",
                                              "mean_luma", "phash", "histogram"])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA))


def sample_video_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """video rows → k sampled frame phashes (frame decode stubbed)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = r["meta"]
                for fi in _sample_frames_stub(r["payload"],
                                              meta["n_frames"] or 0, k):
                    frame = _decode_image_stub(
                        r["payload"] + fi.to_bytes(4, "big"),
                        meta["width"], meta["height"])
                    rows.append({"media_id": r["media_id"], "frame_idx": fi,
                                 "frame_phash": _phash(frame)})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_phash"])

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA))


def near_dup_by_phash(features: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual-hash near-dup candidates: band the 64-bit phash into 4
    x 16-bit keys (any equal band → candidate, guaranteeing recall for
    Hamming distance ≤ 4 by pigeonhole), then verify exact distance —
    same LSH-then-verify shape as text MinHash, all built-ins except the
    popcount which is a bit-arithmetic expression."""
    bands = features.select(
        "media_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("phash"), i * 16)
                      .bitwiseAND(0xFFFF).alias("key"))
            for i in range(4)])).alias("b")
    ).select("media_id", "phash", "b.band", "b.key")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.key") == F.col("b.key"))
                   & (F.col("a.media_id") < F.col("b.media_id")))
            .select(F.col("a.media_id").alias("ma"),
                    F.col("b.media_id").alias("mb"),
                    F.col("a.phash").alias("pa"),
                    F.col("b.phash").alias("pb"))
            .distinct())
    return (cand.withColumn("hamming", F.bit_count(
        F.col("pa").bitwiseXOR(F.col("pb"))))
            .filter(F.col("hamming") <= max_hamming)
            .select("ma", "mb", "hamming")
            .orderBy("ma", "mb"))


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for tests: payload bytes from
    a seeded hash; ~1/8 rows are byte-duplicates (near-dup fodder)."""
    rows = []
    for i in range(n):
        base = i - (i % 8 == 1)  # every 8th pair duplicates the previous id
        payload = hashlib.blake2b(f"media{seed}:{base}".encode(),
                                  digest_size=32).digest() * 4
        kind = "video" if i % 5 == 0 else "image"
        rows.append((i, kind, bytearray(payload),
                     (64, 48, 40 if kind == "video" else 1, 16000, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
