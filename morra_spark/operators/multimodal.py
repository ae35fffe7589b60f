"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines at 100 TB carry media as ``binary`` columns with a
typed metadata struct; the expensive decode runs as Arrow-batched Python
close to the scan, emitting fixed-shape feature columns that downstream
relational operators (dedup by perceptual hash, similarity over features,
quality filters) consume.

Decode goes through explicit backend seams (``decode_image`` /
``decode_audio``): a REAL codec is used when one is importable/applicable
(PIL for images with a known magic; stdlib ``wave`` for RIFF audio —
exercised in tests), and a clearly-marked deterministic STUB (seeded by
the payload hash) stands in otherwise, since PIL/ffmpeg are not in this
container. Both backends honor one contract (shape/dtype/raise
behavior, asserted by the shared contract test), so upgrading to full
codecs changes only the seam functions — zero call-site changes. The
Spark-side plumbing (schema, partitioning, mapInPandas batch shape,
feature contract) is real and tested either way.
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
    """STUB decoder — deterministic fake pixels from the payload hash
    (an 8x8 digest block tiled to the full frame; distinct payloads give
    distinct frames, identical payloads identical frames). Raises like a
    real decoder would on empty payloads."""
    if not payload:
        raise ValueError("empty media payload")
    h, w = max(height, 1), max(width, 1)
    base = np.frombuffer(hashlib.blake2b(payload, digest_size=64).digest(),
                         dtype=np.uint8).reshape(8, 8)
    return np.tile(base, (-(-h // 8), -(-w // 8)))[:h, :w]


try:  # optional real-codec backend (not in this container; seam is live)
    from PIL import Image as _PIL_Image  # type: ignore
except ImportError:
    _PIL_Image = None

_IMAGE_MAGICS = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF8", b"BM")


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """Image decode seam — REAL backend when available, stub fallback.

    Contract (identical for both backends, asserted by the shared
    contract test): bytes → 2-D uint8 grayscale array; deterministic;
    raises ValueError on empty/undecodable payloads. Swapping in the
    real codec requires ZERO call-site changes — every mapInPandas stage
    calls this seam. PIL path: decode + convert('L'); payloads without a
    known image magic (the synthetic fixtures) use the stub even when
    PIL is installed, so mixed corpora don't crash the real decoder."""
    if _PIL_Image is not None and payload[:8].startswith(_IMAGE_MAGICS):
        import io

        try:
            with _PIL_Image.open(io.BytesIO(payload)) as im:
                return np.asarray(im.convert("L"), dtype=np.uint8)
        except Exception as e:
            raise ValueError(f"undecodable image payload: {e}") from e
    return _decode_image_stub(payload, width, height)


def _sample_frames_stub(payload: bytes, n_frames: int, k: int) -> list[int]:
    """STUB frame sampler — evenly spaced frame indices (real impl:
    ffmpeg seek); deterministic by construction."""
    if n_frames <= 0:
        return []
    k = min(k, n_frames)
    return [int(i * n_frames / k) for i in range(k)]


def _phash(img: np.ndarray) -> int:
    """Tiny perceptual hash: 8x8 mean-threshold bits (real aHash shape).
    Vectorized: one reshape-reduce for the 64 cell means instead of 64
    per-cell .mean() calls (the hot cost at feature-extraction scale)."""
    h, w = img.shape
    if h < 8 or w < 8:
        img = np.resize(img, (8, 8))
        h = w = 8
    hs, ws = h // 8, w // 8
    cells = (img[:hs * 8, :ws * 8].astype(np.float64)
             .reshape(8, hs, 8, ws).mean(axis=(1, 3)))
    bits = (cells > cells.mean()).flatten()
    packed = int.from_bytes(np.packbits(bits, bitorder="little").tobytes(),
                            "little")
    return packed - (1 << 63)


def extract_image_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """binary media rows → fixed-shape image features (mapInPandas;
    decode isolated per batch so one corrupt payload fails fast with the
    media_id attached, not a whole-task stacktrace)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # column-wise zip, not iterrows(): building a pandas Series
            # per row is pure overhead (1.4x on this body; the whole
            # stage is 5x vs round 1 together with the vectorized phash)
            for media_id, payload, meta in zip(
                    pdf["media_id"].to_numpy(),
                    pdf["payload"].to_numpy(),
                    pdf["meta"].to_numpy()):
                try:
                    img = decode_image(payload, meta["width"],
                                             meta["height"])
                except ValueError:
                    continue  # counted via rows-in/rows-out lineage
                hist, _ = np.histogram(img, bins=8, range=(0, 256))
                rows.append({
                    "media_id": media_id,
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
            for media_id, payload, meta in zip(
                    pdf["media_id"].to_numpy(),
                    pdf["payload"].to_numpy(),
                    pdf["meta"].to_numpy()):
                for fi in _sample_frames_stub(payload,
                                              meta["n_frames"] or 0, k):
                    frame = decode_image(
                        payload + fi.to_bytes(4, "big"),
                        meta["width"], meta["height"])
                    rows.append({"media_id": media_id, "frame_idx": fi,
                                 "frame_phash": _phash(frame)})
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame_phash"])

    return (media.filter(F.col("kind") == "video")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA))


RESIZED_SCHEMA = ("media_id long, width int, height int, payload binary")

AUDIO_FEATURES_SCHEMA = ("media_id long, n_samples long, duration_s double,"
                         " rms double, zero_cross_rate double")


def _resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — REAL (decoder-independent) numpy
    fancy-indexing, not part of the stub: works unchanged the day a
    real decoder lands. Real impl upgrade path: PIL's Lanczos."""
    h, w = img.shape
    rows = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    cols = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[rows[:, None], cols[None, :]]


def resize_images(media: DataFrame, out_w: int = 32,
                  out_h: int = 32) -> DataFrame:
    """image rows → fixed-size thumbnails (decode stubbed; the resize
    itself is real). Output payload = raw row-major uint8 bytes of the
    (out_h, out_w) frame — a real impl would re-encode (PNG) here; the
    fixed-shape contract downstream operators rely on is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                    pdf["media_id"].to_numpy(),
                    pdf["payload"].to_numpy(),
                    pdf["meta"].to_numpy()):
                try:
                    img = decode_image(payload, meta["width"],
                                             meta["height"])
                except ValueError:
                    continue
                small = _resize_nn(img, out_w, out_h)
                rows.append({"media_id": media_id, "width": out_w,
                             "height": out_h,
                             "payload": bytearray(small.tobytes())})
            yield pd.DataFrame(rows, columns=["media_id", "width",
                                              "height", "payload"])

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=RESIZED_SCHEMA))


def _decode_audio_stub(payload: bytes, sample_rate: int,
                       n_samples: int | None = None) -> np.ndarray:
    """STUB audio decoder — deterministic fake int16 PCM from the payload
    hash (tiled), one second per 64 payload bytes. Real impl:
    soundfile/ffmpeg → float PCM. Raises on empty payloads like a real
    decoder."""
    if not payload:
        raise ValueError("empty media payload")
    if n_samples is None:
        n_samples = max(1, len(payload) // 64) * max(sample_rate, 1)
    base = np.frombuffer(hashlib.blake2b(payload, digest_size=64).digest(),
                         dtype=np.int8).astype(np.int16) * 128
    reps = -(-n_samples // len(base))
    return np.tile(base, reps)[:n_samples]


def decode_audio(payload: bytes, sample_rate: int,
                 n_samples: int | None = None) -> np.ndarray:
    """Audio decode seam — REAL backend (stdlib ``wave``, exercised in
    tests since it needs no extra package) for RIFF/WAVE payloads, stub
    fallback for everything else.

    Contract (both backends): bytes → 1-D int16 PCM array;
    deterministic; ValueError on empty/undecodable payloads. Call sites
    (``extract_audio_features``) go through this seam, so a full-codec
    upgrade (soundfile/ffmpeg) slots in here with zero call-site
    changes. WAV path downmixes multi-channel to the first channel and
    widens 8-bit samples to int16."""
    if payload[:4] == b"RIFF":
        import io
        import wave

        try:
            with wave.open(io.BytesIO(payload), "rb") as w:
                n_ch, sw = w.getnchannels(), w.getsampwidth()
                raw = w.readframes(w.getnframes())
        except Exception as e:
            raise ValueError(f"undecodable WAV payload: {e}") from e
        if sw == 2:
            pcm = np.frombuffer(raw, dtype="<i2")
        elif sw == 1:  # unsigned 8-bit → centered int16
            pcm = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16)
                   - 128) * 256
        else:
            raise ValueError(f"unsupported WAV sample width {sw}")
        return np.ascontiguousarray(pcm[::n_ch]) if n_ch > 1 else pcm
    return _decode_audio_stub(payload, sample_rate, n_samples)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """audio rows → duration / RMS / zero-crossing rate (decode stubbed;
    the DSP is real vectorized numpy and survives a real decoder)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload, meta in zip(
                    pdf["media_id"].to_numpy(),
                    pdf["payload"].to_numpy(),
                    pdf["meta"].to_numpy()):
                sr = max(meta["sample_rate"] or 16000, 1)
                try:
                    pcm = decode_audio(payload, sr)
                except ValueError:
                    continue
                x = pcm.astype(np.float64) / 32768.0
                zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) \
                    if len(x) > 1 else 0.0
                rows.append({"media_id": media_id, "n_samples": len(pcm),
                             "duration_s": len(pcm) / sr,
                             "rms": float(np.sqrt(np.mean(x * x))),
                             "zero_cross_rate": zc})
            yield pd.DataFrame(rows, columns=["media_id", "n_samples",
                                              "duration_s", "rms",
                                              "zero_cross_rate"])

    return (media.filter(F.col("kind") == "audio")
            .select("media_id", "payload", "meta")
            .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA))


def near_dup_by_phash(features: DataFrame, max_hamming: int = 4) -> DataFrame:
    """Perceptual-hash near-dup candidates: band the 64-bit phash into
    ``max_hamming + 1`` bit-range keys, then verify exact distance — the
    LSH-then-verify shape of text MinHash, all built-ins except the
    popcount which is a bit-arithmetic expression.

    Recall guarantee (pigeonhole): a pair at Hamming distance ≤ d differs
    in at most d bit positions, so with d+1 disjoint bands at least one
    band is untouched and the pair shares that band's key — complete
    recall for distance ≤ ``max_hamming``. (d+1 bands is the minimum:
    with only d bands a distance-d pair flipping one bit per band shares
    nothing — the r2 4-band layout silently dropped exactly those pairs
    at d=4, guaranteed only ≤ 3.) Bands split 64 bits as evenly as
    possible (e.g. d=4 → widths 13,13,13,13,12)."""
    n_bands = max_hamming + 1
    if not 1 <= n_bands <= 64:
        raise ValueError(f"max_hamming must be in [0, 63], got {max_hamming}")
    base, rem = divmod(64, n_bands)
    widths = [base + (i < rem) for i in range(n_bands)]
    offsets = [sum(widths[:i]) for i in range(n_bands)]
    masks = [-1 if w == 64 else (1 << w) - 1 for w in widths]  # int64 lits
    bands = features.select(
        "media_id", "phash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftrightunsigned(F.col("phash"), offsets[i])
                      .bitwiseAND(masks[i]).alias("key"))
            for i in range(n_bands)])).alias("b")
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
    a seeded hash; ~1/8 rows are byte-duplicates (near-dup fodder).
    ids [0, n) are image/video; n//8 audio rows follow at ids [n, n+n//8)
    so kind-filtered counts stay stable for the image/video tests."""
    rows = []
    for i in range(n):
        base = i - (i % 8 == 1)  # every 8th pair duplicates the previous id
        payload = hashlib.blake2b(f"media{seed}:{base}".encode(),
                                  digest_size=32).digest() * 4
        kind = "video" if i % 5 == 0 else "image"
        rows.append((i, kind, bytearray(payload),
                     (64, 48, 40 if kind == "video" else 1, 16000, "fake")))
    for j in range(n // 8):
        payload = hashlib.blake2b(f"audio{seed}:{j}".encode(),
                                  digest_size=32).digest() * 4
        rows.append((n + j, "audio", bytearray(payload),
                     (0, 0, 0, 16000, "fake")))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
