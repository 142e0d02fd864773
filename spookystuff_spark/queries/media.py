"""Image perceptual-hash near-dup dedup, gate-pinned end-to-end.

``q_image_phash`` drives the full multimodal pipeline — synthesize PGM
blobs (deterministic per doc_id), ``decode_image`` (the real binary-PGM
parser), ``image_phash`` (32×32 DCT hash), ``phash_neardup_pairs``
(banded Hamming join) — and every hash AND every discovered pair is
value-pinned through ``q_text_suite``'s melt against an independently
computed golden (tools/gen_goldens.py gold_media). Planted structure:
every doc_id % 3 == 0 gets an image; doc_id % 12 == 0 additionally gets a
noise-perturbed variant that pHash must (and, golden-verified, does) find
within Hamming ≤ 7 while unrelated images stay ≥ 16 apart.

Image synthesis is a dense random low-frequency DCT spectrum (md5-seeded,
decaying 90/(1+u+v) magnitudes) inverse-transformed to 32×32 and pixel-
doubled to 64×64 — i.e. photo-like smooth content where pHash's
coefficient-vs-median bits are far from their decision boundary, unlike
pure sinusoids whose near-zero coefficients make the hash flip under any
noise. The noisy variant adds a small (±4) high-frequency sinusoid that
leaves the low-frequency block nearly untouched.

Scale shape: synthesis/decoding/hashing are one narrow Arrow stage
(no shuffle); the pair join is band-bucketed (never all-pairs) with the
standard oversized-bucket cap; verification is JVM ``bit_count``.
"""

from __future__ import annotations

from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import BinaryType, LongType, StructField, StructType

from spookystuff_spark.queries import bench_only
from spookystuff_spark.tables import table

IMG_EVERY = 3  # doc_id % 3 == 0 → one synthetic image
DUP_EVERY = 12  # doc_id % 12 == 0 → plus a noisy near-duplicate


def _synth_pixels(doc_id: int, noisy: bool):
    """64×64 grayscale uint8 image, deterministic in (doc_id, noisy)."""
    import hashlib

    import numpy as np

    m = 32
    C = np.zeros((m, m))
    for u in range(8):
        for v in range(8):
            h = hashlib.md5(f"img-{doc_id}-{u * 8 + v}".encode()).digest()
            r = int.from_bytes(h[:8], "big") / 2**64 * 2 - 1  # [-1, 1)
            C[u, v] = r * 90.0 / (1.0 + u + v)
    t = np.cos(
        np.pi * (2 * np.arange(m)[None, :] + 1) * np.arange(m)[:, None] / (2 * m)
    ) * np.sqrt(2.0 / m)
    t[0, :] = np.sqrt(1.0 / m)
    img = np.repeat(np.repeat(t.T @ C @ t, 2, 0), 2, 1) + 128.0
    if noisy:
        n = 64
        y = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        img = img + 4 * np.sin(2 * np.pi * 14 * x / n + doc_id % 5) * np.sin(
            2 * np.pi * 15 * y / n
        )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def synth_image_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(img_id, media): P5 PGM blobs. img_id = doc_id*10 + variant."""
    ids = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % IMG_EVERY == 0)
    )
    base = ids.select(
        (F.col("doc_id") * 10).alias("img_id"), "doc_id", F.lit(0).alias("variant")
    )
    noisy = ids.where(F.col("doc_id") % DUP_EVERY == 0).select(
        (F.col("doc_id") * 10 + 1).alias("img_id"),
        "doc_id",
        F.lit(1).alias("variant"),
    )
    spec = base.unionByName(noisy)
    out_schema = StructType(
        [StructField("img_id", LongType()), StructField("media", BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = [
                b"P5\n64 64\n255\n"
                + _synth_pixels(int(d), bool(v)).tobytes()
                for d, v in zip(pdf["doc_id"], pdf["variant"])
            ]
            yield pd.DataFrame({"img_id": pdf["img_id"], "media": blobs})

    return spec.mapInPandas(run, out_schema)


def hashed_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.operators.multimodal import decode_image, image_phash

    return image_phash(decode_image(synth_image_frame(spark, sf_dir), "media"))


@bench_only("q_image_phash")
def q_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup image pairs (id_a, id_b, hamming) over the synthetic corpus."""
    from spookystuff_spark.operators.multimodal import phash_neardup_pairs

    pairs, _ = phash_neardup_pairs(
        hashed_images(spark, sf_dir), "img_id", "phash", max_hamming=7
    )
    return pairs


def media_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt rows pinning every pHash (alias ``phash``) and every discovered
    near-dup pair (alias ``phashpairs``) for q_text_suite's gate."""
    from spookystuff_spark.operators.multimodal import phash_neardup_pairs
    from spookystuff_spark.queries.tpch_suites import _melt

    # pin (id, hash) once: the melt consumes it twice (hash rows + pair
    # join input) and the synth/decode/hash Arrow stages must not re-run
    hashed = (
        hashed_images(spark, sf_dir)
        .select("img_id", "phash", "phash_hex")
        .localCheckpoint(eager=True)
    )
    pairs, _ = phash_neardup_pairs(hashed, "img_id", "phash", max_hamming=7)
    hash_rows = _melt(
        hashed.select("img_id", "phash_hex").withColumn("one", F.lit(1)),
        "phash",
        ["img_id", "phash_hex"],
        ["one"],
    )
    pair_rows = _melt(pairs, "phashpairs", ["id_a", "id_b"], ["hamming"])
    return hash_rows.unionByName(pair_rows)


# ------------------------------------------------------- audio fingerprint

AUD_EVERY = 5  # doc_id % 5 == 0 → one synthetic WAV clip
AUD_DUP_EVERY = 20  # doc_id % 20 == 0 → plus a noise-perturbed variant
AUD_RATE = 4000
AUD_SECS = 2.0
_AUD_SEGS = 9  # matches the fingerprint's 9 time frames


def _synth_samples(doc_id: int, noisy: bool):
    """2 s of 4 kHz mono int16 — a 9-segment 'melody' of md5-derived tone
    chords. Time-VARYING by construction: the Haitsma-Kalker bits are
    time-and-frequency double differences, which are near-zero (and so
    noise-fragile) on stationary signals; per-segment chords give every
    frame a distinct band-energy profile. The noisy variant adds two
    out-of-chord low/high tones ~30 dB down."""
    import hashlib

    import numpy as np

    n = int(AUD_RATE * AUD_SECS)
    t = np.arange(n) / AUD_RATE
    sig = np.zeros(n)
    L = n // _AUD_SEGS
    for s in range(_AUD_SEGS):
        seg_t = t[s * L : (s + 1) * L]
        for k in range(4):
            h = hashlib.md5(f"aud-{doc_id}-{s}-{k}".encode()).digest()
            f = 80 + int.from_bytes(h[:4], "big") % 1800
            a = 0.15 + (int.from_bytes(h[4:8], "big") % 1000) / 2000.0
            p = (int.from_bytes(h[8:12], "big") % 6283) / 1000.0
            sig[s * L : (s + 1) * L] += a * np.sin(2 * np.pi * f * seg_t + p)
    if noisy:
        sig = sig + 0.02 * np.sin(2 * np.pi * 1950 * t) + 0.02 * np.sin(
            2 * np.pi * 63 * t + 1.0
        )
    sig = sig * 0.9 / np.max(np.abs(sig))
    return np.clip(np.round(sig * 32767), -32768, 32767).astype("<i2")


def _wav_blob(samples) -> bytes:
    import struct

    data = samples.tobytes()
    n = len(data)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, AUD_RATE, AUD_RATE * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + data
    )


def synth_audio_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(clip_id, media): 16-bit PCM WAV blobs. clip_id = doc_id*10+variant."""
    ids = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % AUD_EVERY == 0)
    )
    base = ids.select(
        (F.col("doc_id") * 10).alias("clip_id"), "doc_id", F.lit(0).alias("variant")
    )
    noisy = ids.where(F.col("doc_id") % AUD_DUP_EVERY == 0).select(
        (F.col("doc_id") * 10 + 1).alias("clip_id"),
        "doc_id",
        F.lit(1).alias("variant"),
    )
    spec = base.unionByName(noisy)
    out_schema = StructType(
        [StructField("clip_id", LongType()), StructField("media", BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = [
                _wav_blob(_synth_samples(int(d), bool(v)))
                for d, v in zip(pdf["doc_id"], pdf["variant"])
            ]
            yield pd.DataFrame({"clip_id": pdf["clip_id"], "media": blobs})

    return spec.mapInPandas(run, out_schema)


def fingerprinted_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.operators.multimodal import audio_fingerprint

    return audio_fingerprint(synth_audio_frame(spark, sf_dir), "media")


@bench_only("q_audio_fingerprint")
def q_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup audio pairs (id_a, id_b, hamming) over the synthetic clips."""
    from spookystuff_spark.operators.multimodal import hamming64_neardup_pairs

    pairs, _ = hamming64_neardup_pairs(
        fingerprinted_audio(spark, sf_dir), "clip_id", "afp", max_hamming=7
    )
    return pairs


def audio_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt rows pinning every fingerprint (alias ``afp``) and every
    discovered near-dup pair (alias ``afppairs``)."""
    from spookystuff_spark.operators.multimodal import hamming64_neardup_pairs
    from spookystuff_spark.queries.tpch_suites import _melt

    fp = (
        fingerprinted_audio(spark, sf_dir)
        .select("clip_id", "afp", "afp_hex")
        .localCheckpoint(eager=True)  # hash once, consume twice
    )
    pairs, _ = hamming64_neardup_pairs(fp, "clip_id", "afp", max_hamming=7)
    fp_rows = _melt(
        fp.select("clip_id", "afp_hex").withColumn("one", F.lit(1)),
        "afp",
        ["clip_id", "afp_hex"],
        ["one"],
    )
    pair_rows = _melt(pairs, "afppairs", ["id_a", "id_b"], ["hamming"])
    return fp_rows.unionByName(pair_rows)


# ---------------------------------------------------------- video near-dup

VID_EVERY = 7  # doc_id % 7 == 0 → one synthetic Y4M clip
VID_DUP_EVERY = 28  # doc_id % 28 == 0 → plus a noise-perturbed variant
VID_FRAMES = 8
_VID_W = _VID_H = 64


def _y4m_blob(doc_id: int, noisy: bool) -> bytes:
    """8-frame 64×64 C420 YUV4MPEG2 clip; frame f's luma plane is the
    spectral synth image seeded by doc_id·101 + f (chroma flat 128). The
    noisy variant perturbs every frame the same way the image pipeline
    does — per-frame pHashes stay within Hamming 7 of the base clip's."""
    import numpy as np

    parts = [f"YUV4MPEG2 W{_VID_W} H{_VID_H} F25:1 C420\n".encode()]
    uv = bytes([128]) * (_VID_W * _VID_H // 2)
    for f in range(VID_FRAMES):
        y = _synth_pixels(doc_id * 101 + f, noisy)
        parts.append(b"FRAME\n" + y.tobytes() + uv)
    return b"".join(parts)


def synth_video_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vid_id, media): Y4M blobs. vid_id = doc_id*10 + variant."""
    ids = (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % VID_EVERY == 0)
    )
    base = ids.select(
        (F.col("doc_id") * 10).alias("vid_id"), "doc_id", F.lit(0).alias("variant")
    )
    noisy = ids.where(F.col("doc_id") % VID_DUP_EVERY == 0).select(
        (F.col("doc_id") * 10 + 1).alias("vid_id"),
        "doc_id",
        F.lit(1).alias("variant"),
    )
    spec = base.unionByName(noisy)
    out_schema = StructType(
        [StructField("vid_id", LongType()), StructField("media", BinaryType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            blobs = [
                _y4m_blob(int(d), bool(v))
                for d, v in zip(pdf["doc_id"], pdf["variant"])
            ]
            yield pd.DataFrame({"vid_id": pdf["vid_id"], "media": blobs})

    return spec.mapInPandas(run, out_schema)


def video_frames_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.operators.multimodal import video_frame_phash

    return video_frame_phash(synth_video_frame(spark, sf_dir), "media")


@bench_only("q_video_neardup")
def q_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup video pairs (id_a, id_b, n_frame_matches ≥ 6 of 8)."""
    from spookystuff_spark.operators.multimodal import video_neardup_pairs

    pairs, _ = video_neardup_pairs(
        video_frames_hashed(spark, sf_dir),
        "vid_id",
        max_hamming=7,
        min_matching_frames=6,
    )
    return pairs


def video_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt rows pinning every frame hash (alias ``vfp``) and every video
    near-dup pair (alias ``vfppairs``)."""
    from spookystuff_spark.operators.multimodal import video_neardup_pairs
    from spookystuff_spark.queries.tpch_suites import _melt

    frames = (
        video_frames_hashed(spark, sf_dir)
        .select("vid_id", "frame_idx", "fphash", "fphash_hex")
        .localCheckpoint(eager=True)  # hash once, consume twice
    )
    pairs, _ = video_neardup_pairs(
        frames, "vid_id", max_hamming=7, min_matching_frames=6
    )
    frame_rows = _melt(
        frames.select("vid_id", "frame_idx", "fphash_hex").withColumn(
            "one", F.lit(1)
        ),
        "vfp",
        ["vid_id", "frame_idx", "fphash_hex"],
        ["one"],
    )
    pair_rows = _melt(pairs, "vfppairs", ["id_a", "id_b"], ["n_frame_matches"])
    return frame_rows.unionByName(pair_rows)
