"""Image pHash near-dup: hash robustness/separation, banded-join recall vs
brute force, bucket cap, and the decode→hash→join pipeline over real PGM
blobs (operators/multimodal.py; planted-pair corpus from queries/media.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.multimodal import (
    _phash_one,
    decode_image,
    image_phash,
    phash_neardup_pairs,
)
from spookystuff_spark.queries.media import _synth_pixels, synth_image_frame


def _ham(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_phash_noise_robust_and_separating():
    """Noisy variant stays within hamming 7 of its base; unrelated images
    stay far apart — the property that makes banded near-dup meaningful."""
    base = {d: _phash_one(_synth_pixels(d, False).tobytes(), 64, 64, 1) for d in (0, 12, 24, 36)}
    for d, h in base.items():
        noisy = _phash_one(_synth_pixels(d, True).tobytes(), 64, 64, 1)
        assert _ham(h, noisy) <= 7
    vals = list(base.values())
    for i in range(len(vals)):
        for j in range(i + 1, len(vals)):
            assert _ham(vals[i], vals[j]) > 7


def test_phash_scale_invariant():
    """The 32×32 normalization makes pHash identical across pixel-doubled
    renditions of the same image (scale near-dup, not just noise)."""
    import numpy as np

    px = _synth_pixels(6, False)  # 64×64
    up = np.repeat(np.repeat(px, 2, 0), 2, 1)  # 128×128
    assert _phash_one(px.tobytes(), 64, 64, 1) == _phash_one(
        up.tobytes(), 128, 128, 1
    )


def test_banded_join_matches_bruteforce(spark):
    hashed = image_phash(
        decode_image(synth_image_frame(spark, "/root/testdata/sf0.001"), "media")
    )
    rows = [(r.img_id, r.phash) for r in hashed.select("img_id", "phash").collect()]
    assert all(ph is not None for _, ph in rows)
    brute = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, pa), (ib, pb) = rows[i], rows[j]
            d = _ham(pa & ((1 << 64) - 1), pb & ((1 << 64) - 1))
            if d <= 7:
                brute.add((min(ia, ib), max(ia, ib), d))
    pairs, dropped = phash_neardup_pairs(hashed, "img_id", "phash", max_hamming=7)
    got = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    assert dropped == 0
    assert got == brute
    assert len(got) > 0  # the planted noisy variants are actually found


def test_bucket_cap_drops_loudly(spark):
    # 50 identical hashes → every band bucket holds 50 > cap 10 → all dropped
    df = spark.createDataFrame(
        [(i, 0x1234_5678_9ABC_DEF0) for i in range(50)], "img_id long, phash long"
    )
    pairs, dropped = phash_neardup_pairs(
        df, "img_id", "phash", max_hamming=7, max_bucket=10
    )
    assert dropped == 8  # all 8 bands oversized
    assert pairs.count() == 0


def test_parameter_validation(spark):
    df = spark.createDataFrame([(1, 2)], "img_id long, phash long")
    with pytest.raises(ValueError):
        phash_neardup_pairs(df, "img_id", "phash", max_hamming=8, n_bands=8)
    with pytest.raises(ValueError):
        phash_neardup_pairs(df, "img_id", "phash", n_bands=7)


def test_failed_decode_rows_get_null_phash(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xffjpeg-not-decodable"))],
        "img_id long, media binary",
    )
    out = image_phash(decode_image(df, "media")).collect()
    assert out[0].decode_ok == "unsupported"
    assert out[0].phash is None and out[0].phash_hex is None


def test_negative_phash_band_extraction(spark):
    """Hashes with the top bit set are stored as negative int64 —
    shiftrightunsigned banding must still work (a sign-extending shift
    would corrupt the high band)."""
    h1 = -(1 << 63) + 5  # unsigned 0x8000...0005
    h2 = -(1 << 63) + 7  # hamming(h1, h2) = ham(5, 7) = 1
    df = spark.createDataFrame(
        [(1, h1), (2, h2)], "img_id long, phash long"
    )
    pairs, _ = phash_neardup_pairs(df, "img_id", "phash", max_hamming=2)
    got = [(r.id_a, r.id_b, r.hamming) for r in pairs.collect()]
    assert got == [(1, 2, 1)]


# ------------------------------------------------------- audio fingerprint


def test_audio_fingerprint_noise_robust_and_separating(spark):
    from spookystuff_spark.operators.multimodal import audio_fingerprint
    from spookystuff_spark.queries.media import _synth_samples, _wav_blob

    rows = []
    for d in (0, 20, 40):
        rows.append((d * 10, bytearray(_wav_blob(_synth_samples(d, False)))))
        rows.append((d * 10 + 1, bytearray(_wav_blob(_synth_samples(d, True)))))
    df = spark.createDataFrame(rows, "clip_id long, media binary")
    got = {
        r.clip_id: (r.afp, r.decode_ok, r.sample_rate, r.duration_s)
        for r in audio_fingerprint(df, "media").collect()
    }
    assert all(v[1] == "ok" and v[2] == 4000 and v[3] == 2.0 for v in got.values())
    for d in (0, 20, 40):
        assert _ham(got[d * 10][0], got[d * 10 + 1][0]) <= 7  # planted pair
    bases = [got[d * 10][0] for d in (0, 20, 40)]
    for i in range(3):
        for j in range(i + 1, 3):
            assert _ham(bases[i], bases[j]) > 7  # different content


def test_audio_pipeline_banded_matches_bruteforce(spark):
    from spookystuff_spark.operators.multimodal import hamming64_neardup_pairs
    from spookystuff_spark.queries.media import fingerprinted_audio

    fp = fingerprinted_audio(spark, "/root/testdata/sf0.001")
    rows = [(r.clip_id, r.afp) for r in fp.select("clip_id", "afp").collect()]
    assert all(a is not None for _, a in rows)
    brute = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            (ia, va), (ib, vb) = rows[i], rows[j]
            d = _ham(va & ((1 << 64) - 1), vb & ((1 << 64) - 1))
            if d <= 7:
                brute.add((min(ia, ib), max(ia, ib), d))
    pairs, dropped = hamming64_neardup_pairs(fp, "clip_id", "afp", max_hamming=7)
    assert dropped == 0
    assert {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()} == brute
    assert len(brute) > 0


def test_audio_fingerprint_rejects_non_wav(spark):
    from spookystuff_spark.operators.multimodal import audio_fingerprint

    df = spark.createDataFrame(
        [(1, bytearray(b"ID3mp3-payload")), (2, bytearray(b"RIFFxxxxWAVE"))],
        "clip_id long, media binary",
    )
    got = {r.clip_id: (r.decode_ok, r.afp) for r in audio_fingerprint(df, "media").collect()}
    assert got[1] == ("unsupported", None)
    assert got[2] == ("corrupt", None)


# ---------------------------------------------------------- video near-dup


def test_video_neardup_planted_pairs_and_threshold(spark):
    """Noisy variant matches on all 8 frames; a clip sharing only 4 of 8
    frames stays below min_matching_frames=6; unrelated clips share none."""
    from spookystuff_spark.operators.multimodal import (
        video_frame_phash,
        video_neardup_pairs,
    )
    from spookystuff_spark.queries.media import _y4m_blob, _synth_pixels, VID_FRAMES

    import numpy as np

    uv = bytes([128]) * (64 * 64 // 2)

    def clip(frame_seeds, noisy=False):
        parts = [b"YUV4MPEG2 W64 H64 F25:1 C420\n"]
        for sd in frame_seeds:
            parts.append(b"FRAME\n" + _synth_pixels(sd, noisy).tobytes() + uv)
        return b"".join(parts)

    base_seeds = [101 * 0 + f for f in range(VID_FRAMES)]
    half_seeds = base_seeds[:4] + [9000 + f for f in range(4)]  # 4 shared
    other_seeds = [5000 + f for f in range(VID_FRAMES)]
    rows = [
        (1, bytearray(_y4m_blob(0, False))),   # base (seeds 0..7)
        (2, bytearray(_y4m_blob(0, True))),    # noisy variant: all 8 match
        (3, bytearray(clip(half_seeds))),      # 4 of 8 shared with 1
        (4, bytearray(clip(other_seeds))),     # unrelated
    ]
    df = spark.createDataFrame(rows, "vid_id long, media binary")
    frames = video_frame_phash(df, "media")
    assert frames.where("decode_ok = 'ok'").count() == 4 * VID_FRAMES

    pairs, dropped = video_neardup_pairs(
        frames, "vid_id", max_hamming=7, min_matching_frames=6
    )
    assert dropped == 0
    got = {(r.id_a, r.id_b): r.n_frame_matches for r in pairs.collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 6

    # lowering the threshold to 4 surfaces the half-overlap clip too
    pairs4, _ = video_neardup_pairs(
        frames, "vid_id", max_hamming=7, min_matching_frames=4
    )
    got4 = {(r.id_a, r.id_b) for r in pairs4.collect()}
    assert (1, 3) in got4 and (1, 2) in got4 and (1, 4) not in got4


def test_video_frame_phash_rejects_bad_blobs(spark):
    from spookystuff_spark.operators.multimodal import video_frame_phash

    rows = [
        (1, bytearray(b"\x1aE\xdf\xa3webm-payload")),
        (2, bytearray(b"YUV4MPEG2 W64 H64 C420\nFRAME\nshort")),
    ]
    df = spark.createDataFrame(rows, "vid_id long, media binary")
    got = {r.vid_id: r.decode_ok for r in video_frame_phash(df, "media").collect()}
    assert got == {1: "unsupported", 2: "corrupt"}


def test_video_packing_overflow_guard(spark):
    from spookystuff_spark.operators.multimodal import video_neardup_pairs

    df = spark.createDataFrame(
        [(1 << 60, 0, 5), (2, 0, 5)],
        "vid_id long, frame_idx int, fphash long",
    )
    # the banded join pins its input eagerly, so the guard fires at call time
    with pytest.raises(Exception) as ei:
        pairs, _ = video_neardup_pairs(df, "vid_id")
        pairs.collect()
    assert "packing overflow" in str(ei.value)


def test_banded_join_recall_guarantee_randomized(spark):
    """Pigeonhole recall, empirically: 300 seeded-random base hashes, each
    with a mutated twin at every Hamming distance 0..7 — the banded join
    must find EVERY planted pair at its exact distance (plus any incidental
    collisions, which brute force confirms)."""
    import random

    rng = random.Random(20260814)
    rows = []
    planted = set()
    next_id = 0
    for _ in range(300):
        base = rng.getrandbits(64)
        d = rng.randint(0, 7)
        bits = rng.sample(range(64), d)
        mut = base
        for b in bits:
            mut ^= 1 << b
        ida, idb = next_id, next_id + 1
        next_id += 2
        signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v
        rows.append((ida, signed(base)))
        rows.append((idb, signed(mut)))
        planted.add((ida, idb, d))
    df = spark.createDataFrame(rows, "img_id long, phash long")
    pairs, dropped = phash_neardup_pairs(df, "img_id", "phash", max_hamming=7)
    got = {(r.id_a, r.id_b, r.hamming) for r in pairs.collect()}
    assert dropped == 0
    missing = {p for p in planted if p[2] <= 7} - got
    assert not missing, f"banded join lost planted pairs: {sorted(missing)[:5]}"
    # soundness: every reported pair truly is within 7
    assert all(h <= 7 for _, _, h in got)
