"""Incremental streaming near-dup dedup: cross-batch detection, in-batch
lower-id-wins, exactly-once replays, and end-to-end Structured Streaming."""

from __future__ import annotations

import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.streaming.neardup_stream import (
    accepted_ids,
    streaming_neardup_sink,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun of a summer day"
)
NEAR = BASE.replace("lazy dog", "lazy dogs")  # near-dup of BASE
OTHER = (
    "completely different content about distributed query engines and "
    "columnar execution with vectorized operators over arrow batches"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cross_batch_and_in_batch_near_dups(spark, tmp_path):
    sdir = str(tmp_path / "state")
    out = []
    sink = streaming_neardup_sink(
        sdir, on_accept=lambda df: out.extend(r["doc_id"] for r in df.collect())
    )
    # batch 0: BASE (id 1) and an in-batch near-dup of it (id 2) + OTHER (3)
    sink(_df(spark, [(1, BASE), (2, NEAR), (3, OTHER)]), 0)
    assert sorted(out) == [1, 3]  # 2 dropped in-batch, lower id wins
    assert {r["id"] for r in accepted_ids(spark, sdir).collect()} == {1, 3}

    # batch 1: another near-dup of BASE (4) and a genuinely fresh doc (5)
    fresh = (
        "entirely novel passage describing mountain weather patterns and "
        "the slow drift of glaciers under a pale winter morning sky"
    )
    out.clear()
    sink(_df(spark, [(4, NEAR), (5, fresh)]), 1)
    assert out == [5]  # 4 dropped against accepted state
    assert {r["id"] for r in accepted_ids(spark, sdir).collect()} == {1, 3, 5}


def test_replay_is_exactly_once(spark, tmp_path):
    sdir = str(tmp_path / "state")
    calls = []
    sink = streaming_neardup_sink(
        sdir, on_accept=lambda df: calls.append(df.count())
    )
    sink(_df(spark, [(1, BASE)]), 0)
    n_versions = len(U.committed_versions(sdir))
    sink(_df(spark, [(1, BASE)]), 0)  # crash replay of the same batch
    assert len(U.committed_versions(sdir)) == n_versions
    assert calls == [1]  # on_accept not re-fired for the replay


def test_end_to_end_stream(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    sdir = str(tmp_path / "state")
    (src / "f0.json").write_text(
        f'{{"doc_id": 1, "text": "{BASE}"}}\n'
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(streaming_neardup_sink(sdir))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "f1.json").write_text(
            f'{{"doc_id": 2, "text": "{NEAR}"}}\n'
            f'{{"doc_id": 3, "text": "{OTHER}"}}\n'
        )
        q.processAllAvailable()
    finally:
        q.stop()
    assert {r["id"] for r in accepted_ids(spark, sdir).collect()} == {1, 3}


def test_state_never_holds_text(spark, tmp_path):
    sdir = str(tmp_path / "state")
    sink = streaming_neardup_sink(sdir)
    sink(_df(spark, [(1, BASE), (3, OTHER)]), 0)
    cols = set(U.read_table(spark, sdir).columns)
    assert cols == {"id", "band", "band_hash"}  # sketches only, no payload


def test_probe_plan_never_shuffles_state(spark, tmp_path):
    """The state⋈batch probe must be a broadcast hash join of the BATCH side
    — a SortMergeJoin here would re-shuffle the corpus-sized state every
    micro-batch (the classic streaming-dedup scale bug)."""
    from spookystuff_spark.operators.dedup import minhash_bands
    from spookystuff_spark.streaming.neardup_stream import near_dup_ids

    sdir = str(tmp_path / "state")
    sink = streaming_neardup_sink(sdir)
    sink(_df(spark, [(1, BASE), (3, OTHER)]), 0)

    state = U.read_table(spark, sdir)
    batch = minhash_bands(_df(spark, [(7, NEAR)]), "doc_id", "text", bands=16)
    plan = (
        near_dup_ids(state, batch)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # the state side must not be sort-merge joined (batch self-join is
    # batch-sized either way, but assert the strong form: none anywhere)
    assert "SortMergeJoin" not in plan


def test_in_sink_compaction_and_vacuum(spark, tmp_path):
    """compact_every bounds BOTH the state file count and the version list
    while leaving dedup results identical — and replay protection survives
    vacuum dropping the original marker versions (the compacted commit
    carries the batch marker forward)."""
    plain_dir = str(tmp_path / "plain")
    maint_dir = str(tmp_path / "maint")
    texts = [
        (0, BASE), (1, NEAR), (2, OTHER),
        (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3),
        (4, OTHER.replace("arrow", "feather")),
        (5, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do " * 2),
        (6, BASE.replace("summer", "winter")),
        (7, "unique seventh document with entirely fresh vocabulary tokens"),
    ]
    plain = streaming_neardup_sink(plain_dir)
    maint = streaming_neardup_sink(
        maint_dir, compact_every=2, compact_files=2, vacuum_keep=2
    )
    for b in range(4):  # 4 batches x 2 docs
        batch = _df(spark, texts[b * 2 : b * 2 + 2])
        plain(batch, b)
        maint(batch, b)

    got_plain = {r["id"] for r in accepted_ids(spark, plain_dir).collect()}
    got_maint = {r["id"] for r in accepted_ids(spark, maint_dir).collect()}
    assert got_maint == got_plain and len(got_maint) > 0

    # maintenance bounded the physical layout; the plain table accretes
    assert len(U.committed_versions(maint_dir)) <= 2
    assert U.snapshot_file_stats(maint_dir)["n_files"] <= 2
    assert len(U.committed_versions(plain_dir)) == 4

    # replay protection survived the vacuum: every original append version
    # of batches 0-2 is gone, yet a replay of batch 2 commits nothing
    n_before = len(U.committed_versions(maint_dir))
    maint(_df(spark, texts[4:6]), 2)
    assert len(U.committed_versions(maint_dir)) == n_before

    # and a genuinely new batch still lands
    maint(_df(spark, [(8, "yet another totally new final document text")]), 4)
    assert 8 in {r["id"] for r in accepted_ids(spark, maint_dir).collect()}


# -------------------------------------------- 64-bit-signature media twin


def _sig_df(spark, rows):
    return spark.createDataFrame(rows, "img_id long, phash long")


def test_hash_sink_cross_batch_and_in_batch(spark, tmp_path):
    from spookystuff_spark.streaming.neardup_stream import (
        streaming_hash_neardup_sink,
    )

    sdir = str(tmp_path / "hstate")
    out = []
    sink = streaming_hash_neardup_sink(
        sdir, "img_id", "phash", max_hamming=7,
        on_accept=lambda df: out.extend(r["img_id"] for r in df.collect()),
    )
    H = 0x0123_4567_89AB_CDEF
    # batch 0: base, near-dup (1 bit flipped), and a far hash
    sink(_sig_df(spark, [(1, H), (2, H ^ 0b1), (3, ~H)]), 0)
    assert sorted(out) == [1, 3]
    # batch 1: near-dup of accepted 1 (2 bits) + genuinely new
    out.clear()
    sink(_sig_df(spark, [(4, H ^ 0b11), (5, 0x0F0F_0F0F_0F0F_0F0F)]), 1)
    assert out == [5]
    assert {r["id"] for r in accepted_ids(spark, sdir).collect()} == {1, 3, 5}


def test_hash_sink_replay_and_maintenance(spark, tmp_path):
    from spookystuff_spark.streaming.neardup_stream import (
        streaming_hash_neardup_sink,
    )

    sdir = str(tmp_path / "hstate")
    sink = streaming_hash_neardup_sink(
        sdir, "img_id", "phash", app_id="ck1",
        compact_every=2, compact_files=1, vacuum_keep=2,
    )
    for b in range(4):
        sink(_sig_df(spark, [(b * 10, b * 0x1111_1111_1111)]), b)
    assert len(U.committed_versions(sdir)) <= 2
    assert U.snapshot_file_stats(sdir)["n_files"] <= 1
    n = len(U.committed_versions(sdir))
    sink(_sig_df(spark, [(99, 0x7777)]), 2)  # replay after vacuum: no-op
    assert len(U.committed_versions(sdir)) == n
    assert 99 not in {r["id"] for r in accepted_ids(spark, sdir).collect()}


def test_hash_sink_validates_banding(spark, tmp_path):
    from spookystuff_spark.streaming.neardup_stream import (
        streaming_hash_neardup_sink,
    )

    with pytest.raises(ValueError):
        streaming_hash_neardup_sink(str(tmp_path), "i", "h", max_hamming=8)


def test_hash_sink_end_to_end_with_phash_stream(spark, tmp_path):
    """Full composition: a STREAM of image blobs → image_phash on the
    streaming frame (narrow Arrow stage) → foreachBatch hash sink — the
    media mirror of the text E2E stream test."""
    from spookystuff_spark.operators.multimodal import decode_image, image_phash
    from spookystuff_spark.queries.media import _synth_pixels
    from spookystuff_spark.streaming.neardup_stream import (
        streaming_hash_neardup_sink,
    )

    src = tmp_path / "imgs"
    src.mkdir()
    import json as _json

    rows = []
    for d in (0, 1, 2):
        rows.append({"img_id": d * 10,
                     "blob_hex": (b"P5\n64 64\n255\n" + _synth_pixels(d, False).tobytes()).hex()})
    rows.append({"img_id": 5,
                 "blob_hex": (b"P5\n64 64\n255\n" + _synth_pixels(0, True).tobytes()).hex()})
    (src / "batch.jsonl").write_text("\n".join(_json.dumps(r) for r in rows))

    import pyspark.sql.functions as F

    stream = (
        spark.readStream.schema("img_id long, blob_hex string")
        .json(str(src))
        .withColumn("media", F.unhex("blob_hex"))
    )
    hashed = image_phash(decode_image(stream, "media"))
    sdir = str(tmp_path / "state")
    q = (
        hashed.writeStream.foreachBatch(
            streaming_hash_neardup_sink(sdir, "img_id", "phash")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["id"] for r in accepted_ids(spark, sdir).collect()}
    # the noisy variant of image 0 (id 5) must be dropped as a near-dup
    assert got == {0, 10, 20}
