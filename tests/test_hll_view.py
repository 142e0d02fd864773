"""Incremental HLL register view (sources/sketch_view.py): standing
max-merge register table ≡ batch hll_estimate over the live corpus; folds
are keyed manifest deltas touching only the delta's buckets; non-insert
feeds refuse (monotone lattice); exactly-once watermark; streaming CDC;
rebucket re-lays."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import spookystuff_spark.sources.sketch_view as H
from spookystuff_spark.operators.sketch import hll_estimate
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import last_processed_version
from spookystuff_spark.sources.partitioned_table import _part_of

P = 6  # 64 registers: small enough to exercise collisions at test scale


def _rows(spark, ids, grp_mod=3):
    return spark.createDataFrame(
        [(i, f"g{i % grp_mod}", f"u{i % 37}") for i in ids],
        "k long, grp string, uid string",
    )


def _est(df):
    return {
        (r["grp"], r["est_distinct"], r["zero_regs"]) for r in df.collect()
    }


def _batch(spark, src):
    return _est(hll_estimate(U.read_table(spark, src), ["grp"], "uid", p=P))


@pytest.fixture
def built(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "hll")
    U.write_table(_rows(spark, range(40)), src)
    H.build_hll_view(spark, src, dst, ["grp"], "uid", p=P, dst_buckets=4)
    return src, dst


def test_incremental_equals_batch_through_insert_batches(spark, built):
    src, dst = built
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)
    # several insert batches, including one that only grows existing regs
    U.append_rows(spark, src, _rows(spark, range(100, 140)))
    U.append_rows(spark, src, _rows(spark, range(200, 205)))
    assert H.refresh_hll_view(spark, src, dst) is not None
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)
    # exactly-once: nothing new → None, no new version
    n = len(U.committed_versions(dst))
    assert H.refresh_hll_view(spark, src, dst) is None
    assert len(U.committed_versions(dst)) == n


def test_one_group_delta_rewrites_one_bucket(spark, built):
    src, dst = built
    seed_m = U.read_manifest(dst, U._latest(dst))
    assert len({_part_of(e) for e in seed_m["files"]}) > 1  # multi-bucket
    one_group = spark.createDataFrame(
        [(900, "g1", "u-new-1"), (901, "g1", "u-new-2")],
        "k long, grp string, uid string",
    )
    U.append_rows(spark, src, one_group)
    v = H.refresh_hll_view(spark, src, dst)
    raw = U._read_manifest_raw(dst, v)
    assert "files_base" in raw, "keyed refresh must commit a manifest delta"
    added = {_part_of(e) for e in raw["files_add"]}
    removed = {_part_of(e) for e in raw["files_remove"]}
    assert len(added) == 1, f"one-group delta rewrote buckets {added}"
    assert removed <= added
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)


def test_delete_and_update_feeds_refuse(spark, built):
    src, dst = built
    U.delete_where(spark, src, F.col("k") == 0)
    with pytest.raises(ValueError, match="monotone"):
        H.refresh_hll_view(spark, src, dst)
    # the watermark did NOT advance: the refusal is re-raised until the
    # caller rebuilds (no silent skip-over of the delete)
    src2, dst2 = src + "2", dst + "2"
    U.write_table(_rows(spark, range(10)), src2)
    H.build_hll_view(spark, src2, dst2, ["grp"], "uid", p=P, dst_buckets=4)
    U.upsert(
        spark, src2,
        spark.createDataFrame(
            [(0, "g0", "changed")], "k long, grp string, uid string"
        ),
        ["k"], feed_preimages=True,
    )
    with pytest.raises(ValueError, match="monotone"):
        H.refresh_hll_view(spark, src2, dst2)


def test_feedless_version_advances_watermark_o1(spark, built):
    src, dst = built
    U.compact(spark, src)  # feed-less maintenance commit
    v = H.refresh_hll_view(spark, src, dst)
    assert v is not None
    assert last_processed_version(dst) == U.committed_versions(src)[-1]
    raw = U._read_manifest_raw(dst, v)
    assert raw.get("files_add") == []  # watermark-only: zero data files
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)


def test_streaming_refresh_follows_cdc(spark, tmp_path, built):
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    src, dst = built
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", src)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(H.streaming_refresh_sink(src, dst))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        U.append_rows(spark, src, _rows(spark, range(300, 330)))
        q.processAllAvailable()
        U.append_rows(spark, src, _rows(spark, range(400, 420)))
        q.processAllAvailable()
    finally:
        q.stop()
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)


def test_rebucket_re_lays_and_answers_identically(spark, built):
    from spookystuff_spark.sources.incremental import agg_layout, rebucket

    src, dst = built
    want = _est(H.read_hll_view(spark, dst))
    assert rebucket(spark, dst, 16) is not None
    assert agg_layout(dst)[0] == 16
    assert _est(H.read_hll_view(spark, dst)) == want
    # folds resume at the new count
    U.append_rows(spark, src, _rows(spark, range(500, 520)))
    assert H.refresh_hll_view(spark, src, dst) is not None
    assert _est(H.read_hll_view(spark, dst)) == _batch(spark, src)
