"""Parquet checkpoint manifests + distributed planning (r9): above the
inline threshold a checkpoint's file list (and its consolidated
stats/blooms) lives in a ``_ENTRIES.parquet`` entry table readable as a
DataFrame — partition-pruned reads and bloom point probes then plan
SCAN-SIDE (filter → collect survivors) instead of materializing the file
list as an O(files) JSON fold in driver Python."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources import partitioned_table as PT


def _rows(spark, lo, hi, nparts=8):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % nparts).cast("string").alias("p"),
        (F.col("id") * 3).cast("long").alias("val"),
    )


@pytest.fixture
def small_thresholds(monkeypatch):
    monkeypatch.setattr(U, "CHECKPOINT_INLINE_MAX", 5)
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 3)


def _tip_checkpoint(t):
    tip = U.committed_versions(t)[-1]
    for v in [tip] + U._fold_chain(t, tip):
        raw = U._read_manifest_raw(t, v)
        if U._is_full_manifest(raw):
            return v, raw
    raise AssertionError("no checkpoint in chain")


def test_parquet_checkpoint_roundtrip(spark, tmp_path, small_thresholds):
    """Checkpoints above the inline threshold write the parquet entry
    table; every reader (full scan, fold, partition pruning, stats)
    answers identically to the inline form."""
    t = str(tmp_path / "t")
    PT.write_table_partitioned(_rows(spark, 0, 40), t, "p", stats_cols=["k"])
    for i in range(4):  # force deltas past CHECKPOINT_EVERY → checkpoint
        PT.append_partitioned(
            spark, t, _rows(spark, 100 + 10 * i, 110 + 10 * i), "p",
            stats_cols=["k"],
        )
    ckpt, raw = _tip_checkpoint(t)
    assert "entries_ref" in raw and "files" not in raw
    assert raw.get("consolidated") is True
    # full read still exact
    tip = U.committed_versions(t)[-1]
    assert U.read_table(spark, t).count() == 80
    # fold materializes through the parquet sidecar
    m = U.read_manifest(t, tip)
    assert len(m["files"]) == len(set(m["files"]))
    # stats consolidated INTO the entry table (no inline/zlib map)
    stats = U.entry_stats(t, tip)
    assert sum(1 for v in stats.values() if v) == len(m["files"])
    # partition pruning via the distributed plan matches a full-scan filter
    got = sorted(
        r["k"]
        for r in PT.read_table_partitions(spark, t, ["3"]).collect()
    )
    exp = sorted(
        r["k"]
        for r in U.read_table(spark, t).where(F.col("p") == "3").collect()
    )
    assert got == exp and got


def test_pruned_read_never_folds_the_manifest(
    spark, tmp_path, small_thresholds
):
    """THE driver-boundedness pin: on a parquet-checkpoint table, a
    partition-pruned read never calls read_manifest / _full_files — the
    file list is never materialized in driver Python; only the surviving
    entries are collected."""
    t = str(tmp_path / "t")
    PT.write_table_partitioned(_rows(spark, 0, 40), t, "p")
    for i in range(4):
        PT.append_partitioned(
            spark, t, _rows(spark, 100 + 10 * i, 110 + 10 * i), "p"
        )
    exp = sorted(
        r["k"]
        for r in U.read_table(spark, t).where(F.col("p") == "5").collect()
    )

    def boom(*a, **k):
        raise AssertionError("driver materialized the file list")

    import unittest.mock as mock

    with mock.patch.object(U, "read_manifest", boom), mock.patch.object(
        U, "_full_files", boom
    ):
        got = sorted(
            r["k"]
            for r in PT.read_table_partitions(spark, t, ["5"]).collect()
        )
    assert got == exp and got


def test_bloom_probe_distributed_matches_driver_path(
    spark, tmp_path, small_thresholds
):
    """Point probes on a parquet-checkpoint table assemble candidates and
    test bits scan-side; results and pruning counts equal the driver
    fallback path on the same table."""
    from spookystuff_spark.sources.bloom_index import read_table_point

    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 40).repartition(8), t, bloom_cols=["k"])
    for i in range(4):
        U.append_rows(
            spark, t, _rows(spark, 100 + 10 * i, 110 + 10 * i),
            bloom_cols=["k"],
        )
    _, raw = _tip_checkpoint(t)
    assert "entries_ref" in raw

    df, info = read_table_point(spark, t, "k", 105)
    rows = df.collect()
    assert [r["k"] for r in rows] == [105]
    assert info["skipped_bloom"] > 0
    # force the driver path for comparison
    import unittest.mock as mock

    with mock.patch.object(U, "entries_plan", lambda *a, **k: None):
        df2, info2 = read_table_point(spark, t, "k", 105)
        assert [r["k"] for r in df2.collect()] == [105]
    assert info == info2
    # a definite MISS prunes everything bloom-bearing on both paths
    _, miss = read_table_point(spark, t, "k", 987654)
    assert miss["scanned"] + miss["skipped_bloom"] == (
        info["scanned"] + info["skipped_bloom"]
    )
    assert miss["skipped_bloom"] >= info["skipped_bloom"]


def test_synthetic_100k_entry_plan_is_driver_bounded(spark, tmp_path):
    """100k-entry synthetic checkpoint: the entry table writes as a few-MB
    parquet sidecar, the manifest stays tiny, and planning a partition
    filter collects only the survivors — read_manifest/_full_files never
    run."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 4), t)  # real v1 so the table commits
    entries = [
        f"v00002/__part={i % 1000}/part-{i:06d}.parquet"
        for i in range(100_000)
    ]
    v2 = "v00002"
    fsio.mkdirs(fsio.join(t, v2))
    U.write_manifest(
        t, v2, entries, U.snapshot_schema_json(t, "v00001"), "append",
        parent="v00001",
    )
    U._finalize_commit(t, v2, "v00001")
    raw = U._read_manifest_raw(t, v2)
    assert "entries_ref" in raw and raw["files_count"] == 100_000
    # the manifest JSON itself stays O(1)
    msize = len(fsio.read_bytes(fsio.join(t, v2, U._MANIFEST)))
    assert msize < 2_000, msize

    import unittest.mock as mock

    def boom(*a, **k):
        raise AssertionError("driver materialized the 100k file list")

    with mock.patch.object(U, "read_manifest", boom), mock.patch.object(
        U, "_full_files", boom
    ):
        plan = U.entries_plan(spark, t, v2)
        survivors = [
            r["entry"]
            for r in plan.where(F.col("part") == "777").collect()
        ]
    assert len(survivors) == 100 and all(
        "__part=777/" in e for e in survivors
    )
