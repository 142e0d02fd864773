"""One-call OPTIMIZE (sources/maintenance.py::optimize): right actions in
the right order per table state, manifest-only no-op checks, content
identical before/after, and the partitioned/plain split."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.maintenance import optimize
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    fragmentation,
    write_table_partitioned,
)


def _mk(spark, lo, hi):
    return spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(lo, hi)],
        "k int, b int, v string",
    )


def test_optimize_plain_table_full_cycle(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    U.write_table(_mk(spark, 0, 50).repartition(6), tdir, change_feed=False)
    for lo in range(50, 130, 20):  # small-file appends
        U.append_rows(
            spark, tdir, _mk(spark, lo, lo + 20).repartition(4),
            change_feed=False,
        )
    U.delete_where_dv(spark, tdir, F.col("k") < 5, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") >= 125, ["k"])
    before = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    rep = optimize(
        spark, tdir, target_file_bytes=1 << 20, stats_cols=["k"],
        bloom_cols=["v"], keep=1,
    )
    # tiny files → compaction fired, which also materialized the DVs
    assert rep["compacted"] is not None
    assert rep["dv_folded"] is None
    assert rep["stats_attached"] and rep["blooms_attached"]
    m = U._read_manifest_raw(tdir, U._latest(tdir))
    assert not m.get("dv")
    after = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert after == before
    # the re-attached indexes actually serve
    from spookystuff_spark.sources.bloom_index import read_table_point

    df, info = read_table_point(spark, tdir, "v", "r100")
    assert [r["k"] for r in df.collect()] == [100]
    # vacuum ran under keep=1: one committed version left
    assert len(U.committed_versions(tdir)) == 1


def test_optimize_healthy_table_is_noop(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    U.write_table(_mk(spark, 0, 100).coalesce(1), tdir, change_feed=False)
    n_versions = len(U.committed_versions(tdir))
    rep = optimize(spark, tdir)
    assert rep["compacted"] is None and rep["dv_folded"] is None
    assert rep["stats_attached"] is None and rep["blooms_attached"] is None
    assert len(U.committed_versions(tdir)) == n_versions  # no new commits


def test_optimize_folds_dvs_without_rewrite(spark, tmp_path):
    """A well-laid-out table with STACKED vectors gets the metadata-only
    fold, not a data rewrite."""
    tdir = str(tmp_path / "tbl")
    U.write_table(_mk(spark, 0, 100).coalesce(1), tdir, change_feed=False)
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 2, ["k"])
    rep = optimize(spark, tdir, keep=10)
    assert rep["compacted"] is None
    assert rep["dv_folded"] is not None
    m = U._read_manifest_raw(tdir, U._latest(tdir))
    assert len(m["dv"]) == 1  # folded to one vector file
    assert U.read_table(spark, tdir).count() == 98


def test_optimize_partitioned_uses_layout_preserving_path(spark, tmp_path):
    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, 0, 30), tdir, "b", change_feed=False)
    for lo in range(30, 120, 10):  # one file per partition per append
        append_partitioned(
            spark, tdir, _mk(spark, lo, lo + 10), "b", change_feed=False
        )
    assert max(fragmentation(tdir).values()) > 8
    before = U.read_table(spark, tdir).count()
    rep = optimize(spark, tdir, stats_cols=["k"], keep=2)
    assert rep["compacted"] is not None
    assert max(fragmentation(tdir).values()) <= 2
    m = U._read_manifest_raw(tdir, U._latest(tdir))
    assert m.get("partition_col") == "b"  # layout preserved
    assert m.get("stats")  # partitioned compaction attached stats in-commit
    assert U.read_table(spark, tdir).count() == before


def test_optimize_retention_protects_recent_versions(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    U.write_table(_mk(spark, 0, 10).coalesce(1), tdir, change_feed=False)
    for lo in range(10, 40, 10):
        U.append_rows(
            spark, tdir, _mk(spark, lo, lo + 10).coalesce(1),
            change_feed=False,
        )
    n_before = len(U.committed_versions(tdir))
    rep = optimize(spark, tdir, keep=1, retain_ms=3_600_000)
    # everything committed within the hour: retention overrides keep=1
    assert len(U.committed_versions(tdir)) == n_before + (
        1 if rep["compacted"] else 0
    )


def test_optimize_empty_table_dir_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        optimize(spark, str(tmp_path / "nope"))


def test_optimize_zorders_plain_table_rewrite(spark, tmp_path, monkeypatch):
    """zorder_by reaches the plain-table compaction path (it used to be
    silently dropped on non-partitioned tables while the report still said
    'compacted' — the caller believed the table was clustered)."""
    tdir = str(tmp_path / "ztbl")
    U.write_table(_mk(spark, 0, 2000).repartition(8), tdir,
                  change_feed=False)
    seen = {}
    orig = U.compact

    def spying_compact(spark_, table_dir_, num_files=8, marker=None,
                       zorder_by=None):
        seen["zorder_by"] = zorder_by
        return orig(spark_, table_dir_, num_files=num_files, marker=marker,
                    zorder_by=zorder_by)

    monkeypatch.setattr(U, "compact", spying_compact)
    rep = optimize(spark, tdir, target_file_bytes=1 << 30,
                   zorder_by=["k"], keep=1)
    assert rep["compacted"] is not None
    assert seen["zorder_by"] == ["k"]  # the clustering actually happened
    df, _ = U.read_table_pruned(spark, tdir, "k", 0, 10)
    assert df.count() == 11
