"""Merge-on-read deletes (sources/upsert.py deletion vectors): O(deleted)
commits that carry every data file by reference; readers apply the
accumulated vectors; appends carry them forward; compact materializes;
vacuum keeps referenced vector files alive."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k int, grp string, val long")


BASE = [(i, "a" if i % 2 else "b", i * 10) for i in range(1, 9)]


@pytest.fixture
def seeded(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    U.write_table(_mk(spark, BASE), tdir, change_feed=False)
    return tdir


def _ks(spark, tdir, **kw):
    return {r["k"] for r in U.read_table(spark, tdir, **kw).collect()}


def test_dv_delete_is_metadata_only_and_correct(spark, seeded):
    tdir = seeded
    v1 = U.committed_versions(tdir)[-1]
    m1 = U.read_manifest(tdir, v1)

    U.delete_where_dv(spark, tdir, F.col("k") <= 2, ["k"])
    v2 = U.committed_versions(tdir)[-1]
    m2 = U.read_manifest(tdir, v2)
    # zero data files rewritten: the data entry list is IDENTICAL
    assert m2["files"] == m1["files"]
    assert m2["kind"] == "delete_dv" and m2["dv"]
    assert _ks(spark, tdir) == {3, 4, 5, 6, 7, 8}
    # time travel: v1 still sees everything
    assert _ks(spark, tdir, version=v1) == set(range(1, 9))
    # CDC feed logs the deleted rows
    files, _ = U.change_files(tdir, v2)
    feed = spark.read.parquet(*files)
    assert {(r["k"], r["_change"]) for r in feed.collect()} == {
        (1, "delete"), (2, "delete")
    }


def test_chained_dvs_accumulate(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 5, ["k"])
    assert _ks(spark, tdir) == {2, 3, 4, 6, 7, 8}
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert len(m["dv"]) >= 2  # both generations' vector files referenced


def test_key_mismatch_refuses(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    with pytest.raises(ValueError, match="key mismatch"):
        U.delete_where_dv(spark, tdir, F.col("k") == 2, ["grp"])


def test_append_carries_vectors_forward(spark, seeded):
    """A metadata-only append never materializes the snapshot — dropping
    the vectors would resurrect deleted rows."""
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") <= 3, ["k"])
    U.append_rows(spark, tdir, _mk(spark, [(9, "a", 90)]), change_feed=False)
    assert _ks(spark, tdir) == {4, 5, 6, 7, 8, 9}
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert m["dv"] and m["dv_keys"] == ["k"]


def test_compact_materializes_vectors(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("grp") == "b", ["k"])
    U.compact(spark, tdir, num_files=2)
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert not m.get("dv")  # materialized: plain snapshot again
    assert _ks(spark, tdir) == {1, 3, 5, 7}
    # upsert after materialization behaves normally
    U.upsert(spark, tdir, _mk(spark, [(2, "b", 20)]), ["k"])
    assert _ks(spark, tdir) == {1, 2, 3, 5, 7}


def test_vacuum_preserves_referenced_vectors(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    dv_version = U.committed_versions(tdir)[-1]
    U.append_rows(spark, tdir, _mk(spark, [(9, "a", 90)]), change_feed=False)
    U.append_rows(spark, tdir, _mk(spark, [(10, "b", 100)]), change_feed=False)
    U.vacuum(tdir, keep=1)
    # the dv version lost time travel but its vector file survived (the
    # live snapshot still references it) — and the delete still holds
    assert _ks(spark, tdir) == {2, 3, 4, 5, 6, 7, 8, 9, 10}


def test_partitioned_merge_refuses_dv_tables(spark, tmp_path):
    from spookystuff_spark.sources.partitioned_table import (
        upsert_partitioned,
        write_table_partitioned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, BASE), tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    with pytest.raises(ValueError, match="deletion vectors"):
        upsert_partitioned(
            spark, tdir, _mk(spark, [(2, "b", 21)]), ["k"], "grp"
        )
    # compacting materializes... (plain compact loses the partition layout,
    # so re-lay it out) — documented workflow
    U.compact(spark, tdir, num_files=2)
    assert _ks(spark, tdir) == {2, 3, 4, 5, 6, 7, 8}


def test_datasource_reader_applies_vectors(spark, seeded):
    """format('spooky_versioned') must agree with read_table on DV tables —
    a raw-file scan would resurrect deleted rows."""
    from spookystuff_spark.sources.versioned_source import (
        VersionedTableDataSource,
    )

    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") <= 3, ["k"])
    spark.dataSource.register(VersionedTableDataSource)
    via_ds = {
        r["k"]
        for r in spark.read.format("spooky_versioned")
        .option("path", tdir)
        .load()
        .collect()
    }
    assert via_ds == _ks(spark, tdir) == {4, 5, 6, 7, 8}
    # pre-delete time travel through the DataSource still sees everything
    v1 = U.committed_versions(tdir)[0]
    old = {
        r["k"]
        for r in spark.read.format("spooky_versioned")
        .option("path", tdir)
        .option("version", v1)
        .load()
        .collect()
    }
    assert old == set(range(1, 9))
