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


def test_partitioned_merge_composes_with_dvs(spark, tmp_path):
    """DV-aware partitioned MERGE: the touched slice materializes the
    vectors, upserted keys come back to life, non-upserted deleted keys
    stay deleted — and the result matches the full-snapshot upsert on the
    same inputs (compose-and-match)."""
    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions,
        upsert_partitioned,
        write_table_partitioned,
    )

    updates = [(2, "b", 21), (3, "a", 31), (9, "a", 90)]  # 3 was DV-deleted

    # reference: plain full-snapshot table, DV delete, plain upsert
    ref_dir = str(tmp_path / "ref")
    U.write_table(_mk(spark, BASE), ref_dir, change_feed=False)
    U.delete_where_dv(spark, ref_dir, F.col("k").isin(1, 3), ["k"])
    U.upsert(spark, ref_dir, _mk(spark, updates), ["k"])
    expect = {
        (r["k"], r["grp"], r["val"])
        for r in U.read_table(spark, ref_dir).collect()
    }

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, BASE), tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("k").isin(1, 3), ["k"])
    upsert_partitioned(spark, tdir, _mk(spark, updates), ["k"], "grp")
    got = {
        (r["k"], r["grp"], r["val"])
        for r in U.read_table(spark, tdir).collect()
    }
    assert got == expect
    assert {k for (k, _, _) in got} == {2, 3, 4, 5, 6, 7, 8, 9}

    # the carried vector shrank to the non-upserted deleted key (1) only,
    # and the pruned partition reader applies it
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert m["dv_keys"] == ["k"]
    remaining = {
        r["k"]
        for r in spark.read.parquet(
            *[fsio.join(tdir, e) for e in m["dv"]]
        ).collect()
    }
    assert remaining == {1}
    got_a = {
        r["k"]
        for r in read_table_partitions(spark, tdir, ["a"]).collect()
    }
    assert got_a == {3, 5, 7, 9}  # 1 stays deleted, 3 resurrected by upsert


def test_partitioned_merge_refuses_mismatched_dv_keys(spark, tmp_path):
    """Vectors keyed differently from the merge keys can't be subtracted
    per-update-key — still a compact-first refusal."""
    from spookystuff_spark.sources.partitioned_table import (
        upsert_partitioned,
        write_table_partitioned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, BASE), tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("val") == 10, ["val"])
    with pytest.raises(ValueError, match="keyed on"):
        upsert_partitioned(
            spark, tdir, _mk(spark, [(2, "b", 21)]), ["k"], "grp"
        )


def test_read_table_partitions_applies_vectors(spark, tmp_path):
    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions,
        write_table_partitioned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, BASE), tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("k").isin(2, 5), ["k"])
    got = {
        r["k"]
        for r in read_table_partitions(spark, tdir, ["a", "b"]).collect()
    }
    assert got == _ks(spark, tdir) == {1, 3, 4, 6, 7, 8}


def test_read_table_pruned_applies_vectors(spark, seeded):
    tdir = seeded
    U.attach_stats(tdir, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 4, ["k"])
    df, _ = U.read_table_pruned(spark, tdir, "k", 1, 8)
    assert {r["k"] for r in df.collect()} == {1, 2, 3, 5, 6, 7, 8}


def test_datasource_append_carries_vectors(spark, seeded):
    """A spooky_versioned append on a DV table must carry the parent's
    vectors by reference (versioned_source._commit_files) — dropping them
    silently resurrects every deleted row on the next read."""
    from spookystuff_spark.sources.versioned_source import (
        VersionedTableDataSource,
    )

    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") <= 3, ["k"])
    from spookystuff_spark.sources.versioned_source import register as _reg; _reg(spark)
    _mk(spark, [(9, "a", 90)]).write.format("spooky_versioned").option(
        "path", tdir
    ).mode("append").save()
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert m["kind"] == "append" and m["dv"] and m["dv_keys"] == ["k"]
    assert _ks(spark, tdir) == {4, 5, 6, 7, 8, 9}
    # vacuum keeps the still-referenced vector files alive
    U.append_rows(spark, tdir, _mk(spark, [(10, "b", 100)]), change_feed=False)
    U.vacuum(tdir, keep=1)
    assert _ks(spark, tdir) == {4, 5, 6, 7, 8, 9, 10}


def test_changefeed_stream_over_partitioned_merge(spark, tmp_path):
    """The partitioned MERGE change feed must not carry the __part layout
    column — the spooky_versioned changefeed reader refuses extra columns
    (silent column-drop is the failure mode), so a stray __part would break
    CDC streaming from every partitioned-MERGE table."""
    from spookystuff_spark.sources.partitioned_table import (
        upsert_partitioned,
        write_table_partitioned,
    )
    from spookystuff_spark.sources.versioned_source import (
        VersionedTableDataSource,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_mk(spark, BASE), tdir, "grp")
    upsert_partitioned(
        spark, tdir, _mk(spark, [(2, "b", 21), (9, "a", 90)]), ["k"], "grp"
    )
    files, _ = U.change_files(tdir, U.committed_versions(tdir)[-1])
    feed = spark.read.parquet(*files)
    assert "__part" not in feed.columns

    from spookystuff_spark.sources.versioned_source import register as _reg; _reg(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("spooky_versioned")
        .option("path", tdir)
        .option("changefeed", "true")
        .option("startingVersion", 1)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.read.parquet(out)
    assert {(r["k"], r["_change"]) for r in rows.collect()} == {
        (2, "upsert"), (9, "upsert")
    }


def test_datasource_reader_applies_vectors(spark, seeded):
    """format('spooky_versioned') must agree with read_table on DV tables —
    a raw-file scan would resurrect deleted rows."""
    from spookystuff_spark.sources.versioned_source import (
        VersionedTableDataSource,
    )

    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") <= 3, ["k"])
    from spookystuff_spark.sources.versioned_source import register as _reg; _reg(spark)
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


def test_compact_dv_folds_vectors_metadata_only(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, F.col("k") == 1, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 5, ["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 7, ["k"])
    m_before = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert len(m_before["dv"]) >= 3

    v = U.compact_dv(spark, tdir)
    m = U.read_manifest(tdir, v)
    assert m["kind"] == "compact_dv"
    assert m["files"] == m_before["files"]  # zero data files rewritten
    assert len(m["dv"]) == 1 and m["dv_keys"] == ["k"]
    assert _ks(spark, tdir) == {2, 3, 4, 6, 8}
    # vacuum keeps the folded vector, drops the old generations' files
    U.append_rows(spark, tdir, _mk(spark, [(9, "a", 90)]), change_feed=False)
    U.vacuum(tdir, keep=1)
    assert _ks(spark, tdir) == {2, 3, 4, 6, 8, 9}
    # idempotent: a single vector file is already folded
    assert U.compact_dv(spark, tdir) is None


def test_cdc_stream_rate_limit_caps_batches(spark, tmp_path):
    """maxVersionsPerBatch: a consumer starting far behind advances at most
    N versions per micro-batch instead of one giant catch-up batch — and
    still reaches the complete feed."""
    from spookystuff_spark.sources.versioned_source import register as _reg
    _reg(spark)

    tdir = str(tmp_path / "t")
    U.write_table(_mk(spark, [(1, "a", 10)]), tdir)
    for i in range(2, 7):  # five more commits
        U.append_rows(spark, tdir, _mk(spark, [(i, "a", i * 10)]))

    out = str(tmp_path / "out")
    q = (
        spark.readStream.format("spooky_versioned")
        .option("path", tdir)
        .option("changefeed", "true")
        .option("startingVersion", 0)
        .option("maxVersionsPerBatch", 2)
        .load()
        .writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("path", out)
        .start()
    )
    try:
        q.processAllAvailable()  # drains the window batch by batch
        progress = q.recentProgress
    finally:
        q.stop()
    rows = spark.read.parquet(out)
    assert {r["k"] for r in rows.collect()} == {1, 2, 3, 4, 5, 6}
    # the 6-version backlog needed >= 3 triggers at 2 versions each
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 3
