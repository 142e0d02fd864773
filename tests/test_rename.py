"""Metadata-only RENAME COLUMN (sources/upsert.py::rename_column):
logical reads through every reader, time travel keeps old names,
refusal-first writers, compaction materializes, and the full
rename × stats × bloom × DV × DataSource composition."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    read_table_partitions,
    read_table_partitions_pruned,
    upsert_partitioned,
    write_table_partitioned,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k long, region string, val long")


BASE = [(1, "eu", 10), (2, "eu", 20), (3, "us", 30), (4, "ap", 40)]


@pytest.fixture
def renamed(spark, tmp_path):
    tdir = str(tmp_path / "rtbl")
    U.write_table(_rows(spark, BASE), tdir, change_feed=False)
    U.attach_stats(tdir, ["val"])
    v_before = U.committed_versions(tdir)[-1]
    U.rename_column(tdir, "val", "amount")
    return tdir, v_before


def test_logical_read_and_time_travel(spark, renamed):
    tdir, v_before = renamed
    df = U.read_table(spark, tdir)
    assert "amount" in df.columns and "val" not in df.columns
    assert {(r["k"], r["amount"]) for r in df.collect()} == {
        (1, 10), (2, 20), (3, 30), (4, 40)
    }
    old = U.read_table(spark, tdir, version=v_before)
    assert "val" in old.columns and "amount" not in old.columns


def test_chained_renames_compose(spark, renamed):
    tdir, _ = renamed
    U.rename_column(tdir, "amount", "total")
    df = U.read_table(spark, tdir)
    assert "total" in df.columns
    assert sum(r["total"] for r in df.collect()) == 100
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert m["renames"] == {"val": "total"}  # one hop, not a chain


def test_pruned_read_translates_stats(spark, renamed):
    tdir, _ = renamed
    df, info = U.read_table_pruned(spark, tdir, "amount", 25, 45)
    assert {r["k"] for r in df.collect()} == {3, 4}
    # stats were recorded under the physical name yet still prune
    assert info["scanned"] + info["skipped"] >= 1


def test_refusals_and_materialization(spark, renamed):
    tdir, _ = renamed
    with pytest.raises(ValueError, match="renames/drops"):
        U.append_rows(spark, tdir, _rows(spark, [(9, "eu", 90)]))
    with pytest.raises(ValueError, match="schema-evolution"):
        U.export_symlink_manifest(tdir)
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    with pytest.raises(Exception, match="renames/drops"):
        U.read_table(spark, tdir).limit(1).write.format(
            "spooky_versioned"
        ).option("path", tdir).mode("append").save()
    # compact materializes: files now carry logical names, renames cleared
    U.compact(spark, tdir, num_files=2)
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert "renames" not in m
    U.append_rows(spark, tdir, spark.createDataFrame(
        [(9, "eu", 90)], "k long, region string, amount long"
    ))
    assert U.read_table(spark, tdir).where(F.col("amount") == 90).count() == 1


def test_rename_refuses_dv_and_missing(spark, tmp_path):
    tdir = str(tmp_path / "t2")
    U.write_table(_rows(spark, BASE), tdir, change_feed=False)
    with pytest.raises(ValueError, match="no column"):
        U.rename_column(tdir, "nope", "x")
    U.rename_column(tdir, "val", "amount")
    with pytest.raises(ValueError, match="already exists"):
        U.rename_column(tdir, "region", "amount")
    U.compact(spark, tdir)
    U.delete_where_dv(spark, tdir, "k = 1", ["k"])
    with pytest.raises(ValueError, match="deletion vectors"):
        U.rename_column(tdir, "amount", "total")


def test_dv_after_rename_hides_rows_everywhere(spark, renamed):
    tdir, _ = renamed
    U.delete_where_dv(spark, tdir, F.col("amount") == 20, ["k"])
    assert {r["k"] for r in U.read_table(spark, tdir).collect()} == {1, 3, 4}
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    via_ds = spark.read.format("spooky_versioned").option("path", tdir).load()
    assert "amount" in via_ds.columns
    assert {r["k"] for r in via_ds.collect()} == {1, 3, 4}


def test_partitioned_rename_composition(spark, tmp_path):
    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(
        _rows(spark, BASE), tdir, "region", stats_cols=["val"],
        change_feed=False,
    )
    U.rename_column(tdir, "val", "amount")
    with pytest.raises(ValueError, match="partition column"):
        U.rename_column(tdir, "region", "zone")
    eu = read_table_partitions(spark, tdir, ["eu"])
    assert {(r["k"], r["amount"]) for r in eu.collect()} == {(1, 10), (2, 20)}
    df, info = read_table_partitions_pruned(
        spark, tdir, ["eu", "us"], "amount", 15, 35
    )
    assert {r["k"] for r in df.collect()} == {2, 3}
    assert info["skipped_partition"] >= 1
    bad = _rows(spark, [(9, "eu", 90)])
    with pytest.raises(ValueError, match="renames outstanding"):
        append_partitioned(spark, tdir, bad, "region")
    with pytest.raises(ValueError, match="renames outstanding"):
        upsert_partitioned(spark, tdir, bad, ["k"], "region")


def test_bloom_after_rename(spark, tmp_path):
    from spookystuff_spark.sources.bloom_index import (
        attach_blooms,
        read_table_point,
    )

    tdir = str(tmp_path / "btbl")
    U.write_table(_rows(spark, BASE).repartition(3), tdir, change_feed=False)
    attach_blooms(spark, tdir, ["val"])
    U.rename_column(tdir, "val", "amount")
    df, info = read_table_point(spark, tdir, "amount", 30)
    assert [r["k"] for r in df.collect()] == [3]
    assert info["skipped_bloom"] >= 1  # old blooms still prune via phys name
    with pytest.raises(ValueError, match="renames outstanding"):
        attach_blooms(spark, tdir, ["amount"])


def test_drop_column_metadata_only(spark, tmp_path):
    tdir = str(tmp_path / "dtbl")
    U.write_table(_rows(spark, BASE), tdir, change_feed=False)
    v_before = U.committed_versions(tdir)[-1]
    U.drop_column(tdir, "val")
    df = U.read_table(spark, tdir)
    assert df.columns == ["k", "region"]
    assert df.count() == 4
    # time travel still sees the column
    assert "val" in U.read_table(spark, tdir, version=v_before).columns
    # DataSource reader ignores the dropped physical column
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    via_ds = spark.read.format("spooky_versioned").option("path", tdir).load()
    assert via_ds.columns == ["k", "region"] and via_ds.count() == 4
    # metadata-only appends refuse until compact materializes
    with pytest.raises(ValueError, match="renames/drops"):
        U.append_rows(
            spark, tdir,
            spark.createDataFrame([(9, "eu")], "k long, region string"),
        )
    with pytest.raises(Exception, match="renames/drops"):
        via_ds.limit(1).write.format("spooky_versioned").option(
            "path", tdir
        ).mode("append").save()
    U.compact(spark, tdir, num_files=1)
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert "drops" not in m
    U.append_rows(
        spark, tdir, spark.createDataFrame([(9, "eu")], "k long, region string")
    )
    assert U.read_table(spark, tdir).count() == 5


def test_drop_refusals(spark, tmp_path):
    tdir = str(tmp_path / "dtbl2")
    U.write_table(_rows(spark, BASE), tdir, change_feed=False)
    with pytest.raises(ValueError, match="no column"):
        U.drop_column(tdir, "nope")
    U.rename_column(tdir, "val", "amount")
    with pytest.raises(ValueError, match="renames outstanding"):
        U.drop_column(tdir, "amount")
    U.compact(spark, tdir)
    U.drop_column(tdir, "amount")
    with pytest.raises(ValueError, match="drops outstanding"):
        U.rename_column(tdir, "region", "zone")
    U.drop_column(tdir, "region")  # chained drops fine
    with pytest.raises(ValueError, match="last column"):
        U.drop_column(tdir, "k")
    assert U.read_table(spark, tdir).columns == ["k"]


def test_cdc_stream_across_rename_boundary_fails_fast(spark, tmp_path):
    """A change-feed stream started before a rename reads pre-rename feed
    files with the NEW logical schema — that must refuse loudly (the
    extra-column fail-fast), never silently null-fill the renamed column."""
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    src = str(tmp_path / "src")
    U.write_table(_rows(spark, BASE), src)  # v1 feed carries 'val'
    U.rename_column(src, "val", "amount")
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", src)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    assert "amount" in stream.schema.names
    q = (
        stream.writeStream.format("memory")
        .queryName("ren_cdc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        with pytest.raises(Exception, match="refusing to drop data"):
            q.processAllAvailable()
            q.awaitTermination(5)
    finally:
        q.stop()


def test_incremental_fold_refuses_rename_boundary(spark, tmp_path):
    """IVM / index refreshes fold change feeds by column NAME — a fold
    range crossing a rename commit must refuse, not null-fill."""
    from spookystuff_spark.sources.incremental import refresh_aggregate

    src = str(tmp_path / "src")
    dst = str(tmp_path / "agg")
    U.write_table(_rows(spark, BASE), src)
    refresh_aggregate(spark, src, dst, ["region"], ["val"])
    U.rename_column(src, "val", "amount")
    U.delete_where_dv(spark, src, "k = 1", ["k"])
    with pytest.raises(ValueError, match="schema-evolution commit"):
        refresh_aggregate(spark, src, dst, ["region"], ["amount"])
