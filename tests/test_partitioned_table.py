"""Partition-aware MERGE (sources/partitioned_table.py): only touched
partitions rewrite, untouched files carry by reference, manifest-pruned
partition reads, and equivalence with the full-snapshot upsert."""

from __future__ import annotations

import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.partitioned_table import (
    _part_of,
    read_table_partitions,
    upsert_partitioned,
    write_table_partitioned,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, region string, val long")


BASE = [
    (1, "eu", 10), (2, "eu", 20),
    (3, "us", 30), (4, "us", 40),
    (5, "ap", 50),
]


@pytest.fixture
def seeded(spark, tmp_path):
    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_rows(spark, BASE), tdir, "region")
    return tdir


def test_merge_rewrites_only_touched_partitions(spark, seeded):
    tdir = seeded
    v1 = U.committed_versions(tdir)[-1]
    m1 = U.read_manifest(tdir, v1)
    eu_before = sorted(e for e in m1["files"] if _part_of(e) == "eu")
    us_before = sorted(e for e in m1["files"] if _part_of(e) == "us")

    # touch eu only: update k=1, insert k=6
    upsert_partitioned(
        spark, tdir,
        _rows(spark, [(1, "eu", 11), (6, "eu", 60)]),
        ["k"], "region",
    )
    v2 = U.committed_versions(tdir)[-1]
    m2 = U.read_manifest(tdir, v2)
    eu_after = sorted(e for e in m2["files"] if _part_of(e) == "eu")
    us_after = sorted(e for e in m2["files"] if _part_of(e) == "us")

    # untouched partitions: EXACT same entries (old version paths — carried
    # by reference, zero rewrite); touched partition: all-new entries
    assert us_after == us_before
    assert all(e.startswith(f"{v1}/") for e in us_after)
    assert eu_after != eu_before
    assert all(e.startswith(f"{v2}/") for e in eu_after)

    got = {
        (r["k"], r["region"], r["val"])
        for r in U.read_table(spark, tdir).collect()
    }
    assert got == {
        (1, "eu", 11), (2, "eu", 20), (6, "eu", 60),
        (3, "us", 30), (4, "us", 40), (5, "ap", 50),
    }


def test_matches_full_snapshot_upsert(spark, tmp_path):
    """Partitioned MERGE ≡ plain MERGE, logically."""
    part = str(tmp_path / "part")
    full = str(tmp_path / "full")
    updates = [(2, "eu", 99), (7, "ap", 70), (8, "sa", 80)]  # new partition!
    write_table_partitioned(_rows(spark, BASE), part, "region")
    U.write_table(_rows(spark, BASE), full)
    upsert_partitioned(spark, part, _rows(spark, updates), ["k"], "region")
    U.upsert(spark, full, _rows(spark, updates), ["k"])
    key = lambda r: r["k"]
    assert sorted(U.read_table(spark, part).collect(), key=key) == sorted(
        U.read_table(spark, full).collect(), key=key
    )


def test_manifest_pruned_partition_read(spark, seeded):
    tdir = seeded
    df = read_table_partitions(spark, tdir, ["eu"])
    assert {r["k"] for r in df.collect()} == {1, 2}
    # the scan's file list is exactly the eu files — nothing else reaches it
    files = df.inputFiles()
    assert files and all("__part=eu" in f for f in files)
    # missing partition → empty frame with the table schema
    assert read_table_partitions(spark, tdir, ["nope"]).count() == 0


def test_time_travel_and_vacuum_keep_references_alive(spark, seeded):
    tdir = seeded
    upsert_partitioned(
        spark, tdir, _rows(spark, [(1, "eu", 11)]), ["k"], "region"
    )
    upsert_partitioned(
        spark, tdir, _rows(spark, [(3, "us", 31)]), ["k"], "region"
    )
    vs = U.committed_versions(tdir)
    # time travel reads each version's own state
    assert {r["val"] for r in U.read_table(spark, tdir, vs[0]).collect()} == {
        10, 20, 30, 40, 50
    }
    U.vacuum(tdir, keep=1)
    # old versions gone from time travel, but files the live snapshot still
    # references (e.g. v1's untouched 'ap' partition) survived
    assert U.committed_versions(tdir) == [vs[-1]]
    got = {
        (r["k"], r["val"]) for r in U.read_table(spark, tdir).collect()
    }
    assert got == {(1, 11), (2, 20), (3, 31), (4, 40), (5, 50)}


def test_refuses_unpartitioned_table(spark, tmp_path):
    tdir = str(tmp_path / "plain")
    U.write_table(_rows(spark, BASE), tdir)
    with pytest.raises(ValueError, match="partition"):
        upsert_partitioned(
            spark, tdir, _rows(spark, [(1, "eu", 11)]), ["k"], "region"
        )


def test_touched_partition_cap(spark, seeded):
    with pytest.raises(ValueError, match="partitions"):
        upsert_partitioned(
            spark, seeded, _rows(spark, [(9, "xx", 1), (10, "yy", 2)]),
            ["k"], "region", max_touched=1,
        )


def test_change_feed_holds_only_update_rows(spark, seeded):
    """The rewritten slice carries kept rows; the feed must not — only the
    actual update rows are CDC-visible (and the IVM fold composes)."""
    tdir = seeded
    upsert_partitioned(
        spark, tdir, _rows(spark, [(1, "eu", 11), (6, "eu", 60)]),
        ["k"], "region",
    )
    v = U.committed_versions(tdir)[-1]
    files, kind = U.change_files(tdir, v)
    feed = spark.read.parquet(*files)
    assert {(r["k"], r["val"]) for r in feed.collect()} == {(1, 11), (6, 60)}


def test_streaming_partitioned_sink_exactly_once(spark, tmp_path):
    from spookystuff_spark.streaming.sink import (
        streaming_partitioned_upsert_sink,
    )

    tdir = str(tmp_path / "stbl")
    sink = streaming_partitioned_upsert_sink(tdir, ["k"], "region", app_id="ck")
    sink(_rows(spark, BASE), 0)
    v1 = U.committed_versions(tdir)[-1]
    sink(_rows(spark, [(1, "eu", 11)]), 1)  # touches eu only
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    us = [e for e in m["files"] if _part_of(e) == "us"]
    assert us and all(e.startswith(f"{v1}/") for e in us)  # carried, not rewritten
    n = len(U.committed_versions(tdir))
    sink(_rows(spark, [(1, "eu", 99)]), 1)  # replay: no-op
    assert len(U.committed_versions(tdir)) == n
    got = {(r["k"], r["val"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, 11), (2, 20), (3, 30), (4, 40), (5, 50)}


def _clustered(spark, n=400):
    """k 1..n across two partitions, range-clustered so each output file's
    k-footprint is tight (4 files per partition with disjoint k ranges)."""
    rows = [(k, "a" if k % 2 else "b", k * 10) for k in range(1, n + 1)]
    return _rows_kgv(spark, rows).repartitionByRange(4, "k")


def _rows_kgv(spark, data):
    return spark.createDataFrame(data, "k int, grp string, val long")


def test_partition_and_stats_pruning_compose(spark, tmp_path):
    """Filter on (partition, clustered col): files read < files in the
    partition — partition pruning alone or stats skipping alone each read
    more."""
    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions_pruned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_clustered(spark), tdir, "grp", stats_cols=["k"])
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    files_in_a = [e for e in m["files"] if _part_of(e) == "a"]
    assert len(files_in_a) >= 3  # the composition has something to skip
    assert m.get("stats")  # stats recorded AT COMMIT, no attach_stats call

    df, info = read_table_partitions_pruned(spark, tdir, ["a"], "k", 10, 60)
    got = {r["k"] for r in df.collect()}
    assert got == {k for k in range(10, 61) if k % 2}
    assert info["scanned"] < len(files_in_a)  # stats skipped within the part
    assert info["skipped_stats"] >= 1
    assert info["skipped_partition"] == len(m["files"]) - len(files_in_a)


def test_merge_keeps_stats_for_untouched_and_profiles_new(spark, tmp_path):
    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions_pruned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_clustered(spark), tdir, "grp", stats_cols=["k"])
    # touch partition b only
    upsert_partitioned(
        spark, tdir, _rows_kgv(spark, [(2, "b", 21), (500, "b", 5000)]),
        ["k"], "grp", stats_cols=["k"],
    )
    stats = U.entry_stats(tdir, U.committed_versions(tdir)[-1])
    assert stats and all(s.get("k") for s in stats.values())
    # untouched partition a still skips on stats through the chain lookup
    df, info = read_table_partitions_pruned(spark, tdir, ["a"], "k", 10, 60)
    assert {r["k"] for r in df.collect()} == {k for k in range(10, 61) if k % 2}
    assert info["skipped_stats"] >= 1
    # and the rewritten partition b prunes on its freshly profiled files
    df_b, info_b = read_table_partitions_pruned(spark, tdir, ["b"], "k", 480, 600)
    assert {r["k"] for r in df_b.collect()} == {500}
    assert info_b["skipped_stats"] >= 1


def test_pruned_partition_reader_applies_dvs(spark, tmp_path):
    import pyspark.sql.functions as F

    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions_pruned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_clustered(spark), tdir, "grp", stats_cols=["k"])
    U.delete_where_dv(spark, tdir, F.col("k") == 11, ["k"])
    df, _ = read_table_partitions_pruned(spark, tdir, ["a"], "k", 10, 20)
    assert {r["k"] for r in df.collect()} == {13, 15, 17, 19}


def test_compact_partitioned_materializes_dvs_keeps_layout(spark, tmp_path):
    import pyspark.sql.functions as F

    from spookystuff_spark.sources.partitioned_table import (
        compact_partitioned,
    )

    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(_clustered(spark, 40), tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("k") <= 4, ["k"])
    compact_partitioned(spark, tdir, "grp", stats_cols=["k"])
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    assert m["kind"] == "compact" and not m.get("dv")  # vectors materialized
    assert all(_part_of(e) in ("a", "b") for e in m["files"])  # layout kept
    # exactly one file per partition value
    from collections import Counter

    per_part = Counter(_part_of(e) for e in m["files"])
    assert per_part == {"a": 1, "b": 1}
    assert m.get("stats")
    got = {r["k"] for r in read_table_partitions(spark, tdir, ["a"]).collect()}
    assert got == {k for k in range(5, 41) if k % 2}
    # MERGE works normally afterwards
    upsert_partitioned(spark, tdir, _rows_kgv(spark, [(2, "b", 22)]), ["k"], "grp")
    assert {
        r["k"] for r in read_table_partitions(spark, tdir, ["b"]).collect()
    } == {k for k in range(5, 41) if k % 2 == 0} | {2}


def test_ivm_folds_partitioned_merge_with_preimages(spark, tmp_path):
    """feed_preimages on the partitioned MERGE makes the source
    incrementally foldable — the derived aggregate follows without ever
    rescanning untouched partitions."""
    from spookystuff_spark.sources.incremental import refresh_aggregate

    src = str(tmp_path / "src")
    dst = str(tmp_path / "agg")
    write_table_partitioned(
        _rows_kgv(spark, [(1, "a", 10), (2, "a", 3), (3, "b", 7)]), src, "grp"
    )
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    upsert_partitioned(
        spark, src, _rows_kgv(spark, [(1, "a", 5), (4, "b", 2)]), ["k"],
        "grp", feed_preimages=True,
    )
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    got = {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }
    assert got == {("a", 8, 2), ("b", 9, 2)}


def test_zorder_compact_partitioned_triple_pruning(spark, tmp_path):
    """Z-order within partitions + manifest stats: a (partition, range)
    filter skips files INSIDE the partition after the clustered rewrite."""
    from spookystuff_spark.sources.partitioned_table import (
        compact_partitioned,
        read_table_partitions_pruned,
    )

    rows = [(k, "a" if k % 2 else "b", (k * 37) % 100) for k in range(1, 201)]
    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(
        spark.createDataFrame(rows, "k int, grp string, val long")
        .repartition(8),
        tdir,
        "grp",
    )
    compact_partitioned(
        spark, tdir, "grp", stats_cols=["k"], zorder_by=["k"],
        files_per_partition=4,
    )
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    from collections import Counter

    per_part = Counter(_part_of(e) for e in m["files"])
    assert per_part["a"] >= 3  # multiple clustered files per partition
    df, info = read_table_partitions_pruned(spark, tdir, ["a"], "k", 1, 40)
    assert {r["k"] for r in df.collect()} == {k for k in range(1, 41) if k % 2}
    assert info["skipped_stats"] >= 1  # intra-partition file skipping
    assert info["skipped_partition"] >= per_part["b"]


# --------------------------------------------------------------- append


def test_append_partitioned_is_metadata_only(spark, seeded):
    from spookystuff_spark.sources.partitioned_table import append_partitioned

    tdir = seeded
    v1 = U.committed_versions(tdir)[-1]
    m1 = U.read_manifest(tdir, v1)
    append_partitioned(
        spark, tdir,
        _rows(spark, [(6, "eu", 60), (7, "sa", 70)]),
        "region",
    )
    v2 = U.committed_versions(tdir)[-1]
    m2 = U.read_manifest(tdir, v2)
    # EVERY parent entry carried verbatim — zero rewrite anywhere
    assert set(m1["files"]) <= set(m2["files"])
    own = [e for e in m2["files"] if e.startswith(f"{v2}/")]
    assert own and {_part_of(e) for e in own} == {"eu", "sa"}
    assert m2["kind"] == "append"
    got = {(r["k"], r["val"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, 10), (2, 20), (3, 30), (4, 40), (5, 50), (6, 60), (7, 70)}
    # pruned read sees carried + appended files of the partition
    eu = read_table_partitions(spark, tdir, ["eu"])
    assert {r["k"] for r in eu.collect()} == {1, 2, 6}
    # change feed holds exactly the appended rows (metadata refs, kind fill)
    files, kind = U.change_files(tdir, v2)
    assert kind == "insert"
    feed = spark.read.parquet(*files)
    assert "__part" not in feed.columns
    assert {r["k"] for r in feed.collect()} == {6, 7}


def test_append_partitioned_carries_dvs_and_extras(spark, seeded):
    from spookystuff_spark.sources.partitioned_table import append_partitioned

    tdir = seeded
    U.delete_where_dv(spark, tdir, "k = 2", ["k"])
    append_partitioned(
        spark, tdir, _rows(spark, [(8, "eu", 80)]), "region",
        stats_cols=["k"], extra_fields={"corpus_stats": {"n": 6}},
    )
    v = U.committed_versions(tdir)[-1]
    m = U.read_manifest(tdir, v)
    assert m["dv"] and m["dv_keys"] == ["k"]
    assert m["corpus_stats"] == {"n": 6}
    # deleted row stays hidden through both readers
    assert 2 not in {r["k"] for r in U.read_table(spark, tdir).collect()}
    assert {r["k"] for r in read_table_partitions(spark, tdir, ["eu"]).collect()} == {1, 8}
    # stats recorded for the new file(s) only, resolved chain-wise
    stats = U.entry_stats(tdir, v)
    own = [e for e in m["files"] if e.startswith(f"{v}/")]
    assert all(stats.get(e, {}).get("k") == [8, 8] for e in own)


def test_append_partitioned_refusals(spark, tmp_path):
    from spookystuff_spark.sources.partitioned_table import append_partitioned

    flat = str(tmp_path / "flat")
    U.write_table(_rows(spark, BASE), flat)
    with pytest.raises(ValueError, match="no partition path"):
        append_partitioned(spark, flat, _rows(spark, [(9, "eu", 90)]), "region")
    part = str(tmp_path / "part")
    write_table_partitioned(_rows(spark, BASE), part, "region")
    with pytest.raises(ValueError, match="partitioned by"):
        append_partitioned(spark, part, _rows(spark, [(9, "eu", 90)]), "val")
