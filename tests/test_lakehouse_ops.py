"""Lakehouse-ops additions over the versioned table: exactly-once streaming
upsert sink, size-aware auto-compaction, partitioned writes + pruning proof.
"""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.partitioned import (
    assert_partition_pruned,
    prune_report,
    selected_partition_count,
    write_partitioned,
)
from spookystuff_spark.streaming.sink import (
    last_committed_batch,
    streaming_upsert_sink,
)


# ------------------------------------------------- streaming upsert sink


def test_sink_applies_batches_and_skips_replays(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    sink = streaming_upsert_sink(tdir, ["k"])

    b0 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b1 = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    sink(b0, 0)
    sink(b1, 1)
    got = {
        (r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()
    }
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert last_committed_batch(tdir) == 1
    n_versions = len(U.committed_versions(tdir))

    # crash-replay of an old batch: exactly-once skip, no new snapshot,
    # no resurrected value
    sink(b0, 0)
    sink(b1, 1)
    assert len(U.committed_versions(tdir)) == n_versions
    got2 = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got2 == got


def test_sink_survives_interleaved_manual_writes(spark, tmp_path):
    """Manual upserts/compactions between stream batches leave versions
    without batch markers; the marker walk must still find the newest one."""
    tdir = str(tmp_path / "tbl")
    sink = streaming_upsert_sink(tdir, ["k"])
    sink(spark.createDataFrame([(1, "a")], "k int, v string"), 0)
    U.upsert(
        spark, tdir, spark.createDataFrame([(9, "z")], "k int, v string"), ["k"]
    )
    assert last_committed_batch(tdir) == 0
    sink(spark.createDataFrame([(1, "A")], "k int, v string"), 1)
    assert last_committed_batch(tdir) == 1
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "A"), (9, "z")}


def test_sink_end_to_end_structured_streaming(spark, tmp_path):
    """Drive the sink from a real file-source stream: two input files arrive,
    each becomes a micro-batch, the table converges to the merged state."""
    src = tmp_path / "in"
    src.mkdir()
    tdir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    (src / "f0.json").write_text('{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')
    stream = (
        spark.readStream.schema("k int, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(streaming_upsert_sink(tdir, ["k"]))
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "f1.json").write_text('{"k": 2, "v": "B"}\n{"k": 3, "v": "c"}\n')
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}
    assert last_committed_batch(tdir) is not None


# ------------------------------------------------------ auto-compaction


def test_compact_auto_rewrites_fragmented_snapshot(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    U.write_table(df.repartition(16), tdir)
    before = U.snapshot_file_stats(tdir)
    assert before["n_files"] == 16

    v = U.compact_auto(spark, tdir, target_file_bytes=1 << 30)
    assert v is not None
    after = U.snapshot_file_stats(tdir)
    assert after["n_files"] == 1
    assert U.read_table(spark, tdir).count() == 2000

    # healthy layout: second pass is a no-op
    assert U.compact_auto(spark, tdir, target_file_bytes=1 << 30) is None


def test_compact_auto_respects_target_size(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    df = spark.range(0, 20000).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    )
    U.write_table(df.repartition(32), tdir)
    total = U.snapshot_file_stats(tdir)["total_bytes"]
    target = max(1, total // 4)
    assert U.compact_auto(spark, tdir, target_file_bytes=target) is not None
    after = U.snapshot_file_stats(tdir)
    assert 3 <= after["n_files"] <= 6  # ceil(total/target) ~= 4, rewrite jitter


# ----------------------------------------- partitioned writes + pruning


def test_partition_pruning_proven_in_plan(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 5).cast("string").alias("shard"),
    )
    write_partitioned(df, path, ["shard"])
    pruned = assert_partition_pruned(spark, path, "shard = '3'", 1)
    assert pruned.count() == 200
    assert selected_partition_count(spark.read.parquet(path).where("1=1")) == 5
    rep = prune_report(pruned)
    assert "shard" in rep["partition_filters"]


def test_dynamic_partition_overwrite_keeps_other_partitions(spark, tmp_path):
    path = str(tmp_path / "part")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "a")], "id int, shard string"
    )
    write_partitioned(base, path, ["shard"])
    # restate ONLY shard=a; shard=b must survive
    restated = spark.createDataFrame([(9, "a")], "id int, shard string")
    write_partitioned(restated, path, ["shard"])
    got = {
        (r["id"], r["shard"]) for r in spark.read.parquet(path).collect()
    }
    assert got == {(9, "a"), (2, "b")}


def test_pushed_filters_reach_parquet_scan(spark, tmp_path):
    path = str(tmp_path / "plain")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 2).alias("x")
    ).write.parquet(path)
    rep = prune_report(spark.read.parquet(path).where("x > 50").select("id"))
    assert "GreaterThan" in rep["pushed_filters"] or "x" in rep["pushed_filters"]


def test_append_rows_is_metadata_only(spark, tmp_path):
    """Chained appends must not rewrite or copy old data: every version
    physically contains ONLY the new batch's files; the previous snapshot's
    files are carried forward by manifest REFERENCE (no hard links — the
    object-store-safe commit), and reads see the union."""
    tdir = str(tmp_path / "appendtbl")
    for i in range(3):
        batch = spark.createDataFrame([(i, f"v{i}")], "k int, v string")
        U.append_rows(spark, tdir, batch.coalesce(1))
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(0, "v0"), (1, "v1"), (2, "v2")}

    vs = U.committed_versions(tdir)
    assert len(vs) == 3
    # version 3's dir holds exactly ONE new data file...
    v3 = os.path.join(tdir, vs[-1])
    own = sorted(f for f in os.listdir(v3) if f.endswith(".parquet"))
    assert len(own) == 1
    # ...but its manifest lists all three snapshot files, the other two
    # referencing EARLIER version dirs — metadata-only carry-forward
    files = U.snapshot_files(tdir, vs[-1])
    assert len(files) == 3
    parents = {os.path.basename(os.path.dirname(f)) for f in files}
    assert parents == set(vs)
    # append versions are CDC-visible: the change feed references the new
    # file with kind=insert (ADVICE r4: append_rows was feed-invisible)
    feed_files, kind = U.change_files(tdir, vs[-1])
    assert kind == "insert"
    assert [os.path.basename(f) for f in feed_files] == own


def test_compact_zorder_enables_file_skipping(spark, tmp_path):
    """OPTIMIZE-ZORDER parity for the versioned table: after
    compact(zorder_by=[x, y]), a selective range filter on EITHER clustered
    column skips most files on parquet footer stats, while a plain compact
    of the same table skips none — and the logical content is unchanged."""
    import pyspark.sql.functions as F

    from spookystuff_spark.operators.layout import skipping_ratio

    df = spark.range(0, 40_000).select(
        F.col("id").alias("pk"),
        (F.col("id") % 200).alias("x"),
        ((F.col("id") / 200).cast("long") % 200).alias("y"),
    )
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zord")
    for tdir in (plain_dir, z_dir):
        U.write_table(df.repartition(16), tdir, change_feed=False)
    U.compact(spark, plain_dir, num_files=16)
    U.compact(spark, z_dir, num_files=16, zorder_by=["x", "y"])

    assert (
        U.read_table(spark, z_dir).orderBy("pk").collect()
        == U.read_table(spark, plain_dir).orderBy("pk").collect()
    )
    plain_snap = os.path.join(plain_dir, U.committed_versions(plain_dir)[-1])
    z_snap = os.path.join(z_dir, U.committed_versions(z_dir)[-1])
    for col in ("x", "y"):
        r_plain = skipping_ratio(plain_snap, col, 10, 19)  # 5% selectivity
        r_z = skipping_ratio(z_snap, col, 10, 19)
        assert r_plain == 0.0
        assert r_z >= 0.5, f"z-order compact should skip files on {col}: {r_z}"


def test_history_and_timestamp_time_travel(spark, tmp_path):
    """DESCRIBE-HISTORY parity: per-commit kind/parent/timestamps/file
    counts, and TIMESTAMP-AS-OF reads resolving to the newest commit at or
    before the asked instant."""
    import time

    tdir = str(tmp_path / "tbl")
    U.write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"), tdir
    )
    t_after_v1 = int(time.time() * 1000)
    time.sleep(0.05)
    U.append_rows(
        spark, tdir, spark.createDataFrame([(2, "b")], "k int, v string")
    )
    U.upsert(
        spark, tdir,
        spark.createDataFrame([(1, "A")], "k int, v string"), ["k"],
    )

    h = U.history(tdir)
    assert [x["version"] for x in h] == ["v00001", "v00002", "v00003"]
    assert [x["kind"] for x in h] == ["upsert", "append", "upsert"]
    assert [x["parent"] for x in h] == [None, "v00001", "v00002"]
    assert all(x["ts_ms"] is not None for x in h)
    assert h[0]["ts_ms"] <= h[1]["ts_ms"] <= h[2]["ts_ms"]
    # the append's snapshot = its own new files + v1's carried references
    assert h[1]["n_files"] == h[1]["n_own_files"] + h[0]["n_files"]
    assert h[1]["n_own_files"] >= 1

    got = {
        (r["k"], r["v"])
        for r in U.read_table(spark, tdir, as_of_ms=t_after_v1).collect()
    }
    assert got == {(1, "a")}
    now = {
        (r["k"], r["v"])
        for r in U.read_table(spark, tdir, as_of_ms=int(time.time() * 1000)).collect()
    }
    assert now == {(1, "A"), (2, "b")}
    with pytest.raises(FileNotFoundError):
        U.version_at(tdir, h[0]["ts_ms"] - 10_000)
    with pytest.raises(ValueError):
        U.read_table(spark, tdir, version="v00001", as_of_ms=t_after_v1)


def test_manifest_stats_prune_files_without_footer_reads(spark, tmp_path):
    """Delta-style stats-in-log: attach per-file min/max once, then range
    reads prune files from the MANIFEST alone — correct results, most
    files skipped, and inherited (appended-by-reference) entries resolve
    their stats chain-wise from the version that wrote them."""
    import pyspark.sql.functions as F

    tdir = str(tmp_path / "stats")
    # v1: values 0..9999 range-partitioned into 10 tight files
    df = spark.range(0, 10_000).select(F.col("id").alias("x"))
    U.write_table(
        df.repartitionByRange(10, "x").sortWithinPartitions("x"),
        tdir,
        change_feed=False,
    )
    assert U.attach_stats(tdir, ["x"]) == 10
    # v2: metadata-only append of a far-away range, then profile it too
    U.append_rows(
        spark,
        tdir,
        spark.range(50_000, 50_100).select(F.col("id").alias("x")).coalesce(1),
        change_feed=False,
    )
    U.attach_stats(tdir, ["x"])

    got, info = U.read_table_pruned(spark, tdir, "x", 2_000, 2_099)
    assert got.count() == 100
    assert info["skipped"] >= 9  # only ~1 of 11 files overlaps the range
    assert info["scanned"] + info["skipped"] == 11

    # the appended far range is found through its own version's stats
    far, finfo = U.read_table_pruned(spark, tdir, "x", 50_000, 50_049)
    assert far.count() == 50
    assert finfo["scanned"] == 1 and finfo["skipped"] == 10

    # files without stats are scanned conservatively, never skipped
    U.append_rows(
        spark, tdir,
        spark.range(2_050, 2_060).select(F.col("id").alias("x")).coalesce(1),
        change_feed=False,
    )  # NOT profiled
    got2, info2 = U.read_table_pruned(spark, tdir, "x", 2_000, 2_099)
    assert got2.count() == 110


def test_restore_rolls_back_metadata_only(spark, tmp_path):
    """RESTORE = a new commit referencing an old snapshot's files: the
    mistaken versions stay on the chain (undoable), nothing is rewritten,
    and restoring a DV version carries its vectors."""
    tdir = str(tmp_path / "tbl")
    U.write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), tdir
    )
    v1 = U.committed_versions(tdir)[-1]
    U.upsert(
        spark, tdir,
        spark.createDataFrame([(1, "OOPS"), (3, "x")], "k int, v string"),
        ["k"],
    )
    v_restore = U.restore(tdir, v1)
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "b")}
    m = U.read_manifest(tdir, v_restore)
    assert m["kind"] == "restore"
    # metadata-only: the restore dir holds no data files of its own
    assert not [
        f for f in os.listdir(os.path.join(tdir, v_restore))
        if f.endswith(".parquet")
    ]
    # the mistake is still on the chain — the restore is itself undoable
    assert len(U.committed_versions(tdir)) == 3
    U.restore(tdir, U.committed_versions(tdir)[1])
    assert {r["k"] for r in U.read_table(spark, tdir).collect()} == {1, 2, 3}

    # restoring a DV version carries the vectors
    tdir2 = str(tmp_path / "tbl2")
    U.write_table(
        spark.createDataFrame([(i, "x") for i in range(4)], "k int, v string"),
        tdir2, change_feed=False,
    )
    U.delete_where_dv(spark, tdir2, F.col("k") == 0, ["k"])
    dv_v = U.committed_versions(tdir2)[-1]
    U.append_rows(
        spark, tdir2,
        spark.createDataFrame([(9, "z")], "k int, v string"),
        change_feed=False,
    )
    U.restore(tdir2, dv_v)
    assert {r["k"] for r in U.read_table(spark, tdir2).collect()} == {1, 2, 3}


def test_vacuum_retain_ms_protects_recent_versions(spark, tmp_path):
    from spookystuff_spark.sources import upsert as U

    tdir = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    U.write_table(df, tdir)
    U.append_rows(spark, tdir, spark.createDataFrame([(2, "b")], "k int, v string"))
    U.append_rows(spark, tdir, spark.createDataFrame([(3, "c")], "k int, v string"))
    # keep=1 would normally drop v1+v2, but everything committed in the
    # last hour is protected
    removed = U.vacuum(tdir, keep=1, retain_ms=3_600_000)
    assert removed == []
    assert len(U.committed_versions(tdir)) == 3
    # with zero retention the same call drops them
    removed = U.vacuum(tdir, keep=1, retain_ms=0)
    assert len(U.committed_versions(tdir)) == 1


def test_table_detail_reports_layout_and_dvs(spark, tmp_path):
    import pyspark.sql.functions as F

    from spookystuff_spark.sources import upsert as U
    from spookystuff_spark.sources.partitioned_table import (
        write_table_partitioned,
    )

    tdir = str(tmp_path / "pt")
    write_table_partitioned(
        spark.createDataFrame(
            [(k, "a" if k % 2 else "b", k) for k in range(1, 9)],
            "k int, grp string, val long",
        ),
        tdir,
        "grp",
        stats_cols=["k"],
    )
    U.delete_where_dv(spark, tdir, F.col("k") == 2, ["k"])
    d = U.table_detail(tdir)
    assert d["kind"] == "delete_dv"
    assert d["partition_col"] == "grp" and d["n_partitions"] == 2
    assert d["dv_files"] >= 1 and d["dv_keys"] == ["k"]
    assert d["n_files"] >= 2 and d["total_bytes"] > 0
    assert d["stats_covered_files"] == d["n_files"]  # chain-resolved stats
    assert d["schema_cols"] == 3 and d["n_committed_versions"] == 2


def test_content_preserving_commits_carry_unknown_extras(spark, tmp_path):
    """compact / delete_where_dv / compact_dv / restore carry
    snapshot-scoped extra manifest fields (an index's metadata), while
    entry-scoped and writer-owned fields stay excluded."""
    import json

    from spookystuff_spark import fsio

    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(20)], "k long, name string"
    )
    U.write_table(df, tdir)
    cur = U.committed_versions(tdir)[-1]
    m = U.read_manifest(tdir, cur)
    m["my_index_meta"] = {"answer": 42}
    fsio.write_bytes(
        fsio.join(tdir, cur, "_MANIFEST.json"),
        json.dumps(m, separators=(",", ":")).encode(),
    )

    def meta():
        return U.read_manifest(tdir, U.committed_versions(tdir)[-1]).get(
            "my_index_meta"
        )

    U.delete_where_dv(spark, tdir, "k = 3", ["k"])
    assert meta() == {"answer": 42}
    U.delete_where_dv(spark, tdir, "k = 5", ["k"])
    assert U.compact_dv(spark, tdir) is not None
    assert meta() == {"answer": 42}
    v_before = U.committed_versions(tdir)[-1]
    U.compact(spark, tdir, num_files=2)
    assert meta() == {"answer": 42}
    # dv materialized by compact — not blind-carried
    assert U.read_manifest(tdir, U.committed_versions(tdir)[-1]).get("dv") is None
    U.restore(tdir, v_before)
    assert meta() == {"answer": 42}


def test_symlink_manifest_export(spark, tmp_path):
    import duckdb

    tdir = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(30)], "k long, name string"
    )
    U.write_table(df, tdir, change_feed=False)
    U.append_rows(spark, tdir, df.withColumn("k", F.col("k") + 100))
    path = U.export_symlink_manifest(tdir)
    uris = open(path).read().strip().splitlines()
    assert len(uris) >= 2 and all(u.startswith("file://") for u in uris)
    # an external engine (DuckDB standing in for Trino) reads exactly the
    # committed snapshot through the manifest alone
    files = [u[len("file://"):] for u in uris]
    n = duckdb.connect().execute(
        f"SELECT count(*) FROM read_parquet({files!r})"
    ).fetchone()[0]
    assert n == 60
    # DV tables refuse — raw files would resurrect deleted rows
    U.delete_where_dv(spark, tdir, "k = 3", ["k"])
    with pytest.raises(ValueError, match="deletion vectors"):
        U.export_symlink_manifest(tdir)
    U.compact(spark, tdir)
    assert U.export_symlink_manifest(tdir)


def test_row_level_commit_lineage(spark, tmp_path):
    tdir = str(tmp_path / "lin")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
    v1 = U.write_table(df, tdir, change_feed=False)
    v2 = U.append_rows(
        spark, tdir, spark.createDataFrame([(3, "c")], "k long, s string")
    )
    got = {
        r["k"]: r["_commit_version"]
        for r in U.read_table_with_lineage(spark, tdir).collect()
    }
    assert got == {1: v1, 2: v1, 3: v2}
    # deletion vectors compose: the hidden row carries no lineage row
    U.delete_where_dv(spark, tdir, "k = 2", ["k"])
    got2 = {
        r["k"]: r["_commit_version"]
        for r in U.read_table_with_lineage(spark, tdir).collect()
    }
    assert got2 == {1: v1, 3: v2}
    # time travel pins the older mapping
    old = {
        r["k"]: r["_commit_version"]
        for r in U.read_table_with_lineage(spark, tdir, version=v1).collect()
    }
    assert old == {1: v1, 2: v1}


def test_expire_rows_ttl(spark, tmp_path):
    import pyspark.sql.functions as F

    tdir = str(tmp_path / "ttl")
    df = spark.createDataFrame(
        [(i, i * 1000) for i in range(10)], "k long, ts_ms long"
    ).withColumn("ts", F.timestamp_millis("ts_ms")).drop("ts_ms")
    U.write_table(df, tdir, change_feed=False)
    v = U.expire_rows(spark, tdir, "ts", 5000, ["k"])
    assert v is not None
    assert {r["k"] for r in U.read_table(spark, tdir).collect()} == set(range(5, 10))
    # nothing else expired: no empty commit
    n = len(U.committed_versions(tdir))
    assert U.expire_rows(spark, tdir, "ts", 5000, ["k"]) is None
    assert len(U.committed_versions(tdir)) == n
    # physical erasure completes via compact + vacuum (two-phase GDPR)
    U.compact(spark, tdir)
    U.vacuum(tdir, keep=1)
    assert U.read_table(spark, tdir).count() == 5
    d = U.table_detail(tdir)
    assert d["dv_files"] == 0 and d["renames"] is None


def test_restore_with_feed_folds_through_ivm(spark, tmp_path):
    """restore(spark=, key_cols=) emits a diff change feed (deletes +
    inserts + preimage/postimage pairs), so an incremental aggregate
    folds THROUGH the rollback and lands exactly on the target's
    recompute — the rollback is never invisible to consumers."""
    from spookystuff_spark.sources.incremental import refresh_aggregate

    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(
        spark.createDataFrame(
            [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
            "k int, grp string, val long",
        ),
        src,
    )
    v1 = U.committed_versions(src)[-1]
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)
    # the mistake: an update, an insert and a delete
    U.upsert(
        spark, src,
        spark.createDataFrame(
            [(1, "a", 999), (9, "c", 1)], "k int, grp string, val long"
        ),
        ["k"], feed_preimages=True,
    )
    U.delete_where(spark, src, F.col("k") == 3)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    # roll back WITH the keyed diff feed, fold again
    U.restore(src, v1, spark=spark, key_cols=["k"])
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    got = {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }
    assert got == {("a", 30, 2), ("b", 5, 1)}
    # set-based feed (no key_cols) folds sums/counts too
    U.delete_where(spark, src, F.col("k") == 2)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    v_now = U.committed_versions(src)[-1]
    U.restore(src, v1, spark=spark)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    assert {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    } == {("a", 30, 2), ("b", 5, 1)}
    assert v_now != U.committed_versions(src)[-1]


def test_feedless_restore_refuses_in_fold_and_stream(spark, tmp_path):
    """A restore WITHOUT a feed is a logical change no consumer can see:
    the batch fold and the CDC stream both refuse loudly instead of
    silently skipping it like a compaction (permanent drift)."""
    from spookystuff_spark.sources.incremental import refresh_aggregate

    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "k int, grp string, val long"
        ),
        src,
    )
    v1 = U.committed_versions(src)[-1]
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    U.append_rows(
        spark, src,
        spark.createDataFrame([(3, "a", 7)], "k int, grp string, val long"),
    )
    U.restore(src, v1)  # no spark: no feed
    with pytest.raises(ValueError, match="restore commit without a change feed"):
        refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    # the CDC stream's planner refuses the same window (drive the stream
    # reader directly — a full readStream run adds nothing to the pin)
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from spookystuff_spark.sources.versioned_source import _ChangeFeedReader

    sch = StructType([
        StructField("k", IntegerType()),
        StructField("grp", StringType()),
        StructField("val", LongType()),
        StructField("_change", StringType()),
    ])
    r = _ChangeFeedReader(src, int(v1[1:]), sch, None)
    tip = int(U.committed_versions(src)[-1][1:])
    with pytest.raises(ValueError, match="restore commit without a"):
        r.partitions({"version": int(v1[1:])}, {"version": tip})


def test_restore_across_schema_change_refuses_feed(spark, tmp_path):
    src = str(tmp_path / "src")
    U.write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"), src
    )
    v1 = U.committed_versions(src)[-1]
    U.drop_column(src, "v")
    with pytest.raises(ValueError, match="schema change"):
        U.restore(src, v1, spark=spark, key_cols=["k"])


def test_restore_keyed_feed_refuses_duplicate_keys(spark, tmp_path):
    """Non-unique key_cols make the keyed diff WRONG (duplicates pair
    against the one opposite row and the change collapses) — refuse and
    point at the set-based diff, which is exact under duplicates."""
    src = str(tmp_path / "src")
    U.write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"), src
    )
    v1 = U.committed_versions(src)[-1]
    U.append_rows(
        spark, src,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
    )
    with pytest.raises(ValueError, match="not.*unique"):
        U.restore(src, v1, spark=spark, key_cols=["k"])
    # the set-based diff handles the duplicate exactly
    from spookystuff_spark.sources.incremental import refresh_aggregate

    dst = str(tmp_path / "agg")
    refresh_aggregate(spark, src, dst, ["v"], [])
    U.restore(src, v1, spark=spark)
    refresh_aggregate(spark, src, dst, ["v"], [])
    got = {
        (r["v"], r["n_rows"]) for r in U.read_table(spark, dst).collect()
    }
    assert got == {("a", 1)}
