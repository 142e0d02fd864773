"""Python DataSource over the versioned table: batch + time travel + CDC
streaming, and the change-feed logs the writers record at commit time."""

from __future__ import annotations

import os

import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.versioned_source import VersionedTableDataSource


@pytest.fixture()
def registered(spark):
    from spookystuff_spark.sources.versioned_source import register as _reg; _reg(spark)
    return spark


def _mk_table(spark, tdir: str) -> None:
    U.write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), tdir
    )
    U.upsert(
        spark,
        tdir,
        spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"),
        ["k"],
    )


def test_change_feed_written_at_commit(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)

    # read each version's feed the way every consumer does: change_files
    # + the fill kind (write_table's feed is a metadata reference over
    # the snapshot files, upsert's is a real row log — both spell the
    # same logical change set)
    def feed_rows(v):
        import pyspark.sql.functions as F

        files, kind = U.change_files(tdir, v)
        df = spark.read.parquet(*files)
        if "_change" not in df.columns:
            df = df.withColumn("_change", F.lit(kind))
        return {(r["k"], r["_change"]) for r in df.collect()}

    assert feed_rows("v00001") == {(1, "upsert"), (2, "upsert")}
    assert feed_rows("v00002") == {(2, "upsert"), (3, "upsert")}
    # snapshot reads must NOT see the hidden _changes dir
    assert U.read_table(spark, tdir).count() == 3


def test_delete_where_logs_deletes(spark, tmp_path):
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)
    import pyspark.sql.functions as F

    U.delete_where(spark, tdir, F.col("k") == 2)
    feed = spark.read.parquet(os.path.join(tdir, "v00003", "_changes"))
    assert {(r["k"], r["_change"]) for r in feed.collect()} == {(2, "delete")}
    assert U.read_table(spark, tdir).count() == 2


def test_batch_read_and_time_travel(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)
    cur = spark.read.format("spooky_versioned").option("path", tdir).load()
    assert {(r["k"], r["v"]) for r in cur.collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }
    old = (
        spark.read.format("spooky_versioned")
        .option("path", tdir)
        .option("version", "v00001")
        .load()
    )
    assert {(r["k"], r["v"]) for r in old.collect()} == {(1, "a"), (2, "b")}


def test_stream_cdc_replays_and_follows(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)

    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", tdir)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["k"], r["v"], r["_change"])
            for r in spark.sql("SELECT * FROM cdc_sink").collect()
        }
        # full replay: both versions' change sets
        assert got == {
            (1, "a", "upsert"),
            (2, "b", "upsert"),
            (2, "B", "upsert"),
            (3, "c", "upsert"),
        }
        # a new commit while the stream runs becomes the next micro-batch
        U.upsert(
            spark,
            tdir,
            spark.createDataFrame([(4, "d")], "k int, v string"),
            ["k"],
        )
        q.processAllAvailable()
        got2 = {
            (r["k"], r["v"], r["_change"])
            for r in spark.sql("SELECT * FROM cdc_sink").collect()
        }
        assert (4, "d", "upsert") in got2 and len(got2) == 5
    finally:
        q.stop()


def test_stream_default_start_skips_history(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", tdir)
        .option("changeFeed", "true")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_tail")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM cdc_tail").count() == 0
        U.upsert(
            spark,
            tdir,
            spark.createDataFrame([(9, "z")], "k int, v string"),
            ["k"],
        )
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cdc_tail").collect()
        assert {(r["k"], r["v"]) for r in rows} == {(9, "z")}
    finally:
        q.stop()


def test_writer_append_and_overwrite(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    df1.write.format("spooky_versioned").option("path", tdir).mode(
        "overwrite"
    ).save()
    assert U.read_table(spark, tdir).count() == 2

    spark.createDataFrame([(3, "c")], "k int, v string").write.format(
        "spooky_versioned"
    ).option("path", tdir).mode("append").save()
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}

    # overwrite replaces; history stays time-travelable
    spark.createDataFrame([(9, "z")], "k int, v string").write.format(
        "spooky_versioned"
    ).option("path", tdir).mode("overwrite").save()
    assert {r["k"] for r in U.read_table(spark, tdir).collect()} == {9}
    vs = U.committed_versions(tdir)
    assert len(vs) == 3
    assert U.read_table(spark, tdir, vs[1]).count() == 3


def test_writer_abort_leaves_table_untouched(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)
    before = U.committed_versions(tdir)

    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    from pyspark.sql.functions import udf

    @udf(LongType())
    def boom(k):
        raise RuntimeError("task failure")

    bad = spark.createDataFrame([(1, "x")], "k int, v string").select(
        boom(F.col("k")).alias("k"), F.col("v")
    )
    with pytest.raises(Exception):
        bad.write.format("spooky_versioned").option("path", tdir).mode(
            "append"
        ).save()
    assert U.committed_versions(tdir) == before
    # an in-flight task can recreate its staging dir just after the driver's
    # abort removed it; give stragglers a moment, then sweep via vacuum (the
    # documented cleanup path) and require staging gone
    import time

    for _ in range(20):
        if not [d for d in os.listdir(tdir) if d.startswith("_staging-")]:
            break
        time.sleep(0.25)
    U.vacuum(tdir, keep=10)
    assert not [d for d in os.listdir(tdir) if d.startswith("_staging-")]
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_writer_feeds_cdc_stream(registered, tmp_path):
    spark = registered
    tdir = str(tmp_path / "t")
    _mk_table(spark, tdir)
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", tdir)
        .option("changeFeed", "true")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("cdc_w")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame([(7, "w")], "k int, v string").write.format(
            "spooky_versioned"
        ).option("path", tdir).mode("append").save()
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM cdc_w").collect()
        assert {(r["k"], r["v"], r["_change"]) for r in rows} == {
            (7, "w", "upsert")
        }
    finally:
        q.stop()


def test_stream_writer_appends_with_exactly_once(registered, tmp_path):
    """writeStream.format('spooky_versioned'): each micro-batch commits one
    appended version with its batch marker; the table is a full streaming
    sink without foreachBatch."""
    spark = registered
    src = tmp_path / "in"
    src.mkdir()
    tdir = str(tmp_path / "t")
    (src / "f0.json").write_text('{"k": 1, "v": "a"}\n')
    stream = (
        spark.readStream.schema("k int, v string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.format("spooky_versioned")
        .option("path", tdir)
        .option("checkpointLocation", str(tmp_path / "ckpt_sw"))
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        (src / "f1.json").write_text('{"k": 2, "v": "b"}\n')
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "b")}
    from spookystuff_spark.streaming.sink import last_committed_batch

    # the default exactly-once namespace is the checkpoint location
    assert last_committed_batch(tdir, str(tmp_path / "ckpt_sw")) is not None
    assert last_committed_batch(tdir) is None  # no app-less markers written
    assert len(U.committed_versions(tdir)) >= 2


def test_stream_writer_fresh_checkpoint_appends(registered, tmp_path):
    """Restarting a stream with a FRESH checkpoint dir (batch ids back at 0)
    against an existing sink table must APPEND, not be silently skipped as
    a replay of the old checkpoint — the writer's default marker namespace
    is the checkpoint location, so each checkpoint gets its own batch-id
    history."""
    spark = registered
    tdir = str(tmp_path / "t")

    def run(src_name: str, ckpt_name: str, payload: str) -> None:
        src = tmp_path / src_name
        src.mkdir()
        (src / "f.json").write_text(payload)
        stream = spark.readStream.schema("k int, v string").json(str(src))
        q = (
            stream.writeStream.format("spooky_versioned")
            .option("path", tdir)
            .option("checkpointLocation", str(tmp_path / ckpt_name))
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run("in1", "ckpt_a", '{"k": 1, "v": "a"}\n')
    # second stream, fresh checkpoint, batch id 0 again
    run("in2", "ckpt_b", '{"k": 2, "v": "b"}\n')
    got = {(r["k"], r["v"]) for r in U.read_table(spark, tdir).collect()}
    assert got == {(1, "a"), (2, "b")}  # nothing skipped


def test_unnamed_sink_ignores_named_markers(registered, tmp_path):
    """app_id=None must match only app-less markers: a named writer's
    markers on the same table must not make an unnamed sink skip its own
    batches (wrong-skip is data loss)."""
    from spookystuff_spark.streaming.sink import (
        batch_marker_name,
        last_committed_batch,
    )

    spark = registered
    tdir = str(tmp_path / "t")
    U.write_table(
        spark.createDataFrame([(1, "a")], "k int, v string"),
        tdir,
        marker=batch_marker_name(7, "other-app"),
    )
    assert last_committed_batch(tdir, "other-app") == 7
    assert last_committed_batch(tdir, None) is None


def test_typed_null_fill_under_schema_evolution(registered, tmp_path):
    """Non-string additive evolution (r4 ADVICE regression): a DOUBLE column
    added by a later upsert must read as typed DOUBLE nulls on pre-evolution
    files — not string nulls — through both the DataSource batch reader and
    the native manifest scan, at every version's own schema."""
    import math

    tdir = str(tmp_path / "evo")
    U.write_table(
        registered.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        tdir,
    )
    U.upsert(
        registered,
        tdir,
        registered.createDataFrame(
            [(2, "B", 0.5), (3, "c", 1.5)], "k int, v string, score double"
        ),
        ["k"],
    )

    df = (
        registered.read.format("spooky_versioned")
        .option("path", tdir)
        .load()
    )
    assert dict(df.dtypes)["score"] == "double"
    got = {r["k"]: r["score"] for r in df.collect()}
    assert got[2] == 0.5 and got[3] == 1.5 and got[1] is None
    # native scan agrees
    nat = {r["k"]: r["score"] for r in U.read_table(registered, tdir).collect()}
    assert nat == got
    # time travel to v1: pre-evolution schema has NO score column
    v1 = U.committed_versions(tdir)[0]
    old = (
        registered.read.format("spooky_versioned")
        .option("path", tdir)
        .option("version", v1)
        .load()
    )
    assert "score" not in old.columns
    assert {r["k"] for r in old.collect()} == {1, 2}


def test_push_filters_prunes_on_manifest_stats(registered, tmp_path):
    """Catalyst's pushed predicates skip files via manifest stats — zero
    footer IO at plan time, and every filter is returned unhandled so
    Spark still applies it (pruning is optimization, never correctness)."""
    from pyspark.sql.datasource import EqualTo, GreaterThan, In
    from spookystuff_spark.sources.versioned_source import _BatchReader

    spark = registered
    tdir = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(k, k * 10) for k in range(1, 101)], "k int, val long"
    ).repartitionByRange(4, "k")
    U.write_table(df, tdir)
    U.attach_stats(tdir, ["k"])
    v = U.committed_versions(tdir)[-1]

    reader = _BatchReader(tdir, v, df.schema)
    n_before = len(reader.files)
    assert n_before == 4
    remaining = reader.pushFilters([GreaterThan(("k",), 80)])
    assert len(list(remaining)) == 1  # unhandled: Spark re-applies
    assert reader.files_skipped >= 2 and len(reader.files) < n_before

    reader2 = _BatchReader(tdir, v, df.schema)
    reader2.pushFilters([EqualTo(("k",), 5), In(("k",), (5, 7))])
    assert len(reader2.files) == 1

    # E2E through the engine: filtered read agrees with the native scan
    got = {
        r["k"]
        for r in spark.read.format("spooky_versioned")
        .option("path", tdir)
        .load()
        .where("k > 80")
        .collect()
    }
    assert got == set(range(81, 101))


def test_push_filters_prunes_partitions_and_respects_dvs(registered, tmp_path):
    from pyspark.sql.datasource import EqualTo
    from spookystuff_spark.sources.partitioned_table import (
        write_table_partitioned,
    )
    from spookystuff_spark.sources.versioned_source import _BatchReader

    spark = registered
    tdir = str(tmp_path / "pt")
    df = spark.createDataFrame(
        [(k, "a" if k % 2 else "b", k * 10) for k in range(1, 9)],
        "k int, grp string, val long",
    )
    import pyspark.sql.functions as F

    write_table_partitioned(df, tdir, "grp")
    U.delete_where_dv(spark, tdir, F.col("k") == 3, ["k"])
    v = U.committed_versions(tdir)[-1]

    reader = _BatchReader(tdir, v, df.schema)
    n_all = len(reader.files)
    reader.pushFilters([EqualTo(("grp",), "a")])
    assert 0 < len(reader.files) < n_all  # only partition a's files remain

    got = {
        r["k"]
        for r in spark.read.format("spooky_versioned")
        .option("path", tdir)
        .load()
        .where("grp = 'a'")
        .collect()
    }
    assert got == {1, 5, 7}  # 3 stays DV-deleted even on the pruned path
