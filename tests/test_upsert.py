"""Versioned parquet upsert: MERGE semantics, atomic pointer, vacuum."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources.upsert import (
    compact,
    delete_where,
    read_table,
    upsert,
    vacuum,
    versions,
    write_table,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "docs_table")


def _rows(df):
    return sorted((r["k"], r["v"]) for r in df.collect())


def test_upsert_replaces_and_inserts(spark, tdir):
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string")
    write_table(base, tdir)
    up = spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string")
    upsert(spark, tdir, up, ["k"])
    assert _rows(read_table(spark, tdir)) == [(1, "a"), (2, "B"), (3, "c"), (4, "d")]


def test_upsert_on_empty_table_creates(spark, tdir):
    up = spark.createDataFrame([(1, "x")], "k long, v string")
    upsert(spark, tdir, up, ["k"])
    assert _rows(read_table(spark, tdir)) == [(1, "x")]


def test_reader_sees_only_committed_version(spark, tdir):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    write_table(base, tdir)
    # simulate a crashed writer: version dir exists, pointer not swapped
    os.makedirs(os.path.join(tdir, "v99999"))
    assert _rows(read_table(spark, tdir)) == [(1, "a")]
    removed = vacuum(tdir, keep=2)
    assert "v99999" in removed


def test_delete_and_compact_and_vacuum(spark, tdir):
    base = spark.createDataFrame([(i, str(i)) for i in range(10)], "k long, v string")
    write_table(base, tdir)
    delete_where(spark, tdir, F.col("k") >= 5)
    assert len(_rows(read_table(spark, tdir))) == 5
    compact(spark, tdir, num_files=1)
    assert len(versions(tdir)) == 3
    vacuum(tdir, keep=1)
    assert len(versions(tdir)) == 1
    assert len(_rows(read_table(spark, tdir))) == 5


def test_versions_monotonic(spark, tdir):
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    v1 = write_table(base, tdir)
    v2 = upsert(spark, tdir, base, ["k"])
    assert (v1, v2) == ("v00001", "v00002")


def test_self_heal_after_dangling_version(spark, tdir):
    """A crashed writer's dangling dir must not block subsequent writes:
    _next_version skips past it (ADVICE r3) instead of colliding with
    errorifexists until a manual vacuum."""
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    write_table(base, tdir)  # v00001 committed
    # crashed writer: v00002 exists but pointer still v00001
    os.makedirs(os.path.join(tdir, "v00002"))
    up = spark.createDataFrame([(1, "A")], "k long, v string")
    v = upsert(spark, tdir, up, ["k"])  # must NOT raise
    assert v == "v00003"
    assert _rows(read_table(spark, tdir)) == [(1, "A")]
    # dangling dir is still vacuumable
    assert "v00002" in vacuum(tdir, keep=2)


def test_table_diff_keyed(spark, tdir):
    from spookystuff_spark.sources.upsert import table_diff

    v1 = write_table(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, v string"),
        tdir,
    )
    upsert(spark, tdir, spark.createDataFrame([(2, "B"), (4, "d")], "k long, v string"), ["k"])
    delete_where(spark, tdir, F.col("k") == 3)

    diff = table_diff(spark, tdir, v1, key_cols=["k"])
    got = sorted((r.k, r.v, r._change) for r in diff.collect())
    assert got == [(2, "B", "update"), (3, "c", "delete"), (4, "d", "insert")]


def test_table_diff_setwise_and_noop(spark, tdir):
    from spookystuff_spark.sources.upsert import table_diff

    v1 = write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"), tdir
    )
    upsert(spark, tdir, spark.createDataFrame([(2, "B")], "k long, v string"), ["k"])
    diff = table_diff(spark, tdir, v1)
    got = sorted((r.k, r.v, r._change) for r in diff.collect())
    assert got == [(2, "B", "insert"), (2, "b", "delete")]
    # same-version diff is empty
    cur = sorted((r.k, r.v) for r in read_table(spark, tdir).collect())
    assert cur == [(1, "a"), (2, "B")]
    latest = table_diff(spark, tdir, "v00002")
    assert latest.count() == 0
