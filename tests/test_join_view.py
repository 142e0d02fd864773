"""Incremental JOIN view (sources/join_view.py): the delta-join identity
produces exactly the full-join state after any interleaving of appends to
either side, the snapshot probes are partition-pruned when the source is
laid out by the join key, non-append feeds refuse, and refreshes are
exactly-once under replay."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.join_view import refresh_join_view
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    write_table_partitioned,
)


def _dim(spark, rows):  # (k, dname)
    return spark.createDataFrame(rows, "k int, dname string")


def _fact(spark, rows):  # (k, fid, amt)
    return spark.createDataFrame(rows, "k int, fid int, amt long")


def _full_join_state(spark, a_dir, b_dir, on=("k",)):
    return {
        tuple(r)
        for r in U.read_table(spark, a_dir)
        .join(U.read_table(spark, b_dir), list(on), "inner")
        .select("k", "dname", "fid", "amt")
        .collect()
    }


def _view_state(spark, dst):
    return {
        tuple(r)
        for r in U.read_table(spark, dst)
        .select("k", "dname", "fid", "amt")
        .collect()
    }


def test_seed_then_interleaved_appends_match_full_join(spark, tmp_path):
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "one"), (2, "two")]), a)
    U.write_table(_fact(spark, [(1, 10, 100), (2, 20, 200), (3, 30, 300)]), b)
    assert refresh_join_view(spark, a, b, dst, ["k"])  # seed
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)

    # append to A only: new dim rows join EXISTING facts
    U.append_rows(spark, a, _dim(spark, [(3, "three")]))
    assert refresh_join_view(spark, a, b, dst, ["k"])
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)

    # append to B only
    U.append_rows(spark, b, _fact(spark, [(1, 11, 110), (9, 99, 990)]))
    assert refresh_join_view(spark, a, b, dst, ["k"])
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)

    # append to BOTH before one refresh: the ΔA⋈ΔB pairs count ONCE
    U.append_rows(spark, a, _dim(spark, [(9, "nine")]))
    U.append_rows(spark, b, _fact(spark, [(9, 91, 910), (3, 31, 310)]))
    assert refresh_join_view(spark, a, b, dst, ["k"])
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)

    # nothing new: no-op, no new commit
    n = len(U.committed_versions(dst))
    assert refresh_join_view(spark, a, b, dst, ["k"]) is None
    assert len(U.committed_versions(dst)) == n


def test_replayed_refresh_is_exactly_once(spark, tmp_path):
    """Calling refresh twice after one append produces no duplicates: the
    dual watermark rides the view's commit."""
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "one")]), a)
    U.write_table(_fact(spark, [(1, 10, 100)]), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    U.append_rows(spark, b, _fact(spark, [(1, 11, 110)]))
    refresh_join_view(spark, a, b, dst, ["k"])
    before = _view_state(spark, dst)
    assert refresh_join_view(spark, a, b, dst, ["k"]) is None  # replay
    assert _view_state(spark, dst) == before
    assert U.read_table(spark, dst).count() == 2  # no duplicate pairs


def test_partitioned_source_probe_is_partition_pruned(spark, tmp_path):
    """When the fact side is laid out by the join key, a dim-side append
    probes ONLY the touched partitions — spy on read_table_partitions."""
    import spookystuff_spark.sources.join_view as JV

    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(i, f"d{i}") for i in range(6)]), a)
    write_table_partitioned(
        _fact(spark, [(i % 6, i, i * 10) for i in range(60)]), b, "k"
    )
    refresh_join_view(spark, a, b, dst, ["k"])

    probed = {}
    from spookystuff_spark.sources import partitioned_table as PT

    orig = PT.read_table_partitions

    def spy(spark_, table_dir_, vals, version=None):
        probed.setdefault(table_dir_, []).append(sorted(map(str, vals)))
        return orig(spark_, table_dir_, vals, version)

    JV.read_table_partitions = None  # ensure the lazy import path is used
    import unittest.mock as mock

    with mock.patch.object(PT, "read_table_partitions", side_effect=spy):
        U.append_rows(spark, a, _dim(spark, [(2, "TWO!")]))
        refresh_join_view(spark, a, b, dst, ["k"])
    assert probed[b] == [["2"]]  # only partition k=2 of the fact table
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)


def test_append_partitioned_sources_compose(spark, tmp_path):
    """Both sources partitioned by the key, maintained with the O(batch)
    partitioned append — the 100-TB shape end to end."""
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    write_table_partitioned(_dim(spark, [(1, "one"), (2, "two")]), a, "k")
    write_table_partitioned(_fact(spark, [(1, 10, 100), (2, 20, 200)]), b, "k")
    refresh_join_view(spark, a, b, dst, ["k"])
    append_partitioned(spark, a, _dim(spark, [(3, "three")]), "k")
    append_partitioned(
        spark, b, _fact(spark, [(3, 30, 300), (2, 21, 210)]), "k"
    )
    refresh_join_view(spark, a, b, dst, ["k"])
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)
    # the view's own commits are O(batch) delta manifests
    tip = U._latest(dst)
    assert "files" not in U._read_manifest_raw(dst, tip)


def test_non_append_feed_refuses(spark, tmp_path):
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "one"), (2, "two")]), a)
    U.write_table(_fact(spark, [(1, 10, 100)]), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    U.delete_where(spark, a, F.col("k") == 2)
    with pytest.raises(ValueError, match="append-only"):
        refresh_join_view(spark, a, b, dst, ["k"])


def test_non_key_column_clash_refuses(spark, tmp_path):
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "x")]), a)
    U.write_table(
        spark.createDataFrame([(1, "y")], "k int, dname string"), b
    )
    with pytest.raises(ValueError, match="both sides"):
        refresh_join_view(spark, a, b, dst, ["k"])


def test_streaming_sink_keeps_view_fresh(spark, tmp_path):
    """foreachBatch wrapper: the CDC stream triggers refreshes; the
    watermark (not the checkpoint) stays the source of truth."""
    from spookystuff_spark.sources.join_view import streaming_join_view_sink
    from spookystuff_spark.sources.versioned_source import register

    register(spark)
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "one")]), a)
    U.write_table(_fact(spark, [(1, 10, 100)]), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    U.append_rows(spark, b, _fact(spark, [(1, 11, 110)]))
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", b)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            streaming_join_view_sink(a, b, dst, ["k"])
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _view_state(spark, dst) == _full_join_state(spark, a, b)


def test_vacuumed_watermark_refuses_instead_of_reseeding(spark, tmp_path):
    """Maintenance that drops every marker-bearing version must NOT let
    the next refresh re-seed the full join onto the existing content
    (silent whole-view duplication) — it refuses with a rebuild hint."""
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(_dim(spark, [(1, "one")]), a)
    U.write_table(_fact(spark, [(1, 10, 100)]), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    # simulate aggressive maintenance: compact (marker-less tip) + vacuum
    U.compact(spark, dst, num_files=1)
    U.vacuum(dst, keep=1)
    U.append_rows(spark, b, _fact(spark, [(1, 11, 110)]))
    with pytest.raises(ValueError, match="no _SRCJ watermark"):
        refresh_join_view(spark, a, b, dst, ["k"])
    # the view content was never doubled
    assert U.read_table(spark, dst).count() == 1


def test_subset_schema_feed_null_fills_instead_of_wedging(spark, tmp_path):
    """A legal subset-schema append (additive evolution: the feed lacks a
    later-evolved column) must fold with typed null-fill — a crash here
    would wedge the view forever, since feeds are immutable and the
    watermark only advances on success."""
    a, b, dst = (str(tmp_path / n) for n in ("a", "b", "v"))
    U.write_table(
        spark.createDataFrame([(1, "one", 5)], "k int, dname string, extra int"),
        a,
    )
    U.write_table(_fact(spark, [(1, 10, 100)]), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    # subset-schema append: no 'extra' column in the batch
    U.append_rows(spark, a, spark.createDataFrame(
        [(2, "two")], "k int, dname string"
    ))
    U.append_rows(spark, b, _fact(spark, [(2, 20, 200)]))
    assert refresh_join_view(spark, a, b, dst, ["k"])
    got = {
        (r["k"], r["dname"], r["extra"], r["fid"])
        for r in U.read_table(spark, dst).collect()
    }
    assert got == {(1, "one", 5, 10), (2, "two", None, 20)}


def test_randomized_interleavings_match_model(spark, tmp_path):
    """Property test: a seeded random schedule of appends (A-side, B-side,
    or both; duplicate keys; empty batches; refreshes at random points)
    always leaves the view equal to a pure-Python full-join recompute —
    the delta-join algebra has no schedule-dependent edge case."""
    import random

    rng = random.Random(20260815)
    a, b, dst = (str(tmp_path / n) for n in ("ra", "rb", "rv"))
    a_rows = [(rng.randrange(8), f"d{i}") for i in range(4)]
    b_rows = [(rng.randrange(8), i, i * 10) for i in range(4)]
    U.write_table(_dim(spark, a_rows), a)
    U.write_table(_fact(spark, b_rows), b)
    refresh_join_view(spark, a, b, dst, ["k"])
    next_id = 100
    for step in range(12):
        action = rng.choice(["a", "b", "ab", "refresh", "refresh"])
        if action in ("a", "ab"):
            batch = [
                (rng.randrange(8), f"d{next_id + j}")
                for j in range(rng.randrange(0, 3))
            ]
            next_id += 3
            if batch:
                a_rows += batch
                U.append_rows(spark, a, _dim(spark, batch))
        if action in ("b", "ab"):
            batch = [
                (rng.randrange(8), next_id + j, (next_id + j) * 10)
                for j in range(rng.randrange(0, 3))
            ]
            next_id += 3
            if batch:
                b_rows += batch
                U.append_rows(spark, b, _fact(spark, batch))
        if action == "refresh" or rng.random() < 0.3:
            refresh_join_view(spark, a, b, dst, ["k"])
    refresh_join_view(spark, a, b, dst, ["k"])
    # pure-Python model: multiset full join
    from collections import Counter

    model = Counter(
        (ka, dn, fid, amt)
        for ka, dn in a_rows
        for kb, fid, amt in b_rows
        if ka == kb
    )
    got = Counter(
        tuple(r)
        for r in U.read_table(spark, dst)
        .select("k", "dname", "fid", "amt")
        .collect()
    )
    assert got == model
