"""Keyed (bucket-laid-out) aggregate folds — sources/incremental.py's
``dst_buckets`` mode: a trickle delta must rewrite O(touched buckets)
partitions, never the whole aggregate table (the r8 verdict's top scale
term), while staying value-identical to the legacy full-rewrite fold and
to a closed-form recompute. Also pins the capped affected-group collect
and the O(1) watermark-only advance."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources import incremental as INC
from spookystuff_spark.sources.incremental import (
    last_processed_version,
    refresh_aggregate,
)
from spookystuff_spark.sources.partitioned_table import _part_of


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, grp string, val long")


def _expected(spark, src):
    return {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, src)
        .groupBy("grp")
        .agg(F.sum("val").alias("val_sum"), F.count("*").alias("n_rows"))
        .collect()
    }


def _got(spark, dst):
    return {
        (r["grp"], r["val_sum"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }


def test_keyed_fold_matches_recompute_through_all_commit_kinds(
    spark, tmp_path
):
    """The bucketed fold is value-identical to the closed-form recompute
    across insert / preimage-logged upsert / append / delete / compaction
    — and the derived table's read schema carries NO bucket column."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(
        _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]), src
    )
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=8)
    assert U.read_table(spark, dst).columns == ["grp", "val_sum", "n_rows"]
    assert _got(spark, dst) == _expected(spark, src)

    U.upsert(
        spark, src, _rows(spark, [(2, "a", 25), (4, "b", 7)]), ["k"],
        feed_preimages=True,
    )
    U.append_rows(spark, src, _rows(spark, [(5, "c", 100)]))
    U.delete_where(spark, src, F.col("grp") == "c")
    U.compact(spark, src, num_files=2)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=8)
    assert _got(spark, dst) == _expected(spark, src) == {
        ("a", 35, 2), ("b", 12, 2)
    }
    assert last_processed_version(dst) == U.committed_versions(src)[-1]
    # idempotent no-op, layout re-detected without the parameter
    n = len(U.committed_versions(dst))
    assert refresh_aggregate(spark, src, dst, ["grp"], ["val"]) is None
    assert len(U.committed_versions(dst)) == n


def test_one_group_delta_rewrites_one_bucket(spark, tmp_path):
    """THE scale pin: on a bucketed aggregate, a delta touching one group
    rewrites exactly that group's bucket — the commit's own files all live
    under ONE ``__part=`` dir, its manifest delta removes entries from
    only that dir, and every other bucket's entries carry through by
    reference (zero data IO, O(touched) manifest bytes)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    n_buckets = 16
    # many groups so every bucket is populated
    base = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 64).cast("string")).alias("grp"),
        (F.col("id") * 3).cast("long").alias("val"),
    )
    U.write_table(base, src)
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"], dst_buckets=n_buckets
    )
    seed_m = U.read_manifest(dst, U._latest(dst))
    seed_buckets = {_part_of(e) for e in seed_m["files"]}
    assert len(seed_buckets) > 4  # layout actually spread out

    U.append_rows(spark, src, _rows(spark, [(9001, "g7", 5)]))
    v = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    raw = U._read_manifest_raw(dst, v)
    # the commit is a manifest DELTA, not a full rewrite
    assert "files_base" in raw, "keyed refresh must commit a manifest delta"
    added = {_part_of(e) for e in raw["files_add"]}
    removed = {_part_of(e) for e in raw["files_remove"]}
    assert len(added) == 1, f"one-group delta rewrote buckets {added}"
    assert removed <= added  # only the touched bucket's old entries removed
    # untouched buckets' entries carried by reference, and values exact
    m = U.read_manifest(dst, v)
    assert {_part_of(e) for e in m["files"]} >= seed_buckets
    assert _got(spark, dst) == _expected(spark, src)


def test_keyed_minmax_and_null_groups(spark, tmp_path):
    """Min/max targeted re-derivation and NULL group keys both work under
    the bucketed layout (NULL hashes into an ordinary bucket — there is no
    ``__part=`` NULL hole to fall into)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    rows = spark.createDataFrame(
        [(1, None, 10), (2, None, 30), (3, "x", 5), (4, "y", 8)],
        "k int, grp string, val long",
    )
    U.write_table(rows, src)
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"],
        min_cols=["val"], max_cols=["val"], dst_buckets=4,
    )

    def got():
        return {
            (r["grp"], r["val_sum"], r["val_min"], r["val_max"], r["n_rows"])
            for r in U.read_table(spark, dst).collect()
        }

    assert got() == {
        (None, 40, 10, 30, 2), ("x", 5, 5, 5, 1), ("y", 8, 8, 8, 1)
    }
    # delete the NULL group's max: min/max re-derive, only buckets touched
    U.delete_where_dv(spark, src, "k = 2", ["k"])
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"],
        min_cols=["val"], max_cols=["val"],
    )
    assert got() == {
        (None, 10, 10, 10, 1), ("x", 5, 5, 5, 1), ("y", 8, 8, 8, 1)
    }
    # NULL group vanishes at zero count
    U.delete_where_dv(spark, src, "k = 1", ["k"])
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"],
        min_cols=["val"], max_cols=["val"],
    )
    assert got() == {("x", 5, 5, 5, 1), ("y", 8, 8, 8, 1)}


def test_flattened_layout_heals_on_next_refresh(spark, tmp_path):
    """A plain ``compact`` on the derived table flattens the bucket layout
    (it knows nothing of the virtual bucket); the next refresh heals with
    one full bucketed re-seed instead of corrupting or refusing."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(_rows(spark, [(1, "a", 1), (2, "b", 2)]), src)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)
    U.compact(spark, dst)  # flattens __part= layout, carries agg extras
    U.append_rows(spark, src, _rows(spark, [(3, "a", 10)]))
    v = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    assert _got(spark, dst) == _expected(spark, src)
    # healed: every entry is bucketed again and the next delta is keyed
    m = U.read_manifest(dst, v)
    assert all(_part_of(e) is not None for e in m["files"])
    U.append_rows(spark, src, _rows(spark, [(4, "b", 20)]))
    v2 = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    assert "files_base" in U._read_manifest_raw(dst, v2)
    assert _got(spark, dst) == _expected(spark, src)


def test_bucket_count_mismatch_refuses(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(_rows(spark, [(1, "a", 1)]), src)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)
    U.append_rows(spark, src, _rows(spark, [(2, "b", 2)]))
    with pytest.raises(ValueError, match="re-bucketing"):
        refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=8)


def test_watermark_only_advance_is_empty_commit(spark, tmp_path):
    """Feed-less source versions (compaction) advance the watermark with
    an EMPTY manifest-delta commit — zero data files written, never a
    table rewrite (pre-r9 the legacy path rewrote the whole table)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(_rows(spark, [(1, "a", 1), (2, "b", 2)]), src)
    refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    U.compact(spark, src)  # no feed
    v = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    assert v is not None
    raw = U._read_manifest_raw(dst, v)
    assert raw["files_add"] == [] and raw["files_remove"] == []
    assert last_processed_version(dst) == U.committed_versions(src)[-1]
    assert _got(spark, dst) == _expected(spark, src)
    # and again in keyed mode
    dst2 = str(tmp_path / "agg2")
    refresh_aggregate(spark, src, dst2, ["grp"], ["val"], dst_buckets=4)
    U.compact(spark, src)
    v2 = refresh_aggregate(spark, src, dst2, ["grp"], ["val"])
    raw2 = U._read_manifest_raw(dst2, v2)
    assert raw2["files_add"] == [] and raw2["files_remove"] == []
    assert _got(spark, dst2) == _expected(spark, src)


def test_affected_collect_is_capped(spark, tmp_path, monkeypatch):
    """Above AFFECTED_PARTS_MAX affected groups, the min/max rescan must
    NOT enumerate partitions on the driver: nothing beyond the cap+1 probe
    is collected and ``read_table_partitions`` is never called — the
    rescan falls through to the one-pass null-safe semi-join scan."""
    from spookystuff_spark.sources import partitioned_table as PT
    from spookystuff_spark.sources.partitioned_table import (
        write_table_partitioned,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    rows = spark.createDataFrame(
        [(i, f"g{i % 5}", i * 10) for i in range(10)],
        "k int, grp string, val long",
    )
    write_table_partitioned(rows, src, "grp")
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"],
        min_cols=["val"], src_partition_col="grp",
    )
    # a delete touching 4 groups with the cap forced down to 3
    U.delete_where_dv(spark, src, "k IN (5, 6, 7, 8)", ["k"])
    monkeypatch.setattr(INC, "AFFECTED_PARTS_MAX", 3)

    def boom(*a, **k):
        raise AssertionError(
            "read_table_partitions called above the affected-group cap"
        )

    monkeypatch.setattr(PT, "read_table_partitions", boom)
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"],
        min_cols=["val"], src_partition_col="grp",
    )
    got = {
        (r["grp"], r["val_sum"], r["val_min"], r["n_rows"])
        for r in U.read_table(spark, dst).collect()
    }
    exp = {
        (r["grp"], r["val_sum"], r["val_min"], r["n_rows"])
        for r in U.read_table(spark, src)
        .groupBy("grp")
        .agg(
            F.sum("val").alias("val_sum"),
            F.min("val").alias("val_min"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }
    assert got == exp


def test_keyed_dst_with_deletion_vectors_heals(spark, tmp_path):
    """A DV delete on the derived table itself (a plain versioned table —
    nothing forbids it) must not resurrect through a keyed delta commit:
    untouched buckets carry by base reference, and a delta that dropped
    the dv fields would un-delete their rows. The refresh routes through
    the heal path instead — one full bucketed rewrite that MATERIALIZES
    the vectors — and keyed deltas resume after."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(
        _rows(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)]), src
    )
    refresh_aggregate(spark, src, dst, ["grp"], ["val"], dst_buckets=4)
    # user DV-deletes a derived row directly
    U.delete_where_dv(spark, dst, "grp = 'c'", ["grp"])
    assert _got(spark, dst) == {("a", 1, 1), ("b", 2, 1)}
    U.append_rows(spark, src, _rows(spark, [(4, "a", 10)]))
    v = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    raw = U._read_manifest_raw(dst, v)
    assert "files_base" not in raw, "keyed delta committed over a DV"
    assert not raw.get("dv"), "heal must materialize the vectors"
    # the deleted group stays deleted; the fold landed; c can return if
    # the SOURCE feed re-creates it (vectors were materialized, not kept)
    assert _got(spark, dst) == {("a", 11, 2), ("b", 2, 1)}
    U.append_rows(spark, src, _rows(spark, [(5, "b", 20)]))
    v2 = refresh_aggregate(spark, src, dst, ["grp"], ["val"])
    assert "files_base" in U._read_manifest_raw(dst, v2)  # keyed resumed


def test_sumsq_variance_folds_exactly(spark, tmp_path):
    """``sumsq_cols`` accumulates SUM(c²) in exact decimal arithmetic, so
    the incremental fold — including a min/max rescan batch, whose
    passthrough must carry the sumsq column — equals a closed-form
    recompute bit-for-bit, and read-time variance derives from it."""
    from spookystuff_spark.sources.incremental import with_derived_stats

    src, dst = str(tmp_path / "src"), str(tmp_path / "agg")
    U.write_table(
        _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 5)]), src
    )
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"], min_cols=["val"],
        dst_buckets=4, sumsq_cols=["val"],
    )
    U.upsert(
        spark, src, _rows(spark, [(2, "a", 25), (4, "b", 7)]), ["k"],
        feed_preimages=True,
    )
    U.delete_where(spark, src, F.col("k") == 3)
    refresh_aggregate(
        spark, src, dst, ["grp"], ["val"], min_cols=["val"],
        sumsq_cols=["val"],
    )
    got = {
        (r["grp"], int(r["val_sum"]), int(r["val_sumsq"]), r["n_rows"],
         r["val_avg"], r["val_var"])
        for r in with_derived_stats(
            U.read_table(spark, dst), avg_cols=["val"], var_cols=["val"]
        ).collect()
    }
    # live rows: a -> 10, 25; b -> 7
    assert got == {
        ("a", 35, 725, 2, 17.5, 725 / 2 - 17.5 * 17.5),
        ("b", 7, 49, 1, 7.0, 0.0),
    }
