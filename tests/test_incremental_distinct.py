"""COUNT(DISTINCT) IVM — sources/incremental.py's ``refresh_distinct``:
a counted (group, value) support Z-set that folds EXACTLY under deletes
(no rescan, unlike min/max), read back as a distinct count by
``read_distinct_aggregate``. Pins value parity against closed-form
recomputes through every commit kind, the keyed O(touched buckets)
rewrite, NULL value/group semantics, and a seeded random schedule vs a
pure-Python multiset model."""

from __future__ import annotations

import collections

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    last_processed_version,
    read_distinct_aggregate,
    refresh_distinct,
)
from spookystuff_spark.sources.partitioned_table import _part_of


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, grp string, val string")


def _expected(spark, src):
    return {
        (r["grp"], r["val_distinct"], r["n_rows"])
        for r in U.read_table(spark, src)
        .groupBy("grp")
        .agg(
            F.countDistinct("val").alias("val_distinct"),
            F.count("*").alias("n_rows"),
        )
        .collect()
    }


def _got(spark, dst):
    return {
        (r["grp"], r["val_distinct"], r["n_rows"])
        for r in read_distinct_aggregate(
            spark, dst, ["grp"], "val"
        ).collect()
    }


def test_distinct_fold_matches_recompute_through_all_commit_kinds(
    spark, tmp_path
):
    """Insert / preimage-logged upsert / append / delete / compaction all
    fold exactly; a (group, value) pair leaves the support set only at
    multiplicity zero (deleting ONE of two 'x' carriers must not drop the
    distinct value)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dd")
    U.write_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "x"), (3, "a", "y"),
                      (4, "b", "x")]),
        src,
    )
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=8)
    assert U.read_table(spark, dst).columns == ["grp", "val", "_n"]
    assert _got(spark, dst) == _expected(spark, src) == {
        ("a", 2, 3), ("b", 1, 1)
    }

    # delete one of the two 'x' carriers in group a: distinct count holds
    U.delete_where(spark, src, F.col("k") == 1)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert _got(spark, dst) == _expected(spark, src) == {
        ("a", 2, 2), ("b", 1, 1)
    }
    # delete the last carrier: the value leaves the support set
    U.delete_where(spark, src, F.col("k") == 2)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert _got(spark, dst) == {("a", 1, 1), ("b", 1, 1)}

    # preimage-logged upsert MOVES a value: old support decrements, new
    # increments; plus a fresh insert and a compaction (feed-less)
    U.upsert(
        spark, src, _rows(spark, [(3, "a", "z"), (5, "b", "y")]), ["k"],
        feed_preimages=True,
    )
    U.compact(spark, src, num_files=2)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert _got(spark, dst) == _expected(spark, src) == {
        ("a", 1, 1), ("b", 2, 2)
    }
    assert last_processed_version(dst) == U.committed_versions(src)[-1]
    # idempotent no-op, layout re-detected without the parameter
    n = len(U.committed_versions(dst))
    assert refresh_distinct(spark, src, dst, ["grp"], "val") is None
    assert len(U.committed_versions(dst)) == n


def test_one_group_delta_rewrites_one_bucket(spark, tmp_path):
    """The scale pin, distinct flavor: a delta touching one group rewrites
    exactly that group's bucket — every other bucket's support rows carry
    through the manifest delta by reference."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dd")
    base = spark.range(200).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("g"), (F.col("id") % 64).cast("string")).alias("grp"),
        (F.col("id") % 7).cast("string").alias("val"),
    )
    U.write_table(base, src)
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=16)
    seed_m = U.read_manifest(dst, U._latest(dst))
    seed_buckets = {_part_of(e) for e in seed_m["files"]}
    assert len(seed_buckets) > 4

    U.append_rows(spark, src, _rows(spark, [(9001, "g7", "fresh")]))
    v = refresh_distinct(spark, src, dst, ["grp"], "val")
    raw = U._read_manifest_raw(dst, v)
    assert "files_base" in raw, "keyed refresh must commit a manifest delta"
    added = {_part_of(e) for e in raw["files_add"]}
    removed = {_part_of(e) for e in raw["files_remove"]}
    assert len(added) == 1, f"one-group delta rewrote buckets {added}"
    assert removed <= added
    m = U.read_manifest(dst, v)
    assert {_part_of(e) for e in m["files"]} >= seed_buckets
    assert _got(spark, dst) == _expected(spark, src)


def test_null_value_and_null_group(spark, tmp_path):
    """A NULL value is an ordinary support row: excluded from the distinct
    count (SQL ``COUNT(DISTINCT v)`` semantics) but counted in ``n_rows``;
    a NULL GROUP folds like any other (eqNullSafe keys, ordinary
    bucket)."""
    src, dst = str(tmp_path / "src"), str(tmp_path / "dd")
    U.write_table(
        _rows(spark, [(1, None, "x"), (2, None, None), (3, "g", None)]),
        src,
    )
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=4)
    assert _got(spark, dst) == _expected(spark, src) == {
        (None, 1, 2), ("g", 0, 1)
    }
    # retract the NULL group's NULL-value row; then its last row
    U.delete_where(spark, src, F.col("k") == 2)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert _got(spark, dst) == {(None, 1, 1), ("g", 0, 1)}
    U.delete_where(spark, src, F.col("k") == 1)
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert _got(spark, dst) == {("g", 0, 1)}


def test_value_col_in_group_cols_refuses(spark, tmp_path):
    with pytest.raises(ValueError, match="also a group column"):
        refresh_distinct(
            spark, str(tmp_path / "s"), str(tmp_path / "d"),
            ["grp", "val"], "val",
        )


def test_randomized_schedule_matches_multiset_model(spark, tmp_path):
    """Seeded random schedule of appends, deletes and preimage-logged
    updates (duplicate values, NULLs, empty batches, refreshes at random
    points) always equals a pure-Python multiset recompute."""
    import random

    rng = random.Random(20260816)
    src, dst = str(tmp_path / "src"), str(tmp_path / "dd")
    vals = ["x", "y", "z", None]
    live: dict[int, tuple[str | None, str | None]] = {}

    def batch(n, start):
        out = []
        for j in range(n):
            k = start + j
            row = (k, f"g{rng.randrange(4)}", rng.choice(vals))
            live[k] = (row[1], row[2])
            out.append(row)
        return out

    U.write_table(_rows(spark, batch(6, 0)), src)
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=4)
    next_k = 100
    for step in range(10):
        action = rng.choice(["append", "delete", "update", "refresh"])
        if action == "append":
            n = rng.randrange(0, 3)
            if n:
                U.append_rows(spark, src, _rows(spark, batch(n, next_k)))
                next_k += n
        elif action == "delete" and live:
            k = rng.choice(sorted(live))
            del live[k]
            U.delete_where(spark, src, F.col("k") == k)
        elif action == "update" and live:
            k = rng.choice(sorted(live))
            g, _ = live[k]
            nv = rng.choice(vals)
            live[k] = (g, nv)
            U.upsert(
                spark, src, _rows(spark, [(k, g, nv)]), ["k"],
                feed_preimages=True,
            )
        if action == "refresh" or rng.random() < 0.4:
            refresh_distinct(spark, src, dst, ["grp"], "val")

    refresh_distinct(spark, src, dst, ["grp"], "val")
    per_group: dict[str | None, collections.Counter] = (
        collections.defaultdict(collections.Counter)
    )
    for g, v in live.values():
        per_group[g][v] += 1
    expected = {
        (
            g,
            sum(1 for v in c if v is not None),
            sum(c.values()),
        )
        for g, c in per_group.items()
    }
    assert _got(spark, dst) == expected == _expected(spark, src)


def test_topk_values_exact_under_deletes(spark, tmp_path):
    """read_topk_values: exact per-group heavy hitters off the support
    Z-set — counts fold under deletes, ties break by value, NULLs
    excluded."""
    from spookystuff_spark.sources.incremental import read_topk_values

    src, dst = str(tmp_path / "src"), str(tmp_path / "dd")
    rows = [(i, "g", v) for i, v in enumerate(
        ["x", "x", "x", "y", "y", "z", None]
    )]
    U.write_table(_rows(spark, rows), src)
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=4)

    def top(k):
        return [
            (r["val"], r["_n"], r["rank"])
            for r in read_topk_values(spark, dst, ["grp"], "val", k=k)
            .orderBy("rank")
            .collect()
        ]

    assert top(2) == [("x", 3, 1), ("y", 2, 2)]
    # delete two x carriers: y takes the lead, x ties z (value-ordered)
    U.delete_where(spark, src, F.col("k").isin(0, 1))
    refresh_distinct(spark, src, dst, ["grp"], "val")
    assert top(3) == [("y", 2, 1), ("x", 1, 2), ("z", 1, 3)]


def test_percentiles_exact_under_deletes(spark, tmp_path):
    """read_percentiles: exact PERCENTILE_DISC off the support Z-set —
    the smallest live value whose cumulative live-row share reaches p,
    folded exactly under deletes, NULLs excluded, integer-cut semantics
    (no float-boundary ambiguity at exact quantile positions)."""
    from spookystuff_spark.sources.incremental import read_percentiles

    src, dst = str(tmp_path / "src"), str(tmp_path / "dp")
    # g: multiset {a:1, b:4, c:5} → n=10; cum a=1 b=5 c=10
    rows = [(i, "g", v) for i, v in enumerate(
        ["a"] + ["b"] * 4 + ["c"] * 5 + [None]
    )]
    U.write_table(_rows(spark, rows), src)
    refresh_distinct(spark, src, dst, ["grp"], "val", dst_buckets=4)

    def pct(ps):
        return {
            (r["grp"], r["p"]): r["value"]
            for r in read_percentiles(
                spark, dst, ["grp"], "val", ps=ps
            ).collect()
        }

    got = pct((0.1, 0.5, 0.51, 0.9, 1.0))
    # p=0.1 → cum/n >= .1 first at a (1/10); p=0.5 → b (5/10 exactly —
    # the integer cut keeps the boundary row); p=0.51 → c; p=1.0 → c
    assert got == {
        ("g", 0.1): "a",
        ("g", 0.5): "b",
        ("g", 0.51): "c",
        ("g", 0.9): "c",
        ("g", 1.0): "c",
    }
    # DuckDB parity on the same multiset: percentile_disc agrees
    import duckdb

    con = duckdb.connect()
    for p in (0.1, 0.5, 0.51, 0.9, 1.0):
        want = con.execute(
            "SELECT percentile_disc(?) WITHIN GROUP (ORDER BY v) FROM ("
            "SELECT unnest(['a','b','b','b','b','c','c','c','c','c']) AS v)",
            [p],
        ).fetchone()[0]
        assert got[("g", p)] == want, p
    # delete all b carriers: {a:1, c:5}, n=6; cum a=1 c=6
    U.delete_where(spark, src, F.col("val") == "b")
    refresh_distinct(spark, src, dst, ["grp"], "val")
    got = pct((0.5, 0.9))
    # p=.5 → 3/6 cut lands inside c; p=.9 → c
    assert got == {("g", 0.5): "c", ("g", 0.9): "c"}
