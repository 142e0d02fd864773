"""Schema evolution, zero-copy clones, and the empirical Z-order skipping
proof (parquet-footer min/max stats)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.layout import (
    file_minmax_stats,
    skipping_ratio,
    zorder_write,
)
from spookystuff_spark.sources import upsert as U


# ------------------------------------------------------ schema evolution


def test_upsert_evolves_schema_additively(spark, tmp_path):
    tdir = str(tmp_path / "t")
    U.write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"), tdir
    )
    # updates arrive with a NEW column; old rows null-fill it
    v2 = U.upsert(
        spark,
        tdir,
        spark.createDataFrame([(2, "B", 0.9)], "k int, v string, score double"),
        ["k"],
    )
    cur = U.read_table(spark, tdir)
    assert set(cur.columns) == {"k", "v", "score"}
    got = {(r["k"], r["v"], r["score"]) for r in cur.collect()}
    assert got == {(1, "a", None), (2, "B", 0.9)}
    # time travel returns the OLD schema untouched
    old = U.read_table(spark, tdir, U.committed_versions(tdir)[0])
    assert set(old.columns) == {"k", "v"}

    # updates may also OMIT columns: missing values null-fill on the update
    U.upsert(
        spark, tdir, spark.createDataFrame([(3, "c")], "k int, v string"), ["k"]
    )
    row3 = U.read_table(spark, tdir).where("k = 3").collect()[0]
    assert row3["score"] is None and row3["v"] == "c"
    assert v2 == "v00002"


# ------------------------------------------------------ zero-copy clone


def test_clone_table_is_zero_copy_and_independent(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    U.write_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string").coalesce(1),
        src,
    )
    U.clone_table(src, dst)
    assert {(r["k"], r["v"]) for r in U.read_table(spark, dst).collect()} == {
        (1, "a"), (2, "b")
    }
    # metadata-only: the clone's version dir holds ZERO data files; its
    # manifest references the source snapshot's immutable files by absolute
    # path (no hard links / copies — the object-store-safe shallow clone)
    dst_snap = os.path.join(dst, U.committed_versions(dst)[-1])
    assert not [f for f in os.listdir(dst_snap) if f.endswith(".parquet")]
    src_snap = os.path.join(src, U.committed_versions(src)[-1])
    cloned = U.snapshot_files(dst, U.committed_versions(dst)[-1])
    assert cloned and all(
        os.path.dirname(f) == src_snap for f in cloned
    )

    # clones diverge independently: upsert into the clone, source untouched
    U.upsert(
        spark, dst, spark.createDataFrame([(9, "z")], "k int, v string"), ["k"]
    )
    assert U.read_table(spark, dst).count() == 3
    assert U.read_table(spark, src).count() == 2


# ------------------------------------------- Z-order skipping, empirically


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The whole point of the Z-curve: after zorder_write on (x, y), a
    selective range filter on EITHER column can skip most files on footer
    stats — an unsorted (round-robin) layout skips none."""
    n, files = 40_000, 16
    df = spark.range(0, n).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") / 200).cast("long") % 200).alias("y"),
    )
    flat = str(tmp_path / "flat")
    zord = str(tmp_path / "zord")
    df.repartition(files).write.parquet(flat)
    zorder_write(df, ["x", "y"], zord, bits=8, num_files=files)

    # footprints exist for both layouts
    assert len(file_minmax_stats(zord, ["x", "y"])) >= files // 2
    for col in ("x", "y"):
        r_flat = skipping_ratio(flat, col, 10, 19)  # 5% selectivity
        r_z = skipping_ratio(zord, col, 10, 19)
        assert r_flat == 0.0  # round-robin: every file spans ~the full domain
        assert r_z >= 0.5, f"z-order should skip most files on {col}: {r_z}"


def test_single_sort_skips_one_dimension_only(spark, tmp_path):
    """Contrast case: a plain sort by x gives perfect x-skipping and ~zero
    y-skipping — the asymmetry Z-order removes."""
    df = spark.range(0, 40_000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") / 200).cast("long") % 200).alias("y"),
    )
    path = str(tmp_path / "bysort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(path)
    assert skipping_ratio(path, "x", 10, 19) >= 0.8
    assert skipping_ratio(path, "y", 10, 19) <= 0.1
