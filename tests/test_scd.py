"""SCD-2 dimension history (operators/scd.py): batch folds match the
closed-form DuckDB recompute, attr-identical updates are no-ops,
out-of-order and duplicate batches refuse, and the as-of join labels
facts with the version valid at their timestamp."""

from __future__ import annotations

import duckdb
import pytest

import pyspark.sql.functions as F
from spookystuff_spark.operators.scd import (
    asof_join_scd2,
    scd2_sql,
    scd2_upsert,
)
from spookystuff_spark.sources import upsert as U


def _batch(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, effective_ts long")


BATCH1 = [(1, "auto", 100), (2, "bike", 100), (3, "car", 100)]
BATCH2 = [(1, "plane", 200), (2, "bike", 200)]   # 2 unchanged, 1 changes
BATCH3 = [(1, "train", 300), (4, "boat", 300)]   # 1 changes again, 4 is new


@pytest.fixture
def dim(spark, tmp_path):
    d = str(tmp_path / "dim")
    for b in (BATCH1, BATCH2, BATCH3):
        scd2_upsert(spark, d, _batch(spark, b), ["k"])
    return d


def test_state_matches_closed_form_oracle(spark, dim):
    got = {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"])
        for r in U.read_table(spark, dim).collect()
    }
    vals = lambda b: ", ".join(f"({k}, '{s}', {t})" for k, s, t in b)
    sql = scd2_sql(
        [
            (f"SELECT * FROM (VALUES {vals(b)}) t(k, seg, e)", "e")
            for b in (BATCH1, BATCH2, BATCH3)
        ],
        "k",
        ["seg AS seg"],
    )
    want = {tuple(r) for r in duckdb.connect().execute(sql).fetchall()}
    assert got == want
    assert got == {
        (1, "auto", 100, 200), (1, "plane", 200, 300), (1, "train", 300, None),
        (2, "bike", 100, None), (3, "car", 100, None), (4, "boat", 300, None),
    }


def test_noop_and_refusals(spark, dim):
    n = len(U.committed_versions(dim))
    assert (
        scd2_upsert(spark, dim, _batch(spark, [(2, "bike", 400)]), ["k"])
        is None
    )
    assert len(U.committed_versions(dim)) == n  # nothing committed
    with pytest.raises(ValueError, match="one row per key"):
        scd2_upsert(
            spark, dim, _batch(spark, [(1, "x", 500), (1, "y", 500)]), ["k"]
        )
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_upsert(spark, dim, _batch(spark, [(1, "x", 250)]), ["k"])


def test_asof_join_labels_facts_point_in_time(spark, dim):
    facts = spark.createDataFrame(
        [(10, 1, 150), (11, 1, 200), (12, 1, 999), (13, 2, 120),
         (14, 3, 50), (15, 4, 300)],
        "fact_id long, k long, ts long",
    )
    got = {
        (r["fact_id"], r["seg"])
        for r in asof_join_scd2(
            facts, U.read_table(spark, dim), ["k"], "ts"
        ).collect()
    }
    assert got == {
        (10, "auto"),    # before the 200 change
        (11, "plane"),   # [from, to) half-open: AT the boundary → new row
        (12, "train"),   # open current row
        (13, "bike"),
        (15, "boat"),
    }  # fact 14 predates key 3's first version → dropped (inner)


def test_streaming_scd2_sink(spark, tmp_path):
    """Rate-limited file stream of observations → SCD-2 history: the
    streamed fold lands in the same state as the batch folds, replayed
    observations are no-ops."""
    from spookystuff_spark.operators.scd import streaming_scd2_sink

    src = str(tmp_path / "obs")
    d = str(tmp_path / "sdim")
    import os

    os.makedirs(src)
    _batch(spark, BATCH1).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, BATCH2).coalesce(1).write.mode("append").parquet(src)
    _batch(spark, BATCH3).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("k long, seg string, effective_ts long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(streaming_scd2_sink(d, ["k"]))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["k"], r["seg"], r["valid_from"], r["valid_to"])
        for r in U.read_table(spark, d).collect()
    }
    assert got == {
        (1, "auto", 100, 200), (1, "plane", 200, 300), (1, "train", 300, None),
        (2, "bike", 100, None), (3, "car", 100, None), (4, "boat", 300, None),
    }


def test_asof_join_plan_is_equi_join(spark, dim):
    facts = spark.createDataFrame([(1, 1, 150)], "fact_id long, k long, ts long")
    plan = (
        asof_join_scd2(facts, U.read_table(spark, dim), ["k"], "ts")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
