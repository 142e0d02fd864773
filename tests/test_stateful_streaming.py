"""applyInPandasWithState: state must accumulate across micro-batches and the
final answer must equal the batch aggregate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.streaming.stateful import running_user_stats
from spookystuff_spark.tables import table
from tests.conftest import SF_SMOKE


def test_running_stats_accumulate_across_batches(spark, tmp_path):
    # two parquet drops → at maxFilesPerTrigger=1 the stream sees ≥2 batches
    ev_full = table(spark, SF_SMOKE, "events")
    a = ev_full.filter(F.col("event_id") % 2 == 0).select("user_id", "ts", "value")
    b = ev_full.filter(F.col("event_id") % 2 == 1).select("user_id", "ts", "value")
    src = str(tmp_path / "drops")
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("running_stats_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # "update" sink emits one row per user per batch → take the LAST emission
    got = (
        spark.sql(
            """SELECT user_id, n_events, total_value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                          ORDER BY n_events DESC) AS rn FROM running_stats_t
               ) WHERE rn = 1"""
        )
        .collect()
    )
    expected = {
        r.user_id: (r.n, round(r.tv, 2))
        for r in ev_full.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    got_map = {r.user_id: (r.n_events, r.total_value) for r in got}
    assert got_map == expected
    assert len(got_map) > 1
