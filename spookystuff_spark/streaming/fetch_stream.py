"""Streaming fetch — continuous crawling via Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); this is rebuild-native: a stream
of URI rows (file drops, Kafka, rate source) flows through the SAME fetch
machinery (trace dedup + two-level doc cache) per micro-batch via foreachBatch,
landing observations in a parquet doc sink. The doc cache makes re-delivered
URIs cache hits, so at-least-once sources yield exactly-once remote fetches
within the cache TTL — the streaming analogue of the reference's
zero-redundant-fetch invariant.
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F

from spookystuff_spark.context import SpookyContext
from spookystuff_spark.plans.fetch import OBS_COL


def stream_fetch_to_parquet(
    sctx: SpookyContext,
    uri_stream,
    spec,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """readStream(uris) → fetch per micro-batch → append docs parquet.

    ``uri_stream``: streaming DataFrame whose columns feed ``spec`` templates.
    Returns the StreamingQuery.
    """

    def process_batch(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        fetched = sctx.create(batch_df).fetch(spec)
        docs = (
            fetched.df.select(F.explode(F.col(OBS_COL)).alias("o"))
            .select("o.*")
            .withColumn("batch_id", F.lit(batch_id))
        )
        docs.write.mode("append").parquet(sink_dir)

    writer = (
        uri_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
