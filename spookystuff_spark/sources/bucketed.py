"""Bucketed-table storage for co-located joins and aggregations.

At 100 TB the dominant cost of a fact⋈fact join is the shuffle of both
sides. Spark's bucketed tables (`bucketBy` + `sortBy` at write time) persist
a hash-partitioned, optionally sorted layout; a join or aggregation keyed on
the bucket column then reads both sides pre-partitioned — the plan contains
NO Exchange at all (verified by `tests/test_bucketed.py`). This is the
standing replacement for the reference's Indexing/Sorting locality engine
(`LocalityImpl.scala`): instead of hand-scheduling per-partition index joins,
declare the layout once and let Catalyst elide the shuffle on every
subsequent query.

Usage notes for real clusters:
  * both sides must agree on bucket count and key;
  * `spark.sql.sources.bucketing.enabled` (default true) must stay on —
    `bucketing.autoBucketedScan.enabled` lets Catalyst fall back to a plain
    scan when bucketing doesn't help;
  * one file per bucket per task: repartition by the bucket key before
    writing to keep file counts at n_buckets.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) parquet table.

    Repartitions by the bucket key first so each task owns whole buckets —
    without this, every task writes a file per bucket it happens to hold and
    the layout degenerates to n_tasks × n_buckets small files."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.repartition(n_buckets, *[F.col(k) for k in keys])
        .write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        writer = writer.sortBy(*keys)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
