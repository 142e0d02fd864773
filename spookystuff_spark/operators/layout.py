"""Input-layout helpers.

``spread_small_input``: CPU-heavy per-row stages (n-gram explosion, Arrow
Python passes, per-doc hashing) inherit the SCAN's partitioning — and a small
corpus is often one parquet file = ONE task, serializing minutes of per-token
work onto a single core while 31 idle. Spreading costs one tiny shuffle of the
raw rows and buys full parallelism for the expensive stage.

At 100 TB the input already has thousands of splits, so spreading must be a
no-op there: the helper repartitions ONLY when the planned input parallelism
is materially below the cluster's (< half of defaultParallelism). It never
narrows a wide input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame, factor: int = 2) -> DataFrame:
    """Repartition ``df`` to the session's default parallelism iff its
    planned partition count is below ``defaultParallelism / factor``.
    Round-robin repartition — no key, no skew."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:  # noqa: BLE001 — planning hiccup: leave layout alone
        return df
    if n_in * factor < target:
        return df.repartition(target)
    return df
