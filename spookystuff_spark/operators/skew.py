"""Skew mitigation: salted two-phase aggregation.

When a groupBy key is pathologically hot (one key = 30% of 100 TB), the single
reducer owning it becomes the stage's straggler. Salting splits each key into
``n_salts`` subkeys for a uniform first-phase partial aggregate, then merges
partials in a second (tiny) aggregate. AQE's skew-join handling covers joins;
this covers aggregations, which AQE does not rebalance.

Only algebraic aggregates decompose this way — supported: sum, count, min,
max (avg = sum/count, composed here).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def salted_agg(
    df: DataFrame,
    keys: list[str],
    n_salts: int = 16,
    sums: list[str] = (),
    counts: bool = True,
    mins: list[str] = (),
    maxs: list[str] = (),
    avgs: list[str] = (),
) -> DataFrame:
    """Two-phase skew-proof groupBy: phase 1 on (keys + salt), phase 2 on keys.

    Output columns: ``sum_<c>``, ``n_rows``, ``min_<c>``, ``max_<c>``,
    ``avg_<c>``.
    """
    salt = (F.rand(seed=42) * n_salts).cast("int").alias("__salt")
    need_counts = counts or avgs
    sum_cols = set(sums) | set(avgs)

    phase1_aggs = (
        [F.sum(c).alias(f"__s_{c}") for c in sum_cols]
        + ([F.count(F.lit(1)).alias("__n")] if need_counts else [])
        + [F.min(c).alias(f"__mn_{c}") for c in mins]
        + [F.max(c).alias(f"__mx_{c}") for c in maxs]
    )
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)

    phase2_aggs = (
        [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sums]
        + ([F.sum("__n").alias("n_rows")] if counts else [])
        + [F.min(f"__mn_{c}").alias(f"min_{c}") for c in mins]
        + [F.max(f"__mx_{c}").alias(f"max_{c}") for c in maxs]
        + [
            (F.sum(f"__s_{c}") / F.sum("__n")).alias(f"avg_{c}")
            for c in avgs
        ]
    )
    return partial.groupBy(*keys).agg(*phase2_aggs)
