"""Skew mitigation: salted two-phase aggregation and salted joins.

When a groupBy/join key is pathologically hot (one key = 30% of 100 TB), the
single reducer owning it becomes the stage's straggler. Salting splits each
key into ``n_salts`` subkeys for a uniform first phase. AQE's skew-join
handling covers *shuffled* joins adaptively; ``salted_join`` is the static
variant for when AQE can't see the skew (e.g. the skewed side is the output
of a Python stage with no stats) or when the runtime has AQE off.

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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the big (skewed) side gets a deterministic salt
    derived from its full row identity (``xxhash64`` of all columns — no RNG,
    so task retries are stable), the small side is replicated ``n_salts``
    times via a tiny ``explode``; joining on (key, salt) spreads each hot key
    over ``n_salts`` reducers.

    Use when one probe-side key dominates: replication multiplies the small
    side's shuffle volume by ``n_salts``, so this trades a bounded build-side
    blowup for straggler-free probe parallelism. For dimension-sized small
    sides prefer ``broadcast()``; this is for the mid-size build side that
    doesn't fit a broadcast but joins against a skewed fact."""
    if how not in ("inner", "left"):
        # replicated small-side rows would surface as n_salts duplicates on
        # the preserved side of right/full joins
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = b.join(s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
