"""Deterministic bounded sampling for driver-side trainers.

Any operator that trains on a driver-side sample (IVF coarse quantizer, PQ
codebooks) must be reproducible across partition layouts at any scale:

* **Membership** above the cap must not depend on which rows ``limit()``
  happens to grab: we take the ``sample_cap`` rows with the smallest
  ``md5(id)`` — a TakeOrderedAndProject (per-partition top-k + driver merge),
  no full sort, no layout dependence, deterministic pseudo-random coverage
  (the ``kmeans.seed_centroids`` idiom).
* **Order** matters too — farthest-point init is order-sensitive — so the
  sample is returned sorted by id.

For corpora at or under the cap this degrades to "all rows, id-ordered",
which keeps existing sf0.01 goldens valid.
"""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def canonical_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_cap: int
) -> np.ndarray:
    """(sample_cap, dim) float64 matrix: smallest-md5(id) rows, id-ordered.

    Pulls at most ``sample_cap`` rows to the driver (Arrow path when the
    session enables it); never mutates session conf.
    """
    pdf = (
        df.select(
            F.col(id_col).alias("_sid"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
            F.col(vec_col).alias("_v"),
        )
        .orderBy("_h")
        .limit(sample_cap)
        .toPandas()
        .sort_values("_sid", kind="stable")
    )
    return np.vstack([np.asarray(v, dtype=np.float64) for v in pdf["_v"]])


def weighted_sample_topk(
    df: DataFrame,
    group_cols,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "ws-v1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis & Spirakis 2006,
    exponential-race form): per group, keep the k rows with the smallest
    -ln(u)/w where u is the row's deterministic md5 fraction — inclusion
    probability proportional to weight, membership fully data-keyed (stable
    under repartition, file order, and corpus growth; change ``salt`` for an
    independent redraw).

    Engine portability: ln differs by 1 ulp between libms, so the race key
    is rounded to 9 decimals (epsilon-shifted, the round_stable convention)
    with the id as tie-break — order flips would need two true keys within
    1e-18 of each other AND of a rounding boundary. The DuckDB oracle
    replays membership exactly.

    Scale: one hash + ln per row in the scan stage, one shuffle on the group
    key for the rank window — the same cost class as any per-group top-k.
    Returns (group..., id, rn) with rn in [1, k].
    """
    import pyspark.sql.functions as F2
    from pyspark.sql import Window

    grp = list(group_cols)
    u = (
        F2.conv(
            F2.substring(
                F2.md5(F2.concat(F2.lit(salt + "|"), F2.col(id_col).cast("string"))),
                1,
                12,
            ),
            16,
            10,
        ).cast("double")
        / F2.lit(float(1 << 48))
    )
    key = F2.round(-F2.log(u) / F2.col(weight_col) + F2.lit(1e-12), 9)
    w = Window.partitionBy(*grp).orderBy(key.asc(), F2.col(id_col).asc())
    return (
        df.withColumn("rn", F2.row_number().over(w))
        .filter(F2.col("rn") <= k)
        .select(*grp, id_col, "rn")
    )
