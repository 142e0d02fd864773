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
