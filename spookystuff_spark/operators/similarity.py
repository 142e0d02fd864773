"""Similarity search over embedding columns — scale path beyond the
brute-force baseline in queries/similarity.py.

Random-hyperplane LSH: bucket = sign-bit signature of the embedding against a
seed-fixed projection matrix. Candidates = same bucket (multi-probe: optionally
neighbors at hamming 1); exact cosine re-rank inside buckets. At 100 TB the
bucket groupBy is the only shuffle and candidate sets shrink by ~2^n_planes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import LongType, StructField, StructType


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """→ (id, bucket): sign-pattern bucket id. Vectorized per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    out_schema = StructType(
        [StructField("id", LongType()), StructField("bucket", LongType())]
    )
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())  # (n, dim)
            signs = (mat @ planes) > 0  # (n, n_planes)
            buckets = (signs * powers).sum(axis=1)
            yield pd.DataFrame({"id": pdf[id_col], "bucket": buckets})

    return df.select(id_col, vec_col).mapInPandas(run, out_schema)


def lsh_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Approximate per-id top-k cosine neighbors within LSH buckets.

    → (qid, vec_id, cos_sim, rn). Exact cosine re-rank, deterministic
    (rounded score + id tiebreak).
    """
    buckets = hyperplane_buckets(df, id_col, vec_col, dim, n_planes, seed)
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    b = buckets.join(vecs, on="id")
    left = b.select(
        "bucket", F.col("id").alias("qid"), F.col("v").alias("qv")
    )
    right = b.select(
        "bucket", F.col("id").alias("vec_id"), F.col("v").alias("ev")
    )

    def dot(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = (
        left.join(right, on="bucket")
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("ev"))
                / F.sqrt(dot(F.col("qv"), F.col("qv")))
                / F.sqrt(dot(F.col("ev"), F.col("ev")))
                + F.lit(1e-6),
                4,
            ).alias("cos_sim"),
        )
        .dropDuplicates(["qid", "vec_id"])
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


# ------------------------------------------------------------------ IVF


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int = 16,
    n_iters: int = 5,
    seed: int = 42,
    sample_cap: int = 10_000,
) -> tuple[DataFrame, "np.ndarray"]:
    """IVF coarse quantizer: k-means centroids trained on a driver-side sample
    (deterministic: seeded init, fixed iteration count), assignment in one
    vectorized Arrow stage. Returns (assignments(id, cell), centroids).

    At 100 TB the training sample stays bounded (``sample_cap``) and the
    assignment pass is embarrassingly parallel; centroids broadcast via the
    UDF closure."""
    sample = np.vstack(
        [
            np.asarray(r[vec_col], dtype=np.float64)
            for r in df.select(vec_col).limit(sample_cap).collect()
        ]
    )
    # deterministic farthest-point init (k-means++ flavor): immune to the
    # split-cluster pathology of random init, no RNG needed
    k_eff = min(n_cells, len(sample))
    centroids = sample[:1].copy()
    for _ in range(k_eff - 1):
        d2min = (
            ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2).min(axis=1)
        )
        centroids = np.vstack([centroids, sample[d2min.argmax()]])
    for _ in range(n_iters):
        d2 = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    out_schema = StructType(
        [StructField("id", LongType()), StructField("cell", LongType())]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame({"id": pdf[id_col], "cell": d2.argmin(axis=1)})

    return df.select(id_col, vec_col).mapInPandas(run, out_schema), centroids


def ivf_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_cells: int = 16,
    seed: int = 42,
) -> DataFrame:
    """IVF-bucketed approximate top-k cosine neighbors (single-probe):
    candidates limited to the query's own cell, exact re-rank inside.
    → (qid, vec_id, cos_sim, rn)."""
    assignments, _ = ivf_assign(df, id_col, vec_col, dim, n_cells=n_cells, seed=seed)
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    b = assignments.join(vecs, on="id")
    left = b.select("cell", F.col("id").alias("qid"), F.col("v").alias("qv"))
    right = b.select("cell", F.col("id").alias("vec_id"), F.col("v").alias("ev"))

    def dot(a, c):
        return F.aggregate(
            F.zip_with(a, c, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    scored = (
        left.join(right, on="cell")
        .filter(F.col("qid") != F.col("vec_id"))
        .select(
            "qid",
            "vec_id",
            F.round(
                dot(F.col("qv"), F.col("ev"))
                / F.sqrt(dot(F.col("qv"), F.col("qv")))
                / F.sqrt(dot(F.col("ev"), F.col("ev")))
                + F.lit(1e-6),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
