"""Distributed Lloyd's k-means over an embedding column.

Unbounds the driver-sample centroid training used by IVF ANN
(operators/similarity.py trains on a bounded sample): here every point
participates in every update, yet the result is bit-reproducible across any
partitioning / executor count — the property that makes a golden oracle (and
a resumable 100 TB run) possible:

* Vector contributions are **quantized to int64** (``floor(v·1e6 + 0.5)``).
  Integer sums are associative/commutative with NO float drift, so the
  per-cluster mean is identical whatever order partitions combine — the
  float-sum nondeterminism that plagues distributed k-means is gone by
  construction (exactness beats ε-tolerance: the same trick TPC-DS engines
  use for DECIMAL aggregates).
* Per-batch partial sums ride out of the Arrow stage pre-aggregated as
  (cluster, dim, qsum, cnt) — map-side combine keeps the shuffle at
  O(k·d·batches), independent of row count.
* Seeding is the k points with the smallest md5(vec_id) — deterministic,
  scan-free (a top-k, not a sample).
* Centroids are O(k·d) driver state (the standard, scale-correct place for
  them); everything per-row stays in executors.

The independent numpy replica in tools/gen_goldens.py repeats the identical
integer math, pinning ``q_kmeans_assign`` in the correctness gate.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

QUANT = 1_000_000  # 1e-6 quantization of input floats


def _quantized(vec_col: str):
    # float32 -> double -> half-up integer quantization (floor(x*q + 0.5):
    # portable, unlike banker's rounding)
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * QUANT + F.lit(0.5)).cast("long"),
    )


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """k points with smallest md5(id) — deterministic pseudo-random seed."""
    rows = (
        emb.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            _quantized(vec_col).alias("qv"),
        )
        .orderBy("h")
        .limit(k)
        .collect()
    )
    return np.array([r["qv"] for r in rows], dtype=np.float64) / QUANT


def _assign_chunked(x: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(assignments, min-dist²) via the exact diff-form distance, chunked so
    the (chunk, k, d) temporary stays ≤ ~4M cells whatever k·d is — the
    full-batch form is an executor OOM at large k·d (e.g. 10k-row Arrow
    batch × 256 cells × 768 dims = 15 GB). Chunking preserves bit-identical
    float ops, so goldens trained on the unchunked form are unchanged."""
    n = x.shape[0]
    chunk = max(1, 4_000_000 // max(1, c.shape[0] * c.shape[1]))
    cl = np.empty(n, dtype=np.int64)
    dmin = np.empty(n, dtype=np.float64)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d2 = ((x[lo:hi, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        cl[lo:hi] = d2.argmin(axis=1)
        dmin[lo:hi] = d2[np.arange(hi - lo), cl[lo:hi]]
    return cl, dmin


def _assign_iter(centroids: np.ndarray, emit_partials: bool):
    c = centroids  # (k, d) float64, broadcast via closure

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf["qv"].to_numpy()).astype(np.float64) / QUANT
            cl, dmin = _assign_chunked(x, c)
            if emit_partials:
                q = np.stack(pdf["qv"].to_numpy()).astype(np.int64)  # (n, d)
                out = []
                for j in np.unique(cl):
                    sel = q[cl == j]
                    out.append(
                        pd.DataFrame(
                            {
                                "cluster": np.int32(j),
                                "dim": np.arange(q.shape[1], dtype=np.int32),
                                "qsum": sel.sum(axis=0, dtype=np.int64),
                                "cnt": np.int64(sel.shape[0]),
                            }
                        )
                    )
                yield pd.concat(out, ignore_index=True)
            else:
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"],
                        "cluster": cl.astype(np.int32),
                        "dist2": dmin,
                    }
                )

    return fn


def kmeans_assign(
    emb: DataFrame,
    k: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd's for ``n_iter`` fixed rounds; returns (vec_id, cluster, dist2).

    Each round: one Arrow stage emitting pre-aggregated (cluster, dim) partial
    sums + one k·d-sized groupBy — the collect is O(k·d), never O(rows).
    """
    src = emb.select(
        F.col(id_col).alias("vec_id"), _quantized(vec_col).alias("qv")
    )
    src = src.localCheckpoint(eager=False)  # reused n_iter+1 times
    centroids = seed_centroids(emb, k, id_col, vec_col)
    # fewer rows than k: degrade to the centroids we actually got, so the
    # update arrays below stay shape-consistent with the assignment ids
    k = centroids.shape[0]
    d = centroids.shape[1]
    for _ in range(n_iter):
        partials = src.mapInPandas(
            _assign_iter(centroids, emit_partials=True),
            "cluster int, dim int, qsum long, cnt long",
        )
        sums = (
            partials.groupBy("cluster", "dim")
            .agg(F.sum("qsum").alias("qsum"), F.sum("cnt").alias("cnt"))
            .collect()
        )
        new_c = centroids.copy()
        agg = np.zeros((k, d), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for r in sums:
            agg[r["cluster"], r["dim"]] = r["qsum"]
            if r["dim"] == 0:
                cnt[r["cluster"]] = r["cnt"]
        nonempty = cnt > 0
        new_c[nonempty] = agg[nonempty] / (cnt[nonempty, None] * QUANT)
        centroids = new_c
    return src.mapInPandas(
        _assign_iter(centroids, emit_partials=False),
        "vec_id long, cluster int, dist2 double",
    ).select(
        "vec_id",
        "cluster",
        F.round(F.col("dist2") + F.lit(1e-6), 6).alias("dist2"),
    )
