"""Product quantization (PQ) for embedding compression + ADC top-k search
(Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011).

The 100 TB story: a float32 d=64 embedding is 256 bytes; its PQ code with
m=8 subspaces × 16 centroids is 8 bytes — a 32× footprint cut that turns a
cluster-sized ANN corpus into something a fraction of the executors can hold,
while queries scan codes with table lookups instead of float math.

Scale split mirrors IVF (operators/similarity.py):
* codebooks train on a bounded deterministic driver sample — per-subspace
  k-means with farthest-point init and fixed iterations, no RNG;
* encoding is embarrassingly parallel — one Arrow stage, codebooks ship in
  the closure, output is an m-byte code column;
* ADC search precomputes each query's (m × k) distance table driver-side and
  scans codes with numpy gathers — O(m) adds per candidate, no float dot
  products, exact re-rank optional on the shortlist.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _pairwise_d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (
        (a * a).sum(axis=1)[:, None]
        + (b * b).sum(axis=1)[None, :]
        - 2.0 * (a @ b.T)
    )


def _kmeans_fp(sample: np.ndarray, k: int, n_iters: int = 10) -> np.ndarray:
    """Deterministic farthest-point-init Lloyd's (same recipe as IVF)."""
    k = min(k, len(sample))
    centroids = sample[:1].copy()
    d2min = _pairwise_d2(sample, centroids).min(axis=1)
    for _ in range(k - 1):
        nxt = sample[d2min.argmax()][None, :]
        centroids = np.vstack([centroids, nxt])
        d2min = np.minimum(d2min, _pairwise_d2(sample, nxt)[:, 0])
    for _ in range(n_iters):
        assign = _pairwise_d2(sample, centroids).argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def _canonical_sample(
    df: DataFrame, id_col: str, vec_col: str, sample_cap: int
) -> np.ndarray:
    """Bounded training sample, fully layout-independent (membership by
    smallest-md5(id) top-k, order by id) — see operators/sampling.py."""
    from spookystuff_spark.operators.sampling import canonical_sample

    return canonical_sample(df, id_col, vec_col, sample_cap)


def train_codebooks(
    df: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample_cap: int = 10_000,
    n_iters: int = 10,
    id_col: str = "vec_id",
) -> np.ndarray:
    """(m, k, d/m) codebooks from a bounded deterministic sample."""
    sample = _canonical_sample(df, id_col, vec_col, sample_cap)
    d = sample.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack(
        [
            _kmeans_fp(np.ascontiguousarray(sample[:, j * sub : (j + 1) * sub]), k, n_iters)
            for j in range(m)
        ]
    )


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one Arrow stage, m bytes of payload per row."""
    m, _, sub = codebooks.shape

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = _pairwise_d2(
                    np.ascontiguousarray(x[:, j * sub : (j + 1) * sub]),
                    codebooks[j],
                ).argmin(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf[id_col], "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        fn, "vec_id long, codes array<int>"
    )


def pq_topk(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k: (query_id, rank, vec_id, adc_d2). Distances are
    sums of per-subspace table lookups (the PQ approximation); determinism
    via (rounded distance, vec_id) total order."""
    m, kcent, sub = codebooks.shape
    q_ids = [int(q) for q, _ in queries]
    q_vecs = np.vstack([np.asarray(v, dtype=np.float64) for _, v in queries])
    # (nq, m, k) lookup tables
    tables = np.stack(
        [
            np.stack(
                [
                    _pairwise_d2(
                        np.ascontiguousarray(q_vecs[:, j * sub : (j + 1) * sub]),
                        codebooks[j],
                    )[i]
                    for j in range(m)
                ]
            )
            for i in range(len(q_vecs))
        ]
    )
    codes = pq_encode(df, codebooks, id_col, vec_col)

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.vstack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            out_frames = []
            for qi, qid in enumerate(q_ids):
                # gather: d2[n] = sum_j tables[qi, j, c[:, j]]
                d2 = np.zeros(len(c))
                for j in range(m):
                    d2 += tables[qi, j][c[:, j]]
                out_frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int32(qid),
                            "vec_id": pdf["vec_id"],
                            "adc_d2": np.round(d2 + 1e-6, 6),
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    scored = codes.mapInPandas(score, "query_id int, vec_id long, adc_d2 double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_d2")
    )


def ivfpq_topk(
    df: DataFrame,
    queries: Sequence[tuple[int, Sequence[float]]],
    n_cells: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_cent: int = 16,
    k: int = 5,
    sample_cap: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF + residual PQ — the FAISS IVFPQ architecture, Spark-first:

    * coarse quantizer: farthest-point k-means cells on a bounded sample;
    * PQ codebooks trained on RESIDUALS (x − cell centroid) — residuals are
      near-zero-mean so the same code budget quantizes much finer than raw
      vectors;
    * index pass (one Arrow stage): every vector → (cell, m-byte code);
    * search: each query probes its ``nprobe`` nearest cells — the scan
      touches ~nprobe/n_cells of the corpus — and ADC-scans residual codes
      with a per-(query, cell) lookup table; candidates merge by exact ADC
      distance with (distance, id) total order.

    At 100 TB: the corpus can be written bucketed by cell so a probe reads
    only its buckets; codes are 32× smaller than raw float32; every stage is
    embarrassingly parallel after the one bounded-sample training step.
    """
    sample = _canonical_sample(df, id_col, vec_col, sample_cap)
    d = sample.shape[1]
    sub = d // m
    coarse = _kmeans_fp(sample, n_cells)
    cell_of = _pairwise_d2(sample, coarse).argmin(axis=1)
    resid = sample - coarse[cell_of]
    books = np.stack(
        [
            _kmeans_fp(np.ascontiguousarray(resid[:, j * sub : (j + 1) * sub]), k_cent)
            for j in range(m)
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            x = np.vstack([np.asarray(v, dtype=np.float64) for v in b[vec_col]])
            cell = _pairwise_d2(x, coarse).argmin(axis=1)
            r = x - coarse[cell]
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                codes[:, j] = _pairwise_d2(
                    np.ascontiguousarray(r[:, j * sub : (j + 1) * sub]), books[j]
                ).argmin(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": b[id_col],
                    "cell": cell.astype(np.int32),
                    "codes": list(codes),
                }
            )

    index = df.select(id_col, vec_col).mapInPandas(
        encode, "vec_id long, cell int, codes array<int>"
    )

    q_ids = [int(q) for q, _ in queries]
    q_vecs = np.vstack([np.asarray(v, dtype=np.float64) for _, v in queries])
    q_cells = np.argsort(_pairwise_d2(q_vecs, coarse), axis=1)[:, :nprobe]
    # per (query, probed cell): residual lookup tables (m, k_cent)
    probe_tables = {}
    for qi in range(len(q_vecs)):
        for c in q_cells[qi]:
            qr = q_vecs[qi] - coarse[c]
            probe_tables[(qi, int(c))] = np.stack(
                [
                    _pairwise_d2(qr[None, j * sub : (j + 1) * sub], books[j])[0]
                    for j in range(m)
                ]
            )

    probed_cells = sorted({int(c) for qi in range(len(q_vecs)) for c in q_cells[qi]})

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if len(b) == 0:
                continue
            cells = b["cell"].to_numpy()
            codes = np.vstack(b["codes"].to_numpy()).astype(np.int64)
            ids = b["vec_id"].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                for c in q_cells[qi]:
                    mask = cells == c
                    if not mask.any():
                        continue
                    tab = probe_tables[(qi, int(c))]
                    cc = codes[mask]
                    d2 = np.zeros(mask.sum())
                    for j in range(m):
                        d2 += tab[j][cc[:, j]]
                    frames.append(
                        pd.DataFrame(
                            {
                                "query_id": np.int32(qid),
                                "vec_id": ids[mask],
                                "adc_d2": np.round(d2 + 1e-6, 6),
                            }
                        )
                    )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    scored = (
        index.where(F.col("cell").isin(probed_cells))
        .mapInPandas(score, "query_id int, vec_id long, adc_d2 double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "adc_d2")
    )
