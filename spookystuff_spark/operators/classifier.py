"""Distributed, bit-reproducible logistic-regression text classifier — the
model-based quality/language filter of a training-data pipeline (fastText-style
linear classifier over hashed bag-of-words features), built Spark-first:

  * Featurization is ONE Arrow stage (hashed sparse BoW: md5-based feature
    hashing so an independent numpy replica reproduces it bit-for-bit),
    materialized once via ``localCheckpoint`` and reused by every training
    iteration and the scoring pass — the corpus is scanned once, not
    once-per-iteration. At 100 TB the features frame is what you'd persist
    to DFS; its width is bounded (≤ tokens-per-doc sparse entries).
  * Training is ridge-IRLS (Newton): each iteration is ONE narrow
    ``mapInPandas`` pass emitting the per-partition exact gradient AND
    Hessian with per-doc contributions QUANTIZED to int64
    (``rint(x * 2^28)``) + one ``groupBy(cell).sum`` bounded by the feature
    co-occurrence pattern. Integer addition is associative-commutative, so
    the aggregated (g, H) — and therefore the trained weights — are
    IDENTICAL under any partitioning / executor count (the same trick as
    operators/kmeans.py's int64-quantized means), and Newton needs ~5
    passes where gradient descent needs 40+ on rare-feature signals.
  * The driver holds only the (D, D) system and the weight vector — no
    per-doc data ever reaches the driver.

Determinism contract (verified by the golden replica in tools/gen_goldens.py
and the repartition-invariance test): per-doc math is elementwise float64 over
feature arrays sorted by feature index, so engine and replica sum in the same
order; cross-doc reduction is exact int64.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

QUANT = 1 << 28  # gradient quantization: exact int64 sums, ~1e-8 resolution


def _hash_token(tok: str, n_features: int) -> int:
    """First 8 md5 hex digits mod n_features — portable to any replica."""
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % n_features


def featurize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    n_features: int = 1024,
    binary: bool = True,
) -> DataFrame:
    """→ (id, y, idxs array<int>, vals array<double>): hashed BoW, feature
    indices sorted ascending (fixes the intra-doc summation order for
    bit-reproducibility). ``binary`` (default) emits presence indicators —
    the fastText-style bag; ``binary=False`` emits token frequencies
    normalized by doc length."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("y", DoubleType()),
            StructField("idxs", ArrayType(IntegerType())),
            StructField("vals", ArrayType(DoubleType())),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, ys, idxs_col, vals_col = [], [], [], []
            for rid, text, y in zip(pdf[id_col], pdf[text_col], pdf[label_col]):
                toks = (text or "").lower().split()
                counts: dict[int, int] = {}
                for t in toks:
                    j = _hash_token(t, n_features)
                    counts[j] = counts.get(j, 0) + 1
                total = max(len(toks), 1)
                items = sorted(counts.items())
                ids.append(rid)
                ys.append(float(y))
                idxs_col.append([j for j, _ in items])
                vals_col.append(
                    [1.0 for _ in items] if binary
                    else [c / total for _, c in items]
                )
            yield pd.DataFrame(
                {"id": ids, "y": ys, "idxs": idxs_col, "vals": vals_col}
            )

    return df.select(id_col, text_col, label_col).mapInPandas(run, out_schema)


def _doc_logits(w: np.ndarray, idxs, vals) -> float:
    # np.dot over index-sorted arrays: same op order as the numpy replica;
    # clipped to ±30 so sigmoid never overflows (replica clips identically)
    z = float(np.dot(w[np.asarray(idxs, dtype=np.int64)],
                     np.asarray(vals, dtype=np.float64)) + w[-1])
    return max(-30.0, min(30.0, z))


def train_logreg(
    features: DataFrame,
    n_features: int = 1024,
    n_iters: int = 5,
    ridge: float = 1.0,
) -> np.ndarray:
    """Ridge-regularized IRLS (Newton) on the checkpointed features frame —
    converges in a handful of iterations regardless of feature conditioning
    (plain GD needs 10x the passes when a rare feature carries the signal).

    Per iteration, ONE Spark job aggregates the exact full-batch gradient
    AND Hessian: per-doc contributions are quantized to int64 (exact,
    order-independent sums — rint per doc, so the result is bit-identical
    under any partitioning or reduce order), accumulated into one dense
    (D² + D) int64 array per partition, and each partition emits its
    NONZERO (index, value) pairs as a SINGLE packed binary blob — no
    (cell, value) row explosion, no shuffle, no groupBy: the driver
    scatter-adds #partitions blobs, each bounded by the partition's feature
    co-occurrence pattern (tiny for short-doc hashed features, ≤ 8·2·(D²+D)
    bytes worst case). The driver solves the D×D ridge system
    (D = n_features+1, bias folded in as the last feature) — O(D³) driver
    work, no per-doc data ever collected.

    Returns weights of length n_features+1 (last = bias)."""
    D = n_features + 1
    w = np.zeros(D, dtype=np.float64)

    blob_schema = StructType([StructField("blob", BinaryType())])

    for _ in range(n_iters):
        w_b = w.copy()

        def blobs(batches: Iterator) -> Iterator:
            import pandas as pd

            gq = np.zeros(D, dtype=np.int64)
            hq = np.zeros((D, D), dtype=np.int64)
            seen = False
            for pdf in batches:
                for y, idxs, vals in zip(pdf["y"], pdf["idxs"], pdf["vals"]):
                    seen = True
                    z = _doc_logits(w_b, idxs, vals)
                    p = 1.0 / (1.0 + math.exp(-z))
                    s = p * (1.0 - p)
                    ix = np.concatenate(
                        [np.asarray(idxs, dtype=np.int64), [D - 1]]
                    )
                    v = np.concatenate(
                        [np.asarray(vals, dtype=np.float64), [1.0]]
                    )
                    gq[ix] += np.rint((p - y) * v * QUANT).astype(np.int64)
                    hq[np.ix_(ix, ix)] += np.rint(
                        s * np.outer(v, v) * QUANT
                    ).astype(np.int64)
            if seen:
                flat = np.concatenate([gq, hq.ravel()])
                nz = np.nonzero(flat)[0]
                yield pd.DataFrame({"blob": [nz.tobytes() + flat[nz].tobytes()]})

        acc = np.zeros(D + D * D, dtype=np.int64)
        for row in features.mapInPandas(blobs, blob_schema).collect():
            buf = row["blob"]
            m = len(buf) // 16
            idx = np.frombuffer(buf[: 8 * m], dtype=np.int64)
            np.add.at(acc, idx, np.frombuffer(buf[8 * m :], dtype=np.int64))
        g = acc[:D].astype(np.float64) / QUANT
        H = acc[D:].reshape(D, D).astype(np.float64) / QUANT
        delta = np.linalg.solve(H + ridge * np.eye(D), -(g + ridge * w))
        w = w + delta
    return w


def score_logreg(
    features: DataFrame, w: np.ndarray, round_to: int = 4
) -> DataFrame:
    """→ (id, prob, pred): sigmoid scores under the trained weights,
    rounded for cross-engine pinning; one narrow Arrow pass."""
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("prob", DoubleType()),
            StructField("pred", LongType()),
        ]
    )
    w_b = w.copy()

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, probs, preds = [], [], []
            for rid, idxs, vals in zip(pdf["id"], pdf["idxs"], pdf["vals"]):
                z = _doc_logits(w_b, idxs, vals)
                p = 1.0 / (1.0 + math.exp(-z))
                pr = round(p + 1e-9, round_to)
                ids.append(rid)
                probs.append(pr)
                preds.append(1 if p >= 0.5 else 0)
            yield pd.DataFrame({"id": ids, "prob": probs, "pred": preds}).astype(
                {"id": "int64", "prob": "float64", "pred": "int64"}
            )

    return features.mapInPandas(run, out_schema)


def fit_score_text_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    label_col,
    n_features: int = 1024,
    n_iters: int = 5,
    ridge: float = 1.0,
) -> tuple[np.ndarray, DataFrame]:
    """End-to-end: featurize once (checkpointed), train with IRLS, score the
    corpus. ``label_col`` may be a Column expression (e.g.
    ``(F.col('lang')=='en')``). Returns (weights, scores DataFrame)."""
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col).alias(text_col),
        label_col.cast("double").alias("__y"),
    )
    from spookystuff_spark.operators.layout import spread_small_input

    # spread BEFORE featurize/checkpoint: every GD iteration inherits the
    # checkpointed layout, so a one-task layout would serialize all of
    # training onto one core
    feats = featurize(spread_small_input(base), id_col, text_col, "__y", n_features)
    # one corpus scan total: every GD iteration + scoring reuses the blocks
    feats = feats.localCheckpoint(eager=True)
    w = train_logreg(feats, n_features, n_iters, ridge)
    return w, score_logreg(feats, w)
