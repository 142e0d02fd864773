"""Distributed, bit-reproducible logistic-regression text classifier — the
model-based quality/language filter of a training-data pipeline (fastText-style
linear classifier over hashed bag-of-words features), built Spark-first:

  * Featurization is ONE Arrow stage (hashed sparse BoW: md5-based feature
    hashing so an independent numpy replica reproduces it bit-for-bit),
    materialized once via ``localCheckpoint`` and reused by every training
    iteration and the scoring pass — the corpus is scanned once, not
    once-per-iteration. At 100 TB the features frame is what you'd persist
    to DFS; its width is bounded (≤ tokens-per-doc sparse entries).
  * Each full-batch gradient-descent iteration is one narrow ``mapInPandas``
    pass emitting per-doc gradient contributions QUANTIZED to int64
    (``round(g * 2^28)``) + one ``groupBy(feature).sum`` whose shuffle is
    ≤ n_features+2 keys. Integer addition is associative-commutative, so the
    trained weights are IDENTICAL under any partitioning / executor count —
    the same trick as operators/kmeans.py's int64-quantized means.
  * The driver holds only the (n_features+1) weight vector and the tiny
    aggregated gradient — no per-doc data ever reaches the driver.

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
    n_iters: int = 40,
    lr: float = 6.0,
) -> np.ndarray:
    """Full-batch gradient descent on the checkpointed features frame.
    Returns weights of length n_features+1 (last = bias). One Spark job per
    iteration; each job's shuffle is ≤ n_features+2 rows after map-side
    partial aggregation."""
    n_docs = features.count()
    w = np.zeros(n_features + 1, dtype=np.float64)

    grad_schema = StructType(
        [StructField("j", IntegerType()), StructField("qg", LongType())]
    )

    for _ in range(n_iters):
        w_b = w.copy()

        def grads(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                acc: dict[int, int] = {}
                for y, idxs, vals in zip(pdf["y"], pdf["idxs"], pdf["vals"]):
                    z = _doc_logits(w_b, idxs, vals)
                    p = 1.0 / (1.0 + math.exp(-z))
                    g = p - y
                    for j, v in zip(idxs, vals):
                        q = int(round(g * v * QUANT))
                        if q:
                            acc[j] = acc.get(j, 0) + q
                    qb = int(round(g * QUANT))
                    if qb:
                        acc[n_features] = acc.get(n_features, 0) + qb
                if acc:
                    yield pd.DataFrame(
                        {"j": list(acc), "qg": list(acc.values())}
                    ).astype({"j": "int32", "qg": "int64"})

        agg = (
            features.mapInPandas(grads, grad_schema)
            .groupBy("j")
            .agg(F.sum("qg").alias("qg"))
            .collect()
        )
        for row in agg:
            w[row["j"]] -= lr * (row["qg"] / QUANT) / n_docs
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
    n_iters: int = 40,
    lr: float = 6.0,
) -> tuple[np.ndarray, DataFrame]:
    """End-to-end: featurize once (checkpointed), train, score the corpus.
    ``label_col`` may be a Column expression (e.g. ``(F.col('lang')=='en')``).
    Returns (weights, scores DataFrame)."""
    base = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(text_col).alias(text_col),
        label_col.cast("double").alias("__y"),
    )
    feats = featurize(base, id_col, text_col, "__y", n_features)
    # one corpus scan total: every GD iteration + scoring reuses the blocks
    feats = feats.localCheckpoint(eager=True)
    w = train_logreg(feats, n_features, n_iters, lr)
    return w, score_logreg(feats, w)
