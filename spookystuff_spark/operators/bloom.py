"""Bloom-filter incremental dedup: filter a new batch against an existing
(huge) reference corpus without shuffling the corpus.

The 100 TB shape this solves: a training-data pipeline ingests a new crawl
batch (GBs) and must drop documents already present in the accumulated corpus
(TBs–PBs). A plain anti-join shuffles the corpus fingerprint set every
ingest. Instead:

  1. one narrow pass over the corpus builds a Bloom filter of content
     fingerprints per partition (numpy bitset), OR-merged with
     ``treeReduce`` (log-depth, driver receives ONE bitset, not one per
     partition — the same treeAggregate idiom the reference uses for its
     indexed-join key map, ``utils/locality/IndexingLocalityImpl.scala:13-97``);
  2. the broadcast bitset marks each batch row might-dup / definitely-new in
     one Arrow stage — Bloom has NO false negatives, so the definitely-new
     verdicts are exact and need no further I/O;
  3. only the might-dup slice (FP-rate-bounded, tiny) is verified exactly:
     its fingerprints broadcast into a semi-join against the corpus — the
     corpus is scanned once more but never shuffled or collected.

The final output is therefore EXACT (oracle: batch WHERE fp NOT IN corpus);
the Bloom filter only routes rows off the expensive path, never decides.

This is one of two RDD usages in the package (per-partition bitset +
treeReduce is genuinely imperative per-partition logic); everything else
stays DataFrame-native.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m bits, k hashes. m rounded up to a byte."""
    n = max(expected_items, 1)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = (m + 7) & ~7
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _probe_positions(fp: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(fp), k) probe positions via Kirsch–Mitzenmacher double hashing
    over the 64-bit fingerprint: pos_i = (h1 + i*h2) mod m."""
    u = fp.astype(np.int64).view(np.uint64)
    h1 = u % np.uint64(m)
    h2 = (u >> np.uint64(33)) | np.uint64(1)  # odd → full-period stride
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m)


def build_bloom(df: DataFrame, fp_col: str, expected_items: int, fpp: float = 0.01):
    """One pass over ``df``: per-partition numpy bitsets OR-merged with
    ``treeReduce``. Returns ``(bitset_bytes, m, k)``. ``fp_col`` must be a
    64-bit integer fingerprint column (e.g. ``xxhash64(text)``)."""
    m, k = _params(expected_items, fpp)

    def per_partition(rows):
        bits = np.zeros(m >> 3, dtype=np.uint8)
        fps = np.fromiter((r[0] for r in rows), dtype=np.int64)
        if len(fps):
            pos = _probe_positions(fps, m, k).ravel()
            np.bitwise_or.at(bits, pos >> np.uint64(3), 1 << (pos & np.uint64(7)).astype(np.uint8))
        return [bits]

    merged = (
        df.select(fp_col)
        .rdd.mapPartitions(per_partition)
        .treeReduce(np.bitwise_or, depth=2)
    )
    return merged.tobytes(), m, k


def might_contain(spark, bitset: bytes, m: int, k: int, fp: Column) -> Column:
    """Vectorized membership probe against the broadcast bitset — one Arrow
    stage, no shuffle. True ⇒ maybe present; False ⇒ DEFINITELY absent."""
    bc = spark.sparkContext.broadcast(bitset)

    @F.pandas_udf("boolean")
    def probe(s: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        fps = s.to_numpy(dtype=np.int64)
        if not len(fps):
            return pd.Series([], dtype=bool)
        pos = _probe_positions(fps, m, k)
        got = bits[(pos >> np.uint64(3)).ravel()] & (
            1 << (pos & np.uint64(7)).astype(np.uint8).ravel()
        )
        return pd.Series(got.reshape(pos.shape).all(axis=1) != 0)

    return probe(fp)


def bloom_new_rows(
    corpus: DataFrame,
    batch: DataFrame,
    fp_expr: Column,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """EXACT new-rows-in-batch: rows of ``batch`` whose fingerprint
    (``fp_expr`` evaluated on each side) does not occur anywhere in
    ``corpus``. Bloom routes ~all genuinely-new rows past the verify join;
    only the FP-bounded candidate slice touches the corpus again, as a
    broadcast semi-join (corpus never shuffles).

    ``expected_items`` defaults to a fast upper bound via ``corpus.count()``
    when unset — pass the known corpus cardinality in production to skip
    that job."""
    spark = corpus.sparkSession
    corpus_fp = corpus.select(F.xxhash64(fp_expr).alias("__fp"))
    if expected_items is None:
        expected_items = corpus_fp.count()
    bitset, m, k = build_bloom(corpus_fp, "__fp", expected_items, fpp)

    tagged = batch.withColumn("__fp", F.xxhash64(fp_expr)).withColumn(
        "__might", might_contain(spark, bitset, m, k, F.col("__fp"))
    )
    definite_new = tagged.filter(~F.col("__might"))
    candidates = tagged.filter(F.col("__might"))
    # exact verify of the (small) candidate slice: which fps truly exist?
    cand_fps = candidates.select("__fp").distinct()
    confirmed = corpus_fp.join(F.broadcast(cand_fps), "__fp", "left_semi").distinct()
    survivors = candidates.join(F.broadcast(confirmed), "__fp", "left_anti")
    return definite_new.unionByName(survivors).drop("__fp", "__might")
