"""Near-duplicate detection at training-pipeline scale.

Exact dedup is a hash-groupBy (queries/text.py). This module adds:

* **MinHash + LSH** — char-shingle → n minhash permutations → band buckets →
  candidate pairs → exact-Jaccard verification. The only shuffle is the
  band-bucket groupBy (uniform key distribution by construction); signatures
  are computed in one narrow Arrow stage with vectorized numpy. Bucket sizes
  are capped (degenerate buckets — boilerplate shingles — are dropped with a
  count, not exploded into O(n²) pairs).
* **SimHash** — 64-bit signature; candidates via 4×16-bit chunk equality
  (guarantees recall for hamming distance ≤ 3), verified by exact hamming.

All hashing is seed-fixed and PYTHONHASHSEED-independent (crc32/blake2b), so
results are deterministic across workers and runs.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from typing import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_MERSENNE = np.uint64((1 << 61) - 1)
_WS = re.compile(r"\s+")


def _normalize(text: str) -> str:
    return _WS.sub(" ", (text or "").lower()).strip()


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    t = _normalize(text)
    if len(t) < k:
        grams = {t} if t else set()
    else:
        grams = {t[i : i + k] for i in range(len(t) - k + 1)}
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter(
            (zlib.crc32(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
        )
    )


def _perm_params(n_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), size=n_hashes, dtype=np.uint64)
    return a, b


def jaccard(text_a: str, text_b: str, k: int = 5) -> float:
    ha, hb = _shingle_hashes(text_a, k), _shingle_hashes(text_b, k)
    if not len(ha) or not len(hb):
        return 0.0
    inter = np.intersect1d(ha, hb, assume_unique=True).size
    return inter / (len(ha) + len(hb) - inter)


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """→ (id, band, band_hash): one row per (doc, band). Narrow stage."""
    rows_per_band = n_hashes // bands
    a, b = _perm_params(n_hashes, seed)
    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("band", IntegerType()),
            StructField("band_hash", LongType()),
        ]
    )
    # small-file inputs land in one partition; spread the CPU-bound signature
    # work across the cluster (at 100 TB the scan is already wide — no-op cost)
    parallelism = df.sparkSession.sparkContext.defaultParallelism

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, band_idx, band_hash = [], [], []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                h = _shingle_hashes(text, shingle_k)
                if not len(h):
                    continue
                # sig[i] = min over shingles of (a_i * h + b_i) mod p
                sig = ((np.outer(a, h) + b[:, None]) % _MERSENNE).min(axis=1)
                banded = sig.reshape(bands, rows_per_band)
                for bi in range(bands):
                    digest = hashlib.blake2b(
                        banded[bi].tobytes(), digest_size=8
                    ).digest()
                    ids.append(rid)
                    band_idx.append(bi)
                    band_hash.append(
                        int.from_bytes(digest, "big", signed=True)
                    )
            yield pd.DataFrame(
                {"id": ids, "band": band_idx, "band_hash": band_hash}
            ) if ids else pd.DataFrame({"id": [], "band": [], "band_hash": []}).astype(
                {"id": "int64", "band": "int32", "band_hash": "int64"}
            )

    sel = df.select(id_col, text_col)
    if sel.rdd.getNumPartitions() < parallelism:
        sel = sel.repartition(parallelism)
    return sel.mapInPandas(run, out_schema)


def minhash_candidate_pairs(
    band_df: DataFrame, max_bucket: int = 64
) -> DataFrame:
    """Bucket-join: pairs sharing ≥1 band. THE shuffle of the pipeline —
    keyed on (band, band_hash), uniformly distributed. Buckets larger than
    ``max_bucket`` (boilerplate collisions) are dropped, not exploded.

    Pair generation is fully JVM-native (collect_list + double explode):
    per-group Python would pay ~ms of Arrow/pandas overhead per bucket, which
    at millions of tiny buckets dominates the whole pipeline."""
    buckets = (
        band_df.groupBy("band", "band_hash")
        .agg(F.collect_set("id").alias("ids"))
        .filter(
            (F.size("ids") >= 2) & (F.size("ids") <= max_bucket)
        )
    )
    return (
        buckets.select(F.explode("ids").alias("id_a"), F.col("ids"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    n_hashes: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Full pipeline → (id_a, id_b, jaccard_sim) verified pairs ≥ threshold."""
    band_df = minhash_bands(df, id_col, text_col, n_hashes, bands, shingle_k, seed)
    cand = minhash_candidate_pairs(band_df)
    texts = df.select(
        F.col(id_col).alias("__tid"), F.col(text_col).alias("__text")
    )
    joined = (
        cand.join(texts, cand.id_a == texts.__tid)
        .withColumnRenamed("__text", "__text_a")
        .drop("__tid")
        .join(texts, cand.id_b == texts.__tid)
        .withColumnRenamed("__text", "__text_b")
        .drop("__tid")
    )
    out_schema = StructType(
        [
            StructField("id_a", LongType()),
            StructField("id_b", LongType()),
            StructField("jaccard_sim", DoubleType()),
        ]
    )

    def verify(batches: Iterator) -> Iterator:
        import pandas as pd

        shingles: dict = {}  # per-task doc→shingle-set cache (pairs share docs)

        def sh(rid, text):
            s = shingles.get(rid)
            if s is None:
                s = _shingle_hashes(text, shingle_k)
                shingles[rid] = s
            return s

        for pdf in batches:
            sims = []
            for ra, ta, rb, tb in zip(
                pdf["id_a"], pdf["__text_a"], pdf["id_b"], pdf["__text_b"]
            ):
                ha, hb = sh(ra, ta), sh(rb, tb)
                if not len(ha) or not len(hb):
                    sims.append(0.0)
                    continue
                inter = np.intersect1d(ha, hb, assume_unique=True).size
                sims.append(round(inter / (len(ha) + len(hb) - inter), 4))
            out = pd.DataFrame(
                {"id_a": pdf["id_a"], "id_b": pdf["id_b"], "jaccard_sim": sims}
            )
            yield out[out["jaccard_sim"] >= threshold]

    parallelism = joined.sparkSession.sparkContext.defaultParallelism
    return joined.repartition(parallelism, "id_a").mapInPandas(verify, out_schema)


# ------------------------------------------------------------------ SimHash


def simhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n_bits: int = 64
) -> DataFrame:
    """→ (id, simhash): 64-bit token-weighted signature. Narrow stage."""
    out_schema = StructType(
        [StructField("id", LongType()), StructField("simhash", LongType())]
    )

    shifts = np.arange(n_bits, dtype=np.uint64)
    one = np.uint64(1)

    def sig_of(text: str) -> int:
        tokens = _normalize(text).split()
        if not tokens:
            return 0
        # one blake2b per DISTINCT token, then a single vectorized
        # (n_distinct, n_bits) reduction weighted by token count — the
        # per-token numpy loop was the hot spot of a full-corpus pass
        counts: dict[str, int] = {}
        for tok in tokens:
            counts[tok] = counts.get(tok, 0) + 1
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                )
                for tok in counts
            ),
            dtype=np.uint64,
            count=len(counts),
        )
        w = np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
        bits = ((h[:, None] >> shifts) & one).astype(np.int64)
        acc = ((2 * bits - 1) * w[:, None]).sum(axis=0)
        out = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        return out - (1 << 64) if out >= (1 << 63) else out

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {"id": pdf[id_col], "simhash": [sig_of(t) for t in pdf[text_col]]}
            )

    sel = df.select(id_col, text_col)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if sel.rdd.getNumPartitions() < parallelism:
        sel = sel.repartition(parallelism)
    return sel.mapInPandas(run, out_schema)


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    n_chunks: int = 4,
) -> DataFrame:
    """Chunk-equality blocking (any identical 16-bit chunk → candidate;
    complete for hamming ≤ n_chunks-1), exact hamming verify → pairs."""
    sigs = simhash_signatures(df, id_col, text_col)
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright("simhash", i * chunk_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk_val"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", "c.chunk_idx", "c.chunk_val")
    left = chunks.select(
        F.col("chunk_idx"),
        F.col("chunk_val"),
        F.col("id").alias("id_a"),
        F.col("simhash").alias("sig_a"),
    )
    right = chunks.select(
        F.col("chunk_idx"),
        F.col("chunk_val"),
        F.col("id").alias("id_b"),
        F.col("simhash").alias("sig_b"),
    )
    pairs = (
        left.join(right, on=["chunk_idx", "chunk_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return pairs.withColumn("hamming", hamming.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")
