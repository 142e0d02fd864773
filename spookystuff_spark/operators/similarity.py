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

from spookystuff_spark.operators.sampling import canonical_sample
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)


def hyperplane_buckets(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 12,
    seed: int = 42,
    carry_vec: bool = False,
) -> DataFrame:
    """→ (id, bucket): sign-pattern bucket id. Vectorized per Arrow batch.
    ``carry_vec`` additionally emits the (float64) vector — the stage holds
    it anyway, and carrying it saves the caller a shuffle join back to the
    vector table."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    out_fields = [StructField("id", LongType()), StructField("bucket", LongType())]
    if carry_vec:
        out_fields.append(StructField("v", ArrayType(DoubleType())))
    out_schema = StructType(out_fields)
    powers = (1 << np.arange(n_planes)).astype(np.int64)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy())  # (n, dim)
            signs = (mat @ planes) > 0  # (n, n_planes)
            buckets = (signs * powers).sum(axis=1)
            out = pd.DataFrame({"id": pdf[id_col], "bucket": buckets})
            if carry_vec:
                out["v"] = [row for row in mat.astype(np.float64)]
            yield out

    return df.select(id_col, vec_col).mapInPandas(run, out_schema)


def lsh_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_planes: int = 10,
    seed: int = 42,
    probes: int = 0,
    max_bucket: int = 4096,
) -> DataFrame:
    """Approximate per-id top-k cosine neighbors within LSH buckets.

    ``probes``: 0 = single-probe; 1 = also probe every hamming-1 neighbor
    bucket on the query side (recall ↑ at ~n_planes× candidate cost).
    Scoring is one numpy matmul per bucket (applyInPandas) — per-pair SQL
    higher-order functions are interpreted, not codegen'd, and dominate at
    scale. → (qid, vec_id, cos_sim, rn); deterministic (rounded score + id
    tiebreak).

    ``max_bucket`` drops degenerate buckets (near-zero vectors / boilerplate
    sign patterns collapse many rows into one bucket; applyInPandas
    materializes a whole group in executor memory, so one hot bucket at 100×
    scale is an OOM — the same skew guard as minhash's ``max_bucket``).
    Dropped buckets are counted with one tiny aggregate (output ≤ 2^n_planes
    rows) and logged; the kept-bucket filter is a broadcast semi-join, so the
    corpus itself is never re-shuffled for the cap.
    """
    # carry_vec: the bucketing stage already holds each vector, so neither
    # the home rows nor the probe explosion need a shuffle join back to the
    # vector table — the only wide op is the bucket groupBy
    buckets = hyperplane_buckets(
        df, id_col, vec_col, dim, n_planes, seed, carry_vec=True
    )
    cand = buckets.withColumn("is_probe", F.lit(False))
    if probes >= 1:
        probe_side = buckets.select(
            "id",
            F.explode(
                F.array(
                    *[
                        F.col("bucket").bitwiseXOR(F.lit(1 << i))
                        for i in range(n_planes)
                    ]
                )
            ).alias("bucket"),
            "v",
        ).withColumn("is_probe", F.lit(True))
        cand = cand.unionByName(probe_side)

    if max_bucket is not None:
        # Count pass on a NARROW (id, bucket) bucketing — no vectors cross
        # Arrow; count partials aggregate map-side so the shuffle is
        # O(partitions × buckets). The oversized subset we collect is bounded
        # by total_rows / max_bucket — degenerate buckets are few by
        # definition, so this is a tiny driver list, not a data collect.
        narrow = hyperplane_buckets(df, id_col, vec_col, dim, n_planes, seed)
        ncand = narrow
        if probes >= 1:
            ncand = narrow.unionByName(
                narrow.select(
                    "id",
                    F.explode(
                        F.array(
                            *[
                                F.col("bucket").bitwiseXOR(F.lit(1 << i))
                                for i in range(n_planes)
                            ]
                        )
                    ).alias("bucket"),
                )
            )
        over = [
            r["bucket"]
            for r in ncand.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .collect()
        ]
        if over:
            import logging

            logging.getLogger(__name__).warning(
                "lsh_topk_pairs: dropping %d bucket(s) over max_bucket=%d",
                len(over),
                max_bucket,
            )
            cand = cand.filter(~F.col("bucket").isin(over))

    out_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("vec_id", LongType()),
            StructField("cos_sim", DoubleType()),
            StructField("rn", IntegerType()),
        ]
    )

    def score_bucket(pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {"qid": [], "vec_id": [], "cos_sim": [], "rn": []}
        ).astype(
            {"qid": "int64", "vec_id": "int64", "cos_sim": "float64", "rn": "int32"}
        )
        real = pdf[~pdf["is_probe"]]
        if len(real) == 0 or len(pdf) < 2:
            return empty
        q_ids = pdf["id"].to_numpy()  # every member (probe or not) queries
        q_mat = np.vstack(pdf["v"].to_numpy())
        # candidates in ascending-id order so a stable argsort on -cos gives
        # the (desc score, asc id) total order directly
        c_ids = real["id"].to_numpy()
        c_order = np.argsort(c_ids, kind="stable")
        c_ids = c_ids[c_order]
        c_mat = np.vstack(real["v"].to_numpy())[c_order]
        qn = np.sqrt((q_mat * q_mat).sum(axis=1))
        cn = np.sqrt((c_mat * c_mat).sum(axis=1))
        qn[qn == 0] = 1.0
        cn[cn == 0] = 1.0
        rows = {"qid": [], "vec_id": [], "cos_sim": [], "rn": []}
        # chunk the query side so the dense cos block never exceeds ~4M cells
        # (≈32 MB) whatever the bucket size — with the max_bucket cap this is
        # belt-and-braces; without it, it keeps the matmul memory bounded.
        # NB: op order (matmul, then /qn, /cn) kept identical to the golden
        # replica so the 4-decimal rounding can't flip.
        chunk = max(1, 4_000_000 // max(1, len(c_ids)))
        for lo in range(0, len(q_ids), chunk):
            hi = min(lo + chunk, len(q_ids))
            cos = np.round(
                (q_mat[lo:hi] @ c_mat.T) / qn[lo:hi, None] / cn[None, :] + 1e-6, 4
            )
            self_mask = q_ids[lo:hi, None] == c_ids[None, :]
            cos[self_mask] = -2.0
            for ii in range(hi - lo):
                i = lo + ii
                kk = min(k, len(c_ids) - int(self_mask[ii].any()))
                if kk <= 0:
                    continue
                top = np.argsort(-cos[ii], kind="stable")[:kk]
                for r, j in enumerate(top, start=1):
                    rows["qid"].append(q_ids[i])
                    rows["vec_id"].append(c_ids[j])
                    rows["cos_sim"].append(float(cos[ii, j]))
                    rows["rn"].append(r)
        return pd.DataFrame(rows) if rows["qid"] else empty

    # Per-bucket numpy top-k. Pairs are UNIQUE by construction — a vector is
    # a candidate only in its single home bucket, and a query appears at most
    # once per bucket (probe buckets differ from home by one bit) — so no
    # dedup pass is ever needed. With single-probe, buckets partition the
    # candidate space and the in-bucket rank IS the global rank: the bucket
    # groupBy is the ONLY shuffle. Multi-probe merges per-bucket partial
    # top-ks with one qid-window pass (same shape as ivf_topk_pairs).
    scored = cand.groupBy("bucket").applyInPandas(score_bucket, out_schema)
    if probes == 0:
        return scored
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.drop("rn")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


# ------------------------------------------------------------------ IVF


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_cells: int | None = 16,
    n_iters: int = 5,
    seed: int = 42,
    sample_cap: int = 10_000,
    nprobe: int = 1,
    carry_vec: bool = False,
) -> tuple[DataFrame, "np.ndarray"]:
    """IVF coarse quantizer: k-means centroids trained on a driver-side sample
    (deterministic: seeded init, fixed iteration count), assignment in one
    vectorized Arrow stage. Returns (assignments(id, cell, is_home), centroids)
    — with ``nprobe > 1`` each id additionally probes its next-nearest cells
    (``is_home=false`` rows), the recall knob for cell-boundary neighbors.

    At 100 TB the training sample stays bounded (``sample_cap``) and the
    assignment pass is embarrassingly parallel; centroids broadcast via the
    UDF closure."""
    # layout-independent sample (smallest-md5(id) membership, id order) —
    # farthest-point init is order-sensitive, so an unsorted limit() sample
    # would give different centroids after a repartition
    sample = canonical_sample(df, id_col, vec_col, sample_cap)
    if n_cells is None:
        n_cells = max(4, min(256, int(len(sample) ** 0.5)))
    def pairwise_d2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        # ||a-b||^2 = |a|^2 + |b|^2 - 2 a·b — BLAS matmul, no (n,k,d) temporaries
        return (
            (a * a).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )

    # deterministic farthest-point init (k-means++ flavor): immune to the
    # split-cluster pathology of random init, no RNG needed
    k_eff = min(n_cells, len(sample))
    centroids = sample[:1].copy()
    d2min = pairwise_d2(sample, centroids).min(axis=1)
    for _ in range(k_eff - 1):
        nxt = sample[d2min.argmax()][None, :]
        centroids = np.vstack([centroids, nxt])
        d2min = np.minimum(d2min, pairwise_d2(sample, nxt)[:, 0])
    for _ in range(n_iters):
        assign = pairwise_d2(sample, centroids).argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    out_fields = [
        StructField("id", LongType()),
        StructField("cell", LongType()),
        StructField("is_home", BooleanType()),
    ]
    if carry_vec:
        # the UDF already holds every vector: emitting it here saves the
        # caller a two-sided shuffle join of assignments back to vectors
        out_fields.append(StructField("v", ArrayType(DoubleType())))
    out_schema = StructType(out_fields)
    p_eff = max(1, min(nprobe, len(centroids)))

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            mat = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            d2 = (
                (mat * mat).sum(axis=1)[:, None]
                + (centroids * centroids).sum(axis=1)[None, :]
                - 2.0 * (mat @ centroids.T)
            )
            if p_eff == 1:
                out = pd.DataFrame(
                    {
                        "id": pdf[id_col],
                        "cell": d2.argmin(axis=1),
                        "is_home": True,
                    }
                )
                if carry_vec:
                    out["v"] = [row for row in mat]
                yield out
                continue
            top = np.argsort(d2, axis=1, kind="stable")[:, :p_eff]
            ids = pdf[id_col].to_numpy()
            out = pd.DataFrame(
                {
                    "id": np.repeat(ids, p_eff),
                    "cell": top.ravel(),
                    "is_home": np.tile(
                        np.arange(p_eff) == 0, len(ids)
                    ),
                }
            )
            if carry_vec:
                rep = np.repeat(np.arange(len(ids)), p_eff)
                out["v"] = [mat[i] for i in rep]
            yield out

    return df.select(id_col, vec_col).mapInPandas(run, out_schema), centroids


def ivf_topk_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    n_cells: int | None = 16,
    seed: int = 42,
    nprobe: int = 1,
) -> DataFrame:
    """IVF-bucketed approximate top-k cosine neighbors: candidates limited to
    the query's nearest ``nprobe`` cells (vectors are CANDIDATES only in their
    home cell — no duplicate candidates), exact re-rank inside with one BLAS
    matmul per cell (a per-pair SQL expression would run the 64-dim dot as an
    interpreted higher-order function millions of times — ~10× slower).
    ``nprobe > 1`` recovers cell-boundary neighbors (recall knob, like LSH's
    ``probes``) at ~nprobe× candidate cost: per-cell partial top-ks are merged
    by one qid-window pass. → (qid, vec_id, cos_sim, rn)."""
    # carry_vec avoids re-joining assignments to vectors by id (a two-sided
    # shuffle); the only wide op is the per-cell groupBy below
    b, _ = ivf_assign(
        df, id_col, vec_col, dim, n_cells=n_cells, seed=seed, nprobe=nprobe,
        carry_vec=True,
    )

    out_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("vec_id", LongType()),
            StructField("cos_sim", DoubleType()),
            StructField("rn", IntegerType()),
        ]
    )

    def rerank(pdf):
        import pandas as pd

        empty = pd.DataFrame(
            {"qid": [], "vec_id": [], "cos_sim": [], "rn": []}
        ).astype(
            {"qid": "int64", "vec_id": "int64", "cos_sim": "float64", "rn": "int32"}
        )
        home = pdf[pdf["is_home"]]
        if len(pdf) < 2 or len(home) == 0:
            return empty
        # candidates = HOME members only (each vector is a candidate in
        # exactly one cell — no duplicate pairs across probes); queries =
        # every member, home or probe
        q_ids = pdf["id"].to_numpy()
        q_order = np.argsort(q_ids)  # deterministic id-ordered tiebreaks
        q_ids = q_ids[q_order]
        q_mat = np.vstack(pdf["v"].to_numpy())[q_order]
        qn = np.sqrt((q_mat * q_mat).sum(axis=1))
        qn[qn == 0] = 1.0
        if len(home) == len(pdf):  # single-probe cell: candidates == queries
            c_ids, c_mat, cn = q_ids, q_mat, qn
        else:
            c_ids = home["id"].to_numpy()
            c_order = np.argsort(c_ids)
            c_ids = c_ids[c_order]
            c_mat = np.vstack(home["v"].to_numpy())[c_order]
            cn = np.sqrt((c_mat * c_mat).sum(axis=1))
            cn[cn == 0] = 1.0
        rows = {"qid": [], "vec_id": [], "cos_sim": [], "rn": []}
        # query-side chunking bounds the dense cos block at ~4M cells (≈32 MB)
        # even for a degenerate cell holding the whole corpus — same guard as
        # lsh_topk_pairs; op order kept identical to the golden replica
        chunk = max(1, 4_000_000 // max(1, len(c_ids)))
        for lo in range(0, len(q_ids), chunk):
            hi = min(lo + chunk, len(q_ids))
            cos = np.round(
                (q_mat[lo:hi] @ c_mat.T) / qn[lo:hi, None] / cn[None, :] + 1e-6, 4
            )
            self_mask = q_ids[lo:hi, None] == c_ids[None, :]
            cos[self_mask] = -2.0
            for ii in range(hi - lo):
                i = lo + ii
                kk = min(k, len(c_ids) - int(self_mask[ii].any()))
                if kk <= 0:
                    continue
                # sort by (-cos, id): ids ascending so stable argsort suffices
                top = np.argsort(-cos[ii], kind="stable")[:kk]
                for r, j in enumerate(top, start=1):
                    rows["qid"].append(q_ids[i])
                    rows["vec_id"].append(c_ids[j])
                    rows["cos_sim"].append(float(cos[ii, j]))
                    rows["rn"].append(r)
        return pd.DataFrame(rows) if rows["qid"] else empty

    scored = b.groupBy("cell").applyInPandas(rerank, out_schema)
    if nprobe <= 1:
        return scored  # cells partition ids — in-cell rank IS the global rank
    # merge per-cell partial top-ks; pairs are unique by construction (a
    # candidate appears only in its home cell), so no dedup pass needed
    w = Window.partitionBy("qid").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.drop("rn")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )
