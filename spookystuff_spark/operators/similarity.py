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
) -> DataFrame:
    """Approximate per-id top-k cosine neighbors within LSH buckets.

    ``probes``: 0 = single-probe; 1 = also probe every hamming-1 neighbor
    bucket on the query side (recall ↑ at ~n_planes× candidate cost).
    Scoring is one numpy matmul per bucket (applyInPandas) — per-pair SQL
    higher-order functions are interpreted, not codegen'd, and dominate at
    scale. → (qid, vec_id, cos_sim, rn); deterministic (rounded score + id
    tiebreak).
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

    out_schema = StructType(
        [
            StructField("qid", LongType()),
            StructField("vec_id", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def score_bucket(pdf):
        import pandas as pd

        real = pdf[~pdf["is_probe"]]
        if len(real) == 0 or len(pdf) < 2:
            return pd.DataFrame({"qid": [], "vec_id": [], "cos_sim": []}).astype(
                {"qid": "int64", "vec_id": "int64", "cos_sim": "float64"}
            )
        q_ids = pdf["id"].to_numpy()  # every member (probe or not) queries
        q_mat = np.vstack(pdf["v"].to_numpy())
        c_ids = real["id"].to_numpy()
        c_mat = np.vstack(real["v"].to_numpy())
        qn = np.sqrt((q_mat * q_mat).sum(axis=1))
        cn = np.sqrt((c_mat * c_mat).sum(axis=1))
        qn[qn == 0] = 1.0
        cn[cn == 0] = 1.0
        cos = np.round((q_mat @ c_mat.T) / qn[:, None] / cn[None, :] + 1e-6, 4)
        qq, cc = np.meshgrid(
            np.arange(len(q_ids)), np.arange(len(c_ids)), indexing="ij"
        )
        mask = q_ids[qq] != c_ids[cc]
        return pd.DataFrame(
            {
                "qid": q_ids[qq][mask],
                "vec_id": c_ids[cc][mask],
                "cos_sim": cos[qq, cc][mask],
            }
        )

    scored = (
        cand.groupBy("bucket")
        .applyInPandas(score_bucket, out_schema)
        .dropDuplicates(["qid", "vec_id"])  # multi-probe re-discoveries
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
    # Arrow-path sample transfer: row-based collect() of wide float arrays is
    # seconds of py4j overhead; toPandas with Arrow is ~ms
    spark = df.sparkSession
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    sample_pdf = df.select(vec_col).limit(sample_cap).toPandas()
    sample = np.vstack(
        [np.asarray(v, dtype=np.float64) for v in sample_pdf[vec_col]]
    )
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
        cos = np.round((q_mat @ c_mat.T) / qn[:, None] / cn[None, :] + 1e-6, 4)
        self_mask = q_ids[:, None] == c_ids[None, :]
        cos[self_mask] = -2.0
        rows = {"qid": [], "vec_id": [], "cos_sim": [], "rn": []}
        for i in range(len(q_ids)):
            kk = min(k, len(c_ids) - int(self_mask[i].any()))
            if kk <= 0:
                continue
            # sort by (-cos, id): ids are ascending so stable argsort on -cos
            top = np.argsort(-cos[i], kind="stable")[:kk]
            for r, j in enumerate(top, start=1):
                rows["qid"].append(q_ids[i])
                rows["vec_id"].append(c_ids[j])
                rows["cos_sim"].append(float(cos[i, j]))
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
