"""Corpus-curation operators for training-data pipelines: semantic
deduplication over embeddings (SemDeDup), deterministic mixture sampling,
PII scrubbing, and canonical-document selection after clustering.

Design for 100 TB:
  * ``semdedup_prune`` — k-means cells bound the pairwise work: the only
    wide ops are the id-join of assignments to vectors and one
    ``applyInPandas`` per cell; within a cell the similarity matrix is one
    BLAS matmul. Scale ``n_cells`` with corpus size (cells of ~1-10k vectors)
    so per-cell O(m²) stays bounded — exactly the SemDeDup recipe (Abbas et
    al. 2023, arXiv:2303.09540).
  * ``mixture_sample`` — stateless per-row hash draw: no shuffle at all, the
    filter runs inside the scan's codegen stage and composes with partition
    pruning. The draw is ``md5``-based and engine-portable, so the exact
    sample is reproducible anywhere (unlike ``rand(seed)``, which is
    partition-layout dependent).
  * ``pii_scrub`` — pure Catalyst ``regexp_count``/``regexp_replace``
    (whole-stage codegen, zero Python). Patterns are kept to the RE2-safe
    subset (no lookarounds) so they behave identically across engines.
  * ``keep_best`` — one window pass over (cluster, score); the cluster
    assignment is whatever dedup stage produced it (minhash+CC, semdedup,
    exact hash), so selection composes with any of them.

Reference parity note: the reference engine has no corpus-curation surface;
these extend the LLM-pipeline operators mandated by the rebuild brief.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# --------------------------------------------------------------- semdedup


def semdedup_prune(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    threshold: float = 0.9,
    n_cells: int | None = 16,
    seed: int = 42,
    sample_cap: int = 10_000,
) -> DataFrame:
    """SemDeDup: cluster the embedding space with the IVF coarse quantizer,
    then inside each cell greedily keep ids in ascending order, dropping any
    vector whose cosine similarity to an already-kept vector reaches
    ``threshold``. Deterministic: seeded k-means (farthest-point init, fixed
    Lloyd iterations) + id-ordered greedy scan.

    Returns one row per input id: (id, cell, keep, dup_of, cos_sim) where
    ``dup_of`` is the kept id that evicted a dropped one (null when kept) and
    ``cos_sim`` the similarity to it."""
    from spookystuff_spark.operators.similarity import ivf_assign

    # carry_vec: the assignment UDF emits each vector alongside its cell, so
    # the only wide op left is the per-cell groupBy — no assignments⋈vectors
    # re-join shuffle
    cells, _ = ivf_assign(
        df, id_col, vec_col, dim,
        n_cells=n_cells, seed=seed, sample_cap=sample_cap, nprobe=1,
        carry_vec=True,
    )

    out_schema = StructType(
        [
            StructField("id", LongType()),
            StructField("cell", LongType()),
            StructField("keep", BooleanType()),
            StructField("dup_of", LongType()),
            StructField("cos_sim", DoubleType()),
        ]
    )

    def prune(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        mat = np.vstack(pdf["v"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        mat = mat / norms[:, None]
        sims = mat @ mat.T
        kept: list[int] = []
        keep = np.ones(len(ids), dtype=bool)
        dup_of = np.full(len(ids), -1, dtype=np.int64)
        cos = np.full(len(ids), np.nan)
        for i in range(len(ids)):
            if kept:
                s = sims[i, kept]
                j = int(np.argmax(s))
                if s[j] >= threshold:
                    keep[i] = False
                    dup_of[i] = ids[kept[j]]
                    cos[i] = float(s[j])
                    continue
            kept.append(i)
        return pd.DataFrame(
            {
                "id": ids,
                "cell": pdf["cell"].to_numpy()[order],
                "keep": keep,
                "dup_of": np.where(keep, None, dup_of),
                "cos_sim": np.where(keep, np.nan, cos),
            }
        )

    return cells.groupBy("cell").applyInPandas(prune, out_schema)


# --------------------------------------------------- deterministic sampling


def hash_unit(col: Column) -> Column:
    """Deterministic U[0,1) draw from a column value: first 8 hex digits of
    ``md5`` as an integer, over 2³². Engine-portable (DuckDB:
    ``CAST('0x'||substr(md5(x),1,8) AS BIGINT)/4294967296.0``) and
    partition-layout independent, unlike ``rand(seed)``."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .cast("double")
        / F.lit(4294967296.0)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strat_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Corpus mixture sampling: keep each row with its stratum's target rate
    (e.g. per-language or per-source mixing weights for a training run),
    decided by a deterministic per-id hash draw. Stateless and shuffle-free —
    the filter runs inside the scan stage, so at 100 TB this is a single
    pruned pass, and re-running it anywhere reproduces the same sample."""
    rate: Column = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(strat_col) == k, F.lit(float(v))).otherwise(rate)
    return df.filter(hash_unit(F.col(id_col)) < rate)


def cap_per_stratum(
    df: DataFrame,
    id_col: str,
    strat_col: str,
    cap: int,
) -> DataFrame:
    """Quota sampling: keep at most ``cap`` rows per stratum (the "at most N
    docs per domain/language" rule of corpus mixing), chosen by the same
    deterministic md5 draw as :func:`mixture_sample` so the selection is a
    uniform, engine-reproducible subset rather than "whatever sorted first".
    One window exchange on the stratum key; ties impossible (the draw is
    tie-broken by id). Complements rate-based sampling: ``mixture_sample``
    fixes the *fraction*, this fixes the *count*."""
    w = Window.partitionBy(strat_col).orderBy(
        hash_unit(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


# ----------------------------------------------------------------- PII scrub

# RE2-safe subset (no lookarounds) so Spark (Java regex) and RE2-based
# engines agree; \b is supported by both.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-doc PII hit counts (emails, IPv4 literals, NANP-style phone
    numbers). Pure codegen — ``regexp_count`` per pattern."""
    return {
        "n_emails": F.regexp_count(text, F.lit(PII_EMAIL)),
        "n_ips": F.regexp_count(text, F.lit(PII_IPV4)),
        "n_phones": F.regexp_count(text, F.lit(PII_PHONE)),
    }


def pii_redact(text: Column) -> Column:
    """Replace every PII hit with a typed placeholder token. Order matters:
    emails first (an email must not first lose an embedded digit run), then
    phones, then bare IPv4s."""
    out = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IPV4, "<IP>")


# ------------------------------------------------------------- keep-best


def keep_best(
    members: DataFrame,
    cluster_col: str,
    id_col: str,
    score_col: str,
) -> DataFrame:
    """Canonical-document selection after any clustering dedup: per cluster
    keep the highest-``score`` member (ties → smallest id — total order, so
    the winner is unique and deterministic). One window pass over
    (cluster, score); no join, no collect.

    Returns (cluster, kept_id, kept_score, n_members)."""
    w = Window.partitionBy(cluster_col).orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_members", F.count(F.lit(1)).over(Window.partitionBy(cluster_col))
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col(cluster_col).alias("cluster"),
            F.col(id_col).alias("kept_id"),
            F.col(score_col).alias("kept_score"),
            "n_members",
        )
    )


# ------------------------------------------------- leakage-safe splitting


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights=None,
    salt: str = "split-v1",
) -> DataFrame:
    """Near-dup-aware train/val/test assignment: a near-duplicate pair that
    straddles the train/test boundary is evaluation leakage, so every member
    of a near-dup cluster must land in ONE split. Assign the deterministic
    hash split (operators/packing.py) to each doc, then override every
    clustered doc with its cluster CANONICAL's split (canonical = min id =
    the component label itself, so no extra canonical-selection pass).

    Plan: components over the (tiny relative to corpus) pair list, one
    broadcast-sized join of cluster labels to their canonical's split, one
    left join back to the corpus — the corpus is never shuffled (its own
    split is a narrow md5 expression). → (id, split, orig_split, moved);
    ``moved`` marks docs whose split changed, for audit.
    """
    from spookystuff_spark.operators.graph import connected_components
    from spookystuff_spark.operators.packing import hash_split

    base = hash_split(docs.select(F.col(id_col)), id_col, weights, salt)
    comps = connected_components(pairs, "id_a", "id_b")
    canon = (
        comps.select(F.col("component")).distinct()
        # the component label IS a doc id (min member) — hash its split the
        # same narrow way rather than joining back to the corpus
    )
    canon_split = hash_split(
        canon.select(F.col("component").alias(id_col)), id_col, weights, salt
    ).select(F.col(id_col).alias("component"), F.col("split").alias("canon_split"))
    override = comps.join(F.broadcast(canon_split), "component").select(
        F.col("node").alias(id_col), "canon_split"
    )
    return (
        base.join(F.broadcast(override), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("canon_split"), F.col("split")).alias("split"),
            F.col("split").alias("orig_split"),
            (
                F.col("canon_split").isNotNull()
                & (F.col("canon_split") != F.col("split"))
            ).alias("moved"),
            F.col("canon_split").isNotNull().alias("clustered"),
        )
    )
