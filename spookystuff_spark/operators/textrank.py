"""TextRank keyword extraction (Mihalcea & Tarau, EMNLP 2004): PageRank over
the corpus token co-occurrence graph, as distributed joins — the graph state
never leaves the cluster.

Graph: an undirected edge per adjacent token pair (weight = corpus-wide
co-occurrence count). Rank update per iteration:

    r'(v) = (1 - d) + d * sum_{u ~ v} (w_uv / out_w(u)) * r(u)

Scale shape: nodes/edges are bounded by the VOCABULARY (distinct tokens and
distinct adjacent pairs), not corpus size — the corpus is touched once to
build edge counts (one map-side-combined groupBy); each iteration is then a
ranks-joins-edges shuffle on the vocab-sized graph. No driver-side state at
all (contrast operators/kmeans.py, which collects k centroids): ranks stay a
DataFrame, so vocabularies of billions of nodes hold.

Bit-reproducibility across partition layouts: per-edge contributions are
deterministic scalar IEEE ops, and the only order-sensitive step — summing
contributions per node — is done on floor-quantized int64 values in exact
decimal arithmetic (the kmeans/classifier quantization idiom), so every
iteration's ranks are identical under any repartition, and an independent
numpy replica (tools/gen_goldens.py) reproduces them exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spookystuff_spark.functions.rounding import round_stable

QUANT = float(1 << 40)  # contribution quantization scale


def token_edges(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Undirected co-occurrence edges from adjacent lowercase tokens:
    (src, dst, w) with both directions present and self-loops dropped.
    One corpus pass; the groupBy is map-side combined and its key space is
    the distinct-bigram vocabulary."""
    toks = docs.select(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(r"(\S+)"), 1
        ).alias("t")
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(slice(t, 1, size(t) - 1), (x, i) -> struct(x AS a, t[i + 1] AS b))")
        ).alias("p")
    ).select("p.a", "p.b").filter(F.col("a") != F.col("b"))
    directed = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w"))
    sym = directed.union(directed.select(F.col("b"), F.col("a"), F.col("w")))
    return sym.groupBy(F.col("a").alias("src"), F.col("b").alias("dst")).agg(
        F.sum("w").alias("w")
    )


def textrank(
    docs: DataFrame,
    text_col: str = "text",
    n_iter: int = 10,
    damping: float = 0.85,
    top_k: int = 20,
    ckpt_every: int = 4,
) -> DataFrame:
    """Top-k corpus keywords by TextRank score. Returns
    (tok, rank, rank_pos) with rank rounded via round_stable and ties broken
    by token. Ranks start at 1.0 (the TextRank convention)."""
    edges = token_edges(docs, text_col).localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # w/out_w is iteration-invariant: attach once, checkpoint the join
    norm_edges = edges.join(out_w, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("share")
    ).localCheckpoint(eager=False)
    ranks = out_w.select(F.col("src").alias("tok"), F.lit(1.0).alias("r"))
    for i in range(n_iter):
        contrib = norm_edges.join(
            ranks, norm_edges["src"] == ranks["tok"]
        ).select(
            F.col("dst"),
            # floor-quantize BEFORE the order-sensitive sum; decimal = exact
            F.floor(F.col("share") * F.col("r") * QUANT)
            .cast("decimal(38,0)")
            .alias("qc"),
        )
        ranks = contrib.groupBy(F.col("dst").alias("tok")).agg(
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * (F.sum("qc").cast("double") / F.lit(QUANT))
            ).alias("r")
        )
        # bound the lineage without paying a materialization every round:
        # a checkpoint every few iterations keeps the join tree shallow
        # (linear chains of tiny shuffles re-plan fine) while halving the
        # per-iteration job overhead vs checkpointing each round
        if (i + 1) % ckpt_every == 0 and i + 1 < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    ranked = ranks.orderBy(F.desc("r"), F.asc("tok")).limit(top_k)
    w = Window.orderBy(F.desc("r"), F.asc("tok"))
    return ranked.select(
        "tok",
        round_stable(F.col("r"), 6).alias("rank"),
        F.row_number().over(w).alias("rank_pos"),
    )
