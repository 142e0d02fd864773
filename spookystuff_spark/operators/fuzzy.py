"""Fuzzy (edit-distance) self-join: token blocking + Levenshtein verify.

Entity-resolution staple: find record pairs whose string keys are within
edit distance ``max_dist`` without the O(n²) comparison. Same
block-then-verify architecture as the MinHash stack (operators/dedup.py):

  1. **Block**: each string emits one blocking key per distinct token
     (classic token blocking — near-identical strings share almost all
     tokens, so they collide in at least one block unless the edit sits
     inside every shared token, which ``max_dist`` makes impossible once
     the strings have > max_dist tokens in common).
  2. **Bucket cap**: blocks larger than ``max_block`` are dropped with a
     logged count — a stop-word token ("inc", "the") otherwise produces
     an O(block²) pair explosion; identical to the MinHash
     ``max_bucket`` policy (dedup.py) and required at any real scale.
  3. **Verify**: candidate pairs (deduped by id) are checked with the
     exact JVM ``levenshtein`` expression — no Python, no approximation
     in the verdict. A cheap length-difference pre-filter (|len a −
     len b| ≤ max_dist, a lower bound on edit distance) runs before the
     O(len²) DP.

Shuffle shape: one explode+groupBy on token (map-side combined counts for
the cap), one bucket-join for pairs, one distinct — never the corpus
cross join. Recall: exhaustive for pairs sharing ≥1 surviving block;
pairs whose every shared token sits in an oversized block are dropped
loudly (returned drop count), the standard blocking trade-off.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

WORD_RE = "([a-z0-9]+)"


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    max_block: int = 1024,
) -> tuple[DataFrame, int]:
    """→ (pairs, n_dropped_blocks): pairs = (id_a, id_b, dist) with
    id_a < id_b and levenshtein ≤ max_dist; n_dropped_blocks = how many
    oversized token blocks were skipped (0 ⇒ the result is exhaustive
    over token-sharing pairs)."""
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    )
    toks = base.select(
        "__id",
        "__s",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.lower("__s"), F.lit(WORD_RE), 1)
            )
        ).alias("__tok"),
    )

    sizes = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__n"))
    # broadcast the OVERSIZED list (bounded by corpus_tokens / max_block —
    # always small), never the whole vocabulary
    hot = sizes.filter(F.col("__n") > max_block).select("__tok")
    n_dropped = hot.count()
    blocked = toks.join(F.broadcast(hot), "__tok", "left_anti")
    a = blocked.select(
        "__tok", F.col("__id").alias("id_a"), F.col("__s").alias("s_a")
    )
    b = blocked.select(
        "__tok", F.col("__id").alias("id_b"), F.col("__s").alias("s_b")
    )
    cand = (
        a.join(b, "__tok")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "s_a", "s_b")
        .distinct()
    )
    pairs = (
        cand.where(
            F.abs(F.length("s_a") - F.length("s_b")) <= max_dist
        )
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .where(F.col("dist") <= max_dist)
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
    return pairs, n_dropped
