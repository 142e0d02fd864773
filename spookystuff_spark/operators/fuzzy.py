"""Fuzzy (edit-distance) self-join: character q-gram blocking + Levenshtein
verify.

Entity-resolution staple: find record pairs whose string keys are within
edit distance ``max_dist`` without the O(n²) comparison. Same
block-then-verify architecture as the MinHash stack (operators/dedup.py):

  1. **Block**: each string emits one blocking key per distinct q-gram of
     its padded form (``q-1`` sentinel chars on each side). This is the
     standard count-filter bound for edit-distance joins: one edit touches
     at most ``q`` padded q-grams, so strings within distance ``d`` share
     at least ``len + q - 1 - q*d`` of them — ≥ 1 whenever
     ``len > q*(d-1) + 1``. Unlike whole-token blocking (the previous
     design), pairs sharing no complete word — ``hello``/``hallo`` — still
     collide (ADVICE r4).
  2. **Short strings** (``len ≤ q*(d-1)+1``), where q-gram sharing is not
     guaranteed, fall back to length-band keys: a short string emits keys
     for lengths ``len..len+d`` and every string up to ``len ≤ q*(d-1)+1+d``
     emits its own length key, so any (short, other) pair with
     ``|len_a - len_b| ≤ d`` — a prerequisite of distance ≤ d — meets in a
     band. Recall is therefore EXHAUSTIVE (subject only to the cap below).
  3. **Bucket cap**: blocks larger than ``max_block`` are dropped with a
     logged count — a stop-gram ("th", "in") otherwise produces an
     O(block²) pair explosion; identical to the MinHash ``max_bucket``
     policy (dedup.py) and required at any real scale. ``n_dropped = 0``
     ⇒ the result is exhaustive.
  4. **Verify**: candidate pairs (deduped by id) are checked with the
     exact JVM ``levenshtein`` expression — no Python, no approximation
     in the verdict. A cheap length-difference pre-filter (|len a −
     len b| ≤ max_dist, a lower bound on edit distance) runs before the
     O(len²) DP. Precision is always exact regardless of blocking.

Shuffle shape: one explode+groupBy on gram (map-side combined counts for
the cap), one bucket-join for pairs, one distinct — never the corpus
cross join. All expressions are native Catalyst (sequence/transform/
substring/levenshtein) — no Python UDFs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_PAD = "\x01"  # sentinel outside any real (lowercased) alphabet


def edit_distance_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_dist: int = 2,
    max_block: int = 1024,
    q: int = 2,
) -> tuple[DataFrame, int]:
    """→ (pairs, n_dropped_blocks): pairs = (id_a, id_b, dist) with
    id_a < id_b and levenshtein ≤ max_dist; n_dropped_blocks = how many
    oversized blocking keys were skipped (0 ⇒ the result is exhaustive)."""
    if q < 2:
        raise ValueError("q must be >= 2")
    short_len = q * (max_dist - 1) + 1  # below this, grams can't guarantee
    pad = _PAD * (q - 1)
    base = df.select(
        F.col(id_col).alias("__id"), F.col(text_col).alias("__s")
    ).where(F.col("__s").isNotNull())
    grams = F.expr(
        f"transform(sequence(1, length(__s) + {q - 1}),"
        f" i -> substring(concat('{pad}', lower(__s), '{pad}'), i, {q}))"
    )
    # length-band keys (step 2): short strings emit their band, everything
    # close enough to a short string emits its own length key
    len_keys = F.expr(
        f"CASE WHEN length(__s) <= {short_len} THEN "
        f"  transform(sequence(length(__s), length(__s) + {max_dist}),"
        f"            L -> concat('{_PAD}len:', L)) "
        f"WHEN length(__s) <= {short_len + max_dist} THEN "
        f"  array(concat('{_PAD}len:', length(__s))) "
        f"ELSE array() END"
    )
    toks = base.select(
        "__id",
        "__s",
        F.explode(F.array_distinct(F.concat(grams, len_keys))).alias("__tok"),
    )

    sizes = toks.groupBy("__tok").agg(F.count(F.lit(1)).alias("__n"))
    # broadcast the OVERSIZED list (bounded by corpus_grams / max_block —
    # always small), never the whole gram vocabulary
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
