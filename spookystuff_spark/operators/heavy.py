"""Heavy-hitter (frequent-item) detection at corpus scale: per-partition
Misra-Gries summaries → candidate union → exact recount of candidates only.

Why not a plain ``groupBy(token).count()`` top-k? On web-scale text the
distinct-token universe (typos, URLs, numbers, code identifiers) is billions
of keys: the aggregation hashmap spills, and the shuffle carries the whole
vocabulary. The two-pass sketch design bounds memory HARD:

  * Pass 1 (narrow, zero shuffle): each partition streams its tokens through a
    Misra-Gries summary with ``n_counters`` slots — O(n_counters) memory
    regardless of vocabulary size. A token with global frequency
    > total_tokens / n_counters is GUARANTEED to survive in at least one
    partition's summary (pigeonhole over the per-partition guarantee), so the
    union of summaries is a superset of every true heavy hitter.
  * Pass 2 (broadcast filter + tiny agg): exact counts for candidate tokens
    only — the ``isin`` filter runs inside the scan stage, and the groupBy
    shuffles at most |candidates| ≤ partitions × n_counters keys.

The final output is therefore EXACT (count and rank) for every token whose
frequency clears the guarantee threshold — the operator degrades loudly, not
silently: it also returns the threshold so callers can assert coverage
(tests pin ``kth_count > total/n_counters``).

No reference-engine counterpart (the reference is a scraping engine, not an
analytics one); this extends the LLM-pipeline surface (tokenizer-vocab
preselection, stopword mining) mandated by the rebuild brief.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.types import LongType, StringType, StructField, StructType

# Tokenizer shared with the rest of the text stack (operators/ngram.py):
# lowercase, split on whitespace — mirrored by DuckDB regexp_extract_all.
_TOKENS = lambda text: F.regexp_extract_all(F.lower(text), F.lit(r"(\S+)"), 1)  # noqa: E731


def _misra_gries_update(counters: dict, token: str, n_counters: int) -> None:
    if token in counters:
        counters[token] += 1
    elif len(counters) < n_counters:
        counters[token] = 1
    else:
        dead = [t for t in counters if counters[t] == 1]
        for t in dead:
            del counters[t]
        for t in counters:
            counters[t] -= 1


def mg_candidates(
    df: DataFrame,
    text_col: str,
    n_counters: int = 1024,
    ngram: int = 1,
) -> DataFrame:
    """Per-partition Misra-Gries pass → (token) candidate rows.

    Runs as ONE ``mapInPandas`` stage whose generator keeps a counter dict
    across Arrow batches (partition-scoped state, never more than
    ``n_counters`` entries); emits each partition's surviving tokens once.
    ``ngram > 1`` mines space-joined token n-grams (e.g. bigram vocab) —
    exactly the case where the distinct universe explodes and exact groupBy
    aggregation stops being viable.
    """
    out_schema = StructType([StructField("tok", StringType())])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        counters: dict[str, int] = {}
        for pdf in batches:
            for text in pdf[text_col]:
                if text is None:
                    continue
                toks = text.lower().split()
                if ngram > 1:
                    toks = [
                        " ".join(toks[i : i + ngram])
                        for i in range(len(toks) - ngram + 1)
                    ]
                for tok in toks:
                    _misra_gries_update(counters, tok, n_counters)
        if counters:
            yield pd.DataFrame({"tok": list(counters)})

    from spookystuff_spark.operators.layout import spread_small_input

    return spread_small_input(df.select(text_col)).mapInPandas(run, out_schema)


def heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 20,
    n_counters: int = 2048,
    ngram: int = 1,
    check_coverage: bool = True,
) -> DataFrame:
    """Exact top-``k`` most frequent tokens (or token ``ngram``-grams) by the
    two-pass sketch-then-verify plan. → (tok, n, rank), ordered.

    Exactness holds while the k-th count exceeds total_grams /
    (n_counters + 1) — the Misra-Gries survivor guarantee. With
    ``check_coverage`` (default) the operator verifies that inequality from
    the exact recount + one tiny count aggregate and RAISES when the sketch
    was too small for the requested k — it degrades loudly, never silently
    (raise ``n_counters`` or lower ``k`` to fix; near-uniform distributions
    have no heavy hitters and need n_counters ≳ distinct-gram count).
    """
    cands = mg_candidates(df, text_col, n_counters, ngram).distinct()
    if ngram > 1:
        toks = _TOKENS(F.col(text_col))
        kk = F.size(toks) - F.lit(ngram - 1)
        grams = F.transform(
            F.sequence(F.lit(1), kk),
            lambda i: F.concat_ws(" ", F.slice(toks, i, ngram)),
        )
        tok = F.explode(
            F.when(kk >= 1, grams).otherwise(F.array().cast("array<string>"))
        ).alias("tok")
    else:
        tok = F.explode(_TOKENS(F.col(text_col))).alias("tok")
    from spookystuff_spark.operators.layout import spread_small_input

    exploded = spread_small_input(df).select(tok)
    # candidate filter is a BROADCAST semi-join (candidates ≤ partitions ×
    # n_counters rows stay a DataFrame — an `isin` literal list of tens of
    # thousands of entries would bloat the plan and stall codegen): the
    # build-side hash probe runs inside the scan stage, and the shuffled agg
    # sees ≤ |cands| keys no matter the corpus vocabulary
    counted = (
        exploded.join(F.broadcast(cands), "tok", "leftsemi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    out = (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("tok", F.col("n").cast("long").alias("n"), "rank")
    )
    if check_coverage:
        # both jobs are tiny: out is ≤ k rows, the total is one codegen agg
        rows = out.collect()
        n_grams = df.select(
            F.sum(
                F.greatest(
                    F.size(_TOKENS(F.col(text_col))) - F.lit(ngram - 1), F.lit(0)
                )
            ).alias("t")
        ).collect()[0]["t"] or 0
        kth = min((r["n"] for r in rows), default=0)
        bound = n_grams / (n_counters + 1)
        if len(rows) < k or kth <= bound:
            raise ValueError(
                f"heavy_hitters: coverage guarantee not met for k={k} "
                f"(kth count {kth} <= {bound:.1f} = total/(n_counters+1)); "
                f"raise n_counters (got {n_counters}) or lower k"
            )
        spark = df.sparkSession
        return spark.createDataFrame(rows, out.schema)
    return out


def misra_gries_exact_reference(
    texts: Sequence[str], k: int, ngram: int = 1
) -> list[tuple[str, int, int]]:
    """Driver-side exact reference (tests only): full count + same ordering."""
    from collections import Counter

    c: Counter = Counter()
    for t in texts:
        toks = t.lower().split()
        if ngram > 1:
            toks = [" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)]
        c.update(toks)
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [(t, n, i + 1) for i, (t, n) in enumerate(ordered)]
