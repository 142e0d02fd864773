"""Byte-pair-encoding tokenizer: distributed training + distributed encoding.

The scale split follows sentencepiece/HF-tokenizers practice: BPE merges are
learned from the **word-frequency table**, not the raw corpus — counting word
frequencies is the only corpus-sized pass (one explode + one groupBy, fully
distributed, map-side combined), and the merge loop then runs on the bounded
table (``top_words`` caps driver state; at 100 TB the top-1M-word table is a
few MB while the corpus is not). Encoding broadcasts the merge ranks back to
executors and runs GPT-2-style greedy rank merging in an Arrow stage.

Everything is deterministic: word table ties sort lexicographically, merge
ties pick (max count, lexicographically smallest pair), so the same corpus
always yields the same vocabulary — pinned by an independent replica in
tools/gen_goldens.py.
"""

from __future__ import annotations

from collections import Counter
from typing import Iterator, Sequence

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

WORD_RE = "([a-z0-9]+)"
END = "</w>"


def word_freqs(
    docs: DataFrame, text_col: str = "text", top_words: int = 100_000
) -> DataFrame:
    """(word, freq) — the one corpus-sized job. ``top_words`` bounds what the
    driver will hold (ties broken by word so the cut is deterministic)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 1)
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(top_words)
    )


def train_bpe(
    freqs: Sequence[tuple[str, int]], n_merges: int = 64
) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table (driver-side —
    the table is bounded, the corpus never is). Deterministic tie-breaks."""
    words: dict[tuple[str, ...], int] = {}
    for w, f in freqs:
        words[tuple(w) + (END,)] = words.get(tuple(w) + (END,), 0) + int(f)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_words: dict[tuple[str, ...], int] = {}
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + f
        words = new_words
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style greedy merging: repeatedly merge the lowest-rank pair."""
    sym = list(word) + [END]
    while len(sym) > 1:
        pairs = [(ranks.get((a, b), 1 << 30), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
        rank, i = min(pairs)
        if rank >= 1 << 30:
            break
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_token_counts(
    docs: DataFrame,
    merges: Sequence[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_bpe_tokens) — one Arrow stage; merge ranks ship in
    the closure (broadcast), the per-word encoding is memoized per batch."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    import re

    word_re = re.compile("[a-z0-9]+")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_bpe = [], []
            for text in pdf[text_col]:
                ws = word_re.findall((text or "").lower())
                total = 0
                for w in ws:
                    n = memo.get(w)
                    if n is None:
                        n = len(encode_word(w, ranks))
                        memo[w] = n
                    total += n
                n_words.append(len(ws))
                n_bpe.append(total)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_words": pd.array(n_words, dtype="int64"),
                    "n_bpe_tokens": pd.array(n_bpe, dtype="int64"),
                }
            )

    from spookystuff_spark.operators.layout import spread_small_input

    return spread_small_input(docs.select(id_col, text_col)).mapInPandas(
        fn, "doc_id long, n_words long, n_bpe_tokens long"
    )


def fit_encode(
    docs: DataFrame,
    n_merges: int = 64,
    top_words: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train on the corpus's own word table, then encode the corpus."""
    freqs = [(r["word"], r["freq"]) for r in word_freqs(docs, text_col, top_words).collect()]
    merges = train_bpe(freqs, n_merges)
    return merges, bpe_token_counts(docs, merges, id_col, text_col)
