"""Text analysis for training-data pipelines: language-ID heuristic, quality
scoring, tokenization, fingerprinting.

Everything here is expressible with native Catalyst functions (regexp_count,
lower, md5, length) — no Python in the per-row path; the column builders
return Spark Columns so they compose into any query and whole-stage-codegen at
100 TB. The same formulas are mirrored in SQL by the oracle queries.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# Tiny per-language stopword markers (word-boundary regexes). Deliberately
# minimal & deterministic — a heuristic signal, not a model.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|is)\b",
    "de": r"\b(der|und|die|das|ist)\b",
    "fr": r"\b(le|la|et|les|est)\b",
    "es": r"\b(el|de la|los|es|y)\b",
}

TOKEN_RE = r"\S+"
# BPE-ish word/punct splitter: words, numbers, or single punctuation marks
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(TOKEN_RE)).cast("long")


def bpe_token_count(text: Column) -> Column:
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE)).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    low = F.lower(text)
    return {
        lang: F.regexp_count(low, F.lit(pattern))
        for lang, pattern in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax of marker hits; deterministic tie-break by language code order;
    'und' (undetermined) when nothing matches."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length band + punctuation sanity + stopword
    presence + mean word length sanity (the classic cheap pretraining filters)."""
    n_chars = F.length(text)
    n_tokens = token_count(text)
    punct = F.regexp_count(text, F.lit(r"[.,;:!?]"))
    stop_hits = F.regexp_count(
        F.lower(text), F.lit(r"\b(the|and|of|to|is|a|in)\b")
    )
    mean_word_len = n_chars.cast("double") / F.greatest(n_tokens, F.lit(1))
    len_ok = F.when((n_chars >= 50) & (n_chars <= 20000), 1.0).otherwise(0.0)
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1))
    punct_ok = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.0)
    stop_ok = F.when(
        stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1)) >= 0.01, 1.0
    ).otherwise(0.0)
    word_ok = F.when((mean_word_len >= 2.5) & (mean_word_len <= 12), 1.0).otherwise(0.0)
    return F.round((len_ok + punct_ok + stop_ok + word_ok) / 4 + F.lit(1e-6), 2)


def fingerprint(text: Column) -> Column:
    """Canonical content fingerprint: md5 of lowercased, whitespace-collapsed
    text — the exact-dedup key robust to formatting noise."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized)


def chunk_expr(text: Column, chunk_tokens: int = 64, stride: int = 48) -> Column:
    """Overlapping token-window chunks — the standard pretraining document
    splitter, as a pure Catalyst expression (array of chunk strings).

    chunk i covers tokens [i*stride, i*stride + chunk_tokens); the last
    window starts at the final stride position that still has ≥1 token.
    """
    toks = F.regexp_extract_all(text, F.lit(r"(\S+)"), 1)
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1, F.lit(1)
    ).cast("int")
    idx = F.sequence(F.lit(0), n_chunks - 1)
    return F.transform(
        idx,
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, chunk_tokens), " "
        ),
    )


# ------------------------------------------------------------- Gopher rules
# Published pretraining quality filters (Gopher — Rae et al. 2021, appendix
# A1.1 — plus the duplicate-line repetition rule from the same family). All
# pure Catalyst expressions: one codegen stage, no Python, no shuffle.

REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLET_RE = r"^\s*([•‣▪●\-\*])"
_ELLIPSIS_END_RE = r"(\.\.\.|…)\s*$"
_SYMBOL_RE = r"#|\.\.\.|…"


def gopher_stats(text: Column) -> dict[str, Column]:
    """Per-document Gopher rule inputs as named Columns. Ratios are raw
    IEEE-754 divisions (bit-identical across engines) — round only for
    display, never before threshold comparison."""
    words = F.regexp_extract_all(text, F.lit(r"\S+"), F.lit(0))
    n_words = F.size(words).cast("long")
    lines = F.split(text, "\n")
    n_lines = F.size(lines).cast("long")
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    non_ws_chars = F.length(F.regexp_replace(text, r"\s+", ""))
    stop_distinct = sum(
        (
            F.when(
                F.lower(text).rlike(rf"\b{w}\b"), F.lit(1)
            ).otherwise(F.lit(0))
            for w in REQUIRED_STOPWORDS
        ),
        F.lit(0),
    )
    d = F.greatest(n_words, F.lit(1)).cast("double")
    dl = F.greatest(n_lines, F.lit(1)).cast("double")
    return {
        "n_words": n_words,
        "mean_word_len": non_ws_chars.cast("double") / d,
        "symbol_word_ratio": F.regexp_count(text, F.lit(_SYMBOL_RE)).cast("double") / d,
        "bullet_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(_BULLET_RE))
        ).cast("double") / dl,
        "ellipsis_line_frac": F.size(
            F.filter(lines, lambda l: l.rlike(_ELLIPSIS_END_RE))
        ).cast("double") / dl,
        "alpha_word_frac": alpha_words.cast("double") / d,
        "required_stop_hits": stop_distinct.cast("long"),
        "dup_line_frac": (n_lines - F.size(F.array_distinct(lines))).cast("double") / dl,
    }


def gopher_pass(text: Column) -> Column:
    """True iff the document clears every Gopher rule — the composite filter
    a 100 TB pretraining ingest applies before dedup."""
    s = gopher_stats(text)
    return (
        s["n_words"].between(50, 100_000)
        & s["mean_word_len"].between(3.0, 10.0)
        & (s["symbol_word_ratio"] <= 0.1)
        & (s["bullet_line_frac"] <= 0.9)
        & (s["ellipsis_line_frac"] <= 0.3)
        & (s["alpha_word_frac"] >= 0.8)
        & (s["required_stop_hits"] >= 2)
        & (s["dup_line_frac"] <= 0.3)
    )


# ----------------------------------------------------------------- C4 rules
# Published C4 cleaning heuristics (Raffel et al. 2020 §2.2): line-level
# retention + page-level drops. Pure Catalyst array/lambda expressions.

_TERMINAL_PUNCT_RE = r'[.!?"”]\s*$'


def c4_clean_lines(text: Column, min_words: int = 5) -> Column:
    """Line-level C4 cleaning: keep lines that end in terminal punctuation,
    contain at least ``min_words`` words, and don't mention javascript.
    Returns the cleaned text (kept lines re-joined)."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: l.rlike(_TERMINAL_PUNCT_RE)
        & (F.regexp_count(l, F.lit(r"\S+")) >= min_words)
        & ~F.lower(l).contains("javascript"),
    )
    return F.array_join(kept, "\n")


def c4_page_pass(text: Column, min_sentences: int = 3) -> Column:
    """Page-level C4 drops: needs >= min_sentences sentences after line
    cleaning, no 'lorem ipsum', no curly braces."""
    cleaned = c4_clean_lines(text)
    n_sentences = F.regexp_count(cleaned, F.lit(r"[.!?]"))
    low = F.lower(text)
    return (
        (n_sentences >= min_sentences)
        & ~low.contains("lorem ipsum")
        & ~text.contains("{")
    )


# ------------------------------------------------- Gopher repetition family
# The remaining Gopher repetition rules (dup line/paragraph CHAR fractions,
# top n-gram char fraction, duplicated n-gram char fraction) need per-doc
# frequency maps — not expressible as codegen'd Catalyst expressions, so they
# run as ONE narrow Arrow stage (mapInPandas, no shuffle; ~µs/doc in Counter).

REPETITION_THRESHOLDS = {
    # rule → max allowed fraction (Gopher A1.1)
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_10gram_char_frac": 0.10,
}


def _repetition_stats_one(text: str) -> dict:
    from collections import Counter

    text = text or ""
    total_chars = max(len(text), 1)

    def dup_fracs(units: list[str]) -> tuple[float, float]:
        if not units:
            return 0.0, 0.0
        counts = Counter(units)
        n_dup = sum(c - 1 for c in counts.values() if c > 1)
        chars_dup = sum(len(u) * c for u, c in counts.items() if c > 1)
        return n_dup / len(units), chars_dup / total_chars

    lines = [l for l in text.split("\n") if l.strip()]
    paras = [p for p in text.split("\n\n") if p.strip()]
    dup_line_frac, dup_line_char_frac = dup_fracs(lines)
    dup_para_frac, dup_para_char_frac = dup_fracs(paras)

    words = text.split()
    out = {
        "dup_line_frac": dup_line_frac,
        "dup_line_char_frac": dup_line_char_frac,
        "dup_para_frac": dup_para_frac,
        "dup_para_char_frac": dup_para_char_frac,
    }
    for n in (2, 3, 4):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        if not grams:
            out[f"top_{n}gram_char_frac"] = 0.0
            continue
        gram, cnt = Counter(grams).most_common(1)[0]
        out[f"top_{n}gram_char_frac"] = (len(gram) * cnt) / total_chars
    for n in (5, 10):
        grams = [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
        counts = Counter(grams)
        # chars covered by n-grams occurring more than once (all occurrences)
        chars = sum(len(g) * c for g, c in counts.items() if c > 1)
        out[f"dup_{n}gram_char_frac"] = min(chars / total_chars, 1.0)
    out["repetition_pass"] = all(
        out[k] <= v for k, v in REPETITION_THRESHOLDS.items()
    )
    return out


def repetition_stats(df, id_col: str, text_col: str):
    """→ (id, <all repetition fractions>, repetition_pass): the Gopher
    repetition filter as one narrow Arrow stage."""
    from typing import Iterator

    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    fields = [StructField("id", LongType())]
    fields += [StructField(k, DoubleType()) for k in REPETITION_THRESHOLDS]
    fields += [StructField("repetition_pass", BooleanType())]
    schema = StructType(fields)

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                r = _repetition_stats_one(t)
                r["id"] = i
                rows.append(r)
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    from spookystuff_spark.operators.layout import spread_small_input

    return spread_small_input(df.select(id_col, text_col)).mapInPandas(run, schema)
