"""Token-n-gram operators for training-data hygiene at corpus scale:
benchmark decontamination (shared-n-gram semi join) and exact duplicated-span
detection (the n-gram-anchor half of suffix-array dedup).

Design for 100 TB:
  * Tokenize + n-gram expansion are pure Catalyst expressions
    (``regexp_extract_all`` + ``transform``/``slice``) — whole-stage codegen,
    zero Python.
  * The shuffled key is ``xxhash64(gram)`` (8 bytes), not the gram string
    (~100 bytes for a 13-gram): ~10x smaller exchange. Collisions merge two
    grams with p ≈ (#grams)²/2⁶⁵ — at 10¹² grams that is still <3%, and a
    collision only *over*-flags a doc pair, which the verify pass of a real
    dedup pipeline re-checks. Gated queries keep hashing ON so the gate
    exercises the scale path; the DuckDB oracle counts the same overlaps on
    gram strings (counts are hash-invariant absent collisions).
  * The benchmark-gram side of decontamination is tiny relative to the corpus
    (eval sets are MBs, corpora are TBs) → broadcast semi join, no shuffle of
    the corpus side.

Reference parity note: the reference engine has no n-gram dedup; these extend
the LLM-pipeline surface mandated by the rebuild brief (BASELINE.json), in the
spirit of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (exact-substring dedup via shared n-gram anchors).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Same tokenizer the oracle mirrors: DuckDB regexp_extract_all(lower(t),'\S+')
# == Spark regexp_extract_all(lower(t), '(\S+)', 1) (group-idx trap).
_TOKENS = lambda text: F.regexp_extract_all(F.lower(text), F.lit(r"(\S+)"), 1)  # noqa: E731


def token_ngrams(text: Column, n: int) -> Column:
    """Array of space-joined token n-grams of ``text`` (empty when the doc has
    fewer than ``n`` tokens). Pure Catalyst: lower → tokenize → slide."""
    toks = _TOKENS(text)
    k = F.size(toks) - F.lit(n - 1)
    window = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(k >= 1, window).otherwise(F.array().cast("array<string>"))


def token_ngram_keys(text: Column, n: int) -> Column:
    """Array of 8-byte n-gram keys: ``xxhash64`` applied to each token
    *slice* directly — the ~100-byte gram string is never materialized at
    all (element-chained hashing distinguishes token boundaries, and tokens
    are ``\\S+`` so the space-joined string it replaces was bijective
    anyway)."""
    toks = _TOKENS(text)
    k = F.size(toks) - F.lit(n - 1)
    window = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.xxhash64(F.slice(toks, i, n)),
    )
    return F.when(k >= 1, window).otherwise(F.array().cast("array<bigint>"))


def token_ngram_keys_salted(text: Column, n: int, salt: str) -> Column:
    """Second (or Nth) independent 64-bit key plane for the same gram
    stream: ``xxhash64`` over the token slice with a constant ``salt``
    element prepended, so ``(token_ngram_keys, token_ngram_keys_salted)``
    pairs form an effectively 128-bit key — the extreme-scale option for
    standing gram indexes where >~10⁹ distinct eval grams would push
    64-bit birthday collisions (false contamination hits) past comfort.
    Aligned index-for-index with :func:`token_ngram_keys` (same window,
    same empty-doc rule), so the two arrays zip positionally."""
    toks = _TOKENS(text)
    k = F.size(toks) - F.lit(n - 1)
    window = F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.xxhash64(F.lit(salt), F.slice(toks, i, n)),
    )
    return F.when(k >= 1, window).otherwise(F.array().cast("array<bigint>"))


def doc_grams(
    df: DataFrame, id_col: str, text_col: str, n: int, hashed: bool = True
) -> DataFrame:
    """Distinct (id, gram_key) pairs — one row per n-gram per doc. With
    ``hashed`` (the scale default) the gram is keyed by ``xxhash64`` over the
    token slice — no gram string is ever built; with ``hashed=False`` the
    space-joined gram string itself is the key (debug/audit mode).

    Distinctness costs NO shuffle: an (id, gram) duplicate can only arise
    inside one row's own gram array (ids are unique per row — the caller's
    contract), so ``array_distinct`` inside the codegen stage is exact and
    no global ``.distinct()`` exchange is needed at all."""
    from spookystuff_spark.operators.layout import spread_small_input

    gram_col = token_ngram_keys if hashed else token_ngrams
    gram = F.explode(F.array_distinct(gram_col(F.col(text_col), n))).alias("gram_key")
    # gram explosion is ~100x the input bytes in CPU: make sure a small
    # (few-file) input doesn't serialize it onto one task
    return spread_small_input(df).select(F.col(id_col), gram)


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 13,
    hashed: bool = True,
) -> DataFrame:
    """Benchmark decontamination: per corpus doc, the number of distinct
    ``n``-grams it shares with ``benchmark`` (industry-standard 13-gram
    overlap rule). Returns (id, contaminated_grams) for docs with ≥1 hit.

    Plan: corpus grams stay partition-local; the (small) distinct benchmark
    gram set is broadcast — the only wide op is the final per-doc count."""
    cg = doc_grams(corpus, id_col, text_col, n, hashed)
    bg = doc_grams(benchmark, id_col, text_col, n, hashed).select("gram_key").distinct()
    return (
        cg.join(F.broadcast(bg), "gram_key", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )


def duplicated_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 15, hashed: bool = True
) -> DataFrame:
    """Exact duplicated-span detection: per doc, how many of its distinct
    ``n``-grams also occur in at least one *other* doc. A doc with
    ``dup_grams`` ≥ 1 contains a ≥n-token span copied across the corpus
    (n-gram anchors of exact-substring dedup). Returns (id, dup_grams,
    total_grams) for flagged docs.

    Plan: exactly two shuffles of the gram set — one window exchange on
    gram_key to annotate doc-frequency (grams are distinct per doc, so the
    partition count IS the doc frequency), one per-doc aggregation computing
    dup and total counts in the same pass. No self-join, no pair explosion —
    cost is O(corpus grams), not O(dup pairs²)."""
    from pyspark.sql import Window

    grams = doc_grams(df, id_col, text_col, n, hashed)
    df_docs = F.count(F.lit(1)).over(Window.partitionBy("gram_key"))
    return (
        grams.withColumn("df_docs", df_docs)
        .groupBy(id_col)
        .agg(
            F.sum(F.when(F.col("df_docs") >= 2, 1).otherwise(0)).alias("dup_grams"),
            F.count(F.lit(1)).alias("total_grams"),
        )
        .filter(F.col("dup_grams") >= 1)
    )


def longest_dup_span(
    df: DataFrame, id_col: str, text_col: str, n: int = 15, hashed: bool = True
) -> DataFrame:
    """Longest duplicated span per document, in tokens — the measurement
    behind exact-substring dedup (Lee et al. 2021): a maximal run of k
    consecutive duplicated ``n``-gram anchors witnesses a copied span of
    k + n - 1 tokens. "Duplicated" = the gram occurs ≥2 times corpus-wide
    (across docs or repeated within one doc).

    Plan, all Catalyst-native: posexplode the per-position gram-key array
    (positions matter here, so no array_distinct), one window exchange on
    gram_key to annotate global occurrence counts, then per-doc run-length
    via the classic gap-and-islands trick (pos − row_number over dup
    positions) and one aggregation. Returns (id, longest_span_tokens) for
    docs containing at least one duplicated anchor."""
    from pyspark.sql import Window

    from spookystuff_spark.operators.layout import spread_small_input

    gram_col = token_ngram_keys if hashed else token_ngrams
    pos_grams = spread_small_input(df).select(
        F.col(id_col),
        F.posexplode(gram_col(F.col(text_col), n)).alias("pos", "gram_key"),
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy("gram_key"))
    dup = (
        pos_grams.withColumn("occ", occ)
        .filter(F.col("occ") >= 2)
        .select(F.col(id_col), "pos")
    )
    grp = F.col("pos") - F.row_number().over(
        Window.partitionBy(id_col).orderBy("pos")
    )
    runs = (
        dup.withColumn("grp", grp)
        .groupBy(id_col, "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return runs.groupBy(id_col).agg(
        (F.max("run") + F.lit(n - 1)).cast("long").alias("longest_span_tokens")
    )


def char_ngram_logprob(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """CCNet-style fluency scoring without an external model: train a
    character-``n``-gram unigram LM on the corpus itself (one count
    aggregation), then score every doc by its mean log10 n-gram probability.
    Low scores ⇒ out-of-distribution / junk text relative to the corpus.

    Plan: the per-character occurrence stream never reaches an exchange — a
    partial-aggregating ``groupBy(id, gram)`` collapses it map-side to
    distinct (doc, gram, count) triples (bounded by alphabet^n per doc, not
    doc length). The LM itself (distinct gram → corpus count) is bounded by
    the *corpus-wide* distinct-gram count — alphabet^n, independent of
    corpus size — so it is aggregated once (Catalyst reuses dg's exchange
    for both branches) and BROADCAST back onto the triples: no per-gram
    window exchange, no sort. The corpus total is a no-gram scan
    (``sum(len - n + 1)``), and a final per-doc aggregation takes the
    occurrence-weighted mean — algebraically the same mean-over-occurrences,
    with shuffle volume bounded by per-doc *distinct* grams instead of doc
    length. The explode carries only a position index (the n-gram substring
    is cut AFTER the explode, codegen-pipelined) — no per-row string-array
    materialization."""
    # materialize lower(text) once; referencing an expression inside a
    # per-element lambda re-evaluates it per element (O(L²) per doc)
    from spookystuff_spark.operators.layout import spread_small_input

    lowered = spread_small_input(df).select(
        F.col(id_col), F.lower(F.col(text_col)).alias("__low")
    )
    low = F.col("__low")
    k = F.length(low) - F.lit(n - 1)
    exploded = lowered.select(
        F.col(id_col),
        low,
        F.explode(F.when(k >= 1, F.sequence(F.lit(1), k))).alias("__i"),
    ).select(
        F.col(id_col),
        F.xxhash64(F.expr(f"substring(__low, __i, {n})")).alias("gram_key"),
    )

    dg = exploded.groupBy(id_col, "gram_key").agg(F.count(F.lit(1)).alias("c"))
    model = dg.groupBy("gram_key").agg(F.sum("c").alias("cnt"))
    total = lowered.agg(
        F.sum(F.greatest(k, F.lit(0))).cast("double").alias("total")
    )
    scored = (
        dg.join(F.broadcast(model), "gram_key")
        .join(F.broadcast(total))
        .select(
            F.col(id_col),
            F.col("c"),
            (
                F.col("c").cast("double")
                * F.log10(F.col("cnt").cast("double") / F.col("total"))
            ).alias("wlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        (F.sum("wlp") / F.sum("c")).alias("avg_logprob"),
        F.sum("c").cast("long").alias("n_grams"),
    )


def remove_dup_spans(
    df: DataFrame, id_col: str, text_col: str, n: int = 15, hashed: bool = True
) -> DataFrame:
    """Exact-substring dedup REMOVAL (Lee et al. 2021): delete every token
    covered by a duplicated ``n``-gram anchor (one that occurs ≥2 times
    corpus-wide) and rebuild the doc from the surviving tokens. The cleaned
    text is whitespace-normalized lowercase (the tokenizer's view).

    Returns (id, cleaned_md5, kept_tokens, removed_tokens) for docs that had
    at least one duplicated anchor — the pinnable digest of the rewritten
    corpus; callers wanting the text itself use the same plan minus the md5.

    Plan, all Catalyst: one window exchange on gram_key annotates anchor
    occurrence counts (identical to longest_dup_span); the surviving anchor
    POSITIONS aggregate per doc (one O(anchors) shuffle of 8-byte ints) and
    join back to the affected docs' text; the rebuild is then a single
    per-doc projection — covered indices from ``flatten(transform(anchors,
    p → sequence(p, p+n-1)))``, kept indices via ``array_except`` (hash-set
    subtraction, order-preserving), tokens re-sliced by index. The token
    stream itself is NEVER exploded or shuffled (the previous plan
    exchanged every corpus token twice — an anti-join and an ordered
    re-aggregation — to decide what one doc-local expression decides here).
    No pair explosion anywhere — cost is O(corpus grams) for the window +
    O(affected docs' text) for the rebuild, never O(dup pairs²)."""
    from pyspark.sql import Window

    from spookystuff_spark.operators.layout import spread_small_input

    gram_col = token_ngram_keys if hashed else token_ngrams
    spread = spread_small_input(df)
    # NB: each consumer explodes straight off the source projection — routing
    # the gram posexplode through a shared (toks, grams) projection makes the
    # collapsed generator re-evaluate the tokenizer per emitted element (the
    # O(L²) transform trap documented at char_ngram_logprob), ~14x slower
    pos_grams = spread.select(
        F.col(id_col),
        F.posexplode(gram_col(F.col(text_col), n)).alias("pos", "gram_key"),
    )
    occ = F.count(F.lit(1)).over(Window.partitionBy("gram_key"))
    anchors = (
        pos_grams.withColumn("occ", occ)
        .filter(F.col("occ") >= 2)
        .groupBy(id_col)
        .agg(F.collect_list("pos").alias("_anchors"))
    )
    toks = _TOKENS(F.col(text_col))
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.col("_anchors"),
                lambda p: F.sequence(p, p + F.lit(n - 1)),
            )
        )
    )
    # doc-local rebuild: total token count, covered-index subtraction
    # (array_except preserves the first array's order, so kept indices
    # stay ascending), tokens re-sliced by index, md5 of the re-joined
    # text — an all-removed doc keeps zero indices and digests md5("")
    return (
        spread.join(anchors, id_col)
        .select(
            F.col(id_col),
            F.size(toks).alias("__total"),
            F.array_except(
                F.sequence(F.lit(0), F.size(toks) - F.lit(1)),
                covered,
            ).alias("_kept_idx"),
            toks.alias("_toks"),
        )
        .select(
            F.col(id_col),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.col("_kept_idx"),
                        lambda i: F.element_at(F.col("_toks"), i + F.lit(1)),
                    ),
                )
            ).alias("cleaned_md5"),
            F.size("_kept_idx").cast("long").alias("kept_tokens"),
            (F.col("__total") - F.size("_kept_idx"))
            .cast("long")
            .alias("removed_tokens"),
        )
    )


def ccnet_perplexity_buckets(
    df: DataFrame, id_col: str, text_col: str, lang_col: str, n: int = 3
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): per language,
    rank docs by LM score and cut into terciles — head = most fluent third.
    Uses the corpus-trained char-n-gram LM (:func:`char_ngram_logprob`) in
    place of CCNet's external KenLM.

    → (id, lang, score, bucket). The score is quantized to 4 dp before
    ranking (doc-id tiebreak) so tercile membership is reproducible across
    engines' float-summation orders. One window exchange keyed on the
    language — low cardinality but each partition is only ranked, not
    materialized wide; for a skewed 100 TB corpus swap the ntile for a
    2-pass approx-quantile cut.
    """
    from pyspark.sql import Window

    from spookystuff_spark.functions.rounding import round_stable

    scored = char_ngram_logprob(df, id_col, text_col, n=n).select(
        F.col(id_col), round_stable(F.col("avg_logprob"), 4).alias("score")
    )
    with_lang = scored.join(
        df.select(F.col(id_col), F.col(lang_col).alias("lang")), id_col
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col(id_col))
    tercile = F.ntile(3).over(w)
    bucket = (
        F.when(tercile == 1, "head").when(tercile == 2, "middle").otherwise("tail")
    )
    return with_lang.select(
        F.col(id_col), "lang", "score", bucket.alias("bucket")
    )
