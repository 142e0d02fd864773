"""Training-data hygiene queries over operators/ngram.py: benchmark
decontamination, exact duplicated-span detection, and corpus-LM fluency
scoring. All three run the scale path (xxhash64 gram keys); the DuckDB
oracles compute the same per-doc counts over gram strings — counts are
hash-invariant absent collisions (p ≈ 10⁻⁶ at gate scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.tables import table

# DuckDB token n-gram CTE; mirrors operators/ngram.py tokenization exactly:
# regexp_extract_all(lower(text), '\S+') then sliding space-joined windows.
# DuckDB list slices are 1-based inclusive: t[i:i+n-1] is n tokens.
_GRAMS_CTE = """
    toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+{m}], ' ') AS g
      FROM toks, UNNEST(range(1, len(t)-{m}+1)) AS r(i)
      WHERE len(t) >= {n})
"""


@query(
    "q_decontaminate_13gram",
    oracle=f"""
    WITH {_GRAMS_CTE.format(n=13, m=12)},
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS contaminated_grams
    FROM grams
    WHERE doc_id % 10 <> 0 AND g IN (SELECT g FROM bench)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_decontaminate_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/ngram.decontaminate): every tenth
    doc stands in for the eval set; corpus docs sharing any 13-token-gram with
    it are flagged with their overlap count. The benchmark gram set is
    broadcast — the corpus side never shuffles its grams."""
    from spookystuff_spark.operators.ngram import decontaminate

    docs = table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 10 == 0)
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    return decontaminate(corpus, benchmark, "doc_id", "text", n=13).orderBy("doc_id")


@query(
    "q_dup_span_docs",
    oracle=f"""
    WITH {_GRAMS_CTE.format(n=15, m=14)},
    freq AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
    flagged AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS dup_grams
      FROM grams WHERE g IN (SELECT g FROM freq) GROUP BY doc_id),
    totals AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS total_grams
      FROM grams GROUP BY doc_id)
    SELECT f.doc_id, f.dup_grams, t.total_grams
    FROM flagged f JOIN totals t USING (doc_id)
    ORDER BY doc_id
    """,
)
def q_dup_span_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span detection (operators/ngram.duplicated_spans):
    docs containing a ≥15-token span that occurs verbatim in another doc,
    with how much of the doc is duplicated (dup vs total 15-grams). One
    doc-frequency shuffle on 8-byte keys — no pair explosion."""
    from spookystuff_spark.operators.ngram import duplicated_spans

    docs = table(spark, sf_dir, "documents")
    return duplicated_spans(docs, "doc_id", "text", n=15).orderBy("doc_id")


@query(
    "q_char_trigram_logprob",
    oracle="""
    WITH g AS (
      SELECT doc_id, substr(lower(text), i, 3) AS cg
      FROM documents, UNNEST(range(1, length(text)-1)) AS r(i)
      WHERE length(text) >= 3),
    model AS (SELECT cg, count(*) AS cnt FROM g GROUP BY cg),
    tot AS (SELECT sum(cnt) AS total FROM model)
    SELECT doc_id,
           round(1e-6 + avg(log10(cnt / total)), 4) AS avg_logprob,
           CAST(count(*) AS BIGINT) AS n_grams
    FROM g JOIN model USING (cg), tot
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q_char_trigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained char-trigram LM fluency score (operators/ngram
    .char_ngram_logprob): mean log10 trigram probability per doc, the
    model being one count aggregation over the corpus itself (CCNet-style
    perplexity filtering without an external model)."""
    from spookystuff_spark.functions.rounding import round_stable
    from spookystuff_spark.operators.ngram import char_ngram_logprob

    docs = table(spark, sf_dir, "documents")
    out = char_ngram_logprob(docs, "doc_id", "text", n=3)
    return out.select(
        "doc_id",
        round_stable(F.col("avg_logprob"), 4).alias("avg_logprob"),
        "n_grams",
    ).orderBy("doc_id")


@bench_only("q_longest_dup_span")
def q_longest_dup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest duplicated span per doc in tokens (operators/ngram
    .longest_dup_span) — run-length of consecutive duplicated 15-gram
    anchors, the exact-substring-dedup measurement of Lee et al. 2021.
    Gate row lives in q_curation_suite's melt."""
    from spookystuff_spark.operators.ngram import longest_dup_span

    docs = table(spark, sf_dir, "documents")
    return longest_dup_span(docs, "doc_id", "text", n=15).orderBy("doc_id")


@bench_only("q_dupspan_removal")
def q_dupspan_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup removal (operators/ngram.remove_dup_spans):
    delete every token covered by a corpus-duplicated 15-gram anchor and pin
    the rewritten doc by md5 + kept/removed counts — the transform half of
    Lee et al.'s dedup (q_longest_dup_span is the measurement half).
    Gate row lives in q_curation_suite's melt."""
    from spookystuff_spark.operators.ngram import remove_dup_spans

    docs = table(spark, sf_dir, "documents")
    return remove_dup_spans(docs, "doc_id", "text", n=15).orderBy("doc_id")


# Oracle for the INCREMENTAL decontamination index gate: the closed-form
# recompute over the benchmark's FINAL state (after the append, the
# preimage-logged ' zz' update of %50 docs and the lang='de' delete) —
# passing means three feed shapes composed exactly in the signed gram fold.
ORACLE_DECONTAM_INDEX = """
    WITH bench AS (
      SELECT doc_id,
             CASE WHEN doc_id % 50 = 0 THEN text || ' zz' ELSE text END
               AS text
      FROM documents WHERE doc_id % 10 = 0 AND lang <> 'de'),
    btoks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
      FROM bench),
    bgrams AS (
      SELECT DISTINCT array_to_string(t[i:i+12], ' ') AS g
      FROM btoks, UNNEST(range(1, len(t)-11)) AS r(i)
      WHERE len(t) >= 13),
    ctoks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
      FROM documents WHERE doc_id % 10 <> 0),
    cgrams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g
      FROM ctoks, UNNEST(range(1, len(t)-11)) AS r(i)
      WHERE len(t) >= 13)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS contaminated_grams
    FROM cgrams WHERE g IN (SELECT g FROM bgrams)
    GROUP BY doc_id
"""


@bench_only("q_decontam_index")
def q_decontam_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental decontamination index, gate-pinned end-to-end
    (operators/decontam_index.py): build the bucket-laid gram support
    Z-set on the %10==0-and-%40!=0 benchmark slice, fold the %40==0
    batch in FROM THE CHANGE FEED, then fold a preimage-logged UPDATE
    (%50 docs gain a ' zz' token — old grams retracted, new grams added
    in one signed delta) AND a lang='de' DELETE as one backlog fold —
    the feed-shape coverage the BM25/LSH indexes must refuse — and
    check the %10!=0 corpus against the standing index
    (``decontam_check_df``: the benchmark is never re-tokenized).
    Rides ``q_scalar_suite``'s melt vs the closed-form recompute."""
    import shutil
    import tempfile

    import spookystuff_spark.operators.decontam_index as D
    from spookystuff_spark.sources.upsert import (
        append_rows,
        delete_where,
        upsert,
        write_table,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    src = tempfile.mkdtemp(prefix="spooky-dcxsrc-")
    idx = tempfile.mkdtemp(prefix="spooky-dcxidx-")
    try:
        write_table(bench.where(F.col("doc_id") % 40 != 0), src)
        D.build_decontam_index(spark, src, idx, n=13, n_buckets=8)
        append_rows(spark, src, bench.where(F.col("doc_id") % 40 == 0))
        D.refresh_decontam_index(spark, src, idx)
        upd = bench.where(F.col("doc_id") % 50 == 0).withColumn(
            "text", F.concat(F.col("text"), F.lit(" zz"))
        )
        upsert(spark, src, upd, ["doc_id"], feed_preimages=True)
        delete_where(spark, src, F.col("lang") == "de")
        D.refresh_decontam_index(spark, src, idx)
        out = D.decontam_check_df(
            spark, idx, docs.where(F.col("doc_id") % 10 != 0)
        )
        return out.localCheckpoint(eager=True)  # outlive the temp dirs
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)
