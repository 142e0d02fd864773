"""LLM-training-pipeline queries: language-ID and vocabulary stats
(SQL-oracled), and the MinHash/SimHash/ANN/multimodal operators — their
signature math isn't ANSI-SQL-expressible, so each is oracled against a
GOLDEN PARQUET precomputed by an independent numpy implementation
(tools/gen_goldens.py; the same reference code as the set-level audits in
tests/test_ground_truth_audit.py). Per-document profile/fingerprint queries
live in queries/text.py."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.operators.text import lang_id
from spookystuff_spark.queries import bench_only, golden_oracle, query
from spookystuff_spark.tables import table

_LANG_SCORE_SQL = """
      length(regexp_extract_all(lower(text), '\\b(der|und|die|das|ist)\\b')) AS s_de,
      length(regexp_extract_all(lower(text), '\\b(the|and|of|to|is)\\b'))   AS s_en,
      length(regexp_extract_all(lower(text), '\\b(el|de la|los|es|y)\\b'))  AS s_es,
      length(regexp_extract_all(lower(text), '\\b(le|la|et|les|est)\\b'))   AS s_fr
"""


ORACLE_LANG_ID = f"""
    WITH s AS (SELECT doc_id, lang, {_LANG_SCORE_SQL} FROM documents)
    SELECT lang AS labeled_lang,
           CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                ELSE 'fr' END AS detected_lang,
           count(*) AS n_docs
    FROM s GROUP BY 1, 2
    """


@bench_only("q_lang_id_heuristic")
def q_lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID (confusion matrix vs the labeled lang) —
    all regexp_count, fully codegen'd."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("lang").alias("labeled_lang"),
            lang_id(F.col("text")).alias("detected_lang"),
        )
        .groupBy("labeled_lang", "detected_lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_TOKEN_FREQ = """
    SELECT tok, count(*) AS n FROM (
      SELECT unnest(regexp_extract_all(text, '\\S+')) AS tok FROM documents
    ) GROUP BY tok ORDER BY n DESC, tok LIMIT 20
    """


@bench_only("q_token_freq_topk")
def q_token_freq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary head: explode tokens → count → deterministic top-20."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(r"(\S+)"), 1)
            ).alias("tok")
        )
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


# ------------------------------------------------ golden-oracled (non-SQL ops)


@query("q_dedup_minhash", oracle=golden_oracle("q_dedup_minhash"))
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at jaccard ≥ 0.8 (seed-fixed, deterministic).

    8-row bands: band-collision probability j^8, so same-domain corpora (high
    baseline shingle overlap) don't explode the candidate set — at sf0.1 this
    is the difference between ~2s and ~2min."""
    from spookystuff_spark.operators.dedup import minhash_near_duplicates

    docs = table(spark, sf_dir, "documents")
    return minhash_near_duplicates(
        docs, "doc_id", "text", threshold=0.8, n_hashes=128, bands=16
    )


@query("q_dedup_simhash", oracle=golden_oracle("q_dedup_simhash"))
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming ≤ 8 over 64-bit signatures."""
    from spookystuff_spark.operators.dedup import simhash_near_duplicates

    docs = table(spark, sf_dir, "documents")
    return simhash_near_duplicates(docs, "doc_id", "text", max_hamming=8)


@query("q_ann_lsh_topk", oracle=golden_oracle("q_ann_lsh_topk"))
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 neighbors (bucketed candidate pruning
    + exact cosine re-rank); recall vs brute force pinned in pytest."""
    from spookystuff_spark.operators.similarity import lsh_topk_pairs

    emb = table(spark, sf_dir, "embeddings")
    return lsh_topk_pairs(emb, "vec_id", "embedding", dim=64, k=5, n_planes=8)


@query("q_multimodal_meta", oracle=golden_oracle("q_multimodal_meta"))
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media-blob metadata extraction over synthetic binary columns (utf-8
    doc payloads standing in for media bytes) — real byte-level features."""
    from spookystuff_spark.operators.multimodal import extract_media_meta

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("media")
    )
    out = extract_media_meta(docs, "media")
    return out.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.entropy").alias("entropy"),
        F.col("meta.media_type").alias("media_type"),
    )


@query("q_ann_ivf_topk", oracle=golden_oracle("q_ann_ivf_topk"))
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-5 neighbors (deterministic farthest-point
    k-means cells, single-probe, exact cosine re-rank) — the second ANN scale
    path beside hyperplane LSH; recall pinned in pytest."""
    from spookystuff_spark.operators.similarity import ivf_topk_pairs

    emb = table(spark, sf_dir, "embeddings")
    # n_cells=None → auto ~sqrt(n) from the training sample: keeps per-cell
    # candidate sets (and re-rank cost) flat as the corpus grows
    return ivf_topk_pairs(emb, "vec_id", "embedding", dim=64, k=5, n_cells=None)


@bench_only("q_ann_index")
def q_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index over the lakehouse, gate-pinned end-to-end
    (operators/ann_index.py): build the cell-partitioned index on the
    vec_id%4!=0 base corpus, fold the %4==0 batch in FROM THE CHANGE FEED
    (O(batch) assignment + O(touched-cells) partitioned MERGE — never a
    rebuild), then answer nprobe=2 top-5 queries for the %97 ids through
    the manifest-pruned partition reader — the queries probe AS A
    DATAFRAME (``ann_query_df``: probe cells assigned executor-side,
    bounded distinct-cell collect, no query collect; the r10
    DataFrame-probe surface, gated here). Returns melted rows: every
    vector's final cell assignment (``anncells`` — pins the incremental
    fold) and every query's ranked neighbors (``annidx`` — pins the probe
    path), compared against an independent numpy replica golden
    (tools/gen_goldens.py::gold_ann_index) via ``q_curation_suite``."""
    import shutil
    import tempfile

    from spookystuff_spark.operators import ann_index as A
    from spookystuff_spark.sources.upsert import append_rows, read_table, write_table

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    src = tempfile.mkdtemp(prefix="spooky-annsrc-")
    idx = tempfile.mkdtemp(prefix="spooky-annidx-")
    try:
        write_table(emb.where(F.col("vec_id") % 4 != 0), src)
        A.build_ann_index(spark, src, idx, n_cells=8)
        append_rows(spark, src, emb.where(F.col("vec_id") % 4 == 0))
        A.refresh_ann_index(spark, src, idx)

        cells = read_table(spark, idx).select(
            F.lit("anncells").alias("q"),
            F.col("vec_id").cast("string").alias("row_key"),
            F.lit("cell_num").alias("measure"),
            F.substring("cell", 2, 10).cast("double").alias("v_num"),
        )
        qdf = emb.where(F.col("vec_id") % 97 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        res = A.ann_query_df(spark, idx, qdf, k=5, nprobe=2)
        annidx = res.select(
            F.lit("annidx").alias("q"),
            F.concat_ws(
                "|", F.col("query_id"), F.col("vec_id"), F.col("rn")
            ).alias("row_key"),
            F.lit("cosine").alias("measure"),
            F.col("cosine").alias("v_num"),
        )
        return cells.unionByName(annidx).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)


@bench_only("q_lsh_index")
def q_lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH index, gate-pinned end-to-end
    (operators/lsh_index.py): build the band/sig tables on the
    doc_id%5!=0 base corpus, fold the %5==0 batch in FROM THE CHANGE
    FEED (O(batch) signature pass + O(batch) partitioned appends —
    never a rebuild), DELETE two docs that partner probe near-dups
    (447, 290 — the fold becomes an O(deleted) key deletion vector,
    zero index rewrite), then probe the %7 docs AS A DATAFRAME against
    the index (``lsh_index_query_df`` — signatures in mapInPandas,
    bucket-pruned band join, no driver collect anywhere in the probe
    plane; the r9 verdict's one remaining scale term). Returns melted
    rows: every doc's final VISIBLE band rows (``lshbands`` — pins the
    incremental fold and the DV retraction bit-exactly) and every
    probe's estimate-verified near-dups (``lshprobe`` — pins the probe
    path, minus the deleted partners' pairs), compared against an
    independent numpy replica golden
    (tools/gen_goldens.py::gold_lsh_index) via ``q_curation_suite``."""
    import shutil
    import tempfile

    from spookystuff_spark.operators import lsh_index as L
    from spookystuff_spark.sources.partitioned_table import (
        read_table_partitions,
    )
    from spookystuff_spark.sources.upsert import (
        append_rows,
        delete_where,
        write_table,
    )

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="spooky-lshsrc-")
    idx = tempfile.mkdtemp(prefix="spooky-lshidx-")
    try:
        write_table(docs.where(F.col("doc_id") % 5 != 0), src)
        L.build_lsh_index(spark, src, idx, n_buckets=8)
        append_rows(spark, src, docs.where(F.col("doc_id") % 5 == 0))
        L.refresh_lsh_index(spark, src, idx)
        delete_where(spark, src, F.col("doc_id").isin(447, 290))
        L.refresh_lsh_index(spark, src, idx)

        bands = read_table_partitions(
            spark, L._bands_dir(idx), [f"b{i}" for i in range(8)]
        ).select(
            F.lit("lshbands").alias("q"),
            F.concat_ws("|", "id", "band", "band_hash").alias("row_key"),
            F.lit("member").alias("measure"),
            F.lit(1.0).alias("v_num"),
        )
        pairs = L.lsh_index_query_df(
            spark, idx, docs.where(F.col("doc_id") % 7 == 0),
            "doc_id", "text", threshold=0.35,
        ).select(
            F.lit("lshprobe").alias("q"),
            F.concat_ws("|", "probe_id", "id").alias("row_key"),
            F.lit("est_sim").alias("measure"),
            F.col("est_sim").alias("v_num"),
        )
        return bands.unionByName(pairs).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)


@query("q_kmeans_assign", oracle=golden_oracle("q_kmeans_assign"))
def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (operators/kmeans.py): every point in every
    update, bit-reproducible across partitionings via int64-quantized mean
    aggregation — the full-corpus upgrade of the IVF sample trainer."""
    from spookystuff_spark.operators.kmeans import kmeans_assign

    emb = table(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=16, n_iter=5)


@query(
    "q_doc_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents
    ), meta AS (
      SELECT doc_id, toks,
             CAST(greatest(ceil((len(toks) - 64) / 48.0) + 1, 1) AS INTEGER) AS n_chunks
      FROM t
    )
    SELECT doc_id,
           CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(toks[i*48 + 1 : i*48 + 64], ' ') AS chunk
    FROM meta, unnest(range(0, n_chunks)) AS u(i)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token chunks with stride 48 — exploded one row per
    chunk, entirely JVM-side (regexp tokenize → sequence → slice)."""
    from spookystuff_spark.operators.text import chunk_expr

    docs = table(spark, sf_dir, "documents")
    chunked = docs.select(
        "doc_id",
        F.posexplode(chunk_expr(F.col("text"), 64, 48)).alias("chunk_idx", "chunk"),
    )
    return chunked.select(
        "doc_id", F.col("chunk_idx").cast("int").alias("chunk_idx"), "chunk"
    )
