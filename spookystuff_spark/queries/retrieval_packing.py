"""Retrieval + training-data-assembly queries: BM25 top-k search, GPT-style
sequence packing, and deterministic hash splits — the last-mile operators a
pretraining pipeline runs after curation (operators/retrieval.py,
operators/packing.py).

All three are pure Catalyst plans with full DuckDB SQL oracles (integer
arithmetic or round-stable doubles), so they sit in the strongest tier of the
correctness gate.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.operators.packing import (
    hash_split,
    hash_split_case_sql,
    pack_sequences,
    pack_sequences_sql,
    token_count,
)
from spookystuff_spark.operators.retrieval import bm25_topk, bm25_topk_sql
from spookystuff_spark.queries import bench_only, query
from spookystuff_spark.queries.tpch_suites import _melt, _melt_sql
from spookystuff_spark.tables import shared_scans, table

# Fixed benchmark queries over the synthetic query-engine vocabulary.
BM25_QUERIES = [
    (1, "hash join strategy"),
    (2, "window agg stream"),
    (3, "slow scan filter"),
    (4, "vector batch spark"),
]

SEQ_LEN = 256
N_SHARDS = 8


@query(
    "q_retrieval_bm25",
    oracle=bm25_topk_sql("SELECT * FROM documents", BM25_QUERIES, k=10),
)
def q_retrieval_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_QUERIES, k=10)


@bench_only("q_pack_sequences")
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return pack_sequences(docs, seq_len=SEQ_LEN, n_shards=N_SHARDS)


@bench_only("q_train_split")
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split composition: (split, lang) doc + token counts — verifies both the
    assignment and that it is independent of corpus order."""
    docs = table(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("n_tokens"),
        )
    )


@bench_only("q_bm25_index")
def q_bm25_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental BM25 inverted index over the lakehouse, gate-pinned
    end-to-end (operators/bm25_index.py): build the bucket-partitioned
    postings table on the doc_id%4!=0 base corpus, fold the %4==0 batch in
    FROM THE CHANGE FEED (one O(batch) tokenize + one O(batch) partitioned
    append — never an index rewrite), then answer the standard BM25_QUERIES
    AS A DATAFRAME through the manifest-pruned bucket reader
    (``bm25_index_topk_df`` — JVM-side tokenization, no query collect;
    the r10 DataFrame-probe surface, gated here). The oracle is the SAME
    full-corpus SQL as q_retrieval_bm25 — the index must be score-for-score
    indistinguishable from a corpus scan."""
    import shutil
    import tempfile

    from spookystuff_spark.operators import bm25_index as BX
    from spookystuff_spark.sources.upsert import append_rows, write_table

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    src = tempfile.mkdtemp(prefix="spooky-bmsrc-")
    idx = tempfile.mkdtemp(prefix="spooky-bmidx-")
    try:
        write_table(docs.where(F.col("doc_id") % 4 != 0), src)
        BX.build_bm25_index(spark, src, idx, n_buckets=8)
        append_rows(spark, src, docs.where(F.col("doc_id") % 4 == 0))
        BX.refresh_bm25_index(spark, src, idx)
        qdf = spark.createDataFrame(BM25_QUERIES, "query_id int, text string")
        res = BX.bm25_index_topk_df(spark, idx, qdf, k=10)
        return res.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(idx, ignore_errors=True)


_SPLIT_SQL = f"""
    SELECT {hash_split_case_sql('doc_id')} AS split, lang,
           count(*) AS n_docs,
           CAST(sum(len(regexp_extract_all(lower(text), '\\S+'))) AS BIGINT)
             AS n_tokens
    FROM documents GROUP BY 1, 2"""

_PACK_SPLIT_SQL = f"""
WITH pk AS ({pack_sequences_sql("SELECT * FROM documents", SEQ_LEN, N_SHARDS)}),
     sp AS ({_SPLIT_SQL}),
     bmx AS ({bm25_topk_sql("SELECT * FROM documents", BM25_QUERIES, k=10)})
{_melt_sql(
    "pk", "q_pack_sequences", ["shard", "seq_id", "doc_id"],
    ["seq_off", "tok_start", "tok_end", "n_tok"],
)}
UNION ALL {_melt_sql("sp", "q_train_split", ["split", "lang"],
                     ["n_docs", "n_tokens"])}
UNION ALL {_melt_sql("bmx", "q_bm25_index", ["query_id", "rank", "doc_id"],
                     ["score"])}"""


@query("q_pack_split_suite", oracle=_PACK_SPLIT_SQL)
def q_pack_split_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    with shared_scans(spark, sf_dir, ("documents",)):
        return _pack_split_parts(spark, sf_dir)


def _pack_split_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.queries import build_concurrently

    # thunks: q_bm25_index builds a temp index eagerly — overlap it with
    # the lazy pack/split plan construction (guide §2.6)
    makers = [
        lambda: _melt(
            q_pack_sequences(spark, sf_dir),
            "q_pack_sequences",
            ["shard", "seq_id", "doc_id"],
            ["seq_off", "tok_start", "tok_end", "n_tok"],
        ),
        lambda: _melt(
            q_train_split(spark, sf_dir),
            "q_train_split",
            ["split", "lang"],
            ["n_docs", "n_tokens"],
        ),
        lambda: _melt(
            q_bm25_index(spark, sf_dir),
            "q_bm25_index",
            ["query_id", "rank", "doc_id"],
            ["score"],
        ),
    ]
    return reduce(DataFrame.unionByName, build_concurrently(makers, spark))


from spookystuff_spark.queries import register_suite  # noqa: E402

register_suite(
    "q_pack_split_suite",
    ["q_pack_sequences", "q_train_split", "q_bm25_index"],
)
