"""Incremental benchmark-decontamination index over the lakehouse.

The batch operator (``operators/ngram.decontaminate``) re-tokenizes the
benchmark per run; the realistic 100-TB shape is a STANDING eval-set gram
index that every nightly crawl batch is checked against. The index is a
counted gram support Z-set: one row per live benchmark n-gram key
``(gram_key bigint, _n bigint)`` where ``_n`` counts the (benchmark doc ×
distinct gram) pairs currently carrying it — laid out by GRAM-HASH BUCKET
through the same keyed machinery as the aggregate IVM
(``sources/incremental.py``: ``_keyed_slice`` / ``_fold_support`` /
``_commit_keyed``), so each refresh rewrites only the buckets its delta
touches and a gram leaves the index exactly when its last benchmark doc
does.

Because the fold is a SIGNED GRAM DELTA (insert/postimage grams +1,
preimage/delete grams −1, summed per key), every feed shape composes
exactly in ONE fold per refresh — inserts, deletes, AND preimage-logged
updates (an updated eval doc retracts its old grams and contributes its
new ones in the same commit); no per-version replay and no update
refusal, unlike the BM25/LSH indexes whose payload rows can't be signed.
Exactly-once per source version via the ``_SRC_`` watermark; feed-less
source versions advance O(1).

The check is one join: the probe docs' gram stream (pure Catalyst —
``token_ngram_keys``, zero Python) against the index's live keys. The
index side is eval-set-sized (MBs against a TB corpus), so AQE broadcasts
it; for SMALL probe batches ``prune=True`` reads only the probed grams'
buckets through the manifest (at the price of tokenizing the probe side
twice — leave it off for corpus-sized checks).

Reference scope: the reference has no hygiene surface; this composes the
rebuild's own n-gram stack (Lee et al. exact-substring dedup semantics)
with its lakehouse — public ideas only.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio
from spookystuff_spark.operators.ngram import doc_grams, token_ngram_keys
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    _POS,
    _SRC_MARK,
    _bucket_expr,
    _changes_since,
    _commit_keyed,
    _fold_support,
    _keyed_slice,
    advance_watermark,
    agg_layout,
    last_processed_version,
)

_PARAMS = "_DECONTAM_PARAMS.json"
_KEY = ["gram_key"]


def index_params(index_dir: str) -> dict:
    return json.loads(fsio.read_bytes(fsio.join(index_dir, _PARAMS)))


def _signed_gram_delta(
    changes: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """Per-gram signed count delta of a change-feed batch: each feed row
    contributes its DISTINCT grams (``array_distinct`` inside codegen —
    the per-doc distinctness contract of ``doc_grams``) with +1 for
    insert/upsert-postimage rows and −1 for preimage/delete rows, summed
    per key. Grams whose net change is zero (an update that left some
    spans intact) drop out before touching any bucket."""
    sign = F.when(F.col("_change").isin(*_POS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    g = changes.select(
        sign.alias("_s"),
        F.explode(
            F.array_distinct(token_ngram_keys(F.col(text_col), n))
        ).alias("gram_key"),
    )
    return (
        g.groupBy("gram_key")
        .agg(F.sum("_s").alias("_dn"))
        .where(F.col("_dn") != 0)
    )


def build_decontam_index(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    n_buckets: int = 8,
) -> str:
    """Tokenize the current benchmark snapshot into the bucket-laid gram
    support table. Returns the index version; the source watermark rides
    the commit so a follow-up :func:`refresh_decontam_index` starts
    exactly after this snapshot."""
    src_v = U.committed_versions(src_dir)[-1]
    docs = U.read_table(spark, src_dir)
    merged = (
        doc_grams(docs, id_col, text_col, n)
        .groupBy("gram_key")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    fsio.mkdirs(index_dir)
    fsio.write_bytes(
        fsio.join(index_dir, _PARAMS),
        json.dumps(
            {"n": n, "id_col": id_col, "text_col": text_col}
        ).encode(),
    )
    return _commit_keyed(
        merged, index_dir, _KEY, n_buckets, f"{_SRC_MARK}{src_v}"
    )


def refresh_decontam_index(
    spark: SparkSession, src_dir: str, index_dir: str
) -> str | None:
    """Fold benchmark changes since the watermark into the gram index —
    ONE signed fold for the whole backlog (no per-version replay: the
    delta is additive, so inserts, deletes and preimage-logged updates
    all compose in a single commit), touching only the buckets the
    changed grams hash into. Returns the new index version, or None when
    the source has nothing new. Preimage-less upsert feeds refuse inside
    the feed walk (the old grams could not be retracted)."""
    p = index_params(index_dir)
    after = last_processed_version(index_dir)
    changes, newest = _changes_since(
        spark, src_dir, after, requested_cols=[p["id_col"], p["text_col"]]
    )
    if newest is None:
        return None
    marker = f"{_SRC_MARK}{newest}"
    if changes is None:
        return advance_watermark(index_dir, marker)
    n_buckets, _ = agg_layout(index_dir)
    if n_buckets is None:
        raise ValueError(
            f"{index_dir}: keyed layout record missing (not a decontam "
            "index, or a maintenance commit dropped it) — rebuild with "
            "build_decontam_index"
        )
    delta = _signed_gram_delta(
        changes, p["id_col"], p["text_col"], p["n"]
    ).persist()  # the touched-bucket collect and the fold both read it
    try:
        current, touched, cur, rel = _keyed_slice(
            spark, index_dir, delta, _KEY, n_buckets, keyed_layout=True
        )
        merged = _fold_support(
            current, delta.select("gram_key", "_dn"), _KEY
        )
        return _commit_keyed(
            merged, index_dir, _KEY, n_buckets, marker,
            touched=touched, cur=cur, rel=rel,
        )
    finally:
        delta.unpersist()


def decontam_check_df(
    spark: SparkSession,
    index_dir: str,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prune: bool = False,
) -> DataFrame:
    """Per probe doc, the number of DISTINCT indexed n-grams it shares
    with the standing benchmark — ``(id_col, contaminated_grams)`` for
    docs with ≥ 1 hit, the industry 13-gram overlap rule answered FROM
    THE INDEX (the benchmark is never re-tokenized). The probe side's
    gram stream is pure Catalyst; the join against the live gram keys is
    AQE-sized (the index is the eval-set-sized small side — broadcast
    for a corpus check). ``prune=True``: additionally restrict the index
    read to the probe grams' own buckets via the manifest (a bounded
    ≤ n_buckets collect) — right for small batches, wasteful for
    corpus-sized ones (it evaluates the probe tokenization twice)."""
    p = index_params(index_dir)
    grams = doc_grams(docs, id_col, text_col, p["n"])
    if prune:
        from spookystuff_spark.sources.partitioned_table import (
            read_table_partitions,
        )

        n_buckets, _ = agg_layout(index_dir)
        buckets = sorted(
            r[0]
            for r in grams.select(
                _bucket_expr(_KEY, n_buckets).cast("string").alias("_b")
            )
            .distinct()
            .collect()
        )
        idx = read_table_partitions(spark, index_dir, buckets)
    else:
        idx = U.read_table(spark, index_dir)
    return (
        grams.join(idx.select("gram_key"), "gram_key", "leftsemi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_grams"))
    )


def streaming_refresh_sink(src_dir: str, index_dir: str):
    """``foreachBatch`` body keeping the decontamination index
    CONTINUOUSLY fresh from the benchmark table's CDC stream — the
    ``_SRC_`` watermark (not the stream checkpoint) is the source of
    truth, so replays and restarts are exactly-once (the
    ``sources/incremental.streaming_refresh_sink`` contract)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_decontam_index(batch_df.sparkSession, src_dir, index_dir)

    return sink
