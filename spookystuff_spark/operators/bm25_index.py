"""Incremental BM25 (inverted-index) maintenance over the lakehouse.

The index IS a partitioned versioned table of postings
``(doc_id, term, tf, dl)`` laid out by TERM-HASH BUCKET
(``sources/partitioned_table.py``, partition col = ``bucket``), with the
corpus-global scoring stats (``n_docs``, ``total_dl``) recorded in the
same manifest the data commit writes — stats and postings can never
drift. Maintenance reads the DOCUMENT SOURCE'S CHANGE FEED: a new batch
of documents costs one O(batch) tokenize pass plus one O(batch)
``append_partitioned`` commit (postings for new docs are pure inserts —
a document's terms hash into every bucket, which is exactly why the
append primitive exists: a touched-slice MERGE would rewrite the whole
index per batch). Queries resolve their terms' buckets driver-side and
read ONLY those buckets' files through the manifest-pruned partition
reader, so a lookup never lists or opens the rest of the index.

Because BM25 needs exact per-term document frequencies, bucketing by
``hash(term)`` guarantees every posting of a term lives in one bucket —
df(term) computed inside the probed slice is exact, and with the
manifest-carried (n_docs, total_dl) the scores are BIT-IDENTICAL to a
full-corpus :func:`operators.retrieval.bm25_topk` pass (the property the
tests and the correctness gate pin).

Freshness is exactly-once per source version via the same
``_SRC_<version>`` watermark idiom as sources/incremental.py. Feeds may
be INSERT- or DELETE-shaped: deletes fold as an O(deleted) key deletion
vector (a doc's postings are keyed by exactly the id the feed names —
zero index IO) with the corpus stats retracted in the SAME commit, so a
PII/takedown purge never costs a rebuild. UPDATE-shaped feeds raise
(old and new postings share the doc id, which a table-level key vector
cannot tell apart) — such feeds rebuild instead.

Reference scope: the reference fetches documents but has no ranking
surface (operators/retrieval.py docstring); this composes the rebuild's
own BM25 scorer with its lakehouse — public Lucene/Delta ideas only.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.functions.rounding import round_stable
from spookystuff_spark.operators.retrieval import B, K1, WORD_RE, postings
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    _SRC_MARK,
    _changes_since,
    feed_has_duplicate_ids,
    insert_only_runs,
    last_processed_version,
    newest_marker,
)
from spookystuff_spark.sources.partitioned_table import (
    append_partitioned,
    read_table_partitions,
    write_table_partitioned,
)

_STATS = "bm25_stats"


def _bucketed_postings(
    docs: DataFrame, id_col: str, text_col: str, n_buckets: int
) -> DataFrame:
    return postings(docs, id_col, text_col).withColumn(
        "bucket",
        F.concat(F.lit("b"), (F.crc32(F.col("term")) % n_buckets).cast("string")),
    )


def _stats_of(post: DataFrame) -> dict:
    """{n_docs, total_dl} for a postings frame — docs with ≥1 token only
    (the same universe bm25_topk's length frame spans). One tiny agg."""
    row = (
        post.select("doc_id", "dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("dl"), F.lit(0)).alias("t"),
        )
        .first()
    )
    return {"n_docs": int(row["n"]), "total_dl": int(row["t"])}


def index_stats(index_dir: str) -> dict:
    m = U._read_manifest_raw(
        index_dir, U.committed_versions(index_dir)[-1]
    )  # stats are raw top-level: no fold
    return m[_STATS]


def build_bm25_index(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> str:
    """Tokenize the current source snapshot into the bucket-partitioned
    postings table. Returns the index version; the source watermark rides
    the commit so a follow-up :func:`refresh_bm25_index` starts exactly
    after this snapshot."""
    src_v = U.committed_versions(src_dir)[-1]
    docs = U.read_table(spark, src_dir)
    post = _bucketed_postings(docs, id_col, text_col, n_buckets)
    # the frame feeds both the stats agg and the layout write — pin it so
    # tokenization runs once (repo-wide eager-checkpoint recipe)
    post = post.localCheckpoint(eager=True)
    write_table_partitioned(
        post, index_dir, "bucket",
        marker=f"{_SRC_MARK}{src_v}", change_feed=False,
        extra_fields={_STATS: _stats_of(post), "n_buckets": n_buckets},
    )
    return U.committed_versions(index_dir)[-1]


# append-step marker for mixed insert+delete folds — deliberately NOT a
# `_SRC_` prefix (newest_marker prefix-matches; the real watermark parse
# must never see step suffixes)
_STEP_MARK = "_SRCSTEP_"


def _fold_bm25_version(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    changes,
    src_v: str,
    id_col: str,
    text_col: str,
) -> None:
    """Apply one source version's feed to the postings table: append the
    new docs' postings (stats advanced additively in the same manifest),
    then DV-delete the removed docs with the stats RETRACTED in the same
    commit. The real ``_SRC_`` watermark rides the FINAL commit; the
    append step is skip-guarded by an auxiliary ``_SRCSTEP_`` marker, so
    a crash anywhere heals by re-running exactly this version."""
    from spookystuff_spark.sources.upsert import delete_by_keys

    wm = last_processed_version(index_dir)
    if wm is not None and U._vnum(wm) >= U._vnum(src_v):
        return  # already covered (crash heal)
    kinds = {r[0] for r in changes.select("_change").distinct().collect()}
    if kinds - {"insert", "delete"}:
        raise ValueError(
            f"{src_dir}/{src_v}: BM25 index refresh folds insert/delete "
            f"feeds — got kinds {sorted(kinds)}; a rewritten document's "
            "old and new postings share its id (a key vector can't hide "
            "one without the other), rebuild instead"
        )
    cur = U.committed_versions(index_dir)[-1]
    m = U._read_manifest_raw(index_dir, cur)  # raw keys only: no fold
    prev, n_buckets = dict(m[_STATS]), m["n_buckets"]
    changes = changes.localCheckpoint(eager=True)  # feeds several jobs
    marker = f"{_SRC_MARK}{src_v}"

    del_rows = None
    if "delete" in kinds:
        # the id keeps its SOURCE type: postings() never casts, so the
        # stored table's doc_id is source-typed — a cast("long") here
        # would NULL every string id, collapse the dedup to one row and
        # write a deletion vector that matches nothing
        del_rows = (
            changes.where(F.col("_change") == "delete")
            .select(
                F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("__text"),
            )
            .dropDuplicates(["doc_id"])
            .localCheckpoint(eager=True)
        )
    if "insert" in kinds:
        ins = changes.where(F.col("_change") == "insert")
        if del_rows is not None and (
            ins.select(F.col(id_col).alias("doc_id"))
            .join(del_rows, "doc_id", "leftsemi")
            .limit(1)
            .count()
        ):
            # unreachable through the public writers (one commit = one
            # kind); a hand-built mixed feed has no row order — refuse
            raise ValueError(
                f"{src_dir}/{src_v}: a document is both inserted and "
                "deleted inside one source version — the feed carries no "
                "row order; rebuild instead"
            )
        if U.dv_contains_keys(
            spark, index_dir,
            ins.select(F.col(id_col).alias("doc_id")),
        ):
            raise ValueError(
                f"{index_dir}: re-inserting a document the index's "
                "deletion vector currently hides — the vector would hide "
                "the new postings too; run compact_bm25_index(..., "
                "force_dv=True) to materialize the vectors, then refresh "
                "again"
            )
        step = newest_marker(index_dir, _STEP_MARK)
        if step is None or U._vnum(step) < U._vnum(src_v):
            post = _bucketed_postings(
                ins.select(id_col, text_col), id_col, text_col, n_buckets
            ).localCheckpoint(eager=True)
            delta = _stats_of(post)
            prev = {
                "n_docs": prev["n_docs"] + delta["n_docs"],
                "total_dl": prev["total_dl"] + delta["total_dl"],
            }
            append_partitioned(
                spark, index_dir, post, "bucket",
                marker=(f"{_STEP_MARK}{src_v}" if del_rows is not None
                        else marker),
                change_feed=False,
                extra_fields={_STATS: prev, "n_buckets": n_buckets},
            )
        else:
            # crash heal: the append already landed with these stats
            prev = dict(
                U._read_manifest_raw(
                    index_dir, U.committed_versions(index_dir)[-1]
                )[_STATS]
            )
        if del_rows is None:
            return
    # exact retraction: the deleted docs' dl through the SAME tokenize
    # pass the build used (docs with >=1 token only)
    retract = _stats_of(postings(del_rows, "doc_id", "__text"))
    delete_by_keys(
        spark, index_dir, del_rows.select("doc_id"), ["doc_id"],
        marker=marker,
        extra_fields={
            _STATS: {
                "n_docs": prev["n_docs"] - retract["n_docs"],
                "total_dl": prev["total_dl"] - retract["total_dl"],
            },
            "n_buckets": n_buckets,
        },
    )


def refresh_bm25_index(
    spark: SparkSession,
    src_dir: str,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str | None:
    """Fold source changes since the watermark into the index — a
    PER-VERSION replay (same discipline as the LSH index): each pending
    source version folds on its own (postings for its new documents as
    one O(batch) partitioned append with the stats advanced additively;
    its deleted documents as an O(deleted) key deletion vector with the
    stats retracted in the SAME commit), and its ``_SRC_`` watermark
    lands before the next version starts — so a crash heals by skipping
    covered versions, never by re-folding a batch whose extent grew
    under it, and a doc deleted in one version and re-anything'd later
    is two separate folds. CONTIGUOUS ``append``-kind versions (pure
    insert feeds) batch into ONE fold (``insert_only_runs``): K crawl
    batches between refreshes cost one tokenize pass and one atomic
    index commit, not K — value-identical to the per-version replay
    because inserts commute, except when one doc id repeats across the
    run's versions (its postings would collapse in the batched tokenize
    where per-version appends both) — that run falls back to
    per-version (``feed_has_duplicate_ids``). Returns the new index
    version, or None when the source has nothing the index can see.
    Refusals: update-shaped feeds (rebuild) and re-insert of a
    DV-hidden doc (``compact_bm25_index(..., force_dv=True)`` heals)."""
    wm = last_processed_version(index_dir)
    pending = [
        v
        for v in U.committed_versions(src_dir)
        if wm is None or U._vnum(v) > U._vnum(wm)
    ]
    if not pending:
        return None
    prev_v, committed = wm, False
    meta_cache: dict = {}  # O(pending) metadata reads across the replay

    def _fold_one(after: str | None, v: str) -> None:
        nonlocal committed
        # the fold consumes only (id_col, text_col): a drop of any other
        # source column must not stall the refresh (column-pruned walk)
        changes, _ = _changes_since(
            spark, src_dir, after, requested_cols=[id_col, text_col],
            until=v, meta_cache=meta_cache,
        )
        if changes is None:
            return  # feed-less version: the next fold's marker covers it
        _fold_bm25_version(
            spark, src_dir, index_dir, changes, v, id_col, text_col
        )
        committed = True

    for run in insert_only_runs(src_dir, pending, meta_cache):
        if len(run) == 1:
            _fold_one(prev_v, run[0])
            prev_v = run[0]
            continue
        changes, _ = _changes_since(
            spark, src_dir, prev_v, requested_cols=[id_col, text_col],
            until=run[-1], meta_cache=meta_cache,
        )
        if changes is not None and feed_has_duplicate_ids(changes, id_col):
            sub_prev = prev_v
            for v in run:  # per-version fallback: exact under duplicates
                _fold_one(sub_prev, v)
                sub_prev = v
        elif changes is not None:
            _fold_bm25_version(
                spark, src_dir, index_dir, changes, run[-1], id_col, text_col
            )
            committed = True
        prev_v = run[-1]
    return U.committed_versions(index_dir)[-1] if committed else None


def _score_slice(
    slice_df: DataFrame,
    qterms: DataFrame,
    stats: dict,
    k: int,
    hint_small_queries: bool,
) -> DataFrame:
    """Okapi BM25 scoring of a probed postings slice against distinct
    (query_id, term) pairs: df(term) exact within the slice (a term's
    postings all share its bucket), (n_docs, avgdl) from the manifest
    stats, bounded window-rank top-k. ``hint_small_queries`` broadcast-
    hints the query side (the list entry point's small-by-contract case);
    the DataFrame entry point leaves strategy to AQE."""
    from pyspark.sql.window import Window

    maybe_b = F.broadcast if hint_small_queries else (lambda df: df)
    tf_q = slice_df.join(
        maybe_b(qterms.select("term").distinct()), "term", "leftsemi"
    )
    df_term = tf_q.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(stats["n_docs"]) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    avgdl = float(stats["total_dl"]) / stats["n_docs"]
    tf_part = (F.col("tf") * (K1 + 1)) / (
        F.col("tf") + K1 * (1 - B + B * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        tf_q.join(maybe_b(qterms), "term")
        .join(maybe_b(df_term), "term")
        .groupBy("query_id", "doc_id")
        .agg(round_stable(F.sum(idf * tf_part), 4).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def bm25_index_topk(
    spark: SparkSession,
    index_dir: str,
    queries: Sequence[tuple[int, str]],
    k: int = 10,
) -> DataFrame:
    """Okapi BM25 top-k per query, answered FROM THE INDEX — thin
    list-shaped wrapper over :func:`bm25_index_topk_df`, the ONE probe
    pipeline (r10 punch #1: the driver-side ``re.findall`` tokenizer copy
    is gone, so both entry points tokenize with the index's own Spark
    expression by construction). Output (query_id, rank, doc_id, score)
    is bit-identical to ``bm25_topk(corpus, queries, k)``."""
    qdf = spark.createDataFrame(
        [(int(qid), str(qtext)) for qid, qtext in queries],
        "query_id int, text string",
    )
    return bm25_index_topk_df(
        spark, index_dir, qdf, k=k, id_col="query_id", text_col="text"
    )


def bm25_index_topk_df(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """THE BM25 probe pipeline (``bm25_index_topk`` is a thin list-shaped
    wrapper over it), shaped for the standing-corpus retrieval case where
    the queries are themselves a table — e.g. scoring every document of
    tonight's crawl against the indexed corpus. Output
    ``(query_id, rank, doc_id, score)``, with zero driver tokenization
    and no query collect:

    * query terms tokenize JVM-side with the SAME Spark expression the
      index build uses (``operators.retrieval.terms`` semantics) — probe
      and index tokenization can never disagree, whatever the locale's
      case-folding rules do (the r10 guarantee was "identical to Python
      ``re.findall`` on ASCII"; index-side consistency is the one that
      actually matters and now holds by construction);
    * the bucket collect gathers only DISTINCT BUCKET IDS (bounded by the
      index's ``n_buckets``, never by query count), so a small batch
      still reads only its terms' buckets through the manifest-pruned
      reader while a vocabulary-covering batch degrades gracefully to
      reading them all;
    * no broadcast hints — AQE picks strategies from actual sizes (a
      skewed ultra-common term is handled by AQE skew-join like any
      other hot key).

    The window top-k shuffles on ``query_id``, which is the output's own
    cardinality — the unavoidable term."""
    cur = U.committed_versions(index_dir)[-1]
    m = U._read_manifest_raw(index_dir, cur)  # raw keys only: no fold
    stats, n_buckets = m[_STATS], m["n_buckets"]
    qterms = (
        queries_df.select(
            F.col(id_col).alias("query_id"),
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(WORD_RE), 1
                )
            ).alias("term"),
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds the bucket collect + scoring
    )
    buckets = sorted(
        r[0]
        for r in qterms.select(
            F.concat(
                F.lit("b"),
                (F.crc32(F.col("term")) % n_buckets).cast("string"),
            ).alias("_b")
        )
        .distinct()
        .collect()
    )
    # an all-empty query batch reads zero files and scores an empty slice
    # (read_table_partitions falls back to the manifest schema)
    slice_df = read_table_partitions(spark, index_dir, buckets)
    return _score_slice(slice_df, qterms, stats, k, hint_small_queries=False)


def streaming_refresh_sink(
    src_dir: str,
    index_dir: str,
    max_files_per_bucket: int | None = None,
    **refresh_kwargs,
):
    """``foreachBatch`` body keeping the BM25 index CONTINUOUSLY fresh from
    the ``spooky_versioned`` CDC stream: every micro-batch triggers
    :func:`refresh_bm25_index`; the ``_SRC_`` watermark (not the stream
    checkpoint) is the source of truth, so replays and restarts are
    exactly-once — same contract as
    ``sources/incremental.streaming_refresh_sink``.
    ``max_files_per_bucket``: also run :func:`compact_bm25_index` in-sink
    after each refresh, so a long-running stream's read amplification
    stays bounded without an external OPTIMIZE job."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_bm25_index(
            batch_df.sparkSession, src_dir, index_dir, **refresh_kwargs
        )
        if max_files_per_bucket is not None:
            compact_bm25_index(
                batch_df.sparkSession, index_dir, max_files_per_bucket
            )

    return sink


def rebucket_bm25_index(
    spark: SparkSession, index_dir: str, n_buckets: int
) -> str | None:
    """Re-seed the postings table at a new term-bucket count: one read
    through the current snapshot (deletion vectors materialize away) +
    one bucket-relaid snapshot rewrite, stats carried and the ``_SRC_``
    watermark re-stamped so exactly-once refresh survives — the
    ``incremental.rebucket`` counterpart for the inverted index (an
    index seeded at 8 buckets that grew 1000× otherwise rebuilds by
    hand; probes resolve ≤ |query terms| buckets either way, but bucket
    count bounds the per-bucket file slice a probe must open). No-op
    (None) at the current count."""
    cur = U.committed_versions(index_dir)[-1]
    m = U._read_manifest_raw(index_dir, cur)  # raw keys only: no fold
    if int(m["n_buckets"]) == int(n_buckets):
        return None
    from spookystuff_spark.sources.incremental import resolve_restamp_marker

    marker = resolve_restamp_marker(index_dir, "rebucket")
    rows = U.read_table(spark, index_dir).withColumn(
        "bucket",
        F.concat(
            F.lit("b"), (F.crc32(F.col("term")) % int(n_buckets)).cast("string")
        ),
    )
    write_table_partitioned(
        rows, index_dir, "bucket",
        marker=marker, change_feed=False,
        extra_fields={_STATS: dict(m[_STATS]), "n_buckets": int(n_buckets)},
    )
    return U.committed_versions(index_dir)[-1]


def compact_bm25_index(
    spark: SparkSession,
    index_dir: str,
    max_files_per_bucket: int = 8,
    force_dv: bool = False,
) -> str | None:
    """OPTIMIZE-when-fragmented for the postings table: every refresh
    appends ~one file per bucket, so after N batches a probe opens N files
    per probed bucket — compaction folds each bucket back to one. The
    corpus stats carry through the content-preserving commit
    (``carry_extra_fields``), and the ``_SRC_`` watermark is RE-STAMPED on
    the compacted version so the exactly-once contract survives a later
    ``vacuum`` of the marker's original commit. Manifest-only check;
    None when nothing is fragmented. ``force_dv=True`` additionally
    compacts when the deletion vector is non-empty even if nothing is
    fragmented — the rewrite reads through the DV-applied snapshot, so
    it MATERIALIZES the deletes and clears the vector (the heal
    :func:`refresh_bm25_index` names before a deleted doc can be
    re-inserted)."""
    from spookystuff_spark.sources.partitioned_table import (
        compact_auto_partitioned,
    )

    wm = last_processed_version(index_dir)
    return compact_auto_partitioned(
        spark, index_dir, "bucket",
        max_files_per_partition=max_files_per_bucket,
        force_dv=force_dv,
        marker=f"{_SRC_MARK}{wm}" if wm else None,
    )
