"""Incremental sketch rollups over the lakehouse.

The batch sketch operators (``operators/sketch.py``) rescan the corpus
per run; the realistic 100-TB shape is a STANDING sketch table every
ingest batch folds into — continuously-fresh estimates without ever
re-reading history. Two views, completing the repo's sketch-IVM lattice
taxonomy alongside the counted-support Z-sets of
``sources/incremental.py``:

* **HLL register view** (``build_hll_view``/``refresh_hll_view``) —
  "distinct users per group, continuously fresh". The view IS the
  register table: one row per live ``(group, reg)`` with ``rho`` = the
  max leading-zero rank ever observed, laid out by GROUP-HASH BUCKET
  through the same keyed machinery as the aggregate IVM
  (``_keyed_slice`` / ``_fold_max`` / ``_commit_keyed``), so each
  refresh rewrites only the buckets its delta's groups hash into and
  the table is bounded by ``groups × 2^p`` rows — never corpus size.
  Registers form a MONOTONE max-lattice: insert feeds compose as a
  per-key max-merge (associative, commutative, idempotent — the
  standing view is BIT-IDENTICAL to a from-scratch ``hll_estimate``
  over the live corpus, the property the tests pin); delete/update
  feeds REFUSE (a max cannot be un-taken — when retractions matter,
  use ``refresh_distinct``'s exact counted Z-set; the same
  monotonicity boundary Delta-style aggregate IVM draws for MIN/MAX).

* **CMS token-frequency view** (``build_cms_token_view``/
  ``refresh_cms_token_view``) — "term frequencies over the live corpus,
  continuously fresh". Count-Min counters are LINEAR (a counter is a
  sum of signed contributions), so unlike the HLL lattice this view
  composes EVERY feed shape in one signed fold: insert/postimage token
  occurrences +1, preimage/delete occurrences −1, summed per
  ``(j, bucket)`` — the ``decontam_index`` construction applied to the
  sketch grid, riding :func:`incremental._fold_support` verbatim (a
  counter leaves the table at zero, and reads coalesce absent to 0).
  State is bounded by ``depth × width`` rows regardless of vocabulary,
  and the standing view equals a from-scratch ``cms_sketch`` over the
  live corpus for ANY insert/update/delete history.

Both: exactly-once per source version via the ``_SRC_`` watermark;
feed-less versions advance O(1); streaming CDC sinks; ``rebucket()``
re-lays like any keyed derived table.

Reference scope: the reference has no sketch or view-maintenance
machinery; this composes the rebuild's own sketch stack (Flajolet et
al. 2007; Cormode & Muthukrishnan 2005) with its lakehouse — public
ideas only.
"""

from __future__ import annotations

import json
from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio
from spookystuff_spark.operators.sketch import (
    _cms_bucket,
    cms_query,
    hll_finish,
    hll_registers,
)
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    _POS,
    _SRC_MARK,
    _changes_since,
    _commit_keyed,
    _fold_max,
    _fold_support,
    _keyed_slice,
    advance_watermark,
    agg_layout,
    last_processed_version,
)

_PARAMS = "_HLL_PARAMS.json"
_CMS_PARAMS = "_CMS_PARAMS.json"


def hll_view_params(dst_dir: str) -> dict:
    return json.loads(fsio.read_bytes(fsio.join(dst_dir, _PARAMS)))


def build_hll_view(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    group_cols: Sequence[str],
    value_col: str,
    p: int = 12,
    dst_buckets: int = 8,
) -> str:
    """Seed the register view from the current source snapshot. Returns
    the view version; the source watermark rides the commit so a
    follow-up :func:`refresh_hll_view` starts exactly after this
    snapshot. ``p`` ∈ [4, 12]: 2^p registers per group — the standard
    precision/space dial (p=12 → ~1.6% relative error, ≤ 4096 rows per
    group)."""
    src_v = U.committed_versions(src_dir)[-1]
    regs = hll_registers(
        U.read_table(spark, src_dir), list(group_cols), value_col, p
    )
    fsio.mkdirs(dst_dir)
    fsio.write_bytes(
        fsio.join(dst_dir, _PARAMS),
        json.dumps(
            {
                "group_cols": list(group_cols),
                "value_col": value_col,
                "p": int(p),
            }
        ).encode(),
    )
    return _commit_keyed(
        regs, dst_dir, list(group_cols), dst_buckets, f"{_SRC_MARK}{src_v}"
    )


def refresh_hll_view(
    spark: SparkSession, src_dir: str, dst_dir: str
) -> str | None:
    """Fold source changes since the watermark into the register view —
    ONE max-merge for the whole backlog (inserts commute and the merge is
    idempotent, so no per-version replay is ever needed), touching only
    the buckets the changed groups hash into. Returns the new view
    version, or None when the source has nothing new.

    Refusals: any feed carrying ``update_preimage`` or ``delete`` rows —
    the register lattice is monotone and cannot retract (the exact
    counterpart under deletes is ``refresh_distinct``); preimage-less
    upserts past the baseline already refuse inside the feed walk."""
    prm = hll_view_params(dst_dir)
    gcols, vcol, p = prm["group_cols"], prm["value_col"], prm["p"]
    after = last_processed_version(dst_dir)
    changes, newest = _changes_since(
        spark, src_dir, after, requested_cols=[*gcols, vcol]
    )
    if newest is None:
        return None
    marker = f"{_SRC_MARK}{newest}"
    if changes is None:
        return advance_watermark(dst_dir, marker)
    # the refusal-kinds collect and hll_registers both read the feed:
    # materialize it once instead of two complete source-delta scans
    # (mirrors _fold_ann_version's checkpoint; r11 advice)
    changes = changes.localCheckpoint(eager=True)
    kinds = {r[0] for r in changes.select("_change").distinct().collect()}
    if kinds & {"update_preimage", "delete"}:
        raise ValueError(
            f"{dst_dir}: HLL registers are a monotone max-lattice — a "
            f"{sorted(kinds & {'update_preimage', 'delete'})} feed cannot "
            "be retracted from them; rebuild with build_hll_view, or "
            "maintain refresh_distinct's exact counted support instead"
        )
    n_buckets, _ = agg_layout(dst_dir)
    if n_buckets is None:
        raise ValueError(
            f"{dst_dir}: keyed layout record missing (not an HLL view, or "
            "a maintenance commit dropped it) — rebuild with build_hll_view"
        )
    delta = hll_registers(changes, gcols, vcol, p).persist()
    try:  # the touched-bucket collect and the fold both read the delta
        current, touched, cur, rel, _ = _keyed_slice(
            spark, dst_dir, delta, gcols, n_buckets, keyed_layout=True
        )
        merged = _fold_max(current, delta, [*gcols, "reg"], "rho")
        return _commit_keyed(
            merged, dst_dir, gcols, n_buckets, marker,
            touched=touched, cur=cur, rel=rel,
        )
    finally:
        delta.unpersist()


def read_hll_view(spark: SparkSession, dst_dir: str) -> DataFrame:
    """Per-group ``(est_distinct, zero_regs)`` from the standing register
    table — the same ``hll_finish`` arithmetic as the batch operator
    (exact-integer register sum, linear-counting small-range correction),
    so the view answers bit-identically to ``hll_estimate`` over the live
    corpus. O(view) — the corpus is never touched."""
    prm = hll_view_params(dst_dir)
    return hll_finish(
        U.read_table(spark, dst_dir), prm["group_cols"], prm["p"]
    )


def streaming_refresh_sink(src_dir: str, dst_dir: str):
    """``foreachBatch`` body keeping the register view CONTINUOUSLY fresh
    from the ``spooky_versioned`` CDC stream — the ``_SRC_`` watermark
    (not the stream checkpoint) is the source of truth, so replays and
    restarts are exactly-once (the
    ``sources/incremental.streaming_refresh_sink`` contract)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_hll_view(batch_df.sparkSession, src_dir, dst_dir)

    return sink


# --- CMS token-frequency view (linear counters: deletes compose) --------

# the repo's one whitespace tokenizer (operators/ngram.py) — the same
# expression cms_sketch callers use, so view and batch sketches agree
from spookystuff_spark.operators.ngram import _TOKENS  # noqa: E402


def cms_view_params(dst_dir: str) -> dict:
    return json.loads(fsio.read_bytes(fsio.join(dst_dir, _CMS_PARAMS)))


def _signed_counter_delta(
    changes: DataFrame, text_col: str, depth: int, width: int
) -> DataFrame:
    """Per-(j, bucket) signed counter delta of a change-feed batch: every
    token OCCURRENCE (not distinct — CMS counts frequencies) of an
    insert/postimage row contributes +1 to its ``depth`` cells,
    preimage/delete occurrences −1, summed per cell. Cells whose net
    change is zero drop out before touching any layout bucket. Bounded
    output: ≤ depth × width rows whatever the batch size."""
    sign = F.when(F.col("_change").isin(*_POS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    toks = changes.select(
        sign.alias("_s"),
        F.explode(_TOKENS(F.col(text_col))).alias("tok"),
    )
    expanded = toks.select(
        "_s", "tok",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    return (
        expanded.groupBy(
            "j", _cms_bucket(F.col("j"), F.col("tok"), width).alias("bucket")
        )
        .agg(F.sum("_s").alias("_dn"))
        .where(F.col("_dn") != 0)
    )


def build_cms_token_view(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
    dst_buckets: int = 2,
) -> str:
    """Seed the counter table from the current source snapshot: one row
    per non-zero ``(j, bucket)`` cell with its live occurrence count
    ``_n``. ``dst_buckets`` defaults low — the whole table is ≤
    depth × width rows, so layout granularity hardly matters; the keyed
    idiom is kept so maintenance (``rebucket``, heal) works uniformly."""
    src_v = U.committed_versions(src_dir)[-1]
    docs = U.read_table(spark, src_dir)
    toks = docs.select(F.explode(_TOKENS(F.col(text_col))).alias("tok"))
    expanded = toks.select(
        "tok",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    )
    cells = expanded.groupBy(
        "j", _cms_bucket(F.col("j"), F.col("tok"), width).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("_n"))
    fsio.mkdirs(dst_dir)
    fsio.write_bytes(
        fsio.join(dst_dir, _CMS_PARAMS),
        json.dumps(
            {"text_col": text_col, "depth": int(depth), "width": int(width)}
        ).encode(),
    )
    return _commit_keyed(
        cells, dst_dir, ["j", "bucket"], dst_buckets, f"{_SRC_MARK}{src_v}"
    )


def refresh_cms_token_view(
    spark: SparkSession, src_dir: str, dst_dir: str
) -> str | None:
    """Fold source changes since the watermark into the counter table —
    ONE signed fold for the whole backlog (counters are linear, so
    inserts, deletes AND preimage-logged updates all compose in a single
    commit — the feed-shape coverage the monotone HLL view must refuse).
    Returns the new view version, or None when the source has nothing
    new. Preimage-less upserts past the baseline refuse inside the feed
    walk (the old occurrences could not be subtracted)."""
    prm = cms_view_params(dst_dir)
    after = last_processed_version(dst_dir)
    changes, newest = _changes_since(
        spark, src_dir, after, requested_cols=[prm["text_col"]]
    )
    if newest is None:
        return None
    marker = f"{_SRC_MARK}{newest}"
    if changes is None:
        return advance_watermark(dst_dir, marker)
    n_buckets, _ = agg_layout(dst_dir)
    if n_buckets is None:
        raise ValueError(
            f"{dst_dir}: keyed layout record missing (not a CMS view, or a "
            "maintenance commit dropped it) — rebuild with "
            "build_cms_token_view"
        )
    delta = _signed_counter_delta(
        changes, prm["text_col"], prm["depth"], prm["width"]
    ).persist()  # the touched-bucket collect and the fold both read it
    try:
        current, touched, cur, rel, _ = _keyed_slice(
            spark, dst_dir, delta, ["j", "bucket"], n_buckets,
            keyed_layout=True,
        )
        merged = _fold_support(
            current, delta.select("j", "bucket", "_dn"), ["j", "bucket"]
        )
        return _commit_keyed(
            merged, dst_dir, ["j", "bucket"], n_buckets, marker,
            touched=touched, cur=cur, rel=rel,
        )
    finally:
        delta.unpersist()


def cms_view_query(
    spark: SparkSession, dst_dir: str, terms: Sequence[str]
) -> DataFrame:
    """Point-query the standing counter table for a term list —
    ``est(t) = min_j counters[j][h_j(t)]``, the batch ``cms_query``
    arithmetic over the view's live cells (absent cells coalesce to 0),
    so the estimate equals a from-scratch sketch of the live corpus.
    O(view) read, sketch broadcast to the probe side — the corpus is
    never touched."""
    prm = cms_view_params(dst_dir)
    sketch = U.read_table(spark, dst_dir).select(
        "j", "bucket", F.col("_n").alias("c")
    )
    return cms_query(
        spark, sketch, list(terms), depth=prm["depth"], width=prm["width"]
    )


def cms_streaming_refresh_sink(src_dir: str, dst_dir: str):
    """``foreachBatch`` body keeping the counter view CONTINUOUSLY fresh
    from the ``spooky_versioned`` CDC stream — same exactly-once
    contract as :func:`streaming_refresh_sink`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_cms_token_view(batch_df.sparkSession, src_dir, dst_dir)

    return sink
