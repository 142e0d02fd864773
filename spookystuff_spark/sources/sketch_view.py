"""Incremental HLL sketch rollup over the lakehouse.

The batch operator (``operators/sketch.hll_estimate``) rescans the corpus
per run; the realistic 100-TB shape is a STANDING per-group register
table that every ingest batch folds into — "distinct users per
event_type, continuously fresh" without ever re-reading history. The
view is the HLL register table itself: one row per live
``(group, reg)`` with ``rho`` = the max leading-zero rank ever observed,
laid out by GROUP-HASH BUCKET through the same keyed machinery as the
aggregate IVM (``sources/incremental.py``: ``_keyed_slice`` /
``_fold_max`` / ``_commit_keyed``), so each refresh rewrites only the
buckets its delta's groups hash into and the table is bounded by
``groups × 2^p`` rows — never by corpus size.

Registers form a MONOTONE lattice: insert feeds compose as a per-key
max-merge (the one merge HLL admits — associative, commutative,
idempotent, so the standing view is BIT-IDENTICAL to a from-scratch
``hll_estimate`` over the live corpus, the property the tests pin).
Delete or update feeds REFUSE: a register max cannot be un-taken — when
retractions matter, use ``refresh_distinct``'s exact counted Z-set
instead (support-table cost) — the same monotonicity boundary Delta-
style aggregate IVM draws for MIN/MAX. Exactly-once per source version
via the ``_SRC_`` watermark; feed-less versions advance O(1);
``rebucket()`` re-lays the view like any keyed derived table.

Reference scope: the reference has no sketch or view-maintenance
machinery; this composes the rebuild's own HLL stack (Flajolet et al.
2007) with its lakehouse — public ideas only.
"""

from __future__ import annotations

import json
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio
from spookystuff_spark.operators.sketch import hll_finish, hll_registers
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import (
    _SRC_MARK,
    _changes_since,
    _commit_keyed,
    _fold_max,
    _keyed_slice,
    advance_watermark,
    agg_layout,
    last_processed_version,
)

_PARAMS = "_HLL_PARAMS.json"


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
        current, touched, cur, rel = _keyed_slice(
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
