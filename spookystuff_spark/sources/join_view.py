"""Incremental JOIN view maintenance — the join half of lakehouse IVM.

``sources/incremental.py`` keeps decomposable AGGREGATES current from
change feeds; this module does the same for an inner equi-join view
``V = A ⋈ B``: each refresh folds ONLY the rows appended to either source
since the last refresh, never re-joining the full tables. The algebra is
the classical delta-join identity for append-only sources::

    ΔV = ΔA ⋈ B_new  +  A_old ⋈ ΔB
       (= ΔA ⋈ B_old + ΔA ⋈ ΔB + A_old ⋈ ΔB — every new pair exactly once)

where ``B_new`` is B's current snapshot and ``A_old = A_new ∖ ΔA`` (the
snapshot minus this refresh's delta, reconstructed by anti-joining the
delta's keys' rows — cheap because it only has to be exact WITHIN the
probed partitions). Sources must be APPEND-ONLY for this identity
(updates/deletes need counted multiplicities — the refresh checks feed
kinds and refuses instead of drifting, the same honesty contract as the
aggregate IVM).

THE SCALE TRICK: when a source is laid out by the join key
(``write_table_partitioned(..., partition_col=key)``), the snapshot side
of each delta join reads ONLY the partitions containing the other side's
delta keys — a manifest-pruned ``read_table_partitions`` probe, zero IO
on every other partition. A 100 TB fact table enriched by a trickle of
new dimension rows then costs O(Δ × touched-partition rows) per refresh,
not O(|A|). Un-partitioned sources still work (the probe degrades to a
broadcast-semi-join-filtered scan — one pass, column-pruned).

Exactly-once: the refresh records BOTH sources' processed versions in
ONE ``_SRCJ_<va>_<vb>`` marker riding the view's own atomic commit (the
``_SRC_`` idiom of sources/incremental.py with both watermarks in a
single name, so no crash window can persist one side's watermark without
the other's); the view itself
is maintained with O(batch) delta-manifest appends, so N refreshes cost
O(N) cumulative metadata.

Reference scope: the reference has no materialized-view machinery; this
is rebuild-native lakehouse surface citing only public IVM algebra
(delta-join rules as in any incremental-view-maintenance text) and Delta
CDF semantics.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.incremental import _changes_since

_MARK = "_SRCJ_"


def _watermarks(dst_dir: str) -> tuple[str | None, str | None]:
    """(A's processed version, B's) from the newest committed marker —
    both ride one name (``_SRCJ_<va>_<vb>``, 'none' for never-processed),
    so they can never desynchronize across a crash."""
    from spookystuff_spark.sources.incremental import newest_marker

    suffix = newest_marker(dst_dir, _MARK)
    if suffix is None:
        return None, None
    va, _, vb = suffix.partition("_")
    return (va if va != "none" else None, vb if vb != "none" else None)


def _insert_only(src_dir: str, changes: DataFrame | None) -> DataFrame | None:
    """Strip ``_change`` after verifying the feed is append-shaped — the
    delta-join identity is only exact without retractions."""
    if changes is None:
        return None
    kinds = {r[0] for r in changes.select("_change").distinct().collect()}
    extra = kinds - {"insert", "upsert"}
    if extra:
        raise ValueError(
            f"{src_dir}: incremental join view needs append-only feeds — "
            f"got kinds {sorted(extra)}; rebuild the view instead"
        )
    return changes.drop("_change")


def _snapshot_probe(
    spark: SparkSession,
    src_dir: str,
    keys_df: DataFrame | None,
    on: Sequence[str],
    version: str,
) -> DataFrame:
    """The snapshot side of a delta join, restricted to the partitions the
    other side's delta keys touch when the source is laid out by the
    (single) join key — manifest-pruned, zero IO elsewhere. Falls back to
    a semi-join-filtered full scan (one pass) otherwise. ``version`` PINS
    the read to the snapshot the watermark records: an unpinned latest
    read would include rows a concurrent writer committed after the feed
    walk, and the next refresh's delta would re-emit those pairs
    (double-count) — the source-side race the view's own commit CAS can't
    see."""
    raw = U._read_manifest_raw(src_dir, version) or {}
    pcol = raw.get("partition_col")
    if (
        keys_df is not None
        and pcol is not None
        and list(on) == [pcol]
    ):
        from spookystuff_spark.sources.partitioned_table import (
            read_table_partitions,
        )

        vals = [r[0] for r in keys_df.distinct().collect()]  # O(Δ keys)
        if not vals:
            return U.read_table(spark, src_dir, version=version).limit(0)
        return read_table_partitions(spark, src_dir, vals, version=version)
    df = U.read_table(spark, src_dir, version=version)
    if keys_df is not None:
        df = df.join(F.broadcast(keys_df.distinct()), list(on), "leftsemi")
    return df


def _schema_at(src_dir: str, version: str):
    """StructType of a source's pinned snapshot — one raw-manifest read,
    no DataFrame construction."""
    import json

    from pyspark.sql.types import StructType

    sj = U.snapshot_schema_json(src_dir, version)
    if sj is None:
        raise FileNotFoundError(f"{src_dir}/{version}: no schema recorded")
    return StructType.fromJson(json.loads(sj))


def _align(df: DataFrame, schema) -> DataFrame:
    """TYPED null-fill for feed columns absent from the snapshot schema (a
    legal subset-schema append's feed lacks later-evolved columns; without
    the fill the fold would crash on every retry and wedge the view, since
    feeds are immutable and the watermark only advances on success)."""
    have = set(df.columns)
    return df.select(
        *[
            (
                F.col(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in schema.fields
        ]
    )


def refresh_join_view(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
) -> str | None:
    """Fold both sources' appends since the last refresh into the inner
    equi-join view at ``dst_dir``. Returns the new view version, or None
    when neither source has anything new. The view's schema is
    ``on + A's other columns + B's other columns`` (name collisions
    outside the key refuse — alias upstream).

    Per refresh: ΔA ⋈ B_current plus (A_current ∖ ΔA) ⋈ ΔB, each snapshot
    side partition-pruned to the delta's keys when laid out by the join
    key. The first refresh (no markers yet) seeds the view with the full
    A ⋈ B."""
    on = list(on)
    wa, wb = _watermarks(dst_dir)
    first = wa is None and wb is None
    exists = fsio.is_dir(dst_dir) and U._latest(dst_dir) is not None
    if first:
        if exists:
            # a view WITHOUT a watermark can only mean maintenance dropped
            # the marker-bearing versions (e.g. an aggressive vacuum):
            # re-seeding would APPEND the full join onto the existing
            # content and silently double every pair — refuse instead
            raise ValueError(
                f"join view {dst_dir}: existing view carries no _SRCJ "
                "watermark (vacuumed away?) — rebuild it (remove the dir "
                "and re-seed) or restore a marker-bearing version"
            )
        # the seed reads SNAPSHOTS, not feeds — no feed walk, so a source
        # with pre-seed history of any commit kind still seeds fine
        newest_a, newest_b = U._latest(a_dir), U._latest(b_dir)
        if newest_a is None or newest_b is None:
            raise FileNotFoundError(
                f"join view {dst_dir}: both sources must exist to seed"
            )
        da = db = None
    else:
        da, newest_a = _changes_since(spark, a_dir, wa)
        db, newest_b = _changes_since(spark, b_dir, wb)
        if newest_a is None and newest_b is None:
            return None  # nothing new on either side
        da = _insert_only(a_dir, da)
        db = _insert_only(b_dir, db)

    # every snapshot read below is PINNED to the version the watermark
    # will record — a concurrent source commit after the feed walk must
    # not leak into this refresh (its rows arrive as the NEXT delta)
    pin_a = newest_a or wa
    pin_b = newest_b or wb
    a_schema = _schema_at(a_dir, pin_a)
    b_schema = _schema_at(b_dir, pin_b)
    a_cols = [f.name for f in a_schema.fields if f.name not in on]
    b_cols = [f.name for f in b_schema.fields if f.name not in on]
    clash = sorted(set(a_cols) & set(b_cols))
    if clash:
        raise ValueError(
            f"join view {dst_dir}: non-key columns {clash} exist on both "
            "sides — alias them upstream"
        )
    if da is not None:
        da = _align(da, a_schema)
    if db is not None:
        db = _align(db, b_schema)

    if first:
        # seed: the full join once; later refreshes are delta-only
        delta_v = U.read_table(spark, a_dir, version=pin_a).join(
            U.read_table(spark, b_dir, version=pin_b), on, "inner"
        )
    else:
        parts = []
        if da is not None:
            # ΔA ⋈ B_new — B probed only at ΔA's keys' partitions
            b_probe = _snapshot_probe(
                spark, b_dir, da.select(*on), on, version=pin_b
            )
            parts.append(da.join(b_probe, on, "inner"))
        if db is not None:
            # A_old ⋈ ΔB: A_new restricted to ΔB's keys, minus ΔA's rows
            # (those pairs are already produced by the ΔA ⋈ B_new term —
            # B_new contains ΔB). Exactness is only needed within the
            # probed keys, so the subtraction is an exceptAll on the
            # probed slice, never a full-table set op.
            a_probe = _snapshot_probe(
                spark, a_dir, db.select(*on), on, version=pin_a
            )
            if da is not None:
                a_probe = a_probe.exceptAll(
                    da.select(*a_probe.columns).join(
                        db.select(*on).distinct(), on, "leftsemi"
                    )
                )
            parts.append(a_probe.join(db, on, "inner"))
        if not parts:
            delta_v = None
        else:
            delta_v = parts[0]
            for p in parts[1:]:
                delta_v = delta_v.unionByName(p)

    marker = f"{_MARK}{pin_a or 'none'}_{pin_b or 'none'}"
    ordered = on + a_cols + b_cols
    if delta_v is None:
        # watermark-only advance (feed-less versions): commit the marker
        # on an empty append so the next refresh doesn't re-walk them; a
        # view that doesn't exist yet has nothing to advance
        if not exists:
            return None
        empty = U.read_table(spark, dst_dir).limit(0)
        return U.append_rows(spark, dst_dir, empty, marker=marker,
                             change_feed=False)
    delta_v = delta_v.select(*ordered)
    if not exists:
        return U.write_table(delta_v, dst_dir, marker=marker,
                             change_feed=False)
    return U.append_rows(spark, dst_dir, delta_v, marker=marker,
                         change_feed=False)


def streaming_join_view_sink(
    a_dir: str, b_dir: str, dst_dir: str, on: Sequence[str]
):
    """``foreachBatch`` body keeping the join view continuously fresh from
    either source's CDC stream — the batch frame is only the trigger, the
    fold reads both feeds from the watermarks (replays and overlapping
    triggers are naturally exactly-once, the streaming_refresh_sink
    contract)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_join_view(batch_df.sparkSession, a_dir, b_dir, dst_dir, on)

    return sink
