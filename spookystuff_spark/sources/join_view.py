"""Incremental JOIN view maintenance — the join half of lakehouse IVM.

``sources/incremental.py`` keeps decomposable AGGREGATES current from
change feeds; this module does the same for an inner equi-join view
``V = A ⋈ B``: each refresh folds ONLY the rows changed on either source
since the last refresh, never re-joining the full tables. The view is a
COUNTED multiset (a Z-set, the standard IVM/DBSP representation): rows
carry an ``_n`` multiplicity column, feeds fold as signed counts
(insert/upsert → +1, update_preimage/delete → −1), and the refresh
appends signed delta rows — so UPDATES and DELETES on either source
maintain the view exactly, not just appends. The algebra is the bilinear
delta-join identity::

    ΔV = ΔA ⋈ B_new  +  (A_new − ΔA) ⋈ ΔB
       (= ΔA ⋈ B_old + ΔA ⋈ ΔB + A_old ⋈ ΔB — every changed pair exactly
        once, with pair multiplicity n_a·n_b)

where ``B_new`` is B's pinned current snapshot and ``A_new − ΔA``
subtracts the delta's signed counts from the snapshot (exactness is only
needed WITHIN the probed keys, so the subtraction runs on the probed
slice). Reads consolidate the signed append log
(:func:`read_join_view`); :func:`consolidate_join_view` materializes the
consolidation as maintenance, re-stamping the watermark. Updates on a
source must log preimages (``upsert(..., feed_preimages=True)``) —
``_changes_since`` refuses otherwise, the aggregate IVM's honesty
contract.

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

#: Partition-pruned snapshot probes collect the delta's DISTINCT key
#: values to the driver to enumerate touched partitions — right for the
#: design case (trickle refreshes), but a backfill-sized append would turn
#: it into an unbounded driver pull. Above this many distinct keys the
#: probe falls back to the broadcast-semi-join scan path (one
#: column-pruned pass, nothing collected).
PROBE_KEYS_MAX = 10_000


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


def _signed(changes: DataFrame | None) -> DataFrame | None:
    """``_change`` → signed multiplicity ``_sign``: insert/upsert rows
    count +1, update_preimage/delete rows −1 (``_changes_since`` already
    verified the kind set and that upsert feeds log preimages — without
    the preimage an update's old pair could not be retracted)."""
    if changes is None:
        return None
    sign = F.when(
        F.col("_change").isin("insert", "upsert"), F.lit(1)
    ).otherwise(F.lit(-1))
    return changes.withColumn("_sign", sign).drop("_change")


def _zfold(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Consolidate signed ``(cols..., _n)`` rows: sum multiplicities per
    distinct row, drop rows that cancelled to zero."""
    return (
        df.groupBy(*cols)
        .agg(F.sum("_n").alias("_n"))
        .where(F.col("_n") != 0)
    )


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

        # bounded driver pull: limit(N+1) caps the collect structurally —
        # a backfill-sized delta falls through to the one-pass scan below
        vals = [
            r[0]
            for r in keys_df.distinct().limit(PROBE_KEYS_MAX + 1).collect()
        ]
        if not vals:
            return U.read_table(spark, src_dir, version=version).limit(0)
        if len(vals) <= PROBE_KEYS_MAX:
            return read_table_partitions(
                spark, src_dir, vals, version=version
            )
        # backfill-sized delta: fall through to the one-pass scan
    df = U.read_table(spark, src_dir, version=version)
    if keys_df is not None:
        # NO broadcast hint: the key set can be backfill-sized on any
        # path reaching here (unpartitioned source, composite key, or
        # above the cap), and the hint would force it onto the driver
        # regardless of size — AQE promotes genuinely small sides to a
        # broadcast join at runtime from their ACTUAL size
        df = df.join(keys_df.distinct(), list(on), "leftsemi")
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


def _align(df: DataFrame, schema, keep: Sequence[str] = ()) -> DataFrame:
    """TYPED null-fill for feed columns absent from the snapshot schema (a
    legal subset-schema append's feed lacks later-evolved columns; without
    the fill the fold would crash on every retry and wedge the view, since
    feeds are immutable and the watermark only advances on success).
    ``keep`` passes bookkeeping columns (``_sign``) through untouched."""
    have = set(df.columns)
    return df.select(
        *[
            (
                F.col(f.name)
                if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
            )
            for f in schema.fields
        ],
        *[F.col(c) for c in keep if c in have],
    )


def _join_delta(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
    consolidate: bool = True,
) -> tuple[
    DataFrame | None, str | None, list[str], bool, tuple[str, str] | None
]:
    """The shared counted delta-join machinery behind
    :func:`refresh_join_view` and :func:`refresh_join_aggregate`:
    resolves ``dst_dir``'s dual watermark, walks both sources' feeds,
    and returns ``(delta Z-set with _n | None, marker, ordered columns,
    dst exists, (pinned A version, pinned B version))``. ``marker is
    None`` means neither source has anything new (the caller no-ops); a
    None delta with a marker is a watermark-only advance (feed-less
    source versions). The pins are the snapshot versions every read of
    this refresh is held to — the join-aggregate's min/max rescan reads
    the same pinned snapshots so a concurrent source commit can never
    leak into the re-derivation."""
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
            # nothing new on either side
            return None, None, [], exists, None
        da = _signed(da)
        db = _signed(db)

    # every snapshot read below is PINNED to the version the watermark
    # will record — a concurrent source commit after the feed walk must
    # not leak into this refresh (its rows arrive as the NEXT delta)
    pin_a = newest_a or wa
    pin_b = newest_b or wb
    a_schema = _schema_at(a_dir, pin_a)
    b_schema = _schema_at(b_dir, pin_b)
    a_cols = [f.name for f in a_schema.fields if f.name not in on]
    b_cols = [f.name for f in b_schema.fields if f.name not in on]
    a_all = on + a_cols
    b_all = on + b_cols
    clash = sorted(set(a_cols) & set(b_cols))
    if clash:
        raise ValueError(
            f"join view {dst_dir}: non-key columns {clash} exist on both "
            "sides — alias them upstream"
        )
    if "_n" in a_cols or "_n" in b_cols:
        raise ValueError(
            f"join view {dst_dir}: '_n' is the view's multiplicity "
            "column — alias the source column upstream"
        )
    # signed feeds → consolidated Z-set deltas (distinct row, net count)
    da_z = db_z = None
    if da is not None:
        da_z = _zfold(
            _align(da, a_schema, keep=("_sign",)).withColumn(
                "_n", F.col("_sign")
            ),
            a_all,
        )
    if db is not None:
        db_z = _zfold(
            _align(db, b_schema, keep=("_sign",)).withColumn(
                "_n", F.col("_sign")
            ),
            b_all,
        )

    ordered = on + a_cols + b_cols
    if first:
        # seed: the full join once; later refreshes are delta-only. The
        # counted (grouped) form keeps the MATERIALIZED view compact, but
        # its groupBy shuffles on every output column — a consumer that
        # immediately re-aggregates (refresh_join_aggregate) passes
        # consolidate=False and gets the raw join with _n = 1, which is
        # the same Z-set without the full-width shuffle.
        joined = U.read_table(spark, a_dir, version=pin_a).join(
            U.read_table(spark, b_dir, version=pin_b), on, "inner"
        )
        if consolidate:
            delta_v = joined.groupBy(*ordered).agg(
                F.count(F.lit(1)).alias("_n")
            )
        else:
            delta_v = joined.withColumn("_n", F.lit(1))
    else:
        # only the FEEDS are consolidated to counted form (O(Δ) groupBys)
        # — the SNAPSHOT sides stay raw rows: each raw row is a +1 term of
        # the same Z-set, and multiplicity products distribute over the
        # union (bilinearity), so grouping the probed slice by its full
        # width (an O(slice) shuffle per refresh) would buy nothing
        parts = []
        if da_z is not None:
            # ΔA ⋈ B_new — B probed only at ΔA's keys' partitions; each
            # raw B row pairs with ΔA's net count (duplicates of a B row
            # contribute one output row each — the delta consolidation
            # below merges them)
            b_probe = _snapshot_probe(
                spark, b_dir, da_z.select(*on), on, version=pin_b
            )
            parts.append(
                da_z.withColumnRenamed("_n", "_na")
                .join(b_probe, on, "inner")
                .select(*ordered, F.col("_na").alias("_n"))
            )
        if db_z is not None:
            # (A_new − ΔA) ⋈ ΔB: A's pinned snapshot restricted to ΔB's
            # keys, with ΔA's signed counts SUBTRACTED (a deleted row was
            # in A_old, an inserted one wasn't — the ΔA ⋈ B_new term
            # already covers every ΔA pairing since B_new contains ΔB).
            # Exactness is only needed within the probed keys, so the
            # subtraction runs on the probed slice, never the full table.
            a_probe = _snapshot_probe(
                spark, a_dir, db_z.select(*on), on, version=pin_a
            )
            a_signed = a_probe.select(*a_all).withColumn("_n", F.lit(1))
            if da_z is not None:
                da_neg = da_z.join(
                    db_z.select(*on).distinct(), on, "leftsemi"
                ).select(*a_all, (-F.col("_n")).alias("_n"))
                a_signed = a_signed.unionByName(da_neg)
            parts.append(
                a_signed.withColumnRenamed("_n", "_na")
                .join(db_z, on, "inner")
                .select(
                    *ordered, (F.col("_na") * F.col("_n")).alias("_n")
                )
            )
        if not parts:
            delta_v = None
        else:
            delta_v = parts[0]
            for p in parts[1:]:
                delta_v = delta_v.unionByName(p)
            if consolidate:
                # consolidate the delta (O(Δ)) so cancelling pairs never
                # reach the view's append log; an aggregate consumer is
                # linear in the Z-set, so it skips this full-width
                # shuffle too — cancelling pairs sum to zero either way
                delta_v = _zfold(delta_v, ordered)

    marker = f"{_MARK}{pin_a or 'none'}_{pin_b or 'none'}"
    return delta_v, marker, ordered, exists, (pin_a, pin_b)


def refresh_join_view(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
) -> str | None:
    """Fold both sources' changes since the last refresh into the inner
    equi-join view at ``dst_dir``. Returns the new view version, or None
    when neither source has anything new. The view's schema is
    ``on + A's other columns + B's other columns + _n`` (name collisions
    outside the key refuse — alias upstream); ``_n`` is the signed pair
    multiplicity, consolidated by :func:`read_join_view`.

    Per refresh: ΔA ⋈ B_current plus (A_current − ΔA) ⋈ ΔB as Z-sets
    (pair multiplicity = n_a·n_b), each snapshot side partition-pruned to
    the delta's keys when laid out by the join key. The first refresh (no
    markers yet) seeds the view with the full A ⋈ B."""
    delta_v, marker, ordered, exists, _pins = _join_delta(
        spark, a_dir, b_dir, dst_dir, on
    )
    if marker is None:
        return None  # nothing new on either side
    if delta_v is None:
        # watermark-only advance (feed-less versions): an O(1) empty
        # marker commit so the next refresh doesn't re-walk them; a view
        # that doesn't exist yet has nothing to advance
        if not exists:
            return None
        from spookystuff_spark.sources.incremental import advance_watermark

        return advance_watermark(dst_dir, marker)
    delta_v = delta_v.select(*ordered, "_n")
    if not exists:
        return U.write_table(delta_v, dst_dir, marker=marker,
                             change_feed=False)
    return U.append_rows(spark, dst_dir, delta_v, marker=marker,
                         change_feed=False)


def _joinagg_rescan(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    on: Sequence[str],
    pins: tuple[str, str],
    gcols: Sequence[str],
    min_cols: Sequence[str],
    max_cols: Sequence[str],
    affected: DataFrame,
) -> DataFrame:
    """Authoritative min/max for the AFFECTED groups, recomputed from the
    PINNED source snapshots restricted to those groups — min/max don't
    decompose under join retractions (a retracted pair that held a
    group's max leaves no runner-up in the delta), so the affected groups
    re-derive from σ_affected(A ⋈ B) while every other group keeps
    folding insert-side extremes.

    Pruning: each side is first null-safe semi-joined to ITS projection
    of the affected group columns (a group column lives on exactly one
    side, join keys on both), then the side with no group columns is
    probed at the pruned side's join keys through :func:`_snapshot_probe`
    — partition-pruned when laid out by the key, capped-collect safe
    otherwise. A final null-safe semi-join on the full group key restricts
    the joined slice exactly (the per-side filters alone admit the cross
    product of the projections). One pass over the probed slices, never
    the full join."""
    from spookystuff_spark.sources.incremental import _null_safe_key_cond

    pin_a, pin_b = pins
    a = U.read_table(spark, a_dir, version=pin_a)
    b = U.read_table(spark, b_dir, version=pin_b)
    ag = [g for g in gcols if g in a.columns]
    bg = [g for g in gcols if g in b.columns and g not in on]

    def _prune(df, side_g):
        # column-prune to what the rescan consumes on this side
        keep = [*on, *side_g]
        keep += [c for c in (*min_cols, *max_cols) if c in df.columns]
        return df.select(*dict.fromkeys(keep))

    a, b = _prune(a, ag), _prune(b, bg)
    if ag:
        aff_a = affected.select(*ag).distinct()
        a = a.join(aff_a, _null_safe_key_cond(a, aff_a, ag), "leftsemi")
        if not bg:
            b = _snapshot_probe(spark, b_dir, a.select(*on), on, pin_b)
    if bg:
        aff_b = affected.select(*bg).distinct()
        b = b.join(aff_b, _null_safe_key_cond(b, aff_b, bg), "leftsemi")
        if not ag:
            a = _snapshot_probe(spark, a_dir, b.select(*on), on, pin_a)
    j = a.join(b, list(on), "inner")
    j = j.join(affected, _null_safe_key_cond(j, affected, gcols), "leftsemi")
    return j.groupBy(*gcols).agg(
        *[F.min(c).alias(f"_r_{c}_min") for c in min_cols],
        *[F.max(c).alias(f"_r_{c}_max") for c in max_cols],
    )


def refresh_join_aggregate(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
    dst_buckets: int | None = None,
    sumsq_cols: Sequence[str] = (),
) -> str | None:
    """The COMPOSED view γ(A ⋈ B), maintained incrementally WITHOUT
    materializing the join: ``GROUP BY group_cols: SUM(sum_cols),
    MIN/MAX(min_cols/max_cols), COUNT(*)`` over the inner equi-join of
    two versioned tables (schema: group_cols, ``<c>_sum``, ``<c>_sumsq``
    per ``sumsq_cols`` entry — SUM(c²·_n), exact decimal for
    integral/decimal columns, read-time variance via
    ``with_derived_stats`` — ``<c>_min``/``<c>_max``, ``n_rows``). Each refresh computes the counted join
    delta (:func:`_join_delta` — the same partition-pruned,
    watermark-pinned machinery as the join view), aggregates it with
    signed multiplicities (``SUM(c·_n)``, ``SUM(_n)``), and folds the
    per-group deltas into the current table with a union-then-groupBy
    (NULL-safe by construction — groupBy treats NULL keys as one group
    where an equi-join would drop them). Updates and deletes on either
    source fold exactly (Z-set bilinearity); groups whose count reaches
    zero are removed; replays are exactly-once via the same dual
    ``_SRCJ_`` watermark.

    Min/max fold from the delta's INSERT-side pairs; retractions trigger
    targeted re-derivation for just the affected groups from the pinned
    snapshots (:func:`_joinagg_rescan`) — the refresh_aggregate idiom,
    lifted over the join.

    ``dst_buckets``: lay the aggregate out by a hash bucket of the group
    key and rewrite only the buckets each delta touches
    (sources/incremental.py's keyed fold) — O(touched buckets) per
    refresh instead of O(group cardinality), the term that matters when
    the group key is high-cardinality at 100 TB.

    The classic shape: revenue per segment maintained from a fact and a
    dimension table, where re-joining 100 TB per refresh is the thing
    this exists to avoid."""
    from spookystuff_spark.sources.incremental import (
        _apply_rescan,
        _commit_keyed,
        _resolve_buckets,
        advance_watermark,
    )

    gcols = list(group_cols)
    scols = list(sum_cols)
    sqcols = list(sumsq_cols)
    mins, maxs = list(min_cols), list(max_cols)
    n_buckets, keyed_layout = _resolve_buckets(dst_dir, gcols, dst_buckets)
    delta_v, marker, ordered, exists, pins = _join_delta(
        spark, a_dir, b_dir, dst_dir, on, consolidate=False
    )
    if marker is None:
        return None  # nothing new on either side
    if delta_v is None:
        # watermark-only advance (feed-less source versions): an O(1)
        # empty marker commit, never a table rewrite; a table that
        # doesn't exist yet has nothing to advance
        if not exists:
            return None
        return advance_watermark(dst_dir, marker)
    missing = [
        c for c in gcols + scols + sqcols + mins + maxs if c not in ordered
    ]
    if missing:
        raise ValueError(
            f"join aggregate {dst_dir}: columns {missing} not in the "
            f"join's output {ordered}"
        )
    neg = F.col("_n") < 0
    affected = None
    pinned = None
    want_minmax = bool(mins or maxs) and exists
    # min/max fold over INSERT-side pairs only; retracted groups are
    # re-derived below (the refresh_aggregate contract, join-lifted).
    # The retraction probe rides the SAME aggregation as a per-group
    # `_has_neg` flag — no separate delta-DAG job — and the AGGREGATED
    # frame (O(touched groups) rows, not the joined delta) is what gets
    # pinned for the probe/collect/rescan/commit re-evaluations.
    pos_val = lambda c: F.when(~neg, F.col(c))  # noqa: E731
    from spookystuff_spark.sources.incremental import _sq_expr

    delta_agg = delta_v.groupBy(*gcols).agg(
        *[
            F.sum(F.col(c) * F.col("_n")).alias(f"{c}_sum")
            for c in scols
        ],
        *[
            F.sum(_sq_expr(delta_v, c) * F.col("_n")).alias(f"{c}_sumsq")
            for c in sqcols
        ],
        *[F.min(pos_val(c)).alias(f"{c}_min") for c in mins],
        *[F.max(pos_val(c)).alias(f"{c}_max") for c in maxs],
        F.sum("_n").alias("n_rows"),
        *([F.max(neg).alias("_has_neg")] if want_minmax else []),
    )
    if exists and (mins or maxs or keyed_layout):
        pinned = delta_agg = delta_agg.persist()
    touched = cur = rel = None
    if exists:
        from spookystuff_spark.sources.incremental import _keyed_slice

        # the retraction probe rides the touched-bucket collect when the
        # keyed path runs (ONE job answers both — r12 verdict #4); only a
        # non-keyed min/max refresh still pays a separate probe job
        current, touched, cur, rel, fused_neg = _keyed_slice(
            spark, dst_dir, delta_agg, gcols, n_buckets, keyed_layout,
            neg_col="_has_neg" if want_minmax else None,
        )
        if want_minmax:
            if fused_neg is None:
                aff = delta_agg.where(F.col("_has_neg")).select(*gcols)
                if aff.limit(1).count():
                    affected = aff
            elif fused_neg:
                affected = delta_agg.where(F.col("_has_neg")).select(*gcols)
    if "_has_neg" in delta_agg.columns:
        delta_agg = delta_agg.drop("_has_neg")
    if exists:
        # a refresh that changes the maintained column set (e.g. omits
        # sumsq_cols on a table maintained with them) cannot fold — the
        # unionByName below would raise anyway, but cryptically; refuse
        # with the rebuild named (incremental.refresh_aggregate's guard,
        # join-lifted)
        if set(current.columns) != set(delta_agg.columns):
            raise ValueError(
                f"{dst_dir}: maintained columns {sorted(current.columns)} "
                "don't match this refresh's aggregate set "
                f"{sorted(delta_agg.columns)} — changing the maintained "
                "statistics requires rebuilding the derived table"
            )
        # union-then-groupBy fold: groupBy treats NULL group keys as one
        # group (a full-outer equi-join would NOT match NULL = NULL, so a
        # NULL-keyed group's retraction would silently never meet its
        # seed row and the n_rows filter would drop it — permanent drift)
        delta_agg = current.unionByName(delta_agg).groupBy(*gcols).agg(
            *[F.sum(f"{c}_sum").alias(f"{c}_sum") for c in scols],
            *[F.sum(f"{c}_sumsq").alias(f"{c}_sumsq") for c in sqcols],
            *[F.min(f"{c}_min").alias(f"{c}_min") for c in mins],
            *[F.max(f"{c}_max").alias(f"{c}_max") for c in maxs],
            F.sum("n_rows").alias("n_rows"),
        )
    merged = delta_agg.where(F.col("n_rows") > 0)
    if affected is not None:
        rescan = _joinagg_rescan(
            spark, a_dir, b_dir, on, pins, gcols, mins, maxs, affected
        )
        merged = _apply_rescan(
            merged, rescan, affected, gcols, scols, mins, maxs,
            sumsq_cols=sqcols,
        )
    try:
        if n_buckets is not None:
            return _commit_keyed(
                merged, dst_dir, gcols, n_buckets, marker,
                touched=touched, cur=cur, rel=rel,
            )
        return U.write_table(
            merged, dst_dir, marker=marker, change_feed=False
        )
    finally:
        if pinned is not None:
            pinned.unpersist()


def refresh_join_distinct(
    spark: SparkSession,
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
    group_cols: Sequence[str],
    value_col: str,
    dst_buckets: int | None = None,
) -> str | None:
    """COUNT(DISTINCT ``value_col``) over A ⋈ B, maintained incrementally
    WITHOUT materializing the join — the composition of the counted join
    delta (:func:`_join_delta`) with the distinct support Z-set
    (``incremental.refresh_distinct``): the derived table holds one row
    per live (group, value) pair of the join with its multiplicity
    ``_n`` (how many joined rows currently carry that value in that
    group). Each refresh aggregates the signed delta to per-pair counts
    and folds them into ONLY the touched group buckets; a pair leaves
    the support set at multiplicity zero — so updates and deletes on
    EITHER source fold exactly with no rescan and no retraction special
    case (the property sums share and min/max lack). Read the aggregate
    with ``incremental.read_distinct_aggregate`` (one O(support)
    groupBy: NULL-excluding distinct count + total live joined rows).
    Exactly-once via the dual ``_SRCJ_`` watermark; feed-less source
    versions advance O(1).

    The classic shape: distinct products per segment from a 100 TB
    fact ⋈ dim pair, exact under takedown deletes, never re-joined."""
    from spookystuff_spark.sources.incremental import (
        _commit_keyed,
        _fold_support,
        _keyed_slice,
        _resolve_buckets,
        advance_watermark,
    )

    gcols = list(group_cols)
    if value_col in gcols:
        raise ValueError(
            f"value_col {value_col!r} is also a group column — a distinct "
            "count over the group key is constant 1 per group"
        )
    fold_key = [*gcols, value_col]
    n_buckets, keyed_layout = _resolve_buckets(dst_dir, gcols, dst_buckets)
    delta_v, marker, ordered, exists, _pins = _join_delta(
        spark, a_dir, b_dir, dst_dir, on, consolidate=False
    )
    if marker is None:
        return None  # nothing new on either side
    if delta_v is None:
        if not exists:
            return None
        return advance_watermark(dst_dir, marker)
    missing = [c for c in fold_key if c not in ordered]
    if missing:
        raise ValueError(
            f"join distinct {dst_dir}: columns {missing} not in the "
            f"join's output {ordered}"
        )
    delta = (
        delta_v.groupBy(*fold_key)
        .agg(F.sum("_n").alias("_dn"))
        .where(F.col("_dn") != 0)
    )
    persisted = exists and keyed_layout
    if persisted:
        # the touched-bucket collect and the fold both evaluate the
        # delta-join DAG — pin it once
        delta = delta.persist()
    try:
        if exists:
            current, touched, cur, rel, _ = _keyed_slice(
                spark, dst_dir, delta, gcols, n_buckets, keyed_layout
            )
        else:
            current, touched, cur, rel = None, None, None, None
        merged = _fold_support(current, delta, fold_key)
        if n_buckets is not None:
            return _commit_keyed(
                merged, dst_dir, gcols, n_buckets, marker,
                touched=touched, cur=cur, rel=rel,
            )
        return U.write_table(
            merged, dst_dir, marker=marker, change_feed=False
        )
    finally:
        if persisted:
            delta.unpersist()


def read_join_view(
    spark: SparkSession, dst_dir: str, version: str | None = None
) -> DataFrame:
    """The view's current logical content: one row per distinct joined
    row with its net multiplicity ``_n ≥ 1`` — consolidates the signed
    append log (retraction rows cancel their targets). O(view) groupBy,
    distributed; :func:`consolidate_join_view` materializes it so reads
    between refreshes are scan-only."""
    df = U.read_table(spark, dst_dir, version=version)
    return _zfold(df, [c for c in df.columns if c != "_n"])


def consolidate_join_view(spark: SparkSession, dst_dir: str) -> str:
    """Maintenance: rewrite the view as its consolidated content (the
    signed append log folds to net rows) and RE-STAMP the current
    watermark on the rewrite commit — exactly-once survives a later
    vacuum of the marker-bearing versions (the ``compact_ann_index``
    idiom)."""
    wa, wb = _watermarks(dst_dir)
    if wa is None and wb is None:
        raise ValueError(
            f"join view {dst_dir}: no _SRCJ watermark to re-stamp — "
            "not a join view, or its markers were vacuumed away"
        )
    merged = read_join_view(spark, dst_dir)
    return U.write_table(
        merged,
        dst_dir,
        marker=f"{_MARK}{wa or 'none'}_{wb or 'none'}",
        change_feed=False,
    )


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


def streaming_join_aggregate_sink(
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
    group_cols: Sequence[str],
    sum_cols: Sequence[str],
    **refresh_kwargs,
):
    """``foreachBatch`` body keeping the composed view γ(A ⋈ B)
    continuously fresh from either source's CDC stream — the
    :func:`streaming_join_view_sink` contract applied to
    :func:`refresh_join_aggregate` (kwargs pass min/max/sumsq/buckets)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_join_aggregate(
            batch_df.sparkSession, a_dir, b_dir, dst_dir, on,
            group_cols, sum_cols, **refresh_kwargs,
        )

    return sink


def streaming_join_distinct_sink(
    a_dir: str,
    b_dir: str,
    dst_dir: str,
    on: Sequence[str],
    group_cols: Sequence[str],
    value_col: str,
    **refresh_kwargs,
):
    """``foreachBatch`` body keeping the COUNT(DISTINCT)-over-join
    support Z-set continuously fresh from either source's CDC stream —
    the :func:`streaming_join_view_sink` contract applied to
    :func:`refresh_join_distinct`."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        refresh_join_distinct(
            batch_df.sparkSession, a_dir, b_dir, dst_dir, on,
            group_cols, value_col, **refresh_kwargs,
        )

    return sink
