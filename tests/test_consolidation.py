"""Checkpoint consolidation of per-entry stats/blooms — the r9 refactor
(_FieldResolver + the ``consolidated`` chain marker): pre-consolidation
tables whose records live ONLY on owner manifests outside the fold chain
still consolidate (the r8 early-return missed them); chains with a
consolidating checkpoint are authoritative, so neither readers nor later
gathers ever probe owner manifests again; never-attached fields cost one
gather total, not one per checkpoint."""

from __future__ import annotations

import pytest

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as int) as k", "cast(id * 2 as long) as val"
    )


def _owner_read_counter(monkeypatch):
    """Wrap U._read_manifest_raw, counting reads per version name."""
    counts: dict = {}
    real = U._read_manifest_raw

    def spy(table_dir, version):
        counts[version] = counts.get(version, 0) + 1
        return real(table_dir, version)

    monkeypatch.setattr(U, "_read_manifest_raw", spy)
    return counts


def test_owner_only_records_behind_full_manifest_consolidate(
    spark, tmp_path, monkeypatch
):
    """The ADVICE case: a directly-written FULL manifest carrying foreign
    entries by reference cuts those entries' stats off the fold chain —
    they resolve via owner fallback forever. The next checkpoint must
    gather them anyway (the r8 early-return skipped this), mark itself
    consolidated, and from then on answer with zero owner reads."""
    t = str(tmp_path / "t")
    v1 = U.write_table(_rows(spark, 0, 10), t)
    U.attach_stats(t, ["k"])  # stats live on v1's manifest
    # simulate the carry: a FULL manifest listing v1's entries by
    # reference with no stats of its own (the append_partitioned
    # full-list shape) — v1's records are now outside v2's fold chain
    m1 = U.read_manifest(t, v1)
    v2 = U._next_version(t)
    fsio.mkdirs(fsio.join(t, v2))
    U.write_manifest(t, v2, m1["files"], m1["schema"], "append", parent=v1)
    U._finalize_commit(t, v2, v1)
    # owner fallback still answers correctly pre-checkpoint
    stats = U.entry_stats(t, v2)
    assert any(v for v in stats.values())

    # force an early checkpoint
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 2)
    for i in range(3):
        U.append_rows(spark, t, _rows(spark, 100 + i, 101 + i))
    tip = U.committed_versions(t)[-1]
    # find the checkpoint in the chain and verify it gathered v1's records
    chain = [tip] + U._fold_chain(t, tip)
    ckpt = next(
        v for v in chain if U._is_full_manifest(U._read_manifest_raw(t, v))
    )
    raw = U._read_manifest_raw(t, ckpt)
    assert raw.get("consolidated") is True
    gathered = U._field_of_raw(t, raw, "stats")
    v1_entries = [e for e in m1["files"] if e.startswith(f"{v1}/")]
    assert v1_entries and all(gathered.get(e) for e in v1_entries)

    # post-consolidation reads never touch v1's (owner's) manifest
    counts = _owner_read_counter(monkeypatch)
    stats2 = U.entry_stats(t, tip)
    assert v1 not in counts, f"owner manifest probed after consolidation"
    assert {e: r for e, r in stats2.items() if r} == {
        e: r for e, r in stats.items() if r
    }


def test_never_attached_field_probes_owners_once(spark, tmp_path, monkeypatch):
    """A table that never attaches stats/blooms pays ONE owner gather at
    its first consolidating checkpoint (which then stores no map — the
    marker alone records authoritative absence); every later checkpoint
    and read resolves with zero owner probing."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 5), t)
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 2)
    for i in range(3):
        U.append_rows(spark, t, _rows(spark, 10 + i, 11 + i))
    versions = U.committed_versions(t)
    tip = versions[-1]
    chain = [tip] + U._fold_chain(t, tip)
    ckpt = next(
        v for v in chain if U._is_full_manifest(U._read_manifest_raw(t, v))
    )
    raw = U._read_manifest_raw(t, ckpt)
    assert raw.get("consolidated") is True
    # nothing attached anywhere: no stats map stored, marker suffices
    assert "stats" not in raw and "stats_ref" not in raw

    # the NEXT checkpoint never probes pre-checkpoint owners. NOTE: the
    # count snapshot is taken BEFORE resolving committed_versions — the
    # full-history walk legitimately reads every manifest and would
    # drown the signal (the counting-test gotcha).
    pre_ckpt_owners = [v for v in versions if U._vnum(v) < U._vnum(ckpt)]
    counts = _owner_read_counter(monkeypatch)
    for i in range(2):
        U.append_rows(spark, t, _rows(spark, 20 + i, 21 + i))
    snapshot = dict(counts)
    monkeypatch.undo()
    tip2 = U.committed_versions(t)[-1]
    chain2 = [tip2] + U._fold_chain(t, tip2)
    probed = [
        v for v in pre_ckpt_owners if v in snapshot and v not in chain2
    ]
    assert not probed, f"pre-checkpoint owners probed again: {probed}"
    # reads agree: still no stats anywhere
    assert all(r == {} for r in U.entry_stats(t, tip2).values())


def test_attach_after_consolidated_checkpoint_still_merges(
    spark, tmp_path, monkeypatch
):
    """attach_stats / attach_blooms on a tip above a consolidated
    checkpoint merge through the shared raw-rewrite path without
    clobbering the consolidated map, and both resolve chain-wise."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 10), t)
    U.attach_stats(t, ["k"])
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 2)
    for i in range(3):
        U.append_rows(spark, t, _rows(spark, 100 + i, 101 + i))
    # attach stats for the new tip's own files
    n = U.attach_stats(t, ["val"])
    assert n >= 0
    tip = U.committed_versions(t)[-1]
    stats = U.entry_stats(t, tip)
    # v1's k-stats survived the checkpoint AND the later attach rewrite
    first = U.committed_versions(t)[0]
    v1_entries = [e for e in stats if e.startswith(f"{first}/")]
    assert v1_entries and all("k" in stats[e] for e in v1_entries)
