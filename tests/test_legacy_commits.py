"""Mixed-deployment safety: a pre-r7 (LEGACY-format) writer commits by
creating ``_commits/<version>`` and may die before rewriting the
``_LATEST`` pointer. The verified-pointer fast path walks parent-keyed
``<v>.c`` slots — a different object name — so r8 could serve a stale
tip, fork history on the next commit, and vacuum could destroy the real
tip as debris. r9 closes all three: the walk probes forward for legacy
entries (dir-guided), ``_next_version`` re-checks skipped slots and heals
the pointer, and vacuum resolves from the authoritative listing."""

from __future__ import annotations

import pytest

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr(
        "cast(id as int) as k", "cast(id * 2 as long) as val"
    )


def _legacy_commit(spark, t, parent, version, lo, hi):
    """Simulate a pre-r7 writer that committed ``version`` (data dir +
    manifest + LEGACY ``_commits/<version>`` entry) and CRASHED before
    rewriting the pointer — the two-line verified pointer still names
    ``parent``."""
    _rows(spark, lo, hi).write.parquet(fsio.join(t, version))
    own = [
        f"{version}/{n}"
        for n in U._parquet_names(fsio.join(t, version))
    ]
    pm = U.read_manifest(t, parent)
    U.write_manifest(
        t, version, pm["files"] + own, pm["schema"], "append", parent=parent
    )
    fsio.write_bytes(fsio.join(t, U._COMMITS, version), b"")


def test_legacy_commit_ahead_of_verified_pointer_is_visible(spark, tmp_path):
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 5), t)
    U.append_rows(spark, t, _rows(spark, 5, 10))  # verified pointer at v2
    assert U._latest(t) == "v00002"
    _legacy_commit(spark, t, "v00002", "v00003", 10, 15)
    # the walk must see past the stale (still-verifiable) pointer
    assert U._latest(t) == "v00003"
    assert U.read_table(spark, t).count() == 15


def test_commit_after_hidden_legacy_does_not_fork(spark, tmp_path):
    """r8 regression case: the next writer's CAS on ``<v00002>.c``
    succeeded (different name than the legacy ``v00003`` entry), forking
    history. Now the new commit builds ON the legacy tip."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 5), t)
    U.append_rows(spark, t, _rows(spark, 5, 10))
    _legacy_commit(spark, t, "v00002", "v00003", 10, 15)
    U.append_rows(spark, t, _rows(spark, 15, 20))
    tip = U._latest(t)
    raw = U._read_manifest_raw(t, tip)
    assert raw["parent"] == "v00003", "forked past the legacy commit"
    assert U.read_table(spark, t).count() == 20
    # and the pointer re-verifies: committed_versions contains the legacy
    assert "v00003" in U.committed_versions(t)


def test_vacuum_resolves_authoritatively_past_a_gap(spark, tmp_path):
    """The residual fast-path corner: a legacy commit past a DIR GAP (a
    pre-r9 vacuum removed the intervening debris) is invisible to the
    walk. Vacuum deletes, so it must resolve from the listing — keep the
    legacy tip's data and heal the pointer instead of destroying the real
    tip as 'dangling'."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 5), t)
    U.append_rows(spark, t, _rows(spark, 5, 10))
    # legacy commit at v00004 with NO v00003 dir (the gap)
    _legacy_commit(spark, t, "v00002", "v00004", 10, 15)
    assert U._latest(t) == "v00002"  # fast path can't see past the gap
    removed = U.vacuum(t, keep=10)
    assert "v00004" not in removed
    assert fsio.exists(fsio.join(t, "v00004", U._MANIFEST))
    # vacuum healed the pointer: every resolver now sees the legacy tip
    assert U._latest(t) == "v00004"
    assert U.read_table(spark, t).count() == 15


def test_next_version_heals_on_skipped_committed_slot(spark, tmp_path):
    """A writer probing past an occupied slot must re-check it for a
    legacy commit entry: found one ⇒ the resolved tip was stale ⇒ heal
    the pointer and raise for retry instead of forking."""
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 5), t)
    U.append_rows(spark, t, _rows(spark, 5, 10))
    _legacy_commit(spark, t, "v00002", "v00003", 10, 15)
    # force the stale view _next_version would act on: monkeypatching
    # _latest simulates the gap case where the walk can't see the legacy
    import pytest as _pytest

    real = U._latest
    try:
        U._latest = lambda d: "v00002"
        with _pytest.raises(U.ConcurrentWriteError, match="legacy-format"):
            U._next_version(t)
    finally:
        U._latest = real
    # the guard healed the pointer to the single-line form: resolution is
    # authoritative again
    assert U._latest(t) == "v00003"
    U.append_rows(spark, t, _rows(spark, 15, 20))  # retry succeeds
    assert U.read_table(spark, t).count() == 20
