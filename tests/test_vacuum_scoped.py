"""Vacuum's referenced-set assembly is SCOPED to doomed versions
(upsert.py ``_entries_under``): only entries physically inside a version
being swept are ever probed, so the driver never materializes kept
manifests' full file lists — O(doomed files), not O(table files). Pins
the scoped fold against the full fold on real chains (deltas, parquet
entry tables, carried-forward references), that vacuum still preserves
carried data, and that a no-op vacuum performs zero assembly."""

from __future__ import annotations

import pytest

from spookystuff_spark.sources import upsert as U


@pytest.fixture
def small_thresholds(monkeypatch):
    monkeypatch.setattr(U, "CHECKPOINT_INLINE_MAX", 5)
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 3)


def _rows(spark, data):
    return spark.createDataFrame(data, "k int, v string")


def _build(spark, tmp_path, n_commits=6):
    t = str(tmp_path / "t")
    U.write_table(
        _rows(spark, [(i, f"s{i}") for i in range(8)]), t
    )
    for i in range(1, n_commits):
        U.append_rows(spark, t, _rows(spark, [(100 + i, f"a{i}")]))
    return t


def test_scoped_fold_matches_filtered_full_fold(
    spark, tmp_path, small_thresholds
):
    """For every version and owner subset, the scoped fold equals the
    full ``read_manifest`` fold filtered to those owners — across delta
    chains, checkpoints and parquet entry tables (the small thresholds
    force both a parquet checkpoint and multi-delta chains)."""
    t = _build(spark, tmp_path, n_commits=8)
    versions = U.committed_versions(t)
    assert len(versions) >= 8
    # at least one manifest went parquet (checkpoint above inline max)
    assert any(
        U._read_manifest_raw(t, v) is not None
        and "entries_ref" in U._read_manifest_raw(t, v)
        for v in versions
    ), "test did not exercise the parquet entry-table path"
    for v in versions:
        full = U.read_manifest(t, v)["files"]
        for owners in (
            {versions[0]},
            {versions[0], versions[2]},
            set(versions[:4]),
            {"v99999"},
        ):
            expected = {
                e
                for e in full
                if not U._is_abs_entry(e) and e.split("/", 1)[0] in owners
            }
            assert U._entries_under(t, v, owners) == expected, (v, owners)


def test_vacuum_preserves_carried_data_and_probes_only_doomed(
    spark, tmp_path, monkeypatch
):
    """Vacuum calls the scoped assembly with exactly the doomed version
    set, and carried-forward files inside dropped versions survive (the
    metadata-only append references the seed's files)."""
    t = _build(spark, tmp_path, n_commits=4)
    before = {tuple(r) for r in U.read_table(spark, t).collect()}
    seen_owners = []
    real = U._entries_under

    def spy(table_dir, version, owners):
        seen_owners.append(set(owners))
        return real(table_dir, version, owners)

    monkeypatch.setattr(U, "_entries_under", spy)
    committed = U.committed_versions(t)
    U.vacuum(t, keep=1)
    doomed = set(committed[:-1])
    assert seen_owners, "vacuum never ran the scoped assembly"
    assert all(o == doomed for o in seen_owners)
    assert {tuple(r) for r in U.read_table(spark, t).collect()} == before


def test_vacuum_with_nothing_to_drop_skips_assembly(
    spark, tmp_path, monkeypatch
):
    t = _build(spark, tmp_path, n_commits=3)

    def boom(*a, **k):
        raise AssertionError("assembly ran with zero doomed versions")

    monkeypatch.setattr(U, "_entries_under", boom)
    before = {tuple(r) for r in U.read_table(spark, t).collect()}
    U.vacuum(t, keep=10)
    assert {tuple(r) for r in U.read_table(spark, t).collect()} == before
