"""Per-file bloom index (sources/bloom_index.py): point lookups skip
definitely-absent files on an UNCLUSTERED column (where min/max stats
can't), never lose rows, resolve chain-wise across commits, degrade
conservatively without a sidecar, and compose with deletion vectors."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.bloom_index import (
    attach_blooms,
    entry_blooms,
    read_table_point,
)


def _rows(spark, lo, hi):
    # user_id deliberately NOT clustered: interleaved ranges per commit
    return spark.createDataFrame(
        [(i, i % 1000, f"u{i}") for i in range(lo, hi)],
        "k long, user_id long, name string",
    )


@pytest.fixture
def seeded(spark, tmp_path):
    """Two commits, blooms attached at each — chain resolution is live."""
    tdir = str(tmp_path / "btbl")
    U.write_table(_rows(spark, 0, 500).repartition(4), tdir)
    attach_blooms(spark, tdir, ["user_id", "name"])
    U.append_rows(spark, tdir, _rows(spark, 5000, 5200).repartition(2))
    attach_blooms(spark, tdir, ["user_id", "name"])
    return tdir


def test_point_lookup_correct_and_prunes(spark, seeded):
    tdir = seeded
    # "u5100" exists only in the second commit's 2 files
    df, info = read_table_point(spark, tdir, "name", "u5100")
    assert [r["k"] for r in df.collect()] == [5100]
    assert info["skipped_bloom"] >= 4  # all first-commit files pruned
    assert info["scanned"] + info["skipped_bloom"] == 6
    # absent value: zero rows; (almost surely) everything pruned
    df2, info2 = read_table_point(spark, tdir, "name", "nosuchuser")
    assert df2.count() == 0
    assert info2["skipped_bloom"] >= 5


def test_never_loses_rows_exhaustive(spark, seeded):
    """Bloom pruning is sound: every present key found, across both
    commits and a numeric column with repeats."""
    tdir = seeded
    for key in (17, 42, 199, 499):
        df, _ = read_table_point(spark, tdir, "user_id", key)
        got = {r["k"] for r in df.collect()}
        full = {
            r["k"]
            for r in U.read_table(spark, tdir)
            .where(F.col("user_id") == key)
            .collect()
        }
        assert got == full and got


def test_chain_resolution_and_missing_sidecar(spark, seeded):
    tdir = seeded
    cur = U.committed_versions(tdir)[-1]
    eb = entry_blooms(tdir, cur)
    owners = {e.split("/", 1)[0] for e, b in eb.items() if b}
    assert len(owners) == 2  # blooms resolved from BOTH commits' manifests
    # nuke one sidecar: its file scans conservatively, answers stay right
    from spookystuff_spark import fsio

    victim = next(iter(eb.values()))["name"]["path"]
    fsio.delete_file(fsio.join(tdir, victim))
    df, info = read_table_point(spark, tdir, "name", "u42")
    assert [r["k"] for r in df.collect()] == [42]


def test_composes_with_deletion_vectors(spark, seeded):
    tdir = seeded
    U.delete_where_dv(spark, tdir, "k = 5100", ["k"])
    df, _ = read_table_point(spark, tdir, "name", "u5100")
    assert df.count() == 0  # bloom says maybe-present, DV hides the row


def test_unattached_table_scans_everything(spark, tmp_path):
    tdir = str(tmp_path / "plain")
    U.write_table(_rows(spark, 0, 100).repartition(3), tdir)
    df, info = read_table_point(spark, tdir, "name", "u7")
    assert [r["k"] for r in df.collect()] == [7]
    assert info["skipped_bloom"] == 0 and info["scanned"] == 3


def test_incremental_bloom_maintenance_after_append(spark, tmp_path):
    """attach_blooms after each append profiles only that commit's own
    files; chain resolution serves the whole table — the per-batch
    maintenance recipe for an append-heavy table."""
    tdir = str(tmp_path / "inc")
    U.write_table(_rows(spark, 0, 200).repartition(2), tdir)
    attach_blooms(spark, tdir, ["name"])
    U.append_rows(spark, tdir, _rows(spark, 9000, 9100).repartition(2))
    attach_blooms(spark, tdir, ["name"])  # O(new files) only
    from spookystuff_spark.sources.bloom_index import entry_blooms

    eb = entry_blooms(tdir, U.committed_versions(tdir)[-1])
    assert all(b.get("name") for b in eb.values())  # every file covered
    df, info = read_table_point(spark, tdir, "name", "u9050")
    assert [r["k"] for r in df.collect()] == [9050]
    assert info["skipped_bloom"] >= 2  # both first-commit files pruned
