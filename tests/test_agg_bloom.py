"""Commit-level aggregate blooms (r9): one small union bitset per
manifest, consulted BEFORE per-file specs — a miss probe on a
checkpoint-consolidated table reads ≤ one sidecar per chain manifest
(1 + CHECKPOINT_EVERY small objects), never one per file. Coverage is
conservative: any manifest recording specs without agg coverage disables
the fast path; hits and uncovered tables fall through to the per-file
path unchanged."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark import fsio
from spookystuff_spark.sources import upsert as U
from spookystuff_spark.sources.bloom_index import read_table_point


def _rows(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") * 2).cast("long").alias("val"),
    )


def _bloom_table(spark, t, monkeypatch, inline_max=1000):
    """Table with bloom_cols on every commit, forced past a checkpoint."""
    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 2)
    monkeypatch.setattr(U, "CHECKPOINT_INLINE_MAX", inline_max)
    U.write_table(_rows(spark, 0, 50).repartition(4), t, bloom_cols=["k"])
    for i in range(4):
        U.append_rows(
            spark, t, _rows(spark, 1000 + 50 * i, 1050 + 50 * i),
            bloom_cols=["k"],
        )
    tip = U.committed_versions(t)[-1]
    chain = [tip] + U._fold_chain(t, tip)
    ckpt = next(
        v for v in chain if U._is_full_manifest(U._read_manifest_raw(t, v))
    )
    assert U._read_manifest_raw(t, ckpt).get("consolidated") is True
    return tip, chain, ckpt


def _bloom_read_spy(monkeypatch):
    reads: list[str] = []
    real = fsio.read_bytes

    def spy(path):
        if path.endswith(".bloom"):
            reads.append(fsio.basename(path))
        return real(path)

    monkeypatch.setattr(fsio, "read_bytes", spy)
    return reads


def test_miss_probe_reads_only_agg_sidecars(spark, tmp_path, monkeypatch):
    """THE counting pin: a definite miss on a consolidated chain reads
    ONLY aggregate sidecars — at most one per chain manifest — and zero
    per-file bitsets, while still pruning every spec-covered file."""
    t = str(tmp_path / "t")
    tip, chain, ckpt = _bloom_table(spark, t, monkeypatch)
    reads = _bloom_read_spy(monkeypatch)
    df, info = read_table_point(spark, t, "k", 987_654_321)
    assert df.count() == 0
    assert info["skipped_bloom"] > 0 and info["scanned"] == 0
    assert reads and all(n.startswith("agg_") for n in reads), reads
    assert len(reads) <= len(chain) + 1, reads


def test_hit_probe_still_finds_the_row(spark, tmp_path, monkeypatch):
    t = str(tmp_path / "t")
    _bloom_table(spark, t, monkeypatch)
    # an old (pre-checkpoint) value and a fresh (post-checkpoint) one
    for probe in (7, 1170):
        df, info = read_table_point(spark, t, "k", probe)
        assert [r["k"] for r in df.collect()] == [probe]
        assert info["scanned"] >= 1


def test_uncovered_manifest_disables_fast_path(spark, tmp_path, monkeypatch):
    """Simulated pre-r9 manifest (specs without agg coverage) anywhere in
    the chain: the fast path bails and the probe tests per-file sidecars
    — conservative, still correct."""
    import json

    t = str(tmp_path / "t")
    tip, chain, ckpt = _bloom_table(spark, t, monkeypatch)
    raw = U._read_manifest_raw(t, tip)
    raw.pop("agg_blooms", None)
    raw.pop("bloom_spec_cols", None)
    fsio.write_bytes(
        fsio.join(t, tip, U._MANIFEST),
        json.dumps(raw, separators=(",", ":")).encode(),
    )
    reads = _bloom_read_spy(monkeypatch)
    df, info = read_table_point(spark, t, "k", 987_654_321)
    assert df.count() == 0
    assert any(not n.startswith("agg_") for n in reads), (
        "per-file sidecars were never consulted despite unknown coverage"
    )
    assert info["skipped_bloom"] > 0


def test_agg_fast_path_on_parquet_checkpoint(spark, tmp_path, monkeypatch):
    """The distributed-plan probe honors the aggregate miss too: results
    identical, full pruning, and a hit still lands."""
    t = str(tmp_path / "t")
    _bloom_table(spark, t, monkeypatch, inline_max=3)
    tip = U.committed_versions(t)[-1]
    chain = [tip] + U._fold_chain(t, tip)
    ckpt_raw = next(
        r
        for v in chain
        if U._is_full_manifest(r := U._read_manifest_raw(t, v))
    )
    assert U._ENTRIES_REF in ckpt_raw  # genuinely on the plan path
    df, info = read_table_point(spark, t, "k", 987_654_321)
    assert df.count() == 0 and info["scanned"] == 0
    assert info["skipped_bloom"] > 0
    df2, _ = read_table_point(spark, t, "k", 1170)
    assert [r["k"] for r in df2.collect()] == [1170]


def test_attach_blooms_covers_later_probes(spark, tmp_path, monkeypatch):
    """attach_blooms (the post-hoc path) records agg coverage too: a
    checkpointed chain built from attach-only commits still fast-misses."""
    from spookystuff_spark.sources.bloom_index import attach_blooms

    monkeypatch.setattr(U, "CHECKPOINT_EVERY", 2)
    t = str(tmp_path / "t")
    U.write_table(_rows(spark, 0, 20).repartition(2), t)
    attach_blooms(spark, t, ["k"])
    for i in range(4):
        U.append_rows(spark, t, _rows(spark, 100 + 20 * i, 120 + 20 * i))
        attach_blooms(spark, t, ["k"])
    reads = _bloom_read_spy(monkeypatch)
    df, info = read_table_point(spark, t, "k", 987_654_321)
    assert df.count() == 0 and info["scanned"] == 0
    assert reads and all(n.startswith("agg_") for n in reads), reads
