"""Incremental IVF index over the lakehouse (operators/ann_index.py):
incrementally maintained index ≡ from-scratch rebuild, queries probe only
their cells, refresh is exactly-once, non-insert feeds refuse."""

from __future__ import annotations

import pytest

from spookystuff_spark.operators import ann_index as A
from spookystuff_spark.sources import upsert as U


def _vec(i: int, dim: int = 8) -> list[float]:
    # deterministic, spread across two obvious clusters
    base = [0.0] * dim
    base[i % dim] = 1.0
    base[(i * 3) % dim] += 0.25
    if i % 2 == 0:
        base = [x + 5.0 for x in base]
    return base


def _emb(spark, ids):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


@pytest.fixture
def built(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    U.write_table(_emb(spark, range(40)), src)
    A.build_ann_index(spark, src, idx, n_cells=4)
    return src, idx


def _index_state(spark, idx):
    return {
        (r["vec_id"], r["cell"])
        for r in U.read_table(spark, idx).select("vec_id", "cell").collect()
    }


def test_incremental_equals_rebuild(spark, built, tmp_path):
    src, idx = built
    U.append_rows(spark, src, _emb(spark, range(100, 120)))
    U.append_rows(spark, src, _emb(spark, range(200, 210)))
    assert A.refresh_ann_index(spark, src, idx) is not None

    # from-scratch index over the SAME corpus with the SAME centroids
    idx2 = str(tmp_path / "idx2")
    A._save_centroids(idx2, A.load_centroids(idx), "embedding")
    from spookystuff_spark.sources.partitioned_table import (
        write_table_partitioned,
    )

    assigned = A._assign_cells(
        U.read_table(spark, src), "vec_id", "embedding",
        A.load_centroids(idx),
    )
    write_table_partitioned(assigned, idx2, "cell", change_feed=False)
    assert _index_state(spark, idx) == _index_state(spark, idx2)

    # exactly-once: nothing new → no-op
    n = len(U.committed_versions(idx))
    assert A.refresh_ann_index(spark, src, idx) is None
    assert len(U.committed_versions(idx)) == n


def test_query_matches_bruteforce_and_prunes(spark, built, monkeypatch):
    import numpy as np

    src, idx = built
    queries = [(0, _vec(3)), (1, _vec(10))]

    calls = []
    from spookystuff_spark.operators import ann_index as mod
    from spookystuff_spark.sources import partitioned_table as PT

    real = PT.read_table_partitions

    def spy(spark_, table_dir, partition_values, version=None):
        calls.append(sorted(partition_values))
        return real(spark_, table_dir, partition_values, version)

    monkeypatch.setattr(mod, "read_table_partitions", spy)
    got = {
        (r["query_id"], r["rn"]): r["vec_id"]
        for r in A.ann_query(spark, idx, queries, k=3, nprobe=4).collect()
    }
    # nprobe=4 == n_cells → exhaustive: must equal full brute force
    emb = {r["vec_id"]: r["embedding"] for r in U.read_table(spark, src).collect()}
    for qid, qv in queries:
        q = np.array(qv)
        scores = sorted(
            (
                (
                    round(
                        float(q @ np.array(v))
                        / (np.linalg.norm(q) * np.linalg.norm(v))
                        + 1e-6,
                        4,
                    ),
                    i,
                )
                for i, v in emb.items()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, i) in enumerate(scores[:3], start=1):
            assert got[(qid, rank)] == i
    assert calls and all(len(c) <= 4 for c in calls)

    # pruned probe: nprobe=1 touches exactly the queries' home cells
    calls.clear()
    A.ann_query(spark, idx, queries, k=3, nprobe=1).collect()
    assert calls and len(calls[0]) <= 2  # ≤ one cell per query


def test_refresh_refuses_update_feed(spark, built):
    import pyspark.sql.functions as F

    src, idx = built
    U.upsert(
        spark, src,
        spark.createDataFrame(
            [(0, _vec(7))], "vec_id long, embedding array<double>"
        ),
        ["vec_id"], feed_preimages=True,
    )
    with pytest.raises(ValueError, match="rebuild instead"):
        A.refresh_ann_index(spark, src, idx)


def test_delete_feed_folds_as_dv(spark, built):
    """A source delete hides the vectors via an O(deleted) key vector
    (one metadata commit, zero assignment work) and queries answer over
    the post-delete corpus exactly."""
    import pyspark.sql.functions as F

    src, idx = built
    n_versions = len(U.committed_versions(idx))
    U.delete_where(spark, src, F.col("vec_id").isin(0, 7))
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert len(U.committed_versions(idx)) == n_versions + 1
    m = U._read_manifest_raw(idx, U.committed_versions(idx)[-1])
    assert m["kind"] == "delete_dv" and m.get("dv")
    state = _index_state(spark, idx)
    assert {i for i, _ in state} == set(range(40)) - {0, 7}
    # probe results never surface the deleted ids
    res = A.ann_query(spark, idx, [(0, _vec(0)), (1, _vec(7))], k=40, nprobe=4)
    assert {r["vec_id"] for r in res.collect()} & {0, 7} == set()
    # exactly-once
    assert A.refresh_ann_index(spark, src, idx) is None


def test_mixed_insert_delete_and_reinsert_contract(spark, built, tmp_path):
    """Mixed insert+delete of different ids applies both and the final
    state equals a rebuild over the live corpus; same-id in one range
    and re-insert of a DV-hidden id refuse; force_dv compaction heals."""
    import pyspark.sql.functions as F

    src, idx = built
    U.append_rows(spark, src, _emb(spark, range(300, 310)))
    U.delete_where(spark, src, F.col("vec_id") == 5)
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert {i for i, _ in _index_state(spark, idx)} == (
        set(range(40)) - {5}
    ) | set(range(300, 310))
    # same-id insert then delete in SUCCESSIVE source versions: the
    # per-version replay folds both in order — net absent, no refusal
    U.append_rows(spark, src, _emb(spark, [400]))
    U.delete_where(spark, src, F.col("vec_id") == 400)
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert 400 not in {i for i, _ in _index_state(spark, idx)}
    # re-insert of a DV-hidden id: refuse until force_dv materializes
    U.delete_where(spark, src, F.col("vec_id") == 6)
    A.refresh_ann_index(spark, src, idx)
    U.append_rows(spark, src, _emb(spark, [6]))
    with pytest.raises(ValueError, match="force_dv"):
        A.refresh_ann_index(spark, src, idx)
    assert A.compact_ann_index(
        spark, idx, max_files_per_cell=10_000, force_dv=True
    ) is not None
    assert not U._read_manifest_raw(idx, U.committed_versions(idx)[-1]).get("dv")
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert {i for i, _ in _index_state(spark, idx)} == (
        (set(range(40)) - {5}) | set(range(300, 310))
    )


def test_streaming_refresh_follows_cdc(spark, tmp_path, built):
    """CDC stream → foreachBatch ANN refresh: the streamed index lands in
    the same state the batch refresh produces, across two micro-batches."""
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    src, idx = built
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", src)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(A.streaming_refresh_sink(src, idx))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        U.append_rows(spark, src, _emb(spark, range(100, 110)))
        q.processAllAvailable()
        U.append_rows(spark, src, _emb(spark, range(200, 205)))
        q.processAllAvailable()
    finally:
        q.stop()
    got = _index_state(spark, idx)
    assert {v for v, _ in got} == set(range(40)) | set(range(100, 110)) | set(
        range(200, 205)
    )
    # streamed fold ≡ batch fold over the same corpus + centroids
    idx2 = str(tmp_path / "idx2")
    A._save_centroids(idx2, A.load_centroids(idx), "embedding")
    from spookystuff_spark.sources.partitioned_table import (
        write_table_partitioned,
    )

    assigned = A._assign_cells(
        U.read_table(spark, src), "vec_id", "embedding", A.load_centroids(idx)
    )
    write_table_partitioned(assigned, idx2, "cell", change_feed=False)
    assert got == _index_state(spark, idx2)


def test_contiguous_appends_fold_as_one_commit(spark, built):
    """K contiguous append-kind source versions batch into ONE assignment
    pass + ONE MERGE commit (r9 punch #5), with the same final cell
    assignments as assigning the full corpus under the same centroids."""
    src, idx = built
    for ids in (range(100, 110), range(110, 120), range(200, 210)):
        U.append_rows(spark, src, _emb(spark, ids))
    n0 = len(U.committed_versions(idx))
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert len(U.committed_versions(idx)) == n0 + 1, "3 appends != 1 fold"
    assigned = A._assign_cells(
        U.read_table(spark, src), "vec_id", "embedding",
        A.load_centroids(idx),
    )
    want = {(r["vec_id"], r["cell"]) for r in assigned.collect()}
    assert _index_state(spark, idx) == want


def test_query_df_matches_list_path(spark, built, monkeypatch):
    """ann_query_df (executor-side probe-cell assignment, bounded
    distinct-cell collect) returns exactly the list path's neighbors,
    and still prunes the read to the probed cells."""
    src, idx = built
    queries = [(int(i), _vec(i)) for i in (1, 2, 7, 30)]
    key = lambda r: (r["query_id"], r["rn"])
    want = sorted(
        A.ann_query(spark, idx, queries, k=3, nprobe=2).collect(), key=key
    )

    calls = []
    from spookystuff_spark.sources import partitioned_table as PT

    real = PT.read_table_partitions

    def spy(spark_, table_dir, partition_values, **kw):
        calls.append(sorted(partition_values))
        return real(spark_, table_dir, partition_values, **kw)

    import spookystuff_spark.operators.ann_index as A2

    monkeypatch.setattr(A2, "read_table_partitions", spy)
    qdf = spark.createDataFrame(
        queries, "query_id long, qvec array<double>"
    )
    got = sorted(
        A2.ann_query_df(spark, idx, qdf, k=3, nprobe=2).collect(), key=key
    )
    assert got == want
    assert want  # non-vacuous
    # the probed-cell list matches the list path's driver-side resolution
    import numpy as np

    c = A.load_centroids(idx)
    qv = np.array([q[1] for q in queries])
    d2 = (qv * qv).sum(1)[:, None] - 2 * (qv @ c.T) + (c * c).sum(1)[None, :]
    probe = sorted(
        {f"c{int(i)}" for row in np.argsort(d2, 1, kind="stable")[:, :2] for i in row}
    )
    assert calls == [probe]


def test_query_df_empty_batch(spark, built):
    src, idx = built
    qdf = spark.createDataFrame([], "query_id long, qvec array<double>")
    assert A.ann_query_df(spark, idx, qdf, k=3).count() == 0


def test_retrain_preserves_corpus_and_heals_crashes(spark, built, monkeypatch):
    """Retrain on the index's own vectors: same live id set, exhaustive
    queries equal brute force under the NEW centroids; a crash before the
    table commit discards the staged centroids, a crash before the
    sidecar promote gets healed by the next loader — probes can never mix
    a layout with foreign centroids."""
    import numpy as np

    from spookystuff_spark import fsio

    src, idx = built
    ids_before = {i for i, _ in _index_state(spark, idx)}

    # crash BEFORE the table commit: staging discarded, old state intact
    real = A.write_table_partitioned
    monkeypatch.setattr(
        A, "write_table_partitioned",
        lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("boom")),
    )
    old_centroids = A.load_centroids(idx)
    with pytest.raises(RuntimeError, match="boom"):
        A.retrain_ann_index(spark, idx, n_cells=2)
    monkeypatch.setattr(A, "write_table_partitioned", real)
    assert fsio.exists(fsio.join(idx, A._STAGING))
    assert np.array_equal(A.load_centroids(idx), old_centroids)  # healed
    assert not fsio.exists(fsio.join(idx, A._STAGING))

    # crash AFTER the commit, BEFORE the promote: loader promotes
    real_write = fsio.write_bytes
    def crash_promote(path, data):
        if path.endswith(A._CENTROIDS) and fsio.exists(
            fsio.join(idx, A._STAGING)
        ):
            raise RuntimeError("promote crash")
        return real_write(path, data)

    monkeypatch.setattr(A.fsio, "write_bytes", crash_promote)
    with pytest.raises(RuntimeError, match="promote crash"):
        A.retrain_ann_index(spark, idx, n_cells=2)
    monkeypatch.setattr(A.fsio, "write_bytes", real_write)
    healed = A.load_centroids(idx)  # triggers _heal_staging
    assert len(healed) == 2 and not np.array_equal(healed, old_centroids[:2])
    assert {i for i, _ in _index_state(spark, idx)} == ids_before

    # post-retrain: exhaustive probe equals brute force over the corpus
    queries = [(0, _vec(3)), (1, _vec(10))]
    got = {
        (r["query_id"], r["rn"]): r["vec_id"]
        for r in A.ann_query(spark, idx, queries, k=3, nprobe=2).collect()
    }
    emb = {r["vec_id"]: r["embedding"] for r in U.read_table(spark, src).collect()}
    for qid, qv in queries:
        q = np.array(qv)
        scores = sorted(
            (
                (round(float(q @ np.array(v)) / (np.linalg.norm(q) * np.linalg.norm(v)) + 1e-6, 4), i)
                for i, v in emb.items()
            ),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (_, i) in enumerate(scores[:3], start=1):
            assert got[(qid, rank)] == i
    # and the refresh still works after the retrain
    U.append_rows(spark, src, _emb(spark, range(500, 505)))
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert {i for i, _ in _index_state(spark, idx)} == ids_before | set(range(500, 505))


def test_drift_signal_trips_and_retrain_recovers_recall(
    spark, tmp_path, caplog
):
    """r10 punch #4: a deliberately drifted feed trips the refresh-time
    drift warning (batch mean assign-d2 vs the build-time stats the
    sidecar carries), ann_drift() exposes the record, and the
    recall-vs-bruteforce audit improves after retrain_ann_index — the
    operational loop that makes a standing IVF index trustworthy."""
    import logging

    import numpy as np

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    # two tight build clusters on distinct axes
    rows = [
        (i, [10.0 + 0.01 * (i % 5), 0.0, 0.0, 0.0]) for i in range(20)
    ] + [
        (100 + i, [0.0, 10.0 + 0.01 * (i % 5), 0.0, 0.0]) for i in range(20)
    ]
    sch = "vec_id long, embedding array<double>"
    U.write_table(spark.createDataFrame(rows, sch), src)
    A.build_ann_index(spark, src, idx, n_cells=2)
    assert A.ann_drift(idx) is None  # no insert fold yet
    c = A.load_centroids(idx)
    assert len(c) == 2

    # drifted batch: tight far-away cluster sitting ON the old Voronoi
    # boundary (orthogonal lift from the centroid midpoint), members
    # nudged alternately toward each centroid — the frozen layout splits
    # them across both cells, so an nprobe=1 probe can only ever see half
    m = (c[0] + c[1]) / 2.0
    d = c[0] - c[1]
    d = d / np.linalg.norm(d)
    lift = np.array([0.0, 0.0, 50.0, 0.0])
    drift_rows = []
    for j in range(16):
        eps = 0.05 if j % 2 == 0 else -0.05
        v = m + lift + eps * d + 0.001 * j * np.array([0.0, 0.0, 0.0, 1.0])
        drift_rows.append((500 + j, [float(x) for x in v]))
    U.append_rows(spark, src, spark.createDataFrame(drift_rows, sch))
    with caplog.at_level(
        logging.WARNING, logger="spookystuff_spark.operators.ann_index"
    ):
        assert A.refresh_ann_index(spark, src, idx) is not None
    assert any("drifted" in r.message for r in caplog.records)
    rec = A.ann_drift(idx)
    assert rec is not None and rec["ratio"] > A.DRIFT_WARN_RATIO
    assert rec["batch"]["n"] == 16

    def recall_at(k, q):
        emb = {
            r["vec_id"]: r["embedding"]
            for r in U.read_table(spark, src).collect()
        }
        qv = np.array(q)
        exact = [
            i
            for _, i in sorted(
                (
                    (
                        round(
                            float(qv @ np.array(v))
                            / (np.linalg.norm(qv) * np.linalg.norm(v))
                            + 1e-6,
                            4,
                        ),
                        i,
                    )
                    for i, v in emb.items()
                ),
                key=lambda t: (-t[0], t[1]),
            )[:k]
        ]
        got = {
            r["vec_id"]
            for r in A.ann_query(
                spark, idx, [(0, q)], k=k, nprobe=1
            ).collect()
        }
        return len(got & set(exact)) / k

    q = [float(x) for x in (m + lift)]  # the drifted cluster's own center
    before = recall_at(8, q)
    assert before < 1.0  # the split layout can't serve the cluster

    # retrain with a cell for the new cluster: recall audit recovers
    A.retrain_ann_index(spark, idx, n_cells=3)
    assert A.ann_drift(idx) is None  # stale record cleared with the
    # old quantizer; the baseline reset rides the promoted sidecar
    after = recall_at(8, q)
    assert after > before
    assert after == 1.0


def test_fold_runs_one_distance_pass(spark, built, monkeypatch):
    """r11 verdict #1: an insert fold with an active drift baseline must
    run exactly ONE vectorized assignment pass — the drift stats derive
    from the same (id, cell, _d2) output that feeds the MERGE, never a
    second full distance computation."""
    src, idx = built
    calls = {"n": 0}
    real = A._assign_cells

    def counting(df, id_col, vec_col, centroids, with_d2=False):
        calls["n"] += 1
        return real(df, id_col, vec_col, centroids, with_d2=with_d2)

    monkeypatch.setattr(A, "_assign_cells", counting)
    U.append_rows(spark, src, _emb(spark, range(300, 320)))
    assert A.refresh_ann_index(spark, src, idx) is not None
    assert calls["n"] == 1
    # the drift record still lands, derived from that single pass
    rec = A.ann_drift(idx)
    assert rec is not None and rec["batch"]["n"] == 20
    assert rec["batch"]["mean_d2"] is not None
    # and the index state carries no stats column
    assert "_d2" not in U.read_table(spark, idx).columns
