"""Incremental decontamination index (operators/decontam_index.py): the
standing gram index folded through insert/update/delete feeds answers
checks identically to the batch ``decontaminate`` over the final benchmark
state; folds are keyed manifest deltas; pruned checks read only the probed
buckets; preimage-less updates refuse."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import spookystuff_spark.operators.decontam_index as D
from spookystuff_spark.operators.ngram import decontaminate
from spookystuff_spark.sources import upsert as U

_S = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
BENCH = [
    (10, _S),
    (20, _S.replace("echo", "ECHO-X")),
    (30, "one two three four five six seven eight nine ten eleven twelve"),
    (40, "unrelated benchmark text with its own distinct running tokens "
         "stretching well past the thirteen token minimum for a gram"),
]
CORPUS = [
    (1, _S + " extra trailing corpus tokens beyond the shared prefix"),
    (2, "one two three four five six seven eight nine ten eleven twelve "
        "thirteen fourteen"),
    (3, "completely clean document with no overlap whatsoever against any "
        "benchmark entry of the standing evaluation suite index"),
    (4, _S.replace("echo", "ECHO-X") + " tail"),
]
N = 13


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _check(spark, idx, **kw):
    return sorted(
        tuple(r)
        for r in D.decontam_check_df(
            spark, idx, _df(spark, CORPUS), **kw
        ).collect()
    )


def _batch_expect(spark, bench_rows):
    return sorted(
        tuple(r)
        for r in decontaminate(
            _df(spark, CORPUS), _df(spark, bench_rows), "doc_id", "text", n=N
        ).collect()
    )


def test_fold_through_all_feed_shapes_matches_batch(spark, tmp_path):
    """build → append → preimage-logged UPDATE → delete: after each fold
    the check equals the batch operator over the then-current benchmark —
    updates retract old grams and contribute new ones in one commit (the
    signed-delta property BM25/LSH can't have)."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH[:2]), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=4)
    assert _check(spark, idx) == _batch_expect(spark, BENCH[:2])

    U.append_rows(spark, src, _df(spark, BENCH[2:]))
    assert D.refresh_decontam_index(spark, src, idx) is not None
    assert _check(spark, idx) == _batch_expect(spark, BENCH)

    upd = (20, "twenty rewritten benchmark tokens that no longer resemble "
               "the original corpus prefix in any thirteen gram window")
    U.upsert(spark, src, _df(spark, [upd]), ["doc_id"], feed_preimages=True)
    assert D.refresh_decontam_index(spark, src, idx) is not None
    cur = [b for b in BENCH if b[0] != 20] + [upd]
    assert _check(spark, idx) == _batch_expect(spark, cur)

    U.delete_where(spark, src, F.col("doc_id") == 10)
    assert D.refresh_decontam_index(spark, src, idx) is not None
    cur = [b for b in cur if b[0] != 10]
    assert _check(spark, idx) == _batch_expect(spark, cur)
    # exactly-once: nothing new → no-op
    n = len(U.committed_versions(idx))
    assert D.refresh_decontam_index(spark, src, idx) is None
    assert len(U.committed_versions(idx)) == n


def test_fold_is_a_keyed_manifest_delta(spark, tmp_path):
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=4)
    U.append_rows(
        spark, src,
        _df(spark, [(50, "a fresh benchmark sentence of exactly thirteen "
                         "running tokens here now")]),
    )
    v = D.refresh_decontam_index(spark, src, idx)
    raw = U._read_manifest_raw(idx, v)
    assert "files_base" in raw, "decontam fold must commit a manifest delta"


def test_pruned_check_reads_only_probed_buckets(spark, tmp_path, monkeypatch):
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=16)
    want = _check(spark, idx)

    calls = []
    from spookystuff_spark.sources import partitioned_table as PT

    real = PT.read_table_partitions

    def spy(spark_, table_dir, partition_values, **kw):
        calls.append(sorted(partition_values))
        return real(spark_, table_dir, partition_values, **kw)

    monkeypatch.setattr(
        "spookystuff_spark.sources.partitioned_table.read_table_partitions",
        spy,
    )
    # probe docs from parquet so the one-pass claim is plan-checkable
    probe_dir = str(tmp_path / "probe")
    _df(spark, CORPUS[1:2]).write.parquet(probe_dir)
    one = spark.read.parquet(probe_dir)
    checked = D.decontam_check_df(spark, idx, one, prune=True)
    got = sorted(tuple(r) for r in checked.collect())
    assert got == [t for t in want if t[0] == 2]
    assert calls and len(calls[0]) < 16  # pruned, not the whole index
    # one-pass tokenization (r10 punch #3): the gram stream is eagerly
    # checkpointed before the bucket collect, so the CHECK plan reads the
    # checkpoint RDD — the probe parquet never appears in its scan set
    # (pre-r11 the join side re-scanned + re-tokenized the probe source)
    assert not any("probe" in f for f in checked.inputFiles())


def test_pruned_check_refuses_without_keyed_layout(spark, tmp_path):
    """r10 advice: a maintenance commit that stripped the keyed-layout
    record must surface as the SAME explicit rebuild error the refresh
    raises — not a TypeError out of _bucket_expr."""
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=4)
    # simulate the stripped-layout state: rewrite the tip manifest without
    # the agg_buckets/agg_group_cols keys
    cur = U.committed_versions(idx)[-1]
    raw = U._read_manifest_raw(idx, cur)
    from spookystuff_spark.sources.incremental import agg_layout

    import json as _json

    from spookystuff_spark import fsio

    stripped = {
        k: v
        for k, v in raw.items()
        if k not in ("agg_buckets", "agg_group_cols")
    }
    fsio.write_bytes(
        fsio.join(idx, cur, "_MANIFEST.json"),
        _json.dumps(stripped).encode(),
    )
    assert agg_layout(idx) == (None, None)
    with pytest.raises(ValueError, match="build_decontam_index"):
        D.decontam_check_df(
            spark, idx, _df(spark, CORPUS), prune=True
        ).collect()


def test_preimageless_update_refuses(spark, tmp_path):
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=4)
    U.upsert(spark, src, _df(spark, [(10, "rewritten " + _S)]), ["doc_id"])
    with pytest.raises(ValueError, match="preimage"):
        D.refresh_decontam_index(spark, src, idx)


@pytest.mark.parametrize("key_bits", [64, 128])
def test_randomized_schedule_matches_python_model(spark, tmp_path, key_bits):
    """Seeded random schedule of appends, deletes and preimage-logged
    updates of benchmark docs (overlapping texts, short docs below the
    gram width, empty batches, refreshes at random points): the standing
    index's check always equals a pure-Python gram recompute over the
    live benchmark state. Runs at BOTH key widths (r10 punch #6: the
    128-bit composite key must carry through build, fold and check)."""
    import random

    N_T = 4  # 4-gram index: small docs exercise boundaries
    rng = random.Random(20260816)
    words = ["red", "blue", "green", "gold", "iron", "salt", "wolf", "moon"]

    def text(n_tokens):
        return " ".join(rng.choice(words) for _ in range(n_tokens))

    live: dict[int, str] = {}

    def batch(n, start):
        out = []
        for j in range(n):
            k = start + j
            t = text(rng.randrange(2, 10))  # some below the gram width
            live[k] = t
            out.append((k, t))
        return out

    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, batch(5, 0)), src)
    D.build_decontam_index(
        spark, src, idx, n=N_T, n_buckets=4, key_bits=key_bits
    )
    assert D.index_params(idx)["key_bits"] == key_bits  # round-trips
    next_k = 100
    for step in range(10):
        action = rng.choice(["append", "delete", "update", "refresh"])
        if action == "append":
            n = rng.randrange(0, 3)
            if n:
                U.append_rows(spark, src, _df(spark, batch(n, next_k)))
                next_k += n
        elif action == "delete" and live:
            k = rng.choice(sorted(live))
            del live[k]
            U.delete_where(spark, src, F.col("doc_id") == k)
        elif action == "update" and live:
            k = rng.choice(sorted(live))
            t = text(rng.randrange(2, 10))
            live[k] = t
            U.upsert(
                spark, src, _df(spark, [(k, t)]), ["doc_id"],
                feed_preimages=True,
            )
        if action == "refresh" or rng.random() < 0.4:
            D.refresh_decontam_index(spark, src, idx)
    D.refresh_decontam_index(spark, src, idx)

    # pure-Python model: live benchmark grams, then per-probe-doc overlap
    def grams(t):
        toks = t.lower().split()
        return {
            " ".join(toks[i : i + N_T])
            for i in range(len(toks) - N_T + 1)
        }

    bench_grams = set().union(*(grams(t) for t in live.values())) if live else set()
    probe = [(900 + j, text(rng.randrange(2, 12))) for j in range(8)]
    want = sorted(
        (pid, len(grams(t) & bench_grams))
        for pid, t in probe
        if grams(t) & bench_grams
    )
    got = sorted(
        tuple(r)
        for r in D.decontam_check_df(spark, idx, _df(spark, probe)).collect()
    )
    assert got == want
    # the pruned path carries the composite key through _bucket_expr too
    pruned = sorted(
        tuple(r)
        for r in D.decontam_check_df(
            spark, idx, _df(spark, probe), prune=True
        ).collect()
    )
    assert pruned == want


def test_streaming_refresh_follows_cdc(spark, tmp_path):
    """CDC stream → foreachBatch decontam refresh: the streamed index
    answers checks identically to the batch operator over the final
    benchmark state, across insert AND delete micro-batches."""
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    src, idx = str(tmp_path / "src"), str(tmp_path / "idx")
    U.write_table(_df(spark, BENCH[:2]), src)
    D.build_decontam_index(spark, src, idx, n=N, n_buckets=4)
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", src)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(D.streaming_refresh_sink(src, idx))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        U.append_rows(spark, src, _df(spark, BENCH[2:]))
        q.processAllAvailable()
        U.delete_where(spark, src, F.col("doc_id") == 10)
        q.processAllAvailable()
    finally:
        q.stop()
    assert _check(spark, idx) == _batch_expect(
        spark, [b for b in BENCH if b[0] != 10]
    )
