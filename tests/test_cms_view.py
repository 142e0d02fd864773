"""Incremental CMS token-frequency view (sources/sketch_view.py): the
signed-counter fold composes inserts, deletes AND preimage-logged updates
in one commit (linear counters — the feed shapes the monotone HLL view
refuses), the standing view equals a from-scratch cms_sketch over the
live corpus, state stays bounded by depth × width, preimage-less upserts
refuse, watermark exactly-once, streaming CDC."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import spookystuff_spark.sources.sketch_view as SV
from spookystuff_spark.operators.sketch import cms_query, cms_sketch
from spookystuff_spark.sources import upsert as U

DEPTH, WIDTH = 4, 64  # narrow grid: collisions exercised at test scale
TERMS = ["red", "blue", "wolf", "absent-term"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_est(spark, src):
    docs = U.read_table(spark, src)
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"(\S+)"), 1)
        ).alias("tok")
    )
    sk = cms_sketch(toks, "tok", depth=DEPTH, width=WIDTH)
    return {
        (r["term"], r["est"])
        for r in cms_query(
            spark, sk, TERMS, depth=DEPTH, width=WIDTH
        ).collect()
    }


def _view_est(spark, dst):
    return {
        (r["term"], r["est"])
        for r in SV.cms_view_query(spark, dst, TERMS).collect()
    }


ROWS = [
    (1, "red blue red wolf"),
    (2, "blue blue moon"),
    (3, "wolf red iron salt"),
    (4, "gold gold gold red"),
]


def test_fold_through_all_feed_shapes_matches_batch(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "cms")
    U.write_table(_df(spark, ROWS), src)
    SV.build_cms_token_view(
        spark, src, dst, depth=DEPTH, width=WIDTH, dst_buckets=2
    )
    assert _view_est(spark, dst) == _batch_est(spark, src)
    # insert batch
    U.append_rows(spark, src, _df(spark, [(5, "red red blue")]))
    # preimage-logged update: doc 2 loses its blues, gains wolves
    U.upsert(
        spark, src, _df(spark, [(2, "wolf wolf")]), ["doc_id"],
        feed_preimages=True,
    )
    # delete doc 4 entirely
    U.delete_where(spark, src, F.col("doc_id") == 4)
    # ONE fold for the whole backlog (no per-version replay needed)
    assert SV.refresh_cms_token_view(spark, src, dst) is not None
    assert _view_est(spark, dst) == _batch_est(spark, src)
    # the absent term reads pure collision mass, identically in both
    # (present in the comparison set by construction)
    # state bound: never more than depth*width live cells
    assert U.read_table(spark, dst).count() <= DEPTH * WIDTH
    # exactly-once: nothing new → None
    n = len(U.committed_versions(dst))
    assert SV.refresh_cms_token_view(spark, src, dst) is None
    assert len(U.committed_versions(dst)) == n


def test_randomized_schedule_matches_batch(spark, tmp_path):
    """Seeded random schedule of appends, preimage updates and deletes
    with refreshes at random points: the standing counter table always
    equals a from-scratch sketch of the live corpus."""
    import random

    rng = random.Random(20260816)
    words = ["red", "blue", "wolf", "moon", "iron", "salt"]

    def text():
        return " ".join(
            rng.choice(words) for _ in range(rng.randrange(1, 8))
        )

    live: dict[int, str] = {}
    src, dst = str(tmp_path / "src"), str(tmp_path / "cms")
    rows = []
    for k in range(6):
        live[k] = text()
        rows.append((k, live[k]))
    U.write_table(_df(spark, rows), src)
    SV.build_cms_token_view(
        spark, src, dst, depth=DEPTH, width=WIDTH, dst_buckets=2
    )
    next_k = 100
    for _ in range(8):
        action = rng.choice(["append", "delete", "update", "refresh"])
        if action == "append":
            live[next_k] = text()
            U.append_rows(spark, src, _df(spark, [(next_k, live[next_k])]))
            next_k += 1
        elif action == "delete" and live:
            k = rng.choice(sorted(live))
            del live[k]
            U.delete_where(spark, src, F.col("doc_id") == k)
        elif action == "update" and live:
            k = rng.choice(sorted(live))
            live[k] = text()
            U.upsert(
                spark, src, _df(spark, [(k, live[k])]), ["doc_id"],
                feed_preimages=True,
            )
        if action == "refresh" or rng.random() < 0.4:
            SV.refresh_cms_token_view(spark, src, dst)
    SV.refresh_cms_token_view(spark, src, dst)
    assert _view_est(spark, dst) == _batch_est(spark, src)


def test_preimageless_update_refuses(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "cms")
    U.write_table(_df(spark, ROWS), src)
    SV.build_cms_token_view(
        spark, src, dst, depth=DEPTH, width=WIDTH, dst_buckets=2
    )
    U.upsert(spark, src, _df(spark, [(1, "rewritten")]), ["doc_id"])
    with pytest.raises(ValueError, match="preimage"):
        SV.refresh_cms_token_view(spark, src, dst)


def test_feedless_version_advances_watermark_o1(spark, tmp_path):
    from spookystuff_spark.sources.incremental import last_processed_version

    src, dst = str(tmp_path / "src"), str(tmp_path / "cms")
    U.write_table(_df(spark, ROWS), src)
    SV.build_cms_token_view(
        spark, src, dst, depth=DEPTH, width=WIDTH, dst_buckets=2
    )
    U.compact(spark, src)
    v = SV.refresh_cms_token_view(spark, src, dst)
    assert v is not None
    assert last_processed_version(dst) == U.committed_versions(src)[-1]
    assert U._read_manifest_raw(dst, v).get("files_add") == []
    assert _view_est(spark, dst) == _batch_est(spark, src)


def test_streaming_refresh_follows_cdc(spark, tmp_path):
    from spookystuff_spark.sources.versioned_source import register as _reg

    _reg(spark)
    src, dst = str(tmp_path / "src"), str(tmp_path / "cms")
    U.write_table(_df(spark, ROWS), src)
    SV.build_cms_token_view(
        spark, src, dst, depth=DEPTH, width=WIDTH, dst_buckets=2
    )
    stream = (
        spark.readStream.format("spooky_versioned")
        .option("path", src)
        .option("changeFeed", "true")
        .option("startingVersion", "0")
        .load()
    )
    q = (
        stream.writeStream.foreachBatch(
            SV.cms_streaming_refresh_sink(src, dst)
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        U.append_rows(spark, src, _df(spark, [(10, "red wolf wolf")]))
        q.processAllAvailable()
        U.delete_where(spark, src, F.col("doc_id") == 2)
        q.processAllAvailable()
    finally:
        q.stop()
    assert _view_est(spark, dst) == _batch_est(spark, src)
