"""Connected components (dedup clustering) and streaming fetch."""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext


def test_connected_components_basic(spark):
    from spookystuff_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (7, 7), (10, 11), (11, 12), (12, 10)],
        ["src", "dst"],
    )
    comps = {r.node: r.component for r in connected_components(edges).collect()}
    dist = {
        r.node: r.component
        for r in connected_components(edges, local_threshold=0).collect()
    }
    assert comps == dist  # local fast path ≡ distributed propagation
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[5] == comps[6] == 5
    assert comps[7] == 7
    assert comps[10] == comps[11] == comps[12] == 10
    # distinct components stay distinct
    assert len({comps[1], comps[5], comps[7], comps[10]}) == 4


def test_connected_components_empty_edges(spark):
    """Nothing near-duplicated → empty frame with the right schema, not a
    schema-inference crash (hit by q_corpus_pipeline on clean corpora)."""
    from spookystuff_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], ["src", "dst"]).filter("src > 99")
    out = connected_components(edges)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["node", "component"]
    assert out.schema["node"].dataType.typeName() == "long"


def test_corpus_pipeline_composes(spark):
    from spookystuff_spark.queries import EXTRA_BENCH, load_all_query_modules

    load_all_query_modules()
    out = EXTRA_BENCH["q_corpus_pipeline"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert {f.name for f in out.schema.fields} == {
        "doc_id", "chunk_idx", "chunk_tokens",
    }
    # chunks are unique per (doc, idx) and non-empty
    keys = [(r.doc_id, r.chunk_idx) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(r.chunk_tokens > 0 for r in rows)


def test_connected_components_chain_converges(spark):
    """A 12-node path graph needs multiple propagation rounds."""
    from spookystuff_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["src", "dst"]
    )
    # force the DISTRIBUTED path (local fast path covered by other tests)
    comps = connected_components(edges, max_iter=20, local_threshold=0).collect()
    assert {r.component for r in comps} == {0}
    assert len(comps) == 13


def test_dedup_pairs_to_clusters(spark):
    """The dedup pipeline composition: near-dup pairs → canonical clusters."""
    from spookystuff_spark.operators.dedup import minhash_near_duplicates
    from spookystuff_spark.operators.graph import connected_components

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base.replace("lazy", "sleepy")},
        {"doc_id": 2, "text": base},
        {"doc_id": 3, "text": "entirely different content here about engines"},
    ]
    pairs = minhash_near_duplicates(
        spark.createDataFrame(rows), "doc_id", "text", threshold=0.5
    )
    comps = {
        r.node: r.component
        for r in connected_components(pairs, "id_a", "id_b").collect()
    }
    assert comps.get(0) == comps.get(1) == comps.get(2) == 0  # one cluster, rep=0
    assert 3 not in comps  # singletons don't appear in the edge list


def test_stream_fetch_to_parquet(spark, tmp_path):
    """Streaming crawl: uri drops → fetch per micro-batch → docs parquet;
    re-delivered uris hit the cache (zero redundant remote fetches)."""
    from spookystuff_spark.streaming.fetch_stream import stream_fetch_to_parquet

    mem_cache.clear()
    tag = uuid.uuid4().hex[:8]
    site = tmp_path / "site"
    site.mkdir()
    for i in range(3):
        (site / f"{tag}_{i}.html").write_text(
            f"<html><head><title>S{i}</title></head></html>"
        )

    # two uri drops; second re-delivers uri 1 (at-least-once semantics)
    drops = tmp_path / "drops"
    drops.mkdir()
    import pandas as pd

    pd.DataFrame({"page": [f"{tag}_0.html", f"{tag}_1.html"]}).to_parquet(
        drops / "d1.parquet"
    )
    pd.DataFrame({"page": [f"{tag}_1.html", f"{tag}_2.html"]}).to_parquet(
        drops / "d2.parquet"
    )

    sctx = SpookyContext(
        spark, SpookyConf(dfs_cache_root=str(tmp_path / "cache"))
    )
    uri_stream = (
        spark.readStream.schema("page string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(drops))
    )
    q = stream_fetch_to_parquet(
        sctx,
        uri_stream,
        Wget(f"file://{site}/{{page}}"),
        sink_dir=str(tmp_path / "docs"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    docs = spark.read.parquet(str(tmp_path / "docs"))
    rows = docs.collect()
    assert len(rows) == 4  # 2 + 2 observation rows (uri 1 twice)
    assert all(r.success for r in rows)
    # the re-delivered uri must have come from cache, not remote
    m = sctx.metrics.snapshot()
    assert m["pages_from_remote"] == 3
    assert m["pages_from_cache"] >= 1
