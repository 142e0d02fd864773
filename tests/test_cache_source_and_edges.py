"""Wayback time-travel reads, cyclic-graph explore, doc-cache source, TSV
fixture ingestion (FIXTURES.md §3)."""

from __future__ import annotations

import time

import pytest

from spookystuff_spark.actions import Trace, Wayback, Wget, fetch_trace
from spookystuff_spark.caching import dfs as dfs_cache
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.doc.observation import now_ms
from spookystuff_spark.functions.extractors import S


def test_wayback_reads_older_cache_entry(tmp_path):
    """Wayback pins the cache-read upper bound (AbstractDocCache.scala:64-96):
    with two cached generations, a wayback before gen2 must return gen1."""
    mem_cache.clear()
    root = str(tmp_path / "dfs")
    p = tmp_path / "page.html"
    conf = SpookyConf(dfs_cache_root=root, fetch_retries=1)
    t = Trace((Wget(f"file://{p}"),))
    key = t.dry_run()[0].key

    p.write_text("<html><body>v1</body></html>")
    obs1 = fetch_trace(t, conf)
    t1 = now_ms()
    time.sleep(0.05)
    # force refetch of v2 by clearing caches (TTL not yet expired)
    mem_cache.clear()
    p.write_text("<html><body>v2</body></html>")
    dfs_cache.put(root, key, fetch_trace(t, conf.copy(cache_read=False)), now_ms())
    mem_cache.clear()

    # plain fetch sees the newest generation
    newest = fetch_trace(t, conf)
    assert b"v2" in newest[0].bytes()
    mem_cache.clear()

    # wayback to t1 sees the first generation
    t_way = Trace((Wayback(ts_ms=t1), Wget(f"file://{p}")))
    old = fetch_trace(t_way, conf)
    assert old[0].from_cache
    assert b"v1" in old[0].bytes()


def test_explore_terminates_on_cycle(spark, tmp_path):
    """a ↔ b cycle + self-loop must terminate with each node visited once."""
    mem_cache.clear()
    (tmp_path / "a.html").write_text(
        '<html><body><a href="b.html">b</a><a href="a.html">self</a></body></html>'
    )
    (tmp_path / "b.html").write_text(
        '<html><body><a href="a.html">a</a></body></html>'
    )
    sctx = SpookyContext(spark)
    dv = sctx.create(spark.createDataFrame([{"u": f"file://{tmp_path}/a.html"}]))
    out = dv.explore(Wget("{u}"), expand=S("a").hrefs, range=(0, 10))
    rows = out.select(uri=S.uri).to_df().collect()
    assert len(rows) == 2
    assert {r.uri.rsplit("/", 1)[-1]: r.depth for r in rows} == {
        "a.html": 0,
        "b.html": 1,
    }


def test_doc_cache_source(spark, tmp_path):
    mem_cache.clear()
    root = str(tmp_path / "dfs")
    (tmp_path / "x.html").write_text("<html><title>x</title></html>")
    (tmp_path / "y.json").write_text('{"k": 2}')
    sctx = SpookyContext(spark, SpookyConf(dfs_cache_root=root))
    sctx.create(
        spark.createDataFrame([{"f": "x.html"}, {"f": "y.json"}])
    ).fetch(Wget(f"file://{tmp_path}/{{f}}")).execute()

    from spookystuff_spark.sources.doc_cache_source import read_doc_cache

    cache_df = read_doc_cache(spark, root)
    rows = cache_df.collect()
    assert len(rows) == 2
    assert all(r.success and r.n_bytes > 0 and r.trace_key for r in rows)
    mimes = sorted((r.mime or "").split(";")[0] for r in rows)
    assert mimes == ["application/json", "text/html"]


def test_tsv_personnel_fixture(spark, tmp_path):
    """FIXTURES.md §3: tab-separated personnel table (hivetable.csv shape) —
    native spark.read.csv covers the reference's CSV fixture path."""
    f = tmp_path / "hivetable.csv"
    f.write_text(
        "Name\tDOB\tSIN\tAddress\n"
        '"Alice"\t1-4-90\t100000001\t"1 Main St"\n'
        '"Bob"\t2-5-85\t100000002\t"2 Side Ave"\n'
    )
    df = spark.read.csv(str(f), sep="\t", header=True, quote='"')
    rows = df.collect()
    assert [r.Name for r in rows] == ["Alice", "Bob"]
    assert df.columns == ["Name", "DOB", "SIN", "Address"]


def test_explore_deepening_reuses_cache(spark, tmp_path):
    """Resumable crawling: re-exploring with a larger depth range over a warm
    DFS cache re-fetches NOTHING it already saw — only the newly reachable
    depth costs remote fetches (the reference's warm-cache invariant applied
    to explore)."""
    site = tmp_path / "chain"
    site.mkdir()
    for i in range(4):
        nxt = f'<a href="p{i + 1}.html">next</a>' if i < 3 else ""
        (site / f"p{i}.html").write_text(f"<html><body>{nxt}</body></html>")

    mem_cache.clear()
    conf = SpookyConf(dfs_cache_root=str(tmp_path / "dfs"), fetch_retries=1)
    sctx1 = SpookyContext(spark, conf)
    dv = sctx1.create(spark.createDataFrame([{"u": f"file://{site}/p0.html"}]))
    shallow = dv.explore(Wget("{u}"), expand=S("a").hrefs, range=(0, 1))
    assert shallow.count() == 2  # p0, p1
    assert sctx1.metrics.snapshot()["pages_from_remote"] == 2

    mem_cache.clear()  # simulate a brand-new session (DFS cache survives)
    sctx2 = SpookyContext(spark, conf)
    dv2 = sctx2.create(spark.createDataFrame([{"u": f"file://{site}/p0.html"}]))
    deep = dv2.explore(Wget("{u}"), expand=S("a").hrefs, range=(0, 3))
    assert deep.count() == 4  # p0..p3
    m = sctx2.metrics.snapshot()
    assert m["pages_from_remote"] == 2  # ONLY p2, p3 — p0/p1 from cache
    assert m["pages_from_cache"] >= 2


def test_compact_doc_cache_to_parquet(spark, tmp_path):
    """Small-file cache → partitioned parquet doc table with payloads intact."""
    mem_cache.clear()
    root = str(tmp_path / "dfs")
    for i in range(4):
        (tmp_path / f"c{i}.html").write_text(
            f"<html><title>C{i}</title></html>"
        )
    sctx = SpookyContext(spark, SpookyConf(dfs_cache_root=root))
    sctx.create(
        spark.createDataFrame([{"f": f"c{i}.html"} for i in range(4)])
    ).fetch(Wget(f"file://{tmp_path}/{{f}}")).execute()

    from spookystuff_spark.sources.doc_cache_source import compact_doc_cache

    table = compact_doc_cache(spark, root, str(tmp_path / "doc_table"))
    rows = table.collect()
    assert len(rows) == 4
    assert all(r.success and r.content for r in rows)
    titles = sorted(
        bytes(r.content).decode().split("<title>")[1].split("</title>")[0]
        for r in rows
    )
    assert titles == ["C0", "C1", "C2", "C3"]
    assert "shard" in table.columns  # partition column present


def test_per_scheme_cache_levels(spark, tmp_path):
    """DocCacheLevel.scala:8-33 parity: per-URI-scheme cache level selection.
    'none' always refetches; 'memory' skips DFS write-through; 'dfs' skips
    the in-memory map; '*' is the wildcard default."""
    import os

    from spookystuff_spark.actions.core import Trace
    from spookystuff_spark.actions.http import Wget
    from spookystuff_spark.actions.runtime import fetch_trace
    from spookystuff_spark.caching import memory as mem_cache
    from spookystuff_spark.conf import SpookyConf

    site = tmp_path / "s.html"
    site.write_text("<html><head><title>S</title></head><body>x</body></html>")
    uri = f"file://{site}"
    dfs_root = str(tmp_path / "dfs")

    def run(conf):
        n = {"remote": 0}

        def inc(name, k=1):
            if name == "pages_from_remote":
                n["remote"] += k

        fetch_trace(Trace((Wget(uri),)), conf, inc)
        fetch_trace(Trace((Wget(uri),)), conf, inc)
        return n["remote"]

    # none → every fetch is remote
    mem_cache.clear()
    assert run(SpookyConf(dfs_cache_root=dfs_root, cache_levels={"file": "none"})) == 2

    # memory → warm second fetch, but nothing lands in DFS
    mem_cache.clear()
    root_mem = str(tmp_path / "dfs_mem")
    assert run(SpookyConf(dfs_cache_root=root_mem, cache_levels={"file": "memory"})) == 1
    assert not os.path.exists(root_mem) or not os.listdir(root_mem)

    # dfs → warm second fetch from DFS even with the memory map wiped
    mem_cache.clear()
    root_dfs = str(tmp_path / "dfs_only")
    conf = SpookyConf(dfs_cache_root=root_dfs, cache_levels={"file": "dfs"})
    n = {"remote": 0}

    def inc(name, k=1):
        if name == "pages_from_remote":
            n["remote"] += k

    fetch_trace(Trace((Wget(uri),)), conf, inc)
    mem_cache.clear()  # simulate a fresh worker process
    fetch_trace(Trace((Wget(uri),)), conf, inc)
    assert n["remote"] == 1
    assert os.listdir(root_dfs)
    assert not mem_cache._CACHE  # dfs level never populates the memory map

    # wildcard default applies to unlisted schemes
    mem_cache.clear()
    assert run(SpookyConf(cache_levels={"http": "all", "*": "none"})) == 2


def test_vacuum_cache_ttl_gc(spark, tmp_path):
    """Distributed cache GC: old generations are deleted, each key's newest
    survives (keep_latest_per_key), fresh generations untouched — and
    reads still work afterwards."""
    from spookystuff_spark.caching.dfs import vacuum_cache
    from spookystuff_spark.doc.observation import Observation

    root = str(tmp_path / "dfs")
    obs = lambda body: [Observation(uri="http://x", content=body, mime="text/plain")]
    # key A: three generations, two stale; key B: single stale generation
    dfs_cache.put(root, "a" * 32, obs(b"g1"), 1000)
    dfs_cache.put(root, "a" * 32, obs(b"g2"), 2000)
    dfs_cache.put(root, "a" * 32, obs(b"g3"), 9000)
    dfs_cache.put(root, "b" * 32, obs(b"old"), 1500)

    stats = vacuum_cache(spark, root, older_than_ms=5000)
    assert stats == {"n_deleted": 2, "n_kept": 2, "n_keys": 2}
    # key A: only g3 remains; key B's only (stale) generation was kept
    got_a = dfs_cache.get(root, "a" * 32)
    assert got_a is not None and got_a[0].bytes() == b"g3"
    assert dfs_cache.get(root, "a" * 32, before_ms=2500) is None  # g1/g2 gone
    got_b = dfs_cache.get(root, "b" * 32)
    assert got_b is not None and got_b[0].bytes() == b"old"

    # strict GC without the keep-latest floor removes B entirely
    stats2 = vacuum_cache(spark, root, older_than_ms=5000, keep_latest_per_key=False)
    assert stats2["n_deleted"] == 1
    assert dfs_cache.get(root, "b" * 32) is None
