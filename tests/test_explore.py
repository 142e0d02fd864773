"""Explore (BFS) tests — golden semantics from ExplorePlanSpec.scala:70-160
(directory tree, fetch counts) and ExploreIT.scala:23-67 (depth/index columns,
min-depth wins on diamonds)."""

from __future__ import annotations

import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.functions.extractors import S


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    """dir/dir/dir nested tree (ref fixture: testutils/dir/dir/dir)."""
    root = tmp_path_factory.mktemp("tree")
    (root / "f0.txt").write_text("zero")
    d1 = root / "sub1"
    d1.mkdir()
    (d1 / "f1.txt").write_text("one")
    d2 = d1 / "sub2"
    d2.mkdir()
    (d2 / "f2.txt").write_text("two")
    d3 = d2 / "sub3"
    d3.mkdir()
    (d3 / "f3.txt").write_text("three")
    return root


@pytest.fixture(scope="module")
def diamond(tmp_path_factory):
    """index → a,b; a → c; b → c (min-depth diamond)."""
    d = tmp_path_factory.mktemp("diamond")
    (d / "index.html").write_text(
        '<html><body><a href="a.html">A</a><a href="b.html">B</a></body></html>'
    )
    (d / "a.html").write_text('<html><body><a href="c.html">C</a></body></html>')
    (d / "b.html").write_text('<html><body><a href="c.html">C</a></body></html>')
    (d / "c.html").write_text("<html><body><h1>C</h1></body></html>")
    return d


@pytest.fixture()
def sctx(spark):
    mem_cache.clear()
    return SpookyContext(spark)


def test_directory_bfs_depths(sctx, spark, tree):
    dv = sctx.create(spark.createDataFrame([{"root": f"file://{tree}"}]))
    out = dv.explore(
        Wget("{root}"),
        expand=S("a.dir").hrefs,
        depth_field="depth",
        range=(0, 2),
        path_field="path",
    )
    rows = (
        out.select(uri=S.uri)
        .to_df()
        .select("depth", "path", "uri")
        .collect()
    )
    by_depth = {}
    for r in rows:
        by_depth.setdefault(r.depth, []).append(r.uri.rsplit("/", 1)[-1])
    assert by_depth[0] == [str(tree).rsplit("/", 1)[-1]]
    assert by_depth[1] == ["sub1"]
    assert by_depth[2] == ["sub2"]
    assert 3 not in by_depth  # depth cap honored (range filter)
    paths = {r.uri.rsplit("/", 1)[-1]: r.path for r in rows}
    assert paths["sub1"] == [0] or paths["sub1"] == [1]  # ordinal path recorded
    assert len(paths["sub2"]) == 2


def test_depth_range_min_filter(sctx, spark, tree):
    dv = sctx.create(spark.createDataFrame([{"root": f"file://{tree}"}]))
    out = dv.explore(
        Wget("{root}"), expand=S("a.dir").hrefs, range=(1, 2)
    ).to_df()
    depths = sorted(r.depth for r in out.collect())
    assert depths == [1, 2]  # depth-0 seed filtered out


def test_diamond_min_depth_and_single_fetch(sctx, spark, diamond):
    """Each node visited once, c at min depth 2, zero redundant fetches
    (ITBaseSpec.scala:79: remoteFetched − numPages == 0)."""
    dv = sctx.create(spark.createDataFrame([{"seed": f"file://{diamond}/index.html"}]))
    out = dv.explore(
        Wget("{seed}"),
        expand=S("a").hrefs,
        range=(0, 5),
        path_field="path",
        ordinal_field="ordinal",
    )
    rows = out.select(uri=S.uri).to_df().select("depth", "ordinal", "uri").collect()
    pages = {r.uri.rsplit("/", 1)[-1]: r for r in rows}
    assert len(rows) == 4  # each node exactly once
    assert pages["index.html"].depth == 0
    assert pages["a.html"].depth == 1
    assert pages["b.html"].depth == 1
    assert pages["c.html"].depth == 2
    assert pages["a.html"].ordinal == 0
    assert pages["b.html"].ordinal == 1
    m = sctx.metrics.snapshot()
    assert m["pages_from_remote"] == 4  # no redundant fetch on the diamond


def test_epoch_batched_explore_matches_default(sctx, spark, tree, diamond):
    """epoch_depths>1 (local multi-level walk) must produce identical visited
    sets/depths as the default one-shuffle-per-depth mode."""
    dv = sctx.create(spark.createDataFrame([{"root": f"file://{tree}"}]))
    base = dv.explore(Wget("{root}"), expand=S("a.dir").hrefs, range=(0, 3))
    batched = dv.explore(
        Wget("{root}"), expand=S("a.dir").hrefs, range=(0, 3), epoch_depths=3
    )

    def canon(df):
        return sorted(
            (r.uri.rsplit("/", 1)[-1], r.depth)
            for r in df.select(uri=S.uri).to_df().collect()
        )

    assert canon(batched) == canon(base)

    dv2 = sctx.create(
        spark.createDataFrame([{"seed": f"file://{diamond}/index.html"}])
    )
    batched2 = dv2.explore(
        Wget("{seed}"), expand=S("a").hrefs, range=(0, 5), epoch_depths=4
    )
    got = {
        r.uri.rsplit("/", 1)[-1]: r.depth
        for r in batched2.select(uri=S.uri).to_df().collect()
    }
    assert got == {"index.html": 0, "a.html": 1, "b.html": 1, "c.html": 2}


def test_expand_limit_caps_children(sctx, spark, diamond):
    """expand_limit=1 keeps only each node's first link (DownSampling parity)."""
    dv = sctx.create(spark.createDataFrame([{"seed": f"file://{diamond}/index.html"}]))
    out = dv.explore(
        Wget("{seed}"), expand=S("a").hrefs, range=(0, 5), expand_limit=1
    )
    rows = out.select(uri=S.uri).to_df().collect()
    names = sorted(r.uri.rsplit("/", 1)[-1] for r in rows)
    # index → (a only, b dropped) → c
    assert names == ["a.html", "c.html", "index.html"]


def test_explore_no_full_visited_rescan(sctx, spark, tree, monkeypatch):
    """Scale guard (VERDICT r01 #7): the explore loop must maintain its
    closed-set incrementally — .distinct() over the growing visited set per
    epoch is O(total-visited * depth). Spy on DataFrame.distinct during a
    multi-epoch crawl: the traversal loop itself must not call it."""
    from pyspark.sql import DataFrame

    calls = []
    orig = DataFrame.distinct

    def spy(self):
        calls.append(self.columns)
        return orig(self)

    monkeypatch.setattr(DataFrame, "distinct", spy)
    mem_cache.clear()
    dv = sctx.create(spark.createDataFrame([{"root": f"file://{tree}"}]))
    out = dv.explore(
        Wget("{root}"), expand=S("a.dir").hrefs, depth_field="depth", range=(0, 4)
    ).to_df()
    assert out.count() >= 4  # the deep crawl actually ran (4 epochs)
    assert calls == [], f"distinct() called on {calls} during explore"


def test_epoch_batched_ordinal_parity_on_linkgraph(sctx, spark):
    """Regression: with epoch_depths>1, when two same-depth parents in one
    partition both discover a child, the partition-local first-wins dedup must
    process work in min-(depth, path) order — otherwise which parent records
    the child depends on arbitrary batch row order and the lexicographically
    smaller path is silently dropped before the global min_by reconcile.
    Full (page, depth, ordinal) parity vs the per-depth loop, at an
    epoch_depths that splits the walk mid-crawl."""
    import os

    import pyspark.sql.functions as F

    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures", "linkgraph")

    def run(ed):
        mem_cache.clear()
        dv = sctx.create(
            spark.createDataFrame([{"seed": f"file://{root}/p0.html"}])
        )
        out = dv.explore(
            Wget("{seed}"), expand=S("a").hrefs, depth_field="depth",
            range=(0, 3), ordinal_field="ordinal", epoch_depths=ed,
        )
        return sorted(
            (r["page"], r["depth"], r["ordinal"])
            for r in out.select(uri=S.uri).to_df().select(
                F.regexp_extract(F.col("uri"), r"([^/]+)$", 1).alias("page"),
                "depth", "ordinal",
            ).collect()
        )

    base = run(1)
    for ed in (2, 3):
        assert run(ed) == base, f"epoch_depths={ed} diverged"
