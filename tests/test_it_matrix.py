"""Integration matrix (model: module/integration/.../ITBaseSpec.scala:46-104):
the same fetch+select scenario across locality × cache-root configurations,
asserting the reference's efficiency invariants each time:

  * remoteFetched − numPages == 0  (zero redundant fetches, cold)
  * pagesFetched ≤ 2 × numPages
  * warm second pass: zero NEW remote fetches (DFS-cache configs)
"""

from __future__ import annotations

import uuid

import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.functions.extractors import S

NUM_PAGES = 3


@pytest.fixture()
def scenario_site(tmp_path):
    """Unique per test run so worker-global caches can't leak across cases."""
    tag = uuid.uuid4().hex[:8]
    for i in range(NUM_PAGES):
        (tmp_path / f"{tag}_p{i}.html").write_text(
            f"<html><head><title>T{i}</title></head>"
            f'<body><a href="{tag}_p{(i + 1) % NUM_PAGES}.html">next</a></body></html>'
        )
    return tmp_path, tag


@pytest.mark.parametrize("locality", ["wide", "narrow", "passthrough"])
@pytest.mark.parametrize("dfs_cache", [False, True])
def test_scenario_invariants(spark, scenario_site, tmp_path, locality, dfs_cache):
    site, tag = scenario_site
    mem_cache.clear()
    conf = SpookyConf(
        dfs_cache_root=str(tmp_path / "dfs") if dfs_cache else None,
        fetch_retries=1,
        retry_delay_sec=0,
    )
    sctx = SpookyContext(spark, conf)
    # duplicated page list → dedup must collapse to NUM_PAGES fetches
    rows = [{"f": f"{tag}_p{i % NUM_PAGES}.html"} for i in range(NUM_PAGES * 3)]
    df = spark.createDataFrame(rows).coalesce(1)  # one partition → narrow dedup exact

    out = (
        sctx.create(df)
        .fetch(Wget(f"file://{site}/{{f}}"), locality=locality)
        .select(title=S("title").text)
        .to_df()
        .collect()
    )
    assert len(out) == NUM_PAGES * 3
    assert all(r.title == f"T{r.f.split('_p')[1].split('.')[0]}" for r in out)

    m = sctx.metrics.snapshot()
    if locality in ("wide", "narrow"):
        # zero redundant fetches (ITBaseSpec.scala:79)
        assert m["pages_from_remote"] == NUM_PAGES, (locality, dfs_cache, m)
    else:  # passthrough: no dedup — every row fetches (cache may still help)
        assert m["pages_from_remote"] >= NUM_PAGES
    assert m["pages_fetched"] <= 2 * NUM_PAGES * 3  # global cap

    if dfs_cache:
        # warm pass: all from cache (ITBaseSpec.scala:95-96)
        before = sctx.metrics.snapshot()["pages_from_remote"]
        sctx.create(df).fetch(
            Wget(f"file://{site}/{{f}}"), locality=locality
        ).execute()
        after = sctx.metrics.snapshot()
        assert after["pages_from_remote"] == before, (locality, after)
