"""Category-tree e-commerce IT scenario (round-3 verdict item #7).

Model: the reference's integration test-site (``module/integration/
test-sites/`` driven by ``ITBaseSpec.scala:46-104`` / ``ExploreIT.scala:
55-67``): a depth-3 category tree whose leaves are paginated product
listings. Two drive paths:

* **explore + Wget** over a ``file://`` fixture site: golden depth/ordinal
  output, per-category item rollup, and the ITBaseSpec fetch budgets —
  ``remoteFetched − numPages == 0`` cold, zero NEW remote fetches warm
  (shared DFS doc cache).
* **ClickNext pagination via the fake web driver** (the reference paginates
  with a browser; selenium is absent from this container, so the conforming
  fake from test_web_execute drives the identical protocol): one trace walks
  every listing page exactly once and exports a Snapshot per page.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.actions.core import Trace
from spookystuff_spark.actions.runtime import fetch_trace
from spookystuff_spark.actions.control import Loop
from spookystuff_spark.actions.web import (
    ClickNext,
    Snapshot,
    Visit,
    clear_driver_pool,
)
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext
from spookystuff_spark.functions.extractors import S

CATEGORIES = ("a", "b", "c")
SUBS_PER_CAT = 2
PAGES_PER_LEAF = 3
ITEMS_PER_PAGE = 2

# 1 index + 3 categories + 6 leaf listings + 6×2 extra pages
N_TREE_PAGES = 1 + len(CATEGORIES) + len(CATEGORIES) * SUBS_PER_CAT
N_ALL_PAGES = N_TREE_PAGES + len(CATEGORIES) * SUBS_PER_CAT * (PAGES_PER_LEAF - 1)


def _listing(tag: str, cat: str, sub: int, page: int) -> str:
    items = "".join(
        f'<div class="item"><span class="name">{cat}{sub}-p{page}-i{i}</span>'
        f'<span class="price">{10 * page + i}.99</span></div>'
        for i in range(ITEMS_PER_PAGE)
    )
    nxt = (
        f'<a class="next" href="{tag}_{cat}{sub}_p{page + 1}.html">next</a>'
        if page < PAGES_PER_LEAF
        else ""
    )
    return (
        f"<html><head><title>{cat}{sub} page {page}</title></head>"
        f"<body>{items}{nxt}</body></html>"
    )


@pytest.fixture()
def site(tmp_path):
    """Depth-3 category tree with paginated leaves; unique tag per run so
    worker-global caches can't leak across cases."""
    tag = uuid.uuid4().hex[:8]
    cats = "".join(
        f'<a class="category" href="{tag}_{c}.html">{c.upper()}</a>'
        for c in CATEGORIES
    )
    (tmp_path / f"{tag}_index.html").write_text(
        f"<html><head><title>All Categories</title></head><body>{cats}</body></html>"
    )
    for c in CATEGORIES:
        subs = "".join(
            f'<a class="category" href="{tag}_{c}{s}.html">{c.upper()}{s}</a>'
            for s in range(SUBS_PER_CAT)
        )
        (tmp_path / f"{tag}_{c}.html").write_text(
            f"<html><head><title>Category {c.upper()}</title></head>"
            f"<body>{subs}</body></html>"
        )
        for s in range(SUBS_PER_CAT):
            # leaf listing page 1 IS the subcategory page
            (tmp_path / f"{tag}_{c}{s}.html").write_text(_listing(tag, c, s, 1))
            for p in range(2, PAGES_PER_LEAF + 1):
                (tmp_path / f"{tag}_{c}{s}_p{p}.html").write_text(
                    _listing(tag, c, s, p)
                )
    return tmp_path, tag


def test_category_tree_explore_budgets_and_golden(spark, site, tmp_path):
    root, tag = site
    mem_cache.clear()
    conf = SpookyConf(
        dfs_cache_root=str(tmp_path / "dfs"), fetch_retries=1, retry_delay_sec=0
    )
    sctx = SpookyContext(spark, conf)

    # ---- phase 1: BFS the category tree (index → categories → leaf page 1)
    seeds = spark.createDataFrame([{"seed": f"file://{root}/{tag}_index.html"}])
    tree = sctx.create(seeds).explore(
        Wget("{seed}"),
        expand=S("a.category").hrefs,
        range=(0, 2),
        ordinal_field="ordinal",
    )
    rows = (
        tree.select(uri=S.uri, title=S("title").text)
        .to_df()
        .select("depth", "ordinal", "uri", "title")
        .collect()
    )
    assert len(rows) == N_TREE_PAGES
    by_page = {r.uri.rsplit("/", 1)[-1].replace(f"{tag}_", ""): r for r in rows}
    # golden depth/ordinal table (ExploreIT.scala:55-67 pattern)
    assert by_page["index.html"].depth == 0
    assert by_page["index.html"].title == "All Categories"
    for ci, c in enumerate(CATEGORIES):
        assert by_page[f"{c}.html"].depth == 1
        assert by_page[f"{c}.html"].ordinal == ci  # sibling order preserved
        assert by_page[f"{c}.html"].title == f"Category {c.upper()}"
        for s in range(SUBS_PER_CAT):
            leaf = by_page[f"{c}{s}.html"]
            assert leaf.depth == 2
            assert leaf.ordinal == s
            assert leaf.title == f"{c}{s} page 1"

    m1 = sctx.metrics.snapshot()
    # ITBaseSpec.scala:79 — zero redundant fetches on the cold tree walk
    assert m1["pages_from_remote"] == N_TREE_PAGES

    # ---- phase 2: paginate every leaf listing via its a.next chain
    leaf_seeds = spark.createDataFrame(
        [
            {"leaf": f"file://{root}/{tag}_{c}{s}.html"}
            for c in CATEGORIES
            for s in range(SUBS_PER_CAT)
        ]
    )
    listings = sctx.create(leaf_seeds).explore(
        Wget("{leaf}"),
        expand=S("a.next").hrefs,
        range=(0, PAGES_PER_LEAF - 1),
    )
    items = (
        listings.select(names=S("div.item span.name").texts)
        .to_df()
        .select(F.explode("names").alias("name"))
        .collect()
    )
    # every page of every leaf contributes its items exactly once
    expected_items = {
        f"{c}{s}-p{p}-i{i}"
        for c in CATEGORIES
        for s in range(SUBS_PER_CAT)
        for p in range(1, PAGES_PER_LEAF + 1)
        for i in range(ITEMS_PER_PAGE)
    }
    assert {r.name for r in items} == expected_items
    assert len(items) == len(expected_items)

    # global budget: leaf page-1s re-resolve from the doc cache, so total
    # REMOTE fetches across both phases == number of distinct pages
    m2 = sctx.metrics.snapshot()
    assert m2["pages_from_remote"] == N_ALL_PAGES

    # ---- phase 3: warm re-run of the whole scenario = zero new remote
    sctx.create(seeds).explore(
        Wget("{seed}"), expand=S("a.category").hrefs, range=(0, 2)
    ).execute()
    sctx.create(leaf_seeds).explore(
        Wget("{leaf}"), expand=S("a.next").hrefs, range=(0, PAGES_PER_LEAF - 1)
    ).execute()
    m3 = sctx.metrics.snapshot()
    assert m3["pages_from_remote"] == m2["pages_from_remote"]


class _PagedElement:
    def __init__(self, drv, key, href):
        self.drv = drv
        self.text = key
        self._href = href
        self.size = {"width": 100, "height": 20}

    def get_attribute(self, name):
        return self._href if name == "href" else None

    def click(self):
        self.drv.page += 1


class _PagedFakeDriver:
    """Fake browser serving a paginated listing: clicking a.next advances
    the page; page_source reflects the current page (same WebDriver protocol
    subset as test_web_execute's fake)."""

    def __init__(self):
        self.page = 1
        self.closed = False
        self.current_url = "about:blank"

    def get(self, uri):
        self.current_url = uri
        self.page = 1

    def find_elements(self, by, sel):
        assert by == "css selector"
        if sel == "a.next" and self.page < PAGES_PER_LEAF:
            return [_PagedElement(self, f"next-from-{self.page}", f"p{self.page + 1}")]
        return []

    def find_element(self, by, sel):
        els = self.find_elements(by, sel)
        if not els:
            raise RuntimeError(f"NoSuchElement: {sel}")
        return els[0]

    @property
    def page_source(self):
        items = "".join(
            f'<div class="item"><span class="name">p{self.page}-i{i}</span></div>'
            for i in range(ITEMS_PER_PAGE)
        )
        return (
            f"<html><head><title>page {self.page}</title></head>"
            f"<body>{items}</body></html>"
        )

    def execute_script(self, script):
        return "complete" if "readyState" in script else None

    def delete_all_cookies(self):
        pass

    def quit(self):
        self.closed = True


def test_clicknext_pagination_snapshots_every_page():
    """ClickNext+Snapshot loop (the reference's browser pagination idiom)
    exports each listing page exactly once, then stops at the last page."""
    clear_driver_pool()
    try:
        conf = SpookyConf(
            cache_read=False,
            cache_write=False,
            fetch_retries=1,
            retry_delay_sec=0.0,
            webdriver_factory=_PagedFakeDriver,
        )
        trace = Trace(
            (
                Visit("http://fake/listing"),
                Snapshot(),
                Loop(
                    body=Trace((ClickNext("a.next"), Snapshot())),
                    limit=PAGES_PER_LEAF + 3,  # exhaustion breaks the loop
                ),
            )
        )
        obs = fetch_trace(trace, conf)
        pages = [o for o in obs if o.success]
        assert len(pages) == PAGES_PER_LEAF
        for i, o in enumerate(pages, start=1):
            assert f"page {i}".encode() in o.content
            for j in range(ITEMS_PER_PAGE):
                assert f"p{i}-i{j}".encode() in o.content
    finally:
        clear_driver_pool()


def test_category_tree_budgets_hold_under_concurrency(spark, site, tmp_path):
    """The same ITBaseSpec budgets with fetch_concurrency=4 and the pooled
    narrow locality: interleaving IO waits must not break the
    zero-redundant-fetch guarantee (each page remote-fetched exactly once,
    warm pass fully cache-served)."""
    root, tag = site
    mem_cache.clear()
    conf = SpookyConf(
        dfs_cache_root=str(tmp_path / "dfs"),
        fetch_retries=1,
        retry_delay_sec=0,
        fetch_concurrency=4,
    )
    sctx = SpookyContext(spark, conf)
    seeds = spark.createDataFrame([{"seed": f"file://{root}/{tag}_index.html"}])

    tree = sctx.create(seeds).explore(
        Wget("{seed}"),
        expand=S("a.category").hrefs,
        range=(0, 2),
        locality="narrow",
    )
    rows = tree.select(title=S("title").text).to_df().collect()
    assert len(rows) == N_TREE_PAGES
    m = sctx.metrics.snapshot()
    assert m["pages_from_remote"] == N_TREE_PAGES  # zero redundant fetches

    # warm pass, still concurrent: everything from the cache
    sctx.create(seeds).explore(
        Wget("{seed}"), expand=S("a.category").hrefs, range=(0, 2),
        locality="narrow",
    ).execute()
    m2 = sctx.metrics.snapshot()
    assert m2["pages_from_remote"] == N_TREE_PAGES  # no NEW remote fetches
