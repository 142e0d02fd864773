"""Golden-output tests — the reference's signature test pattern
(§5: `.shouldBe` exact-string comparison of toJSON/schema dumps;
SelectIT.scala:30-41, ForkExtractIT.scala:18-50, ExploreIT.scala:41-67).

Fixtures mirror FIXTURES.md: an e-commerce category tree (explore golden with
``depth``/``index`` columns), a product page (extract golden), a GitHub-user
JSON (nested extraction golden).
"""

from __future__ import annotations

import json

import pytest

from spookystuff_spark import S, SpookyContext, Wget
from spookystuff_spark.caching import memory as mem_cache


@pytest.fixture(scope="module")
def shop(tmp_path_factory):
    """Mini e-commerce category tree (ref: test-sites/e-commerce)."""
    d = tmp_path_factory.mktemp("shop")
    (d / "index.html").write_text(
        "<html><head><title>Store</title></head><body>"
        '<h1 class="header">All Departments</h1>'
        '<ul class="cats">'
        '<li><a class="cat" href="computers.html">Computers</a></li>'
        '<li><a class="cat" href="phones.html">Phones</a></li>'
        "</ul></body></html>"
    )
    (d / "computers.html").write_text(
        "<html><head><title>Computers</title></head><body>"
        '<h1 class="header">All Departments / Computers</h1>'
        '<ul class="cats">'
        '<li><a class="cat" href="laptops.html">Laptops</a></li>'
        '<li><a class="cat" href="tablets.html">Tablets</a></li>'
        "</ul></body></html>"
    )
    (d / "phones.html").write_text(
        "<html><head><title>Phones</title></head><body>"
        '<h1 class="header">All Departments / Phones</h1>'
        '<ul class="cats"></ul></body></html>'
    )
    (d / "laptops.html").write_text(
        "<html><head><title>Laptops</title></head><body>"
        '<h1 class="header">All Departments / Computers / Laptops</h1>'
        '<div class="product" data-price="999">UltraBook 13</div>'
        '<div class="product" data-price="1299">UltraBook 15</div>'
        "</body></html>"
    )
    (d / "tablets.html").write_text(
        "<html><head><title>Tablets</title></head><body>"
        '<h1 class="header">All Departments / Computers / Tablets</h1>'
        '<div class="product" data-price="499">Slate 10</div>'
        "</body></html>"
    )
    return d


@pytest.fixture()
def sctx(spark):
    mem_cache.clear()
    return SpookyContext(spark)


def _golden_json(df, order_cols):
    rows = [json.loads(s) for s in df.orderBy(*order_cols).toJSON().collect()]
    return json.dumps(rows, sort_keys=True, indent=1)


def test_extract_golden(sctx, spark, shop):
    """SelectIT-style: exact JSON of an extract over one page."""
    df = (
        sctx.create(spark.createDataFrame([{"page": "laptops.html"}]))
        .fetch(Wget(f"file://{shop}/{{page}}"))
        .select(
            header=S("h1.header").text,
            products=S("div.product").texts,
            prices=S("div.product").attrs("data-price"),
        )
        .to_df(sort=True)
        .drop("page")
    )
    golden = json.dumps(
        [
            {
                "header": "All Departments / Computers / Laptops",
                "prices": ["999", "1299"],
                "products": ["UltraBook 13", "UltraBook 15"],
            }
        ],
        sort_keys=True,
        indent=1,
    )
    assert _golden_json(df, ["header"]) == golden


def test_fork_golden(sctx, spark, shop):
    """ForkExtractIT-style: per-element explode with ordinal column."""
    df = (
        sctx.create(spark.createDataFrame([{"page": "index.html"}]))
        .fetch(Wget(f"file://{shop}/{{page}}"))
        .fork("li", ordinal_field="ordinal")
        .select(category=S("a.cat").text)
        .to_df(sort=True)
        .drop("page")
    )
    golden = json.dumps(
        [
            {"category": "Computers", "ordinal": 0},
            {"category": "Phones", "ordinal": 1},
        ],
        sort_keys=True,
        indent=1,
    )
    assert _golden_json(df, ["ordinal"]) == golden


def test_explore_golden(sctx, spark, shop):
    """ExploreIT-style golden: BFS emits depth + index(path) + extracted
    category/header columns (ExploreIT.scala:41-67 output shape)."""
    df = (
        sctx.create(spark.createDataFrame([{"seed": f"file://{shop}/index.html"}]))
        .explore(
            Wget("{seed}"),
            expand=S("a.cat").hrefs,
            depth_field="depth",
            path_field="index",
            range=(0, 2),
        )
        .select(header=S("h1.header").text, title=S("title").text)
        .to_df()
        .select("depth", "index", "header", "title")
    )
    golden = json.dumps(
        [
            {"depth": 0, "header": "All Departments", "index": [], "title": "Store"},
            {
                "depth": 1,
                "header": "All Departments / Computers",
                "index": [0],
                "title": "Computers",
            },
            {
                "depth": 1,
                "header": "All Departments / Phones",
                "index": [1],
                "title": "Phones",
            },
            {
                "depth": 2,
                "header": "All Departments / Computers / Laptops",
                "index": [0, 0],
                "title": "Laptops",
            },
            {
                "depth": 2,
                "header": "All Departments / Computers / Tablets",
                "index": [0, 1],
                "title": "Tablets",
            },
        ],
        sort_keys=True,
        indent=1,
    )
    assert _golden_json(df, ["depth", "index"]) == golden


def test_schema_golden(sctx, spark, shop):
    """Schema treeString golden (the reference pins df.schema.treeString)."""
    df = (
        sctx.create(spark.createDataFrame([{"page": "index.html"}]))
        .fetch(Wget(f"file://{shop}/{{page}}"))
        .select(title=S("title").text, links=S("a").hrefs, n=S("li").size)
        .to_df(sort=True)
    )
    assert df.schema.treeString() == (
        "root\n"
        " |-- links: array (nullable = true)\n"
        " |    |-- element: string (containsNull = true)\n"
        " |-- n: integer (nullable = true)\n"
        " |-- page: string (nullable = true)\n"
        " |-- title: string (nullable = true)\n"
    )


def test_github_user_json_golden(sctx, spark, tmp_path):
    """JSON-doc extraction golden (tribbloid.json fixture shape)."""
    user = {
        "login": "tribbloid",
        "id": 12345,
        "url": "https://api.github.com/users/tribbloid",
        "repos": [
            {"name": "spookystuff", "stargazers_count": 100},
            {"name": "shapesafe", "stargazers_count": 50},
        ],
    }
    (tmp_path / "user.json").write_text(json.dumps(user))
    df = (
        sctx.create(spark.createDataFrame([{"f": "user.json"}]))
        .fetch(Wget(f"file://{tmp_path}/{{f}}"))
        .select(
            login=S("login").text,
            repo_names=S("repos.name").texts,
            stars=S("repos.stargazers_count").texts,
        )
        .to_df(sort=True)
        .drop("f")
    )
    golden = json.dumps(
        [
            {
                "login": "tribbloid",
                "repo_names": ["spookystuff", "shapesafe"],
                "stars": ["100", "50"],
            }
        ],
        sort_keys=True,
        indent=1,
    )
    assert _golden_json(df, ["login"]) == golden


def test_append_extract_golden(sctx, spark, shop):
    """SelectIT.scala:60-91 '~+' semantics: plain re-extract to an existing
    column raises; append() merges — old value promoted to array, new value
    appended."""
    from spookystuff_spark import append

    dv = (
        sctx.create_blank()
        .fetch(Wget(f"file://{shop}/index.html"))
        .select(title=S("title").text)
        .persist()
    )
    with pytest.raises(ValueError, match="already exists"):
        dv.select(title=S("h1").text)

    df = dv.select(title=append(S("h1").text)).to_df().select("title")
    assert df.schema["title"].dataType.typeName() == "array"
    assert df.collect()[0].title == ["Store", "All Departments"]

    # array + array extends (texts onto an existing array column)
    dv2 = dv.select(cats=S("a.cat").texts).persist()
    df2 = dv2.select(cats=append(S("h1").texts)).to_df().select("cats")
    assert df2.collect()[0].cats == ["Computers", "Phones", "All Departments"]


def test_expand_siblings_golden(sctx, spark, shop):
    """SelectIT.scala:23 expand semantics: sibling windows around each match,
    clipped at adjacent matches (no overlap)."""
    site_html = (
        "<html><body><div>"
        "<p>intro</p><em>A</em><p>a1</p><em>B</em><p>b1</p><p>b2</p>"
        "</div></body></html>"
    )
    import pathlib

    p = pathlib.Path(str(shop)) / "sib.html"
    p.write_text(site_html)
    dv = sctx.create_blank().fetch(Wget(f"file://{p}"))
    df = dv.select(
        expanded=S("em").expand(range(-1, 3)).texts
    ).to_df()
    # Windows clip at the neighboring MATCH itself (HtmlNode.scala:88-109:
    # head = max(i+range.head, prev+1), tail = min(i+range.last, next-1)):
    # A's window [intro, A, a1, B] drops B; non-match siblings like a1 may
    # appear in both windows.
    assert df.collect()[0].expanded == ["intro A a1", "a1 B b1 b2"]


def test_children_with_siblings():
    """HtmlNode.scala:121-130 childrenWithSiblings: only direct-child matches
    expand; nested matches are excluded."""
    from spookystuff_spark.doc.node import parse_node

    d = parse_node(
        b"<html><body><section>"
        b"<h2>T1</h2><p>p1</p><h2>T2</h2><p>p2</p>"
        b"<div><h2>nested</h2></div>"
        b"</section></body></html>",
        "text/html; charset=utf-8",
    )
    sec = d.find_first("section")
    groups = sec.children_with_siblings("h2", range(0, 2))
    assert [g.text for g in groups] == ["T1 p1", "T2 p2"]
    # find_all_with_siblings would also see the nested h2
    all_groups = sec.find_all_with_siblings("h2", range(0, 2))
    assert len(all_groups) == 3
