"""Node selector API tests (model: doc/DocSpec + HtmlNode/JsonNode usage in the
reference's SelectIT/ExploreIT fixtures)."""

from __future__ import annotations

import json

from spookystuff_spark.doc.content_type import detect_mime
from spookystuff_spark.doc.node import JsonNode, PlainNode, parse_node

WIKI = b"""<!DOCTYPE html>
<html>
<head><title>Wikipedia</title></head>
<body>
  <div id="main" class="container wide">
    <h1 class="firstHeading">Wikipedia</h1>
    <div class="nav"><a href="/wiki/Portal:Arts">Arts</a>
      <a href="/wiki/Portal:History">History</a></div>
    <ul>
      <li class="item"><a href="a.html">A</a><span> one</span></li>
      <li class="item selected"><a href="b.html">B</a><span> two</span></li>
      <li class="item"><a href="c.html">C</a><span> three</span></li>
    </ul>
    <table>
      <tr><th>Name</th><th>DOB</th></tr>
      <tr><td>Alice</td><td>1990</td></tr>
      <tr><td>Bob</td><td>1985</td></tr>
    </table>
    <img src="logo.png">
  </div>
</body>
</html>"""


def doc():
    return parse_node(WIKI, "text/html; charset=utf-8", base_uri="http://w.org/x/page.html")


def test_detect_mime():
    assert detect_mime(WIKI).startswith("text/html")
    assert detect_mime(b'{"a": 1}') == "application/json"
    assert detect_mime(b"%PDF-1.4 ...") == "application/pdf"
    assert detect_mime(b"\x89PNG\r\n") == "image/png"
    assert detect_mime(b"plain words").startswith("text/plain")
    assert detect_mime(b"<?xml version='1.0'?><pom/>") == "application/xml"


def test_css_tag_and_class():
    d = doc()
    assert len(d.find_all("li")) == 3
    assert len(d.find_all("li.item")) == 3
    assert len(d.find_all("li.selected")) == 1
    assert d.find_all("h1").texts == ["Wikipedia"]


def test_css_id_and_descendant():
    d = doc()
    assert len(d.find_all("#main ul a")) == 3
    assert len(d.find_all("div.nav > a")) == 2
    assert len(d.find_all("ul > a")) == 0  # a is not a direct child of ul


def test_css_attr_and_group():
    d = doc()
    assert len(d.find_all("a[href]")) == 5
    assert len(d.find_all('a[href$=".html"], img')) == 4
    assert d.find_all('a[href^="/wiki"]').texts == ["Arts", "History"]


def test_text_and_own_text():
    d = doc()
    li = d.find_all("li")[0]
    assert li.text == "A one"
    assert li.find_first("a").text == "A"
    assert li.find_first("span").own_text == "one"


def test_href_absolutized():
    d = doc()
    hrefs = d.find_all("ul a").hrefs
    assert hrefs == [
        "http://w.org/x/a.html",
        "http://w.org/x/b.html",
        "http://w.org/x/c.html",
    ]
    assert d.find_all("img").srcs == ["http://w.org/x/logo.png"]


def test_code_roundtrip_and_breadcrumb():
    d = doc()
    a = d.find_first("ul a")
    assert a.code == '<a href="a.html">A</a>'
    assert a.breadcrumb.endswith("ul/li/a")


def test_find_only_raises_on_many():
    d = doc()
    import pytest

    with pytest.raises(ValueError):
        d.find_only("li")
    assert d.find_only("h1").text == "Wikipedia"


def test_siblings_window():
    d = doc()
    groups = d.find_all_with_siblings("li.selected", range(-1, 2))
    assert len(groups) == 1
    assert [n.find_first("a").text for n in groups[0]] == ["A", "B", "C"]


def test_table_extraction():
    d = doc()
    rows = [tr.find_all("td").texts for tr in d.find_all("tr")[1:]]
    assert rows == [["Alice", "1990"], ["Bob", "1985"]]


GITHUB_USER = json.dumps(
    {
        "login": "tribbloid",
        "id": 12345,
        "repos": [
            {"name": "spookystuff", "stars": 100, "owner": {"login": "tribbloid"}},
            {"name": "other", "stars": 5, "owner": {"login": "someone"}},
        ],
        "nested": {"login": "shadow"},
    }
).encode()


def test_json_node_direct_child():
    n = parse_node(GITHUB_USER, "application/json")
    assert isinstance(n, JsonNode)
    assert n.children("login").texts == ["tribbloid"]
    assert n.attr("id") == "12345"


def test_json_node_recursive_descent():
    n = parse_node(GITHUB_USER, "application/json")
    # json4s `\\` semantics: every "login" at any depth
    logins = n.find_all("login").texts
    assert sorted(logins) == ["shadow", "someone", "tribbloid", "tribbloid"]


def test_json_node_dotted_path():
    n = parse_node(GITHUB_USER, "application/json")
    assert n.find_all("repos.name").texts == ["spookystuff", "other"]
    assert n.find_all("repos.stars").texts == ["100", "5"]


def test_plain_node():
    n = parse_node(b"hello world", "text/plain")
    assert isinstance(n, PlainNode)
    assert n.text == "hello world"
    assert n.find_all("anything") == []


def test_mime_dispatch_without_hint():
    assert isinstance(parse_node(GITHUB_USER), JsonNode)
    assert parse_node(WIKI).find_first("title").text == "Wikipedia"


def test_article_text_boilerpipe_classifier():
    """NumWordsRules block classification (WSDM'10): body prose survives,
    link-dense nav and short isolated boilerplate blocks are dropped."""
    page = b"""
    <html><body>
      <div class="nav"><a href="/">Home</a> <a href="/b">Blog</a> <a href="/c">Contact</a></div>
      <h1>Story headline</h1>
      <p>The first paragraph of the story carries more than sixteen words so the
         classifier marks it as content without looking at its neighbours.</p>
      <p>The second paragraph is also long enough on its own, continuing the
         narrative with plenty of running prose and detail to be kept.</p>
      <div class="footer"><a href="/t">Terms</a> <a href="/p">Privacy</a></div>
      <p>Copyright</p>
    </body></html>"""
    from spookystuff_spark.doc.node import parse_node

    d = parse_node(page, "text/html; charset=utf-8")
    art = d.article_text
    assert "first paragraph of the story" in art
    assert "continuing the narrative" in art
    assert "Home" not in art and "Privacy" not in art  # link-dense blocks
    assert "Copyright" not in art  # short isolated block, poor neighbours


def test_article_text_semantic_container_shortcuts():
    from spookystuff_spark.doc.node import parse_node

    page = b"""<html><body><nav><a href='/'>x</a></nav>
    <article><p>Real content here.</p></article></body></html>"""
    d = parse_node(page, "text/html; charset=utf-8")
    assert d.article_text.strip() == "Real content here."
