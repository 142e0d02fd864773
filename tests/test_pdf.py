"""PDF → normalized-doc tests (Tika parity, ref doc/Content.scala:50-82):
a fetched PDF must yield a selectable node tree via the ordinary CSS engine."""

from __future__ import annotations

import os

from spookystuff_spark.doc.content_type import detect_mime
from spookystuff_spark.doc.node import parse_node
from spookystuff_spark.doc.pdf import pdf_title, pdf_to_pages, pdf_to_text

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PDF_DIR = os.path.join(REPO, "fixtures", "pdfs")


def _body(i: int) -> bytes:
    with open(os.path.join(PDF_DIR, f"pdf{i}.pdf"), "rb") as f:
        return f.read()


def test_detect_mime_pdf_magic():
    assert detect_mime(_body(0)) == "application/pdf"


def test_pdf_text_roundtrip_uncompressed_and_flate():
    # pdf0 = uncompressed streams, pdf1 = /FlateDecode
    t0 = pdf_to_text(_body(0))
    assert "doc0 page0 line0" in t0
    assert "(escaped)" in t0  # literal-string escapes decoded
    assert "back\\slash" in t0
    t1 = pdf_to_text(_body(1))
    assert "doc1 page1 line2" in t1


def test_pdf_title_and_page_structure():
    assert pdf_title(_body(2)) == "Fixture PDF 2"
    assert [len(p) for p in pdf_to_pages(_body(2))] == [2, 3, 2]


def test_parse_node_normalizes_pdf_to_selectable_tree():
    node = parse_node(_body(4), mime="application/pdf", base_uri="file:///x.pdf")
    pages = node.find_all("div.page")
    assert len(pages) == 2
    lines = node.find_all("div.page p")
    texts = [n.text for n in lines]
    assert texts[0].startswith("doc4 page0 line0")
    assert node.find_all("title")[0].text == "Fixture PDF 4"


def test_unparseable_pdf_degrades_to_empty_body():
    junk = b"%PDF-1.4\ngarbage without streams"
    node = parse_node(junk, mime="application/pdf")
    assert node.find_all("div.page") == []
