"""Polymorphic parsed-document tree (ref: doc/Node.scala:51-87): dispatch to
HtmlNode (html/xml), JsonNode (json), PlainNode (everything else)."""

from __future__ import annotations

import json
from typing import Any, Optional

from spookystuff_spark.doc.content_type import base_mime, detect_mime, sniff_charset
from spookystuff_spark.doc.html_node import HtmlNode, ManyNodes, parse_html


class PlainNode:
    """Unparsed text document (ref: doc/Node.scala PlainNode)."""

    def __init__(self, text: str):
        self._text = text

    @property
    def text(self) -> str:
        return self._text

    code = text
    own_text = text

    def find_all(self, selector: str) -> ManyNodes:
        return ManyNodes([])

    select = find_all

    def attr(self, name: str) -> Optional[str]:
        return None


class JsonNode:
    """JSON document with path querying (ref: doc/JsonNode.scala:29-122).

    ``find_all(path)`` = recursive descent (json4s ``\\\\``): every value under
    any matching key, at any depth; dotted paths descend step by step.
    ``children(key)`` = direct child (json4s ``\\``).
    """

    def __init__(self, value: Any, name: str = ""):
        self._v = value
        self._name = name

    @property
    def text(self) -> str:
        if isinstance(self._v, str):
            return self._v
        return json.dumps(self._v, ensure_ascii=False, separators=(",", ":"))

    code = text
    own_text = text

    def find_all(self, path: str) -> ManyNodes:
        steps = [s for s in path.replace("\\", ".").split(".") if s]
        nodes = [self._v]
        for i, step in enumerate(steps):
            collected: list[Any] = []
            if i == 0:
                for v in nodes:
                    self._descend(v, step, collected)
            else:
                for v in nodes:
                    if isinstance(v, dict) and step in v:
                        collected.append(v[step])
                    elif isinstance(v, list):
                        collected.extend(
                            item[step]
                            for item in v
                            if isinstance(item, dict) and step in item
                        )
            nodes = collected
        out = []
        for v in nodes:
            if isinstance(v, list):
                out.extend(JsonNode(x, steps[-1] if steps else "") for x in v)
            else:
                out.append(JsonNode(v, steps[-1] if steps else ""))
        return ManyNodes(out)

    select = find_all

    @staticmethod
    def _descend(value: Any, key: str, out: list) -> None:
        if isinstance(value, dict):
            for k, v in value.items():
                if k == key:
                    out.append(v)
                JsonNode._descend(v, key, out)
        elif isinstance(value, list):
            for item in value:
                JsonNode._descend(item, key, out)

    def children(self, key: str) -> ManyNodes:
        if isinstance(self._v, dict) and key in self._v:
            v = self._v[key]
            if isinstance(v, list):
                return ManyNodes([JsonNode(x, key) for x in v])
            return ManyNodes([JsonNode(v, key)])
        return ManyNodes([])

    def attr(self, name: str) -> Optional[str]:
        """``@attr`` convention (ref: JsonNode.scala:33-122)."""
        if isinstance(self._v, dict):
            v = self._v.get(name, self._v.get(f"@{name}"))
            if v is not None and not isinstance(v, (dict, list)):
                return str(v)
        return None

    def __repr__(self) -> str:
        return f"JsonNode({self._name or type(self._v).__name__})"


def parse_node(body: bytes, mime: Optional[str] = None, base_uri: str = ""):
    """Parse bytes into the right Node implementation by (detected) mime."""
    mime = mime or detect_mime(body, uri=base_uri)
    base = base_mime(mime)
    charset = "utf-8"
    if mime and "charset=" in mime:
        charset = mime.split("charset=")[-1].strip()
    elif body:
        charset = sniff_charset(body)
    text = body.decode(charset, errors="replace")

    if base == "application/pdf":
        # Tika-parity normalization (ref: doc/Content.scala:50-82): binary →
        # XHTML so the ordinary CSS selector engine works on fetched PDFs
        from spookystuff_spark.doc.pdf import pdf_to_html

        root = parse_html(pdf_to_html(body))
        return HtmlNode(root, base_uri=base_uri)
    if base in ("application/json", "text/json"):
        try:
            return JsonNode(json.loads(text))
        except Exception:
            return PlainNode(text)
    if base in (
        "text/html",
        "application/xml",
        "text/xml",
        "application/xhtml+xml",
        "inode/directory",  # resolver renders directory listings as html
    ):
        root = parse_html(text)
        return HtmlNode(root, base_uri=base_uri)
    return PlainNode(text)
