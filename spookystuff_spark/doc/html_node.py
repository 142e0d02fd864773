"""HTML/XML document tree with CSS-selector querying — stdlib-only rebuild of
the jsoup-backed HtmlNode (ref: doc/HtmlNode.scala:34-175, doc/Node.scala:51-87,
doc/NodeContainer.scala:3-24, doc/Siblings.scala:8-38).

Supported selector subset (covers the reference's test usage): tag, ``*``,
``#id``, ``.class``, ``[attr]``, ``[attr=v]``, ``[attr~=v]``, ``[attr^=v]``,
``[attr$=v]``, ``[attr*=v]``, descendant (space), child (``>``), groups (``,``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, Optional
from urllib.parse import urljoin

VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
_WS = re.compile(r"\s+")


class Element:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Optional[dict] = None, parent=None):
        self.tag = tag
        self.attrs: dict[str, str] = attrs or {}
        self.children: list = []  # Element | str
        self.parent: Optional["Element"] = parent

    # --- traversal
    def iter_elements(self) -> Iterator["Element"]:
        for c in self.children:
            if isinstance(c, Element):
                yield c
                yield from c.iter_elements()

    def element_children(self) -> list["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    # --- text
    def text(self) -> str:
        parts: list[str] = []
        self._collect_text(parts)
        return _WS.sub(" ", "".join(parts)).strip()

    def _collect_text(self, parts: list[str]) -> None:
        if self.tag in ("script", "style"):
            return
        for c in self.children:
            if isinstance(c, str):
                parts.append(c)
            else:
                c._collect_text(parts)
                parts.append(" ")

    def own_text(self) -> str:
        return _WS.sub(
            " ", "".join(c for c in self.children if isinstance(c, str))
        ).strip()

    # --- serialization
    def outer_html(self, indent: Optional[int] = None) -> str:
        attrs = "".join(f' {k}="{v}"' for k, v in self.attrs.items())
        if self.tag in VOID_TAGS:
            return f"<{self.tag}{attrs}>"
        inner = self.inner_html()
        return f"<{self.tag}{attrs}>{inner}</{self.tag}>"

    def inner_html(self) -> str:
        out = []
        for c in self.children:
            out.append(c if isinstance(c, str) else c.outer_html())
        return "".join(out)

    def breadcrumb(self) -> str:
        """Tag path from root (ref: HtmlNode 'breadcrumb' extractor)."""
        path, node = [], self
        while node is not None and node.tag != "#root":
            path.append(node.tag)
            node = node.parent
        return "/".join(reversed(path))


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#root")
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)
        if tag not in VOID_TAGS:
            self.stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), parent=self.stack[-1])
        self.stack[-1].children.append(el)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (jsoup-style tolerance)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(text: str) -> Element:
    builder = _TreeBuilder()
    builder.feed(text)
    builder.close()
    return builder.root


# ---------------------------------------------------------------- CSS engine

_COMPOUND_RE = re.compile(
    r"(?P<tag>[\w-]+|\*)?(?P<rest>(?:[#.][\w-]+|\[[^\]]*\])*)$"
)
_PART_RE = re.compile(r"[#.][\w-]+|\[[^\]]*\]")
_ATTR_RE = re.compile(r"\[\s*([\w:-]+)\s*(?:([~^$*|]?=)\s*['\"]?([^'\"\]]*)['\"]?)?\s*\]")


class Compound:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, token: str):
        m = _COMPOUND_RE.match(token)
        if not m:
            raise ValueError(f"unsupported css token: {token!r}")
        self.tag = m.group("tag") if m.group("tag") not in (None, "*") else None
        self.id: Optional[str] = None
        self.classes: list[str] = []
        self.attrs: list[tuple[str, str, str]] = []
        for part in _PART_RE.findall(m.group("rest") or ""):
            if part.startswith("#"):
                self.id = part[1:]
            elif part.startswith("."):
                self.classes.append(part[1:])
            else:
                am = _ATTR_RE.match(part)
                if am:
                    self.attrs.append((am.group(1), am.group(2) or "", am.group(3) or ""))

    def matches(self, el: Element) -> bool:
        if self.tag and el.tag != self.tag:
            return False
        if self.id and el.attrs.get("id") != self.id:
            return False
        if self.classes:
            el_classes = (el.attrs.get("class") or "").split()
            if not all(c in el_classes for c in self.classes):
                return False
        for name, op, val in self.attrs:
            actual = el.attrs.get(name)
            if actual is None:
                return False
            if op == "":
                continue
            if op == "=" and actual != val:
                return False
            if op == "~=" and val not in actual.split():
                return False
            if op == "^=" and not actual.startswith(val):
                return False
            if op == "$=" and not actual.endswith(val):
                return False
            if op == "*=" and val not in actual:
                return False
        return True


def _parse_selector(css: str) -> list[list[tuple[str, Compound]]]:
    groups = []
    for group in css.split(","):
        tokens = group.replace(">", " > ").split()
        seq: list[tuple[str, Compound]] = []
        comb = " "
        for tok in tokens:
            if tok == ">":
                comb = ">"
                continue
            seq.append((comb, Compound(tok)))
            comb = " "
        if seq:
            groups.append(seq)
    return groups


def _matches_seq(el: Element, seq: list[tuple[str, Compound]]) -> bool:
    if not seq[-1][1].matches(el):
        return False

    def walk(node: Element, idx: int) -> bool:
        if idx < 0:
            return True
        comb, comp = seq[idx]
        parent = node.parent
        if comb == ">":
            return parent is not None and comp.matches(parent) and walk(parent, idx - 1)
        while parent is not None:
            if comp.matches(parent) and walk(parent, idx - 1):
                return True
            parent = parent.parent
        return False

    comb, _ = seq[-1]
    if len(seq) == 1:
        return True
    if comb == ">":
        p = el.parent
        return p is not None and seq[-2][1].matches(p) and walk(p, len(seq) - 3)
    p = el.parent
    while p is not None:
        if seq[-2][1].matches(p) and walk(p, len(seq) - 3):
            return True
        p = p.parent
    return False


def css_find_all(root: Element, css: str) -> list[Element]:
    groups = _parse_selector(css)
    out, seen = [], set()
    for el in root.iter_elements():
        if id(el) in seen:
            continue
        for seq in groups:
            if _matches_seq(el, seq):
                out.append(el)
                seen.add(id(el))
                break
    return out


# ---------------------------------------------------------------- public node


class HtmlNode:
    """Node-container view over an Element (ref: doc/HtmlNode.scala:34-175)."""

    def __init__(self, el: Element, base_uri: str = ""):
        self._el = el
        self.base_uri = base_uri

    # --- NodeContainer API (ref: doc/NodeContainer.scala:3-24)
    def find_all(self, css: str) -> "ManyNodes":
        return ManyNodes(
            [HtmlNode(e, self.base_uri) for e in css_find_all(self._el, css)]
        )

    select = find_all
    __call__ = find_all

    def find_first(self, css: str) -> Optional["HtmlNode"]:
        found = self.find_all(css)
        return found[0] if found else None

    def find_only(self, css: str) -> "HtmlNode":
        found = self.find_all(css)
        if len(found) != 1:
            raise ValueError(f"findOnly({css!r}): {len(found)} matches")
        return found[0]

    def children(self, css: Optional[str] = None) -> "ManyNodes":
        kids = [HtmlNode(e, self.base_uri) for e in self._el.element_children()]
        if css:
            groups = _parse_selector(css)
            kids = [
                k
                for k in kids
                if any(len(seq) == 1 and seq[0][1].matches(k._el) for seq in groups)
            ]
        return ManyNodes(kids)

    def _expand(self, found: list["HtmlNode"], sibling_range: range) -> list["Siblings"]:
        """Sibling-window expansion with the no-overlap rule
        (ref: HtmlNode.scala:88-109 expand): each window is clipped at the
        nearest OTHER matched element, so adjacent matches never share
        siblings."""
        found_els = [n._el for n in found]
        out = []
        for node in found:
            el = node._el
            parent = el.parent
            if parent is None:
                out.append(Siblings([node]))
                continue
            sibs = parent.element_children()
            i = sibs.index(el)
            lo = max(0, i + sibling_range.start)
            hi = min(len(sibs), i + sibling_range.stop)
            for j in range(i - 1, lo - 1, -1):  # clip at previous match
                if any(sibs[j] is fe for fe in found_els):
                    lo = j + 1
                    break
            for j in range(i + 1, hi):  # clip at next match
                if any(sibs[j] is fe for fe in found_els):
                    hi = j
                    break
            out.append(
                Siblings([HtmlNode(s, self.base_uri) for s in sibs[lo:hi]])
            )
        return out

    def find_all_with_siblings(
        self, css: str, sibling_range: range = range(-1, 2)
    ) -> list["Siblings"]:
        """Sibling-window expansion (ref: Node.scala:52-87 withSiblings)."""
        return self._expand(list(self.find_all(css)), sibling_range)

    def children_with_siblings(
        self, css: str, sibling_range: range = range(-1, 2)
    ) -> list["Siblings"]:
        """children(css) restricted matches, each with its sibling window
        (ref: HtmlNode.scala:121-130 childrenWithSiblings)."""
        return self._expand(list(self.children(css)), sibling_range)

    # --- extractors (ref: doc/HtmlNode.scala:75-175)
    @property
    def text(self) -> str:
        return self._el.text()

    @property
    def own_text(self) -> str:
        return self._el.own_text()

    @property
    def code(self) -> str:
        return self._el.outer_html()

    @property
    def formatted_code(self) -> str:
        """Indented outer html (ref: HtmlNode formattedCode extractor)."""
        return self._format(self._el, 0)

    @staticmethod
    def _format(el: Element, depth: int) -> str:
        pad = "  " * depth
        attrs = "".join(f' {k}="{v}"' for k, v in el.attrs.items())
        if el.tag in VOID_TAGS:
            return f"{pad}<{el.tag}{attrs}>"
        kids = [c for c in el.children if isinstance(c, Element)]
        text = el.own_text()
        if not kids:
            inner = text
            return f"{pad}<{el.tag}{attrs}>{inner}</{el.tag}>"
        lines = [f"{pad}<{el.tag}{attrs}>"]
        if text:
            lines.append(f"{pad}  {text}")
        lines.extend(HtmlNode._format(k, depth + 1) for k in kids)
        lines.append(f"{pad}</{el.tag}>")
        return "\n".join(lines)

    @property
    def breadcrumb(self) -> str:
        return self._el.breadcrumb()

    def attr(self, name: str, no_empty: bool = True) -> Optional[str]:
        v = self._el.attrs.get(name)
        if no_empty and v is not None and not v.strip():
            return None
        return v

    @property
    def all_attrs(self) -> dict[str, str]:
        return dict(self._el.attrs)

    @property
    def href(self) -> Optional[str]:
        v = self.attr("href")
        return urljoin(self.base_uri, v) if v else None

    @property
    def src(self) -> Optional[str]:
        v = self.attr("src")
        return urljoin(self.base_uri, v) if v else None

    @property
    def article_text(self) -> str:
        """boilerPipe parity (ref: Doc.boilerPipe → jsoup+boilerpipe): the
        published NumWordsRules block classifier (Kohlschütter et al., WSDM
        2010 — shallow text features) over DOM text blocks: a block is CONTENT
        based on its own + neighbors' word counts and link density. Semantic
        <article>/<main> containers short-circuit (stronger signal than the
        classifier)."""
        for css in ("article", "main"):
            found = self.find_all(css)
            if found:
                return found[0].text
        blocks = _text_blocks(self._el)
        if not blocks:
            return self.text
        kept = []
        for i, (words, link_words, text) in enumerate(blocks):
            prev_w, prev_ld = (0, 0.0)
            if i > 0:
                pw, plw, _ = blocks[i - 1]
                prev_w, prev_ld = pw, (plw / pw if pw else 0.0)
            next_w = blocks[i + 1][0] if i + 1 < len(blocks) else 0
            ld = link_words / words if words else 0.0
            if _num_words_rules(words, ld, prev_w, prev_ld, next_w):
                kept.append(text)
        return " ".join(kept) if kept else self.text

    def __repr__(self) -> str:
        return f"HtmlNode(<{self._el.tag}>)"


_BLOCK_TAGS = frozenset(
    {"p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
     "section", "article", "header", "footer", "nav", "aside", "blockquote",
     "pre", "table", "ul", "ol", "tr", "br", "form", "body", "html"}
)
_SKIP_TAGS = frozenset({"script", "style", "noscript", "template"})


def _text_blocks(root: Element) -> list[tuple[int, int, str]]:
    """Flatten the DOM into text blocks at block-level boundaries →
    [(n_words, n_link_words, text)] (boilerpipe's block model)."""
    blocks: list[tuple[int, int, str]] = []
    buf: list[tuple[str, bool]] = []  # (fragment, inside_anchor)

    def flush():
        text = _WS.sub(" ", "".join(f for f, _ in buf)).strip()
        if text:
            words = text.split()
            link_words = sum(
                len(_WS.sub(" ", f).split()) for f, in_a in buf if in_a
            )
            blocks.append((len(words), min(link_words, len(words)), text))
        buf.clear()

    def walk(el: Element, in_anchor: bool):
        if el.tag in _SKIP_TAGS:
            return
        is_block = el.tag in _BLOCK_TAGS
        if is_block:
            flush()
        anchor = in_anchor or el.tag == "a"
        for c in el.children:
            if isinstance(c, str):
                buf.append((c, anchor))
            else:
                walk(c, anchor)
                buf.append((" ", anchor))
        if is_block:
            flush()

    walk(root, False)
    flush()
    return blocks


def _num_words_rules(
    words: int, link_density: float, prev_words: int, prev_link_density: float,
    next_words: int,
) -> bool:
    """boilerpipe's NumWordsRulesClassifier decision tree (published in the
    boilerpipe source / WSDM'10 paper) — True = CONTENT."""
    if link_density > 0.333333:
        return False
    if prev_link_density <= 0.555556:
        if words <= 16:
            if next_words <= 15:
                return prev_words > 4
            return True
        return True
    if words <= 40:
        return next_words > 17
    return True


class ManyNodes(list):
    """Batch extractors (ref: doc/ManyNodes.scala:8-37)."""

    @property
    def texts(self) -> list[str]:
        return [n.text for n in self]

    @property
    def codes(self) -> list[str]:
        return [n.code for n in self]

    def attrs(self, name: str) -> list[Optional[str]]:
        return [n.attr(name) for n in self]

    @property
    def hrefs(self) -> list[str]:
        return [n.href for n in self if n.href]

    @property
    def srcs(self) -> list[str]:
        return [n.src for n in self if n.src]

    @property
    def head(self):
        return self[0] if self else None


class Siblings(ManyNodes):
    """Sibling group with configurable delimiter (ref: doc/Siblings.scala:8-38)."""

    delimiter = " "

    @property
    def text(self) -> str:
        return self.delimiter.join(n.text for n in self)
