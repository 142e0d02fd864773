"""Minimal pure-python PDF → normalized-HTML extraction (Tika parity).

Ref: doc/Content.scala:50-82 — the reference auto-parses fetched binaries
(Tika) into a normalized XHTML doc so the ordinary selector API works on
PDFs. This stdlib rebuild covers the dominant text-PDF shape:

* object/stream scan (``stream``/``endstream`` segments with their dicts),
* ``/FlateDecode`` via zlib (the overwhelmingly common filter),
* content-stream text operators: ``Tj``, ``'``, ``TJ`` (kerning numbers
  dropped), with ``Td``/``TD``/``T*`` treated as line breaks,
* PDF literal-string escapes (``\\( \\) \\\\ \\n \\r \\t \\b \\f`` + octal),
* ``/Title`` from the Info dictionary.

Output: ``pdf_to_html`` renders one ``<div class="page">`` per page with one
``<p>`` per text line — a node tree the CSS engine (doc/html_node.py) queries
like any fetched page. Encrypted, image-only, or exotic-filter PDFs yield an
empty body rather than an error (same graceful degradation as Tika's empty
handler).
"""

from __future__ import annotations

import html as html_mod
import re
import zlib
from typing import Optional

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.DOTALL)
_TITLE_RE = re.compile(rb"/Title\s*\(")
_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


def _read_literal_string(data: bytes, start: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at ``data[start] == '('``.
    Returns (decoded bytes, index after the closing paren)."""
    assert data[start : start + 1] == b"("
    out = bytearray()
    depth = 1
    i = start + 1
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal escape \d{1,3}
                j = i + 1
                while j < min(i + 4, n) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            i += 2  # line continuation or unknown escape: drop the backslash
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out += c
        i += 1
    return bytes(out), n


_TOKEN_RE = re.compile(rb"Tj|TJ|T\*|Td|TD|'|BT|ET|\(|\[|\]")


def _content_text_lines(stream: bytes) -> list[str]:
    """Text lines of one content stream: ``Td``/``TD``/``T*``/``'`` between
    shows start a new line; consecutive shows on the same line concatenate."""
    lines: list[list[bytes]] = []
    current: list[bytes] = []
    pending_break = False
    pending_strings: list[bytes] = []

    def flush_show(newline_first: bool) -> None:
        nonlocal current, pending_break
        if not pending_strings:
            return
        if (newline_first or pending_break) and current:
            lines.append(current)
            current = []
        current.append(b"".join(pending_strings))
        pending_strings.clear()
        pending_break = False

    i = 0
    n = len(stream)
    while i < n:
        m = _TOKEN_RE.search(stream, i)
        if not m:
            break
        tok = m.group()
        if tok == b"(":
            s, i = _read_literal_string(stream, m.start())
            pending_strings.append(s)
            continue
        i = m.end()
        if tok in (b"Td", b"TD", b"T*"):
            pending_break = True
        elif tok == b"'":
            flush_show(newline_first=True)
        elif tok in (b"Tj", b"TJ"):
            flush_show(newline_first=False)
        elif tok in (b"BT", b"ET"):
            pending_strings.clear()
    if current:
        lines.append(current)
    return [b"".join(parts).decode("latin-1") for parts in lines]


def _decoded_streams(body: bytes) -> list[bytes]:
    out = []
    for m in _STREAM_RE.finditer(body):
        meta, data = m.group(1), m.group(2)
        data = data.rstrip(b"\r\n")
        if b"/FlateDecode" in meta:
            try:
                data = zlib.decompress(data)
            except zlib.error:
                continue
        elif b"/Filter" in meta:
            continue  # unsupported filter — skip, don't fail
        out.append(data)
    return out


def pdf_title(body: bytes) -> Optional[str]:
    m = _TITLE_RE.search(body)
    if not m:
        return None
    s, _ = _read_literal_string(body, m.end() - 1)
    return s.decode("latin-1")


def pdf_to_pages(body: bytes) -> list[list[str]]:
    """→ one list of text lines per content stream that carries text."""
    pages = []
    for stream in _decoded_streams(body):
        if b"BT" not in stream:
            continue
        lines = _content_text_lines(stream)
        if lines:
            pages.append(lines)
    return pages


def pdf_to_text(body: bytes) -> str:
    return "\n".join("\n".join(page) for page in pdf_to_pages(body))


def pdf_to_html(body: bytes) -> str:
    """Normalized XHTML rendering (Content.scala:50-82 parity): selectable
    with the ordinary CSS engine — div.page / p lines / title."""
    title = pdf_title(body) or ""
    pages = pdf_to_pages(body)
    divs = "".join(
        '<div class="page">'
        + "".join(f"<p>{html_mod.escape(line)}</p>" for line in page)
        + "</div>"
        for page in pages
    )
    return (
        f"<html><head><title>{html_mod.escape(title)}</title></head>"
        f"<body>{divs}</body></html>"
    )
