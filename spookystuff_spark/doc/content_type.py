"""Content-type detection (ref: doc/Doc.scala:70-144 — Tika + universalchardet).

Stdlib-only rebuild: URL-extension hint via ``mimetypes``, magic-byte sniffing,
charset via charset_normalizer only when the cheap paths fail.
"""

from __future__ import annotations

import json
import mimetypes
from typing import Optional
from urllib.parse import urlparse

_MAGIC = [
    (b"%PDF", "application/pdf"),
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
]


def sniff_charset(body: bytes) -> str:
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(body[:65536]).best()
        if best and best.encoding:
            return best.encoding
    except Exception:
        pass
    return "latin-1"


def detect_mime(
    body: bytes, uri: str = "", declared: Optional[str] = None
) -> str:
    """Detect a mime string (with charset for text types)."""
    if declared and declared not in ("application/octet-stream", ""):
        return declared

    for magic, mime in _MAGIC:
        if body.startswith(magic):
            return mime

    head = body[:4096].lstrip()
    if head[:1] in (b"{", b"["):
        try:
            json.loads(body.decode(sniff_charset(body), errors="strict"))
            return "application/json"
        except Exception:
            pass
    low = head[:256].lower()
    if low.startswith(b"<?xml"):
        return "application/xml"
    if low.startswith(b"<!doctype html") or b"<html" in low or low.startswith(b"<head") or low.startswith(b"<body"):
        return f"text/html; charset={sniff_charset(body)}"
    if head[:1] == b"<":
        return "application/xml"

    if uri:
        guessed, _ = mimetypes.guess_type(urlparse(uri).path)
        if guessed:
            if guessed.startswith("text/"):
                return f"{guessed}; charset={sniff_charset(body)}"
            return guessed

    try:
        body.decode("utf-8")
        return "text/plain; charset=utf-8"
    except UnicodeDecodeError:
        return "application/octet-stream"


def base_mime(mime: Optional[str]) -> str:
    return (mime or "").split(";")[0].strip().lower()
