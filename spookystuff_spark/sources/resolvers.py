"""URI resolvers — scheme-dispatched fetch backends.

Ref parity: io/CompoundResolver.scala:39-90 (OmniResolver: any Hadoop scheme,
directory listing → structured doc), commons/.../io/HDFSResolver.scala,
actions/Wget.scala:20-78.

Directory fetches return an HTML listing doc with one ``<a href>`` per entry —
same shape the reference produces via XML — so ``explore`` over a filesystem
tree works with the ordinary link-extraction path.
"""

from __future__ import annotations

import html as html_mod
import os
from typing import Optional
from urllib.parse import unquote, urlparse

from spookystuff_spark.doc.content_type import detect_mime


class FetchResult:
    __slots__ = ("uri", "content", "mime", "status")

    def __init__(self, uri: str, content: bytes, mime: str, status: Optional[int] = None):
        self.uri = uri
        self.content = content
        self.mime = mime
        self.status = status


def _dir_listing_doc(path: str, uri: str) -> FetchResult:
    entries = sorted(os.listdir(path))
    rows = []
    for name in entries:
        full = os.path.join(path, name)
        kind = "dir" if os.path.isdir(full) else "file"
        esc = html_mod.escape(name)
        rows.append(f'<a class="{kind}" href="file://{html_mod.escape(full)}">{esc}</a>')
    body = (
        f"<html><head><title>{html_mod.escape(path)}</title></head>"
        f"<body>{''.join(rows)}</body></html>"
    ).encode()
    return FetchResult(uri, body, "inode/directory; charset=utf-8", 200)


def resolve_file(uri: str) -> FetchResult:
    parsed = urlparse(uri)
    path = unquote(parsed.path) if parsed.scheme else uri
    if os.path.isdir(path):
        return _dir_listing_doc(path, uri)
    with open(path, "rb") as f:
        content = f.read()
    return FetchResult(uri, content, detect_mime(content, uri=uri), 200)


def resolve_http(
    uri: str,
    method: str = "GET",
    body: Optional[bytes] = None,
    headers: Optional[dict] = None,
    timeout_sec: float = 60.0,
    user_agent: str = "spookystuff-spark/0.1",
) -> FetchResult:
    import requests

    hdrs = {"User-Agent": user_agent, **(headers or {})}
    resp = requests.request(
        method, uri, data=body, headers=hdrs, timeout=timeout_sec, allow_redirects=True
    )
    declared = resp.headers.get("Content-Type")
    return FetchResult(
        resp.url,
        resp.content,
        detect_mime(resp.content, uri=resp.url, declared=declared),
        resp.status_code,
    )


def resolve_data(uri: str) -> FetchResult:
    """data: URIs — handy deterministic test seam."""
    import base64

    meta, _, payload = uri[5:].partition(",")
    if meta.endswith(";base64"):
        content = base64.b64decode(payload)
        mime = meta[: -len(";base64")] or "text/plain"
    else:
        content = unquote(payload).encode()
        mime = meta or "text/plain"
    return FetchResult(uri, content, mime or detect_mime(content), 200)


def omni_resolve(
    uri: str,
    method: str = "GET",
    body: Optional[bytes] = None,
    headers: Optional[dict] = None,
    timeout_sec: float = 60.0,
) -> FetchResult:
    """Scheme dispatch (ref: CompoundResolver.scala:39-90)."""
    scheme = urlparse(uri).scheme
    if scheme in ("", "file"):
        return resolve_file(uri)
    if scheme in ("http", "https"):
        return resolve_http(uri, method, body, headers, timeout_sec)
    if scheme == "data":
        return resolve_data(uri)
    raise ValueError(f"unsupported scheme {scheme!r} in {uri!r}")
