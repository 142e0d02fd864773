"""Export actions: Wget / Wpost (ref: actions/Wget.scala:20-78,
actions/Wpost.scala:16-102).

URI templates: ``Wget("file:///data/{path}")`` interpolates row columns at plan
time (dsl string-interpolation parity) — see plans/fetch.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import threading
import time
from urllib.parse import urlparse as _urlparse

from spookystuff_spark.actions.core import Action, register_action
from spookystuff_spark.doc.observation import Doc, now_ms
from spookystuff_spark.sources.resolvers import omni_resolve

# per-worker politeness throttle (ref: Delay politeness semantics, applied
# automatically per host): host → last remote-hit monotonic time
_HOST_LAST: dict[str, float] = {}
_HOST_LOCK = threading.Lock()


def _throttle_host(uri: str, min_gap_sec: float) -> None:
    if min_gap_sec <= 0:
        return
    host = _urlparse(uri).netloc
    if not host:
        return
    while True:
        with _HOST_LOCK:
            now = time.monotonic()
            last = _HOST_LAST.get(host, 0.0)
            wait = min_gap_sec - (now - last)
            if wait <= 0:
                _HOST_LAST[host] = now
                return
        time.sleep(min(wait, 0.05))


@register_action
@dataclasses.dataclass(frozen=True)
class Wget(Action):
    """GET any supported scheme (http/https/file/data; directory → listing doc)."""

    uri: str = ""

    MAY_CHANGE_STATE = False  # driverless, replayable anywhere
    HAS_EXPORT = True

    def execute(self, agent) -> list:
        _throttle_host(self.uri, agent.conf.politeness_delay_sec)
        r = omni_resolve(
            self.uri,
            headers=_auth_headers(agent, "GET", self.uri),
            timeout_sec=agent.conf.remote_timeout_sec,
        )
        return [
            Doc(
                uri=r.uri,
                mime=r.mime,
                status=r.status,
                ts_ms=now_ms(),
                content=r.content,
            )
        ]

    def __repr__(self) -> str:
        return f"Wget({self.uri!r})"


@register_action
@dataclasses.dataclass(frozen=True)
class Wpost(Action):
    """HTTP POST (ref: actions/Wpost.scala:16-102)."""

    uri: str = ""
    entity: str = ""
    content_type: str = "application/x-www-form-urlencoded"

    MAY_CHANGE_STATE = True  # POST mutates remote state
    HAS_EXPORT = True

    def execute(self, agent) -> list:
        from urllib.parse import urlparse

        scheme = urlparse(self.uri).scheme
        if scheme in ("", "file"):
            # non-http schemes: POST = DFS write (ref: Wpost.scala:16-102);
            # fsio → works against any pyarrow.fs-backed store
            from spookystuff_spark import fsio

            path = urlparse(self.uri).path or self.uri
            fsio.mkdirs(fsio.parent(path) or ".")
            fsio.write_bytes(path, self.entity.encode())
            return [
                Doc(
                    uri=self.uri,
                    mime="text/plain; charset=utf-8",
                    status=200,
                    content=self.entity.encode(),
                )
            ]
        r = omni_resolve(
            self.uri,
            method="POST",
            body=self.entity.encode(),
            headers={
                "Content-Type": self.content_type,
                **(_auth_headers(agent, "POST", self.uri) or {}),
            },
            timeout_sec=agent.conf.remote_timeout_sec,
        )
        return [
            Doc(uri=r.uri, mime=r.mime, status=r.status, content=r.content)
        ]

    def __repr__(self) -> str:
        return f"Wpost({self.uri!r})"


@register_action
@dataclasses.dataclass(frozen=True)
class OAuthV2(Action):
    """Arms OAuth signing for subsequent http requests in the same trace
    (ref: actions/OAuthV2.scala). Signing itself is RFC 5849 (OAuth 1.0a
    HMAC-SHA1) computed per request in ``oauth_sign_header``."""

    consumer_key: str = ""
    consumer_secret: str = ""
    token: str = ""
    token_secret: str = ""

    MAY_CHANGE_STATE = True
    # secrets never enter trace JSON / checkpoints / error dumps — on workers
    # they re-resolve from SpookyConf.credentials[consumer_key] or env
    SECRET_FIELDS = ("consumer_secret", "token_secret")

    def __repr__(self) -> str:  # keeps error dumps and logs secret-free
        return (
            f"OAuthV2(consumer_key={self.consumer_key!r}, "
            f"consumer_secret=***, token={self.token!r}, token_secret=***)"
        )

    def execute(self, agent) -> list:
        creds = dataclasses.asdict(self)
        if not creds["consumer_secret"] or not creds["token_secret"]:
            import os

            stored = (getattr(agent.conf, "credentials", None) or {}).get(
                self.consumer_key, {}
            )
            for k, env in (
                ("consumer_secret", "SPOOKY_OAUTH_CONSUMER_SECRET"),
                ("token_secret", "SPOOKY_OAUTH_TOKEN_SECRET"),
            ):
                creds[k] = creds[k] or stored.get(k) or os.environ.get(env, "")
        agent.session_state["oauth"] = creds
        return []


def oauth_sign_header(
    creds: dict, method: str, uri: str, nonce: str, ts: str
) -> str:
    """RFC 5849 HMAC-SHA1 Authorization header (deterministic given nonce/ts)."""
    import base64
    import hashlib
    import hmac
    from urllib.parse import quote, unquote, urlsplit

    def enc(s: str) -> str:
        return quote(s, safe="~")

    parts = urlsplit(uri)
    base_uri = f"{parts.scheme}://{parts.netloc}{parts.path}"
    params = {
        "oauth_consumer_key": creds["consumer_key"],
        "oauth_nonce": nonce,
        "oauth_signature_method": "HMAC-SHA1",
        "oauth_timestamp": ts,
        "oauth_token": creds["token"],
        "oauth_version": "1.0",
    }
    # RFC 5849 §3.4.1.3: query params are percent-DECODED first (the URI
    # carries them encoded — re-encoding without decoding double-encodes
    # reserved chars), duplicates kept as a multiset, then the normalized
    # string sorts the ENCODED (key, value) pairs.
    pairs = list(params.items())
    if parts.query:
        for kv in parts.query.split("&"):
            if not kv:
                continue
            k, _, v = kv.partition("=")
            pairs.append((unquote(k), unquote(v)))
    norm = "&".join(
        f"{k}={v}" for k, v in sorted((enc(k), enc(v)) for k, v in pairs)
    )
    base_string = "&".join([method.upper(), enc(base_uri), enc(norm)])
    key = f"{enc(creds['consumer_secret'])}&{enc(creds['token_secret'])}"
    sig = base64.b64encode(
        hmac.new(key.encode(), base_string.encode(), hashlib.sha1).digest()
    ).decode()
    fields = {k: v for k, v in params.items() if k.startswith("oauth_")}
    fields["oauth_signature"] = sig
    inner = ", ".join(f'{enc(k)}="{enc(v)}"' for k, v in sorted(fields.items()))
    return f"OAuth {inner}"


def _auth_headers(agent, method: str, uri: str) -> Optional[dict]:
    creds = agent.session_state.get("oauth")
    if not creds:
        return None
    import uuid

    from spookystuff_spark.doc.observation import now_ms

    return {
        "Authorization": oauth_sign_header(
            creds, method, uri, uuid.uuid4().hex, str(now_ms() // 1000)
        )
    }
