"""HTTP resolver path over a localhost server: GET, POST, redirects, 404
validation, content-type handling — the network path without any network."""

from __future__ import annotations

import http.server
import threading

import pytest

from spookystuff_spark.actions import Accept, Trace, Wget, Wpost, fetch_trace
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf


class _Handler(http.server.BaseHTTPRequestHandler):
    def log_message(self, *a):  # silence
        pass

    def do_GET(self):
        if self.path == "/page":
            body = b"<html><head><title>HTTP Page</title></head><body>ok</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/old":
            self.send_response(302)
            self.send_header("Location", "/page")
            self.end_headers()
        elif self.path == "/api":
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(b'{"status": "green", "items": [1, 2, 3]}')
        else:
            self.send_response(404)
            self.end_headers()
            self.wfile.write(b"not found")

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = self.rfile.read(n)
        self.send_response(200)
        self.send_header("Content-Type", "text/plain")
        self.end_headers()
        self.wfile.write(b"echo:" + body)


@pytest.fixture(scope="module")
def http_base():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def conf(**kw) -> SpookyConf:
    return SpookyConf(fetch_retries=1, retry_delay_sec=0).copy(**kw)


@pytest.fixture(autouse=True)
def _clear():
    mem_cache.clear()
    yield


def test_http_get(http_base):
    obs = fetch_trace(Trace((Wget(f"{http_base}/page"),)), conf())
    assert obs[0].success and obs[0].status == 200
    assert obs[0].parsed().find_only("title").text == "HTTP Page"
    assert "text/html" in obs[0].mime


def test_http_redirect_followed(http_base):
    obs = fetch_trace(Trace((Wget(f"{http_base}/old"),)), conf())
    assert obs[0].success and obs[0].status == 200
    assert obs[0].uri.endswith("/page")  # final (redirected) uri recorded


def test_http_json_api(http_base):
    obs = fetch_trace(Trace((Wget(f"{http_base}/api"),)), conf())
    node = obs[0].parsed()
    assert node.children("status").texts == ["green"]
    assert node.find_all("items").texts == ["1", "2", "3"]


def test_http_404_with_validation(http_base):
    t = Trace((Accept(Trace((Wget(f"{http_base}/missing"),)), policy="status2xx"),))
    obs = fetch_trace(t, conf())
    assert not obs[0].success
    assert "ValidationError" in obs[0].error and "404" in obs[0].error


def test_http_404_without_validation_is_doc(http_base):
    """Without Accept, a 404 is still a Doc (evidence), not an error."""
    obs = fetch_trace(Trace((Wget(f"{http_base}/missing"),)), conf())
    assert obs[0].success  # fetched fine; status carries the signal
    assert obs[0].status == 404


def test_http_post_echo(http_base):
    obs = fetch_trace(
        Trace((Wpost(f"{http_base}/submit", entity="k=v&x=1"),)), conf()
    )
    assert obs[0].success
    assert obs[0].bytes() == b"echo:k=v&x=1"


def test_http_cache_dedup(http_base):
    counters: dict[str, int] = {}

    def inc(name, n=1):
        counters[name] = counters.get(name, 0) + n

    c = conf()
    t = Trace((Wget(f"{http_base}/page"),))
    fetch_trace(t, c, inc)
    fetch_trace(t, c, inc)
    assert counters["pages_from_remote"] == 1
    assert counters["pages_from_cache"] == 1


def test_politeness_throttle(http_base):
    """politeness_delay_sec enforces a minimum gap between hits to one host."""
    import time as _time

    from spookystuff_spark.actions.http import _HOST_LAST

    _HOST_LAST.clear()
    c = conf(politeness_delay_sec=0.15, cache_read=False, cache_write=False)
    t0 = _time.monotonic()
    for i in range(3):
        fetch_trace(Trace((Wget(f"{http_base}/page?i={i}"),)), c)
    elapsed = _time.monotonic() - t0
    assert elapsed >= 0.30  # 3 hits → ≥ 2 enforced gaps


class _SiteHandler(http.server.BaseHTTPRequestHandler):
    PAGES = {
        "/": '<html><body><a href="/a">A</a><a href="/b">B</a></body></html>',
        "/a": '<html><body><a href="/c">C</a></body></html>',
        "/b": '<html><body><a href="/c">C</a></body></html>',
        "/c": "<html><body><h1>Leaf</h1></body></html>",
    }

    def log_message(self, *a):
        pass

    def do_GET(self):
        body = self.PAGES.get(self.path)
        if body is None:
            self.send_response(404)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(body.encode())


def test_http_explore_crawl(spark):
    """End-to-end HTTP crawl: explore a live linked site over localhost —
    diamond dedup + min-depth + per-node fetch-once, through the real
    requests resolver."""
    import threading as _threading

    from spookystuff_spark.context import SpookyContext
    from spookystuff_spark.functions.extractors import S

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SiteHandler)
    _threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        mem_cache.clear()
        sctx = SpookyContext(spark)
        dv = sctx.create(spark.createDataFrame([{"seed": f"{base}/"}]))
        out = dv.explore(
            Wget("{seed}"), expand=S("a").hrefs, range=(0, 4), ordinal_field="ord"
        )
        rows = out.select(uri=S.uri).to_df().collect()
        got = {r.uri.replace(base, "") or "/": r.depth for r in rows}
        assert got == {"/": 0, "/a": 1, "/b": 1, "/c": 2}
        assert sctx.metrics.snapshot()["pages_from_remote"] == 4
    finally:
        srv.shutdown()


def test_oauth_signed_request(http_base):
    """OAuthV2 in the trace → RFC 5849 Authorization header on the wire."""
    from spookystuff_spark.actions import OAuthV2
    from spookystuff_spark.actions.http import oauth_sign_header

    # deterministic signature check against a fixed nonce/ts
    creds = dict(
        consumer_key="ck", consumer_secret="cs", token="tk", token_secret="ts"
    )
    h1 = oauth_sign_header(creds, "GET", "http://x/api?b=2&a=1", "n0", "100")
    h2 = oauth_sign_header(creds, "GET", "http://x/api?a=1&b=2", "n0", "100")
    assert h1 == h2  # param order canonicalized
    assert h1.startswith("OAuth ") and "oauth_signature=" in h1

    # end-to-end: the server must see the header
    seen = {}

    class _EchoAuth(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"ok")

    import threading as _t

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _EchoAuth)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        t = Trace(
            (OAuthV2(**creds), Wget(f"http://127.0.0.1:{srv.server_address[1]}/api"))
        )
        obs = fetch_trace(t, conf(cache_read=False, cache_write=False))
        assert obs[0].success
        assert seen["auth"] and seen["auth"].startswith("OAuth ")
        assert 'oauth_consumer_key="ck"' in seen["auth"]
    finally:
        srv.shutdown()


def test_oauth_secrets_never_serialized(http_base):
    """Credentials must not leak into trace JSON, repr, or error dumps
    (ADVICE r01): secrets are redacted at serialization and re-resolved from
    SpookyConf.credentials (or env) at execute time on the worker."""
    from spookystuff_spark.actions import OAuthV2
    from spookystuff_spark.actions.core import trace_from_json

    act = OAuthV2(
        consumer_key="ck", consumer_secret="s3cr3t", token="tk",
        token_secret="t0ps3cr3t",
    )
    t = Trace((act, Wget("http://x/api")))
    js = t.to_json()
    assert "s3cr3t" not in js and "t0ps3cr3t" not in js
    assert "s3cr3t" not in repr(t) and "ck" in repr(t)

    # round-trip drops secrets; execute re-resolves them from conf.credentials
    rt = trace_from_json(js)
    oauth = rt.actions[0]
    assert oauth.consumer_secret == "" and oauth.token_secret == ""

    seen = {}

    class _EchoAuth(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen["auth"] = self.headers.get("Authorization")
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(b"ok")

    import threading as _t

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _EchoAuth)
    _t.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        t2 = trace_from_json(
            Trace(
                (act, Wget(f"http://127.0.0.1:{srv.server_address[1]}/api"))
            ).to_json()
        )
        c = conf(
            cache_read=False,
            cache_write=False,
            credentials={
                "ck": {"consumer_secret": "s3cr3t", "token_secret": "t0ps3cr3t"}
            },
        )
        obs = fetch_trace(t2, c)
        assert obs[0].success
        assert seen["auth"] and seen["auth"].startswith("OAuth ")
    finally:
        srv.shutdown()


def test_oauth_base_string_rfc5849_encoding():
    """RFC 5849 §3.4.1.3: already-encoded query params are decoded before
    signing (no double-encoding) and duplicate keys survive as a multiset."""
    from spookystuff_spark.actions.http import oauth_sign_header

    creds = dict(
        consumer_key="ck", consumer_secret="cs", token="tk", token_secret="ts"
    )
    # encoded-vs-decoded equivalence: 'a b' arrives as 'a%20b' in the URI
    h_enc = oauth_sign_header(creds, "GET", "http://x/api?q=a%20b", "n0", "100")
    h_raw = oauth_sign_header(creds, "GET", "http://x/api?q=a b", "n0", "100")
    assert h_enc == h_raw
    # duplicate keys are not collapsed: both values must influence signature
    h_dup = oauth_sign_header(creds, "GET", "http://x/api?t=1&t=2", "n0", "100")
    h_one = oauth_sign_header(creds, "GET", "http://x/api?t=1", "n0", "100")
    assert h_dup != h_one
