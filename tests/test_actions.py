"""Action/Trace algebra + runtime tests (model: execution/FetchPlanSpec.scala,
actions/WgetSpec.scala, caching specs in the reference)."""

from __future__ import annotations

import datetime as dt
import os

import pytest

from spookystuff_spark.actions import (
    NO_OP,
    Accept,
    Delay,
    LocalRetry,
    Loop,
    Mock,
    Trace,
    ValidationError,
    Wget,
    as_trace_set,
    fetch_trace,
    trace_from_json,
)
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf


@pytest.fixture(autouse=True)
def _clear_cache():
    mem_cache.clear()
    yield
    mem_cache.clear()


def conf(**kw) -> SpookyConf:
    return SpookyConf(fetch_retries=1, retry_delay_sec=0).copy(**kw)


# ------------------------------------------------------------------ algebra


def test_append_operator():
    t = Delay(0.01) + Wget("file:///tmp/a") + Wget("file:///tmp/b")
    assert isinstance(t, Trace)
    assert len(t) == 3
    assert t.has_export


def test_cartesian_and_union():
    ts = (Wget("a") | Wget("b")) * as_trace_set([Wget("c"), Wget("d")])
    assert len(ts) == 4
    firsts = [t.actions[0].uri for t in ts]
    seconds = [t.actions[1].uri for t in ts]
    assert firsts == ["a", "a", "b", "b"]
    assert seconds == ["c", "d", "c", "d"]


def test_delay_excluded_from_trace_key():
    t1 = Trace((Delay(1.0), Wget("file:///x")))
    t2 = Trace((Delay(99.0), Wget("file:///x")))
    t3 = Trace((Wget("file:///x"),))
    assert t1.key == t2.key == t3.key
    assert t1.key != Trace((Wget("file:///y"),)).key


def test_dry_run_minimal_backtraces():
    from spookystuff_spark.actions import Wpost

    t = Trace(
        (
            Wget("file:///a"),  # export, no state change
            Wpost("http://x", "p"),  # export + state change
            Wget("file:///b"),  # export — backtrace must include the Wpost
        )
    )
    bts = t.dry_run()
    assert len(bts) == 3
    assert [len(b) for b in bts] == [1, 1, 2]
    assert bts[2].actions[0] == Wpost("http://x", "p")


def test_json_roundtrip():
    t = Trace(
        (
            Delay(0.5),
            Loop(Trace((Wget("file:///x"),)), limit=3),
            Accept(Trace((Wget("file:///y"),)), policy="has_title"),
        )
    )
    t2 = trace_from_json(t.to_json())
    assert t2 == t
    assert t2.key == t.key


def test_control_block_flags_propagate():
    loop = Loop(Trace((Wget("file:///x"),)))
    assert loop.HAS_EXPORT
    assert not loop.MAY_CHANGE_STATE
    assert Trace((loop,)).has_export


# ------------------------------------------------------------------ runtime


def test_fetch_file(tmp_path):
    p = tmp_path / "hello.html"
    p.write_text("<html><head><title>Hi</title></head><body>x</body></html>")
    obs = fetch_trace(Trace((Wget(f"file://{p}"),)), conf())
    assert len(obs) == 1
    assert obs[0].success
    assert "text/html" in obs[0].mime
    assert b"<title>Hi</title>" in obs[0].content


def test_fetch_directory_listing(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "f.txt").write_text("x")
    obs = fetch_trace(Trace((Wget(f"file://{tmp_path}"),)), conf())
    node = obs[0].parsed()
    hrefs = node.find_all("a").hrefs
    assert any(h.endswith("/sub") for h in hrefs)
    assert any(h.endswith("/f.txt") for h in hrefs)
    assert obs[0].mime.startswith("inode/directory")


def test_fetch_error_is_data():
    obs = fetch_trace(Trace((Wget("file:///nonexistent-xyz"),)), conf())
    assert len(obs) == 1
    assert not obs[0].success
    assert "FileNotFoundError" in obs[0].error


def test_cache_dedup_metrics(tmp_path):
    """Reference invariant: second fetch of same trace served from cache
    (ITBaseSpec.scala:79-96)."""
    p = tmp_path / "a.txt"
    p.write_text("payload")
    counters: dict[str, int] = {}

    def inc(name, n=1):
        counters[name] = counters.get(name, 0) + n

    c = conf()
    t = Trace((Wget(f"file://{p}"),))
    fetch_trace(t, c, inc)
    assert counters.get("pages_from_remote") == 1
    fetch_trace(t, c, inc)
    assert counters.get("pages_from_remote") == 1  # unchanged
    assert counters.get("pages_from_cache") == 1
    assert counters.get("pages_fetched") == 2


def test_dfs_cache_cold_process(tmp_path):
    """DFS level survives memory-cache loss (new executor / new process)."""
    p = tmp_path / "a.txt"
    p.write_text("payload")
    c = conf(dfs_cache_root=str(tmp_path / "cache"))
    t = Trace((Wget(f"file://{p}"),))
    fetch_trace(t, c)
    mem_cache.clear()  # simulate a fresh worker
    counters: dict[str, int] = {}
    obs = fetch_trace(t, c, lambda n, k=1: counters.__setitem__(n, counters.get(n, 0) + k))
    assert obs[0].from_cache
    assert counters.get("pages_from_cache") == 1
    assert "pages_from_remote" not in counters


def test_cache_ttl_expiry(tmp_path):
    p = tmp_path / "a.txt"
    p.write_text("payload")
    c = conf(cached_docs_lifespan=dt.timedelta(milliseconds=1))
    t = Trace((Wget(f"file://{p}"),))
    fetch_trace(t, c)
    import time

    time.sleep(0.01)
    counters: dict[str, int] = {}
    fetch_trace(t, c, lambda n, k=1: counters.__setitem__(n, counters.get(n, 0) + k))
    assert counters.get("pages_from_remote") == 1  # expired → refetch


def test_accept_validation(tmp_path):
    p = tmp_path / "nohead.txt"
    p.write_text("just text")
    t = Trace((Accept(Trace((Wget(f"file://{p}"),)), policy="has_title"),))
    obs = fetch_trace(t, conf())
    assert not obs[0].success
    assert "ValidationError" in obs[0].error


def test_mock_action():
    t = Trace((Mock(content=b"<html><body><p>hi</p></body></html>"),))
    obs = fetch_trace(t, conf())
    assert obs[0].parsed().find_all("p").texts == ["hi"]


def test_local_retry_eventually_raises():
    t = Trace((LocalRetry(Trace((Wget("file:///nope"),)), retries=2),))
    obs = fetch_trace(t, conf())
    assert not obs[0].success


def test_action_timeout_is_data():
    """Per-action timeout in helper thread (Action.scala:131-159): a slow
    action times out and surfaces as an error row."""
    t = Trace((Delay(5.0), Wget("file:///tmp/whatever"),))
    c = conf(remote_timeout_sec=0.2)
    obs = fetch_trace(t, c)
    assert len(obs) == 1
    assert not obs[0].success
    assert "TimeoutError" in obs[0].error


def test_loop_inside_fetch(tmp_path):
    """Loop control block executes its body up to `limit` times in one trace."""
    p = tmp_path / "x.txt"
    p.write_text("payload")
    t = Trace((Loop(Trace((Wget(f"file://{p}"),)), limit=3),))
    obs = fetch_trace(t, conf())
    assert len(obs) == 3  # 3 iterations, each exporting one doc
    assert all(o.success for o in obs)


def test_wpost_file_scheme_writes(tmp_path):
    """Wpost to a file:// uri = DFS write (Wpost.scala parity)."""
    from spookystuff_spark.actions import Wpost

    target = tmp_path / "out" / "posted.txt"
    t = Trace((Wpost(f"file://{target}", entity="hello dfs"),))
    obs = fetch_trace(t, conf())
    assert obs[0].success
    assert target.read_text() == "hello dfs"


def test_formatted_code(tmp_path):
    from spookystuff_spark.doc.node import parse_node

    n = parse_node(b"<html><body><ul><li>a</li><li>b</li></ul></body></html>")
    fc = n.find_only("ul").formatted_code
    assert fc.splitlines() == [
        "<ul>",
        "  <li>a</li>",
        "  <li>b</li>",
        "</ul>",
    ]
