"""Agent runtime: executes traces with timeout, retry, two-level cache
read-before-fetch and write-through.

Ref parity: actions/Trace.scala:155-273 (fetch/fetchOnce protocol),
actions/Action.scala:79-159 (timeout-in-helper-thread, error dump),
agent/Agent.scala:20-91.

Cache-idempotency is the core invariant (ref: ITBaseSpec.scala:79-96): a trace
key fetched once is never fetched remotely again within TTL — this is what
makes side-effectful fetches safe under Spark speculative execution and task
retry. The runtime is deliberately SparkSession-free so it runs identically on
the driver, in tests, and inside Arrow-batch Python workers.
"""

from __future__ import annotations

import concurrent.futures
import time
from typing import Callable, Optional

from spookystuff_spark.actions.core import Action, Trace
from spookystuff_spark.caching import dfs as dfs_cache
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.doc.observation import ErrorObservation, now_ms

# one helper-thread pool per worker process (ref: Action.scala:144-147)
_POOL: Optional[concurrent.futures.ThreadPoolExecutor] = None


def _pool() -> concurrent.futures.ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        # 16 = up to 8 concurrent traces (conf.fetch_concurrency cap), each
        # with one action in flight, plus headroom for timed-out actions
        # whose threads are still self-terminating
        _POOL = concurrent.futures.ThreadPoolExecutor(max_workers=16)
    return _POOL


class Agent:
    """Per-task executor of actions (ref: agent/Agent.scala:20-91)."""

    def __init__(
        self,
        conf: SpookyConf,
        metrics_inc: Optional[Callable[[str, int], None]] = None,
    ):
        self.conf = conf
        self.session_state: dict = {}
        self._metrics_inc = metrics_inc
        self._finalizers: list[Callable[[], None]] = []

    def metrics_inc(self, name: str, n: int = 1) -> None:
        if self._metrics_inc:
            self._metrics_inc(name, n)

    def defer(self, fn: Callable[[], None]) -> None:
        """Register a cleanup to run at agent close (e.g. webdriver release)."""
        self._finalizers.append(fn)

    def close(self) -> None:
        for fn in reversed(self._finalizers):
            try:
                fn()
            except Exception:  # noqa: BLE001 — cleanup must not mask results
                pass
        self._finalizers.clear()

    def run_action(self, action: Action) -> list:
        timeout = action.TIMEOUT_SEC or self.conf.remote_timeout_sec
        fut = _pool().submit(action.execute, self)
        try:
            return fut.result(timeout=timeout)
        except concurrent.futures.TimeoutError:
            fut.cancel()  # best-effort: a RUNNING thread keeps going — the
            # I/O layer gets conf.remote_timeout_sec so it self-terminates
            # rather than clogging the 8-thread helper pool
            err = TimeoutError(f"{action!r} timed out after {timeout}s")
            err._may_change_state = action.MAY_CHANGE_STATE  # type: ignore[attr-defined]
            raise err from None


def _wayback_bound(trace: Trace) -> Optional[int]:
    from spookystuff_spark.actions.control import Wayback

    bounds = [a.ts_ms for a in trace.actions if isinstance(a, Wayback)]
    return min(bounds) if bounds else None


def _cache_window(conf: SpookyConf, trace: Trace) -> tuple[int, Optional[int]]:
    after = now_ms() - int(conf.cached_docs_lifespan.total_seconds() * 1000)
    if conf.ignore_cached_docs_before is not None:
        after = max(after, int(conf.ignore_cached_docs_before.timestamp() * 1000))
    return after, _wayback_bound(trace)


def _cache_level(conf: SpookyConf, trace: Trace) -> str:
    """Per-URI-scheme cache level (ref: caching/DocCacheLevel.scala:8-33).
    The backtrace's scheme comes from its last uri-bearing action (the
    export); unlisted schemes fall back to the "*" entry, then "memory"."""
    levels = conf.cache_levels
    if not levels:
        return "all"
    from urllib.parse import urlparse

    scheme = ""
    for a in reversed(trace.actions):
        uri = getattr(a, "uri", None)
        if uri:
            scheme = urlparse(uri).scheme or "file"
            break
    return levels.get(scheme, levels.get("*", "memory"))


def _cache_get(
    conf: SpookyConf, key: str, after: int, before: Optional[int], level: str = "all"
):
    if level == "none":
        return None
    if level in ("memory", "all"):
        obs = mem_cache.get(key, after, before)
        if obs is not None:
            return obs
    if level in ("dfs", "all") and conf.dfs_cache_root:
        obs = dfs_cache.get(conf.dfs_cache_root, key, after, before)
        if obs is not None and level == "all":
            mem_cache.put(key, obs)  # promote (only when memory is allowed)
        return obs
    return None


def _cache_put(
    conf: SpookyConf, key: str, obs: list, ts: int, level: str = "all"
) -> None:
    if level in ("memory", "all"):
        mem_cache.put(key, obs)
    if level in ("dfs", "all") and conf.dfs_cache_root:
        dfs_cache.put(conf.dfs_cache_root, key, obs, ts)


def fetch_trace(
    trace: Trace,
    conf: SpookyConf,
    metrics_inc: Optional[Callable[[str, int], None]] = None,
) -> list:
    """The fetch protocol (ref: Trace.scala:155-273).

    1. dry-run the trace into per-export backtraces;
    2. read-before-fetch: if EVERY backtrace hits cache (within TTL/wayback
       window) return cached observations — zero remote work;
    3. else execute the full trace once (with per-action timeout + whole-trace
       retries), tagging each observation with its backtrace key;
    4. write-through both cache levels, keyed per backtrace.

    Failures exhaust retries then come back as ErrorObservation rows — errors
    are data (Either-style), never task-killers.
    """

    def inc(name: str, n: int = 1) -> None:
        if metrics_inc:
            metrics_inc(name, n)

    backtraces = trace.dry_run()
    if not backtraces:  # nothing exports: execute for effects only
        backtraces = []

    after, before = _cache_window(conf, trace)

    # --- total-hit path
    if conf.cache_read and backtraces:
        hits = []
        for bt in backtraces:
            obs = _cache_get(conf, bt.key, after, before, _cache_level(conf, bt))
            if obs is None:
                hits = None
                break
            hits.append(obs)
        if hits is not None:
            out = []
            for obs in hits:
                for o in obs:
                    o.from_cache = True
                out.extend(obs)
            inc("pages_fetched", len(out))
            inc("pages_from_cache", len(out))
            return out

    # --- remote path
    agent = Agent(conf, metrics_inc)
    last_err: Optional[Exception] = None
    try:
        for attempt in range(max(1, conf.fetch_retries)):
            try:
                out = []
                per_key: dict[str, list] = {}
                prefix: list[Action] = []
                per_level: dict[str, str] = {}
                for a in trace.actions:
                    obs = agent.run_action(a)
                    if a.HAS_EXPORT or a.children().has_export:
                        bt = Trace(tuple(prefix) + (a,))
                        bt_key = bt.key
                        per_level[bt_key] = _cache_level(conf, bt)
                        for o in obs:
                            o.backtrace_key = bt_key
                        per_key.setdefault(bt_key, []).extend(obs)
                    out.extend(obs)
                    if a.MAY_CHANGE_STATE:
                        prefix.append(a)
                ts = now_ms()
                if conf.cache_write:
                    for key, obs in per_key.items():
                        _cache_put(conf, key, obs, ts, per_level[key])
                inc("pages_fetched", len(out))
                inc("pages_from_remote", len(out))
                inc("sessions_initialized")
                return out
            except TimeoutError as e:
                # a timed-out state-changing action may STILL complete
                # remotely (cancel() can't stop a running thread) — replaying
                # the trace would duplicate the side effect. Fail fast; the
                # doc-cache idempotency invariant covers task-level retries.
                last_err = e
                if getattr(e, "_may_change_state", False):
                    break
                if attempt + 1 < conf.fetch_retries and conf.retry_delay_sec:
                    time.sleep(conf.retry_delay_sec)
            except Exception as e:  # noqa: BLE001
                last_err = e
                if attempt + 1 < conf.fetch_retries and conf.retry_delay_sec:
                    time.sleep(conf.retry_delay_sec)
    finally:
        agent.close()  # release transient webdrivers etc.

    inc("fetch_errors")
    err = ErrorObservation(
        uri=getattr(trace.actions[0], "uri", "") if trace.actions else "",
        error=f"{type(last_err).__name__}: {last_err}",
        backtrace_key=trace.key,
    )
    if conf.error_dump_root:
        # error-dump audit (ref: Action.scala:109-129): one file per failed
        # trace, content-addressed → idempotent under task retry; fsio so
        # the dump root may live on DFS/object store like the reference's
        from spookystuff_spark import fsio

        try:
            fsio.mkdirs(conf.error_dump_root)
            path = fsio.join(conf.error_dump_root, f"{err.uid}.err.txt")
            fsio.write_bytes(
                path,
                f"trace: {trace!r}\nuri: {err.uri}\nerror: {err.error}\n".encode(),
            )
        except OSError:
            pass  # auditing must never fail the fetch path
    return [err]
