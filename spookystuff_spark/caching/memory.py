"""Executor-local in-memory doc cache (ref: caching/InMemoryDocCache.scala:10-36).

A process-global dict: with ``spark.python.worker.reuse`` (default on) the
Python worker survives across tasks, so this behaves exactly like the
reference's JVM-wide concurrent cache — one copy per executor worker, zero
serialization. Size-bounded LRU so a 100 TB run can't OOM a worker.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Optional

_LOCK = threading.Lock()
_CACHE: OrderedDict[str, list] = OrderedDict()
MAX_ENTRIES = 10_000


def put(key: str, observations: list) -> None:
    with _LOCK:
        _CACHE[key] = observations
        _CACHE.move_to_end(key)
        while len(_CACHE) > MAX_ENTRIES:
            _CACHE.popitem(last=False)


def get(key: str, after_ms: int = 0, before_ms: Optional[int] = None) -> Optional[list]:
    with _LOCK:
        obs = _CACHE.get(key)
    if obs is None:
        return None
    ts = max((o.ts_ms for o in obs), default=0)
    if ts < after_ms or (before_ms is not None and ts > before_ms):
        return None
    return obs


def clear() -> None:
    with _LOCK:
        _CACHE.clear()


def size() -> int:
    return len(_CACHE)
