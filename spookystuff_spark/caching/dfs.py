"""DFS doc cache (ref: caching/DFSDocCache.scala:13-46).

Layout: ``{root}/{key[:2]}/{key}/{ts_ms}.json.gz`` — one immutable file per
fetch, content inline (hex) up to the conf blob cap. Latest-file-in-time-range
wins (ref: AbstractDocCache.scala:64-96). Writes are atomic (tmp + rename), so
concurrent executors and Spark task retries are safe: last writer wins, readers
always see a complete file. Works on any mounted DFS path (local fs now; the
same layout maps 1:1 onto object stores — scale path: a Delta/parquet doc table
bucketed by key).
"""

from __future__ import annotations

import gzip
import json
import os
import uuid
from typing import Optional

from spookystuff_spark.doc.observation import Observation


def _dir_for(root: str, key: str) -> str:
    return os.path.join(root, key[:2], key)


def put(root: str, key: str, observations: list, ts_ms: int) -> None:
    d = _dir_for(root, key)
    os.makedirs(d, exist_ok=True)
    payload = json.dumps(
        [_obs_to_json(o) for o in observations], separators=(",", ":")
    ).encode()
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with gzip.open(tmp, "wb") as f:
        f.write(payload)
    os.replace(tmp, os.path.join(d, f"{ts_ms}.json.gz"))


def get(
    root: str, key: str, after_ms: int = 0, before_ms: Optional[int] = None
) -> Optional[list]:
    d = _dir_for(root, key)
    if not os.path.isdir(d):
        return None
    best_ts = -1
    for name in os.listdir(d):
        if not name.endswith(".json.gz"):
            continue
        try:
            ts = int(name[: -len(".json.gz")])
        except ValueError:
            continue
        if ts >= after_ms and (before_ms is None or ts <= before_ms) and ts > best_ts:
            best_ts = ts
    if best_ts < 0:
        return None
    try:
        with gzip.open(os.path.join(d, f"{best_ts}.json.gz"), "rb") as f:
            return [_obs_from_json(x) for x in json.loads(f.read())]
    except (OSError, ValueError):
        return None


def _obs_to_json(o: Observation) -> dict:
    d = o.to_row()
    if d.get("content") is not None:
        d["content"] = d["content"].hex()
    d.pop("uid", None)
    return d


def _obs_from_json(d: dict) -> Observation:
    if d.get("content") is not None:
        d["content"] = bytes.fromhex(d["content"])
    return Observation.from_row(d)
