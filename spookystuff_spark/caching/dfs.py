"""DFS doc cache (ref: caching/DFSDocCache.scala:13-46).

Layout: ``{root}/{key[:2]}/{key}/{ts_ms}.json.gz`` — one immutable file per
fetch, content inline (hex) up to the conf blob cap. Latest-file-in-time-range
wins (ref: AbstractDocCache.scala:64-96). All IO goes through fsio
(pyarrow.fs) — the same code path the reference takes via Hadoop
``FileSystem`` — so the cache root may live on local disk, HDFS, S3 or GCS.
Writes publish atomically (fsio.write_bytes: tmp+rename on local, atomic PUT
on object stores), so concurrent executors and Spark task retries are safe:
last writer wins, readers always see a complete file.
"""

from __future__ import annotations

import gzip
import json
from typing import Optional

from spookystuff_spark import fsio
from spookystuff_spark.doc.observation import Observation


def _dir_for(root: str, key: str) -> str:
    return fsio.join(root, key[:2], key)


def put(root: str, key: str, observations: list, ts_ms: int) -> None:
    d = _dir_for(root, key)
    fsio.mkdirs(d)
    payload = json.dumps(
        [_obs_to_json(o) for o in observations], separators=(",", ":")
    ).encode()
    fsio.write_bytes(fsio.join(d, f"{ts_ms}.json.gz"), gzip.compress(payload))


def get(
    root: str, key: str, after_ms: int = 0, before_ms: Optional[int] = None
) -> Optional[list]:
    d = _dir_for(root, key)
    best_ts = -1
    for name in fsio.ls(d):
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
        raw = gzip.decompress(fsio.read_bytes(fsio.join(d, f"{best_ts}.json.gz")))
        return [_obs_from_json(x) for x in json.loads(raw)]
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
