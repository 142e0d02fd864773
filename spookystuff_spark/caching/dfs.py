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


def vacuum_cache(
    spark,
    root: str,
    older_than_ms: int,
    keep_latest_per_key: bool = True,
) -> dict:
    """Distributed TTL garbage collection of the DFS doc cache: delete every
    cache generation older than ``older_than_ms``, optionally always
    keeping each key's newest generation (so a warm key never goes fully
    cold even past TTL — reads already ignore expired entries, this
    reclaims the bytes). One task per shard (256 two-hex prefixes), each
    listing and deleting through fsio from the executor — the driver never
    walks the tree, which is what makes this viable on a cache with
    millions of keys. Wayback note: time-travel reads only reach
    generations that still exist — size retention against wayback depth
    like any lakehouse vacuum. Returns {n_deleted, n_kept, n_keys}."""
    from pyspark.sql.types import LongType, StructField, StructType

    shards = [s for s in fsio.ls(root) if fsio.is_dir(fsio.join(root, s))]
    if not shards:
        return {"n_deleted": 0, "n_kept": 0, "n_keys": 0}
    schema = StructType(
        [
            StructField("n_deleted", LongType()),
            StructField("n_kept", LongType()),
            StructField("n_keys", LongType()),
        ]
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            deleted = kept = keys = 0
            for shard in pdf["shard"]:
                shard_dir = fsio.join(root, shard)
                for key in fsio.ls(shard_dir):
                    key_dir = fsio.join(shard_dir, key)
                    gens = []
                    for name in fsio.ls(key_dir):
                        if not name.endswith(".json.gz"):
                            continue
                        try:
                            gens.append((int(name.split(".")[0]), name))
                        except ValueError:
                            continue
                    if not gens:
                        continue
                    keys += 1
                    gens.sort()
                    newest = gens[-1][0]
                    for ts, name in gens:
                        if ts >= older_than_ms or (
                            keep_latest_per_key and ts == newest
                        ):
                            kept += 1
                        else:
                            fsio.delete_file(fsio.join(key_dir, name))
                            deleted += 1
            yield pd.DataFrame(
                [{"n_deleted": deleted, "n_kept": kept, "n_keys": keys}]
            )

    df = spark.createDataFrame([(s,) for s in shards], "shard string")
    parts = min(len(shards), 64)
    rows = df.repartition(parts).mapInPandas(run, schema).collect()
    return {
        "n_deleted": sum(r["n_deleted"] for r in rows),
        "n_kept": sum(r["n_kept"] for r in rows),
        "n_keys": sum(r["n_keys"] for r in rows),
    }
