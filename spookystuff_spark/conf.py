"""Engine configuration (ref: module/core/.../conf/SpookyConf.scala:38-100).

Defaults mirror the reference where it publishes one (cache TTL 7 days,
remote timeout 60 s, explore epoch/checkpoint interval 50, MEMORY_AND_DISK
persistence); everything else is Spark-first.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
from typing import Optional


@dataclasses.dataclass
class SpookyConf:
    # --- doc cache (ref: SpookyConf.scala:44-46, caching/AbstractDocCache.scala:64-96)
    cache_read: bool = True
    cache_write: bool = True
    cached_docs_lifespan: dt.timedelta = dt.timedelta(days=7)
    ignore_cached_docs_before: Optional[dt.datetime] = None
    dfs_cache_root: Optional[str] = None  # None → in-memory only
    # per-URI-scheme cache levels (ref: caching/DocCacheLevel.scala:8-33):
    # scheme → "none" | "memory" | "dfs" | "all"; "*" is the default for
    # unlisted schemes. None → "all" for everything (diverges from the
    # reference's InMemory default for non-http schemes on purpose: Python
    # workers are ephemeral processes, so a memory-only cache barely survives
    # a distributed fetch — DFS write-through is the scale-correct default).
    cache_levels: Optional[dict] = None
    # auto error-dump dir (ref: Action.scala:109-129, SpookyConf auditing):
    # failed traces write their error evidence here as they happen
    error_dump_root: Optional[str] = None

    # --- agent execution (ref: SpookyConf.scala:52-53)
    remote_timeout_sec: float = 60.0
    dfs_timeout_sec: float = 40.0
    fetch_retries: int = 3
    retry_delay_sec: float = 1.0
    # per-host politeness: minimum seconds between remote hits to one host
    # (worker-local throttle; combine with Delay actions for global pacing)
    politeness_delay_sec: float = 0.0
    # concurrent trace executions per partition (narrow/passthrough fetch
    # localities): remote fetches are IO-bound, so a bounded thread pool
    # multiplies per-task throughput without more executors. 1 = sequential
    # (default; keep 1 for traces that borrow pooled web drivers unless the
    # driver pool is sized to match). Capped at 8 by the per-worker helper
    # pool that enforces action timeouts.
    fetch_concurrency: int = 1

    # --- fetch locality (ref: SpookyConf.scala:56; dsl/DataLocality.scala)
    # "wide" = full shuffle dedup (groupBy trace_key); "narrow" = per-partition
    # dedup only (map-side, no exchange); "passthrough" = no dedup.
    default_locality: str = "wide"

    # --- explore (ref: SpookyConf.scala:63-68)
    explore_epoch_interval: int = 50
    explore_checkpoint_interval: int = 50
    explore_max_depth: int = 20

    # --- preview mode (ref: SpookyConf.scala:91-100)
    preview_mode: bool = False

    # --- credential store: consumer_key → {"consumer_secret","token_secret"}.
    # Ships to workers only inside the pickled task closure — never in trace
    # JSON, DataFrame columns, checkpoints or error dumps (those are redacted).
    credentials: Optional[dict] = None

    # --- webdriver (ref: conf/DriverFactory.scala:31-158)
    # factory: () -> driver; None → selenium Firefox. Injectable so tests
    # (and non-selenium backends) can exercise the full execution path.
    webdriver_factory: Optional[object] = None
    # "task_local": one pooled driver per Python worker, factory-reset
    # between traces; "transient": create per trace, quit after.
    webdriver_pool: str = "task_local"

    # --- blob handling: inline in the obs column up to this size, else offload
    # to DFS and store only the path (keeps shuffle rows small at 100 TB).
    inline_blob_max_bytes: int = 1 << 20

    def copy(self, **overrides) -> "SpookyConf":
        return dataclasses.replace(self, **overrides)
