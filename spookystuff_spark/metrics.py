"""Fetch/cache metrics (ref: module/core/.../metrics/SpookyMetrics.scala:9-35).

Spark Python accumulators survive the Arrow boundary of pandas UDFs, so the
counters keep working inside ``applyInPandas`` fetch stages. Used by tests to
assert the reference's efficiency invariants (ITBaseSpec.scala:79-96):
zero redundant fetches, all-from-cache on warm runs.
"""

from __future__ import annotations

from pyspark import SparkContext


class SpookyMetrics:
    NAMES = (
        "pages_fetched",
        "pages_from_cache",
        "pages_from_remote",
        "fetch_errors",
        "sessions_initialized",
    )

    def __init__(self, sc: SparkContext):
        self._acc = {name: sc.accumulator(0) for name in self.NAMES}

    def inc(self, name: str, n: int = 1) -> None:
        self._acc[name].add(n)

    def value(self, name: str) -> int:
        return self._acc[name].value

    def snapshot(self) -> dict[str, int]:
        return {name: acc.value for name, acc in self._acc.items()}

    def __repr__(self) -> str:
        return f"SpookyMetrics({self.snapshot()})"
