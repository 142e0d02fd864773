"""Driver-checked query inventory.

Each query registers (a) a Spark DataFrame implementation and (b) an equivalent
ANSI-SQL oracle string DuckDB runs on the same parquet tables. Column aliases
MUST match between the two — the driver sorts columns by name and value-hashes.

Determinism rules applied throughout:
  * every floating aggregate is ``round(..., k)`` on BOTH sides;
  * every top-k / limit has a total ordering (unique-key tiebreak);
  * integer-ish outputs are cast to the same width on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Queries whose oracle is a golden parquet precomputed by an INDEPENDENT
# numpy/pure-python implementation (tools/gen_goldens.py) at the driver's
# gate SF. These are deterministic seed-fixed operators whose signature math
# isn't SQL-expressible; the golden pins the exact expected output.
GOLDEN_SF = "sf0.01"  # the SF the driver's correctness gate runs at
GOLDEN_QUERIES: set[str] = set()


def golden_oracle(name: str) -> str:
    GOLDEN_QUERIES.add(name)
    return (
        "SELECT * FROM read_parquet("
        f"'/root/repo/fixtures/golden/{GOLDEN_SF}/{name}.parquet')"
    )


def query(name: str, oracle: Optional[str] = None):
    """Register a query; ``oracle=None`` marks a non-SQL-expressible operator
    (driver falls back to a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Individually-benchmarked queries whose correctness gate is a melted suite
# query (the driver's correctness gate caps the per-round query list; the
# suites pin every value of these while keeping per-query bench timings).
EXTRA_BENCH: dict[str, QueryFn] = {}


def bench_only(name: str):
    def deco(fn: QueryFn) -> QueryFn:
        EXTRA_BENCH[name] = fn
        return fn

    return deco


# Suite query → {constituent alias (the melt rows' ``q`` column) →
# individually-benched query name timing it, or None}. Published in
# bench.py's JSON so a suite timing that grew because a constituent was
# ADDED is distinguishable from a regression at a glance (r4 lesson:
# q_scalar_suite 0.44s→13.4s was pure inventory growth). Declared
# statically from each suite's definition — a constituent empty at some SF
# still belongs to the suite; tests assert observed ⊆ declared.
SUITE_CONSTITUENTS: dict[str, dict[str, str | None]] = {}


def register_suite(
    name: str, constituents: list[str] | dict[str, str | None]
) -> None:
    """``constituents``: list when alias == benched query name, else a
    dict alias → benched name (None for melt-only constituents)."""
    if isinstance(constituents, dict):
        SUITE_CONSTITUENTS[name] = dict(sorted(constituents.items()))
    else:
        SUITE_CONSTITUENTS[name] = {c: c for c in sorted(constituents)}


def build_concurrently(
    makers, spark: SparkSession | None = None, max_workers: int | None = None
) -> list:
    """Overlap INDEPENDENT suite-constituent builds (optimization guide
    §2.6: actions are only sequential because driver code calls them
    sequentially). Several melted-suite constituents construct eagerly —
    index builds, IVM fold schedules, localCheckpointed results — through
    many small Spark jobs interleaved with driver-side commit-protocol
    work, leaving most executor cores idle; submitting the builders from
    a small thread pool back-fills those cores with the next
    constituent's jobs. Results return in SUBMISSION order, so the
    suite's union shape (and therefore its rows) is exactly the serial
    build's. Constituents are independent by construction (each owns its
    temp dirs; base scans are shared read-only via ``shared_scans``).

    ``spark`` (when given) is re-activated on each worker thread: the
    JVM active session is a thread-local, and a fresh py4j thread has
    none — Python-DataSource writes then fail DATA_SOURCE_NOT_FOUND
    because the JVM-side lookup resolves the registry through the active
    session (reads resolve through the DataFrame's own session and never
    hit this).

    ``SPARK_GRAFT_SUITE_BUILD_THREADS=1`` restores the serial build;
    the default is deliberately modest — enough in-flight jobs to fill
    scheduler gaps without thrashing a low-core run (the driver also
    benches at reduced core counts)."""
    import os
    from concurrent.futures import ThreadPoolExecutor

    if max_workers is None:
        max_workers = int(
            os.environ.get("SPARK_GRAFT_SUITE_BUILD_THREADS", "16")
        )
    makers = list(makers)
    if max_workers <= 1 or len(makers) <= 1:
        return [m() for m in makers]

    def run(m):
        if spark is not None:
            try:
                spark._jvm.org.apache.spark.sql.SparkSession.setActiveSession(
                    spark._jsparkSession
                )
            except Exception:  # noqa: BLE001 — best-effort thread setup
                pass
        return m()

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return [f.result() for f in [pool.submit(run, m) for m in makers]]


def load_all_query_modules() -> None:
    # import for side effect: each module registers its queries
    from spookystuff_spark.queries import (  # noqa: F401
        corpus_ops,
        curation,
        dedup_more,
        engine,
        events,
        graph_ops,
        hygiene,
        lakehouse_q,
        llm_ops,
        media,
        melt_suites,
        model_ops,
        pipeline_demo,
        relational,
        relational2,
        relational3,
        retrieval_packing,
        scalar_funcs,
        sessions,
        setops_suite,
        similarity,
        sketches,
        text,
        tpch_more,
        tpch_more2,
        tpch_rest,
        tpch_suites,
    )
