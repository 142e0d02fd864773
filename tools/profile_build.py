#!/usr/bin/env python3
"""Per-constituent build profile for the melted suites (guide §1).

Runs ONE suite's constituent thunks SERIALLY (threads=1) against
$SPARK_GRAFT_SF_DIR, timing each thunk's eager build and counting the
Spark jobs it submitted (AppStatusStore job list) — the decomposition the
bench's suite `__build__` number hides. Usage:

    SPARK_GRAFT_SUITE_BUILD_THREADS=1 python tools/profile_build.py scalar
    python tools/profile_build.py text      # or: curation, pack
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SUITE_BUILD_THREADS", "1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "scalar"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from bench import build_spark, force

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def n_jobs() -> int:
        return spark._jsc.sc().statusStore().jobsList(None).size()

    import spookystuff_spark.queries as Q
    from spookystuff_spark.queries import load_all_query_modules

    load_all_query_modules()

    # monkeypatch build_concurrently to profile each maker serially
    rows: list[tuple[str, float, int]] = []

    real_build = Q.build_concurrently

    def profiled(makers, spark_=None, max_workers=None):
        out = []
        for i, m in enumerate(makers):
            j0, t0 = n_jobs(), time.monotonic()
            out.append(m())
            rows.append((f"maker[{i:02d}]", time.monotonic() - t0,
                         n_jobs() - j0))
        return out

    Q.build_concurrently = profiled
    # melt_suites / curation / retrieval_packing imported it by name
    import spookystuff_spark.queries.curation as qc
    import spookystuff_spark.queries.melt_suites as ms
    import spookystuff_spark.queries.retrieval_packing as rp

    for mod in (ms, qc, rp):
        if hasattr(mod, "build_concurrently"):
            mod.build_concurrently = profiled

    name = {
        "scalar": "q_scalar_suite",
        "text": "q_text_suite",
        "curation": "q_curation_suite",
        "pack": "q_pack_split_suite",
    }[which]
    fn = Q.QUERIES[name]

    # warmup at the smoke SF (JIT, Arrow init) — rows from it are discarded
    try:
        force(fn(spark, "/root/testdata/sf0.001"))
    except Exception as e:  # noqa: BLE001
        print("warmup error:", e, file=sys.stderr)
    rows.clear()

    t0, j0 = time.monotonic(), n_jobs()
    df = fn(spark, sf_dir)
    build_s, build_j = time.monotonic() - t0, n_jobs() - j0
    t1, j1 = time.monotonic(), n_jobs()
    force(df)
    force_s, force_j = time.monotonic() - t1, n_jobs() - j1

    print(f"\n=== {name} @ {sf_dir} (serial build) ===")
    print(f"{'constituent':<14} {'sec':>8} {'jobs':>5}")
    for label, sec, jobs in sorted(rows, key=lambda r: -r[1]):
        print(f"{label:<14} {sec:>8.2f} {jobs:>5}")
    print(f"{'BUILD total':<14} {build_s:>8.2f} {build_j:>5}")
    print(f"{'FORCE':<14} {force_s:>8.2f} {force_j:>5}")
    spark.stop()


if __name__ == "__main__":
    main()
