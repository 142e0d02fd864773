#!/usr/bin/env python3
"""Dump `.explain("formatted")` for every query the r13 optimization round
touched into plans/r13/<query>_<tag>.txt (tag = before|after).

Usage: python tools/gen_r13_plans.py <tag> [repo_root] [only_query,...]

Run with repo_root = a git worktree of the pre-round commit (87a88eb) for
the "before" set, and the live checkout for "after". The r13 changes are
mostly FIXED-JOB-COUNT cuts invisible in a final explain (schema-pinned
reads, fused probe collects, batched bloom probes), so alongside the
required query dumps this script writes supplemental evidence:

  * internal_bloom_probe_{tag}.txt — the per-key probe scan frame
    (post-round: produced by the BATCHED read_table_points; pre-round by
    read_table_point) — identical scan shape proves result-equivalence,
    while the job-count evidence lives in plans/r13/jobcounts_*.txt
    (tools/profile_one.py output on both trees).
"""

from __future__ import annotations

import os
import re
import sys

TOUCHED = [
    # lakehouse chains whose per-refresh job count changed (schema-pinned
    # feed/dv reads, fused retraction probe, single-job dv carry)
    "q_ivm_refresh",
    "q_distinct_ivm",
    "q_restore_ivm",
    "q_partitioned_merge",
    "q_dv_delete",
    "q_cdc_upsert",
    "q_scd2_dim",
    "q_join_view",
    "q_join_agg",
    "q_join_distinct",
    "q_hll_view",
    "q_cms_view",
    # batched bloom probe
    "q_bloom_lookup",
    # one watermark fold after the stream drains
    "q_stream_ingest",
    # suites carrying the above as constituents
    "q_scalar_suite",
]


def _clean(plan: str) -> str:
    plan = re.sub(r"file:[^,\]\s]*", "file:<tmp>", plan)
    return re.sub(r"#\d+L?", "", plan)


def main() -> None:
    tag = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    out_dir = "/root/repo/plans/r13"
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, root)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spookystuff_spark.queries import (
        EXTRA_BENCH,
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    ALL = {**QUERIES, **EXTRA_BENCH}
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )

    def dump(name: str, df) -> None:
        plan = _clean(df._jdf.queryExecution().explainString(mode))
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan.strip() + "\n")
        print(f"wrote {name}_{tag}.txt")

    for name in TOUCHED:
        if only is not None and name not in only:
            continue
        try:
            dump(name, ALL[name](spark, "/root/testdata/sf0.01"))
        except Exception as ex:  # noqa: BLE001 — dump what we can
            print(f"# {name}: {type(ex).__name__}: {ex}")

    if only is not None:
        spark.stop()
        return

    # ---- supplemental: the bloom probe scan (batched vs per-key) --------
    import tempfile

    try:
        from spookystuff_spark.sources.bloom_index import attach_blooms
        from spookystuff_spark.sources.upsert import write_table
        from spookystuff_spark.tables import table

        docs = table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", "lang", "n_chars"
        )
        tdir = tempfile.mkdtemp(prefix="r13plan-bloom-")
        write_table(docs.repartition(4), tdir, change_feed=False)
        attach_blooms(spark, tdir, ["doc_id"])
        try:  # post-round batched probe
            from spookystuff_spark.sources.bloom_index import (
                read_table_points,
            )

            frames = read_table_points(spark, tdir, "doc_id", [3, 47])
            dump("internal_bloom_probe", frames[0][0])
        except ImportError:  # pre-round per-key probe
            from spookystuff_spark.sources.bloom_index import (
                read_table_point,
            )

            dump(
                "internal_bloom_probe",
                read_table_point(spark, tdir, "doc_id", 3)[0],
            )
    except Exception as ex:  # noqa: BLE001
        print(f"# internal_bloom_probe: {ex}")

    spark.stop()


if __name__ == "__main__":
    main()
