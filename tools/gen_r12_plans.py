#!/usr/bin/env python3
"""Dump `.explain("formatted")` for every query the r12 optimization round
touched into plans/r12/<query>_<tag>.txt (tag = before|after).

Usage: python tools/gen_r12_plans.py <tag> [repo_root] [only_query,...]

Run with repo_root = a git worktree of the pre-round commit for the
"before" set, and the live checkout for "after". Eager lakehouse queries
return a localCheckpointed result (their interesting work is in the build
jobs), so for the writer-level claims the script ALSO dumps supplemental
plans of the internal stages the round changed: the partitioned index
write (REBALANCE before partitionBy), the keyed bucket commit, and the
ANN fold's single-pass assignment.
"""

from __future__ import annotations

import os
import re
import sys

TOUCHED = [
    # suites (constituent builds now overlap via build_concurrently)
    "q_scalar_suite",
    "q_curation_suite",
    "q_text_suite",
    "q_pack_split_suite",
    # index/IVM queries whose build/fold/write path changed
    "q_lsh_index",
    "q_ann_index",
    "q_bm25_index",
    "q_decontam_index",
    "q_hll_view",
    "q_cms_view",
    "q_distinct_ivm",
    "q_ivm_refresh",
    "q_join_view",
    "q_join_agg",
    "q_join_distinct",
    "q_restore_ivm",
    "q_partitioned_merge",
    "q_stream_ingest",
    # batch-1 (fixed-cost fold work): the dup-span rebuild lost both
    # full-token exchanges — the one all-Catalyst plan diff of that batch
    "q_dupspan_removal",
]


def _clean(plan: str) -> str:
    plan = re.sub(r"file:[^,\]\s]*", "file:<tmp>", plan)
    return re.sub(r"#\d+L?", "", plan)


def main() -> None:
    tag = sys.argv[1]
    root = sys.argv[2] if len(sys.argv) > 2 else "/root/repo"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    out_dir = "/root/repo/plans/r12"
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

    # ---- supplemental: the internal stages the round's claims are about ---
    if only is not None:
        spark.stop()
        return
    import tempfile

    import pyspark.sql.functions as F

    from spookystuff_spark.tables import table

    try:
        # (a) the partitioned index write: the plan the bands/sigs/ANN
        # tables are written with — post-round it must show
        # RebalancePartitions above the write columns
        from spookystuff_spark.operators import lsh_index as L

        docs = table(spark, "/root/testdata/sf0.01", "documents").select(
            "doc_id", "text"
        )
        wide = L._signatures(docs, "doc_id", "text", 32, 8, 5, 7)
        band_rows, _sig_rows = L._split_tables(wide, 8)
        try:  # post-round writer exposes its staged frame
            from spookystuff_spark.sources.partitioned_table import (
                _staged_partitioned,
            )

            staged = _staged_partitioned(band_rows, "bucket")
        except ImportError:  # pre-round writer: __part copy, no rebalance
            staged = band_rows.withColumn(
                "__part", F.col("bucket").cast("string")
            )
        dump("internal_partitioned_write", staged)
    except Exception as ex:  # noqa: BLE001
        print(f"# internal_partitioned_write: {ex}")

    try:
        # (b) the ANN fold's assignment: post-round ONE MapInPandas pass
        # emits (id, cell, vec, _d2); pre-round the drift stats ran a
        # second full distance pipeline (dumped separately)
        import numpy as np

        from spookystuff_spark.operators import ann_index as A

        emb = spark.createDataFrame(
            [(i, [float(i % 7), float(i % 3)]) for i in range(100)],
            "vec_id long, embedding array<double>",
        )
        cents = np.array([[0.0, 0.0], [5.0, 1.0]])
        try:
            assigned = A._assign_cells(
                emb, "vec_id", "embedding", cents, with_d2=True
            )
        except TypeError:  # pre-round signature has no with_d2
            assigned = A._assign_cells(emb, "vec_id", "embedding", cents)
            dump(
                "internal_ann_drift_stats_extra_pass",
                emb.select("embedding"),
            )
        dump("internal_ann_fold_assign", assigned)
    except Exception as ex:  # noqa: BLE001
        print(f"# internal_ann_fold_assign: {ex}")

    try:
        # (c) the keyed bucket commit's write plan (IVM aggregates,
        # sketch views, join-view composites)
        from spookystuff_spark.sources.incremental import _bucket_expr

        agg = (
            table(spark, "/root/testdata/sf0.01", "documents")
            .groupBy("lang")
            .agg(F.sum("n_chars").alias("n_chars_sum"))
        )
        try:  # post-round writer exposes its staged frame
            from spookystuff_spark.sources.incremental import _staged_bucketed

            staged = _staged_bucketed(agg, ["lang"], 8)
        except ImportError:  # pre-round writer: bucket copy, no rebalance
            staged = agg.withColumn(
                "__part", _bucket_expr(["lang"], 8).cast("string")
            )
        dump("internal_keyed_commit_write", staged)
    except Exception as ex:  # noqa: BLE001
        print(f"# internal_keyed_commit_write: {ex}")

    spark.stop()


if __name__ == "__main__":
    main()
