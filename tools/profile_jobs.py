#!/usr/bin/env python3
"""List every Spark job (name + duration) submitted inside each phase of the
q_ivm_refresh chain — pinpoints the hidden fixed jobs per commit/refresh."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bench import build_spark

    spark = build_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    from spookystuff_spark.tables import table

    store = spark._jsc.sc().statusStore()

    def jobs():
        out = []
        it = store.jobsList(None).iterator()
        while it.hasNext():
            j = it.next()
            dur = None
            try:
                if j.completionTime().isDefined() and j.submissionTime().isDefined():
                    dur = (j.completionTime().get().getTime()
                           - j.submissionTime().get().getTime()) / 1000.0
            except Exception:
                pass
            out.append((j.jobId(), j.name()[:100], dur))
        return sorted(out)

    def phase(label, fn):
        before = {j[0] for j in jobs()}
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        print(f"\n--- {label}: {dt:.2f}s ---")
        for jid, name, dur in jobs():
            if jid not in before:
                print(f"  job {jid}: {dur if dur is not None else '?'}s  {name}")

    from spookystuff_spark.sources.incremental import refresh_aggregate
    from spookystuff_spark.sources.upsert import (
        delete_where, read_table, upsert, write_table,
    )

    base = table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    updates = base.where(F.col("doc_id") % 7 == 0).withColumn(
        "n_chars", F.col("n_chars") + 1)
    inserts = base.where(F.col("doc_id") % 97 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000)
    src = tempfile.mkdtemp(prefix="pj-src-")
    dst = tempfile.mkdtemp(prefix="pj-dst-")
    phase("write_table", lambda: write_table(base, src))
    phase("refresh1(seed)", lambda: refresh_aggregate(
        spark, src, dst, ["lang"], ["n_chars"], dst_buckets=8,
        sumsq_cols=["n_chars"]))
    phase("upsert(pre)", lambda: upsert(
        spark, src, updates.unionByName(inserts), ["doc_id"],
        feed_preimages=True))
    phase("refresh2", lambda: refresh_aggregate(
        spark, src, dst, ["lang"], ["n_chars"], sumsq_cols=["n_chars"]))
    phase("delete_where", lambda: delete_where(
        spark, src, F.col("lang") == "de"))
    phase("refresh3", lambda: refresh_aggregate(
        spark, src, dst, ["lang"], ["n_chars"], sumsq_cols=["n_chars"]))
    phase("read+ckpt", lambda: read_table(spark, dst).localCheckpoint(
        eager=True))
    spark.stop()


if __name__ == "__main__":
    main()
