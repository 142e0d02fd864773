#!/usr/bin/env python3
"""Phase-level profile of one lakehouse constituent (guide §1): wraps each
driver-side call in (time, #jobs, #stages) deltas so the per-refresh fixed
cost is visible. Usage: python tools/profile_one.py ivm|restore|pmerge|bloom|distinct|joinagg
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "ivm"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from bench import build_spark

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    from spookystuff_spark.tables import table

    def n_jobs() -> int:
        return spark._jsc.sc().statusStore().jobsList(None).size()

    rows = []

    def phase(label, fn):
        j0, t0 = n_jobs(), time.monotonic()
        out = fn()
        rows.append((label, time.monotonic() - t0, n_jobs() - j0))
        return out

    def report(tag):
        print(f"\n=== {tag} @ {sf_dir} ===")
        print(f"{'phase':<28} {'sec':>7} {'jobs':>5}")
        for label, sec, jobs in rows:
            print(f"{label:<28} {sec:>7.2f} {jobs:>5}")
        print(f"{'TOTAL':<28} {sum(r[1] for r in rows):>7.2f} "
              f"{sum(r[2] for r in rows):>5}")
        rows.clear()

    def run_ivm():
        from spookystuff_spark.sources.incremental import refresh_aggregate
        from spookystuff_spark.sources.upsert import (
            delete_where, read_table, upsert, write_table,
        )

        base = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        updates = base.where(F.col("doc_id") % 7 == 0).withColumn(
            "n_chars", F.col("n_chars") + 1)
        inserts = base.where(F.col("doc_id") % 97 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000)
        src = tempfile.mkdtemp(prefix="prof-ivm-src-")
        dst = tempfile.mkdtemp(prefix="prof-ivm-dst-")
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
        report("q_ivm_refresh chain")

    def run_restore():
        from spookystuff_spark.sources.incremental import refresh_aggregate
        from spookystuff_spark.sources.upsert import (
            committed_versions, delete_where, read_table, restore, upsert,
            write_table,
        )

        base = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        updates = base.where(F.col("doc_id") % 11 == 0).withColumn(
            "n_chars", F.col("n_chars") * 2 + 1)
        src = tempfile.mkdtemp(prefix="prof-rst-src-")
        dst = tempfile.mkdtemp(prefix="prof-rst-dst-")
        phase("write_table", lambda: write_table(base, src))
        v_seed = committed_versions(src)[-1]
        phase("refresh1(seed)", lambda: refresh_aggregate(
            spark, src, dst, ["lang"], ["n_chars"], dst_buckets=8))
        phase("upsert(pre)", lambda: upsert(
            spark, src, updates, ["doc_id"], feed_preimages=True))
        phase("delete_where", lambda: delete_where(
            spark, src, F.col("lang") == "fr"))
        phase("refresh2", lambda: refresh_aggregate(
            spark, src, dst, ["lang"], ["n_chars"]))
        phase("restore", lambda: restore(
            src, v_seed, spark=spark, key_cols=["doc_id"]))
        phase("refresh3", lambda: refresh_aggregate(
            spark, src, dst, ["lang"], ["n_chars"]))
        phase("read+ckpt", lambda: read_table(spark, dst).localCheckpoint(
            eager=True))
        report("q_restore_ivm chain")

    def run_distinct():
        from spookystuff_spark.sources.incremental import (
            read_distinct_aggregate, read_percentiles, read_topk_values,
            refresh_distinct,
        )
        from spookystuff_spark.sources.upsert import (
            delete_where, upsert, write_table,
        )

        base = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        updates = base.where(F.col("doc_id") % 7 == 0).withColumn(
            "n_chars", F.col("n_chars") + 1)
        inserts = base.where(F.col("doc_id") % 97 == 0).withColumn(
            "doc_id", F.col("doc_id") + 1_000_000)
        src = tempfile.mkdtemp(prefix="prof-ddst-src-")
        dst = tempfile.mkdtemp(prefix="prof-ddst-dst-")
        phase("write_table", lambda: write_table(base, src))
        phase("refresh1(seed)", lambda: refresh_distinct(
            spark, src, dst, ["lang"], "n_chars", dst_buckets=8))
        phase("upsert(pre)", lambda: upsert(
            spark, src, updates.unionByName(inserts), ["doc_id"],
            feed_preimages=True))
        phase("refresh2", lambda: refresh_distinct(
            spark, src, dst, ["lang"], "n_chars"))
        phase("delete_where", lambda: delete_where(
            spark, src, F.col("lang") == "de"))
        phase("refresh3", lambda: refresh_distinct(
            spark, src, dst, ["lang"], "n_chars"))
        agg = phase("read_distinct", lambda: read_distinct_aggregate(
            spark, dst, ["lang"], "n_chars"))
        topk = phase("read_topk", lambda: read_topk_values(
            spark, dst, ["lang"], "n_chars", k=3))
        pctl = phase("read_pctl", lambda: read_percentiles(
            spark, dst, ["lang"], "n_chars", ps=(0.25, 0.5, 0.9)))
        from spookystuff_spark.queries.tpch_suites import _melt
        out = (
            _melt(agg, "q_distinct_ivm", ["lang"],
                  ["n_chars_distinct", "n_rows"])
            .unionByName(_melt(topk, "q_topk_values", ["lang", "rank"],
                               ["n_chars", "_n"]))
            .unionByName(_melt(pctl, "q_pctl_values", ["lang", "p"],
                               ["value"]))
        )
        phase("melt+ckpt", lambda: out.localCheckpoint(eager=True))
        report("q_distinct_ivm chain")

    def run_pmerge():
        from spookystuff_spark.sources.partitioned_table import (
            read_table_partitions, upsert_partitioned,
            write_table_partitioned,
        )
        from spookystuff_spark.sources.upsert import delete_where_dv, read_table

        base = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        updates = base.where(F.col("doc_id") % 5 == 0).withColumn(
            "n_chars", F.col("n_chars") * 10)
        inserts = (
            base.where(F.col("doc_id") % 83 == 0)
            .withColumn("doc_id", F.col("doc_id") + 2_000_000)
            .withColumn("lang", F.lit("xx"))
        )
        tdir = tempfile.mkdtemp(prefix="prof-pmerge-")
        phase("write_partitioned", lambda: write_table_partitioned(
            base, tdir, "lang"))
        phase("delete_dv", lambda: delete_where_dv(
            spark, tdir, F.col("doc_id") % 11 == 0, ["doc_id"],
            change_feed=False))
        phase("upsert_partitioned", lambda: upsert_partitioned(
            spark, tdir, updates.unionByName(inserts), ["doc_id"], "lang"))
        phase("read native", lambda: read_table(spark, tdir).groupBy(
            "lang").count().localCheckpoint(eager=True))
        langs = [r[0] for r in phase(
            "langs collect",
            lambda: base.select("lang").distinct().collect())]
        phase("read partitions", lambda: read_table_partitions(
            spark, tdir, [*langs, "xx"]).groupBy("lang").count()
            .localCheckpoint(eager=True))
        report("q_partitioned_merge chain")

    def run_bloom():
        from functools import reduce

        from pyspark.sql import DataFrame

        from spookystuff_spark.sources.bloom_index import (
            attach_blooms, read_table_point,
        )
        from spookystuff_spark.sources.upsert import write_table

        base = table(spark, sf_dir, "documents").select(
            "doc_id", "lang", "n_chars")
        tdir = tempfile.mkdtemp(prefix="prof-bloom-")
        phase("write_table(rep8)", lambda: write_table(
            base.repartition(8), tdir, change_feed=False))
        phase("attach_blooms", lambda: attach_blooms(spark, tdir, ["doc_id"]))
        for k in [3, 47, 111, 250, 444]:
            phase(f"point {k}", lambda k=k: read_table_point(
                spark, tdir, "doc_id", k)[0].select(
                    "doc_id", "lang", "n_chars"))
        parts = [read_table_point(spark, tdir, "doc_id", k)[0].select(
            "doc_id", "lang", "n_chars") for k in [3, 47, 111, 250, 444]]
        phase("union+ckpt", lambda: reduce(
            DataFrame.unionByName, parts).localCheckpoint(eager=True))
        report("q_bloom_lookup chain")

    def run_joinagg():
        from spookystuff_spark.sources.join_view import refresh_join_aggregate
        from spookystuff_spark.sources.upsert import (
            append_rows, delete_where_dv, write_table,
        )

        cust = table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_mktsegment").alias("seg"))
        orders = table(spark, sf_dir, "orders").select(
            F.col("o_custkey").alias("custkey"), "o_orderkey",
            F.col("o_totalprice").alias("price"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
                "price_c"))
        base = tempfile.mkdtemp(prefix="prof-jva-")
        a_dir, b_dir, dst = (os.path.join(base, n) for n in ("a", "b", "g"))

        def refresh():
            refresh_join_aggregate(
                spark, a_dir, b_dir, dst, ["custkey"], ["seg"],
                ["price", "price_c"], min_cols=["price"],
                max_cols=["price"], dst_buckets=8, sumsq_cols=["price_c"])

        phase("write a", lambda: write_table(
            cust.where(F.col("custkey") % 2 == 0), a_dir))
        phase("write b", lambda: write_table(
            orders.where(F.col("o_orderkey") % 3 == 0), b_dir))
        phase("refresh1(seed)", refresh)
        phase("append a", lambda: append_rows(
            spark, a_dir, cust.where(F.col("custkey") % 2 == 1)))
        phase("refresh2", refresh)
        phase("append b", lambda: append_rows(
            spark, b_dir, orders.where(F.col("o_orderkey") % 3 == 1)))
        phase("refresh3", refresh)
        phase("append a2+b2", lambda: (
            append_rows(spark, a_dir, cust.select(
                (-(F.col("custkey") + F.lit(1))).alias("custkey"),
                F.concat(F.lit("X-"), F.col("seg")).alias("seg"))),
            append_rows(spark, b_dir,
                        orders.where(F.col("o_orderkey") % 3 == 2))))
        phase("refresh4", refresh)
        phase("delete_dv a", lambda: delete_where_dv(
            spark, a_dir, "custkey >= 0 AND custkey % 10 = 3", ["custkey"]))
        phase("refresh5", refresh)
        report("q_join_agg chain")

    {"ivm": run_ivm, "restore": run_restore, "pmerge": run_pmerge,
     "bloom": run_bloom, "distinct": run_distinct,
     "joinagg": run_joinagg}[which]()
    spark.stop()


if __name__ == "__main__":
    main()
