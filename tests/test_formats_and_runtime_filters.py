"""Multi-format IO round-trips + runtime Bloom-filter join injection."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.sources.formats import convert, read_format, write_format
from spookystuff_spark.sources.partitioned import prune_report


def _sample(spark):
    return spark.range(0, 500).select(
        F.col("id").alias("k"),
        F.md5(F.col("id").cast("string")).alias("v"),
        (F.col("id") % 3).alias("g"),
    )


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_format_round_trip(spark, tmp_path, fmt):
    df = _sample(spark)
    path = str(tmp_path / fmt)
    write_format(df, path, fmt)
    schema = "k bigint, v string, g bigint" if fmt in ("csv", "json") else None
    back = read_format(spark, path, fmt, schema)
    if "_corrupt_record" in back.columns:
        back = back.drop("_corrupt_record")
    got = {(r["k"], r["v"], r["g"]) for r in back.collect()}
    want = {(r["k"], r["v"], r["g"]) for r in df.collect()}
    assert got == want


def test_orc_pushdown_reaches_scan(spark, tmp_path):
    """ORC is a first-class skipping format: filters and projections must
    reach the scan, same as parquet."""
    path = str(tmp_path / "orc")
    write_format(_sample(spark), path, "orc")
    df = read_format(spark, path, "orc").where("k > 400").select("v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(k,400)" in plan
    assert df.count() == 99


def test_csv_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("k,v,g\n1,a,0\nnot-a-number,b,1\n3,c,2\n")
    df = read_format(spark, str(p), "csv", "k bigint, v string, g bigint")
    df = df.cache()  # Spark requires materialization to filter _corrupt_record
    try:
        good = df.where(F.col("_corrupt_record").isNull())
        bad = df.where(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
    finally:
        df.unpersist()


def test_convert_csv_to_partitioned_parquet(spark, tmp_path):
    src = tmp_path / "in.csv"
    src.write_text("k,v,g\n1,a,0\n2,b,1\nbroken,x,9\n3,c,0\n")
    n = convert(
        spark,
        str(src),
        "csv",
        str(tmp_path / "out"),
        "parquet",
        schema="k bigint, v string, g bigint",
        partition_cols=["g"],
    )
    assert n == 3  # corrupt row dropped
    back = spark.read.parquet(str(tmp_path / "out"))
    assert {r["g"] for r in back.select("g").distinct().collect()} == {0, 1}


def test_runtime_bloom_filter_injected(spark, tmp_path):
    """Spark's runtime Bloom-filter join reduction: a selective filter on the
    dim side injects might_contain onto the fact scan, skipping fact rows
    before the join shuffle. Size thresholds are production-scale; lower
    them to demonstrate the plan shape the 100 TB run would get."""
    fact_p, dim_p = str(tmp_path / "fact"), str(tmp_path / "dim")
    spark.range(0, 50_000).select(
        F.col("id").alias("fk"), (F.col("id") % 97).alias("x")
    ).write.parquet(fact_p)
    spark.range(0, 1000).select(
        F.col("id").alias("pk"), (F.col("id") % 10).alias("cat")
    ).write.parquet(dim_p)

    old = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "1GB",
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffled join: broadcast joins don't need a runtime filter
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        fact = spark.read.parquet(fact_p)
        dim = spark.read.parquet(dim_p).where("cat = 3")
        joined = fact.join(dim, fact["fk"] == dim["pk"])
        optimized = str(
            joined._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "might_contain" in optimized or "bloom_filter_agg" in optimized
        assert joined.count() == 100
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
