"""Skew mitigation: salted join correctness + hot-key spread."""

from __future__ import annotations


def test_salted_join_equals_plain_join(spark):
    import pyspark.sql.functions as F

    from spookystuff_spark.operators.skew import salted_join

    # skewed fact: 90% of rows share key 0
    big = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("w")
    )
    plain = big.join(small, "k").select("k", "v", "w")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "w")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # salt actually spreads the hot key: phase-1 key cardinality check
    dist = (
        big.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(8)),
        )
        .filter("k = 0")
        .select("__salt")
        .distinct()
        .count()
    )
    assert dist == 8
