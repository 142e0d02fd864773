"""Sketch operators (operators/sketch.py): accuracy vs exact answers,
one-sided CMS error, partition-layout invariance, and all-Catalyst plans."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from spookystuff_spark.operators.sketch import (
    cms_query,
    cms_sketch,
    hll_estimate,
    kmv_estimate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def tokens(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return docs.select(
        "lang",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"(\S+)"), 1)
        ).alias("tok"),
    )


def test_hll_within_error_bound(spark, events):
    est = {
        r["event_type"]: r["est_distinct"]
        for r in hll_estimate(events, ["event_type"], "user_id", p=12).collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, d in exact.items():
        # linear-counting regime at these cardinalities: well under 5% error
        assert abs(est[k] - d) / d < 0.05, (k, est[k], d)


def test_hll_partition_invariant(spark, events):
    a = hll_estimate(events, ["event_type"], "user_id").collect()
    b = hll_estimate(events.repartition(7), ["event_type"], "user_id").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cms_overestimates_only_and_is_tight(spark, tokens):
    terms = ["the", "spark", "table", "zebra"]
    sk = cms_sketch(tokens, "tok", depth=4, width=1024)
    est = {r["term"]: r["est"] for r in cms_query(spark, sk, terms).collect()}
    exact = {
        r["tok"]: r["n"]
        for r in tokens.filter(F.col("tok").isin(terms))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = tokens.count()
    for t in terms:
        true_n = exact.get(t, 0)
        assert est[t] >= true_n, (t, est[t], true_n)  # one-sided guarantee
        # e = exp(1)/width -> eN additive bound, with huge slack at this SF
        assert est[t] - true_n <= max(64, 0.01 * total), (t, est[t], true_n)
    assert est["zebra"] <= max(64, 0.01 * total)  # absent term: collisions only


def test_kmv_reasonable_and_exact_below_k(spark, tokens):
    # per-lang distinct vocab is ~30 at this SF; k=64 > distinct -> exact
    exact = {
        r["lang"]: r["d"]
        for r in tokens.groupBy("lang")
        .agg(F.countDistinct("tok").alias("d"))
        .collect()
    }
    got = {
        r["lang"]: r["est_distinct"]
        for r in kmv_estimate(tokens, ["lang"], "tok", k=64).collect()
    }
    assert got == {k: float(v) for k, v in exact.items()}
    # engaged estimator (k=8 < distinct): order-of-magnitude correctness
    approx = {
        r["lang"]: r["est_distinct"]
        for r in kmv_estimate(tokens, ["lang"], "tok", k=8).collect()
    }
    for k, d in exact.items():
        assert 0.3 * d < approx[k] < 3.0 * d, (k, approx[k], d)


def test_sketch_plans_are_native(spark, events, tokens):
    # zero Python stages: md5/conv/bin arithmetic stays in codegen
    for df in [
        hll_estimate(events, ["event_type"], "user_id"),
        cms_sketch(tokens, "tok"),
        kmv_estimate(tokens, ["lang"], "tok"),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
            assert marker not in plan, marker


def test_hll_register_bound(spark, events):
    from spookystuff_spark.operators.sketch import hll_registers

    regs = hll_registers(events, ["event_type"], "user_id", p=6)
    per_group = regs.groupBy("event_type").count().collect()
    assert all(r["count"] <= 64 for r in per_group)  # m = 2^p registers max
    with pytest.raises(ValueError):
        hll_registers(events, ["event_type"], "user_id", p=20)


def _sq(spark, df):
    from spookystuff_spark.operators.sketch import sample_quantiles

    id_expr = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    return sample_quantiles(
        df.withColumnRenamed("l_returnflag", "grp"),
        ["grp"],
        "l_extendedprice",
        id_expr,
        (0.25, 0.5, 0.75),
        cap=500,
    )


def test_sample_quantiles_close_to_exact(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = {(r["grp"], r["q"]): r["value"] for r in _sq(spark, li).collect()}
    exact = {
        (r["l_returnflag"], q): r[f"p{int(q*100)}"]
        for r in li.groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_extendedprice, {q})").alias(f"p{int(q*100)}")
                for q in (0.25, 0.5, 0.75)
            ]
        )
        .collect()
        for q in (0.25, 0.5, 0.75)
    }
    assert set(got) == set(exact)
    lo = min(v for v in exact.values())
    hi = max(v for v in exact.values())
    spread = hi - lo or 1.0
    for k, v in got.items():
        # sample of ~500: quantile deviation well within 10% of the spread
        assert abs(v - exact[k]) < 0.10 * (spread + abs(exact[k])), (k, v, exact[k])


def test_sample_quantiles_layout_invariant(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    a = sorted(map(tuple, _sq(spark, li).collect()))
    b = sorted(map(tuple, _sq(spark, li.repartition(13)).collect()))
    assert a == b


def test_sample_quantiles_plan_native_and_broadcast(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plan = _sq(spark, li)._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert marker not in plan, marker
    assert "BroadcastHashJoin" in plan  # counts + targets both broadcast


def test_weighted_sample_properties(spark):
    from spookystuff_spark.operators.sampling import weighted_sample_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = weighted_sample_topk(docs, ["lang"], "doc_id", "n_chars", k=3)
    rows = out.collect()
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r["rn"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_lang.values())
    assert all(len(v) <= 3 for v in per_lang.values())
    # layout invariance
    again = weighted_sample_topk(
        docs.repartition(11), ["lang"], "doc_id", "n_chars", k=3
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different salt is an independent redraw (not identical membership)
    redraw = weighted_sample_topk(
        docs, ["lang"], "doc_id", "n_chars", k=3, salt="ws-v2"
    ).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, redraw))


def test_weighted_sample_favors_heavy_rows(spark):
    """A row with overwhelming weight must always win rank 1: its race key
    -ln(u)/w is ~0 for any u."""
    from spookystuff_spark.operators.sampling import weighted_sample_topk

    rows = [(i, "g", 1.0 if i else 1e12) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, g string, w double")
    out = weighted_sample_topk(df, ["g"], "id", "w", k=1).collect()
    assert len(out) == 1 and out[0]["id"] == 0 and out[0]["rn"] == 1
