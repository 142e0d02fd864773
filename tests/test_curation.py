"""Unit tests for operators/curation.py: SemDeDup greedy semantics,
deterministic mixture sampling, PII scrub, keep-best selection."""

from __future__ import annotations

import pyspark.sql.functions as F

from spookystuff_spark.operators.curation import (
    hash_unit,
    keep_best,
    mixture_sample,
    pii_counts,
    pii_redact,
    semdedup_prune,
)


def test_mixture_sample_deterministic_and_rated(spark):
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("xx").alias("lang"),
    )
    a = sorted(
        r["doc_id"]
        for r in mixture_sample(df, "doc_id", "lang", {"en": 0.5}).collect()
    )
    b = sorted(
        r["doc_id"]
        for r in mixture_sample(df, "doc_id", "lang", {"en": 0.5}).collect()
    )
    assert a == b, "same rates must reproduce the same sample"
    assert all(x % 2 == 0 for x in a), "default_rate=0 must drop unknown strata"
    # md5 draw should be uniform: 5000 'en' docs at rate 0.5 → ~2500
    assert 2250 <= len(a) <= 2750
    # rate 1.0 keeps everything in the stratum
    full = mixture_sample(df, "doc_id", "lang", {"xx": 1.0}).count()
    assert full == 5_000


def test_mixture_sample_is_scan_stage_only(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    plan = (
        mixture_sample(df, "doc_id", "lang", {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, "mixture sampling must not shuffle"
    for marker in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython"):
        assert marker not in plan


def test_hash_unit_range(spark):
    stats = spark.range(1000).select(hash_unit(F.col("id")).alias("u")).agg(
        F.min("u"), F.max("u")
    ).collect()[0]
    assert 0.0 <= stats[0] and stats[1] < 1.0


def test_pii_scrub_crafted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@corp.example.org now"),
            (2, "host 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 ok"),
            (4, "clean text with no pii at all"),
            (5, "alice@a.io or 1.2.3.4 or 555-000-1111"),
        ],
        ["doc_id", "text"],
    )
    c = pii_counts(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            c["n_emails"].alias("e"),
            c["n_ips"].alias("i"),
            c["n_phones"].alias("p"),
            pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["i"], rows[1]["p"]) == (1, 0, 0)
    assert rows[1]["red"] == "mail <EMAIL> now"
    assert (rows[2]["e"], rows[2]["i"], rows[2]["p"]) == (0, 2, 0)
    assert rows[2]["red"] == "host <IP> and <IP> up"
    assert (rows[3]["e"], rows[3]["i"], rows[3]["p"]) == (0, 0, 1)
    assert rows[3]["red"] == "call <PHONE> ok"
    assert (rows[4]["e"], rows[4]["i"], rows[4]["p"]) == (0, 0, 0)
    assert rows[4]["red"] == "clean text with no pii at all"
    assert rows[5]["red"] == "<EMAIL> or <IP> or <PHONE>"


def test_keep_best_argmax_with_tiebreak(spark):
    members = spark.createDataFrame(
        [
            # cluster 10: clear winner id=3 (score 0.9)
            (10, 1, 0.5),
            (10, 3, 0.9),
            (10, 7, 0.9 - 0.2),
            # cluster 20: tie on score → smallest id (4) wins
            (20, 9, 0.75),
            (20, 4, 0.75),
        ],
        ["component", "doc_id", "quality"],
    )
    out = {
        r["cluster"]: r
        for r in keep_best(members, "component", "doc_id", "quality").collect()
    }
    assert out[10]["kept_id"] == 3 and out[10]["n_members"] == 3
    assert out[20]["kept_id"] == 4 and out[20]["n_members"] == 2


def test_semdedup_greedy_drops_to_first_kept(spark):
    # one cell (n_cells=1): ids 0,1,2 are colinear (cos=1), id 3 orthogonal
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0, 0.0]),
        (2, [0.5, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["id"]: r
        for r in semdedup_prune(
            df, "vec_id", "embedding", dim=4, threshold=0.9, n_cells=1
        ).collect()
    }
    assert out[0]["keep"] and out[3]["keep"]
    assert not out[1]["keep"] and out[1]["dup_of"] == 0
    assert not out[2]["keep"] and out[2]["dup_of"] == 0
    assert abs(out[1]["cos_sim"] - 1.0) < 1e-9
    # smaller threshold than any cross-direction sim → keeps are exact
    assert sum(1 for r in out.values() if r["keep"]) == 2


def test_cap_per_stratum_quota_and_determinism(spark):
    from spookystuff_spark.operators.curation import cap_per_stratum

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 4).cast("string").alias("src")
    )
    a = cap_per_stratum(df, "doc_id", "src", cap=10)
    ids_a = sorted(r["doc_id"] for r in a.collect())
    ids_b = sorted(
        r["doc_id"] for r in cap_per_stratum(df, "doc_id", "src", cap=10).collect()
    )
    assert ids_a == ids_b, "quota selection must be deterministic"
    per = {r["src"]: r["n"] for r in a.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert all(v == 10 for v in per.values())
    # a stratum smaller than the cap survives whole
    few = cap_per_stratum(df.filter("doc_id < 3"), "doc_id", "src", cap=10)
    assert few.count() == 3
