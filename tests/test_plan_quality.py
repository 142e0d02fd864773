"""Physical-plan quality guards: native-only stages for native queries,
pushdown presence, broadcast joins where expected. Regression tripwires for
the 100 TB design rules."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


NATIVE_ONLY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q_dedup_exact",
    "q_doc_fingerprints",
    "q_doc_profile",
    "q_lang_id_heuristic",
    "q_events_sessionize",
    "q_knn_cosine_bruteforce",
    "q_session_windows",
    "q_decontaminate_13gram",
    "q_dup_span_docs",
    "q_char_trigram_logprob",
    "q_longest_dup_span",
    "q_mixture_sample",
    "q_cap_per_source",
    "q_pii_scrub",
    "q_retrieval_bm25",
    "q_pack_sequences",
    "q_train_split",
    "q_pack_split_suite",
]


def test_bm25_broadcasts_query_terms(spark):
    """BM25: the term/df/stats sides are broadcast; the only exchange is the
    postings groupBy — no sort-merge join anywhere."""
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    plan = _plan(QUERIES["q_retrieval_bm25"](spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", NATIVE_ONLY)
def test_no_python_stages_in_native_queries(spark, name):
    from spookystuff_spark.queries import (
        EXTRA_BENCH,
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    registry = {**QUERIES, **EXTRA_BENCH}
    plan = _plan(registry[name](spark, SF_SMOKE))
    for marker in ("BatchEvalPython", "MapInPandas", "FlatMapGroupsInPandas", "ArrowEvalPython"):
        assert marker not in plan, f"{name}: unexpected Python stage {marker}"


def test_broadcast_in_star_joins(spark):
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    assert _plan(QUERIES["q5_local_supplier_volume"](spark, SF_SMOKE)).count(
        "BroadcastHashJoin"
    ) >= 4
    assert "BroadcastHashJoin" in _plan(
        QUERIES["q3_shipping_priority"](spark, SF_SMOKE)
    )


def test_bloom_dedup_plan_never_shuffles_corpus(spark):
    """bloom_new_rows: one Arrow probe stage on the batch; the exact-verify
    joins must broadcast the (tiny) candidate side — the corpus is scanned,
    never sort-merge-shuffled."""
    from spookystuff_spark.queries import EXTRA_BENCH, load_all_query_modules

    load_all_query_modules()
    plan = _plan(EXTRA_BENCH["q_bloom_dedup_new"](spark, SF_SMOKE))
    assert "ArrowEvalPython" in plan  # the bitset probe
    assert plan.count("BroadcastHashJoin") >= 2  # semi verify + anti filter
    assert "SortMergeJoin" not in plan


def test_pushdown_reaches_scan(spark):
    from spookystuff_spark.queries import QUERIES, load_all_query_modules

    load_all_query_modules()
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, SF_SMOKE))
    assert "PushedFilters: [IsNotNull" in plan
    assert "l_comment" not in plan  # pruned (column doesn't even exist — sanity)
    # projection pruning: only 4 columns read
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double" in plan


def test_banded_hamming_join_plan(spark):
    """The media near-dup joins must stay equality-join shaped: the
    oversized-bucket list is BROADCAST (it is bounded by corpus/max_bucket),
    and no CartesianProduct/BroadcastNestedLoopJoin may appear anywhere —
    all-pairs is exactly what the banding exists to avoid."""
    from spookystuff_spark.operators.multimodal import phash_neardup_pairs

    df = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 63)) for i in range(200)],
        "img_id long, phash long",
    )
    pairs, _ = phash_neardup_pairs(df, "img_id", "phash", max_hamming=7)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # anti-join against the hot list rides a broadcast exchange
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_dv_read_plan_broadcasts_the_vector(spark, tmp_path):
    """Reading a DV table must anti-join the (small by contract) key vector
    as a BROADCAST — shuffling the table to apply a deletion vector would
    turn the O(deleted) design into an O(table) exchange at every read."""
    import pyspark.sql.functions as F

    from spookystuff_spark.sources import upsert as U

    tdir = str(tmp_path / "t")
    U.write_table(
        spark.range(0, 2000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("val")
        ),
        tdir,
        change_feed=False,
    )
    U.delete_where_dv(spark, tdir, F.col("k") % 100 == 0, ["k"])
    plan = _plan(U.read_table(spark, tdir))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
