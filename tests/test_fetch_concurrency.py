"""Concurrent trace execution within a partition (conf.fetch_concurrency).

Remote fetches are IO-bound; a bounded per-partition thread pool interleaves
the network waits. These tests pin (a) byte-identical results vs sequential,
(b) an actual wall-clock overlap witness via Delay-heavy traces, and (c) the
dedup invariant (duplicate traces still fetch once under concurrency).
"""

from __future__ import annotations

import time

import pytest

from spookystuff_spark.actions.control import Delay
from spookystuff_spark.actions.core import Trace
from spookystuff_spark.actions.mock import Mock
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext


@pytest.fixture()
def rows(spark):
    return spark.createDataFrame(
        [{"page": f"p{i}"} for i in range(8)]
    ).repartition(1)


def _spec(delay: float):
    def fn(row):
        return Trace(
            (
                Delay(delay),
                Mock(
                    uri=f"mock://{row['page']}",
                    content=f"<html><title>{row['page']}</title></html>".encode(),
                ),
            )
        )

    return fn


def _run(spark, rows, conc: float, delay: float = 0.25):
    mem_cache.clear()
    sctx = SpookyContext(
        spark, SpookyConf(fetch_concurrency=conc, cache_read=False)
    )
    dv = sctx.create(rows).fetch(_spec(delay), locality="narrow")
    t0 = time.monotonic()
    docs = dv.docs_df().select("uri").collect()
    out = sorted(r["uri"] for r in docs)
    return out, time.monotonic() - t0, sctx.metrics.snapshot()


def test_concurrent_results_match_sequential(spark, rows):
    seq, _, m_seq = _run(spark, rows, conc=1, delay=0.01)
    con, _, m_con = _run(spark, rows, conc=4, delay=0.01)
    assert con == seq
    assert len(con) == 8
    assert m_con["pages_fetched"] == m_seq["pages_fetched"] == 8


def test_concurrency_overlaps_io_waits(spark, rows):
    """8 traces × 0.35 s sleep in ONE partition: sequential is ≥ 2.8 s of
    sleeping; at concurrency 8 the sleeps overlap into ~1 wave. Threshold
    halfway (2.0 s) keeps the assert robust to scheduler noise."""
    _, t_con, _ = _run(spark, rows, conc=8, delay=0.35)
    assert t_con < 2.0, f"no IO overlap: {t_con:.2f}s"


def test_dedup_survives_concurrency(spark):
    mem_cache.clear()
    sctx = SpookyContext(spark, SpookyConf(fetch_concurrency=4))
    dup_rows = sctx.spark.createDataFrame(
        [{"page": "same"} for _ in range(6)] + [{"page": "other"}]
    ).repartition(1)
    dv = sctx.create(dup_rows).fetch(_spec(0.01), locality="narrow")
    out = dv.to_df().collect()
    assert len(out) == 7
    m = sctx.metrics.snapshot()
    assert m["pages_fetched"] == 2  # same + other, not 7


def test_wide_join_pools_unique_traces(spark, rows):
    """wide_join: shuffle-dedup + batched pooled fetch — 8 unique traces in
    few batches overlap their waits; results identical to narrow."""
    mem_cache.clear()
    sctx = SpookyContext(
        spark, SpookyConf(fetch_concurrency=8, cache_read=False)
    )
    dv = sctx.create(rows).fetch(_spec(0.35), locality="wide_join")
    t0 = time.monotonic()
    uris = sorted(r["uri"] for r in dv.docs_df().select("uri").collect())
    took = time.monotonic() - t0
    assert uris == sorted(f"mock://p{i}" for i in range(8))
    assert sctx.metrics.snapshot()["pages_fetched"] == 8
    # 8 x 0.35s sequential = 2.8s of sleep; pooled batches overlap most of it
    assert took < 2.4, f"no IO overlap in wide_join: {took:.2f}s"
