"""save_docs, downsampling variants, preview mode, create_blank."""

from __future__ import annotations

import os

import pytest

from spookystuff_spark.actions import Wget
from spookystuff_spark.caching import memory as mem_cache
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.context import SpookyContext


@pytest.fixture()
def site(tmp_path):
    (tmp_path / "p.html").write_text(
        "<html><head><title>P</title></head><body>x</body></html>"
    )
    (tmp_path / "q.json").write_text('{"k": 1}')
    return tmp_path


def test_save_docs_and_manifest(spark, site, tmp_path):
    mem_cache.clear()
    sctx = SpookyContext(spark)
    dv = sctx.create(
        spark.createDataFrame([{"f": "p.html"}, {"f": "q.json"}, {"f": "missing.bin"}])
    ).fetch(Wget(f"file://{site}/{{f}}"))
    out_dir = str(tmp_path / "saved")
    manifest = {r.uid: r for r in dv.save_docs(out_dir).collect()}
    assert len(manifest) == 3
    paths = sorted(r.saved_path for r in manifest.values())
    assert sum(p.endswith(".err.txt") for p in paths) == 1
    assert sum(p.endswith(".html") for p in paths) == 1
    assert sum(p.endswith(".json") for p in paths) == 1
    for r in manifest.values():
        assert os.path.exists(r.saved_path)
        assert os.path.getsize(r.saved_path) == r.n_bytes

    errs = dv.save_docs(str(tmp_path / "errs"), errors_only=True).collect()
    assert len(errs) == 1
    assert errs[0].saved_path.endswith(".err.txt")


def test_downsampling_ratio_and_tosize(spark, site):
    mem_cache.clear()
    sctx = SpookyContext(spark)
    rows = [{"f": "p.html"} for _ in range(10)]
    dv = sctx.create(spark.createDataFrame(rows).coalesce(1))
    n_tosize = dv.fetch(
        Wget(f"file://{site}/{{f}}"), downsampling=("to_size", 3)
    ).count()
    assert n_tosize == 3
    n_ratio = dv.fetch(
        Wget(f"file://{site}/{{f}}"), downsampling=("by_ratio", 0.5)
    ).count()
    assert 1 <= n_ratio <= 9


def test_preview_mode_limits_fetch(spark, site):
    mem_cache.clear()
    sctx = SpookyContext(spark, SpookyConf(preview_mode=True))
    rows = [{"f": "p.html"} for _ in range(5)]
    out = sctx.create(spark.createDataFrame(rows).coalesce(1)).fetch(
        Wget(f"file://{site}/{{f}}")
    )
    assert out.count() == 1  # FirstN(1) per group (SpookyConf.previewMode)


def test_create_blank_seed(spark, site):
    mem_cache.clear()
    sctx = SpookyContext(spark)
    out = (
        sctx.create_blank()
        .fetch(Wget(f"file://{site}/p.html"))
        .docs_df()
        .collect()
    )
    assert len(out) == 1 and out[0].success


def test_auto_error_dump(spark, tmp_path):
    """conf.error_dump_root: failed traces auto-dump audit files
    (Action.scala:109-129 parity)."""
    import os

    from spookystuff_spark.actions import Trace, Wget, fetch_trace

    dump = str(tmp_path / "errdump")
    c = SpookyConf(fetch_retries=1, retry_delay_sec=0, error_dump_root=dump)
    obs = fetch_trace(Trace((Wget(f"file://{tmp_path}/nope.bin"),)), c)
    assert not obs[0].success
    files = os.listdir(dump)
    assert len(files) == 1 and files[0].endswith(".err.txt")
    content = open(os.path.join(dump, files[0])).read()
    assert "FileNotFoundError" in content and "nope.bin" in content
