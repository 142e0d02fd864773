"""Hadoop-filesystem resolver (ref: CompoundResolver.scala:39-90 OmniResolver,
commons/.../io/HDFSResolver.scala): any Hadoop scheme resolves through the JVM
FileSystem API via py4j. Exercised against the local Hadoop FS (file:) and a
genuine non-local scheme (viewfs:// with a mount table), driver-side — the
same JVM-gateway context the agent runtime has in tests."""

from __future__ import annotations

import pytest

from spookystuff_spark.actions.core import Trace
from spookystuff_spark.actions.http import Wget
from spookystuff_spark.actions.runtime import fetch_trace
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.sources.resolvers import omni_resolve, resolve_hadoop


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    d = tmp_path_factory.mktemp("hfs")
    (d / "x.html").write_text(
        "<html><head><title>HX</title></head><body><a href='y.html'>y</a></body></html>"
    )
    (d / "sub").mkdir()
    (d / "sub" / "y.txt").write_text("payload")
    return d


def test_hadoop_fs_file_read_and_listing(spark, tree):
    """The py4j FileSystem path: open/IOUtils for files, listStatus for dirs."""
    r = resolve_hadoop(f"file:{tree}/x.html")
    assert r.status == 200 and b"HX" in r.content
    assert r.mime.startswith("text/html")

    listing = resolve_hadoop(f"file:{tree}")
    assert listing.mime.startswith("inode/directory")
    body = listing.content.decode()
    assert 'class="dir"' in body and "sub" in body and "x.html" in body


def test_viewfs_scheme_end_to_end(spark, tree):
    """A real non-local Hadoop scheme: viewfs:// mount table → local FS.
    omni_resolve dispatches it to the JVM; listing hrefs stay fully-qualified
    viewfs URIs so explore can walk the remote tree."""
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hconf.set("fs.viewfs.mounttable.sptest.link./data", f"file:{tree}")

    r = omni_resolve("viewfs://sptest/data/x.html")
    assert r.status == 200 and b"HX" in r.content

    listing = omni_resolve("viewfs://sptest/data")
    body = listing.content.decode()
    assert 'href="viewfs://sptest/data/x.html"' in body
    assert 'href="viewfs://sptest/data/sub"' in body

    # full agent path: Wget over viewfs yields an ordinary Doc observation
    obs = fetch_trace(
        Trace((Wget("viewfs://sptest/data/sub/y.txt"),)),
        SpookyConf(cache_read=False, cache_write=False, fetch_retries=1),
    )
    assert obs[0].success and obs[0].content == b"payload"


def test_missing_hadoop_path_is_error_evidence(spark, tree):
    obs = fetch_trace(
        Trace((Wget(f"viewfs://sptest/data/nope.bin"),)),
        SpookyConf(cache_read=False, cache_write=False, fetch_retries=1),
    )
    assert not obs[0].success and "nope" in (obs[0].error or "")
