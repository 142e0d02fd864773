"""WARC/1.0 source: parse fixtures (plain + gzip), doc-shape projection."""

from __future__ import annotations

import gzip
import os

import pyspark.sql.functions as F

from spookystuff_spark.sources.warc import (
    _parse_record,
    _split_records,
    fixture_warc_bytes,
    read_warc,
    warc_to_docs,
)

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "warc")


def test_split_and_parse_roundtrip_plain_and_gzip():
    plain, gz = fixture_warc_bytes(8)
    recs = list(_split_records(plain)) + list(_split_records(gz))
    assert len(recs) == 8
    parsed = [_parse_record(r) for r in recs]
    uris = {p["target_uri"] for p in parsed}
    assert uris == {f"http://corpus.example/page/{i}" for i in range(8)}
    assert all(p["http_status"] == 200 for p in parsed)
    assert all(p["body"].startswith(b"<html>") for p in parsed)


def test_read_warc_dataframe(spark):
    df = read_warc(spark, f"{ROOT}/*").cache()
    assert df.count() == 24
    assert df.where(F.col("http_status") != 200).count() == 0
    # both archive files contribute
    assert df.select("warc_file").distinct().count() == 2
    # payload length equals actual body size
    bad = df.where(F.length("body") != F.col("n_payload_bytes"))
    assert bad.count() == 0


def test_warc_to_docs_shape(spark):
    docs = warc_to_docs(read_warc(spark, f"{ROOT}/*"))
    rows = docs.collect()
    assert len(rows) == 24
    assert set(docs.columns) == {"uid", "uri", "mime", "timestamp", "content"}
    assert len({r["uid"] for r in rows}) == 24  # content-addressed, unique
    assert all(r["mime"].startswith("text/html") for r in rows)


def test_per_record_gzip_members():
    # per-record gzip: concatenated members must decode as one stream
    plain, _ = fixture_warc_bytes(8)  # plain archive holds the first half
    recs = list(_split_records(plain))
    assert len(recs) == 4
    per_record = b"".join(gzip.compress(r) for r in recs)
    out = list(_split_records(per_record))
    assert out == recs
