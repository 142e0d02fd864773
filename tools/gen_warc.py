#!/usr/bin/env python3
"""Write the deterministic WARC fixture corpus + its construction-truth golden.

The golden for q_warc_doc_stats is derived from the SAME generator parameters
that wrote the archives — truth-by-construction, fully independent of the
parser in sources/warc.py (which is what the query exercises).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from spookystuff_spark.sources.warc import fixture_warc_bytes  # noqa: E402

N_PAGES, SEED = 24, 7
WARC_DIR = os.path.join(REPO, "fixtures", "warc")
GOLD_DIR = os.path.join(REPO, "fixtures", "golden", "sf0.01")


def main() -> None:
    os.makedirs(WARC_DIR, exist_ok=True)
    plain, gz = fixture_warc_bytes(N_PAGES, SEED)
    with open(os.path.join(WARC_DIR, "sample-00.warc"), "wb") as f:
        f.write(plain)
    with open(os.path.join(WARC_DIR, "sample-01.warc.gz"), "wb") as f:
        f.write(gz)

    rows = []
    for i in range(N_PAGES):
        uri = f"http://corpus.example/page/{i}"
        title = f"Page {i} — {'spark shuffle' if i % 3 == 0 else 'agent fetch'}"
        n_links = (i * 2) % 5
        links = "".join(f'<a href="/page/{j}">p{j}</a>' for j in range(n_links))
        html = (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>doc {i} body {'x' * (i * 11 % 97)}</p>{links}</body></html>"
        ).encode()
        rid = hashlib.md5(f"{SEED}|{uri}".encode()).hexdigest()
        rows.append(
            {
                "record_id": f"<urn:uuid:{rid}>",
                "uri": uri,
                "http_status": 200,
                "n_bytes": len(html),
                "title": title,
                "n_links": n_links,
            }
        )
    rows.sort(key=lambda r: r["uri"])
    table = pa.table(
        {
            "record_id": pa.array([r["record_id"] for r in rows]),
            "uri": pa.array([r["uri"] for r in rows]),
            "http_status": pa.array([r["http_status"] for r in rows], pa.int32()),
            "n_bytes": pa.array([r["n_bytes"] for r in rows], pa.int64()),
            "title": pa.array([r["title"] for r in rows]),
            "n_links": pa.array([r["n_links"] for r in rows], pa.int64()),
        }
    )
    os.makedirs(GOLD_DIR, exist_ok=True)
    out = os.path.join(GOLD_DIR, "q_warc_doc_stats.parquet")
    pq.write_table(table, out)
    print(f"wrote {WARC_DIR} (2 archives) and {out}: {table.num_rows} rows")


if __name__ == "__main__":
    main()
