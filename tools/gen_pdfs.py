#!/usr/bin/env python3
"""Deterministic PDF fixtures + golden oracle for q_pdf_doc_stats.

Writes small text PDFs (mixed uncompressed and /FlateDecode content streams,
literal-string escapes, /Title metadata) with a minimal pure-python writer,
and a golden parquet with per-file stats computed FROM THE SOURCE TEXT — so
the golden is independent of doc/pdf.py: writer → bytes → parser → selector
extraction must round-trip exactly for the gate to go green.
"""

from __future__ import annotations

import os
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PDF_DIR = os.path.join(REPO, "fixtures", "pdfs")
GOLD_DIR = os.path.join(REPO, "fixtures", "golden", "sf0.01")

N_DOCS = 6
WORDS = ["lorem", "ipsum", "alpha", "beta", "gamma", "delta", "sigma", "omega"]


def doc_lines(i: int) -> list[list[str]]:
    """Source text: one list of lines per page (closed-form, deterministic)."""
    n_pages = (i % 3) + 1
    pages = []
    for p in range(n_pages):
        lines = []
        for line_no in range((p % 2) + 2):
            toks = [
                f"doc{i}",
                f"page{p}",
                f"line{line_no}",
                WORDS[(i * 7 + p * 3 + line_no) % len(WORDS)],
                WORDS[(i + p + line_no) % len(WORDS)],
            ]
            if line_no == 0 and i % 2 == 0:
                toks.append("(escaped)")  # literal-string escape exercise
            if line_no == 1 and i % 3 == 0:
                toks.append("back\\slash")
            lines.append(" ".join(toks))
        pages.append(lines)
    return pages


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def content_stream(lines: list[str]) -> bytes:
    parts = ["BT /F1 12 Tf 72 720 Td"]
    for idx, line in enumerate(lines):
        if idx > 0:
            parts.append("0 -14 Td")
        parts.append(f"({_esc(line)}) Tj")
    parts.append("ET")
    return " ".join(parts).encode("latin-1")


def write_pdf(path: str, pages: list[list[str]], title: str, compress: bool) -> None:
    objects: list[bytes] = []  # 1-indexed bodies (without "N 0 obj"/"endobj")
    n_pages = len(pages)
    # layout: 1 catalog, 2 pages, 3 font, 4 info, then per page (page, content)
    page_obj_ids = [5 + 2 * p for p in range(n_pages)]
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(f"<< /Title ({_esc(title)}) /Producer (gen_pdfs) >>".encode())
    for p, lines in enumerate(pages):
        content_id = page_obj_ids[p] + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_id} 0 R "
                f"/Resources << /Font << /F1 3 0 R >> >> >>"
            ).encode()
        )
        data = content_stream(lines)
        if compress:
            data = zlib.compress(data)
            head = f"<< /Length {len(data)} /Filter /FlateDecode >>".encode()
        else:
            head = f"<< /Length {len(data)} >>".encode()
        objects.append(head + b"\nstream\n" + data + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for n, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{n} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R /Info 4 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    with open(path, "wb") as f:
        f.write(bytes(out))


def main() -> None:
    os.makedirs(PDF_DIR, exist_ok=True)
    rows = {"file": [], "title": [], "n_pages": [], "n_tokens": [], "n_chars": []}
    for i in range(N_DOCS):
        pages = doc_lines(i)
        title = f"Fixture PDF {i}"
        name = f"pdf{i}.pdf"
        write_pdf(os.path.join(PDF_DIR, name), pages, title, compress=bool(i % 2))
        flat = " ".join(line for page in pages for line in page)
        rows["file"].append(name)
        rows["title"].append(title)
        rows["n_pages"].append(len(pages))
        rows["n_tokens"].append(len(flat.split()))
        rows["n_chars"].append(len(flat))
    os.makedirs(GOLD_DIR, exist_ok=True)
    table = pa.table(
        {
            "file": pa.array(rows["file"], pa.string()),
            "title": pa.array(rows["title"], pa.string()),
            "n_pages": pa.array(rows["n_pages"], pa.int64()),
            "n_tokens": pa.array(rows["n_tokens"], pa.int64()),
            "n_chars": pa.array(rows["n_chars"], pa.int64()),
        }
    )
    path = os.path.join(GOLD_DIR, "q_pdf_doc_stats.parquet")
    pq.write_table(table, path)
    print(f"wrote {N_DOCS} pdfs + {path}")


if __name__ == "__main__":
    main()
