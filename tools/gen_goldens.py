#!/usr/bin/env python3
"""Golden-oracle generator for the deterministic non-SQL operators.

The dedup/ANN/multimodal/fetch queries are seed-fixed and deterministic by
construction, but their signature math (minhash permutations, simhash bit
votes, hyperplane buckets, k-means cells) is not expressible in ANSI SQL. The
driver's correctness gate still wants a DuckDB oracle — so this script
recomputes each expected result with an INDEPENDENT single-process
numpy/pure-python implementation (the same reference implementations as
tests/test_ground_truth_audit.py) and writes it as a golden parquet. The
registered ``oracle_sql`` for these queries is then a plain
``SELECT * FROM read_parquet('<golden>')``.

Run: python tools/gen_goldens.py [sf_dir]   (default /root/testdata/sf0.01 —
the SF the driver gates at). Output: fixtures/golden/<sfname>/<query>.parquet.
"""

from __future__ import annotations

import hashlib
import os
import re
import sys
import zlib
from collections import defaultdict

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = os.path.join(REPO, "fixtures", "golden", os.path.basename(SF_DIR.rstrip("/")))

MERSENNE = np.uint64((1 << 61) - 1)
_WS = re.compile(r"\s+")


def canonical_sample_np(ids: np.ndarray, mat: np.ndarray, sample_cap: int) -> np.ndarray:
    """Replica of operators/sampling.canonical_sample: membership = the
    sample_cap rows with the smallest md5(str(id)), returned in id order —
    layout-independent at any corpus size."""
    h = np.array([hashlib.md5(str(int(i)).encode()).hexdigest() for i in ids])
    member = np.argsort(h, kind="stable")[:sample_cap]
    member = member[np.argsort(ids[member], kind="stable")]
    return mat[member]


def _normalize(text: str) -> str:
    return _WS.sub(" ", (text or "").lower()).strip()


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    t = _normalize(text)
    if len(t) < k:
        grams = {t} if t else set()
    else:
        grams = {t[i : i + k] for i in range(len(t) - k + 1)}
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    return np.unique(
        np.fromiter((zlib.crc32(g.encode()) for g in grams), dtype=np.uint64, count=len(grams))
    )


def perm_params(n_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(MERSENNE), size=n_hashes, dtype=np.uint64)
    b = rng.integers(0, int(MERSENNE), size=n_hashes, dtype=np.uint64)
    return a, b


def load_docs():
    return duckdb.sql(
        f"select doc_id, text from read_parquet('{SF_DIR}/documents.parquet')"
    ).df()


def load_emb():
    return duckdb.sql(
        f"select vec_id, embedding from read_parquet('{SF_DIR}/embeddings.parquet')"
    ).df()


def write(name: str, table: pa.Table) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"wrote {path}: {table.num_rows} rows, schema={table.schema.names}")


# --------------------------------------------------------------- MinHash-LSH


def minhash_pairs(docs, threshold: float, n_hashes=128, bands=16, shingle_k=5, seed=42,
                  max_bucket=64):
    """Reference MinHash pipeline: band buckets (blake2b digests) → candidate
    pairs (bucket cap) → exact-jaccard verify at ``threshold``."""
    a, b = perm_params(n_hashes, seed)
    rows_per_band = n_hashes // bands
    shingles: dict[int, np.ndarray] = {}
    buckets = defaultdict(set)
    for r in docs.itertuples():
        did = int(r.doc_id)
        h = shingle_hashes(r.text, shingle_k)
        shingles[did] = h
        if not len(h):
            continue
        sig = ((np.outer(a, h) + b[:, None]) % MERSENNE).min(axis=1)
        banded = sig.reshape(bands, rows_per_band)
        for bi in range(bands):
            key = (bi, hashlib.blake2b(banded[bi].tobytes(), digest_size=8).digest())
            buckets[key].add(did)
    cand = set()
    for members in buckets.values():
        if len(members) < 2 or len(members) > max_bucket:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))
    out = []
    for ia, ib in sorted(cand):
        ha, hb = shingles[ia], shingles[ib]
        if not len(ha) or not len(hb):
            continue
        inter = np.intersect1d(ha, hb, assume_unique=True).size
        jac = round(inter / (len(ha) + len(hb) - inter), 4)
        if jac >= threshold:
            out.append((ia, ib, jac))
    return out


def gold_minhash(docs):
    pairs = minhash_pairs(docs, threshold=0.8)
    write(
        "q_dedup_minhash",
        pa.table(
            {
                "id_a": pa.array([p[0] for p in pairs], pa.int64()),
                "id_b": pa.array([p[1] for p in pairs], pa.int64()),
                "jaccard_sim": pa.array([p[2] for p in pairs], pa.float64()),
            }
        ),
    )


def gold_clusters(docs):
    """MinHash pairs at 0.5 → union-find (min-label) → cluster sizes."""
    pairs = minhash_pairs(docs, threshold=0.5)
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for ia, ib, _ in pairs:
        ra, rb = find(ia), find(ib)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted({x for p in pairs for x in p[:2]})
    sizes = defaultdict(int)
    for n in nodes:
        sizes[find(n)] += 1
    keep = sorted(sizes)
    write(
        "q_dedup_clusters",
        pa.table(
            {
                "keep_id": pa.array(keep, pa.int64()),
                "cluster_size": pa.array([sizes[k] for k in keep], pa.int64()),
            }
        ),
    )


# ------------------------------------------------------------------ SimHash


def simhash_sig(text: str, n_bits: int = 64) -> int:
    tokens = _normalize(text).split()
    if not tokens:
        return 0
    acc = np.zeros(n_bits, dtype=np.int64)
    shifts = np.arange(n_bits, dtype=np.uint64)
    one = np.uint64(1)
    for tok in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        )
        acc += 2 * ((h >> shifts) & one).astype(np.int64) - 1
    out = 0
    for i in range(n_bits):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def gold_simhash(docs, max_hamming=8, n_chunks=4):
    sigs = {int(r.doc_id): simhash_sig(r.text) for r in docs.itertuples()}
    chunk_bits = 64 // n_chunks
    mask = (1 << chunk_bits) - 1
    buckets = defaultdict(set)
    for i, s in sigs.items():
        u = s & ((1 << 64) - 1)
        for c in range(n_chunks):
            buckets[(c, (u >> (c * chunk_bits)) & mask)].add(i)
    cand = set()
    for members in buckets.values():
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))

    def ham(a, b):
        return bin((a & ((1 << 64) - 1)) ^ (b & ((1 << 64) - 1))).count("1")

    rows = sorted(
        (a, b, ham(sigs[a], sigs[b])) for a, b in cand if ham(sigs[a], sigs[b]) <= max_hamming
    )
    write(
        "q_dedup_simhash",
        pa.table(
            {
                "id_a": pa.array([r[0] for r in rows], pa.int64()),
                "id_b": pa.array([r[1] for r in rows], pa.int64()),
                "hamming": pa.array([r[2] for r in rows], pa.int32()),
            }
        ),
    )


# ------------------------------------------------------------- LSH ANN top-k


def lsh_scored(emb, dim=64, n_planes=8, seed=42):
    """→ dict qid → list[(cos_sim, vec_id)] within the qid's bucket."""
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    buckets = (((mat @ planes) > 0) * powers).sum(axis=1)
    by_bucket = defaultdict(list)
    for idx, bkt in enumerate(buckets.tolist()):
        by_bucket[bkt].append(idx)
    scored = {}
    for members in by_bucket.values():
        if len(members) < 2:
            continue
        m = np.array(members)
        sub = mat[m]
        n = np.sqrt((sub * sub).sum(axis=1))
        n[n == 0] = 1.0
        cos = np.round((sub @ sub.T) / n[:, None] / n[None, :] + 1e-6, 4)
        for qi in range(len(m)):
            cands = [
                (float(cos[qi, ci]), int(ids[m[ci]]))
                for ci in range(len(m))
                if ids[m[ci]] != ids[m[qi]]
            ]
            scored[int(ids[m[qi]])] = cands
    return scored


def lsh_topk_rows(emb, dim=64, k=5, n_planes=8, seed=42):
    scored = lsh_scored(emb, dim, n_planes, seed)
    rows = []
    for qid in sorted(scored):
        cands = sorted(scored[qid], key=lambda t: (-t[0], t[1]))[:k]
        for rn, (cos, vid) in enumerate(cands, start=1):
            rows.append((qid, vid, cos, rn))
    return rows


def gold_lsh(emb):
    rows = lsh_topk_rows(emb, dim=64, k=5, n_planes=8)
    write(
        "q_ann_lsh_topk",
        pa.table(
            {
                "qid": pa.array([r[0] for r in rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                "cos_sim": pa.array([r[2] for r in rows], pa.float64()),
                "rn": pa.array([r[3] for r in rows], pa.int32()),
            }
        ),
    )


def gold_neardup_embedding(emb):
    rows = lsh_topk_rows(emb, dim=64, k=10, n_planes=6)
    out = sorted(
        (qid, vid, cos)
        for qid, vid, cos, _rn in rows
        if cos >= 0.4 and qid < vid
    )
    write(
        "q_neardup_embedding",
        pa.table(
            {
                "id_a": pa.array([r[0] for r in out], pa.int64()),
                "id_b": pa.array([r[1] for r in out], pa.int64()),
                "cos_sim": pa.array([r[2] for r in out], pa.float64()),
            }
        ),
    )


# ------------------------------------------------------------------ IVF ANN


def gold_ivf(emb, dim=64, k=5, n_cells=None, n_iters=5, sample_cap=10_000):
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    sample = canonical_sample_np(ids, mat, sample_cap)
    if n_cells is None:
        n_cells = max(4, min(256, int(len(sample) ** 0.5)))

    def pairwise_d2(a, b):
        return (
            (a * a).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )

    k_eff = min(n_cells, len(sample))
    centroids = sample[:1].copy()
    d2min = pairwise_d2(sample, centroids).min(axis=1)
    for _ in range(k_eff - 1):
        nxt = sample[d2min.argmax()][None, :]
        centroids = np.vstack([centroids, nxt])
        d2min = np.minimum(d2min, pairwise_d2(sample, nxt)[:, 0])
    for _ in range(n_iters):
        assign = pairwise_d2(sample, centroids).argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    cells = pairwise_d2(mat, centroids).argmin(axis=1)
    rows = []
    for c in sorted(set(cells.tolist())):
        m = np.where(cells == c)[0]
        if len(m) < 2:
            continue
        order = np.argsort(ids[m])
        cids = ids[m][order]
        sub = mat[m][order]
        norms = np.sqrt((sub * sub).sum(axis=1))
        norms[norms == 0] = 1.0
        cos = np.round((sub @ sub.T) / norms[:, None] / norms[None, :] + 1e-6, 4)
        np.fill_diagonal(cos, -2.0)
        kk = min(k, len(cids) - 1)
        for qi in range(len(cids)):
            top = np.argsort(-cos[qi], kind="stable")[:kk]
            for rn, ci in enumerate(top, start=1):
                rows.append((int(cids[qi]), int(cids[ci]), float(cos[qi, ci]), rn))
    write(
        "q_ann_ivf_topk",
        pa.table(
            {
                "qid": pa.array([r[0] for r in rows], pa.int64()),
                "vec_id": pa.array([r[1] for r in rows], pa.int64()),
                "cos_sim": pa.array([r[2] for r in rows], pa.float64()),
                "rn": pa.array([r[3] for r in rows], pa.int32()),
            }
        ),
    )


def gold_ann_index(
    emb, n_cells=8, n_iters=5, sample_cap=10_000, k=5, nprobe=2
):
    """Independent replica of the incremental ANN index gate
    (queries/llm_ops.q_ann_index over operators/ann_index.py): centroids
    train on the vec_id%4!=0 BASE exactly like ivf_assign (the gold_ivf
    replica), every vector's cell comes from the module's own distance
    expression, and the %97 query ids rank probed-cell neighbors by the
    rounded cosine with the id tiebreak. Pins BOTH the incremental fold's
    final cell assignments and the nprobe query path."""
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    base = ids % 4 != 0
    sample = canonical_sample_np(ids[base], mat[base], sample_cap)

    def pairwise_d2(a, b):
        return (
            (a * a).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )

    k_eff = min(n_cells, len(sample))
    centroids = sample[:1].copy()
    d2min = pairwise_d2(sample, centroids).min(axis=1)
    for _ in range(k_eff - 1):
        nxt = sample[d2min.argmax()][None, :]
        centroids = np.vstack([centroids, nxt])
        d2min = np.minimum(d2min, pairwise_d2(sample, nxt)[:, 0])
    for _ in range(n_iters):
        assign = pairwise_d2(sample, centroids).argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    # assignment: ann_index._assign_cells' exact expression order
    c_sq = (centroids * centroids).sum(axis=1)
    d2 = (
        (mat * mat).sum(axis=1)[:, None]
        - 2.0 * (mat @ centroids.T)
        + c_sq[None, :]
    )
    cells = d2.argmin(axis=1)

    rows = [
        ("anncells", str(int(i)), "cell_num", float(int(c)))
        for i, c in zip(ids, cells)
    ]

    qmask = ids % 97 == 0
    for qid, qvec in zip(ids[qmask], mat[qmask]):
        qd2 = (
            (qvec * qvec).sum()
            - 2.0 * (qvec @ centroids.T)
            + c_sq
        )
        probed = set(np.argsort(qd2, kind="stable")[:nprobe].tolist())
        member = np.isin(cells, list(probed))
        cand_ids = ids[member]
        cand = mat[member]
        qn = np.sqrt((qvec * qvec).sum())
        vn = np.sqrt((cand * cand).sum(axis=1))
        cos = np.round((cand @ qvec) / (qn * vn) + 1e-6, 4)
        order = sorted(
            range(len(cand_ids)), key=lambda j: (-cos[j], int(cand_ids[j]))
        )[:k]
        for rn, j in enumerate(order, start=1):
            rows.append(
                (
                    "annidx",
                    f"{int(qid)}|{int(cand_ids[j])}|{rn}",
                    "cosine",
                    float(cos[j]),
                )
            )
    write(
        "q_ann_index_melt",
        pa.table(
            {
                "q": pa.array([r[0] for r in rows], pa.string()),
                "row_key": pa.array([r[1] for r in rows], pa.string()),
                "measure": pa.array([r[2] for r in rows], pa.string()),
                "v_num": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
    )


# ------------------------------------------------------------- multimodal


def gold_multimodal(docs):
    magic = [
        (b"\x89PNG", "image"),
        (b"\xff\xd8\xff", "image"),
        (b"GIF8", "image"),
        (b"BM", "image"),
        (b"P6", "image"),
        (b"P5", "image"),
        (b"RIFF", "audio"),
        (b"ID3", "audio"),
        (b"\x1aE\xdf\xa3", "video"),
        (b"YUV4MPEG2", "video"),
    ]
    out = {"doc_id": [], "n_bytes": [], "entropy": [], "media_type": []}
    for r in docs.itertuples():
        blob = (r.text or "").encode("utf-8")
        mt = "unknown"
        for mg, m in magic:
            if blob.startswith(mg):
                mt = m
                break
        counts = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=256)
        p = counts[counts > 0] / max(len(blob), 1)
        entropy = float(-(p * np.log2(p)).sum()) if len(blob) else 0.0
        out["doc_id"].append(int(r.doc_id))
        out["n_bytes"].append(len(blob))
        out["entropy"].append(round(entropy, 4))
        out["media_type"].append(mt)
    write(
        "q_multimodal_meta",
        pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
                "entropy": pa.array(out["entropy"], pa.float64()),
                "media_type": pa.array(out["media_type"], pa.string()),
            }
        ),
    )


# ------------------------------------------------------------- image pHash


def gold_media(docs):
    """Independent pHash pipeline replica (queries/media.py semantics):
    synthesize the same deterministic images, hash with a from-scratch DCT,
    and find near-dup pairs by BRUTE-FORCE hamming <= 7 over all pairs —
    deliberately not the banded join, so the golden also proves the band
    blocking loses no pair (pigeonhole: 7 < 8 bands)."""
    import itertools

    def synth(doc_id, noisy):
        m = 32
        C = np.zeros((m, m))
        for u in range(8):
            for v in range(8):
                h = hashlib.md5(f"img-{doc_id}-{u * 8 + v}".encode()).digest()
                C[u, v] = (int.from_bytes(h[:8], "big") / 2**64 * 2 - 1) * 90.0 / (1.0 + u + v)
        t = np.cos(np.pi * (2 * np.arange(m)[None, :] + 1) * np.arange(m)[:, None] / (2 * m)) * np.sqrt(2.0 / m)
        t[0, :] = np.sqrt(1.0 / m)
        img = np.repeat(np.repeat(t.T @ C @ t, 2, 0), 2, 1) + 128.0
        if noisy:
            n = 64
            y = np.arange(n)[:, None]
            x = np.arange(n)[None, :]
            img = img + 4 * np.sin(2 * np.pi * 14 * x / n + doc_id % 5) * np.sin(2 * np.pi * 15 * y / n)
        return np.clip(np.round(img), 0, 255).astype(np.uint8)

    def phash(gray):
        h, w = gray.shape
        n = 32
        yi = np.arange(n) * h // n
        xi = np.arange(n) * w // n
        small = gray.astype(np.float64)[yi][:, xi]
        u = np.arange(n)[:, None]
        x = np.arange(n)[None, :]
        t = np.cos(np.pi * (2 * x + 1) * u / (2 * n)) * np.sqrt(2.0 / n)
        t[0, :] = np.sqrt(1.0 / n)
        co = (t @ small @ t.T)[:8, :8].ravel()
        med = np.median(co)
        v = 0
        for i, cv in enumerate(co):
            if cv > med:
                v |= 1 << (63 - i)
        return v

    imgs = []  # (img_id, phash)
    for r in docs.itertuples():
        d = int(r.doc_id)
        if d % 3 != 0:
            continue
        imgs.append((d * 10, phash(synth(d, False))))
        if d % 12 == 0:
            imgs.append((d * 10 + 1, phash(synth(d, True))))
    imgs.sort()
    q, rk, ms, vn = [], [], [], []
    for img_id, ph in imgs:
        q.append("phash")
        rk.append(f"{img_id}|{ph:016x}")
        ms.append("one")
        vn.append(1.0)
    for (ia, pa_), (ib, pb) in itertools.combinations(imgs, 2):
        d = bin(pa_ ^ pb).count("1")
        if d <= 7:
            q.append("phashpairs")
            rk.append(f"{ia}|{ib}")
            ms.append("hamming")
            vn.append(float(d))
    # audio fingerprints: same independent-replica discipline — synth the
    # same 9-segment tone melodies, fingerprint with a from-scratch
    # Haitsma-Kalker implementation, brute-force all pairs
    RATE, SECS, SEGS = 4000, 2.0, 9

    def synth_audio(doc_id, noisy):
        n = int(RATE * SECS)
        t = np.arange(n) / RATE
        sig = np.zeros(n)
        L = n // SEGS
        for s_ in range(SEGS):
            seg_t = t[s_ * L : (s_ + 1) * L]
            for k in range(4):
                h = hashlib.md5(f"aud-{doc_id}-{s_}-{k}".encode()).digest()
                f = 80 + int.from_bytes(h[:4], "big") % 1800
                a = 0.15 + (int.from_bytes(h[4:8], "big") % 1000) / 2000.0
                p = (int.from_bytes(h[8:12], "big") % 6283) / 1000.0
                sig[s_ * L : (s_ + 1) * L] += a * np.sin(2 * np.pi * f * seg_t + p)
        if noisy:
            sig = sig + 0.02 * np.sin(2 * np.pi * 1950 * t) + 0.02 * np.sin(2 * np.pi * 63 * t + 1.0)
        sig = sig * 0.9 / np.max(np.abs(sig))
        return np.clip(np.round(sig * 32767), -32768, 32767).astype("<i2")

    def afp(samples):
        x = samples.astype(np.float64) / 32768.0
        frames = bands = 9
        L = len(x) // frames
        edges = np.linspace(50, RATE / 2, bands + 1)
        E = np.zeros((frames, bands))
        win = np.hanning(L)
        for fi in range(frames):
            seg = x[fi * L : (fi + 1) * L]
            spec = np.abs(np.fft.rfft(seg * win)) ** 2
            freqs = np.fft.rfftfreq(L, 1.0 / RATE)
            for b in range(bands):
                m = (freqs >= edges[b]) & (freqs < edges[b + 1])
                E[fi, b] = np.log1p(spec[m].sum())
        v = i = 0
        for fi in range(1, frames):
            for b in range(bands - 1):
                if (E[fi, b] - E[fi, b + 1]) - (E[fi - 1, b] - E[fi - 1, b + 1]) > 0:
                    v |= 1 << (63 - i)
                i += 1
        return v

    clips = []
    for r in docs.itertuples():
        d = int(r.doc_id)
        if d % 5 != 0:
            continue
        clips.append((d * 10, afp(synth_audio(d, False))))
        if d % 20 == 0:
            clips.append((d * 10 + 1, afp(synth_audio(d, True))))
    clips.sort()
    for clip_id, v in clips:
        q.append("afp")
        rk.append(f"{clip_id}|{v:016x}")
        ms.append("one")
        vn.append(1.0)
    for (ia, va), (ib, vb) in itertools.combinations(clips, 2):
        d = bin(va ^ vb).count("1")
        if d <= 7:
            q.append("afppairs")
            rk.append(f"{ia}|{ib}")
            ms.append("hamming")
            vn.append(float(d))

    # video: per-frame hashes of the same spectral frames (seed doc_id*101+f)
    # + brute-force frame matching aggregated per video pair (>= 6 of 8) —
    # again NOT the banded join, independently proving its recall
    vids = []  # (vid_id, [frame hashes])
    for r in docs.itertuples():
        d = int(r.doc_id)
        if d % 7 != 0:
            continue
        vids.append((d * 10, [phash(synth(d * 101 + f, False)) for f in range(8)]))
        if d % 28 == 0:
            vids.append(
                (d * 10 + 1, [phash(synth(d * 101 + f, True)) for f in range(8)])
            )
    vids.sort()
    for vid_id, hs in vids:
        for fi, hv in enumerate(hs):
            q.append("vfp")
            rk.append(f"{vid_id}|{fi}|{hv:016x}")
            ms.append("one")
            vn.append(1.0)
    for (ia, ha), (ib, hb) in itertools.combinations(vids, 2):
        n = sum(
            1
            for fa in range(8)
            for fb in range(8)
            if bin(ha[fa] ^ hb[fb]).count("1") <= 7
        )
        if n >= 6:
            q.append("vfppairs")
            rk.append(f"{ia}|{ib}")
            ms.append("n_frame_matches")
            vn.append(float(n))

    write(
        "q_media_melt",
        pa.table(
            {
                "q": pa.array(q, pa.string()),
                "row_key": pa.array(rk, pa.string()),
                "measure": pa.array(ms, pa.string()),
                "v_num": pa.array(vn, pa.float64()),
            }
        ),
    )


# ---------------------------------------------------------- fetch dir listing


def gold_dir_listing():
    entries = sorted(os.listdir(SF_DIR))
    n_parquet = sum(1 for e in entries if e.endswith(".parquet"))
    write(
        "q_fetch_dir_listing",
        pa.table(
            {
                "n_entries": pa.array([len(entries)], pa.int64()),
                "n_parquet": pa.array([n_parquet], pa.int64()),
            }
        ),
    )


# ------------------------------------------------------------- SemDeDup


def gold_semdedup(emb, dim=64, threshold=0.4, n_cells=16, n_iters=5,
                  sample_cap=10_000):
    """k-means cells (same deterministic spec as gold_ivf) → per-cell greedy
    keep-in-ascending-id-order, drop at cos ≥ threshold to nearest kept."""
    ids = emb["vec_id"].to_numpy().astype(np.int64)
    mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    sample = canonical_sample_np(ids, mat, sample_cap)

    def pairwise_d2(a, b):
        return (
            (a * a).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )

    k_eff = min(n_cells, len(sample))
    centroids = sample[:1].copy()
    d2min = pairwise_d2(sample, centroids).min(axis=1)
    for _ in range(k_eff - 1):
        nxt = sample[d2min.argmax()][None, :]
        centroids = np.vstack([centroids, nxt])
        d2min = np.minimum(d2min, pairwise_d2(sample, nxt)[:, 0])
    for _ in range(n_iters):
        assign = pairwise_d2(sample, centroids).argmin(axis=1)
        for c in range(len(centroids)):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)

    cells = pairwise_d2(mat, centroids).argmin(axis=1)
    rows = []
    for c in sorted(set(cells.tolist())):
        m = np.where(cells == c)[0]
        order = np.argsort(ids[m], kind="stable")
        cids = ids[m][order]
        sub = mat[m][order]
        norms = np.linalg.norm(sub, axis=1)
        norms[norms == 0.0] = 1.0
        sub = sub / norms[:, None]
        sims = sub @ sub.T
        kept: list[int] = []
        for i in range(len(cids)):
            if kept:
                s = sims[i, kept]
                j = int(np.argmax(s))
                if s[j] >= threshold:
                    rows.append(
                        (
                            int(cids[i]),
                            int(c),
                            int(cids[kept[j]]),
                            float(np.round(s[j] + 1e-6, 4)),
                        )
                    )
                    continue
            kept.append(i)
    write(
        "q_semdedup_prune",
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                "cell": pa.array([r[1] for r in rows], pa.int64()),
                "dup_of": pa.array([r[2] for r in rows], pa.int64()),
                "cos_sim": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
    )


# ------------------------------------------------------------- keep-best


def _quality(text: str) -> float:
    t = text or ""
    n_chars = len(t)
    n_tokens = len(re.findall(r"\S+", t))
    punct = len(re.findall(r"[.,;:!?]", t))
    stop = len(re.findall(r"\b(?:the|and|of|to|is|a|in)\b", t.lower()))
    mwl = n_chars / max(n_tokens, 1)
    len_ok = 1.0 if 50 <= n_chars <= 20000 else 0.0
    punct_ok = 1.0 if punct / max(n_chars, 1) <= 0.1 else 0.0
    stop_ok = 1.0 if stop / max(n_tokens, 1) >= 0.01 else 0.0
    word_ok = 1.0 if 2.5 <= mwl <= 12 else 0.0
    return float(np.round((len_ok + punct_ok + stop_ok + word_ok) / 4 + 1e-6, 2))


def gold_keepbest(docs):
    """MinHash pairs at 0.5 → union-find → per component keep the
    highest-quality member (tie → smallest id)."""
    pairs = minhash_pairs(docs, threshold=0.5)
    parent: dict[int, int] = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for ia, ib, _ in pairs:
        ra, rb = find(ia), find(ib)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    q = dict(zip(docs["doc_id"].astype(int), docs["text"]))
    members = defaultdict(list)
    for n in sorted({x for p in pairs for x in p[:2]}):
        members[find(n)].append(n)
    rows = []
    for comp in sorted(members):
        ms = members[comp]
        best = max(ms, key=lambda i: (_quality(q[i]), -i))
        rows.append((comp, best, _quality(q[best]), len(ms)))
    write(
        "q_dedup_keep_best",
        pa.table(
            {
                "cluster": pa.array([r[0] for r in rows], pa.int64()),
                "kept_id": pa.array([r[1] for r in rows], pa.int64()),
                "kept_score": pa.array([r[2] for r in rows], pa.float64()),
                "n_members": pa.array([r[3] for r in rows], pa.int64()),
            }
        ),
    )


def gold_kmeans(emb, k=16, n_iter=5, quant=1_000_000):
    """Replica of operators/kmeans.py kmeans_assign: md5-seeded Lloyd's with
    int64-quantized mean updates (order-independent → bit-reproducible)."""
    vids = emb["vec_id"].to_numpy()
    q = np.stack(
        [np.floor(np.asarray(v, dtype=np.float64) * quant + 0.5) for v in emb["embedding"]]
    ).astype(np.int64)
    order = np.argsort(
        np.array([hashlib.md5(str(v).encode()).hexdigest() for v in vids])
    )
    centroids = q[order[:k]].astype(np.float64) / quant
    for _ in range(n_iter):
        x = q.astype(np.float64) / quant
        d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        cl = d2.argmin(axis=1)
        new_c = centroids.copy()
        for j in range(k):
            sel = q[cl == j]
            if len(sel):
                new_c[j] = sel.sum(axis=0, dtype=np.int64) / (len(sel) * quant)
        centroids = new_c
    x = q.astype(np.float64) / quant
    d2 = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    cl = d2.argmin(axis=1)
    dist = np.round(d2[np.arange(len(cl)), cl] + 1e-6, 6)
    write(
        "q_kmeans_assign",
        pa.table(
            {
                "vec_id": pa.array(vids, pa.int64()),
                "cluster": pa.array(cl.astype(np.int32), pa.int32()),
                "dist2": pa.array(dist, pa.float64()),
            }
        ),
    )


def gold_bpe(docs, n_merges=64):
    """Replica of operators/bpe.py: BPE merges learned from the word-frequency
    table (deterministic tie-breaks), then greedy rank encoding. Emitted
    pre-melted for the q_text_suite union."""
    from collections import Counter

    wf = Counter()
    for t in docs["text"]:
        wf.update(re.findall(r"[a-z0-9]+", (t or "").lower()))
    # identical (freq desc, word asc, limit top_words) cut as
    # operators/bpe.py::word_freqs — without it the replica silently diverges
    # from the engine once the corpus vocabulary exceeds the cap
    top_words = 100_000
    ordered = sorted(wf.items(), key=lambda kv: (-kv[1], kv[0]))[:top_words]
    words = {tuple(w) + ("</w>",): f for w, f in ordered}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nw = {}
        for sym, f in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            nw[k] = nw.get(k, 0) + f
        words = nw
    ranks = {m: i for i, m in enumerate(merges)}

    def encode_len(w):
        sym = list(w) + ["</w>"]
        while len(sym) > 1:
            cand = [(ranks.get((a, b), 1 << 30), i) for i, (a, b) in enumerate(zip(sym, sym[1:]))]
            rank, i = min(cand)
            if rank >= 1 << 30:
                break
            sym[i : i + 2] = [sym[i] + sym[i + 1]]
        return len(sym)

    memo = {}
    q, row_key, measure, v_num = [], [], [], []
    for rank, (a, b) in enumerate(merges):
        q.append("q_bpe_merges")
        row_key.append(f"{rank}|{a}|{b}")
        measure.append("rank")
        v_num.append(float(rank))
    for did, t in zip(docs["doc_id"], docs["text"]):
        ws = re.findall(r"[a-z0-9]+", (t or "").lower())
        total = 0
        for w in ws:
            if w not in memo:
                memo[w] = encode_len(w)
            total += memo[w]
        for m, v in (("n_words", len(ws)), ("n_bpe_tokens", total)):
            q.append("q_bpe_counts")
            row_key.append(str(did))
            measure.append(m)
            v_num.append(float(v))
    write(
        "q_bpe_melt",
        pa.table(
            {
                "q": pa.array(q),
                "row_key": pa.array(row_key),
                "measure": pa.array(measure),
                "v_num": pa.array(v_num, pa.float64()),
            }
        ),
    )


def gold_pq(emb, m=8, k=16, sample_cap=10_000, n_iters=10, topk=5):
    """Replica of operators/pq.py: per-subspace farthest-point k-means
    codebooks on the bounded head sample, ADC top-k for the 3 lowest-id
    queries. Emitted pre-melted for the q_curation_suite union."""
    ids = emb["vec_id"].to_numpy()
    x = np.vstack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    # canonical sample: smallest-md5(id) membership, id order (mirrors
    # operators/sampling.canonical_sample — fully layout-independent)
    sample = canonical_sample_np(ids.astype(np.int64), x, sample_cap)
    d = x.shape[1]
    sub = d // m

    def pd2(a, b):
        return (
            (a * a).sum(axis=1)[:, None]
            + (b * b).sum(axis=1)[None, :]
            - 2.0 * (a @ b.T)
        )

    def kmeans_fp(s, kk):
        kk = min(kk, len(s))
        c = s[:1].copy()
        dmin = pd2(s, c).min(axis=1)
        for _ in range(kk - 1):
            nxt = s[dmin.argmax()][None, :]
            c = np.vstack([c, nxt])
            dmin = np.minimum(dmin, pd2(s, nxt)[:, 0])
        for _ in range(n_iters):
            a = pd2(s, c).argmin(axis=1)
            for j in range(len(c)):
                mem = s[a == j]
                if len(mem):
                    c[j] = mem.mean(axis=0)
        return c

    books = [
        kmeans_fp(np.ascontiguousarray(sample[:, j * sub : (j + 1) * sub]), k)
        for j in range(m)
    ]
    codes = np.empty((len(x), m), dtype=np.int64)
    for j in range(m):
        codes[:, j] = pd2(
            np.ascontiguousarray(x[:, j * sub : (j + 1) * sub]), books[j]
        ).argmin(axis=1)

    order = np.argsort(ids, kind="stable")[:3]
    q, row_key, measure, v_num = [], [], [], []
    for qi in order:
        qid = int(ids[qi])
        qv = x[qi]
        d2 = np.zeros(len(x))
        for j in range(m):
            tab = pd2(qv[None, j * sub : (j + 1) * sub], books[j])[0]
            d2 += tab[codes[:, j]]
        d2 = np.round(d2 + 1e-6, 6)
        sel = sorted(range(len(x)), key=lambda i: (d2[i], ids[i]))[:topk]
        for rank, i in enumerate(sel, start=1):
            for mname, v in (("vec_id", float(ids[i])), ("adc_d2", float(d2[i]))):
                q.append("pq")
                row_key.append(f"{qid}|{rank}")
                measure.append(mname)
                v_num.append(v)
    write(
        "q_pq_melt",
        pa.table(
            {
                "q": pa.array(q),
                "row_key": pa.array(row_key),
                "measure": pa.array(measure),
                "v_num": pa.array(v_num, pa.float64()),
            }
        ),
    )


def gold_classifier(docs, n_features=512, n_iters=5, ridge=1.0, quant=1 << 28):
    """Replica of operators/classifier.py: md5-hashed binary BoW features,
    ridge-IRLS with int64-quantized per-doc gradient/Hessian contributions,
    clipped sigmoid scores. Emitted pre-melted for the q_text_suite union
    (q_text_classifier rows)."""
    import math

    D = n_features + 1
    feats, ys, dids = [], [], []
    for did, t in zip(docs["doc_id"], docs["text"]):
        toks = (t or "").lower().split()
        idxs = sorted(
            {int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:8], 16) % n_features
             for tok in toks}
        )
        feats.append(np.array(idxs, dtype=np.int64))
        ys.append(1.0 if "dup" in toks else 0.0)
        dids.append(int(did))
    w = np.zeros(D, dtype=np.float64)

    def logit(idxs):
        z = float(np.dot(w[idxs], np.ones(len(idxs), dtype=np.float64)) + w[-1])
        return max(-30.0, min(30.0, z))

    for _ in range(n_iters):
        gq = np.zeros(D, dtype=np.int64)
        hq = np.zeros((D, D), dtype=np.int64)
        for idxs, y in zip(feats, ys):
            p = 1.0 / (1.0 + math.exp(-logit(idxs)))
            sj = p * (1.0 - p)
            ix = np.concatenate([idxs, [D - 1]])
            v = np.ones(len(ix), dtype=np.float64)
            gq[ix] += np.rint((p - y) * v * quant).astype(np.int64)
            hq[np.ix_(ix, ix)] += np.rint(sj * np.outer(v, v) * quant).astype(
                np.int64
            )
        g = gq / quant
        H = hq / quant
        delta = np.linalg.solve(H + ridge * np.eye(D), -(g + ridge * w))
        w = w + delta

    q, row_key, measure, v_num = [], [], [], []
    for did, idxs in zip(dids, feats):
        p = 1.0 / (1.0 + math.exp(-logit(idxs)))
        pr = round(p + 1e-9, 4)
        for m, v in (("prob", pr), ("pred", 1.0 if p >= 0.5 else 0.0)):
            q.append("q_text_classifier")
            row_key.append(str(did))
            measure.append(m)
            v_num.append(float(v))
    write(
        "q_classifier_melt",
        pa.table(
            {
                "q": pa.array(q),
                "row_key": pa.array(row_key),
                "measure": pa.array(measure),
                "v_num": pa.array(v_num, pa.float64()),
            }
        ),
    )


def gold_leakage(docs, salt="split-v1"):
    """Replica of operators/curation.leakage_safe_split over the minhash-0.5
    near-dup graph: md5 hash split, union-find components, cluster members
    inherit the canonical (min-id) member's split. Emitted pre-melted for the
    q_curation_suite union (leakage rows; clustered docs only)."""
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bounds, accv = [], 0.0
    for name, wgt in weights.items():
        accv += wgt / total
        bounds.append((name, f"{max(min(int(accv * 65536), 65536) - 1, 0):04x}"))

    def split_of(i: int) -> str:
        b = hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:4]
        for name, bound in bounds[:-1]:
            if b <= bound:
                return name
        return bounds[-1][0]

    pairs = minhash_pairs(docs, threshold=0.5)
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for ia, ib, _ in pairs:
        ra, rb = find(ia), find(ib)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = sorted({x for p in pairs for x in p[:2]})
    q, row_key, measure, v_num = [], [], [], []
    for n in nodes:
        orig = split_of(n)
        final = split_of(find(n))
        q.append("leakage")
        row_key.append(f"{n}|{orig}|{final}")
        measure.append("moved")
        v_num.append(1.0 if orig != final else 0.0)
    write(
        "q_leakage_melt",
        pa.table(
            {
                "q": pa.array(q),
                "row_key": pa.array(row_key),
                "measure": pa.array(measure),
                "v_num": pa.array(v_num, pa.float64()),
            }
        ),
    )


def gold_textrank(docs, n_iter=10, damping=0.85, top_k=20, quant=float(1 << 40)):
    """Replica of operators/textrank.py: undirected co-occurrence graph from
    adjacent lowercase tokens, PageRank with floor-quantized int contribution
    sums (exact integer addition — the order-insensitive step that makes the
    Spark run bit-identical). Emitted pre-melted for the q_text_suite union
    (q_textrank_keywords rows)."""
    import math
    from collections import defaultdict

    wdir = defaultdict(int)
    for t in docs["text"]:
        toks = (t or "").lower().split()
        for a, b in zip(toks, toks[1:]):
            if a != b:
                wdir[(a, b)] += 1
    wsym = defaultdict(int)
    for (a, b), w in wdir.items():
        wsym[(a, b)] += w
        wsym[(b, a)] += w
    out_w = defaultdict(int)
    for (a, b), w in wsym.items():
        out_w[a] += w
    share = {(a, b): w / out_w[a] for (a, b), w in wsym.items()}
    r = {tok: 1.0 for tok in out_w}
    for _ in range(n_iter):
        acc = defaultdict(int)  # exact integer sums, any order
        for (a, b), s_ab in share.items():
            acc[b] += math.floor(s_ab * r[a] * quant)
        r = {tok: (1.0 - damping) + damping * (float(acc[tok]) / quant)
             for tok in acc}
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]
    q, row_key, measure, v_num = [], [], [], []
    for pos, (tok, rv) in enumerate(top, start=1):
        for m, v in (("rank", round(rv + 1e-6, 6)), ("rank_pos", float(pos))):
            q.append("q_textrank_keywords")
            row_key.append(tok)
            measure.append(m)
            v_num.append(float(v))
    write(
        "q_textrank_melt",
        pa.table(
            {
                "q": pa.array(q),
                "row_key": pa.array(row_key),
                "measure": pa.array(measure),
                "v_num": pa.array(v_num, pa.float64()),
            }
        ),
    )


def gold_lsh_index(
    docs, n_hashes=128, bands=16, shingle_k=5, seed=42,
    threshold=0.35, max_bucket=64,
):
    """Independent replica of the incremental LSH index gate
    (queries/llm_ops.q_lsh_index over operators/lsh_index.py): because
    the incremental fold must equal the from-scratch state, the replica
    signs the FINAL corpus (seed + append, minus the DV-deleted partner
    docs 447/290) directly — every doc's band rows, then the %7 probes'
    candidates via band-bucket membership
    (groups over ``max_bucket`` members dropped, self-pairs excluded)
    verified by the matching-component MinHash estimate (round-stable
    +1e-6, the module's own rounding contract)."""
    a, b = perm_params(n_hashes, seed)
    rpb = n_hashes // bands
    sigs: dict[int, np.ndarray] = {}
    groups: dict[tuple[int, bytes], set[int]] = defaultdict(set)
    band_rows = []
    for r in docs.itertuples():
        did = int(r.doc_id)
        if did in (447, 290):  # the gate's DV-deleted partner docs
            continue
        h = shingle_hashes(r.text, shingle_k)
        if not len(h):
            continue
        sig = ((np.outer(a, h) + b[:, None]) % MERSENNE).min(axis=1)
        sigs[did] = sig
        banded = sig.reshape(bands, rpb)
        for bi in range(bands):
            dg = hashlib.blake2b(banded[bi].tobytes(), digest_size=8).digest()
            groups[(bi, dg)].add(did)
            band_rows.append(
                (did, bi, int.from_bytes(dg, "big", signed=True))
            )
    rows = [
        ("lshbands", f"{did}|{bi}|{bh}", "member", 1.0)
        for did, bi, bh in band_rows
    ]
    n_probe_pairs = 0
    for r in docs.itertuples():
        pid = int(r.doc_id)
        if pid % 7 or pid not in sigs:
            continue
        psig = sigs[pid]
        banded = psig.reshape(bands, rpb)
        cand: set[int] = set()
        for bi in range(bands):
            dg = hashlib.blake2b(banded[bi].tobytes(), digest_size=8).digest()
            members = groups.get((bi, dg), set())
            if len(members) > max_bucket:
                continue
            cand |= {m for m in members if m != pid}
        for cid in sorted(cand):
            est = float(np.round((sigs[cid] == psig).mean() + 1e-6, 4))
            if est >= threshold:
                rows.append(("lshprobe", f"{pid}|{cid}", "est_sim", est))
                n_probe_pairs += 1
    assert n_probe_pairs > 0, "vacuous gate: no probe produced a pair"
    write(
        "q_lsh_index_melt",
        pa.table(
            {
                "q": pa.array([r[0] for r in rows], pa.string()),
                "row_key": pa.array([r[1] for r in rows], pa.string()),
                "measure": pa.array([r[2] for r in rows], pa.string()),
                "v_num": pa.array([r[3] for r in rows], pa.float64()),
            }
        ),
    )


def main():
    docs = load_docs()
    emb = load_emb()
    gold_minhash(docs)
    gold_lsh_index(docs)
    gold_clusters(docs)
    gold_simhash(docs)
    gold_lsh(emb)
    gold_neardup_embedding(emb)
    gold_ivf(emb)
    gold_ann_index(emb)
    gold_multimodal(docs)
    gold_media(docs)
    gold_dir_listing()
    gold_semdedup(emb)
    gold_keepbest(docs)
    gold_kmeans(emb)
    gold_bpe(docs)
    gold_pq(emb)
    gold_classifier(docs)
    gold_leakage(docs)
    gold_textrank(docs)


if __name__ == "__main__":
    main()
