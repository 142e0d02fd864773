"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

The Spark-side machinery (schemas, Arrow batch shapes, partition-friendly
mapInPandas UDFs, DFS offload threshold) is real and tested. Decoding is REAL
for every format decodable without a codec library — 8-bit PNG (stdlib zlib
+ numpy unfilter), uncompressed BMP, binary PPM/PGM, RIFF/WAVE PCM, and
YUV4MPEG2 frame walking — and explicitly marked ``unsupported`` per row for
entropy-coded formats (JPEG/GIF/MP3/webm — no codec libraries in this
container); for those, frame sampling falls back to a clearly-marked
deterministic chunk sampler that exercises the true 1→N explode shape.

At 100 TB: blobs ride in their own column, metadata extraction is one narrow
Arrow stage, and anything above ``inline_blob_max_bytes`` should live on DFS
with only the path in the row (same split as the doc cache).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image | audio | video | unknown
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
        StructField("entropy", DoubleType()),  # byte-level Shannon entropy
    ]
)

_MAGIC = [
    (b"\x89PNG", "image", "image/png"),
    (b"\xff\xd8\xff", "image", "image/jpeg"),
    (b"GIF8", "image", "image/gif"),
    (b"BM", "image", "image/bmp"),
    (b"P6", "image", "image/x-portable-pixmap"),
    (b"P5", "image", "image/x-portable-graymap"),
    (b"RIFF", "audio", "audio/wav"),
    (b"ID3", "audio", "audio/mpeg"),
    (b"\x1aE\xdf\xa3", "video", "video/webm"),
    (b"YUV4MPEG2", "video", "video/x-yuv4mpeg"),
]


def _meta_of(blob: bytes) -> dict:
    import numpy as np

    media_type, mime = "unknown", "application/octet-stream"
    for magic, mt, mm in _MAGIC:
        if blob.startswith(magic):
            media_type, mime = mt, mm
            break
    counts = np.bincount(np.frombuffer(blob, dtype=np.uint8), minlength=256)
    p = counts[counts > 0] / max(len(blob), 1)
    entropy = float(-(p * np.log2(p)).sum()) if len(blob) else 0.0
    return {
        "media_type": media_type,
        "mime": mime,
        "n_bytes": len(blob),
        "sha256": hashlib.sha256(blob).hexdigest(),
        "entropy": round(entropy, 4),
    }


def extract_media_meta(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Append a typed ``meta`` struct — REAL byte-level feature extraction
    (magic sniff, size, sha256, entropy); one narrow Arrow stage."""
    out_schema = StructType(
        list(df.schema.fields) + [StructField("meta", MEDIA_META_SCHEMA)]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            yield pdf.assign(
                meta=[_meta_of(bytes(b) if b is not None else b"") for b in pdf[blob_col]]
            )

    return df.mapInPandas(run, out_schema)


def _decode_bmp(blob: bytes):
    """Uncompressed BI_RGB 24/32-bit BMP → (h, w, c, HWC uint8 bytes)."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", blob, 10)[0]
    hdr_size = struct.unpack_from("<I", blob, 14)[0]
    if hdr_size < 40:  # BITMAPCOREHEADER etc. — out of scope
        return None
    w = struct.unpack_from("<i", blob, 18)[0]
    h_signed = struct.unpack_from("<i", blob, 22)[0]
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if planes != 1 or compression != 0 or bpp not in (24, 32) or w <= 0:
        return None
    h, bottom_up = abs(h_signed), h_signed > 0
    c = bpp // 8
    stride = (w * c + 3) & ~3
    need = data_off + stride * h
    if len(blob) < need:
        return None
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
    px = rows.reshape(h, stride)[:, : w * c].reshape(h, w, c)
    if bottom_up:
        px = px[::-1]
    # BGR(A) storage → RGB(A)
    px = px[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
    return h, w, c, np.ascontiguousarray(px).tobytes()


def _decode_pnm(blob: bytes):
    """Binary PPM (P6) / PGM (P5), maxval ≤ 255 → (h, w, c, HWC bytes)."""
    import numpy as np

    if blob[:2] not in (b"P6", b"P5"):
        return None
    c = 3 if blob[:2] == b"P6" else 1
    # header: magic, then 3 ints (w, h, maxval) separated by whitespace,
    # '#' comments run to end of line
    pos, vals = 2, []
    while len(vals) < 3 and pos < len(blob):
        ch = blob[pos : pos + 1]
        if ch == b"#":
            nl = blob.find(b"\n", pos)
            pos = len(blob) if nl < 0 else nl + 1
        elif ch.isspace():
            pos += 1
        else:
            end = pos
            while end < len(blob) and not blob[end : end + 1].isspace():
                end += 1
            try:
                vals.append(int(blob[pos:end]))
            except ValueError:
                return None
            pos = end
    if len(vals) < 3 or not blob[pos : pos + 1].isspace():
        return None
    w, h, maxval = vals
    pos += 1  # single whitespace after maxval, then raster
    if w <= 0 or h <= 0 or not 0 < maxval <= 255:
        return None
    need = w * h * c
    if len(blob) - pos < need:
        return None
    px = np.frombuffer(blob, dtype=np.uint8, count=need, offset=pos)
    return h, w, c, px.tobytes()


def _decode_png(blob: bytes):
    """8-bit non-interlaced PNG (gray / gray+alpha / RGB / RGBA / palette) →
    (h, w, c, HWC uint8 bytes). Pure stdlib ``zlib`` + numpy unfiltering — no
    codec library. Filters None/Sub/Up are vectorized (Sub via a mod-256
    cumulative sum over the pixel axis); Average/Paeth fall back to a
    per-byte loop (left-neighbor dependency is nonlinear)."""
    import struct
    import zlib

    import numpy as np

    if len(blob) < 33 or blob[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack_from(">I", blob, pos)
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if len(data) < length:
            return None
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if (
        channels is None
        or depth != 8
        or comp != 0
        or filt != 0
        or interlace != 0
        or w == 0
        or h == 0
    ):
        return None
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    stride = w * channels
    if len(raw) < h * (1 + stride):
        return None
    rows = np.frombuffer(raw, dtype=np.uint8, count=h * (1 + stride)).reshape(
        h, 1 + stride
    )
    ftypes, filtered = rows[:, 0], rows[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels
    for y in range(h):
        ft, line = int(ftypes[y]), filtered[y]
        if ft == 0:
            cur = line.copy()
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 1:  # Sub: cumulative along the pixel axis, per channel
            cur = line.copy()
            px = cur.reshape(w, bpp)
            np.cumsum(px, axis=0, out=px)
            cur &= 0xFF
        elif ft in (3, 4):  # Average / Paeth: sequential left dependency
            cur = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ft == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            return None
        recon[y], prev = cur, cur
    px = recon.astype(np.uint8)
    if color == 3:  # palette indices → RGB
        if plte is None or len(plte) % 3:
            return None
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if px.max() >= len(pal):
            return None
        out = pal[px.reshape(h, w)]
        return h, w, 3, np.ascontiguousarray(out).tobytes()
    return h, w, channels, px.reshape(h, w, channels).tobytes()


DECODED_SCHEMA_FIELDS = [
    StructField("h", IntegerType()),
    StructField("w", IntegerType()),
    StructField("c", IntegerType()),
    StructField("pixels", BinaryType()),
    StructField("decode_ok", StringType()),  # ok | unsupported | corrupt
]


def decode_image(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Decode image blobs to raw HWC uint8 pixel buffers in one narrow Arrow
    stage. REAL for the container-decodable formats — 8-bit non-interlaced
    PNG (stdlib zlib inflate + numpy unfilter), uncompressed 24/32-bit BMP
    and binary PPM/PGM (pure numpy/stdlib, no codec library). Formats that
    need an entropy codec (JPEG/GIF) are marked ``decode_ok='unsupported'``
    per row — at scale a decode failure must be data, not a job abort; plug
    PIL/cv2 into ``_decode_one`` to extend coverage. Malformed headers /
    truncated payloads / 16-bit-interlaced PNG come back ``'corrupt'`` with
    null pixels."""
    out_schema = StructType(list(df.schema.fields) + DECODED_SCHEMA_FIELDS)

    def _decode_one(blob: bytes):
        if blob[:8] == b"\x89PNG\r\n\x1a\n":
            got = _decode_png(blob)
            return got + ("ok",) if got else (None, None, None, None, "corrupt")
        if blob[:2] == b"BM":
            got = _decode_bmp(blob)
            return got + ("ok",) if got else (None, None, None, None, "corrupt")
        if blob[:2] in (b"P6", b"P5"):
            got = _decode_pnm(blob)
            return got + ("ok",) if got else (None, None, None, None, "corrupt")
        return None, None, None, None, "unsupported"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded = [
                _decode_one(bytes(b) if b is not None else b"")
                for b in pdf[blob_col]
            ]
            yield pdf.assign(
                h=[d[0] for d in decoded],
                w=[d[1] for d in decoded],
                c=[d[2] for d in decoded],
                pixels=[d[3] for d in decoded],
                decode_ok=[d[4] for d in decoded],
            )

    return df.mapInPandas(run, out_schema)


AUDIO_SCHEMA_FIELDS = [
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("bit_depth", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("duration_s", DoubleType()),
    StructField("rms", DoubleType()),
    StructField("peak", DoubleType()),
    StructField("decode_ok", StringType()),  # ok | unsupported | corrupt
]


def _wav_pcm(blob: bytes):
    """RIFF/WAVE PCM (8/16-bit) → (rate, ch, depth, interleaved float64 in
    [-1, 1)) or None on malformed/unsupported headers."""
    import struct

    import numpy as np

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        return None
    audio_fmt, ch, rate, _, _, depth = fmt
    if audio_fmt != 1 or ch < 1 or rate <= 0 or depth not in (8, 16):
        return None
    if depth == 16:
        x = np.frombuffer(data, dtype="<i2", count=len(data) // 2).astype(np.float64)
        x /= 32768.0
    else:
        x = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    n_samples = len(x) // ch
    return rate, ch, depth, x[: n_samples * ch]


def _decode_wav(blob: bytes):
    """RIFF/WAVE PCM (8/16-bit) → (rate, ch, depth, n_samples, dur, rms, peak)."""
    import numpy as np

    got = _wav_pcm(blob)
    if got is None:
        return None
    rate, ch, depth, x = got
    n_samples = len(x) // ch
    if n_samples == 0:
        return rate, ch, depth, 0, 0.0, 0.0, 0.0
    return (
        rate,
        ch,
        depth,
        n_samples,
        n_samples / rate,
        float(np.sqrt((x * x).mean())),
        float(np.abs(x).max()),
    )


def decode_audio(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Decode audio blobs in one narrow Arrow stage. REAL for RIFF/WAVE PCM
    8/16-bit (stdlib struct + numpy — chunk-walking parser, word alignment,
    normalized RMS/peak features); compressed formats (MP3/OGG/…) are marked
    ``decode_ok='unsupported'`` per row, malformed RIFF ``'corrupt'``."""
    out_schema = StructType(list(df.schema.fields) + AUDIO_SCHEMA_FIELDS)

    def _one(blob: bytes):
        if blob[:4] == b"RIFF":
            got = _decode_wav(blob)
            if got:
                r, ch, d, n, dur, rms, peak = got
                return r, ch, d, n, round(dur, 6), round(rms, 6), round(peak, 6), "ok"
            return None, None, None, None, None, None, None, "corrupt"
        return None, None, None, None, None, None, None, "unsupported"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded = [
                _one(bytes(b) if b is not None else b"") for b in pdf[blob_col]
            ]
            yield pdf.assign(
                sample_rate=[d[0] for d in decoded],
                n_channels=[d[1] for d in decoded],
                bit_depth=[d[2] for d in decoded],
                n_samples=[d[3] for d in decoded],
                duration_s=[d[4] for d in decoded],
                rms=[d[5] for d in decoded],
                peak=[d[6] for d in decoded],
                decode_ok=[d[7] for d in decoded],
            )

    return df.mapInPandas(run, out_schema)


def resize_nearest(
    df: DataFrame,
    out_h: int,
    out_w: int,
    pixels_col: str = "pixels",
) -> DataFrame:
    """Nearest-neighbor resize of decoded HWC uint8 buffers (columns
    ``h/w/c/pixels`` as produced by :func:`decode_image`) — pure numpy index
    mapping, vectorized per blob; rows that failed decode pass through with
    null pixels."""
    import numpy as np

    fields = [
        f
        for f in df.schema.fields
        if f.name not in ("h", "w", pixels_col)
    ]
    out_schema = StructType(
        fields
        + [
            StructField("h", IntegerType()),
            StructField("w", IntegerType()),
            StructField(pixels_col, BinaryType()),
        ]
    )
    keep = [f.name for f in fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for row in pdf.to_dict("records"):
                px, h, w, c = row.get(pixels_col), row.get("h"), row.get("w"), row.get("c")
                if px is None or h is None:
                    rows.append({**{k: row[k] for k in keep}, "h": None, "w": None, pixels_col: None})
                    continue
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c)
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                small = np.ascontiguousarray(arr[yi][:, xi])
                rows.append(
                    {**{k: row[k] for k in keep}, "h": out_h, "w": out_w, pixels_col: small.tobytes()}
                )
            yield pd.DataFrame(rows, columns=keep + ["h", "w", pixels_col])

    return df.mapInPandas(run, out_schema)


def _y4m_frames(blob: bytes):
    """YUV4MPEG2 parser: yields (frame_idx, frame_bytes) for every frame.
    Returns None when the stream header/frames are malformed. Y4M is
    uncompressed — header line + raw planar frames — so this is a REAL
    frame walk, no codec needed."""
    nl = blob.find(b"\n")
    if nl < 0 or not blob.startswith(b"YUV4MPEG2"):
        return None
    w = h = None
    cspace = b"420"
    for tok in blob[9:nl].split():
        if tok[:1] == b"W":
            w = int(tok[1:]) if tok[1:].isdigit() else None
        elif tok[:1] == b"H":
            h = int(tok[1:]) if tok[1:].isdigit() else None
        elif tok[:1] == b"C":
            cspace = tok[1:]
    if not w or not h:
        return None
    if cspace.startswith(b"420"):
        fsize = w * h * 3 // 2
    elif cspace.startswith(b"422"):
        fsize = w * h * 2
    elif cspace.startswith(b"444"):
        fsize = w * h * 3
    elif cspace.startswith(b"mono"):
        fsize = w * h
    else:
        return None
    frames, pos, idx = [], nl + 1, 0
    while pos < len(blob):
        if blob[pos : pos + 5] != b"FRAME":
            return None
        fnl = blob.find(b"\n", pos)
        if fnl < 0 or len(blob) < fnl + 1 + fsize:
            return None
        frames.append((idx, blob[fnl + 1 : fnl + 1 + fsize]))
        pos, idx = fnl + 1 + fsize, idx + 1
    return frames


def frame_sample(
    df: DataFrame, blob_col: str = "media", every_n: int = 30
) -> DataFrame:
    """Frame sampler, one narrow Arrow stage, 1→N explode shape. REAL for
    YUV4MPEG2 (uncompressed planar video — stdlib header parse + frame walk):
    emits every ``every_n``-th true frame, ``frame_kind='frame'``. Codec
    formats (webm/mp4, codec absent from the container) fall back to the
    clearly-marked deterministic chunk sampler — one row per ``every_n`` KiB,
    ``frame_kind='chunk'``; malformed Y4M yields a single ``'corrupt'``
    row."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("frame_sig", StringType()),
            StructField("frame_kind", StringType()),  # frame | chunk | corrupt
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name != blob_col]
    chunk = every_n * 1024

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = keep + ["frame_idx", "frame_sig", "frame_kind"]
        for pdf in batches:
            rows = []
            for row in pdf.to_dict("records"):
                blob = bytes(row.get(blob_col) or b"")
                base = {k: row[k] for k in keep}
                if blob.startswith(b"YUV4MPEG2"):
                    frames = _y4m_frames(blob)
                    if frames is None:
                        rows.append(
                            {**base, "frame_idx": None, "frame_sig": None,
                             "frame_kind": "corrupt"}
                        )
                        continue
                    for i, payload in frames[:: max(every_n, 1)]:
                        rows.append(
                            {
                                **base,
                                "frame_idx": i,
                                "frame_sig": hashlib.sha256(payload).hexdigest()[:16],
                                "frame_kind": "frame",
                            }
                        )
                    continue
                n_frames = max(1, len(blob) // chunk)
                for i in range(n_frames):
                    piece = blob[i * chunk : (i + 1) * chunk]
                    rows.append(
                        {
                            **base,
                            "frame_idx": i,
                            "frame_sig": hashlib.sha256(piece).hexdigest()[:16],
                            "frame_kind": "chunk",
                        }
                    )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return df.mapInPandas(run, out_schema)


# ------------------------------------------------------------ perceptual hash


def _phash_one(px: bytes, h: int, w: int, c: int) -> int:
    """64-bit DCT perceptual hash of one decoded HWC uint8 buffer.

    Classic pHash recipe: grayscale → 32×32 nearest resize → orthonormal
    2-D DCT-II → top-left 8×8 low-frequency block → bit i = coeff_i >
    median. All float64 numpy — bit-deterministic for a given buffer."""
    import numpy as np

    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
    gray = arr.mean(axis=2)
    n = 32
    yi = (np.arange(n) * h // n).astype(np.int64)
    xi = (np.arange(n) * w // n).astype(np.int64)
    small = gray[yi][:, xi]
    u = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    t = np.cos(np.pi * (2 * x + 1) * u / (2 * n)) * np.sqrt(2.0 / n)
    t[0, :] = np.sqrt(1.0 / n)
    coeffs = (t @ small @ t.T)[:8, :8].ravel()
    med = np.median(coeffs)
    bits = 0
    for i, v in enumerate(coeffs):
        if v > med:
            bits |= 1 << (63 - i)
    return bits


def image_phash(df: DataFrame, pixels_col: str = "pixels") -> DataFrame:
    """Add ``phash`` (signed int64) + ``phash_hex`` to a ``decode_image``
    output frame; rows that failed decode get nulls. One narrow Arrow
    stage, no shuffle — hashing co-locates with decoding."""
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("phash", LongType()), StructField("phash_hex", StringType())]
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            hashes, hexes = [], []
            for px, h, w, c, ok in zip(
                pdf[pixels_col], pdf["h"], pdf["w"], pdf["c"], pdf["decode_ok"]
            ):
                if ok != "ok" or px is None:
                    hashes.append(None)
                    hexes.append(None)
                    continue
                v = _phash_one(bytes(px), int(h), int(w), int(c))
                hexes.append(f"{v:016x}")
                hashes.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pdf.assign(phash=hashes, phash_hex=hexes)

    return df.mapInPandas(run, out_schema)


def phash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    phash_col: str = "phash",
    max_hamming: int = 7,
    n_bands: int = 8,
    max_bucket: int = 1024,
) -> tuple[DataFrame, int]:
    """Image near-dup pairs by banded Hamming join over 64-bit pHashes.

    Same block-and-verify shape as the MinHash/SimHash stacks (dedup.py):
    the hash splits into ``n_bands`` disjoint bit bands; by pigeonhole two
    hashes within Hamming distance < n_bands agree EXACTLY on ≥1 band, so
    the candidate join is equality on (band_idx, band_bits) — never an
    all-pairs scan. Oversized buckets (≥ max_bucket images sharing a band
    value — e.g. flat/black images) are dropped with a returned count, the
    standard cap. Verification is exact: ``bit_count(a XOR b)`` in the JVM.

    → (pairs (id_a, id_b, hamming), n_dropped_buckets). Requires
    ``max_hamming < n_bands`` (the pigeonhole recall guarantee) and
    ``64 % n_bands == 0``."""
    if not (0 < n_bands <= 64 and 64 % n_bands == 0):
        raise ValueError("n_bands must divide 64")
    if max_hamming >= n_bands:
        raise ValueError(
            f"max_hamming={max_hamming} needs n_bands>{max_hamming} for the "
            "pigeonhole guarantee"
        )
    width = 64 // n_bands
    mask = (1 << width) - 1
    # pin (id, hash) once: the hash usually sits behind decode/hash Arrow
    # stages, and this frame's lineage is consumed FOUR times (bucket-size
    # count, hot-list anti-join, both self-join sides) — without the
    # checkpoint the whole decode pipeline re-runs each time. 16 bytes/row,
    # spill-safe, fine at any corpus size.
    base = (
        df.select(F.col(id_col).alias("__id"), F.col(phash_col).alias("__ph"))
        .where(F.col(phash_col).isNotNull())
        .localCheckpoint(eager=True)
    )
    bands = base.select(
        "__id",
        "__ph",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(f"shiftrightunsigned(__ph, {i * width})")
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("__id", "__ph", "b.band_idx", "b.band_bits")

    sizes = bands.groupBy("band_idx", "band_bits").agg(
        F.count(F.lit(1)).alias("__n")
    )
    hot = sizes.filter(F.col("__n") > max_bucket).select("band_idx", "band_bits")
    n_dropped = hot.count()
    ok = bands.join(F.broadcast(hot), ["band_idx", "band_bits"], "left_anti")
    a = ok.select(
        "band_idx", "band_bits",
        F.col("__id").alias("id_a"), F.col("__ph").alias("ph_a"),
    )
    b = ok.select(
        "band_idx", "band_bits",
        F.col("__id").alias("id_b"), F.col("__ph").alias("ph_b"),
    )
    pairs = (
        a.join(b, ["band_idx", "band_bits"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn("hamming", F.bit_count(F.expr("ph_a ^ ph_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))
    )
    return pairs, n_dropped


# ------------------------------------------------------- audio fingerprint


def _afp_one(x, rate: int) -> int:
    """64-bit Haitsma-Kalker audio fingerprint of mono float64 samples.

    9 equal time frames × 9 linear frequency bands (50 Hz..Nyquist) of
    Hann-windowed log power; bit(f, b) = sign of the time-and-frequency
    double difference of band energy — the classic robust-hash recipe
    (Haitsma & Kalker, ISMIR'02), 8×8 = 64 bits. Stationary-noise and
    small-amplitude perturbations leave the sign pattern intact; different
    content flips ~half the bits."""
    import numpy as np

    frames, bands = 9, 9
    L = len(x) // frames
    if L == 0:
        return 0
    edges = np.linspace(50, rate / 2, bands + 1)
    E = np.zeros((frames, bands))
    win = np.hanning(L)
    for fidx in range(frames):
        seg = x[fidx * L : (fidx + 1) * L]
        spec = np.abs(np.fft.rfft(seg * win)) ** 2
        freqs = np.fft.rfftfreq(L, 1.0 / rate)
        for b in range(bands):
            m = (freqs >= edges[b]) & (freqs < edges[b + 1])
            E[fidx, b] = np.log1p(spec[m].sum())
    v, i = 0, 0
    for fidx in range(1, frames):
        for b in range(bands - 1):
            d = (E[fidx, b] - E[fidx, b + 1]) - (E[fidx - 1, b] - E[fidx - 1, b + 1])
            if d > 0:
                v |= 1 << (63 - i)
            i += 1
    return v


def audio_fingerprint(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Decode WAV PCM blobs and add ``afp`` (signed int64 fingerprint) +
    ``afp_hex`` + ``sample_rate``/``duration_s``/``decode_ok`` in one
    narrow Arrow stage. Near-dup pairs then come from
    :func:`hamming64_neardup_pairs` — the same banded join as image pHash."""
    import numpy as np

    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("sample_rate", IntegerType()),
            StructField("duration_s", DoubleType()),
            StructField("afp", LongType()),
            StructField("afp_hex", StringType()),
            StructField("decode_ok", StringType()),
        ]
    )

    def _one(blob: bytes):
        if blob[:4] != b"RIFF":
            return None, None, None, None, "unsupported"
        got = _wav_pcm(blob)
        if got is None:
            return None, None, None, None, "corrupt"
        rate, ch, _, x = got
        if len(x) == 0:
            return rate, 0.0, None, None, "corrupt"
        mono = x.reshape(-1, ch).mean(axis=1)
        v = _afp_one(mono, rate)
        signed = v - (1 << 64) if v >= (1 << 63) else v
        return rate, round(len(mono) / rate, 6), signed, f"{v:016x}", "ok"

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            decoded = [
                _one(bytes(b) if b is not None else b"") for b in pdf[blob_col]
            ]
            yield pdf.assign(
                sample_rate=[d[0] for d in decoded],
                duration_s=[d[1] for d in decoded],
                afp=[d[2] for d in decoded],
                afp_hex=[d[3] for d in decoded],
                decode_ok=[d[4] for d in decoded],
            )

    return df.mapInPandas(run, out_schema)


# the banded Hamming join is hash-agnostic: same operator serves image
# pHashes and audio fingerprints (any 64-bit locality-robust hash)
hamming64_neardup_pairs = phash_neardup_pairs


# -------------------------------------------------------- video near-dup


def video_frame_phash(df: DataFrame, blob_col: str = "media") -> DataFrame:
    """Per-frame perceptual hashes of Y4M video blobs in one narrow Arrow
    stage: REAL frame walk (``_y4m_frames``), luma (Y) plane as the
    grayscale image, same DCT pHash as stills. 1→N explode: one output row
    per frame — (input cols) + ``frame_idx``, ``fphash``, ``fphash_hex``,
    ``decode_ok``. Non-Y4M blobs yield a single ``unsupported`` row,
    malformed streams ``corrupt``."""
    out_schema = StructType(
        [f for f in df.schema.fields if f.name != blob_col]
        + [
            StructField("frame_idx", IntegerType()),
            StructField("fphash", LongType()),
            StructField("fphash_hex", StringType()),
            StructField("decode_ok", StringType()),
        ]
    )
    keep = [f.name for f in df.schema.fields if f.name != blob_col]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                blob = bytes(rec[blob_col] or b"")
                base = {k: rec[k] for k in keep}
                if not blob.startswith(b"YUV4MPEG2"):
                    rows.append(
                        {**base, "frame_idx": None, "fphash": None,
                         "fphash_hex": None, "decode_ok": "unsupported"}
                    )
                    continue
                nl = blob.find(b"\n")
                w = h = None
                for tok in blob[9:nl].split():
                    if tok[:1] == b"W" and tok[1:].isdigit():
                        w = int(tok[1:])
                    elif tok[:1] == b"H" and tok[1:].isdigit():
                        h = int(tok[1:])
                frames = _y4m_frames(blob)
                if frames is None or not w or not h:
                    rows.append(
                        {**base, "frame_idx": None, "fphash": None,
                         "fphash_hex": None, "decode_ok": "corrupt"}
                    )
                    continue
                for idx, payload in frames:
                    v = _phash_one(payload[: w * h], h, w, 1)  # luma plane
                    rows.append(
                        {
                            **base,
                            "frame_idx": idx,
                            "fphash": v - (1 << 64) if v >= (1 << 63) else v,
                            "fphash_hex": f"{v:016x}",
                            "decode_ok": "ok",
                        }
                    )
            cols = keep + ["frame_idx", "fphash", "fphash_hex", "decode_ok"]
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return df.mapInPandas(run, out_schema)


def video_neardup_pairs(
    frames_df: DataFrame,
    id_col: str,
    phash_col: str = "fphash",
    frame_col: str = "frame_idx",
    max_hamming: int = 7,
    min_matching_frames: int = 4,
    n_bands: int = 8,
    max_bucket: int = 1024,
) -> tuple[DataFrame, int]:
    """Video near-dup pairs from per-frame hashes: two videos match when ≥
    ``min_matching_frames`` distinct (frame_a, frame_b) hash pairs sit
    within Hamming ``max_hamming`` — shared-scene detection that survives
    re-encode noise and is robust to a few changed frames.

    Frame identity is packed into one long (id·1024 + frame, loud overflow
    guard like operators/lines.py) so the frame-level candidate search IS
    :func:`hamming64_neardup_pairs` — one banded equality join, never
    all-(video²) or all-(frame²); the video-level verdict is a single
    count-distinct aggregation over surviving frame pairs.

    → (pairs (id_a, id_b, n_frame_matches), n_dropped_buckets)."""
    frames = 1 << 10
    in_range = (
        (F.col(frame_col) >= 0)
        & (F.col(frame_col) < frames)
        & (F.col(id_col) >= 0)
        & (F.col(id_col) < (1 << 52))
    )
    packed = F.when(
        in_range, F.col(id_col) * frames + F.col(frame_col)
    ).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit("video_neardup_pairs packing overflow: id"),
                F.col(id_col).cast("string"),
                F.lit("frame"),
                F.col(frame_col).cast("string"),
                F.lit("(need 0 <= id < 2^52, frame < 1024)"),
            )
        ).cast("long")
    )
    keyed = frames_df.where(F.col(phash_col).isNotNull()).select(
        packed.alias("__fid"), F.col(phash_col).alias("__fph")
    )
    fpairs, n_dropped = phash_neardup_pairs(
        keyed,
        "__fid",
        "__fph",
        max_hamming=max_hamming,
        n_bands=n_bands,
        max_bucket=max_bucket,
    )
    vids = (
        fpairs.select(
            F.expr(f"id_a div {frames}").alias("vid_a"),
            F.expr(f"id_b div {frames}").alias("vid_b"),
            F.col("id_a").alias("fa"),
            F.col("id_b").alias("fb"),
        )
        .where(F.col("vid_a") != F.col("vid_b"))
        .groupBy("vid_a", "vid_b")
        .agg(F.count_distinct("fa", "fb").alias("n_frame_matches"))
        .where(F.col("n_frame_matches") >= min_matching_frames)
        .select(
            F.col("vid_a").alias("id_a"),
            F.col("vid_b").alias("id_b"),
            F.col("n_frame_matches").cast("long").alias("n_frame_matches"),
        )
    )
    return vids, n_dropped
