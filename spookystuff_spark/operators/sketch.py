"""Approximate sketches at corpus scale: HyperLogLog distinct counting,
Count-Min frequency estimation, and KMV (k-minimum-values) distinct
estimation — all pure Catalyst (md5 + integer arithmetic, zero Python).

Why sketches at 100 TB: ``count(DISTINCT x)`` shuffles every distinct value
and ``groupBy(token).count()`` shuffles the whole vocabulary; both are
unbounded in the key universe. Each sketch here bounds the shuffled state
HARD, independent of cardinality:

  * HLL: per group, at most ``m = 2**p`` (register, max-rho) rows survive the
    partial aggregation — the shuffle carries ``groups x m`` tiny rows no
    matter how many distinct values exist. Relative error ~ 1.04/sqrt(m).
  * Count-Min: the sketch is a fixed ``depth x width`` grid of counters;
    the groupBy shuffles at most ``depth*width`` keys. Point queries
    overestimate only (one-sided error <= eN with prob 1-delta).
  * KMV: per group only the k smallest value-hashes matter; duplicate values
    collapse map-side (same hash), so the shuffle is bounded by the distinct
    universe but the *driver-visible* state is k rows per group, and the
    estimator (k-1)/h_k needs no second pass.

Engine-portability: every hash is ``md5`` (identical in Spark, DuckDB and
hashlib), sliced to hex substrings and converted with ``conv``/``::BIGINT``
— so the DuckDB oracles replay the exact same register/bucket/rank values
and the gate pins the sketches value-for-value, not just within error bars.
Accuracy-vs-exact bounds are asserted separately in tests/test_sketch.py.

No reference-engine counterpart (the reference is a scraping engine); this
extends the LLM-pipeline surface (corpus stats without full shuffles)
mandated by the rebuild brief.
"""

from __future__ import annotations

from typing import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from spookystuff_spark.functions.rounding import round_stable

# 2^53: largest power of two below the 13-hex-char (52-bit) rho domain; also
# the scale factor that makes the HLL register sum exact integer arithmetic.
_P53 = 9007199254740992


def _hex_long(col, start: int, length: int):
    """Unsigned integer from ``length`` hex chars of an md5 digest (Catalyst
    ``conv``; the DuckDB oracle mirrors it as ``('0x'||substr(...))::BIGINT``).
    length <= 15 keeps the value inside a signed 64-bit long."""
    return F.conv(F.substring(col, start, length), 16, 10).cast("long")


def hll_reg_rho(value_col: str, p: int = 12):
    """(reg, rho) expressions for one value: reg = first p bits of
    md5(value); rho = 1-based position of the leftmost 1-bit in the next 52
    bits (53 when all zero). Shared by the batch register table and the
    streaming windowed variant (streaming/sketch_stream.py)."""
    if not 4 <= p <= 12:
        raise ValueError(f"p must be in [4,12] (3 hex chars), got {p}")
    hx = F.md5(F.col(value_col).cast("string"))
    # first 3 hex chars = 12 bits; shift down to p bits so any p<=12 works
    reg = F.shiftright(_hex_long(hx, 1, 3), 12 - p)
    w = _hex_long(hx, 4, 13)  # next 52 bits
    rho = F.when(w == 0, F.lit(53)).otherwise(53 - F.length(F.bin(w)))
    return reg, rho


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 12
) -> DataFrame:
    """HyperLogLog register table: one (group, reg, rho) row per non-empty
    register. The groupBy is map-side combinable (max), so each partition
    emits <= m rows per group."""
    reg, rho = hll_reg_rho(value_col, p)
    return df.groupBy(
        *group_cols, reg.alias("reg")
    ).agg(F.max(rho).alias("rho"))


def hll_estimate(
    df: DataFrame, group_cols: Sequence[str], value_col: str, p: int = 12
) -> DataFrame:
    """Per-group approximate distinct count (Flajolet et al. 2007, HLL with
    linear-counting small-range correction; no 32-bit large-range correction
    needed — the hash domain here is 52 bits).

    The register sum is computed in exact integer arithmetic
    (``2^-rho`` scaled by 2^53, shiftleft + decimal sum) so the oracle
    replays it bit-for-bit; only the final alpha*m^2/S division is floating
    point, rounded via round_stable.
    """
    regs = hll_registers(df, group_cols, value_col, p)
    return hll_finish(regs, group_cols, p)


def hll_finish(regs: DataFrame, group_cols: Sequence[str], p: int = 12) -> DataFrame:
    """Registers -> estimate. Separated so mergeable register tables (e.g.
    the streaming windowed sketch, or unions of per-shard sketches reduced
    with max) can be finished the same way as the batch path. Re-aggregates
    with max(rho), so the input may contain duplicate (group, reg) rows."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    regs = regs.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))
    # 2^(53-rho) as exact integers; rho in [1,53] -> shift in [0,52]
    term = F.expr("shiftleft(cast(1 as bigint), 53 - rho)").cast("decimal(38,0)")
    g = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(term).alias("s_present")
    )
    # decimal arithmetic: (m - cnt) * 2^53 can reach 2^65, past bigint range
    missing = (F.lit(m) - F.col("cnt")).cast("decimal(38,0)")
    s_total = (
        F.col("s_present") + missing * F.lit(_P53).cast("decimal(38,0)")
    ).cast("double")
    raw = F.lit(alpha * m * m * float(_P53)) / s_total
    zeros = (F.lit(m) - F.col("cnt")).cast("long")
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / zeros)
    ).otherwise(raw)
    return g.select(
        *group_cols,
        round_stable(est, 2).alias("est_distinct"),
        zeros.alias("zero_regs"),
    )


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-Min sketch of key frequencies: ``depth`` independent hash rows
    of ``width`` counters. One explode (x depth) + one bounded groupBy — the
    shuffle carries at most depth*width keys regardless of the key universe.
    Returns (j, bucket, c)."""
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    keyed = df.select(F.col(key_col).alias("k"), rows)
    return keyed.groupBy(
        "j", _cms_bucket(F.col("j"), F.col("k"), width).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("c"))


def _cms_bucket(j_col, key_col, width: int):
    hx = F.md5(F.concat(j_col.cast("string"), F.lit(":"), key_col))
    return _hex_long(hx, 1, 12) % width


def cms_query(
    spark,
    sketch: DataFrame,
    terms: Sequence[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for a term list: est(t) = min_j sketch[j][h_j(t)].
    The sketch is depth*width rows — broadcast to the probe side, so the
    lookup is shuffle-free."""
    probe = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    probe = probe.select("term", rows)
    probe = probe.withColumn(
        "bucket", _cms_bucket(F.col("j"), F.col("term"), width)
    )
    joined = probe.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est")
    )


def kmv_estimate(
    df: DataFrame, group_cols: Sequence[str], value_col: str, k: int = 16
) -> DataFrame:
    """KMV distinct estimator: per group, keep the k smallest 60-bit value
    hashes; est = (k-1) * 2^60 / h_k (Bar-Yossef et al. 2002). When a group
    has fewer than k distinct hashes the count is exact. Duplicates collapse
    in the map-side partial of the (group, hash) aggregation; the window
    ranks only distinct hashes. Fixed-width lowercase hex compares
    lexicographically == numerically, so the ordering needs no conversion."""
    h = F.substring(F.md5(F.col(value_col).cast("string")), 1, 15)
    g = df.groupBy(*group_cols, h.alias("h")).agg(F.count(F.lit(1)).alias("_n"))
    w = Window.partitionBy(*group_cols).orderBy("h")
    ranked = g.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = ranked.groupBy(*group_cols).agg(
        F.max("rn").alias("cnt"), F.max("h").alias("hk")
    )
    hk_num = F.conv(F.col("hk"), 16, 10).cast("double")
    est = F.when(F.col("cnt") < k, F.col("cnt").cast("double")).otherwise(
        F.lit(float((k - 1) * (1 << 60))) / hk_num
    )
    return agg.select(*group_cols, round_stable(est, 2).alias("est_distinct"))


def sample_quantiles(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    id_expr,
    qs: Sequence[float],
    cap: int = 2000,
) -> DataFrame:
    """Per-group quantiles over a deterministic hash-fraction sample — the
    engine-portable, layout-independent alternative to approx_percentile
    (whose sketch internals no two engines share).

    Two passes, both bounded: (1) per-group counts (tiny agg, broadcast
    back); (2) keep rows whose 32-bit md5 fraction < cap/n — a scan-stage
    filter, so the per-group sort that ranks the sample sees ~cap rows, not
    the corpus. The nearest-rank (lower) quantile is then exact over that
    sample: rank = floor(q*(m-1)) + 1. Every step (md5 fraction, least(),
    floor of an IEEE multiply) replays identically in DuckDB — the oracle
    pins values, not error bars. Sampling error ~ 1/sqrt(cap) quantile
    deviation; membership is data-keyed, so it never changes under
    repartition or file-order churn.
    """
    grp = list(group_cols)
    v = F.col(value_col).alias("v")
    # 32-bit md5 fraction in [0,1): the corpus-wide deterministic draw idiom
    hfrac = _hex_long(F.md5(id_expr.cast("string")), 1, 8) / F.lit(4294967296.0)
    counts = df.groupBy(*grp).agg(F.count(F.lit(1)).alias("_n"))
    src = df.select(*grp, v, hfrac.alias("_hf")).join(
        F.broadcast(counts), grp
    )
    rate = F.least(F.lit(1.0), F.lit(float(cap)) / F.col("_n"))
    samp = src.filter(F.col("_hf") < rate).select(*grp, "v")
    w = Window.partitionBy(*grp).orderBy("v")
    ranked = samp.withColumn("rn", F.row_number().over(w))
    sizes = ranked.groupBy(*grp).agg(F.max("rn").alias("m"))
    targets = sizes.select(
        *grp,
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        "m",
    ).withColumn(
        "trn", F.floor(F.col("q") * (F.col("m") - 1)).cast("long") + 1
    )
    cond = targets["trn"] == ranked["rn"]
    for g in grp:
        cond = cond & (targets[g] == ranked[g])
    return F.broadcast(targets).join(ranked, cond).select(
        *[targets[g] for g in grp], "q", F.col("v").alias("value")
    )


def kmv_pairwise_overlap(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Set-overlap profiling between every pair of groups from their KMV
    sketches (Beyer et al., SIGMOD'07) — the data-discovery/joinability
    primitive: which columns/partitions share values, and how much.

    Per group, the k smallest 60-bit md5 value hashes form the sketch; for
    a pair, the k smallest of the union estimate ``|A∪B|``, the fraction
    of that combined sketch present in BOTH input sketches estimates
    Jaccard, and ``|A∩B| = jaccard·|A∪B|``, ``containment(A⊆B) =
    |A∩B|/|A|``. Everything below k distinct values is exact.

    Scale shape: ONE corpus aggregation builds all sketches (map-side
    combined (group, hash) distinct, then a k-bounded window); the
    pairwise stage touches only the sketch table — groups × k hashes, 15
    bytes each — broadcast into a groups² loop that never sees the corpus.
    Deterministic md5 hashing → the DuckDB oracle replays every estimate
    bit-for-bit (same rule as ``kmv_estimate``).

    → (group_a, group_b, est_a, est_b, est_union, est_intersection,
    jaccard, containment_a_in_b) for group_a < group_b."""
    h = F.substring(F.md5(F.col(value_col).cast("string")), 1, 15)
    g = df.groupBy(F.col(group_col).alias("g"), h.alias("h")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    w = Window.partitionBy("g").orderBy("h")
    sk = (
        g.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("g")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
    )

    def _est(arr):
        sz = F.size(arr)
        hk_num = F.conv(F.element_at(arr, sz), 16, 10).cast("double")
        return F.when(sz < k, sz.cast("double")).otherwise(
            F.lit(float((k - 1) * (1 << 60))) / hk_num
        )

    a = sk.select(F.col("g").alias("group_a"), F.col("hs").alias("hs_a"))
    b = sk.select(F.col("g").alias("group_b"), F.col("hs").alias("hs_b"))
    pairs = a.join(F.broadcast(b), F.col("group_a") < F.col("group_b"))
    u = F.slice(F.array_sort(F.array_union("hs_a", "hs_b")), 1, k)
    out = (
        pairs.withColumn("u", u)
        .withColumn("un", F.size("u"))
        .withColumn(
            "rho_n",
            F.size(F.array_intersect(F.array_intersect("hs_a", "hs_b"), "u")),
        )
        .withColumn("est_a", _est(F.col("hs_a")))
        .withColumn("est_b", _est(F.col("hs_b")))
        .withColumn("est_union", _est(F.col("u")))
        .withColumn("jac", F.col("rho_n") / F.col("un"))
        .withColumn("est_int", F.col("jac") * F.col("est_union"))
    )
    return out.select(
        "group_a",
        "group_b",
        round_stable(F.col("est_a"), 2).alias("est_a"),
        round_stable(F.col("est_b"), 2).alias("est_b"),
        round_stable(F.col("est_union"), 2).alias("est_union"),
        round_stable(F.col("est_int"), 2).alias("est_intersection"),
        round_stable(F.col("jac"), 6).alias("jaccard"),
        round_stable(
            F.col("est_int") / F.col("est_a"), 6
        ).alias("containment_a_in_b"),
    )
