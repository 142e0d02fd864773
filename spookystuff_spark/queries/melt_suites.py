"""Melted suite queries for the scalar-function and text-analysis families.

Same pattern as queries/tpch_suites.py: the driver's correctness gate caps the
per-round query list, so individually-benchmarked queries (``bench_only``) are
pinned — every row, every value — through ONE melted suite row each. String
outputs ride in ``row_key`` (exact match), numeric outputs in ``v_num``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import (
    GOLDEN_QUERIES,
    GOLDEN_SF,
    bench_only,
    build_concurrently,
    query,
)
from spookystuff_spark.tables import shared_scans, table
from spookystuff_spark.queries.llm_ops import (
    ORACLE_LANG_ID,
    ORACLE_TOKEN_FREQ,
    q_lang_id_heuristic,
    q_token_freq_topk,
)
from spookystuff_spark.queries.scalar_funcs import (
    ORACLE_DATE_DIMS,
    ORACLE_STRING_FUNCS,
    ORACLE_TABLE_PROFILE,
    q_date_dimensions,
    q_string_functions,
    q_table_profile,
)
from spookystuff_spark.queries.sketches import (
    ORACLE_CMS_TOKENS,
    ORACLE_HLL_USERS,
    ORACLE_KMV_OVERLAP,
    ORACLE_KMV_VOCAB,
    ORACLE_SAMPLE_QUANTILES,
    ORACLE_WEIGHTED_SAMPLE,
    q_cms_token_freq,
    q_hll_distinct_users,
    q_kmv_distinct_vocab,
    q_kmv_overlap,
    q_sample_quantiles,
    q_weighted_sample,
)
from spookystuff_spark.queries.text import (
    ORACLE_DOC_PROFILE,
    ORACLE_LANG_DIST,
    q_doc_profile,
    q_lang_distribution,
)
from spookystuff_spark.queries.model_ops import (
    ORACLE_HEAVY_HITTERS,
    q_heavy_hitters_bigrams,
    q_text_classifier,
    q_textrank_keywords,
)
from spookystuff_spark.queries.corpus_ops import (
    ORACLE_LINE_DEDUP,
    ORACLE_TRIANGLES,
    ORACLE_ZORDER,
    q_line_dedup,
    q_triangle_stats,
    q_zorder_key,
)
from spookystuff_spark.queries.graph_ops import (
    ORACLE_CCNET,
    ORACLE_DSIR,
    PAGERANK_CTES,
    PR_ITERS,
    q_ccnet_buckets,
    q_dsir_select,
    q_pagerank_purchases,
)
from spookystuff_spark.queries.lakehouse_q import (
    ORACLE_BLOOM_LOOKUP,
    ORACLE_CDC,
    ORACLE_CMS_VIEW,
    ORACLE_DISTINCT_IVM,
    ORACLE_DV,
    ORACLE_HLL_VIEW,
    ORACLE_IVM,
    ORACLE_PMERGE,
    ORACLE_JOIN_VIEW,
    ORACLE_PCTL_VALUES,
    ORACLE_RENAME,
    ORACLE_RESTORE_IVM,
    ORACLE_TOPK_VALUES,
    ORACLE_SCD2,
    ORACLE_STREAM_INGEST,
    q_bloom_lookup,
    q_cdc_upsert,
    q_cms_view,
    q_distinct_ivm,
    q_dv_delete,
    q_hll_view,
    q_ivm_refresh,
    q_join_agg,
    q_join_distinct,
    q_join_view,
    q_partitioned_merge,
    q_rename_table,
    q_restore_ivm,
    q_scd2_dim,
    q_stream_ingest,
)
from spookystuff_spark.queries.hygiene import (
    ORACLE_DECONTAM_INDEX,
    q_decontam_index,
)
from spookystuff_spark.queries.events import (
    ORACLE_FUNNEL,
    ORACLE_ROLLING_Z,
    ORACLE_TOPPATHS,
    ORACLE_TRANSITIONS,
    ORACLE_GAPFILL_LINEAR,
    ORACLE_GAPFILL_LOCF,
    ORACLE_INTERVAL_JOIN,
    ORACLE_RETENTION,
    q_event_flow,
    q_funnel_retention,
    q_gapfill,
    q_interval_join,
    q_rolling_zscore,
)
from spookystuff_spark.queries.tpch_suites import _melt, _melt_sql

_SCALAR_SQL = f"""
WITH {PAGERANK_CTES},
     prq AS (SELECT node, r AS rank_nano FROM pr{PR_ITERS}),
     sf AS ({ORACLE_STRING_FUNCS}), dd AS ({ORACLE_DATE_DIMS}),
     hll AS ({ORACLE_HLL_USERS}), cms AS ({ORACLE_CMS_TOKENS}),
     kmv AS ({ORACLE_KMV_VOCAB}), sq AS ({ORACLE_SAMPLE_QUANTILES}),
     ws AS ({ORACLE_WEIGHTED_SAMPLE}), tg AS ({ORACLE_TRIANGLES}),
     zo AS ({ORACLE_ZORDER}), cdc AS ({ORACLE_CDC}),
     kvo AS ({ORACLE_KMV_OVERLAP}), ivm AS ({ORACLE_IVM}),
     div AS ({ORACLE_DISTINCT_IVM}), tkv AS ({ORACLE_TOPK_VALUES}),
     pcv AS ({ORACLE_PCTL_VALUES}), rst AS ({ORACLE_RESTORE_IVM}),
     pmg AS ({ORACLE_PMERGE}), dvd AS ({ORACLE_DV}),
     sti AS ({ORACLE_STREAM_INGEST}),
     gfl AS ({ORACLE_GAPFILL_LOCF}), gfi AS ({ORACLE_GAPFILL_LINEAR}),
     fnl AS ({ORACLE_FUNNEL}), ret AS ({ORACLE_RETENTION}),
     blm AS ({ORACLE_BLOOM_LOOKUP}), ivj AS ({ORACLE_INTERVAL_JOIN}),
     scd AS ({ORACLE_SCD2}), tpr AS ({ORACLE_TABLE_PROFILE}),
     trn AS ({ORACLE_TRANSITIONS}), tpp AS ({ORACLE_TOPPATHS}),
     rz AS ({ORACLE_ROLLING_Z}), ren AS ({ORACLE_RENAME}),
     jv AS ({ORACLE_JOIN_VIEW}), dcx AS ({ORACLE_DECONTAM_INDEX}),
     hlv AS ({ORACLE_HLL_VIEW}), cmv AS ({ORACLE_CMS_VIEW})
{_melt_sql(
    "sf",
    "q_string_functions",
    ["c_custkey", "name_upper", "name_prefix", "seg_nation", "name_short",
     "key_padded"],
    ["name_len", "seg_dist"],
)}
UNION ALL {_melt_sql(
    "dd", "q_date_dimensions", ["o_year", "o_quarter", "o_month"],
    ["n_orders", "revenue"],
)}
UNION ALL {_melt_sql(
    "hll", "q_hll_distinct_users", ["event_type"],
    ["est_distinct", "zero_regs"],
)}
UNION ALL {_melt_sql("cms", "q_cms_token_freq", ["term"], ["est"])}
UNION ALL {_melt_sql("kmv", "q_kmv_distinct_vocab", ["lang"], ["est_distinct"])}
UNION ALL {_melt_sql("sq", "q_sample_quantiles", ["grp", "q"], ["value"])}
UNION ALL {_melt_sql("ws", "q_weighted_sample", ["lang", "doc_id"], ["rn"])}
UNION ALL {_melt_sql("prq", "q_pagerank_purchases", ["node"], ["rank_nano"])}
UNION ALL {_melt_sql(
    "tg", "q_triangle_stats", [],
    ["n_nodes", "n_edges", "n_triangles", "n_wedges", "gcc"],
)}
UNION ALL {_melt_sql(
    "zo", "q_zorder_key", ["bucket"], ["n", "min_z", "max_z"],
)}
UNION ALL {_melt_sql(
    "cdc", "q_cdc_upsert", ["doc_id", "lang", "source", "_change"],
    ["n_chars"],
)}
UNION ALL {_melt_sql(
    "kvo", "q_kmv_overlap", ["group_a", "group_b"],
    ["est_a", "est_b", "est_union", "est_intersection", "jaccard",
     "containment_a_in_b"],
)}
UNION ALL {_melt_sql(
    "ivm", "q_ivm_refresh", ["lang"],
    ["n_chars_sum", "n_rows", "n_chars_avg", "n_chars_var"],
)}
UNION ALL {_melt_sql(
    "div", "q_distinct_ivm", ["lang"], ["n_chars_distinct", "n_rows"],
)}
UNION ALL {_melt_sql(
    "tkv", "q_topk_values", ["lang", "rank"], ["n_chars", "_n"],
)}
UNION ALL {_melt_sql("pcv", "q_pctl_values", ["lang", "p"], ["value"])}
UNION ALL {_melt_sql(
    "rst", "q_restore_ivm", ["lang"], ["n_chars_sum", "n_rows"],
)}
UNION ALL {_melt_sql(
    "pmg", "q_partitioned_merge", ["reader", "lang"],
    ["n_chars_sum", "n_rows"],
)}
UNION ALL {_melt_sql(
    "dvd", "q_dv_delete", ["reader", "lang"], ["n_chars_sum", "n_rows"],
)}
UNION ALL {_melt_sql(
    "sti", "q_stream_ingest", ["event_type"], ["value_sum", "n_rows"],
)}
UNION ALL {_melt_sql(
    "gfl", "gapfill_locf", ["k", "bucket_s", "filled"], ["v"],
)}
UNION ALL {_melt_sql(
    "gfi", "gapfill_linear", ["k", "bucket_s", "filled"], ["v"],
)}
UNION ALL {_melt_sql("fnl", "funnel", ["step_idx", "step"], ["n_users"])}
UNION ALL {_melt_sql(
    "ret", "retention", ["cohort_week", "week_offset"], ["n_users"],
)}
UNION ALL {_melt_sql(
    "blm", "q_bloom_lookup", ["doc_id", "lang"], ["n_chars"],
)}
UNION ALL {_melt_sql(
    "ivj", "q_interval_join", ["err_id", "pur_id"], ["gap_s"],
)}
UNION ALL SELECT q, row_key, measure, v_num FROM scd
UNION ALL SELECT q, row_key, measure, v_num FROM tpr
UNION ALL {_melt_sql("trn", "transitions", ["src", "dst"], ["n"])}
UNION ALL {_melt_sql("tpp", "toppaths", ["path"], ["n_sessions", "rank"])}
UNION ALL SELECT q, row_key, measure, v_num FROM rz
UNION ALL {_melt_sql(
    "ren", "q_rename_table", ["reader", "lang"], ["chars_sum", "n_rows"],
)}
UNION ALL {_melt_sql(
    "jv", "q_join_view", ["seg"], ["n_pairs", "sum_price"],
)}
UNION ALL {_melt_sql(
    "jv", "q_join_agg", ["seg"],
    ["n_pairs", "sum_price", "min_price", "max_price", "var_price_c"],
)}
UNION ALL {_melt_sql(
    "jv", "q_join_distinct", ["seg"], ["n_pairs", "distinct_price_c"],
)}
UNION ALL {_melt_sql(
    "dcx", "q_decontam_index", ["doc_id"], ["contaminated_grams"],
)}
UNION ALL {_melt_sql(
    "hlv", "q_hll_view", ["event_type"], ["est_distinct", "zero_regs"],
)}
UNION ALL {_melt_sql("cmv", "q_cms_view", ["term"], ["est"])}"""


@query("q_scalar_suite", oracle=_SCALAR_SQL)
def q_scalar_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the melt re-scans orders/lineitem/customer/events/documents once per
    # constituent; persist the shared base scans for the suite's lifetime
    # (same contract as q_text_suite)
    with shared_scans(
        spark, sf_dir,
        ("orders", "lineitem", "customer", "events", "documents"),
    ):
        return _scalar_suite_parts(spark, sf_dir)


def _scalar_suite_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # thunks, not DataFrames: many constituents BUILD eagerly (index /
    # IVM fold schedules, localCheckpointed results) through sequential
    # small jobs — build_concurrently overlaps those builds (guide §2.6)
    # while the result list (and so the union, and so the rows) keeps
    # the exact serial order
    makers = [
        lambda: _melt(
            q_string_functions(spark, sf_dir),
            "q_string_functions",
            ["c_custkey", "name_upper", "name_prefix", "seg_nation",
             "name_short", "key_padded"],
            ["name_len", "seg_dist"],
        ),
        lambda: _melt(
            q_date_dimensions(spark, sf_dir),
            "q_date_dimensions",
            ["o_year", "o_quarter", "o_month"],
            ["n_orders", "revenue"],
        ),
        lambda: _melt(
            q_hll_distinct_users(spark, sf_dir),
            "q_hll_distinct_users",
            ["event_type"],
            ["est_distinct", "zero_regs"],
        ),
        lambda: _melt(
            q_cms_token_freq(spark, sf_dir), "q_cms_token_freq",
            ["term"], ["est"],
        ),
        lambda: _melt(
            q_kmv_distinct_vocab(spark, sf_dir),
            "q_kmv_distinct_vocab",
            ["lang"],
            ["est_distinct"],
        ),
        lambda: _melt(
            q_sample_quantiles(spark, sf_dir),
            "q_sample_quantiles",
            ["grp", "q"],
            ["value"],
        ),
        lambda: _melt(
            q_weighted_sample(spark, sf_dir),
            "q_weighted_sample",
            ["lang", "doc_id"],
            ["rn"],
        ),
        lambda: _melt(
            q_pagerank_purchases(spark, sf_dir),
            "q_pagerank_purchases",
            ["node"],
            ["rank_nano"],
        ),
        lambda: _melt(
            q_triangle_stats(spark, sf_dir),
            "q_triangle_stats",
            [],
            ["n_nodes", "n_edges", "n_triangles", "n_wedges", "gcc"],
        ),
        lambda: _melt(
            q_zorder_key(spark, sf_dir),
            "q_zorder_key",
            ["bucket"],
            ["n", "min_z", "max_z"],
        ),
        lambda: _melt(
            q_cdc_upsert(spark, sf_dir),
            "q_cdc_upsert",
            ["doc_id", "lang", "source", "_change"],
            ["n_chars"],
        ),
        lambda: _melt(
            q_kmv_overlap(spark, sf_dir),
            "q_kmv_overlap",
            ["group_a", "group_b"],
            ["est_a", "est_b", "est_union", "est_intersection", "jaccard",
             "containment_a_in_b"],
        ),
        lambda: _melt(
            q_ivm_refresh(spark, sf_dir),
            "q_ivm_refresh",
            ["lang"],
            ["n_chars_sum", "n_rows", "n_chars_avg", "n_chars_var"],
        ),
        # q_distinct_ivm returns melt-shaped rows (distinct agg +
        # exact top-k heavy hitters from the same support Z-set)
        lambda: q_distinct_ivm(spark, sf_dir),
        lambda: _melt(
            q_restore_ivm(spark, sf_dir),
            "q_restore_ivm",
            ["lang"],
            ["n_chars_sum", "n_rows"],
        ),
        lambda: _melt(
            q_partitioned_merge(spark, sf_dir),
            "q_partitioned_merge",
            ["reader", "lang"],
            ["n_chars_sum", "n_rows"],
        ),
        lambda: _melt(
            q_dv_delete(spark, sf_dir),
            "q_dv_delete",
            ["reader", "lang"],
            ["n_chars_sum", "n_rows"],
        ),
        lambda: _melt(
            q_stream_ingest(spark, sf_dir),
            "q_stream_ingest",
            ["event_type"],
            ["value_sum", "n_rows"],
        ),
        # q_gapfill / q_funnel_retention already return melt-shaped rows
        lambda: q_gapfill(spark, sf_dir),
        lambda: q_funnel_retention(spark, sf_dir),
        lambda: _melt(
            q_bloom_lookup(spark, sf_dir),
            "q_bloom_lookup",
            ["doc_id", "lang"],
            ["n_chars"],
        ),
        lambda: _melt(
            q_interval_join(spark, sf_dir),
            "q_interval_join",
            ["err_id", "pur_id"],
            ["gap_s"],
        ),
        # q_scd2_dim already returns melt-shaped rows (scd2dim + scd2asof)
        lambda: q_scd2_dim(spark, sf_dir),
        lambda: q_table_profile(spark, sf_dir),
        lambda: _melt(
            q_rename_table(spark, sf_dir),
            "q_rename_table",
            ["reader", "lang"],
            ["chars_sum", "n_rows"],
        ),
        # q_event_flow / q_rolling_zscore return melt-shaped rows
        lambda: q_event_flow(spark, sf_dir),
        lambda: q_rolling_zscore(spark, sf_dir),
        lambda: _melt(
            q_join_view(spark, sf_dir),
            "q_join_view",
            ["seg"],
            ["n_pairs", "sum_price"],
        ),
        lambda: _melt(
            q_join_agg(spark, sf_dir),
            "q_join_agg",
            ["seg"],
            ["n_pairs", "sum_price", "min_price", "max_price",
             "var_price_c"],
        ),
        lambda: _melt(
            q_join_distinct(spark, sf_dir),
            "q_join_distinct",
            ["seg"],
            ["n_pairs", "distinct_price_c"],
        ),
        lambda: _melt(
            q_hll_view(spark, sf_dir),
            "q_hll_view",
            ["event_type"],
            ["est_distinct", "zero_regs"],
        ),
        lambda: _melt(
            q_cms_view(spark, sf_dir), "q_cms_view", ["term"], ["est"],
        ),
        lambda: _melt(
            q_decontam_index(spark, sf_dir),
            "q_decontam_index",
            ["doc_id"],
            ["contaminated_grams"],
        ),
    ]
    return reduce(DataFrame.unionByName, build_concurrently(makers, spark))


@bench_only("q_bpe_tokens")
def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a 64-merge BPE vocabulary on the corpus's own word table, then
    encode the corpus (operators/bpe.py). Output: per-doc word + BPE token
    counts; gate-pinned (with the learned merge table) via q_text_suite."""
    from spookystuff_spark.operators.bpe import fit_encode

    docs = table(spark, sf_dir, "documents")
    _, counts = fit_encode(docs, n_merges=64)
    return counts


def _bpe_melted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.operators.bpe import fit_encode

    docs = table(spark, sf_dir, "documents")
    merges, counts = fit_encode(docs, n_merges=64)
    merge_rows = spark.createDataFrame(
        [
            ("q_bpe_merges", f"{i}|{a}|{b}", "rank", float(i))
            for i, (a, b) in enumerate(merges)
        ],
        "q string, row_key string, measure string, v_num double",
    )
    count_rows = _melt(
        counts, "q_bpe_counts", ["doc_id"], ["n_words", "n_bpe_tokens"]
    )
    return merge_rows.unionByName(count_rows)


_TEXT_SQL = f"""
WITH dp AS ({ORACLE_DOC_PROFILE}), ld AS ({ORACLE_LANG_DIST}),
     li AS ({ORACLE_LANG_ID}), tf AS ({ORACLE_TOKEN_FREQ}),
     hh AS ({ORACLE_HEAVY_HITTERS}), cc AS ({ORACLE_CCNET}),
     ds AS ({ORACLE_DSIR}), lde AS ({ORACLE_LINE_DEDUP})
{_melt_sql(
    "dp", "q_doc_profile", ["doc_id"],
    ["len_chars", "n_tokens", "bpe_tokens", "punct_ratio", "quality",
     "mean_word_len", "alpha_word_frac", "dup_line_frac", "gopher_pass"],
)}
UNION ALL {_melt_sql(
    "ld", "q_lang_distribution", ["lang", "source"],
    ["n_docs", "avg_chars", "max_chars", "n_trigrams"],
)}
UNION ALL {_melt_sql(
    "li", "q_lang_id_heuristic", ["labeled_lang", "detected_lang"], ["n_docs"],
)}
UNION ALL {_melt_sql("tf", "q_token_freq_topk", ["tok"], ["n"])}
UNION ALL {_melt_sql("hh", "q_heavy_hitters_bigrams", ["tok"], ["n", "rank"])}
UNION ALL {_melt_sql(
    "cc", "q_ccnet_buckets", ["doc_id", "lang", "bucket"], ["score"],
)}
UNION ALL {_melt_sql("ds", "q_dsir_select", ["doc_id"], ["logw"])}
UNION ALL {_melt_sql(
    "lde", "q_line_dedup", ["doc_id", "clean_md5"],
    ["n_lines", "n_kept", "n_dropped"],
)}
UNION ALL SELECT q, row_key, measure, v_num FROM read_parquet(
  '/root/repo/fixtures/golden/{GOLDEN_SF}/q_bpe_melt.parquet')
UNION ALL SELECT q, row_key, measure, v_num FROM read_parquet(
  '/root/repo/fixtures/golden/{GOLDEN_SF}/q_classifier_melt.parquet')
UNION ALL SELECT q, row_key, measure, v_num FROM read_parquet(
  '/root/repo/fixtures/golden/{GOLDEN_SF}/q_textrank_melt.parquet')
UNION ALL SELECT q, row_key, measure, v_num FROM read_parquet(
  '/root/repo/fixtures/golden/{GOLDEN_SF}/q_media_melt.parquet')"""


@query("q_text_suite", oracle=_TEXT_SQL)
def q_text_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    with shared_scans(spark, sf_dir, ("documents",)):
        return _text_suite_parts(spark, sf_dir)


def _text_suite_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # thunks: BPE training and the media fingerprints build eagerly —
    # overlap them with the lazy constituents' plan construction
    # (guide §2.6); submission order == the serial union order
    makers = [
        lambda: _melt(
            q_doc_profile(spark, sf_dir),
            "q_doc_profile",
            ["doc_id"],
            ["len_chars", "n_tokens", "bpe_tokens", "punct_ratio", "quality",
             "mean_word_len", "alpha_word_frac", "dup_line_frac",
             "gopher_pass"],
        ),
        lambda: _melt(
            q_lang_distribution(spark, sf_dir),
            "q_lang_distribution",
            ["lang", "source"],
            ["n_docs", "avg_chars", "max_chars", "n_trigrams"],
        ),
        lambda: _melt(
            q_lang_id_heuristic(spark, sf_dir),
            "q_lang_id_heuristic",
            ["labeled_lang", "detected_lang"],
            ["n_docs"],
        ),
        lambda: _melt(
            q_token_freq_topk(spark, sf_dir), "q_token_freq_topk",
            ["tok"], ["n"],
        ),
        lambda: _melt(
            q_heavy_hitters_bigrams(spark, sf_dir),
            "q_heavy_hitters_bigrams",
            ["tok"],
            ["n", "rank"],
        ),
        lambda: _melt(
            q_ccnet_buckets(spark, sf_dir),
            "q_ccnet_buckets",
            ["doc_id", "lang", "bucket"],
            ["score"],
        ),
        lambda: _melt(
            q_dsir_select(spark, sf_dir), "q_dsir_select",
            ["doc_id"], ["logw"],
        ),
        lambda: _melt(
            q_line_dedup(spark, sf_dir),
            "q_line_dedup",
            ["doc_id", "clean_md5"],
            ["n_lines", "n_kept", "n_dropped"],
        ),
        lambda: _melt(
            q_text_classifier(spark, sf_dir),
            "q_text_classifier",
            ["doc_id"],
            ["prob", "pred"],
        ),
        lambda: _melt(
            q_textrank_keywords(spark, sf_dir),
            "q_textrank_keywords",
            ["tok"],
            ["rank", "rank_pos"],
        ),
        lambda: _bpe_melted(spark, sf_dir),
        lambda: _media_melted_rows(spark, sf_dir),
    ]
    return reduce(DataFrame.unionByName, build_concurrently(makers, spark))


def _media_melted_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from spookystuff_spark.queries.media import (
        audio_melted,
        media_melted,
        video_melted,
    )

    return (
        media_melted(spark, sf_dir)
        .unionByName(audio_melted(spark, sf_dir))
        .unionByName(video_melted(spark, sf_dir))
    )


# the BPE rows are pinned by a GOLDEN_SF parquet — q_text_suite must be
# compared at the gate SF like the other golden-oracled queries
GOLDEN_QUERIES.add("q_text_suite")


# bench.py publishes these so suite-time growth from ADDED constituents is
# visible in the BENCH json (see queries/__init__.py register_suite)
from spookystuff_spark.queries import register_suite  # noqa: E402

register_suite(
    "q_scalar_suite",
    {
        **{
            c: c
            for c in [
                "q_string_functions", "q_date_dimensions",
                "q_hll_distinct_users", "q_cms_token_freq",
                "q_kmv_distinct_vocab", "q_sample_quantiles",
                "q_weighted_sample", "q_pagerank_purchases",
                "q_triangle_stats", "q_zorder_key", "q_cdc_upsert",
                "q_kmv_overlap", "q_ivm_refresh", "q_distinct_ivm",
                "q_restore_ivm", "q_partitioned_merge",
                "q_dv_delete", "q_stream_ingest",
            ]
        },
        # exact top-k heavy hitters + exact percentiles ride the distinct
        # support table, timed by the single q_distinct_ivm bench entry
        "q_topk_values": "q_distinct_ivm",
        "q_pctl_values": "q_distinct_ivm",
        # resample + gap-fill rides under one melt row per fill method,
        # both timed by the single q_gapfill bench entry
        "gapfill_locf": "q_gapfill",
        "gapfill_linear": "q_gapfill",
        # funnel reach + weekly retention cells, timed by q_funnel_retention
        "funnel": "q_funnel_retention",
        "retention": "q_funnel_retention",
        "q_bloom_lookup": "q_bloom_lookup",
        "q_interval_join": "q_interval_join",
        # SCD-2 history + as-of labels, both timed by q_scd2_dim
        "scd2dim": "q_scd2_dim",
        "scd2asof": "q_scd2_dim",
        "q_table_profile": "q_table_profile",
        "transitions": "q_event_flow",
        "toppaths": "q_event_flow",
        "q_rolling_zscore": "q_rolling_zscore",
        "q_rename_table": "q_rename_table",
        "q_join_view": "q_join_view",
        "q_join_agg": "q_join_agg",
        "q_join_distinct": "q_join_distinct",
        "q_decontam_index": "q_decontam_index",
        "q_hll_view": "q_hll_view",
        "q_cms_view": "q_cms_view",
    },
)
register_suite(
    "q_text_suite",
    {
        **{
            c: c
            for c in [
                "q_doc_profile", "q_lang_distribution",
                "q_lang_id_heuristic", "q_token_freq_topk",
                "q_heavy_hitters_bigrams", "q_ccnet_buckets",
                "q_dsir_select", "q_line_dedup", "q_text_classifier",
                "q_textrank_keywords",
            ]
        },
        # BPE rides the suite under two melt aliases, both timed by
        # the single q_bpe_tokens bench entry
        "q_bpe_merges": "q_bpe_tokens",
        "q_bpe_counts": "q_bpe_tokens",
        # image pHash rides under two aliases (hashes + near-dup pairs),
        # both timed by q_image_phash
        "phash": "q_image_phash",
        "phashpairs": "q_image_phash",
        # audio fingerprints likewise, timed by q_audio_fingerprint
        "afp": "q_audio_fingerprint",
        "afppairs": "q_audio_fingerprint",
        # per-frame video hashes + video pairs, timed by q_video_neardup
        "vfp": "q_video_neardup",
        "vfppairs": "q_video_neardup",
    },
)
