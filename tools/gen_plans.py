#!/usr/bin/env python3
"""Regenerate PLANS.md: formatted physical plans of headline queries with
scale commentary. Run from the repo root."""
import re
import sys

sys.path.insert(0, ".")

COMMENTARY = {
    "q1_pricing_summary": "One parquet scan with pushed date filter and 7-column pruning; partial (map-side) HashAggregate before the single exchange; whole-stage codegen end to end. At 100 TB this is scan-bound — no plan change needed.",
    "q3_shipping_priority": "Customer and the filtered orders side broadcast; the only real exchange is lineitem's aggregate shuffle. Top-10 runs as TakeOrderedAndProject — no global sort materialization.",
    "q5_local_supplier_volume": "All five dimensions broadcast — the lineitem⋈orders shuffle is the only wide dependency. Region filter prunes nation/customer before they reach the probe side.",
    "q_events_sessionize": "Single exchange on user_id shared by the lag window and the final aggregate (Catalyst reuses the partitioning); everything after the scan is window + codegen'd projections.",
    "q_dedup_exact": "md5 computed in the scan projection (16-byte shuffle key instead of full text); partial aggregate collapses within-partition duplicates before the exchange.",
    "q_knn_cosine_bruteforce": "Query vectors broadcast (BroadcastNestedLoopJoin); cosine evaluated JVM-side via higher-order functions; per-query top-k via window on a 10-partition key.",
    "q_decontaminate_13gram": "13-gram keys are xxhash64 over token slices — computed inside the scan-side codegen stage, no gram string ever built. The (small) benchmark gram set is broadcast into a left-semi BroadcastHashJoin; the corpus gram stream's only exchange is the final per-doc count.",
    "q_dup_span_docs": "Exactly two exchanges of the distinct (doc, gram-key) pair set: one on gram_key for the doc-frequency window, one for the per-doc aggregate. No self-join — cost is O(corpus grams), not O(pairs²).",
    "q_char_trigram_logprob": "The explode carries only a position index (the trigram substring is cut post-explode inside codegen — no per-row string array); the per-character stream is collapsed map-side by the partial aggregate (the exchange carries distinct (doc, gram) pairs); the alphabet-bounded gram model and the corpus total both return via BroadcastHashJoin; zero Python stages, no per-gram window sort.",
    "q_mixture_sample": "Deterministic md5-draw sampling evaluates entirely inside the scan stage's codegen Filter — the only exchange below is the gate-determinism orderBy of the registered query; the operator itself is exchange-free (pinned by test_mixture_sample_is_scan_stage_only) and composes with partition pruning at 100 TB.",
    "q_semdedup_prune": "Two Python stages only: the k-means assignment (MapInPandas, carrying each vector so no re-join shuffle is needed) feeding the per-cell greedy prune (FlatMapGroupsInPandas) — the single wide op is the cell groupBy, and pairwise work is bounded per cell, never all-pairs.",
    "q_retrieval_bm25": "The query-term filter is a broadcast LEFT-SEMI join against the RAW token stream — the full inverted index is never built, and the only term-level exchange carries matching postings. Per-term df is computed for query terms only (broadcasting whole-vocabulary df would be the classic scale bug); N/avgdl come from the doc-length frame. Top-k is a bounded window per query_id.",
    "q_pack_sequences": "Pure integer plan: one exchange for the shard window (cumulative token sum), then sequence()+explode generates boundary-crossing spans inside codegen. Shards are independent — at 100 TB the window partitions by uniform hash shard, so no global sort and no skew.",
    "q_train_split": "Split assignment is a scan-stage md5 expression (no exchange at all before the summary aggregate) — the operator composes with partition pruning and never reshuffles the corpus.",
    "q_kmeans_assign": "Per iteration: one MapInPandas emitting PRE-AGGREGATED (cluster, dim) partial sums — the shuffle is O(k·d·batches), never O(rows) — and an O(k·d) driver collect. Final pass is a single Arrow stage. Int64-quantized sums make the result identical under any partitioning.",
    "q_warc_doc_stats": "binaryFile scan lists archives on executors; ONE MapInPandas parses records (file = parallelism unit, zero shuffle); title/link profiling is codegen'd regex downstream.",
    "q_heavy_hitters_bigrams": "The sketch pass (MapInPandas Misra-Gries, O(n_counters) memory, zero shuffle) collapses the bigram universe to a candidate frame; the exact recount probes it via a broadcast LEFT-SEMI hash join inside the scan stage (an isin literal list of tens of thousands of entries would stall codegen), so the groupBy exchange carries at most |candidates| keys regardless of corpus vocabulary.",
    "q_text_classifier": "Scoring pass over the once-checkpointed hashed-BoW features (the Scan ExistingRDD): one narrow Arrow stage, no exchange. Training already ran as 5 shuffle-FREE ridge-IRLS jobs: each partition ships its int64-quantized gradient+Hessian as one packed sparse blob (bounded by feature co-occurrence, never row count) and the driver scatter-adds them — bit-identical under any partitioning.",
    "q_leakage_split": "The corpus side never shuffles: its split is a scan-stage md5 expression, and the cluster override (components of the near-dup pair list) arrives via BroadcastHashJoin. The only wide work belongs to the minhash pair derivation upstream.",
    "q_dupspan_removal": "One gram-key exchange (doc-frequency window, same as the measurement ops), one bounded coverage groupBy, one left-anti BroadcastHashJoin removing covered tokens, one ordered rebuild aggregate — all codegen, no Python, no pair explosion.",
    "q_cluster_balanced_sample": "Cap-per-cell is a single window pass ordered by the deterministic md5 draw; the k-means assignment stage carries its vectors (no re-join). Per-cell quota keeps the output bounded whatever the cell skew.",
    "q_bpe_tokens": "The only corpus-sized job is the word-frequency groupBy (map-side combined, explode never crosses an exchange); merges train on the bounded table driver-side; encoding is one Arrow stage with per-word memoization.",
    "q_hll_distinct_users": "Two exchanges, both cardinality-bounded: the register groupBy carries at most groups x 4096 rows regardless of distinct-user count (map-side max partials collapse everything else in the scan stage), and the finisher aggregates 4096-row groups. All md5/conv/bin arithmetic stays in codegen — no Python stage anywhere.",
    "q_cms_token_freq": "The sketch groupBy shuffles at most depth x width = 4096 keys no matter the vocabulary (the explode-by-depth happens inside the scan stage and partial counts collapse map-side). The probe side joins the sketch via BroadcastHashJoin, so point queries never shuffle.",
    "q_kmv_distinct_vocab": "The (lang, hash) aggregation collapses duplicate tokens map-side; the window pass then ranks only distinct hashes, and only the k smallest per group feed the estimator — no count(DISTINCT) expansion, no second scan.",
    "q_sample_quantiles": "The per-group count join is a BroadcastHashJoin, the hash-fraction sample filter runs in the scan stage, so the only sort (the rank window) sees ~cap rows per group, never the fact table; quantile targets re-enter via a second broadcast join.",
    "q_textrank_keywords": "The corpus is scanned once to build co-occurrence edge counts (map-side combined, bigram-vocab key space); every PageRank iteration afterwards joins the vocab-sized rank table to the checkpointed edge list — the visible plan reads materialized checkpoint blocks, not a 10-deep join tree, and the quantized decimal sums keep the ranks bit-identical under any layout.",
    "q_weighted_sample": "The exponential-race key (md5 fraction, ln, divide by weight) is pure scan-stage codegen; the single exchange is the group-key rank window, and rn <= k prunes before anything else consumes the result — per-group top-k cost, no full sort of the corpus.",
    "q_pagerank_purchases": "The visible plan reads the final rank checkpoint: upstream, the degree-annotated edge table was hash-partitioned ONCE (cached, reused by all 8 iterations with no re-exchange — node ids ride as longs, labels minted on the node-cardinality output only), and each iteration cost one no-exchange join plus one partial-aggregated contribution shuffle. Rank state is never broadcast or collected.",
    "q_triangle_stats": "Degree-oriented edge iterator: out-degree bounded by O(sqrt m), adjacency lists grouped once, and triangles counted per edge via whole-stage-codegen array_intersect of the two endpoints' out-neighbor arrays — the O(m^1.5) intersection work never materializes a wedge row into a shuffle. Basket-local pair expansion builds the co-purchase edges without a lineitem self-join.",
    "q_zorder_key": "The Morton interleave is one long codegen expression in the scan projection (no UDF, no shuffle before the bucket aggregate); the same expression string is what zorder_write feeds repartitionByRange for the clustered layout.",
    "q_line_dedup": "First-occurrence selection is a map-side-combined min(struct) aggregate keyed on the line (a million-copy boilerplate line costs the exchange one row per map task); the join-back is AQE-skew-splittable; doc rebuild is one ordered aggregate. Blank lines never enter the dedup key space.",
    "q_ccnet_buckets": "Rides the shared trigram-LM plan (see q_char_trigram_logprob); the tercile cut is one ntile window per language over quantized scores — rank-only, nothing wide materializes per partition.",
    "q_cdc_upsert": "The visible plan reads the eagerly-checkpointed diff (the temp versioned table is already reclaimed). Upstream: two scan-shaped snapshot writes, a MERGE (anti-join on broadcast update keys + union), and one full-outer key join between two immutable snapshots — the diff output is bounded by changed rows, never table size.",
    "q_dv_delete": "Checkpointed aggregate over a DV table read twice (native manifest scan + spooky_versioned Arrow reader). Upstream cost: the delete wrote ONLY the deleted keys' vector (O(deleted), zero data files); each reader applies the vector as one broadcast-able anti-join. At 100 TB deletes stay metadata-sized until a compaction materializes them.",
    "q_partitioned_merge": "Checkpointed per-language aggregates through two readers of the merged table. Upstream: the MERGE read only the touched partitions' files (manifest pruning), applied the deletion vector to that slice during its rewrite, and carried untouched partitions + the shrunken vector by reference — O(touched + deleted), never O(table).",
    "q_ivm_refresh": "Checkpointed read of the derived table. Upstream: three incremental folds, each reading ONLY that commit's change feed (insert/postimage +, preimage/delete −) joined full-outer against the TOUCHED BUCKETS of the hash-bucketed derived table (untouched buckets carry through the manifest delta by reference) — the source is never rescanned and the rewrite is O(touched buckets), the two properties that keep refresh O(changed rows) at 100 TB. The table also folds SUM(c²) in exact decimal; read-time avg/variance derive from the accumulators.",
    "q_distinct_ivm": "Checkpointed read of the COUNT(DISTINCT) support Z-set: one row per live (group, value) pair with its multiplicity, bucket-laid-out by the group key. Each fold groupBys the change feed to signed pair deltas and full-outer folds them into ONLY the touched buckets; a pair leaves the support set at multiplicity zero, so deletes never rescan the source — the construction that keeps exact distinct counts incremental for any feed mix. The read is one O(support) groupBy (count of non-NULL support rows per group).",
    "q_lsh_index": "Checkpointed probe of the persistent MinHash-LSH index: band rows live in band-hash buckets, signatures in id-hash buckets — a probe joins its own band hashes against only the buckets they hash into (manifest-pruned), verifies candidates with zip_with/aggregate Jaccard JVM-side, and the standing corpus's rows outside those buckets are never listed or opened. Maintenance folds each source version's change feed as one O(batch) signature pass + O(batch) partitioned appends; deletes fold as key vectors on both tables.",
    "q_stream_ingest": "Checkpointed read of the IVM-derived table after a real Structured Streaming run: three file-trigger micro-batches through the exactly-once upsert sink, refresh riding each batch's feed. Per batch: one anti-join + union snapshot write and one feed-sized fold — the stream never rescans the table it builds.",
    "q_image_phash": "The synth→decode→pHash Arrow stages sit behind the eager (id, hash) checkpoint (Scan ExistingRDD — they run exactly once for the four consumers). The candidate search is a band-equality ShuffledHashJoin/SortMergeJoin over 8-per-image band rows with the oversized-bucket list arriving via a broadcast LEFT-ANTI join; verification is codegen bit_count(XOR). No CartesianProduct anywhere — plan-asserted.",
    "q_audio_fingerprint": "Identical join shape to q_image_phash (the banded Hamming join is hash-agnostic); upstream the WAV synth + PCM decode + 9x9 FFT fingerprint run as one narrow Arrow stage per partition, pinned once by the checkpoint.",
    "q_video_neardup": "Per-frame hashes explode 1→N inside the same Arrow stage as the Y4M frame walk; frame identity packs to one long (video*1024+frame, codegen overflow guard), so the frame-level search IS the banded join, and the video verdict is one count_distinct aggregate over surviving frame pairs — never all-(videos²) or all-(frames²).",
    "q_fuzzy_join": "Trigram blocking keys (padded substrings + length-band keys) generate in scan-stage codegen; the oversized-block list broadcasts into a LEFT-ANTI join; candidates meet in a block-equality join, dedup once, then the length prefilter and the exact JVM levenshtein verify run in codegen. Hex alphabet note: 4096 trigram values keep blocks ~n/4096 (bigrams would be ~n/256 — near-quadratic candidates).",
    "q_kmv_overlap": "One corpus aggregation builds every group's sketch (map-side combined (group, hash) distinct + k-bounded rank window); the pairwise stage consumes only the groups x k sketch table and broadcasts it into the groups² comparison — array_union/intersect/slice all codegen, the corpus is scanned exactly once.",
    "q_ann_index": "Checkpointed melt of the incrementally-maintained IVF index. Upstream: the build laid the corpus out by quantizer cell (one Arrow assignment stage + partitionBy write), the refresh assigned ONLY the change-feed batch and merged through the O(touched-cells) partitioned upsert, and each query read ONLY its nprobe cells' files via manifest pruning before a query-broadcast cosine + per-query rank window — the index is never shuffled at query time.",
    "q_bm25_index": "Checkpointed top-k from the bucket-partitioned postings index. Upstream: build/refresh tokenize once and commit O(batch) appends (every parent file carried by manifest reference); the probe read only the query terms' buckets (manifest pruning), df came from a broadcast semi-join inside that slice, N/avgdl from the manifest — no corpus scan, no full-index exchange, top-k as a bounded per-query window.",
    "q_gapfill": "Both fill methods ride ONE localCheckpoint-pinned rollup (Scan ExistingRDD): the bucket aggregate is the only corpus-sized exchange; the per-key spine (min/max + sequence/explode), the spine⋈values join and the LOCF/linear windows all reuse the user_id partitioning — integer epoch buckets keep every expression in codegen, zero Python stages.",
    "q_funnel_retention": "The funnel is k chained filter→join→min-aggregate passes all keyed on user_id (AQE broadcasts the shrinking reached-set side); no window over the raw event stream and no per-user event-list aggregation, so a power user costs min(ts), not a sort. Retention: two exchanges — first-event per user, then the (cohort, offset) distinct-count cell aggregate.",
    "q_bloom_lookup": "Each probe plans from the manifest + tiny bloom sidecars: only maybe-present files reach the scan (here 1-2 of 8), the equality filter pushes into the parquet scan of those files, and deletion vectors would apply as a broadcast anti-join. The build was one Arrow applyInPandas keyed by file over JVM-computed hashes — one shuffle, no per-row Python hashing.",
    "q_interval_join": "The overlap predicate NEVER reaches the join condition: both sides explode onto fixed-width time buckets inside codegen and meet in an equi-join on (user_id, bucket) — the plan a raw interval inequality can't get (Catalyst would emit BroadcastNestedLoopJoin). The report-once filter (bucket == floor(greatest(starts)/w)) dedups shared-bucket matches locally, so no distinct shuffle follows; plan-asserted BNLJ-free in tests/test_intervals.py.",
    "q_rename_table": "Checkpointed aggregate over a RENAMED column read two ways. Upstream: the rename commit wrote ONE manifest (zero data IO); the native reader scanned with the files' physical schema and presented the logical name, the Arrow DataSource translated per batch through the colmap, and the post-rename DV delete anti-joined on the logical view — metadata-only schema evolution with every reader agreeing.",
    "q_event_flow": "Transitions: one lead-window on the user key feeding a map-side-combined pair count — two exchanges total, no event-list materialization. Paths: the session id (lag+cumsum) and the per-session rank ride the SAME user-key sort, the length cap filters BEFORE the ordered collect (per-session memory bounded), and the final rank is over the already-tiny path-count table.",
    "q_rolling_zscore": "One exchange (the user key), then the trailing ROWS-frame mean/stddev/z all evaluate in a single Window operator over one sort — no self-join, no second pass; the whole expression tree below the window is codegen.",
    "q_table_profile": "The profile is ONE wide aggregate job collapsing map-side into a single row (the visible plan is the local result frame): null counts and min/max/mean are plain partial aggregates; the exact distinct counts add Spark's EXPAND rewrite — the documented, deliberate cost of exact ANALYZE, with the KMV/HLL sketches as the wide-table alternative.",
    "q_scd2_dim": "Checkpointed melt of the SCD-2 history + as-of labels. Upstream: each batch folds via the versioned MERGE keyed on (k, valid_from) with the tiny delta side broadcast (attr-identical updates hash-compare to a no-op and commit NOTHING); the as-of label join is an equi-join on the dimension key followed by the [valid_from, valid_to) validity filter — per-key version counts are small, so no inequality-only plan and no skew.",
    "q_join_view": "Checkpointed aggregate over the counted (Z-set) join view's consolidation. Upstream: the seed joined the pinned snapshots once; every later fold read ONLY the two change feeds, probed each snapshot side at the delta's keys (manifest-pruned read_table_partitions when laid out by the key, capped driver pull, semi-join scan above the cap), multiplied signed multiplicities, and appended an O(delta) consolidated batch with an O(batch) delta manifest — the sources are never re-joined, and the dim-side DV delete folds as -1 rows that cancel in the consolidation groupBy.",
    "q_join_agg": "Checkpointed read of the composed view gamma(A JOIN B) — maintained with the SAME delta machinery as q_join_view but never materializing the join: the seed aggregates the raw join directly (no full-width counted groupBy), each fold aggregates the signed join delta to (group, sum, sumsq, min/max, count) partials, and the merge is a union-then-groupBy against ONLY the touched buckets of the keyed table (untouched buckets carry by reference). Per refresh: O(delta + touched buckets); the fact and dim tables are touched only at the probed slices; retracted groups' extremes re-derive from the pinned snapshots.",
}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from spookystuff_spark.queries import (
        EXTRA_BENCH,
        QUERIES,
        load_all_query_modules,
    )

    load_all_query_modules()
    ALL = {**QUERIES, **EXTRA_BENCH}
    out = [
        "# PLANS — physical plans of headline queries (sf0.01, AQE on)\n",
        "Generated by `python tools/gen_plans.py`. What to look for: PushedFilters on",
        "every scan, pruned ReadSchema, broadcast joins on dimensions, partial",
        "aggregates before exchanges, zero Python stages in native queries.\n",
    ]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, comment in COMMENTARY.items():
        df = ALL[name](spark, "/root/testdata/sf0.01")
        plan = df._jdf.queryExecution().explainString(mode)
        plan = re.sub(r"file:[^,\]\s]*", "file:<testdata>", plan)
        plan = re.sub(r"#\d+L?", "", plan)
        out.append(f"\n## {name}\n\n{comment}\n\n```\n{plan.strip()}\n```\n")
    open("PLANS.md", "w").write("\n".join(out))
    print("PLANS.md regenerated")


if __name__ == "__main__":
    main()
