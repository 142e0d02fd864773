"""Queries exercising the engine's own operators (explore BFS, fetch over
file://, doc selectors) against the driver corpus. SQL-expressible ones carry
an oracle; agent-side ones (directory fetch) are rows-only.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from spookystuff_spark.queries import golden_oracle, query
from spookystuff_spark.tables import table


@query(
    "q_explore_hierarchy_bfs",
    oracle="""
    SELECT 'region:' || CAST(r_regionkey AS VARCHAR) AS node, 0 AS depth FROM region
    UNION ALL
    SELECT 'nation:' || CAST(n_nationkey AS VARCHAR), 1 FROM nation
    UNION ALL
    SELECT 'customer:' || CAST(c_custkey AS VARCHAR), 2 FROM customer
    """,
)
def q_explore_hierarchy_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS closure over the region→nation→customer hierarchy using the
    engine's iterative traversal loop (plans/explore.py skeleton). The oracle
    is the closed-form of the same closure — verifying min-depth BFS semantics
    relationally."""
    from spookystuff_spark.operators.graph import bfs

    region = table(spark, sf_dir, "region")
    nation = table(spark, sf_dir, "nation")
    customer = table(spark, sf_dir, "customer")

    e1 = nation.select(
        F.concat(F.lit("region:"), F.col("n_regionkey").cast("string")).alias("src"),
        F.concat(F.lit("nation:"), F.col("n_nationkey").cast("string")).alias("dst"),
    )
    e2 = customer.select(
        F.concat(F.lit("nation:"), F.col("c_nationkey").cast("string")).alias("src"),
        F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("dst"),
    )
    edges = e1.unionByName(e2)
    seeds = region.select(
        F.concat(F.lit("region:"), F.col("r_regionkey").cast("string")).alias("node")
    )
    return bfs(edges, seeds, max_depth=4).select(
        "node", F.col("depth").cast("int").alias("depth")
    )


@query(
    "q_explore_agent_linkgraph", oracle=golden_oracle("q_explore_agent_linkgraph")
)
def q_explore_agent_linkgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The agent ExplorePlan itself (plans/explore.py — fetch-driven BFS with
    trace dedup and min-(depth, path) PathPlanning), not the relational twin:
    crawls the committed fixtures/linkgraph corpus (deterministic closed-form
    edge rule incl. diamonds and duplicate links) from p0 via Wget + S("a")
    .hrefs expansion. Oracle: golden parquet from an independent pure-python
    BFS closure (tools/gen_linkgraph.py) with ExploreIT.scala:23-67 semantics
    — depth + ordinal columns, min-depth wins, seed ordinal NULL.
    ``epoch_depths=2`` (ref epochInterval, SpookyConf.scala:63) walks two
    depth levels per Arrow stage and reconciles globally between epochs, so
    this one query exercises BOTH the batched in-partition walker and the
    cross-epoch min-(depth, path) merge — and halves the per-epoch job
    overhead vs one-shuffle-per-depth (pinned identical by
    test_epoch_batched_ordinal_parity_on_linkgraph)."""
    import os

    from spookystuff_spark.actions import Wget
    from spookystuff_spark.context import SpookyContext
    from spookystuff_spark.functions.extractors import S

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
        "linkgraph",
    )
    sctx = SpookyContext(spark)
    dv = sctx.create(
        spark.createDataFrame([{"seed": f"file://{root}/p0.html"}])
    )
    out = dv.explore(
        Wget("{seed}"),
        expand=S("a").hrefs,
        depth_field="depth",
        range=(0, 3),
        ordinal_field="ordinal",
        epoch_depths=2,
    )
    return (
        out.select(uri=S.uri)
        .to_df()
        .select(
            F.regexp_extract(F.col("uri"), r"([^/]+)$", 1).alias("page"),
            F.col("depth").cast("int").alias("depth"),
            F.col("ordinal").cast("int").alias("ordinal"),
        )
    )


@query("q_warc_doc_stats", oracle=golden_oracle("q_warc_doc_stats"))
def q_warc_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC/1.0 archive source (sources/warc.py): parse the committed fixture
    archives (one plain, one gzip) with the binaryFile→mapInPandas reader and
    profile each response record natively (title regex, link count). Oracle:
    construction-truth golden from tools/gen_warc.py — the writer's params,
    independent of the parser."""
    import os

    from spookystuff_spark.sources.warc import read_warc

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
        "warc",
    )
    w = read_warc(spark, f"{root}/*")
    body = F.col("body").cast("string")
    return (
        w.where(F.col("warc_type") == "response")
        .select(
            "record_id",
            F.col("target_uri").alias("uri"),
            F.col("http_status").alias("http_status"),
            F.col("n_payload_bytes").alias("n_bytes"),
            F.regexp_extract(body, "<title>(.*?)</title>", 1).alias("title"),
            F.regexp_count(body, F.lit("<a ")).cast("bigint").alias("n_links"),
        )
    )


@query("q_pdf_doc_stats", oracle=golden_oracle("q_pdf_doc_stats"))
def q_pdf_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tika-parity binary normalization end to end: fetch the committed PDF
    fixtures (mixed /FlateDecode + uncompressed streams, escape sequences),
    auto-normalize to XHTML in parse_node (doc/pdf.py — ref Content.scala:
    50-82), query with the ordinary CSS selector API. Oracle: golden parquet
    computed from the SOURCE text (tools/gen_pdfs.py) — independent of the
    parser, so writer→bytes→parser→selectors must round-trip exactly."""
    import os

    from spookystuff_spark.actions import Wget
    from spookystuff_spark.context import SpookyContext
    from spookystuff_spark.functions.extractors import S

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "fixtures",
        "pdfs",
    )
    files = sorted(f for f in os.listdir(root) if f.endswith(".pdf"))
    sctx = SpookyContext(spark)
    dv = sctx.create(
        spark.createDataFrame([{"u": f"file://{root}/{f}"} for f in files])
    )
    out = dv.fetch(Wget("{u}")).select(
        uri=S.uri,
        title=S("title").text,
        n_pages=S("div.page").size,
        lines=S("div.page p").texts,
    )
    flat = F.concat_ws(" ", F.col("lines"))
    return (
        out.to_df()
        .select(
            F.regexp_extract(F.col("uri"), r"([^/]+)$", 1).alias("file"),
            "title",
            F.col("n_pages").cast("long").alias("n_pages"),
            F.size(F.regexp_extract_all(flat, F.lit(r"(\S+)"), 1))
            .cast("long")
            .alias("n_tokens"),
            F.length(flat).cast("long").alias("n_chars"),
        )
    )


@query("q_fetch_dir_listing", oracle=golden_oracle("q_fetch_dir_listing"))
def q_fetch_dir_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end agent path inside the driver gate: fetch the sf_dir directory
    listing via the file:// resolver, extract entries with the Node selector
    API (ref: Wget directory semantics, CompoundResolver.scala:39-90). Oracle:
    golden parquet from an independent os.listdir recount."""
    from spookystuff_spark.actions import Wget
    from spookystuff_spark.context import SpookyContext
    from spookystuff_spark.functions.extractors import S

    sctx = SpookyContext(spark)
    dv = sctx.create(spark.createDataFrame([{"root": f"file://{sf_dir}"}]))
    return (
        dv.fetch(Wget("{root}"))
        .select(
            n_entries=S("a").size,
            parquet_files=S('a[href$=".parquet"]').hrefs,
        )
        .to_df()
        .select(
            F.col("n_entries").cast("long").alias("n_entries"),
            F.size("parquet_files").cast("long").alias("n_parquet"),
        )
    )
