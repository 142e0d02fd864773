"""spookystuff_spark — a PySpark-native distributed agent-swarm / data-mashup
engine with the query and data-processing capabilities of tribbloid/spookystuff,
re-architected Spark-first (DataFrame/Catalyst/AQE) rather than translated from
the reference RDD engine.

Quickstart::

    from spookystuff_spark import S, SpookyContext, Wget

    ctx = SpookyContext(spark)
    pages = (
        ctx.create(urls_df)                       # any DataFrame with a uri col
        .fetch(Wget("https://{host}/{path}"))     # dedup'd, cached, retried
        .select(title=S("h1").text, links=S("a").hrefs)
        .to_df()
    )
    crawl = ctx.create(seeds_df).explore(
        Wget("{seed}"), expand=S("a").hrefs, range=(0, 3)
    )

Layout:
    actions/    replayable Action/Trace algebra (ref: module/core/.../actions/)
    doc/        Observation/Doc + Node selector API (ref: module/core/.../doc/)
    sources/    URI resolvers + doc-cache DataFrame source
    caching/    two-level doc cache (executor-memory + DFS) with TTL/wayback
    plans/      DataFrame-backed operators: fetch (dedup shuffle), select,
                fork, explore (iterative BFS), save
    operators/  LLM-pipeline: dedup (MinHash/SimHash/CC), similarity (LSH/IVF),
                text analysis, multimodal, skew utilities, graph BFS
    functions/  extractor DSL (S/C/T), record merge, stable rounding
    queries/    the driver-checked query inventory (Spark impl + DuckDB oracle)
    streaming/  Structured Streaming: windows/sessions, stateful ops, fetch
"""

__version__ = "0.1.0"

from spookystuff_spark.actions import (  # noqa: F401
    Accept,
    Delay,
    LocalRetry,
    Loop,
    Mock,
    Trace,
    Wayback,
    Wget,
    Wpost,
)
from spookystuff_spark.conf import SpookyConf  # noqa: F401
from spookystuff_spark.context import SpookyContext  # noqa: F401
from spookystuff_spark.functions.extractors import C, S, T, by_name  # noqa: F401
from spookystuff_spark.plans.select import append  # noqa: F401  (~+ semantics)
