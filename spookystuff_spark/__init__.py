"""spookystuff_spark — a PySpark-native distributed agent-swarm / data-mashup
engine with the query and data-processing capabilities of tribbloid/spookystuff,
re-architected Spark-first (DataFrame/Catalyst/AQE) rather than translated from
the reference RDD engine.

Layout:
    actions/    replayable Action/Trace algebra (ref: module/core/.../actions/)
    doc/        Observation/Doc + Node selector API (ref: module/core/.../doc/)
    sources/    URI resolvers (file/http/data) feeding the agent runtime
    caching/    two-level doc cache (executor-memory + DFS) with TTL/wayback
    plans/      DataFrame-backed operators: fetch (dedup shuffle), select,
                explore (iterative BFS driver loop)
    operators/  LLM-data-pipeline operators: dedup, similarity, text, multimodal
    functions/  scalar/vector function helpers (JVM-side first, pandas_udf second)
    queries/    the driver-checked query inventory (Spark impl + DuckDB oracle)
    streaming/  Structured Streaming surface
"""

__version__ = "0.1.0"

from spookystuff_spark.context import SpookyContext  # noqa: F401
