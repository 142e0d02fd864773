"""ExplorePlan — iterative BFS graph traversal with frontier dedup.

Ref parity: execution/ExplorePlan.scala:53-228 (driver do/while epochs,
accumulator stop condition, periodic checkpoint), ExploreRunner.scala:20-319
(per-partition best-first execution, visited commit), Explore.scala,
dsl/PathPlanning_Simple.scala:24-78 (min-(depth, ordinal) reducers), legacy
golden semantics module/integration/.../explore/simple/ExploreIT.scala:23-67
(``depth int`` + ``index array<int>`` output columns, min-depth wins on
diamonds, each node fetched once).

Spark-first rebuild (GraphFrames-BFS-style, not a port of ExploreRunner):
  * frontier & visited are DataFrames; node identity = trace key;
  * per epoch: ``left_anti`` join vs visited (the reference's epoch-end
    reduceByKey dedup), min-(depth, path) winner per key (PathPlanning
    reducer, via ``min_by``), fetch via the ordinary FetchPlan (which itself
    dedups and reads the doc cache — the reference's ExploreLocalCache role),
    expansion in one Arrow batch stage, ``localCheckpoint`` every k epochs
    (ref: ExplorePlan.scala:124-134);
  * termination: empty frontier (the reference's open-set accumulator == 0)
    or depth cap.

The reference's intra-epoch opportunistic pruning (JVM-singleton
ExploreLocalCache sharing visited across executor threads) is replaced by
epoch-level anti-joins + the doc cache: same fixpoint, and re-discovered nodes
cost a cache read instead of a remote fetch (SURVEY.md §7 risk note).

At scale: visited is persisted MEMORY_AND_DISK and only (key, depth, path)
joins against the frontier — user columns and observations never enter the
anti-join shuffle.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Union

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from spookystuff_spark.actions.core import Trace, as_trace_set, trace_from_json
from spookystuff_spark.actions.http import Wget
from spookystuff_spark.doc.observation import OBS_ARRAY_SCHEMA, Observation
from spookystuff_spark.functions.extractors import Expr, ExtractCtx
from spookystuff_spark.plans.fetch import (
    KEY_COL,
    OBS_COL,
    TRACE_COL,
    attach_traces,
    execute_fetch,
)

ExpandSpec = Union[Expr, Callable]


def explore(
    ctx,
    df: DataFrame,
    spec,
    expand: ExpandSpec = None,
    depth_field: str = "depth",
    range: tuple = (0, None),
    path_field: Optional[str] = None,
    ordinal_field: Optional[str] = None,
    checkpoint_interval: Optional[int] = None,
    locality: Optional[str] = None,
    epoch_depths: int = 1,
    expand_limit: Optional[int] = None,
) -> DataFrame:
    """BFS from ``spec``-seeded traces, expanding via ``expand``.

    ``spec``  — seed trace spec (same forms as ``fetch``).
    ``expand`` — an extractor Expr yielding the child URIs of a fetched row
    (e.g. ``S("a").hrefs``), or a callable ``row_dict -> TraceSpec``.
    ``epoch_depths`` — depth steps executed LOCALLY per Spark job (ref:
    epochInterval, SpookyConf.scala:63; ExploreRunner's in-partition walk):
    1 → one global dedup-shuffle per depth (strongest dedup, default);
    k>1 → each epoch walks k levels inside the Arrow stage with per-partition
    dedup, then reconciles globally — k× fewer driver round-trips for deep
    narrow graphs, at the cost of possible cross-partition duplicate fetches
    within an epoch (absorbed by the doc cache — the same tradeoff the
    reference makes with ExploreLocalCache).
    Output = visited rows: user columns + ``depth`` (+ optional ``path``/
    ``ordinal``) + the fetched observations of each node.
    """
    if epoch_depths > 1:
        return _explore_batched(
            ctx, df, spec, expand, depth_field, range, path_field,
            ordinal_field, checkpoint_interval, epoch_depths, expand_limit,
        )
    if expand is None:
        raise ValueError("explore requires an expand extractor/callable")
    conf = ctx.conf
    min_depth, max_depth = range
    if max_depth is None:
        max_depth = conf.explore_max_depth
    if conf.preview_mode:
        max_depth = min(max_depth, 2)  # ref: SpookyConf.previewMode
    if checkpoint_interval is None:
        checkpoint_interval = max(1, conf.explore_checkpoint_interval // 10)

    path_col = path_field or "__path"
    user_fields = list(df.schema.fields)
    user_cols = [f.name for f in user_fields]

    # --- seed frontier: depth 0, empty path
    frontier = (
        attach_traces(df, spec, conf)
        .withColumn(depth_field, F.lit(0))
        .withColumn(path_col, F.array().cast(ArrayType(IntegerType())))
    )

    visited: Optional[DataFrame] = None
    visited_keys: Optional[DataFrame] = None
    epoch = 0

    # child-row schema produced by the expansion stage
    child_schema = StructType(
        user_fields
        + [
            StructField(TRACE_COL, StringType()),
            StructField(depth_field, IntegerType()),
            StructField(path_col, ArrayType(IntegerType())),
        ]
    )

    def expand_children(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in child_schema.fields]
        is_expr = isinstance(expand, Expr)
        for pdf in batches:
            parse_cache: dict = {}
            rows_out = []
            for row in pdf.to_dict("records"):
                obs_raw = row.get(OBS_COL)  # numpy array — never `or []`
                docs = [
                    Observation.from_row(r)
                    for r in (list(obs_raw) if obs_raw is not None else [])
                ]
                ectx = ExtractCtx(row, docs, parse_cache=parse_cache)
                if is_expr:
                    uris = expand.eval(ectx) or []
                    traces = [Trace((Wget(u),)) for u in uris]
                else:
                    traces = list(as_trace_set(expand(row) or []))
                if expand_limit is not None:
                    # per-node expansion cap (DownSampling-in-explore parity)
                    traces = traces[:expand_limit]
                base = {k: row.get(k) for k in user_cols}
                prev_path = row[path_col]
                # arrow hands arrays back as numpy arrays — no `or []` (falsy!)
                prev_path = list(prev_path) if prev_path is not None else []
                for i, tr in enumerate(traces):
                    child = dict(base)
                    child[TRACE_COL] = tr.to_json()
                    child[depth_field] = int(row[depth_field]) + 1
                    child[path_col] = prev_path + [i]
                    rows_out.append(child)
            yield pd.DataFrame(rows_out, columns=cols) if rows_out else pd.DataFrame(
                columns=cols
            )

    while True:
        # --- dedup: drop nodes already visited (epoch-level reduceByKey parity)
        if visited_keys is not None:
            frontier = frontier.join(visited_keys, on=KEY_COL, how="left_anti")

        # --- PathPlanning reducer: min (depth, path) per node key
        frontier = (
            frontier.groupBy(KEY_COL)
            .agg(
                F.min_by(
                    F.struct(*[c for c in frontier.columns if c != KEY_COL]),
                    F.struct(F.col(depth_field), F.col(path_col)),
                ).alias("__best")
            )
            .select(KEY_COL, "__best.*")
        )
        frontier = frontier.localCheckpoint(eager=True)

        # open-set emptiness is the only signal needed (ExplorePlan.scala:164)
        # — isEmpty on the checkpointed frontier beats a full count job
        if epoch > max_depth or frontier.isEmpty():
            break

        # --- fetch the frontier (dedup shuffle + doc cache inside)
        fetched = execute_fetch(
            frontier, conf, locality=locality, metrics=ctx.metrics
        ).persist()
        fetched.count()

        visited = fetched if visited is None else visited.unionByName(fetched)
        # incremental closed-set: union THIS epoch's keys (fetched is one row
        # per key, disjoint from prior epochs by the left_anti above) instead
        # of re-distinct-ing the full visited rows — the rescan was
        # O(total-visited) per epoch, quadratic-ish across a deep crawl.
        new_keys = fetched.select(KEY_COL)  # fetched is persisted — lazy
        # union scans caches, no extra job per epoch
        visited_keys = (
            new_keys
            if visited_keys is None
            else visited_keys.unionByName(new_keys)
        )
        if epoch % checkpoint_interval == checkpoint_interval - 1:
            visited = visited.localCheckpoint(eager=True)  # lineage truncation
            visited_keys = visited_keys.localCheckpoint(eager=True)

        if epoch >= max_depth:
            break  # children would exceed the cap — don't expand

        # --- expansion (induction set)
        children = fetched.mapInPandas(expand_children, child_schema)
        frontier = children.withColumn(KEY_COL, F.sha2(F.col(TRACE_COL), 256))
        epoch += 1

    if visited is None:
        empty = StructType(
            user_fields
            + [
                StructField(KEY_COL, StringType()),
                StructField(TRACE_COL, StringType()),
                StructField(depth_field, IntegerType()),
                StructField(path_col, ArrayType(IntegerType())),
            ]
        )
        return ctx.spark.createDataFrame([], empty)

    out = visited.filter(F.col(depth_field) >= min_depth)
    if ordinal_field:
        out = out.withColumn(
            ordinal_field,
            F.when(
                F.size(F.col(path_col)) > 0, F.try_element_at(F.col(path_col), F.lit(-1))
            ),
        )
    if not path_field:
        out = out.drop(path_col)
    return out


def _explore_batched(
    ctx,
    df: DataFrame,
    spec,
    expand: ExpandSpec,
    depth_field: str,
    depth_range: tuple,
    path_field: Optional[str],
    ordinal_field: Optional[str],
    checkpoint_interval: Optional[int],
    epoch_depths: int,
    expand_limit: Optional[int] = None,
) -> DataFrame:
    """Epoch-batched walker: fetch+expand ``epoch_depths`` levels inside one
    Arrow stage per epoch (ExploreRunner's local walk), reconcile globally."""
    import hashlib

    from spookystuff_spark.actions.runtime import fetch_trace

    conf = ctx.conf
    min_depth, max_depth = depth_range
    if max_depth is None:
        max_depth = conf.explore_max_depth
    if checkpoint_interval is None:
        checkpoint_interval = max(1, conf.explore_checkpoint_interval // 10)

    path_col = path_field or "__path"
    user_fields = list(df.schema.fields)
    user_cols = [f.name for f in user_fields]
    metrics = ctx.metrics
    acc = metrics._acc if metrics is not None else None

    def inc(name: str, n: int = 1) -> None:
        if acc is not None and name in acc:
            acc[name].add(n)

    frontier = (
        attach_traces(df, spec, conf)
        .withColumn(depth_field, F.lit(0))
        .withColumn(path_col, F.array().cast(ArrayType(IntegerType())))
    )

    walk_schema = StructType(
        user_fields
        + [
            StructField(KEY_COL, StringType()),
            StructField(TRACE_COL, StringType()),
            StructField(depth_field, IntegerType()),
            StructField(path_col, ArrayType(IntegerType())),
            StructField(OBS_COL, OBS_ARRAY_SCHEMA),
            StructField("__is_frontier", BooleanType()),
        ]
    )
    is_expr = isinstance(expand, Expr)

    def walk(batches: Iterator) -> Iterator:
        import pandas as pd

        def _path_order(row: dict):
            # min-(depth, path) priority: processing in this order makes the
            # local_seen first-wins dedup equal to the global min_by reducer
            # (lexicographic list compare == Spark array ordering). Without
            # it, which same-depth parent records a shared child depends on
            # arbitrary batch row order and the losing (smaller) path is
            # dropped before the cross-partition reconcile can see it.
            p = row[path_col]
            row[path_col] = list(p) if p is not None else []
            return (int(row[depth_field]), row[path_col])

        for pdf in batches:
            parse_cache: dict = {}
            local_seen: set = set()
            rows_out: list[dict] = []
            work = sorted(pdf.to_dict("records"), key=_path_order)
            steps = 0
            while work and steps < epoch_depths:
                next_work: list[dict] = []
                for row in work:
                    key = row[KEY_COL]
                    if key in local_seen:
                        continue
                    local_seen.add(key)
                    trace = trace_from_json(row[TRACE_COL])
                    obs = fetch_trace(trace, conf, inc)
                    obs_rows = [o.to_row() for o in obs]
                    visited = {k: row.get(k) for k in user_cols}
                    visited.update(
                        {
                            KEY_COL: key,
                            TRACE_COL: row[TRACE_COL],
                            depth_field: int(row[depth_field]),
                            path_col: list(row[path_col])
                            if row[path_col] is not None
                            else [],
                            OBS_COL: obs_rows,
                            "__is_frontier": False,
                        }
                    )
                    rows_out.append(visited)
                    if int(row[depth_field]) >= max_depth:
                        continue
                    ectx = ExtractCtx(
                        {**row, OBS_COL: obs_rows},
                        [Observation.from_row(r) for r in obs_rows],
                        parse_cache=parse_cache,
                    )
                    if is_expr:
                        uris = expand.eval(ectx)
                        traces = [Trace((Wget(u),)) for u in (uris or [])]
                    else:
                        traces = list(as_trace_set(expand(ectx.row) or []))
                    if expand_limit is not None:
                        traces = traces[:expand_limit]
                    for i, tr in enumerate(traces):
                        tj = tr.to_json()
                        # same hex as the JVM-side sha2(trace_json, 256)
                        child_key = hashlib.sha256(tj.encode()).hexdigest()
                        child = {k: row.get(k) for k in user_cols}
                        child.update(
                            {
                                KEY_COL: child_key,
                                TRACE_COL: tj,
                                depth_field: int(row[depth_field]) + 1,
                                path_col: (
                                    list(row[path_col])
                                    if row[path_col] is not None
                                    else []
                                )
                                + [i],
                                OBS_COL: [],
                                "__is_frontier": True,
                            }
                        )
                        next_work.append(child)
                work = sorted(next_work, key=_path_order)
                steps += 1
            # anything left in `work` exceeded this epoch's local budget →
            # emit as frontier for the next global epoch
            for row in work:
                row["__is_frontier"] = True
                rows_out.append(row)
            cols = [f.name for f in walk_schema.fields]
            yield pd.DataFrame(rows_out, columns=cols) if rows_out else pd.DataFrame(
                columns=cols
            )

    visited: Optional[DataFrame] = None
    visited_keys: Optional[DataFrame] = None
    epoch = 0
    while True:
        if visited_keys is not None:
            frontier = frontier.join(visited_keys, on=KEY_COL, how="left_anti")
        frontier = (
            frontier.groupBy(KEY_COL)
            .agg(
                F.min_by(
                    F.struct(*[c for c in frontier.columns if c != KEY_COL]),
                    F.struct(F.col(depth_field), F.col(path_col)),
                ).alias("__best")
            )
            .select(KEY_COL, "__best.*")
        )
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.isEmpty():
            break

        walked = frontier.mapInPandas(walk, walk_schema).localCheckpoint(eager=True)

        new_visited = walked.filter(~F.col("__is_frontier")).drop("__is_frontier")
        # cross-partition reconcile: keep min (depth, path) per key
        new_visited = (
            new_visited.groupBy(KEY_COL)
            .agg(
                F.min_by(
                    F.struct(*[c for c in new_visited.columns if c != KEY_COL]),
                    F.struct(F.col(depth_field), F.col(path_col)),
                ).alias("__best")
            )
            .select(KEY_COL, "__best.*")
        )
        if visited_keys is not None:
            new_visited = new_visited.join(visited_keys, on=KEY_COL, how="left_anti")
        visited = (
            new_visited if visited is None else visited.unionByName(new_visited)
        )
        # incremental closed-set (see _explore loop): new_visited is one row
        # per key and disjoint from visited_keys — no full-visited rescan.
        # new_visited re-derives from checkpointed `walked` on evaluation, so
        # keys stay lazy between interval checkpoints (≤ interval small
        # groupBys per eval, bounded) instead of paying a job every epoch.
        new_keys = new_visited.select(KEY_COL)
        visited_keys = (
            new_keys
            if visited_keys is None
            else visited_keys.unionByName(new_keys)
        )
        if epoch % checkpoint_interval == checkpoint_interval - 1:
            visited = visited.localCheckpoint(eager=True)
            visited_keys = visited_keys.localCheckpoint(eager=True)

        frontier = walked.filter(F.col("__is_frontier")).drop(
            "__is_frontier", OBS_COL
        )
        epoch += 1
        if epoch > max_depth:  # safety: epochs bounded by depth cap anyway
            break

    if visited is None:
        return ctx.spark.createDataFrame(
            [], StructType([f for f in walk_schema.fields if f.name != "__is_frontier"])
        )
    out = visited.filter(
        (F.col(depth_field) >= min_depth) & (F.col(depth_field) <= max_depth)
    )
    if ordinal_field:
        out = out.withColumn(
            ordinal_field,
            F.when(
                F.size(F.col(path_col)) > 0,
                F.try_element_at(F.col(path_col), F.lit(-1)),
            ),
        )
    if not path_field:
        out = out.drop(path_col)
    return out
