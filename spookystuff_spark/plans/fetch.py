"""FetchPlan on DataFrames — the engine's workhorse operator.

Ref parity: execution/FetchPlan.scala:25-60 (1→N flatMap + LocalityGroup
dedup shuffle + one-agent-per-group), execution/CanFetch.scala:8-83,
dsl/DataView.scala:178-203, dsl/DataLocality.scala (locality strategies),
dsl/DownSampling.scala:7-57.

Spark-first mapping:
  * trace construction — **JVM-native** when the trace is a template over row
    columns (``Wget("file:///{path}")``): the trace JSON is built with
    ``to_json(struct(...))`` + ``format_string`` and the dedup key with
    ``sha2`` — zero Python in the hot path, fully codegen'd. Arbitrary Python
    ``row → TraceSet`` functions fall back to one Arrow-batched ``mapInPandas``.
  * fetch dedup — ``groupBy(__trace_key)`` (locality "wide": exactly the
    reference's reduceByKey shuffle, but Tungsten-native) or per-partition
    dict dedup ("narrow": map-side only, no exchange) or none ("passthrough").
  * agent execution — one ``applyInPandas``/``mapInPandas`` stage; one
    ``fetch_trace`` per unique trace per group; observations attach to every
    row of the group (the reference's SquashedRow semantics, columnar).

At 100 TB: the groupBy shuffles only (user columns + one 32-char key + one
trace JSON string) — documents are fetched *after* the exchange and never
shuffled; blobs above the conf cap offload to DFS paths. Disable speculative
execution for fetch stages is unnecessary — the doc cache makes re-execution
idempotent (ref invariant ITBaseSpec.scala:79-96).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, Optional, Union

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType

from spookystuff_spark.actions.core import (
    Action,
    Trace,
    TraceSet,
    as_trace_set,
    trace_from_json,
)
from spookystuff_spark.actions.runtime import fetch_trace
from spookystuff_spark.conf import SpookyConf
from spookystuff_spark.doc.observation import OBS_ARRAY_SCHEMA

TRACE_COL = "__trace"
KEY_COL = "__trace_key"
OBS_COL = "__obs"

_TEMPLATE_RE = re.compile(r"\{([A-Za-z_][A-Za-z0-9_]*)\}")

TraceSpec = Union[Action, Trace, TraceSet, list, Callable]


def _uri_template_expr(template: str):
    """``"file:///{path}/x"`` → format_string('file:///%s/x', col(path))."""
    cols = _TEMPLATE_RE.findall(template)
    if not cols:
        return F.lit(template)
    # escape literal '%' BEFORE '{col}'→'%s' substitution: a percent-encoded
    # URI like 'file:///{p}/a%20b' would otherwise reach java String.format
    # as a stray conversion and throw / corrupt the URI
    fmt = _TEMPLATE_RE.sub("%s", template.replace("%", "%%"))
    return F.format_string(fmt, *[F.col(c) for c in cols])


def _native_trace_json(spec) -> Optional[object]:
    """Native (no-Python) trace-JSON column for simple Wget/template specs.

    Field order inside the struct MUST be alphabetical to byte-match
    ``Action.to_json`` (sort_keys=True) so cache keys and dedup keys align.
    """
    from spookystuff_spark.actions.http import Wget

    if isinstance(spec, Action):
        spec = Trace((spec,))
    if isinstance(spec, Trace) and all(isinstance(a, Wget) for a in spec.actions):
        entries = [
            F.struct(
                F.lit(type(a).__name__).alias("#"),
                _uri_template_expr(a.uri).alias("uri"),
            )
            for a in spec.actions
        ]
        return F.to_json(F.array(*entries))
    return None


def _normalize(spec_result) -> TraceSet:
    return as_trace_set(spec_result)


def _sampler(downsampling):
    """Per-group row sampler (ref: dsl/DownSampling.scala:7-57)."""
    if downsampling is None:
        return lambda pdf: pdf
    kind = downsampling[0]
    if kind == "first_n":
        n = downsampling[1]
        return lambda pdf: pdf.head(n)
    if kind == "by_ratio":
        p = downsampling[1]
        return lambda pdf: pdf.sample(frac=p, random_state=42) if len(pdf) else pdf
    if kind == "to_size":
        n = downsampling[1]
        return lambda pdf: pdf.sample(n=min(n, len(pdf)), random_state=42) if len(pdf) else pdf
    raise ValueError(f"unknown downsampling {downsampling!r}")


def attach_traces(
    df: DataFrame, spec: TraceSpec, conf: SpookyConf, keyby: Optional[Callable] = None
) -> DataFrame:
    """1→N flatMap adding TRACE_COL + KEY_COL (ref: FetchPlan flatMap side).

    ``keyby`` (ref: FetchPlan ``keyBy: Trace => Any``) overrides the locality
    group key — rows whose traces map to the same key share one agent run."""
    native = _native_trace_json(spec) if not callable(spec) else None
    if native is not None:
        out = df.withColumn(TRACE_COL, native)
    else:
        spec_fn = spec if callable(spec) else (lambda row, _s=spec: _s)
        fields = df.schema.fields
        out_schema = StructType(list(fields) + [StructField(TRACE_COL, StringType())])

        def emit(batches: Iterator) -> Iterator:
            import pandas as pd

            for pdf in batches:
                rows_out = []
                for row in pdf.to_dict("records"):
                    for trace in _normalize(spec_fn(row)):
                        rows_out.append({**row, TRACE_COL: trace.to_json()})
                yield pd.DataFrame(
                    rows_out, columns=[f.name for f in fields] + [TRACE_COL]
                ) if rows_out else pd.DataFrame(
                    columns=[f.name for f in fields] + [TRACE_COL]
                )

        out = df.mapInPandas(emit, out_schema)
    if keyby is None:
        return out.withColumn(KEY_COL, F.sha2(F.col(TRACE_COL), 256))

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def key_of(traces):  # type: ignore[misc]
        import hashlib

        import pandas as pd

        return pd.Series(
            [
                hashlib.sha256(repr(keyby(trace_from_json(t))).encode()).hexdigest()
                for t in traces
            ]
        )

    return out.withColumn(KEY_COL, key_of(F.col(TRACE_COL)))


def execute_fetch(
    df_with_traces: DataFrame,
    conf: SpookyConf,
    locality: Optional[str] = None,
    downsampling=None,
    metrics=None,
) -> DataFrame:
    """Dedup-shuffle + agent execution, appending OBS_COL."""
    locality = locality or conf.default_locality
    sample = _sampler(downsampling)
    out_schema = StructType(
        list(df_with_traces.schema.fields) + [StructField(OBS_COL, OBS_ARRAY_SCHEMA)]
    )
    conf_copy = conf  # SpookyConf is a plain dataclass → pickles into closure
    acc = metrics._acc if metrics is not None else None

    def inc(name: str, n: int = 1) -> None:
        if acc is not None and name in acc:
            acc[name].add(n)

    def run_one(trace_json: str) -> list[dict]:
        obs = fetch_trace(trace_from_json(trace_json), conf_copy, inc)
        return [o.to_row() for o in obs]

    def run_group(pdf):
        pdf = sample(pdf)
        if not len(pdf):
            return pdf.assign(**{OBS_COL: []})
        obs_rows = run_one(pdf[TRACE_COL].iloc[0])
        return pdf.assign(**{OBS_COL: [obs_rows] * len(pdf)})

    if locality == "wide":
        # THE dedup shuffle (ref: FetchPlan.scala:44-49 gpImpl.groupByKey)
        return df_with_traces.groupBy(KEY_COL).applyInPandas(
            lambda pdf: run_group(pdf), out_schema
        )

    if locality == "wide_join" and downsampling is not None:
        raise ValueError(
            "downsampling requires per-group row batches — use locality='wide'"
        )
    if locality == "wide_join":
        # Scale variant: only DISTINCT (key, trace) rows enter the shuffle and
        # the agent stage; observations join back to the full rows afterwards.
        # Strictly better than "wide" when user rows are wide or keys highly
        # duplicated (the fetch exchange no longer carries user columns);
        # costs one extra join when keys are mostly unique.
        #
        # The agent stage is mapInPandas over the already-unique keys (NOT a
        # per-key applyInPandas): batches of independent traces let
        # conf.fetch_concurrency interleave their IO waits — the combination
        # that makes a crawl both dedup-exact and pipeline-parallel. With a
        # keyby override several traces can share a key; one canonical trace
        # per key (min) is fetched, matching wide's one-agent-run-per-group.
        unique = (
            df_with_traces.groupBy(KEY_COL)
            .agg(F.min(TRACE_COL).alias(TRACE_COL))
        )
        fetch_schema = StructType(
            [
                StructField(KEY_COL, StringType()),
                StructField(OBS_COL, OBS_ARRAY_SCHEMA),
            ]
        )
        conc_wj = max(1, min(8, int(getattr(conf_copy, "fetch_concurrency", 1))))

        def fetch_keys(batches: Iterator) -> Iterator:
            for pdf in batches:
                if not len(pdf):
                    continue
                tjs = list(pdf[TRACE_COL])
                if conc_wj > 1:
                    import concurrent.futures as cf

                    with cf.ThreadPoolExecutor(
                        max_workers=min(conc_wj, len(tjs))
                    ) as ex:
                        obs_col = list(ex.map(run_one, tjs))
                else:
                    obs_col = [run_one(t) for t in tjs]
                yield pdf[[KEY_COL]].assign(**{OBS_COL: obs_col})

        fetched = unique.mapInPandas(fetch_keys, fetch_schema)
        return df_with_traces.join(fetched, on=KEY_COL, how="left")

    dedup = locality != "passthrough"
    # bounded per-partition thread pool: remote fetches are IO-bound, so a
    # task interleaves N traces' network waits instead of serializing them.
    # Capped at 8 so concurrent traces can't exhaust the per-worker helper
    # pool that enforces action timeouts (runtime._pool). Results are
    # order-preserving and byte-identical to sequential execution — traces
    # are independent programs and the doc cache is key-addressed.
    conc = max(1, min(8, int(getattr(conf_copy, "fetch_concurrency", 1))))

    def run_partition(batches: Iterator) -> Iterator:
        local: dict[str, list] = {}
        for pdf in batches:
            if not len(pdf):
                continue
            pdf = sample(pdf)
            tjs = list(pdf[TRACE_COL])
            if conc > 1:
                import concurrent.futures as cf

                if dedup:
                    todo = [t for t in dict.fromkeys(tjs) if t not in local]
                    if todo:
                        with cf.ThreadPoolExecutor(
                            max_workers=min(conc, len(todo))
                        ) as ex:
                            for t, rows in zip(todo, ex.map(run_one, todo)):
                                local[t] = rows
                    obs_col = [local[t] for t in tjs]
                else:
                    with cf.ThreadPoolExecutor(
                        max_workers=min(conc, len(tjs))
                    ) as ex:
                        obs_col = list(ex.map(run_one, tjs))
            else:
                obs_col = []
                for tj in tjs:
                    if dedup and tj in local:
                        obs_col.append(local[tj])
                    else:
                        rows = run_one(tj)
                        if dedup:
                            local[tj] = rows
                        obs_col.append(rows)
            yield pdf.assign(**{OBS_COL: obs_col})

    return df_with_traces.mapInPandas(run_partition, out_schema)


def fetch(
    df: DataFrame,
    spec: TraceSpec,
    conf: SpookyConf,
    locality: Optional[str] = None,
    downsampling=None,
    metrics=None,
    keyby: Optional[Callable] = None,
) -> DataFrame:
    return execute_fetch(
        attach_traces(df, spec, conf, keyby=keyby),
        conf,
        locality=locality,
        downsampling=downsampling,
        metrics=metrics,
    )


def rescope_by_distinct_names(df: DataFrame) -> DataFrame:
    """Re-segment each row's observations into per-name scopes — pagination
    stitching (ref: row/AgentRow.scala:85-120 rescope.byDistinctNames): a new
    segment starts whenever an export name repeats; emits one row per segment
    with ``__segment`` index and that segment's obs slice."""
    from pyspark.sql.types import IntegerType

    fields = [f for f in df.schema.fields if f.name != "__segment"]
    out_schema = StructType(list(fields) + [StructField("__segment", IntegerType())])
    names = [f.name for f in fields]

    def run(batches: Iterator):
        import pandas as pd

        for pdf in batches:
            rows_out = []
            for row in pdf.to_dict("records"):
                obs_raw = row.get(OBS_COL)
                obs = list(obs_raw) if obs_raw is not None else []
                segments: list[list] = [[]]
                seen: set = set()
                for o in obs:
                    d = dict(o)
                    name = d.get("name")
                    if name in seen:
                        segments.append([])
                        seen = set()
                    if name is not None:
                        seen.add(name)
                    segments[-1].append(d)
                for i, seg in enumerate(segments):
                    if not seg and i > 0:
                        continue
                    out = {k: row.get(k) for k in names}
                    out[OBS_COL] = seg
                    out["__segment"] = i
                    rows_out.append(out)
            cols = names + ["__segment"]
            yield pd.DataFrame(rows_out, columns=cols) if rows_out else pd.DataFrame(
                columns=cols
            )

    return df.mapInPandas(run, out_schema)
