"""FlatMapPlan equivalents: ``select`` (narrow per-row extraction) and
``fork`` (per-node explode preserving the parent row).

Ref parity: execution/FlatMapPlan.scala:50-91, dsl/DataView.scala:137-164,
legacy ``.extract``/``.fork`` semantics
(module/integration/.../extract/SelectIT.scala:12-91, ForkExtractIT.scala:18-50).

All extractors of one ``select`` evaluate in a single Arrow-batched
``mapInPandas`` stage, parsing each distinct doc once per batch (operator
fusion — what FlatMapPlan.normalisedPlan chaining buys the reference). Narrow:
no shuffle, preserves partitioning.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from spookystuff_spark.doc.node import JsonNode, parse_node
from spookystuff_spark.doc.observation import Observation
from spookystuff_spark.functions.extractors import Expr, ExtractCtx
from spookystuff_spark.plans.fetch import OBS_COL

SCOPE_COL = "__scope"
SCOPE_MIME_COL = "__scope_mime"


def _ctx_for(row: dict, parse_cache: dict) -> ExtractCtx:
    obs_raw = row.get(OBS_COL)  # numpy array from Arrow — never `or []` it
    obs_rows = list(obs_raw) if obs_raw is not None else []
    docs = [Observation.from_row(r) for r in obs_rows]
    scope = None
    frag = row.get(SCOPE_COL)
    if frag is not None:
        mime = row.get(SCOPE_MIME_COL) or "text/html; charset=utf-8"
        cache_key = ("scope", hash(frag))
        scope = parse_cache.get(cache_key)
        if scope is None:
            scope = parse_node(frag.encode(), mime)
            parse_cache[cache_key] = scope
    return ExtractCtx(row, docs, scope=scope, parse_cache=parse_cache)


class Append:
    """``~+`` marker (ref: SelectIT.scala:60-91): where plain ``expr ~ name``
    raises on an existing column, ``append(expr)`` merges into it — the old
    value is promoted to an array and the new extraction appended."""

    def __init__(self, expr: Expr):
        self.expr = expr


def append(expr: Expr) -> Append:
    return Append(expr)


def select(df: DataFrame, **extractors) -> DataFrame:
    """Append one column per named extractor (ref: DataView.select/map)."""
    from pyspark.sql.types import ArrayType

    in_fields = list(df.schema.fields)
    by_name = {f.name: f for f in in_fields}
    appends = {n: e.expr for n, e in extractors.items() if isinstance(e, Append)}
    plain = {n: e for n, e in extractors.items() if not isinstance(e, Append)}
    for name in plain:
        if name in by_name:
            raise ValueError(
                f"column {name!r} already exists (legacy SelectIT conflict rule"
                " — use append() / '~+' semantics to merge)"
            )

    def arr_elem(name: str, e: Expr):
        existing = by_name.get(name)
        base = existing.dataType if existing is not None else e.dtype
        return base.elementType if isinstance(base, ArrayType) else base

    out_fields = [
        StructField(f.name, ArrayType(arr_elem(f.name, appends[f.name])))
        if f.name in appends
        else f
        for f in in_fields
    ]
    out_fields += [
        StructField(n, ArrayType(arr_elem(n, e)))
        if n in appends
        else StructField(n, e.dtype)
        for n, e in extractors.items()
        if n not in by_name
    ]
    out_schema = StructType(out_fields)
    names = [f.name for f in in_fields]
    items = [(n, (e.expr if isinstance(e, Append) else e)) for n, e in extractors.items()]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        def as_list(v):
            if v is None:
                return []
            if isinstance(v, (str, bytes)):
                return [v]
            if hasattr(v, "__len__"):  # list / tuple / numpy array from Arrow
                return list(v)
            return [v]

        for pdf in batches:
            parse_cache: dict = {}
            out_cols: dict[str, list] = {name: [] for name, _ in items}
            for row in pdf.to_dict("records"):
                ctx = _ctx_for(row, parse_cache)
                for name, expr in items:
                    try:
                        v = expr.eval(ctx)
                    except Exception:
                        v = None
                    if name in appends:
                        v = as_list(row.get(name)) + as_list(v)
                    out_cols[name].append(v)
            yield pdf.assign(**out_cols) if len(pdf) else pd.DataFrame(
                columns=names + [n for n, _ in items if n not in names]
            )

    return df.mapInPandas(run, out_schema)


def fork(
    df: DataFrame,
    css: str,
    ordinal_field: Optional[str] = None,
    max_ordinal: Optional[int] = None,
) -> DataFrame:
    """Explode each row into one child row per selected node; the node becomes
    the scope for subsequent extractors (ref: ForkExtractIT.scala:18-50 —
    per-element explode preserving parent row)."""
    in_fields = [f for f in df.schema.fields if f.name not in (SCOPE_COL, SCOPE_MIME_COL)]
    out_schema = StructType(
        in_fields
        + [
            StructField(SCOPE_COL, StringType()),
            StructField(SCOPE_MIME_COL, StringType()),
        ]
        + ([StructField(ordinal_field, IntegerType())] if ordinal_field else [])
    )
    keep = [f.name for f in in_fields]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            parse_cache: dict = {}
            rows_out = []
            for row in pdf.to_dict("records"):
                ctx = _ctx_for(row, parse_cache)
                root = ctx.root()
                nodes = root.find_all(css) if root is not None else []
                if max_ordinal is not None:
                    nodes = nodes[:max_ordinal]
                base = {k: row.get(k) for k in keep}
                for i, node in enumerate(nodes):
                    child = dict(base)
                    child[SCOPE_COL] = getattr(node, "code", None) or node.text
                    child[SCOPE_MIME_COL] = (
                        "application/json"
                        if isinstance(node, JsonNode)
                        else "text/html; charset=utf-8"
                    )
                    if ordinal_field:
                        child[ordinal_field] = i
                    rows_out.append(child)
            yield pd.DataFrame(rows_out, columns=cols) if rows_out else pd.DataFrame(
                columns=cols
            )

    return df.mapInPandas(run, out_schema)
