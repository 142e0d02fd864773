"""DataView — the user-facing dataset (ref: dsl/DataView.scala:72-331,
dsl/DataViewRDDInterface.scala).

A thin immutable wrapper over a DataFrame with reserved engine columns
(``__trace``, ``__trace_key``, ``__obs``, ``__scope``…). Every relational
method is a pass-through to the DataFrame (Catalyst plans it); the engine adds
``fetch``, ``select`` (extractors), ``fork`` and ``explore``. ``to_df`` exits
to a clean DataFrame.

The plan-node tree of the reference (ExecutionPlan/FlatMapPlan/SortPlan/...)
intentionally does NOT exist here: Catalyst's logical plan *is* the plan tree,
and its CollapseProject/pushdown rules subsume the reference's normalisedPlan
fusion (ref: ExecutionPlan.scala:18-144 → Catalyst).
"""

from __future__ import annotations

from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from spookystuff_spark.plans import fetch as fetch_mod
from spookystuff_spark.plans import select as select_mod
from spookystuff_spark.plans.fetch import KEY_COL, OBS_COL, TRACE_COL
from spookystuff_spark.plans.select import SCOPE_COL, SCOPE_MIME_COL

RESERVED = (TRACE_COL, KEY_COL, OBS_COL, SCOPE_COL, SCOPE_MIME_COL)


class DataView:
    def __init__(self, ctx, df: DataFrame):
        self.ctx = ctx
        self.df = df

    @classmethod
    def of_df(cls, ctx, df: DataFrame) -> "DataView":
        return cls(ctx, df)

    def _with(self, df: DataFrame) -> "DataView":
        return DataView(self.ctx, df)

    # ------------------------------------------------------------ fetch
    def fetch(
        self,
        spec,
        locality: Optional[str] = None,
        downsampling=None,
        keyby=None,
    ) -> "DataView":
        """1→N fetch with trace-dedup (ref: DataView.fetch:178-203).

        ``spec``: Action/Trace (uri templates ``{col}`` interpolate row
        columns, JVM-side), TraceSet, or ``row_dict -> TraceSpec`` callable.
        ``keyby``: optional ``Trace -> Any`` locality-group key override.
        """
        conf = self.ctx.conf
        if conf.preview_mode and downsampling is None:
            downsampling = ("first_n", 1)  # ref: SpookyConf.previewMode
        out = fetch_mod.fetch(
            self.df,
            spec,
            conf,
            locality=locality,
            downsampling=downsampling,
            metrics=self.ctx.metrics,
            keyby=keyby,
        )
        return self._with(out)

    def rescope_by_distinct_names(self) -> "DataView":
        """Pagination stitching (ref: AgentRow.rescope.byDistinctNames)."""
        return self._with(fetch_mod.rescope_by_distinct_names(self.df))

    def to_json_df(self) -> DataFrame:
        """JSON-string exit (ref: DataView.asJSONDataset)."""
        import pyspark.sql.functions as F2

        clean = self.to_df()
        return clean.select(
            F2.to_json(F2.struct(*[F2.col(c) for c in clean.columns])).alias("json")
        )

    # ------------------------------------------------------------ extract
    def select(self, **extractors) -> "DataView":
        """Append extractor columns (ref: DataView.select/map:137-164)."""
        return self._with(select_mod.select(self.df, **extractors))

    extract = select  # legacy alias (SelectIT)

    def fork(
        self,
        css: str,
        ordinal_field: Optional[str] = None,
        max_ordinal: Optional[int] = None,
    ) -> "DataView":
        """Per-node explode preserving parent row (ref: ForkExtractIT)."""
        return self._with(
            select_mod.fork(
                self.df, css, ordinal_field=ordinal_field, max_ordinal=max_ordinal
            )
        )

    def explore(
        self,
        spec,
        depth_field: str = "depth",
        range=(0, None),
        **kwargs,
    ) -> "DataView":
        """Iterative BFS traversal — see plans/explore.py."""
        from spookystuff_spark.plans.explore import explore as explore_impl

        return self._with(
            explore_impl(
                self.ctx, self.df, spec, depth_field=depth_field, range=range, **kwargs
            )
        )

    # ------------------------------------------------------------ relational
    # (ref: SortPlan/UnionPlan/CoalescePlan — all pure Catalyst pass-throughs)
    def sort_by(self, *cols, ascending: bool = True) -> "DataView":
        exprs = [F.asc(c) if ascending else F.desc(c) for c in cols]
        return self._with(self.df.orderBy(*exprs))

    def union(self, *others: "DataView") -> "DataView":
        df = self.df
        for o in others:
            df = df.unionByName(o.df, allowMissingColumns=True)
        return self._with(df)

    __add__ = union

    def coalesce(self, n: int) -> "DataView":
        return self._with(self.df.coalesce(n))

    def repartition(self, n: int, *cols) -> "DataView":
        return self._with(self.df.repartition(n, *cols) if cols else self.df.repartition(n))

    def filter(self, cond) -> "DataView":
        return self._with(self.df.filter(cond))

    def with_column(self, name: str, col) -> "DataView":
        return self._with(self.df.withColumn(name, col))

    def with_columns_merged(self, policy: str = "error", **cols) -> "DataView":
        """Record-merge with linq conflict policies (ref: linq/Rec.scala:72-120;
        error ≡ +!+, prefer_right ≡ +<+/++, prefer_left ≡ +>+)."""
        from spookystuff_spark.functions.merge import with_columns_merged

        return self._with(with_columns_merged(self.df, policy, **cols))

    def explode_field(self, col: str, out_col: str = None) -> "DataView":
        """linq RowFunctions.explode parity: unnest an array column."""
        from spookystuff_spark.functions.merge import explode_field

        return self._with(explode_field(self.df, col, out_col))

    def drop(self, *cols: str) -> "DataView":
        return self._with(self.df.drop(*cols))

    # ------------------------------------------------------------ lifecycle
    def persist(self, level: str = "MEMORY_AND_DISK") -> "DataView":
        from pyspark import StorageLevel

        self.df.persist(getattr(StorageLevel, level))
        return self

    def unpersist(self) -> "DataView":
        self.df.unpersist()
        return self

    def checkpoint(self, eager: bool = True) -> "DataView":
        return self._with(self.df.localCheckpoint(eager=eager))

    def execute(self) -> "DataView":
        """Force materialization (ref: DataView.execute:166-175)."""
        self.df.count()
        return self

    # ------------------------------------------------------------ exits
    def to_df(self, sort: bool = False) -> DataFrame:
        """Clean DataFrame: reserved engine columns dropped
        (``toDF(sort=true)`` column ordering parity: sorted names)."""
        cols = [c for c in self.df.columns if c not in RESERVED]
        if sort:
            cols = sorted(cols)
        return self.df.select(*cols)

    def save_docs(self, root: str, errors_only: bool = False) -> DataFrame:
        """Persist fetched doc payloads to ``root`` (Trajectory.save parity;
        ``errors_only`` = the reference's error-dump). Returns the manifest."""
        from spookystuff_spark.plans.save import save_docs

        return save_docs(self.df, root, errors_only=errors_only)

    def docs_df(self) -> DataFrame:
        """Exploded observation table: one row per fetched doc."""
        return (
            self.df.select(F.explode(F.col(OBS_COL)).alias("o"))
            .select("o.*")
            .drop("content")
        )

    def collect(self):
        return self.to_df().collect()

    def count(self) -> int:
        return self.df.count()

    def __repr__(self) -> str:
        return f"DataView({self.df.schema.simpleString()})"
