"""Declarative extractor expressions — the rebuild of the reference's
string-interpolation extractor DSL (``S"css"``, ``.texts``, ``~ 'alias``;
ref: module/integration/.../extract/SelectIT.scala:12-91 legacy semantics,
doc/NodeContainer.scala, doc/ManyNodes.scala).

An ``Expr`` is a pure function of an ExtractCtx (row data + fetched docs +
optional fork scope) with a declared Spark output type — declared types let
``select`` build its Arrow schema without sampling, and the whole extractor set
for a select evaluates in ONE ``mapInPandas`` pass with per-batch parsed-doc
caching (operator fusion: the reference's FlatMapPlan.normalisedPlan chaining,
done here by construction).

    from spookystuff_spark.functions.extractors import S, C
    dv.select(title=S("h1").text, links=S("a").hrefs, n=S("li").size)
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from pyspark.sql.types import (
    ArrayType,
    DataType,
    IntegerType,
    LongType,
    MapType,
    StringType,
)

from spookystuff_spark.doc.html_node import ManyNodes
from spookystuff_spark.doc.node import parse_node
from spookystuff_spark.doc.observation import Observation


class ExtractCtx:
    """Evaluation context: one logical row (ref: row/AgentRow.scala:54-132)."""

    __slots__ = ("row", "docs", "scope", "_parse_cache")

    def __init__(self, row: dict, docs: list, scope=None, parse_cache=None):
        self.row = row
        self.docs = docs  # list[Observation]
        self.scope = scope  # parsed Node of the fork fragment, or None
        self._parse_cache = parse_cache if parse_cache is not None else {}

    def parsed(self, obs: Observation):
        key = obs.uid
        node = self._parse_cache.get(key)
        if node is None:
            node = obs.parsed()
            self._parse_cache[key] = node
        return node

    def root(self, name: Optional[str] = None):
        """Current scope if forked, else the (named or first successful) doc
        (ref: row/AgentContext.scala:41-147 Trajectory.byName/only/head)."""
        if name is None and self.scope is not None:
            return self.scope
        for obs in self.docs:
            if not obs.success:
                continue
            if name is None or obs.name == name:
                return self.parsed(obs)
        return None


class Expr:
    def __init__(self, fn: Callable[[ExtractCtx], Any], dtype: DataType):
        self.fn = fn
        self.dtype = dtype

    def eval(self, ctx: ExtractCtx) -> Any:
        return self.fn(ctx)

    def cast(self, dtype: DataType) -> "Expr":
        return Expr(self.fn, dtype)

    def map(self, fn: Callable[[Any], Any], dtype: DataType) -> "Expr":
        return Expr(lambda ctx: fn(self.fn(ctx)), dtype)


def _first(nodes: ManyNodes):
    return nodes[0] if nodes else None


class NodesExpr(Expr):
    """Evaluates to a ManyNodes batch; exposes the batch extractor surface."""

    def __init__(self, fn, root_fn=None, css=None, mode="find_all"):
        super().__init__(fn, StringType())  # placeholder; leaves carry real types
        self._root_fn = root_fn  # set when built from a css selection —
        self._css = css  # enables sibling-window expansion
        self._mode = mode  # "find_all" | "children"

    def expand(self, sibling_range: range) -> "SiblingsExpr":
        """Sibling-window expansion — ``S("a em").expand(range(-2, 2)).texts``
        mirrors the legacy ``S"a em".expand(-2 to 1).texts``
        (ref: SelectIT.scala:23, Node.scala:52-87). Windows are clipped at
        adjacent matches (no overlap)."""
        if self._root_fn is None or self._css is None:
            raise ValueError("expand() requires a css-selected NodesExpr")
        method = (
            "find_all_with_siblings"
            if self._mode == "find_all"
            else "children_with_siblings"
        )
        root_fn, css = self._root_fn, self._css

        def groups(ctx: ExtractCtx):
            root = root_fn(ctx)
            if root is None:
                return []
            return getattr(root, method)(css, sibling_range)

        return SiblingsExpr(groups)

    # --- batch extractors (ref: ManyNodes.scala:8-37)
    @property
    def texts(self) -> Expr:
        return Expr(lambda c: self.fn(c).texts, ArrayType(StringType()))

    @property
    def codes(self) -> Expr:
        return Expr(lambda c: self.fn(c).codes, ArrayType(StringType()))

    @property
    def hrefs(self) -> Expr:
        return Expr(lambda c: self.fn(c).hrefs, ArrayType(StringType()))

    @property
    def srcs(self) -> Expr:
        return Expr(lambda c: self.fn(c).srcs, ArrayType(StringType()))

    def attrs(self, name: str) -> Expr:
        return Expr(lambda c: self.fn(c).attrs(name), ArrayType(StringType()))

    @property
    def size(self) -> Expr:
        return Expr(lambda c: len(self.fn(c)), IntegerType())

    # --- first-node extractors (ref: NodeContainer.scala findFirst chain)
    def _head(self, c) -> Optional[Any]:
        return _first(self.fn(c))

    @property
    def text(self) -> Expr:
        return Expr(lambda c: getattr(self._head(c), "text", None), StringType())

    @property
    def own_text(self) -> Expr:
        return Expr(
            lambda c: getattr(self._head(c), "own_text", None), StringType()
        )

    @property
    def code(self) -> Expr:
        return Expr(lambda c: getattr(self._head(c), "code", None), StringType())

    @property
    def href(self) -> Expr:
        return Expr(lambda c: getattr(self._head(c), "href", None), StringType())

    @property
    def src(self) -> Expr:
        return Expr(lambda c: getattr(self._head(c), "src", None), StringType())

    @property
    def breadcrumb(self) -> Expr:
        return Expr(
            lambda c: getattr(self._head(c), "breadcrumb", None), StringType()
        )

    def attr(self, name: str) -> Expr:
        return Expr(
            lambda c: n.attr(name) if (n := self._head(c)) is not None else None,
            StringType(),
        )

    @property
    def all_attrs(self) -> Expr:
        return Expr(
            lambda c: getattr(self._head(c), "all_attrs", None),
            MapType(StringType(), StringType()),
        )


class SiblingsExpr(Expr):
    """Evaluates to a list of Siblings groups (ref: doc/Siblings.scala:8-38)."""

    def __init__(self, groups_fn):
        super().__init__(groups_fn, ArrayType(StringType()))

    @property
    def texts(self) -> Expr:
        """One space-joined text per sibling group."""
        return Expr(
            lambda c: [g.text for g in self.fn(c)], ArrayType(StringType())
        )

    @property
    def size(self) -> Expr:
        return Expr(lambda c: len(self.fn(c)), IntegerType())


class DocSelector:
    """``S`` — the current document/scope; ``S("css")`` selects nodes
    (ref: the ``S"..."`` interpolator in the legacy DSL)."""

    def __init__(self, name: Optional[str] = None):
        self._name = name

    def __call__(self, css: str) -> NodesExpr:
        name = self._name

        def root_fn(ctx: ExtractCtx):
            return ctx.root(name)

        def fn(ctx: ExtractCtx) -> ManyNodes:
            root = root_fn(ctx)
            if root is None:
                return ManyNodes([])
            return root.find_all(css)

        return NodesExpr(fn, root_fn=root_fn, css=css, mode="find_all")

    def children(self, css: str) -> NodesExpr:
        """Direct-children-only selection (ref: NodeContainer.children)."""
        name = self._name

        def root_fn(ctx: ExtractCtx):
            return ctx.root(name)

        def fn(ctx: ExtractCtx) -> ManyNodes:
            root = root_fn(ctx)
            if root is None:
                return ManyNodes([])
            return root.children(css)

        return NodesExpr(fn, root_fn=root_fn, css=css, mode="children")

    # whole-document extractors
    @property
    def text(self) -> Expr:
        name = self._name
        return Expr(
            lambda c: r.text if (r := c.root(name)) is not None else None,
            StringType(),
        )

    @property
    def code(self) -> Expr:
        name = self._name
        return Expr(
            lambda c: r.code if (r := c.root(name)) is not None else None,
            StringType(),
        )

    @property
    def uri(self) -> Expr:
        name = self._name
        return Expr(
            lambda c: next(
                (o.uri for o in c.docs if o.success and (name is None or o.name == name)),
                None,
            ),
            StringType(),
        )

    @property
    def mime(self) -> Expr:
        name = self._name
        return Expr(
            lambda c: next(
                (o.mime for o in c.docs if o.success and (name is None or o.name == name)),
                None,
            ),
            StringType(),
        )

    @property
    def timestamp_ms(self) -> Expr:
        name = self._name
        return Expr(
            lambda c: next(
                (o.ts_ms for o in c.docs if o.success and (name is None or o.name == name)),
                None,
            ),
            LongType(),
        )


S = DocSelector()


def by_name(name: str) -> DocSelector:
    """``by_name("page")("a").texts`` — select from a named export."""
    return DocSelector(name)


def C(col: str, dtype: DataType = StringType()) -> Expr:
    """Column reference inside an extractor set."""
    return Expr(lambda ctx: ctx.row.get(col), dtype)


class _Trajectory:
    """Row-level view of the fetched docs (ref: row/AgentContext.scala:41-147:
    ``.docs``, ``.succeeded``, ``.failed``, ``.only``, ``.head``)."""

    @property
    def n_docs(self) -> Expr:
        return Expr(lambda c: len(c.docs), IntegerType())

    @property
    def n_succeeded(self) -> Expr:
        return Expr(lambda c: sum(1 for o in c.docs if o.success), IntegerType())

    @property
    def n_failed(self) -> Expr:
        return Expr(lambda c: sum(1 for o in c.docs if not o.success), IntegerType())

    @property
    def uris(self) -> Expr:
        return Expr(
            lambda c: [o.uri for o in c.docs if o.success], ArrayType(StringType())
        )

    @property
    def names(self) -> Expr:
        return Expr(
            lambda c: [o.name for o in c.docs if o.name], ArrayType(StringType())
        )

    @property
    def errors(self) -> Expr:
        return Expr(
            lambda c: [o.error for o in c.docs if o.error], ArrayType(StringType())
        )

    @property
    def statuses(self) -> Expr:
        return Expr(
            lambda c: [o.status for o in c.docs], ArrayType(IntegerType())
        )


T = _Trajectory()


def udf_expr(fn: Callable[[ExtractCtx], Any], dtype: DataType) -> Expr:
    """Escape hatch: arbitrary Python over the row context, with declared type."""
    return Expr(fn, dtype)
