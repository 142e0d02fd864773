"""Replayable Action/Trace algebra.

Ref parity: actions/Action.scala:21-174, actions/HasTrace.scala:25-53,
actions/Trace.scala:127-306, actions/Foundation.scala:13-23.

* ``a + b``            append (reference ``+>``)
* ``a * traceset``     cartesian product of trace-sets (reference ``*>``)
* ``a | b``            union of trace-sets (reference ``||``)
* ``trace.dry_run()``  minimal per-export backtraces (ref: Trace.scala:275-306)
* ``trace.state_change_only()`` prune non-mutating actions
* ``trace.key``        canonical hash — THE fetch-dedup / cache key; computed
  from the dry-run trace so politeness delays etc. never fragment the cache.

Everything serializes to plain JSON (``to_json``/``trace_from_json``): traces
travel in DataFrame string columns, never pickled blobs, so the fetch-dedup
``groupBy(trace_key)`` stays a Tungsten-native shuffle.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from typing import Any, Optional, Sequence

_ACTION_REGISTRY: dict[str, type] = {}


def register_action(cls):
    """Class decorator: makes the action JSON-round-trippable."""
    _ACTION_REGISTRY[cls.__name__] = cls
    return cls


@dataclasses.dataclass(frozen=True)
class Action:
    """One replayable agent step (ref: actions/Action.scala:21-163).

    Class-level taxonomy (ref: actions/HasTrace.scala:25-31):
    ``MAY_CHANGE_STATE`` — mutates agent/session state (navigation, input);
    ``HAS_EXPORT`` — produces an Observation;
    ``TIMEOUT_SEC`` — per-action override, None → conf default.
    """

    MAY_CHANGE_STATE = False
    HAS_EXPORT = False
    TIMEOUT_SEC = None  # no annotation — class attr, not a dataclass field
    # field names whose values are credentials: never serialized into trace
    # JSON (the __trace column is shuffled, checkpointed and error-dumped to
    # disk) — resolved from SpookyConf.credentials / env at execute time
    SECRET_FIELDS = ()  # no annotation — class attr, not a dataclass field

    # --- algebra -----------------------------------------------------------
    @property
    def trace(self) -> "Trace":
        return Trace((self,))

    def __add__(self, other) -> "Trace":
        return self.trace + other

    def __mul__(self, other) -> "TraceSet":
        return self.trace * other

    def __or__(self, other) -> "TraceSet":
        return self.trace | other

    def as_(self, name: str) -> "Named":
        return Named(self, name)

    # --- serialization -----------------------------------------------------
    def to_dict(self) -> dict:
        d: dict[str, Any] = {"#": type(self).__name__}
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if f.name in self.SECRET_FIELDS and v:
                v = REDACTED
            d[f.name] = _ser(v)
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True, separators=(",", ":"))

    # --- execution ---------------------------------------------------------
    def execute(self, agent) -> list:
        """Run against an Agent, returning Observations. Overridden by leaves."""
        return []

    def children(self) -> "Trace":
        """Nested trace for control blocks; empty for leaves."""
        return NO_OP


REDACTED = "__REDACTED__"


def _ser(v: Any) -> Any:
    if isinstance(v, Action):
        return v.to_dict()
    if isinstance(v, Trace):
        return [a.to_dict() for a in v.actions]
    if isinstance(v, (list, tuple)):
        return [_ser(x) for x in v]
    if isinstance(v, bytes):
        return {"#b": v.hex()}
    return v


def _deser(v: Any) -> Any:
    if isinstance(v, dict):
        if "#" in v:
            return action_from_dict(v)
        if "#b" in v:
            return bytes.fromhex(v["#b"])
        return v
    if isinstance(v, list):
        return [_deser(x) for x in v]
    return v


def action_from_dict(d: dict) -> Action:
    cls = _ACTION_REGISTRY.get(d.get("#", ""))
    if cls is None:
        raise KeyError(f"unregistered action type {d.get('#')!r}")
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name in d:
            v = _deser(d[f.name])
            if f.name in ("body", "trace") and isinstance(v, list):
                v = Trace(tuple(v))
            if v == REDACTED:
                v = ""  # re-resolved from conf/env at execute time
            kwargs[f.name] = v
    return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class Trace:
    """An ordered, replayable program of actions (ref: actions/Trace.scala:127-306)."""

    actions: tuple = ()

    # --- algebra -----------------------------------------------------------
    def __add__(self, other) -> "Trace":
        if isinstance(other, Action):
            return Trace(self.actions + (other,))
        if isinstance(other, Trace):
            return Trace(self.actions + other.actions)
        return NotImplemented

    def __mul__(self, other) -> "TraceSet":
        return TraceSet((self,)) * other

    def __or__(self, other) -> "TraceSet":
        return TraceSet((self,)) | other

    def __iter__(self):
        return iter(self.actions)

    def __len__(self):
        return len(self.actions)

    def __bool__(self) -> bool:
        return bool(self.actions)

    # --- taxonomy ----------------------------------------------------------
    @property
    def has_export(self) -> bool:
        return any(
            a.HAS_EXPORT or a.children().has_export for a in self.actions
        )

    def state_change_only(self) -> "Trace":
        """Keep only state-changing actions (ref: Trace.scala:275-306)."""
        return Trace(tuple(a for a in self.actions if a.MAY_CHANGE_STATE))

    def dry_run(self) -> list["Trace"]:
        """Minimal backtrace per export: the state-changing prefix + the export
        itself (ref: Trace.scala:275-306). These are the doc-cache keys."""
        out = []
        prefix: list[Action] = []
        for a in self.actions:
            if a.HAS_EXPORT or a.children().has_export:
                out.append(Trace(tuple(prefix) + (a,)))
            if a.MAY_CHANGE_STATE:
                prefix.append(a)
        return out

    # --- identity ----------------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            [a.to_dict() for a in self.actions], sort_keys=True, separators=(",", ":")
        )

    @property
    def canonical(self) -> "Trace":
        """Normal form for keying: pruned of actions that neither mutate state
        nor export (ref: caching/Foundation.scala:7-39 NormalFormKey)."""
        return Trace(
            tuple(
                a
                for a in self.actions
                if a.MAY_CHANGE_STATE or a.HAS_EXPORT or a.children().has_export
            )
        )

    @property
    def key(self) -> str:
        return hashlib.sha256(self.canonical.to_json().encode()).hexdigest()[:32]

    # --- execution ---------------------------------------------------------
    def execute(self, agent) -> list:
        obs = []
        for a in self.actions:
            obs.extend(agent.run_action(a))
        return obs

    def __repr__(self) -> str:
        return " +> ".join(repr(a) for a in self.actions) if self.actions else "NoOp"


@dataclasses.dataclass(frozen=True)
class TraceSet:
    """A set of alternative traces (ref: actions/Foundation.scala:13-23)."""

    traces: tuple = ()

    def __mul__(self, other) -> "TraceSet":
        other = as_trace_set(other)
        return TraceSet(
            tuple(t1 + t2 for t1 in self.traces for t2 in other.traces)
        )

    def __or__(self, other) -> "TraceSet":
        other = as_trace_set(other)
        return TraceSet(self.traces + other.traces)

    def __iter__(self):
        return iter(self.traces)

    def __len__(self):
        return len(self.traces)


def as_trace(x) -> Trace:
    if isinstance(x, Trace):
        return x
    if isinstance(x, Action):
        return x.trace
    if isinstance(x, (list, tuple)):
        t = Trace()
        for item in x:
            t = t + as_trace(item)
        return t
    raise TypeError(f"cannot convert {type(x).__name__} to Trace")


def as_trace_set(x) -> TraceSet:
    if isinstance(x, TraceSet):
        return x
    if isinstance(x, (Trace, Action)):
        return TraceSet((as_trace(x),))
    if isinstance(x, (list, tuple)):
        return TraceSet(tuple(as_trace(i) for i in x))
    raise TypeError(f"cannot convert {type(x).__name__} to TraceSet")


def trace_from_json(s: str) -> Trace:
    return Trace(tuple(action_from_dict(d) for d in json.loads(s)))


NO_OP = Trace()


@register_action
@dataclasses.dataclass(frozen=True)
class Named(Action):
    """Wrapper naming an export (reference ``.as('name)``)."""

    inner: Optional[Action] = None
    name: str = ""

    @property
    def MAY_CHANGE_STATE(self):  # type: ignore[override]
        return self.inner.MAY_CHANGE_STATE

    @property
    def HAS_EXPORT(self):  # type: ignore[override]
        return self.inner.HAS_EXPORT

    def execute(self, agent) -> list:
        out = self.inner.execute(agent)
        for o in out:
            o.name = self.name
        return out

    def children(self) -> Trace:
        return self.inner.children()

    def __repr__(self) -> str:
        return f"{self.inner!r}.as({self.name!r})"
