"""Control-flow blocks and waits (ref: actions/ControlBlock.scala:74-163,
actions/Delay.scala:16-47, actions/Wayback.scala:7-35)."""

from __future__ import annotations

import dataclasses
import random
import time

from spookystuff_spark.actions.core import NO_OP, Action, Trace, register_action


@register_action
@dataclasses.dataclass(frozen=True)
class Delay(Action):
    """Politeness wait — excluded from trace identity (no state change, no
    export → pruned by Trace.canonical), so delays never fragment the cache."""

    seconds: float = 1.0

    def execute(self, agent) -> list:
        time.sleep(self.seconds)
        return []

    def __repr__(self) -> str:
        return f"Delay({self.seconds})"


@register_action
@dataclasses.dataclass(frozen=True)
class RandomDelay(Action):
    min_seconds: float = 1.0
    max_seconds: float = 2.0

    def execute(self, agent) -> list:
        time.sleep(random.uniform(self.min_seconds, self.max_seconds))
        return []


@register_action
@dataclasses.dataclass(frozen=True)
class Loop(Action):
    """Repeat block until exception or limit (ref: ControlBlock.scala:133-163)."""

    body: Trace = NO_OP
    limit: int = 16  # ref: ControlBlock.scala:68

    @property
    def MAY_CHANGE_STATE(self):  # type: ignore[override]
        return any(a.MAY_CHANGE_STATE for a in self.body)

    @property
    def HAS_EXPORT(self):  # type: ignore[override]
        return self.body.has_export

    def children(self) -> Trace:
        return self.body

    def execute(self, agent) -> list:
        out = []
        for _ in range(self.limit):
            try:
                out.extend(self.body.execute(agent))
            except Exception:
                break
        return out

    def __repr__(self) -> str:
        return f"Loop({self.body!r}, limit={self.limit})"


@register_action
@dataclasses.dataclass(frozen=True)
class LocalRetry(Action):
    """Retry block on failure without failing the whole trace
    (ref: ControlBlock.scala:74-120)."""

    body: Trace = NO_OP
    retries: int = 3
    delay_sec: float = 0.0

    @property
    def MAY_CHANGE_STATE(self):  # type: ignore[override]
        return any(a.MAY_CHANGE_STATE for a in self.body)

    @property
    def HAS_EXPORT(self):  # type: ignore[override]
        return self.body.has_export

    def children(self) -> Trace:
        return self.body

    def execute(self, agent) -> list:
        last_err = None
        for attempt in range(self.retries):
            try:
                return self.body.execute(agent)
            except Exception as e:  # noqa: BLE001
                last_err = e
                if self.delay_sec:
                    time.sleep(self.delay_sec)
        raise last_err  # type: ignore[misc]


@register_action
@dataclasses.dataclass(frozen=True)
class Wayback(Action):
    """Pin the doc-cache time-travel upper bound for subsequent exports
    (ref: actions/Wayback.scala:7-35; consumed in caching)."""

    ts_ms: int = 0

    def execute(self, agent) -> list:
        agent.session_state["wayback_ms"] = self.ts_ms
        return []
