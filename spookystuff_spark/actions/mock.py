"""Mock — inject canned observations, the no-network test seam
(ref: actions/Mock.scala:7-16, row/BuildRow.scala:8-32)."""

from __future__ import annotations

import dataclasses

from spookystuff_spark.actions.core import Action, register_action
from spookystuff_spark.doc.observation import Doc


@register_action
@dataclasses.dataclass(frozen=True)
class Mock(Action):
    """Emits a Doc built from inline fields; deterministic, cacheable."""

    uri: str = "mock://doc"
    content: bytes = b""
    mime: str = "text/html; charset=utf-8"
    status: int = 200

    HAS_EXPORT = True

    def execute(self, agent) -> list:
        agent.metrics_inc("pages_fetched_mock")
        return [
            Doc(
                uri=self.uri,
                mime=self.mime,
                status=self.status,
                content=self.content,
            )
        ]

    def __repr__(self) -> str:
        return f"Mock({self.uri!r})"
