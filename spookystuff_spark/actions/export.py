"""Doc validation (ref: actions/Export.scala:14-131): Accept wraps an export
and validates its observations; failure raises → error row + error dump."""

from __future__ import annotations

import dataclasses

from spookystuff_spark.actions.core import NO_OP, Action, Trace, register_action
from spookystuff_spark.doc.content_type import base_mime


class ValidationError(Exception):
    pass


@register_action
@dataclasses.dataclass(frozen=True)
class Accept(Action):
    """``Accept(body, policy)``; policies: status2xx | has_title | has_head |
    bypass (ref: Export.scala StatusCode2XX/HasTitle/HasHead/Bypass)."""

    body: Trace = NO_OP
    policy: str = "status2xx"

    @property
    def MAY_CHANGE_STATE(self):  # type: ignore[override]
        return any(a.MAY_CHANGE_STATE for a in self.body)

    @property
    def HAS_EXPORT(self):  # type: ignore[override]
        return self.body.has_export

    def children(self) -> Trace:
        return self.body

    def execute(self, agent) -> list:
        obs = self.body.execute(agent)
        for o in obs:
            self._validate(o)
        return obs

    def _validate(self, o) -> None:
        if self.policy == "bypass":
            return
        if self.policy == "status2xx":
            if o.status is not None and not (200 <= o.status < 300):
                raise ValidationError(f"status {o.status} for {o.uri}")
            return
        if self.policy in ("has_title", "has_head"):
            if base_mime(o.mime) not in ("text/html", "inode/directory"):
                raise ValidationError(f"not html: {o.mime}")
            tag = "title" if self.policy == "has_title" else "head"
            if not o.parsed().find_all(tag):
                raise ValidationError(f"missing <{tag}> in {o.uri}")
            return
        raise ValueError(f"unknown policy {self.policy!r}")
