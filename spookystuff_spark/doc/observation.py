"""Fetched evidence: Observation / Doc / NoDoc / ErrorObservation.

Ref parity: doc/Observation.scala:12-87, doc/Doc.scala:38-206, doc/NoDoc.scala.
A Doc's identity (`uid`) derives from its backtrace (the minimal replayable
action prefix that produced it) — that is what makes the doc cache
content-addressed and fetches idempotent under Spark task retry.

Spark representation: one row-column ``obs: array<struct<...>>`` (OBS_SCHEMA) —
plain columnar structs, never pickled blobs, so shuffles stay Tungsten-native.
Blobs above ``SpookyConf.inline_blob_max_bytes`` are offloaded to DFS and only
``saved_path`` travels in the row (ref: conf/SpookyConf.scala:38-50 auditing
split).
"""

from __future__ import annotations

import dataclasses
import hashlib
import time
from typing import Optional

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OBS_SCHEMA = StructType(
    [
        StructField("uid", StringType()),
        StructField("name", StringType()),
        StructField("uri", StringType()),
        StructField("mime", StringType()),
        StructField("status", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("success", BooleanType()),
        StructField("content", BinaryType()),
        StructField("saved_path", StringType()),
        StructField("error", StringType()),
        StructField("backtrace_key", StringType()),
        StructField("from_cache", BooleanType()),
    ]
)

OBS_ARRAY_SCHEMA = ArrayType(OBS_SCHEMA)


def now_ms() -> int:
    return int(time.time() * 1000)


@dataclasses.dataclass
class Observation:
    """Base evidence row (ref: doc/Observation.scala:23-45)."""

    uri: str
    name: Optional[str] = None  # export name (`.as("page")`)
    mime: Optional[str] = None
    status: Optional[int] = None
    ts_ms: int = dataclasses.field(default_factory=now_ms)
    backtrace_key: str = ""
    from_cache: bool = False

    success: bool = True
    content: Optional[bytes] = None
    saved_path: Optional[str] = None
    error: Optional[str] = None

    @property
    def uid(self) -> str:
        """DocUID (ref: doc/Observation.scala:56-87): backtrace + payload hash."""
        h = hashlib.sha256()
        h.update(self.backtrace_key.encode())
        h.update(b"\x00")
        h.update((self.uri or "").encode())
        if self.content is not None:
            h.update(self.content)
        return h.hexdigest()[:32]

    def to_row(self) -> dict:
        return {
            "uid": self.uid,
            "name": self.name,
            "uri": self.uri,
            "mime": self.mime,
            "status": self.status,
            "ts_ms": self.ts_ms,
            "success": self.success,
            "content": self.content,
            "saved_path": self.saved_path,
            "error": self.error,
            "backtrace_key": self.backtrace_key,
            "from_cache": self.from_cache,
        }

    @staticmethod
    def from_row(row) -> "Observation":
        d = row if isinstance(row, dict) else row.asDict()
        kwargs = {k: d.get(k) for k in (
            "uri", "name", "mime", "status", "ts_ms", "success",
            "content", "saved_path", "error", "backtrace_key", "from_cache",
        )}
        if isinstance(kwargs.get("content"), (bytearray, memoryview)):
            kwargs["content"] = bytes(kwargs["content"])
        kwargs["from_cache"] = bool(kwargs.get("from_cache"))
        cls = Doc if kwargs.get("content") is not None or kwargs.get("saved_path") else (
            ErrorObservation if kwargs.get("error") else NoDoc
        )
        return cls(**{k: v for k, v in kwargs.items() if v is not None or k in ("name",)})

    # --- doc querying entry point (ref: doc/Doc.scala:146-206)

    def parsed(self):
        """Parse content into a Node tree by detected mime (lazy, cached)."""
        from spookystuff_spark.doc.node import parse_node

        if getattr(self, "_parsed", None) is None:
            body = self.bytes()
            self._parsed = parse_node(body, self.mime, base_uri=self.uri)
        return self._parsed

    def bytes(self) -> bytes:
        if self.content is not None:
            return self.content
        if self.saved_path:
            with open(self.saved_path, "rb") as f:
                return f.read()
        return b""

    def text(self) -> str:
        charset = "utf-8"
        if self.mime and "charset=" in self.mime:
            charset = self.mime.split("charset=")[-1].strip()
        return self.bytes().decode(charset, errors="replace")


@dataclasses.dataclass
class Doc(Observation):
    """Successful fetch with a payload (ref: doc/Doc.scala:38-206)."""


@dataclasses.dataclass
class NoDoc(Observation):
    """Actions executed, nothing exported (ref: doc/NoDoc.scala)."""

    success: bool = True


@dataclasses.dataclass
class ErrorObservation(Observation):
    """Failed fetch — Either-style error evidence (ref: actions/Action.scala:109-129)."""

    success: bool = False
