"""Doc persistence: Trajectory.save / audit / error-dump parity
(ref: row/AgentContext.scala:134-145 save, actions/Action.scala:109-129
error dump, conf/SpookyConf.scala:38-50 audit path encoders).

``save_docs`` writes each observation's payload to ``{root}/{uid}{ext}`` from
the executors (one pass, no driver collect); extension derives from the
detected mime. Writes are idempotent by uid — task retries overwrite the same
content-addressed file. IO goes through fsio (pyarrow.fs), so ``root`` may be
local, HDFS or an object store — each executor re-resolves the filesystem
from the path URI (ref parity: save routes through Hadoop ``FileSystem`` via
HDFSResolver in the reference, row/AgentContext.scala:134-145).
"""

from __future__ import annotations

import mimetypes
from typing import Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from spookystuff_spark.doc.content_type import base_mime
from spookystuff_spark.plans.fetch import OBS_COL

_EXT_OVERRIDES = {
    "text/html": ".html",
    "application/json": ".json",
    "inode/directory": ".html",
    "text/plain": ".txt",
}


def _ext_for(mime: Optional[str]) -> str:
    base = base_mime(mime)
    if base in _EXT_OVERRIDES:
        return _EXT_OVERRIDES[base]
    return mimetypes.guess_extension(base) or ".bin"


def save_docs(
    df: DataFrame,
    root: str,
    errors_only: bool = False,
) -> DataFrame:
    """Persist observation payloads; returns (uid, uri, saved_path, n_bytes).

    ``errors_only=True`` is the reference's error-dump: only failed
    observations are saved (as .err.txt with the error text)."""
    out_schema = StructType(
        [
            StructField("uid", StringType()),
            StructField("uri", StringType()),
            StructField("saved_path", StringType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        from spookystuff_spark import fsio

        fsio.mkdirs(root)
        for pdf in batches:
            rows = []
            for obs_list in pdf[OBS_COL]:
                if obs_list is None:
                    continue
                for o in obs_list:
                    d = dict(o)
                    failed = not d.get("success")
                    if errors_only and not failed:
                        continue
                    if failed:
                        payload = (d.get("error") or "").encode()
                        path = fsio.join(root, f"{d['uid']}.err.txt")
                    else:
                        payload = bytes(d.get("content") or b"")
                        path = fsio.join(root, f"{d['uid']}{_ext_for(d.get('mime'))}")
                    fsio.write_bytes(path, payload)  # atomic publish
                    rows.append(
                        {
                            "uid": d["uid"],
                            "uri": d.get("uri"),
                            "saved_path": path,
                            "n_bytes": len(payload),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["uid", "uri", "saved_path", "n_bytes"]
            ) if rows else pd.DataFrame(columns=["uid", "uri", "saved_path", "n_bytes"])

    return df.select(OBS_COL).mapInPandas(run, out_schema)
