"""Filesystem abstraction for the persistence layer, backed by ``pyarrow.fs``.

Every metadata / small-object IO operation of the doc cache
(``caching/dfs.py``), the versioned tables (``sources/upsert.py``,
``sources/versioned_source.py``) and the streaming state markers
(``streaming/sink.py``) goes through this module instead of ``os.path`` /
``glob`` / ``shutil``, so the same code runs unchanged on local disk, HDFS,
S3 or GCS. Reference parity: the reference routes its doc cache through the
Hadoop ``FileSystem`` API (module/core/.../caching/DFSDocCache.scala:13-46,
commons/.../io/HDFSResolver.scala via ``org.apache.hadoop.fs.Path``);
``pyarrow.fs`` is the Python-native equivalent fronting the same stores,
without a JVM round-trip per call.

Paths are plain strings, optionally carrying a URI scheme:

- no scheme (or ``file:``) → ``LocalFileSystem``
- ``s3a://`` is rewritten to ``s3://`` (Hadoop connector naming vs pyarrow's)
  so the path Spark writes to is the path Python reads from
- a scheme registered via :func:`register_fs` wins (test injection — e.g. an
  in-memory ``pyarrow.fs._MockFileSystem`` under ``mock://`` proves the
  persistence layer never touches POSIX)
- anything else → ``pyarrow.fs.FileSystem.from_uri``

Atomic publish: :func:`write_bytes` stages to a temp name + rename on local
filesystems (readers never see a partial file); object stores create objects
atomically on PUT, so a direct create is already safe there.

Scheme registrations live in the driver process; executors resolve paths
from the URI alone (local / s3 / hdfs / gcs), which is exactly what a real
cluster needs — the ``mock://`` hook is for driver-side tests.
"""

from __future__ import annotations

import posixpath
import uuid
from typing import Dict, List, Tuple

from pyarrow import fs as pafs

_REGISTRY: Dict[str, pafs.FileSystem] = {}
_CONDITIONAL_PUT: Dict[str, object] = {}


def register_fs(scheme: str, fs: pafs.FileSystem) -> None:
    """Route ``<scheme>://`` paths to ``fs`` (test/DI hook)."""
    _REGISTRY[scheme] = fs


def unregister_fs(scheme: str) -> None:
    _REGISTRY.pop(scheme, None)


def register_conditional_put(scheme: str, put_if_absent) -> None:
    """Store-side put-if-absent for ``<scheme>://`` paths — the hook that
    makes :func:`create_exclusive` a TRUE CAS on object stores.
    ``put_if_absent(path, data)`` must create the object atomically iff it
    does not exist and raise :class:`FileExistsError` otherwise — back it
    with the store's conditional write (S3 ``If-None-Match: *``, GCS
    ``ifGenerationMatch=0``, Azure ``If-None-Match``), which pyarrow.fs
    does not expose itself. Without a registration, object-store paths
    fall back to the documented check-then-PUT (a sub-millisecond window;
    single-writer deployments unaffected)."""
    _CONDITIONAL_PUT[scheme] = put_if_absent


def unregister_conditional_put(scheme: str) -> None:
    _CONDITIONAL_PUT.pop(scheme, None)


def _split_scheme(path: str) -> Tuple[str | None, str]:
    i = path.find("://")
    if i <= 0:
        return None, path
    return path[:i], path[i + 3 :]


def resolve(path: str) -> Tuple[pafs.FileSystem, str]:
    """(filesystem, filesystem-internal path) for any supported path."""
    scheme, rest = _split_scheme(path)
    if scheme is None:
        if path.startswith("file:"):  # file:/x (Hadoop-style, no //)
            return pafs.LocalFileSystem(), path[len("file:") :]
        return pafs.LocalFileSystem(), path
    if scheme in _REGISTRY:
        return _REGISTRY[scheme], rest
    if scheme == "file":
        return pafs.LocalFileSystem(), "/" + rest.lstrip("/")
    if scheme == "s3a":  # Hadoop's S3 connector scheme
        path = "s3://" + rest
    fs, p = pafs.FileSystem.from_uri(path)
    return fs, p


def filesystem_for(path: str) -> pafs.FileSystem:
    return resolve(path)[0]


def join(path: str, *parts: str) -> str:
    """URI-safe path join ("/" separator on every supported store)."""
    return posixpath.join(path, *parts)


def basename(path: str) -> str:
    return posixpath.basename(path.rstrip("/"))


def parent(path: str) -> str:
    return posixpath.dirname(path.rstrip("/"))


def _info(path: str) -> pafs.FileInfo:
    fs, p = resolve(path)
    return fs.get_file_info(p)


def exists(path: str) -> bool:
    return _info(path).type != pafs.FileType.NotFound


def is_dir(path: str) -> bool:
    return _info(path).type == pafs.FileType.Directory


def is_file(path: str) -> bool:
    return _info(path).type == pafs.FileType.File


def mkdirs(path: str) -> None:
    fs, p = resolve(path)
    fs.create_dir(p, recursive=True)


def ls(path: str) -> List[str]:
    """Sorted base names of a directory's direct children ([] if missing)."""
    fs, p = resolve(path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return sorted(posixpath.basename(fi.path.rstrip("/")) for fi in fs.get_file_info(sel))


def file_infos(path: str) -> List[Tuple[str, int]]:
    """[(base name, size)] of a directory's direct FILE children, sorted."""
    fs, p = resolve(path)
    sel = pafs.FileSelector(p, recursive=False, allow_not_found=True)
    return sorted(
        (posixpath.basename(fi.path), fi.size)
        for fi in fs.get_file_info(sel)
        if fi.type == pafs.FileType.File
    )


def sizes(paths: List[str]) -> List[int]:
    """File sizes, one ``get_file_info`` batch per filesystem (scheme)."""
    out = [0] * len(paths)
    by_scheme: Dict[str, Tuple[pafs.FileSystem, List[int], List[str]]] = {}
    for i, path in enumerate(paths):
        scheme = _split_scheme(path)[0] or ""
        if scheme not in by_scheme:
            by_scheme[scheme] = (resolve(path)[0], [], [])
        slot = by_scheme[scheme]
        slot[1].append(i)
        slot[2].append(resolve(path)[1])
    for fs, idxs, ps in by_scheme.values():
        for i, fi in zip(idxs, fs.get_file_info(ps)):
            out[i] = fi.size or 0
    return out


def read_bytes(path: str) -> bytes:
    # compression=None: byte-transparent IO. pyarrow defaults to 'detect',
    # which silently gunzips *.gz on read / gzips on write — callers here
    # (doc cache, manifests) manage compression themselves.
    fs, p = resolve(path)
    with fs.open_input_stream(p, compression=None) as f:
        return f.read()


def write_bytes(path: str, data: bytes) -> None:
    """Atomic publish: readers see the old content or all of the new one,
    never a partial write. Local: temp file + rename (atomic). Object
    stores / mock: a single create is already atomic at visibility."""
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        tmp = f"{p}.tmp-{uuid.uuid4().hex}"
        with fs.open_output_stream(tmp, compression=None) as f:
            f.write(data)
        fs.move(tmp, p)
    else:
        with fs.open_output_stream(p, compression=None) as f:
            f.write(data)


def touch(path: str) -> None:
    write_bytes(path, b"")


def create_exclusive(path: str, data: bytes) -> None:
    """Create-if-absent — the commit-arbitration primitive: when N writers
    race to create the same path, exactly one succeeds and the rest get
    :class:`FileExistsError` deterministically.

    Local: write a temp file, then hard-link it to the target name —
    ``link(2)`` is atomic and fails with EEXIST, so the winner's file
    appears complete (no torn content) and losers never clobber it. (This
    is a same-directory POSIX primitive internal to one backend, not a
    cross-store data-sharing mechanism.) Schemes with a registered
    conditional put (:func:`register_conditional_put`) get a TRUE
    store-side put-if-absent. Other object stores / registered test
    filesystems: existence check + atomic PUT — true put-if-absent needs a
    store-side conditional write (S3 ``If-None-Match``, GCS preconditions)
    that pyarrow.fs does not expose, so on those stores a sub-millisecond
    check-to-put window remains; single-writer-per-table deployments are
    unaffected, and the window is strictly narrower than the
    check-then-swap it replaces."""
    import errno
    import os

    scheme, _rest = _split_scheme(path)
    if scheme is not None and scheme in _CONDITIONAL_PUT:
        _CONDITIONAL_PUT[scheme](path, data)
        return
    fs, p = resolve(path)
    if isinstance(fs, pafs.LocalFileSystem):
        tmp = f"{p}.cas-{uuid.uuid4().hex}"
        with fs.open_output_stream(tmp, compression=None) as f:
            f.write(data)
        try:
            os.link(tmp, p)
        except OSError as ex:
            if ex.errno == errno.EEXIST:
                raise FileExistsError(path) from None
            raise
        finally:
            fs.delete_file(tmp)
        return
    if exists(path):
        raise FileExistsError(path)
    with fs.open_output_stream(p, compression=None) as f:
        f.write(data)


def delete_file(path: str, missing_ok: bool = True) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_file(p)
    except (FileNotFoundError, OSError):
        if not missing_ok:
            raise


def delete_dir(path: str, missing_ok: bool = True) -> None:
    fs, p = resolve(path)
    try:
        fs.delete_dir(p)
    except (FileNotFoundError, OSError):
        if not missing_ok:
            raise


def move(src: str, dst: str) -> None:
    """Same-filesystem move/rename (staging → committed names)."""
    fs, p_src = resolve(src)
    _, p_dst = resolve(dst)
    fs.move(p_src, p_dst)


def copy_file(src: str, dst: str) -> None:
    fs, p_src = resolve(src)
    fs2, p_dst = resolve(dst)
    if fs is fs2 or type(fs) is type(fs2):
        fs.copy_file(p_src, p_dst)
    else:  # cross-store copy: stream through this process
        with fs.open_input_stream(p_src, compression=None) as fin, fs2.open_output_stream(
            p_dst, compression=None
        ) as fout:
            fout.write(fin.read())


def open_input(path: str):
    """Random-access input file (what ``pq.ParquetFile`` wants)."""
    fs, p = resolve(path)
    return fs.open_input_file(p)


def list_files_recursive(path: str) -> List[str]:
    """Paths of all FILES under ``path`` (any depth), relative to it,
    sorted. [] when the directory is missing."""
    fs, p = resolve(path)
    sel = pafs.FileSelector(p, recursive=True, allow_not_found=True)
    base = p.rstrip("/") + "/"
    return sorted(
        fi.path[len(base):]
        for fi in fs.get_file_info(sel)
        if fi.type == pafs.FileType.File
    )
