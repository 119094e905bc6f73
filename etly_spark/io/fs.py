"""Scheme-aware filesystem primitives for sink finalization (K1).

The reference serves multiple storage namespaces through its storage
providers (storage_provider.go:5-7) and uploads output from its workers
(target_transformation.go:29-53). This module is the Spark-side
equivalent surface: local paths (and ``file://``) map to ``os``
primitives; any other scheme (``s3a://``, ``gs://``, ``s3://``,
``hdfs://``, ...) routes through ``fsspec`` when it is installed
(import-gated — the test container has no object-store client).

Two classes of operation, deliberately separated:

- **metadata ops** (`listdir`, `makedirs`, `move`, `delete_tree`):
  O(1)-per-object bookkeeping the driver may perform — a local rename is
  an inode update, an object-store ``mv`` is a server-side copy. This is
  the same class of work Spark's own FileOutputCommitter does on commit.
- **byte ops** (`concat`): O(total bytes). These must run in executor
  tasks, never on the driver — `pipeline._finalize_routed` distributes
  them with ``sc.parallelize``. Everything here is a plain picklable
  module function (no py4j/JVM handles) precisely so tasks can ship to
  workers.
"""

from __future__ import annotations

import errno
import os
import re
import shutil

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
_COPY_CHUNK = 8 * 1024 * 1024


def scheme_of(url: str) -> str:
    m = _SCHEME_RE.match(url)
    return m.group(0)[:-3].lower() if m else ""


def is_local(url: str) -> bool:
    return scheme_of(url) in ("", "file")


def strip_file_scheme(url: str) -> str:
    return url[len("file://") :] if url.startswith("file://") else url


class _MockObjectStore:
    """A local filesystem wearing a remote scheme (``mock://``): every
    call takes the *non-local* branch of the fsio primitives, so the
    scheme-aware finalization path (executor uploads, no driver renames)
    is end-to-end testable in a container with no object-store client.
    The API is the subset of fsspec's AbstractFileSystem this module
    uses; paths are absolute local paths (``mock:///tmp/x`` → ``/tmp/x``),
    which also makes it visible identically from driver and executor
    worker processes."""

    def ls(self, path: str, detail: bool = True):
        if not os.path.isdir(path):
            raise FileNotFoundError(path)
        out = []
        with os.scandir(path) as it:
            for e in it:
                st = e.stat(follow_symlinks=False)
                out.append(
                    {
                        "name": e.path,
                        "size": st.st_size,
                        "type": "directory" if e.is_dir(follow_symlinks=False) else "file",
                    }
                )
        return out

    def makedirs(self, path: str, exist_ok: bool = True) -> None:
        os.makedirs(path, exist_ok=exist_ok)

    def put_file(self, lpath: str, rpath: str) -> None:
        shutil.copyfile(lpath, rpath)

    def mv(self, src: str, dst: str) -> None:
        os.replace(src, dst)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def rm_file(self, path: str) -> None:
        os.unlink(path)

    def open(self, path: str, mode: str = "rb"):
        return open(path, mode)

    def rm(self, path: str, recursive: bool = False) -> None:
        if recursive:
            shutil.rmtree(path)
        else:
            os.unlink(path)


def _fsspec_fs(url: str):
    """Resolve a non-local URL to an (fsspec filesystem, path) pair."""
    if scheme_of(url) == "mock":
        return _MockObjectStore(), url[len("mock://") :]
    try:
        import fsspec  # type: ignore
    except ImportError as e:  # environment gate, not a stub
        raise NotImplementedError(
            f"remote target '{url}' needs the fsspec package for scheme "
            f"'{scheme_of(url)}' (object-store client not installed in "
            "this environment)"
        ) from e
    from fsspec.core import url_to_fs  # type: ignore

    return url_to_fs(url)


def listdir(url: str) -> list[tuple[str, int, bool]]:
    """List direct children as (name, size, is_dir). Metadata only."""
    if is_local(url):
        path = strip_file_scheme(url)
        if not os.path.isdir(path):
            return []
        out = []
        with os.scandir(path) as it:
            for e in it:
                st = e.stat(follow_symlinks=False)
                out.append((e.name, st.st_size, e.is_dir(follow_symlinks=False)))
        return out
    fs, path = _fsspec_fs(url)
    out = []
    try:
        infos = fs.ls(path, detail=True)
    except FileNotFoundError:
        return []
    for info in infos:
        name = info["name"].rstrip("/").rsplit("/", 1)[-1]
        out.append((name, int(info.get("size") or 0), info.get("type") == "directory"))
    return out


def makedirs(url: str) -> None:
    if is_local(url):
        path = strip_file_scheme(url)
        if path:
            os.makedirs(path, exist_ok=True)
        return
    fs, path = _fsspec_fs(url)
    fs.makedirs(path, exist_ok=True)


def move(src: str, dst: str) -> None:
    """Rename/upload one object. Local→local is a rename (EXDEV falls
    back to copy+unlink); local→remote is an upload; remote→remote is a
    server-side move on the same filesystem."""
    if is_local(src) and is_local(dst):
        s, d = strip_file_scheme(src), strip_file_scheme(dst)
        try:
            os.replace(s, d)
        except OSError as e:
            if e.errno != errno.EXDEV:  # only cross-device falls back
                raise
            # copy to a temp sibling, then atomic replace — a crash never
            # leaves a half-written object at the final name
            tmp = f"{d}.__etly_tmp__{os.getpid()}"
            shutil.copyfile(s, tmp)
            os.replace(tmp, d)
            os.unlink(s)
        return
    if is_local(src):
        fs, path = _fsspec_fs(dst)
        fs.put_file(strip_file_scheme(src), path)
        os.unlink(strip_file_scheme(src))
        return
    fs, spath = _fsspec_fs(src)
    _, dpath = _fsspec_fs(dst)
    fs.mv(spath, dpath)


def exists(url: str) -> bool:
    if is_local(url):
        return os.path.exists(strip_file_scheme(url))
    fs, path = _fsspec_fs(url)
    return bool(fs.exists(path))


def delete(url: str) -> None:
    """Remove one object; missing is a no-op (idempotent cleanup)."""
    if is_local(url):
        try:
            os.unlink(strip_file_scheme(url))
        except FileNotFoundError:
            pass
        return
    fs, path = _fsspec_fs(url)
    try:
        fs.rm_file(path)
    except FileNotFoundError:
        pass


def open_read(url: str):
    if is_local(url):
        return open(strip_file_scheme(url), "rb")
    fs, path = _fsspec_fs(url)
    return fs.open(path, "rb")


def open_write(url: str):
    if is_local(url):
        return open(strip_file_scheme(url), "wb")
    fs, path = _fsspec_fs(url)
    return fs.open(path, "wb")


def concat(srcs: list[str], dst: str) -> None:
    """Stream-concatenate srcs into dst. O(bytes) — executor-side only
    (see module docstring). An empty srcs list creates an empty object.
    Valid for ndjson and for gzip (multi-member streams)."""
    with open_write(dst) as out:
        for s in srcs:
            with open_read(s) as f:
                shutil.copyfileobj(f, out, _COPY_CHUNK)


def concat_compress(srcs: list[str], dst: str, compression: str) -> None:
    """Concatenate srcs into dst under ``compression``
    (io/compress.SINK_CODECS name). Concatenatable formats (gzip
    members, multi-stream xz, lz4 frames, snappy framed streams)
    compress each src as its OWN member/frame — executor memory bounded
    by the largest staged part. Raw deflate does NOT concatenate (a
    zlib reader stops at the first end-of-block), so non-concatenatable
    codecs compress the WHOLE roll as one stream — memory bounded by
    the roll, which B1 caps at Target.MaxAllowedSize uncompressed.
    O(bytes), executor-side only."""
    from etly_spark.io import compress as _compress

    with open_write(dst) as out:
        if compression.lower() in _compress.CONCATENATABLE:
            for s in srcs:
                with open_read(s) as f:
                    out.write(_compress.compress_object(f.read(), compression))
        else:
            chunks = []
            for s in srcs:
                with open_read(s) as f:
                    chunks.append(f.read())
            out.write(_compress.compress_object(b"".join(chunks), compression))


def concat_warc(srcs: list[str], dst: str, per_record_gzip: bool) -> None:
    """Build a WARC object from staged ndjson parts: every staged line
    becomes ONE conversion record (the WET shape — what a text-extracted
    crawl shard is). Record fields come from the line's json: `text` is
    the payload, `uri` → WARC-Target-URI (omitted when absent),
    `warc_date` → WARC-Date (deterministic epoch default so a replayed
    finalization writes byte-identical output), `content_type` →
    WARC-Identified-Payload-Type (what the text WAS before extraction —
    the WARC 1.1 header Common Crawl WET uses for exactly this; the
    record's own Content-Type is always text/plain because the payload
    IS the extracted text). Record IDs are content-derived (md5 of the
    line) PLUS the record's position in this output object — stable
    across replays, and unique even when two identical records (an
    unchanged re-crawl) land in one file (WARC 1.1 requires per-record
    uniqueness, not per-distinct-content). Per-record gzip members when
    requested (the .warc.gz convention). Executor-side; memory bounded
    by one staged part."""
    import hashlib
    import json as _json

    from etly_spark.operators import warc as _warc

    seq = 0
    with open_write(dst) as out:
        for s in srcs:
            with open_read(s) as f:
                for ln in f.read().splitlines():
                    if not ln:
                        continue
                    rec = _json.loads(ln)
                    rid = f"{hashlib.md5(ln).hexdigest()}-{seq}"
                    seq += 1
                    headers = {
                        "WARC-Type": "conversion",
                        "WARC-Record-ID": f"<urn:md5:{rid}>",
                        "WARC-Date": rec.get("warc_date")
                        or "1970-01-01T00:00:00Z",
                        "Content-Type": "text/plain",
                    }
                    uri = rec.get("uri")
                    if uri:
                        headers["WARC-Target-URI"] = uri
                    ctype = rec.get("content_type")
                    if ctype:
                        headers["WARC-Identified-Payload-Type"] = ctype
                    out.write(
                        _warc.encode_warc(
                            [(headers, (rec.get("text") or "").encode())],
                            per_record_gzip=per_record_gzip,
                        )
                    )


def delete_tree(url: str) -> None:
    if is_local(url):
        shutil.rmtree(strip_file_scheme(url), ignore_errors=True)
        return
    fs, path = _fsspec_fs(url)
    try:
        fs.rm(path, recursive=True)
    except FileNotFoundError:
        pass
