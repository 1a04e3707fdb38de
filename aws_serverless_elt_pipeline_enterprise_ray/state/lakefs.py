"""Lake filesystem abstraction: POSIX fast path + rename-free
object-store path.

The reference's data plane is object-store-native end to end: the
landing zone, silver and gold layers are S3 prefixes and every writer
PUTs uniquely-named objects (``lambdas/transform/app.py:46-54,104``,
``lambdas/ingest/app.py:47-49``). Through round 2 this engine was
POSIX-only - atomic commit via ``os.replace``, clone via hard links -
which does not transfer to a multi-node cluster whose shared storage is
an object store with no atomic rename.

This module makes every lake/changelog location a URI:

* plain paths (``/data/lake``) keep the existing POSIX fast path
  byte-for-byte (O_EXCL creates, temp-write + ``os.replace``, fsync);
* ``<scheme>://...`` locations route through fsspec with an
  OBJECT-STORE CONTRACT: the engine only ever issues ``put`` (atomic,
  full-object), ``put-if-absent`` (conditional create, the S3
  ``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` primitive),
  ``get``, ``list``, ``delete`` and server-side ``copy``. NO rename,
  NO append, NO in-place mutation.

``s3sim://`` is the in-sandbox stand-in for S3: an fsspec filesystem
backed by the local disk (so it is shared across Ray worker
PROCESSES, unlike ``memory://`` whose store is per-process) that
*refuses* rename/append and emulates the server-side atomicity of
object PUTs internally (temp file + link/replace inside the shim is
the "server's" implementation detail - the client-visible API is
put/get/list/delete only). Conditional create maps to a hard-link
publish, which is atomic and all-or-nothing exactly like S3's
``If-None-Match``. The key space maps to absolute local paths
(``s3sim://tmp/x/lake`` <-> ``/tmp/x/lake``), so the filesystem is
STATELESS: any process reconstructing it from the URI alone - exactly
what Ray does when a dataset's filesystem is re-instantiated in a
worker - sees the same store with zero configuration.
"""

from __future__ import annotations

import io
import os
import posixpath
import shutil
import time
import uuid
from functools import lru_cache

import pyarrow as pa
import pyarrow.parquet as pq


# ---------------------------------------------------------------------------
# the S3-semantics shim (fsspec filesystem)
# ---------------------------------------------------------------------------


class _ShimUpload(io.BytesIO):
    """Buffered upload: bytes accumulate client-side and the object
    appears atomically on close (multipart-upload semantics)."""

    def __init__(self, fs: "ObjStoreShimFileSystem", path: str):
        super().__init__()
        self._fs = fs
        self._path = path
        self._committed = False

    def close(self):
        if not self._committed and not self.closed:
            self._committed = True
            self._fs.pipe_file(self._path, self.getvalue())
        super().close()


try:
    import fsspec
    from fsspec import AbstractFileSystem

    _HAVE_FSSPEC = True
except ImportError:  # pragma: no cover - fsspec ships with pyarrow/ray
    _HAVE_FSSPEC = False
    AbstractFileSystem = object


class ObjStoreShimFileSystem(AbstractFileSystem):
    """Local-directory-backed object store with S3 API semantics.

    Keys ARE absolute local paths (``s3sim://tmp/x/k`` <-> ``/tmp/x/k``)
    stored as ordinary files, so every Ray worker process sees the same
    store with no per-process configuration. The client API is
    put / put-if-absent / get / list / delete / copy; ``mv`` and
    append raise. Internal use of temp-file + link/replace emulates
    the SERVER's atomic-PUT guarantee and is invisible to clients
    (in-flight temps carry a reserved name prefix that listings hide).
    """

    protocol = "s3sim"
    root_marker = ""
    _TMP_PREFIX = ".s3sim-tmp-"

    # -- local mapping -------------------------------------------------
    def _local(self, path: str) -> str:
        return "/" + self._strip_protocol(path).lstrip("/")

    def _tmp(self, near: str) -> str:
        d = os.path.dirname(near)
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, self._TMP_PREFIX + uuid.uuid4().hex)

    # -- write path (atomic puts) --------------------------------------
    def pipe_file(self, path, value, **kwargs):
        """Atomic full-object PUT: readers see the old object or the
        new one, never a partial write."""
        lp = self._local(path)
        t = self._tmp(lp)
        with open(t, "wb") as f:
            f.write(value if isinstance(value, bytes) else bytes(value))
            f.flush()
            os.fsync(f.fileno())
        os.replace(t, lp)  # server-side atomicity emulation

    def put_if_absent(self, path, value) -> None:
        """Conditional create (S3 ``If-None-Match: *``): atomic,
        all-or-nothing; raises FileExistsError if the key exists."""
        lp = self._local(path)
        t = self._tmp(lp)
        with open(t, "wb") as f:
            f.write(value if isinstance(value, bytes) else bytes(value))
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(t, lp)  # atomic publish-if-absent, content complete
        except FileExistsError:
            raise FileExistsError(path) from None
        finally:
            os.unlink(t)

    def _open(self, path, mode="rb", **kwargs):
        if "r" in mode:
            return open(self._local(path), "rb")
        if "a" in mode or "+" in mode:
            raise NotImplementedError("object store: no append/update")
        if "x" in mode:
            if self.exists(path):
                raise FileExistsError(path)
        return _ShimUpload(self, path)

    # -- forbidden on object stores ------------------------------------
    def mv(self, *a, **k):
        raise NotImplementedError("object store: no rename - use put+delete")

    def _rm(self, path):  # pragma: no cover - base-class hook
        self.rm_file(path)

    # -- read path -----------------------------------------------------
    def cat_file(self, path, start=None, end=None, **kwargs):
        with open(self._local(path), "rb") as f:
            if start is not None:
                f.seek(start)
            if end is not None:
                return f.read(end - (start or 0))
            return f.read()

    def info(self, path, **kwargs):
        lp = self._local(path)
        key = self._strip_protocol(path)
        if os.path.isfile(lp):
            st = os.stat(lp)
            return {
                "name": key,
                "size": st.st_size,
                "type": "file",
                "mtime": st.st_mtime,
            }
        if os.path.isdir(lp):
            # object stores have no directories; a prefix with keys
            # under it reads as a pseudo-directory
            return {"name": key, "size": 0, "type": "directory"}
        raise FileNotFoundError(path)

    def exists(self, path, **kwargs):
        return os.path.exists(self._local(path))

    def ls(self, path, detail=True, **kwargs):
        lp = self._local(path)
        key = self._strip_protocol(path).strip("/")
        if os.path.isfile(lp):
            return [self.info(path)] if detail else [key]
        if not os.path.isdir(lp):
            raise FileNotFoundError(path)
        out = []
        for name in sorted(os.listdir(lp)):
            if name.startswith(self._TMP_PREFIX):
                continue
            child = f"{key}/{name}" if key else name
            out.append(self.info(child) if detail else child)
        return out

    def created(self, path):
        return self.modified(path)

    def modified(self, path):
        import datetime

        return datetime.datetime.fromtimestamp(
            os.stat(self._local(path)).st_mtime, tz=datetime.timezone.utc
        )

    # -- delete / copy -------------------------------------------------
    def rm_file(self, path):
        try:
            os.remove(self._local(path))
        except IsADirectoryError:  # pragma: no cover
            pass

    def rm(self, path, recursive=False, **kwargs):
        lp = self._local(path)
        if os.path.isdir(lp):
            if not recursive:
                raise IsADirectoryError(path)
            shutil.rmtree(lp)
        elif os.path.exists(lp):
            os.remove(lp)

    def cp_file(self, path1, path2, **kwargs):
        """Server-side object copy (the S3 CopyObject analogue)."""
        self.pipe_file(path2, self.cat_file(path1))

    def makedirs(self, path, exist_ok=True):
        # object stores have no directories - creating a "prefix" is a
        # no-op; keys mint their parents on write
        return

    def mkdir(self, path, **kwargs):
        return


if _HAVE_FSSPEC:
    fsspec.register_implementation("s3sim", ObjStoreShimFileSystem, clobber=True)


# ---------------------------------------------------------------------------
# real-object-store conditional create (the commit arbiter off-sandbox)
# ---------------------------------------------------------------------------
#
# The commit protocol needs exactly one primitive from the store:
# create-if-absent with full content. Real stores expose it natively:
#
# * S3: ``PutObject`` with ``If-None-Match: *`` (conditional writes,
#   GA since 2024-08) -> HTTP 412 ``PreconditionFailed`` (or 409
#   ``ConditionalRequestConflict`` while a concurrent conditional PUT
#   is in flight) when the key exists.
# * GCS: upload with ``ifGenerationMatch=0`` -> HTTP 412.
#
# fsspec's s3fs/gcsfs do not surface these preconditions, so the
# adapter below goes straight to the provider SDK for this ONE call;
# every other operation (put/get/list/delete/copy) stays on fsspec.
# The SDK client is resolved from the filesystem when it carries one
# (``_sync_s3_client`` / ``_sync_gcs_client`` - also the offline-test
# seam) else constructed from the filesystem's own storage options, so
# credentials/endpoint configuration is shared, not duplicated.


#: Retry policy for the conditional put (the ONE primitive the commit
#: arbiter needs; every other op inherits fsspec's own retries):
#: * DEFINITIVE EXISTS (412 PreconditionFailed / GCS ifGenerationMatch
#:   failure) -> FileExistsError immediately: a rival committed.
#: * IN-FLIGHT (S3 409 ConditionalRequestConflict): a RIVAL conditional
#:   put on the same key is mid-air and the outcome is UNKNOWN - the
#:   rival may yet fail. Re-attempt with jittered backoff until the
#:   store answers definitively (200 = we won after the rival failed,
#:   412 = the rival won). Mapping 409 straight to 'exists' would be
#:   safe (the statement-level retry re-resolves) but wasteful: it
#:   forces a whole fresh commit attempt where one PUT retry settles it.
#: * TRANSIENT (503 SlowDown / throttling / 500 InternalError /
#:   RequestTimeout / 502): jittered exponential backoff, bounded by
#:   GRAFT_COND_PUT_ATTEMPTS (default 8, ~6s worst case); then raise so
#:   a genuinely down store surfaces instead of hanging the committer.
_COND_PUT_ATTEMPTS_ENV = "GRAFT_COND_PUT_ATTEMPTS"

_TRANSIENT_S3_CODES = frozenset(
    {"SlowDown", "Throttling", "ThrottlingException", "RequestTimeout",
     "RequestTimeoutException", "InternalError", "ServiceUnavailable",
     "502", "503", "500"}
)


def _s3_error_exists(exc) -> bool:
    """Definitive 'key already exists': 412 PreconditionFailed."""
    r = getattr(exc, "response", None)
    if not isinstance(r, dict):
        return False
    if r.get("Error", {}).get("Code") == "PreconditionFailed":
        return True
    return r.get("ResponseMetadata", {}).get("HTTPStatusCode") == 412


def _s3_error_in_flight(exc) -> bool:
    """409 ConditionalRequestConflict: rival conditional PUT mid-air."""
    r = getattr(exc, "response", None)
    if not isinstance(r, dict):
        return False
    if r.get("Error", {}).get("Code") == "ConditionalRequestConflict":
        return True
    return r.get("ResponseMetadata", {}).get("HTTPStatusCode") == 409


def _s3_error_transient(exc) -> bool:
    r = getattr(exc, "response", None)
    if not isinstance(r, dict):
        return False
    if r.get("Error", {}).get("Code") in _TRANSIENT_S3_CODES:
        return True
    return r.get("ResponseMetadata", {}).get("HTTPStatusCode") in (
        500, 502, 503,
    )


def _retry_cond_put(do_put, key: str, is_exists, is_retryable) -> None:
    """Drive one conditional put to a DEFINITIVE outcome under the
    documented policy: success, FileExistsError, or - after bounded
    jittered backoff on retryable faults - the last fault re-raised."""
    import random
    import time as _time

    attempts = int(os.environ.get(_COND_PUT_ATTEMPTS_ENV, 8))
    delay = 0.05
    for attempt in range(attempts):
        try:
            do_put()
            return
        except Exception as e:  # noqa: BLE001 - classified below
            if is_exists(e):
                raise FileExistsError(key) from None
            if not is_retryable(e) or attempt == attempts - 1:
                raise
            _time.sleep(min(2.0, delay) * (0.5 + random.random()))
            delay *= 2


def _s3_conditional_put(fs):
    """put-if-absent over real S3: conditional ``PutObject`` with the
    documented retry policy (throttle backoff, 409 re-drive)."""
    client = getattr(fs, "_sync_s3_client", None)
    if client is None:  # pragma: no cover - needs boto3 + network
        import boto3

        kw = {}
        ck = (getattr(fs, "storage_options", {}) or {}).get("client_kwargs", {}) or {}
        if ck.get("endpoint_url"):
            kw["endpoint_url"] = ck["endpoint_url"]
        client = boto3.client("s3", **kw)

    def cond_put(key: str, data: bytes) -> None:
        bucket, _, k = key.lstrip("/").partition("/")
        _retry_cond_put(
            lambda: client.put_object(
                Bucket=bucket, Key=k, Body=data, IfNoneMatch="*"
            ),
            key,
            _s3_error_exists,
            lambda e: _s3_error_in_flight(e) or _s3_error_transient(e),
        )
        inv = getattr(fs, "invalidate_cache", None)
        if inv is not None:  # listings may be dircached by fsspec
            inv()

    return cond_put


def _gcs_conditional_put(fs):
    """put-if-absent over real GCS: upload with ``ifGenerationMatch=0``."""
    client = getattr(fs, "_sync_gcs_client", None)
    if client is None:  # pragma: no cover - needs google-cloud-storage
        from google.cloud import storage

        client = storage.Client()

    def _exists(e) -> bool:
        return (
            getattr(e, "code", None) == 412
            or "412" in type(e).__name__
            or "PreconditionFailed" in type(e).__name__
        )

    def _retryable(e) -> bool:
        return getattr(e, "code", None) in (429, 500, 502, 503) or any(
            t in type(e).__name__
            for t in ("TooManyRequests", "ServiceUnavailable",
                      "InternalServerError", "GatewayTimeout")
        )

    def cond_put(key: str, data: bytes) -> None:
        bucket, _, k = key.lstrip("/").partition("/")
        _retry_cond_put(
            lambda: client.bucket(bucket).blob(k).upload_from_string(
                data, if_generation_match=0
            ),
            key,
            _exists,
            _retryable,
        )
        inv = getattr(fs, "invalidate_cache", None)
        if inv is not None:
            inv()

    return cond_put


#: scheme -> conditional-put adapter factory. Backends whose scheme is
#: absent here AND whose filesystem lacks a native ``put_if_absent``
#: are REFUSED by ``create_exclusive`` - a lake whose commit arbiter
#: silently degraded to exists+put would corrupt under concurrency.
_COND_PUT_SCHEMES = {
    "s3": _s3_conditional_put,
    "s3a": _s3_conditional_put,
    "gs": _gcs_conditional_put,
    "gcs": _gcs_conditional_put,
}


# ---------------------------------------------------------------------------
# LakeFS: the engine-facing wrapper
# ---------------------------------------------------------------------------


_FS_PLUGINS_LOADED = False


def _load_fs_plugins() -> None:
    """Import the modules named in ``GRAFT_FS_MODULES`` (comma-separated)
    before resolving an fsspec scheme. Custom filesystem classes must be
    registered in EVERY process that touches the lake - Ray workers
    reconstruct a LakeFS from its URI string alone - and an env var is
    the one channel that reaches workers (they inherit the driver's
    environment at cluster start, or get it via runtime_env). Built-in
    schemes (s3fs/gcsfs entry points, the s3sim shim) need no plugin."""
    global _FS_PLUGINS_LOADED
    if _FS_PLUGINS_LOADED:
        return
    _FS_PLUGINS_LOADED = True
    import importlib

    for mod in filter(None, os.environ.get("GRAFT_FS_MODULES", "").split(",")):
        try:
            importlib.import_module(mod.strip())
        except ImportError:  # pragma: no cover - plugin absent here
            pass


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class LakeFS:
    """Every filesystem touch the engine makes, over either backend.

    POSIX backend (plain paths): identical to the pre-round-3 behavior
    - O_EXCL creates, temp-write + ``os.replace`` + dir fsync.

    Object backend (``scheme://...``): the rename-free contract above.
    ``write_atomic`` is a plain PUT (object PUTs are atomic);
    ``create_exclusive`` is a conditional create - atomic on backends
    exposing one (``s3sim``, and real S3/GCS/Azure conditional puts),
    exists-check + put best-effort elsewhere.

    Instances are cheap and picklable (state is the base string);
    worker-side code rebuilds via the process-local ``lakefs()`` cache.
    """

    def __init__(self, base: str):
        self.base = base.rstrip("/")
        self.is_object = "://" in base

    # -- lazy fsspec handles (never pickled) ---------------------------
    def __getstate__(self):
        return {"base": self.base, "is_object": self.is_object}

    @property
    def fs(self):
        if not self.is_object:
            raise RuntimeError("posix backend has no fsspec handle")
        f = getattr(self, "_fs", None)
        if f is None:
            import fsspec

            _load_fs_plugins()
            f = fsspec.filesystem(self.base.split("://", 1)[0])
            self._fs = f
        return f

    def pyarrow_fs(self):
        """A pyarrow FileSystem for ray.data read_/write_parquet
        (``None`` on POSIX - Ray's default local handling is faster)."""
        if not self.is_object:
            return None
        f = getattr(self, "_pafs", None)
        if f is None:
            from pyarrow.fs import FSSpecHandler, PyFileSystem

            f = PyFileSystem(FSSpecHandler(self.fs))
            self._pafs = f
        return f

    # -- paths ---------------------------------------------------------
    def full(self, *rel: str) -> str:
        parts = [p for p in rel if p]
        if not parts:
            return self.base
        if self.is_object:
            return posixpath.join(self.base, *parts)
        return os.path.join(self.base, *parts)

    def rel(self, path: str) -> str:
        """Base-relative form (what manifests store)."""
        if self.is_object:
            strip = self.strip(self.base).rstrip("/")
            p = self.strip(path)
            if p.startswith(strip + "/"):
                return p[len(strip) + 1:]
            return posixpath.relpath(p, strip)
        return os.path.relpath(path, self.base)

    def strip(self, path: str) -> str:
        """Scheme-less path (what a pyarrow filesystem consumes)."""
        if "://" in path:
            return path.split("://", 1)[1]
        return path

    # -- queries ---------------------------------------------------------
    def exists(self, path: str) -> bool:
        return self.fs.exists(self.strip(path)) if self.is_object else os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return self.fs.isdir(self.strip(path)) if self.is_object else os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        """Basenames of direct children ([] if the prefix is empty)."""
        if self.is_object:
            try:
                return sorted(
                    posixpath.basename(p.rstrip("/"))
                    for p in self.fs.ls(self.strip(path), detail=False)
                )
            except FileNotFoundError:
                return []
        try:
            return sorted(os.listdir(path))
        except FileNotFoundError:
            return []

    def walk_files(self, path: str) -> list[str]:
        """All file paths (full form) under a prefix, sorted."""
        if self.is_object:
            sp = self.strip(path)
            try:
                found = self.fs.find(sp)
            except FileNotFoundError:
                return []
            scheme = self.base.split("://", 1)[0]
            return sorted(f"{scheme}://{p}" for p in found)
        out = []
        for root, _dirs, files in os.walk(path):
            out.extend(os.path.join(root, f) for f in files)
        return sorted(out)

    def size(self, path: str) -> int:
        if self.is_object:
            return self.fs.info(self.strip(path))["size"]
        return os.path.getsize(path)

    def mtime(self, path: str) -> float:
        if self.is_object:
            return self.fs.modified(self.strip(path)).timestamp()
        return os.path.getmtime(path)

    # -- read ------------------------------------------------------------
    def read_bytes(self, path: str) -> bytes:
        if self.is_object:
            return self.fs.cat_file(self.strip(path))
        with open(path, "rb") as f:
            return f.read()

    def read_text(self, path: str) -> str:
        return self.read_bytes(path).decode()

    # -- write -----------------------------------------------------------
    def makedirs(self, path: str) -> None:
        if not self.is_object:
            os.makedirs(path, exist_ok=True)

    def write_atomic(self, path: str, data: "bytes | str") -> None:
        """All-or-nothing visibility: object PUT, or POSIX temp +
        ``os.replace`` + dir fsync."""
        if isinstance(data, str):
            data = data.encode()
        if self.is_object:
            self.fs.pipe_file(self.strip(path), data)
            return
        tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
        _fsync_dir(os.path.dirname(os.path.abspath(path)))

    def create_exclusive(self, path: str, data: "bytes | str") -> None:
        """Create-if-absent with full content, raising FileExistsError
        on conflict - the commit-race arbiter. Atomic everywhere it is
        allowed to run: POSIX ``O_EXCL``, a native ``put_if_absent``
        (the shim), or a real store's conditional PUT (S3
        ``If-None-Match: *`` / GCS ``ifGenerationMatch=0`` via
        ``_COND_PUT_SCHEMES``). Backends with NO conditional-create
        primitive are refused outright - a lake whose commit arbiter
        degrades to exists-then-put corrupts under concurrent writers."""
        if isinstance(data, str):
            data = data.encode()
        if self.is_object:
            cp = getattr(self, "_cond_put", None)
            if cp is None:
                fs = self.fs
                native = getattr(fs, "put_if_absent", None)
                if callable(native):
                    cp = native
                else:
                    scheme = self.base.split("://", 1)[0]
                    factory = _COND_PUT_SCHEMES.get(scheme)
                    if factory is None:
                        raise NotImplementedError(
                            f"backend {scheme!r} has no conditional-create "
                            "primitive; refusing to run the commit arbiter "
                            "on exists-then-put (register one in "
                            "_COND_PUT_SCHEMES or use s3://, gs://, s3sim://)"
                        )
                    cp = factory(fs)
                self._cond_put = cp
            cp(self.strip(path), data)
            return
        # Crash-atomic exclusive create: write+fsync a private temp,
        # then hard-link it into place - link(2) fails EEXIST atomically
        # and the target is complete-or-absent (a crash mid-write can
        # never leave a partial version file, which lets the manifest
        # store roll forward any file it finds instead of aging it).
        import uuid as _uuid

        tmp = f"{path}.x{_uuid.uuid4().hex[:8]}"
        fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            raise
        os.unlink(tmp)
        _fsync_dir(os.path.dirname(os.path.abspath(path)))

    def remove(self, path: str) -> None:
        if self.is_object:
            self.fs.rm_file(self.strip(path))
        else:
            os.remove(path)

    def remove_if_exists(self, path: str) -> None:
        try:
            self.remove(path)
        except FileNotFoundError:
            pass

    def copy_file(self, src: str, dst: str) -> None:
        """Server-side copy on object stores; hard link (COW clone
        cost) on POSIX, falling back to a byte copy across devices."""
        if self.is_object:
            self.fs.cp_file(self.strip(src), self.strip(dst))
            return
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        try:
            os.link(src, dst)
        except OSError:
            shutil.copyfile(src, dst)

    def prune_empty_dirs(self, path: str) -> None:
        """Remove now-empty directories bottom-up (no-op on object
        stores, which have no directories)."""
        if self.is_object:
            return
        for root, dirs, files in os.walk(path, topdown=False):
            if root != path and not dirs and not files:
                try:
                    os.rmdir(root)
                except OSError:  # pragma: no cover
                    pass

    # -- parquet ---------------------------------------------------------
    def read_parquet(self, path: str, **kw) -> pa.Table:
        if self.is_object:
            return pq.read_table(self.strip(path), filesystem=self.pyarrow_fs(), **kw)
        return pq.read_table(path, **kw)

    def read_parquet_schema(self, path: str) -> pa.Schema:
        """Footer-only schema read (no data pages leave storage)."""
        if self.is_object:
            return pq.read_schema(self.strip(path), filesystem=self.pyarrow_fs())
        return pq.read_schema(path)

    def read_parquet_metadata(self, path: str):
        """Footer-only metadata read (row-group stats for pruning)."""
        if self.is_object:
            return pq.read_metadata(self.strip(path), filesystem=self.pyarrow_fs())
        return pq.read_metadata(path)

    def write_parquet(self, tbl: pa.Table, path: str, **kw) -> None:
        kw.setdefault("compression", "snappy")
        if self.is_object:
            pq.write_table(tbl, self.strip(path), filesystem=self.pyarrow_fs(), **kw)
            return
        pq.write_table(tbl, path, **kw)

    def ray_read_parquet(self, paths: "str | list[str]", **kw):
        """``ray.data.read_parquet`` routed through this backend."""
        import ray.data as rd

        if self.is_object:
            ps = [paths] if isinstance(paths, str) else list(paths)
            return rd.read_parquet(
                [self.strip(p) for p in ps], filesystem=self.pyarrow_fs(), **kw
            )
        return rd.read_parquet(paths, **kw)


@lru_cache(maxsize=64)
def lakefs(base: str) -> LakeFS:
    """Process-local LakeFS cache - call sites (including Ray workers)
    resolve their backend from the location string alone."""
    return LakeFS(base)


def fs_for(path: str) -> LakeFS:
    """Backend for ONE absolute path/URI (LakeFS ops other than
    ``full``/``rel`` never consult the base)."""
    if "://" in path:
        return lakefs(path.split("://", 1)[0] + "://x")
    return lakefs("/")
