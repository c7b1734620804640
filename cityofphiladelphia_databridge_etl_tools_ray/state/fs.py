"""Lake storage abstraction — POSIX fast path + object-store protocol.

Why this exists: the lake's exactly-once commit was originally built
on ``os.replace`` (tmp → fsync → atomic rename), which only exists on
a POSIX filesystem.  On the brief's actual target — a multi-node Ray
cluster where merge actors on different nodes share an object store
(the reference's own interchange is S3-native: ``postgres/_s3.py``,
``oracle/_s3.py``) — rename is either absent or non-atomic.  This
module splits the lake's I/O into two primitives with per-backend
implementations:

- **objects** — write-once immutable payloads (content-named data
  files, snapshots, intent files, staged txn manifests).  POSIX:
  tmp + fsync + replace.  Object store: one whole-object PUT, which
  is atomic by the object-store contract (an object is never visible
  partially written).
- **pointers** — the mutable "current state" markers (per-partition
  ``manifest.json``, the lake-level ``lake.json``).  POSIX: the
  rename swap, as before.  Object store: a **versioned commit log**
  (the Delta-log idea): pointer ``P`` is realized as objects
  ``P.v/cv-<version 10d>``; a write commits the next version with a
  CONDITIONAL create (see below), a read lists ``P.v/`` and takes
  the lexicographically-largest entry.

Commit-point crash matrix (object backend):

=====================================  =====================================
crash point                            outcome
=====================================  =====================================
after data PUT, before pointer PUT     orphan object; ``vacuum`` reclaims;
                                       a retry re-PUTs the same content-
                                       named object (idempotent)
during pointer PUT                     version N+1 either exists fully or
                                       not at all (PUT atomicity); readers
                                       keep resolving version N
retried writer re-commits version N+1  conditional create FAILS (version
                                       taken); the retry reads the winner —
                                       identical bytes → success (its twin
                                       already committed); different bytes →
                                       retry at version N+2 (serialized)
publish_txn: after pointer PUT,        recovery re-publishes (re-commit of
before staged-object delete            identical content, new version) and
                                       deletes the staged object — converges
=====================================  =====================================

Writer contract: the replay assigns each partition to exactly one
merge task, but a "dead" task's zombie twin (network partition, Ray
speculative retry) can still be running — so the version commit is a
COMPARE-AND-SWAP, not a blind PUT.  :meth:`ObjectStorage.put_pointer`
allocates the next version by LIST, then commits it with
:meth:`ObjectStorage.put_object_if_absent`; exactly one writer wins a
given version, the loser re-reads and either recognizes its own bytes
(idempotent zombie retry) or retries at the next version — a total
order of commits with no lost update.  The exclusive create is real
on the ``norename://`` test backend (content written to a temp file,
``os.link`` to the final version name — atomic, full-content,
fails-if-exists: exactly S3 ``If-None-Match: *`` PUT semantics); on a
generic pyarrow filesystem without conditional-write support it
degrades to HEAD + PUT + read-back-verify (detects and retries a
conflicting overwrite; the residual ABA window is closed only by a
real conditional PUT — S3 ``If-None-Match``, GCS generation-0 — which
is the documented production hook at
:meth:`ObjectStorage.put_object_if_absent`).  ``gc_pointer`` (vacuum)
keeps only the newest version; like the POSIX vacuum it assumes no
concurrent reader holds an older listing.

Backend selection rides IN THE ROOT STRING, so worker-side
``TranscriptLake(root)`` reconstruction needs no extra plumbing:

- ``/abs/path``              → :class:`PosixStorage` (unchanged)
- ``norename:///abs/path``   → :class:`ObjectStorage` over a local
  filesystem whose ``move`` RAISES — the test backend proving the
  whole lake/txn/rescale/follow protocol runs without rename
- ``s3://bucket/prefix`` etc → :class:`ObjectStorage` over
  ``pyarrow.fs.FileSystem.from_uri`` (same code path as norename)
"""

from __future__ import annotations

import json
import os
import posixpath
import tempfile

NORENAME_SCHEME = "norename://"


# ---------------------------------------------------------------------------
# POSIX backend — byte-for-byte today's behavior
# ---------------------------------------------------------------------------


class PosixStorage:
    """Local-filesystem backend: pointers are plain files swapped with
    tmp + fsync + ``os.replace`` (the reference's Carto rename-swap,
    carto/carto_.py:422-436)."""

    scheme = ""

    def __init__(self, base: str):
        self.base = base

    # -- paths ---------------------------------------------------------
    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    # -- objects (write-once) -----------------------------------------
    def put_object(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".obj-", suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def get_object(self, path: str) -> bytes:
        with open(path, "rb") as f:
            return f.read()

    def open_input(self, path: str):
        return open(path, "rb")

    def open_input_file(self, path: str):
        """Seekable (random-access) handle — same as open_input on
        POSIX."""
        return open(path, "rb")

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def size(self, path: str) -> int:
        return os.path.getsize(path)

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            os.unlink(path)
        except FileNotFoundError:
            if not missing_ok:
                raise

    def list_objects(self, dirpath: str) -> list[str]:
        """Names of regular files directly under ``dirpath`` ([] if
        the directory does not exist)."""
        try:
            return sorted(
                n
                for n in os.listdir(dirpath)
                if os.path.isfile(os.path.join(dirpath, n))
            )
        except (FileNotFoundError, NotADirectoryError):
            return []

    def list_subdirs(self, dirpath: str) -> list[str]:
        try:
            return sorted(
                n
                for n in os.listdir(dirpath)
                if os.path.isdir(os.path.join(dirpath, n))
            )
        except (FileNotFoundError, NotADirectoryError):
            return []

    def is_dir(self, path: str) -> bool:
        return os.path.isdir(path)

    def ensure_dir(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)

    def remove_dir_if_empty(self, dirpath: str) -> bool:
        try:
            if not os.listdir(dirpath):
                os.rmdir(dirpath)
                return True
        except FileNotFoundError:
            return True
        return False

    # -- pointers ------------------------------------------------------
    def put_pointer(self, path: str, data: bytes) -> None:
        self.put_object(path, data)  # tmp + fsync + atomic replace

    def get_pointer(self, path: str) -> bytes | None:
        try:
            with open(path, "rb") as f:
                return f.read()
        except FileNotFoundError:
            return None

    def delete_pointer(self, path: str) -> None:
        self.delete(path)

    def pointer_exists(self, path: str) -> bool:
        return os.path.exists(path)

    def list_pointers(self, dirpath: str) -> list[str]:
        """Logical pointer names under ``dirpath`` — on POSIX a
        pointer IS a file, so this equals :meth:`list_objects`
        (callers filter by name convention)."""
        return self.list_objects(dirpath)

    def publish_staged(self, staged_path: str, pointer_path: str) -> None:
        """Flip a staged (write-once) manifest object to the current
        pointer: the atomic rename."""
        os.replace(staged_path, pointer_path)

    def gc_pointer(self, path: str) -> list[str]:
        """Reclaim superseded pointer versions — nothing to do on
        POSIX (the replace already discarded the old bytes)."""
        return []

    # -- parquet -------------------------------------------------------
    @property
    def pa_filesystem(self):
        return None  # plain paths; Ray/pyarrow resolve locally

    def read_table(self, path: str, columns: list[str] | None = None):
        import pyarrow.parquet as pq

        return pq.read_table(path, columns=columns)

    def read_parquet_schema(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_schema(path)

    def read_parquet_metadata(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_metadata(path)

    # -- json convenience ---------------------------------------------
    def put_json(self, path: str, obj: dict, *, pointer: bool = False) -> None:
        data = json.dumps(obj).encode()
        (self.put_pointer if pointer else self.put_object)(path, data)

    def get_json(self, path: str, *, pointer: bool = False) -> dict | None:
        raw = self.get_pointer(path) if pointer else (
            self.get_object(path) if self.exists(path) else None
        )
        return None if raw is None else json.loads(raw)


# ---------------------------------------------------------------------------
# Object-store backend — versioned-pointer commit log, rename-free
# ---------------------------------------------------------------------------

_PTR_SUFFIX = ".v"  # pointer P lives at P.v/cv-<version 10d>
_CAS_MAX_ATTEMPTS = 64  # version-conflict retries before giving up


class ObjectStorage:
    """Generic backend over a ``pyarrow.fs.FileSystem`` that NEVER
    calls ``move``: objects are single atomic PUTs; pointers are
    versioned commit-log directories (module docstring)."""

    def __init__(self, base: str, fs, scheme: str = ""):
        self.base = base
        self.fs = fs
        self.scheme = scheme

    def join(self, *parts: str) -> str:
        return posixpath.join(*parts)

    # -- objects -------------------------------------------------------
    def put_object(self, path: str, data: bytes) -> None:
        # parent "directories" are a no-op namespace on object stores;
        # LocalFileSystem (the test backend) needs them created
        self.fs.create_dir(posixpath.dirname(path), recursive=True)
        with self.fs.open_output_stream(path) as f:
            f.write(data)

    def get_object(self, path: str) -> bytes:
        with self.fs.open_input_stream(path) as f:
            return f.read()

    def open_input(self, path: str):
        # compression=None: the pyarrow FileSystem API DEFAULTS to
        # compression='detect', which would transparently gunzip .gz
        # objects — callers of this method need the RAW bytes (fsck
        # hashes them; the changelog reader layers its own codec)
        return self.fs.open_input_stream(path, compression=None)

    def open_input_file(self, path: str):
        """Seekable (random-access) handle — what feather/parquet
        readers require."""
        return self.fs.open_input_file(path)

    def _info(self, path: str):
        from pyarrow.fs import FileType

        info = self.fs.get_file_info([path])[0]
        return None if info.type == FileType.NotFound else info

    def exists(self, path: str) -> bool:
        return self._info(path) is not None

    def size(self, path: str) -> int:
        info = self._info(path)
        if info is None:
            raise FileNotFoundError(path)
        return info.size

    def delete(self, path: str, missing_ok: bool = True) -> None:
        try:
            self.fs.delete_file(path)
        except FileNotFoundError:
            if not missing_ok:
                raise
        except OSError:
            if not missing_ok or self.exists(path):
                raise

    def _ls(self, dirpath: str):
        from pyarrow.fs import FileSelector

        try:
            return self.fs.get_file_info(
                FileSelector(dirpath, recursive=False, allow_not_found=True)
            )
        except (FileNotFoundError, NotADirectoryError, OSError):
            return []

    def list_objects(self, dirpath: str) -> list[str]:
        from pyarrow.fs import FileType

        return sorted(
            posixpath.basename(i.path)
            for i in self._ls(dirpath)
            if i.type == FileType.File
        )

    def list_subdirs(self, dirpath: str) -> list[str]:
        from pyarrow.fs import FileType

        return sorted(
            posixpath.basename(i.path)
            for i in self._ls(dirpath)
            if i.type == FileType.Directory
            and not i.path.endswith(_PTR_SUFFIX)
        )

    def is_dir(self, path: str) -> bool:
        from pyarrow.fs import FileType

        info = self._info(path)
        return info is not None and info.type == FileType.Directory

    def ensure_dir(self, dirpath: str) -> None:
        self.fs.create_dir(dirpath, recursive=True)

    def remove_dir_if_empty(self, dirpath: str) -> bool:
        if not self._ls(dirpath):
            try:
                self.fs.delete_dir(dirpath)
            except (FileNotFoundError, OSError):
                pass
            return True
        return False

    # -- pointers (the commit log) ------------------------------------
    def _ptr_dir(self, path: str) -> str:
        return path + _PTR_SUFFIX

    def _versions(self, path: str) -> list[str]:
        return [
            n for n in self.list_objects(self._ptr_dir(path)) if n.startswith("cv-")
        ]

    def put_object_if_absent(self, path: str, data: bytes) -> bool:
        """Conditional whole-object PUT: succeed (True) only if no
        object exists at ``path``; never overwrite (False on loss).

        This is the compare-and-swap the pointer commit log runs on.
        When the underlying filesystem handler exposes a real
        exclusive create (``put_if_absent`` — the ``norename://``
        backend does, via temp-write + ``os.link``), the CAS is
        genuine.  A production S3/GCS deployment plugs the native
        conditional write in HERE (S3 ``PutObject`` with
        ``If-None-Match: *``, GCS ``ifGenerationMatch=0``).  The
        generic fallback — HEAD, PUT, read-back-verify — only
        DETECTS a lost race (returns False so the caller retries at
        the next version); its read-back window is the documented
        residual until the conditional hook is wired."""
        self.fs.create_dir(posixpath.dirname(path), recursive=True)
        handler = getattr(self.fs, "handler", None)
        excl = getattr(handler, "put_if_absent", None)
        if excl is not None:
            return bool(excl(path, data))
        # generic fallback: detection, not prevention
        if self.exists(path):
            return False
        with self.fs.open_output_stream(path) as f:
            f.write(data)
        try:
            return self.get_object(path) == data
        except FileNotFoundError:
            return False

    def put_pointer(self, path: str, data: bytes) -> None:
        """Commit the next version to the pointer's commit log with a
        compare-and-swap: LIST to allocate version N+1, conditional
        create of ``cv-<N+1>``.  Exactly one writer wins a version;
        a loser whose bytes already sit at the winning version (a
        zombie retry of the same logical commit) succeeds
        idempotently, any other loser retries at the next version —
        commits are totally ordered, no update is silently lost."""
        d = self._ptr_dir(path)
        for _ in range(_CAS_MAX_ATTEMPTS):
            vs = self._versions(path)
            nxt = (int(vs[-1][3:13]) + 1) if vs else 1
            target = self.join(d, f"cv-{nxt:010d}")
            if self.put_object_if_absent(target, data):
                return
            try:
                if self.get_object(target) == data:
                    return  # our twin already committed these bytes
            except FileNotFoundError:
                pass  # winner vacuumed/raced away — re-list and retry
        raise RuntimeError(
            f"pointer commit lost {_CAS_MAX_ATTEMPTS} consecutive "
            f"version races at {path!r} — a runaway concurrent writer "
            "is violating the partition-ownership contract"
        )

    def get_pointer(self, path: str) -> bytes | None:
        vs = self._versions(path)
        if not vs:
            return None
        return self.get_object(self.join(self._ptr_dir(path), vs[-1]))

    def delete_pointer(self, path: str) -> None:
        d = self._ptr_dir(path)
        for n in self.list_objects(d):
            self.delete(self.join(d, n))
        self.remove_dir_if_empty(d)

    def pointer_exists(self, path: str) -> bool:
        return bool(self._versions(path))

    def list_pointers(self, dirpath: str) -> list[str]:
        """Logical pointer names: ``.v`` commit-log dirs holding at
        least one version, suffix stripped."""
        from pyarrow.fs import FileType

        out = []
        for i in self._ls(dirpath):
            if i.type == FileType.Directory and i.path.endswith(_PTR_SUFFIX):
                logical = posixpath.basename(i.path)[: -len(_PTR_SUFFIX)]
                if self._versions(self.join(dirpath, logical)):
                    out.append(logical)
        return sorted(out)

    def publish_staged(self, staged_path: str, pointer_path: str) -> None:
        """Staged manifest → current pointer without rename: copy the
        staged object's bytes in as the next pointer version, then
        delete the staged object.  A crash in between re-publishes on
        recovery (idempotent — identical bytes, one more version)."""
        self.put_pointer(pointer_path, self.get_object(staged_path))
        self.delete(staged_path)

    def gc_pointer(self, path: str) -> list[str]:
        """Drop all but the newest version (vacuum).  Same contract as
        the POSIX vacuum: no concurrent reader holds an old listing."""
        vs = self._versions(path)
        removed = []
        for n in vs[:-1]:
            p = self.join(self._ptr_dir(path), n)
            self.delete(p)
            removed.append(p)
        return removed

    # -- parquet -------------------------------------------------------
    @property
    def pa_filesystem(self):
        return self.fs

    def read_table(self, path: str, columns: list[str] | None = None):
        import pyarrow.parquet as pq

        return pq.read_table(path, columns=columns, filesystem=self.fs)

    def read_parquet_schema(self, path: str):
        import pyarrow.parquet as pq

        return pq.read_schema(path, filesystem=self.fs)

    def read_parquet_metadata(self, path: str):
        import pyarrow.parquet as pq

        with self.fs.open_input_file(path) as f:
            return pq.ParquetFile(f).metadata

    # -- json convenience ---------------------------------------------
    def put_json(self, path: str, obj: dict, *, pointer: bool = False) -> None:
        data = json.dumps(obj).encode()
        (self.put_pointer if pointer else self.put_object)(path, data)

    def get_json(self, path: str, *, pointer: bool = False) -> dict | None:
        if pointer:
            raw = self.get_pointer(path)
        else:
            raw = self.get_object(path) if self.exists(path) else None
        return None if raw is None else json.loads(raw)


# ---------------------------------------------------------------------------
# The rename-forbidding local filesystem (test backend)
# ---------------------------------------------------------------------------


from pyarrow.fs import FileSystemHandler as _FileSystemHandler


class _AtomicLocalPut:
    """File-like sink giving the local test backend real PUT
    atomicity: bytes land in a same-directory temp file; ``close``
    fsyncs and ``os.replace``s it to the final name in one step, so
    a concurrent reader sees either nothing or the whole object."""

    def __init__(self, path: str):
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, self._tmp = tempfile.mkstemp(dir=d, prefix=".put-", suffix=".tmp")
        self._f = os.fdopen(fd, "wb")
        self._path = path
        self.closed = False

    def write(self, data) -> int:
        return self._f.write(data)

    def flush(self) -> None:
        self._f.flush()

    def tell(self) -> int:
        return self._f.tell()

    def writable(self) -> bool:
        return True

    def readable(self) -> bool:
        return False

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        if self.closed:
            return
        try:
            self._f.flush()
            os.fsync(self._f.fileno())
            self._f.close()
            os.replace(self._tmp, self._path)
        finally:
            self.closed = True
            if os.path.exists(self._tmp):
                os.unlink(self._tmp)


class _NoMoveLocalHandler(_FileSystemHandler):
    """``pyarrow.fs.FileSystemHandler`` delegating to LocalFileSystem
    with ``move`` HARD-DISABLED — the sandbox's stand-in for an object
    store: every code path that would rename raises instead of
    silently passing on POSIX.  Picklable (ships to Ray workers)."""

    def __init__(self):
        from pyarrow.fs import LocalFileSystem

        self._fs = LocalFileSystem()

    def __reduce__(self):
        return (_NoMoveLocalHandler, ())

    # identity ---------------------------------------------------------
    def get_type_name(self):
        return "norename-local"

    def __eq__(self, other):
        return isinstance(other, _NoMoveLocalHandler)

    def __ne__(self, other):
        return not self.__eq__(other)

    # the point of this class -----------------------------------------
    def move(self, src, dest):
        raise NotImplementedError(
            "rename/move is not available on the object-store backend "
            f"(attempted {src!r} -> {dest!r}); the lake protocol must "
            "commit via versioned-pointer PUTs"
        )

    # delegation -------------------------------------------------------
    def get_file_info(self, paths):
        return self._fs.get_file_info(paths)

    def get_file_info_selector(self, selector):
        return self._fs.get_file_info(selector)

    def create_dir(self, path, recursive):
        self._fs.create_dir(path, recursive=recursive)

    def delete_dir(self, path):
        self._fs.delete_dir(path)

    def delete_dir_contents(self, path, missing_dir_ok=False):
        self._fs.delete_dir_contents(path, missing_dir_ok=missing_dir_ok)

    def delete_root_dir_contents(self):
        raise NotImplementedError("refusing to delete root dir contents")

    def delete_file(self, path):
        self._fs.delete_file(path)

    def copy_file(self, src, dest):
        self._fs.copy_file(src, dest)

    def open_input_stream(self, path):
        # raw bytes: the PUBLIC open_input_stream defaults to
        # compression='detect' — a handler must never pre-decompress
        return self._fs.open_input_stream(path, compression=None)

    def open_input_file(self, path):
        return self._fs.open_input_file(path)

    def open_output_stream(self, path, metadata):
        # PUT atomicity: a real object store never exposes a
        # partially-written object, but LocalFileSystem's output
        # stream is an in-place truncate-then-write — a concurrent
        # reader could see torn bytes, silently weakening every test
        # that relies on the object contract.  Write to a hidden temp
        # name and os.replace on close (rename is fine INSIDE the
        # handler — it is only forbidden to the lake protocol, which
        # is what ``move`` raising enforces).
        import pyarrow as pa

        return pa.PythonFile(_AtomicLocalPut(path), mode="w")

    def put_if_absent(self, path, data):
        """Exclusive whole-object create: S3 ``If-None-Match: *`` PUT
        semantics, faithfully — the content is written to a temp file
        and ``os.link``ed to the final name, so the object appears
        atomically WITH its full content and creation fails if the
        name exists.  Returns True if this writer won the name."""
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=d, prefix=".cas-", suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(data)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, path)
                return True
            except FileExistsError:
                return False
        finally:
            os.unlink(tmp)

    def open_append_stream(self, path, metadata):
        raise NotImplementedError("append is not available on object stores")

    def normalize_path(self, path):
        return self._fs.normalize_path(path)


def _norename_fs():
    from pyarrow.fs import PyFileSystem

    return PyFileSystem(_NoMoveLocalHandler())


# ---------------------------------------------------------------------------
# scheme routing
# ---------------------------------------------------------------------------


def storage_for(root: str):
    """Backend + physical base path for a lake/txn root string.

    Returns ``(storage, base_path)``.  The scheme travels inside the
    root string, so Ray workers reconstructing ``TranscriptLake(root)``
    land on the same backend with zero extra plumbing."""
    if root.startswith(NORENAME_SCHEME):
        base = root[len(NORENAME_SCHEME):]
        return ObjectStorage(base, _norename_fs(), scheme=NORENAME_SCHEME), base
    if "://" in root:
        # real object stores (s3://, gs://, hdfs://...): same protocol
        # as norename, over pyarrow's native filesystem for the URI.
        # Untestable in this sandbox (no network) — the norename suite
        # exercises the identical code path.
        from pyarrow.fs import FileSystem

        fs, base = FileSystem.from_uri(root)
        scheme = root[: root.index("://") + 3]
        return ObjectStorage(base, fs, scheme=scheme), base
    return PosixStorage(root), root
