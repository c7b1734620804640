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
  ``P.v/cv-<version 10d>-<sha8>``; a write PUTs the next version, a
  read lists ``P.v/`` and takes the lexicographically-largest entry.

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
retried writer re-PUTs version N+1     same content → same sha-suffixed
                                       name → idempotent overwrite
publish_txn: after pointer PUT,        recovery re-publishes (re-PUT of
before staged-object delete            identical content, new version) and
                                       deletes the staged object — converges
=====================================  =====================================

Writer contract (same as the POSIX lake): ONE logical writer per
pointer at a time — the replay assigns each partition to exactly one
merge task, and rescale/vacuum are maintenance operations.  A real
S3/GCS deployment would harden the version PUT with a conditional
write (S3 ``If-None-Match``, GCS generation-0 precondition) and
retry at the next version on conflict; the single hook point is
:meth:`ObjectStorage.put_pointer`.  ``gc_pointer`` (vacuum) keeps
only the newest version; like the POSIX vacuum it assumes no
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

import hashlib
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

_PTR_SUFFIX = ".v"  # pointer P lives at P.v/cv-<version>-<sha8>


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

    def put_pointer(self, path: str, data: bytes) -> None:
        """Append the next version to the pointer's commit log.  The
        name carries a content sha so a RETRIED identical write lands
        on the same object (idempotent).  A real object store would
        make this PUT conditional (If-None-Match / generation-0) and
        retry at version+1 on conflict — the single-writer-per-pointer
        contract makes that unreachable here."""
        vs = self._versions(path)
        nxt = (int(vs[-1][3:13]) + 1) if vs else 1
        sha = hashlib.sha256(data).hexdigest()[:8]
        self.put_object(
            self.join(self._ptr_dir(path), f"cv-{nxt:010d}-{sha}"), data
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
        return self._fs.open_output_stream(path)

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
