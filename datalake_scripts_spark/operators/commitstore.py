"""Commit-log store seam for the versioned layer (the LogStore split).

The manifest-publication primitive — atomic create-if-absent of
manifest v(N+1) — is the ONLY part of the versioned layer whose
correctness depends on the storage system. POSIX provides it via
``os.link``; S3 needs a conditional PUT (``If-None-Match: *``) or an
external coordination table (DynamoDB) — exactly the LogStore split
Delta Lake makes for the same reason. This module isolates that
dependency behind :class:`CommitStore` so the object-store deployment
story never silently degrades to last-writer-wins: a deployment plugs
in a store honoring the contract below and every transactional
behavior (append auto-merge, DML/OPTIMIZE read-pinning, WAP, matview
refresh, streaming epoch idempotence) carries over unchanged.

Contract (proved by tests/test_concurrency.py running the same race
matrix against :class:`PosixCommitStore` and
:class:`MemoryCommitStore`):

- ``put_if_absent(table_dir, name, data)`` atomically publishes a
  fully-written log object iff ``name`` is absent. Racing writers get
  exactly one ``True``; after a ``False``, a read of ``name`` must
  return the winner's complete bytes (no torn object is ever visible).
- ``read``/``exists``/``list_log``/``delete`` are plain log-object
  CRUD; ``list_log`` of a table with no log returns ``[]``.
- the version pointer is an advance-only CACHE, so
  ``replace_pointer`` may be last-writer-wins: ``current_version``
  takes max(pointer, forward walk over the log) and the committer
  heals any regression it caused (``versioned._advance_latest``).

Data files are deliberately NOT behind the seam: they are immutable
and uniquely named (uuid), so plain blob writes are safe on every
store — only the log needs the CAS.
"""

from __future__ import annotations

import os
import re
import threading
import uuid

_MANIFEST_RE = re.compile(r"v\d{5}\.json")


class CommitStore:
    """Abstract commit-log store; see the module docstring for the
    contract. ``table_dir`` is the table's root path (used as the
    log's namespace key); ``name`` is a log-object name like
    ``v00003.json``."""

    def ensure_log(self, table_dir: str) -> None:
        raise NotImplementedError

    def put_if_absent(self, table_dir: str, name: str, data: bytes) -> bool:
        raise NotImplementedError

    def read(self, table_dir: str, name: str) -> bytes:
        """Raises FileNotFoundError when absent."""
        raise NotImplementedError

    def exists(self, table_dir: str, name: str) -> bool:
        raise NotImplementedError

    def list_log(self, table_dir: str) -> list[str]:
        raise NotImplementedError

    def delete(self, table_dir: str, name: str) -> None:
        raise NotImplementedError

    def read_pointer(self, table_dir: str) -> int | None:
        raise NotImplementedError

    def replace_pointer(self, table_dir: str, version: int) -> None:
        raise NotImplementedError


class PosixCommitStore(CommitStore):
    """Default store: the log is ``table_dir/_manifests/`` and the
    pointer is ``table_dir/_latest``, both on a POSIX filesystem
    (local disk, NFS with O_EXCL semantics, HDFS via a mount).
    ``put_if_absent`` writes a temp file then ``os.link``s it into
    place — link fails with EEXIST iff the name is taken, and the
    published object is always complete because the temp was fully
    written first."""

    def _log_dir(self, table_dir: str) -> str:
        return os.path.join(table_dir, "_manifests")

    def _pointer_path(self, table_dir: str) -> str:
        return os.path.join(table_dir, "_latest")

    def ensure_log(self, table_dir: str) -> None:
        os.makedirs(self._log_dir(table_dir), exist_ok=True)

    def put_if_absent(self, table_dir: str, name: str, data: bytes) -> bool:
        path = os.path.join(self._log_dir(table_dir), name)
        tmp = path + f".tmp{uuid.uuid4().hex}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)  # atomic CAS: fails iff the name is taken
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def read(self, table_dir: str, name: str) -> bytes:
        with open(os.path.join(self._log_dir(table_dir), name), "rb") as f:
            return f.read()

    def exists(self, table_dir: str, name: str) -> bool:
        return os.path.exists(os.path.join(self._log_dir(table_dir), name))

    def list_log(self, table_dir: str) -> list[str]:
        try:
            return os.listdir(self._log_dir(table_dir))
        except FileNotFoundError:
            return []

    def delete(self, table_dir: str, name: str) -> None:
        os.remove(os.path.join(self._log_dir(table_dir), name))

    def read_pointer(self, table_dir: str) -> int | None:
        try:
            with open(self._pointer_path(table_dir)) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def replace_pointer(self, table_dir: str, version: int) -> None:
        tmp = self._pointer_path(table_dir) + f".tmp{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer_path(table_dir))


class MemoryCommitStore(CommitStore):
    """In-memory conditional-PUT store: the reference implementation of
    the object-store contract (an S3 store with ``If-None-Match: *``
    or a DynamoDB log table behaves exactly like this, minus the
    process boundary). Manifests live in a dict guarded by one lock —
    ``put_if_absent`` is a locked setdefault, the textbook conditional
    PUT. Used by the concurrency test matrix to prove the versioned
    layer depends on nothing POSIX-specific beyond the contract."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._logs: dict[str, dict[str, bytes]] = {}
        self._pointers: dict[str, int] = {}

    def _key(self, table_dir: str) -> str:
        return os.path.abspath(table_dir)

    def ensure_log(self, table_dir: str) -> None:
        with self._lock:
            self._logs.setdefault(self._key(table_dir), {})

    def put_if_absent(self, table_dir: str, name: str, data: bytes) -> bool:
        with self._lock:
            log = self._logs.setdefault(self._key(table_dir), {})
            if name in log:
                return False
            log[name] = bytes(data)
            return True

    def read(self, table_dir: str, name: str) -> bytes:
        with self._lock:
            try:
                return self._logs[self._key(table_dir)][name]
            except KeyError:
                raise FileNotFoundError(f"{table_dir}/{name}") from None

    def exists(self, table_dir: str, name: str) -> bool:
        with self._lock:
            return name in self._logs.get(self._key(table_dir), {})

    def list_log(self, table_dir: str) -> list[str]:
        with self._lock:
            return list(self._logs.get(self._key(table_dir), {}))

    def delete(self, table_dir: str, name: str) -> None:
        with self._lock:
            self._logs.get(self._key(table_dir), {}).pop(name, None)

    def read_pointer(self, table_dir: str) -> int | None:
        with self._lock:
            return self._pointers.get(self._key(table_dir))

    def replace_pointer(self, table_dir: str, version: int) -> None:
        with self._lock:
            self._pointers[self._key(table_dir)] = version


_STORE: CommitStore = PosixCommitStore()


def get_commit_store() -> CommitStore:
    return _STORE


def set_commit_store(store: CommitStore) -> CommitStore:
    """Install a store process-wide; returns the previous one so tests
    (or an embedding application) can restore it."""
    global _STORE
    prev = _STORE
    _STORE = store
    return prev


def is_manifest_name(name: str) -> bool:
    return bool(_MANIFEST_RE.fullmatch(name))
