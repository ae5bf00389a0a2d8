"""Streaming source over versioned tables (Spark 4 Python DataSource):
``spark.readStream.format("versioned_changes").load()`` — table
streaming / change-data-feed for the Delta-lite layer, the consumer
half of the loop whose producer half is
``streaming.sinks.foreach_batch_versioned``.

Offsets are COMMIT VERSIONS: a microbatch covers the manifest range
(last committed version, current version]; each changed FILE of each
version is one ``InputPartition``, so a burst of epochs fans out across
the cluster instead of serializing on the driver, and replay of a
committed range re-reads immutable manifests + immutable data files —
exactly-once end-to-end (the reference's cron-glob re-scan pattern,
SURVEY.md §2.7, upgraded to offset-tracked incremental consumption).

Change semantics per commit:
- ``append``: the version's new files are ``insert`` rows — exact.
- rewrites (``delete``/``update``/``overwrite``/compaction): file-level
  diff — rows of removed files emit as ``delete``, rows of added files
  as ``insert``. This is a MULTISET-correct net change (delete(old
  file) + insert(rewritten file) nets to the row-level diff) but
  noisier than ``operators.versioned.read_changes``'s exceptAll row
  diff: rows untouched by the rewrite appear as a delete+insert pair.
  Consumers folding by key (merge/upsert) are unaffected; set
  ``rewrites='error'`` to fail fast instead when only append traffic
  is expected (a streaming-landing table).

Partition readers use pyarrow directly (Python DataSource readers run
without a SparkSession) — the table dir must be on shared storage, the
same requirement every Spark file source has. Hive-partitioned files
get their partition columns restored from the ``col=value`` path
segments, mirroring ``operators.versioned._read_manifest_files``.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

_META_COLS = ("_change_type", "_commit_version")


class VersionedChangesDataSource(DataSource):
    """``format("versioned_changes")`` options:

    - ``path`` (required): the versioned table directory.
    - ``start_version`` (default 0): emit commits AFTER this version
      (0 = the table's full history from v1).
    - ``rewrites`` (default ``file_diff``): ``file_diff`` emits
      file-level delete+insert rows for non-append commits;
      ``error`` fails the stream on the first non-append commit.
    - ``max_files_per_trigger`` / ``max_commits_per_trigger``
      (default unbounded): ADMISSION CONTROL (VERDICT r6 ask #4) —
      bound how far ``latestOffset`` advances past the last planned
      batch, by changed-file count or commit count (always >= 1
      commit per batch, like Delta's maxFilesPerTrigger). A 10-commit
      backlog then drains as several bounded epochs instead of one
      giant microbatch — the first knob a production streaming
      operator reaches for.
    - ``admission_state_dir`` (optional, recommended with the limits):
      directory where the admission cursor is persisted (a tiny JSON,
      written atomically, monotonic). Pair it 1:1 with the query's
      ``checkpointLocation`` (e.g. ``<checkpoint>/admission``) exactly
      as the checkpoint itself is paired with the sink. With it set,
      EVERY batch is bounded — fresh start, mid-backfill restart, and
      restart after a clean commit alike. Without it the bound is
      relative to the in-memory reader cursor only: the engine calls
      ``latestOffset()`` BEFORE ``initialOffset()``/``partitions()``
      on a fresh start (measured on Spark 4.1; the Python DataSource
      API has no ReadLimit/SupportsAdmissionControl hook and never
      dispatches ``commit()`` to the source runner), and an unknown
      cursor cannot be bounded safely — the engine may hold a
      checkpointed offset anywhere below the head, and returning an
      offset below it would regress the WAL — so the first batch
      admits everything. Use :func:`drain_backfill` for an
      availableNow-style bounded drain.
    """

    @classmethod
    def name(cls) -> str:
        return "versioned_changes"

    def schema(self) -> StructType:
        from ..operators.versioned import _load_manifest, current_version

        table_dir = self.options.get("path")
        if not table_dir:
            raise ValueError("versioned_changes requires .load(<table_dir>)")
        v = current_version(table_dir)
        if v == 0:
            raise ValueError(f"no committed version in {table_dir}")
        schema_json = _load_manifest(table_dir, v).get("schema")
        if not schema_json:
            raise ValueError(
                "versioned_changes needs a manifest-declared schema "
                "(tables written by this engine always have one)"
            )
        base = StructType.fromJson(schema_json)
        return StructType(
            base.fields
            + [
                StructField("_change_type", StringType(), False),
                StructField("_commit_version", LongType(), False),
            ]
        )

    def streamReader(self, schema: StructType) -> "VersionedChangesStreamReader":
        return VersionedChangesStreamReader(schema, self.options)


class _FileChange(InputPartition):
    def __init__(
        self,
        path: str,
        change: str,
        version: int,
        field_names: list[str],
        field_types: dict[str, str],
        field_physical: dict[str, str] | None = None,
    ) -> None:
        self.path = path
        self.change = change
        self.version = version
        # deletion-vector lane: when dv_path is set, this partition
        # emits ONLY the base file's rows at the positions listed for
        # dv_file_base in that DV parquet (change='delete'); when
        # dv_exclude_paths is set on a whole-file delete, rows already
        # DV-deleted (and therefore already emitted) are excluded
        self.dv_path: str | None = None
        self.dv_file_base: str | None = None
        self.dv_exclude_paths: list[str] = []
        self.field_names = field_names
        # declared type per column (StructType jsonValue strings) so
        # hive path segments restore with the PINNED type — a string
        # partition value '07' must stay '07', not become int 7
        self.field_types = field_types
        # column mapping: logical -> in-file (physical) name; identity
        # when the table has mapping disabled
        self.field_physical = field_physical or {}


class VersionedChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.table_dir = options["path"]
        self.start_version = int(options.get("start_version", 0))
        self.rewrites = options.get("rewrites", "file_diff")
        if self.rewrites not in ("file_diff", "error"):
            raise ValueError(f"rewrites={self.rewrites!r} not in file_diff/error")
        mf = options.get("max_files_per_trigger")
        mc = options.get("max_commits_per_trigger")
        self.max_files = int(mf) if mf is not None else None
        self.max_commits = int(mc) if mc is not None else None
        if self.max_files is not None and self.max_files < 1:
            raise ValueError("max_files_per_trigger must be >= 1")
        if self.max_commits is not None and self.max_commits < 1:
            raise ValueError("max_commits_per_trigger must be >= 1")
        self.state_dir = options.get("admission_state_dir")
        # admission-control cursor: the furthest version this reader
        # has ADMITTED (latestOffset) or seen PLANNED (partitions).
        # None until the first call — see the class docstring caveat.
        self._cursor: int | None = None
        self.field_names = [
            f.name for f in schema.fields if f.name not in _META_COLS
        ]
        self.field_types = {
            f.name: f.dataType.jsonValue()
            for f in schema.fields
            if f.name not in _META_COLS
            and isinstance(f.dataType.jsonValue(), str)
        }
        # column mapping: resolve logical -> physical from the LATEST
        # manifest schema (the stream's pinned shape). Physical names
        # are rename-stable, so the map stays valid for every commit
        # the stream will read, past and future.
        from ..operators.versioned import (
            _l2p,
            _load_manifest,
            current_version,
        )

        v_now = current_version(self.table_dir)
        self.field_physical = (
            _l2p(_load_manifest(self.table_dir, v_now).get("schema"))
            if v_now > 0
            else {}
        )

    def initialOffset(self) -> dict:
        # note: the engine calls this AFTER the first latestOffset()
        # (measured, Spark 4.1) — priming here still helps any engine
        # that orders the calls the intuitive way, and never hurts
        self._cursor = max(self._cursor or 0, self.start_version)
        return {"version": self.start_version}

    def _cursor_path(self) -> str:
        return os.path.join(self.state_dir, "admission_cursor.json")

    def _load_cursor_file(self) -> int | None:
        if not self.state_dir:
            return None
        try:
            with open(self._cursor_path()) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _store_cursor_file(self, version: int) -> None:
        """Persist the admission cursor, atomically and monotonically
        (an os.replace of a same-dir temp file; never moves backwards,
        so a stale writer can only widen one batch's budget, not
        regress the stream)."""
        if not self.state_dir:
            return
        prev = self._load_cursor_file()
        if prev is not None and prev >= version:
            return
        os.makedirs(self.state_dir, exist_ok=True)
        tmp = self._cursor_path() + f".{os.getpid()}.tmp"
        with open(tmp, "w") as f:
            json.dump({"version": int(version)}, f)
        os.replace(tmp, self._cursor_path())

    def latestOffset(self) -> dict:
        from ..operators.versioned import current_version

        latest = max(self.start_version, current_version(self.table_dir))
        if self.max_files is None and self.max_commits is None:
            return {"version": latest}
        base = self._cursor
        if base is None and self.state_dir:
            # durable cursor: a missing file means a genuinely fresh
            # query (the state dir is paired 1:1 with the checkpoint),
            # so bounding from start_version is safe — every batch
            # bounded, including the very first
            stored = self._load_cursor_file()
            base = stored if stored is not None else self.start_version
        if base is None:
            # cursor unknown and nothing durable: the engine may hold
            # a checkpointed offset anywhere in (start_version, latest]
            # that this side cannot see; any return below it would
            # regress the offset WAL, so the one safe bound is the
            # head — a single unbounded admission, then bounding
            # resumes from the in-memory cursor
            self._cursor = latest
            return {"version": latest}
        end = self._bounded_end(base, latest)
        self._cursor = end
        self._store_cursor_file(end)
        return {"version": end}

    def _bounded_end(self, base: int, latest: int) -> int:
        """Furthest version in (base, latest] whose cumulative changed-
        file count fits the budget — always at least one commit, so a
        single over-budget commit still makes progress (Delta's
        maxFilesPerTrigger semantics)."""
        from ..operators.versioned import _expand_manifest, _load_manifest

        if base >= latest:
            return latest
        end = base
        files_used = 0
        commits_used = 0
        try:
            prev = (
                set(
                    _expand_manifest(
                        self.table_dir, _load_manifest(self.table_dir, base)
                    )[0]
                )
                if base >= 1
                else set()
            )
            for v in range(base + 1, latest + 1):
                files, _ = _expand_manifest(
                    self.table_dir, _load_manifest(self.table_dir, v)
                )
                cur = set(files)
                changed = len(cur - prev) + len(prev - cur)
                if end > base:  # first commit always admitted
                    if self.max_commits is not None and commits_used >= self.max_commits:
                        break
                    if (
                        self.max_files is not None
                        and files_used + changed > self.max_files
                    ):
                        break
                end = v
                files_used += changed
                commits_used += 1
                prev = cur
        except FileNotFoundError:
            # vacuumed mid-walk: let partitions() raise its targeted
            # retention error for the actual batch range
            return latest
        return end

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from ..operators.versioned import (
            _expand_manifest,
            _load_manifest,
        )

        # prime/advance the admission-control cursor: covers WAL replay
        # after a restart (partitions is called with the checkpointed
        # range before any latestOffset), and never regresses
        self._cursor = max(self._cursor or 0, end["version"])
        if self.max_files is not None or self.max_commits is not None:
            self._store_cursor_file(self._cursor)
        if end["version"] <= start["version"]:
            return []  # empty or regressed range: nothing to plan
        parts: list[InputPartition] = []
        prev_files: set | None = None
        prev_dvs: dict | None = None  # dv path -> dv descriptor
        for v in range(start["version"] + 1, end["version"] + 1):
            try:
                manifest = _load_manifest(self.table_dir, v)
                if prev_files is None:
                    prev_manifest = (
                        _load_manifest(self.table_dir, v - 1)
                        if v > 1
                        else {}
                    )
                    prev_files = (
                        set(
                            _expand_manifest(
                                self.table_dir, prev_manifest
                            )[0]
                        )
                        if v > 1
                        else set()
                    )
                    prev_dvs = {
                        dv["path"]: dv
                        for dv in prev_manifest.get("dvs", [])
                    }
            except FileNotFoundError as e:
                # vacuum() pruned manifests this consumer still needs —
                # the Delta retention contract: a lagging stream past
                # the retention window cannot resume incrementally
                raise RuntimeError(
                    f"commit v{v} (or its predecessor) was vacuumed before "
                    f"this stream consumed it — lagging consumer fell past "
                    f"the retention window; restart from a fresh "
                    f"start_version or raise vacuum(keep_last=...)"
                ) from e
            files, _ = _expand_manifest(self.table_dir, manifest)
            cur = set(files)
            added = [f for f in files if f not in prev_files]
            removed = sorted(prev_files - cur)
            if removed and self.rewrites == "error":
                raise RuntimeError(
                    f"commit v{v} ({manifest.get('mode')}) rewrites files; "
                    "versioned_changes was configured rewrites='error'"
                )
            # deletion-vector deltas: rows deleted merge-on-read in
            # commit v. A file's rows in the PREVIOUS snapshot's DVs
            # were already emitted — exclude them from whole-file
            # deletes; NEW dv objects emit precise per-row deletes.
            cur_dvs = {dv["path"]: dv for dv in manifest.get("dvs", [])}
            prev_exclude = [self._abs(p) for p in (prev_dvs or {})]
            cur_exclude = [self._abs(p) for p in cur_dvs]
            dv_bases = {
                b for dv in cur_dvs.values() for b in dv["rows"]
            }
            for f in added:
                fc = _FileChange(
                    self._abs(f), "insert", v,
                    self.field_names, self.field_types,
                    self.field_physical,
                )
                if os.path.basename(f) in dv_bases:
                    # a RE-added file (restore to a DV'd snapshot):
                    # rows its current DVs hide are not visible inserts
                    fc.dv_exclude_paths = cur_exclude
                parts.append(fc)
            base_to_rel = {os.path.basename(f): f for f in files}
            prev_base_to_rel = {
                os.path.basename(f): f for f in prev_files
            }
            for f in removed:
                fc = _FileChange(
                    self._abs(f), "delete", v,
                    self.field_names, self.field_types,
                    self.field_physical,
                )
                fc.dv_exclude_paths = prev_exclude
                parts.append(fc)
            for path, dv in cur_dvs.items():
                if prev_dvs is not None and path in prev_dvs:
                    continue  # carried, already emitted
                for base in dv["rows"]:
                    rel = base_to_rel.get(base) or prev_base_to_rel.get(
                        base
                    )
                    if rel is None:
                        continue  # dangling entry: file already gone
                    fc = _FileChange(
                        self._abs(rel), "delete", v,
                        self.field_names, self.field_types,
                        self.field_physical,
                    )
                    fc.dv_path = self._abs(path)
                    fc.dv_file_base = base
                    # rows of this file already deleted by EARLIER DVs
                    # were emitted back then — exclude them here
                    fc.dv_exclude_paths = prev_exclude
                    parts.append(fc)
            prev_files = cur
            prev_dvs = cur_dvs
        return parts

    def _abs(self, f: str) -> str:
        return f if os.path.isabs(f) else os.path.join(self.table_dir, f)

    def read(self, partition: _FileChange) -> Iterator[tuple]:
        # executor-side: plain pyarrow over one immutable data file
        import pyarrow.parquet as pq

        from ..operators.versioned import _partition_values

        phys = partition.field_physical
        # hive path segments carry PHYSICAL names; retype by physical
        pvals = _partition_values(
            partition.path,
            {
                phys.get(n, n): t
                for n, t in partition.field_types.items()
            },
        )
        table = pq.read_table(partition.path)
        base = os.path.basename(partition.path)

        def _dv_positions(dv_path: str) -> set[int]:
            t = pq.read_table(dv_path)
            fb, pos = t["file_base"].to_pylist(), t["pos"].to_pylist()
            return {p for b, p in zip(fb, pos) if b == base}

        if partition.dv_path:
            # precise merge-on-read delete: ONLY the positions this DV
            # lists for the base file (minus any already emitted)
            keep = _dv_positions(partition.dv_path)
            for ex in partition.dv_exclude_paths:
                keep -= _dv_positions(ex)
            table = table.take(sorted(keep))
        elif partition.dv_exclude_paths:
            # whole-file insert/delete on a DV'd file: rows its DVs
            # hide were never visible (insert) or already emitted
            # (delete) — drop them by position
            drop: set[int] = set()
            for ex in partition.dv_exclude_paths:
                drop |= _dv_positions(ex)
            if drop:
                table = table.take(
                    [i for i in range(table.num_rows) if i not in drop]
                )
        cols = {}
        for name in partition.field_names:
            p = phys.get(name, name)
            if p in table.column_names:
                cols[name] = table.column(p).to_pylist()
            elif p in pvals:  # hive path-derived partition column
                cols[name] = [pvals[p]] * table.num_rows
            else:  # pre-evolution file: null-fill appended columns
                cols[name] = [None] * table.num_rows
        meta = (partition.change, partition.version)
        for i in range(table.num_rows):
            yield tuple(cols[n][i] for n in partition.field_names) + meta

    def commit(self, end: dict) -> None:
        # offsets are versions; nothing external to acknowledge — the
        # cursor advance is for API conformance (the Spark 4.1 runner
        # was never observed dispatching commit() to the source)
        self._cursor = max(self._cursor or 0, end["version"])


def register_versioned_datasource(spark) -> None:
    """Make ``format('versioned_changes')`` available on this session."""
    spark.dataSource.register(VersionedChangesDataSource)


def _offset_version(end_offset) -> int | None:
    """Version from a StreamingQueryProgress source endOffset. Spark
    renders Python DataSource offsets into progress JSON as the dict's
    PYTHON repr (``{'version': 6}``, single quotes — not JSON), so try
    json first, then ast.literal_eval."""
    if isinstance(end_offset, str):
        try:
            end_offset = json.loads(end_offset)
        except ValueError:
            import ast

            try:
                end_offset = ast.literal_eval(end_offset)
            except (ValueError, SyntaxError):
                return None
    if isinstance(end_offset, dict):
        v = end_offset.get("version")
        return int(v) if v is not None else None
    return None


def drain_backfill(
    writer,
    table_dir: str,
    poll_seconds: float = 0.25,
    timeout_seconds: float = 300.0,
):
    """``Trigger.AvailableNow``-style BOUNDED backfill for a
    ``versioned_changes`` stream (VERDICT r6 ask #4, second half):
    start the already-configured ``DataStreamWriter``, let the
    admission-controlled source drain the backlog in bounded epochs,
    and stop the query once it has consumed every version that existed
    when the drain began. Set ``admission_state_dir`` on the source so
    the very first epoch is bounded too (without it the engine's
    latestOffset-before-initialOffset ordering makes the first batch
    admit everything). Running the drain inside ONE query keeps the
    reader's admission cursor alive, so every epoch respects
    ``max_files_per_trigger`` — which a literal
    ``trigger(availableNow=True)`` cannot do here: the Python
    DataSource API pins a single latestOffset with no ReadLimit hook,
    so it would either drain everything in one epoch (unbounded
    source) or stop after one bounded chunk (bounded source).

    Returns ``(query, n_epochs)`` with the query already stopped —
    inspect ``query.recentProgress`` for per-epoch rows. Exactly-once
    carries over: epochs are ordinary checkpointed microbatches, and a
    killed drain resumes from the checkpoint."""
    import time as _time

    from ..operators.versioned import current_version

    target = current_version(table_dir)
    query = writer.start()
    deadline = _time.monotonic() + timeout_seconds
    try:
        while _time.monotonic() < deadline:
            if query.exception() is not None:
                raise query.exception()
            done = False
            for p in query.recentProgress:
                src = (p.get("sources") or [{}])[0]
                v = _offset_version(src.get("endOffset"))
                if v is not None and v >= target:
                    done = True
                    break
            if done:
                break
            _time.sleep(poll_seconds)
        else:
            raise TimeoutError(
                f"backfill of {table_dir} did not reach v{target} within "
                f"{timeout_seconds}s"
            )
    finally:
        query.stop()
    epochs = sum(
        1
        for p in query.recentProgress
        if (p.get("numInputRows") or 0) > 0
    )
    return query, epochs
