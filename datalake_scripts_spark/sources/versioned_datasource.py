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
    ) -> None:
        self.path = path
        self.change = change
        self.version = version
        self.field_names = field_names
        # declared type per column (StructType jsonValue strings) so
        # hive path segments restore with the PINNED type — a string
        # partition value '07' must stay '07', not become int 7
        self.field_types = field_types


class VersionedChangesStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self.table_dir = options["path"]
        self.start_version = int(options.get("start_version", 0))
        self.rewrites = options.get("rewrites", "file_diff")
        if self.rewrites not in ("file_diff", "error"):
            raise ValueError(f"rewrites={self.rewrites!r} not in file_diff/error")
        self.field_names = [
            f.name for f in schema.fields if f.name not in _META_COLS
        ]
        self.field_types = {
            f.name: f.dataType.jsonValue()
            for f in schema.fields
            if f.name not in _META_COLS
            and isinstance(f.dataType.jsonValue(), str)
        }

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        from ..operators.versioned import current_version

        return {"version": max(self.start_version, current_version(self.table_dir))}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        from ..operators.versioned import (
            _expand_manifest,
            _load_manifest,
        )

        parts: list[InputPartition] = []
        prev_files: set | None = None
        for v in range(start["version"] + 1, end["version"] + 1):
            try:
                manifest = _load_manifest(self.table_dir, v)
                if prev_files is None:
                    prev_files = (
                        set(
                            _expand_manifest(
                                self.table_dir,
                                _load_manifest(self.table_dir, v - 1),
                            )[0]
                        )
                        if v > 1
                        else set()
                    )
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
            for f in added:
                parts.append(
                    _FileChange(
                        self._abs(f), "insert", v,
                        self.field_names, self.field_types,
                    )
                )
            for f in removed:
                parts.append(
                    _FileChange(
                        self._abs(f), "delete", v,
                        self.field_names, self.field_types,
                    )
                )
            prev_files = cur
        return parts

    def _abs(self, f: str) -> str:
        return f if os.path.isabs(f) else os.path.join(self.table_dir, f)

    def read(self, partition: _FileChange) -> Iterator[tuple]:
        # executor-side: plain pyarrow over one immutable data file
        import pyarrow.parquet as pq

        from ..operators.versioned import _partition_values

        pvals = _partition_values(partition.path, partition.field_types)
        table = pq.read_table(partition.path)
        cols = {}
        for name in partition.field_names:
            if name in table.column_names:
                cols[name] = table.column(name).to_pylist()
            elif name in pvals:  # hive path-derived partition column
                cols[name] = [pvals[name]] * table.num_rows
            else:  # pre-evolution file: null-fill appended columns
                cols[name] = [None] * table.num_rows
        meta = (partition.change, partition.version)
        for i in range(table.num_rows):
            yield tuple(cols[n][i] for n in partition.field_names) + meta

    def commit(self, end: dict) -> None:
        pass  # offsets are versions; nothing external to acknowledge


def register_versioned_datasource(spark) -> None:
    """Make ``format('versioned_changes')`` available on this session."""
    spark.dataSource.register(VersionedChangesDataSource)
