"""Auto-compaction policy for versioned tables — the maintenance loop
a streaming sink needs: every epoch appends a small file set, and after
N epochs a partition is fragmented enough that scan task overhead (and
manifest size) dominates. This module DECIDES (pure metadata: manifest
file list + on-disk sizes, no Spark job) and delegates the rewrite to
``compact_versioned`` — scoped ``OPTIMIZE WHERE`` per fragmented
partition, so cold partitions are never read, listed, or rewritten.

Reference parity: the reference has no maintenance story at all — its
hourly jobs append one file per run forever (jhub_proc.py:259-275,
date-partitioned landing). At 100 TB the equivalent loop is "run
``auto_compact`` after the sink batch"; each call costs O(manifest) to
decide and O(fragmented partitions' bytes) to act.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession

from .versioned import (
    _load_manifest,
    _manifest_partition_spec,
    _partition_values,
    _schema_col_types,
    _expand_manifest,
    compact_versioned,
    current_version,
)


def compaction_candidates(
    table_dir: str,
    small_bytes: int = 32 * 1024 * 1024,
    min_small: int = 4,
) -> list[dict]:
    """Partitions (or the whole flat table) whose SMALL-file count
    crosses the policy: each candidate is ``{"where": [...] | None,
    "n_small": int, "total_bytes": int, "files": int}``. Pure
    metadata — manifest file list + os.path.getsize, no Spark."""
    v = current_version(table_dir)
    if v == 0:
        return []
    manifest = _load_manifest(table_dir, v)
    files, _stats = _expand_manifest(table_dir, manifest)
    col_types = _schema_col_types(manifest.get("schema"))

    groups: dict[tuple, list[str]] = {}
    for f in files:
        segs = []
        d = os.path.dirname(f)
        while "=" in os.path.basename(d):
            segs.insert(0, os.path.basename(d))
            d = os.path.dirname(d)
        groups.setdefault(tuple(segs), []).append(f)

    out = []
    for segs, members in sorted(groups.items()):
        sizes = [
            os.path.getsize(os.path.join(table_dir, m))
            for m in members
            if not os.path.isabs(m) or os.path.exists(m)
        ]
        n_small = sum(1 for s in sizes if s < small_bytes)
        if n_small < min_small:
            continue
        where = None
        if segs:
            # typed partition values from the hive path (the same
            # declared-schema typing the stats path uses)
            vals = _partition_values(
                os.path.join(*segs, "x.parquet"), col_types
            )
            where = [(k, "=", val) for k, val in vals.items()
                     if val is not None]
            if not where:
                continue  # null partition: unexpressible as a filter
        out.append(
            {
                "where": where,
                "n_small": n_small,
                "total_bytes": sum(sizes),
                "files": len(members),
            }
        )
    return out


def auto_compact(
    spark: SparkSession,
    table_dir: str,
    small_bytes: int = 32 * 1024 * 1024,
    min_small: int = 4,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> list[int]:
    """Apply the policy: one scoped ``OPTIMIZE WHERE`` commit per
    fragmented partition (whole-table OPTIMIZE for a fragmented flat
    table), each sized to ``ceil(partition_bytes / target_file_bytes)``
    output files. Returns the committed versions (empty = nothing to
    do). Each compaction is read-pinned: a concurrent writer surfaces
    as CommitConflict from compact_versioned — re-run the policy."""
    versions = []
    for cand in compaction_candidates(table_dir, small_bytes, min_small):
        target = max(1, math.ceil(cand["total_bytes"] / target_file_bytes))
        if cand["files"] <= target:
            continue  # already at or below the target layout
        versions.append(
            compact_versioned(
                spark,
                table_dir,
                target_files=target,
                where=cand["where"],
            )
        )
    return versions
