"""Versioned parquet tables — manifest-based snapshots over a plain
parquet directory (a Delta-lite: the image has no Delta jars, but the
north star is "PySpark scripts over Delta/Parquet", so the engine
provides the transactional behaviors that matter on the same layout).

Layout:

    table_dir/
      data/part-<uuid>-*.parquet      immutable data files
      _manifests/v00001.json          {"version", "files", "mode", ...}
      _latest                         text file: highest committed version

Semantics:
- writers stage data files first, then commit a manifest, then flip
  ``_latest`` via atomic rename — readers NEVER see a half-written
  snapshot (the reference's overwrite = DROP TABLE + reload leaves a
  window where readers see nothing, SURVEY.md §1.1);
- ``append`` manifests reference prior files + new ones (no rewrite);
  ``overwrite`` references only the new ones — old files stay for time
  travel until vacuumed;
- ``read_versioned(..., version=K)`` time-travels to any committed
  snapshot; ``vacuum`` drops files unreferenced by kept manifests.

Single-writer semantics (no distributed lock): the engine's job
orchestration must serialize writers per table, which matches the
reference's cron model. Concurrent READERS are always safe.
"""

from __future__ import annotations

import json
import os
import re
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(table_dir, "_manifests")


def _latest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_latest")


def current_version(table_dir: str) -> int:
    """Highest committed version, 0 if the table doesn't exist yet."""
    try:
        with open(_latest_path(table_dir)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")) as f:
        return json.load(f)


def write_versioned(
    spark: SparkSession, df: DataFrame, table_dir: str, mode: str = "append"
) -> int:
    """Commit ``df`` as a new snapshot; returns the new version number."""
    assert mode in ("append", "overwrite")
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    data_dir = os.path.join(table_dir, "data")

    # 1. stage immutable data files under a unique prefix
    staging = os.path.join(table_dir, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    os.makedirs(data_dir, exist_ok=True)
    new_files = []
    for name in sorted(os.listdir(staging)):
        if name.endswith(".parquet"):
            dst = f"part-{uuid.uuid4().hex}-{name}"
            os.rename(os.path.join(staging, name), os.path.join(data_dir, dst))
            new_files.append(os.path.join("data", dst))
    import shutil

    shutil.rmtree(staging)

    # 2. commit the manifest
    prev = current_version(table_dir)
    files = new_files
    if mode == "append" and prev > 0:
        files = _load_manifest(table_dir, prev)["files"] + new_files
    version = prev + 1
    manifest = {"version": version, "mode": mode, "files": files}
    mpath = os.path.join(_manifest_dir(table_dir), f"v{version:05d}.json")
    with open(mpath, "w") as f:
        json.dump(manifest, f)

    # 3. flip the pointer atomically (readers see old or new, never half)
    tmp = _latest_path(table_dir) + f".tmp{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, _latest_path(table_dir))
    return version


def read_versioned(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot (latest by default; ``version`` time-travels)."""
    v = version or current_version(table_dir)
    if v == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    files = _load_manifest(table_dir, v)["files"]
    paths = [os.path.join(table_dir, f) for f in files]
    return spark.read.parquet(*paths)


def vacuum(table_dir: str, keep_last: int = 1) -> int:
    """Delete data files unreferenced by the last ``keep_last`` manifests
    (and drop the older manifests). Returns number of files removed."""
    latest = current_version(table_dir)
    keep_versions = set(range(max(1, latest - keep_last + 1), latest + 1))
    keep_files: set[str] = set()
    for v in keep_versions:
        keep_files.update(_load_manifest(table_dir, v)["files"])
    data_dir = os.path.join(table_dir, "data")
    removed = 0
    for name in os.listdir(data_dir):
        rel = os.path.join("data", name)
        if rel not in keep_files:
            os.remove(os.path.join(data_dir, name))
            removed += 1
    for name in os.listdir(_manifest_dir(table_dir)):
        # only vNNNNN.json manifests — a stray file (editor temp, an
        # interrupted _latest .tmp) must not abort vacuum mid-delete
        if not re.fullmatch(r"v\d{5}\.json", name):
            continue
        v = int(name[1:6])
        if v not in keep_versions:
            os.remove(os.path.join(_manifest_dir(table_dir), name))
    return removed
