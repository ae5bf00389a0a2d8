"""Crash-point injection for the exactly-once streaming sinks
(VERDICT r3 ask #6): Structured Streaming re-invokes foreachBatch with
the same epoch after a failure, so the sink must survive dying at ANY
point — after staging data files but before the manifest commit, and
after the commit but before the checkpoint acks. The existing e2e
tests restart only at clean epoch boundaries; these kill mid-epoch."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.streaming.sinks import (
    foreach_batch_audited_versioned,
    foreach_batch_versioned,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "stream_table")


class InjectedCrash(RuntimeError):
    pass


def _crash_once_in_commit(monkeypatch):
    """Make the NEXT manifest commit die after data files are staged
    (the commit is the last step, so staging has already happened)."""
    real = V._commit_manifest
    state = {"armed": True}

    def dying(*args, **kwargs):
        if state["armed"]:
            state["armed"] = False
            raise InjectedCrash("killed after staging, before manifest")
        return real(*args, **kwargs)

    monkeypatch.setattr(V, "_commit_manifest", dying)
    return state


def _orphans(table_dir: str) -> set[str]:
    """Data files on disk that no retained manifest references."""
    referenced: set[str] = set()
    for v in range(1, V.current_version(table_dir) + 1):
        try:
            m = V._load_manifest(table_dir, v)
        except FileNotFoundError:
            continue
        referenced.update(
            os.path.join(table_dir, f) for f in m["files"]
        )
    return set(glob.glob(f"{table_dir}/data/*")) - referenced


def test_versioned_sink_crash_between_staging_and_commit(
    spark, sf_dir, table_dir, monkeypatch
):
    nation = read_table(spark, sf_dir, "nation")
    sink = foreach_batch_versioned(table_dir)
    sink(nation, 0)  # epoch 0 lands clean
    v0 = V.current_version(table_dir)

    _crash_once_in_commit(monkeypatch)
    with pytest.raises(InjectedCrash):
        sink(nation, 1)  # dies mid-epoch: files staged, no manifest

    # the table pointer never moved; readers are unaffected
    assert V.current_version(table_dir) == v0
    assert V.read_versioned(spark, table_dir).count() == nation.count()
    # the staged files are orphans — invisible to every reader
    dead = _orphans(table_dir)
    assert dead, "expected staged-but-uncommitted files from the crash"

    # replay (what Structured Streaming does on restart): epoch 1 lands
    # EXACTLY once despite the earlier attempt
    sink(nation, 1)
    assert V.current_version(table_dir) == v0 + 1
    assert V.read_versioned(spark, table_dir).count() == 2 * nation.count()
    # a second replay of the same epoch no-ops (the ledger has it)
    sink(nation, 1)
    assert V.current_version(table_dir) == v0 + 1

    # vacuum GCs the crash's orphans without touching live data
    removed = V.vacuum(table_dir, keep_last=V.current_version(table_dir))
    assert removed == len(dead)
    assert _orphans(table_dir) == set()
    assert V.read_versioned(spark, table_dir).count() == 2 * nation.count()


def test_versioned_sink_crash_between_commit_and_checkpoint_ack(
    spark, sf_dir, table_dir
):
    """The OTHER failure window: the manifest committed but the stream
    died before the checkpoint recorded the epoch — replay must see the
    epoch in the manifest ledger and no-op (no duplicate rows)."""
    nation = read_table(spark, sf_dir, "nation")
    sink = foreach_batch_versioned(table_dir)
    sink(nation, 0)
    v1 = V.current_version(table_dir)
    # stream dies HERE; restart replays epoch 0
    sink(nation, 0)
    assert V.current_version(table_dir) == v1
    assert V.read_versioned(spark, table_dir).count() == nation.count()


def test_audited_sink_crash_between_staging_and_commit(
    spark, sf_dir, table_dir, tmp_path, monkeypatch
):
    from datalake_scripts_spark.operators import quality as Q

    nation = read_table(spark, sf_dir, "nation")
    qdir = str(tmp_path / "quarantine")
    sink = foreach_batch_audited_versioned(
        table_dir, [Q.not_null("n_name")], qdir
    )
    sink(nation, 0)
    v0 = V.current_version(table_dir)

    _crash_once_in_commit(monkeypatch)
    with pytest.raises(InjectedCrash):
        sink(nation, 1)
    assert V.current_version(table_dir) == v0
    dead = _orphans(table_dir)
    assert dead

    sink(nation, 1)  # replay lands the audited epoch exactly once
    sink(nation, 1)  # and a second replay no-ops
    assert V.current_version(table_dir) == v0 + 1
    assert V.read_versioned(spark, table_dir).count() == 2 * nation.count()
    assert V.vacuum(table_dir, keep_last=V.current_version(table_dir)) == len(dead)
    # a clean epoch never touched the quarantine lane
    assert not os.path.exists(qdir)


def test_versioned_sink_partitioned_epochs(spark, sf_dir, table_dir):
    """Partitioned streaming landing: each epoch appends hive-style
    files, replays no-op, and partition pruning spans all epochs."""
    from datalake_scripts_spark.operators.versioned import (
        _load_manifest,
        files_for_read,
    )

    nation = read_table(spark, sf_dir, "nation")
    sink = foreach_batch_versioned(table_dir, partition_by=["n_regionkey"])
    sink(nation, 0)
    sink(nation, 1)
    sink(nation, 1)  # replay: must no-op
    assert V.current_version(table_dir) == 2
    assert V.read_versioned(spark, table_dir).count() == 2 * nation.count()
    m = _load_manifest(table_dir, 2)
    assert all("n_regionkey=" in f for f in m["files"])
    opened = files_for_read(table_dir, skip_filter=[("n_regionkey", "=", 3)])
    assert 0 < len(opened) < len(m["files"])
    got = V.read_versioned(
        spark, table_dir, skip_filter=[("n_regionkey", "=", 3)]
    )
    assert got.count() == 2 * nation.filter("n_regionkey = 3").count()
