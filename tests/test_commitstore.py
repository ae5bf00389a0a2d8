"""CommitStore seam (VERDICT r4 ask #3): the same optimistic-
concurrency matrix must hold on the POSIX store (os.link CAS) and on
the in-memory conditional-PUT store that models an object store's
If-None-Match publish — proving the versioned layer depends on
nothing POSIX-specific beyond the two-method contract, so an S3
deployment can plug in a conditional-PUT/DynamoDB store instead of
silently degrading to last-writer-wins."""

import threading

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators.commitstore import (
    MemoryCommitStore,
    PosixCommitStore,
    set_commit_store,
)
from datalake_scripts_spark.operators.versioned import (
    CommitConflict,
    _commit_manifest,
    _load_manifest,
    compact_versioned,
    current_version,
    delete_versioned,
    read_versioned,
    vacuum,
    write_versioned,
)


@pytest.fixture(params=["posix", "memory"])
def store(request):
    s = PosixCommitStore() if request.param == "posix" else MemoryCommitStore()
    prev = set_commit_store(s)
    yield s
    set_commit_store(prev)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "stable")


def test_put_if_absent_exactly_one_winner(store, tmp_path):
    """The raw contract: N threads racing one name — exactly one True,
    and every loser reads the winner's complete bytes."""
    td = str(tmp_path / "raw")
    store.ensure_log(td)
    wins, barrier = [], threading.Barrier(8)

    def racer(i):
        barrier.wait()
        if store.put_if_absent(td, "v00001.json", b"{\"w\": %d}" % i):
            wins.append(i)

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert store.read(td, "v00001.json") == b"{\"w\": %d}" % wins[0]
    assert store.exists(td, "v00001.json")
    assert store.list_log(td) == ["v00001.json"]


def test_commit_cas_one_winner_through_layer(store, spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")
    base = current_version(table_dir)
    m = _load_manifest(table_dir, base)
    _commit_manifest(
        table_dir, m["files"], m.get("stats", {}), "append",
        m.get("schema"), None, expected_version=base,
    )
    with pytest.raises(CommitConflict):
        _commit_manifest(
            table_dir, m["files"], m.get("stats", {}), "append",
            m.get("schema"), None, expected_version=base,
        )
    assert current_version(table_dir) == base + 1


def test_concurrent_appends_all_survive(store, spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    n_threads, per_thread = 4, 2
    errs = []

    def appender(i):
        try:
            df = region.withColumn("tag", F.lit(f"t{i}"))
            for _ in range(per_thread):
                write_versioned(spark, df, table_dir, mode="append")
        except Exception as e:  # pragma: no cover - failure reporter
            errs.append(e)

    threads = [
        threading.Thread(target=appender, args=(i,)) for i in range(n_threads)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert current_version(table_dir) == n_threads * per_thread
    total = read_versioned(spark, table_dir).count()
    assert total == region.count() * n_threads * per_thread


def test_read_pinned_writer_conflicts(store, spark, sf_dir, table_dir):
    """DML/OPTIMIZE pin the version they read; a commit landing in
    between must surface as CommitConflict on ANY store."""
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")
    pinned = current_version(table_dir)
    write_versioned(spark, region, table_dir, mode="append")  # interloper
    with pytest.raises(CommitConflict):
        write_versioned(
            spark, region, table_dir, mode="overwrite",
            expected_version=pinned,
        )
    # layer-level DML path too: compaction re-reads + pins internally,
    # so a clean run succeeds and the table stays consistent
    compact_versioned(spark, table_dir, target_files=1)
    assert read_versioned(spark, table_dir).count() == 2 * region.count()


def test_dml_timetravel_vacuum_roundtrip(store, spark, sf_dir, table_dir):
    """A full lifecycle (append, delete, time-travel, vacuum) against
    each store: log CRUD + pointer semantics all flow through it."""
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    v1_rows = read_versioned(spark, table_dir).count()
    delete_versioned(spark, table_dir, "n_nationkey < 5")
    assert read_versioned(spark, table_dir).count() == v1_rows - 5
    # time travel to v1 still sees the deleted rows
    assert read_versioned(spark, table_dir, version=1).count() == v1_rows
    vacuum(table_dir, keep_last=1)
    # pruned manifests are gone from the log, head still resolves
    assert current_version(table_dir) == 2
    with pytest.raises(FileNotFoundError):
        _load_manifest(table_dir, 1)
    assert read_versioned(spark, table_dir).count() == v1_rows - 5


def test_pointer_is_cache_not_truth(store, spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    for _ in range(3):
        write_versioned(spark, region, table_dir, mode="append")
    # regress the pointer: reads must still resolve the true head
    store.replace_pointer(table_dir, 1)
    assert current_version(table_dir) == 3
    # and the next commit heals the cache
    write_versioned(spark, region, table_dir, mode="append")
    assert store.read_pointer(table_dir) == 4
