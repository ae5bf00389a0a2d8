"""Object-store commit stores (VERDICT r5 ask #1): the optimistic-
concurrency matrix must hold against (a) a REAL network boundary — the
HTTP conditional-PUT store talking to an in-process socket server —
and (b) a fault-injecting wrapper with torn writes, lost responses
(the S3 retry-ambiguity hazard), and list-after-write lag armed.
A deliberately-broken last-writer-wins store proves the matrix has
teeth: it DETECTS the lost update such a store permits."""

import threading

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators.commitstore import (
    CommitStore,
    FaultInjectingCommitStore,
    MemoryCommitStore,
    set_commit_store,
)
from datalake_scripts_spark.operators.commitstore_http import (
    HttpCommitStore,
    LocalObjectStoreServer,
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


@pytest.fixture(scope="module")
def server():
    s = LocalObjectStoreServer()
    yield s
    s.close()


@pytest.fixture(params=["http", "faulty_memory", "faulty_http"])
def store(request, server):
    if request.param == "http":
        s = HttpCommitStore(server.url)
    elif request.param == "faulty_memory":
        s = FaultInjectingCommitStore(MemoryCommitStore())
    else:
        s = FaultInjectingCommitStore(HttpCommitStore(server.url))
    prev = set_commit_store(s)
    yield s
    set_commit_store(prev)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "otable")


def _arm(store, fault, n=1):
    if isinstance(store, FaultInjectingCommitStore):
        store.arm(fault, n)


# ---------------------------------------------------------------- raw


def test_put_if_absent_exactly_one_winner(store, tmp_path):
    td = str(tmp_path / "raw")
    store.ensure_log(td)
    wins, barrier = [], threading.Barrier(8)

    def racer(i):
        barrier.wait()
        if store.put_if_absent(td, "v00001.json", b'{"w": %d}' % i):
            wins.append(i)

    threads = [threading.Thread(target=racer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(wins) == 1
    assert store.read(td, "v00001.json") == b'{"w": %d}' % wins[0]
    assert store.exists(td, "v00001.json")
    assert store.list_log(td) == ["v00001.json"]


def test_http_crud_and_pointer(server, tmp_path):
    s = HttpCommitStore(server.url)
    td = str(tmp_path / "crud")
    s.ensure_log(td)
    assert s.list_log(td) == []
    assert not s.exists(td, "v00001.json")
    with pytest.raises(FileNotFoundError):
        s.read(td, "v00001.json")
    assert s.put_if_absent(td, "v00001.json", b"a")
    assert not s.put_if_absent(td, "v00001.json", b"b")
    assert s.read(td, "v00001.json") == b"a"
    assert s.read_pointer(td) is None
    s.replace_pointer(td, 7)
    assert s.read_pointer(td) == 7
    # the pointer never shows up as a log object
    assert s.list_log(td) == ["v00001.json"]
    s.delete(td, "v00001.json")
    assert s.list_log(td) == []


def test_http_percent_and_space_names(server, tmp_path):
    """Table paths with URL-hostile characters namespace correctly."""
    s = HttpCommitStore(server.url)
    td = str(tmp_path / "we ird/ta%ble")
    assert s.put_if_absent(td, "v00001.json", b"x")
    assert s.read(td, "v00001.json") == b"x"
    assert s.list_log(td) == ["v00001.json"]


# --------------------------------------------- the S3 retry ambiguity


def test_lost_response_retry_is_not_a_conflict(server, tmp_path):
    """A conditional PUT whose response is dropped AFTER the write
    lands: the client retry sees 412 from its own object and must
    report SUCCESS (byte-identical), not conflict — the naive client
    here would make the commit layer append the same files twice."""
    s = HttpCommitStore(server.url)
    td = str(tmp_path / "ambig")
    server.faults["drop_response"] = 1
    assert s.put_if_absent(td, "v00001.json", b"mine") is True
    assert s.read(td, "v00001.json") == b"mine"
    # ...and when the drop hides a GENUINE loss (object pre-owned by
    # another writer), the retry still reports conflict
    server.faults["drop_response"] = 1
    assert s.put_if_absent(td, "v00001.json", b"theirs") is False


def test_torn_request_publishes_nothing_then_retry_lands(server, tmp_path):
    s = HttpCommitStore(server.url)
    td = str(tmp_path / "torn")
    server.faults["torn_request"] = 1
    assert s.put_if_absent(td, "v00001.json", b"whole") is True
    assert s.read(td, "v00001.json") == b"whole"


def test_fault_wrapper_ambiguous_success_semantics(tmp_path):
    w = FaultInjectingCommitStore(MemoryCommitStore())
    td = str(tmp_path / "fw")
    w.arm("ambiguous_success")
    assert w.put_if_absent(td, "v00001.json", b"mine") is True
    w.arm("ambiguous_success")
    assert w.put_if_absent(td, "v00001.json", b"other") is False
    assert w.stats["ambiguous_success"] == 2
    w.arm("torn_write")
    assert w.put_if_absent(td, "v00002.json", b"x") is True


def test_fault_wrapper_list_lag_and_visibility(tmp_path):
    w = FaultInjectingCommitStore(MemoryCommitStore())
    td = str(tmp_path / "lag")
    assert w.put_if_absent(td, "v00001.json", b"a")
    assert w.list_log(td) == ["v00001.json"]
    w.arm("delayed_visibility")
    assert w.put_if_absent(td, "v00002.json", b"b")
    # listing lags; read/exists/CAS stay strong (the contract line)
    assert w.list_log(td) == ["v00001.json"]
    assert w.exists(td, "v00002.json")
    assert w.read(td, "v00002.json") == b"b"
    assert not w.put_if_absent(td, "v00002.json", b"late")
    w.reveal()
    assert sorted(w.list_log(td)) == ["v00001.json", "v00002.json"]
    w.arm("list_lag")
    assert w.put_if_absent(td, "v00003.json", b"c")
    assert sorted(w.list_log(td)) == ["v00001.json", "v00002.json"]
    assert sorted(w.list_log(td)) == [
        "v00001.json", "v00002.json", "v00003.json"
    ]


# ------------------------------------------- versioned-layer matrix


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


def test_concurrent_appends_all_survive_with_faults(
    store, spark, sf_dir, table_dir
):
    """The full append/append race with the retry-hazard faults armed:
    every commit lands exactly once — no lost update, no double
    append from a retried ambiguous success."""
    region = read_table(spark, sf_dir, "region")
    n_threads, per_thread = 4, 2
    _arm(store, "ambiguous_success", 3)
    _arm(store, "torn_write", 2)
    _arm(store, "delayed_visibility", 2)
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
    if isinstance(store, FaultInjectingCommitStore):
        store.reveal()
    assert errs == []
    assert current_version(table_dir) == n_threads * per_thread
    total = read_versioned(spark, table_dir).count()
    assert total == region.count() * n_threads * per_thread
    if isinstance(store, FaultInjectingCommitStore):
        # the armed faults actually fired (the schedule isn't a no-op)
        assert store.stats.get("ambiguous_success", 0) == 3


def test_read_pinned_writer_conflicts(store, spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")
    pinned = current_version(table_dir)
    write_versioned(spark, region, table_dir, mode="append")
    with pytest.raises(CommitConflict):
        write_versioned(
            spark, region, table_dir, mode="overwrite",
            expected_version=pinned,
        )
    compact_versioned(spark, table_dir, target_files=1)
    assert read_versioned(spark, table_dir).count() == 2 * region.count()


def test_dml_timetravel_vacuum_roundtrip(store, spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    v1_rows = read_versioned(spark, table_dir).count()
    _arm(store, "ambiguous_success", 1)
    delete_versioned(spark, table_dir, "n_nationkey < 5")
    assert read_versioned(spark, table_dir).count() == v1_rows - 5
    assert read_versioned(spark, table_dir, version=1).count() == v1_rows
    vacuum(table_dir, keep_last=1)
    assert current_version(table_dir) == 2
    with pytest.raises(FileNotFoundError):
        _load_manifest(table_dir, 1)
    assert read_versioned(spark, table_dir).count() == v1_rows - 5


def test_pointer_is_cache_not_truth(store, spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    for _ in range(3):
        write_versioned(spark, region, table_dir, mode="append")
    store.replace_pointer(table_dir, 1)
    assert current_version(table_dir) == 3
    write_versioned(spark, region, table_dir, mode="append")
    assert store.read_pointer(table_dir) == 4


# ------------------------------------------------------ matrix teeth


class LastWriterWinsStore(CommitStore):
    """Deliberately BROKEN store: put_if_absent blindly overwrites and
    reports success — what a plain S3 PUT (no If-None-Match) degrades
    to. Exists only to prove the matrix detects the corruption."""

    def __init__(self):
        self._inner = MemoryCommitStore()

    def ensure_log(self, td):
        self._inner.ensure_log(td)

    def put_if_absent(self, td, name, data):
        self._inner.delete(td, name)
        assert self._inner.put_if_absent(td, name, data)
        return True  # everyone "wins"

    def read(self, td, name):
        return self._inner.read(td, name)

    def exists(self, td, name):
        return self._inner.exists(td, name)

    def list_log(self, td):
        return self._inner.list_log(td)

    def delete(self, td, name):
        self._inner.delete(td, name)

    def read_pointer(self, td):
        return self._inner.read_pointer(td)

    def replace_pointer(self, td, v):
        self._inner.replace_pointer(td, v)


def test_matrix_detects_last_writer_wins_corruption(spark, sf_dir, tmp_path):
    """Race two appends on the broken store: both writers think they
    committed version 2, one manifest silently vanishes, and rows are
    lost — exactly the corruption the CAS contract exists to prevent,
    and exactly what the assertions above would catch in CI."""
    td = str(tmp_path / "lww")
    prev = set_commit_store(LastWriterWinsStore())
    try:
        region = read_table(spark, sf_dir, "region")
        write_versioned(spark, region, td, mode="append")
        base = current_version(td)
        m = _load_manifest(td, base)
        # two racers both target base+1 (the interleaving a real race
        # produces); on a CAS store the second raises CommitConflict
        v_a = _commit_manifest(
            td, m["files"] + ["data/a.parquet"], m.get("stats", {}),
            "append", m.get("schema"), None, expected_version=base,
        )
        v_b = _commit_manifest(
            td, m["files"] + ["data/b.parquet"], m.get("stats", {}),
            "append", m.get("schema"), None, expected_version=base,
        )
        assert v_a == v_b == base + 1  # both "won"...
        survivor = _load_manifest(td, base + 1)["files"]
        # ...and writer A's append is GONE — the lost update
        assert "data/a.parquet" not in survivor
        assert "data/b.parquet" in survivor
    finally:
        set_commit_store(prev)
