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
