"""Partition-spec evolution on versioned tables (VERDICT r5 ask #5).

The contract (Delta's explicit-change gate + Iceberg's metadata-
tracked spec versions): the spec is TABLE state in the manifest
(``partition_spec`` + ``spec_id``); ``partition_by=None`` inherits it;
a differing explicit spec raises unless ``evolve_partitioning=True``,
which bumps ``spec_id`` metadata-only — old files stay on their old
layout, reads span both, OPTIMIZE rewrites everything to the current
spec, and CDF stays multiset-correct across the change."""

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators.versioned import (
    _load_manifest,
    clone_versioned,
    compact_versioned,
    current_version,
    delete_versioned,
    files_for_read,
    read_changes,
    read_versioned,
    restore_versioned,
    write_versioned,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "evotable")


def _nation(spark, sf_dir):
    return read_table(spark, sf_dir, "nation")


def test_differing_spec_raises_without_evolve(spark, sf_dir, table_dir):
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    with pytest.raises(ValueError, match="evolve_partitioning"):
        write_versioned(
            spark, nation, table_dir, partition_by=["n_nationkey"]
        )
    with pytest.raises(ValueError, match="evolve_partitioning"):
        write_versioned(spark, nation, table_dir, partition_by=[])
    # nothing committed, nothing staged left behind
    assert current_version(table_dir) == 1
    m = _load_manifest(table_dir, 1)
    assert m["partition_spec"] == ["n_regionkey"] and m["spec_id"] == 0


def test_evolve_append_spans_both_layouts(spark, sf_dir, table_dir):
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    tagged = nation.withColumn("n_nationkey", F.col("n_nationkey") + 100)
    write_versioned(
        spark, tagged, table_dir,
        partition_by=["n_name"], evolve_partitioning=True,
    )
    m = _load_manifest(table_dir, 2)
    assert m["partition_spec"] == ["n_name"] and m["spec_id"] == 1
    # old files untouched (metadata-only evolution), new files on the
    # new layout
    old = [f for f in m["files"] if "n_regionkey=" in f]
    new = [f for f in m["files"] if "n_name=" in f]
    assert old and new and len(old) + len(new) == len(m["files"])
    # reads span both layouts with full fidelity
    got = read_versioned(spark, table_dir)
    want = nation.unionByName(tagged)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # pruning works on BOTH specs' columns (each file's own stats)
    a_name = nation.orderBy("n_nationkey").first().n_name
    for col, val in (("n_regionkey", 2), ("n_name", a_name)):
        opened = files_for_read(table_dir, skip_filter=[(col, "=", val)])
        assert 0 < len(opened) < len(m["files"])
    # the NEXT plain append inherits the NEW spec
    write_versioned(spark, nation, table_dir, mode="append")
    m3 = _load_manifest(table_dir, 3)
    assert m3["partition_spec"] == ["n_name"] and m3["spec_id"] == 1


def test_optimize_rewrites_to_current_spec(spark, sf_dir, table_dir):
    """OPTIMIZE across a spec change = Iceberg's rewrite-to-latest:
    afterwards every file is on the new layout and pruning on the new
    column is partition-grained."""
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    write_versioned(
        spark, nation.withColumn("n_nationkey", F.col("n_nationkey") + 100),
        table_dir, partition_by=["n_name"], evolve_partitioning=True,
    )
    v = compact_versioned(spark, table_dir, target_files=1)
    m = _load_manifest(table_dir, v)
    assert m["partition_spec"] == ["n_name"] and m["spec_id"] == 1
    assert all("n_name=" in f for f in m["files"])
    assert read_versioned(spark, table_dir).count() == 2 * nation.count()
    # old-spec snapshots stay time-travelable with their old layout
    assert read_versioned(spark, table_dir, version=1).count() == nation.count()


def test_cdf_multiset_correct_across_spec_change(spark, sf_dir, table_dir):
    """read_changes across the evolution commit: the evolving append
    shows exactly its inserted rows (old files are NOT rewritten, so
    no spurious delete+insert noise)."""
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    tagged = nation.withColumn("n_nationkey", F.col("n_nationkey") + 100)
    write_versioned(
        spark, tagged, table_dir,
        partition_by=["n_name"], evolve_partitioning=True,
    )
    ch = read_changes(spark, table_dir, 1, 2)
    assert ch.filter(F.col("_change_type") == "delete").count() == 0
    ins = ch.filter(F.col("_change_type") == "insert").drop(
        "_change_type", "_commit_version"
    )
    assert ins.exceptAll(tagged).count() == 0
    assert tagged.exceptAll(ins).count() == 0


def test_streaming_cdf_source_across_spec_change(spark, sf_dir, table_dir, tmp_path):
    """The versioned_changes streaming source replays both layout
    groups' files with partition columns restored per-file."""
    from datalake_scripts_spark.sources.versioned_datasource import (
        register_versioned_datasource,
    )

    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    tagged = nation.withColumn("n_nationkey", F.col("n_nationkey") + 100)
    write_versioned(
        spark, tagged, table_dir,
        partition_by=["n_name"], evolve_partitioning=True,
    )
    register_versioned_datasource(spark)
    out = str(tmp_path / "cdf_out")
    q = (
        spark.readStream.format("versioned_changes")
        .load(table_dir)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 2 * nation.count()
    # partition columns restored from BOTH layouts, never null
    assert got.filter(F.col("n_regionkey").isNull()).count() == 0
    assert got.filter(F.col("n_name").isNull()).count() == 0


def test_dml_preserves_current_spec(spark, sf_dir, table_dir):
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    write_versioned(
        spark, nation.withColumn("n_nationkey", F.col("n_nationkey") + 100),
        table_dir, partition_by=["n_name"], evolve_partitioning=True,
    )
    v, n = delete_versioned(spark, table_dir, "n_nationkey % 2 = 0")
    assert n > 0
    m = _load_manifest(table_dir, v)
    assert m["partition_spec"] == ["n_name"] and m["spec_id"] == 1
    got = read_versioned(spark, table_dir)
    assert got.filter("n_nationkey % 2 = 0").count() == 0


def test_restore_and_clone_carry_spec(spark, sf_dir, table_dir, tmp_path):
    nation = _nation(spark, sf_dir)
    write_versioned(spark, nation, table_dir, partition_by=["n_regionkey"])
    write_versioned(
        spark, nation, table_dir, mode="overwrite",
        partition_by=["n_name"], evolve_partitioning=True,
    )
    # restore to the v1 spec: spec flips back, spec_id keeps moving
    # forward (never reuse an id for a different spec epoch)
    v = restore_versioned(table_dir, 1)
    m = _load_manifest(table_dir, v)
    assert m["partition_spec"] == ["n_regionkey"]
    assert m["spec_id"] >= 1
    # a plain append now inherits the restored spec
    write_versioned(spark, nation, table_dir, mode="append")
    # clone starts on the source snapshot's spec
    dst = str(tmp_path / "evoclone")
    clone_versioned(spark, table_dir, dst, shallow=False)
    mc = _load_manifest(dst, 1)
    assert mc["partition_spec"] == ["n_regionkey"]
