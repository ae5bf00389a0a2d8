"""Versioned parquet tables: snapshot isolation, append/overwrite
manifests, time travel, vacuum."""

import glob

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators.versioned import (
    current_version,
    read_versioned,
    vacuum,
    write_versioned,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "vtable")


def test_append_versions_accumulate(spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    v1 = write_versioned(spark, region, table_dir, mode="append")
    v2 = write_versioned(spark, region, table_dir, mode="append")
    assert (v1, v2) == (1, 2)
    assert read_versioned(spark, table_dir).count() == 2 * region.count()
    # time travel to v1
    assert read_versioned(spark, table_dir, version=1).count() == region.count()


def test_overwrite_keeps_history(spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("r_regionkey"), F.col("n_name").alias("r_name")
    )
    write_versioned(spark, region, table_dir, mode="append")
    write_versioned(spark, nation, table_dir, mode="overwrite")
    assert read_versioned(spark, table_dir).count() == nation.count()
    assert read_versioned(spark, table_dir, version=1).count() == region.count()


def test_reader_never_sees_partial(spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")
    before = read_versioned(spark, table_dir)  # plan bound to v1 manifest
    write_versioned(spark, region, table_dir, mode="append")
    # the v1 reader still resolves exactly its snapshot's files
    assert before.count() == region.count()
    assert current_version(table_dir) == 2


def test_vacuum_drops_unreferenced(spark, sf_dir, table_dir):
    region = read_table(spark, sf_dir, "region")
    write_versioned(spark, region, table_dir, mode="append")
    write_versioned(spark, region, table_dir, mode="overwrite")
    n_files_before = len(glob.glob(f"{table_dir}/data/*"))
    removed = vacuum(table_dir, keep_last=1)
    assert removed > 0
    assert len(glob.glob(f"{table_dir}/data/*")) == n_files_before - removed
    # latest still readable; v1 history gone
    assert read_versioned(spark, table_dir).count() == region.count()
    with pytest.raises(FileNotFoundError):
        read_versioned(spark, table_dir, version=1)
