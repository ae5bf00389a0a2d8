"""AS OF TIMESTAMP time travel (versioned.version_at_timestamp /
read_versioned(as_of=...)) and the round-7 CLI verbs (delete --dv,
rename-column, drop-column, history timestamps)."""

from __future__ import annotations

import datetime
import os
import time

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _nation(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))


def test_as_of_timestamp_resolution(spark, sf_dir, tdir):
    n = _nation(spark, sf_dir)
    V.write_versioned(spark, n.filter("n_nationkey < 10"), tdir, mode="append")
    t_between = time.time()
    time.sleep(0.05)
    V.write_versioned(spark, n.filter("n_nationkey >= 10"), tdir, mode="append")

    assert V.version_at_timestamp(tdir, t_between) == 1
    assert V.version_at_timestamp(tdir, time.time()) == 2
    # datetime / ISO-string forms resolve identically
    dt = datetime.datetime.fromtimestamp(t_between, datetime.timezone.utc)
    assert V.version_at_timestamp(tdir, dt) == 1
    assert V.version_at_timestamp(tdir, dt.isoformat()) == 1

    assert V.read_versioned(spark, tdir, as_of=t_between).count() == 10
    assert V.read_versioned(spark, tdir).count() == 25
    with pytest.raises(ValueError, match="at or before"):
        V.version_at_timestamp(tdir, t_between - 3600)
    with pytest.raises(ValueError, match="not both"):
        V.read_versioned(spark, tdir, version=1, as_of=t_between)


def test_as_of_after_vacuum_raises_for_pruned_history(spark, sf_dir, tdir):
    n = _nation(spark, sf_dir)
    V.write_versioned(spark, n.limit(5), tdir, mode="append")
    t1 = time.time()
    time.sleep(0.05)
    V.write_versioned(spark, n.limit(5), tdir, mode="append")
    V.vacuum(tdir, keep_last=1)
    with pytest.raises(ValueError, match="at or before"):
        V.version_at_timestamp(tdir, t1)


def test_cli_dv_delete_and_column_ddl(spark, sf_dir, tdir, capsys):
    from datalake_scripts_spark.cli import main

    n = _nation(spark, sf_dir)
    V.write_versioned(spark, n, tdir, mode="append")
    rc = main(
        ["table", "--dir", tdir, "delete",
         "--where", "n_nationkey % 5 = 0", "--dv"]
    )
    assert rc in (0, None)
    out = capsys.readouterr().out
    assert "deletion vector" in out and "deleted 5 rows" in out
    assert V.read_versioned(spark, tdir).count() == 20

    rc = main(
        ["table", "--dir", tdir, "rename-column",
         "--from", "n_name", "--to", "nation_name"]
    )
    assert rc in (0, None)
    assert "nation_name" in V.read_versioned(spark, tdir).columns

    rc = main(["table", "--dir", tdir, "drop-column", "--column", "n_regionkey"])
    assert rc in (0, None)
    got = V.read_versioned(spark, tdir)
    assert got.columns == ["n_nationkey", "nation_name"]
    assert got.count() == 20

    rc = main(["table", "--dir", tdir, "history"])
    assert rc in (0, None)
    hist = capsys.readouterr().out
    assert "mode=delete" in hist and "dvs=1" in hist and " at=" in hist


def test_catalog_ref_version_and_timestamp_pins(spark, sf_dir, tmp_path, monkeypatch):
    from datalake_scripts_spark.operators.catalog import Catalog

    cdir = str(tmp_path / "cat")
    monkeypatch.setenv("DATALAKE_CATALOG_DIR", cdir)
    cat = Catalog(cdir)
    n = _nation(spark, sf_dir)
    cat.save_as_table(spark, n.filter("n_nationkey < 10"), "nat")
    t_between = time.time()
    time.sleep(0.05)
    V.write_versioned(
        spark, n.filter("n_nationkey >= 10"), cat.table_dir("nat"),
        mode="append",
    )
    assert V.read_versioned(spark, "catalog:nat").count() == 25
    assert V.read_versioned(spark, "catalog:nat@v1").count() == 10
    iso = datetime.datetime.fromtimestamp(
        t_between, datetime.timezone.utc
    ).isoformat()
    assert V.read_versioned(spark, f"catalog:nat@{iso}").count() == 10
    with pytest.raises(ValueError, match="pass one"):
        V.read_versioned(spark, "catalog:nat@v1", version=2)
