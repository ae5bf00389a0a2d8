"""Auto-compaction policy (operators/maintenance.py): metadata-only
candidate detection + scoped OPTIMIZE WHERE per fragmented partition."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.maintenance import (
    auto_compact,
    compaction_candidates,
)


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


def test_flat_table_fragmentation_detected_and_folded(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    for i in range(6):  # six tiny epoch-like appends
        V.write_versioned(
            spark, df.filter(F.col("o_orderkey") % 6 == i), tdir,
            mode="append",
        )
    assert len(V.files_for_read(tdir)) >= 6
    cands = compaction_candidates(tdir, small_bytes=1 << 20, min_small=4)
    assert len(cands) == 1 and cands[0]["where"] is None
    versions = auto_compact(spark, tdir, small_bytes=1 << 20, min_small=4)
    assert len(versions) == 1
    assert len(V.files_for_read(tdir)) == 1
    assert V.read_versioned(spark, tdir).count() == df.count()
    # idempotent: a healthy table produces no work
    assert auto_compact(spark, tdir, small_bytes=1 << 20, min_small=4) == []


def test_partitioned_only_fragmented_partition_compacts(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(
        spark, df, tdir, mode="append", partition_by=["o_orderpriority"]
    )
    # fragment ONE partition with 5 more tiny appends
    for i in range(5):
        V.write_versioned(
            spark,
            df.filter(
                (F.col("o_orderpriority") == "5-LOW")
                & (F.col("o_orderkey") % 5 == i)
            ),
            tdir,
            mode="append",
        )
    before = set(V.files_for_read(tdir))
    cands = compaction_candidates(tdir, small_bytes=1 << 20, min_small=4)
    assert [c["where"] for c in cands] == [[("o_orderpriority", "=", "5-LOW")]]
    versions = auto_compact(spark, tdir, small_bytes=1 << 20, min_small=4)
    assert len(versions) == 1
    after = set(V.files_for_read(tdir))
    # only 5-LOW files rewrote; every other partition carried
    assert all("5-LOW" in f for f in before - after)
    assert all("5-LOW" in f for f in after - before)
    got = V.read_versioned(spark, tdir)
    assert got.count() == df.count() + df.filter(
        "o_orderpriority = '5-LOW'"
    ).count()


def test_transform_partitioned_auto_compact(spark, sf_dir, tdir):
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "event_type", "value"
    )
    one_day = ev.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    for i in range(4):  # fragment one day
        V.write_versioned(
            spark, one_day.filter(F.col("event_id") % 4 == i), tdir,
            mode="append",
        )
    before = set(V.files_for_read(tdir))
    versions = auto_compact(spark, tdir, small_bytes=1 << 20, min_small=4)
    assert len(versions) == 1
    after = set(V.files_for_read(tdir))
    assert all("_p_days_ts=2024-01-05" in f for f in before - after)
    assert V.read_versioned(spark, tdir).count() == ev.count() + one_day.count()
