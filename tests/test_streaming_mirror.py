"""The full production loop, end to end: a Structured Streaming query
commits epochs exactly-once into a versioned table while BOTH format
mirrors (Delta log + Iceberg metadata) sync per epoch — the cron shape
a real deployment runs (reference analog: jhub_proc.py's 15-minute
loader) — then mirror retention runs on the live mirrors. Proves the
interop layer tracks a moving table, not just a finished one: every
epoch becomes one snapshot in each mirror, replays stay idempotent in
all three stores, and the independent readers agree with the native
read at every point."""

from __future__ import annotations

import os

import pyspark.sql.types as T

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.delta_interop import (
    clean_delta_log,
    sync_delta_log,
)
from datalake_scripts_spark.operators.delta_reader import DeltaLog
from datalake_scripts_spark.operators.iceberg_interop import (
    expire_iceberg_snapshots,
    sync_iceberg_metadata,
)
from datalake_scripts_spark.operators.iceberg_reader import IcebergTable
from datalake_scripts_spark.streaming import (
    foreach_batch_versioned,
    stream_from_directory,
)

_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _native_rows(spark, table_dir):
    return sorted(map(tuple, V.read_versioned(spark, table_dir).collect()))


def test_streaming_sink_with_per_epoch_mirror_sync(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    table_dir = str(tmp_path / "vtable")
    ckpt = str(tmp_path / "ckpt")
    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    ev.repartition(3).write.mode("overwrite").parquet(src)
    n_total = ev.count()

    commit = foreach_batch_versioned(table_dir)
    synced_epochs = []

    def sink(batch_df, epoch_id):
        commit(batch_df, epoch_id)
        # the cron loop, inline: every epoch refreshes both mirrors
        sync_delta_log(table_dir)
        sync_iceberg_metadata(table_dir)
        synced_epochs.append(int(epoch_id))

    def run_once():
        q = (
            stream_from_directory(
                spark, src, schema=_SCHEMA, max_files_per_trigger=1
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_once()
    assert V.current_version(table_dir) == 3
    native = _native_rows(spark, table_dir)
    assert len(native) == n_total

    # both mirrors tracked every epoch: one snapshot per commit
    t = IcebergTable(table_dir)
    assert t.sequence_numbers() == [1, 2, 3]
    assert t.snapshot().to_rows() == native
    log = DeltaLog(table_dir)
    assert log.to_rows() == native
    # per-epoch time travel through BOTH independent readers
    for seq in (1, 2, 3):
        want = sorted(
            map(
                tuple,
                V.read_versioned(spark, table_dir, version=seq).collect(),
            )
        )
        assert t.snapshot(sequence_number=seq).to_rows() == want
        assert log.to_rows(version=seq - 1) == want

    # replay: a second run over the same checkpoint must be a no-op in
    # ALL THREE stores (the epoch ledger is the idempotency source)
    run_once()
    assert V.current_version(table_dir) == 3
    assert sync_delta_log(table_dir) == 0
    assert sync_iceberg_metadata(table_dir) == 0
    assert IcebergTable(table_dir).sequence_numbers() == [1, 2, 3]

    # retention on the LIVE mirrors: readers stay whole at the head
    res = expire_iceberg_snapshots(table_dir, keep_last=1)
    assert res["expired"] == 2
    assert IcebergTable(table_dir).snapshot().to_rows() == native
    res = clean_delta_log(table_dir, keep_last=1)
    assert res["removed_json"] == 2
    assert DeltaLog(table_dir).to_rows() == native

    # and the loop keeps turning after retention: one more epoch
    ev.limit(7).withColumn(
        "event_id", ev.limit(7)["event_id"] + 10_000_000
    ).coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert V.current_version(table_dir) == 4
    native2 = _native_rows(spark, table_dir)
    assert len(native2) == n_total + 7
    assert IcebergTable(table_dir).snapshot().to_rows() == native2
    assert DeltaLog(table_dir).to_rows() == native2
    assert IcebergTable(table_dir).sequence_numbers() == [3, 4]
    assert os.path.exists(
        os.path.join(table_dir, "_delta_log", "_last_checkpoint")
    )


def test_compliance_circle_purge_sync_expire(spark, sf_dir, tmp_path):
    """Right-to-be-forgotten across the WHOLE deployment: mirrors are
    synced, a subject is physically purged (COW delete + vacuum), the
    mirrors sync the purge commit, and retention expires the pre-purge
    snapshots whose manifests still reference the erased files. After
    the circle both independent readers serve the head WITHOUT the
    subject, and neither mirror retains a readable pre-purge
    snapshot — the erased bytes are unreachable everywhere."""
    import pytest

    from datalake_scripts_spark.operators.iceberg_reader import (
        IcebergReadError,
    )

    table_dir = str(tmp_path / "t")
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    V.write_versioned(
        spark, orders.filter("o_orderkey < 400"), table_dir, mode="append"
    )
    V.write_versioned(
        spark,
        orders.filter("o_orderkey >= 400 AND o_orderkey < 800"),
        table_dir, mode="append",
    )
    sync_delta_log(table_dir)
    sync_iceberg_metadata(table_dir)
    subject = int(
        V.read_versioned(spark, table_dir).limit(1).collect()[0]["o_custkey"]
    )
    res = V.purge_rows(
        spark, [table_dir], f"o_custkey = {subject}", verify=True
    )
    assert res[table_dir]["n_deleted"] > 0
    # the purge commit flows into both mirrors (vacuumed pre-purge
    # source manifests must not break the incremental sync — r9)
    assert sync_delta_log(table_dir) >= 1
    assert sync_iceberg_metadata(table_dir) >= 1
    native = _native_rows(spark, table_dir)
    assert all(r[1] != subject for r in native)
    assert IcebergTable(table_dir).snapshot().to_rows() == native
    assert DeltaLog(table_dir).to_rows() == native
    # retention: expire every pre-purge snapshot from both mirrors
    expire_iceberg_snapshots(table_dir, keep_last=1)
    clean_delta_log(table_dir, keep_last=1)
    t = IcebergTable(table_dir)
    assert len(t.sequence_numbers()) == 1
    assert t.snapshot().to_rows() == native
    with pytest.raises(IcebergReadError):
        t.snapshot(sequence_number=1)
    log = DeltaLog(table_dir)
    assert log.to_rows() == native
