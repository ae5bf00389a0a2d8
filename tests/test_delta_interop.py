"""Delta ``_delta_log`` interop (operators/delta_interop.py, VERDICT
r6 ask #2): export is hand-parsed against the public protocol shape;
import round-trips a table through the Delta log as the ONLY metadata
source of truth.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.delta_interop import (
    export_delta_log,
    import_delta_log,
)


def _orders(spark, sf_dir, lo, hi):
    from datalake_scripts_spark.io import read_table

    return (
        read_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


def _build_history(spark, sf_dir, base):
    """append, append, DELETE, OPTIMIZE — four commits covering adds,
    removes, and a dataChange=false re-layout."""
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 2000, 4000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    V.compact_versioned(spark, base, target_files=1)
    return V.current_version(base)


def _commit_actions(log_dir, dv):
    with open(os.path.join(log_dir, f"{dv:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _wipe_own_log(base):
    """Remove the versioned manifest chain + pointer so the Delta log
    is the only remaining metadata."""
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)


def test_export_protocol_shape(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    latest = _build_history(spark, sf_dir, base)
    log_dir = export_delta_log(base)
    names = sorted(os.listdir(log_dir))
    assert names == [f"{v:020d}.json" for v in range(latest)]

    a0 = _commit_actions(log_dir, 0)
    assert a0[0] == {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    meta = a0[1]["metaData"]
    schema = json.loads(meta["schemaString"])
    assert [f["name"] for f in schema["fields"]] == [
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority",
    ]
    adds0 = [a["add"] for a in a0 if "add" in a]
    assert adds0 and all(a["dataChange"] for a in adds0)
    st = json.loads(adds0[0]["stats"])
    assert st["numRecords"] > 0 and "o_orderkey" in st["minValues"]
    for add in adds0:  # size/mtime come from the real staged files
        assert add["size"] == os.path.getsize(os.path.join(base, add["path"]))

    # commit 1 is a pure append: adds only
    a1 = _commit_actions(log_dir, 1)
    assert any("add" in a for a in a1) and not any("remove" in a for a in a1)
    # commit 2 is the DELETE: removes + adds, dataChange=true
    a2 = _commit_actions(log_dir, 2)
    assert any("remove" in a for a in a2)
    assert all(a["remove"]["dataChange"] for a in a2 if "remove" in a)
    # commit 3 is OPTIMIZE: pure re-layout, dataChange=false everywhere
    a3 = _commit_actions(log_dir, 3)
    acts = [a for a in a3 if "add" in a or "remove" in a]
    assert acts
    for a in acts:
        body = a.get("add") or a.get("remove")
        assert body["dataChange"] is False
    assert any(
        a["commitInfo"]["operation"] == "OPTIMIZE"
        for a in a3
        if "commitInfo" in a
    )


def test_roundtrip_through_delta_log_only(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    latest = _build_history(spark, sf_dir, base)
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    v1_rows = V.read_versioned(spark, base, version=1).count()
    export_delta_log(base)
    _wipe_own_log(base)
    with pytest.raises(FileNotFoundError):
        V.read_versioned(spark, base)  # truly gone
    assert import_delta_log(base) == latest
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == expected
    # pre-adoption history time-travels
    assert V.read_versioned(spark, base, version=1).count() == v1_rows
    # imported stats still skip files
    all_files = V.files_for_read(base)
    pruned = V.files_for_read(
        base, skip_filter=[("o_orderkey", "<", -1)]
    )
    assert len(pruned) < len(all_files) or len(all_files) == 1
    # and the adopted table accepts new commits on top
    V.write_versioned(spark, _orders(spark, sf_dir, 4000, 4500), base, mode="append")
    assert V.current_version(base) == latest + 1


def test_roundtrip_partitioned_table(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 3000), base, mode="append",
        partition_by=["o_orderpriority"],
    )
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)
    a0 = _commit_actions(log_dir, 0)
    assert a0[1]["metaData"]["partitionColumns"] == ["o_orderpriority"]
    adds = [a["add"] for a in a0 if "add" in a]
    assert all("o_orderpriority" in a["partitionValues"] for a in adds)
    _wipe_own_log(base)
    import_delta_log(base)
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    # partition spec survived adoption
    m = V._load_manifest(base, V.current_version(base))
    assert m["partition_spec"] == ["o_orderpriority"]


def test_import_rejections(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    log_dir = export_delta_log(base)
    # existing manifest chain -> refuse
    with pytest.raises(ValueError, match="already has a versioned"):
        import_delta_log(base)
    _wipe_own_log(base)
    # protocol needing reader features -> refuse
    p = os.path.join(log_dir, f"{0:020d}.json")
    lines = open(p).read().splitlines()
    with open(p, "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 3,
                                          "minWriterVersion": 7}}) + "\n")
        fh.write("\n".join(lines[1:]) + "\n")
    with pytest.raises(ValueError, match="minReaderVersion"):
        import_delta_log(base)
    # restore, then truncate the chain head -> refuse
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    os.rename(p, os.path.join(log_dir, f"{7:020d}.json"))
    with pytest.raises(ValueError, match="contiguous"):
        import_delta_log(base)


def test_roundtrip_column_mapped_table(spark, sf_dir, tmp_path):
    """ADVICE r7 medium: a renamed column used to export a schemaString
    with logical names and NO columnMapping metadata (protocol pinned
    1/2), so Delta readers null-filled every renamed column. The export
    now emits the 2/5 protocol upgrade + columnMapping.mode=name at the
    commit where mapping appears, and the import speaks it back."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.rename_column(base, "o_orderkey", "order_id")  # enables mapping
    V.write_versioned(
        spark,
        _orders(spark, sf_dir, 2000, 3000).withColumnRenamed(
            "o_orderkey", "order_id"
        ),
        base,
        mode="append",
    )
    latest = V.current_version(base)
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)

    # commit 0 predates mapping: base protocol, plain schema
    a0 = _commit_actions(log_dir, 0)
    assert a0[0] == {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
    s0 = json.loads(a0[1]["metaData"]["schemaString"])
    assert all(
        "delta.columnMapping.physicalName" not in f["metadata"]
        for f in s0["fields"]
    )
    # the rename commit upgrades the protocol and emits mapped metaData
    a1 = _commit_actions(log_dir, 1)
    assert {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}} in a1
    meta = next(a["metaData"] for a in a1 if "metaData" in a)
    assert meta["configuration"]["delta.columnMapping.mode"] == "name"
    assert int(meta["configuration"]["delta.columnMapping.maxColumnId"]) >= 4
    s1 = json.loads(meta["schemaString"])
    by_name = {f["name"]: f["metadata"] for f in s1["fields"]}
    # renamed column: logical name new, physicalName is the in-file name
    assert by_name["order_id"]["delta.columnMapping.physicalName"] == "o_orderkey"
    assert isinstance(by_name["order_id"]["delta.columnMapping.id"], int)
    # our internal mapping keys never leak into the exported schema
    assert all(
        "physical" not in m and "cid" not in m for m in by_name.values()
    )

    _wipe_own_log(base)
    assert import_delta_log(base) == latest
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == expected
    df = V.read_versioned(spark, base)
    assert df.columns[0] == "order_id"
    # mapping survives adoption: further metadata-only renames work and
    # cids keep advancing from the imported maxColumnId
    V.rename_column(base, "order_id", "okey")
    assert V.read_versioned(spark, base).columns[0] == "okey"
    assert (
        V._load_manifest(base, V.current_version(base))["max_column_id"] >= 4
    )


def test_import_refuses_id_mapping_mode(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    log_dir = export_delta_log(base)
    _wipe_own_log(base)
    p = os.path.join(log_dir, f"{0:020d}.json")
    lines = [json.loads(x) for x in open(p).read().splitlines()]
    for a in lines:
        if "metaData" in a:
            a["metaData"]["configuration"] = {"delta.columnMapping.mode": "id"}
    lines[0] = {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}
    with open(p, "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    with pytest.raises(ValueError, match="columnMapping.mode"):
        import_delta_log(base)


def test_import_foreign_minimal_log(spark, tmp_path):
    """A hand-written Delta log (as a non-Spark writer like delta-rs
    would produce, stats-free adds) adopts and reads."""
    base = str(tmp_path / "foreign")
    os.makedirs(os.path.join(base, "_delta_log"))
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    df.coalesce(1).write.parquet(os.path.join(base, "stage"))
    part = next(
        f for f in os.listdir(os.path.join(base, "stage"))
        if f.endswith(".parquet")
    )
    os.rename(os.path.join(base, "stage", part), os.path.join(base, "part-0.parquet"))
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "long", "nullable": True, "metadata": {}},
    ]}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 0}},
        {"add": {"path": "part-0.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ]
    with open(os.path.join(base, "_delta_log", f"{0:020d}.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
    assert import_delta_log(base) == 1
    got = V.read_versioned(spark, base)
    assert got.count() == 100
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(100))


def test_sync_delta_log_incremental(spark, sf_dir, tmp_path):
    """sync_delta_log writes only the not-yet-exported commits and
    reuses the table id, so a mirror kept current across table commits
    reads as one continuous Delta table."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    log_dir = export_delta_log(base)
    id0 = _commit_actions(log_dir, 0)[1]["metaData"]["id"]
    mtime0 = os.path.getmtime(os.path.join(log_dir, f"{0:020d}.json"))
    from datalake_scripts_spark.operators.delta_interop import sync_delta_log

    # no new commits -> no-op
    assert sync_delta_log(base) == 0
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderkey < 100")
    assert sync_delta_log(base) == 2
    names = sorted(os.listdir(log_dir))
    assert [n for n in names if n.endswith(".json")] == [
        f"{v:020d}.json" for v in range(3)
    ]
    # commit 0 was not rewritten; new commits carry the same table id
    assert os.path.getmtime(os.path.join(log_dir, f"{0:020d}.json")) == mtime0
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    _wipe_own_log(base)
    assert import_delta_log(base) == 3
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    m0 = V._load_manifest(base, 1)
    assert m0["meta"]["delta_import"] == 0


def test_sync_survives_vacuum(spark, sf_dir, tmp_path):
    """A vacuum that drops every manifest older than the last export
    (purge_rows runs one) must not break subsequent syncs: diff state
    replays from the MIRROR's own tail, not from manifest v1 (ADVICE
    r8 medium)."""
    from datalake_scripts_spark.operators.delta_interop import sync_delta_log

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    log_dir = export_delta_log(base)
    id0 = _commit_actions(log_dir, 0)[1]["metaData"]["id"]
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    assert sync_delta_log(base) == 1
    V.delete_versioned(spark, base, "o_orderkey < 100")
    # manifests 1 and 2 are gone now; only manifest 3 survives
    V.vacuum(base, keep_last=1)
    assert sync_delta_log(base) == 1
    # same continuous table: id reused, no spurious metaData re-emission
    acts2 = _commit_actions(log_dir, 2)
    assert not any("metaData" in a for a in acts2)
    assert any("remove" in a for a in acts2) and any("add" in a for a in acts2)
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    _wipe_own_log(base)
    assert import_delta_log(base) == 3
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    assert _commit_actions(log_dir, 0)[1]["metaData"]["id"] == id0


def test_sync_vacuumed_gap_emits_placeholder(spark, sf_dir, tmp_path):
    """A manifest vacuumed before it was EVER synced is
    unrepresentable: its Delta commit becomes a commitInfo-only VACUUM
    placeholder (versions stay contiguous) and the next surviving
    manifest's diff carries the cumulative change."""
    from datalake_scripts_spark.operators.delta_interop import sync_delta_log

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    log_dir = export_delta_log(base)
    # two unsynced commits, then a vacuum that drops the first of them
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderkey < 500")
    V.vacuum(base, keep_last=1)
    assert sync_delta_log(base) == 2
    acts1 = _commit_actions(log_dir, 1)
    assert len(acts1) == 1 and acts1[0]["commitInfo"]["operation"] == "VACUUM"
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    _wipe_own_log(base)
    assert import_delta_log(base) == 3
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected


def test_sync_log_cleaned_mirror(spark, sf_dir, tmp_path):
    """Delta log cleanup removes commit 0 (where the old code read the
    table id) — a checkpointed, log-cleaned mirror must still sync,
    resolving state + table id from the checkpoint, and must still be
    able to write its NEXT checkpoint from that bootstrap."""
    from datalake_scripts_spark.operators.delta_interop import (
        sync_delta_log,
        write_delta_checkpoint,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    log_dir = export_delta_log(base)
    write_delta_checkpoint(base)  # at commit 1
    id0 = _commit_actions(log_dir, 0)[1]["metaData"]["id"]
    # log cleanup: every pre-checkpoint JSON is gone, commit 0 included
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    os.remove(os.path.join(log_dir, f"{1:020d}.json"))
    V.delete_versioned(spark, base, "o_orderkey < 100")
    assert sync_delta_log(base) == 1
    acts2 = _commit_actions(log_dir, 2)
    assert any("remove" in a for a in acts2)
    assert not any("metaData" in a for a in acts2)
    # a fresh checkpoint bootstraps from the old one + the JSON tail
    write_delta_checkpoint(base)
    lc = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert lc["version"] == 2
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    _wipe_own_log(base)
    assert import_delta_log(base) >= 1
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    # table id survived the whole journey
    from datalake_scripts_spark.operators.delta_interop import (
        _read_checkpoint_state,
    )
    assert _read_checkpoint_state(log_dir, 2)[1]["id"] == id0


def test_fresh_export_after_vacuum(spark, sf_dir, tmp_path):
    """Exporting a never-mirrored table whose early manifests were
    vacuumed: placeholder commits keep Delta versions aligned with
    manifest versions, commit 0 still carries protocol+metaData, and
    the import reproduces the live state."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    V.vacuum(base, keep_last=1)
    log_dir = export_delta_log(base)
    acts0 = _commit_actions(log_dir, 0)
    assert "protocol" in acts0[0] and "metaData" in acts0[1]
    assert acts0[-1]["commitInfo"]["operation"] == "VACUUM"
    assert not any("add" in a for a in acts0)
    acts1 = _commit_actions(log_dir, 1)
    assert any("add" in a for a in acts1)
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    _wipe_own_log(base)
    assert import_delta_log(base) == 2
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected


def test_checkpoint_write_and_truncated_import(spark, sf_dir, tmp_path):
    """A checkpoint-truncated log (pre-checkpoint JSONs deleted, the
    shape every long-lived real Delta table has) bootstraps the import
    from the parquet checkpoint and replays the JSON tail."""
    from datalake_scripts_spark.operators.delta_interop import (
        write_delta_checkpoint,
    )

    base = str(tmp_path / "tbl")
    latest = _build_history(spark, sf_dir, base)  # 4 commits: 0..3
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)
    cp = write_delta_checkpoint(base, version=2)
    assert os.path.basename(cp) == f"{2:020d}.checkpoint.parquet"
    lc = json.load(open(os.path.join(log_dir, "_last_checkpoint")))
    assert lc["version"] == 2 and lc["size"] >= 3
    # truncate: delete JSON commits 0..2 (vacuumed by a log-cleanup job)
    for dv in range(3):
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    _wipe_own_log(base)
    got_v = import_delta_log(base)
    # checkpoint snapshot -> v1, JSON commit 3 -> v2
    assert got_v == 2
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    m1 = V._load_manifest(base, 1)
    assert m1["meta"]["delta_checkpoint"] == 2
    # the checkpoint snapshot itself time-travels (state after commit 2)
    assert V.read_versioned(spark, base, version=1).count() > 0
    # imported stats survive the parquet round-trip and still prune
    pruned = V.files_for_read(base, skip_filter=[("o_orderkey", "<", -1)])
    assert pruned == [] or len(V.files_for_read(base)) == 1
    # adopted table accepts further commits + further syncs
    V.write_versioned(spark, _orders(spark, sf_dir, 4000, 4200), base, mode="append")
    assert V.current_version(base) == got_v + 1


def test_checkpoint_only_log_adopts(spark, sf_dir, tmp_path):
    """A log holding ONLY a checkpoint (every JSON cleaned up) still
    adopts: the checkpoint is the complete state."""
    from datalake_scripts_spark.operators.delta_interop import (
        write_delta_checkpoint,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1500), base, mode="append")
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)
    write_delta_checkpoint(base)
    os.remove(os.path.join(log_dir, f"{0:020d}.json"))
    _wipe_own_log(base)
    assert import_delta_log(base) == 1
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected


def test_sync_auto_checkpoint_interval(spark, sf_dir, tmp_path):
    from datalake_scripts_spark.operators.delta_interop import sync_delta_log

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    for i in range(3):
        V.write_versioned(
            spark, _orders(spark, sf_dir, 500 + 100 * i, 600 + 100 * i),
            base, mode="append",
        )
    sync_delta_log(base, checkpoint_interval=4)
    log_dir = os.path.join(base, "_delta_log")
    assert os.path.exists(os.path.join(log_dir, f"{3:020d}.checkpoint.parquet"))
    # another small commit: below the interval -> no new checkpoint
    V.write_versioned(spark, _orders(spark, sf_dir, 900, 950), base, mode="append")
    sync_delta_log(base, checkpoint_interval=4)
    cps = [n for n in os.listdir(log_dir) if n.endswith(".checkpoint.parquet")]
    assert cps == [f"{3:020d}.checkpoint.parquet"]


def test_checkpoint_column_mapped_table(spark, sf_dir, tmp_path):
    """Checkpoint metaData preserves columnMapping configuration, so a
    truncated mapped table adopts with renames intact."""
    from datalake_scripts_spark.operators.delta_interop import (
        write_delta_checkpoint,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 800), base, mode="append")
    V.rename_column(base, "o_orderkey", "order_id")
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)
    write_delta_checkpoint(base)
    for dv in range(2):
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    _wipe_own_log(base)
    assert import_delta_log(base) == 1
    df = V.read_versioned(spark, base)
    assert df.columns[0] == "order_id"
    assert sorted(map(tuple, df.collect())) == expected
    # mapping state (max cid) carried through the checkpoint
    m = V._load_manifest(base, 1)
    assert m.get("max_column_id", 0) >= 4


def test_cli_delta_sync_and_checkpoint(spark, sf_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 500, 900), base, mode="append")
    assert main(["table", "--dir", base, "delta-sync"]) == 0
    assert "synced 2" in capsys.readouterr().out
    assert main(["table", "--dir", base, "delta-checkpoint"]) == 0
    out = capsys.readouterr().out
    assert "checkpoint written" in out
    log_dir = os.path.join(base, "_delta_log")
    assert os.path.exists(os.path.join(log_dir, "_last_checkpoint"))
    # incremental: another commit, sync picks up exactly one; only 1
    # commit since the checkpoint at Delta 1 -> below the interval
    V.write_versioned(spark, _orders(spark, sf_dir, 900, 950), base, mode="append")
    assert main(["table", "--dir", base, "delta-sync",
                 "--checkpoint-interval", "3"]) == 0
    assert "synced 1" in capsys.readouterr().out
    assert not os.path.exists(
        os.path.join(log_dir, f"{2:020d}.checkpoint.parquet")
    )
    # two more commits -> 3 since the last checkpoint -> cadence fires
    V.write_versioned(spark, _orders(spark, sf_dir, 950, 980), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 980, 990), base, mode="append")
    assert main(["table", "--dir", base, "delta-sync",
                 "--checkpoint-interval", "3"]) == 0
    assert os.path.exists(
        os.path.join(log_dir, f"{4:020d}.checkpoint.parquet")
    )


def test_export_delta_snapshot_for_dvd_table(spark, sf_dir, tmp_path):
    """export_delta_snapshot stays the base-protocol route for DV'd
    histories (r9: export_delta_log now exports them natively as
    protocol 3/7 with inline descriptors — consumers lacking the
    deletionVectors feature still want the materialized snapshot)."""
    from datalake_scripts_spark.operators.delta_interop import (
        export_delta_snapshot,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.delete_versioned(
        spark, base, "o_orderpriority = '1-URGENT'", deletion_vectors=True
    )
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    out = str(tmp_path / "snap")
    log_dir = export_delta_snapshot(spark, base, out)
    # deleted rows are REALLY gone from the exported files (no DV
    # descriptor needed by any reader)
    a0 = _commit_actions(log_dir, 0)
    assert not any(a.get("add", {}).get("deletionVector") for a in a0)
    assert sorted(os.listdir(log_dir)) == [f"{0:020d}.json"]
    _wipe_own_log(out)
    import_delta_log(out)
    got = sorted(map(tuple, V.read_versioned(spark, out).collect()))
    assert got == expected


def test_multipart_checkpoint_import(spark, sf_dir, tmp_path):
    """A multi-part classic checkpoint (what real Delta writers emit
    for large tables) imports: simulate a foreign writer by splitting
    our single-part checkpoint into 2 row-sliced parquet parts."""
    import pyarrow.parquet as pq
    from datalake_scripts_spark.operators.delta_interop import (
        write_delta_checkpoint,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    log_dir = export_delta_log(base)
    cp = write_delta_checkpoint(base)  # at Delta version 1
    tbl = pq.read_table(cp)
    half = max(1, tbl.num_rows // 2)
    pq.write_table(
        tbl.slice(0, half),
        os.path.join(log_dir, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet"),
    )
    pq.write_table(
        tbl.slice(half),
        os.path.join(log_dir, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"),
    )
    os.remove(cp)
    json.dump(
        {"version": 1, "size": tbl.num_rows, "parts": 2},
        open(os.path.join(log_dir, "_last_checkpoint"), "w"),
    )
    for dv in range(2):
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    _wipe_own_log(base)
    assert import_delta_log(base) == 1
    assert sorted(map(tuple, V.read_versioned(spark, base).collect())) == expected
    # an INCOMPLETE part family refuses rather than silently dropping rows
    os.remove(os.path.join(
        log_dir, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    ))
    _wipe_own_log(base)
    with pytest.raises(ValueError, match="incomplete"):
        import_delta_log(base)


def test_cli_delta_snapshot(spark, sf_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 600), base, mode="append")
    V.delete_versioned(spark, base, "o_orderkey < 50", deletion_vectors=True)
    dst = str(tmp_path / "snap")
    assert main([
        "table", "--dir", base, "--master", "local[4]",
        "delta-snapshot", "--to", dst,
    ]) == 0
    assert "snapshot exported" in capsys.readouterr().out
    want = V.read_versioned(spark, base).count()
    assert V.read_versioned(spark, dst).count() == want
    assert os.path.isdir(os.path.join(dst, "_delta_log"))


def test_import_tolerates_commitinfo_only_commits(spark, sf_dir, tmp_path):
    """Real Delta logs contain empty commits (commitInfo only — e.g.
    OPTIMIZE no-ops, VACUUM audit entries): import replays them as
    empty snapshots instead of failing."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 400), base, mode="append")
    log_dir = export_delta_log(base)
    with open(os.path.join(log_dir, f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"commitInfo": {"operation": "VACUUM"}}) + "\n")
    expected = V.read_versioned(spark, base).count()
    _wipe_own_log(base)
    assert import_delta_log(base) == 2
    assert V.read_versioned(spark, base).count() == expected
    assert V.read_versioned(spark, base, version=1).count() == expected


def test_cli_delta_clean(spark, sf_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main
    from datalake_scripts_spark.operators.delta_reader import DeltaLog

    base = str(tmp_path / "tbl")
    for lo in (0, 300, 600, 900):
        V.write_versioned(
            spark, _orders(spark, sf_dir, lo, lo + 300), base, mode="append"
        )
    assert main(["table", "--dir", base, "delta-sync"]) == 0
    capsys.readouterr()
    before = DeltaLog(base).to_rows()
    assert main(["table", "--dir", base, "delta-clean",
                 "--keep-last", "2"]) == 0
    assert "removed 2 JSON commit(s)" in capsys.readouterr().out
    assert DeltaLog(base).to_rows() == before
