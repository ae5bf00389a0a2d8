"""Iceberg v2 metadata interop (operators/iceberg_interop.py, VERDICT
r8 ask #5): hand-parsed protocol shape (field-ids, Avro container
layout, manifest reuse), full-history adoption round-trip, and the
same honest refusals the Delta exporter has."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.functions.avro_min import (
    read_container,
    write_container,
)
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.iceberg_interop import (
    export_iceberg_metadata,
    import_iceberg_metadata,
)


def _orders(spark, sf_dir, lo, hi):
    from datalake_scripts_spark.io import read_table

    return (
        read_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


def _wipe_own_log(base):
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)


def test_avro_codec_roundtrip(tmp_path):
    """The minimal Avro container codec round-trips the type subset
    Iceberg manifests use (plus arrays/maps for header shapes)."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "i", "type": "int"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "o", "type": ["null", "long"], "default": None},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {"name": "rec", "type": {
                "type": "record", "name": "inner",
                "fields": [{"name": "x", "type": "long"}],
            }},
        ],
    }
    rows = [
        {"s": "héllo", "n": -(2**40), "i": -1, "d": 1.5, "b": True,
         "o": None, "arr": [1, 2, 3], "m": {"a": "b"}, "rec": {"x": 7}},
        {"s": "", "n": 0, "i": 2**31 - 1, "d": -0.0, "b": False,
         "o": 42, "arr": [], "m": {}, "rec": {"x": -7}},
    ]
    p = str(tmp_path / "t.avro")
    write_container(p, schema, rows, metadata={"k": "v"})
    got_schema, meta, got = read_container(p)
    assert got == rows
    assert got_schema == schema and meta["k"] == "v"


def test_export_protocol_shape(spark, sf_dir, tmp_path):
    """Hand-parse the exported tree against the public v2 spec:
    metadata json keys, schema field-ids, manifest-list field-ids
    500-517, manifest Avro header keys, and append-manifest REUSE."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    meta_dir = export_iceberg_metadata(base)
    assert open(os.path.join(meta_dir, "version-hint.text")).read() == "2"
    m = json.load(open(os.path.join(meta_dir, "v2.metadata.json")))
    for key in (
        "format-version", "table-uuid", "last-sequence-number",
        "last-column-id", "schemas", "partition-specs", "sort-orders",
        "current-snapshot-id", "snapshots", "snapshot-log",
    ):
        assert key in m, key
    assert m["format-version"] == 2
    fields = m["schemas"][0]["fields"]
    assert [f["id"] for f in fields] == [1, 2, 3, 4]
    assert fields[0] == {
        "id": 1, "name": "o_orderkey", "required": False, "type": "long"
    }
    assert len(m["snapshots"]) == 2
    s1, s2 = sorted(m["snapshots"], key=lambda s: s["sequence-number"])
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    # manifest list: field-ids per spec, one manifest per append,
    # the first manifest REUSED by reference in the second snapshot
    ml_schema, ml_meta, l2 = read_container(s2["manifest-list"])
    ids = {f["field-id"] for f in ml_schema["fields"]}
    assert {500, 501, 502, 503, 504, 512, 515, 516, 517} <= ids
    assert len(l2) == 2
    _, _, l1 = read_container(s1["manifest-list"])
    assert len(l1) == 1
    assert l1[0]["manifest_path"] == l2[0]["manifest_path"]
    assert l2[1]["sequence_number"] == 2
    # manifest file: header keys + entry shape
    e_schema, e_meta, entries = read_container(l2[1]["manifest_path"])
    assert e_meta["format-version"] == "2" and e_meta["content"] == "data"
    assert json.loads(e_meta["schema"])["fields"][0]["id"] == 1
    assert all(e["status"] == 1 for e in entries)
    df = entries[0]["data_file"]
    assert df["file_format"] == "PARQUET" and df["content"] == 0
    assert os.path.isabs(df["file_path"]) and df["record_count"] > 0
    assert df["file_size_in_bytes"] == os.path.getsize(df["file_path"])
    # row counts in the list roll up the entries
    assert l2[1]["added_rows_count"] == sum(
        e["data_file"]["record_count"] for e in entries
    )


def test_adoption_roundtrip_with_rewrite(spark, sf_dir, tmp_path):
    """append, append, DELETE (a rewrite commit) -> export -> destroy
    native manifests -> adopt: every version reads back row-equal and
    the rewrite manifest carries EXISTING status for carried files."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 2000, 4000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    per_version = {
        v: sorted(map(tuple, V.read_versioned(spark, base, version=v).collect()))
        for v in (1, 2, 3)
    }
    meta_dir = export_iceberg_metadata(base)
    # the delete snapshot's fresh manifest: carried files EXISTING(0),
    # rewritten files ADDED(1), origin snapshot ids preserved
    m = json.load(open(os.path.join(meta_dir, "v3.metadata.json")))
    s3 = max(m["snapshots"], key=lambda s: s["sequence-number"])
    assert s3["summary"]["operation"] == "delete"
    _, _, l3 = read_container(s3["manifest-list"])
    assert len(l3) == 1
    _, _, entries = read_container(l3[0]["manifest_path"])
    statuses = {e["status"] for e in entries}
    assert statuses == {0, 1}
    assert all(
        e["sequence_number"] < 3 for e in entries if e["status"] == 0
    )
    _wipe_own_log(base)
    n = import_iceberg_metadata(base)
    assert n == 3
    for v, want in per_version.items():
        got = sorted(
            map(tuple, V.read_versioned(spark, base, version=v).collect())
        )
        assert got == want, f"mismatch at adopted version {v}"
    # adopted table accepts further commits
    V.write_versioned(spark, _orders(spark, sf_dir, 4000, 4100), base, mode="append")
    assert V.current_version(base) == 4


def test_adoption_partitioned_table(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 3000), base, mode="append",
        partition_by=["o_orderpriority"],
    )
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    meta_dir = export_iceberg_metadata(base)
    m = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    spec = m["partition-specs"][0]["fields"]
    assert spec == [{
        "name": "o_orderpriority", "transform": "identity",
        "source-id": 4, "field-id": 1000,
    }]
    snap = m["snapshots"][0]
    _, _, ml = read_container(snap["manifest-list"])
    _, mmeta, entries = read_container(ml[0]["manifest_path"])
    parts = {e["data_file"]["partition"]["o_orderpriority"] for e in entries}
    assert len(parts) >= 2 and None not in parts
    _wipe_own_log(base)
    import_iceberg_metadata(base)
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == expected
    mf = V._load_manifest(base, 1)
    assert V._manifest_partition_spec(mf) == ["o_orderpriority"]


def test_export_refusals(spark, sf_dir, tmp_path):
    # short/byte would silently widen
    base3 = str(tmp_path / "short")
    V.write_versioned(
        spark,
        spark.range(5).selectExpr("CAST(id AS SHORT) AS k"),
        base3, mode="append",
    )
    with pytest.raises(ValueError, match="no exact Iceberg"):
        export_iceberg_metadata(base3)


def test_import_refuses_foreign_features(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    meta_dir = export_iceberg_metadata(base)
    # a transform the importer does not implement (truncate/date
    # transforms adopt since r10, so use void)
    p = os.path.join(meta_dir, "v1.metadata.json")
    m = json.load(open(p))
    m["partition-specs"] = [{
        "spec-id": 0,
        "fields": [{
            "name": "k_void", "transform": "void",
            "source-id": 1, "field-id": 1000,
        }],
    }]
    json.dump(m, open(p, "w"))
    _wipe_own_log(base)
    with pytest.raises(ValueError, match="not adoptable"):
        import_iceberg_metadata(base)


def test_cli_iceberg_export_import(spark, sf_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    expected = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert main(["table", "--dir", base, "iceberg-export"]) == 0
    assert "metadata" in capsys.readouterr().out
    _wipe_own_log(base)
    assert main(["table", "--dir", base, "iceberg-import"]) == 0
    assert "adopted 1 Iceberg snapshot" in capsys.readouterr().out
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == expected


def test_sync_iceberg_incremental_and_after_vacuum(spark, sf_dir, tmp_path):
    """sync_iceberg_metadata writes only the new snapshots, reuses the
    table uuid / snapshot ids / manifests from the MIRROR's own state
    (so source manifests older than the mirror may be vacuumed), and
    the synced mirror adopts back with full history."""
    import time as _time

    from datalake_scripts_spark.operators.iceberg_interop import (
        sync_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    meta_dir = export_iceberg_metadata(base)
    m1 = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    uuid0 = m1["table-uuid"]
    # no change -> no-op
    assert sync_iceberg_metadata(base) == 0
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    _time.sleep(0.002)  # snapshot ids are clock-derived per run
    assert sync_iceberg_metadata(base) == 1
    m2 = json.load(open(os.path.join(meta_dir, "v2.metadata.json")))
    assert m2["table-uuid"] == uuid0
    assert len(m2["snapshots"]) == 2
    s1, s2 = sorted(m2["snapshots"], key=lambda s: s["sequence-number"])
    assert s2["parent-snapshot-id"] == s1["snapshot-id"]
    # the append REUSED the prior manifest by reference
    _, _, l1 = read_container(s1["manifest-list"])
    _, _, l2 = read_container(s2["manifest-list"])
    assert l2[0]["manifest_path"] == l1[0]["manifest_path"]
    # vacuum everything already synced; a rewrite commit still syncs
    V.vacuum(base, keep_last=1)
    V.delete_versioned(spark, base, "o_orderkey < 100")
    _time.sleep(0.002)
    assert sync_iceberg_metadata(base) == 1
    assert open(os.path.join(meta_dir, "version-hint.text")).read() == "3"
    expected = {
        v: sorted(map(tuple, V.read_versioned(spark, base, version=v).collect()))
        for v in (3,)
    }
    _wipe_own_log(base)
    assert import_iceberg_metadata(base) == 3
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == expected[3]
    # pre-delete history adopted too (manifest files survive in the
    # mirror even though the SOURCE manifests were vacuumed)
    assert V.read_versioned(spark, base, version=2).count() > len(got)


def test_timestamp_identity_partition_exports_micros(spark, sf_dir, tmp_path):
    """ADVICE r9 (low): identity partitioning on a timestamp column
    must write spec'd micros-since-epoch into the manifest partition
    record (Avro long), not the raw hive string."""
    base = str(tmp_path / "ts")
    df = spark.range(6).selectExpr(
        "id AS k",
        "timestamp(date_add(DATE '2024-01-01', CAST(id % 2 AS INT))) AS ts",
    )
    V.write_versioned(spark, df, base, mode="append", partition_by=["ts"])
    meta_dir = export_iceberg_metadata(base)
    m = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    snap = m["snapshots"][0]
    _, _, ml = read_container(snap["manifest-list"])
    _, _, entries = read_container(ml[0]["manifest_path"])
    micros = {e["data_file"]["partition"]["ts"] for e in entries}
    day = 86_400_000_000
    assert micros == {
        19723 * day // 1, (19723 + 1) * day
    } or all(isinstance(v, int) and v % day == 0 for v in micros)
    # round-trips: epoch days 2024-01-01 = 19723
    assert min(micros) == 19723 * day


def test_decimal_identity_partition_exports(spark, sf_dir, tmp_path):
    """r10: the former decimal-partition refusal is lifted — the
    exporter emits the spec'd fixed-bytes values (full circle proven
    in tests/test_iceberg_reader.py::
    test_decimal_identity_partition_roundtrip); here just assert the
    export completes and adopts."""
    base = str(tmp_path / "dec")
    df = spark.range(4).selectExpr(
        "id AS k", "CAST(id AS DECIMAL(10,2)) AS d"
    )
    V.write_versioned(spark, df, base, mode="append", partition_by=["d"])
    export_iceberg_metadata(base)
    _wipe_own_log(base)
    assert import_iceberg_metadata(base) == 1
    assert V.read_versioned(spark, base).count() == 4


# --------------------------------------------- snapshot expiration


def test_expire_snapshots_prunes_history_and_files(spark, sf_dir, tmp_path):
    """expire keeps the newest keep_last snapshots, physically removes
    mirror files only THEY referenced (shared manifests survive —
    liveness is computed), the current snapshot still reads row-equal
    through the independent reader, and expired time travel fails
    loudly."""
    from datalake_scripts_spark.operators.iceberg_interop import (
        expire_iceberg_snapshots,
    )
    from datalake_scripts_spark.operators.iceberg_reader import (
        IcebergReadError,
        IcebergTable,
    )

    base = str(tmp_path / "tbl")
    for lo in (0, 400, 800, 1200):
        V.write_versioned(
            spark, _orders(spark, sf_dir, lo, lo + 400), base, mode="append"
        )
    export_iceberg_metadata(base)
    meta_dir = os.path.join(base, "metadata")
    before_rows = IcebergTable(base).snapshot().to_rows()
    n_files_before = len(os.listdir(meta_dir))
    res = expire_iceberg_snapshots(base, keep_last=2)
    assert res["expired"] == 2 and res["removed_files"] > 0
    assert len(os.listdir(meta_dir)) < n_files_before
    t = IcebergTable(base)
    assert t.sequence_numbers() == [3, 4]
    assert t.snapshot().to_rows() == before_rows
    assert t.snapshot(sequence_number=3).to_rows()  # kept seq readable
    with pytest.raises(IcebergReadError):
        t.snapshot(sequence_number=1)
    # idempotent: nothing more to expire
    assert expire_iceberg_snapshots(base, keep_last=2)["expired"] == 0


def test_expire_then_sync_and_adopt(spark, sf_dir, tmp_path):
    """Incremental sync keeps working after expiration (hint/sequence
    convention untouched), and an expired mirror ADOPTS: snapshots are
    self-contained, so the surviving history imports row-equal."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        expire_iceberg_snapshots,
        import_iceberg_metadata,
        sync_iceberg_metadata,
    )
    from datalake_scripts_spark.operators.iceberg_reader import IcebergTable

    base = str(tmp_path / "tbl")
    for lo in (0, 300, 600):
        V.write_versioned(
            spark, _orders(spark, sf_dir, lo, lo + 300), base, mode="append"
        )
    export_iceberg_metadata(base)
    expire_iceberg_snapshots(base, keep_last=1)
    # table advances; sync writes only the new snapshot
    V.write_versioned(
        spark, _orders(spark, sf_dir, 900, 1200), base, mode="append"
    )
    assert sync_iceberg_metadata(base) == 1
    t = IcebergTable(base)
    assert t.sequence_numbers() == [3, 4]
    rows = t.snapshot().to_rows()
    assert rows == _spark_rows_interop(spark, base)
    # adopt the expired mirror into a fresh chain
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 2
    assert _spark_rows_interop(spark, base) == rows


def _spark_rows_interop(spark, base, version=None):
    return sorted(
        map(tuple, V.read_versioned(spark, base, version=version).collect())
    )


def test_cli_iceberg_expire(spark, sf_dir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main
    from datalake_scripts_spark.operators.iceberg_reader import IcebergTable

    base = str(tmp_path / "tbl")
    for lo in (0, 300, 600):
        V.write_versioned(
            spark, _orders(spark, sf_dir, lo, lo + 300), base, mode="append"
        )
    assert main(["table", "--dir", base, "iceberg-export"]) == 0
    capsys.readouterr()
    before = IcebergTable(base).snapshot().to_rows()
    assert main(["table", "--dir", base, "iceberg-expire",
                 "--keep-last", "1"]) == 0
    assert "expired 2 snapshot(s)" in capsys.readouterr().out
    t = IcebergTable(base)
    assert t.sequence_numbers() == [3]
    assert t.snapshot().to_rows() == before
