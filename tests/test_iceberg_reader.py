"""Round-trip proof for the Iceberg exporter (VERDICT r9 ask #1):
every shape iceberg_interop exports must read back row-equal through
the INDEPENDENT reader in operators/iceberg_reader.py — its own Avro
container decoder, its own manifest walk, no shared code — so an
avro_min encoding bug or a manifest-shape guess becomes a failing
test instead of round-tripping invisibly through export -> import."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.iceberg_interop import (
    export_iceberg_metadata,
    sync_iceberg_metadata,
)
from datalake_scripts_spark.operators.iceberg_reader import (
    IcebergReadError,
    IcebergTable,
    read_avro_file,
)


def _orders(spark, sf_dir, lo, hi):
    from datalake_scripts_spark.io import read_table

    return (
        read_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


def _spark_rows(spark, base, version=None):
    return sorted(
        map(tuple, V.read_versioned(spark, base, version=version).collect())
    )


def test_avro_decoder_against_independent_writer(tmp_path):
    """The reader's from-scratch Avro decoder decodes containers
    written by avro_min across the full type subset Iceberg needs —
    THE cross-implementation check that proves the shared-codec
    encoding is real Avro, not a self-consistent dialect."""
    from datalake_scripts_spark.functions.avro_min import write_container

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "int"},
            {"name": "l", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "f", "type": "float"},
            {"name": "b", "type": "boolean"},
            {"name": "u", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
            {"name": "m", "type": {"type": "map", "values": "string"}},
            {
                "name": "nested",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "string"}],
                },
            },
        ],
    }
    records = [
        {
            "s": "héllo", "i": -3, "l": 2**40, "d": 1.5, "f": 2.0,
            "b": True, "u": None, "arr": [1, -2, 3],
            "m": {"k": "v"}, "nested": {"x": "y"},
        },
        {
            "s": "", "i": 0, "l": -(2**40), "d": -0.25, "f": 0.0,
            "b": False, "u": 7, "arr": [], "m": {},
            "nested": {"x": ""},
        },
    ]
    p = str(tmp_path / "t.avro")
    write_container(p, schema, records)
    got = read_avro_file(p)
    assert len(got) == 2
    for want, have in zip(records, got):
        for k, v in want.items():
            if k == "f":
                assert abs(have[k] - v) < 1e-6
            else:
                assert have[k] == v, k


def test_avro_decoder_deflate_and_multiblock(tmp_path):
    """Real Iceberg writers deflate-compress and write many blocks;
    the decoder handles both even though avro_min never writes them
    (hand-built container per the Avro spec)."""
    import io
    import struct
    import zlib

    schema = {
        "type": "record",
        "name": "r",
        "fields": [{"name": "v", "type": "long"}],
    }

    def zz(n):
        n = (n << 1) ^ (n >> 63)
        out = b""
        n &= (1 << 64) - 1
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out += bytes([b | 0x80])
            else:
                return out + bytes([b])

    def s(b):
        return zz(len(b)) + b

    sync = bytes(range(16))
    hdr = io.BytesIO()
    hdr.write(b"Obj\x01")
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": b"deflate",
    }
    hdr.write(zz(len(meta)))
    for k, v in meta.items():
        hdr.write(s(k.encode()) + s(v))
    hdr.write(zz(0))
    hdr.write(sync)
    for block_vals in ([1, 2, 3], [4, 5]):
        raw = b"".join(zz(v) for v in block_vals)
        comp = zlib.compress(raw)[2:-4]  # raw DEFLATE, no zlib wrapper
        hdr.write(zz(len(block_vals)) + zz(len(comp)) + comp + sync)
    p = str(tmp_path / "d.avro")
    open(p, "wb").write(hdr.getvalue())
    assert [r["v"] for r in read_avro_file(p)] == [1, 2, 3, 4, 5]
    assert struct is not None


def test_roundtrip_multi_commit_history(spark, sf_dir, tmp_path):
    """append, append, DELETE, OPTIMIZE — every snapshot reads back
    row-equal through the independent reader (time-travel parity:
    manifest v == sequence-number v)."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 2000, 4000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    V.compact_versioned(spark, base, target_files=1)
    export_iceberg_metadata(base)
    t = IcebergTable(base)
    assert t.sequence_numbers() == [1, 2, 3, 4]
    for v in (1, 2, 3, 4):
        assert t.to_rows(v) == _spark_rows(spark, base, version=v), (
            f"mismatch at sequence-number {v}"
        )
    assert t.to_rows() == _spark_rows(spark, base)


def test_roundtrip_partitioned_table(spark, sf_dir, tmp_path):
    """Identity string partition: values restored from the manifest
    partition record, not the data file."""
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 3000), base, mode="append",
        partition_by=["o_orderpriority"],
    )
    export_iceberg_metadata(base)
    assert IcebergTable(base).to_rows() == _spark_rows(spark, base)


def test_roundtrip_timestamp_partition(spark, sf_dir, tmp_path):
    """Identity timestamp partition: the manifest carries spec'd
    micros; the reader restores the logical timestamp column."""
    base = str(tmp_path / "ts")
    df = spark.range(6).selectExpr(
        "id AS k",
        "CAST(date_add(DATE '2024-01-01', CAST(id % 2 AS INT)) "
        "AS TIMESTAMP_NTZ) AS ts",
    )
    V.write_versioned(spark, df, base, mode="append", partition_by=["ts"])
    export_iceberg_metadata(base)
    assert IcebergTable(base).to_rows() == _spark_rows(spark, base)


def test_roundtrip_synced_mirror(spark, sf_dir, tmp_path):
    """sync_iceberg_metadata's incremental snapshots read back equal,
    including after the source vacuumed pre-sync manifests."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1000), base, mode="append")
    export_iceberg_metadata(base)
    V.write_versioned(spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderkey < 500")
    sync_iceberg_metadata(base)
    t = IcebergTable(base)
    for v in (1, 2, 3):
        assert t.to_rows(v) == _spark_rows(spark, base, version=v), (
            f"mismatch at sequence-number {v}"
        )


def test_reader_refuses_unknown_shapes(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 500), base, mode="append")
    meta_dir = export_iceberg_metadata(base)
    p = os.path.join(meta_dir, "v1.metadata.json")
    m = json.load(open(p))
    # format-version != 2
    m2 = dict(m, **{"format-version": 1})
    json.dump(m2, open(p, "w"))
    with pytest.raises(IcebergReadError, match="format-version"):
        IcebergTable(base)
    # a transform this reader does not implement (truncate/date
    # transforms are implemented since r10, so use void)
    m3 = json.loads(json.dumps(m))
    m3["partition-specs"] = [{
        "spec-id": 0,
        "fields": [{
            "name": "b", "transform": "void",
            "source-id": 1, "field-id": 1000,
        }],
    }]
    json.dump(m3, open(p, "w"))
    # force the spec to be consulted: patch every manifest-list entry's
    # partition_spec_id is already 0, so snapshot() must refuse
    with pytest.raises(IcebergReadError, match="transform"):
        IcebergTable(base).snapshot().to_arrow()


def test_roundtrip_renamed_column_via_name_mapping(spark, sf_dir, tmp_path):
    """Column-mapped tables: our parquet files carry PHYSICAL names
    and no Iceberg field-ids, so the export emits
    ``schema.name-mapping.default`` (spec: Column Projection) and the
    reader resolves the renamed logical column through it — without
    the property the tree would be unreadable to any foreign reader."""
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, spark.range(5).selectExpr("id AS k", "id*2 AS v"),
        base, mode="append",
    )
    V.enable_column_mapping(base)
    V.rename_column(base, "v", "doubled")
    meta_dir = export_iceberg_metadata(base)
    m = json.load(open(os.path.join(
        meta_dir, f"v{V.current_version(base)}.metadata.json")))
    nm = json.loads(m["properties"]["schema.name-mapping.default"])
    assert any("v" in e["names"] and "doubled" in e["names"] for e in nm)
    assert IcebergTable(base).to_rows() == _spark_rows(spark, base)


def test_roundtrip_dv_history_as_position_deletes(spark, sf_dir, tmp_path):
    """VERDICT r9 ask #2: a merge-on-read (deletion-vector) history
    exports as v2 position-delete files + a content=1 delete manifest,
    and every snapshot reads back row-equal through the independent
    reader — including the stacked-DV state and the post-OPTIMIZE
    state where the deletes disappear."""
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 2000).coalesce(1), base,
        mode="append",
    )
    V.delete_versioned(spark, base, "o_orderkey < 100", deletion_vectors=True)
    V.delete_versioned(
        spark, base, "o_orderkey >= 100 AND o_orderkey < 150",
        deletion_vectors=True,
    )
    export_iceberg_metadata(base)
    t = IcebergTable(base)
    for v in (1, 2, 3):
        assert t.to_rows(v) == _spark_rows(spark, base, version=v), (
            f"mismatch at sequence-number {v}"
        )
    snap = t.snapshot()
    assert snap.delete_entries, "snapshot must carry delete files"
    # file-scoped: one delete parquet per DV'd data file, reserved ids
    import pyarrow.parquet as pq

    d = snap.delete_entries[0]["data_file"]
    sch = pq.read_schema(d["file_path"])
    assert sch.field("file_path").metadata[b"PARQUET:field_id"] == b"2147483546"
    assert sch.field("pos").metadata[b"PARQUET:field_id"] == b"2147483545"
    # materialize away: the next sync drops the delete manifest
    V.compact_versioned(spark, base, target_files=1)
    sync_iceberg_metadata(base)
    t2 = IcebergTable(base)
    assert not t2.snapshot().delete_entries
    assert t2.to_rows() == _spark_rows(spark, base)


def test_dv_export_unchanged_state_reuses_delete_manifest(spark, sf_dir, tmp_path):
    """An append after a DV commit keeps the SAME delete manifest by
    reference (no rewrite), and the appended files — with data seq >
    the delete seq — are not affected by it."""
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000).coalesce(1), base,
        mode="append",
    )
    V.delete_versioned(spark, base, "o_orderkey < 100", deletion_vectors=True)
    export_iceberg_metadata(base)
    t = IcebergTable(base)
    dm2 = t.snapshot(2).delete_entries[0]
    V.write_versioned(
        spark, _orders(spark, sf_dir, 1000, 2000).coalesce(1), base,
        mode="append",
    )
    sync_iceberg_metadata(base)
    t3 = IcebergTable(base)
    dm3 = t3.snapshot(3).delete_entries[0]
    # reused by reference: the manifest-list entry names the same file
    assert os.path.basename(
        dm3["data_file"]["file_path"]
    ) == os.path.basename(dm2["data_file"]["file_path"])
    assert t3.to_rows(3) == _spark_rows(spark, base, version=3)


def test_dvd_export_adopts_back_as_native_dvs(spark, sf_dir, tmp_path):
    """Import closes the circle: position-delete files adopt back as
    native deletion vectors, every version row-equal, and further
    merge-on-read DML stacks on top."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 2000).coalesce(1), base,
        mode="append",
    )
    V.delete_versioned(spark, base, "o_orderkey < 100", deletion_vectors=True)
    V.delete_versioned(
        spark, base, "o_orderkey >= 100 AND o_orderkey < 150",
        deletion_vectors=True,
    )
    per_version = {
        v: _spark_rows(spark, base, version=v) for v in (1, 2, 3)
    }
    export_iceberg_metadata(base)
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)
    assert import_iceberg_metadata(base) == 3
    for v, want in per_version.items():
        assert _spark_rows(spark, base, version=v) == want, (
            f"mismatch at adopted version {v}"
        )
    assert V._load_manifest(base, 3).get("dvs"), (
        "adopted manifest must carry native DVs"
    )
    _, n = V.delete_versioned(
        spark, base, "o_orderkey >= 150 AND o_orderkey < 160",
        deletion_vectors=True,
    )
    assert V.read_versioned(spark, base).filter(
        "o_orderkey < 160"
    ).count() == 0


def test_roundtrip_nested_types(spark, sf_dir, tmp_path):
    """VERDICT r9 ask #7: struct (incl. nested struct), array, and map
    columns export with unique per-member field-ids (spec: every
    struct field, list element, map key/value), read back value-equal
    through the independent reader, and adopt back into a working
    nested Spark schema."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(8).selectExpr(
        "id AS k",
        "named_struct('a', id * 2, 'b', CAST(id AS STRING), "
        "'inner', named_struct('c', id + 1)) AS st",
        "array(id, id + 1, id + 2) AS arr",
        "map(CAST(id AS STRING), id * 10) AS m",
    )
    V.write_versioned(spark, df, base, mode="append")
    meta_dir = export_iceberg_metadata(base)
    sch = json.load(
        open(os.path.join(meta_dir, "v1.metadata.json"))
    )["schemas"][0]
    ids = []

    def walk(t):
        if not isinstance(t, dict):
            return
        if t["type"] == "struct":
            for f in t["fields"]:
                ids.append(f["id"])
                walk(f["type"])
        elif t["type"] == "list":
            ids.append(t["element-id"])
            walk(t["element"])
        elif t["type"] == "map":
            ids.append(t["key-id"])
            walk(t["key"])
            ids.append(t["value-id"])
            walk(t["value"])

    walk(sch)
    assert len(ids) == len(set(ids)) and len(ids) == 11
    # value parity (normalize: Spark Row -> dict, arrow map -> dict)
    got = {
        r[0]: (dict(r[1], inner=dict(r[2])), list(r[3]), dict(r[4]))
        for r in (
            (row[0], row[1], row[1]["inner"], row[2], row[3])
            for row in IcebergTable(base).to_rows()
        )
    }
    for row in V.read_versioned(spark, base).collect():
        st = row.st.asDict()
        st["inner"] = row.st.inner.asDict()
        assert got[row.k] == (st, list(row.arr), dict(row.m)), row.k
    # adopt back: nested schema reconstructs and reads
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 1
    adopted = V.read_versioned(spark, base)
    assert adopted.count() == 8
    assert adopted.selectExpr("st.inner.c").filter("`c` = 3").count() == 1
    assert {f.name for f in adopted.schema.fields} == {"k", "st", "arr", "m"}


# ------------------------------------------------- equality deletes


from datalake_scripts_spark.operators.iceberg_foreign import (
    append_equality_delete_snapshot as _append_eq_delete_snapshot,
)


def test_equality_deletes_read_and_adopt(spark, sf_dir, tmp_path):
    """Global equality delete (the Flink-CDC write path): the
    independent reader drops exactly the matching keys, time travel
    below the delete still sees them, and import materializes the
    deletes into native DVs — the adopted table matches the reader."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 200), base, mode="append"
    )
    export_iceberg_metadata(base)
    ice_schema = json.load(
        open(os.path.join(base, "metadata", "v1.metadata.json"))
    )["schemas"][0]
    key_fid = next(
        f["id"] for f in ice_schema["fields"] if f["name"] == "o_orderkey"
    )
    victims = sorted(
        r["o_orderkey"]
        for r in V.read_versioned(spark, base).limit(7).collect()
    )
    v = _append_eq_delete_snapshot(
        base, {"o_orderkey": victims}, [key_fid]
    )
    t = IcebergTable(base)
    rows = t.snapshot().to_rows()
    keys = {r[0] for r in rows}
    assert not keys & set(victims)
    before = t.snapshot(sequence_number=v - 1).to_rows()
    assert {r[0] for r in before} >= set(victims)
    assert len(before) == len(rows) + len(victims)
    # adopt: eq deletes -> native DVs
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 2
    native = _spark_rows(spark, base)
    assert sorted(rows) == native
    # time travel below the delete still has the victims
    v1 = _spark_rows(spark, base, version=1)
    assert len(v1) == len(native) + len(victims)


def test_equality_delete_same_sequence_insert_survives(
    spark, sf_dir, tmp_path
):
    """The strict-sequence rule: a data file added in the SAME
    snapshot as the equality delete is NOT affected — the CDC upsert
    (delete key + re-insert row in one commit) keeps the insert."""
    import shutil

    import pyarrow as pa

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 120), base, mode="append"
    )
    export_iceberg_metadata(base)
    ice_schema = json.load(
        open(os.path.join(base, "metadata", "v1.metadata.json"))
    )["schemas"][0]
    key_fid = next(
        f["id"] for f in ice_schema["fields"] if f["name"] == "o_orderkey"
    )
    victim = V.read_versioned(spark, base).limit(1).collect()[0]
    k = victim["o_orderkey"]
    replacement = pa.table(
        {
            "o_orderkey": pa.array([k], type=pa.int64()),
            "o_custkey": pa.array([victim["o_custkey"]], type=pa.int64()),
            "o_totalprice": pa.array([999.5], type=pa.float64()),
            "o_orderpriority": pa.array(["9-UPSERTED"], type=pa.string()),
        }
    )
    _append_eq_delete_snapshot(
        base, {"o_orderkey": [k]}, [key_fid], add_data=replacement
    )
    rows = IcebergTable(base).snapshot().to_rows()
    mine = [r for r in rows if r[0] == k]
    assert mine == [(k, victim["o_custkey"], 999.5, "9-UPSERTED")]
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    import_iceberg_metadata(base)
    native = [r for r in _spark_rows(spark, base) if r[0] == k]
    assert native == mine


def test_equality_delete_partition_scoped(spark, sf_dir, tmp_path):
    """A delete stored with the table's partitioned spec applies only
    to its own partition: the same key value in another partition
    survives, in both the independent reader and the adopted table."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(40).selectExpr(
        "id AS k",
        "CAST(id % 2 AS STRING) AS bucket_col",
        "id * 10 AS val",
    )
    V.write_versioned(
        spark, df, base, mode="append", partition_by=["bucket_col"]
    )
    export_iceberg_metadata(base)
    ice_schema = json.load(
        open(os.path.join(base, "metadata", "v1.metadata.json"))
    )["schemas"][0]
    key_fid = next(
        f["id"] for f in ice_schema["fields"] if f["name"] == "k"
    )
    # delete k in {4, 6} but ONLY in partition bucket_col='0'
    _append_eq_delete_snapshot(
        base, {"k": [4, 6, 5]}, [key_fid], partition={"bucket_col": "0"}
    )
    rows = IcebergTable(base).snapshot().to_rows()
    keys = {r[0] for r in rows}
    assert 4 not in keys and 6 not in keys
    assert 5 in keys  # k=5 lives in partition '1': out of scope
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    import_iceberg_metadata(base)
    native_keys = {r[0] for r in _spark_rows(spark, base)}
    assert native_keys == keys


def test_decimal_identity_partition_roundtrip(spark, sf_dir, tmp_path):
    """Decimal identity partitions export as the spec'd fixed-bytes
    Avro partition values (minimal big-endian two's-complement
    unscaled), read back as exact Decimals through the independent
    reader, and adopt (r10: lifts the last partition-type refusal)."""
    import shutil
    from decimal import Decimal

    from datalake_scripts_spark.functions.avro_min import read_container
    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(20).selectExpr(
        "id AS k",
        "CAST(CASE WHEN id % 2 = 0 THEN '12.50' ELSE '-3.07' END "
        "AS DECIMAL(9,2)) AS price_band",
        "id * 2 AS val",
    )
    V.write_versioned(
        spark, df, base, mode="append", partition_by=["price_band"]
    )
    export_iceberg_metadata(base)
    # manifest partition record: fixed bytes of the spec'd size
    meta = json.load(
        open(os.path.join(base, "metadata", "v1.metadata.json"))
    )
    snap = meta["snapshots"][0]
    _, _, ml = read_container(snap["manifest-list"])
    _, _, entries = read_container(ml[0]["manifest_path"])
    raw = entries[0]["data_file"]["partition"]["price_band"]
    assert isinstance(raw, bytes) and len(raw) == 4  # decimal(9) -> 4B
    assert int.from_bytes(raw, "big", signed=True) in (1250, -307)
    rows = IcebergTable(base).snapshot().to_rows()
    assert len(rows) == 20
    bands = {r[1] for r in rows}
    assert bands == {Decimal("12.50"), Decimal("-3.07")}
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 1
    got = {
        (r["k"], str(r["price_band"]), r["val"])
        for r in V.read_versioned(spark, base).collect()
    }
    assert got == {
        (r[0], str(r[1]), r[2]) for r in rows
    }


# ------------------------------------------------- exported bounds


def test_exported_bounds_enable_foreign_pruning_and_adopt(
    spark, sf_dir, tmp_path
):
    """r10: manifests export spec'd per-column bounds
    (null_value_counts 110 / lower_bounds 125 / upper_bounds 128,
    Appendix-D single-value bytes) so FOREIGN readers can data-skip
    the mirror; the independent reader prunes on them with its own
    deserializer, pruning never drops a row (ground-truth scan), and
    adoption turns the bounds back into native stats so skip_filter
    works on the adopted table without touching a parquet footer."""
    import shutil
    import struct

    import pyarrow.parquet as pq

    from datalake_scripts_spark.functions.avro_min import read_container
    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )
    from datalake_scripts_spark.operators.versioned import files_for_read

    base = str(tmp_path / "tbl")
    # three appends with DISJOINT key ranges -> three prunable files
    for lo in (0, 500, 1000):
        V.write_versioned(
            spark,
            _orders(spark, sf_dir, lo, lo + 500).coalesce(1),
            base,
            mode="append",
        )
    export_iceberg_metadata(base)
    snap = IcebergTable(base).snapshot()
    # raw bytes: o_orderkey (field id 1, long) little-endian per spec
    entry = min(
        snap.data_entries, key=lambda e: e["data_file"]["file_path"]
    )
    lows = sorted(
        struct.unpack("<q", kv["value"])[0]
        for e in snap.data_entries
        for kv in e["data_file"]["lower_bounds"] or []
        if kv["key"] == 1
    )
    assert lows == [0, 500, 1000]
    # pruning parity: "=" admits exactly the file holding the key;
    # ground truth by scanning the pruned-OUT files
    probe = 750
    admitted = snap.prune_files("o_orderkey", "=", probe)
    assert len(admitted) == 1
    all_files = sorted(
        e["data_file"]["file_path"] for e in snap.data_entries
    )
    for f in set(all_files) - set(admitted):
        t = pq.read_table(f, columns=["o_orderkey"])
        assert probe not in set(t.column("o_orderkey").to_pylist())
    t = pq.read_table(admitted[0], columns=["o_orderkey"])
    assert probe in set(t.column("o_orderkey").to_pylist())
    # string bounds prune too
    adm = snap.prune_files("o_orderpriority", ">=", "1-URGENT")
    assert adm == all_files  # every file holds urgent orders
    # range ops
    assert len(snap.prune_files("o_orderkey", "<", 500)) == 1
    assert len(snap.prune_files("o_orderkey", ">=", 1000)) == 1
    # adopt: bounds become native stats; skip_filter prunes files
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 3
    flt = [("o_orderkey", ">=", 1000)]
    kept = files_for_read(base, skip_filter=flt)
    assert len(kept) == 1
    got = V.read_versioned(spark, base, skip_filter=flt)
    want = V.read_versioned(spark, base).filter("o_orderkey >= 1000")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_eq_delete_adoption_prunes_scans_by_bounds(
    spark, sf_dir, tmp_path, monkeypatch
):
    """r10: equality-delete adoption uses the exported manifest bounds
    to SKIP data files the delete keys' range can't touch — counted
    via a read_table probe. Three disjoint-range files, a delete whose
    keys live entirely in one: exactly 1 data-file scan (+1 for the
    delete parquet itself), and the result equals the unpruned path."""
    import shutil

    import pyarrow.parquet as pq

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    for lo in (0, 500, 1000):
        V.write_versioned(
            spark,
            _orders(spark, sf_dir, lo, lo + 500).coalesce(1),
            base,
            mode="append",
        )
    export_iceberg_metadata(base)
    ice_schema = json.load(
        open(os.path.join(base, "metadata", "v1.metadata.json"))
    )["schemas"][0]
    key_fid = next(
        f["id"] for f in ice_schema["fields"] if f["name"] == "o_orderkey"
    )
    victims = [700, 711, 742]  # all inside the [500, 1000) file
    _append_eq_delete_snapshot(base, {"o_orderkey": victims}, [key_fid])
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))

    calls = []
    real = pq.read_table

    def counting(path, *a, **k):
        calls.append(str(path))
        return real(path, *a, **k)

    monkeypatch.setattr(pq, "read_table", counting)
    import_iceberg_metadata(base)
    monkeypatch.undo()
    data_scans = [c for c in calls if "/data/" in c]
    assert len(data_scans) == 1, data_scans  # only the covered file
    keys = {
        r["o_orderkey"] for r in V.read_versioned(spark, base).collect()
    }
    assert not keys & set(victims)
    assert len(keys) == 1500 - len(victims)


def test_schema_evolution_roundtrip_and_sync(spark, sf_dir, tmp_path):
    """r10: evolved histories export one schemas[] entry per distinct
    schema, snapshots record THEIR schema-id, old data files null-fill
    later-added optional columns (spec column projection), time travel
    reads each snapshot with its own schema, adoption preserves the
    per-version schema, and incremental sync carries the schema
    registry forward."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, spark.range(5).selectExpr("id AS k", "id*2 AS a"),
        base, mode="append",
    )
    export_iceberg_metadata(base)  # mirror at schema v1
    V.write_versioned(
        spark,
        spark.range(5, 10).selectExpr("id AS k", "id*2 AS a", "id*3 AS b"),
        base, mode="append", merge_schema=True,
    )
    # INCREMENTAL sync across the evolution
    assert sync_iceberg_metadata(base) == 1
    meta = json.load(
        open(os.path.join(base, "metadata", "v2.metadata.json"))
    )
    assert len(meta["schemas"]) == 2
    sids = {s["sequence-number"]: s["schema-id"] for s in meta["snapshots"]}
    assert sids[1] != sids[2]
    assert meta["current-schema-id"] == sids[2]
    t = IcebergTable(base)
    # snapshot 1 reads with ITS schema (2 columns)
    assert t.snapshot(sequence_number=1).to_rows() == [
        (i, 2 * i) for i in range(5)
    ]
    # head: 3 columns, old files null-fill b
    head = t.snapshot().to_rows()
    assert head[0] == (0, 0, None) and head[-1] == (9, 18, 27)
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 2
    assert sorted(
        map(tuple, V.read_versioned(spark, base, version=1).collect())
    ) == [(i, 2 * i) for i in range(5)]
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == head


def test_partition_spec_evolution_mixed_layout_roundtrip(
    spark, sf_dir, tmp_path
):
    """r10: layout evolution exports one partition-specs[] entry per
    distinct spec; every manifest entry carries partition values under
    the spec its FILE's hive layout was written with (rewrites and DV
    delete manifests group per layout), so the independent reader
    restores identity values for old-layout files while new flat files
    read theirs physically. Previously the old-layout column came back
    null through the circle. Covers: evolve partitioned -> flat, a COW
    delete across mixed layouts, a DV delete across mixed layouts,
    incremental sync, and adoption of the whole history."""
    import shutil

    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    df1 = spark.range(6).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS p", "id*2 AS val"
    )
    V.write_versioned(spark, df1, base, mode="append", partition_by=["p"])
    export_iceberg_metadata(base)  # mirror at the partitioned spec
    df2 = spark.range(6, 12).selectExpr(
        "id AS k", "CAST(id % 2 AS STRING) AS p", "id*2 AS val"
    )
    V.write_versioned(
        spark, df2, base, mode="append",
        partition_by=[], evolve_partitioning=True,
    )
    V.delete_versioned(spark, base, "k IN (1, 7)")  # COW, mixed layouts
    V.delete_versioned(
        spark, base, "k IN (2, 8)", deletion_vectors=True
    )  # MOR, mixed layouts
    assert sync_iceberg_metadata(base) == 3  # registry survives sync
    meta = json.load(
        open(os.path.join(base, "metadata", "v4.metadata.json"))
    )
    assert len(meta["partition-specs"]) == 2
    t = IcebergTable(base)
    for seq in t.sequence_numbers():
        got = t.snapshot(sequence_number=seq).to_rows()
        want = sorted(
            map(
                tuple,
                V.read_versioned(spark, base, version=seq).collect(),
            )
        )
        assert got == want, f"mismatch at sequence {seq}"
    head = t.snapshot().to_rows()
    assert {r[0] for r in head} == set(range(12)) - {1, 7, 2, 8}
    assert all(r[1] in ("0", "1") for r in head)  # p restored, not null
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 4
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert got == head


def test_truncate_and_date_transforms_roundtrip(spark, sf_dir, tmp_path):
    """r10: hidden truncate[W] and month/day/year/hour layouts export
    as Iceberg's OWN transforms (value-identical semantics; the hive
    path forms already match Iceberg's human-readable convention) with
    the spec'd int partition values, read back row-equal through the
    independent reader, and adopt back into native hidden specs that
    keep pruning."""
    import shutil

    from datalake_scripts_spark.functions.avro_min import read_container
    from datalake_scripts_spark.operators.iceberg_interop import (
        import_iceberg_metadata,
    )

    base = str(tmp_path / "tbl")
    df = spark.range(40).selectExpr(
        "id AS k",
        "date_add(DATE'2024-01-01', CAST(id * 7 AS INT)) AS d",
        "CONCAT('user_', CAST(id % 5 AS STRING), '_tail') AS name",
        "id * 10 AS val",
    )
    V.write_versioned(
        spark, df, base, mode="append",
        partition_by=[
            {"transform": "months", "col": "d"},
            {"transform": "truncate", "col": "name", "n": 6},
        ],
    )
    native = _spark_rows(spark, base)
    meta_dir = export_iceberg_metadata(base)
    meta = json.load(open(os.path.join(meta_dir, "v1.metadata.json")))
    spec = meta["partition-specs"][0]["fields"]
    assert {f["transform"] for f in spec} == {"month", "truncate[6]"}
    # manifest partition values: spec'd int month offsets + prefixes
    snap = meta["snapshots"][0]
    _, _, ml = read_container(snap["manifest-list"])
    _, _, entries = read_container(ml[0]["manifest_path"])
    parts = [e["data_file"]["partition"] for e in entries]
    month_field = next(f["name"] for f in spec if f["transform"] == "month")
    trunc_field = next(
        f["name"] for f in spec if f["transform"] == "truncate[6]"
    )
    months = {p[month_field] for p in parts}
    # 2024-01 is (2024-1970)*12 + 0 = 648 months from epoch
    assert min(months) == 648
    assert all(isinstance(m, int) for m in months)
    assert {p[trunc_field] for p in parts} == {"user_0", "user_1",
                                               "user_2", "user_3",
                                               "user_4"}
    # independent reader: row-equal (source cols are IN the files)
    assert IcebergTable(base).snapshot().to_rows() == native
    # adopt: hidden spec reconstructs with native transform names
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    assert import_iceberg_metadata(base) == 1
    assert _spark_rows(spark, base) == native
    m1 = V._load_manifest(base, 1)
    tr = {e["transform"] for e in m1["partition_spec"] if isinstance(e, dict)}
    assert tr == {"months", "truncate"}
    # the adopted table keeps writing under the same hidden layout
    more = spark.range(40, 50).selectExpr(
        "id AS k",
        "date_add(DATE'2024-01-01', CAST(id * 7 AS INT)) AS d",
        "CONCAT('user_', CAST(id % 5 AS STRING), '_tail') AS name",
        "id * 10 AS val",
    )
    V.write_versioned(spark, more, base, mode="append")
    assert V.read_versioned(spark, base).count() == 50
