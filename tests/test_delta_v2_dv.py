"""Round 11 (VERDICT r10 ask #4): the two real-world Delta shapes the
mirror circle previously refused — V2 (UUID-named, sidecar) checkpoints
and on-disk ('u'/'p') deletion-vector descriptors — now read through
the INDEPENDENT reader and adopt through import_delta_log.

On-disk DV fixtures are written per PROTOCOL.md "Deletion Vector File
Storage Format" (1-byte format version, then per-DV <dataSize int32
BE><RoaringBitmapArray bytes><CRC-32 int32 BE>) by converting an
inline-DV export — so the bitmap payload is the exporter's and the
parsers under test are the readers'.
"""

from __future__ import annotations

import json
import os
import shutil
import struct
import uuid
import zlib

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.delta_interop import (
    _z85_decode,
    _z85_encode,
    export_delta_log,
    import_delta_log,
    write_delta_checkpoint,
)
from datalake_scripts_spark.operators.delta_reader import (
    DeltaLog,
    DeltaReadError,
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


def _drop_manifests(base):
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)


def _write_dv_bin(table_dir: str, blobs: list[bytes], prefix: str = ""):
    """One spec-shaped DV .bin file holding ``blobs`` in order ->
    (pathOrInlineDv for storageType 'u', absolute file path,
    [offset per blob])."""
    u = uuid.uuid4()
    enc = prefix + _z85_encode(u.bytes)
    d = os.path.join(table_dir, prefix) if prefix else table_dir
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"deletion_vector_{u}.bin")
    buf = bytearray(b"\x01")
    offsets = []
    for b in blobs:
        offsets.append(len(buf))
        buf += struct.pack(">i", len(b))
        buf += b
        buf += struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF)
    with open(path, "wb") as fh:
        fh.write(bytes(buf))
    return enc, path, offsets


def _inline_to_ondisk(base: str, storage_type: str, prefix: str = ""):
    """Rewrite every inline DV descriptor in the exported log into an
    on-disk one ('u' or 'p'), all blobs sharing one .bin file — the
    shape delta-spark itself writes."""
    log_dir = os.path.join(base, "_delta_log")
    commits = sorted(
        n for n in os.listdir(log_dir)
        if n.endswith(".json") and n[:20].isdigit()
    )
    # collect inline payloads in a stable order
    found = []  # (commit, line_idx, key, payload_bytes)
    lines_by_commit = {}
    for c in commits:
        lines = [
            json.loads(x)
            for x in open(os.path.join(log_dir, c)).read().splitlines()
            if x.strip()
        ]
        lines_by_commit[c] = lines
        for i, a in enumerate(lines):
            for key in ("add", "remove"):
                dv = a.get(key, {}).get("deletionVector")
                if dv and dv.get("storageType") == "i":
                    raw = _z85_decode(dv["pathOrInlineDv"])[
                        : dv["sizeInBytes"]
                    ]
                    found.append((c, i, key, raw))
    assert found, "fixture expects at least one inline DV"
    blobs, seen = [], {}
    for *_k, raw in found:
        if raw not in seen:
            seen[raw] = len(blobs)
            blobs.append(raw)
    enc, path, offsets = _write_dv_bin(base, blobs, prefix)
    for c, i, key, raw in found:
        dv = lines_by_commit[c][i][key]["deletionVector"]
        dv["storageType"] = storage_type
        dv["pathOrInlineDv"] = path if storage_type == "p" else enc
        dv["offset"] = offsets[seen[raw]]
    for c, lines in lines_by_commit.items():
        with open(os.path.join(log_dir, c), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    return path


@pytest.fixture()
def dv_table(spark, sf_dir, tmp_path):
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
    export_delta_log(base)
    return base


@pytest.mark.parametrize("prefix", ["", "ab"])
def test_reader_reads_ondisk_u_dv(spark, dv_table, prefix):
    """storageType 'u' (prefix + z85 uuid -> deletion_vector_<uuid>.bin)
    reads through the independent reader: deleted rows masked out."""
    want = _spark_rows(spark, dv_table)
    _inline_to_ondisk(dv_table, "u", prefix)
    log = DeltaLog(dv_table)
    d = next(
        a["deletionVector"]
        for a in log.snapshot().adds.values()
        if a.get("deletionVector")
    )
    assert d["storageType"] == "u"
    assert log.to_rows() == want


def test_reader_reads_ondisk_p_dv(spark, dv_table):
    want = _spark_rows(spark, dv_table)
    _inline_to_ondisk(dv_table, "p")
    assert DeltaLog(dv_table).to_rows() == want


def test_import_adopts_ondisk_dv(spark, dv_table):
    """The r10 gap closed: a genuine delta-spark-shaped table (on-disk
    'u' DVs) re-adopts — descriptors resolve, verify, and materialize
    into native DV parquets; rows match at every version."""
    per_version = {
        v: _spark_rows(spark, dv_table, version=v) for v in (1, 2, 3)
    }
    _inline_to_ondisk(dv_table, "u", "ab")
    _drop_manifests(dv_table)
    assert import_delta_log(dv_table) == 3
    for v, want in per_version.items():
        assert _spark_rows(spark, dv_table, version=v) == want, v
    assert V._load_manifest(dv_table, 3).get("dvs")


def test_corrupt_ondisk_dv_refuses(spark, dv_table):
    path = _inline_to_ondisk(dv_table, "u")
    data = bytearray(open(path, "rb").read())
    data[-1] ^= 0xFF  # flip a CRC byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(DeltaReadError, match="checksum"):
        DeltaLog(dv_table).to_arrow()
    _drop_manifests(dv_table)
    with pytest.raises(ValueError, match="checksum"):
        import_delta_log(dv_table)


def test_v2_checkpoint_roundtrip(spark, sf_dir, tmp_path):
    """V2 (UUID-named + sidecar) checkpoint: the v2Checkpoint protocol
    upgrade is COMMITTED to the log (ADVICE r11 — log-replay readers
    and checkpoint-bootstrap readers must see the same protocol), the
    checkpoint covers the upgrade commit, the reader bootstraps from
    it after log-cleaning, and import_delta_log adopts."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 2000, 3000), base, mode="append")
    V.delete_versioned(spark, base, "o_orderkey < 50")
    log_dir = export_delta_log(base)
    # historical version on a non-advertising table: refused (the
    # upgrade commit can only land at the head)
    with pytest.raises(ValueError, match="v2Checkpoint"):
        write_delta_checkpoint(base, version=1, v2=True)
    cp_path = write_delta_checkpoint(base, v2=True)
    assert os.path.basename(cp_path).count(".") == 3  # UUID-named
    assert os.path.isdir(os.path.join(log_dir, "_sidecars"))
    # the upgrade landed as commit 3 and the checkpoint covers it
    assert os.path.basename(cp_path).startswith(f"{3:020d}.")
    up = [json.loads(x)
          for x in open(os.path.join(log_dir, f"{3:020d}.json"))
          .read().splitlines() if x.strip()]
    proto = next(a["protocol"] for a in up if "protocol" in a)
    assert "v2Checkpoint" in proto["readerFeatures"]
    # an advertising table gets NO second upgrade commit
    write_delta_checkpoint(base, v2=True)
    assert not os.path.exists(os.path.join(log_dir, f"{4:020d}.json"))
    for dv in range(4):
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    log = DeltaLog(base)
    snap = log.snapshot()
    assert "v2Checkpoint" in (snap.protocol.get("readerFeatures") or [])
    assert log.to_rows() == _spark_rows(spark, base)
    assert log.to_rows(3) == _spark_rows(spark, base)
    # adoption bootstraps from the v2 checkpoint
    want = _spark_rows(spark, base)
    _drop_manifests(base)
    v = import_delta_log(base)
    assert _spark_rows(spark, base, version=v) == want


def test_v2_json_manifest_reads(spark, sf_dir, tmp_path):
    """A v2 checkpoint whose top-level manifest is ndjson (the spec
    allows .json) reads identically: same sidecar, same state."""
    base = str(tmp_path / "tbl")
    V.write_versioned(spark, _orders(spark, sf_dir, 0, 1500), base, mode="append")
    V.write_versioned(spark, _orders(spark, sf_dir, 1500, 2000), base, mode="append")
    log_dir = export_delta_log(base)
    # head checkpoint: the protocol upgrade commits at 2, cp covers it
    cp_path = write_delta_checkpoint(base, v2=True)
    want = DeltaLog(base).to_rows(2)
    snap = DeltaLog(base).snapshot(2)
    sc_name = os.listdir(os.path.join(log_dir, "_sidecars"))[0]
    rows = [
        {"checkpointMetadata": {"version": 2}},
        {"protocol": snap.protocol},
        {"metaData": snap.metadata},
        {"sidecar": {
            "path": sc_name,
            "sizeInBytes": os.path.getsize(
                os.path.join(log_dir, "_sidecars", sc_name)
            ),
        }},
    ]
    os.remove(cp_path)
    json_cp = os.path.join(
        log_dir, f"{2:020d}.checkpoint.{uuid.uuid4()}.json"
    )
    with open(json_cp, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows) + "\n")
    for dv in range(3):
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    assert DeltaLog(base).to_rows() == want
    _drop_manifests(base)
    v = import_delta_log(base)
    assert sorted(map(tuple, V.read_versioned(spark, base, version=v)
                      .collect())) == want


def _reencode_with_runs(raw: bytes) -> bytes:
    """Re-serialize an exporter (no-run) RoaringBitmapArray payload
    through the INDEPENDENT run-capable encoder in
    tests/test_roaring_runs.py — producing the cookie-12347 byte
    stream delta-spark may write, from a different implementation than
    the parsers under test (ADVICE r11, medium)."""
    from datalake_scripts_spark.operators.delta_interop import (
        _deserialize_positions,
    )
    from tests.test_roaring_runs import rb32_runs, rbarray

    positions = _deserialize_positions(raw)
    by_hi: dict[int, dict[int, list[int]]] = {}
    for p in positions:
        by_hi.setdefault(p >> 32, {}).setdefault(
            (p >> 16) & 0xFFFF, []
        ).append(p & 0xFFFF)
    n_bitmaps = max(by_hi) + 1 if by_hi else 0
    bitmaps = []
    for hi in range(n_bitmaps):
        containers = []
        for key, lows in sorted(by_hi.get(hi, {}).items()):
            runs, s, prev = [], None, None
            for x in sorted(lows):
                if s is None:
                    s = prev = x
                elif x == prev + 1:
                    prev = x
                else:
                    runs.append((s, prev - s + 1))
                    s = prev = x
            runs.append((s, prev - s + 1))
            containers.append((key, "run", runs))
        bitmaps.append(rb32_runs(containers))
    return rbarray(bitmaps)


def test_reader_reads_run_serialized_ondisk_dv(spark, dv_table):
    """End-to-end: on-disk 'u' DVs whose payload uses RUN containers
    (cookie 12347) — the encoding the exporter never writes — read
    through DeltaLog with identical rows."""
    from datalake_scripts_spark.operators.delta_interop import (
        _dv_file_path,
    )

    want = _spark_rows(spark, dv_table)
    _inline_to_ondisk(dv_table, "u")
    log_dir = os.path.join(dv_table, "_delta_log")

    def _ondisk_blob(dv):
        path = _dv_file_path(dv_table, dv)
        with open(path, "rb") as fh:
            buf = fh.read()
        (size,) = struct.unpack_from(">i", buf, dv["offset"])
        return buf[dv["offset"] + 4: dv["offset"] + 4 + size]

    # re-encode every referenced blob with run containers, then patch
    # all descriptors to point into one fresh .bin
    commits = sorted(
        c for c in os.listdir(log_dir)
        if c.endswith(".json") and c[:20].isdigit()
    )
    lines_by_commit = {
        c: [json.loads(x)
            for x in open(os.path.join(log_dir, c)).read().splitlines()
            if x.strip()]
        for c in commits
    }
    dv_refs = [
        a[key]["deletionVector"]
        for lines in lines_by_commit.values()
        for a in lines
        for key in ("add", "remove")
        if a.get(key, {}).get("deletionVector", {}).get("storageType") == "u"
    ]
    assert dv_refs
    blobs, order = [], {}
    rr_of = []
    for dv in dv_refs:
        rr = _reencode_with_runs(_ondisk_blob(dv))
        rr_of.append(rr)
        if rr not in order:
            order[rr] = len(blobs)
            blobs.append(rr)
    enc, _path, offsets = _write_dv_bin(dv_table, blobs, prefix="rr")
    for dv, rr in zip(dv_refs, rr_of):
        dv["pathOrInlineDv"] = enc
        dv["offset"] = offsets[order[rr]]
        dv["sizeInBytes"] = len(rr)
    for c, lines in lines_by_commit.items():
        with open(os.path.join(log_dir, c), "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in lines) + "\n")
    assert DeltaLog(dv_table).to_rows() == want
