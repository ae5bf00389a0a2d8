"""Apache Iceberg v2 metadata interop (VERDICT r8 ask #5): export a
versioned table's history as Iceberg table metadata — JSON metadata
files + Avro manifest lists + Avro manifests (the structure the
chunked-manifest layer already mirrors) — and adopt (import) such a
metadata tree back into the versioned manifest chain, sharing data
files in place. :func:`sync_iceberg_metadata` keeps a mirror current
incrementally (only new snapshots written; diff state reconstructed
from the MIRROR's own current snapshot, so source manifests older
than the mirror may be vacuumed — the same posture as
``sync_delta_log``). Both directions are METADATA-ONLY: O(commits +
file entries), never O(data).

Layout written (HadoopTables / filesystem-catalog convention from the
public Iceberg table spec, iceberg.apache.org/spec):

    <table>/metadata/v<N>.metadata.json     one per exported snapshot
    <table>/metadata/version-hint.text      latest N
    <table>/metadata/snap-<id>-1-<uuid>.avro   manifest lists
    <table>/metadata/<uuid>-m0.avro            manifest files

Shape per the v2 spec:
- manifest LIST entries carry field-ids 500-517 (path, length,
  spec-id, content, sequence numbers, snapshot id, file/row counts);
- manifest entries carry status/snapshot_id/sequence numbers and an
  (id 2) ``data_file`` record: content, file_path, file_format,
  partition record (field-ids 1000+), record_count, file size;
- table metadata: format-version 2, schemas with field-ids,
  identity partition-specs, snapshots with sequence numbers,
  snapshot-log; schema field-ids reuse the column-mapping ``cid``
  when the table has one (so Iceberg ids and our mapping ids agree).

Cost/shape notes: an append snapshot ADDS one manifest and reuses
every prior one by reference (the incremental path — exactly how the
versioned layer's chunked manifests work); a non-append commit
(DELETE/UPDATE/MERGE/OPTIMIZE) rewrites ONE fresh manifest holding
the snapshot's live files with status EXISTING for carried files —
O(live file entries), still metadata-only.

Deletion vectors export natively (VERDICT r9 ask #2): each DV'd data
file becomes one FILE-SCOPED v2 position-delete parquet (spec'd
file_path/pos schema, reserved field-ids 2147483546/2147483545) and
the snapshot carries one content=1 delete manifest expressing the
full current DV state; adoption maps position deletes back onto
native deletion vectors, honoring the sequence-number rule (deletes
apply to data files with data seq <= delete seq).

Nested struct/array/map columns export with spec'd per-member
field-ids (top-level ids reuse column-mapping cids; nested member
ids are allocated depth-first after them) and adopt back into nested
Spark schemas (VERDICT r9 ask #7). Hidden ``bucket_hash='murmur3'``
layouts export as true ``bucket[N]`` specs (ask #3); hidden truncate
and days/months/years/hours layouts export as Iceberg's own
``truncate[W]``/``day``/``month``/``year``/``hour`` (value-identical
semantics, spec'd int epoch-offset partition values) and adopt back.
Evolved histories export one schemas[]/partition-specs[] entry per
distinct schema/spec; snapshots record their schema-id; rewrites and
delete manifests group entries per layout spec. Per-column
lower/upper bounds (Appendix-D single-value binary) ride every data
entry so foreign readers can data-skip the mirror; import adopts
them back into native manifest stats.

Equality deletes (content=2, the Flink-CDC write path) are adoptable:
at import each delete file's key set is materialized into per-file
row positions under the spec's rules (STRICTLY older data files only,
null matches null, partition scope honored) and becomes native
deletion vectors — cost paid once at adoption, never on reads.

Honest refusals (same posture as the Delta exporter): xxhash64
bucket specs and non-bucket transforms (a translated spec would make
foreign readers prune wrong) and short/byte columns (Iceberg has no
16/8-bit ints; a silent widen would change the adopted schema).
Decimal identity partition values encode as the spec'd fixed-bytes
Avro representation (minimal big-endian two's-complement unscaled).

Avro is written/read by functions/avro_min.py — the image has no
avro Python package and no spark-avro DataSource module.
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid

from ..functions.avro_min import read_container, write_container
from .versioned import (
    _commit_manifest,
    _expand_manifest,
    _load_manifest,
    current_version,
)

_SPARK_TO_ICEBERG = {
    "long": "long",
    "integer": "int",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp",
    "binary": "binary",
}
_ICEBERG_TO_SPARK = {
    "long": "long",
    "int": "integer",
    "string": "string",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "date": "date",
    "timestamptz": "timestamp",
    "timestamp": "timestamp_ntz",
    "binary": "binary",
}


def _ice_primitive(name: str, t: str) -> str:
    if t.startswith("decimal"):
        return t
    if t in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[t]
    raise ValueError(
        f"column {name!r} type {t!r} has no exact Iceberg "
        "equivalent (short/byte would silently widen) — cast "
        "before export"
    )


def _ice_nested(name: str, t, alloc) -> dict | str:
    """Spark type JSON (possibly nested) -> Iceberg type, allocating
    field-ids for nested members via ``alloc`` (spec: every struct
    field, list element, and map key/value carries a unique id)."""
    if isinstance(t, str):
        return _ice_primitive(name, t)
    tt = t["type"]
    if tt == "struct":
        out = []
        for f in t["fields"]:
            fid = alloc()
            out.append(
                {
                    "id": fid,
                    "name": f["name"],
                    "required": not f.get("nullable", True),
                    "type": _ice_nested(
                        f"{name}.{f['name']}", f["type"], alloc
                    ),
                }
            )
        return {"type": "struct", "fields": out}
    if tt == "array":
        eid = alloc()
        return {
            "type": "list",
            "element-id": eid,
            "element": _ice_nested(
                f"{name}.element", t["elementType"], alloc
            ),
            "element-required": not t.get("containsNull", True),
        }
    if tt == "map":
        kid = alloc()
        key = _ice_nested(f"{name}.key", t["keyType"], alloc)
        vid = alloc()
        return {
            "type": "map",
            "key-id": kid,
            "key": key,
            "value-id": vid,
            "value": _ice_nested(f"{name}.value", t["valueType"], alloc),
            "value-required": not t.get("valueContainsNull", True),
        }
    raise ValueError(f"column {name!r}: Spark type {tt!r} not exportable")


def _iceberg_schema(schema_json: dict) -> tuple[dict, dict[str, int]]:
    """Spark StructType JSON -> (Iceberg schema JSON, name->field-id).
    Top-level field ids reuse column-mapping ``cid`` metadata when
    present (so Iceberg ids and our mapping ids agree); nested
    struct/list/map member ids (VERDICT r9 ask #7) are allocated
    depth-first AFTER every top-level id — deterministic for a given
    schema, so re-exports and incremental syncs reproduce them."""
    fields, ids = [], {}
    next_id = 1 + max(
        (
            int((f.get("metadata") or {}).get("cid", 0))
            for f in schema_json["fields"]
        ),
        default=0,
    )
    # first pass: pin every TOP-LEVEL id (cid or sequential)
    top_ids = []
    for f in schema_json["fields"]:
        cid = (f.get("metadata") or {}).get("cid")
        fid = int(cid) if cid is not None else next_id
        if cid is None:
            next_id += 1
        top_ids.append(fid)
    nested_next = max(top_ids, default=0) + 1

    def alloc() -> int:
        nonlocal nested_next
        nested_next += 1
        return nested_next - 1

    for f, fid in zip(schema_json["fields"], top_ids):
        ids[f["name"]] = fid
        fields.append(
            {
                "id": fid,
                "name": f["name"],
                "required": not f.get("nullable", True),
                "type": _ice_nested(f["name"], f["type"], alloc),
            }
        )
    return {"type": "struct", "schema-id": 0, "fields": fields}, ids


def _name_mapping_property(schema_json: dict) -> str | None:
    """``schema.name-mapping.default`` JSON for column-mapped tables:
    our parquet files carry PHYSICAL column names and no Iceberg
    field-ids, so a renamed column is unresolvable to a foreign reader
    without the spec's name mapping (field-id -> candidate names).
    Emitted only when some physical name differs from the logical."""
    from .versioned import _field_physical

    entries = []
    diverged = False
    for f in schema_json["fields"]:
        phys = _field_physical(f)
        cid = (f.get("metadata") or {}).get("cid")
        if cid is None:
            continue
        names = [phys] if phys == f["name"] else [phys, f["name"]]
        diverged = diverged or phys != f["name"]
        entries.append({"field-id": int(cid), "names": names})
    return json.dumps(entries) if diverged else None


def _spark_type(t) -> dict | str:
    """Iceberg type (possibly nested) -> Spark type JSON."""
    if isinstance(t, str):
        if t.startswith("decimal"):
            return t
        if t in _ICEBERG_TO_SPARK:
            return _ICEBERG_TO_SPARK[t]
        raise ValueError(
            f"Iceberg type {t!r} is not adoptable by this importer"
        )
    tt = t["type"]
    if tt == "struct":
        return {
            "type": "struct",
            "fields": [
                {
                    "name": f["name"],
                    "type": _spark_type(f["type"]),
                    "nullable": not f.get("required", False),
                    "metadata": {},
                }
                for f in t["fields"]
            ],
        }
    if tt == "list":
        return {
            "type": "array",
            "elementType": _spark_type(t["element"]),
            "containsNull": not t.get("element-required", False),
        }
    if tt == "map":
        return {
            "type": "map",
            "keyType": _spark_type(t["key"]),
            "valueType": _spark_type(t["value"]),
            "valueContainsNull": not t.get("value-required", False),
        }
    raise ValueError(f"Iceberg type {tt!r} is not adoptable")


def _spark_schema(ice_schema: dict) -> dict:
    return {
        "type": "struct",
        "fields": [
            {
                "name": f["name"],
                "type": _spark_type(f["type"]),
                "nullable": not f.get("required", False),
                "metadata": {},
            }
            for f in ice_schema["fields"]
        ],
    }


def _avro_primitive(ice_type: str) -> str:
    """Avro physical type of an Iceberg primitive (spec Appendix A:
    date -> int days, timestamps -> long micros)."""
    return {
        "int": "int",
        "long": "long",
        "date": "int",
        "timestamp": "long",
        "timestamptz": "long",
        "string": "string",
        "double": "double",
        "float": "float",
        "boolean": "boolean",
    }.get(ice_type, "string")


_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_files_count", "type": "int", "field-id": 504},
        {"name": "existing_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


def _single_value_ser(ice_type: str, v) -> bytes | None:
    """Iceberg single-value binary serialization (table-spec Appendix
    D) for manifest lower/upper bounds. Returns None for values this
    exporter cannot faithfully encode (the maps are optional and may
    be partial per spec — a missing bound only costs pruning)."""
    import struct as _struct

    if v is None or not isinstance(ice_type, str):
        return None
    try:
        if ice_type == "int":
            return _struct.pack("<i", int(v))
        if ice_type == "long":
            return _struct.pack("<q", int(v))
        if ice_type == "float":
            return _struct.pack("<f", float(v))
        if ice_type == "double":
            return _struct.pack("<d", float(v))
        if ice_type == "boolean":
            return b"\x01" if v else b"\x00"
        if ice_type == "string":
            return str(v).encode("utf-8")
        if ice_type == "date":
            import datetime as _dt

            d = _dt.date.fromisoformat(str(v)[:10])
            return _struct.pack(
                "<i", (d - _dt.date(1970, 1, 1)).days
            )
        if ice_type in ("timestamp", "timestamptz"):
            import datetime as _dt

            dt = _dt.datetime.fromisoformat(str(v).replace(" ", "T"))
            if dt.tzinfo is not None:
                dt = dt.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            micros = (
                dt - _dt.datetime(1970, 1, 1)
            ) // _dt.timedelta(microseconds=1)
            return _struct.pack("<q", micros)
        # decimal bounds deliberately NOT exported: native stats hold
        # them as floats (_json_safe), and a float-narrowed bound
        # would make a foreign reader prune a file that contains the
        # true extreme — absent bounds only cost pruning, never rows
    except (ValueError, OverflowError, ArithmeticError):
        return None
    return None


def _stats_maps(
    cols: dict, ids: dict[str, int], ice_types: dict[str, str]
) -> dict:
    """Native per-file column stats -> the manifest's optional spec
    maps (Avro array-of-kv, logicalType map — Avro map keys must be
    strings, so int-keyed spec maps use the array encoding, exactly
    like Java Iceberg): null_value_counts (110), lower_bounds (125),
    upper_bounds (128). Partial by design: a column whose value can't
    be faithfully encoded is simply absent."""
    nulls, lower, upper = [], [], []
    for name, st in sorted(cols.items()):
        fid = ids.get(name)
        t = ice_types.get(name)
        if fid is None or not isinstance(t, str):
            continue
        if st.get("nulls") is not None:
            nulls.append({"key": fid, "value": int(st["nulls"])})
        lo = _single_value_ser(t, st.get("min"))
        if lo is not None:
            lower.append({"key": fid, "value": lo})
        hi = _single_value_ser(t, st.get("max"))
        if hi is not None:
            upper.append({"key": fid, "value": hi})
    return {
        "null_value_counts": nulls or None,
        "lower_bounds": lower or None,
        "upper_bounds": upper or None,
    }


def _decimal_pts(ice_type: str) -> tuple[int, int, int]:
    """decimal(P,S) -> (precision, scale, required fixed size) — the
    spec stores decimal partition values as minimal-length big-endian
    two's-complement unscaled bytes (Java TypeUtil.decimalRequiredBytes)."""
    p, s = ice_type[ice_type.index("(") + 1:-1].replace(" ", "").split(",")
    p, s = int(p), int(s)
    size = ((10 ** p - 1).bit_length() + 1 + 7) // 8
    return p, s, size


def _kv_array(name: str, kid: int, vid: int, vtype: str) -> dict:
    """Spec int-keyed map as Avro array<record{key,value}> with
    logicalType map (Avro map keys are strings, so Java Iceberg uses
    the array encoding for these fields too)."""
    return {
        "type": "array",
        "logicalType": "map",
        "items": {
            "type": "record",
            "name": name,
            "fields": [
                {"name": "key", "type": "int", "field-id": kid},
                {"name": "value", "type": vtype, "field-id": vid},
            ],
        },
    }


def _manifest_schema(spec_fields: list[dict], ice_schema: dict) -> dict:
    by_id = {f["id"]: f for f in ice_schema["fields"]}
    part_fields = []
    for pf in spec_fields:
        src = by_id[pf["source-id"]]
        tr = pf.get("transform", "identity")
        # bucket[N] values are ints; year/month/day/hour store the
        # spec'd int offsets from epoch; truncate keeps the source's
        # primitive type
        if tr.startswith("bucket") or tr in (
            "year", "month", "day", "hour"
        ):
            t = "int"
        elif tr.startswith("truncate"):
            st = str(src["type"])
            if st not in ("int", "long", "string"):
                raise ValueError(
                    f"truncate partition on source type {st!r} is not "
                    "exportable (Iceberg truncate is defined for "
                    "int/long/string/decimal; this layer writes only "
                    "int/long/string truncates)"
                )
            t = st
        elif str(src["type"]).startswith("decimal"):
            p, s, size = _decimal_pts(src["type"])
            t = {
                "type": "fixed",
                "name": f"dec_{pf['field-id']}",
                "size": size,
                "logicalType": "decimal",
                "precision": p,
                "scale": s,
            }
        else:
            t = _avro_primitive(src["type"])
        part_fields.append(
            {
                "name": pf["name"],
                "type": ["null", t],
                "field-id": pf["field-id"],
                "default": None,
            }
        )
    data_file = {
        "type": "record",
        "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {
                "name": "partition",
                "type": {
                    "type": "record",
                    "name": "r102",
                    "fields": part_fields,
                },
                "field-id": 102,
            },
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            # optional per-column stats (spec field-ids; int-keyed
            # maps use Avro's array-of-kv encoding since Avro map
            # keys must be strings — same as Java Iceberg)
            {
                "name": "null_value_counts",
                "type": ["null", _kv_array("k121_v122", 121, 122, "long")],
                "field-id": 110,
                "default": None,
            },
            {
                "name": "lower_bounds",
                "type": ["null", _kv_array("k126_v127", 126, 127, "bytes")],
                "field-id": 125,
                "default": None,
            },
            {
                "name": "upper_bounds",
                "type": ["null", _kv_array("k129_v130", 129, 130, "bytes")],
                "field-id": 128,
                "default": None,
            },
        ],
    }
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "field-id": 1, "default": None},
            {"name": "sequence_number", "type": ["null", "long"],
             "field-id": 3, "default": None},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "field-id": 4, "default": None},
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }


def _partition_values_of(rel_path: str, spec_fields, ice_schema) -> dict:
    """Hive ``k=v`` segments -> typed partition record values."""
    import urllib.parse

    by_id = {f["id"]: f for f in ice_schema["fields"]}
    raw = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            raw[urllib.parse.unquote(k)] = urllib.parse.unquote(v)
    out = {}
    for pf in spec_fields:
        v = raw.get(pf["name"])
        if v is None or v == "__HIVE_DEFAULT_PARTITION__":
            out[pf["name"]] = None
            continue
        tr = pf.get("transform", "identity")
        if tr.startswith("bucket"):
            out[pf["name"]] = int(v)
            continue
        if tr in ("year", "month", "day", "hour"):
            # hive segments hold Iceberg's human-readable forms
            # ("2024", "2024-01", "2024-01-15", "2024-01-15-07");
            # manifest values are the spec'd int offsets from epoch
            import datetime

            if tr == "year":
                out[pf["name"]] = int(v) - 1970
            elif tr == "month":
                y, mo = v.split("-")
                out[pf["name"]] = (int(y) - 1970) * 12 + int(mo) - 1
            elif tr == "day":
                out[pf["name"]] = (
                    datetime.date.fromisoformat(v)
                    - datetime.date(1970, 1, 1)
                ).days
            else:  # hour
                d, hh = v[:10], int(v[11:13])
                days = (
                    datetime.date.fromisoformat(d)
                    - datetime.date(1970, 1, 1)
                ).days
                out[pf["name"]] = days * 24 + hh
            continue
        if tr.startswith("truncate"):
            st = str(by_id[pf["source-id"]]["type"])
            out[pf["name"]] = v if st == "string" else int(v)
            continue
        t = by_id[pf["source-id"]]["type"]
        if t in ("long", "int"):
            out[pf["name"]] = int(v)
        elif t in ("double", "float"):
            out[pf["name"]] = float(v)
        elif t == "boolean":
            out[pf["name"]] = v == "true"
        elif t == "date":
            import datetime

            out[pf["name"]] = (
                datetime.date.fromisoformat(v)
                - datetime.date(1970, 1, 1)
            ).days
        elif t in ("timestamp", "timestamptz"):
            # hive segment "2024-01-01 00:00:00[.ffffff]" -> spec'd
            # micros-since-epoch (the Avro long _avro_primitive maps to)
            import datetime

            dt = datetime.datetime.fromisoformat(v.replace(" ", "T"))
            if dt.tzinfo is not None:
                dt = dt.astimezone(datetime.timezone.utc).replace(
                    tzinfo=None
                )
            # exact integer micros (total_seconds() is a float and
            # can round the last microsecond on modern epochs)
            out[pf["name"]] = (
                dt - datetime.datetime(1970, 1, 1)
            ) // datetime.timedelta(microseconds=1)
        elif str(t).startswith("decimal"):
            # spec: minimal big-endian two's-complement unscaled bytes
            from decimal import Decimal

            _, s, size = _decimal_pts(t)
            unscaled = int(Decimal(v).scaleb(s).to_integral_value())
            out[pf["name"]] = unscaled.to_bytes(size, "big", signed=True)
        else:
            out[pf["name"]] = v
    return out


def _dv_positions_by_base(table_dir: str, manifest: dict) -> dict:
    """{data file basename: sorted positions} for a snapshot's live
    deletion vectors (pyarrow, O(deleted rows), sessionless). The
    per-entry ``rows`` dict is authoritative for which bases an entry
    still applies to."""
    dvs = manifest.get("dvs") or []
    if not dvs:
        return {}
    import pyarrow.parquet as pq

    out: dict[str, set] = {}
    for dv in dvs:
        live = set(dv["rows"])
        t = pq.read_table(
            os.path.join(table_dir, dv["path"]),
            columns=["file_base", "pos"],
        )
        for b, p in zip(
            t.column("file_base").to_pylist(), t.column("pos").to_pylist()
        ):
            if b in live:
                out.setdefault(b, set()).add(int(p))
    return {b: sorted(s) for b, s in out.items()}


def _write_position_delete_parquet(
    path: str, data_file_path: str, positions: list[int]
) -> None:
    """One FILE-SCOPED Iceberg v2 position-delete parquet: columns
    ``file_path`` (field-id 2147483546) / ``pos`` (2147483545) per the
    spec's reserved delete-schema ids, rows sorted by (path, pos)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema([
        pa.field(
            "file_path", pa.string(), nullable=False,
            metadata={b"PARQUET:field_id": b"2147483546"},
        ),
        pa.field(
            "pos", pa.int64(), nullable=False,
            metadata={b"PARQUET:field_id": b"2147483545"},
        ),
    ])
    pq.write_table(
        pa.table(
            {
                "file_path": [data_file_path] * len(positions),
                "pos": sorted(int(p) for p in positions),
            },
            schema=schema,
        ),
        path,
    )


def export_iceberg_metadata(
    table_dir: str, out_dir: str | None = None
) -> str:
    """Write ``<out_dir or table_dir>/metadata/`` expressing the
    table's manifest history as Iceberg v2 snapshots (manifest v maps
    to sequence-number v). Returns the metadata directory. Data files
    are referenced in place by absolute path — zero bytes copied."""
    return _write_iceberg_snapshots(table_dir, out_dir, 1, None)


def sync_iceberg_metadata(
    table_dir: str, out_dir: str | None = None
) -> int:
    """Incremental export (the Iceberg analog of ``sync_delta_log``):
    bring an existing metadata mirror up to the table's current
    version, writing ONLY the new snapshots — prior manifests, the
    table uuid, and snapshot ids are reused from the mirror's own
    current state, so manifests older than the mirror may have been
    vacuumed. A fresh directory behaves like
    :func:`export_iceberg_metadata`. Returns the number of new
    snapshots written. Cost: O(new commits + their file entries)."""
    meta_dir = os.path.join(out_dir or table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    latest = current_version(table_dir)
    if latest == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    if not os.path.exists(hint):
        export_iceberg_metadata(table_dir, out_dir)
        return latest
    k = int(open(hint).read().strip())
    if k > latest:
        raise ValueError(
            f"{meta_dir} holds snapshot sequence {k} but the table only "
            f"has {latest} versions — the mirror is ahead of the table "
            "(wrong table_dir?)"
        )
    if k == latest:
        return 0
    _write_iceberg_snapshots(
        table_dir, out_dir, k + 1, _prior_iceberg_state(meta_dir, table_dir, k)
    )
    return latest - k


def expire_iceberg_snapshots(
    table_dir: str, out_dir: str | None = None, keep_last: int = 2
) -> dict:
    """Expire old snapshots from a metadata mirror (the maintenance
    analog of Iceberg's ``expireSnapshots``): keep the newest
    ``keep_last`` sequence numbers (always including the current
    snapshot), prune the rest from the CURRENT metadata.json —
    rewritten in place, same file name, so ``sync_iceberg_metadata``'s
    hint/sequence convention is untouched — and physically remove
    mirror files no surviving snapshot references: expired manifest
    lists, manifests referenced only by expired snapshots (the
    exporter shares unchanged manifests across snapshots BY
    REFERENCE, so liveness is computed, not assumed), delete-file
    parquets under metadata/, and the expired sequences' own
    metadata.json files. Data files are the source table's and are
    never touched. Returns ``{"expired": n, "removed_files": m}``.

    Why it matters at 100 TB: the mirror's metadata grows with every
    sync (a delete manifest per DV change, a manifest list per
    snapshot); without expiration a year of 15-minute cron syncs is
    ~35k snapshots of dead weight that every reader must parse past.
    Iceberg snapshots are SELF-CONTAINED (each manifest list names
    every live file), so expiring history never changes what the
    current snapshot reads — proven by the round-trip tests."""
    from ..functions.avro_min import read_container

    meta_dir = os.path.join(out_dir or table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if not os.path.exists(hint):
        raise FileNotFoundError(f"{meta_dir} is not a metadata mirror")
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    k = int(open(hint).read().strip())
    meta_path = os.path.join(meta_dir, f"v{k}.metadata.json")
    with open(meta_path) as fh:
        meta = json.load(fh)
    snapshots = list(meta["snapshots"])
    seqs = sorted(s["sequence-number"] for s in snapshots)
    cur_seq = next(
        s["sequence-number"]
        for s in snapshots
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    keep_seqs = set(seqs[-keep_last:]) | {cur_seq}
    expired = [
        s for s in snapshots if s["sequence-number"] not in keep_seqs
    ]
    if not expired:
        return {"expired": 0, "removed_files": 0}
    survivors = [
        s for s in snapshots if s["sequence-number"] in keep_seqs
    ]

    def _mirror_refs(snap: dict) -> set[str]:
        refs = {os.path.abspath(snap["manifest-list"])}
        for mf in read_container(snap["manifest-list"])[2]:
            refs.add(os.path.abspath(mf["manifest_path"]))
            if mf.get("content", 0) == 1:
                for e in read_container(mf["manifest_path"])[2]:
                    fp = os.path.abspath(e["data_file"]["file_path"])
                    if fp.startswith(os.path.abspath(meta_dir) + os.sep):
                        refs.add(fp)
        return refs

    live: set[str] = set()
    for s in survivors:
        live |= _mirror_refs(s)
    candidates: set[str] = set()
    for s in expired:
        candidates |= _mirror_refs(s)
        old_meta = os.path.join(
            meta_dir, f"v{s['sequence-number']}.metadata.json"
        )
        if os.path.exists(old_meta) and old_meta != meta_path:
            candidates.add(os.path.abspath(old_meta))
    removed = 0
    for path in sorted(candidates - live):
        os.remove(path)
        removed += 1
    meta["snapshots"] = survivors
    meta["snapshot-log"] = [
        e
        for e in meta.get("snapshot-log", [])
        if e["snapshot-id"] in {s["snapshot-id"] for s in survivors}
    ]
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, meta_path)
    return {"expired": len(expired), "removed_files": removed}


def _prior_iceberg_state(meta_dir: str, table_dir: str, k: int) -> dict:
    """Reconstruct the exporter's diff state from the MIRROR itself
    (current snapshot's manifest list + entries) — never from old
    source manifests, which a vacuum may have dropped."""
    with open(os.path.join(meta_dir, f"v{k}.metadata.json")) as fh:
        meta = json.load(fh)
    snapshots = list(meta["snapshots"])
    snapshot_ids = {s["sequence-number"]: s["snapshot-id"] for s in snapshots}
    cur_snap = next(
        s
        for s in snapshots
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, mlist = read_container(cur_snap["manifest-list"])
    manifests = {
        (e["sequence_number"], e["partition_spec_id"]): dict(e)
        for e in mlist
        if e.get("content", 0) == 0
    }
    del_entries = [
        dict(e) for e in mlist if e.get("content", 0) == 1
    ]
    prev_files: set[str] = set()
    first_seen: dict[str, int] = {}
    tprefix = os.path.abspath(table_dir) + os.sep
    for e in mlist:
        if e.get("content", 0) != 0:
            continue
        _, _, entries = read_container(e["manifest_path"])
        for en in entries:
            if en["status"] == 2:
                continue
            path = en["data_file"]["file_path"]
            rel = (
                os.path.relpath(path, table_dir)
                if path.startswith(tprefix)
                else path
            )
            prev_files.add(rel)
            first_seen[rel] = en["sequence_number"]
    # reconstruct the DV-state signature from the mirror's own delete
    # manifest so an unchanged state keeps reusing it by reference
    del_sig: frozenset = frozenset()
    if del_entries:
        import pyarrow.parquet as pq

        by_base: dict[str, set] = {}
        for de in del_entries:
            _, _, dentries = read_container(de["manifest_path"])
            for en in dentries:
                if en["status"] == 2:
                    continue
                t = pq.read_table(
                    en["data_file"]["file_path"],
                    columns=["file_path", "pos"],
                )
                for fp, p in zip(
                    t.column("file_path").to_pylist(),
                    t.column("pos").to_pylist(),
                ):
                    by_base.setdefault(
                        os.path.basename(fp), set()
                    ).add(int(p))
        del_sig = frozenset(
            (b, tuple(sorted(s))) for b, s in by_base.items()
        )
    return {
        "table_uuid": meta["table-uuid"],
        "snapshots": snapshots,
        "snapshot_ids": snapshot_ids,
        "manifests": manifests,
        "prev_files": prev_files,
        "first_seen": first_seen,
        "del_entries": del_entries,
        "del_sig": del_sig,
        # schema/spec registries: evolved histories carry one entry
        # per distinct schema/spec; ids are stable across syncs
        "schemas": list(meta.get("schemas", [])),
        "partition_specs": list(meta.get("partition-specs", [])),
    }


def _write_iceberg_snapshots(
    table_dir: str, out_dir: str | None, start_v: int, prior: dict | None
) -> str:
    meta_dir = os.path.join(out_dir or table_dir, "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    latest = current_version(table_dir)
    if latest == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    now_ms = int(time.time() * 1000)
    location = os.path.abspath(out_dir or table_dir)

    if prior is None:
        table_uuid = str(uuid.uuid4())
        manifests: dict = {}  # version -> manifest-list entry dict
        first_seen: dict[str, int] = {}  # file -> first version seen
        snapshots: list[dict] = []
        snapshot_ids: dict[int, int] = {}
        prev_files: set[str] = set()
        del_entries: list[dict] = []  # carried delete-manifest entries
        del_sig: frozenset = frozenset()  # DV state signature
        schemas_list: list[dict] = []  # one entry per DISTINCT schema
        specs_list: list[dict] = []  # one entry per DISTINCT spec
    else:
        table_uuid = prior["table_uuid"]
        manifests = dict(prior["manifests"])
        first_seen = dict(prior["first_seen"])
        snapshots = list(prior["snapshots"])
        snapshot_ids = dict(prior["snapshot_ids"])
        prev_files = set(prior["prev_files"])
        del_entries = list(prior.get("del_entries", []))
        del_sig = prior.get("del_sig", frozenset())
        schemas_list = list(prior.get("schemas", []))
        specs_list = list(prior.get("partition_specs", []))
    schema_key_to_id = {
        json.dumps(
            {k: v for k, v in s.items() if k != "schema-id"},
            sort_keys=True,
        ): s["schema-id"]
        for s in schemas_list
    }
    spec_key_to_id = {
        json.dumps(s["fields"], sort_keys=True): s["spec-id"]
        for s in specs_list
    }
    ice_schema = None
    spec_fields: list[dict] = []
    spec_id = 0
    last_col_id = 0
    for v in range(start_v, latest + 1):
        try:
            m = _load_manifest(table_dir, v)
        except FileNotFoundError:
            raise ValueError(
                f"{table_dir}@v{v} was vacuumed; Iceberg snapshots must "
                "be contiguous — sync the mirror before vacuuming "
                "unsynced versions, or export the surviving history to "
                "a fresh directory"
            ) from None
        spec = m.get("partition_spec") or []
        for e in spec:
            if not isinstance(e, dict):
                continue
            if e["transform"] == "bucket" and e.get("hash") == "murmur3":
                continue  # Iceberg's own bucket hash — exports truthfully
            if e["transform"] == "bucket":
                raise ValueError(
                    f"{table_dir}@v{v} buckets with xxhash64; Iceberg's "
                    "bucket[N] is murmur3, so translating the spec "
                    "would make foreign readers prune WRONG — write "
                    "new tables with bucket_hash='murmur3' (they export "
                    "truthfully) or re-layout with an identity spec"
                )
            if e["transform"] in ("truncate", "days", "months", "years",
                                  "hours"):
                # value-identical to Iceberg's truncate[W] / day /
                # month / year / hour (floor arithmetic and ISO string
                # prefixes; even the hive path forms match Iceberg's
                # human-readable convention) — exports truthfully
                continue
            raise ValueError(
                f"{table_dir}@v{v} uses transform partitioning {spec}; "
                "mapping this transform to Iceberg is not implemented "
                "— re-layout with an identity spec first"
            )
        schema_json = m.get("schema")
        if schema_json is None:
            raise ValueError(f"{table_dir}@v{v} has no committed schema")
        ice_schema, ids = _iceberg_schema(schema_json)
        # schema registry: evolved histories get one schemas[] entry
        # per distinct schema; every snapshot records ITS schema-id so
        # time travel reads old data with the schema it was written
        # under (old files null-fill later-added optional columns)
        skey = json.dumps(
            {k: v for k, v in ice_schema.items() if k != "schema-id"},
            sort_keys=True,
        )
        if skey not in schema_key_to_id:
            sid_new = max(
                (s["schema-id"] for s in schemas_list), default=-1
            ) + 1
            schema_key_to_id[skey] = sid_new
            schemas_list.append({**ice_schema, "schema-id": sid_new})
        cur_schema_id = schema_key_to_id[skey]
        ice_schema = {**ice_schema, "schema-id": cur_schema_id}
        nm = _name_mapping_property(schema_json)
        last_col_id = max(
            max(ids.values(), default=0), last_col_id
        )
        # decimal identity partitions encode as the spec'd fixed-bytes
        # Avro values (see _decimal_pts / _partition_values_of)
        def _ice_transform(c: dict) -> str:
            t = c["transform"]
            if t == "bucket":
                return f"bucket[{c['n']}]"
            if t == "truncate":
                return f"truncate[{c['n']}]"
            # native plural names -> Iceberg singular transform names
            return {"days": "day", "months": "month",
                    "years": "year", "hours": "hour"}[t]

        spec_fields = [
            {
                "name": c,
                "transform": "identity",
                "source-id": ids[c],
                "field-id": 1000 + i,
            }
            if isinstance(c, str)
            else {
                # hidden transforms export as Iceberg's own; the field
                # name keeps the hidden directory name so partition
                # values resolve from the hive path
                "name": c["name"],
                "transform": _ice_transform(c),
                "source-id": ids[c["col"]],
                "field-id": 1000 + i,
            }
            for i, c in enumerate(spec)
        ]
        # spec registry (mirrors the schema registry): evolved layouts
        # get one partition-specs[] entry per distinct spec; carried
        # manifests keep THEIR spec id, so a reader restores identity
        # partition values for every file under the spec its layout
        # was written with
        pkey = json.dumps(spec_fields, sort_keys=True)
        if pkey not in spec_key_to_id:
            pid_new = max(
                (s["spec-id"] for s in specs_list), default=-1
            ) + 1
            spec_key_to_id[pkey] = pid_new
            specs_list.append(
                {"spec-id": pid_new, "fields": spec_fields}
            )
        spec_id = spec_key_to_id[pkey]

        def _layout_spec_of(f: str) -> tuple[int, list[dict]]:
            """The registered spec matching a file's OWN hive layout
            (the directory names are the layout); current spec when
            nothing else matches (flat files, fresh layouts)."""
            import urllib.parse

            segs = frozenset(
                urllib.parse.unquote(seg.split("=", 1)[0])
                for seg in f.split("/")[:-1]
                if "=" in seg
            )
            if segs == frozenset(pf["name"] for pf in spec_fields):
                return spec_id, spec_fields  # current spec wins ties
            for s in specs_list:
                if frozenset(pf["name"] for pf in s["fields"]) == segs:
                    return s["spec-id"], s["fields"]
            return spec_id, spec_fields

        files, stats = _expand_manifest(table_dir, m)
        cur = set(files)
        for f in cur - prev_files:
            first_seen[f] = v
        snap_id = now_ms + v  # unique, monotone (fresh clock per run)
        snapshot_ids[v] = snap_id
        mode = m.get("mode", "append")
        is_append = mode == "append" and prev_files <= cur

        ice_types_by_name = {
            f["name"]: f["type"] for f in ice_schema["fields"]
        }

        def _entry(f: str, status: int, seen_v: int, pv_fields) -> dict:
            return {
                "status": status,
                "snapshot_id": snapshot_ids[seen_v],
                "sequence_number": seen_v,
                "file_sequence_number": seen_v,
                "data_file": {
                    "content": 0,
                    "file_path": os.path.abspath(
                        os.path.join(table_dir, f)
                    ),
                    "file_format": "PARQUET",
                    "partition": _partition_values_of(
                        f, pv_fields, ice_schema
                    ),
                    "record_count": stats.get(f, {}).get("rows", 0),
                    "file_size_in_bytes": os.path.getsize(
                        os.path.join(table_dir, f)
                    ),
                    # per-column bounds: what lets a FOREIGN reader
                    # (Trino/Spark+Iceberg) data-skip our mirror — at
                    # 100 TB a stats-free export is a full-scan trap
                    **_stats_maps(
                        stats.get(f, {}).get("columns", {}) or {},
                        ids,
                        ice_types_by_name,
                    ),
                },
            }

        def _write_group(sid: int, sfields, entries) -> dict:
            mpath = os.path.join(
                meta_dir, f"{uuid.uuid4().hex}-m0.avro"
            )
            write_container(
                mpath,
                _manifest_schema(sfields, ice_schema),
                entries,
                metadata={
                    "schema": json.dumps(ice_schema),
                    "schema-id": str(cur_schema_id),
                    "partition-spec": json.dumps(sfields),
                    "partition-spec-id": str(sid),
                    "format-version": "2",
                    "content": "data",
                },
            )
            n_added = sum(1 for e in entries if e["status"] == 1)
            return {
                "manifest_path": mpath,
                "manifest_length": os.path.getsize(mpath),
                "partition_spec_id": sid,
                "content": 0,
                "sequence_number": v,
                "min_sequence_number": min(
                    (e["sequence_number"] for e in entries), default=v
                ),
                "added_snapshot_id": snap_id,
                "added_files_count": n_added,
                "existing_files_count": len(entries) - n_added,
                "deleted_files_count": 0,
                "added_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == 1
                ),
                "existing_rows_count": sum(
                    e["data_file"]["record_count"]
                    for e in entries
                    if e["status"] == 0
                ),
                "deleted_rows_count": 0,
            }

        if is_append:
            # new files are laid out under the CURRENT spec; carried
            # manifests keep their own (possibly older) spec ids
            added = sorted(cur - prev_files)
            entries = [_entry(f, 1, v, spec_fields) for f in added]
            keep = {k: e for k, e in manifests.items()}
            keep[(v, spec_id)] = _write_group(
                spec_id, spec_fields, entries
            )
        else:
            # rewrite: fresh manifests holding the live files, GROUPED
            # by each file's own layout spec (a manifest has exactly
            # one spec; partition values must come from the spec the
            # file's hive directories were written under) — carried
            # files keep EXISTING status + origin snapshot
            groups: dict[int, tuple] = {}
            for f in sorted(cur):
                sid, sfields = _layout_spec_of(f)
                groups.setdefault(sid, (sfields, []))[1].append(f)
            keep = {}
            for sid, (sfields, fs) in sorted(groups.items()):
                entries = [
                    _entry(
                        f,
                        1 if first_seen[f] == v else 0,
                        first_seen[f],
                        sfields,
                    )
                    for f in fs
                ]
                keep[(v, sid)] = _write_group(sid, sfields, entries)
        manifests = keep
        # deletion vectors -> v2 POSITION DELETE files (VERDICT r9 ask
        # #2): each DV'd data file gets one file-scoped delete parquet
        # (spec'd file_path/pos schema, reserved field-ids) and the
        # snapshot carries ONE content=1 delete manifest expressing the
        # FULL current DV state at sequence-number v. Unchanged DV
        # state reuses the manifest by reference (like data manifests);
        # a snapshot with no DVs drops it. Position deletes apply to
        # data files with data seq <= delete seq — our DVs only ever
        # target files first seen at <= v, so the rule holds. Delete
        # parquets live in metadata/ so the source table's vacuum
        # (which walks data/ only) can never sweep the mirror's files.
        dv_by_base = _dv_positions_by_base(table_dir, m)
        sig = frozenset((b, tuple(p)) for b, p in dv_by_base.items())
        if not sig:
            del_entries = []
        elif sig != del_sig:
            base_to_rel = {os.path.basename(f): f for f in files}
            # delete records GROUPED by the target data file's layout
            # spec (same rule as data manifests): the delete entry's
            # partition record must be spec-consistent or foreign
            # readers would prune the delete file away from the very
            # files it covers
            rec_groups: dict[int, tuple] = {}
            for b in sorted(dv_by_base):
                rel = base_to_rel[b]
                sid, sfields = _layout_spec_of(rel)
                dpath = os.path.join(
                    meta_dir, f"del-{uuid.uuid4().hex}.parquet"
                )
                _write_position_delete_parquet(
                    dpath,
                    os.path.abspath(os.path.join(table_dir, rel)),
                    dv_by_base[b],
                )
                rec_groups.setdefault(sid, (sfields, []))[1].append({
                    "status": 1,
                    "snapshot_id": snap_id,
                    "sequence_number": v,
                    "file_sequence_number": v,
                    "data_file": {
                        "content": 1,
                        "file_path": dpath,
                        "file_format": "PARQUET",
                        "partition": _partition_values_of(
                            rel, sfields, ice_schema
                        ),
                        "record_count": len(dv_by_base[b]),
                        "file_size_in_bytes": os.path.getsize(dpath),
                        "null_value_counts": None,
                        "lower_bounds": None,
                        "upper_bounds": None,
                    },
                })
            del_entries = []
            for sid, (sfields, del_records) in sorted(rec_groups.items()):
                dmpath = os.path.join(
                    meta_dir, f"{uuid.uuid4().hex}-m1.avro"
                )
                write_container(
                    dmpath,
                    _manifest_schema(sfields, ice_schema),
                    del_records,
                    metadata={
                        "schema": json.dumps(ice_schema),
                        "schema-id": str(cur_schema_id),
                        "partition-spec": json.dumps(sfields),
                        "partition-spec-id": str(sid),
                        "format-version": "2",
                        "content": "deletes",
                    },
                )
                del_entries.append({
                    "manifest_path": dmpath,
                    "manifest_length": os.path.getsize(dmpath),
                    "partition_spec_id": sid,
                    "content": 1,
                    "sequence_number": v,
                    "min_sequence_number": v,
                    "added_snapshot_id": snap_id,
                    "added_files_count": len(del_records),
                    "existing_files_count": 0,
                    "deleted_files_count": 0,
                    "added_rows_count": sum(
                        e["data_file"]["record_count"]
                        for e in del_records
                    ),
                    "existing_rows_count": 0,
                    "deleted_rows_count": 0,
                })
        del_sig = sig
        list_path = os.path.join(
            meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro"
        )
        write_container(
            list_path,
            _MANIFEST_LIST_SCHEMA,
            [manifests[k] for k in sorted(manifests)] + list(del_entries),
            metadata={"format-version": "2"},
        )
        op = {
            "append": "append",
            "delete": "delete",
            "update": "overwrite",
            "merge": "overwrite",
            "optimize": "replace",
            "overwrite": "overwrite",
            "restore": "overwrite",
        }.get(mode, "overwrite")
        snapshots.append(
            {
                "snapshot-id": snap_id,
                **(
                    {"parent-snapshot-id": snapshot_ids[v - 1]}
                    if v > 1
                    else {}
                ),
                "sequence-number": v,
                "timestamp-ms": now_ms + v,
                "summary": {"operation": op},
                "manifest-list": list_path,
                "schema-id": cur_schema_id,
            }
        )
        table_meta = {
            "format-version": 2,
            "table-uuid": table_uuid,
            "location": location,
            "last-sequence-number": v,
            "last-updated-ms": now_ms + v,
            "last-column-id": last_col_id,
            "current-schema-id": cur_schema_id,
            "schemas": list(schemas_list),
            "default-spec-id": spec_id,
            "partition-specs": list(specs_list),
            "last-partition-id": max(
                (
                    pf["field-id"]
                    for s in specs_list
                    for pf in s["fields"]
                ),
                default=999,
            ),
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": (
                {"schema.name-mapping.default": nm} if nm else {}
            ),
            "current-snapshot-id": snap_id,
            "refs": {
                "main": {"snapshot-id": snap_id, "type": "branch"}
            },
            "snapshots": list(snapshots),
            "snapshot-log": [
                {
                    "snapshot-id": s["snapshot-id"],
                    "timestamp-ms": s["timestamp-ms"],
                }
                for s in snapshots
            ],
            "metadata-log": [],
        }
        mjson = os.path.join(meta_dir, f"v{v}.metadata.json")
        tmp = mjson + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(table_meta, fh, indent=1)
        os.replace(tmp, mjson)
        prev_files = cur
    hint = os.path.join(meta_dir, "version-hint.text")
    with open(hint + ".tmp", "w") as fh:
        fh.write(str(latest))
    os.replace(hint + ".tmp", hint)
    return meta_dir


def _single_value_deser(ice_type: str, b: bytes):
    """Inverse of :func:`_single_value_ser`, returning values in the
    NATIVE manifest-stats convention (ISO strings for date/timestamp,
    matching versioned._json_safe) so adopted stats compare exactly
    like natively-written ones. None = not adoptable."""
    import struct as _struct

    if b is None or not isinstance(ice_type, str):
        return None
    try:
        if ice_type == "int":
            return _struct.unpack("<i", b)[0]
        if ice_type == "long":
            return _struct.unpack("<q", b)[0]
        if ice_type == "float":
            return _struct.unpack("<f", b)[0]
        if ice_type == "double":
            return _struct.unpack("<d", b)[0]
        if ice_type == "boolean":
            return b != b"\x00"
        if ice_type == "string":
            return b.decode("utf-8")
        if ice_type == "date":
            import datetime as _dt

            days = _struct.unpack("<i", b)[0]
            return (
                _dt.date(1970, 1, 1) + _dt.timedelta(days=days)
            ).isoformat()
        if ice_type in ("timestamp", "timestamptz"):
            import datetime as _dt

            micros = _struct.unpack("<q", b)[0]
            return (
                _dt.datetime(1970, 1, 1)
                + _dt.timedelta(microseconds=micros)
            ).isoformat()
    except (ValueError, _struct.error):
        return None
    return None


_PRUNABLE_EQ_TYPES = ("int", "long", "float", "double", "string")


def _prunable_bounds(df_rec: dict, by_id: dict) -> dict[int, tuple]:
    """{field id: (lo, hi)} from a manifest entry, only for types
    whose decoded values compare directly with parquet-logical delete
    keys (int/long/float/double/string) — used to skip data files a
    delete's key range can't touch."""
    lo = {e["key"]: e["value"] for e in (df_rec.get("lower_bounds") or [])}
    hi = {e["key"]: e["value"] for e in (df_rec.get("upper_bounds") or [])}
    out = {}
    for fid in set(lo) & set(hi):
        f = by_id.get(fid)
        if f is None or f["type"] not in _PRUNABLE_EQ_TYPES:
            continue
        mn = _single_value_deser(f["type"], lo[fid])
        mx = _single_value_deser(f["type"], hi[fid])
        if mn is not None and mx is not None:
            out[fid] = (mn, mx)
    return out


def _adopt_file_stats(df_rec: dict, ice_schema: dict) -> dict:
    """Manifest bounds maps -> native per-column stats, so an adopted
    table keeps manifest-level data skipping (skip_filter) without
    re-reading any parquet footers."""
    by_id = {f["id"]: f for f in ice_schema["fields"]}

    def _kv(field):
        return {
            e["key"]: e["value"] for e in (df_rec.get(field) or [])
        }

    lower, upper = _kv("lower_bounds"), _kv("upper_bounds")
    nulls = _kv("null_value_counts")
    cols: dict[str, dict] = {}
    for fid in set(lower) & set(upper):
        f = by_id.get(fid)
        if f is None or not isinstance(f["type"], str):
            continue
        mn = _single_value_deser(f["type"], lower[fid])
        mx = _single_value_deser(f["type"], upper[fid])
        if mn is None or mx is None:
            continue
        cols[f["name"]] = {
            "min": mn,
            "max": mx,
            "nulls": int(nulls.get(fid, 0)),
        }
    return cols


def _eq_delete_positions(
    eq_dels: list[dict],
    ice_schema: dict,
    name_map: dict[int, list[str]],
    data_seq: dict[str, int],
    file_scope: dict[str, tuple],
    abs_by_base: dict[str, str],
    specs: dict[int, list[dict]],
    file_bounds: dict[str, dict] | None = None,
) -> dict[str, set]:
    """Materialize equality deletes into per-data-file row positions
    (the shape native deletion vectors adopt). Spec semantics: a
    delete row removes data rows matching it on every ``equality_ids``
    column (null matches null), from data files whose data sequence
    number is STRICTLY below the delete file's; a delete stored with a
    partitioned spec applies only to data files in the same
    (spec, partition), an unpartitioned one applies globally.
    Cost: one key-column parquet scan per (delete file x covered data
    file) — paid once at adoption, never on reads — and data files
    whose manifest bounds (``file_bounds``: base -> {fid: (lo, hi)})
    can't intersect the delete keys' range on the FIRST equality
    column are skipped without opening them, so adoption cost tracks
    the touched key range, not the table."""
    import pyarrow.parquet as pq

    by_id = {f["id"]: f for f in ice_schema["fields"]}
    file_bounds = file_bounds or {}

    def _col_name(fid: int, cols: list[str], base: str) -> str | None:
        f = by_id.get(fid)
        if f is None or not isinstance(f["type"], str):
            raise ValueError(
                f"equality id {fid} does not resolve to a top-level "
                "primitive column"
            )
        for cand in name_map.get(fid, []) + [f["name"]]:
            if cand in cols:
                return cand
        return None  # not physical: identity partition column

    out: dict[str, set] = {}
    for ed in eq_dels:
        kt = pq.read_table(ed["path"])
        key_cols = []
        for fid in ed["ids"]:
            phys = _col_name(fid, kt.column_names, "<delete file>")
            if phys is None:
                raise ValueError(
                    f"equality column id {fid} missing from delete "
                    f"file {ed['path']}"
                )
            key_cols.append(kt.column(phys).to_pylist())
        keys = set(zip(*key_cols)) if key_cols else set()
        if not keys:
            continue
        # bounds-prune on the first equality column: the delete keys'
        # own [min, max] vs each data file's manifest bounds
        fid0 = ed["ids"][0]
        k0 = [k[0] for k in keys if k[0] is not None]
        k0_rng = (min(k0), max(k0)) if k0 else None
        has_null_key = len(k0) < len(keys)
        for base, dseq in data_seq.items():
            if dseq >= ed["seq"]:  # strict: same-sequence data survives
                continue
            spec_id, part = file_scope[base]
            if ed["partition"] is not None and (
                spec_id != ed["spec_id"] or part != ed["partition"]
            ):
                continue
            b = (file_bounds.get(base) or {}).get(fid0)
            if (
                b is not None
                and k0_rng is not None
                and not has_null_key
                and (k0_rng[1] < b[0] or k0_rng[0] > b[1])
            ):
                continue  # key range disjoint from the file: skip scan
            t = pq.read_table(abs_by_base[base])
            ident_names = {
                pf["name"]
                for pf in specs.get(spec_id, [])
                if pf.get("transform") == "identity"
            }
            vals = []
            for fid in ed["ids"]:
                phys = _col_name(fid, t.column_names, base)
                if phys is not None:
                    vals.append(t.column(phys).to_pylist())
                elif by_id[fid]["name"] in ident_names:
                    # manifest partition values are spec'd physical
                    # (date=days, timestamp=micros); the delete
                    # parquet's key values are logical — convert
                    import datetime as _dt

                    raw = part.get(by_id[fid]["name"])
                    ftype = by_id[fid]["type"]
                    if raw is not None and ftype == "date":
                        raw = _dt.date(1970, 1, 1) + _dt.timedelta(days=raw)
                    elif raw is not None and ftype in (
                        "timestamp", "timestamptz"
                    ):
                        raw = _dt.datetime(1970, 1, 1) + _dt.timedelta(
                            microseconds=raw
                        )
                    vals.append([raw] * len(t))
                else:
                    raise ValueError(
                        f"equality column id {fid} not resolvable in "
                        f"{base} and not an identity partition column"
                    )
            hit = {
                i for i, key in enumerate(zip(*vals)) if key in keys
            }
            if hit:
                out.setdefault(base, set()).update(hit)
    return out


def import_iceberg_metadata(table_dir: str) -> int:
    """Adopt an Iceberg metadata tree at ``<table_dir>/metadata`` into
    the versioned manifest chain: each snapshot (sequence order)
    becomes one manifest version referencing the SAME data files.
    Returns the number of versions committed. Position deletes adopt
    as native deletion vectors; equality deletes materialize to
    positions first (see :func:`_eq_delete_positions`). Refuses
    non-identity/non-bucket transforms."""
    meta_dir = os.path.join(table_dir, "metadata")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        n = int(open(hint).read().strip())
        meta_path = os.path.join(meta_dir, f"v{n}.metadata.json")
    else:
        cands = sorted(
            (f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")),
            key=lambda f: int(f[1:].split(".")[0]),
        )
        if not cands:
            raise FileNotFoundError(f"{meta_dir} holds no metadata.json")
        meta_path = os.path.join(meta_dir, cands[-1])
    with open(meta_path) as fh:
        meta = json.load(fh)
    if meta.get("format-version") != 2:
        raise ValueError(
            f"format-version {meta.get('format-version')} != 2; only v2 "
            "metadata is adoptable"
        )
    schemas = {s["schema-id"]: s for s in meta["schemas"]}
    specs = {s["spec-id"]: s["fields"] for s in meta["partition-specs"]}
    for fields in specs.values():
        for pf in fields:
            t = pf["transform"]
            if (
                t in ("identity", "year", "month", "day", "hour")
                or re.fullmatch(r"(bucket|truncate)\[\d+\]", t)
            ):
                continue  # adopt as the layer's own hidden transforms
            raise ValueError(
                f"partition transform {t!r} is not adoptable — "
                "identity, bucket[N] (murmur3), truncate[W], and "
                "year/month/day/hour are; re-layout the source first"
            )
    if current_version(table_dir) != 0:
        raise ValueError(
            f"{table_dir} already has committed versions; adopt into a "
            "clean directory"
        )
    from .commitstore import get_commit_store

    get_commit_store().ensure_log(table_dir)
    def _resolve(path: str) -> str:
        if os.path.exists(path):
            return path
        local = os.path.join(meta_dir, os.path.basename(path))
        if os.path.exists(local):
            return local
        raise FileNotFoundError(path)

    n_committed = 0
    last_dv_sig: frozenset | None = None
    last_dvs: list | None = None
    for snap in sorted(meta["snapshots"], key=lambda s: s["sequence-number"]):
        schema_json = _spark_schema(
            schemas[snap.get("schema-id", meta["current-schema-id"])]
        )
        files: list[str] = []
        stats: dict = {}
        spec_fields: list[dict] = []
        data_seq: dict[str, int] = {}  # data file basename -> data seq
        del_rows: list[tuple] = []  # (delete seq, target path, pos)
        # equality deletes (Flink-CDC write path): collected per
        # snapshot, then materialized into native DV positions below
        eq_dels: list[dict] = []
        file_scope: dict[str, tuple] = {}  # base -> (spec_id, partition)
        abs_by_base: dict[str, str] = {}
        bounds_by_base: dict[str, dict] = {}  # base -> {fid: (lo, hi)}
        _, _, mlist = read_container(_resolve(snap["manifest-list"]))
        for mf in mlist:
            mschema, mmeta, entries = read_container(
                _resolve(mf["manifest_path"])
            )
            is_delete_manifest = mf.get("content", 0) == 1
            mf_spec = json.loads(mmeta.get("partition-spec", "[]"))
            if not is_delete_manifest:
                spec_fields = mf_spec
            for e in entries:
                if e["status"] == 2:  # DELETED tombstone
                    continue
                df = e["data_file"]
                content = df.get("content", 0)
                if df["file_format"].upper() != "PARQUET":
                    raise ValueError(
                        f"file_format {df['file_format']!r} != PARQUET"
                    )
                if content == 2:
                    ids = df.get("equality_ids") or []
                    if not ids:
                        raise ValueError(
                            "equality delete file carries no equality_ids"
                        )
                    scoped = bool(mf_spec)
                    eq_dels.append(
                        {
                            "seq": e["sequence_number"],
                            "ids": ids,
                            "path": _resolve(df["file_path"]),
                            "spec_id": (
                                mf["partition_spec_id"] if scoped else None
                            ),
                            "partition": (
                                dict(df.get("partition") or {})
                                if scoped
                                else None
                            ),
                        }
                    )
                    continue
                if is_delete_manifest or content == 1:
                    # v2 position-delete file -> (seq, target, pos)
                    import pyarrow.parquet as _pq

                    t = _pq.read_table(
                        _resolve(df["file_path"]),
                        columns=["file_path", "pos"],
                    )
                    seq = e["sequence_number"]
                    del_rows.extend(
                        (seq, fp, int(p))
                        for fp, p in zip(
                            t.column("file_path").to_pylist(),
                            t.column("pos").to_pylist(),
                        )
                    )
                    continue
                path = df["file_path"]
                rel = (
                    os.path.relpath(path, table_dir)
                    if os.path.isabs(path)
                    and path.startswith(os.path.abspath(table_dir) + os.sep)
                    else path
                )
                files.append(rel)
                base = os.path.basename(rel)
                data_seq[base] = e["sequence_number"]
                file_scope[base] = (
                    mf["partition_spec_id"],
                    dict(df.get("partition") or {}),
                )
                abs_by_base[base] = _resolve(df["file_path"])
                snap_schema = schemas[
                    snap.get("schema-id", meta["current-schema-id"])
                ]
                bounds_by_base[base] = _prunable_bounds(
                    df, {f["id"]: f for f in snap_schema["fields"]}
                )
                stats[rel] = {
                    "rows": int(df["record_count"]),
                    # bounds adopt as native stats: the adopted table
                    # keeps manifest-level data skipping for free
                    "columns": _adopt_file_stats(
                        df,
                        schemas[
                            snap.get("schema-id", meta["current-schema-id"])
                        ],
                    ),
                }
        op = (snap.get("summary") or {}).get("operation", "append")
        mode = {"append": "append", "delete": "delete",
                "replace": "optimize"}.get(op, "overwrite")
        # position deletes apply to data files whose data sequence
        # number <= the delete file's (spec); adopted as native DVs
        dv_by_base: dict[str, set] = {}
        for dseq, fp, p in del_rows:
            b = os.path.basename(fp)
            if b in data_seq and dseq >= data_seq[b]:
                dv_by_base.setdefault(b, set()).add(p)
        # equality deletes -> positions (STRICTLY older data files
        # only, partition scope honored); adopted as native DVs too
        if eq_dels:
            ice_sch = schemas[snap.get("schema-id", meta["current-schema-id"])]
            nm_raw = (meta.get("properties") or {}).get(
                "schema.name-mapping.default"
            )
            name_map = {
                m["field-id"]: list(m.get("names") or [])
                for m in (json.loads(nm_raw) if nm_raw else [])
                if m.get("field-id") is not None
            }
            for b, positions in _eq_delete_positions(
                eq_dels, ice_sch, name_map, data_seq, file_scope,
                abs_by_base, specs, file_bounds=bounds_by_base,
            ).items():
                dv_by_base.setdefault(b, set()).update(positions)
        dvs = None
        if dv_by_base:
            sig = frozenset(
                (b, tuple(sorted(s))) for b, s in dv_by_base.items()
            )
            if sig != last_dv_sig:
                last_dvs = _positions_to_dvs(table_dir, dv_by_base)
                last_dv_sig = sig
            dvs = last_dvs
        _commit_manifest(
            table_dir,
            sorted(set(files)),
            stats,
            mode,
            schema_json,
            {
                "iceberg_snapshot_id": snap["snapshot-id"],
                "iceberg_sequence_number": snap["sequence-number"],
            },
            bloom_cols=None,
            partition_spec=_adopt_spec(
                spec_fields,
                schemas[snap.get("schema-id", meta["current-schema-id"])],
            ),
            dvs=dvs,
        )
        n_committed += 1
    return n_committed


def _adopt_spec(spec_fields: list[dict], ice_schema: dict) -> list:
    """Iceberg spec fields -> the versioned layer's partition_spec:
    identity fields become column names; bucket[N] fields become
    murmur3 bucket transform entries keeping the exported field name
    (= the hive directory name, so existing paths keep resolving)."""
    by_id = {f["id"]: f["name"] for f in ice_schema["fields"]}
    out: list = []
    for pf in spec_fields:
        t = pf["transform"]
        if t == "identity":
            out.append(pf["name"])
            continue
        if (m := re.fullmatch(r"bucket\[(\d+)\]", t)) is not None:
            out.append({
                "transform": "bucket",
                "col": by_id[pf["source-id"]],
                "n": int(m.group(1)),
                "hash": "murmur3",
                "name": pf["name"],
            })
            continue
        if (m := re.fullmatch(r"truncate\[(\d+)\]", t)) is not None:
            out.append({
                "transform": "truncate",
                "col": by_id[pf["source-id"]],
                "n": int(m.group(1)),
                "name": pf["name"],
            })
            continue
        if t in ("year", "month", "day", "hour"):
            out.append({
                # Iceberg singular -> the layer's plural names; the
                # hidden values regenerate as the same ISO prefixes
                # the hive paths already hold
                "transform": {"year": "years", "month": "months",
                              "day": "days", "hour": "hours"}[t],
                "col": by_id[pf["source-id"]],
                "name": pf["name"],
            })
            continue
        raise ValueError(f"partition transform {t!r} is not adoptable")
    return out


def _positions_to_dvs(table_dir: str, dv_by_base: dict) -> list:
    """Materialize adopted position-delete state ({data file basename:
    positions}) as ONE native DV parquet (file_base, pos) under data/
    — the same object read_versioned anti-joins — and return the
    manifest ``dvs`` entry list."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bases: list[str] = []
    poss: list[int] = []
    rows: dict[str, int] = {}
    for b in sorted(dv_by_base):
        positions = sorted(dv_by_base[b])
        rows[b] = len(positions)
        bases.extend([b] * len(positions))
        poss.extend(positions)
    data_dir = os.path.join(table_dir, "data")
    os.makedirs(data_dir, exist_ok=True)
    dst = f"dv-{uuid.uuid4().hex}.parquet"
    pq.write_table(
        pa.table(
            {
                "file_base": pa.array(bases, pa.string()),
                "pos": pa.array(poss, pa.int64()),
            }
        ),
        os.path.join(data_dir, dst),
    )
    return [{"path": os.path.join("data", dst), "rows": rows}]
