"""Minimal INDEPENDENT Apache Iceberg v2 metadata reader (VERDICT r9
ask #1).

The Iceberg exporter/importer pair in ``operators/iceberg_interop.py``
previously spoke only through its own Avro codec
(``functions/avro_min.py``), so an encoding bug there would round-trip
invisibly through export -> import. This module is a read-only Iceberg
client written from scratch against the PUBLIC specs — the Iceberg
table spec (iceberg.apache.org/spec) and the Avro 1.x specification
(avro.apache.org/docs — object container files + binary encoding) —
and is the round-trip PROOF for the exporter, exactly the role
``operators/delta_reader.py`` plays for the Delta exporter:

- resolves ``metadata/version-hint.text`` (HadoopTables convention)
  or the newest ``v*.metadata.json``;
- walks table metadata -> snapshot (by sequence number, the export's
  time-travel axis) -> manifest list (Avro) -> manifests (Avro) ->
  data-file entries, honoring entry status (EXISTING/ADDED vs
  DELETED);
- applies POSITION DELETE files (content=1 manifests, v2 row-level
  deletes): a delete file removes (file_path, pos) rows from data
  files whose data sequence number <= the delete file's;
- applies EQUALITY DELETE files (content=2 entries, the Flink-CDC
  write path): a delete row removes data rows whose values on the
  ``equality_ids`` columns match (null matches null), from data files
  whose data sequence number is STRICTLY below the delete file's (the
  spec's rule that lets one commit delete-by-key and re-insert the
  same key); a delete file stored with a partitioned spec applies
  only to data files in the same (spec, partition), an unpartitioned
  one applies globally;
- materializes rows with pyarrow: identity-partition values restored
  from the manifest partition record per the spec's types (date =
  days, timestamp/timestamptz = micros), committed column order,
  ``schema.name-mapping.default`` honored for parquet files written
  without Iceberg field ids;
- refuses loudly what it does not implement (format-version != 2,
  non-identity/non-bucket transforms, unknown Avro codecs).

INDEPENDENCE CONTRACT: this file must share NO code with
``operators.iceberg_interop`` or ``functions.avro_min`` — its Avro
container decoder below is a separate implementation of the public
Avro spec (schema compiled to decoder closures rather than
interpreted per datum). Do not import from either module here, and do
not "reuse" this module's helpers there: the exporter is verified by
round-trip (tests/test_iceberg_reader.py), so a shared bug would
un-prove the proof.

No Spark session needed — the reader is O(metadata + data) pyarrow.
"""

from __future__ import annotations

import json
import os
import struct
import zlib


class IcebergReadError(ValueError):
    """The tree is unreadable or uses a feature this reader refuses."""


# ----------------------------------------------------------- Avro
# Independent object-container decoder, written from the public Avro
# 1.x spec. Design: each (JSON) schema node is COMPILED once into a
# decoder closure over (buf, pos) -> (value, new_pos); container
# parsing then streams blocks through the compiled row decoder.


def _varlong(buf: bytes, pos: int) -> tuple[int, int]:
    """Zigzag varint -> (long, new_pos)."""
    shift = 0
    raw = 0
    while True:
        byte = buf[pos]
        pos += 1
        raw |= (byte & 0x7F) << shift
        if byte < 0x80:
            break
        shift += 7
    return (raw >> 1) ^ -(raw & 1), pos


def _compile(node):
    """Avro JSON schema node -> decoder closure (buf, pos) ->
    (value, pos)."""
    if isinstance(node, list):  # union: varint branch index
        branches = [_compile(b) for b in node]

        def d_union(buf, pos):
            idx, pos = _varlong(buf, pos)
            return branches[idx](buf, pos)

        return d_union
    name = node if isinstance(node, str) else node["type"]
    if name == "null":
        return lambda buf, pos: (None, pos)
    if name == "boolean":
        return lambda buf, pos: (buf[pos] == 1, pos + 1)
    if name in ("int", "long"):
        return _varlong
    if name == "float":
        return lambda buf, pos: (
            struct.unpack_from("<f", buf, pos)[0], pos + 4,
        )
    if name == "double":
        return lambda buf, pos: (
            struct.unpack_from("<d", buf, pos)[0], pos + 8,
        )
    if name in ("bytes", "string"):
        decode_utf8 = name == "string"

        def d_bytes(buf, pos):
            n, pos = _varlong(buf, pos)
            raw = buf[pos:pos + n]
            if len(raw) != n:
                raise IcebergReadError("truncated Avro datum")
            return (raw.decode("utf-8") if decode_utf8 else raw), pos + n

        return d_bytes
    if name == "fixed":
        size = int(node["size"])
        return lambda buf, pos: (buf[pos:pos + size], pos + size)
    if name == "record":
        members = [(f["name"], _compile(f["type"])) for f in node["fields"]]

        def d_record(buf, pos):
            out = {}
            for fname, dec in members:
                out[fname], pos = dec(buf, pos)
            return out, pos

        return d_record
    if name == "array":
        item = _compile(node["items"])

        def d_array(buf, pos):
            out = []
            while True:
                n, pos = _varlong(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:  # block with byte-size prefix
                    _, pos = _varlong(buf, pos)
                    n = -n
                for _ in range(n):
                    v, pos = item(buf, pos)
                    out.append(v)

        return d_array
    if name == "map":
        val = _compile(node["values"])

        def d_map(buf, pos):
            out = {}
            while True:
                n, pos = _varlong(buf, pos)
                if n == 0:
                    return out, pos
                if n < 0:
                    _, pos = _varlong(buf, pos)
                    n = -n
                for _ in range(n):
                    kn, pos = _varlong(buf, pos)
                    k = buf[pos:pos + kn].decode("utf-8")
                    pos += kn
                    out[k], pos = val(buf, pos)

        return d_map
    raise IcebergReadError(f"Avro type {name!r} not implemented")


def read_avro_file(path: str) -> list[dict]:
    """Decode an Avro object container file -> list of records.
    Codecs ``null`` and ``deflate`` (raw DEFLATE, per spec)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != b"Obj\x01":
        raise IcebergReadError(f"{path}: bad Avro container magic")
    pos = 4
    # file header metadata: a map<string, bytes>
    meta: dict[str, bytes] = {}
    while True:
        n, pos = _varlong(buf, pos)
        if n == 0:
            break
        if n < 0:
            _, pos = _varlong(buf, pos)
            n = -n
        for _ in range(n):
            kn, pos = _varlong(buf, pos)
            key = buf[pos:pos + kn].decode("utf-8")
            pos += kn
            vn, pos = _varlong(buf, pos)
            meta[key] = buf[pos:pos + vn]
            pos += vn
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise IcebergReadError(f"{path}: Avro codec {codec!r} refused")
    row = _compile(json.loads(meta["avro.schema"].decode("utf-8")))
    sync = buf[pos:pos + 16]
    pos += 16
    records: list[dict] = []
    while pos < len(buf):
        count, pos = _varlong(buf, pos)
        size, pos = _varlong(buf, pos)
        block = buf[pos:pos + size]
        pos += size
        if buf[pos:pos + 16] != sync:
            raise IcebergReadError(f"{path}: sync marker mismatch")
        pos += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        bp = 0
        for _ in range(count):
            rec, bp = row(block, bp)
            records.append(rec)
    return records


# ------------------------------------------------------- table reader


_EPOCH_DAY_TYPES = ("date",)
_MICROS_TYPES = ("timestamp", "timestamptz")


def _arrow_type(ice_type):
    import pyarrow as pa

    if isinstance(ice_type, dict):
        tt = ice_type["type"]
        if tt == "struct":
            return pa.struct(
                [
                    (f["name"], _arrow_type(f["type"]))
                    for f in ice_type["fields"]
                ]
            )
        if tt == "list":
            return pa.list_(_arrow_type(ice_type["element"]))
        if tt == "map":
            return pa.map_(
                _arrow_type(ice_type["key"]),
                _arrow_type(ice_type["value"]),
            )
        raise IcebergReadError(f"Iceberg type {tt!r} not implemented")
    if ice_type.startswith("decimal"):
        p, s = ice_type[ice_type.index("(") + 1:-1].split(",")
        return pa.decimal128(int(p), int(s))
    return {
        "int": pa.int32(),
        "long": pa.int64(),
        "string": pa.string(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us"),
        "timestamptz": pa.timestamp("us", tz="UTC"),
        "binary": pa.binary(),
    }.get(ice_type) or (_ for _ in ()).throw(
        IcebergReadError(f"Iceberg type {ice_type!r} not implemented")
    )


def _partition_scalar(raw, ice_type: str):
    """Manifest partition-record value -> python scalar of the
    column's logical type (spec: date = days from epoch, timestamps =
    micros from epoch)."""
    import datetime

    if raw is None:
        return None
    if ice_type in _EPOCH_DAY_TYPES:
        return datetime.date(1970, 1, 1) + datetime.timedelta(days=raw)
    if ice_type in _MICROS_TYPES:
        return datetime.datetime(1970, 1, 1) + datetime.timedelta(
            microseconds=raw
        )
    if isinstance(ice_type, str) and ice_type.startswith("decimal"):
        # spec: fixed-length big-endian two's-complement unscaled bytes
        from decimal import Decimal

        _, s = ice_type[ice_type.index("(") + 1:-1].replace(
            " ", ""
        ).split(",")
        return Decimal(
            int.from_bytes(raw, "big", signed=True)
        ).scaleb(-int(s))
    return raw


def _sv_deser(ice_type: str, b: bytes):
    """Single-value binary deserialization (spec Appendix D), this
    reader's own implementation — shares no code with the exporter."""
    if not isinstance(ice_type, str) or b is None:
        return None
    import datetime

    try:
        if ice_type == "int":
            return struct.unpack("<i", b)[0]
        if ice_type == "long":
            return struct.unpack("<q", b)[0]
        if ice_type == "float":
            return struct.unpack("<f", b)[0]
        if ice_type == "double":
            return struct.unpack("<d", b)[0]
        if ice_type == "boolean":
            return b != b"\x00"
        if ice_type == "string":
            return b.decode("utf-8")
        if ice_type == "date":
            return datetime.date(1970, 1, 1) + datetime.timedelta(
                days=struct.unpack("<i", b)[0]
            )
        if ice_type in ("timestamp", "timestamptz"):
            return datetime.datetime(1970, 1, 1) + datetime.timedelta(
                microseconds=struct.unpack("<q", b)[0]
            )
    except (ValueError, struct.error):
        return None
    return None


class IcebergSnapshot:
    """One snapshot's reconstructed file state."""

    def __init__(self, table_meta: dict, snap: dict):
        self.table_meta = table_meta
        self.snapshot = snap
        # the SNAPSHOT's schema (spec: snapshots record schema-id), so
        # time travel across schema evolution reads with the schema
        # the data was committed under; current-schema-id is the
        # fallback for writers that don't stamp snapshots
        sid = snap.get("schema-id", table_meta["current-schema-id"])
        self.schema = next(
            s for s in table_meta["schemas"] if s["schema-id"] == sid
        )
        specs = {
            s["spec-id"]: s["fields"]
            for s in table_meta["partition-specs"]
        }
        self.data_entries: list[dict] = []
        self.delete_entries: list[dict] = []
        self.eq_delete_entries: list[dict] = []
        import re as _re

        for mf in read_avro_file(snap["manifest-list"]):
            spec_fields = specs.get(mf["partition_spec_id"], [])
            for pf in spec_fields:
                # identity restores a column; bucket/truncate/date
                # transform values are derived (the source column is
                # IN the data file), so they participate in pruning
                # but not projection
                if pf["transform"] != "identity" and not _re.fullmatch(
                    r"bucket\[\d+\]|truncate\[\d+\]"
                    r"|year|month|day|hour",
                    pf["transform"],
                ):
                    raise IcebergReadError(
                        f"transform {pf['transform']!r} not implemented"
                    )
            for entry in read_avro_file(mf["manifest_path"]):
                if entry["status"] == 2:  # DELETED: not live
                    continue
                content = entry["data_file"].get("content", 0)
                entry["_spec_fields"] = spec_fields
                entry["_spec_id"] = mf["partition_spec_id"]
                if content == 2:
                    self.eq_delete_entries.append(entry)
                elif mf.get("content", 0) == 1 or content == 1:
                    self.delete_entries.append(entry)
                else:
                    self.data_entries.append(entry)

    # -- row-level deletes -------------------------------------------
    def _deleted_positions(self) -> dict[str, set]:
        """{data file_path: set(pos)} from position-delete files whose
        sequence number covers the data file (checked per data file in
        to_arrow)."""
        out: dict[str, set] = {}
        if not self.delete_entries:
            return out
        import pyarrow.parquet as pq

        for e in self.delete_entries:
            df = e["data_file"]
            if df["file_format"].upper() != "PARQUET":
                raise IcebergReadError(
                    f"delete file format {df['file_format']!r} refused"
                )
            t = pq.read_table(
                df["file_path"], columns=["file_path", "pos"]
            )
            seq = e["sequence_number"]
            for fp, p in zip(
                t.column("file_path").to_pylist(),
                t.column("pos").to_pylist(),
            ):
                out.setdefault(fp, set()).add((seq, int(p)))
        return out

    def _equality_deletes(self) -> list[dict]:
        """Loaded equality-delete files: per file the sequence number,
        the key FIELDS (schema entries for its equality_ids), the set
        of key tuples, and — when the delete was stored with a
        partitioned spec — the (spec_id, partition) scope; None scope
        means a global delete (spec rule)."""
        out: list[dict] = []
        if not self.eq_delete_entries:
            return out
        import pyarrow.parquet as pq

        by_id = {f["id"]: f for f in self.schema["fields"]}
        name_map = self._name_mapping()
        for e in self.eq_delete_entries:
            df = e["data_file"]
            if df["file_format"].upper() != "PARQUET":
                raise IcebergReadError(
                    f"delete file format {df['file_format']!r} refused"
                )
            ids = df.get("equality_ids") or []
            if not ids:
                raise IcebergReadError(
                    "equality delete file carries no equality_ids"
                )
            fields = []
            for fid in ids:
                f = by_id.get(fid)
                if f is None or not isinstance(f["type"], str):
                    raise IcebergReadError(
                        f"equality id {fid} does not resolve to a "
                        "top-level primitive column"
                    )
                fields.append(f)
            t = pq.read_table(df["file_path"])
            cols = [
                t.column(
                    self._resolve(t.column_names, f, name_map)
                ).to_pylist()
                for f in fields
            ]
            scoped = bool(e["_spec_fields"])
            out.append(
                {
                    "seq": e["sequence_number"],
                    "fields": fields,
                    "keys": set(zip(*cols)) if cols else set(),
                    "spec_id": e["_spec_id"] if scoped else None,
                    "partition": (
                        dict(df.get("partition") or {}) if scoped else None
                    ),
                }
            )
        return out

    def prune_files(self, column: str, op: str, value) -> list[str]:
        """Data-file paths whose exported lower/upper bounds ADMIT
        ``column <op> value`` — the data skipping a foreign Iceberg
        reader derives from our manifests. Files without bounds for
        the column are admitted (pruning must never drop rows).
        ``op`` in =, <, <=, >, >=. Value decoding is this module's own
        implementation of the spec's single-value serialization
        (Appendix D) — independent of the exporter's encoder, so an
        encoding bug there fails the pruning-parity test instead of
        round-tripping invisibly."""
        field = next(
            (f for f in self.schema["fields"] if f["name"] == column),
            None,
        )
        if field is None:
            raise IcebergReadError(f"no column {column!r}")
        fid, t = field["id"], field["type"]
        out = []
        for e in self.data_entries:
            df = e["data_file"]
            lo = next(
                (
                    kv["value"]
                    for kv in (df.get("lower_bounds") or [])
                    if kv["key"] == fid
                ),
                None,
            )
            hi = next(
                (
                    kv["value"]
                    for kv in (df.get("upper_bounds") or [])
                    if kv["key"] == fid
                ),
                None,
            )
            if lo is None or hi is None:
                out.append(df["file_path"])
                continue
            mn, mx = _sv_deser(t, lo), _sv_deser(t, hi)
            if mn is None or mx is None:
                out.append(df["file_path"])
                continue
            admit = {
                "=": mn <= value <= mx,
                "<": mn < value,
                "<=": mn <= value,
                ">": mx > value,
                ">=": mx >= value,
            }.get(op)
            if admit is None:
                raise IcebergReadError(f"op {op!r} not supported")
            if admit:
                out.append(df["file_path"])
        return sorted(out)

    def num_live_rows(self) -> int:
        return len(self.to_arrow())

    def to_arrow(self):
        """Materialize live rows: per-file parquet reads, position
        deletes masked out (delete seq >= data file's data seq),
        identity partition columns restored, committed column order,
        name-mapping honored for field resolution."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        fields = self.schema["fields"]
        name_map = self._name_mapping()
        deletes = self._deleted_positions()
        eq_deletes = self._equality_deletes()
        pieces = []
        for e in sorted(
            self.data_entries, key=lambda x: x["data_file"]["file_path"]
        ):
            df = e["data_file"]
            if df["file_format"].upper() != "PARQUET":
                raise IcebergReadError(
                    f"data file format {df['file_format']!r} refused"
                )
            t = pq.read_table(df["file_path"])
            data_seq = e["sequence_number"]
            part = df.get("partition") or {}
            part_names = {
                pf["name"]
                for pf in e["_spec_fields"]
                if pf["transform"] == "identity"
            }
            dead = {
                p
                for (dseq, p) in deletes.get(df["file_path"], ())
                if dseq >= data_seq
            }
            for ed in eq_deletes:
                # spec: strictly-older data only (same-sequence
                # delete+insert of one key must keep the insert)
                if ed["seq"] <= data_seq:
                    continue
                if ed["partition"] is not None and (
                    e["_spec_id"] != ed["spec_id"]
                    or dict(part) != ed["partition"]
                ):
                    continue
                vals = []
                for f in ed["fields"]:
                    if f["name"] in part_names:
                        # identity-partitioned key column: constant,
                        # not physically in the file
                        vals.append(
                            [
                                _partition_scalar(
                                    part.get(f["name"]), f["type"]
                                )
                            ]
                            * len(t)
                        )
                    else:
                        phys = self._resolve(
                            t.column_names, f, name_map,
                            optional_ok=not f.get("required", False),
                        )
                        vals.append(
                            t.column(phys).to_pylist()
                            if phys is not None
                            # key column added after this file: its
                            # rows hold null (matches only null keys)
                            else [None] * len(t)
                        )
                dead.update(
                    i
                    for i, key in enumerate(zip(*vals))
                    if key in ed["keys"]
                )
            if dead:
                mask = pa.array(
                    [i not in dead for i in range(len(t))],
                    type=pa.bool_(),
                )
                t = t.filter(mask)
            cols, names = [], []
            for f in fields:
                fname = f["name"]
                at = _arrow_type(f["type"])
                if fname in part_names:
                    cols.append(
                        pa.array(
                            [_partition_scalar(part.get(fname), f["type"])]
                            * len(t),
                            type=at,
                        )
                    )
                else:
                    phys = self._resolve(
                        t.column_names, f, name_map,
                        optional_ok=not f.get("required", False),
                    )
                    if phys is None:
                        # spec column projection: an optional column
                        # absent from an older data file reads as null
                        cols.append(pa.nulls(len(t), type=at))
                        names.append(fname)
                        continue
                    col = t.column(phys)
                    if col.type != at:
                        try:
                            col = col.cast(at)
                        except pa.lib.ArrowNotImplementedError:
                            # nested casts differing only in child
                            # field names (list<element> vs list<item>)
                            pass
                    cols.append(col)
                names.append(fname)
            pieces.append(pa.table(dict(zip(names, cols))))
        if not pieces:
            return pa.table(
                {
                    f["name"]: pa.array([], type=_arrow_type(f["type"]))
                    for f in fields
                }
            )
        return pa.concat_tables(pieces, promote_options="permissive")

    def to_rows(self) -> list[tuple]:
        """Sorted row tuples — the round-trip comparison currency."""
        t = self.to_arrow()
        return sorted(
            tuple(row[n] for n in t.column_names) for row in t.to_pylist()
        )

    # -- field resolution --------------------------------------------
    def _name_mapping(self) -> dict[int, list[str]]:
        """``schema.name-mapping.default`` -> {field-id: [names]} for
        parquet files written without Iceberg field ids (spec:
        "Column Projection" / name mapping)."""
        raw = (self.table_meta.get("properties") or {}).get(
            "schema.name-mapping.default"
        )
        if not raw:
            return {}
        return {
            m["field-id"]: list(m.get("names") or [])
            for m in json.loads(raw)
            if m.get("field-id") is not None
        }

    def _resolve(
        self,
        file_cols: list[str],
        field: dict,
        name_map: dict,
        optional_ok: bool = False,
    ) -> str | None:
        """Physical parquet column for a schema field, or None when
        the field is absent AND ``optional_ok`` (spec column
        projection: optional columns missing from older files read as
        nulls; a missing REQUIRED column is still a loud error)."""
        for cand in name_map.get(field["id"], []) + [field["name"]]:
            if cand in file_cols:
                return cand
        if optional_ok:
            return None
        raise IcebergReadError(
            f"column {field['name']!r} (field-id {field['id']}) not "
            f"resolvable in parquet columns {file_cols} — no matching "
            "name-mapping entry"
        )


class IcebergTable:
    """Filesystem-catalog (HadoopTables-convention) Iceberg v2 table."""

    def __init__(self, table_dir: str):
        self.meta_dir = os.path.join(table_dir, "metadata")
        hint = os.path.join(self.meta_dir, "version-hint.text")
        if os.path.exists(hint):
            with open(hint) as fh:
                n = int(fh.read().strip())
            path = os.path.join(self.meta_dir, f"v{n}.metadata.json")
        else:
            cands = sorted(
                (
                    f
                    for f in os.listdir(self.meta_dir)
                    if f.endswith(".metadata.json")
                ),
                key=lambda f: int(f[1:].split(".")[0]),
            )
            if not cands:
                raise IcebergReadError(
                    f"{self.meta_dir} holds no metadata.json"
                )
            path = os.path.join(self.meta_dir, cands[-1])
        with open(path) as fh:
            self.meta = json.load(fh)
        if self.meta.get("format-version") != 2:
            raise IcebergReadError(
                f"format-version {self.meta.get('format-version')!r}: "
                "this reader implements v2 only"
            )

    def sequence_numbers(self) -> list[int]:
        return sorted(
            s["sequence-number"] for s in self.meta["snapshots"]
        )

    def snapshot(
        self, sequence_number: int | None = None
    ) -> IcebergSnapshot:
        if sequence_number is None:
            snap = next(
                s
                for s in self.meta["snapshots"]
                if s["snapshot-id"] == self.meta["current-snapshot-id"]
            )
        else:
            try:
                snap = next(
                    s
                    for s in self.meta["snapshots"]
                    if s["sequence-number"] == sequence_number
                )
            except StopIteration:
                raise IcebergReadError(
                    f"no snapshot with sequence-number {sequence_number}"
                ) from None
        return IcebergSnapshot(self.meta, snap)

    def to_rows(self, sequence_number: int | None = None) -> list[tuple]:
        return self.snapshot(sequence_number).to_rows()
