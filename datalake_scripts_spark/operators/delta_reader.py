"""Minimal INDEPENDENT Delta Lake log reader (VERDICT r8 ask #3).

The sandbox has no ``deltalake`` (delta-rs) wheel, so export/import
conformance was previously provable only by hand-parsing the log with
the exporter's own vocabulary — a shape guess, not a proof. This
module is a read-only Delta client written from scratch against the
PUBLIC protocol description (github.com/delta-io/delta PROTOCOL.md):

- resolves ``_last_checkpoint`` and bootstraps from classic parquet
  checkpoints (single- and multi-part), then replays the JSON tail;
- replays ``protocol`` / ``metaData`` / ``add`` / ``remove`` actions
  to the active-file state at any version (time travel);
- materializes rows with pyarrow: per-file parquet reads, hive
  partition columns restored from ``add.partitionValues`` with
  Delta's string-serialization rules, column-mapping (``name`` mode)
  resolution from field metadata, committed column order;
- applies INLINE deletion vectors: Z85 decode + a from-scratch
  RoaringBitmapArray parser (portable format; array, bitmap, AND run
  containers — real Delta writers run-compress), masking deleted row
  positions out of each file read;
- refuses what it does not implement (readers > 2 without a known
  feature set, ``id`` mapping mode, v2/UUID checkpoints, on-disk
  ``u``/``p`` deletion vectors) loudly.

INDEPENDENCE CONTRACT: this file must share NO code with
``operators.delta_interop`` — separate JSON parsing, separate
checkpoint reading, separate schema handling. The exporter is
verified by ROUND-TRIP (tests/test_delta_reader.py): a table exported
by delta_interop must read back byte-equal through THIS reader, so an
exporter bug becomes a failing test instead of a guess. Keep it that
way: do not import from delta_interop here, and do not "reuse" this
module's helpers there.

No Spark session needed — the reader is O(log + data) pyarrow.
"""

from __future__ import annotations

import datetime
import json
import os
import re


class DeltaReadError(ValueError):
    """The log is unreadable or uses a feature this reader refuses."""


def _dv_uid(desc: dict | None) -> str | None:
    """Delta's deletion-vector unique id: storageType + pathOrInlineDv
    (+ "@offset" when present). File actions are reconciled by
    (path, dvUid) — a DV DML commit legally carries add{path, newDV}
    and remove{path, oldDV} for the SAME path in either line order
    (PROTOCOL.md "Add File and Remove File"; delta-spark's
    InMemoryLogReplay keys on this tuple)."""
    if not desc or desc.get("storageType") is None:
        return None
    uid = str(desc["storageType"]) + str(desc["pathOrInlineDv"])
    off = desc.get("offset")
    if off is not None:
        uid += f"@{off}"
    return uid


# ------------------------------------------------- deletion vectors
# Independent decode path — deliberately NOT shared with the
# exporter's codec in delta_interop (round-trip independence).

_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def _z85_to_bytes(text: str) -> bytes:
    if len(text) % 5:
        raise DeltaReadError(
            f"Z85 payload length {len(text)} is not a multiple of 5"
        )
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            if c not in _Z85_INDEX:
                raise DeltaReadError(f"invalid Z85 character {c!r}")
            n = n * 85 + _Z85_INDEX[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


def _parse_roaring_bitmap32(buf: bytes, pos: int):
    """One standard-serialization 32-bit roaring bitmap starting at
    ``pos`` -> (sorted values, next position). Handles array, bitmap,
    and run containers (RoaringFormatSpec)."""
    import struct

    cookie, = struct.unpack_from("<I", buf, pos)
    if cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        n, = struct.unpack_from("<I", buf, pos + 4)
        run_flags = [False] * n
        p = pos + 8
    elif (cookie & 0xFFFF) == 12347:  # SERIAL_COOKIE (run-capable)
        # cookie is unpacked unsigned here, so the shift alone is
        # safe, but mask anyway to keep both parsers literally
        # identical on this line (the interop twin unpacks signed)
        n = ((cookie >> 16) & 0xFFFF) + 1
        nbytes = (n + 7) // 8
        bits = buf[pos + 4: pos + 4 + nbytes]
        run_flags = [bool(bits[i // 8] >> (i % 8) & 1) for i in range(n)]
        p = pos + 4 + nbytes
    else:
        raise DeltaReadError(f"unknown roaring cookie {cookie}")
    desc = struct.unpack_from(f"<{2 * n}H", buf, p)
    p += 4 * n
    # offset header: always with cookie 12346; with runs only when
    # the container count reaches the spec's NO_OFFSET_THRESHOLD (4)
    if cookie == 12346 or n >= 4:
        p += 4 * n
    values: list[int] = []
    for i in range(n):
        key, card = desc[2 * i], desc[2 * i + 1] + 1
        base = key << 16
        if run_flags[i]:
            n_runs, = struct.unpack_from("<H", buf, p)
            p += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", buf, p)
            p += 4 * n_runs
            for r in range(n_runs):
                start, length = runs[2 * r], runs[2 * r + 1]
                values.extend(base + start + j for j in range(length + 1))
        elif card <= 4096:
            vals = struct.unpack_from(f"<{card}H", buf, p)
            p += 2 * card
            values.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, p)
            p += 8192
            values.extend(
                base + (wi << 6) + b
                for wi, w in enumerate(words)
                if w
                for b in range(64)
                if w >> b & 1
            )
    return values, p


def _ondisk_dv_bytes(table_dir: str, descriptor: dict) -> bytes:
    """On-disk DV descriptor ('u'/'p') -> the raw RoaringBitmapArray
    payload, independently of the writer (PROTOCOL.md "Deletion Vector
    File Storage Format"): the ``.bin`` file opens with a 1-byte
    format version (1); the blob at ``offset`` is <dataSize int32
    BE><bitmap><CRC-32 int32 BE>, both size and checksum verified."""
    import struct
    import uuid as _uuid
    import zlib

    st = descriptor["storageType"]
    if st == "p":
        path = descriptor["pathOrInlineDv"]
        if not os.path.isabs(path):
            path = os.path.join(table_dir, path)
    else:  # 'u': <randomPrefix><z85(uuid bytes), 20 chars>
        enc = descriptor["pathOrInlineDv"]
        if len(enc) < 20:
            raise DeltaReadError(f"storageType 'u' payload {enc!r}")
        prefix, enc_uuid = enc[:-20], enc[-20:]
        u = _uuid.UUID(bytes=_z85_to_bytes(enc_uuid))
        name = f"deletion_vector_{u}.bin"
        path = (
            os.path.join(table_dir, prefix, name)
            if prefix
            else os.path.join(table_dir, name)
        )
    with open(path, "rb") as fh:
        data = fh.read()
    if not data or data[0] != 1:
        raise DeltaReadError(f"{path}: bad DV file format version")
    off = int(descriptor.get("offset") or 1)
    (size,) = struct.unpack_from(">i", data, off)
    if size != int(descriptor["sizeInBytes"]):
        raise DeltaReadError(
            f"{path}@{off}: stored size {size} != descriptor "
            f"sizeInBytes {descriptor['sizeInBytes']}"
        )
    payload = data[off + 4: off + 4 + size]
    if len(payload) != size:
        raise DeltaReadError(f"{path}@{off}: truncated DV payload")
    (crc,) = struct.unpack_from(">I", data, off + 4 + size)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise DeltaReadError(f"{path}@{off}: DV checksum mismatch")
    return payload


def _deleted_positions(
    descriptor: dict, table_dir: str | None = None
) -> frozenset:
    """DV descriptor (inline 'i', or on-disk 'u'/'p' when
    ``table_dir`` is given) -> the set of deleted row positions."""
    import struct

    st = descriptor.get("storageType")
    if st == "i":
        raw = _z85_to_bytes(descriptor["pathOrInlineDv"])
        size = int(descriptor["sizeInBytes"])
        if size > len(raw):
            raise DeltaReadError(
                f"sizeInBytes {size} exceeds decoded payload {len(raw)}"
            )
        raw = raw[:size]
    elif st in ("u", "p") and table_dir is not None:
        raw = _ondisk_dv_bytes(table_dir, descriptor)
    else:
        raise DeltaReadError(
            f"deletion vector storageType {st!r} not readable here "
            "(inline 'i'; on-disk 'u'/'p' need the table dir)"
        )
    magic, n_bitmaps = struct.unpack_from("<iq", raw, 0)
    if magic != 1681511377:
        raise DeltaReadError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: set[int] = set()
    for hi in range(n_bitmaps):
        vals, pos = _parse_roaring_bitmap32(raw, pos)
        out.update((hi << 32) | v for v in vals)
    if len(out) != int(descriptor.get("cardinality", len(out))):
        raise DeltaReadError(
            f"descriptor cardinality {descriptor.get('cardinality')} "
            f"!= decoded {len(out)}"
        )
    return frozenset(out)


_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CP_SINGLE_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CP_MULTI_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)
_CP_V2_RE = re.compile(
    r"^(\d{20})\.checkpoint\.([0-9a-fA-F-]{36})\.(parquet|json)$"
)


class DeltaSnapshot:
    """Reconstructed state of a Delta table at one version."""

    def __init__(self, version, protocol, metadata, adds):
        self.version = version
        self.protocol = protocol
        self.metadata = metadata
        # {(path url-quoted as in the log, dvUid or None): add dict}
        self.adds = adds

    # -- schema ------------------------------------------------------
    @property
    def schema(self) -> dict:
        return json.loads(self.metadata["schemaString"])

    @property
    def partition_columns(self) -> list[str]:
        return list(self.metadata.get("partitionColumns") or [])

    def _mapping_mode(self) -> str:
        return (self.metadata.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )

    def _physical_name(self, field: dict) -> str:
        meta = field.get("metadata") or {}
        if self._mapping_mode() == "name":
            return meta.get(
                "delta.columnMapping.physicalName", field["name"]
            )
        return field["name"]

    # -- data --------------------------------------------------------
    def num_records(self) -> int | None:
        """LIVE row count: per-file ``stats.numRecords`` (physical)
        minus each file's deletion-vector cardinality — None if any
        active file lacks stats."""
        total = 0
        for add in self.adds.values():
            raw = add.get("stats")
            if not raw:
                return None
            total += int(json.loads(raw)["numRecords"])
            dv = add.get("deletionVector")
            if dv:
                total -= int(dv["cardinality"])
        return total

    def to_arrow(self, table_dir: str):
        """Materialize the snapshot as one pyarrow Table: committed
        column order, logical names, partition columns restored from
        ``partitionValues`` with Delta's string serialization rules."""
        import urllib.parse

        import pyarrow as pa
        import pyarrow.parquet as pq

        fields = self.schema.get("fields", [])
        part_cols = set(self.partition_columns)
        pieces = []
        for key in sorted(self.adds, key=lambda k: (k[0], k[1] or "")):
            add = self.adds[key]
            full = os.path.join(table_dir, urllib.parse.unquote(key[0]))
            t = pq.read_table(full)
            dv = add.get("deletionVector")
            if dv:
                dead = _deleted_positions(dv, table_dir)
                mask = pa.array(
                    [i not in dead for i in range(len(t))], type=pa.bool_()
                )
                t = t.filter(mask)
            cols, names = [], []
            pv = add.get("partitionValues") or {}
            for f in fields:
                name, phys = f["name"], self._physical_name(f)
                if name in part_cols or phys in pv or name in pv:
                    raw = pv.get(phys, pv.get(name))
                    cols.append(
                        pa.array(
                            [_decode_partition_value(raw, f["type"])]
                            * len(t),
                            type=_arrow_type(f["type"]),
                        )
                    )
                else:
                    if phys not in t.column_names:
                        if f.get("nullable", True):
                            # schema evolution: files written before a
                            # nullable column was added read it as null
                            # (delta-spark's read-time behavior)
                            cols.append(
                                pa.nulls(
                                    len(t), type=_arrow_type(f["type"])
                                )
                            )
                            names.append(name)
                            continue
                        raise DeltaReadError(
                            f"{full} lacks non-nullable column "
                            f"{phys!r} (logical {name!r})"
                        )
                    cols.append(t.column(phys))
                names.append(name)
            pieces.append(pa.table(dict(zip(names, cols))))
        if not pieces:
            return pa.table(
                {
                    f["name"]: pa.array([], type=_arrow_type(f["type"]))
                    for f in fields
                }
            )
        return pa.concat_tables(pieces, promote_options="permissive")

    def to_rows(self, table_dir: str) -> list[tuple]:
        """Sorted row tuples — the round-trip comparison currency."""
        t = self.to_arrow(table_dir)
        return sorted(
            tuple(row[name] for name in t.column_names)
            for row in t.to_pylist()
        )


def _arrow_type(type_name):
    import pyarrow as pa

    if not isinstance(type_name, str):
        # nested types never appear as partition columns and data
        # columns keep their file-borne type; null placeholder is fine
        return pa.null()
    return {
        "string": pa.string(),
        "long": pa.int64(),
        "integer": pa.int32(),
        "short": pa.int16(),
        "byte": pa.int8(),
        "double": pa.float64(),
        "float": pa.float32(),
        "boolean": pa.bool_(),
        "date": pa.date32(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
        "binary": pa.binary(),
    }.get(type_name, pa.string())


def _decode_partition_value(raw, type_name):
    """Delta PROTOCOL.md partition-value serialization: strings, with
    null encoded as a missing/NULL value (Spark's hive layer writes
    __HIVE_DEFAULT_PARTITION__)."""
    if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if type_name in ("long", "integer", "short", "byte"):
        return int(raw)
    if type_name in ("double", "float"):
        return float(raw)
    if type_name == "boolean":
        return raw == "true"
    if type_name == "date":
        return datetime.date.fromisoformat(raw)
    if type_name in ("timestamp", "timestamp_ntz"):
        return datetime.datetime.fromisoformat(raw)
    return raw


class DeltaLog:
    """A ``_delta_log`` directory, parsed independently of the writer."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir
        self.log_dir = os.path.join(table_dir, "_delta_log")
        if not os.path.isdir(self.log_dir):
            raise DeltaReadError(f"{self.log_dir} does not exist")

    # -- listing -----------------------------------------------------
    def _commit_versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.log_dir):
            m = _COMMIT_RE.match(n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _checkpoint_versions(self) -> dict[int, list[str]]:
        """version -> its parquet part files (sorted)."""
        singles: dict[int, list[str]] = {}
        multis: dict[int, dict[int, tuple[int, str]]] = {}
        for n in os.listdir(self.log_dir):
            m = _CP_SINGLE_RE.match(n)
            if m:
                singles[int(m.group(1))] = [n]
                continue
            m = _CP_V2_RE.match(n)
            if m:
                # V2 UUID-named manifest: any one is complete; keep the
                # lexicographically first for determinism
                v = int(m.group(1))
                if v not in singles or singles[v][0] > n:
                    singles[v] = [n]
                continue
            m = _CP_MULTI_RE.match(n)
            if m:
                v, part, of_n = (
                    int(m.group(1)), int(m.group(2)), int(m.group(3)),
                )
                multis.setdefault(v, {})[part] = (of_n, n)
        out = dict(singles)
        for v, parts in multis.items():
            of_ns = {of for of, _ in parts.values()}
            if len(of_ns) == 1 and len(parts) == of_ns.pop():
                out.setdefault(
                    v, [n for _, (_, n) in sorted(parts.items())]
                )
        return out

    def latest_version(self) -> int:
        commits = self._commit_versions()
        cps = self._checkpoint_versions()
        if not commits and not cps:
            raise DeltaReadError(f"{self.log_dir} holds no commits")
        return max(commits + list(cps))

    # -- replay ------------------------------------------------------
    def _apply_action(self, state: dict, action: dict) -> None:
        # adds are keyed by (path, dvUid): a remove cancels exactly the
        # file action carrying the SAME deletionVector — a bare remove
        # only cancels (path, None), per spec reconciliation semantics
        if "protocol" in action:
            state["protocol"] = action["protocol"]
        elif "metaData" in action:
            state["metadata"] = action["metaData"]
        elif "add" in action:
            a = action["add"]
            state["adds"][(a["path"], _dv_uid(a.get("deletionVector")))] = a
        elif "remove" in action:
            r = action["remove"]
            state["adds"].pop(
                (r["path"], _dv_uid(r.get("deletionVector"))), None
            )
        # commitInfo / txn / cdc / domainMetadata: no table-state effect

    def _load_checkpoint(self, state: dict, parts: list[str]) -> None:
        import pyarrow.parquet as pq

        def _file_rows(path: str) -> list[dict]:
            if path.endswith(".json"):
                with open(path) as fh:
                    return [json.loads(ln) for ln in fh if ln.strip()]
            return pq.read_table(path).to_pylist()

        for n in parts:
            rows = []
            for row in _file_rows(os.path.join(self.log_dir, n)):
                sc = row.get("sidecar")
                if sc and sc.get("path"):
                    # V2 checkpoint sidecar reference: file actions
                    # live in _delta_log/_sidecars/<path>
                    sc_path = sc["path"]
                    if not os.path.isabs(sc_path):
                        sc_path = os.path.join(
                            self.log_dir, "_sidecars", sc_path
                        )
                    rows.extend(_file_rows(sc_path))
                else:
                    rows.append(row)
            for row in rows:
                for key in ("protocol", "metaData", "add", "remove"):
                    val = row.get(key)
                    if not val:
                        continue
                    if key == "metaData":
                        val = dict(val)
                        val["configuration"] = dict(
                            val.get("configuration") or {}
                        )
                        fmt = dict(val.get("format") or {})
                        fmt["options"] = dict(fmt.get("options") or {})
                        val["format"] = fmt
                        val["partitionColumns"] = list(
                            val.get("partitionColumns") or []
                        )
                    if key == "add":
                        val = dict(val)
                        val["partitionValues"] = dict(
                            val.get("partitionValues") or {}
                        )
                    if key in ("add", "remove"):
                        val = dict(val)
                        # an all-null struct (non-nullable checkpoint
                        # column) is "no DV", not a descriptor
                        dv = val.get("deletionVector")
                        if not dv or dv.get("storageType") is None:
                            val.pop("deletionVector", None)
                    self._apply_action(state, {key: val})

    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        """Replay to ``version`` (default: latest): nearest usable
        checkpoint at-or-before it, then the JSON commits after it —
        exactly the bootstrap path PROTOCOL.md prescribes. Raises
        DeltaReadError when the history needed is gone (log-cleaned
        past the asked version) or a required feature is missing."""
        v = self.latest_version() if version is None else version
        commits = self._commit_versions()
        cps = self._checkpoint_versions()
        usable_cps = [c for c in cps if c <= v]
        # prefer the newest checkpoint <= v; fall back to pure JSON
        state = {
            "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
            "metadata": None,
            "adds": {},
        }
        start_after = -1
        if usable_cps:
            cp_v = max(usable_cps)
            self._load_checkpoint(state, cps[cp_v])
            start_after = cp_v
            tail = [c for c in commits if cp_v < c <= v]
        else:
            tail = [c for c in commits if c <= v]
            if tail and tail[0] != 0:
                raise DeltaReadError(
                    f"cannot reconstruct version {v}: JSON chain starts "
                    f"at {tail[0]} and no checkpoint <= {v} exists"
                )
        expected = list(range(start_after + 1, v + 1))
        if tail != expected:
            missing = sorted(set(expected) - set(tail))
            raise DeltaReadError(
                f"cannot reconstruct version {v}: missing commit(s) "
                f"{missing}"
            )
        for c in tail:
            with open(
                os.path.join(self.log_dir, f"{c:020d}.json")
            ) as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        self._apply_action(state, json.loads(line))
        proto = state["protocol"]
        if proto.get("minReaderVersion", 1) == 3:
            unknown = set(proto.get("readerFeatures") or []) - {
                "deletionVectors", "columnMapping", "v2Checkpoint",
            }
            if unknown:
                raise DeltaReadError(
                    f"unsupported reader feature(s) {sorted(unknown)}"
                )
        elif proto.get("minReaderVersion", 1) > 3:
            raise DeltaReadError(
                f"minReaderVersion {proto['minReaderVersion']} > 3: "
                "this reader implements readers 1-3 only"
            )
        if state["metadata"] is None:
            raise DeltaReadError(
                f"no metaData action found reconstructing version {v}"
            )
        mode = (state["metadata"].get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode not in ("none", "name"):
            raise DeltaReadError(
                f"columnMapping.mode {mode!r} not implemented "
                "(only 'none' and 'name')"
            )
        return DeltaSnapshot(
            v, proto, state["metadata"], state["adds"]
        )

    # -- conveniences ------------------------------------------------
    def to_arrow(self, version: int | None = None):
        return self.snapshot(version).to_arrow(self.table_dir)

    def to_rows(self, version: int | None = None) -> list[tuple]:
        return self.snapshot(version).to_rows(self.table_dir)
