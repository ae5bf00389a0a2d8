"""Delta Lake ``_delta_log`` interop (VERDICT r6 ask #2): export a
versioned table's commit history as a conforming Delta transaction log,
and import (adopt) an append-only Delta log into the versioned layer's
manifest chain — so a table written here can be handed to any
``_delta_log`` reader (delta-rs, Spark+Delta, DuckDB delta) and a
Delta table dropped into a directory can be read, time-traveled, and
written through :mod:`operators.versioned` without rewriting a byte of
data.

Format notes (public Delta PROTOCOL.md):

- One newline-delimited-JSON commit per version at
  ``_delta_log/%020d.json``; actions are single-key objects:
  ``protocol``, ``metaData``, ``add``, ``remove``, ``commitInfo``.
- ``metaData.schemaString`` is the JSON of a Spark ``StructType`` —
  byte-compatible with the ``schema`` field our manifests already
  store, so schema translation is an identity.
- ``add.stats`` is a JSON string ``{"numRecords", "minValues",
  "maxValues", "nullCount"}`` — the same footer-derived facts our
  per-file stats hold, reshaped.
- ``protocol`` is ``minReaderVersion=1/minWriterVersion=2`` on export
  (plain parquet + invariants-free appends: readable by every Delta
  client) until the history enables column mapping, at which point the
  export emits the 2/5 protocol upgrade + ``columnMapping.mode=name``
  metaData that delta-spark itself writes (field metadata
  ``delta.columnMapping.physicalName``/``.id`` translated from our
  ``physical``/``cid`` keys). Once deletion vectors enter the history,
  the export upgrades to the table-features protocol (3/7, explicit
  ``readerFeatures``/``writerFeatures``) and each DV'd file's ``add``
  carries an INLINE deletion-vector descriptor: the live positions
  serialized as a RoaringBitmapArray (portable format), Z85-encoded —
  previously refused, unlocked in r9 by the independent reader
  (operators/delta_reader.py) whose round-trip tests verify the
  encoding end-to-end. Imports accept reader versions 1 and 2
  (mapping mode ``name`` resolves by physicalName — our native
  resolution) and version 3 when every reader feature is implemented
  here (deletionVectors, columnMapping): inline DV descriptors
  decode into native DV parquets on adoption, so a DV'd export
  round-trips through import_delta_log too. On-disk ('u'/'p') DV
  descriptors — what delta-spark actually writes — import natively as
  of r11: the descriptor resolves to its ``.bin`` file (prefix + z85
  uuid for 'u', path for 'p'), the blob's size and CRC-32 verify, and
  the same RoaringBitmapArray payload decodes. Unknown features still
  refuse loudly.

Both directions are METADATA-ONLY — data files are shared in place,
so adopting or exporting a 100 TB table costs O(commits), not O(data).
:func:`sync_delta_log` keeps an exported log current incrementally
(only new commits written, table id reused; diff state replays from
the mirror's own tail, so vacuumed manifests and log-cleaned mirrors
sync fine), and classic parquet checkpoints are both WRITTEN
(:func:`write_delta_checkpoint`, pyarrow — no Spark session; always
single-part) and CONSUMED: an import of a checkpoint-truncated log
bootstraps from the newest checkpoint — single-part classic,
multi-part classic, or a V2 UUID-named manifest (parquet or ndjson)
whose sidecar references expand from ``_delta_log/_sidecars/`` — and
replays the JSON tail, exactly like a Delta reader.
``write_delta_checkpoint(v2=True)`` writes the V2 shape too.

Reference parity: the reference keeps all table state as bare
parquet prefixes on an object store (monkey_proc.py save paths); this
adapter is what lets that same layout graduate to a transactional,
ecosystem-readable lakehouse table.
"""

from __future__ import annotations

import json
import os
import time
import urllib.parse
import uuid

from .commitstore import get_commit_store
from .versioned import (
    _expand_manifest,
    _load_manifest,
    _manifest_name,
    _mapping_enabled,
    current_version,
)

_LOG_DIR = "_delta_log"


def _delta_schema_json(schema_json: dict) -> dict:
    """Our manifest schema -> the schema a Delta ``schemaString``
    carries: the mapping keys (``physical``/``cid``) become Delta's
    ``delta.columnMapping.physicalName`` / ``delta.columnMapping.id``
    field metadata (identity for unmapped tables). Without this, a
    Delta reader resolves renamed columns by logical name against
    files that store physical names and silently null-fills them
    (ADVICE r7 medium)."""
    if not _mapping_enabled(schema_json):
        return schema_json
    fields = []
    for f in schema_json["fields"]:
        meta = dict(f.get("metadata") or {})
        phys = meta.pop("physical", None) or f["name"]
        cid = meta.pop("cid", None)
        meta["delta.columnMapping.physicalName"] = phys
        if cid is not None:
            meta["delta.columnMapping.id"] = cid
        fields.append({**f, "metadata": meta})
    return {**schema_json, "fields": fields}


def _from_delta_schema_json(schema_json: dict) -> dict:
    """Inverse of :func:`_delta_schema_json`: Delta columnMapping field
    metadata -> our ``physical``/``cid`` keys."""
    fields = []
    for f in schema_json.get("fields", []):
        meta = dict(f.get("metadata") or {})
        phys = meta.pop("delta.columnMapping.physicalName", None)
        cid = meta.pop("delta.columnMapping.id", None)
        if phys is not None:
            meta["physical"] = phys
        if cid is not None:
            meta["cid"] = int(cid)
        fields.append({**f, "metadata": meta})
    return {**schema_json, "fields": fields}


def _delta_commit_name(version: int) -> str:
    return f"{version:020d}.json"


# --------------------------------------------------------------- DVs
# Inline deletion-vector export (public PROTOCOL.md "Deletion Vectors"
# + RoaringFormatSpec). The codec lives HERE, on the writer side; the
# independent reader (operators/delta_reader.py) carries its OWN
# parser, so an encoding bug fails the round-trip tests instead of
# cancelling out. Serialized form: RoaringBitmapArray "portable"
# (4-byte LE magic 1681511377, 8-byte LE bitmap count, then one
# standard 32-bit roaring bitmap per high-32-bit key) — array
# containers <= 4096 values, bitmap containers above, no run
# containers written. Inline descriptors Z85-encode the bytes
# (zero-padded to a multiple of 4; sizeInBytes recovers the true
# length).

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_ROARING_MAGIC = 1681511377
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE_RUN = 12347  # run-capable cookie (read side only)


def _z85_encode(data: bytes) -> str:
    pad = (-len(data)) % 4
    data = data + b"\x00" * pad
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _z85_decode(text: str) -> bytes:
    idx = {c: i for i, c in enumerate(_Z85_ALPHABET)}
    if len(text) % 5:
        raise ValueError(f"Z85 length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i:i + 5]:
            n = n * 85 + idx[c]
        out += n.to_bytes(4, "big")
    return bytes(out)


def _serialize_roaring32(values: list[int]) -> bytes:
    import struct

    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    out = struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, n)
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header (always present with the no-run cookie)
    pos = 8 + 4 * n + 4 * n
    offsets = []
    for k in keys:
        offsets.append(pos)
        pos += 2 * len(containers[k]) if len(containers[k]) <= 4096 else 8192
    out += struct.pack(f"<{n}I", *offsets) if n else b""
    for k in keys:
        vals = sorted(containers[k])
        if len(vals) <= 4096:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            out += struct.pack("<1024Q", *words)
    return out


def _serialize_positions(positions) -> bytes:
    """64-bit row positions -> RoaringBitmapArray portable bytes."""
    import struct

    by_high: dict[int, list[int]] = {}
    for p in sorted(set(int(x) for x in positions)):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n_bitmaps = (max(by_high) + 1) if by_high else 0
    out = struct.pack("<iq", _ROARING_MAGIC, n_bitmaps)
    for hi in range(n_bitmaps):
        out += _serialize_roaring32(by_high.get(hi, []))
    return out


def _deserialize_positions(buf: bytes) -> tuple[int, ...]:
    """Writer-side inverse (mirror replay needs prior DV signatures;
    on-disk DV import feeds foreign bitmaps through it too, so it
    accepts BOTH standard-serialization cookies — the run-capable
    SERIAL_COOKIE 12347 delta-spark may write, and the no-run 12346
    this exporter writes); the independent reader has its own parser."""
    import struct

    magic, n_bitmaps = struct.unpack_from("<iq", buf, 0)
    if magic != _ROARING_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for hi in range(n_bitmaps):
        cookie, = struct.unpack_from("<i", buf, pos)
        if cookie == _SERIAL_COOKIE_NO_RUN:
            has_run = False
            n, = struct.unpack_from("<i", buf, pos + 4)
            hdr = pos + 8
            run_flags = [False] * n
        elif (cookie & 0xFFFF) == _SERIAL_COOKIE_RUN:
            has_run = True
            # mask before shifting: the cookie word is unpacked as
            # SIGNED int32, so a legal bitmap with >= 32769 containers
            # sets bit 31 and the bare shift would go negative
            n = ((cookie >> 16) & 0xFFFF) + 1
            nbytes = (n + 7) // 8
            bitset = buf[pos + 4: pos + 4 + nbytes]
            run_flags = [
                bool(bitset[i >> 3] >> (i & 7) & 1) for i in range(n)
            ]
            hdr = pos + 4 + nbytes
        else:
            raise ValueError(f"unknown roaring cookie {cookie}")
        desc = struct.unpack_from(f"<{2 * n}H", buf, hdr)
        body = hdr + 4 * n
        if not has_run or n >= 4:  # offset header presence, per spec
            body += 4 * n
        for i in range(n):
            key, card = desc[2 * i], desc[2 * i + 1] + 1
            if run_flags[i]:
                n_runs, = struct.unpack_from("<H", buf, body)
                body += 2
                runs = struct.unpack_from(f"<{2 * n_runs}H", buf, body)
                body += 4 * n_runs
                vals = [
                    runs[2 * r] + j
                    for r in range(n_runs)
                    for j in range(runs[2 * r + 1] + 1)
                ]
            elif card <= 4096:
                vals = struct.unpack_from(f"<{card}H", buf, body)
                body += 2 * card
            else:
                words = struct.unpack_from("<1024Q", buf, body)
                body += 8192
                vals = [
                    (w_i << 6) | b
                    for w_i, w in enumerate(words)
                    if w
                    for b in range(64)
                    if w >> b & 1
                ]
            out.extend(
                (hi << 32) | (key << 16) | v for v in vals
            )
        pos = body
    return tuple(sorted(out))


def _dv_descriptor(positions) -> dict:
    raw = _serialize_positions(positions)
    return {
        "storageType": "i",
        "pathOrInlineDv": _z85_encode(raw),
        "sizeInBytes": len(raw),
        "cardinality": len(set(int(x) for x in positions)),
    }


def _dv_unique_id(desc: dict | None) -> str | None:
    """Delta's DV unique id (storageType + pathOrInlineDv + optional
    "@offset"). The spec reconciles file actions by (path, dvUid) —
    a DV DML commit carries add{path,newDV} + remove{path,oldDV} for
    one path, so replay MUST key on the tuple, and a remove for a
    DV'd file MUST carry the superseded descriptor or it only cancels
    the (path, None) entry (ADVICE r9, delta-spark InMemoryLogReplay)."""
    if not desc or desc.get("storageType") is None:
        return None
    uid = str(desc["storageType"]) + str(desc["pathOrInlineDv"])
    off = desc.get("offset")
    if off is not None:
        uid += f"@{off}"
    return uid


def _dv_file_path(table_dir: str, desc: dict) -> str:
    """Resolve an on-disk DV descriptor to its ``.bin`` file
    (PROTOCOL.md "Deletion Vector Descriptor Schema"): storageType
    'p' carries a path directly; 'u' packs ``<randomPrefix><z85 of the
    16-byte UUID>`` and the file is
    ``<table>/<prefix>/deletion_vector_<uuid>.bin``."""
    st = desc["storageType"]
    if st == "p":
        path = desc["pathOrInlineDv"]
        return path if os.path.isabs(path) else os.path.join(table_dir, path)
    enc = desc["pathOrInlineDv"]
    if len(enc) < 20:
        raise ValueError(f"storageType 'u' payload too short: {enc!r}")
    prefix, enc_uuid = enc[:-20], enc[-20:]
    u = uuid.UUID(bytes=_z85_decode(enc_uuid))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(table_dir, prefix, name) if prefix else os.path.join(
        table_dir, name
    )


def _read_ondisk_dv(table_dir: str, desc: dict) -> bytes:
    """One DV blob from its on-disk file (PROTOCOL.md "Deletion Vector
    File Storage Format"): the file opens with a 1-byte format version
    (= 1); each DV sits at the descriptor's ``offset`` as
    ``<dataSize int32 BE><bitmap bytes><CRC-32 of the bitmap, int32
    BE>``. Size and checksum are verified — a truncated or corrupt DV
    must fail the import, not silently un-delete rows."""
    import struct
    import zlib

    path = _dv_file_path(table_dir, desc)
    with open(path, "rb") as fh:
        data = fh.read()
    if not data or data[0] != 1:
        raise ValueError(
            f"{path}: bad deletion-vector file format version "
            f"{data[0] if data else 'empty'}"
        )
    off = int(desc.get("offset") or 1)
    (size,) = struct.unpack_from(">i", data, off)
    if size != int(desc["sizeInBytes"]):
        raise ValueError(
            f"{path}@{off}: stored DV size {size} != descriptor "
            f"sizeInBytes {desc['sizeInBytes']}"
        )
    payload = data[off + 4: off + 4 + size]
    if len(payload) != size:
        raise ValueError(f"{path}@{off}: truncated DV payload")
    (crc,) = struct.unpack_from(">I", data, off + 4 + size)
    if zlib.crc32(payload) & 0xFFFFFFFF != crc:
        raise ValueError(f"{path}@{off}: DV checksum mismatch")
    return payload


def _descriptor_positions(
    desc: dict, table_dir: str | None = None
) -> tuple[int, ...]:
    st = desc.get("storageType")
    if st == "i":
        raw = _z85_decode(desc["pathOrInlineDv"])[: desc["sizeInBytes"]]
    elif st in ("u", "p"):
        if table_dir is None:
            raise ValueError(
                f"on-disk deletion vector (storageType {st!r}) needs "
                "the table directory to resolve its file"
            )
        raw = _read_ondisk_dv(table_dir, desc)
    else:
        raise ValueError(
            f"deletion vector storageType {st!r} is not importable "
            "(inline 'i' and on-disk 'u'/'p' are supported)"
        )
    return _deserialize_positions(raw)


def _dv_positions(table_dir: str, manifest: dict) -> dict:
    """{file basename: sorted position tuple} for a snapshot's live
    deletion vectors — read with pyarrow (O(deleted rows), no Spark).
    The per-entry ``rows`` dict is authoritative for which bases an
    entry still applies to (rewrites drop bases via _carry_dvs)."""
    dvs = manifest.get("dvs") or []
    if not dvs:
        return {}
    import pyarrow.parquet as pq

    by_base: dict[str, set] = {}
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
                by_base.setdefault(b, set()).add(int(p))
    return {b: tuple(sorted(s)) for b, s in by_base.items()}


def _proto_action(mapped: bool, dv: bool) -> dict:
    """The protocol a table with these features needs: base (1,2),
    columnMapping (2,5), deletionVectors -> table features (3,7) with
    every reader/writer feature listed, as PROTOCOL.md requires."""
    if dv:
        feats = sorted(
            ["deletionVectors"] + (["columnMapping"] if mapped else [])
        )
        return {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": feats,
            "writerFeatures": feats,
        }
    if mapped:
        return {"minReaderVersion": 2, "minWriterVersion": 5}
    return {"minReaderVersion": 1, "minWriterVersion": 2}


def _partition_values(rel_path: str) -> dict:
    """Hive-style ``k=v`` directory segments of a staged file path ->
    Delta ``partitionValues`` (url-unquoted, the dialect Spark's
    partitioned writer produces)."""
    out = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            out[urllib.parse.unquote(k)] = urllib.parse.unquote(v)
    return out


def _delta_stats(
    file_stats: dict | None, tight: bool = True
) -> str | None:
    """Our per-file stats -> Delta ``add.stats`` JSON string. Columns
    recorded as None (no usable min/max) are omitted from min/max maps
    — Delta permits partial stats and readers treat absence as
    unprunable, matching our convention exactly. ``tight=False``
    (adds carrying a deletionVector) emits ``tightBounds: false``:
    the protocol's DV writer requirement — values stay physical-file,
    but metadata-only MIN/MAX/COUNT answers must not trust them, since
    the extremes may live in DV-deleted rows."""
    if not file_stats:
        return None
    mins, maxs, nulls = {}, {}, {}
    for col, cs in file_stats.get("columns", {}).items():
        if cs is None:
            continue
        mins[col] = cs["min"]
        maxs[col] = cs["max"]
        nulls[col] = cs["nulls"]
    out = {
        "numRecords": file_stats.get("rows", 0),
        "minValues": mins,
        "maxValues": maxs,
        "nullCount": nulls,
    }
    if not tight:
        out["tightBounds"] = False
    return json.dumps(out)


def export_delta_log(table_dir: str, out_dir: str | None = None) -> str:
    """Write ``<table_dir>/_delta_log/`` (or ``<out_dir>/_delta_log``)
    expressing the table's ENTIRE manifest history as Delta commits —
    version v maps to Delta commit v-1, so time travel carries over.
    Per commit: the file-set diff against the previous snapshot becomes
    ``add``/``remove`` actions (``dataChange=false`` for pure
    re-layout commits like OPTIMIZE, so streaming Delta readers skip
    them); ``metaData`` is re-emitted whenever the committed schema or
    partition spec changes. Returns the log directory path.

    Append-only object-store discipline: each commit file is staged and
    atomically renamed, never rewritten — an interrupted export leaves
    a readable prefix of history."""
    log_dir = os.path.join(out_dir or table_dir, _LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    _write_delta_commits(table_dir, log_dir, 1, str(uuid.uuid4()))
    return log_dir


def sync_delta_log(
    table_dir: str,
    out_dir: str | None = None,
    checkpoint_interval: int | None = None,
) -> int:
    """Incremental export: bring an existing ``_delta_log`` mirror up
    to the table's current manifest version, writing ONLY the commits
    not yet exported (the table id is reused from commit 0's metaData
    so readers see one continuous table). A fresh directory behaves
    like :func:`export_delta_log`. Returns the number of new Delta
    commits written.

    With ``checkpoint_interval=N``, a parquet checkpoint is written
    whenever the mirror crosses N commits since the last one — the
    cadence delta-spark uses (N=10) so long-lived mirrors stay cheap
    for readers to bootstrap."""
    log_dir = os.path.join(out_dir or table_dir, _LOG_DIR)
    latest = current_version(table_dir)
    if latest == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    existing = _list_commit_versions(log_dir)
    last_cp = _last_checkpoint_version(log_dir)
    if not existing and last_cp is None:
        export_delta_log(table_dir, out_dir)
        n_new = latest
    else:
        # diff state comes from the MIRROR's own tail, never from old
        # manifests: a vacuum (purge_rows runs one) may have dropped
        # every manifest older than the last export, and a log-cleaned
        # mirror may hold no commit 0 — bootstrap from the newest
        # checkpoint and replay the surviving JSON tail, exactly like
        # a Delta reader.
        if last_cp is not None and (not existing or existing[0] > 0):
            state = _read_checkpoint_state(log_dir, last_cp)
            tail = [c for c in existing if c > last_cp]
            state = _replay_json_chain(log_dir, tail, state=state)
            last_dv = max([last_cp] + tail)
        else:
            state = _replay_json_chain(log_dir, existing)
            last_dv = existing[-1]
        if last_dv + 1 > latest:
            raise ValueError(
                f"{log_dir} holds Delta commit {last_dv} but the table "
                f"only has {latest} manifest versions — the mirror is "
                "ahead of the table (wrong table_dir?)"
            )
        if state[1] is None:
            raise ValueError(
                f"{log_dir} has no metaData action in its surviving "
                "chain and no checkpoint — cannot determine the table "
                "id to continue the mirror"
            )
        table_id = state[1]["id"]
        _write_delta_commits(
            table_dir, log_dir, last_dv + 2, table_id, prior_state=state
        )
        n_new = latest - (last_dv + 1)
    if checkpoint_interval:
        last_cp = _last_checkpoint_version(log_dir)
        newest_dv = latest - 1
        if newest_dv - (last_cp if last_cp is not None else -1) \
                >= checkpoint_interval:
            write_delta_checkpoint(table_dir, out_dir)
    return n_new


def clean_delta_log(
    table_dir: str, out_dir: str | None = None, keep_last: int = 10
) -> dict:
    """Metadata cleanup for a ``_delta_log`` mirror (delta-spark's
    log-retention analog, the Delta twin of
    ``iceberg_interop.expire_iceberg_snapshots``): keep the newest
    ``keep_last`` JSON commits, make sure a parquet checkpoint covers
    everything older (writing one at the cut if needed — readers
    bootstrap checkpoint + JSON tail, so nothing a reader needs is
    ever removed), then delete the covered JSON commits and any older
    checkpoint parquets. Time travel below the cut stops working —
    the same documented trade delta-spark makes. Returns
    ``{"removed_json": n, "removed_checkpoints": m,
    "checkpoint_version": C}``.

    At 100 TB the motivation is identical to the Iceberg side: a
    15-minute cron sync accretes ~35k commit files a year, and every
    fresh reader LISTS the log directory before bootstrapping."""
    log_dir = os.path.join(out_dir or table_dir, _LOG_DIR)
    existing = _list_commit_versions(log_dir)
    if not existing:
        raise FileNotFoundError(f"{log_dir} holds no Delta commits")
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    latest = existing[-1]
    cut = latest - keep_last  # delete JSON commits <= cut
    removable = [c for c in existing if c <= cut]
    last_cp = _last_checkpoint_version(log_dir)
    if not removable:
        return {
            "removed_json": 0,
            "removed_checkpoints": 0,
            "checkpoint_version": last_cp,
        }
    if last_cp is None or last_cp < cut:
        write_delta_checkpoint(table_dir, out_dir, version=cut)
        last_cp = cut
    # the checkpoint at last_cp (>= cut here) replaces every JSON
    # commit <= it; honor keep_last by removing only <= cut
    removed_json = 0
    for c in removable:
        os.remove(os.path.join(log_dir, f"{c:020d}.json"))
        removed_json += 1
    removed_cp = 0
    for n in os.listdir(log_dir):
        if ".checkpoint" in n and n.endswith(".parquet"):
            v = int(n.split(".")[0])
            if v < last_cp:
                os.remove(os.path.join(log_dir, n))
                removed_cp += 1
    return {
        "removed_json": removed_json,
        "removed_checkpoints": removed_cp,
        "checkpoint_version": last_cp,
    }


def _list_commit_versions(log_dir: str) -> list[int]:
    if not os.path.isdir(log_dir):
        return []
    return sorted(
        int(n[:-5])
        for n in os.listdir(log_dir)
        if len(n) == 25 and n.endswith(".json") and n[:20].isdigit()
    )


def _write_delta_commits(
    table_dir: str,
    log_dir: str,
    start_v: int,
    table_id: str,
    prior_state: tuple | None = None,
) -> None:
    """Write Delta commits for manifest versions ``start_v``..latest.

    Fresh export (``start_v=1``, no ``prior_state``): diff state starts
    empty. Incremental sync: ``prior_state`` is the MIRROR's own
    replayed tail ``(protocol, metaData, {path: add})`` — manifests
    older than ``start_v`` are never read, so a vacuum that dropped
    them (``purge_rows`` runs one) cannot break the sync. A manifest
    inside ``start_v``..latest that a vacuum removed before it was ever
    synced is unrepresentable: its commit is emitted as a
    commitInfo-only VACUUM placeholder (keeping Delta versions
    contiguous and the manifest-v <-> commit-(v-1) mapping intact) and
    the next surviving manifest's diff carries the cumulative change —
    the same "old versions are gone" posture Delta's own log cleanup
    leaves readers with. Replay is metadata-only either way, so an
    incremental sync of a 100 TB table costs O(new commits)."""
    latest = current_version(table_dir)
    if latest == 0:
        raise FileNotFoundError(f"no committed version in {table_dir}")
    from .versioned import _load_manifest as _lm

    def _try_manifest(v: int) -> dict | None:
        try:
            return _lm(table_dir, v)
        except FileNotFoundError:
            return None

    manifests = {v: _try_manifest(v) for v in range(start_v, latest + 1)}
    now_ms = int(time.time() * 1000)

    if prior_state is None:
        prev_files: set[str] = set()
        prev_delta_schema: dict | None = None
        prev_spec: list | None = None
        prev_config: dict | None = None
        prev_dv: dict = {}
        mapped_already = False
        dv_already = False
    else:
        protocol, meta, active = prior_state
        prev_files = {urllib.parse.unquote(p) for (p, _dvid) in active}
        prev_delta_schema = (
            json.loads(meta["schemaString"]) if meta else None
        )
        prev_spec = list(meta.get("partitionColumns", [])) if meta else None
        prev_config = dict(meta.get("configuration") or {}) if meta else None
        rfeats = set(protocol.get("readerFeatures") or [])
        mapped_already = (
            protocol.get("minReaderVersion", 1) == 2
            or "columnMapping" in rfeats
        )
        dv_already = "deletionVectors" in rfeats
        # prior DV signatures: decode the mirror's own descriptors so a
        # stacked DV on an already-exported file diffs correctly (the
        # mirror root resolves on-disk descriptors, should the tail
        # carry foreign 'u'/'p' DVs)
        prev_dv = {
            urllib.parse.unquote(a["path"]): _descriptor_positions(
                a["deletionVector"], os.path.dirname(log_dir)
            )
            for a in active.values()
            if a.get("deletionVector")
        }
    for v in range(start_v, latest + 1):
        manifest = manifests[v]
        commit_path = os.path.join(log_dir, _delta_commit_name(v - 1))
        if manifest is None:
            # vacuumed before it was ever exported: placeholder commit,
            # state carries forward. If this would be commit 0, Delta
            # readers still need protocol+metaData there — borrow them
            # from the earliest surviving manifest (the pre-vacuum
            # schema is unknowable; the surviving one is the honest
            # stand-in and prevents a spurious re-emission later).
            actions = []
            if v == 1 and prior_state is None:
                surv = next(
                    m for vv in sorted(manifests) if (m := manifests[vv])
                )
                schema_json = surv.get("schema")
                if schema_json is None:
                    raise ValueError(
                        f"{table_dir} earliest surviving manifest has no "
                        "committed schema — a Delta metaData action "
                        "requires one"
                    )
                is_mapped = _mapping_enabled(schema_json)
                has_dv = bool(surv.get("dvs"))
                actions.append(
                    {"protocol": _proto_action(is_mapped, has_dv)}
                )
                mapped_already, dv_already = is_mapped, has_dv
                prev_delta_schema = _delta_schema_json(schema_json)
                prev_spec = list(surv.get("partition_spec") or [])
                config = {}
                if is_mapped:
                    config = {
                        "delta.columnMapping.mode": "name",
                        "delta.columnMapping.maxColumnId": str(
                            surv.get("max_column_id", 0)
                        ),
                    }
                if has_dv:
                    config["delta.enableDeletionVectors"] = "true"
                prev_config = config
                actions.append({"metaData": {
                    "id": table_id,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(prev_delta_schema),
                    "partitionColumns": prev_spec,
                    "configuration": config,
                    "createdTime": now_ms,
                }})
            actions.append({"commitInfo": {
                "operation": "VACUUM",
                "engineInfo": "datalake-scripts-spark delta-interop",
                "operationParameters": {
                    "note": "manifest vacuumed before sync; "
                            "state unchanged at this version"
                },
            }})
            tmp = os.path.join(log_dir, f".{_delta_commit_name(v - 1)}.tmp")
            with open(tmp, "w") as fh:
                fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
            os.replace(tmp, commit_path)
            continue
        files, stats = _expand_manifest(table_dir, manifest)
        schema_json = manifest.get("schema")
        if schema_json is None:
            raise ValueError(
                f"{table_dir}@v{v} has no committed schema — a Delta "
                "metaData action requires one"
            )
        spec = manifest.get("partition_spec") or []
        if any(isinstance(e, dict) for e in spec):
            raise ValueError(
                f"{table_dir}@v{v} uses transform (hidden) partitioning "
                f"{spec}; Delta expresses that as generated columns, "
                "which this exporter does not emit — re-layout with an "
                "identity spec (compact_versioned + evolve_partitioning) "
                "before export"
            )
        mode = manifest.get("mode", "append")
        # pure re-layout commits (OPTIMIZE / OPTIMIZE WHERE — the
        # full-table path records mode="overwrite" + meta.compaction_of)
        # keep rows identical: Delta streaming readers skip them via
        # dataChange=false
        is_relayout = (
            mode == "optimize"
            or "compaction_of" in manifest.get("meta", {})
        )
        if is_relayout:
            mode = "optimize"
        data_change = not is_relayout
        delta_schema = _delta_schema_json(schema_json)
        is_mapped = _mapping_enabled(schema_json)
        # live DV positions per file basename (pyarrow, O(deleted rows))
        dv_pos = _dv_positions(table_dir, manifest)
        cur = set(files)
        cur_dv = {
            f: dv_pos[os.path.basename(f)]
            for f in files
            if os.path.basename(f) in dv_pos
        }
        has_dv = bool(cur_dv)
        actions = []
        # protocol ladder: the commit where a feature first appears
        # emits the upgrade — 2/5 for columnMapping (what delta-spark
        # writes for ALTER TABLE ... columnMapping.mode=name), 3/7 with
        # explicit reader/writer feature lists once deletion vectors
        # enter (table-features protocol). Monotone: never downgraded,
        # even after DVs are materialized away.
        new_mapped = mapped_already or is_mapped
        new_dv = dv_already or has_dv
        proto = _proto_action(new_mapped, new_dv)
        if (v == 1 and prior_state is None) or proto != _proto_action(
            mapped_already, dv_already
        ):
            actions.append({"protocol": proto})
        mapped_already, dv_already = new_mapped, new_dv
        config = {}
        if is_mapped:
            config = {
                "delta.columnMapping.mode": "name",
                "delta.columnMapping.maxColumnId": str(
                    manifest.get("max_column_id", 0)
                ),
            }
        if dv_already:
            config["delta.enableDeletionVectors"] = "true"
        if (
            prev_delta_schema is None
            or delta_schema != prev_delta_schema
            or list(spec) != prev_spec
            or config != prev_config
        ):
            actions.append(
                {
                    "metaData": {
                        "id": table_id,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": json.dumps(delta_schema),
                        "partitionColumns": list(spec),
                        "configuration": config,
                        "createdTime": now_ms,
                    }
                }
            )
        actions.append(
            {
                "commitInfo": {
                    "operation": mode.upper(),
                    "engineInfo": "datalake-scripts-spark delta-interop",
                }
            }
        )
        # a carried file whose DV changed (stacked or materialized) is
        # re-added with its new descriptor — Delta's remove+add shape
        # for merge-on-read DML
        dv_changed = {
            f
            for f in (cur & prev_files)
            if prev_dv.get(f) != cur_dv.get(f)
        }
        for f in sorted((prev_files - cur) | dv_changed):
            rem = {
                "path": urllib.parse.quote(f),
                "deletionTimestamp": now_ms,
                # a DV change deletes rows even in a "relayout"
                "dataChange": data_change or f in dv_changed,
            }
            # the remove must name the descriptor it supersedes:
            # replay keys on (path, dvUid), so a bare remove would
            # leave the old (path, oldDV) add live — resurrected rows
            # in any spec-keyed reader (ADVICE r9 high)
            if prev_dv.get(f):
                rem["deletionVector"] = _dv_descriptor(prev_dv[f])
            actions.append({"remove": rem})
        for f in sorted((cur - prev_files) | dv_changed):
            full = os.path.join(table_dir, f)
            st = os.stat(full)
            add = {
                "path": urllib.parse.quote(f),
                "partitionValues": _partition_values(f),
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                "dataChange": data_change or f in dv_changed,
            }
            if f in cur_dv:
                add["deletionVector"] = _dv_descriptor(cur_dv[f])
            dstats = _delta_stats(stats.get(f), tight=f not in cur_dv)
            if dstats is not None:
                add["stats"] = dstats
            actions.append({"add": add})
        tmp = os.path.join(log_dir, f".{_delta_commit_name(v - 1)}.tmp")
        with open(tmp, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        os.replace(tmp, commit_path)
        prev_files, prev_dv = cur, cur_dv
        prev_delta_schema, prev_spec = delta_schema, list(spec)
        prev_config = config


def export_delta_snapshot(
    spark, table_dir: str, out_dir: str, version: int | None = None
) -> str:
    """The escape hatch for histories :func:`export_delta_log` refuses
    (transform partition specs) or whose export a consumer can't read
    (DV'd histories need a deletionVectors-capable reader — protocol
    3/7): materialize snapshot ``version`` — DVs applied, hidden
    layout dropped — into a self-contained one-commit base-protocol
    table at ``out_dir`` and export its log. O(live data), no
    pre-snapshot time travel in the export; the snapshot provenance is
    recorded in the commit meta."""
    from .versioned import (
        current_version,
        read_versioned,
        write_versioned,
    )

    v = version or current_version(table_dir)
    snap = read_versioned(spark, table_dir, version=v)
    write_versioned(
        spark, snap, out_dir, mode="append",
        meta={"snapshot_of": table_dir, "snapshot_version": v},
    )
    return export_delta_log(out_dir)


def _checkpoint_name(version: int) -> str:
    return f"{version:020d}.checkpoint.parquet"


def _last_checkpoint_version(log_dir: str) -> int | None:
    p = os.path.join(log_dir, "_last_checkpoint")
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return int(json.load(fh)["version"])


def _replay_json_chain(
    log_dir: str, commits: list[int], state: tuple | None = None
) -> tuple:
    """Replay a contiguous JSON chain to its final state: (protocol
    action dict, metaData action dict, {(path, dvUid): add action}).
    File actions are keyed by (path, deletionVector uniqueId) — the
    spec's reconciliation key, which makes intra-commit add/remove
    line order irrelevant for DV DML. ``state`` seeds the replay (a
    checkpoint's reconstructed state, for log-cleaned directories
    whose JSON no longer starts at 0)."""
    if state is not None:
        protocol, meta, active = state
        active = dict(active)
    else:
        protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
        meta = None
        active = {}
    for dv in commits:
        with open(os.path.join(log_dir, _delta_commit_name(dv))) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    key = (a["path"], _dv_unique_id(a.get("deletionVector")))
                    active[key] = a
                elif "remove" in action:
                    r = action["remove"]
                    active.pop(
                        (r["path"], _dv_unique_id(r.get("deletionVector"))),
                        None,
                    )
    return protocol, meta, active


def write_delta_checkpoint(
    table_dir: str, out_dir: str | None = None, version: int | None = None,
    v2: bool = False,
) -> str:
    """Write a Delta parquet checkpoint (+ ``_last_checkpoint``) at
    ``version`` (default: the newest exported commit): one row per
    reconstructed action — the latest ``protocol`` and ``metaData``
    plus every active ``add`` — in the single-part classic checkpoint
    shape every Delta reader bootstraps from. Written with pyarrow (no
    Spark session needed: the checkpoint is metadata, O(files) not
    O(data)). Returns the checkpoint file path.

    ``v2=True`` writes the V2 (UUID-named) checkpoint shape instead
    (PROTOCOL.md "V2 Spec"): the top-level
    ``<v>.checkpoint.<uuid>.parquet`` carries ``checkpointMetadata`` +
    ``protocol`` + ``metaData`` + one ``sidecar`` reference per sidecar
    file, and the file actions live in ``_delta_log/_sidecars/<uuid>.
    parquet``. Because a table carrying a v2 checkpoint must advertise
    the ``v2Checkpoint`` reader feature, the checkpoint's protocol row
    is upgraded to the table-features protocol with that feature merged
    in (both this module's importer and the independent reader accept
    it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(out_dir or table_dir, _LOG_DIR)
    commits = _list_commit_versions(log_dir)
    if not commits:
        raise FileNotFoundError(f"{log_dir} holds no commit JSON files")
    v = commits[-1] if version is None else version
    last_cp = _last_checkpoint_version(log_dir)
    if commits[0] == 0 and v in commits:
        protocol, meta, active = _replay_json_chain(
            log_dir, [c for c in commits if c <= v]
        )
    elif last_cp is not None and last_cp <= v:
        # log-cleaned directory (no commit 0): bootstrap from the
        # newest checkpoint and replay the surviving JSON tail — the
        # same path a Delta reader takes
        state = _read_checkpoint_state(log_dir, last_cp)
        protocol, meta, active = _replay_json_chain(
            log_dir, [c for c in commits if last_cp < c <= v], state=state
        )
    else:
        raise ValueError(
            f"checkpoint at {v} needs the contiguous JSON chain 0..{v} "
            f"in {log_dir}, or a prior checkpoint to bootstrap from"
        )
    if meta is None:
        raise ValueError(f"{log_dir} chain 0..{v} has no metaData action")

    def _map(d):
        return list((d or {}).items())

    str_map = pa.map_(pa.string(), pa.string())
    dv_t = pa.struct([
        ("storageType", pa.string()),
        ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()),
        ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", str_map),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("stats", pa.string()),
        ("tags", str_map),
        ("deletionVector", dv_t),
    ])
    meta_t = pa.struct([
        ("id", pa.string()),
        ("name", pa.string()),
        ("description", pa.string()),
        ("format", pa.struct([
            ("provider", pa.string()),
            ("options", str_map),
        ])),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", str_map),
        ("createdTime", pa.int64()),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()),
        ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])
    remove_t = pa.struct([
        ("path", pa.string()),
        ("deletionTimestamp", pa.int64()),
        ("dataChange", pa.bool_()),
    ])
    txn_t = pa.struct([
        ("appId", pa.string()),
        ("version", pa.int64()),
        ("lastUpdated", pa.int64()),
    ])
    schema = pa.schema([
        ("txn", txn_t),
        ("add", add_t),
        ("remove", remove_t),
        ("metaData", meta_t),
        ("protocol", proto_t),
    ])
    rows: list[dict] = [
        {"protocol": {
            "minReaderVersion": protocol.get("minReaderVersion", 1),
            "minWriterVersion": protocol.get("minWriterVersion", 2),
            "readerFeatures": protocol.get("readerFeatures"),
            "writerFeatures": protocol.get("writerFeatures"),
        }},
        {"metaData": {
            "id": meta["id"],
            "name": meta.get("name"),
            "description": meta.get("description"),
            "format": {
                "provider": meta.get("format", {}).get("provider", "parquet"),
                "options": _map(meta.get("format", {}).get("options")),
            },
            "schemaString": meta["schemaString"],
            "partitionColumns": list(meta.get("partitionColumns", [])),
            "configuration": _map(meta.get("configuration")),
            "createdTime": meta.get("createdTime"),
        }},
    ]
    for key in sorted(active, key=lambda k: (k[0], k[1] or "")):
        add = active[key]
        dv = add.get("deletionVector")
        rows.append({"add": {
            "path": add["path"],
            "partitionValues": _map(add.get("partitionValues")),
            "size": int(add.get("size", 0)),
            "modificationTime": int(add.get("modificationTime", 0)),
            "dataChange": bool(add.get("dataChange", True)),
            "stats": add.get("stats"),
            "tags": _map(add.get("tags")) if add.get("tags") else None,
            "deletionVector": {
                "storageType": dv["storageType"],
                "pathOrInlineDv": dv["pathOrInlineDv"],
                "offset": dv.get("offset"),
                "sizeInBytes": int(dv["sizeInBytes"]),
                "cardinality": int(dv["cardinality"]),
            } if dv else None,
        }})
    if not v2:
        table = pa.Table.from_pylist(rows, schema=schema)
        cp_path = os.path.join(log_dir, _checkpoint_name(v))
        tmp = cp_path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, cp_path)
        lc_tmp = os.path.join(log_dir, "._last_checkpoint.tmp")
        with open(lc_tmp, "w") as fh:
            json.dump({"version": v, "size": len(rows)}, fh)
        os.replace(lc_tmp, os.path.join(log_dir, "_last_checkpoint"))
        return cp_path

    # ---- V2 shape: sidecar file(s) + UUID-named top-level manifest
    header, file_actions = rows[:2], rows[2:]

    # PROTOCOL.md allows v2 checkpoints only on tables whose COMMITTED
    # protocol advertises the v2Checkpoint feature — upgrading just the
    # checkpoint's protocol row would let log-replay readers and
    # checkpoint-bootstrap readers see different protocols, and a
    # reader honoring _last_checkpoint without v2 support would hit
    # the UUID manifest with no protocol gate (ADVICE r11). If the
    # table doesn't advertise it yet, COMMIT the upgrade at v+1 and
    # checkpoint that version; refuse for historical versions (a
    # protocol action can't be inserted retroactively mid-chain).
    if "v2Checkpoint" not in set((protocol or {}).get("readerFeatures") or []):
        if v != commits[-1]:
            raise ValueError(
                f"cannot write a v2 checkpoint at historical version {v}: "
                "the table protocol does not advertise the v2Checkpoint "
                "feature there, and the upgrade commit can only land at "
                "the head — checkpoint the head, or pre-upgrade the table"
            )
        proto_row = dict(rows[0]["protocol"])
        implied_r = {1: [], 2: ["columnMapping"]}.get(
            proto_row.get("minReaderVersion", 1),
            proto_row.get("readerFeatures") or [],
        )
        implied_w = {
            2: ["appendOnly", "invariants"],
            5: ["appendOnly", "invariants", "columnMapping"],
        }.get(
            proto_row.get("minWriterVersion", 2),
            proto_row.get("writerFeatures") or [],
        )
        upgraded = {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": sorted(set(implied_r) | {"v2Checkpoint"}),
            "writerFeatures": sorted(set(implied_w) | {"v2Checkpoint"}),
        }
        new_v = v + 1
        commit_path = os.path.join(log_dir, f"{new_v:020d}.json")
        if os.path.exists(commit_path):
            raise FileExistsError(
                f"{commit_path} already exists — concurrent writer?"
            )
        tmp_commit = commit_path + ".tmp"
        with open(tmp_commit, "w") as fh:
            fh.write(json.dumps({"commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "UPGRADE PROTOCOL",
                "operationParameters": {},
            }}) + "\n")
            fh.write(json.dumps({"protocol": upgraded}) + "\n")
        os.replace(tmp_commit, commit_path)
        v = new_v
        header[0] = {"protocol": upgraded}
    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)
    sc_name = f"{uuid.uuid4()}.parquet"
    sc_schema = pa.schema([("add", add_t), ("remove", remove_t)])
    sc_tmp = os.path.join(sc_dir, sc_name + ".tmp")
    pq.write_table(
        pa.Table.from_pylist(file_actions, schema=sc_schema), sc_tmp
    )
    sc_path = os.path.join(sc_dir, sc_name)
    os.replace(sc_tmp, sc_path)

    cpmeta_t = pa.struct([
        ("version", pa.int64()),
        ("tags", str_map),
    ])
    sidecar_t = pa.struct([
        ("path", pa.string()),
        ("sizeInBytes", pa.int64()),
        ("modificationTime", pa.int64()),
        ("tags", str_map),
    ])
    v2_schema = pa.schema([
        ("txn", txn_t),
        ("add", add_t),
        ("remove", remove_t),
        ("metaData", meta_t),
        ("protocol", proto_t),
        ("checkpointMetadata", cpmeta_t),
        ("sidecar", sidecar_t),
    ])
    v2_rows = [
        {"checkpointMetadata": {"version": v, "tags": None}},
        *header,
        {"sidecar": {
            "path": sc_name,
            "sizeInBytes": os.path.getsize(sc_path),
            "modificationTime": int(time.time() * 1000),
            "tags": None,
        }},
    ]
    cp_name = f"{v:020d}.checkpoint.{uuid.uuid4()}.parquet"
    cp_path = os.path.join(log_dir, cp_name)
    tmp = cp_path + ".tmp"
    pq.write_table(pa.Table.from_pylist(v2_rows, schema=v2_schema), tmp)
    os.replace(tmp, cp_path)
    lc_tmp = os.path.join(log_dir, "._last_checkpoint.tmp")
    with open(lc_tmp, "w") as fh:
        json.dump({"version": v, "size": len(rows)}, fh)
    os.replace(lc_tmp, os.path.join(log_dir, "_last_checkpoint"))
    return cp_path


def _checkpoint_files(log_dir: str, v: int) -> list[str]:
    """The file(s) of the checkpoint at version ``v``: the classic
    single-part name, a V2 UUID-named manifest
    (``%020d.checkpoint.<uuid>.{parquet,json}`` — its sidecar
    references expand during state read), else the multi-part classic
    family ``%020d.checkpoint.%010d.%010d.parquet`` (every part must
    be present)."""
    single = os.path.join(log_dir, _checkpoint_name(v))
    if os.path.exists(single):
        return [single]
    prefix = f"{v:020d}.checkpoint."
    # V2 (UUID-named): 4 dot-fields, third is the UUID (non-numeric)
    v2 = sorted(
        n
        for n in os.listdir(log_dir)
        if n.startswith(prefix)
        and (n.endswith(".parquet") or n.endswith(".json"))
        and len(n.split(".")) == 4
        and not n.split(".")[2].isdigit()
    )
    if v2:
        # any one manifest is complete; take the lexicographically
        # first for determinism
        return [os.path.join(log_dir, v2[0])]
    parts = sorted(
        n
        for n in os.listdir(log_dir)
        # <v>.checkpoint.<part>.<of_n>.parquet -> 5 dot-fields
        if n.startswith(prefix)
        and n.endswith(".parquet")
        and len(n.split(".")) == 5
        and n.split(".")[2].isdigit()
        and n.split(".")[3].isdigit()
    )
    if not parts:
        raise ValueError(
            f"_last_checkpoint points at version {v} but "
            f"{_checkpoint_name(v)} (or its multi-part / v2 family) "
            "is missing"
        )
    n_declared = {int(n.split(".")[3]) for n in parts}  # the of-N field
    if len(n_declared) != 1 or len(parts) != n_declared.pop():
        raise ValueError(
            f"multi-part checkpoint at version {v} is incomplete in "
            f"{log_dir}: found {len(parts)} part file(s)"
        )
    return [os.path.join(log_dir, n) for n in parts]


def _read_checkpoint_state(log_dir: str, v: int) -> tuple:
    """Load (protocol, metaData, {(path, dvUid): add}) from the
    checkpoint at version ``v`` — classic single-/multi-part parquet,
    or a V2 UUID-named manifest (parquet or ndjson) whose ``sidecar``
    references expand from ``_delta_log/_sidecars/`` (r10 ask #4:
    previously refused)."""
    import pyarrow.parquet as pq

    protocol = {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = None
    active: dict[str, dict] = {}

    def _unmap(v):
        if v is None:
            return {}
        return dict(v) if not isinstance(v, dict) else v

    def _file_rows(path: str) -> list[dict]:
        if path.endswith(".json"):
            with open(path) as fh:
                return [json.loads(ln) for ln in fh if ln.strip()]
        return pq.read_table(path).to_pylist()

    rows = []
    for cp_path in _checkpoint_files(log_dir, v):
        for row in _file_rows(cp_path):
            sc = row.get("sidecar")
            if sc and sc.get("path"):
                sc_path = sc["path"]
                if not os.path.isabs(sc_path):
                    sc_path = os.path.join(log_dir, "_sidecars", sc_path)
                rows.extend(_file_rows(sc_path))
            else:
                rows.append(row)
    for row in rows:
        if row.get("protocol"):
            protocol = {
                k: v for k, v in row["protocol"].items() if v is not None
            }
        if row.get("metaData"):
            m = dict(row["metaData"])
            m["configuration"] = _unmap(m.get("configuration"))
            fmt = m.get("format") or {}
            m["format"] = {
                "provider": (fmt.get("provider") or "parquet"),
                "options": _unmap(fmt.get("options")),
            }
            m["partitionColumns"] = list(m.get("partitionColumns") or [])
            meta = m
        if row.get("add"):
            add = dict(row["add"])
            add["partitionValues"] = _unmap(add.get("partitionValues"))
            dv = add.get("deletionVector")
            if not dv or dv.get("storageType") is None:
                add.pop("deletionVector", None)
            active[
                (add["path"], _dv_unique_id(add.get("deletionVector")))
            ] = add
    if meta is None:
        raise ValueError(f"{cp_path} carries no metaData row")
    return protocol, meta, active


def _manifest_stats(add: dict) -> dict | None:
    """Delta ``add.stats`` JSON string -> our per-file stats dict.
    Columns present in nullCount but absent from min/max become None
    (unprunable) — the exact inverse of :func:`_delta_stats`."""
    raw = add.get("stats")
    if not raw:
        return None
    try:
        d = json.loads(raw)
    except (TypeError, ValueError):
        return None
    mins = d.get("minValues", {}) or {}
    maxs = d.get("maxValues", {}) or {}
    nulls = d.get("nullCount", {}) or {}
    cols: dict = {}
    for col in set(mins) | set(maxs) | set(nulls):
        if col in mins and col in maxs:
            cols[col] = {
                "min": mins[col],
                "max": maxs[col],
                "nulls": int(nulls.get(col, 0)),
            }
        else:
            cols[col] = None
    return {"rows": int(d.get("numRecords", 0)), "columns": cols}


def _import_metadata(meta: dict, cur_max_cid: int) -> tuple:
    """Validate + translate a Delta metaData action into (our schema
    JSON, partition spec, max column id)."""
    config = meta.get("configuration") or {}
    cm_mode = config.get("delta.columnMapping.mode", "none")
    if cm_mode not in ("none", "name"):
        raise ValueError(
            f"delta.columnMapping.mode={cm_mode!r} resolves columns by "
            "parquet field id; this importer supports modes 'none' and "
            "'name' only"
        )
    schema_json = _from_delta_schema_json(json.loads(meta["schemaString"]))
    spec = list(meta.get("partitionColumns", []))
    max_cid = max(
        int(config.get("delta.columnMapping.maxColumnId", 0)),
        max(
            (
                (f.get("metadata") or {}).get("cid", 0)
                for f in schema_json["fields"]
            ),
            default=0,
        ),
        cur_max_cid,
    )
    return schema_json, spec, max_cid


def _check_reader_protocol(proto: dict) -> None:
    """Importer protocol gate: base (1), columnMapping (2), and the
    table-features protocol (3) when every reader feature is one we
    implement — deletionVectors (descriptors, inline or on-disk,
    materialize into native DV parquets on adoption), columnMapping,
    and v2Checkpoint (UUID-named manifests + sidecars)."""
    mrv = proto.get("minReaderVersion", 1)
    if mrv == 3:
        feats = proto.get("readerFeatures")
        if feats is None:
            raise ValueError(
                "Delta protocol minReaderVersion 3 without a "
                "readerFeatures list is malformed (the table-features "
                "protocol requires it) — refusing to guess"
            )
        unknown = set(feats) - {
            "deletionVectors", "columnMapping", "v2Checkpoint",
        }
        if unknown:
            raise ValueError(
                f"Delta reader feature(s) {sorted(unknown)} are not "
                "implemented by this importer"
            )
    elif mrv > 3:
        raise ValueError(
            f"Delta protocol minReaderVersion {mrv} is not implemented "
            "by this importer (readers 1-3 with known features only)"
        )


def _materialize_dvs(table_dir: str, dv_map: dict) -> list:
    """Decode deletion-vector descriptors ({data rel/abs path:
    descriptor}) into ONE native DV parquet under data/ (pyarrow — the
    import stays sessionless) and return the manifest ``dvs`` entry
    list. Inline ('i') descriptors decode from the action itself;
    on-disk ('u'/'p') descriptors — what delta-spark actually writes —
    resolve to their ``.bin`` file, verify size + CRC-32, and decode
    the same RoaringBitmapArray payload (r10 ask #4: previously
    refused)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    bases: list[str] = []
    poss: list[int] = []
    rows: dict[str, int] = {}
    for rel, desc in sorted(dv_map.items()):
        positions = _descriptor_positions(desc, table_dir)
        base = os.path.basename(rel)
        rows[base] = len(positions)
        bases.extend([base] * len(positions))
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


def _collapse_active(active: dict) -> dict:
    """{(path, dvUid): (stats, dv)} -> {path: (stats, dv)}. After any
    complete commit a valid log has at most one live entry per path
    (DV DML removes the superseded (path, oldDV) entry in the same
    commit); two surviving entries mean the writer emitted a bare
    remove for a DV'd file — refuse rather than import duplicated
    rows."""
    out: dict[str, tuple] = {}
    for (path, _dvid), entry in active.items():
        if path in out:
            raise ValueError(
                f"Delta log leaves two live file actions for {path!r} "
                "(a remove is missing its deletionVector descriptor); "
                "importing would duplicate rows"
            )
        out[path] = entry
    return out


def import_delta_log(table_dir: str) -> int:
    """Adopt ``<table_dir>/_delta_log`` into the versioned layer:
    replay the contiguous JSON commit chain from Delta version 0,
    committing one manifest per Delta commit (v = delta+1) so the
    imported table TIME-TRAVELS through its pre-adoption history.
    A checkpoint-truncated log (JSON chain not starting at 0) instead
    bootstraps from the newest parquet checkpoint — manifest v1 is the
    checkpoint snapshot (``meta.delta_checkpoint`` records the Delta
    version), and each JSON commit after it becomes one manifest, so
    time travel reaches back exactly as far as a Delta reader could.
    Data files are referenced in place. Returns the latest version.

    Refuses (ValueError) when: the table already has a manifest chain
    (adoption is for fresh dirs), the JSON chain does not start at 0
    (checkpoint-truncated log), the protocol requires reader features
    beyond deletionVectors/columnMapping/v2Checkpoint, or
    columnMapping mode is ``id`` (parquet-field-id resolution).
    Column mapping mode ``name`` imports natively —
    Delta's physicalName/id field metadata becomes our
    ``physical``/``cid`` keys and renames/drops keep working
    post-adoption. Inline deletion vectors import natively too: each
    distinct descriptor state materializes ONE native DV parquet
    (file_base, pos) that read_versioned anti-joins, so the adopted
    table hides exactly the rows the Delta log hides and later DML /
    OPTIMIZE work unchanged.
    ``cdc``/``txn``/``commitInfo``/``domainMetadata`` actions are
    skipped — they carry no table state."""
    if current_version(table_dir) > 0:
        raise ValueError(
            f"{table_dir} already has a versioned commit log; "
            "import_delta_log only adopts fresh directories"
        )
    log_dir = os.path.join(table_dir, _LOG_DIR)
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"{log_dir} does not exist")
    commits = _list_commit_versions(log_dir)
    # (rel path, dvUid) -> (stats, inline DV descriptor or None) —
    # spec reconciliation key; collapsed to per-path at each manifest
    active: dict[tuple, tuple] = {}
    last_dv_sig = None  # descriptor-state signature of the last DV parquet
    last_dvs = None
    schema_json = None
    spec: list[str] = []
    max_cid = 0
    version = 0
    base = -1  # manifest v = delta commit - base
    cp_seed = None
    if not commits or commits[0] != 0:
        # checkpoint-truncated log: bootstrap from the parquet
        # checkpoint like any Delta reader, then replay the JSON tail
        cp_v = _last_checkpoint_version(log_dir)
        if cp_v is None:
            cps = sorted(
                int(n[:20])
                for n in os.listdir(log_dir)
                if ".checkpoint." in n
                and n.endswith(".parquet")
                and n[:20].isdigit()
            )
            cp_v = cps[-1] if cps else None
        if cp_v is None:
            raise ValueError(
                f"{log_dir} is not a contiguous JSON chain from version "
                "0 and holds no parquet checkpoint to bootstrap from — "
                "ask the writer for a full-history export or a "
                "checkpoint"
            )
        tail = [c for c in commits if c > cp_v]
        if tail != list(range(cp_v + 1, cp_v + 1 + len(tail))):
            raise ValueError(
                f"JSON commits after checkpoint {cp_v} are not "
                f"contiguous in {log_dir}: {tail}"
            )
        cp_seed = _read_checkpoint_state(log_dir, cp_v)
        commits = tail
        base = cp_v - 1
    elif commits != list(range(len(commits))):
        raise ValueError(
            f"{log_dir} is not a contiguous JSON chain from version 0 "
            "(checkpoint-truncated logs are not supported — ask the "
            "writer for a full-history export)"
        )
    store = get_commit_store()
    store.ensure_log(table_dir)
    if cp_seed is not None:
        protocol, meta, cp_active = cp_seed
        _check_reader_protocol(protocol)
        schema_json, spec, max_cid = _import_metadata(meta, 0)
        for add in cp_active.values():
            key = (
                urllib.parse.unquote(add["path"]),
                _dv_unique_id(add.get("deletionVector")),
            )
            active[key] = (_manifest_stats(add), add.get("deletionVector"))
        by_path = _collapse_active(active)
        manifest = {
            "version": 1,
            "mode": "append",
            "files": list(by_path),
            "stats": {
                f: st for f, (st, _) in by_path.items() if st is not None
            },
            "schema": schema_json,
            "meta": {"delta_import": base + 1, "delta_checkpoint": base + 1},
            "partition_spec": spec,
            "spec_id": 0,
        }
        dv_map = {f: d for f, (_, d) in by_path.items() if d}
        if dv_map:
            last_dvs = _materialize_dvs(table_dir, dv_map)
            last_dv_sig = frozenset(
                (f, _dv_unique_id(d)) for f, d in dv_map.items()
            )
            manifest["dvs"] = last_dvs
        if max_cid:
            manifest["max_column_id"] = max_cid
        if not store.put_if_absent(
            table_dir, _manifest_name(1), json.dumps(manifest).encode()
        ):
            raise ValueError(
                "manifest v1 appeared during import — concurrent writer "
                "on a fresh adoption directory"
            )
        version = 1
    for dv in commits:
        removes = 0
        with open(os.path.join(log_dir, _delta_commit_name(dv))) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    # reader 2 = column mapping (native resolution);
                    # reader 3 accepted when every feature is one we
                    # implement (deletionVectors, columnMapping)
                    _check_reader_protocol(action["protocol"])
                elif "metaData" in action:
                    schema_json, spec, max_cid = _import_metadata(
                        action["metaData"], max_cid
                    )
                elif "add" in action:
                    add = action["add"]
                    key = (
                        urllib.parse.unquote(add["path"]),
                        _dv_unique_id(add.get("deletionVector")),
                    )
                    active[key] = (
                        _manifest_stats(add), add.get("deletionVector"),
                    )
                elif "remove" in action:
                    rem = action["remove"]
                    active.pop(
                        (
                            urllib.parse.unquote(rem["path"]),
                            _dv_unique_id(rem.get("deletionVector")),
                        ),
                        None,
                    )
                    removes += 1
                # cdc / txn / commitInfo / domainMetadata: no table state
        if schema_json is None:
            raise ValueError(
                f"Delta commit {dv} reached without a metaData action"
            )
        by_path = _collapse_active(active)
        files = list(by_path)
        stats = {f: st for f, (st, _) in by_path.items() if st is not None}
        v_out = dv - base
        manifest = {
            "version": v_out,
            "mode": "append" if removes == 0 else "overwrite",
            "files": files,
            "stats": stats,
            "schema": schema_json,
            "meta": {"delta_import": dv},
            "partition_spec": spec,
            "spec_id": 0,
        }
        # inline DV descriptors -> one native DV parquet per distinct
        # descriptor state (unchanged states re-reference the object)
        dv_map = {f: d for f, (_, d) in by_path.items() if d}
        if dv_map:
            # the full unique id (storageType + path + @offset): two
            # on-disk DVs sharing one .bin file differ only by offset
            sig = frozenset(
                (f, _dv_unique_id(d)) for f, d in dv_map.items()
            )
            if sig != last_dv_sig:
                last_dvs = _materialize_dvs(table_dir, dv_map)
                last_dv_sig = sig
            manifest["dvs"] = last_dvs
        if max_cid:
            manifest["max_column_id"] = max_cid
        if not store.put_if_absent(
            table_dir, _manifest_name(v_out), json.dumps(manifest).encode()
        ):
            raise ValueError(
                f"manifest v{v_out} appeared during import — concurrent "
                "writer on a fresh adoption directory"
            )
        version = v_out
    from .versioned import _advance_latest

    _advance_latest(table_dir, version)
    return version
