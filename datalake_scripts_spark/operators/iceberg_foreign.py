"""Foreign-writer simulator for Iceberg v2 EQUALITY DELETES.

Our own engine never writes equality deletes — native deletion
vectors export as position deletes (the spec-preferred shape for
read-time cost). Equality deletes exist in the wild because streaming
CDC writers (Flink's upsert sink is the canonical one) cannot know
row positions at write time, so they commit delete-by-key files
instead. To PROVE the import/read path for such tables without
shipping Flink, this module appends spec-conformant equality-delete
snapshots onto an exported metadata tree:

- a delete parquet holding the key rows;
- a content=1 delete manifest whose entries are content=2 and carry
  ``equality_ids`` (field-id 135 per the spec's manifest schema);
- a manifest list re-listing the prior manifests plus the delete
  manifest;
- a bumped metadata.json (snapshot, sequence number, hint file).

A ``partition`` argument stores the delete under the table's default
(partitioned) spec — scoped per the spec's application rule; None
stores it with an unpartitioned spec, i.e. a global delete.
``add_data`` adds a data file in the SAME snapshot/sequence — the CDC
upsert shape whose insert must SURVIVE the delete (the spec's
strictly-older rule).

Used by tests/test_iceberg_reader.py and the
``iceberg_equality_deletes`` registry query; it is a verification
utility (same role as the md5 oracle twins), not an export surface.
"""

from __future__ import annotations

import copy
import json
import os
import uuid


def append_equality_delete_snapshot(
    base: str,
    key_rows: dict[str, list],
    equality_ids: list[int],
    partition: dict | None = None,
    add_data=None,
) -> int:
    """Append one equality-delete snapshot; returns its sequence
    number. See the module docstring for the exact tree shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..functions.avro_min import read_container, write_container
    from . import iceberg_interop as II

    meta_dir = os.path.join(base, "metadata")
    n = int(open(os.path.join(meta_dir, "version-hint.text")).read())
    meta = json.load(open(os.path.join(meta_dir, f"v{n}.metadata.json")))
    v = meta["last-sequence-number"] + 1
    snap_id = max(s["snapshot-id"] for s in meta["snapshots"]) + 1
    ice_schema = meta["schemas"][0]
    cur = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, _, old_mfs = read_container(cur["manifest-list"])

    dpath = os.path.join(meta_dir, f"eqdel-{uuid.uuid4().hex}.parquet")
    pq.write_table(pa.table(key_rows), dpath)
    if partition is not None:
        spec_id = meta["default-spec-id"]
        spec_fields = next(
            s["fields"]
            for s in meta["partition-specs"]
            if s["spec-id"] == spec_id
        )
    else:
        # global delete: stored with an unpartitioned spec (register it)
        spec_id = 99
        spec_fields = []
        if all(s["spec-id"] != 99 for s in meta["partition-specs"]):
            meta["partition-specs"] = meta["partition-specs"] + [
                {"spec-id": 99, "fields": []}
            ]
    msch = copy.deepcopy(II._manifest_schema(spec_fields, ice_schema))
    df_rec = next(
        f for f in msch["fields"] if f["name"] == "data_file"
    )["type"]
    df_rec["fields"].append(
        {
            "name": "equality_ids",
            "type": ["null", {"type": "array", "items": "int"}],
            "field-id": 135,
            "default": None,
        }
    )
    n_keys = len(next(iter(key_rows.values())))
    entry = {
        "status": 1,
        "snapshot_id": snap_id,
        "sequence_number": v,
        "file_sequence_number": v,
        "data_file": {
            "content": 2,
            "file_path": dpath,
            "file_format": "PARQUET",
            "partition": dict(partition or {}),
            "record_count": n_keys,
            "file_size_in_bytes": os.path.getsize(dpath),
            "null_value_counts": None,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": list(equality_ids),
        },
    }
    dm_path = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m1.avro")
    write_container(
        dm_path,
        msch,
        [entry],
        metadata={
            "schema": json.dumps(ice_schema),
            "schema-id": "0",
            "partition-spec": json.dumps(spec_fields),
            "partition-spec-id": str(spec_id),
            "format-version": "2",
            "content": "deletes",
        },
    )
    new_mfs = list(old_mfs) + [
        {
            "manifest_path": dm_path,
            "manifest_length": os.path.getsize(dm_path),
            "partition_spec_id": spec_id,
            "content": 1,
            "sequence_number": v,
            "min_sequence_number": v,
            "added_snapshot_id": snap_id,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": n_keys,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }
    ]
    if add_data is not None:
        data_path = os.path.join(
            base, "data", f"eqadd-{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(add_data, data_path)
        dsch = II._manifest_schema([], ice_schema)
        d_entry = {
            "status": 1,
            "snapshot_id": snap_id,
            "sequence_number": v,
            "file_sequence_number": v,
            "data_file": {
                "content": 0,
                "file_path": data_path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": len(add_data),
                "file_size_in_bytes": os.path.getsize(data_path),
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
            },
        }
        dmf = os.path.join(meta_dir, f"{uuid.uuid4().hex}-m0.avro")
        write_container(
            dmf,
            dsch,
            [d_entry],
            metadata={
                "schema": json.dumps(ice_schema),
                "schema-id": "0",
                "partition-spec": "[]",
                "partition-spec-id": "0",
                "format-version": "2",
                "content": "data",
            },
        )
        new_mfs.append(
            {
                "manifest_path": dmf,
                "manifest_length": os.path.getsize(dmf),
                "partition_spec_id": 0,
                "content": 0,
                "sequence_number": v,
                "min_sequence_number": v,
                "added_snapshot_id": snap_id,
                "added_files_count": 1,
                "existing_files_count": 0,
                "deleted_files_count": 0,
                "added_rows_count": len(add_data),
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    list_path = os.path.join(
        meta_dir, f"snap-{snap_id}-1-{uuid.uuid4().hex}.avro"
    )
    write_container(
        list_path,
        II._MANIFEST_LIST_SCHEMA,
        new_mfs,
        metadata={"format-version": "2"},
    )
    snap = {
        "snapshot-id": snap_id,
        "parent-snapshot-id": meta["current-snapshot-id"],
        "sequence-number": v,
        "timestamp-ms": meta["last-updated-ms"] + 1,
        "summary": {"operation": "overwrite"},
        "manifest-list": list_path,
        "schema-id": 0,
    }
    meta["snapshots"] = meta["snapshots"] + [snap]
    meta["snapshot-log"] = meta["snapshot-log"] + [
        {"snapshot-id": snap_id, "timestamp-ms": snap["timestamp-ms"]}
    ]
    meta["current-snapshot-id"] = snap_id
    meta["refs"] = {"main": {"snapshot-id": snap_id, "type": "branch"}}
    meta["last-sequence-number"] = v
    meta["last-updated-ms"] = snap["timestamp-ms"]
    with open(os.path.join(meta_dir, f"v{n + 1}.metadata.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write(str(n + 1))
    return v
