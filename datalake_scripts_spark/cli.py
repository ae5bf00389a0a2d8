"""Pipeline CLI — the engine's replacement for the reference's script
entry points (``python zoom_proc.py <head> <mode> <date>``,
``python monkey_proc.py`` etc., SURVEY.md §3).

One command per domain; globs are passed explicitly (the reference
interpolated dates into glob masks — callers can still do that), output
is a directory of parquet tables (one per contract table) written in
``--mode`` append/overwrite, with optional JDBC mirroring via
``--jdbc-url`` (the reference's dual-sink pattern) and a row-count
reconciliation printed per table (its ``check_loaded``).

    python -m datalake_scripts_spark zoom --meetings G --participants G --out D [--history]
    python -m datalake_scripts_spark monkey --details G --responses G --out D
    python -m datalake_scripts_spark vk --groups G --members G --group-id N --walls G --out D
    python -m datalake_scripts_spark jhub --logs G --out D
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame


def _write_all(
    spark, tables: dict[str, DataFrame], out: str, mode: str, jdbc_url: str | None,
    jdbc_driver: str | None, versioned: bool = False,
) -> None:
    from .io import reconcile_counts, write_jdbc, write_parquet
    from .operators.versioned import write_versioned

    for name, df in tables.items():
        path = f"{out}/{name}"
        df = df.persist()
        n = df.count()
        if versioned:
            v = write_versioned(spark, df, path, mode=mode)
            label = f"{path} (v{v})"
            ok = True
        else:
            write_parquet(df, path, mode=mode)
            label = path
            ok = reconcile_counts(spark, path, n) if mode == "overwrite" else True
        if jdbc_url:
            props = {"driver": jdbc_driver} if jdbc_driver else {}
            write_jdbc(df, jdbc_url, name, mode=mode, properties=props)
        print(f"{name}: {n} rows -> {label}" + ("" if ok else " RECONCILE-MISMATCH"))
        df.unpersist()


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--out", required=True, help="output directory for parquet tables")
    common.add_argument("--mode", default="append", choices=["append", "overwrite"])
    common.add_argument("--jdbc-url", default=None)
    common.add_argument("--jdbc-driver", default=None)
    common.add_argument("--master", default=None)
    common.add_argument(
        "--versioned", action="store_true",
        help="write snapshot tables (operators.versioned: atomic commits, "
        "time travel) instead of plain parquet directories",
    )

    p = argparse.ArgumentParser(prog="datalake_scripts_spark")
    sub = p.add_subparsers(dest="domain", required=True)

    z = sub.add_parser("zoom", parents=[common])
    z.add_argument("--meetings", required=True)
    z.add_argument("--participants", required=True)
    z.add_argument("--history", action="store_true",
                   help="zoom_proc_hst parity: load_datetime audit columns")

    m = sub.add_parser("monkey", parents=[common])
    m.add_argument("--details", required=True)
    m.add_argument("--responses", required=True)

    v = sub.add_parser("vk", parents=[common])
    v.add_argument("--groups", required=True)
    v.add_argument("--members", required=True)
    v.add_argument("--group-id", type=int, required=True)
    v.add_argument("--walls", required=True)

    j = sub.add_parser("jhub", parents=[common])
    j.add_argument("--logs", required=True)

    # table maintenance (no pipeline run): the OPTIMIZE/VACUUM/history
    # chores of the versioned layer as first-class commands
    tbl = sub.add_parser("table", help="versioned-table maintenance")
    tbl.add_argument(
        "--dir", required=True,
        help="versioned table directory, or catalog:<name> (resolved "
             "via --catalog / $DATALAKE_CATALOG_DIR)",
    )
    tbl.add_argument("--catalog", default=None, help="catalog directory")
    tbl.add_argument("--master", default=None)
    tbl_sub = tbl.add_subparsers(dest="action", required=True)
    c = tbl_sub.add_parser("compact", help="fold small files (OPTIMIZE)")
    c.add_argument("--files", type=int, default=1)
    c.add_argument("--sort", default=None, help="range-cluster one column")
    c.add_argument("--zorder", default=None, help="comma-separated Z-ORDER columns")
    vac = tbl_sub.add_parser("vacuum", help="drop unreferenced files")
    vac.add_argument("--keep-last", type=int, default=1)
    tbl_sub.add_parser("history", help="list committed versions")
    dele = tbl_sub.add_parser("delete", help="row-level DELETE (copy-on-write)")
    dele.add_argument("--where", required=True, help="SQL predicate")
    dele.add_argument(
        "--dv", action="store_true",
        help="merge-on-read: commit a deletion vector, rewrite nothing",
    )
    ren = tbl_sub.add_parser(
        "rename-column", help="RENAME COLUMN (metadata-only, column mapping)"
    )
    ren.add_argument("--from", dest="old", required=True)
    ren.add_argument("--to", dest="new", required=True)
    drp = tbl_sub.add_parser(
        "drop-column", help="DROP COLUMN (metadata-only, column mapping)"
    )
    drp.add_argument("--column", required=True)
    upd = tbl_sub.add_parser("update", help="row-level UPDATE (copy-on-write)")
    upd.add_argument("--where", required=True, help="SQL predicate")
    upd.add_argument(
        "--set",
        required=True,
        action="append",
        help="col=SQL-expr (repeatable)",
    )
    upd.add_argument(
        "--dv", action="store_true",
        help="merge-on-read: DV the old rows, append only updated images",
    )
    mrg = tbl_sub.add_parser(
        "merge", help="MERGE a parquet batch into the table (upsert by key)"
    )
    mrg.add_argument("--source", required=True, help="parquet path of the batch")
    mrg.add_argument("--keys", required=True, help="comma-separated key columns")
    mrg.add_argument(
        "--dv", action="store_true",
        help="merge-on-read: matched rows DV out, only changed rows "
             "are written (MERGE INTO instead of read-merge-overwrite)",
    )
    rst = tbl_sub.add_parser("restore", help="roll back to a version (new commit)")
    rst.add_argument("--version", type=int, required=True)
    cln = tbl_sub.add_parser("clone", help="clone a snapshot to a new table")
    cln.add_argument("--to", required=True, help="destination table directory")
    cln.add_argument("--version", type=int, default=None)
    cln.add_argument("--deep", action="store_true", help="copy data files")
    prof = tbl_sub.add_parser(
        "profile", help="column stats report for the current snapshot"
    )
    prof.add_argument("--columns", default=None, help="comma-separated subset")
    wrt = tbl_sub.add_parser(
        "write", help="commit a parquet batch as a new snapshot"
    )
    wrt.add_argument("--source", required=True, help="parquet path of the batch")
    wrt.add_argument("--mode", default="append", choices=["append", "overwrite"])
    wrt.add_argument(
        "--partition-by", default=None,
        help="comma-separated hive partition columns (manifest-stat "
             "pruning; the reference's date-partitioned landing)",
    )
    wrt.add_argument(
        "--bloom", default=None,
        help="comma-separated bloom-index columns (None inherits)",
    )
    wrt.add_argument(
        "--manifest-chunking", default=None,
        help="two-level manifest layout: 'partition', an int chunk "
             "size, or 'false' to flatten (None inherits table state)",
    )

    # catalog DDL (no Spark session): name -> table_dir + grants, the
    # reference's out-of-band DDL channel (monkey_proc.py:98-120) as a
    # transactional, auditable catalog (operators.catalog)
    cats = sub.add_parser("tables", help="name catalog DDL")
    cats.add_argument(
        "--catalog", required=True, help="catalog directory (the log)"
    )
    cats_sub = cats.add_subparsers(dest="action", required=True)
    cats_sub.add_parser("list", help="registered tables")
    cc = cats_sub.add_parser("create", help="register name -> dir")
    cc.add_argument("--name", required=True)
    cc.add_argument("--table-dir", required=True)
    cc.add_argument("--grant", action="append", default=[],
                    help="grantee role (repeatable)")
    cc.add_argument("--comment", default=None)
    cc.add_argument("--if-not-exists", action="store_true")
    cv = cats_sub.add_parser(
        "create-view", help="register a saved SQL view over catalog names"
    )
    cv.add_argument("--name", required=True)
    cv.add_argument("--sql", required=True)
    cv.add_argument("--comment", default=None)
    cv.add_argument("--if-not-exists", action="store_true")
    cd = cats_sub.add_parser("drop", help="unregister (metadata-only)")
    cd.add_argument("--name", required=True)
    cd.add_argument("--if-exists", action="store_true")
    cg = cats_sub.add_parser("grants", help="show/alter grants")
    cg.add_argument("--name", required=True)
    cg.add_argument("--grant", action="append", default=[])
    cg.add_argument("--revoke", action="append", default=[])
    cats_sub.add_parser("history", help="catalog audit log")

    dsync = tbl_sub.add_parser(
        "delta-sync",
        help="mirror the table as a Delta _delta_log (incremental: "
             "only new commits written) — no Spark session",
    )
    dsync.add_argument("--out", default=None, help="mirror directory "
                       "(default: inside the table dir)")
    dsync.add_argument(
        "--checkpoint-interval", type=int, default=None,
        help="write a parquet checkpoint every N commits (Delta uses 10)",
    )
    dcp = tbl_sub.add_parser(
        "delta-checkpoint",
        help="write a Delta parquet checkpoint + _last_checkpoint at "
             "the newest (or given) exported commit — no Spark session",
    )
    dcp.add_argument("--out", default=None)
    dcp.add_argument("--version", type=int, default=None,
                     help="Delta commit to checkpoint (default newest)")
    prg = tbl_sub.add_parser(
        "purge",
        help="right-to-be-forgotten: copy-on-write DELETE + vacuum to "
             "depth 1 — physical erasure, no time travel back",
    )
    prg.add_argument("--where", required=True, help="SQL predicate")
    dsnap = tbl_sub.add_parser(
        "delta-snapshot",
        help="materialize one snapshot (DVs applied, hidden layout "
             "dropped) into a fresh table + Delta log — the export "
             "route for histories delta-sync refuses",
    )
    dsnap.add_argument("--to", required=True, help="destination directory")
    dsnap.add_argument("--version", type=int, default=None)

    ice = tbl_sub.add_parser(
        "iceberg-export",
        help="mirror the table history as Iceberg v2 metadata "
             "(metadata.json + Avro manifests) — no Spark session",
    )
    ice.add_argument("--out", default=None, help="mirror directory "
                     "(default: inside the table dir)")
    tbl_sub.add_parser(
        "iceberg-import",
        help="adopt an Iceberg v2 metadata tree at <dir>/metadata into "
             "the versioned manifest chain — no Spark session",
    )
    isync = tbl_sub.add_parser(
        "iceberg-sync",
        help="bring an Iceberg metadata mirror up to the current "
             "version (incremental: only new snapshots) — no Spark "
             "session",
    )
    isync.add_argument("--out", default=None)
    iexp = tbl_sub.add_parser(
        "iceberg-expire",
        help="expire old snapshots from an Iceberg metadata mirror "
             "and remove files no surviving snapshot references — no "
             "Spark session",
    )
    iexp.add_argument("--out", default=None)
    iexp.add_argument("--keep-last", type=int, default=2,
                      help="newest snapshots to keep (default 2)")
    dcln = tbl_sub.add_parser(
        "delta-clean",
        help="checkpoint-covered log retention for a Delta mirror: "
             "keep the newest N JSON commits, checkpoint + remove the "
             "rest — no Spark session",
    )
    dcln.add_argument("--out", default=None)
    dcln.add_argument("--keep-last", type=int, default=10,
                      help="newest JSON commits to keep (default 10)")
    annb = tbl_sub.add_parser(
        "ann-build",
        help="build the persisted IVF vector index (centroids + "
             "cell-partitioned assignments) from this corpus table",
    )
    annb.add_argument("--index", required=True, help="index directory")
    annb.add_argument("--centroids", choices=["kmeans", "stride"],
                      default="kmeans")
    annb.add_argument("--n-centroids", type=int, default=64)
    annb.add_argument("--stride", type=int, default=50)
    annb.add_argument("--assignment", choices=["pandas", "literal"],
                      default="pandas")
    annb.add_argument("--id-col", default="vec_id")
    annb.add_argument("--vec-col", default="embedding")
    annr = tbl_sub.add_parser(
        "ann-refresh",
        help="bring the persisted IVF index up to the corpus's current "
             "snapshot (appends assign O(batch); drift re-clusters)",
    )
    annr.add_argument("--index", required=True, help="index directory")
    annr.add_argument("--drift-threshold", type=float, default=0.5)

    tib = tbl_sub.add_parser(
        "text-index-build",
        help="build the persisted inverted text index (bucket-"
             "partitioned postings + docstats) from this corpus table",
    )
    tib.add_argument("--index", required=True, help="index directory")
    tib.add_argument("--id-col", default="doc_id")
    tib.add_argument("--text-col", default="text")
    tib.add_argument("--n-buckets", type=int, default=64)
    tir = tbl_sub.add_parser(
        "text-index-refresh",
        help="bring the inverted index up to the corpus's current "
             "snapshot (appends tokenize O(batch); row-level changes "
             "rebuild)",
    )
    tir.add_argument("--index", required=True, help="index directory")

    chk = tbl_sub.add_parser(
        "check-schema",
        help="validate a reader contract (StructType jsonValue file) "
             "against the committed table schema — no Spark session, "
             "no file opened",
    )
    chk.add_argument("--contract", required=True, help="JSON schema file")
    chk.add_argument("--version", type=int, default=None)

    args = p.parse_args(argv)

    if args.domain == "tables":
        # catalog DDL: pure metadata, no Spark session
        from .operators.catalog import Catalog

        cat = Catalog(args.catalog)
        if args.action == "create":
            v = cat.create_table(
                args.name, args.table_dir,
                grants=args.grant or None, comment=args.comment,
                if_not_exists=args.if_not_exists,
            )
            print(f"created {args.name} -> {args.table_dir} (catalog v{v})")
        elif args.action == "create-view":
            v = cat.create_view(
                args.name, args.sql, comment=args.comment,
                if_not_exists=args.if_not_exists,
            )
            print(f"created view {args.name} (catalog v{v})")
        elif args.action == "drop":
            v = cat.drop_table(args.name, if_exists=args.if_exists)
            print(f"dropped {args.name} (catalog v{v})")
        elif args.action == "grants":
            if args.grant or args.revoke:
                cat.alter_grants(args.name, grant=args.grant, revoke=args.revoke)
            for stmt in cat.grant_statements(args.name):
                print(stmt)
        elif args.action == "history":
            for op in cat.history():
                print(op)
        else:  # list
            for name, entry in cat.tables().items():
                grants = ",".join(entry.get("grants", [])) or "-"
                loc = entry.get("dir") or "<view>"
                print(f"{name}\t{loc}\tgrants={grants}")
        return 0

    if args.domain == "table" and args.dir.startswith("catalog:"):
        from .operators.catalog import resolve_table_ref

        args.dir = resolve_table_ref(args.dir, args.catalog)

    if args.domain == "table" and args.action == "check-schema":
        # pure manifest + StructType walk: fail-fast for schedulers
        import json as _json

        from pyspark.sql.types import StructType

        from .operators.contracts import read_compat
        from .operators.versioned import _load_manifest, current_version

        v = args.version or current_version(args.dir)
        manifest = _load_manifest(args.dir, v)
        with open(args.contract) as fh:
            contract = StructType.fromJson(_json.load(fh))
        committed = manifest.get("schema")
        if committed is None:
            print(
                f"VIOLATION {args.dir}@v{v} has no committed schema to "
                "validate against"
            )
            return 1
        violations = read_compat(StructType.fromJson(committed), contract)
        if violations:
            for viol in violations:
                print(f"VIOLATION {viol}")
            return 1
        print(f"contract OK against {args.dir}@v{v}")
        return 0

    if args.domain == "table" and args.action in (
        "delta-sync", "delta-checkpoint", "delta-clean"
    ):
        # metadata-only Delta mirror maintenance: no Spark session
        from .operators.delta_interop import (
            clean_delta_log,
            sync_delta_log,
            write_delta_checkpoint,
        )

        if args.action == "delta-sync":
            n = sync_delta_log(
                args.dir, out_dir=args.out,
                checkpoint_interval=args.checkpoint_interval,
            )
            print(f"synced {n} new Delta commit(s)")
        elif args.action == "delta-clean":
            res = clean_delta_log(
                args.dir, out_dir=args.out, keep_last=args.keep_last
            )
            print(
                f"removed {res['removed_json']} JSON commit(s) + "
                f"{res['removed_checkpoints']} checkpoint(s); "
                f"checkpoint at {res['checkpoint_version']}"
            )
        else:
            cp = write_delta_checkpoint(
                args.dir, out_dir=args.out, version=args.version
            )
            print(f"checkpoint written: {cp}")
        return 0

    if args.domain == "table" and args.action in (
        "iceberg-export", "iceberg-import", "iceberg-sync",
        "iceberg-expire",
    ):
        # metadata-only Iceberg interop: no Spark session
        from .operators.iceberg_interop import (
            expire_iceberg_snapshots,
            export_iceberg_metadata,
            import_iceberg_metadata,
            sync_iceberg_metadata,
        )

        if args.action == "iceberg-export":
            meta_dir = export_iceberg_metadata(args.dir, out_dir=args.out)
            print(f"Iceberg metadata written: {meta_dir}")
        elif args.action == "iceberg-sync":
            n = sync_iceberg_metadata(args.dir, out_dir=args.out)
            print(f"synced {n} new Iceberg snapshot(s)")
        elif args.action == "iceberg-expire":
            res = expire_iceberg_snapshots(
                args.dir, out_dir=args.out, keep_last=args.keep_last
            )
            print(
                f"expired {res['expired']} snapshot(s), removed "
                f"{res['removed_files']} mirror file(s)"
            )
        else:
            n = import_iceberg_metadata(args.dir)
            print(f"adopted {n} Iceberg snapshot(s) as versions")
        return 0

    from .session import get_spark

    if args.domain == "table":
        from .operators import versioned as V

        spark = get_spark("table-maintenance", master=args.master)
        if args.action == "compact":
            zcols = args.zorder.split(",") if args.zorder else None
            v = V.compact_versioned(
                spark, args.dir, target_files=args.files,
                sort_by=args.sort, zorder_by=zcols,
            )
            print(f"compacted -> v{v} ({len(V.files_for_read(args.dir))} files)")
        elif args.action == "vacuum":
            removed = V.vacuum(args.dir, keep_last=args.keep_last)
            print(f"vacuumed {removed} files")
        elif args.action == "delete":
            v, n = V.delete_versioned(
                spark, args.dir, args.where, deletion_vectors=args.dv
            )
            how = "deletion vector" if args.dv else "copy-on-write"
            print(f"deleted {n} rows ({how}) -> v{v}")
        elif args.action == "rename-column":
            v = V.rename_column(args.dir, args.old, args.new)
            print(f"renamed {args.old} -> {args.new} (metadata-only) -> v{v}")
        elif args.action == "drop-column":
            v = V.drop_column(args.dir, args.column)
            print(f"dropped {args.column} (metadata-only) -> v{v}")
        elif args.action == "update":
            sets = dict(s.split("=", 1) for s in args.set)
            v, n = V.update_versioned(
                spark, args.dir, args.where, sets,
                deletion_vectors=args.dv,
            )
            how = "deletion vector" if args.dv else "copy-on-write"
            print(f"updated {n} rows ({how}) -> v{v}")
        elif args.action == "merge":
            # same semantics as streaming CDC apply
            # (foreach_batch_merge_versioned): matched keys replace,
            # new keys insert, one snapshot commits the merge result
            from .operators.upsert import merge_upsert

            keys = args.keys.split(",")
            batch = spark.read.parquet(args.source)
            if args.dv:
                sets = {
                    c: f"s.{c}" for c in batch.columns if c not in keys
                }
                v, counts = V.merge_versioned(
                    spark, args.dir, batch, on=keys,
                    when_matched_update=sets or None,
                    deletion_vectors=True,
                    meta={"merged_from": args.source, "keys": keys},
                )
                print(
                    f"merged (merge-on-read): {counts['n_updated']} "
                    f"updated, {counts['n_inserted']} inserted -> v{v}"
                )
                return 0
            # pin the snapshot this merge READ: a concurrent commit
            # landing between read and publish must surface as
            # CommitConflict (re-run), not be silently dropped by a
            # blind auto-retrying overwrite (lost update)
            base_v = V.current_version(args.dir)
            if base_v == 0:
                merged = batch
            else:
                merged = merge_upsert(
                    V.read_versioned(spark, args.dir, version=base_v),
                    batch, keys,
                )
            try:
                v = V.write_versioned(
                    spark, merged, args.dir, mode="overwrite",
                    expected_version=base_v,
                    meta={"merged_from": args.source, "keys": keys},
                )
            except V.CommitConflict as e:
                raise SystemExit(
                    f"merge conflict: {e} — another writer committed "
                    f"after v{base_v} was read; re-run the merge"
                ) from e
            print(f"merged {batch.count()} batch rows -> v{v}")
        elif args.action == "write":
            batch = spark.read.parquet(args.source)
            mc = args.manifest_chunking
            if mc is not None:
                mc = (
                    False
                    if mc.lower() == "false"
                    else (mc if mc == "partition" else int(mc))
                )
            v = V.write_versioned(
                spark, batch, args.dir, mode=args.mode,
                partition_by=args.partition_by.split(",") if args.partition_by else None,
                bloom_cols=args.bloom.split(",") if args.bloom else None,
                meta={"written_from": args.source},
                manifest_chunking=mc,
            )
            print(f"committed {batch.count()} rows -> v{v}")
        elif args.action == "ann-build":
            from .operators.ann_index import build_ann_index

            res = build_ann_index(
                spark, args.dir, args.index,
                centroids=args.centroids, n_centroids=args.n_centroids,
                stride=args.stride, assignment=args.assignment,
                id_col=args.id_col, vec_col=args.vec_col,
            )
            print(
                f"built index: {res['n_centroids']} centroids, "
                f"{res['n_indexed']} vectors @ source v"
                f"{res['source_version']}"
            )
        elif args.action == "ann-refresh":
            from .operators.ann_index import refresh_ann_index

            res = refresh_ann_index(
                spark, args.dir, args.index,
                drift_threshold=args.drift_threshold,
            )
            print(
                f"{res['action']}: "
                + ", ".join(f"{k}={v}" for k, v in res.items()
                            if k != "action")
            )
        elif args.action == "text-index-build":
            from .operators.text_index import build_text_index

            res = build_text_index(
                spark, args.dir, args.index,
                id_col=args.id_col, text_col=args.text_col,
                n_buckets=args.n_buckets,
            )
            print(
                f"built index: {res['n_docs']} docs @ source v"
                f"{res['source_version']}"
            )
        elif args.action == "text-index-refresh":
            from .operators.text_index import refresh_text_index

            res = refresh_text_index(spark, args.dir, args.index)
            print(
                f"{res['action']}: "
                + ", ".join(f"{k}={v}" for k, v in res.items()
                            if k != "action")
            )
        elif args.action == "purge":
            res = V.purge_rows(spark, [args.dir], args.where)[args.dir]
            if res.get("skipped"):
                print(f"skipped: {res['reason']}")
                return 1
            print(
                f"purged {res['n_deleted']} rows, removed "
                f"{res['n_files_removed']} files, verified_absent="
                f"{res['verified_absent']}"
            )
        elif args.action == "delta-snapshot":
            from .operators.delta_interop import export_delta_snapshot

            log_dir = export_delta_snapshot(
                spark, args.dir, args.to, version=args.version
            )
            print(f"snapshot exported: {log_dir}")
        elif args.action == "restore":
            v = V.restore_versioned(args.dir, args.version)
            print(f"restored v{args.version} -> v{v}")
        elif args.action == "clone":
            v = V.clone_versioned(
                spark, args.dir, args.to, version=args.version,
                shallow=not args.deep,
            )
            print(f"cloned -> {args.to} v{v} ({'deep' if args.deep else 'shallow'})")
        elif args.action == "profile":
            from .operators.profile import profile

            cols = args.columns.split(",") if args.columns else None
            df = V.read_versioned(spark, args.dir)
            for row in profile(df, columns=cols).collect():
                print(row.asDict())
        else:
            latest = V.current_version(args.dir)
            for ver in range(1, latest + 1):
                try:
                    m = V._load_manifest(args.dir, ver)
                except FileNotFoundError:
                    continue
                files, stats = V._expand_manifest(args.dir, m)
                rows = (
                    sum(s["rows"] for s in stats.values())
                    - V._dv_total_rows(m)
                    if stats
                    else "?"
                )
                meta = m.get("meta", {})
                layout = (
                    f" chunks={len(m['chunks'])}" if "chunks" in m else ""
                )
                if "dvs" in m:
                    layout += f" dvs={len(m['dvs'])}"
                at = m.get("committed_at")
                when = ""
                if at:
                    import datetime as _dt

                    when = " at=" + _dt.datetime.fromtimestamp(
                        at, _dt.timezone.utc
                    ).strftime("%Y-%m-%dT%H:%M:%SZ")
                print(
                    f"v{ver}: mode={m['mode']} files={len(files)} "
                    f"rows={rows}{layout}{when}"
                    + (f" meta={meta}" if meta else "")
                )
        return 0

    spark = get_spark(f"pipeline-{args.domain}", master=args.master)

    if args.domain == "zoom":
        from .plans.zoom import zoom_tables

        tables = zoom_tables(
            spark, args.meetings, args.participants, history=args.history
        )
    elif args.domain == "monkey":
        from .plans.monkey import monkey_tables

        tables = monkey_tables(spark, args.details, args.responses)
    elif args.domain == "vk":
        from .plans.vk import vk_group_tables, vk_member_tables, vk_wall_tables

        tables = vk_group_tables(spark, args.groups)
        tables.update(vk_member_tables(spark, args.members, args.group_id))
        tables.update(vk_wall_tables(spark, args.walls))
    else:
        from .plans.jhub import jhub_logs_table

        tables = {"jhublogs": jhub_logs_table(spark, args.logs)}

    _write_all(
        spark, tables, args.out, args.mode, args.jdbc_url, args.jdbc_driver,
        versioned=args.versioned,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
