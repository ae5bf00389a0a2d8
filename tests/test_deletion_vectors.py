"""Deletion vectors — merge-on-read DELETE (Delta/Iceberg deletion
vectors re-expressed on the manifest; operators/versioned.py DV block).
Contract under test:

- delete_versioned(deletion_vectors=True) rewrites NOTHING: the file
  list is carried verbatim, one small DV parquet is committed, and the
  rows disappear from every reader.
- DVs stack (later deletes are disjoint by construction), time travel
  and restore see each snapshot's own DV state, metadata row counts
  subtract DV'd rows with no Spark job.
- Copy-on-write DML / OPTIMIZE materialize DVs for the files they
  rewrite and carry the rest; vacuum keeps referenced DV objects.
- CDF row-diffs and the streaming source emit exactly the DV'd rows as
  deletes; shallow and deep clones keep deletes invisible.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _orders(spark, sf_dir, n=4000):
    return (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .filter(F.col("o_orderkey") < n)
    )


def test_dv_delete_rewrites_nothing_and_hides_rows(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    files_before = sorted(V.files_for_read(tdir))
    total = df.count()
    matching = df.filter("o_orderpriority = '5-LOW'").count()
    v, n = V.delete_versioned(
        spark, tdir, "o_orderpriority = '5-LOW'", deletion_vectors=True
    )
    assert v == 2 and n == matching > 0
    # zero files rewritten — the whole point
    assert sorted(V.files_for_read(tdir)) == files_before
    manifest = V._load_manifest(tdir, 2)
    assert len(manifest["dvs"]) == 1
    got = V.read_versioned(spark, tdir)
    assert got.count() == total - matching
    assert got.filter("o_orderpriority = '5-LOW'").count() == 0
    # time travel: v1 still sees everything
    assert V.read_versioned(spark, tdir, version=1).count() == total
    # metadata-only count subtracts DV rows
    assert V.snapshot_row_count(tdir) == total - matching
    assert V.snapshot_row_count(tdir, version=1) == total


def test_dv_deletes_stack_and_are_disjoint(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    n_low = df.filter("o_orderpriority = '5-LOW'").count()
    n_both = df.filter(
        "o_orderpriority = '5-LOW' OR o_orderkey % 2 = 0"
    ).count()
    _, n1 = V.delete_versioned(
        spark, tdir, "o_orderpriority = '5-LOW'", deletion_vectors=True
    )
    # overlapping predicate: already-deleted rows must not recount
    _, n2 = V.delete_versioned(
        spark,
        tdir,
        "o_orderpriority = '5-LOW' OR o_orderkey % 2 = 0",
        deletion_vectors=True,
    )
    assert n1 == n_low and n1 + n2 == n_both
    assert V.read_versioned(spark, tdir).count() == df.count() - n_both
    # a delete matching ONLY already-deleted rows commits nothing
    v_now = V.current_version(tdir)
    v_same, n3 = V.delete_versioned(
        spark, tdir, "o_orderpriority = '5-LOW'", deletion_vectors=True
    )
    assert (v_same, n3) == (v_now, 0)


def test_dv_null_safe_predicate(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir).withColumn(
        "flag",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("boolean"))
        .otherwise(F.col("o_orderkey") % 2 == 0),
    )
    V.write_versioned(spark, df, tdir, mode="append")
    n_true = df.filter("flag").count()
    _, n = V.delete_versioned(spark, tdir, "flag", deletion_vectors=True)
    assert n == n_true  # NULL-flag rows are KEPT, like SQL DELETE
    assert V.read_versioned(spark, tdir).count() == df.count() - n_true


def test_append_carries_dvs(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(
        spark, df.filter("o_orderkey % 2 = 0"), tdir, mode="append"
    )
    _, n = V.delete_versioned(
        spark, tdir, "o_orderpriority = '1-URGENT'", deletion_vectors=True
    )
    V.write_versioned(
        spark, df.filter("o_orderkey % 2 = 1"), tdir, mode="append"
    )
    got = V.read_versioned(spark, tdir)
    # old files' deletes still apply; the new batch is untouched
    assert got.count() == df.count() - n
    assert (
        got.filter(
            "o_orderkey % 2 = 0 AND o_orderpriority = '1-URGENT'"
        ).count()
        == 0
    )
    assert got.filter(
        "o_orderkey % 2 = 1 AND o_orderpriority = '1-URGENT'"
    ).count() > 0


def test_overwrite_resets_dvs(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    V.delete_versioned(
        spark, tdir, "o_orderkey % 2 = 0", deletion_vectors=True
    )
    V.write_versioned(spark, df, tdir, mode="overwrite")
    assert "dvs" not in V._load_manifest(tdir, V.current_version(tdir))
    assert V.read_versioned(spark, tdir).count() == df.count()


def test_cow_update_does_not_resurrect_dv_rows(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n_del = V.delete_versioned(
        spark, tdir, "o_orderpriority = '5-LOW'", deletion_vectors=True
    )
    v, n_upd = V.update_versioned(
        spark, tdir, "o_orderkey % 10 = 0", {"o_totalprice": "0.0"}
    )
    got = V.read_versioned(spark, tdir)
    assert got.count() == df.count() - n_del
    assert got.filter("o_orderpriority = '5-LOW'").count() == 0
    assert (
        got.filter("o_totalprice = 0.0").count()
        == got.filter("o_orderkey % 10 = 0").count()
    )
    # update rewrote every file (single-batch table) -> DVs materialized
    assert not V._load_manifest(tdir, v).get("dvs")


def test_compact_materializes_dvs(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n = V.delete_versioned(
        spark, tdir, "o_orderkey % 3 = 0", deletion_vectors=True
    )
    v = V.compact_versioned(spark, tdir, target_files=1)
    m = V._load_manifest(tdir, v)
    assert not m.get("dvs")
    assert V.read_versioned(spark, tdir).count() == df.count() - n
    assert V.snapshot_row_count(tdir) == df.count() - n
    # stats now reflect the materialized state exactly
    assert sum(s["rows"] for s in m["stats"].values()) == df.count() - n


def test_vacuum_keeps_live_dv_sweeps_dead(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    V.delete_versioned(
        spark, tdir, "o_orderkey % 4 = 0", deletion_vectors=True
    )
    dv_rel = V._load_manifest(tdir, 2)["dvs"][0]["path"]
    dv_abs = os.path.join(tdir, dv_rel)
    assert os.path.exists(dv_abs)
    # keep the DV'd head: its DV object must survive vacuum
    V.vacuum(tdir, keep_last=1)
    assert os.path.exists(dv_abs)
    n_vis = V.snapshot_row_count(tdir)
    # compaction materializes; vacuuming past the DV'd version sweeps it
    V.compact_versioned(spark, tdir, target_files=1)
    V.vacuum(tdir, keep_last=1)
    assert not os.path.exists(dv_abs)
    assert V.read_versioned(spark, tdir).count() == n_vis


def test_cdf_row_diff_across_dv_delete(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n = V.delete_versioned(
        spark, tdir, "o_orderpriority = '2-HIGH'", deletion_vectors=True
    )
    changes = V.read_changes(spark, tdir, from_version=1, to_version=2)
    rows = changes.groupBy("_change_type").count().collect()
    by_type = {r["_change_type"]: r["count"] for r in rows}
    assert by_type == {"delete": n}
    assert (
        changes.filter("o_orderpriority <> '2-HIGH'").count() == 0
    )


def test_skip_filter_and_pruning_on_dv_table(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(
        spark, df, tdir, mode="append", partition_by=["o_orderpriority"]
    )
    V.delete_versioned(
        spark,
        tdir,
        "o_orderpriority = '5-LOW' AND o_orderkey % 2 = 0",
        deletion_vectors=True,
    )
    flt = [("o_orderpriority", "=", "5-LOW")]
    got = V.read_versioned(spark, tdir, skip_filter=flt)
    want = df.filter(
        "o_orderpriority = '5-LOW' AND o_orderkey % 2 = 1"
    ).count()
    assert got.count() == want
    # pruning still file-grain: only the 5-LOW partition files read
    assert all("5-LOW" in f for f in V.files_for_read(tdir, skip_filter=flt))


def test_restore_to_dv_version(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n = V.delete_versioned(
        spark, tdir, "o_orderkey % 5 = 0", deletion_vectors=True
    )
    V.compact_versioned(spark, tdir, target_files=1)  # v3, materialized
    V.restore_versioned(tdir, 2)  # back to the DV'd snapshot
    assert V._load_manifest(tdir, V.current_version(tdir)).get("dvs")
    assert V.read_versioned(spark, tdir).count() == df.count() - n


def test_clones_of_dv_table(spark, sf_dir, tdir, tmp_path):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n = V.delete_versioned(
        spark, tdir, "o_orderkey % 7 = 0", deletion_vectors=True
    )
    want = df.count() - n
    shallow = str(tmp_path / "shallow")
    deep = str(tmp_path / "deep")
    V.clone_versioned(spark, tdir, shallow, shallow=True)
    V.clone_versioned(spark, tdir, deep, shallow=False)
    assert V.read_versioned(spark, shallow).count() == want
    assert V.read_versioned(spark, deep).count() == want
    assert (
        V.read_versioned(spark, deep)
        .filter("o_orderkey % 7 = 0")
        .count()
        == 0
    )
    assert V.snapshot_row_count(deep) == want


def test_dv_on_column_mapped_table(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    V.rename_column(tdir, "o_totalprice", "price")
    total = df.count()
    _, n = V.delete_versioned(
        spark, tdir, "price > 250000", deletion_vectors=True
    )
    assert n == df.filter("o_totalprice > 250000").count()
    got = V.read_versioned(spark, tdir)
    assert got.count() == total - n
    assert got.filter("price > 250000").count() == 0


def test_delta_export_carries_dvs_inline(spark, sf_dir, tdir):
    """r9: a DV'd history no longer refuses export — it upgrades to
    protocol 3/7 and the DV'd file's add carries an inline descriptor
    whose cardinality matches the deleted-row count (full decode
    round-trips live in tests/test_delta_reader.py)."""
    import json

    from datalake_scripts_spark.operators.delta_interop import (
        export_delta_log,
    )

    V.write_versioned(spark, _orders(spark, sf_dir), tdir, mode="append")
    _, n_del = V.delete_versioned(
        spark, tdir, "o_orderkey % 2 = 0", deletion_vectors=True
    )
    log_dir = export_delta_log(tdir)
    with open(f"{log_dir}/{1:020d}.json") as fh:
        actions = [json.loads(x) for x in fh if x.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    descs = [
        a["add"]["deletionVector"]
        for a in actions
        if a.get("add", {}).get("deletionVector")
    ]
    assert sum(d["cardinality"] for d in descs) == n_del
    assert all(d["storageType"] == "i" for d in descs)


def test_streaming_source_emits_dv_deletes(spark, sf_dir, tdir, tmp_path):
    from datalake_scripts_spark.sources.versioned_datasource import (
        register_versioned_datasource,
    )

    register_versioned_datasource(spark)
    df = _orders(spark, sf_dir, n=2000)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n = V.delete_versioned(
        spark, tdir, "o_orderpriority = '3-MEDIUM'", deletion_vectors=True
    )
    out = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = (
        spark.readStream.format("versioned_changes")
        .option("path", tdir)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = spark.read.parquet(out)
    ins = got.filter("_change_type = 'insert'")
    dels = got.filter("_change_type = 'delete'")
    assert ins.count() == df.count()
    assert dels.count() == n
    assert dels.filter("o_orderpriority <> '3-MEDIUM'").count() == 0
    # the delete rows carry the commit that deleted them
    assert {r["_commit_version"] for r in dels.select(
        "_commit_version").distinct().collect()} == {2}


def test_dv_update_rewrites_only_changed_rows(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    files_v1 = sorted(V.files_for_read(tdir))
    n_match = df.filter("o_orderpriority = '2-HIGH'").count()
    v, n = V.update_versioned(
        spark, tdir, "o_orderpriority = '2-HIGH'",
        {"o_totalprice": "o_totalprice * 2"},
        deletion_vectors=True,
    )
    assert n == n_match
    # original files all carried; only the updated images are new
    after = sorted(V.files_for_read(tdir))
    assert set(files_v1) <= set(after)
    got = V.read_versioned(spark, tdir)
    assert got.count() == df.count()  # row count invariant under UPDATE
    base = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in df.filter("o_orderpriority = '2-HIGH'").limit(20).collect()
    }
    upd = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in got.filter(F.col("o_orderkey").isin(list(base))).collect()
    }
    for k, p in upd.items():
        assert abs(p - base[k] * 2) < 1e-6
    # time travel: v1 unchanged
    assert (
        V.read_versioned(spark, tdir, version=1)
        .filter("o_orderpriority = '2-HIGH'")
        .count()
        == n_match
    )


def test_dv_update_stacks_on_dv_delete_and_cdf(spark, sf_dir, tdir):
    df = _orders(spark, sf_dir)
    V.write_versioned(spark, df, tdir, mode="append")
    _, n_del = V.delete_versioned(
        spark, tdir, "o_orderkey % 4 = 0", deletion_vectors=True
    )
    v, n_upd = V.update_versioned(
        spark, tdir, "o_orderkey % 4 = 1", {"o_totalprice": "0.0"},
        deletion_vectors=True,
    )
    want_upd = df.filter("o_orderkey % 4 = 1").count()
    assert n_upd == want_upd  # deleted rows can't match
    got = V.read_versioned(spark, tdir)
    assert got.count() == df.count() - n_del
    assert got.filter("o_orderkey % 4 = 0").count() == 0
    assert got.filter("o_totalprice = 0.0").count() == want_upd
    # CDF across the DV update: delete+insert pairs for updated rows
    ch = V.read_changes(spark, tdir, 2, 3)
    by = {r["_change_type"]: r["count"]
          for r in ch.groupBy("_change_type").count().collect()}
    assert by == {"insert": want_upd, "delete": want_upd}
    # compaction folds both DV generations away
    V.compact_versioned(spark, tdir, target_files=1)
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert not m.get("dvs")
    assert V.read_versioned(spark, tdir).count() == df.count() - n_del
