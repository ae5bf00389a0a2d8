"""Two-level (chunked) manifests: layout equivalence with flat,
chunk-grain pruning, append metadata reuse, DML/CDF/restore/vacuum
interplay (operators/versioned.py chunked-manifest block).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V


def _orders(spark, sf_dir, lo, hi):
    from datalake_scripts_spark.io import read_table

    return (
        read_table(spark, sf_dir, "orders")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    )


def test_chunked_read_equals_flat(spark, sf_dir, tmp_path):
    flat, chunked = str(tmp_path / "flat"), str(tmp_path / "chunked")
    df = _orders(spark, sf_dir, 0, 4000)
    V.write_versioned(spark, df, flat, mode="append")
    V.write_versioned(
        spark, df, chunked, mode="append", manifest_chunking=3
    )
    m = V._load_manifest(chunked, 1)
    assert "chunks" in m and "files" not in m
    a = sorted(map(tuple, V.read_versioned(spark, flat).collect()))
    b = sorted(map(tuple, V.read_versioned(spark, chunked).collect()))
    assert a == b
    assert sorted(V.files_for_read(flat)) != []  # sanity
    assert len(V.files_for_read(chunked)) == len(V.files_for_read(flat))
    assert V.snapshot_row_count(chunked) == V.snapshot_row_count(flat)


def test_chunk_grain_pruning_skips_whole_chunks(spark, sf_dir, tmp_path):
    """Partition-grouped chunks: a skip_filter on the partition column
    loads ONLY the matching partition's chunk object, and the read
    result is exact."""
    base = str(tmp_path / "tbl")
    df = _orders(spark, sf_dir, 0, 6000)
    V.write_versioned(
        spark,
        df,
        base,
        mode="append",
        partition_by=["o_orderpriority"],
        manifest_chunking="partition",
    )
    all_chunks = V.manifest_chunks_for_read(base)
    assert len(all_chunks) >= 3  # one per priority present
    flt = [("o_orderpriority", "=", "1-URGENT")]
    loaded = V.manifest_chunks_for_read(base, skip_filter=flt)
    assert len(loaded) == 1
    got = V.read_versioned(spark, base, skip_filter=flt)
    want = df.filter(F.col("o_orderpriority") == "1-URGENT")
    assert got.count() == want.count() > 0


def test_append_carries_prior_chunks_by_reference(spark, sf_dir, tmp_path):
    """The Iceberg append property: appending to a chunked table reuses
    the previous chunk objects verbatim — only the new files get new
    chunks. Chunking is inherited table state (no re-pass needed)."""
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000), base, mode="append",
        manifest_chunking=2,
    )
    c1 = {c["path"] for c in V._load_manifest(base, 1)["chunks"]}
    V.write_versioned(
        spark, _orders(spark, sf_dir, 1000, 2000), base, mode="append"
    )
    m2 = V._load_manifest(base, 2)
    c2 = {c["path"] for c in m2["chunks"]}
    assert c1 <= c2 and len(c2) > len(c1)
    assert m2.get("manifest_chunking") == 2
    # both snapshots read exactly
    assert V.snapshot_row_count(base, 1) < V.snapshot_row_count(base, 2)
    got = V.read_versioned(spark, base).count()
    assert got == _orders(spark, sf_dir, 0, 2000).count()


def test_rollup_is_union_of_member_stats(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 4000), base, mode="append",
        manifest_chunking=2,
    )
    m = V._load_manifest(base, 1)
    store = V.get_commit_store()
    for ch in m["chunks"]:
        payload = json.loads(store.read(base, ch["path"]))
        assert ch["n_files"] == len(payload["files"])
        ro = ch["rollup"]["columns"].get("o_orderkey")
        mins = [
            payload["stats"][f]["columns"]["o_orderkey"]["min"]
            for f in payload["files"]
        ]
        maxs = [
            payload["stats"][f]["columns"]["o_orderkey"]["max"]
            for f in payload["files"]
        ]
        assert ro["min"] == min(mins) and ro["max"] == max(maxs)


def test_dml_and_cdf_on_chunked_table(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    df = _orders(spark, sf_dir, 0, 4000)
    V.write_versioned(spark, df, base, mode="append", manifest_chunking=2)
    n0 = V.snapshot_row_count(base)
    v, n_del = V.delete_versioned(
        spark, base, "o_totalprice > 150000",
        skip_filter=[("o_totalprice", ">", 150000)],
    )
    assert n_del > 0
    m = V._load_manifest(base, v)
    assert "chunks" in m  # DML kept the two-level layout
    assert V.snapshot_row_count(base) == n0 - n_del
    assert (
        V.read_versioned(spark, base)
        .filter(F.col("o_totalprice") > 150000)
        .count()
        == 0
    )
    # CDF across the chunked delete commit
    ch = V.read_changes(spark, base, from_version=1, to_version=v)
    assert ch.filter(F.col("_change_type") == "delete").count() == n_del


def test_restore_reuses_chunk_objects(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000), base, mode="append",
        manifest_chunking=2,
    )
    c1 = {c["path"] for c in V._load_manifest(base, 1)["chunks"]}
    V.write_versioned(
        spark, _orders(spark, sf_dir, 1000, 1400), base, mode="append"
    )
    v = V.restore_versioned(base, 1)
    m = V._load_manifest(base, v)
    assert {c["path"] for c in m["chunks"]} == c1
    assert V.snapshot_row_count(base, v) == V.snapshot_row_count(base, 1)


def test_vacuum_collects_orphan_chunks_keeps_referenced(
    spark, sf_dir, tmp_path
):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000), base, mode="append",
        manifest_chunking=2,
    )
    # overwrite: v1's chunks become unreferenced once v1 is vacuumed
    V.write_versioned(
        spark, _orders(spark, sf_dir, 1000, 2000), base, mode="overwrite"
    )
    store = V.get_commit_store()
    before = [
        n for n in store.list_log(base) if n.startswith(V._CHUNK_PREFIX)
    ]
    assert before
    V.vacuum(base, keep_last=1)
    after = [
        n for n in store.list_log(base) if n.startswith(V._CHUNK_PREFIX)
    ]
    kept = {c["path"] for c in V._load_manifest(base, 2)["chunks"]}
    assert set(after) == kept
    # the surviving snapshot still reads
    assert V.read_versioned(spark, base).count() > 0


def test_explicit_false_flattens_back(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000), base, mode="append",
        manifest_chunking=2,
    )
    V.write_versioned(
        spark, _orders(spark, sf_dir, 1000, 1400), base, mode="append",
        manifest_chunking=False,
    )
    m = V._load_manifest(base, 2)
    assert "chunks" not in m and "files" in m
    assert V.read_versioned(spark, base).count() == _orders(
        spark, sf_dir, 0, 1400
    ).count()


def test_optimize_where_rewrites_only_targeted_partition(
    spark, sf_dir, tmp_path
):
    """OPTIMIZE ... WHERE: the targeted partition's small files fold
    into one; every other partition's files are carried byte-identical
    (same manifest names); rows never change and CDF across the
    optimize commit is empty."""
    base = str(tmp_path / "tbl")
    df = _orders(spark, sf_dir, 0, 2000)
    # two appends -> each partition holds >= 2 small files
    for k in (0, 1):
        V.write_versioned(
            spark,
            df.filter(F.col("o_orderkey") % 2 == k),
            base,
            mode="append",
            partition_by=["o_orderpriority"],
        )
    before = V.files_for_read(base)
    tgt = [("o_orderpriority", "=", "1-URGENT")]
    n_tgt_before = len(
        [f for f in before if "o_orderpriority=1-URGENT" in f]
    )
    assert n_tgt_before >= 2
    rows_before = V.snapshot_row_count(base)
    v = V.compact_versioned(spark, base, target_files=1, where=tgt)
    after = V.files_for_read(base)
    n_tgt_after = len([f for f in after if "o_orderpriority=1-URGENT" in f])
    assert n_tgt_after == 1
    # untouched partitions: identical file names, by reference
    others_before = {f for f in before if "1-URGENT" not in f}
    others_after = {f for f in after if "1-URGENT" not in f}
    assert others_before == others_after
    assert V.snapshot_row_count(base) == rows_before
    got = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    want = sorted(map(tuple, df.collect()))
    assert got == want
    ch = V.read_changes(spark, base, from_version=v - 1, to_version=v)
    assert ch.count() == 0


def test_optimize_where_on_chunked_table(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    df = _orders(spark, sf_dir, 0, 2000)
    for k in (0, 1):
        V.write_versioned(
            spark,
            df.filter(F.col("o_orderkey") % 2 == k),
            base,
            mode="append",
            partition_by=["o_orderpriority"],
            manifest_chunking="partition",
        )
    tgt = [("o_orderpriority", "=", "5-LOW")]
    v = V.compact_versioned(spark, base, target_files=1, where=tgt)
    m = V._load_manifest(base, v)
    assert "chunks" in m  # layout preserved across OPTIMIZE WHERE
    assert len(V.manifest_chunks_for_read(base, skip_filter=tgt)) == 1
    assert (
        V.read_versioned(spark, base).count() == df.count()
    )


def test_optimize_where_no_match_is_noop(spark, sf_dir, tmp_path):
    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 1000), base, mode="append",
        partition_by=["o_orderpriority"],
    )
    v0 = V.current_version(base)
    v = V.compact_versioned(
        spark, base, where=[("o_orderpriority", "=", "9-NOPE")]
    )
    assert v == v0 and V.current_version(base) == v0


def test_chunked_commit_with_all_null_column(spark, tmp_path):
    """ADVICE r6 (high): _chunk_rollup must skip columns whose per-file
    stats are None (all-null columns have no min/max) instead of
    crashing with TypeError — chunking is inherited table state, so
    this made a chunked table unwritable the moment such a file landed."""
    base = str(tmp_path / "tbl")
    df = spark.range(10).select(
        F.col("id").alias("k"),
        F.lit(None).cast("string").alias("all_null"),
    )
    V.write_versioned(spark, df, base, mode="append", manifest_chunking=2)
    m = V._load_manifest(base, 1)
    assert "chunks" in m
    for ch in m["chunks"]:
        assert "all_null" not in ch["rollup"]["columns"]  # unprunable
    # appends (which re-run the rollup over carried + new chunks) survive
    V.write_versioned(spark, df, base, mode="append")
    got = V.read_versioned(spark, base)
    assert got.count() == 20
    assert got.filter(F.col("all_null").isNull()).count() == 20


def test_optimize_where_partition_spec_gate(spark, sf_dir, tmp_path):
    """ADVICE r6: OPTIMIZE WHERE with a differing partition_by must hit
    the same evolve_partitioning gate as write_versioned, and evolution
    must bump spec_id."""
    import pytest

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark, _orders(spark, sf_dir, 0, 2000), base, mode="append",
        partition_by=["o_orderpriority"],
    )
    tgt = [("o_orderpriority", "=", "1-URGENT")]
    with pytest.raises(ValueError, match="evolve_partitioning"):
        V.compact_versioned(spark, base, where=tgt, partition_by=[])
    spec0 = V._load_manifest(base, V.current_version(base)).get("spec_id", 0)
    v = V.compact_versioned(
        spark, base, where=tgt, partition_by=[], evolve_partitioning=True
    )
    assert V._load_manifest(base, v).get("spec_id", 0) == spec0 + 1
