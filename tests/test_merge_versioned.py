"""MERGE INTO on versioned tables (versioned.merge_versioned): Delta
clause semantics — conditional matched-update / matched-delete /
not-matched-insert — with touched-file-only rewrite, DV interplay, and
read-pinned concurrency via the shared _commit_dml path."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _orders(spark, sf_dir, lo=0, hi=3000):
    return (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
        .filter((F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi))
    )


def test_merge_update_insert(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 2000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    # source: half overlapping (keys %3==0 under 2000), half new (>=2000)
    src = _orders(spark, sf_dir, 0, 3000).filter(
        "o_orderkey % 3 = 0 OR o_orderkey >= 2000"
    ).withColumn("o_totalprice", F.lit(1.0))
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
    )
    n_overlap = tgt.filter("o_orderkey % 3 = 0").count()
    n_new = src.filter("o_orderkey >= 2000").count()
    assert c == {"n_updated": n_overlap, "n_deleted": 0, "n_inserted": n_new}
    got = V.read_versioned(spark, tdir)
    assert got.count() == tgt.count() + n_new
    assert got.filter("o_totalprice = 1.0").count() == n_overlap + n_new
    # non-matched target rows untouched
    assert (
        got.filter("o_orderkey % 3 <> 0 AND o_orderkey < 2000")
        .filter("o_totalprice = 1.0")
        .count()
        == 0
    )


def test_merge_conditional_delete_and_expressions(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 2000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    src = tgt.select("o_orderkey").withColumn("bump", F.lit(100.0))
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_delete="t.o_orderpriority = '5-LOW'",
        when_matched_update={"o_totalprice": "t.o_totalprice + s.bump"},
        when_not_matched_insert=False,
    )
    n_low = tgt.filter("o_orderpriority = '5-LOW'").count()
    assert c["n_deleted"] == n_low
    assert c["n_updated"] == tgt.count() - n_low
    assert c["n_inserted"] == 0
    got = V.read_versioned(spark, tdir)
    assert got.filter("o_orderpriority = '5-LOW'").count() == 0
    base = {r["o_orderkey"]: r["o_totalprice"] for r in tgt.limit(50).collect()}
    upd = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in got.filter(
            F.col("o_orderkey").isin(list(base))
        ).collect()
    }
    for k, p in upd.items():
        assert abs(p - (base[k] + 100.0)) < 1e-6


def test_merge_rewrites_only_touched_files(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 3000)
    V.write_versioned(
        spark, tgt, tdir, mode="append", partition_by=["o_orderpriority"]
    )
    files_before = set(V.files_for_read(tdir))
    # source touches exactly one priority partition
    src = tgt.filter("o_orderpriority = '1-URGENT'").limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).withColumn("o_totalprice", F.lit(2.0))
    V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        when_not_matched_insert=False,
    )
    files_after = set(V.files_for_read(tdir))
    # the ONLY rewritten (removed) files are 1-URGENT partition files;
    # every other partition carried byte-identical
    removed = files_before - files_after
    assert removed and all("1-URGENT" in f for f in removed)
    assert any("1-URGENT" in f for f in files_after - files_before)
    assert V.read_versioned(spark, tdir).count() == tgt.count()


def test_merge_matched_condition_and_dv_interplay(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 2000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    _, n_dv = V.delete_versioned(
        spark, tdir, "o_orderkey % 10 = 0", deletion_vectors=True
    )
    src = tgt.select("o_orderkey", "o_custkey", "o_totalprice",
                     "o_orderpriority")
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "0.0"},
        matched_condition="t.o_orderkey % 2 = 0",
        when_not_matched_insert=False,
    )
    visible = tgt.count() - n_dv
    want_upd = tgt.filter(
        "o_orderkey % 10 <> 0 AND o_orderkey % 2 = 0"
    ).count()
    assert c["n_updated"] == want_upd  # DV'd rows can't match
    got = V.read_versioned(spark, tdir)
    assert got.count() == visible  # DV deletes stay deleted post-merge
    assert got.filter("o_orderkey % 10 = 0").count() == 0
    # full-table merge rewrote every file -> DVs materialized away
    assert not V._load_manifest(tdir, V.current_version(tdir)).get("dvs")


def test_merge_duplicate_source_keys_raise(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    dup_src = tgt.limit(5).unionByName(tgt.limit(5))
    with pytest.raises(ValueError, match="duplicate keys"):
        V.merge_versioned(
            spark, tdir, dup_src, on=["o_orderkey"],
            when_matched_update={"o_totalprice": "s.o_totalprice"},
        )


def test_merge_insert_requires_full_columns(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    with pytest.raises(ValueError, match="source columns"):
        V.merge_versioned(
            spark, tdir, tgt.select("o_orderkey"), on=["o_orderkey"],
        )


def test_merge_cdf_shows_delete_insert_pairs(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    src = tgt.limit(20).withColumn("o_totalprice", F.lit(9.0))
    V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        when_not_matched_insert=False,
    )
    ch = V.read_changes(spark, tdir, 1, 2)
    by = {r["_change_type"]: r["count"]
          for r in ch.groupBy("_change_type").count().collect()}
    assert by == {"insert": 20, "delete": 20}


def test_merge_discovery_prunes_by_source_key_envelope(spark, sf_dir, tdir):
    """On a key-clustered layout, the merge's discovery scan (and
    therefore its rewrite set) is bounded by the SOURCE's key envelope
    via manifest stats — merge cost tracks the touched key region, not
    the table."""
    tgt = _orders(spark, sf_dir, 0, 6000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    V.compact_versioned(spark, tdir, target_files=6, sort_by="o_orderkey")
    files_before = set(V.files_for_read(tdir))
    assert len(files_before) == 6
    # sf0.001 orders spans keys 0..1499 -> 6 range files of 250 keys;
    # a <250 source envelope is exactly ONE file's range
    src = tgt.filter("o_orderkey < 250").withColumn(
        "o_totalprice", F.lit(3.0)
    )
    V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        when_not_matched_insert=False,
    )
    files_after = set(V.files_for_read(tdir))
    carried = files_before & files_after
    # at most ~1/6 of the key space touched -> >= 4 of 6 files carried
    assert len(carried) >= 4
    got = V.read_versioned(spark, tdir)
    assert got.filter("o_totalprice = 3.0").count() == src.count()
    assert got.count() == tgt.count()


def test_merge_insert_into_emptied_table(spark, sf_dir, tdir):
    """ADVICE r7 low: a partitioned table emptied by a copy-on-write
    DELETE has zero data files; an insert-only MERGE used to crash in
    _read_manifest_files on the empty file list instead of inserting."""
    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(
        spark, tgt, tdir, mode="append", partition_by=["o_orderpriority"]
    )
    _, n_del = V.delete_versioned(spark, tdir, "o_orderkey >= 0")
    assert n_del == tgt.count()
    assert V.files_for_read(tdir) == []
    src = _orders(spark, sf_dir, 0, 300)
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
    )
    assert c == {"n_updated": 0, "n_deleted": 0, "n_inserted": src.count()}
    got = V.read_versioned(spark, tdir)
    assert got.count() == src.count()
    # partition layout survived the empty->insert transition
    assert all("o_orderpriority=" in f for f in V.files_for_read(tdir))


def test_merge_insert_casts_to_declared_types(spark, sf_dir, tdir):
    """ADVICE r7 medium: the not-matched-insert branch must cast source
    rows to the table's DECLARED types, like the matched-update branch —
    an int-typed source against a bigint column must neither widen
    rewritten rows nor stage physically-divergent parquet."""
    import pyspark.sql.types as T
    from pyspark.sql.types import StructType

    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    # a type-drifted source: int keys, float prices (declared: bigint,
    # double)
    rows = [(5000 + i, 7, 1.5, "3-MEDIUM") for i in range(10)]
    drift_schema = T.StructType([
        T.StructField("o_orderkey", T.IntegerType()),
        T.StructField("o_custkey", T.IntegerType()),
        T.StructField("o_totalprice", T.FloatType()),
        T.StructField("o_orderpriority", T.StringType()),
    ])
    src = spark.createDataFrame(rows, drift_schema)
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
    )
    assert c["n_inserted"] == 10
    got = V.read_versioned(spark, tdir)
    assert got.count() == tgt.count() + 10
    # result schema IS the declared schema — no coercion drift
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert got.schema == StructType.fromJson(m["schema"])
    assert dict(got.dtypes)["o_orderkey"] == "bigint"
    # pinned-schema read of the post-merge snapshot works (physical
    # parquet types match the manifest schema)
    assert got.filter("o_orderkey >= 5000").count() == 10


def test_merge_dv_parity_with_cow(spark, sf_dir, tmp_path):
    """deletion_vectors=True produces the same table state as the
    copy-on-write merge — only the write amplification differs."""
    src = (
        _orders(spark, sf_dir, 0, 3000)
        .filter("o_orderkey % 3 = 0 OR o_orderkey >= 2000")
        .withColumn("o_totalprice", F.lit(9.0))
    )
    results = {}
    for name, dv in (("cow", False), ("mor", True)):
        tdir = str(tmp_path / name)
        V.write_versioned(spark, _orders(spark, sf_dir, 0, 2000), tdir, mode="append")
        v, c = V.merge_versioned(
            spark, tdir, src, on=["o_orderkey"],
            when_matched_update={"o_totalprice": "s.o_totalprice"},
            when_matched_delete="t.o_orderpriority = '1-URGENT'",
            deletion_vectors=dv,
        )
        results[name] = (
            c, sorted(map(tuple, V.read_versioned(spark, tdir).collect()))
        )
    assert results["cow"][0] == results["mor"][0]
    assert results["cow"][1] == results["mor"][1]
    # and the MOR table actually carries a DV
    m = V._load_manifest(str(tmp_path / "mor"), 2)
    assert m.get("dvs") and m["meta"]["merge_dv"] is True


def test_merge_dv_write_amplification(spark, sf_dir, tdir):
    """The MOR merge stages O(changed rows): every original data file
    survives in the manifest (nothing rewritten)."""
    tgt = _orders(spark, sf_dir, 0, 6000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    files_before = set(V.files_for_read(tdir))
    src = tgt.filter("o_orderkey < 120").withColumn("o_totalprice", F.lit(5.0))
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        deletion_vectors=True,
    )
    assert c["n_updated"] == src.count() and c["n_inserted"] == 0
    files_after = set(V.files_for_read(tdir))
    assert files_before <= files_after  # old files all carried
    got = V.read_versioned(spark, tdir)
    assert got.count() == tgt.count()
    assert got.filter("o_totalprice = 5.0").count() == src.count()


def test_merge_dv_stacks_on_prior_dvs_and_compacts(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 2000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    V.delete_versioned(
        spark, tdir, "o_orderkey < 50", deletion_vectors=True
    )
    # a source overlapping the already-deleted range: those keys are
    # gone, so they INSERT (not update), and the new DV must stay
    # disjoint from the delete DV
    src = _orders(spark, sf_dir, 0, 200).withColumn(
        "o_totalprice", F.lit(7.0)
    )
    n_pre_deleted = tgt.filter("o_orderkey < 50").count()
    v, c = V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        deletion_vectors=True,
    )
    assert c["n_inserted"] == n_pre_deleted
    assert c["n_updated"] == src.count() - n_pre_deleted
    got = V.read_versioned(spark, tdir)
    assert got.count() == tgt.count()
    assert got.filter("o_totalprice = 7.0").count() == src.count()
    # OPTIMIZE folds every DV generation away; state identical
    before = sorted(map(tuple, got.collect()))
    V.compact_versioned(spark, tdir, target_files=1)
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert not m.get("dvs")
    assert sorted(map(tuple, V.read_versioned(spark, tdir).collect())) == before


def test_merge_dv_cdf_is_exact(spark, sf_dir, tdir):
    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    src = tgt.filter("o_orderkey % 10 = 0").withColumn(
        "o_totalprice", F.lit(3.5)
    )
    V.merge_versioned(
        spark, tdir, src, on=["o_orderkey"],
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        deletion_vectors=True,
    )
    ch = V.read_changes(spark, tdir, 1, 2)
    by = {r["_change_type"]: r["n"] for r in
          ch.groupBy("_change_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = src.count()
    assert by == {"insert": n, "delete": n}  # update = delete+insert pair


def test_cli_merge_dv(spark, sf_dir, tdir, tmp_path, capsys):
    from datalake_scripts_spark.cli import main

    tgt = _orders(spark, sf_dir, 0, 1000)
    V.write_versioned(spark, tgt, tdir, mode="append")
    batch = tgt.filter("o_orderkey < 100").withColumn(
        "o_totalprice", F.lit(2.0)
    ).unionByName(_orders(spark, sf_dir, 5000, 5050))
    bdir = str(tmp_path / "batch")
    batch.coalesce(1).write.parquet(bdir)
    assert main([
        "table", "--dir", tdir, "--master", "local[4]",
        "merge", "--source", bdir, "--keys", "o_orderkey", "--dv",
    ]) == 0
    out = capsys.readouterr().out
    assert "merge-on-read" in out
    got = V.read_versioned(spark, tdir)
    n_upd = tgt.filter("o_orderkey < 100").count()
    n_ins = _orders(spark, sf_dir, 5000, 5050).count()
    assert got.count() == tgt.count() + n_ins
    assert got.filter("o_totalprice = 2.0").count() == n_upd
    assert V._load_manifest(tdir, 2).get("dvs")
