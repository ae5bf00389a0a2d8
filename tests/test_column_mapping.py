"""Column mapping on versioned tables: RENAME / DROP COLUMN as
metadata-only commits (Delta columnMapping.mode=name semantics — the
schema-evolution feature VERDICT r6 ask #7 called out). Data files,
stats, blooms, and hive partition directories always speak stable
PHYSICAL names; the manifest schema's field names are the LOGICAL
names users see, so a rename rewrites one manifest, never a file."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import versioned as V


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _nation(spark, sf_dir):
    return read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


def _data_files(tdir):
    m = V._load_manifest(tdir, V.current_version(tdir))
    return sorted(V._expand_manifest(tdir, m)[0])


def test_rename_is_metadata_only_and_reads_old_files(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir)
    files_before = _data_files(tdir)
    mtimes = {f: os.path.getmtime(os.path.join(tdir, f)) for f in files_before}

    v = V.rename_column(tdir, "n_name", "nation_name")
    assert v == 2
    # zero data movement: identical file list, untouched mtimes
    assert _data_files(tdir) == files_before
    assert all(
        os.path.getmtime(os.path.join(tdir, f)) == mtimes[f]
        for f in files_before
    )
    got = V.read_versioned(spark, tdir)
    assert got.columns == ["n_nationkey", "nation_name", "n_regionkey"]
    assert sorted(r.nation_name for r in got.collect()) == sorted(
        r.n_name for r in nation.collect()
    )
    # time travel still shows the OLD logical name
    old = V.read_versioned(spark, tdir, version=1)
    assert old.columns == ["n_nationkey", "n_name", "n_regionkey"]


def test_append_after_rename_writes_physical_names(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation.filter(F.col("n_nationkey") < 10), tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    # appends speak LOGICAL names (the user-facing schema)
    batch = nation.filter(F.col("n_nationkey") >= 10).withColumnRenamed(
        "n_name", "nation_name"
    )
    V.write_versioned(spark, batch, tdir, mode="append")
    got = V.read_versioned(spark, tdir)
    assert got.count() == nation.count()
    # the new file's parquet footer carries the PHYSICAL name (n_name):
    # all files of a mapped table are uniform in physical space
    import pyarrow.parquet as pq

    for f in _data_files(tdir):
        names = pq.read_schema(os.path.join(tdir, f)).names
        assert "n_name" in names and "nation_name" not in names


def test_rename_then_rename_back(spark, sf_dir, tdir):
    V.write_versioned(spark, _nation(spark, sf_dir), tdir)
    V.rename_column(tdir, "n_name", "tmp_name")
    V.rename_column(tdir, "tmp_name", "n_name")
    got = V.read_versioned(spark, tdir)
    assert got.columns == ["n_nationkey", "n_name", "n_regionkey"]
    assert got.count() == 25


def test_rename_collision_and_missing_raise(spark, sf_dir, tdir):
    V.write_versioned(spark, _nation(spark, sf_dir), tdir)
    with pytest.raises(ValueError, match="already exists"):
        V.rename_column(tdir, "n_name", "n_regionkey")
    with pytest.raises(ValueError, match="no column"):
        V.rename_column(tdir, "nope", "x")


def test_drop_column_then_readd_does_not_resurrect(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir)
    V.drop_column(tdir, "n_name")
    got = V.read_versioned(spark, tdir)
    assert got.columns == ["n_nationkey", "n_regionkey"]
    # re-add the same LOGICAL name: fresh cid/physical — the dropped
    # column's data in the old files must NOT come back
    batch = nation.limit(3).select(
        "n_nationkey", "n_regionkey", F.lit("fresh").alias("n_name")
    )
    V.write_versioned(spark, batch, tdir, mode="append", merge_schema=True)
    got = V.read_versioned(spark, tdir).collect()
    vals = {r.n_name for r in got}
    assert vals == {None, "fresh"}  # old rows null, never old n_name data
    n_fresh = sum(1 for r in got if r.n_name == "fresh")
    assert n_fresh == 3
    # max_column_id is monotonic: the re-added column's cid is new
    m = V._load_manifest(tdir, V.current_version(tdir))
    cids = [
        (f.get("metadata") or {}).get("cid") for f in m["schema"]["fields"]
    ]
    assert m["max_column_id"] == max(cids) and len(set(cids)) == len(cids)


def test_drop_partition_column_raises_and_drop_only_column(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir, partition_by=["n_regionkey"])
    with pytest.raises(ValueError, match="partition spec"):
        V.drop_column(tdir, "n_regionkey")
    solo = str(tdir) + "_solo"
    V.write_versioned(spark, nation.select("n_name"), solo)
    with pytest.raises(ValueError, match="only column"):
        V.drop_column(solo, "n_name")


def test_skip_filter_prunes_through_rename(spark, sf_dir, tdir):
    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    # range-clustered files so min/max stats are selective
    df = orders.repartitionByRange(4, "o_orderkey")
    V.write_versioned(spark, df, tdir)
    all_files = V.files_for_read(tdir)
    V.rename_column(tdir, "o_orderkey", "order_id")
    pruned = V.files_for_read(tdir, skip_filter=[("order_id", "<", 100)])
    assert 0 < len(pruned) < len(all_files)
    got = V.read_versioned(spark, tdir, skip_filter=[("order_id", "<", 100)])
    assert got.count() == orders.filter(F.col("o_orderkey") < 100).count()


def test_bloom_index_survives_rename(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir, bloom_cols=["n_name"])
    V.rename_column(tdir, "n_name", "nation_name")
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert m["bloom_cols"] == ["nation_name"]  # relabeled with the column
    # point lookup on the NEW logical name still consults the bloom
    hit = V.files_for_read(
        tdir, skip_filter=[("nation_name", "=", "NATION_3")]
    )
    miss = V.files_for_read(
        tdir, skip_filter=[("nation_name", "=", "NATION_3x")]
    )
    assert len(hit) >= 1 and len(miss) == 0


def test_partition_column_rename_relabel_spec(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir, partition_by=["n_regionkey"])
    V.rename_column(tdir, "n_regionkey", "region_id")
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert m["partition_spec"] == ["region_id"]
    # appends keep laying files out hive-style under the PHYSICAL name
    batch = nation.limit(2).withColumnRenamed("n_regionkey", "region_id")
    V.write_versioned(spark, batch, tdir, mode="append")
    new_files = [f for f in _data_files(tdir)]
    assert all("n_regionkey=" in f for f in new_files)
    got = V.read_versioned(
        spark, tdir, skip_filter=[("region_id", "=", 1)]
    )
    expected = (
        nation.filter(F.col("n_regionkey") == 1).count()
        + batch.filter(F.col("region_id") == 1).count()
    )
    assert got.count() == expected


def test_cdf_across_rename_fast_path(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation.filter(F.col("n_nationkey") < 10), tdir)
    V.rename_column(tdir, "n_name", "nation_name")  # v2, adds no files
    V.write_versioned(
        spark,
        nation.filter(F.col("n_nationkey") >= 10).withColumnRenamed(
            "n_name", "nation_name"
        ),
        tdir,
        mode="append",
    )  # v3
    # the rename commit itself produces NO change rows
    ch12 = V.read_changes(spark, tdir, 1, 2)
    assert ch12.count() == 0
    # changes across the rename arrive under the END version's schema
    ch03 = V.read_changes(spark, tdir, 0, 3)
    assert "nation_name" in ch03.columns
    assert ch03.count() == 25
    ch13 = V.read_changes(spark, tdir, 1, 3)
    assert ch13.count() == 15


def test_cdf_diff_path_across_rename(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    _, n_del = V.delete_versioned(spark, tdir, "n_nationkey < 5")
    assert n_del == 5
    ch = V.read_changes(spark, tdir, 1, 3)
    dels = ch.filter(F.col("_change_type") == "delete")
    assert dels.count() == 5
    assert "nation_name" in ch.columns


def test_dml_and_compact_on_mapped_table(spark, sf_dir, tdir):
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    # UPDATE through the new logical name
    _, n_upd = V.update_versioned(
        spark, tdir, "n_nationkey = 3", {"nation_name": "'RENAMED'"}
    )
    assert n_upd == 1
    got = V.read_versioned(spark, tdir)
    assert got.filter(F.col("nation_name") == "RENAMED").count() == 1
    # OPTIMIZE (full overwrite) keeps the mapping: physical names stable
    V.compact_versioned(spark, tdir, target_files=1)
    m = V._load_manifest(tdir, V.current_version(tdir))
    phys = {
        f["name"]: (f.get("metadata") or {}).get("physical")
        for f in m["schema"]["fields"]
    }
    assert phys["nation_name"] == "n_name"
    got = V.read_versioned(spark, tdir)
    assert got.filter(F.col("nation_name") == "RENAMED").count() == 1
    assert got.count() == 25


def test_contract_checker_through_rename(spark, sf_dir, tdir):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    V.write_versioned(spark, _nation(spark, sf_dir), tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    # a consumer pinned to the NEW logical name passes
    ok = StructType([StructField("nation_name", StringType(), True)])
    assert V.read_versioned(spark, tdir, contract=ok).count() == 25
    # a consumer REQUIRING the old name fails fast with a clear message
    # (a nullable stale column is tolerated by design: it null-fills,
    # exactly like any other absent optional column)
    stale = StructType([StructField("n_name", StringType(), False)])
    with pytest.raises(ValueError, match="n_name"):
        V.read_versioned(spark, tdir, contract=stale)
    # types still validate on the logical schema
    bad = StructType([StructField("nation_name", LongType(), True)])
    with pytest.raises(ValueError, match="nation_name"):
        V.read_versioned(spark, tdir, contract=bad)


def test_streaming_source_reads_mapped_table(spark, sf_dir, tdir):
    from datalake_scripts_spark.sources.versioned_datasource import (
        register_versioned_datasource,
    )

    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation.filter(F.col("n_nationkey") < 10), tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    V.write_versioned(
        spark,
        nation.filter(F.col("n_nationkey") >= 10).withColumnRenamed(
            "n_name", "nation_name"
        ),
        tdir,
        mode="append",
    )
    register_versioned_datasource(spark)
    q = (
        spark.readStream.format("versioned_changes")
        .load(tdir)
        .writeStream.format("memory")
        .queryName("mapped_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM mapped_sink").collect()
    assert len(got) == 25
    assert sorted(r.nation_name for r in got) == sorted(
        r.n_name for r in nation.collect()
    )


def test_wap_audit_write_on_mapped_table(spark, sf_dir, tdir):
    from datalake_scripts_spark.operators.quality import (
        not_null,
        write_audit_publish,
    )

    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation.filter(F.col("n_nationkey") < 10), tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    batch = nation.filter(F.col("n_nationkey") >= 10).withColumnRenamed(
        "n_name", "nation_name"
    )
    write_audit_publish(
        spark,
        batch,
        tdir,
        rules=[not_null("nation_name")],
    )
    assert V.read_versioned(spark, tdir).count() == 25


def test_shallow_clone_carries_mapping_high_water_mark(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    nation = _nation(spark, sf_dir)
    V.write_versioned(spark, nation, src)
    V.drop_column(src, "n_name")  # physical n_name stays in src files
    V.clone_versioned(spark, src, dst, shallow=True)
    src_m = V._load_manifest(src, V.current_version(src))
    dst_m = V._load_manifest(dst, V.current_version(dst))
    assert dst_m["max_column_id"] >= src_m["max_column_id"]
    # re-adding n_name in the CLONE gets a fresh physical name — the
    # shallow-referenced source files' old data never resurrects
    batch = nation.limit(2).select(
        "n_nationkey", "n_regionkey", F.lit("new").alias("n_name")
    )
    V.write_versioned(spark, batch, dst, mode="append", merge_schema=True)
    vals = {r.n_name for r in V.read_versioned(spark, dst).collect()}
    assert vals == {None, "new"}


def test_manifest_json_shape(spark, sf_dir, tdir):
    """The mapping is plain JSON on the manifest schema (inspectable,
    delta-interop translatable): physical + cid per field metadata,
    max_column_id at top level."""
    V.write_versioned(spark, _nation(spark, sf_dir), tdir)
    V.rename_column(tdir, "n_name", "nation_name")
    m = json.loads(
        open(
            os.path.join(tdir, "_manifests", V._manifest_name(2))
        ).read()
    )
    fields = {f["name"]: f["metadata"] for f in m["schema"]["fields"]}
    assert fields["nation_name"]["physical"] == "n_name"
    assert fields["nation_name"]["cid"] == 2
    assert m["max_column_id"] == 3
    assert m["meta"]["schema_change"] == {
        "op": "rename",
        "from": "n_name",
        "to": "nation_name",
    }
