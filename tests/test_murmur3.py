"""Iceberg-compatible murmur3 bucket transform (VERDICT r9 ask #3):
spec-vector parity for the pure-Python hash, write-side bucketing +
planning-time prune parity, truthful Iceberg export of murmur3
layouts, continued refusal of xxhash64 layouts, and adoption back."""

from __future__ import annotations

import os
import shutil

import pytest

from datalake_scripts_spark.functions.murmur3 import (
    bucket_long,
    bucket_str,
    hash_long,
    hash_str,
    murmur3_32,
)
from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.iceberg_interop import (
    export_iceberg_metadata,
    import_iceberg_metadata,
)
from datalake_scripts_spark.operators.iceberg_reader import IcebergTable


def test_spec_hash_vectors():
    """The Iceberg table spec's published Appendix-B hash examples,
    plus reference MurmurHash3 x86_32 vectors."""
    # Iceberg spec Appendix B (seed 0, value serializations)
    assert hash_long(34) == 2017239379           # int 34 widened == long
    assert hash_str("iceberg") == 1210000089     # UTF-8 bytes
    assert hash_long(17486) == -653330422        # date 2017-11-16
    assert hash_long(1510871468000000) == -2047944441  # ts micros
    # reference implementation generic vectors
    assert murmur3_32(b"") == 0
    assert murmur3_32(b"hello") & 0xFFFFFFFF == 0x248BFA47
    # bucket = positive-part mod, NOT abs
    assert bucket_long(34, 16) == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_str("iceberg", 16) == (1210000089 & 0x7FFFFFFF) % 16


def test_murmur3_bucket_write_and_prune(spark, tmp_path):
    """bucket_hash='murmur3' layouts: hive directories equal the
    python twin's buckets; an equality predicate prunes to exactly
    the twin's bucket (long and string sources)."""
    base = str(tmp_path / "tbl")
    df = spark.range(800).selectExpr(
        "id AS k", "CAST(id % 13 AS STRING) AS s", "id * 2 AS v"
    )
    V.write_versioned(
        spark, df, base, mode="append",
        partition_by=[
            {"transform": "bucket", "col": "k", "n": 8, "hash": "murmur3"},
            {"transform": "bucket", "col": "s", "n": 3, "hash": "murmur3"},
        ],
    )
    m = V._load_manifest(base, 1)
    spec = V._manifest_partition_spec(m)
    extra = V._translate_skip_filter(
        [("k", "=", 123), ("s", "=", "7")], spec, m.get("schema")
    )
    assert ("_p_bucket_k_8", "=", bucket_long(123, 8)) in extra
    assert ("_p_bucket_s_3", "=", bucket_str("7", 3)) in extra
    got = sorted(map(tuple, V.read_versioned(
        spark, base, skip_filter=[("k", "=", 123)]
    ).filter("k = 123").collect()))
    assert got == [(123, "6", 246)]
    # every staged directory value matches the twin
    for f in V._expand_manifest(base, m)[0]:
        segs = dict(
            seg.split("=", 1) for seg in f.split("/") if "=" in seg
        )
        assert 0 <= int(segs["_p_bucket_k_8"]) < 8
        assert 0 <= int(segs["_p_bucket_s_3"]) < 3


def test_murmur3_rejects_unsupported(spark, tmp_path):
    with pytest.raises(ValueError, match="hash"):
        V._normalize_spec(
            [{"transform": "bucket", "col": "k", "n": 4, "hash": "sha1"}]
        )
    with pytest.raises(ValueError, match="only applies to bucket"):
        V._normalize_spec(
            [{"transform": "days", "col": "ts", "hash": "murmur3"}]
        )
    base = str(tmp_path / "dbl")
    df = spark.range(5).selectExpr("id AS k", "CAST(id AS DOUBLE) AS d")
    with pytest.raises(Exception, match="integral and string"):
        V.write_versioned(
            spark, df, base, mode="append",
            partition_by=[
                {"transform": "bucket", "col": "d", "n": 4,
                 "hash": "murmur3"},
            ],
        )


def test_murmur3_export_roundtrip_and_pruning_parity(spark, tmp_path):
    """A murmur3-bucketed table exports as a true Iceberg bucket[N]
    spec: the independent reader row-matches, per-bucket file sets
    agree between our planner and the manifest partition values, and
    adoption reconstructs the murmur3 spec (pruning keeps working)."""
    base = str(tmp_path / "tbl")
    df = spark.range(500).selectExpr("id AS k", "id * 3 AS v").coalesce(2)
    V.write_versioned(
        spark, df, base, mode="append",
        partition_by=[
            {"transform": "bucket", "col": "k", "n": 4, "hash": "murmur3"},
        ],
    )
    export_iceberg_metadata(base)
    t = IcebergTable(base)
    spec = t.meta["partition-specs"][0]["fields"]
    assert spec[0]["transform"] == "bucket[4]"
    want = sorted(map(tuple, V.read_versioned(spark, base).collect()))
    assert t.to_rows() == want
    # pruning parity across EVERY bucket value
    snap = t.snapshot()
    m = V._load_manifest(base, 1)
    all_files = V._expand_manifest(base, m)[0]
    for b in range(4):
        ice = sorted(
            os.path.basename(e["data_file"]["file_path"])
            for e in snap.data_entries
            if e["data_file"]["partition"]["_p_bucket_k_4"] == b
        )
        ours = sorted(
            os.path.basename(f)
            for f in all_files
            if f"_p_bucket_k_4={b}/" in f
        )
        assert ice == ours, f"bucket {b} file sets diverge"
    # adopt back: spec reconstructed, prune still exact
    shutil.rmtree(os.path.join(base, "_manifests"))
    os.remove(os.path.join(base, "_latest"))
    import_iceberg_metadata(base)
    m2 = V._load_manifest(base, 1)
    assert m2["partition_spec"] == [{
        "transform": "bucket", "col": "k", "n": 4,
        "hash": "murmur3", "name": "_p_bucket_k_4",
    }]
    got = sorted(map(tuple, V.read_versioned(
        spark, base, skip_filter=[("k", "=", 123)]
    ).filter("k = 123").collect()))
    assert got == [(123, 369)]


def test_xxhash64_bucket_still_refused_at_export(spark, tmp_path):
    """Existing xxhash64 layouts must NOT be translated — Iceberg's
    bucket[N] is murmur3, and a lying spec would make foreign readers
    prune wrong (the r9 refusal rationale stands)."""
    base = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    V.write_versioned(
        spark, df, base, mode="append",
        partition_by=[{"transform": "bucket", "col": "k", "n": 4}],
    )
    with pytest.raises(ValueError, match="xxhash64"):
        export_iceberg_metadata(base)
