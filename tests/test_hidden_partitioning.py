"""Hidden partitioning — Iceberg transform partition specs on the
versioned lake (operators/versioned.py hidden-partitioning block).

Contract: partition_by entries may be transforms (days/months/hours/
years/bucket/truncate) of a source column; the derived value lives
ONLY in the hive directory layout (never in the schema or results);
source-column skip_filters prune files through BOTH the source footer
stats and the translated hidden partition values; DML/OPTIMIZE
rewrites preserve the layout; renames relabel the spec without
touching the frozen hidden names. functions/xxh.py is pinned
bit-identical to F.xxhash64 so bucket equality translates driver-side.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.functions.xxh import xxhash64_long, xxhash64_str
from datalake_scripts_spark.operators import versioned as V


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def _events(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def test_xxhash64_parity_with_spark(spark):
    longs = [0, 1, -1, 42, 2**40, -(2**40), 7_777_777]
    df = spark.createDataFrame([(v,) for v in longs], "v long").select(
        "v", F.xxhash64("v").alias("h")
    )
    got = {r["v"]: r["h"] for r in df.collect()}
    assert got == {v: xxhash64_long(v) for v in longs}
    strs = ["", "a", "spark", "0123456789abcdef0123456789abcdef0123", "naïve"]
    df2 = spark.createDataFrame([(s,) for s in strs], "s string").select(
        "s", F.xxhash64("s").alias("h")
    )
    got2 = {r["s"]: r["h"] for r in df2.collect()}
    assert got2 == {s: xxhash64_str(s) for s in strs}


def test_days_transform_layout_and_schema(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    files = V.files_for_read(tdir)
    assert all("_p_days_ts=" in f for f in files)
    got = V.read_versioned(spark, tdir)
    # hidden column never leaks into results
    assert got.columns == ev.columns
    assert got.count() == ev.count()


def test_days_skip_filter_prunes_files(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    one_day = [r["d"] for r in ev.select(
        F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()][0]
    all_files = V.files_for_read(tdir)
    pruned = V.files_for_read(
        tdir, skip_filter=[("ts", ">=", f"{one_day}T00:00:00"),
                           ("ts", "<=", f"{one_day}T23:59:59")]
    )
    assert 0 < len(pruned) < len(all_files)
    assert all(f"_p_days_ts={one_day}" in f for f in pruned)
    got = V.read_versioned(
        spark, tdir,
        skip_filter=[("ts", ">=", f"{one_day}T00:00:00"),
                     ("ts", "<=", f"{one_day}T23:59:59")],
    )
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == one_day).count()
    assert got.count() == want


def test_bucket_transform_equality_pruning(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "bucket", "col": "user_id", "n": 8}],
    )
    uid = ev.select("user_id").first()["user_id"]
    all_files = V.files_for_read(tdir)
    pruned = V.files_for_read(tdir, skip_filter=[("user_id", "=", int(uid))])
    assert 0 < len(pruned) < len(all_files)
    expect_bucket = xxhash64_long(int(uid)) % 8
    assert all(f"_p_bucket_user_id_8={expect_bucket}" in f for f in pruned)
    got = V.read_versioned(
        spark, tdir, skip_filter=[("user_id", "=", int(uid))]
    )
    assert got.count() == ev.filter(F.col("user_id") == uid).count()


def test_bucket_transform_integer_typed_column(spark, tdir):
    # ADVICE r7 high: IntegerType sources used to hash via Spark's
    # 4-byte xxhash64 path while the translation twin hashed 8 bytes —
    # equality skip_filters silently dropped rows. The fix casts
    # integral sources to bigint at staging, so the 8-byte twin is
    # exact for every integral width.
    import pyspark.sql.types as T

    rows = [(i, f"u{i % 7}", float(i)) for i in range(200)]
    schema = T.StructType([
        T.StructField("k", T.IntegerType()),
        T.StructField("who", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    df = spark.createDataFrame(rows, schema).repartition(4)
    V.write_versioned(
        spark, df, tdir, mode="append",
        partition_by=[{"transform": "bucket", "col": "k", "n": 8}],
    )
    all_files = V.files_for_read(tdir)
    for probe in (0, 1, 42, 137, 199):
        pruned = V.files_for_read(tdir, skip_filter=[("k", "=", probe)])
        expect_bucket = xxhash64_long(probe) % 8
        assert pruned, f"k={probe} pruned to nothing (wrong bucket)"
        assert all(
            f"_p_bucket_k_8={expect_bucket}" in f for f in pruned
        ), f"k={probe} translated into the wrong bucket"
        assert len(pruned) < len(all_files)
        got = V.read_versioned(spark, tdir, skip_filter=[("k", "=", probe)])
        assert got.count() == 1


def test_bucket_translation_skips_untranslatable_types(spark, tdir):
    # a bucket transform over a DATE column hashes Spark-natively at
    # write; the twin can't reproduce that, so translation must SKIP
    # (no conjunct) rather than prune into a wrong bucket — the read
    # falls back to footer stats and stays correct.
    import datetime

    import pyspark.sql.types as T

    rows = [
        (datetime.date(2024, 1, 1 + (i % 28)), i) for i in range(100)
    ]
    schema = T.StructType([
        T.StructField("d", T.DateType()),
        T.StructField("n", T.IntegerType()),
    ])
    df = spark.createDataFrame(rows, schema).repartition(3)
    V.write_versioned(
        spark, df, tdir, mode="append",
        partition_by=[{"transform": "bucket", "col": "d", "n": 4}],
    )
    m = V._load_manifest(tdir, V.current_version(tdir))
    # ISO-string equality on a date column: value type disagrees with
    # an integral/string declared pairing -> no translated conjunct
    assert V._translate_skip_filter(
        [("d", "=", "2024-01-05")],
        V._manifest_partition_spec(m),
        m.get("schema"),
    ) == []
    got = V.read_versioned(
        spark, tdir, skip_filter=[("d", "=", "2024-01-05")]
    )
    assert got.count() == sum(
        1 for d, _ in rows if d == datetime.date(2024, 1, 5)
    )


def test_truncate_transform_int_and_identity_mix(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[
            "event_type",
            {"transform": "truncate", "col": "user_id", "n": 500},
        ],
    )
    files = V.files_for_read(tdir)
    assert all(
        "event_type=" in f and "_p_truncate_user_id_500=" in f for f in files
    )
    # identity entry still prunes; truncate clusters tighten footer stats
    pruned = V.files_for_read(
        tdir,
        skip_filter=[("event_type", "=", "click"), ("user_id", "<", 500)],
    )
    assert 0 < len(pruned) < len(files)
    got = V.read_versioned(
        spark, tdir,
        skip_filter=[("event_type", "=", "click"), ("user_id", "<", 500)],
    )
    want = ev.filter(
        (F.col("event_type") == "click") & (F.col("user_id") < 500)
    ).count()
    assert got.count() == want


def test_dml_preserves_transform_layout(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    n0 = ev.count()
    _, n_del = V.delete_versioned(spark, tdir, "event_type = 'error'")
    assert n_del == ev.filter("event_type = 'error'").count()
    assert all("_p_days_ts=" in f for f in V.files_for_read(tdir))
    _, n_upd = V.update_versioned(
        spark, tdir, "event_type = 'click'", {"value": "0.0"}
    )
    assert all("_p_days_ts=" in f for f in V.files_for_read(tdir))
    got = V.read_versioned(spark, tdir)
    assert got.count() == n0 - n_del
    assert got.filter("event_type = 'click' AND value <> 0.0").count() == 0


def test_compact_preserves_transform_layout(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    V.write_versioned(spark, ev.limit(100), tdir, mode="append")
    V.compact_versioned(spark, tdir, target_files=1)
    files = V.files_for_read(tdir)
    assert files and all("_p_days_ts=" in f for f in files)
    assert V.read_versioned(spark, tdir).count() == ev.count() + 100


def test_spec_evolution_gate_and_rename(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    spec = [{"transform": "days", "col": "ts"}]
    V.write_versioned(spark, ev, tdir, mode="append", partition_by=spec)
    with pytest.raises(ValueError, match="partition spec"):
        V.write_versioned(
            spark, ev.limit(5), tdir, mode="append",
            partition_by=[{"transform": "months", "col": "ts"}],
        )
    # rename the SOURCE column: spec relabels, hidden name frozen,
    # old directories keep pruning
    V.rename_column(tdir, "ts", "event_ts")
    m = V._load_manifest(tdir, V.current_version(tdir))
    assert m["partition_spec"][0]["col"] == "event_ts"
    assert m["partition_spec"][0]["name"] == "_p_days_ts"
    day = "2024-01-05"
    got = V.read_versioned(
        spark, tdir,
        skip_filter=[("event_ts", ">=", f"{day}T00:00:00"),
                     ("event_ts", "<=", f"{day}T23:59:59")],
    )
    want = ev.filter(F.date_format("ts", "yyyy-MM-dd") == day).count()
    assert got.count() == want
    # dropping a transform SOURCE column is refused like an identity one
    with pytest.raises(ValueError, match="partition spec"):
        V.drop_column(tdir, "event_ts")


def test_bad_specs_raise(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    with pytest.raises(ValueError, match="unknown partition transform"):
        V.write_versioned(
            spark, ev, tdir, mode="append",
            partition_by=[{"transform": "weeks", "col": "ts"}],
        )
    with pytest.raises(ValueError, match="integer n"):
        V.write_versioned(
            spark, ev, tdir, mode="append",
            partition_by=[{"transform": "bucket", "col": "user_id"}],
        )


def test_delta_export_refuses_transform_spec(spark, sf_dir, tdir):
    from datalake_scripts_spark.operators.delta_interop import (
        export_delta_log,
    )

    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    with pytest.raises(ValueError, match="hidden"):
        export_delta_log(tdir)


def test_chunked_manifest_with_transform_spec(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
        manifest_chunking="partition",
    )
    day = "2024-01-03"
    flt = [("ts", ">=", f"{day}T00:00:00"), ("ts", "<=", f"{day}T23:59:59")]
    loaded = V.manifest_chunks_for_read(tdir, skip_filter=flt)
    total = V.manifest_chunks_for_read(tdir)
    assert 0 < len(loaded) < len(total)
    got = V.read_versioned(spark, tdir, skip_filter=flt)
    assert got.count() == ev.filter(
        F.date_format("ts", "yyyy-MM-dd") == day
    ).count()


def test_months_and_hours_transforms(spark, sf_dir, tdir, tmp_path):
    ev = _events(spark, sf_dir)
    # months: all events are 2024-01 -> single partition, no pruning
    # possible, but layout + read-back must hold
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "months", "col": "ts"}],
    )
    files = V.files_for_read(tdir)
    assert files and all("_p_months_ts=2024-01" in f for f in files)
    assert V.read_versioned(spark, tdir).count() == ev.count()

    # hours: one day's events split by hour; an hour-range filter must
    # prune to exactly that hour's directories
    hdir = str(tmp_path / "hours")
    one_day = ev.filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
    V.write_versioned(
        spark, one_day, hdir, mode="append",
        partition_by=[{"transform": "hours", "col": "ts"}],
    )
    # pick an hour that actually has data at this SF
    hour = int(
        one_day.select(F.hour("ts").alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).first()["h"]
    )
    flt = [("ts", ">=", f"2024-01-05T{hour:02d}:00:00"),
           ("ts", "<=", f"2024-01-05T{hour:02d}:59:59")]
    pruned = V.files_for_read(hdir, skip_filter=flt)
    assert pruned and all(
        f"_p_hours_ts=2024-01-05-{hour:02d}" in f for f in pruned
    )
    got = V.read_versioned(spark, hdir, skip_filter=flt)
    want = one_day.filter(F.hour("ts") == hour).count()
    assert got.count() == want


def test_years_transform_and_equality_translation(spark, sf_dir, tdir):
    ev = _events(spark, sf_dir)
    V.write_versioned(
        spark, ev, tdir, mode="append",
        partition_by=[{"transform": "years", "col": "ts"}],
    )
    files = V.files_for_read(tdir)
    assert files and all("_p_years_ts=2024" in f for f in files)
    # equality on the source timestamp translates to the year value
    one_ts = ev.select("ts").first()["ts"]
    got = V.read_versioned(
        spark, tdir, skip_filter=[("ts", "=", one_ts.isoformat())]
    )
    assert got.count() >= 1
