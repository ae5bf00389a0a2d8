"""Typed casts (the reference's 4 timestamp format families + epoch
seconds) and the bracketed-log parse with its malformed-line fallback."""

import datetime

from pyspark.sql import Row, functions as F

from datalake_scripts_spark.functions.casts import (
    array_to_csv,
    to_ts_epoch_seconds,
    to_ts_fractional,
    to_ts_iso,
    to_ts_iso_z,
)
from datalake_scripts_spark.functions.logparse import with_parsed_log


def test_timestamp_families(spark):
    df = spark.createDataFrame(
        [
            Row(
                iso="2023-05-01T10:20:30",
                iso_z="2023-05-01T10:20:30Z",
                frac="2023-05-01 10:20:30.123",
                epoch=1682936430,
            )
        ]
    )
    out = df.select(
        to_ts_iso("iso").alias("a"),
        to_ts_iso_z("iso_z").alias("b"),
        to_ts_fractional("frac").alias("c"),
        to_ts_epoch_seconds("epoch").alias("d"),
    ).first()
    expected = datetime.datetime(2023, 5, 1, 10, 20, 30)
    assert out.a == expected
    assert out.b == expected
    assert out.c == expected.replace(microsecond=123000)
    assert out.d == datetime.datetime(2023, 5, 1, 10, 20, 30)


def test_null_timestamp_on_mismatch(spark):
    # to_timestamp yields NULL on format mismatch (reference crashes the
    # select instead; engine policy is explicit nullability)
    df = spark.createDataFrame([Row(s="not-a-date")])
    assert df.select(to_ts_iso("s").alias("ts")).first().ts is None


def test_array_to_csv(spark):
    df = spark.createDataFrame([Row(a=["10.0.0.1", "10.0.0.2"]), Row(a=[])])
    vals = [r.csv for r in df.select(array_to_csv("a").alias("csv")).collect()]
    assert sorted(vals) == ["", "10.0.0.1,10.0.0.2"]


def test_logparse_well_formed(spark):
    df = spark.createDataFrame(
        [Row(log="[I 2023-05-01 10:00:00.123 JupyterHub app:123] doing things")]
    )
    r = with_parsed_log(df).first()
    assert (r.head, r.log_ts, r.service, r.type, r.code, r.msg) == (
        "I",
        "2023-05-01 10:00:00.123",
        "JupyterHub",
        "app",
        "123",
        "doing things",
    )


def test_logparse_malformed_fallback(spark):
    # jhub_proc.py:142-145 semantics: all-empty fields, whole line as msg
    df = spark.createDataFrame([Row(log="no brackets here at all")])
    r = with_parsed_log(df).first()
    assert (r.head, r.log_ts, r.service, r.type, r.code) == ("", "", "", "", "")
    assert r.msg == "no brackets here at all"
