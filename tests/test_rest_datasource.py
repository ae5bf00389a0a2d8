"""Custom Python DataSource (format('restpages')) — executor-side
paginated fetch over file:// fixtures, no network."""

import json

import pytest


def _write_pages(tmp_path, n, envelope=False):
    for p in range(n):
        recs = [{"id": p * 10 + i, "name": f"r{p}_{i}"} for i in range(3)]
        body = {"items": recs, "next": p + 1} if envelope else recs
        (tmp_path / f"page{p}.json").write_text(json.dumps(body))
    return f"file://{tmp_path}/page{{page}}.json"


def _read(spark, url, pages, **opts):
    from datalake_scripts_spark.sources.rest_datasource import (
        register_rest_datasource,
    )

    register_rest_datasource(spark)
    reader = (
        spark.read.format("restpages")
        .schema("id long, name string")
        .option("url_template", url)
        .option("pages", pages)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_restpages_array_pages(spark, tmp_path):
    url = _write_pages(tmp_path, 4)
    df = _read(spark, url, 4)
    rows = sorted((r.id, r.name) for r in df.collect())
    assert len(rows) == 12
    assert rows[0] == (0, "r0_0") and rows[-1] == (32, "r3_2")
    # one partition per page -> fetch parallelism is the page count
    assert df.rdd.getNumPartitions() == 4


def test_restpages_envelope_and_batching(spark, tmp_path):
    url = _write_pages(tmp_path, 6, envelope=True)
    df = _read(spark, url, 6, records_field="items", pages_per_partition=3)
    assert df.count() == 18
    assert df.rdd.getNumPartitions() == 2
    # missing field in a record surfaces as NULL, not an error
    assert df.filter("name is null").count() == 0


def test_restpages_requires_schema_and_options(spark, tmp_path):
    from datalake_scripts_spark.sources.rest_datasource import (
        RestPagesReader,
        register_rest_datasource,
    )

    register_rest_datasource(spark)
    from pyspark.sql.types import StructType

    with pytest.raises(Exception, match="url_template"):
        RestPagesReader(StructType([]), {"pages": "2"})
    with pytest.raises(Exception):
        # no .schema() -> DataSource.schema() raises by design
        (
            spark.read.format("restpages")
            .option("url_template", "file:///x/{page}.json")
            .option("pages", 1)
            .load()
            .collect()
        )


def test_reststream_incremental_pages(spark, tmp_path):
    import json as _json
    import time

    from datalake_scripts_spark.sources.rest_datasource import (
        register_rest_datasource,
    )

    register_rest_datasource(spark)

    def put(p):
        (tmp_path / f"page{p}.json").write_text(
            _json.dumps([{"id": p, "name": f"r{p}"}])
        )

    put(0)
    put(1)
    url = f"file://{tmp_path}/page{{page}}.json"
    stream = (
        spark.readStream.format("reststream")
        .schema("id long, name string")
        .option("url_template", url)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("rest_stream_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from rest_stream_sink").first().c >= 2:
                break
            time.sleep(0.5)
        # a new page published after the stream started is picked up
        put(2)
        while time.time() < deadline:
            if spark.sql("select count(*) c from rest_stream_sink").first().c >= 3:
                break
            time.sleep(0.5)
        rows = sorted(
            (r.id, r.name)
            for r in spark.sql("select * from rest_stream_sink").collect()
        )
        assert rows == [(0, "r0"), (1, "r1"), (2, "r2")]
    finally:
        q.stop()
