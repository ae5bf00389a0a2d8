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
