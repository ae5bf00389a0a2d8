"""Native Spark data source for paginated REST APIs (Spark 4 Python
DataSource API): ``spark.read.format("restpages")``.

The reference ingests REST pages with sequential driver loops
(``json_data_pages`` monkey_load.py:125-131, offset pagination
vk_load.py:163-248). :mod:`sources.rest` already distributes the fetch
via mapInPandas; this module goes one step further and makes paginated
ingest a FIRST-CLASS READER: each page is an ``InputPartition``, so the
fetch parallelism is the cluster width, the scan composes with
``.schema()`` / ``.select()`` / ``.filter()`` like any other source,
and Catalyst sees a real scan node instead of an opaque transform.

Scale notes: partitions are generated from (pages, pages_per_partition)
without any driver-side I/O — listing 1M pages costs 1M tiny objects,
not 1M HTTP calls; per-partition fetches reuse
:class:`sources.rest.RestClient` retry/backoff on the executor. A
failed partition is retried by Spark task retry, giving at-least-once
fetch semantics per page (idempotent GETs make that exactly-once in
practice).

Transport: stdlib urllib via RestClient's default — supports http(s)://
and file:// URLs; tests use file:// fixtures (no network)."""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class RestPagesDataSource(DataSource):
    """``format("restpages")`` options:

    - ``url_template`` (required): URL with a ``{page}`` placeholder,
      e.g. ``https://api.example.com/items?page={page}``.
    - ``pages`` (required): total page count to fetch (0..pages-1).
    - ``pages_per_partition`` (default 1): batch factor for tiny pages.
    - ``records_field`` (optional): field of the response object that
      holds the record list (cursor-style envelopes, reference
      monkey_load.py:128 ``content['data']``); absent -> the body is a
      JSON array (or a single object).
    - ``max_attempts`` (default 5): RestClient retry budget.

    Schema: pass ``.schema(...)`` at read time (explicit-schema policy,
    same as io.read_json — inference would cost a second full fetch).
    """

    @classmethod
    def name(cls) -> str:
        return "restpages"

    def schema(self) -> str | StructType:
        raise ValueError(
            "restpages requires an explicit .schema(...) at read time "
            "(schema inference over a remote API would fetch every page twice)"
        )

    def reader(self, schema: StructType) -> "RestPagesReader":
        return RestPagesReader(schema, self.options)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start = start
        self.end = end


class RestPagesReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        if "url_template" not in options or "pages" not in options:
            raise ValueError("restpages requires url_template and pages options")
        self.schema = schema
        self.url_template = options["url_template"]
        self.pages = int(options["pages"])
        self.per_part = max(1, int(options.get("pages_per_partition", 1)))
        self.records_field = options.get("records_field")
        self.max_attempts = int(options.get("max_attempts", 5))
        self.field_names = [f.name for f in schema.fields]

    def partitions(self) -> Sequence[InputPartition]:
        return [
            _PageRange(s, min(s + self.per_part, self.pages))
            for s in range(0, self.pages, self.per_part)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        # runs on the executor; construct the client here so nothing
        # stateful is pickled into the plan
        from .rest import RestClient

        client = RestClient(max_attempts=self.max_attempts, backoff_base=0.05)
        for page in range(partition.start, partition.end):
            body = client.get(self.url_template.format(page=page))
            doc = json.loads(body)
            if self.records_field is not None:
                doc = doc[self.records_field]
            records = doc if isinstance(doc, list) else [doc]
            for rec in records:
                yield tuple(rec.get(n) for n in self.field_names)


def register_rest_datasource(spark) -> None:
    """Make ``format('restpages')`` available on this session."""
    spark.dataSource.register(RestPagesDataSource)
