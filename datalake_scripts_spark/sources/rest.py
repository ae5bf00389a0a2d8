"""REST ingestion surface (reference S8-S12, SURVEY.md §2.1).

The reference's loaders are single-threaded driver scripts: GET with
retry/backoff (``get_content``, monkey_load.py:81-116), cursor
pagination (``json_data_pages``, monkey_load.py:125-131), offset
pagination (vk_load.py:163-248), batched-id fetch (vk_load.py:250-290),
and per-entity fan-out crawl (vk_load.py:292-312).

Engine design: the protocol mechanics (retry, backoff, pagination) are
small driver-side generators with an injectable ``transport`` (any
``url -> bytes`` callable — stdlib urllib in production, a fake in
tests; this module performs no network I/O of its own). The SCALE move
is :func:`distributed_fetch`: the url list becomes a DataFrame and the
fetching runs on executors via Arrow-batched mapInPandas — the
replacement for the reference's sequential per-entity crawl (S12).
"""

from __future__ import annotations

import json
import random
import time
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame

Transport = Callable[[str], bytes]


class RestClient:
    """Retry/backoff GET wrapper (reference ``get_content``,
    monkey_load.py:81-116: <= max_attempts tries, linear-random sleep).

    ``transport`` does the actual I/O; default is stdlib urllib with a
    timeout (only constructed on first use, so tests never touch it).
    """

    def __init__(
        self,
        transport: Transport | None = None,
        max_attempts: int = 5,
        timeout: float = 20.0,
        backoff_base: float = 0.1,
        backoff_jitter: float = 1.0,
        headers: dict[str, str] | None = None,
    ) -> None:
        self.transport = transport
        self.max_attempts = max_attempts
        self.timeout = timeout
        self.backoff_base = backoff_base
        self.backoff_jitter = backoff_jitter
        self.headers = headers or {}

    def _default_transport(self, url: str) -> bytes:
        from urllib.request import Request, urlopen

        req = Request(url, headers=self.headers)
        with urlopen(req, timeout=self.timeout) as resp:
            return resp.read()

    def get(self, url: str) -> bytes:
        transport = self.transport or self._default_transport
        last_err: Exception | None = None
        for attempt in range(1, self.max_attempts + 1):
            try:
                return transport(url)
            except Exception as e:  # noqa: BLE001 - retry any transport error
                last_err = e
                if attempt < self.max_attempts:
                    time.sleep(
                        self.backoff_base * attempt
                        + random.random() * self.backoff_jitter * attempt
                    )
        raise last_err  # type: ignore[misc]

    def get_json(self, url: str) -> dict | list:
        return json.loads(self.get(url))


def cursor_paginate(
    client: RestClient, url: str, next_key: str = "links.next", data_key: str = "data"
) -> Iterator[list]:
    """Follow ``links.next`` until absent, yielding each page's data
    (reference ``json_data_pages``, monkey_load.py:125-131 — which
    accumulated in memory; yielding streams instead)."""
    while url:
        page = client.get_json(url)
        yield page.get(data_key, [])
        nxt: object = page
        for part in next_key.split("."):
            nxt = nxt.get(part) if isinstance(nxt, dict) else None
        url = nxt if isinstance(nxt, str) else None


def offset_paginate(
    client: RestClient,
    url_fmt: str,
    count: int = 100,
    total_key: str = "count",
    items_key: str = "items",
) -> Iterator[list]:
    """offset += count until the reported total is reached (reference
    ``wall_data_write_s3``/``group_members_write_s3``,
    vk_load.py:163-248)."""
    offset = 0
    total: int | None = None
    while total is None or offset < total:
        page = client.get_json(url_fmt.format(offset=offset, count=count))
        if total is None:
            total = int(page.get(total_key, 0))
        items = page.get(items_key, [])
        yield items
        offset += count
        if not items and total and offset < total:
            break  # server stopped paging early; avoid an infinite loop


def chunked_ids(ids: list, chunk: int = 100) -> Iterator[str]:
    """Comma-joined id batches for bulk-fetch endpoints (reference
    ``group_members_full_write_s3``, vk_load.py:250-290)."""
    for i in range(0, len(ids), chunk):
        yield ",".join(str(x) for x in ids[i : i + chunk])


def distributed_fetch(
    urls_df: DataFrame,
    transport: Transport,
    url_col: str = "url",
    max_attempts: int = 3,
) -> DataFrame:
    """Executor-side fan-out fetch: (url) rows -> (url, status, body).

    The scale replacement for the reference's sequential per-member
    crawl (S12, vk_load.py:292-312): urls partition across executors,
    each partition fetches with per-row retry, bodies come back as an
    Arrow-batched string column ready for from_json/normalization.
    ``transport`` must be picklable (top-level function)."""
    import pandas as pd

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = RestClient(transport=transport, max_attempts=max_attempts,
                            backoff_base=0.0, backoff_jitter=0.0)
        for pdf in batches:
            bodies, statuses = [], []
            for url in pdf[url_col]:
                try:
                    bodies.append(client.get(url).decode("utf-8"))
                    statuses.append("ok")
                except Exception as e:  # noqa: BLE001
                    bodies.append(None)
                    statuses.append(f"error: {type(e).__name__}")
            yield pd.DataFrame(
                {"url": pdf[url_col], "status": statuses, "body": bodies}
            )

    return urls_df.mapInPandas(_fetch, "url string, status string, body string")
