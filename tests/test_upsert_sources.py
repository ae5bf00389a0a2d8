"""Upsert/SCD2 emulation and the REST ingestion surface."""

import datetime as dt
import json

import pytest
from pyspark.sql import Row

from datalake_scripts_spark.operators.upsert import merge_upsert, scd2_apply
from datalake_scripts_spark.sources.rest import (
    RestClient,
    chunked_ids,
    cursor_paginate,
    distributed_fetch,
    offset_paginate,
)


# ---------------------------------------------------------------- upsert ----


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [Row(k=1, v="old1"), Row(k=2, v="old2"), Row(k=3, v="old3")]
    )
    source = spark.createDataFrame([Row(k=2, v="new2"), Row(k=4, v="new4")])
    out = {r.k: r.v for r in merge_upsert(target, source, ["k"]).collect()}
    assert out == {1: "old1", 2: "new2", 3: "old3", 4: "new4"}


def test_merge_upsert_rejects_dup_source(spark):
    target = spark.createDataFrame([Row(k=1, v="a")])
    source = spark.createDataFrame([Row(k=2, v="x"), Row(k=2, v="y")])
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(target, source, ["k"])


def test_scd2_apply(spark):
    t0, t1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 2, 1)
    current = spark.createDataFrame(
        [
            Row(k=1, city="SPB", effective_ts=t0, end_ts=None, is_current=True),
            Row(k=2, city="MSK", effective_ts=t0, end_ts=None, is_current=True),
            # pre-existing history row
            Row(k=1, city="OLD", effective_ts=dt.datetime(2023, 1, 1), end_ts=t0,
                is_current=False),
        ]
    )
    updates = spark.createDataFrame(
        [
            Row(k=1, city="KZN", ts=t1),   # changed -> close + new version
            Row(k=2, city="MSK", ts=t1),   # unchanged -> passthrough
            Row(k=3, city="EKB", ts=t1),   # new key -> insert open
        ]
    )
    out = scd2_apply(current, updates, ["k"], ["city"]).collect()
    rows = {(r.k, r.city): r for r in out}
    assert len(out) == 5
    closed = rows[(1, "SPB")]
    assert closed.end_ts == t1 and closed.is_current is False
    new_v = rows[(1, "KZN")]
    assert new_v.is_current is True and new_v.effective_ts == t1
    assert rows[(2, "MSK")].is_current is True
    assert rows[(2, "MSK")].effective_ts == t0  # untouched
    assert rows[(3, "EKB")].is_current is True
    assert rows[(1, "OLD")].is_current is False  # history preserved


def test_scd2_from_changes_collapse_and_intervals(spark):
    from datalake_scripts_spark.operators.upsert import scd2_from_changes

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    changes = spark.createDataFrame(
        [
            Row(k=1, city="SPB", ts=t(1), seq=1),
            Row(k=1, city="SPB", ts=t(2), seq=2),  # no change -> collapses
            Row(k=1, city="MSK", ts=t(3), seq=3),
            Row(k=2, city="EKB", ts=t(5), seq=4),
        ]
    )
    out = scd2_from_changes(changes, ["k"], ["city"], tiebreak=["seq"]).collect()
    rows = {(r.k, r.city): r for r in out}
    assert len(out) == 3
    v1 = rows[(1, "SPB")]
    assert (v1.valid_from, v1.valid_to, v1.is_current) == (t(1), t(3), False)
    v2 = rows[(1, "MSK")]
    assert (v2.valid_from, v2.valid_to, v2.is_current) == (t(3), None, True)
    assert rows[(2, "EKB")].is_current is True


def test_scd2_from_changes_last_write_wins(spark):
    from datalake_scripts_spark.operators.upsert import scd2_from_changes

    ts = dt.datetime(2024, 1, 1)
    changes = spark.createDataFrame(
        [
            Row(k=1, city="A", ts=ts, seq=1),
            Row(k=1, city="B", ts=ts, seq=2),  # same ts, later seq wins
        ]
    )
    out = scd2_from_changes(changes, ["k"], ["city"], tiebreak=["seq"]).collect()
    assert len(out) == 1 and out[0].city == "B" and out[0].is_current is True


def test_scd2_from_changes_matches_incremental_apply(spark):
    """Full-history build == initial build + scd2_apply of a later batch,
    restricted to open rows (apply keeps richer closed-row history; the
    open frontier must agree)."""
    from datalake_scripts_spark.operators.upsert import scd2_from_changes

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    all_changes = [
        Row(k=1, city="SPB", ts=t(1), seq=1),
        Row(k=2, city="MSK", ts=t(1), seq=2),
        Row(k=1, city="KZN", ts=t(4), seq=3),
        Row(k=3, city="EKB", ts=t(4), seq=4),
    ]
    full = scd2_from_changes(
        spark.createDataFrame(all_changes), ["k"], ["city"], tiebreak=["seq"]
    )
    initial = scd2_from_changes(
        spark.createDataFrame(all_changes[:2]), ["k"], ["city"], tiebreak=["seq"]
    ).withColumnRenamed("valid_from", "effective_ts").withColumnRenamed(
        "valid_to", "end_ts"
    )
    batch = spark.createDataFrame(all_changes[2:]).drop("seq")
    applied = scd2_apply(initial, batch, ["k"], ["city"])

    open_full = {
        (r.k, r.city, r.valid_from)
        for r in full.filter("is_current").collect()
    }
    open_applied = {
        (r.k, r.city, r.effective_ts)
        for r in applied.filter("is_current").collect()
    }
    assert open_full == open_applied


# ---------------------------------------------------------------- sources ---


class FlakyTransport:
    """Fails n times per url, then serves from a dict."""

    def __init__(self, pages: dict[str, object], fail_first: int = 0):
        self.pages = pages
        self.fail_first = fail_first
        self.calls: dict[str, int] = {}

    def __call__(self, url: str) -> bytes:
        n = self.calls.get(url, 0)
        self.calls[url] = n + 1
        if n < self.fail_first:
            raise ConnectionError("flaky")
        if url not in self.pages:
            raise FileNotFoundError(url)
        return json.dumps(self.pages[url]).encode()


def test_rest_client_retries():
    tr = FlakyTransport({"u": {"ok": 1}}, fail_first=2)
    client = RestClient(transport=tr, max_attempts=3, backoff_base=0, backoff_jitter=0)
    assert client.get_json("u") == {"ok": 1}
    assert tr.calls["u"] == 3


def test_rest_client_exhausts():
    tr = FlakyTransport({}, fail_first=99)
    client = RestClient(transport=tr, max_attempts=2, backoff_base=0, backoff_jitter=0)
    with pytest.raises(ConnectionError):
        client.get("u")


def test_cursor_paginate():
    pages = {
        "p1": {"data": [1, 2], "links": {"next": "p2"}},
        "p2": {"data": [3], "links": {}},
    }
    client = RestClient(transport=FlakyTransport(pages))
    assert list(cursor_paginate(client, "p1")) == [[1, 2], [3]]


def test_offset_paginate():
    pages = {
        "o=0": {"count": 5, "items": [0, 1]},
        "o=2": {"count": 5, "items": [2, 3]},
        "o=4": {"count": 5, "items": [4]},
    }
    client = RestClient(transport=FlakyTransport(pages))
    got = list(offset_paginate(client, "o={offset}", count=2))
    assert got == [[0, 1], [2, 3], [4]]


def test_chunked_ids():
    assert list(chunked_ids([1, 2, 3, 4, 5], chunk=2)) == ["1,2", "3,4", "5"]


def test_distributed_fetch(spark):
    def fake_transport(url: str) -> bytes:
        # nested so cloudpickle ships it by value to executors (a test
        # module isn't importable on workers; production transports live
        # in installed packages and pickle by reference)
        if url.endswith("bad"):
            raise ConnectionError("nope")
        return json.dumps({"url": url, "n": len(url)}).encode()

    urls = spark.createDataFrame(
        [Row(url="https://api/a"), Row(url="https://api/bb"), Row(url="https://api/bad")]
    )
    out = {r.url: r for r in distributed_fetch(urls, fake_transport).collect()}
    assert out["https://api/a"].status == "ok"
    assert json.loads(out["https://api/bb"].body)["n"] == len("https://api/bb")
    assert out["https://api/bad"].status.startswith("error")
    assert out["https://api/bad"].body is None


def test_scd2_merge_backfill_mid_history_splice(spark):
    """A late change landing in the MIDDLE of a key's history splits
    the enclosing interval; a late change equal in value to its new
    neighbor collapses; a late change at an existing change-point's
    exact ts WINS (CDC re-delivery). Untouched keys pass through
    row-identical."""
    from datalake_scripts_spark.operators.upsert import (
        scd2_from_changes,
        scd2_merge_backfill,
    )

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    recent = spark.createDataFrame(
        [
            Row(k=1, city="SPB", ts=t(10), seq=1),
            Row(k=1, city="MSK", ts=t(20), seq=2),
            Row(k=2, city="EKB", ts=t(10), seq=3),  # untouched key
        ]
    )
    dim = scd2_from_changes(recent, ["k"], ["city"], tiebreak=["seq"])
    late = spark.createDataFrame(
        [
            Row(k=1, city="KZN", ts=t(5)),    # new head
            Row(k=1, city="NSK", ts=t(15)),   # splits [10, 20)
            Row(k=1, city="VLG", ts=t(20)),   # same-ts override wins
        ]
    )
    out = scd2_merge_backfill(dim, late, ["k"], ["city"])
    rows = sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    )
    assert rows == [
        (1, "KZN", t(5), t(10), False),
        (1, "NSK", t(15), t(20), False),
        (1, "SPB", t(10), t(15), False),
        (1, "VLG", t(20), None, True),  # same-ts override beat MSK
        (2, "EKB", t(10), None, True),
    ]
    # identity: merging the feed's own change-points changes nothing
    # (materialized first — self-referencing one lineage as both dim
    # and late batch trips Spark's self-union zip)
    mat = spark.createDataFrame(out.collect(), out.schema)
    same = scd2_merge_backfill(
        mat,
        mat.selectExpr("k", "city", "valid_from AS ts"),
        ["k"],
        ["city"],
    )
    assert sorted(
        (r.k, r.city, r.valid_from, r.valid_to, r.is_current)
        for r in same.collect()
    ) == rows
