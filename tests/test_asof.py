"""As-of and range joins."""

import datetime as dt

from pyspark.sql import Row

from datalake_scripts_spark.operators.asof import asof_join, range_join_broadcast


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


def test_asof_join_basic(spark):
    left = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(10), event_id=100),
            Row(user_id=1, ts=_ts(30), event_id=101),
            Row(user_id=2, ts=_ts(5), event_id=102),
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(0), value=1.0),
            Row(user_id=1, ts=_ts(20), value=2.0),
            Row(user_id=2, ts=_ts(50), value=9.0),
        ]
    )
    out = asof_join(left, right, on="user_id", right_cols=["value"])
    rows = {r.event_id: (r.value_matched, r.ts_matched) for r in out.collect()}
    assert rows[100] == (1.0, _ts(0))  # latest right <= :10 is :00
    assert rows[101] == (2.0, _ts(20))
    assert rows[102] == (None, None)  # no right row at-or-before :05


def test_asof_join_tie_matches(spark):
    left = spark.createDataFrame([Row(user_id=1, ts=_ts(10), event_id=1)])
    right = spark.createDataFrame([Row(user_id=1, ts=_ts(10), value=7.0)])
    out = asof_join(left, right, on="user_id", right_cols=["value"]).first()
    assert out.value_matched == 7.0  # <= semantics: equal timestamps match


def test_range_join(spark):
    fact = spark.createDataFrame([Row(v=5.0), Row(v=25.0), Row(v=999.0)])
    tiers = spark.createDataFrame(
        [Row(tier="low", lo=0.0, hi=10.0), Row(tier="mid", lo=10.0, hi=100.0)]
    )
    out = range_join_broadcast(fact, tiers, "v").collect()
    m = {r.v: r.tier for r in out}
    assert m == {5.0: "low", 25.0: "mid", 999.0: None}


def test_asof_cogroup_equals_window_strategy(spark):
    from datalake_scripts_spark.operators.asof import asof_join_cogroup

    left = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(10), event_id=100),
            Row(user_id=1, ts=_ts(30), event_id=101),
            Row(user_id=2, ts=_ts(5), event_id=102),   # right exists, all later
            Row(user_id=3, ts=_ts(7), event_id=103),   # no right rows at all
            Row(user_id=4, ts=_ts(10), event_id=104),  # exact-tie match
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts(0), value=1.0),
            Row(user_id=1, ts=_ts(20), value=2.0),
            Row(user_id=2, ts=_ts(50), value=9.0),
            Row(user_id=4, ts=_ts(10), value=7.0),
            Row(user_id=5, ts=_ts(1), value=3.0),      # left-less key: no output
        ]
    )
    kw = dict(on="user_id", right_cols=["value"])
    a = {tuple(r) for r in asof_join(left, right, **kw).collect()}
    b = {tuple(r) for r in asof_join_cogroup(left, right, **kw).collect()}
    assert a == b
    assert len(a) == 5
