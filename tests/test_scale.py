"""Scale techniques: salting equivalence, bucketed join plan shape,
history snapshot, sessionization."""

import datetime as dt

from pyspark.sql import Row, functions as F

from datalake_scripts_spark.operators import scale as SC


def test_salted_sum_equals_plain(spark, sf_dir):
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.queries.relational import dec

    li = read_table(spark, sf_dir, "lineitem")
    salted = SC.salted_group_sum(
        li, ["l_returnflag"], F.sum(dec("l_quantity")), "s", salt_buckets=8
    )
    plain = li.groupBy("l_returnflag").agg(F.sum(dec("l_quantity")).alias("s"))
    a = {r.l_returnflag: r.s for r in salted.collect()}
    b = {r.l_returnflag: r.s for r in plain.collect()}
    assert a == b


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    from datalake_scripts_spark.io import read_table

    import shutil

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("b_orders", "b_cust"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(f"{warehouse}/{tbl}", ignore_errors=True)
    SC.write_bucketed(orders, "b_orders", "o_custkey", n_buckets=4)
    SC.write_bucketed(
        cust.withColumn("o_custkey", F.col("c_custkey")), "b_cust", "o_custkey", 4
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the bucketing (not a broadcast)
        # is what eliminates the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
        assert joined.count() > 0
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed layout: the SMJ runs with NO shuffle exchange
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE b_orders")
        spark.sql("DROP TABLE b_cust")


def test_latest_snapshot(spark):
    rows = [
        Row(k=1, v=10.0, ts=dt.datetime(2024, 1, 1), id=1),
        Row(k=1, v=20.0, ts=dt.datetime(2024, 1, 2), id=2),
        Row(k=2, v=30.0, ts=dt.datetime(2024, 1, 1), id=3),
        Row(k=2, v=40.0, ts=dt.datetime(2024, 1, 1), id=4),  # tie on ts
    ]
    df = spark.createDataFrame(rows)
    out = {
        r.k: r.v
        for r in SC.latest_snapshot(df, ["k"], "ts", tiebreak="id").collect()
    }
    assert out == {1: 20.0, 2: 40.0}


def test_sessionize(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0)
    rows = [
        Row(user=1, ts=t0, eid=1),
        Row(user=1, ts=t0 + dt.timedelta(minutes=5), eid=2),   # same session
        Row(user=1, ts=t0 + dt.timedelta(minutes=30), eid=3),  # new session
        Row(user=2, ts=t0, eid=4),
    ]
    df = spark.createDataFrame(rows)
    out = SC.sessionize(df, "user", ts_col="ts", gap_minutes=10, order_tiebreak="eid")
    sid = {r.eid: r.session_id for r in out.collect()}
    assert sid[1] == sid[2] == 1
    assert sid[3] == 2
    assert sid[4] == 1


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting is a pure shuffle-shape rewrite: row-identical to the
    plain join for inner and left, including unmatched left rows."""
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import salted_join

    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice"
    )
    cust = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    for how in ("inner", "left"):
        plain = orders.join(cust, "c_custkey", how)
        salted = salted_join(orders, cust, "c_custkey", salt_buckets=8, how=how)
        key = lambda r: (r.c_custkey, r.o_orderkey, r.c_name)
        assert sorted(map(key, salted.collect())) == sorted(
            map(key, plain.collect())
        )

    # a pathological hot key still joins correctly
    from pyspark.sql import Row

    hot = spark.createDataFrame(
        [Row(k=1, v=i) for i in range(5000)] + [Row(k=2, v=0)]
    )
    dim = spark.createDataFrame([Row(k=1, name="hot"), Row(k=3, name="cold")])
    out = salted_join(hot, dim, "k", salt_buckets=4, how="left")
    assert out.filter("name = 'hot'").count() == 5000
    assert out.filter("k = 2").first().name is None


def test_content_checksum_order_independent_and_drift_sensitive(spark):
    from datalake_scripts_spark.operators.profile import content_checksum

    rows = [(i, f"name-{i}", float(i) * 1.5) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, name string, v double")
    repr_sql = (
        "concat_ws('|', CAST(id AS STRING), name,"
        " CAST(CAST(v AS DECIMAL(12,2)) AS STRING))"
    )
    base = content_checksum(df, repr_sql).first()
    assert base.n_rows == 100

    # partitioning / row order must not change the checksum
    shuffled = df.repartition(13, "name").sortWithinPartitions("v")
    assert content_checksum(shuffled, repr_sql).first() == base

    # one drifted cell must change it (count stays equal)
    drifted = spark.createDataFrame(
        [(i, f"name-{i}", float(i) * 1.5 if i != 57 else 999.0) for i in range(100)],
        "id long, name string, v double",
    )
    got = content_checksum(drifted, repr_sql).first()
    assert got.n_rows == 100 and got.checksum != base.checksum


def test_resample_ffill_fills_gaps_deterministically(spark):
    import datetime as dt

    from datalake_scripts_spark.operators.scale import resample_ffill

    def ts(h, m=0):
        return dt.datetime(2024, 3, 1, h, m)

    df = spark.createDataFrame(
        [
            # user 1: obs at 01:xx (twice -> last wins), gap 02, obs 03
            (1, ts(1, 10), 100, 10.0),
            (1, ts(1, 50), 101, 11.0),
            (1, ts(3, 5), 102, 30.0),
            # same-timestamp tie within the bucket: higher event_id wins
            (2, ts(5, 0), 201, 1.0),
            (2, ts(5, 0), 202, 2.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {
        (r.user_id, r.bucket_ts.hour): (r.value_ffill, r.is_observed)
        for r in resample_ffill(
            df, "user_id", "ts", "value", tiebreak="event_id"
        ).collect()
    }
    assert out[(1, 1)] == (11.0, 1)   # last obs in the 01:00 bucket
    assert out[(1, 2)] == (11.0, 0)   # gap hour forward-filled
    assert out[(1, 3)] == (30.0, 1)
    assert out[(2, 5)] == (2.0, 1)    # event_id tiebreak
    assert len(out) == 4              # grids span each key's own range


def test_resample_interpolate_blends_gaps(spark):
    import datetime as dt

    from datalake_scripts_spark.operators.scale import resample_interpolate

    def ts(h, m=0):
        return dt.datetime(2024, 3, 1, h, m)

    df = spark.createDataFrame(
        [
            # user 1: obs 01 (=10), gaps 02-03, obs 04 (=40):
            # interpolation climbs 10 per hour
            (1, ts(1, 10), 100, 10.0),
            (1, ts(4, 5), 101, 40.0),
            # user 2: single observation -> trivially observed grid
            (2, ts(7, 0), 200, 5.0),
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )
    out = {
        (r.user_id, r.bucket_ts.hour): (r.value_interp, r.is_observed)
        for r in resample_interpolate(
            df, "user_id", "ts", "value", tiebreak="event_id"
        ).collect()
    }
    assert out[(1, 1)] == (10.0, 1)
    assert out[(1, 2)] == (20.0, 0)   # 10 + (40-10) * 1/3
    assert out[(1, 3)] == (30.0, 0)   # 10 + (40-10) * 2/3
    assert out[(1, 4)] == (40.0, 1)
    assert out[(2, 7)] == (5.0, 1)
    assert len(out) == 5


def test_surrogate_keys_dense_and_order_defined(spark, sf_dir):
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.scale import assign_surrogate_keys

    cust = read_table(spark, sf_dir, "customer")
    out = assign_surrogate_keys(
        cust, ["c_acctbal", "c_custkey"], partitions=5
    ).select("c_custkey", "c_acctbal", "surrogate_id")
    rows = out.collect()
    n = cust.count()
    ids = sorted(r.surrogate_id for r in rows)
    assert ids == list(range(1, n + 1))  # dense 1..N, no gaps or dupes
    by_order = sorted(rows, key=lambda r: (r.c_acctbal, r.c_custkey))
    assert [r.surrogate_id for r in by_order] == list(range(1, n + 1))


def test_surrogate_keys_no_single_partition_sort(spark, sf_dir):
    """The plan must not funnel the table through one task: no global
    (unpartitioned) Sort/Window. The range exchange + per-partition
    window is the whole point."""
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.scale import assign_surrogate_keys

    cust = read_table(spark, sf_dir, "customer")
    out = assign_surrogate_keys(cust, ["c_custkey"], partitions=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_surrogate_keys_invariant_to_partition_count(spark, sf_dir):
    """The id assignment is a function of the ORDER only: any
    partition count (including 1) must produce identical ids."""
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.scale import assign_surrogate_keys

    nation = read_table(spark, sf_dir, "nation")
    base = {
        r.n_nationkey: r.surrogate_id
        for r in assign_surrogate_keys(
            nation, ["n_name"], partitions=1
        ).collect()
    }
    for parts in (3, 7):
        got = {
            r.n_nationkey: r.surrogate_id
            for r in assign_surrogate_keys(
                nation, ["n_name"], partitions=parts
            ).collect()
        }
        assert got == base


def test_cusum_telescoping_matches_recursion(spark):
    """The window form S_d = P_d - min(0, min prefix P) must equal the
    textbook recursion S_d = max(0, S_{d-1} + y_d) on a crafted series
    with a mid-series burst."""
    import datetime as dt

    from datalake_scripts_spark.queries import REGISTRY

    # 10 quiet days of 2 events, then 4 burst days of 12
    rows, eid = [], 0
    for d in range(14):
        n = 2 if d < 10 else 12
        for i in range(n):
            rows.append((eid, dt.datetime(2024, 1, 1 + d, 6 + (i % 12)),
                         1, "burst", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    src = tempfile.mkdtemp(prefix="cusum_")
    df.write.mode("overwrite").parquet(src + "/events.parquet")
    out = {
        r.day.day: (r.cusum_scaled, r.is_change)
        for r in REGISTRY["events_cusum_changepoint"].fn(spark, src).collect()
    }
    # recursion twin in plain python (same integer units)
    n_days, t = 14, 10 * 2 + 4 * 12
    s, expect = 0, {}
    for d in range(14):
        x = 2 if d < 10 else 12
        s = max(0, s + (4 * n_days * x - 5 * t))
        expect[d + 1] = (s, s > 4 * t)
    assert out == expect
    # the burst is detected, the quiet period is not
    assert not any(flag for day, (_, flag) in out.items() if day <= 10)
    assert any(flag for day, (_, flag) in out.items() if day > 10)
