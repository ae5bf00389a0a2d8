"""Banded interval-overlap join (operators/intervals.py): exact-once
pair emission (the first-common-bin filter replaces distinct), bin-width
invariance, equi-key conjunction, and equivalence to the naive theta
join on adversarial interval shapes (zero-length, bin-straddling,
identical, long-tail)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators.intervals import interval_overlap_join


def _mk(spark, rows, prefix):
    return spark.createDataFrame(
        [(f"{prefix}{i}", s, e) for i, (s, e) in enumerate(rows)],
        f"{prefix}id string, s long, e long",
    )


def _naive_pairs(lrows, rrows):
    out = set()
    for i, (ls, le) in enumerate(lrows):
        for j, (rs, re) in enumerate(rrows):
            if ls <= re and rs <= le:
                out.add((f"L{i}", f"R{j}"))
    return out


ADVERSARIAL = [
    # zero-length points, bin-edge straddlers, nested, identical, long
    ([(0, 0), (15, 17), (16, 16), (5, 40), (100, 100)],
     [(0, 0), (16, 18), (17, 30), (4, 4), (99, 101), (100, 100)]),
    # disjoint clusters
    ([(0, 3), (50, 55)], [(10, 20), (56, 60), (54, 54)]),
    # everything overlaps everything (worst case for dup leaks)
    ([(0, 100), (10, 90), (20, 80)], [(5, 95), (0, 100)]),
]


@pytest.mark.parametrize("lrows,rrows", ADVERSARIAL)
@pytest.mark.parametrize("w", [1, 7, 16, 1000])
def test_matches_naive_join_exactly_once(spark, lrows, rrows, w):
    left = _mk(spark, lrows, "L").withColumnsRenamed({"s": "ls", "e": "le"})
    right = _mk(spark, rrows, "R").withColumnsRenamed({"s": "rs", "e": "re"})
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", bin_width=w
    ).select("Lid", "Rid").collect()
    pairs = [(r["Lid"], r["Rid"]) for r in got]
    # exactly once: no duplicates even when a pair shares many bins
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_pairs(lrows, rrows)


def test_equi_keys_partition_the_join(spark):
    left = spark.createDataFrame(
        [("t1", "a", 0, 10), ("t2", "b", 0, 10)], "k string, lid string, s long, e long"
    )
    right = spark.createDataFrame(
        [("t1", "x", 5, 6), ("t2", "y", 5, 6), ("t1", "z", 50, 60)],
        "k string, rid string, s long, e long",
    )
    got = interval_overlap_join(
        left, right, "s", "e", "s", "e", bin_width=8, on=["k"]
    ).select("lid", "rid").collect()
    assert sorted((r["lid"], r["rid"]) for r in got) == [("a", "x"), ("b", "y")]


def test_right_columns_suffixed_on_collision(spark):
    left = _mk(spark, [(0, 5)], "L")
    right = _mk(spark, [(3, 9)], "R")
    out = interval_overlap_join(left, right, "s", "e", "s", "e", bin_width=4)
    assert {"s", "e", "s_r", "e_r", "Lid", "Rid"} == set(out.columns)
    row = out.collect()[0]
    assert (row["s"], row["e"], row["s_r"], row["e_r"]) == (0, 5, 3, 9)


def test_timestamp_conversion_hook(spark):
    left = spark.createDataFrame(
        [("a", "2024-01-01", "2024-01-10")], "lid string, s0 string, e0 string"
    ).select("lid", F.col("s0").cast("date").alias("sd"),
             F.col("e0").cast("date").alias("ed"))
    right = spark.createDataFrame(
        [("x", "2024-01-09", "2024-01-20"), ("y", "2024-02-01", "2024-02-02")],
        "rid string, s0 string, e0 string",
    ).select("rid", F.col("s0").cast("date").alias("sd"),
             F.col("e0").cast("date").alias("ed"))
    got = interval_overlap_join(
        left, right, "sd", "ed", "sd", "ed", bin_width=7,
        to_long=lambda c: F.datediff(c, F.lit("1970-01-01")),
    ).select("lid", "rid").collect()
    assert [(r["lid"], r["rid"]) for r in got] == [("a", "x")]


def test_bad_bin_width_raises(spark):
    df = _mk(spark, [(0, 1)], "L")
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(df, df, "s", "e", "s", "e", bin_width=0)


def test_reserved_column_collision_raises(spark):
    """User columns named like the working columns must raise up
    front, not be silently clobbered (ADVICE r8)."""
    left = _mk(spark, [(0, 1)], "L").withColumn("_bin", F.lit(9))
    right = _mk(spark, [(0, 1)], "R")
    with pytest.raises(ValueError, match="_bin"):
        interval_overlap_join(left, right, "s", "e", "s", "e", bin_width=4)
    with pytest.raises(ValueError, match="_s2"):
        interval_overlap_join(
            right, _mk(spark, [(0, 1)], "R").withColumn("_s2", F.lit(1)),
            "s", "e", "s", "e", bin_width=4,
        )


def test_inverted_interval_clear_error(spark):
    """end < start raises a message naming the offending values, not
    sequence()'s opaque boundary error (ADVICE r8)."""
    left = _mk(spark, [(9, 2)], "L")
    right = _mk(spark, [(0, 10)], "R")
    with pytest.raises(Exception, match="inverted left interval"):
        interval_overlap_join(
            left, right, "s", "e", "s", "e", bin_width=4
        ).collect()
    with pytest.raises(Exception, match="inverted right interval"):
        interval_overlap_join(
            right, left, "s", "e", "s", "e", bin_width=4
        ).collect()


def test_plan_has_single_join_no_distinct(spark):
    left = _mk(spark, [(0, 10), (20, 30)], "L")
    right = _mk(spark, [(5, 25)], "R")
    plan = interval_overlap_join(
        left, right, "s", "e", "s", "e", bin_width=8
    )._jdf.queryExecution().optimizedPlan().toString()
    # dedup must be the join-side filter, never an Aggregate/Distinct
    assert "Deduplicate" not in plan and "Aggregate" not in plan


@pytest.mark.parametrize("lrows,rrows", ADVERSARIAL)
def test_broadcast_strategy_agrees_with_banded(spark, lrows, rrows):
    from datalake_scripts_spark.operators.intervals import (
        interval_overlap_join_broadcast,
    )

    left = _mk(spark, lrows, "L").withColumnsRenamed({"s": "ls", "e": "le"})
    right = _mk(spark, rrows, "R").withColumnsRenamed({"s": "rs", "e": "re"})
    got = interval_overlap_join_broadcast(
        left, right, "ls", "le", "rs", "re"
    ).select("Lid", "Rid").collect()
    pairs = [(r["Lid"], r["Rid"]) for r in got]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _naive_pairs(lrows, rrows)


def test_broadcast_strategy_equi_keys(spark):
    from datalake_scripts_spark.operators.intervals import (
        interval_overlap_join_broadcast,
    )

    left = spark.createDataFrame(
        [("t1", "a", 0, 10), ("t2", "b", 0, 10)],
        "k string, lid string, s long, e long",
    )
    right = spark.createDataFrame(
        [("t1", "x", 5, 6), ("t2", "y", 5, 6), ("t1", "z", 50, 60)],
        "k string, rid string, s long, e long",
    )
    got = interval_overlap_join_broadcast(
        left, right, "s", "e", "s", "e", on=["k"]
    ).select("lid", "rid").collect()
    assert sorted((r["lid"], r["rid"]) for r in got) == [("a", "x"), ("b", "y")]


def test_hypothesis_banded_equals_naive(spark):
    from hypothesis import given, settings, strategies as st

    iv = st.tuples(st.integers(-50, 200), st.integers(0, 60)).map(
        lambda t: (t[0], t[0] + t[1])
    )

    @settings(max_examples=15, deadline=None)
    @given(
        lrows=st.lists(iv, min_size=1, max_size=12),
        rrows=st.lists(iv, min_size=1, max_size=12),
        w=st.sampled_from([1, 5, 16, 64]),
    )
    def check(lrows, rrows, w):
        left = _mk(spark, lrows, "L").withColumnsRenamed(
            {"s": "ls", "e": "le"}
        )
        right = _mk(spark, rrows, "R").withColumnsRenamed(
            {"s": "rs", "e": "re"}
        )
        got = interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bin_width=w
        ).select("Lid", "Rid").collect()
        pairs = [(r["Lid"], r["Rid"]) for r in got]
        assert len(pairs) == len(set(pairs))
        assert set(pairs) == _naive_pairs(lrows, rrows)

    check()


def test_broadcast_strategy_works_stream_static(spark, tmp_path):
    """The broadcast strategy is streaming-safe: a readStream side
    enriched by a static windows table (stream-static inner join) —
    the calendar-window enrichment shape, no state store needed."""
    import os

    src = str(tmp_path / "src")
    os.makedirs(src)
    spark.createDataFrame(
        [("a", 5, 5), ("b", 25, 25), ("c", 100, 100)],
        "lid string, s long, e long",
    ).coalesce(1).write.parquet(src + "/batch0")
    windows = spark.createDataFrame(
        [("w1", 0, 10), ("w2", 20, 30)], "wid string, s long, e long"
    )
    stream = (
        spark.readStream.schema("lid string, s long, e long")
        .parquet(src + "/*")
    )
    from datalake_scripts_spark.operators.intervals import (
        interval_overlap_join_broadcast,
    )

    joined = interval_overlap_join_broadcast(
        stream, windows, "s", "e", "s", "e"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("iv_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["lid"], r["wid"])
        for r in spark.sql("SELECT lid, wid FROM iv_stream").collect()
    }
    assert got == {("a", "w1"), ("b", "w2")}
