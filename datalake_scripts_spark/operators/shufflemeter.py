"""Shuffle-volume metering from the live AppStatusStore — the
programmatic twin of scripts/shufflestats.py (which reads the UI REST
API) that works with ``spark.ui.enabled=false``, so tests can FREEZE a
query's shuffle budget and fail CI when a plan regression (a lost
broadcast hint, an un-pushed filter, a new wide exchange) inflates it.

Why bytes and not wall time: at a fixed SF the bytes a query shuffles
are a property of its PLAN — near-deterministic run to run — while
wall time is noisy. A query whose shuffle volume silently grows is the
one that melts at 100 TB even if it still looks fast at test scale
(the reference has no equivalent guard; its only scale observability
is count logging, SURVEY.md §2.9).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _stage_list(spark: SparkSession):
    sc = spark.sparkContext
    jvm, gw = sc._jvm, sc._gateway
    store = sc._jsc.sc().statusStore()
    # full Scala signature: (statuses, details, withSummaries,
    # quantiles, taskStatuses) — empty filters return every retained
    # stage
    return store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    )


def max_stage_id(spark: SparkSession) -> int:
    """Highest stage id currently retained (−1 when none ran yet)."""
    stages = _stage_list(spark)
    mx = -1
    for i in range(stages.size()):
        mx = max(mx, stages.apply(i).stageId())
    return mx


def shuffle_totals_since(spark: SparkSession, after_stage_id: int) -> dict:
    """Sum shuffle write / spill bytes over stages with id strictly
    greater than ``after_stage_id``.

    Diffing on stage ID (not on before/after TOTALS) keeps the measure
    correct even when the status store evicts old stages mid-run
    (spark.ui.retainedStages) — evicted history simply never enters
    the sum."""
    stages = _stage_list(spark)
    write = spill = read = 0
    for i in range(stages.size()):
        s = stages.apply(i)
        if s.stageId() <= after_stage_id:
            continue
        write += s.shuffleWriteBytes()
        read += s.shuffleReadBytes()
        spill += s.diskBytesSpilled()
    return {"shuffle_write": write, "shuffle_read": read, "spill": spill}


def measure_query_shuffle(
    spark: SparkSession, fn, *args, **kwargs
) -> tuple[int, dict]:
    """Run ``fn(*args, **kwargs)`` (a registry query builder), count()
    the result to execute it, and return (row_count, shuffle totals for
    exactly the stages the query ran)."""
    before = max_stage_id(spark)
    n = fn(*args, **kwargs).count()
    totals = shuffle_totals_since(spark, before)
    spark.catalog.clearCache()
    return n, totals
