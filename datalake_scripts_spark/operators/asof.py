"""As-of and range joins — operators Spark lacks natively (SURVEY.md §2.3
engine consequence; pyspark guide "Common OLAP patterns").

- :func:`asof_join` — for each left row, the latest right row with
  right_ts <= left_ts per key. Implemented as union + tag + running
  "last non-null" window: ONE shuffle on the key, no range-bucketing,
  no per-group pandas. Scales to arbitrarily dense right sides (the
  classic points-to-most-recent-state join of event pipelines).
- :func:`range_join_broadcast` — join a fact to a small interval table
  (tier/bucket lookup) via broadcast nested-loop on lo <= v < hi. The
  dim is tiny by construction, so no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: latest right row (by right_ts <= left_ts) per key.

    Union the two sides with a side tag; per key, order by (ts, tag)
    with the right side first at equal timestamps (so ties match — the
    <= semantics of DuckDB's ASOF JOIN); carry right values forward with
    last(..., ignorenulls); keep left rows. Matched-right columns come
    back as ``<col><suffix>`` (NULL when no right row precedes).
    """
    right_cols = right_cols or []
    carry = [(c, f"{c}{suffix}") for c in right_cols] + [
        (right_ts, f"{right_ts}{suffix}")
    ]
    left_payload = list(left.columns)

    l_sel = [F.col(c) for c in left_payload]
    l_sel += [F.col(left_ts).alias("_ts"), F.lit(1).alias("_is_left")]
    l_sel += [
        F.lit(None).cast(right.schema[src].dataType).alias(dst) for src, dst in carry
    ]

    r_sel = [
        F.col(on) if c == on else F.lit(None).cast(left.schema[c].dataType).alias(c)
        for c in left_payload
    ]
    r_sel += [F.col(right_ts).alias("_ts"), F.lit(0).alias("_is_left")]
    r_sel += [F.col(src).alias(dst) for src, dst in carry]

    unioned = left.select(*l_sel).unionByName(right.select(*r_sel))
    w = (
        W.partitionBy(on)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out_cols = [F.col(c) for c in left_payload]
    out_cols += [
        F.last(F.col(dst), ignorenulls=True).over(w).alias(dst) for _, dst in carry
    ]
    return (
        unioned.select(*out_cols, F.col("_is_left"))
        .filter(F.col("_is_left") == 1)
        .drop("_is_left")
    )


def range_join_broadcast(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """fact ⋈ intervals on lo <= value < hi, broadcasting the intervals.

    BroadcastNestedLoopJoin on purpose: the interval table is a handful
    of rows; per-row interval probing beats any shuffle. For large
    interval tables, bucketize the range key instead.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(intervals), cond, "left")
