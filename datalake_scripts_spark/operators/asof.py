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


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_matched",
) -> DataFrame:
    """As-of join, cogroup physical strategy: same semantics as
    :func:`asof_join` (latest right row with right_ts <= left_ts per
    key), implemented as ``left.groupBy(key).cogroup(right.groupBy(key))
    .applyInPandas(merge_asof)`` — a per-key sorted merge join in Arrow
    batches.

    When to pick which: the union+window form sorts the union of BOTH
    sides inside one window per key — if the right side is orders of
    magnitude denser than the left, all of it flows through the window
    state anyway. The cogroup form ships each key's two sides to one
    task and does a linear two-pointer merge (pandas ``merge_asof``),
    so per-key cost is sort + single pass and the right side never
    inflates a window frame. Both shuffle once on the key; this one
    pays the JVM->Arrow->JVM hop, so it wins only when per-key density
    (not row width) dominates. Same oracle as asof_join — results are
    identical.
    """
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    right_cols = right_cols or []
    carry = [(c, f"{c}{suffix}") for c in right_cols] + [
        (right_ts, f"{right_ts}{suffix}")
    ]
    out_schema = StructType(
        list(left.schema.fields)
        + [
            StructField(dst, right.schema[src].dataType, True)
            for src, dst in carry
        ]
    )
    left_cols = list(left.columns)
    out_cols = left_cols + [dst for _, dst in carry]

    # Re-alias every right column to a fresh name (fresh exprIds): when
    # both sides derive from the same source DataFrame, left and right
    # attributes share exprIds and FlatMapCoGroupsInPandas's conflict
    # dedup silently DROPS the right-side duplicates (observed: right
    # pdf arrived without `ts` when left also carried `ts`).
    r_alias = {c: f"_r_{c}" for c in right.columns}
    rpre = right.select([F.col(c).alias(a) for c, a in r_alias.items()])

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        # keep null columns dtype-correct (datetime64 -> NaT, float ->
        # NaN): Arrow cannot cast an all-None float64 column to
        # timestamp when building the return batch
        if lpdf.empty or rpdf.empty:
            out = lpdf.copy()
            for src, dst in carry:
                out[dst] = pd.Series(
                    [None] * len(out),
                    dtype=rpdf[r_alias[src]].dtype,
                    index=out.index,
                )
            return out[out_cols]
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        rsel = rpdf[[r_alias[src] for src, _ in carry]].rename(
            columns={r_alias[src]: dst for src, dst in carry}
        ).sort_values(f"{right_ts}{suffix}", kind="mergesort")
        merged = pd.merge_asof(
            lpdf,
            rsel,
            left_on=left_ts,
            right_on=f"{right_ts}{suffix}",
            direction="backward",
            allow_exact_matches=True,
        )
        return merged[out_cols]

    return (
        left.groupBy(on)
        .cogroup(rpre.groupBy(r_alias[on]))
        .applyInPandas(merge, schema=out_schema)
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
    # bcast: caller-contract — this is the *_broadcast variant by name;
    # the caller asserts intervals fit in memory (use range_join for
    # interval sets that scale with the data)
    return fact.join(F.broadcast(intervals), cond, "left")
