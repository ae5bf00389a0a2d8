"""Scale-technique queries: the rewrites of operators/scale.py verified
against their naive forms (identical results, different shuffle shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import scale as SC
from .registry import query, t
from .relational import SQL_REV, revenue


@query(
    "salted_agg_revenue_by_flag",
    sql=f"""
    SELECT l_returnflag, CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue
    FROM lineitem GROUP BY l_returnflag
    """,
)
def salted_agg_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted two-phase aggregation (operators.scale.salted_group_sum):
    3 hot keys spread over 16 salt buckets, then merged. Decimal-exact,
    so the oracle is the plain GROUP BY — identical values, different
    shuffle shape."""
    li = t(spark, sf_dir, "lineitem")
    out = SC.salted_group_sum(
        li, ["l_returnflag"], F.sum(revenue()), "revenue_dec", salt_buckets=16
    )
    return out.select(
        "l_returnflag", F.col("revenue_dec").cast("double").alias("revenue")
    )


@query(
    "history_latest_snapshot",
    sql="""
    SELECT user_id, ts, event_type, value FROM (
      SELECT user_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) x
    WHERE rn = 1
    """,
)
def history_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-state view over an append-only history table
    (operators.scale.latest_snapshot) — the consumer-side dedup the
    reference defers on its hst_* tables (SURVEY.md §2.7)."""
    ev = t(spark, sf_dir, "events")
    return SC.latest_snapshot(
        ev, ["user_id"], version_col="ts", tiebreak="event_id"
    ).select("user_id", "ts", "event_type", "value")


@query(
    "sessionize_per_event",
    sql="""
    WITH marked AS (
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, event_id, ts,
           CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM marked
    """,
)
def sessionize_per_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session ids via gaps-and-islands
    (operators.scale.sessionize) — what session_window can't give
    (it only yields the aggregated window). One shuffle on the key."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return SC.sessionize(
        ev, "user_id", ts_col="ts", gap_minutes=10, order_tiebreak="event_id"
    )
