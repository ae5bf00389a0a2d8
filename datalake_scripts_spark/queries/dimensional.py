"""Dimensional-modeling queries: SCD Type-2 history build and
point-in-time (as-of-validity) facts.

The reference's mutation model keeps raw history by blunt appends into
``hst_*`` tables (monkey_proc.py:229-268) and rebuilds snapshots by
overwrite — it has no notion of validity intervals. These queries derive
the standard warehouse shape from exactly that raw-append feed: an SCD2
dimension (half-open [valid_from, valid_to) intervals, one open row per
key) built in ONE key-shuffle, and a point-in-time join that attributes
facts to the dimension version in effect at event time via the engine's
union+window as-of join (one shuffle, no interval theta-join).

Scale notes:
- scd2_from_changes: single Exchange on the key; all three window
  stages (last-write-wins, change-collapse, interval close) reuse it.
  History length rides per-key change counts, not corpus size.
- point-in-time: because SCD2 intervals are contiguous-to-infinity by
  construction, "fact ts in [valid_from, valid_to)" == "latest version
  with valid_from <= fact ts" — so the as-of union+window form applies
  and the plan stays a single hash shuffle on the key even when BOTH
  sides are huge. An interval join would be a range theta-join; the
  oracle uses that form precisely because it is the independent spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..operators.upsert import scd2_from_changes
from .registry import query, t

# Purchase-derived customer tier: the tracked SCD2 attribute.
_TIER_SQL = (
    "CASE WHEN value < 50 THEN 'low' "
    "WHEN value < 150 THEN 'mid' ELSE 'high' END"
)


def _tier_col() -> F.Column:
    return (
        F.when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
    )


def _user_tier_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    changes = ev.select(
        "user_id", "ts", _tier_col().alias("tier"), "event_id"
    )
    return scd2_from_changes(
        changes, ["user_id"], ["tier"], ts_col="ts", tiebreak=["event_id"]
    )


_SCD2_SRC_SQL = f"""
    WITH src AS (
      SELECT user_id, ts, {_TIER_SQL} AS tier, event_id
      FROM events WHERE event_type = 'purchase'
    ), lww AS (
      SELECT user_id, ts, tier FROM (
        SELECT *, ROW_NUMBER() OVER (
                 PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM src) WHERE rn = 1
    ), collapsed AS (
      SELECT user_id, ts, tier FROM (
        SELECT user_id, ts, tier,
               LAG(tier) OVER (PARTITION BY user_id ORDER BY ts) AS prev_tier
        FROM lww)
      WHERE prev_tier IS NULL OR prev_tier IS DISTINCT FROM tier
    ), dim AS (
      SELECT user_id, tier, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to
      FROM collapsed
    )
"""


@query(
    "scd2_user_tier_history",
    sql=_SCD2_SRC_SQL
    + """
    SELECT user_id, tier, valid_from, valid_to, valid_to IS NULL AS is_current
    FROM dim
    """,
    headline=True,
)
def scd2_user_tier_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension built in one pass from the raw change feed
    (operators.upsert.scd2_from_changes): purchase events -> customer
    tier history with half-open validity intervals, last-write-wins on
    equal timestamps, consecutive no-change rows collapsed. One shuffle
    on user_id; the oracle derives the same intervals with independent
    ROW_NUMBER/LAG/LEAD SQL."""
    return _user_tier_dim(spark, sf_dir)


@query(
    "scd2_point_in_time_tier",
    sql=_SCD2_SRC_SQL
    + """
    SELECT d.tier AS tier,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN dim d
      ON e.user_id = d.user_id
     AND e.ts >= d.valid_from
     AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    WHERE e.event_type = 'click'
    GROUP BY d.tier
    """,
)
def scd2_point_in_time_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact attribution: each click joins the tier version
    in effect at click time. Spark side uses the as-of union+window join
    (valid: SCD2 intervals are contiguous, so latest valid_from <= ts IS
    the enclosing interval) — one shuffle on user_id instead of the
    interval theta-join the oracle spells out. Clicks before a user's
    first purchase match no version and drop (inner semantics, both
    sides)."""
    dim = _user_tier_dim(spark, sf_dir).select("user_id", "tier", "valid_from")
    clicks = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", "ts", "value")
    )
    joined = asof_join(
        clicks,
        dim,
        on="user_id",
        left_ts="ts",
        right_ts="valid_from",
        right_cols=["tier"],
    )
    return (
        joined.filter(F.col("tier_matched").isNotNull())
        .groupBy(F.col("tier_matched").alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@query(
    "scd2_backfill_merge",
    sql=_SCD2_SRC_SQL
    + """
    SELECT user_id, tier, valid_from, valid_to, valid_to IS NULL AS is_current
    FROM dim
    """,
)
def scd2_backfill_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arriving backfill merged into a LIVE SCD2 dimension
    (operators.upsert.scd2_merge_backfill): the dim is first built from
    only the RECENT half of the change feed (the out-of-order-delivery
    reality), then the early half arrives late and splices into the
    MIDDLE of every key's history — interval splits, boundary
    re-collapse, head replacement — with rework scoped to the touched
    keys by semi/anti-join, never the whole dimension. The result must
    equal the full-history oracle over ALL events: merge(build(late),
    early) == build(all), under the same oracle as
    scd2_user_tier_history."""
    from ..operators.upsert import scd2_merge_backfill

    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    changes = ev.select("user_id", "ts", _tier_col().alias("tier"), "event_id")
    cutoff = "2024-01-15"
    recent = changes.filter(F.col("ts") >= F.lit(cutoff).cast("timestamp"))
    early = changes.filter(F.col("ts") < F.lit(cutoff).cast("timestamp"))
    dim = scd2_from_changes(
        recent, ["user_id"], ["tier"], ts_col="ts", tiebreak=["event_id"]
    )
    return scd2_merge_backfill(
        dim, early, ["user_id"], ["tier"], ts_col="ts", tiebreak=["event_id"]
    )
