"""Function-surface batch 4: null-handling semantics, advanced string
functions (incl. edit distance), ordered-statistic aggregates
(max_by/min_by, count_if, bool_and/bool_or), positional explode, array
composition (flatten / arrays_zip), EXISTS-aggregation (TPC-H Q4 shape),
and a composite agg->window growth query."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import query, t
from .relational import dec


@query(
    "null_handling_semantics",
    sql="""
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'redacted') AS segment_masked,
           (c_acctbal IS NULL) AS bal_is_null,
           IFNULL(NULL, c_acctbal) AS bal_filled,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           (NULL = c_custkey) IS NULL AS null_compare_is_null
    FROM customer
    """,
)
def null_handling_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics family: coalesce/nullif/ifnull, three-valued
    comparison, conditional nulling."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("redacted")
        ).alias("segment_masked"),
        F.col("c_acctbal").isNull().alias("bal_is_null"),
        F.ifnull(F.lit(None), F.col("c_acctbal")).alias("bal_filled"),
        F.when(F.col("c_acctbal") < 0, F.lit(None))
        .otherwise(F.col("c_acctbal"))
        .alias("bal_nonneg"),
        (F.lit(None) == F.col("c_custkey")).isNull().alias("null_compare_is_null"),
    )


@query(
    "string_advanced_functions",
    sql="""
    SELECT p_partkey,
           reverse(p_brand) AS brand_rev,
           repeat(p_brand, 2) AS brand_twice,
           left(p_name, 8) AS name_left,
           right(p_name, 5) AS name_right,
           CAST(strpos(p_name, 'a') AS INT) AS first_a,
           translate(p_brand, '#', '-') AS brand_dash,
           CAST(levenshtein(p_brand, 'Brand#1') AS BIGINT) AS dist_to_b1,
           starts_with(p_type, 'PROMO') AS is_promo,
           contains(p_name, 'e') AS has_e
    FROM part
    """,
)
def string_advanced_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Advanced string family incl. edit distance (levenshtein — the
    cheap string-similarity primitive under fuzzy matching)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.repeat(F.col("p_brand"), 2).alias("brand_twice"),
        F.substring(F.col("p_name"), 1, 8).alias("name_left"),
        F.col("p_name").substr(F.length("p_name") - 4, F.lit(5)).alias("name_right"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).cast("bigint").alias("dist_to_b1"),
        F.startswith(F.col("p_type"), F.lit("PROMO")).alias("is_promo"),
        F.contains(F.col("p_name"), F.lit("e")).alias("has_e"),
    )


@query(
    "agg_ordered_statistics",
    sql="""
    SELECT c_mktsegment,
           arg_max(c_name, c_acctbal + c_custkey * 1e-9) AS richest,
           arg_min(c_name, c_acctbal - c_custkey * 1e-9) AS poorest,
           COUNT(*) FILTER (WHERE c_acctbal > 5000) AS n_rich,
           bool_or(c_acctbal < 0) AS any_negative,
           bool_and(c_acctbal > -1000) AS all_above_floor
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_ordered_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin), count_if, bool_or/bool_and.

    The arg keys are perturbed by the unique custkey so ties cannot
    produce engine-dependent representatives.
    """
    cust = t(spark, sf_dir, "customer")
    up = F.col("c_acctbal") + F.col("c_custkey") * 1e-9
    down = F.col("c_acctbal") - F.col("c_custkey") * 1e-9
    return cust.groupBy("c_mktsegment").agg(
        F.max_by("c_name", up).alias("richest"),
        F.min_by("c_name", down).alias("poorest"),
        F.count_if(F.col("c_acctbal") > 5000).alias("n_rich"),
        F.bool_or(F.col("c_acctbal") < 0).alias("any_negative"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
    )


@query(
    "posexplode_with_ordinality",
    sql="""
    WITH tk AS (SELECT p_partkey, string_split(p_name, ' ') AS toks FROM part),
    u AS (SELECT p_partkey, toks,
                 unnest(range(1, len(toks) + 1)) AS i
          FROM tk)
    SELECT p_partkey, CAST(i - 1 AS INT) AS pos, toks[CAST(i AS INT)] AS tok
    FROM u
    """,
)
def posexplode_with_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element position carried through the explode (the
    UNNEST WITH ORDINALITY shape)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.posexplode(F.split(F.col("p_name"), " ")).alias("pos", "tok")
    )


@query(
    "array_compose_flatten_zip",
    sql="""
    WITH s AS (SELECT p_partkey,
                      string_split(p_brand, '#') AS a,
                      string_split(p_type, ' ') AS b
               FROM part)
    SELECT p_partkey,
           array_to_string(flatten([a, b]), ',') AS all_tokens,
           array_to_string(
             list_transform(range(1, greatest(len(a), len(b)) + 1),
                            i -> a[CAST(i AS INT)] || '|' || b[CAST(i AS INT)]),
             ',') AS paired
    FROM s
    """,
)
def array_compose_flatten_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array composition: flatten (nested-array concat) + positional
    pairing via zip_with (string-combined; the shorter side null-pads
    and nulls propagate through the concat in both engines). Output
    arrays are serialized to CSV strings so every result column is a
    hashable scalar. NOTE: concat_ws skips nulls, DuckDB
    array_to_string skips nulls too — identical semantics."""
    part = t(spark, sf_dir, "part")
    a = F.split(F.col("p_brand"), "#")
    b = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        F.concat_ws(",", F.flatten(F.array(a, b))).alias("all_tokens"),
        F.concat_ws(
            ",", F.zip_with(a, b, lambda x, y: F.concat(x, F.lit("|"), y))
        ).alias("paired"),
    )


@query(
    "q4_priority_with_late_lines",
    sql="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS with a cross-table comparison inside the
    subquery, then aggregate — planned as semi join + agg."""
    from ..io import register_views

    register_views(spark, sf_dir, ["orders", "lineitem"])
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
        """
    )


@query(
    "events_hourly_growth",
    sql=f"""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h,
             CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
      FROM events GROUP BY 1)
    SELECT h, v,
           LAG(v) OVER (ORDER BY h) AS prev_v,
           v - LAG(v) OVER (ORDER BY h) AS delta
    FROM hourly
    """,
)
def events_hourly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: event-time aggregation then a window over the
    aggregated series (hour-over-hour delta) — agg + window in one
    plan, two shuffles total."""
    ev = t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum(dec("value")).cast("double").alias("v"))
        .select(F.col("w.start").alias("h"), "v")
    )
    lag_w = W.orderBy("h")
    return hourly.select(
        "h",
        "v",
        F.lag("v").over(lag_w).alias("prev_v"),
        (F.col("v") - F.lag("v").over(lag_w)).alias("delta"),
    )


@query(
    "window_range_frame",
    sql="""
    WITH o AS (SELECT o_custkey, o_orderkey,
                      date_diff('day', DATE '1995-01-01', o_orderdate) AS day_no,
                      o_totalprice
               FROM orders)
    SELECT o_custkey, o_orderkey, CAST(day_no AS INT) AS day_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY day_no
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS spend_30d,
           FIRST_VALUE(o_orderkey) OVER w AS first_order,
           LAST_VALUE(o_orderkey) OVER
             (PARTITION BY o_custkey ORDER BY day_no, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_order,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_order
    FROM o
    WINDOW w AS (PARTITION BY o_custkey ORDER BY day_no, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based: trailing-30-day spend — rows
    with equal/near ORDER BY values share the frame, unlike ROWS) plus
    first_value/last_value/nth_value over full-partition frames."""
    orders = t(spark, sf_dir, "orders")
    o = orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("day_no"),
        "o_totalprice",
    )
    range_w = (
        W.partitionBy("o_custkey").orderBy("day_no").rangeBetween(-30, W.currentRow)
    )
    full_w = (
        W.partitionBy("o_custkey")
        .orderBy("day_no", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "day_no",
        F.sum(dec("o_totalprice")).over(range_w).cast("double").alias("spend_30d"),
        F.first("o_orderkey").over(full_w).alias("first_order"),
        F.last("o_orderkey").over(full_w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(full_w).alias("second_order"),
    )


@query(
    "map_functions_and_regex_all",
    sql="""
    SELECT event_id,
           array_to_string(regexp_extract_all(props, '[0-9]+'), ',') AS all_numbers,
           array_to_string(map_keys(map(['type', 'props'], [event_type, props])), ',')
             AS mkeys,
           array_to_string(map_values(map(['type', 'props'], [event_type, props])), ',')
             AS mvalues,
           CAST(cardinality(map(['type', 'props'], [event_type, props])) AS INT)
             AS msize
    FROM events
    """,
)
def map_functions_and_regex_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map accessors (map_keys/map_values/size) + regexp_extract_all —
    completes the map family beyond create_map+explode and the regex
    family beyond single-group extraction. Array results serialized to
    CSV strings (hashable scalar outputs)."""
    from .registry import t as _t

    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("props"), F.col("props")
    )
    return ev.select(
        "event_id",
        F.concat_ws(
            ",", F.regexp_extract_all("props", F.lit("([0-9]+)"), F.lit(1))
        ).alias("all_numbers"),
        F.concat_ws(",", F.map_keys(m)).alias("mkeys"),
        F.concat_ws(",", F.map_values(m)).alias("mvalues"),
        F.size(m).alias("msize"),
    )
