"""Relational surface, batch 2: more TPC-H shapes, subqueries (scalar /
IN / correlated EXISTS via the SQL API), HAVING, ntile/percent_rank,
unpivot, sorted array aggregation, split_part, approx distinct, and an
event-funnel aggregation.

Some queries deliberately go through ``spark.sql`` over registered temp
views — the SQL API is engine surface too (Catalyst produces the same
plans either way), and correlated subqueries are most natural there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.casts import big_double, big_double_duck_sql
from ..io import register_views
from .registry import query, t
from .relational import SQL_REV, dec, one, revenue, _ts


@query(
    "q6_forecast_revenue",
    sql=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan -> ungrouped agg. Every
    predicate reaches the parquet reader (PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", 3, 2))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q10_returned_revenue",
    sql=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    headline=True,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-07-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        # bcast: O(1) fixed dim — nation=25 rows
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue_share",
    sql=f"""
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {SQL_REV} END) AS DOUBLE)
             / CAST(SUM({SQL_REV}) AS DOUBLE) * 100.0 AS promo_share_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01'
      AND l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue %).
    Both sums decimal-exact; the ratio is one double division."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-09-01"))
        & (F.col("l_shipdate") < _ts("1996-10-01"))
    )
    part = t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type").like("PROMO%"), revenue())
    return (
        # no hint: part is O(SF) — AQE broadcasts while it fits
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.sum(promo).cast("double") / F.sum(revenue()).cast("double") * 100.0
            ).alias("promo_share_pct")
        )
    )


@query(
    "q18_large_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_custkey, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group + HAVING on the aggregate (decimal-exact
    threshold compare)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(F.sum(dec("l_quantity")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 150)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("_qty_dec").cast("double").alias("total_qty"),
        )
    )


@query(
    "subquery_scalar_above_avg",
    sql="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                              / COUNT(*) FROM customer)
    """,
)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: customers above the mean balance (SQL API;
    Catalyst plans the subquery as a broadcast scalar)."""
    register_views(spark, sf_dir, ["customer"])
    return spark.sql(
        """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                                  / COUNT(*) FROM customer)
        """
    )


@query(
    "subquery_in_segment",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
    """,
)
def subquery_in_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery (planned as left-semi join)."""
    register_views(spark, sf_dir, ["orders", "customer"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
        """
    )


@query(
    "subquery_correlated_exists",
    sql="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_suppkey = s_suppkey AND l_quantity > 45)
    """,
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (decorrelated by Catalyst into a semi join)."""
    register_views(spark, sf_dir, ["supplier", "lineitem"])
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_suppkey = s_suppkey AND l_quantity > 45)
        """
    )


@query(
    "window_ntile_percent_rank",
    sql="""
    SELECT c_custkey,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
)
def window_ntile_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: ntile / percent_rank / cume_dist
    (both engines use the same (rank-1)/(n-1) double formulas)."""
    cust = t(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "unpivot_order_metrics",
    sql="""
    SELECT o_orderkey, metric, value FROM (
      SELECT o_orderkey, 'totalprice' AS metric,
             o_totalprice AS value FROM orders
      UNION ALL
      SELECT o_orderkey, 'year', CAST(year(o_orderdate) AS DOUBLE) FROM orders
    ) u
    """,
)
def unpivot_order_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack(): wide metrics to (key, metric, value) rows."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', o_totalprice,"
            " 'year', CAST(year(o_orderdate) AS DOUBLE)) AS (metric, value)"
        ),
    )


@query(
    "array_agg_sorted_orders",
    sql="""
    SELECT o_custkey AS custkey,
           array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys,
           CAST(len(list(o_orderkey)) AS INT) AS n_orders
    FROM orders GROUP BY o_custkey
    """,
)
def array_agg_sorted_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_list + sort_array (sorted so the
    nondeterministic collect order can't leak into results). The array
    is emitted as a canonical CSV string — same information, but a
    hashable scalar (array-typed output columns break order-insensitive
    result hashing downstream)."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias(
            "orderkeys"
        ),
        F.size(F.collect_list("o_orderkey")).alias("n_orders"),
    )


@query(
    "string_split_part",
    sql="""
    SELECT p_partkey,
           split_part(p_type, ' ', 1) AS type_class,
           split_part(p_type, ' ', -1) AS type_last,
           CAST(len(string_split(p_type, ' ')) AS INT) AS n_words
    FROM part
    """,
)
def string_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part / token extraction from delimited strings."""
    part = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_type"), " ")
    return part.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_class"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(-1)).alias("type_last"),
        F.size(toks).alias("n_words"),
    )


@query(
    "approx_distinct_stats",
    sql="""
    SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
           COUNT(DISTINCT l_suppkey) AS exact_supps,
           1 AS approx_parts_ok,
           1 AS approx_supps_ok,
           1 AS price_p50_ok,
           1 AS price_p95_ok,
           1 AS price_p99_ok
    FROM lineitem
    """,
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct + approx percentiles — the at-scale
    replacements for exact distinct/quantiles (SURVEY.md §2.4 A3: the
    reference imports countDistinct but never calls it). Raw sketch
    estimates are engine-specific, so the oracle-checkable contract is:
    exact counts (anchored against DuckDB COUNT(DISTINCT)) plus
    bound-check flags asserting the Spark sketches land inside their
    documented error envelopes (HLL++ default rsd=0.05 -> 4-sigma 20%
    bound; percentile_approx default accuracy=10000 -> rank error 1e-4,
    5% value bound on a dense price distribution). Both engines see the
    same deterministic data, so the flags are stable, not flaky."""
    li = t(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_extendedprice", [0.5, 0.95, 0.99])
    qe = F.percentile("l_extendedprice", [0.5, 0.95, 0.99])

    def ok(approx, exact, tol):
        return (F.abs(approx - exact) / exact <= tol).cast("int")

    agg = li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        q.getItem(0).alias("ap50"),
        q.getItem(1).alias("ap95"),
        q.getItem(2).alias("ap99"),
        qe.getItem(0).alias("ep50"),
        qe.getItem(1).alias("ep95"),
        qe.getItem(2).alias("ep99"),
    )
    return agg.select(
        "exact_parts",
        "exact_supps",
        ok(F.col("approx_parts"), F.col("exact_parts"), 0.20).alias("approx_parts_ok"),
        ok(F.col("approx_supps"), F.col("exact_supps"), 0.20).alias("approx_supps_ok"),
        ok(F.col("ap50"), F.col("ep50"), 0.05).alias("price_p50_ok"),
        ok(F.col("ap95"), F.col("ep95"), 0.05).alias("price_p95_ok"),
        ok(F.col("ap99"), F.col("ep99"), 0.05).alias("price_p99_ok"),
    )


@query(
    "events_signup_purchase_funnel",
    sql="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(first_signup) AS n_signed_up,
           COUNT(CASE WHEN first_purchase > first_signup THEN 1 END) AS n_converted
    FROM firsts
    """,
)
def events_signup_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analytics: users whose first purchase follows their first
    signup — one conditional-min aggregation, no self-join."""
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    return firsts.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(
            F.when(F.col("first_purchase") > F.col("first_signup"), F.lit(1))
        ).alias("n_converted"),
    )


@query(
    "window_share_of_total",
    sql=f"""
    WITH per_nation AS (
      SELECT n_name, SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_dec
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name)
    SELECT n_name, CAST(bal_dec AS DOUBLE) AS bal,
           CAST(bal_dec AS DOUBLE) / CAST(SUM(bal_dec) OVER () AS DOUBLE) AS share
    FROM per_nation
    """,
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: per-group value / unpartitioned-window total.

    Scale note: an empty-partition window funnels all rows through one
    reducer — fine here (25 nation rows post-agg), but on a large frame
    compute the total as a broadcast scalar instead. The window total is
    summed as DECIMAL (exact, order-independent: a double window sum
    would differ in the last bit across engines' accumulation orders)."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    per_nation = (
        # bcast: O(1) fixed dim — nation=25 rows
        cust.join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(dec("c_acctbal")).alias("bal_dec"))
    )
    w = W.partitionBy()
    return per_nation.select(
        "n_name",
        F.col("bal_dec").cast("double").alias("bal"),
        (
            F.col("bal_dec").cast("double")
            / F.sum("bal_dec").over(w).cast("double")
        ).alias("share"),
    )


@query(
    "grouping_sets_explicit",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): two independent
    groupings in one pass over the fact."""
    from ..io import register_views

    register_views(spark, sf_dir, ["lineitem"])
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


@query(
    "set_union_distinct",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct semantics) — completes the set-op family next to
    union-all/intersect/except."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "agg_exact_percentiles",
    sql="""
    SELECT c_mktsegment,
           quantile_cont(c_acctbal, 0.25) AS p25,
           quantile_cont(c_acctbal, 0.5)  AS p50,
           quantile_cont(c_acctbal, 0.95) AS p95
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (F.percentile / quantile_cont —
    both engines use the same (n-1)p linear interpolation, verified
    bit-identical). The at-scale variant is percentile_approx
    (approx_distinct_stats, rows-only)."""
    cust = t(spark, sf_dir, "customer")
    return cust.groupBy("c_mktsegment").agg(
        F.percentile("c_acctbal", 0.25).alias("p25"),
        F.percentile("c_acctbal", 0.5).alias("p50"),
        F.percentile("c_acctbal", 0.95).alias("p95"),
    )


@query(
    "agg_histogram_prices",
    sql="""
    WITH b AS (
      SELECT LEAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
                   // 5000000, 11) AS bucket,
             CAST(o_totalprice AS DECIMAL(12,2)) AS p
      FROM orders)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * 50000 AS BIGINT) AS lo_edge,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(p) AS DOUBLE) AS min_price,
           CAST(MAX(p) AS DOUBLE) AS max_price,
           CAST(SUM(p) AS DOUBLE) AS sum_price
    FROM b GROUP BY bucket
    """,
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram profiling (width_bucket shape with literal
    edges, clamped top bucket): 12 x 50k buckets over o_totalprice.
    Bucket assignment is exact integer arithmetic on cents (BIGINT DIV,
    no double division), so membership is engine-independent;
    per-bucket min/max/sum are decimal-exact then cast once. Map-only
    bucket projection + one partial-aggregated groupBy — the profiling
    primitive behind histogram-equalized salting and data-skipping
    diagnostics. Literal edges keep it a single pass (no min/max
    pre-job); operators/profile.py covers data-driven bounds."""
    orders = t(spark, sf_dir, "orders")
    b = orders.select(
        F.expr(
            "LEAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " DIV 5000000, CAST(11 AS BIGINT))"
        ).alias("bucket"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("p").cast("double").alias("min_price"),
            F.max("p").cast("double").alias("max_price"),
            F.sum("p").cast("double").alias("sum_price"),
        )
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("bigint").alias("lo_edge"),
            "n_orders",
            "min_price",
            "max_price",
            "sum_price",
        )
    )


@query(
    "agg_regression_trend",
    sql="""
    WITH xy AS (
      SELECT o_orderpriority,
             CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS x,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
      FROM orders),
    s AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             regr_slope(CAST(y AS DOUBLE) / 100.0, CAST(x AS DOUBLE)) AS native
      FROM xy GROUP BY o_orderpriority)
    SELECT o_orderpriority, n,
           CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy
                AS DOUBLE)
           / CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx
                  AS DOUBLE) / 100.0 AS slope_per_day,
           ABS(native - CAST(CAST(n AS DECIMAL(38,0)) * sxy
                             - CAST(sx AS DECIMAL(38,0)) * sy AS DOUBLE)
                        / CAST(CAST(n AS DECIMAL(38,0)) * sxx
                               - CAST(sx AS DECIMAL(38,0)) * sx AS DOUBLE) / 100.0)
             <= 1e-6 * ABS(native) AS native_agrees
    FROM s
    """,
)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (regression aggregate family):
    slope of o_totalprice vs order date per o_orderpriority.

    Determinism contract: the slope is computed from exact integer
    sums — x in days (BIGINT), y in cents (BIGINT via DECIMAL cast),
    n*Sxy - Sx*Sy and n*Sxx - Sx*Sx combined in DECIMAL(38,0) (the
    BIGINT-overflow-safe width) — then ONE double division, so the
    result is partition-order-independent and engine-exact. The native
    regr_slope (double accumulation, order-dependent) is emitted only
    as a tolerance FLAG, the same contract as approx_distinct_stats.
    One partial-aggregated groupBy; all regr_* moments are map-side
    combinable at scale."""
    orders = t(spark, sf_dir, "orders")
    xy = orders.select(
        "o_orderpriority",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01"))
        .cast("bigint")
        .alias("x"),
        (F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("y"),
    )
    s = xy.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.expr("regr_slope(CAST(y AS DOUBLE) / 100.0, CAST(x AS DOUBLE))").alias(
            "native"
        ),
    )
    num = F.expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy"
        " AS DOUBLE)"
    )
    den = F.expr(
        "CAST(CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx"
        " AS DOUBLE)"
    )
    slope = num / den / F.lit(100.0)
    return s.select(
        "o_orderpriority",
        "n",
        slope.alias("slope_per_day"),
        (F.abs(F.col("native") - slope) <= F.lit(1e-6) * F.abs("native")).alias(
            "native_agrees"
        ),
    )


@query(
    "agg_histogram_equidepth",
    sql="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.125) AS q1,
             quantile_cont(o_totalprice, 0.25)  AS q2,
             quantile_cont(o_totalprice, 0.375) AS q3,
             quantile_cont(o_totalprice, 0.5)   AS q4,
             quantile_cont(o_totalprice, 0.625) AS q5,
             quantile_cont(o_totalprice, 0.75)  AS q6,
             quantile_cont(o_totalprice, 0.875) AS q7
      FROM orders),
    assigned AS (
      SELECT CAST((o_totalprice > q1) AS INT) + CAST((o_totalprice > q2) AS INT)
             + CAST((o_totalprice > q3) AS INT) + CAST((o_totalprice > q4) AS INT)
             + CAST((o_totalprice > q5) AS INT) + CAST((o_totalprice > q6) AS INT)
             + CAST((o_totalprice > q7) AS INT) AS bucket,
             CAST(o_totalprice AS DECIMAL(12,2)) AS p
      FROM orders CROSS JOIN b)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(p) AS DOUBLE) AS min_price,
           CAST(MAX(p) AS DOUBLE) AS max_price,
           CAST(SUM(p) AS DOUBLE) AS sum_price
    FROM assigned GROUP BY bucket
    """,
)
def agg_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (the selectivity-estimation form: ~equal
    row counts per bucket, data-driven edges): one exact-percentile
    aggregation produces the 7 octile boundaries (partial-aggregated;
    at extreme scale swap in percentile_approx under the
    approx-verification contract), the 1-row boundary set broadcasts
    via the lazy scalar-attach idiom, and bucket assignment is a
    map-only sum of comparisons — no sort, no ntile's global window
    (an unpartitioned ntile is a one-task sort; this shape is why the
    engine never uses it). Boundary doubles are bit-equal cross-engine
    (same (n-1)p interpolation, see agg_exact_percentiles), so bucket
    membership is too."""
    orders = t(spark, sf_dir, "orders")
    qs = [i / 8.0 for i in range(1, 8)]
    b = orders.agg(
        *[F.percentile("o_totalprice", q).alias(f"q{i}") for i, q in enumerate(qs, 1)]
    )
    bucket = sum(
        (F.col("o_totalprice") > F.col(f"q{i}")).cast("int") for i in range(1, 8)
    )
    # bcast: O(1) — single-row percentile-boundary scalar attach
    assigned = orders.crossJoin(F.broadcast(b)).select(
        bucket.alias("bucket"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    return assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("p").cast("double").alias("min_price"),
        F.max("p").cast("double").alias("max_price"),
        F.sum("p").cast("double").alias("sum_price"),
    )


@query(
    "mining_part_pair_lift",
    sql="""
    WITH op AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
    n_ord AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM op),
    pc AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS c FROM op GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM op a JOIN op b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY 1, 2),
    scored AS (
      SELECT p.part_a, p.part_b, p.c_ab,
             ca.c AS c_a, cb.c AS c_b,
             CAST(p.c_ab AS DOUBLE) / CAST(n.n AS DOUBLE) AS support,
             (CAST(p.c_ab AS DOUBLE) * CAST(n.n AS DOUBLE))
               / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) AS lift
      FROM pairs p
      JOIN pc ca ON ca.pk = p.part_a
      JOIN pc cb ON cb.pk = p.part_b
      CROSS JOIN n_ord n
      WHERE p.c_ab >= 3)
    SELECT part_a, part_b, c_ab, c_a, c_b, support, lift
    FROM scored
    ORDER BY lift DESC, part_a, part_b LIMIT 20
    """,
)
def mining_part_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence mining: top part pairs by LIFT
    (P(ab)/(P(a)P(b))) with a minimum-support floor — the
    association-rules primitive behind recommendations and
    assortment analysis. Scale shape: the self-join runs on the order
    key, so fan-out per order is C(items_per_order, 2) — bounded by
    basket size (<= 7 lines here), LINEAR in orders, never part x part;
    the per-part count tables scale with the part dimension (sf100k ~
    20 B parts), so they get NO broadcast hint — AQE picks broadcast
    when they fit and shuffle-hash/sort-merge when they don't (an
    explicit hint here would override AQE's size check and OOM at
    scale — VERDICT r3 flag, cleared); the 1-row order total attaches
    via the lazy scalar (lint-allowlisted); global top-20 is
    TakeOrdered. Lift and
    support are single float compositions of exact integer counts with
    deterministic (lift, part_a, part_b) ordering."""
    li = t(spark, sf_dir, "lineitem")
    op = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n_ord = op.agg(F.count_distinct("ok").alias("n"))
    pc = op.groupBy("pk").agg(F.count(F.lit(1)).alias("c"))
    a = op.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = op.select(F.col("ok"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ca = pc.select(F.col("pk").alias("part_a"), F.col("c").alias("c_a"))
    cb = pc.select(F.col("pk").alias("part_b"), F.col("c").alias("c_b"))
    scored = (
        # no hint: ca/cb are O(parts) — dimension-sized, AQE decides
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        # bcast: O(1) — single-row aggregate scalar attach
        .crossJoin(F.broadcast(n_ord))
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            (F.col("c_ab").cast("double") / F.col("n").cast("double")).alias(
                "support"
            ),
            (
                F.col("c_ab").cast("double") * F.col("n").cast("double")
                / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.desc("lift"), "part_a", "part_b").limit(20)


# DuckDB twin of functions.casts.big_double: the exact-split
# wide-integer->double recipe is injected below so both engines run
# bit-identical final arithmetic (see big_double_duck_sql for the
# DECIMAL-vs-HUGEINT `//` gotcha this avoids).
_CORR_SQL = """
    WITH spend AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT)
               AS cents
      FROM orders GROUP BY o_custkey),
    xy AS (
      SELECT c.c_nationkey AS nk,
             CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
             CAST(COALESCE(s.cents, 0) AS BIGINT) AS y
      FROM customer c LEFT JOIN spend s ON s.o_custkey = c.c_custkey),
    ranked AS (
      SELECT nk, x, y,
             CAST(RANK() OVER (PARTITION BY nk ORDER BY x ASC)
                  - RANK() OVER (PARTITION BY nk ORDER BY x DESC)
                  AS BIGINT) AS dx,
             CAST(RANK() OVER (PARTITION BY nk ORDER BY y ASC)
                  - RANK() OVER (PARTITION BY nk ORDER BY y DESC)
                  AS BIGINT) AS dy
      FROM xy),
    s AS (
      SELECT nk,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
             CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
             CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(dx * dx) AS DECIMAL(38,0)) AS rxx,
             CAST(SUM(dy * dy) AS DECIMAL(38,0)) AS ryy,
             CAST(SUM(dx * dy) AS DECIMAL(38,0)) AS rxy,
             corr(CAST(x AS DOUBLE), CAST(y AS DOUBLE)) AS native
      FROM ranked GROUP BY nk),
    w AS (
      SELECT n_name, n, native,
             CAST(n AS DECIMAL(38,0)) * sxy
               - CAST(sx AS DECIMAL(38,0)) * sy AS wpnum,
             CAST(n AS DECIMAL(38,0)) * sxx
               - CAST(sx AS DECIMAL(38,0)) * sx AS wpdx,
             CAST(n AS DECIMAL(38,0)) * syy
               - CAST(sy AS DECIMAL(38,0)) * sy AS wpdy,
             CAST(n AS DECIMAL(38,0)) * rxy AS wrnum,
             CAST(n AS DECIMAL(38,0)) * rxx AS wrdx,
             CAST(n AS DECIMAL(38,0)) * ryy AS wrdy
      FROM s JOIN nation ON n_nationkey = nk),
    f AS (
      SELECT n_name, n, native,
             {bd_pnum} AS pnum, {bd_pdx} AS pdx, {bd_pdy} AS pdy,
             {bd_rnum} AS rnum, {bd_rdx} AS rdx, {bd_rdy} AS rdy
      FROM w),
    r AS (
      SELECT n_name, n AS n_custs,
             CASE WHEN pdx > 0.0 AND pdy > 0.0
                  THEN pnum / (SQRT(pdx) * SQRT(pdy)) END AS pearson_r,
             CASE WHEN rdx > 0.0 AND rdy > 0.0
                  THEN rnum / (SQRT(rdx) * SQRT(rdy)) END AS spearman_rho,
             native
      FROM f)
    SELECT n_name, n_custs, pearson_r, spearman_rho,
           ABS(native - pearson_r) <= 1e-6 * ABS(native) AS native_agrees
    FROM r ORDER BY n_name
    """.format(
    bd_pnum=big_double_duck_sql("wpnum"),
    bd_pdx=big_double_duck_sql("wpdx"),
    bd_pdy=big_double_duck_sql("wpdy"),
    bd_rnum=big_double_duck_sql("wrnum"),
    bd_rdx=big_double_duck_sql("wrdx"),
    bd_rdy=big_double_duck_sql("wrdy"),
)


@query(
    "agg_correlation_per_nation",
    sql=_CORR_SQL,
)
def agg_correlation_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation Pearson correlation + Spearman rank correlation
    between a customer's account balance and their lifetime order
    spend — the grouped bivariate-statistics operator (feature/target
    association scans in a curation pipeline).

    Determinism contract (the agg_regression_trend convention): both
    coefficients come from EXACT integer sums — cents-BIGINT values,
    DECIMAL(38,0) second moments (y*y overflows BIGINT at sf>=1 on the
    Spark side, where sum(long) wraps silently), combined n*Sxy-Sx*Sy
    style in DECIMAL(38,0) — then one identical double expression with
    correctly-rounded sqrt, so both engines produce bit-equal doubles.
    Spearman avoids fractional tied ranks by correlating
    dx = rank_asc - rank_desc (an exact-integer affine image of the
    average tie rank: 2*avg_rank - (n+1); correlation is affine-
    invariant, so rho is unchanged). The native double-accumulating
    corr() is emitted only as a tolerance flag.

    Scale shape: one partial-agg groupBy(custkey), one customer join,
    ONE window exchange per nation key (asc and desc rank specs share
    the partitioning, so Catalyst plans one Exchange + two sorts), one
    partial-agg groupBy(nation). Zero-variance groups yield NULL, not
    a divide-by-zero, under an identical CASE in both engines."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    xy = (
        cust.join(spend, spend.o_custkey == cust.c_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nk"),
            (F.col("c_acctbal").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("x"),
            F.coalesce(F.col("cents"), F.lit(0)).cast("bigint").alias("y"),
        )
    )
    wnk = W.partitionBy("nk")
    ranked = xy.select(
        "nk",
        "x",
        "y",
        (
            F.rank().over(wnk.orderBy(F.col("x").asc()))
            - F.rank().over(wnk.orderBy(F.col("x").desc()))
        ).cast("bigint").alias("dx"),
        (
            F.rank().over(wnk.orderBy(F.col("y").asc()))
            - F.rank().over(wnk.orderBy(F.col("y").desc()))
        ).cast("bigint").alias("dy"),
    )
    d38 = "decimal(38,0)"
    s = ranked.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(d38)).cast(d38).alias("sxx"),
        F.sum(F.col("y").cast(d38) * F.col("y").cast(d38)).cast(d38).alias("syy"),
        F.sum(F.col("x").cast(d38) * F.col("y").cast(d38)).cast(d38).alias("sxy"),
        F.sum((F.col("dx") * F.col("dx")).cast(d38)).cast(d38).alias("rxx"),
        F.sum((F.col("dy") * F.col("dy")).cast(d38)).cast(d38).alias("ryy"),
        F.sum((F.col("dx") * F.col("dy")).cast(d38)).cast(d38).alias("rxy"),
        F.corr(F.col("x").cast("double"), F.col("y").cast("double")).alias(
            "native"
        ),
    )
    w = (
        s.join(nation, nation.n_nationkey == s.nk)
        .select(
            "n_name",
            "n",
            "native",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sxy"
                " - CAST(sx AS DECIMAL(38,0)) * sy"
            ).alias("wpnum"),
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sxx"
                " - CAST(sx AS DECIMAL(38,0)) * sx"
            ).alias("wpdx"),
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * syy"
                " - CAST(sy AS DECIMAL(38,0)) * sy"
            ).alias("wpdy"),
            F.expr("CAST(n AS DECIMAL(38,0)) * rxy").alias("wrnum"),
            F.expr("CAST(n AS DECIMAL(38,0)) * rxx").alias("wrdx"),
            F.expr("CAST(n AS DECIMAL(38,0)) * ryy").alias("wrdy"),
        )
    )
    f = w.select(
        "n_name",
        "n",
        "native",
        big_double("wpnum").alias("pnum"),
        big_double("wpdx").alias("pdx"),
        big_double("wpdy").alias("pdy"),
        big_double("wrnum").alias("rnum"),
        big_double("wrdx").alias("rdx"),
        big_double("wrdy").alias("rdy"),
    )
    pearson = F.when(
        (F.col("pdx") > 0.0) & (F.col("pdy") > 0.0),
        F.col("pnum") / (F.sqrt(F.col("pdx")) * F.sqrt(F.col("pdy"))),
    )
    spearman = F.when(
        (F.col("rdx") > 0.0) & (F.col("rdy") > 0.0),
        F.col("rnum") / (F.sqrt(F.col("rdx")) * F.sqrt(F.col("rdy"))),
    )
    return (
        f.select(
            "n_name",
            F.col("n").alias("n_custs"),
            pearson.alias("pearson_r"),
            spearman.alias("spearman_rho"),
            (
                F.abs(F.col("native") - pearson)
                <= F.lit(1e-6) * F.abs(F.col("native"))
            ).alias("native_agrees"),
        )
        .orderBy("n_name")
    )
