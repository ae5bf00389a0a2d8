"""Relational operator surface: scans, filters, joins (inner/left/semi/
anti/broadcast), aggregations (group/rollup/cube/pivot), window functions,
sort/limit/top-k, set operations, scalar functions.

The reference implements none of these beyond projection/explode (SURVEY.md
§2.3-2.5: "no join, no window, no sort, no set op anywhere") — they are
required engine surface for any consumer of the normalized tables, and the
correctness oracle exercises them over the TPC-H-ish star schema.

Plan-quality notes (verified via .explain("formatted")):
- filters/projections push into the parquet scan (PushedFilters/ReadSchema);
- small dims (region/nation/part/supplier at these SFs) broadcast —
  explicitly hinted where the join is the point of the query;
- aggregates are partial (map-side) before the exchange;
- AQE coalesces post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import query, t


# --- shared decimal-exact expression helpers (Spark side) -----------------
def dec(c: str | Column, p: int = 12, s: int = 2) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({p},{s})")


def one() -> Column:
    return F.lit(1).cast("decimal(3,2)")


def revenue() -> Column:
    """l_extendedprice * (1 - l_discount), decimal-exact."""
    return dec("l_extendedprice") * (one() - dec("l_discount", 3, 2))


# DuckDB oracle forms of the same expressions
SQL_DEC = "CAST({c} AS DECIMAL({p},{s}))"
SQL_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))"
)


def _ts(s: str) -> Column:
    return F.lit(s).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Headline star queries
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    sql=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({SQL_REV}), 2) AS DOUBLE) AS sum_disc_price,
           CAST(ROUND(SUM({SQL_REV} * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan -> pushed filter -> hash agg (partial+final).

    One shuffle on the 6-value (flag,status) key; decimal-exact sums so
    the result is independent of partition order at any scale.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= _ts("1998-09-02"))
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        # money sums ROUNDED to cents (scale 2) before the double cast:
        # at sf1 the scale-6 charge sum's integer mantissa exceeds
        # 2^53 and DuckDB's wide-decimal->double goes through int128
        # with DOUBLE rounding (~1.5 ulp off the correctly-rounded
        # value Spark/BigDecimal produce); at scale 2 the mantissa
        # stays exact in both engines until sums reach ~9e13. ROUND,
        # not a narrowing decimal cast: Spark's cast rounds HALF_UP
        # but DuckDB's TRUNCATES on scale reduction, while both
        # engines' ROUND is half-away-from-zero on positive decimals
        F.round(F.sum(revenue()), 2).cast("double")
        .alias("sum_disc_price"),
        F.round(F.sum(revenue() * (one() + dec("l_tax", 3, 2))), 2)
        .cast("double").alias("sum_charge"),
        (F.sum(dec("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(dec("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
        (F.sum(dec("l_discount", 3, 2)).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@query(
    "q3_shipping_priority",
    sql=f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    customer(filtered) broadcasts under AQE; ORDER BY uses the
    decimal-exact revenue plus the unique key as tiebreak so the LIMIT
    set is deterministic.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < _ts("1998-03-15"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-03-15"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    sql=f"""
    SELECT n_name, CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    headline=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join, small dims broadcast.

    region/nation/supplier are broadcast-hinted (they stay tiny at any
    SF: fixed-cardinality dims), so the only shuffles are the
    orders<->lineitem join and the final 1-key agg.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            # no hint: supplier is O(SF) — AQE broadcasts while it fits
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        # bcast: O(1) fixed dims — nation=25 rows, region=5 rows
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_orders_customers",
    sql="""
    SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'P'
    """,
)
def join_inner_orders_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; the filtered fact side keeps the build side small."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    cust = t(spark, sf_dir, "customer")
    return orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_left_order_counts",
    sql="""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count 0, spend 0)."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "join_semi_active_customers",
    sql="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
    """,
)
def join_semi_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): no row multiplication, build side deduped."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti_dormant_customers",
    sql="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_anti_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no pending orders.

    (Anti-joins against the full orders table are vacuously empty in
    this generator — every customer has orders — so the build side is
    filtered to keep the result non-trivial.)"""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_broadcast_brand_revenue",
    sql=f"""
    SELECT p_brand, CAST(SUM({SQL_REV}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the part dim: fact side never shuffles for
    the join (only for the tiny final agg). The 100 TB pattern for
    fact<->dim enrichment. This query IS the engine's explicit-hint
    operator: the hint carries the caller's size contract (dim fits in
    executor memory). For dims that scale with the fact data, omit the
    hint and let AQE size-check — see mining_part_pair_lift."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        # bcast: caller-contract — the explicit-hint operator itself
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(revenue()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_group_stats",
    sql="""
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
           MIN(c_acctbal) AS min_bal,
           MAX(c_acctbal) AS max_bal,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + sum/min/max/count/countDistinct/avg (SURVEY.md §2.4)."""
    cust = t(spark, sf_dir, "customer")
    cnt = F.count(F.lit(1))
    return cust.groupBy("c_mktsegment").agg(
        cnt.alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.max("c_acctbal").alias("max_bal"),
        (F.sum(dec("c_acctbal")).cast("double") / cnt).alias("avg_bal"),
    )


@query(
    "agg_rollup_region_nation",
    sql="""
    SELECT r_name, n_name,
           CAST(GROUPING(r_name)*2 + GROUPING(n_name) AS BIGINT) AS gid,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP(r_name, n_name)
    """,
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total)."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region")
    # bcast: O(1) fixed dims — nation=25 rows, region=5 rows
    joined = cust.join(
        F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey")
    ).join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
    return joined.rollup("r_name", "n_name").agg(
        (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
    )


@query(
    "agg_cube_flag_status",
    sql="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag)*2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def agg_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations in one pass."""
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
        .cast("bigint")
        .alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
    )


@query(
    "agg_pivot_status_by_priority",
    sql="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "O",
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "F",
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS "P"
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: orderstatus values to columns (conditional-agg oracle)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_nation",
    sql="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal, rnk FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer) x
    WHERE rnk <= 3
    """,
)
def window_topk_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number — the scalable top-k pattern (one
    shuffle on the partition key; no global sort)."""
    cust = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal", "rnk")
    )


@query(
    "window_lag_lead_orders",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice)  OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lag_lead_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/rank/dense_rank over a deterministic per-customer order."""
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "window_running_spend",
    sql="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
                / LEAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS moving_avg3
    FROM orders
    """,
    headline=True,
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average with explicit ROWS frames."""
    orders = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    mov = w.rowsBetween(-2, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(run).cast("double").alias("running_spend"),
        (
            F.sum(dec("o_totalprice")).over(mov).cast("double")
            / F.least(F.count(F.lit(1)).over(mov), F.lit(3))
        ).alias("moving_avg3"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# ---------------------------------------------------------------------------


@query(
    "sort_limit_top_orders",
    sql="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def sort_limit_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge), never a full sort."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    ).orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(20)


@query(
    "set_union_high_value_parties",
    sql="""
    SELECT * FROM (
      SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS side
      FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS side
      FROM supplier WHERE s_acctbal > 9000) u
    """,
)
def set_union_high_value_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL by name across heterogeneous sources."""
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("acctbal"),
            F.lit("customer").alias("side"),
        )
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.col("s_name").alias("name"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("side"),
        )
    )
    return cust.unionByName(supp)


@query(
    "set_intersect_nations",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics): nations with both customers and
    suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except_nations",
    sql="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "distinct_order_months",
    sql="""
    SELECT DISTINCT o_orderstatus, date_trunc('month', o_orderdate) AS order_month
    FROM orders
    """,
)
def distinct_order_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a computed column."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderstatus", F.date_trunc("month", F.col("o_orderdate")).alias("order_month")
    ).distinct()


# ---------------------------------------------------------------------------
# Scalar functions
# ---------------------------------------------------------------------------


@query(
    "scalar_string_functions",
    sql="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           LENGTH(p_name) AS name_len,
           SUBSTRING(p_type, 1, 5) AS type_prefix,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_name, ' ', '_') AS name_snake,
           TRIM(p_name) AS name_trim,
           p_name LIKE '%a%' AS has_a,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def scalar_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (SURVEY.md §2.6 engine surface)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", " ", "_").alias("name_snake"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@query(
    "scalar_date_functions",
    sql="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month,
           CAST(day(o_orderdate) AS INT)     AS order_day,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           date_trunc('month', o_orderdate)  AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95,
           o_orderdate + INTERVAL 3 MONTH AS plus_3_months
    FROM orders
    """,
)
def scalar_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time extraction + truncation + arithmetic (reference parses
    timestamps but never computes on them; engine surface per §2.6)."""
    orders = t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01")).alias("days_since_95"),
        F.add_months(F.col("o_orderdate"), 3).cast("timestamp_ntz").alias("plus_3_months"),
    )


@query(
    "scalar_math_functions",
    sql="""
    SELECT c_custkey,
           ABS(c_acctbal) AS abs_bal,
           CAST(FLOOR(c_acctbal) AS DOUBLE) AS floor_bal,
           CAST(CEIL(c_acctbal) AS DOUBLE) AS ceil_bal,
           SQRT(ABS(c_acctbal)) AS sqrt_bal,
           ROUND(LN(ABS(c_acctbal) + 1), 6) AS ln_bal,
           CAST(SIGN(c_acctbal) AS DOUBLE) AS sign_bal,
           c_custkey % 7 AS mod7,
           GREATEST(c_acctbal, 0) AS pos_part,
           LEAST(c_acctbal, 0) AS neg_part
    FROM customer
    """,
)
def scalar_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family; transcendentals rounded to 6 dp (libm last-ulp
    differences between JVM and C++ would otherwise break hash equality)."""
    cust = t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.abs(F.col("c_acctbal")).alias("abs_bal"),
        F.floor("c_acctbal").cast("double").alias("floor_bal"),
        F.ceil("c_acctbal").cast("double").alias("ceil_bal"),
        F.sqrt(F.abs(F.col("c_acctbal"))).alias("sqrt_bal"),
        F.round(F.log(F.abs(F.col("c_acctbal")) + 1), 6).alias("ln_bal"),
        F.signum("c_acctbal").cast("double").alias("sign_bal"),
        (F.col("c_custkey") % 7).alias("mod7"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("pos_part"),
        F.least(F.col("c_acctbal"), F.lit(0.0)).alias("neg_part"),
    )


@query(
    "case_when_balance_tiers",
    sql="""
    SELECT tier, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
    FROM (
      SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                  WHEN c_acctbal < 5000 THEN 'low'
                  WHEN c_acctbal < 9000 THEN 'mid'
                  ELSE 'high' END AS tier,
             c_acctbal
      FROM customer) x
    GROUP BY tier
    """,
)
def case_when_balance_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregation."""
    cust = t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "negative")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    return (
        cust.select(tier.alias("tier"), "c_acctbal")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("c_acctbal")).cast("double").alias("sum_bal"),
        )
    )


@query(
    "join_full_outer_nation_presence",
    sql="""
    WITH cu AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_customers
                FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey),
         su AS (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_suppliers
                FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
    SELECT COALESCE(cu.nk, su.nk) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers,
           (cu.nk IS NULL) AS suppliers_only,
           (su.nk IS NULL) AS customers_only
    FROM cu FULL OUTER JOIN su ON cu.nk = su.nk
    """,
)
def join_full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (the one join type the registry lacked):
    high-balance customer counts vs supplier counts per nation — the
    acctbal filters make each side miss nations the other has, so both
    null-extension directions actually occur. COALESCE rebuilds the key
    and zero-fills counts; the boolean flags expose which side was
    absent. Full-outer cannot broadcast either side (both must be
    null-extended) — Catalyst picks a sort-merge join on the (tiny,
    pre-aggregated) per-nation counts, which is the right at-scale
    shape: aggregate BEFORE the full-outer so the expensive join sees
    |nations| rows, not |customers|."""
    cu = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    su = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    joined = cu.alias("cu").join(
        su.alias("su"), F.col("cu.nk") == F.col("su.nk"), "full_outer"
    )
    return joined.select(
        F.coalesce(F.col("cu.nk"), F.col("su.nk")).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
        F.col("cu.nk").isNull().alias("suppliers_only"),
        F.col("su.nk").isNull().alias("customers_only"),
    )
