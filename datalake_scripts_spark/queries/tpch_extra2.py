"""TPC-H-shaped queries, batch 4: national market share (Q8), top
supplier by revenue (Q15), supplier-part variety counts (Q16 shape over
the lineitem bridge — testdata has no partsupp table), and
small-quantity-order revenue with a correlated avg (Q17).

Reference parity note: the reference repo (vgarshin/datalake_scripts)
implements no joins at all (SURVEY.md §2.3); these exist to cover the
full relational surface the engine must provide. All dims are broadcast
(nation/region/part/supplier are tiny relative to lineitem at any SF);
the fact-side filters sit directly on the scan so Parquet gets them as
PushedFilters.

Determinism: monetary sums are decimal-exact then cast to double at the
boundary; ratios divide two already-identical doubles (bit-equal in both
engines); year()/rank() outputs cast to INT explicitly (Spark int32 vs
DuckDB int64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import query, t
from .relational import SQL_REV, revenue


@query(
    "q8_national_market_share",
    sql=f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_2' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             {SQL_REV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region    ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 7-table star with the nation dim joined on both
    the customer and supplier sides, conditional-sum share per year.
    Plan shape at scale: lineitem scans once with the date predicate
    pushed; every dim is broadcast, so the whole query is one shuffle
    (the final year groupBy)."""
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp_ntz"))
    )
    cust = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = t(spark, sf_dir, "supplier")

    zero = F.lit(0).cast("decimal(12,2)")
    vol = revenue().alias("volume")
    all_nations = (
        # no hint on part/supp: O(SF) — AQE broadcasts while they fit
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        # bcast: O(1) fixed dims — nation=25 rows, region=5 rows
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(F.year("o_orderdate").cast("int").alias("o_year"), vol, "nation")
    )
    return all_nations.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_2", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


@query(
    "q15_top_supplier",
    sql=f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no, SUM({SQL_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-then-argmax via an unpartitioned
    max comparison. Implemented as a rank-free max-join (decimal-exact
    revenue, so the equality is safe in both engines) instead of a
    global window — at scale the revenue0 aggregate is one shuffle and
    the max is a broadcast scalar, so no single-partition window
    bottleneck."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(revenue()).alias("total_revenue")
    )
    max_rev = revenue0.agg(F.max("total_revenue").alias("mx"))
    supp = t(spark, sf_dir, "supplier")
    return (
        # bcast: O(1) — single-row max-revenue scalar attach
        revenue0.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("mx"))
        # no hint: supplier is O(SF) — AQE decides
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_variety",
    sql="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape re-based on the lineitem bridge (testdata has no
    partsupp): distinct-supplier counts per part attribute triple, with
    a NOT IN anti-join excluding negative-balance suppliers (stand-in
    for the complaints predicate). The anti side is broadcast; the
    distinct count is the only wide operation."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    li = t(spark, sf_dir, "lineitem")
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        # no hint on part / the supplier-subset anti side: O(SF) — AQE
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            bad_supp,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    sql="""
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS a_partkey,
                 0.2 * (SUM(l_quantity) / COUNT(l_quantity)) AS qty_limit
          FROM lineitem GROUP BY l_partkey) pa
      ON p_partkey = a_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < qty_limit
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into an aggregate self-join — the form
    Catalyst itself rewrites Q17 into. l_quantity holds integer values,
    so sum/count is order-independent and the 0.2x threshold is
    bit-identical across engines. At scale: per-part agg and the
    fact join shuffle on the same key (l_partkey), so AQE can reuse
    the exchange; part is broadcast."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.lit(0.2) * (F.sum("l_quantity") / F.count("l_quantity"))
        ).alias("qty_limit")
    )
    return (
        # no hint: part (filtered, still O(SF)) — AQE decides
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("p_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_limit"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double")
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q21_waiting_suppliers",
    sql="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders   ON o_orderkey = l1.l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: correlated EXISTS + NOT EXISTS over the same
    fact table, decorrelated to a left-semi and a left-anti join on the
    shared order key (testdata has no receipt/commit dates, so the
    'late' predicate is re-based on l_returnflag = 'R'). All three
    lineitem branches shuffle on l_orderkey, so AQE reuses one exchange;
    supplier and nation broadcast."""
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = t(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    # the semi/anti sides are same-sized fact projections: force the
    # sort-merge join — AQE's compressed-size estimate can pick a
    # broadcast (or hash build) that exhausts memory at scale (seen at
    # 6M rows, k=10); SMJ spills instead of failing
    waiting = (
        l1.join(
            l2.hint("merge"),
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            l3.hint("merge"),
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        # no hint: supplier is O(SF) — AQE decides
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        # bcast: O(1) fixed dim — nation=25 rows
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q12_SQL = """
    SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag = 'N'
    GROUP BY ship_year
"""


@query("q12_priority_line_classes", sql=_Q12_SQL)
def q12_priority_line_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-dim join + dual conditional counts per
    group (testdata has no shipmode/commit/receipt dates, so classes
    re-base on order priority and the window on ship year). One shuffle
    (the year groupBy); the returnflag filter is pushed to the lineitem
    scan."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "N")
    orders = t(spark, sf_dir, "orders")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_year"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


_Q11_SQL = """
    WITH value_by_part AS (
      SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS val
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
    FROM value_by_part
    WHERE val > (SELECT SUM(val) * 0.001 FROM value_by_part)
"""


@query("q11_important_part_values", sql=_Q11_SQL)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape re-based on the lineitem bridge (no partsupp):
    per-part value within one nation, kept only above a fraction of the
    nation's total — the HAVING-against-global-scalar shape. SQL API on
    purpose: Catalyst plans the scalar subquery as a broadcast reused
    against the same aggregate, and AQE reuses the value_by_part
    exchange for both consumers. Decimal-exact sums; the 0.001 threshold
    multiply happens on identical doubles in both engines."""
    from ..io import register_views

    register_views(spark, sf_dir, ["lineitem", "supplier", "nation"])
    return spark.sql(_Q11_SQL)


_Q9_SQL = f"""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
             {SQL_REV}
               - CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) profit
    GROUP BY nation, o_year
"""


@query("q9_product_type_profit", sql=_Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: LIKE-filtered part dim, 5-table join, profit
    expression spanning three tables, nation x year rollup (testdata has
    no partsupp, so supply cost re-bases on p_retailprice). Dims
    broadcast; lineitem streams through with one final shuffle."""
    from .relational import dec, one

    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    orders = t(spark, sf_dir, "orders")
    nation = t(spark, sf_dir, "nation")
    amount = revenue() - dec("p_retailprice") * dec("l_quantity")
    return (
        # no hint on part/supp: O(SF) — AQE broadcasts while they fit
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        # bcast: O(1) fixed dim — nation=25 rows
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# ---- derived partsupp -------------------------------------------------
# testdata has no partsupp table, which round-1/2 diagnosed as making
# the Q2/Q20 shapes unshapeable. But the oracle only requires BOTH
# engines to see the same relation — so derive one as a deterministic
# function of part x supplier, dbgen-style (each part stocked by 4
# suppliers at arithmetic offsets; availqty/supplycost from integer
# mixes of the keys). No cross join: 4 rows per part via explode, then
# an equi-join to supplier. Keys start at 0 in the testdata, matching
# the % arithmetic.
_PS_SQL = """
    nsup AS (SELECT COUNT(*) AS n FROM supplier),
    ps AS (
      SELECT p.p_partkey,
             (p.p_partkey + j.j * (nsup.n // 4)) % nsup.n AS ps_suppkey,
             ((p.p_partkey * 7 + ((p.p_partkey + j.j * (nsup.n // 4)) % nsup.n) * 11)
               % 10000) + 1 AS ps_availqty,
             ((p.p_partkey * 13 + ((p.p_partkey + j.j * (nsup.n // 4)) % nsup.n) * 17)
               % 90000) + 1000 AS ps_supplycost_cents
      FROM part p CROSS JOIN nsup CROSS JOIN (SELECT unnest([0,1,2,3]) AS j) j)
"""


def _derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "supplier").count()  # tiny dim; metadata-cheap
    part = t(spark, sf_dir, "part")
    j = F.explode(F.array(*[F.lit(x) for x in range(4)])).alias("j")
    ps = part.select("p_partkey", j)
    suppkey = (F.col("p_partkey") + F.col("j") * (n // 4)) % n
    return ps.select(
        "p_partkey",
        suppkey.alias("ps_suppkey"),
        ((F.col("p_partkey") * 7 + suppkey * 11) % 10000 + 1).alias("ps_availqty"),
        ((F.col("p_partkey") * 13 + suppkey * 17) % 90000 + 1000).alias(
            "ps_supplycost_cents"
        ),
    )


@query(
    "q2_min_cost_supplier",
    sql=f"""
    WITH {_PS_SQL}
    SELECT p_partkey, p_brand, s_name, n_name, s_acctbal,
           CAST(ps_supplycost_cents AS DOUBLE) / 100 AS supplycost
    FROM ps
    JOIN part USING (p_partkey)
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE' AND p_size = 15
    QUALIFY ps_supplycost_cents = MIN(ps_supplycost_cents)
              OVER (PARTITION BY p_partkey)
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape over the derived partsupp: for each EUROPE-
    stocked part of a given size, the supplier(s) offering the minimum
    supply cost. The correlated min-cost subquery is expressed as a
    window min over the region-restricted partsupp (one shuffle on
    p_partkey); fixed dims (nation/region) broadcast, SF-scaling dims
    (part/supplier) join unhinted so AQE size-checks; cost kept in
    integer cents until the output boundary (exact min, single double
    division)."""
    ps = _derived_partsupp(spark, sf_dir)
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    joined = (
        # no hint on part/sup: O(SF) — AQE broadcasts while they fit
        ps.join(part, "p_partkey")
        .join(sup, ps.ps_suppkey == sup.s_suppkey)
        # bcast: O(1) fixed dims — nation=25 rows, region=5 rows
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("_mn", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("_mn"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            "s_acctbal",
            (F.col("ps_supplycost_cents").cast("double") / 100).alias("supplycost"),
        )
    )


@query(
    "q20_excess_stock_suppliers",
    sql=f"""
    WITH {_PS_SQL},
    shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      GROUP BY l_partkey, l_suppkey)
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM ps
    JOIN part p ON p.p_partkey = ps.p_partkey AND p.p_name LIKE 'small%'
    JOIN shipped ON shipped.l_partkey = ps.p_partkey
               AND shipped.l_suppkey = ps.ps_suppkey
    JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE CAST(ps.ps_availqty AS DOUBLE) > 0.5 * CAST(shipped.q AS DOUBLE)
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape over the derived partsupp: suppliers holding
    more than half a year's shipped quantity of any 'small%' part.
    The only fact-sized input is the lineitem agg (pushed date filter,
    partial agg on (part, supp)); partsupp/part/supplier/nation all
    broadcast against it."""
    ps = _derived_partsupp(spark, sf_dir)
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("q"))
    sup = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    return (
        # no hint on ps/part/sup: O(SF) — AQE broadcasts while they fit
        shipped.join(
            ps,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(part, "p_partkey")
        .filter(F.col("ps_availqty").cast("double") > 0.5 * F.col("q").cast("double"))
        .join(sup, F.col("ps_suppkey") == F.col("s_suppkey"))
        # bcast: O(1) fixed dim — nation=25 rows
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )
