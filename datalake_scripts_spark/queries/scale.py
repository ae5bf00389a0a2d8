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
    "versioned_change_feed",
    sql="""
    SELECT n_nationkey, n_name, n_regionkey, _change_type FROM (
      SELECT n_nationkey, n_name, n_regionkey, 'delete' AS _change_type
      FROM nation WHERE n_nationkey % 5 = 0
      UNION ALL
      SELECT n_nationkey + 1000, n_name, n_regionkey, 'insert'
      FROM nation WHERE n_nationkey % 7 = 0) x
    """,
)
def versioned_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed between snapshots (versioned.read_changes),
    driver-verified: commit nation (v1), then one commit that BOTH
    deletes keys %5=0 and appends shifted keys %7=0 (v2, a rewrite);
    the CDF of (1,2] must be exactly those deletes + inserts — the
    row-level exceptAll diff, not file churn. The oracle recomputes
    the expected change rows from the same key arithmetic. Cost shape:
    appends take the file-level fast path (no row comparison); only
    rewrites pay the exceptAll, proportional to the two snapshots."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="cdf_q_")
    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    V.write_versioned(spark, nation, base, mode="append")
    after = nation.filter(F.col("n_nationkey") % 5 != 0).unionByName(
        nation.filter(F.col("n_nationkey") % 7 == 0).withColumn(
            "n_nationkey", F.col("n_nationkey") + 1000
        )
    )
    V.write_versioned(spark, after, base, mode="overwrite")
    return V.read_changes(spark, base, 1, 2).select(
        "n_nationkey", "n_name", "n_regionkey", "_change_type"
    )


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


@query(
    "profile_table_stats",
    sql="""
    WITH w AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ck_nulls,
             COUNT(DISTINCT o_custkey) AS ck_distinct,
             CAST(MIN(o_custkey) AS VARCHAR) AS ck_min,
             CAST(MAX(o_custkey) AS VARCHAR) AS ck_max,
             CAST(SUM(CAST(o_custkey AS DECIMAL(28,2))) AS DOUBLE) AS ck_sum,
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS st_nulls,
             COUNT(DISTINCT o_orderstatus) AS st_distinct,
             MIN(o_orderstatus) AS st_min,
             MAX(o_orderstatus) AS st_max,
             CAST(NULL AS DOUBLE) AS st_sum
      FROM orders)
    SELECT 'o_custkey' AS column, n_rows, ck_nulls AS n_nulls,
           ck_distinct AS n_distinct, ck_min AS min_str, ck_max AS max_str,
           ck_sum AS sum_value
    FROM w
    UNION ALL
    SELECT 'o_orderstatus', n_rows, st_nulls, st_distinct, st_min, st_max, st_sum
    FROM w
    """,
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass per-column profiling (operators.profile.profile) —
    the engine's replacement for the reference's one-count()-job-per-
    transform observability (SURVEY.md §2.4 A2)."""
    from ..operators.profile import profile

    orders = t(spark, sf_dir, "orders")
    return profile(orders, ["o_custkey", "o_orderstatus"])


@query(
    "salted_join_segment_revenue",
    sql="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order revenue per customer segment THROUGH the salted join
    (operators.scale.salted_join): the dim replicates 8x with a salt,
    the fact side salts deterministically, and the oracle states the
    PLAIN join — hash-equality proves salting is a pure shuffle-shape
    rewrite with zero result drift."""
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = SC.salted_join(orders, cust, "c_custkey", salt_buckets=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


@query(
    "skew_report_orders_custkey",
    sql="""
    WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(MAX(n) AS BIGINT) AS max_per_key,
           CAST(MIN(n) AS BIGINT) AS min_per_key,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) * COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             AS skew_factor
    FROM c
    """,
)
def skew_report_orders_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnosis for a prospective shuffle key: per-key
    cardinality extremes and the max/mean skew factor — the
    measurement that decides between a plain shuffle, AQE skew-join,
    and salting (operators.scale.salted_*). Two partial-aggregated
    passes (key counts, then their 1-row summary); the skew factor is
    exact-integer max*n_keys over total with a single double division."""
    orders = t(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("n").alias("max_per_key"),
        F.min("n").alias("min_per_key"),
        F.sum("n").alias("total_rows"),
        (
            (F.max("n") * F.count(F.lit(1))).cast("double")
            / F.sum("n").cast("double")
        ).alias("skew_factor"),
    )


@query(
    "matview_incremental_refresh",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def matview_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained aggregate (operators.matview): orders
    land in three append commits on a versioned source; each refresh
    reads ONLY that commit's files (file-level change feed,
    versioned.read_changes fast path) and merges partials into the
    stored state. The oracle is the plain one-shot GROUP BY — three
    delta-cost refreshes must equal one full recompute. Sum stays
    decimal-exact through every merge, cast double at the edge; avg is
    one double division of exact parts (order-independent)."""
    import tempfile

    from ..operators import matview, versioned

    base = tempfile.mkdtemp(prefix="matview_q_")
    src_dir, view_dir = f"{base}/src", f"{base}/view"
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_totalprice").cast("decimal(18,2)").alias("o_price_dec"),
    )
    spec = {
        "n_orders": ("count", "*"),
        "total_price_dec": ("sum", "o_price_dec"),
        "min_price_dec": ("min", "o_totalprice"),
        "max_price_dec": ("max", "o_totalprice"),
    }
    for i in range(3):
        versioned.write_versioned(
            spark,
            orders.where(F.col("o_orderkey") % 3 == i),
            src_dir,
            mode="append",
        )
        matview.refresh_aggregate(
            spark, src_dir, view_dir, ["o_orderstatus"], spec
        )
    view = matview.read_aggregate(spark, view_dir, spec)
    return view.select(
        "o_orderstatus",
        "n_orders",
        F.col("total_price_dec").cast("double").alias("total_price"),
        F.col("min_price_dec").cast("double").alias("min_price"),
        F.col("max_price_dec").cast("double").alias("max_price"),
        (
            F.col("total_price_dec").cast("double")
            / F.col("n_orders").cast("double")
        ).alias("avg_price"),
    )


_CK_REPR_SPARK = (
    "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),"
    " o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING),"
    " date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss'), o_orderpriority)"
)
_CK_REPR_DUCK = (
    "concat_ws('|', CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),"
    " o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING),"
    " strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'), o_orderpriority)"
)


def _ck_sql() -> str:
    from ..operators.profile import md5_value_sql

    return f"""
    SELECT o_orderstatus, COUNT(*) AS n_rows,
           CAST(SUM(CAST({md5_value_sql(_CK_REPR_DUCK)} AS DECIMAL(38,0)))
                % 1000000000000000000 AS BIGINT) AS checksum
    FROM orders GROUP BY o_orderstatus
    """


@query("reconcile_checksum_orders", sql=_ck_sql())
def reconcile_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group content checksum of the orders table
    (operators.profile.content_checksum): 48-bit md5-derived row values
    summed exactly in DECIMAL(38,0), mod 1e18. The reconciliation probe
    for migrations/replicas — the reference's check_loaded
    (zoom_proc.py:266-312) compares only counts + one sample row; this
    detects ANY content drift, costs one map-side-partial shuffle, and
    needs no sort. The md5->int arithmetic is one SQL string evaluated
    by both engines; only the timestamp rendering differs
    (date_format vs strftime), pinned to UTC wall time."""
    from ..operators.profile import content_checksum

    orders = t(spark, sf_dir, "orders")
    return content_checksum(orders, _CK_REPR_SPARK, group_cols=["o_orderstatus"])


_VALIDATE_SQL = """
WITH agg AS (
  SELECT
    CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS nn,
    CAST(SUM(CASE WHEN o_totalprice IS NOT NULL
                   AND (o_totalprice < 0 OR o_totalprice > 10000000)
             THEN 1 ELSE 0 END) AS BIGINT) AS rng,
    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL
                   AND o_orderstatus NOT IN ('F', 'O', 'P')
             THEN 1 ELSE 0 END) AS BIGINT) AS en,
    CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL
                   AND NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')
             THEN 1 ELSE 0 END) AS BIGINT) AS rx,
    CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq
  FROM orders),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders o
  WHERE o.o_custkey IS NOT NULL AND NOT EXISTS (
    SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
SELECT 'not_null(o_orderkey)' AS rule, nn AS n_violations, nn = 0 AS ok FROM agg
UNION ALL
SELECT 'range(o_totalprice)', rng, rng = 0 FROM agg
UNION ALL
SELECT 'enum(o_orderstatus)', en, en = 0 FROM agg
UNION ALL
SELECT 'regex(o_orderpriority)', rx, rx = 0 FROM agg
UNION ALL
SELECT 'unique(o_orderkey)', uq, uq = 0 FROM agg
UNION ALL
SELECT 'fk(o_custkey->c_custkey)', n, n = 0 FROM fk
"""


@query("validate_orders_constraints", sql=_VALIDATE_SQL)
def validate_orders_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality constraint report over orders
    (operators.quality.validate): not-null, range, enum, regex,
    uniqueness, and referential integrity in one pass — every
    row-expressible rule is a SUM(CASE) inside a SINGLE
    partial-aggregated scan (adding a rule adds an expression, not a
    job), uniqueness rides the same aggregate, and the FK costs one
    left-anti join against the broadcastable key set. Replaces the
    reference's count-per-check validation (check_loaded,
    zoom_proc.py:266-312) with the audit step of write-audit-publish
    (operators.quality.write_audit_publish)."""
    from ..operators import quality as Q

    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return Q.validate(
        orders,
        [
            Q.not_null("o_orderkey"),
            Q.in_range("o_totalprice", 0, 10_000_000),
            Q.is_in("o_orderstatus", ["F", "O", "P"]),
            Q.matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
            Q.unique("o_orderkey"),
            Q.foreign_key("o_custkey", cust, "c_custkey"),
        ],
    )


@query(
    "keys_surrogate_orders",
    sql="""
    SELECT o_orderkey,
           CAST(ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey)
                AS BIGINT) AS surrogate_id
    FROM orders
    """,
)
def keys_surrogate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense sequence ids over a total order — the reference's Postgres
    bigserial (monkey_proc.py:271) re-expressed scalably
    (operators.scale.assign_surrogate_keys): range-repartition on the
    order columns, per-partition parallel rank, partition-count-sized
    offset prefix-sum — NO unpartitioned window (which Spark executes
    as one task holding the whole table; the naive form is the classic
    100 TB deadend this operator exists to avoid)."""
    orders = t(spark, sf_dir, "orders")
    return SC.assign_surrogate_keys(
        orders, ["o_orderdate", "o_orderkey"], partitions=8
    ).select("o_orderkey", "surrogate_id")


@query(
    "provenance_partition_lineage",
    sql="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents GROUP BY source
    """,
)
def provenance_partition_lineage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance from FILE-PATH lineage, not a data column: write
    the corpus hive-partitioned by source, read it back, and attribute
    every row to its source purely via the ``_metadata.file_path``
    hidden column (the modern replacement for input_file_name() —
    per-row, join-safe, usable after shuffles). The data column is
    dropped before attribution, so a pass only if the lineage column
    itself carries the truth. The oracle recomputes the same totals
    from the logical column.

    100 TB shape: _metadata is populated by the scan itself (no join
    against a file manifest, no extra shuffle); the attribution regexp
    is a map-side expression. This is the debugging primitive for
    "which ingest batch produced these bad rows" at scale."""
    import tempfile

    docs = t(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="prov_q_")
    docs.write.mode("overwrite").partitionBy("source").parquet(base)
    back = spark.read.parquet(base).select(
        F.col("n_chars"),
        F.regexp_extract(
            F.col("_metadata.file_path"), r"source=([^/]+)", 1
        ).alias("source"),
    )
    return back.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


_DRIFT_OFFSET = 100_000_000


@query(
    "versioned_stats_drift",
    sql=f"""
    WITH v1 AS (
      SELECT o_orderkey, o_custkey FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
      SELECT o_orderkey, o_custkey FROM v1 WHERE o_orderkey % 10 != 0
      UNION ALL
      SELECT o_orderkey + {_DRIFT_OFFSET}, o_custkey
      FROM v1 WHERE o_orderkey % 14 = 0
    ), s1 AS (
      SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(o_orderkey) AS BIGINT) AS min_val,
             CAST(MAX(o_orderkey) AS BIGINT) AS max_val FROM v1
      UNION ALL
      SELECT 'o_custkey', COUNT(*), MIN(o_custkey), MAX(o_custkey) FROM v1
    ), s2 AS (
      SELECT 'o_orderkey' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(MIN(o_orderkey) AS BIGINT) AS min_val,
             CAST(MAX(o_orderkey) AS BIGINT) AS max_val FROM v2
      UNION ALL
      SELECT 'o_custkey', COUNT(*), MIN(o_custkey), MAX(o_custkey) FROM v2
    )
    SELECT s1.col_name,
           s1.n_rows AS rows_v1, s2.n_rows AS rows_v2,
           s2.n_rows - s1.n_rows AS rows_delta,
           s1.min_val AS min_v1, s2.min_val AS min_v2,
           s1.max_val AS max_v1, s2.max_val AS max_v2,
           CAST(s1.min_val != s2.min_val OR s1.max_val != s2.max_val
                AS BOOLEAN) AS range_drifted
    FROM s1 JOIN s2 USING (col_name)
    """,
)
def versioned_stats_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot statistics drift on a versioned table —
    the data-observability readout ("did this commit shift the key
    range / row count?") that catches bad ingest batches before
    downstream consumers do. Commits v1 (even orderkeys), then v2
    (deletes %10, inserts offset-shifted %14 rows — a range-expanding
    rewrite), time-travels BOTH versions via read_versioned, and diffs
    per-column stats. The oracle recomputes both snapshots from the
    same key arithmetic.

    100 TB shape: each snapshot's stats are one partial-agg pass
    (min/max/count combine map-side); the two passes never join
    row-level — the drift join is on the per-COLUMN stat rows (tiny).
    In production the per-file min/max already in the versioned
    manifest make this metadata-only; reading the data here exercises
    the time-travel path end-to-end."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="drift_q_")
    orders = t(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey"
    )
    v2 = v1.filter(F.col("o_orderkey") % 10 != 0).unionByName(
        v1.filter(F.col("o_orderkey") % 14 == 0).withColumn(
            "o_orderkey", F.col("o_orderkey") + _DRIFT_OFFSET
        )
    )
    V.write_versioned(spark, v1, base, mode="append")
    V.write_versioned(spark, v2, base, mode="overwrite")

    def stats(df: DataFrame, suffix: str) -> DataFrame:
        parts = []
        for col in ("o_orderkey", "o_custkey"):
            parts.append(
                df.agg(
                    F.count("*").cast("bigint").alias(f"rows_{suffix}"),
                    F.min(col).cast("bigint").alias(f"min_{suffix}"),
                    F.max(col).cast("bigint").alias(f"max_{suffix}"),
                ).select(F.lit(col).alias("col_name"), "*")
            )
        return parts[0].unionByName(parts[1])

    s1 = stats(V.read_versioned(spark, base, version=1), "v1")
    s2 = stats(V.read_versioned(spark, base, version=2), "v2")
    return s1.join(s2, "col_name").select(
        "col_name",
        "rows_v1",
        "rows_v2",
        (F.col("rows_v2") - F.col("rows_v1")).cast("bigint").alias("rows_delta"),
        "min_v1",
        "min_v2",
        "max_v1",
        "max_v2",
        (
            (F.col("min_v1") != F.col("min_v2"))
            | (F.col("max_v1") != F.col("max_v2"))
        ).alias("range_drifted"),
    )


_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]

_CHUNKED_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderpriority FROM orders),
even AS (SELECT * FROM base WHERE o_orderkey % 2 = 0),
odd AS (SELECT * FROM base WHERE o_orderkey % 2 = 1),
allrows AS (SELECT * FROM even UNION ALL SELECT * FROM odd),
pres AS (
  SELECT p.o_orderpriority,
         CAST((CASE WHEN EXISTS (SELECT 1 FROM even e
                     WHERE e.o_orderpriority = p.o_orderpriority)
               THEN 1 ELSE 0 END)
            + (CASE WHEN EXISTS (SELECT 1 FROM odd o
                     WHERE o.o_orderpriority = p.o_orderpriority)
               THEN 1 ELSE 0 END) AS BIGINT) AS chunks_loaded
  FROM (SELECT DISTINCT o_orderpriority FROM allrows) p),
tot AS (
  SELECT CAST((SELECT COUNT(DISTINCT o_orderpriority) FROM even)
            + (SELECT COUNT(DISTINCT o_orderpriority) FROM odd)
         AS BIGINT) AS chunks_total)
SELECT a.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(ANY_VALUE(pres.chunks_loaded) AS BIGINT) AS chunks_loaded,
       CAST((SELECT chunks_total FROM tot) AS BIGINT) AS chunks_total
FROM allrows a JOIN pres ON pres.o_orderpriority = a.o_orderpriority
GROUP BY a.o_orderpriority
ORDER BY a.o_orderpriority
"""


@query("versioned_chunked_pruning", sql=_CHUNKED_SQL)
def versioned_chunked_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level (chunked) manifest metadata pruning, end to end: commit
    even-key orders hive-partitioned by priority with
    ``manifest_chunking='partition'`` (one chunk object per partition
    directory, rollup stats per chunk), append the odd keys (prior
    chunk descriptors carried BY REFERENCE — the Iceberg append
    property), then read each priority back via ``skip_filter``. The
    readout per priority: exact row count, how many chunk objects the
    read actually LOADED (rollup pruning skips the rest before any
    metadata I/O), and the table's total chunk count. The oracle
    recomputes all three from the same key arithmetic — chunks_loaded
    equals the number of commits containing that priority.

    100 TB rationale: a flat manifest makes every read parse metadata
    for EVERY file of the table; with chunked manifests a filtered
    read's metadata cost is proportional to the partitions it touches,
    and an append's metadata write cost is O(new files) — the two
    properties that keep million-file tables plannable
    (operators/versioned.py chunked-manifest block; layout-equivalence
    + vacuum GC tests in tests/test_versioned_chunked.py)."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="chunked_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    V.write_versioned(
        spark,
        orders.filter(F.col("o_orderkey") % 2 == 0),
        base,
        mode="append",
        partition_by=["o_orderpriority"],
        manifest_chunking="partition",
    )
    V.write_versioned(
        spark,
        orders.filter(F.col("o_orderkey") % 2 == 1),
        base,
        mode="append",
    )
    total = len(V.manifest_chunks_for_read(base))
    parts = []
    for p in _PRIORITIES:
        flt = [("o_orderpriority", "=", p)]
        loaded = len(V.manifest_chunks_for_read(base, skip_filter=flt))
        if loaded == 0:
            continue  # priority absent at this SF
        parts.append(
            V.read_versioned(spark, base, skip_filter=flt)
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .select(
                F.lit(p).alias("o_orderpriority"),
                "n_rows",
                F.lit(loaded).cast("bigint").alias("chunks_loaded"),
                F.lit(total).cast("bigint").alias("chunks_total"),
            )
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy("o_orderpriority")


_DELTA_INTEROP_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 4000 AND o_orderpriority <> '1-URGENT'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(4 AS BIGINT) AS n_versions
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("delta_interop_roundtrip", sql=_DELTA_INTEROP_SQL)
def delta_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``_delta_log`` format interop, end to end and
    driver-verified (operators/delta_interop.py, VERDICT r6 ask #2):
    build a 4-commit versioned table (append evens, append odds,
    DELETE one priority, OPTIMIZE), export its FULL history as a
    conforming Delta transaction log (protocol/metaData/add/remove
    actions, per-file stats strings, dataChange=false on the
    re-layout commit), then DESTROY the native manifest chain so the
    Delta log is the only metadata left, import it back, and
    aggregate the adopted table. The oracle recomputes the surviving
    rows' per-priority counts and decimal-exact price sums straight
    from ``orders`` — any defect in either direction of the
    translation (lost add, phantom remove, stats mangling, schema
    drift) changes the hash. n_versions asserts the adopted table
    kept ALL pre-adoption history time-travelable.

    100 TB rationale: both directions are metadata-only — data files
    are adopted in place, so handing a huge table to (or taking one
    from) the Delta ecosystem costs O(commits), not O(data)."""
    import os
    import shutil
    import tempfile

    from ..operators import versioned as V
    from ..operators.delta_interop import export_delta_log, import_delta_log

    base = tempfile.mkdtemp(prefix="delta_interop_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 4000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base, mode="append"
    )
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 1), base, mode="append"
    )
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    V.compact_versioned(spark, base, target_files=2)

    export_delta_log(base)
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)
    # measured AFTER adoption: asserts the import rebuilt the FULL
    # 4-commit history, not just the head snapshot
    n_versions = import_delta_log(base)

    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_ICEBERG_ADOPTION_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 4000 AND o_orderpriority <> '1-URGENT'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(3 AS BIGINT) AS n_versions
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("iceberg_metadata_adoption", sql=_ICEBERG_ADOPTION_SQL)
def iceberg_metadata_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 metadata interop, end to end and driver-verified
    (operators/iceberg_interop.py, round 9 — the second-format
    counterpart of delta_checkpoint_adoption): build a 3-commit
    versioned table (append evens, append odds, DELETE one priority —
    a rewrite commit), export the history as Iceberg table metadata
    (JSON metadata files + Avro manifest lists + Avro manifests via
    the from-scratch Avro codec in functions/avro_min.py), destroy the
    native manifest chain, and adopt the metadata tree back: every
    snapshot becomes a versioned manifest referencing the same data
    files. The oracle recomputes the surviving rows straight from
    ``orders``; n_versions pins the adopted history depth. Any defect
    in the Avro encoding, manifest field-ids, snapshot sequencing, or
    status/row-count bookkeeping changes the hash.

    100 TB rationale: both directions are metadata-only (O(commits +
    file entries), zero data bytes moved), and an append snapshot
    reuses every prior manifest by reference — the same incremental
    shape as the chunked-manifest layer it mirrors."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.iceberg_interop import (
        export_iceberg_metadata,
        import_iceberg_metadata,
    )

    base = tempfile.mkdtemp(prefix="iceberg_adopt_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 4000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base,
        mode="append",
    )
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 1), base,
        mode="append",
    )
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    export_iceberg_metadata(base)
    import os as _os
    import shutil as _shutil

    _shutil.rmtree(_os.path.join(base, "_manifests"))
    ptr = _os.path.join(base, "_latest")
    if _os.path.exists(ptr):
        _os.remove(ptr)
    n_versions = import_iceberg_metadata(base)
    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_DELTA_CHECKPOINT_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE (o_orderkey < 4000 AND o_orderpriority <> '1-URGENT')
     OR (o_orderkey >= 4000 AND o_orderkey < 5000)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(3 AS BIGINT) AS n_versions
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("delta_checkpoint_adoption", sql=_DELTA_CHECKPOINT_SQL)
def delta_checkpoint_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta parquet-checkpoint interop, end to end and driver-verified
    (operators/delta_interop.py round 8): build a 5-commit versioned
    table (append evens, append odds, DELETE one priority, append a
    fresh key range, OPTIMIZE), export the history as a Delta log,
    write a classic single-part parquet checkpoint at Delta commit 2,
    DELETE the pre-checkpoint JSON commits (the shape every long-lived
    real Delta table has after log cleanup), destroy the native
    manifest chain, and adopt: the import bootstraps from the
    checkpoint and replays the JSON tail, exactly like a Delta reader.
    The oracle recomputes the surviving rows straight from ``orders``;
    n_versions pins the adopted history depth (checkpoint snapshot +
    2 tail commits). Any defect in checkpoint writing (lost add, stats
    mangling, schema drift through the parquet round-trip) or
    bootstrap replay changes the hash.

    100 TB rationale: checkpoints make mirror adoption O(active files
    + tail commits) instead of O(all commits ever) — the reason Delta
    itself checkpoints every 10 commits."""
    import os
    import shutil
    import tempfile

    from ..operators import versioned as V
    from ..operators.delta_interop import (
        export_delta_log,
        import_delta_log,
        write_delta_checkpoint,
    )

    base = tempfile.mkdtemp(prefix="delta_checkpoint_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    lo = orders.filter(F.col("o_orderkey") < 4000)
    V.write_versioned(
        spark, lo.filter(F.col("o_orderkey") % 2 == 0), base, mode="append"
    )
    V.write_versioned(
        spark, lo.filter(F.col("o_orderkey") % 2 == 1), base, mode="append"
    )
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    V.write_versioned(
        spark,
        orders.filter(
            (F.col("o_orderkey") >= 4000) & (F.col("o_orderkey") < 5000)
        ),
        base,
        mode="append",
    )
    V.compact_versioned(spark, base, target_files=2)

    log_dir = export_delta_log(base)
    write_delta_checkpoint(base, version=2)
    for dv in range(3):  # log cleanup: pre-checkpoint JSONs vacuumed
        os.remove(os.path.join(log_dir, f"{dv:020d}.json"))
    shutil.rmtree(os.path.join(base, "_manifests"))
    ptr = os.path.join(base, "_latest")
    if os.path.exists(ptr):
        os.remove(ptr)
    # checkpoint snapshot -> v1, two JSON tail commits -> v2, v3
    n_versions = import_delta_log(base)

    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_CATALOG_SQL = """
WITH reg AS (
  SELECT 'orders_even' AS table_name,
         o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 2 = 0
  UNION ALL
  SELECT 'orders_odd', o_orderpriority, o_totalprice
  FROM orders WHERE o_orderkey < 3000 AND o_orderkey % 2 = 1
)
SELECT table_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM reg GROUP BY table_name ORDER BY table_name
"""


@query("catalog_named_tables", sql=_CATALOG_SQL)
def catalog_named_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Name catalog end to end, driver-verified (operators/catalog.py,
    VERDICT r6 ask #3): ``save_as_table`` two splits of ``orders``
    under names (auto-registered in the catalog's warehouse, the
    mapping committed through the same CAS log as data commits), then
    enumerate the catalog with ``tables()`` and read EVERY registered
    table back BY NAME (``catalog:<name>`` refs through
    read_versioned), aggregating per table. The oracle recomputes both
    splits straight from ``orders`` — a lost registration, wrong dir
    mapping, or name-resolution defect changes the row set or hash.

    100 TB rationale: the catalog is driver-side metadata (one
    commit-store read per resolve) — no Spark job ever scans it; data
    stays where it was written."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.catalog import Catalog

    cdir = tempfile.mkdtemp(prefix="catalog_q_")
    cat = Catalog(cdir)
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    ).filter(F.col("o_orderkey") < 3000)
    cat.save_as_table(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), "orders_even",
        grants=["analyst"],
    )
    cat.save_as_table(
        spark, orders.filter(F.col("o_orderkey") % 2 == 1), "orders_odd",
    )

    parts = []
    for name in cat.tables():  # enumeration drives the reads
        df = V.read_versioned(spark, cat.table_dir(name))
        parts.append(
            df.agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.countDistinct("o_orderpriority")
                .cast("bigint")
                .alias("n_priorities"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("sum_price"),
            ).select(F.lit(name).alias("table_name"), "*")
        )
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df)
    return out.orderBy("table_name")


_CATALOG_SQL_JOIN = """
WITH ords AS (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey < 5000
), custs AS (
  SELECT c_custkey, c_mktsegment FROM customer
)
SELECT c.c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM ords o JOIN custs c ON o.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY 1
"""


@query("catalog_sql_named_join", sql=_CATALOG_SQL_JOIN)
def catalog_sql_named_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain ``spark.sql`` over catalog NAMES (Catalog.attach_views /
    Catalog.sql, round 8): save two tables under names, then run one
    SQL statement joining them by name — every attached view pins the
    manifest version current at attach time, so a multi-table SQL
    statement reads one consistent snapshot even if a writer lands
    commits mid-query. A commit AFTER attach is proven invisible: the
    query result (and the oracle) reflect only the pinned versions.

    100 TB rationale: attach is driver-side metadata (one manifest
    resolve per view); the SQL itself plans through Catalyst exactly
    as path-addressed reads do — name resolution adds zero Spark
    work."""
    import tempfile

    from ..operators.catalog import Catalog

    cdir = tempfile.mkdtemp(prefix="catalog_sql_q_")
    cat = Catalog(cdir)
    cat.save_as_table(
        spark,
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") < 5000),
        "ords",
    )
    cat.save_as_table(
        spark,
        t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        "custs",
    )
    views = cat.attach_views(spark, prefix="lake_")
    assert sorted(views) == ["lake_custs", "lake_ords"]
    # a write AFTER attach must be invisible to the pinned views
    cat.save_as_table(
        spark,
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .filter(F.col("o_orderkey") >= 5000)
        .limit(100),
        "ords",
    )
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS sum_price
        FROM lake_ords o JOIN lake_custs c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        ORDER BY 1
        """
    )


_COLMAP_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 6000 AND o_orderkey % 3 = 0
), appended AS (
  SELECT o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey < 6000 AND o_orderkey % 3 = 1
), latest AS (
  SELECT o_orderkey, o_totalprice AS price FROM v1
  UNION ALL SELECT o_orderkey, price FROM appended
)
SELECT 'latest' AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(2 AS INTEGER) AS n_cols,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM latest
UNION ALL
SELECT 'v1',
       CAST(COUNT(*) AS BIGINT),
       CAST(3 AS INTEGER),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
FROM v1
ORDER BY snapshot
"""


@query("versioned_column_mapping", sql=_COLMAP_SQL)
def versioned_column_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping end to end, driver-verified (VERDICT r6 ask #7,
    operators/versioned.py column-mapping block): commit a 3-column
    orders slice, RENAME ``o_totalprice`` -> ``price`` (metadata-only
    — zero data files rewritten, asserted here by file-list identity
    across the commit), append MORE rows under the new logical name
    (staged under the rename-stable physical name), then DROP
    ``o_orderpriority`` (again metadata-only). The readout aggregates
    the latest snapshot under the new names AND time-travels to v1,
    which still reads the ORIGINAL logical schema from the very same
    data files. The oracle recomputes both snapshots from the key
    arithmetic — a mapping defect (stale physical resolution, dropped
    column resurrecting, rename breaking old files) changes row set,
    schema, or hash.

    100 TB rationale: rename/drop on a mapped table cost ONE manifest
    write regardless of table size; the reference's only rename path
    is a full re-load (vk_proc.py hst_* rebuilds)."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="colmap_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 6000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 3 == 0), base, mode="append"
    )
    files_before = sorted(V.files_for_read(base))
    V.rename_column(base, "o_totalprice", "price")
    # metadata-only: the rename commit must carry the file list verbatim
    assert sorted(V.files_for_read(base)) == files_before
    V.write_versioned(
        spark,
        orders.filter(F.col("o_orderkey") % 3 == 1).select(
            "o_orderkey",
            F.col("o_totalprice").alias("price"),
            "o_orderpriority",
        ),
        base,
        mode="append",
    )
    V.drop_column(base, "o_orderpriority")

    latest = V.read_versioned(spark, base)
    v1 = V.read_versioned(spark, base, version=1)

    def summarize(df, label, price_col):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col(price_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        ).select(
            F.lit(label).alias("snapshot"),
            "n_rows",
            F.lit(len(df.columns)).cast("int").alias("n_cols"),
            "sum_price",
        )

    return (
        summarize(latest, "latest", "price")
        .unionByName(summarize(v1, "v1", "o_totalprice"))
        .orderBy("snapshot")
    )


_DV_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 8000 AND o_orderkey % 2 = 0
), survivors AS (
  SELECT * FROM v1 WHERE NOT (o_orderpriority = '5-LOW' OR o_orderkey % 10 = 4)
), appended AS (
  SELECT o_orderkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 8000 AND o_orderkey % 2 = 1
), latest AS (
  SELECT * FROM survivors UNION ALL SELECT * FROM appended
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST((SELECT COUNT(*) FROM v1) AS BIGINT) AS rows_v1
FROM latest
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("versioned_deletion_vectors", sql=_DV_SQL)
def versioned_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via deletion vectors, end to end and
    driver-verified (operators/versioned.py DV block): commit an even-
    key orders slice, DV-delete two stacked predicates (one whole
    priority, then an overlapping key-pattern — the second DV must be
    disjoint with the first by construction), append the odd keys (the
    append CARRIES the DVs), and aggregate the latest snapshot. The
    query asserts in-line that neither delete rewrote a single data
    file (file-list identity across both commits) — the property that
    distinguishes this from copy-on-write DELETE. rows_v1 comes from
    time travel to v1, proving deleted rows stay visible pre-delete.
    The oracle recomputes survivors from the same key arithmetic.

    100 TB rationale: deleting 0.1% of rows costs O(deleted rows)
    written instead of O(touched files) rewritten; readers pay one
    AQE-broadcast anti-join until OPTIMIZE materializes the DVs."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="dv_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 8000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base,
        mode="append",
    )
    files_v1 = sorted(V.files_for_read(base))
    V.delete_versioned(
        spark, base, "o_orderpriority = '5-LOW'", deletion_vectors=True
    )
    V.delete_versioned(
        spark,
        base,
        "o_orderpriority = '5-LOW' OR o_orderkey % 10 = 4",
        deletion_vectors=True,
    )
    # merge-on-read: both deletes carried the file list verbatim
    assert sorted(V.files_for_read(base)) == files_v1
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 1), base,
        mode="append",
    )
    rows_v1 = V.snapshot_row_count(base, version=1)  # metadata-only
    latest = V.read_versioned(spark, base)
    return (
        latest.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("rows_v1", F.lit(rows_v1).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_HIDDENPART_SQL = """
WITH day5 AS (
  SELECT event_type, value FROM events
  WHERE CAST(ts AS DATE) = DATE '2024-01-05'
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       CAST(TRUE AS BOOLEAN) AS files_pruned
FROM day5
GROUP BY event_type
ORDER BY event_type
"""


@query("versioned_hidden_partitioning", sql=_HIDDENPART_SQL)
def versioned_hidden_partitioning(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hidden (transform) partitioning end to end, driver-verified
    (operators/versioned.py hidden-partitioning block): commit events
    partitioned by ``days(ts)`` — the derived day lives only in the
    hive layout, never in the schema — then read ONE day back through
    a plain timestamp ``skip_filter``. Planning translates the
    timestamp range onto the hidden day value (file pruning proven
    in-line: the filtered read opens strictly fewer files) and the
    day's aggregate must match the oracle recomputing from a CAST
    date predicate. This kills the Hive anti-pattern of a user-facing
    derived date column the optimizer can't connect to the timestamp
    (the reference's jhub pipeline partitions by a string dt column
    carried in the data for exactly this reason, jhub_proc.py).

    100 TB rationale: time-range scans are THE dominant access path on
    event lakes; transform specs give partition-grain pruning from the
    natural predicate with zero schema pollution, and `bucket(n, key)`
    (tested in tests/test_hidden_partitioning.py with a bit-exact
    driver-side xxhash64 twin) gives point-lookup pruning on high-
    cardinality keys."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="hidden_q_")
    ev = t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    V.write_versioned(
        spark, ev, base, mode="append",
        partition_by=[{"transform": "days", "col": "ts"}],
    )
    flt = [
        ("ts", ">=", "2024-01-05T00:00:00"),
        ("ts", "<=", "2024-01-05T23:59:59.999999"),
    ]
    n_all = len(V.files_for_read(base))
    n_sel = len(V.files_for_read(base, skip_filter=flt))
    day = V.read_versioned(spark, base, skip_filter=flt)
    return (
        day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .withColumn(
            "files_pruned", F.lit(bool(0 < n_sel < n_all))
        )
        .orderBy("event_type")
    )


_EXPECT_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 8000
),
kept AS (
  SELECT * FROM base
  WHERE o_orderkey % 97 <> 0 AND o_custkey IS NOT NULL
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price,
       CAST((SELECT COUNT(*) FROM base WHERE o_orderkey % 97 = 0)
            AS BIGINT) AS n_key_violations,
       CAST((SELECT COUNT(*) FROM base WHERE o_totalprice >= 300000)
            AS BIGINT) AS n_price_warns,
       CAST((SELECT COUNT(*) FROM base) -
            (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_quarantined
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("ingest_expectations_gate", sql=_EXPECT_SQL)
def ingest_expectations_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-time data expectations, driver-verified
    (operators/expectations.py, round 8 — Delta Live Tables'
    expectations on the versioned layer): ingest an orders batch
    through three declarative rules — a drop rule (%97 keys are
    'corrupt'), a NOT NULL drop rule, and a warn-only price rule —
    with a quarantine table capturing the excluded rows plus their
    failed-rule diagnosis, and per-rule counts recorded in the commit
    meta. The result reads the CLEAN table back and carries every
    count in-line; the oracle recomputes all of them from the same
    predicates, so a row leaked past a drop rule, a miscounted warn,
    or a lost quarantine row changes the hash.

    100 TB rationale: the rule evaluation is one projected array
    column (native HOFs) — a map-side pass with zero shuffles; counts
    ride one aggregate whose partials are rule-name-sized."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.expectations import write_versioned_with_expectations

    tdir = tempfile.mkdtemp(prefix="expect_q_")
    qdir = tempfile.mkdtemp(prefix="expect_qq_")
    batch = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 8000)
    _, counts = write_versioned_with_expectations(
        spark, batch, tdir,
        rules={
            "key_not_mod97": "o_orderkey % 97 <> 0",
            "custkey_present": "o_custkey IS NOT NULL",
            "price_below_300k": "o_totalprice < 300000",
        },
        # unlisted rules default to warn (DLT parity) — the gating
        # rules must say drop explicitly
        actions={
            "key_not_mod97": "drop",
            "custkey_present": "drop",
            "price_below_300k": "warn",
        },
        quarantine_dir=qdir,
    )
    try:
        n_quarantined = V.read_versioned(spark, qdir).count()
    except FileNotFoundError:
        n_quarantined = 0
    return (
        V.read_versioned(spark, tdir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn(
            "n_key_violations",
            F.lit(counts["key_not_mod97"]).cast("bigint"),
        )
        .withColumn(
            "n_price_warns",
            F.lit(counts["price_below_300k"]).cast("bigint"),
        )
        .withColumn(
            "n_quarantined", F.lit(n_quarantined).cast("bigint")
        )
        .orderBy("o_orderpriority")
    )


_PURGE_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
  WHERE o_orderkey < 5000
),
victim AS (SELECT MIN(o_custkey) AS vc FROM base),
kept AS (SELECT b.* FROM base b, victim v WHERE b.o_custkey <> v.vc)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM base) -
            (SELECT COUNT(*) FROM kept) AS BIGINT) AS n_purged,
       CAST(1 AS BIGINT) AS verified_absent
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("compliance_purge_customer", sql=_PURGE_SQL)
def compliance_purge_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten PHYSICAL erasure, driver-verified
    (versioned.purge_rows, round 8): pick the smallest custkey, purge
    every one of their orders — copy-on-write DELETE (so the bytes
    leave the live files) + vacuum to depth 1 (so the superseded files
    AND the pre-purge manifests are gone: no time travel back to the
    subject). Deliberately not the DV path — a deletion vector hides
    rows but keeps their bytes, which is retention, not erasure. The
    result carries the purge count and the verified-absent bit
    in-line; the oracle recomputes both from the same key arithmetic.

    100 TB rationale: the DELETE rewrites only stats-candidate files
    (skip-filter pruning as in any delete); the vacuum is driver-side
    metadata + unlinks — a purge sweep over a petabyte lake costs
    O(files containing the subject), not O(lake)."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="purge_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 5000)
    V.write_versioned(spark, orders, base, mode="append")
    victim = orders.agg(F.min("o_custkey").alias("v")).first()["v"]
    res = V.purge_rows(spark, [base], f"o_custkey = {int(victim)}")
    r = res[base]
    return (
        V.read_versioned(spark, base)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .withColumn("n_purged", F.lit(r["n_deleted"]).cast("bigint"))
        .withColumn(
            "verified_absent",
            F.lit(1 if r["verified_absent"] else 0).cast("bigint"),
        )
        .orderBy("o_orderpriority")
    )


_HISTORY_SQL = """
WITH base AS (
  SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey < 4000
),
v1 AS (SELECT COUNT(*) AS n FROM base WHERE o_orderkey % 2 = 0),
v2 AS (SELECT COUNT(*) AS n FROM base),
v3 AS (SELECT COUNT(*) AS n FROM base
       WHERE o_orderpriority <> '1-URGENT'),
v4 AS (SELECT COUNT(*) AS n FROM base
       WHERE o_orderpriority <> '1-URGENT' AND o_orderkey % 11 <> 0)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS version, 'append' AS mode,
         CAST(n AS BIGINT) AS n_rows, CAST(0 AS BIGINT) AS n_dvs FROM v1
  UNION ALL SELECT 2, 'append', CAST(n AS BIGINT), 0 FROM v2
  UNION ALL SELECT 3, 'delete', CAST(n AS BIGINT), 0 FROM v3
  UNION ALL SELECT 4, 'delete', CAST(n AS BIGINT), 1 FROM v4
) ORDER BY version
"""


@query("versioned_history_table", sql=_HISTORY_SQL)
def versioned_history_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY as a queryable DataFrame (versioned.history_df,
    round 8): build a 4-commit history — append evens, append odds,
    copy-on-write DELETE of one priority, merge-on-read (DV) DELETE of
    the %11 keys — and return the history table itself (version, mode,
    DV-aware live row count, DV generation count). The oracle
    recomputes every snapshot's expected live count from the same key
    arithmetic, so a wrong mode label, a DV-blind count, or a lost
    commit changes the hash.

    100 TB rationale: the history is O(versions) driver-side manifest
    metadata — no Spark job reads data; the reference's only
    observability is a count() job per transform (SURVEY §2.4 A2)."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="history_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 4000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base,
        mode="append",
    )
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 1), base,
        mode="append",
    )
    V.delete_versioned(spark, base, "o_orderpriority = '1-URGENT'")
    V.delete_versioned(
        spark, base, "o_orderkey % 11 = 0", deletion_vectors=True
    )
    return (
        V.history_df(spark, base)
        .select("version", "mode", "n_rows", "n_dvs")
        .orderBy("version")
    )


_MERGE_DV_SQL = """
WITH tgt AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 6000 AND o_orderkey % 2 = 0
), src AS (
  SELECT o_orderkey, o_custkey,
         o_totalprice + 1000 AS o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 6000 AND (o_orderkey % 4 = 0 OR o_orderkey % 2 = 1)
), kept AS (
  SELECT t.o_orderkey,
         CASE WHEN s.o_orderkey IS NOT NULL
              THEN s.o_totalprice ELSE t.o_totalprice END AS price,
         t.o_orderpriority
  FROM tgt t LEFT JOIN src s USING (o_orderkey)
  WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderpriority = '5-LOW')
), ins AS (
  SELECT s.o_orderkey, s.o_totalprice AS price, s.o_orderpriority
  FROM src s ANTI JOIN tgt t USING (o_orderkey)
), merged AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(1 AS BIGINT) AS files_carried
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("versioned_merge_dv", sql=_MERGE_DV_SQL, headline=True)
def versioned_merge_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read MERGE, driver-verified (round 8 — completes the
    DELETE/UPDATE/MERGE deletion-vector trio): the exact clause mix of
    ``versioned_merge_into`` (conditional DELETE + UPDATE + INSERT)
    with ``deletion_vectors=True`` — matched rows' positions become a
    new DV, only the updated images and inserts are written, and NOT
    ONE pre-merge data file is rewritten. The oracle is the same
    LEFT JOIN + ANTI JOIN clause algebra, so hash equality proves the
    MOR path lands the identical state as copy-on-write;
    ``files_carried`` in-line-asserts zero rewrite (every original
    file still in the manifest).

    100 TB shape: write volume is O(changed rows) instead of O(touched
    files) — on a wide table where a merge touches 1 row per file,
    that's the difference between rewriting the table and appending a
    few megabytes."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="merge_dv_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 6000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base,
        mode="append",
    )
    files_before = set(V.files_for_read(base))
    src = orders.filter(
        (F.col("o_orderkey") % 4 == 0) | (F.col("o_orderkey") % 2 == 1)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    V.merge_versioned(
        spark, base, src, on=["o_orderkey"],
        when_matched_delete="t.o_orderpriority = '5-LOW'",
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        when_not_matched_insert=True,
        deletion_vectors=True,
    )
    # zero rewrite: every pre-merge file is still in the manifest
    carried = files_before <= set(V.files_for_read(base))
    merged = V.read_versioned(spark, base)
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn(
            "files_carried", F.lit(1 if carried else 0).cast("bigint")
        )
        .orderBy("o_orderpriority")
    )


_MERGE_SQL = """
WITH tgt AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey < 6000 AND o_orderkey % 2 = 0
), src AS (
  SELECT o_orderkey, o_custkey,
         o_totalprice + 1000 AS o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 6000 AND (o_orderkey % 4 = 0 OR o_orderkey % 2 = 1)
), kept AS (
  SELECT t.o_orderkey,
         CASE WHEN s.o_orderkey IS NOT NULL
              THEN s.o_totalprice ELSE t.o_totalprice END AS price,
         t.o_orderpriority
  FROM tgt t LEFT JOIN src s USING (o_orderkey)
  WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderpriority = '5-LOW')
), ins AS (
  SELECT s.o_orderkey, s.o_totalprice AS price, s.o_orderpriority
  FROM src s ANTI JOIN tgt t USING (o_orderkey)
), merged AS (
  SELECT * FROM kept UNION ALL SELECT * FROM ins
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM merged
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("versioned_merge_into", sql=_MERGE_SQL)
def versioned_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO with full Delta clause semantics, driver-verified
    (versioned.merge_versioned): target = even orderkeys, source =
    the %4 subset (matched) plus all odd keys (not matched), with a
    +1000 price. Matched rows in priority 5-LOW DELETE, other matched
    rows UPDATE to the source price, unmatched source rows INSERT —
    one atomic commit, touched files only (the reference's only
    upsert is DROP-then-reload, monkey_proc.py:98-120, a
    reader-visible gap). The oracle restates the clause algebra as a
    LEFT JOIN + ANTI JOIN.

    100 TB shape: file discovery is a key semi-join collected at FILE
    granularity; untouched files carry by reference; the clause
    evaluation is one left join over only the touched files' rows."""
    import tempfile

    from ..operators import versioned as V

    base = tempfile.mkdtemp(prefix="merge_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 6000)
    V.write_versioned(
        spark, orders.filter(F.col("o_orderkey") % 2 == 0), base,
        mode="append",
    )
    src = orders.filter(
        (F.col("o_orderkey") % 4 == 0) | (F.col("o_orderkey") % 2 == 1)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1000)
    V.merge_versioned(
        spark, base, src, on=["o_orderkey"],
        when_matched_delete="t.o_orderpriority = '5-LOW'",
        when_matched_update={"o_totalprice": "s.o_totalprice"},
        when_not_matched_insert=True,
    )
    merged = V.read_versioned(spark, base)
    return (
        merged.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


_ICEBERG_POSDEL_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 3000
    AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(3 AS BIGINT) AS n_versions,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS reader_rows
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("iceberg_position_deletes", sql=_ICEBERG_POSDEL_SQL)
def iceberg_position_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read history through the FULL Iceberg circle (round
    10, VERDICT r9 ask #2): build a table, stack two deletion-vector
    DELETEs on it (the layer's preferred DML path), export the history
    as Iceberg v2 metadata — each DV'd file becomes a file-scoped
    POSITION-DELETE parquet (reserved field-ids 2147483546/2147483545)
    under a content=1 delete manifest — then (a) read the current
    snapshot through the INDEPENDENT Iceberg reader
    (operators/iceberg_reader.py, its own Avro decode) and pin its row
    count as a column, and (b) destroy the native manifest chain and
    adopt the tree back, position deletes materializing as native DVs.
    The aggregate runs on the adopted table; the oracle recomputes
    everything straight from ``orders``. A defect in the delete-file
    encoding, the sequence-number application rule, or the DV
    adoption changes the hash.

    100 TB rationale: export is O(deleted rows + file entries) — no
    data rewrite to shed DVs (the r9 posture forced a full
    compaction); the delete state is carried by reference across
    snapshots until it changes, so a mirror of a 100 TB merge-on-read
    table costs only its churn."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.iceberg_interop import (
        export_iceberg_metadata,
        import_iceberg_metadata,
    )
    from ..operators.iceberg_reader import IcebergTable

    base = tempfile.mkdtemp(prefix="iceberg_posdel_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 3000)
    V.write_versioned(spark, orders, base, mode="append")
    V.delete_versioned(
        spark, base, "o_orderpriority = '1-URGENT'", deletion_vectors=True
    )
    V.delete_versioned(
        spark, base, "o_orderpriority = '2-HIGH'", deletion_vectors=True
    )
    export_iceberg_metadata(base)
    # bounded: o_orderkey < 3000 pins the row count at every SF
    reader_rows = len(IcebergTable(base).to_rows())
    import os as _os
    import shutil as _shutil

    _shutil.rmtree(_os.path.join(base, "_manifests"))
    ptr = _os.path.join(base, "_latest")
    if _os.path.exists(ptr):
        _os.remove(ptr)
    n_versions = import_iceberg_metadata(base)
    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .withColumn("reader_rows", F.lit(reader_rows).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_ICEBERG_BUCKET_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 4000
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(1 AS BIGINT) AS n_versions,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS reader_rows,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept WHERE o_custkey = 7)
         AS pruned_rows
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("iceberg_bucket_transform", sql=_ICEBERG_BUCKET_SQL)
def iceberg_bucket_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-compatible hidden partitioning (round 10, VERDICT r9
    ask #3): write a table bucketed with ``bucket_hash='murmur3'`` —
    Iceberg's spec'd 32-bit Murmur3 over the single-value
    serialization (functions/murmur3.py, Appendix-B vector parity) —
    export it as a TRUE ``bucket[N]`` Iceberg spec, read the snapshot
    back through the independent reader (row count pinned), adopt the
    tree into a fresh manifest chain (the murmur3 spec reconstructs),
    and answer one equality lookup through the planning-time bucket
    prune (pruned_rows). xxhash64 layouts stay refused at export —
    translating them would make foreign readers prune wrong.

    100 TB rationale: bucket pruning turns a point lookup on a
    100 TB table into a read of 1/N of its files via pure
    planning-time arithmetic (no Spark job, no hash scan), and the
    murmur3 option makes that layout portable to every Iceberg
    reader; the hash itself is computed once per row at write time in
    Arrow batches."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.iceberg_interop import (
        export_iceberg_metadata,
        import_iceberg_metadata,
    )
    from ..operators.iceberg_reader import IcebergTable

    base = tempfile.mkdtemp(prefix="iceberg_bucket_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 4000)
    V.write_versioned(
        spark, orders, base, mode="append",
        partition_by=[
            {"transform": "bucket", "col": "o_custkey", "n": 8,
             "hash": "murmur3"},
        ],
    )
    export_iceberg_metadata(base)
    # bounded: o_orderkey < 4000 pins the row count at every SF
    reader_rows = len(IcebergTable(base).to_rows())
    import os as _os
    import shutil as _shutil

    _shutil.rmtree(_os.path.join(base, "_manifests"))
    ptr = _os.path.join(base, "_latest")
    if _os.path.exists(ptr):
        _os.remove(ptr)
    n_versions = import_iceberg_metadata(base)
    pruned_rows = (
        V.read_versioned(spark, base, skip_filter=[("o_custkey", "=", 7)])
        .filter(F.col("o_custkey") == 7)
        .count()
    )
    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("n_versions", F.lit(n_versions).cast("bigint"))
        .withColumn("reader_rows", F.lit(reader_rows).cast("bigint"))
        .withColumn("pruned_rows", F.lit(pruned_rows).cast("bigint"))
        .orderBy("o_orderpriority")
    )


_ICEBERG_NESTED_SQL = """
WITH staged AS (
  SELECT o_orderkey,
         o_orderpriority AS pri,
         o_totalprice AS price,
         o_custkey
  FROM orders
  WHERE o_orderkey < 4000
)
SELECT pri,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       CAST(SUM(CAST(o_custkey AS BIGINT) + 1) AS BIGINT) AS sum_tag
FROM staged
GROUP BY pri
ORDER BY pri
"""


@query("iceberg_nested_adoption", sql=_ICEBERG_NESTED_SQL)
def iceberg_nested_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type Iceberg interop (round 10, VERDICT r9 ask #7 — the
    reference's domain is nested JSON, so a NOT-yet-flattened staging
    table must survive the circle): stage orders as a struct+array
    table (meta struct holding priority/price, tags array derived
    from the custkey), export it — per-member field-ids assigned
    depth-first per the spec — destroy the native manifest chain,
    adopt the metadata tree back, and answer the aggregate THROUGH the
    adopted nested schema (struct field access + array element_at).
    The oracle recomputes from flat ``orders``; a defect in nested
    schema translation (either direction) breaks the read or the
    hash."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.iceberg_interop import (
        export_iceberg_metadata,
        import_iceberg_metadata,
    )

    base = tempfile.mkdtemp(prefix="iceberg_nested_q_")
    staged = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 4000)
        .select(
            "o_orderkey",
            F.struct(
                F.col("o_orderpriority").alias("pri"),
                F.col("o_totalprice").alias("price"),
            ).alias("meta"),
            F.array(
                F.col("o_custkey").cast("bigint"),
                (F.col("o_custkey") + 1).cast("bigint"),
            ).alias("tags"),
        )
    )
    V.write_versioned(spark, staged, base, mode="append")
    export_iceberg_metadata(base)
    import os as _os
    import shutil as _shutil

    _shutil.rmtree(_os.path.join(base, "_manifests"))
    ptr = _os.path.join(base, "_latest")
    if _os.path.exists(ptr):
        _os.remove(ptr)
    import_iceberg_metadata(base)
    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy(F.col("meta.pri").alias("pri"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("meta.price").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
            F.sum(F.element_at(F.col("tags"), 2))
            .cast("bigint")
            .alias("sum_tag"),
        )
        .orderBy("pri")
    )


_ICEBERG_EQDEL_SQL = """
WITH kept AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders
  WHERE o_orderkey < 2500 AND o_orderpriority <> '3-MEDIUM'
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS reader_rows
FROM kept
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("iceberg_equality_deletes", sql=_ICEBERG_EQDEL_SQL)
def iceberg_equality_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign EQUALITY deletes through the import path (round 10):
    the Flink-CDC write shape — delete-by-key files (content=2 with
    equality_ids), which our engine never writes but must read and
    adopt. Stage bounded orders, export, append a spec-conformant
    equality-delete snapshot via the foreign-writer simulator
    (operators/iceberg_foreign.py) deleting every '3-MEDIUM' key,
    then (a) read through the INDEPENDENT reader (row count pinned as
    a column) and (b) destroy the native chain and adopt — equality
    deletes materialize into per-file positions (strictly-older rule,
    null-safe key match) and become native deletion vectors. The
    aggregate runs on the adopted table; the oracle recomputes from
    flat ``orders``. A defect in the key matching, the sequence rule,
    or the DV materialization changes the hash.

    100 TB rationale: adoption pays one key-column scan per (delete
    file x covered data file) ONCE, then every read is DV-masked —
    the same read-amplification trade Iceberg readers make, but paid
    at import instead of per query."""
    import tempfile

    from ..operators import versioned as V
    from ..operators.iceberg_foreign import append_equality_delete_snapshot
    from ..operators.iceberg_interop import (
        export_iceberg_metadata,
        import_iceberg_metadata,
    )
    from ..operators.iceberg_reader import IcebergTable

    base = tempfile.mkdtemp(prefix="iceberg_eqdel_q_")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    ).filter(F.col("o_orderkey") < 2500)
    V.write_versioned(spark, orders, base, mode="append")
    export_iceberg_metadata(base)
    import json as _json
    import os as _os

    ice_schema = _json.load(
        open(_os.path.join(base, "metadata", "v1.metadata.json"))
    )["schemas"][0]
    key_fid = next(
        f["id"] for f in ice_schema["fields"] if f["name"] == "o_orderkey"
    )
    # bounded collect: victims within the o_orderkey < 2500 slice
    victims = sorted(
        r["o_orderkey"]
        for r in V.read_versioned(spark, base)
        .filter(F.col("o_orderpriority") == "3-MEDIUM")
        .select("o_orderkey")
        .collect()
    )
    append_equality_delete_snapshot(
        base, {"o_orderkey": victims}, [key_fid]
    )
    reader_rows = len(IcebergTable(base).to_rows())
    import shutil as _shutil

    _shutil.rmtree(_os.path.join(base, "_manifests"))
    ptr = _os.path.join(base, "_latest")
    if _os.path.exists(ptr):
        _os.remove(ptr)
    import_iceberg_metadata(base)
    adopted = V.read_versioned(spark, base)
    return (
        adopted.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .withColumn("reader_rows", F.lit(reader_rows).cast("bigint"))
        .orderBy("o_orderpriority")
    )
