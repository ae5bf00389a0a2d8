"""Mergeable-sketch queries (Apache DataSketches, built into Spark 4).

The 100 TB rationale: exact COUNT(DISTINCT) and exact percentiles need
a shuffle of every distinct value / every row; sketches are bounded-size
state that merges ASSOCIATIVELY, so Spark computes them as map-side
partial aggregates + a tiny final union — one pass, no wide shuffle of
raw values. This is the only viable shape for corpus-wide cardinality /
quantile profiling at scale, and the sketch binaries themselves can be
persisted and re-merged incrementally (per-day sketches -> monthly
rollup without touching raw data).

Oracle strategy: DataSketches HLL and theta are EXACT while in their
sparse/exact regimes (HLL: coupon list below ~2^lgK entries; theta:
below k=4096 retained hashes). The sf0.01 group cardinalities sit far
inside those regimes, so the rounded estimates hash-match an exact
COUNT(DISTINCT) oracle — at production scale the same plans degrade
gracefully to ±1-2% estimates, which is the point of using them. KLL
quantile compaction is randomized, so that query is registered
rows-only (driver contract: weaker check, noted) with a tolerance test
in tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as X
from .registry import query, t


@query(
    "sketch_hll_token_cardinality",
    sql=f"""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS token
      FROM documents
    )
    SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS distinct_tokens
    FROM tok GROUP BY source
    """,
)
def sketch_hll_token_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary cardinality via HLL sketches: map-side
    partial sketches, associative merge in the final agg — no shuffle of
    the tokens themselves. Estimate is exact in the sparse regime (see
    module docstring), hence the exact-distinct oracle."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(X.tokens("text")).alias("token"))
    return tok.groupBy("source").agg(
        F.round(F.hll_sketch_estimate(F.hll_sketch_agg("token")))
        .cast("bigint")
        .alias("distinct_tokens")
    )


@query(
    "sketch_hll_union_rollup",
    sql=f"""
    WITH tok AS (
      SELECT source, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS token
      FROM documents
    )
    SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT token) AS BIGINT) AS global_distinct_tokens
    FROM tok
    """,
)
def sketch_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-rollup shape: build one HLL sketch PER SOURCE
    (stage 1 — in production these are persisted per-shard binaries),
    then hll_union_agg them into the corpus-wide cardinality (stage 2)
    WITHOUT revisiting the raw tokens. The union is lossless over
    sketches, so the two-stage estimate equals the one-shot one."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(X.tokens("text")).alias("token"))
    per_source = tok.groupBy("source").agg(
        F.hll_sketch_agg("token").alias("sketch")
    )
    return per_source.agg(
        F.count("*").cast("bigint").alias("n_sources"),
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sketch")))
        .cast("bigint")
        .alias("global_distinct_tokens"),
    )


@query(
    "sketch_theta_customer_reach",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS distinct_customers
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_theta_customer_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per order status via theta sketches —
    set-expression-capable at scale, unlike HLL (intersection /
    difference for audience-overlap questions). Theta is exact below
    its retained-hash budget: the default lgNomEntries=12 (k=4096)
    was exact at sf0.01 but ~1.3% off at sf0.1's ~14k distinct (the
    r9 sf0.1 sweep caught it); lgNomEntries=20 keeps the sketch exact
    through ~10^6 distinct per group against the exact-count oracle
    (at true corpus cardinality it estimates — the contract)."""
    orders = t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(
            F.theta_sketch_estimate(F.theta_sketch_agg("o_custkey", 20))
        )
        .cast("bigint")
        .alias("distinct_customers")
    )


@query(
    "sketch_kll_price_quantiles",
    sql="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           1 AS p50_ok, 1 AS p90_ok, 1 AS p99_ok
    FROM orders GROUP BY o_orderstatus
    """,
)
def sketch_kll_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-mergeable quantiles: KLL sketch of o_totalprice per
    order status, queried at p50/p90/p99; the scale story is the same
    as HLL: bounded state, map-side partials, associative merge, vs an
    exact percentile's full sort per group.

    KLL compaction is RANDOMIZED (unseeded), so raw sketch values can't
    be hash-compared — the oracle-checkable contract is exact per-group
    counts plus rank-window flags: each sketch quantile must land
    between the EXACT quantiles at p±0.05, which KLL's rank-error
    guarantee (~1.65%% at default k, 99%% confidence) satisfies with
    ~1-1e-6 probability per cell — a stable gate, not a flaky one.
    (Tighter tolerance behavior is covered by tests/test_sketches.py.)"""
    orders = t(spark, sf_dir, "orders")
    tp = F.col("o_totalprice").cast("double")
    sk = F.kll_sketch_agg_double(tp)
    # exact rank-window bounds: lo/hi = exact quantiles at p -/+ 0.05
    bounds = F.percentile(tp, [0.45, 0.55, 0.85, 0.95, 0.94, 1.0])
    agg = orders.groupBy("o_orderstatus").agg(
        sk.alias("sketch"),
        F.count(F.lit(1)).alias("n"),
        bounds.alias("b"),
    )

    def ok(p: float, lo_i: int, hi_i: int):
        q = F.kll_sketch_get_quantile_double("sketch", F.lit(p))
        return (
            (q >= F.col("b").getItem(lo_i)) & (q <= F.col("b").getItem(hi_i))
        ).cast("int")

    return agg.select(
        "o_orderstatus",
        F.col("n").cast("bigint").alias("n"),
        ok(0.5, 0, 1).alias("p50_ok"),
        ok(0.9, 2, 3).alias("p90_ok"),
        ok(0.99, 4, 5).alias("p99_ok"),
    )


# ---------------------------------------------------------------------------
# Count-Min Sketch heavy-hitter probe (hand-built, cross-engine exact)
# ---------------------------------------------------------------------------

_CMS_W = 1024
_CMS_SEEDS = (0, 1)
_CMS_TOPK = 10


def _cms_bucket_expr(seed: int, col: str = "token") -> str:
    """Bucket hash as ONE SQL expression string evaluated verbatim by
    BOTH engines (md5 -> first 8 hex nibbles -> base-16 fold -> % w):
    instr/substr/md5/||/% behave identically in Spark SQL and DuckDB,
    so the sketch contents are bit-equal by construction. Each term is
    cast to BIGINT before the 16^i scale — nibble 15 * 16^7 overflows
    int32."""
    terms = " + ".join(
        f"(CAST(instr('0123456789abcdef', "
        f"substr(md5('{seed}:' || {col}), {i + 1}, 1)) - 1 AS BIGINT))"
        f" * {16 ** i}"
        for i in range(8)
    )
    return f"(({terms}) % {_CMS_W})"


def _cms_sql() -> str:
    toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
    cms_parts = " UNION ALL ".join(
        f"SELECT {s} AS seed, {_cms_bucket_expr(s)} AS bucket, COUNT(*) AS c "
        f"FROM tok GROUP BY 2"
        for s in _CMS_SEEDS
    )
    probe_parts = " UNION ALL ".join(
        f"SELECT token, n, {s} AS seed, {_cms_bucket_expr(s)} AS bucket FROM top"
        for s in _CMS_SEEDS
    )
    return f"""
    WITH tok AS (SELECT unnest({toks}) AS token FROM documents),
    cnt AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
    top AS (SELECT token, n FROM cnt ORDER BY n DESC, token LIMIT {_CMS_TOPK}),
    cms AS ({cms_parts}),
    probe AS ({probe_parts})
    SELECT p.token,
           CAST(p.n AS BIGINT) AS exact_n,
           CAST(MIN(c.c) AS BIGINT) AS cms_estimate,
           CAST(CASE WHEN MIN(c.c) >= p.n THEN 1 ELSE 0 END AS INT)
             AS overestimate_ok
    FROM probe p JOIN cms c ON c.seed = p.seed AND c.bucket = p.bucket
    GROUP BY p.token, p.n
    """


@query("sketch_cms_heavy_hitters", sql=_cms_sql())
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch built from scratch in relational ops (Spark has
    no CMS builtin): d=2 hash rows x w=1024 counters = two
    partial-aggregated groupBys over the token stream — fixed-size
    mergeable state, the frequency twin of the HLL cardinality rollup.
    Probed with the top-k exact tokens: estimate = min over rows of the
    token's counter, always >= the true count (CMS one-sided error),
    asserted per row.

    The bucket hash is a single SQL string (_cms_bucket_expr) passed to
    F.expr AND inlined in the oracle, so both engines compute the
    identical sketch — the strongest form of the md5-twin pattern."""
    docs = t(spark, sf_dir, "documents")
    tok = docs.select(F.explode(X.tokens("text")).alias("token"))
    cnt = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = cnt.orderBy(F.desc("n"), "token").limit(_CMS_TOPK)
    cms = None
    for s in _CMS_SEEDS:
        part = tok.groupBy(
            F.expr(_cms_bucket_expr(s)).alias("bucket")
        ).agg(F.count(F.lit(1)).alias("c")).select(
            F.lit(s).alias("seed"), "bucket", "c"
        )
        cms = part if cms is None else cms.unionByName(part)
    probe = None
    for s in _CMS_SEEDS:
        part = top.select(
            "token",
            "n",
            F.lit(s).alias("seed"),
            F.expr(_cms_bucket_expr(s)).alias("bucket"),
        )
        probe = part if probe is None else probe.unionByName(part)
    return (
        # bcast: O(1) — CMS sketch is fixed-size by construction
        # (seeds x buckets, independent of data volume)
        probe.join(F.broadcast(cms), ["seed", "bucket"])
        .groupBy("token", "n")
        .agg(F.min("c").alias("est"))
        .select(
            "token",
            F.col("n").cast("bigint").alias("exact_n"),
            F.col("est").cast("bigint").alias("cms_estimate"),
            (F.col("est") >= F.col("n")).cast("int").alias("overestimate_ok"),
        )
    )


# ---------------------------------------------------------------------------
# CMS inner product: sketch-based join-size estimation (the planner stat)
# ---------------------------------------------------------------------------

_JS_KEY_A = "CAST(o_custkey AS STRING)"
_JS_KEY_B = "CAST(c_custkey AS STRING)"


def _cms_join_size_sql() -> str:
    a_parts = " UNION ALL ".join(
        f"SELECT {s} AS seed, {_cms_bucket_expr(s, _JS_KEY_A)} AS bucket,"
        f" COUNT(*) AS c FROM orders GROUP BY 2"
        for s in _CMS_SEEDS
    )
    b_parts = " UNION ALL ".join(
        f"SELECT {s} AS seed, {_cms_bucket_expr(s, _JS_KEY_B)} AS bucket,"
        f" COUNT(*) AS c FROM cust GROUP BY 2"
        for s in _CMS_SEEDS
    )
    return f"""
    WITH cust AS (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
    cms_a AS ({a_parts}),
    cms_b AS ({b_parts}),
    est AS (
      SELECT MIN(dot) AS cms_estimate FROM (
        SELECT a.seed, SUM(a.c * b.c) AS dot
        FROM cms_a a JOIN cms_b b ON a.seed = b.seed AND a.bucket = b.bucket
        GROUP BY a.seed)),
    exact AS (
      SELECT COUNT(*) AS exact_join_size
      FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey)
    SELECT CAST(exact_join_size AS BIGINT) AS exact_join_size,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           CAST(cms_estimate >= exact_join_size AS BOOLEAN) AS overestimate_ok,
           CAST(cms_estimate AS DOUBLE) / CAST(exact_join_size AS DOUBLE)
             AS blowup_factor
    FROM est CROSS JOIN exact
    """


@query("sketch_cms_join_size", sql=_cms_join_size_sql())
def sketch_cms_join_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation WITHOUT running the join: the CMS inner
    product. Sketch each side's join key into a d x w Count-Min table
    (one partial-aggregated groupBy per side — fixed 2x1024 counters of
    state however large the inputs), then estimate
    |A join B| <= min over rows d of sum_w a_d[w] * b_d[w] — the
    classic AMS/CMS inner-product bound, one-sided like all CMS
    estimates. This is the planner statistic for choosing
    broadcast-vs-shuffle or pre-salting BEFORE paying for the join; at
    scale the sketches are mergeable across partitions/files and can be
    persisted in table manifests.

    The probe side here is the BUILDING market segment of customers vs
    all orders; the exact join count rides along (this is a
    verification query) with the one-sided flag and the blow-up ratio
    (estimate/exact, one double division of exact ints). Bucket hash =
    the shared _cms_bucket_expr SQL string -> bit-equal sketches, so
    the estimate is hash-exact cross-engine. The final 1-row x 1-row
    cross join is the lazy scalar-attach idiom (lint-allowlisted)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    cms_a = None
    for s in _CMS_SEEDS:
        part = (
            orders.groupBy(
                F.expr(_cms_bucket_expr(s, _JS_KEY_A)).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(s).alias("seed"), "bucket", "c")
        )
        cms_a = part if cms_a is None else cms_a.unionByName(part)
    cms_b = None
    for s in _CMS_SEEDS:
        part = (
            cust.groupBy(
                F.expr(_cms_bucket_expr(s, _JS_KEY_B)).alias("bucket")
            )
            .agg(F.count(F.lit(1)).alias("c"))
            .select(F.lit(s).alias("seed"), "bucket", "c")
        )
        cms_b = part if cms_b is None else cms_b.unionByName(part)
    # disambiguate the two count columns before the join
    cms_a = cms_a.withColumnRenamed("c", "cms_a_c")
    cms_b = cms_b.withColumnRenamed("c", "cms_b_c")
    est = (
        # bcast: O(1) — CMS sketch is fixed-size by construction
        cms_a.join(F.broadcast(cms_b), ["seed", "bucket"])
        .groupBy("seed")
        .agg(F.sum(F.col("cms_a_c") * F.col("cms_b_c")).alias("dot"))
        .agg(F.min("dot").alias("cms_estimate"))
    )
    exact = orders.join(cust, orders.o_custkey == cust.c_custkey).agg(
        F.count(F.lit(1)).alias("exact_join_size")
    )
    # bcast: O(1) — single-row exact-count scalar attach
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("exact_join_size").cast("bigint"),
        F.col("cms_estimate").cast("bigint"),
        (F.col("cms_estimate") >= F.col("exact_join_size")).alias(
            "overestimate_ok"
        ),
        (
            F.col("cms_estimate").cast("double")
            / F.col("exact_join_size").cast("double")
        ).alias("blowup_factor"),
    )


_HH_K = 200  # heavy hitter = frequency strictly above N/200 (0.5%)

_HH_SQL = f"""
WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                x -> x <> '')) AS item
  FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tok)
SELECT item, CAST(COUNT(*) AS BIGINT) AS freq,
       CAST(COUNT(*) AS DOUBLE) / CAST((SELECT n FROM tot) AS DOUBLE)
         AS share
FROM tok
GROUP BY item
HAVING COUNT(*) * {_HH_K} > (SELECT n FROM tot)
ORDER BY freq DESC, item
"""


@query("sketch_mg_heavy_hitters_exact", sql=_HH_SQL)
def sketch_mg_heavy_hitters_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT heavy hitters (token frequency > N/200) without the full
    key-space shuffle: per-partition Misra-Gries summaries (capacity k,
    mergeable-summaries prune rule) nominate a guaranteed-superset
    candidate set of <= k x partitions items, and an exact second pass
    counts only the candidates (operators/heavyhitters.py — the
    Misra-Gries guarantee, merge rule, and determinism argument live
    there).

    This complements sketch_cms_heavy_hitters: CMS gives approximate
    counts for pre-known probes; this returns the exact answer set with
    exact counts, while shuffling only candidates. The candidate SET
    varies with partitioning, the RESULT never does — which is why a
    brute-force DuckDB groupBy is a valid hash-exact oracle.

    100 TB shape: pass 1 is map-only (Arrow-vectorized value_counts
    into a capped dict; output k rows per partition); pass 2 shuffles
    only rows matching the broadcast candidate list. Nothing scales
    with the distinct-item count except the bounded summaries."""
    docs = t(spark, sf_dir, "documents")
    # spread the doc rows so the Misra-Gries pass parallelizes
    # (O(docs) shuffle, not O(tokens)) — sized from the source bytes,
    # clamped to the session setting (bytes_partitions): the old
    # defaultParallelism count fanned a megabyte fixture across 32
    # near-empty Python tasks, making the query run FASTER on 8 cores
    # than 32 (r13 baseline ratio 0.70; VERDICT r12 ask #4). The MG
    # candidate SET varies with partitioning, the RESULT never does.
    import os as _os

    from ..operators.scale import bytes_partitions

    n = bytes_partitions(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    if n > 1:
        docs = docs.repartition(n)
    items = docs.select(F.explode(X.tokens("text")).alias("item"))
    from ..operators.heavyhitters import heavy_hitters_exact

    return heavy_hitters_exact(items, "item", _HH_K)
