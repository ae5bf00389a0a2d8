"""Graph-algorithm queries: PageRank over a derived co-fulfillment
graph, exact cross-engine via integer fixed-point (operators/graph.py).

The reference has no graph surface; this extends the engine's iterative
family (connected components, dedup.py) with rank propagation — the
standard quality-prior computation of web-corpus curation pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank_fixed
from .registry import query, t

# DuckDB oracle: the SAME nano-unit BIGINT recurrence, 3 rounds
# unrolled as CTEs. `//` is DuckDB's integer division == Spark's DIV on
# positive BIGINTs; integer sums are order-independent, so both engines
# are bit-identical. CTEs MATERIALIZED: DuckDB inlines plain CTEs per
# reference and the doubly-referenced round chain re-evaluates
# exponentially (oracle timeout at sf1's 21M-edge graph; the
# graph_kcore_census finding).
_PAGERANK_SQL = """
WITH os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
edges AS MATERIALIZED (SELECT DISTINCT a.sk AS src, b.sk AS dst
          FROM os a JOIN os b ON a.ok = b.ok AND a.sk <> b.sk),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)),
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ce AS MATERIALIZED (SELECT e.src, e.dst, o.od FROM edges e JOIN outdeg o ON e.src = o.src),
r0 AS MATERIALIZED (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM nodes),
c1 AS MATERIALIZED (SELECT ce.dst AS node, SUM(r0.r // ce.od) AS s
       FROM ce JOIN r0 ON ce.src = r0.node GROUP BY ce.dst),
r1 AS MATERIALIZED (SELECT n.node, CAST(150000000 + (85 * COALESCE(c1.s, 0)) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c1 ON n.node = c1.node),
c2 AS MATERIALIZED (SELECT ce.dst AS node, SUM(r1.r // ce.od) AS s
       FROM ce JOIN r1 ON ce.src = r1.node GROUP BY ce.dst),
r2 AS MATERIALIZED (SELECT n.node, CAST(150000000 + (85 * COALESCE(c2.s, 0)) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c2 ON n.node = c2.node),
c3 AS MATERIALIZED (SELECT ce.dst AS node, SUM(r2.r // ce.od) AS s
       FROM ce JOIN r2 ON ce.src = r2.node GROUP BY ce.dst),
r3 AS MATERIALIZED (SELECT n.node, CAST(150000000 + (85 * COALESCE(c3.s, 0)) // 100 AS BIGINT) AS r
       FROM nodes n LEFT JOIN c3 ON n.node = c3.node)
SELECT node, r AS rank_nano, CAST(r AS DOUBLE) / 1000000000.0 AS rank
FROM r3
"""


@query("graph_pagerank_suppliers", sql=_PAGERANK_SQL)
def graph_pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 unrolled rounds, damping 0.85) over the supplier
    co-fulfillment graph: src->dst whenever two suppliers ship lines of
    the same order. One shuffle per round on the destination key; edges
    + out-degrees materialized once (operators.graph.pagerank_fixed).
    Exact BIGINT nano-rank arithmetic makes the result independent of
    partitioning and hash-identical to the DuckDB recurrence."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.sk") != F.col("b.sk")))
        .select(F.col("a.sk").alias("src"), F.col("b.sk").alias("dst"))
    )
    return pagerank_fixed(edges, iterations=3)


_TRIANGLE_SQL = """
WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
und AS (SELECT DISTINCT LEAST(a.sk, b.sk) AS a, GREATEST(a.sk, b.sk) AS b
        FROM os a JOIN os b ON a.ok = b.ok AND a.sk <> b.sk),
deg AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
o AS (SELECT CASE WHEN x.degree < y.degree
                    OR (x.degree = y.degree AND und.a < und.b)
                  THEN und.a ELSE und.b END AS u,
             CASE WHEN x.degree < y.degree
                    OR (x.degree = y.degree AND und.a < und.b)
                  THEN und.b ELSE und.a END AS v
      FROM und JOIN deg x ON x.node = und.a JOIN deg y ON y.node = und.b),
tp AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
       FROM o e1 JOIN o e2 ON e1.v = e2.u),
tri AS (SELECT x, y, z FROM tp
        JOIN und ON LEAST(x, z) = und.a AND GREATEST(x, z) = und.b),
pn AS (SELECT node, COUNT(*) AS n_triangles FROM
       (SELECT x AS node FROM tri UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri) GROUP BY node)
SELECT d.node,
       CAST(d.degree AS BIGINT) AS degree,
       CAST(COALESCE(pn.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN d.degree < 2 THEN 0.0
            ELSE (2.0 * CAST(COALESCE(pn.n_triangles, 0) AS DOUBLE))
                 / (CAST(d.degree AS DOUBLE) * CAST(d.degree - 1 AS DOUBLE))
       END AS clustering
FROM deg d LEFT JOIN pn ON pn.node = d.node
"""


@query("graph_triangle_suppliers", sql=_TRIANGLE_SQL)
def graph_triangle_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle count + local clustering coefficient over
    the co-fulfillment graph (operators.graph.triangle_counts):
    degree-ordered "compact-forward" orientation turns the graph into a
    DAG where each triangle appears exactly once and join fan-out is
    bounded by the oriented out-degree (O(sqrt(m)) under degree
    ordering) — the orientation trick that keeps triangle enumeration
    alive on power-law graphs at scale. Two shuffle joins beyond the
    degree computation; clustering = 2T/(d(d-1)), one double division
    of exact integers."""
    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    # a.sk < b.sk (not <>): emits each unordered pair once, halving the
    # self-join output shuffled into triangle_counts' distinct — the
    # operator's LEAST/GREATEST canonicalization is then a no-op, so the
    # undirected edge set (and the result) is identical.
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.sk") < F.col("b.sk")))
        .select(F.col("a.sk").alias("src"), F.col("b.sk").alias("dst"))
    )
    from ..operators.graph import triangle_counts

    return triangle_counts(edges)


# BFS hop census over the bipartite trade graph. Node encoding:
# customer c -> 2c, supplier s -> 2s+1 (disjoint integer spaces, so one
# BIGINT node id serves both engines). Seed = customer with the
# smallest custkey. Hop parity = node type (even hop -> customer side).
_BFS_HOPS = 4

_BFS_SQL = f"""
WITH RECURSIVE pair AS (
  SELECT DISTINCT o.o_custkey AS ck, l.l_suppkey AS sk
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
e AS (SELECT 2 * ck AS src, 2 * sk + 1 AS dst FROM pair
      UNION ALL SELECT 2 * sk + 1, 2 * ck FROM pair),
seed AS (SELECT 2 * MIN(c_custkey) AS node FROM customer),
walk(node, hop) AS (
  SELECT node, 0 FROM seed
  UNION
  SELECT e.dst, w.hop + 1 FROM walk w JOIN e ON e.src = w.node
  WHERE w.hop < {_BFS_HOPS}),
dist AS (SELECT node, MIN(hop) AS hop FROM walk GROUP BY node)
SELECT hop,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_customers,
       CAST(MIN(node) AS BIGINT) AS min_node,
       CAST(SUM(node) AS BIGINT) AS sum_nodes
FROM dist GROUP BY hop ORDER BY hop
"""


@query("graph_bfs_customer_reach", sql=_BFS_SQL)
def graph_bfs_customer_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-hop BFS census from the smallest-key customer over the
    bipartite customer-supplier trade graph (edge = an order the
    customer placed containing a line the supplier shipped): how much
    of the marketplace is reachable in 1..4 hops, by hop.

    The Spark side is the iterative level-synchronous BFS
    (operators/graph.py:bfs_hops — one frontier join + one anti-join
    per round, localCheckpoint'ed); the oracle is the same reach as a
    DuckDB recursive CTE with MIN(hop) per node. Hop values are round
    indices — zero arithmetic — so the census (counts, key sums) is
    hash-exact across engines.

    100 TB shape: each round shuffles only the CURRENT frontier
    against the edge list (both keyed on node id); the visited set
    grows monotonically but is only ever anti-joined, never scanned
    whole-graph per round. Node encoding (2c / 2s+1) keeps the state a
    single BIGINT column."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    pair = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .distinct()
    )
    cust = (2 * F.col("ck")).alias("c")
    supp = (2 * F.col("sk") + 1).alias("s")
    edges = pair.select(cust, supp).selectExpr(
        "c AS src", "s AS dst"
    ).unionByName(pair.select(supp, cust).selectExpr("s AS src", "c AS dst"))
    seed = (
        t(spark, sf_dir, "customer")
        .agg((2 * F.min("c_custkey")).alias("node"))
    )
    from ..operators.graph import bfs_hops

    dist = bfs_hops(edges, seed, max_hops=_BFS_HOPS)
    return (
        dist.groupBy("hop")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_customers"),
            F.min("node").alias("min_node"),
            F.sum("node").cast("bigint").alias("sum_nodes"),
        )
        .orderBy("hop")
    )


# DOULION edge-sampled triangle estimate (Tsourakakis et al., KDD'09):
# keep each UNDIRECTED edge with probability p via a deterministic
# md5-nibble coin on the canonical (a,b) pair — the same coin pattern
# the linkage fixture uses, so both engines keep the identical edge
# set — count triangles on the sparsified graph, scale by 1/p^3.
# Why it exists: the co-fulfillment graph DENSIFIES toward complete as
# SF grows (sf1: 21.3M undirected edges over 10k suppliers — 43% of
# complete — and a MEASURED 7.3e9 oriented-wedge mass, docs/
# BENCH_SF1_NOTES.md), so exact enumeration is a cluster-scale job by
# construction; DOULION is the standard production estimator, cutting
# wedge mass by ~p^2 (256x at p=1/16) while keeping the estimate
# unbiased. Exact-integer sampled count; only the final scale is a
# double. p is a model constant sized to the target regime the same
# way the PQ codebook caps are: at p=1/4 the sf1 sampled graph still
# carries ~450M oriented wedges (measured: the single-node oracle
# blew its 580s timeout); at p=1/16 it is ~28M — tractable on ONE
# node, trivially sharded on a cluster — while sf0.01's 4950-edge
# complete graph still keeps 331 edges / a ~50-triangle sample, so
# the estimator path is genuinely exercised at the correctness gate.
_TRI_P_NIBBLES = 1  # keep-probability = 1/16

_TRIANGLE_SAMPLED_SQL = f"""
WITH os AS (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
und0 AS (SELECT DISTINCT LEAST(a.sk, b.sk) AS a, GREATEST(a.sk, b.sk) AS b
         FROM os a JOIN os b ON a.ok = b.ok AND a.sk <> b.sk),
und AS (SELECT a, b FROM und0
        WHERE instr('0123456789abcdef',
                    substr(md5(CAST(a AS VARCHAR) || '_' ||
                               CAST(b AS VARCHAR)), 1, 1)) - 1
              < {_TRI_P_NIBBLES}),
deg AS (SELECT node, COUNT(*) AS degree FROM
        (SELECT a AS node FROM und UNION ALL SELECT b FROM und)
        GROUP BY node),
o AS (SELECT CASE WHEN x.degree < y.degree
                    OR (x.degree = y.degree AND und.a < und.b)
                  THEN und.a ELSE und.b END AS u,
             CASE WHEN x.degree < y.degree
                    OR (x.degree = y.degree AND und.a < und.b)
                  THEN und.b ELSE und.a END AS v
      FROM und JOIN deg x ON x.node = und.a JOIN deg y ON y.node = und.b),
tp AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
       FROM o e1 JOIN o e2 ON e1.v = e2.u),
tri AS (SELECT x FROM tp
        JOIN und ON LEAST(x, z) = und.a AND GREATEST(x, z) = und.b)
SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_sampled_edges,
       CAST((SELECT COUNT(*) FROM tri) AS BIGINT) AS n_sampled_triangles,
       CAST((SELECT COUNT(*) FROM tri) AS DOUBLE)
         * {16.0 ** 3 / _TRI_P_NIBBLES ** 3} AS est_triangles
"""


@query("graph_triangle_sampled_estimate", sql=_TRIANGLE_SAMPLED_SQL)
def graph_triangle_sampled_estimate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOULION triangle estimate over the supplier co-fulfillment
    graph: deterministic md5-coin edge sampling at p=1/16 (both
    engines keep the identical sparsified edge set, so the sampled
    count — and therefore the estimate — is hash-exact, not just
    statistically close), compact-forward enumeration on the
    sparsified graph, scale by 1/p^3. The production path for dense
    co-occurrence graphs where exact enumeration's wedge mass
    (measured 7.3e9 at sf1) is a cluster-scale job. Both output
    scalars fold out of the ONE triangle_counts pass (sum(degree)/2
    is the sampled edge count) — no second action recomputing the
    co-fulfillment self-join."""
    from ..operators.graph import triangle_counts

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    # a.sk < b.sk: each unordered pair emitted once, already canonical —
    # half the self-join output of the <> + LEAST/GREATEST form, same set.
    und = (
        a.join(b, (F.col("a.ok") == F.col("b.ok"))
               & (F.col("a.sk") < F.col("b.sk")))
        .select(F.col("a.sk").alias("a"), F.col("b.sk").alias("b"))
        .distinct()
        .filter(
            F.expr(
                "instr('0123456789abcdef', substr(md5(CAST(a AS STRING)"
                " || '_' || CAST(b AS STRING)), 1, 1)) - 1"
            ) < F.lit(_TRI_P_NIBBLES)
        )
    )
    per_node = triangle_counts(und.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ))
    scale = 16.0 ** 3 / _TRI_P_NIBBLES ** 3
    agg = per_node.agg(
        F.coalesce(F.sum("degree"), F.lit(0)).alias("deg2"),
        F.coalesce(F.sum("n_triangles"), F.lit(0)).alias("t3"),
    )
    return agg.select(
        (F.col("deg2") / 2).cast("bigint").alias("n_sampled_edges"),
        (F.col("t3") / 3).cast("bigint").alias("n_sampled_triangles"),
        ((F.col("t3") / 3).cast("double") * F.lit(scale))
        .alias("est_triangles"),
    )


# Synchronous k-core peeling census over the bipartite customer-part
# purchase graph (node encoding 2c / 2p+1, the BFS convention). k=25
# sits just under the SF-invariant mean degree (per-customer distinct
# parts and per-part distinct buyers are both ~30 regardless of SF —
# they scale with orders-per-customer, not with table size), so the
# peel genuinely CASCADES: at sf0.01 the node census runs
# 2948 -> 2619 -> 2316 -> 1869 -> 1119 over 5 rounds, exercising the
# restrict-and-recount loop rather than converging instantly.
_KCORE_K = 25
_KCORE_ROUNDS = 5


def _kcore_sql() -> str:
    # Each e{r} is referenced twice (next round + its census row), and
    # DuckDB INLINES plain CTEs per reference — the naive chain
    # re-evaluates round r once per downstream mention, turning 5
    # rounds into ~2^5 peel evaluations (measured 128 s at sf0.001).
    # AS MATERIALIZED pins each round to one evaluation, and the
    # census folds to a single scan per round via COUNT/SUM(DISTINCT).
    parts = [f"""
WITH pair AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS ck, l.l_partkey AS pk
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
e0 AS MATERIALIZED (
  SELECT 2 * ck AS src, 2 * pk + 1 AS dst FROM pair
  UNION ALL SELECT 2 * pk + 1, 2 * ck FROM pair)"""]
    for r in range(1, _KCORE_ROUNDS + 1):
        parts.append(f""",
k{r} AS MATERIALIZED (
  SELECT src AS node FROM e{r - 1}
  GROUP BY src HAVING COUNT(*) >= {_KCORE_K}),
e{r} AS MATERIALIZED (
  SELECT c.src, c.dst FROM e{r - 1} c
  JOIN k{r} a ON c.src = a.node
  JOIN k{r} b ON c.dst = b.node)""")
    census = "\nUNION ALL\n".join(
        f"""SELECT {r} AS round,
  CAST(COUNT(DISTINCT src) AS BIGINT) AS n_nodes,
  CAST(COUNT(*) // 2 AS BIGINT) AS n_edges,
  CAST(COALESCE(SUM(DISTINCT src), 0) AS BIGINT) AS sum_nodes
FROM e{r}"""
        for r in range(1, _KCORE_ROUNDS + 1)
    )
    return parts[0] + "".join(parts[1:]) + "\n" + census + "\nORDER BY round"


@query("graph_kcore_census", sql=_kcore_sql())
def graph_kcore_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling census (k=25, 5 synchronous rounds) over the
    bipartite customer-part purchase graph — the structural quality
    filter of graph-based corpus curation (shallow-core nodes are the
    weakly-connected long tail; deep cores are the dense hubs). Each
    round: one partial-aggregated degree count + two node-key hash
    joins on a monotonically shrinking, checkpointed edge list
    (operators/graph.py:kcore_rounds), with a fixpoint early-exit once
    the edge count stabilizes. All census columns are exact integer
    aggregates — hash-identical to the unrolled SQL oracle."""
    from ..operators.graph import kcore_rounds

    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    pair = (
        o.join(li, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("ck"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    cust = (2 * F.col("ck")).alias("c")
    part = (2 * F.col("pk") + 1).alias("p")
    edges = pair.select(cust, part).selectExpr(
        "c AS src", "p AS dst"
    ).unionByName(pair.select(part, cust).selectExpr("p AS src", "c AS dst"))
    return kcore_rounds(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


# Personalized PageRank: teleport mass restricted to a deterministic
# seed set (every 10th supplier, suppkey % 10 == 1 — non-empty at all
# SFs), so rank decays with link distance from the seeds: the
# TrustRank-style trusted-seed quality prior of corpus curation.
# Oracle: the identical nano-unit BIGINT recurrence, 3 rounds unrolled,
# with the base term gated on seed membership. Every CTE is
# MATERIALIZED — the doubly-referenced round chain re-inlines
# exponentially otherwise (the graph_kcore_census finding; at sf1 the
# plain form blew the 600s oracle watchdog on the 21M-edge graph).
_PPR_SQL = """
WITH os AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk FROM lineitem),
edges AS MATERIALIZED (SELECT DISTINCT a.sk AS src, b.sk AS dst
          FROM os a JOIN os b ON a.ok = b.ok AND a.sk <> b.sk),
seeds AS MATERIALIZED (SELECT s_suppkey AS node FROM supplier WHERE s_suppkey % 10 = 1),
nodes AS MATERIALIZED (SELECT DISTINCT node FROM
          (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges
           UNION ALL SELECT node FROM seeds)),
bn AS MATERIALIZED (SELECT n.node,
              CASE WHEN s.node IS NOT NULL
                   THEN CAST(150000000 AS BIGINT) ELSE 0 END AS base,
              CASE WHEN s.node IS NOT NULL
                   THEN CAST(1000000000 AS BIGINT) ELSE 0 END AS r0
       FROM nodes n LEFT JOIN seeds s ON s.node = n.node),
outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
ce AS MATERIALIZED (SELECT e.src, e.dst, o.od FROM edges e JOIN outdeg o ON e.src = o.src),
c1 AS MATERIALIZED (SELECT ce.dst AS node, SUM(b.r0 // ce.od) AS s
       FROM ce JOIN bn b ON ce.src = b.node GROUP BY ce.dst),
r1 AS MATERIALIZED (SELECT b.node, b.base, CAST(b.base + (85 * COALESCE(c1.s, 0)) // 100
                                   AS BIGINT) AS r
       FROM bn b LEFT JOIN c1 ON b.node = c1.node),
c2 AS MATERIALIZED (SELECT ce.dst AS node, SUM(r1.r // ce.od) AS s
       FROM ce JOIN r1 ON ce.src = r1.node GROUP BY ce.dst),
r2 AS MATERIALIZED (SELECT b.node, b.base, CAST(b.base + (85 * COALESCE(c2.s, 0)) // 100
                                   AS BIGINT) AS r
       FROM r1 b LEFT JOIN c2 ON b.node = c2.node),
c3 AS MATERIALIZED (SELECT ce.dst AS node, SUM(r2.r // ce.od) AS s
       FROM ce JOIN r2 ON ce.src = r2.node GROUP BY ce.dst),
r3 AS MATERIALIZED (SELECT b.node, CAST(b.base + (85 * COALESCE(c3.s, 0)) // 100
                           AS BIGINT) AS r
       FROM r2 b LEFT JOIN c3 ON b.node = c3.node)
SELECT node, r AS rank_nano, CAST(r AS DOUBLE) / 1000000000.0 AS rank
FROM r3
"""


@query("graph_pagerank_personalized", sql=_PPR_SQL)
def graph_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized (seed-anchored) PageRank over the supplier
    co-fulfillment graph, seeds = every 10th supplier: teleport mass
    goes only to seeds, so rank measures link-trust distance from the
    seed set (the TrustRank construction behind trusted-domain corpus
    priors). Same one-shuffle-per-round, exact BIGINT nano-unit shape
    as graph_pagerank_suppliers
    (operators/graph.py:pagerank_personalized); non-seed, unreachable
    nodes remain exactly 0."""
    from ..operators.graph import pagerank_personalized

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).distinct()
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.sk") != F.col("b.sk")))
        .select(F.col("a.sk").alias("src"), F.col("b.sk").alias("dst"))
    )
    seeds = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 10 == 1)
        .select(F.col("s_suppkey").alias("node"))
    )
    return pagerank_personalized(edges, seeds, iterations=3)
