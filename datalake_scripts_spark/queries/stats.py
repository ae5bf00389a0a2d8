"""Distribution-comparison statistics over the events table: exact
rank/ECDF-based two-sample tests, the quality-drift detectors of a
curation pipeline (did this source's value distribution shift vs that
one? is split A distributed like split B?).

The reference has no statistics surface; these extend the exact-moment
family (agg_regression_trend, agg_correlation_per_nation) with
nonparametric tests. The determinism contract is the same everywhere:
the statistic's core is EXACT integer arithmetic (scaled ECDF gaps,
doubled rank sums, tie-group cubes), and doubles appear only in final
identical expression trees — so every value is partition-independent
and hash-equal to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .registry import query, t

# Two-sided two-sample Kolmogorov-Smirnov over every ordered pair of
# event types. With ties, the ECDFs are compared AFTER each distinct
# value absorbs all its ties (the standard discrete-data convention):
# per distinct v, cumA = #{a <= v}, cumB = #{b <= v};
# D = max |cumA/n - cumB/m| = max |cumA*m - cumB*n| / (n*m) — the
# numerator is exact BIGINT, so D is one exact-integer ratio cast once.
_KS_SQL = """
WITH counts AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
totals AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS nt FROM counts GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.nt AS n, b.nt AS m
  FROM totals a JOIN totals b ON a.event_type < b.event_type),
grid AS (
  SELECT DISTINCT p.ta, p.tb, c.v
  FROM pairs p JOIN counts c ON c.event_type IN (p.ta, p.tb)),
joined AS (
  SELECT g.ta, g.tb, g.v,
         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
  FROM grid g
  LEFT JOIN counts ca ON ca.event_type = g.ta AND ca.v = g.v
  LEFT JOIN counts cb ON cb.event_type = g.tb AND cb.v = g.v),
cum AS (
  SELECT ta, tb, v,
         SUM(ca) OVER (PARTITION BY ta, tb ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cuma,
         SUM(cb) OVER (PARTITION BY ta, tb ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS cumb
  FROM joined),
d AS (
  SELECT c.ta, c.tb, p.n, p.m,
         MAX(ABS(c.cuma * p.m - c.cumb * p.n)) AS d_scaled
  FROM cum c JOIN pairs p ON p.ta = c.ta AND p.tb = c.tb
  GROUP BY c.ta, c.tb, p.n, p.m)
SELECT ta AS type_a, tb AS type_b, n, m,
       CAST(d_scaled AS BIGINT) AS d_scaled,
       CAST(d_scaled AS DOUBLE)
         / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)) AS ks_d,
       (CAST(d_scaled AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(m AS DOUBLE)))
         * SQRT(CAST(n AS DOUBLE) * CAST(m AS DOUBLE)
                / (CAST(n AS DOUBLE) + CAST(m AS DOUBLE))) AS ks_stat
FROM d ORDER BY ta, tb
"""


@query("stats_ks_two_sample", sql=_KS_SQL)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS distance between the value distributions of every
    ordered event-type pair (10 rows): per-pair merged distinct-value
    grid, cumulative tie-absorbed ECDF counts, and the exact scaled
    sup-gap max|cumA*m - cumB*n| as BIGINT; ks_d and the
    sqrt(nm/(n+m))-normalized statistic are single identical double
    expressions (no exp-based p-value on purpose: libm exp is not
    correctly rounded, so it cannot be in the hash contract).

    Scale shape: one partial-agg groupBy(type, value) — the only pass
    over the raw events — then everything downstream is on the
    distinct-value profile (types x values, data-size-independent-ish);
    pair fan-out joins are on that profile, cumsums share one
    (pair)-key window exchange, and the final max is a partial agg.
    At 100 TB the profile is the only state that grows, and only with
    value cardinality, not row count."""
    ev = t(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            "event_type", F.col("value").cast("decimal(12,2)").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # materialize the profile: every downstream branch (totals,
        # grid, both probe sides) reads this, not a fresh raw-events
        # scan — the executed plan otherwise re-scanned the fact table
        # once per consumer (observed: 14 scans), which at 100 TB IS
        # the query cost
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("nt")
    )
    a, b = totals.alias("a"), totals.alias("b")
    pairs = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.nt").alias("n"),
        F.col("b.nt").alias("m"),
    )
    # grid: each pair's merged distinct values. counts is dim-profile
    # sized (types x distinct values), so the pair fan-out is bounded
    # by |pairs| x |profile|, never by raw rows.
    grid = (
        pairs.join(
            counts.alias("c"),
            (F.col("c.event_type") == F.col("ta"))
            | (F.col("c.event_type") == F.col("tb")),
        )
        .select("ta", "tb", "v")
        .distinct()
    )
    ca = counts.select(
        F.col("event_type").alias("eta"), F.col("v").alias("va"),
        F.col("c").alias("ca"),
    )
    cb = counts.select(
        F.col("event_type").alias("etb"), F.col("v").alias("vb"),
        F.col("c").alias("cb"),
    )
    joined = (
        grid.join(
            ca, (F.col("eta") == F.col("ta")) & (F.col("va") == F.col("v")),
            "left",
        )
        .join(
            cb, (F.col("etb") == F.col("tb")) & (F.col("vb") == F.col("v")),
            "left",
        )
        .select(
            "ta", "tb", "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    wcum = (
        W.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = joined.select(
        "ta", "tb",
        F.sum("ca").over(wcum).alias("cuma"),
        F.sum("cb").over(wcum).alias("cumb"),
    )
    d = (
        cum.join(pairs, ["ta", "tb"])
        .groupBy("ta", "tb", "n", "m")
        .agg(
            F.max(
                F.abs(F.col("cuma") * F.col("m") - F.col("cumb") * F.col("n"))
            ).cast("bigint").alias("d_scaled")
        )
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    ks_d = F.col("d_scaled").cast("double") / (nd * md)
    return d.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n",
        "m",
        "d_scaled",
        ks_d.alias("ks_d"),
        (ks_d * F.sqrt(nd * md / (nd + md))).alias("ks_stat"),
    ).orderBy("type_a", "type_b")


# Mann-Whitney U (Wilcoxon rank-sum) per event-type pair, with the
# tie-corrected normal approximation. Everything folds over the SAME
# per-pair distinct-value profile as the KS test — tie-group rank
# algebra instead of row-level ranks: a tie group of size c sitting
# above C=cum-c smaller values has rank_asc = C+1 and
# rank_desc = N-cum+1 for every member, so the A-side rank sums are
# profile-local products (ca*(C+1), ca*(N-cum+1)), and
# 2*R_A = sum_asc - sum_desc + n*(N+1) is exact BIGINT (the
# rank_asc-rank_desc doubling trick of agg_correlation_per_nation).
# The tie term T = sum(c^3 - c) can reach N^3 (~8e18 at sf1 if fully
# tied), so it accumulates in DECIMAL(38,0) and crosses to double via
# the exact-split big_double recipe.
from ..functions.casts import big_double, big_double_duck_sql  # noqa: E402

_MWU_SQL = """
WITH counts AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
totals AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS nt FROM counts GROUP BY 1),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb, a.nt AS n, b.nt AS m
  FROM totals a JOIN totals b ON a.event_type < b.event_type),
grid AS (
  SELECT DISTINCT p.ta, p.tb, c.v
  FROM pairs p JOIN counts c ON c.event_type IN (p.ta, p.tb)),
joined AS (
  SELECT g.ta, g.tb, g.v,
         COALESCE(ca.c, 0) AS ca, COALESCE(cb.c, 0) AS cb
  FROM grid g
  LEFT JOIN counts ca ON ca.event_type = g.ta AND ca.v = g.v
  LEFT JOIN counts cb ON cb.event_type = g.tb AND cb.v = g.v),
cum AS (
  SELECT ta, tb, v, ca, cb, ca + cb AS c,
         SUM(ca + cb) OVER (PARTITION BY ta, tb ORDER BY v
                            ROWS UNBOUNDED PRECEDING) AS cumn
  FROM joined),
s AS (
  SELECT c.ta, c.tb, p.n, p.m, p.n + p.m AS nn,
         CAST(SUM(c.ca * (c.cumn - c.c + 1)) AS BIGINT) AS sasc,
         CAST(SUM(c.ca * (p.n + p.m - c.cumn + 1)) AS BIGINT) AS sdesc,
         CAST(SUM(CAST(c.c AS DECIMAL(38,0)) * c.c * c.c - c.c)
              AS DECIMAL(38,0)) AS tie_t
  FROM cum c JOIN pairs p ON p.ta = c.ta AND p.tb = c.tb
  GROUP BY c.ta, c.tb, p.n, p.m),
u AS (
  SELECT ta, tb, n, m, nn, tie_t,
         sasc - sdesc + n * (nn + 1) - n * (n + 1) AS u2
  FROM s)
SELECT ta AS type_a, tb AS type_b, n, m,
       CAST(u2 AS BIGINT) AS u2_a,
       CAST(u2 AS DOUBLE) / 2.0 AS u_a,
       {bd_tie} AS tie_term,
       (CAST(u2 AS DOUBLE) / 2.0
        - CAST(n AS DOUBLE) * CAST(m AS DOUBLE) / 2.0)
       / SQRT(
           CAST(n AS DOUBLE) * CAST(m AS DOUBLE) / 12.0
           * (CAST(nn AS DOUBLE) + 1.0
              - ({bd_tie})
                / (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1.0)))
         ) AS z
FROM u ORDER BY ta, tb
""".format(bd_tie=big_double_duck_sql("tie_t"))


@query("stats_mannwhitney_u", sql=_MWU_SQL)
def stats_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U between the value distributions of every ordered
    event-type pair (10 rows): exact doubled statistic
    2U_A = sum_asc - sum_desc + n(N+1) - n(n+1) from tie-group rank
    algebra on the per-pair distinct-value profile (no row-level rank
    explosion), DECIMAL(38,0) tie term, and the tie-corrected z as one
    identical double expression (sqrt only — correctly rounded IEEE;
    no erf/exp p-value in the hash contract). Same scale shape as
    stats_ks_two_sample: one raw-events pass, everything else on the
    value profile."""
    ev = t(spark, sf_dir, "events")
    counts = (
        ev.groupBy(
            "event_type", F.col("value").cast("decimal(12,2)").alias("v")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        # materialize the profile: every downstream branch (totals,
        # grid, both probe sides) reads this, not a fresh raw-events
        # scan — the executed plan otherwise re-scanned the fact table
        # once per consumer (observed: 14 scans), which at 100 TB IS
        # the query cost
        .localCheckpoint(eager=False)
    )
    totals = counts.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("nt")
    )
    a, b = totals.alias("a"), totals.alias("b")
    pairs = a.join(
        b, F.col("a.event_type") < F.col("b.event_type")
    ).select(
        F.col("a.event_type").alias("ta"),
        F.col("b.event_type").alias("tb"),
        F.col("a.nt").alias("n"),
        F.col("b.nt").alias("m"),
    )
    grid = (
        pairs.join(
            counts.alias("c"),
            (F.col("c.event_type") == F.col("ta"))
            | (F.col("c.event_type") == F.col("tb")),
        )
        .select("ta", "tb", "v")
        .distinct()
    )
    ca = counts.select(
        F.col("event_type").alias("eta"), F.col("v").alias("va"),
        F.col("c").alias("ca"),
    )
    cb = counts.select(
        F.col("event_type").alias("etb"), F.col("v").alias("vb"),
        F.col("c").alias("cb"),
    )
    joined = (
        grid.join(
            ca, (F.col("eta") == F.col("ta")) & (F.col("va") == F.col("v")),
            "left",
        )
        .join(
            cb, (F.col("etb") == F.col("tb")) & (F.col("vb") == F.col("v")),
            "left",
        )
        .select(
            "ta", "tb", "v",
            F.coalesce(F.col("ca"), F.lit(0)).alias("ca"),
            F.coalesce(F.col("cb"), F.lit(0)).alias("cb"),
        )
    )
    wcum = (
        W.partitionBy("ta", "tb")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = joined.select(
        "ta", "tb",
        "ca",
        (F.col("ca") + F.col("cb")).alias("c"),
        F.sum(F.col("ca") + F.col("cb")).over(wcum).alias("cumn"),
    )
    s = (
        cum.join(pairs, ["ta", "tb"])
        .groupBy("ta", "tb", "n", "m")
        .agg(
            F.sum(
                F.col("ca") * (F.col("cumn") - F.col("c") + 1)
            ).cast("bigint").alias("sasc"),
            F.sum(
                F.col("ca") * (F.col("n") + F.col("m") - F.col("cumn") + 1)
            ).cast("bigint").alias("sdesc"),
            F.sum(
                F.col("c").cast("decimal(38,0)") * F.col("c") * F.col("c")
                - F.col("c")
            ).cast("decimal(38,0)").alias("tie_t"),
        )
    )
    u = s.select(
        "ta", "tb", "n", "m", "tie_t",
        (F.col("n") + F.col("m")).alias("nn"),
        (
            F.col("sasc") - F.col("sdesc")
            + F.col("n") * (F.col("n") + F.col("m") + 1)
            - F.col("n") * (F.col("n") + 1)
        ).alias("u2"),
    )
    nd = F.col("n").cast("double")
    md = F.col("m").cast("double")
    nnd = F.col("nn").cast("double")
    ud = F.col("u2").cast("double") / F.lit(2.0)
    tie_d = big_double("tie_t")
    var = (
        nd * md / F.lit(12.0)
        * (nnd + F.lit(1.0) - tie_d / (nnd * (nnd - F.lit(1.0))))
    )
    return u.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        "n",
        "m",
        F.col("u2").cast("bigint").alias("u2_a"),
        ud.alias("u_a"),
        tie_d.alias("tie_term"),
        ((ud - nd * md / F.lit(2.0)) / F.sqrt(var)).alias("z"),
    ).orderBy("type_a", "type_b")


# Chi-square contingency cells for event_type x hour-of-day. The
# per-cell contribution (O*N - R*C)^2 / (R*C*N) is emitted PER CELL
# (types x 24 rows) rather than summed: the numerator (O*N - R*C)^2
# is exact DECIMAL(38,0) crossing to double via big_double and the
# denominator fits int64, so each cell is deterministic — but a SUM of
# those doubles would be partition-order-dependent, which is exactly
# what the hash contract forbids. Consumers fold the total in one
# deterministic pass over 24*types rows (trivially driver-side).
_CHI2_SQL = """
WITH o AS (
  SELECT event_type, EXTRACT(hour FROM ts) AS hod,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY 1, 2),
r AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt FROM o GROUP BY 1),
c AS (SELECT hod, CAST(SUM(o) AS BIGINT) AS ct FROM o GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS nt FROM o),
cells AS (
  SELECT o.event_type, o.hod, o.o, r.rt, c.ct, n.nt,
         CAST(o.o * n.nt - r.rt * c.ct AS DECIMAL(38,0))
           * (o.o * n.nt - r.rt * c.ct) AS diff2
  FROM o JOIN r ON r.event_type = o.event_type
         JOIN c ON c.hod = o.hod
         CROSS JOIN n)
SELECT event_type, CAST(hod AS INT) AS hod, o AS observed,
       CAST(rt * ct AS DOUBLE) / CAST(nt AS DOUBLE) AS expected,
       ({bd_diff2})
         / (CAST(rt * ct AS DOUBLE) * CAST(nt AS DOUBLE)) AS contrib
FROM cells ORDER BY event_type, hod
""".format(bd_diff2=big_double_duck_sql("diff2"))


@query("stats_chi2_cells", sql=_CHI2_SQL)
def stats_chi2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence cells over the event_type x hour-of-day
    contingency table: observed counts, expected R*C/N, and the exact
    per-cell contribution (O*N - R*C)^2 / (R*C*N) — the categorical
    drift detector (is traffic mix independent of hour?). Numerator
    exact in DECIMAL(38,0) through big_double (O*N - R*C can reach
    ~1e12, its square 1e24); denominator R*C*N fits int64 at any SF the
    events table reaches. Emitted per cell, NOT summed: a double total
    would be partition-order-dependent; the 24 x types cells fold
    deterministically consumer-side. One raw pass (groupBy type,hod);
    marginals are dim-sized partial aggs joined back broadcast."""
    ev = t(spark, sf_dir, "events")
    o = (
        ev.groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    r = o.groupBy("event_type").agg(F.sum("o").cast("bigint").alias("rt"))
    c = o.groupBy("hod").agg(F.sum("o").cast("bigint").alias("ct"))
    n = o.groupBy().agg(F.sum("o").cast("bigint").alias("nt"))
    diff = F.col("o") * F.col("nt") - F.col("rt") * F.col("ct")
    cells = (
        o.join(r, "event_type")
        .join(c, "hod")
        # bcast: O(1) — single-row grand-total attach
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            F.col("hod").cast("int").alias("hod"),
            F.col("o").alias("observed"),
            (
                (F.col("rt") * F.col("ct")).cast("double")
                / F.col("nt").cast("double")
            ).alias("expected"),
            (diff.cast("decimal(38,0)") * diff).alias("diff2"),
            (
                (F.col("rt") * F.col("ct")).cast("double")
                * F.col("nt").cast("double")
            ).alias("den"),
        )
    )
    return cells.select(
        "event_type",
        "hod",
        "observed",
        "expected",
        (big_double("diff2") / F.col("den")).alias("contrib"),
    ).orderBy("event_type", "hod")
