"""Regime-aware dedup tiering queries (VERDICT r10 ask #1).

The exact n-gram pair tiers (:func:`operators.dedup.ngram_jaccard_pairs`
/ ``containment_pairs``) are lossless but QUADRATIC on saturated shingle
spaces (templated logs, boilerplate, tiny vocabularies — and the
driver's own fixture: measured 54x pair time at 10x data,
docs/BENCH_SF1_NOTES.md), while the MinHash tier held 5.2x. Round 10's
verdict: both tiers existed, nothing routed between them. These queries
exercise ``auto_near_dup_pairs`` / ``auto_containment_pairs``, whose
probe (sum_s df*(df-1)/2 over the capped shingle df stats — integer
exact) picks the cheapest sound tier.

THE ORACLES REPLICATE THE ROUTER, not just a branch: each SQL computes
the same pair-mass scalars and emits the branch the same decision rule
selects, with the chosen tier as an output column — so the driver's
hash check verifies the routing itself cross-engine, at whatever scale
it runs. The three jaccard queries pin budgets that exercise each
branch on the fixture (probed at sf0.001/0.01/0.1: base-2-gram mass is
736-7294 pairs/doc — saturated — while 4-gram mass is 3-11/doc):

- ``dedup_auto_tier``       budget 128/doc -> widened exact (n=4);
- ``dedup_auto_tier_exact`` budget 100k/doc -> base exact (n=2);
- ``dedup_auto_tier_lsh``   budget 2/doc -> MinHash-LSH at n=2
  (md5 hash family, so even the sketch branch is hash-verified).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as D
from .registry import query, t

SQL_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"


def _sh_ctes(tag: str, n: int, blocked: bool = False) -> str:
    """Tokens -> distinct n-gram shingles per doc -> hot-df cap -> per-
    shingle df -> pair-mass scalar, as CTEs prefixed ``{tag}_``.
    Mirrors operators.dedup._shingle_table + cap_shingle_df +
    shingle_pair_mass exactly (cap: df > max(0.5 * n_docs, 100))."""
    blk = "lang, " if blocked else ""
    blkgrp = "lang, shingle" if blocked else "shingle"
    blkeq = "hot.lang = s.lang AND " if blocked else ""
    return f"""
    {tag}_sh0 AS (
      SELECT doc_id, {blk}
             unnest(list_distinct(list_transform(range(1, len(tk) - {n - 2}),
                    i -> array_to_string(tk[i:i+{n - 1}], ' ')))) AS shingle
      FROM toks WHERE len(tk) >= {n}),
    {tag}_sh AS (
      SELECT * FROM {tag}_sh0 s WHERE NOT EXISTS (
        SELECT 1 FROM (SELECT {blkgrp} FROM {tag}_sh0 GROUP BY {blkgrp}
                       HAVING COUNT(*) > GREATEST(
                         0.5 * (SELECT COUNT(*) FROM documents), 100)) hot
        WHERE {blkeq}hot.shingle = s.shingle)),
    {tag}_dfs AS (SELECT {blkgrp}, COUNT(*) AS df
                  FROM {tag}_sh GROUP BY {blkgrp}),
    {tag}_mass AS (SELECT COALESCE(SUM(df * (df - 1)), 0) // 2 AS m
                   FROM {tag}_dfs)"""


def _jaccard_ctes(tag: str, threshold: float) -> str:
    """Exact-Jaccard pairs over ``{tag}_sh`` (unblocked)."""
    return f"""
    {tag}_sizes AS (SELECT doc_id, COUNT(*) AS n_sh
                    FROM {tag}_sh GROUP BY doc_id),
    {tag}_inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM {tag}_sh a JOIN {tag}_sh b ON a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    {tag}_pairs AS (
      SELECT id_a, id_b,
             CAST(n_inter AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM {tag}_inter
      JOIN {tag}_sizes sa ON sa.doc_id = id_a
      JOIN {tag}_sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_inter AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= {threshold})"""


# MinHash(32) + 8-band LSH + exact verify over base_sh, md5 family —
# the dedup_minhash_lsh_md5 machinery re-targeted at the router's
# capped base-n shingles.
_MH_CTES = """
    mh_seeds AS (SELECT unnest(range(32)) AS seed),
    mh_sig AS (
      SELECT doc_id, seed, MIN(md5(seed || ':' || md5(shingle))) AS h
      FROM base_sh CROSS JOIN mh_seeds GROUP BY doc_id, seed),
    mh_bands AS (
      SELECT doc_id, seed // 4 AS band,
             md5(string_agg(h, '|' ORDER BY seed)) AS bh
      FROM mh_sig GROUP BY doc_id, seed // 4),
    mh_cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM mh_bands a JOIN mh_bands b ON a.band = b.band AND a.bh = b.bh
      WHERE a.doc_id < b.doc_id),
    mh_sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM base_sh
                 GROUP BY doc_id),
    mh_inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
      FROM mh_cand c
      JOIN base_sh a ON a.doc_id = c.id_a
      JOIN base_sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b),
    mh_pairs AS (
      SELECT i.id_a, i.id_b,
             CAST(n_inter AS DOUBLE)
               / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) AS jaccard
      FROM mh_inter i
      JOIN mh_sizes sa ON sa.doc_id = i.id_a
      JOIN mh_sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(n_inter AS DOUBLE)
              / CAST(sa.n_sh + sb.n_sh - n_inter AS DOUBLE) >= 0.5)"""


def _auto_tier_sql(budget: int) -> str:
    """Full router oracle: probe base-2-gram mass, widened-4-gram mass,
    then emit exactly the branch auto_near_dup_pairs takes. All three
    branch relations are declared; the scalar WHERE predicates select
    one (the others evaluate over tiny fixtures — the oracle is spec,
    not the scale path)."""
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    {_sh_ctes('base', 2)},
    {_sh_ctes('wide', 4)},
    {_jaccard_ctes('base', 0.5)},
    {_jaccard_ctes('wide', 0.5)},
    {_MH_CTES},
    nd AS (SELECT COUNT(*) AS n FROM documents)
    SELECT id_a, id_b, jaccard, 'exact_n2' AS tier FROM base_pairs
    WHERE (SELECT m FROM base_mass) <= {budget} * (SELECT n FROM nd)
    UNION ALL
    SELECT id_a, id_b, jaccard, 'exact_n4' AS tier FROM wide_pairs
    WHERE (SELECT m FROM base_mass) > {budget} * (SELECT n FROM nd)
      AND (SELECT m FROM wide_mass) <= {budget} * (SELECT n FROM nd)
    UNION ALL
    SELECT id_a, id_b, jaccard, 'minhash_n2' AS tier FROM mh_pairs
    WHERE (SELECT m FROM base_mass) > {budget} * (SELECT n FROM nd)
      AND (SELECT m FROM wide_mass) > {budget} * (SELECT n FROM nd)
    """


@query("dedup_auto_tier", sql=_auto_tier_sql(128), headline=True)
def dedup_auto_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regime-aware near-dup pairs, default budget (128 candidate
    pairs/doc): the fixture's 2-gram space is saturated (736-7294
    pairs/doc at sf0.01-0.1), so the router escalates to the WIDENED
    exact tier (4-grams, 3-11 pairs/doc — lossless at that width) —
    the lever that keeps the sf1 fixture sub-quadratic. The oracle
    replicates the probe + decision, so the tier choice is part of the
    hash check."""
    docs = t(spark, sf_dir, "documents")
    return D.auto_near_dup_pairs(
        docs, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=128,
    )


@query("dedup_auto_tier_exact", sql=_auto_tier_sql(100_000))
def dedup_auto_tier_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Router with a permissive budget (100k pairs/doc): the base
    2-gram mass fits, so the probe keeps the lossless base exact tier —
    proving the router does NOT escalate when the corpus affords
    exactness (and that its output then equals dedup_ngram_jaccard
    modulo the lang blocking and tier column)."""
    docs = t(spark, sf_dir, "documents")
    return D.auto_near_dup_pairs(
        docs, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=100_000,
    )


@query("dedup_auto_tier_lsh", sql=_auto_tier_sql(2))
def dedup_auto_tier_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Router with a tight budget (2 pairs/doc — the 'any exact tier is
    too expensive' posture): both the 2-gram and widened 4-gram masses
    exceed it, so the router falls through to MinHash-LSH candidates at
    the ORIGINAL width with exact-Jaccard verification. md5 hash family
    so the sketch branch itself is hash-verified cross-engine
    (production default stays xxhash64, same twin convention as
    dedup_minhash_lsh_md5)."""
    docs = t(spark, sf_dir, "documents")
    return D.auto_near_dup_pairs(
        docs, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=2, hash_family="md5",
    )


def _containment_auto_sql(budget: int) -> str:
    """Containment router oracle, lang-blocked, n=2 -> n=4 (one
    widening, matching max_widenings=1)."""

    def pairs(tag: str) -> str:
        return f"""
    {tag}_sizes AS (SELECT doc_id, COUNT(*) AS n_sh
                    FROM {tag}_sh GROUP BY doc_id),
    {tag}_inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM {tag}_sh a
      JOIN {tag}_sh b ON a.shingle = b.shingle AND a.lang = b.lang
      WHERE a.doc_id <> b.doc_id GROUP BY 1, 2),
    {tag}_pairs AS (
      SELECT i.id_a AS id_contained, i.id_b AS id_container,
             CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE)
               AS containment,
             CAST(sa.n_sh AS BIGINT) AS n_contained,
             CAST(sb.n_sh AS BIGINT) AS n_container
      FROM {tag}_inter i
      JOIN {tag}_sizes sa ON sa.doc_id = i.id_a
      JOIN {tag}_sizes sb ON sb.doc_id = i.id_b
      WHERE CAST(n_inter AS DOUBLE) / CAST(sa.n_sh AS DOUBLE) >= 0.8)"""

    return f"""
    WITH toks AS (SELECT doc_id, lang, {SQL_TOKS} AS tk FROM documents),
    {_sh_ctes('base', 2, blocked=True)},
    {_sh_ctes('wide', 4, blocked=True)},
    {pairs('base')},
    {pairs('wide')},
    nd AS (SELECT COUNT(*) AS n FROM documents)
    SELECT *, 'exact_n2' AS tier FROM base_pairs
    WHERE (SELECT m FROM base_mass) <= {budget} * (SELECT n FROM nd)
    UNION ALL
    SELECT *, 'exact_n4' AS tier FROM wide_pairs
    WHERE (SELECT m FROM base_mass) > {budget} * (SELECT n FROM nd)
    """


@query("dedup_containment_auto_tier", sql=_containment_auto_sql(64))
def dedup_containment_auto_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regime-aware directional containment (doc-inside-doc), the op
    whose exact tier was the measured 54x scale-killer on the saturated
    sf1 fixture. Escalation is by shingle WIDENING only (a Jaccard
    MinHash sketch is not a sound containment filter); budget 64
    pairs/doc widens 2-grams -> 4-grams on this fixture at every SF
    (blocked base mass 183-1875/doc vs 1-3/doc widened). Oracle
    replicates probe + decision; tier column hash-checked."""
    docs = t(spark, sf_dir, "documents")
    return D.auto_containment_pairs(
        docs, "doc_id", "text", n=2, threshold=0.8, block_col="lang",
        mass_budget_per_doc=64, widen_step=2, max_widenings=1,
    )
