"""Regime-aware dedup tiering (operators.dedup.auto_near_dup_pairs /
auto_containment_pairs): branch selection on synthetic regimes, widened
-tier losslessness, and LSH-tier consistency with the direct operator.
"""

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import dedup as D


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


@pytest.fixture(scope="module")
def diverse(spark):
    # Heaps-ish corpus: every doc draws from its own vocabulary ->
    # 2-gram df stays ~1, mass/doc ~0, exact tier always affordable.
    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(12))) for i in range(40)
    ] + [(100, " ".join(f"w7_{j}" for j in range(12)))]  # dup of doc 7
    return _docs(spark, rows)


@pytest.fixture(scope="module")
def saturated(spark):
    # 6-word vocabulary, 80 docs of 12 pseudo-random words: the 2-gram
    # space (<=36 keys) is saturated (mean df ~24, below the 0.5*N hot
    # cap so shingles survive), while the 4-gram space (~1300 keys) is
    # not — the exact regime-split the router must detect. Word choice
    # is a fixed quadratic hash, NOT periodic (a periodic rotation puts
    # every shingle in most docs and the hot cap empties the corpus).
    words = [f"w{k}" for k in range(6)]

    def gen(i, j):
        # cross term (i*j) % 13 breaks mod-6 periodicity in i, so docs
        # are genuinely varied (78 distinct of 85), not a 6-doc cycle
        return words[(i * 31 + j * 17 + (i * j) % 13) % 6]

    rows = [
        (i, " ".join(gen(i, j) for j in range(12))) for i in range(80)
    ] + [
        (200 + d, " ".join(gen(d, j) for j in range(12))) for d in range(5)
    ]  # planted exact dups of docs 0-4 so every tier finds pairs
    # measured (pure-python replica): 2-gram mass 4472 (52.6/doc, max
    # df 21 < the 42.5 hot cap), 4-gram mass 732 (8.6/doc) — saturated
    # base, de-saturated widened.
    return _docs(spark, rows)


def _masses(df, n_base=2, n_wide=4):
    _, dfs, _, nd = D._capped_df_stats(df, "doc_id", "text", n_base,
                                       None, 0.5, 3)
    _, dfs_w, _, _ = D._capped_df_stats(df, "doc_id", "text", n_wide,
                                        None, 0.5, 3)
    return D.shingle_pair_mass(dfs), D.shingle_pair_mass(dfs_w), nd


def test_diverse_stays_exact_base(diverse):
    out = D.auto_near_dup_pairs(
        diverse, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=8, min_df_keep=3,
    )
    tiers = {r["tier"] for r in out.collect()}
    assert tiers == {"exact_n2"}
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (7, 100) in pairs  # the planted exact dup survives


def test_saturated_widens(saturated):
    # self-calibrating budget: strictly between the widened and base
    # masses, so the router must reject n=2 and accept n=4
    m2, m4, nd = _masses(saturated)
    assert m4 < m2, "fixture must de-saturate when widened"
    budget = (m4 // nd) + 1
    assert budget * nd < m2
    out = D.auto_near_dup_pairs(
        saturated, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=budget, min_df_keep=3,
    )
    rows = out.collect()
    assert rows and {r["tier"] for r in rows} == {"exact_n4"}
    # widened tier is exact AT ITS WIDTH: equals the direct operator
    direct = D.ngram_jaccard_pairs(
        saturated, "doc_id", "text", n=4, threshold=0.5, min_df_keep=3
    )
    assert sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rows) == sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in direct.collect()
    )


def test_saturated_tight_budget_routes_lsh(saturated):
    out = D.auto_near_dup_pairs(
        saturated, "doc_id", "text", n=2, threshold=0.5,
        mass_budget_per_doc=0, min_df_keep=3, hash_family="md5",
    )
    rows = out.collect()
    assert rows and {r["tier"] for r in rows} == {"minhash_n2"}
    # LSH-tier output == the direct minhash operator (same params)
    direct = D.minhash_lsh_pairs(
        saturated, "doc_id", "text", n=2, num_hashes=32, bands=8,
        verify_threshold=0.5, min_df_keep=3, hash_family="md5",
    )
    assert sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rows) == sorted(
        (r["id_a"], r["id_b"], r["jaccard"]) for r in direct.collect()
    )
    # every surviving pair is verified with TRUE base-n jaccard
    assert all(r["jaccard"] >= 0.5 for r in rows)


def test_containment_router_widens_and_matches_direct(saturated):
    out = D.auto_containment_pairs(
        saturated, "doc_id", "text", n=2, threshold=0.8,
        mass_budget_per_doc=0, widen_step=2, max_widenings=1,
        min_df_keep=3,
    )
    rows = out.collect()
    assert rows and {r["tier"] for r in rows} == {"exact_n4"}
    direct = D.containment_pairs(
        saturated, "doc_id", "text", n=4, threshold=0.8, min_df_keep=3
    )
    key = lambda r: (r["id_contained"], r["id_container"])  # noqa: E731
    assert sorted(map(key, rows)) == sorted(map(key, direct.collect()))


def test_containment_router_keeps_base_when_affordable(diverse):
    out = D.auto_containment_pairs(
        diverse, "doc_id", "text", n=2, threshold=0.8,
        mass_budget_per_doc=8, min_df_keep=3,
    )
    rows = out.collect()
    assert {r["tier"] for r in rows} == {"exact_n2"}
    assert {(r["id_contained"], r["id_container"]) for r in rows} >= {
        (7, 100), (100, 7)
    }


def test_pair_mass_scalar_exact(spark):
    dfs = spark.createDataFrame(
        [("a", 3), ("b", 1), ("c", 5)], "shingle string, _df int"
    )
    # 3*2/2 + 0 + 5*4/2 = 3 + 10
    assert D.shingle_pair_mass(dfs) == 13


def test_probe_matches_materialized_stats(diverse, saturated):
    """r12 optimization: the fused router probe (_WidthTables) yields
    the identical (mass, n_docs) scalar AND the identical ranked
    relation the materialized _capped_df_stats pipeline produced — the
    identity being that cap_shingle_df drops whole shingle groups, so
    capped dfs == uncapped dfs filtered to the cap."""
    for fixture in (diverse, saturated):
        for n in (2, 4):
            sh, dfs, jk, nd = D._capped_df_stats(
                fixture, "doc_id", "text", n, None, 0.5, 3
            )
            expected_mass = D.shingle_pair_mass(dfs)
            wt = D._WidthTables(fixture, "doc_id", "text", n, None, 0.5, 3)
            assert (wt.mass, wt.n_docs) == (expected_mass, nd)
            old_ranked = sorted(
                map(tuple, sh.join(dfs, jk).select(
                    "doc_id", "shingle", "_df").collect())
            )
            new_ranked = sorted(
                map(tuple, wt.ranked().select(
                    "doc_id", "shingle", "_df").collect())
            )
            assert old_ranked == new_ranked
            old_capped = sorted(
                map(tuple, sh.select("doc_id", "shingle").collect())
            )
            new_capped = sorted(
                map(tuple, wt.capped().select("doc_id", "shingle").collect())
            )
            assert old_capped == new_capped
