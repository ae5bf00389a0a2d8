"""Round-6 frontier queries: token-budget selection, file-path
provenance, snapshot stats drift, entity-resolution canonicalization.
Each is also oracle-checked end-to-end by scripts/selfcheck.py; these
tests pin the semantic invariants the oracle hash can't articulate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_scripts_spark.queries import REGISTRY


def _run(spark, sf_dir, name):
    return REGISTRY[name].fn(spark, sf_dir)


def test_token_budget_never_exceeded_and_greedy(spark, sf_dir):
    from datalake_scripts_spark.queries.traindata import _BUDGET_TOKENS

    out = _run(spark, sf_dir, "select_docs_token_budget").collect()
    kept_tokens = sum(r.tokens_kept for r in out)
    assert 0 < kept_tokens <= _BUDGET_TOKENS
    n_kept = sum(r.n_kept for r in out)
    n_docs = sum(r.n_docs for r in out)
    assert 0 < n_kept < n_docs  # the budget actually cuts


def test_token_budget_matches_sequential_reference(spark, sf_dir):
    # driver-side reference: walk buckets best-score-first; a bucket's
    # docs fill (by doc_id) against budget minus the FULL token mass of
    # better buckets — exactly the distributed formula's semantics
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import text as X
    from datalake_scripts_spark.queries.traindata import _BUDGET_TOKENS

    docs = read_table(spark, sf_dir, "documents")
    rows = (
        docs.select("doc_id", "source", X.tokens("text").alias("tk"))
        .filter(F.size("tk") > 0)
        .select(
            "doc_id",
            "source",
            F.size("tk").cast("bigint").alias("n_tokens"),
            F.expr("(1000 * size(array_distinct(tk))) div size(tk)").alias(
                "score_pm"
            ),
        )
        .collect()
    )
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.score_pm, []).append(r)
    expected: dict[str, list[int]] = {}
    cum_before = 0
    for pm in sorted(by_bucket, reverse=True):
        fill = 0
        for r in sorted(by_bucket[pm], key=lambda r: r.doc_id):
            if cum_before + fill + r.n_tokens <= _BUDGET_TOKENS:
                ks = expected.setdefault(r.source, [0, 0])
                ks[0] += 1
                ks[1] += r.n_tokens
            fill += r.n_tokens
        cum_before += fill
    out = {
        r.source: [r.n_kept, r.tokens_kept]
        for r in _run(spark, sf_dir, "select_docs_token_budget").collect()
        if r.n_kept
    }
    assert out == expected


def test_provenance_matches_logical_column(spark, sf_dir):
    from datalake_scripts_spark.io import read_table

    out = {
        r.source: (r.n_rows, r.sum_chars)
        for r in _run(spark, sf_dir, "provenance_partition_lineage").collect()
    }
    truth = {
        r.source: (r.n, r.s)
        for r in read_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("s"))
        .collect()
    }
    assert out == truth


def test_stats_drift_detects_the_rewrite(spark, sf_dir):
    rows = {
        r.col_name: r
        for r in _run(spark, sf_dir, "versioned_stats_drift").collect()
    }
    ok = rows["o_orderkey"]
    # the v2 rewrite deletes %10 and inserts offset-shifted keys:
    # row count and max must both move, and the drift flag must fire
    assert ok.rows_v2 != ok.rows_v1
    assert ok.max_v2 > ok.max_v1
    assert bool(ok.range_drifted) is True
    # custkey values are untouched by the rewrite arithmetic
    ck = rows["o_custkey"]
    assert ck.min_v1 == ck.min_v2 and ck.max_v1 == ck.max_v2


def test_entity_resolution_clusters_partition_matched_nodes(spark, sf_dir):
    out = _run(spark, sf_dir, "entity_resolution_canonical").collect()
    assert out, "expected at least one entity cluster"
    # representative is a real member: rep_name is non-null everywhere
    assert all(r.rep_name is not None for r in out)
    # CC runs on the pair graph, so every matched node has degree >= 1
    # and no singleton clusters can exist
    assert all(r.n_members >= 2 for r in out)
    # cluster ids are distinct min-keys
    ids = [r.cluster_id for r in out]
    assert len(ids) == len(set(ids))
