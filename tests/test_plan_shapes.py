"""Plan-shape regression tests: lock the physical-plan properties the
100 TB posture depends on (pushdown, pruning, broadcast, partial agg,
top-k without global sort). A change that silently loses one of these
passes value-correctness but regresses at scale — these tests catch it.
"""

import io
import contextlib

import pytest

from datalake_scripts_spark.queries.registry import REGISTRY


def _plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_of(spark, sf_dir, name: str) -> str:
    return _plan_text(REGISTRY[name].fn(spark, sf_dir))


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: only the 7 needed columns reach the scan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    # partial (map-side) aggregation before the exchange
    assert plan.count("HashAggregate") >= 2


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q6_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q5_dims_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit_top_orders")
    # global top-k: per-partition heap + merge, never a full global sort
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_shapes(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi_active_customers")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti_dormant_customers")


def test_correlated_exists_decorrelates(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "subquery_correlated_exists")
    assert "LeftSemi" in plan  # Catalyst decorrelated the EXISTS
    assert "CartesianProduct" not in plan


def test_range_join_broadcasts_intervals(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "range_join_value_tiers")
    assert "BroadcastNestedLoopJoin" in plan


def test_asof_join_single_shuffle(spark, sf_dir):
    import re

    plan = plan_of(spark, sf_dir, "asof_join_purchase_to_signup")
    # union + window: exactly one exchange (hash partition on user_id)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan


def test_scd2_build_single_shuffle(spark, sf_dir):
    import re

    plan = plan_of(spark, sf_dir, "scd2_user_tier_history")
    # three window stages (LWW, change-collapse, interval close) share
    # one hash partitioning on the key -> exactly one Exchange
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges == 1, plan


def test_scd2_point_in_time_single_shuffle_no_theta_join(spark, sf_dir):
    import re

    plan = plan_of(spark, sf_dir, "scd2_point_in_time_tier")
    # as-of union+window instead of an interval theta-join: no
    # nested-loop join anywhere; exactly three exchanges — dim-build
    # key hash, as-of union key hash, final (3-row) group-by
    assert "NestedLoop" not in plan, plan
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert n_exchanges <= 3, plan


def test_partition_pruned_scan(spark, sf_dir, tmp_path):
    """S2 upgrade: ingest-date partition columns replace glob masks;
    Catalyst prunes partitions statically (PartitionFilters in the scan,
    one directory read instead of all)."""
    from datalake_scripts_spark.io import read_table, write_parquet
    from pyspark.sql import functions as F

    out = str(tmp_path / "orders_part")
    orders = read_table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    write_parquet(orders, out, mode="overwrite", partition_by=["order_year"])
    q = spark.read.parquet(out).filter(F.col("order_year") == 1996)
    import io as _io
    import contextlib

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "order_year" in [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert q.count() > 0


def test_plan_linter(spark, sf_dir):
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators.plan_lint import lint_plan
    from datalake_scripts_spark.queries.registry import REGISTRY

    # clean plan: no findings
    clean = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)
    assert lint_plan(clean) == []
    # cartesian product is flagged
    a = read_table(spark, sf_dir, "region")
    bad = a.crossJoin(read_table(spark, sf_dir, "nation"))
    assert any(f.rule == "cartesian-product" for f in lint_plan(bad))
    # row-at-a-time Python UDF is flagged
    @F.udf("long")
    def slow(x):
        return x + 1

    with_udf = read_table(spark, sf_dir, "region").select(slow("r_regionkey"))
    assert any(f.rule == "row-python-udf" for f in lint_plan(with_udf))
    # single-partition exchange (unpartitioned window) is flagged
    from pyspark.sql import Window as W

    w = W.orderBy("r_regionkey")
    glob_win = read_table(spark, sf_dir, "region").select(
        F.row_number().over(w).alias("rn")
    )
    assert any(f.rule == "single-partition-exchange" for f in lint_plan(glob_win))
    # column-pruning expectation
    wide = read_table(spark, sf_dir, "lineitem")
    assert any(
        f.rule == "column-pruning" for f in lint_plan(wide, expect_pruned_columns=2)
    )


# Queries whose single-partition exchange is reviewed-and-accepted: the
# final stage of a global aggregation over map-side partials (tiny), or
# a global window over already-aggregated/small data (documented in each
# docstring). Anything NEW showing up here must be justified or fixed.
LINT_ALLOWLIST = {
    "q6_forecast_revenue": {"single-partition-exchange"},
    "q14_promo_revenue_share": {"single-partition-exchange"},
    "q19_disjunctive_predicates": {"single-partition-exchange"},
    "q22_dormant_high_balance": {"single-partition-exchange"},
    # global scalar results: partial agg runs map-side, only one tiny
    # row per task crosses the single-partition exchange
    "q15_top_supplier": {"single-partition-exchange"},
    "q17_small_quantity_revenue": {"single-partition-exchange"},
    "subquery_scalar_above_avg": {"single-partition-exchange"},
    # scalar-subquery threshold: global sum over the already-aggregated
    # per-part values (tiny input crosses the exchange)
    "q11_important_part_values": {"single-partition-exchange"},
    "window_ntile_percent_rank": {"single-partition-exchange"},
    "window_share_of_total": {"single-partition-exchange"},
    "approx_distinct_stats": {"single-partition-exchange"},
    "events_signup_purchase_funnel": {"single-partition-exchange"},
    # three global scalar stage-counts over |users|-sized stage frames:
    # partial agg map-side, one tiny row per task crosses each exchange
    "events_funnel_conversion": {"single-partition-exchange"},
    "events_hourly_growth": {"single-partition-exchange"},
    "events_gap_filled_hours": {"single-partition-exchange"},
    "profile_table_stats": {"single-partition-exchange"},
    # tfidf attaches the scalar corpus doc-count via
    # crossJoin(F.broadcast(one_row_df)) — the standard lazy scalar-attach
    # idiom (BroadcastNestedLoopJoin of a 1-row build side, O(1) bytes
    # broadcast; a driver-side .count() would make the builder eager and
    # run a job at plan-construction time). The single-partition exchange
    # is the final global top-k over already-aggregated per-term rows.
    "text_tfidf_top_terms": {"cartesian-product", "single-partition-exchange"},
    # same lazy scalar-attach idiom as tfidf: the (n, v) totals row is a
    # 1-row broadcast crossJoin; the single-partition exchange is the
    # totals aggregation itself (one tiny row per task crosses it)
    "quality_unigram_logprob": {"cartesian-product", "single-partition-exchange"},
    # round-1 winner attach: crossJoin(F.broadcast(limit(1) row)) — the
    # merge pattern reaches executors without a driver collect
    "bpe_second_merge": {"cartesian-product"},
    # NB model scalar-attach (totals + prior, two 1-row broadcasts); the
    # single-partition exchange is each scalar's own global agg (one
    # tiny partial row per task crosses it)
    "quality_nb_classifier": {"cartesian-product", "single-partition-exchange"},
    # DSIR totals row: 1-row broadcast crossJoin (lazy scalar-attach)
    "dsir_importance_select": {"cartesian-product"},
    # N-threshold scalar-attach (1-row broadcast crossJoin); the
    # single-partition exchange is the totals agg itself (one tiny
    # partial row per task)
    "sketch_mg_heavy_hitters_exact": {
        "cartesian-product",
        "single-partition-exchange",
    },
    # query-vector attach (1-row broadcast crossJoin) + BM25 corpus
    # stats row; rank windows run over the 50-row TakeOrdered pools
    "retrieval_hybrid_rrf": {
        "cartesian-product",
        "single-partition-exchange",
    },
    # per-priority global COUNT over an already-pruned partition read:
    # partial agg map-side, one tiny row per task crosses the exchange
    "versioned_chunked_pruning": {"single-partition-exchange"},
    # corpus-stats + theta scalar attaches (1-row broadcast crossJoins
    # of the lazy scalar-attach idiom)
    "text_bm25_topk_pruned": {"cartesian-product"},
    # global scalar summary of per-key counts: partial agg map-side,
    # one tiny row per task crosses the final exchange
    "skew_report_orders_custkey": {"single-partition-exchange"},
    # semantic decontamination scores EVERY corpus vector against the
    # whole benchmark set by design (max-cosine needs all pairs); the
    # benchmark side is O(eval-suite) and enters as an explicit
    # broadcast, so the "cartesian" is a BroadcastNestedLoopJoin with a
    # fixed-size build side — corpus x benchmark, never corpus x corpus
    "decontaminate_embedding_benchmark": {"cartesian-product"},
    # final merge of per-partition HLL sketches: map-side partials reduce
    # each partition to ONE fixed-size sketch (~few KiB); only those cross
    # the single-partition exchange for the associative union. This is the
    # canonical mergeable-sketch rollup shape — the exchange payload is
    # O(partitions × sketch_size), independent of row count.
    "sketch_hll_union_rollup": {"single-partition-exchange"},
    # the CMS dot product reduces each side to a fixed 2x1024-counter
    # sketch before anything global happens: the single-partition
    # exchanges carry only sketch rows / the 2-row per-seed dots, and the
    # estimate x exact combination is a 1-row x 1-row broadcast cross
    # (lazy scalar-attach, same as tfidf)
    "sketch_cms_join_size": {"cartesian-product", "single-partition-exchange"},
    # whole-table constraint report: partial agg runs map-side, one tiny
    # row of rule counters per task crosses the global exchange (same
    # class as q6/profile_table_stats)
    "validate_orders_constraints": {"single-partition-exchange"},
    # octile boundaries: 1-row exact-percentile aggregate broadcast via
    # the lazy scalar-attach crossJoin; the exchange carries only the
    # per-task percentile partials
    "agg_histogram_equidepth": {"cartesian-product", "single-partition-exchange"},
    # 1-row corpus stats (n_docs, total_len) broadcast via the lazy
    # scalar-attach crossJoin, same idiom as tfidf/unigram_logprob
    "text_bm25_scores": {"cartesian-product"},
    # same lazy scalar-attach as unigram_logprob: the 1-row vocab size
    # crosses as a broadcast; the exchange carries the vocab-count
    # partials only
    "quality_bigram_logprob": {"cartesian-product", "single-partition-exchange"},
    # 1-row experiment readout: the final pivot aggregates the 2-row
    # per-variant table; partials are map-side
    "events_ab_test_conversion": {"single-partition-exchange"},
    # two 1-row metric factors (totals, chance numerator) combine via
    # the lazy scalar-attach cross; exchanges carry tiny aggregates
    "eval_langid_kappa": {"cartesian-product", "single-partition-exchange"},
    # order-count total: 1-row lazy scalar-attach cross (same as tfidf)
    "mining_part_pair_lift": {"cartesian-product"},
    # recall readout: hit-count and exact-count reduce to ONE row each
    # (map-side partials cross the exchange), combined via the lazy
    # scalar-attach cross — O(1) rows in both flagged operators
    "ann_ivf_recall": {"cartesian-product", "single-partition-exchange"},
    # the cumulative-fill window runs on the <= 1001-row score-bucket
    # aggregate (deliberate single-partition pass over a bounded
    # relation, per the docstring), never the corpus
    "select_docs_token_budget": {"single-partition-exchange"},
    # per-version stats are 1-row aggregates (partials map-side); the
    # drift join is on the per-column stat rows
    "versioned_stats_drift": {"single-partition-exchange"},
    # sum-of-weights is a 1-row scalar attached via broadcast cross;
    # the exchange carries strata-count partials only
    "mixture_temperature_targets": {
        "cartesian-product",
        "single-partition-exchange",
    },
    # per-registered-table 1-row summary aggregates (partials map-side;
    # only one tiny row per task crosses each exchange) unioned over the
    # catalog's enumerated tables
    "catalog_named_tables": {"single-partition-exchange"},
    # two 1-row snapshot summaries (latest + time-travel v1): global
    # aggs reduce map-side, one partial row per task crosses
    "versioned_column_mapping": {"single-partition-exchange"},
    # 1-row sampled-edge/triangle census: global sums reduce map-side
    # on the sparsified (p=1/16) edge list, one partial row per task
    "graph_triangle_sampled_estimate": {"single-partition-exchange"},
    # per-round 1-row peel census rows (count/sum partials map-side);
    # the peel joins themselves stay node-key partitioned
    "graph_kcore_census": {"single-partition-exchange"},
    # grand-total N is a 1-row scalar attached via broadcast cross
    # (the mixture_temperature_targets convention); marginal aggs
    # reduce map-side
    "stats_chi2_cells": {
        "cartesian-product",
        "single-partition-exchange",
    },
}


def test_all_registered_queries_pass_plan_lint(spark, sf_dir):
    """Every query in the registry is lint-clean apart from explicitly
    reviewed exceptions — no cartesian products, no row Python UDFs, no
    unreviewed single-partition funnels anywhere in the graded surface."""
    from datalake_scripts_spark.operators.plan_lint import lint_plan

    violations = {}
    for name, q in REGISTRY.items():
        findings = lint_plan(q.fn(spark, sf_dir))
        rules = {f.rule for f in findings}
        allowed = LINT_ALLOWLIST.get(name, set())
        unexpected = rules - allowed
        if unexpected:
            violations[name] = sorted(unexpected)
    assert violations == {}, violations


def test_runtime_bloom_filter_injection(spark, sf_dir):
    """Catalyst's runtime bloom-filter (the injected semi-join filter
    that prunes fact rows BEFORE the shuffle) must fire for a selective
    dim joined without broadcast — at 100 TB this is what keeps a
    sort-merge fact-dim join from shuffling the whole fact table. The
    size thresholds exist for real clusters, so the test lowers the
    application-side floor to make injection observable at test scale."""
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table

    assert spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true"
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        li = read_table(spark, sf_dir, "lineitem")
        part = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
        j = li.join(part, li.l_partkey == part.p_partkey).groupBy("p_brand").count()
        plan = _plan_text(j)
        assert "might_contain" in plan, "runtime bloom filter not injected"
        assert "bloom_filter_agg" in plan
        # the filter lands on the FACT side scan condition
        fact_cond = [
            l for l in plan.splitlines() if "might_contain" in l and "Condition" in l
        ]
        assert any("l_partkey" in l for l in fact_cond), fact_cond
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.unset(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        )


def test_q8_single_shuffle_star(spark, sf_dir):
    """q8: lineitem streams through 7 broadcast joins; the ONLY
    exchange is the final year groupBy (plus broadcast exchanges)."""
    import re

    plan = plan_of(spark, sf_dir, "q8_national_market_share")
    assert len(re.findall(r"^\(\d+\) BroadcastHashJoin", plan, re.M)) == 7
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1, plan


def test_q21_fact_branches_sort_merge(spark, sf_dir):
    """q21: the semi/anti self-join branches must stay sort-merge —
    a broadcast/hash build of a fact projection OOMs at scale."""
    plan = plan_of(spark, sf_dir, "q21_waiting_suppliers")
    assert "SortMergeJoin" in plan and "LeftSemi" in plan and "LeftAnti" in plan


def test_winnowing_no_inferred_generate_filter(spark, sf_dir):
    """dedup_winnowing_pairs: InferFiltersFromGenerate must not clone
    the fingerprint expression into a pushed-down filter (25x cost);
    the explode_outer formulation keeps the scan filter trivial."""
    plan = plan_of(spark, sf_dir, "dedup_winnowing_pairs")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert all("md5" not in l and "transform" not in l for l in pushed), pushed
    scan_filters = [l for l in plan.splitlines() if "Condition :" in l]
    assert all("slice" not in l for l in scan_filters), scan_filters


def test_every_broadcast_hint_annotated_with_size_bound():
    """Every explicit F.broadcast(...) hint overrides AQE's size check,
    so every site must carry a written size bound proving the build
    side does NOT scale with the fact data (VERDICT r3 ask #2). The
    annotation is a '# bcast:' comment on the same line or within the
    6 lines above the hint; inputs that DO scale with the data must
    not be hinted at all (grep for '# no hint' rationale instead)."""
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "datalake_scripts_spark"
    unannotated = []
    for path in sorted(pkg.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "F.broadcast(" not in line:
                continue
            window = lines[max(0, i - 6) : i + 1]
            if not any("# bcast:" in w for w in window):
                unannotated.append(f"{path.relative_to(pkg.parent)}:{i + 1}")
    assert not unannotated, (
        "F.broadcast hint(s) without a '# bcast: <size bound>' "
        f"annotation: {unannotated}"
    )
