"""Query registry — the engine's graded operator surface.

Every operator family from SURVEY.md §2 (plus the scale extensions:
dedup, similarity, text analysis, streaming-equivalents) is exposed as a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where ANSI-SQL-expressible, a DuckDB oracle SQL string computing the
same result. The driver hash-compares the two at sf=0.01.

Determinism rules (so order-insensitive value hashes match DuckDB):
- money/quantity aggregates go through DECIMAL casts in BOTH engines
  (order-independent exact sums), then CAST AS DOUBLE;
- ratio/avg outputs are double division of exact parts, rounded;
- float-vector math uses the same left-to-right fold formula in both
  engines so IEEE results are bit-identical;
- timestamps are NTZ microseconds, session timezone UTC.
"""

from .registry import REGISTRY, Q, query  # noqa: F401

from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import tpch_extra2  # noqa: F401,E402
from . import functions_extra  # noqa: F401,E402
from . import normalize  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import scale  # noqa: F401,E402
from . import traindata  # noqa: F401,E402
from . import sketches  # noqa: F401,E402
from . import graph  # noqa: F401,E402


# The driver's correctness sweep checks the FIRST 50 entries of
# ``queries()`` in iteration order. This curated prefix rotates the
# whole graded surface through the checked window. Round-4 plan
# (VERDICT r3 ask #1): 3 long-green canaries + 47 names the driver
# has NEVER checked, so cumulative driver-green coverage reaches
# 141/180 (the registry grew by six round-4 additions, all
# replay-green and queued with the ~33 other oracle-backed remainders
# for the round-5 prefix). The committed ledger
# ``docs/driver_checked.json`` (name -> first green round, updated by
# scripts/presnapshot.py) is the source of truth for what "never
# checked" means.
DRIVER_PRIORITY = [
    # canaries — green since round 1 (one relational, one normalization,
    # one dedup: a regression in any family head trips at least one)
    "q1_pricing_summary",
    "nested_flatten_struct",
    "dedup_ngram_jaccard",
    # TPC-H long tail — multi-join/agg shapes never driver-sampled
    "q2_min_cost_supplier",
    "q4_priority_with_late_lines",
    "q9_product_type_profit",
    "q11_important_part_values",
    "q12_priority_line_classes",
    "q20_excess_stock_suppliers",
    # relational edge semantics
    "null_handling_semantics",
    "window_range_frame",
    "mining_part_pair_lift",  # broadcast-hint scale flag cleared this round
    # normalization kit remainder
    "nested_explode_outer_preserves_parents",
    "ts_parse_epoch_seconds",
    # dedup family — never-checked heads incl. the md5 oracle twins
    "dedup_minhash_lsh_md5",
    "dedup_simhash_md5",
    "dedup_semantic_clusters",
    "dedup_duplicated_span_stats",
    "dedup_duplicate_clusters_star",
    # similarity / ANN
    "ann_ivf_topk",
    # multimodal (Arrow fan-out stages + the real PNG codec roundtrip)
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_png_roundtrip",
    # as-of cogroup variant
    "asof_join_cogroup_merge",
    # events family — all 14 never-checked batch twins
    "events_hourly_growth",
    "events_sliding_windows",
    "events_session_windows",
    "events_dedup_latest_state",
    "events_gap_filled_hours",
    "events_weekly_cohort_retention",
    "events_view_purchase_attribution",
    "events_hierarchical_rollup",
    "events_ewma_per_user",
    "events_resample_ffill_hourly",
    "events_zscore_anomalies",
    "events_ab_test_conversion",
    "events_weekly_active_users",
    "events_transition_matrix",
    # eval / scale kit
    "eval_langid_kappa",
    "salted_join_segment_revenue",
    "profile_table_stats",
    # versioned-lake head
    "matview_incremental_refresh",
    # training-data curation
    "curate_corpus_pipeline",
    "udtf_chunk_documents",
    "pack_sequences_greedy",
    # sketches — all 4 never-checked
    "sketch_hll_union_rollup",
    "sketch_theta_customer_reach",
    "sketch_kll_price_quantiles",
    "sketch_cms_heavy_hitters",
    # graph
    "graph_pagerank_suppliers",
]


def _ordered_names() -> list[str]:
    missing = [n for n in DRIVER_PRIORITY if n not in REGISTRY]
    assert not missing, f"DRIVER_PRIORITY names not registered: {missing}"
    rest = [n for n in REGISTRY if n not in set(DRIVER_PRIORITY)]
    return DRIVER_PRIORITY + rest


def queries():
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql():
    return {
        name: REGISTRY[name].sql
        for name in _ordered_names()
        if REGISTRY[name].sql is not None
    }


def headline_queries():
    return {name: q.fn for name, q in REGISTRY.items() if q.headline}
