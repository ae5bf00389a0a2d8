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
from . import dimensional  # noqa: F401,E402
from . import linkage  # noqa: F401,E402
from . import textindex  # noqa: F401,E402
from . import autotier  # noqa: F401,E402


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
    # --- never driver-checked (their only chance at a first row) ---
    "stream_funnel_conversion",  # landed after the r9 window froze
    "iceberg_position_deletes",  # r10: DV'd history -> v2 position deletes
    "iceberg_bucket_transform",  # r10: murmur3 bucket[N] truthful export
    "iceberg_nested_adoption",  # r10: nested field-ids round trip
    "iceberg_equality_deletes",  # r10: Flink-CDC deletes adopt as DVs
    "scd2_user_tier_history",  # r10 late: SCD2 build from change feed
    "scd2_point_in_time_tier",  # r10 late: PIT as-of fact attribution
    "linkage_fs_em_params",  # r10 late: Fellegi-Sunter EM parameters
    "linkage_fs_match_patterns",  # r10 late: FS posterior classification
    "text_bm25_indexed_topk",  # r10 late: persisted inverted index serve
    "text_bm25_index_refresh",  # r10 late: O(batch) index maintenance
    "sample_weighted_reservoir",  # r10 late: deterministic A-ES sample
    "stream_ingest_dedup",  # r10 late: online dedup at ingest, full oracle
    "events_resample_interpolate_hourly",  # r10 late: gapfill+interpolate
    "linkage_fs_matched_pairs",  # r10 late: pair-level FS deliverable
    "events_cusum_changepoint",  # r10 late: telescoped CUSUM windows
    "split_leakage_safe",  # r10 late: dedup-group-keyed split coin
    "text_phrase_search",  # r10 late: positional posting intersection
    "text_phrase_indexed",  # r10 late: phrase served from stored index
    "scd2_backfill_merge",  # r10 late: mid-history splice, full oracle
    # --- stalest driver rows (last checked r5/r6), staleness rotation ---
    "multimodal_jpeg_roundtrip",
    "multimodal_quarantine_pipeline",
    "multimodal_video_roundtrip",
    "multimodal_wav_roundtrip",
    "nested_flatten_struct",
    "posexplode_with_ordinality",
    "quality_bigram_logprob",
    "quality_unigram_logprob",
    "reconcile_checksum_orders",
    "salted_agg_revenue_by_flag",
    "sample_exact_per_group",
    "sessionize_per_event",
    "skew_report_orders_custkey",
    "split_train_val_test",
    "string_advanced_functions",
    "text_bm25_scores",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_top_bigrams_per_lang",
    "versioned_change_feed",
    "vocab_token_frequencies",
    "window_cumulative_distinct_users",
    "agg_cube_flag_status",
    "agg_exact_percentiles",
    "agg_group_stats",
    "agg_pivot_status_by_priority",
    "agg_rollup_region_nation",
    "ann_ivf_recall",
    "approx_distinct_stats",
    "array_agg_sorted_orders",
    # (15 stale slots displaced by this round's new queries — the
    # rotation resumes with them next round; ledger keeps their ranks)
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
