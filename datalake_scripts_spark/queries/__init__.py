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
    # --- round-9 additions (their only chance at a first driver row) ---
    "ann_ivf_indexed_topk",  # persisted IVF index, stride-twin oracle
    "iceberg_metadata_adoption",  # Iceberg v2 export -> adopt round trip
    "stream_trailing_distinct_users",  # REAL streaming query, full oracle
    # --- stalest driver rows (last checked r4/r5), staleness rotation ---
    "mining_part_pair_lift",
    "multimodal_decode_stub",
    "multimodal_frame_sample",
    "multimodal_png_roundtrip",
    "nested_explode_outer_preserves_parents",
    "null_handling_semantics",
    "pack_sequences_greedy",
    "profile_table_stats",
    "q11_important_part_values",
    "q12_priority_line_classes",
    "q20_excess_stock_suppliers",
    "q2_min_cost_supplier",
    "q4_priority_with_late_lines",
    "q9_product_type_profit",
    "salted_join_segment_revenue",
    "sketch_cms_heavy_hitters",
    "sketch_hll_union_rollup",
    "sketch_kll_price_quantiles",
    "sketch_theta_customer_reach",
    "ts_parse_epoch_seconds",
    "udtf_chunk_documents",
    "window_range_frame",
    "agg_histogram_equidepth",
    "agg_ordered_statistics",
    "ann_ivf_kmeans_topk",
    "ann_ivf_topk_vectorized",
    "array_compose_flatten_zip",
    "cap_docs_per_domain",
    "corpus_source_overlap",
    "decontaminate_embedding_benchmark",
    "dedup_containment_pairs",
    "dedup_corpus_keep",
    "dedup_exact_full_text",
    "dedup_fingerprint_token_set",
    "dedup_keep_best_quality",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_remove_duplicated_spans",
    "dedup_simhash",
    "dedup_url_canonical",
    "dedup_winnowing_pairs",
    "eval_langid_per_class",
    "history_latest_snapshot",
    "join_full_outer_nation_presence",
    "json_serialize_roundtrip",
    "map_functions_and_regex_all",
    "mixture_weighted_sample",
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
