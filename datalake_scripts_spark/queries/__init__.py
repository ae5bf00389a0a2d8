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
# whole graded surface through the checked window. Round-5 plan
# (VERDICT r4 ask #2, docs/r5_rotation_plan.md): 3 long-green
# canaries + ALL 40 never-driver-checked names (36 oracle-backed +
# the 4 documented rows-only engine-specific paths, whose md5/oracle
# twins are already driver-green) + the 4 round-5 additions (JPEG
# roundtrip, quarantine pipeline, change feed, video roundtrip) + 3
# previously-green family-head sentinels to fill the window — after
# this round every registry entry has a driver row. The committed
# ledger
# ``docs/driver_checked.json`` (name -> first green round, rebuilt by
# scripts/presnapshot.py from every CORRECTNESS_r*.json) is the
# source of truth for what "never checked" means.
DRIVER_PRIORITY = [
    # canaries — green since round 1 (one relational, one
    # normalization, one dedup: a regression in any family head trips
    # at least one)
    "q1_pricing_summary",
    "nested_flatten_struct",
    "dedup_ngram_jaccard",
    # --- the 36 oracle-backed never-checked names ---
    # aggregation / relational long tail
    "agg_histogram_equidepth",
    "agg_ordered_statistics",
    "join_full_outer_nation_presence",
    "salted_agg_revenue_by_flag",
    "skew_report_orders_custkey",
    "reconcile_checksum_orders",
    "window_cumulative_distinct_users",
    "sessionize_per_event",
    "sample_exact_per_group",
    # functions kit
    "array_compose_flatten_zip",
    "map_functions_and_regex_all",
    "string_advanced_functions",
    "json_serialize_roundtrip",
    "posexplode_with_ordinality",
    # dedup family remainder
    "dedup_exact_full_text",
    "dedup_fingerprint_token_set",
    "dedup_keep_best_quality",
    "dedup_corpus_keep",
    "dedup_winnowing_pairs",
    "dedup_remove_duplicated_spans",
    "dedup_url_canonical",
    # LLM-corpus curation / quality
    "cap_docs_per_domain",
    "corpus_source_overlap",
    "decontaminate_embedding_benchmark",
    "eval_langid_per_class",
    "mixture_weighted_sample",
    "split_train_val_test",
    "quality_unigram_logprob",
    "quality_bigram_logprob",
    "vocab_token_frequencies",
    "text_bm25_scores",
    "text_pii_scrub",
    "text_repetition_stats",
    "text_top_bigrams_per_lang",
    # multimodal / versioned-lake remainder
    "multimodal_wav_roundtrip",
    "multimodal_jpeg_roundtrip",  # new r5: real baseline JPEG codec
    "multimodal_quarantine_pipeline",  # new r5: poison-pill lane e2e
    "versioned_change_feed",  # new r5: CDF row-diff, driver-checked
    "multimodal_video_roundtrip",  # new r5: real MJPEG-AVI frame path
    "history_latest_snapshot",
    # --- the 4 rows-only engine-specific paths (weaker rows check;
    # their md5/oracle twins are already driver-green) ---
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_ivf_topk_vectorized",
    "ann_ivf_kmeans_topk",
    # --- 3 previously-green family-head sentinels (regression
    # tripwires for the families the 40 above don't touch) ---
    "q5_local_supplier_volume",
    "join_broadcast_brand_revenue",
    "dedup_containment_pairs",
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
