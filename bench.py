"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count + a cheap checksum action via
collect of the aggregated result — all headline queries return small
results) after a warm-up of the session. Wall time per query includes
plan + execution, excluding session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The first 12 are the stable round-over-round set (BENCH_r01 baseline);
# compare totals on this shared prefix. Entries after it extend coverage
# to the heaviest operators of later rounds without breaking
# comparability.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_brand_revenue",
    "window_running_spend",
    "events_tumbling_hourly",
    "dedup_exact_subset_keys",
    "dedup_embedding_cosine",
    "ann_brute_force_topk",
    "text_quality_scores",
    "q10_returned_revenue",
    "dedup_minhash_lsh",
    # round 2 additions
    "dedup_winnowing_pairs",
    "dedup_duplicate_clusters_star",
    "nested_flatten_struct",
    "dedup_paragraph_chunks",
    "text_tfidf_top_terms",
    "sketch_hll_union_rollup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from datalake_scripts_spark.session import get_spark
    from datalake_scripts_spark.queries import REGISTRY

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("bench", shuffle_partitions=max(cpus, 8))

    # warm the JVM (parquet reader, codegen, shuffle machinery) so
    # per-query numbers measure the queries, not one-time JIT cost
    spark.range(1).count()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        t0 = time.time()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
        # drop blocks persisted inside the measured query: later queries
        # must not pay eviction churn for earlier queries' caches (the
        # cached-table reads via read_table are plain scans, unaffected)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else sf_dir)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
