"""Per-query shuffle-volume report: run selected registry queries and
print bytes shuffled (write side) and spilled per query, from Spark's
status REST API. The 'measure, don't guess' companion to bench.py —
wall time tells you WHAT is slow, shuffle bytes tell you WHY (a query
whose shuffle grows super-linearly with SF is the one that melts at
100 TB, even if it is fast today).

Usage: python scripts/shufflestats.py [sf_dir] [query ...]
Defaults: sf0.1 and the bench headliner set.
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession

    from datalake_scripts_spark.queries import REGISTRY

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or [
        "q1_pricing_summary",
        "q5_local_supplier_volume",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_containment_pairs",
        "graph_triangle_suppliers",
        "text_bm25_scores",
        "keys_surrogate_orders",
    ]
    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .appName("shufflestats")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4057")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    ui = spark.sparkContext.uiWebUrl
    app_id = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    def stage_totals():
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
            )
        )
        w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
        spill = sum(s.get("diskBytesSpilled", 0) for s in stages)
        return w, spill

    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()  # warm
    print(f"# {len(names)} queries at {sf_dir}")
    for name in names:
        before_w, before_s = stage_totals()
        REGISTRY[name].fn(spark, sf_dir).count()
        after_w, after_s = stage_totals()
        print(
            f"{name}: shuffle_write={(after_w - before_w) / 1e6:.1f} MB "
            f"spill={(after_s - before_s) / 1e6:.1f} MB"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
