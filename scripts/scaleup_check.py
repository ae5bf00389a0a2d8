"""Scale-up sanity experiment: replicate sf0.1 k-fold (key-space
shifted so join/agg cardinalities grow realistically, not just row
counts) into /tmp, then time the headline queries.

What "healthy" looks like (measured at k=10, local[32]):
- scan+agg (q1), broadcast enrichment, windowed events: ~flat
  (fixed overhead dominates; work is embarrassingly parallel);
- multi-join q5: near-linear (its two large shuffle joins are the
  genuine data-proportional cost) — linear, not super-linear, is the
  pass criterion; a blow-up here means a join degenerated (lost
  broadcast, skew, or a cross product).

Usage: python scripts/scaleup_check.py [k] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "join_broadcast_brand_revenue",
    "events_tumbling_hourly",
    "window_running_spend",
    "dedup_exact_subset_keys",
]


def main() -> None:
    from pyspark.sql import functions as F

    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.session import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    names = sys.argv[2:] or DEFAULT_QUERIES
    src, dst = "/root/testdata/sf0.1", f"/tmp/sfx{k}_synth"

    spark = get_spark("scaleup", shuffle_partitions=32)
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)

    replicate = {
        "lineitem": "l_orderkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "customer": "c_custkey",
        # id-shifted replicas for the LLM-ops tables; texts/vectors stay
        # identical, so PAIR-producing ops (dedup_*_pairs) blow up
        # quadratically by construction — time per-doc/per-query ops
        # (text_winnowing_fingerprint, ann_*_topk) here, not pair ops
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    t0 = time.time()
    for name in ["region", "nation", "supplier", "part"]:
        shutil.copy(f"{src}/{name}.parquet", f"{dst}/{name}.parquet")
    for name, key in replicate.items():
        df = spark.read.parquet(f"{src}/{name}.parquet")
        n = df.agg(F.max(key)).first()[0] + 1
        rep = (
            df.crossJoin(spark.range(k).withColumnRenamed("id", "_rep"))
            .withColumn(key, F.col(key) + F.col("_rep") * n)
        )
        if name == "orders":
            rep = rep.withColumn(
                "o_custkey", F.col("o_custkey") + F.col("_rep") * 150000
            )
        rep.drop("_rep").write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
    print(f"# replication x{k} done in {time.time() - t0:.1f}s")

    spark.read.parquet(f"{dst}/lineitem.parquet").count()  # warm
    for name in names:
        t0 = time.time()
        cnt = REGISTRY[name].fn(spark, dst).count()
        print(f"{name}: {cnt} rows in {time.time() - t0:.2f}s (sf0.1 x{k})")


if __name__ == "__main__":
    main()
