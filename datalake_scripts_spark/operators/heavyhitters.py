"""Exact distributed heavy hitters via Misra-Gries candidate summaries
plus an exact verification pass.

The problem at 100 TB: "which items occur in more than 1/k of all
rows" over a column whose cardinality is far larger than memory
(user ids, URLs, shingles). A plain ``groupBy(col).count()`` shuffles
the ENTIRE key space. The classical two-pass answer (Misra & Gries
1982; mergeable-summaries formulation of Agarwal et al., PODS 2012):

1. Every partition builds a Misra-Gries summary of capacity ``k`` —
   a dict of at most ``k`` counters maintained with the merge-then-
   prune rule (add exact batch counts, then subtract the (k+1)-th
   largest counter from all and drop the non-positive). A summary of a
   partition with ``n_p`` rows undercounts any item by at most
   ``n_p / (k + 1)``, so every item with partition frequency above
   that survives. Summing over partitions: any item with GLOBAL
   frequency > N/(k+1) must exceed the bound in at least one
   partition, so the union of per-partition candidate sets is a
   guaranteed superset of the true heavy hitters. The union is at most
   ``k × partitions`` rows — the only shuffle this pass does.
2. An exact second pass counts ONLY the candidates (broadcast
   semi-join; every non-candidate row is filtered map-side) and
   applies the exact threshold ``count * k > N``. The candidate SET
   depends on partitioning (Misra-Gries state is order-sensitive) but
   the final output never does: superset guarantee + exact recount +
   exact integer threshold = deterministic, partition-independent,
   equal to the brute-force groupBy — which is exactly what the
   DuckDB oracle runs.

The summary pass is ``mapInArrow`` (Arrow batches, vectorized
``value_counts`` per batch — no per-row Python), per the repo's UDF
policy.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CAND_SCHEMA = "item string, lb bigint"


def _mg_merge_prune(counters: dict, batch_counts, k: int) -> dict:
    """Mergeable-summaries step: add exact batch counts, then if more
    than k counters remain, subtract the (k+1)-th largest from all and
    drop the non-positive (Agarwal et al. 2012, §3)."""
    for item, c in batch_counts.items():
        counters[item] = counters.get(item, 0) + int(c)
    if len(counters) > k:
        vals = sorted(counters.values(), reverse=True)
        m = vals[k]  # (k+1)-th largest
        counters = {i: c - m for i, c in counters.items() if c > m}
    return counters


def mg_candidate_summaries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries of ``df[col]``: at most ``k``
    (item, lower-bound-weight) rows per partition. Map-side only — the
    output is summary-sized, never data-sized."""

    def summarize(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counters: dict = {}
        for batch in batches:
            s = batch.column(0).to_pandas().value_counts()
            counters = _mg_merge_prune(counters, s.to_dict(), k)
        if counters:
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(list(counters.keys()), type=pa.string()),
                    pa.array([int(v) for v in counters.values()], type=pa.int64()),
                ],
                names=["item", "lb"],
            )

    return df.select(F.col(col).cast("string").alias("item")).mapInArrow(
        summarize, _CAND_SCHEMA
    )


def heavy_hitters_exact(df: DataFrame, col: str, k: int) -> DataFrame:
    """All items of ``df[col]`` with frequency strictly above N/k,
    with EXACT counts — two passes, no full-key-space shuffle.

    Returns (item, freq, share) sorted by (freq desc, item). The
    threshold compare is pure integers (``freq * k > N``); share is one
    double division of exact parts (hash-safe per the repo contract).
    """
    items = df.select(F.col(col).cast("string").alias("item"))
    cand = mg_candidate_summaries(df, col, k).select("item").distinct()
    tot = items.agg(F.count(F.lit(1)).alias("n"))
    exact = (
        # bcast: <= k x partitions candidate rows (MG summary union)
        items.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    # bcast: O(1) totals row (lazy scalar attach)
    return (
        exact.crossJoin(F.broadcast(tot))
        .filter(F.col("freq") * F.lit(k) > F.col("n"))
        .select(
            "item",
            F.col("freq").cast("bigint").alias("freq"),
            (F.col("freq").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.desc("freq"), "item")
    )
