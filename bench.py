"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is executed to completion (count + a cheap checksum action via
collect of the aggregated result — all headline queries return small
results) after a warm-up of the session. Wall time per query includes
plan + execution, excluding session startup.

Each query runs $SPARK_GRAFT_BENCH_REPS times (default 3) and reports
the MEDIAN — a single co-tenant load spike on the bench machine must not
masquerade as a round-over-round regression (the recorded r2 artifact
was 2x inflated by exactly that).
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
    # round 3 additions (dedup_corpus_keep is NOT benched: it is
    # duplicate_clusters_star + one broadcast anti-join, so timing it
    # would double-count the heaviest path for no new signal)
    "quality_unigram_logprob",
    "dedup_containment_pairs",
    "dedup_duplicated_span_stats",
    "text_token_entropy",
    "graph_triangle_suppliers",
    # round 4 additions: association mining (AQE-decided count joins,
    # the cleared r3 broadcast flag), the real PNG codec roundtrip
    # (Python-side Arrow stage throughput), ExactSubstr span removal,
    # and canonical-URL dedup
    "mining_part_pair_lift",
    "multimodal_png_roundtrip",
    "dedup_remove_duplicated_spans",
    "dedup_url_canonical",
    # round 5 addition: the real baseline JPEG codec roundtrip
    # (Python-side huffman+DCT throughput in an Arrow stage)
    "multimodal_jpeg_roundtrip",
    # round 6 additions: Misra-Gries candidate pass + exact verify
    # (Arrow mapInArrow summaries), hybrid BM25+cosine RRF fusion, and
    # the two-level-manifest pruning readout (metadata-path cost)
    "sketch_mg_heavy_hitters_exact",
    "retrieval_hybrid_rrf",
    "versioned_chunked_pruning",
    # round 7 additions: full progressive-JPEG decode (the heaviest
    # Python/Arrow codec stage), MERGE INTO (clause join + touched-file
    # rewrite + commit), and merge-on-read DELETE (DV write + DV-applied
    # read + time travel) — the new lakehouse DML hot paths
    "multimodal_progressive_roundtrip",
    "versioned_merge_into",
    "versioned_deletion_vectors",
    # round 8 additions: merge-on-read MERGE (DV write + image appends),
    # the banded interval-overlap join (explode fan-out + bin join), and
    # the rolling-distinct explode pattern
    "versioned_merge_dv",
    "join_interval_overlap_shipments",
    "events_trailing_distinct_users",
    # round 9 additions: persisted-IVF build+serve (index write + pruned
    # probe join), the Iceberg metadata round trip (Avro codec + adopt),
    # and the REAL streaming rolling distinct (watermarked dedup+agg)
    "ann_ivf_indexed_topk",
    "iceberg_metadata_adoption",
    "stream_trailing_distinct_users",
    # round 10 additions: DV'd history -> position-delete export +
    # adoption (the heaviest new interop circle), the stateful
    # streaming funnel (applyInPandasWithState under a full oracle),
    # and foreign equality-delete adoption (key-scan materialization)
    "iceberg_position_deletes",
    "stream_funnel_conversion",
    "iceberg_equality_deletes",
    # round 10 (late): SCD2 full-history build — three window stages
    # over one key shuffle (the dimensional-modeling family's heaviest
    # representative; the PIT join is the same plan + one as-of pass)
    "scd2_user_tier_history",
    # round 11: the three late-r10 queries that missed BENCH_FULL_r10
    # (VERDICT r10 ask #5) + the regime-aware dedup routers (ask #1 —
    # probe cost + the widened exact tier are the numbers that matter)
    "scd2_backfill_merge",
    "text_phrase_search",
    "text_phrase_indexed",
    "dedup_auto_tier",
    "dedup_containment_auto_tier",
    # round 11: PQ — compressed-code ADC scan + exact rerank (the new
    # ANN compression tier; the rerank form is the production serve)
    "ann_pq_rerank_topk",
    # round 12 additions: the PRODUCTION PQ serve (k-means codebooks +
    # Arrow encode — the path a real corpus runs, vs the stride/literal
    # oracle twin above), the capped-blocking FS linkage (the probe +
    # salt-routing cost is the number that matters), and the DOULION
    # sampled-triangle estimator (the dense-graph scale path next to
    # exact graph_triangle_suppliers)
    "ann_pq_kmeans_rerank_topk",
    "linkage_fs_match_patterns",
    "graph_triangle_sampled_estimate",
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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    warmup = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1")))
    for name in BENCH_QUERIES:
        q = REGISTRY[name]
        # untimed warm-up rep(s): rep 1 of a cold query runs ~2.8x
        # steady state (codegen + broadcast build + page cache) — the
        # exact noise class behind the r4 winnowing and r5
        # ann_brute_force false movers (VERDICT r5 watch item #1)
        for _ in range(warmup):
            q.fn(spark, sf_dir).count()
            spark.catalog.clearCache()
        samples: list[float] = []
        n = 0
        for _ in range(reps):
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            n = df.count()
            samples.append(time.time() - t0)
            # drop blocks persisted inside the measured query: later
            # queries (and the next rep) must not pay eviction churn for
            # earlier caches (read_table scans are plain, unaffected)
            spark.catalog.clearCache()
            # localCheckpoint blocks (iterative CC, jaccard single-pass
            # shingles) are only freed by ContextCleaner once the Python
            # DataFrame refs die — force that now, or reps accumulate
            # executor storage and later reps measure eviction, not the
            # query (observed: 10s -> 22s -> 31s without this)
            del df
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        shown = "/".join(f"{s:.2f}" for s in sorted(samples))
        print(f"# {name}: {n} rows, median {timings[name]}s of [{shown}]", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = 0.1 if "sf0.1" in sf_dir else (0.01 if "sf0.01" in sf_dir else sf_dir)
    out = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # Env-factor normalization vs the newest committed BENCH_r*.json
    # (VERDICT r10 ask #3: BENCH_r10 read as a phantom 1.6x regression
    # because only BENCH_FULL carried the measured host drift). Median
    # current/prior ratio over shared non-trivial queries estimates
    # uniform host drift, clamped to the same plausible band benchfull
    # uses; the artifact then explains itself: raw total, normalized
    # total, and the normalized vs-prior ratio on shared queries.
    out.update(_env_normalize(timings, sf))
    # The driver snapshots only the LAST 2000 BYTES of stdout and
    # parses the JSON line from that window: r11's line grew past it
    # (50 queries + env fields) and the artifact recorded parsed=None.
    # Emit the one stdout line COMPACT (no spaces, 2-decimal query
    # times — the 1-centisecond loss is far below run-to-run noise)
    # and mirror the full-precision object to BENCH_LOCAL.json for
    # humans and the round notes.
    full = dict(out)
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, "BENCH_LOCAL.json"), "w") as fh:
            json.dump(full, fh, indent=1)
            fh.write("\n")
    except OSError:
        pass
    out["queries"] = {k: round(v, 2) for k, v in timings.items()}
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:  # keep headroom inside the 2000-byte window
        # drop the least essential env diagnostics first, never queries
        for k in ("shared_prior_sec", "shared_total_sec", "prior_artifact",
                  "env_factor_raw", "normalized_total_sec"):
            out.pop(k, None)
            line = json.dumps(out, separators=(",", ":"))
            if len(line) <= 1900:
                break
    print(line)


def _current_round(here: str) -> int | None:
    """The in-progress round, derived from the newest graded artifact:
    CORRECTNESS_r{N}.json exists only once round N has been driven, so
    while round N+1 is being built the max is N. Used to exclude the
    current round's own BENCH artifact from prior selection (ADVICE
    r11: once the driver writes BENCH_r{N}.json, a same-round re-run
    would otherwise normalize against itself and mask drift)."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r[0-9]*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds) + 1 if rounds else None


def _recover_tail(wrapper: dict) -> dict | None:
    """Salvage a prior artifact whose JSON line outgrew the driver's
    2000-byte stdout window (BENCH_r11: parsed=None, the line's head
    cut off). The per-query dict survives intact in the captured tail
    — extract the balanced ``"queries": {...}`` fragment and pair it
    with the wrapper's sf."""
    tail = wrapper.get("tail") or ""
    i = tail.find('"queries"')
    if i < 0:
        return None
    j = tail.find("{", i)
    if j < 0:
        return None
    depth, k = 0, j
    for k in range(j, len(tail)):
        if tail[k] == "{":
            depth += 1
        elif tail[k] == "}":
            depth -= 1
            if depth == 0:
                break
    else:
        return None
    try:
        queries = json.loads(tail[j:k + 1])
    except json.JSONDecodeError:
        return None
    if not isinstance(queries, dict) or not queries:
        return None
    return {"sf": wrapper.get("sf"), "queries": queries}


def _select_prior(sf) -> tuple[dict | None, str | None]:
    """The prior-round artifact env normalization compares against:
    newest BENCH_r{N}.json at the same sf with N below the current
    round (numeric sort — lexicographic breaks past r99; exclusion of
    the current round per ADVICE r11), salvaging clipped artifacts via
    _recover_tail. Split out so tests normalize against the SAME
    artifact the production path picks (the r12 test broke by assuming
    the prior was forever r10)."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    cur = _current_round(here)
    arts = sorted(
        (
            p
            for p in glob.glob(os.path.join(here, "BENCH_r[0-9]*.json"))
            if (m := re.search(r"BENCH_r(\d+)\.json$", p))
            and (cur is None or int(m.group(1)) < cur)
        ),
        key=lambda p: int(re.search(r"BENCH_r(\d+)\.json$", p).group(1)),
    )
    for p in reversed(arts):
        try:
            cand = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        # the driver wraps bench.py's JSON line under "parsed"
        cand = cand.get("parsed") or _recover_tail(cand) or cand
        if cand.get("sf") == sf and cand.get("queries"):
            return cand, os.path.basename(p)
    return None, None


def _env_normalize(timings: dict[str, float], sf) -> dict:
    prior, prior_path = _select_prior(sf)
    if prior is None:
        return {}
    pq = prior["queries"]
    shared = [n for n in timings if pq.get(n, 0) > 0.2]
    if len(shared) < 5:
        return {}
    ratios = sorted(timings[n] / pq[n] for n in shared)
    raw = round(ratios[len(ratios) // 2], 3)
    env = min(max(raw, 0.7), 1.4)
    shared_now = round(sum(timings[n] for n in shared), 3)
    shared_then = round(sum(pq[n] for n in shared), 3)
    return {
        "env_factor": env,
        "env_factor_raw": raw,
        "prior_artifact": prior_path,
        "shared_queries": len(shared),
        "shared_total_sec": shared_now,
        "shared_prior_sec": shared_then,
        "normalized_total_sec": round(sum(timings.values()) / env, 3),
        "normalized_vs_prior_shared": round(
            (shared_now / env) / shared_then, 3
        ) if shared_then else None,
    }


if __name__ == "__main__":
    main()
