"""Full-registry bench sweep (VERDICT r4 ask #5): per-query medians
over EVERY registry entry, not just the 27 bench.py headliners — the
r4 round's only >30% mover (winnowing) was caught solely because it
happened to be a headliner; this artifact makes movers visible
registry-wide.

    python scripts/benchfull.py [--out BENCH_FULL_rNN.json] [--sf DIR]

Writes ``{"sf": ..., "reps": R, "queries": {name: median_sec}}`` and
diffs against the newest previously-committed BENCH_FULL_r*.json:
queries moving >1.5x AND >0.5 s absolute (both filters — sub-second
entries jitter past 1.5x on any loaded machine) are listed loudly and
the exit code is 1 so presnapshot can refuse to ship an unexplained
regression. Spark-side only (the DuckDB oracle half of selfcheck is
correctness, not throughput)."""

from __future__ import annotations

import argparse
import gc
import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATIO = 1.5
ABS_DELTA_S = 0.5


def newest_prior(out_path: str) -> str | None:
    """Newest prior artifact of the SAME scale family: sf0.1 sweeps
    (``_sf01`` suffix) only diff against sf0.1 sweeps — a cross-scale
    diff would flag every query as a 10x mover."""
    want_sf01 = out_path.endswith("_sf01.json")
    arts = sorted(
        p for p in glob.glob("BENCH_FULL_r*.json")
        if os.path.abspath(p) != os.path.abspath(out_path)
        and p.endswith("_sf01.json") == want_sf01
    )
    return arts[-1] if arts else None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--warmup", type=int, default=1,
        help="untimed reps before the timed ones — rep 1 runs ~2.8x "
             "steady state (codegen + JIT + page cache), the exact "
             "noise class behind the r4/r5 false movers",
    )
    args = ap.parse_args()
    out_path = args.out
    if out_path is None:
        # current round = max(newest driver correctness artifact + 1,
        # newest BENCH_FULL artifact): repeated runs within a round
        # OVERWRITE the same file instead of minting a phantom
        # next-round artifact — including after the round's OWN
        # correctness artifact lands (ADVICE r5: CORRECTNESS_r05 +
        # BENCH_FULL_r05 both present must re-target r05, not r06)
        def _rounds(pattern: str) -> list[int]:
            return [
                int(m.group(1))
                for p in glob.glob(pattern)
                if (m := re.search(r"_r(\d+)(?:_|\.json)", p))
            ]

        corr = _rounds("CORRECTNESS_r*.json")
        full = _rounds("BENCH_FULL_r*.json")
        rnd = max(
            (max(corr) + 1 if corr else 1), (max(full) if full else 1)
        )
        suffix = "_sf01" if "sf0.1" in args.sf else ""
        out_path = f"BENCH_FULL_r{rnd:02d}{suffix}.json"

    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("benchfull", shuffle_partitions=max(cpus, 8))
    spark.range(1).count()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()

    timings: dict[str, float] = {}
    for name, q in REGISTRY.items():
        for _ in range(args.warmup):
            q.fn(spark, args.sf).count()
            spark.catalog.clearCache()
        samples = []
        for _ in range(args.reps):
            t0 = time.time()
            df = q.fn(spark, args.sf)
            df.count()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)

    artifact = {
        "sf": args.sf,
        "reps": args.reps,
        "warmup": args.warmup,
        "total_sec": round(sum(timings.values()), 2),
        "queries": timings,
    }
    prior_path = newest_prior(out_path)
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(timings)} queries, "
          f"total {artifact['total_sec']}s")

    if prior_path is None:
        print("no prior BENCH_FULL artifact — baseline established")
        return 0
    prior = json.load(open(prior_path))["queries"]
    movers = []
    for name, now in timings.items():
        then = prior.get(name)
        if then is None or then <= 0:
            continue
        if now > then * RATIO and now - then > ABS_DELTA_S:
            movers.append((name, then, now))
    movers.sort(key=lambda m: m[2] - m[1], reverse=True)
    print(f"diff vs {prior_path}: {len(movers)} regressions "
          f"(>{RATIO}x and >{ABS_DELTA_S}s)")
    for name, then, now in movers:
        print(f"  REGRESSED {name}: {then}s -> {now}s ({now / then:.2f}x)")
    return 1 if movers else 0


if __name__ == "__main__":
    raise SystemExit(main())
