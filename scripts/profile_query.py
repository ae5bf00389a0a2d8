"""Profile one registry query's driver-side cost: wall time, Spark job
count, and (optionally) cProfile of the driver process.

Usage:
  python scripts/profile_query.py <query> [--sf DIR] [--reps N] [--cprofile]

Runs the query like bench.py does (warm-up + timed reps, median), but
additionally reports the number of Spark jobs the query submitted and,
with --cprofile, the top driver-side cumulative entries — the tool for
finding fixed per-query driver costs (guide §5: the driver should do
almost no data work; VERDICT r12 'Next round' #2).
"""

from __future__ import annotations

import argparse
import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cprofile", action="store_true")
    args = ap.parse_args()

    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("profile", shuffle_partitions=max(cpus, 8))
    spark.range(1).count()
    spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
        "l_returnflag"
    ).count().collect()

    q = REGISTRY[args.query]
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm-up rep (bench methodology)
    q.fn(spark, args.sf).count()
    spark.catalog.clearCache()

    samples = []
    for rep in range(args.reps):
        jobs_before = max(tracker.getJobIdsForGroup(None) or [0])
        prof = cProfile.Profile() if (args.cprofile and rep == 0) else None
        t0 = time.time()
        if prof:
            prof.enable()
        df = q.fn(spark, args.sf)
        df.count()
        if prof:
            prof.disable()
        dt = time.time() - t0
        jobs_after = max(tracker.getJobIdsForGroup(None) or [0])
        samples.append(dt)
        print(
            f"# rep {rep}: {dt:.3f}s, ~{jobs_after - jobs_before} jobs",
            file=sys.stderr,
        )
        spark.catalog.clearCache()
        del df
        import gc

        gc.collect()
        sc._jvm.System.gc()
        if prof:
            st = pstats.Stats(prof)
            st.sort_stats("cumulative")
            print("== top cumulative (driver) ==", file=sys.stderr)
            st.stream = sys.stderr
            st.print_stats(30)

    med = sorted(samples)[len(samples) // 2]
    print(f"{args.query}: median {med:.3f}s of "
          f"[{'/'.join(f'{s:.2f}' for s in sorted(samples))}]")


if __name__ == "__main__":
    main()
