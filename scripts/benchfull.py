"""Full-registry bench sweep (VERDICT r4 ask #5): per-query medians
over EVERY registry entry, not just the 27 bench.py headliners — the
r4 round's only >30% mover (winnowing) was caught solely because it
happened to be a headliner; this artifact makes movers visible
registry-wide.

    python scripts/benchfull.py [--out BENCH_FULL_rNN.json] [--sf DIR]

Writes ``{"sf": ..., "reps": R, "queries": {name: median_sec}}`` and
diffs against the newest previously-committed BENCH_FULL_r*.json:
queries moving >1.5x AND >0.5 s absolute (both filters — sub-second
entries jitter past 1.5x on any loaded machine) are flagged. Flagged
movers are then AUTO-RE-TIMED in a fresh isolated JVM (VERDICT r9 ask
#6 — r7/r8/r9 each burned judge+builder time refuting phantom movers
caused by in-sweep session ordering); the artifact carries both lists
(``{"flagged": [...], "confirmed": [...]}``, each entry
``[name, prior_s, sweep_s, isolated_s]``) and the exit code keys on
``confirmed`` only. Two r11 additions: (a) a non-fatal ``watch`` lane
for sub-ABS-floor queries whose isolated ratio still clears 2x the
env-adjusted prior (the floor otherwise blinds the gate to regressions
on sub-0.7 s queries), and (b) the env factor is clamped to a
plausible host-drift band with a loud ``env_warning`` when the median
itself moves beyond it (an across-the-board regression must not be
absorbed as drift). Spark-side only (the DuckDB oracle half of
selfcheck is correctness, not throughput)."""

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
# Relative-only "watch" lane (VERDICT r10 ask #6): the ABS floor keeps
# sub-second jitter out of the fatal gate, but it also blinds the gate
# to a genuine 3x regression on any query under ~0.7 s. Queries whose
# ISOLATED ratio clears WATCH_RATIO x the env-adjusted prior but miss
# the ABS floor are reported in the artifact as ``watch`` — non-fatal,
# gate semantics unchanged.
WATCH_RATIO = 2.0
# Plausible host-drift band (ADVICE r10): an env factor outside this is
# no longer "uniform host drift" — it is an across-the-board regression
# (or improvement) that median-normalization would otherwise absorb
# silently. The factor is clamped and the artifact carries a loud
# ``env_warning``. (r10's measured real VM drift was 1.25-1.35, so the
# band must sit outside that.)
ENV_CLAMP = (0.7, 1.4)


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


def _time_queries(spark, names, sf: str, warmup: int, reps: int,
                  quiet: bool = False) -> dict[str, float]:
    """Median wall time per named query on an already-warm session."""
    from datalake_scripts_spark.queries import REGISTRY

    timings: dict[str, float] = {}
    for name in names:
        q = REGISTRY[name]
        for _ in range(warmup):
            q.fn(spark, sf).count()
            spark.catalog.clearCache()
        samples = []
        for _ in range(reps):
            t0 = time.time()
            df = q.fn(spark, sf)
            df.count()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        timings[name] = round(sorted(samples)[len(samples) // 2], 3)
        if not quiet:
            print(f"# {name}: {timings[name]}s", file=sys.stderr,
                  flush=True)
    return timings


def _retime_isolated(names: list[str], sf: str, warmup: int,
                     reps: int) -> dict[str, float]:
    """Re-time just ``names`` in a FRESH subprocess JVM — the exact
    manual recipe the judge used to refute the r7/r8/r9 phantom
    movers, encoded (VERDICT r9 ask #6). Falls back to in-process
    timings (conservative: confirms the flag) if the subprocess
    fails."""
    import subprocess

    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--retime", ",".join(names), "--sf", sf,
        "--warmup", str(warmup), "--reps", str(reps),
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=1800,
        )
        last = proc.stdout.strip().splitlines()[-1]
        return {k: float(v) for k, v in json.loads(last).items()}
    except Exception as exc:  # noqa: BLE001 — gate must stay conservative
        print(f"isolated re-time failed ({exc}); keeping sweep numbers",
              file=sys.stderr)
        return {}


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
    ap.add_argument(
        "--retime", default=None, metavar="NAMES",
        help="internal: time only these comma-separated queries and "
             "print one JSON line (used by the mover auto-verifier)",
    )
    ap.add_argument(
        "--no-isolate", action="store_true",
        help="skip the isolated re-time pass (gate on raw sweep flags)",
    )
    args = ap.parse_args()

    if args.retime:
        from datalake_scripts_spark.session import get_spark

        cpus = int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8)
        )
        spark = get_spark("benchfull-retime",
                          shuffle_partitions=max(cpus, 8))
        spark.range(1).count()
        spark.read.parquet(f"{args.sf}/lineitem.parquet").groupBy(
            "l_returnflag"
        ).count().collect()
        t = _time_queries(spark, args.retime.split(","), args.sf,
                          args.warmup, args.reps, quiet=True)
        print(json.dumps(t))
        return 0
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

    timings = _time_queries(spark, list(REGISTRY), args.sf,
                            args.warmup, args.reps)

    artifact = {
        "sf": args.sf,
        "reps": args.reps,
        "warmup": args.warmup,
        "total_sec": round(sum(timings.values()), 2),
        "queries": timings,
    }
    prior_path = newest_prior(out_path)

    flagged, confirmed, watch = [], [], []
    env_factor = env_factor_raw = 1.0
    env_warning = None
    if prior_path is not None:
        prior = json.load(open(prior_path))["queries"]
        # Environment factor: the prior artifact was taken under a
        # possibly different machine state (the r7-r10 phantom-mover
        # ritual traced every time to exactly this). The MEDIAN
        # current/prior ratio over all shared, non-trivial queries is
        # a robust estimate of uniform host drift — a real plan
        # regression moves one query, not the median of 200. Movers
        # are judged against the env-adjusted prior. The factor is
        # CLAMPED to a plausible host-drift band: a median ratio
        # outside it is an across-the-board regression, not drift,
        # and must not be normalized away (ADVICE r10).
        ratios = sorted(
            timings[n] / prior[n]
            for n in timings
            if prior.get(n, 0) > 0.2 and n in timings
        )
        if len(ratios) >= 10:
            env_factor_raw = round(ratios[len(ratios) // 2], 3)
            env_factor = min(max(env_factor_raw, ENV_CLAMP[0]),
                             ENV_CLAMP[1])
            if env_factor != env_factor_raw:
                env_warning = (
                    f"median current/prior ratio {env_factor_raw} is "
                    f"outside the host-drift band {ENV_CLAMP}: this is "
                    f"an across-the-board change, not environment — "
                    f"factor clamped to {env_factor}; investigate "
                    f"session config / versioned-layer / JVM changes"
                )
                print(f"WARNING: {env_warning}", file=sys.stderr)
        watch_cand = []
        for name, now in timings.items():
            then = prior.get(name)
            if then is None or then <= 0:
                continue
            base = then * env_factor
            if now > base * RATIO and now - base > ABS_DELTA_S:
                flagged.append([name, then, now, None])
            elif now > base * WATCH_RATIO:
                # relative-only candidate under the ABS floor: needs an
                # isolated confirm before it earns a watch row
                watch_cand.append([name, then, now, None])
        flagged.sort(key=lambda m: m[2] - m[1], reverse=True)
        watch_cand.sort(key=lambda m: m[2] / m[1], reverse=True)
        retime = [m[0] for m in flagged] + [m[0] for m in watch_cand]
        if retime and not args.no_isolate:
            iso = _retime_isolated(retime, args.sf, args.warmup, args.reps)
            for m in flagged:
                m[3] = iso.get(m[0])
            for m in watch_cand:
                m[3] = iso.get(m[0])
        for name, then, now, alone in flagged:
            # no isolated number (pass skipped / failed) => stay
            # conservative and confirm on the sweep number
            judged = alone if alone is not None else now
            base = then * env_factor
            if judged > base * RATIO and judged - base > ABS_DELTA_S:
                confirmed.append([name, then, now, alone])
        for name, then, now, alone in watch_cand:
            judged = alone if alone is not None else now
            if judged > then * env_factor * WATCH_RATIO:
                watch.append([name, then, now, alone])
    artifact["flagged"] = flagged
    artifact["confirmed"] = confirmed
    artifact["watch"] = watch
    artifact["env_factor"] = env_factor
    artifact["env_factor_raw"] = env_factor_raw
    if env_warning:
        artifact["env_warning"] = env_warning

    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {out_path}: {len(timings)} queries, "
          f"total {artifact['total_sec']}s")

    if prior_path is None:
        print("no prior BENCH_FULL artifact — baseline established")
        return 0
    print(f"diff vs {prior_path}: env factor {env_factor}x "
          f"(raw {env_factor_raw}x), {len(flagged)} flagged "
          f"(>{RATIO}x and >{ABS_DELTA_S}s beyond env), "
          f"{len(confirmed)} confirmed in isolation, "
          f"{len(watch)} sub-floor watch (>{WATCH_RATIO}x relative)")
    for name, then, now, alone in watch:
        alone_s = f"{alone}s" if alone is not None else "n/a"
        print(f"  WATCH {name}: {then}s -> sweep {now}s "
              f"({now / then:.2f}x), isolated {alone_s} [non-fatal]")
    for name, then, now, alone in flagged:
        verdict = "CONFIRMED" if [name, then, now, alone] in confirmed \
            else "phantom"
        alone_s = f"{alone}s" if alone is not None else "n/a"
        print(f"  {verdict} {name}: {then}s -> sweep {now}s "
              f"({now / then:.2f}x), isolated {alone_s}")
    return 1 if confirmed else 0


if __name__ == "__main__":
    raise SystemExit(main())
