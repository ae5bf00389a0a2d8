"""Pre-snapshot gate: everything the round artifacts depend on, one
command, loud failures — run before ending a round so a red test suite
or a load-noise bench can't ship unnoticed again (it did in round 2).

    python scripts/presnapshot.py

Checks, in order:
1. pytest tests/ is green (the formal bar);
2. full DuckDB-oracle selfcheck at sf0.01 has 0 FAIL (the driver's
   correctness gate, run the way the driver runs it);
3. bench.py total and the shared-12 prefix are within tolerance of the
   committed round-1 prefix (17.7 s) — a big excursion means the
   machine is loaded or a query regressed; either way, do not snapshot;
4. scripts/benchfull.py: per-query medians over the FULL registry,
   diffed against the newest committed BENCH_FULL_r*.json — unexplained
   >1.5x (& >0.5 s) movers block the snapshot. Set
   SPARK_GRAFT_SKIP_BENCHFULL=1 to skip during iteration.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARED_PREFIX = [
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
]
R1_PREFIX_TOTAL_S = 17.7  # committed BENCH_r01 total of the shared set
PREFIX_BUDGET_S = 18.0  # VERDICT r2 ask #4: shared prefix must stay <= 18 s


def run(cmd: list[str]) -> tuple[int, str]:
    p = subprocess.run(cmd, capture_output=True, text=True)
    return p.returncode, p.stdout + p.stderr


def refresh_driver_ledger() -> None:
    """Rebuild docs/driver_checked.json (query name -> first round the
    DRIVER verified it green) from every committed CORRECTNESS_r*.json.
    This ledger is the source of truth for the DRIVER_PRIORITY rotation
    in queries/__init__.py: rotation slots go to names absent here."""
    import glob

    ledger: dict[str, dict] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            results = json.load(f)
        for name, res in results.items():
            if name in ledger:
                continue
            rows_only = (
                res.get("err") == "no_oracle"
                and res.get("spark_rows") is not None
            )
            if not rows_only and (
                res.get("err") is not None or res.get("hash_match") is False
            ):
                continue  # not green that round
            entry = {"first_green_round": rnd}
            if rows_only:
                # driver ran the Spark side and recorded rows, but no
                # DuckDB oracle exists (documented rows-only queries —
                # each has a hash-exact md5/stride twin that IS
                # oracle-green)
                entry["rows_only"] = True
            ledger[name] = entry
    os.makedirs("docs", exist_ok=True)
    with open("docs/driver_checked.json", "w") as f:
        json.dump(dict(sorted(ledger.items())), f, indent=1)
        f.write("\n")
    print(f"driver ledger: {len(ledger)} names driver-green at least once")


def main() -> int:
    failures: list[str] = []

    print("== 0/4 driver ledger ==", flush=True)
    refresh_driver_ledger()

    print("== 1/4 pytest ==", flush=True)
    rc, out = run([sys.executable, "-m", "pytest", "tests/", "-q"])
    tail = "\n".join(out.splitlines()[-3:])
    print(tail)
    if rc != 0:
        failures.append("pytest is RED")

    print("== 2/4 oracle selfcheck (sf0.01) ==", flush=True)
    rc, out = run([sys.executable, "scripts/selfcheck.py", "/root/testdata/sf0.01"])
    m = re.search(r"== (\d+) pass, (\d+) fail, (\d+) rows-only ==", out)
    print(m.group(0) if m else out.splitlines()[-1])
    if rc != 0 or not m or int(m.group(2)) != 0:
        failures.append("selfcheck has FAILs")

    print("== 3/4 bench prefix ==", flush=True)
    rc, out = run([sys.executable, "bench.py"])
    line = next((l for l in out.splitlines() if l.startswith("{")), None)
    if rc != 0 or line is None:
        failures.append("bench.py did not produce its JSON line")
    else:
        bench = json.loads(line)
        prefix = sum(bench["queries"][q] for q in SHARED_PREFIX)
        print(
            f"total={bench['value']}s shared-12 prefix={prefix:.2f}s "
            f"(r1 committed {R1_PREFIX_TOTAL_S}s, budget {PREFIX_BUDGET_S}s)"
        )
        if prefix > PREFIX_BUDGET_S:
            failures.append(
                f"shared-12 bench prefix {prefix:.2f}s exceeds {PREFIX_BUDGET_S}s "
                "— loaded machine or a real regression; rerun quiet or bisect"
            )

    print("== 4/4 full-registry bench diff ==", flush=True)
    if os.environ.get("SPARK_GRAFT_SKIP_BENCHFULL"):
        print("skipped (SPARK_GRAFT_SKIP_BENCHFULL set)")
    else:
        # re-measures EVERY registry query (~10 min) and diffs against
        # the newest committed BENCH_FULL artifact; >1.5x & >0.5s
        # movers fail loudly (VERDICT r4 ask #5 — the winnowing lesson:
        # regressions outside the 27 headliners were invisible)
        rc, out = run([sys.executable, "scripts/benchfull.py"])
        for line in out.splitlines():
            if line.startswith(("wrote ", "diff ", "  REGRESSED", "no prior")):
                print(line)
        if rc != 0:
            failures.append("full-registry bench has unexplained >1.5x movers")

    if failures:
        print("\nPRESNAPSHOT: DO NOT SNAPSHOT")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("\nPRESNAPSHOT: OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
