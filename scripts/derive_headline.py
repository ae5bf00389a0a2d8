"""Derive bench.py's headline artifact from an idle full-registry
sweep (VERDICT r8 hygiene ask: the r8 headline run was taken under
contention and told the opposite story from the idle sweep — deriving
the headline numbers FROM the idle sweep makes the two artifacts
share one measurement, so they cannot disagree).

    python scripts/derive_headline.py BENCH_FULL_r09_sf01.json \
        > BENCH_HEADLINE_r09_from_idle.json

Prints one bench.py-shaped JSON line restricted to BENCH_QUERIES,
with `derived_from` provenance and any headline queries missing from
the sweep listed loudly instead of silently summed around.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__, file=sys.stderr)
        return 2
    with open(sys.argv[1]) as fh:
        full = json.load(fh)
    qs = full["queries"]
    sel = {q: qs[q] for q in BENCH_QUERIES if q in qs}
    missing = [q for q in BENCH_QUERIES if q not in qs]
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(sel.values()), 2),
        "unit": "sec",
        "queries": sel,
        "sf": full.get("sf"),
        "reps": full.get("reps"),
        "derived_from": os.path.basename(sys.argv[1]),
        "missing": missing,
    }
    print(json.dumps(out))
    return 0 if not missing else 1


if __name__ == "__main__":
    raise SystemExit(main())
