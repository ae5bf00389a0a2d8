"""Freeze per-query shuffle-write budgets for the regression gate
(tests/test_shuffle_budgets.py).

Measures every registry query's shuffle-write bytes under the SAME
harness the test uses (local[8], shuffle_partitions=8, sf0.001),
keeps the top N by volume, and writes tests/shuffle_budgets.json.
Re-run after a DELIBERATE plan change shifts a budget; the test's
tolerance absorbs codec-level noise only.

Usage: python scripts/freeze_shuffle_budgets.py [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    from datalake_scripts_spark.operators.shufflemeter import (
        measure_query_shuffle,
    )
    from datalake_scripts_spark.queries import REGISTRY
    from datalake_scripts_spark.session import get_spark

    spark = get_spark(
        "freeze_shuffle_budgets", master="local[8]", shuffle_partitions=8
    )
    measured: dict[str, int] = {}
    for name, q in REGISTRY.items():
        try:
            _n, totals = measure_query_shuffle(spark, q.fn, spark, sf_dir)
        except Exception as exc:  # noqa: BLE001 — report and move on
            print(f"SKIP {name}: {exc}", file=sys.stderr)
            continue
        measured[name] = totals["shuffle_write"]
        print(f"{name}: {totals['shuffle_write'] / 1e6:.2f} MB")

    # top-N by volume PLUS the headline bench set: volume alone would
    # systematically exclude exactly the queries whose plan keeps the
    # shuffle near zero (broadcast joins, map-only passes) — where a
    # lost hint blows bytes up the MOST relative to the frozen budget
    from bench import BENCH_QUERIES

    keep = set(
        n
        for n, _ in sorted(
            measured.items(), key=lambda kv: kv[1], reverse=True
        )[:top_n]
    ) | (set(BENCH_QUERIES) & set(measured))
    top = {n: measured[n] for n in sorted(keep)}
    out = {
        "sf_dir": sf_dir,
        "master": "local[8]",
        "shuffle_partitions": 8,
        "budgets": top,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests",
        "shuffle_budgets.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=2, sort_keys=True)
    print(f"wrote {path} with {len(top)} budgets")


if __name__ == "__main__":
    main()
