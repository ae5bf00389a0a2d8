"""Self-check harness mirroring the driver's DuckDB-oracle comparison.

Runs every ``queries()`` entry at the given SF, runs the oracle SQL in
DuckDB over the same parquet, and compares row count, column names/types,
and order-insensitive values (exact match after sorting). Reports
per-query PASS/FAIL with diffs for the first few mismatching cells.

Usage: python scripts/selfcheck.py [sf_dir] [query_name ...]
                                   [--timeout SECONDS]

``--timeout`` (VERDICT r9 ask #4) arms a per-query watchdog on BOTH
halves: the Spark job group is cancelled / the DuckDB connection is
interrupted after N seconds, and the query reports a loud FAIL
(``SPARK TIMEOUT`` / ``ORACLE TIMEOUT``) instead of hanging the sweep
— so at-scale exclusions can never grow silently again (the r9 sf0.1
sweep lost 40 minutes to one recursive-CTE oracle before a manual
kill).
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # the driver's testdata tables are single files; gen_sf.py's
        # are Spark-written DIRECTORIES of part files — glob those
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def normalize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            import numpy as np

            def _hashable(v):
                if isinstance(v, dict):
                    return tuple(sorted(v.items()))
                if isinstance(v, (list, tuple, np.ndarray)):
                    return tuple(_hashable(x) for x in v)
                return v

            pdf[c] = pdf[c].map(_hashable, na_action="ignore")
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pdf[c].astype("datetime64[us]")
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


def compare(name, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns spark={sc} duck={dc}")
        return problems
    a, b = normalize_pdf(spark_pdf), normalize_pdf(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            if not a[c].equals(b[c]):
                neq = (a[c].astype(str) != b[c].astype(str))
                n_bad = int(neq.sum())
                if n_bad:
                    i = neq.idxmax()
                    problems.append(
                        f"col {c}: {n_bad} diffs, e.g. row {i}: "
                        f"spark={a[c][i]!r} duck={b[c][i]!r} "
                        f"(dtypes {a[c].dtype}/{b[c].dtype})"
                    )
                else:
                    problems.append(f"col {c}: dtype-only {a[c].dtype} vs {b[c].dtype}")
    return problems


class _Watchdog:
    """Arms a timer that fires ``cancel`` after ``seconds``; use as a
    context manager around the guarded call. ``fired`` says whether
    the deadline hit (to label the resulting exception a TIMEOUT)."""

    def __init__(self, seconds: float, cancel):
        self.seconds, self._cancel = seconds, cancel
        self.fired = False

    def _fire(self):
        self.fired = True
        self._cancel()

    def __enter__(self):
        self._t = threading.Timer(self.seconds, self._fire)
        self._t.daemon = True
        if self.seconds > 0:
            self._t.start()
        return self

    def __exit__(self, *exc):
        self._t.cancel()
        return False


def main() -> int:
    argv = list(sys.argv[1:])
    timeout = 0.0
    if "--timeout" in argv:
        i = argv.index("--timeout")
        timeout = float(argv[i + 1])
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    from datalake_scripts_spark.session import get_spark
    from datalake_scripts_spark.queries import REGISTRY

    spark = get_spark("selfcheck", shuffle_partitions=16)
    sc = spark.sparkContext
    con = duck_con(sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sc.setJobGroup(name, name, interruptOnCancel=True)
            with _Watchdog(
                timeout, lambda: sc.cancelJobGroup(name)
            ) as wd:
                sdf = q.fn(spark, sf_dir)
                spark_pdf = sdf.toPandas()
        except Exception:
            kind = (
                f"SPARK TIMEOUT after {timeout:.0f}s"
                if wd.fired else "SPARK ERROR"
            )
            print(f"FAIL {name}: {kind}\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if q.sql is None:
            print(f"rows-only {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            with _Watchdog(timeout, con.interrupt) as wd:
                duck_pdf = con.sql(q.sql).df()
        except Exception:
            kind = (
                f"ORACLE TIMEOUT after {timeout:.0f}s"
                if wd.fired else "DUCKDB ERROR"
            )
            print(f"FAIL {name}: {kind}\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
