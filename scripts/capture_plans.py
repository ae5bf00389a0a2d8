"""Capture .explain("formatted") for named registry queries into
plans/<dir>/<query>_<tag>.txt — the optimization-round evidence files
(guide §1.3: keep the plan shape on record for every touched query).

    python scripts/capture_plans.py --tag before --queries a,b,c \
        [--sf /root/testdata/sf0.1] [--dir plans/r12]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--dir", default="plans/r12")
    args = ap.parse_args()

    from datalake_scripts_spark.queries import REGISTRY  # loads all modules
    from datalake_scripts_spark.session import get_spark

    spark = get_spark("capture-plans", master="local[32]")
    os.makedirs(args.dir, exist_ok=True)
    for name in args.queries.split(","):
        df = REGISTRY[name].fn(spark, args.sf)
        out = os.path.join(args.dir, f"{name}_{args.tag}.txt")
        with open(out, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(out)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
