"""Data profiling — the engine's formalization of the reference's
observability-as-testing habit (count logging after every transform,
SURVEY.md §2.4 A2, and check_loaded reconciliation §2.9).

One aggregation pass produces per-column stats instead of the
reference's one-full-job-per-count pattern; run it once per load and
write it next to the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType)


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Wide-to-long column profile: (column, n_rows, n_nulls,
    n_distinct, min_str, max_str, sum_dec for numerics).

    Single aggregation job (all stats partial-aggregated map-side),
    then an unpivot — contrast with the reference's N separate count()
    jobs. Values are decimal-exact / string-rendered so the profile
    itself is oracle-comparable.
    """
    cols = columns or df.columns
    n = F.count(F.lit(1))
    aggs = [n.alias("__n")]
    for c in cols:
        dt = df.schema[c].dataType
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__distinct"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        if isinstance(dt, _NUMERIC):
            aggs.append(
                F.sum(F.col(c).cast("decimal(28,2)")).cast("double").alias(f"{c}__sum")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__sum"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__distinct`, `{c}__min`, `{c}__max`, `{c}__sum`"
        for c in cols
    )
    return wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_str, max_str, sum_value)"
        ),
    ).select("column", "n_rows", "n_nulls", "n_distinct", "min_str", "max_str", "sum_value")
