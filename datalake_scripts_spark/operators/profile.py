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


# --- order-independent content checksum (reconciliation) -------------

# first 12 md5 nibbles -> BIGINT, as ONE SQL fragment every engine
# evaluates identically (the CMS bucket-hash trick, sketches.py)
_HEX = "0123456789abcdef"


def md5_value_sql(expr: str, nibbles: int = 12) -> str:
    """SQL computing an integer in [0, 16^nibbles) from md5(expr) —
    identical text works in Spark SQL and DuckDB (md5/substr/instr)."""
    # CAST to BIGINT: Spark's instr returns INT, and under ANSI mode
    # INT * INT-sized power-of-16 literals overflows; DuckDB's instr is
    # already BIGINT, so the cast is a no-op there
    terms = [
        f"CAST(instr('{_HEX}', substr(md5({expr}), {p + 1}, 1)) - 1 AS BIGINT)"
        f" * {16 ** (nibbles - 1 - p)}"
        for p in range(nibbles)
    ]
    return "(" + " + ".join(terms) + ")"


def content_checksum(
    df: DataFrame, repr_sql: str, group_cols: list[str] | None = None
) -> DataFrame:
    """Order-independent content checksum for table reconciliation
    (migration / replica / engine-swap validation — the reference's
    check_loaded row-count probe, zoom_proc.py:266-312, upgraded to a
    content-sensitive check).

    ``repr_sql`` must be a canonical per-row string (caller controls
    type formatting — the cross-engine trap is numeric/timestamp
    rendering, not the hash). Each row hashes to a 48-bit integer
    (md5-derived, engine-portable); the SUM is taken in DECIMAL(38,0)
    (no BIGINT overflow at any realistic row count: 10^12 rows x 2^48
    < 10^27) and reported mod 1e18 as a BIGINT. Integer sums are
    associative/commutative, so the checksum is independent of
    partitioning and row order — two tables match iff (n_rows,
    checksum) match per group, with 2^-48-per-row collision odds.
    Map-side partial aggregation; one shuffle (or one reduce for the
    ungrouped form).
    """
    group_cols = group_cols or []
    agg = [
        F.count("*").alias("n_rows"),
        F.expr(
            f"CAST(SUM(CAST({md5_value_sql(repr_sql)} AS DECIMAL(38,0)))"
            " % 1000000000000000000 AS BIGINT)"
        ).alias("checksum"),
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*agg)
    return df.agg(*agg)
