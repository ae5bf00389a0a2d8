"""Typed casts — the 4 timestamp format families + array->CSV observed in
the reference (SURVEY.md §1.2), as named functions so callers must choose
a semantics explicitly (risk 3: one ``to_timestamp`` name, two meanings —
string patterns vs epoch seconds, ``vk_proc.py:170-173`` vs
``monkey_proc.py:131``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO = "yyyy-MM-dd'T'HH:mm:ss"  # SurveyMonkey (monkey_proc.py:129-136)
ISO_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # Zoom (zoom_proc.py:141-144)
FRACTIONAL = "yyyy-MM-dd HH:mm:ss.SSS"  # jhub log body (jhub_proc.py:162-169)
FRACTIONAL_NANO = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'"  # fluent-bit `time`


def _parse(col: str | Column, fmt: str) -> Column:
    # try_to_timestamp: NULL on malformed input — the pre-ANSI semantics
    # the reference relies on (Spark 4 ANSI to_timestamp would throw).
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def to_ts_iso(col: str | Column) -> Column:
    """ISO-8601 without zone suffix (monkey_proc.py:129-136)."""
    return _parse(col, ISO)


def to_ts_iso_z(col: str | Column) -> Column:
    """ISO-8601 with literal 'Z' (zoom_proc.py:141-144)."""
    return _parse(col, ISO_Z)


def to_ts_fractional(col: str | Column, nano: bool = False) -> Column:
    """Fractional-seconds formats (jhub_proc.py:162-169)."""
    return _parse(col, FRACTIONAL_NANO if nano else FRACTIONAL)


def to_ts_epoch_seconds(col: str | Column) -> Column:
    """Epoch-seconds numeric fields (vk_proc.py:170-173,232-239):
    ``F.timestamp_seconds``, not a format-string parse."""
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def array_to_csv(col: str | Column, sep: str = ",") -> Column:
    """array<string> -> delimited string, to fit row-store text columns
    (``F.concat_ws(',', internal_ip_addresses)``, zoom_proc.py:200-203)."""
    return F.concat_ws(sep, F.col(col) if isinstance(col, str) else col)


# --- exact wide-integer -> double, identical across engines ----------
#
# Casting a >2^53 DECIMAL(38,0) to DOUBLE is engine-divergent: DuckDB
# routes wide decimals through int128 with DOUBLE rounding (~1.5 ulp),
# Spark/BigDecimal rounds once (the q1-at-sf1 finding,
# queries/relational.py:88). For statistics whose exact integer moments
# inherently exceed 2^63 (e.g. n*Syy - Sy^2 combinations), the fix is
# to make BOTH engines run the same recipe: split the integer exactly
# at 2^63 (hi = v div 2^63, lo = v mod 2^63 — pure integer ops), cast
# each half int64->double (a single, IEEE-defined rounding in every
# engine), and recombine as sign * (hi * 2^63 + lo) — the 2^63 factor
# is a power of two, so the multiply is exact and the single add is
# the only rounding. The result can differ from the correctly-rounded
# direct conversion by <=1 ulp, but it is BIT-IDENTICAL across
# engines, which is the contract that matters. Domain: |v| < 9.2e36
# (Spark's decimal DIV widens to an intermediate decimal(38,20), which
# overflows once the quotient needs >18 integer digits — far above any
# n*Syy - Sy^2 moment combination, which tops out ~1e25 at sf1000).

_SHIFT = "9223372036854775808"  # 2^63; > int64 max, so DuckDB reads
# it as HUGEINT and Spark as DECIMAL(19,0) — both exact
_SHIFT_D = "9.223372036854775808E18"


def big_double_spark_sql(e: str) -> str:
    """Spark SQL fragment: exact-split DOUBLE of wide-integer ``e``
    (DECIMAL dividend DIV yields BIGINT in Spark)."""
    return (
        f"(CASE WHEN ({e}) < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST(ABS({e}) DIV {_SHIFT} AS DOUBLE) * {_SHIFT_D}"
        f" + CAST(CAST(ABS({e}) % {_SHIFT} AS BIGINT) AS DOUBLE))"
    )


def big_double_duck_sql(e: str) -> str:
    """DuckDB SQL fragment: the same exact-split recipe. The operand
    is forced through HUGEINT first: DuckDB's ``//`` on DECIMAL does
    ROUNDED division (27154328762842519076 // 2^63 = 3, not 2), which
    silently corrupts the hi half for values past 2^53 — on HUGEINT it
    truncates, matching Spark's DIV."""
    a = f"CAST(ABS({e}) AS HUGEINT)"
    return (
        f"(CASE WHEN ({e}) < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST(CAST({a} // {_SHIFT} AS BIGINT) AS DOUBLE) * {_SHIFT_D}"
        f" + CAST(CAST({a} % {_SHIFT} AS BIGINT) AS DOUBLE))"
    )


def big_double(e: str) -> Column:
    """Column form of :func:`big_double_spark_sql` (``e`` is a SQL
    fragment/column name visible in the current plan)."""
    return F.expr(big_double_spark_sql(e))
