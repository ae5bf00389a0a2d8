"""Cross-engine contract for functions.casts.big_double: the exact
2^63-split wide-integer -> double recipe must produce BIT-IDENTICAL
doubles in Spark and DuckDB for the full DECIMAL(38,0) working range —
including past 2^53 (where naive decimal->double casts diverge: DuckDB
double-rounds through int128, the q1-at-sf1 finding) and past 2^63
(where the hi half becomes nonzero). Also pins the DuckDB gotcha the
helper works around: `//` on DECIMAL is ROUNDED division, on HUGEINT it
truncates."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datalake_scripts_spark.functions.casts import (
    big_double_duck_sql,
    big_double_spark_sql,
)


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_eval(con, v: int) -> float:
    operand = f"CAST('{v}' AS DECIMAL(38,0))"  # DuckDB parses full 38
    return con.execute(
        f"SELECT {big_double_duck_sql(operand)}"
    ).fetchone()[0]


def _spark_eval(spark, vs: list[int]) -> list[float]:
    # typed-literal ingestion: Spark's string->decimal cast rounds
    # through DECIMAL128 (34 sig digits), so 35+-digit values must
    # arrive as a DecimalType column, the way real aggregates produce
    # them
    from decimal import Decimal

    from pyspark.sql.types import DecimalType, StructField, StructType

    schema = StructType([StructField("v", DecimalType(38, 0))])
    df = spark.createDataFrame([(Decimal(v),) for v in vs], schema)
    rows = df.selectExpr(big_double_spark_sql("v") + " AS d").collect()
    return [r.d for r in rows]


EDGES = [
    0,
    1,
    -1,
    2**53 - 1,
    2**53,
    2**53 + 1,
    2**63 - 1,
    2**63,
    2**63 + 1,
    -(2**63) - 1,
    27154328762842519076,  # the hi-half value DuckDB decimal-// rounded wrong
    10**25,
    -(10**25),
    9 * 10**36,
    -(9 * 10**36) - 12345,
]


def test_edge_values_bit_identical(spark, duck):
    got_spark = _spark_eval(spark, EDGES)
    for v, sv in zip(EDGES, got_spark):
        dv = _duck_eval(duck, v)
        assert sv == dv, f"split-double diverges at {v}: {sv} vs {dv}"
        # within float precision of the true integer (sanity, not the
        # contract: the contract is cross-engine equality)
        assert sv == pytest.approx(float(v), rel=1e-12)


@settings(max_examples=20, deadline=None)
@given(st.integers(min_value=-(9 * 10**36), max_value=9 * 10**36))
def test_property_bit_identical(spark, duck, v):
    assert _spark_eval(spark, [v])[0] == _duck_eval(duck, v)


def test_duckdb_decimal_floordiv_gotcha(duck):
    """The reason the helper casts to HUGEINT first: DECIMAL // rounds."""
    v = 27154328762842519076
    dec = duck.execute(
        f"SELECT CAST(CAST({v} AS DECIMAL(38,0)) // 9223372036854775808 AS BIGINT)"
    ).fetchone()[0]
    hug = duck.execute(
        f"SELECT CAST(CAST({v} AS HUGEINT) // 9223372036854775808 AS BIGINT)"
    ).fetchone()[0]
    assert hug == v // 2**63 == 2
    assert dec == 3  # rounded, not truncated — pinned so a DuckDB
    # behavior change is noticed (the helper would still be correct)
