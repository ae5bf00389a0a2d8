"""Schema data-contract checks (operators/contracts.py) — pure
StructType functions, no Spark session involved."""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from datalake_scripts_spark.operators.contracts import (
    read_compat,
    schema_compat,
)


def s(*fields):
    return StructType(list(fields))


def f(name, dtype, nullable=True):
    return StructField(name, dtype, nullable)


BASE = s(f("id", LongType(), False), f("name", StringType()))


def test_identical_schemas_compatible():
    assert read_compat(BASE, BASE) == []
    assert schema_compat(BASE, BASE, "full") == []


def test_reader_projects_away_extra_producer_columns():
    producer = s(*BASE.fields, f("extra", StringType()))
    assert read_compat(producer, BASE) == []
    # but forward compat fails if the new contract REQUIRES the column
    strict = s(*BASE.fields, f("extra", StringType(), nullable=False))
    v = read_compat(BASE, strict)
    assert v and "absent" in v[0]


def test_missing_nullable_column_reads_as_nulls():
    contract = s(*BASE.fields, f("opt", StringType(), nullable=True))
    assert read_compat(BASE, contract) == []


def test_widening_upcasts_allowed_narrowing_rejected():
    prod = s(f("n", IntegerType()), f("x", FloatType()))
    wide = s(f("n", LongType()), f("x", DoubleType()))
    assert read_compat(prod, wide) == []
    v = read_compat(wide, prod)
    assert len(v) == 2 and all("not readable" in x for x in v)


def test_nullability_tightening_flagged():
    relaxed = s(f("id", LongType(), True))
    strict = s(f("id", LongType(), False))
    v = read_compat(relaxed, strict)
    assert v and "non-nullable" in v[0]
    assert read_compat(strict, relaxed) == []


def test_nested_struct_and_array_and_map_recursion():
    inner_v1 = s(f("a", IntegerType()), f("b", StringType()))
    inner_v2 = s(f("a", LongType()))  # widened + dropped b
    prod = s(
        f("rec", inner_v1),
        f("tags", ArrayType(StringType(), containsNull=True)),
        f("kv", MapType(StringType(), IntegerType(), valueContainsNull=False)),
    )
    cons = s(
        f("rec", inner_v2),
        f("tags", ArrayType(StringType(), containsNull=False)),
        f("kv", MapType(StringType(), LongType(), valueContainsNull=True)),
    )
    v = read_compat(prod, cons)
    # exactly one violation: array null-tightening; the struct widening
    # and map value widening are fine, dropped inner column projected
    assert len(v) == 1 and "non-null elements" in v[0]
    assert "tags" in v[0]


def test_backward_vs_forward_direction():
    old = BASE
    new = s(*BASE.fields, f("added", StringType(), nullable=True))
    # nullable addition: old readers ignore it, new readers null-fill
    assert schema_compat(old, new, "backward") == []
    assert schema_compat(old, new, "forward") == []
    required = s(*BASE.fields, f("added", StringType(), nullable=False))
    # old files lack the column -> new strict readers break
    assert schema_compat(old, required, "forward")
    assert schema_compat(old, required, "backward") == []
    both = schema_compat(old, required, "full")
    assert len(both) == 1 and both[0].startswith("forward:")


def test_type_change_breaks_both_directions():
    old = s(f("id", LongType()))
    new = s(f("id", StringType()))
    assert schema_compat(old, new, "backward")
    assert schema_compat(old, new, "forward")
