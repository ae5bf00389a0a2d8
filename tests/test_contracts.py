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


def test_read_versioned_contract_gate(spark, sf_dir, tmp_path):
    """Contract validation happens BEFORE any file is opened: a
    compatible contract reads fine (including the upcast), an
    incompatible one raises with a column-level message."""
    import pytest
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import versioned as V

    base = str(tmp_path / "tbl")
    nation = read_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("int").alias("k"), "n_name"
    )
    V.write_versioned(spark, nation, base, mode="append")

    ok = s(f("k", LongType()), f("n_name", StringType()))  # int->bigint
    assert V.read_versioned(spark, base, contract=ok).count() == 25

    subset = s(f("n_name", StringType()))
    assert V.read_versioned(spark, base, contract=subset).count() == 25

    bad = s(f("k", LongType()), f("missing", StringType(), nullable=False))
    with pytest.raises(ValueError, match="missing.*absent"):
        V.read_versioned(spark, base, contract=bad)


def test_cli_check_schema(spark, sf_dir, tmp_path):
    """`table check-schema` validates a JSON contract against the
    committed schema without opening data files; exit 0 on compatible,
    1 with VIOLATION lines otherwise."""
    import json

    from datalake_scripts_spark.cli import main
    from datalake_scripts_spark.io import read_table
    from datalake_scripts_spark.operators import versioned as V

    base = str(tmp_path / "tbl")
    V.write_versioned(
        spark,
        read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name"),
        base,
        mode="append",
    )
    ok_path = str(tmp_path / "ok.json")
    with open(ok_path, "w") as fh:
        json.dump(s(f("n_name", StringType())).jsonValue(), fh)
    assert main(["table", "--dir", base, "check-schema",
                 "--contract", ok_path]) == 0

    bad_path = str(tmp_path / "bad.json")
    with open(bad_path, "w") as fh:
        json.dump(
            s(f("n_comment", StringType(), nullable=False)).jsonValue(), fh
        )
    assert main(["table", "--dir", base, "check-schema",
                 "--contract", bad_path]) == 1
