"""Constraint validation + write-audit-publish."""

import glob

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_scripts_spark.io import read_table
from datalake_scripts_spark.operators import quality as Q
from datalake_scripts_spark.operators.versioned import (
    current_version,
    read_versioned,
)


@pytest.fixture()
def table_dir(tmp_path):
    return str(tmp_path / "wap")


def test_validate_all_rule_kinds(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    nation = read_table(spark, sf_dir, "nation")
    cust = read_table(spark, sf_dir, "customer")
    rules = [
        Q.not_null("o_orderkey"),
        Q.in_range("o_totalprice", 0, 10_000_000),
        Q.is_in("o_orderstatus", ["F", "O", "P"]),
        Q.matches("o_orderpriority", r"^[1-5]-[A-Z ]+$"),
        Q.unique("o_orderkey"),
        Q.foreign_key("o_custkey", cust, "c_custkey"),
        # a rule that FAILS: nationkeys only go to 24
        Q.foreign_key("o_orderkey", nation, "n_nationkey"),
    ]
    rep = {r.rule: r for r in Q.validate(orders, rules).collect()}
    assert len(rep) == 7
    ok_rules = [r for r in rep.values() if r.ok]
    assert len(ok_rules) == 6
    bad = rep["fk(o_orderkey->n_nationkey)"]
    assert not bad.ok and bad.n_violations == orders.filter("o_orderkey > 24").count()


def test_validate_null_semantics(spark):
    df = spark.createDataFrame(
        [Row(k=1, v=None), Row(k=2, v="xx"), Row(k=2, v="zz")],
        "k int, v string",
    )
    rep = {
        r.rule: r.n_violations
        for r in Q.validate(
            df, [Q.not_null("v"), Q.matches("v", "^x+$"), Q.unique("k")]
        ).collect()
    }
    # NULL passes the regex CHECK (SQL semantics), fails not_null;
    # unique counts one extra occurrence of k=2
    assert rep == {"not_null(v)": 1, "regex(v)": 1, "unique(k)": 1}


def test_wap_publishes_clean_batch(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    v = Q.write_audit_publish(
        spark,
        nation,
        table_dir,
        [Q.not_null("n_nationkey"), Q.unique("n_nationkey")],
    )
    assert v == 1
    assert read_versioned(spark, table_dir).count() == nation.count()


def test_wap_failed_audit_leaves_table_untouched(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    Q.write_audit_publish(spark, nation, table_dir, [Q.not_null("n_name")])
    n_data_files = len(glob.glob(f"{table_dir}/data/*"))
    bad = nation.withColumn(
        "n_name", F.when(F.col("n_nationkey") < 3, None).otherwise(F.col("n_name"))
    )
    with pytest.raises(Q.AuditFailed) as ei:
        Q.write_audit_publish(spark, bad, table_dir, [Q.not_null("n_name")], mode="append")
    assert ei.value.report == [
        {"rule": "not_null(n_name)", "n_violations": 3, "ok": False}
    ]
    # pointer never moved, staged files garbage-collected
    assert current_version(table_dir) == 1
    assert len(glob.glob(f"{table_dir}/data/*")) == n_data_files
    assert read_versioned(spark, table_dir).count() == nation.count()


def test_wap_enforces_schema_before_staging(spark, sf_dir, table_dir):
    nation = read_table(spark, sf_dir, "nation")
    Q.write_audit_publish(spark, nation, table_dir, [])
    drifted = nation.withColumn("n_nationkey", F.col("n_nationkey").cast("string"))
    with pytest.raises(ValueError, match="type mismatch"):
        Q.write_audit_publish(spark, drifted, table_dir, [], mode="append")
    assert current_version(table_dir) == 1


def test_wap_bloom_cols_inherit_and_clear(spark, sf_dir, tmp_path):
    """write_audit_publish mirrors write_versioned's bloom contract
    (ADVICE r4, low): bloom_cols=None inherits the table's config for
    append AND overwrite (a routine publish must not silently drop
    point-lookup pruning), an explicit [] clears it, a non-empty list
    replaces it."""
    from datalake_scripts_spark.operators.versioned import (
        _load_manifest,
        current_version,
        write_versioned,
    )

    table_dir = str(tmp_path / "wap_bloom")
    nation = read_table(spark, sf_dir, "nation")
    write_versioned(
        spark, nation, table_dir, mode="append", bloom_cols=["n_nationkey"]
    )
    # append inherits the table's bloom config
    Q.write_audit_publish(spark, nation, table_dir, [], mode="append")
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") == ["n_nationkey"]
    # overwrite with no bloom_cols arg INHERITS too (no silent loss)
    Q.write_audit_publish(spark, nation, table_dir, [], mode="overwrite")
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") == ["n_nationkey"]
    assert all("blooms" in s for s in m["stats"].values())
    # overwrite can set a fresh config explicitly
    Q.write_audit_publish(
        spark, nation, table_dir, [], mode="overwrite", bloom_cols=["n_name"]
    )
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") == ["n_name"]
    # explicit empty list is the deliberate way to drop the index
    Q.write_audit_publish(
        spark, nation, table_dir, [], mode="overwrite", bloom_cols=[]
    )
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") is None
    # same contract on write_versioned itself
    write_versioned(
        spark, nation, table_dir, mode="overwrite", bloom_cols=["n_name"]
    )
    write_versioned(spark, nation, table_dir, mode="overwrite")
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") == ["n_name"]
    write_versioned(spark, nation, table_dir, mode="overwrite", bloom_cols=[])
    m = _load_manifest(table_dir, current_version(table_dir))
    assert m.get("bloom_cols") is None
