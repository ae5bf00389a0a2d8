"""Write-time data expectations (operators/expectations.py): one-pass
rule evaluation, warn/drop/fail actions, quarantine lane with the full
violation diagnosis, fail-aborts-before-commit, counts in commit meta."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_scripts_spark.operators import versioned as V
from datalake_scripts_spark.operators.expectations import (
    ExpectationsFailed,
    apply_expectations,
    write_versioned_with_expectations,
)


def _batch(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "b"), (3, 0.0, None),
         (4, 99.0, "a"), (5, None, "c")],
        "k bigint, price double, tag string",
    )


RULES = {
    "price_positive": "price > 0",          # rows 2,3,5 fail (NULL fails)
    "tag_present": "tag IS NOT NULL",       # row 3 fails
    "k_small": "k < 100",                   # nobody fails
}
# unlisted rules are warn-only (DLT parity) — gating needs explicit drop
DROP_ALL = {n: "drop" for n in RULES}


def test_bare_rules_are_warn_only(spark, tmp_path):
    """DLT parity: a rule with no actions entry counts violations but
    never excludes rows — porting a DLT rule set without an actions
    map must not silently lose data (ADVICE r8)."""
    kept, quarantined = apply_expectations(_batch(spark), RULES)
    assert kept.count() == 5 and quarantined.count() == 0
    v, counts = write_versioned_with_expectations(
        spark, _batch(spark), str(tmp_path / "t"), RULES
    )
    assert counts == {"price_positive": 3, "tag_present": 1, "k_small": 0}
    assert V.read_versioned(spark, str(tmp_path / "t")).count() == 5


def test_apply_expectations_split_and_diagnosis(spark):
    kept, quarantined = apply_expectations(_batch(spark), RULES, DROP_ALL)
    assert sorted(r["k"] for r in kept.collect()) == [1, 4]
    q = {r["k"]: sorted(r["_violations"]) for r in quarantined.collect()}
    assert q == {
        2: ["price_positive"],
        3: ["price_positive", "tag_present"],
        5: ["price_positive"],
    }


def test_warn_rules_never_exclude(spark):
    kept, quarantined = apply_expectations(
        _batch(spark), RULES,
        actions={"price_positive": "warn", "tag_present": "warn"},
    )
    assert kept.count() == 5 and quarantined.count() == 0


def test_write_with_expectations_and_quarantine(spark, tmp_path):
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    v, counts = write_versioned_with_expectations(
        spark, _batch(spark), tdir, RULES,
        actions={**DROP_ALL, "tag_present": "warn"},
        quarantine_dir=qdir,
    )
    assert counts == {"price_positive": 3, "tag_present": 1, "k_small": 0}
    got = V.read_versioned(spark, tdir)
    assert sorted(r["k"] for r in got.collect()) == [1, 4]
    # counts are commit metadata (time-travelable quality history)
    m = V._load_manifest(tdir, v)
    assert m["meta"]["expectations"] == counts
    q = V.read_versioned(spark, qdir).collect()
    assert sorted(r["k"] for r in q) == [2, 3, 5]
    assert {r["k"]: r["_violations"] for r in q}[3] == (
        "price_positive,tag_present"
    )


def test_fail_rule_aborts_before_commit(spark, tmp_path):
    tdir = str(tmp_path / "t")
    with pytest.raises(ExpectationsFailed, match="price_positive=3"):
        write_versioned_with_expectations(
            spark, _batch(spark), tdir, RULES,
            actions={"price_positive": "fail"},
        )
    assert V.current_version(tdir) == 0  # nothing committed


def test_guards(spark):
    with pytest.raises(ValueError, match="unknown rule"):
        apply_expectations(_batch(spark), RULES, actions={"nope": "drop"})
    with pytest.raises(ValueError, match="unknown action"):
        apply_expectations(
            _batch(spark), RULES, actions={"k_small": "explode"}
        )


def test_one_pass_no_shuffle(spark):
    kept, _ = apply_expectations(_batch(spark), RULES, DROP_ALL)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only split


def test_streaming_expectations_sink(spark, tmp_path):
    """The DLT streaming-table shape: epochs validate, quarantine, and
    stamp counts; replays no-op on both target and quarantine; a
    fail-rule violation aborts the epoch with nothing committed."""
    from datalake_scripts_spark.streaming import foreach_batch_expectations

    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    sink = foreach_batch_expectations(
        tdir, RULES, actions={**DROP_ALL, "tag_present": "warn"},
        quarantine_dir=qdir,
    )
    sink(_batch(spark), 0)
    assert sorted(
        r["k"] for r in V.read_versioned(spark, tdir).collect()
    ) == [1, 4]
    assert V.read_versioned(spark, qdir).count() == 3
    assert V._load_manifest(tdir, 1)["meta"]["expectations"][
        "price_positive"
    ] == 3
    # epoch replay: neither table moves
    sink(_batch(spark), 0)
    assert V.current_version(tdir) == 1
    assert V.current_version(qdir) == 1
    # crash-between-writes replay: quarantine already has epoch 1 ->
    # only the target lands on retry, no duplicate quarantine rows
    from datalake_scripts_spark.operators.versioned import write_versioned
    write_versioned(
        spark,
        _batch(spark).filter("k = 2").withColumn("_violations", F.lit("price_positive")),
        qdir, mode="append", meta={"epoch": 1, "quarantined_from": tdir},
    )
    epoch1 = spark.createDataFrame(
        [(2, -5.0, "b"), (9, 1.0, "z")],
        "k bigint, price double, tag string",
    )
    sink(epoch1, 1)
    assert sorted(
        r["k"] for r in V.read_versioned(spark, tdir).collect()
    ) == [1, 4, 9]
    # quarantine kept exactly the pre-written epoch-1 row (no dup)
    assert V.read_versioned(spark, qdir).filter("k = 2").count() == 2  # one from epoch 0, one pre-written
    assert V.current_version(qdir) == 2
    # fail action aborts the epoch
    sink2 = foreach_batch_expectations(
        str(tmp_path / "t2"), RULES, actions={"price_positive": "fail"}
    )
    with pytest.raises(ExpectationsFailed):
        sink2(_batch(spark), 0)
    assert V.current_version(str(tmp_path / "t2")) == 0


def test_empty_batch_and_clean_batch(spark, tmp_path):
    """Empty batches and violation-free batches commit cleanly with
    zero counts and never create a quarantine table."""
    schema = "k bigint, price double, tag string"
    clean = spark.createDataFrame([(1, 2.0, "a")], schema)
    tdir, qdir = str(tmp_path / "t"), str(tmp_path / "q")
    v, counts = write_versioned_with_expectations(
        spark, clean, tdir, RULES, quarantine_dir=qdir
    )
    assert counts == {n: 0 for n in RULES}
    assert V.current_version(qdir) == 0  # quarantine never materialized
    v2, counts2 = write_versioned_with_expectations(
        spark, spark.createDataFrame([], schema), tdir, RULES,
        quarantine_dir=qdir,
    )
    assert counts2 == {n: 0 for n in RULES}
    assert V.read_versioned(spark, tdir).count() == 1


def test_rule_referencing_missing_column_fails_loudly(spark, tmp_path):
    from pyspark.errors import AnalysisException

    with pytest.raises(AnalysisException):
        kept, _ = apply_expectations(
            _batch(spark), {"bad": "no_such_col > 0"}
        )
        kept.count()
