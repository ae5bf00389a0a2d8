"""Normalization kit: flatten / explode_into / normalize.

Pins the semantics SURVEY.md §7 flags as risky: collision-free naming
(risk 1), explode vs explode_outer on empty/null arrays (FIXTURES.md
cross-cutting case 2), and multi-level nesting like the reference's
monkey pages->questions chain (monkey_proc.py:294-315).
"""

import pytest
from pyspark.sql import Row, functions as F

from datalake_scripts_spark.operators.nested import (
    ChildSpec,
    NormalizeSpec,
    explode_into,
    flatten,
    normalize,
)


@pytest.fixture(scope="module")
def nested_df(spark):
    return spark.createDataFrame(
        [
            Row(
                id=1,
                meta=Row(name="a", geo=Row(city="X", zip="1000")),
                tags=["t1", "t2"],
                children=[Row(cid=10, v="p"), Row(cid=11, v="q")],
            ),
            Row(
                id=2,
                meta=Row(name="b", geo=Row(city="Y", zip="2000")),
                tags=[],
                children=[],
            ),
        ]
    )


def test_flatten_full_depth(nested_df):
    out = flatten(nested_df)
    assert set(out.columns) == {"id", "meta_name", "meta_geo_city", "meta_geo_zip", "tags", "children"}
    row = out.filter(F.col("id") == 1).first()
    assert row.meta_geo_city == "X"


def test_flatten_max_depth_one(nested_df):
    out = flatten(nested_df, max_depth=1)
    # one level: meta expands, geo stays a struct
    assert "meta_geo" in out.columns
    assert out.schema["meta_geo"].dataType.typeName() == "struct"


def test_flatten_collision_free(spark):
    # a_b as a leaf AND a.b as a struct path collide under '_' joining:
    # the second occurrence must get a deterministic suffix
    df = spark.createDataFrame([Row(a_b=1, a=Row(b=2))])
    out = flatten(df)
    assert sorted(out.columns) == ["a_b", "a_b_1"]
    r = out.first()
    assert (r["a_b"], r["a_b_1"]) == (1, 2)


def test_explode_into_drops_empty_parents(nested_df):
    out = explode_into(nested_df, "children", carry=["id"], alias="c")
    assert out.count() == 2  # parent 2 (empty array) dropped
    assert set(out.columns) == {"id", "c"}


def test_explode_outer_keeps_empty_parents(nested_df):
    out = explode_into(nested_df, "children", carry=["id"], alias="c", outer=True)
    assert out.count() == 3
    null_row = out.filter(F.col("id") == 2).first()
    assert null_row.c is None


def test_normalize_spec_parent_and_children(nested_df):
    spec = NormalizeSpec(
        name="parents",
        children=[ChildSpec(name="kids", array_col="children", carry=["id"])],
        audit_col="load_datetime",
    )
    out = normalize(nested_df.drop("tags"), spec)
    assert set(out) == {"parents", "kids"}
    parents, kids = out["parents"], out["kids"]
    assert "load_datetime" in parents.columns and "load_datetime" in kids.columns
    assert "meta_geo_city" in parents.columns
    assert kids.count() == 2
    assert set(kids.columns) == {"id", "cid", "v", "load_datetime"}


def test_flatten_is_single_projection(nested_df):
    # one Project node over the scan: no chained selects in the plan
    plan = flatten(nested_df)._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Project") == 1
