"""Shuffle-budget regression gate (VERDICT r6 ask #5): the top
shuffle-volume registry queries have their shuffle-write bytes FROZEN
in tests/shuffle_budgets.json (scripts/freeze_shuffle_budgets.py);
this test re-measures each under the same harness and fails when one
inflates past tolerance — a lost broadcast hint, an un-pushed filter,
or a new wide exchange shows up here BEFORE it costs a bench round.

README's shuffle claims were evidence; this makes them enforcement
(the same promotion test_plan_shapes.py did for plan shapes)."""

from __future__ import annotations

import json
import os

from datalake_scripts_spark.operators.shufflemeter import (
    measure_query_shuffle,
    max_stage_id,
    shuffle_totals_since,
)
from datalake_scripts_spark.queries import REGISTRY

BUDGETS_PATH = os.path.join(os.path.dirname(__file__), "shuffle_budgets.json")

# 1.5x relative tolerance (the VERDICT-agreed bound: parquet page
# boundaries and AQE coalescing wiggle, a plan regression doesn't) AND
# a 4 KiB absolute floor so the sub-KB budgets (broadcast-join and
# map-only headline queries) can't flake on framing bytes. Shuffle
# bytes at a fixed SF are plan-deterministic, so the relative term
# carries the real tolerance; the floor must stay SMALL or it hides
# exactly the regression this gate exists for (a lost broadcast on a
# near-zero-shuffle query adds ~30 KB at sf0.001 — measured).
TOLERANCE = 1.5
ABS_FLOOR = 4 * 1024


def test_frozen_shuffle_budgets_hold(spark, sf_dir):
    with open(BUDGETS_PATH) as fh:
        frozen = json.load(fh)
    # budgets are only meaningful under the harness they were frozen
    # at: PIN the shuffle partitioning for the measurement (the shared
    # suite session may arrive with a different runtime value from an
    # earlier test) and restore it after
    assert frozen["sf_dir"] == sf_dir
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(frozen["shuffle_partitions"])
    )
    try:
        over: dict[str, str] = {}
        for name, budget in frozen["budgets"].items():
            assert name in REGISTRY, f"budgeted query {name} left the registry"
            _n, totals = measure_query_shuffle(
                spark, REGISTRY[name].fn, spark, sf_dir
            )
            w = totals["shuffle_write"]
            if w > budget * TOLERANCE and w - budget > ABS_FLOOR:
                over[name] = (
                    f"shuffled {w / 1e6:.2f} MB vs frozen budget "
                    f"{budget / 1e6:.2f} MB (> {TOLERANCE}x) — plan "
                    "regression; if deliberate, re-freeze via "
                    "scripts/freeze_shuffle_budgets.py"
                )
        assert over == {}, over
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)


def test_meter_catches_a_broken_broadcast(spark, sf_dir):
    """The gate's teeth, demonstrated: the same dim join measured with
    and without its broadcast. The shuffle-join variant must blow a
    budget frozen from the broadcast plan by far more than the
    tolerance — i.e. deleting an F.broadcast hint WOULD trip the gate."""
    from pyspark.sql import functions as F

    from datalake_scripts_spark.io import read_table

    lineitem = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part")

    def run(join_df):
        before = max_stage_id(spark)
        join_df.groupBy("p_brand").count().count()
        return shuffle_totals_since(spark, before)["shuffle_write"]

    # bcast: part is SF-bounded small-dim at test scale; the point here
    # is the delta vs the deliberately-broken variant
    good = run(
        lineitem.join(
            F.broadcast(part), lineitem.l_partkey == part.p_partkey
        )
    )
    broken = run(
        lineitem.hint("shuffle_hash").join(
            part.hint("shuffle_hash"),
            lineitem.l_partkey == part.p_partkey,
        )
    )
    # the demo join is tiny at sf0.001, so assert the RELATIVE blow-up
    # (the gate's 1.5x) rather than the absolute floor — the frozen
    # budgets themselves (0.1-1.1 MB) sit far above ABS_FLOOR, so a
    # lost broadcast on a budgeted query clears both conditions
    assert broken > good * TOLERANCE * 2 and broken - good > 10_000, (
        f"broken-broadcast shuffle {broken} should exceed broadcast "
        f"shuffle {good} by far more than the gate tolerance"
    )
