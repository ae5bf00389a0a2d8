"""Write-time data expectations (Delta Live Tables' expectations
re-expressed on the versioned layer): declarative row-level quality
rules evaluated in ONE pass over the batch, with per-rule violation
counts recorded in the commit metadata and violating rows either
dropped, quarantined to a side table (with the list of failed rules
attached), or escalated to a hard failure.

Semantics (matching DLT):
- a rule is a named SQL boolean over the batch's columns; a row PASSES
  when the predicate is TRUE — NULL counts as a violation (an
  unknowable quality check failed to prove the row good);
- ``warn`` rules only count; ``drop`` rules exclude the row from the
  target (and route it to the quarantine table when one is given);
- ``fail`` rules abort the whole write before anything commits — the
  batch-poisoning guard;
- a rule with NO entry in the actions map is ``warn`` — DLT's bare
  ``@expect`` is warn-only, so porting a DLT rule set without an
  actions map must not silently lose rows.

Scale shape: the violation vector is a single projected array column
(``filter`` over a rule-name literal array — native HOFs, no UDF), so
expectations add one map-side pass, zero shuffles, and the counts ride
the same ``observe()`` channel the DML counters use (no second scan).

Reference parity: the reference's only validation is a post-write
count-and-sample job gated by TEST=True (zoom_proc.py:266-312); this
is that idea made declarative, row-level, and enforced BEFORE commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ACTIONS = ("warn", "drop", "fail")


class ExpectationsFailed(ValueError):
    """A ``fail``-action rule had violations: nothing was committed."""

    def __init__(self, counts: dict[str, int]):
        self.counts = counts
        super().__init__(
            "fail-action expectation(s) violated: "
            + ", ".join(f"{k}={v}" for k, v in counts.items())
        )


def _violations_col(rules: dict[str, str]):
    """Array of failed rule names per row — one expression, no UDF.
    NULL predicate results count as violations."""
    pairs = [
        F.when(
            F.coalesce(F.expr(sql), F.lit(False)), F.lit(None)
        ).otherwise(F.lit(name))
        for name, sql in rules.items()
    ]
    return F.array_compact(F.array(*pairs))


def apply_expectations(
    df: DataFrame,
    rules: dict[str, str],
    actions: dict[str, str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (kept, quarantined) by the ``drop``/``fail``
    rules; ``warn`` rules never exclude rows, and a rule absent from
    ``actions`` defaults to ``warn`` (DLT's bare ``@expect``). The
    quarantined frame carries every original column plus
    ``_violations`` (array<string> of failed rule names — warn rules
    included, so the quarantine record is the complete diagnosis).
    Lazy: callers pay one scan per frame they actually use."""
    actions = actions or {}
    for name, act in actions.items():
        if name not in rules:
            raise ValueError(f"action for unknown rule {name!r}")
        if act not in _ACTIONS:
            raise ValueError(f"unknown action {act!r} (use {_ACTIONS})")
    excluding = {
        n: s
        for n, s in rules.items()
        if actions.get(n, "warn") in ("drop", "fail")
    }
    with_v = df.withColumn("_violations", _violations_col(rules))
    excl_names = F.array(*[F.lit(n) for n in excluding]) if excluding \
        else F.array().cast("array<string>")
    is_kept = F.size(F.array_intersect(F.col("_violations"), excl_names)) == 0
    kept = with_v.filter(is_kept).drop("_violations")
    quarantined = with_v.filter(~is_kept)
    return kept, quarantined


def write_versioned_with_expectations(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    rules: dict[str, str],
    actions: dict[str, str] | None = None,
    quarantine_dir: str | None = None,
    mode: str = "append",
    quarantine_meta: dict | None = None,
    **write_kwargs,
) -> tuple[int, dict[str, int]]:
    """Validate-then-commit: evaluate ``rules`` over the batch, raise
    :class:`ExpectationsFailed` (committing NOTHING) if any
    ``fail``-action rule has violations, quarantine or drop the rows
    failing ``drop`` rules, write the clean remainder through
    :func:`versioned.write_versioned`, and record the per-rule
    violation counts in the commit's ``meta.expectations`` so the
    quality history is itself time-travelable. Rules without an entry
    in ``actions`` are ``warn`` (count-only — DLT parity). Returns
    ``(version, counts)``.

    Counting costs one aggregate over the batch (rule-name explode of
    the violation vector — map-side partials, one tiny row per rule);
    the fail gate needs the counts BEFORE commit, so this is the
    price of the batch-poisoning guarantee."""
    from .versioned import write_versioned

    actions = actions or {}
    kept, quarantined = apply_expectations(df, rules, actions)
    # one aggregate: per-rule violation counts over the whole batch
    with_v = df.withColumn("_violations", _violations_col(rules))
    counts = {n: 0 for n in rules}
    for r in (
        with_v.select(F.explode("_violations").alias("rule"))
        .groupBy("rule")
        .count()
        .collect()
    ):  # O(rules) driver rows
        counts[r["rule"]] = r["count"]
    failed = {
        n: c
        for n, c in counts.items()
        if actions.get(n, "warn") == "fail" and c > 0
    }
    if failed:
        raise ExpectationsFailed(failed)
    if quarantine_dir is not None:
        # replay safety (streaming epochs): if this quarantine epoch
        # already landed, the crash was between the quarantine write
        # and the main commit — don't double-quarantine
        from .versioned import has_meta

        epoch = (quarantine_meta or {}).get("epoch")
        already = epoch is not None and has_meta(
            quarantine_dir, "epoch", epoch
        )
        q = quarantined.withColumn(
            "_violations", F.array_join("_violations", ",")
        )
        if not already and q.limit(1).count() > 0:
            write_versioned(
                spark, q, quarantine_dir, mode="append",
                meta={
                    "quarantined_from": table_dir,
                    **(quarantine_meta or {}),
                },
            )
    version = write_versioned(
        spark, kept, table_dir, mode=mode,
        meta={**write_kwargs.pop("meta", {}), "expectations": counts},
        **write_kwargs,
    )
    return version, counts
