"""Constraint validation + write-audit-publish for versioned tables.

The reference validates loads by re-counting after every write
(``check_loaded``, zoom_proc.py:266-312 — a full job per check, and the
bad data is already live when the check fails). This module replaces
that with the production pattern:

- :func:`validate` — declarative row-level constraints (not-null,
  range, enum, regex, uniqueness, referential integrity) evaluated in
  ONE aggregation pass over the data (plus one anti-join per FK rule),
  returning a per-rule violation report;
- :func:`write_audit_publish` — stage the batch's files into the
  versioned table dir WITHOUT committing, audit the STAGED files
  (exactly the bytes readers would see), and only then commit the
  manifest. A failed audit deletes the staged files and leaves the
  table untouched — readers keep the previous snapshot, which is
  exactly what the reference's DROP-then-reload window cannot
  guarantee (SURVEY.md §1.1).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One declarative constraint; build via the helper constructors."""

    name: str
    kind: str  # not_null | range | enum | regex | unique | foreign_key
    column: str
    low: Any = None
    high: Any = None
    values: tuple = ()
    pattern: str = ""
    ref: DataFrame | None = field(default=None, compare=False)
    ref_column: str = ""


def not_null(column: str) -> Rule:
    return Rule(f"not_null({column})", "not_null", column)


def in_range(column: str, low, high) -> Rule:
    return Rule(f"range({column})", "range", column, low=low, high=high)


def is_in(column: str, values) -> Rule:
    return Rule(f"enum({column})", "enum", column, values=tuple(values))


def matches(column: str, pattern: str) -> Rule:
    return Rule(f"regex({column})", "regex", column, pattern=pattern)


def unique(column: str) -> Rule:
    return Rule(f"unique({column})", "unique", column)


def foreign_key(column: str, ref: DataFrame, ref_column: str) -> Rule:
    return Rule(
        f"fk({column}->{ref_column})",
        "foreign_key",
        column,
        ref=ref,
        ref_column=ref_column,
    )


def _violation_expr(rule: Rule):
    """Boolean column: True where the row VIOLATES the rule. NULL
    semantics: range/enum/regex rules pass NULLs (compose with
    not_null to forbid them) — the SQL-standard CHECK behavior."""
    c = F.col(rule.column)
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "range":
        bad = F.lit(False)
        if rule.low is not None:
            bad = bad | (c < F.lit(rule.low))
        if rule.high is not None:
            bad = bad | (c > F.lit(rule.high))
        return c.isNotNull() & bad
    if rule.kind == "enum":
        return c.isNotNull() & ~c.isin(*rule.values)
    if rule.kind == "regex":
        return c.isNotNull() & ~c.rlike(rule.pattern)
    raise ValueError(f"row-expressible rule expected, got {rule.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations BIGINT, ok
    BOOLEAN) with one row per rule.

    Cost model (the reason this replaces count-per-check): every
    row-expressible rule (not_null/range/enum/regex) is a SUM(CASE)
    inside ONE partial-aggregated pass over ``df`` — adding a rule adds
    an expression, not a job. ``unique`` folds into the same pass
    pattern via count-distinct-vs-count on a second tiny agg; each
    ``foreign_key`` costs one left-anti join against the (usually
    broadcastable) reference keys. The report is rules-sized."""
    row_rules = [r for r in rules if r.kind in ("not_null", "range", "enum", "regex")]
    uniq_rules = [r for r in rules if r.kind == "unique"]
    fk_rules = [r for r in rules if r.kind == "foreign_key"]
    parts: list[DataFrame] = []
    if row_rules or uniq_rules:
        aggs = [
            F.sum(_violation_expr(r).cast("long")).alias(f"_r{i}")
            for i, r in enumerate(row_rules)
        ]
        # unique: violations = n_rows - n_distinct (counts every extra
        # occurrence beyond the first; NULLs count toward duplicates of
        # the NULL key only if present >1 time via the count_distinct
        # NULL exclusion + explicit null tally)
        for j, r in enumerate(uniq_rules):
            aggs.append(
                (
                    F.count(F.col(r.column))
                    - F.count_distinct(F.col(r.column))
                ).alias(f"_u{j}")
            )
        one = df.agg(*aggs)
        structs = [
            F.struct(
                F.lit(r.name).alias("rule"),
                F.coalesce(F.col(f"_r{i}"), F.lit(0)).cast("bigint").alias("n"),
            )
            for i, r in enumerate(row_rules)
        ] + [
            F.struct(
                F.lit(r.name).alias("rule"),
                F.coalesce(F.col(f"_u{j}"), F.lit(0)).cast("bigint").alias("n"),
            )
            for j, r in enumerate(uniq_rules)
        ]
        stacked = one.select(F.explode(F.array(*structs)).alias("s")).select(
            F.col("s.rule").alias("rule"), F.col("s.n").alias("n_violations")
        )
        parts.append(stacked)
    for r in fk_rules:
        keys = r.ref.select(F.col(r.ref_column).alias(r.column)).distinct()
        orphans = (
            df.filter(F.col(r.column).isNotNull())
            .join(keys, r.column, "left_anti")
            .agg(F.count(F.lit(1)).alias("n_violations"))
            .select(F.lit(r.name).alias("rule"), "n_violations")
        )
        parts.append(orphans)
    if not parts:
        return df.sparkSession.createDataFrame(
            [], "rule string, n_violations bigint, ok boolean"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule",
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("ok"),
    )


class AuditFailed(RuntimeError):
    """Raised by write_audit_publish when staged data violates rules;
    carries the violation report rows."""

    def __init__(self, report: list):
        self.report = report
        lines = ", ".join(f"{r['rule']}={r['n_violations']}" for r in report)
        super().__init__(f"audit failed: {lines}")


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    rules: list[Rule],
    mode: str = "append",
    meta: dict | None = None,
    bloom_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> int:
    """Write-Audit-Publish: stage ``df``'s files into the table dir,
    audit the STAGED files (re-read from disk — what readers would
    see, catching writer-side surprises like type coercion), then
    commit the manifest. On violation, staged files are removed, the
    table pointer never moves, and :class:`AuditFailed` carries the
    per-rule report. Returns the committed version on success.

    The audit scans only the new batch's files (delta-proportional,
    like every incremental op in the versioned layer); table-level
    invariants (cross-batch uniqueness) belong in a post-commit
    validate() over read_versioned."""
    from .versioned import (
        _commit_manifest,
        _evolve_schema,
        _load_manifest,
        _stats_for_new_files,
        current_version,
    )

    assert mode in ("append", "overwrite")
    from .commitstore import get_commit_store

    get_commit_store().ensure_log(table_dir)
    # same schema enforcement as write_versioned, BEFORE staging
    table_schema = df.schema
    prev0 = current_version(table_dir)
    if mode == "append" and prev0 > 0:
        prev_schema_json = _load_manifest(table_dir, prev0).get("schema")
        if prev_schema_json:
            from pyspark.sql.types import StructType

            table_schema = _evolve_schema(
                StructType.fromJson(prev_schema_json), df.schema, False
            )
    from .versioned import (
        _field_physical,
        _normalize_spec,
        _physical_schema_json,
        _physicalize_cols,
        _resolve_mapping,
        _stage_with_spec,
    )

    prev_manifest0 = _load_manifest(table_dir, prev0) if prev0 > 0 else {}
    table_schema_json = _resolve_mapping(
        table_schema.jsonValue(), prev_manifest0, mode
    )
    new_files = _stage_with_spec(
        df, table_dir, _normalize_spec(partition_by), table_schema_json
    )
    staged = spark.read.parquet(
        *[os.path.join(table_dir, f) for f in new_files]
    )
    # audit rules name LOGICAL columns; staged files are physical
    from pyspark.sql import functions as F

    staged = staged.select(
        *[
            F.col(_field_physical(f)).alias(f["name"])
            for f in table_schema_json["fields"]
            if _field_physical(f) in staged.columns
        ]
    )
    report = [r.asDict() for r in validate(staged, rules).collect()]
    if any(row["n_violations"] > 0 for row in report):
        for f in new_files:
            os.remove(os.path.join(table_dir, f))
        raise AuditFailed([row for row in report if row["n_violations"] > 0])
    new_stats = _stats_for_new_files(
        table_dir, new_files, _physical_schema_json(table_schema_json)
    )
    # optimistic-concurrency retry, same shape as write_versioned's:
    # the audit covered only OUR staged files, so a concurrent commit
    # between audit and publish auto-merges safely — re-read the new
    # latest manifest and commit on top (CommitConflict = lost CAS race)
    from .versioned import (
        CommitConflict,
        _augment_blooms,
        _expand_manifest,
        _write_manifest_chunks,
    )

    augmented: set[str] = set()
    last_conflict = None
    for _ in range(16):
        prev = current_version(table_dir)
        files, stats = new_files, new_stats
        # mirror write_versioned's bloom contract: None inherits the
        # table's config (append AND overwrite — a publish must not
        # silently drop point-lookup pruning), [] clears it explicitly
        effective_blooms = bloom_cols if bloom_cols else None
        if prev > 0:
            prev_manifest = _load_manifest(table_dir, prev)
            if bloom_cols is None:
                effective_blooms = prev_manifest.get("bloom_cols")
            if mode == "append":
                pfiles, pstats = _expand_manifest(table_dir, prev_manifest)
                files = pfiles + new_files
                stats = {**pstats, **new_stats}
        missing = set(effective_blooms or []) - augmented
        if missing:
            _augment_blooms(
                table_dir,
                new_files,
                new_stats,
                _physicalize_cols(sorted(missing), table_schema_json),
                0.01,
            )
            augmented |= missing
        # chunked tables stay chunked across an audited publish (the
        # WAP commit re-chunks the full post-publish file set)
        chunking = (
            prev_manifest.get("manifest_chunking") if prev > 0 else None
        )
        chunks = (
            _write_manifest_chunks(table_dir, files, stats, chunking)
            if chunking
            else None
        )
        try:
            return _commit_manifest(
                table_dir,
                files,
                stats,
                mode,
                table_schema_json,
                {**(meta or {}), "audited": [r.name for r in rules]},
                bloom_cols=effective_blooms,
                expected_version=prev,
                chunks=chunks,
                manifest_chunking=chunking,
                # audited APPENDS never touch prior files, so their
                # deletion vectors carry; an overwrite resets them
                dvs=(
                    prev_manifest.get("dvs")
                    if prev > 0 and mode == "append"
                    else None
                ),
            )
        except CommitConflict as c:
            last_conflict = c
            continue
    raise last_conflict
