"""Plan linter — automated detection of the plan shapes that break at
scale. The same checks the plan-shape tests make by hand, packaged as a
library call so pipelines can gate on them (e.g. in CI, or before
promoting a query to a 100 TB run).

Checks are string-level over ``explain('formatted')`` output: coarse,
but they catch the expensive regressions — cartesian products,
row-at-a-time Python evaluation, full scans that should prune, and
single-reducer global windows.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    rule: str
    detail: str


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def lint_plan(df: DataFrame, expect_pruned_columns: int | None = None) -> list[Finding]:
    """Return findings for scale anti-patterns in the physical plan."""
    plan = plan_text(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan or (
        "BroadcastNestedLoopJoin" in plan and re.search(r"\bCross\b", plan)
    ):
        # condition-bearing BNLJ (e.g. a broadcast range join) is fine;
        # a Cross-type BNLJ or CartesianProduct multiplies partitions
        findings.append(
            Finding("cartesian-product", "unconstrained cross join in plan")
        )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "row-python-udf",
                "row-at-a-time Python UDF (use built-ins or Arrow pandas UDFs)",
            )
        )
    # a window/sort over an empty partition spec funnels ALL rows to one
    # task (explain('formatted') prints it as an Exchange with
    # SinglePartition arguments). Exception: Catalyst's injected runtime
    # bloom filter merges per-partition fixed-size sketches through a
    # SinglePartition exchange (bloom_filter_agg in the lines just
    # above) — that is the optimizer preventing a big shuffle, not
    # causing one, and it can appear in ANY join once stats warrant it.
    if "TakeOrderedAndProject" not in plan:
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "SinglePartition" not in line:
                continue
            ctx = "\n".join(lines[max(0, i - 10): i])
            if "bloom_filter_agg" in ctx:
                continue
            findings.append(
                Finding(
                    "single-partition-exchange",
                    "all rows funneled to one task (global window/sort without "
                    "partitioning or limit)",
                )
            )
            break
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        # only a hint: a filter above an un-pushed scan
        if "Filter" in plan:
            findings.append(
                Finding(
                    "no-pushed-filters",
                    "scan has no pushed filters while the plan filters rows "
                    "(non-pushable predicate, or filter above a non-scan source)",
                )
            )
            break
    if expect_pruned_columns is not None:
        schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
        for s in schemas:
            n = len([c for c in s.split(",") if c])
            if n > expect_pruned_columns:
                findings.append(
                    Finding(
                        "column-pruning",
                        f"scan reads {n} columns, expected <= {expect_pruned_columns}",
                    )
                )
    return findings
