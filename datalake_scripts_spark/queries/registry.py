from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..io import read_table


@dataclass
class Q:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None = None
    headline: bool = False
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def query(name: str, sql: str | None = None, headline: bool = False):
    """Register a query impl; ``sql`` is the DuckDB oracle (None for
    non-SQL-expressible operators -> driver does a rows-only check)."""

    def deco(fn):
        REGISTRY[name] = Q(fn=fn, sql=sql, headline=headline, doc=fn.__doc__ or "")
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)
