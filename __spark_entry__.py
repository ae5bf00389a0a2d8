"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``datalake_scripts_spark``; this module is
the thin contract surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shaped star
    join (scan -> pushed filters -> broadcast dims -> join -> agg) —
    revenue by nation for ASIA, 1996-1997."""
    from datalake_scripts_spark.queries.relational import q5_local_supplier_volume

    return q5_local_supplier_volume(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ scale
    extensions). Each callable takes (spark, sf_dir) and returns a
    DataFrame."""
    from datalake_scripts_spark.queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops: MinHash/SimHash signatures use Spark's
    xxhash64, which has no DuckDB equivalent)."""
    from datalake_scripts_spark.queries import oracle_sql as _oracle_sql

    return _oracle_sql()
