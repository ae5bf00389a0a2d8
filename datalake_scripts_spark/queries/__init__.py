"""Query registry — the engine's graded operator surface.

Every operator family from SURVEY.md §2 (plus the scale extensions:
dedup, similarity, text analysis, streaming-equivalents) is exposed as a
named query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus,
where ANSI-SQL-expressible, a DuckDB oracle SQL string computing the
same result. The driver hash-compares the two at sf=0.01.

Determinism rules (so order-insensitive value hashes match DuckDB):
- money/quantity aggregates go through DECIMAL casts in BOTH engines
  (order-independent exact sums), then CAST AS DOUBLE;
- ratio/avg outputs are double division of exact parts, rounded;
- float-vector math uses the same left-to-right fold formula in both
  engines so IEEE results are bit-identical;
- timestamps are NTZ microseconds, session timezone UTC.
"""

from .registry import REGISTRY, Q, query  # noqa: F401

from . import relational  # noqa: F401,E402
from . import relational2  # noqa: F401,E402
from . import tpch_extra  # noqa: F401,E402
from . import tpch_extra2  # noqa: F401,E402
from . import functions_extra  # noqa: F401,E402
from . import normalize  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import events  # noqa: F401,E402
from . import scale  # noqa: F401,E402
from . import traindata  # noqa: F401,E402
from . import sketches  # noqa: F401,E402


def queries():
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql():
    return {name: q.sql for name, q in REGISTRY.items() if q.sql is not None}


def headline_queries():
    return {name: q.fn for name, q in REGISTRY.items() if q.headline}
