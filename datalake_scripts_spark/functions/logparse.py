"""Bracketed log-line parsing — native-expression rewrite of the
reference's only UDF (``sqbrackets``, ``jhub_proc.py:133-146``).

The UDF splits ``"[I 2023-01-01 12:00:00.000 JupyterHub app:123] msg"``
into (head, ts, service, type, code, msg); on malformed lines (no
``[...]`` prefix) it returns all-empty fields with the whole line as msg
(``jhub_proc.py:142-145``). Row-at-a-time Python is ~100x too slow at
scale; ``regexp_extract`` is JVM-side and whole-stage-codegen'd, and
reproduces the fallback exactly because unmatched groups yield ''.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# [<head> <date> <time> <service> <type>:<code>] <msg>
_LOG_RE = (
    r"^\[([A-Z]) (\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}\.\d+) "
    r"(\S+) ([A-Za-z_]+):(\d+)\] (.*)$"
)


def parse_bracketed_log(col: str | Column) -> list[Column]:
    """Return the 6 parsed columns (head, log_ts, service, type, code, msg).

    Malformed-line fallback matches jhub_proc.py:142-145: empty strings
    everywhere, original line as msg.
    """
    c = F.col(col) if isinstance(col, str) else col
    matched = c.rlike(_LOG_RE)
    fields = []
    names = ["head", "log_ts", "service", "type", "code"]
    for i, name in enumerate(names, start=1):
        fields.append(F.regexp_extract(c, _LOG_RE, i).alias(name))
    msg = F.when(matched, F.regexp_extract(c, _LOG_RE, 6)).otherwise(c).alias("msg")
    fields.append(msg)
    return fields


def with_parsed_log(df: DataFrame, col: str = "log") -> DataFrame:
    """Project the 6 parsed fields next to the original columns
    (replaces ``jhub_proc.py:148-161``: UDF -> array -> 6 indexed cols)."""
    return df.select("*", *parse_bracketed_log(col))
