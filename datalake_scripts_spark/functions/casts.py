"""Typed casts — the 4 timestamp format families + array->CSV observed in
the reference (SURVEY.md §1.2), as named functions so callers must choose
a semantics explicitly (risk 3: one ``to_timestamp`` name, two meanings —
string patterns vs epoch seconds, ``vk_proc.py:170-173`` vs
``monkey_proc.py:131``)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO = "yyyy-MM-dd'T'HH:mm:ss"  # SurveyMonkey (monkey_proc.py:129-136)
ISO_Z = "yyyy-MM-dd'T'HH:mm:ss'Z'"  # Zoom (zoom_proc.py:141-144)
FRACTIONAL = "yyyy-MM-dd HH:mm:ss.SSS"  # jhub log body (jhub_proc.py:162-169)
FRACTIONAL_NANO = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSS'Z'"  # fluent-bit `time`


def _parse(col: str | Column, fmt: str) -> Column:
    # try_to_timestamp: NULL on malformed input — the pre-ANSI semantics
    # the reference relies on (Spark 4 ANSI to_timestamp would throw).
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def to_ts_iso(col: str | Column) -> Column:
    """ISO-8601 without zone suffix (monkey_proc.py:129-136)."""
    return _parse(col, ISO)


def to_ts_iso_z(col: str | Column) -> Column:
    """ISO-8601 with literal 'Z' (zoom_proc.py:141-144)."""
    return _parse(col, ISO_Z)


def to_ts_fractional(col: str | Column, nano: bool = False) -> Column:
    """Fractional-seconds formats (jhub_proc.py:162-169)."""
    return _parse(col, FRACTIONAL_NANO if nano else FRACTIONAL)


def to_ts_epoch_seconds(col: str | Column) -> Column:
    """Epoch-seconds numeric fields (vk_proc.py:170-173,232-239):
    ``F.timestamp_seconds``, not a format-string parse."""
    return F.timestamp_seconds(F.col(col) if isinstance(col, str) else col)


def array_to_csv(col: str | Column, sep: str = ",") -> Column:
    """array<string> -> delimited string, to fit row-store text columns
    (``F.concat_ws(',', internal_ip_addresses)``, zoom_proc.py:200-203)."""
    return F.concat_ws(sep, F.col(col) if isinstance(col, str) else col)
