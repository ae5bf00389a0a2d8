"""Schema data-contracts: reader/writer compatibility checking.

The reference evolves schemas through a side-channel DDL connection
(SURVEY.md §2.1 S7); the versioned layer replaces that with
writer-side enforcement (`versioned._evolve_schema`: no silent
widening, mergeSchema opt-in). This module adds the CONSUMER half —
the check a downstream job runs against a table's current schema
before (or instead of) failing mid-pipeline, and the policy gate a
producer runs before publishing an evolved schema:

- :func:`read_compat(producer, consumer)` — can data written with
  ``producer`` be read through the ``consumer`` contract? Field-level,
  recursive through structs/arrays/maps, with the standard safe
  upcasts (int widening, float->double) allowed because the reader
  can apply them losslessly.
- :func:`schema_compat(old, new, mode)` — evolution policy between
  two versions of a schema: ``backward`` (readers pinned to ``old``
  still work on ``new`` data — the default lake guarantee),
  ``forward`` (readers of ``new`` can read not-yet-rewritten ``old``
  data), ``full`` (both).

Both return a list of human-readable violation strings (empty = ok) so
callers can raise, log, or gate as policy dictates. Pure functions over
StructType — no session, no I/O.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DataType,
    MapType,
    StructType,
)

# reader-side lossless upcasts: data written as KEY may be read through
# a contract declaring any type in VALUE (Parquet/Spark upcast rules)
_WIDENINGS: dict[str, set[str]] = {
    "tinyint": {"smallint", "int", "bigint"},
    "smallint": {"int", "bigint"},
    "int": {"bigint"},
    "float": {"double"},
}


def _readable_as(producer: DataType, consumer: DataType, path: str,
                 out: list[str]) -> None:
    if isinstance(producer, StructType) and isinstance(consumer, StructType):
        _struct_compat(producer, consumer, path, out)
        return
    if isinstance(producer, ArrayType) and isinstance(consumer, ArrayType):
        if producer.containsNull and not consumer.containsNull:
            out.append(
                f"{path}: producer array may hold nulls but the contract "
                "declares non-null elements"
            )
        _readable_as(
            producer.elementType, consumer.elementType, f"{path}[]", out
        )
        return
    if isinstance(producer, MapType) and isinstance(consumer, MapType):
        if producer.valueContainsNull and not consumer.valueContainsNull:
            out.append(
                f"{path}: producer map may hold null values but the "
                "contract declares non-null values"
            )
        _readable_as(producer.keyType, consumer.keyType, f"{path}<key>", out)
        _readable_as(
            producer.valueType, consumer.valueType, f"{path}<value>", out
        )
        return
    p, c = producer.simpleString(), consumer.simpleString()
    if p == c:
        return
    if c in _WIDENINGS.get(p, ()):  # reader upcasts losslessly
        return
    out.append(f"{path}: type {p} is not readable as {c}")


def _struct_compat(producer: StructType, consumer: StructType, path: str,
                   out: list[str]) -> None:
    by_name = {f.name: f for f in producer.fields}
    for cf in consumer.fields:
        fpath = f"{path}.{cf.name}" if path else cf.name
        pf = by_name.get(cf.name)
        if pf is None:
            # a missing column is only fine if the contract tolerates
            # nulls there (the scan fills it with nulls)
            if not cf.nullable:
                out.append(
                    f"{fpath}: required by the contract but absent from "
                    "the producer schema"
                )
            continue
        if pf.nullable and not cf.nullable:
            out.append(
                f"{fpath}: producer may write nulls but the contract "
                "declares the column non-nullable"
            )
        _readable_as(pf.dataType, cf.dataType, fpath, out)
    # producer-only columns are fine: the reader projects them away


def read_compat(producer: StructType, consumer: StructType) -> list[str]:
    """Violations preventing ``consumer``-contract reads over data
    written with ``producer`` (empty list = compatible)."""
    out: list[str] = []
    _struct_compat(producer, consumer, "", out)
    return out


def schema_compat(old: StructType, new: StructType,
                  mode: str = "backward") -> list[str]:
    """Evolution-policy check between two schema versions.

    backward: consumers pinned to ``old`` keep working after producers
    switch to ``new`` (the default guarantee a lake table owes its
    readers). forward: consumers upgraded to ``new`` can still read
    old files (what a non-rewriting evolution needs). full: both.
    """
    if mode == "backward":
        return read_compat(new, old)
    if mode == "forward":
        return read_compat(old, new)
    if mode == "full":
        back = [f"backward: {v}" for v in read_compat(new, old)]
        fwd = [f"forward: {v}" for v in read_compat(old, new)]
        return back + fwd
    raise ValueError(f"unknown mode {mode!r} (backward | forward | full)")
