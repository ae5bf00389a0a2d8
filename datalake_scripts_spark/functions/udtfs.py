"""Python UDTFs (Spark 4 user-defined TABLE functions).

The engine's UDF policy (SURVEY.md §2.8, U1) bans row-at-a-time scalar
UDFs from hot paths; table functions are the one place a per-row Python
generator is the *intended* API: they extend the engine's SQL surface
with set-returning functions callable as ``..., LATERAL fn(col) t`` —
the composable form of the reference's explode-into-child-table pattern
(monkey_proc.py:294-312) for logic a built-in generator can't express.

Built-in generators (explode/posexplode/split) remain the hot path; the
UDTF is Arrow-backed (``useArrow=True``) so batches move via Arrow, not
pickled rows. Production chunking at 100 TB should still prefer the
pure-native dedup_paragraph_chunks shape; this UDTF exists for the
long-tail of custom set-returning logic and registers into the SQL
catalog (session.register_udtfs) so SQL-only users can call it.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id int, chunk string, chunk_len int", useArrow=True)
class ChunkText:
    """Fixed-width character chunker: yields 1-based ``chunk_id`` and
    the ``size``-char slice. NULL/empty text yields no rows (child-table
    semantics, like explode of an empty array)."""

    def eval(self, text: str, size: int):
        if not text or size is None or size <= 0:
            return
        for start in range(0, len(text), size):
            piece = text[start : start + size]
            yield (start // size + 1, piece, len(piece))


def register_udtfs(spark) -> None:
    """Register the engine's table functions into the session catalog
    (idempotent) so they are callable from SQL."""
    spark.udtf.register("chunk_text", ChunkText)
