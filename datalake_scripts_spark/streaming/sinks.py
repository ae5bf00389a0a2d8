"""Streaming sinks via foreachBatch — each micro-batch reuses the batch
sink implementations (io.write_parquet / io.write_jdbc), giving the
reference's dual-sink pattern (Parquet staging + JDBC serving,
zoom_proc.py:399-400) exactly-once semantics under checkpointing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def foreach_batch_parquet(path: str, mode: str = "append"):
    from ..io import write_parquet

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_parquet(batch_df, path, mode=mode)

    return _sink


def foreach_batch_jdbc(url: str, table: str, properties: dict | None = None):
    from ..io import write_jdbc

    def _sink(batch_df: DataFrame, epoch_id: int) -> None:
        write_jdbc(batch_df, url, table, mode="append", properties=properties)

    return _sink
