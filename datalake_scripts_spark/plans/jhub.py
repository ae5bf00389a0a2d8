"""JupyterHub fluent-bit log pipeline -> jhublogs table (reference:
jhub_proc.py).

Output contract (jhub_proc.py:150-161, 304-318): time_stamp,
kuber_container_name, kuber_host, kuber_pod_name, log_head,
log_timestamp, log_service, log_type, log_code, log_msg.

Engine differences: the row-at-a-time ``sqbrackets`` UDF
(jhub_proc.py:133-148) becomes native regexp_extract
(functions.logparse — whole-stage codegen, ~100x at scale), keeping the
malformed-line fallback; the hour-granular path globs
(jhub_proc.py:258-276) become partition-column pruning or a streaming
file source (streaming.windows.stream_from_directory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.casts import to_ts_fractional
from ..functions.logparse import parse_bracketed_log
from ..io import read_json
from . import schemas


def jhub_transform(raw: DataFrame) -> DataFrame:
    """The parse/typing transform, shared verbatim by the batch and
    streaming paths (Structured Streaming incrementalizes it)."""
    parsed = raw.select(
        F.col("time").alias("time_stamp"),
        F.col("kubernetes.container_name").alias("kuber_container_name"),
        F.col("kubernetes.host").alias("kuber_host"),
        F.col("kubernetes.pod_name").alias("kuber_pod_name"),
        *parse_bracketed_log("log"),
    )
    return parsed.select(
        to_ts_fractional("time_stamp", nano=True).alias("time_stamp"),
        "kuber_container_name",
        "kuber_host",
        "kuber_pod_name",
        F.col("head").alias("log_head"),
        to_ts_fractional("log_ts").alias("log_timestamp"),
        F.col("service").alias("log_service"),
        F.col("type").alias("log_type"),
        F.col("code").alias("log_code"),
        F.col("msg").alias("log_msg"),
    )


def jhub_logs_table(spark: SparkSession, path: str) -> DataFrame:
    """Batch: glob/partition read -> transform (jhub_proc.py parity)."""
    return jhub_transform(read_json(spark, path, schema=schemas.JHUB_LOG))


def jhub_logs_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming: file-source readStream over the landing directory —
    the event-time replacement for the reference's hour-glob cron runs
    (jhub_proc.py:258-276). New log files become micro-batches; pair
    with streaming.sinks.foreach_batch_parquet/_jdbc for the dual sink,
    and a checkpoint dir for exactly-once."""
    raw = (
        spark.readStream.format("json")
        .schema(schemas.JHUB_LOG)
        .load(path)
    )
    return jhub_transform(raw)
