"""SparkSession builder with engine defaults.

Replaces the reference's five copy-pasted ``SparkConf`` blocks
(``zoom_proc.py:52-63``, ``monkey_proc.py:44-56``, ``vk_proc.py:44-56``,
``jhub_proc.py:45-57``) with one builder. Differences from the reference,
on purpose:

- ``SparkSession.builder`` instead of ``SparkContext(conf)``.
- AQE + partition coalescing on (runtime re-plan, skew-join handling).
- Arrow enabled for any pandas interop (vectorized exchange).
- UTC session timezone (deterministic timestamp semantics; DuckDB-oracle
  comparable).
- ``spark.sql.legacy.parquet.nanosAsLong`` so TIMESTAMP(NANOS) parquet
  (the ``events`` fixture) is readable; the io layer converts to
  microsecond timestamps.
- shuffle partitions sized to cores, not the 200 default.

S3A tuning from the reference (multipart 100 MB, block 32 MB, 256
threads — ``zoom_proc.py:57-63``) is kept behind the ``s3`` profile for
real-cluster use; it is inert locally.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ENGINE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE coalesces by BYTES; stages whose per-row cost is CPU (the
    # interpreted vector folds in the similarity/dedup family — tiny
    # rows, thousands of arithmetic ops each) get squeezed onto one
    # task by the default 1 MiB floor. 64 KiB keeps such stages at
    # cluster parallelism while still folding genuinely-empty shuffle
    # partitions; byte-heavy stages are unaffected (their partitions
    # exceed any floor).
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.ui.enabled": "false",
}

# Reference S3A profile (zoom_proc.py:57-63), endpoint left to the caller.
S3A_CONF: dict[str, str] = {
    "spark.hadoop.fs.s3a.multipart.size": str(100 * 1024 * 1024),
    "spark.hadoop.fs.s3a.block.size": str(32 * 1024 * 1024),
    "spark.hadoop.fs.s3a.threads.max": "256",
    "spark.hadoop.fs.s3a.fast.upload": "true",
}


def get_spark(
    app_name: str = "datalake_scripts_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    s3: bool = False,
) -> SparkSession:
    """Build (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores). ``shuffle_partitions`` defaults to the local core count so
    small-scale runs aren't over-parallelized; on a real cluster pass an
    explicit value sized to the data (~2-3x total cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    # local mode defaults to a 1g JVM heap regardless of machine size —
    # with 32 concurrent tasks that starves sort/hash buffers (seen:
    # OOM on 3-way fact self-joins at 6M rows). Static conf: only takes
    # effect for the session that launches the JVM.
    builder = builder.config(
        "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    )
    n_shuffle = shuffle_partitions or (os.cpu_count() or 8)
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    if s3:
        for k, v in S3A_CONF.items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_windowexec_warn(spark)
    return spark


def _silence_windowexec_warn(spark: SparkSession) -> None:
    """Raise the log level of WindowExec's 'No Partition Defined'
    warning. The only unpartitioned windows in this engine run over
    metadata-sized relations (<= 1001-row budget/bucket aggregates —
    deliberate single-partition passes, each annotated at the call
    site), so the per-task warning is pure noise in test and bench
    output. Best-effort via the JVM's log4j2 Configurator; a plain
    driver session without this helper just keeps the warning."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        pass


def apply_runtime_conf(spark: SparkSession) -> None:
    """Best-effort apply of runtime-settable engine conf to a session we
    didn't build (e.g. the verification driver's). Static conf (already
    bound at session start) is skipped silently. Also right-sizes
    shuffle partitions to the local core count if the session still has
    the 200 default (wrong for local runs; AQE coalescing softens but
    doesn't remove the overhead)."""
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    try:
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", str(os.cpu_count() or 8))
    except Exception:
        pass
