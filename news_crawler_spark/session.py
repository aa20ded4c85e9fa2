"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[N]`` (one JVM); the configuration is
chosen so the same code runs unchanged on a multi-executor cluster via
``spark-submit --py-files`` — nothing here assumes a single node.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "news_crawler_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → ``local[*]``. ``shuffle_partitions`` defaults to the
    core count: at 100 TB on a real cluster this is overridden to
    ~2-3× total executor cores (AQE coalesces the excess), but for
    local parquet in the tens-of-MB range, cores is right.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        n = int(env) if env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        n = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # engine semantics are try_*/null-on-error (the reference's
        # catch-and-drop behavior); Spark 4 defaults ANSI on — the
        # driver-contract queries are written to be correct either way
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch size bounds the PEAK bytes a pandas-UDF exchange
        # holds per core (batch rows × row width, materialized on both
        # the JVM writer and the python worker). HTML pages run ~5 KiB,
        # so 10k-row batches were ~50 MiB live per core — at 8 concurrent
        # tasks that churn beat the cache/allocator hard. Interleaved A/B
        # at mult=384/K=128: 8-core task time 706.8→577.7 s and wall
        # 116.8→94.9 s at 2000 rows, while the 2-core arm is unchanged
        # (456.3 vs 453.2 s) — i.e. this is pure parallel-contention
        # overhead, and removing it is a direct scaling-efficiency win.
        # 1000 and 4000 measure the same as 2000 (flat basin).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # long-lived micro-batch drivers: localCheckpoint RDDs and
        # per-window broadcasts are reclaimed by the ContextCleaner only
        # after a JVM GC enqueues their weak refs — the 30min default
        # lets them pile up for an entire run (heap thrash, then OOM)
        .config("spark.cleaner.periodicGC.interval", "2min")
        # content-heavy corpus scans (binary HTML payloads): smaller splits
        # keep scan parallelism up when a partition dir compresses well
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Batch-analytics JVMs want the throughput collector: measured A/B on
    # the crawl pipeline (mult=384, K=128, 8 cores, same results) gives
    # ParallelGC 78.8 s vs G1 87.8 s — G1's concurrent marking competes
    # with executor threads for cores, and pause latency is irrelevant to
    # a batch job. Driver == executor in local mode, so one knob covers
    # both; on a real cluster set spark.executor.extraJavaOptions too.
    gc_opt = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
    if gc_opt and "spark.driver.extraJavaOptions" not in (extra_conf or {}):
        b = b.config("spark.driver.extraJavaOptions", gc_opt)
    if extra_conf:
        for k, v in extra_conf.items():
            b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
