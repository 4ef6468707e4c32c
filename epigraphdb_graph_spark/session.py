"""SparkSession factory.

Replaces the reference's process-level parallelism knobs
(``snakemake -j``, ``mp.Pool(THREADS)`` — reference
workflow/Snakefile:204-259, workflow/scripts/graph_build/merge_sources.py:97-109)
with Spark partition parallelism, and its manual pruning/early-filter
techniques with Catalyst (AQE, pushdown, broadcast).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "epigraphdb_graph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — the default
    200 over-parallelizes small local runs and under-parallelizes huge ones.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # match parallelism implied by the master string where possible
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(int(master[6:-1]), 4)
        else:
            shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # KB-scale page payloads: the default 10000-row Arrow batches are
        # ~70MB each and stall the JVM<->python pipeline (measured 2.5x
        # slower extraction); ~2k rows keeps batches ~15MB and streaming
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # preallocate heap: in single-JVM local mode the first heavy batch
        # otherwise pays tens of seconds of incremental heap growth + GC
        .config("spark.driver.extraJavaOptions", "-Xms8g")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # v2 commit: task-side file moves (the v1 driver-side serial rename
        # pass is a pure Amdahl serial term for many-file snapshot commits)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, env_conf.split(",")):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executor Python workers regardless of
    cwd (the --py-files story; pandas UDFs pickle module references)."""
    try:
        from .packaging import build_pyfiles_zip

        spark.sparkContext.addPyFile(build_pyfiles_zip())
    except Exception:
        # already added for this context, or read-only FS — non-fatal when
        # the package is importable via PYTHONPATH anyway
        pass
