"""SparkSession factory tuned for the engine.

Local-mode knobs stand in for cluster settings; on a real cluster the
same builder is used minus master/driver-memory (spark-submit provides
them). AQE stays on as the backstop behind our explicit skew salting
(SURVEY.md section 4).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fdblucene_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None → local[*]. shuffle_partitions defaults to the core
    count (local mode: >cores only adds scheduling overhead; cluster
    mode would size this to 2-3x total executor cores).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores = int(env) if env else os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = cores
    # pin the numeric libs to one thread per python worker: N workers x
    # default-size OpenBLAS/OMP pools oversubscribe the box and were
    # measured 2-3x slower at local[32]
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-mode scan sizing: frozen intermediates are 10s-100s of
        # MB; the 128MB default would coalesce them into 1-2 scan
        # partitions and serialize the downstream python stages. A real
        # cluster at TB scale would keep the default.
        .config("spark.sql.files.maxPartitionBytes", os.environ.get("SPARK_GRAFT_MAX_PART_BYTES", "8m"))
        .config("spark.sql.files.openCostInBytes", "131072")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
