"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[N]``; the same config block is what we would ship
to a 1000-executor cluster via ``spark-submit --py-files`` — AQE on (skew-join
splitting + post-shuffle coalescing), Arrow transfers on, and a shuffle
partition count that AQE coalesces down at small scale and fans out at large.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kg-construct",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``local[$SPARK_GRAFT_CPUS or *]``. On a real cluster the
    master is supplied by spark-submit and this falls through untouched.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cores}]" if cores else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = max(32, (cores or os.cpu_count() or 8))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime re-plan — coalesce small post-shuffle partitions at
        # test scale, split skewed joins (hot Chinese surnames) at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # never coalesce below the session's parallelism: the default 1 MiB
        # floor assumes IO-bound work, but compute-bound stages over FEW
        # bytes (e.g. the LSH candidate-verify joins: ~1 MiB of pair keys
        # driving heavy probe work) get collapsed to 1-2 tasks and serialize
        # — measured 86.7 s → 36.4 s on the 60k-doc dedup job at local[8].
        # With the floor at 1 byte, AQE's parallelism-first rule targets
        # totalBytes/parallelism, so small shuffles still coalesce but never
        # under-use the cluster.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # broadcast decisions from MEASURED sizes only. Catalyst's static
        # size propagation does not scale estimates through Generate
        # (explode): a 60M-row exploded shingle table inherits its parquet
        # scan's ~20 MB estimate, every downstream join plans as a
        # BroadcastHashJoin, and the driver then serially builds a
        # multi-GB hashed relation (measured: a 70–160 s single-core stall
        # between the last shuffle stage and the final stage of the
        # LSH-dedup job; at cluster scale it would OOM the driver).
        # Static planning therefore never broadcasts implicitly (-1);
        # AQE re-plans shuffle joins into broadcasts from true runtime
        # sizes, and intentional dim-table broadcasts stay explicit via
        # F.broadcast() hints, which bypass the threshold.
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "10m")
        # Arrow batches for every pandas UDF / mapInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        # 128 MiB input splits — sane parquet scan granularity at any SF.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # whole-stage codegen emits one class per query; the JVM default
        # 240 MB code cache fills after ~10 wide queries and the JIT stops
        # compiling → interpreted generated code runs ~20× slower (measured:
        # a 1 s aggregation became 37 s mid-benchmark)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:CICompilerCount=8",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
