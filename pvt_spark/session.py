"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd pass
to spark-submit on a real cluster (AQE, skew-join handling, Arrow
batches for the vectorized UDF kernels).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "pvt-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    # 4 waves per shuffle stage: smooths stragglers/stage tails (skewed
    # hot-cell partitions); AQE coalesces where partitions end up tiny
    shuffle_partitions = shuffle_partitions or max(cpus * 4, 64)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalesce + skew-join split — required at 100 TB
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas UDF kernel
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Scan splits: this engine runs heavy Python/Arrow kernels after
        # most scans, so work units must be small enough to spread across
        # cores — 128MB bin-packing collapses a compressed stage output
        # into a handful of tasks (measured: content stage parallelism 4
        # on a 150MB input). 16MB splits + low open cost keep every stage
        # at full width; same reasoning for the AQE advisory size.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "524288")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.driver.memory", os.environ.get("PVT_DRIVER_MEM", "8g"))
        # Throughput GC: G1's concurrent refinement/marking threads
        # contend with task threads in allocation-heavy shuffle stages —
        # measured 0.49 -> 0.845 scaling efficiency (2->8 cores) and
        # 1.8x absolute on a pure groupBy-agg control with ParallelGC
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        # multi-executor masters (local-cluster / standalone) spawn their
        # own Python workers: make the package importable there (the
        # local analog of spark-submit --py-files, cf scripts/submit_build.py)
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def drop_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpoint'ed DataFrame's RDD blocks.

    ``DataFrame.unpersist()`` only clears CacheManager entries (from
    ``persist()``); a local checkpoint persists its RDD directly, so the
    blocks must be dropped on the RDD handle inside the LogicalRDD leaf.
    Iterative operators (dedup label propagation, the nested-relation
    fixed point) call this on each superseded snapshot so a long-lived
    session keeps exactly one live snapshot per loop. Best-effort: a
    plan-shape change across Spark versions degrades to the old
    leak-until-session-end behavior, never to an error.
    """
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass
