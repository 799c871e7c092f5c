"""SparkSession construction with scale-oriented defaults.

The reference's tuning knobs (block_size maprdeuce.cpp:45,
thread_size maprdeuce.cpp:47) map onto Spark configs: input split
sizing and task parallelism.  Everything here is sized so the same
code runs on local[N] for tests and on a real cluster unchanged --
AQE handles runtime re-planning (partition coalescing, skew joins),
and the shuffle-partition default is only a pre-AQE hint.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "db-mapreduce-project-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    - AQE on: runtime coalescing of shuffle partitions + skew-join
      splitting; this is what makes one static config survive a
      100x scale-up.
    - Arrow on: every pandas_udf / mapInPandas path in this engine
      moves data in Arrow batches, never row-at-a-time pickling.
    - UTC session timezone: deterministic timestamp semantics across
      engines (parity with the DuckDB oracle).
    """
    if master is None:
        # SPARK_GRAFT_MASTER overrides the whole master URL — used
        # by the multi-process certification sweep (round 13,
        # VERDICT r12 #3: `local-cluster[2,4,4096]` spawns real
        # worker JVMs on localhost, adding process isolation —
        # closure serialization, broadcast transport, no shared
        # driver-side state — without needing a cluster manager).
        master = os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Data-derived shuffle width (round 13): AQE can only
        # coalesce DOWN from the pre-shuffle partition count, so a
        # small static hint caps width forever — C4_DSIR_AB_r12.json
        # measured DSIR's bigram aggregation spilling at width 32
        # (5.0x wall for 2x data) while width 128 was linear again.
        # Starting every shuffle at initialPartitionNum and letting
        # AQE coalesce to ~advisoryPartitionSizeInBytes makes the
        # post-coalesce width derive from the DATA: tiny inputs
        # still collapse to a handful of partitions, and a 100x
        # input simply keeps more of the initial width instead of
        # spilling per-partition.  shuffle_partitions above remains
        # only the non-AQE fallback.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS", "512"),
        )
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64m")
        # Without this, AQE partition coalescing is DISABLED for the
        # stage that materializes a .cache()d plan (Spark preserves
        # the cached plan's output partitioning by default), so every
        # cached intermediate materializes at the FULL pre-coalesce
        # width — measured at sf0.1 with initialPartitionNum=512:
        # dedup_minhash_lsh 6.1 -> 2.1 s, frequent_pairs_apriori
        # 5.8 -> 1.0 s once cached plans coalesce like everything
        # else.  No query's RESULT depends on partitioning (no
        # rand()/spark_partition_id()/monotonically_increasing_id in
        # the package), so letting the cached plan's partitioning
        # derive from the data is semantics-free here.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built
    session (e.g. the driver's).  Idempotent."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
