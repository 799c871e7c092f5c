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
