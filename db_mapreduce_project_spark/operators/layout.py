"""Data-layout operators: multi-dimensional (Z-order) clustering.

The sink itself lives in `sources/writers.py`
(`write_zordered_parquet`); this module registers the z-value
computation as an oracle-checked query so the bit-interleave kernel
— the part correctness depends on — is differentially verified
against DuckDB, and `tests/test_sources.py` proves the layout
property (per-file min/max stats stay tight on BOTH keys).

Scale note: z-value assignment is a pure map (normalize to 8-bit
ranks with integer arithmetic, then 16 unrolled bit ops, all
whole-stage codegen); the clustering write is one range exchange on
the z-value — the same cost as 1-D range clustering, but filtered
scans prune on either dimension.  This is the Delta/Iceberg
OPTIMIZE ZORDER pattern as plain DataFrame ops.  The key bounds
ride a 1-row broadcast here (the writer collects the same 4 numbers
driver-side — a standard stats pre-pass for layout jobs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register
from ..sources.writers import zvalue8


def zorder_zvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized Morton z-values for (l_partkey, l_suppkey) over a
    bounded order range — the kernel `write_zordered_parquet`
    sorts by, with the range bounds supplied by a 1-row broadcast
    aggregate instead of the writer's driver-side collect."""
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") <= 100)
    bounds = l.agg(
        F.min("l_partkey").alias("alo"),
        F.max("l_partkey").alias("ahi"),
        F.min("l_suppkey").alias("blo"),
        F.max("l_suppkey").alias("bhi"),
    )
    return (
        l.crossJoin(F.broadcast(bounds))
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_partkey",
            "l_suppkey",
            zvalue8(
                F.col("l_partkey"),
                F.col("l_suppkey"),
                F.col("alo"),
                F.col("ahi"),
                F.col("blo"),
                F.col("bhi"),
            ).alias("zval"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


_Z_TERMS = " + ".join(
    f"((sa >> {i}) & 1) * {2 ** (2 * i)}"
    f" + ((sb >> {i}) & 1) * {2 ** (2 * i + 1)}"
    for i in range(8)
)
ZORDER_ZVALUES_ORACLE = f"""
WITH src AS (
  SELECT * FROM lineitem WHERE l_orderkey <= 100
),
bounds AS (
  SELECT min(l_partkey) AS alo, max(l_partkey) AS ahi,
         min(l_suppkey) AS blo, max(l_suppkey) AS bhi
  FROM src
),
ranked AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         CAST(floor((l_partkey - alo) * 256 / (ahi - alo + 1)) AS BIGINT) AS sa,
         CAST(floor((l_suppkey - blo) * 256 / (bhi - blo + 1)) AS BIGINT) AS sb
  FROM src CROSS JOIN bounds
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({_Z_TERMS} AS BIGINT) AS zval
FROM ranked
ORDER BY l_orderkey, l_linenumber
"""

register("zorder_zvalues", zorder_zvalues, ZORDER_ZVALUES_ORACLE)
