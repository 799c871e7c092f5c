"""Readers.  Explicit-schema reads (no inference jobs at scale);
parquet is the primary columnar source — filters/column pruning
push into the scan (verify with plans.inspect.pushed_filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC: Spark's second built-in columnar format — same pushdown
    and pruning properties as parquet (vectorized reader on by
    default)."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-required CSV read — never schema-infer at scale (an
    inference pass reads the data twice)."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .csv(path)
    )


def read_json(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Schema-required JSON-lines read."""
    return spark.read.schema(schema).json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line-oriented text -> DataFrame[value: string] — the
    reference's input model (maprdeuce.cpp:134-179); input splits
    replace its 100k-line block files."""
    return spark.read.text(path)
