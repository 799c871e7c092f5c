"""Sinks.  SaveMode.Overwrite replaces the reference's manual
stale-file cleanup (remove_befor_map_file, maprdeuce.cpp:428-455).

Scale rules encoded here:
- parquet for anything downstream (columnar, min/max pruning);
- partitionBy for natural read-pruning keys (dates, not
  high-cardinality ids — 1 dir per value);
- the text sink mirrors the reference's "word count" line output
  (maprdeuce.cpp:322-329).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).orc(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted parquet table: rows are hash-partitioned
    into a fixed bucket count on `bucket_col` at WRITE time, so
    later joins/aggregations on that key read co-located data and
    plan NO shuffle (the write amortizes the exchange once).  This
    is the at-scale answer for a fact table joined repeatedly on the
    same key; bucket counts should divide evenly into cluster
    parallelism."""
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_csv(
    df: DataFrame, path: str, mode: str = "overwrite", header: bool = True
) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_wordcount_text(df: DataFrame, path: str) -> None:
    """The reference's exact sink format: one '"word count"' line
    per word, space-separated, globally sorted ascending
    (maprdeuce.cpp:322-329).  Single output file to mirror the
    single result.txt — acceptable because the aggregated vocabulary
    is small; never coalesce(1) a fact-sized frame."""
    out = df.orderBy("word").select(
        F.concat_ws(" ", F.col("word"), F.col("cnt").cast("string")).alias(
            "value"
        )
    )
    out.coalesce(1).write.mode("overwrite").text(path)


def write_range_clustered_parquet(
    df: DataFrame, path: str, col: str, partitions: int = 8
) -> None:
    """Range-clustered sink: repartitionByRange + sortWithinPartitions
    gives each output file a disjoint [min, max] span of `col`, so a
    later filtered scan prunes whole files/row-groups via parquet
    min/max stats — the clustering technique that turns a 100 TB
    table scan into a few-file read for range predicates."""
    (
        df.repartitionByRange(partitions, F.col(col))
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )
