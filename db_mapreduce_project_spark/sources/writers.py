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


def zvalue8(
    a: F.Column,
    b: F.Column,
    a_lo,
    a_hi,
    b_lo,
    b_hi,
) -> F.Column:
    """16-bit Morton z-value: each key is first normalized to an
    8-bit rank over its [lo, hi] range with pure integer arithmetic
    — ((x - lo) * 256) div (hi - lo + 1) — then the two ranks are
    bit-interleaved (`a` on even bits, `b` on odd).

    The normalization is the part naive z-ordering gets wrong: raw
    interleaving lets the wider-ranged key's high bits dominate the
    sort, so the narrow key never influences file boundaries and
    gets zero pruning.  Equal-width ranks make every other z bit
    belong to each key, which is the property that keeps per-file
    min/max tight on BOTH columns.  Pure Catalyst bit ops, unrolled
    at plan time, mirrored exactly by the DuckDB oracle
    (operators/layout.py)."""
    ac = a.cast("bigint")
    bc = b.cast("bigint")
    sa = F.floor(((ac - a_lo) * 256) / (a_hi - a_lo + F.lit(1))).cast("bigint")
    sb = F.floor(((bc - b_lo) * 256) / (b_hi - b_lo + F.lit(1))).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(8):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(sa, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(sb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered_parquet(
    df: DataFrame, path: str, col_a: str, col_b: str, partitions: int = 8
) -> None:
    """Z-order clustered sink: range-partition + sort on the Morton
    interleave of TWO normalized keys, so per-file parquet min/max
    stats stay tight on BOTH columns — filtered scans on either key
    prune files, which one-dimensional range clustering only
    achieves for its single sort key.  The Delta/Iceberg OPTIMIZE
    ZORDER pattern as plain DataFrame ops.

    The 4-number bounds aggregate is a driver-side stats pass —
    standard for layout jobs (they always scan stats first); the
    data pass itself is one range exchange on the z-value, the same
    cost as 1-D range clustering."""
    bounds = df.agg(
        F.min(col_a).alias("alo"),
        F.max(col_a).alias("ahi"),
        F.min(col_b).alias("blo"),
        F.max(col_b).alias("bhi"),
    ).collect()[0]
    z = zvalue8(
        F.col(col_a),
        F.col(col_b),
        F.lit(int(bounds["alo"])),
        F.lit(int(bounds["ahi"])),
        F.lit(int(bounds["blo"])),
        F.lit(int(bounds["bhi"])),
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(partitions, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-file compaction: rewrite a directory of parquet files
    into ceil(total_bytes / target_bytes) outputs.

    The small-files problem is the classic accumulation failure of
    incremental sinks (streaming foreachBatch epochs, frequent
    MERGE batches): thousands of KB-sized files turn a scan into a
    task-scheduling and footer-read exercise.  The maintenance verb
    is a stats pass (file listing only — no data read) to pick the
    output count, then ONE round-robin repartition write.
    Round-robin (`repartition(n)` with no key) is deliberate:
    compaction must balance bytes, not cluster keys — use
    write_range_clustered_parquet / write_zordered_parquet when the
    goal is pruning, not file count.  Returns the output file count.
    """
    import math
    import os

    # realpath, not abspath: a symlinked alias of the input must not
    # slip past the guard — mode('overwrite') deletes the target
    # before the lazy read runs, so compacting in place (under ANY
    # name) would destroy the input.
    if os.path.realpath(in_path) == os.path.realpath(out_path):
        raise ValueError(
            "compact_parquet: in_path and out_path must differ "
            f"(both resolve to {os.path.realpath(in_path)})"
        )
    total = 0
    for root, _dirs, files in os.walk(in_path):
        for fn in files:
            if fn.endswith(".parquet") or fn.startswith("part-"):
                total += os.path.getsize(os.path.join(root, fn))
    n_out = max(1, math.ceil(total / target_bytes))
    (
        spark.read.parquet(in_path)
        .repartition(n_out)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_out
