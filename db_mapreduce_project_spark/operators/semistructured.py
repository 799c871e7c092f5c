"""Semi-structured data: JSON scalar extraction and array /
higher-order functions (SURVEY.md §2.2 "Array/map/JSON" — absent in
reference).

- `events.props` is a JSON string: parsed JVM-side with `from_json`
  (schema'd, codegen-friendly) — never a Python UDF.
- `embeddings.embedding` is array<float>: reduced with higher-order
  `F.aggregate` / `F.transform`, which run inside codegen.

Float determinism: every fold casts elements to double FIRST and
accumulates left-to-right, matching the DuckDB oracle's
list_reduce order, so results are bit-identical (no rounding
needed for the sums; cosine-style math is rounded at 6dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import load_table
from ..registry import register

PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def json_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse events.props with from_json and aggregate the extracted
    key per event type."""
    e = load_table(spark, sf_dir, "events")
    k = F.from_json("props", PROPS_SCHEMA).getField("k")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
        .orderBy("event_type")
    )


JSON_EXTRACT_STATS_ORACLE = """
SELECT event_type,
       count(k) AS n,
       CAST(sum(k) AS BIGINT) AS k_sum,
       min(k) AS k_min,
       max(k) AS k_max
FROM (
  SELECT event_type,
         CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INTEGER) AS k
  FROM events
) t
GROUP BY event_type
ORDER BY event_type
"""


def array_reduce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector stats via higher-order functions: length, L1-ish
    sum, min/max element — all codegen'd, no UDF."""
    emb = load_table(spark, sf_dir, "embeddings")
    vsum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double"),
    )
    return (
        emb.select(
            "vec_id",
            F.size("embedding").alias("dim"),
            vsum.alias("vec_sum"),
            F.array_min("embedding").cast("double").alias("vec_min"),
            F.array_max("embedding").cast("double").alias("vec_max"),
        )
        .orderBy("vec_id")
    )


ARRAY_REDUCE_STATS_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INTEGER) AS dim,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                   (a, b) -> a + b) AS vec_sum,
       CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS vec_min,
       CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS vec_max
FROM embeddings
ORDER BY vec_id
"""


def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the first 4 embedding dims -> long format."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "vec_id", F.posexplode(F.slice("embedding", 1, 4)).alias("pos", "val")
        )
        .select("vec_id", "pos", F.col("val").cast("double").alias("val"))
        .orderBy("vec_id", "pos")
    )


ARRAY_POSEXPLODE_ORACLE = """
SELECT vec_id,
       CAST(i - 1 AS INTEGER) AS pos,
       CAST(embedding[i] AS DOUBLE) AS val
FROM embeddings, generate_series(1, 4) AS g(i)
ORDER BY vec_id, pos
"""


def array_transform_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform + filter + exists higher-order funcs: count of
    positive dims and sum of squares (L2^2)."""
    emb = load_table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    return (
        emb.select(
            "vec_id",
            sq_sum.alias("l2sq"),
            n_pos.alias("n_pos"),
            F.exists("embedding", lambda x: x > 2.5).alias("has_large"),
        )
        .orderBy("vec_id")
    )


ARRAY_TRANSFORM_NORM_ORACLE = """
SELECT vec_id,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
                (a, b) -> a + b) AS l2sq,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
       len(list_filter(embedding, x -> x > 2.5)) > 0 AS has_large
FROM embeddings
ORDER BY vec_id
"""


register("json_extract_stats", json_extract_stats, JSON_EXTRACT_STATS_ORACLE)
register("array_reduce_stats", array_reduce_stats, ARRAY_REDUCE_STATS_ORACLE)
register("array_posexplode", array_posexplode, ARRAY_POSEXPLODE_ORACLE)
register("array_transform_norm", array_transform_norm, ARRAY_TRANSFORM_NORM_ORACLE)


def variant_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VariantType path: parse_json into a variant,
    variant_get typed extraction, is_variant_null — plus the
    construction direction (to_json of a struct).  Output is scalar
    so the DuckDB oracle just extracts the same JSON paths."""
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.where(F.col("event_id") <= 400)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "int").alias("k_typed"),
            F.variant_get(v, "$.missing", "int").alias("k_missing"),
            F.to_json(
                F.struct(
                    F.col("event_type").alias("t"),
                    F.col("user_id").alias("u"),
                )
            ).alias("built_json"),
        )
        .orderBy("event_id")
    )


VARIANT_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k_typed,
       CAST(NULL AS INTEGER) AS k_missing,
       concat('{"t":"', event_type, '","u":', CAST(user_id AS VARCHAR), '}')
           AS built_json
FROM events
WHERE event_id <= 400
ORDER BY event_id
"""

register("variant_json_funcs", variant_json_funcs, VARIANT_JSON_ORACLE)
