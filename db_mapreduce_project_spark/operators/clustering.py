"""Clustering — Lloyd's k-means over the embedding corpus, made
cross-engine EXACT with the same fixed-point discipline as
fixed-point PageRank (operators/graph.py):

- embedding components quantize once to 1e-6 integers;
- distances are integer sums of squared integer diffs (order-free);
- centroid updates are integer sums with truncating integer
  division (Spark DIV == DuckDB // on negatives — both truncate
  toward zero, verified);
- ties in the argmin break on the lower centroid id.

So 3 full Lloyd iterations produce bit-identical assignments,
centroids, and inertia in Spark and DuckDB — the oracle runs the
identical unrolled computation.  (Lloyd 1982; the k-means
formulation follows MacQueen 1967.)

Scale notes (100 TB):
- vectors live EXPLODED as (vec_id, dim, val): the assignment join
  keys on dim against the broadcast (k x dims) centroid table, so
  the corpus shuffles ZERO times for assignment — per-vector
  distance aggregation shuffles (vec_id, cid) keyed rows whose
  width is two ids + one bigint;
- the update aggregates (cid, dim) with map-side combine — k x dims
  output rows regardless of corpus size;
- `localCheckpoint` per iteration bounds plan growth exactly like
  dedup_clusters/pagerank;
- the IVF index (operators/similarity.py) is the downstream
  consumer: these centroids are the coarse quantizer it probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

KM_K = 8
KM_ITERS = 3
KM_QS = 6  # quantize embedding components to 1e-6


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(10**KM_QS)) + F.lit(0.5)
                ),
            )
        ).alias("dim", "val"),
    )


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd iterations, k=8, seeds = vectors 0..7.  Returns the
    final per-cluster summary (cid, n_members, inertia) from a
    closing assignment pass.  Empty clusters keep their previous
    centroid (coalesce on the update join)."""
    qv = _qvecs(spark, sf_dir).cache()
    cent = qv.where(F.col("vec_id") < KM_K).select(
        F.col("vec_id").alias("cid"), "dim", F.col("val").alias("cval")
    )

    def assign(centroids: DataFrame) -> DataFrame:
        d = F.col("val") - F.col("cval")
        dist2 = (
            qv.join(F.broadcast(centroids), "dim")
            .groupBy("vec_id", "cid")
            .agg(F.sum(d * d).alias("dist2"))
        )
        return dist2.groupBy("vec_id").agg(
            F.min(F.struct("dist2", "cid")).alias("m")
        ).select(
            "vec_id", F.col("m.cid").alias("cid"), F.col("m.dist2").alias("dist2")
        )

    for _ in range(KM_ITERS):
        a = assign(cent)
        sums = (
            qv.join(a.select("vec_id", "cid"), "vec_id")
            .groupBy("cid", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("cnt"))
        )
        new_cent = sums.select(
            "cid", "dim", F.expr("s DIV cnt").alias("cval")
        )
        survivors = new_cent.select("cid").distinct()
        cent = new_cent.unionByName(
            cent.join(survivors, "cid", "left_anti")
        ).localCheckpoint()

    final = assign(cent)
    return (
        final.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("dist2").alias("inertia"),
        )
        .orderBy("cid")
    )


def _kmeans_oracle() -> str:
    q = 10**KM_QS
    ctes = [
        "qv AS (SELECT vec_id,"
        " generate_subscripts(embedding, 1) AS dim,"
        f" CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {float(q)} + 0.5) AS BIGINT) AS val"
        " FROM embeddings)",
        f"cent0 AS (SELECT vec_id AS cid, dim, val AS cval FROM qv WHERE vec_id < {KM_K})",
    ]

    def assign_cte(i: int, cent: str) -> str:
        return (
            f"dist{i} AS (SELECT q.vec_id, c.cid,"
            " CAST(sum((q.val - c.cval) * (q.val - c.cval)) AS BIGINT) AS dist2"
            f" FROM qv q JOIN {cent} c ON q.dim = c.dim GROUP BY 1, 2),\n"
            f"assign{i} AS (SELECT vec_id, cid, dist2 FROM ("
            "SELECT vec_id, cid, dist2,"
            " row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn"
            f" FROM dist{i}) t WHERE rn = 1)"
        )

    for i in range(KM_ITERS):
        ctes.append(assign_cte(i, f"cent{i}"))
        ctes.append(
            f"sums{i} AS (SELECT a.cid, q.dim,"
            " CAST(sum(q.val) AS BIGINT) AS s, count(*) AS cnt"
            f" FROM qv q JOIN assign{i} a ON q.vec_id = a.vec_id GROUP BY 1, 2)"
        )
        ctes.append(
            f"cent{i + 1} AS ("
            f"SELECT cid, dim, s // cnt AS cval FROM sums{i}"
            " UNION ALL "
            f"SELECT c.cid, c.dim, c.cval FROM cent{i} c"
            f" WHERE c.cid NOT IN (SELECT cid FROM sums{i}))"
        )
    ctes.append(assign_cte(KM_ITERS, f"cent{KM_ITERS}"))
    final = (
        f"SELECT cid, count(*) AS n_members,"
        f" CAST(sum(dist2) AS BIGINT) AS inertia"
        f" FROM assign{KM_ITERS} GROUP BY cid ORDER BY cid"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


register("kmeans_embeddings", kmeans_embeddings, _kmeans_oracle())
