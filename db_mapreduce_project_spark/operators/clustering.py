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


def kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 Lloyd iterations, k=8, seeds = vectors 0..7.  Returns the
    final per-vector assignment (vec_id, cid, dist2) from a closing
    assignment pass.  Empty clusters keep their previous centroid
    (coalesce on the update join)."""
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
        # LAZY: KM_ITERS is fixed (no mid-loop driver decision), so
        # the final assign materializes the Lloyd cascade as one job
        # instead of one blocking checkpoint job per iteration
        ).localCheckpoint(eager=False)

    return assign(cent)


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster summary (cid, n_members, inertia) of the final
    Lloyd assignment."""
    return (
        kmeans_assignments(spark, sf_dir)
        .groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            F.sum("dist2").alias("inertia"),
        )
        .orderBy("cid")
    )


def _kmeans_assign_ctes() -> tuple[list[str], str]:
    """The shared Lloyd-loop CTE chain; returns (ctes, name of the
    final assignment CTE) so both the k-means summary oracle and
    the semantic-dedup oracle unroll the identical iterations."""
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
    return ctes, f"assign{KM_ITERS}"


def _kmeans_oracle() -> str:
    ctes, final_assign = _kmeans_assign_ctes()
    final = (
        f"SELECT cid, count(*) AS n_members,"
        f" CAST(sum(dist2) AS BIGINT) AS inertia"
        f" FROM {final_assign} GROUP BY cid ORDER BY cid"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


register("kmeans_embeddings", kmeans_embeddings, _kmeans_oracle())


SEMDEDUP_COS = 0.40  # epsilon tuned to the fixture embedding space
# (SemDeDup tunes epsilon per corpus; the synthetic embeddings have no
# 0.9+ near-dups — max within-cluster cosine is ~0.51 — so the bar sits
# at the 99.9th percentile of within-cluster similarity instead)


def dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540): cluster the
    embedding space with k-means, then search for near-duplicate
    pairs ONLY within each cluster — the semantic-dedup shape that
    replaces an O(n^2) corpus-wide pairwise scan with k independent
    O((n/k)^2) cells.

    Here k is fixture-sized (KM_K = 8, shared with
    kmeans_embeddings so the Lloyd loop and its unrolled oracle are
    reused verbatim); a production deployment scales k ~ n/1000, so
    cells stay bounded and the within-cell join's fan-out is
    constant in corpus size.  The pairwise stage fetches
    full-precision vectors by vec_id (point-lookup join) and scores
    with the ordered-fold cosine, so the whole pipeline — Lloyd
    iterations, assignments, pair cut — is value-hash exact vs
    DuckDB."""
    from ..functions.vectors import cosine

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = kmeans_assignments(spark, sf_dir).select("vec_id", "cid")
    # cache: both self-join sides consume m, and without the cache
    # the closing Lloyd assignment pass + embeddings join run twice
    m = a.join(e, "vec_id").cache()
    left = m.select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
    )
    right = m.select(
        F.col("cid"),
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
    )
    return (
        left.join(right, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine("va", "vb"))
        .where(F.col("cos") >= SEMDEDUP_COS)
        .select("cid", "id_a", "id_b", "cos")
        .orderBy("id_a", "id_b")
    )


def _semdedup_oracle() -> str:
    from ..functions.vectors import duck_cosine

    ctes, final_assign = _kmeans_assign_ctes()
    cos = duck_cosine("ea.embedding", "eb.embedding")
    final = f"""
SELECT a.cid, a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
FROM {final_assign} a
JOIN {final_assign} b ON a.cid = b.cid AND a.vec_id < b.vec_id
JOIN embeddings ea ON ea.vec_id = a.vec_id
JOIN embeddings eb ON eb.vec_id = b.vec_id
WHERE {cos} >= {SEMDEDUP_COS}
ORDER BY id_a, id_b
"""
    return "WITH " + ",\n".join(ctes) + "\n" + final


register(
    "dedup_semantic_clusters", dedup_semantic_clusters, _semdedup_oracle()
)
