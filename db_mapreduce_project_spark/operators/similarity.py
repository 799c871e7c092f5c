"""Similarity search over the embeddings table.

- `ann_cosine_topk_bruteforce`: brute-force cosine top-k — the
  EXACTNESS BASELINE ONLY (O(n*q) cross join; the `_bruteforce`
  suffix marks it as deliberately not the scale path).  Both
  engines compute the identical double (see functions.vectors
  determinism contract), so ranks compare exactly.
- `ann_lsh_bucketed`: random-hyperplane LSH (sign sketch) — the
  scale path: N_PLANES=6 hyperplanes map each vector to one of 64
  buckets; neighbor search only scans the query's bucket.
  Hyperplanes are a fixed seeded +/-1 matrix baked into the plan
  (and the oracle SQL) as literals, so the result is fully
  deterministic and value-hash oracle-checked; brute-force recall
  is asserted in tests/test_dedup_similarity.py.

At 100 TB: top-k per query is a groupBy(query) of a bucket-join —
never a global sort; the +/-1 projection is a fixed-size literal
array, broadcast implicitly inside the expression.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stable import duck_qavg, qavg
from ..functions.vectors import cosine, dot, duck_cosine, l2
from ..io import load_table
from ..registry import register

TOPK = 5
QUERY_MOD = 50  # vec_id % 50 == 0 -> ~2% of vectors are queries
MAX_QUERY_COLLECT = 100_000  # hard cap on driver-collected query rows

# 6 planes -> 64 buckets: ~8 vectors/bucket at sf0.01 so every
# query has in-bucket candidates; at larger corpora raise planes to
# keep bucket occupancy ~O(100) (planes scale log2(n/occupancy)).
N_PLANES = 6
DIM = 64


def _planes(n_planes: int = N_PLANES) -> list[list[int]]:
    """Deterministic +/-1 hyperplane matrix (seeded PRNG, built at
    plan time — pure literals in the expression tree).  The same
    seed generates every size, so the first N_PLANES rows of a
    larger matrix ARE the registered matrix — parameter sweeps
    (scripts/ann_recall.py) extend the sketch, never reshuffle it."""
    rng = random.Random(20240813)
    return [[rng.choice((-1, 1)) for _ in range(DIM)] for _ in range(n_planes)]


def brute_topk_from(e: DataFrame) -> DataFrame:
    """Exact top-TOPK cosine neighbors of every query (vec_id %
    QUERY_MOD == 0) over a (vec_id, embedding) relation — the
    ground-truth builder shared by the registered brute-force query
    and the recall-certification harness (scripts/ann_recall.py)."""
    q = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        l2("embedding").alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        l2("embedding").alias("n_norm"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        q.crossJoin(c)
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot("qv", "nv")
            / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0)),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


def ann_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for every query vector
    (vec_id % 50 == 0), excluding self.  BRUTE-FORCE BASELINE:
    O(n*q) cross join, registered only as the exactness reference
    for the LSH/IVF scale paths — never run this shape on a full
    corpus as queries.

    Norms are computed ONCE per vector before the cross join (n + q
    folds) instead of per pair (n*q folds) — same IEEE doubles as
    the oracle's inline computation, ~3x less expression work; the
    per-pair cost is just the dot product."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return brute_topk_from(e)


ANN_COSINE_TOPK_ORACLE = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         {duck_cosine('q.embedding', 'n.embedding')} AS cos
  FROM embeddings q, embeddings n
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> n.vec_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT q_id, n_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


def _bucket_expr(vec_col: str, n_planes: int = N_PLANES) -> F.Column:
    """LSH bucket id: bit p = sign(dot(v, plane_p))."""
    return _bucket_expr_from(vec_col, _planes(n_planes))


def _bucket_expr_from(vec_col: str, planes: list[list[int]]) -> F.Column:
    """Bucket id over an explicit plane matrix (multi-table LSH
    slices one shared seeded stream into per-table matrices)."""
    bucket = F.lit(0).cast("bigint")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        proj = F.aggregate(
            F.zip_with(vec_col, arr, lambda x, r: x.cast("double") * r),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def lsh_topk_from(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """LSH-bucketed approximate top-TOPK over a (vec_id, embedding)
    relation — the builder behind ann_lsh_bucketed, parameterized on
    plane count for the recall sweep (scripts/ann_recall.py)."""
    e = e.select(
        "vec_id",
        "embedding",
        _bucket_expr("embedding", n_planes).alias("bucket"),
        l2("embedding").alias("norm"),
    )
    q = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        "bucket",
        F.col("norm").alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        "bucket",
        F.col("norm").alias("n_norm"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        q.join(c, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot("qv", "nv")
            / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0)),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors: candidates limited to the
    query's LSH bucket (N_PLANES=6 random hyperplanes -> 64
    buckets; planes must grow as log2(n/occupancy) with corpus
    size).  The plane matrix is a plan-time literal mirrored into
    the oracle SQL, so the bucketing — and therefore the full
    result — is value-hash checked against DuckDB; measured recall
    vs brute force is certified in ANN_RECALL_r7.json and floored
    in tests/test_dedup_similarity.py."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return lsh_topk_from(e)


def _lsh_oracle_sql() -> str:
    """DuckDB mirror of the full LSH pipeline: the same +/-1 plane
    literals, the same left-to-right double fold for each
    projection (functions.vectors determinism contract), so bucket
    ids — and the bucket-limited top-k — are identical."""
    from ..functions.vectors import duck_dot, duck_l2

    planes = _planes()
    bucket_terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        proj = duck_dot("embedding", lit)
        bucket_terms.append(f"CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END")
    bucket = "CAST(" + " + ".join(bucket_terms) + " AS BIGINT)"
    return f"""
WITH base AS (
  SELECT vec_id, embedding,
         {bucket} AS bucket,
         {duck_l2('embedding')} AS norm
  FROM embeddings
),
scored AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         ({duck_dot('q.embedding', 'n.embedding')}
          / nullif(q.norm * n.norm, 0.0)) AS cos
  FROM base q JOIN base n ON q.bucket = n.bucket
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> n.vec_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT q_id, n_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_LSH_BUCKETED_ORACLE = _lsh_oracle_sql()


N_TABLES = 4  # OR-construction width for ann_lsh_multitable


def lsh_multitable_topk_from(
    e: DataFrame, n_tables: int = N_TABLES, n_planes: int = N_PLANES
) -> DataFrame:
    """Multi-table (OR-construction) LSH top-TOPK: L independent
    sign-sketch tables of k planes each; a pair is a candidate if it
    collides in ANY table.  This is the standard recall lever for
    sign-LSH — a single wider sketch LOWERS recall (each extra plane
    halves the bucket), while each extra table multiplies the miss
    probability: per-table miss p -> L-table miss p^L (measured in
    ANN_RECALL_r7.json: 0.82 -> ~1.0 on clone families at L=4).

    Table t's planes are rows [t*k, (t+1)*k) of the SAME seeded
    stream `_planes` draws from, so table 0 IS the registered
    single-table index: the multitable candidate set is a strict
    superset, and recall dominance over ann_lsh_bucketed is a
    theorem (a true top-k hit can only be displaced by a
    globally-better vector, of which there are fewer than TOPK),
    asserted in tests/test_ann_recall.py.

    Scale shape: the corpus is posexploded to L (tbl, bucket) rows —
    a Generate, no shuffle — and the candidate join is keyed by
    (tbl, bucket), so cost is L bucket-joins; duplicate collisions
    are folded by a (q_id, n_id) max aggregate BEFORE ranking (the
    scores of one pair are bit-identical across tables, so max is a
    pure dedup).  Candidate volume is <= L x the single-table path —
    the recall/cost dial a 100 TB serving tier actually turns."""
    planes = _planes(n_tables * n_planes)
    buckets = F.array(
        *[
            _bucket_expr_from(
                "embedding", planes[t * n_planes : (t + 1) * n_planes]
            )
            for t in range(n_tables)
        ]
    )
    base = e.select(
        "vec_id",
        "embedding",
        l2("embedding").alias("norm"),
        F.posexplode(buckets).alias("tbl", "bucket"),
    )
    q = base.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("q_norm"),
        "tbl",
        "bucket",
    )
    c = base.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        F.col("norm").alias("n_norm"),
        "tbl",
        "bucket",
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        q.join(c, ["tbl", "bucket"])
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot("qv", "nv")
            / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0)),
        )
        # fold multi-table duplicates: identical pair -> identical
        # double, max() is a pure dedup, and the partial aggregate
        # shrinks the shuffle to distinct pairs
        .groupBy("q_id", "n_id")
        .agg(F.max("cos").alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


def ann_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`lsh_multitable_topk_from` (L=4
    tables x 6 planes) over the embeddings fixture."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return lsh_multitable_topk_from(e)


def _duck_bucket_sql(planes: list[list[int]], col: str = "embedding") -> str:
    """DuckDB mirror of `_bucket_expr_from` over explicit planes."""
    from ..functions.vectors import duck_dot

    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        proj = duck_dot(col, lit)
        terms.append(f"CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def _lsh_multitable_oracle_sql() -> str:
    """DuckDB mirror of the multi-table pipeline: the same L plane
    slices of the shared seeded stream, a UNION ALL unpivot to
    (tbl, bucket) rows, the same (tbl, bucket) join, the same
    max-fold pair dedup, the same rank cut."""
    from ..functions.vectors import duck_dot, duck_l2

    planes = _planes(N_TABLES * N_PLANES)
    arms = []
    for t in range(N_TABLES):
        b = _duck_bucket_sql(planes[t * N_PLANES : (t + 1) * N_PLANES])
        arms.append(
            f"SELECT vec_id, embedding, {duck_l2('embedding')} AS norm,"
            f" {t} AS tbl, {b} AS bucket FROM embeddings"
        )
    base = "\n  UNION ALL\n  ".join(arms)
    return f"""
WITH base AS (
  {base}
),
scored AS (
  SELECT q.vec_id AS q_id, n.vec_id AS n_id,
         max({duck_dot('q.embedding', 'n.embedding')}
             / nullif(q.norm * n.norm, 0.0)) AS cos
  FROM base q JOIN base n ON q.tbl = n.tbl AND q.bucket = n.bucket
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> n.vec_id
  GROUP BY q.vec_id, n.vec_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT q_id, n_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_LSH_MULTITABLE_ORACLE = _lsh_multitable_oracle_sql()


COSINE_DEDUP_THRESHOLD = 0.92


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine >= 0.92) found via the LSH
    buckets — the SCALE PATH twin of
    dedup_embedding_cosine_bruteforce: candidate pairs are limited
    to same-bucket vectors (equi-join on the 6-plane sign sketch),
    so the pair search is linear in bucket occupancy, never O(n^2).
    Same plane literals in the oracle, so the bucketed result is
    value-hash checked; recall vs brute force is a property of the
    plane count (documented in tests)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "embedding",
        _bucket_expr("embedding").alias("bucket"),
        l2("embedding").alias("norm"),
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        "bucket",
        F.col("norm").alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        "bucket",
        F.col("norm").alias("norm_b"),
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            dot("va", "vb")
            / F.nullif(F.col("norm_a") * F.col("norm_b"), F.lit(0.0)),
        )
        .where(F.col("cos") >= COSINE_DEDUP_THRESHOLD)
        .select("id_a", "id_b", "cos")
        .orderBy("id_a", "id_b")
    )


def _dedup_lsh_oracle_sql() -> str:
    from ..functions.vectors import duck_dot, duck_l2

    planes = _planes()
    bucket_terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        proj = duck_dot("embedding", lit)
        bucket_terms.append(f"CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END")
    bucket = "CAST(" + " + ".join(bucket_terms) + " AS BIGINT)"
    return f"""
WITH base AS (
  SELECT vec_id, embedding,
         {bucket} AS bucket,
         {duck_l2('embedding')} AS norm
  FROM embeddings
)
SELECT id_a, id_b, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ({duck_dot('a.embedding', 'b.embedding')}
          / nullif(a.norm * b.norm, 0.0)) AS cos
  FROM base a JOIN base b ON a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
) t
WHERE cos >= {COSINE_DEDUP_THRESHOLD}
ORDER BY id_a, id_b
"""


DEDUP_EMBEDDING_LSH_ORACLE = _dedup_lsh_oracle_sql()


N_CELLS = 16  # IVF coarse cells for the 2000-vector fixture forms
N_PROBE = 3  # cells searched per query


def derive_n_cells(n: int, floor: int = 16, cap: int = 4096) -> int:
    """Data-derived IVF cell count: the power of two nearest
    sqrt(n), clamped to [floor, cap] — the same derive-from-data
    discipline as the rerank budget (ivfadc_collision_budget).

    Why sqrt: per-query probe work is ~ n_probe * n / cells and
    coarse-assign work is ~ n * cells, so sqrt(n) balances the two
    (the FAISS guideline is 4·sqrt(n)..16·sqrt(n) trained cells;
    with our deterministic lowest-vec_id quantizer the constant 1
    keeps per-cell occupancy high enough that the collision-budget
    rule — margin * max_cluster + k — stays data-dominated rather
    than floor-dominated).  Power-of-two rounding keeps rungs
    comparable across ladders.

    The fixture forms keep the static N_CELLS=16 (n=2000 is known
    at registration and the oracle SQL mirrors the constant); the
    certification ladders (scripts/ann_recall_scale.py,
    scripts/ann_binary_scale.py) derive cells from the rung size —
    round-11 re-certification: 100k -> 256, 500k -> 512,
    1M -> 1024 (the round-10 ladder capped every rung at 256, so
    probe cost grew linearly with corpus; VERDICT r10 #2)."""
    import math

    return max(floor, min(cap, 1 << int(round(math.log2(math.sqrt(n))))))


def ivf_centroids(e: DataFrame, n_cells: int = N_CELLS) -> DataFrame:
    """(cell, cv, c_norm): the deterministic coarse quantizer — the
    N_CELLS lowest vec_ids (shared by ann_ivf_topk and the IVFADC
    index; e must carry vec_id/embedding/norm)."""
    return (
        e.orderBy("vec_id")
        .limit(n_cells)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("embedding").alias("cv"),
            F.col("norm").alias("c_norm"),
        )
    )


TRAIN_SAMPLE_CAP = 65_536  # driver-side k-means training sample bound
TRAIN_SEED = 20260816
TRAIN_ITERS = 10


def train_ivf_centroids(
    e: DataFrame,
    n_cells: int,
    sample_cap: int = TRAIN_SAMPLE_CAP,
    iters: int = TRAIN_ITERS,
    seed: int = TRAIN_SEED,
) -> DataFrame:
    """TRAINED coarse quantizer (round-12, VERDICT r11 #1):
    spherical k-means (Lloyd) on a bounded deterministic sample,
    returning a (cell, cv, c_norm) relation with cell ids 0..k-1 —
    a drop-in replacement for :func:`ivf_centroids` everywhere a
    `cents` relation is consumed (assign, probes, residuals, sign
    codes).

    This is the FAISS train/add split done the way a cluster tier
    does it: training is a one-off driver/trainer-side job over a
    SAMPLE (never the corpus — the collect is bounded by
    `sample_cap` rows ~= 32 MB at 64 dims, the repo's
    guarded-collect discipline), and the corpus only ever sees the
    embarrassingly-parallel assign/encode map passes against the
    broadcast result.  The deterministic lowest-vec_id quantizer
    (`ivf_centroids`) remains the ORACLE-mirrored fixture form —
    cross-engine k-means++ is not worth mirroring in SQL — so
    trained-quantizer serving forms are certified by measured
    recall + occupancy (ANN_RECALL_r12.json ladder) rather than a
    value hash, exactly like the BLAS assign.

    Method: the sample is every vector with
    pmod(xxhash64(vec_id), stride) == 0 (stride = n // sample_cap,
    a fixed deterministic thinning — no RNG sampling, so re-runs
    see the same rows), orderBy(vec_id).limit(cap) to make the
    collected set exact; rows L2-normalize (cosine geometry —
    downstream assignment is an argmax of cosine, so Lloyd must
    run on the sphere); k-means++ seeding with a seeded
    Generator; `iters` Lloyd rounds (chunked BLAS assign, mean
    update, re-normalize); an emptied cell re-seeds to the point
    worst-covered by the surviving centroids.  Unit centroids are
    emitted (c_norm = 1.0), which leaves every downstream cosine
    expression exact."""
    import numpy as np

    n = e.count()
    # ceil, not floor (round-12 ADVICE): with floor the hash filter
    # leaves up to ~2x sample_cap survivors and the orderBy(vec_id)
    # .limit(cap) cut then keeps an id-prefix-biased HALF of them.
    # With ceil the filter itself lands at-or-under the cap and the
    # limit is a no-op in the common case, so the sample is the
    # hash-uniform thinning it claims to be.
    stride = max(1, -(-n // sample_cap))
    s = e.select("vec_id", "embedding")
    if stride > 1:
        s = s.where(F.pmod(F.xxhash64("vec_id"), F.lit(stride)) == 0)
    rows = s.orderBy("vec_id").limit(sample_cap).collect()
    if len(rows) < n_cells:
        # tiny relation: fall back to every row (still bounded)
        rows = e.select("vec_id", "embedding").orderBy("vec_id").limit(
            sample_cap
        ).collect()
    if rows:
        X = np.array([r["embedding"] for r in rows], dtype="float64")
        nrm = np.linalg.norm(X, axis=1)
        X = X[nrm > 0]
    else:
        X = np.empty((0, 0), dtype="float64")
    m = len(X)
    if m == 0:
        # Degenerate corpus (empty relation, or every sampled
        # vector zero-norm): k-means++ seeding would crash with an
        # opaque rng.integers(0) ValueError (round-12 ADVICE).
        # Raise the descriptive error instead -- a trained
        # quantizer over nothing is a caller bug, not a fixture.
        raise ValueError(
            "train_ivf_centroids: no non-zero-norm vectors to train "
            "on (empty relation or all-zero embeddings)"
        )
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    k = min(n_cells, m)
    rng = np.random.default_rng(seed)

    # k-means++ seeding on the sphere: D2 = 2 - 2*cos
    cents = np.empty((k, X.shape[1]), dtype="float64")
    first = int(rng.integers(m))
    cents[0] = X[first]
    d2 = np.maximum(0.0, 2.0 - 2.0 * (X @ cents[0]))
    for i in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            # all mass covered (fewer distinct directions than k):
            # reuse uniform picks; duplicates are harmless (empty
            # cells are re-seeded below and unused cells idle)
            pick = int(rng.integers(m))
        else:
            pick = int(rng.choice(m, p=d2 / tot))
        cents[i] = X[pick]
        d2 = np.minimum(d2, np.maximum(0.0, 2.0 - 2.0 * (X @ cents[i])))

    chunk = 8192
    for _ in range(iters):
        # chunked BLAS assign (bounds the (m, k) score matrix)
        assign = np.empty(m, dtype="int64")
        best = np.empty(m, dtype="float64")
        for lo in range(0, m, chunk):
            sc = X[lo : lo + chunk] @ cents.T
            assign[lo : lo + chunk] = sc.argmax(axis=1)
            best[lo : lo + chunk] = sc.max(axis=1)
        # mean update on the sphere
        new = np.zeros_like(cents)
        np.add.at(new, assign, X)
        counts = np.bincount(assign, minlength=k)
        # A cell is "empty" if no member OR if its members sum to
        # (near-)zero: normalizing a near-zero sum would mint a NaN
        # centroid that then poisons every later X @ cents.T argmax
        # (NaN scores make argmax return index 0) -- round-12
        # ADVICE.  Both cases re-seed from the worst-covered point.
        sum_norm = np.linalg.norm(new, axis=1)
        empty = (counts == 0) | (sum_norm < 1e-9)
        nz = ~empty
        new[nz] = new[nz] / sum_norm[nz, None]
        if empty.any():
            # re-seed each empty cell to the worst-covered point
            order = np.argsort(best)  # lowest best-cos first
            for j, cell in enumerate(np.nonzero(empty)[0]):
                new[cell] = X[order[j % m]]
        cents = new

    sess = e.sparkSession
    return sess.createDataFrame(
        [
            (int(i), [float(v) for v in cents[i]], 1.0)
            for i in range(k)
        ],
        "cell long, cv array<double>, c_norm double",
    )


def ivf_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-cell assignment (map-side argmax against the
    broadcast centroids): (vec_id, embedding, norm, cell)."""
    ccos = dot("embedding", "cv") / F.nullif(
        F.col("norm") * F.col("c_norm"), F.lit(0.0)
    )
    best_cell = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", ccos.alias("ccos"), "cell")
        .groupBy("vec_id")
        .agg(F.max_by("cell", F.struct(F.col("ccos"), -F.col("cell"))).alias("cell"))
    )
    return e.join(best_cell, "vec_id")


def ivf_assign_arrow(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Scale-path twin of :func:`ivf_assign`: the same
    nearest-centroid argmax computed as ONE float64 BLAS matmul per
    Arrow batch instead of a cells-way Catalyst crossJoin fold.

    Why it exists (round 11, ANN_RECALL_r11.json): at the
    derive_n_cells geometry the Catalyst assign is O(n*cells*d) of
    interpreted higher-order-function arithmetic and dominates the
    1M/1024-cell serve (444 of 591 s); the identical argmax as a
    unit-row matmul is a few seconds of BLAS.  This is exactly the
    "trained quantizer + BLAS-assisted encode" shape a cluster
    serving tier uses — embarrassingly parallel map work over
    Arrow batches, centroids shipped once in the closure (<= 2 MB
    at the 4096-cell cap; the collect is bounded by N_CELLS'
    derivation cap, the repo's guarded-collect discipline).

    Tie-break matches ivf_assign (highest ccos, then LOWEST cell):
    centroids are laid out in ascending-cell order and np.argmax
    returns the first maximum.  Float64 partial-sum ORDER differs
    from Catalyst's sequential fold (BLAS reorders), so exact-tie
    edges can resolve differently in the last ulp — the registered
    fixture forms therefore keep :func:`ivf_assign` (the
    oracle-mirrored fold); ladders and serving deployments use
    this form and certify recall against exact ground truth
    (`binary_hamming_rerank_blas_assign` rung rows).

    Zero-norm semantics mirror the MEASURED Catalyst fold (round-12
    ADVICE): in ivf_assign the cosine is dot / nullif(norm*c_norm,
    0), and the max_by ordering key is struct(ccos, -cell) — a
    struct is never NULL, and a NULL field sorts BELOW every value
    in struct comparison.  So a zero-norm CENTROID (NULL ccos
    against every vector) loses to any non-NULL cosine, even a
    negative one, and a zero-norm VECTOR (NULL ccos against every
    centroid) ties on the NULL first field and resolves on the
    -cell tiebreak: it gets the LOWEST cell id of ALL centroids,
    zero-norm ones included.  With no centroids at all, the inner
    join drops every row.  All four edges measured against the
    Catalyst fold and pinned in tests/test_ann_recall.py."""
    import numpy as np
    import pandas as pd

    rows = cents.orderBy("cell").collect()  # bounded: <= cells cap
    all_cells = np.array([r["cell"] for r in rows], dtype="int64")
    lowest_cell = int(all_cells.min()) if len(all_cells) else None
    cu_t, cell_ids = None, all_cells[:0]
    if rows:
        c = np.array([r["cv"] for r in rows], dtype="float64")
        c_norm = np.linalg.norm(c, axis=1)
        valid = c_norm > 0  # zero-norm centroid: NULL ccos, loses ties
        cell_ids = all_cells[valid]
        c = c[valid]
        c_norm = c_norm[valid]
        if len(c):
            cu_t = (c / c_norm[:, None]).T  # (d, k_valid)

    def assign_batches(batches):
        for pdf in batches:
            if lowest_cell is None:
                # no centroids: Catalyst's inner join yields nothing
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"][:0],
                        "cell": np.array([], dtype="int64"),
                    }
                )
                continue
            v = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
            n = np.linalg.norm(v, axis=1)
            if cu_t is None:
                # every centroid zero-norm: all-NULL ccos row ->
                # the -cell tiebreak picks the lowest cell
                out = np.full(len(v), lowest_cell, dtype="int64")
            else:
                nz = n.copy()
                nz[nz == 0] = 1.0
                scores = (v / nz[:, None]) @ cu_t  # (b, k) cosines
                best = scores.argmax(axis=1)  # first max = lowest cell
                out = cell_ids[best]
                # zero-norm vector: all-NULL ccos -> lowest cell
                out[n == 0] = lowest_cell
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell": out})

    best_cell = e.select("vec_id", "embedding").mapInPandas(
        assign_batches, "vec_id long, cell long"
    )
    return e.join(best_cell, "vec_id")


def ivf_probes(
    e: DataFrame, cents: DataFrame, n_probe: int = N_PROBE
) -> DataFrame:
    """Per-query probe cells: (q_id, qv, q_norm, cell) for the
    n_probe nearest centroids of every query vector."""
    q = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("norm").alias("q_norm"),
    )
    probe_w = Window.partitionBy("q_id").orderBy(
        F.col("pcos").desc(), F.col("cell").asc()
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "pcos",
            dot("qv", "cv")
            / F.nullif(F.col("q_norm") * F.col("c_norm"), F.lit(0.0)),
        )
        .withColumn("prk", F.row_number().over(probe_w))
        .where(F.col("prk") <= n_probe)
        .select("q_id", "qv", "q_norm", "cell")
    )


def ivf_topk_from(
    e: DataFrame, n_cells: int = N_CELLS, n_probe: int = N_PROBE
) -> DataFrame:
    """IVF approximate top-TOPK over a (vec_id, embedding) relation
    — the builder behind ann_ivf_topk, parameterized on cell/probe
    counts for the recall sweep (scripts/ann_recall.py)."""
    e = e.select("vec_id", "embedding", l2("embedding").alias("norm"))
    cents = ivf_centroids(e, n_cells)
    assigned = ivf_assign(e, cents)
    probes = ivf_probes(e, cents, n_probe)
    cand = assigned.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        F.col("norm").alias("n_norm"),
        "cell",
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        probes.join(cand, "cell")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot("qv", "nv")
            / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0)),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-5: a coarse quantizer of N_CELLS
    centroids (deterministic: the N_CELLS lowest vec_ids) assigns
    every vector to its nearest cell; each query searches only its
    N_PROBE nearest cells.  (Inverted-file ANN after Jégou et al.,
    "Product quantization for nearest neighbor search", TPAMI 2011
    — coarse-quantizer stage only, no PQ residual codes.)

    Scale shape: centroids are broadcast (fixed small set), so cell
    assignment is a broadcast nested-loop scan — linear in n, no
    shuffle of the corpus.  The nearest-cell argmax is a map-side-
    combining groupBy(vec_id) max_by, NOT a window over the n*K
    expansion.  The probe join is keyed by cell; with N_CELLS ~
    sqrt(n) cells, cost drops from n*q to ~n*q*probe/cells, and AQE
    skew-join splits any hot cell.  Measured recall vs brute force
    is certified in ANN_RECALL_r7.json and floored in tests.
    """
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivf_topk_from(e)


def _ivf_oracle_sql() -> str:
    """DuckDB mirror of the IVF pipeline: same deterministic
    centroids (N_CELLS lowest vec_ids), same argmax cell assignment
    (ccos DESC, cell ASC), same N_PROBE probe cells, same final
    top-k — every float computed by the identical ordered fold."""
    from ..functions.vectors import duck_dot, duck_l2

    return f"""
WITH e AS (
  SELECT vec_id, embedding, {duck_l2('embedding')} AS norm FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, embedding AS cv, norm AS c_norm
  FROM e ORDER BY vec_id LIMIT {N_CELLS}
),
best AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             ({duck_dot('e.embedding', 'c.cv')}
              / nullif(e.norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS r
    FROM e CROSS JOIN cents c
  ) t WHERE r = 1
),
assigned AS (
  SELECT e.vec_id, e.embedding, e.norm, b.cell
  FROM e JOIN best b USING (vec_id)
),
q AS (
  SELECT vec_id AS q_id, embedding AS qv, norm AS q_norm
  FROM e WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT q_id, qv, q_norm, cell FROM (
    SELECT q.q_id, q.qv, q.q_norm, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             ({duck_dot('q.qv', 'c.cv')}
              / nullif(q.q_norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS prk
    FROM q CROSS JOIN cents c
  ) t WHERE prk <= {N_PROBE}
),
scored AS (
  SELECT p.q_id, a.vec_id AS n_id,
         ({duck_dot('p.qv', 'a.embedding')}
          / nullif(p.q_norm * a.norm, 0.0)) AS cos
  FROM probes p JOIN assigned a USING (cell)
  WHERE p.q_id <> a.vec_id
)
SELECT q_id, n_id, cos, rk FROM (
  SELECT q_id, n_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_IVF_TOPK_ORACLE = _ivf_oracle_sql()


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid stats — the IVF coarse-quantizer building
    block (grouping vectors into cells).  Element-wise mean of the
    first 8 dims, rounded."""
    e = load_table(spark, sf_dir, "embeddings")
    cols = [
        qavg(F.element_at("embedding", i + 1).cast("double"), 6).alias(f"c{i}")
        for i in range(8)
    ]
    return (
        e.groupBy("label")
        .agg(F.count("*").alias("n"), *cols)
        .orderBy("label")
    )


EMBEDDING_LABEL_CENTROIDS_ORACLE = """
SELECT label, count(*) AS n,
       ((CAST(sum(CAST(floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c0,
       ((CAST(sum(CAST(floor((CAST(embedding[2] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c1,
       ((CAST(sum(CAST(floor((CAST(embedding[3] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c2,
       ((CAST(sum(CAST(floor((CAST(embedding[4] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c3,
       ((CAST(sum(CAST(floor((CAST(embedding[5] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c4,
       ((CAST(sum(CAST(floor((CAST(embedding[6] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c5,
       ((CAST(sum(CAST(floor((CAST(embedding[7] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c6,
       ((CAST(sum(CAST(floor((CAST(embedding[8] AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) / 1000000.0) / count(*)) AS c7
FROM embeddings
GROUP BY label
ORDER BY label
"""


register(
    "ann_cosine_topk_bruteforce", ann_cosine_topk_bruteforce, ANN_COSINE_TOPK_ORACLE
)
register("ann_lsh_bucketed", ann_lsh_bucketed, ANN_LSH_BUCKETED_ORACLE)
register("ann_lsh_multitable", ann_lsh_multitable, ANN_LSH_MULTITABLE_ORACLE)
register("dedup_embedding_lsh", dedup_embedding_lsh, DEDUP_EMBEDDING_LSH_ORACLE)
register("ann_ivf_topk", ann_ivf_topk, ANN_IVF_TOPK_ORACLE)
register(
    "embedding_label_centroids",
    embedding_label_centroids,
    EMBEDDING_LABEL_CENTROIDS_ORACLE,
)


def ann_cosine_topk_matmul(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized-Python ANN: the query set (bounded by definition —
    it is the user's input, not the corpus) broadcasts as one numpy
    matrix; candidates stream through mapInPandas in Arrow batches
    and score against ALL queries at once with a single matmul.
    Each batch emits only its per-query top-k (partial top-k), so
    the final global top-k aggregates #partitions * k * q rows —
    never the full n*q score matrix.

    This is the Python-vectorized twin of ann_cosine_topk_bruteforce:
    ~64x fewer interpreter transitions than per-pair expression
    eval, at the cost of float-sum order differing from the HOF
    fold (rows-only driver check; recall vs the exact query
    asserted in tests)."""
    import numpy as np
    import pandas as pd

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # the query set is driver-collected by design (it is the user's
    # bounded input, broadcast as one numpy matrix) — but guard the
    # collect so a misconfigured QUERY_MOD can never pull the whole
    # corpus through the driver
    qrows = (
        e.where(F.col("vec_id") % QUERY_MOD == 0)
        .orderBy("vec_id")
        .limit(MAX_QUERY_COLLECT + 1)
        .collect()
    )
    if len(qrows) > MAX_QUERY_COLLECT:
        raise ValueError(
            f"ann_cosine_topk_matmul: query set exceeds "
            f"MAX_QUERY_COLLECT={MAX_QUERY_COLLECT} rows; refusing to "
            f"collect it to the driver — tighten the query predicate"
        )
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    bq = spark.sparkContext.broadcast((q_ids, qm))

    def score_batches(batches):
        ids, Q = bq.value
        k = TOPK + 1  # +1: a query may appear in its own batch
        for pdf in batches:
            M = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            S = M @ Q.T  # B x Qn cosines
            n_ids = pdf["vec_id"].to_numpy()
            take = min(k, S.shape[0])
            top = np.argpartition(-S, take - 1, axis=0)[:take]  # take x Qn
            out_q, out_n, out_c = [], [], []
            for j in range(S.shape[1]):
                rows = top[:, j]
                out_q.extend([ids[j]] * len(rows))
                out_n.extend(n_ids[rows])
                out_c.extend(S[rows, j])
            yield pd.DataFrame(
                {"q_id": out_q, "n_id": out_n, "cos": out_c}
            )

    partial = e.mapInPandas(score_batches, "q_id long, n_id long, cos double")
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        partial.where(F.col("q_id") != F.col("n_id"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


register("ann_cosine_topk_matmul", ann_cosine_topk_matmul)  # rows-only


SQ_LEVELS = 255  # int8 scalar-quantization levels (matches curation)


def sq8_recon_index(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """The SQ8 quantized index of a (vec_id, embedding) relation:
    (n_id, bucket, recon), where recon is the codes-only
    reconstruction `mn_i + (code_i + 0.5) * rng_i / 255`.  Shared
    by ann_sq8_adc and the two-stage rerank (retrieval.py) so the
    coarse stages can never drift apart."""
    flat = e.select(
        F.posexplode(F.col("embedding")).alias("dim", "v")
    ).select("dim", F.col("v").cast("double").alias("v"))
    stats = (
        flat.groupBy("dim")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mn", "mx"))
            ).alias("dm")
        )
        .select(
            F.transform("dm", lambda s: s["mn"]).alias("mins"),
            F.transform(
                "dm", lambda s: F.nullif(s["mx"] - s["mn"], F.lit(0.0))
            ).alias("rngs"),
        )
    )
    codes = F.transform(
        F.col("embedding"),
        lambda v, i: F.floor(
            (v.cast("double") - F.element_at(F.col("mins"), i + 1))
            / F.element_at(F.col("rngs"), i + 1)
            * F.lit(float(SQ_LEVELS))
        ).cast("bigint"),
    )
    return (
        e.crossJoin(F.broadcast(stats))
        .select(
            F.col("vec_id").alias("n_id"),
            _bucket_expr("embedding", n_planes).alias("bucket"),
            codes.alias("codes"),
            "mins",
            "rngs",
        )
        # reconstruction reads ONLY (codes, mins, rngs); constant
        # dims (null range) decode exactly to their min
        .select(
            "n_id",
            "bucket",
            F.transform(
                "codes",
                lambda c, i: F.coalesce(
                    F.element_at(F.col("mins"), i + 1)
                    + (c + F.lit(0.5))
                    * F.element_at(F.col("rngs"), i + 1)
                    / F.lit(float(SQ_LEVELS)),
                    F.element_at(F.col("mins"), i + 1),
                ),
            ).alias("recon"),
        )
    )


def sq8_queries(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """The full-precision query side (q_id, qv, bucket) of the SQ8
    pipelines (asymmetric: only the corpus is quantized)."""
    return e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        _bucket_expr("embedding", n_planes).alias("bucket"),
    )


def sq8_adc_from(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """SQ8 asymmetric-distance top-TOPK over a (vec_id, embedding)
    relation — the builder behind ann_sq8_adc, parameterized on
    plane count for the recall sweep (scripts/ann_recall.py)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc()
    )
    return (
        sq8_queries(e, n_planes)
        .join(sq8_recon_index(e, n_planes), "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("adc", dot("qv", "recon"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "adc", "rk")
        .orderBy("q_id", "rk")
    )


def ann_sq8_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantized-index ANN: LSH-bucketed candidate generation
    scored by ASYMMETRIC DISTANCE over an int8 scalar-quantized
    corpus — the memory-bound serving shape (a 64-dim float32
    vector becomes 64 one-byte codes, a 4x smaller index; FAISS's
    SQ8 flat index, after the scalar-quantizer stage of Jégou et
    al., "Product quantization for nearest neighbor search", TPAMI
    2011).

    Index build (corpus side, one pass, zero corpus shuffle):
    per-dim (min, range) stats aggregate to ONE broadcast row of
    two flat arrays; each vector stores its LSH bucket plus the
    int8 code array.  The scoring side reconstructs
    `mn_i + (code_i + 0.5) * rng_i / 255` FROM THE CODES ONLY —
    the original embedding is never read after encoding, which is
    the point: at 100 TB the float corpus stays in cold storage
    and the scan touches only the quantized index.

    Query side keeps full precision (asymmetric: only the corpus
    is quantized), probes its LSH bucket, ranks by the ADC inner
    product.  Every float is an ordered left-to-right double fold
    and the codes are exact integers, so the whole pipeline —
    stats, codes, reconstruction, scores, ranks — value-hash
    matches the DuckDB oracle; measured recall vs the exact scan is
    certified in ANN_RECALL_r7.json and floored in tests."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return sq8_adc_from(e)


def sq8_oracle_ctes() -> str:
    """The shared DuckDB WITH-prefix of every SQ8 pipeline oracle
    (flat / dims / stats / base / index_side): same plane literals
    for the bucket, same dim stats, same integer codes, same
    codes-only reconstruction.  Shared with the two-stage rerank
    oracle (retrieval.py) so the mirrors can never drift."""
    from ..functions.vectors import duck_dot

    planes = _planes()
    bucket_terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(f"{float(x):.1f}" for x in plane) + "]"
        proj = duck_dot("embedding", lit)
        bucket_terms.append(f"CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END")
    bucket = "CAST(" + " + ".join(bucket_terms) + " AS BIGINT)"
    lv = float(SQ_LEVELS)
    return f"""flat AS (
  SELECT unnest(generate_series(1, len(embedding))) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS v
  FROM embeddings
),
dims AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM flat GROUP BY dim),
stats AS (
  SELECT list(mn ORDER BY dim) AS mins,
         list(nullif(mx - mn, 0.0) ORDER BY dim) AS rngs
  FROM dims
),
base AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
index_side AS (
  SELECT b.vec_id AS n_id, b.bucket,
         list_transform(generate_series(1, len(b.embedding)), i ->
           coalesce(
             s.mins[i]
             + (CAST(floor((CAST(b.embedding[i] AS DOUBLE) - s.mins[i])
                           / s.rngs[i] * {lv}) AS BIGINT) + 0.5)
               * s.rngs[i] / {lv},
             s.mins[i])) AS recon
  FROM base b, stats s
)"""


def _sq8_adc_oracle_sql() -> str:
    """DuckDB mirror of ann_sq8_adc: shared SQ8 prefix + the ADC
    scoring and rank cut."""
    from ..functions.vectors import duck_dot

    return f"""
WITH {sq8_oracle_ctes()},
scored AS (
  SELECT q.vec_id AS q_id, n.n_id,
         {duck_dot('q.embedding', 'n.recon')} AS adc
  FROM base q JOIN index_side n ON q.bucket = n.bucket
  WHERE q.vec_id % {QUERY_MOD} = 0 AND q.vec_id <> n.n_id
)
SELECT q_id, n_id, adc, rk FROM (
  SELECT q_id, n_id, adc,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY adc DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_SQ8_ADC_ORACLE = _sq8_adc_oracle_sql()

register("ann_sq8_adc", ann_sq8_adc, ANN_SQ8_ADC_ORACLE)


# ---------------------------------------------------------------
# Product quantization (PQ) ADC — Jégou, Douze & Schmid, "Product
# quantization for nearest neighbor search", TPAMI 2011: the full
# residual-code stage the IVF query only borrowed its coarse
# quantizer from.
# ---------------------------------------------------------------

PQ_M = 8  # subquantizers (64 dims -> 8 subvectors of 8)
PQ_SUB = DIM // PQ_M
PQ_K = 16  # codewords per subquantizer
PQ_ADC_SCALE = 1_000_000  # quantize per-m partials before the sum
RERANK_C_FLOOR = 25  # minimum exact-rerank candidates per query
RERANK_C_CAP = 4096  # adaptive-budget ceiling (bounds the exact stage)


def _dsub(col, m: int) -> F.Column:
    """m-th double-cast subvector of an array<float> column."""
    return F.slice(
        F.transform(col, lambda v: v.cast("double")),
        m * PQ_SUB + 1,
        PQ_SUB,
    )


def _sqdist(a, b) -> F.Column:
    """Ordered-fold squared L2 over two double arrays (the
    determinism contract of functions.vectors)."""
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v)


def pq_codebook(e: DataFrame) -> DataFrame:
    """(m, k, cw): codeword k of subquantizer m is the m-th
    subvector of the k-th-lowest vec_id — the same honest
    deterministic 'training' as the IVF centroids (real systems run
    per-subspace k-means; determinism is what buys the cross-engine
    oracle, and the assignment/scoring machinery is identical)."""
    w = Window.orderBy("vec_id")
    return (
        e.orderBy("vec_id")
        .limit(PQ_K)
        .withColumn("k", F.row_number().over(w) - 1)
        .select(
            "k",
            F.posexplode(
                F.array(*[_dsub("embedding", m) for m in range(PQ_M)])
            ).alias("m", "cw"),
        )
    )


def pq_codes(
    e: DataFrame, n_planes: int = N_PLANES, cb: DataFrame | None = None
) -> DataFrame:
    """The PQ index: (n_id, bucket, m, k) — 8 one-nibble codes per
    vector (PQ_K=16), an 8x smaller index than SQ8's 64 bytes.
    Assignment is per-(vector, subspace) argmin over the BROADCAST
    codebook — one map-side pass over the corpus, no shuffle of the
    vectors.  The argmin is a map-side-combining min_by with the
    (d2 ASC, k ASC) struct tiebreak (round 14; the former
    row_number window shuffled the whole n x M x K expansion —
    ivfadc_codes' comment explains why the aggregate shape is the
    scale-correct one; the min_by struct order is the identical
    deterministic argmin the oracle mirrors)."""
    subs = e.select(
        F.col("vec_id").alias("n_id"),
        _bucket_expr("embedding", n_planes).alias("bucket"),
        F.posexplode(
            F.array(*[_dsub("embedding", m) for m in range(PQ_M)])
        ).alias("m", "sv"),
    )
    if cb is None:
        cb = pq_codebook(e)
    return (
        subs.join(F.broadcast(cb), "m")
        .withColumn("d2", _sqdist("sv", "cw"))
        .groupBy("n_id", "m")
        .agg(
            F.min_by("k", F.struct(F.col("d2"), F.col("k"))).alias("k"),
            F.first("bucket").alias("bucket"),
        )
        .select("n_id", "bucket", "m", "k")
    )


def pq_adc_from(e: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """PQ asymmetric-distance top-TOPK: LSH-bucketed candidates
    scored by table lookup — the query's m-th subvector dotted with
    the candidate's m-th CODEWORD (the original vector is never
    read after encoding; the whole serving index is codes +
    codebook).  Per-(q, m) partials quantize to bigints before the
    per-pair sum, so the 8-way addition is order-free and the
    pipeline value-hash matches the oracle (the repo's
    quantize-then-sum discipline for floats under groupBy)."""
    q = sq8_queries(e, n_planes)
    qsubs = q.select(
        "q_id",
        "bucket",
        F.posexplode(
            F.array(*[_dsub("qv", m) for m in range(PQ_M)])
        ).alias("m", "qsv"),
    )
    # cache the codebook (round 14): M x K rows behind a
    # TakeOrdered-over-the-corpus lineage, consumed by BOTH the
    # encode argmin and the ADC lookup join — the stored-artifact
    # discipline of ivfadc_index
    cb = pq_codebook(e).cache()
    parts = (
        qsubs.join(pq_codes(e, n_planes, cb=cb), ["bucket", "m"])
        .where(F.col("q_id") != F.col("n_id"))
        .join(F.broadcast(cb), ["m", "k"])
        .select(
            "q_id",
            "n_id",
            F.floor(
                F.aggregate(
                    F.zip_with("qsv", "cw", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                * PQ_ADC_SCALE
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pq"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc()
    )
    return (
        parts.groupBy("q_id", "n_id")
        .agg((F.sum("pq") / F.lit(float(PQ_ADC_SCALE))).alias("adc"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "adc", "rk")
        .orderBy("q_id", "rk")
    )


def ann_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`pq_adc_from` over the embeddings
    fixture."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return pq_adc_from(e)


def _pq_oracle_sql() -> str:
    """DuckDB mirror: same deterministic codebook, same ordered
    sqdist/dot folds, same argmin tiebreak, same quantize-then-sum
    ADC."""
    planes = _planes()
    bucket = _duck_bucket_sql(planes)
    lo = "g.m * {s} + 1".format(s=PQ_SUB)
    hi = "g.m * {s} + {s}".format(s=PQ_SUB)
    sub = (
        f"list_transform(embedding[({lo}):({hi})], "
        "x -> CAST(x AS DOUBLE))"
    )
    sqd = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(s.sv, c.cw), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, v) -> acc + v)"
    )
    dotf = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(q.qsv, cb.cw), "
        "p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    return f"""
WITH cb AS (
  SELECT b.k, g.m, {sub} AS cw
  FROM (
    SELECT vec_id, embedding,
           row_number() OVER (ORDER BY vec_id) - 1 AS k
    FROM embeddings ORDER BY vec_id LIMIT {PQ_K}
  ) b, generate_series(0, {PQ_M - 1}) AS g(m)
),
subs AS (
  SELECT vec_id AS n_id, {bucket} AS bucket, g.m, {sub} AS sv
  FROM embeddings, generate_series(0, {PQ_M - 1}) AS g(m)
),
codes AS (
  SELECT n_id, bucket, m, k FROM (
    SELECT s.n_id, s.bucket, s.m, c.k,
           row_number() OVER (PARTITION BY s.n_id, s.m
                ORDER BY {sqd} ASC, c.k ASC) AS rn
    FROM subs s JOIN cb c ON c.m = s.m
  ) t WHERE rn = 1
),
qsubs AS (
  SELECT vec_id AS q_id, {bucket} AS bucket, g.m, {sub} AS qsv
  FROM embeddings, generate_series(0, {PQ_M - 1}) AS g(m)
  WHERE vec_id % {QUERY_MOD} = 0
),
parts AS (
  SELECT q.q_id, c.n_id,
         CAST(floor({dotf} * {PQ_ADC_SCALE}.0 + 0.5) AS BIGINT) AS pq
  FROM qsubs q
  JOIN codes c ON c.bucket = q.bucket AND c.m = q.m
  JOIN cb ON cb.m = c.m AND cb.k = c.k
  WHERE q.q_id <> c.n_id
),
scored AS (
  SELECT q_id, n_id,
         CAST(sum(pq) AS BIGINT) / {PQ_ADC_SCALE}.0 AS adc
  FROM parts GROUP BY q_id, n_id
)
SELECT q_id, n_id, adc, rk FROM (
  SELECT q_id, n_id, adc,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY adc DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_PQ_ADC_ORACLE = _pq_oracle_sql()

register("ann_pq_adc", ann_pq_adc, ANN_PQ_ADC_ORACLE)


# ---------------------------------------------------------------
# IVFADC — the COMPOSED Jégou index (TPAMI 2011 §5): IVF coarse
# quantizer + PQ codes over the RESIDUAL y - q1(y).  ann_ivf_topk
# is the coarse stage alone (full-precision rescan inside probed
# cells); ann_pq_adc is the PQ stage alone (LSH-bucketed, codes of
# the raw vectors).  This is the production shape: candidates come
# from the inverted file, and the serving index stores ONLY
# (cell, 8 nibble codes, norm) per vector — the original
# embeddings are never read after encoding.
# ---------------------------------------------------------------


def _dslice(col, m: int) -> F.Column:
    """m-th subvector of an already-double array column (residuals
    are born double; contrast _dsub, which casts float inputs)."""
    return F.slice(col, m * PQ_SUB + 1, PQ_SUB)


def _ddot(a, b) -> F.Column:
    """Ordered-fold dot over two double arrays (no cast — the
    zip_with cast in functions.vectors.dot is for float inputs)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def ivfadc_residuals(
    e: DataFrame, cents: DataFrame, fast_assign: bool = False
) -> DataFrame:
    """(vec_id, norm, cell, rv): every vector's residual against
    its assigned coarse centroid, as a double array.  Broadcast
    centroid join — map-side, no shuffle of the corpus.
    fast_assign=True routes through the Arrow/BLAS assign twin
    (scaled-cells serving path; registered forms keep the
    oracle-mirrored Catalyst fold)."""
    return (
        (ivf_assign_arrow if fast_assign else ivf_assign)(e, cents)
        .join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            "norm",
            "cell",
            F.zip_with(
                "embedding",
                "cv",
                lambda x, y: x.cast("double") - y.cast("double"),
            ).alias("rv"),
        )
    )


def ivfadc_codebook(resid: DataFrame, n_cells: int) -> DataFrame:
    """(m, k, cw): residual codeword k of subquantizer m — the m-th
    residual subvector of the (n_cells + k)-th-lowest vec_id.  The
    codebook is trained on residuals AFTER the centroid rows: the
    n_cells lowest vec_ids are the centroids themselves, whose
    residuals are identically zero — training on them would
    collapse every codeword to the origin and the ADC term to a
    constant.  (Real systems run k-means on sampled residuals; the
    deterministic pick keeps the cross-engine oracle, and the
    encode/serve machinery is identical.)"""
    w = Window.orderBy("vec_id")
    return (
        # limit BEFORE the global-window row_number so the
        # single-partition WindowExec sees <= n_cells + PQ_K rows,
        # never the corpus (the pq_codebook discipline)
        resid.orderBy("vec_id")
        .limit(n_cells + PQ_K)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") > n_cells)
        .select(
            (F.col("rn") - n_cells - 1).alias("k"),
            F.posexplode(
                F.array(*[_dslice(F.col("rv"), m) for m in range(PQ_M)])
            ).alias("m", "cw"),
        )
    )


def ivfadc_codes(resid: DataFrame, cb: DataFrame) -> DataFrame:
    """The serving index: (n_id, n_norm, cell, m, k) — per-subspace
    argmin of squared L2 to the broadcast residual codebook.  The
    argmin is a map-side-combining groupBy(n_id, m) min_by over the
    n*M*K expansion (the ivf_assign shape), NOT a window — no
    shuffle of the expansion beyond the partial-agg combine."""
    subs = resid.select(
        F.col("vec_id").alias("n_id"),
        F.col("norm").alias("n_norm"),
        "cell",
        F.posexplode(
            F.array(*[_dslice(F.col("rv"), m) for m in range(PQ_M)])
        ).alias("m", "sv"),
    )
    best = (
        subs.join(F.broadcast(cb), "m")
        .withColumn("d2", _sqdist("sv", "cw"))
        .groupBy("n_id", "m")
        .agg(
            F.min_by("k", F.struct(F.col("d2"), F.col("k"))).alias("k"),
            F.first("n_norm").alias("n_norm"),
            F.first("cell").alias("cell"),
        )
    )
    return best.select("n_id", "n_norm", "cell", "m", "k")


def ivfadc_index(
    e: DataFrame,
    n_cells: int = N_CELLS,
    fast_assign: bool = False,
    cents: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(e_normed, cents, cb, codes): the complete IVFADC serving
    index of a (vec_id, embedding) relation — the shared build
    behind ivfadc_scored_from AND the adaptive rerank budget, so the
    scored pipeline and the collision histogram can never disagree
    about what the codes are.  `cents` overrides the coarse
    quantizer (e.g. :func:`train_ivf_centroids`); default stays the
    deterministic oracle-mirrored lowest-vec_id pick."""
    en = e.select("vec_id", "embedding", l2("embedding").alias("norm"))
    if cents is None:
        # cache the coarse quantizer (round 14): n_cells rows, but
        # its lineage is a TakeOrdered over the corpus — every
        # consumer (assign, probes, residual join) replayed that
        # scan.  Like the code index below, the centroid table IS a
        # stored artifact of a real IVFADC deployment.
        cents = ivf_centroids(en, n_cells).cache()
    resid = ivfadc_residuals(en, cents, fast_assign)
    # cache the residual codebook (round 14): M x K rows, but its
    # lineage is a full assign + residual pass (TakeOrdered over the
    # resid relation) — its second consumer (the query LUT build in
    # ivfadc_scored_from_index) replayed that whole pass per query.
    cb = ivfadc_codebook(resid, n_cells).cache()
    # cache the CODE INDEX: its consumers (packed-codes scan, query
    # LUTs via the shared lineage, collision-budget histogram, and —
    # in the upsert form — compaction) each replayed the full
    # residual-encode argmin expansion; Spark's exchange reuse only
    # dedups subtrees behind an identical Exchange, and the round-12
    # plan audit counted up to 54 scans in one serving plan from
    # exactly this replay.  Materializing the ~6-byte/vector index
    # once per build is what a real IVFADC deployment does anyway
    # (FAISS add() output IS the stored artifact; at 100 TB persist
    # DISK_ONLY instead of memory).  Measured min-of-3 at sf0.1:
    # ann_ivfadc_rerank 4.1-5.0 -> 2.9 s, family of 7 serving
    # queries 25.6-27.6 -> 21.2-22.4 s, results value-identical.
    codes = ivfadc_codes(resid, cb).cache()
    return en, cents, cb, codes


def ivfadc_index_trained_on(
    e: DataFrame, train_pred, n_cells: int = N_CELLS
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """(e_normed, cents, cb, codes) with the QUANTIZERS (coarse
    centroids + residual codebook) trained ONLY on the `train_pred`
    subset while the code index covers ALL rows — the incremental-
    maintenance composition: an index built on yesterday's corpus
    ingests today's delta by encoding the new vectors against the
    FROZEN quantizers (one broadcast-join assign + argmin-encode
    pass over the delta, exactly the FAISS add-after-train shape),
    never retraining or re-encoding the base.  At 100 TB this is
    what daily ingest actually does: codebook training is a one-off;
    adds are embarrassingly parallel map-side passes."""
    en = e.select("vec_id", "embedding", l2("embedding").alias("norm"))
    base = en.where(train_pred)
    # cached like ivfadc_index's centroid table: n_cells rows behind
    # a TakeOrdered-over-the-corpus lineage, multiple consumers
    cents = ivf_centroids(base, n_cells).cache()
    # ONE residual/assign pass (round 14, guide §2.4): the coarse
    # assign + residual computation is row-wise, so the BASE-slice
    # residuals the codebook trains on are exactly the full-set
    # residuals filtered by the train predicate — computing
    # ivfadc_residuals twice (base slice, then full set) replayed
    # the corpus x cells argmin expansion.  The shared residual
    # relation is cached (the build-time sibling of the cached code
    # index; at 100 TB persist DISK_ONLY and unpersist after the
    # build — it is a transient build artifact, the codes below are
    # the stored one).
    resid = ivfadc_residuals(en, cents).cache()
    # codebook trains on BASE residuals only (the delta didn't exist
    # at training time); the code index encodes EVERY row.  Cached
    # like ivfadc_index's: the LUT consumer would replay its pass.
    cb = ivfadc_codebook(resid.where(train_pred), n_cells).cache()
    # cached for the same reason as ivfadc_index: the code index is
    # the stored serving artifact; every downstream consumer would
    # otherwise replay the encode expansion
    codes = ivfadc_codes(resid, cb).cache()
    return en, cents, cb, codes


# Registered rerank-budget margin.  ANN_TAIL_r9.json measured the
# adaptive budget's residual dead-query tail (margin=1: ~2% of
# queries get ZERO of their true top-5): every dead query's truth IS
# generated as a candidate (routing loss 0) and sits 1..5x past the
# exact-collision budget in ADC rank — a near-tie pileup of ADJACENT
# codes, which the collision histogram cannot see because the codes
# differ.  The margin multiplies the histogram's max_cluster to
# absorb that band.  The band edge is MEASURED, not guessed:
# 5.08x max_cluster at 100k (ANN_TAIL_r9.json), 5.27-5.40x at 500k
# (ANN_TAIL_r10_500k.json), and 5.02-5.39x at 1M
# (ANN_TAIL_r10_1m.json) — the edge SATURATES near 5.4x rather than
# growing with corpus size, because the depth counts near-tie decoy
# clone families above the truth, a per-cell occupancy property
# (cells scale with the corpus).  margin=5 cleared 100k completely
# but left 3/2000 dead at 500k and 8/4000 at 1M (truth just past
# the 5x cut); margin=6 clears the measured edge at all three
# rungs with >= 11% headroom (certified: worst_query_recall 1.0 at
# 100k/500k/1M, ANN_RECALL_r10.json).
# The r9/r10 per-stage breakdowns price the wider exact stage at a
# few percent of wall (|q| x budget point lookups, independent of
# corpus size).  This is the registered serving default; margin=1
# remains the exact-collision-guarantee primitive the recall
# harness uses to demonstrate the tail.
RERANK_MARGIN = 6


def ivfadc_collision_budget(
    codes: DataFrame, cap: int, margin: int = 1
) -> DataFrame:
    """1-row (c_budget int) rerank budget derived from the PQ-code
    collision histogram of an ivfadc_codes index (round-8 verdict
    #1): vectors sharing (cell, full 8-nibble code) are
    indistinguishable to ADC — within such a cluster the rerank cut
    keeps the TIE-BREAK's pick, not the true top-k, so the exact
    stage must fetch at least the largest cluster plus TOPK to
    guarantee the true neighbors survive the cut (measured: fixed
    c=25/50 collapses to 0.02-0.23 recall on 250-clone families,
    ANN_RECALL_r8.json).

    c_budget = least(cap, greatest(RERANK_C_FLOOR,
                                   margin * max_cluster + TOPK)).

    `margin` widens the cut past the exact-collision guarantee
    (margin=1, this primitive's default) to also absorb NEAR-TIE
    pileups: ANN_TAIL_r9.json measured that the residual ~2%
    dead-query tail at the 100k rung is 100% truth-at-rank-
    (1..5)x-budget (zero routing loss), so margin=2 recovers 6/7
    dead queries and margin=5 all 7, at the exact stage's
    few-percent-of-wall price; ANN_TAIL_r10_500k.json then measured
    the band edge growing to 5.40x at 500k.  The REGISTERED serving
    queries pass RERANK_MARGIN (= 6, just above both measured
    edges — see the constant's derivation note).

    The code key packs the 8 codes (k < PQ_K = 16) into one exact
    bigint sum(k * 2^(4m)) < 2^32 — no array-typed group keys, so
    the same expression runs verbatim in the DuckDB oracle.  Cost:
    two map-side-combining aggs over the ALREADY-materialized code
    index (8 rows/vector in, 1 row out) — at 100 TB this is a
    metadata-scale pass over the ~6-byte/vector serving state, not
    the corpus.

    The second column, `budget_capped` (round 13, VERDICT r12 #1),
    is the serving tier's observability hook: True iff the
    data-derived demand (margin * max_cluster + TOPK) exceeded
    `cap`, i.e. the corpus holds an indistinguishable pileup larger
    than the exact stage is allowed to rescore, so SOME queries'
    true neighbors may not survive the cut (the ANN_SKEW_r12
    worst-0.0 regime).  A deployment alerts on it and routes the
    affected index to dedup-before-indexing or exact scan — the
    composed fix ANN_DEDUP_SKEW_r13.json demonstrates."""
    percode = codes.groupBy("n_id", "cell").agg(
        F.sum(F.col("k") * F.pow(F.lit(2.0), F.col("m") * 4))
        .cast("long")
        .alias("code_key")
    )
    hist = percode.groupBy("cell", "code_key").agg(
        F.count("*").alias("cnt")
    )
    demand = F.greatest(
        F.lit(RERANK_C_FLOOR),
        (F.max("cnt") * F.lit(margin) + F.lit(TOPK)).cast("int"),
    )
    return hist.agg(
        F.least(F.lit(cap), demand).alias("c_budget"),
        (demand > F.lit(cap)).alias("budget_capped"),
    )


def ivfadc_codes_packed(codes: DataFrame) -> DataFrame:
    """One row per indexed vector: (n_id, n_norm, cell,
    ks array<int>[PQ_M]) — the 8 nibble codes of an ivfadc_codes
    relation packed into a single array ordered by subquantizer m.
    This is the layout real IVFADC indexes store (codes are
    CONTIGUOUS per vector) and the layout ADC scoring wants: one
    candidate row per (query, vector) pair instead of PQ_M.  Cost:
    one groupBy over the 8-rows/vector code relation — index-build
    time, amortized across every query."""
    return codes.groupBy("n_id").agg(
        F.first("n_norm").alias("n_norm"),
        F.first("cell").alias("cell"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "k"))),
            lambda s: s.k,
        ).alias("ks"),
    )


def ivfadc_query_luts(e: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-query ADC lookup table: (q_id, lut array<array<long>>)
    where lut[m][k] = floor(<q_m, cw[m][k]> * SCALE + 0.5) — the
    classic per-query M x K distance table of Jégou et al. (TPAMI
    2011 §IV.A), built once per query against the broadcast
    codebook (|q| * M * K rows, metadata scale) and itself
    broadcast to the candidate scan.  Entries are the SAME
    quantized bigints the row-expanded scorer produced, so adc
    values are bit-identical."""
    qsubs = e.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("q_id"),
        F.posexplode(
            F.array(*[_dsub("embedding", m) for m in range(PQ_M)])
        ).alias("m", "qsv"),
    )
    per_mk = qsubs.join(F.broadcast(cb), "m").select(
        "q_id",
        "m",
        "k",
        F.floor(_ddot("qsv", "cw") * PQ_ADC_SCALE + F.lit(0.5))
        .cast("long")
        .alias("val"),
    )
    per_m = per_mk.groupBy("q_id", "m").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("k", "val"))),
            lambda s: s.val,
        ).alias("row")
    )
    return per_m.groupBy("q_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("m", "row"))),
            lambda s: s.row,
        ).alias("lut")
    )


def ivfadc_scored_from_index(
    e: DataFrame,
    cents: DataFrame,
    cb: DataFrame,
    codes: DataFrame,
    n_probe: int = N_PROBE,
    labels: DataFrame | None = None,
) -> DataFrame:
    """ADC scoring over a PREBUILT ivfadc_index — the index-sharing
    entry the adaptive rerank uses so its collision-budget subtree
    and the scored stage reference the SAME codes DataFrame (one
    lineage; Spark's exchange reuse dedups the shuffles the two
    consumers share, instead of rebuilding the index twice).

    Scoring: cos(q, y) is estimated by the exact decomposition
    <q, y> = <q, c(y)> + <q, r(y)> with r(y) replaced by its PQ
    reconstruction, i.e. <q, c> + sum_m <q_m, cw[m, code_m]>, all
    over norm(q) * norm(y) (true norms stored with the codes, as
    real IVFADC indexes store them).  Each of the 9 inner-product
    terms quantizes to a bigint before the per-pair sum, so the
    result is order-free and the pipeline value-hash matches the
    oracle.

    Physical shape (round-10 rewrite of the measured round-9
    bottleneck — coarse ADC was 220 of 296 s at 1M vectors): codes
    pack to ONE row per vector (ivfadc_codes_packed) and each
    query's M x K distance table builds once against the broadcast
    codebook (ivfadc_query_luts), so scoring is a single
    broadcast-joined projection over |q| x cell-size candidate rows
    — 8 array lookups + one 8-term integer sum per candidate,
    replacing the former 8-rows-per-pair expansion through two
    joins and a corpus-scale groupBy shuffle.  The candidate scan
    never shuffles: probes and LUTs ride broadcasts, packed codes
    are scanned in place.

    `labels` (optional (vec_id, label) relation) turns the inverted
    lists COMPOSITE: candidates join on (cell, label) instead of
    cell — structural PRE-filtering (the ann_ivf_filtered shape
    applied to the quantized index), so the per-query scan cost
    divides by the label cardinality and the output carries the
    query's label."""
    # query side: <q, centroid> term per probed cell — queries are
    # never quantized (asymmetric distance).
    probes = (
        ivf_probes(e, cents, n_probe)
        .join(F.broadcast(cents), "cell")
        .select(
            "q_id",
            "q_norm",
            "cell",
            F.floor(dot("qv", "cv") * PQ_ADC_SCALE + F.lit(0.5))
            .cast("long")
            .alias("qc"),
        )
    )
    packed = ivfadc_codes_packed(codes)
    luts = ivfadc_query_luts(e, cb)
    cand_keys = ["cell"]
    out_cols = ["q_id", "n_id"]
    if labels is not None:
        probes = probes.join(
            labels.select(F.col("vec_id").alias("q_id"), "label"), "q_id"
        )
        packed = packed.join(
            labels.select(F.col("vec_id").alias("n_id"), "label"), "n_id"
        )
        cand_keys = ["cell", "label"]
        out_cols = ["q_id", "label", "n_id"]
    # rsum = sum_m lut[m][ks[m]]: unrolled 8-term bigint sum — a
    # fixed evaluation order over exact integers, identical to the
    # former order-free groupBy sum of the same terms
    rsum = None
    for m in range(PQ_M):
        term = F.element_at(
            F.element_at("lut", m + 1), F.element_at("ks", m + 1) + 1
        )
        rsum = term if rsum is None else rsum + term
    # NOTE (measured non-optimization): folding the LUT into the
    # probes broadcast (one BHJ instead of two over the 125M-row
    # candidate stream) was A/B-tested at the 1M rung — wall times
    # 140-153 s vs 144-172 s, indistinguishable within run noise.
    # The per-row cost is the candidate-stream materialization and
    # the 8 nested array lookups themselves, not the second join's
    # hash probe — evidence for the SCALE.md stage-economics
    # conclusion that the residual gap to MRL is structural.
    return (
        F.broadcast(probes)
        .join(packed, cand_keys)
        .where(F.col("q_id") != F.col("n_id"))
        .join(F.broadcast(luts), "q_id")
        .select(
            *out_cols,
            (
                ((F.col("qc") + rsum) / F.lit(float(PQ_ADC_SCALE)))
                / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0))
            ).alias("adc"),
        )
    )


def ivfadc_scored_from(
    e: DataFrame,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    fast_assign: bool = False,
) -> DataFrame:
    """All ADC-scored (q_id, n_id, adc) candidate pairs of the
    IVFADC index — the shared stage behind ann_ivfadc_topk (top-5
    cut) and ann_ivfadc_rerank (budget cut + exact rescore), so the
    two pipelines cannot drift.  Builds the index inline; see
    ivfadc_scored_from_index for the index-sharing form."""
    en, cents, cb, codes = ivfadc_index(e, n_cells, fast_assign)
    return ivfadc_scored_from_index(en, cents, cb, codes, n_probe)


def ivfadc_topk_from(
    e: DataFrame, n_cells: int = N_CELLS, n_probe: int = N_PROBE
) -> DataFrame:
    """IVFADC approximate top-TOPK — the builder behind
    ann_ivfadc_topk, parameterized for the recall sweep
    (scripts/ann_recall.py)."""
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc").desc(), F.col("n_id").asc()
    )
    return (
        ivfadc_scored_from(e, n_cells, n_probe)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "n_id", "adc", "rk")
        .orderBy("q_id", "rk")
    )


def ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC: inverted-file candidates + product-quantized
    residual scoring — the full composed index of Jégou, Douze &
    Schmid, "Product quantization for nearest neighbor search"
    (TPAMI 2011, §5 'IVFADC').

    Scale shape: centroids and the residual codebook are broadcast
    (fixed small sets), so assignment, residual computation, and
    code encoding are all map-side passes over the corpus — the
    only corpus shuffles are the min_by partial-agg combine and the
    probe join keyed by cell.  The serving state per vector is
    (cell, 8 nibble codes, norm) = ~6 bytes + id vs 256 bytes of
    float32 — the index that still fits in memory at 100 TB of
    embeddings.  Candidates are identical to ann_ivf_topk's (same
    cells, same probes), so measured recall isolates pure
    quantization loss; certified in ANN_RECALL_r7.json."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return ivfadc_topk_from(e)


def ivfadc_oracle_ctes(train_where: str = "1=1") -> str:
    """DuckDB mirror of the shared IVFADC stage, up to the
    `scored` CTE of ADC-scored (q_id, n_id, adc) pairs — shared by
    the ann_ivfadc_topk and ann_ivfadc_rerank oracles exactly as
    ivfadc_scored_from is shared by the pipelines.  Same
    deterministic centroids and residual codebook (OFFSET past the
    zero-residual centroid rows), same min-by argmin tiebreak (d2
    ASC, k ASC), same quantize-then-sum ADC, same division
    order.

    `train_where` restricts the rows the QUANTIZERS train on
    (centroid pick + codebook pick) while the code index still
    covers every row — the ivfadc_index_trained_on mirror for the
    incremental-delta oracle."""
    from ..functions.vectors import duck_dot, duck_l2

    s = PQ_SUB
    rsub = "r.rv[(g.m * {s} + 1):(g.m * {s} + {s})]".format(s=s)
    bsub = "b.rv[(g.m * {s} + 1):(g.m * {s} + {s})]".format(s=s)
    qsub = (
        f"list_transform(embedding[(g.m * {s} + 1):(g.m * {s} + {s})], "
        "x -> CAST(x AS DOUBLE))"
    )
    sqd = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(s.sv, c.cw), "
        "p -> (p[1] - p[2]) * (p[1] - p[2]))), (acc, v) -> acc + v)"
    )
    ddot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(list_zip(q.qsv, cb.cw), "
        "p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )
    return f"""e AS (
  SELECT vec_id, embedding, {duck_l2('embedding')} AS norm FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, embedding AS cv, norm AS c_norm
  FROM e WHERE {train_where} ORDER BY vec_id LIMIT {N_CELLS}
),
best AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             ({duck_dot('e.embedding', 'c.cv')}
              / nullif(e.norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS r
    FROM e CROSS JOIN cents c
  ) t WHERE r = 1
),
resid AS (
  SELECT a.vec_id, a.norm, a.cell,
         list_transform(list_zip(a.embedding, c.cv),
           p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) AS rv
  FROM (SELECT e.vec_id, e.embedding, e.norm, b.cell
        FROM e JOIN best b USING (vec_id)) a
  JOIN cents c USING (cell)
),
cb AS (
  SELECT b.k, g.m, {bsub} AS cw
  FROM (
    SELECT rv, row_number() OVER (ORDER BY vec_id) - 1 AS k
    FROM (SELECT vec_id, rv FROM resid WHERE {train_where}
          ORDER BY vec_id LIMIT {PQ_K} OFFSET {N_CELLS}) o
  ) b, generate_series(0, {PQ_M - 1}) AS g(m)
),
subs AS (
  SELECT r.vec_id AS n_id, r.norm AS n_norm, r.cell, g.m, {rsub} AS sv
  FROM resid r, generate_series(0, {PQ_M - 1}) AS g(m)
),
codes AS (
  SELECT n_id, n_norm, cell, m, k FROM (
    SELECT s.n_id, s.n_norm, s.cell, s.m, c.k,
           row_number() OVER (PARTITION BY s.n_id, s.m
                ORDER BY {sqd} ASC, c.k ASC) AS rn
    FROM subs s JOIN cb c ON c.m = s.m
  ) t WHERE rn = 1
),
q AS (
  SELECT vec_id AS q_id, embedding AS qv, norm AS q_norm
  FROM e WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT q_id, q_norm, cell, qc FROM (
    SELECT q.q_id, q.q_norm, c.cell,
           CAST(floor(({duck_dot('q.qv', 'c.cv')})
                * {PQ_ADC_SCALE}.0 + 0.5) AS BIGINT) AS qc,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             ({duck_dot('q.qv', 'c.cv')}
              / nullif(q.q_norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS prk
    FROM q CROSS JOIN cents c
  ) t WHERE prk <= {N_PROBE}
),
qsubs AS (
  SELECT vec_id AS q_id, g.m, {qsub} AS qsv
  FROM embeddings, generate_series(0, {PQ_M - 1}) AS g(m)
  WHERE vec_id % {QUERY_MOD} = 0
),
parts AS (
  SELECT p.q_id, c.n_id, p.q_norm, c.n_norm, p.qc,
         CAST(floor({ddot} * {PQ_ADC_SCALE}.0 + 0.5) AS BIGINT) AS pr
  FROM probes p
  JOIN codes c USING (cell)
  JOIN qsubs q ON q.q_id = p.q_id AND q.m = c.m
  JOIN cb ON cb.m = c.m AND cb.k = c.k
  WHERE p.q_id <> c.n_id
),
scored AS (
  SELECT q_id, n_id,
         ((qc + CAST(sum(pr) AS BIGINT)) / {PQ_ADC_SCALE}.0)
           / nullif(q_norm * n_norm, 0.0) AS adc
  FROM parts GROUP BY q_id, n_id, q_norm, n_norm, qc
)"""


def ivfadc_budget_ctes(margin: int = 1, live_where: str = "1=1") -> str:
    """DuckDB mirror of ivfadc_collision_budget over the shared
    `codes` CTE: same packed-bigint code key (sum(k * 2^(4m)) — all
    terms exact in double, sum < 2^32, so the cross-engine cast is
    exact), same (cell, code) histogram, same least/greatest fold.
    `margin` mirrors the Spark-side knob (the registered queries
    pass RERANK_MARGIN) so an oracle of a margin != 1 pipeline
    cannot silently mismatch.  `live_where` restricts the histogram
    to the LIVE (non-tombstoned) codes — the upsert oracle's mirror
    of the Spark-side tombstone anti-join."""
    return f"""percode AS (
  SELECT n_id, cell,
         CAST(sum(k * power(2.0, m * 4)) AS BIGINT) AS code_key
  FROM codes WHERE {live_where} GROUP BY n_id, cell
),
cbudget AS (
  SELECT least({RERANK_C_CAP}, greatest({RERANK_C_FLOOR},
         CAST(max(cnt) * {margin} + {TOPK} AS INTEGER))) AS c_budget
  FROM (SELECT cell, code_key, count(*) AS cnt
        FROM percode GROUP BY cell, code_key) h
)"""


def _ivfadc_oracle_sql() -> str:
    """ann_ivfadc_topk oracle: the shared CTE prefix + the top-5
    cut."""
    return f"""
WITH {ivfadc_oracle_ctes()}
SELECT q_id, n_id, adc, rk FROM (
  SELECT q_id, n_id, adc,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY adc DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_IVFADC_TOPK_ORACLE = _ivfadc_oracle_sql()

register("ann_ivfadc_topk", ann_ivfadc_topk, ANN_IVFADC_TOPK_ORACLE)


# ---------------------------------------------------------------
# Attribute-filtered ANN: IVF with composite (cell, label) lists
# ---------------------------------------------------------------


def ivf_filtered_topk_from(
    e: DataFrame, n_cells: int = N_CELLS, n_probe: int = N_PROBE
) -> DataFrame:
    """Label-constrained IVF top-TOPK over (vec_id, embedding,
    label): each query retrieves only neighbors sharing its label —
    the attribute-filtered search every vector store serves
    (same-language retrieval, per-tenant corpora; cf. the filtered
    track of big-ann-benchmarks / Filtered-DiskANN, SIGMOD 2023).

    This is PRE-filtering, done structurally: the inverted lists
    are keyed by the COMPOSITE (cell, label), so the predicate is
    applied at candidate fetch — the per-query scan cost divides by
    the label cardinality instead of scoring-then-discarding
    (post-filter ANN returns < k results whenever the filter is
    selective; this form cannot).  Candidate recall within the
    label stratum equals unfiltered IVF's at the same probe count
    (same centroids, same probe order: tests pin it).
    """
    e = e.select("vec_id", "embedding", "label", l2("embedding").alias("norm"))
    cents = ivf_centroids(e, n_cells)
    assigned = ivf_assign(e, cents)
    q_labels = e.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("label")
    )
    probes = ivf_probes(e, cents, n_probe).join(q_labels, "q_id")
    cand = assigned.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("nv"),
        F.col("norm").alias("n_norm"),
        "cell",
        "label",
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("n_id").asc()
    )
    return (
        probes.join(cand, ["cell", "label"])
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cos",
            dot("qv", "nv")
            / F.nullif(F.col("q_norm") * F.col("n_norm"), F.lit(0.0)),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= TOPK)
        .select("q_id", "label", "n_id", "cos", "rk")
        .orderBy("q_id", "rk")
    )


def ann_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of :func:`ivf_filtered_topk_from` over the
    embeddings table (labels play the filter attribute)."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", "label"
    )
    return ivf_filtered_topk_from(e)


def _ivf_filtered_oracle_sql() -> str:
    """DuckDB mirror: the IVF oracle with the composite
    (cell, label) candidate join."""
    from ..functions.vectors import duck_dot, duck_l2

    return f"""
WITH e AS (
  SELECT vec_id, embedding, label, {duck_l2('embedding')} AS norm
  FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, embedding AS cv, norm AS c_norm
  FROM e ORDER BY vec_id LIMIT {N_CELLS}
),
best AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             ({duck_dot('e.embedding', 'c.cv')}
              / nullif(e.norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS r
    FROM e CROSS JOIN cents c
  ) t WHERE r = 1
),
assigned AS (
  SELECT e.vec_id, e.embedding, e.norm, e.label, b.cell
  FROM e JOIN best b USING (vec_id)
),
q AS (
  SELECT vec_id AS q_id, embedding AS qv, norm AS q_norm, label
  FROM e WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT q_id, qv, q_norm, label, cell FROM (
    SELECT q.q_id, q.qv, q.q_norm, q.label, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             ({duck_dot('q.qv', 'c.cv')}
              / nullif(q.q_norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS prk
    FROM q CROSS JOIN cents c
  ) t WHERE prk <= {N_PROBE}
),
scored AS (
  SELECT p.q_id, p.label, a.vec_id AS n_id,
         ({duck_dot('p.qv', 'a.embedding')}
          / nullif(p.q_norm * a.norm, 0.0)) AS cos
  FROM probes p
  JOIN assigned a ON p.cell = a.cell AND p.label = a.label
  WHERE p.q_id <> a.vec_id
)
SELECT q_id, label, n_id, cos, rk FROM (
  SELECT q_id, label, n_id, cos,
         CAST(row_number() OVER (PARTITION BY q_id
              ORDER BY cos DESC, n_id ASC) AS INTEGER) AS rk
  FROM scored
) t
WHERE rk <= {TOPK}
ORDER BY q_id, rk
"""


ANN_IVF_FILTERED_ORACLE = _ivf_filtered_oracle_sql()

register("ann_ivf_filtered", ann_ivf_filtered, ANN_IVF_FILTERED_ORACLE)


# --------------------------------------------------------------------------
# Binary (1-bit sign) quantization + Hamming serving — the smallest
# index in the family: 1 bit/dim = 8 bytes/vector at DIM=64, vs
# ~16.3 B for IVFADC and 64 B for SQ8.  The sign sketch is Charikar's
# SimHash (STOC 2002) applied with the COORDINATE hyperplanes (bit i
# = [x_i > 0]), which is exactly the "binary quantization + rescore"
# serving mode modern vector stores ship: Hamming distance over
# packed sign words proposes candidates, an exact-cosine rerank over
# the fetched full-precision vectors restores ranking quality.
# Reference parity: the reference engine has no ANN surface
# (maprdeuce.cpp is a word-count pipeline); this extends the §2.2
# LLM-pipeline battery alongside SQ8/PQ/IVFADC.
#
# Cross-engine determinism: each 32-dim half packs to an exact
# integer-valued double (sum of distinct powers of two < 2^32 —
# the proven packed-code-key discipline), Hamming is pure int
# (bit_count of xor on bigints in BOTH engines), so ranks compare
# exactly and the full value-hash oracle applies.
#
# Collision mechanism (why the adaptive budget transfers): perturbed
# clones rarely flip a coordinate's SIGN, so clone families quantize
# to IDENTICAL sign words — exact ties, the PQ mechanism (not SQ8's
# unbounded sub-step error) — and the collision-histogram budget
# (margin * max_cluster + k) provably covers the cluster, with the
# same measured near-tie margin on top.
# --------------------------------------------------------------------------


def _sign_word(vec: str, lo: int) -> F.Column:
    """One packed 32-bit sign word as an exact bigint: bit j set iff
    vec[lo + j] > 0, for j in 0..31.  Built as a sum of distinct
    powers of two — every partial is integer-valued and < 2^32, so
    the double-precision fold is exact and the DuckDB mirror (the
    identical fold) matches bit-for-bit."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.when(
            F.element_at(F.col(vec), (j + F.lit(lo + 1)).cast("int")) > 0,
            F.pow(F.lit(2.0), j.cast("double")),
        ).otherwise(F.lit(0.0)),
    ).cast("long")


def binary_sign_codes(assigned: DataFrame) -> DataFrame:
    """(vec_id, cell, b_lo, b_hi): the binary index over an
    ivf_assign'd relation — two packed 32-bit sign words per vector
    (8 bytes of serving state) plus the coarse cell.

    The packing is guarded on size(embedding) == DIM: element_at
    past the end returns null, which _sign_word's when() would
    silently treat as bit 0, so a wrong-dimension fixture would
    mis-pack without error (both engines consistently — parity
    green, recall quietly degraded).  Instead the row raises."""
    dim_ok = F.size(F.col("embedding")) == F.lit(DIM)

    def guarded(lo: int) -> F.Column:
        return F.when(dim_ok, _sign_word("embedding", lo)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"binary_sign_codes: embedding dim != {DIM} "
                        "(got "
                    ),
                    F.size(F.col("embedding")).cast("string"),
                    F.lit(")"),
                )
            ).cast("long")
        )

    return assigned.select(
        "vec_id",
        "cell",
        guarded(0).alias("b_lo"),
        guarded(32).alias("b_hi"),
    )


def binary_collision_budget(
    bcodes: DataFrame, cap: int, margin: int = RERANK_MARGIN
) -> DataFrame:
    """1-row (c_budget int) rerank budget from the sign-word
    collision histogram — ivfadc_collision_budget's rule applied to
    the binary index: vectors sharing (cell, b_lo, b_hi) are
    indistinguishable to Hamming, so the exact stage must fetch at
    least margin * max_cluster + TOPK to survive clone pileups.
    Two map-side-combining aggs over the 8-byte/vector index —
    metadata-scale at 100 TB.  `budget_capped` (second column) is
    True iff the demanded budget exceeded `cap` — see
    :func:`ivfadc_collision_budget` for the serving contract."""
    hist = bcodes.groupBy("cell", "b_lo", "b_hi").agg(
        F.count("*").alias("cnt")
    )
    demand = F.greatest(
        F.lit(RERANK_C_FLOOR),
        (F.max("cnt") * F.lit(margin) + F.lit(TOPK)).cast("int"),
    )
    return hist.agg(
        F.least(F.lit(cap), demand).alias("c_budget"),
        (demand > F.lit(cap)).alias("budget_capped"),
    )


def binary_hamming_cands_from(
    e: DataFrame,
    *,
    n_cells: int = N_CELLS,
    n_probe: int = N_PROBE,
    margin: int = RERANK_MARGIN,
    fast_assign: bool = False,
    cents: DataFrame | None = None,
) -> DataFrame:
    """(q_id, n_id) candidates from the binary index: IVF coarse
    routing (shared ivf_centroids/ivf_assign/ivf_probes — same
    cells as every other index in the family), Hamming scoring over
    the packed sign words (bit_count(xor) on two bigints — pure
    integer whole-stage-codegen arithmetic, no float and no UDF),
    cut to the data-derived adaptive budget (broadcast 1-row).

    fast_assign=True swaps the Catalyst assign for the Arrow/BLAS
    twin (:func:`ivf_assign_arrow`) — the scaled-cells serving
    path; registered fixture forms keep the default (the
    oracle-mirrored fold).

    Scale shape: the scan side reads 8 bytes/vector + the cell id;
    the probe join is keyed by cell (n*q*probe/cells pairs, AQE
    splits hot cells); the budget rides a broadcast; candidate
    output is |q| x budget, independent of corpus size.

    Trailing parameters are keyword-only (round-12 ADVICE): the
    round-11 reorder from (e, margin, n_cells, n_probe) would have
    let a stale positional caller silently compute a wrong geometry
    (margin=6 becoming n_cells); now it fails loudly.

    `cents` overrides the coarse quantizer (e.g.
    :func:`train_ivf_centroids`); default stays the deterministic
    oracle-mirrored lowest-vec_id pick."""
    e = e.select("vec_id", "embedding", l2("embedding").alias("norm"))
    if cents is None:
        cents = ivf_centroids(e, n_cells)
    assigned = (ivf_assign_arrow if fast_assign else ivf_assign)(e, cents)
    # cache the BINARY INDEX: its three consumers below (collision
    # budget, query-word lookup, candidate scan) would each replay
    # the coarse assign (the O(n*cells*dim) fold) + sign packing —
    # the 8-byte/vector index is the stored serving artifact, same
    # rationale as ivfadc_index's cached codes
    bcodes = binary_sign_codes(assigned).cache()
    budget = binary_collision_budget(bcodes, RERANK_C_CAP, margin)
    probes = ivf_probes(e, cents, n_probe)
    qc = probes.select("q_id", "cell").join(
        bcodes.select(
            F.col("vec_id").alias("q_id"),
            F.col("b_lo").alias("q_lo"),
            F.col("b_hi").alias("q_hi"),
        ),
        "q_id",
    )
    scored = (
        qc.join(
            bcodes.select(
                F.col("vec_id").alias("n_id"),
                "cell",
                F.col("b_lo").alias("n_lo"),
                F.col("b_hi").alias("n_hi"),
            ),
            "cell",
        )
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "ham",
            F.bit_count(F.col("q_lo").bitwiseXOR(F.col("n_lo")))
            + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("n_hi"))),
        )
    )
    wh = Window.partitionBy("q_id").orderBy(
        F.col("ham").asc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("crk", F.row_number().over(wh))
        .crossJoin(F.broadcast(budget))
        .where(F.col("crk") <= F.col("c_budget"))
        .select("q_id", "n_id")
    )


def binary_oracle_ctes(margin: int = RERANK_MARGIN) -> str:
    """DuckDB mirror of the binary pipeline up to the `cands` CTE:
    identical centroids / assignment / probes as the IVF mirror,
    identical exact-in-double sign-word packing, integer Hamming
    via bit_count(xor), the identical collision-budget fold."""
    from ..functions.vectors import duck_dot, duck_l2

    def word(lo: int) -> str:
        return (
            "CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(range(0, 32), "
            f"j -> CASE WHEN embedding[CAST(j + {lo + 1} AS INTEGER)] > 0 "
            "THEN pow(2.0, CAST(j AS DOUBLE)) ELSE 0.0 END)), "
            "(acc, v) -> acc + v) AS BIGINT)"
        )

    return f"""e AS (
  SELECT vec_id, embedding, {duck_l2('embedding')} AS norm FROM embeddings
),
cents AS (
  SELECT vec_id AS cell, embedding AS cv, norm AS c_norm
  FROM e ORDER BY vec_id LIMIT {N_CELLS}
),
best AS (
  SELECT vec_id, cell FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             ({duck_dot('e.embedding', 'c.cv')}
              / nullif(e.norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS r
    FROM e CROSS JOIN cents c
  ) t WHERE r = 1
),
bcodes AS (
  SELECT e.vec_id, b.cell, {word(0)} AS b_lo, {word(32)} AS b_hi
  FROM e JOIN best b USING (vec_id)
),
bhist AS (
  SELECT cell, b_lo, b_hi, count(*) AS cnt
  FROM bcodes GROUP BY cell, b_lo, b_hi
),
bbudget AS (
  SELECT least({RERANK_C_CAP}, greatest({RERANK_C_FLOOR},
         CAST(max(cnt) * {margin} + {TOPK} AS INTEGER))) AS c_budget
  FROM bhist
),
q AS (
  SELECT vec_id AS q_id, embedding AS qv, norm AS q_norm
  FROM e WHERE vec_id % {QUERY_MOD} = 0
),
probes AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, c.cell,
           row_number() OVER (PARTITION BY q.q_id ORDER BY
             ({duck_dot('q.qv', 'c.cv')}
              / nullif(q.q_norm * c.c_norm, 0.0)) DESC, c.cell ASC) AS prk
    FROM q CROSS JOIN cents c
  ) t WHERE prk <= {N_PROBE}
),
bq AS (
  SELECT p.q_id, p.cell, b.b_lo AS q_lo, b.b_hi AS q_hi
  FROM probes p JOIN bcodes b ON b.vec_id = p.q_id
),
hscored AS (
  SELECT q.q_id, c.vec_id AS n_id,
         bit_count(xor(q.q_lo, c.b_lo))
         + bit_count(xor(q.q_hi, c.b_hi)) AS ham
  FROM bq q JOIN bcodes c ON c.cell = q.cell
  WHERE q.q_id <> c.vec_id
),
cands AS (
  SELECT q_id, n_id FROM (
    SELECT q_id, n_id,
           row_number() OVER (PARTITION BY q_id
                ORDER BY ham ASC, n_id ASC) AS crk
    FROM hscored
  ) t, bbudget WHERE t.crk <= bbudget.c_budget
)"""


# --------------------------------------------------------------------------
# Sign-fingerprint embedding dedup (round 13, VERDICT r12 #1) — the
# dedup-before-indexing leg of the ANN serving contract.  The budget-
# cap recall hole ANN_SKEW_r12.json measured (worst_query_recall 0.0
# for ~5% of hot queries) is caused by quasi-duplicate pileups larger
# than RERANK_C_CAP: vectors so alike they share the ENTIRE 64-bit
# sign pattern collapse onto one Hamming-indistinguishable cluster
# the exact stage is not allowed to rescore in full.  The fix a real
# pipeline ships is to dedup exactly those pileups BEFORE indexing —
# and the index's own fingerprint is the natural dedup key: group by
# the packed sign words (linear, map-side-combining agg over 8
# bytes/vector), elect the lowest-vec_id keeper per group, verify
# each member against its keeper with ONE exact cosine (linear — one
# point-lookup join and one fold per corpus row, never a pairwise
# scan), and suppress verified near-duplicates.  This is SimHash
# dedup (Charikar, STOC 2002) with coordinate hyperplanes, i.e. the
# embedding-space analogue of `dedup_simhash` over documents, with
# the cosine check making it a verified-near-dup suppression rather
# than a blind fingerprint collapse.
#
# Scale shape at 100 TB: two shuffles (fingerprint groupBy, anti-join
# on vec_id), no broadcast bigger than a fingerprint histogram, no
# O(n^2) anywhere.  Composition with serving is certified by
# scripts/ann_dedup_skew_probe.py (ANN_DEDUP_SKEW_r13.json): on the
# 150k-hot-cloud rung the raw index reads budget_capped=True and
# worst_query_recall 0.0, the dedup->retrain->reindex pipeline reads
# budget_capped=False and worst 1.0.
# Reference parity: none (maprdeuce.cpp has no vector surface); this
# extends the §2.2 dedup battery.
# --------------------------------------------------------------------------


def _guarded_sign_word(lo: int) -> F.Column:
    """`_sign_word` over `embedding` with the binary_sign_codes dim
    guard: a wrong-dimension row raises instead of silently packing
    nulls as zero bits."""
    dim_ok = F.size(F.col("embedding")) == F.lit(DIM)
    return F.when(dim_ok, _sign_word("embedding", lo)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"signword_fingerprints: embedding dim != {DIM} (got "),
                F.size(F.col("embedding")).cast("string"),
                F.lit(")"),
            )
        )
    )


def signword_fingerprints(e: DataFrame) -> DataFrame:
    """(vec_id, embedding, norm, f_lo, f_hi): the 64-bit sign
    fingerprint of every vector — the binary index's packed sign
    words computed WITHOUT a coarse quantizer, so dedup can run
    before any index exists."""
    return e.select(
        "vec_id",
        "embedding",
        l2("embedding").alias("norm"),
        _guarded_sign_word(0).alias("f_lo"),
        _guarded_sign_word(32).alias("f_hi"),
    )


def signword_suppressed(
    e: DataFrame, threshold: float = COSINE_DEDUP_THRESHOLD
) -> DataFrame:
    """(keeper_id, dup_id, cos): cosine-verified near-duplicates to
    suppress — every vector that shares its full 64-bit sign
    fingerprint with a lower-vec_id keeper AND scores cos >=
    `threshold` against that keeper.  One fingerprint groupBy + one
    keeper point-lookup + one cosine per corpus row: linear."""
    # cache the fingerprint relation: its three consumers (keeper
    # election, keeper point-lookup side, member side) would each
    # replay the upstream lineage — for the registered query that is
    # the whole 4x fixture expansion plus the sign fold per copy
    f = signword_fingerprints(e).cache()
    keep = f.groupBy("f_lo", "f_hi").agg(
        F.min("vec_id").alias("keeper_id")
    )
    kv = keep.join(
        f.select(
            F.col("vec_id").alias("keeper_id"),
            F.col("embedding").alias("kv"),
            F.col("norm").alias("k_norm"),
        ),
        "keeper_id",
    )
    m = f.select(
        F.col("vec_id").alias("dup_id"),
        F.col("embedding").alias("mv"),
        F.col("norm").alias("m_norm"),
        "f_lo",
        "f_hi",
    )
    return (
        m.join(kv, ["f_lo", "f_hi"])
        .where(F.col("dup_id") != F.col("keeper_id"))
        .withColumn(
            "cos",
            dot("mv", "kv")
            / F.nullif(F.col("m_norm") * F.col("k_norm"), F.lit(0.0)),
        )
        .where(F.col("cos") >= F.lit(threshold))
        .select("keeper_id", "dup_id", "cos")
    )


def signword_dedup_survivors(
    e: DataFrame, threshold: float = COSINE_DEDUP_THRESHOLD
) -> DataFrame:
    """`e` minus the verified near-duplicates — the relation to
    train/index/serve on.  LEFT ANTI on vec_id (the
    dedup_materialize_corpus shape)."""
    sup = signword_suppressed(e, threshold).select(
        F.col("dup_id").alias("vec_id")
    )
    return e.join(sup, "vec_id", "left_anti")


def _expand_signword_fixture(base: DataFrame) -> DataFrame:
    """Deterministic 4x expansion of the embeddings fixture so the
    registered dedup query has real work at every SF (the raw
    fixture has zero sign collisions): per base vector, copy 0 is
    the original (cast to double), copies 1-2 are positive scalings
    (1.01x / 0.97x — sign-pattern-preserving by construction, cos
    == 1 up to the shared IEEE fold, so they MUST be suppressed),
    copy 3 adds integer-derived additive noise (0.11 * ((vec_id*31
    + j*17) % 7 - 3)) that usually flips some near-zero coordinate's
    sign and therefore usually survives.  Every arithmetic step is
    the same double op in Spark and DuckDB — no RNG, no libm."""

    def scaled(s: float) -> F.Column:
        return F.transform(
            "embedding", lambda x: x.cast("double") * F.lit(s)
        )

    noisy = F.transform(
        "embedding",
        lambda x, i: x.cast("double")
        + F.lit(0.11)
        * (
            (F.col("vec_id") * 31 + i.cast("long") * 17) % 7 - 3
        ).cast("double"),
    )
    c = F.col("c")
    return (
        base.select(
            "vec_id",
            "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("c"),
        )
        .select(
            (F.col("vec_id") * 4 + c).alias("new_id"),
            F.when(c == 0, F.transform("embedding", lambda x: x.cast("double")))
            .when(c == 1, scaled(1.01))
            .when(c == 2, scaled(0.97))
            .otherwise(noisy)
            .alias("embedding"),
        )
        .select(F.col("new_id").alias("vec_id"), "embedding")
    )


def dedup_embedding_signword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of the sign-fingerprint dedup: expand the
    embeddings fixture 4x deterministically (two scale-clones that
    must collapse, one noise-clone that usually survives), emit the
    verified suppression pairs (keeper_id, dup_id, cos)."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    return signword_suppressed(_expand_signword_fixture(base)).orderBy(
        "keeper_id", "dup_id"
    )


def _duck_sign_word(lo: int, vec: str = "embedding") -> str:
    """DuckDB mirror of `_sign_word`: the identical
    sum-of-distinct-powers-of-two fold."""
    return (
        "CAST(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        "list_transform(range(0, 32), "
        f"j -> CASE WHEN {vec}[CAST(j + {lo + 1} AS INTEGER)] > 0 "
        "THEN pow(2.0, CAST(j AS DOUBLE)) ELSE 0.0 END)), "
        "(acc, v) -> acc + v) AS BIGINT)"
    )


def _dedup_signword_oracle_sql() -> str:
    from ..functions.vectors import duck_dot, duck_l2

    return f"""
WITH exp AS (
  SELECT e.vec_id * 4 + c.c AS vec_id,
         CASE
           WHEN c.c = 0 THEN list_transform(e.embedding,
                x -> CAST(x AS DOUBLE))
           WHEN c.c = 1 THEN list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * 1.01)
           WHEN c.c = 2 THEN list_transform(e.embedding,
                x -> CAST(x AS DOUBLE) * 0.97)
           ELSE list_transform(range(1, 65),
                j -> CAST(e.embedding[CAST(j AS INTEGER)] AS DOUBLE)
                     + 0.11 * CAST((e.vec_id * 31 + (j - 1) * 17) % 7
                                   - 3 AS DOUBLE))
         END AS embedding
  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 4)) AS c) c
),
f AS (
  SELECT vec_id, embedding, {duck_l2('embedding')} AS norm,
         {_duck_sign_word(0)} AS f_lo, {_duck_sign_word(32)} AS f_hi
  FROM exp
),
keep AS (
  SELECT f_lo, f_hi, min(vec_id) AS keeper_id FROM f GROUP BY f_lo, f_hi
),
kv AS (
  SELECT k.keeper_id, k.f_lo, k.f_hi, f.embedding AS kvec,
         f.norm AS k_norm
  FROM keep k JOIN f ON f.vec_id = k.keeper_id
)
SELECT keeper_id, dup_id, cos FROM (
  SELECT kv.keeper_id, m.vec_id AS dup_id,
         {duck_dot('m.embedding', 'kv.kvec')}
           / nullif(m.norm * kv.k_norm, 0.0) AS cos
  FROM kv JOIN f m ON m.f_lo = kv.f_lo AND m.f_hi = kv.f_hi
  WHERE m.vec_id <> kv.keeper_id
) t WHERE cos >= {COSINE_DEDUP_THRESHOLD}
ORDER BY keeper_id, dup_id
"""


register(
    "dedup_embedding_signword",
    dedup_embedding_signword,
    _dedup_signword_oracle_sql(),
)
