"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design:
- exact dedup is a hash groupBy on the content key (or a hash of
  it — at 100 TB you'd group on xxhash64(text) + verify, keeping
  shuffle rows narrow);
- Jaccard via shingle join only ever joins docs that SHARE a
  shingle (inverted-index join), never the full cross product;
- MinHash+LSH bounds candidate generation by (band, band_hash)
  equality — constant-size signatures, one equi-join;
- embedding near-dup is the brute-force baseline here; the LSH
  bucketed variant in similarity.py is the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import lsh_bands, minhash_signature, word_shingles
from ..functions.vectors import cosine, duck_cosine
from ..io import load_table
from ..registry import register

JACCARD_THRESHOLD = 0.05  # synthetic word-soup docs share few shingles
COSINE_THRESHOLD = 0.92


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one keeper (min doc_id) per distinct text.
    Equivalent to dropDuplicates(['text']) but with an explicit,
    deterministic keeper choice (dropDuplicates keeps an arbitrary
    row; min-id is reproducible)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("text")
        .agg(
            F.min("doc_id").alias("keeper_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keeper_doc_id", "n_copies")
        .orderBy("keeper_doc_id")
    )


DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS keeper_doc_id, count(*) AS n_copies
FROM documents
GROUP BY text
ORDER BY keeper_doc_id
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word-3-gram Jaccard similarity >= 0.05.

    Inverted-index join: explode distinct shingles, self-join on
    shingle (only co-occurring docs meet), count intersection, then
    |A u B| = |A| + |B| - |A n B|.  Jaccard is a ratio of exact
    integers — no float-order hazard."""
    d = load_table(spark, sf_dir, "documents")
    # shuffle 8-byte shingle hashes, not shingle strings: same join
    # semantics (xxhash64 collisions are ~n^2/2^64, negligible),
    # a fraction of the shuffle bytes — the difference between
    # shipping the corpus and shipping fixed-width keys at 100 TB.
    sh = (
        word_shingles(d, "doc_id", "text", n=3)
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .cache()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "n_common", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


DEDUP_NGRAM_JACCARD_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 2),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
    FROM toks
  ) u
  WHERE shingle <> ''
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common,
       CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
      >= {JACCARD_THRESHOLD}
ORDER BY doc_a, doc_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32 hashes) + LSH(8 bands x 4 rows) candidate pairs,
    verified with exact shingle Jaccard.  No SQL oracle (xxhash64 is
    Spark-specific) — driver records rows-only; the Jaccard verify
    step is itself oracle-tested via dedup_ngram_jaccard.

    Output: candidate pairs with exact jaccard >= 0.05 that LSH
    surfaced.  At scale this replaces the full inverted-index join
    with an equi-join on 8 fixed-width band keys per doc.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = (
        word_shingles(d, "doc_id", "text", n=3)
        .select("doc_id", F.xxhash64("shingle").alias("sh"))
        .cache()
    )
    sig = minhash_signature(sh, "doc_id", num_hashes=32, shingle_col="sh")
    bands = lsh_bands(sig, "doc_id", num_hashes=32, bands=8)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), ["band", "band_hash"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "sh")
    b = sh.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """63-bit SimHash signature per document (rows-only check —
    xxhash64-based).  Exact-signature collisions would be trivially
    groupable; at scale Hamming-near search uses 4x16-bit band
    blocking on the signature."""
    from ..functions.hashing import simhash63
    from ..functions.text import words

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+", -1)).alias("word")
    ).where(F.col("word") != "")
    return simhash63(toks, "doc_id", "word").orderBy("doc_id")


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup: pairs with cosine >= 0.92 (brute-force
    O(n^2) baseline — correct reference implementation; the LSH
    variant in similarity.py is the 100 TB path)."""
    from ..functions.vectors import dot, l2

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2("embedding").alias("norm")
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        F.col("embedding").alias("va"),
        F.col("norm").alias("norm_a"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        F.col("embedding").alias("vb"),
        F.col("norm").alias("norm_b"),
    )
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            dot("va", "vb")
            / F.nullif(F.col("norm_a") * F.col("norm_b"), F.lit(0.0)),
        )
        .where(F.col("cos") >= COSINE_THRESHOLD)
        .select("id_a", "id_b", "cos")
        .orderBy("id_a", "id_b")
    )


DEDUP_EMBEDDING_COSINE_ORACLE = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {duck_cosine('a.embedding', 'b.embedding')} AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id
  AND {duck_cosine('a.embedding', 'b.embedding')} >= {COSINE_THRESHOLD}
ORDER BY id_a, id_b
"""


register("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE)
register("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_ORACLE)
register("dedup_minhash_lsh", dedup_minhash_lsh)  # rows-only (xxhash64)
register("dedup_simhash", dedup_simhash)  # rows-only (xxhash64)
register("dedup_embedding_cosine", dedup_embedding_cosine, DEDUP_EMBEDDING_COSINE_ORACLE)


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup CLUSTERS: connected components over the near-dup pair
    graph (ngram-jaccard pairs), each doc labeled with its
    component's minimum doc_id — the step that turns pairwise
    candidates into keep/drop groups in a dedup pipeline.

    Iterative min-label propagation: every vertex starts as its own
    label; each round joins labels across edges and takes the min;
    stops when no label changes (diameter-bounded, large-star style
    — the driver loop only orchestrates, every round is a
    distributed join+agg).  The DuckDB oracle computes the same
    components with a recursive CTE, so even this iterative,
    'non-SQL' operator is differentially tested.
    """
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    # undirected edge list, both directions; localCheckpoint cuts
    # the lineage so the LSH pipeline plans once, not per iteration
    edges = (
        pairs.union(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .localCheckpoint(eager=True)
    )
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    labels = d.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(20):  # bounded: pair-graph diameter is tiny
        neighbor_min = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("label").alias("nlabel"))
        )
        # localCheckpoint each round: iterative self-joins otherwise
        # DOUBLE the logical plan per iteration (exponential analysis
        # / codegen cost -> driver OOM long before data is the issue)
        new_labels = (
            labels.join(
                neighbor_min, labels.doc_id == neighbor_min.doc_a, "left"
            )
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce("nlabel", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return (
        labels.groupBy("label")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sort_array(F.collect_list("doc_id")).alias("members"),
        )
        .where(F.col("cluster_size") > 1)  # only real dup groups
        .select(
            F.col("label").alias("cluster_id"), "cluster_size", "members"
        )
        .orderBy("cluster_id")
    )


DEDUP_CLUSTERS_ORACLE = f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(w) - 2),
                  i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
    FROM toks
  ) u
  WHERE shingle <> ''
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a JOIN shingles b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(v, l) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.doc_b, r.l FROM reach r JOIN edges e ON e.doc_a = r.v
),
comp AS (SELECT v AS doc_id, min(l) AS label FROM reach GROUP BY v)
SELECT label AS cluster_id,
       count(*) AS cluster_size,
       list_sort(list(doc_id)) AS members
FROM comp
GROUP BY label
HAVING count(*) > 1
ORDER BY cluster_id
"""


register("dedup_clusters", dedup_clusters, DEDUP_CLUSTERS_ORACLE)
