"""Graph analytics over a derived trade graph — iterative PageRank
and triangle counting, both oracle-checkable.

The graph: nodes are nations; a directed edge src -> dst carries the
total lineitem revenue supplied by nation `src` to customers in
nation `dst` (the q7 join shape, kept for ALL nation pairs).

Cross-engine exactness: PageRank is computed in FIXED-POINT integer
arithmetic (rank in units of 1e-9, edge weights in parts-per-million
of the source's out-flow, all updates integer multiply/divide).
Integer sums are order-independent, so Spark's partial aggregation
and DuckDB's single-threaded fold produce bit-identical ranks —
no float-summation drift, which is what makes an 8-iteration
power-method loop value-hash checkable.  (PageRank: Brin & Page,
WWW 1998; the fixed-point trick is the same quantize-before-sum
discipline as functions/stable.py.)

Scale notes (100 TB):
- the edge list aggregates once (groupBy src,dst with map-side
  combine) and is localCheckpoint-ed: each power iteration re-reads
  the materialized edges, never the fact table;
- one iteration = join(ranks, edges on src) + groupBy(dst): both
  shuffle on node keys whose cardinality is the VERTEX count, not
  the fact-row count.  On a real graph the rank table co-partitions
  with edges by src across iterations, so AQE keeps the join local;
- `localCheckpoint` per iteration truncates lineage — plan size and
  driver memory stay constant in the iteration count (same fix that
  keeps dedup_clusters from plan-doubling OOM, dedup.py:280-294);
- triangle counting orders each edge (a < b) so every triangle is
  counted once; the two equi-joins shuffle the (tiny) edge list,
  never the facts, and the heaviest skew tool (degree-ordered
  iteration, Suri & Vassilvitskii WWW 2011) is documented for the
  case where the edge list itself is 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.stable import duck_qint, qint
from ..io import load_table
from ..registry import register

PR_SCALE = 1_000_000_000  # rank fixed-point unit = 1e-9
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85
PR_BASE = (100 - PR_DAMP_NUM) * PR_SCALE // 100  # (1-d) * SCALE
PR_ITERS = 8
W_PPM = 1_000_000  # edge weight unit = ppm of source out-flow


def _trade_cents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation->nation revenue in exact integer cents."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    rev = qint(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        # customer/supplier are sf-proportional: hint-free (see
        # test_broadcast_fallback_equivalence) — auto-broadcast at
        # small SF, shuffle join at scale
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .select(
            s.s_nationkey.alias("src"),
            c.c_nationkey.alias("dst"),
            rev.alias("cents"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("cents").alias("cents"))
    )


_TRADE_CENTS_SQL = f"""
  SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
         CAST(sum({duck_qint("l.l_extendedprice * (1 - l.l_discount)", 2)}) AS BIGINT) AS cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
"""


def pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph, 8 fixed-point
    power iterations, damping 0.85.

    Edge weight = ppm share of the source nation's total out-flow
    (floor division — deterministic).  Update rule, all-integer:

        inflow_j = sum_i (rank_i * w_ppm_ij) DIV 1e6
        rank_j'  = (1-d)*SCALE + (85 * inflow_j) DIV 100

    Dangling mass (nations with no out-edges) is dropped — the
    documented simplification; both engines drop it identically.
    Returns (n_name, rank) sorted by rank descending.
    """
    cents = _trade_cents(spark, sf_dir)
    out_total = cents.groupBy("src").agg(F.sum("cents").alias("total"))
    edges = (
        cents.join(F.broadcast(out_total), "src")
        .select(
            "src",
            "dst",
            F.expr(f"(cents * {W_PPM}) DIV total").alias("w_ppm"),
        )
        .localCheckpoint()
    )
    nation = load_table(spark, sf_dir, "nation")
    verts = nation.select(F.col("n_nationkey").alias("node"))
    ranks = verts.select(
        "node", F.lit(PR_SCALE).cast("bigint").alias("rank")
    )
    for _ in range(PR_ITERS):
        inflow = (
            ranks.join(edges, ranks.node == edges.src)
            .select(
                F.col("dst").alias("node"),
                F.expr(f"(rank * w_ppm) DIV {W_PPM}").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("inflow"))
        )
        ranks = (
            verts.join(inflow, "node", "left")
            .select(
                "node",
                (
                    F.lit(PR_BASE)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(inflow, 0)) DIV {PR_DAMP_DEN}"
                    )
                ).cast("bigint").alias("rank"),
            )
            # LAZY: the iteration count is fixed (no mid-loop driver
            # decision), so the final action materializes the whole
            # 8-round cascade as ONE job instead of 8 blocking
            # checkpoint jobs — the bpe_learn_merges discipline
            .localCheckpoint(eager=False)
        )
    return (
        ranks.join(F.broadcast(nation), ranks.node == nation.n_nationkey)
        .select(F.col("n_name"), F.col("rank"))
        .orderBy(F.col("rank").desc(), "n_name")
    )


def _pagerank_oracle() -> str:
    ctes = [
        f"cents AS ({_TRADE_CENTS_SQL})",
        "out_total AS (SELECT src, CAST(sum(cents) AS BIGINT) AS total"
        " FROM cents GROUP BY src)",
        f"edges AS (SELECT c.src, c.dst, (c.cents * {W_PPM}) // t.total AS w_ppm"
        " FROM cents c JOIN out_total t ON c.src = t.src)",
        "verts AS (SELECT n_nationkey AS node FROM nation)",
        f"r0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) AS rank FROM verts)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"r{i} AS (SELECT v.node, CAST({PR_BASE} + "
            f"({PR_DAMP_NUM} * COALESCE(s.inflow, 0)) // {PR_DAMP_DEN} AS BIGINT) AS rank "
            "FROM verts v LEFT JOIN ("
            "SELECT e.dst AS node, "
            f"CAST(sum((r.rank * e.w_ppm) // {W_PPM}) AS BIGINT) AS inflow "
            f"FROM r{i - 1} r JOIN edges e ON r.node = e.src GROUP BY e.dst"
            ") s ON v.node = s.node)"
        )
    final = (
        f"SELECT n.n_name, r.rank FROM r{PR_ITERS} r "
        "JOIN nation n ON r.node = n.n_nationkey "
        "ORDER BY r.rank DESC, n.n_name"
    )
    return "WITH " + ",\n".join(ctes) + "\n" + final


def triangle_count_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the undirected trade graph.

    Undirected edge (a,b), a<b, exists when the bidirectional trade
    between the two nations strictly exceeds the mean pair volume
    (data-adaptive integer threshold).  Each triangle a<b<c is
    counted exactly once via two equi-joins on the ordered edge
    list.  Returns one row (n_edges, n_triangles).
    """
    # cache the (<= nations^2 rows) pair aggregate: e1/e2/e3 and the
    # threshold scalar all read it — without the cache each reference
    # re-runs the full lineitem join
    cents = _trade_cents(spark, sf_dir)
    und = (
        cents.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            "cents",
        )
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum("cents").alias("cents"))
        .cache()
    )
    floor_ = und.agg(
        F.sum("cents").alias("sum_c"), F.count("*").alias("n_pairs")
    )
    edges = (
        und.crossJoin(F.broadcast(floor_))
        .where(F.col("cents") * F.col("n_pairs") > F.col("sum_c"))
        .select("a", "b")
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    return edges.agg(F.count("*").alias("n_edges")).crossJoin(
        tri.agg(F.count("*").alias("n_triangles"))
    )


TRIANGLE_COUNT_TRADE_ORACLE = f"""
WITH cents AS ({_TRADE_CENTS_SQL}),
und AS (
  SELECT least(src, dst) AS a, greatest(src, dst) AS b,
         CAST(sum(cents) AS BIGINT) AS cents
  FROM cents WHERE src <> dst GROUP BY 1, 2
),
floor_ AS (
  SELECT CAST(sum(cents) AS BIGINT) AS sum_c, count(*) AS n_pairs FROM und
),
edges AS (
  SELECT a, b FROM und, floor_ WHERE cents * n_pairs > sum_c
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.b = e2.a
  JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT (SELECT count(*) FROM edges) AS n_edges, n_triangles FROM tri
"""


register("pagerank_trade", pagerank_trade, _pagerank_oracle())
register(
    "triangle_count_trade", triangle_count_trade, TRIANGLE_COUNT_TRADE_ORACLE
)


BFS_SOURCE = 0  # start nation (n_nationkey = 0)
BFS_MAX_HOPS = 30


def bfs_hops_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS over the directed trade graph: minimum hop
    count from nation BFS_SOURCE to every reachable nation — the
    frontier-expansion primitive under shortest paths, reachability,
    and influence radii.

    Distributed shape: distances live in a (vertex-cardinality)
    table; each round joins the settled frontier to the edge list
    (both keyed by node), takes the per-destination MIN, and merges
    with `least` — hop counts only ever decrease, so the loop
    terminates in diameter rounds; `localCheckpoint` per round
    keeps the plan O(1) in iterations like the other iterative
    operators.  Unreachable nations are excluded (no sentinel
    distances).  The oracle is a bounded recursive CTE taking
    min(h) per node — exact integer hops, so value-hash checkable.
    """
    edges = (
        _trade_cents(spark, sf_dir)
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    nation = load_table(spark, sf_dir, "nation")
    dist = nation.select(
        F.col("n_nationkey").alias("node"),
        F.when(F.col("n_nationkey") == BFS_SOURCE, 0)
        .otherwise(F.lit(None))
        .cast("int")
        .alias("hops"),
    )
    n_settled = 1
    for _ in range(BFS_MAX_HOPS):
        cand = (
            dist.where(F.col("hops").isNotNull())
            .join(edges, dist.node == edges.src)
            .groupBy(F.col("dst").alias("node"))
            .agg((F.min("hops") + 1).alias("cand"))
        )
        dist = (
            dist.join(cand, "node", "left")
            .select(
                "node",
                F.least(
                    F.coalesce("hops", F.col("cand")),
                    F.coalesce("cand", F.col("hops")),
                ).alias("hops"),
            )
            # LAZY: the settled-count below is the round's single
            # materializing action (1 job/round instead of 2)
            .localCheckpoint(eager=False)
        )
        settled = dist.where(F.col("hops").isNotNull()).count()
        if settled == n_settled:
            break  # frontier exhausted: no new node settled
        n_settled = settled
    return (
        dist.where(F.col("hops").isNotNull())
        .join(F.broadcast(nation), dist.node == nation.n_nationkey)
        .select("n_name", "hops")
        .orderBy("hops", "n_name")
    )


BFS_HOPS_TRADE_ORACLE = f"""
WITH RECURSIVE cents AS ({_TRADE_CENTS_SQL}),
edges AS (SELECT DISTINCT src, dst FROM cents),
walk AS (
  SELECT CAST({BFS_SOURCE} AS BIGINT) AS node, 0 AS h
  UNION
  SELECT e.dst AS node, w.h + 1 AS h
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.h < {BFS_MAX_HOPS}
)
SELECT n.n_name, CAST(min(w.h) AS INTEGER) AS hops
FROM walk w JOIN nation n ON n.n_nationkey = w.node
GROUP BY n.n_name
ORDER BY hops, n_name
"""

register("bfs_hops_trade", bfs_hops_trade, BFS_HOPS_TRADE_ORACLE)
