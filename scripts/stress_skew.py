#!/usr/bin/env python
"""Skew stress: demonstrate that the engine's skew mitigations
(salting in operators/skew.py, AQE skew-join splitting) hold the
reduce-side balance flat when one key dominates — the one 100 TB
hazard volume stress alone can't show.

Fixture: events expanded 10x (plan-level, like stress_scale.py),
then ~30% of all rows re-keyed to ONE hot user_id — the power-law
worst case for a per-user aggregate or an events><dim join.

Evidence per scenario, printed as JSON lines and archived to
SKEWSTRESS.json by the caller:
- max/median rows per reduce partition under the operator's actual
  shuffle key (p99 task time is proportional to max partition rows
  for an associative aggregate — this is the deterministic,
  scheduler-noise-free form of per-task evidence);
- wall time of the mitigated vs naive plan.

The JOIN scenario forces sort-merge (broadcast disabled) because at
100 TB the dim side doesn't broadcast; AQE's skewedJoin splitting
is left ON for the naive plan — exactly the runtime behavior a
cluster would see — and salting is shown as the explicit fallback
that doesn't depend on AQE thresholds.

Usage: python scripts/stress_skew.py [copies]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.skew import NUM_SALTS
from db_mapreduce_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
HOT_USER = 42
HOT_FRACTION_PERMILLE = 300  # ~30% of rows re-keyed to HOT_USER
N_SHUFFLE = 32

results: list[dict] = []


def emit(rec: dict) -> None:
    results.append(rec)
    print(json.dumps(rec), flush=True)


def partition_balance(df, n: int, *keys) -> dict:
    """Rows per partition when hash-distributing df on `keys` into n
    partitions — the exact reduce-side layout the shuffle would
    produce.  Computed declaratively via pmod(hash(keys), n), no
    repartition job needed."""
    rows = (
        df.groupBy(F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n)).alias("p"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    counts = sorted((r["rows"] for r in rows), reverse=True)
    total = sum(counts)
    return {
        "partitions_nonempty": len(counts),
        "max_rows": counts[0],
        "median_rows": counts[len(counts) // 2],
        "max_share_pct": round(100.0 * counts[0] / total, 1),
    }


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("stress-skew")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, SF_DIR, "events")
    expanded = None
    for i in range(copies):
        c = base.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        )
        expanded = c if expanded is None else expanded.unionByName(c)
    # deterministic 30% hot-key injection
    skewed = expanded.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(1000))
            < F.lit(HOT_FRACTION_PERMILLE),
            F.lit(HOT_USER).cast("bigint"),
        ).otherwise(F.col("user_id")),
    ).localCheckpoint(eager=True)
    n_rows = skewed.count()
    emit({"scenario": "fixture", "rows": n_rows, "copies": copies,
          "hot_user_share_pct": round(
              100.0 * skewed.where(F.col("user_id") == HOT_USER).count()
              / n_rows, 1)})

    # ---- scenario 1: per-user aggregate ----------------------------
    # naive: shuffle on user_id — the hot user's partition holds ~30%
    # of ALL rows (p99 task = 10x median); salted: shuffle on
    # (user_id, salt) — the hot key spreads over NUM_SALTS reducers.
    emit({"scenario": "agg_naive_balance",
          **partition_balance(skewed, N_SHUFFLE, "user_id")})
    salted = skewed.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(NUM_SALTS))
    )
    emit({"scenario": "agg_salted_balance",
          **partition_balance(salted, N_SHUFFLE, "user_id", "salt")})

    naive_agg = (
        skewed.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))).alias("q"))
    )
    salted_agg = (
        salted.groupBy("user_id", "salt")
        .agg(F.count(F.lit(1)).alias("pn"),
             F.sum(F.floor(F.col("value") * 10000 + F.lit(0.5))).alias("pq"))
        .groupBy("user_id")
        .agg(F.sum("pn").alias("n"), F.sum("pq").alias("q"))
    )
    emit({"scenario": "agg_naive", "sec": timed(naive_agg)})
    emit({"scenario": "agg_salted", "sec": timed(salted_agg)})
    # equality: salting must be invisible in the result
    assert naive_agg.exceptAll(salted_agg).limit(1).count() == 0, \
        "salted aggregate diverged from naive"

    # ---- scenario 2: events >< customer join on the hot key --------
    # forced SMJ (no broadcast): the 100 TB shape.  AQE skew split
    # stays ON for the naive plan; salting replicates the dim side
    # NUM_SALTS ways and joins on (key, salt).
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        naive_join = (
            skewed.join(c, skewed.user_id == c.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        c_rep = c.withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(NUM_SALTS - 1)))
        )
        salted_join = (
            salted.join(
                c_rep,
                (salted.user_id == c_rep.c_custkey)
                & (salted.salt == c_rep.salt),
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        emit({"scenario": "join_naive_balance",
              **partition_balance(skewed, N_SHUFFLE, "user_id")})
        emit({"scenario": "join_salted_balance",
              **partition_balance(salted, N_SHUFFLE, "user_id", "salt")})
        emit({"scenario": "join_naive_aqe_skewsplit", "sec": timed(naive_join)})
        emit({"scenario": "join_salted", "sec": timed(salted_join)})
        assert naive_join.exceptAll(salted_join).limit(1).count() == 0, \
            "salted join diverged from naive"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)

    # ---- scenario 3: planted hot band in the MinHash band index ----
    # A boilerplate-heavy corpus makes a few (band, band_hash) keys
    # hot: when a long shared phrase dominates a document's minimum
    # hashes, every doc carrying it lands in the SAME band buckets,
    # and the band self-join does k^2 work on one key.  The engine's
    # defense is the SHINGLE_DF_CAP prefilter: shingles shared by
    # more than DF_CAP docs are dropped BEFORE signatures exist, so
    # a phrase shared by 10% of the corpus (DF 500 here) can never
    # form a band group — while a phrase at the cap boundary
    # (DF = 100 <= cap) survives and bounds the worst band group (and
    # its join output) at cap and cap^2/2.  Both plants are measured
    # with the cap ON and OFF; the uncapped run is the counterfactual
    # showing the hazard is real, not hypothetical.
    from db_mapreduce_project_spark.functions.hashing import (
        lsh_bands_portable,
        minhash_signature_from_pairs,
        token_shingle_hash_pairs,
    )
    from db_mapreduce_project_spark.operators.dedup import (
        _MH_BANDS,
        _MH_HASHES,
        _capped_shingle_hashes,
        SHINGLE_DF_CAP,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()
    boiler = " ".join(f"boilerw{j}" for j in range(500))
    edge = " ".join(f"edgew{j}" for j in range(500))
    # doc_ids are dense 0..n-1: % 10 == 0 plants the hot phrase on
    # 10% of docs (DF >> cap); % 50 == 1 plants the boundary phrase
    # on exactly n/50 docs (DF <= cap); the two sets are disjoint
    planted = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(boiler)),
        )
        .when(
            F.col("doc_id") % 50 == 1,
            F.concat_ws(" ", F.col("text"), F.lit(edge)),
        )
        .otherwise(F.col("text")),
    ).localCheckpoint(eager=True)
    emit({"scenario": "hot_band_fixture", "docs": n_docs,
          "hot_df": n_docs // 10, "edge_df": n_docs // 50,
          "df_cap": SHINGLE_DF_CAP})

    def band_join_stats(sh, label):
        sig = minhash_signature_from_pairs(sh, "doc_id", num_hashes=_MH_HASHES)
        bands = lsh_bands_portable(
            sig, "doc_id", num_hashes=_MH_HASHES, bands=_MH_BANDS
        ).localCheckpoint(eager=True)
        top = (
            bands.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(F.max("k").alias("k"))
            .first()
        )
        k = top["k"]
        emit({"scenario": f"hot_band_{label}_maxgroup",
              "max_band_group": k,
              "pairs_from_max_group": k * (k - 1) // 2,
              **partition_balance(bands, N_SHUFFLE, "band", "band_hash")})
        cand = (
            bands.alias("x")
            .join(bands.alias("y"), ["band", "band_hash"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
            .distinct()
        )
        t0 = time.perf_counter()
        n_cand = cand.count()
        emit({"scenario": f"hot_band_{label}_candidates",
              "n_candidates": n_cand,
              "sec": round(time.perf_counter() - t0, 2)})
        spark.catalog.clearCache()

    band_join_stats(_capped_shingle_hashes(planted), "capped")
    band_join_stats(
        token_shingle_hash_pairs(planted, "doc_id", "text", n=3), "uncapped"
    )
    spark.catalog.clearCache()

    # ---- scenario 4: ensemble postings at the 500k-doc rung --------
    # (round-7 verdict #6)  The ensemble containment path's shuffle
    # key is (q_stratum, h1, h2) on per-stratum PREFIX postings — a
    # different hot-key geometry from the banded path (a boilerplate
    # shingle is replicated once per eligible stratum, but only while
    # it sits inside a doc's prefix).  Replant the 10%-of-corpus
    # boilerplate at the ladder's 500k-document scale (sf0.1 x 100
    # copies — the same construction as STRESS_LADDER's top rung,
    # where base-shingle DF lands at the cap boundary) plus a
    # DF=copies plant that survives the cap, and record the worst
    # posting bucket capped vs uncapped.  The uncapped candidate
    # join is NOT executed — its worst bucket alone implies ~1e9
    # same-key join rows; the number IS the counterfactual.
    from db_mapreduce_project_spark.operators.dedup import (
        containment_pairs_ensemble_from,
        ensemble_candidate_parts,
    )

    r_copies = 100
    base01 = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    exp = None
    for i in range(r_copies):
        ci = base01.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 100_000_000)
        )
        exp = ci if exp is None else exp.unionByName(ci)
    rung = exp.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat_ws(" ", F.col("text"), F.lit(boiler)),
        )
        .when(
            F.pmod(F.col("doc_id"), F.lit(100_000_000)) == 1,
            F.concat_ws(" ", F.col("text"), F.lit(edge)),
        )
        .otherwise(F.col("text")),
    ).localCheckpoint(eager=True)
    n_rung = rung.count()
    emit({"scenario": "ensemble_500k_fixture", "docs": n_rung,
          "hot_df": n_rung // 10, "edge_df": r_copies,
          "df_cap": SHINGLE_DF_CAP})

    def ensemble_posting_stats(sh, label):
        probes, postings, ranked = ensemble_candidate_parts(sh)
        top = (
            postings.groupBy("q_stratum", "h1", "h2")
            .agg(F.count(F.lit(1)).alias("k"))
            .agg(F.max("k").alias("k"))
            .first()
        )
        k = top["k"]
        emit({"scenario": f"ensemble_500k_{label}_maxbucket",
              "max_posting_bucket": k,
              **partition_balance(
                  postings, N_SHUFFLE, "q_stratum", "h1", "h2"
              )})
        ranked.unpersist()
        spark.catalog.clearCache()

    ensemble_posting_stats(_capped_shingle_hashes(rung), "capped")
    ensemble_posting_stats(
        token_shingle_hash_pairs(rung, "doc_id", "text", n=3), "uncapped"
    )
    # end-to-end capped run at the rung: the defended path completes
    t0 = time.perf_counter()
    n_pairs = containment_pairs_ensemble_from(rung).count()
    emit({"scenario": "ensemble_500k_capped_run",
          "out_pairs": n_pairs,
          "sec": round(time.perf_counter() - t0, 2)})
    spark.catalog.clearCache()

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEWSTRESS.json",
    )
    with open(out, "w", encoding="utf-8") as f:
        json.dump({"copies": copies, "results": results}, f, indent=1)
        f.write("\n")
    print(f"archived -> {out}", flush=True)


if __name__ == "__main__":
    main()
