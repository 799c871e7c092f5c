#!/usr/bin/env python
"""CC round-count ladder (round-14, VERDICT r13 #6): compare the
three connected-components cores — plain min-label propagation,
min-label + adaptive pointer jumping, and large-star/small-star
contraction — over the SAME near-dup pair graph at a dedup-ladder
rung, logging rounds and wall.

Corpus: the marginal-mix expansion (dedup_ladder_scale
expand_families(marginal=True)), the geometry whose low-Jaccard
cross-family word-soup pairs give the graph CHAIN-shaped components
— the regime where round count is the cost driver (the bounded
certification families are 10-cliques, where every algorithm
converges in 2-3 rounds).  The pair graph is computed ONCE and
checkpointed; each variant consumes the identical edge relation, so
wall differences isolate the label loops.  All three variants'
label sets are asserted EQUAL.

Usage: python scripts/cc_rounds_ladder.py [copies]   (default 20)
Writes CC_LADDER_r14.json.
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
from db_mapreduce_project_spark.operators.dedup import (
    CC_ROUNDS_TAKEN,
    _labels_from_star_edges,
    _star_edges_converged,
    cc_min_label_loop,
    jaccard_pairs_from,
)
from db_mapreduce_project_spark.session import get_spark

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from dedup_ladder_scale import expand_families  # noqa: E402


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("cc-rounds-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = expand_families(
        load_table(spark, sf, "documents"), copies, marginal=True
    )
    t0 = time.perf_counter()
    pairs = (
        jaccard_pairs_from(docs)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    n_pairs = pairs.count()
    pair_sec = round(time.perf_counter() - t0, 2)
    print(f"pairs: {n_pairs} in {pair_sec}s", file=sys.stderr)

    d_ids = docs.select("doc_id").localCheckpoint(eager=True)
    edges_sym = pairs.union(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    touched = (
        edges_sym.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def fingerprint(labels):
        r = labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("doc_id", "label")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    results = []

    def run_minlabel(name: str, ptr_from: int):
        t = time.perf_counter()
        labels, fp = cc_min_label_loop(
            touched, edges_sym, max_rounds=60, ptr_from=ptr_from
        )
        full = labels.union(
            d_ids.join(touched, "doc_id", "left_anti").select(
                "doc_id", F.col("doc_id").alias("label")
            )
        )
        h = fingerprint(full)
        results.append(
            {
                "variant": name,
                "rounds": CC_ROUNDS_TAKEN["rounds"],
                "sec": round(time.perf_counter() - t, 2),
                "labels_fp": h,
            }
        )
        print(results[-1], file=sys.stderr)

    def run_star():
        t = time.perf_counter()
        star, fp = _star_edges_converged(pairs)
        full = _labels_from_star_edges(d_ids, star, fp[0])
        h = fingerprint(full)
        results.append(
            {
                "variant": "largestar_smallstar",
                "rounds": CC_ROUNDS_TAKEN["star_rounds"],
                "sec": round(time.perf_counter() - t, 2),
                "labels_fp": h,
            }
        )
        print(results[-1], file=sys.stderr)

    # interleave the variants twice; plain last so a blow-up cannot
    # starve the others
    for _ in range(2):
        run_star()
        run_minlabel("minlabel_ptrjump", ptr_from=3)
        run_minlabel("minlabel_plain", ptr_from=10**9)

    fps = {tuple(r["labels_fp"]) for r in results}
    assert len(fps) == 1, f"variants disagree: {fps}"
    art = {
        "copies": copies,
        "n_docs": docs.count(),
        "n_pairs": n_pairs,
        "pair_gen_sec": pair_sec,
        "runs": [
            {k: v for k, v in r.items() if k != "labels_fp"}
            for r in results
        ],
        "labels_identical": True,
        "min_sec": {
            v: min(r["sec"] for r in results if r["variant"] == v)
            for v in {r["variant"] for r in results}
        },
        "rounds": {
            v: max(r["rounds"] for r in results if r["variant"] == v)
            for v in {r["variant"] for r in results}
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CC_LADDER_r14.json",
    )
    with open(path, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(json.dumps({"rounds": art["rounds"], "min_sec": art["min_sec"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
