#!/usr/bin/env python
"""BPE merge-loop escalation rung (round-5 verdict item #2): run
the documented production driver loop — the SAME per-round plan as
`bpe_merges_from` (operators/tokenizer.py), per-round argmax via a
1-row broadcast join, lineage cut by localCheckpoint — for ~256
merge rounds and record each round's wall time, to demonstrate
that round cost stays O(vocab) FLAT instead of growing with the
round number (the claim the registered 4-round oracle form argues
but cannot measure).

Vocabulary: the fixture corpus is synthetic word soup with only 31
distinct words, which a dozen merges would fully collapse, so this
rung expands the VOCABULARY deterministically (each base word gets
`copies` suffixed variants carrying its frequency — the vocab-level
analogue of stress_scale.expand).  That is faithful to what the
rung measures: the one corpus-sized pass (the initial word count)
is the registered query's proven plan; everything per-round is
vocab-sized by design, and THIS loop is what a 30k-merge production
vocabulary would run.

Each round is delimited by a count() action — the materialization
barrier that realizes that round's lazy localCheckpoint, exactly
what a driver loop persisting per-round state does.  Flatness
metric: median of the last 32 rounds vs median of the first 32;
superlinear lineage growth would show as a rising tail.

Usage: python scripts/stress_bpe.py [out.json]
Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_BPE_MERGES
(default 256), SPARK_GRAFT_BPE_VOCAB_COPIES (default 300).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from db_mapreduce_project_spark.functions.text import words
from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.tokenizer import (
    bpe_apply_merge,
    bpe_best_pair,
    bpe_symbolized_vocab,
)
from db_mapreduce_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
N_MERGES = int(os.environ.get("SPARK_GRAFT_BPE_MERGES", "256"))
VOCAB_COPIES = int(os.environ.get("SPARK_GRAFT_BPE_VOCAB_COPIES", "300"))


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("stress_bpe")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, SF_DIR, "documents")
    base_vocab = (
        words(d, "text").groupBy("word").agg(F.count("*").alias("freq"))
    )
    # deterministic vocab expansion: word -> word + 'x' + copy index
    # (suffix characters create fresh pair structure each copy)
    copies = spark.range(VOCAB_COPIES).select(
        F.col("id").cast("string").alias("_i")
    )
    vocab = base_vocab.crossJoin(copies).select(
        F.concat(F.col("word"), F.lit("x"), F.col("_i")).alias("word"),
        "freq",
    )
    n_vocab = vocab.count()

    cur = bpe_symbolized_vocab(vocab).localCheckpoint(eager=True)
    rounds = []
    for rank in range(1, N_MERGES + 1):
        t0 = time.perf_counter()
        cur = bpe_apply_merge(cur, bpe_best_pair(cur)).localCheckpoint(
            eager=False
        )
        n = cur.count()  # the round's materialization barrier
        sec = time.perf_counter() - t0
        rounds.append(round(sec, 3))
        if rank % 32 == 0:
            print(
                json.dumps(
                    {"round": rank, "sec": rounds[-1], "vocab_rows": n}
                ),
                flush=True,
            )

    head = statistics.median(rounds[:32])
    tail = statistics.median(rounds[-32:])
    payload = {
        "metric": "bpe_merge_round_seconds",
        "sf": SF_DIR,
        "vocab_words": n_vocab,
        "n_merges": N_MERGES,
        "median_first32": round(head, 3),
        "median_last32": round(tail, 3),
        "tail_over_head": round(tail / head, 3),
        "total_sec": round(sum(rounds), 2),
        "rounds": rounds,
    }
    print(json.dumps({k: v for k, v in payload.items() if k != "rounds"}))
    if out_path:
        json.dump(payload, open(out_path, "w"), indent=1)


if __name__ == "__main__":
    main()
