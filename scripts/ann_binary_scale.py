#!/usr/bin/env python
"""Measure ONLY the binary-quantization serving path at the standard
100k/500k/1M rungs and merge the rows into ANN_RECALL_r10.json —
the targeted-rerun companion to scripts/ann_recall_scale.py (which
now measures the path on every full sweep): same corpus
construction, same cells/probe scaling, same float64 ground truth,
same merge-by-(corpus, path, params) artifact discipline.

Usage: python scripts/ann_binary_scale.py [copies ...]  (default 50 250 500)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from db_mapreduce_project_spark.io import load_table
from db_mapreduce_project_spark.operators.retrieval import exact_rerank_tail
from db_mapreduce_project_spark.operators.similarity import (
    RERANK_MARGIN,
    TOPK,
    binary_hamming_cands_from,
    derive_n_cells,
)
from db_mapreduce_project_spark.session import get_spark
from scripts.ann_recall import measure
from scripts.ann_recall_scale import (
    NOISE,
    exact_truth_numpy,
    expand_perturbed_explode,
)


def main() -> None:
    rungs = [int(a) for a in sys.argv[1:]] or [50, 250, 500]
    spark = get_spark("ann-binary-scale")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        os.environ.get("ANN_RECALL_OUT", "ANN_RECALL_r12.json"),
    )
    results: list[dict] = []
    for copies in rungs:
        scratch = tempfile.mkdtemp(prefix=f"ann_bin_{copies}x_")
        expand_perturbed_explode(base, copies).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(scratch, "embeddings.parquet"))
        rung = spark.read.parquet(os.path.join(scratch, "embeddings.parquet"))
        n = rung.count()
        corpus = f"sf0.1 x {copies} ({n} vectors)"
        print(f"== rung {corpus}", flush=True)
        t0 = time.perf_counter()
        pdf = rung.toPandas()
        ids = pdf["vec_id"].to_numpy()
        vecs = np.vstack(pdf["embedding"].to_numpy()).astype("float64")
        del pdf
        exact = exact_truth_numpy(ids, vecs)
        del ids, vecs
        print(
            f"   ground truth in {round(time.perf_counter() - t0, 2)}s",
            flush=True,
        )
        # round-11: data-derived cells (power of two nearest
        # sqrt(n)), same rule as ann_recall_scale — no 256 cap
        cells = derive_n_cells(n)
        probe = 8
        row = {
            "corpus": corpus,
            "path": "binary_hamming_rerank",
            "params": {
                "cells": cells,
                "probe": probe,
                "rerank_c": "adaptive",
                "margin": RERANK_MARGIN,
                "state": {
                    "sign_bytes": n * 8,
                    "cell_assign_bytes": n * 4,
                },
            },
            **measure(
                exact_rerank_tail(
                    rung,
                    binary_hamming_cands_from(
                        rung,
                        n_cells=cells,
                        n_probe=probe,
                        margin=RERANK_MARGIN,
                    ),
                ),
                exact,
            ),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        shutil.rmtree(scratch, ignore_errors=True)
        spark.catalog.clearCache()

    # tolerate a missing/truncated artifact (fresh r11 file, or an
    # interrupted earlier run) instead of losing the just-computed
    # measurements to FileNotFoundError/ValueError at the very end
    try:
        with open(out_path) as f:
            artifact = json.load(f)
    except (OSError, ValueError):
        artifact = {
            "topk": TOPK,
            "recall_def": "hits / (n_queries * topk), exact cosine "
            "top-k (float64 BLAS) as truth",
            "noise": "expand_perturbed_explode clones of sf0.1 "
            "embeddings",
            "measurements": [],
        }
    key = lambda r: (  # noqa: E731
        r["corpus"],
        r["path"],
        json.dumps(r["params"], sort_keys=True),
    )
    merged = {key(r): r for r in artifact["measurements"]}
    merged.update({key(r): r for r in results})
    artifact["measurements"] = list(merged.values())
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {out_path} ({len(merged)} measurements)")


if __name__ == "__main__":
    main()
